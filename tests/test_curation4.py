"""Semantic properties of the curation batch-4 operators (oracle parity
is covered by tools/check_queries.py; these pin behaviours the oracles
can't express)."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions import curation4

SF = "/root/testdata/sf0.001"


def test_ccnet_buckets_tercile_shape(spark):
    """Per language the three buckets differ in size by at most one doc
    (ntile contract), every scored doc lands in exactly one bucket, and
    head docs score >= tail docs within the same language."""
    rows = curation4.q_ccnet_buckets(spark, SF).collect()
    assert rows, "bucket table must be non-empty"
    by_lang: dict[str, dict[str, list]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(
            r["common_sum"] / r["n_tokens"]
        )
    for lang, buckets in by_lang.items():
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if "head" in buckets and "tail" in buckets:
            assert min(buckets["head"]) >= max(buckets["tail"])


def test_cooc_pmi_ratio_definition(spark):
    """pmi_ratio reproduces c_xy·N_tok² / (N_pair·c_x·c_y) for every
    emitted pair (recomputed driver-side from the emitted integers and
    independently derived totals), and the pair floor holds."""
    rows = curation4.q_cooc_pmi(spark, SF).collect()
    assert rows
    from ocr_to_csv_spark.functions.curation import q_cooccurrence
    from ocr_to_csv_spark.functions.util import table, tokens

    n_pair = q_cooccurrence(spark, SF).agg(F.sum("cnt")).collect()[0][0]
    n_tok = (
        table(spark, SF, "documents")
        .select(F.explode(tokens(F.col("text"))))
        .count()
    )
    for r in rows:
        assert r["cnt"] >= curation4.PMI_MIN_PAIR
        expect = ((r["cnt"] / n_pair) * n_tok / r["c1"]) * (n_tok / r["c2"])
        assert r["pmi_ratio"] == expect, (r["w1"], r["w2"])


def test_text_normalize_collapses_repeats(spark):
    df = spark.createDataFrame(
        [(1, "The  THE the quick--  quick brown fox."),
         (2, ""), (3, "a a a a")],
        "doc_id long, text string",
    )
    import ocr_to_csv_spark.functions.curation4 as c4
    from ocr_to_csv_spark.functions.util import tokens

    out = (
        df.select("doc_id", tokens(F.lower(F.col("text"))).alias("t0"))
        .withColumn(
            "t1",
            F.filter(
                F.transform(
                    F.col("t0"),
                    lambda t: F.regexp_replace(t, "^[^a-z0-9]+|[^a-z0-9]+$", ""),
                ),
                lambda t: t != "",
            ),
        )
        .withColumn("t2", F.expr("filter(t1, (t, i) -> i = 0 OR t <> t1[i-1])"))
        .select("doc_id", F.concat_ws(" ", "t2").alias("norm"))
    )
    got = {r["doc_id"]: r["norm"] for r in out.collect()}
    assert got[1] == "the quick brown fox"
    assert got[2] == ""
    assert got[3] == "a"
    # and the registered query emits matching counts/md5 shape
    q = c4.q_text_normalize(spark, SF)
    assert set(q.columns) == {"doc_id", "n_before", "n_after", "norm_md5"}
    r = q.filter(F.col("n_before") > 0).first()
    assert r["n_after"] <= r["n_before"]


def test_url_dedup_canonical_collapse(spark):
    """The mixed-case/:80 and trailing-slash variants of the same page
    collapse to ONE canonical URL with n_variants == 2, and no canonical
    form retains fragments, utm params, default ports, or upper-case
    hosts."""
    rows = curation4.q_url_dedup(spark, SF).collect()
    assert rows
    per_page = [r for r in rows if "/p/" in r["url_canon"]]
    assert per_page and all(r["n_variants"] == 2 for r in per_page)
    for r in rows:
        u = r["url_canon"]
        host = u.split("://")[1].split("/")[0]
        assert host == host.lower()
        assert "#" not in u and "utm_" not in u
        assert ":80" not in u and not u.endswith("/")
