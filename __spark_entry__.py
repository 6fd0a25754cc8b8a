"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` covers the SURVEY.md §2 operator inventory (relational
layer) plus the training-data pipeline operators (dedup / similarity /
text analysis) over the driver's sf tables, and the flagship extraction
pipeline over a deterministic self-generated interleaved corpus whose
golden outputs serve as the DuckDB oracle (read by absolute parquet path).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_to_csv_spark.functions import dedup, relational, similarity, textops

CORPUS_DOCS = 40
CORPUS_SEED = 42


def _corpus_dir() -> str:
    """Deterministic self-generated interleaved corpus (cached)."""
    d = f"/tmp/ocr2csv_corpus_{CORPUS_DOCS}_{CORPUS_SEED}"
    marker = os.path.join(d, "expected_rows.parquet")
    if not os.path.exists(marker):
        from ocr_to_csv_spark.datagen.gen import write_corpus

        write_corpus(d, CORPUS_DOCS, seed=CORPUS_SEED)
    return d


def _extract(spark: SparkSession) -> dict[str, DataFrame]:
    from ocr_to_csv_spark.extraction import pipeline

    tabs = pipeline.load_corpus(spark, _corpus_dir())
    return pipeline.extract(spark, tabs["documents"], tabs["media"], tabs["aliases"])


def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full interleaved-document extraction → ordered span
    sequences (north_rule invariant). Oracle = golden fixture parquet."""
    res = _extract(spark)
    return res["spans"].select(
        "doc_id", "kind", "text",
        F.coalesce("media_ref", F.lit("")).alias("media_ref"),
        F.col("order").cast("long").alias("ord"),
    )


def q_extract_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: flattened CSV-row table (reference main.py:182 layout)."""
    res = _extract(spark)
    out = res["rows"]
    for c in ("name", "time_in", "time_out", "hours", "purpose", "date", "day"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return out.select(
        "doc_id", F.col("page").cast("long").alias("page"),
        F.col("row").cast("long").alias("row"),
        "name", "time_in", "time_out", "hours", "purpose", "date", "day",
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: PNG header metadata over the binary media
    column (decode stage itself is the pure-numpy codec)."""
    from ocr_to_csv_spark.extraction.multimodal import media_metadata

    media = spark.read.parquet(os.path.join(_corpus_dir(), "media.parquet"))
    return media_metadata(media)


def q_multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via extracted features: 264-dim thumbnail+histogram
    vectors, cosine top-10 pairs (the media analogue of embed_near_pairs;
    rows-only — feature extraction is not SQL-expressible)."""
    from pyspark.sql import Window
    from ocr_to_csv_spark.extraction.multimodal import media_features

    media = spark.read.parquet(os.path.join(_corpus_dir(), "media.parquet"))
    feats = media_features(media).select(
        "media_ref", F.transform("feat", lambda x: x.cast("double")).alias("v")
    )
    dim = 16 * 16 + 8
    dot = lambda a, b: F.aggregate(
        F.sequence(F.lit(1), F.lit(dim)), F.lit(0.0),
        lambda acc, i: acc + F.element_at(a, i) * F.element_at(b, i),
    )
    nrm = lambda a: F.sqrt(dot(a, a))
    a = feats.select(F.col("media_ref").alias("ra"), F.col("v").alias("va"))
    b = feats.select(F.col("media_ref").alias("rb"), F.col("v").alias("vb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("ra") < F.col("rb"))
        .select(
            "ra", "rb",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (nrm(F.col("va")) * nrm(F.col("vb"))), 4
            ).alias("sim"),
        )
    )
    return pairs.orderBy(F.desc("sim"), F.asc("ra"), F.asc("rb")).limit(10)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship composite over /root/testdata/sf0.001: exact-dedup +
    quality + language-ID + fingerprint of the documents table — the
    training-data curation pass every corpus gets before extraction."""
    sf = "/root/testdata/sf0.001"
    dq = textops.q_quality_score(spark, sf).select("doc_id", "n_tokens", "quality", "band")
    lang = textops.q_lang_id(spark, sf).select("doc_id", "lang_pred")
    ded = textops.q_dedup_exact(spark, sf).select("doc_id", "keep")
    fp = textops.q_fingerprint(spark, sf).select("doc_id", "fp")
    return dq.join(lang, "doc_id").join(ded, "doc_id").join(fp, "doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(textops.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(
        {
            "extract_spans": q_extract_spans,
            "extract_rows": q_extract_rows,
            "multimodal_meta": q_multimodal_meta,
            "multimodal_near_dup": q_multimodal_near_dup,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(textops.ORACLES)
    out.update(dedup.ORACLES)
    out.update(similarity.ORACLES)
    # flagship oracles: the deterministic golden fixtures (absolute path —
    # generated on demand so DuckDB can read them even if queries() ran in
    # another process)
    d = _corpus_dir()
    out["extract_spans"] = f"""
        SELECT doc_id, kind, text,
               coalesce(media_ref, '') AS media_ref,
               "order"::BIGINT AS ord
        FROM '{d}/expected_spans.parquet'
    """
    out["extract_rows"] = f"""
        SELECT doc_id, page::BIGINT AS page, row::BIGINT AS row,
               coalesce(name, '') AS name, coalesce(time_in, '') AS time_in,
               coalesce(time_out, '') AS time_out, coalesce(hours, '') AS hours,
               coalesce(purpose, '') AS purpose, coalesce(date, '') AS date,
               coalesce(day, '') AS day
        FROM '{d}/expected_rows.parquet'
    """
    # multimodal_meta / multimodal_near_dup intentionally have no oracle
    # (binary decode is not SQL-expressible) → rows-only checks.
    return out
