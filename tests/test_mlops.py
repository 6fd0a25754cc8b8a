"""Batch 75: decision-stump best split + k-NN majority vote."""

SF = "/root/testdata/sf0.001"


def _stump_fixture(spark):
    """Tiny hand-checkable feature/label set: x <= 2 is all-positive,
    x > 2 all-negative — the perfect split at threshold 2."""
    return spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1), (3, 0), (4, 0), (5, 0)],
        "cents long, pos long",
    )


def test_best_split_hand_fixture(spark):
    """The windowed-impurity plan applied to a fixture with a known
    perfect split picks that split with impurity 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = _stump_fixture(spark)
    per_t = rows.groupBy("cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_t.select(
        "cents",
        F.sum("cnt").over(w).alias("n_l"),
        F.sum("p").over(w).alias("pos_l"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("p").over(wall).alias("pos"),
    )
    n_l, pos_l = F.col("n_l"), F.col("pos_l")
    n_r, pos_r = F.col("n") - n_l, F.col("pos") - pos_l
    a_l = n_l * n_l - pos_l * pos_l - (n_l - pos_l) * (n_l - pos_l)
    a_r = n_r * n_r - pos_r * pos_r - (n_r - pos_r) * (n_r - pos_r)
    best = (
        cum.filter(n_r > 0)
        .select(
            "cents",
            F.round(a_l / n_l.cast("double") + a_r / n_r.cast("double"), 9)
            .alias("imp"),
        )
        .orderBy("imp", "cents")
        .first()
    )
    assert best.cents == 2 and best.imp == 0.0


def test_best_split_matches_python_argmin(spark):
    """best_split on real orders equals an independent pure-Python
    exhaustive argmin over all thresholds."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.mlops import q_best_split

    got = q_best_split(spark, SF).first()

    files = sorted(glob.glob(f"{SF}/orders.parquet")) or sorted(
        glob.glob(f"{SF}/orders.parquet/*.parquet")
    )
    df = pd.concat(pd.read_parquet(f) for f in files)
    cents = (df.o_totalprice * 100).round().astype("int64")
    pos = (df.o_orderpriority == "1-URGENT").astype("int64")
    pts = sorted(
        (c, int(cn), int(p))
        for c, (cn, p) in pd.DataFrame({"c": cents, "p": pos})
        .groupby("c")
        .agg(cn=("p", "size"), p=("p", "sum"))
        .iterrows()
    )
    n = sum(c for _, c, _ in pts)
    tot_p = sum(p for _, _, p in pts)
    best = None
    n_l = pos_l = 0
    for c, cn, p in pts:
        n_l += cn
        pos_l += p
        n_r, pos_r = n - n_l, tot_p - pos_l
        if n_r == 0:
            break
        a_l = n_l * n_l - pos_l * pos_l - (n_l - pos_l) ** 2
        a_r = n_r * n_r - pos_r * pos_r - (n_r - pos_r) ** 2
        imp = round(a_l / n_l + a_r / n_r, 9)
        key = (imp, c)
        if best is None or key < best[0]:
            best = (key, (c, n_l, pos_l, n_r, pos_r))
    (imp, _), (c, n_l, pos_l, n_r, pos_r) = best
    assert (
        got.threshold,
        got.n_l,
        got.pos_l,
        got.n_r,
        got.pos_r,
        got.impurity,
    ) == (c, n_l, pos_l, n_r, pos_r, imp)


def test_knn_vote_consistent_with_neighbors(spark):
    """Every prediction is the modal neighbor label (votes desc,
    label asc) of the cosine_topk neighbor list."""
    from collections import Counter

    from ocr_to_csv_spark.functions.mlops import q_knn_classify
    from ocr_to_csv_spark.functions.similarity import q_cosine_topk
    from ocr_to_csv_spark.functions.util import table

    labels = {
        r.vec_id: r.label
        for r in table(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    nbrs: dict[int, list[int]] = {}
    for r in q_cosine_topk(spark, SF).collect():
        nbrs.setdefault(r.query_id, []).append(labels[r.neighbor_id])
    preds = {r.query_id: (r.pred_label, r.votes)
             for r in q_knn_classify(spark, SF).collect()}
    assert set(preds) == set(nbrs)
    for q, ls in nbrs.items():
        cnt = Counter(ls)
        want = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert preds[q] == (want[0], want[1]), q
