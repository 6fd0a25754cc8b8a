"""Snapshot-backed resumable iteration (plans/iterative.py): a killed
iterative job resumes from its last committed round (read from the
manifest log, no data scan), the resumed result equals the
uninterrupted run, and re-running a completed run replays nothing."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.plans.iterative import last_round, resume_iterate
from ocr_to_csv_spark.sources import SnapshotCatalog

EDGES = [(1, 2), (2, 3), (3, 4), (5, 6), (7, 7)]
N = 8


def _setup(spark):
    edges = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    nodes = spark.range(N).select(F.col("id").cast("long").alias("id"))
    return edges, nodes


def _min_label_step(edges):
    """One round of undirected min-label propagation (CC superstep)."""
    undirected = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def step(state, r):
        nb = (
            undirected.join(
                state.select(F.col("id").alias("dst"), F.col("lab").alias("nlab")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlab").alias("m"))
        )
        return (
            state.join(nb, state.id == nb.src, "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("m", F.col("lab"))).alias("lab"),
            )
        )
    return step


def _labels(df):
    return {r["id"]: r["lab"] for r in df.collect()}


def test_resume_equals_uninterrupted(spark, tmp_path):
    edges, nodes = _setup(spark)
    init = lambda: nodes.select("id", F.col("id").alias("lab"))
    step = _min_label_step(edges)

    cat_a = SnapshotCatalog(spark, str(tmp_path / "a"))
    full = _labels(
        resume_iterate(spark, cat_a, "cc", "run1", init, step, rounds=4)
    )
    # converged on this graph: components {1,2,3,4}, {5,6}, {7}, {0}
    assert full == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}

    # "crash" after round 2, then resume to 4 in a fresh invocation
    cat_b = SnapshotCatalog(spark, str(tmp_path / "b"))
    resume_iterate(spark, cat_b, "cc", "run1", init, step, rounds=2)
    assert last_round(cat_b, "cc", "run1") == 2
    resumed = _labels(
        resume_iterate(spark, cat_b, "cc", "run1", init, step, rounds=4)
    )
    assert resumed == full
    # resume replayed rounds 3..4 only: snapshots = init + 4 rounds
    assert len(cat_b.history("cc")) == 5


def test_completed_run_is_a_noop(spark, tmp_path):
    edges, nodes = _setup(spark)
    init = lambda: nodes.select("id", F.col("id").alias("lab"))
    step = _min_label_step(edges)
    cat = SnapshotCatalog(spark, str(tmp_path))
    resume_iterate(spark, cat, "cc", "run1", init, step, rounds=3)
    n_before = len(cat.history("cc"))
    resume_iterate(spark, cat, "cc", "run1", init, step, rounds=3)
    assert len(cat.history("cc")) == n_before  # nothing replayed


def test_unknown_run_restarts_from_zero(spark, tmp_path):
    edges, nodes = _setup(spark)
    init = lambda: nodes.select("id", F.col("id").alias("lab"))
    step = _min_label_step(edges)
    cat = SnapshotCatalog(spark, str(tmp_path))
    resume_iterate(spark, cat, "cc", "run1", init, step, rounds=1)
    assert last_round(cat, "cc", "run2") == -1
    resume_iterate(spark, cat, "cc", "run2", init, step, rounds=1)
    assert last_round(cat, "cc", "run2") == 1
