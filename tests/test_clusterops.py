"""Batch 77: grid-bucketed DBSCAN."""

SF = "/root/testdata/sf0.001"


def test_dbscan_matches_python_mirror(spark):
    """Spark DBSCAN is bit-identical to the independent brute-force
    textbook implementation with the same deterministic rules."""
    from ocr_to_csv_spark.functions.clusterops import _py_dbscan, q_dbscan

    got = sorted(
        (r.k, r.cluster, r.is_core) for r in q_dbscan(spark, SF).collect()
    )
    assert got == _py_dbscan(SF)


def test_dbscan_recovers_planted_blobs(spark):
    """Non-outlier keys of the same blob (k % 5) land in the same
    cluster; distinct blobs land in distinct clusters."""
    from ocr_to_csv_spark.functions.clusterops import q_dbscan

    rows = {r.k: r.cluster for r in q_dbscan(spark, SF).collect()}
    by_blob: dict[int, set] = {}
    for k, c in rows.items():
        if k % 17 == 0:
            continue  # planted outlier class
        by_blob.setdefault(k % 5, set()).add(c)
    # each blob resolves to exactly one cluster id (blob members are
    # mutually within ε via chaining; blobs are ≥ 200 apart)
    labels = []
    for blob, cs in sorted(by_blob.items()):
        assert len(cs) == 1, (blob, cs)
        labels.append(next(iter(cs)))
    assert len(set(labels)) == 5  # blobs never merge


def test_core_counts_vs_bruteforce(spark):
    """Grid-join neighbor counts equal the brute-force counts — the
    3×3 cover loses no pair."""
    from ocr_to_csv_spark.functions.clusterops import (
        MINPTS,
        _eps2,
        q_dbscan_core,
    )
    import glob

    import pandas as pd

    files = sorted(glob.glob(f"{SF}/customer.parquet")) or sorted(
        glob.glob(f"{SF}/customer.parquet/*.parquet")
    )
    keys = pd.concat(
        [pd.read_parquet(f, columns=["c_custkey"]) for f in files]
    )["c_custkey"].astype(int).tolist()
    pts = {}
    for k in keys:
        if k % 17 == 0:
            pts[k] = ((k * 53) % 1000, (k * 59) % 1000)
        else:
            b = k % 5
            pts[k] = (b * 180 + 60 + (k * 7) % 21, b * 140 + 80 + (k * 11) % 21)
    want = {
        k: sum(
            1
            for (x2, y2) in pts.values()
            if (x - x2) ** 2 + (y - y2) ** 2 <= _eps2(len(keys))
        )
        for k, (x, y) in pts.items()
    }
    got = {r.k: (r.n_nbrs, r.is_core) for r in q_dbscan_core(spark, SF).collect()}
    assert set(got) == set(want)
    for k, n in want.items():
        assert got[k] == (n, int(n >= MINPTS)), k


def test_noise_and_border_semantics(spark):
    """Noise points have cluster −1 and is_core 0; border points carry
    a real cluster but is_core 0; some of each exist in the corpus."""
    from ocr_to_csv_spark.functions.clusterops import q_dbscan

    rows = q_dbscan(spark, SF).collect()
    noise = [r for r in rows if r.cluster == -1]
    border = [r for r in rows if r.cluster != -1 and r.is_core == 0]
    cores = [r for r in rows if r.is_core == 1]
    assert noise and cores
    for r in noise:
        assert r.is_core == 0
    for r in border:
        assert r.cluster >= 0
