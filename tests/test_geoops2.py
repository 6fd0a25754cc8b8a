"""Batch 83: point-in-polygon containment join + shoelace area."""

SF = "/root/testdata/sf0.001"


def _py_inside(px, py, ring):
    """Independent textbook ray-cast (same half-open rule)."""
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if (t > 0) == (y2 > y1):
                inside = not inside
    return inside


def test_pip_matches_bruteforce_over_all_points(spark):
    """Spark containment must equal the brute-force test over EVERY
    customer point × EVERY polygon (no cell-cover false negatives)."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.geoops2 import POLYGONS, q_pip_join

    files = sorted(glob.glob(f"{SF}/customer.parquet")) or sorted(
        glob.glob(f"{SF}/customer.parquet/*.parquet")
    )
    c = pd.concat(pd.read_parquet(f, columns=["c_custkey"]) for f in files)
    want = set()
    for k in c.c_custkey.astype(int):
        px, py = k * 37 % 1000, k * 91 % 1000
        for pid, ring in POLYGONS.items():
            if _py_inside(px, py, ring):
                want.add((k, pid))
    got = {
        (r.c_custkey, r.poly_id) for r in q_pip_join(spark, SF).collect()
    }
    assert got == want
    assert want, "polygons must contain points at this sf"


def test_pip_nonconvex_parity():
    """The L-shape notch: a point in the cut-out corner is OUTSIDE even
    though it is inside the bounding box (multi-crossing parity)."""
    from ocr_to_csv_spark.functions.geoops2 import POLYGONS

    ring = POLYGONS[3]
    assert _py_inside(700, 700, ring)  # in the bottom bar
    assert _py_inside(800, 800, ring)  # in the right column
    assert not _py_inside(650, 850, ring)  # in the top-left notch
    assert not _py_inside(599, 700, ring)  # just left of the L


def test_pip_plan_is_shuffle_free(spark):
    """The containment join must be two broadcast hash joins + a fold —
    no shuffle exchange, no sort-merge join, no nested loop."""
    from ocr_to_csv_spark.functions.geoops2 import q_pip_join

    plan = q_pip_join(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_poly_area_textbook_values(spark):
    """Shoelace 2·area equals the hand-computable values; orientation
    reflects the literal ring order."""
    from ocr_to_csv_spark.functions.geoops2 import POLYGONS, q_poly_area

    def shoelace2(ring):
        n = len(ring)
        return sum(
            ring[i][0] * ring[(i + 1) % n][1]
            - ring[(i + 1) % n][0] * ring[i][1]
            for i in range(n)
        )

    rows = {r.poly_id: r for r in q_poly_area(spark, SF).collect()}
    assert set(rows) == set(POLYGONS)
    for pid, ring in POLYGONS.items():
        s2 = shoelace2(ring)
        assert rows[pid].area2 == abs(s2)
        assert rows[pid].is_ccw == (s2 > 0)
        assert rows[pid].n_vertices == len(ring)
    assert rows[1].area2 == 2 * 200 * 200  # the square, by hand
