"""Batch 99: distributed QuickHull + Douglas–Peucker, checked against
independent sequential golden algorithms (monotone chain / recursive DP)
at sf0.001, plus the defining geometric invariants."""

SF = "/root/testdata/sf0.001"


def test_convex_hull_matches_monotone_chain(spark):
    from ocr_to_csv_spark.functions.hullops import (
        _py_hull_points,
        _py_monotone_chain,
        q_convex_hull,
    )

    gold = {
        (g, x, y)
        for g, pts in _py_hull_points(SF).items()
        for x, y in _py_monotone_chain(pts)
    }
    got = {(r.grp, r.x, r.y) for r in q_convex_hull(spark, SF).collect()}
    assert got == gold


def test_convex_hull_contains_every_point(spark):
    """No input point lies strictly outside its group's hull: for every
    point, some orientation test against the hull in ring order holds.
    Verified via the cross product against all hull edges (hull walked
    counter-clockwise, so an inside point is never strictly right)."""
    from ocr_to_csv_spark.functions.hullops import (
        _py_hull_points,
        q_convex_hull,
    )
    import math

    hull = {}
    for r in q_convex_hull(spark, SF).collect():
        hull.setdefault(r.grp, []).append((r.x, r.y))
    for grp, pts in _py_hull_points(SF).items():
        hv = hull[grp]
        assert len(hv) >= min(len(pts), 2)
        if len(hv) < 3:
            continue
        cx = sum(x for x, _ in hv) / len(hv)
        cy = sum(y for _, y in hv) / len(hv)
        ring = sorted(hv, key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
        for px, py in pts:
            for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                assert cross >= 0, (grp, px, py)


def test_dp_simplify_matches_recursive_golden(spark):
    from ocr_to_csv_spark.functions.hullops import (
        DP_EPS,
        _py_dp,
        _py_trajectories,
        q_dp_simplify,
    )

    trajs = _py_trajectories(SF)
    gold = {
        (uid, i, ys[i])
        for uid, ys in trajs.items()
        for i in _py_dp(ys, DP_EPS)
    }
    got = {
        (r.user_id, r.idx, r.y) for r in q_dp_simplify(spark, SF).collect()
    }
    assert got == gold
    # simplification must actually drop points somewhere
    n_total = sum(len(ys) for ys in trajs.values())
    assert len(got) < n_total


def test_dp_simplify_error_bound_holds(spark):
    """Every DROPPED point sits within DP_EPS of the segment between
    its surviving neighbours — the guarantee DP exists to provide."""
    from ocr_to_csv_spark.functions.hullops import (
        DP_EPS,
        _py_trajectories,
        q_dp_simplify,
    )

    kept = {}
    for r in q_dp_simplify(spark, SF).collect():
        kept.setdefault(r.user_id, []).append(r.idx)
    for uid, ys in _py_trajectories(SF).items():
        ks = sorted(kept[uid])
        assert ks[0] == 0 and ks[-1] == len(ys) - 1
        for i0, i1 in zip(ks, ks[1:]):
            y0, y1 = ys[i0], ys[i1]
            len2 = (i1 - i0) ** 2 + (y1 - y0) ** 2
            for i in range(i0 + 1, i1):
                c = (i1 - i0) * (ys[i] - y0) - (y1 - y0) * (i - i0)
                assert c * c <= DP_EPS * DP_EPS * len2, (uid, i)
