"""Batch 80: changepoint split + CUPED adjustment."""

from fractions import Fraction

SF = "/root/testdata/sf0.001"


def test_changepoint_matches_python_argmin(spark):
    """Split choice and segment sums equal a brute-force Python
    recomputation (exact Fraction cost, so the argmin is unambiguous
    unless the IEEE tie actually exists — then day asc)."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.experimentops import q_changepoint
    from ocr_to_csv_spark.functions.statsops import TS_FROM, TS_TO

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(pd.read_parquet(f, columns=["ts", "value"]) for f in files)
    ev = ev[(ev.ts >= TS_FROM) & (ev.ts < TS_TO)]
    base = pd.Timestamp("1995-01-01")
    days = (ev.ts.dt.normalize() - base).dt.days
    cents = (ev.value * 100).round().astype("int64")
    daily = sorted(
        cents.groupby(days).sum().items()
    )  # [(d, v)] ascending
    vals = [v for _, v in daily]
    n = len(vals)
    best = None
    for t in range(1, n):
        left, right = vals[:t], vals[t:]

        def sse(seg):
            s, q = sum(seg), sum(v * v for v in seg)
            return Fraction(q) - Fraction(s * s, len(seg))

        cost = sse(left) + sse(right)
        key = (cost, daily[t - 1][0])
        if best is None or key < best[0]:
            best = (key, (daily[t - 1][0], t, sum(left), n - t, sum(right)))
    (_, _), (d, n_l, s_l, n_r, s_r) = best
    got = q_changepoint(spark, SF).first()
    assert (got.split_d, got.n_l, got.sum_l, got.n_r, got.sum_r) == (
        d, n_l, s_l, n_r, s_r
    )


def test_changepoint_cost_is_sse(spark):
    """The emitted IEEE cost equals the same fixed expression over the
    emitted integer pieces — pinning the parenthesization."""
    import glob

    import pandas as pd

    from ocr_to_csv_spark.functions.experimentops import q_changepoint
    from ocr_to_csv_spark.functions.statsops import TS_FROM, TS_TO

    got = q_changepoint(spark, SF).first()
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    ev = pd.concat(pd.read_parquet(f, columns=["ts", "value"]) for f in files)
    ev = ev[(ev.ts >= TS_FROM) & (ev.ts < TS_TO)]
    base = pd.Timestamp("1995-01-01")
    days = (ev.ts.dt.normalize() - base).dt.days
    cents = (ev.value * 100).round().astype("int64")
    series = dict(cents.groupby(days).sum().items())
    left = [v for d, v in series.items() if d <= got.split_d]
    right = [v for d, v in series.items() if d > got.split_d]
    q_l = sum(v * v for v in left)
    q_r = sum(v * v for v in right)
    want = (float(q_l) - (got.sum_l * got.sum_l) / float(got.n_l)) + (
        float(q_r) - (got.sum_r * got.sum_r) / float(got.n_r)
    )
    assert got.cost == want


def test_cuped_matches_python(spark):
    """θ rational and per-arm adjusted means equal an independent
    pandas recomputation with the same fixed scaling."""
    import glob
    import math

    import pandas as pd

    from ocr_to_csv_spark.functions.experimentops import q_cuped

    def load(tbl, cols):
        files = sorted(glob.glob(f"{SF}/{tbl}.parquet")) or sorted(
            glob.glob(f"{SF}/{tbl}.parquet/*.parquet")
        )
        return pd.concat(pd.read_parquet(f, columns=cols) for f in files)

    c = load("customer", ["c_custkey", "c_acctbal"])
    o = load("orders", ["o_custkey", "o_totalprice"])
    c["x"] = (
        (c.c_acctbal * 100).round().astype("int64") / 100
    ).apply(math.floor).astype("int64")
    o["yo"] = (
        (o.o_totalprice * 100).round().astype("int64") / 1000
    ).apply(math.floor).astype("int64")
    y = o.groupby("o_custkey").yo.sum()
    u = c.set_index("c_custkey").join(y.rename("y"), how="inner")
    u["arm"] = u.index % 2
    n, sx, sy = len(u), int(u.x.sum()), int(u.y.sum())
    sxy = int((u.x * u.y).sum())
    sxx = int((u.x * u.x).sum())
    t_num, t_den = n * sxy - sx * sy, n * sxx - sx * sx
    got = {r.arm: r for r in q_cuped(spark, SF).collect()}
    assert set(got) == {0, 1}
    for arm, g in got.items():
        ua = u[u.arm == arm]
        assert (g.n_a, g.sy_a, g.sx_a) == (
            len(ua), int(ua.y.sum()), int(ua.x.sum())
        )
        assert (g.t_num, g.t_den) == (t_num, t_den)
        adj = round(
            g.sy_a / g.n_a
            - (t_num / t_den) * (g.sx_a / g.n_a - sx / n),
            9,
        )
        assert g.adj_mean == adj


def test_cuped_reduces_or_keeps_gap_stability():
    """Fixture sanity: with Y perfectly predicted by X, the adjusted
    arm means coincide (the defining CUPED property)."""
    # y = 2x exactly; arms differ only through x
    xs0, xs1 = [1, 2, 3], [4, 5, 6]
    xs = xs0 + xs1
    ys = [2 * x for x in xs]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    theta = Fraction(n * sxy - sx * sy, n * sxx - sx * sx)
    assert theta == 2
    for arm_xs, arm_ys in ((xs0, [2 * x for x in xs0]),
                           (xs1, [2 * x for x in xs1])):
        adj = (
            Fraction(sum(arm_ys), len(arm_ys))
            - theta * (Fraction(sum(arm_xs), len(arm_xs)) - Fraction(sx, n))
        )
        assert adj == Fraction(sy, n)
