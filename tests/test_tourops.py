"""Batch 164: TSP NN + 2-opt — python replay mirrors, tour validity
(permutation fixing city 0), and the improvement guarantee
(2opt cost <= nn cost, both above the trivial lower bound)."""


def _nn():
    from ocr_to_csv_spark.functions.tourops import DIST, N_CITY

    tour = [0]
    mask = 1
    for _ in range(N_CITY - 1):
        cur = tour[-1]
        best = None
        for c in range(N_CITY):
            if not (mask >> c) & 1:
                key = DIST[cur][c] * 16 + c
                if best is None or key < best:
                    best = key
        nxt = best % 16
        tour.append(nxt)
        mask |= 1 << nxt
    return tour


def _cost(tour):
    from ocr_to_csv_spark.functions.tourops import DIST, N_CITY

    return sum(
        DIST[tour[i]][tour[(i + 1) % N_CITY]] for i in range(N_CITY)
    )


def _two_opt(tour):
    from ocr_to_csv_spark.functions.tourops import DIST, N_CITY, PAIRS

    t = list(tour)
    for i, j in PAIRS:
        a, b = t[i - 1], t[i]
        c = t[j - 1]
        d = t[j % N_CITY] if j == N_CITY else t[j]
        # positions are 1-based in the engine; here i,j are the same
        # 1-based indices: a=t[i-1] is tour[i], etc.
        a, b = t[i - 1], t[i]
        c, d = t[j - 1], t[j % N_CITY]
        delta = (
            DIST[a][c] + DIST[b][d] - DIST[a][b] - DIST[c][d]
        )
        if delta < 0:
            t[i : j] = reversed(t[i : j])
    return t


def test_tsp_nn_matches_python(spark):
    from ocr_to_csv_spark.functions.tourops import N_CITY, q_tsp_nn

    tour = _nn()
    r = q_tsp_nn(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_cities == N_CITY
    assert r.tour == ",".join(str(x) for x in tour)
    assert r.cost == _cost(tour)
    assert sorted(tour) == list(range(N_CITY)) and tour[0] == 0


def test_tsp_2opt_matches_python_and_improves(spark):
    from ocr_to_csv_spark.functions.tourops import (
        DIST, N_CITY, q_tsp_2opt,
    )

    nn = _nn()
    t2 = _two_opt(nn)
    r = q_tsp_2opt(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.tour == ",".join(str(x) for x in t2)
    assert (r.cost, r.nn_cost) == (_cost(t2), _cost(nn))
    assert r.cost <= r.nn_cost
    got = [int(x) for x in r.tour.split(",")]
    assert sorted(got) == list(range(N_CITY)) and got[0] == 0
    # trivial LB: sum over cities of the cheapest incident edge / 2
    lb = sum(
        min(DIST[i][j] for j in range(N_CITY) if j != i)
        for i in range(N_CITY)
    ) // 2
    assert r.cost >= lb
