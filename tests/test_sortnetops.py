"""Batch 168: Batcher network + pancake sort — python mirrors and the
structural pins (the 63-comparator network sorts every probe array;
pancake flips <= 2n-3 and the result is sorted)."""

import hashlib


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _arr(tag):
    from ocr_to_csv_spark.functions.sortnetops import SN_N

    return [_h32(f"sn|{tag}|{i}") % 10000 for i in range(SN_N)]


def test_batcher_matches_python(spark):
    from ocr_to_csv_spark.functions.sortnetops import (
        BATCHER, N_ARRAYS, q_batcher_sort,
    )

    got = {
        r.arr_id: (r.n_comparators, r.sorted_ok, r.head, r.tail)
        for r in q_batcher_sort(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(got) == N_ARRAYS
    for tag in range(N_ARRAYS):
        a = _arr(tag)
        b = list(a)
        for i, j in BATCHER:
            if b[i] > b[j]:
                b[i], b[j] = b[j], b[i]
        nc, ok, head, tail = got[tag]
        assert nc == len(BATCHER) == 63
        assert ok == 1 and b == sorted(a)
        assert (head, tail) == (min(a), max(a))


def test_pancake_matches_python(spark):
    from ocr_to_csv_spark.functions.sortnetops import (
        N_ARRAYS, SN_N, q_pancake_sort,
    )

    got = {
        r.arr_id: (r.n_flips, r.sorted_ok)
        for r in q_pancake_sort(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(got) == N_ARRAYS
    for tag in range(N_ARRAYS):
        a = _arr(tag)
        arr = list(a)
        flips = 0
        for k in range(SN_N, 1, -1):
            mx = max(arr[:k])
            pos = arr.index(mx) + 1
            if pos == k:
                continue
            if pos != 1:
                arr[:pos] = reversed(arr[:pos])
                flips += 1
            arr[:k] = reversed(arr[:k])
            flips += 1
        nf, ok = got[tag]
        assert nf == flips and ok == 1
        assert arr == sorted(a)
        assert nf <= 2 * SN_N - 3
