"""Batch 121: ring rebalance + front-coding estimate — python mirrors
and the consistent-hashing guarantee (all movement lands ON the new
node, movement share ≈ 1/(N+1))."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_ring_rebalance_matches_python(spark):
    from ocr_to_csv_spark.functions.curation8 import N_NODES, N_VNODES
    from ocr_to_csv_spark.functions.opsaudit import q_ring_rebalance

    def ring(n_nodes):
        pts = sorted(
            (_h32(f"ring|{node}.{v}"), node)
            for node in range(n_nodes)
            for v in range(N_VNODES)
        )
        return pts

    r0, r1 = ring(N_NODES), ring(N_NODES + 1)

    def assign(pts, k):
        for p, node in pts:
            if p >= k:
                return node
        return pts[0][1]

    cells = {}
    for did in _docs().doc_id:
        k = _h32(f"doc|{int(did)}")
        key = (assign(r0, k), assign(r1, k))
        cells[key] = cells.get(key, 0) + 1
    total = sum(cells.values())
    moved = sum(c for (a, b), c in cells.items() if a != b)
    got = {
        (r.old_node, r.new_node): (r.n_docs, r.moved, r.total_docs, r.moved_total)
        for r in q_ring_rebalance(spark, SF).collect()
    }
    assert got == {
        (a, b): (c, int(a != b), total, moved) for (a, b), c in cells.items()
    }
    # the consistent-hashing guarantee: every moved doc lands ON the
    # new node, and the movement share is within 3x of 1/(N+1)
    for (a, b), c in cells.items():
        if a != b:
            assert b == N_NODES
    assert moved / total < 3 / (N_NODES + 1)


def test_dict_compress_est_matches_python(spark):
    from ocr_to_csv_spark.functions.opsaudit import LCP_MAX, q_dict_compress_est

    terms = sorted(
        {t for txt in _docs().text for t in str(txt).split() if t}
    )
    raw = sum(len(t) for t in terms)
    lcp_tot = 0
    for prev, t in zip(terms, terms[1:]):
        n = 0
        for a, b in zip(prev[:LCP_MAX], t[:LCP_MAX]):
            if a != b:
                break
            n += 1
        lcp_tot += n
    r = q_dict_compress_est(spark, SF).collect()[0]
    assert (r.n_terms, r.raw_bytes, r.lcp_bytes) == (len(terms), raw, lcp_tot)
    assert r.fc_bytes == raw - lcp_tot
    assert r.savings_milli == lcp_tot * 1000 // raw
