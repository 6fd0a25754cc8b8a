"""Batch 113: modularity + anchor-text — python-mirror goldens and the
modularity identities (Σ intra ≤ 2m, Σ degree_sum = 2m)."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )


def _sym_edges(n):
    e = set()
    for d in range(n):
        for dst in (
            [(2 * d + 1) % n] if d % 3 != 0 else []
        ) + ([(7 * d + 3) % n] if d % 2 == 0 else []) + (
            [(d + n // 2) % n] if d % 6 == 1 else []
        ):
            if dst != d:
                e.add((d, dst))
                e.add((dst, d))
    return e


def test_modularity_matches_python(spark):
    from ocr_to_csv_spark.functions.webgraph import K_COMM, q_modularity_score

    n = len(_docs())
    sym = _sym_edges(n)
    two_m = len(sym)
    intra = {}
    dsum = {}
    for s, d in sym:
        c = s % K_COMM
        dsum[c] = dsum.get(c, 0) + 1
        if d % K_COMM == c:
            intra[c] = intra.get(c, 0) + 1
    rows = q_modularity_score(spark, SF).collect()
    assert [r.community for r in rows] == sorted(dsum)
    for r in rows:
        assert r.two_m == two_m
        assert r.intra_sym == intra.get(r.community, 0)
        assert r.degree_sum == dsum[r.community]
        assert r.q_num == two_m * r.intra_sym - r.degree_sum**2
    # identities: degree mass partitions all arcs; intra is a subset
    assert sum(r.degree_sum for r in rows) == two_m
    assert sum(r.intra_sym for r in rows) <= two_m


def test_anchor_text_matches_python(spark):
    from ocr_to_csv_spark.functions.webgraph import TOP_TERMS, q_anchor_text

    docs = _docs()
    links = []
    for _, r in docs.iterrows():
        did = int(r.doc_id)
        toks = [t for t in str(r.text).split() if t]
        t1 = (toks[0] if len(toks) >= 1 else "link").lower()
        t2 = (toks[1] if len(toks) >= 2 else "link").lower()
        if did % 2 == 0:
            links.append((did, f"h{did % 5}.example.com", t1))
        if did % 6 == 0:
            links.append((did, f"cdn{did % 3}.example.net", t2))
    per = {}
    totals = {}
    for did, host, term in links:
        k = (host, term)
        cnt, srcs = per.get(k, (0, set()))
        srcs = set(srcs)
        srcs.add(did)
        per[k] = (cnt + 1, srcs)
        totals[host] = totals.get(host, 0) + 1
    gold = []
    for host in sorted(totals):
        terms = sorted(
            ((c, t) for (h, t), (c, _) in per.items() if h == host),
            key=lambda p: (-p[0], p[1]),
        )[:TOP_TERMS]
        for i, (c, t) in enumerate(terms, 1):
            gold.append(
                (host, i, t, c, len(per[(host, t)][1]), totals[host])
            )
    got = [
        (r.dst_host, r.rank, r.term, r.cnt, r.n_src_docs, r.host_links)
        for r in q_anchor_text(spark, SF).collect()
    ]
    assert got == gold
    # every even doc links somewhere: host totals cover them all
    n = len(docs)
    assert sum(totals.values()) == (n + 1) // 2 + (n + 5) // 6
