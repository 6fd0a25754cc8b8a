"""Batch 70: hand-computed fixtures for longest-prefix match and
largest-remainder crawl budgeting."""

import datetime
import hashlib

from ocr_to_csv_spark.functions.netops import (
    CRAWL_BUDGET,
    N_HOSTS_MOD,
    NETWORKS,
    q_crawl_budget,
    q_lpm_join,
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _ip(event_id: int) -> int:
    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16)


def _lpm(ip: int):
    best = None
    for net, prefix, plen in NETWORKS:
        if (ip >> (32 - plen)) << (32 - plen) == prefix:
            if best is None or plen > best[1]:
                best = (net, plen)
    return best


def test_lpm_matches_textbook(spark, tmp_path):
    ts = datetime.datetime(2024, 1, 1)
    events = [(k, ts, 1, "click", 1.0, "{}") for k in range(1, 400)]
    spark.createDataFrame(events, EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    expect: dict = {}
    for k in range(1, 400):
        hit = _lpm(_ip(k))
        if hit:
            key = hit
            expect[key] = expect.get(key, 0) + 1
    rows = q_lpm_join(spark, str(tmp_path)).collect()
    got = {(r["net"], r["prefixlen"]): r["n_ips"] for r in rows}
    assert got == expect
    # the fixture must actually exercise specificity: some /8 or /12 win
    assert any(plen > 4 for _, plen in got)


def test_networks_are_valid_prefixes():
    for net, prefix, plen in NETWORKS:
        assert 0 <= prefix < (1 << 32)
        assert prefix & ((1 << (32 - plen)) - 1) == 0, net


def test_crawl_budget_sums_exactly(spark, tmp_path):
    docs = [(i, f"doc {i}", "en", "web", 5) for i in range(1, 301)]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = q_crawl_budget(spark, str(tmp_path)).collect()
    assert sum(r["budget"] for r in rows) == CRAWL_BUDGET
    assert len(rows) <= N_HOSTS_MOD
    total = sum(r["cnt"] for r in rows)
    for r in rows:
        assert r["base"] == CRAWL_BUDGET * r["cnt"] // total
        assert r["rem_num"] == (CRAWL_BUDGET * r["cnt"]) % total
        assert r["budget"] in (r["base"], r["base"] + 1)


def test_crawl_budget_largest_remainder_priority(spark, tmp_path):
    # counts 1 and 2 over budget 1000: shares 333.33 and 666.67 →
    # bases 333/666, leftover 1 goes to the larger remainder (667)
    docs = []
    i = 1
    made = {}
    # pick doc ids so exactly two hosts appear with counts 1 and 2
    import hashlib as _h

    def host(doc_id):
        return int(_h.md5(str(doc_id).encode()).hexdigest()[:8], 16) % N_HOSTS_MOD

    want = None
    seen = {}
    for doc_id in range(1, 2000):
        h = host(doc_id)
        seen.setdefault(h, []).append(doc_id)
        if want is None:
            two_hosts = [k for k, v in seen.items() if len(v) >= 2]
            if len(seen) >= 2 and two_hosts:
                other = next(k for k in seen if k != two_hosts[0] and seen[k])
                want = (two_hosts[0], other)
    h2, h1 = want
    ids = seen[h2][:2] + seen[h1][:1]
    docs = [(i, "d", "en", "web", 1) for i in ids]
    spark.createDataFrame(docs, DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r["host"]: r for r in q_crawl_budget(spark, str(tmp_path)).collect()}
    big = rows[f"h{h2}"]
    small = rows[f"h{h1}"]
    assert (big["cnt"], small["cnt"]) == (2, 1)
    assert big["base"] == 666 and small["base"] == 333
    assert big["budget"] == 667 and small["budget"] == 333
