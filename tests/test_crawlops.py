"""Batch 100: robots.txt longest-match evaluation + URL
canonicalization, with a pure-Python robots evaluator mirror and
hand-pinned fixtures for the documented precedence cases."""

import re

SF = "/root/testdata/sf0.001"


def _py_decide(host, target):
    from ocr_to_csv_spark.functions.crawlops import ROBOTS_RULES, _compile

    best = None  # (pat_len, allow, rule_id)
    for rid, h, allow, raw in ROBOTS_RULES:
        if h != host:
            continue
        if re.search(_compile(raw), target):
            key = (len(raw), allow, rid)
            if best is None or key > best:
                best = key
    if best is None:
        return (-1, 1)
    return (best[2], best[1])


def test_robots_match_matches_python_evaluator(spark):
    from ocr_to_csv_spark.functions.crawlops import q_robots_match

    got = q_robots_match(spark, SF).collect()
    assert len(got) > 0
    seen_rules = set()
    for r in got:
        rid, allowed = _py_decide(r.host, r.target)
        assert (r.rule_id, r.allowed) == (rid, allowed), r
        seen_rules.add(r.rule_id)
    # the corpus must actually exercise defaults, allows and disallows
    assert -1 in seen_rules
    assert any(r.allowed == 0 for r in got)
    assert any(r.allowed == 1 and r.rule_id != -1 for r in got)


def test_robots_precedence_pins():
    """The documented Google semantics on hand cases: longest raw
    pattern wins; allow beats disallow on equal length; no match ⇒
    allow."""
    # /p/1xx on h0: disallow /p/ (len 3) vs allow /p/1* (len 5) → allow
    assert _py_decide("h0.example.com", "/p/100") == (2, 1)
    # /p/2xx on h0: only /p/ matches → disallow
    assert _py_decide("h0.example.com", "/p/200") == (1, 0)
    # query URL on h1 → disallowed by /a/*?*
    assert _py_decide("h1.example.com", "/a/11?q=4") == (3, 0)
    # *9$ on h2 only hits trailing 9
    assert _py_decide("h2.example.com", "/p/19") == (4, 0)
    assert _py_decide("h2.example.com", "/p/91") == (-1, 1)
    # h3: /a/ disallow unless ...7$
    assert _py_decide("h3.example.com", "/a/17?q=3") == (5, 0)
    assert _py_decide("h3.example.com", "/a/13?q=7") == (6, 1)
    # no rules host
    assert _py_decide("h4.example.com", "/p/4") == (-1, 1)


def test_url_canonical_matches_python(spark):
    from ocr_to_csv_spark.functions.crawlops import q_url_canonical

    got = q_url_canonical(spark, SF).collect()
    for r in got:
        m = re.match(
            r"^([A-Za-z]+)://([^/]+)(/[^?#]*)(?:\?([^#]*))?(?:#.*)?$", r.url
        )
        sch, auth, path, q = m.groups()
        params = sorted(
            p
            for p in (q or "").split("&")
            if p and not p.startswith("utm_")
        )
        expect = (
            sch.lower()
            + "://"
            + re.sub(r":80$", "", auth.lower())
            + path
            + ("?" + "&".join(params) if params else "")
        )
        assert r.canon == expect, (r.url, r.canon, expect)
    # idempotence: canonicalizing a canonical URL changes nothing
    assert all("#" not in r.canon and "utm_" not in r.canon for r in got)
    # the messy variants actually occurred
    assert any(":80" in r.url for r in got)
    assert any("EXAMPLE" in r.url for r in got)
    assert any("#top" in r.url for r in got)
