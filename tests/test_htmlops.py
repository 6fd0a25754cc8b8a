"""Batch 126: html_meta + dom_depth_stats — python mirrors of the
synthesized markup and its harvesting, plus the structural invariants
(malformed slice = the %14 docs; imbalance 1 exactly for the
dropped-tag slice)."""

import glob
import re

import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    files = sorted(glob.glob(f"{SF}/documents.parquet")) or sorted(
        glob.glob(f"{SF}/documents.parquet/*.parquet")
    )
    return pd.concat(
        pd.read_parquet(f, columns=["doc_id", "text"]) for f in files
    )


def test_html_meta_matches_python(spark):
    from ocr_to_csv_spark.functions.htmlops import NOTITLE_MOD, q_html_meta

    gold = {}
    for r in _docs().itertuples(index=False):
        did = int(r.doc_id)
        toks = [t for t in str(r.text).split() if t]
        t1 = toks[0] if len(toks) >= 1 else "untitled"
        t2 = toks[1] if len(toks) >= 2 else ""
        desc = " ".join(
            [toks[i] if len(toks) > i else "" for i in (2, 3, 4)]
        )
        title = "" if did % NOTITLE_MOD == 0 else f"{t1} {t2}"
        gold[did] = (title, desc, f"http://ex.com/d/{did}", int(title == ""))
    got = {
        r.doc_id: (r.title, r.description, r.canonical, r.malformed)
        for r in q_html_meta(spark, SF).collect()
    }
    assert got == gold
    # the malformed slice is exactly the %NOTITLE_MOD == 0 docs
    for did, v in got.items():
        assert v[3] == (1 if did % NOTITLE_MOD == 0 else 0)


def test_dom_depth_stats_matches_python(spark):
    from ocr_to_csv_spark.functions.htmlops import (
        DEPTH_MOD,
        DROP_MOD,
        q_dom_depth_stats,
    )

    hist = {}
    for r in _docs().itertuples(index=False):
        did = int(r.doc_id)
        k = did % DEPTH_MOD + 1
        opens = [
            "<div>" if i % 2 == 1 else "<section>" for i in range(1, k + 1)
        ]
        closes = [
            "</div>" if (k - i + 1) % 2 == 1 else "</section>"
            for i in range(1, k + 1)
        ]
        if did % DROP_MOD == 0:
            closes = closes[: k - 1]
        html = "<body>" + "".join(opens) + "x" + "".join(closes) + "</body>"
        depth = mx = 0
        for tag in re.findall(r"</?[a-z]+>", html):
            depth += -1 if tag.startswith("</") else 1
            mx = max(mx, depth)
        hist[(mx, depth)] = hist.get((mx, depth), 0) + 1
    got = {
        (r.max_depth, r.imbalance): r.n_docs
        for r in q_dom_depth_stats(spark, SF).collect()
    }
    assert got == hist
    # dropped-tag docs leave exactly one unclosed element (imbalance 1
    # before </body> closes the body: net imbalance of the whole doc
    # is 1 for them, 0 otherwise)
    assert set(i for (_, i) in got) <= {0, 1}
