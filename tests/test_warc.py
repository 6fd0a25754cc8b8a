"""WARC source: framing, multi-member gzip, HTTP split, HTML strip,
quarantine. Reference parity: the web-scale analogue of the reference's
directory-scan ingestion (modules/image_scraper.py) — crawl corpora
arrive as WARC segments, not image folders."""

import gzip

import pytest

from ocr_to_csv_spark.sources.warc import (
    iter_warc_records,
    parse_warc,
    strip_html,
    synth_warc,
)


def test_roundtrip_plain_matches_expected():
    data, exp = synth_warc(4, n_pages=8, gzip_members=False)
    rows = parse_warc("warc-4", data)
    assert len(rows) == len(exp) == 10  # warcinfo + request + 8 pages
    for row, e in zip(rows, exp):
        assert row == (
            e["warc_ref"], e["rec_idx"], e["rec_type"], e["url"],
            e["host"], e["status"], e["mime"], e["payload_bytes"],
            e["text"], e["n_tokens"],
        )


def test_roundtrip_gzip_members():
    data, exp = synth_warc(3, n_pages=6, gzip_members=True)
    assert data[:2] == b"\x1f\x8b"
    rows = parse_warc("warc-3", data)
    assert [r[3] for r in rows] == [e["url"] for e in exp]
    assert [r[8] for r in rows] == [e["text"] for e in exp]


def test_truncated_tail_recovers_prefix():
    data, exp = synth_warc(2, n_pages=5, gzip_members=False)
    rows = parse_warc("warc-2", data[:-3])
    # all but the final record recover; the tail quarantines
    assert len(rows) == len(exp)
    assert [r[2] for r in rows[:-1]] == [e["rec_type"] for e in exp[:-1]]
    assert rows[-1][2] == "corrupt_warc" and rows[-1][1] == -1


def test_junk_and_truncated_gzip_quarantine():
    assert parse_warc("x", b"GIF89a not a warc")[0][2] == "corrupt_warc"
    data, _ = synth_warc(5, gzip_members=True)
    rows = parse_warc("x", data[: len(data) // 2])
    assert rows[-1][2] == "corrupt_warc"  # truncated gzip member


def test_strip_html_drops_script_style_and_decodes_entities():
    html = ("<html><head><style>p{x}</style><script>var a='<p>no</p>';"
            "</script></head><body><h1>T</h1><p>a &amp; b</p>"
            "<p>x&nbsp;y</p></body></html>")
    assert strip_html(html) == "T a & b x y"


def test_http_edge_cases():
    # 404 empty body and missing Content-Type header
    body = b"HTTP/1.1 404 Not Found\r\n\r\n"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://h/x\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           + f"Content-Length: {len(body)}\r\n\r\n".encode()
           + body + b"\r\n\r\n")
    rows = parse_warc("w", rec)
    assert rows == [("w", 0, "response", "http://h/x", "h", 404, "",
                     len(body), "", 0)]


def test_bad_content_length_quarantines():
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: banana\r\n\r\nxx\r\n\r\n")
    assert parse_warc("w", rec)[0][2] == "corrupt_warc"


def test_records_iterator_raises_on_bad_magic():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_spark_warc_queries_match_goldens(spark):
    import duckdb

    import __spark_entry__ as e

    got = e.q_warc_extract(spark, "").toPandas()
    gold_sql = e.oracle_sql()["warc_extract"]
    exp = duckdb.sql(gold_sql).df()
    key = ["warc_ref", "rec_idx", "url"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in got.columns:
        assert got[c].fillna("∅").astype(str).tolist() == \
            exp[c].fillna("∅").astype(str).tolist(), c
    hosts = e.q_warc_hosts(spark, "").toPandas()
    assert (hosts["n_pages"] >= hosts["n_ok"]).all()
    assert hosts["host"].notna().all()
