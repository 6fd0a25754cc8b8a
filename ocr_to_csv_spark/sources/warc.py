"""WARC (Web ARChive) source — the container format web-scale training
corpora actually arrive in (Common Crawl ships ~1 GB ``.warc.gz``
segments; ISO 28500). Pure stdlib: no warcio dependency.

Reference parity: the reference scrapes documents from a directory of
image files (``modules/image_scraper.py``); the web-scale analogue of
"a directory of scans" is "a bucket of WARC segments", so this source
gives the same entry point for crawl data that ``sources/pdf.py`` gives
for PDFs.

Scale story (100 TB): crawl archives are read via
``spark.read.format("binaryFile")`` — one task per ``.warc.gz`` file,
which is exactly how Common Crawl is laid out (tens of thousands of
~1 GB members ⇒ natural partitioning with zero shuffle). Record-level
fan-out happens INSIDE an Arrow-batched ``mapInPandas`` stage; nothing
crosses a shuffle until the caller aggregates. Per-record gzip members
(the CC convention) decompress independently, so a corrupt member
quarantines one record set, not the file.

Quarantine contract (same as the image/PDF/WAV decoders): a parse
failure mid-stream emits the records recovered so far PLUS one
``rec_type='corrupt_warc'`` marker row — never a task failure.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

WARC_SCHEMA = (
    "warc_ref string, rec_idx int, rec_type string, url string, "
    "host string, status int, mime string, payload_bytes long, "
    "text string, n_tokens long"
)

_CRLF = b"\r\n"


# ---------------------------------------------------------------- synth

def _page_html(k: int) -> tuple[str, str]:
    """Deterministic HTML page + the EXACT text the extractor must
    recover (computed here, pre-encode — the golden-oracle convention of
    ``extraction/audio.py:synth_wav``)."""
    title = f"Crawl page {k}"
    words = " ".join(f"w{(k * 7 + i) % 23}" for i in range(10 + k % 9))
    amp = "cats & dogs" if k % 3 == 0 else "plain"
    body_text = f"{words} {amp}"
    html = (
        f"<html><head><title>{title}</title>"
        "<style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        f"<body><h1>{title}</h1><p>{words}</p>"
        f"<p>{amp.replace('&', '&amp;')}</p></body></html>"
    )
    return html, f"{title} {title} {body_text}"


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers
    )
    head += f"Content-Length: {len(payload)}\r\n".encode()
    return head + _CRLF + payload + _CRLF + _CRLF


def synth_warc(seed: int, n_pages: int = 6, gzip_members: bool = False):
    """Deterministic WARC file: 1 warcinfo + 1 request + n_pages response
    records (HTML 200s, every 5th a text/plain, every 7th a 404 with an
    empty body). Returns (warc_bytes, expected_rows) where expected text
    is computed from the pre-encode page text."""
    ref = f"warc-{seed}"
    date = f"2026-01-{(seed % 27) + 1:02d}T00:00:00Z"
    recs: list[bytes] = []
    expected: list[dict] = []

    info_payload = b"software: ocr-to-csv-spark-datagen\r\n"
    recs.append(_warc_record(
        [("WARC-Type", "warcinfo"), ("WARC-Date", date),
         ("WARC-Record-ID", f"<urn:uuid:{seed}-info>"),
         ("Content-Type", "application/warc-fields")],
        info_payload,
    ))
    expected.append({
        "warc_ref": ref, "rec_idx": 0, "rec_type": "warcinfo",
        "url": None, "host": None, "status": -1,
        "mime": "application/warc-fields",
        "payload_bytes": len(info_payload), "text": "", "n_tokens": 0,
    })

    req_url = f"https://h{seed % 5}.example.org/robots.txt"
    req_payload = (
        b"GET /robots.txt HTTP/1.1\r\nHost: example.org\r\n\r\n"
    )
    recs.append(_warc_record(
        [("WARC-Type", "request"), ("WARC-Target-URI", req_url),
         ("WARC-Date", date),
         ("WARC-Record-ID", f"<urn:uuid:{seed}-req>"),
         ("Content-Type", "application/http;msgtype=request")],
        req_payload,
    ))
    expected.append({
        "warc_ref": ref, "rec_idx": 1, "rec_type": "request",
        "url": req_url, "host": f"h{seed % 5}.example.org", "status": -1,
        "mime": "", "payload_bytes": len(req_payload),
        "text": "", "n_tokens": 0,
    })

    for k in range(n_pages):
        url = f"https://h{(seed + k) % 5}.example.org/p/{seed}/{k}"
        host = f"h{(seed + k) % 5}.example.org"
        if k % 7 == 6:  # 404, empty body
            status, mime, body, text = 404, "text/html", b"", ""
        elif k % 5 == 4:  # plain text passes through un-stripped
            text = f"plain text record {seed} {k}"
            status, mime, body = 200, "text/plain", text.encode()
        else:
            html, text = _page_html(seed * 100 + k)
            status, mime, body = 200, "text/html", html.encode()
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {mime}; "
            f"charset=utf-8\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        recs.append(_warc_record(
            [("WARC-Type", "response"), ("WARC-Target-URI", url),
             ("WARC-Date", date),
             ("WARC-Record-ID", f"<urn:uuid:{seed}-{k}>"),
             ("Content-Type", "application/http;msgtype=response")],
            http,
        ))
        expected.append({
            "warc_ref": ref, "rec_idx": k + 2, "rec_type": "response",
            "url": url, "host": host, "status": status, "mime": mime,
            "payload_bytes": len(http), "text": text,
            "n_tokens": len(text.split()),
        })

    raw = (
        b"".join(gzip.compress(r, mtime=0) for r in recs)
        if gzip_members else b"".join(recs)
    )
    return raw, expected


# ---------------------------------------------------------------- parse

def _gunzip_members(data: bytes) -> bytes:
    """Decompress a multi-member gzip stream (the Common Crawl per-record
    convention) — loop on zlib unused_data; gzip.decompress alone stops
    at member boundaries on some versions."""
    out = []
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(buf))
        out.append(d.flush())
        if not d.eof:  # truncated final member
            raise ValueError("truncated gzip member")
        buf = d.unused_data
    return b"".join(out)


def iter_warc_records(data: bytes):
    """Yield (headers: dict lowercase→value, payload: bytes) per record.
    Raises ValueError on a malformed/truncated stream — callers map that
    to the corrupt_warc quarantine row."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad record magic at {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("truncated record header")
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad Content-Length")
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError("truncated record payload")
        if data[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError("bad record terminator")
        yield headers, data[body_start:body_end]
        pos = body_end + 4


_TAG_DROP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")
_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
        "&#39;": "'", "&nbsp;": " "}


def strip_html(html: str) -> str:
    """Visible text: drop script/style subtrees, replace tags with
    spaces, decode the five common entities, collapse whitespace."""
    s = _TAG_DROP.sub(" ", html)
    s = _TAG.sub(" ", s)
    for e, c in _ENT.items():
        s = s.replace(e, c)
    return _WS.sub(" ", s).strip()


def _parse_http(payload: bytes) -> tuple[int, str, bytes]:
    """(status, mime, body) from an application/http payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return -1, "", b""
    head_lines = payload[:sep].split(_CRLF)
    try:
        status = int(head_lines[0].split()[1])
    except (IndexError, ValueError):
        status = -1
    mime = ""
    for line in head_lines[1:]:
        k, _, v = line.decode("utf-8", "replace").partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip().split(";")[0].strip()
    return status, mime, payload[sep + 4:]


def _host(url: str) -> str | None:
    m = re.match(r"https?://([^/]+)", url)
    return m.group(1) if m else None


def parse_warc(ref: str, data: bytes) -> list[tuple]:
    """One WARC blob → record tuples matching WARC_SCHEMA. Partial
    streams yield recovered records + one corrupt_warc marker."""
    rows: list[tuple] = []
    try:
        # broad except is the contract: ANY parse failure (bad framing
        # ValueError, zlib.error from a corrupted gzip member, hostile
        # header values) quarantines the tail — never a task failure
        for idx, (headers, payload) in enumerate(iter_warc_records(data)):
            rtype = headers.get("warc-type", "unknown")
            url = headers.get("warc-target-uri")
            wmime = headers.get("content-type", "")
            if wmime.split(";")[0].strip() == "application/http" and \
                    "msgtype=response" in wmime.replace(" ", ""):
                status, mime, body = _parse_http(payload)
                raw_text = body.decode("utf-8", "replace")
                text = (
                    strip_html(raw_text) if mime == "text/html"
                    else _WS.sub(" ", raw_text).strip()
                )
            else:
                status, mime, text = -1, "", ""
                if rtype == "warcinfo":
                    mime = wmime.split(";")[0].strip()
            rows.append((
                ref, idx, rtype, url,
                _host(url) if url else None, status, mime,
                len(payload), text, len(text.split()),
            ))
    except Exception:
        rows.append((ref, -1, "corrupt_warc", None, None, -1, "",
                     -1, "", -1))
    return rows


def _warc_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["warc_ref", "rec_idx", "rec_type", "url", "host", "status",
            "mime", "payload_bytes", "text", "n_tokens"]
    dtypes = {"rec_idx": "int32", "status": "int32",
              "payload_bytes": "int64", "n_tokens": "int64"}
    for pdf in it:
        recs = [
            row
            for ref, content in zip(pdf["warc_ref"], pdf["content"])
            for row in parse_warc(ref, bytes(content))
        ]
        yield pd.DataFrame({
            c: pd.Series([r[i] for r in recs], dtype=dtypes.get(c, "object"))
            for i, c in enumerate(cols)
        })


def warc_records(warcs: DataFrame) -> DataFrame:
    """(warc_ref, content:binary) → one row per WARC record. Arrow-
    batched ``mapInPandas``; parallelism follows the input file layout
    (one ~1 GB segment per task at crawl scale — no shuffle here)."""
    return warcs.select("warc_ref", "content").mapInPandas(
        _warc_batches, schema=WARC_SCHEMA
    )
