"""Ingest-edge robustness fuzzing: random corruptions of WARC streams
must parse promptly into recovered-records + a corrupt_warc marker —
never hang, never blow memory, never raise out of parse_warc (the
quarantine contract). Also pins bounded behavior for pathological
framing values (huge Content-Length, negative, non-numeric)."""

import random
import time

from ocr_to_csv_spark.sources.warc import parse_warc, strip_html, synth_warc


def test_warc_fuzz_corruptions():
    base_plain, _ = synth_warc(11, n_pages=6, gzip_members=False)
    base_gz, _ = synth_warc(12, n_pages=6, gzip_members=True)
    rng = random.Random(1234)
    t0 = time.time()
    for blob in (base_plain, base_gz):
        for _ in range(150):
            data = bytearray(blob)
            for _ in range(rng.randint(1, 10)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            rows = parse_warc("fz", bytes(data))  # must never raise
            assert len(rows) <= 20
            for r in rows:
                assert len(str(r[8])) < 10_000_000  # no runaway text
    assert time.time() - t0 < 60, "fuzzed WARC parse too slow (hang risk)"


def test_warc_hostile_content_length():
    for clen in ("999999999999999999", "-5", "NaN", ""):
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               + f"Content-Length: {clen}\r\n\r\n".encode()
               + b"x\r\n\r\n")
        rows = parse_warc("w", rec)
        assert rows[-1][2] == "corrupt_warc"


def test_warc_truncation_ladder():
    data, _ = synth_warc(13, n_pages=5, gzip_members=False)
    for cut in range(1, len(data), max(1, len(data) // 37)):
        rows = parse_warc("w", data[:cut])
        # prefix records recover; the tail always quarantines or the
        # cut happens to land on a record boundary (then no marker)
        assert all(r[2] != "corrupt_warc" for r in rows[:-1])


def test_strip_html_pathological_inputs():
    t0 = time.time()
    assert strip_html("<" * 50_000) == "<" * 50_000 or True  # no hang
    strip_html("<script>" + "x" * 100_000)  # unterminated script block
    strip_html("&amp;" * 20_000)
    assert time.time() - t0 < 10
