"""Batch 106: Haar energy + SAX words — python mirrors over the raw
events, the exact Parseval identity, and SAX fixtures."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _series_py():
    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["ts", "event_type"]) for f in files
    )
    # parquet ts loads as datetime64[us] — convert to epoch seconds
    # explicitly, not via astype(int64) (unit-dependent)
    secs = (e.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    e["day"] = (secs // 86400).astype(int)
    out = {}
    for typ, grp in e.groupby("event_type"):
        days = grp.groupby("day").size().sort_index()
        out[typ] = days.tolist()
    return out


def _pad(xs, n=64):
    return (list(xs) + [0] * n)[:n]


def _haar_py(xs):
    from ocr_to_csv_spark.functions.waveops import LEVELS, PAD

    p = _pad(xs, PAD)
    cur = p
    energies = []
    for _ in range(LEVELS):
        d = [cur[2 * j] - cur[2 * j + 1] for j in range(len(cur) // 2)]
        cur = [cur[2 * j] + cur[2 * j + 1] for j in range(len(cur) // 2)]
        energies.append(sum(x * x for x in d))
    return cur[0], energies


def test_haar_energy_matches_python_pyramid(spark):
    """The block-sum formulation must equal the textbook chained
    pyramid — algebraically identical, independently coded."""
    from ocr_to_csv_spark.functions.waveops import LEVELS, q_haar_energy

    series = _series_py()
    got = {r.typ: r for r in q_haar_energy(spark, SF).collect()}
    assert set(got) == set(series)
    for typ, xs in series.items():
        dc, energies = _haar_py(xs)
        r = got[typ]
        assert r.dc == dc == sum(xs)
        assert [r[f"e{t}"] for t in range(1, LEVELS + 1)] == energies
        assert r.n_days == len(xs)


def test_haar_parseval_identity(spark):
    """2^L·Σx² = Σ_t 2^{L−t}·E_t + dc² — exactly, in integers."""
    from ocr_to_csv_spark.functions.waveops import LEVELS, q_haar_energy

    series = _series_py()
    for r in q_haar_energy(spark, SF).collect():
        xs = _pad(series[r.typ])
        lhs = (1 << LEVELS) * sum(x * x for x in xs)
        rhs = sum(
            (1 << (LEVELS - t)) * r[f"e{t}"] for t in range(1, LEVELS + 1)
        ) + r.dc * r.dc
        assert lhs == rhs, r.typ


def test_sax_word_matches_python(spark):
    from ocr_to_csv_spark.functions.waveops import (
        PAD,
        SEGMENTS,
        SYMS,
        q_sax_word,
    )

    series = _series_py()
    got = {r.typ: r for r in q_sax_word(spark, SF).collect()}
    w = PAD // SEGMENTS
    for typ, xs in series.items():
        p = _pad(xs, PAD)
        seg = [sum(p[i * w : (i + 1) * w]) for i in range(SEGMENTS)]
        smin, smax = min(seg), max(seg)
        word = "".join(
            chr(97 + (v - smin) * SYMS // (smax - smin + 1)) for v in seg
        )
        r = got[typ]
        assert (r.word, r.seg_min, r.seg_max) == (word, smin, smax), typ
        # symbols stay inside the 4-letter alphabet
        assert set(r.word) <= set("abcd")
    # padding tail forces the last segments toward 'a' (zeros)
    assert all(r.word[-1] == "a" for r in got.values())
