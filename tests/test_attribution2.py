"""Batch 90: Markov removal-effect attribution."""

import glob

import pandas as pd

SF = "/root/testdata/sf0.001"


def _mirror():
    from ocr_to_csv_spark.functions.attribution2 import (
        CHANNELS,
        K_ITERS,
        SCEN,
    )

    files = sorted(glob.glob(f"{SF}/events.parquet")) or sorted(
        glob.glob(f"{SF}/events.parquet/*.parquet")
    )
    e = pd.concat(
        pd.read_parquet(f, columns=["user_id", "ts", "event_id", "event_type"])
        for f in files
    )
    e = e[e.user_id.notna()]
    cnt = {}
    for _, grp in e.groupby("user_id"):
        grp = grp.sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        states = [
            "CONV" if t == "purchase" else t for t in grp.event_type
        ]
        if "CONV" in states:
            states = states[: states.index("CONV") + 1]
            chain = ["START"] + states
        else:
            chain = ["START"] + states + ["NULL"]
        for a, b in zip(chain, chain[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    a_states = ["START"] + CHANNELS
    b_states = CHANNELS + ["CONV", "NULL"]
    p = {}
    for a in a_states:
        tot = sum(cnt.get((a, b), 0) for b in b_states)
        for b in b_states:
            p[(a, b)] = (cnt.get((a, b), 0) / tot) if tot > 0 else 0.0

    def run(skip):
        f = {b: 0.0 for b in CHANNELS if b != skip}
        for _ in range(K_ITERS):
            nf = {}
            for a in CHANNELS:
                if a == skip:
                    continue
                v = 0.0
                first = True
                for b in CHANNELS:
                    if b == skip:
                        continue
                    t = p[(a, b)] * f[b]
                    v = t if first else v + t
                    first = False
                nf[a] = v + p[(a, "CONV")]
            f = nf
        v = 0.0
        first = True
        for b in CHANNELS:
            if b == skip:
                continue
            t = p[("START", b)] * f[b]
            v = t if first else v + t
            first = False
        return round(v + p[("START", "CONV")], 9)

    base = run(None)
    return {c: (base, run(c), round(base - run(c), 9)) for c in CHANNELS}


def test_markov_removal_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.attribution2 import q_markov_removal

    want = _mirror()
    got = {
        r.channel: (r.p_base, r.p_removed, r.removal_effect)
        for r in q_markov_removal(spark, SF).collect()
    }
    assert set(got) == set(want)
    for c in want:
        gb, gr, ge = got[c]
        wb, wr, we = want[c]
        assert abs(gb - wb) < 1e-9 and abs(gr - wr) < 1e-9
        assert abs(ge - we) < 1e-9
    # structural properties of the model
    for c, (b, r, eff) in got.items():
        assert 0.0 <= r <= b <= 1.0, c  # removal can only hurt
    assert any(eff > 0 for _, _, eff in got.values())


def test_removal_effect_planted_model():
    """Hand-built chain: every conversion routes through 'click', so
    removing click zeroes P(conv) while removing 'error' does not."""
    from ocr_to_csv_spark.functions.attribution2 import CHANNELS, K_ITERS

    p = {}
    a_states = ["START"] + CHANNELS
    b_states = CHANNELS + ["CONV", "NULL"]
    for a in a_states:
        for b in b_states:
            p[(a, b)] = 0.0
    p[("START", "click")] = 0.8
    p[("START", "error")] = 0.2
    p[("click", "CONV")] = 0.5
    p[("click", "NULL")] = 0.5
    p[("error", "NULL")] = 1.0

    def run(skip):
        f = {b: 0.0 for b in CHANNELS if b != skip}
        for _ in range(K_ITERS):
            f = {
                a: sum(p[(a, b)] * f[b] for b in CHANNELS if b != skip)
                + p[(a, "CONV")]
                for a in CHANNELS
                if a != skip
            }
        return sum(
            p[("START", b)] * f[b] for b in CHANNELS if b != skip
        ) + p[("START", "CONV")]

    assert abs(run(None) - 0.4) < 1e-12
    assert run("click") == 0.0
    assert abs(run("error") - 0.4) < 1e-12
