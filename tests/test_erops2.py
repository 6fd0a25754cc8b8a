"""Batch 84: soundex blocking + Jaro-Winkler verify."""

SF = "/root/testdata/sf0.001"


def _py_soundex(word):
    """Independent mirror of the documented simplified soundex."""
    classes = {
        **{c: "1" for c in "bfpv"},
        **{c: "2" for c in "cgjkqsxz"},
        **{c: "3" for c in "dt"},
        "l": "4",
        **{c: "5" for c in "mn"},
        "r": "6",
        **{c: "0" for c in "aeiouyhw"},
    }
    d = "".join(classes[c] for c in word)
    out = []
    for c in d:
        if not out or out[-1] != c:
            out.append(c)
    d = "".join(out)
    rest = d[1:] if d[:1] != "0" else d
    digits = rest.replace("0", "")
    return word[0].upper() + (digits[:3] + "000")[:3]


def test_soundex_textbook_values():
    assert _py_soundex("robert") == "R163"
    assert _py_soundex("rupert") == "R163"
    assert _py_soundex("tymczak") in ("T522", "T520")  # h/w rule out of scope
    assert _py_soundex("pfister") == "P236"  # simplified: p,f same class collapse
    assert _py_soundex("small") == "S540"


def test_soundex_block_matches_python_mirror(spark):
    from ocr_to_csv_spark.functions.erops2 import q_soundex_block

    rows = q_soundex_block(spark, SF).collect()
    assert rows
    sizes = {}
    for r in rows:
        assert r.sdx == _py_soundex(r.t1), r.t1
        key = (r.sdx, r.t1_len)
        sizes.setdefault(key, set()).add(r.t1)
    for r in rows:
        assert r.block_size == len(sizes[(r.sdx, r.t1_len)])


def test_jaro_winkler_known_pairs(spark):
    """UDF scores equal the textbook values AND the oracle engine's
    builtin on a planted frame."""
    import duckdb

    from ocr_to_csv_spark.functions.erops2 import _jw_py

    con = duckdb.connect()
    pairs = [
        ("martha", "marhta"), ("dixon", "dicksonx"), ("a", "a"),
        ("ab", "ba"), ("almond antique", "almond azure"),
        ("abcdefghij", "abcxyzuvwq"),  # exercises the 0.7 boost gate
        ("x", ""),
    ]
    for a, b in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert round(_jw_py(a, b), 9) == round(want, 9), (a, b)
    assert abs(_jw_py("martha", "marhta") - 0.9611111111111111) < 1e-12


def test_jaro_winkler_pairs_confined_to_blocks(spark):
    """Every emitted pair shares a (soundex, length) block, scores meet
    the threshold, and a planted near-identical pair appears."""
    from ocr_to_csv_spark.functions.erops2 import (
        JW_THRESHOLD,
        _jw_py,
        q_jaro_winkler,
        q_soundex_block,
    )

    blocks = {
        r.t1: (r.sdx, r.t1_len) for r in q_soundex_block(spark, SF).collect()
    }
    got = q_jaro_winkler(spark, SF).collect()
    assert got, "threshold must admit pairs at this sf"
    for r in got:
        t1a, t1b = r.name_a.split(" ")[0], r.name_b.split(" ")[0]
        assert blocks[t1a] == blocks[t1b]
        assert r.jw >= JW_THRESHOLD
        assert r.jw == round(_jw_py(r.name_a, r.name_b), 9)
