"""Per-operator unit tests (SURVEY.md §5.2): lattice transforms X11-X14
and matcher scoring J1/J4/A1/A3 against hand-computed expectations that
encode the reference's exact positional-decay weights
(reference modules/corrections.py:241-254) and control-flow quirks."""

import numpy as np
import pytest

from ocr_to_csv_spark.extraction import lattice as L
from ocr_to_csv_spark.extraction.matchers import (
    _decay_score,
    match_hour,
    match_name,
    match_time,
)
from ocr_to_csv_spark.imaging import ops


# ---- X11 confusion enrichment --------------------------------------------


def test_enrich_injects_at_max_lookalike_prob():
    lat = [[{"8": 0.6, "&": 0.4}]]
    L.enrich(lat, "a")
    assert lat[0][0]["B"] == 0.6  # max over present look-alikes


def test_enrich_cascades_in_table_order():
    # 'd': the '2' rule fires on 'z' first; the later '7' rule then sees
    # the injected '2' as a present look-alike
    lat = [[{"z": 0.5}]]
    L.enrich(lat, "d")
    assert lat[0][0]["2"] == 0.5
    assert lat[0][0]["7"] == 0.5


def test_enrich_keeps_existing_and_is_idempotent():
    lat = [[{"B": 0.9, "8": 0.3}]]
    L.enrich(lat, "a")
    assert lat[0][0]["B"] == 0.9  # present target untouched
    snapshot = [[dict(s) for s in w] for w in lat]
    L.enrich(lat, "a")
    assert lat == snapshot


# ---- X12 case folding -----------------------------------------------------


def test_fold_case_max_merges_collisions():
    lat = [[{"A": 0.3, "a": 0.5}, {"A": 0.7, "a": 0.2}, {"X": 0.4}]]
    L.fold_case(lat)
    assert lat == [[{"a": 0.5}, {"a": 0.7}, {"x": 0.4}]]


# ---- X13 word stitching ---------------------------------------------------


def test_stitch_fuses_tail_when_largest_first():
    lat = [[{"a": 1}, {"b": 1}, {"c": 1}], [{"d": 1}], [{"e": 1}]]
    L.stitch_words(lat)
    assert len(lat) == 2
    assert [list(s)[0] for s in lat[1]] == ["d", "e"]


def test_stitch_fuses_head_when_largest_last():
    lat = [[{"a": 1}], [{"b": 1}], [{"c": 1}, {"d": 1}, {"e": 1}]]
    L.stitch_words(lat)
    assert len(lat) == 2
    assert [list(s)[0] for s in lat[0]] == ["a", "b"]


# ---- X14 capped enumeration ----------------------------------------------


def test_enumerate_exact_when_small():
    word = [{"a": 0.9, "b": 0.1}, {"c": 0.5}]
    assert sorted(L.enumerate_candidates(word)) == [("a", "c"), ("b", "c")]


def test_enumerate_beam_is_a_hard_cap():
    word = [{str(i): 1.0 / (i + 1) for i in range(10)} for _ in range(20)]
    out = list(L.enumerate_candidates(word, beam=4096))
    assert len(out) <= 4096
    # pruning is deterministic: highest-prob candidates survive
    assert out[0][0] == "0"


# ---- J1 positional-decay scoring -----------------------------------------


def test_decay_exact_positions():
    assert _decay_score("ab", [{"a": 0.9}, {"b": 0.8}]) == pytest.approx(1.7)


def test_decay_none_shift_full_credit():
    slots = [{None: 0.1, "x": 0.5}, {"a": 0.6}, {"b": 0.7}]
    # 'a' shifts right at full credit past the None slot; 'b' found at
    # next position without a None → ×0.75
    assert _decay_score("ab", slots) == pytest.approx(0.6 + 0.7 * 0.75)


def test_decay_next_075_prev_05():
    assert _decay_score("ab", [{"x": 1.0}, {"a": 0.4}]) == pytest.approx(0.3)
    assert _decay_score("ba", [{"a": 0.4}, {"b": 0.5}]) == pytest.approx(
        0.5 * 0.75 + 0.4 * 0.5
    )


def test_match_name_single_word_argmax_and_threshold():
    def outs():
        return [[[{"a": 0.9}, {"n": 0.8}, {"n": 0.7}]] for _ in range(3)]

    text, prob, acc = match_name(outs(), ["ann", "bob"], threshold=0.0)
    assert (text, acc) == ("ann", True)
    assert prob == pytest.approx(2.4)
    # prob/len(name) = 0.8 < 0.9 threshold → flagged for review
    text, prob, acc = match_name(outs(), ["ann"], threshold=0.9)
    assert (text, acc) == ("ann", False)


def test_match_name_empty_dictionary_returns_nan():
    outs = [[[{"a": 0.9}]] for _ in range(3)]
    assert match_name(outs, []) == ("Nan", 0.0, False)


# ---- J4 time matching -----------------------------------------------------


def _time_lattice(chars, prob=0.9):
    return [[{c: prob} for c in chars]]


def test_match_time_colon_insertion_and_agreement_boost():
    outs = [_time_lattice("1130"), _time_lattice("1130"), _time_lattice("1130")]
    text, prob, acc = match_time(outs, threshold=0.0)
    assert text == "11:30"  # colon inserted into the colonless winner
    assert acc
    # winner scores 4×0.9 on its own lattice + full-prefix agreement on
    # the two 'other' outputs (also 4×0.9 each)
    assert prob == pytest.approx(3.6 * 3)


def test_match_time_shape_gate_drops_bad_words():
    # 6-char word (too long) and 2-word lattices are gated out → Nan
    outs = [_time_lattice("113000"), [[{"1": 0.9}], [{"2": 0.9}]]]
    text, prob, acc = match_time(outs, threshold=0.0)
    assert text == "Nan" and not acc


def test_match_hour_digit_argmax():
    outs = [
        [[{"3": 0.9, "B": 0.8}]],
        [[{"3": 0.9, "B": 0.8}]],
        [[{"3": 0.9, "B": 0.8}]],
    ]
    text, prob, acc = match_hour(outs, threshold=0.0)
    assert text == "3" and acc


# ---- F2/F3 fill-ratio predicates -----------------------------------------


def test_blank_cell_fill_ratio():
    blank = np.full((40, 120), 255, dtype=np.uint8)
    assert ops.cell_fill_ratio(blank, border=8) <= 0.01
    inked = blank.copy()
    inked[15:25, 20:100] = 0
    assert ops.cell_fill_ratio(inked, border=8) > 0.01


def test_box_fill_ratio_band():
    img = np.full((30, 100), 255, dtype=np.uint8)
    img[12:18, 10:40] = 0  # text-like fill
    fill = ops.box_fill_ratio(img, thresh=230)
    assert 0.01 < fill < 0.20
    assert ops.box_fill_ratio(np.full((30, 100), 255, np.uint8)) == 0.0
    assert ops.box_fill_ratio(np.zeros((30, 100), np.uint8)) == 1.0


# ---- deep copy isolation --------------------------------------------------


def test_deep_copy_isolates_mutation():
    lat = [[{"a": 0.5}]]
    cp = L.deep_copy(lat)
    L.enrich(cp, "d")
    cp[0][0]["z"] = 1.0
    assert lat == [[{"a": 0.5}]]


# ---- multi-word matcher paths (J1/J2 two-word and flattened) -------------


def _lat(words, p=0.9):
    return [[{c: p} for c in w] for w in words]


def _outs(words):
    return [_lat(words) for _ in range(3)]


def test_match_name_two_word_path():
    text, prob, acc = match_name(
        _outs(["mary", "jones"]), ["mary jones", "zoe adams"], threshold=0.0
    )
    assert (text, acc) == ("mary jones", True)
    assert prob == pytest.approx(9 * 0.9)  # all 9 chars at exact positions


def test_match_name_flattened_three_word_path():
    # over-segmented 'ma ry jones' still matches via the flattened scorer
    text, prob, acc = match_name(_outs(["ma", "ry", "jones"]), ["mary jones"], 0.0)
    assert (text, acc) == ("mary jones", True)
    assert prob == pytest.approx(9 * 0.9)


def test_match_purpose_flattened_and_single_word():
    from ocr_to_csv_spark.extraction.matchers import match_purpose

    text, prob, acc = match_purpose(
        _outs(["chess", "club"]), ["chess club", "coding"], threshold=0.0
    )
    assert (text, acc) == ("chess club", True)
    # single-word lattice: multi-word aliases are skipped (reference
    # corrections.py:533 'continue' on space)
    text, _, _ = match_purpose(_outs(["coding"]), ["chess club", "coding"], 0.0)
    assert text == "coding"
