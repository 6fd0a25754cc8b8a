"""Property tests (SURVEY.md §5.2): random lattices → matcher invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_to_csv_spark.extraction import lattice as L
from ocr_to_csv_spark.extraction.matchers import _decay_score, match_name

probs = st.floats(min_value=0.01, max_value=1.0, allow_nan=False)
chars = st.sampled_from(string.ascii_lowercase)
slot = st.dictionaries(chars, probs, min_size=1, max_size=4)
word = st.lists(slot, min_size=1, max_size=6)
lattice = st.lists(word, min_size=1, max_size=3)
name = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(word, name)
def test_decay_monotone_in_slot_probs(w, target):
    """Raising any candidate's probability never lowers the score."""
    base = _decay_score(target, w)
    boosted = [dict(s) for s in w]
    for s in boosted:
        for k in s:
            s[k] = min(1.0, s[k] + 0.1)
    assert _decay_score(target, boosted) >= base - 1e-12


@settings(max_examples=100, deadline=None)
@given(lattice, st.lists(name, min_size=1, max_size=5),
       st.floats(min_value=0.0, max_value=1.0))
def test_accept_implies_threshold(lat, names, thr):
    """accepted ⇒ prob/len(name) ≥ threshold (reference corrections.py:302)."""
    outs = [L.deep_copy(lat) for _ in range(3)]
    text, prob, accepted = match_name(outs, names, threshold=thr)
    if accepted:
        assert text != "Nan"
        assert prob / len(text.replace(" ", "")) >= thr - 1e-9


@settings(max_examples=100, deadline=None)
@given(lattice)
def test_fold_case_idempotent(lat):
    once = L.fold_case(L.deep_copy(lat))
    twice = L.fold_case(L.deep_copy(once))
    assert once == twice


@settings(max_examples=100, deadline=None)
@given(word)
def test_enumeration_bounded_and_deterministic(w):
    a = list(L.enumerate_candidates(w, beam=64))
    b = list(L.enumerate_candidates(w, beam=64))
    assert a == b
    assert len(a) <= 64
