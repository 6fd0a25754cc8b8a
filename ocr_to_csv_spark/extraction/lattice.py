"""Char-probability lattice transforms (SURVEY.md §2.8 X11-X14).

A lattice is ``list[word]``, a word is ``list[charslot]``, a charslot is
``dict[char|None, float]`` — the shape the reference builds from hOCR
(reference modules/corrections.py:59-123). ``None`` marks an empty/space
candidate slot.

Semantics cloned exactly from the reference, including iteration order
(confusion rules may cascade: e.g. the 'e' rule can fire on a 'G' injected
by the earlier 'G' rule — order-sensitive by design):
- confusion enrichment  (reference modules/corrections.py:23-53, 126-154)
- case folding          (reference modules/corrections.py:157-184)
- word stitching        (reference modules/corrections.py:207-224)
- candidate enumeration (reference modules/corrections.py:361,468) with a
  beam cap added for scale (SURVEY.md §7.3 "Exponential lattice enumeration").
"""

from __future__ import annotations

from itertools import islice, product

Charslot = dict  # dict[str | None, float]
Lattice = list   # list[list[Charslot]]

# Look-alike tables: which observed characters could really have been the
# key character. Same mappings as the reference's correction tables
# (reference modules/corrections.py:23-53); dict order preserved because
# enrichment cascades.
CONFUSIONS: dict[str, dict[str, set]] = {
    "a": {
        "A": {"^"},
        "B": {"8", "&", "6", "3"},
        "C": {"(", "<", "{", "[", "¢", "©"},
        "G": {"(", "<", "{", "[", "¢", "©", "6", "e"},
        "E": {"3", "€"},
        "e": {"G"},
        "g": {"9"},
        "I": {"1", "/", "\\", "|", "]", "["},
        "l": {"1", "/", "\\", "|", "]", "["},
        "O": {"0"},
        "S": {"5", "$"},
        "T": {"7"},
        "Z": {"2"},
        " ": {None},
    },
    "d": {
        "0": {"o", "O", "Q", "C", "c"},
        "1": {"I", "l", "/", "\\", "|", "[", "]", "(", ")", "j"},
        "2": {"z", "Z", "7", "?"},
        "3": {"E", "B"},
        "4": {"h", "H", "y", "A"},
        "5": {"s", "S"},
        "6": {"b", "e"},
        "7": {"t", ")", "}", "Z", "z", "2", "?"},
        "8": {"B", "&"},
        "9": {"g", "q"},
        ":": {"'", ".", ",", "i", ";"},
    },
}


def enrich(lattice: Lattice, key: str) -> Lattice:
    """Inject absent look-alike characters at the max probability of any
    present look-alike (reference modules/corrections.py:126-154). Mutates
    and returns the lattice, like the reference."""
    table = CONFUSIONS[key]
    for word in lattice:
        for slot in word:
            for target, lookalikes in table.items():
                if target in slot:
                    continue
                prob = 0.0
                for present in set(slot).intersection(lookalikes):
                    prob = max(prob, slot[present])
                if prob != 0:
                    slot[target] = prob
    return lattice


def fold_case(lattice: Lattice) -> Lattice:
    """Lowercase every candidate, max-merging upper/lower collisions
    (reference modules/corrections.py:157-184). Mutates and returns."""
    for word in lattice:
        for slot in word:
            for ch in list(slot.keys()):
                if ch is None:
                    continue
                if ch.isupper():
                    low = ch.lower()
                    if low in slot:
                        slot[low] = max(slot[ch], slot[low])
                    else:
                        slot[low] = slot[ch]
                    del slot[ch]
    return lattice


def stitch_words(lattice: Lattice) -> Lattice:
    """Over-segmentation repair: when the longest word is first or last,
    fuse the remaining fragments down to exactly two words
    (reference modules/corrections.py:207-224). Mutates and returns."""
    if len(lattice) > 0:
        largest = max(lattice, key=len)
        if largest == lattice[0]:
            while len(lattice) > 2:
                lattice[1].extend(lattice[2])
                lattice.pop(2)
        elif largest == lattice[-1]:
            while len(lattice) > 2:
                lattice[0].extend(lattice[1])
                lattice.pop(1)
    return lattice


def enumerate_candidates(word: list, beam: int = 4096):
    """Yield (chars_tuple) combinations over the word's charslots — the
    reference's raw ``itertools.product`` (reference modules/corrections.py:361)
    with a beam cap: when the full product would exceed ``beam``, each slot
    is pruned to its top candidates by probability (deterministic; ties
    break on the char) so worst-case cells stay bounded at 10^12-doc scale.
    """
    total = 1
    for slot in word:
        total *= max(1, len(slot))
        if total > beam:
            break
    if total <= beam:
        yield from product(*word)
        return
    per_slot = max(2, int(beam ** (1.0 / max(1, len(word)))))
    pruned = [
        [
            c
            for c, _ in sorted(
                slot.items(), key=lambda kv: (-kv[1], str(kv[0]))
            )[:per_slot]
        ]
        for slot in word
    ]
    # hard bound: per-slot pruning alone still explodes on very wide words
    # (2 candidates × 20 slots → 2^20); islice makes `beam` a true cap
    yield from islice(product(*pruned), beam)


def deep_copy(lattice: Lattice) -> Lattice:
    """Cheap structural copy (dicts of scalars) — the matchers mutate."""
    return [[dict(slot) for slot in word] for word in lattice]
