"""Dictionary matchers: similarity theta-join + argmax over alias lists
(SURVEY.md §2.3 J1/J2/J4, §2.4 A1/A3).

Each matcher clones the reference's scoring exactly — positional decay
1.0 / 1.0-after-None / 0.75-next / 0.5-prev, strict-``>`` first-max
tie-breaks, early returns — including behaviors that only emerge from the
reference's control flow (documented inline), so fixture outputs are
bit-identical to what the reference would produce on the same lattices:

- match_name     reference modules/corrections.py:187-304
- match_time     reference modules/corrections.py:307-431
- match_hour     reference modules/corrections.py:434-503
- match_purpose  reference modules/corrections.py:506-581
- correct_cell   reference modules/corrections.py:584-681

These run inside pandas-UDF batches; alias lists arrive via broadcast.
"""

from __future__ import annotations

import re

from .lattice import enrich, enumerate_candidates, fold_case, stitch_words

TIME_FILTER = re.compile(r"^(1[0-2]|[1-9]):?([0-5][0-9])$")
CellValue = tuple  # (text: str, prob: float, accepted: bool)


def _decay_score(target: str, slots: list) -> float:
    """Positional-decay sum of one target string against one slot list
    (reference modules/corrections.py:241-254): exact position full credit;
    next position full credit when the current slot has a None candidate;
    otherwise next position ×0.75, previous position ×0.5."""
    prob = 0.0
    for i in range(min(len(target), len(slots))):
        ch = target[i]
        if ch in slots[i]:
            prob += slots[i][ch]
        elif None in slots[i] and i < len(slots) - 1 and ch in slots[i + 1]:
            prob += slots[i + 1][ch]
        elif i < len(slots) - 1 and ch in slots[i + 1]:
            prob += slots[i + 1][ch] * 0.75
        elif i > 0 and ch in slots[i - 1]:
            prob += slots[i - 1][ch] * 0.5
    return prob


def _flat_score(target_nospace: str, flat: list) -> float:
    """Flattened multi-word scoring with an uppercase fallback at exact
    position (reference modules/corrections.py:283-293)."""
    prob = 0.0
    for i in range(min(len(target_nospace), len(flat))):
        ch = target_nospace[i]
        if ch in flat[i]:
            prob += flat[i][ch]
        elif ch.upper() in flat[i]:
            prob += flat[i][ch.upper()]
        elif i < len(flat) - 1 and ch in flat[i + 1]:
            prob += flat[i + 1][ch] * 0.75
        elif i > 0 and ch in flat[i - 1]:
            prob += flat[i - 1][ch] * 0.5
    return prob


def match_name(outputs: list, names: list, threshold: float = 0.0) -> CellValue:
    """Best alias name for the 3 OCR lattices (J1)."""
    for out in outputs:
        enrich(out, "a")
        fold_case(out)
        stitch_words(out)

    flat_accum: list = []  # function-scope accumulator, as in the reference:
    # only the first flatten is ever reachable by min(), later extends land
    # beyond the scored prefix (reference modules/corrections.py:231,280-281)
    best_name, best_prob = "Nan", 0.0
    for name in names:
        for out in outputs:
            if len(out) == 1:
                probability = _decay_score(name, out[0])
            elif len(out) == 2:
                if " " not in name:
                    continue
                namep = name.split(" ", 2)
                probability = 0.0
                for w in range(2):
                    slots = out[w]
                    target = namep[w]
                    for c in range(min(len(target), len(slots))):
                        if target[c] in slots[c]:
                            probability += slots[c][target[c]]
                        # the reference checks the WHOLE word against the
                        # next slot here (modules/corrections.py:268) — only
                        # single-char words can ever pass; cloned as-is
                        elif c < len(slots) - 1 and target in slots[c + 1]:
                            probability += slots[c + 1][target[c]] * 0.75
                        elif c > 0 and target[c] in slots[c - 1]:
                            probability += slots[c - 1][target[c]] * 0.5
            else:
                tgt = name.replace(" ", "")
                for word in out:
                    flat_accum.extend(word)
                probability = _flat_score(tgt, flat_accum)
            if probability > best_prob:
                best_name, best_prob = name, probability
    if best_name == "Nan":
        return (best_name, best_prob, False)
    if best_prob / len(best_name.replace(" ", "")) >= threshold:
        return (best_name, best_prob, True)
    return (best_name, best_prob, False)


def match_time(outputs: list, threshold: float = 0.0) -> CellValue:
    """Best HH:MM candidate via capped enumeration + cross-output
    full-prefix agreement boost (J4)."""
    best_time, best_prob, best_alt_prob = "Nan", 0.0, 0.0

    for i in range(len(outputs) - 1, -1, -1):
        enrich(outputs[i], "d")
        out = outputs[i]
        # shape gate (reference modules/corrections.py:334-346): exactly one
        # word, len 3-5, colon at [-3] iff len ≥ 4
        if (
            len(out) > 1
            or len(out[0]) < 3
            or (len(out[0]) < 4 and ":" in out[0][-3])
            or (len(out[0]) > 4 and ":" not in out[0][-3])
            or (len(out[0]) > 5)
        ):
            outputs.pop(i)

    for i in range(len(outputs)):
        slots = outputs[i][0]
        for slot in slots:
            for ch in list(slot.keys()):
                if ch is None or not (ch.isdigit() or ch == ":"):
                    del slot[ch]

        for timed in enumerate_candidates(slots):
            time = "".join(timed)
            probability = sum(slots[c][timed[c]] for c in range(len(timed)))
            if not TIME_FILTER.match(time):
                continue
            time_alt = (
                time[:-2] + ":" + time[-2:]
                if ":" not in time
                else time.replace(":", "")
            )
            probability_addition = 0.0
            for j in range(len(outputs)):
                if j == i:
                    continue
                other = outputs[j][0]
                prob_add = 0.0
                for s in range(min(len(time), len(other))):
                    if time[s] in other[s]:
                        prob_add += other[s][time[s]]
                    else:
                        prob_add = 0.0  # full-prefix agreement required
                        break
                prob_add_alt = 0.0
                for s in range(min(len(time_alt), len(other))):
                    if time_alt[s] in other[s]:
                        prob_add_alt += other[s][time_alt[s]]
                    else:
                        prob_add_alt = 0.0
                        break
                if ":" in time or prob_add > prob_add_alt:
                    probability_addition += prob_add
                else:
                    probability_addition += prob_add_alt
            if (
                probability + probability_addition >= best_prob + best_alt_prob
                and probability > best_prob
            ):
                best_time = time if ":" in time else time_alt
                best_prob = probability
                best_alt_prob = probability_addition
        # the reference decides (and can return) after EACH surviving
        # output's enumeration (modules/corrections.py:428-431)
        if best_alt_prob + best_prob > best_prob * len(outputs) * threshold:
            return (best_time, best_prob + best_alt_prob, True)
    return (best_time, best_prob + best_alt_prob, False)


def match_hour(outputs: list, threshold: float = 0.3) -> CellValue:
    """Best integer hour string (A1 argmax over enumerations).

    The reference's cross-output boost indexes candidate positions into the
    other lattice's key set (modules/corrections.py:486, an int-in-str-keys
    test), which never matches — so the boost is structurally zero; cloned
    by keeping ``alt_prob = 0`` while preserving the decision inequalities.
    """
    best_hour, best_prob, best_alt = "", 0.0, 0.0
    for out in outputs:
        enrich(out, "d")
        for slot in out[0]:
            for ch in list(slot.keys()):
                if ch is None or not ch.isdigit():
                    del slot[ch]
    for i in range(len(outputs)):
        slots = outputs[i][0]
        for hourd in enumerate_candidates(slots):
            hour = "".join(hourd)
            if not hour.isdigit():
                continue
            probability = sum(slots[c][hourd[c]] for c in range(len(hourd)))
            alt_prob = 0.0
            if probability + alt_prob > best_prob + best_alt and probability > best_prob:
                best_hour, best_prob, best_alt = hour, probability, alt_prob
    if best_prob + best_alt > best_prob * len(outputs) * threshold:
        return (best_hour, best_prob + best_alt, True)
    return (best_hour, best_prob + best_alt, False)


def match_purpose(outputs: list, purposes: list, threshold: float = 0.3) -> CellValue:
    """Best alias purpose (J2). Outputs outer / purposes inner, flattened
    path shares one function-scope accumulator exactly as the reference
    does (modules/corrections.py:518-569)."""
    for out in outputs:
        enrich(out, "a")
        fold_case(out)

    flat_accum: list = []
    best_purpose, best_prob = "Nan", 0.0
    for out in outputs:
        for purpose in purposes:
            if len(out) == 1:
                if " " in purpose:
                    continue
                probability = _decay_score(purpose, out[0])
            else:
                tgt = purpose.replace(" ", "")
                for word in out:
                    flat_accum.extend(word)
                probability = _flat_score(tgt, flat_accum)
            if probability > best_prob:
                best_purpose, best_prob = purpose, probability
    if best_purpose == "Nan":
        return (best_purpose, best_prob, False)
    if best_prob / len(best_purpose.replace(" ", "")) >= threshold:
        return (best_purpose, best_prob, True)
    return (best_purpose, best_prob, False)
