"""Vectorized bounded edit distance (fuzzy expansion kernel).

The vectorized ``edit_within`` is the engine's fuzzy dictionary scan;
``edit_distance`` is the scalar reference the oracle uses — the two are
deliberately independent implementations, so agreement here (and the
engine-vs-oracle fuzzy rank tests in test_boolean.py) cross-checks both.
"""

import random

import numpy as np
import pytest

from ck_ray.strdist import edit_distance, edit_within


def test_scalar_known_values():
    cases = [
        ("", "", 0), ("a", "", 1), ("", "abc", 3),
        ("kitten", "sitting", 3), ("flaw", "lawn", 2),
        ("spark", "spark", 0), ("spark", "sprak", 2),
        ("ab", "ba", 2), ("ca", "abc", 3),
    ]
    for a, b, d in cases:
        assert edit_distance(a, b) == d, (a, b)
        assert edit_distance(b, a) == d, (a, b)


def test_scalar_osa_transpositions():
    # adjacent transposition costs 1 under OSA
    assert edit_distance("ab", "ba", transpose=True) == 1
    assert edit_distance("spark", "sprak", transpose=True) == 1
    # OSA never edits a substring twice: ca -> abc stays 3 (true
    # Damerau-Levenshtein would give 2)
    assert edit_distance("ca", "abc", transpose=True) == 3
    # transposition + substitution
    assert edit_distance("abcd", "bacx", transpose=True) == 2


@pytest.mark.parametrize("transpose", [False, True])
def test_vectorized_matches_scalar(transpose):
    rng = random.Random(13)
    terms = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(0, 9)))
        for _ in range(3000)
    ]
    for q in ["", "a", "abcab", "edcba", "abcdeabcde", "ccc"]:
        for k in (0, 1, 2, 3):
            mask = edit_within(q, terms, k, transpose=transpose)
            ref = np.array(
                [edit_distance(q, t, transpose) <= k for t in terms]
            )
            bad = np.nonzero(mask != ref)[0]
            assert len(bad) == 0, (
                q, k, transpose,
                [(terms[i], edit_distance(q, terms[i], transpose))
                 for i in bad[:5]],
            )


def test_unicode_and_long_terms():
    terms = ["naïve", "naive", "nÀive", "x" * 45, "window", "widow",
             "windows", "wind0w", ""]
    m = edit_within("window", terms, 1)
    assert [t for t, b in zip(terms, m) if b] == [
        "window", "widow", "windows", "wind0w"
    ]
    m2 = edit_within("naïve", terms, 0)
    assert [t for t, b in zip(terms, m2) if b] == ["naïve"]


def test_empty_inputs():
    assert edit_within("abc", [], 2).shape == (0,)
    assert edit_within("", ["", "a", "ab", "abc"], 1).tolist() == [
        True, True, False, False
    ]


def test_length_prefilter_and_pruning_consistency():
    # same-length adversarial dictionary: every candidate survives the
    # length filter, exercising the row-min compaction path
    terms = [f"t{i:06d}" for i in range(5000)]
    m = edit_within("t000123", terms, 1)
    hits = {terms[i] for i in np.nonzero(m)[0]}
    ref = {t for t in terms if edit_distance("t000123", t) <= 1}
    assert hits == ref and "t000123" in hits
