"""Heatmap scorer: reference ck-core/src/heatmap.rs semantics."""

import pyarrow as pa

from ck_ray.heatmap import (
    bucket_is_bold,
    bucket_of,
    bucket_rgb,
    heatmap_batch,
    highlight_ansi,
    line_heat,
    split_into_tokens,
    token_similarity,
)


def test_bucket_ladder_matches_reference():
    assert bucket_of(1.0) == 8 and bucket_of(0.875) == 8
    assert bucket_of(0.874) == 7 and bucket_of(0.75) == 7
    assert bucket_of(0.5) == 5
    assert bucket_of(0.1) == 1 and bucket_of(0.0) == 0
    assert bucket_rgb(8) == (0, 255, 100)
    assert bucket_rgb(1) == (180, 180, 180)
    assert bucket_rgb(0) is None
    assert bucket_is_bold(8) and not bucket_is_bold(7)


def test_split_preserves_spacing_and_punct():
    toks = split_into_tokens("foo(bar, baz);\n  qux")
    assert toks == ["foo", "(", "bar", ",", " ", "baz", ")", ";", "\n",
                    " ", " ", "qux"]
    assert "".join(toks) == "foo(bar, baz);\n  qux"


def test_token_similarity_rules():
    # exact full-pattern match
    assert token_similarity("merge", "merge") == 1.0
    # exact pattern-word match -> 0.9
    assert token_similarity("merge", "merge window") == 0.9
    # token contains pattern word -> 0.6 * ratio
    assert token_similarity("mergesort", "merge") == 0.6 * (5 / 9)
    # pattern word contains token -> 0.5 * ratio
    assert token_similarity("mer", "merge") == 0.5 * (3 / 5)
    # punctuation / whitespace score 0
    assert token_similarity("(", "merge") == 0.0
    assert token_similarity("   ", "merge") == 0.0
    # short pattern words (<3) are skipped
    assert token_similarity("ab", "ab") == 1.0  # full-pattern equality first
    assert token_similarity("abc", "ab cd") == 0.0


def test_line_heat_and_batch():
    s, b = line_heat("def merge_posting_runs(x):", "merge")
    assert s > 0 and b >= 2  # "merge_posting_runs" contains-match: 0.6*5/18
    t = pa.table(
        {"text": ["merge here\nnothing", "zzz", ""]}
    )
    out = heatmap_batch(t, "merge")
    assert out["heat_bucket"][0].as_py() == 8  # exact token match line
    assert out["heat_bucket"][2].as_py() == 0  # empty text
    lb = out["line_buckets"][0].as_py()
    assert len(lb) == 2 and lb[0] == 8


def test_highlight_roundtrip_text():
    import re

    plain = "call merge(x, y);"
    ansi = highlight_ansi(plain, "merge")
    assert re.sub(r"\x1b\[[0-9;]*m", "", ansi) == plain
    assert "\x1b[38;2;0;255;100m" in ansi  # exact match painted Step8
