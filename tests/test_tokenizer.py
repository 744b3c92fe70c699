import numpy as np
import pyarrow as pa

from ck_ray.tokenizer import (
    MAX_TOKEN_BYTES,
    term_frequencies,
    tokenize_array,
    tokenize_text,
    tokenize_text_with_positions,
)


def test_snake_case_splits():
    assert tokenize_text("snake_case") == ["snake", "case"]


def test_camel_case_single_token_lowercased():
    assert tokenize_text("camelCase") == ["camelcase"]


def test_path_segments_split():
    assert tokenize_text("foo.bar/baz.py") == ["foo", "bar", "baz", "py"]


def test_numbers_kept():
    assert tokenize_text("x2 123 a1b2") == ["x2", "123", "a1b2"]


def test_long_token_dropped_and_leaves_position_gap():
    long = "x" * MAX_TOKEN_BYTES
    out = tokenize_text_with_positions(f"a {long} b")
    assert out == [("a", 0), ("b", 2)]  # position 1 consumed by dropped token


def test_39_byte_token_kept():
    tok = "y" * 39
    assert tokenize_text(tok) == [tok]


def test_40_byte_multibyte_dropped():
    # 'é' is 2 bytes: 20 of them = 40 bytes -> dropped
    assert tokenize_text("é" * 20) == []
    assert tokenize_text("é" * 19) == ["é" * 19]


def test_unicode_alphanumeric_classes():
    assert tokenize_text("naïve,café;中文abc χ2") == ["naïve", "café", "中文abc", "χ2"]


def test_empty_and_separator_only():
    assert tokenize_text("") == []
    assert tokenize_text("...---///") == []


def test_positions_skip_empty_artifacts():
    assert tokenize_text_with_positions("  a  b  ") == [("a", 0), ("b", 1)]


def test_crlf_and_cr_line_endings():
    assert tokenize_text("a\r\nb\rc\nd") == ["a", "b", "c", "d"]


def test_batch_matches_per_row():
    rows = ["def foo_bar(self)", "", None, "the THE The", "x" * 50]
    arr = pa.array(rows, pa.string())
    tb = tokenize_array(arr)
    per_row = [[] for _ in rows]
    for r, t in zip(tb.row_index, tb.term.to_pylist()):
        per_row[r].append(t)
    assert per_row[0] == ["def", "foo", "bar", "self"]
    assert per_row[1] == [] and per_row[2] == []
    assert per_row[3] == ["the", "the", "the"]
    assert per_row[4] == []
    assert tb.doc_len.tolist() == [4, 0, 0, 3, 0]


def test_term_frequencies_tf_and_positions():
    t, dl = term_frequencies(pa.array(["a b a b a"], pa.string()))
    d = {
        (r, term): (tf, pos)
        for r, term, tf, pos in zip(
            t["row"].to_pylist(),
            t["term"].to_pylist(),
            t["tf"].to_pylist(),
            t["positions"].to_pylist(),
        )
    }
    assert d[(0, "a")] == (3, [0, 2, 4])
    assert d[(0, "b")] == (2, [1, 3])
    assert dl.tolist() == [5]


def test_ids_large_string_offsets():
    """doc_id / term_hash must parse int64 offsets when a block arrives
    as large_string (Arrow promotes on >2 GiB concat) — ADVICE r2."""
    from ck_ray.ids import doc_id_column, doc_id_for, term_hash

    terms = ["merge", "snake_case", "x" * 60, ""]
    small = pa.array(terms, pa.string())
    big = small.cast(pa.large_string())
    fids = np.zeros(len(terms), dtype=np.int64)
    assert term_hash(big, fids).tolist() == term_hash(small, fids).tolist()

    repo = pa.array(["r1", "r2"]).cast(pa.large_string())
    path = pa.array(["a/b.py", "c.rs"]).cast(pa.large_string())
    commit = pa.array(["c1", "c2"]).cast(pa.large_string())
    got = doc_id_column(repo, path, commit).to_pylist()
    want = [doc_id_for("r1", "a/b.py", "c1"), doc_id_for("r2", "c.rs", "c2")]
    assert got == want
