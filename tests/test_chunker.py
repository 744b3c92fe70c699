"""Structural (AST) chunker: captures, breadcrumbs, containment, gap
fill, striding — semantics mirroring ck-chunk's query chunker."""

import pyarrow as pa
import pytest

from ck_ray.chunker import (
    ast_chunk_batch,
    line_window_chunks,
    python_chunks,
)

SRC = '''\
"""module docstring"""
import os

CONST = 1


def top(a, b):
    x = a + b
    return x


@some.decorator
class Outer:
    """doc"""

    attr = 2

    def method_one(self):
        return 1

    async def method_two(self):
        def inner():
            return 2
        return inner

    class Inner:
        def deep(self):
            return 3


def tail():
    pass
'''


def _rows(src=SRC, **kw):
    return python_chunks(src, **kw)


def test_captures_types_and_spans():
    rows = _rows()
    by_crumb = {r[3]: r for r in rows if r[3]}
    assert by_crumb["top"][:2] == (7, 9)
    assert by_crumb["top"][2] == "function"
    # decorator included in the class span
    assert by_crumb["Outer"][:2] == (12, 28)
    assert by_crumb["Outer"][2] == "class"
    assert by_crumb["Outer.method_one"][2] == "method"
    assert by_crumb["Outer.method_two"][2] == "method"
    # def nested in a function is a function, with full ancestry
    assert by_crumb["Outer.method_two.inner"][2] == "function"
    assert by_crumb["Outer.Inner"][2] == "class"
    assert by_crumb["Outer.Inner.deep"][2] == "method"
    assert by_crumb["Outer.Inner.deep"][4] == 2  # depth = #ancestors


def test_gap_fill_covers_every_line_exactly_once():
    rows = _rows()
    n = len(SRC.splitlines())
    covered = []
    for s, e, ctype, _, depth in rows:
        if depth == 0:  # top-level captures + text gaps partition the file
            covered.extend(range(s, e + 1))
    assert sorted(covered) == list(range(1, n + 1))
    assert len(set(covered)) == len(covered)
    # the module header is a text chunk
    texts = [r for r in rows if r[2] == "text"]
    assert texts[0][:2] == (1, 6)


def test_containment_identical_span_suppressed():
    src = "class A:\n    def m(self):\n        pass\n"
    rows = python_chunks(src)
    spans = [(r[0], r[1]) for r in rows]
    assert len(spans) == len(set(spans))  # no duplicate spans
    src2 = "@d\nclass A:\n    pass\n"
    rows2 = python_chunks(src2)
    assert rows2[0][:2] == (1, 3)  # decorator in span


def test_parents_before_children_order():
    rows = _rows()
    pos = {r[3]: i for i, r in enumerate(rows) if r[3]}
    assert pos["Outer"] < pos["Outer.method_one"]
    assert pos["Outer.Inner"] < pos["Outer.Inner.deep"]


def test_striding_splits_long_chunks():
    body = "\n".join(f"    x{i} = {i}" for i in range(30))
    src = f"def big():\n{body}\n"
    rows = python_chunks(src, max_lines=10, overlap=2)
    strides = [r for r in rows if r[3].startswith("big#s")]
    assert len(strides) >= 3
    assert all(r[1] - r[0] + 1 <= 10 for r in strides)
    # stride windows overlap by 2 and cover the whole def
    assert strides[0][0] == 1
    assert strides[-1][1] == 31
    for a, b in zip(strides, strides[1:]):
        assert b[0] == a[0] + 8


def test_fallback_for_non_python_and_bad_syntax():
    t = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["a.rs", "b.py", "c.py"],
            "commit": ["0", "0", "0"],
            "lang": ["rust", "python", "python"],
            "content": [
                "fn main() {}\n" * 30,
                "def ok():\n    pass\n",
                "def broken(:\n",  # SyntaxError -> fallback
            ],
        }
    )
    out = ast_chunk_batch(t)
    df = out.to_pandas()
    rust = df[df["path"] == "a.rs"]
    assert (rust["chunk_type"] == "text").all()
    assert len(rust) == len(line_window_chunks(30))
    okpy = df[df["path"] == "b.py"]
    assert set(okpy["chunk_type"]) == {"function"}
    bad = df[df["path"] == "c.py"]
    assert (bad["chunk_type"] == "text").all()


def test_chunk_text_matches_span():
    t = pa.table(
        {
            "repo": ["r"],
            "path": ["x.py"],
            "commit": ["0"],
            "lang": ["python"],
            "content": [SRC],
        }
    )
    df = ast_chunk_batch(t).to_pandas()
    lines = SRC.splitlines()
    for _, r in df.iterrows():
        assert r["text"] == "\n".join(lines[r["line_start"] - 1 : r["line_end"]])


def test_line_windows_match_semantic_chunker():
    """The fallback reproduces semantic.chunk_batch's window layout."""
    from ck_ray.semantic import chunk_batch

    content = "\n".join(f"line {i}" for i in range(47))
    t = pa.table(
        {
            "repo": ["r"], "path": ["d.txt"], "commit": ["0"],
            "lang": ["text"], "content": [content],
        }
    )
    a = chunk_batch(t).to_pandas()[["line_start", "line_end"]]
    b = ast_chunk_batch(t).to_pandas()[["line_start", "line_end"]]
    assert a.values.tolist() == b.values.tolist()


@pytest.mark.parametrize("n", [1, 4, 5, 20, 21, 36, 37, 100])
def test_window_emission_rule(n):
    """Windows at s=0,16,32,…; emitted iff s==0 or s+4 < n (the SQL
    oracle's closed form) — pinned against the generator."""
    rows = line_window_chunks(n)
    expect = [
        (s + 1, min(s + 20, n))
        for s in range(0, n, 16)
        if s == 0 or s + 4 < n
    ]
    assert [(r[0], r[1]) for r in rows] == expect
