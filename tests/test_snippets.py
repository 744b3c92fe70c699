"""Stored-snippet field: the reference serves a 3-line preview with every
lexical hit (``content_text.lines().take(3).join("\\n")``,
ck-engine/src/lib.rs:794-798; carried as ``JsonlSearchResult.snippet``,
ck-core/src/lib.rs:264-374). Here the preview is computed once at build
time (vectorized, in the fused tokenize pass), stored in the serving doc
metadata, and returned from the DocShard actors — queries never touch
the corpus."""

import random

import pyarrow as pa
import pytest

from ck_ray.corpus import preview_column
from ck_ray.query import BM25Engine


def rust_lines_take3(s: str, n: int = 3) -> str:
    """Pure-python reference of Rust ``s.lines().take(n).join("\\n")``:
    split_inclusive('\\n'), strip the '\\n', then strip one '\\r' ONLY
    when a '\\n' was stripped — a bare trailing '\\r' on the final line
    is kept (std doctest: "foo\\r\\nbar\\n\\nbaz\\r" ends in "baz\\r")."""
    segs = s.split("\n")
    terminated = [True] * (len(segs) - 1) + [False]
    if segs and segs[-1] == "":
        segs, terminated = segs[:-1], terminated[:-1]
    segs = [
        x[:-1] if term and x.endswith("\r") else x
        for x, term in zip(segs[:n], terminated[:n])
    ]
    return "\n".join(segs)


EDGES = [
    "", "a", "a\n", "a\nb", "a\nb\nc", "a\nb\nc\n", "a\nb\nc\nd",
    "\n", "\n\n", "\n\n\n", "\n\n\n\n",
    "l1\r\nl2\r\nl3\r\nl4", "x\r\ny\r", "x\r\n", "a\rb\nc",
    "x\r\r", "x\r\r\n", "ab\ncd\n\n", "a\r\n\r\n", "\r\r\r\n",
    "a\n\n\nx", "a\n\nx", "αβ\nγδ\nεζ\nηθ",
]


def test_preview_kernel_edge_cases():
    got = preview_column(pa.array(EDGES)).to_pylist()
    for s, g in zip(EDGES, got):
        assert g == rust_lines_take3(s), repr(s)


def test_preview_kernel_fuzz():
    rng = random.Random(1234)
    alpha = "ab\n\r "
    cases = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 14)))
        for _ in range(3000)
    ]
    got = preview_column(pa.array(cases)).to_pylist()
    for s, g in zip(cases, got):
        assert g == rust_lines_take3(s), repr(s)


def test_preview_kernel_n_lines():
    arr = pa.array(["a\nb\nc\nd\ne"])
    assert preview_column(arr, n_lines=1).to_pylist() == ["a"]
    assert preview_column(arr, n_lines=5).to_pylist() == ["a\nb\nc\nd\ne"]


def test_search_returns_stored_preview(ray_session, tiny_index, tiny_corpus):
    """Every hit's `preview` column equals lines().take(3) of the source
    content — served from the shard's stored field, corpus untouched."""
    eng = BM25Engine(tiny_index, num_shards=2)
    try:
        df = eng.search("merge_posting_runs", top_k=8)
        assert len(df) > 0 and "preview" in df.columns
        truth = {
            (r["repo"], r["path"]): rust_lines_take3(r["content"])
            for r in tiny_corpus.to_pylist()
        }
        for _, row in df.iterrows():
            assert row["preview"] == truth[(row["repo"], row["path"])]
    finally:
        eng.close()


@pytest.mark.usefixtures("ray_session")
def test_old_layout_loads_null_previews(tiny_index, tmp_path):
    """An index whose serving docs predate the preview field must still
    load (nulls), not crash — forward-compat for existing indexes."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    old = str(tmp_path / "old_idx")
    shutil.copytree(tiny_index, old)
    for f in glob.glob(os.path.join(old, "*", "serving", "docs", "*", "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["preview"]), f)
    eng = BM25Engine(old, num_shards=2)
    try:
        df = eng.search("merge_posting_runs", top_k=5)
        assert len(df) > 0
        assert df["preview"].isna().all()
        # scores unaffected by the metadata layout
        ref = BM25Engine(tiny_index, num_shards=2)
        try:
            want = ref.search("merge_posting_runs", top_k=5)
        finally:
            ref.close()
        assert df["doc_id"].tolist() == want["doc_id"].tolist()
        assert df["score"].tolist() == want["score"].tolist()
    finally:
        eng.close()
