"""Regex mode, semantic mode, hybrid fusion, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ck_ray.regex_search import build_pattern, regex_search
from ck_ray.semantic import (
    PseudoEmbedder,
    PseudoReranker,
    build_chunk_embeddings,
    chunk_batch,
    semantic_search,
)


@pytest.fixture(scope="module")
def corpus_ds(ray_session, tiny_corpus):
    import ray.data

    return ray.data.from_arrow(tiny_corpus)


# ------------------------------------------------------------------- regex


def test_pattern_builder():
    assert build_pattern("a.b", fixed_string=True) == r"a\.b"
    assert build_pattern("foo", whole_word=True) == r"\b(?:foo)\b"
    assert build_pattern("Foo", case_insensitive=True) == "(?i)Foo"


def test_regex_basic(corpus_ds, tiny_corpus):
    out = regex_search(corpus_ds, r"uq0000042marker")
    # exactly the one file containing that unique marker
    assert len(out) == 1
    assert out["line"].iloc[0].endswith("uq0000042marker")
    # oracle: find it by hand
    row = [r for r in tiny_corpus.to_pylist() if "uq0000042marker" in r["content"]][0]
    assert out["path"].iloc[0] == row["path"]


def test_regex_line_numbers_crlf(corpus_ds):
    out = regex_search(corpus_ds, "snake_case value")
    hit = out[out["path"] == "src/edge/crlf.c"]
    assert len(hit) == 1
    assert hit["line_no"].iloc[0] == 3  # third line of the \r\n file


def test_regex_empty_pattern_matches_every_line(ray_session):
    import ray.data

    t = pa.table(
        {
            "repo": ["r"] * 2,
            "path": ["a.py", "b.py"],
            "content": ["x\ny\n", "one\r\ntwo"],
        }
    )
    out = regex_search(ray.data.from_arrow(t), "")
    assert len(out) == 4  # 2 lines each; no phantom line after trailing \n


def test_regex_case_and_word(corpus_ds):
    ci = regex_search(corpus_ds, "GETUSERBYID", case_insensitive=True)
    cs = regex_search(corpus_ds, "GETUSERBYID")
    assert len(ci) > 0 and len(cs) == 0
    w = regex_search(corpus_ds, "merge", whole_word=True)
    assert (w["line"].str.contains(r"\bmerge\b")).all()


# ---------------------------------------------------------------- semantic


def test_chunker_spans():
    t = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": ["c"],
            "content": ["\n".join(f"line{i}" for i in range(50))],
        }
    )
    out = chunk_batch(t, target_lines=20, overlap_lines=4)
    df = out.to_pandas()
    assert df["line_start"].tolist() == [1, 17, 33]
    assert df["line_end"].tolist() == [20, 36, 50]
    assert df["text"].iloc[0].startswith("line0") and df["text"].iloc[0].endswith("line19")


def test_pseudo_embedder_deterministic():
    e = PseudoEmbedder()
    a = e.embed_texts(["def foo_bar", "other text"])
    b = e.embed_texts(["def foo_bar", "other text"])
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    # similar texts more similar than dissimilar
    sims = e.embed_texts(["def foo_bar baz"]) @ a.T
    assert sims[0, 0] > sims[0, 1]


def test_semantic_search_finds_unique_chunk(corpus_ds):
    emb = build_chunk_embeddings(corpus_ds, concurrency=2).materialize()
    out = semantic_search(emb, "uq0000042marker the merge", top_k=5)
    assert len(out) == 5
    assert out["score"].iloc[0] >= out["score"].iloc[-1]
    thr = semantic_search(emb, "uq0000042marker", top_k=5, threshold=0.99)
    assert "below_threshold" in thr.columns


def test_reranker_orders_by_relevance():
    rr = PseudoReranker()
    scores = rr.rerank("merge posting runs", ["merge posting runs now", "zebra apple"])
    assert scores[0] > scores[1]


# -------------------------------------------------------------- multimodal


def test_multimodal_plumbing(ray_session):
    from ck_ray.ops.multimodal import FeatureExtractor, multimodal_features

    out = multimodal_features("/root/testdata/sf0.001")
    assert len(out) == 500
    assert out["n_bytes"].gt(0).all()
    # deterministic features
    f = FeatureExtractor()
    a = f._fake_decode(b"payload")
    assert np.array_equal(a, f._fake_decode(b"payload"))
    with pytest.raises(NotImplementedError):
        FeatureExtractor(fake=False)._decode(b"x")


def test_full_sections(corpus_ds):
    from ck_ray.regex_search import full_sections, regex_search

    hits = regex_search(corpus_ds, "uq0000042marker")
    secs = full_sections(corpus_ds, hits, target_lines=10, overlap_lines=2)
    assert len(secs) == 1
    s = secs.iloc[0]
    assert s["sec_start"] <= s["line_no"] <= s["sec_end"]
    assert "uq0000042marker" in s["section"]
    assert s["sec_end"] - s["sec_start"] + 1 <= 10


def test_search_many_batch(ray_session, tiny_corpus, tmp_path):
    import ray.data

    import ck_ray.build as ckb
    from ck_ray.query import BM25Engine

    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, ckb.IndexConfig(num_parts=4))
    eng = BM25Engine(d, num_shards=2)
    try:
        batch = eng.search_many(["merge", "def", "snake_case"], top_k=10)
        singles = [eng.search_raw(q, 10) for q in ["merge", "def", "snake_case"]]
        for (bd, bs), (sd, ss) in zip(batch, singles):
            assert bd.tolist() == sd.tolist()
            import numpy as np

            assert np.array_equal(bs, ss)
    finally:
        eng.close()


def test_image_resize_nn_planted(ray_session, tmp_path):
    """NN resize over a crafted payload: byte value == position % 251, so
    every sampled pixel is computable by the same index arithmetic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.multimodal import image_resize_nn

    n = 64 * 20 + 13  # 21 rows, ragged tail
    text = "".join(chr(32 + (i % 90)) for i in range(n))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text]),
                  "lang": pa.array(["en"])}),
        str(d / "documents.parquet"),
    )
    out = image_resize_nn(str(d))
    assert len(out) == 1 and int(out.loc[0, "n_bytes"]) == n
    in_h = -(-n // 64)  # 21
    exp = np.zeros((8, 8), np.int64)
    for r in range(8):
        for c in range(8):
            idx = ((r * in_h) // 8) * 64 + (c * 64) // 8
            exp[r, c] = 32 + (idx % 90) if idx < n else 0
    assert int(out.loc[0, "px00"]) == exp[0, 0]
    assert int(out.loc[0, "px77"]) == exp[7, 7]
    assert int(out.loc[0, "px_sum"]) == int(exp.sum())


def test_video_frame_sample_planted(ray_session, tmp_path):
    """Stride sampling keeps frames 0,4,8,... and the md5 is of the exact
    frame bytes (short tail frame included)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.multimodal import video_frame_sample

    text = "ab" * 1200  # 2400 bytes -> 10 frames of 256 (last = 96)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([text]),
                  "lang": pa.array(["en"])}),
        str(d / "documents.parquet"),
    )
    out = video_frame_sample(str(d))
    assert list(out["frame_idx"]) == [0, 4, 8]
    raw = text.encode()
    for _, row in out.iterrows():
        j = int(row["frame_idx"])
        chunk = raw[j * 256 : (j + 1) * 256]
        assert int(row["frame_bytes"]) == len(chunk)
        assert row["frame_md5"] == hashlib.md5(chunk).hexdigest()[:16]


def test_chunk_batch_vectorized_equals_loop():
    """The offsets-arithmetic chunker reproduces the per-row loop
    bit-for-bit on every window/terminator edge: empty doc, blank
    lines, trailing newline, exact window multiples, overlap tails."""
    import numpy as np
    import pyarrow as pa

    from ck_ray.semantic import chunk_batch

    cases = [
        "",
        "\n",
        "one line",
        "one line\n",
        "\n\n\n",
        "\n".join(f"l{i}" for i in range(19)),
        "\n".join(f"l{i}" for i in range(20)),
        "\n".join(f"l{i}" for i in range(21)),
        "\n".join(f"l{i}" for i in range(36)),       # exact 2 windows
        "\n".join(f"l{i}" for i in range(37)),
        "\n".join(f"l{i}" for i in range(100)) + "\n",
        "a\n\nb\n\n\nc\n",
        "crlf one\r\ncrlf two\r\nthree\r\n",
        "mac one\rmac two\rmac three",
    ]
    n = len(cases)
    t = pa.table(
        {
            "repo": pa.array(["r"] * n),
            "path": pa.array([f"p{i}" for i in range(n)]),
            "commit": pa.array(["0"] * n),
            "lang": pa.array(["text"] * n),
            "content": pa.array(cases),
        }
    )
    got = chunk_batch(t, target_lines=20, overlap_lines=4).to_pandas()

    # reference loop (the pre-vectorization implementation, \n rule)
    rows = []
    step = 16
    for i, content in enumerate(cases):
        lines = content.replace("\r\n", "\n").replace("\r", "\n").split("\n")
        if lines and lines[-1] == "":
            lines = lines[:-1]
        s, cid = 0, 0
        while s < len(lines):
            e = min(s + 20, len(lines))
            rows.append((f"p{i}", cid, s + 1, e, "\n".join(lines[s:e])))
            cid += 1
            if e == len(lines):
                break
            s += step
    assert len(got) == len(rows)
    for (path, cid, ls, le, text), (_, r) in zip(rows, got.iterrows()):
        assert (r["path"], r["chunk_id"], r["line_start"], r["line_end"],
                r["text"]) == (path, cid, ls, le, text)
