"""Doc-partitioned serving layout: slicing round-trip, shard-local
scoring, and the O(shards * k) driver-traffic contract."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from ck_ray import codec
from ck_ray.build import doc_bucket_of, load_manifest
from ck_ray.query import BM25Engine, LocalIndex


def _decode_all(root: str, fname_filter) -> dict:
    """(field, term) -> (docs, tfs, dls) concatenated over matching files
    in layout order."""
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".parquet") or not fname_filter(dirpath):
                continue
            t = pq.read_table(os.path.join(dirpath, f))
            for i, term in enumerate(t["term"].to_pylist()):
                key = (t["field"][i].as_py(), term)
                d, tf, dl = codec.decode_posting_list(t["postings"][i].as_py())
                if key in out:
                    pd, ptf, pdl = out[key]
                    out[key] = (
                        np.concatenate((pd, d)),
                        np.concatenate((ptf, tf)),
                        np.concatenate((pdl, dl)),
                    )
                else:
                    out[key] = (d, tf, dl)
    return out


def test_serving_slices_reconstruct_segments(ray_session, tiny_index):
    """Per-term concat of doc-range bucket slices == the segment posting
    list, for EVERY term (doc ids, tfs, dls) — the serving projection is
    lossless."""
    man = load_manifest(tiny_index)
    ep = man["epoch_dir"]
    segs = _decode_all(
        os.path.join(tiny_index, ep, "segments"), lambda d: True
    )
    srv = _decode_all(
        os.path.join(tiny_index, ep, "serving", "post"), lambda d: True
    )
    assert set(segs) == set(srv)
    B = man["num_serving_buckets"]
    for key, (d, tf, dl) in segs.items():
        sd, stf, sdl = srv[key]
        # serving rows are per (bucket, part-file); sort both by doc
        so = np.argsort(sd)
        o = np.argsort(d)
        assert np.array_equal(d[o], sd[so]), key
        assert np.array_equal(tf[o], stf[so]), key
        assert np.array_equal(dl[o], sdl[so]), key
        # every serving posting landed in the right bucket file
        assert np.all(doc_bucket_of(sd, B) >= 0)


def test_fanout_traffic_is_shards_times_k(ray_session, tiny_index):
    """Per-query rows crossing actor->driver must be <= shards * k even
    for a hot term matching most of the corpus (the r1 scale-killer:
    driver-side scoring shipped O(postings))."""
    eng = BM25Engine(tiny_index, num_shards=4)
    try:
        k = 10
        docs, _ = eng.search_raw("def", k)  # hot term, df >> k
        assert len(docs) == k
        assert eng.last_fanout_rows <= 4 * k
        # and the engine still agrees with the embedded full-local engine
        idx = LocalIndex(tiny_index)
        ld, ls = idx.query_topk("def", k)
        assert docs.tolist() == ld.tolist()
    finally:
        eng.close()


def test_shard_union_covers_local(ray_session, tiny_index):
    """Every shard sees a disjoint doc subset; their union equals the
    embedded engine's full result set."""
    idx_full = LocalIndex(tiny_index)
    man = load_manifest(tiny_index)
    B = man["num_serving_buckets"]
    d_full, s_full = idx_full.query_topk("merge", 100_000)
    parts = []
    for s in range(4):
        sub = LocalIndex(tiny_index, [b for b in range(B) if b % 4 == s])
        d, sc = sub.query_topk("merge", 100_000)
        parts.append(set(d.tolist()))
        # shard results stay within its bucket ranges
        got_buckets = set(doc_bucket_of(d, B).tolist())
        assert got_buckets <= {b for b in range(B) if b % 4 == s}
    union = set().union(*parts)
    assert union == set(d_full.tolist())
    assert sum(len(p) for p in parts) == len(union)  # disjoint


def test_search_metadata_from_shards(ray_session, tiny_index, tiny_corpus):
    """search() metadata (repo/path/sha) now comes from the shards'
    doc-range metadata, and must match the corpus ground truth."""
    import hashlib

    eng = BM25Engine(tiny_index, num_shards=2)
    try:
        df = eng.search("merge_posting_runs", top_k=5)
        assert len(df) > 0
        truth = {
            (r["repo"], r["path"]): hashlib.sha256(
                r["content"].encode()
            ).hexdigest()
            for r in tiny_corpus.to_pylist()
        }
        for _, row in df.iterrows():
            assert truth[(row["repo"], row["path"])] == row["content_sha256"]
        # with_metadata=False must actually skip metadata (ADVICE r2):
        # only the three score columns, same ranking as the full search.
        slim = eng.search("merge_posting_runs", top_k=5, with_metadata=False)
        assert list(slim.columns) == ["doc_id", "score", "normalized_score"]
        assert slim["doc_id"].tolist() == df["doc_id"].tolist()
        assert slim["score"].tolist() == df["score"].tolist()
    finally:
        eng.close()


@pytest.mark.parametrize("num_shards", [1, 3, 8])
def test_rank_identity_any_shard_count(ray_session, tiny_index, num_shards):
    """Result invariance under shard-count choice (merge correctness)."""
    ref = LocalIndex(tiny_index)
    eng = BM25Engine(tiny_index, num_shards=num_shards)
    try:
        for q in ("def merge window", "snake_case", "path:core", "the"):
            d1, s1 = eng.search_raw(q, 25)
            d2, s2 = ref.query_topk(q, 25)
            assert d1.tolist() == d2.tolist(), q
            assert np.array_equal(s1, s2), q
    finally:
        eng.close()
