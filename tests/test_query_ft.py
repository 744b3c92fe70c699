"""Serving fault tolerance: DocShard actors restart after a worker
death. A LocalIndex is read-only after __init__ (every byte re-derived
from index_dir), so ``max_restarts=-1, max_task_retries=-1`` lets Ray
respawn a killed shard and transparently retry the idempotent query
method — on a real cluster one lost node must not brick an open engine
(reference keeps its tantivy searcher in-process; the distributed
analogue is shard respawn)."""

import ray

from ck_ray.query import BM25Engine

QUERIES = [
    "merge_posting_runs",
    "tokenize stream",
    '"def merge_posting_runs"',
    "+parse -stream",
]


def _snapshot(eng, q):
    ids, scores = eng.search_raw(q, top_k=10)
    return list(ids), [float(s) for s in scores]


def test_shard_killed_then_queries_identical(ray_session, tiny_index):
    eng = BM25Engine(tiny_index, num_shards=3, auto_reload=False)
    try:
        before = [_snapshot(eng, q) for q in QUERIES]
        # simulate a worker/node death for ONE shard; no_restart=False
        # leaves Ray's restart policy (max_restarts=-1) in charge
        ray.kill(eng.shards[0], no_restart=False)
        after = [_snapshot(eng, q) for q in QUERIES]
        assert after == before
        # kill a DIFFERENT shard between two queries of a batch path too
        ray.kill(eng.shards[-1], no_restart=False)
        df = eng.search(QUERIES[0], top_k=10)
        assert df["doc_id"].tolist() == before[0][0]
    finally:
        eng.close()


def test_all_shards_killed_then_query_recovers(ray_session, tiny_index):
    eng = BM25Engine(tiny_index, num_shards=2, auto_reload=False)
    try:
        before = _snapshot(eng, QUERIES[0])
        for s in eng.shards:
            ray.kill(s, no_restart=False)
        assert _snapshot(eng, QUERIES[0]) == before
    finally:
        eng.close()


def test_replicas_identical_and_batch_split(ray_session, tiny_index):
    """num_replicas=2: sticky single-query routing and the split batch
    path return exactly what the unreplicated engine returns, in order;
    a repeated query always lands on the SAME replica (cache affinity)."""
    base = BM25Engine(tiny_index, num_shards=2, auto_reload=False)
    rep = BM25Engine(
        tiny_index, num_shards=2, auto_reload=False, num_replicas=2
    )
    try:
        want = [base.search_raw(q, 10) for q in QUERIES]
        for _ in range(2):
            for q, (wd, ws) in zip(QUERIES, want):
                d, s = rep.search_raw(q, 10)
                assert list(d) == list(wd) and list(s) == list(ws)
        # sticky: the routed replica for a query is stable across calls
        for q in QUERIES:
            assert rep._next_replica(q) is rep._next_replica(q)
        batch = rep.search_many(QUERIES * 3, top_k=10)
        assert len(batch) == len(QUERIES) * 3
        for i, (d, s) in enumerate(batch):
            wd, ws = want[i % len(QUERIES)]
            assert list(d) == list(wd) and list(s) == list(ws)
        # a killed shard in the replica a query routes TO restarts
        # transparently mid-serving
        victim = rep._next_replica(QUERIES[0])[0]
        ray.kill(victim, no_restart=False)
        for _ in range(2):
            d, s = rep.search_raw(QUERIES[0], 10)
            assert list(d) == list(want[0][0])
    finally:
        rep.close()
        base.close()


def test_offset_pagination_matches_full_list(ray_session, tiny_index):
    """offset=N must equal slicing the full ranked list — raw and
    DataFrame paths, incl. normalization by the GLOBAL rank-1 score
    (page 2's normalized scores equal page 1's for the same docs)."""
    import numpy as np
    import pandas as pd
    import pytest

    eng = BM25Engine(tiny_index, num_shards=3, auto_reload=False)
    q = "merge stream tokenize"
    try:
        full_d, full_s = eng.search_raw(q, top_k=200)
        for off in (0, 3, 7, len(full_d) - 2, len(full_d) + 50):
            d, s = eng.search_raw(q, top_k=5, offset=off)
            assert list(d) == list(full_d[off:off + 5]), off
            assert list(s) == list(full_s[off:off + 5]), off
        df_all = eng.search(q, top_k=200)
        df2 = eng.search(q, top_k=5, offset=5)
        pd.testing.assert_frame_equal(
            df2, df_all.iloc[5:10].reset_index(drop=True)
        )
        assert np.array_equal(
            df2["normalized_score"].to_numpy(),
            df_all["normalized_score"].to_numpy()[5:10],
        )
        # offset past the match set: empty, stable schema
        df = eng.search(q, top_k=5, offset=10**6)
        assert len(df) == 0 and list(df.columns) == list(df_all.columns)
        with pytest.raises(ValueError):
            eng.search_raw(q, top_k=5, offset=-1)
        with pytest.raises(ValueError):
            eng.search(q, top_k=5, offset=-1)
    finally:
        eng.close()
