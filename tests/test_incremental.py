"""Incremental epoch updates: query-identical to a full rebuild."""

import numpy as np
import pyarrow as pa
import pytest

import ck_ray.build as ckb
from ck_ray.incremental import incremental_update
from ck_ray.oracle import BM25Oracle
from ck_ray.query import BM25Engine


def _mutate(corpus: pa.Table) -> pa.Table:
    """~5% modified, ~2% added, ~2% deleted (FIXTURES.md §4)."""
    rows = corpus.to_pylist()
    rng = np.random.RandomState(7)
    n = len(rows)
    mod = set(rng.choice(n, n // 20, replace=False).tolist())
    dele = set(rng.choice(sorted(set(range(n)) - mod), n // 50, replace=False).tolist())
    out = []
    for i, r in enumerate(rows):
        if i in dele:
            continue
        if i in mod:
            r = dict(r, content=r["content"] + "\nmodified_sentinel extra merge line\n")
        out.append(r)
    for j in range(n // 50):
        out.append(
            {
                "repo": "org0/repo0",
                "path": f"src/new/added{j:04d}.py",
                "commit": "f" * 40,
                "lang": "python",
                "content": f"def added_fn_{j} the merge window\nreturn uqadded{j:05d}marker\n",
            }
        )
    out.sort(key=lambda r: (r["repo"], r["path"]))
    cols = list(zip(*[(r["repo"], r["path"], r["commit"], r["lang"], r["content"]) for r in out]))
    return pa.table(
        {
            "repo": pa.array(cols[0]), "path": pa.array(cols[1]),
            "commit": pa.array(cols[2]), "lang": pa.array(cols[3]),
            "content": pa.array(cols[4]),
        }
    )


QUERIES = [
    "merge", "def", "modified_sentinel", "uqadded00003marker",
    "snake_case", "the merge window", "uq0000042marker",
]


def test_incremental_equals_full_rebuild(ray_session, tiny_corpus, tmp_path):
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    v2 = _mutate(tiny_corpus)

    d_inc = str(tmp_path / "inc")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d_inc, cfg)
    man = incremental_update(ray.data.from_arrow(v2), d_inc, cfg)
    assert man["n_changed"] > 0 and man["n_deleted"] > 0
    assert len(man["epochs"]) == 2
    assert man["num_docs"] == v2.num_rows

    d_full = str(tmp_path / "full")
    ckb.build_index(ray.data.from_arrow(v2), d_full, cfg)
    man_full = ckb.load_manifest(d_full)
    # exact global stats equality
    for f in ("content", "path"):
        assert man["fields"][f]["total_tokens"] == man_full["fields"][f]["total_tokens"]

    eng_inc = BM25Engine(d_inc, num_shards=2)
    eng_full = BM25Engine(d_full, num_shards=2)
    oracle = BM25Oracle(v2)
    try:
        for q in QUERIES:
            di, si = eng_inc.search_raw(q, 50)
            df_, sf = eng_full.search_raw(q, 50)
            assert di.tolist() == df_.tolist(), f"{q}: docs differ"
            assert np.array_equal(si, sf), f"{q}: scores differ"
            do, so = oracle.search_raw(q, 50)
            assert di.tolist() == do.tolist(), f"{q}: oracle docs differ"
            assert np.array_equal(si, so), f"{q}: oracle scores differ"
    finally:
        eng_inc.close()
        eng_full.close()


def test_incremental_noop(ray_session, tiny_corpus, tmp_path):
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)
    man1 = ckb.load_manifest(d)
    man2 = incremental_update(ray.data.from_arrow(tiny_corpus), d, cfg)
    assert man2.get("epochs") == man1.get("epochs")  # unchanged -> no new epoch


def test_delete_then_readd(ray_session, tiny_corpus, tmp_path):
    """A doc deleted in epoch N and re-added in epoch N+1 must be live:
    deletions are epoch-scoped, not applied to later epochs (ADVICE r1)."""
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)
    v2 = tiny_corpus.slice(5)  # drop first 5 docs -> deletion epoch
    incremental_update(ray.data.from_arrow(v2), d, cfg)
    # re-add the originals (identical content) -> new epoch re-adds them
    man = incremental_update(ray.data.from_arrow(tiny_corpus), d, cfg)
    assert man["n_changed"] == 5 and man["n_deleted"] == 0
    assert man["num_docs"] == tiny_corpus.num_rows
    eng = BM25Engine(d, num_shards=2)
    oracle = BM25Oracle(tiny_corpus)
    try:
        for q in ("merge", "def", "the merge window"):
            di, si = eng.search_raw(q, 50)
            do, so = oracle.search_raw(q, 50)
            assert di.tolist() == do.tolist(), f"{q}: docs differ after re-add"
            assert np.array_equal(si, so), f"{q}: scores differ after re-add"
    finally:
        eng.close()
    # a further no-op update must not re-classify the re-added docs
    man2 = incremental_update(ray.data.from_arrow(tiny_corpus), d, cfg)
    assert man2.get("epochs") == man.get("epochs")


def test_delete_by_query(ray_session, tiny_corpus, tmp_path):
    """delete_by_query (ES _delete_by_query): after tombstoning every
    doc matching the query, the index is QUERY-IDENTICAL to a
    from-scratch build over the corpus minus those docs (num_docs,
    avgdl and live dfs all adjust) — rank and f32 scores verified
    against the brute-force oracle on the filtered corpus. A
    no-match delete is a manifest no-op; a later incremental_update
    re-adds deleted docs (epoch-scoped deletions)."""
    import ray.data

    from ck_ray.incremental import delete_by_query
    from ck_ray.tokenizer import tokenize_text

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)

    man0 = ckb.load_manifest(d)
    assert delete_by_query(d, "zzznosuchterm") == man0  # no-op
    assert ckb.load_manifest(d).get("epochs", None) == man0.get(
        "epochs", None
    )

    # delete a boolean match set: docs with 'merge' but not 'stream'
    q_del = "merge -stream"
    keep_mask = []
    for c in tiny_corpus["content"].to_pylist():
        toks = set(tokenize_text(c))
        keep_mask.append(not ("merge" in toks and "stream" not in toks))
    kept = tiny_corpus.filter(pa.array(keep_mask))
    n_deleted = tiny_corpus.num_rows - kept.num_rows
    assert n_deleted > 0  # the corpus must exercise a real deletion

    man = delete_by_query(d, q_del)
    assert man["n_deleted"] == n_deleted
    assert man["num_docs"] == kept.num_rows

    eng = BM25Engine(d, num_shards=2)
    oracle = BM25Oracle(kept)
    try:
        # the deleted docs are gone from their own match set
        assert len(eng.search_raw(q_del, 50)[0]) == 0
        for q in ("merge", "stream", "def", "the merge window"):
            di, si = eng.search_raw(q, 50)
            do, so = oracle.search_raw(q, 50)
            assert di.tolist() == do.tolist(), f"{q}: docs differ"
            assert np.array_equal(si, so), f"{q}: scores differ"
    finally:
        eng.close()

    # re-adding the full corpus restores the deleted docs
    man2 = incremental_update(ray.data.from_arrow(tiny_corpus), d, cfg)
    assert man2["n_changed"] == n_deleted
    assert man2["num_docs"] == tiny_corpus.num_rows
    eng = BM25Engine(d, num_shards=2)
    full_oracle = BM25Oracle(tiny_corpus)
    try:
        di, si = eng.search_raw(q_del, 50)
        do, so = full_oracle.search_raw(q_del, 50)
        assert di.tolist() == do.tolist()
        assert np.array_equal(si, so)
    finally:
        eng.close()


def test_engine_auto_reload_after_update(ray_session, tiny_corpus, tmp_path):
    """An open BM25Engine must not serve a stale epoch set: after an
    incremental_update commits a new manifest, the next search on the SAME
    engine transparently reloads the shard pool (auto_reload=True default);
    auto_reload=False pins the loaded epoch until an explicit refresh()."""
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)
    eng = BM25Engine(d, num_shards=2)
    pinned = BM25Engine(d, num_shards=2, auto_reload=False)
    try:
        q = "uqadded00003marker"  # only exists in the mutated corpus
        assert len(eng.search_raw(q, 10)[0]) == 0
        assert len(pinned.search_raw(q, 10)[0]) == 0

        v2 = _mutate(tiny_corpus)
        incremental_update(ray.data.from_arrow(v2), d, cfg)

        # auto-reloading engine sees the new epoch, scores bitwise-equal
        # to a freshly opened engine and the oracle over v2
        di, si = eng.search_raw(q, 10)
        oracle = BM25Oracle(v2)
        do, so = oracle.search_raw(q, 10)
        assert len(di) > 0
        assert di.tolist() == do.tolist()
        assert np.array_equal(si, so)

        # pinned engine still serves the original epoch...
        assert len(pinned.search_raw(q, 10)[0]) == 0
        # ...until an explicit refresh, which reports the reload
        assert pinned.refresh() is True
        dp, sp = pinned.search_raw(q, 10)
        assert dp.tolist() == do.tolist()
        assert np.array_equal(sp, so)
        # second refresh with no new commit is a no-op
        assert pinned.refresh() is False
        assert eng.refresh() is False
    finally:
        eng.close()
        pinned.close()


def test_clean_orphans_mode(ray_session, tiny_corpus, tmp_path):
    """deletions_only=True (reference --clean-orphans): docs absent from
    the corpus are tombstoned, but content changes in still-present docs
    are IGNORED — nothing is reindexed."""
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)

    rows = tiny_corpus.to_pylist()
    survivors = rows[10:]  # first 10 become orphans
    v2 = [dict(r) for r in survivors]
    v2[0]["content"] += "\norphanmode_sentinel line\n"  # change ignored
    v2.append(  # brand-new doc: also ignored in deletions_only mode
        dict(rows[0], path="src/new/fresh.py",
             content="def fresh(): orphanmode_sentinel\n")
    )
    v2_t = pa.Table.from_pylist(v2)

    man = incremental_update(
        ray.data.from_arrow(v2_t), d, cfg, deletions_only=True
    )
    assert man["n_deleted"] == 10 and man["n_changed"] == 0
    assert man["num_docs"] == len(survivors)

    # queries behave exactly like the OLD content restricted to survivors
    old_survivors = pa.Table.from_pylist(survivors)
    eng = BM25Engine(d, num_shards=2)
    oracle = BM25Oracle(old_survivors)
    try:
        assert len(eng.search_raw("orphanmode_sentinel", 10)[0]) == 0
        for q in ("merge", "def"):
            di, si = eng.search_raw(q, 30)
            do, so = oracle.search_raw(q, 30)
            assert di.tolist() == do.tolist()
            assert np.array_equal(si, so)
    finally:
        eng.close()

    with pytest.raises(ValueError, match="mutually exclusive"):
        incremental_update(
            ray.data.from_arrow(v2_t), d, cfg,
            additive=True, deletions_only=True,
        )


def test_deletion_only_update(ray_session, tiny_corpus, tmp_path):
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)
    v2 = tiny_corpus.slice(10)  # drop first 10 docs
    man = incremental_update(ray.data.from_arrow(v2), d, cfg)
    assert man["n_deleted"] == 10 and man["n_changed"] == 0
    eng = BM25Engine(d, num_shards=2)
    oracle = BM25Oracle(v2)
    try:
        for q in ("merge", "def"):
            di, si = eng.search_raw(q, 30)
            do, so = oracle.search_raw(q, 30)
            assert di.tolist() == do.tolist()
            assert np.array_equal(si, so)
    finally:
        eng.close()
