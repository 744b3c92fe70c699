"""Epoch compaction: posting-level merge of the epoch chain into one
epoch, query-identical to the multi-epoch index AND to a clean rebuild
of the final corpus state."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ck_ray.build as ckb
from ck_ray.compact import compact_index
from ck_ray.incremental import incremental_update
from ck_ray.query import BM25Engine
from tests.test_incremental import QUERIES, _mutate


@pytest.fixture(scope="module")
def chain(ray_session, tiny_corpus, tmp_path_factory):
    """Index with a 3-epoch history (build + 2 updates incl. deletions
    and a delete->re-add), plus the final corpus table."""
    import ray.data

    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    d = str(tmp_path_factory.mktemp("compact") / "idx")
    v2 = _mutate(tiny_corpus)
    # v3: drop one v2 doc, re-add one doc deleted in v2, touch another
    rows = v2.to_pylist()
    v1_paths = set(tiny_corpus["path"].to_pylist())
    deleted_in_v2 = sorted(v1_paths - {r["path"] for r in rows})
    rows = rows[:-1]  # delete v2's last doc in v3
    readd = deleted_in_v2[0]
    i = tiny_corpus["path"].to_pylist().index(readd)
    rows.append({
        "repo": tiny_corpus["repo"][i].as_py(),
        "path": readd,
        "commit": tiny_corpus["commit"][i].as_py(),
        "lang": tiny_corpus["lang"][i].as_py(),
        "content": tiny_corpus["content"][i].as_py() + "\nreadd_sentinel\n",
    })
    rows[0] = dict(rows[0], content=rows[0]["content"] + "\nv3_sentinel\n")
    rows.sort(key=lambda r: (r["repo"], r["path"]))
    v3 = pa.table({
        k: pa.array([r[k] for r in rows])
        for k in ("repo", "path", "commit", "lang", "content")
    })

    ckb.build_index(ray.data.from_arrow(tiny_corpus), d, cfg)
    incremental_update(ray.data.from_arrow(v2), d, cfg)
    incremental_update(ray.data.from_arrow(v3), d, cfg)
    assert len(ckb.load_manifest(d)["epochs"]) == 3
    return d, v3


def test_merge_indexes_query_identity(ray_session, tiny_corpus, tmp_path):
    """merge_indexes(A, B): the output is query-identical (rank + f32
    score, phrases included) to a clean build over the B-wins union of
    the two corpora — doc_id conflicts resolved right-most, positions
    surviving the posting-level rewrite, stats recomputed exactly.
    Sources stay untouched; mixed num_parts across sources is fine
    (postings re-partition); an occupied output dir is refused."""
    import ray.data

    from ck_ray.compact import merge_indexes
    from ck_ray.oracle import BM25Oracle

    a = tiny_corpus
    b = _mutate(tiny_corpus)  # overlapping ids with changed content
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    ckb.build_index(
        ray.data.from_arrow(a), da,
        ckb.IndexConfig(num_parts=4, batch_size=64),
    )
    ckb.build_index(
        ray.data.from_arrow(b), db,
        ckb.IndexConfig(num_parts=2, batch_size=64),  # mixed num_parts
    )
    out = str(tmp_path / "merged")
    root = merge_indexes([da, db], out)

    def key(r):
        return (r["repo"], r["path"], r["commit"])

    union = {key(r): r for r in a.to_pylist()}
    union.update({key(r): r for r in b.to_pylist()})  # B wins
    rows = sorted(union.values(), key=lambda r: (r["repo"], r["path"]))
    expect = pa.table({
        k: pa.array([r[k] for r in rows])
        for k in ("repo", "path", "commit", "lang", "content")
    })
    assert root["num_docs"] == len(rows)
    assert root["merged_from"] == [os.path.abspath(da), os.path.abspath(db)]

    eng = BM25Engine(out, num_shards=2)
    oracle = BM25Oracle(expect)
    try:
        for q in QUERIES + ["path:core"]:
            di, si = eng.search_raw(q, 50)
            do, so = oracle.search_raw(q, 50)
            assert di.tolist() == do.tolist(), f"{q}: docs differ"
            assert np.array_equal(si, so), f"{q}: scores differ"
    finally:
        eng.close()

    # sources untouched and still loadable
    assert ckb.load_manifest(da)["num_docs"] == a.num_rows
    assert ckb.load_manifest(db)["num_docs"] == b.num_rows
    with pytest.raises(FileExistsError):
        merge_indexes([da], out)


def test_compact_query_identity_and_layout(chain, tmp_path):
    import ray.data

    d, v3 = chain
    queries = QUERIES + ["readd_sentinel", "v3_sentinel", "path:core"]
    eng = BM25Engine(d, num_shards=2)
    before = {q: eng.search_raw(q, 50) for q in queries}
    man_before = ckb.load_manifest(d)

    root = compact_index(d)
    assert root["epochs"] == [root["epoch"]]
    assert root["compacted_from"] == man_before["epochs"]
    # old epoch dirs gone, new one present
    for e in man_before["epochs"]:
        assert not os.path.exists(os.path.join(d, e))
    assert os.path.isdir(os.path.join(d, root["epoch"]))
    # exact stats survive
    assert root["num_docs"] == man_before["num_docs"] == v3.num_rows
    for f in ("content", "path"):
        assert (
            root["fields"][f]["total_tokens"]
            == man_before["fields"][f]["total_tokens"]
        )

    # the OPEN engine auto-reloads onto the compacted epoch; results are
    # bitwise identical
    for q in queries:
        da, sa = eng.search_raw(q, 50)
        db, sb = before[q]
        assert np.array_equal(da, db), q
        assert np.array_equal(sa, sb), q
    eng.close()

    # compacted index == clean rebuild of the final corpus (stats + results)
    d_full = str(tmp_path / "full")
    ckb.build_index(
        ray.data.from_arrow(v3), d_full,
        ckb.IndexConfig(num_parts=4, batch_size=64),
    )
    eng_c = BM25Engine(d, num_shards=2)
    eng_f = BM25Engine(d_full, num_shards=2)
    try:
        for q in queries:
            dc, sc = eng_c.search_raw(q, 50)
            df_, sf = eng_f.search_raw(q, 50)
            assert np.array_equal(dc, df_), q
            assert np.array_equal(sc, sf), q
    finally:
        eng_c.close()
        eng_f.close()


def test_compact_single_epoch_noop_shape(ray_session, tiny_corpus, tmp_path):
    """Compacting a 1-epoch index is valid and stays query-identical."""
    import ray.data

    d = str(tmp_path / "idx")
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d,
        ckb.IndexConfig(num_parts=4, batch_size=64),
    )
    eng = BM25Engine(d, num_shards=2)
    before = {q: eng.search_raw(q, 20) for q in ("merge", "def", "uq0000042marker")}
    compact_index(d)
    for q, (db, sb) in before.items():
        da, sa = eng.search_raw(q, 20)
        assert np.array_equal(da, db) and np.array_equal(sa, sb), q
    eng.close()


def test_compact_rides_actor_exchange(ray_session, tiny_corpus, tmp_path):
    """Compaction over the shared-nothing ActorExchange (multi-node
    transport): same bitwise results as the fs-backend compact."""
    import ray.data

    d = str(tmp_path / "idx")
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d,
        ckb.IndexConfig(num_parts=4, batch_size=64),
    )
    eng = BM25Engine(d, num_shards=2)
    before = {q: eng.search_raw(q, 20) for q in ("merge", "def", "the merge")}
    man = ckb.load_manifest(d)
    compact_index(d, ckb.IndexConfig(
        num_parts=man["num_parts"],
        store_positions=man["store_positions"],
        serving_buckets=man["num_serving_buckets"],
        exchange_backend="actor",
    ))
    assert ckb.load_manifest(d)["epochs"] == ["epoch-0002"]
    for q, (db, sb) in before.items():
        da, sa = eng.search_raw(q, 20)
        assert np.array_equal(da, db) and np.array_equal(sa, sb), q
    eng.close()
