"""Sampled-range global sort: partition disjointness, resumable layout,
rank-sample proof, and skew behavior."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ck_ray.sort import range_sort_write, sorted_rank_sample


# a lambda pickles BY VALUE (cloudpickle), so Ray workers never need to
# import this test module; a named module-level function would not
_key_fn = lambda t: (  # noqa: E731
    t["k"].to_numpy(zero_copy_only=False).astype(np.int64),
    t["tie"].to_numpy(zero_copy_only=False).astype(np.int64),
)


def _mk_ds(keys, ties):
    return ray.data.from_arrow(
        pa.table(
            {"k": pa.array(keys, pa.int64()), "tie": pa.array(ties, pa.int64())}
        )
    ).repartition(8)


def test_global_order_and_layout(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    keys = rng.randint(-1000, 1000, size=5000)
    ties = np.arange(5000)
    out_dir = str(tmp_path / "sorted")
    summary = range_sort_write(
        _mk_ds(keys, ties), _key_fn, out_dir, num_parts=8
    )

    # ranges disjoint and ascending; offsets are exact prefix sums
    assert (summary["part"].to_numpy() == np.sort(summary["part"])).all()
    assert int(summary["n_rows"].sum()) == 5000
    assert (
        summary["max_key"].to_numpy()[:-1] < summary["min_key"].to_numpy()[1:]
    ).all()

    # reading partitions in order IS the sorted table
    got = pa.concat_tables(
        [pq.read_table(p) for p in summary["path"]]
    ).to_pandas()
    exp = (
        pd.DataFrame({"k": keys, "tie": ties})
        .sort_values(["k", "tie"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "tie"]].reset_index(drop=True), exp
    )

    # rank sample matches row_number over the fully sorted frame
    sample, step = sorted_rank_sample(summary, target_rows=50)
    exp_rn = np.arange(1, 5001)
    want = exp.iloc[exp_rn[exp_rn % step == 0] - 1]
    assert list(sample.sort_values("rn")["k"]) == list(want["k"])
    assert list(sample.sort_values("rn")["tie"]) == list(want["tie"])


def test_equal_keys_colocate(ray_session, tmp_path):
    """All rows of one (heavily repeated) key land in ONE partition even
    when that key is chosen as a splitter."""
    keys = np.concatenate([np.zeros(3000, np.int64), np.array([1, 2, 3])])
    ties = np.arange(len(keys))
    summary = range_sort_write(
        _mk_ds(keys, ties), _key_fn, str(tmp_path / "s"), num_parts=8
    )
    holders = [
        p for p, lo, hi in zip(
            summary["part"], summary["min_key"], summary["max_key"]
        )
        if lo <= 0 <= hi
    ]
    assert len(holders) == 1
    n0 = int(
        summary.loc[summary["part"] == holders[0], "n_rows"].iloc[0]
    )
    assert n0 >= 3000


def test_retry_overwrite_idempotent(ray_session, tmp_path):
    """The partition file name is deterministic: re-running the sort into
    the same dir replaces files instead of duplicating rows."""
    keys = np.arange(100)[::-1].copy()
    ties = np.arange(100)
    out_dir = str(tmp_path / "s2")
    s1 = range_sort_write(_mk_ds(keys, ties), _key_fn, out_dir, num_parts=4)
    s2 = range_sort_write(_mk_ds(keys, ties), _key_fn, out_dir, num_parts=4)
    assert int(s2["n_rows"].sum()) == 100
    for p in s2["path"]:
        d = os.path.dirname(p)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert files == ["data.parquet"]
    pd.testing.assert_frame_equal(
        s1[["part", "n_rows", "min_key", "max_key"]],
        s2[["part", "n_rows", "min_key", "max_key"]],
    )


def test_actor_exchange_backend(ray_session, tmp_path):
    """The sort rides the shared-nothing ActorExchange unchanged: owner
    actors on disjoint roots (simulated node-local disks) produce the
    same summary and the same sorted bytes as the fs backend."""
    from ck_ray.exchange import ActorExchange

    keys = (np.arange(2000) * 37) % 501 - 250
    ties = np.arange(2000)
    fs_dir = str(tmp_path / "fs")
    s_fs = range_sort_write(_mk_ds(keys, ties), _key_fn, fs_dir, num_parts=6)

    ax_dir = str(tmp_path / "ax")
    roots = [str(tmp_path / f"node{i}") for i in range(3)]
    be = ActorExchange(num_owners=3, roots=roots)
    s_ax = range_sort_write(
        _mk_ds(keys, ties), _key_fn, ax_dir, num_parts=6, backend=be
    )
    pd.testing.assert_frame_equal(
        s_fs[["part", "n_rows", "min_key", "max_key"]],
        s_ax[["part", "n_rows", "min_key", "max_key"]],
    )
    a = pa.concat_tables([pq.read_table(p) for p in s_fs["path"]])
    b = pa.concat_tables([pq.read_table(p) for p in s_ax["path"]])
    assert a.equals(b)


def test_empty_input(ray_session, tmp_path):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "tie": pa.array([], pa.int64())})
    )
    summary = range_sort_write(ds, _key_fn, str(tmp_path / "s3"))
    assert len(summary) == 0
    sample, step = sorted_rank_sample(summary)
    assert len(sample) == 0 and step == 1
