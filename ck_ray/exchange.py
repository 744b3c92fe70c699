"""Generic hash-partitioned exchange over run files.

The SPIMI build's shuffle (``build.py``: tasks spill one Arrow-IPC run
file per hash partition, then one task per partition reduces it) packaged
as a reusable groupby/join primitive. Ray's sort-based ``groupby`` was
measured at ~6.5 s for a 750k-row aggregate on this host (and the
hash-shuffle strategy slower still); this exchange does the same
co-location in well under a second because the map side is embarrassingly
parallel and the reduce side is one vectorized pyarrow kernel per
partition.

Semantics are exactly a ``groupby(key)`` exchange: every row with the
same key lands in partition ``hash(key) % P``, and ``reducer`` sees ALL
rows of its partition at once. On a multi-node cluster the exchange root
is shared scratch / node-local SSD with partition affinity — the same
layout the index build documents; locally it is /dev/shm.

Contract: the reducer's OUTPUT must be the reduced (small) side — it is
collected into one Dataset->pandas result.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .build import _read_runs, _sweep_stale_exchange, _trash_async


def _exchange_root() -> str:
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm/ck_ray_exchange"
    import tempfile

    return os.path.join(tempfile.gettempdir(), "ck_ray_exchange")


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def int_key_hash(keys: np.ndarray) -> np.ndarray:
    """Mix an int64 key column to uniform uint64 (splitmix-style)."""
    x = keys.astype(np.uint64) * _GOLDEN
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return x


class _Spiller:
    """Map task: spill a batch's rows into per-partition run files."""

    def __init__(self, exchange_dir: str, num_parts: int,
                 key_fn: Callable[[pa.Table], np.ndarray]):
        self.exchange_dir = exchange_dir
        self.num_parts = num_parts
        self.key_fn = key_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table({"part": pa.array([], pa.int32())})
        if t.num_rows == 0:
            return empty
        part = (self.key_fn(t) % np.uint64(self.num_parts)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        ps = part[order]
        starts = np.nonzero(np.concatenate(([True], ps[1:] != ps[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(ps)]))
        out = []
        for s, e in zip(starts, ends):
            p = int(ps[s])
            pdir = os.path.join(self.exchange_dir, f"part={p}")
            os.makedirs(pdir, exist_ok=True)
            name = f"run-{uuid.uuid4().hex}.arrow"
            tmp = os.path.join(pdir, f".{name}.tmp")
            sub = t.slice(s, e - s)
            with pa.OSFile(tmp, "wb") as f, pa.ipc.new_file(f, sub.schema) as w:
                w.write_table(sub)
            os.replace(tmp, os.path.join(pdir, name))
            out.append(p)
        return pa.table({"part": pa.array(out, pa.int32())})


class _Reducer:
    def __init__(self, exchange_dir: str,
                 reducer: Callable[[pa.Table], pa.Table]):
        self.exchange_dir = exchange_dir
        self.reducer = reducer

    def __call__(self, items: pa.Table) -> pa.Table:
        outs = []
        for p in items["part"].to_pylist():
            rows = _read_runs(os.path.join(self.exchange_dir, f"part={int(p)}"))
            outs.append(self.reducer(rows))
        return pa.concat_tables(outs, promote_options="default")


def hash_exchange(
    ds: ray.data.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    reducer: Callable[[pa.Table], pa.Table],
    *,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Hash-co-locate ``ds`` rows by ``key_fn`` and reduce each partition
    with one vectorized ``reducer`` call; returns the concatenated
    (small) reduction."""
    root = _exchange_root()
    os.makedirs(root, exist_ok=True)
    _sweep_stale_exchange(root)
    exchange_dir = os.path.join(root, f"hx-{uuid.uuid4().hex[:8]}")
    try:
        ds.map_batches(
            _Spiller(exchange_dir, num_parts, key_fn),
            batch_format="pyarrow",
        ).count()
        parts = sorted(
            int(d.split("=")[1])
            for d in (
                os.listdir(exchange_dir) if os.path.isdir(exchange_dir) else []
            )
        )
        if not parts:
            return pd.DataFrame()
        out = (
            ray.data.from_items(
                [{"part": p} for p in parts], override_num_blocks=len(parts)
            )
            .map_batches(
                _Reducer(exchange_dir, reducer),
                batch_format="pyarrow", batch_size=1,
            )
            .to_pandas()
        )
        return out
    finally:
        _trash_async(exchange_dir)
