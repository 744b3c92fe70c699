"""Range-partitioned global sort (TeraSort shape) over the exchange.

Ray's built-in ``Dataset.sort`` was measured serializing on this host
(BASELINE.md); this module implements the classic two-pass sampled-range
sort instead, on top of the same retry-safe exchange the build and the
join family use:

1. **Sample pass** — a cheap deterministic key-column scan (every row
   whose mixed tiebreak hash lands in a 1/``sample_mod`` stripe) feeds
   driver-side splitter selection. Only the key column leaves storage.
2. **Range exchange** — partition id is ``searchsorted(splitters, key)``
   (side='right', so ALL rows with an equal primary key co-locate — the
   property that makes per-partition sorts concatenate into a global
   order). The exchange's manifest-gated spill/reduce machinery is reused
   verbatim; the "hash" function simply returns partition ids.
3. **Partition reduce** — one vectorized ``lexsort`` per partition, then
   an atomic parquet write to ``out_dir/part=p/data.parquet`` (temp +
   rename, deterministic name: a Ray retry overwrites instead of
   duplicating). The reducer RETURNS only a summary row (part, n_rows,
   min/max key) — sorted data goes to storage, never to the driver.

The output is resumable, partitioned parquet whose partition ranges are
provably disjoint (asserted on the summary), i.e. reading ``part=0..P``
in order IS the globally sorted table. ``sorted_rank_sample`` then
proves the order end-to-end: it re-opens each partition by path
(prune-at-read) and emits the rows at global ranks ≡ 0 (mod step) —
a result small enough to hash against a ``row_number() OVER (ORDER BY)``
SQL oracle, yet sensitive to any misplaced row anywhere in the file set.

Reference anchor: sorts/limits are SURVEY §2.6; the reference engine
sorts only result lists (ck-engine/src/lib.rs top-k paths) — a full
distributed table sort is part of the beyond-reference training-data
surface (sorted corpus layout for sequential scans).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from .exchange import _Spiller, int_key_hash, make_backend


def _select_splitters(sample: np.ndarray, num_parts: int) -> np.ndarray:
    """Evenly spaced order statistics of the sampled keys."""
    if len(sample) == 0 or num_parts <= 1:
        return np.empty(0, np.int64)
    s = np.sort(sample)
    idx = (np.arange(1, num_parts) * len(s)) // num_parts
    return s[np.minimum(idx, len(s) - 1)].astype(np.int64)


def range_sort_write(
    ds: ray.data.Dataset,
    key_fn: Callable[[pa.Table], tuple[np.ndarray, np.ndarray]],
    out_dir: str,
    *,
    num_parts: int = 32,
    sample_mod: int = 64,
    backend=None,
) -> pd.DataFrame:
    """Globally sort ``ds`` by ``key_fn`` = (key, tiebreak) int64 columns
    and write one sorted parquet per key range under ``out_dir``.

    Returns the per-partition summary (part, n_rows, min_key, max_key,
    path, offset) ordered by part; ``offset`` is the number of rows in
    all preceding partitions, so ``offset + local_index + 1`` is a row's
    global 1-based rank. Raises if partition ranges overlap (they cannot,
    by construction — the assert documents the invariant).

    Contract: ``out_dir`` is the pipeline's SINK and must be visible to
    every worker (shared fs / object-store mount) — the same contract as
    ``Dataset.write_parquet`` to a local path. The exchange backend only
    covers the shuffle scratch; reducers write their sorted partition to
    ``out_dir`` directly, and ``sorted_rank_sample`` re-opens those files
    from other tasks. On this single-node sandbox any /tmp path works."""

    def sample_batch(t: pa.Table) -> pa.Table:
        key, tie = key_fn(t)
        keep = int_key_hash(tie) % np.uint64(sample_mod) == 0
        return pa.table({"key": pa.array(key[keep], pa.int64())})

    sample = ds.map_batches(sample_batch, batch_format="pyarrow").to_pandas()
    splitters = _select_splitters(
        sample["key"].to_numpy() if "key" in sample.columns else
        np.empty(0, np.int64),
        num_parts,
    )

    def part_fn(t: pa.Table) -> np.ndarray:
        key, _ = key_fn(t)
        # partition ids returned where the exchange expects hashes; the
        # modulo in the spiller is identity because ids < num_parts
        return np.searchsorted(splitters, key, side="right").astype(
            np.uint64
        )

    os.makedirs(out_dir, exist_ok=True)

    def reduce_part(rows: pa.Table) -> pa.Table:
        key, tie = key_fn(rows)
        order = np.lexsort((tie, key))
        rows = rows.take(pa.array(order, type=pa.int64()))
        part = int(np.searchsorted(splitters, key[order[0]], side="right"))
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".data.parquet.tmp-{uuid.uuid4().hex[:6]}")
        pq.write_table(rows, tmp)
        final = os.path.join(pdir, "data.parquet")
        os.replace(tmp, final)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n_rows": pa.array([rows.num_rows], pa.int64()),
                "min_key": pa.array([int(key[order[0]])], pa.int64()),
                "max_key": pa.array([int(key[order[-1]])], pa.int64()),
                "path": pa.array([final], pa.string()),
            }
        )

    be = backend if backend is not None else make_backend()
    try:
        man = ds.map_batches(
            _Spiller(be, max(num_parts, len(splitters) + 1), part_fn),
            batch_format="pyarrow",
        ).to_pandas()
        if man.empty:
            return pd.DataFrame(
                columns=["part", "n_rows", "min_key", "max_key", "path",
                         "offset"]
            )
        runs_by_part = {
            int(p): g["run"].tolist() for p, g in man.groupby("part")
        }
        summary = be.reduce_all(runs_by_part, reduce_part)
    finally:
        be.cleanup()

    summary = summary.sort_values("part").reset_index(drop=True)
    # disjointness: a row with key k can only land in the one partition
    # searchsorted assigns, so consecutive ranges never interleave
    mins = summary["min_key"].to_numpy()
    maxs = summary["max_key"].to_numpy()
    if len(summary) > 1:
        # strict: equal keys co-locate (side='right'), so even the
        # boundary key appears in exactly one partition
        assert (maxs[:-1] < mins[1:]).all(), "range partitions overlap"
    summary["offset"] = np.concatenate(
        ([0], np.cumsum(summary["n_rows"].to_numpy())[:-1])
    ).astype(np.int64)
    with open(os.path.join(out_dir, "_sort_summary.json"), "w") as f:
        json.dump(summary.drop(columns=["path"]).to_dict("list"), f)
    return summary


def sorted_rank_sample(
    summary: pd.DataFrame,
    *,
    target_rows: int = 200,
) -> tuple[pd.DataFrame, int]:
    """Proof-of-global-order: rows whose global rank ≡ 0 (mod step),
    step = max(1, total // target_rows). One distributed task per
    partition re-opens ONLY its file (prune-at-read by path) and selects
    by local index + offset — nothing but the sampled rows move."""
    total = int(summary["n_rows"].sum()) if len(summary) else 0
    step = max(1, total // target_rows)
    if total == 0:
        return pd.DataFrame(), step

    items = summary[["path", "offset"]].to_dict("records")

    def pick(b: pa.Table) -> pa.Table:
        outs = []
        for row in b.to_pylist():
            t = pq.read_table(row["path"])
            rn = np.arange(1, t.num_rows + 1) + int(row["offset"])
            sel = np.nonzero(rn % step == 0)[0]
            sub = t.take(pa.array(sel, type=pa.int64()))
            sub = sub.append_column(
                "rn", pa.array(rn[sel].astype(np.int64))
            )
            outs.append(sub)
        return pa.concat_tables(outs, promote_options="default")

    out = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(pick, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return out, step


def orders_sorted_ranks(sf_dir: str, target_rows: int = 200) -> pd.DataFrame:
    """Driver entry: globally sort orders by (total price in cents,
    orderkey) via the sampled-range sort, write the sorted partitioned
    parquet, then return the rank-stride sample that proves the order.
    Oracle: ``row_number() OVER (ORDER BY price_c, o_orderkey)``."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )

    def to_keyed(t: pa.Table) -> pa.Table:
        price_c = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "price_c": pa.array(price_c),
            }
        )

    keyed = ds.map_batches(to_keyed, batch_format="pyarrow")

    def key_fn(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return (
            t["price_c"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    out_dir = os.path.join(
        "/tmp/ck_ray_sorted",
        os.path.abspath(sf_dir).strip("/").replace("/", "_"),
        f"orders-{uuid.uuid4().hex[:8]}",
    )
    summary = range_sort_write(keyed, key_fn, out_dir, num_parts=16)
    out, _step = sorted_rank_sample(summary, target_rows=target_rows)
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    if len(out) == 0:
        return pd.DataFrame(
            {
                "rn": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64"),
                "price_c": pd.Series([], dtype="int64"),
            }
        )
    out = out[["rn", "o_orderkey", "price_c"]].astype("int64")
    return out.sort_values("rn").reset_index(drop=True)
