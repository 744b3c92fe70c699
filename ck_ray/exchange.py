"""Generic hash-partitioned exchange with pluggable transport backends.

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
rows of its partition at once.

Retry safety: every spill task emits one MANIFEST row ``(part, run)``
per run it wrote, and the reduce side reads EXACTLY the manifested runs.
If Ray retries a spill task after a partial write (worker crash / OOM),
the failed attempt's output rows are discarded by Ray, so its orphan
runs are never listed — and therefore never read. No directory globbing,
no double counting; orphans are deleted with the exchange.

Backends (``CK_EXCHANGE_BACKEND`` env, or pass ``backend=``):

- ``FsExchange`` (default): run files on a filesystem both sides can
  see — ``/dev/shm`` on a single node; shared scratch / NVMe-oF on a
  cluster that has one. Root pluggable via ``CK_EXCHANGE_ROOT`` or the
  constructor. The fastest path when such a tier exists.
- ``ActorExchange``: P partition-owner actors (SPREAD-scheduled across
  the cluster); spill rows travel through Ray RPC to their partition's
  owner, which stores them on ITS OWN local disk, and the reduction runs
  ON the owner. No path is ever shared between processes, so this is the
  multi-node-correct choice when the cluster has no shared scratch tier.
  Partition affinity falls out of ownership: a partition's bytes land
  once on one node and are reduced there — the "pin part=p spills and
  the part-p reducer to one node" design, expressed as actors instead of
  scheduling hints.

Contract: the reducer's OUTPUT must be the reduced (small) side — it is
collected into one pandas result.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

def _trash_async(path: str) -> None:
    """Rename ``path`` to a .trash sibling (O(1)) and delete it on a
    daemon thread; leftovers are removed by ``_sweep_stale_exchange``."""
    if not os.path.exists(path):
        return
    import shutil
    import threading

    trash = f"{path}.trash-{uuid.uuid4().hex[:6]}"
    try:
        os.rename(path, trash)
    except OSError:
        trash = path
    threading.Thread(
        target=shutil.rmtree, args=(trash,), kwargs={"ignore_errors": True},
        daemon=True,
    ).start()


def _sweep_stale_exchange(ex_root: str, max_age_sec: float = 6 * 3600) -> None:
    """Remove exchange/trash dirs from crashed or earlier builds."""
    import shutil
    import time

    now = time.time()
    try:
        entries = os.listdir(ex_root)
    except OSError:
        return
    for d in entries:
        p = os.path.join(ex_root, d)
        try:
            if ".trash-" in d or now - os.path.getmtime(p) > max_age_sec:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass


def _default_root() -> str:
    env = os.environ.get("CK_EXCHANGE_ROOT")
    if env:
        return env
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


def _ipc_bytes(t: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def _write_run_file(pdir: str, name: str, t: pa.Table) -> None:
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, f".{name}.tmp-{uuid.uuid4().hex[:6]}")
    with pa.OSFile(tmp, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
        w.write_table(t)
    os.replace(tmp, os.path.join(pdir, name))


def _read_run_files(pdir: str, runs: list[str] | None) -> pa.Table:
    """Concat the named run files (or, when ``runs`` is None, every
    ``.arrow`` present — valid ONLY for deterministically-named runs,
    where a retry overwrites instead of duplicating)."""
    if runs is None:
        runs = sorted(
            f for f in os.listdir(pdir) if f.endswith(".arrow")
        ) if os.path.isdir(pdir) else []
    tables = []
    for f in sorted(runs):
        with pa.memory_map(os.path.join(pdir, f)) as m:
            tables.append(pa.ipc.open_file(m).read_all())
    return pa.concat_tables(tables, promote_options="default")


class FsExchange:
    """Run files on a filesystem visible to spillers and reducers."""

    def __init__(self, root: str | None = None, tag: str | None = None):
        self.root = root or _default_root()
        os.makedirs(self.root, exist_ok=True)
        _sweep_stale_exchange(self.root)
        self.dir = os.path.join(self.root, f"hx-{tag or uuid.uuid4().hex[:8]}")

    def _pdir(self, part: int) -> str:
        return os.path.join(self.dir, f"part={int(part)}")

    def write_many(
        self, parts_tables: list[tuple[int, pa.Table]],
        names: list[str] | None = None,
    ) -> list[tuple[int, str]]:
        out = []
        for i, (p, t) in enumerate(parts_tables):
            name = (
                names[i] if names is not None
                else f"run-{uuid.uuid4().hex}.arrow"
            )
            _write_run_file(self._pdir(p), name, t)
            out.append((int(p), name))
        return out

    def read_runs(self, part: int, runs: list[str] | None = None) -> pa.Table:
        return _read_run_files(self._pdir(part), runs)

    def reduce_all(
        self,
        runs_by_part: dict[int, list[str]],
        reducer: Callable[[pa.Table], pa.Table],
    ) -> pd.DataFrame:
        items = [
            {"part": p, "runs": rs} for p, rs in sorted(runs_by_part.items())
        ]
        backend = self

        def _reduce(batch: pa.Table) -> pa.Table:
            outs = []
            for row in batch.to_pylist():
                rows = backend.read_runs(int(row["part"]), row["runs"])
                outs.append(reducer(rows))
            return pa.concat_tables(outs, promote_options="default")

        return (
            ray.data.from_items(items, override_num_blocks=len(items))
            .map_batches(_reduce, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )

    def cleanup(self) -> None:
        _trash_async(self.dir)


@ray.remote(num_cpus=0)
class _PartOwner:
    """Owns a subset of partitions: receives their spilled rows over Ray
    RPC, stores them on node-local disk, and reduces them in place. The
    num_cpus=0 reservation keeps owner creation deadlock-free alongside
    Ray Data stages; reduce work is bursty and OS-scheduled.

    Failure semantics (deliberate): NO max_restarts. An owner's state is
    accumulated spills, not re-derivable from anywhere — a respawned
    owner would silently serve an empty partition. Owner death must fail
    the exchange loudly (RayActorError) and the JOB retries, exactly how
    shuffle systems treat a lost shuffle node (contrast DocShard in
    query.py, which is read-only-from-disk and so restarts freely)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _pdir(self, part: int) -> str:
        return os.path.join(self.root, f"part={int(part)}")

    def append(self, part: int, payload: bytes, name: str | None = None) -> str:
        name = name or f"run-{uuid.uuid4().hex}.arrow"
        with pa.BufferReader(payload) as r:
            t = pa.ipc.open_file(r).read_all()
        _write_run_file(self._pdir(part), name, t)
        return name

    def read(self, part: int, runs: list[str] | None = None) -> pa.Table:
        return _read_run_files(self._pdir(part), runs)

    def reduce(
        self, part: int, runs: list[str] | None,
        reducer: Callable[[pa.Table], pa.Table],
    ) -> pa.Table:
        return reducer(_read_run_files(self._pdir(part), runs))

    def stored_parts(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(self.root)
            if d.startswith("part=")
        )

    def destroy(self, remove_files: bool = True) -> None:
        if remove_files:
            import shutil

            shutil.rmtree(self.root, ignore_errors=True)


class ActorExchange:
    """Shared-nothing exchange: partition data moves over Ray RPC to its
    owner actor's local disk; reducers run on the owner. ``roots`` pins
    each owner to an explicit directory (tests use disjoint dirs to
    simulate disjoint node-local disks)."""

    def __init__(
        self,
        num_owners: int = 4,
        roots: list[str] | None = None,
        keep_files: bool = False,
    ):
        if roots is None:
            import tempfile

            base = os.path.join(
                tempfile.gettempdir(), f"ck_ray_aex-{uuid.uuid4().hex[:8]}"
            )
            roots = [os.path.join(base, f"owner-{i}") for i in range(num_owners)]
        self.roots = roots
        self.keep_files = keep_files
        self.owners = [
            _PartOwner.options(scheduling_strategy="SPREAD").remote(r)
            for r in roots
        ]

    def owner_of(self, part: int):
        return self.owners[int(part) % len(self.owners)]

    def write_many(
        self, parts_tables: list[tuple[int, pa.Table]],
        names: list[str] | None = None,
    ) -> list[tuple[int, str]]:
        refs = [
            self.owner_of(p).append.remote(
                int(p), _ipc_bytes(t),
                names[i] if names is not None else None,
            )
            for i, (p, t) in enumerate(parts_tables)
        ]
        got = ray.get(refs)
        return [(int(p), name) for (p, _), name in zip(parts_tables, got)]

    def read_runs(self, part: int, runs: list[str] | None = None) -> pa.Table:
        return ray.get(self.owner_of(part).read.remote(int(part), runs))

    def reduce_all(
        self,
        runs_by_part: dict[int, list[str]],
        reducer: Callable[[pa.Table], pa.Table],
    ) -> pd.DataFrame:
        refs = [
            self.owner_of(p).reduce.remote(int(p), rs, reducer)
            for p, rs in sorted(runs_by_part.items())
        ]
        tables = ray.get(refs)
        if not tables:
            return pd.DataFrame()
        return pa.concat_tables(
            tables, promote_options="default"
        ).to_pandas()

    def cleanup(self) -> None:
        try:
            ray.get(
                [o.destroy.remote(not self.keep_files) for o in self.owners]
            )
        except Exception:
            pass
        for o in self.owners:
            ray.kill(o)
        self.owners = []


def make_backend(kind: str | None = None, **kw):
    kind = kind or os.environ.get("CK_EXCHANGE_BACKEND", "fs")
    if kind == "fs":
        return FsExchange(**kw)
    if kind == "actor":
        return ActorExchange(**kw)
    raise ValueError(f"unknown exchange backend {kind!r}")


def spill_partitioned(
    t: pa.Table,
    part: np.ndarray,
    backend,
    *,
    skip_parts: frozenset[int] = frozenset(),
    drop_part_col: bool = False,
) -> list[tuple[int, str]]:
    """Sort a batch by partition, slice contiguous per-partition runs and
    hand them to the backend in one call; returns the (part, run)
    manifest entries. Vectorized slicing — one sort + one boundary scan."""
    if t.num_rows == 0:
        return []
    order = np.argsort(part, kind="stable")
    t = t.take(pa.array(order, type=pa.int64()))
    ps = part[order]
    starts = np.nonzero(np.concatenate(([True], ps[1:] != ps[:-1])))[0]
    ends = np.concatenate((starts[1:], [len(ps)]))
    pairs = []
    for s, e in zip(starts, ends):
        p = int(ps[s])
        if p in skip_parts:
            continue
        sub = t.slice(s, e - s)
        if drop_part_col and "part" in sub.column_names:
            sub = sub.drop_columns(["part"])
        pairs.append((p, sub))
    return backend.write_many(pairs)


class _Spiller:
    """Map task: spill a batch's rows per-partition via the backend and
    return the (part, run) manifest rows."""

    def __init__(self, backend, num_parts: int,
                 key_fn: Callable[[pa.Table], np.ndarray]):
        self.backend = backend
        self.num_parts = num_parts
        self.key_fn = key_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "run": pa.array([], pa.string())}
            )
        part = (self.key_fn(t) % np.uint64(self.num_parts)).astype(np.int64)
        man = spill_partitioned(t, part, self.backend)
        return pa.table(
            {
                "part": pa.array([p for p, _ in man], pa.int32()),
                "run": pa.array([r for _, r in man], pa.string()),
            }
        )


def hash_exchange(
    ds: ray.data.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    reducer: Callable[[pa.Table], pa.Table],
    *,
    num_parts: int = 32,
    backend=None,
) -> pd.DataFrame:
    """Hash-co-locate ``ds`` rows by ``key_fn`` and reduce each partition
    with one vectorized ``reducer`` call; returns the concatenated
    (small) reduction. ``backend`` defaults to ``CK_EXCHANGE_BACKEND``
    (fs run files; "actor" for shared-nothing clusters)."""
    be = backend if backend is not None else make_backend()
    try:
        man = (
            ds.map_batches(
                _Spiller(be, num_parts, key_fn), batch_format="pyarrow"
            )
            .to_pandas()
        )
        if man.empty:
            return pd.DataFrame()
        runs_by_part = {
            int(p): g["run"].tolist() for p, g in man.groupby("part")
        }
        return be.reduce_all(runs_by_part, reducer)
    finally:
        be.cleanup()
