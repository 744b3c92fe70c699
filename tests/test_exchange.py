"""hash_exchange: groupby-equivalence, partition completeness, empties."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ck_ray.exchange import hash_exchange, int_key_hash


def test_exchange_equals_groupby_sum(ray_session):
    rng = np.random.RandomState(3)
    n = 200_000
    keys = rng.randint(0, 5_000, n).astype(np.int64)
    vals = rng.randint(0, 100, n).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(16)

    def reduce_part(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["k"], use_threads=False).aggregate(
            [("v", "sum"), ("v", "count")]
        )
        return pa.table(
            {"k": g["k"], "s": g["v_sum"], "c": g["v_count"]}
        )

    out = hash_exchange(
        ds, key_fn=lambda t: int_key_hash(t["k"].to_numpy()),
        reducer=reduce_part, num_parts=8,
    ).sort_values("k").reset_index(drop=True)
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", as_index=False)
        .agg(s=("v", "sum"), c=("v", "count"))
    )
    # every key appears exactly once (co-location is complete)
    assert out["k"].tolist() == want["k"].tolist()
    assert out["s"].tolist() == want["s"].tolist()
    assert out["c"].tolist() == want["c"].tolist()


def test_exchange_empty_dataset(ray_session):
    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = hash_exchange(
        ds, key_fn=lambda t: int_key_hash(t["k"].to_numpy()),
        reducer=lambda rows: rows,
    )
    assert len(out) == 0


def _mk_sum_reducer():
    # defined via a factory so cloudpickle serializes the closure BY
    # VALUE — a module-level function in a test file pickles by
    # reference, which Ray workers cannot import
    def _sum_reducer(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["k"], use_threads=False).aggregate(
            [("v", "sum")]
        )
        return pa.table({"k": g["k"], "s": g["v_sum"]})

    return _sum_reducer


def _truth(keys, vals):
    import pandas as pd

    return (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k", as_index=False)
        .agg(s=("v", "sum"))
    )


def test_exchange_ignores_orphan_runs(ray_session):
    """A Ray-retried spill task leaves its failed attempt's run files
    behind; the reduce side must read ONLY manifested runs (ADVICE r2:
    no silent double-counting). Simulated by planting poison runs in the
    backend before the exchange runs."""
    from ck_ray.exchange import FsExchange

    rng = np.random.RandomState(7)
    n = 50_000
    keys = rng.randint(0, 1_000, n).astype(np.int64)
    vals = rng.randint(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(8)

    be = FsExchange(tag="orphan-test")
    # poison: a duplicate of the whole input, dropped into every partition
    poison = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    be.write_many([(p, poison) for p in range(8)])
    out = hash_exchange(
        ds, key_fn=lambda t: int_key_hash(t["k"].to_numpy()),
        reducer=_mk_sum_reducer(), num_parts=8, backend=be,
    ).sort_values("k").reset_index(drop=True)
    want = _truth(keys, vals)
    assert out["k"].tolist() == want["k"].tolist()
    assert out["s"].tolist() == want["s"].tolist()


def test_actor_exchange_disjoint_localities(ray_session, tmp_path):
    """The actor backend must produce the identical reduction with NO
    shared filesystem: each owner gets a disjoint private root
    (simulating one node's local disk) and rows reach it only via Ray
    RPC (VERDICT r2 #1)."""
    import os

    from ck_ray.exchange import ActorExchange

    rng = np.random.RandomState(11)
    n = 60_000
    keys = rng.randint(0, 2_000, n).astype(np.int64)
    vals = rng.randint(0, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(6)

    roots = [str(tmp_path / f"node-{i}") for i in range(3)]
    be = ActorExchange(3, roots=roots, keep_files=True)
    out = hash_exchange(
        ds, key_fn=lambda t: int_key_hash(t["k"].to_numpy()),
        reducer=_mk_sum_reducer(), num_parts=8, backend=be,
    ).sort_values("k").reset_index(drop=True)
    want = _truth(keys, vals)
    assert out["k"].tolist() == want["k"].tolist()
    assert out["s"].tolist() == want["s"].tolist()
    # locality evidence: every partition's bytes live in exactly ONE
    # owner's root, and only the partitions that owner owns (part % 3)
    seen = {}
    for i, r in enumerate(roots):
        for d in os.listdir(r) if os.path.isdir(r) else []:
            if d.startswith("part="):
                p = int(d.split("=")[1])
                assert p % 3 == i, f"part {p} stored on wrong owner {i}"
                assert p not in seen, f"part {p} stored on two owners"
                seen[p] = i
    assert seen, "no partitions were stored"


def test_actor_exchange_ignores_orphan_runs(ray_session):
    """Manifest-gated reads hold for the actor backend too."""
    import ray as _ray

    from ck_ray.exchange import ActorExchange, _ipc_bytes

    keys = np.arange(1_000, dtype=np.int64) % 37
    vals = np.ones(1_000, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    )
    be = ActorExchange(2)
    poison = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    _ray.get(
        [o.append.remote(p, _ipc_bytes(poison))
         for p in range(4) for o in [be.owner_of(p)]]
    )
    out = hash_exchange(
        ds, key_fn=lambda t: int_key_hash(t["k"].to_numpy()),
        reducer=_mk_sum_reducer(), num_parts=4, backend=be,
    ).sort_values("k").reset_index(drop=True)
    want = _truth(keys, vals)
    assert out["k"].tolist() == want["k"].tolist()
    assert out["s"].tolist() == want["s"].tolist()


def test_actor_exchange_owner_death_fails_loudly(ray_session):
    """A _PartOwner's state (accumulated spills) is not re-derivable, so
    owner death must surface as an error — never a silent empty/partial
    partition (the deliberate no-max_restarts contract in exchange.py)."""
    import ray as _ray

    from ck_ray.exchange import ActorExchange, _ipc_bytes

    be = ActorExchange(2)
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([1, 1], pa.int64())})
    runs = be.write_many([(0, t), (1, t)])
    _ray.kill(be.owner_of(0))
    runs_by_part = {}
    for p, name in runs:
        runs_by_part.setdefault(p, []).append(name)
    with pytest.raises(_ray.exceptions.RayActorError):
        be.reduce_all(runs_by_part, lambda tbl: tbl)
    be.cleanup()
