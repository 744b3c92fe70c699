"""hash_exchange: groupby-equivalence, partition completeness, empties."""

import numpy as np
import pyarrow as pa
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
