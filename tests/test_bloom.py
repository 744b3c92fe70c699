"""Bloom filter: no false negatives, bounded false positives,
associative OR, distributed build identity, and q3's bloom-pruned
semi-join staying exact."""

import numpy as np
import pyarrow as pa
import pytest

from ck_ray.bloom import Bloom, bloom_from_dataset, log2_bits_for


def test_no_false_negatives():
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 2**62, size=5000).astype(np.int64)
    b = Bloom(log2_bits_for(len(keys)))
    b.add(keys)
    assert b.contains(keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.RandomState(8)
    keys = rng.randint(0, 2**31, size=20_000).astype(np.int64)
    b = Bloom(log2_bits_for(len(keys), bits_per_key=16))
    b.add(keys)
    # probe keys from a disjoint range
    probe = rng.randint(2**32, 2**33, size=50_000).astype(np.int64)
    fpp = b.contains(probe).mean()
    assert fpp < 0.01, fpp


def test_or_merge_equals_joint_build():
    rng = np.random.RandomState(9)
    a = rng.randint(0, 2**40, size=3000).astype(np.int64)
    c = rng.randint(0, 2**40, size=3000).astype(np.int64)
    lg = log2_bits_for(6000)
    ba, bc, joint = Bloom(lg), Bloom(lg), Bloom(lg)
    ba.add(a)
    bc.add(c)
    joint.add(np.concatenate([a, c]))
    assert (ba.or_(bc).words == joint.words).all()


def test_bytes_round_trip():
    b = Bloom(12, 4)
    b.add(np.arange(100, dtype=np.int64))
    b2 = Bloom.from_bytes(12, 4, b.to_bytes())
    assert (b2.words == b.words).all()
    assert b2.contains(np.arange(100, dtype=np.int64)).all()


def test_shape_mismatch_rejected():
    with pytest.raises(ValueError):
        Bloom(10).or_(Bloom(11))
    with pytest.raises(ValueError):
        Bloom(10, words=np.zeros(3, np.uint64))


def test_empty_add_and_contains():
    b = Bloom(10)
    b.add(np.array([], dtype=np.int64))
    assert b.contains(np.array([], dtype=np.int64)).shape == (0,)
    assert not b.contains(np.array([1, 2, 3], dtype=np.int64)).any()


def test_distributed_build_matches_local(ray_session):
    import ray.data

    keys = np.arange(0, 40_000, dtype=np.int64) * 7919
    lg = log2_bits_for(len(keys))
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    ds = ds.repartition(8)
    dist = bloom_from_dataset(ds, lambda t: t["k"].to_numpy(), lg)
    local = Bloom(lg)
    local.add(keys)
    assert (dist.words == local.words).all()


def test_q3_bloom_prune_is_exact(ray_session, tmp_path):
    """q3 with the bloom prune in the plan must equal a brute-force
    pandas evaluation of the same join on a corner-case input where
    most lineitem orderkeys are NOT in the filtered orders side."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ck_ray.pipelines.relational import q3_top_revenue_orders

    rng = np.random.RandomState(3)
    n_ord, n_li = 400, 3000
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(50, dtype=np.int64),
            "c_mktsegment": [
                "BUILDING" if i % 5 == 0 else "AUTOMOBILE" for i in range(50)
            ],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.randint(0, 50, n_ord).astype(np.int64),
            "o_orderdate": pd.to_datetime("1995-01-01")
            + pd.to_timedelta(rng.randint(0, 200, n_ord), unit="D"),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.randint(0, n_ord, n_li).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
            "l_shipdate": pd.to_datetime("1995-01-01")
            + pd.to_timedelta(rng.randint(0, 200, n_li), unit="D"),
        }
    )
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(cust), f"{sf}/customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), f"{sf}/orders.parquet")
    pq.write_table(pa.Table.from_pandas(li), f"{sf}/lineitem.parquet")

    got = q3_top_revenue_orders(sf)

    cutoff = pd.Timestamp("1995-03-15")
    bkeys = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
    okeys = set(
        orders[(orders.o_orderdate < cutoff) & orders.o_custkey.isin(bkeys)]
        .o_orderkey
    )
    lif = li[(li.l_shipdate > cutoff) & li.l_orderkey.isin(okeys)].copy()
    lif["rev"] = (
        np.round(lif.l_extendedprice * 100).astype(np.int64)
        * (100 - np.round(lif.l_discount * 100).astype(np.int64))
    )
    want = (
        lif.groupby("l_orderkey", as_index=False)["rev"].sum()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert list(got["revenue_e4"]) == list(want["rev"])
