import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ck_ray import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert codec.decode_varints(codec.encode_varints(arr)).tolist() == vals


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    out = codec.decode_varints(codec.encode_varints(vals))
    assert out.tolist() == vals.tolist()


def _random_postings(rng, n):
    docs = np.sort(rng.choice(np.arange(1, 10 * n + 1, dtype=np.uint64), n, replace=False))
    tfs = rng.randint(1, 50, n).astype(np.uint32)
    dls = rng.randint(1, 5000, n).astype(np.uint32)
    return docs, tfs, dls


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000])
def test_posting_list_roundtrip(n):
    rng = np.random.RandomState(7)
    docs, tfs, dls = _random_postings(rng, n)
    blob, skips = codec.encode_posting_list(docs, tfs, dls)
    d2, t2, l2 = codec.decode_posting_list(blob)
    assert (d2 == docs).all() and (t2 == tfs).all() and (l2 == dls).all()
    sk = codec.decode_skips(skips)
    assert len(sk) == (n + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    assert sk["last_doc"][-1] == docs[-1]
    assert sk["end_byte"][-1] == len(blob)
    # block-max invariants
    for b in range(len(sk)):
        s, e = b * codec.BLOCK_SIZE, min((b + 1) * codec.BLOCK_SIZE, n)
        assert sk["max_tf"][b] == tfs[s:e].max()
        assert sk["min_dl"][b] == dls[s:e].min()


@pytest.mark.parametrize("n", [1, 129, 1000])
def test_partial_block_decode(n):
    rng = np.random.RandomState(11)
    docs, tfs, dls = _random_postings(rng, n)
    blob, skips = codec.encode_posting_list(docs, tfs, dls)
    nb = len(codec.decode_skips(skips))
    for seed in range(3):
        mask = np.random.RandomState(seed).rand(nb) < 0.5
        d2, t2, l2 = codec.decode_posting_blocks(blob, skips, mask)
        sel = np.zeros(n, dtype=bool)
        for b in np.nonzero(mask)[0]:
            sel[b * codec.BLOCK_SIZE : (b + 1) * codec.BLOCK_SIZE] = True
        assert (d2 == docs[sel]).all()
        assert (t2 == tfs[sel]).all()
        assert (l2 == dls[sel]).all()


def test_positions_roundtrip():
    rng = np.random.RandomState(3)
    lists = [np.sort(rng.choice(1000, rng.randint(1, 20), replace=False)) for _ in range(50)]
    lens = np.array([len(x) for x in lists])
    flat = np.concatenate(lists)
    blob = codec.encode_positions(flat, lens)
    out, starts = codec.decode_positions(blob, lens)
    assert (out == flat).all()
    assert starts.tolist() == np.concatenate(([0], np.cumsum(lens)[:-1])).tolist()


def test_positions_empty():
    assert codec.encode_positions(np.array([]), np.array([])) == b""


def test_encode_partition_matches_per_term():
    rng = np.random.RandomState(5)
    # build 40 terms with varying posting counts incl. multi-block
    starts, ends, docs_l, tfs_l, dls_l, pos_l, lens_l = [], [], [], [], [], [], []
    cursor = 0
    for t in range(40):
        n = int(rng.randint(1, 400))
        d = np.sort(rng.choice(np.arange(1, 10000, dtype=np.uint64), n, replace=False))
        f = rng.randint(1, 9, n).astype(np.uint32)
        l = rng.randint(1, 900, n).astype(np.uint32)
        starts.append(cursor); ends.append(cursor + n); cursor += n
        docs_l.append(d); tfs_l.append(f); dls_l.append(l)
        for tf in f:
            pos_l.append(np.sort(rng.choice(5000, tf, replace=False)))
            lens_l.append(tf)
    docs = np.concatenate(docs_l); tfs = np.concatenate(tfs_l); dls = np.concatenate(dls_l)
    starts = np.array(starts); ends = np.array(ends)
    flat = np.concatenate(pos_l)
    offs = np.concatenate(([0], np.cumsum(lens_l))).astype(np.int64)
    pb, sb, zb = codec.encode_partition(docs, tfs, dls, starts, ends, flat, offs)
    for t in range(40):
        s, e = starts[t], ends[t]
        blob, skips = codec.encode_posting_list(docs[s:e], tfs[s:e], dls[s:e])
        assert pb[t] == blob, f"term {t} postings differ"
        assert sb[t] == skips, f"term {t} skips differ"
        pz = codec.encode_positions(flat[offs[s]:offs[e]], tfs[s:e])
        assert zb[t] == pz, f"term {t} positions differ"
