"""Deduplication operators for training-data pipelines.

Scale shapes:

- **exact**: sha256(text) in a vectorized map -> ``groupby(hash)`` keeps
  the min doc_id per group (hash-partitioned; only the 64-hex key + id
  shuffles, never the text).
- **minhash-LSH**: per-batch shingle->minhash signatures (vectorized
  numpy), banded into (band, band_hash, doc_id) rows -> groupby on the
  band bucket -> candidate pairs -> exact Jaccard verify. Only signatures
  shuffle (n_docs x n_perm x 8 bytes), not documents.
- **simhash**: 64-bit weighted-projection fingerprint per doc; buckets on
  the 4 x 16-bit bands (any near pair within Hamming distance <= 3 shares
  a band) -> verify Hamming distance.
- **ngram-jaccard**: direct pairwise verify inside candidate buckets only.
- **embedding near-dup**: cosine >= threshold among LSH-bucketed
  (random-hyperplane) embedding rows.

All stages are ``map_batches`` over Arrow batches; candidate verification
joins back to text via a broadcast of only the candidate doc texts.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..ids import term_hash
from ..tokenizer import tokenize_array

# ------------------------------------------------------------------- exact


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """(keeper_doc_id, n_copies) per distinct text (keeper = min doc_id)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def hash_batch(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(x.encode()).hexdigest() for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(hs, pa.string())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "keeper_doc_id": [int(g["doc_id"].min())],
                "n_copies": [len(g)],
            }
        )

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .to_pandas()
    )
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values("keeper_doc_id").reset_index(drop=True)


# ------------------------------------------------------------ minhash utils

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, n_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, n_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(t: pa.Table, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per batch: (row_starts, shingle token-ngram hashes) vectorized."""
    tb = tokenize_array(t["text"])
    n = t.num_rows
    th = term_hash(tb.term, np.zeros(len(tb.row_index), dtype=np.int64))
    counts = np.bincount(tb.row_index, minlength=n)
    starts = np.concatenate(([0], np.cumsum(counts)))
    # k-gram rolling combine within each doc: windows crossing doc
    # boundaries are masked out afterwards
    m = len(th)
    if m == 0:
        return np.zeros(n + 1, np.int64), np.empty(0, np.uint64)
    valid_len = np.maximum(counts - k + 1, 0).astype(np.int64)
    sh_starts = np.concatenate(([0], np.cumsum(valid_len)))
    total = int(sh_starts[-1])
    if total == 0:
        return sh_starts, np.empty(0, np.uint64)
    # base token index of every window across all docs (ragged, no loop)
    win_ord = np.arange(total) - np.repeat(sh_starts[:-1], valid_len)
    base = np.repeat(starts[:-1], valid_len) + win_ord
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(k):  # k is small (5); each pass fully vectorized
        acc = acc * np.uint64(1099511628211) + th[base + j]
    return sh_starts, acc


class MinHasher:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, n_perm: int = 64, k: int = 5, seed: int = 42):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        starts, sh = _shingle_hashes(t, self.k)
        n = t.num_rows
        sigs = np.full((n, self.n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(sh):
            # (all_shingles x n_perm) universal hash in one pass, then a
            # segmented min per doc (reduceat) — no per-doc Python loop
            hv = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
            nonempty = np.diff(starts) > 0
            seg_starts = starts[:-1][nonempty]
            mins = np.minimum.reduceat(hv, seg_starts, axis=0)
            sigs[nonempty] = mins
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sig": pa.array(list(sigs), pa.list_(pa.uint64(), self.n_perm)),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.6,
) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= thr.
    """
    assert n_perm % bands == 0
    rows_per_band = n_perm // bands
    docs_path = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"n_perm": n_perm, "k": k},
    )

    def to_bands(t: pa.Table) -> pa.Table:
        sig = np.stack(
            [np.asarray(x, dtype=np.uint64) for x in t["sig"].to_pylist()]
        )
        n = len(sig)
        out_doc, out_band, out_bh = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            bh = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                bh = bh * np.uint64(1099511628211) + chunk[:, j]
            out_doc.append(t["doc_id"].to_numpy())
            out_band.append(np.full(n, b, dtype=np.int32))
            out_bh.append(bh)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "band_hash": pa.array(
                    np.concatenate(out_bh).astype(np.int64)
                    & np.int64(0x7FFF_FFFF_FFFF_FFFF)
                ),
                "doc_id": pa.array(np.concatenate(out_doc)),
            }
        )

    banded = sigs.map_batches(to_bands, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one group per BAND (coarse; a per-(band,hash) groupby costs one
        # Python call per bucket — millions of tiny calls); buckets are
        # resolved vectorized inside. At larger scale, raise `bands` /
        # pre-salt band ids so a band still fits one task.
        g = g.sort_values(["band_hash", "doc_id"])
        h = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        starts = np.nonzero(np.concatenate(([True], h[1:] != h[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(h)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            bucket = np.unique(ids[s:e])
            if len(bucket) < 2:
                continue
            ai, bi = np.triu_indices(len(bucket), 1)
            out_a.append(bucket[ai])
            out_b.append(bucket[bi])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    cand = (
        banded.groupby("band")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand = cand.drop_duplicates().astype({"doc_a": "int64", "doc_b": "int64"})
    # exact-verify candidates: shingle sets of only the involved docs
    import pyarrow.dataset as pads

    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    sub = (
        pads.dataset(docs_path)
        .to_table(columns=["doc_id", "text"], filter=pc.field("doc_id").isin(need))
    )
    starts, sh = _shingle_hashes(sub, k)
    sets = {
        int(d): set(sh[starts[i] : starts[i + 1]].tolist())
        for i, d in enumerate(sub["doc_id"].to_pylist())
    }
    jac = []
    for a_, b_ in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sets.get(int(a_), set()), sets.get(int(b_), set())
        u = len(sa | sb)
        jac.append(len(sa & sb) / u if u else 0.0)
    cand["jaccard"] = np.round(jac, 4)
    out = cand[cand["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Near-dup pairs by exact token n-gram Jaccard.

    Scale shape: candidates come from permissive MinHash-LSH banding
    (recall-oriented: 32 bands of 2 rows), then EXACT n-gram Jaccard is
    computed only inside candidate buckets — all-pairs never happens."""
    return minhash_lsh_pairs(
        sf_dir, n_perm=64, bands=32, k=n, jaccard_threshold=threshold
    )


def near_dup_groups(
    sf_dir: str, jaccard_threshold: float = 0.6, **kw
) -> pd.DataFrame:
    """Connected components over the verified MinHash-LSH pair graph:
    (doc_id, group_keeper) for every doc in a near-dup cluster, keeper =
    min doc_id of the component.

    Components run union-find on the driver — the verified pair set is
    tiny relative to the corpus (pairs above threshold). At web scale with
    a large pair set this becomes a few rounds of min-label propagation
    (groupby-min per round); the keeper semantics are identical."""
    pairs = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_threshold, **kw)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(members, dtype="int64"),
            "group_keeper": pd.Series([find(m) for m in members], dtype="int64"),
        }
    )
    return out.sort_values(["group_keeper", "doc_id"]).reset_index(drop=True)


# ----------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash per doc; actor-pool stage (projection-free variant:
    bit votes from token hashes weighted by tf)."""

    def __init__(self):
        self.bit = np.uint64(1)

    def __call__(self, t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = t.num_rows
        th = term_hash(tb.term, np.zeros(len(tb.row_index), dtype=np.int64))
        fps = np.zeros(n, dtype=np.uint64)
        votes = np.zeros((n, 64), dtype=np.int64)
        rows = tb.row_index
        for b in range(64):
            bitset = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            votes[:, b] = np.bincount(rows, weights=2 * bitset - 1, minlength=n)
        for b in range(64):
            fps |= (votes[:, b] > 0).astype(np.uint64) << np.uint64(b)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(
                    (fps & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
                ),
            }
        )


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, via 4-band
    16-bit bucketing (a <=3-bit-different pair shares >=1 exact band)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    fps = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=2)

    def to_bands(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy().astype(np.uint64)
        out = []
        for b in range(4):
            band_val = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(h), b, np.int32)),
                        "band_val": pa.array(band_val.astype(np.int64)),
                        "doc_id": t["doc_id"],
                        "simhash": t["simhash"],
                    }
                )
            )
        return pa.concat_tables(out)

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # coarse per-band group; exact-value buckets resolved vectorized
        g = g.sort_values(["band_val", "doc_id"])
        v = g["band_val"].to_numpy()
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        starts = np.nonzero(np.concatenate(([True], v[1:] != v[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(v)]))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ai, bi = np.triu_indices(e - s, 1)
            x = hs[s:e][ai] ^ hs[s:e][bi]
            ham = np.array([bin(int(y)).count("1") for y in x])
            keep = ham <= max_hamming
            out_a.append(ids[s:e][ai][keep])
            out_b.append(ids[s:e][bi][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_h)}
        )

    out = (
        fps.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    out = (
        out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
        .drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
    )
    return out.reset_index(drop=True)


# ------------------------------------------------------- embedding near-dup


def embedding_near_dups(
    sf_dir: str, threshold: float = 0.95, n_planes: int = 8, seed: int = 42
) -> pd.DataFrame:
    """Cosine near-duplicates among embeddings, LSH-bucketed by
    random-hyperplane signs (scale path: pairwise only within buckets)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes)
    planes_ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        P = ray.get(planes_ref)
        emb = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
        signs = (emb @ P) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        norm = np.linalg.norm(emb, axis=1)
        unit = emb / np.maximum(norm, 1e-12)[:, None]
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "vec_id": t["vec_id"],
                "unit": pa.array(list(unit), pa.list_(pa.float64(), dim)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ids = g["vec_id"].to_numpy()
        U = np.stack(g["unit"].to_numpy())
        sims = U @ U.T
        ai, bi = np.triu_indices(len(ids), 1)
        cs = sims[ai, bi]
        keep = cs >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ai][keep],
                "vec_b": ids[bi][keep],
                "cosine": np.round(cs[keep], 4),
            }
        )

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    out = out.astype({"vec_a": "int64", "vec_b": "int64"}).drop_duplicates(
        ["vec_a", "vec_b"]
    )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
