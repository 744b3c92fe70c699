"""Similarity search over an embedding column.

- ``cosine_topk``: exact brute-force baseline — the query matrix is
  ``ray.put`` once and every ``map_batches`` task computes a partial
  top-k against its batch (numpy matmul); partials k-way merge on the
  driver. No shuffle, single streaming pass.
- ``ivf_topk``: the scale path — vectors are bucketed once by nearest of
  ``n_cells`` seeded centroids (mini k-means on a sample); queries probe
  only the ``n_probe`` nearest cells. Recall<1 by design; the baseline
  is the oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64)


def _topk_idx(sims: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Top-kk indices by (score desc, vec_id asc) with a FULL tiebreak,
    so a per-batch partial never drops a global winner when scores tie
    at the k boundary (duplicate embeddings tie exactly; the driver
    merge breaks ties by vec_id, so partials must too). O(n) partition
    + a lexsort over only the rows at/above the boundary score — the
    full-sort cost is paid only when everything ties."""
    n = len(sims)
    if kk >= n:
        return np.lexsort((ids, -sims))
    part = np.argpartition(-sims, kk - 1)[:kk]
    thresh = sims[part].min()
    cand = np.nonzero(sims >= thresh)[0]
    order = np.lexsort((ids[cand], -sims[cand]))
    return cand[order[:kk]]


def cosine_topk(
    sf_dir: str, queries: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Exact top-k by cosine for each query row. Returns
    (query_id, vec_id, score) with score rounded to 4dp, ranked by
    (score desc, vec_id asc)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    Q = _unit(np.atleast_2d(np.asarray(queries, np.float64)))
    qref = ray.put(Q)

    def partial(t: pa.Table) -> pa.Table:
        Qm = ray.get(qref)
        emb = _unit(_emb_matrix(t))
        sims = Qm @ emb.T  # (nq, nb)
        ids = t["vec_id"].to_numpy()
        nq, nb = sims.shape
        kk = min(k, nb)
        out_q, out_v, out_s = [], [], []
        for qi in range(nq):
            # partial top-k within the batch, full (score, id) tiebreak
            idx = _topk_idx(sims[qi], ids, kk)
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(ids[idx])
            out_s.append(sims[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def ivf_topk(
    sf_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-style ANN: coarse-quantize once, probe nearest cells only."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(path)
    refs = ds.limit(2048).to_arrow_refs()
    sample = _emb_matrix(pa.concat_tables([ray.get(r) for r in refs]))
    rng = np.random.RandomState(seed)
    cent = _unit(sample[rng.choice(len(sample), n_cells, replace=False)])
    for _ in range(5):  # few Lloyd iterations on the sample
        assign = np.argmax(_unit(sample) @ cent.T, axis=1)
        for c in range(n_cells):
            m = sample[assign == c]
            if len(m):
                cent[c] = _unit(m.mean(axis=0, keepdims=True))[0]
    cref = ray.put(cent)
    Q = _unit(np.atleast_2d(np.asarray(queries, np.float64)))
    probe_cells = np.argsort(-(Q @ cent.T), axis=1)[:, :n_probe]
    qref = ray.put((Q, probe_cells))

    def partial(t: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        Qm, probes = ray.get(qref)
        emb = _unit(_emb_matrix(t))
        ids = t["vec_id"].to_numpy()
        cell = np.argmax(emb @ cen.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Qm)):
            mask = np.isin(cell, probes[qi])
            if not mask.any():
                continue
            sims = emb[mask] @ Qm[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            idx = _topk_idx(sims, sub_ids, kk)
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(sub_ids[idx])
            out_s.append(sims[idx])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def ivf_hyperplane_topk(
    sf_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 4,
    max_hamming: int = 1,
) -> pd.DataFrame:
    """IVF with a DETERMINISTIC coarse quantizer: cell = sign bits of the
    first ``n_bits`` dimensions (an LSH-style inverted file); a query
    probes every cell within ``max_hamming`` bit flips of its own cell
    and scans only those cells' vectors. Same probe-subset scan shape as
    ``ivf_topk``, but the cell assignment is a pure function of the
    vector — so the whole pipeline (cells, probe rule, cosine, top-k) is
    exactly reproducible by the DuckDB oracle, giving the IVF family a
    hash-exact driver gate (the k-means variant stays recall-gated)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    Q = _unit(np.atleast_2d(np.asarray(queries, np.float64)))
    raw_q = np.atleast_2d(np.asarray(queries, np.float64))
    qcell = (
        (raw_q[:, :n_bits] > 0).astype(np.int64)
        * (1 << np.arange(n_bits))[None, :]
    ).sum(axis=1)
    qref = ray.put((Q, qcell))

    def partial(t: pa.Table) -> pa.Table:
        Qm, qc = ray.get(qref)
        raw = _emb_matrix(t)
        emb = _unit(raw)
        ids = t["vec_id"].to_numpy()
        cell = (
            (raw[:, :n_bits] > 0).astype(np.int64)
            * (1 << np.arange(n_bits))[None, :]
        ).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Qm)):
            x = np.bitwise_xor(cell, qc[qi]).astype(np.uint8)  # n_bits <= 8
            ham = np.unpackbits(x[:, None], axis=1).sum(axis=1)
            mask = ham <= max_hamming
            if not mask.any():
                continue
            sims = emb[mask] @ Qm[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            idx = _topk_idx(sims, sub_ids, kk)
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(sub_ids[idx])
            out_s.append(sims[idx])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def _cells_of(raw: np.ndarray, n_bits: int) -> np.ndarray:
    """Deterministic hyperplane cell id = sign bits of the first n_bits
    dims — a pure function of the vector (no trained state)."""
    return (
        (raw[:, :n_bits] > 0).astype(np.int64)
        * (1 << np.arange(n_bits))[None, :]
    ).sum(axis=1)


def build_ivf_index(
    sf_dir: str, index_dir: str, n_bits: int = 4
) -> dict:
    """Persist the hyperplane IVF layout: vectors land in one parquet
    directory PER CELL (``cell=C/``), so a query later reads only its
    probed cells' files — pruning at the READ, which is the step that
    makes IVF pay at 100 TB (the in-memory variants above still stream
    every vector and prune in compute). A rebuild writes to a temp
    sibling and swaps in only on success, so an existing index is
    replaced wholesale and a failed rerun leaves it untouched; a
    production-scale resume would skip finished cells via per-cell
    lineage markers, the way ``build.py`` does for index partitions.

    Returns {"n_cells": ..., "n_vectors": ...}."""
    if not 1 <= n_bits <= 8:  # uint8 Hamming math in the probe rule
        raise ValueError("n_bits must be in 1..8")
    import shutil
    import uuid

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = ds.count()  # parquet metadata, no scan

    def assign(t: pa.Table) -> pa.Table:
        raw = _emb_matrix(t)
        return t.append_column("cell", pa.array(_cells_of(raw, n_bits)))

    # write to a sibling temp dir, swap in only after success — a failed
    # rebuild must never destroy the previous working index
    tmp = f"{index_dir.rstrip('/')}.tmp-{uuid.uuid4().hex[:6]}"
    try:
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["cell"]
        )
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        os.rename(tmp, index_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    cells = [
        d for d in os.listdir(index_dir) if d.startswith("cell=")
    ]
    return {"n_cells": len(cells), "n_vectors": int(n_vec)}


def ivf_persisted_topk(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 4,
    max_hamming: int = 1,
) -> pd.DataFrame:
    """Probe-only search over a ``build_ivf_index`` layout: the probed
    cell directories are opened BY PATH, so unprobed cells' bytes never
    leave storage (structural partition pruning, not a post-read
    filter). Row-for-row identical to ``ivf_hyperplane_topk`` on the
    same vectors (tested), hence covered by the same SQL oracle."""
    Q = _unit(np.atleast_2d(np.asarray(queries, np.float64)))
    raw_q = np.atleast_2d(np.asarray(queries, np.float64))
    qcell = _cells_of(raw_q, n_bits)
    # union of every query's probe set -> the only dirs we read
    all_cells = np.arange(1 << n_bits)
    probe_sets = []
    for qi in range(len(Q)):
        x = np.bitwise_xor(all_cells, qcell[qi]).astype(np.uint8)
        ham = np.unpackbits(x[:, None], axis=1).sum(axis=1)
        probe_sets.append(set(all_cells[ham <= max_hamming].tolist()))
    union_cells = sorted(set().union(*probe_sets))
    paths = [
        os.path.join(p, f)
        for c in union_cells
        if os.path.isdir(p := os.path.join(index_dir, f"cell={c}"))
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    if not paths:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    qref = ray.put((Q, probe_sets))

    def partial(t: pa.Table) -> pa.Table:
        Qm, probes = ray.get(qref)
        raw = _emb_matrix(t)
        emb = _unit(raw)
        ids = t["vec_id"].to_numpy()
        # cell is a pure function of the vector: recompute instead of
        # carrying the partition column through the read
        cell = _cells_of(raw, n_bits)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(Qm)):
            mask = np.isin(cell, list(probes[qi]))
            if not mask.any():
                continue
            sims = emb[mask] @ Qm[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sims))
            idx = _topk_idx(sims, sub_ids, kk)
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(sub_ids[idx])
            out_s.append(sims[idx])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    ds = ray.data.read_parquet(paths)
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def query_vector_from(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Deterministic query vector: the embedding of a fixed vec_id."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).to_table(
        filter=pc.field("vec_id") == vec_id
    )
    return np.asarray(t["embedding"][0].as_py(), np.float64)


def sq8_codes(emb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-vector int8 scalar quantization (the classic SQ8
    compression every large ANN deployment runs first — 4x less vector
    memory through the object store, int8 kernels instead of float):
    ``code_i = round_half_away(v_i * 127 / max|v|)`` in [-127, 127].
    Arithmetic is pinned left-to-right in float64 over the float32
    inputs so a SQL oracle reproduces every code bit-for-bit."""
    from ..scoring import round_half_away

    v = emb.astype(np.float64)
    s = np.maximum(np.abs(v).max(axis=1), 1e-30)
    codes = round_half_away(v * 127.0 / s[:, None], 0).astype(np.int8)
    return codes, s


def sq8_topk(sf_dir: str, query: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Top-k by the DEQUANTIZED dot product: both sides SQ8-coded and
    the integer code dot is multiplied back by the stored per-vector
    scales — ``score = dot_int * s_q * s_v / 127^2`` — the same
    reconstruction faiss-style SQ8 uses (a magnitude-blind raw code
    dot would rank every positive scalar multiple of a vector
    identically). dot_int stays exact int; the scale product is a
    fixed-order double expression a SQL oracle reproduces bit-for-bit.
    Ranking: unrounded score desc, vec_id asc; published score rounded
    4dp (the bm25 contract). One streaming pass, per-batch partial
    top-k, query codes broadcast once; recall-vs-exact is pytest-gated
    (test_ops.test_ann_sq8_recall)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    qc, qs = sq8_codes(np.atleast_2d(np.asarray(query, np.float64)))
    qref = ray.put((qc[0].astype(np.int32), float(qs[0])))

    def partial(t: pa.Table) -> pa.Table:
        qv, q_scale = ray.get(qref)
        codes, s = sq8_codes(_emb_matrix(t))
        dots = codes.astype(np.int32) @ qv  # exact int32
        score = dots.astype(np.float64) * q_scale * s / 16129.0
        ids = t["vec_id"].to_numpy()
        kk = min(k, len(ids))
        idx = _topk_idx(score, ids, kk)
        return pa.table(
            {
                "vec_id": pa.array(ids[idx]),
                "dot_int": pa.array(dots[idx].astype(np.int64)),
                "score": pa.array(score[idx]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["score", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    from ..scoring import round_half_away

    out["score"] = round_half_away(out["score"].to_numpy(), 4)
    return out.astype(
        {"vec_id": "int64", "dot_int": "int64", "score": "float64"}
    )


def filtered_cosine_topk(
    sf_dir: str, query: np.ndarray, label: int, k: int = 10
) -> pd.DataFrame:
    """FILTERED vector search (the ES/FAISS knn-with-filter shape):
    exact cosine top-k restricted to vectors whose ``label`` matches.
    The predicate is pushed INTO the parquet read (row-group pruning +
    per-fragment filtering — only qualifying rows leave storage, the
    100 TB-correct place for a selective filter), then the usual
    broadcast-query partial top-k streams over what remains. Returns
    (vec_id, score) ranked (score desc, vec_id asc), score rounded
    4dp."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=(pads.field("label") == label),
    )
    q = _unit(np.atleast_2d(np.asarray(query, np.float64)))[0]
    qref = ray.put(q)

    def partial(t: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        emb = _unit(_emb_matrix(t))
        sims = emb @ qv
        ids = t["vec_id"].to_numpy()
        kk = min(k, len(ids))
        idx = _topk_idx(sims, ids, kk)
        return pa.table(
            {"vec_id": pa.array(ids[idx]), "score": pa.array(sims[idx])}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        # an unmatched filter value prunes every row group — ordinary
        # input for a filtered-search API, so: zero rows, not a crash
        return pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    out = (
        parts.sort_values(["score", "vec_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    from ..scoring import round_half_away

    out["score"] = round_half_away(out["score"].to_numpy(), 4)
    return out.astype({"vec_id": "int64", "score": "float64"})
