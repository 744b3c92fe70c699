"""Semantic search parity: chunk -> embed (actor pool) -> cosine top-k.

Mirrors the reference's semantic path (``ck-engine/src/semantic_v3.rs``):
chunks are embedded at index time, a query is embedded at search time, and
candidates are ranked by cosine similarity with threshold + near-miss
tracking. The ONNX embedder is replaced by a deterministic hash-projection
embedder (FIXTURES.md §4 — this container has no ONNX models); the Ray
plumbing (actor pool with per-actor state, batched embed, broadcast query)
is the real production shape: swap ``PseudoEmbedder`` for a model-loading
class and nothing else changes.

Chunking is the reference's *generic* chunker shape (fixed line windows
with overlap, ``ck-chunk/src/lib.rs:299-372``); tree-sitter chunking is a
per-language parser swap inside the same flat-map stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .ids import doc_id_column, term_hash
from .tokenizer import tokenize_array

EMBED_DIM = 64


def chunk_batch(
    t: pa.Table, *, target_lines: int = 20, overlap_lines: int = 4
) -> pa.Table:
    """Flat-map: one corpus row -> N chunk rows (line windows w/ overlap).

    Fully vectorized (offsets arithmetic over one ``\\n`` split, the same
    shape the tokenizer uses): no per-row Python, so the stage scales
    with BYTES, not rows. Line rule matches the SQL oracle exactly —
    CRLF / bare CR normalize to LF, split on LF, and a trailing
    terminator does not open an empty final line. Windows: start every
    ``target-overlap`` lines; a window that reaches the end closes the
    doc (no window starts inside the last ``overlap`` lines)."""
    import pyarrow.compute as pc

    step = max(1, target_lines - overlap_lines)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "path": pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.int32()),
            "line_start": pa.array([], pa.int32()),
            "line_end": pa.array([], pa.int32()),
            "text": pa.array([], pa.string()),
        }
    )
    if t.num_rows == 0:
        return empty
    content = t["content"]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    content = content.fill_null("")
    # normalize CRLF and bare CR to LF first, so Windows / classic-Mac
    # docs chunk like str.splitlines() did (the SQL oracle's corpus is
    # LF-only, so this never diverges from it)
    content = pc.replace_substring(content, "\r\n", "\n")
    content = pc.replace_substring(content, "\r", "\n")
    lists = pc.split_pattern(content, pattern="\n")
    vals = pc.list_flatten(lists)
    off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = np.diff(off)
    # a trailing "\n" yields one empty final element — not a line
    byte_len = pc.binary_length(vals).to_numpy(zero_copy_only=False)
    last_idx = np.maximum(off[1:] - 1, 0)
    n_lines = cnt - ((cnt > 0) & (byte_len[last_idx] == 0))
    # chunks per row: 1 window if it fits, else one per step until a
    # window reaches the end (ceil((n - target)/step) extra windows)
    nch = np.where(
        n_lines <= 0,
        0,
        np.where(
            n_lines <= target_lines,
            1,
            1 + (n_lines - target_lines + step - 1) // step,
        ),
    ).astype(np.int64)
    total = int(nch.sum())
    if total == 0:
        return empty
    rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), nch)
    cum = np.concatenate(([0], np.cumsum(nch)))
    cid = np.arange(total, dtype=np.int64) - cum[rep]
    s = cid * step
    e = np.minimum(s + target_lines, n_lines[rep])
    # gather each window's lines into a fresh (non-overlapping) list
    # array, then join with "\n" — duplication factor target/step
    g0 = off[:-1][rep] + s
    lens = e - s
    lcum = np.concatenate(([0], np.cumsum(lens)))
    idx = (
        np.arange(int(lcum[-1]), dtype=np.int64)
        - np.repeat(lcum[:-1], lens)
        + np.repeat(g0, lens)
    )
    windows = pa.ListArray.from_arrays(
        pa.array(lcum, pa.int32()), vals.take(pa.array(idx))
    )
    text = pc.binary_join(windows, "\n")
    doc_ids = doc_id_column(t["repo"], t["path"], t["commit"]).to_numpy()
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[rep], pa.int64()),
            "path": t["path"].take(pa.array(rep)),
            "chunk_id": pa.array(cid, pa.int32()),
            "line_start": pa.array(s + 1, pa.int32()),  # 1-indexed Span
            "line_end": pa.array(e, pa.int32()),
            "text": text,
        }
    )


def _embed_tokens(term_hashes: np.ndarray, row_index: np.ndarray, n_rows: int,
                  dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic embedding: token-hash scatter into a dim-sphere.

    Each token hash seeds ``dim`` pseudo-random signs via splitmix-style
    mixing; a document's embedding is the L2-normalized sum over tokens.
    Pure numpy, no per-row Python.

    Accumulation runs in float64 on purpose: the per-token values are
    exact multiples of 2^-15, so float64 sums are EXACT and therefore
    order-independent — which makes the whole embedding reproducible by
    the DuckDB oracle (integer mixing replicated in SQL, sums in
    DOUBLE) regardless of summation order. Only the stored vector is
    float32."""
    if len(term_hashes) == 0:
        return np.zeros((n_rows, dim), dtype=np.float32)
    h = term_hashes.astype(np.uint64)
    cols = np.arange(dim, dtype=np.uint64)
    # mix h with column index (vectorized outer)
    x = h[:, None] ^ (cols[None, :] * np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    vals = ((x & np.uint64(0xFFFF)).astype(np.float64) / 32768.0) - 1.0
    emb = np.zeros((n_rows, dim), dtype=np.float64)
    np.add.at(emb, row_index, vals)
    norm = np.linalg.norm(emb, axis=1)
    emb /= np.maximum(norm, 1e-12)[:, None]
    return emb.astype(np.float32)


def _pseudo_factory(dim: int):
    return lambda: PseudoEmbedder(dim=dim)


def _provider_factory(prov, cfg):
    return lambda: prov(cfg)


class EmbedStage:
    """Actor-pool embed stage: the embedder — the 'model' — is built
    ONCE per actor in ``__init__`` from a zero-arg factory resolved on
    the driver (PseudoEmbedder by default; a registered provider's real
    model otherwise — ``ck_ray.models.register_embedder_provider``).
    ``__call__`` only runs the batch through it."""

    def __init__(self, factory):
        self.embedder = factory()

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.embedder(t)


class PseudoEmbedder:
    """Actor-pool embed stage: 'model' state built once per actor."""

    def __init__(self, dim: int = EMBED_DIM, text_col: str = "text"):
        self.dim = dim
        self.text_col = text_col

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        tb = tokenize_array(pa.array(texts, pa.string()))
        th = term_hash(tb.term, np.zeros(len(tb.row_index), dtype=np.int64))
        return _embed_tokens(th, tb.row_index, len(texts), self.dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        tb = tokenize_array(t[self.text_col])
        th = term_hash(tb.term, np.zeros(len(tb.row_index), dtype=np.int64))
        emb = _embed_tokens(th, tb.row_index, t.num_rows, self.dim)
        return t.append_column(
            "embedding", pa.array(list(emb), pa.list_(pa.float32(), self.dim))
        )


def build_chunk_embeddings(
    corpus: str | ray.data.Dataset,
    *,
    target_lines: int = 20,
    overlap_lines: int = 4,
    concurrency: int = 4,
    chunker: str = "lines",
    model: str | None = None,
) -> ray.data.Dataset:
    """corpus -> chunk table with embeddings (the semantic index).

    ``chunker="ast"`` swaps in the structural chunker
    (``ck_ray.chunker.ast_chunk_batch``: AST captures with breadcrumbs
    for Python, line-window fallback elsewhere) — same flat-map slot the
    reference uses for tree-sitter vs generic chunking."""
    ds = ray.data.read_parquet(corpus) if isinstance(corpus, str) else corpus
    if chunker == "ast":
        from .chunker import ast_chunk_batch

        chunks = ds.map_batches(
            lambda t: ast_chunk_batch(
                t, fallback_target=target_lines,
                fallback_overlap=overlap_lines,
            ).drop_columns(["chunk_type", "breadcrumb", "depth"]),
            batch_format="pyarrow",
        )
    else:
        chunks = ds.map_batches(
            lambda t: chunk_batch(t, target_lines=target_lines, overlap_lines=overlap_lines),
            batch_format="pyarrow",
        )
    if model is not None:  # registry swap point (ck_ray.models)
        from .models import _EMBEDDER_PROVIDERS, ModelRegistry

        _, cfg = ModelRegistry().resolve(model)
        prov = _EMBEDDER_PROVIDERS.get(cfg.provider)
        if prov is not None:
            # resolved DRIVER-side (the provider registry lives in the
            # driver process); the factory cloudpickles into each actor
            factory = _provider_factory(prov, cfg)
        else:
            factory = _pseudo_factory(cfg.dimensions)
    else:
        factory = _pseudo_factory(EMBED_DIM)
    return chunks.map_batches(
        EmbedStage, batch_format="pyarrow", batch_size=512,
        fn_constructor_args=(factory,),
        # autoscaling pool (min 1): a FIXED pool of size N waits for all N
        # CPUs and deadlocks when other actors (e.g. an open BM25Engine's
        # shards) hold part of a small cluster
        concurrency=(1, concurrency),
    )


def semantic_search(
    chunk_emb: ray.data.Dataset,
    query: str,
    top_k: int = 10,
    threshold: float | None = None,
    rerank: bool = False,
    model: str | None = None,
    rerank_model: str | None = None,
    keep_text: bool = False,
) -> pd.DataFrame:
    """Cosine top-k over the chunk table; broadcast query vector, per-batch
    partial top-k, driver merge; threshold keeps the best near-miss
    (reference ``semantic_v3.rs:144-227`` closest_below_threshold)."""
    if model is not None:
        from .models import create_embedder

        q = create_embedder(model).embed_texts([query])[0]
    else:
        q = PseudoEmbedder().embed_texts([query])[0]
    qref = ray.put(q.astype(np.float32))

    def partial(t: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        emb = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), -1)
        # float64 dot over the stored float32 vectors: both this code and
        # the DuckDB oracle then compute the same IEEE double products,
        # so 4dp-rounded scores agree robustly
        sims = emb.astype(np.float64) @ qv.astype(np.float64)
        kk = min(top_k + 1, len(sims))
        if kk == 0:
            return t.slice(0, 0).append_column("score", pa.array([], pa.float64()))
        idx = np.argpartition(-sims, kk - 1)[:kk]
        cols = {
            "doc_id": t["doc_id"].take(pa.array(idx)),
            "path": t["path"].take(pa.array(idx)),
            "chunk_id": t["chunk_id"].take(pa.array(idx)),
            "line_start": t["line_start"].take(pa.array(idx)),
            "line_end": t["line_end"].take(pa.array(idx)),
            "score": pa.array(sims[idx]),
        }
        if (rerank or keep_text) and "text" in t.column_names:
            # keep_text: --sem --full-section emits the chunk's full
            # text (a semantic hit IS a chunk — the section unit)
            cols["text"] = t["text"].take(pa.array(idx))
        return pa.table(cols)

    parts = chunk_emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["score", "doc_id", "chunk_id"], ascending=[False, True, True]
    )
    if threshold is not None:
        above = parts[parts["score"] >= threshold].head(top_k)
        if len(above) == 0 and len(parts):
            # closest_below_threshold: report the single best near-miss
            return parts.head(1).assign(below_threshold=True).reset_index(drop=True)
        return above.assign(below_threshold=False).reset_index(drop=True)
    out = parts.head(top_k).reset_index(drop=True)
    if rerank and "text" in out.columns:
        # reference rerank stage shape (ck-embed/src/reranker.rs): score the
        # top-N candidate previews with the cross-encoder stand-in, re-sort
        from .models import create_reranker

        rr = create_reranker(rerank_model)
        out["rerank_score"] = rr.rerank(query, out["text"].tolist())
        out = out.sort_values(
            ["rerank_score", "doc_id", "chunk_id"],
            ascending=[False, True, True],
        ).reset_index(drop=True)
        out = out.drop(columns=["text"])
    return out


class PseudoReranker:
    """Cross-encoder stand-in: deterministic token-overlap score. Shape of
    the reference's rerank stage (``ck-embed/src/reranker.rs``): applied to
    the top-N candidates only, re-sorts, truncates."""

    def __init__(self):
        self._emb = PseudoEmbedder()

    def rerank(self, query: str, docs: list[str]) -> list[float]:
        qv = self._emb.embed_texts([query])[0]
        dv = self._emb.embed_texts(docs)
        # overlap-weighted cosine, deterministic
        return (dv @ qv).tolist()
