"""Corpus-curation operators for training-data pipelines.

The four post-dedup steps every large-scale pretraining pipeline runs
after near-dup removal (reference scope: ck indexes a corpus, these
prepare one — SURVEY.md §2.7/§2.9 extensions):

- **decontaminate**: flag corpus documents whose token n-grams overlap a
  benchmark/eval set. The eval set is orders of magnitude smaller than
  the corpus, so its distinct shingle hashes are collected once,
  ``ray.put`` as ONE sorted uint64 array, and every corpus batch probes
  it with a vectorized ``searchsorted`` — a broadcast semi-join, zero
  shuffle of corpus data.
- **dup_ngram_spans**: per-document count of n-gram positions whose
  n-gram appears in >= 2 distinct documents (the substring-level dup
  statistic behind "deduplicating training data makes LMs better"-style
  span dedup). One hash exchange keyed by shingle hash computes global
  df and folds it back to per-doc counts; only (hash, doc_id, count)
  triples ever shuffle, never text.
- **stratified_sample**: deterministic per-stratum downsampling — keep a
  document iff ``md5_u64(str(doc_id)) < rate[stratum] * 2^64``. Pure
  map-side filter (no shuffle, no RNG state); the same row set falls out
  of any executor at any parallelism, and the SQL oracle recomputes the
  identical md5 threshold test.
- **source_quota_cap**: keep at most Q documents per source, priority =
  ascending ``md5_u64(str(doc_id))`` (a deterministic uniform "random"
  order). Hash exchange on source -> one vectorized segmented-rank
  kernel per partition (lexsort + run-start subtraction), the same
  pattern as the window pipelines in relational.py.
- **corpus_clean**: the four stages composed end to end (near-dup
  removal -> eval holdout + decontamination -> sampling -> quotas
  ranked among survivors), one streaming filter pass + one exchange.

All heavy stages are ``map_batches`` over zero-copy Arrow batches; the
only exchanges are dup_ngram_spans' shingle-keyed one and the quota
rank's source-keyed one.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..exchange import hash_exchange, int_key_hash
from ..ids import md5_u64_of_terms
from ..scoring import round_half_away
from .dedup import (
    _batch_distinct_shingles as _distinct_doc_shingles,
    _shingle_hashes,
)

_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def _docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# ---------------------------------------------------------- decontaminate


def decontaminate(
    sf_dir: str, n: int = 5, eval_mod: int = 17
) -> pd.DataFrame:
    """Flag corpus docs sharing any token n-gram with the eval set.

    Eval set = docs with ``doc_id % eval_mod == 0`` (a deterministic
    stand-in for a benchmark suite; the operator takes any (doc_id,
    text) dataset via ``decontaminate_over``). Returns one row per
    CONTAMINATED non-eval doc: (doc_id, n_overlap distinct shared
    shingles, n_shingles distinct shingles, overlap_frac).

    Scale: the eval side is small by definition (benchmarks are MBs,
    corpora are TBs), so its distinct shingle hashes are gathered to the
    driver once and broadcast via ``ray.put``; the corpus side is a
    stateless ``map_batches`` probe with ``searchsorted`` — no corpus
    shuffle at all. 100 TB cost = one streaming pass.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])
    is_eval = lambda ids: ids % eval_mod == 0  # noqa: E731
    return decontaminate_over(ds, is_eval, n)


def decontaminate_over(ds, is_eval, n: int) -> pd.DataFrame:
    def eval_shingles(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(is_eval(ids)))
        _, sh, _ = _distinct_doc_shingles(sub, n)
        return pa.table({"sh": pa.array(np.unique(sh))})

    # small side: distinct eval shingle hashes -> one sorted broadcast
    ev = ds.map_batches(eval_shingles, batch_format="pyarrow").to_pandas()
    eval_sorted = np.unique(ev["sh"].to_numpy().astype(np.uint64))
    eval_ref = ray.put(eval_sorted)

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sub = t.filter(pa.array(~is_eval(ids)))
        row, sh, sizes = _distinct_doc_shingles(sub, n)
        ev_arr = ray.get(eval_ref)
        if len(sh):
            pos = np.searchsorted(ev_arr, sh)
            pos[pos == len(ev_arr)] = 0
            hit = ev_arr[pos] == sh if len(ev_arr) else np.zeros(len(sh), bool)
            n_overlap = np.bincount(
                row[hit], minlength=sub.num_rows
            ).astype(np.int64)
        else:
            n_overlap = np.zeros(sub.num_rows, np.int64)
        keep = n_overlap >= 1
        return pa.table(
            {
                "doc_id": pa.array(sub["doc_id"].to_numpy()[keep]),
                "n_overlap": pa.array(n_overlap[keep]),
                "n_shingles": pa.array(sizes[keep]),
                "overlap_frac": pa.array(
                    round_half_away(
                        n_overlap[keep] / np.maximum(sizes[keep], 1)
                    )
                ),
            }
        )

    out = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# -------------------------------------------------------- dup_ngram_spans


def dup_ngram_spans(sf_dir: str, n: int = 5) -> pd.DataFrame:
    """Per-doc duplicate n-gram span statistics.

    For every document with >= 1 token n-gram: (doc_id, total_ngrams =
    n-gram POSITIONS, dup_ngrams = positions whose n-gram occurs in >= 2
    DISTINCT docs, dup_frac). The df test is on distinct documents, so
    a doc's internal repetition alone never marks it duplicated.

    Shape: map emits distinct (shingle, doc_id, position-count) triples;
    ONE hash exchange keyed by shingle co-locates each shingle's rows,
    and the reducer folds them to per-doc (total, dup) partials — its
    output is bounded by #docs x #partitions, summed on the driver.
    Text never shuffles; only 24-byte triples do. At 100 TB the final
    driver sum becomes a second (tiny, doc-keyed) exchange; the shingle
    exchange is the whole cost — exactly one pass + one shuffle of
    hashes.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def doc_shingle_counts(t: pa.Table) -> pa.Table:
        starts, sh = _shingle_hashes(t, n)
        counts = np.diff(starts)
        row = np.repeat(np.arange(t.num_rows), counts)
        if len(row) == 0:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((sh, row))
        r2, s2 = row[order], sh[order]
        new = np.concatenate(
            ([True], (r2[1:] != r2[:-1]) | (s2[1:] != s2[:-1]))
        )
        grp_start = np.nonzero(new)[0]
        grp_len = np.diff(np.concatenate((grp_start, [len(r2)])))
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "sh": pa.array(
                    (s2[grp_start] & _MASK63).astype(np.int64)
                ),
                "doc_id": pa.array(ids[r2[grp_start]]),
                "cnt": pa.array(grp_len.astype(np.int64)),
            }
        )

    def fold(rows: pa.Table) -> pa.Table:
        """One shingle partition -> per-doc (total, dup) partials."""
        sh = rows["sh"].to_numpy()
        ids = rows["doc_id"].to_numpy()
        cnt = rows["cnt"].to_numpy()
        order = np.argsort(sh, kind="stable")
        sh, ids, cnt = sh[order], ids[order], cnt[order]
        new = np.concatenate(([True], sh[1:] != sh[:-1]))
        seg = np.cumsum(new) - 1  # shingle group id per row
        # rows are distinct per (sh, doc) already, so group size = df
        df = np.bincount(seg)
        dup = cnt * (df[seg] >= 2)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "total": pa.array(cnt),
                    "dup": pa.array(dup),
                }
            ),
            "doc_id",
            use_threads=False,
        ).aggregate([("total", "sum"), ("dup", "sum")])
        return g

    part = hash_exchange(
        ds.map_batches(doc_shingle_counts, batch_format="pyarrow"),
        key_fn=lambda t: int_key_hash(t["sh"].to_numpy()),
        reducer=fold,
    )
    if len(part) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "total_ngrams": pd.Series([], dtype="int64"),
                "dup_ngrams": pd.Series([], dtype="int64"),
                "dup_frac": pd.Series([], dtype="float64"),
            }
        )
    out = (
        part.groupby("doc_id", as_index=False)
        .agg(total_ngrams=("total_sum", "sum"), dup_ngrams=("dup_sum", "sum"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["dup_frac"] = round_half_away(out["dup_ngrams"] / out["total_ngrams"])
    return out


# ------------------------------------------------------- stratified_sample

# md5_u64 thresholds as EXACT integers so the SQL oracle can inline the
# same literals (floats would round differently across engines)
_U64 = 1 << 64
DEFAULT_RATES = {"en": 0.1}  # downsample the dominant stratum
DEFAULT_RATE_OTHER = 0.5


def _thresholds(rates: dict[str, float], other: float) -> dict[str, int]:
    th = {k: int(v * _U64) for k, v in rates.items()}
    th["__other__"] = int(other * _U64)
    return th


def _sample_mask(t: pa.Table, th: dict[str, int]) -> np.ndarray:
    """Boolean keep-mask of the md5-threshold stratified sample for one
    (doc_id, lang, ...) batch — the ONE place the rate arithmetic lives
    (shared by ``stratified_sample`` and ``corpus_clean``). Rate 1.0
    (threshold 2^64, beyond uint64) is carried as a keep-all flag;
    lookup is vocabulary-bounded via dictionary encode."""
    key = md5_u64_of_terms(pc.cast(t["doc_id"], pa.string()))
    enc = pc.dictionary_encode(t["lang"].combine_chunks())
    uth = [th.get(g, th["__other__"]) for g in enc.dictionary.to_pylist()]
    nu = len(enc.dictionary)
    lim = np.fromiter(
        (min(v, _U64 - 1) for v in uth), dtype=np.uint64, count=nu
    )
    keep_all = np.fromiter((v >= _U64 for v in uth), dtype=bool, count=nu)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return (key < lim[idx]) | keep_all[idx]


def stratified_sample(
    sf_dir: str,
    rates: dict[str, float] | None = None,
    rate_other: float = DEFAULT_RATE_OTHER,
) -> pd.DataFrame:
    """Deterministic stratified sampling by ``lang``.

    Keep a doc iff ``md5_u64(str(doc_id)) < rate[lang] * 2^64`` — a
    content-independent uniform hash test, so the sample is identical
    under any parallelism / retry / row order (no RNG state to seed per
    worker) and exactly reproducible in SQL. Returns the kept
    (doc_id, lang, source) rows.

    Scale: stateless map-side filter — no shuffle, no driver state; the
    rate table rides the closure (bytes). 100 TB cost = one pass that
    prunes at the read (3 columns only).
    """
    th = _thresholds(rates or DEFAULT_RATES, rate_other)

    def keep_batch(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_sample_mask(t, th)))

    out = (
        _docs(sf_dir, ["doc_id", "lang", "source"])
        .map_batches(keep_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------- source_quota_cap


def _quota_over(
    ds: ray.data.Dataset, quota: int, carry_cols: tuple[str, ...]
) -> pd.DataFrame:
    """Per-source top-``quota`` by ascending md5_u64(str(doc_id)) over an
    arbitrary (doc_id, source, *carry_cols) dataset — the shared engine
    of ``source_quota_cap`` and ``corpus_clean``.

    Shape: hash exchange keyed by source; each partition ranks its
    sources with ONE vectorized kernel (lexsort + run-start subtraction
    — no per-group Python, the relational.py window pattern), so cost
    scales with rows, not groups. Skewed sources are bounded by the
    quota on output; at 100 TB a per-batch pre-cap (keep the Q smallest
    keys per batch per source — a strict superset of the winners)
    bounds the hot partition's input too."""

    def add_key(t: pa.Table) -> pa.Table:
        key = md5_u64_of_terms(pc.cast(t["doc_id"], pa.string()))
        # bit-cast so the full 64-bit ordering survives the int64 column
        return t.append_column("key", pa.array(key.view(np.int64)))

    def rank_part(rows: pa.Table) -> pa.Table:
        src = pc.dictionary_encode(rows["source"].combine_chunks())
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = rows["doc_id"].to_numpy()
        key = rows["key"].to_numpy().view(np.uint64)  # undo the bit-cast
        order = np.lexsort((ids, key, codes))
        c2 = codes[order]
        run_start = np.nonzero(
            np.concatenate(([True], c2[1:] != c2[:-1]))
        )[0]
        pos = np.arange(len(c2)) - np.repeat(
            run_start, np.diff(np.concatenate((run_start, [len(c2)])))
        )
        keep = pos < quota
        sel = pa.array(order[keep])
        cols = {"doc_id": pa.array(ids[order[keep]])}
        for c in carry_cols:
            cols[c] = rows[c].take(sel)
        cols["rank"] = pa.array((pos[keep] + 1).astype(np.int64))
        return pa.table(cols)

    out = hash_exchange(
        ds.map_batches(add_key, batch_format="pyarrow"),
        key_fn=lambda t: md5_u64_of_terms(t["source"]),
        reducer=rank_part,
    )
    if len(out) == 0:
        cols = {"doc_id": pd.Series([], dtype="int64")}
        for c in carry_cols:
            cols[c] = pd.Series([], dtype="object")
        cols["rank"] = pd.Series([], dtype="int64")
        return pd.DataFrame(cols)
    return out.sort_values("doc_id").reset_index(drop=True)


def source_quota_cap(sf_dir: str, quota: int = 12) -> pd.DataFrame:
    """Keep at most ``quota`` docs per source (deterministic priority).

    Priority = ascending ``md5_u64(str(doc_id))`` with doc_id tiebreak —
    a uniform "random" Q-subset that is stable across runs. Returns
    (doc_id, source, rank 1..quota). See ``_quota_over`` for the shape.
    """
    return _quota_over(
        _docs(sf_dir, ["doc_id", "source"]), quota, ("source",)
    )


# ----------------------------------------------------------- corpus_clean


def corpus_clean(
    sf_dir: str,
    jaccard_threshold: float = 0.6,
    n: int = 5,
    eval_mod: int = 17,
    rates: dict[str, float] | None = None,
    rate_other: float = DEFAULT_RATE_OTHER,
    quota: int = 12,
) -> pd.DataFrame:
    """The composed training-data curation pipeline, end to end:

    1. near-dup removal: connected components over exact token n-gram
       Jaccard >= threshold (the same ``n`` as stage 2); keep only each
       component's keeper (min doc_id). Exact duplicates have J = 1, so
       this subsumes exact dedup.
    2. eval holdout + decontamination: drop the eval docs themselves
       (doc_id % eval_mod == 0) and every doc sharing an n-gram with
       them.
    3. stratified sampling: the deterministic per-lang md5 threshold.
    4. source quotas: top-``quota`` per source by md5 priority — ranked
       among the SURVIVORS of 1-3, not the raw corpus.

    Returns the kept (doc_id, lang, source) rows, ordered by doc_id.

    Scale shape: stages 1-2 produce DROP sets that are small by nature
    (duplicates + contaminated docs are the exceptional rows) — they are
    union'd into one sorted id array, ``ray.put`` once, and applied
    together with the stage-3 hash predicate in a single stateless
    ``map_batches`` pass; stage 4 is the one exchange. So the whole
    pipeline is: the dedup/decontaminate passes (which shuffle only
    hashes), plus ONE streaming filter pass over ids+metadata, plus one
    source-keyed exchange bounded by quota x sources on output.
    """
    from .dedup import near_dup_groups

    comp = near_dup_groups(sf_dir, jaccard_threshold=jaccard_threshold, n=n)
    losers = comp.loc[
        comp["doc_id"] != comp["group_keeper"], "doc_id"
    ].to_numpy(np.int64)
    cont = decontaminate(sf_dir, n=n, eval_mod=eval_mod)[
        "doc_id"
    ].to_numpy(np.int64)
    drop_sorted = np.union1d(losers, cont)  # sorted unique
    dref = ray.put(drop_sorted)
    th = _thresholds(rates or DEFAULT_RATES, rate_other)

    def survive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        drop = ray.get(dref)
        if len(drop):
            pos = np.clip(np.searchsorted(drop, ids), 0, len(drop) - 1)
            dead = drop[pos] == ids
        else:
            dead = np.zeros(len(ids), bool)
        dead |= ids % eval_mod == 0
        return t.filter(pa.array(~dead & _sample_mask(t, th)))

    survivors = _docs(sf_dir, ["doc_id", "lang", "source"]).map_batches(
        survive, batch_format="pyarrow"
    )
    out = _quota_over(survivors, quota, ("lang", "source"))
    return out[["doc_id", "lang", "source"]].reset_index(drop=True)


DEFAULT_TOKEN_BUDGET = 15_000  # truncates even at sf0.01 (~27k tokens)


def token_budget_sample(
    sf_dir: str, budget: int = DEFAULT_TOKEN_BUDGET
) -> pd.DataFrame:
    """Deterministic sample up to a TOKEN budget: order docs by
    ``md5_u64(str(doc_id))`` (a uniform "random" order, ties by doc_id)
    and keep the longest prefix whose cumulative token count stays
    <= budget — the "fill the training mix to N tokens" selection.
    Returns the kept (doc_id, n_tokens) rows ordered by doc_id.

    Shape: per-doc token counts come from one stateless ``map_batches``
    pass (the tokenizer kernel); only (doc_id, count) pairs reach the
    driver, where the cumsum cutoff runs over ids. At 10^12 docs the
    cutoff becomes a threshold search instead (sample the key
    distribution, binary-search the key threshold whose predicted
    cumulative tokens hit the budget, then one exact correction pass) —
    the per-doc counting pass is unchanged. SQL oracle: the identical
    cumulative-sum window over the same md5 key order."""
    from ..tokenizer import tokenize_array

    ds = _docs(sf_dir, ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = np.bincount(tb.row_index, minlength=t.num_rows)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n.astype(np.int64)),
            }
        )

    df = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    key = md5_u64_of_terms(
        pc.cast(pa.array(df["doc_id"].to_numpy()), pa.string())
    )
    order = np.lexsort((df["doc_id"].to_numpy(), key))
    cum = np.cumsum(df["n_tokens"].to_numpy()[order])
    kept = order[cum <= budget]
    out = df.iloc[kept][["doc_id", "n_tokens"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def corpus_clean_write(
    sf_dir: str, out_dir: str, **clean_kwargs
) -> dict:
    """Materialize the cleaned corpus: run ``corpus_clean`` for the kept
    id set, then stream the full document rows (text included) through a
    broadcast semi-join filter into ``out_dir`` as parquet partitioned
    by ``source`` — one directory per source, so downstream readers
    prune by source at the read. The write lands in a temp sibling and
    swaps in only on success, so an existing ``out_dir`` is replaced
    wholesale and a failed run leaves it untouched; a production-scale
    resume would skip finished ``source=`` dirs via per-partition
    lineage markers, the way ``build.py`` does. The
    kept-id broadcast is bounded by the post-quota corpus
    (quota x sources rows), not the input.

    Returns {"n_kept": ..., "partitions": [...]}."""
    import shutil
    import uuid

    kept = corpus_clean(sf_dir, **clean_kwargs)
    keep_ids = np.sort(kept["doc_id"].to_numpy(np.int64))
    kref = ray.put(keep_ids)

    def only_kept(t: pa.Table) -> pa.Table:
        arr = ray.get(kref)
        ids = t["doc_id"].to_numpy()
        if not len(arr):
            return t.slice(0, 0)
        pos = np.clip(np.searchsorted(arr, ids), 0, len(arr) - 1)
        return t.filter(pa.array(arr[pos] == ids))

    # write to a sibling temp dir, swap in only after success — a failed
    # run must never destroy the previous materialized corpus
    tmp = f"{out_dir.rstrip('/')}.tmp-{uuid.uuid4().hex[:6]}"
    try:
        (
            ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
            .map_batches(only_kept, batch_format="pyarrow")
            .write_parquet(tmp, partition_cols=["source"])
        )
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    parts = sorted(
        d for d in os.listdir(out_dir) if d.startswith("source=")
    )
    return {"n_kept": int(len(keep_ids)), "partitions": parts}


DEFAULT_PACK_BUDGET = 128


def pack_sequences(
    sf_dir: str, budget: int = DEFAULT_PACK_BUDGET
) -> pd.DataFrame:
    """Greedy sequence packing for training-data prep: concatenate
    documents (in doc_id order, independently per ``source``) into
    training sequences of at most ``budget`` tokens; a document that
    would overflow the current sequence starts the next one (a document
    longer than the whole budget gets a sequence of its own). Precise
    rule (engine, SQL oracle and fuzz reference agree): a doc starts a
    new sequence iff the running total including it would exceed the
    budget AND it is not the sequence's first doc — zero-token docs
    consume a slot but no budget.

    Returns (doc_id, source, n_tokens, seq_id, seq_offset): which
    sequence each document landed in and at which token offset — the
    exact layout a sequence-packing writer needs.

    Scale shape: packing is sequential *within* a source but independent
    *across* sources, so the kernel rides the source-keyed hash exchange
    (same partitioning as ``source_quota_cap``). Per partition the
    reducer runs ONE vectorized pass per source: cumulative token sums +
    a ``searchsorted`` jump per produced sequence — O(log n) per
    sequence, not O(1) per document, so cost scales with OUTPUT
    sequences (total_tokens / budget), not with documents.
    """
    from ..tokenizer import tokenize_array

    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def with_len(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
            }
        )

    def pack_part(rows: pa.Table) -> pa.Table:
        src = pc.dictionary_encode(rows["source"].combine_chunks())
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = rows["doc_id"].to_numpy()
        n = rows["n_tokens"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, codes))
        c2, n2 = codes[order], n[order]
        starts = np.nonzero(
            np.concatenate(([True], c2[1:] != c2[:-1]))
        )[0]
        ends = np.concatenate((starts[1:], [len(c2)]))
        seq_id = np.empty(len(c2), np.int64)
        seq_off = np.empty(len(c2), np.int64)
        for s, e in zip(starts, ends):  # one iteration per SOURCE
            csum = np.cumsum(n2[s:e])
            i, base, sq = 0, 0, 0
            while i < e - s:  # one iteration per produced SEQUENCE
                j = int(np.searchsorted(csum, base + budget, side="right"))
                j = max(j, i + 1)  # an over-budget doc packs alone
                seq_id[s + i : s + j] = sq
                prev = np.concatenate(([base], csum[i : j - 1]))
                seq_off[s + i : s + j] = prev - base
                base = csum[j - 1]
                i, sq = j, sq + 1
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "source": rows["source"].take(pa.array(order)),
                "n_tokens": pa.array(n2),
                "seq_id": pa.array(seq_id),
                "seq_offset": pa.array(seq_off),
            }
        )

    out = hash_exchange(
        ds.map_batches(with_len, batch_format="pyarrow"),
        key_fn=lambda t: md5_u64_of_terms(t["source"]),
        reducer=pack_part,
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
                "seq_id": pd.Series([], dtype="int64"),
                "seq_offset": pd.Series([], dtype="int64"),
            }
        )
    for c in ("n_tokens", "seq_id", "seq_offset"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def dup_span_scrub(sf_dir: str, n: int = 5) -> pd.DataFrame:
    """Span-level deduplication WRITER: remove from every document the
    token positions covered by a cross-doc duplicate n-gram (an n-gram
    appearing in >= 2 distinct documents), and prove the rewrite with an
    md5 key of the scrubbed text — the "deduplicating training data"
    span-removal transform, not just the statistic
    (``dup_ngram_spans`` reports; this one rewrites).

    Returns per doc: (doc_id, n_tokens, dup_positions, covered_tokens,
    kept_tokens, scrub_key) where scrub_key is the first 60 bits of
    md5(' '-join of surviving tokens) — bit-identical to the SQL
    oracle's ``md5(string_agg(term, ' ' ORDER BY pos))``.

    Scale shape: pass 1 computes global distinct-doc df per shingle hash
    through the hash exchange (only (hash, partial-df) shuffles) and
    keeps ONLY the df >= 2 hashes — duplicated shingles are the
    exceptional rows, so the set is broadcast-sized (same argument as
    ``corpus_clean``'s drop set); pass 2 is one stateless streaming
    ``map_batches``: searchsorted probe, interval-union coverage via a
    +1/-1 delta cumsum over the flat token stream, Arrow list rebuild +
    ``binary_join`` for the rewritten text. No text ever shuffles.
    """
    from ..ids import md5_u64_of_terms as _md5_terms
    from ..tokenizer import tokenize_array

    ds = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        _, sh, _ = _distinct_doc_shingles(t, n)
        u, c = np.unique(sh, return_counts=True)
        return pa.table(
            {
                "sh": pa.array(u.view(np.int64)),
                "df": pa.array(c.astype(np.int64)),
            }
        )

    def df_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["sh"], use_threads=False).aggregate(
            [("df", "sum")]
        )
        dup = pc.greater_equal(g["df_sum"], 2)
        return pa.table({"sh": g["sh"].filter(dup)})

    dup_df = hash_exchange(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        key_fn=lambda t: t["sh"].to_numpy().view(np.uint64),
        reducer=df_reduce,
    )
    dup_sorted = (
        np.sort(dup_df["sh"].to_numpy().view(np.uint64))
        if len(dup_df)
        else np.empty(0, np.uint64)
    )
    dup_ref = ray.put(dup_sorted)

    def scrub(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        starts, acc = _shingle_hashes(t, n, tb=tb)
        n_rows = t.num_rows
        counts = np.bincount(tb.row_index, minlength=n_rows)
        tok_starts = np.concatenate(([0], np.cumsum(counts)))
        total_tok = int(tok_starts[-1])
        valid_len = np.diff(starts)
        win_row = np.repeat(np.arange(n_rows), valid_len)
        win_ord = np.arange(len(acc)) - np.repeat(starts[:-1], valid_len)
        win_base = tok_starts[:-1][win_row] + win_ord  # global token idx

        dup_set = ray.get(dup_ref)
        if len(dup_set) and len(acc):
            pos = np.clip(np.searchsorted(dup_set, acc), 0, len(dup_set) - 1)
            dup = dup_set[pos] == acc
        else:
            dup = np.zeros(len(acc), bool)

        covered = np.zeros(total_tok, bool)
        if dup.any():
            delta = np.zeros(total_tok + 1, np.int64)
            np.add.at(delta, win_base[dup], 1)
            np.add.at(delta, win_base[dup] + n, -1)
            covered = np.cumsum(delta[:-1]) > 0

        keep = ~covered
        kept_counts = np.bincount(
            tb.row_index[keep], minlength=n_rows
        ).astype(np.int64)
        terms = (
            tb.term.combine_chunks()
            if isinstance(tb.term, pa.ChunkedArray)
            else tb.term
        )
        kept_terms = terms.filter(pa.array(keep))
        offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(
            np.int32
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), kept_terms), " "
        )
        key = (_md5_terms(joined) >> np.uint64(4)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
                "dup_positions": pa.array(
                    np.bincount(win_row[dup], minlength=n_rows).astype(
                        np.int64
                    )
                ),
                "covered_tokens": pa.array(
                    np.bincount(
                        tb.row_index[covered], minlength=n_rows
                    ).astype(np.int64)
                ),
                "kept_tokens": pa.array(kept_counts),
                "scrub_key": pa.array(key),
            }
        )

    out = (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


# --- PII redaction + unicode canonicalization (writer stages) -----------
# The privacy-scrub and text-normalization passes pretraining pipelines
# run before hashing/dedup (same rule shapes as CCNet/Dolma-style
# cleaners). Both are stateless map_batches with RE2 kernels compiled
# once per pattern by Arrow; no shuffle, text never leaves the task.

_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"
_PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", _PII_EMAIL_RE, "<EMAIL>"),
    ("phone", _PII_PHONE_RE, "<PHONE>"),
    ("ip", _PII_IP_RE, "<IP>"),
)
_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"


def _pii_augmented(t: pa.Table) -> pa.Array:
    """documents.text plus ONE deterministic planted contact line per doc
    (derived from doc_id, replicated verbatim by the SQL oracle). The
    synthetic corpus carries no PII, so the redaction rules need planted
    matches to prove anything; production runs the same kernel without
    this stage."""
    ids = t["doc_id"].to_numpy()
    sid = pc.cast(t["doc_id"], pa.string())
    phone = pa.array(np.char.zfill((ids % 10000).astype(str), 4))
    ip = pa.array(
        np.char.add(
            np.char.add(
                np.char.add("10.", ((ids >> 16) & 255).astype(str)),
                np.char.add(".", ((ids >> 8) & 255).astype(str)),
            ),
            np.char.add(".", (ids & 255).astype(str)),
        )
    )
    col = t["text"]
    txt = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.binary_join_element_wise(
        txt, " Contact user", sid, "@example.com call +1-555-", phone,
        " from ", ip, ".", "",
    )


def pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction writer: replace emails / phone numbers / IPv4
    addresses with <EMAIL>/<PHONE>/<IP> placeholders and count matches
    per category. Counts are taken on the pre-scrub text (so categories
    are independent of application order); replacement is sequential in
    PII_RULES order. Proof = ``scrub_key`` (first 60 md5 bits of the
    scrubbed text), bit-identical to the DuckDB oracle's nested
    ``regexp_replace(..., 'g')`` chain — both engines are RE2, so the
    patterns mean the same thing on both sides.

    Scale shape: one streaming ``map_batches``; per-pattern RE2 automata
    are compiled once per batch by Arrow's kernel, matching is C-speed
    over the whole column; only (doc_id, 3 counts, key) leave the task.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        txt = _pii_augmented(t)
        out: dict = {"doc_id": t["doc_id"]}
        scrubbed = txt
        for name, rx, token in PII_RULES:
            out[f"n_{name}"] = pa.array(
                pc.count_substring_regex(txt, pattern=rx)
                .to_numpy(zero_copy_only=False).astype(np.int64)
            )
            scrubbed = pc.replace_substring_regex(
                scrubbed, pattern=rx, replacement=token
            )
        out["scrub_key"] = pa.array(
            (md5_u64_of_terms(scrubbed) >> np.uint64(4)).astype(np.int64)
        )
        return pa.table(out)

    return (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def unicode_clean(sf_dir: str) -> pd.DataFrame:
    """Unicode canonicalization writer: NFC-compose, strip C0/DEL
    control characters (keeping newline and tab), collapse space/tab
    runs to one space, trim leading/trailing spaces — so byte-different
    but render-identical documents hash identically in every downstream
    dedup stage. Proof = ``clean_key`` (60 md5 bits of the cleaned
    text) vs DuckDB ``nfc_normalize`` + the same RE2 chain.

    NFC goes through ``unicodedata.normalize`` per row ONLY for rows
    that are not pure ASCII (``pc.string_is_ascii`` fast path — NFC is
    the identity on ASCII, which dominates web corpora; this build's
    Arrow ``utf8_normalize`` does not compose combining sequences, so
    Python supplies the compose step). The regex passes are vectorized
    RE2. Each doc gets a deterministic planted mess (BEL control char,
    an ``é``, space/tab runs): the engine appends it pre-composed (so
    ASCII corpora keep the vectorized path) while the ORACLE plants the
    decomposed ``e`` + U+0301 via ``chr()`` arithmetic and normalizes —
    equality proves the NFC-compose contract end to end, and the plant
    starts with BEL (a starter) so NFC can't interact across the
    text/plant boundary.
    """
    import unicodedata

    ds = _docs(sf_dir, ["doc_id", "text"])

    def clean(t: pa.Table) -> pa.Table:
        sid = pc.cast(t["doc_id"], pa.string())
        col = t["text"]
        txt = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        # NFC only the non-ASCII RAW rows (scatter via replace_with_mask)
        # — on an ASCII-dominant corpus the whole batch stays vectorized.
        # The planted suffix is appended pre-composed: NFC(text || plant)
        # == NFC(text) || NFC(plant) because the plant starts with \x07,
        # a starter — no combining interaction at the boundary. The
        # ORACLE still plants the decomposed e+U+0301 and normalizes,
        # so the NFC-compose contract is proven end to end.
        non_ascii = pc.invert(pc.string_is_ascii(txt))
        if pc.any(non_ascii).as_py():
            miss = txt.filter(non_ascii).to_pylist()
            txt = pc.replace_with_mask(
                txt,
                non_ascii,
                pa.array(
                    [unicodedata.normalize("NFC", s) for s in miss],
                    pa.string(),
                ),
            )
        aug = pc.binary_join_element_wise(
            txt, "\x07 café  id ", sid, "\t\t end ", ""
        )
        n_ctrl = pc.count_substring_regex(aug, pattern=_CTRL_RE)
        s = pc.replace_substring_regex(aug, pattern=_CTRL_RE, replacement="")
        s = pc.replace_substring_regex(s, pattern=r"[ \t]+", replacement=" ")
        s = pc.replace_substring_regex(s, pattern=r"^ +| +$", replacement="")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ctrl": pa.array(
                    n_ctrl.to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "n_chars_clean": pa.array(
                    pc.utf8_length(s)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "clean_key": pa.array(
                    (md5_u64_of_terms(s) >> np.uint64(4)).astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(clean, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def line_dedup_scrub(sf_dir: str, min_count: int = 3) -> pd.DataFrame:
    """CCNet-style corpus-level LINE deduplication writer: hash every
    rendered line (the deterministic 7-token wrap, ``corpus.wrap_lines``),
    count occurrences ACROSS the whole corpus, remove every line whose
    corpus-wide count reaches ``min_count``, and rebuild each document
    from its surviving lines in original order — the line-hash dedup
    CCNet runs before LM filtering (boilerplate/navigation kill).

    Returns per doc: (doc_id, n_lines, removed_lines, kept_lines,
    scrub_key); scrub_key = first 60 bits of md5 of the kept lines
    joined by ``\\n``, bit-identical to the oracle's
    ``md5(string_agg(line, chr(10) ORDER BY pos))``.

    Scale shape (same argument as ``dup_span_scrub``): pass 1 ships only
    (line-md5, partial count) pairs through the hash exchange and keeps
    the >=min_count survivors — the heavy-hitter tail, broadcast-sized;
    pass 2 is one stateless streaming ``map_batches`` (searchsorted
    probe, Arrow list rebuild + ``binary_join``). Text never shuffles.

    The synthetic corpus has no naturally repeated cross-doc line at
    toy SF, so every doc with ``doc_id % 4 == 0`` deterministically
    appends one of three canonical "boilerplate" lines
    (``nav bar boilerplate {doc_id % 3}``) — replicated in the oracle —
    so the removal branch does real work.
    """
    from ..corpus import wrap_lines

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _lines_of(t: pa.Table):
        """(planted wrapped text array, list-of-lines array)."""
        wrapped = wrap_lines(t["text"])
        ids = (
            t["doc_id"].combine_chunks()
            if isinstance(t["doc_id"], pa.ChunkedArray)
            else t["doc_id"]
        ).to_numpy(zero_copy_only=False)
        tag = pa.array(
            np.char.add("nav bar boilerplate ", (ids % 3).astype(str))
        )
        planted = pc.binary_join_element_wise(wrapped, tag, "\n")
        mask = pa.array((ids % 4) == 0)
        wrapped = pc.if_else(mask, planted, wrapped)
        return pc.split_pattern(wrapped, "\n")

    def count_partial(t: pa.Table) -> pa.Table:
        vals = pc.list_flatten(_lines_of(t))
        h = md5_u64_of_terms(vals)
        u, c = np.unique(h, return_counts=True)
        return pa.table(
            {"lh": pa.array(u.view(np.int64)),
             "cnt": pa.array(c.astype(np.int64))}
        )

    def count_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["lh"], use_threads=False).aggregate(
            [("cnt", "sum")]
        )
        hot = pc.greater_equal(g["cnt_sum"], min_count)
        return pa.table({"lh": g["lh"].filter(hot)})

    drop_df = hash_exchange(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        key_fn=lambda t: t["lh"].to_numpy().view(np.uint64),
        reducer=count_reduce,
    )
    drop_sorted = (
        np.sort(drop_df["lh"].to_numpy().view(np.uint64))
        if len(drop_df)
        else np.empty(0, np.uint64)
    )
    drop_ref = ray.put(drop_sorted)

    def scrub(t: pa.Table) -> pa.Table:
        lines = _lines_of(t)
        vals = pc.list_flatten(lines)
        n_rows = t.num_rows
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        h = md5_u64_of_terms(vals)
        drop_set = ray.get(drop_ref)
        if len(drop_set) and len(h):
            pos = np.clip(np.searchsorted(drop_set, h), 0, len(drop_set) - 1)
            dropped = drop_set[pos] == h
        else:
            dropped = np.zeros(len(h), bool)
        keep = ~dropped
        kept_counts = np.bincount(
            parents[keep], minlength=n_rows
        ).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(
            np.int32
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets), vals.filter(pa.array(keep))
            ),
            "\n",
        )
        key = (md5_u64_of_terms(joined) >> np.uint64(4)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_lines": pa.array(n_lines.astype(np.int64)),
                "removed_lines": pa.array(
                    np.bincount(
                        parents[dropped], minlength=n_rows
                    ).astype(np.int64)
                ),
                "kept_lines": pa.array(kept_counts),
                "scrub_key": pa.array(key),
            }
        )

    return (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ----------------------------------------------------------- dsir_weights


def dsir_weights(
    sf_dir: str, n_buckets: int = 4096, target_lang: str = "en"
) -> pd.DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hashed n-gram features (unigrams + bigrams -> md5 bucket), a
    bag-of-buckets model of the TARGET domain (here: ``lang ==
    target_lang`` documents) vs the RAW corpus, and per-doc

        log w(x) = sum over gram occurrences of
                   ln p_target(bucket) - ln p_raw(bucket)

    with add-1 smoothing over ``n_buckets`` buckets. Docs that look like
    the target domain get high weights; resampling by w concentrates a
    pretraining mixture on the target distribution.

    Exact-integer contract (same device as ``unigram_logprob``): the
    per-bucket log-ratio is floored to micro-nats on the driver
    (``lam_e6``, libm ln == DuckDB ln bit-for-bit), so the per-doc sum
    ``dsir_e6`` is an exact BIGINT on both the Ray and SQL sides.

    Shape: pass 1 ships only per-batch (bucket, tgt, raw) count partials
    over the bucket-keyed hash exchange (B = n_buckets rows total after
    reduction); the dense lam_e6 vector (B * 8 bytes) is broadcast once
    via ``ray.put``; pass 2 is one stateless streaming scoring pass
    (searchsorted-free: direct ``lam[bucket]`` gather + ``np.add.at``).
    Space-split + md5 semantics match the SQL oracle exactly.
    """
    import math

    B = int(n_buckets)
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def gram_buckets(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, batch_row) per gram occurrence — unigrams then
        bigrams, both bucketed by md5-u64 % B (the SQL-replicable
        hash), doc boundaries masked via the list offsets."""
        la = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = la.offsets.to_numpy(zero_copy_only=False)
        vals = la.values
        n = len(vals)
        doc_of = np.repeat(
            np.arange(len(la), dtype=np.int64), np.diff(offs)
        )
        uni_b = (md5_u64_of_terms(vals) % np.uint64(B)).astype(np.int64)
        if n >= 2:
            same = doc_of[:-1] == doc_of[1:]
            sel = pa.array(same)
            bg = pc.binary_join_element_wise(
                vals.slice(0, n - 1).filter(sel),
                vals.slice(1, n - 1).filter(sel),
                " ",
            )
            bg_b = (md5_u64_of_terms(bg) % np.uint64(B)).astype(np.int64)
            bg_doc = doc_of[:-1][same]
        else:
            bg_b = np.array([], np.int64)
            bg_doc = np.array([], np.int64)
        return (
            np.concatenate([uni_b, bg_b]),
            np.concatenate([doc_of, bg_doc]),
        )

    def count_partial(t: pa.Table) -> pa.Table:
        bucket, rows = gram_buckets(t)
        is_tgt = pc.equal(
            t["lang"].combine_chunks(), target_lang
        ).to_numpy(zero_copy_only=False)
        raw = np.bincount(bucket, minlength=B)
        tgt = np.bincount(bucket[is_tgt[rows]], minlength=B)
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "tgt": pa.array(tgt[nz], pa.int64()),
                "raw": pa.array(raw[nz], pa.int64()),
            }
        )

    def count_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["bucket"], use_threads=False).aggregate(
            [("tgt", "sum"), ("raw", "sum")]
        )
        return pa.table(
            {
                "bucket": g["bucket"],
                "tgt": g["tgt_sum"].cast(pa.int64()),
                "raw": g["raw_sum"].cast(pa.int64()),
            }
        )

    cnt = hash_exchange(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        key_fn=lambda t: t["bucket"].to_numpy().astype(np.uint64),
        reducer=count_reduce,
    )
    tgt = np.zeros(B, np.int64)
    raw = np.zeros(B, np.int64)
    if not cnt.empty:
        bk = cnt["bucket"].to_numpy(dtype=np.int64)
        tgt[bk] = cnt["tgt"].to_numpy(dtype=np.int64)
        raw[bk] = cnt["raw"].to_numpy(dtype=np.int64)
    t_den = int(tgt.sum()) + B
    r_den = int(raw.sum()) + B
    # libm ln / IEEE divide+subtract+floor, replicated verbatim in SQL
    lam = np.fromiter(
        (
            math.floor(
                (
                    math.log((int(ct) + 1) / t_den)
                    - math.log((int(cr) + 1) / r_den)
                )
                * 1e6
            )
            for ct, cr in zip(tgt, raw)
        ),
        dtype=np.int64,
        count=B,
    )
    ref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        bucket, rows = gram_buckets(t)
        lam_ = ray.get(ref)
        n = t.num_rows
        w = np.zeros(n, np.int64)
        ng = np.zeros(n, np.int64)
        np.add.at(w, rows, lam_[bucket])
        np.add.at(ng, rows, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(ng),
                "dsir_e6": pa.array(w),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
