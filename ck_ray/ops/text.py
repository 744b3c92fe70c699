"""Text-analysis operators over a documents table (training-data pipeline).

All are vectorized ``map_batches`` stages over Arrow batches using the
same tokenizer kernel as the index (``ck_ray.tokenizer``), with batch-level
partial aggregation ahead of any groupby so the shuffle moves term partials,
not raw tokens.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..scoring import round_half_away
from ..tokenizer import term_frequencies, tokenize_array

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def term_df_top(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """(term, df, cf) over documents.text — the index's stats table.

    Partial (term, df, cf) per batch -> small groupby(term) -> top_n by
    (df desc, term asc)."""
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        tf_t, _ = term_frequencies(t["text"], with_positions=False)
        g = pa.TableGroupBy(tf_t, ["term"], use_threads=False).aggregate(
            [("row", "count_distinct"), ("tf", "sum")]
        )
        return pa.table(
            {"term": g["term"], "df": g["row_count_distinct"], "cf": g["tf_sum"]}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
        .to_pandas()
    )
    out["df"] = out["df"].astype("int64")
    out["cf"] = out["cf"].astype("int64")
    out = out.sort_values(["df", "term"], ascending=[False, True]).head(top_n)
    return out.reset_index(drop=True)


def corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Global aggregate: n_docs, total_tokens, avg_tokens, avg_chars."""
    ds = _docs(sf_dir, ["text"])

    def per_doc(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        return pa.table(
            {
                "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
                "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        )

    agg = ds.map_batches(per_doc, batch_format="pyarrow").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Mean("n_tokens", alias_name="avg_tokens"),
        Mean("n_chars", alias_name="avg_chars"),
    )
    return pd.DataFrame(
        {
            "n_docs": [int(agg["n_docs"])],
            "total_tokens": [int(agg["total_tokens"])],
            "avg_tokens": [round(float(agg["avg_tokens"]), 4)],
            "avg_chars": [round(float(agg["avg_chars"]), 4)],
        }
    )


def token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-doc token count (whitespace/punct tokenizer) — full table."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def per_doc(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def quality_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality signals: chars, tokens, stopword ratio, mean token
    length — the length/punct/stopword scoring family."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    stop = pa.array(sorted(STOPWORDS))

    def per_doc(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = t.num_rows
        n_tok = tb.doc_len.astype(np.int64)
        is_stop = pc.is_in(tb.term, value_set=stop).to_numpy(zero_copy_only=False)
        stop_per_doc = np.bincount(
            tb.row_index, weights=is_stop.astype(np.float64), minlength=n
        )
        tok_bytes = pc.binary_length(tb.term).to_numpy(zero_copy_only=False)
        bytes_per_doc = np.bincount(
            tb.row_index, weights=tok_bytes.astype(np.float64), minlength=n
        )
        # exact integer signals (ratios are derivable; integers survive the
        # driver's value-hash compare with no rounding hazards)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
                "n_tokens": pa.array(n_tok),
                "n_stopwords": pa.array(stop_per_doc.astype(np.int64)),
                "token_bytes": pa.array(bytes_per_doc.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# deterministic per-language marker profiles for the n-gram heuristic
_LANG_MARKERS = {
    "en": STOPWORDS,
    "fr": ("le", "la", "et", "de", "un"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "y", "de", "que"),
    "zh": ("de", "le", "shi"),
}


class LangIdHeuristic:
    """Actor-pool language-ID stage: marker tables built once per actor.

    (The corpus's ``lang`` column is ground truth; this scores a simple
    stopword-profile guess against it — the shape of a fasttext-style
    stage with the model swapped for a deterministic heuristic.)"""

    def __init__(self):
        self.profiles = {
            lang: frozenset(words) for lang, words in _LANG_MARKERS.items()
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = t.num_rows
        scores = np.zeros((len(self.profiles), n))
        terms = tb.term.to_numpy(zero_copy_only=False)
        for i, (lang, prof) in enumerate(sorted(self.profiles.items())):
            hit = np.isin(terms, list(prof))
            scores[i] = np.bincount(tb.row_index, weights=hit, minlength=n)
        langs = np.array(sorted(self.profiles), dtype=object)
        guess = langs[np.argmax(scores, axis=0)]
        guess[scores.max(axis=0) == 0] = "und"  # object dtype: no U2 clip
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_true": t["lang"],
                "lang_guess": pa.array(guess.tolist(), pa.string()),
            }
        )


def langid(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    return (
        ds.map_batches(LangIdHeuristic, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_FP_PRIME = np.uint64(1099511628211)  # FNV prime as the window multiplier


def fingerprints(sf_dir: str, window: int = 8) -> pd.DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): min over the
    doc's token ``w``-gram windows of ``sum_j tok_h[i+j] * P^j mod 2^64``
    with ``w = min(window, n_tokens)``; token hash = first 4 md5 bytes
    (32-bit, so the DuckDB oracle's HUGEINT products stay in range) —
    recomputed bit-identically in SQL. Fully vectorized ragged-window
    kernel (the r1 per-doc Python loop is gone); docs with n < window
    fall to a tiny residual loop (one whole-doc window each)."""
    from ..ids import md5_u64_of_terms

    ds = _docs(sf_dir, ["doc_id", "text"])
    powers = np.empty(window, dtype=np.uint64)
    p = 1
    for j in range(window):  # python-int mod avoids numpy overflow warnings
        powers[j] = p
        p = (p * int(_FP_PRIME)) % (1 << 64)

    def per_doc(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        th = md5_u64_of_terms(tb.term) >> np.uint64(32)  # first 4 md5 bytes
        n = t.num_rows
        counts = np.bincount(tb.row_index, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)))
        fp = np.zeros(n, dtype=np.uint64)
        long = counts >= window
        if long.any():
            valid_len = (counts[long] - window + 1).astype(np.int64)
            total = int(valid_len.sum())
            win_ord = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(valid_len)[:-1])), valid_len
            )
            base = np.repeat(starts[:-1][long], valid_len) + win_ord
            acc = np.zeros(total, dtype=np.uint64)
            for j in range(window):  # window is small; passes vectorized
                acc += th[base + j] * powers[j]
            seg = np.concatenate(([0], np.cumsum(valid_len)[:-1]))
            fp[long] = np.minimum.reduceat(acc, seg)
        for d in np.nonzero((counts > 0) & ~long)[0]:  # rare short docs
            hs = th[starts[d] : starts[d + 1]]
            fp[d] = (hs * powers[: len(hs)]).sum(dtype=np.uint64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(
                    (fp & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def lang_source_counts(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .groupby(["lang", "source"])
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .to_pandas()
    )
    for c in ("n_docs", "sum_chars", "min_chars", "max_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def bigram_counts(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Top-N word bigrams: (bigram, cf, df) — the n-gram LM / benchmark-
    contamination statistic of a training-data pipeline.

    Vectorized per batch: one split over the whole column, adjacent-token
    join on the flat values buffer (masking doc boundaries via the list
    offsets), then a per-batch groupby partial. Each doc lives in exactly
    one batch row, so per-batch distinct-doc counts SUM exactly to the
    global df — the shuffle moves (bigram, cf, df) partials, never
    tokens. Space-split semantics match the SQL oracle's
    ``string_split(text, ' ')`` exactly (empty tokens included).

    The partials ride the hash exchange keyed by fnv64(bigram): every
    bigram's total lands in exactly ONE partition, so the per-partition
    reducer's top-N is exact and the driver merges only P*N candidate
    rows — no global sort-based groupby over the (huge) bigram
    vocabulary."""
    from ..exchange import hash_exchange
    from ..ids import term_hash

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        la = pc.split_pattern(t["text"].combine_chunks(), " ")
        offs = la.offsets.to_numpy(zero_copy_only=False)
        vals = la.values
        n = len(vals)
        if n < 2:
            return pa.table({
                "bigram": pa.array([], pa.string()),
                "cf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        doc_of = np.repeat(
            np.arange(len(la), dtype=np.int64), np.diff(offs)
        )
        same = pa.array(doc_of[:-1] == doc_of[1:])
        left = vals.slice(0, n - 1).filter(same)
        right = vals.slice(1, n - 1).filter(same)
        bg = pc.binary_join_element_wise(left, right, " ")
        docs = t["doc_id"].combine_chunks().take(
            pa.array(doc_of[:-1][doc_of[:-1] == doc_of[1:]], pa.int64())
        )
        g = pa.TableGroupBy(
            pa.table({"bigram": bg, "doc": docs}), ["bigram"],
            use_threads=False,
        ).aggregate([("doc", "count"), ("doc", "count_distinct")])
        return pa.table({
            "bigram": g["bigram"],
            "cf": g["doc_count"].cast(pa.int64()),
            "df": g["doc_count_distinct"].cast(pa.int64()),
        })

    def reduce_part(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["bigram"], use_threads=False).aggregate(
            [("cf", "sum"), ("df", "sum")]
        )
        g = pa.table({
            "bigram": g["bigram"],
            "cf": g["cf_sum"].cast(pa.int64()),
            "df": g["df_sum"].cast(pa.int64()),
        })
        idx = pc.sort_indices(
            g, sort_keys=[("cf", "descending"), ("bigram", "ascending")]
        )
        return g.take(idx.slice(0, top_n))

    out = hash_exchange(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["bigram"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=reduce_part,
    )
    if out.empty:
        return pd.DataFrame(
            {"bigram": pd.Series([], dtype=str),
             "cf": pd.Series([], dtype="int64"),
             "df": pd.Series([], dtype="int64")}
        )
    out["cf"] = out["cf"].astype("int64")
    out["df"] = out["df"].astype("int64")
    out = out.sort_values(["cf", "bigram"], ascending=[False, True]).head(top_n)
    return out.reset_index(drop=True)


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Per-doc repetition signals (the Gopher-rule family): count of the
    most frequent token, count of the most frequent word bigram, and the
    number of trigram positions whose trigram occurs >= 2 times within
    the document — the "fraction of characters in duplicated n-grams"
    filters every pretraining pipeline applies.

    All integers (ratios are derivable downstream; integers survive the
    driver's value-hash compare exactly). Fully map-side: every document
    lives in one batch row, so the statistics are per-row local — one
    streaming ``map_batches`` pass, no shuffle at any scale.
    Vectorized: one tokenizer pass, adjacent-token joins on the flat
    token stream (bigram/trigram), ``TableGroupBy`` for the in-doc
    counts, segmented max/sum via ``np.maximum.at``/``np.add.at``.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _top_count_per_row(rows: np.ndarray, grams, n_rows: int) -> np.ndarray:
        """max over (row, gram) group sizes, per row; 0 when no grams."""
        if len(rows) == 0:
            return np.zeros(n_rows, np.int64)
        g = pa.TableGroupBy(
            pa.table({"row": pa.array(rows), "g": grams}),
            ["row", "g"],
            use_threads=False,
        ).aggregate([("g", "count")])
        out = np.zeros(n_rows, np.int64)
        np.maximum.at(
            out,
            g["row"].to_numpy(),
            g["g_count"].to_numpy().astype(np.int64),
        )
        return out

    def per_doc(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = t.num_rows
        terms = tb.term.combine_chunks() if isinstance(
            tb.term, pa.ChunkedArray
        ) else tb.term
        rows = tb.row_index
        top_word = _top_count_per_row(rows, terms, n)

        nt = len(rows)
        # adjacent kept tokens within the same row -> bigrams/trigrams
        if nt >= 2:
            same2 = rows[:-1] == rows[1:]
            bg = pc.binary_join_element_wise(
                terms.slice(0, nt - 1).filter(pa.array(same2)),
                terms.slice(1, nt - 1).filter(pa.array(same2)),
                " ",
            )
            top_bigram = _top_count_per_row(rows[:-1][same2], bg, n)
        else:
            top_bigram = np.zeros(n, np.int64)

        dup_tri = np.zeros(n, np.int64)
        if nt >= 3:
            same3 = (rows[:-2] == rows[1:-1]) & (rows[:-2] == rows[2:])
            tg = pc.binary_join_element_wise(
                terms.slice(0, nt - 2).filter(pa.array(same3)),
                terms.slice(1, nt - 2).filter(pa.array(same3)),
                terms.slice(2, nt - 2).filter(pa.array(same3)),
                " ",
            )
            trows = rows[:-2][same3]
            if len(trows):
                g = pa.TableGroupBy(
                    pa.table({"row": pa.array(trows), "g": tg}),
                    ["row", "g"],
                    use_threads=False,
                ).aggregate([("g", "count")])
                cnt = g["g_count"].to_numpy().astype(np.int64)
                dup = cnt >= 2
                np.add.at(dup_tri, g["row"].to_numpy()[dup], cnt[dup])

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(tb.doc_len.astype(np.int64)),
                "top_word_count": pa.array(top_word),
                "top_bigram_count": pa.array(top_bigram),
                "dup_trigram_positions": pa.array(dup_tri),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-doc top-``k`` terms by tf-idf (idf = ln(N / df), the plain
    textbook form), deterministic tie-break (score desc, term asc) —
    the keyword-extraction / relevance-feature operator.

    Two passes, both map-side partial first:
    1. global df: per-batch distinct (term, doc) counts (each doc lives
       in one batch, so per-batch ``count_distinct`` partials SUM to the
       exact global df) ride the hash exchange keyed by term — only
       (term, df) partials shuffle. The resulting vocabulary table is
       broadcast once via ``ray.put`` (sorted term array + df array;
       searchsorted probe). At 100 TB vocabulary scale the broadcast
       becomes a semi-join through the same exchange — the scoring pass
       keys by term instead of probing.
    2. scoring: per-batch tf via ``TableGroupBy``, vectorized df probe,
       one lexsort + run-start subtraction for the per-doc top-k (the
       ``_quota_over`` segmented-rank kernel — no per-group Python).
    """
    from ..exchange import hash_exchange
    from ..ids import term_hash

    ds = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        g = pa.TableGroupBy(
            pa.table({"term": tb.term, "row": pa.array(tb.row_index)}),
            ["term"],
            use_threads=False,
        ).aggregate([("row", "count_distinct")])
        return pa.table(
            {"term": g["term"], "df": g["row_count_distinct"].cast(pa.int64())}
        )

    def df_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["term"], use_threads=False).aggregate(
            [("df", "sum")]
        )
        return pa.table(
            {"term": g["term"], "df": g["df_sum"].cast(pa.int64())}
        )

    dfs = hash_exchange(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["term"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=df_reduce,
    )
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    if dfs.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype=str),
                "tf": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    srt = dfs.sort_values("term").reset_index(drop=True)
    vocab_arr = pa.array(srt["term"], pa.string())  # sorted lexicographic
    df_of = srt["df"].to_numpy(np.int64)
    vocab_ref = ray.put((vocab_arr, df_of, int(n_docs)))

    def score(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        g = pa.TableGroupBy(
            pa.table({"row": pa.array(tb.row_index), "term": tb.term}),
            ["row", "term"],
            use_threads=False,
        ).aggregate([("term", "count")])
        rows = g["row"].to_numpy()
        tf = g["term_count"].to_numpy().astype(np.int64)
        voc, dfo, nn = ray.get(vocab_ref)
        # every term in a doc is in the global vocabulary; the vocab is
        # sorted, so the index doubles as the lexicographic tiebreak key
        pos = pc.index_in(g["term"], value_set=voc).to_numpy(
            zero_copy_only=False
        )
        dfv = dfo[pos]
        sc = tf * np.log(nn / dfv)
        # top-k per row: lexsort (term asc within equal -score) + run ranks
        order = np.lexsort((pos, -sc, rows))
        r2 = rows[order]
        run_start = np.nonzero(
            np.concatenate(([True], r2[1:] != r2[:-1]))
        )[0]
        posr = np.arange(len(r2)) - np.repeat(
            run_start, np.diff(np.concatenate((run_start, [len(r2)])))
        )
        keep = posr < k
        sel = order[keep]
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids[rows[sel]]),
                "rank": pa.array((posr[keep] + 1).astype(np.int64)),
                "term": voc.take(pa.array(pos[sel])),
                "tf": pa.array(tf[sel]),
                "df": pa.array(dfv[sel]),
                "score": pa.array(round_half_away(sc[sel])),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    return out


def _unigram_nll_ds(sf_dir: str, extra_cols: tuple = ()):
    """Scored Dataset of (doc_id, *extra_cols, n_tokens, nll_e6) under
    the corpus unigram LM, or None when the corpus has zero tokens —
    the shared engine of ``unigram_logprob`` and ``ccnet_buckets``.
    See ``unigram_logprob`` for the exact-integer contract."""
    import math

    from ..exchange import hash_exchange
    from ..ids import term_hash

    ds = _docs(sf_dir, ["doc_id", "text", *extra_cols])

    def cf_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        g = pa.TableGroupBy(
            pa.table({"term": tb.term}), ["term"], use_threads=False
        ).aggregate([([], "count_all")])
        return pa.table(
            {"term": g["term"], "cf": g["count_all"].cast(pa.int64())}
        )

    def cf_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["term"], use_threads=False).aggregate(
            [("cf", "sum")]
        )
        return pa.table(
            {"term": g["term"], "cf": g["cf_sum"].cast(pa.int64())}
        )

    cfs = hash_exchange(
        ds.map_batches(cf_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["term"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=cf_reduce,
    )
    if cfs.empty:
        return None  # zero-token corpus; callers emit the all-zero rows
    total = int(cfs["cf"].sum())
    # libm log on the vocabulary-sized table (matches DuckDB ln exactly)
    lp_e6 = np.array(
        [
            math.floor(math.log(c / total) * 1_000_000)
            for c in cfs["cf"].to_numpy(np.int64)
        ],
        dtype=np.int64,
    )
    ref = ray.put((pa.array(cfs["term"], pa.string()), lp_e6))

    def score(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        n = t.num_rows
        voc, lp = ray.get(ref)
        nll = np.zeros(n, np.int64)
        if len(tb.row_index):
            # every corpus token is in the vocabulary by construction
            pos = pc.index_in(tb.term, value_set=voc).to_numpy(
                zero_copy_only=False
            )
            np.add.at(nll, tb.row_index, -lp[pos])
        cols = {"doc_id": t["doc_id"]}
        for c in extra_cols:
            cols[c] = t[c]
        cols["n_tokens"] = pa.array(tb.doc_len.astype(np.int64))
        cols["nll_e6"] = pa.array(nll)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM quality score per doc: the corpus-trained language-
    model surprisal filter (docs whose tokens are improbable under the
    corpus unigram distribution are boilerplate/noise candidates).

    nll_e6 = -sum over token occurrences of floor(ln(cf/T) * 1e6) —
    per-term log-probs are floored to integer micro-nats BEFORE the
    per-doc sum, so the document score is an exact BIGINT on both the
    Ray and SQL sides (no float-summation-order hazard; floor, unlike
    round, has no tie rule to disagree on). The ln itself is computed
    with libm (``math.log``) on the vocabulary-sized driver table,
    matching DuckDB's ``ln`` bit-for-bit.

    Shape: per-batch (term, count) partials ride the term-keyed hash
    exchange (only partials shuffle); the (term, lp_e6) vocabulary is
    broadcast once; scoring is one stateless streaming pass with a
    searchsorted probe + integer ``np.add.at`` per-doc sum.
    """
    d = _unigram_nll_ds(sf_dir)
    if d is None:
        # zero-token corpus: still one row per doc (the SQL LEFT JOIN
        # emits every document with n_tokens = 0, nll_e6 = 0)
        ids = _docs(sf_dir, ["doc_id"]).to_pandas().sort_values("doc_id")
        return pd.DataFrame(
            {
                "doc_id": ids["doc_id"].to_numpy(np.int64),
                "n_tokens": np.zeros(len(ids), np.int64),
                "nll_e6": np.zeros(len(ids), np.int64),
            }
        )
    return (
        d.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def bigram_pmi(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Collocation extraction: pointwise mutual information over adjacent
    token bigrams — PMI(a,b) = ln( (cf_ab / B) / ((cf_a/T) * (cf_b/T)) )
    with T = total tokens, B = total bigram positions. High-PMI pairs
    are multiword expressions; the standard phrase-mining signal for
    tokenizer/vocab construction over a training corpus.

    Exactness contract: the per-bigram PMI is ONE closed-form libm
    expression evaluated on the driver for the top-N rows only and
    floored to integer micro-nats (pmi_e6) — no float summation anywhere,
    so the BIGINT matches DuckDB's identical expression bit-for-bit.

    Shape: one tokenizer pass emits per-batch bigram-count partials AND
    (term, cf) / (T, B) partials; bigram totals ride the hash exchange
    keyed by fnv64(bigram) (each bigram lands in exactly one partition,
    so per-partition top-N by cf is exact and the driver merges P*N
    candidate rows). The unigram cf table is collected on the driver —
    only the <= 2*top_n terms inside winning bigrams are probed; at
    100 TB vocabulary scale that probe becomes a semi-join through the
    same exchange.
    """
    import math

    from ..exchange import hash_exchange
    from ..ids import term_hash

    ds = _docs(sf_dir, ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        nt = len(tb.row_index)
        if nt < 2:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "cf": pa.array([], pa.int64()),
                }
            )
        terms = (
            tb.term.combine_chunks()
            if isinstance(tb.term, pa.ChunkedArray)
            else tb.term
        )
        same = tb.row_index[:-1] == tb.row_index[1:]
        bg = pc.binary_join_element_wise(
            terms.slice(0, nt - 1).filter(pa.array(same)),
            terms.slice(1, nt - 1).filter(pa.array(same)),
            " ",
        )
        g = pa.TableGroupBy(
            pa.table({"bigram": bg}), ["bigram"], use_threads=False
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "bigram": g["bigram"],
                "cf": g["count_all"].cast(pa.int64()),
            }
        )

    def bigram_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["bigram"], use_threads=False).aggregate(
            [("cf", "sum")]
        )
        g = pa.table(
            {"bigram": g["bigram"], "cf": g["cf_sum"].cast(pa.int64())}
        )
        idx = pc.sort_indices(
            g, sort_keys=[("cf", "descending"), ("bigram", "ascending")]
        )
        return g.take(idx.slice(0, top_n))

    top = hash_exchange(
        ds.map_batches(bigram_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["bigram"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=bigram_reduce,
    )
    empty = pd.DataFrame(
        {
            "bigram": pd.Series([], dtype=str),
            "cf": pd.Series([], dtype="int64"),
            "pmi_e6": pd.Series([], dtype="int64"),
        }
    )
    if top.empty:
        return empty

    # unigram cf + totals (same partial-then-sum shape as unigram_logprob)
    def cf_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        g = pa.TableGroupBy(
            pa.table({"term": tb.term}), ["term"], use_threads=False
        ).aggregate([([], "count_all")])
        dl = tb.doc_len.astype(np.int64)
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [g["term"].combine_chunks(), pa.array(["#T#", "#B#"])]
                ),
                "cf": pa.concat_arrays(
                    [
                        g["count_all"].cast(pa.int64()).combine_chunks(),
                        pa.array(
                            [int(dl.sum()), int(np.maximum(dl - 1, 0).sum())],
                            pa.int64(),
                        ),
                    ]
                ),
            }
        )

    cfs = (
        ds.map_batches(cf_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("term", as_index=False)["cf"]
        .sum()
    )
    cf_map = dict(zip(cfs["term"], cfs["cf"].astype(int)))
    # "#" never appears in tokenizer output, so the sentinel rows
    # cannot collide with a real term
    T = cf_map.pop("#T#", 0)
    B = cf_map.pop("#B#", 0)
    if B == 0:
        return empty

    out = top.sort_values(
        ["cf", "bigram"], ascending=[False, True]
    ).head(top_n).reset_index(drop=True)
    out["cf"] = out["cf"].astype("int64")
    pmi = []
    for bgm, cf_ab in zip(out["bigram"], out["cf"]):
        a, b = bgm.split(" ", 1)
        val = (cf_ab / B) / ((cf_map[a] / T) * (cf_map[b] / T))
        pmi.append(math.floor(math.log(val) * 1_000_000))
    out["pmi_e6"] = pd.Series(pmi, dtype="int64")
    return out[["bigram", "cf", "pmi_e6"]]


def kn_bigram_logprob(sf_dir: str, discount: float = 0.75) -> pd.DataFrame:
    """Per-doc negative log-likelihood under an interpolated Kneser-Ney
    BIGRAM language model trained on the corpus itself — the classic
    KenLM-style perplexity filter (CCNet / Gopher pipelines score docs
    with exactly this model family; ``ccnet_buckets`` buckets the
    unigram variant, this is the order-2 upgrade):

        P(b|a) = max(c(a,b) - D, 0)/c(a) + D * N1+(a,*)/c(a) * Pcont(b)
        Pcont(b) = N1+(*,b) / N1+(*,*)        (continuation probability)

    with discount D = 0.75 (Chen & Goodman's fixed-discount KN). The
    model is self-trained, so every scored bigram is in the count table
    (no OOV path). Adjacency = consecutive KEPT tokens (same convention
    as the phrase oracles' contiguous position numbering).

    Exactness contract (same as ``unigram_logprob``): per bigram TYPE
    the log-prob is ONE closed-form libm expression over integer counts,
    floored to integer micro-nats BEFORE the per-doc sum — nll_e6 and
    n_bigrams are exact BIGINTs on both the Ray and SQL sides.

    Shape: per-batch bigram-count partials ride the bigram-keyed hash
    exchange (only (string, int) partials shuffle); the bigram-type
    table with its KN statistics is computed once and broadcast via
    ``ray.put``; scoring is one stateless streaming pass (index_in probe
    + integer ``np.add.at``). The driver-side type table is the same
    trade ``unigram_logprob`` makes — at 100 TB bigram-type scale the
    KN statistics become two more exchange legs (context-keyed for
    c(a)/N1+(a,*), successor-keyed for N1+(*,b)) and the scoring probe
    a hash-partitioned semi-join against the lp table.
    """
    import math

    from ..exchange import hash_exchange
    from ..ids import term_hash

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _doc_bigrams(t: pa.Table):
        """(joined 'a b' bigram array, per-bigram row index) or None."""
        tb = tokenize_array(t["text"])
        nt = len(tb.row_index)
        if nt < 2:
            return None, None
        terms = (
            tb.term.combine_chunks()
            if isinstance(tb.term, pa.ChunkedArray)
            else tb.term
        )
        same = tb.row_index[:-1] == tb.row_index[1:]
        if not same.any():
            return None, None
        m = pa.array(same)
        bg = pc.binary_join_element_wise(
            terms.slice(0, nt - 1).filter(m),
            terms.slice(1, nt - 1).filter(m),
            " ",
        )
        return bg, tb.row_index[:-1][same]

    def bg_partial(t: pa.Table) -> pa.Table:
        bg, _ = _doc_bigrams(t)
        if bg is None:
            return pa.table(
                {
                    "bg": pa.array([], pa.string()),
                    "cab": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            pa.table({"bg": bg}), ["bg"], use_threads=False
        ).aggregate([([], "count_all")])
        return pa.table(
            {"bg": g["bg"], "cab": g["count_all"].cast(pa.int64())}
        )

    def bg_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["bg"], use_threads=False).aggregate(
            [("cab", "sum")]
        )
        return pa.table(
            {"bg": g["bg"], "cab": g["cab_sum"].cast(pa.int64())}
        )

    bgs = hash_exchange(
        ds.map_batches(bg_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["bg"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=bg_reduce,
    )
    if bgs.empty:
        ids = _docs(sf_dir, ["doc_id"]).to_pandas().sort_values("doc_id")
        return pd.DataFrame(
            {
                "doc_id": ids["doc_id"].to_numpy(np.int64),
                "n_bigrams": np.zeros(len(ids), np.int64),
                "nll_e6": np.zeros(len(ids), np.int64),
            }
        )
    # KN statistics over the bigram-type table (driver-sized; see shape
    # note above), then ONE libm expression per type -> integer micro-nats
    parts = bgs["bg"].str.split(" ", n=1, expand=True)
    a_s, b_s = parts[0], parts[1]
    cab = bgs["cab"].to_numpy(np.int64)
    ca_map = bgs.groupby(a_s)["cab"].sum()
    n1a_map = a_s.value_counts()  # N1+(a,*): distinct successors
    n1b_map = b_s.value_counts()  # N1+(*,b): distinct predecessors
    n1_all = len(bgs)  # N1+(*,*): distinct bigram types
    ca = ca_map[a_s].to_numpy(np.int64)
    n1a = n1a_map[a_s].to_numpy(np.int64)
    n1b = n1b_map[b_s].to_numpy(np.int64)
    D = float(discount)
    lp_e6 = np.fromiter(
        (
            math.floor(
                math.log(
                    (max(c_ab - D, 0.0) + D * n1_a * (n1_b / n1_all))
                    / c_a
                )
                * 1_000_000
            )
            for c_ab, c_a, n1_a, n1_b in zip(cab, ca, n1a, n1b)
        ),
        dtype=np.int64,
        count=len(cab),
    )
    ref = ray.put((pa.array(bgs["bg"], pa.string()), lp_e6))

    def score(t: pa.Table) -> pa.Table:
        bg, ri = _doc_bigrams(t)
        n = t.num_rows
        nll = np.zeros(n, np.int64)
        nbg = np.zeros(n, np.int64)
        if bg is not None:
            voc, lp = ray.get(ref)
            pos = pc.index_in(bg, value_set=voc).to_numpy(
                zero_copy_only=False
            )
            np.add.at(nll, ri, -lp[pos])
            nbg = np.bincount(ri, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(nbg),
                "nll_e6": pa.array(nll),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def approx_distinct_terms(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Approximate distinct-term count per language (plus a merged ``*``
    corpus row) via a HyperLogLog sketch — the cardinality estimator a
    100 TB pipeline uses where an exact ``count(DISTINCT term)`` would
    be a full term shuffle.

    Sketch math (p=12, m=4096 registers): token hash = md5-u64 (the
    SQL-replicable hash); register j = top 12 bits; rho = leading-zero
    rank of the low 52 bits (1..53). All register state is integer; the
    per-batch partial is a (lang, j, max rho) table of <= langs x 4096
    rows, so ONLY sketch partials ride the exchange — the corpus-sized
    token stream never shuffles, which is the whole point of the sketch
    at scale. The global row is an elementwise register max (HLL merge).

    The estimate itself is made SQL-exact the same way bigram_pmi's PMI
    is: S = sum_j 2^(-M_j) is carried as the exact integer
    S2 = sum_j 2^(53 - M_j) (HUGEINT in the oracle, Python int here),
    and the HLL / linear-counting estimate is ONE closed-form double
    expression over (S2, V) evaluated identically on both sides, floored
    to integer micro-counts (approx_distinct_e6). Standard HLL small-
    range correction: raw <= 2.5m with empty registers falls back to
    linear counting m*ln(m/V).

    rho's bit-length is computed with ``np.frexp`` — exact because the
    52-bit remainder is always < 2^53 (the double mantissa).
    """
    import math

    from ..exchange import hash_exchange
    from ..ids import md5_u64_of_terms, term_hash

    P, M = p, 1 << p
    ds = _docs(sf_dir, ["text", "lang"])

    def reg_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        lang = t["lang"].combine_chunks().fill_null("").to_numpy(
            zero_copy_only=False
        )[tb.row_index]
        h = md5_u64_of_terms(tb.term)
        j = (h >> np.uint64(64 - P)).astype(np.int64)
        w = h & np.uint64((1 << (64 - P)) - 1)
        rho = ((64 - P) + 1 - np.frexp(w.astype(np.float64))[1]).astype(
            np.int64
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "lang": pa.array(lang, pa.string()),
                    "j": pa.array(j),
                    "rho": pa.array(rho),
                }
            ),
            ["lang", "j"],
            use_threads=False,
        ).aggregate([("rho", "max")])
        return pa.table(
            {"lang": g["lang"], "j": g["j"], "rho": g["rho_max"]}
        )

    def reg_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["lang", "j"], use_threads=False).aggregate(
            [("rho", "max")]
        )
        return pa.table(
            {"lang": g["lang"], "j": g["j"], "rho": g["rho_max"]}
        )

    regs = hash_exchange(
        ds.map_batches(reg_partial, batch_format="pyarrow"),
        # spread by (lang, register) so no partition owns a whole lang
        key_fn=lambda t: term_hash(
            t["lang"], t["j"].to_numpy(zero_copy_only=False)
        ),
        reducer=reg_reduce,
    )
    if regs.empty:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=str),
                "registers_set": pd.Series([], dtype=np.int64),
                "approx_distinct_e6": pd.Series([], dtype=np.int64),
            }
        )

    # rho ranges 1..WP where WP = (64 - p) + 1; S = sum_j 2^(-rho_j)
    # is carried exactly as S2 = sum_j 2^(WP - rho_j) (+ V empty
    # registers at weight 2^WP), all derived from p — p=12 reproduces
    # the oracle's literal constants (4096, 2^53, 10240)
    WP = (64 - P) + 1

    def estimate(grp: pd.DataFrame) -> tuple[int, int]:
        nset = len(grp)
        v = M - nset
        s2 = int(
            sum(1 << (WP - int(r)) for r in grp["rho"])
        ) + (v << WP)
        raw = (
            (0.7213 / (1.0 + 1.079 / float(M)))
            * float(M) * float(M) * float(1 << WP) / float(s2)
        )
        if raw <= 2.5 * float(M) and v > 0:
            est = float(M) * math.log(float(M) / v)
        else:
            est = raw
        return nset, math.floor(est * 1000000.0)

    rows = []
    for lang, grp in regs.groupby("lang"):
        nset, e6 = estimate(grp)
        rows.append((lang, nset, e6))
    # merged corpus sketch: elementwise register max across langs
    merged = regs.groupby("j", as_index=False)["rho"].max()
    nset, e6 = estimate(merged)
    rows.append(("*", nset, e6))
    return (
        pd.DataFrame(
            rows, columns=["lang", "registers_set", "approx_distinct_e6"]
        )
        .astype({"registers_set": np.int64, "approx_distinct_e6": np.int64})
        .sort_values("lang")
        .reset_index(drop=True)
    )


def cms_term_counts(sf_dir: str, top_n: int = 20) -> pd.DataFrame:
    """Count-min-sketch term frequencies, checked against exact counts
    for the corpus's top-N terms — the heavy-hitter estimator a 100 TB
    pipeline uses where per-term exact counts would be a vocabulary-
    sized shuffle.

    Sketch: d=4 rows x w=4096 counters; the four row indexes are four
    disjoint 12-bit slices of md5(term) (hex chars 1-3, 4-6, 7-9, 10-12
    — SQL-replicable as ('0x' || substr(md5(term), pos, 3))::INT). The
    per-batch partial is the (row, idx, count) cell table (<= 16384
    rows), summed over the exchange — the token stream never shuffles.
    Estimate = min over the 4 rows (classic CMS upper bound; all-integer
    end to end, so the oracle is exact with no float contract at all).

    The top-N candidate list is taken from the exact (term, cf) table —
    at scale candidates come from a sample or the previous epoch's
    stats; the exact cf here doubles as the oracle's ground-truth column
    (overestimate_e0 = cms_cf - cf >= 0 is the CMS guarantee, asserted
    in pytest).
    """
    from ..exchange import hash_exchange
    from ..ids import term_hash

    D, W = 4, 4096
    ds = _docs(sf_dir, ["text"])

    def _slices(terms: pa.Array) -> np.ndarray:
        """(n, D) uint32 — the D 12-bit md5 hex slices per term,
        hashed once per DISTINCT term (vocabulary-bounded loop)."""
        import hashlib

        enc = pc.dictionary_encode(terms.combine_chunks()
                                   if isinstance(terms, pa.ChunkedArray)
                                   else terms)
        uniq = np.empty((len(enc.dictionary), D), np.uint32)
        for i, t in enumerate(enc.dictionary.to_pylist()):
            hx = hashlib.md5(t.encode("utf-8")).hexdigest()
            for r in range(D):
                uniq[i, r] = int(hx[3 * r : 3 * r + 3], 16)
        return uniq[enc.indices.to_numpy(zero_copy_only=False)]

    def cell_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        if len(tb.term) == 0:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "idx": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        sl = _slices(tb.term)
        cells = np.zeros((D, W), np.int64)
        for r in range(D):
            np.add.at(cells[r], sl[:, r], 1)
        r_ix, i_ix = np.nonzero(cells)
        return pa.table(
            {
                "r": pa.array(r_ix.astype(np.int64)),
                "idx": pa.array(i_ix.astype(np.int64)),
                "c": pa.array(cells[r_ix, i_ix]),
            }
        )

    def cell_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["r", "idx"], use_threads=False).aggregate(
            [("c", "sum")]
        )
        return pa.table(
            {"r": g["r"], "idx": g["idx"], "c": g["c_sum"].cast(pa.int64())}
        )

    cells_df = hash_exchange(
        ds.map_batches(cell_partial, batch_format="pyarrow"),
        key_fn=lambda t: (
            t["r"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(W)
            + t["idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        reducer=cell_reduce,
    )
    if cells_df.empty:
        return pd.DataFrame(
            {
                "term": pd.Series([], dtype=str),
                "cf": pd.Series([], dtype=np.int64),
                "cms_cf": pd.Series([], dtype=np.int64),
            }
        )
    cells = np.zeros((D, W), np.int64)
    cells[cells_df["r"].to_numpy(), cells_df["idx"].to_numpy()] = (
        cells_df["c"].to_numpy()
    )

    # exact (term, cf) for the candidate list / ground-truth column
    def cf_partial(t: pa.Table) -> pa.Table:
        tb = tokenize_array(t["text"])
        g = pa.TableGroupBy(
            pa.table({"term": tb.term}), ["term"], use_threads=False
        ).aggregate([([], "count_all")])
        return pa.table(
            {"term": g["term"], "cf": g["count_all"].cast(pa.int64())}
        )

    def cf_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["term"], use_threads=False).aggregate(
            [("cf", "sum")]
        )
        return pa.table({"term": g["term"], "cf": g["cf_sum"].cast(pa.int64())})

    cfs = hash_exchange(
        ds.map_batches(cf_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["term"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=cf_reduce,
    )
    top = cfs.sort_values(
        ["cf", "term"], ascending=[False, True]
    ).head(top_n)
    sl = _slices(pa.array(top["term"].tolist(), pa.string()))
    est = np.min(
        np.stack([cells[r, sl[:, r]] for r in range(D)], axis=1), axis=1
    )
    return pd.DataFrame(
        {
            "term": top["term"].to_numpy(),
            "cf": top["cf"].to_numpy(np.int64),
            "cms_cf": est.astype(np.int64),
        }
    ).reset_index(drop=True)


# --- Gopher-style repetition signals -------------------------------------


def _topgram_per_row(
    tb, t: pa.Table, n: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Most frequent word n-gram per row: (gram string, count, covered
    chars). n-grams are over consecutive KEPT tokens (the analyzer's
    stream, identical to the oracle's ``tokp`` pos+1 self-join); ties
    break lexicographically ASC on the joined gram. Covered chars count
    the gram's token bytes only (no separators): occurrences × (len(gram)
    − (n−1) spaces) — the "fraction of characters contained within the
    most frequent n-gram" numerator from the Gopher/MassiveText rules.

    Fully vectorized: one ``binary_join_element_wise`` for the joined
    grams, one Arrow multi-key sort over the (row, gram) group summary.
    """
    n_rows = t.num_rows
    terms = (
        tb.term.combine_chunks()
        if isinstance(tb.term, pa.ChunkedArray)
        else tb.term
    )
    m = len(terms)
    empty = pa.nulls(n_rows, pa.string()).fill_null("")
    if m < n:
        return empty, np.zeros(n_rows, np.int64), np.zeros(n_rows, np.int64)
    # window i covers kept-stream slots i..i+n-1; valid iff same row
    valid = tb.row_index[: m - n + 1] == tb.row_index[n - 1 :]
    widx = np.nonzero(valid)[0]
    if len(widx) == 0:
        return empty, np.zeros(n_rows, np.int64), np.zeros(n_rows, np.int64)
    parts = [terms.take(pa.array(widx + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    rows = tb.row_index[widx]
    summary = (
        pa.TableGroupBy(
            pa.table({"row": pa.array(rows), "gram": grams}),
            ["row", "gram"],
            use_threads=False,
        )
        .aggregate([("gram", "count")])
        .rename_columns(["row", "gram", "cnt"])
    )
    order = pc.sort_indices(
        summary,
        sort_keys=[
            ("row", "ascending"),
            ("cnt", "descending"),
            ("gram", "ascending"),
        ],
    )
    s = summary.take(order)
    srow = s["row"].to_numpy()
    first = np.ones(len(srow), bool)
    first[1:] = srow[1:] != srow[:-1]
    top = s.filter(pa.array(first))
    cnt = np.zeros(n_rows, np.int64)
    rpos = top["row"].to_numpy()
    # scatter the winners back to dense row slots
    gvals = top["gram"]
    glens = pc.utf8_length(gvals).to_numpy(zero_copy_only=False)
    gcnts = top["cnt"].to_numpy()
    chars = np.zeros(n_rows, np.int64)
    cnt[rpos] = gcnts
    chars[rpos] = gcnts * (glens - (n - 1))
    # build the dense gram column via take with nulls for missing rows
    slot = np.full(n_rows, -1, np.int64)
    slot[rpos] = np.arange(len(rpos))
    idx = pa.array(slot, pa.int64(), mask=slot < 0)
    gram_col = gvals.take(idx).fill_null("")
    return gram_col, cnt, chars


def repetition_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-doc repetition quality signals (the Gopher/MassiveText
    repetitious-text rules, integer-exact) — complements
    ``repetition_stats`` (which reports top-token/bigram COUNTS) with the
    rules' other two dimensions: duplicate-LINE metrics and the
    character-coverage numerators ("fraction of characters contained in
    the most frequent n-gram"), plus the winning gram identity:

    - ``n_lines`` / ``n_distinct_lines`` / ``dup_line_chars`` over the
      deterministic 7-token line rendering (``corpus.wrap_lines``):
      duplicate-line fraction = 1 − distinct/n, duplicate-line-chars
      numerator = Σ over repeated lines of (count−1)·len(line);
    - ``top{2,3}_gram`` + ``_count`` + ``_chars``: the most frequent word
      2-/3-gram and the characters it covers (ties → lexicographically
      smallest gram).

    One stateless streaming ``map_batches`` — no shuffle, text never
    leaves the task; every output is an integer or the winning gram
    string, so the driver's value-hash compare has no rounding hazard.

    The synthetic corpus never repeats a full 7-token line within one
    document, so (like ``pii_scrub``'s planted mess) every 5th doc gets
    its first rendered line deterministically re-appended — the oracle
    applies the identical plant in SQL — so the duplicate-line branch is
    genuinely exercised, not vacuously zero. The plant affects the LINE
    metrics only; the n-gram metrics run over the raw token stream.
    """
    from ..corpus import wrap_lines

    ds = _docs(sf_dir, ["doc_id", "text"])

    def per_doc(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        wrapped = wrap_lines(t["text"])
        first = pc.struct_field(
            pc.extract_regex(wrapped, r"^(?P<p>[^\n]*)"), "p"
        )
        planted = pc.binary_join_element_wise(wrapped, first, "\n")
        ids = (t["doc_id"].combine_chunks()
               if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"])
        mod5 = pa.array((ids.to_numpy(zero_copy_only=False) % 5) == 0)
        wrapped = pc.if_else(mod5, planted, wrapped)
        lines = pc.split_pattern(wrapped, "\n")
        vals = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        n_lines = pc.list_value_length(lines).cast(pa.int64())
        lsum = (
            pa.TableGroupBy(
                pa.table({"row": pa.array(parents), "line": vals}),
                ["row", "line"],
                use_threads=False,
            )
            .aggregate([("line", "count")])
            .rename_columns(["row", "line", "cnt"])
        )
        srow = lsum["row"].to_numpy()
        scnt = lsum["cnt"].to_numpy()
        slen = pc.utf8_length(lsum["line"]).to_numpy(zero_copy_only=False)
        n_distinct = np.bincount(srow, minlength=n_rows).astype(np.int64)
        dup_chars = np.bincount(
            srow, weights=(scnt - 1) * slen, minlength=n_rows
        ).astype(np.int64)

        tb = tokenize_array(t["text"])
        g2, c2, ch2 = _topgram_per_row(tb, t, 2)
        g3, c3, ch3 = _topgram_per_row(tb, t, 3)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_lines": n_lines,
                "n_distinct_lines": pa.array(n_distinct),
                "dup_line_chars": pa.array(dup_chars),
                "top2_gram": g2,
                "top2_count": pa.array(c2),
                "top2_chars": pa.array(ch2),
                "top3_gram": g3,
                "top3_count": pa.array(c3),
                "top3_chars": pa.array(ch3),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def gopher_filter(sf_dir: str) -> pd.DataFrame:
    """Composed Gopher/MassiveText quality-rule filter (Rae et al. 2021,
    Appendix A1.1) — the rule set every pretraining pipeline applies
    after scoring: per document, each rule as a 0/1 flag plus ``keep`` =
    AND of all rules. Thresholds are the paper's, expressed as INTEGER
    cross-multiplications so both sides of the oracle compare exact
    BIGINTs (no ratio rounding hazard anywhere):

    - ``r_word_count``:   50 <= n_tokens <= 100000
    - ``r_mean_word_len``: 3 <= token_bytes/n_tokens <= 10
                           (as 3*n_tokens <= token_bytes <= 10*n_tokens)
    - ``r_stopwords``:    n_stopwords >= 2
    - ``r_dup_line``:     dup_line_chars <= 0.30 * line_chars
                           (as 10*dup <= 3*line_chars; same 7-token line
                           rendering + every-5th-doc plant as
                           ``repetition_metrics`` so the rule is
                           exercised, not vacuously true)
    - ``r_top2``:         top-2-gram char coverage <= 0.20 * n_chars
                           (as 5*top2_chars <= n_chars)

    ONE fused stateless ``map_batches`` pass — every signal is doc-local
    (shared kernels: ``tokenize_array``, ``wrap_lines``,
    ``_topgram_per_row``), so the filter runs shuffle-free at any scale
    and text never leaves the task.
    """
    from ..corpus import wrap_lines

    ds = _docs(sf_dir, ["doc_id", "text"])
    stop = pa.array(sorted(STOPWORDS))

    def per_doc(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        # --- token-stream signals (quality_metrics semantics)
        tb = tokenize_array(t["text"])
        n_tok = tb.doc_len.astype(np.int64)
        is_stop = pc.is_in(tb.term, value_set=stop).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(
            tb.row_index, weights=is_stop.astype(np.float64),
            minlength=n_rows,
        ).astype(np.int64)
        tok_bytes = np.bincount(
            tb.row_index,
            weights=pc.binary_length(tb.term)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            minlength=n_rows,
        ).astype(np.int64)
        # --- duplicate-line signals (repetition_metrics rendering+plant)
        wrapped = wrap_lines(t["text"])
        first = pc.struct_field(
            pc.extract_regex(wrapped, r"^(?P<p>[^\n]*)"), "p"
        )
        planted = pc.binary_join_element_wise(wrapped, first, "\n")
        ids = (t["doc_id"].combine_chunks()
               if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"])
        mod5 = pa.array((ids.to_numpy(zero_copy_only=False) % 5) == 0)
        wrapped = pc.if_else(mod5, planted, wrapped)
        lines = pc.split_pattern(wrapped, "\n")
        vals = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False
        )
        llen = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
        line_chars = np.bincount(
            parents, weights=llen.astype(np.float64), minlength=n_rows
        ).astype(np.int64)
        lsum = (
            pa.TableGroupBy(
                pa.table({"row": pa.array(parents), "line": vals}),
                ["row", "line"],
                use_threads=False,
            )
            .aggregate([("line", "count")])
            .rename_columns(["row", "line", "cnt"])
        )
        srow = lsum["row"].to_numpy()
        scnt = lsum["cnt"].to_numpy()
        slen = pc.utf8_length(lsum["line"]).to_numpy(zero_copy_only=False)
        dup_chars = np.bincount(
            srow, weights=(scnt - 1) * slen, minlength=n_rows
        ).astype(np.int64)
        # --- top-2-gram coverage
        _, _, top2_chars = _topgram_per_row(tb, t, 2)
        n_chars = (
            pc.utf8_length(t["text"])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # --- the rules, integer cross-multiplied
        r_wc = ((n_tok >= 50) & (n_tok <= 100000)).astype(np.int64)
        r_mwl = (
            (3 * n_tok <= tok_bytes) & (tok_bytes <= 10 * n_tok)
        ).astype(np.int64)
        r_stopw = (n_stop >= 2).astype(np.int64)
        r_dl = (10 * dup_chars <= 3 * line_chars).astype(np.int64)
        r_t2 = (5 * top2_chars <= n_chars).astype(np.int64)
        keep = r_wc * r_mwl * r_stopw * r_dl * r_t2
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "token_bytes": pa.array(tok_bytes),
                "n_stopwords": pa.array(n_stop),
                "dup_line_chars": pa.array(dup_chars),
                "line_chars": pa.array(line_chars),
                "top2_chars": pa.array(top2_chars),
                "n_chars": pa.array(n_chars),
                "r_word_count": pa.array(r_wc),
                "r_mean_word_len": pa.array(r_mwl),
                "r_stopwords": pa.array(r_stopw),
                "r_dup_line": pa.array(r_dl),
                "r_top2": pa.array(r_t2),
                "keep": pa.array(keep),
            }
        )

    return (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each language, rank documents by mean token surprisal under the
    corpus unigram LM and split into equal terciles — ``head`` (most
    fluent third), ``middle``, ``tail``. The standard quality partition
    a pretraining pipeline samples from after line dedup + LM scoring
    (this completes the CCNet trio next to ``line_dedup_scrub`` and
    ``unigram_logprob``).

    Exact-integer contract: the per-doc score is ``nll_q = nll_e6 //
    n_tokens`` (mean surprisal in micro-nats, floor-divided — both
    operands are the exact BIGINTs of ``unigram_logprob``), rank is
    dense ``(nll_q asc, doc_id asc)`` within language, and the tercile
    rule is the integer test ``3*rank <= n_lang`` / ``3*rank <=
    2*n_lang`` — no percentile float anywhere, so bucket labels match
    the SQL window-function oracle exactly.

    Shape: the unigram-LM scoring pass of ``_unigram_nll_ds`` (term-
    keyed partial exchange + broadcast vocabulary), then ONE language-
    keyed hash exchange whose reducer ranks each language segment with
    the lexsort + run-start kernel (cost scales with rows, not
    languages; a language's docs land on one partition — at 100 TB
    with few languages, sub-partition by nll_q range per lang and
    prefix-sum the per-range counts to assign global ranks).
    """
    from ..exchange import hash_exchange
    from ..ids import md5_u64_of_terms

    d = _unigram_nll_ds(sf_dir, extra_cols=("lang",))
    if d is None:
        # zero-token corpus: every doc scores 0; rank within lang by
        # doc_id (the same (nll_q, doc_id) order), terciles as usual
        base = (
            _docs(sf_dir, ["doc_id", "lang"])
            .to_pandas()
            .sort_values("doc_id")
        )
        if len(base) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "lang": pd.Series([], dtype="object"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "nll_q": pd.Series([], dtype="int64"),
                    "rank_in_lang": pd.Series([], dtype="int64"),
                    "n_lang": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="object"),
                }
            )
        base["n_tokens"] = np.int64(0)
        base["nll_q"] = np.int64(0)
        base["rank_in_lang"] = (
            base.groupby("lang")["doc_id"].rank("first").astype(np.int64)
        )
        base["n_lang"] = base.groupby("lang")["doc_id"].transform(
            "size"
        ).astype(np.int64)
        r, n = base["rank_in_lang"], base["n_lang"]
        base["bucket"] = np.where(
            3 * r <= n, "head", np.where(3 * r <= 2 * n, "middle", "tail")
        )
        return base.sort_values("doc_id").reset_index(drop=True)

    def add_q(t: pa.Table) -> pa.Table:
        nll = t["nll_e6"].to_numpy()
        ntk = t["n_tokens"].to_numpy()
        q = np.where(ntk > 0, nll // np.maximum(ntk, 1), 0)
        return t.append_column("nll_q", pa.array(q.astype(np.int64)))

    def rank_part(rows: pa.Table) -> pa.Table:
        lg = pc.dictionary_encode(rows["lang"].combine_chunks())
        codes = lg.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = rows["doc_id"].to_numpy()
        q = rows["nll_q"].to_numpy()
        order = np.lexsort((ids, q, codes))
        c2 = codes[order]
        run_start = np.nonzero(
            np.concatenate(([True], c2[1:] != c2[:-1]))
        )[0]
        seg_len = np.diff(np.concatenate((run_start, [len(c2)])))
        rank = (
            np.arange(len(c2))
            - np.repeat(run_start, seg_len)
            + 1
        ).astype(np.int64)
        n_lang = np.repeat(seg_len, seg_len).astype(np.int64)
        bucket = np.where(
            3 * rank <= n_lang,
            "head",
            np.where(3 * rank <= 2 * n_lang, "middle", "tail"),
        )
        sel = pa.array(order)
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "lang": rows["lang"].take(sel),
                "n_tokens": rows["n_tokens"].take(sel),
                "nll_q": pa.array(q[order]),
                "rank_in_lang": pa.array(rank),
                "n_lang": pa.array(n_lang),
                "bucket": pa.array(bucket),
            }
        )

    out = hash_exchange(
        d.map_batches(add_q, batch_format="pyarrow"),
        key_fn=lambda t: md5_u64_of_terms(t["lang"]),
        reducer=rank_part,
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def kn_trigram_logprob(sf_dir: str, discount: float = 0.75) -> pd.DataFrame:
    """Per-doc negative log-likelihood under an interpolated Kneser-Ney
    TRIGRAM model trained on the corpus itself — the order-3 upgrade of
    ``kn_bigram_logprob`` (KenLM perplexity filters typically run order
    3-5; higher order separates natural prose from templated spam far
    better than the bigram). Model spec (documented variant — all
    lower-order statistics derive from the TRIGRAM type table's
    continuation counts, Chen & Goodman's interpolated KN with one
    fixed discount D):

        P3(c|a,b) = (max(c(abc)-D,0) + D*N1+(ab,*)*P2(c|b)) / c(ab·)
        P2(c|b)   = (max(N1+(·bc)-D,0) + D*N1+(b,*c)*Pcont(c))
                      / N1+(·b·)
        Pcont(c)  = N1+(·,·c) / N1+(·,··)     (over continuation types)

    Self-trained => every scored trigram is in the table (no OOV).
    Exactness contract: per trigram TYPE the log-prob is ONE fixed-
    order double expression over integer counts, floored to integer
    micro-nats BEFORE the per-doc sum — nll_e6 / n_trigrams are exact
    BIGINTs on both sides. Distribution shape = the bigram op's:
    type-count partials ride the hash exchange, the driver computes
    the KN statistics once over the TYPE table and broadcasts the
    (trigram -> lp6) probe via ray.put, scoring is one streaming
    pass."""
    import math

    from ..exchange import hash_exchange
    from ..ids import term_hash

    D = float(discount)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _doc_trigrams(t: pa.Table):
        tb = tokenize_array(t["text"])
        nt = len(tb.row_index)
        if nt < 3:
            return None, None
        terms = (
            tb.term.combine_chunks()
            if isinstance(tb.term, pa.ChunkedArray)
            else tb.term
        )
        ri = tb.row_index
        same = (ri[:-2] == ri[1:-1]) & (ri[1:-1] == ri[2:])
        if not same.any():
            return None, None
        m = pa.array(same)
        tg = pc.binary_join_element_wise(
            terms.slice(0, nt - 2).filter(m),
            terms.slice(1, nt - 2).filter(m),
            terms.slice(2, nt - 2).filter(m),
            " ",
        )
        return tg, ri[:-2][same]

    def tg_partial(t: pa.Table) -> pa.Table:
        tg, _ = _doc_trigrams(t)
        if tg is None:
            return pa.table(
                {
                    "tg": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            pa.table({"tg": tg}), ["tg"], use_threads=False
        ).aggregate([([], "count_all")])
        return pa.table(
            {"tg": g["tg"], "cnt": g["count_all"].cast(pa.int64())}
        )

    def tg_reduce(rows: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(rows, ["tg"], use_threads=False).aggregate(
            [("cnt", "sum")]
        )
        return pa.table(
            {"tg": g["tg"], "cnt": g["cnt_sum"].cast(pa.int64())}
        )

    tgs = hash_exchange(
        ds.map_batches(tg_partial, batch_format="pyarrow"),
        key_fn=lambda t: term_hash(
            t["tg"], np.zeros(t.num_rows, np.uint64)
        ),
        reducer=tg_reduce,
    )
    if tgs.empty:
        ids = _docs(sf_dir, ["doc_id"]).to_pandas().sort_values("doc_id")
        return pd.DataFrame(
            {
                "doc_id": ids["doc_id"].to_numpy(np.int64),
                "n_trigrams": np.zeros(len(ids), np.int64),
                "nll_e6": np.zeros(len(ids), np.int64),
            }
        )
    parts = tgs["tg"].str.split(" ", n=2, expand=True)
    a_s, b_s, c_s = parts[0], parts[1], parts[2]
    ab_s = a_s + " " + b_s
    bc_s = b_s + " " + c_s
    cabc = tgs["cnt"].to_numpy(np.int64)
    cab = tgs.groupby(ab_s)["cnt"].sum()[ab_s].to_numpy(np.int64)
    n1ab = ab_s.value_counts()[ab_s].to_numpy(np.int64)
    # continuation table: one row per (b, c) type
    kbc = bc_s.value_counts()          # N1+(.bc): distinct a per (b,c)
    nbc = kbc[bc_s].to_numpy(np.int64)
    kb_frame = pd.DataFrame({"b": b_s, "bc": bc_s}).drop_duplicates("bc")
    nbdot_map = bc_s.value_counts().groupby(
        kb_frame.set_index("bc")["b"]
    ).sum()  # N1+(.b.) = sum of nbc over c
    n1bs_map = kb_frame.groupby("b")["bc"].count()  # distinct c per b
    kc_frame = pd.DataFrame(
        {"c": c_s, "bc": bc_s}
    ).drop_duplicates("bc")
    nc_map = kc_frame.groupby("c")["bc"].count()  # distinct b per c
    ntc = int(kb_frame["bc"].nunique())           # continuation types
    nbdot = nbdot_map[b_s].to_numpy(np.int64)
    n1bs = n1bs_map[b_s].to_numpy(np.int64)
    nc = nc_map[c_s].to_numpy(np.int64)
    lp_e6 = np.fromiter(
        (
            math.floor(
                math.log(
                    (max(c3 - D, 0.0)
                     + D * x_n1ab
                       * ((max(x_nbc - D, 0.0)
                           + D * x_n1bs * (x_nc / ntc))
                          / x_nbdot))
                    / c2
                )
                * 1_000_000
            )
            for c3, c2, x_n1ab, x_nbc, x_nbdot, x_n1bs, x_nc in zip(
                cabc, cab, n1ab, nbc, nbdot, n1bs, nc
            )
        ),
        dtype=np.int64,
        count=len(cabc),
    )
    ref = ray.put((pa.array(tgs["tg"], pa.string()), lp_e6))

    def score(t: pa.Table) -> pa.Table:
        tg, ri = _doc_trigrams(t)
        n = t.num_rows
        nll = np.zeros(n, np.int64)
        ntg = np.zeros(n, np.int64)
        if tg is not None:
            voc, lp = ray.get(ref)
            pos = pc.index_in(tg, value_set=voc).to_numpy(
                zero_copy_only=False
            )
            np.add.at(nll, ri, -lp[pos])
            ntg = np.bincount(ri, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_trigrams": pa.array(ntg),
                "nll_e6": pa.array(nll),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
