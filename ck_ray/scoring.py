"""BM25 scalar math — the single definition shared by engine and oracle.

Reproduces tantivy 0.24's BM25 (the reference's lexical scorer; formula per
SURVEY.md §2.8, schema at reference ``ck-engine/src/lib.rs:750-753``):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_fac   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = sum_t idf(t) * tf_fac(t)          k1 = 1.2, b = 0.75

Spec decisions (documented contract, encoded in the oracle + golden files):

- **Exact doc lengths.** tantivy quantizes per-doc field lengths to 1-byte
  fieldnorm ids; we keep exact ``dl`` (stored inline in postings). This is
  the "single-segment, exact-norm tantivy equivalence" contract from
  SURVEY.md §7.4.
- **f32 arithmetic** mirroring tantivy's ``Bm25Weight``: the weight
  ``idf * (k1 + 1)`` and the norm ``k1 * (1 - b + b * dl / avgdl)`` are
  computed in float32; clause scores are summed per doc in query-clause
  order. (A float64 mode exists for the DuckDB-oracle driver gate.)
- **Phrase idf** = sum of the constituent terms' idfs (Lucene/tantivy
  ``Bm25Weight::for_terms``), tf = number of phrase occurrences.
- **Ties** broken by doc_id ascending (the reference's sort is unstable,
  reference ``ck-engine/src/lib.rs:1049-1053``; we pin a deterministic order).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: float | np.ndarray, n_docs: int, dtype=np.float32):
    """BM25 idf; computed in ``dtype`` (f32 to mirror tantivy)."""
    dfa = np.asarray(df, dtype=np.float64)
    x = np.log1p((n_docs - dfa + 0.5) / (dfa + 0.5))
    return x.astype(dtype) if x.ndim else dtype(x)


def tf_factor(tf, dl, avgdl: float, dtype=np.float32):
    """``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` vectorized in ``dtype``."""
    tf = np.asarray(tf).astype(dtype)
    dl = np.asarray(dl).astype(dtype)
    avgdl = dtype(avgdl)
    norm = dtype(K1) * (dtype(1.0) - dtype(B) + dtype(B) * dl / avgdl)
    return tf * dtype(K1 + 1.0) / (tf + norm)


def phrase_weight(dfs: list[int], n_docs: int, dtype=np.float32):
    """Phrase idf = sum of member-term idfs, summed in clause order
    (Lucene/tantivy ``Bm25Weight::for_terms``); one shared definition so
    engine and oracle agree bitwise."""
    w = dtype(0.0)
    for df in dfs:
        w = dtype(w + idf(df, n_docs, dtype=dtype))
    return w


def term_scores(tf, dl, df: int, n_docs: int, avgdl: float, dtype=np.float32):
    """Per-posting score contributions of one term."""
    w = dtype(idf(df, n_docs, dtype=dtype))
    return w * tf_factor(tf, dl, avgdl, dtype=dtype)


def round_half_away(x, decimals: int = 4):
    """Round half AWAY from zero, like DuckDB/SQL ``round()``.

    numpy's ``np.round`` is half-even (banker's), so exact dyadic ties —
    1/32 = 0.03125, 21/32 = 0.65625 — diverge from every SQL oracle at
    the rounding boundary. Any ratio-of-small-integers column that an
    oracle compares at fixed decimals MUST round through this kernel
    (jaccard, cosine, overlap/dup fractions, recall).
    """
    s = 10.0 ** decimals
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
