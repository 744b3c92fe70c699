"""Vectorized bounded edit distance for fuzzy term-dictionary expansion.

``edit_within(q, terms, k)`` answers "which dictionary terms are within
edit distance k of the query term" for a WHOLE term dictionary in one
numpy pass — the expansion primitive behind fuzzy term queries (tantivy
``FuzzyTermQuery``, reference engine surface ``ck-engine/src/lib.rs``;
tantivy evaluates it with a Levenshtein automaton over the FST dictionary
and scores matches with a ConstScorer).

Instead of a per-term Python DP (O(|dict|) interpreter-speed loops) or a
Levenshtein automaton (the 100 TB-dictionary path, noted below), the
kernel runs ONE dynamic program over all candidates simultaneously:
the classic (m+1)x(L+1) Wagner-Fischer table gains a third "candidate"
axis and every cell update becomes a vectorized numpy op over the
N surviving candidates. The insertion recurrence cur[j] = min(base[j],
cur[j-1]+1) — a sequential running minimum — is computed without a
j-loop via the min-plus prefix-scan identity:

    cur[j] = min_{i<=j} (base[i] + (j - i))
           = (running_min over j of (base[j] - j)) + j

so one query costs O(m) numpy passes over an (N, L) matrix, not O(m*L*N)
Python steps. Terms are capped at 40 bytes by the tokenizer, so m, L <= 40.

``transpose=True`` switches the metric to OSA (optimal string alignment:
Levenshtein + adjacent transposition counted once, each substring edited
at most once) — the ``transposition_cost_one`` flavor of tantivy's
``FuzzyTermQuery::new``. The default (plain Levenshtein) is what the
driver's SQL oracle checks bit-exactly via DuckDB ``levenshtein()``.

Scale note: per-shard dictionaries here are <= a few hundred thousand
terms, so the dense scan (with the length-window prefilter) is microsec-
to-millisec work. At a 10^12-file dictionary the expansion would move to
a Levenshtein automaton intersected with the sorted term FST per shard —
same API, different kernel; the call sites only see ``expand``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["edit_distance", "edit_within"]


def edit_distance(a: str, b: str, transpose: bool = False) -> int:
    """Scalar reference implementation (pure Python Wagner-Fischer,
    OSA when ``transpose``). Used by tests as the ground truth for the
    vectorized kernel; O(len(a)*len(b))."""
    m, n = len(a), len(b)
    prev2: list[int] | None = None
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            best = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                transpose
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
                and prev2 is not None
            ):
                best = min(best, prev2[j - 2] + 1)
            cur[j] = best
        prev2, prev = prev, cur
    return prev[n]


def edit_within(
    q: str,
    terms: "np.ndarray | list[str]",
    k: int,
    transpose: bool = False,
) -> np.ndarray:
    """Boolean mask over ``terms``: edit_distance(q, t) <= k.

    One vectorized DP over all length-plausible candidates; terms whose
    length differs from ``len(q)`` by more than ``k`` are rejected by the
    free lower bound without touching the DP.
    """
    terms = np.asarray(terms, dtype=object)
    n_terms = len(terms)
    out = np.zeros(n_terms, dtype=bool)
    if n_terms == 0:
        return out
    m = len(q)
    lens = np.fromiter((len(t) for t in terms), np.int64, n_terms)
    cand_idx = np.nonzero(np.abs(lens - m) <= k)[0]
    if len(cand_idx) == 0:
        return out
    cand = terms[cand_idx]
    clens = lens[cand_idx]
    L = int(clens.max()) if len(clens) else 0
    if m == 0:
        out[cand_idx] = clens <= k
        return out
    if L == 0:
        out[cand_idx] = m <= k
        return out
    # (N, L) codepoint matrix: numpy's U-dtype stores fixed-width UCS4,
    # so a view is the pad-and-encode step in one C pass. Padding is
    # \x00, which never equals a real token character.
    chars = (
        np.asarray(cand, dtype=f"U{L}")
        .view(np.uint32)
        .reshape(len(cand), L)
    )
    qcodes = np.fromiter((ord(c) for c in q), np.uint32, m)
    N = len(cand)
    col = np.arange(L + 1, dtype=np.int32)
    prev = np.broadcast_to(col, (N, L + 1)).copy()
    prev2 = None
    alive = np.arange(N)  # indices into cand_idx still in play
    for i in range(1, m + 1):
        # band pruning: a DP row's minimum never decreases with i, so a
        # candidate whose whole row exceeds k is dead for good. Compact
        # the working set — with k<=2 most of a same-length dictionary
        # dies within ~k+1 rows, turning the worst case into ~O(k) full
        # passes plus small tails.
        rowmin = prev.min(axis=1)
        keep = rowmin <= k
        if not keep.all():
            alive = alive[keep]
            if len(alive) == 0:
                return out
            prev = prev[keep]
            chars = chars[keep]
            clens = clens[keep]
            if prev2 is not None:
                prev2 = prev2[keep]
        N = len(alive)
        neq = chars != qcodes[i - 1]  # (N, L) substitution costs
        base = np.minimum(prev[:, :-1] + neq, prev[:, 1:] + 1)
        if transpose and i > 1 and L > 1 and prev2 is not None:
            tr = (chars[:, 1:] == qcodes[i - 2]) & (
                chars[:, :-1] == qcodes[i - 1]
            )
            base[:, 1:] = np.where(
                tr, np.minimum(base[:, 1:], prev2[:, :-2] + 1), base[:, 1:]
            )
        # cur[0]=i, then the running-min insertion chain via prefix scan
        cur = np.empty((N, L + 1), dtype=np.int32)
        cur[:, 0] = i
        cur[:, 1:] = base
        cur -= col
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += col
        prev2, prev = prev, cur
    dist = prev[np.arange(N), clens]
    out[cand_idx[alive]] = dist <= k
    return out
