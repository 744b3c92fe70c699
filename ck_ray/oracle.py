"""Pure-Python brute-force BM25 oracle (conformance reference).

Independent of the engine's codec / shuffle / actor machinery: builds
plain dicts from the corpus table by tokenizing row-by-row and scores
candidates doc-at-a-time. Shares ONLY the spec-level definitions with the
engine — the tokenizer kernel (one definition of tantivy-default
analysis), the BM25 scalar math (``scoring.py``) and the query parser
(one definition of tantivy QueryParser-subset semantics). Rank identity
between this oracle and the Ray engine is the correctness gate from
BASELINE.md (single-segment tantivy-0.24 semantics, exact norms, f32,
ties doc_id-asc; see FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import scoring
from .ids import doc_id_for
from .query import (
    FIELD_IDS,
    MUST,
    MUST_NOT,
    SHOULD,
    Clause,
    collect_clauses,
    expand_prefix_tree,
    parse_query,
    rewrite_synonyms,
)
from .tokenizer import tokenize_text_with_positions


class BM25Oracle:
    def __init__(
        self, corpus: pa.Table, dtype=np.float32,
        synonyms: dict | None = None,
    ):
        self.dtype = dtype
        self._synonyms = synonyms or {}  # analyzer-token keys/values
        self.n_docs = corpus.num_rows
        # per field: term -> {doc_id: (tf, positions)}; doc_id -> dl
        self.postings: list[dict[str, dict[int, tuple[int, list[int]]]]] = [{}, {}]
        self.dl: list[dict[int, int]] = [{}, {}]
        total = [0, 0]
        for row in corpus.to_pylist():
            did = doc_id_for(row["repo"], row["path"], row["commit"])
            for fid, col in ((0, "content"), (1, "path")):
                toks = tokenize_text_with_positions(row[col])
                self.dl[fid][did] = len(toks)
                total[fid] += len(toks)
                per_term: dict[str, list[int]] = {}
                for t, p in toks:
                    per_term.setdefault(t, []).append(p)
                for t, ps in per_term.items():
                    self.postings[fid].setdefault(t, {})[did] = (len(ps), ps)
        self.avgdl = [
            (total[f] / self.n_docs) if self.n_docs else 0.0 for f in (0, 1)
        ]

    # ------------------------------------------------------------- scoring

    def _clause_scores(self, clause) -> dict[int, np.floating]:
        fid = FIELD_IDS[clause.field]
        dtype = self.dtype
        if getattr(clause, "match_all", False):
            # AllQuery: every doc, const score boost*1.0 (ConstScorer)
            b = dtype(clause.boost)
            return {d: b for d in self.dl[fid]}
        if getattr(clause, "const_score", False):
            # TermSetQuery / expanded RangeQuery: ANY member term, const
            b = dtype(clause.boost)
            docs: set[int] = set()
            for t in clause.terms:
                p = self.postings[fid].get(t)
                if p:
                    docs |= set(p)
            return {d: b for d in docs}
        avgdl = self.avgdl[fid]
        if getattr(clause, "blended", False):
            # Lucene SynonymQuery: summed tf, blended (max-member) df
            b = dtype(clause.boost)
            tf_sum: dict[int, int] = {}
            dfs: list[int] = []
            for t in clause.terms:
                p = self.postings[fid].get(t)
                if not p:
                    continue
                dfs.append(len(p))
                for d, (tf, _) in p.items():
                    tf_sum[d] = tf_sum.get(d, 0) + tf
            if not tf_sum:
                return {}
            df = max(dfs)
            return {
                d: scoring.term_scores(
                    tf, self.dl[fid][d], df, self.n_docs, avgdl,
                    dtype=dtype,
                ) * b
                for d, tf in tf_sum.items()
            }
        plists = [self.postings[fid].get(t) for t in clause.terms]
        if any(p is None for p in plists):
            return {}
        b = dtype(clause.boost)
        if len(clause.terms) == 1:
            p = plists[0]
            df = len(p)
            return {
                d: scoring.term_scores(
                    tf, self.dl[fid][d], df, self.n_docs, avgdl, dtype=dtype
                ) * b
                for d, (tf, _) in p.items()
            }
        # phrase
        common = set(plists[0])
        for p in plists[1:]:
            common &= set(p)
        w = scoring.phrase_weight(
            [len(p) for p in plists], self.n_docs, dtype=dtype
        )
        slop = int(getattr(clause, "slop", 0))
        out: dict[int, np.floating] = {}
        for d in common:
            if slop == 0:
                cand = plists[0][d][1]
                for j in range(1, len(clause.terms)):
                    nxt = set(plists[j][d][1])
                    cand = [p for p in cand if p + j in nxt]
                    if not cand:
                        break
                tf = len(cand)
            else:
                # independent exists-semantics brute force (no greedy
                # chain): p0 matches iff SOME increasing tuple over the
                # remaining terms has span − (n−1) <= slop
                rest = [plists[j][d][1] for j in range(1, len(clause.terms))]
                m = len(rest)

                def _exists(prev: int, k: int, p0: int) -> bool:
                    if k == m:
                        return prev - p0 - m <= slop
                    return any(
                        _exists(p, k + 1, p0)
                        for p in rest[k]
                        if p > prev
                    )

                tf = sum(1 for p0 in plists[0][d][1] if _exists(p0, 0, p0))
            if tf:
                out[d] = (
                    w * scoring.tf_factor(
                        tf, self.dl[fid][d], avgdl, dtype=dtype
                    )
                ) * b
        return out

    def _eval_node(self, node) -> dict[int, np.floating] | None:
        """Boolean tree evaluation, doc-at-a-time (mirrors the engine's
        ``_eval_node``: child-order f32 accumulation, Lucene match rule)."""
        if isinstance(node, Clause):
            s = self._clause_scores(node)
            return s if s else None
        results = [(o, self._eval_node(c)) for o, c in node.children]
        must = [r for o, r in results if o == MUST]
        if any(r is None for r in must):
            return None
        if must:
            cand = set(must[0])
            for r in must[1:]:
                cand &= set(r)
        else:
            cand = set()
            for o, r in results:
                if o == SHOULD and r is not None:
                    cand |= set(r)
            if not cand:
                return None
        for o, r in results:
            if o == MUST_NOT and r is not None:
                cand -= set(r)
        if not cand:
            return None
        out: dict[int, np.floating] = {}
        nb = self.dtype(getattr(node, "boost", 1.0))
        for d in cand:
            s = self.dtype(0.0)
            for o, r in results:  # child order == accumulation order
                if o != MUST_NOT and r is not None and d in r:
                    s = self.dtype(s + r[d])
            out[d] = s * nb
        return out

    def _expand_prefix(self, field: str, prefix: str) -> list[str]:
        fid = FIELD_IDS[field]
        return sorted(
            t for t in self.postings[fid] if t.startswith(prefix)
        )

    def _expand_range(self, field, lo, hi, incl_lo, incl_hi) -> list[str]:
        """Corpus-global dictionary terms inside the lexicographic
        interval (brute-force twin of ``LocalIndex._expand_range``)."""
        fid = FIELD_IDS[field]

        def ok(t: str) -> bool:
            if lo is not None and (t < lo or (not incl_lo and t == lo)):
                return False
            if hi is not None and (t > hi or (not incl_hi and t == hi)):
                return False
            return True

        return sorted(t for t in self.postings[fid] if ok(t))

    def _expand_fuzzy(
        self, field: str, term: str, dist: int, transpose: bool = False
    ) -> list[str]:
        """Corpus-global dictionary terms within edit distance ``dist``
        (brute-force twin of ``LocalIndex._expand_fuzzy``; scalar
        reference DP, deliberately independent of the vectorized
        ``strdist.edit_within`` kernel the engine uses)."""
        from .strdist import edit_distance

        fid = FIELD_IDS[field]
        return sorted(
            t
            for t in self.postings[fid]
            if abs(len(t) - len(term)) <= dist
            and edit_distance(term, t, transpose=transpose) <= dist
        )

    def _expand_regex(self, field: str, pattern: str) -> list[str]:
        """Corpus-global dictionary terms the anchored pattern fully
        matches (twin of ``LocalIndex._expand_regex``)."""
        import re

        try:
            rx = re.compile(pattern)
        except re.error as e:
            raise ValueError(f"bad regex /{pattern}/: {e}") from None
        fid = FIELD_IDS[field]
        return sorted(t for t in self.postings[fid] if rx.fullmatch(t))

    def search_raw(self, query: str, top_k: int | None = None):
        k = top_k if top_k is not None else 100
        tree = rewrite_synonyms(parse_query(query), self._synonyms)
        if tree is not None and any(
            c.prefix
            or c.fuzzy
            or c.range_spec is not None
            or c.regex_spec is not None
            for c in collect_clauses(tree)
        ):
            tree = expand_prefix_tree(
                tree, self._expand_prefix, self._expand_range,
                self._expand_fuzzy, self._expand_regex,
            )
        acc = self._eval_node(tree) if tree is not None else None
        if not acc:
            return np.empty(0, np.uint64), np.empty(0, self.dtype)
        docs = np.array(sorted(acc), dtype=np.uint64)
        scores = np.array([acc[int(d)] for d in docs], dtype=self.dtype)
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return docs[order], scores[order]

    def search(self, query: str, top_k: int | None = None, threshold: float | None = None):
        docs, scores = self.search_raw(query, top_k)
        if len(docs) == 0:
            return docs, scores, scores
        max_s = scores[0] if scores[0] > 0 else self.dtype(1.0)
        norm = scores / max_s
        if threshold is not None:
            keep = norm >= threshold
            docs, scores, norm = docs[keep], scores[keep], norm[keep]
        return docs, scores, norm
