"""Percolator: match a document stream against a registry of stored queries.

The reverse of search (Elasticsearch ``percolate`` query / Lucene Monitor,
née Luwak): the QUERIES are registered up front and every incoming document
is checked against all of them — the standard primitive behind alerting,
saved searches, and routing documents to training-data buckets by stored
predicate. The reference engine has no percolator; this extends its query
language (``ck_ray.query.parse_query``, the tantivy-QueryParser subset —
reference parser entry ``ck-engine/src/lib.rs:765-769``) to streamed
match-only evaluation.

Ray-Data-first shape: the stored-query registry is the SMALL side — each
``map_batches`` actor parses it once in ``__init__`` (never per batch) and
the document stream never shuffles: one streaming pass, each batch
tokenized with the engine's own analyzer kernel (``ck_ray.tokenizer``) and
every query evaluated as vectorized set/position algebra over the batch's
flat token table. No per-row Python, no driver loop; output is the
(query_name, doc_id) match pairs, which at 100 TB would stream straight to
a partitioned sink.

Supported query surface (the parser's match-expressible subset):

- term / blended-synonym / const-score term-set (``IN [a b c]``) leaves
  — flat set membership;
- exact phrases (``"a b"``, slop=0) — positional key intersection;
- boolean ``AND``/``OR``/``NOT``/``+``/``-``/parens with Lucene occur
  semantics (MUST set = intersection; no MUST ⇒ at least one SHOULD;
  MUST_NOT-only node matches nothing — identical to ``BM25Engine``);
- ``*`` match-all;
- dictionary-expanded leaves — prefix ``te*``, range ``[a TO b]``, fuzzy
  ``term~N``, regex ``/pat/`` — expanded against the BATCH vocabulary via
  the engine's own ``expand_prefix_tree``. Batch-local expansion is
  match-exact for the same reason shard-local expansion is in the scoring
  engine: a dictionary term absent from a batch matches no row of that
  batch.

- sloppy phrases (``"a b"~N``) — the scoring engine's greedy-chain
  rule (``query.py`` ``Clause.slop``: a first-term occurrence matches
  iff chaining each next term to its smallest later position lands
  within total extra gap <= N) evaluated with the same packed-key
  searchsorted algebra, match-only.

Non-``content`` fields raise ``ValueError`` at REGISTRATION time
(``Percolator.__init__`` walks every parsed tree), never mid-stream in
a worker (a bad registry entry must not fail the job per batch, nor
pass silently on empty batches). Dictionary
expansion runs UNCAPPED (``max_expansions=None``): Lucene's clause cap
bounds scored-disjunction width, which percolation doesn't build, and a
batch-local cap would make failure depend on batch boundaries. Boosts are
ignored — percolation has no scores, only membership, matching ES's
constant-score percolate semantics.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BoolNode,
    Clause,
    expand_prefix_tree,
    parse_query,
)
from ..strdist import edit_within
from ..tokenizer import tokenize_array

_POS_BITS = 32  # (row << 32) | position packs both into one int64 key


class _BatchTokens:
    """Flat token view of one batch plus the lazy per-term structures the
    evaluators need: sorted vocabulary (for dictionary expansion) and
    (row, pos) packed keys per selected term set."""

    def __init__(self, arr: pa.Array | pa.ChunkedArray, n_rows: int):
        tb = tokenize_array(arr)
        self.n_rows = n_rows
        self.row = tb.row_index
        self.pos = tb.position.astype(np.int64)
        # dictionary-encode ONCE per batch: every query then probes the
        # (small) sorted vocabulary and selects tokens by INTEGER code
        # compare — ~4x faster than a per-query string is_in over the
        # full flat token array
        if len(tb.term):
            d = pc.dictionary_encode(tb.term)
            idx = d.indices.to_numpy(zero_copy_only=False)
            vals = d.dictionary.to_numpy(zero_copy_only=False).astype(
                object
            )
            order = np.argsort(vals)
            self._vocab = vals[order]
            rank = np.empty(len(order), np.int64)
            rank[order] = np.arange(len(order))
            self.codes = rank[idx]
        else:
            self._vocab = np.empty(0, object)
            self.codes = np.empty(0, np.int64)

    @property
    def vocab(self) -> np.ndarray:
        return self._vocab

    def _term_codes(self, terms: list[str]) -> np.ndarray:
        """Sorted-vocab ranks of the ``terms`` present in this batch."""
        if len(self._vocab) == 0 or not terms:
            return np.empty(0, np.int64)
        t = np.asarray(sorted(set(terms)), dtype=object)
        pos = np.searchsorted(self._vocab, t)
        pos = np.clip(pos, 0, len(self._vocab) - 1)
        ok = self._vocab[pos] == t
        return pos[ok]

    def _select(self, terms: list[str]) -> np.ndarray:
        """Indices of flat tokens whose term is in ``terms``."""
        codes = self._term_codes(terms)
        if len(codes) == 0:
            return np.empty(0, np.int64)
        if len(codes) == 1:
            m = self.codes == codes[0]
        else:
            m = np.isin(self.codes, codes)
        return np.nonzero(m)[0]

    def member_rows(self, terms: list[str]) -> np.ndarray:
        """Boolean row mask: row contains ANY of ``terms``."""
        out = np.zeros(self.n_rows, dtype=bool)
        sel = self._select(terms)
        if len(sel):
            out[self.row[sel]] = True
        return out

    def sloppy_phrase_rows(
        self, terms: list[str], slop: int
    ) -> np.ndarray:
        """Boolean row mask: row contains the phrase within ``slop``
        total extra gap — the scoring engine's greedy in-order chain
        (greedy minimizes the last position for a fixed head, so
        greedy-accept == exists-accept), on this module's packed
        (row, pos) int64 keys. No per-row Python."""
        base = np.int64(1) << np.int64(_POS_BITS)
        sels = [self._select([t]) for t in terms]
        if any(len(x) == 0 for x in sels):
            return np.zeros(self.n_rows, dtype=bool)
        keys = [
            self.row[x] * base + self.pos[x] for x in sels
        ]  # ascending: tokens are emitted row-major, pos-ascending
        cand = keys[0]
        prev = cand
        ok = np.ones(len(cand), bool)
        for kj in keys[1:]:
            pos = np.searchsorted(kj, prev + np.int64(1))
            valid = pos < len(kj)
            nxt = kj[np.clip(pos, 0, max(len(kj) - 1, 0))]
            valid &= (nxt // base) == (prev // base)
            ok &= valid
            prev = np.where(ok, nxt, prev)
            if not ok.any():
                return np.zeros(self.n_rows, dtype=bool)
        gap = (prev - cand).astype(np.int64)
        ok &= gap - (len(terms) - 1) <= slop
        out = np.zeros(self.n_rows, dtype=bool)
        out[(cand[ok] // base).astype(np.int64)] = True
        return out

    def phrase_rows(self, terms: list[str]) -> np.ndarray:
        """Boolean row mask: row contains the EXACT phrase (slop=0).

        Intersects packed (row, pos−j) keys: a head occurrence at
        position p survives iff every following term j sits at p+j."""
        base = np.int64(1) << np.int64(_POS_BITS)
        keys = np.empty(0, np.int64)
        for j, t in enumerate(terms):
            sel = self._select([t])
            # arithmetic (not bitwise) so pos-j < 0 yields a key no head
            # occurrence (pos >= 0) can ever equal
            kj = self.row[sel] * base + (self.pos[sel] - np.int64(j))
            keys = kj if j == 0 else keys[np.isin(keys, kj)]
            if len(keys) == 0:
                return np.zeros(self.n_rows, dtype=bool)
        out = np.zeros(self.n_rows, dtype=bool)
        out[keys // base] = True
        return out

    # dictionary expansion over the batch vocabulary (same callback
    # shapes LocalIndex/BM25Oracle feed expand_prefix_tree)
    def expand_prefix(self, _field: str, prefix: str) -> list[str]:
        v = self.vocab
        lo = np.searchsorted(v, prefix, side="left")
        hi = np.searchsorted(v, prefix + "\U0010ffff", side="right")
        return list(v[lo:hi])

    def expand_range(self, _field, lo, hi, il, ih) -> list[str]:
        v = self.vocab
        a = 0 if lo is None else np.searchsorted(
            v, lo, side="left" if il else "right"
        )
        b = len(v) if hi is None else np.searchsorted(
            v, hi, side="right" if ih else "left"
        )
        return list(v[a:b])

    def expand_fuzzy(self, _field, term, dist, transpose) -> list[str]:
        v = self.vocab
        return list(v[edit_within(term, v, dist, transpose)])

    def expand_regex(self, _field, pat) -> list[str]:
        v = self.vocab
        if len(v) == 0:
            return []
        # vectorized RE2 over the vocabulary (anchored = fullmatch);
        # with thousands of stored regex queries the old per-term
        # Python loop was O(vocab * queries) interpreter work per
        # batch. ONLY for patterns where RE2 and Python re agree: a
        # backslash class (\\w \\d \\b ...) is ASCII-only in RE2 but
        # Unicode in Python re (the scoring engine's semantics, and
        # the tokenizer emits Unicode tokens), and (?...) groups can
        # carry flags — those patterns keep the exact Python-re loop
        # so percolate matches mirror BM25Engine for every query both
        # accept.
        if "\\" not in pat and "(?" not in pat:
            try:
                m = pc.match_substring_regex(
                    pa.array(v, pa.string()), f"^(?:{pat})$"
                )
                return list(v[m.to_numpy(zero_copy_only=False)])
            except pa.ArrowInvalid:
                pass  # RE2 rejected it — Python re below
        rx = re.compile(pat)
        return [t for t in v if rx.fullmatch(t)]


def _validate(node) -> None:
    """Registration-time walk: reject stored queries the percolator
    cannot evaluate (today: non-``content`` fields; phrases — sloppy
    included — prefix/range/fuzzy/regex and boolean trees are all
    supported) when the registry is parsed — NOT mid-stream in a Ray
    worker, where a bad entry would fail the job per batch (or pass
    silently on empty batches)."""
    if node is None:
        return
    if isinstance(node, Clause):
        if node.field != "content":
            raise ValueError(
                f"percolate streams have no {node.field!r} field"
            )
        return
    for _occur, child in node.children:
        _validate(child)


def _eval(node, bt: _BatchTokens) -> np.ndarray:
    """Boolean row mask of ``node`` over the batch — mirrors the match
    rule of ``BM25Engine``'s scorer bit-for-bit (minus scores)."""
    if node is None:
        return np.zeros(bt.n_rows, dtype=bool)
    if isinstance(node, Clause):
        if node.match_all:
            return np.ones(bt.n_rows, dtype=bool)
        if node.const_score or node.blended or len(node.terms) == 1:
            return bt.member_rows(node.terms)
        if node.slop:
            return bt.sloppy_phrase_rows(node.terms, int(node.slop))
        return bt.phrase_rows(node.terms)
    musts = [_eval(c, bt) for o, c in node.children if o == MUST]
    shoulds = [_eval(c, bt) for o, c in node.children if o == SHOULD]
    nots = [_eval(c, bt) for o, c in node.children if o == MUST_NOT]
    if musts:
        acc = np.logical_and.reduce(musts)
    elif shoulds:
        acc = np.logical_or.reduce(shoulds)
    else:  # only MUST_NOT children: matches nothing (Lucene rule)
        return np.zeros(bt.n_rows, dtype=bool)
    for n in nots:
        acc &= ~n
    return acc


class Percolator:
    """``map_batches`` callable: parse the stored registry once per actor
    (``__init__``), evaluate every query per batch (``__call__``)."""

    def __init__(
        self,
        queries: dict[str, str],
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.parsed = {
            name: parse_query(q) for name, q in sorted(queries.items())
        }
        for node in self.parsed.values():
            _validate(node)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        names: list[str] = []
        ids: list[np.ndarray] = []
        id_type = t.schema.field(self.id_col).type
        if t.num_rows:
            bt = _BatchTokens(t[self.text_col], t.num_rows)
            doc_ids = t[self.id_col].to_numpy(zero_copy_only=False)
            for name, node in self.parsed.items():
                # max_expansions=None: the Lucene clause cap bounds
                # SCORED disjunction width; percolation builds membership
                # sets, so the batch-local expansion is uncapped — match
                # results never depend on batch boundaries
                node = expand_prefix_tree(
                    node,
                    bt.expand_prefix,
                    bt.expand_range,
                    bt.expand_fuzzy,
                    bt.expand_regex,
                    max_expansions=None,
                )
                hit = doc_ids[_eval(node, bt)]
                names.extend([name] * len(hit))
                ids.append(hit)
        return pa.table(
            {
                "query_name": pa.array(names, pa.string()),
                # preserve the stream's own id type (string ids, int32,
                # ...) instead of forcing int64
                self.id_col: pa.array(
                    np.concatenate(ids) if ids else [],
                    type=id_type,
                ),
            }
        )


def percolate_stream(
    docs: ray.data.Dataset,
    queries: dict[str, str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """Streaming form: the (query_name, id) match-pair Dataset, never
    touched by the driver — at 100 TB this is the shape to use, consumed
    by ``write_parquet`` on a partitioned sink (or a downstream stage).
    ``concurrency`` sizes the actor pool; registry parse cost is once
    per actor, so scale it to the input, not the registry."""
    from . import bind_ctor

    return docs.map_batches(
        bind_ctor(
            Percolator, queries=queries, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def percolate(
    docs: ray.data.Dataset,
    queries: dict[str, str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple = (1, 4),
) -> pd.DataFrame:
    """Match every doc against every stored query; (query_name, doc_id)
    pairs sorted for determinism (the oracle-gate form — driver-side
    materialization is fine for its bounded outputs; use
    ``percolate_stream`` for unbounded ones)."""
    out = percolate_stream(
        docs, queries, text_col=text_col, id_col=id_col,
        concurrency=concurrency,
    ).to_pandas()
    return (
        out.sort_values(["query_name", id_col])
        .reset_index(drop=True)
    )


# --- driver entry ----------------------------------------------------------

# One stored query per supported shape (SQL-oracled in __ray_entry__.py,
# entry ``percolate_matches``): AND, exact phrase, SHOULD+MUST_NOT, nested
# boolean, const term set, prefix / range / fuzzy / regex dictionary
# expansion, match-all.
STORED_QUERIES = {
    "dup_and_merge": "dup AND merge",
    "phrase_key_order": '"key order"',
    "spark_not_dup": "spark -dup",
    "nested_bool": "(key OR dup) AND sort",
    "set_rare": "IN [dup flink nosuchterm]",
    "prefix_win": "win*",
    "range_dup_merge": "[dup TO merge]",
    "fuzzy_spark": "spark~1",
    "regex_wnd": "/w[io]nd.*/",
    "sloppy_dup_sort": '"dup sort"~2',
    "all_docs": "*",
}


def percolate_matches(sf_dir: str) -> pd.DataFrame:
    # a single small parquet file reads as ONE block, which would
    # serialize the whole stream through one pool actor; split it so
    # the pool scales (a real corpus is many files = many blocks)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        override_num_blocks=8,
    )
    # pool sized for the sf-scale stream: more actors just pay spawn
    # cost on a sub-second job (measured 0.76 s at (1,4) vs 1.02 s at
    # (1,8)); the 1M-doc scale path uses percolate_stream with its own
    # concurrency (BASELINE.md: 80.6k docs/s at (4,30))
    return percolate(ds, STORED_QUERIES)
