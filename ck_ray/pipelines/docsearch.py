"""Search pipelines over the driver's ``documents`` table.

Maps ``documents(doc_id, text, lang, ...)`` onto the engine's corpus shape
``(repo, path, commit, lang, content)`` (path = the doc_id, so engine hits
map back to original ids), builds the SPIMI index once per sf_dir into a
/tmp cache, and exposes:

- ``bm25_topk``       full engine path; float64 scoring so the DuckDB SQL
                      oracle (same formula, double precision) matches to 4dp
- ``regex_match_docs``vectorized RE2 scan (the reference's regex mode)
- ``hybrid_rrf``      Reciprocal Rank Fusion of the regex and BM25 legs
                      (k=60, reference ``ck-engine/src/lib.rs:1024-1035``)
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..build import IndexConfig, build_index
from ..scoring import round_half_away
from ..query import BM25Engine

_INDEX_CACHE: dict[str, str] = {}


def _doc_corpus(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def to_corpus(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "repo": pa.array(["corpus"] * n, pa.string()),
                "path": pc.cast(t["doc_id"], pa.string()),
                "commit": pa.array(["0"] * n, pa.string()),
                "lang": t["lang"],
                "content": t["text"],
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")


# shared with the repetition-metrics curation op (same deterministic
# line rendering both sides of every oracle uses)
from ..corpus import wrap_lines as _wrap_lines  # noqa: E402


def documents_index(sf_dir: str, wrapped: bool = False) -> str:
    """Build (once, cached per sf_dir) the BM25 index over documents.

    ``wrapped=True`` builds a second index whose content is the 7-token
    line-wrapped rendering (same scores — see ``_wrap_lines``), used by
    the stored-snippet entry so previews are genuinely multi-line."""
    key = os.path.abspath(sf_dir) + ("#wrapped" if wrapped else "")
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    idx_dir = os.path.join(
        "/tmp/ck_ray_doc_index",
        key.strip("/").replace("/", "_").replace("#", "_"),
    )
    man_path = os.path.join(idx_dir, "manifest.json")
    if os.path.exists(man_path):
        import json

        man = json.load(open(man_path))
        if "num_serving_buckets" not in man or "doc_preview" not in man:
            import shutil

            shutil.rmtree(idx_dir)  # stale pre-serving/pre-snippet cache
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        if os.path.exists(idx_dir):
            import shutil

            shutil.rmtree(idx_dir)
        corpus = _doc_corpus(sf_dir)
        if wrapped:
            corpus = corpus.map_batches(
                lambda t: t.set_column(
                    t.schema.get_field_index("content"), "content",
                    _wrap_lines(t["content"]),
                ),
                batch_format="pyarrow",
            )
        build_index(
            corpus, idx_dir, IndexConfig(num_parts=8, batch_size=512)
        )
    _INDEX_CACHE[key] = idx_dir
    return idx_dir


def bm25_topk(
    sf_dir: str, query: str = "merge window batch", k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 over documents.text; float64 scores rounded to 4dp.

    (The f32 tantivy-faithful path is exercised against the pure-Python
    oracle in pytest; this float64 variant exists so the DuckDB SQL oracle
    — which computes in double — agrees bit-for-bit to 4dp.)"""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        # path column holds the original doc_id
        df = eng.search(query, top_k=k, with_metadata=True)
    finally:
        eng.close()
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out = pd.DataFrame(
        {
            "doc_id": df["path"].astype("int64"),
            "score": round_half_away(df["score"], 4),
        }
    )
    return out.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )


def bm25_explain(
    sf_dir: str, query: str = "merge window batch", k_probe: int = 16
) -> pd.DataFrame:
    """EXPLAIN (Lucene ``explain()`` / ES ``_explain``) for the global
    top-1 doc of ``query``: one row per matched term leaf carrying the
    full BM25 evidence — global df, the doc's tf and dl, and the 4dp
    contribution. The top-1 pick uses the shared rounded convention
    (round(score,4) desc, original doc_id asc), so the SQL oracle —
    which re-derives the same top doc and computes each term's
    ``idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` — selects the same
    doc and reproduces every row."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k_probe
        while True:
            df = eng.search(query, top_k=fetch, with_metadata=True)
            assert len(df) > 0, "probe query matched nothing"
            r = round_half_away(df["score"], 4)
            if len(df) < fetch or float(r[-1]) < float(r[0]):
                break  # the rank-1 rounded group is fully fetched
            fetch *= 4
        orig = df["path"].astype("int64")
        pick = sorted(zip(-r, orig, df["doc_id"]))[0]
        orig_id, internal = int(pick[1]), int(pick[2])
        ex = eng.explain(query, internal)
    finally:
        eng.close()
    rows = [
        (det["term"], det["df"], det["tf"], det["dl"], leaf["score"])
        for leaf in ex["leaves"]
        if leaf["matched"] and leaf["kind"] == "term"
        for det in leaf["details"]
    ]
    rows.sort()
    return pd.DataFrame(
        {
            "term": pd.Series([r[0] for r in rows], dtype="object"),
            "doc_id": pd.Series([orig_id] * len(rows), dtype="int64"),
            "df": pd.Series([r[1] for r in rows], dtype="int64"),
            "tf": pd.Series([r[2] for r in rows], dtype="int64"),
            "dl": pd.Series([r[3] for r in rows], dtype="int64"),
            "score": round_half_away(
                np.asarray([r[4] for r in rows], dtype=np.float64), 4
            ),
        }
    )


def bm25_snippets(
    sf_dir: str, query: str = "merge window batch", k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 with the reference's per-hit SNIPPET: the first 3 lines
    of the stored document (``JsonlSearchResult.snippet``,
    ck-core/src/lib.rs:264-374; preview rule ck-engine/src/lib.rs:794-798).
    The snippet is served from the index's stored ``preview`` field inside
    the DocShard actors — the corpus is never touched at query time.
    Runs over the line-wrapped twin index (identical scores to
    ``bm25_topk``; see ``_wrap_lines``) so previews are real 3-line cuts."""
    idx = documents_index(sf_dir, wrapped=True)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        df = eng.search(query, top_k=k, with_metadata=True)
    finally:
        eng.close()
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "snippet": pd.Series([], dtype="object")})
    out = pd.DataFrame(
        {
            "doc_id": df["path"].astype("int64"),
            "score": round_half_away(df["score"], 4),
            "snippet": df["preview"],
        }
    )
    return out.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )


def code_chunks(sf_dir: str) -> pd.DataFrame:
    """Chunk table over documents via the structural chunker entry point
    (``ck_ray.chunker.ast_chunk_batch``). The documents table is natural
    language, so every row takes the generic line-window path — which is
    exactly the part a SQL oracle can verify (window emission rule
    ``s == 0 OR s + 4 < n``); the AST path is pinned by pytest
    (tests/test_chunker.py) on real Python sources."""
    from ..chunker import ast_chunk_batch

    ds = _doc_corpus(sf_dir)
    out = (
        ds.map_batches(ast_chunk_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out["doc_id"] = out["path"].astype("int64")
    for c in ("chunk_id", "line_start", "line_end", "byte_start", "byte_end"):
        out[c] = out[c].astype("int64")
    return (
        out[
            ["doc_id", "chunk_id", "line_start", "line_end",
             "byte_start", "byte_end"]
        ]
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )


def bm25_boolean(
    sf_dir: str, query: str = "merge AND window -batch", k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 for a BOOLEAN query (tantivy QueryParser subset:
    AND/OR/NOT/+/-/parens). Same engine path as ``bm25_topk``; the DuckDB
    oracle expresses the conjunction + exclusion with joins."""
    return bm25_topk(sf_dir, query=query, k=k)


def _bm25_rounded_cut(
    sf_dir: str, query: str, k: int, eng: BM25Engine | None = None,
    offset: int = 0,
) -> pd.DataFrame:
    """Top-k with the CUT taken on the 4dp-ROUNDED score (doc_id-asc
    tie-break), so the k boundary is deterministic even when two docs'
    unrounded doubles differ only at the ulp level between the engine's
    ``log1p`` and the oracle's ``ln(1+x)`` (sf0.1 exposed exactly such a
    flip). Overfetches adaptively until the boundary rounded-score group
    is fully contained, so the rounded cut is exact, never clipped.
    ``offset`` pages past the first N rounded-rank rows (both
    boundaries — offset and offset+k — sit inside the closed fetch, so
    the page slice is deterministic too). A caller-provided ``eng`` is
    used as-is and left open."""
    caller_owns = eng is not None
    if eng is None:
        idx = documents_index(sf_dir)
        eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    cut = offset + k
    try:
        fetch = cut + 64
        while True:
            df = eng.search(query, top_k=fetch, with_metadata=True)
            if len(df) < fetch:
                break  # every match fetched
            r = round_half_away(df["score"], 4)
            if float(r[-1]) < float(r[cut - 1]):
                break  # boundary group closed
            fetch *= 4
    finally:
        if not caller_owns:
            eng.close()
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    out = pd.DataFrame(
        {
            "doc_id": df["path"].astype("int64"),
            "score": round_half_away(df["score"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .iloc[offset:cut]
        .reset_index(drop=True)
    )


def bm25_prefix(
    sf_dir: str, query: str = "s*", k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 for a PREFIX query (Lucene ``te*`` shape): each shard
    expands the prefix against its local term dictionary into a SHOULD
    disjunction (``query.expand_prefix_tree``; equal to global expansion
    because absent terms score no local docs and idf uses the global
    serving df). The DuckDB oracle expands with ``LIKE 's%'``."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_phrase_prefix(
    sf_dir: str, query: str = '"fast s"*', k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 for a PHRASE-PREFIX query (tantivy ``"a b"*``, the
    search-as-you-type shape): the last term expands against the
    dictionary and each expansion scores as an exact phrase sharing the
    head; the doc score sums the matching expansions (SHOULD). Oracle:
    LIKE expansion × positional adjacency chain per expanded term."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_phrase(
    sf_dir: str, query: str = '"merge window"', k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 for an exact PHRASE query: positional adjacency counting
    inside the shards (``query.py`` packed-key chain), phrase idf = sum of
    member-term idfs (tantivy ``Bm25Weight::for_terms``). The DuckDB
    oracle recomputes phrase tf from token positions (pos+1 chain)."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_range(
    sf_dir: str, query: str = "window OR [q TO spal]", k: int = 20
) -> pd.DataFrame:
    """Top-k mixing a scored term with a const-score RANGE query
    (tantivy ``[a TO b]`` / ``{a TO b}`` RangeQuery): each shard expands
    the bound interval against its local term dictionary and docs
    containing ANY interval term contribute exactly ``boost*1.0``
    (ConstScorer — no tf/idf), summed with the BM25 leg in child order.
    Oracle: BM25(window) + EXISTS(term in [q, spal))."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_termset(
    sf_dir: str, query: str = "IN [dup spark] fast", k: int = 20
) -> pd.DataFrame:
    """Top-k mixing a const-score TERM SET (tantivy ``field: IN [a b]``
    TermSetQuery — membership matches score ``1.0`` once, however many
    member terms the doc contains) with a scored term. Oracle:
    EXISTS(term in set) + BM25(fast)."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_matchall(
    sf_dir: str, query: str = "* -scan", k: int = 20
) -> pd.DataFrame:
    """Top-k for a MATCH-ALL query with an exclusion (tantivy AllQuery
    ``*`` under a MUST_NOT sibling): every live doc not containing the
    excluded term scores exactly 1.0 — ties break doc_id-asc, so the
    cut is the k lowest matching doc ids. Oracle: anti-join."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_fuzzy(
    sf_dir: str, query: str = "window spal~2", k: int = 20
) -> pd.DataFrame:
    """Top-k mixing a scored term with a FUZZY term query (Lucene
    ``term~N``; tantivy FuzzyTermQuery semantics): each shard expands the
    term against its local dictionary into the set of terms within edit
    distance N (vectorized bounded Levenshtein, ``strdist.edit_within``)
    and docs containing ANY expansion contribute exactly ``boost*1.0``
    (tantivy AutomatonWeight -> ConstScorer — no tf/idf), summed with the
    BM25 leg. ``spal`` is not itself a corpus term, so every match here
    is a genuine fuzzy hit. Oracle: BM25(window) +
    EXISTS(levenshtein(term,'spal') <= 2) via DuckDB's levenshtein()."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_regexterm(
    sf_dir: str, query: str = "window /s.*(k|m)/", k: int = 20
) -> pd.DataFrame:
    """Top-k mixing a scored term with a REGEX term query (Lucene
    ``/pat/`` syntax; tantivy RegexQuery semantics): each shard expands
    the anchored pattern against its local dictionary (whole-term
    ``fullmatch``) and docs containing ANY matching term contribute
    exactly ``boost*1.0`` (AutomatonWeight -> ConstScorer, same
    const-score family as fuzzy/range), summed with the BM25 leg.
    Oracle: BM25(window) + EXISTS(regexp_full_match(term, pat)) — the
    pattern uses only syntax Python re and DuckDB RE2 share."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_wildcard(
    sf_dir: str, query: str = "merge w?nd*w", k: int = 20
) -> pd.DataFrame:
    """Top-k mixing a scored term with a WILDCARD term query (Lucene
    ``WildcardQuery``: ``?`` = one char, ``*`` = any run; a `*` anywhere
    but trailing, or any `?`, distinguishes it from the scored prefix
    query — the same split Lucene's QueryParser makes). The parser
    rewrites the pattern onto the anchored-regex clause
    (``query._wildcard_to_regex``), so expansion, the global cap and
    const-score semantics are the regex query's, and docs containing ANY
    matching term contribute exactly ``boost*1.0``. Oracle: BM25(merge)
    + EXISTS(term LIKE 'w_nd%w') — LIKE's ``_``/``%`` are exactly
    ``?``/``*`` on the alnum-only dictionary."""
    return _bm25_rounded_cut(sf_dir, query, k)


def bm25_synonyms(
    sf_dir: str, query: str = "merge window", k: int = 20
) -> pd.DataFrame:
    """Query-time SYNONYMS (Lucene SynonymQuery / the ES synonym
    filter): the engine is configured with ``{"merge": ["batch"]}``, so
    the 'merge' leaf scores as ONE blended pseudo-term — union docs,
    per-doc tf = tf(merge) + tf(batch), idf from the blended df =
    max(df(merge), df(batch)) — NOT as a boolean OR (which would
    over-reward docs saying both). Oracle: the identical summed-tf /
    greatest-df expression per doc plus the ordinary 'window' leaf."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(
        idx, num_shards=2, dtype=np.float64,
        synonyms={"merge": ["batch"]},
    )
    try:
        return _bm25_rounded_cut(sf_dir, query, k, eng=eng)
    finally:
        eng.close()


def bm25_suggest(
    sf_dir: str, term: str = "mergw", size: int = 5
) -> pd.DataFrame:
    """TERM SUGGESTER (ES ``term`` suggest / Lucene DirectSpellChecker):
    spell-correction candidates for the typo ``mergw`` — dictionary
    terms within 2 Levenshtein edits ranked (distance asc, df desc,
    term asc), input excluded. All-integer state (distances + live
    dfs), so the SQL oracle — DuckDB ``levenshtein`` over the distinct
    term dictionary with per-term doc frequencies — reproduces the
    ranking exactly."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_suggest(term, size)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "term": pd.Series([r["text"] for r in res], dtype="object"),
            "distance": pd.Series(
                [r["distance"] for r in res], dtype="int64"
            ),
            "df": pd.Series([r["df"] for r in res], dtype="int64"),
        }
    )


def bm25_more_like_this(
    sf_dir: str,
    text: str = "window window merge fast spark",
    k: int = 20,
    max_query_terms: int = 3,
) -> pd.DataFrame:
    """MORE-LIKE-THIS (tantivy/Lucene MoreLikeThisQuery shape): select
    the input text's top terms by tf * BM25-idf (live global dfs from the
    shards, term-asc tiebreak, ``max_query_terms`` cut — here 3 of the 4
    distinct input terms survive, so the cut is actually exercised), then
    run the selected terms as an ordinary BM25 SHOULD disjunction.
    Oracle: the SAME selection ranked in SQL over the tokenized literal
    (tf from the literal, df/N from the corpus), then the standard BM25
    sum over the selected terms."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        terms = eng.select_like_terms(
            text, max_query_terms=max_query_terms, min_doc_freq=1
        )
        if not terms:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return _bm25_rounded_cut(sf_dir, " ".join(sorted(terms)), k, eng=eng)
    finally:
        eng.close()


def bm25_facet_counts(
    sf_dir: str, query: str = "merge AND window -batch",
    facet_field: str = "lang",
) -> pd.DataFrame:
    """FACET counts over the full match set (tantivy Count +
    TermsAggregation collectors): every matching doc — not the top-k —
    is counted into its facet bucket from shard-local metadata; shards
    return O(distinct facet values) integers and the driver sums them
    (doc partitioning makes the merge exact). Oracle: boolean match in
    SQL joined to documents, GROUP BY lang."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        total, facets = eng.search_facets(query, facet_field)
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            facet_field: pd.Series(sorted(facets), dtype="object"),
            "n_docs": pd.Series(
                [facets[v] for v in sorted(facets)], dtype="int64"
            ),
        }
    )
    assert int(out["n_docs"].sum()) == total  # collector consistency
    return out


def bm25_significant_langs(
    sf_dir: str, query: str = "merge window", field: str = "lang",
    size: int = 3,
) -> pd.DataFrame:
    """SIGNIFICANT-TERMS aggregation (ES ``significant_terms``, JLH
    heuristic) over the ``lang`` keyword field: which languages are
    anomalously frequent among the query's matches vs the whole corpus?
    Shards ship exact-int foreground/background counts; the driver
    scores once in float64 — ``(fg% - bg%) * (fg% / bg%)`` — keeps
    positive scores only, sorts score desc / value asc, cuts to
    ``size``. Oracle: the identical counts from GROUP BY lang and the
    identical double expression, bit-for-bit before the shared 4dp
    rounding."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_significant_terms(query, field, size)
    finally:
        eng.close()
    b = res["buckets"]
    return pd.DataFrame(
        {
            field: pd.Series([r["value"] for r in b], dtype="object"),
            "fg_count": pd.Series(
                [r["fg_count"] for r in b], dtype="int64"
            ),
            "bg_count": pd.Series(
                [r["bg_count"] for r in b], dtype="int64"
            ),
            "score": round_half_away(
                np.asarray([r["score"] for r in b], dtype=np.float64), 4
            ),
        }
    )


def bm25_delete_by_query(
    sf_dir: str, delete_q: str = "batch", probe_q: str = "merge window",
) -> pd.DataFrame:
    """DELETE-BY-QUERY (ES ``_delete_by_query``) end to end: build a
    THROWAWAY index over documents, tombstone every doc matching
    ``delete_q`` (one epoch, no posting bytes touched, stats adjusted
    exactly — see ``incremental.delete_by_query``), then report the
    per-lang facet counts of ``probe_q``'s matches on the mutated
    index. Oracle: docs matching (merge OR window) EXCEPT docs matching
    batch, grouped by lang — the tombstones must hide exactly the
    delete set from every later query. The index is rebuilt fresh per
    call (the op mutates it), in a temp dir, removed afterwards."""
    import shutil
    import tempfile

    from ck_ray.incremental import delete_by_query

    tmp = tempfile.mkdtemp(prefix="ck_ray_delq_")
    idx = os.path.join(tmp, "idx")
    try:
        build_index(
            _doc_corpus(sf_dir), idx,
            IndexConfig(num_parts=8, batch_size=512),
        )
        delete_by_query(idx, delete_q)
        eng = BM25Engine(idx, num_shards=2)
        try:
            # the delete set must be gone from its own match set
            assert len(eng.search_raw(delete_q, 10)[0]) == 0
            total, facets = eng.search_facets(probe_q, "lang")
        finally:
            eng.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = pd.DataFrame(
        {
            "lang": pd.Series(sorted(facets), dtype="object"),
            "n_docs": pd.Series(
                [facets[v] for v in sorted(facets)], dtype="int64"
            ),
        }
    )
    assert int(out["n_docs"].sum()) == total
    return out


def bm25_agg_histogram(
    sf_dir: str, query: str = "merge AND window", interval: int = 64
) -> pd.DataFrame:
    """HISTOGRAM aggregation over the full match set (tantivy's
    ES-compatible aggregation module): every matching doc's ``n_bytes``
    fast field buckets into ``floor(v/interval)*interval``; shards
    return O(buckets) integer counts and the driver sums them. Oracle:
    boolean match in SQL, ``(octet_length(text)//interval)*interval``
    GROUP BY."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query,
            {"kind": "histogram", "field": "n_bytes", "interval": interval},
        )
    finally:
        eng.close()
    b = res["buckets"]
    return pd.DataFrame(
        {
            "bucket": pd.Series(sorted(b), dtype="int64"),
            "n_docs": pd.Series([b[k] for k in sorted(b)], dtype="int64"),
        }
    )


def bm25_agg_stats(
    sf_dir: str, query: str = "spark merge"
) -> pd.DataFrame:
    """STATS aggregation (count/min/max/sum/avg) of the ``dl_content``
    fast field (analyzer token count per doc) over the full match set.
    All shard state is exact int64, so the merge has no float drift;
    avg is ONE IEEE double divide of exact ints at the driver — the SQL
    oracle performs the identical divide."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query, {"kind": "stats", "field": "dl_content"}
        )
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "cnt": pd.Series([res["count"]], dtype="int64"),
            "min_v": pd.Series([res["min"]], dtype="int64"),
            "max_v": pd.Series([res["max"]], dtype="int64"),
            "sum_v": pd.Series([res["sum"]], dtype="int64"),
            "avg_v": pd.Series([res["avg"]], dtype="float64"),
        }
    )


def bm25_filters_agg(
    sf_dir: str,
    filters: tuple = (
        ("has_merge", "merge"),
        ("win_not_batch", "window -batch"),
    ),
) -> pd.DataFrame:
    """FILTERS bucket aggregation (ES ``filters``): N named filter
    queries — full query-language expressions, boolean NOT included —
    each reduced under the same stats sub-aggregation, in ONE shard
    fan-out (the dual of the multi-agg request). All bucket state is
    exact int64; avg is one IEEE divide per bucket. Oracle: one stats
    SELECT per filter's match set, UNION ALL with the bucket label."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_filters_agg(
            dict(filters), {"kind": "stats", "field": "dl_content"}
        )
    finally:
        eng.close()
    names = [n for n, _ in filters]
    return pd.DataFrame(
        {
            "bucket": pd.Series(names, dtype="object"),
            "cnt": pd.Series(
                [res[n]["count"] for n in names], dtype="int64"
            ),
            "min_v": pd.Series(
                [res[n]["min"] for n in names], dtype="int64"
            ),
            "max_v": pd.Series(
                [res[n]["max"] for n in names], dtype="int64"
            ),
            "sum_v": pd.Series(
                [res[n]["sum"] for n in names], dtype="int64"
            ),
            "avg_v": pd.Series(
                [res[n]["avg"] for n in names], dtype="float64"
            ),
        }
    )


def bm25_agg_range(
    sf_dir: str, query: str = "window", edges: tuple = (200, 400, 800)
) -> pd.DataFrame:
    """RANGE aggregation over ``n_bytes`` (ES semantics: bucket i covers
    ``[edges[i-1], edges[i])``, open-ended ends labeled ``*``). Empty
    ranges are reported with count 0 — the label set is determined by
    the spec, not the data (ES contract)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query,
            {"kind": "range", "field": "n_bytes", "edges": list(edges)},
        )
    finally:
        eng.close()
    bounds = ["*", *map(str, edges), "*"]
    labels = [f"{bounds[i]}-{bounds[i + 1]}" for i in range(len(edges) + 1)]
    out = pd.DataFrame(
        {
            "bucket": pd.Series(labels, dtype="object"),
            "n_docs": pd.Series(
                [res["ranges"].get(l, 0) for l in labels], dtype="int64"
            ),
        }
    )
    # byte-lexicographic label order, matching the SQL oracle's ORDER BY
    return out.sort_values("bucket").reset_index(drop=True)


def bm25_agg_percentiles(
    sf_dir: str, query: str = "merge"
) -> pd.DataFrame:
    """PERCENTILES aggregation of ``dl_content`` over the full match
    set — EXACT where ES/tantivy would sketch: shards ship VALUE ->
    COUNT maps (O(distinct values), bounded for doc-stat fields), the
    driver merges and takes the discrete quantile (the ceil(q*n)-th
    smallest, 1-indexed). The SQL oracle performs the identical double
    multiply + ceil over a row_number ranking, so ranks are
    bit-identical."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query, {"kind": "percentiles", "field": "dl_content"}
        )
    finally:
        eng.close()
    qs = sorted(res["percentiles"])
    return pd.DataFrame(
        {
            "q": pd.Series(qs, dtype="float64"),
            "value": pd.Series(
                [res["percentiles"][q] for q in qs], dtype="int64"
            ),
        }
    )


def bm25_facet_stats(
    sf_dir: str, query: str = "merge window",
    facet_field: str = "lang", value_field: str = "dl_content",
) -> pd.DataFrame:
    """SUB-AGGREGATION (ES terms bucket + nested stats): per-lang exact
    stats of the analyzer token count over the full match set. All
    cross-shard state is int64; avg is one IEEE divide per bucket,
    replicated in SQL."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_facet_stats(query, facet_field, value_field)
    finally:
        eng.close()
    langs = sorted(res)
    return pd.DataFrame(
        {
            facet_field: pd.Series(langs, dtype="object"),
            "cnt": pd.Series(
                [res[v]["count"] for v in langs], dtype="int64"
            ),
            "min_v": pd.Series(
                [res[v]["min"] for v in langs], dtype="int64"
            ),
            "max_v": pd.Series(
                [res[v]["max"] for v in langs], dtype="int64"
            ),
            "sum_v": pd.Series(
                [res[v]["sum"] for v in langs], dtype="int64"
            ),
            "avg_v": pd.Series(
                [res[v]["avg"] for v in langs], dtype="float64"
            ),
        }
    )


def bm25_multi_agg(
    sf_dir: str, query: str = "merge window batch"
) -> pd.DataFrame:
    """One-pass MULTI-AGGREGATION (the ES multi-agg request body):
    stats over BOTH numeric fast fields ride a single match-set
    evaluation per shard — one fan-out, one TAAT pass, N reductions.
    The entry also asserts the one-pass results equal the two
    single-pass calls (collector consistency)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    specs = {
        "nb": {"kind": "stats", "field": "n_bytes"},
        "dl": {"kind": "stats", "field": "dl_content"},
    }
    try:
        res = eng.search_aggregate_multi(query, specs)
        for name, spec in specs.items():
            assert res[name] == eng.search_aggregate(query, spec)
    finally:
        eng.close()
    nb, dl = res["nb"], res["dl"]
    assert nb["count"] == dl["count"]
    return pd.DataFrame(
        {
            "cnt": pd.Series([nb["count"]], dtype="int64"),
            "nb_min": pd.Series([nb["min"]], dtype="int64"),
            "nb_max": pd.Series([nb["max"]], dtype="int64"),
            "nb_sum": pd.Series([nb["sum"]], dtype="int64"),
            "nb_avg": pd.Series([nb["avg"]], dtype="float64"),
            "dl_min": pd.Series([dl["min"]], dtype="int64"),
            "dl_max": pd.Series([dl["max"]], dtype="int64"),
            "dl_sum": pd.Series([dl["sum"]], dtype="int64"),
            "dl_avg": pd.Series([dl["avg"]], dtype="float64"),
        }
    )


def bm25_cardinality(
    sf_dir: str, query: str = "merge", field: str = "lang"
) -> pd.DataFrame:
    """CARDINALITY aggregation: exact distinct count of a facet field
    over the full match set. Shards return their distinct-value SETS
    (bounded by field cardinality, never by matches) and the driver
    unions — exact where ES would sketch (HyperLogLog is the scale path
    for unbounded-cardinality fields; this engine already ships one in
    ``approx_distinct_terms``)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query, {"kind": "cardinality", "field": field}
        )
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "n_matches": pd.Series([res["matches"]], dtype="int64"),
            "n_values": pd.Series([res["cardinality"]], dtype="int64"),
        }
    )


def bm25_top_hits_per_lang(
    sf_dir: str, query: str = "merge window", k: int = 3
) -> pd.DataFrame:
    """Per-facet-bucket top-k (the ES ``terms`` + ``top_hits``
    composite): top-k BM25 hits within every ``lang`` bucket of the
    full match set. Production path: shards return per-bucket local
    top-k, driver merges O(shards * buckets * k) rows. For the oracle
    the cut must be taken on the 4dp-ROUNDED score with original-doc-id
    tie-break (same reasoning as ``_bm25_rounded_cut``), so this entry
    grows the per-bucket fetch until every bucket is fully drained
    (merged count < fetch means every shard exhausted the bucket), then
    re-sorts and cuts exactly."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            hits = eng.search_top_hits(query, "lang", top_k=fetch)
            if all(len(c[0]) < fetch for c in hits.values()):
                break
            fetch *= 4
    finally:
        eng.close()
    frames = []
    for lang in sorted(hits):
        _, scores, paths = hits[lang]
        b = pd.DataFrame(
            {
                "lang": pd.Series([lang] * len(paths), dtype="object"),
                "doc_id": paths.astype("int64"),
                "score": round_half_away(scores, 4),
            }
        )
        b = b.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k)
        frames.append(b)
    if not frames:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype="object"),
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    return pd.concat(frames, ignore_index=True)


def bm25_paged(
    sf_dir: str, query: str = "merge window", k: int = 10,
    offset: int = 10,
) -> pd.DataFrame:
    """PAGE 2 of the ranked list (tantivy ``TopDocs::and_offset``, the
    deep-pagination shape): the engine's ``offset`` parameter fetches
    offset+k per shard and the driver discards the first offset merged
    rows — this entry additionally takes both page boundaries on the
    4dp-rounded score so the SQL ``LIMIT k OFFSET offset`` oracle is
    deterministic. Sanity: the engine's native offset path must agree
    with its own page-1 list before the rounded re-cut."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        # native engine offset vs slicing the full list: identical
        d_all, s_all = eng.search_raw(query, top_k=offset + k)
        d_off, s_off = eng.search_raw(query, top_k=k, offset=offset)
        assert list(d_off) == list(d_all[offset:])
        assert list(s_off) == list(s_all[offset:])
        return _bm25_rounded_cut(sf_dir, query, k, eng=eng, offset=offset)
    finally:
        eng.close()


def bm25_search_after(
    sf_dir: str, query: str = "merge window", k: int = 8,
    pages: int = 3,
) -> pd.DataFrame:
    """Cursor deep pagination (ES ``search_after``): walk ``pages``
    pages of size ``k`` with the raw ``(score, doc_id)`` cursor, assert
    the walk reconstructs the offset path's ranking exactly (every page
    costs O(shards * k) — offset paging's fetch grows O(offset + k),
    which is the scale difference this API exists for), and return the
    FINAL page under the 4dp-rounded deterministic cut so the SQL
    ``LIMIT k OFFSET (pages-1)*k`` oracle compares exactly."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        walked_docs: list = []
        walked_scores: list = []
        cursor = None
        for _ in range(pages):
            d, s = eng.search_after(query, after=cursor, top_k=k)
            if len(d) == 0:
                break
            walked_docs.extend(d.tolist())
            walked_scores.extend(s.tolist())
            cursor = (float(s[-1]), int(d[-1]))
        # the cursor walk must equal one deep fetch, page for page
        d_all, s_all = eng.search_raw(query, top_k=pages * k)
        assert walked_docs == d_all[: len(walked_docs)].tolist()
        assert walked_scores == s_all[: len(walked_scores)].tolist()
        return _bm25_rounded_cut(
            sf_dir, query, k, eng=eng, offset=(pages - 1) * k
        )
    finally:
        eng.close()


def bm25_dismax(
    sf_dir: str, clauses: tuple = ("merge window", "spark"),
    tie: float = 0.3, k: int = 15,
) -> pd.DataFrame:
    """DisjunctionMax ranking (Lucene/ES ``dis_max``, tantivy
    ``DisjunctionMaxQuery``): per doc, ``best + tie * (total - best)``
    over the clause scores — "best field wins" with a tie-breaker
    instead of the boolean OR's sum. Engine scoring runs in float64
    with that exact operation order, so the SQL oracle (per-clause BM25
    via FULL OUTER JOIN, then ``greatest(s1,s2) + tie*((s1+s2) -
    greatest(s1,s2))``) reproduces it bit-for-bit before the shared 4dp
    rounded cut."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            res = eng.search_dismax(list(clauses), tie=tie, top_k=fetch)
            if len(res["doc_ids"]) < fetch:
                break
            r = round_half_away(res["scores"], 4)
            if float(r[-1]) < float(r[k - 1]):
                break  # rounded boundary group closed
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "score": round_half_away(res["scores"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_boosting(
    sf_dir: str, positive: str = "merge window", negative: str = "scan",
    negative_boost: float = 0.5, k: int = 15,
) -> pd.DataFrame:
    """BOOSTING query (the Lucene/ES ``boosting`` compound): rank by
    BM25(positive), demoting — never excluding — docs that also match
    the negative query by one float64 multiply with ``negative_boost``.
    The soft alternative to ``-scan``'s hard NOT. The SQL oracle is the
    positive OR-sum per doc times ``CASE WHEN doc matches negative THEN
    0.5 ELSE 1 END`` — the identical single multiply, bit-for-bit
    before the shared 4dp rounded cut."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            res = eng.search_boosting(
                positive, negative, negative_boost, top_k=fetch
            )
            if len(res["doc_ids"]) < fetch:
                break
            r = round_half_away(res["scores"], 4)
            if float(r[-1]) < float(r[k - 1]):
                break  # rounded boundary group closed
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "score": round_half_away(res["scores"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_function_score(
    sf_dir: str, query: str = "merge window", field: str = "dl_content",
    factor: float = 1.0, k: int = 15,
) -> pd.DataFrame:
    """FUNCTION-SCORE with a FIELD-VALUE-FACTOR (ES ``function_score``
    + ``field_value_factor``): rank by ``bm25 * log1p(factor * dl)`` —
    relevance times a document-length prior, the classic
    "boost substantial documents" shape, computed from the fast field
    with no reindex. Oracle: the per-doc BM25 OR-sum times
    ``ln(1 + dl)`` from the same token counts (the engine's ``log1p``
    vs SQL ``ln(1+x)`` ulp is absorbed by the shared 4dp rounded cut,
    the same contract every BM25 idf entry relies on)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            res = eng.search_function_score(
                query, field, factor=factor, modifier="log1p",
                boost_mode="multiply", top_k=fetch,
            )
            if len(res["doc_ids"]) < fetch:
                break
            r = round_half_away(res["scores"], 4)
            if float(r[-1]) < float(r[k - 1]):
                break  # rounded boundary group closed
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "score": round_half_away(res["scores"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_rescore(
    sf_dir: str, query: str = "merge window",
    rescore_query: str = '"merge window"', window: int = 40,
    qw: float = 1.0, rw: float = 2.0, k: int = 15,
) -> pd.DataFrame:
    """RESCORE (the ES two-phase ``rescore`` request): a cheap OR
    recall pass ranks the corpus, then the EXACT PHRASE precision pass
    re-scores only the top-``window`` docs — combined =
    ``qw*primary + rw*secondary`` (score_mode total). The window cut
    uses raw float64 (score desc, doc_id asc) order, bit-identical in
    SQL; the oracle re-derives the window, scores the phrase via
    position-adjacency pairs, and applies the same two multiplies and
    one add."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        res = eng.search_rescore(
            query, rescore_query, window_size=window,
            query_weight=qw, rescore_query_weight=rw, top_k=window,
        )
        # internal doc_id -> original id via the stored path metadata
        # of the same primary window
        m = eng.search(query, top_k=window, with_metadata=True)
    finally:
        eng.close()
    id_map = dict(
        zip(m["doc_id"].tolist(), m["path"].astype("int64").tolist())
    )
    out = pd.DataFrame(
        {
            "doc_id": [
                id_map[int(d)] for d in res["doc_ids"].tolist()
            ],
            "score": round_half_away(res["scores"], 4),
        }
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_min_should_match(
    sf_dir: str, terms: tuple = ("merge", "window", "batch"),
    m: int = 2, k: int = 15,
) -> pd.DataFrame:
    """Boolean OR with ``minimum_should_match=2`` of 3 term clauses
    (the Lucene/ES parameter; tantivy
    ``BooleanQuery::with_minimum_required_clauses``): docs matching
    only one term are excluded, the rest score the sum of their
    matching term scores. The SQL oracle is the per-term BM25 table
    grouped per doc with ``HAVING count(*) >= m``."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            res = eng.search_min_should(list(terms), m, top_k=fetch)
            if len(res["doc_ids"]) < fetch:
                break
            r = round_half_away(res["scores"], 4)
            if float(r[-1]) < float(r[k - 1]):
                break  # rounded boundary group closed
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "score": round_half_away(res["scores"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_agg_extended_stats(
    sf_dir: str, query: str = "merge"
) -> pd.DataFrame:
    """EXTENDED_STATS aggregation (the ES shape): count/min/max/sum
    plus sum_of_squares, population variance and std_deviation of the
    ``dl_content`` fast field over the full match set. Shards ship
    exact big-int moments (Python ints — no int64 overflow at any doc
    count); the driver derives variance as ONE double divide of the
    exact integer ``n*ssq - sum^2`` (>= 0 by Cauchy-Schwarz) and std as
    its IEEE sqrt — the SQL oracle performs the identical HUGEINT ->
    DOUBLE conversion, divide and sqrt, so all three doubles match
    bit-for-bit."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_aggregate(
            query, {"kind": "extended_stats", "field": "dl_content"}
        )
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "cnt": pd.Series([res["count"]], dtype="int64"),
            "min_v": pd.Series([res["min"]], dtype="int64"),
            "max_v": pd.Series([res["max"]], dtype="int64"),
            "sum_v": pd.Series([res["sum"]], dtype="int64"),
            "sum_sq": pd.Series([res["sum_sq"]], dtype="int64"),
            "avg_v": pd.Series([res["avg"]], dtype="float64"),
            "var_v": pd.Series([res["variance"]], dtype="float64"),
            "std_v": pd.Series([res["std_deviation"]], dtype="float64"),
        }
    )


def bm25_sort_by_field(
    sf_dir: str, query: str = "window", field: str = "n_bytes",
    k: int = 15,
) -> pd.DataFrame:
    """Top-k of the match set ordered by a numeric FAST FIELD instead
    of the BM25 score (tantivy ``TopDocs::order_by_u64_field``).
    Comparisons are exact int64, so unlike the score entries no
    rounding is involved; the oracle tie-break is the ORIGINAL doc id,
    so the entry overfetches until the boundary VALUE group is fully
    contained (strictly closed: last fetched value < k-th value) and
    re-cuts on (value desc, original id asc) — airtight because values
    compare exactly."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        fetch = k + 64
        while True:
            res = eng.search_sort_by_field(query, field, top_k=fetch)
            v = res["values"]
            if len(v) < fetch or int(v[-1]) < int(v[k - 1]):
                break
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "n_bytes": v.astype("int64"),
        }
    )
    return (
        out.sort_values(["n_bytes", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_phrase_slop(
    sf_dir: str, query: str = '"merge window batch"~2', k: int = 20
) -> pd.DataFrame:
    """Top-k BM25 for a SLOPPY phrase (tantivy ``"a b"~N`` syntax,
    greedy in-order chain semantics — see ``Clause.slop``). The oracle
    replicates the greedy chain as nested min-position CTEs, so the slop
    rule itself is SQL-verified, not just the score arithmetic."""
    return _bm25_rounded_cut(sf_dir, query, k)


# Fixed evaluation set for the retrieval-quality harness (the reference's
# benchmarks/swe-bench/run.py Recall@K shape, re-expressed over the driver's
# documents table: each query IS the phrase whose containment defines its
# relevant set). Two single-token words per phrase by construction.
QUALITY_QUERIES = (
    "big table",
    "customer order",
    "hash join",
    "merge window",
    "scan filter",
    "slow query",
    "sort merge",
    "stream agg",
)


def retrieval_quality(
    sf_dir: str,
    queries: tuple[str, ...] = QUALITY_QUERIES,
    k: int = 10,
) -> pd.DataFrame:
    """Retrieval-quality harness: Recall@K and MRR@K of the BM25 engine
    against deterministic phrase-containment ground truth (the reference's
    only end-to-end quality metric, ``benchmarks/swe-bench/run.py`` —
    there: did the patched file appear in the top-K; here: did the docs
    containing the literal phrase).

    Ground truth is a DISTRIBUTED vectorized substring scan (one
    ``match_substring`` kernel per query per batch — the (query, doc)
    pairs that leave the scan number ~tens, never the corpus). Ranking is
    the real engine path (doc-partitioned shard actors, float64), and
    ranks are taken on 4-decimal-rounded scores with the doc_id-asc
    tiebreak so the ordering is exactly the one the ``bm25_topk`` oracle
    already proves score-identical in SQL."""
    import pyarrow.compute as _pc

    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        ranked: dict[str, pd.DataFrame] = {}
        for q in queries:
            df = eng.search(q, top_k=10**9, with_metadata=True)
            r = pd.DataFrame(
                {
                    "doc_id": df["path"].astype("int64"),
                    "score": round_half_away(df["score"], 4),
                }
            ).sort_values(["score", "doc_id"], ascending=[False, True])
            r["rank"] = np.arange(1, len(r) + 1)
            ranked[q] = r.reset_index(drop=True)
    finally:
        eng.close()

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    qlist = list(queries)

    def rel_scan(t: pa.Table) -> pa.Table:
        qs: list[pa.Array] = []
        ids: list[pa.Array] = []
        for qi, phrase in enumerate(qlist):
            m = _pc.match_substring(t["text"], phrase)
            hit = t.filter(m)["doc_id"]
            qs.append(pa.array(np.full(len(hit), qi, np.int32)))
            ids.append(hit.combine_chunks().cast(pa.int64()))
        return pa.table(
            {"query_id": pa.concat_arrays(qs), "doc_id": pa.concat_arrays(ids)}
        )

    rel = ds.map_batches(rel_scan, batch_format="pyarrow").to_pandas()
    if "query_id" not in rel.columns:  # no phrase matched anywhere
        rel = pd.DataFrame({"query_id": pd.Series([], dtype="int32"),
                            "doc_id": pd.Series([], dtype="int64")})
    rows = []
    for qi, q in enumerate(qlist):
        relevant = set(rel.loc[rel["query_id"] == qi, "doc_id"].tolist())
        top = ranked[q].head(k)
        hit_ranks = top.loc[top["doc_id"].isin(relevant), "rank"]
        hits = int(len(hit_ranks))
        first = int(hit_ranks.min()) if hits else 0
        n_rel = len(relevant)
        rows.append(
            {
                "query": q,
                "n_relevant": n_rel,
                "hits_at_k": hits,
                "first_rank": first,
                # half-away-from-zero (DuckDB round()), NOT Python's
                # banker's round — exact-dyadic ties like 1/128 diverge
                "recall_at_k": (
                    float(round_half_away(hits / n_rel, 6))
                    if n_rel else 0.0
                ),
                "mrr_at_k": (
                    float(round_half_away(1.0 / first, 6))
                    if first else 0.0
                ),
            }
        )
    out = pd.DataFrame(rows).sort_values("query").reset_index(drop=True)
    for c in ("n_relevant", "hits_at_k", "first_rank"):
        out[c] = out[c].astype("int64")
    return out


def regex_match_docs(sf_dir: str, pattern: str = "merge.*window.*batch") -> pd.DataFrame:
    """doc_ids whose text matches an RE2 pattern — vectorized scan."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def scan(t: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(t["text"], pattern)
        return pa.table({"doc_id": t.filter(m)["doc_id"]})

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def rrf_fuse(
    rankings: list[list], k: int = 20, rrf_k: int = 60,
    key: str = "doc_id",
) -> pd.DataFrame:
    """Reciprocal Rank Fusion: score = sum over lists of
    1/(rrf_k + rank), rank 1-based per list; published score rounded
    6dp, ordered (rrf desc, key asc), cut to ``k``. ONE definition
    shared by every hybrid consumer (entries, REPL) so the fusion
    constant / rounding / tie-break stay bit-identical to their SQL
    oracles. Keys keep their own type (int doc ids or string
    paths)."""
    ranks: dict = {}
    for lst in rankings:
        for r, d in enumerate(lst, start=1):
            ranks[d] = ranks.get(d, 0.0) + 1.0 / (rrf_k + r)
    out = pd.DataFrame(
        {
            key: list(ranks),
            "rrf_score": round_half_away(list(ranks.values()), 6),
        }
    )
    out = out.sort_values(
        ["rrf_score", key], ascending=[False, True]
    ).head(k)
    if out[key].map(lambda v: isinstance(v, (int, np.integer))).all():
        out[key] = out[key].astype("int64")
    return out.reset_index(drop=True)


def hybrid_rrf(
    sf_dir: str,
    query: str = "merge window batch",
    pattern: str | None = None,
    k: int = 20,
    rrf_k: int = 60,
) -> pd.DataFrame:
    """Reciprocal Rank Fusion of the regex leg and the BM25 leg
    (reference hybrid mode: score = sum 1/(60+rank), rank 1-based per
    list, sort desc, truncate)."""
    pattern = pattern or ".*".join(query.split())
    lex = bm25_topk(sf_dir, query, k=max(k, 100))
    rex = regex_match_docs(sf_dir, pattern)
    return rrf_fuse(
        [lex["doc_id"].tolist(), rex["doc_id"].tolist()], k, rrf_k
    )


def bm25_span_near(
    sf_dir: str, terms: tuple[str, ...] = ("merge", "window"),
    slop: int = 4, in_order: bool = False, k: int = 20,
) -> pd.DataFrame:
    """Proximity search (Lucene SpanNearQuery / ES ``span_near``):
    docs where the terms co-occur within len(terms)+slop positions,
    ranked by MINIMAL covering window asc (proximity as relevance),
    doc_id asc. Engine computes windows from the positional postings
    (anchor-per-occurrence vectorized scan, ``query.py
    query_span_near``); the oracle recomputes min |pa-pb|+1 from the
    ``tokp`` CTE. ``path`` carries the original documents.doc_id."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        # full match set (collector-style, like facets): the final cut
        # ties on the ORIGINAL doc_id, which only exists after the
        # path->id mapping, so a per-shard internal-id cut would keep a
        # different 20 among window ties
        df = eng.search_span_near(
            list(terms), slop=slop, in_order=in_order, top_k=None,
            with_meta=True,
        )
    finally:
        eng.close()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "min_window": pd.Series([], dtype="int64"),
            }
        )
    out = pd.DataFrame(
        {
            "doc_id": df["path"].astype("int64"),
            "min_window": df["min_window"].astype("int64"),
        }
    )
    return (
        out.sort_values(["min_window", "doc_id"], ascending=[True, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_composite_agg(
    sf_dir: str, query: str = "merge window", size: int = 5,
    interval: int = 64,
) -> pd.DataFrame:
    """COMPOSITE aggregation (ES composite: multi-source bucket keys
    with after_key pagination): buckets of (lang terms, n_bytes
    histogram) over the `merge OR window` match set, walked page by
    page — the entry concatenates EVERY page and asserts the walk
    equals the one-shot bucket list, proving after_key covers the key
    space exactly once. Oracle: GROUP BY lang, (strlen//interval)."""
    sources = [
        {"field": "lang", "type": "terms"},
        {"field": "n_bytes", "type": "histogram", "interval": interval},
    ]
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        pages = []
        after = None
        while True:
            buckets, after = eng.search_composite_agg(
                query, sources, size=size, after=after
            )
            if len(buckets) == 0:
                break
            assert len(buckets) <= size
            pages.append(buckets)
            if after is None:
                break
        oneshot, _ = eng.search_composite_agg(query, sources, size=10**6)
    finally:
        eng.close()
    out = (
        pd.concat(pages, ignore_index=True)
        if pages
        else oneshot.iloc[0:0]
    )
    assert out.equals(oneshot)  # pagination == one shot, exactly once
    return pd.DataFrame(
        {
            "lang": out["lang"].astype("object"),
            "bucket": out["n_bytes"].astype("int64"),
            "n_docs": out["n_docs"].astype("int64"),
        }
    )


def bm25_complete(
    sf_dir: str, prefix: str = "me", size: int = 15
) -> pd.DataFrame:
    """COMPLETION suggester (ES completion / search-as-you-type over
    the index dictionary): terms starting with ``prefix`` ranked by
    document frequency desc, term asc, cut to ``size``. Oracle: LIKE
    over the analyzer CTE with count(DISTINCT doc_id)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        got = eng.suggest_complete(prefix, size=size)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "term": pd.Series([t for t, _ in got], dtype="object"),
            "df": pd.Series([d for _, d in got], dtype="int64"),
        }
    )


def bm25_adjacency_matrix(sf_dir: str) -> pd.DataFrame:
    """ADJACENCY-MATRIX aggregation (ES adjacency_matrix): doc counts
    for three named filters and their pairwise intersections — the
    co-occurrence collector. Keys sorted; empty buckets omitted (ES).
    Oracle: membership CTE + pairwise joins."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        m = eng.search_adjacency_matrix(
            {"merge": "merge", "window": "window", "batch": "batch"}
        )
    finally:
        eng.close()
    keys = sorted(m)
    return pd.DataFrame(
        {
            "key": pd.Series(keys, dtype="object"),
            "doc_count": pd.Series([m[k] for k in keys], dtype="int64"),
        }
    )


def bm25_rare_terms(
    sf_dir: str, max_doc_count: int = 400, size: int = 20
) -> pd.DataFrame:
    """RARE-TERMS aggregation (ES ``rare_terms``, exact): index
    dictionary terms with live global df <= ``max_doc_count``, ranked
    df asc / term asc — the long-tail counterpart of the completion /
    terms aggs. Single-epoch path is one vectorized serving-``df``
    column scan per shard (no posting decodes, no extra rounds).
    Oracle: GROUP BY term HAVING count(DISTINCT doc_id) <= cap."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        got = eng.search_rare_terms(max_doc_count, size=size)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "term": pd.Series([r["term"] for r in got], dtype="object"),
            "df": pd.Series([r["df"] for r in got], dtype="int64"),
        }
    )


def bm25_significant_text(
    sf_dir: str, query: str = "merge AND window", size: int = 12,
    min_doc_count: int = 3,
) -> pd.DataFrame:
    """SIGNIFICANT-TEXT aggregation (ES ``significant_text``, JLH):
    free-text terms anomalously frequent in the query's matching docs
    vs the whole corpus — exact integer (fg, bg) doc counts merged
    across doc-partitioned shards, query's own terms excluded, JLH
    scored once in float64 driver-side. Oracle: the identical counts
    from the token CTE and the identical double expression."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_significant_text(
            query, size=size, min_doc_count=min_doc_count
        )
    finally:
        eng.close()
    b = res["buckets"]
    return pd.DataFrame(
        {
            "term": pd.Series([r["term"] for r in b], dtype="object"),
            "fg_count": pd.Series(
                [r["fg_count"] for r in b], dtype="int64"
            ),
            "bg_count": pd.Series(
                [r["bg_count"] for r in b], dtype="int64"
            ),
            "score": round_half_away(
                np.asarray([r["score"] for r in b], dtype=np.float64), 4
            ),
        }
    )


def bm25_phrase_suggest(
    sf_dir: str, text: str = "mergw windoq", size: int = 5,
    max_edits: int = 1, num_candidates: int = 5,
) -> pd.DataFrame:
    """PHRASE SUGGESTER — "did you mean" (ES ``phrase`` suggest):
    per-token fuzzy candidates from the dictionary, whole corrected
    phrases ranked by an interpolated bigram language model (λ=0.7)
    whose unigram (cf = Σtf) and adjacent-bigram statistics come off
    the engine's own positional postings. Oracle: levenshtein over the
    distinct-term CTE for candidates, a pos+1 self-join for bigram
    counts, the identical ln expression."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        got = eng.search_phrase_suggest(
            text, size=size, max_edits=max_edits,
            num_candidates=num_candidates,
        )
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "phrase": pd.Series(
                [r["phrase"] for r in got], dtype="object"
            ),
            "score": round_half_away(
                np.asarray([r["score"] for r in got], dtype=np.float64),
                4,
            ),
        }
    )


def bm25_best_passage(
    sf_dir: str, query: str = "merge AND window", window: int = 8
) -> pd.DataFrame:
    """UNIFIED-HIGHLIGHTER passage selection (Lucene/ES unified
    highlighter, token-window form) for EVERY doc matching the filter
    query: the ``window``-token window maximizing summed BM25-idf
    weight of query-term occurrences, ties to the smallest start.
    Selection runs on the shared 4dp-rounded score so float sum order
    can't flip ties between engine and oracle. ``start`` is 1-based
    (the oracle's token CTE convention). Oracle: window self-join over
    the positional token CTE."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        res = eng.search_best_passages(query, window=window)
    finally:
        eng.close()
    return (
        pd.DataFrame(
            {
                "doc_id": pd.array(
                    res["paths"].astype("int64"), dtype="int64"
                ),
                "start": pd.array(
                    res["starts"] + 1, dtype="int64"
                ),
                "score": res["scores"],
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def bm25_term_vectors(
    sf_dir: str, doc_ids: tuple = (3, 7, 11)
) -> pd.DataFrame:
    """TERM VECTORS (the ES ``termvectors`` API, realtime form): per-
    (doc, term) statistics — term frequency from re-analyzing the
    stored source, document frequency LIVE from the index dictionary
    (exactly how ES serves ``termvectors?term_statistics=true`` for a
    doc without stored vectors). The doc filter is pushed INTO the
    parquet read (row-group pruning: only the requested docs' groups
    leave storage); tokenization + tf is one vectorized
    ``term_frequencies`` kernel; the df probe is one int-only engine
    fan-out over the distinct terms. Oracle: tf from the token CTE
    restricted to the ids, df joined from the full-corpus CTE."""
    import pyarrow.dataset as pads

    from ..query import FIELD_IDS
    from ..tokenizer import term_frequencies

    ids = sorted(int(i) for i in doc_ids)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(ids),
    )

    _TV_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tf", pa.int64()),
        ]
    )

    def tv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # keep the schema on empty blocks
            return _TV_SCHEMA.empty_table()
        tf, _ = term_frequencies(t["text"], with_positions=False)
        rows = tf["row"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy()[rows], pa.int64()
                ),
                "term": tf["term"],
                "tf": pc.cast(tf["tf"], pa.int64()),
            }
        )

    out = ds.map_batches(tv, batch_format="pyarrow").to_pandas()
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        fid = FIELD_IDS["content"]
        terms = sorted(out["term"].unique())
        dfs = eng._global_dfs([(fid, t) for t in terms])
    finally:
        eng.close()
    out["df"] = out["term"].map(
        {t: dfs[(fid, t)] for t in terms}
    ).astype("int64")
    return (
        out.sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )


def bm25_matrix_stats(
    sf_dir: str, query: str = "merge OR window",
    fields: tuple = ("n_bytes", "dl_content"),
) -> pd.DataFrame:
    """MATRIX-STATS aggregation (ES ``matrix_stats``) over the match
    set's numeric fast fields: per field-pair sample covariance and
    correlation (diagonal = variance / 1.0). Shards ship exact
    arbitrary-precision integer moment sums; all doubles are computed
    once driver-side in a fixed operation order the SQL oracle
    replicates with HUGEINT sums."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_matrix_stats(query, fields)
    finally:
        eng.close()
    c = res["cells"]
    return pd.DataFrame(
        {
            "field_a": pd.Series(
                [r["field_a"] for r in c], dtype="object"
            ),
            "field_b": pd.Series(
                [r["field_b"] for r in c], dtype="object"
            ),
            "covariance": round_half_away(
                np.asarray([r["covariance"] for r in c], np.float64), 4
            ),
            "correlation": round_half_away(
                np.asarray([r["correlation"] for r in c], np.float64), 4
            ),
        }
    )


def bm25_significant_sampled(
    sf_dir: str, query: str = "merge window", sample_size: int = 200,
    size: int = 12, min_doc_count: int = 3,
) -> pd.DataFrame:
    """SIGNIFICANT-TEXT under a SAMPLER (the ES-documented scale shape
    for ``significant_text``): the foreground is the top-``sample_size``
    BM25 docs of the query (4dp-rounded score cut, doc_id-asc ties)
    instead of the full match set, and — with the ``source`` seam —
    the collector is O(sample), not O(index): fg counts from
    re-analyzing only the N sampled docs (doc_id-pruned parquet read),
    bg dfs from one vectorized serving-``df`` gather over the sample's
    own terms; zero posting decodes. Oracle: the BM25 scoring CTE
    ordered by (round(score,4) DESC, doc_id) LIMIT N as the foreground
    set, then the identical JLH counts and double expression."""
    from ..query import parquet_field_source

    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        res = eng.search_significant_text(
            query, size=size, min_doc_count=min_doc_count,
            sample_size=sample_size,
            source=parquet_field_source(
                os.path.join(sf_dir, "documents.parquet"),
                "doc_id", "text",
            ),
        )
    finally:
        eng.close()
    b = res["buckets"]
    return pd.DataFrame(
        {
            "term": pd.Series([r["term"] for r in b], dtype="object"),
            "fg_count": pd.Series(
                [r["fg_count"] for r in b], dtype="int64"
            ),
            "bg_count": pd.Series(
                [r["bg_count"] for r in b], dtype="int64"
            ),
            "score": round_half_away(
                np.asarray([r["score"] for r in b], dtype=np.float64), 4
            ),
        }
    )


def bm25_pinned(
    sf_dir: str, query: str = "merge window",
    pinned: tuple = (5, 1, 10**9, 2), k: int = 15,
) -> pd.DataFrame:
    """PINNED query (ES ``pinned``): promoted docs first in the given
    order — matching or not — then organic matches (pinned excluded)
    on the shared rounded-score ranking; nonexistent pinned ids drop
    (ES). Output is float-free (rank, doc_id, pinned) so the oracle
    compares pure integers; the organic ordering is the same
    (round(score,4) DESC, doc_id) rule every ranked entry uses."""
    pins = [str(int(i)) for i in pinned]
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        # engine semantics probe: promoted prefix in given order
        res = eng.search_pinned(query, pins, top_k=k)
        npin = int(res["pinned"].sum())
        assert list(res["paths"][:npin]) == [
            p for p in pins if p in set(res["paths"][:npin])
        ]
        # deterministic organic ranking for the oracle: the shared
        # rounded-cut (closed boundary), overfetched so excluding the
        # pinned rows can never underfill the page
        organic = _bm25_rounded_cut(sf_dir, query, k + len(pins), eng=eng)
    finally:
        eng.close()
    found = set(res["paths"][:npin])
    pin_ids = [int(p) for p in pins if p in found]
    organic = organic[~organic["doc_id"].isin(pin_ids)]
    rows = [(i + 1, d, 1) for i, d in enumerate(pin_ids)]
    base = len(rows)
    for j, d in enumerate(organic["doc_id"].head(max(0, k - base))):
        rows.append((base + j + 1, int(d), 0))
    return pd.DataFrame(
        {
            "rank": pd.Series([r[0] for r in rows], dtype="int64"),
            "doc_id": pd.Series([r[1] for r in rows], dtype="int64"),
            "pinned": pd.Series([r[2] for r in rows], dtype="int64"),
        }
    )


def bm25_distance_feature(
    sf_dir: str, query: str = "merge window", field: str = "n_bytes",
    origin: int = 600, pivot: int = 128, boost: float = 2.0,
    k: int = 15,
) -> pd.DataFrame:
    """DISTANCE-FEATURE query (ES ``distance_feature``): rank by
    ``bm25 + boost * pivot / (pivot + |n_bytes - origin|)`` — the
    additive recency/proximity boost (here: prefer docs near a target
    size) that promotes without excluding. Oracle: the per-doc BM25
    OR-sum plus the identical rational feature from ``strlen(text)``;
    shared 4dp rounded cut."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        fetch = k + 64
        while True:
            res = eng.search_distance_feature(
                query, field, origin=origin, pivot=pivot, boost=boost,
                top_k=fetch,
            )
            if len(res["doc_ids"]) < fetch:
                break
            r = round_half_away(res["scores"], 4)
            if float(r[-1]) < float(r[k - 1]):
                break  # rounded boundary group closed
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": res["paths"].astype("int64"),
            "score": round_half_away(res["scores"], 4),
        }
    )
    return (
        out.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def bm25_highlight_fragments(
    sf_dir: str, query: str = "merge AND window", window: int = 8,
    num_fragments: int = 2,
) -> pd.DataFrame:
    """MULTI-FRAGMENT highlighting (ES ``number_of_fragments``): up to
    N NON-overlapping best windows per matching doc, greedy best-first
    (4dp-rounded score desc, start asc; a later fragment may not
    overlap an earlier one: |s_i - s_j| >= window). Oracle: the window
    CTE picks fragment 1 with row_number, fragment 2 re-ranks the
    windows at distance >= window from fragment 1 — the greedy rule
    itself is oracled."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        res = eng.search_best_passages(
            query, window=window, num_fragments=num_fragments
        )
    finally:
        eng.close()
    return (
        pd.DataFrame(
            {
                "doc_id": pd.array(
                    res["paths"].astype("int64"), dtype="int64"
                ),
                "frag": pd.array(res["frags"], dtype="int64"),
                "start": pd.array(res["starts"] + 1, dtype="int64"),
                "score": res["scores"],
            }
        )
        .sort_values(["doc_id", "frag"])
        .reset_index(drop=True)
    )


def bm25_span_first(
    sf_dir: str, term: str = "window", end: int = 12
) -> pd.DataFrame:
    """SPAN-FIRST query (Lucene SpanFirstQuery): docs whose FIRST
    occurrence of the term falls inside the leading ``end`` token
    positions — the title / lead-paragraph filter, served purely from
    the positional postings. Const-score membership, doc_id order.
    Oracle: min(pos) per doc over the positional token CTE (1-based,
    so ``<= end``)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_span_first(term, end)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "doc_id": pd.array(
                res["paths"].astype("int64"), dtype="int64"
            )
        }
    ).sort_values("doc_id").reset_index(drop=True)


def bm25_weighted_avg(
    sf_dir: str, query: str = "merge OR window",
) -> pd.DataFrame:
    """WEIGHTED-AVG aggregation (ES ``weighted_avg``): doc size
    (n_bytes) weighted by token count (dl_content) over the full match
    set — exact integer Σ(v·w)/Σw merged across shards, one float64
    divide. Oracle: the same HUGEINT sums over strlen/token counts."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_weighted_avg(query)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "n_docs": pd.Series([res["count"]], dtype="int64"),
            "weight_total": pd.Series(
                [res["weight_total"]], dtype="int64"
            ),
            "weighted_avg": round_half_away(
                np.asarray([res["weighted_avg"]], np.float64), 4
            ),
        }
    )


def bm25_t_test(
    sf_dir: str, query_a: str = "merge", query_b: str = "batch",
    field: str = "dl_content",
) -> pd.DataFrame:
    """T-TEST aggregation (ES ``t_test``, Welch): does mean doc length
    differ between the 'merge' and 'batch' populations? Exact integer
    moment sums per side, the Welch statistic once in float64. Oracle:
    identical expression over HUGEINT sums from the token CTE."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_t_test(query_a, query_b, field)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "n_a": pd.Series([res["n_a"]], dtype="int64"),
            "n_b": pd.Series([res["n_b"]], dtype="int64"),
            "mean_a": round_half_away(
                np.asarray([res["mean_a"]], np.float64), 4
            ),
            "mean_b": round_half_away(
                np.asarray([res["mean_b"]], np.float64), 4
            ),
            "t": round_half_away(
                np.asarray([res["t"]], np.float64), 4
            ),
        }
    )


def bm25_mad(
    sf_dir: str, query: str = "merge OR window",
    field: str = "dl_content",
) -> pd.DataFrame:
    """MEDIAN-ABSOLUTE-DEVIATION aggregation (ES
    ``median_absolute_deviation``, exact where ES is TDigest-
    approximate): median of |x - median| over the match set's token
    counts, both medians on the pinned lower-median rule. All-integer
    output; oracle replicates the rule with windowed cumulative
    sums."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_mad(query, field)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "n_docs": pd.Series([res["count"]], dtype="int64"),
            "median": pd.Series([res["median"]], dtype="int64"),
            "mad": pd.Series([res["mad"]], dtype="int64"),
        }
    )


def bm25_percentile_ranks(
    sf_dir: str, query: str = "merge OR window",
    field: str = "dl_content", values: tuple = (350, 400, 450),
) -> pd.DataFrame:
    """PERCENTILE-RANKS aggregation (ES ``percentile_ranks``, exact
    from merged value histograms where ES ships TDigest): % of matched
    docs with field value <= v, for each requested v. Oracle:
    100.0 * count_le / n per value."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_percentile_ranks(query, field, values)
    finally:
        eng.close()
    vs = sorted(res["ranks"])
    return pd.DataFrame(
        {
            "value": pd.Series(vs, dtype="int64"),
            "pct_le": round_half_away(
                np.asarray([res["ranks"][v] for v in vs], np.float64),
                4,
            ),
        }
    )


def bm25_boxplot(
    sf_dir: str, query: str = "merge OR window",
    field: str = "dl_content",
) -> pd.DataFrame:
    """BOXPLOT aggregation (ES ``boxplot``) of the analyzer token count
    over the match set — exact quartiles under the shared
    discrete-quantile rule (ceil(q*n)-th smallest) where ES documents
    TDigest, min/max from exact-int stats, one multi-agg fan-out.
    Oracle: the identical double-multiply + ceil over a row_number
    ranking plus plain min/max; all-integer compare."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_boxplot(query, field)
    finally:
        eng.close()
    if not res["count"]:  # empty match set -> empty frame, like SQL
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("n", "min", "q1", "q2", "q3", "max", "iqr")
            }
        )
    return pd.DataFrame(
        {
            "n": pd.Series([res["count"]], dtype="int64"),
            "min": pd.Series([res["min"]], dtype="int64"),
            "q1": pd.Series([res["q1"]], dtype="int64"),
            "q2": pd.Series([res["q2"]], dtype="int64"),
            "q3": pd.Series([res["q3"]], dtype="int64"),
            "max": pd.Series([res["max"]], dtype="int64"),
            "iqr": pd.Series([res["iqr"]], dtype="int64"),
        }
    )


def bm25_top_metrics(
    sf_dir: str, query: str = "merge window",
    sort_field: str = "dl_content", metric: str = "n_bytes",
    k: int = 10,
) -> pd.DataFrame:
    """TOP-METRICS aggregation (ES ``top_metrics``): the ``metric``
    values of the k matching docs with the largest ``sort_field``
    (exact (value desc, doc_id asc) total order). Two int-only
    fan-outs: sort-by-field top-k, then a metrics gather over exactly
    those ids. The engine tie-breaks by internal id, the oracle by the
    ORIGINAL doc id, so (the sort_by_field rule) the entry overfetches
    until the boundary VALUE group is strictly closed and re-cuts on
    (value desc, original id asc) — airtight, values compare exactly.
    Oracle: ORDER BY ... LIMIT joined back to documents; pure ints."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        fetch = k + 64
        while True:
            rows = eng.search_top_metrics(
                query, sort_field, (metric,), k=fetch
            )
            if len(rows) < fetch or (
                rows[-1]["sort_value"] < rows[k - 1]["sort_value"]
            ):
                break
            fetch *= 4
    finally:
        eng.close()
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(
                [int(r["path"]) for r in rows], dtype="int64"
            ),
            "sort_value": pd.Series(
                [r["sort_value"] for r in rows], dtype="int64"
            ),
            metric: pd.Series(
                [r[metric] for r in rows], dtype="int64"
            ),
        }
    )
    out = (
        out.sort_values(
            ["sort_value", "doc_id"], ascending=[False, True]
        )
        .head(k)
        .reset_index(drop=True)
    )
    out.insert(
        0, "rank", pd.Series(range(1, len(out) + 1), dtype="int64")
    )
    return out


def bm25_string_stats(
    sf_dir: str, query: str = "merge window", field: str = "lang"
) -> pd.DataFrame:
    """STRING-STATS aggregation (ES ``string_stats``) of the ``lang``
    keyword field over the match set: value count, min/max/avg length,
    Shannon entropy (log2) of the character distribution. Counts are
    exact ints off the significant-terms foreground fan-out; both
    doubles (avg_length, entropy) are computed driver-side in a fixed
    operation order the SQL oracle replicates (4dp-rounded compare)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_string_stats(query, field)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "n": pd.Series([res["count"]], dtype="int64"),
            "min_length": pd.Series([res["min_length"]], dtype="int64"),
            "max_length": pd.Series([res["max_length"]], dtype="int64"),
            "avg_length": round_half_away(
                np.asarray([res["avg_length"]], np.float64), 4
            ),
            "entropy": round_half_away(
                np.asarray([res["entropy"]], np.float64), 4
            ),
        }
    )


def bm25_span_not(
    sf_dir: str, include: str = "merge", exclude: str = "window",
    pre: int = 2, post: int = 2,
) -> pd.DataFrame:
    """SPAN-NOT query (Lucene SpanNotQuery): docs with at least one
    ``include`` occurrence that has NO ``exclude`` occurrence within
    ``pre`` positions before through ``post`` after it — the
    negative-context filter, served purely from positional postings.
    Const-score membership, doc_id order. Oracle: EXISTS an include
    token with NOT EXISTS an exclude token in the position window
    (1-based positions — differences are base-invariant)."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2)
    try:
        res = eng.search_span_not(include, exclude, pre, post)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "doc_id": pd.array(
                res["paths"].astype("int64"), dtype="int64"
            )
        }
    ).sort_values("doc_id").reset_index(drop=True)


def bm25_significant_diversified(
    sf_dir: str, query: str = "merge window", sample_size: int = 100,
    max_per_lang: int = 25, size: int = 12, min_doc_count: int = 3,
) -> pd.DataFrame:
    """SIGNIFICANT-TEXT under a DIVERSIFIED sampler (ES
    ``diversified_sampler``): the foreground is the first
    ``sample_size`` docs of the rounded-score ranked stream AFTER
    skipping docs whose ``lang`` already has ``max_per_lang`` accepted
    docs — so one dominant language can't own the significance scores.
    Runs on the O(sample) collector (source seam). Oracle: per-lang
    row_number over the ranked CTE <= cap, ORDER BY rank LIMIT N as
    the foreground, then the identical JLH counts and expression."""
    from ..query import parquet_field_source

    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        res = eng.search_significant_text(
            query, size=size, min_doc_count=min_doc_count,
            sample_size=sample_size,
            source=parquet_field_source(
                os.path.join(sf_dir, "documents.parquet"),
                "doc_id", "text",
            ),
            diversify_field="lang",
            max_docs_per_value=max_per_lang,
        )
    finally:
        eng.close()
    b = res["buckets"]
    return pd.DataFrame(
        {
            "term": pd.Series([r["term"] for r in b], dtype="object"),
            "fg_count": pd.Series(
                [r["fg_count"] for r in b], dtype="int64"
            ),
            "bg_count": pd.Series(
                [r["bg_count"] for r in b], dtype="int64"
            ),
            "score": round_half_away(
                np.asarray([r["score"] for r in b], dtype=np.float64), 4
            ),
        }
    )


def bm25_collapse(
    sf_dir: str, query: str = "merge window", field: str = "lang",
    k: int = 5,
) -> pd.DataFrame:
    """FIELD COLLAPSING (ES ``collapse``): the ranked list
    de-duplicated by ``field`` — only each field value's BEST hit
    surfaces, top-``k`` group winners in rank order. The diversified
    walk with cap=1 under the shared rounded-score ranking. Oracle:
    per-field row_number over the ranked CTE = 1, ORDER BY rank
    LIMIT k."""
    idx = documents_index(sf_dir)
    eng = BM25Engine(idx, num_shards=2, dtype=np.float64)
    try:
        rows = eng.search_collapse(query, field, k)
    finally:
        eng.close()
    return pd.DataFrame(
        {
            "rank": pd.Series(
                range(1, len(rows) + 1), dtype="int64"
            ),
            field: pd.Series([r[field] for r in rows], dtype="object"),
            "doc_id": pd.Series(
                [int(r["path"]) for r in rows], dtype="int64"
            ),
            "score": pd.Series(
                [r["score"] for r in rows], dtype="float64"
            ),
        }
    )
