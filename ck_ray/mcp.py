"""MCP (Model Context Protocol) server facade over the Ray-Data engine.

Mirrors the reference's MCP surface (``ck-cli/src/mcp_server.rs:613-940``:
tools ``regex_search``, ``lexical_search``, ``semantic_search``,
``hybrid_search``, ``index_status``, ``reindex``, ``health_check``) and
its session pagination protocol (``ck-cli/src/mcp/session.rs:109-426``):
a search creates a session caching the full result list; pages are served
through an opaque cursor; sessions expire after a TTL and the oldest is
evicted beyond MAX_SESSIONS; ``page_size`` is clamped to
``[1, MAX_PAGE_SIZE]``.

Transport is JSON-RPC 2.0 over stdio (``serve_stdio``), the standard MCP
wire shape; ``CkRayMCP.handle`` is transport-free so tests drive it
directly. The server wraps one corpus + one index dir; Ray must already
be initialized by the host process (the library never calls ray.init).
"""

from __future__ import annotations

import base64
import json
import sys
import time
import uuid

MAX_PAGE_SIZE = 100
DEFAULT_PAGE_SIZE = 20
MAX_SESSIONS = 100
DEFAULT_SESSION_TTL = 300.0


class SessionManager:
    """Result-caching pagination sessions (reference
    ``ck-cli/src/mcp/session.rs``): create -> page via opaque cursor."""

    def __init__(self, ttl: float = DEFAULT_SESSION_TTL, *, clock=time.monotonic):
        self._sessions: dict[str, dict] = {}
        self._ttl = ttl
        self._clock = clock

    def create(self, results: list[dict], page_size: int) -> tuple[list[dict], str | None, dict]:
        """Store results, return (first page, next_cursor, meta)."""
        page_size = max(1, min(int(page_size), MAX_PAGE_SIZE))
        sid = uuid.uuid4().hex
        now = self._clock()
        if len(self._sessions) >= MAX_SESSIONS:
            oldest = min(self._sessions, key=lambda k: self._sessions[k]["last"])
            del self._sessions[oldest]
        self._sessions[sid] = {
            "results": results, "created": now, "last": now,
            "page_size": page_size,
        }
        return self.page(self._cursor(sid, 0, page_size))

    def _cursor(self, sid: str, offset: int, page_size: int) -> str:
        raw = json.dumps({"sid": sid, "offset": offset, "page_size": page_size})
        return base64.urlsafe_b64encode(raw.encode()).decode()

    def page(self, cursor: str) -> tuple[list[dict], str | None, dict]:
        try:
            c = json.loads(base64.urlsafe_b64decode(cursor.encode()))
            sid, offset = c["sid"], int(c["offset"])
            page_size = max(1, min(int(c["page_size"]), MAX_PAGE_SIZE))
        except Exception:
            raise ValueError("invalid cursor") from None
        s = self._sessions.get(sid)
        if s is None:
            raise ValueError("session not found or expired")
        now = self._clock()
        if now - s["last"] > self._ttl:
            del self._sessions[sid]
            raise ValueError("session has expired")
        s["last"] = now
        total = len(s["results"])
        end = min(offset + page_size, total)
        matches = s["results"][offset:end]
        has_more = end < total
        nxt = self._cursor(sid, end, page_size) if has_more else None
        return matches, nxt, {
            "count": len(matches), "total_count": total, "has_more": has_more,
        }


class CkRayMCP:
    """One corpus + one index dir behind the MCP tool set."""

    def __init__(self, corpus: str, index_dir: str, ttl: float = DEFAULT_SESSION_TTL):
        self.corpus = corpus
        self.index_dir = index_dir
        self.sessions = SessionManager(ttl)
        self._engine = None
        self._chunk_emb = None

    # ------------------------------------------------------------- engines

    def _bm25(self):
        import os

        from .build import IndexConfig, build_index
        from .query import BM25Engine

        if self._engine is None:
            if not os.path.exists(os.path.join(self.index_dir, "manifest.json")):
                build_index(self.corpus, self.index_dir, IndexConfig(num_parts=8))
            self._engine = BM25Engine(self.index_dir)
        return self._engine

    def _semantic_index(self):
        from .semantic import build_chunk_embeddings

        if self._chunk_emb is None:
            self._chunk_emb = build_chunk_embeddings(self.corpus).materialize()
        return self._chunk_emb

    def close(self):
        if self._engine is not None:
            self._engine.close()
            self._engine = None

    # --------------------------------------------------------------- tools

    TOOLS = {
        "regex_search": "Regex search over the corpus (RE2 semantics)",
        "lexical_search": "BM25 full-text search over the index",
        "semantic_search": "Embedding cosine search over chunked corpus",
        "hybrid_search": "RRF fusion of the regex and BM25 legs",
        "index_status": "Index statistics (docs, terms, postings, epochs)",
        "reindex": "Incrementally update the index from the corpus",
        "health_check": "Server liveness + component status",
        # beyond the reference's 7: the aggregation module for agents —
        # full-match-set counts/buckets without paging result rows
        "facet_search": "Full-match-set facet counts by a metadata "
                        "field (tantivy Count+TermsAggregation)",
        "aggregate": "Full-match-set numeric aggregation: stats / "
                     "extended_stats / histogram / range / "
                     "percentiles / cardinality over a fast field "
                     "(n_bytes, dl_content)",
        "significant_terms": "Field values anomalously frequent in the "
                             "match set vs the whole index (ES "
                             "significant_terms, JLH score)",
        "explain": "Score breakdown for one (query, doc_id) pair: "
                   "per-term BM25 evidence (Lucene explain)",
        "suggest": "Spell-correction candidates for a term (ES term "
                   "suggester: distance asc, doc frequency desc)",
        "complete": "Prefix autocomplete from the index dictionary "
                    "(ES completion suggester: df desc, term asc)",
        "percolate": "Reverse search (ES percolate): match the corpus "
                     "stream against stored queries ({name: query} in "
                     "'queries'); returns (query_name, path) pairs",
        "phrase_suggest": "Did-you-mean phrase suggester (ES phrase "
                          "suggest): fuzzy candidates ranked by a "
                          "bigram language model off the postings",
        "rare_terms": "Long-tail dictionary terms with doc frequency "
                      "<= max_doc_count (ES rare_terms, exact)",
        "significant_text": "Free-text terms anomalously frequent in "
                            "the match set vs the corpus (ES "
                            "significant_text, JLH score)",
        "best_passages": "Best highlight window per matching doc "
                         "(unified-highlighter passage selection)",
        "pinned_search": "Promoted paths first in given order, organic "
                         "ranking follows (ES pinned query)",
        "distance_feature_search": "BM25 + additive proximity boost on "
                                   "a numeric fast field (ES "
                                   "distance_feature)",
        "matrix_stats": "Field-pair covariance/correlation over the "
                        "match set's numeric fast fields (ES "
                        "matrix_stats)",
        "weighted_avg": "Fast-field average weighted by another fast "
                        "field over the match set (ES weighted_avg, "
                        "exact integer sums)",
        "t_test": "Welch's t between two query populations on a fast "
                  "field (ES t_test, exact moment sums)",
        "mad": "Median absolute deviation of a fast field over the "
               "match set (exact; ES approximates with TDigest)",
        "percentile_ranks": "Exact % of matched docs with fast-field "
                            "value <= each requested value (ES "
                            "percentile_ranks)",
        "boxplot": "Exact min/q1/q2/q3/max/IQR of a fast field over "
                   "the match set (ES boxplot; exact where ES sketches)",
        "top_metrics": "Metric values of the top-k matching docs by a "
                       "numeric sort field (ES top_metrics)",
        "string_stats": "Keyword-field length stats + Shannon character "
                        "entropy over the match set (ES string_stats)",
        "span_not": "Docs with an include-term occurrence having no "
                    "exclude term within [pre, post] positions (Lucene "
                    "SpanNotQuery)",
    }

    def list_tools(self) -> list[dict]:
        return [
            {
                "name": name,
                "description": desc,
                "inputSchema": {
                    "type": "object",
                    "properties": {
                        "query": {"type": "string"},
                        "page_size": {"type": "integer"},
                        "cursor": {"type": "string"},
                        "top_k": {"type": "integer"},
                        "field": {"type": "string"},
                        "kind": {"type": "string"},
                        "interval": {"type": "integer"},
                        "edges": {"type": "array"},
                        "qs": {"type": "array"},
                        "queries": {"type": "object"},
                        "size": {"type": "integer"},
                        "max_edits": {"type": "integer"},
                        "max_doc_count": {"type": "integer"},
                        "min_doc_count": {"type": "integer"},
                        "window": {"type": "integer"},
                        "pins": {"type": "array"},
                        "fields": {"type": "array"},
                        "origin": {"type": "integer"},
                        "pivot": {"type": "integer"},
                        "boost": {"type": "number"},
                        "num_fragments": {"type": "integer"},
                        "value_field": {"type": "string"},
                        "weight_field": {"type": "string"},
                        "query_a": {"type": "string"},
                        "query_b": {"type": "string"},
                        "values": {"type": "array"},
                        "sort_field": {"type": "string"},
                        "metrics": {"type": "array"},
                        "include": {"type": "string"},
                        "exclude": {"type": "string"},
                        "pre": {"type": "integer"},
                        "post": {"type": "integer"},
                    },
                },
            }
            for name, desc in self.TOOLS.items()
        ]

    def _paged(self, args: dict, make_results) -> dict:
        if args.get("cursor"):
            matches, nxt, meta = self.sessions.page(args["cursor"])
        else:
            results = make_results()
            matches, nxt, meta = self.sessions.create(
                results, args.get("page_size", DEFAULT_PAGE_SIZE)
            )
        return {"matches": matches, "next_cursor": nxt, **meta}

    def call_tool(self, name: str, args: dict) -> dict:
        if name == "health_check":
            import os

            return {
                "status": "ok",
                "corpus": os.path.isdir(self.corpus),
                "index": os.path.exists(
                    os.path.join(self.index_dir, "manifest.json")
                ),
            }
        if name == "index_status":
            from .build import index_stats

            self._bm25()  # builds on first use
            return index_stats(self.index_dir)
        if name == "reindex":
            import os

            from .build import IndexConfig, build_index
            from .incremental import incremental_update

            # release the shard actors BEFORE running the Ray Data
            # update: open engines reserve CPUs, and on a small cluster
            # the update's tasks would starve against them (deadlock).
            # The next search lazily reloads the new epoch set.
            self.close()
            if not os.path.exists(
                os.path.join(self.index_dir, "manifest.json")
            ):
                man = build_index(
                    self.corpus, self.index_dir, IndexConfig(num_parts=8)
                )
                man.setdefault("epochs", [man["epoch_dir"]])
            else:
                man = incremental_update(self.corpus, self.index_dir)
            return {
                "epochs": man.get("epochs", [man["epoch_dir"]]),
                "n_changed": man.get("n_changed", 0),
                "n_deleted": man.get("n_deleted", 0),
                "num_docs": man["num_docs"],
            }
        query = args.get("query", "")
        if name == "facet_search":
            total, facets = self._bm25().search_facets(
                query, args.get("field", "lang")
            )
            return {"total": total, "facets": facets}
        if name == "suggest":
            return {
                "suggestions": self._bm25().search_suggest(
                    query, int(args.get("size", 5)),
                    int(args.get("max_edits", 2)),
                )
            }
        if name == "pinned_search":
            pins = args.get("pins") or []
            res = self._bm25().search_pinned(
                query, [str(p) for p in pins],
                top_k=args.get("top_k"),
            )
            return {
                "hits": [
                    {
                        "path": str(p_),
                        "pinned": bool(fl),
                        "score": (None if sc != sc else float(sc)),
                    }
                    for p_, fl, sc in zip(
                        res["paths"], res["pinned"], res["scores"]
                    )
                ]
            }
        if name == "distance_feature_search":
            res = self._bm25().search_distance_feature(
                query, args.get("field", "n_bytes"),
                origin=int(args.get("origin", 0)),
                pivot=int(args.get("pivot", 128)),
                boost=float(args.get("boost", 1.0)),
                top_k=args.get("top_k"),
            )
            return {
                "hits": [
                    {"path": str(p_), "score": float(sc)}
                    for p_, sc in zip(res["paths"], res["scores"])
                ]
            }
        if name == "matrix_stats":
            res = self._bm25().search_matrix_stats(
                query,
                tuple(args.get("fields", ("n_bytes", "dl_content"))),
            )
            for c in res["cells"]:  # NaN is not valid JSON -> null
                if c["correlation"] != c["correlation"]:
                    c["correlation"] = None
            return res
        if name == "weighted_avg":
            return self._bm25().search_weighted_avg(
                query,
                args.get("value_field", "n_bytes"),
                args.get("weight_field", "dl_content"),
            )
        if name == "t_test":
            return self._bm25().search_t_test(
                args["query_a"], args["query_b"],
                args.get("field", "dl_content"),
            )
        if name == "mad":
            return self._bm25().search_mad(
                query, args.get("field", "dl_content")
            )
        if name == "percentile_ranks":
            res = self._bm25().search_percentile_ranks(
                query, args.get("field", "dl_content"),
                tuple(args.get("values", ())),
            )
            # JSON object keys are strings
            res["ranks"] = {
                str(v): pct for v, pct in res["ranks"].items()
            }
            return res
        if name == "boxplot":
            return self._bm25().search_boxplot(
                query, args.get("field", "dl_content")
            )
        if name == "top_metrics":
            return {
                "top": self._bm25().search_top_metrics(
                    query,
                    args.get("sort_field", "dl_content"),
                    tuple(args.get("metrics", ("n_bytes",))),
                    k=int(args.get("size", 10)),
                )
            }
        if name == "string_stats":
            return self._bm25().search_string_stats(
                query, args.get("field", "lang")
            )
        if name == "span_not":
            def mk():
                r = self._bm25().search_span_not(
                    args["include"], args["exclude"],
                    int(args.get("pre", 0)), int(args.get("post", 0)),
                )
                return [
                    {"path": str(p_), "doc_id": int(d)}
                    for p_, d in zip(r["paths"], r["doc_ids"])
                ]

            return self._paged(args, mk)
        if name == "phrase_suggest":
            return {
                "suggestions": self._bm25().search_phrase_suggest(
                    query, size=int(args.get("size", 5)),
                    max_edits=int(args.get("max_edits", 1)),
                )
            }
        if name == "rare_terms":
            return {
                "terms": self._bm25().search_rare_terms(
                    int(args.get("max_doc_count", 5)),
                    size=int(args.get("size", 10)),
                )
            }
        if name == "significant_text":
            res = self._bm25().search_significant_text(
                query, size=int(args.get("size", 10)),
                min_doc_count=int(args.get("min_doc_count", 3)),
            )
            return res
        if name == "best_passages":
            def mk():
                bp = self._bm25().search_best_passages(
                    query, window=int(args.get("window", 8)),
                    num_fragments=int(args.get("num_fragments", 1)),
                )
                return [
                    {
                        "path": str(p_),
                        "frag": int(fr),
                        "start": int(st),
                        "weight": float(sc),
                    }
                    for p_, fr, st, sc in zip(
                        bp["paths"], bp["frags"], bp["starts"],
                        bp["scores"]
                    )
                ]

            return self._paged(args, mk)
        if name == "complete":
            return {
                "completions": [
                    {"term": t, "df": d}
                    for t, d in self._bm25().suggest_complete(
                        query, int(args.get("size", 10))
                    )
                ]
            }
        if name == "percolate":
            import ray.data as _rd

            from .ops.percolate import percolate

            registry = args.get("queries") or {}
            # cursor pages carry no registry — they replay the session
            if not args.get("cursor") and (
                not isinstance(registry, dict) or not registry
            ):
                raise ValueError(
                    "percolate needs 'queries': {name: query}"
                )

            def mk():
                ds = _rd.read_parquet(self.corpus)
                df = percolate(
                    ds, registry, text_col="content", id_col="path"
                )
                return df.to_dict("records")

            return self._paged(args, mk)
        if name == "explain":
            ex = self._bm25().explain(query, int(args["doc_id"]))
            return ex if ex is not None else {"matched": False}
        if name == "significant_terms":
            return self._bm25().search_significant_terms(
                query, args.get("field", "lang"),
                int(args.get("size", 10)),
            )
        if name == "aggregate":
            spec = {
                "kind": args.get("kind", "stats"),
                "field": args.get("field", "dl_content"),
            }
            if "interval" in args:
                spec["interval"] = int(args["interval"])
            if "edges" in args:
                spec["edges"] = [int(e) for e in args["edges"]]
            if "qs" in args:
                spec["qs"] = [float(q) for q in args["qs"]]
            return self._bm25().search_aggregate(query, spec)
        if name == "regex_search":
            from .regex_search import regex_search

            def mk():
                df = regex_search(self.corpus, query)
                return df.to_dict("records")

            return self._paged(args, mk)
        if name == "lexical_search":
            def mk():
                df = self._bm25().search(query, top_k=args.get("top_k"))
                return df.drop(columns=["content_sha256"]).to_dict("records")

            return self._paged(args, mk)
        if name == "semantic_search":
            from .semantic import semantic_search

            def mk():
                df = semantic_search(
                    self._semantic_index(), query,
                    top_k=args.get("top_k", 10),
                )
                return df.to_dict("records")

            return self._paged(args, mk)
        if name == "hybrid_search":
            from .regex_search import regex_search

            def mk():
                lex = self._bm25().search(query, top_k=100)
                pattern = ".*".join(query.split())
                rex = regex_search(self.corpus, pattern)
                ranks: dict = {}
                for lst in (
                    lex["path"].tolist(),
                    rex["path"].drop_duplicates().tolist(),
                ):
                    for r, key in enumerate(lst, start=1):
                        ranks[key] = ranks.get(key, 0.0) + 1.0 / (60 + r)
                ordered = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
                return [
                    {"path": p, "rrf_score": round(s, 6)} for p, s in ordered
                ]

            return self._paged(args, mk)
        raise ValueError(f"unknown tool {name!r}")

    # ------------------------------------------------------------ JSON-RPC

    def handle(self, req: dict) -> dict | None:
        """One JSON-RPC 2.0 request -> response dict.

        Requests WITHOUT an ``id`` are notifications (e.g. the standard
        MCP ``notifications/initialized`` sent after ``initialize``);
        JSON-RPC 2.0 §4.1 forbids responding to them, and strict clients
        treat an unsolicited response as a protocol violation — so they
        are processed (currently: ignored) and ``None`` is returned."""
        rid = req.get("id")
        method = req.get("method", "")
        if rid is None or method.startswith("notifications/"):
            return None
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": "2024-11-05",
                    "serverInfo": {"name": "ck_ray", "version": "1.0"},
                    "capabilities": {"tools": {}},
                }
            elif method == "tools/list":
                result = {"tools": self.list_tools()}
            elif method == "tools/call":
                p = req.get("params", {})
                out = self.call_tool(p.get("name", ""), p.get("arguments", {}))
                result = {
                    "content": [
                        {"type": "text", "text": json.dumps(out, default=str)}
                    ],
                    "isError": False,
                }
            else:
                return {
                    "jsonrpc": "2.0", "id": rid,
                    "error": {"code": -32601, "message": f"unknown method {method}"},
                }
            return {"jsonrpc": "2.0", "id": rid, "result": result}
        except Exception as e:
            return {
                "jsonrpc": "2.0", "id": rid,
                "error": {"code": -32000, "message": str(e)},
            }


def serve_stdio(corpus: str, index_dir: str) -> None:
    """Blocking stdio loop: one JSON-RPC request per line."""
    srv = CkRayMCP(corpus, index_dir)
    try:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            resp = srv.handle(json.loads(line))
            if resp is None:  # notification — no response line
                continue
            sys.stdout.write(json.dumps(resp, default=str) + "\n")
            sys.stdout.flush()
    finally:
        srv.close()


if __name__ == "__main__":
    import argparse

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-dir", required=True)
    a = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        serve_stdio(a.corpus, a.index_dir)
    finally:
        ray.shutdown()
