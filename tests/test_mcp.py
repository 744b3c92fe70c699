"""MCP facade: tool list, JSON-RPC envelope, session pagination, TTL."""

import json

import pytest

from ck_ray.mcp import (
    DEFAULT_PAGE_SIZE,
    MAX_PAGE_SIZE,
    CkRayMCP,
    SessionManager,
)


@pytest.fixture(scope="module")
def mcp(ray_session, tmp_path_factory, tiny_corpus):
    import os

    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("mcp")
    corpus = str(d / "corpus")
    os.makedirs(corpus)
    pq.write_table(tiny_corpus, os.path.join(corpus, "part-0.parquet"))
    srv = CkRayMCP(corpus, str(d / "idx"))
    yield srv
    srv.close()


def _call(srv, name, **args):
    resp = srv.handle(
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
         "params": {"name": name, "arguments": args}}
    )
    assert "error" not in resp, resp
    return json.loads(resp["result"]["content"][0]["text"])


def test_initialize_and_tool_list(mcp):
    init = mcp.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize"})
    assert init["result"]["serverInfo"]["name"] == "ck_ray"
    tools = mcp.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in tools["result"]["tools"]}
    assert names == {
        "regex_search", "lexical_search", "semantic_search",
        "hybrid_search", "index_status", "reindex", "health_check",
        "facet_search", "aggregate", "significant_terms", "explain",
        "suggest", "complete", "percolate", "phrase_suggest",
        "rare_terms", "significant_text", "best_passages",
        "pinned_search", "distance_feature_search", "matrix_stats",
        "weighted_avg", "t_test", "mad", "percentile_ranks",
        "boxplot", "top_metrics", "string_stats", "span_not",
    }


def test_notifications_get_no_response(mcp):
    """JSON-RPC notifications (no id) must not be answered — strict MCP
    clients treat an unsolicited response to notifications/initialized
    as a protocol violation (ADVICE r2)."""
    assert mcp.handle(
        {"jsonrpc": "2.0", "method": "notifications/initialized"}
    ) is None
    # unknown method without an id is still a notification -> silence
    assert mcp.handle({"jsonrpc": "2.0", "method": "bogus/unknown"}) is None
    # unknown method WITH an id still errors
    err = mcp.handle({"jsonrpc": "2.0", "id": 7, "method": "bogus/unknown"})
    assert err["error"]["code"] == -32601 and err["id"] == 7


def test_health_and_status(mcp):
    h = _call(mcp, "health_check")
    assert h["status"] == "ok" and h["corpus"]
    st = _call(mcp, "index_status")
    assert st["num_docs"] == 206 and st["n_terms"] > 0


def test_lexical_search_tool(mcp):
    out = _call(mcp, "lexical_search", query="uq0000042marker", top_k=5)
    assert out["total_count"] == 1 and len(out["matches"]) == 1
    assert out["next_cursor"] is None


def test_facet_and_aggregate_tools(mcp):
    """The aggregation-module tools: full-match-set facet counts and
    numeric aggregations, consistent with each other."""
    f = _call(mcp, "facet_search", query="merge", field="lang")
    assert f["total"] == sum(f["facets"].values()) > 0
    st = _call(mcp, "aggregate", query="merge", kind="stats",
               field="dl_content")
    assert st["count"] == f["total"]
    assert st["min"] <= st["max"] and st["sum"] >= st["count"] * st["min"]
    h = _call(mcp, "aggregate", query="merge", kind="histogram",
              field="n_bytes", interval=256)
    assert sum(h["buckets"].values()) == f["total"]
    r = _call(mcp, "aggregate", query="merge", kind="range",
              field="n_bytes", edges=[300, 900])
    assert sum(r["ranges"].values()) == f["total"]
    p = _call(mcp, "aggregate", query="merge", kind="percentiles",
              field="dl_content", qs=[0.5])
    # JSON stringifies the float quantile keys
    assert st["min"] <= p["percentiles"]["0.5"] <= st["max"]
    c = _call(mcp, "aggregate", query="merge", kind="cardinality",
              field="lang")
    assert c["cardinality"] == len(f["facets"])
    xs = _call(mcp, "aggregate", query="merge", kind="extended_stats",
               field="dl_content")
    assert xs["count"] == st["count"] and xs["sum"] == st["sum"]
    assert xs["sum_sq"] >= xs["sum"] and xs["variance"] >= 0
    top = _call(mcp, "lexical_search", query="merge", top_k=1)
    did = top["matches"][0]["doc_id"]
    ex = _call(mcp, "explain", query="merge", doc_id=did)
    assert ex["matched"] and ex["doc_id"] == did
    assert ex["leaves"][0]["details"][0]["tf"] >= 1
    miss = _call(mcp, "explain", query="zzznosuchterm", doc_id=did)
    assert miss == {"matched": False}
    sg = _call(mcp, "suggest", query="mergw", size=3)
    assert sg["suggestions"][0]["text"] == "merge"
    assert sg["suggestions"][0]["distance"] == 1
    sig = _call(mcp, "significant_terms", query="merge", field="lang",
                size=3)
    assert sig["fg_total"] == f["total"] and len(sig["buckets"]) <= 3
    for b in sig["buckets"]:  # fg% must exceed bg% for every bucket
        assert b["score"] > 0
        assert b["fg_count"] * sig["bg_total"] > (
            b["bg_count"] * sig["fg_total"]
        )


def test_pagination_walks_all_results(mcp):
    first = _call(mcp, "regex_search", query="merge", page_size=7)
    total = first["total_count"]
    assert total > 7 and first["has_more"]
    seen = [(m["path"], m["line_no"]) for m in first["matches"]]
    cursor = first["next_cursor"]
    while cursor:
        page = _call(mcp, "regex_search", cursor=cursor)
        assert len(page["matches"]) <= 7
        seen += [(m["path"], m["line_no"]) for m in page["matches"]]
        cursor = page["next_cursor"]
    assert len(seen) == total and len(set(seen)) == total


def test_page_size_clamped():
    sm = SessionManager()
    results = [{"i": i} for i in range(500)]
    matches, nxt, meta = sm.create(results, page_size=10_000)
    assert len(matches) == MAX_PAGE_SIZE
    matches, _, _ = sm.create(results, page_size=0)
    assert len(matches) == 1


def test_session_ttl_expiry():
    now = [0.0]
    sm = SessionManager(ttl=5.0, clock=lambda: now[0])
    _, nxt, _ = sm.create([{"i": i} for i in range(50)], page_size=10)
    now[0] = 10.0
    with pytest.raises(ValueError, match="expired"):
        sm.page(nxt)


def test_session_eviction():
    sm = SessionManager()
    cursors = []
    from ck_ray import mcp as m

    for i in range(m.MAX_SESSIONS + 1):
        _, nxt, _ = sm.create([{"i": j} for j in range(30)], page_size=10)
        cursors.append(nxt)
    with pytest.raises(ValueError, match="not found"):
        sm.page(cursors[0])  # oldest evicted
    sm.page(cursors[-1])  # newest alive


def test_bad_requests(mcp):
    r = mcp.handle({"jsonrpc": "2.0", "id": 9, "method": "nope"})
    assert r["error"]["code"] == -32601
    r2 = mcp.handle(
        {"jsonrpc": "2.0", "id": 10, "method": "tools/call",
         "params": {"name": "no_such_tool", "arguments": {}}}
    )
    assert r2["error"]["code"] == -32000
    r3 = mcp.handle(
        {"jsonrpc": "2.0", "id": 11, "method": "tools/call",
         "params": {"name": "regex_search",
                    "arguments": {"cursor": "garbage"}}}
    )
    assert "invalid cursor" in r3["error"]["message"]


def test_hybrid_and_semantic_tools(mcp):
    h = _call(mcp, "hybrid_search", query="merge window", page_size=5)
    assert h["count"] > 0 and "rrf_score" in h["matches"][0]
    s = _call(mcp, "semantic_search", query="merge posting runs", top_k=3)
    assert s["count"] == 3


def test_reindex_tool(mcp):
    out = _call(mcp, "reindex")
    assert out["num_docs"] == 206
    # unchanged corpus -> no new epoch
    assert len(out["epochs"]) == 1
    st = _call(mcp, "index_status")
    assert st["num_epochs"] == 1


def test_reindex_after_corpus_mutation(ray_session, tmp_path_factory, tiny_corpus):
    """The reindex tool must pick up corpus mutations: an edited file
    becomes searchable under its new content, a deleted file disappears,
    and index_status reports the extra epoch (VERDICT r2 #8)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("mcp_mut")
    corpus = str(d / "corpus")
    os.makedirs(corpus)
    pq.write_table(tiny_corpus, os.path.join(corpus, "part-0.parquet"))
    srv = CkRayMCP(corpus, str(d / "idx"))
    try:
        before = _call(srv, "lexical_search", query="uq0000042marker", top_k=3)
        assert before["total_count"] == 1
        victim_path = before["matches"][0]["path"]

        # mutate: rewrite the matched doc with new content, drop another
        tbl = tiny_corpus.to_pandas()
        tbl.loc[tbl["path"] == victim_path, "content"] = (
            "def mutated_sentinel_fn():\n    return 7\n"
        )
        tbl = tbl[tbl["path"] != tbl["path"].iloc[-1]]  # delete one doc
        pq.write_table(
            pa.Table.from_pandas(tbl, preserve_index=False),
            os.path.join(corpus, "part-0.parquet"),
        )
        out = _call(srv, "reindex")
        assert len(out["epochs"]) == 2

        gone = _call(srv, "lexical_search", query="uq0000042marker", top_k=3)
        assert gone["total_count"] == 0  # old content superseded
        new = _call(srv, "lexical_search", query="mutated_sentinel_fn", top_k=3)
        assert new["total_count"] == 1
        assert new["matches"][0]["path"] == victim_path
        st = _call(srv, "index_status")
        assert st["num_epochs"] == 2
        assert st["num_docs"] == len(tbl)
    finally:
        srv.close()


def test_complete_and_percolate_tools(mcp):
    comp = _call(mcp, "complete", query="mer", size=5)["completions"]
    assert comp and all(c["term"].startswith("mer") for c in comp)
    dfs = [c["df"] for c in comp]
    assert dfs == sorted(dfs, reverse=True)

    out = _call(mcp, "percolate",
                queries={"m": "merge", "none": "zzznotaterm"},
                page_size=5)
    assert out["matches"] and all(
        r["query_name"] == "m" for r in out["matches"]
    )
    # pages walk the rest of the match set through the session cursor
    seen = list(out["matches"])
    cur = out["next_cursor"]
    while cur:
        nxt = _call(mcp, "percolate", cursor=cur)
        seen.extend(nxt["matches"])
        cur = nxt["next_cursor"]
    assert out["total_count"] == len(seen)

    bad = mcp.handle({
        "jsonrpc": "2.0", "id": 52, "method": "tools/call",
        "params": {"name": "percolate", "arguments": {}},
    })
    assert "error" in bad or bad["result"].get("isError")


def test_round4_fulltext_tools(mcp):
    sug = _call(mcp, "phrase_suggest", query="mergw streag", size=3)
    assert sug["suggestions"]
    assert sug["suggestions"][0]["phrase"] == "merge stream"

    rare = _call(mcp, "rare_terms", max_doc_count=3, size=10)["terms"]
    assert rare and all(r["df"] <= 3 for r in rare)

    sig = _call(mcp, "significant_text", query="merge AND stream",
                size=5, min_doc_count=2)
    assert sig["buckets"]
    assert all(
        b["term"] not in ("merge", "stream") for b in sig["buckets"]
    )

    out = _call(mcp, "best_passages", query="merge AND stream",
                page_size=7)
    assert out["matches"] and {"path", "start", "weight"} <= set(
        out["matches"][0]
    )
    seen = list(out["matches"])
    cur = out["next_cursor"]
    while cur:
        nxt = _call(mcp, "best_passages", cursor=cur)
        seen.extend(nxt["matches"])
        cur = nxt["next_cursor"]
    assert out["total_count"] == len(seen)


def test_pinned_distance_matrix_tools(mcp):
    base = _call(mcp, "lexical_search", query="merge window",
                 page_size=5)["matches"]
    promo = base[2]["path"]
    out = _call(mcp, "pinned_search", query="merge window",
                pins=[promo], top_k=5)["hits"]
    assert out[0]["path"] == promo and out[0]["pinned"]
    assert not any(h["pinned"] for h in out[1:])

    df = _call(mcp, "distance_feature_search", query="merge window",
               field="n_bytes", origin=500, pivot=64, boost=2.0,
               top_k=5)["hits"]
    assert len(df) == 5
    scores = [h["score"] for h in df]
    assert scores == sorted(scores, reverse=True)

    ms = _call(mcp, "matrix_stats", query="merge window")
    assert ms["count"] > 2 and len(ms["cells"]) == 3
    diag = [c for c in ms["cells"] if c["field_a"] == c["field_b"]]
    assert all(abs(c["correlation"] - 1.0) < 1e-9 for c in diag)


def test_exact_agg_family_tools(mcp):
    wa = _call(mcp, "weighted_avg", query="merge")
    assert wa["count"] > 0 and wa["weight_total"] > 0
    assert wa["weighted_avg"] > 0

    tt = _call(mcp, "t_test", query_a="merge", query_b="stream")
    assert tt["n_a"] > 1 and tt["n_b"] > 1
    assert tt["t"] == tt["t"]  # finite on this corpus

    md = _call(mcp, "mad", query="merge")
    assert md["count"] > 0 and md["mad"] >= 0

    pr = _call(mcp, "percentile_ranks", query="merge",
               values=[md["median"]])
    # at least half the docs sit at or below the lower median
    assert pr["ranks"][str(md["median"])] >= 50.0


def test_round5_agg_tools(mcp):
    """boxplot / top_metrics / string_stats / span_not on the MCP
    surface (one engine, four new tools)."""
    bp = _call(mcp, "boxplot", query="merge")
    assert bp["count"] > 0
    assert bp["min"] <= bp["q1"] <= bp["q2"] <= bp["q3"] <= bp["max"]
    assert bp["iqr"] == bp["q3"] - bp["q1"]

    tm = _call(mcp, "top_metrics", query="merge", size=5)
    rows = tm["top"]
    assert 0 < len(rows) <= 5
    assert all(
        rows[i]["sort_value"] >= rows[i + 1]["sort_value"]
        for i in range(len(rows) - 1)
    )
    assert all("n_bytes" in r and "path" in r for r in rows)

    ss = _call(mcp, "string_stats", query="merge")
    assert ss["count"] > 0 and ss["min_length"] <= ss["max_length"]
    assert ss["entropy"] >= 0

    sn = _call(mcp, "span_not", include="merge", exclude="stream",
               pre=1, post=1)
    assert "matches" in sn
    # exclude-everywhere vs exclude-absent bracket the include set
    none = _call(mcp, "span_not", include="merge",
                 exclude="zzznosuchterm")
    assert len(none["matches"]) >= len(sn["matches"])
