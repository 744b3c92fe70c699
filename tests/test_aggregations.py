"""Aggregation collectors over the FULL match set (tantivy's
ES-compatible aggregation module: histogram / range / stats /
cardinality, plus the terms+top_hits composite). Ground truth is brute-
forced on the driver from the corpus table and the engine's own full
ranked match list — every integer must be exact, scores bit-equal."""

import numpy as np
import pytest

from ck_ray.query import BM25Engine
from ck_ray.tokenizer import tokenize_text

BIG = 10**6  # top_k large enough to drain every match


@pytest.fixture(scope="module")
def eng(ray_session, tiny_index):
    e = BM25Engine(tiny_index, num_shards=3, auto_reload=False)
    yield e
    e.close()


def _truth(eng, tiny_corpus, query):
    """Brute-force per-matched-doc (path, lang, n_bytes, dl) from the
    corpus table, in the engine's ranked order."""
    df = eng.search(query, top_k=BIG, with_metadata=True)
    by_path = {
        p: c
        for p, c in zip(
            tiny_corpus["path"].to_pylist(),
            tiny_corpus["content"].to_pylist(),
        )
    }
    rows = []
    for p, lang, score in zip(df["path"], df["lang"], df["score"]):
        c = by_path[p]
        rows.append(
            (
                p,
                lang,
                len(c.encode("utf-8")),
                len(tokenize_text(c)),
                float(score),
            )
        )
    return rows


def test_stats_exact(eng, tiny_corpus):
    q = "merge stream"
    rows = _truth(eng, tiny_corpus, q)
    dls = [r[3] for r in rows]
    res = eng.search_aggregate(q, {"kind": "stats", "field": "dl_content"})
    assert res["count"] == len(dls)
    assert res["min"] == min(dls)
    assert res["max"] == max(dls)
    assert res["sum"] == sum(dls)
    assert res["avg"] == float(sum(dls)) / float(len(dls))


def test_extended_stats_exact(eng, tiny_corpus):
    """ES extended_stats: exact integer moments, variance as ONE
    double divide of (n*ssq - sum^2), std as its IEEE sqrt."""
    import math

    q = "merge stream"
    rows = _truth(eng, tiny_corpus, q)
    dls = [r[3] for r in rows]
    res = eng.search_aggregate(
        q, {"kind": "extended_stats", "field": "dl_content"}
    )
    n = len(dls)
    ssq = sum(d * d for d in dls)
    assert res["count"] == n
    assert res["min"] == min(dls)
    assert res["max"] == max(dls)
    assert res["sum"] == sum(dls)
    assert res["sum_sq"] == ssq
    assert res["avg"] == float(sum(dls)) / float(n)
    var = float(n * ssq - sum(dls) * sum(dls)) / (float(n) * float(n))
    assert res["variance"] == var
    assert res["std_deviation"] == math.sqrt(var)
    # shard-count invariance: the big-int merge is associative
    one = BM25Engine(eng.index_dir, num_shards=1, auto_reload=False)
    try:
        assert one.search_aggregate(
            q, {"kind": "extended_stats", "field": "dl_content"}
        ) == res
    finally:
        one.close()


def test_extended_stats_empty_match_set(eng):
    res = eng.search_aggregate(
        "zzznosuchterm", {"kind": "extended_stats", "field": "dl_content"}
    )
    assert res["count"] == 0 and res["sum"] == 0 and res["sum_sq"] == 0
    assert res["min"] is None and res["variance"] is None
    assert res["std_deviation"] is None and res["avg"] is None


def test_histogram_exact_and_consistent(eng, tiny_corpus):
    q = "merge"
    rows = _truth(eng, tiny_corpus, q)
    interval = 64
    want = {}
    for r in rows:
        k = (r[2] // interval) * interval
        want[k] = want.get(k, 0) + 1
    res = eng.search_aggregate(
        q, {"kind": "histogram", "field": "n_bytes", "interval": interval}
    )
    assert res["buckets"] == dict(sorted(want.items()))
    # collector consistency: histogram total == stats count over the
    # same field/query
    st = eng.search_aggregate(q, {"kind": "stats", "field": "n_bytes"})
    assert sum(res["buckets"].values()) == st["count"]


def test_range_es_semantics(eng, tiny_corpus):
    q = "merge"
    rows = _truth(eng, tiny_corpus, q)
    edges = [150, 600]
    res = eng.search_aggregate(
        q, {"kind": "range", "field": "n_bytes", "edges": edges}
    )
    # [from, to) buckets, open ends, EMPTY buckets still present
    assert list(res["ranges"]) == ["*-150", "150-600", "600-*"]
    nb = [r[2] for r in rows]
    assert res["ranges"]["*-150"] == sum(v < 150 for v in nb)
    assert res["ranges"]["150-600"] == sum(150 <= v < 600 for v in nb)
    assert res["ranges"]["600-*"] == sum(v >= 600 for v in nb)
    assert sum(res["ranges"].values()) == len(nb)


def test_cardinality_exact_sets(eng, tiny_corpus):
    q = "stream"
    rows = _truth(eng, tiny_corpus, q)
    langs = sorted({r[1] for r in rows})
    res = eng.search_aggregate(q, {"kind": "cardinality", "field": "lang"})
    assert res["matches"] == len(rows)
    assert res["cardinality"] == len(langs)
    assert res["values"] == langs


def test_top_hits_matches_global_ranking(eng, tiny_corpus):
    """Each lang bucket's top-k must equal the engine's own full ranked
    list restricted to that lang — same paths, bit-equal scores."""
    q = "merge stream"
    k = 4
    rows = _truth(eng, tiny_corpus, q)
    hits = eng.search_top_hits(q, "lang", top_k=k)
    want = {}
    for p, lang, _, _, score in rows:  # rows already in ranked order
        want.setdefault(lang, []).append((p, score))
    assert set(hits) == set(want)
    for lang, (docs, scores, paths) in hits.items():
        exp = want[lang][:k]
        assert list(paths) == [p for p, _ in exp]
        assert [float(s) for s in scores] == [s for _, s in exp]
        assert len(docs) == len(exp)


def test_empty_match_set(eng):
    res = eng.search_aggregate(
        "zzzzunknowntermzzzz", {"kind": "stats", "field": "n_bytes"}
    )
    assert res == {"count": 0, "min": None, "max": None, "sum": 0,
                   "avg": None}
    res = eng.search_aggregate(
        "zzzzunknowntermzzzz", {"kind": "histogram", "field": "n_bytes",
                                "interval": 10}
    )
    assert res["buckets"] == {}
    assert eng.search_top_hits("zzzzunknowntermzzzz", "lang", 3) == {}


def test_bad_field_and_spec_raise(eng):
    with pytest.raises(Exception, match="no such numeric fast field"):
        eng.search_aggregate("merge", {"kind": "stats", "field": "lang"})
    with pytest.raises(Exception, match="no such facet field"):
        eng.search_aggregate(
            "merge", {"kind": "cardinality", "field": "nope"}
        )
    with pytest.raises(Exception, match="interval must be positive"):
        eng.search_aggregate(
            "merge", {"kind": "histogram", "field": "n_bytes",
                      "interval": 0}
        )
    with pytest.raises(Exception, match="strictly increasing"):
        eng.search_aggregate(
            "merge", {"kind": "range", "field": "n_bytes",
                      "edges": [5, 5]}
        )
    with pytest.raises(Exception, match="unknown aggregation kind"):
        eng.search_aggregate("merge", {"kind": "geo_bounds",
                                       "field": "n_bytes"})


def test_percentiles_exact(eng, tiny_corpus):
    """Discrete quantile = the ceil(q*n)-th smallest value (1-indexed),
    brute-forced on the sorted match-set values."""
    import math

    q = "merge"
    rows = _truth(eng, tiny_corpus, q)
    dls = sorted(r[3] for r in rows)
    res = eng.search_aggregate(
        q, {"kind": "percentiles", "field": "dl_content"}
    )
    assert res["count"] == len(dls)
    for qq, got in res["percentiles"].items():
        rank = max(1, math.ceil(qq * len(dls)))
        assert got == dls[rank - 1], qq
    # custom quantile list, incl. the extremes
    res = eng.search_aggregate(
        q,
        {"kind": "percentiles", "field": "dl_content", "qs": [0.0, 1.0]},
    )
    assert res["percentiles"][0.0] == dls[0]  # rank clamps to 1
    assert res["percentiles"][1.0] == dls[-1]
    # empty match set -> None quantiles
    res = eng.search_aggregate(
        "zzzzunknowntermzzzz",
        {"kind": "percentiles", "field": "dl_content"},
    )
    assert res["count"] == 0
    assert set(res["percentiles"].values()) == {None}


def test_sort_by_field_both_directions(eng, tiny_corpus):
    """order_by_u64_field: top-k by fast-field value must equal the
    brute-force sort of the full match set; ascending flips exactly."""
    q = "merge"
    k = 7
    rows = _truth(eng, tiny_corpus, q)
    nb = sorted(((r[2], r[0]) for r in rows))  # (n_bytes, path)
    res = eng.search_sort_by_field(q, "n_bytes", top_k=k, ascending=True)
    assert [int(v) for v in res["values"]] == [v for v, _ in nb[:k]]
    res_d = eng.search_sort_by_field(q, "n_bytes", top_k=k)
    assert [int(v) for v in res_d["values"]] == [
        v for v, _ in sorted(nb, key=lambda p: -p[0])[:k]
    ]
    assert len(res_d["paths"]) == len(res_d["doc_ids"]) == k
    with pytest.raises(Exception, match="no such numeric fast field"):
        eng.search_sort_by_field(q, "lang", top_k=k)


def test_sort_by_field_drains_small_match_set(eng, tiny_corpus):
    q = "merge stream"
    rows = _truth(eng, tiny_corpus, q)
    res = eng.search_sort_by_field(q, "n_bytes", top_k=10**6)
    assert len(res["values"]) == len(rows)
    assert sorted(res["paths"]) == sorted(r[0] for r in rows)


@pytest.mark.parametrize("seed", [11, 23])
def test_collectors_fuzz_vs_match_set(ray_session, tmp_path, seed):
    """Randomized conformance for the collector family: on a random
    corpus with random langs, every collector (facets, stats,
    histogram, range, percentiles, cardinality, top-hits, fast-field
    sort) must agree with brute force over the engine's own exhaustive
    match set (search_raw is itself fuzz-proven rank-identical to the
    independent oracle)."""
    import math

    import ray.data

    import ck_ray.build as ckb
    from ck_ray.ids import doc_id_for
    from test_fuzz_conformance import _random_corpus, _random_queries

    rng = np.random.RandomState(seed)
    corpus = _random_corpus(rng, int(rng.randint(40, 100)))
    langs = [
        ["py", "rs", "go"][j] for j in rng.randint(0, 3, corpus.num_rows)
    ]
    import pyarrow as pa

    corpus = corpus.set_column(
        corpus.schema.get_field_index("lang"), "lang",
        pa.array(langs, pa.string()),
    )
    meta = {}
    for row in corpus.to_pylist():
        did = doc_id_for(row["repo"], row["path"], row["commit"])
        meta[did] = (
            row["lang"],
            len(row["content"].encode("utf-8")),
            len(tokenize_text(row["content"])),
        )
    d = str(tmp_path / f"aggidx{seed}")
    ckb.build_index(
        ray.data.from_arrow(corpus), d,
        ckb.IndexConfig(num_parts=2, batch_size=16),
    )
    e = BM25Engine(d, num_shards=3)
    try:
        for q in _random_queries(rng, 10):
            docs, scores = e.search_raw(q, BIG, pruning=False)
            docs = [int(x) for x in docs]
            m = [meta[x] for x in docs]
            # facets + cardinality
            total, facets = e.search_facets(q, "lang")
            want_f = {}
            for lang, _, _ in m:
                want_f[lang] = want_f.get(lang, 0) + 1
            assert total == len(docs) and facets == want_f, q
            card = e.search_aggregate(
                q, {"kind": "cardinality", "field": "lang"}
            )
            assert card["cardinality"] == len(want_f), q
            # stats + histogram + range + percentiles on n_bytes
            nb = sorted(x[1] for x in m)
            st = e.search_aggregate(
                q, {"kind": "stats", "field": "n_bytes"}
            )
            assert st["count"] == len(nb) and st["sum"] == sum(nb), q
            iv = int(rng.choice([7, 64]))
            h = e.search_aggregate(
                q, {"kind": "histogram", "field": "n_bytes",
                    "interval": iv}
            )
            want_h = {}
            for v in nb:
                want_h[(v // iv) * iv] = want_h.get((v // iv) * iv, 0) + 1
            assert h["buckets"] == want_h, q
            edges = sorted(
                set(int(x) for x in rng.randint(0, 400, 2))
            ) or [100]
            r = e.search_aggregate(
                q, {"kind": "range", "field": "n_bytes", "edges": edges}
            )
            assert sum(r["ranges"].values()) == len(nb), q
            pq = float(rng.choice([0.25, 0.5, 1.0]))
            p = e.search_aggregate(
                q, {"kind": "percentiles", "field": "n_bytes",
                    "qs": [pq]}
            )
            if nb:
                assert p["percentiles"][pq] == nb[
                    max(1, math.ceil(pq * len(nb))) - 1
                ], q
            # top-hits per lang == ranked list filtered per bucket
            k = int(rng.randint(1, 5))
            th = e.search_top_hits(q, "lang", top_k=k)
            want_th = {}
            for did, s in zip(docs, scores):
                want_th.setdefault(meta[did][0], []).append(
                    (did, float(s))
                )
            assert set(th) == set(want_th), q
            for lang, (hd, hs, _) in th.items():
                exp = want_th[lang][:k]
                assert [int(x) for x in hd] == [x for x, _ in exp], q
                assert [float(x) for x in hs] == [x for _, x in exp], q
            # fast-field sort: (value, doc asc) total order both ways
            for asc in (True, False):
                sr = e.search_sort_by_field(
                    q, "n_bytes", top_k=k, ascending=asc
                )
                key = sorted(
                    ((meta[did][1], did) for did in docs),
                    key=lambda t: (t[0] if asc else -t[0], t[1]),
                )[:k]
                assert [int(v) for v in sr["values"]] == [
                    v for v, _ in key
                ], q
                assert [int(x) for x in sr["doc_ids"]] == [
                    x for _, x in key
                ], q
    finally:
        e.close()


def test_facet_stats_exact(eng, tiny_corpus):
    """Sub-aggregation (terms + nested stats): per-lang stats must
    equal brute force over the match set, and be consistent with the
    flat facet counts."""
    q = "merge stream"
    rows = _truth(eng, tiny_corpus, q)
    want = {}
    for _, lang, _, dl, _ in rows:
        want.setdefault(lang, []).append(dl)
    res = eng.search_facet_stats(q, "lang", "dl_content")
    assert set(res) == set(want)
    for lang, dls in want.items():
        st = res[lang]
        assert st["count"] == len(dls)
        assert st["min"] == min(dls) and st["max"] == max(dls)
        assert st["sum"] == sum(dls)
        assert st["avg"] == float(sum(dls)) / float(len(dls))
    _, facets = eng.search_facets(q, "lang")
    assert {v: s["count"] for v, s in res.items()} == facets
    with pytest.raises(Exception, match="no such numeric fast field"):
        eng.search_facet_stats(q, "lang", "repo")
    assert eng.search_facet_stats("zzzzunknowntermzzzz") == {}


def test_multi_agg_equals_single_pass(eng):
    """One-pass multi-agg must equal N independent single-pass calls —
    for every aggregation kind, over the same query."""
    q = "merge stream"
    specs = {
        "st": {"kind": "stats", "field": "n_bytes"},
        "h": {"kind": "histogram", "field": "dl_content", "interval": 32},
        "r": {"kind": "range", "field": "n_bytes", "edges": [300]},
        "p": {"kind": "percentiles", "field": "dl_content", "qs": [0.5]},
        "c": {"kind": "cardinality", "field": "lang"},
    }
    multi = eng.search_aggregate_multi(q, specs)
    assert set(multi) == set(specs)
    for name, spec in specs.items():
        assert multi[name] == eng.search_aggregate(q, spec), name


def test_filters_agg_equals_per_query_calls(eng):
    """One-pass filters agg (ES `filters`: N named filter queries, one
    spec) must equal N independent search_aggregate calls — including
    boolean filters, a never-matching filter, and every agg kind."""
    filters = {
        "both": "merge AND stream",
        "either": "merge stream",
        "not_merge": "stream -merge",
        "nothing": "zzznosuchterm",
    }
    for spec in (
        {"kind": "stats", "field": "dl_content"},
        {"kind": "histogram", "field": "n_bytes", "interval": 256},
        {"kind": "cardinality", "field": "lang"},
    ):
        got = eng.search_filters_agg(filters, spec)
        assert set(got) == set(filters)
        for name, q in filters.items():
            assert got[name] == eng.search_aggregate(q, spec), (
                name, spec["kind"],
            )
    # count consistency: both + disjoint splits == either
    st = eng.search_filters_agg(
        filters, {"kind": "stats", "field": "dl_content"}
    )
    only_merge = eng.search_aggregate(
        "merge -stream", {"kind": "stats", "field": "dl_content"}
    )
    assert (
        st["both"]["count"] + st["not_merge"]["count"]
        + only_merge["count"] == st["either"]["count"]
    )
    assert st["nothing"]["count"] == 0


def test_aggregate_agrees_with_facets(eng):
    """Count consistency across independent collector paths: the facet
    collector's total == cardinality's match count, and per-facet
    counts bound each bucket's top-hits length."""
    q = "merge stream"
    total, facets = eng.search_facets(q, "lang")
    card = eng.search_aggregate(q, {"kind": "cardinality",
                                    "field": "lang"})
    assert card["matches"] == total
    assert card["cardinality"] == len(facets)
    hits = eng.search_top_hits(q, "lang", top_k=3)
    for lang, (docs, _, _) in hits.items():
        assert len(docs) == min(3, facets[lang])


class TestCompositeAgg:
    """ES composite aggregation: multi-source keys + after_key paging."""

    @pytest.fixture(scope="class")
    def comp_idx(self, ray_session, tmp_path_factory):
        import pyarrow as pa
        import ray.data

        from ck_ray.build import IndexConfig, build_index

        rows = []
        for i in range(30):
            lang = ["python", "rust", "go"][i % 3]
            # content length varies so n_bytes buckets spread
            rows.append((f"p{i:02d}", lang, "merge " * (i + 1)))
        t = pa.table(
            {
                "repo": ["r"] * len(rows),
                "path": [r[0] for r in rows],
                "commit": ["0"] * len(rows),
                "lang": [r[1] for r in rows],
                "content": [r[2] for r in rows],
            }
        )
        d = str(tmp_path_factory.mktemp("comp") / "idx")
        build_index(ray.data.from_arrow(t), d, IndexConfig(num_parts=2))
        return d

    SOURCES = [
        {"field": "lang", "type": "terms"},
        {"field": "n_bytes", "type": "histogram", "interval": 64},
    ]

    def test_pages_equal_oneshot_and_counts_sum(self, comp_idx):
        from ck_ray.query import BM25Engine

        eng = BM25Engine(comp_idx, num_shards=2)
        try:
            oneshot, _ = eng.search_composite_agg(
                "merge", self.SOURCES, size=10**6
            )
            pages, after = [], None
            while True:
                b, after = eng.search_composite_agg(
                    "merge", self.SOURCES, size=3, after=after
                )
                if len(b) == 0:
                    break
                assert len(b) <= 3
                pages.append(b)
                if after is None:
                    break
            import pandas as pd

            walked = pd.concat(pages, ignore_index=True)
            assert walked.equals(oneshot)
            assert int(oneshot["n_docs"].sum()) == 30  # every doc once
            # composite key order: lang asc, then bucket asc within lang
            langs = list(oneshot["lang"])
            assert langs == sorted(langs)
        finally:
            eng.close()

    def test_desc_order(self, comp_idx):
        from ck_ray.query import BM25Engine

        eng = BM25Engine(comp_idx, num_shards=2)
        try:
            src = [
                {"field": "lang", "type": "terms", "order": "desc"},
                {"field": "n_bytes", "type": "histogram", "interval": 64},
            ]
            b, _ = eng.search_composite_agg("merge", src, size=10**6)
            langs = list(b["lang"])
            assert langs == sorted(langs, reverse=True)
            # paging respects the desc comparator too
            p1, after = eng.search_composite_agg("merge", src, size=4)
            p2, _ = eng.search_composite_agg("merge", src, size=10**6,
                                             after=after)
            import pandas as pd

            assert pd.concat([p1, p2], ignore_index=True).equals(b)
        finally:
            eng.close()

    def test_unknown_field_raises(self, comp_idx):
        from ck_ray.query import BM25Engine

        eng = BM25Engine(comp_idx, num_shards=2)
        try:
            with pytest.raises(Exception, match="no such"):
                eng.search_composite_agg(
                    "merge", [{"field": "nope", "type": "terms"}], size=5
                )
        finally:
            eng.close()


def test_suggest_complete(ray_session, tiny_index):
    """Completion suggester: prefix expansion ranked by df desc."""
    eng = BM25Engine(tiny_index, num_shards=2)
    try:
        got = eng.suggest_complete("mer", size=5)
        assert got, "corpus has merge* identifiers"
        terms = [t for t, _ in got]
        dfs = [d for _, d in got]
        assert all(t.startswith("mer") for t in terms)
        assert dfs == sorted(dfs, reverse=True)
        # ties broken by term asc
        for (t1, d1), (t2, d2) in zip(got, got[1:]):
            assert d1 > d2 or (d1 == d2 and t1 < t2)
        assert eng.suggest_complete("zzzznope") == []
    finally:
        eng.close()


def test_adjacency_matrix(ray_session, tiny_index):
    """ES adjacency_matrix: pairwise counts consistent with facets."""
    eng = BM25Engine(tiny_index, num_shards=2)
    try:
        m = eng.search_adjacency_matrix(
            {"a": "merge", "b": "tokenize", "c": "zzznothing"}
        )
        # empty filter omitted entirely (no singleton, no pairs)
        assert "c" not in m and not any("c" in k for k in m)
        # singleton counts equal the facet totals for the same query
        total_a, _ = eng.search_facets("merge", "lang")
        assert m["a"] == total_a
        # intersection bounded by both singletons
        if "a&b" in m:
            assert m["a&b"] <= min(m["a"], m["b"])
        # boolean-AND query count equals the pair bucket
        total_ab, _ = eng.search_facets("merge AND tokenize", "lang")
        assert m.get("a&b", 0) == total_ab
    finally:
        eng.close()


def test_suggest_complete_analyzer_normalized(ray_session, tiny_index):
    """Mixed-case input completes like its analyzed form (review
    finding: the raw prefix probed the lowercased dictionary)."""
    eng = BM25Engine(tiny_index, num_shards=2)
    try:
        assert eng.suggest_complete("Mer", 5) == eng.suggest_complete("mer", 5)
        assert eng.suggest_complete("new Mer", 5) == eng.suggest_complete("mer", 5)
        assert eng.suggest_complete("!!!", 5) == []
    finally:
        eng.close()


def test_composite_agg_fuzz_vs_pandas(ray_session, tmp_path_factory):
    """Randomized differential: composite buckets + full after_key
    walks equal a pandas groupby brute force over the corpus, across
    random source combos, orders and page sizes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ck_ray.build import IndexConfig, build_index
    from ck_ray.query import BM25Engine

    rng = np.random.RandomState(5)
    langs = ["python", "rust", "go", "java"]
    rows = []
    for i in range(80):
        body = "merge " * int(rng.randint(1, 40))
        rows.append((f"p{i:02d}", langs[int(rng.randint(4))], body))
    t = pa.table(
        {
            "repo": ["r"] * len(rows),
            "path": [r[0] for r in rows],
            "commit": ["0"] * len(rows),
            "lang": [r[1] for r in rows],
            "content": [r[2] for r in rows],
        }
    )
    d = str(tmp_path_factory.mktemp("compfuzz") / "idx")
    build_index(ray.data.from_arrow(t), d, IndexConfig(num_parts=2))
    base = pd.DataFrame(
        {
            "lang": [r[1] for r in rows],
            "n_bytes": [len(r[2].encode()) for r in rows],
        }
    )
    eng = BM25Engine(d, num_shards=2)
    try:
        for _ in range(12):
            use_hist = bool(rng.randint(2))
            sources = [
                {
                    "field": "lang", "type": "terms",
                    "order": ["asc", "desc"][int(rng.randint(2))],
                }
            ]
            cols = ["lang"]
            if use_hist:
                iv = int(rng.choice([32, 64, 128]))
                sources.append(
                    {
                        "field": "n_bytes", "type": "histogram",
                        "interval": iv,
                        "order": ["asc", "desc"][int(rng.randint(2))],
                    }
                )
                cols.append("n_bytes")
            # brute force: groupby over every doc (query 'merge'
            # matches all — every doc contains it)
            bf = base.copy()
            if use_hist:
                bf["n_bytes"] = (bf["n_bytes"] // iv) * iv
            want = (
                bf.groupby(cols).size().reset_index(name="n_docs")
            )
            for s in reversed(sources):
                want = want.sort_values(
                    s["field"],
                    ascending=s.get("order", "asc") == "asc",
                    kind="stable",
                )
            want = want.reset_index(drop=True)
            size = int(rng.randint(1, 6))
            pages, after = [], None
            while True:
                b, after = eng.search_composite_agg(
                    "merge", sources, size=size, after=after
                )
                if len(b) == 0:
                    break
                pages.append(b)
                if after is None:
                    break
            got = pd.concat(pages, ignore_index=True)
            got = got[want.columns.tolist()]
            try:
                pd.testing.assert_frame_equal(
                    got.astype({"n_docs": "int64"}),
                    want.astype({"n_docs": "int64"}),
                    check_dtype=False,
                )
            except AssertionError as e:
                raise AssertionError(
                    f"config sources={sources} size={size}: {e}"
                ) from e
    finally:
        eng.close()
