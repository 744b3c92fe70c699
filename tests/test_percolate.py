"""Percolator semantics: stored-query matching over a document stream.

Most cases drive ``Percolator`` directly on a pyarrow batch (it is a pure
``map_batches`` callable); the end-to-end Ray path and batch-boundary
invariance are covered at the bottom. The driver entry
``percolate_matches`` is additionally gated by a DuckDB oracle
(``__ray_entry__.py``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ck_ray.ops.percolate import Percolator, percolate


def _table(texts, ids=None, id_type=pa.int64()):
    if ids is None:
        ids = list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, id_type),
            "text": pa.array(texts, pa.string()),
        }
    )


def _matches(queries, texts, **kw):
    """{query_name: sorted doc_id list} from one direct batch call."""
    out = Percolator(queries, text_col="text", **kw)(_table(texts))
    df = out.to_pandas()
    return {
        n: sorted(g["doc_id"]) for n, g in df.groupby("query_name")
    }


DOCS = [
    "merge sort window",            # 0
    "merge only here",              # 1
    "the window stays open",        # 2
    "sort then merge the Window",   # 3
    "",                             # 4 (tokenless)
    "wind and windmill turn",       # 5
]


def test_single_term():
    m = _matches({"q": "merge"}, DOCS)
    assert m["q"] == [0, 1, 3]


def test_and_intersection():
    m = _matches({"q": "merge AND window"}, DOCS)
    assert m["q"] == [0, 3]


def test_or_union():
    m = _matches({"q": "merge OR open"}, DOCS)
    assert m["q"] == [0, 1, 2, 3]


def test_must_not():
    m = _matches({"q": "window -sort"}, DOCS)
    assert m["q"] == [2]


def test_must_not_only_matches_nothing():
    # Lucene rule: a node with only MUST_NOT children matches nothing
    m = _matches({"q": "-merge"}, DOCS)
    assert "q" not in m


def test_nested_boolean():
    m = _matches({"q": "(open OR sort) AND window"}, DOCS)
    assert m["q"] == [0, 2, 3]


def test_phrase_adjacency():
    m = _matches({"q": '"merge sort"'}, DOCS)
    assert m["q"] == [0]  # doc 3 has both terms but not adjacent


def test_phrase_order_sensitive():
    m = _matches({"q": '"sort merge"'}, DOCS)
    assert "q" not in m


def test_const_term_set():
    m = _matches({"q": "IN [open windmill nosuch]"}, DOCS)
    assert m["q"] == [2, 5]


def test_match_all_includes_tokenless_docs():
    m = _matches({"q": "*"}, DOCS)
    assert m["q"] == [0, 1, 2, 3, 4, 5]


def test_prefix_expansion():
    m = _matches({"q": "wind*"}, DOCS)
    assert m["q"] == [0, 2, 3, 5]  # window, windmill, wind


def test_range_expansion():
    m = _matches({"q": "[open TO sort]"}, DOCS)
    # vocab in [open, sort]: open, sort, stays ("only" < "open")
    assert m["q"] == [0, 2, 3]


def test_fuzzy_expansion():
    m = _matches({"q": "wand~1"}, DOCS)  # wind is 1 edit away
    assert m["q"] == [5]


def test_regex_expansion():
    m = _matches({"q": "/w[io]nd.*/"}, DOCS)
    assert m["q"] == [0, 2, 3, 5]


def test_multiple_queries_one_pass():
    m = _matches({"a": "merge", "b": "window -sort"}, DOCS)
    assert m["a"] == [0, 1, 3] and m["b"] == [2]


def test_sloppy_phrase_matches_engine_rule():
    """"a b"~N percolates with the scoring engine's greedy-chain rule:
    total extra gap of the greedy in-order chain <= slop."""
    docs = [
        "merge sort window",        # 0: gap(merge->window) = 1
        "merge a b c window",       # 1: gap = 3
        "window then merge",        # 2: wrong order only
        "merge window",             # 3: exact adjacency, gap 0
        "nothing relevant",         # 4
    ]
    m = _matches({"q": '"merge window"~1'}, docs)
    assert m.get("q", []) == [0, 3]
    m = _matches({"q": '"merge window"~3'}, docs)
    assert m.get("q", []) == [0, 1, 3]
    # slop inside a boolean node
    m = _matches({"q": 'sort OR "merge window"~0'}, docs)
    assert m.get("q", []) == [0, 3]


def test_sloppy_phrase_greedy_equals_exists():
    """Greedy chaining accepts iff SOME occurrence tuple fits (greedy
    minimizes the last link for a fixed head) — the doc where only the
    SECOND 'a' occurrence can reach 'b' still matches."""
    docs = ["a x x x x a b"]  # head at 0 fails ~1; head at 5 succeeds
    m = _matches({"q": '"a b"~1'}, docs)
    assert m.get("q", []) == [0]


def test_non_content_field_rejected_at_registration():
    with pytest.raises(ValueError, match="path"):
        Percolator({"q": "path:src AND merge"})


def test_string_ids_preserved():
    ids = [f"d{i}" for i in range(len(DOCS))]
    out = Percolator({"q": "merge"})(
        _table(DOCS, ids=ids, id_type=pa.string())
    )
    assert out.schema.field("doc_id").type == pa.string()
    assert sorted(out["doc_id"].to_pylist()) == ["d0", "d1", "d3"]


def test_empty_batch_keeps_schema():
    out = Percolator({"q": "merge"})(_table([], ids=[]))
    assert out.num_rows == 0
    assert out.schema.field("doc_id").type == pa.int64()


def test_wide_expansion_uncapped():
    # >1024 dictionary terms under one prefix: scored search would cap
    # (Lucene maxClauseCount) but match-only percolation must not —
    # results can't depend on vocabulary size or batch boundaries
    texts = [" ".join(f"term{j:05d}" for j in range(i, i + 600))
             for i in range(0, 1800, 600)]
    m = _matches({"q": "term*"}, texts)
    assert m["q"] == [0, 1, 2]


def test_batch_boundary_invariance(ray_session):
    # same matches whether the stream arrives as 1 batch or 6
    import ray.data

    queries = {
        "a": "merge AND window",
        "b": '"merge sort"',
        "c": "wind*",
        "d": "[open TO sort]",
    }
    whole = percolate(
        ray.data.from_arrow(_table(DOCS)), queries, id_col="doc_id"
    )
    split = percolate(
        ray.data.from_arrow(_table(DOCS)).repartition(6),
        queries,
        id_col="doc_id",
    )
    pd.testing.assert_frame_equal(whole, split)
    assert list(whole.columns) == ["query_name", "doc_id"]


def test_end_to_end_entry_shape(ray_session, tmp_path):
    # the driver-entry wrapper over a miniature documents.parquet
    import pyarrow.parquet as pq

    from ck_ray.ops.percolate import STORED_QUERIES, percolate_matches

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "dup merge key order",
                    "spark streams win the race",
                    "sort key wins dup",
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = percolate_matches(str(tmp_path))
    got = {n: sorted(g["doc_id"]) for n, g in df.groupby("query_name")}
    assert got["dup_and_merge"] == [1]
    assert got["phrase_key_order"] == [1]
    assert got["spark_not_dup"] == [2]
    assert got["nested_bool"] == [3]
    assert got["set_rare"] == [1, 3]
    assert got["prefix_win"] == [2, 3]
    assert got["all_docs"] == [1, 2, 3]
    assert got["fuzzy_spark"] == [2]
    assert set(STORED_QUERIES) >= set(got)


def test_phrase_prefix_percolates():
    """'"a b"*' (match-phrase-prefix) percolates through the shared
    expand_prefix_tree rewrite: last term expands against the batch
    vocabulary, phrase order still enforced."""
    docs = [
        "merge windows now",   # 0: phrase with expansion 'windows'
        "merge sort",          # 1: no second term
        "windows merge",       # 2: wrong order
        "merge windmill blade" # 3: different expansion, still a match
    ]
    m = _matches({"pp": '"merge wind"*'}, docs)
    assert m.get("pp", []) == [0, 3]


def test_actor_death_midstream_exactly_once(ray_session, tmp_path):
    """Kill ONE pool actor hard (os._exit) on its first batch: Ray Data
    must restart the actor and retry the lost task, and the match-pair
    stream must come out EXACTLY once — bit-identical to an undisturbed
    run (no lost batch, no double emission)."""
    import os

    import ray
    import ray.data

    from ck_ray.ops import bind_ctor

    texts = [
        f"merge window doc{i}" if i % 3 else f"sort key doc{i}"
        for i in range(240)
    ]
    t = _table(texts, list(range(240)))
    queries = {"mw": "merge AND window", "sk": '"sort key"', "p": "doc*"}
    clean = percolate(
        ray.data.from_arrow(t).repartition(8), queries, id_col="doc_id"
    )

    sentinel = str(tmp_path / "died_once")

    class _ChaosPercolator(Percolator):
        def __call__(self, batch):
            if not os.path.exists(sentinel):
                try:
                    with open(sentinel, "x") as fh:
                        fh.write("x")
                    os._exit(1)  # hard worker death, mid-task
                except FileExistsError:
                    pass  # another actor already died for us
            return super().__call__(batch)

    out = (
        ray.data.from_arrow(t)
        .repartition(8)
        .map_batches(
            bind_ctor(
                _ChaosPercolator, queries=queries,
                text_col="text", id_col="doc_id",
            ),
            batch_format="pyarrow",
            concurrency=(2, 4),
        )
        .to_pandas()
        .sort_values(["query_name", "doc_id"])
        .reset_index(drop=True)
    )
    assert os.path.exists(sentinel), "chaos never fired"
    pd.testing.assert_frame_equal(out, clean)


def test_job_percolate_rerun_exactly_once(ray_session, tmp_path):
    """The percolate job subcommand is rerun-safe: a second run into the
    same --output (e.g. retrying after an interrupted job) REPLACES the
    previous pair set instead of appending to it — both runs read back
    exactly the in-process percolate() result."""
    import glob
    import json

    import pyarrow.parquet as pq
    import ray.data

    from ck_ray.job import main as job_main

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    t = _table(
        [f"merge window doc{i}" for i in range(60)], list(range(60))
    )
    pq.write_table(t, str(corpus / "part-0.parquet"))
    reg = tmp_path / "reg.json"
    reg.write_text(json.dumps({"mw": "merge AND window", "p": "doc*"}))
    outdir = tmp_path / "out"

    want = percolate(
        ray.data.from_arrow(t), {"mw": "merge AND window", "p": "doc*"},
        id_col="doc_id",
    )

    for _run in range(2):
        rc = job_main(
            [
                "percolate", "--corpus", str(corpus),
                "--queries", str(reg), "--text-col", "text",
                "--id-col", "doc_id", "--output", str(outdir),
            ]
        )
        assert rc == 0
        files = sorted(glob.glob(str(outdir / "*.parquet")))
        assert files
        got = (
            pa.concat_tables([pq.read_table(f) for f in files])
            .to_pandas()
            .sort_values(["query_name", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want)


def test_regex_unicode_class_matches_python_re():
    """Review fix: backslash classes must keep Python-re (Unicode)
    semantics — RE2 would treat \\w as ASCII and silently drop
    non-ASCII tokens the tokenizer emits; plain patterns still take
    the vectorized path and agree."""
    docs = ["naïve café merge", "naive merge", "merge only"]
    m = _matches({"q": "/\\w+é/"}, docs)
    assert m["q"] == [0]  # 'café' — Unicode \w semantics
    m2 = _matches({"q": "/na.*/"}, docs)  # vectorized RE2 path
    assert m2["q"] == [0, 1]
