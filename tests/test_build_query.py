"""End-to-end: SPIMI build -> BM25 engine, rank-identical to the oracle."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ck_ray.build as ckb
from ck_ray.oracle import BM25Oracle
from ck_ray.query import BM25Engine, parse_query

# Reference query suite (FIXTURES.md §2): rare / hot / multi-OR / phrase /
# camelCase / path-only / absent / case variance / long token / unicode.
QUERY_SUITE = [
    ("uq0000042marker", 5),  # unique rare term -> top-1
    ("def", 100),  # hot term
    ("merge", 10),
    ("merge window query", 100),  # multi-term OR
    ("snake_case", 10),  # multi-token word -> phrase semantics
    ("parse_request_body", 10),  # snake ident -> phrase
    ("getUserById", 10),  # camelCase -> single token
    ("GETUSERBYID", 10),  # case variance (lowercased)
    ("zqpathonly", 10),  # path-segment-only term: content default -> no hits
    ("path:zqpathonly", 10),  # explicit path field -> hits
    ("qzx_never_appears_anywhere", 10),  # absent
    ("x" * 41, 10),  # long token -> dropped -> no clause
    ("naïve café", 10),  # unicode
    ("the merge", None),  # default top_k=100
    ('"posting_list"', 5),  # quoted phrase
    ("def return self if", 50),
]


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return BM25Oracle(tiny_corpus)


@pytest.fixture(scope="module")
def engine(tiny_index):
    eng = BM25Engine(tiny_index, num_shards=2)
    yield eng
    eng.close()


def _assert_rank_identical(docs_e, scores_e, docs_o, scores_o):
    assert len(docs_e) == len(docs_o)
    # identical scores bitwise; equal-score ranks compared as sets
    assert np.array_equal(
        np.sort(scores_e)[::-1], np.sort(scores_o)[::-1]
    ), "score multiset differs"
    i = 0
    n = len(docs_e)
    while i < n:
        j = i
        while j < n and scores_e[j] == scores_e[i]:
            j += 1
        assert set(docs_e[i:j].tolist()) == set(docs_o[i:j].tolist())
        i = j
    # deterministic tiebreak means full sequences match exactly too
    assert docs_e.tolist() == docs_o.tolist()


@pytest.mark.parametrize("query,k", QUERY_SUITE, ids=[q[:20] for q, _ in QUERY_SUITE])
def test_rank_identity(engine, oracle, query, k):
    de, se = engine.search_raw(query, k)
    do, so = oracle.search_raw(query, k)
    _assert_rank_identical(de, se, do, so)


def test_unique_term_is_top1(engine, tiny_corpus):
    df = engine.search("uq0000042marker", 5)
    assert len(df) >= 1


def test_threshold_post_normalization(engine, oracle):
    df = engine.search("merge window", top_k=50, threshold=0.5)
    assert (df["normalized_score"] >= 0.5).all()
    assert df["normalized_score"].iloc[0] == 1.0


def test_default_topk_100(engine):
    de, _ = engine.search_raw("def")  # hot term hits >100 docs
    assert len(de) == 100


def test_manifest_stats(tiny_index, tiny_corpus, oracle):
    man = ckb.load_manifest(tiny_index)
    assert man["num_docs"] == tiny_corpus.num_rows
    # avgdl must equal the oracle's exact token accounting
    assert man["fields"]["content"]["avgdl"] == pytest.approx(oracle.avgdl[0], rel=0)
    assert man["fields"]["path"]["avgdl"] == pytest.approx(oracle.avgdl[1], rel=0)


def test_sha256_invariant(tiny_index, tiny_corpus):
    """Per-row sha256(content) equality against the source table."""
    import hashlib

    import pyarrow.dataset as pads

    man = ckb.load_manifest(tiny_index)
    docs = pads.dataset(
        os.path.join(tiny_index, man["epoch_dir"], "docs")
    ).to_table(columns=["repo", "path", "content_sha256"]).to_pandas()
    got = dict(zip(zip(docs["repo"], docs["path"]), docs["content_sha256"]))
    for row in tiny_corpus.to_pylist():
        expect = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[(row["repo"], row["path"])] == expect


def test_parser_semantics():
    from ck_ray.query import collect_clauses

    cs = collect_clauses(parse_query('snake_case "a b" path:foo camelCase'))
    assert [(c.field, c.terms) for c in cs] == [
        ("content", ["snake", "case"]),
        ("content", ["a", "b"]),
        ("path", ["foo"]),
        ("content", ["camelcase"]),
    ]


def test_parallelism_invariance(ray_session, tiny_corpus, tmp_path):
    """Identical segment bytes regardless of batch size / partition layout."""
    import ray.data

    import pyarrow.dataset as pads

    outs = []
    for i, bs in enumerate([32, 200]):
        d = str(tmp_path / f"idx{i}")
        ckb.build_index(
            ray.data.from_arrow(tiny_corpus).repartition(4 if i else 1),
            d,
            ckb.IndexConfig(num_parts=4, batch_size=bs),
        )
        man = ckb.load_manifest(d)
        seg = pads.dataset(
            os.path.join(d, man["epoch_dir"], "segments"), partitioning="hive"
        ).to_table().sort_by([("field", "ascending"), ("term", "ascending")])
        outs.append(seg)
    assert outs[0].equals(outs[1])


@pytest.mark.parametrize("query,k", [(q, k) for q, k in QUERY_SUITE if q], ids=[q[:20] for q, _ in QUERY_SUITE if q])
def test_maxscore_pruning_identical(engine, query, k):
    """Block-max MaxScore pruning must return bitwise-identical top-k."""
    dp, sp = engine.search_raw(query, k, pruning=True)
    dt, st = engine.search_raw(query, k, pruning=False)
    assert dp.tolist() == dt.tolist()
    assert np.array_equal(sp, st)


def test_pruning_engages(tiny_index):
    """The pruned path actually runs for multi-term single-epoch queries."""
    from ck_ray.query import LocalIndex, parse_query

    idx = LocalIndex(tiny_index)  # all buckets: embedded single-process

    def flat(q):
        return idx._flat_should_clauses(parse_query(q)) or []

    assert idx._can_prune(flat("def merge window"))
    assert not idx._can_prune(flat("snake_case merge"))  # phrase
    assert not idx._can_prune(flat("def"))  # single term
    assert idx._flat_should_clauses(parse_query("def AND merge")) is None


def test_engine_matches_committed_goldens(engine):
    """Frozen oracle answers (tests/goldens_bm25.json): exact doc ids and
    f32 score BITS — catches engine+oracle drifting together."""
    import json

    with open(os.path.join(os.path.dirname(__file__), "goldens_bm25.json")) as fh:
        goldens = json.load(fh)
    for query, g in goldens.items():
        docs, scores = engine.search_raw(query, g["top_k"])
        assert docs.tolist() == g["doc_ids"], f"{query}: docs drifted"
        assert scores.view(np.uint32).tolist() == g["score_bits"], (
            f"{query}: score bits drifted"
        )


def test_binary_sniff_skips_nul_rows(ray_session, tmp_path):
    """Reference is_text_file (ck-index/src/lib.rs:1598-1625): a NUL in
    the first 8 KiB skips the row at index time; a NUL past 8 KiB (and
    empty content) still indexes."""
    import ray.data

    rows = {
        "repo": ["r"] * 4,
        "path": ["text.py", "blob.bin", "late.py", "empty.py"],
        "commit": ["c"] * 4,
        "lang": ["python"] * 4,
        "content": [
            "def alpha_marker(): pass",
            "beta_marker \x00\x01\x02 elf header",
            ("x " * 5000) + " gamma_marker",  # NUL after the sniff window:
            "",
        ],
    }
    rows["content"][2] += "\x00"
    t = pa.table(rows)
    idx = str(tmp_path / "idx")
    ckb.build_index(ray.data.from_arrow(t), idx, ckb.IndexConfig(num_parts=2))
    st = ckb.index_stats(idx)
    assert st["num_docs"] == 3  # blob.bin sniffed out
    eng = BM25Engine(idx, num_shards=1)
    try:
        assert len(eng.search_raw("alpha_marker", 5)[0]) == 1
        assert len(eng.search_raw("beta_marker", 5)[0]) == 0
        assert len(eng.search_raw("gamma_marker", 5)[0]) == 1
    finally:
        eng.close()


def test_binary_sniff_can_be_disabled(ray_session, tmp_path):
    import ray.data

    t = pa.table({
        "repo": ["r"], "path": ["blob.bin"], "commit": ["c"],
        "lang": [""], "content": ["keep\x00me binary_kept_marker"],
    })
    idx = str(tmp_path / "idx")
    ckb.build_index(
        ray.data.from_arrow(t), idx,
        ckb.IndexConfig(num_parts=1, skip_binary=False),
    )
    assert ckb.index_stats(idx)["num_docs"] == 1
