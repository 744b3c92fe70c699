"""Operator quality checks: dedup actually finds planted near-dups; regex
context/-l flags; index stats; rerank path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_docs_dir(tmp_path_factory):
    """A documents.parquet with planted exact + near duplicates."""
    rng = np.random.RandomState(0)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "data", "merge", "query", "stream"]
    texts = []
    for i in range(80):
        texts.append(" ".join(rng.choice(vocab, 40)))
    # near-dup pair: 90% shared shingles
    base = " ".join(rng.choice(vocab, 50))
    texts.append(base + " tailword_one extra")
    texts.append(base + " tailword_two other")
    # exact dup pair
    texts.append("exact duplicate content here merge stream")
    texts.append("exact duplicate content here merge stream")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_ngram_jaccard_prefix_equals_direct(ray_session, planted_docs_dir):
    from ck_ray.ops.dedup import ngram_jaccard_pairs

    direct = ngram_jaccard_pairs(planted_docs_dir, prefix_filter=False)
    pref = ngram_jaccard_pairs(planted_docs_dir, prefix_filter=True)
    assert direct.equals(pref)
    pairs = set(zip(pref["doc_a"], pref["doc_b"]))
    assert (82, 83) in pairs  # planted exact dup survives the filter


@pytest.mark.parametrize("seed,thr", [(0, 0.3), (1, 0.5), (2, 0.8)])
def test_ngram_prefix_equals_direct_fuzz(ray_session, tmp_path, seed, thr):
    """Randomized corpora with a tiny vocabulary (dense shared shingles,
    the prefix filter's hardest regime): the ppjoin path must match the
    direct path bit-for-bit at every threshold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(6, 40)))
        for _ in range(50)
    ]
    for i in range(0, 40, 7):  # inject near-dups at varying overlap
        texts[i + 1] = texts[i] + " " + " ".join(rng.choice(vocab, 3))
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / f"fuzz{seed}"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    direct = ngram_jaccard_pairs(str(d), n=3, threshold=thr,
                                 prefix_filter=False)
    pref = ngram_jaccard_pairs(str(d), n=3, threshold=thr,
                               prefix_filter=True)
    assert direct.equals(pref)


def test_ngram_prefix_prunes_stop_shingles(ray_session, tmp_path):
    """60 docs all share one hot 5-gram run (df=60 stop shingles); the
    direct path's stop buckets imply ~60*59/2 internal pairs per stop
    shingle, the prefix filter must emit candidates near zero while
    keeping the planted exact-dup pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.dedup import _prefix_filtered_jaccard, ngram_jaccard_pairs

    stop = "common header boilerplate license line"
    texts = [
        f"{stop} unique{w} body{w} tail{w} word{w} mix{w} suffix{w}"
        for w in range(60)
    ]
    texts += [f"{stop} dupbody dupbody2 dupbody3 dupbody4 dupbody5"] * 2
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    stats: dict = {}
    out = _prefix_filtered_jaccard(
        str(tmp_path / "documents.parquet"), 5, 0.8, stats_out=stats
    )
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (60, 61) in pairs and len(pairs) == 1
    # candidates bounded by the dup pair's shingles, NOT the 60*59/2
    # all-pairs of the shared stop shingles
    assert stats["n_candidate_pairs"] < 20
    direct = ngram_jaccard_pairs(str(tmp_path), 5, 0.8, prefix_filter=False)
    assert out.equals(direct)


def test_minhash_finds_planted_near_dup(ray_session, planted_docs_dir):
    from ck_ray.ops.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(planted_docs_dir, jaccard_threshold=0.5)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (80, 81) in pairs  # near-dup pair
    assert (82, 83) in pairs  # exact pair (jaccard 1.0)
    j = out.set_index(["doc_a", "doc_b"])["jaccard"]
    assert j.loc[(82, 83)] == 1.0


def test_simhash_finds_exact_dup(ray_session, planted_docs_dir):
    from ck_ray.ops.dedup import simhash_pairs

    out = simhash_pairs(planted_docs_dir, max_hamming=3)
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (82, 83) in pairs
    ham = out.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham.loc[(82, 83)] == 0


def test_exact_dedup_planted(ray_session, planted_docs_dir):
    from ck_ray.ops.dedup import exact_dedup

    out = exact_dedup(planted_docs_dir)
    dup = out[out["n_copies"] > 1]
    assert dup["keeper_doc_id"].tolist() == [82]
    assert dup["n_copies"].tolist() == [2]


def test_ann_brute_vs_ivf_recall(ray_session):
    from ck_ray.ops import ann

    sf = "/root/testdata/sf0.001"
    q = ann.query_vector_from(sf, 0)
    exact = ann.cosine_topk(sf, q, k=10)
    approx = ann.ivf_topk(sf, q, k=10, n_cells=8, n_probe=4)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 5  # recall@10 of the IVF path on easy data


def test_ann_ivf_persisted_equals_memory(ray_session, tmp_path):
    from ck_ray.ops import ann

    sf = "/root/testdata/sf0.001"
    q = ann.query_vector_from(sf, vec_id=0)
    info = ann.build_ivf_index(sf, str(tmp_path / "ivf"))
    assert info["n_vectors"] > 0
    a = ann.ivf_persisted_topk(str(tmp_path / "ivf"), q, k=10)
    b = ann.ivf_hyperplane_topk(sf, q, k=10)
    assert a.equals(b)
    # structural pruning: the probed-path list excludes unprobed cells
    import os

    cells = {d for d in os.listdir(tmp_path / "ivf") if d.startswith("cell=")}
    assert len(cells) > 1  # layout actually partitions


def test_ann_tiebreak_and_rebuild_idempotence(ray_session, tmp_path):
    """Duplicate embeddings tie exactly on cosine: the smallest vec_ids
    must win the k boundary (partials tiebreak like the driver merge),
    and rebuilding a persisted index must replace, not append."""
    import numpy as np

    from ck_ray.ops import ann

    vecs = [[1.0, 0.0, 0.0, 0.0]] * 6 + [[0.0, 1.0, 0.0, 0.0]] * 2
    t = pa.table(
        {
            "vec_id": pa.array(range(8), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 8, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    q = np.array([1.0, 0.0, 0.0, 0.0])
    out = ann.cosine_topk(str(tmp_path), q, k=3)
    assert out["vec_id"].tolist() == [0, 1, 2]
    idx = str(tmp_path / "ivf")
    ann.build_ivf_index(str(tmp_path), idx)
    info2 = ann.build_ivf_index(str(tmp_path), idx)  # rerun: replaces
    assert info2["n_vectors"] == 8
    a = ann.ivf_persisted_topk(idx, q, k=3)
    assert a["vec_id"].tolist() == [0, 1, 2]
    assert a["vec_id"].is_unique  # no duplicate rows from the rerun
    assert a.equals(ann.ivf_hyperplane_topk(str(tmp_path), q, k=3))
    with pytest.raises(ValueError):
        ann.build_ivf_index(str(tmp_path), str(tmp_path / "bad"), n_bits=10)


def test_ann_hyperplane_ivf_containment(ray_session):
    """The hyperplane-cell IVF result must be exactly the brute-force
    ranking restricted to probed cells: every returned (vec_id, score)
    appears in the exact scoring with an IDENTICAL score, and recall is
    reasonable on easy data."""
    import numpy as np

    from ck_ray.ops import ann

    sf = "/root/testdata/sf0.001"
    q = ann.query_vector_from(sf, 0)
    exact = ann.cosine_topk(sf, q, k=100)
    approx = ann.ivf_hyperplane_topk(sf, q, k=10)
    escore = dict(zip(exact["vec_id"], exact["score"]))
    for _, r in approx.iterrows():
        if r["vec_id"] in escore:  # same vector -> identical 4dp score
            assert escore[r["vec_id"]] == r["score"]
    overlap = len(set(exact.head(10)["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 5
    # the probed subset never outranks the true best (scores bounded)
    assert np.all(approx["score"].to_numpy() <= exact["score"].iloc[0])


def test_regex_context_and_files_with_matches(ray_session, tiny_corpus):
    import ray.data

    from ck_ray.regex_search import files_with_matches, regex_search

    ds = ray.data.from_arrow(tiny_corpus)
    out = regex_search(ds, "uq0000042marker", before=1, after=1)
    assert len(out) == 1
    ctx = out["context"].iloc[0].split("\n")
    assert 2 <= len(ctx) <= 3 and any("uq0000042marker" in l for l in ctx)

    files = files_with_matches(ray.data.from_arrow(tiny_corpus), "uq0000042marker")
    assert len(files) == 1
    none = files_with_matches(
        ray.data.from_arrow(tiny_corpus), "zz_qqq_absent", invert=True
    )
    assert len(none) == tiny_corpus.num_rows  # -L: every file lacks it


def test_index_stats(tiny_index):
    from ck_ray.build import index_stats

    st = index_stats(tiny_index)
    assert st["num_docs"] == 206
    assert st["n_terms"] > 0 and st["n_postings"] > 0
    assert st["segment_bytes"] > 0
    assert st["num_epochs"] == 1


def test_semantic_rerank(ray_session, tiny_corpus):
    import ray.data

    from ck_ray.semantic import build_chunk_embeddings, semantic_search

    emb = build_chunk_embeddings(
        ray.data.from_arrow(tiny_corpus), concurrency=2
    ).materialize()
    out = semantic_search(emb, "merge posting runs", top_k=5, rerank=True)
    assert "rerank_score" in out.columns
    assert len(out) == 5
    assert out["rerank_score"].is_monotonic_decreasing


def test_near_dup_groups_planted(ray_session, planted_docs_dir):
    from ck_ray.ops.dedup import near_dup_groups

    out = near_dup_groups(planted_docs_dir, jaccard_threshold=0.5)
    g = dict(zip(out["doc_id"], out["group_keeper"]))
    assert g[81] == 80  # near-dup pair clustered under min id
    assert g[83] == 82  # exact pair
    assert g[80] == 80 and g[82] == 82


def test_embedding_near_dups_planted_and_capped(ray_session, tmp_path):
    """Planted near-identical vector pairs must be recovered, and the
    adaptive prefix splitter must never leave a splittable leaf above
    the population cap even under heavy skew (VERDICT r2 #3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.dedup import _leaf_ranges, embedding_near_dups

    rng = np.random.RandomState(5)
    dim = 16
    # heavy skew: 400 vectors clustered around ONE direction (they share
    # most hyperplane signs -> same coarse bucket), plus 100 background
    base = rng.randn(dim)
    cluster = base + 0.05 * rng.randn(400, dim)
    noise = rng.randn(100, dim)
    emb = np.vstack([cluster, noise])
    # planted: vectors 450/451 nearly identical (in the noise region)
    emb[451] = emb[450] + 1e-4 * rng.randn(dim)
    # ... and 10/11 nearly identical inside the skewed cluster
    emb[11] = emb[10] + 1e-4 * rng.randn(dim)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(emb)), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb]),
            "label": pa.array(np.zeros(len(emb), np.int32)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")

    out = embedding_near_dups(str(d), threshold=0.98, cap=32)
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    assert (450, 451) in pairs
    assert (10, 11) in pairs
    # no false positives among pure-noise vectors (random 16-dim pairs
    # don't hit cosine 0.98)
    assert all(a < 400 or (a, b) == (450, 451) for a, b in pairs)

    # splitter invariant: skewed signatures -> every leaf <= cap unless
    # its signatures are all identical
    sigs = np.sort(
        np.concatenate(
            [
                np.full(500, 7, np.uint64) << np.uint64(48),  # one hot prefix
                rng.randint(0, 2**63, 200).astype(np.uint64),
            ]
        )
    )
    # make the hot prefix splittable in its LOW bits
    sigs[:500] |= rng.randint(0, 2**32, 500).astype(np.uint64)
    sigs = np.sort(sigs)
    for s, e in _leaf_ranges(sigs, cap=32, base_bits=4):
        assert e - s <= 32 or sigs[s] == sigs[e - 1]

    # identical-signature mega-leaf is allowed but must still pair
    same = np.zeros(100, np.uint64)
    leaves = _leaf_ranges(same, cap=32, base_bits=4)
    assert leaves == [(0, 100)]


def test_embedding_near_dups_matches_sql_oracle(ray_session, tmp_path):
    """The _embdup_sql oracle replicates the whole adaptive
    hyperplane-LSH algorithm; the sf tables hold no 0.95-cosine pairs,
    so the NON-EMPTY case is proven here: planted near-dup pairs plus a
    40-member exact-duplicate cluster must produce the identical pair
    set and bit-identical 4dp cosines from engine and DuckDB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from ck_ray.ops.dedup import embedding_near_dups

    rng = np.random.RandomState(7)
    emb = rng.randn(600, 64).astype(np.float32)
    for i in range(0, 80, 2):  # 40 planted near-dup pairs
        emb[i + 1] = emb[i] + rng.randn(64).astype(np.float32) * 0.02
    emb[100:140] = emb[100]  # exact-dup cluster (identical-sig leaf)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(600, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1)), 64
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.zeros(600, np.int32)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")

    eng = embedding_near_dups(str(d))
    assert len(eng) > 800  # pairs + C(40,2) cluster pairs
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    sql = con.execute(entrymod.oracle_sql()["embedding_near_dups"]).fetchdf()
    assert len(eng) == len(sql)
    assert (eng[["vec_a", "vec_b"]].values == sql[["vec_a", "vec_b"]].values).all()
    assert (eng["cosine"].values == sql["cosine"].values).all()


def test_retrieval_quality_harness(ray_session):
    """SWE-bench-style retrieval quality gate (VERDICT r2 missing #7):
    unique-marker queries must hit Recall@1 = 1.0, and identifier
    queries (analyzer splits snake_case, truth = verbatim-containing
    docs by independent scan) must clear a quality floor."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from benchmarks.retrieval_quality import run_quality

    out = run_quality(n_files=2000, k=10, num_parts=4)
    assert out["marker_recall_at_1"] == 1.0
    assert out["ident_mean_recall_at_10"] >= 0.5
    assert out["ident_mrr"] >= 0.7
    assert out["n_ident_queries"] >= 10
    # the phrase leg must beat the bag-of-words leg decisively on the
    # line queries (that's what positions are for)
    assert out["line_phrase_recall_at_10"] >= 0.6
    assert out["line_phrase_recall_at_10"] > out["line_bag_recall_at_10"]
    assert out["n_line_queries"] >= 10


def test_kn_bigram_logprob_matches_hand_model(ray_session, tmp_path):
    """Interpolated Kneser-Ney bigram NLL equals a dict-built reference
    model on a tiny corpus; docs with <2 tokens score (0, 0)."""
    import math

    from ck_ray.ops.text import kn_bigram_logprob
    from ck_ray.tokenizer import tokenize_text

    texts = [
        "a b a b c",
        "b c b c a",
        "a a a",
        "solo",          # 1 token -> 0 bigrams
        "",              # 0 tokens -> 0 bigrams
        "c a b",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "kn"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    # dict-built reference KN model (independent of the Ray kernel)
    from collections import Counter

    cab: Counter = Counter()
    for x in texts:
        tk = tokenize_text(x)
        cab.update(zip(tk, tk[1:]))
    ca: Counter = Counter()
    n1a: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1a[a] += 1
        n1b[b] += 1
    n1 = len(cab)
    D = 0.75

    def lp6(a, b):
        p = (max(cab[(a, b)] - D, 0.0) + D * n1a[a] * (n1b[b] / n1)) / ca[a]
        return math.floor(math.log(p) * 1_000_000)

    got = kn_bigram_logprob(str(d))
    assert got["doc_id"].tolist() == list(range(len(texts)))
    for i, x in enumerate(texts):
        tk = tokenize_text(x)
        pairs = list(zip(tk, tk[1:]))
        assert got["n_bigrams"][i] == len(pairs)
        assert got["nll_e6"][i] == -sum(lp6(a, b) for a, b in pairs)
    # sanity: probabilities are a proper distribution per context
    for a in ca:
        tot = sum(
            (max(cab[(a, b)] - D, 0.0) + D * n1a[a] * (n1b[b] / n1)) / ca[a]
            for b in set(x for _, x in cab)
        )
        assert abs(tot - 1.0) < 1e-9


def test_ann_sq8_recall(ray_session, tmp_path):
    """SQ8's integer code-dot ranking tracks the exact float dot: on a
    synthetic table recall@10 >= 0.8 (iid gaussian dots are tightly
    spaced — the hard case for 8-bit codes), the planted
    near-identical pair always survives quantization at rank 1-2, and
    a zero vector quantizes safely (no div-by-zero, all-zero codes)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.ann import sq8_codes, sq8_topk

    rng = np.random.RandomState(7)
    base = rng.randn(200, 32).astype(np.float32)
    base[50] = base[0] + rng.randn(32).astype(np.float32) * 0.01  # near-dup of 0
    base[199] = 0.0  # zero vector edge
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in base],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    codes, s = sq8_codes(base.astype(np.float64))
    assert codes.dtype == np.int8
    assert np.abs(codes).max() <= 127
    assert (codes[199] == 0).all() and s[199] == 1e-30

    q = base[0].astype(np.float64)
    got = sq8_topk(str(tmp_path), q, k=10)
    assert list(got.columns) == ["vec_id", "dot_int", "score"]
    assert got["score"].is_monotonic_decreasing
    assert set(got["vec_id"].head(2)) == {0, 50}  # near-dup pair on top

    exact = np.argsort(-(base.astype(np.float64) @ q))[:10]
    recall = len(set(got["vec_id"]) & set(exact)) / 10
    assert recall >= 0.8, recall


def test_ann_filtered_topk(ray_session, tmp_path):
    """knn-with-filter: only matching-label vectors are eligible, and
    within the filtered set the ranking equals exact brute force."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.ann import filtered_cosine_topk

    rng = np.random.RandomState(3)
    base = rng.randn(120, 16).astype(np.float32)
    labels = np.arange(120) % 4
    t = pa.table(
        {
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in base], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    q = base[1].astype(np.float64)  # vec 1 has label 1
    got = filtered_cosine_topk(str(tmp_path), q, label=1, k=5)
    assert (np.asarray(got["vec_id"]) % 4 == 1).all()
    assert got["vec_id"].iloc[0] == 1  # the query vector itself
    # exact brute force over the filtered subset agrees
    sel = labels == 1
    u = base[sel].astype(np.float64)
    u /= np.linalg.norm(u, axis=1)[:, None]
    sims = u @ (q / np.linalg.norm(q))
    ids = np.nonzero(sel)[0]
    order = np.lexsort((ids, -sims))[:5]
    assert list(got["vec_id"]) == list(ids[order])
