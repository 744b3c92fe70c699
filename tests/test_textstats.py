"""Repetition stats, tf-idf keyword extraction, sequence packing and
JSON-props extraction: every expectation below is computed by hand from
the planted fixtures."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rep_docs_dir(tmp_path_factory):
    texts = [
        "a a a b c",          # top word 3x, top bigram "a a" 2x, no dup tri
        "x y x y x y",        # bigram "x y" 3x; trigrams repeat (2+2)
        "solo",               # single token edges
        "",                   # empty doc
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
    d = tmp_path_factory.mktemp("repdocs")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_repetition_stats_planted(ray_session, rep_docs_dir):
    from ck_ray.ops.text import repetition_stats

    out = repetition_stats(rep_docs_dir).set_index("doc_id")
    assert out.loc[0].tolist() == [5, 3, 2, 0]
    # doc 1: trigrams = x y x, y x y, x y x, y x y -> both appear twice,
    # so 4 of the 4 trigram positions are duplicated
    assert out.loc[1].tolist() == [6, 3, 3, 4]
    assert out.loc[2].tolist() == [1, 1, 0, 0]
    assert out.loc[3].tolist() == [0, 0, 0, 0]


@pytest.fixture(scope="module")
def tfidf_docs_dir(tmp_path_factory):
    texts = [
        "apple apple banana",
        "banana cherry",
        "cherry cherry cherry date",
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
    d = tmp_path_factory.mktemp("tfidfdocs")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_tfidf_top_terms_planted(ray_session, tfidf_docs_dir):
    from ck_ray.ops.text import tfidf_top_terms

    out = tfidf_top_terms(tfidf_docs_dir, k=3)
    # df: apple 1, banana 2, cherry 2, date 1; N = 3
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    assert by_doc[0]["term"].tolist() == ["apple", "banana"]
    assert by_doc[0]["tf"].tolist() == [2, 1]
    assert by_doc[0]["score"].tolist() == [
        round(2 * math.log(3 / 1), 4),
        round(1 * math.log(3 / 2), 4),
    ]
    # doc 1: banana and cherry tie exactly -> term-asc breaks it
    assert by_doc[1]["term"].tolist() == ["banana", "cherry"]
    assert by_doc[1]["rank"].tolist() == [1, 2]
    # doc 2: 3*ln(1.5) = 1.2164 beats 1*ln(3) = 1.0986
    assert by_doc[2]["term"].tolist() == ["cherry", "date"]


@pytest.fixture(scope="module")
def pack_docs_dir(tmp_path_factory):
    # source a: doc 0 (6 tokens), doc 3 (10), doc 17 (10)
    # source b: doc 5 (12), doc 6 (8), doc 7 (8), doc 9 (8)
    texts = {
        0: "one two three four five six",
        3: "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10",
        17: "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10",
        5: "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12",
        6: "c1 c2 c3 c4 c5 c6 c7 c8",
        7: "d1 d2 d3 d4 d5 d6 d7 d8",
        9: "e1 e2 e3 e4 e5 e6 e7 e8",
    }
    ids = sorted(texts)
    src = {0: "a", 3: "a", 17: "a", 5: "b", 6: "b", 7: "b", 9: "b"}
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array([src[i] for i in ids]),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("packdocs")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_pack_sequences_greedy(ray_session, pack_docs_dir):
    from ck_ray.ops.curation import pack_sequences

    out = pack_sequences(pack_docs_dir, budget=16).set_index("doc_id")
    # source a in doc_id order: 0(6) -> seq0@0; 3(10): 6+10=16 fits ->
    # seq0@6; 17(10): 16+10 > 16 -> seq1@0
    assert out.loc[0, ["seq_id", "seq_offset"]].tolist() == [0, 0]
    assert out.loc[3, ["seq_id", "seq_offset"]].tolist() == [0, 6]
    assert out.loc[17, ["seq_id", "seq_offset"]].tolist() == [1, 0]
    # source b: 5(12) seq0@0; 6(8): 12+8 > 16 -> seq1@0; 7(8): 8+8 = 16
    # fits -> seq1@8; 9(8): 16+8 > 16 -> seq2@0
    assert out.loc[5, ["seq_id", "seq_offset"]].tolist() == [0, 0]
    assert out.loc[6, ["seq_id", "seq_offset"]].tolist() == [1, 0]
    assert out.loc[7, ["seq_id", "seq_offset"]].tolist() == [1, 8]
    assert out.loc[9, ["seq_id", "seq_offset"]].tolist() == [2, 0]
    assert out["n_tokens"].sum() == 62


def test_pack_sequences_overbudget_doc_packs_alone(
    ray_session, pack_docs_dir
):
    from ck_ray.ops.curation import pack_sequences

    out = pack_sequences(pack_docs_dir, budget=10).set_index("doc_id")
    # doc 5 (12 tokens > budget 10) still gets placed, alone, at offset 0
    assert out.loc[5, ["seq_id", "seq_offset"]].tolist() == [0, 0]
    # and the next source-b doc starts a fresh sequence
    assert out.loc[6, ["seq_id", "seq_offset"]].tolist() == [1, 0]


@pytest.fixture(scope="module")
def props_events_dir(tmp_path_factory):
    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "error", "error", "click", "view"]
            ),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
            "props": pa.array(
                [
                    '{"k": 10}',
                    '{"k": 3}',
                    '{"k": 7}',
                    '{"other": 1}',  # no k -> excluded from k-stats
                    '{"k": 100}',
                    '{"other": 2}',  # a whole type with no k anywhere
                ]
            ),
        }
    )
    d = tmp_path_factory.mktemp("propsevents")
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_events_props_stats_planted(ray_session, props_events_dir):
    from ck_ray.pipelines.relational import events_props_stats

    out = events_props_stats(props_events_dir).set_index("event_type")
    assert out.loc["click"].tolist() == [3, 3, 113, 3, 100]
    # the k-less error row counts in n but not in the k aggregates
    assert out.loc["error", "n"] == 2
    assert out.loc["error", "n_k"] == 1
    assert out.loc["error", "sum_k"] == 7
    # a type with NO k anywhere: SQL-NULL stats -> NaN (float column,
    # mirroring DuckDB's BIGINT-with-NULL pandas conversion)
    assert out.loc["view", "n"] == 1
    assert out.loc["view", "n_k"] == 0
    assert np.isnan(out.loc["view", "sum_k"])
    assert np.isnan(out.loc["view", "min_k"])
    assert out["sum_k"].dtype == np.float64


def test_unigram_logprob_planted(ray_session, tmp_path):
    import math

    from ck_ray.ops.text import unigram_logprob

    texts = ["a a b", "b c"]
    t = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = unigram_logprob(str(d)).set_index("doc_id")
    # cf: a=2 b=2 c=1, T=5; per-term lp floored to micro-nats first
    lp = {w: math.floor(math.log(c / 5) * 1_000_000)
          for w, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "nll_e6"] == -(2 * lp["a"] + lp["b"])
    assert out.loc[1, "nll_e6"] == -(lp["b"] + lp["c"])


def test_churned_customers_anti_join(ray_session, tmp_path):
    from ck_ray.pipelines.relational import churned_customers

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([0, 0, 0, 0], pa.int32()),
            "c_acctbal": pa.array([10.0, 20.0, 30.0, 40.0]),
            "c_mktsegment": pa.array(["X"] * 4),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102], pa.int64()),
            "o_custkey": pa.array([1, 2, 1], pa.int64()),
            # cust 1 active after cutoff; cust 2 only before; 3/4 never
            "o_orderdate": pa.array(
                np.array(
                    ["2000-05-01", "1999-01-01", "2001-01-01"],
                    dtype="datetime64[us]",
                )
            ),
            "o_totalprice": pa.array([1.0, 2.0, 3.0]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(cust, str(d / "customer.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))

    out = churned_customers(str(d), cutoff="2000-01-01")
    assert out["c_custkey"].tolist() == [2, 3, 4]
    assert out["c_acctbal"].tolist() == [20.0, 30.0, 40.0]


def test_bigram_pmi_planted(ray_session, tmp_path):
    from ck_ray.ops.text import bigram_pmi

    texts = ["new york new york", "new york city"]
    t = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["s"] * 2),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = bigram_pmi(str(d)).set_index("bigram")
    # T = 7 tokens, B = 5 bigram positions; cf(new)=3, cf(york)=3, cf(city)=1
    assert out.loc["new york", "cf"] == 3
    want = math.floor(
        math.log((3 / 5) / ((3 / 7) * (3 / 7))) * 1_000_000
    )
    assert out.loc["new york", "pmi_e6"] == want
    # "york city": cf 1 -> ln((1/5)/((3/7)*(1/7)))
    want2 = math.floor(
        math.log((1 / 5) / ((3 / 7) * (1 / 7))) * 1_000_000
    )
    assert out.loc["york city", "pmi_e6"] == want2
    assert len(out) == 3  # new york, york new, york city


def _docs_table(texts, langs):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )


def test_approx_distinct_terms_error_bound(ray_session, tmp_path):
    """HLL estimate within the m=4096 sketch's error envelope (sigma
    ~1.6%; assert 5%) against the exact distinct count, per lang and
    for the merged '*' row."""
    from ck_ray.ops.text import approx_distinct_terms

    rng = np.random.RandomState(7)
    texts, langs = [], []
    vocab_en = [f"en{i}" for i in range(3000)]
    vocab_de = [f"de{i}" for i in range(800)]
    for _ in range(200):
        texts.append(" ".join(rng.choice(vocab_en, 60)))
        langs.append("en")
    for _ in range(100):
        texts.append(" ".join(rng.choice(vocab_de, 40)))
        langs.append("de")
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(_docs_table(texts, langs), str(d / "documents.parquet"))

    out = approx_distinct_terms(str(d)).set_index("lang")
    exact = {
        "en": len({w for t, l in zip(texts, langs) if l == "en"
                   for w in t.split()}),
        "de": len({w for t, l in zip(texts, langs) if l == "de"
                   for w in t.split()}),
    }
    exact["*"] = len({w for t in texts for w in t.split()})
    for lang, ex in exact.items():
        est = out.loc[lang, "approx_distinct_e6"] / 1e6
        assert abs(est - ex) / ex < 0.05, (lang, est, ex)
    # merged sketch can never set fewer registers than any single lang
    assert out.loc["*", "registers_set"] >= out["registers_set"].drop("*").max()


def test_approx_distinct_terms_batch_invariance(ray_session, tmp_path):
    """Register merging is associative: the sketch is identical no
    matter how rows are split into batches/blocks."""
    from ck_ray.ops.text import approx_distinct_terms

    texts = [f"tok{i} tok{i+1} shared" for i in range(50)]
    d1 = tmp_path / "one"
    d1.mkdir()
    pq.write_table(_docs_table(texts, ["en"] * 50),
                   str(d1 / "documents.parquet"))
    d2 = tmp_path / "many"
    d2.mkdir()
    pq.write_table(_docs_table(texts, ["en"] * 50),
                   str(d2 / "documents.parquet"), row_group_size=10)
    a = approx_distinct_terms(str(d1))
    b = approx_distinct_terms(str(d2))
    assert a.equals(b)


def test_approx_distinct_terms_empty(ray_session, tmp_path):
    from ck_ray.ops.text import approx_distinct_terms

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(_docs_table([], []), str(d / "documents.parquet"))
    out = approx_distinct_terms(str(d))
    assert out.empty


def test_cms_term_counts_guarantee(ray_session, tmp_path):
    """CMS never underestimates; with a vocabulary far below the cell
    count and d=4 rows, collisions vanish and estimates are exact."""
    from ck_ray.ops.text import cms_term_counts

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(_docs_table(texts, ["en"] * 40),
                   str(d / "documents.parquet"))

    out = cms_term_counts(str(d), top_n=10)
    assert len(out) == 10
    assert (out["cms_cf"] >= out["cf"]).all()  # one-sided error
    assert (out["cms_cf"] == out["cf"]).all()  # tiny vocab: no collisions
    # exact ground truth
    from collections import Counter

    c = Counter(w for t in texts for w in t.split())
    for term, cf in zip(out["term"], out["cf"]):
        assert c[term] == cf


def test_cms_term_counts_empty(ray_session, tmp_path):
    from ck_ray.ops.text import cms_term_counts

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(_docs_table([], []), str(d / "documents.parquet"))
    assert cms_term_counts(str(d)).empty


def test_repetition_metrics_planted(ray_session, rep_docs_dir):
    from ck_ray.ops.text import repetition_metrics

    out = repetition_metrics(rep_docs_dir).set_index("doc_id")
    # doc 0 ("a a a b c", 5 tokens -> one rendered line) is doc_id%5==0,
    # so the plant re-appends the first line: 2 identical lines
    r0 = out.loc[0]
    assert [r0.n_lines, r0.n_distinct_lines, r0.dup_line_chars] == [2, 1, 9]
    assert (r0.top2_gram, r0.top2_count, r0.top2_chars) == ("a a", 2, 4)
    # trigram tie (all count 1) -> lexicographically smallest wins
    assert (r0.top3_gram, r0.top3_count, r0.top3_chars) == ("a a a", 1, 3)
    # doc 1 "x y x y x y": no plant; "x y" 3x; trigram tie at 2 -> "x y x"
    r1 = out.loc[1]
    assert [r1.n_lines, r1.n_distinct_lines, r1.dup_line_chars] == [1, 1, 0]
    assert (r1.top2_gram, r1.top2_count, r1.top2_chars) == ("x y", 3, 6)
    assert (r1.top3_gram, r1.top3_count, r1.top3_chars) == ("x y x", 2, 6)
    # doc 2 single token / doc 3 empty: gram slots empty, one line each
    for d in (2, 3):
        r = out.loc[d]
        assert [r.n_lines, r.n_distinct_lines, r.dup_line_chars] == [1, 1, 0]
        assert (r.top2_gram, r.top2_count, r.top2_chars) == ("", 0, 0)
        assert (r.top3_gram, r.top3_count, r.top3_chars) == ("", 0, 0)


def test_gopher_filter_rules(ray_session, tmp_path):
    """Each Gopher rule flips on its crafted boundary doc; keep is the
    conjunction. Integer cross-multiplied thresholds, so flags are exact."""
    from ck_ray.ops.text import gopher_filter

    filler = [f"a{i:03d}" for i in range(48)]  # distinct 4-char tokens
    texts = {
        # 50 tokens, 2 stopwords, mean len in [3,10], no repetition
        1: "the of " + " ".join(filler),
        # 49 tokens -> r_word_count = 0, everything else passes
        2: "the of " + " ".join(filler[:47]),
        # 50 tokens, ZERO stopwords -> r_stopwords = 0
        3: " ".join(f"b{i:03d}" for i in range(50)),
        # dominant repeated bigram -> top-2-gram coverage > 20%
        4: "the of " + "abcd efgh " * 24 + "tail",
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
        }
    )
    d = tmp_path / "gopher"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    df = gopher_filter(str(d)).set_index("doc_id")

    assert df.loc[1, ["r_word_count", "r_mean_word_len", "r_stopwords",
                      "r_dup_line", "r_top2", "keep"]].tolist() == [1] * 6
    assert df.loc[2, "n_tokens"] == 49
    assert df.loc[2, "r_word_count"] == 0 and df.loc[2, "keep"] == 0
    assert (df.loc[2, ["r_mean_word_len", "r_stopwords", "r_dup_line",
                       "r_top2"]] == 1).all()
    assert df.loc[3, "r_stopwords"] == 0 and df.loc[3, "keep"] == 0
    assert df.loc[3, "r_word_count"] == 1
    assert df.loc[4, "r_top2"] == 0 and df.loc[4, "keep"] == 0


def test_ccnet_buckets_terciles(ray_session, tmp_path):
    """Per-lang tercile sizes follow the integer rule (n=4 -> 1/1/2);
    the doc made of the most common tokens ranks head; rank ties on
    nll_q break by doc_id ascending."""
    from ck_ray.ops.text import ccnet_buckets

    texts = {
        # lang x: doc 1 all-common -> lowest mean surprisal -> head
        1: ("x", "aa aa aa aa aa aa"),
        2: ("x", "aa aa rare1 rare2"),
        3: ("x", "rare3 rare4 aa aa"),
        4: ("x", "rare5 rare6 rare7 rare8"),
        # lang y: 2 identical docs -> identical nll_q, doc_id tie-break
        5: ("y", "aa bb cc"),
        6: ("y", "aa bb cc"),
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i][1] for i in ids]),
            "lang": pa.array([texts[i][0] for i in ids]),
        }
    )
    d = tmp_path / "ccnet"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    df = ccnet_buckets(str(d)).set_index("doc_id")

    assert df.loc[1, "bucket"] == "head" and df.loc[1, "rank_in_lang"] == 1
    assert df.loc[4, "bucket"] == "tail"
    x = df[df["lang"] == "x"]["bucket"].value_counts().to_dict()
    assert x == {"tail": 2, "head": 1, "middle": 1}
    # docs 2 and 3 have the same token multiset -> same nll_q; the
    # earlier doc_id takes the lower rank
    assert df.loc[2, "nll_q"] == df.loc[3, "nll_q"]
    assert df.loc[2, "rank_in_lang"] < df.loc[3, "rank_in_lang"]
    # lang y: n=2 -> 3*1 > 2 so no head; rank1 is middle (3*1 <= 4)
    assert df.loc[5, "rank_in_lang"] == 1 and df.loc[5, "bucket"] == "middle"
    assert df.loc[6, "bucket"] == "tail"


def test_kn_trigram_properties(ray_session, tmp_path):
    """Order-3 KN invariants: probabilities are proper per context
    (sum over c of exp(lp) approx 1 for contexts fully inside the
    table), short docs score 0 trigrams, and a repetitive doc gets a
    LOWER per-trigram nll than a one-off one."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.text import kn_trigram_logprob

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "zeta eta theta iota kappa",     # one-off sequence
        "tiny doc",                      # <3 tokens -> no trigrams
        "",
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
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = kn_trigram_logprob(str(tmp_path))
    assert list(got.columns) == ["doc_id", "n_trigrams", "nll_e6"]
    by = got.set_index("doc_id")
    assert by.loc[4, "n_trigrams"] == 0 and by.loc[4, "nll_e6"] == 0
    assert by.loc[5, "n_trigrams"] == 0
    assert by.loc[0, "n_trigrams"] == 7
    # the 3x-repeated doc is far more probable per trigram than the
    # one-off doc under the self-trained model
    rep = by.loc[0, "nll_e6"] / by.loc[0, "n_trigrams"]
    oneoff = by.loc[3, "nll_e6"] / by.loc[3, "n_trigrams"]
    assert rep < oneoff
    assert (got["nll_e6"] >= 0).all()
