"""Curation operators: decontamination flags exactly the overlapping
docs, dup-span stats ignore internal repetition, sampling/quota are
deterministic md5 tests reproducible by hand."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ck_ray.ids import md5_u64


@pytest.fixture(scope="module")
def curation_docs_dir(tmp_path_factory):
    """doc 17 is an eval doc (17 % 17 == 0 ... doc 0 too); doc 3 copies a
    5-gram run from doc 17; doc 5 repeats ITS OWN 5-gram twice but shares
    nothing across docs; docs 6/7 are identical."""
    texts = {
        0: "zero eval holdout benchmark row one",
        17: "the quick brown fox jumps over the lazy dog tonight",
        3: "prefix words then the quick brown fox jumps over something",
        5: "aa bb cc dd ee ff aa bb cc dd ee ff",
        6: "identical twin document body with enough tokens here",
        7: "identical twin document body with enough tokens here",
        9: "completely unrelated text nothing shared at all everywhere",
    }
    ids = sorted(texts)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids]),
            # aligned with sorted ids [0, 3, 5, 6, 7, 9, 17]
            "lang": pa.array(["en", "de", "en", "en", "en", "fr", "de"]),
            "source": pa.array(["a", "a", "a", "b", "b", "b", "a"]),
            "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("curation")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_decontaminate_flags_overlap_only(ray_session, curation_docs_dir):
    from ck_ray.ops.curation import decontaminate

    out = decontaminate(curation_docs_dir, n=5, eval_mod=17)
    assert out["doc_id"].tolist() == [3]
    row = out.iloc[0]
    # doc 3 has 6 distinct 5-grams (10 tokens), 2 of them from doc 17:
    # "the quick brown fox jumps" and "quick brown fox jumps over"
    assert row["n_shingles"] == 6
    assert row["n_overlap"] == 2
    assert row["overlap_frac"] == round(2 / 6, 4)


def test_dup_ngram_spans_cross_doc_only(ray_session, curation_docs_dir):
    from ck_ray.ops.curation import dup_ngram_spans

    out = dup_ngram_spans(curation_docs_dir, n=5).set_index("doc_id")
    # the identical pair: every position duplicated
    assert out.loc[6, "dup_frac"] == 1.0
    assert out.loc[7, "dup_frac"] == 1.0
    assert out.loc[6, "total_ngrams"] == out.loc[6, "dup_ngrams"] == 4
    # internal repetition alone (doc 5) is NOT cross-doc duplication
    assert out.loc[5, "dup_ngrams"] == 0
    assert out.loc[5, "total_ngrams"] == 8
    # doc 3 shares two 5-gram positions with doc 17
    assert out.loc[3, "dup_ngrams"] == 2
    assert out.loc[17, "dup_ngrams"] == 2
    assert out.loc[9, "dup_ngrams"] == 0


def test_stratified_sample_md5_threshold(ray_session, curation_docs_dir):
    from ck_ray.ops.curation import _U64, stratified_sample

    rates = {"en": 1.0, "de": 0.0}
    out = stratified_sample(curation_docs_dir, rates=rates, rate_other=0.5)
    # every en doc kept, every de doc dropped, fr by hash
    assert set(out[out["lang"] == "en"]["doc_id"]) == {0, 5, 6, 7}
    assert (out["lang"] != "de").all()
    fr_kept = set(out[out["lang"] == "fr"]["doc_id"])
    expect_fr = {
        i for i in [9] if md5_u64(str(i)) < int(0.5 * _U64)
    }
    assert fr_kept == expect_fr
    # deterministic across runs
    again = stratified_sample(curation_docs_dir, rates=rates, rate_other=0.5)
    assert out.equals(again)


def test_corpus_clean_composition(ray_session, curation_docs_dir):
    from ck_ray.ops.curation import _U64, corpus_clean

    out = corpus_clean(
        curation_docs_dir,
        rates={"en": 1.0},
        rate_other=0.5,
        quota=12,
    )
    # eval holdout drops 0 and 17; contamination drops 3; the identical
    # pair (6, 7) keeps only keeper 6; sampling: en kept at rate 1.0,
    # de/fr (docs 9) by md5 hash at 0.5
    expect = {5, 6}
    if md5_u64(str(9)) < int(0.5 * _U64):
        expect.add(9)
    assert set(out["doc_id"]) == expect
    assert list(out.columns) == ["doc_id", "lang", "source"]
    # quota ranked among survivors: with quota=1, source b keeps its
    # smallest-md5 survivor, NOT the raw corpus's
    capped = corpus_clean(
        curation_docs_dir, rates={"en": 1.0}, rate_other=0.5, quota=1
    )
    b_surv = [i for i in sorted(expect) if i in (6, 7, 9)]
    want_b = min(b_surv, key=lambda i: (md5_u64(str(i)), i))
    got_b = capped[capped["source"] == "b"]["doc_id"].tolist()
    assert got_b == [want_b]


def test_token_budget_sample_prefix(ray_session, curation_docs_dir):
    import pyarrow.parquet as pq_

    from ck_ray.ops.curation import token_budget_sample

    t = pq_.read_table(curation_docs_dir + "/documents.parquet")
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    order = sorted(docs, key=lambda i: (md5_u64(str(i)), i))
    for budget in (0, 15, 40, 10_000):
        out = token_budget_sample(curation_docs_dir, budget=budget)
        expect, cum = [], 0
        for i in order:
            cum += len(docs[i].split())  # fixture words are plain alnum
            if cum > budget:
                break
            expect.append(i)
        assert sorted(out["doc_id"]) == sorted(expect), budget
        got = dict(zip(out["doc_id"], out["n_tokens"]))
        assert all(got[i] == len(docs[i].split()) for i in expect)


def test_curation_ops_on_actor_exchange(
    ray_session, curation_docs_dir, monkeypatch
):
    """The new exchange-riding ops must be transport-agnostic: identical
    results over the shared-nothing ActorExchange (multi-node path) as
    over fs run files."""
    from ck_ray.ops.curation import dup_ngram_spans, source_quota_cap
    from ck_ray.ops.dedup import ngram_jaccard_pairs

    fs_spans = dup_ngram_spans(curation_docs_dir)
    fs_quota = source_quota_cap(curation_docs_dir, quota=2)
    fs_pairs = ngram_jaccard_pairs(curation_docs_dir, prefix_filter=True)
    monkeypatch.setenv("CK_EXCHANGE_BACKEND", "actor")
    assert dup_ngram_spans(curation_docs_dir).equals(fs_spans)
    assert source_quota_cap(curation_docs_dir, quota=2).equals(fs_quota)
    assert ngram_jaccard_pairs(
        curation_docs_dir, prefix_filter=True
    ).equals(fs_pairs)


def test_corpus_clean_write_partitioned(ray_session, curation_docs_dir, tmp_path):
    import pyarrow.dataset as pads

    from ck_ray.ops.curation import corpus_clean, corpus_clean_write

    out = str(tmp_path / "cleaned")
    info = corpus_clean_write(
        curation_docs_dir, out, rates={"en": 1.0}, rate_other=0.5
    )
    kept = corpus_clean(
        curation_docs_dir, rates={"en": 1.0}, rate_other=0.5
    )
    assert info["n_kept"] == len(kept)
    assert all(p.startswith("source=") for p in info["partitions"])
    back = pads.dataset(out, partitioning="hive").to_table()
    assert sorted(back["doc_id"].to_pylist()) == sorted(kept["doc_id"])
    assert "text" in back.column_names  # full rows, not just ids
    # rerun replaces, never appends duplicates
    info2 = corpus_clean_write(
        curation_docs_dir, out, rates={"en": 1.0}, rate_other=0.5
    )
    back2 = pads.dataset(out, partitioning="hive").to_table()
    assert back2.num_rows == info2["n_kept"] == info["n_kept"]


def test_source_quota_cap_priority(ray_session, curation_docs_dir):
    from ck_ray.ops.curation import source_quota_cap

    out = source_quota_cap(curation_docs_dir, quota=2)
    by_src = out.groupby("source")["doc_id"].apply(list).to_dict()
    # expected winners: the 2 smallest md5_u64(str(doc_id)) per source
    for src, members in {"a": [0, 3, 5, 17], "b": [6, 7, 9]}.items():
        want = sorted(sorted(members, key=lambda i: (md5_u64(str(i)), i))[:2])
        assert sorted(by_src[src]) == want
    assert out.groupby("source")["rank"].max().le(2).all()
    assert out.groupby("source")["rank"].min().eq(1).all()


def test_dup_span_scrub_rewrites_exactly(ray_session, curation_docs_dir):
    """Hand-walked coverage: docs 17/3 share two 5-grams; 6/7 are fully
    covered; 5's repetition is internal-only (df = 1) so nothing is cut."""
    import hashlib

    from ck_ray.ops.curation import dup_span_scrub

    out = dup_span_scrub(curation_docs_dir, n=5).set_index("doc_id")

    def key_of(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # doc 17: dup windows at pos 1,2 cover tokens 1-6 -> kept 7-10
    assert out.loc[17, "dup_positions"] == 2
    assert out.loc[17, "covered_tokens"] == 6
    assert out.loc[17, "kept_tokens"] == 4
    assert out.loc[17, "scrub_key"] == key_of("the lazy dog tonight")
    # doc 3: dup windows at pos 4,5 cover 4-9 -> kept 1-3 and 10
    assert out.loc[3, "scrub_key"] == key_of("prefix words then something")
    # identical twins 6/7: every token covered -> empty rewrite
    for d in (6, 7):
        assert out.loc[d, "kept_tokens"] == 0
        assert out.loc[d, "scrub_key"] == key_of("")
    # doc 5 repeats its own 5-grams but shares none cross-doc: untouched
    assert out.loc[5, "dup_positions"] == 0
    assert out.loc[5, "kept_tokens"] == out.loc[5, "n_tokens"] == 12
    # unrelated docs unscathed
    assert out.loc[9, "covered_tokens"] == 0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pack_sequences_fuzz_vs_python(ray_session, tmp_path, seed):
    """Random corpora: the exchange kernel must equal a plain sequential
    greedy packer, doc by doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.curation import pack_sequences

    rng = np.random.RandomState(seed)
    n_docs = int(rng.randint(20, 60))
    budget = int(rng.randint(5, 40))
    words = ["w%d" % i for i in range(8)]
    texts = [
        " ".join(rng.choice(words, rng.randint(0, 20))) for _ in range(n_docs)
    ]
    srcs = [str(rng.choice(["a", "b", "c"])) for _ in range(n_docs)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = pack_sequences(str(d), budget=budget).set_index("doc_id")

    # sequential reference. Rule (matches engine AND SQL oracle): a doc
    # overflows when the sequence total including it would exceed the
    # budget, unless it is the sequence's FIRST doc — so a zero-token
    # doc can open a sequence that an over-budget doc then won't share.
    state = {}
    for i in range(n_docs):
        n = len([w for w in texts[i].split() if w])
        sq, off, cnt = state.get(srcs[i], (0, 0, 0))
        if cnt > 0 and off + n > budget:
            sq, off, cnt = sq + 1, 0, 0
        assert out.loc[i, "seq_id"] == sq, (i, seed)
        assert out.loc[i, "seq_offset"] == off, (i, seed)
        assert out.loc[i, "n_tokens"] == n
        state[srcs[i]] = (sq, off + n, cnt + 1)


@pytest.mark.parametrize("seed", [11, 12])
def test_dup_span_scrub_fuzz_vs_python(ray_session, tmp_path, seed):
    """Random small-vocab corpora (lots of colliding n-grams): the
    distributed scrub must equal a brute-force python rewrite."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray.ops.curation import dup_span_scrub

    rng = np.random.RandomState(seed)
    n, k = int(rng.randint(15, 40)), 3
    words = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(words, rng.randint(0, 15))) for _ in range(n)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    out = dup_span_scrub(str(d), n=k).set_index("doc_id")

    toks = [[w for w in s.split() if w] for s in texts]
    df = {}
    for i, tk in enumerate(toks):
        for g in {tuple(tk[j : j + k]) for j in range(len(tk) - k + 1)}:
            df.setdefault(g, set()).add(i)
    for i, tk in enumerate(toks):
        dup_pos = [
            j
            for j in range(max(len(tk) - k + 1, 0))
            if len(df[tuple(tk[j : j + k])]) >= 2
        ]
        covered = set()
        for j in dup_pos:
            covered.update(range(j, j + k))
        kept = [tk[j] for j in range(len(tk)) if j not in covered]
        assert out.loc[i, "n_tokens"] == len(tk)
        assert out.loc[i, "dup_positions"] == len(dup_pos)
        assert out.loc[i, "covered_tokens"] == len(covered)
        assert out.loc[i, "kept_tokens"] == len(kept)
        want = int(
            hashlib.md5(" ".join(kept).encode()).hexdigest()[:15], 16
        )
        assert out.loc[i, "scrub_key"] == want, (i, seed)


@pytest.fixture(scope="module")
def pii_docs_dir(tmp_path_factory):
    """Docs with hand-planted PII inside the text body (on top of the
    operator's own doc_id-derived plant)."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.io and c.d+x@e-f.org now",
                    "dial +44-123-4567 or visit 192.168.0.1 twice 10.0.0.7",
                    "no pii here at all",
                ]
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["a"] * 3),
            "n_chars": pa.array([33, 53, 18], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("pii")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_pii_scrub_counts_and_rewrite(ray_session, pii_docs_dir):
    import hashlib

    from ck_ray.ops.curation import PII_RULES, pii_scrub

    out = pii_scrub(pii_docs_dir)
    assert out["doc_id"].tolist() == [1, 2, 3]
    # every doc gets the planted contact line (1 email/phone/ip) PLUS
    # whatever the body carries
    assert out["n_email"].tolist() == [3, 1, 1]
    assert out["n_phone"].tolist() == [1, 2, 1]
    assert out["n_ip"].tolist() == [1, 3, 1]

    # scrub_key matches a pure-python re2-free reference for doc 3
    import re

    body = "no pii here at all"
    aug = (
        f"{body} Contact user3@example.com call +1-555-0003 "
        "from 10.0.0.3."
    )
    for _, rx, token in PII_RULES:
        aug = re.sub(rx, token, aug)
    assert "user3@example.com" not in aug and "<EMAIL>" in aug
    want = int(hashlib.md5(aug.encode()).hexdigest()[:16], 16) >> 4
    assert int(out["scrub_key"].iloc[2]) == want


def test_unicode_clean_composes_and_strips(ray_session, pii_docs_dir):
    import hashlib
    import unicodedata

    from ck_ray.ops.curation import unicode_clean

    out = unicode_clean(pii_docs_dir)
    assert out["doc_id"].tolist() == [1, 2, 3]
    # exactly one planted BEL per doc
    assert out["n_ctrl"].tolist() == [1, 1, 1]

    # doc 3 reference: NFC composes e+U+0301, BEL stripped, runs
    # collapsed, edges trimmed
    body = "no pii here at all"
    aug = unicodedata.normalize(
        "NFC", f"{body}\x07 café  id 3\t\t end "
    )
    import re

    s = re.sub(r"[\x00-\x08\x0b-\x1f\x7f]", "", aug)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r"^ +| +$", "", s)
    assert "é" in s and "\x07" not in s and "  " not in s
    assert int(out["n_chars_clean"].iloc[2]) == len(s)
    want = int(hashlib.md5(s.encode()).hexdigest()[:16], 16) >> 4
    assert int(out["clean_key"].iloc[2]) == want


def test_line_dedup_scrub_planted(ray_session, tmp_path):
    """Three docs share one exact rendered line (count 3 == min_count ->
    dropped everywhere, incl. a doc left EMPTY); a unique doc is
    untouched; keys are hand-computed md5 prefixes."""
    from ck_ray.ops.curation import line_dedup_scrub

    texts = {
        1: "dup line here",                       # only line -> emptied
        2: "dup line here\nunique tail two",      # pre-wrapped? no: \n ok
        3: "dup line here",
        5: "totally unique single line",
    }
    # NOTE: texts contain no 7+ token runs, so wrap_lines is identity and
    # the embedded \n in doc 2 is already a line break; no doc_id is % 4
    # == 0, so the boilerplate plant stays out of the way.
    ids = sorted(texts)
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array(
                    [len(texts[i]) for i in ids], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = line_dedup_scrub(str(d)).set_index("doc_id")
    assert out.loc[1].tolist()[:3] == [1, 1, 0]
    assert out.loc[2].tolist()[:3] == [2, 1, 1]
    assert out.loc[3].tolist()[:3] == [1, 1, 0]
    assert out.loc[5].tolist()[:3] == [1, 0, 1]
    assert out.loc[1, "scrub_key"] == md5_u64("") >> 4
    assert out.loc[2, "scrub_key"] == md5_u64("unique tail two") >> 4
    assert out.loc[5, "scrub_key"] == (
        md5_u64("totally unique single line") >> 4
    )


def test_dsir_weights_hand_computed(ray_session, curation_docs_dir):
    """dsir_weights equals a from-scratch Python reimplementation
    (md5 buckets, add-1 smoothing, floored micro-nat log-ratios) on the
    tiny fixture; identical twin docs get identical weights."""
    import hashlib
    import math

    from ck_ray.ops.curation import dsir_weights

    B = 64
    df = dsir_weights(curation_docs_dir, n_buckets=B, target_lang="en")

    tbl = pq.read_table(
        curation_docs_dir + "/documents.parquet"
    ).to_pylist()

    def grams(text):
        a = text.split(" ")
        return a + [f"{a[i]} {a[i + 1]}" for i in range(len(a) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % B

    tgt = [0] * B
    raw = [0] * B
    for r in tbl:
        for g in grams(r["text"]):
            b = bucket(g)
            raw[b] += 1
            if r["lang"] == "en":
                tgt[b] += 1
    t_den = sum(tgt) + B
    r_den = sum(raw) + B
    lam = [
        math.floor(
            (math.log((tgt[b] + 1) / t_den) - math.log((raw[b] + 1) / r_den))
            * 1e6
        )
        for b in range(B)
    ]
    exp = {
        r["doc_id"]: (
            len(grams(r["text"])),
            sum(lam[bucket(g)] for g in grams(r["text"])),
        )
        for r in tbl
    }
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.dsir_e6))
        for r in df.itertuples()
    }
    assert got == exp
    # identical twin docs (6 and 7, both target-lang) weigh the same
    assert got[6] == got[7]
