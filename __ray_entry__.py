"""Driver contract for the ck_ray Ray-Data engine.

``entry()``    flagship: BM25 index build + top-k query over sf0.001 docs.
``queries()``  one callable per implemented operator/pipeline (SURVEY.md §2
               + the training-data operator set); each takes ``sf_dir``.
``oracle_sql()`` matching DuckDB SQL per query where SQL-expressible
               (tokenizer-dependent queries inline the same analyzer as a
               regex split; BM25 is scored in-SQL with the same formula).

No ray.init()/shutdown() here — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# --- shared SQL fragments -------------------------------------------------
# tantivy-default analyzer over ASCII text as SQL: split on non-alnum,
# drop empties and >=40-byte tokens, lowercase. (The engine's tokenizer is
# unicode-aware; the driver corpus is ASCII so the two agree there.)
_TOKS = """
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
toks2 AS (
  SELECT doc_id, term FROM toks WHERE term <> '' AND length(term) < 40
)
"""

_BM25_QUERY_TERMS = ("merge", "window", "batch")
_BM25_K = 20
_REGEX_PATTERN = "merge.*window.*batch"
_STOPWORDS_SQL = "('the','a','of','and','to','in','is','it')"

# POSITIONAL tokens (same analyzer, contiguous 1-based position among the
# KEPT tokens per doc) — for order-sensitive oracles (shingles, windows)
_TOKS_POS = """
tokp0 AS (
  SELECT doc_id,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS pos0,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
),
tokp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM tokp0 WHERE term <> '' AND length(term) < 40
)
"""

_U64 = 1 << 64
_FP_PRIME = 1099511628211


def _fp_coeffs(window: int = 8) -> list[int]:
    out, c = [], 1
    for _ in range(window):
        out.append(c)
        c = (c * _FP_PRIME) % _U64
    return out


def _shingle_sql(k: int, thr: float) -> str:
    """Exact token k-gram Jaccard pairs >= thr (string shingles)."""
    joins = "".join(
        f"\n  JOIN tokp t{j} ON t0.doc_id = t{j}.doc_id"
        f" AND t{j}.pos = t0.pos + {j}"
        for j in range(1, k)
    )
    concat = " || chr(1) || ".join(f"t{j}.term" for j in range(k))
    return f"""
WITH {_TOKS_POS},
sh AS (
  SELECT DISTINCT t0.doc_id, {concat} AS s
  FROM tokp t0{joins}
),
sz AS (SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.size + sb.size - i), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE round(i * 1.0 / (sa.size + sb.size - i), 4) >= {thr}
ORDER BY doc_a, doc_b
"""


_LANG_MARKERS_SQL = {
    "de": ("der", "die", "und", "das", "ein"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "y", "de", "que"),
    "fr": ("le", "la", "et", "de", "un"),
    "zh": ("de", "le", "shi"),
}


def _shingle_cte(k: int, distinct: bool) -> str:
    """``sh(doc_id, s)`` CTE of token k-gram string shingles (one row per
    POSITION unless ``distinct``) — assumes ``tokp`` is in scope."""
    joins = "".join(
        f"\n  JOIN tokp t{j} ON t0.doc_id = t{j}.doc_id"
        f" AND t{j}.pos = t0.pos + {j}"
        for j in range(1, k)
    )
    concat = " || chr(1) || ".join(f"t{j}.term" for j in range(k))
    d = "DISTINCT " if distinct else ""
    return f"""
sh AS (
  SELECT {d}t0.doc_id, {concat} AS s
  FROM tokp t0{joins}
)
"""


_MD5_DOCKEY = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT"
)


def _minhash_sql(
    n_perm: int = 64, bands: int = 16, k: int = 5, thr: float = 0.6
) -> str:
    """EXACT SQL replication of ``dedup.minhash_lsh_pairs`` — same
    algorithm, not a recall bound: FNV-1a token hashes (recursive CTE,
    seed = (offset ^ field 0) * prime mod 2^64, matching
    ``ids.term_hash``), the k-gram rolling shingle hash, the 64
    universal-hash permutation minima ((s*a + b) mod 2^64 mod 2^61-1;
    (a, b) drawn from the engine's seeded RandomState and inlined as
    VALUES), the per-band FNV fold mod 2^63, candidate pairs sharing a
    (band, band_hash) bucket, and the exact string-shingle Jaccard
    verify — so the oracle reproduces the ENGINE's pair set bit-for-bit,
    LSH misses included. All arithmetic is integer in HUGEINT (every
    intermediate < 2^125). Assumes every doc has >= k tokens (true of
    the test tables; shingle-less docs would carry the engine's
    uint64-max sentinel signature)."""
    from ck_ray.ops.dedup import _perm_params

    a, b = _perm_params(n_perm)  # the ENGINE's params — no drift
    perms = ",".join(
        f"({i},{int(a[i])},{int(b[i])})" for i in range(n_perm)
    )
    rpb = n_perm // bands
    seed_h = (14695981039346656037 ^ 0) * _FP_PRIME % _U64
    expr = "t0.h::HUGEINT"
    for j in range(1, k):
        expr = f"((({expr}) * {_FP_PRIME} + t{j}.h) % {_U64}::HUGEINT)"
    joins = "".join(
        f"\n  JOIN tokh t{j} ON t0.doc_id = t{j}.doc_id"
        f" AND t{j}.pos = t0.pos + {j}"
        for j in range(1, k)
    )
    bexpr = "sl[1]::HUGEINT"
    for j in range(2, rpb + 1):
        bexpr = f"((({bexpr}) * {_FP_PRIME} + sl[{j}]) % {_U64}::HUGEINT)"
    return f"""
WITH RECURSIVE
{_TOKS_POS.strip()},
vocab AS (SELECT DISTINCT term FROM tokp),
fnv AS (
  SELECT term, to_hex(encode(term)) AS hx, octet_length(encode(term)) AS nb,
         0 AS i, CAST({seed_h} AS UBIGINT) AS h
  FROM vocab
  UNION ALL
  SELECT term, hx, nb, i + 1,
         CAST((xor(h, ('0x' || substr(hx, 2*i+1, 2))::UBIGINT)::HUGEINT
               * {_FP_PRIME}) % {_U64}::HUGEINT AS UBIGINT)
  FROM fnv WHERE i < nb
),
th AS (SELECT term, h FROM fnv WHERE i = nb),
tokh AS (SELECT t.doc_id, t.pos, f.h FROM tokp t JOIN th f USING (term)),
shh AS (
  SELECT DISTINCT t0.doc_id, CAST({expr} AS UBIGINT) AS s
  FROM tokh t0{joins}
),
perms(perm, a, b) AS (VALUES {perms}),
sig AS (
  SELECT doc_id, perm,
         min((((s::HUGEINT * a) % {_U64}::HUGEINT + b) % {_U64}::HUGEINT)
             % {(1 << 61) - 1}::HUGEINT) AS sg
  FROM shh, perms GROUP BY 1, 2
),
bl AS (
  SELECT doc_id, perm // {rpb} AS band, list(sg ORDER BY perm) AS sl
  FROM sig GROUP BY doc_id, perm // {rpb}
),
bh AS (
  SELECT doc_id, band,
         CAST(({bexpr}) % {1 << 63}::HUGEINT AS BIGINT) AS band_hash
  FROM bl
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bh x JOIN bh y
    ON x.band = y.band AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
),
{_shingle_cte(k, distinct=True).strip()},
sz AS (SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.size + sb.size - i), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE round(i * 1.0 / (sa.size + sb.size - i), 4) >= {thr}
ORDER BY doc_a, doc_b
"""


def _embdup_sql(
    threshold: float = 0.95, cap: int = 256, seed: int = 42,
    num_parts: int = 16, dim: int = 64, n_planes: int = 64, step: int = 4,
) -> str:
    """EXACT SQL replication of ``dedup.embedding_near_dups`` — the whole
    adaptive random-hyperplane LSH algorithm, not just its intent: the
    64 seeded Gaussian hyperplanes are inlined as literals (dim x 64,
    drawn from the engine's RandomState), sign signatures come from
    double-precision projections, partition assignment replicates
    ``exchange.int_key_hash`` (splitmix mix in HUGEINT via 32-bit-split
    multiplication) mod num_parts, and the adaptive prefix splitting
    (population cap, +4 bits per level, identical-signature leaves stop)
    is unrolled as 17 MATERIALIZED CTE levels — enough for any base
    depth (>= 2 bits) to reach 64 bits. Pair cosines are sums of IEEE
    double products over the float32-cast unit vectors, matching the
    engine's float64 leaf matmul; both sides round half-away at 4dp.
    Residual float caveat (shared by every float oracle in this file):
    BLAS blocked accumulation vs SQL sequential summation can differ by
    ~1 ulp, so a projection within ~1e-15 of zero could in principle
    flip a signature bit — never observed on the test tables or the
    planted-pair suite. ``dim`` is fixed at the test tables' embedding
    width (the planes are part of the algorithm's seed contract)."""
    from ck_ray.ops.dedup import _hyperplanes

    planes = _hyperplanes(dim, seed, n_planes)  # the ENGINE's planes
    # float() before repr: np.float64.__repr__ is 'np.float64(...)'
    # under numpy >= 2.0, which would be invalid SQL
    pv = ",".join(
        f"({d + 1},{c},{float(planes[d, c])!r})"
        for d in range(dim) for c in range(n_planes)
    )
    pw = ",".join(f"({c},{1 << c})" for c in range(n_planes))
    maxk = 16
    lvl = []
    prev = "v0"
    for k in range(maxk + 1):
        bits = f"least(64, (SELECT bits0 FROM par) + {step * k})"
        pref = "0::UBIGINT" if k == 0 else f"sg >> (64 - ({bits}))"
        tpref = "0::UBIGINT" if k == 0 else f"t.sg >> (64 - ({bits}))"
        cond = f"(c <= {cap} OR mn = mx" + (
            f" OR ({bits}) >= 64)" if k > 0 else ")"
        )
        lvl.append(f"""
g{k} AS MATERIALIZED (
  SELECT part, {pref} AS pk, count(*) AS c, min(sg) AS mn, max(sg) AS mx
  FROM {prev} GROUP BY 1, 2),
j{k} AS MATERIALIZED (
  SELECT t.*, g{k}.c, g{k}.mn, g{k}.mx
  FROM {prev} t JOIN g{k}
    ON g{k}.part = t.part AND g{k}.pk = {tpref}),
s{k} AS MATERIALIZED (
  SELECT vec_id, part::VARCHAR || '/' || {k} || '/' ||
         ({pref})::VARCHAR AS leaf
  FROM j{k} WHERE {cond}),
u{k + 1} AS MATERIALIZED (
  SELECT vec_id, sg, part FROM j{k} WHERE NOT {cond})""")
        prev = f"u{k + 1}"
    leaves = " UNION ALL ".join(
        f"SELECT * FROM s{k}" for k in range(maxk + 1)
    )
    return f"""
WITH
e AS MATERIALIZED (
  SELECT vec_id, unnest(embedding) AS ev,
         generate_subscripts(embedding, 1) AS d
  FROM embeddings),
planes(d, c, v) AS (VALUES {pv}),
pw(c, w) AS (VALUES {pw}),
proj AS MATERIALIZED (
  SELECT e.vec_id, p.c, sum(e.ev::DOUBLE * p.v) AS s
  FROM e JOIN planes p USING (d) GROUP BY 1, 2),
sig AS MATERIALIZED (
  SELECT vec_id,
         CAST(COALESCE(sum(CASE WHEN pr.s > 0 THEN pw.w ELSE 0 END), 0)
              AS UBIGINT) AS sg
  FROM proj pr JOIN pw USING (c) GROUP BY 1),
par AS (SELECT least(greatest(CAST(ceil(log2(greatest(
              (SELECT count(*) FROM sig), 2) / {cap}.0)) AS INT) + 2, 2), 16)
          AS bits0),
v0 AS MATERIALIZED (
  SELECT vec_id, sg,
         CAST(xor(x3, x3 >> 27) % {num_parts} AS BIGINT) AS part
  FROM (
    SELECT vec_id, sg,
           CAST(((xor(x1, x1 >> 31)::HUGEINT * 484763065)
                 + ((((xor(x1, x1 >> 31) % 4294967296)::HUGEINT * 3210233709)
                    % 4294967296) * 4294967296)) % {_U64}
                AS UBIGINT) AS x3
    FROM (
      SELECT vec_id, sg,
             CAST(((sg >> (64 - (SELECT bits0 FROM par)))::HUGEINT
                   * 11400714819323198485) % {_U64} AS UBIGINT) AS x1
      FROM sig))),
{",".join(lvl)},
leaves AS MATERIALIZED ({leaves}),
nr AS MATERIALIZED (
  SELECT vec_id, sqrt(sum(ev::DOUBLE * ev::DOUBLE)) AS nrm
  FROM e GROUP BY 1),
u AS MATERIALIZED (
  SELECT e.vec_id, e.d,
         CAST(CAST(e.ev::DOUBLE / greatest(nr.nrm, 1e-12) AS FLOAT)
              AS DOUBLE) AS uv
  FROM e JOIN nr USING (vec_id)),
cand AS (SELECT a.vec_id AS va, b.vec_id AS vb
         FROM leaves a JOIN leaves b
           ON a.leaf = b.leaf AND a.vec_id < b.vec_id),
cs AS (SELECT c.va, c.vb, sum(ua.uv * ub.uv) AS s
       FROM cand c
       JOIN u ua ON ua.vec_id = c.va
       JOIN u ub ON ub.vec_id = c.vb AND ub.d = ua.d
       GROUP BY 1, 2)
SELECT va AS vec_a, vb AS vec_b, round(s, 4) AS cosine
FROM cs WHERE s >= {threshold} ORDER BY 1, 2
"""


def _token_budget() -> int:
    from ck_ray.ops.curation import DEFAULT_TOKEN_BUDGET

    return DEFAULT_TOKEN_BUDGET


# RE2 class of C0 control chars (minus \t \n) + DEL — shared verbatim by
# ck_ray.ops.curation._CTRL_RE and the unicode_clean oracle
_CTRL_SQL = r"[\x00-\x08\x0b-\x1f\x7f]"


def _pii_re(name: str) -> str:
    """The engine's own PII pattern, so oracle and kernel can never
    drift (both sides are RE2)."""
    from ck_ray.ops.curation import PII_RULES

    return next(rx for n, rx, _ in PII_RULES if n == name)


def _stratified_pred_sql() -> str:
    """Boolean SQL predicate over (doc_id, lang) applying the same
    exact-integer md5 thresholds the Ray operator uses."""
    from ck_ray.ops.curation import (
        DEFAULT_RATE_OTHER,
        DEFAULT_RATES,
        _thresholds,
    )

    th = _thresholds(DEFAULT_RATES, DEFAULT_RATE_OTHER)

    def pred(v: int) -> str:  # rate 1.0 -> 2^64 -> unconditionally kept
        return "TRUE" if v >= 1 << 64 else f"({_MD5_DOCKEY} < {v}::UBIGINT)"

    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {pred(v)}"
        for lang, v in th.items()
        if lang != "__other__"
    )
    return f"CASE {cases} ELSE {pred(th['__other__'])} END"


def _stratified_sample_sql() -> str:
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE {_stratified_pred_sql()}
ORDER BY doc_id
"""


def _simhash_fp_sql() -> str:
    """fp = 63-bit simhash per doc from md5-u64 token hashes (tf-weighted
    bit votes), matching ck_ray.ops.dedup.SimHasher bit-for-bit."""
    bit_terms = "\n       + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b}::UBIGINT ELSE 0::UBIGINT END)"
        for b in range(63)
    )
    return f"""
th AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM toks2
),
fp0 AS (
  SELECT doc_id, {bit_terms} AS fp
  FROM th GROUP BY doc_id
),
fp AS (
  SELECT d.doc_id, coalesce(f.fp, 0::UBIGINT) AS fp
  FROM documents d LEFT JOIN fp0 f USING (doc_id)
)
"""


def entry() -> Any:
    from ck_ray.pipelines.docsearch import bm25_topk

    return bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ck_ray.ops import ann, curation, dedup, percolate, text
    from ck_ray.pipelines import docsearch, relational

    def dir_walk_corpus(sf_dir: str):
        """The filesystem SOURCE, oracle-gated end-to-end: materialize
        documents as a real source tree (one file per doc under
        ``{source}/doc_{id}.txt``, plus a root .gitignore excluding ids
        ending in 7), read it back with the gitignore-aware directory
        source (reference collect_files, ck-index/src/lib.rs:211-262 —
        walk, ignore rules, binary sniff, parallel content reads), and
        fingerprint what survived. The oracle recomputes the same
        (survivors, lengths, md5) from the documents table directly."""
        import hashlib
        import os

        import pandas as pd
        import pyarrow as pa
        import ray.data

        from ck_ray.sources import read_code_dir

        docs = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "text"],
        ).to_pandas()
        tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
        root = f"/tmp/ck_ray_dirsrc_{tag}_{len(docs)}"
        done = os.path.join(root, ".done")
        if not os.path.exists(done):
            for src, grp in docs.groupby("source"):
                d = os.path.join(root, str(src))
                os.makedirs(d, exist_ok=True)
                for did, txt in zip(grp["doc_id"], grp["text"]):
                    with open(
                        os.path.join(d, f"doc_{did}.txt"), "w",
                        encoding="utf-8",
                    ) as f:
                        f.write(txt)
            with open(os.path.join(root, ".gitignore"), "w") as f:
                f.write("doc_*7.txt\n")
            with open(done, "w") as f:
                f.write("ok\n")
        t = pa.Table.from_pandas(read_code_dir(root).to_pandas())
        contents = t["content"].to_pylist()
        out = pd.DataFrame(
            {
                "doc_id": [
                    int(p.rsplit("doc_", 1)[1][:-4])
                    for p in t["path"].to_pylist()
                ],
                "n_chars": [len(c) for c in contents],
                "content_md5": [
                    hashlib.md5(c.encode("utf-8")).hexdigest()[:16]
                    for c in contents
                ],
            }
        )
        return (
            out.sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"doc_id": "int64", "n_chars": "int64"})
        )

    def semantic_topk(sf_dir: str):
        """documents -> line-window chunks -> actor-pool pseudo-embed ->
        brute-force cosine top-k (the reference's semantic mode shape)."""
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data

        from ck_ray.semantic import build_chunk_embeddings, semantic_search

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

        emb = build_chunk_embeddings(
            ds.map_batches(to_corpus, batch_format="pyarrow"), concurrency=2
        )
        out = semantic_search(emb, "merge window batch stream", top_k=20)
        # path carries the ORIGINAL documents.doc_id (to_corpus packs it
        # there), so the oracle can address rows without re-deriving the
        # content hash id; membership is decided on unrounded scores,
        # the published order on rounded ones (same contract as bm25)
        out["doc_id"] = out["path"].astype("int64")
        out["chunk_id"] = out["chunk_id"].astype("int64")
        out["score"] = out["score"].astype("float64").round(4)
        out = out.sort_values(
            ["score", "doc_id", "chunk_id"], ascending=[False, True, True]
        ).reset_index(drop=True)
        return out[["doc_id", "chunk_id", "score"]]

    def hybrid_semantic_rrf(sf_dir: str):
        """Lexical + vector HYBRID retrieval (the modern RAG shape):
        Reciprocal Rank Fusion of the BM25 doc ranking (top-100, same
        query text) and the semantic chunk ranking collapsed to docs
        (rank of each doc's first chunk). Both legs are the
        already-oracled pipelines; fusion = sum 1/(60+rank), rounded
        6dp, (rrf desc, doc_id asc) top-20."""
        import pandas as pd

        from ck_ray.pipelines import docsearch
        from ck_ray.scoring import round_half_away

        lex = docsearch.bm25_topk(
            sf_dir, "merge window batch stream", k=100
        )
        sem = semantic_topk(sf_dir)  # (doc_id, chunk_id, score) sorted
        sem_docs = list(dict.fromkeys(sem["doc_id"].tolist()))
        return docsearch.rrf_fuse(
            [lex["doc_id"].tolist(), sem_docs], k=20
        )

    def multimodal(sf_dir: str):
        from ck_ray.ops.multimodal import multimodal_features

        return multimodal_features(sf_dir)

    def image_resize(sf_dir: str):
        """Actor-pool nearest-neighbor RESIZE over binary payloads: the
        raster view is synthetic (no decoders in this container) but the
        sampling arithmetic is the real NN resize; all-integer pixels."""
        from ck_ray.ops.multimodal import image_resize_nn

        return image_resize_nn(sf_dir)

    def frame_sample(sf_dir: str):
        """Actor-pool stride FRAME-SAMPLING (the video shape): payload ->
        fixed-length frames -> keep every 4th; one row per sampled frame
        with its md5 (flat-map stage)."""
        from ck_ray.ops.multimodal import video_frame_sample

        return video_frame_sample(sf_dir)

    def code_index_stats(sf_dir: str):
        """Full SPIMI build over the documents corpus via the real engine
        path, reporting index_stats — exercises tokenize/shuffle/encode/
        manifest inside the driver gate (deterministic)."""
        import pandas as pd

        from ck_ray.build import index_stats
        from ck_ray.pipelines.docsearch import documents_index

        st = index_stats(documents_index(sf_dir))
        st["avgdl_content"] = round(st["avgdl_content"], 6)
        st.pop("segment_bytes")  # byte size depends on parquet writer env
        return pd.DataFrame([st])

    def ann_cosine_topk(sf_dir: str):
        q = ann.query_vector_from(sf_dir, vec_id=0)
        out = ann.cosine_topk(sf_dir, q, k=10)
        return out[["vec_id", "score"]]

    def ann_multi_topk(sf_dir: str):
        """Batched exact ANN: FOUR query vectors ship as ONE broadcast
        matrix (`ray.put` once), every batch answers all queries with a
        single (nq x nb) matmul — the amortized shape real retrieval
        serving uses. query_id = the query's source vec_id (0..3)."""
        import numpy as np

        Q = np.stack(
            [ann.query_vector_from(sf_dir, vec_id=i) for i in range(4)]
        )
        out = ann.cosine_topk(sf_dir, Q, k=10)
        return out[["query_id", "vec_id", "score"]]

    def ann_ivf_topk(sf_dir: str):
        """IVF probe-subset scan with the deterministic hyperplane coarse
        quantizer — cell assignment and probe rule are pure functions of
        the vectors, so the whole pipeline is hash-exact against the SQL
        oracle. The k-means-quantizer variant (ann.ivf_topk) stays
        recall-gated in pytest (test_ops.test_ann_brute_vs_ivf_recall)."""
        q = ann.query_vector_from(sf_dir, vec_id=0)
        out = ann.ivf_hyperplane_topk(sf_dir, q, k=10)
        return out[["vec_id", "score"]]

    def ann_ivf_persisted(sf_dir: str):
        """Same IVF family over the PERSISTED cell layout: vectors are
        written once as cell-partitioned parquet and the query opens only
        its probed cells' files (pruning at the read — the 100 TB step).
        Row-identical to ann_ivf_topk, so the same SQL oracle gates it."""
        import shutil
        import tempfile

        q = ann.query_vector_from(sf_dir, vec_id=0)
        idx = tempfile.mkdtemp(prefix="ck_ivf_")
        try:
            ann.build_ivf_index(sf_dir, idx)
            out = ann.ivf_persisted_topk(idx, q, k=10)
        finally:
            shutil.rmtree(idx, ignore_errors=True)
        return out[["vec_id", "score"]]

    def ann_filtered_topk(sf_dir: str):
        """knn-with-filter: exact cosine top-k restricted to
        label == 3, the metadata predicate pushed into the parquet
        read (row-group pruning) — the filtered-vector-search shape
        every retrieval stack needs."""
        q = ann.query_vector_from(sf_dir, vec_id=0)
        return ann.filtered_cosine_topk(sf_dir, q, label=3, k=10)

    def ann_sq8_topk(sf_dir: str):
        """Symmetric int8 scalar-quantized ANN (SQ8): both sides coded
        as round_half_away(v*127/max|v|), ranked by the exact INTEGER
        code dot — the 4x-memory compression step of a production ANN
        stack, hash-exact against SQL because no float enters the
        ranking. Recall vs the exact baseline is pytest-gated."""
        q = ann.query_vector_from(sf_dir, vec_id=0)
        return ann.sq8_topk(sf_dir, q, k=10)

    def _orders_sorted_ranks(sf_dir: str):
        """Sampled-range global sort of orders by (price cents, orderkey):
        sorted range-partitioned parquet is written and the returned rows
        are the global-rank stride sample that proves the order."""
        from ck_ray.sort import orders_sorted_ranks

        return orders_sorted_ranks(sf_dir)

    base = {
        # --- relational core (map/filter/agg/join/sort/limit/distinct)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q6_revenue": relational.q6_revenue,
        "q3_top_revenue_orders": relational.q3_top_revenue_orders,
        "q5_revenue_by_nation": relational.q5_revenue_by_nation,
        "top_customers": relational.top_customers,
        "orders_by_status": relational.orders_by_status,
        "distinct_flag_status": relational.distinct_flag_status,
        "expensive_items": relational.expensive_items,
        "part_type_stats": relational.part_type_stats,
        "supplier_balance_by_nation": relational.supplier_balance_by_nation,
        "events_hourly": relational.events_hourly,
        "events_sliding": relational.events_sliding,
        "top_orders_per_customer": relational.top_orders_per_customer,
        "user_sessions": relational.user_sessions,
        # --- temporal custom operators (shapes Ray Data lacks natively:
        # as-of join, range join, exact grouped percentiles — each one
        # vectorized kernel per exchange partition)
        "churned_customers": relational.churned_customers,
        "late_ship_priority_counts": relational.late_ship_priority_counts,
        "events_asof_prev_purchase": relational.events_asof_prev_purchase,
        "error_click_window_counts": relational.error_click_window_counts,
        "event_value_quantiles": relational.event_value_quantiles,
        # windowed funnel (ClickHouse windowFunnel): deepest ordered
        # stage chain per user within a time window; exchange-per-user
        # + the span_near greedy-anchor kernel over packed ranks
        "event_funnel": relational.event_funnel,
        # --- distributed global sort (sampled-range TeraSort over the
        # exchange; sorted partitioned parquet + rank-stride order proof)
        "orders_sorted_ranks": _orders_sorted_ranks,
        # --- filesystem source (gitignore walk + sniff, oracle-gated)
        "dir_walk_corpus": dir_walk_corpus,
        # --- tokenizer / index stats over documents
        "term_df_top": text.term_df_top,
        "corpus_stats": text.corpus_stats,
        "token_counts": text.token_counts,
        "quality_metrics": text.quality_metrics,
        "repetition_metrics": text.repetition_metrics,
        "gopher_filter": text.gopher_filter,
        "lang_source_counts": text.lang_source_counts,
        # --- search modes (reference parity)
        "bm25_topk": docsearch.bm25_topk,
        # stored-snippet field: top-k plus the reference's 3-line preview
        # served from the DocShard actors (no corpus access at query time)
        "bm25_snippets": docsearch.bm25_snippets,
        "bm25_boolean": docsearch.bm25_boolean,
        "bm25_prefix": docsearch.bm25_prefix,
        # const-score family (tantivy RangeQuery / TermSetQuery /
        # AllQuery — `[a TO b]`, `IN [a b]`, `*`): membership scores
        # exactly boost*1.0, mixed with BM25 legs in child order
        "bm25_range": docsearch.bm25_range,
        "bm25_termset": docsearch.bm25_termset,
        "bm25_matchall": docsearch.bm25_matchall,
        # fuzzy term query `term~N` (tantivy FuzzyTermQuery): dictionary
        # expansion by bounded edit distance, const-score membership
        "bm25_fuzzy": docsearch.bm25_fuzzy,
        # regex term query `/pat/` (tantivy RegexQuery): anchored
        # dictionary expansion, const-score membership
        "bm25_regexterm": docsearch.bm25_regexterm,
        # wildcard term query `w?nd*w` (Lucene WildcardQuery): rewritten
        # onto the anchored-regex expansion, const-score membership
        "bm25_wildcard": docsearch.bm25_wildcard,
        # explain API (Lucene explain / ES _explain): per-term BM25
        # evidence rows (df/tf/dl/contribution) for the top-1 doc
        "bm25_explain": docsearch.bm25_explain,
        # more-like-this (tantivy MoreLikeThisQuery shape): tf*idf term
        # selection from input text, then a BM25 disjunction
        "bm25_more_like_this": docsearch.bm25_more_like_this,
        # term suggester (ES term suggest / Lucene DirectSpellChecker):
        # spell-correction candidates ranked (distance, df desc)
        "bm25_suggest": docsearch.bm25_suggest,
        # query-time synonyms (Lucene SynonymQuery): blended pseudo-term
        # with summed tf and max-member df, not a boolean OR
        "bm25_synonyms": docsearch.bm25_synonyms,
        # facet counts over the FULL match set (tantivy Count +
        # TermsAggregation collectors), shard-local metadata buckets
        "bm25_facet_counts": docsearch.bm25_facet_counts,
        # significant_terms (ES bucket agg, JLH): which field values are
        # anomalously frequent in the match set vs the whole index
        "bm25_significant_langs": docsearch.bm25_significant_langs,
        # delete-by-query (ES _delete_by_query): tombstone a match set
        # in one epoch, probe that later queries exclude it exactly
        "bm25_delete_by_query": docsearch.bm25_delete_by_query,
        # tantivy's ES-compatible aggregation module over the full
        # match set: numeric fast-field histogram / range / stats,
        # exact distinct-set cardinality, per-bucket top hits
        "bm25_agg_histogram": docsearch.bm25_agg_histogram,
        "bm25_agg_stats": docsearch.bm25_agg_stats,
        # ES filters bucket agg: N named filter queries, one spec,
        # one shard fan-out
        "bm25_filters_agg": docsearch.bm25_filters_agg,
        "bm25_agg_range": docsearch.bm25_agg_range,
        "bm25_agg_percentiles": docsearch.bm25_agg_percentiles,
        # ES multi-agg request: N aggregations over ONE match-set pass
        "bm25_multi_agg": docsearch.bm25_multi_agg,
        # ES sub-aggregation: terms bucket + nested stats per bucket
        "bm25_facet_stats": docsearch.bm25_facet_stats,
        "bm25_cardinality": docsearch.bm25_cardinality,
        "bm25_top_hits_per_lang": docsearch.bm25_top_hits_per_lang,
        # top-k ordered by a numeric fast field instead of the score
        # (tantivy TopDocs::order_by_u64_field) — exact-int comparisons
        "bm25_sort_by_field": docsearch.bm25_sort_by_field,
        # page 2 of the ranked list (tantivy TopDocs::and_offset):
        # engine-native offset, rounded page boundaries for the oracle
        "bm25_paged": docsearch.bm25_paged,
        # cursor deep pagination (ES search_after): every page costs
        # O(shards*k) no matter how deep — the scale-correct
        # alternative to offset paging, verified against it in-entry
        "bm25_search_after": docsearch.bm25_search_after,
        # DisjunctionMax ranking (Lucene/ES dis_max, tantivy
        # DisjunctionMaxQuery): best clause + tie_breaker * the rest
        "bm25_dismax": docsearch.bm25_dismax,
        # ES extended_stats: exact big-int moments -> one-divide
        # variance + IEEE-sqrt std, bit-identical in SQL
        "bm25_agg_extended_stats": docsearch.bm25_agg_extended_stats,
        # boolean OR with minimum_should_match=2 of 3 (Lucene/ES
        # parameter, tantivy with_minimum_required_clauses)
        "bm25_min_should_match": docsearch.bm25_min_should_match,
        # span proximity (Lucene SpanNearQuery / ES span_near): docs
        # where terms co-occur within n+slop positions, ranked by the
        # MINIMAL covering window — positional postings algebra
        "bm25_span_near": docsearch.bm25_span_near,
        # ES composite aggregation: (terms, histogram) bucket keys
        # paginated by after_key; entry walks every page and asserts
        # the union equals the one-shot enumeration
        "bm25_composite_agg": docsearch.bm25_composite_agg,
        # completion suggester (ES completion / search-as-you-type):
        # dictionary prefix expansion ranked by global df
        "bm25_complete": docsearch.bm25_complete,
        # ES adjacency_matrix: singleton + pairwise-intersection doc
        # counts for N named filters, one fan-out
        "bm25_adjacency_matrix": docsearch.bm25_adjacency_matrix,
        # two-phase rescore (ES rescore): OR recall pass, exact-phrase
        # precision pass over the top-40 window, total score_mode
        "bm25_rescore": docsearch.bm25_rescore,
        # boosting query (Lucene/ES `boosting`): demote-don't-exclude —
        # negative matches keep ranking at score * negative_boost
        "bm25_boosting": docsearch.bm25_boosting,
        # function_score + field_value_factor (ES): relevance times a
        # fast-field prior — bm25 * log1p(dl_content)
        "bm25_function_score": docsearch.bm25_function_score,
        "bm25_phrase_prefix": docsearch.bm25_phrase_prefix,
        "bm25_phrase": docsearch.bm25_phrase,
        "bm25_phrase_slop": docsearch.bm25_phrase_slop,
        "code_chunks": docsearch.code_chunks,
        "regex_match_docs": docsearch.regex_match_docs,
        "hybrid_rrf": docsearch.hybrid_rrf,
        # lexical + VECTOR hybrid (RAG retrieval shape): RRF of the
        # bm25 leg and the semantic leg's doc ranking; oracle composes
        # the two legs' own SQL
        "hybrid_semantic_rrf": hybrid_semantic_rrf,
        # retrieval-quality harness: Recall@10 / MRR@10 of the BM25
        # engine vs phrase-containment ground truth (the reference's
        # benchmarks/swe-bench Recall@K shape)
        "retrieval_quality": docsearch.retrieval_quality,
        # --- dedup family
        "exact_dedup": dedup.exact_dedup,
        # oracle-gated bit-for-bit (_minhash_sql replicates the full
        # LSH algorithm — signatures, banding, verify — so recall < 1
        # no longer blocks an exact oracle)
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_pairs": dedup.simhash_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "near_dup_groups": dedup.near_dup_groups,
        # oracle-gated bit-for-bit (_embdup_sql replicates the adaptive
        # hyperplane-LSH algorithm, partition hash and float contract)
        "embedding_near_dups": dedup.embedding_near_dups,
        # --- similarity search
        "ann_cosine_topk": ann_cosine_topk,
        "ann_multi_topk": ann_multi_topk,  # broadcast query MATRIX
        "ann_ivf_topk": ann_ivf_topk,  # hyperplane-cell IVF: hash-exact
        "ann_filtered_topk": ann_filtered_topk,  # knn-with-filter,
        # predicate pushed into the read (row-group pruning)
        "ann_sq8_topk": ann_sq8_topk,  # int8 scalar quantization,
        # integer-exact code-dot ranking (the 4x memory scale path)
        "ann_ivf_persisted": ann_ivf_persisted,  # cell-partitioned
        # parquet layout, probed cells opened by path (prune-at-read)
        # (the k-means-cell variant stays recall-gated in pytest)
        # --- text analysis extras
        "langid": text.langid,
        "fingerprints": text.fingerprints,
        "bigram_counts": text.bigram_counts,
        "bigram_pmi": text.bigram_pmi,
        "repetition_stats": text.repetition_stats,
        "tfidf_top_terms": text.tfidf_top_terms,
        "unigram_logprob": text.unigram_logprob,
        # interpolated Kneser-Ney bigram LM (KenLM-style perplexity
        # filter, order-2); exact integer micro-nat contract
        "kn_bigram_logprob": text.kn_bigram_logprob,
        # order-3 interpolated KN (KenLM-style perplexity filters run
        # order 3-5); all lower-order stats derive from the trigram
        # type table's continuation counts — exact micro-nat contract
        "kn_trigram_logprob": text.kn_trigram_logprob,
        "ccnet_buckets": text.ccnet_buckets,
        "approx_distinct_terms": text.approx_distinct_terms,
        "cms_term_counts": text.cms_term_counts,
        "events_props_stats": relational.events_props_stats,
        # --- semantic + multimodal (semantic's stand-in embedder is
        # integer mixing + exact dyadic sums, replicated term-for-term in
        # the SQL oracle; multimodal's fake decode is sha256-derived and
        # oracle-checked)
        "semantic_topk": semantic_topk,
        "multimodal_features": multimodal,
        "image_resize_nn": image_resize,
        "video_frame_sample": frame_sample,
        "code_index_stats": code_index_stats,
        # --- corpus curation (decontamination, span-level dup stats,
        # deterministic sampling/quota — the post-dedup steps of a
        # training-data pipeline; all md5/shingle math SQL-replicated)
        "decontaminate": curation.decontaminate,
        "dup_ngram_spans": curation.dup_ngram_spans,
        "stratified_sample": curation.stratified_sample,
        "source_quota_cap": curation.source_quota_cap,
        "token_budget_sample": curation.token_budget_sample,
        "corpus_clean": curation.corpus_clean,
        "pack_sequences": curation.pack_sequences,
        "dup_span_scrub": curation.dup_span_scrub,
        "line_dedup_scrub": curation.line_dedup_scrub,
        "pii_scrub": curation.pii_scrub,
        "unicode_clean": curation.unicode_clean,
        "dsir_weights": curation.dsir_weights,
        # --- percolator (reverse search: stored-query registry matched
        # against the document stream — ES percolate / Lucene Monitor;
        # one streaming pass, registry parsed once per actor)
        "percolate_matches": percolate.percolate_matches,
        # --- round-4 fulltext additions (all engine fan-outs over the
        # documents index, each with an exact SQL oracle)
        # ES rare_terms (exact): long-tail dictionary terms by live df
        "bm25_rare_terms": docsearch.bm25_rare_terms,
        # ES significant_text (JLH): anomalously co-occurring terms of
        # a query's match set vs the corpus, from the inverted index
        "bm25_significant_text": docsearch.bm25_significant_text,
        # ES phrase suggest ("did you mean"): fuzzy candidates ranked
        # by an interpolated bigram LM off the positional postings
        "bm25_phrase_suggest": docsearch.bm25_phrase_suggest,
        # Lucene unified-highlighter passage selection: best idf-weighted
        # token window per matching doc, from positions only
        "bm25_best_passage": docsearch.bm25_best_passage,
        # ES termvectors API (realtime): tf by re-analyzing the stored
        # source (doc filter pushed into the read), df live from the
        # index dictionary
        "bm25_term_vectors": docsearch.bm25_term_vectors,
        # ES matrix_stats: field-pair covariance/correlation from exact
        # arbitrary-precision integer moment sums per shard
        "bm25_matrix_stats": docsearch.bm25_matrix_stats,
        # significant_text under a sampler (the ES scale shape): fg =
        # top-N BM25 docs on the shared rounded-score cut
        "bm25_significant_sampled": docsearch.bm25_significant_sampled,
        # ES pinned query: promoted ids first (matching or not), then
        # the organic ranking with pins excluded; float-free output
        "bm25_pinned": docsearch.bm25_pinned,
        # ES distance_feature: additive proximity boost on a numeric
        # fast field — bm25 + boost*pivot/(pivot+|field-origin|)
        "bm25_distance_feature": docsearch.bm25_distance_feature,
        # ES auto_date_histogram: the engine picks the interval (fixed
        # ladder, bucket-grid count rule) — the oracle re-derives the
        # choice AND the buckets
        "events_auto_histogram": relational.events_auto_histogram,
        # ES number_of_fragments: greedy non-overlapping top-2 windows
        # per doc; the greedy rule itself is oracled
        "bm25_highlight_fragments": docsearch.bm25_highlight_fragments,
        # ES pipeline aggs (derivative + cumulative_sum) over the hourly
        # histogram: distributed parent pass, driver-side pipeline pass
        # over the reduced buckets (where ES runs them too)
        "events_derivative": relational.events_derivative,
        # Lucene SpanFirstQuery: first occurrence inside the leading N
        # positions, straight off the positional postings
        "bm25_span_first": docsearch.bm25_span_first,
        # ES weighted_avg: exact integer sum-of-products over the match
        # set, one float64 divide
        "bm25_weighted_avg": docsearch.bm25_weighted_avg,
        # ES t_test (Welch): mean difference between two query
        # populations from exact per-side moment sums
        "bm25_t_test": docsearch.bm25_t_test,
        # ES median_absolute_deviation — exact (value histograms +
        # pinned lower-median rule) where ES documents TDigest
        "bm25_mad": docsearch.bm25_mad,
        # ES percentile_ranks — exact from the same value histograms
        "bm25_percentile_ranks": docsearch.bm25_percentile_ranks,
        # ES boxplot — exact quartiles (shared ceil-rank rule) +
        # exact-int min/max, one multi-agg fan-out
        "bm25_boxplot": docsearch.bm25_boxplot,
        # ES top_metrics — the metric values of the top-k docs by a
        # numeric sort field (two int-only fan-outs)
        "bm25_top_metrics": docsearch.bm25_top_metrics,
        # ES string_stats — keyword-field length stats + Shannon
        # character entropy over the match set
        "bm25_string_stats": docsearch.bm25_string_stats,
        # ES moving_fn/moving_avg pipeline agg over the hourly
        # histogram (trailing-window mean per type)
        "events_moving_avg": relational.events_moving_avg,
        # ES serial_diff pipeline agg (lag-k difference per type)
        "events_serial_diff": relational.events_serial_diff,
        # ES bucket_script + bucket_selector (per-bucket ratio of two
        # sub-agg counts, buckets below a floor dropped)
        "events_bucket_script": relational.events_bucket_script,
        # Lucene SpanNotQuery — include occurrences with no exclude
        # occurrence in the [pre, post] position window
        "bm25_span_not": docsearch.bm25_span_not,
        # ES diversified_sampler + significant_text: per-lang cap on
        # the ranked sample before the significance pass
        "bm25_significant_diversified":
            docsearch.bm25_significant_diversified,
        # ES rate agg: hourly counts rescaled to a per-minute rate
        "events_rate": relational.events_rate,
        # ES bucket_sort: histogram buckets reordered by a metric,
        # offset + truncated
        "events_bucket_sort": relational.events_bucket_sort,
        # ES collapse: best hit per field value, top-k group winners
        "bm25_collapse": docsearch.bm25_collapse,
        # ES cumulative_cardinality: running distinct-user count per
        # hourly bucket (exact; first-seen groupby is the heavy pass)
        "events_cumulative_cardinality":
            relational.events_cumulative_cardinality,
        # ClickHouse retention: first-active-day cohorts x day offsets
        "user_retention": relational.user_retention,
    }
    # The driver's per-round correctness gate checks a PREFIX of this
    # dict (r3: first 50 of 109; r4: the dedup/ANN/percolate/agg
    # rotation — all green). Round-5 rotation: the 50 below are drawn
    # entirely from the 86 entries the r4 window did NOT directly
    # check — the relational/events families, the bm25 agg/facet
    # family, and the text-statistics LM family (incl.
    # kn_trigram_logprob) — so after this round every family has been
    # driver-gate-checked at least once. Membership is unchanged —
    # only insertion order.
    first = [
        # relational / events (TPC-H-ish + window/session/funnel kin)
        "q1_pricing_summary", "q6_revenue", "q3_top_revenue_orders",
        "q5_revenue_by_nation", "top_customers", "orders_by_status",
        "distinct_flag_status", "expensive_items", "part_type_stats",
        "supplier_balance_by_nation", "events_hourly", "events_sliding",
        "top_orders_per_customer", "user_sessions", "churned_customers",
        "late_ship_priority_counts", "events_asof_prev_purchase",
        "error_click_window_counts", "event_value_quantiles",
        "orders_sorted_ranks",
        # bm25 aggregation / facet family
        "bm25_agg_histogram", "bm25_agg_stats", "bm25_filters_agg",
        "bm25_agg_range", "bm25_agg_percentiles", "bm25_multi_agg",
        "bm25_facet_stats", "bm25_cardinality", "bm25_top_hits_per_lang",
        "bm25_agg_extended_stats", "bm25_facet_counts",
        "bm25_significant_langs",
        # text statistics / language models
        "term_df_top", "token_counts", "bigram_counts", "bigram_pmi",
        "tfidf_top_terms", "unigram_logprob", "kn_bigram_logprob",
        "kn_trigram_logprob", "ccnet_buckets", "approx_distinct_terms",
        "cms_term_counts", "repetition_stats",
        # remaining never-checked singles
        "events_props_stats", "multimodal_features", "image_resize_nn",
        "video_frame_sample", "code_index_stats", "fingerprints",
    ]
    # the driver checks a 50-entry prefix: keep the list EXACTLY 50 so
    # a silent [:50] truncation can never drop the entries this
    # rotation exists to cover
    assert len(first) == 50, len(first)
    assert set(first) <= set(base)
    return {k: base[k] for k in first} | {
        k: v for k, v in base.items() if k not in first
    }


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the persisted-IVF entry is row-identical to the in-memory scan by
    # construction (same cells, probe rule, arithmetic) — same oracle
    d["ann_ivf_persisted"] = d["ann_ivf_topk"]
    # hybrid fusion composes the two legs' own oracles: the semantic
    # statement rides as a derived table, the bm25 rank CTE is the
    # hybrid_rrf lexical leg with the 4-term query
    d["hybrid_semantic_rrf"] = _hybrid_semantic_sql(d["semantic_topk"])
    return d


def _hybrid_semantic_sql(sem_sql: str) -> str:
    terms = "('merge'), ('window'), ('batch'), ('stream')"
    return f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES {terms}) AS q(term)),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS r
  FROM (SELECT * FROM scores ORDER BY score DESC, doc_id LIMIT 100)
),
sem0 AS (
  SELECT * FROM (
{sem_sql}
  )
),
semranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id, chunk_id) AS rn
  FROM sem0
),
semdoc AS (SELECT doc_id, min(rn) AS first_rn FROM semranked GROUP BY doc_id),
semr AS (
  SELECT doc_id, row_number() OVER (ORDER BY first_rn) AS r FROM semdoc
),
fused AS (
  SELECT coalesce(lex.doc_id, semr.doc_id) AS doc_id,
         coalesce(1.0 / (60 + lex.r), 0) + coalesce(1.0 / (60 + semr.r), 0)
           AS rrf
  FROM lex FULL OUTER JOIN semr USING (doc_id)
)
SELECT doc_id, round(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 20
"""



def _oracle_sql_base() -> dict[str, str]:
    from ck_ray.pipelines.docsearch import QUALITY_QUERIES

    qterms = ", ".join(f"('{t}')" for t in _BM25_QUERY_TERMS)
    qual_map = ", ".join(
        f"('{q}', '{t}')" for q in QUALITY_QUERIES for t in q.split()
    )
    return {
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        # TPC-H q6 shape: scan-filter-aggregate with shipdate/quantity
        # predicates pushed into the parquet read; integer-exact revenue
        "q6_revenue": """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_e4,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2001-01-01'
  AND l_quantity < 24
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 2 AND 4
""",
        "q3_top_revenue_orders": """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
""",
        "q5_revenue_by_nation": """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY n_name
""",
        "top_customers": """
SELECT o_custkey, c_name,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_spent_c,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_name
ORDER BY total_spent_c DESC, o_custkey
LIMIT 20
""",
        "orders_by_status": """
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
        "distinct_flag_status": """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "expensive_items": """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
FROM lineitem WHERE l_discount > 0.05
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
""",
        "part_type_stats": """
SELECT p_type, count(*) AS n,
       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
FROM part GROUP BY p_type ORDER BY p_type
""",
        "supplier_balance_by_nation": """
SELECT n_name,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_balance_c,
       count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS total_value_e6
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        # weighted_avg: sum(v*w)/sum(w) over the OR match set
        "bm25_weighted_avg": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
vals AS (
  SELECT strlen(d.text) AS v, COALESCE(dl.c, 0) AS w
  FROM documents d LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT doc_id FROM m)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(w AS HUGEINT)) AS BIGINT) AS weight_total,
       round(CAST(sum(CAST(v AS HUGEINT) * w) AS DOUBLE)
             / CAST(sum(CAST(w AS HUGEINT)) AS DOUBLE), 4)
         AS weighted_avg
FROM vals
""",
        # MAD: pinned lower-median (smallest value whose cumulative
        # count reaches ceil(n/2)) over exact value histograms, twice
        "bm25_mad": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
vals AS (
  SELECT COALESCE(dl.c, 0) AS x FROM documents d
  LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT doc_id FROM m)
),
tot AS (SELECT count(*) AS n FROM vals),
h1 AS (SELECT x, count(*) AS c FROM vals GROUP BY x),
med AS (
  SELECT min(x) AS m FROM (
    SELECT x, sum(c) OVER (ORDER BY x) AS cum FROM h1
  ) CROSS JOIN tot WHERE cum >= (n + 1) // 2
),
h2 AS (
  SELECT abs(x - (SELECT m FROM med)) AS d, sum(c) AS c
  FROM h1 GROUP BY 1
),
mad AS (
  SELECT min(d) AS m FROM (
    SELECT d, sum(c) OVER (ORDER BY d) AS cum FROM h2
  ) CROSS JOIN tot WHERE cum >= (n + 1) // 2
)
SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_docs,
       CAST((SELECT m FROM med) AS BIGINT) AS median,
       CAST((SELECT m FROM mad) AS BIGINT) AS mad
""",
        # percentile_ranks: 100.0 * count(x <= v) / n, exact
        "bm25_percentile_ranks": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
vals AS (
  SELECT COALESCE(dl.c, 0) AS x FROM documents d
  LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT doc_id FROM m)
),
tot AS (SELECT count(*) AS n FROM vals),
req AS (SELECT * FROM (VALUES (350), (400), (450)) AS r(v))
SELECT CAST(req.v AS BIGINT) AS value,
       round((100.0 * (SELECT count(*) FROM vals WHERE x <= req.v))
             / (SELECT n FROM tot), 4) AS pct_le
FROM req ORDER BY value
""",
        # t_test (Welch): identical float64 expression over HUGEINT
        # moment sums of the two populations
        "bm25_t_test": f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
pa AS (
  SELECT COALESCE(dl.c, 0) AS x FROM documents d
  LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM toks2
                     WHERE term = 'merge')
),
pb AS (
  SELECT COALESCE(dl.c, 0) AS x FROM documents d
  LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM toks2
                     WHERE term = 'batch')
),
sa AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
              sum(CAST(x AS HUGEINT) * x) AS sxx FROM pa),
sb AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
              sum(CAST(x AS HUGEINT) * x) AS sxx FROM pb),
stats AS (
  SELECT sa.n AS n_a, sb.n AS n_b,
         CAST(sa.sx AS DOUBLE) / sa.n AS mean_a,
         CAST(sb.sx AS DOUBLE) / sb.n AS mean_b,
         (CAST(sa.sxx AS DOUBLE) - CAST(sa.sx * sa.sx AS DOUBLE) / sa.n)
           / (sa.n - 1) AS var_a,
         (CAST(sb.sxx AS DOUBLE) - CAST(sb.sx * sb.sx AS DOUBLE) / sb.n)
           / (sb.n - 1) AS var_b
  FROM sa CROSS JOIN sb
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b,
       round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4)
         AS t
FROM stats
""",
        # span_first: engine positions are 0-based (< end), the token
        # CTE is 1-based (<= end)
        "bm25_span_first": f"""
WITH {_TOKS_POS},
firsts AS (
  SELECT doc_id, min(pos) AS fp FROM tokp
  WHERE term = 'window' GROUP BY doc_id
)
SELECT doc_id FROM firsts WHERE fp <= 12 ORDER BY doc_id
""",
        # pipeline aggs: LAG delta + running SUM over the observed
        # hourly buckets, each type's first bucket omitted
        "events_derivative": """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
piped AS (
  SELECT event_type, hour, CAST(n AS BIGINT) AS n,
         CAST(n - lag(n) OVER w AS BIGINT) AS dn,
         CAST(sum(n) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS cum_n
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour)
)
SELECT event_type, hour, n, dn, cum_n FROM piped
WHERE dn IS NOT NULL ORDER BY event_type, hour
""",
        "events_sliding": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour,
       CAST(sum(n) OVER (
         PARTITION BY event_type ORDER BY h
         RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_3h
FROM hourly ORDER BY event_type, hour
""",
        "top_orders_per_customer": """
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
       CAST(row_number() OVER (
         PARTITION BY o_custkey
         ORDER BY round(o_totalprice * 100) DESC, o_orderkey
       ) AS BIGINT) AS rank
FROM orders
QUALIFY rank <= 3
ORDER BY o_custkey, rank
""",
        "user_sessions": """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
)
SELECT e.user_id, count(*) AS n_events,
       CAST(max(epoch_us(e.ts)) - min(epoch_us(e.ts)) AS BIGINT) AS span_us,
       CAST(coalesce((SELECT max(gap) FROM gaps g WHERE g.user_id = e.user_id), 0) AS BIGINT) AS max_gap_us
FROM events e GROUP BY e.user_id ORDER BY e.user_id
""",
        "events_asof_prev_purchase": """
SELECT e.event_type,
       count(*) AS n_events,
       count(p.pts) AS n_matched,
       CAST(coalesce(sum(epoch_us(e.ts) - p.pts), 0) AS BIGINT) AS sum_gap_us
FROM events e
LEFT JOIN LATERAL (
    SELECT epoch_us(max(ts)) AS pts
    FROM events p
    WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts < e.ts
) p ON true
GROUP BY 1 ORDER BY 1
""",
        "error_click_window_counts": """
SELECT e.user_id, count(*) AS n_errors,
       CAST(sum(CASE WHEN c.cnt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS errors_with_click,
       CAST(sum(c.cnt) AS BIGINT) AS total_clicks_5m
FROM events e
LEFT JOIN LATERAL (
    SELECT count(*) AS cnt FROM events c
    WHERE c.user_id = e.user_id AND c.event_type = 'click'
      AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
) c ON true
WHERE e.event_type = 'error'
GROUP BY 1 ORDER BY 1
""",
        "event_value_quantiles": """
SELECT event_type, count(*) AS n,
       quantile_disc(CAST(round(value * 1000000) AS BIGINT), 0.5)  AS p50_e6,
       quantile_disc(CAST(round(value * 1000000) AS BIGINT), 0.9)  AS p90_e6,
       quantile_disc(CAST(round(value * 1000000) AS BIGINT), 0.99) AS p99_e6
FROM events GROUP BY 1 ORDER BY 1
""",
        # the directory-source round trip: survivors of the walk are the
        # docs whose filename doc_{id}.txt escapes the `doc_*7.txt`
        # gitignore rule (decimal id not ending in 7); length/md5 prove
        # the content read back byte-identical
        "dir_walk_corpus": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       substr(md5(text), 1, 16) AS content_md5
FROM documents
WHERE doc_id % 10 <> 7
ORDER BY doc_id
""",
        "term_df_top": f"""
WITH {_TOKS}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM toks2 GROUP BY term
ORDER BY df DESC, term
LIMIT 100
""",
        "corpus_stats": f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
perdoc AS (
  SELECT d.doc_id, coalesce(dl.dl, 0) AS dl, length(d.text) AS nchars
  FROM documents d LEFT JOIN dl USING (doc_id)
)
SELECT count(*)                     AS n_docs,
       CAST(sum(dl) AS BIGINT)      AS total_tokens,
       round(avg(dl), 4)            AS avg_tokens,
       round(avg(nchars), 4)        AS avg_chars
FROM perdoc
""",
        "token_counts": f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(dl.dl, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN dl USING (doc_id)
ORDER BY d.doc_id
""",
        "quality_metrics": f"""
WITH {_TOKS},
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN {_STOPWORDS_SQL} THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS tok_bytes
  FROM toks2 GROUP BY doc_id
)
SELECT d.doc_id,
       length(d.text)                         AS n_chars,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT)  AS n_tokens,
       CAST(coalesce(a.n_stop, 0) AS BIGINT)    AS n_stopwords,
       CAST(coalesce(a.tok_bytes, 0) AS BIGINT) AS token_bytes
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
""",
        # Gopher/MassiveText repetition rules: line metrics over the
        # 7-token wrap (+ the deterministic every-5th-doc first-line
        # re-append plant, replicated here), top n-gram coverage over the
        # raw token stream (tokp pos+1 self-joins); ties break on the
        # gram string ASC (binary collation, ascii corpus)
        "repetition_metrics": f"""
WITH {_TOKS_POS},
wrapped AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\\S+ ){{6}}\\S+) ', '\\1' || chr(10), 'g') AS w
  FROM documents
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN w || chr(10) || regexp_extract(w, '^[^' || chr(10) || ']*')
              ELSE w END AS w
  FROM wrapped
),
lines AS (
  SELECT doc_id, unnest(string_split(w, chr(10))) AS line FROM planted
),
lg AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
lagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         count(*) AS n_distinct_lines,
         CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_line_chars
  FROM lg GROUP BY doc_id
),
g2c AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS gram, count(*) AS c
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.doc_id, gram
),
t2 AS (SELECT doc_id, gram, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
       FROM g2c),
g3c AS (
  SELECT a.doc_id, a.term || ' ' || b.term || ' ' || e.term AS gram,
         count(*) AS c
  FROM tokp a
  JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokp e ON a.doc_id = e.doc_id AND e.pos = a.pos + 2
  GROUP BY a.doc_id, gram
),
t3 AS (SELECT doc_id, gram, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
       FROM g3c)
SELECT d.doc_id,
       l.n_lines, l.n_distinct_lines, l.dup_line_chars,
       coalesce(t2.gram, '') AS top2_gram,
       CAST(coalesce(t2.c, 0) AS BIGINT) AS top2_count,
       CAST(coalesce(t2.c * (length(t2.gram) - 1), 0) AS BIGINT) AS top2_chars,
       coalesce(t3.gram, '') AS top3_gram,
       CAST(coalesce(t3.c, 0) AS BIGINT) AS top3_count,
       CAST(coalesce(t3.c * (length(t3.gram) - 2), 0) AS BIGINT) AS top3_chars
FROM documents d
JOIN lagg l USING (doc_id)
LEFT JOIN (SELECT * FROM t2 WHERE rn = 1) t2 USING (doc_id)
LEFT JOIN (SELECT * FROM t3 WHERE rn = 1) t3 USING (doc_id)
ORDER BY d.doc_id
""",
        # composed Gopher rule filter: every threshold an integer
        # cross-multiplication; same line rendering + every-5th-doc
        # plant as repetition_metrics
        "gopher_filter": f"""
WITH {_TOKS_POS}, {_TOKS},
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN term IN {_STOPWORDS_SQL} THEN 1 ELSE 0 END) AS n_stop,
         sum(length(term)) AS tok_bytes
  FROM toks2 GROUP BY doc_id
),
wrapped AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\\S+ ){{6}}\\S+) ', '\\1' || chr(10), 'g') AS w
  FROM documents
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN w || chr(10) || regexp_extract(w, '^[^' || chr(10) || ']*')
              ELSE w END AS w
  FROM wrapped
),
lines AS (
  SELECT doc_id, unnest(string_split(w, chr(10))) AS line FROM planted
),
lg AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
lagg AS (
  SELECT doc_id,
         CAST(sum(c * length(line)) AS BIGINT) AS line_chars,
         CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_line_chars
  FROM lg GROUP BY doc_id
),
g2c AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS gram, count(*) AS c
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.doc_id, gram
),
t2 AS (SELECT doc_id, gram, c,
              row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS rn
       FROM g2c),
sig AS (
  SELECT d.doc_id,
         CAST(coalesce(a.n_tokens, 0) AS BIGINT)  AS n_tokens,
         CAST(coalesce(a.tok_bytes, 0) AS BIGINT) AS token_bytes,
         CAST(coalesce(a.n_stop, 0) AS BIGINT)    AS n_stopwords,
         l.dup_line_chars, l.line_chars,
         CAST(coalesce(t2.c * (length(t2.gram) - 1), 0) AS BIGINT)
           AS top2_chars,
         length(d.text) AS n_chars
  FROM documents d
  JOIN lagg l USING (doc_id)
  LEFT JOIN agg a USING (doc_id)
  LEFT JOIN (SELECT * FROM t2 WHERE rn = 1) t2 USING (doc_id)
)
SELECT doc_id, n_tokens, token_bytes, n_stopwords, dup_line_chars,
       line_chars, top2_chars, n_chars,
       CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000
                 THEN 1 ELSE 0 END AS BIGINT) AS r_word_count,
       CAST(CASE WHEN 3 * n_tokens <= token_bytes
                  AND token_bytes <= 10 * n_tokens
                 THEN 1 ELSE 0 END AS BIGINT) AS r_mean_word_len,
       CAST(CASE WHEN n_stopwords >= 2
                 THEN 1 ELSE 0 END AS BIGINT) AS r_stopwords,
       CAST(CASE WHEN 10 * dup_line_chars <= 3 * line_chars
                 THEN 1 ELSE 0 END AS BIGINT) AS r_dup_line,
       CAST(CASE WHEN 5 * top2_chars <= n_chars
                 THEN 1 ELSE 0 END AS BIGINT) AS r_top2,
       CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000
                  AND 3 * n_tokens <= token_bytes
                  AND token_bytes <= 10 * n_tokens
                  AND n_stopwords >= 2
                  AND 10 * dup_line_chars <= 3 * line_chars
                  AND 5 * top2_chars <= n_chars
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sig
ORDER BY doc_id
""",
        "lang_source_counts": """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
""",
        "bm25_topk": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES {qterms}) AS q(term)),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, doc_id LIMIT {_BM25_K}
)
SELECT doc_id, round(score, 4) AS score FROM topk
ORDER BY score DESC, doc_id
""",
        # stored-snippet parity: identical BM25 scores (wrapping changes
        # no token), snippet = first 3 lines of the 7-token line-wrapped
        # text — the same RE2 rewrite + extract the Ray side stores in
        # the index's serving `preview` field at build time
        "bm25_snippets": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES {qterms}) AS q(term)),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, doc_id LIMIT {_BM25_K}
),
wrapped AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\\S+ ){{6}}\\S+) ', '\\1' || chr(10), 'g')
           AS wtext
  FROM documents
)
SELECT t.doc_id, round(t.score, 4) AS score,
       regexp_extract(w.wtext, '^([^\\n]*(\\n[^\\n]*){{0,2}})', 1) AS snippet
FROM topk t JOIN wrapped w USING (doc_id)
ORDER BY score DESC, doc_id
""",
        "bm25_boolean": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
cand AS (
  SELECT a.doc_id
  FROM (SELECT doc_id FROM tf WHERE term = 'merge') a
  JOIN (SELECT doc_id FROM tf WHERE term = 'window') b USING (doc_id)
  WHERE a.doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'batch')
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  WHERE tf.doc_id IN (SELECT doc_id FROM cand)
    AND tf.term IN ('merge', 'window')
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, doc_id LIMIT {_BM25_K}
)
SELECT doc_id, round(score, 4) AS score FROM topk
ORDER BY score DESC, doc_id
""",
        # prefix query s*: dictionary expansion == LIKE 's%', scored as
        # a SHOULD disjunction (sum of member-term BM25 contributions);
        # rounded-score cut like the phrase entries
        "bm25_prefix": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term LIKE 's%' GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # range query `window OR [q TO spal]`: docs containing ANY
        # dictionary term in the lexicographic interval contribute a
        # CONST 1.0 (tantivy RangeQuery ConstScorer — no tf/idf),
        # summed with the window BM25 leg
        "bm25_range": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf WHERE term = 'window' GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term = 'window'
),
rng AS (
  SELECT DISTINCT doc_id FROM tf WHERE term >= 'q' AND term < 'spal'
),
scores AS (
  SELECT coalesce(b.doc_id, r.doc_id) AS doc_id,
         coalesce(b.score, 0)
           + (CASE WHEN r.doc_id IS NOT NULL THEN 1.0 ELSE 0 END) AS score
  FROM bm b FULL OUTER JOIN rng r ON b.doc_id = r.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # term set `IN [dup spark] fast`: set MEMBERSHIP scores 1.0 once
        # (however many member terms the doc holds — tantivy
        # TermSetQuery), plus the fast BM25 leg
        "bm25_termset": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf WHERE term = 'fast' GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term = 'fast'
),
members AS (
  SELECT DISTINCT doc_id FROM tf WHERE term IN ('dup', 'spark')
),
scores AS (
  SELECT coalesce(b.doc_id, m.doc_id) AS doc_id,
         coalesce(b.score, 0)
           + (CASE WHEN m.doc_id IS NOT NULL THEN 1.0 ELSE 0 END) AS score
  FROM bm b FULL OUTER JOIN members m ON b.doc_id = m.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # fuzzy `window spal~2`: docs holding ANY term within edit
        # distance 2 of 'spal' (DuckDB levenshtein == the engine's
        # strdist kernel; 'spal' itself is NOT a corpus term) score 1.0
        # once (tantivy FuzzyTermQuery -> AutomatonWeight ConstScorer),
        # plus the scored BM25 leg
        "bm25_fuzzy": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf WHERE term = 'window' GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term = 'window'
),
fuzz AS (
  SELECT DISTINCT doc_id FROM tf WHERE levenshtein(term, 'spal') <= 2
),
scores AS (
  SELECT coalesce(b.doc_id, z.doc_id) AS doc_id,
         coalesce(b.score, 0)
           + (CASE WHEN z.doc_id IS NOT NULL THEN 1.0 ELSE 0 END) AS score
  FROM bm b FULL OUTER JOIN fuzz z ON b.doc_id = z.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # facet counts for `merge AND window -batch` by lang: the full
        # boolean match set (NOT top-k) bucketed by the lang column —
        # tantivy Count/TermsAggregation collector semantics
        "bm25_facet_counts": f"""
WITH {_TOKS},
terms AS (SELECT DISTINCT doc_id, term FROM toks2
          WHERE term IN ('merge', 'window', 'batch')),
m AS (
  SELECT a.doc_id
  FROM (SELECT doc_id FROM terms WHERE term = 'merge') a
  JOIN (SELECT doc_id FROM terms WHERE term = 'window') b USING (doc_id)
  LEFT JOIN (SELECT doc_id FROM terms WHERE term = 'batch') c USING (doc_id)
  WHERE c.doc_id IS NULL
)
SELECT d.lang AS lang, count(*) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY lang
""",
        # significant_terms over the `merge window` match set (ES JLH):
        # exact int fg/bg counts per lang, then the engine's exact
        # double expression (fg% - bg%) * (fg% / bg%); positive scores
        # only, cut on the RAW score (bit-identical both sides), 4dp
        # rounding applied after the cut
        "bm25_significant_langs": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
fg AS (SELECT d.lang, count(*) AS fg_count
       FROM m JOIN documents d USING (doc_id) GROUP BY d.lang),
bg AS (SELECT lang, count(*) AS bg_count FROM documents GROUP BY lang),
tot AS (SELECT (SELECT count(*) FROM m) AS fgt,
               (SELECT count(*) FROM documents) AS bgt),
scored AS (
  SELECT fg.lang, fg.fg_count, bg.bg_count,
         (CAST(fg.fg_count AS DOUBLE) / t.fgt
            - CAST(bg.bg_count AS DOUBLE) / t.bgt)
           * ((CAST(fg.fg_count AS DOUBLE) / t.fgt)
              / (CAST(bg.bg_count AS DOUBLE) / t.bgt)) AS score
  FROM fg JOIN bg USING (lang) CROSS JOIN tot t
),
topk AS (SELECT lang, fg_count, bg_count, score FROM scored
         WHERE score > 0 ORDER BY score DESC, lang LIMIT 3)
SELECT lang, fg_count, bg_count, round(score, 4) AS score FROM topk
ORDER BY score DESC, lang
""",
        # histogram aggregation over the `merge AND window` match set:
        # n_bytes fast field = strlen(text) bytes, ES floor-key buckets
        "bm25_agg_histogram": f"""
WITH {_TOKS},
terms AS (SELECT DISTINCT doc_id, term FROM toks2
          WHERE term IN ('merge', 'window')),
m AS (
  SELECT a.doc_id
  FROM (SELECT doc_id FROM terms WHERE term = 'merge') a
  JOIN (SELECT doc_id FROM terms WHERE term = 'window') b USING (doc_id)
)
SELECT CAST((strlen(d.text) // 64) * 64 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1
ORDER BY 1
""",
        # stats aggregation of dl_content (analyzer token count) over
        # the `spark merge` (OR) match set; avg = one double divide of
        # exact ints, identical on both sides
        "bm25_agg_stats": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term IN ('spark', 'merge')),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
j AS (SELECT dl.dl AS dl FROM m JOIN dl USING (doc_id))
SELECT CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(dl) AS BIGINT) AS min_v,
       CAST(max(dl) AS BIGINT) AS max_v,
       CAST(sum(dl) AS BIGINT) AS sum_v,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
FROM j
""",
        # delete-by-query probe: after tombstoning every doc containing
        # 'batch', the (merge OR window) facet counts must equal the
        # corpus match set EXCEPT the delete set, per lang
        "bm25_delete_by_query": f"""
WITH {_TOKS},
m AS (
  SELECT DISTINCT doc_id FROM toks2 WHERE term IN ('merge', 'window')
  EXCEPT
  SELECT doc_id FROM toks2 WHERE term = 'batch'
)
SELECT d.lang AS lang, count(*) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY lang
""",
        # filters bucket agg: stats of dl_content per NAMED filter
        # match set — `merge` and `window -batch` (boolean NOT in a
        # filter), one UNION ALL branch per bucket
        "bm25_filters_agg": f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
m1 AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'merge'),
m2 AS (
  SELECT doc_id FROM toks2 WHERE term = 'window'
  EXCEPT SELECT doc_id FROM toks2 WHERE term = 'batch'
),
b1 AS (
  SELECT 'has_merge' AS bucket,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(min(dl) AS BIGINT) AS min_v,
         CAST(max(dl) AS BIGINT) AS max_v,
         CAST(sum(dl) AS BIGINT) AS sum_v,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
  FROM m1 JOIN dl USING (doc_id)
),
b2 AS (
  SELECT 'win_not_batch' AS bucket,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(min(dl) AS BIGINT) AS min_v,
         CAST(max(dl) AS BIGINT) AS max_v,
         CAST(sum(dl) AS BIGINT) AS sum_v,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
  FROM m2 JOIN dl USING (doc_id)
)
SELECT * FROM b1 UNION ALL SELECT * FROM b2
ORDER BY bucket
""",
        # range aggregation over n_bytes for the `window` match set —
        # ES [from, to) buckets incl. EMPTY ones (label set is spec-
        # determined), byte-lexicographic label order both sides
        "bm25_agg_range": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'window'),
v AS (SELECT strlen(d.text) AS nb
      FROM m JOIN documents d USING (doc_id)),
specs AS (SELECT * FROM (VALUES
  ('*-200', NULL, 200), ('200-400', 200, 400),
  ('400-800', 400, 800), ('800-*', 800, NULL)) AS s(bucket, lo, hi))
SELECT s.bucket AS bucket, CAST(count(v.nb) AS BIGINT) AS n_docs
FROM specs s LEFT JOIN v
  ON (s.lo IS NULL OR v.nb >= s.lo) AND (s.hi IS NULL OR v.nb < s.hi)
GROUP BY s.bucket
ORDER BY s.bucket
""",
        # exact discrete percentiles of dl_content over the `merge`
        # match set: value at row_number >= ceil(q * n) — the identical
        # double multiply + ceil the engine's merged value-count walk
        # performs
        "bm25_agg_percentiles": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'merge'),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
vals AS (SELECT dl.dl AS v FROM m JOIN dl USING (doc_id)),
ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
                  count(*) OVER () AS n FROM vals),
qs AS (SELECT * FROM (VALUES (0.25), (0.5), (0.75), (0.99)) AS q(q))
SELECT q.q AS q, CAST(min(r.v) AS BIGINT) AS value
FROM qs q JOIN ranked r ON r.rn >= greatest(1, ceil(q.q * r.n))
GROUP BY q.q
ORDER BY q.q
""",
        # sub-aggregation: per-lang stats of dl_content over the
        # `merge window` (OR) match set — GROUP BY lang
        "bm25_facet_stats": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
j AS (SELECT d.lang AS lang, dl.dl AS dl
      FROM m JOIN documents d USING (doc_id) JOIN dl USING (doc_id))
SELECT lang,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(dl) AS BIGINT) AS min_v,
       CAST(max(dl) AS BIGINT) AS max_v,
       CAST(sum(dl) AS BIGINT) AS sum_v,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
FROM j
GROUP BY lang
ORDER BY lang
""",
        # one-pass multi-agg: stats of n_bytes AND dl_content over the
        # `merge window batch` (OR) match set
        "bm25_multi_agg": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window', 'batch')),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
j AS (SELECT strlen(d.text) AS nb, dl.dl AS dl
      FROM m JOIN documents d USING (doc_id) JOIN dl USING (doc_id))
SELECT CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(nb) AS BIGINT) AS nb_min,
       CAST(max(nb) AS BIGINT) AS nb_max,
       CAST(sum(nb) AS BIGINT) AS nb_sum,
       CAST(sum(nb) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS nb_avg,
       CAST(min(dl) AS BIGINT) AS dl_min,
       CAST(max(dl) AS BIGINT) AS dl_max,
       CAST(sum(dl) AS BIGINT) AS dl_sum,
       CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dl_avg
FROM j
""",
        # exact cardinality of lang over the `merge` match set
        "bm25_cardinality": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'merge')
SELECT CAST(count(*) AS BIGINT) AS n_matches,
       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_values
FROM m JOIN documents d USING (doc_id)
""",
        # per-lang top-3 BM25 hits of the `merge window` (OR) match set
        # (ES terms + top_hits composite): standard in-SQL BM25, ranked
        # inside each lang partition on the 4dp-rounded score with
        # doc_id-asc tie-break — the same rounded-cut contract as
        # bm25_topk
        "bm25_top_hits_per_lang": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT d.lang AS lang, sc.doc_id AS doc_id,
         round(sc.score, 4) AS score,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY round(sc.score, 4) DESC, sc.doc_id
         ) AS rn
  FROM scores sc JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, score FROM ranked WHERE rn <= 3
ORDER BY lang, score DESC, doc_id
""",
        # rows 11-20 of the `merge window` ranked list: LIMIT 10
        # OFFSET 10 on the 4dp-rounded ordering (deep pagination)
        "bm25_paged": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
page AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT 10 OFFSET 10)
SELECT doc_id, score FROM page
ORDER BY score DESC, doc_id
""",
        # cursor deep pagination (ES search_after): the engine walks 3
        # pages of 8 with the raw (score, doc_id) cursor and asserts it
        # reconstructs the offset ranking; the oracle is page 3 =
        # LIMIT 8 OFFSET 16 of the rounded ordering
        "bm25_search_after": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
page AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT 8 OFFSET 16)
SELECT doc_id, score FROM page
ORDER BY score DESC, doc_id
""",
        # DisjunctionMax (Lucene/ES dis_max, tie_breaker 0.3): clause 1
        # is the two-term OR `merge window` (sum of term scores —
        # commutative, so float64-exact vs the engine's TAAT order),
        # clause 2 the single term `spark`; combine order mirrors the
        # engine exactly: greatest + tie * ((s1 + s2) - greatest)
        "bm25_dismax": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window', 'spark') GROUP BY term
),
bm AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
c1 AS (SELECT doc_id, sum(score) AS s FROM bm
       WHERE term IN ('merge', 'window') GROUP BY doc_id),
c2 AS (SELECT doc_id, score AS s FROM bm WHERE term = 'spark'),
u AS (
  SELECT coalesce(c1.doc_id, c2.doc_id) AS doc_id,
         coalesce(c1.s, 0) AS s1, coalesce(c2.s, 0) AS s2
  FROM c1 FULL OUTER JOIN c2 ON c1.doc_id = c2.doc_id
),
scored AS (
  SELECT doc_id,
         greatest(s1, s2) + 0.3 * ((s1 + s2) - greatest(s1, s2)) AS score
  FROM u
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scored
         ORDER BY round(score, 4) DESC, doc_id LIMIT 15)
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # boosting query: positive = OR over ('merge','window') summed
        # per doc (2-term sum is commutative, float64-exact vs TAAT),
        # then ONE multiply by 0.5 for docs that also contain 'scan' —
        # the negative side demotes, never excludes
        "bm25_boosting": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
bm AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
posq AS (SELECT doc_id, sum(score) AS s FROM bm GROUP BY doc_id),
negq AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'scan'),
scored AS (
  SELECT p.doc_id,
         p.s * (CASE WHEN n.doc_id IS NOT NULL THEN 0.5 ELSE 1 END)
           AS score
  FROM posq p LEFT JOIN negq n ON p.doc_id = n.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scored
         ORDER BY round(score, 4) DESC, doc_id LIMIT 15)
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # function_score/field_value_factor: the positive OR-sum per doc
        # times ln(1 + dl) where dl = the doc's kept-token count (the
        # dl_content fast field the build emits); engine log1p vs SQL
        # ln(1+x) ulp is absorbed by the 4dp rounded cut
        "bm25_function_score": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window') GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
posq AS (SELECT doc_id, sum(score) AS s FROM bm GROUP BY doc_id),
scored AS (
  SELECT p.doc_id,
         p.s * ln(1 + 1.0 * d.dl) AS score
  FROM posq p JOIN dl d USING (doc_id)
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scored
         ORDER BY round(score, 4) DESC, doc_id LIMIT 15)
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # minimum_should_match=2 of the 3 should-clauses: per-term BM25
        # grouped per doc, HAVING count(*) >= 2, score = sum of the
        # matching term scores (same accumulation the engine performs)
        "bm25_min_should_match": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window', 'batch') GROUP BY term
),
bm AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
g AS (
  SELECT doc_id, sum(score) AS score FROM bm
  GROUP BY doc_id HAVING count(*) >= 2
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM g
         ORDER BY round(score, 4) DESC, doc_id LIMIT 15)
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # ES extended_stats of dl_content over the `merge` match set:
        # exact integer moments (HUGEINT in SQL, Python big-ints in the
        # engine), then the IDENTICAL double ops both sides — one
        # divide for avg, one divide of (n*ssq - sum^2) for variance,
        # IEEE sqrt for std — so the doubles match bit-for-bit
        "bm25_agg_extended_stats": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'merge'),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
j AS (SELECT dl.dl AS dl FROM m JOIN dl USING (doc_id)),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
         CAST(min(dl) AS BIGINT) AS min_v,
         CAST(max(dl) AS BIGINT) AS max_v,
         CAST(sum(dl) AS BIGINT) AS sum_v,
         CAST(sum(CAST(dl AS HUGEINT) * dl) AS HUGEINT) AS ssq
  FROM j
)
SELECT cnt, min_v, max_v, sum_v,
       CAST(ssq AS BIGINT) AS sum_sq,
       CAST(sum_v AS DOUBLE) / CAST(cnt AS DOUBLE) AS avg_v,
       CAST(CAST(cnt AS HUGEINT) * ssq
            - CAST(sum_v AS HUGEINT) * sum_v AS DOUBLE)
         / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS var_v,
       sqrt(CAST(CAST(cnt AS HUGEINT) * ssq
                 - CAST(sum_v AS HUGEINT) * sum_v AS DOUBLE)
            / (CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS std_v
FROM agg
""",
        # top-15 of the `window` match set ordered by the n_bytes fast
        # field (desc, doc_id-asc ties) — tantivy order_by_u64_field
        "bm25_sort_by_field": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term = 'window')
SELECT doc_id, CAST(strlen(d.text) AS BIGINT) AS n_bytes
FROM m JOIN documents d USING (doc_id)
ORDER BY n_bytes DESC, doc_id
LIMIT 15
""",
        # more-like-this 'window window merge fast spark' (3-term cut):
        # SQL replicates the ENGINE'S term selection — tf from the
        # tokenized literal, df/N from the corpus, rank tf*ln(1+(N-df+
        # 0.5)/(df+0.5)) desc / term asc, LIMIT 3 — then standard BM25
        # over the selected terms (sum per doc), rounded cut
        "bm25_more_like_this": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qtok AS (
  SELECT unnest(regexp_split_to_array(
           lower('window window merge fast spark'), '[^a-z0-9]+')) AS term
),
qtf AS (
  SELECT term, count(*) AS qtf FROM qtok
  WHERE term <> '' AND length(term) < 40 GROUP BY term
),
dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks2
  WHERE term IN (SELECT term FROM qtf) GROUP BY term
),
sel AS (
  SELECT q.term, d.df
  FROM qtf q JOIN dfq d USING (term) CROSS JOIN stats s
  ORDER BY q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) DESC, q.term
  LIMIT 3
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - sel.df + 0.5) / (sel.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN sel USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # regex `window /s.*(k|m)/`: docs holding ANY term the anchored
        # pattern fully matches (python re.fullmatch == DuckDB
        # regexp_full_match on this shared-syntax pattern) score 1.0
        # once (tantivy RegexQuery -> AutomatonWeight ConstScorer),
        # plus the scored BM25 leg
        "bm25_regexterm": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf WHERE term = 'window' GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term = 'window'
),
rxm AS (
  SELECT DISTINCT doc_id FROM tf
  WHERE regexp_full_match(term, 's.*(k|m)')
),
scores AS (
  SELECT coalesce(b.doc_id, z.doc_id) AS doc_id,
         coalesce(b.score, 0)
           + (CASE WHEN z.doc_id IS NOT NULL THEN 1.0 ELSE 0 END) AS score
  FROM bm b FULL OUTER JOIN rxm z ON b.doc_id = z.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # query-time synonyms merge->batch: the blended pseudo-term's
        # per-doc tf is tf(merge)+tf(batch) and its idf uses
        # greatest(df_merge, df_batch) — ONE score, not an OR of two —
        # summed with the ordinary window leaf
        "bm25_synonyms": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
dfb AS (
  SELECT max(df) AS df FROM (
    SELECT count(*) AS df FROM tf
    WHERE term IN ('merge', 'batch') GROUP BY term
  )
),
blend AS (
  SELECT doc_id, sum(tf) AS tf FROM tf
  WHERE term IN ('merge', 'batch') GROUP BY doc_id
),
bs AS (
  SELECT b.doc_id,
         ln(1 + (s.n - x.df + 0.5) / (x.df + 0.5))
           * ((b.tf * 2.2)
              / (b.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM blend b JOIN dl USING (doc_id) CROSS JOIN dfb x CROSS JOIN stats s
),
dfw AS (SELECT count(*) AS df FROM tf WHERE term = 'window'),
ws AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - w.df + 0.5) / (w.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN dl USING (doc_id) CROSS JOIN dfw w CROSS JOIN stats s
  WHERE tf.term = 'window'
),
scores AS (
  SELECT coalesce(b.doc_id, w.doc_id) AS doc_id,
         coalesce(b.score, 0) + coalesce(w.score, 0) AS score
  FROM bs b FULL OUTER JOIN ws w ON b.doc_id = w.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # term suggester for the typo `mergw`: dictionary terms within
        # 2 Levenshtein edits, ranked distance asc / doc-frequency desc
        # / term asc, input excluded — all-integer, exactly the engine's
        # (distance, -df, term) sort
        "bm25_suggest": f"""
WITH {_TOKS},
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2
        GROUP BY term),
cand AS (
  SELECT term, df, levenshtein(term, 'mergw') AS distance
  FROM dfs
  WHERE levenshtein(term, 'mergw') <= 2 AND term <> 'mergw'
)
SELECT term, CAST(distance AS BIGINT) AS distance,
       CAST(df AS BIGINT) AS df
FROM cand
ORDER BY distance, df DESC, term LIMIT 5
""",
        # explain: re-derive the top-1 doc of `merge window batch` under
        # the shared rounded convention, then one row per term present
        # in it with the exact BM25 evidence (df, tf, dl, contribution)
        "bm25_explain": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN ('merge', 'window', 'batch') GROUP BY term
),
bm AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.dl, df.df,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
docsum AS (SELECT doc_id, sum(score) AS s FROM bm GROUP BY doc_id),
top1 AS (SELECT doc_id FROM docsum
         ORDER BY round(s, 4) DESC, doc_id LIMIT 1)
SELECT b.term AS term, b.doc_id AS doc_id, b.df AS df, b.tf AS tf,
       b.dl AS dl, round(b.score, 4) AS score
FROM bm b JOIN top1 USING (doc_id)
ORDER BY term
""",
        # wildcard `merge w?nd*w` (Lucene WildcardQuery): docs holding
        # ANY term the pattern matches in full score 1.0 once (the
        # parser rewrites `?`->`.`/`*`->`.*` onto the regex clause;
        # SQL LIKE's `_`/`%` are the identical automaton on the
        # alnum-only dictionary), plus the scored BM25 leg
        "bm25_wildcard": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (
  SELECT term, count(*) AS df FROM tf WHERE term = 'merge' GROUP BY term
),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  WHERE tf.term = 'merge'
),
wcm AS (
  SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'w_nd%w'
),
scores AS (
  SELECT coalesce(b.doc_id, z.doc_id) AS doc_id,
         coalesce(b.score, 0)
           + (CASE WHEN z.doc_id IS NOT NULL THEN 1.0 ELSE 0 END) AS score
  FROM bm b FULL OUTER JOIN wcm z ON b.doc_id = z.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # match-all with exclusion `* -scan`: every doc without 'scan'
        # scores exactly 1.0 (tantivy AllQuery ConstScorer under a
        # MUST_NOT sibling); ties break doc_id-asc
        "bm25_matchall": f"""
WITH {_TOKS},
m AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM toks2 WHERE term = 'scan')
)
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score FROM m
ORDER BY doc_id LIMIT {_BM25_K}
""",
        # phrase-prefix "fast s"*: last term LIKE-expands, each expansion
        # scores as the exact phrase (adjacency pairs), doc score = sum
        # over matching expansions; phrase idf = idf(head) + idf(expansion)
        "bm25_phrase_prefix": f"""
WITH {_TOKS_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
exp AS (SELECT DISTINCT term FROM tokp WHERE term LIKE 's%'),
dfh AS (SELECT count(DISTINCT doc_id) AS df FROM tokp WHERE term = 'fast'),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
        WHERE term IN (SELECT term FROM exp) GROUP BY term),
pairs AS (
  SELECT a.doc_id, b.term, count(*) AS tf
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term IN (SELECT term FROM exp)
  GROUP BY a.doc_id, b.term
),
scores AS (
  SELECT p.doc_id,
         sum( (ln(1 + (s.n - h.df + 0.5) / (h.df + 0.5))
               + ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5)))
              * ((p.tf * 2.2)
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) ) AS score
  FROM pairs p
  JOIN dft USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  CROSS JOIN dfh h
  WHERE h.df > 0
  GROUP BY p.doc_id
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # exact-phrase BM25: phrase tf from token positions (greedy pos+1
        # chain == adjacency at slop 0), phrase idf = sum of member idfs
        # (tantivy Bm25Weight::for_terms). On this table the analyzer
        # drops no token, so kept-rank positions == tantivy ordinals.
        "bm25_phrase": f"""
WITH {_TOKS_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
       WHERE term IN ('merge', 'window') GROUP BY term),
w AS (SELECT sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS wsum,
             count(*) AS nterms
      FROM df CROSS JOIN stats s),
p0 AS (SELECT doc_id, pos FROM tokp WHERE term = 'merge'),
p1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'window'),
chain AS (SELECT p0.doc_id, p0.pos AS q0, min(p1.pos) AS q1
          FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos > p0.pos
          GROUP BY p0.doc_id, p0.pos),
tfm AS (SELECT doc_id, count(*) AS tf FROM chain
        WHERE q1 - q0 - 1 <= 0 GROUP BY doc_id),
scores AS (
  SELECT t.doc_id,
         (SELECT wsum FROM w)
           * ((t.tf * 2.2)
              / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM tfm t JOIN dl d USING (doc_id) CROSS JOIN stats s
  WHERE (SELECT nterms FROM w) = 2
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # two-phase rescore: primary = OR-sum over (merge, window);
        # window = its raw top-40 (float64 desc, doc_id asc — bit-
        # identical both sides); secondary = the exact phrase scored by
        # adjacency pairs on window docs; combined = 1.0*p + 2.0*s
        "bm25_rescore": f"""
WITH {_TOKS_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokp
       WHERE term IN ('merge', 'window') GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
       WHERE term IN ('merge', 'window') GROUP BY term),
bm AS (
  SELECT tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * ((tf.tf * 2.2)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
prim AS (SELECT doc_id, sum(score) AS s FROM bm GROUP BY doc_id),
win AS (SELECT doc_id, s FROM prim ORDER BY s DESC, doc_id LIMIT 40),
w AS (SELECT sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS wsum
      FROM df CROSS JOIN stats s),
p0 AS (SELECT doc_id, pos FROM tokp WHERE term = 'merge'),
p1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'window'),
chain AS (SELECT p0.doc_id, p0.pos AS q0, min(p1.pos) AS q1
          FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos > p0.pos
          GROUP BY p0.doc_id, p0.pos),
tfm AS (SELECT doc_id, count(*) AS tf FROM chain
        WHERE q1 - q0 - 1 <= 0 GROUP BY doc_id),
sec AS (
  SELECT t.doc_id,
         (SELECT wsum FROM w)
           * ((t.tf * 2.2)
              / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS s2
  FROM tfm t JOIN dl d USING (doc_id) CROSS JOIN stats s
),
comb AS (
  SELECT win.doc_id,
         1.0 * win.s + 2.0 * coalesce(sec.s2, 0) AS score
  FROM win LEFT JOIN sec USING (doc_id)
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM comb
         ORDER BY round(score, 4) DESC, doc_id LIMIT 15)
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        # sloppy phrase "merge window batch"~2: the engine's greedy
        # in-order chain replicated as nested min-position CTEs, total
        # extra gap q2-q0-2 <= 2 — the slop RULE is oracled, not just
        # the BM25 arithmetic
        "bm25_phrase_slop": f"""
WITH {_TOKS_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
       WHERE term IN ('merge', 'window', 'batch') GROUP BY term),
w AS (SELECT sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS wsum,
             count(*) AS nterms
      FROM df CROSS JOIN stats s),
p0 AS (SELECT doc_id, pos FROM tokp WHERE term = 'merge'),
p1 AS (SELECT doc_id, pos FROM tokp WHERE term = 'window'),
p2 AS (SELECT doc_id, pos FROM tokp WHERE term = 'batch'),
chain1 AS (SELECT p0.doc_id, p0.pos AS q0, min(p1.pos) AS q1
           FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos > p0.pos
           GROUP BY p0.doc_id, p0.pos),
chain2 AS (SELECT c.doc_id, c.q0, min(p2.pos) AS q2
           FROM chain1 c JOIN p2 ON p2.doc_id = c.doc_id AND p2.pos > c.q1
           GROUP BY c.doc_id, c.q0),
tfm AS (SELECT doc_id, count(*) AS tf FROM chain2
        WHERE q2 - q0 - 2 <= 2 GROUP BY doc_id),
scores AS (
  SELECT t.doc_id,
         (SELECT wsum FROM w)
           * ((t.tf * 2.2)
              / (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM tfm t JOIN dl d USING (doc_id) CROSS JOIN stats s
  WHERE (SELECT nterms FROM w) = 3
),
topk AS (SELECT doc_id, round(score, 4) AS score FROM scores
         ORDER BY round(score, 4) DESC, doc_id LIMIT {_BM25_K})
SELECT doc_id, score FROM topk
ORDER BY score DESC, doc_id
""",
        "regex_match_docs": f"""
SELECT doc_id FROM documents
WHERE regexp_matches(text, '{_REGEX_PATTERN}')
ORDER BY doc_id
""",
        # retrieval-quality harness: BM25 ranking (same in-SQL scorer as
        # bm25_topk, ranks on 4dp-rounded scores with doc_id-asc tiebreak)
        # vs phrase-containment relevance; Recall@10 and MRR@10 per query
        "retrieval_quality": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qmap AS (SELECT * FROM (VALUES {qual_map}) AS q(query, term)),
qs AS (SELECT DISTINCT query FROM qmap),
rel AS (
  SELECT q.query, d.doc_id
  FROM qs q JOIN documents d ON d.text LIKE '%' || q.query || '%'
),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qmap) GROUP BY term
),
scores AS (
  SELECT qm.query, tf.doc_id,
         round(sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ), 4)
           AS score
  FROM qmap qm
  JOIN tf ON tf.term = qm.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qm.query, tf.doc_id
),
ranked AS (
  SELECT query, doc_id,
         row_number() OVER (PARTITION BY query
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scores
),
topk AS (SELECT * FROM ranked WHERE rnk <= 10),
m AS (
  SELECT q.query,
         (SELECT count(*) FROM rel r WHERE r.query = q.query) AS n_relevant,
         (SELECT count(*) FROM topk t JOIN rel r
            ON r.query = t.query AND r.doc_id = t.doc_id
          WHERE t.query = q.query) AS hits_at_k,
         coalesce((SELECT min(t.rnk) FROM topk t JOIN rel r
                     ON r.query = t.query AND r.doc_id = t.doc_id
                   WHERE t.query = q.query), 0) AS first_rank
  FROM qs q
)
SELECT query,
       CAST(n_relevant AS BIGINT) AS n_relevant,
       CAST(hits_at_k AS BIGINT) AS hits_at_k,
       CAST(first_rank AS BIGINT) AS first_rank,
       CASE WHEN n_relevant > 0
            THEN round(CAST(hits_at_k AS DOUBLE) / n_relevant, 6)
            ELSE 0.0 END AS recall_at_k,
       CASE WHEN first_rank > 0
            THEN round(1.0 / first_rank, 6)
            ELSE 0.0 END AS mrr_at_k
FROM m ORDER BY query
""",
        "exact_dedup": """
SELECT CAST(min(doc_id) AS BIGINT) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY keeper_doc_id
""",
        "code_chunks": """
WITH d AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS ls,
         CASE WHEN text = '' THEN 0
              ELSE len(string_split(text, chr(10)))
                   - CASE WHEN text LIKE '%' || chr(10) THEN 1 ELSE 0 END
         END AS n
  FROM documents
)
SELECT doc_id,
       CAST(s / 16 AS BIGINT)          AS chunk_id,
       CAST(s + 1 AS BIGINT)           AS line_start,
       CAST(least(s + 20, n) AS BIGINT) AS line_end,
       -- byte offsets by cumulative line-length arithmetic (strlen =
       -- BYTES; +1 per preceding newline); terminator-exclusive end
       CAST(CASE WHEN s = 0 THEN 0
            ELSE strlen(array_to_string(ls[1:s], chr(10))) + 1
       END AS BIGINT)                   AS byte_start,
       CAST(strlen(array_to_string(ls[1:least(s + 20, n)], chr(10)))
            AS BIGINT)                  AS byte_end
FROM d, unnest(generate_series(0, greatest(n - 1, 0), 16)) AS g(s)
WHERE n > 0 AND (s = 0 OR s + 4 < n)
ORDER BY doc_id, chunk_id
""",
        "ngram_jaccard_pairs": _shingle_sql(3, 0.5),
        # the full MinHash-LSH algorithm replicated in SQL (exact,
        # including LSH misses) — see _minhash_sql
        "minhash_lsh_pairs": _minhash_sql(64, 16, 5, 0.6),
        # the adaptive hyperplane-LSH near-dup algorithm replicated in
        # SQL (planted-pair parity pytest covers the non-empty case;
        # the sf tables contain no 0.95-cosine pairs) — see _embdup_sql
        "embedding_near_dups": _embdup_sql(),
        "near_dup_groups": f"""
WITH RECURSIVE {_TOKS_POS.strip().lstrip()},
sh AS (
  SELECT DISTINCT t0.doc_id,
         t0.term || chr(1) || t1.term || chr(1) || t2.term || chr(1)
           || t3.term || chr(1) || t4.term AS s
  FROM tokp t0
  JOIN tokp t1 ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
  JOIN tokp t2 ON t0.doc_id = t2.doc_id AND t2.pos = t0.pos + 2
  JOIN tokp t3 ON t0.doc_id = t3.doc_id AND t3.pos = t0.pos + 3
  JOIN tokp t4 ON t0.doc_id = t4.doc_id AND t4.pos = t0.pos + 4
),
sz AS (SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE round(i * 1.0 / (sa.size + sb.size - i), 4) >= 0.6
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u FROM edges),
reach(src, dst) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
)
SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS group_keeper
FROM reach GROUP BY src
ORDER BY group_keeper, doc_id
""",
        "simhash_pairs": f"""
WITH {_TOKS},
{_simhash_fp_sql().strip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp::BIGINT, b.fp::BIGINT)) <= 3
ORDER BY doc_a, doc_b
""",
        "bigram_counts": """
WITH toksb AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1]))
           AS bigram
  FROM toksb
)
SELECT bigram, count(*)::BIGINT AS cf, count(DISTINCT doc_id)::BIGINT AS df
FROM pairs GROUP BY bigram
ORDER BY cf DESC, bigram ASC LIMIT 100
""",
        "fingerprints": f"""
WITH {_TOKS_POS},
th AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(term), 1, 8))::UBIGINT AS h
  FROM tokp
),
win AS (
  SELECT t.doc_id, t.pos, n.n,
         (( {" + ".join(
             f"coalesce(lead(t.h, {j}) OVER w, 0)::HUGEINT"
             f" * {c}::HUGEINT" for j, c in enumerate(_fp_coeffs(8))
         )}
         ) % {_U64}::HUGEINT) AS wh
  FROM th t
  JOIN (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id) n USING (doc_id)
  WINDOW w AS (PARTITION BY t.doc_id ORDER BY t.pos)
),
fp0 AS (
  SELECT doc_id, min(wh) AS fp
  FROM win
  WHERE (n >= 8 AND pos <= n - 7) OR (n < 8 AND pos = 1)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(f.fp, 0::HUGEINT) % {1 << 63}::HUGEINT AS BIGINT)
         AS fingerprint
FROM documents d LEFT JOIN fp0 f USING (doc_id)
ORDER BY d.doc_id
""",
        "langid": f"""
WITH {_TOKS},
sc AS (
  SELECT doc_id,
{",".join(
    f"         sum(CASE WHEN term IN {tuple(words)!r} THEN 1 ELSE 0 END)"
    f" AS s_{lang}" for lang, words in _LANG_MARKERS_SQL.items()
)}
  FROM toks2 GROUP BY doc_id
)
SELECT d.doc_id, d.lang AS lang_true,
       CASE
         WHEN greatest({", ".join(
             f"coalesce(s_{lang}, 0)" for lang in _LANG_MARKERS_SQL
         )}) = 0 THEN 'und'
{"".join(
    f"         WHEN coalesce(s_{lang}, 0) = greatest("
    + ", ".join(f"coalesce(s_{x}, 0)" for x in _LANG_MARKERS_SQL)
    + f") THEN '{lang}'" + chr(10) for lang in _LANG_MARKERS_SQL
)}       END AS lang_guess
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY d.doc_id
""",
        "code_index_stats": f"""
WITH {_TOKS},
cstats AS (
  SELECT count(DISTINCT term) AS content_terms,
         count(*) AS content_tokens,
         (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM toks2))
           AS content_postings
  FROM toks2
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT CAST(n.n_docs AS BIGINT)                          AS num_docs,
       CAST(1 AS BIGINT)                                 AS num_epochs,
       CAST(c.content_tokens AS BIGINT)                  AS total_tokens_content,
       CAST(n.n_docs AS BIGINT)                          AS total_tokens_path,
       round(c.content_tokens * 1.0 / n.n_docs, 6)       AS avgdl_content,
       CAST(c.content_terms + n.n_docs AS BIGINT)        AS n_terms,
       CAST(c.content_postings + n.n_docs AS BIGINT)     AS n_postings,
       CAST(8 AS BIGINT)                                 AS num_parts,
       CAST(0 AS BIGINT)                                 AS hot_terms
FROM cstats c, n
""",
        "hybrid_rrf": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES {", ".join(f"('{t}')" for t in _BM25_QUERY_TERMS)}) AS q(term)),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
lex AS (
  -- membership of the top-100 is decided on unrounded scores, but the
  -- published list (and so the RRF rank) orders by the ROUNDED score —
  -- mirroring bm25_topk's 4dp output contract
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS r
  FROM (SELECT * FROM scores ORDER BY score DESC, doc_id LIMIT 100)
),
rex AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r
  FROM documents WHERE regexp_matches(text, '{_REGEX_PATTERN}')
),
fused AS (
  SELECT coalesce(lex.doc_id, rex.doc_id) AS doc_id,
         coalesce(1.0 / (60 + lex.r), 0) + coalesce(1.0 / (60 + rex.r), 0)
           AS rrf
  FROM lex FULL OUTER JOIN rex USING (doc_id)
)
SELECT doc_id, round(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 20
""",
        "multimodal_features": """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(('0x' || substr(sha256(text), 1, 2))::UBIGINT
            + 256 * ('0x' || substr(sha256(text), 3, 2))::UBIGINT
            AS BIGINT) AS feat0_u16
FROM documents ORDER BY doc_id
""",
        # nearest-neighbor resize over the synthetic raster (row-major
        # bytes at width 64, zero-padded): out pixel (r,c) reads byte
        # (r*in_h)//8 * 64 + (c*64)//8; ASCII corpus => ord == byte
        "image_resize_nn": """
WITH d AS (
  SELECT doc_id, text, strlen(text) AS n,
         greatest(1, CAST(ceil(strlen(text) / 64.0) AS BIGINT)) AS in_h
  FROM documents
),
cells AS (
  SELECT r.range AS r, c.range AS c FROM range(8) r, range(8) c
),
px AS (
  SELECT d.doc_id, d.n, cells.r, cells.c,
         CASE WHEN ((cells.r * d.in_h) // 8) * 64 + ((cells.c * 64) // 8)
                   < d.n
              THEN ord(substr(
                     d.text,
                     CAST(((cells.r * d.in_h) // 8) * 64
                          + ((cells.c * 64) // 8) + 1 AS BIGINT),
                     1))
              ELSE 0 END AS v
  FROM d, cells
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_bytes,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(sum(CASE WHEN r = 0 AND c = 0 THEN v ELSE 0 END) AS BIGINT)
         AS px00,
       CAST(sum(CASE WHEN r = 7 AND c = 7 THEN v ELSE 0 END) AS BIGINT)
         AS px77
FROM px GROUP BY doc_id ORDER BY doc_id
""",
        # stride frame sampling: 256-byte frames, keep every 4th; md5 of
        # the exact frame bytes proves the slicing
        "video_frame_sample": """
WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
f AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT), 4)) AS frame_idx,
         n, text
  FROM d
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(least(256, n - frame_idx * 256) AS BIGINT) AS frame_bytes,
       substr(md5(substr(text, CAST(frame_idx * 256 + 1 AS BIGINT), 256)),
              1, 16) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
""",
        # batched ANN: same exact cosine, four queries at once; query_id
        # is the query's source vec_id
        "ann_multi_topk": """
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id < 4
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS score
  FROM embeddings e, qs q
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rn
  FROM sims
)
SELECT CAST(query_id AS BIGINT) AS query_id, vec_id,
       round(score, 4) AS score
FROM ranked WHERE rn <= 10 ORDER BY query_id, vec_id
""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS score
  FROM embeddings e, q
),
topk AS (SELECT * FROM sims ORDER BY score DESC, vec_id LIMIT 10)
SELECT vec_id, round(score, 4) AS score FROM topk
ORDER BY topk.score DESC, vec_id
""",
        # IVF with the hyperplane coarse quantizer: cell = sign bits of
        # the first 4 dims, probe = cells within Hamming distance 1 of
        # the query's cell, exact cosine over the probed subset only —
        # a pure function of the data, so hash-exact.
        "ann_ivf_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qc AS (SELECT (CASE WHEN qe[1] > 0 THEN 1 ELSE 0 END
             + CASE WHEN qe[2] > 0 THEN 2 ELSE 0 END
             + CASE WHEN qe[3] > 0 THEN 4 ELSE 0 END
             + CASE WHEN qe[4] > 0 THEN 8 ELSE 0 END)::BIGINT AS c FROM q),
cells AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)::BIGINT AS c
  FROM embeddings
),
sims AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS score
  FROM cells e, q, qc
  WHERE bit_count(xor(e.c, qc.c)) <= 1
),
topk AS (SELECT * FROM sims ORDER BY score DESC, vec_id LIMIT 10)
SELECT vec_id, round(score, 4) AS score FROM topk
ORDER BY topk.score DESC, vec_id
""",
        # The semantic path, replicated term-for-term: line-window chunks
        # -> tantivy tokenizer -> FNV-1a 64 over utf-8 bytes (recursive
        # CTE; mod-2^64 products via HUGEINT) -> splitmix column mixing
        # (the 64x64 multiply split into 32-bit halves to stay inside
        # HUGEINT) -> EXACT dyadic sums in DOUBLE -> float32-rounded unit
        # vectors -> double cosine. The engine accumulates in float64
        # over exact multiples of 2^-15, so both sides compute identical
        # embeddings regardless of summation order.
        "semantic_topk": """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
        CASE WHEN text = '' THEN 0 ELSE len(string_split(text, chr(10)))
          - CASE WHEN text LIKE '%' || chr(10) THEN 1 ELSE 0 END END AS n
      FROM documents),
chunks AS (
  SELECT doc_id, CAST(s/16 AS BIGINT) AS chunk_id,
         array_to_string(ls[s+1:least(s+20,n)], chr(10)) AS ctext
  FROM d, unnest(generate_series(0, greatest(n-1,0), 16)) AS g(s)
  WHERE n > 0 AND (s = 0 OR s + 4 < n)
),
ctoks AS (
  SELECT doc_id, chunk_id, term, count(*) AS tf FROM (
    SELECT doc_id, chunk_id,
           unnest(regexp_split_to_array(lower(ctext), '[^a-z0-9]+')) AS term
    FROM chunks) WHERE term <> '' AND length(term) < 40
  GROUP BY 1, 2, 3
),
qtoks AS (SELECT term, 1 AS tf
          FROM (VALUES ('merge'),('window'),('batch'),('stream')) q(term)),
vocab AS (SELECT DISTINCT term
          FROM (SELECT term FROM ctoks UNION ALL SELECT term FROM qtoks)),
fnv AS (
  SELECT term, to_hex(encode(term)) AS hx, octet_length(encode(term)) AS nb,
         0 AS i, CAST(4953163356653287321 AS UBIGINT) AS h
  FROM vocab
  UNION ALL
  SELECT term, hx, nb, i + 1,
         CAST((xor(h, ('0x' || substr(hx, 2*i+1, 2))::UBIGINT)::HUGEINT
               * 1099511628211) % 18446744073709551616 AS UBIGINT)
  FROM fnv WHERE i < nb
),
th AS (SELECT term, h FROM fnv WHERE i = nb),
cols AS (SELECT unnest(generate_series(0, 63)) AS c),
m0 AS (SELECT t.term, cols.c,
         xor(t.h, CAST((cols.c::HUGEINT * 11400714819323198485)
                       % 18446744073709551616 AS UBIGINT)) AS x
       FROM th t, cols),
m1 AS (SELECT term, c, xor(x, x >> 33) AS x FROM m0),
m2 AS (SELECT term, c,
         CAST(((x::HUGEINT * 3981806797)
              + ((((x % 4294967296)::HUGEINT * 4283543511) % 4294967296)
                 * 4294967296)) % 18446744073709551616 AS UBIGINT) AS x
       FROM m1),
m3 AS (SELECT term, c, xor(x, x >> 33) AS x FROM m2),
vals AS (SELECT term, c, ((x & 65535)::DOUBLE / 32768.0) - 1.0 AS v FROM m3),
cemb AS (SELECT doc_id, chunk_id, c, sum(t.tf * v.v) AS e
         FROM ctoks t JOIN vals v USING (term) GROUP BY 1, 2, 3),
cnorm AS (SELECT doc_id, chunk_id, sqrt(sum(e*e)) AS nr
          FROM cemb GROUP BY 1, 2),
cunit AS (SELECT doc_id, chunk_id, c,
            CAST(CAST(e / greatest(nr, 1e-12) AS FLOAT) AS DOUBLE) AS u
          FROM cemb JOIN cnorm USING (doc_id, chunk_id)),
qemb AS (SELECT c, sum(q.tf * v.v) AS e
         FROM qtoks q JOIN vals v USING (term) GROUP BY 1),
qnorm AS (SELECT sqrt(sum(e*e)) AS nr FROM qemb),
qunit AS (SELECT c, CAST(CAST(e / greatest(nr, 1e-12) AS FLOAT) AS DOUBLE) AS u
          FROM qemb, qnorm),
sc AS (SELECT doc_id, chunk_id, sum(cu.u * qu.u) AS s
       FROM cunit cu JOIN qunit qu USING (c) GROUP BY 1, 2),
topk AS (SELECT * FROM sc ORDER BY s DESC, doc_id, chunk_id LIMIT 20)
SELECT CAST(doc_id AS BIGINT) AS doc_id, chunk_id, round(s, 4) AS score
FROM topk ORDER BY round(s, 4) DESC, doc_id, chunk_id
""",
        # eval set = docs with doc_id % 17 = 0; a corpus doc is
        # contaminated iff it shares any distinct token 5-gram with it
        "decontaminate": f"""
WITH {_TOKS_POS},
{_shingle_cte(5, distinct=True).strip()},
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
sz AS (
  SELECT doc_id, count(*) AS n_shingles FROM sh
  WHERE doc_id % 17 <> 0 GROUP BY doc_id
),
hits AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM sh JOIN ev USING (s)
  WHERE doc_id % 17 <> 0 GROUP BY doc_id
)
SELECT h.doc_id,
       CAST(h.n_overlap AS BIGINT) AS n_overlap,
       CAST(z.n_shingles AS BIGINT) AS n_shingles,
       round(h.n_overlap * 1.0 / z.n_shingles, 4) AS overlap_frac
FROM hits h JOIN sz z USING (doc_id)
ORDER BY doc_id
""",
        # per-doc positions whose 5-gram occurs in >= 2 DISTINCT docs
        "dup_ngram_spans": f"""
WITH {_TOKS_POS},
{_shingle_cte(5, distinct=False).strip()},
per AS (SELECT doc_id, s, count(*) AS cnt FROM sh GROUP BY 1, 2),
df AS (SELECT s, count(DISTINCT doc_id) AS df FROM sh GROUP BY s)
SELECT p.doc_id,
       CAST(sum(p.cnt) AS BIGINT) AS total_ngrams,
       CAST(sum(CASE WHEN d.df >= 2 THEN p.cnt ELSE 0 END) AS BIGINT)
         AS dup_ngrams,
       round(sum(CASE WHEN d.df >= 2 THEN p.cnt ELSE 0 END) * 1.0
             / sum(p.cnt), 4) AS dup_frac
FROM per p JOIN df d USING (s)
GROUP BY p.doc_id ORDER BY p.doc_id
""",
        "stratified_sample": _stratified_sample_sql(),
        # longest md5-key-ordered prefix of docs whose cumulative token
        # count stays within the budget
        "token_budget_sample": f"""
WITH {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
tc AS (
  SELECT d.doc_id, coalesce(dl.dl, 0) AS n_tokens, {_MD5_DOCKEY} AS key
  FROM documents d LEFT JOIN dl USING (doc_id)
),
cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING
         ) AS c
  FROM tc
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM cum WHERE c <= {_token_budget()} ORDER BY doc_id
""",
        # the composed pipeline: near-dup keepers (recursive closure over
        # exact 5-gram Jaccard >= 0.6 — subsumes exact dedup at J = 1) ->
        # eval holdout + decontamination -> stratified sample -> source
        # quota ranked among SURVIVORS
        "corpus_clean": f"""
WITH RECURSIVE {_TOKS_POS.strip().lstrip()},
{_shingle_cte(5, distinct=True).strip()},
sz AS (SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE round(i * 1.0 / (sa.size + sb.size - i), 4) >= 0.6
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u FROM edges),
reach(src, dst) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
),
losers AS (
  SELECT src AS doc_id FROM reach GROUP BY src
  HAVING src <> min(dst)
),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 0),
cont AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (s)
  WHERE sh.doc_id % 17 <> 0
),
surv AS (
  SELECT d.doc_id, d.lang, d.source FROM documents d
  WHERE d.doc_id % 17 <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM losers)
    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
    AND {_stratified_pred_sql()}
),
ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY source ORDER BY {_MD5_DOCKEY}, doc_id
         ) AS rnk
  FROM surv
)
SELECT doc_id, lang, source FROM ranked WHERE rnk <= 12 ORDER BY doc_id
""",
        "source_quota_cap": f"""
WITH k AS (
  SELECT doc_id, source, {_MD5_DOCKEY} AS key FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY key, doc_id)
           AS rnk
  FROM k
)
SELECT doc_id, source, CAST(rnk AS BIGINT) AS "rank"
FROM r WHERE rnk <= 12 ORDER BY doc_id
""",
        # collocations: PMI over adjacent token bigrams, floored to
        # integer micro-nats; one closed-form libm expression per top-N
        # row on both sides (no float summation anywhere)
        "bigram_pmi": f"""
WITH {_TOKS_POS},
ow AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM tokp
),
bg AS (
  SELECT o1.term || ' ' || o2.term AS bigram, o1.term AS a, o2.term AS b
  FROM ow o1 JOIN ow o2 ON o1.doc_id = o2.doc_id AND o2.rn = o1.rn + 1
),
cfab AS (
  SELECT bigram, min(a) AS a, min(b) AS b, count(*) AS cfab
  FROM bg GROUP BY bigram
),
cf AS (SELECT term, count(*) AS cf FROM tokp GROUP BY term),
tot AS (SELECT count(*) AS t FROM tokp),
btot AS (SELECT count(*) AS b FROM bg),
top AS (
  SELECT bigram, a, b, cfab FROM cfab
  ORDER BY cfab DESC, bigram ASC LIMIT 100
)
SELECT t0.bigram, CAST(t0.cfab AS BIGINT) AS cf,
       CAST(floor(ln(
         (t0.cfab::DOUBLE / btot.b)
         / ((ca.cf::DOUBLE / tot.t) * (cb.cf::DOUBLE / tot.t))
       ) * 1000000) AS BIGINT) AS pmi_e6
FROM top t0
JOIN cf ca ON ca.term = t0.a
JOIN cf cb ON cb.term = t0.b
CROSS JOIN tot CROSS JOIN btot
ORDER BY cf DESC, bigram ASC
""",
        # Gopher-style in-doc repetition signals: max token count, max
        # bigram count, trigram positions occurring >= 2x — all ints
        "repetition_stats": f"""
WITH {_TOKS_POS},
ow AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM tokp
),
topw AS (
  SELECT doc_id, max(c) AS twc FROM (
    SELECT doc_id, term, count(*) AS c FROM tokp GROUP BY doc_id, term
  ) GROUP BY doc_id
),
bg AS (
  SELECT o1.doc_id, o1.term || ' ' || o2.term AS b
  FROM ow o1 JOIN ow o2 ON o1.doc_id = o2.doc_id AND o2.rn = o1.rn + 1
),
topb AS (
  SELECT doc_id, max(c) AS tbc FROM (
    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
  ) GROUP BY doc_id
),
tg AS (
  SELECT o1.doc_id, o1.term || ' ' || o2.term || ' ' || o3.term AS g
  FROM ow o1
  JOIN ow o2 ON o2.doc_id = o1.doc_id AND o2.rn = o1.rn + 1
  JOIN ow o3 ON o3.doc_id = o1.doc_id AND o3.rn = o1.rn + 2
),
dupt AS (
  SELECT doc_id, sum(c) AS dtp FROM (
    SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g
  ) WHERE c >= 2 GROUP BY doc_id
),
nt AS (SELECT doc_id, count(*) AS n FROM tokp GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(nt.n, 0) AS BIGINT)    AS n_tokens,
       CAST(coalesce(topw.twc, 0) AS BIGINT) AS top_word_count,
       CAST(coalesce(topb.tbc, 0) AS BIGINT) AS top_bigram_count,
       CAST(coalesce(dupt.dtp, 0) AS BIGINT) AS dup_trigram_positions
FROM documents d
LEFT JOIN nt USING (doc_id)
LEFT JOIN topw USING (doc_id)
LEFT JOIN topb USING (doc_id)
LEFT JOIN dupt USING (doc_id)
ORDER BY d.doc_id
""",
        # per-doc top-3 terms by tf * ln(N/df); ties: score desc, term asc
        "tfidf_top_terms": f"""
WITH {_TOKS},
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term
),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(n.n::DOUBLE / df.df) AS s,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(n.n::DOUBLE / df.df) DESC, tf.term ASC
         ) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rnk AS BIGINT) AS "rank", term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(s, 4) AS score
FROM scored WHERE rnk <= 3 ORDER BY doc_id, rnk
""",
        # distributed anti-join: customers with no orders on/after the
        # cutoff (churn shape); both sides co-partition on custkey
        "churned_customers": """
SELECT c.c_custkey, c.c_name, c.c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= DATE '2000-01-01'
)
ORDER BY c.c_custkey
""",
        # global sort proof: the engine's sampled-range sort must place
        # every row at exactly the rank row_number() assigns; the stride
        # sample (step = max(1, n // 200)) is hash-compared
        "orders_sorted_ranks": """
WITH k AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
),
n AS (SELECT greatest(1, count(*) // 200) AS step FROM k),
r AS (
  SELECT o_orderkey, price_c,
         row_number() OVER (ORDER BY price_c, o_orderkey) AS rn
  FROM k
)
SELECT CAST(rn AS BIGINT) AS rn,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       price_c
FROM r, n WHERE rn % n.step = 0 ORDER BY rn
""",
        # distributed EXISTS semi-join between two fact tables (TPC-H q4
        # shape); lineitem pre-aggregates to per-order max shipdate
        "late_ship_priority_counts": """
SELECT o.o_orderpriority, count(*) AS late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate
)
GROUP BY 1 ORDER BY 1
""",
        # unigram-LM surprisal: per-term log-probs floored to integer
        # micro-nats BEFORE the per-doc sum, so the score is an exact
        # BIGINT on both sides (floor has no tie rule; ln is libm both
        # sides)
        # count-min sketch (d=4 x w=4096), all-integer: the four row
        # indexes are disjoint 12-bit md5 hex slices, cells are plain
        # sums, the estimate is min over rows — replicated cell-for-cell
        "cms_term_counts": f"""
WITH {_TOKS},
cf AS (SELECT term, count(*) AS cf FROM toks2 GROUP BY term),
top AS (SELECT term, cf FROM cf ORDER BY cf DESC, term LIMIT 20),
sl AS (SELECT term, r,
              ('0x' || substr(md5(term), 1 + 3 * r, 3))::BIGINT AS idx
       FROM cf CROSS JOIN (VALUES (0), (1), (2), (3)) AS rows(r)),
cells AS (SELECT s.r, s.idx, sum(c.cf) AS cell
          FROM sl s JOIN cf c USING (term) GROUP BY s.r, s.idx),
est AS (SELECT t.term, t.cf, min(ce.cell) AS cms_cf
        FROM top t
        JOIN sl s USING (term)
        JOIN cells ce ON ce.r = s.r AND ce.idx = s.idx
        GROUP BY t.term, t.cf)
SELECT term, CAST(cf AS BIGINT) AS cf, CAST(cms_cf AS BIGINT) AS cms_cf
FROM est ORDER BY cf DESC, term
""",
        # HyperLogLog distinct-term sketch, replicated register-for-
        # register: md5-u64 token hash, j = top 12 bits, rho = 53 -
        # bit_length of the low 52 (bin() is minimal-width, so
        # length(bin(w)) IS bit_length); S2 = sum 2^(53-rho) stays an
        # exact HUGEINT and the estimate is one closed-form double
        # expression floored to micro-counts (the bigram_pmi trick).
        # The '*' row is the merged (elementwise-max) corpus sketch.
        "approx_distinct_terms": f"""
WITH {_TOKS},
tl AS (SELECT DISTINCT d.lang, t.term
       FROM toks2 t JOIN documents d USING (doc_id)),
hh AS (SELECT lang,
              ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM tl),
ww AS (SELECT lang, CAST(h >> 52 AS BIGINT) AS j,
              (h & 4503599627370495::UBIGINT) AS w FROM hh),
reg AS (SELECT lang, j,
               max(CASE WHEN w = 0::UBIGINT THEN 53
                        ELSE 53 - length(bin(w)) END) AS rho
        FROM ww GROUP BY lang, j),
regu AS (SELECT * FROM reg
         UNION ALL
         SELECT '*' AS lang, j, max(rho) FROM reg GROUP BY j),
agg AS (SELECT lang, count(*) AS nset,
               sum((1::HUGEINT << CAST(53 - rho AS INTEGER))) AS s_hit
        FROM regu GROUP BY lang),
est AS (SELECT lang, nset,
               s_hit + (4096 - nset)::HUGEINT * (1::HUGEINT << 53) AS s2,
               4096 - nset AS v
        FROM agg)
SELECT lang, CAST(nset AS BIGINT) AS registers_set,
  CASE WHEN ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
             * 9007199254740992.0 / CAST(s2 AS DOUBLE)) <= 10240.0
            AND v > 0
       THEN CAST(floor((4096.0 * ln(4096.0 / v)) * 1000000.0) AS BIGINT)
       ELSE CAST(floor(((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0
                        * 4096.0 * 9007199254740992.0
                        / CAST(s2 AS DOUBLE)) * 1000000.0) AS BIGINT)
  END AS approx_distinct_e6
FROM est ORDER BY lang
""",
        "unigram_logprob": f"""
WITH {_TOKS},
cf AS (SELECT term, count(*) AS cf FROM toks2 GROUP BY term),
tot AS (SELECT count(*) AS t FROM toks2),
lp AS (
  SELECT term,
         CAST(floor(ln(cf::DOUBLE / t) * 1000000) AS BIGINT) AS lp6
  FROM cf CROSS JOIN tot
),
per AS (
  SELECT tk.doc_id, count(*) AS n, -sum(l.lp6) AS nll
  FROM toks2 tk JOIN lp l USING (term) GROUP BY tk.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(per.nll, 0) AS BIGINT) AS nll_e6
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
""",
        # order-3 interpolated KN: same exact-micro-nat contract; the
        # whole lower-order chain derives from the trigram TYPE table
        "kn_trigram_logprob": f"""
WITH {_TOKS_POS},
tri AS (
  SELECT t1.doc_id, t1.term AS a, t2.term AS b, t3.term AS c
  FROM tokp t1
  JOIN tokp t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  JOIN tokp t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
),
cabc AS (SELECT a, b, c, count(*) AS cabc FROM tri GROUP BY 1, 2, 3),
ctx AS (SELECT a, b, sum(cabc) AS cab, count(*) AS n1ab
        FROM cabc GROUP BY 1, 2),
kbc AS (SELECT b, c, count(*) AS nbc FROM cabc GROUP BY 1, 2),
kb AS (SELECT b, sum(nbc) AS nbdot, count(*) AS n1bs
       FROM kbc GROUP BY 1),
kc AS (SELECT c, count(*) AS nc FROM kbc GROUP BY 1),
ktot AS (SELECT count(*) AS ntc FROM kbc),
lp AS (
  SELECT cabc.a, cabc.b, cabc.c,
         CAST(floor(ln(
           (greatest(cabc.cabc::DOUBLE - 0.75, 0.0)
            + 0.75 * ctx.n1ab
              * ((greatest(kbc.nbc::DOUBLE - 0.75, 0.0)
                  + 0.75 * kb.n1bs * (kc.nc::DOUBLE / ktot.ntc))
                 / kb.nbdot))
           / ctx.cab) * 1000000) AS BIGINT) AS lp6
  FROM cabc
  JOIN ctx USING (a, b)
  JOIN kbc USING (b, c)
  JOIN kb USING (b)
  JOIN kc USING (c)
  CROSS JOIN ktot
),
per AS (
  SELECT tri.doc_id, count(*) AS n, -sum(lp.lp6) AS nll
  FROM tri
  JOIN lp ON tri.a = lp.a AND tri.b = lp.b AND tri.c = lp.c
  GROUP BY tri.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_trigrams,
       CAST(coalesce(per.nll, 0) AS BIGINT) AS nll_e6
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
""",
        # interpolated Kneser-Ney bigram LM: P(b|a) = max(c_ab - D,0)/c_a
        # + D*N1+(a,*)/c_a * N1+(*,b)/N1+(*,*), D=0.75; adjacency over
        # the contiguous kept-token positions; per-TYPE logprob floored
        # to micro-nats before the per-doc integer sum (exact BIGINTs)
        "kn_bigram_logprob": f"""
WITH {_TOKS_POS},
big AS (
  SELECT t1.doc_id, t1.term AS a, t2.term AS b
  FROM tokp t1
  JOIN tokp t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
),
cab AS (SELECT a, b, count(*) AS cab FROM big GROUP BY a, b),
ctx AS (SELECT a, sum(cab) AS ca, count(*) AS n1a FROM cab GROUP BY a),
suc AS (SELECT b, count(*) AS n1b FROM cab GROUP BY b),
tot AS (SELECT count(*) AS n1 FROM cab),
lp AS (
  SELECT cab.a, cab.b,
         CAST(floor(ln(
           (greatest(cab.cab::DOUBLE - 0.75, 0.0)
            + 0.75 * ctx.n1a * (suc.n1b::DOUBLE / tot.n1))
           / ctx.ca) * 1000000) AS BIGINT) AS lp6
  FROM cab JOIN ctx USING (a) JOIN suc USING (b) CROSS JOIN tot
),
per AS (
  SELECT big.doc_id, count(*) AS n, -sum(lp.lp6) AS nll
  FROM big JOIN lp ON big.a = lp.a AND big.b = lp.b
  GROUP BY big.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per.nll, 0) AS BIGINT) AS nll_e6
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
""",
        # CCNet head/middle/tail: per-lang terciles of mean token
        # surprisal (nll_e6 // n_tokens, the unigram_logprob BIGINTs);
        # integer tercile rule 3*rank <= n / 2n, no percentile floats
        "ccnet_buckets": f"""
WITH {_TOKS},
cf AS (SELECT term, count(*) AS cf FROM toks2 GROUP BY term),
tot AS (SELECT count(*) AS t FROM toks2),
lp AS (
  SELECT term,
         CAST(floor(ln(cf::DOUBLE / t) * 1000000) AS BIGINT) AS lp6
  FROM cf CROSS JOIN tot
),
per AS (
  SELECT tk.doc_id, count(*) AS n, -sum(l.lp6) AS nll
  FROM toks2 tk JOIN lp l USING (term) GROUP BY tk.doc_id
),
sig AS (
  SELECT d.doc_id, d.lang,
         CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN coalesce(per.n, 0) > 0
                   THEN per.nll // per.n ELSE 0 END AS BIGINT) AS nll_q
  FROM documents d LEFT JOIN per USING (doc_id)
),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang ORDER BY nll_q, doc_id)
           AS rank_in_lang,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM sig
)
SELECT doc_id, lang, n_tokens, nll_q,
       CAST(rank_in_lang AS BIGINT) AS rank_in_lang,
       CAST(n_lang AS BIGINT) AS n_lang,
       CASE WHEN 3 * rank_in_lang <= n_lang THEN 'head'
            WHEN 3 * rank_in_lang <= 2 * n_lang THEN 'middle'
            ELSE 'tail' END AS bucket
FROM rk
ORDER BY doc_id
""",
        # greedy per-source sequence packing under a 128-token budget;
        # the recursive CTE replays the sequential fill row by row
        "pack_sequences": f"""
WITH RECURSIVE {_TOKS},
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
nt AS (
  SELECT d.doc_id, d.source, CAST(coalesce(dl.dl, 0) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
           AS rn
  FROM documents d LEFT JOIN dl USING (doc_id)
),
pack AS (
  SELECT doc_id, source, n, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_offset
  FROM nt WHERE rn = 1
  UNION ALL
  SELECT nt.doc_id, nt.source, nt.n, nt.rn,
         CASE WHEN p.seq_offset + p.n + nt.n > 128
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.seq_offset + p.n + nt.n > 128
              THEN CAST(0 AS BIGINT) ELSE p.seq_offset + p.n END
  FROM pack p JOIN nt ON nt.source = p.source AND nt.rn = p.rn + 1
)
SELECT doc_id, source, n AS n_tokens, seq_id, seq_offset
FROM pack ORDER BY doc_id
""",
        # span-level dedup WRITER: drop tokens covered by a cross-doc
        # duplicate 5-gram; scrub_key = first 60 bits of md5(rewritten
        # text) proves the rewrite itself, not just the counts
        # CCNet line-hash dedup writer: lines = 7-token wrap (+ the
        # deterministic doc_id%4 boilerplate plant, replicated here);
        # drop every line with corpus-wide count >= 3; scrub_key = 60
        # md5 bits of the kept lines in original order
        "line_dedup_scrub": """
WITH wrapped AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\\S+ ){6}\\S+) ', '\\1' || chr(10), 'g') AS w
  FROM documents
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN w || chr(10) || 'nav bar boilerplate '
                     || CAST(doc_id % 3 AS VARCHAR)
              ELSE w END AS w
  FROM wrapped
),
lin AS (
  SELECT doc_id,
         generate_subscripts(string_split(w, chr(10)), 1) AS pos,
         unnest(string_split(w, chr(10))) AS line
  FROM planted
),
hot AS (SELECT line FROM lin GROUP BY line HAVING count(*) >= 3),
kept AS (SELECT doc_id, pos, line FROM lin
         WHERE line NOT IN (SELECT line FROM hot)),
nl AS (SELECT doc_id, count(*) AS n_lines FROM lin GROUP BY doc_id),
ka AS (SELECT doc_id, count(*) AS kept_lines,
              string_agg(line, chr(10) ORDER BY pos) AS s
       FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CAST(nl.n_lines AS BIGINT) AS n_lines,
       CAST(nl.n_lines - coalesce(ka.kept_lines, 0) AS BIGINT)
         AS removed_lines,
       CAST(coalesce(ka.kept_lines, 0) AS BIGINT) AS kept_lines,
       CAST(('0x' || substr(md5(coalesce(ka.s, '')), 1, 15))::UBIGINT
            AS BIGINT) AS scrub_key
FROM documents d
JOIN nl USING (doc_id)
LEFT JOIN ka USING (doc_id)
ORDER BY d.doc_id
""",
        # DSIR importance weights (Xie et al. 2023): hashed unigram +
        # bigram features (md5-u64 % 4096), target = lang='en' docs vs
        # the raw corpus, add-1 smoothing; per-bucket log-ratio floored
        # to micro-nats so the per-doc sum is an exact BIGINT
        "dsir_weights": """
WITH toksb AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
grams AS (
  SELECT doc_id, unnest(a) AS g FROM toksb
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1]))
           AS g
  FROM toksb
),
gb AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(g), 1, 16))::UBIGINT % 4096 AS BIGINT)
           AS bucket
  FROM grams
),
tgt AS (
  SELECT bucket, count(*)::BIGINT AS c FROM gb
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY bucket
),
rawc AS (SELECT bucket, count(*)::BIGINT AS c FROM gb GROUP BY bucket),
tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tgt) AS t_tot,
         (SELECT coalesce(sum(c), 0) FROM rawc) AS r_tot
),
lam AS (
  SELECT b.bucket,
         CAST(floor((ln((coalesce(t.c, 0) + 1)::DOUBLE
                         / (tot.t_tot + 4096)::DOUBLE)
                   - ln((coalesce(r.c, 0) + 1)::DOUBLE
                         / (tot.r_tot + 4096)::DOUBLE)) * 1e6) AS BIGINT)
           AS lam_e6
  FROM (SELECT unnest(range(4096)) AS bucket) b
  LEFT JOIN tgt t USING (bucket)
  LEFT JOIN rawc r USING (bucket), tot
)
SELECT gb.doc_id,
       count(*)::BIGINT AS n_grams,
       sum(lam.lam_e6)::BIGINT AS dsir_e6
FROM gb JOIN lam USING (bucket)
GROUP BY gb.doc_id
ORDER BY gb.doc_id
""",
        "dup_span_scrub": f"""
WITH {_TOKS_POS},
shp AS (
  SELECT t0.doc_id, t0.pos,
         {" || chr(1) || ".join(f"t{j}.term" for j in range(5))} AS s
  FROM tokp t0{"".join(
      f" JOIN tokp t{j} ON t0.doc_id = t{j}.doc_id"
      f" AND t{j}.pos = t0.pos + {j}" for j in range(1, 5))}
),
df AS (SELECT s, count(DISTINCT doc_id) AS df FROM shp GROUP BY s),
dup AS (
  SELECT p.doc_id, p.pos FROM shp p JOIN df USING (s) WHERE df.df >= 2
),
cov AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM tokp t JOIN dup d ON d.doc_id = t.doc_id
   AND t.pos BETWEEN d.pos AND d.pos + 4
),
kept AS (
  SELECT t.doc_id, t.pos, t.term
  FROM tokp t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
  WHERE c.pos IS NULL
),
ka AS (
  SELECT doc_id, count(*) AS kept_tokens,
         string_agg(term, ' ' ORDER BY pos) AS s
  FROM kept GROUP BY doc_id
),
nt AS (SELECT doc_id, count(*) AS n FROM tokp GROUP BY doc_id),
dp AS (SELECT doc_id, count(*) AS dps FROM dup GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(nt.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(dp.dps, 0) AS BIGINT) AS dup_positions,
       CAST(coalesce(nt.n, 0) - coalesce(ka.kept_tokens, 0) AS BIGINT)
         AS covered_tokens,
       CAST(coalesce(ka.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(('0x' || substr(md5(coalesce(ka.s, '')), 1, 15))::UBIGINT
            AS BIGINT) AS scrub_key
FROM documents d
LEFT JOIN nt USING (doc_id)
LEFT JOIN dp USING (doc_id)
LEFT JOIN ka USING (doc_id)
ORDER BY d.doc_id
""",
        # JSON scalar extraction (props ->> k) + grouped stats
        "events_props_stats": r"""
WITH x AS (
  SELECT event_type,
         CAST(nullif(regexp_extract(props, '"k":\s*(\d+)', 1), '')
              AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n, count(k)::BIGINT AS n_k,
       sum(k)::BIGINT AS sum_k, min(k)::BIGINT AS min_k,
       max(k)::BIGINT AS max_k
FROM x GROUP BY event_type ORDER BY event_type
""",
        # PII redaction writer: planted contact line derived from doc_id
        # (the synthetic docs carry no PII), counts on the pre-scrub text,
        # nested RE2 regexp_replace chain applied email -> phone -> ip;
        # scrub_key = 60 md5 bits of the rewritten text
        "pii_scrub": f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact user' || doc_id || '@example.com call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || ((doc_id // 65536) % 256)
              || '.' || ((doc_id // 256) % 256)
              || '.' || (doc_id % 256) || '.' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_pii_re("email")}')) AS BIGINT)
         AS n_email,
       CAST(len(regexp_extract_all(t, '{_pii_re("phone")}')) AS BIGINT)
         AS n_phone,
       CAST(len(regexp_extract_all(t, '{_pii_re("ip")}')) AS BIGINT)
         AS n_ip,
       CAST(('0x' || substr(md5(
         regexp_replace(regexp_replace(regexp_replace(
           t, '{_pii_re("email")}', '<EMAIL>', 'g'),
           '{_pii_re("phone")}', '<PHONE>', 'g'),
           '{_pii_re("ip")}', '<IP>', 'g')), 1, 15))::UBIGINT AS BIGINT)
         AS scrub_key
FROM aug ORDER BY doc_id
""",
        # unicode canonicalization writer: planted mess (BEL, decomposed
        # e+U+0301, space/tab runs) -> NFC -> strip C0/DEL -> collapse
        # [ \\t]+ -> trim; clean_key = 60 md5 bits of the cleaned text
        "unicode_clean": f"""
WITH aug AS (
  SELECT doc_id,
         nfc_normalize(text || chr(7) || ' caf' || chr(101) || chr(769)
              || '  id ' || doc_id || chr(9) || chr(9) || ' end ') AS t
  FROM documents
),
cl AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_CTRL_SQL}')) AS n_ctrl,
         regexp_replace(regexp_replace(regexp_replace(
           t, '{_CTRL_SQL}', '', 'g'), '[ \t]+', ' ', 'g'),
           '^ +| +$', '', 'g') AS s
  FROM aug
)
SELECT doc_id, CAST(n_ctrl AS BIGINT) AS n_ctrl,
       CAST(length(s) AS BIGINT) AS n_chars_clean,
       CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT AS BIGINT) AS clean_key
FROM cl ORDER BY doc_id
""",
        # percolator: each stored query of ops/percolate.STORED_QUERIES
        # replicated as set/position algebra over the same analyzer —
        # term membership (tset), adjacency join (phrase), INTERSECT/
        # EXCEPT for the boolean occurs, LIKE/BETWEEN/levenshtein/
        # regexp_full_match for the dictionary-expanded leaves
        "percolate_matches": f"""
WITH {_TOKS_POS},
tset AS (SELECT DISTINCT doc_id, term FROM tokp),
m AS (
  SELECT 'all_docs' AS query_name, doc_id FROM documents
  UNION ALL
  SELECT 'dup_and_merge', doc_id FROM (
    SELECT doc_id FROM tset WHERE term = 'dup'
    INTERSECT SELECT doc_id FROM tset WHERE term = 'merge')
  UNION ALL
  SELECT 'fuzzy_spark', doc_id FROM (
    SELECT DISTINCT doc_id FROM tset WHERE levenshtein(term, 'spark') <= 1)
  UNION ALL
  SELECT 'nested_bool', doc_id FROM (
    SELECT doc_id FROM tset WHERE term IN ('key', 'dup')
    INTERSECT SELECT doc_id FROM tset WHERE term = 'sort')
  UNION ALL
  SELECT 'phrase_key_order', doc_id FROM (
    SELECT DISTINCT a.doc_id AS doc_id
    FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'key' AND b.term = 'order')
  UNION ALL
  SELECT 'sloppy_dup_sort', doc_id FROM (
    SELECT DISTINCT c.doc_id AS doc_id FROM (
      SELECT a.doc_id, a.pos AS q0, min(b.pos) AS q1
      FROM tokp a JOIN tokp b
        ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.term = 'sort'
      WHERE a.term = 'dup'
      GROUP BY a.doc_id, a.pos) c
    WHERE c.q1 - c.q0 - 1 <= 2)
  UNION ALL
  SELECT 'prefix_win', doc_id FROM (
    SELECT DISTINCT doc_id FROM tset WHERE term LIKE 'win%')
  UNION ALL
  SELECT 'range_dup_merge', doc_id FROM (
    SELECT DISTINCT doc_id FROM tset
    WHERE term >= 'dup' AND term <= 'merge')
  UNION ALL
  SELECT 'regex_wnd', doc_id FROM (
    SELECT DISTINCT doc_id FROM tset
    WHERE regexp_full_match(term, 'w[io]nd.*'))
  UNION ALL
  SELECT 'set_rare', doc_id FROM (
    SELECT DISTINCT doc_id FROM tset
    WHERE term IN ('dup', 'flink', 'nosuchterm'))
  UNION ALL
  SELECT 'spark_not_dup', doc_id FROM (
    SELECT doc_id FROM tset WHERE term = 'spark'
    EXCEPT SELECT doc_id FROM tset WHERE term = 'dup')
)
SELECT query_name, doc_id FROM m ORDER BY query_name, doc_id
""",
        # SQ8: both sides quantized round(x*127/max|x|) in DOUBLE (the
        # exact arithmetic order the engine pins), ranked by the integer
        # code dot — no float in the compared columns
        "ann_sq8_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qs AS (SELECT qe,
         greatest(list_max(list_transform(qe, x -> abs(x::DOUBLE))), 1e-30) AS s
       FROM q),
qd AS (SELECT generate_subscripts(qe, 1) AS i,
              round(unnest(qe)::DOUBLE * 127 / s)::BIGINT AS cq
       FROM qs),
vs AS (SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 1e-30) AS s
       FROM embeddings),
vd AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              round(unnest(embedding)::DOUBLE * 127 / s)::BIGINT AS cv
       FROM vs),
dots AS (
  SELECT vec_id, CAST(sum(cq * cv) AS BIGINT) AS dot_int
  FROM vd JOIN qd USING (i) GROUP BY vec_id
),
scored AS (
  SELECT d.vec_id, d.dot_int,
         d.dot_int * qs.s * v.s / 16129.0 AS sc
  FROM dots d JOIN vs v USING (vec_id) CROSS JOIN qs
)
SELECT vec_id, dot_int, round(sc, 4) AS score FROM scored
ORDER BY sc DESC, vec_id LIMIT 10
""",
        # filtered knn: cosine top-k under a metadata predicate
        "ann_filtered_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS score
  FROM embeddings e, q WHERE e.label = 3
),
topk AS (SELECT * FROM sims ORDER BY score DESC, vec_id LIMIT 10)
SELECT vec_id, round(score, 4) AS score FROM topk
ORDER BY topk.score DESC, vec_id
""",
        # windowed funnel: exists-chain per stage (greedy-accept ==
        # exists-accept, so the SQL join form equals the engine kernel)
        "event_funnel": """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT 1 AS stage,
       CAST((SELECT count(DISTINCT user_id) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 2,
       (SELECT count(DISTINCT v.user_id) FROM v
        JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
              AND c.ts <= v.ts + INTERVAL 6 HOUR)
UNION ALL
SELECT 3,
       (SELECT count(DISTINCT v.user_id) FROM v
        JOIN c ON c.user_id = v.user_id AND c.ts > v.ts
        JOIN p ON p.user_id = v.user_id AND p.ts > c.ts
              AND p.ts <= v.ts + INTERVAL 6 HOUR)
ORDER BY stage
""",
        # span_near (unordered, 2 terms): min window = min |pa-pb|+1
        # over all position pairs; match iff min_window - 2 <= slop;
        # ranked by proximity. Tie-break and cut identical to engine.
        "bm25_span_near": f"""
WITH {_TOKS_POS},
a AS (SELECT doc_id, pos FROM tokp WHERE term = 'merge'),
b AS (SELECT doc_id, pos FROM tokp WHERE term = 'window'),
w AS (
  SELECT a.doc_id, CAST(min(abs(a.pos - b.pos) + 1) AS BIGINT) AS min_window
  FROM a JOIN b USING (doc_id) GROUP BY a.doc_id
)
SELECT doc_id, min_window FROM w
WHERE min_window - 2 <= 4
ORDER BY min_window, doc_id LIMIT 20
""",
        # composite agg: (lang, strlen//64*64) buckets of the
        # merge-OR-window match set, composite key order
        "bm25_composite_agg": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2 WHERE term IN ('merge', 'window'))
SELECT d.lang AS lang,
       CAST((strlen(d.text) // 64) * 64 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
""",
        # completion suggester: prefix terms by df desc, term asc
        "bm25_complete": f"""
WITH {_TOKS},
t AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM toks2 WHERE term LIKE 'me%' GROUP BY term
)
SELECT term, CAST(df AS BIGINT) AS df FROM t
ORDER BY df DESC, term LIMIT 15
""",
        # adjacency matrix: singleton + pairwise membership counts
        "bm25_adjacency_matrix": f"""
WITH {_TOKS},
tset AS (SELECT DISTINCT doc_id, term FROM toks2
         WHERE term IN ('merge', 'window', 'batch')),
singles AS (
  SELECT term AS key, count(*) AS doc_count FROM tset GROUP BY term
),
pairs AS (
  SELECT a.term || '&' || b.term AS key, count(*) AS doc_count
  FROM tset a JOIN tset b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1
),
allb AS (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
SELECT key, CAST(doc_count AS BIGINT) AS doc_count
FROM allb WHERE doc_count > 0 ORDER BY key
""",
        # rare_terms (exact): long-tail dictionary terms by live df
        "bm25_rare_terms": f"""
WITH {_TOKS},
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term)
SELECT term, df FROM df WHERE df <= 400 ORDER BY df, term LIMIT 20
""",
        # significant_text (JLH): fg = docs of the merge-AND-window
        # match set containing the term, bg = corpus df; identical
        # double expression (two divides, subtract, divide, multiply),
        # query's own terms excluded, min fg 3, shared 4dp rounding
        "bm25_significant_text": f"""
WITH {_TOKS},
m AS (
  SELECT doc_id FROM toks2 WHERE term = 'merge'
  INTERSECT SELECT doc_id FROM toks2 WHERE term = 'window'
),
fg AS (
  SELECT term, count(DISTINCT doc_id) AS c FROM toks2
  WHERE doc_id IN (SELECT doc_id FROM m) GROUP BY term
),
bg AS (SELECT term, count(DISTINCT doc_id) AS c FROM toks2 GROUP BY term),
tot AS (
  SELECT (SELECT count(*) FROM m) AS ft,
         (SELECT count(*) FROM documents) AS bt
),
scored AS (
  SELECT fg.term, fg.c AS fg_count, bg.c AS bg_count,
         (CAST(fg.c AS DOUBLE) / ft - CAST(bg.c AS DOUBLE) / bt)
           * ((CAST(fg.c AS DOUBLE) / ft) / (CAST(bg.c AS DOUBLE) / bt))
           AS score
  FROM fg JOIN bg USING (term) CROSS JOIN tot
  WHERE fg.c >= 3 AND fg.term NOT IN ('merge', 'window')
)
SELECT term, fg_count, bg_count, round(score, 4) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, term LIMIT 12
""",
        # phrase suggester ("did you mean"): per-token candidates within
        # 1 edit ranked (cf desc, term asc) top-5; chains scored by the
        # interpolated bigram LM ln(cf(w1)/T) + ln(0.7*big/cf(w1) +
        # 0.3*cf(w2)/T) — identical float op order to the engine
        "bm25_phrase_suggest": f"""
WITH {_TOKS_POS},
tokc AS (SELECT doc_id, term FROM tokp),
cf AS (SELECT term, count(*) AS cf FROM tokc GROUP BY term),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM tokc),
c1 AS (SELECT term, cf FROM cf WHERE levenshtein(term, 'mergw') <= 1
       ORDER BY cf DESC, term LIMIT 5),
c2 AS (SELECT term, cf FROM cf WHERE levenshtein(term, 'windoq') <= 1
       ORDER BY cf DESC, term LIMIT 5),
big AS (
  SELECT ta.term AS a, tb.term AS b, count(*) AS c FROM tokp ta
  JOIN tokp tb ON ta.doc_id = tb.doc_id AND tb.pos = ta.pos + 1
  GROUP BY 1, 2
),
chains AS (
  SELECT c1.term AS w1, c2.term AS w2,
    ln(CAST(c1.cf AS DOUBLE) / t)
      + ln((0.7 * CAST(COALESCE(big.c, 0) AS DOUBLE)) / c1.cf
           + (0.3 * CAST(c2.cf AS DOUBLE)) / t) AS score
  FROM c1 CROSS JOIN c2 CROSS JOIN tot
  LEFT JOIN big ON big.a = c1.term AND big.b = c2.term
)
SELECT w1 || ' ' || w2 AS phrase, round(score, 4) AS score
FROM chains ORDER BY score DESC, phrase LIMIT 5
""",
        # unified-highlighter passage selection: best 8-token window per
        # merge-AND-window doc by summed BM25-idf weight of query-term
        # occurrences; selection on the shared 4dp rounding, tie to the
        # smallest (1-based) start
        "bm25_best_passage": f"""
WITH {_TOKS_POS},
tokc AS (SELECT doc_id, term FROM tokp),
m AS (
  SELECT doc_id FROM tokc WHERE term = 'merge'
  INTERSECT SELECT doc_id FROM tokc WHERE term = 'window'
),
stats AS (SELECT (SELECT count(*) FROM documents) AS n),
dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokc
  WHERE term IN ('merge', 'window') GROUP BY term
),
w AS (
  SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS wt
  FROM dfq CROSS JOIN stats
),
occ AS (
  SELECT tokp.doc_id, tokp.pos, w.wt FROM tokp JOIN w USING (term)
  WHERE tokp.doc_id IN (SELECT doc_id FROM m)
),
win AS (
  SELECT o.doc_id, o.pos AS start, sum(o2.wt) AS score FROM occ o
  JOIN occ o2 ON o2.doc_id = o.doc_id
             AND o2.pos >= o.pos AND o2.pos < o.pos + 8
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, start, score, row_number() OVER (
    PARTITION BY doc_id ORDER BY round(score, 4) DESC, start
  ) AS rn
  FROM win
)
SELECT doc_id, CAST(start AS BIGINT) AS start, round(score, 4) AS score
FROM best WHERE rn = 1 ORDER BY doc_id
""",
        # multi-fragment highlighting: fragment 1 = the best window;
        # fragment 2 = best among windows at distance >= 8 from it
        "bm25_highlight_fragments": f"""
WITH {_TOKS_POS},
tokc AS (SELECT doc_id, term FROM tokp),
m AS (
  SELECT doc_id FROM tokc WHERE term = 'merge'
  INTERSECT SELECT doc_id FROM tokc WHERE term = 'window'
),
stats AS (SELECT (SELECT count(*) FROM documents) AS n),
dfq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokc
  WHERE term IN ('merge', 'window') GROUP BY term
),
w AS (
  SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS wt
  FROM dfq CROSS JOIN stats
),
occ AS (
  SELECT tokp.doc_id, tokp.pos, w.wt FROM tokp JOIN w USING (term)
  WHERE tokp.doc_id IN (SELECT doc_id FROM m)
),
win AS (
  SELECT o.doc_id, o.pos AS start, sum(o2.wt) AS score FROM occ o
  JOIN occ o2 ON o2.doc_id = o.doc_id
             AND o2.pos >= o.pos AND o2.pos < o.pos + 8
  GROUP BY 1, 2
),
f1 AS (
  SELECT doc_id, start, score FROM (
    SELECT doc_id, start, score, row_number() OVER (
      PARTITION BY doc_id ORDER BY round(score, 4) DESC, start
    ) AS rn FROM win
  ) WHERE rn = 1
),
f2 AS (
  SELECT doc_id, start, score FROM (
    SELECT win.doc_id, win.start, win.score, row_number() OVER (
      PARTITION BY win.doc_id
      ORDER BY round(win.score, 4) DESC, win.start
    ) AS rn
    FROM win JOIN f1 USING (doc_id)
    WHERE abs(win.start - f1.start) >= 8
  ) WHERE rn = 1
)
SELECT doc_id, CAST(1 AS BIGINT) AS frag,
       CAST(start AS BIGINT) AS start, round(score, 4) AS score
FROM f1
UNION ALL
SELECT doc_id, CAST(2 AS BIGINT) AS frag,
       CAST(start AS BIGINT) AS start, round(score, 4) AS score
FROM f2
ORDER BY doc_id, frag
""",
        # termvectors: tf over the requested ids, df over the corpus
        "bm25_term_vectors": f"""
WITH {_TOKS},
tv AS (
  SELECT doc_id, term, count(*) AS tf FROM toks2
  WHERE doc_id IN (3, 7, 11) GROUP BY doc_id, term
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term)
SELECT tv.doc_id, tv.term, tv.tf, df.df
FROM tv JOIN df USING (term) ORDER BY tv.doc_id, tv.term
""",
        # matrix_stats: HUGEINT moment sums, the engine's exact double
        # expression — cov=(Sab - Sa*Sb/n)/(n-1), corr=cov/sqrt(va*vb)
        "bm25_matrix_stats": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
vals AS (
  SELECT strlen(d.text) AS x, COALESCE(dl.c, 0) AS y
  FROM documents d LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT doc_id FROM m)
),
s AS (
  SELECT count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM vals
),
c AS (
  SELECT (CAST(sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE) / n) / (n - 1)
           AS vx,
         (CAST(sxy AS DOUBLE) - CAST(sx * sy AS DOUBLE) / n) / (n - 1)
           AS cxy,
         (CAST(syy AS DOUBLE) - CAST(sy * sy AS DOUBLE) / n) / (n - 1)
           AS vy
  FROM s
)
SELECT 'n_bytes' AS field_a, 'n_bytes' AS field_b,
       round(vx, 4) AS covariance,
       round(vx / sqrt(vx * vx), 4) AS correlation FROM c
UNION ALL
SELECT 'n_bytes', 'dl_content', round(cxy, 4),
       round(cxy / sqrt(vx * vy), 4) FROM c
UNION ALL
SELECT 'dl_content', 'dl_content', round(vy, 4),
       round(vy / sqrt(vy * vy), 4) FROM c
""",
        # significant_text under a sampler: fg = top-200 BM25 docs of
        # 'merge window' on the (round(score,4) DESC, doc_id) cut, then
        # the identical JLH counts/expression as bm25_significant_text
        "bm25_significant_sampled": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
       GROUP BY doc_id, term),
dlx AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dlx)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES ('merge'), ('window')) AS q(term)),
dft AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlx.dl / s.avgdl)))
            ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dlx USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topn AS (
  SELECT doc_id FROM scores
  ORDER BY round(score, 4) DESC, doc_id LIMIT 200
),
fg AS (
  SELECT term, count(DISTINCT doc_id) AS c FROM toks2
  WHERE doc_id IN (SELECT doc_id FROM topn) GROUP BY term
),
bg AS (SELECT term, count(DISTINCT doc_id) AS c FROM toks2
       GROUP BY term),
tot AS (
  SELECT (SELECT count(*) FROM topn) AS ft,
         (SELECT count(*) FROM documents) AS bt
),
scored AS (
  SELECT fg.term, fg.c AS fg_count, bg.c AS bg_count,
         (CAST(fg.c AS DOUBLE) / ft - CAST(bg.c AS DOUBLE) / bt)
           * ((CAST(fg.c AS DOUBLE) / ft) / (CAST(bg.c AS DOUBLE) / bt))
           AS score
  FROM fg JOIN bg USING (term) CROSS JOIN tot
  WHERE fg.c >= 3 AND fg.term NOT IN ('merge', 'window')
)
SELECT term, fg_count, bg_count, round(score, 4) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, term LIMIT 12
""",
        # pinned: promoted ids (existing ones, given order) first, then
        # the organic rounded ranking with pins excluded; pure integers
        "bm25_pinned": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
       GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES ('merge'), ('window')) AS q(term)),
dft AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
            ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
pins0 AS (SELECT * FROM (VALUES (1, 5), (2, 1), (3, 1000000000), (4, 2))
          AS p(ord, doc_id)),
pins AS (
  SELECT row_number() OVER (ORDER BY ord) AS rank, doc_id
  FROM pins0 WHERE doc_id IN (SELECT doc_id FROM documents)
),
organic AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
           AS orank
  FROM scores
  WHERE doc_id NOT IN (SELECT doc_id FROM pins)
)
SELECT rank, doc_id, CAST(1 AS BIGINT) AS pinned FROM pins
UNION ALL
SELECT (SELECT count(*) FROM pins) + orank AS rank, doc_id,
       CAST(0 AS BIGINT) AS pinned
FROM organic
WHERE (SELECT count(*) FROM pins) + orank <= 15
ORDER BY rank
""",
        # distance_feature: bm25 + boost*pivot/(pivot+|strlen-origin|)
        "bm25_distance_feature": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
       GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES ('merge'), ('window')) AS q(term)),
dft AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
            ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
boosted AS (
  SELECT sc.doc_id,
         sc.score + (2.0 * 128) / (128 + abs(strlen(d.text) - 600))
           AS score
  FROM scores sc JOIN documents d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score FROM boosted
  ORDER BY round(score, 4) DESC, doc_id LIMIT 15
)
SELECT doc_id, score FROM topk ORDER BY score DESC, doc_id
""",
        # auto_date_histogram: smallest ladder rung whose grid bucket
        # count fits, then fixed-grid buckets with exact integer sums
        "events_auto_histogram": """
WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e,
         CAST(round(value * 1e6) AS BIGINT) AS v6
  FROM events
),
ext AS (SELECT min(e) AS mn, max(e) AS mx FROM ev),
ladder AS (
  SELECT * FROM (VALUES (1), (5), (10), (30), (60), (300), (600),
                        (1800), (3600), (10800), (43200), (86400),
                        (604800), (2592000), (7776000), (31536000))
  AS l(i)
),
pick AS (
  -- COALESCE mirrors the engine's fallback: when even the coarsest
  -- rung exceeds the target, bucket at the coarsest rung anyway
  SELECT COALESCE(min(i), 31536000) AS i FROM ladder CROSS JOIN ext
  WHERE mx // i - mn // i + 1 <= 12
),
b AS (
  SELECT (e // (SELECT i FROM pick)) * (SELECT i FROM pick)
           AS bucket_epoch,
         count(*) AS n, sum(v6) AS total_value_e6
  FROM ev GROUP BY 1
)
SELECT CAST((SELECT i FROM pick) AS BIGINT) AS interval_s,
       bucket_epoch, n, CAST(total_value_e6 AS BIGINT)
         AS total_value_e6
FROM b ORDER BY bucket_epoch
""",
        # boxplot: exact quartiles under the shared ceil-rank rule
        # (identical double multiply + ceil over a row_number ranking)
        # + plain int min/max over the `merge OR window` match set
        "bm25_boxplot": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
vals AS (
  SELECT COALESCE(dl.c, 0) AS v FROM documents d
  LEFT JOIN dl USING (doc_id)
  WHERE d.doc_id IN (SELECT doc_id FROM m)
),
ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
                  count(*) OVER () AS n FROM vals),
q AS (SELECT
  (SELECT CAST(min(v) AS BIGINT) FROM ranked
   WHERE rn >= greatest(1, ceil(0.25 * n))) AS q1,
  (SELECT CAST(min(v) AS BIGINT) FROM ranked
   WHERE rn >= greatest(1, ceil(0.5 * n))) AS q2,
  (SELECT CAST(min(v) AS BIGINT) FROM ranked
   WHERE rn >= greatest(1, ceil(0.75 * n))) AS q3)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM vals) AS n,
       (SELECT CAST(min(v) AS BIGINT) FROM vals) AS "min",
       q1, q2, q3,
       (SELECT CAST(max(v) AS BIGINT) FROM vals) AS "max",
       q3 - q1 AS iqr
FROM q
""",
        # top_metrics: the n_bytes of the 10 matching docs with the
        # largest dl_content, (value desc, doc_id asc) order — ints
        "bm25_top_metrics": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
dl AS (SELECT doc_id, count(*) AS c FROM toks2 GROUP BY doc_id),
top AS (
  SELECT m.doc_id, COALESCE(dl.c, 0) AS sv
  FROM m LEFT JOIN dl USING (doc_id)
  ORDER BY sv DESC, m.doc_id LIMIT 10
)
SELECT CAST(row_number() OVER (ORDER BY t.sv DESC, t.doc_id)
            AS BIGINT) AS rank,
       t.doc_id,
       CAST(t.sv AS BIGINT) AS sort_value,
       CAST(strlen(d.text) AS BIGINT) AS n_bytes
FROM top t JOIN documents d USING (doc_id)
ORDER BY rank
""",
        # string_stats over lang of the `merge window` (OR) match set:
        # exact-int counts/lengths, avg = one divide, entropy = the
        # per-char -(p*log2 p) sum (both 4dp-rounded)
        "bm25_string_stats": f"""
WITH {_TOKS},
m AS (SELECT DISTINCT doc_id FROM toks2
      WHERE term IN ('merge', 'window')),
v AS (SELECT d.lang AS s FROM m JOIN documents d USING (doc_id)),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(min(length(s)) AS BIGINT) AS min_length,
         CAST(max(length(s)) AS BIGINT) AS max_length,
         CAST(sum(length(s)) AS BIGINT) AS total_len
  FROM v
),
chars AS (
  SELECT ch, count(*) AS c
  FROM (SELECT unnest(regexp_extract_all(s, '.')) AS ch FROM v)
  GROUP BY ch
),
ent AS (
  SELECT -sum((CAST(c AS DOUBLE) / b.total_len)
              * log2(CAST(c AS DOUBLE) / b.total_len)) AS e
  FROM chars CROSS JOIN base b
)
SELECT b.n, b.min_length, b.max_length,
       round(CAST(b.total_len AS DOUBLE) / b.n, 4) AS avg_length,
       round(ent.e, 4) AS entropy
FROM base b CROSS JOIN ent
""",
        # moving_fn (unweighted mean over the trailing 3 OBSERVED
        # hourly buckets per type): exact window sum/size + one divide
        "events_moving_avg": """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n,
       CAST(sum(n) OVER w AS BIGINT) AS w_sum,
       CAST(count(*) OVER w AS BIGINT) AS w_n,
       round(CAST(sum(n) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE), 4) AS w_avg
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY event_type, hour
""",
        # serial_diff (lag=2 over observed hourly buckets per type);
        # rows without a lagged predecessor are omitted (ES null head)
        "events_serial_diff": """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
piped AS (
  SELECT event_type, hour, CAST(n AS BIGINT) AS n,
         CAST(n - lag(n, 2) OVER (
           PARTITION BY event_type ORDER BY hour
         ) AS BIGINT) AS sdiff
  FROM hourly
)
SELECT event_type, hour, n, sdiff FROM piped
WHERE sdiff IS NOT NULL ORDER BY event_type, hour
""",
        # bucket_script (per-hour click share = one IEEE divide) +
        # bucket_selector (hours with fewer than 5 events dropped)
        "events_bucket_script": """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) FILTER (WHERE event_type = 'click') AS n_num,
         count(*) AS n_total
  FROM events GROUP BY 1
)
SELECT hour, CAST(n_num AS BIGINT) AS n_num,
       CAST(n_total AS BIGINT) AS n_total,
       round(CAST(n_num AS DOUBLE) / CAST(n_total AS DOUBLE), 4)
         AS ratio
FROM hourly WHERE n_total >= 5 ORDER BY hour
""",
        # span_not: an include token with no exclude token inside the
        # [pos-2, pos+2] window (1-based positions; differences are
        # base-invariant so the 0-based engine agrees)
        "bm25_span_not": f"""
WITH {_TOKS_POS},
a AS (SELECT doc_id, pos FROM tokp WHERE term = 'merge'),
b AS (SELECT doc_id, pos FROM tokp WHERE term = 'window'),
m AS (
  SELECT DISTINCT a.doc_id FROM a
  WHERE NOT EXISTS (
    SELECT 1 FROM b
    WHERE b.doc_id = a.doc_id
      AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
  )
)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM m ORDER BY doc_id
""",
        # diversified sampler: per-lang row_number over the ranked cut
        # <= 25, first 100 accepted docs as the foreground, then the
        # identical JLH counts/expression as bm25_significant_sampled
        "bm25_significant_diversified": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
       GROUP BY doc_id, term),
dlx AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dlx)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES ('merge'), ('window')) AS q(term)),
dft AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlx.dl / s.avgdl)))
            ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dlx USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
           AS r
  FROM scores
),
withv AS (
  SELECT ranked.doc_id, ranked.r, d.lang
  FROM ranked JOIN documents d USING (doc_id)
),
div AS (
  SELECT doc_id, r,
         row_number() OVER (PARTITION BY lang ORDER BY r) AS pv
  FROM withv
),
topn AS (
  SELECT doc_id FROM div WHERE pv <= 25 ORDER BY r LIMIT 100
),
fg AS (
  SELECT term, count(DISTINCT doc_id) AS c FROM toks2
  WHERE doc_id IN (SELECT doc_id FROM topn) GROUP BY term
),
bg AS (SELECT term, count(DISTINCT doc_id) AS c FROM toks2
       GROUP BY term),
tot AS (
  SELECT (SELECT count(*) FROM topn) AS ft,
         (SELECT count(*) FROM documents) AS bt
),
scored AS (
  SELECT fg.term, fg.c AS fg_count, bg.c AS bg_count,
         (CAST(fg.c AS DOUBLE) / ft - CAST(bg.c AS DOUBLE) / bt)
           * ((CAST(fg.c AS DOUBLE) / ft) / (CAST(bg.c AS DOUBLE) / bt))
           AS score
  FROM fg JOIN bg USING (term) CROSS JOIN tot
  WHERE fg.c >= 3 AND fg.term NOT IN ('merge', 'window')
)
SELECT term, fg_count, bg_count, round(score, 4) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, term LIMIT 12
""",
        # rate: hourly count rescaled to a per-minute rate — the
        # bucket-width normalizer, one fixed-order double per bucket
        "events_rate": """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) * 60.0 / 3600.0, 4) AS rate
FROM hourly ORDER BY event_type, hour
""",
        # bucket_sort: hourly buckets (all types) by count desc (hour
        # asc ties), skip 1, keep 5; rank is the absolute position
        "events_bucket_sort": """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         count(*) AS n_total
  FROM events GROUP BY 1
),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY n_total DESC, hour)
              AS BIGINT) AS rank,
         hour, CAST(n_total AS BIGINT) AS n_total
  FROM hourly
)
SELECT rank, hour, n_total FROM ranked
WHERE rank > 1 AND rank <= 6 ORDER BY rank
""",
        # collapse: best hit per lang (per-lang row_number over the
        # ranked BM25 CTE = 1), top-5 group winners in rank order
        "bm25_collapse": f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2
       GROUP BY doc_id, term),
dlx AS (SELECT doc_id, count(*) AS dl FROM toks2 GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dlx)
           / (SELECT count(*) FROM documents) AS avgdl
),
qterms AS (SELECT * FROM (VALUES ('merge'), ('window')) AS q(term)),
dft AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT term FROM qterms) GROUP BY term
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlx.dl / s.avgdl)))
            ) AS score
  FROM tf
  JOIN dft USING (term)
  JOIN dlx USING (doc_id)
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, round(score, 4) AS rs,
         row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
           AS r
  FROM scores
),
withv AS (
  SELECT ranked.doc_id, ranked.rs, ranked.r, d.lang
  FROM ranked JOIN documents d USING (doc_id)
),
winners AS (
  SELECT doc_id, rs, r, lang,
         row_number() OVER (PARTITION BY lang ORDER BY r) AS pv
  FROM withv
),
cut AS (
  SELECT lang, doc_id, rs, r FROM winners
  WHERE pv = 1 ORDER BY r LIMIT 5
)
SELECT CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS rank,
       lang, doc_id, rs AS score
FROM cut ORDER BY rank
""",
        # cumulative_cardinality: every observed hour with the count
        # of FIRST-SEEN users and the running distinct-user total
        "events_cumulative_cardinality": """
WITH ev AS (
  SELECT user_id,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour
  FROM events
),
first_seen AS (
  SELECT user_id, min(hour) AS first_hour FROM ev GROUP BY user_id
),
hours AS (SELECT DISTINCT hour FROM ev),
newc AS (
  SELECT first_hour AS hour, count(*) AS new_users
  FROM first_seen GROUP BY first_hour
)
SELECT h.hour,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(COALESCE(n.new_users, 0)) OVER (
         ORDER BY h.hour ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_users
FROM hours h LEFT JOIN newc n USING (hour)
ORDER BY h.hour
""",
        # retention cohorts: distinct (user, epoch-day) pairs, cohort =
        # min day per user, count active users per (cohort, offset<=7)
        "user_retention": """
WITH pairs AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
coh AS (SELECT user_id, min(day) AS cohort FROM pairs GROUP BY user_id)
SELECT c.cohort AS cohort_day,
       CAST(p.day - c.cohort AS BIGINT) AS "offset",
       CAST(count(*) AS BIGINT) AS n_active
FROM pairs p JOIN coh c USING (user_id)
WHERE p.day - c.cohort <= 7
GROUP BY 1, 2 ORDER BY 1, 2
""",
    }
