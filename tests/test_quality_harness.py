"""Retrieval-quality harness: Recall@K / MRR@K vs planted ground truth.

The harness (ck_ray.pipelines.docsearch.retrieval_quality) ranks with the
real BM25 engine and derives relevance from literal phrase containment —
here the corpus is built so every metric is hand-computable.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ck_ray.pipelines.docsearch import QUALITY_QUERIES, retrieval_quality


@pytest.fixture()
def planted_docs(tmp_path):
    """12 docs; phrase 'alpha beta' appears verbatim in docs 1,2,3;
    doc 4 has both words but never adjacent (tokens match, phrase not);
    phrase 'gamma delta' appears nowhere; filler docs keep df honest."""
    texts = {
        1: "alpha beta ranks first because alpha alpha beta beta",
        2: "the alpha beta pair appears here once",
        3: "tail mention of alpha beta among other words",
        4: "alpha comes early and beta arrives later separated",
        5: "gamma without its partner anywhere",
        6: "delta alone in this document",
    }
    for i in range(7, 13):
        texts[i] = f"filler document number {i} with common words"
    d = tmp_path / "sf"
    d.mkdir()
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_planted_recall_and_mrr(ray_session, planted_docs):
    out = retrieval_quality(
        planted_docs, queries=("alpha beta", "gamma delta"), k=10
    ).set_index("query")

    ab = out.loc["alpha beta"]
    # relevance = phrase containment: docs 1,2,3 only (doc 4 has the
    # tokens but not the phrase)
    assert ab["n_relevant"] == 3
    # only docs 1-4 score at all (others lack both terms); all three
    # relevant docs are inside the top-10
    assert ab["hits_at_k"] == 3
    assert ab["recall_at_k"] == 1.0
    # doc 1 has the highest tf for both terms -> rank 1 -> MRR 1.0
    assert ab["first_rank"] == 1
    assert ab["mrr_at_k"] == 1.0

    gd = out.loc["gamma delta"]
    # no doc contains the literal phrase; docs 5/6 still rank (one term
    # each) but nothing is relevant
    assert gd["n_relevant"] == 0
    assert gd["hits_at_k"] == 0
    assert gd["first_rank"] == 0
    assert gd["recall_at_k"] == 0.0
    assert gd["mrr_at_k"] == 0.0


def test_default_query_set_shape(ray_session, planted_docs):
    """The fixed evaluation set runs end-to-end even when no default
    phrase occurs in the corpus: one row per query, metrics all zero."""
    out = retrieval_quality(planted_docs, k=10)
    assert list(out["query"]) == sorted(QUALITY_QUERIES)
    assert (out["n_relevant"] == 0).all()
    assert (out["recall_at_k"] == 0.0).all()
    assert out["n_relevant"].dtype == np.int64
