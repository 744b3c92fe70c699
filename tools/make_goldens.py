"""Generate the committed golden answers (FIXTURES.md §3).

For every query in the reference suite, record the oracle's top-k
(doc_id, f32 score bits) so the conformance contract is frozen in-repo:
if engine AND oracle ever drift together, tests against these goldens
still catch it. Deterministic (tiny corpus seed 42); rerun only when the
spec deliberately changes:  python tools/make_goldens.py
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from ck_ray.corpus import generate_corpus
from ck_ray.oracle import BM25Oracle

sys.path.insert(0, "tests")
from test_build_query import QUERY_SUITE  # noqa: E402


def main() -> None:
    corpus = generate_corpus(n_files=200, seed=42)
    oracle = BM25Oracle(corpus)
    out = {}
    for query, k in QUERY_SUITE:
        docs, scores = oracle.search_raw(query, k)
        out[query] = {
            "top_k": k,
            "doc_ids": [int(d) for d in docs],
            # exact f32 bit patterns — no tolerance ambiguity
            "score_bits": [int(b) for b in scores.view(np.uint32)],
        }
    with open("tests/goldens_bm25.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {len(out)} goldens to tests/goldens_bm25.json")


if __name__ == "__main__":
    main()
