"""Retrieval-quality harness: Recall@K / MRR over queries with known
ground truth — the rebuild's analogue of the reference's SWE-bench
retrieval benchmark (``benchmarks/swe-bench/run.py``, whose published
expectation is BM25 Recall@10 ~40-50% on real issue queries).

No external dataset fits this container, so ground truth comes from the
deterministic synthetic corpus itself, at two difficulty levels:

- ``marker``: each file carries a globally unique ``uq{N}marker`` token;
  the query is that token and exactly one document is relevant. Any sane
  engine must score Recall@1 = 1.0 — this pins the plumbing (routing,
  ranking, tiebreaks), like the reference's smoke instance.
- ``ident``: snake_case / camelCase identifier queries where the
  relevant set is EVERY document containing the identifier (ground truth
  by exact scan, computed independently of the engine). Multi-relevant
  graded retrieval: Recall@K = |topK ∩ relevant| / min(K, |relevant|),
  plus MRR over the first relevant hit.

Usage:  python benchmarks/retrieval_quality.py  [--files 20000] [--k 10]
Prints one JSON line; also importable (``run_quality``) for pytest.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ground_truth_for_terms(table, terms: list[str]) -> dict[str, set[int]]:
    """doc_id sets per query term by independent full scan (pyarrow
    regex on word boundaries over the lowercased content — NOT the
    engine's tokenizer, so the truth can catch tokenizer bugs too)."""
    import pyarrow.compute as pc

    from ck_ray.ids import doc_id_column

    ids = doc_id_column(
        table["repo"], table["path"], table["commit"]
    ).to_numpy()
    out: dict[str, set[int]] = {}
    lower = pc.utf8_lower(table["content"])
    for t in terms:
        # the engine's analyzer splits snake_case; a document matches the
        # QUERY if it contains the identifier verbatim (word-bounded)
        m = pc.match_substring_regex(
            lower, rf"(^|[^a-z0-9]){t.lower()}($|[^a-z0-9])"
        ).to_numpy(zero_copy_only=False)
        out[t] = set(ids[m].tolist())
    return out


def run_quality(
    n_files: int = 20_000, k: int = 10, seed: int = 11, num_parts: int = 16
) -> dict:
    import ray

    from ck_ray.build import IndexConfig, build_index
    from ck_ray.corpus import SNAKE_IDS, generate_corpus
    from ck_ray.query import BM25Engine

    table = generate_corpus(n_files=n_files, seed=seed)
    idx = tempfile.mkdtemp(prefix="ckq_idx_")
    import ray.data

    build_index(
        ray.data.from_arrow(table), idx, IndexConfig(num_parts=num_parts)
    )
    eng = BM25Engine(idx, num_shards=4)
    try:
        # --- level 1: unique-marker queries (1 relevant doc each);
        # ground truth from the independent scan, hit = top-1 IS that doc
        rng = np.random.RandomState(seed)
        marker_files = rng.choice(n_files, size=25, replace=False)
        marker_qs = [f"uq{f:07d}marker" for f in marker_files]
        marker_truth = _ground_truth_for_terms(table, marker_qs)
        marker_hits = 0
        for q in marker_qs:
            rel = marker_truth[q]
            assert len(rel) == 1, f"marker {q} not unique in corpus"
            docs, _ = eng.search_raw(q, top_k=1)
            marker_hits += int(len(docs) == 1 and int(docs[0]) in rel)
        marker_recall_at_1 = marker_hits / len(marker_qs)

        # --- level 1b: TYPO queries over the same unique markers — the
        # fuzzy query's reason to exist. A 1-char substitution in the
        # letter suffix ("marker" -> "markxr") keeps the true marker the
        # ONLY dictionary term within distance 1 (other markers differ in
        # digits too), so `typo~1` must retrieve exactly the right doc;
        # an adjacent transposition ("marker" -> "makrer") is plain
        # distance 2 and needs `~2`. The exact (unfuzzied) typo query is
        # the control and must find nothing.
        typo_exact = typo_f1 = typo_f2 = 0
        for q in marker_qs:
            rel = marker_truth[q]
            sub = q[:-2] + "xr"          # substitution typo
            tr = q[:-6] + "makrer"       # transposition typo
            typo_exact += int(len(eng.search_raw(sub, top_k=1)[0]) > 0)
            d1, _ = eng.search_raw(f"{sub}~1", top_k=1)
            typo_f1 += int(len(d1) == 1 and int(d1[0]) in rel)
            d2, _ = eng.search_raw(f"{tr}~2", top_k=1)
            typo_f2 += int(len(d2) == 1 and int(d2[0]) in rel)
        typo_exact_r1 = typo_exact / len(marker_qs)
        typo_fuzzy1_r1 = typo_f1 / len(marker_qs)
        typo_fuzzy2_r1 = typo_f2 / len(marker_qs)

        # --- level 2: identifier queries with multi-doc relevance
        ident_terms = list(SNAKE_IDS[:12])
        truth = _ground_truth_for_terms(table, ident_terms)
        recalls, rranks = [], []
        per_query = {}
        for t in ident_terms:
            rel = truth[t]
            if not rel:
                continue
            docs, _ = eng.search_raw(t, top_k=k)
            got = [int(d) for d in docs]
            inter = sum(1 for d in got if d in rel)
            r = inter / min(k, len(rel))
            recalls.append(r)
            rr = 0.0
            for rank, d in enumerate(got, start=1):
                if d in rel:
                    rr = 1.0 / rank
                    break
            rranks.append(rr)
            per_query[t] = {
                "n_relevant": len(rel), f"recall@{k}": round(r, 4),
                "rr": round(rr, 4),
            }
        # --- level 3: line queries — the SWE-bench shape ("issue text ->
        # file"): the query is a random CONTENT LINE of a random file,
        # the relevant set is every file containing that exact line
        # (independent substring scan). Lines are built from a shared
        # vocabulary, so files holding the same words in other orders
        # compete and the metric genuinely discriminates (unlike the
        # ident level, which saturates at these corpus densities).
        import re as _re

        import pyarrow.compute as pc

        from ck_ray.ids import doc_id_column

        ids_all = doc_id_column(
            table["repo"], table["path"], table["commit"]
        ).to_numpy()
        contents = table["content"]
        bag_rec, bag_rr, ph_rec, ph_rr = [], [], [], []
        tries = 0
        li = 0
        while li < 20 and tries < 400:
            tries += 1
            row = int(rng.randint(table.num_rows))
            lines = contents[row].as_py().splitlines()
            cand = [
                ln.strip().rstrip(";")
                for ln in lines
                if len(ln.split()) >= 3 and "marker" not in ln
                and ("_" in ln or any(c.isupper() for c in ln))
            ]
            if not cand:
                continue
            qline = cand[int(rng.randint(len(cand)))]
            m = pc.match_substring(contents, qline).to_numpy(
                zero_copy_only=False
            )
            rel = set(ids_all[m].tolist())
            if not rel:
                continue
            li += 1

            def _score(query: str, rec: list, rrs: list) -> None:
                docs, _ = eng.search_raw(query, top_k=k)
                got = [int(d) for d in docs]
                rec.append(
                    sum(1 for d in got if d in rel) / min(k, len(rel))
                )
                rr = 0.0
                for rank, d in enumerate(got, start=1):
                    if d in rel:
                        rr = 1.0 / rank
                        break
                rrs.append(rr)

            _score(qline, bag_rec, bag_rr)          # OR-of-terms BM25
            _score(f'"{qline}"', ph_rec, ph_rr)     # positional phrase
        return {
            "metric": f"retrieval quality (Recall@{k} / MRR), synthetic ground truth",
            "n_files": n_files,
            "marker_recall_at_1": round(marker_recall_at_1, 4),
            # typo level: exact typo'd queries are the control (0.0 by
            # construction); fuzzy restores the marker recall
            "typo_exact_recall_at_1": round(typo_exact_r1, 4),
            "typo_fuzzy1_recall_at_1": round(typo_fuzzy1_r1, 4),
            "typo_fuzzy2_recall_at_1": round(typo_fuzzy2_r1, 4),
            f"ident_mean_recall_at_{k}": round(float(np.mean(recalls)), 4),
            "ident_mrr": round(float(np.mean(rranks)), 4),
            "n_ident_queries": len(recalls),
            # line level (SWE-bench shape): the bag-of-words leg is
            # EXPECTED to be poor — the synthetic vocabulary is tiny, so
            # thousands of files share every common word and tf beats
            # the verbatim file; the phrase leg shows what the
            # positional index buys on the identical queries
            f"line_bag_recall_at_{k}": round(float(np.mean(bag_rec)), 4),
            "line_bag_mrr": round(float(np.mean(bag_rr)), 4),
            f"line_phrase_recall_at_{k}": round(float(np.mean(ph_rec)), 4),
            "line_phrase_mrr": round(float(np.mean(ph_rr)), 4),
            "n_line_queries": len(bag_rec),
            "per_query": per_query,
        }
    finally:
        eng.close()
        import shutil

        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    import argparse

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20_000)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        print(json.dumps(run_quality(n_files=args.files, k=args.k)))
    finally:
        ray.shutdown()
