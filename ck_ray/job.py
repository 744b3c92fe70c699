"""Cluster entrypoints for ``ray job submit`` (reference deployment shape:
the north rule's "run via ray job submit on a fixed-size multi-node Ray
cluster"; the reference ships a one-process CLI, ``ck-cli/src/main.rs``).

On a cluster::

    ray job submit --working-dir . -- \
        python -m ck_ray.job build --corpus /data/corpus \
            --index-dir /shared/idx --num-parts 256 --exchange-backend actor
    ray job submit --working-dir . -- \
        python -m ck_ray.job query --index-dir /shared/idx --top-k 10 \
            'parse_request_body path:core'
    ray job submit --working-dir . -- \
        python -m ck_ray.job pipeline --name exact_dups \
            --sf-dir /data/sf100 --output /shared/out/exact_dups

Each subcommand prints exactly one JSON line to stdout (logs go to
stderr), so the submitting side can parse results from the job log.

Ray connection: inside a submitted job the runtime exports
``RAY_ADDRESS`` for the cluster the job landed on, and a bare
``ray.init()`` joins it; standalone (this sandbox presets
``RAY_ADDRESS=local``) the same call starts a throwaway local instance.
We therefore init with no explicit address and never shut the cluster
down — ``ray.shutdown()`` here only disconnects this driver. When the
driver calling us (tests, the correctness harness) already initialised
Ray, we reuse its session untouched.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _connect() -> bool:
    """Join the ambient Ray cluster (job runtime / RAY_ADDRESS) or start
    a local one. Returns True when this process owns the connection and
    should disconnect on exit."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(include_dashboard=False, logging_level="ERROR")
    return True


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _cmd_build(args) -> int:
    from .build import IndexConfig, build_index, index_stats

    if args.corpus:
        corpus = args.corpus
    else:
        from .corpus import corpus_parquet

        corpus = corpus_parquet(args.synth_files, seed=args.synth_seed)
    cfg = IndexConfig(
        num_parts=args.num_parts,
        store_positions=not args.no_positions,
        hot_df_threshold=args.hot_df_threshold,
        serving_buckets=args.serving_buckets,
        exchange_backend=args.exchange_backend,
    )
    t0 = time.perf_counter()
    build_index(corpus, args.index_dir, cfg, resume=args.resume)
    wall = time.perf_counter() - t0
    st = index_stats(args.index_dir)
    _emit({
        "job": "build",
        "index_dir": args.index_dir,
        "wall_s": round(wall, 3),
        "files_per_sec": round(st["num_docs"] / wall, 1),
        **st,
    })
    return 0


def _cmd_compact(args) -> int:
    from .compact import compact_index

    t0 = time.perf_counter()
    root = compact_index(args.index_dir)
    _emit({
        "job": "compact",
        "index_dir": args.index_dir,
        "wall_s": round(time.perf_counter() - t0, 3),
        "epoch": root["epoch"],
        "compacted_from": root["compacted_from"],
        "num_docs": root["num_docs"],
    })
    return 0


def _cmd_merge(args) -> int:
    from .compact import merge_indexes

    t0 = time.perf_counter()
    root = merge_indexes(args.sources, args.out_dir)
    _emit({
        "job": "merge",
        "out_dir": args.out_dir,
        "n_sources": len(args.sources),
        "wall_s": round(time.perf_counter() - t0, 3),
        "num_docs": root["num_docs"],
        "num_parts": root["num_parts"],
    })
    return 0


def _cmd_delete(args) -> int:
    from .incremental import delete_by_query

    t0 = time.perf_counter()
    root = delete_by_query(
        args.index_dir, args.query, num_shards=args.shards
    )
    _emit({
        "job": "delete-by-query",
        "index_dir": args.index_dir,
        "query": args.query,
        "wall_s": round(time.perf_counter() - t0, 3),
        "n_deleted": root.get("n_deleted", 0),
        "num_docs": root["num_docs"],
        "epoch": root.get("epoch"),
    })
    return 0


def _cmd_query(args) -> int:
    import numpy as np

    from .query import BM25Engine

    eng = BM25Engine(args.index_dir, num_shards=args.shards)
    if args.suite_file:
        with open(args.suite_file) as fh:
            queries = [ln.rstrip("\n") for ln in fh if ln.strip()]
    elif args.queries:
        queries = list(args.queries)
    else:
        queries = ["def", "merge window query", '"build_index_segment"']
    lat: list[float] = []
    results = {}
    facets = {}
    for _ in range(max(1, args.repeat)):
        for q in queries:
            tq = time.perf_counter()
            df = eng.search(q, top_k=args.top_k)
            lat.append((time.perf_counter() - tq) * 1000)
            if q not in results:
                results[q] = [
                    {
                        "doc_id": int(r.doc_id),
                        "score": float(r.score),
                        "path": getattr(r, "path", None),
                    }
                    for r in df.itertuples(index=False)
                ]
    if args.facets:  # full-match-set counts per query (Count+Terms)
        for q in queries:
            total, buckets = eng.search_facets(q, args.facets)
            facets[q] = {"total": total, args.facets: buckets}
    aggs = {}
    if args.agg:  # KIND:FIELD[:ARG] aggregations over the match set
        spec = _parse_agg_spec(args.agg)
        for q in queries:
            aggs[q] = eng.search_aggregate(q, spec)
    sorts = {}
    if args.sort_by:  # fast-field ordering (order_by_u64_field)
        field, _, direction = args.sort_by.partition(":")
        res_by_q = {
            q: eng.search_sort_by_field(
                q, field, top_k=args.top_k,
                ascending=direction == "asc",
            )
            for q in queries
        }
        sorts = {
            q: [
                {"doc_id": int(d), "path": str(p), field: int(v)}
                for d, p, v in zip(
                    r["doc_ids"], r["paths"], r["values"]
                )
            ]
            for q, r in res_by_q.items()
        }
    eng.close()
    out = {
        "job": "query",
        "index_dir": args.index_dir,
        "n_queries": len(queries),
        "repeat": args.repeat,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "results": results,
    }
    if facets:
        out["facets"] = facets
    if aggs:
        out["aggregations"] = aggs
    if sorts:
        out["sorted_by_field"] = sorts
    _emit(out)
    return 0


def _parse_agg_spec(text: str) -> dict:
    """``KIND:FIELD[:ARG]`` -> search_aggregate spec. Kinds: stats,
    cardinality (no ARG); histogram (ARG = interval); range (ARG =
    comma-separated ascending edges)."""
    parts = text.split(":")
    kind = parts[0]
    if kind in ("stats", "extended_stats", "cardinality"):
        if len(parts) != 2:
            raise SystemExit(f"--agg {kind} takes {kind}:FIELD")
        return {"kind": kind, "field": parts[1]}
    if kind == "histogram":
        if len(parts) != 3:
            raise SystemExit("--agg histogram takes histogram:FIELD:INTERVAL")
        return {"kind": kind, "field": parts[1], "interval": int(parts[2])}
    if kind == "range":
        if len(parts) != 3:
            raise SystemExit("--agg range takes range:FIELD:E1,E2,...")
        return {
            "kind": kind,
            "field": parts[1],
            "edges": [int(e) for e in parts[2].split(",")],
        }
    if kind == "percentiles":
        if len(parts) == 2:
            return {"kind": kind, "field": parts[1]}
        if len(parts) == 3:
            return {
                "kind": kind,
                "field": parts[1],
                "qs": [float(x) for x in parts[2].split(",")],
            }
        raise SystemExit(
            "--agg percentiles takes percentiles:FIELD[:Q1,Q2,...]"
        )
    raise SystemExit(f"unknown aggregation kind: {kind!r}")


def _cmd_pipeline(args) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    q = entrymod.queries()
    if args.name not in q:
        print(
            f"unknown pipeline {args.name!r}; have: {', '.join(sorted(q))}",
            file=sys.stderr,
        )
        return 2
    t0 = time.perf_counter()
    res = q[args.name](args.sf_dir)
    out_rows = None
    if args.output:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            # stream straight to partitioned parquet — no driver collect
            res.write_parquet(args.output)
        else:
            t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            out_rows = t.num_rows
            import os

            os.makedirs(args.output, exist_ok=True)
            pq.write_table(t, f"{args.output}/part-00000.parquet")
    if out_rows is None:
        out_rows = (
            res.count() if hasattr(res, "count") and not hasattr(res, "shape")
            else len(res)
        )
    _emit({
        "job": "pipeline",
        "name": args.name,
        "sf_dir": args.sf_dir,
        "rows": int(out_rows),
        "wall_s": round(time.perf_counter() - t0, 3),
        "output": args.output,
    })
    return 0


def _cmd_curate(args) -> int:
    """Materialize the cleaned corpus (corpus_clean_write): near-dup
    removal + decontamination + stratified sampling + source quotas,
    written as source-partitioned parquet."""
    from .ops.curation import corpus_clean_write

    t0 = time.perf_counter()
    info = corpus_clean_write(
        args.sf_dir,
        args.output,
        jaccard_threshold=args.jaccard_threshold,
        eval_mod=args.eval_mod,
        quota=args.quota,
    )
    _emit({
        "job": "curate",
        "sf_dir": args.sf_dir,
        "output": args.output,
        "wall_s": round(time.perf_counter() - t0, 3),
        "n_kept": info["n_kept"],
        "n_partitions": len(info["partitions"]),
    })
    return 0


def _cmd_percolate(args) -> int:
    """Stream a corpus parquet against a stored-query registry file and
    write (query_name, id) match pairs as parquet (ES percolate at
    batch scale: route documents to saved searches / training buckets
    in one streaming pass)."""
    import json as _json

    import ray.data

    from .ops.percolate import percolate_stream

    with open(args.queries) as fh:
        registry = _json.load(fh)
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(args.corpus)
    out = percolate_stream(
        ds, registry, text_col=args.text_col, id_col=args.id_col,
        concurrency=(1, 8),
    )
    if args.output and "://" not in args.output:
        # rerun-safe LOCAL sink: stream into a staging dir, then swap
        # it in whole. A retried job (previous run interrupted
        # mid-write) REPLACES any partial pair set instead of
        # appending duplicate files to it — write_parquet alone would
        # mix two runs' files. Remote URIs (s3:// etc.) take the
        # direct-write path below: os.rename can't swap object-store
        # prefixes, so reruns there should target a fresh prefix.
        import os as _os
        import shutil as _shutil
        import uuid as _uuid

        staging = f"{args.output.rstrip('/')}.staging-{_uuid.uuid4().hex}"
        try:
            out.write_parquet(staging)
            if _os.path.isdir(args.output):
                _shutil.rmtree(args.output)
            _os.rename(staging, args.output)
        finally:
            _shutil.rmtree(staging, ignore_errors=True)
        n = "streamed"
    elif args.output:
        out.write_parquet(args.output)
        n = "streamed"
    else:
        n = int(out.count())
    _emit({
        "job": "percolate",
        "corpus": args.corpus,
        "n_queries": len(registry),
        "matches": n,
        "output": args.output,
        "wall_s": round(time.perf_counter() - t0, 3),
    })
    return 0


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m ck_ray.job")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", help="corpus parquet dir (repo,path,commit,lang,content)")
    b.add_argument("--synth-files", type=int, default=10_000,
                   help="when --corpus is absent: synthesize N files")
    b.add_argument("--synth-seed", type=int, default=11)
    b.add_argument("--index-dir", required=True)
    b.add_argument("--num-parts", type=int, default=16)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--hot-df-threshold", type=int, default=None)
    b.add_argument("--serving-buckets", type=int, default=16)
    b.add_argument("--exchange-backend", choices=("fs", "actor"), default=None)
    b.add_argument("--resume", action="store_true")
    b.set_defaults(fn=_cmd_build)

    c = sub.add_parser(
        "compact", help="merge the index's epoch chain into one epoch"
    )
    c.add_argument("--index-dir", required=True)
    c.set_defaults(fn=_cmd_compact)

    mg = sub.add_parser(
        "merge",
        help="merge N source indexes into one fresh index "
             "(right-most wins doc conflicts)",
    )
    mg.add_argument("sources", nargs="+", help="source index dirs")
    mg.add_argument("--out-dir", required=True)
    mg.set_defaults(fn=_cmd_merge)

    dq = sub.add_parser(
        "delete-by-query",
        help="tombstone every doc matching a query (one epoch)",
    )
    dq.add_argument("query", help="query-language expression to delete")
    dq.add_argument("--index-dir", required=True)
    dq.add_argument("--shards", type=int, default=4)
    dq.set_defaults(fn=_cmd_delete)

    q = sub.add_parser("query", help="run BM25 queries against an index")
    q.add_argument("queries", nargs="*", help="query strings")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--shards", type=int, default=4)
    q.add_argument("--top-k", type=int, default=10)
    q.add_argument("--repeat", type=int, default=1,
                   help="latency sampling: run the suite N times")
    q.add_argument("--suite-file", help="file with one query per line")
    q.add_argument(
        "--facets", metavar="FIELD",
        help="also report full-match-set counts bucketed by this "
             "metadata field (lang/repo)",
    )
    q.add_argument(
        "--agg", metavar="KIND:FIELD[:ARG]",
        help="full-match-set aggregation: stats:FIELD, "
             "extended_stats:FIELD (adds sum_sq/variance/std), "
             "cardinality:FIELD, histogram:FIELD:INTERVAL, "
             "range:FIELD:E1,E2,... (numeric fields: n_bytes, "
             "dl_content)",
    )
    q.add_argument(
        "--sort-by", metavar="FIELD[:asc]",
        help="order top-k by a numeric fast field instead of the BM25 "
             "score (tantivy order_by_u64_field); default desc",
    )
    q.set_defaults(fn=_cmd_query)

    pl = sub.add_parser("pipeline", help="run a queries() pipeline entry")
    pl.add_argument("--name", required=True)
    pl.add_argument("--sf-dir", required=True)
    pl.add_argument("--output", help="parquet output dir (Datasets stream here)")
    pl.set_defaults(fn=_cmd_pipeline)

    cu = sub.add_parser(
        "curate",
        help="write the cleaned corpus (dedup+decontaminate+sample+quota)",
    )
    cu.add_argument("--sf-dir", required=True)
    cu.add_argument("--output", required=True,
                    help="source-partitioned parquet output dir")
    cu.add_argument("--jaccard-threshold", type=float, default=0.6)
    cu.add_argument("--eval-mod", type=int, default=17)
    cu.add_argument("--quota", type=int, default=12)
    cu.set_defaults(fn=_cmd_curate)

    pc = sub.add_parser(
        "percolate",
        help="match a corpus stream against a stored-query registry "
             "(reverse search); write (query_name, id) pairs",
    )
    pc.add_argument("--corpus", required=True, help="corpus parquet path/dir")
    pc.add_argument("--queries", required=True,
                    help="JSON registry file {name: query}")
    pc.add_argument("--text-col", default="content")
    pc.add_argument("--id-col", default="path")
    pc.add_argument("--output", help="parquet output dir (streams; "
                    "omit to just count matches)")
    pc.set_defaults(fn=_cmd_percolate)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    owned = _connect()
    try:
        return args.fn(args)
    finally:
        if owned:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
