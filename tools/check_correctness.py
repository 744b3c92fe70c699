"""Run the driver's correctness comparison locally at an arbitrary SF.

Usage: python tools/check_correctness.py [sf_dir]

Mirrors the driver gate: every ``queries()`` entry vs its ``oracle_sql()``
DuckDB query on the same parquet tables — row count, sorted-column schema,
and exact values. Rows-only entries (no oracle) are run for determinism.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    only = set(sys.argv[2:])  # optional: restrict to named entries
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown entries: {sorted(unknown)}", file=sys.stderr)
            return 2
        queries = {k: v for k, v in queries.items() if k in only}
    results: dict[str, dict] = {}
    n_bad = 0
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            ours = queries[name](sf_dir)
            if not isinstance(ours, pd.DataFrame):
                ours = ours.to_pandas()
            if name in oracles:
                theirs = con.sql(oracles[name]).df()
                a, b = _norm(ours), _norm(theirs)
                ok_cols = list(a.columns) == list(b.columns)
                ok_rows = len(a) == len(b)
                ok_vals = False
                if ok_cols and ok_rows:
                    try:
                        pd.testing.assert_frame_equal(
                            a, b, check_dtype=False, atol=0, rtol=0
                        )
                        ok_vals = True
                    except AssertionError:
                        ok_vals = False
                status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
                results[name] = {
                    "status": status, "rows": len(a), "oracle_rows": len(b),
                    "cols": ok_cols, "vals": ok_vals,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            else:
                results[name] = {
                    "status": "rows_only", "rows": len(ours),
                    "sec": round(time.perf_counter() - t0, 2),
                }
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR", "err": repr(e)[:200]}
        if results[name]["status"] in ("FAIL", "ERROR"):
            n_bad += 1
        print(f"{results[name]['status']:9s} {name} "
              f"({results[name].get('sec', '?')}s)", flush=True)
    print(json.dumps({"bad": n_bad, "total": len(queries)}))
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
