"""Determinism sweep: run every ``queries()`` entry TWICE in one
session and compare sha256 hashes of the sorted frames — catches
ordering/tie-break instability under re-execution (warm caches, actor
reuse, different block orders).

Usage: python tools/check_determinism.py [sf_dir] [entries...]
"""

from __future__ import annotations

import hashlib
import json
import sys

import pandas as pd
import ray

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402


def _digest(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False).encode("utf-8")
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    queries = entrymod.queries()
    only = set(sys.argv[2:])
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    n_bad = 0
    for name in sorted(queries):
        try:
            a = queries[name](sf_dir)
            b = queries[name](sf_dir)
            if not isinstance(a, pd.DataFrame):
                a = a.to_pandas()
            if not isinstance(b, pd.DataFrame):
                b = b.to_pandas()
            ok = _digest(a) == _digest(b)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR     {name}: {e!r}", flush=True)
            n_bad += 1
            continue
        print(f"{'OK' if ok else 'DIFF':9s} {name}", flush=True)
        n_bad += 0 if ok else 1
    print(json.dumps({"bad": n_bad, "total": len(queries)}))
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
