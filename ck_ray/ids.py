"""Deterministic doc identity + content hashing.

- ``content_sha256``: the per-row invariant column demanded by
  BASELINE.json (``sha256(content)`` hex — the rebuild's analogue of the
  reference's blake3 file hash, reference ``ck-core/src/lib.rs:606-624``).
- ``doc_id``: int64 derived from ``sha256(repo \\x00 path \\x00 commit)``
  (first 8 bytes big-endian, sign bit cleared). Content-addressed ids are
  stable under any partitioning / parallelism — no global sort or
  partition-local counter anywhere (SURVEY.md §7.4 "deterministic docIDs
  under parallelism"). Collisions are ~2^-63 per pair; the build asserts
  uniqueness with a cheap distinct-count aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def term_hash(terms: pa.Array | pa.ChunkedArray, field_ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of (field_id, term) — vectorized.

    This is the shuffle-partitioning key for posting-list construction and
    the query-side routing key; it must be identical across processes and
    Python versions (so no built-in ``hash``). The byte loop is bounded by
    MAX_TOKEN_BYTES (39), each iteration vectorized over the batch.
    """
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if terms.type != pa.string():
        terms = terms.cast(pa.string())
    n = len(terms)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    # mix the field id first
    h = (h ^ np.asarray(field_ids, dtype=np.uint64)) * _FNV_PRIME
    if n == 0:
        return h
    bufs = terms.buffers()  # [validity, int32 offsets, utf8 data]
    offs = (
        np.frombuffer(bufs[1], dtype=np.int32)[terms.offset : terms.offset + n + 1]
        .astype(np.int64)
    )
    starts = offs[:-1]
    lens = np.diff(offs)
    buf = np.frombuffer(bufs[2], dtype=np.uint8)
    max_len = int(lens.max()) if n else 0
    for j in range(max_len):
        active = lens > j
        b = buf[starts[active] + j].astype(np.uint64)
        h[active] = (h[active] ^ b) * _FNV_PRIME
    return h


def term_hash_one(term: str, field_id: int) -> int:
    """Scalar version for query routing; must agree with ``term_hash``."""
    return int(term_hash(pa.array([term], pa.string()), np.array([field_id]))[0])


def sha256_hex_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hexdigest of each string row (hashlib releases the GIL; the
    per-row Python loop is dominated by C hashing on code-sized rows)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [
        hashlib.sha256(v.encode("utf-8") if v is not None else b"").hexdigest()
        for v in arr.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def doc_id_for(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def doc_id_column(
    repo: pa.Array | pa.ChunkedArray,
    path: pa.Array | pa.ChunkedArray,
    commit: pa.Array | pa.ChunkedArray,
) -> pa.Array:
    ids = np.fromiter(
        (doc_id_for(r, p, c) for r, p, c in zip(repo.to_pylist(), path.to_pylist(), commit.to_pylist())),
        dtype=np.int64,
        count=len(repo),
    )
    return pa.array(ids, type=pa.int64())
