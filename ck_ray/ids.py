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


def _utf8_offsets(arr: pa.Array) -> np.ndarray:
    """int64 value offsets of a string OR large_string array.

    Branching on the physical offset width (int32 vs int64) instead of
    assuming int32 means a block whose joined keys exceed 2 GiB (Arrow
    auto-promotes to large_string on concat/combine) hashes correctly
    instead of mis-parsing the buffer."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        dt = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        dt = np.int32
    else:  # pragma: no cover - callers cast first
        raise TypeError(f"expected (large_)string, got {arr.type}")
    n = len(arr)
    return np.frombuffer(arr.buffers()[1], dtype=dt)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)


def term_hash(terms: pa.Array | pa.ChunkedArray, field_ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of (field_id, term) — vectorized.

    This is the shuffle-partitioning key for posting-list construction and
    the query-side routing key; it must be identical across processes and
    Python versions (so no built-in ``hash``). The byte loop is bounded by
    MAX_TOKEN_BYTES (39), each iteration vectorized over the batch.
    """
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if terms.type not in (pa.string(), pa.large_string()):
        terms = terms.cast(pa.string())
    n = len(terms)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    # mix the field id first
    h = (h ^ np.asarray(field_ids, dtype=np.uint64)) * _FNV_PRIME
    if n == 0:
        return h
    bufs = terms.buffers()  # [validity, offsets, utf8 data]
    offs = _utf8_offsets(terms)
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


def md5_u64(term: str) -> int:
    """First 8 md5 bytes as uint64 — the SQL-replicable token hash
    (DuckDB: ``('0x' || substr(md5(term), 1, 16))::UBIGINT``), used by the
    operators whose DuckDB oracles must recompute identical hashes
    (simhash, fingerprints)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:16], 16)


def md5_u64_of_terms(terms: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """md5_u64 per row, hashing each DISTINCT term once (dictionary
    encode; the md5 loop is vocabulary-bounded, the scatter vectorized)."""
    import pyarrow.compute as pc

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if len(terms) == 0:
        return np.empty(0, np.uint64)
    enc = pc.dictionary_encode(terms)
    uniq = np.fromiter(
        (md5_u64(t) for t in enc.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(enc.dictionary),
    )
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


def doc_id_for(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def doc_id_column(
    repo: pa.Array | pa.ChunkedArray,
    path: pa.Array | pa.ChunkedArray,
    commit: pa.Array | pa.ChunkedArray,
) -> pa.Array:
    """Same bytes as ``doc_id_for`` row-wise, but the key material is
    assembled by ONE vectorized Arrow concat and hashed from memoryview
    slices — the Python loop is just C sha256 calls over buffer views (no
    per-row join/encode/str allocation)."""
    import pyarrow.compute as pc

    def _is_large(a):
        t = a.type if not isinstance(a, pa.ChunkedArray) else a.type
        return pa.types.is_large_string(t) or pa.types.is_large_binary(t)

    sep_t = (
        pa.large_string()
        if any(_is_large(a) for a in (repo, path, commit))
        else pa.string()
    )
    if sep_t == pa.large_string():  # join kernel requires uniform types
        repo, path, commit = (
            a.cast(pa.large_string()) for a in (repo, path, commit)
        )
    sep = pa.scalar("\x00", sep_t)
    keys = pc.binary_join_element_wise(
        pc.binary_join_element_wise(repo, path, sep), commit, sep
    )
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    n = len(keys)
    if n == 0:
        return pa.array([], type=pa.int64())
    bufs = keys.buffers()  # [validity, offsets (int32 or int64), utf8 data]
    offs = _utf8_offsets(keys)
    data = memoryview(bufs[2])
    sha = hashlib.sha256
    dig = b"".join(
        sha(data[offs[i] : offs[i + 1]]).digest()[:8] for i in range(n)
    )
    ids = (
        np.frombuffer(dig, dtype=">u8") & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    ).astype(np.int64)
    return pa.array(ids, type=pa.int64())
