"""Distributed Bloom filter for pre-shuffle join pruning.

Sideways information passing for the exchange joins: when one side of a
fact-fact join carries a selective predicate (q3's BUILDING-segment +
date filter kills ~90% of orders), the other side still ships every one
of its rows through the exchange only for the reducer to drop the
non-matching keys. A Bloom filter of the surviving build-side keys,
built distributively and broadcast once (``ray.put``), lets the probe
side drop those rows BEFORE the shuffle. No false negatives, so results
are bit-identical — false positives just ride the exchange and die in
the reducer exactly as they do today.

Build is map-side parallel: each batch adds its keys into a fresh
bitmap and emits the bitmap as one fixed-size binary row; bitmaps
OR-combine associatively, so the driver folds them in one pass
(#batches x m/8 bytes of small-side traffic). At cluster scale the same
fold runs as a tree (per-node combine, then driver), or the sparse
(word_idx, word) form rides the run-file exchange; the filter itself is
transport-agnostic — only ``words`` moves.

Hashing is Kirsch-Mitzenmacher double hashing over the exchange's
splitmix mixer (``exchange.int_key_hash``): position_i = (h1 + i*h2)
mod m, h2 forced odd so the stride cycles the power-of-two table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import int_key_hash

_H2_TWEAK = np.uint64(0x94D049BB133111EB)


def log2_bits_for(n_keys: int, bits_per_key: int = 16) -> int:
    """Smallest power-of-two bit count giving >= bits_per_key per key
    (16 bits/key with k=6 hashes -> ~0.05% false-positive rate)."""
    need = max(64, int(n_keys) * int(bits_per_key))
    return max(6, int(need - 1).bit_length())


class Bloom:
    """Fixed-size Bloom filter over int64/uint64 keys, vectorized."""

    def __init__(self, log2_bits: int, num_hashes: int = 6,
                 words: np.ndarray | None = None):
        if log2_bits < 6:
            raise ValueError("log2_bits must be >= 6 (one uint64 word)")
        self.log2_bits = int(log2_bits)
        self.num_hashes = int(num_hashes)
        n_words = 1 << (self.log2_bits - 6)
        if words is None:
            words = np.zeros(n_words, dtype=np.uint64)
        elif len(words) != n_words:
            raise ValueError("words length does not match log2_bits")
        self.words = words

    # -- positions ---------------------------------------------------
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(num_hashes, n) bit positions for the key column."""
        k64 = keys.astype(np.int64, copy=False)
        h1 = int_key_hash(k64)
        h2 = int_key_hash((k64.view(np.uint64) ^ _H2_TWEAK).view(np.int64))
        h2 |= np.uint64(1)
        mask = np.uint64((1 << self.log2_bits) - 1)
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & mask

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.intp),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (True may be a false positive;
        False is definitive)."""
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        w = self.words[(pos >> np.uint64(6)).astype(np.intp)]
        hit = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    # -- merge / transport -------------------------------------------
    def or_(self, other: "Bloom") -> "Bloom":
        if (other.log2_bits, other.num_hashes) != (self.log2_bits, self.num_hashes):
            raise ValueError("cannot OR blooms of different shapes")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, log2_bits: int, num_hashes: int, blob: bytes) -> "Bloom":
        return cls(log2_bits, num_hashes,
                   np.frombuffer(blob, dtype=np.uint64).copy())


def bloom_from_dataset(
    ds,
    key_fn,
    log2_bits: int,
    num_hashes: int = 6,
) -> Bloom:
    """Build a Bloom filter of ``key_fn(batch)`` keys over a Dataset.

    ``key_fn`` maps a pyarrow batch to an int64/uint64 numpy key column
    (empty allowed). Each map task emits one bitmap row; the driver
    OR-folds them — associative, so any combine tree gives the same
    filter.
    """
    shape = (int(log2_bits), int(num_hashes))

    def bitmap_batch(t: pa.Table) -> pa.Table:
        b = Bloom(*shape)
        b.add(key_fn(t))
        return pa.table({"bm": pa.array([b.to_bytes()], pa.large_binary())})

    out = Bloom(*shape)
    for row in ds.map_batches(
        bitmap_batch, batch_format="pyarrow"
    ).iter_rows():
        np.bitwise_or(
            out.words,
            np.frombuffer(row["bm"], dtype=np.uint64),
            out=out.words,
        )
    return out
