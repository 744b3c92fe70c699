"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns flowing through
actor-pool ``map_batches`` stages. The image/audio decode libraries are
NOT in this container, so the decode kernel is a clearly-marked stub
(``DecoderUnavailable``) with a deterministic fake behind a flag — the
Ray-side plumbing (schema, batch size, actor signature, output layout) is
real and tested. Swapping ``_fake_decode`` for PIL/librosa is a one-line
change inside the actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class DecoderUnavailable(NotImplementedError):
    pass


def attach_binary_payload(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Stand-in ingestion: wrap a text column as bytes + typed metadata
    (at scale this column would come from read_binary_files / parquet)."""
    data = [x.encode("utf-8") for x in t[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "payload": pa.array(data, pa.large_binary()),
            "media_type": pa.array(["application/octet-stream"] * len(data)),
            "n_bytes": pa.array([len(d) for d in data], pa.int64()),
        }
    )


class FeatureExtractor:
    """Actor-pool stage: decode -> fixed-size feature vector per payload.

    ``fake=True`` (default in this container) produces a deterministic
    16-float signature from the payload bytes; ``fake=False`` raises
    DecoderUnavailable where the real decoder would run.
    """

    DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise DecoderUnavailable(
                "real image/audio decode requires PIL/librosa (not in this "
                "container); construct FeatureExtractor(fake=True)"
            )
        return self._fake_decode(payload)

    @staticmethod
    def _fake_decode(payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(h[: FeatureExtractor.DIM * 2], dtype=np.uint16).astype(
                np.float32
            )
            / 65535.0
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.stack(
            [self._decode(p) for p in t["payload"].to_pylist()]
        ) if t.num_rows else np.zeros((0, self.DIM), np.float32)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": t["n_bytes"],
                "features": pa.array(
                    list(feats.astype(np.float32)),
                    pa.list_(pa.float32(), self.DIM),
                ),
            }
        )


def multimodal_features(sf_dir: str) -> pd.DataFrame:
    """documents -> binary payloads -> actor-pool feature extraction.

    Small ``batch_size`` on the feature stage: large binary payloads are
    the reason (a batch x concurrency must fit a worker heap)."""
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = (
        ds.map_batches(attach_binary_payload, batch_format="pyarrow")
        .map_batches(
            FeatureExtractor, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    # feat0 as the raw uint16 (features[0] * 65535 is exact in f32): an
    # integer column survives the driver's value-hash compare with no
    # float-rounding hazard, and the DuckDB oracle recomputes it from
    # sha256 hex directly
    out["feat0_u16"] = (
        out["features"].map(lambda v: float(v[0])) * 65535.0
    ).round().astype("int64")
    return (
        out[["doc_id", "n_bytes", "feat0_u16"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class ImageResizer:
    """Actor-pool RESIZE stage (the brief's decode -> resize step).

    Real decoders aren't in this container, so the raster is a synthetic
    but deterministic view of the payload: bytes laid out row-major at a
    fixed ``in_w``, zero-padded to full rows. The resize itself is REAL
    nearest-neighbor sampling — output pixel (r, c) reads input pixel
    (r*in_h // out, c*in_w // out) — the same index arithmetic a real
    grayscale NN resize uses, so swapping the synthetic raster for a
    decoded one changes nothing downstream."""

    def __init__(self, in_w: int = 64, out: int = 8):
        self.in_w = in_w
        self.out = out
        rr = np.arange(out)
        self.rows = rr  # out-row index template
        self.cols = (np.arange(out) * in_w) // out  # fixed per in_w

    def _resize_one(self, payload: bytes) -> np.ndarray:
        buf = np.frombuffer(payload, np.uint8)
        n = len(buf)
        in_h = max(1, -(-n // self.in_w))
        src_r = (self.rows * in_h) // self.out
        idx = src_r[:, None] * self.in_w + self.cols[None, :]
        px = np.zeros((self.out, self.out), np.int64)
        m = idx < n
        px[m] = buf[idx[m]]
        return px

    def __call__(self, t: pa.Table) -> pa.Table:
        grids = [
            self._resize_one(p) for p in t["payload"].to_pylist()
        ]
        px = (
            np.stack(grids)
            if grids else np.zeros((0, self.out, self.out), np.int64)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": t["n_bytes"],
                "px_sum": pa.array(px.sum(axis=(1, 2)), pa.int64()),
                "px00": pa.array(px[:, 0, 0], pa.int64()),
                "px77": pa.array(px[:, -1, -1], pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool FRAME-SAMPLE stage (the brief's video step): the
    payload is a sequence of fixed-length frames; keep every ``stride``-th
    one. Emits one row per SAMPLED frame with its md5 — the flat-map
    shape (one input row -> many output rows) real frame extraction has.
    """

    def __init__(self, frame_len: int = 256, stride: int = 4):
        self.frame_len = frame_len
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, fbytes, fmd5 = [], [], [], []
        for doc_id, p in zip(
            t["doc_id"].to_pylist(), t["payload"].to_pylist()
        ):
            n = len(p)
            n_frames = -(-n // self.frame_len)
            for j in range(0, n_frames, self.stride):
                chunk = p[j * self.frame_len : (j + 1) * self.frame_len]
                ids.append(doc_id)
                fidx.append(j)
                fbytes.append(len(chunk))
                fmd5.append(hashlib.md5(chunk).hexdigest()[:16])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "frame_bytes": pa.array(fbytes, pa.int64()),
                "frame_md5": pa.array(fmd5, pa.string()),
            }
        )


def _payloads(sf_dir: str) -> ray.data.Dataset:
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(attach_binary_payload, batch_format="pyarrow")


def image_resize_nn(sf_dir: str) -> pd.DataFrame:
    """payloads -> actor-pool nearest-neighbor resize; integer pixels."""
    out = (
        _payloads(sf_dir)
        .map_batches(
            ImageResizer, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    cols = ["doc_id", "n_bytes", "px_sum", "px00", "px77"]
    return out[cols].astype("int64").sort_values("doc_id").reset_index(
        drop=True
    )


def video_frame_sample(sf_dir: str) -> pd.DataFrame:
    """payloads -> actor-pool stride frame sampling (flat-map stage)."""
    out = (
        _payloads(sf_dir)
        .map_batches(
            FrameSampler, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    for c in ("doc_id", "frame_idx", "frame_bytes"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
