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
