"""Skew salting and checkpoint/resume invariants (SURVEY.md §7.4)."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

import ck_ray.build as ckb


def _segments_table(index_dir):
    man = ckb.load_manifest(index_dir)
    t = pads.dataset(
        os.path.join(index_dir, man["epoch_dir"], "segments"), partitioning="hive"
    ).to_table()
    cols = [c for c in t.column_names if c != "part"]
    return t.select(cols).sort_by(
        [("field", "ascending"), ("term", "ascending")]
    )


def test_salted_equals_unsalted(ray_session, tiny_corpus, tmp_path):
    """Hot-term salting must produce byte-identical posting lists."""
    import ray.data

    d_plain = str(tmp_path / "plain")
    d_salt = str(tmp_path / "salted")
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d_plain, ckb.IndexConfig(num_parts=4)
    )
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus),
        d_salt,
        ckb.IndexConfig(num_parts=4, hot_df_threshold=20, salt_buckets=8),
    )
    man = ckb.load_manifest(d_salt)
    assert man["hot_terms"], "threshold should have selected hot terms"
    a, b = _segments_table(d_plain), _segments_table(d_salt)
    assert a.num_rows == b.num_rows
    for col in ("field", "term", "df", "cf", "postings", "skips", "positions"):
        assert a[col].equals(b[col]), f"column {col} differs"


def test_resume_after_partial_build(ray_session, tiny_corpus, tmp_path):
    """A build resumed from a partially-written staging dir commits the
    identical index (per-partition lineage skip; FIXTURES.md §4)."""
    import ray.data

    d_full = str(tmp_path / "full")
    d_part = str(tmp_path / "partial")
    cfg = ckb.IndexConfig(num_parts=4, batch_size=64)
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d_full, cfg)

    # simulate an interrupt: run a full build, then reconstruct a staging
    # dir containing only docs + 2 of 4 segment partitions
    ckb.build_index(ray.data.from_arrow(tiny_corpus), d_part, cfg)
    man = ckb.load_manifest(d_part)
    epoch_dir = os.path.join(d_part, man["epoch_dir"])
    staging = os.path.join(d_part, f"_staging-{man['epoch']}")
    os.rename(epoch_dir, staging)
    os.remove(os.path.join(d_part, "manifest.json"))
    os.remove(os.path.join(staging, "manifest.json"))
    seg_dir = os.path.join(staging, "segments")
    for part in (1, 3):
        shutil.rmtree(os.path.join(seg_dir, f"part={part}"))
    # corrupt one surviving partition's data -> sha mismatch -> must rebuild
    bad = os.path.join(seg_dir, "part=2", "seg-cold.parquet")
    with open(bad, "ab") as fh:
        fh.write(b"junk")

    man2 = ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d_part, cfg, resume=True
    )
    assert man2["num_docs"] == man["num_docs"]
    a, b = _segments_table(d_full), _segments_table(d_part)
    for col in a.column_names:
        assert a[col].equals(b[col]), f"column {col} differs after resume"
    # lineage covers every partition exactly once
    parts = sorted(r["part"] for r in man2["parts"])
    assert parts == [0, 1, 2, 3]


def test_lineage_rows_complete(tiny_index):
    man = ckb.load_manifest(tiny_index)
    assert len(man["parts"]) == man["num_parts"]
    for r in man["parts"]:
        assert r["sha256"] and r["n_terms"] > 0
        f = os.path.join(
            tiny_index, man["epoch_dir"], "segments", f"part={r['part']}", r["file"]
        )
        assert os.path.exists(f)
