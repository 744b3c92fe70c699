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


def test_build_actor_exchange_identical(ray_session, tiny_corpus, tmp_path):
    """A build whose shuffle rides the shared-nothing actor exchange
    (disjoint per-owner roots simulating node-local disks) must commit a
    byte-identical index to the fs-exchange build (VERDICT r2 #1)."""
    import ray.data

    d_fs = str(tmp_path / "fs")
    d_act = str(tmp_path / "act")
    roots = [str(tmp_path / f"node-{i}") for i in range(3)]
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d_fs,
        ckb.IndexConfig(num_parts=4, hot_df_threshold=20, salt_buckets=4),
    )
    ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d_act,
        ckb.IndexConfig(
            num_parts=4, hot_df_threshold=20, salt_buckets=4,
            exchange_backend="actor", exchange_num_owners=3,
            exchange_roots=roots,
        ),
    )
    a, b = _segments_table(d_fs), _segments_table(d_act)
    assert a.num_rows == b.num_rows
    for col in ("field", "term", "df", "cf", "postings", "skips", "positions"):
        assert a[col].equals(b[col]), f"column {col} differs"
    ma, mb = ckb.load_manifest(d_fs), ckb.load_manifest(d_act)
    assert ma["num_docs"] == mb["num_docs"]
    assert ma["fields"] == mb["fields"]


def test_stale_staging_artifacts_pruned(ray_session, tiny_corpus, tmp_path):
    """A crashed attempt's orphan docs parquet and stale serving files
    must not leak into the committed index (ADVICE r2): docs promotion is
    manifest-gated, serving/post is pruned per attempt, serving/docs is
    rebuilt wholesale."""
    import pyarrow.parquet as pq
    import ray.data

    d = str(tmp_path / "idx")
    staging = os.path.join(d, "_staging-epoch-0001")
    # fabricate a crashed attempt: an orphan docs file from a dead launch
    # and stale serving files with tags the rerun won't regenerate
    orphan_docs = os.path.join(staging, "docs-deadbeef")
    os.makedirs(orphan_docs)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(orphan_docs, "docs-orphan.parquet"),
    )
    for sub, fname in (
        ("post/bucket=0", "post-hot999.parquet"),
        ("post/bucket=0", "post-cold7.parquet"),
        ("docs/bucket=0", "docs-stale-0.parquet"),
    ):
        p = os.path.join(staging, "serving", sub)
        os.makedirs(p, exist_ok=True)
        pq.write_table(pa.table({"x": pa.array([0])}), os.path.join(p, fname))

    man = ckb.build_index(
        ray.data.from_arrow(tiny_corpus), d,
        ckb.IndexConfig(num_parts=4), resume=True,
    )
    assert man["num_docs"] == tiny_corpus.num_rows
    epoch = os.path.join(d, man["epoch_dir"])
    leftovers = []
    for root, _, files in os.walk(os.path.join(epoch, "serving")):
        for f in files:
            if "hot999" in f or "cold7" in f or "stale" in f:
                leftovers.append(os.path.join(root, f))
    assert not leftovers, leftovers
    # committed docs table holds exactly the corpus rows (no orphan rows)
    docs = pads.dataset(os.path.join(epoch, "docs")).to_table()
    assert docs.num_rows == tiny_corpus.num_rows
    # ... and the serving docs projection as well
    sdocs = pads.dataset(
        os.path.join(epoch, "serving", "docs"), partitioning="hive"
    ).to_table()
    assert sdocs.num_rows == tiny_corpus.num_rows


def test_default_config_salts_at_scale(ray_session):
    """The DEFAULT IndexConfig must salt hot terms once the corpus is
    big enough (>=2000 sampled docs) — so the driver-entry/document
    pipelines are the same pipelines you'd run at 100x — while small
    test corpora stay unsalted and byte-identical to the legacy
    default."""
    import pyarrow as pa
    import ray.data

    from ck_ray.build import IndexConfig, estimate_hot_terms

    assert IndexConfig().hot_df_threshold == "auto"

    def corpus(n):
        return ray.data.from_arrow(
            pa.table(
                {
                    "repo": ["r"] * n,
                    "path": [f"f{i}.py" for i in range(n)],
                    "commit": ["0"] * n,
                    "lang": ["python"] * n,
                    # "everyterm" in every doc (df 100%), rare{i} unique
                    "content": [f"everyterm rare{i}" for i in range(n)],
                }
            )
        )

    # auto rule engages at >=2000 sampled docs: universal term is hot
    hot = estimate_hot_terms(corpus(2500), None, sample_docs=2048)
    assert "everyterm" in hot
    assert not any(t.startswith("rare") for t in hot)
    # ... and stays OFF for small corpora (tests build unsalted)
    assert estimate_hot_terms(corpus(500), None, sample_docs=2048) == frozenset()
