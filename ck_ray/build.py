"""SPIMI-style inverted-index build as a Ray Data pipeline.

Pipeline shape (SURVEY.md §7.2; replaces the reference's tantivy builder,
reference ``ck-engine/src/lib.rs:847-890``, which indexes one doc per file
with fields ``content`` and ``path``):

    read_parquet(corpus)                            (repo,path,commit,lang,content)
      ├─ map_batches(docs)      -> doc table        (doc_id, sha256, metadata)
      └─ map_batches(tokenize)  -> posting triples  (field, term, doc_id, tf, dl, positions, part)
           groupby(part).map_groups(build_segment)  -> per-partition segment
           parquet + lineage rows (the ONLY all-to-all shuffle)

- ``part = fnv64(field, term) % num_parts`` so a term's full posting list
  lands in exactly one partition — global df falls out of the group, no
  separate stats shuffle. Doc lengths are stored inline per posting, so
  no global doc_id->dl map is ever built.
- Hot-term skew (``def``/``return``/``the`` …): terms whose estimated df
  exceeds ``hot_df_threshold`` are salted by doc_id *range* bucket
  (monotone in doc_id, so per-salt runs concatenate into a valid
  delta-encoded list); a second, small merge stage rebuilds the full list.
  Output is byte-identical to the unsalted path (tested).
- Corpus-level stats (total tokens per field) are folded into the lineage
  rows each partition returns — no extra pass over the data.
- Resumability: every partition writes its segment atomically
  (tmp + rename) plus a ``_lineage-{part}.json`` marker into a staging
  epoch dir; a resumed build skips completed partitions (anti-join on the
  marker set, applied BEFORE the shuffle) and the final manifest commit is
  a single atomic rename + manifest write — mirroring the reference's
  atomic sidecar/manifest protocol (``ck-index/src/lib.rs:1504-1523``).

Nothing here calls ``ray.init()``; the caller owns the session.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from . import codec
from .ids import doc_id_column, sha256_hex_column, term_hash
from .tokenizer import term_frequencies

FIELDS = ("content", "path")  # field_id = index; reference indexes both
MANIFEST_NAME = "manifest.json"


@dataclass
class IndexConfig:
    num_parts: int = 8
    store_positions: bool = True
    batch_size: int = 256  # docs per tokenize batch (code files are ~KBs)
    # Skew handling: terms with estimated df >= threshold get salted into
    # doc_id-range buckets. None disables salting (fine till ~10M docs/part).
    hot_df_threshold: int | None = None
    salt_buckets: int = 8
    df_sample_docs: int = 2048  # docs sampled to estimate hot terms
    dedupe_keep_latest: bool = False


# ---------------------------------------------------------------- doc stage


def _docs_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": doc_id_column(batch["repo"], batch["path"], batch["commit"]),
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "content_sha256": sha256_hex_column(batch["content"]),
            "n_bytes": pc.binary_length(batch["content"]).cast(pa.int64()),
        }
    )


# ------------------------------------------------------------ triples stage


class _TriplesBatcher:
    """Tokenize a corpus batch into posting triples (stateless function —
    kept as a class only to close over config)."""

    def __init__(self, num_parts: int, store_positions: bool,
                 hot_terms: frozenset[str] | None, salt_buckets: int):
        self.num_parts = num_parts
        self.store_positions = store_positions
        self.hot_terms = hot_terms
        self.salt_buckets = salt_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = doc_id_column(batch["repo"], batch["path"], batch["commit"])
        doc_ids_np = doc_ids.to_numpy()
        pieces = []
        for fid, fname in enumerate(FIELDS):
            tf_t, _dl = term_frequencies(
                batch[fname], with_positions=self.store_positions
            )
            rows = tf_t["row"].to_numpy()
            dl_of_row = _dl  # int32 per batch row
            n = len(rows)
            field_arr = np.full(n, fid, dtype=np.int8)
            cols = {
                "field": pa.array(field_arr),
                "term": tf_t["term"],
                "doc_id": pa.array(doc_ids_np[rows], type=pa.int64()),
                "tf": tf_t["tf"].cast(pa.int32()),
                "dl": pa.array(dl_of_row[rows], type=pa.int32()),
            }
            if self.store_positions:
                cols["positions"] = tf_t["positions"].cast(pa.list_(pa.int32()))
            h = term_hash(tf_t["term"], field_arr)
            part = (h % np.uint64(self.num_parts)).astype(np.int32)
            if self.hot_terms:
                hot = pc.is_in(
                    tf_t["term"], value_set=pa.array(sorted(self.hot_terms))
                ).to_numpy(zero_copy_only=False)
                # salt = doc_id RANGE bucket (top bits, power-of-two count) so
                # each salt covers a contiguous doc_id range and per-salt runs
                # concatenate back into a sorted list. Monotone in doc_id.
                bits = max(1, self.salt_buckets.bit_length() - 1)
                salt = (
                    doc_ids_np[rows].astype(np.uint64) >> np.uint64(63 - bits)
                ).astype(np.uint64)
                h_salt = ((h ^ (salt * np.uint64(0x9E3779B97F4A7C15)))
                          % np.uint64(self.num_parts))
                part = np.where(
                    hot, (self.num_parts + h_salt).astype(np.int32), part
                )
                cols["salt"] = pa.array(
                    np.where(hot, salt, 0).astype(np.int32)
                )
            cols["part"] = pa.array(part)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)


# ------------------------------------------------------------ segment stage


def _term_runs(
    sorted_t: pa.Table, salts: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Run boundaries of (field, term[, salt]) over a sorted table.

    ``salt`` is monotone in doc_id, so a (field, term, doc_id) sort already
    groups salts contiguously — it only needs to contribute to the change
    mask, not the sort."""
    fields = sorted_t["field"].to_numpy(zero_copy_only=False)
    term_idx = pc.dictionary_encode(
        sorted_t["term"].combine_chunks()
    ).indices.to_numpy(zero_copy_only=False)
    n = len(fields)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or(
        fields[1:] != fields[:-1], term_idx[1:] != term_idx[:-1], out=change[1:]
    )
    if salts is not None:
        change[1:] |= salts[1:] != salts[:-1]
    starts = np.nonzero(change)[0]
    ends = np.concatenate((starts[1:], [n]))
    return starts, ends


def _build_segment_table(
    group: pa.Table, store_positions: bool, keep_salt: bool = False
) -> tuple[pa.Table, dict]:
    """Encode one shuffle partition's triples into segment rows + stats."""
    sort_keys = [("field", "ascending"), ("term", "ascending"), ("doc_id", "ascending")]
    t = group.sort_by(sort_keys).combine_chunks()
    salts = (
        t["salt"].to_numpy(zero_copy_only=False)
        if keep_salt and "salt" in t.column_names
        else None
    )
    starts, ends = _term_runs(t, salts)
    fields = t["field"].to_numpy(zero_copy_only=False)
    terms = t["term"]
    docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    tfs = t["tf"].to_numpy(zero_copy_only=False)
    dls = t["dl"].to_numpy(zero_copy_only=False)
    pos_vals = pos_offs = None
    if store_positions and "positions" in t.column_names:
        plist = t["positions"].combine_chunks()
        pos_vals = plist.values.to_numpy(zero_copy_only=False)
        pos_offs = plist.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

    out_field, out_term_idx, out_df, out_cf = [], [], [], []
    postings_blobs, skips_blobs, pos_blobs = [], [], []
    for s, e in zip(starts, ends):
        d, f, l = docs[s:e], tfs[s:e], dls[s:e]
        blob, skips = codec.encode_posting_list(d, f, l)
        postings_blobs.append(blob)
        skips_blobs.append(skips)
        out_field.append(fields[s])
        out_term_idx.append(s)
        out_df.append(e - s)
        out_cf.append(int(f.sum()))
        if pos_vals is not None:
            pos_blobs.append(
                codec.encode_positions(pos_vals[pos_offs[s] : pos_offs[e]], f)
            )
    seg_cols = {
        "field": pa.array(np.array(out_field, dtype=np.int8)),
        "term": terms.take(pa.array(out_term_idx, type=pa.int64())),
        "df": pa.array(np.array(out_df, dtype=np.int64)),
        "cf": pa.array(out_cf, type=pa.int64()),
        "postings": pa.array(postings_blobs, type=pa.large_binary()),
        "skips": pa.array(skips_blobs, type=pa.large_binary()),
    }
    if pos_vals is not None:
        seg_cols["positions"] = pa.array(pos_blobs, type=pa.large_binary())
    if keep_salt:
        seg_cols["first_doc"] = pa.array(
            docs[starts].astype(np.int64), type=pa.int64()
        )
    stats = {
        "n_terms": len(starts),
        "n_postings": int(len(docs)),
        "sum_tf_content": int(tfs[fields == 0].sum()),
        "sum_tf_path": int(tfs[fields == 1].sum()),
    }
    return pa.table(seg_cols), stats


def _atomic_write_parquet(table: pa.Table, final_path: str) -> str:
    tmp = f"{final_path}.tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    sha = hashlib.sha256(open(tmp, "rb").read()).hexdigest()
    os.replace(tmp, final_path)
    return sha


class _SegmentWriter:
    """map_groups callable: encode + atomically write one partition."""

    def __init__(self, seg_dir: str, store_positions: bool, kind: str = "cold"):
        self.seg_dir = seg_dir
        self.store_positions = store_positions
        self.kind = kind
        self.__name__ = f"write_segment_{kind}"  # map_groups wants a name

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        table, stats = _build_segment_table(
            group.drop_columns(["part"]), self.store_positions
        )
        pdir = os.path.join(self.seg_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        fname = f"seg-{self.kind}.parquet"
        sha = _atomic_write_parquet(table, os.path.join(pdir, fname))
        lineage = {
            "part": part,
            "file": fname,
            "sha256": sha,
            "kind": self.kind,
            **stats,
        }
        with open(os.path.join(pdir, f"_lineage-{self.kind}.json"), "w") as fh:
            json.dump(lineage, fh)
        return pa.table(
            {k: pa.array([v]) for k, v in lineage.items() if k != "file"}
            | {"file": pa.array([fname])}
        )


# ------------------------------------------------------------------- build


def estimate_hot_terms(
    ds: ray.data.Dataset, threshold: int, sample_docs: int
) -> frozenset[str]:
    """Estimate terms whose corpus df will exceed ``threshold`` from a doc
    sample (selection only steers salting; any set yields identical output)."""
    sample = ds.limit(sample_docs)
    dfs: dict[str, int] = {}
    n_seen = 0
    for batch in sample.iter_batches(batch_size=256, batch_format="pyarrow"):
        n_seen += batch.num_rows
        for fname in FIELDS:
            tf_t, _ = term_frequencies(batch[fname], with_positions=False)
            for term in tf_t["term"].to_pylist():
                dfs[term] = dfs.get(term, 0) + 1
    if n_seen == 0:
        return frozenset()
    total = ds.count()
    scale = max(1.0, total / n_seen)
    return frozenset(t for t, c in dfs.items() if c * scale >= threshold)


def _merge_salted_runs(runs_ds: ray.data.Dataset, seg_dir: str,
                       num_parts: int, store_positions: bool) -> list[dict]:
    """Second (small) stage: concatenate each hot term's doc-range runs back
    into one posting list, byte-identical to the unsalted encoding."""

    def merge_group(g: pa.Table) -> pa.Table:
        g = g.sort_by([("first_doc", "ascending")])
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for i in range(g.num_rows):
            d, f, l = codec.decode_posting_list(g["postings"][i].as_py())
            docs_l.append(d)
            tfs_l.append(f)
            dls_l.append(l)
            if store_positions:
                flat, _ = codec.decode_positions(g["positions"][i].as_py(), f)
                pos_l.append(flat)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        blob, skips = codec.encode_posting_list(docs, tfs, dls)
        cols = {
            "field": g["field"].slice(0, 1),
            "term": g["term"].slice(0, 1),
            "df": pa.array([len(docs)], pa.int64()),
            "cf": pa.array([int(tfs.sum())], pa.int64()),
            "postings": pa.array([blob], pa.large_binary()),
            "skips": pa.array([skips], pa.large_binary()),
        }
        if store_positions:
            cols["positions"] = pa.array(
                [codec.encode_positions(np.concatenate(pos_l), tfs)],
                pa.large_binary(),
            )
        fid = int(g["field"][0].as_py())
        term = g["term"][0].as_py()
        from .ids import term_hash_one

        cols["part"] = pa.array(
            [term_hash_one(term, fid) % num_parts], pa.int32()
        )
        return pa.table(cols)

    merged = runs_ds.groupby(["field", "term"]).map_groups(
        merge_group, batch_format="pyarrow"
    )

    def write_hot(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        table = group.drop_columns(["part"])
        pdir = os.path.join(seg_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        fname = "seg-hot.parquet"
        sha = _atomic_write_parquet(table, os.path.join(pdir, fname))
        lineage = {
            "part": part, "file": fname, "sha256": sha, "kind": "hot",
            "n_terms": table.num_rows,
            "n_postings": int(pc.sum(table["df"]).as_py() or 0),
            "sum_tf_content": int(
                pc.sum(pc.if_else(pc.equal(table["field"], 0), table["cf"], 0)).as_py() or 0
            ),
            "sum_tf_path": int(
                pc.sum(pc.if_else(pc.equal(table["field"], 1), table["cf"], 0)).as_py() or 0
            ),
        }
        with open(os.path.join(pdir, "_lineage-hot.json"), "w") as fh:
            json.dump(lineage, fh)
        return pa.table({k: pa.array([v]) for k, v in lineage.items()})

    out = merged.groupby("part").map_groups(write_hot, batch_format="pyarrow")
    return out.to_pandas().to_dict("records")


def build_index(
    corpus: str | ray.data.Dataset,
    index_dir: str,
    config: IndexConfig | None = None,
    *,
    resume: bool = False,
    epoch: str | None = None,
) -> dict:
    """Build (or resume building) the index; returns the committed manifest."""
    cfg = config or IndexConfig()
    ds = (
        ray.data.read_parquet(corpus)
        if isinstance(corpus, str)
        else corpus
    )
    os.makedirs(index_dir, exist_ok=True)
    epoch = epoch or "epoch-0001"
    staging = os.path.join(index_dir, f"_staging-{epoch}")
    final_dir = os.path.join(index_dir, epoch)
    if os.path.exists(final_dir) and not resume:
        raise FileExistsError(f"{final_dir} already committed")
    os.makedirs(staging, exist_ok=True)
    docs_dir = os.path.join(staging, "docs")
    seg_dir = os.path.join(staging, "segments")
    os.makedirs(seg_dir, exist_ok=True)

    # ---- doc table (stateless map; resumable as a unit)
    docs_done = os.path.join(staging, "_docs_done.json")
    if not (resume and os.path.exists(docs_done)):
        ds.map_batches(
            _docs_batch, batch_format="pyarrow", batch_size=cfg.batch_size
        ).write_parquet(docs_dir)
        n_docs = sum(
            pq.read_metadata(os.path.join(docs_dir, f)).num_rows
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
        with open(docs_done, "w") as fh:
            json.dump({"n_docs": n_docs}, fh)
    n_docs = json.load(open(docs_done))["n_docs"]
    if n_docs <= 2_000_000:  # content-addressed id uniqueness (cheap at test scale)
        import pyarrow.dataset as pads

        idcol = pads.dataset(docs_dir).to_table(columns=["doc_id"])["doc_id"]
        if len(pc.unique(idcol)) != n_docs:
            raise RuntimeError("doc_id collision — content-addressed ids not unique")

    # ---- hot-term estimate (optional)
    hot_terms: frozenset[str] | None = None
    if cfg.hot_df_threshold is not None:
        hot_terms = estimate_hot_terms(ds, cfg.hot_df_threshold, cfg.df_sample_docs)

    # ---- resume bookkeeping: parts already on disk are skipped pre-shuffle
    done_parts: set[int] = set()
    hot_done = False
    if resume:
        for d in os.listdir(seg_dir) if os.path.exists(seg_dir) else []:
            lj = os.path.join(seg_dir, d, "_lineage-cold.json")
            if os.path.exists(lj):
                rec = json.load(open(lj))
                f = os.path.join(seg_dir, d, rec["file"])
                if os.path.exists(f) and hashlib.sha256(
                    open(f, "rb").read()
                ).hexdigest() == rec["sha256"]:
                    done_parts.add(rec["part"])

    # ---- tokenize -> triples -> groupby(part) -> encoded segments
    triples = ds.map_batches(
        _TriplesBatcher(
            cfg.num_parts, cfg.store_positions, hot_terms, cfg.salt_buckets
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    if done_parts:
        skip = pa.array(sorted(done_parts), pa.int32())
        triples = triples.map_batches(
            lambda t, s=skip: t.filter(
                pc.invert(pc.is_in(t["part"], value_set=s))
            ),
            batch_format="pyarrow",
        )

    cold = triples
    lineage: list[dict] = []
    if hot_terms:
        cold = triples.map_batches(
            lambda t, p=cfg.num_parts: t.filter(pc.less(t["part"], p)),
            batch_format="pyarrow",
        )
        hot_triples = triples.map_batches(
            lambda t, p=cfg.num_parts: t.filter(pc.greater_equal(t["part"], p)),
            batch_format="pyarrow",
        )
        # salted runs: encode per (part=hash(term,salt)) group with first_doc
        runs_dir = os.path.join(staging, "runs")
        os.makedirs(runs_dir, exist_ok=True)

        def build_run(group: pa.Table) -> pa.Table:
            t, _ = _build_segment_table(
                group.drop_columns(["part"]), cfg.store_positions, keep_salt=True
            )
            return t

        runs = hot_triples.groupby("part").map_groups(
            build_run, batch_format="pyarrow"
        )
        lineage += _merge_salted_runs(
            runs, seg_dir, cfg.num_parts, cfg.store_positions
        )

    seg_lineage_ds = cold.groupby("part").map_groups(
        _SegmentWriter(seg_dir, cfg.store_positions, kind="cold"),
        batch_format="pyarrow",
    )
    lineage += seg_lineage_ds.to_pandas().to_dict("records")
    # previously-done parts re-enter the manifest from their markers
    for p in sorted(done_parts):
        lineage.append(json.load(open(os.path.join(seg_dir, f"part={p}", "_lineage-cold.json"))))

    total_content = int(sum(r["sum_tf_content"] for r in lineage))
    total_path = int(sum(r["sum_tf_path"] for r in lineage))
    manifest = {
        "version": 1,
        "epoch": epoch,
        "num_docs": n_docs,
        "num_parts": cfg.num_parts,
        "store_positions": cfg.store_positions,
        "fields": {
            "content": {
                "field_id": 0,
                "total_tokens": total_content,
                "avgdl": (total_content / n_docs) if n_docs else 0.0,
            },
            "path": {
                "field_id": 1,
                "total_tokens": total_path,
                "avgdl": (total_path / n_docs) if n_docs else 0.0,
            },
        },
        "parts": sorted(lineage, key=lambda r: (r["part"], r.get("kind", "cold"))),
        "hot_terms": sorted(hot_terms) if hot_terms else [],
    }
    with open(os.path.join(staging, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1)
    # ---- atomic commit: staging dir -> epoch dir, then root manifest
    os.replace(staging, final_dir)
    root_manifest = dict(manifest, epoch_dir=epoch)
    tmp = os.path.join(index_dir, f".{MANIFEST_NAME}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(root_manifest, fh, indent=1)
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))
    return root_manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as fh:
        return json.load(fh)
