"""Regex search mode: grep-compatible line scan over the corpus.

Reference semantics (``ck-engine/src/lib.rs:387-450,684-727``):
- pattern options: ``fixed_string`` (escape), ``whole_word`` (wrap in
  ``\\b``), ``case_insensitive``;
- empty pattern matches every line once (grep compat);
- results ordered by (path, line_start), truncated to top_k;
- line numbers 1-indexed; handles ``\\n`` / ``\\r\\n`` / bare ``\\r``.

Implementation: explode content into lines with a vectorized RE2 split,
then one vectorized ``match_substring_regex`` over the flattened line
array — no per-row Python in the hot path.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

LINE_SPLIT = r"\r\n|\n|\r"


def build_pattern(
    pattern: str,
    *,
    fixed_string: bool = False,
    whole_word: bool = False,
    case_insensitive: bool = False,
) -> str:
    p = re.escape(pattern) if fixed_string else pattern
    if whole_word:
        p = rf"\b(?:{p})\b"
    if case_insensitive:
        p = f"(?i){p}"
    return p


def regex_search(
    corpus: str | ray.data.Dataset,
    pattern: str,
    *,
    fixed_string: bool = False,
    whole_word: bool = False,
    case_insensitive: bool = False,
    top_k: int | None = None,
    before: int = 0,
    after: int = 0,
) -> pd.DataFrame:
    """Line-level matches: (repo, path, line_no, line) sorted grep-style.

    ``before``/``after`` attach -B/-A context (reference
    ``ck-engine/src/lib.rs:1218-1229``) as a joined ``context`` column."""
    ds = (
        ray.data.read_parquet(corpus, columns=["repo", "path", "content"])
        if isinstance(corpus, str)
        else corpus
    )
    rx = build_pattern(
        pattern,
        fixed_string=fixed_string,
        whole_word=whole_word,
        case_insensitive=case_insensitive,
    )
    match_all = pattern == ""  # grep compat: empty pattern hits every line

    def scan(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern_regex(t["content"].combine_chunks(), pattern=LINE_SPLIT)
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        offsets = lines.offsets.to_numpy(zero_copy_only=False)
        # 1-indexed line numbers within each doc
        line_no = (np.arange(len(parents)) - offsets[:-1][parents] + 1).astype(np.int64)
        if match_all:
            hit = np.ones(len(parents), dtype=bool)
            # a trailing newline yields a final empty artifact line; grep
            # does not report a line after the last terminator
            lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
            is_last = np.concatenate((parents[1:] != parents[:-1], [True]))
            hit &= ~((lens == 0) & is_last)
        else:
            hit = pc.match_substring_regex(flat, rx).to_numpy(zero_copy_only=False)
        idx = np.nonzero(hit)[0]
        take = pa.array(idx)
        cols = {
            "repo": t["repo"].take(pa.array(parents[idx])),
            "path": t["path"].take(pa.array(parents[idx])),
            "line_no": pa.array(line_no[idx]),
            "line": flat.take(take),
        }
        if before or after:
            all_lines = flat.to_pylist()
            ctx = []
            for i in idx:
                doc = parents[i]
                lo = i
                while lo > 0 and parents[lo - 1] == doc and i - lo < before:
                    lo -= 1
                hi = i
                while (
                    hi + 1 < len(parents)
                    and parents[hi + 1] == doc
                    and hi - i < after
                ):
                    hi += 1
                ctx.append("\n".join(all_lines[lo : hi + 1]))
            cols["context"] = pa.array(ctx, pa.string())
        return pa.table(cols)

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"repo": pd.Series([], dtype="str"), "path": pd.Series([], dtype="str"),
             "line_no": pd.Series([], dtype="int64"), "line": pd.Series([], dtype="str")}
        )
    out = out.sort_values(["path", "line_no"]).reset_index(drop=True)
    if top_k is not None:
        out = out.head(top_k)
    return out


def full_sections(
    corpus: "str | ray.data.Dataset",
    hits: pd.DataFrame,
    *,
    target_lines: int = 20,
    overlap_lines: int = 4,
) -> pd.DataFrame:
    """--full-section: expand line hits to their containing chunk.

    The reference maps a match line to its tree-sitter Function/Class
    chunk (``ck-engine/src/lib.rs:1231-1283``); here the containing chunk
    is the generic line-window chunk (same chunker as the semantic index),
    fetched by a broadcast semi-join of the hit files against the corpus —
    only matched documents are ever split."""
    if hits.empty:
        return hits.assign(sec_start=[], sec_end=[], section=[])
    ds = (
        ray.data.read_parquet(corpus, columns=["repo", "path", "content"])
        if isinstance(corpus, str)
        else corpus
    )
    import ray as _ray

    wanted = hits.groupby(["repo", "path"])["line_no"].apply(list).to_dict()
    wref = _ray.put(wanted)
    step = max(1, target_lines - overlap_lines)

    def expand(t: pa.Table) -> pa.Table:
        w = _ray.get(wref)
        out = {"repo": [], "path": [], "line_no": [],
               "sec_start": [], "sec_end": [], "section": []}
        for repo, path, content in zip(
            t["repo"].to_pylist(), t["path"].to_pylist(), t["content"].to_pylist()
        ):
            lines_wanted = w.get((repo, path))
            if not lines_wanted:
                continue
            lines = re.split(LINE_SPLIT, content)
            for ln in lines_wanted:
                # containing window = the chunk with the largest start <= line
                s = ((ln - 1) // step) * step
                s = min(s, max(0, len(lines) - target_lines))
                e = min(s + target_lines, len(lines))
                out["repo"].append(repo)
                out["path"].append(path)
                out["line_no"].append(ln)
                out["sec_start"].append(s + 1)
                out["sec_end"].append(e)
                out["section"].append("\n".join(lines[s:e]))
        return pa.table(
            {k: pa.array(v) for k, v in out.items()}
        ) if out["repo"] else pa.table(
            {"repo": pa.array([], pa.string()), "path": pa.array([], pa.string()),
             "line_no": pa.array([], pa.int64()), "sec_start": pa.array([], pa.int64()),
             "sec_end": pa.array([], pa.int64()), "section": pa.array([], pa.string())}
        )

    out = ds.map_batches(expand, batch_format="pyarrow").to_pandas()
    return out.sort_values(["path", "line_no"]).reset_index(drop=True)


def files_with_matches(
    corpus: "str | ray.data.Dataset", pattern: str, invert: bool = False, **kw
) -> pd.DataFrame:
    """grep -l / -L: distinct matching (or non-matching) file paths."""
    ds = (
        ray.data.read_parquet(corpus, columns=["repo", "path", "content"])
        if isinstance(corpus, str)
        else corpus
    )
    rx = build_pattern(pattern, **kw)

    def scan(t: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(t["content"], rx)
        if invert:
            m = pc.invert(m)
        sub = t.filter(m)
        return pa.table({"repo": sub["repo"], "path": sub["path"]})

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame({"repo": pd.Series([], dtype="str"),
                             "path": pd.Series([], dtype="str")})
    return (
        out.drop_duplicates().sort_values(["repo", "path"]).reset_index(drop=True)
    )
