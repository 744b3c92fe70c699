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
