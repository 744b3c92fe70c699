"""Structural (AST) chunking — the reference's tree-sitter chunker
re-expressed on Python's stdlib ``ast``.

Mirrors the observable semantics of ``ck-chunk`` (reference driver
``ck-chunk/src/lib.rs:411-458``, per-language query chunker
``ck-chunk/src/query_chunker.rs:10-121``):

- **captures**: every function / async function / class definition at any
  nesting depth becomes a chunk with a 1-indexed inclusive line span;
  decorators are part of the span. ``chunk_type`` is ``class``,
  ``method`` (def whose nearest capture ancestor is a class) or
  ``function``; nested defs inside functions are ``function``.
- **ancestry / breadcrumbs** (reference ``ck-chunk/src/lib.rs:57-126``):
  each chunk carries ``breadcrumb`` (dotted ancestor names incl. itself,
  e.g. ``Outer.Inner.method``) and ``depth`` (number of capture
  ancestors).
- **containment suppression** (reference
  ``ck-chunk/src/query_chunker.rs:269-340``): when two captures produce
  the IDENTICAL span, only the shallowest survives.
- **gap fill** (reference ``query_chunker.rs:430-560``): line ranges not
  covered by any depth-0 capture are emitted as ``text`` chunks, so the
  union of depth-0 + text chunks covers every line exactly once.
- **striding** (reference ``ck-chunk/src/lib.rs:1945-2060``): with
  ``max_lines`` set, any chunk longer than the budget is split into
  overlapping windows; stride j keeps the parent's type/breadcrumb with
  a ``#s{j}`` suffix.

Languages without a parser here (everything but Python) and unparseable
Python fall back to the generic line-window chunker — the same
single-swap-point contract the reference uses for languages without a
tree-sitter grammar.
"""

from __future__ import annotations

import ast as _ast

import pyarrow as pa

from .ids import doc_id_column


def _python_captures(src: str) -> list[tuple[int, int, str, str, int]]:
    """(line_start, line_end, chunk_type, breadcrumb, depth) per capture.

    Raises SyntaxError for non-Python input (caller falls back)."""
    tree = _ast.parse(src)
    out: list[tuple[int, int, str, str, int]] = []

    def walk(node, crumbs: tuple[str, ...], parent_is_class: bool) -> None:
        for child in _ast.iter_child_nodes(node):
            if isinstance(
                child, (_ast.FunctionDef, _ast.AsyncFunctionDef, _ast.ClassDef)
            ):
                start = min(
                    [child.lineno]
                    + [d.lineno for d in child.decorator_list]
                )
                end = child.end_lineno or child.lineno
                if isinstance(child, _ast.ClassDef):
                    ctype = "class"
                elif parent_is_class:
                    ctype = "method"
                else:
                    ctype = "function"
                crumb = ".".join((*crumbs, child.name))
                out.append((start, end, ctype, crumb, len(crumbs)))
                walk(
                    child, (*crumbs, child.name),
                    isinstance(child, _ast.ClassDef),
                )
            else:
                # structural pass-through (if/try/with blocks keep the
                # current ancestry)
                walk(child, crumbs, parent_is_class)

    walk(tree, (), False)
    return out


def _suppress_contained(
    caps: list[tuple[int, int, str, str, int]],
) -> list[tuple[int, int, str, str, int]]:
    """Identical-span dedup: keep the shallowest capture per span."""
    best: dict[tuple[int, int], tuple[int, int, str, str, int]] = {}
    for c in caps:
        key = (c[0], c[1])
        if key not in best or c[4] < best[key][4]:
            best[key] = c
    return list(best.values())


def _gap_fill(
    caps: list[tuple[int, int, str, str, int]], n_lines: int
) -> list[tuple[int, int, str, str, int]]:
    """``text`` chunks for every line range no depth-0 capture covers."""
    top = sorted([c for c in caps if c[4] == 0], key=lambda c: c[0])
    gaps = []
    cur = 1
    for s, e, *_ in top:
        if s > cur:
            gaps.append((cur, s - 1, "text", "", 0))
        cur = max(cur, e + 1)
    if cur <= n_lines:
        gaps.append((cur, n_lines, "text", "", 0))
    return gaps


def _stride(
    caps: list[tuple[int, int, str, str, int]],
    max_lines: int | None,
    overlap: int,
) -> list[tuple[int, int, str, str, int]]:
    if max_lines is None:
        return caps
    step = max(1, max_lines - overlap)
    out = []
    for s, e, ctype, crumb, depth in caps:
        if e - s + 1 <= max_lines:
            out.append((s, e, ctype, crumb, depth))
            continue
        j = 0
        cur = s
        while cur <= e:
            ce = min(cur + max_lines - 1, e)
            out.append((cur, ce, ctype, f"{crumb}#s{j}", depth))
            if ce == e:
                break
            cur += step
            j += 1
    return out


def python_chunks(
    src: str, *, max_lines: int | None = None, overlap: int = 4
) -> list[tuple[int, int, str, str, int]]:
    """Full chunk list for one Python source: captures + containment
    suppression + gap fill (+ optional striding), ordered parents-first
    ``(line_start asc, line_end desc, depth asc)``."""
    caps = _suppress_contained(_python_captures(src))
    n_lines = len(src.splitlines())
    rows = caps + _gap_fill(caps, n_lines)
    rows = _stride(rows, max_lines, overlap)
    rows.sort(key=lambda c: (c[0], -c[1], c[4]))
    return rows


def line_window_chunks(
    n_lines: int, *, target_lines: int = 20, overlap_lines: int = 4
) -> list[tuple[int, int, str, str, int]]:
    """Generic fallback: fixed line windows with overlap (the reference's
    generic chunker, ``ck-chunk/src/lib.rs:299-372``)."""
    step = max(1, target_lines - overlap_lines)
    out = []
    s = 0
    while s < n_lines:
        e = min(s + target_lines, n_lines)
        out.append((s + 1, e, "text", "", 0))
        if e == n_lines:
            break
        s += step
    return out


def ast_chunk_batch(
    t: pa.Table,
    *,
    max_lines: int | None = None,
    overlap: int = 4,
    fallback_target: int = 20,
    fallback_overlap: int = 4,
) -> pa.Table:
    """Flat-map over a corpus batch -> structural chunk rows.

    Python rows (by ``lang``) go through the AST chunker; other
    languages and unparseable Python fall back to line windows."""
    doc_ids = doc_id_column(t["repo"], t["path"], t["commit"]).to_numpy()
    paths = t["path"].to_pylist()
    langs = t["lang"].to_pylist() if "lang" in t.column_names else [""] * t.num_rows
    cols: dict[str, list] = {
        "doc_id": [], "path": [], "chunk_id": [], "chunk_type": [],
        "breadcrumb": [], "depth": [], "line_start": [], "line_end": [],
        "text": [],
    }
    for i, content in enumerate(t["content"].to_pylist()):
        lines = content.splitlines()
        if not lines:
            continue
        rows = None
        if langs[i] == "python":
            try:
                rows = python_chunks(
                    content, max_lines=max_lines, overlap=overlap
                )
            except (SyntaxError, ValueError, RecursionError):
                rows = None
        if rows is None:
            rows = line_window_chunks(
                len(lines),
                target_lines=fallback_target,
                overlap_lines=fallback_overlap,
            )
            if max_lines is not None:
                rows = _stride(rows, max_lines, overlap)
        for cid, (s, e, ctype, crumb, depth) in enumerate(rows):
            cols["doc_id"].append(doc_ids[i])
            cols["path"].append(paths[i])
            cols["chunk_id"].append(cid)
            cols["chunk_type"].append(ctype)
            cols["breadcrumb"].append(crumb)
            cols["depth"].append(depth)
            cols["line_start"].append(s)
            cols["line_end"].append(e)
            cols["text"].append("\n".join(lines[s - 1 : e]))
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "path": pa.array(cols["path"], pa.string()),
            "chunk_id": pa.array(cols["chunk_id"], pa.int32()),
            "chunk_type": pa.array(cols["chunk_type"], pa.string()),
            "breadcrumb": pa.array(cols["breadcrumb"], pa.string()),
            "depth": pa.array(cols["depth"], pa.int32()),
            "line_start": pa.array(cols["line_start"], pa.int32()),
            "line_end": pa.array(cols["line_end"], pa.int32()),
            "text": pa.array(cols["text"], pa.string()),
        }
    )
