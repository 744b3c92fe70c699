"""Filesystem corpus sources — the reference's primary input shape.

``read_code_dir`` is the Ray-Data mapping of the reference's
gitignore-aware walk (``collect_files``, ck-index/src/lib.rs:211-262):
a recursive directory walk honoring hierarchical ``.gitignore`` +
``.ckignore`` files (last-match-wins, ``!`` negation, dir-only and
anchored patterns — the subset of gitignore(5) the reference's
``ignore`` crate applies), hidden-file and default-exclude rules
(ck-core/src/lib.rs:417-453), the NUL-byte binary sniff
(ck-index/src/lib.rs:1598-1625) and extension→language detection
(ck-core/src/lib.rs:63-95), emitting the engine's corpus schema
``(repo, path, commit, lang, content)``.

Scale shape: the WALK touches driver-side metadata only (path strings —
the same work the reference does single-node, and cheap even at millions
of paths); file CONTENT is read inside parallel Ray read tasks
(``ray.data.read_binary_files``), so bytes never pass through the
driver, and the decode/sniff runs as a vectorized ``map_batches`` stage.
On a multi-node cluster the walked tree must be on shared storage
(NFS / object store via fsspec), which is how such corpora are mounted;
the per-file reads then fan out to whichever node runs the read task.

``read_corpus_jsonl`` reads a newline-delimited-JSON corpus into the
same schema (``ray.data.read_json`` underneath) — a second source
format for corpora exported by scrapers rather than repo checkouts.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import pyarrow as pa

__all__ = ["read_code_dir", "read_corpus_jsonl", "walk_code_files"]

# Reference Language enum, extension-keyed (ck-core/src/lib.rs:39-95);
# unknown extensions map to "" like the synthetic corpus does.
LANG_BY_EXT = {
    "rs": "rust", "py": "python", "js": "javascript", "jsx": "javascript",
    "ts": "typescript", "tsx": "typescript", "go": "go", "java": "java",
    "c": "c", "h": "c", "cpp": "cpp", "cc": "cpp", "cxx": "cpp",
    "hpp": "cpp", "rb": "ruby", "hs": "haskell", "php": "php",
    "swift": "swift", "kt": "kotlin", "scala": "scala", "cs": "csharp",
    "sh": "shell", "bash": "shell", "md": "markdown", "txt": "text",
}

# Reference default excludes (ck-core/src/lib.rs:417-453): build junk
# that is skipped even without any ignore file.
DEFAULT_EXCLUDE_DIRS = {
    ".git", ".ck", ".hg", ".svn", "node_modules", "target", "__pycache__",
    ".venv", "venv", "dist", "build", ".idea", ".vscode",
}


@dataclass
class _Rule:
    rx: re.Pattern  # matches the path RELATIVE to the rule's base dir
    negate: bool
    dir_only: bool


def _glob_to_rx(pat: str) -> str:
    """One gitignore glob → regex body (over '/'-separated rel paths)."""
    out: list[str] = []
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            if pat[i : i + 2] == "**":
                # '**/' or '/**' or bare '**' crosses directories
                if pat[i : i + 3] == "**/":
                    out.append("(?:[^/]*/)*")
                    i += 3
                    continue
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                body = pat[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j + 1
                continue
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def parse_ignore_lines(lines: list[str]) -> list[_Rule]:
    """gitignore(5) subset: comments, blanks, ``!`` negation, trailing
    ``/`` dir-only, a ``/`` anywhere else anchors the pattern to the
    ignore file's directory, otherwise it matches at any depth."""
    rules: list[_Rule] = []
    for raw in lines:
        line = raw.rstrip("\n").rstrip()
        if not line or line.startswith("#"):
            continue
        negate = line.startswith("!")
        if negate:
            line = line[1:]
        if line.startswith("\\#") or line.startswith("\\!"):
            line = line[1:]
        dir_only = line.endswith("/")
        if dir_only:
            line = line[:-1]
        anchored = "/" in line
        if line.startswith("/"):
            line = line[1:]
        body = _glob_to_rx(line)
        if not anchored:
            body = "(?:[^/]*/)*" + body
        # a matched directory ignores everything beneath it
        rx = re.compile("^" + body + "(?:/.*)?$" if not dir_only
                        else "^" + body + "$")
        rules.append(_Rule(rx=rx, negate=negate, dir_only=dir_only))
    return rules


def _ignored(rel: str, is_dir: bool, stack: list[tuple[str, list[_Rule]]]) -> bool:
    """Last matching rule across the ignore-file stack wins (gitignore
    semantics); deeper files' rules are later in the stack."""
    verdict = False
    matched = False
    for base, rules in stack:
        if base:
            if not rel.startswith(base + "/"):
                continue
            sub = rel[len(base) + 1 :]
        else:
            sub = rel
        for r in rules:
            # dir-only patterns never match plain files; their
            # descendants are handled by pruning the matched dir during
            # the walk (gitignore cannot re-include inside an excluded
            # directory, so pruning is faithful).
            if r.dir_only and not is_dir:
                continue
            if not r.rx.match(sub):
                continue
            verdict = not r.negate
            matched = True
    return verdict and matched


def walk_code_files(
    root: str,
    *,
    respect_ignore: bool = True,
    respect_gitignore: bool | None = None,
    respect_ckignore: bool | None = None,
    default_excludes: bool = True,
    include_hidden: bool = False,
    extra_excludes: tuple[str, ...] = (),
) -> list[str]:
    """Driver-side candidate-file walk (paths only, no content reads).

    Mirrors the reference walk order of application: default excludes →
    hidden rule → hierarchical .gitignore/.ckignore (``.ckignore`` rules
    are appended after ``.gitignore`` of the same directory, so they win
    ties, matching the reference's override layering,
    ck-index/src/lib.rs:113-128). Returns paths relative to ``root``,
    sorted (deterministic docIDs downstream).

    The reference's three independent switches map 1:1
    (ck-cli/src/main.rs:247-253, build_exclude_patterns :483):
    ``respect_gitignore``/``respect_ckignore`` (default: follow
    ``respect_ignore``) disable one ignore-file family each (--no-ignore
    / --no-ckignore); ``default_excludes=False`` is --no-default-excludes.
    ``extra_excludes`` (--exclude) always applies, even with every ignore
    file disabled.
    """
    root = os.path.abspath(root)
    use_git = respect_ignore if respect_gitignore is None else respect_gitignore
    use_ck = respect_ignore if respect_ckignore is None else respect_ckignore
    ignore_names = [
        n for n, on in ((".gitignore", use_git), (".ckignore", use_ck)) if on
    ]
    extra = parse_ignore_lines(list(extra_excludes))
    out: list[str] = []
    stack: list[tuple[str, list[_Rule]]] = [("", extra)] if extra else []

    # explicit work stack, not recursion — generated trees can nest
    # past Python's recursion limit; order is irrelevant (sorted below)
    work: list[tuple[str, str, list[tuple[str, list[_Rule]]]]] = [
        (root, "", stack)
    ]
    while work:
        dirpath, rel_dir, rstack = work.pop()
        local = list(rstack)
        for name in ignore_names:
            p = os.path.join(dirpath, name)
            if os.path.isfile(p):
                with open(p, encoding="utf-8", errors="replace") as f:
                    rules = parse_ignore_lines(f.readlines())
                if rules:
                    local.append((rel_dir, rules))
        try:
            entries = sorted(os.scandir(dirpath), key=lambda e: e.name)
        except OSError:
            continue
        for e in entries:
            rel = f"{rel_dir}/{e.name}" if rel_dir else e.name
            if not include_hidden and e.name.startswith("."):
                continue
            if e.is_dir(follow_symlinks=False):
                if default_excludes and e.name in DEFAULT_EXCLUDE_DIRS:
                    continue
                if local and _ignored(rel, True, local):
                    continue
                work.append((e.path, rel, local))
            elif e.is_file(follow_symlinks=False):
                if local and _ignored(rel, False, local):
                    continue
                out.append(rel)
    out.sort()
    return out


def _decode_utf8(arr: pa.Array) -> tuple[pa.Array, "object"]:
    """binary → string, dropping rows that are not valid UTF-8 (the
    reference's read_to_string skips such files,
    ck-engine/src/lib.rs:26-48). Fast path: one vectorized cast; the
    per-row loop runs only when a block actually contains invalid rows."""
    import numpy as np

    try:
        return arr.cast(pa.string()), np.ones(len(arr), bool)
    except pa.ArrowInvalid:
        vals, keep = [], np.zeros(len(arr), bool)
        for i, v in enumerate(arr):
            b = v.as_py()
            try:
                vals.append(b.decode("utf-8"))
                keep[i] = True
            except UnicodeDecodeError:
                vals.append("")
        return pa.array(vals, pa.string()), keep


def read_code_dir(
    root: str,
    *,
    repo: str | None = None,
    commit: str = "WORKTREE",
    respect_ignore: bool = True,
    respect_gitignore: bool | None = None,
    respect_ckignore: bool | None = None,
    default_excludes: bool = True,
    include_hidden: bool = False,
    extra_excludes: tuple[str, ...] = (),
):
    """Directory tree → corpus Dataset ``(repo, path, commit, lang,
    content)``. See module docstring for the reference mapping."""
    import ray.data

    from .corpus import text_rows_mask

    root = os.path.abspath(root)
    repo = repo if repo is not None else os.path.basename(root) or "repo"
    rels = walk_code_files(
        root,
        respect_ignore=respect_ignore,
        respect_gitignore=respect_gitignore,
        respect_ckignore=respect_ckignore,
        default_excludes=default_excludes,
        include_hidden=include_hidden,
        extra_excludes=extra_excludes,
    )
    if not rels:
        return ray.data.from_arrow(
            pa.table(
                {c: pa.array([], pa.string())
                 for c in ("repo", "path", "commit", "lang", "content")}
            )
        )
    paths = [os.path.join(root, r) for r in rels]
    ds = ray.data.read_binary_files(paths, include_paths=True)
    prefix = root.rstrip("/") + "/"

    def to_corpus(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        raw = t["bytes"].combine_chunks()
        content, keep = _decode_utf8(raw)
        keep &= text_rows_mask(raw).to_numpy(zero_copy_only=False)
        rel = pc.replace_substring_regex(
            t["path"], pattern="^" + re.escape(prefix), replacement=""
        )
        ext = pc.utf8_lower(
            pc.replace_substring_regex(rel, pattern=r"^.*\.", replacement="")
        ).to_pylist()
        rel_l = rel.to_pylist()
        lang = pa.array(
            [LANG_BY_EXT.get(e, "") if "." in r else ""
             for e, r in zip(ext, rel_l)],
            pa.string(),
        )
        n = t.num_rows
        out = pa.table(
            {
                "repo": pa.array([repo] * n, pa.string()),
                "path": rel.combine_chunks().cast(pa.string()),
                "commit": pa.array([commit] * n, pa.string()),
                "lang": lang,
                "content": content,
            }
        )
        return out.filter(pa.array(keep)) if not keep.all() else out

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def read_corpus_jsonl(path: str):
    """Newline-delimited JSON → corpus Dataset. Rows must carry
    ``path`` and ``content``; ``repo``/``commit``/``lang`` default to
    ``""``/``"WORKTREE"``/extension detection when absent."""
    import ray.data

    ds = ray.data.read_json(path)

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = set(t.column_names)
        if not {"path", "content"} <= cols:
            raise ValueError(
                "jsonl corpus rows need at least (path, content); got "
                f"{sorted(cols)}"
            )
        n = t.num_rows
        repo = (
            t["repo"].combine_chunks().cast(pa.string()).fill_null("")
            if "repo" in cols else pa.array([""] * n, pa.string())
        )
        commit = (
            t["commit"].combine_chunks().cast(pa.string())
            .fill_null("WORKTREE")
            if "commit" in cols else pa.array(["WORKTREE"] * n, pa.string())
        )
        # JSON schema unions make a missing field a null column — fill
        # absent/null lang entries by extension detection.
        ext = pc.utf8_lower(
            pc.replace_substring_regex(
                t["path"], pattern=r"^.*\.", replacement=""
            )
        ).to_pylist()
        rel = t["path"].to_pylist()
        detected = [
            LANG_BY_EXT.get(e, "") if "." in (r or "") else ""
            for e, r in zip(ext, rel)
        ]
        if "lang" in cols:
            given = t["lang"].to_pylist()
            lang = pa.array(
                [g if g else d for g, d in zip(given, detected)],
                pa.string(),
            )
        else:
            lang = pa.array(detected, pa.string())
        return pa.table(
            {
                "repo": repo,
                "path": t["path"].combine_chunks().cast(pa.string()),
                "commit": commit,
                "lang": lang,
                "content": t["content"].combine_chunks().cast(pa.string()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")
