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

Beyond Python, brace-delimited languages (Rust, Go, JavaScript,
TypeScript, Java) are chunked by a line/brace heuristic engine that
mirrors the reference's per-language capture queries
(``ck-chunk/queries/{rust,go,javascript,...}/tags.scm`` and the
capture-name -> ChunkType mapping ``ck-chunk/src/query_chunker.rs:247-260``:
fn->function, struct/enum/trait/class->class, impl/mod->module,
const/static/type->text), and Markdown by a heading-section chunker
(``queries/markdown/tags.scm``: headings/sections -> module, fenced code
blocks -> text). Like the reference (``query_chunker.rs:115-117``:
empty captures return None), a file where the heuristics find nothing
falls back to the generic line-window chunker.

Every chunk also carries the reference Span's byte offsets
(``byte_start``/``byte_end`` into the utf-8 bytes, terminator-exclusive;
contract ``ck-core/src/lib.rs:124-217``), leading/trailing trivia
(adjacent comments/decorators/attributes; ``ck-chunk/src/lib.rs:57-107``,
attach rules ``:1388-1470``) and a ``chunk_hash`` over text+trivia
(``ck-core/src/lib.rs:633-654`` — sha256 here; the container has no
blake3, and the hash only needs to be stable within this engine).
"""

from __future__ import annotations

import ast as _ast
import hashlib
import re
from dataclasses import dataclass, field

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


def line_byte_spans(content: str) -> list[tuple[int, int]]:
    """Per-line (byte_start, byte_end) into the utf-8 encoding of
    ``content``. Line segmentation is identical to ``str.splitlines()``
    (so line numbers agree with every other column) and ``byte_end``
    excludes the line terminator; slicing the raw bytes with a chunk's
    span reproduces the original text including INTERNAL terminators
    (\\r\\n survives). Reference Span contract: ck-core/src/lib.rs:124-217."""
    spans: list[tuple[int, int]] = []
    pos = 0
    for kept in content.splitlines(keepends=True):
        parts = kept.splitlines()
        body = parts[0] if parts else ""
        b = len(body.encode("utf-8"))
        spans.append((pos, pos + b))
        pos += len(kept.encode("utf-8"))
    return spans


def compute_chunk_hash(
    text: str, leading: list[str], trailing: list[str]
) -> str:
    """Chunk identity over text + trivia (reference compute_chunk_hash,
    ck-core/src/lib.rs:633-654; sha256 instead of blake3)."""
    h = hashlib.sha256()
    h.update(text.encode("utf-8"))
    for t in leading:
        h.update(t.encode("utf-8"))
    for t in trailing:
        h.update(t.encode("utf-8"))
    return h.hexdigest()


# ------------------------------------------------ brace-language heuristics


@dataclass(frozen=True)
class _Def:
    pattern: re.Pattern
    ctype: str
    # ";" before "{" -> emit capture ending at the ";" line (struct Thing;)
    # vs drop it (fn decl without body, reference skips those)
    semi_emits: bool = False
    # a match line with no "{" is a complete one-line capture (Go
    # "type A = B" — the language has no semicolons)
    eol_emits: bool = False
    # only valid when the innermost open capture is a method parent
    # (class-body method syntax like "run = () => {" in JS)
    needs_class_parent: bool = False
    # Go: receiver group present -> method
    method_if_group: str | None = None
    # reject control-flow keywords as names — only needed for patterns
    # ambiguous with statements (JS "run() {" also matches "if (x) {")
    filter_keywords: bool = False


@dataclass(frozen=True)
class LangSpec:
    name: str
    defs: tuple[_Def, ...]
    # open-capture ctypes whose direct fn children are methods
    method_parents: frozenset[str] = frozenset({"class", "module"})
    comment_prefixes: tuple[str, ...] = ("//", "/*", "*")
    attr_prefixes: tuple[str, ...] = ()
    line_comment: str = "//"


_KW_NOT_NAME = frozenset(
    "if for while switch catch return else do new try throw typeof super "
    "function in of await yield case default delete void".split()
)

_RUST = LangSpec(
    name="rust",
    defs=(
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const\s+)?(?:async\s+)?"
            r"(?:unsafe\s+)?(?:extern\s+\"[^\"]*\"\s+)?fn\s+(?P<name>\w+)"
        ), "function"),
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?struct\s+(?P<name>\w+)"
        ), "class", semi_emits=True),
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?enum\s+(?P<name>\w+)"
        ), "class"),
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:unsafe\s+)?trait\s+(?P<name>\w+)"
        ), "class"),
        _Def(re.compile(
            r"^\s*(?:unsafe\s+)?impl(?:\s*<[^>]*>)?\s+"
            r"(?:[\w:]+(?:<[^>]*>)?\s+for\s+)?(?P<name>[\w:]+)"
        ), "module"),
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?mod\s+(?P<name>\w+)"
        ), "module", semi_emits=True),
        _Def(re.compile(
            r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const|static|type)\s+(?P<name>\w+)"
        ), "text", semi_emits=True),
    ),
    method_parents=frozenset({"module", "class"}),  # impl/trait bodies
    attr_prefixes=("#[", "#!["),
)

_GO = LangSpec(
    name="go",
    defs=(
        _Def(re.compile(
            r"^func\s+\([^)]*\)\s+(?P<name>\w+)"
        ), "method"),
        _Def(re.compile(r"^func\s+(?P<name>\w+)"), "function"),
        _Def(re.compile(r"^type\s+(?P<name>\w+)"), "class", eol_emits=True),
        _Def(re.compile(r"^(?:var|const)\s"), "module", eol_emits=True),
    ),
    method_parents=frozenset(),
)

_JS = LangSpec(
    name="javascript",
    defs=(
        _Def(re.compile(
            r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?"
            r"function\s*\*?\s*(?P<name>\w+)"
        ), "function"),
        _Def(re.compile(
            r"^\s*(?:export\s+)?(?:default\s+)?(?:abstract\s+)?"
            r"class\s+(?P<name>\w+)"
        ), "class"),
        # arrow assigned to a binding (top level or exported), possibly
        # with a TS type annotation on the binding
        _Def(re.compile(
            r"^\s*(?:export\s+)?(?:const|let|var)\s+(?P<name>\w+)"
            r"(?:\s*:[^=]+)?\s*=\s*(?:async\s*)?(?:\([^)]*\)|\w+)\s*=>"
        ), "function", semi_emits=True),
        # class-body members: run = () => {...} / run(...) {
        _Def(re.compile(
            r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|"
            r"readonly\s+|async\s+|\*\s*)*(?P<name>\w+)\s*"
            r"(?:=\s*(?:async\s*)?\([^)]*\)\s*=>|\([^)]*\)\s*\{)"
        ), "method", semi_emits=True, needs_class_parent=True,
            filter_keywords=True),
    ),
    method_parents=frozenset({"class"}),
    attr_prefixes=("@",),
)

_JAVA = LangSpec(
    name="java",
    defs=(
        _Def(re.compile(
            r"^\s*(?:public\s+|private\s+|protected\s+|abstract\s+|"
            r"final\s+|static\s+|sealed\s+)*"
            r"(?:class|interface|enum|record)\s+(?P<name>\w+)"
        ), "class"),
        _Def(re.compile(
            r"^\s*(?:public\s+|private\s+|protected\s+|static\s+|final\s+|"
            r"abstract\s+|synchronized\s+|native\s+|default\s+)*"
            r"(?:[\w.<>\[\],?\s]+\s+)?(?P<name>\w+)\s*\([^;{]*\)\s*"
            r"(?:throws\s+[\w.,\s]+)?\s*\{"
        ), "method", needs_class_parent=True, filter_keywords=True),
    ),
    method_parents=frozenset({"class"}),
    attr_prefixes=("@",),
)

LANG_SPECS: dict[str, LangSpec] = {
    "rust": _RUST,
    "go": _GO,
    "javascript": _JS,
    "typescript": _JS,
    "java": _JAVA,
}

# User-override dir for per-language chunking specs — the analogue of the
# reference's CK_CHUNK_QUERY_DIR tags.scm overrides
# (ck-chunk/src/query_chunker.rs:8,204-245). A file ``<dir>/<lang>.json``
# REPLACES (or adds) that language's spec:
#   {"defs": [{"pattern": "^fn (?P<name>\\w+)", "ctype": "function",
#              "semi_emits": false, "eol_emits": false,
#              "needs_class_parent": false, "filter_keywords": false}],
#    "method_parents": ["class"], "comment_prefixes": ["//"],
#    "attr_prefixes": ["@"], "line_comment": "//"}
SPEC_OVERRIDE_DIR_ENV = "CK_CHUNK_SPEC_DIR"
_spec_cache: dict[tuple[str, str], LangSpec | None] = {}


def _spec_from_json(d: dict) -> LangSpec:
    defs = tuple(
        _Def(
            pattern=re.compile(x["pattern"]),
            ctype=x.get("ctype", "function"),
            semi_emits=bool(x.get("semi_emits", False)),
            eol_emits=bool(x.get("eol_emits", False)),
            needs_class_parent=bool(x.get("needs_class_parent", False)),
            filter_keywords=bool(x.get("filter_keywords", False)),
        )
        for x in d.get("defs", [])
    )
    return LangSpec(
        name=d.get("name", "custom"),
        defs=defs,
        method_parents=frozenset(d.get("method_parents", ["class", "module"])),
        comment_prefixes=tuple(d.get("comment_prefixes", ("//", "/*", "*"))),
        attr_prefixes=tuple(d.get("attr_prefixes", ())),
        line_comment=d.get("line_comment", "//"),
    )


def spec_for(lang: str) -> LangSpec | None:
    """Resolve a language's chunking spec: the override dir wins over the
    built-ins (reference load_query_source semantics). Parsed overrides
    are cached per (dir, lang); workers resolve the env var themselves,
    so the dir just needs to be visible where tasks run."""
    import json
    import os

    d = os.environ.get(SPEC_OVERRIDE_DIR_ENV)
    if d:
        key = (d, lang)
        if key not in _spec_cache:
            p = os.path.join(d, f"{lang}.json")
            if os.path.exists(p):
                with open(p) as fh:
                    _spec_cache[key] = _spec_from_json(json.load(fh))
            else:
                _spec_cache[key] = None
        if _spec_cache[key] is not None:
            return _spec_cache[key]
    return LANG_SPECS.get(lang)

_STR_RE = re.compile(r"'(?:\\.|[^'\\\n])*'|\"(?:\\.|[^\"\\\n])*\"|`[^`\n]*`")


def _effective_lines(lines: list[str], spec: LangSpec) -> list[str]:
    """Lines with string literals blanked, line comments cut and /* */
    block comments blanked — so brace counting and def matching never
    trip on quoted/commented braces."""
    out = []
    in_block = False
    for ln in lines:
        s = _STR_RE.sub(lambda m: '"' + " " * max(len(m.group()) - 2, 0) + '"', ln)
        res = []
        i = 0
        while i < len(s):
            if in_block:
                j = s.find("*/", i)
                if j == -1:
                    res.append(" " * (len(s) - i))
                    i = len(s)
                else:
                    res.append(" " * (j + 2 - i))
                    i = j + 2
                    in_block = False
            else:
                j = s.find("/*", i)
                k = s.find(spec.line_comment, i) if spec.line_comment else -1
                if k != -1 and (j == -1 or k < j):
                    res.append(s[i:k])
                    i = len(s)
                elif j != -1:
                    res.append(s[i:j] + "  ")
                    i = j + 2
                    in_block = True
                else:
                    res.append(s[i:])
                    i = len(s)
        out.append("".join(res))
    return out


def brace_chunks(
    src: str, spec: LangSpec
) -> list[tuple[int, int, str, str, int]]:
    """Structural captures for a brace-delimited language: definition
    lines found by the spec's regexes, spans closed by brace balance
    (strings/comments blanked first), ancestry from the stack of open
    captures. Returns [] when nothing matches (caller falls back, like
    the reference's empty-query result, query_chunker.rs:115-117)."""
    lines = src.splitlines()
    eff = _effective_lines(lines, spec)
    out: list[tuple[int, int, str, str, int]] = []
    open_caps: list[dict] = []
    pending: dict | None = None
    depth = 0

    def class_parent_open() -> bool:
        return bool(open_caps) and open_caps[-1]["ctype"] in spec.method_parents

    def emit(cap: dict, end_ln: int) -> None:
        crumb = ".".join(
            c["name"] for c in cap["crumbs"] if c["name"]
        )
        own = cap["name"]
        crumb = f"{crumb}.{own}" if crumb and own else (crumb or own)
        out.append(
            (cap["start"] + 1, end_ln + 1, cap["ctype"], crumb,
             len(cap["crumbs"]))
        )

    for ln_no, s in enumerate(eff):
        if pending is None:
            for d in spec.defs:
                if d.needs_class_parent and not class_parent_open():
                    continue
                m = d.pattern.match(s)
                if m is None:
                    continue
                name = m.groupdict().get("name") or ""
                if d.filter_keywords and name in _KW_NOT_NAME:
                    continue
                ctype = d.ctype
                if d.ctype == "function" and class_parent_open():
                    ctype = "method"
                pending = {
                    "start": ln_no, "ctype": ctype, "name": name,
                    "def": d, "from_col": m.start(),
                    "crumbs": list(open_caps),
                }
                break
        for col, ch in enumerate(s):
            if ch == "{":
                depth += 1
                if pending is not None and (
                    pending["start"] < ln_no or col >= pending["from_col"]
                ):
                    open_caps.append({**pending, "close_at": depth - 1})
                    pending = None
            elif ch == "}":
                depth = max(0, depth - 1)
                while open_caps and open_caps[-1]["close_at"] >= depth:
                    emit(open_caps.pop(), ln_no)
            elif ch == ";" and pending is not None and (
                pending["start"] < ln_no or col >= pending["from_col"]
            ):
                if pending["def"].semi_emits:
                    emit(pending, ln_no)
                pending = None
        if pending is not None:
            if pending["def"].eol_emits and pending["start"] == ln_no:
                emit(pending, ln_no)
                pending = None
            elif ln_no - pending["start"] >= 8:  # give up on odd syntax
                pending = None
    for c in reversed(open_caps):  # EOF closes whatever is still open
        emit(c, len(lines) - 1)
    out.sort(key=lambda c: (c[0], -c[1], c[4]))
    return out


_ATX_RE = re.compile(r"^(#{1,6})\s+(?P<name>.*?)\s*#*\s*$")
_SETEXT1_RE = re.compile(r"^=+\s*$")
_SETEXT2_RE = re.compile(r"^-+\s*$")
_FENCE_RE = re.compile(r"^(```|~~~)")


def markdown_chunks(src: str) -> list[tuple[int, int, str, str, int]]:
    """Markdown sections (headings, ATX + setext) as ``module`` chunks
    nested by level, fenced code blocks as ``text`` captures — the
    reference's markdown query (queries/markdown/tags.scm: headings /
    sections -> @module, fenced blocks -> @text)."""
    lines = src.splitlines()
    heads: list[tuple[int, int, str]] = []  # (line, level, title)
    fences: list[tuple[int, int]] = []
    in_fence = False
    fence_start = 0
    for i, ln in enumerate(lines):
        if _FENCE_RE.match(ln.lstrip()):
            if in_fence:
                fences.append((fence_start, i))
                in_fence = False
            else:
                fence_start = i
                in_fence = True
            continue
        if in_fence:
            continue
        m = _ATX_RE.match(ln)
        if m:
            heads.append((i, len(m.group(1)), m.group("name")))
            continue
        if i + 1 < len(lines) and ln.strip():
            if _SETEXT1_RE.match(lines[i + 1]):
                heads.append((i, 1, ln.strip()))
            elif _SETEXT2_RE.match(lines[i + 1]):
                heads.append((i, 2, ln.strip()))
    if in_fence:
        fences.append((fence_start, len(lines) - 1))
    if not heads and not fences:
        return []
    out: list[tuple[int, int, str, str, int]] = []
    sections: list[tuple[int, int, int]] = []  # (start, end, level)
    stack: list[tuple[int, str]] = []  # (level, title) of open sections
    for idx, (ln, level, title) in enumerate(heads):
        # section ends before the next heading of same-or-higher level
        end = len(lines) - 1
        for ln2, lv2, _ in heads[idx + 1 :]:
            if lv2 <= level:
                end = ln2 - 1
                break
        while stack and stack[-1][0] >= level:
            stack.pop()
        crumb = ".".join([t for _, t in stack] + [title])
        out.append((ln + 1, end + 1, "module", crumb, len(stack)))
        sections.append((ln, end, level))
        stack.append((level, title))
    for s, e in fences:
        depth = sum(1 for ss, se, _ in sections if ss <= s <= se)
        out.append((s + 1, e + 1, "text", "", depth))
    out.sort(key=lambda c: (c[0], -c[1], c[4]))
    return out


def _leading_trivia(
    lines: list[str], line_start: int, spec_prefixes: tuple[str, ...],
    attr_prefixes: tuple[str, ...],
) -> list[str]:
    """Contiguous comment/attribute lines immediately above a capture
    (reference extend_with_leading_trivia, ck-chunk/src/lib.rs:1388-1436)."""
    out: list[str] = []
    i = line_start - 2
    prefixes = spec_prefixes + attr_prefixes
    while i >= 0:
        s = lines[i].lstrip()
        if s and s.startswith(prefixes):
            out.append(lines[i])
            i -= 1
        else:
            break
    out.reverse()
    return out


def _trailing_trivia(
    lines: list[str], line_end: int, comment_prefixes: tuple[str, ...]
) -> list[str]:
    """Comment lines immediately after a capture (reference
    collect_trailing_trivia — comments only)."""
    out: list[str] = []
    i = line_end
    while i < len(lines):
        s = lines[i].lstrip()
        if s and s.startswith(comment_prefixes):
            out.append(lines[i])
            i += 1
        else:
            break
    return out


_TRIVIA_PREFIXES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    # lang -> (comment prefixes, attribute/decorator prefixes)
    "python": (("#",), ("@",)),
    "rust": (("//", "/*", "*"), ("#[", "#![")),
    "go": (("//", "/*", "*"), ()),
    "javascript": (("//", "/*", "*"), ("@",)),
    "typescript": (("//", "/*", "*"), ("@",)),
    "java": (("//", "/*", "*"), ("@",)),
}


def structural_chunks(
    src: str, lang: str, *, max_lines: int | None = None, overlap: int = 4
) -> list[tuple[int, int, str, str, int]] | None:
    """Language dispatch: full chunk rows (captures + suppression + gap
    fill + striding) or None when no structural chunker applies / finds
    anything — the caller's line-window fallback contract."""
    caps: list[tuple[int, int, str, str, int]] | None = None
    spec = spec_for(lang) if lang != "python" else None
    if lang == "python":
        try:
            caps = _suppress_contained(_python_captures(src))
        except (SyntaxError, ValueError, RecursionError):
            return None
    elif spec is not None:
        caps = brace_chunks(src, spec)
    elif lang == "markdown":
        caps = markdown_chunks(src)
    if not caps:
        return None
    caps = _suppress_contained(caps)
    n_lines = len(src.splitlines())
    rows = caps + _gap_fill(caps, n_lines)
    rows = _stride(rows, max_lines, overlap)
    rows.sort(key=lambda c: (c[0], -c[1], c[4]))
    return rows


def ast_chunk_batch(
    t: pa.Table,
    *,
    max_lines: int | None = None,
    overlap: int = 4,
    fallback_target: int = 20,
    fallback_overlap: int = 4,
) -> pa.Table:
    """Flat-map over a corpus batch -> structural chunk rows.

    Rows are dispatched by ``lang``: Python through the AST chunker,
    Rust/Go/JavaScript/TypeScript/Java through the brace-heuristic
    engine, Markdown through the section chunker; everything else (and
    files where the structural pass captures nothing) falls back to line
    windows. Every chunk carries line + byte spans, leading/trailing
    trivia and a text+trivia chunk hash (reference Span / ChunkMetadata
    contracts)."""
    doc_ids = doc_id_column(t["repo"], t["path"], t["commit"]).to_numpy()
    paths = t["path"].to_pylist()
    langs = t["lang"].to_pylist() if "lang" in t.column_names else [""] * t.num_rows
    cols: dict[str, list] = {
        "doc_id": [], "path": [], "chunk_id": [], "chunk_type": [],
        "breadcrumb": [], "depth": [], "line_start": [], "line_end": [],
        "byte_start": [], "byte_end": [], "leading_trivia": [],
        "trailing_trivia": [], "chunk_hash": [], "text": [],
    }
    for i, content in enumerate(t["content"].to_pylist()):
        lines = content.splitlines()
        if not lines:
            continue
        lang = langs[i]
        rows = structural_chunks(
            content, lang, max_lines=max_lines, overlap=overlap
        )
        structural = rows is not None
        if rows is None:
            rows = line_window_chunks(
                len(lines),
                target_lines=fallback_target,
                overlap_lines=fallback_overlap,
            )
            if max_lines is not None:
                rows = _stride(rows, max_lines, overlap)
        bspans = line_byte_spans(content)
        cprefix, aprefix = _TRIVIA_PREFIXES.get(lang, ((), ()))
        for cid, (s, e, ctype, crumb, depth) in enumerate(rows):
            text = "\n".join(lines[s - 1 : e])
            lead: list[str] = []
            trail: list[str] = []
            if structural and ctype != "text":
                lead = _leading_trivia(lines, s, cprefix, aprefix)
                if lang == "python":
                    # decorators live INSIDE the python span (the AST
                    # start includes them); the reference lists them as
                    # leading trivia too
                    j = s - 1
                    while j < e and lines[j].lstrip().startswith("@"):
                        lead.append(lines[j])
                        j += 1
                trail = _trailing_trivia(lines, e, cprefix)
            cols["doc_id"].append(doc_ids[i])
            cols["path"].append(paths[i])
            cols["chunk_id"].append(cid)
            cols["chunk_type"].append(ctype)
            cols["breadcrumb"].append(crumb)
            cols["depth"].append(depth)
            cols["line_start"].append(s)
            cols["line_end"].append(e)
            cols["byte_start"].append(bspans[s - 1][0])
            cols["byte_end"].append(bspans[e - 1][1])
            cols["leading_trivia"].append(lead)
            cols["trailing_trivia"].append(trail)
            cols["chunk_hash"].append(compute_chunk_hash(text, lead, trail))
            cols["text"].append(text)
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
            "byte_start": pa.array(cols["byte_start"], pa.int64()),
            "byte_end": pa.array(cols["byte_end"], pa.int64()),
            "leading_trivia": pa.array(
                cols["leading_trivia"], pa.list_(pa.string())
            ),
            "trailing_trivia": pa.array(
                cols["trailing_trivia"], pa.list_(pa.string())
            ),
            "chunk_hash": pa.array(cols["chunk_hash"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
        }
    )
