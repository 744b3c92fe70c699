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
    # ";" opens a scope closed only at EOF (C# file-scoped namespace:
    # `namespace X;` applies to the rest of the file)
    semi_opens: bool = False
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
    # lines directly above a capture matching this extend its span upward
    # (C++ template-prefix merge, reference
    # merge_cpp_template_prefix_chunks ck-chunk/src/lib.rs:498-561)
    prefix_extend: re.Pattern | None = None
    # MULTI-LINE string forms a real parser skips but the line-local
    # blanking can't see: (open regex, match -> closing delimiter)
    # pairs, scanned left-to-right together with comments and carried
    # across lines like /* */ — rust r#"..."#, JS/TS template
    # literals, C++ R"tag(...)tag", C# @"..." (adversarial cases from
    # the reference capture suites, ck-chunk/src/query_chunker.rs)
    ml_strings: tuple = ()
    # blank whole preprocessor-directive lines ('#...' plus backslash
    # continuations) before brace counting: '#define OPEN {' must not
    # open a structural brace (C/C++)
    preproc_hash: bool = False


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
    # raw (byte) strings r"..." / br#"..."# carry braces across lines
    ml_strings=(
        (re.compile(r'(?<!\w)b?r(#*)"'), lambda m: '"' + m.group(1)),
    ),
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
    # template literals carry braces across lines
    ml_strings=((re.compile(r"`"), lambda m: "`"),),
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

# C function definitions start at column 0 (return type words, then the
# name directly before the parameter list). Declarations (no body) die at
# the ";" — the reference captures function_definition only
# (queries/c/tags.scm) and cpp_queries_skip_function_body_declarations.
_C_FN = _Def(
    re.compile(
        r"^(?:[A-Za-z_]\w*(?:\s*[*&]+\s*|\s+))+[*&]*"
        r"(?P<name>~?[\w:]+)\s*\("
    ),
    "function",
    filter_keywords=True,
)
_C_STRUCT = _Def(
    re.compile(
        r"^\s*(?:typedef\s+)?(?:struct|union)\s+(?P<name>\w+)?\s*(?:\{|$)"
    ),
    "class",
)
_C_ENUM = _Def(
    re.compile(r"^\s*(?:typedef\s+)?enum\s+(?P<name>\w+)?\s*(?:\{|$)"),
    "class",
)
_C_MACRO_FN = _Def(
    re.compile(r"^#\s*define\s+(?P<name>\w+)\("),
    "function",
    eol_emits=True,
)
_C_MACRO = _Def(
    re.compile(r"^#\s*define\s+(?P<name>\w+)"),
    "text",
    eol_emits=True,
)

_C = LangSpec(
    name="c",
    defs=(_C_STRUCT, _C_ENUM, _C_MACRO_FN, _C_MACRO, _C_FN),
    method_parents=frozenset(),
    preproc_hash=True,
)

_CPP = LangSpec(
    name="cpp",
    defs=(
        _Def(re.compile(
            r"^\s*(?:template\s*<[^>]*>\s*)?"
            r"(?:class|struct)\s+(?P<name>\w+)\s*"
            r"(?:final\s*)?(?::[^{;]*)?(?:\{|$)"
        ), "class"),
        _C_ENUM,
        _Def(re.compile(
            r"^\s*(?:inline\s+)?namespace\s*(?P<name>[\w:]*)"
        ), "module"),
        _C_MACRO_FN,
        _C_MACRO,
        _C_FN,
        # in-class member functions (indented); pure-virtual / =default /
        # =delete declarations end in ";" and are dropped (reference
        # cpp_queries_skip_defaulted_deleted_ctors)
        _Def(re.compile(
            r"^\s+(?:(?:virtual|static|inline|constexpr|explicit|friend)"
            r"\s+)*[\w:<>,&*\s]*?[\s*&]?(?P<name>~?\w+|operator\S+)"
            r"\s*\([^;{]*\)"
        ), "method", needs_class_parent=True, filter_keywords=True),
    ),
    # free functions inside a namespace stay functions; only class
    # members read as methods
    method_parents=frozenset({"class"}),
    prefix_extend=re.compile(r"^\s*template\s*<"),
    preproc_hash=True,
    # C++11 raw strings R"tag(...)tag" carry braces across lines
    ml_strings=(
        (
            re.compile(r'R"([^()\s\\]{0,16})\('),
            lambda m: ")" + m.group(1) + '"',
        ),
    ),
)

_CSHARP = LangSpec(
    name="csharp",
    defs=(
        _Def(re.compile(
            r"^\s*(?:(?:file|public|private|protected|internal)\s+)?"
            r"namespace\s+(?P<name>[\w.]+)"
        ), "module", semi_opens=True),
        _Def(re.compile(
            r"^\s*(?:(?:public|private|protected|internal|static|sealed|"
            r"abstract|partial|readonly|file)\s+)*"
            r"(?:class|struct|record)\s+(?P<name>\w+)"
        ), "class"),
        _Def(re.compile(
            r"^\s*(?:(?:public|private|protected|internal|partial|file)"
            r"\s+)*interface\s+(?P<name>\w+)"
        ), "module"),
        # fields before methods so initializer calls don't read as methods
        _Def(re.compile(
            r"^\s*(?:(?:public|private|protected|internal|static|readonly|"
            r"const|volatile)\s+)+[\w<>\[\],.?\s]+?\s(?P<name>\w+)\s*"
            r"(?:=[^;]*)?;"
        ), "module", semi_emits=True, needs_class_parent=True,
            filter_keywords=True),
        _Def(re.compile(
            r"^\s*(?:(?:public|private|protected|internal|static|virtual|"
            r"override|sealed|async|abstract|partial|new|extern|unsafe)"
            r"\s+)+[\w<>\[\],.?\s]+?\s(?P<name>\w+)\s*(?:<[^>]*>)?\s*"
            r"\([^;{]*\)"
        ), "method", semi_emits=True, needs_class_parent=True,
            filter_keywords=True),
        # constructor: modifiers then the class name directly (no return
        # type) before the parameter list
        _Def(re.compile(
            r"^\s*(?:(?:public|private|protected|internal|static)\s+)+"
            r"(?P<name>[A-Z]\w*)\s*\([^;{]*\)\s*$"
        ), "method", needs_class_parent=True, filter_keywords=True),
    ),
    method_parents=frozenset({"class", "module"}),
    attr_prefixes=("[",),
)

_DART = LangSpec(
    name="dart",
    defs=(
        _Def(re.compile(
            r"^\s*(?:(?:abstract|base|final|sealed|interface)\s+)*"
            r"(?:class|mixin|enum)\s+(?P<name>\w+)"
        ), "class"),
        # top-level variables/constants -> text (queries/dart/tags.scm:
        # local_variable_declaration @module.text)
        _Def(re.compile(
            r"^(?:final|const|var|late)\s+(?:[\w<>\[\],?]+\s+)?"
            r"(?P<name>\w+)\s*[=;]"
        ), "text", semi_emits=True),
        _Def(re.compile(
            r"^(?:[\w<>\[\],?]+\s+)?(?P<name>\w+)\s*\([^;{]*\)\s*"
            r"(?:async\s*\*?|sync\s*\*?)?\s*(?:\{|=>)"
        ), "function", semi_emits=True, filter_keywords=True),
        _Def(re.compile(
            r"^\s+(?:(?:static|final|const|late)\s+)*[\w<>\[\],?\s]*?"
            r"(?P<name>\w+)\s*\([^;{]*\)\s*(?:async\s*\*?)?\s*(?:\{|=>)"
        ), "method", semi_emits=True, needs_class_parent=True,
            filter_keywords=True),
    ),
    method_parents=frozenset({"class"}),
    attr_prefixes=("@",),
)

_ZIG = LangSpec(
    name="zig",
    defs=(
        _Def(re.compile(
            r"^\s*(?:pub\s+)?(?:export\s+)?(?:extern\s+(?:\"[^\"]*\"\s+)?)?"
            r"(?:inline\s+)?fn\s+(?P<name>\w+)"
        ), "function"),
        _Def(re.compile(r"^\s*test\s+(?:\"(?P<name>[^\"]*)\")?"), "module"),
        # const Name = struct/enum/union/opaque/error { ... } -> class
        _Def(re.compile(
            r"^\s*(?:pub\s+)?const\s+(?P<name>\w+)\s*=\s*"
            r"(?:packed\s+|extern\s+)?(?:struct|enum|union|opaque|error)\b"
        ), "class"),
        _Def(re.compile(
            r"^\s*(?:pub\s+)?(?:const|var)\s+(?P<name>\w+)"
        ), "module", semi_emits=True),
        _Def(re.compile(r"^\s*comptime\b"), "module"),
    ),
    method_parents=frozenset({"class"}),
)

LANG_SPECS: dict[str, LangSpec] = {
    "rust": _RUST,
    "go": _GO,
    "javascript": _JS,
    "typescript": _JS,
    "java": _JAVA,
    "c": _C,
    "cpp": _CPP,
    "c++": _CPP,
    "csharp": _CSHARP,
    "c#": _CSHARP,
    "dart": _DART,
    "zig": _ZIG,
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
        prefix_extend=(
            re.compile(d["prefix_extend"]) if d.get("prefix_extend") else None
        ),
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
    """Lines with string literals blanked, line comments cut, /* */
    block comments blanked, multi-line strings (``spec.ml_strings``)
    blanked across lines, and preprocessor directives dropped
    (``spec.preproc_hash``) — so brace counting and def matching never
    trip on quoted/commented/preprocessor braces."""
    out = []
    in_block = False
    in_str: str | None = None  # closing delimiter of an open ml string
    cont_preproc = False
    for ln in lines:
        if (
            spec.preproc_hash
            and not in_block
            and in_str is None
        ):
            if cont_preproc:
                # a macro BODY continuation: fully blank (its text must
                # match no def regex and count no brace)
                cont_preproc = ln.rstrip().endswith("\\")
                out.append("")
                continue
            if ln.lstrip().startswith("#"):
                # directive line stays VISIBLE (the C spec captures
                # #define as macro chunks) but its braces never count
                cont_preproc = ln.rstrip().endswith("\\")
                ln = ln.replace("{", " ").replace("}", " ")
            else:
                cont_preproc = False
        s = (
            ln
            if in_block or in_str is not None
            else _STR_RE.sub(
                lambda m: '"' + " " * max(len(m.group()) - 2, 0) + '"', ln
            )
        )
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
                    # the line's remainder was never string-blanked
                    # (the sub is skipped while a carry is open) — do
                    # it now so quoted braces after the close can't
                    # corrupt brace counting
                    s = s[:i] + _STR_RE.sub(
                        lambda m: '"'
                        + " " * max(len(m.group()) - 2, 0) + '"',
                        s[i:],
                    )
            elif in_str is not None:
                j = s.find(in_str, i)
                if j == -1:
                    res.append(" " * (len(s) - i))
                    i = len(s)
                else:
                    end = j + len(in_str)
                    res.append(" " * (end - i))
                    i = end
                    in_str = None
                    s = s[:i] + _STR_RE.sub(
                        lambda m: '"'
                        + " " * max(len(m.group()) - 2, 0) + '"',
                        s[i:],
                    )
            else:
                j = s.find("/*", i)
                k = s.find(spec.line_comment, i) if spec.line_comment else -1
                # earliest multi-line string opener from i
                m_pos, m_match, m_close = -1, None, None
                for rx, closer in spec.ml_strings:
                    m = rx.search(s, i)
                    if m and (m_pos == -1 or m.start() < m_pos):
                        m_pos, m_match, m_close = m.start(), m, closer
                first = min(
                    x for x in (j, k, m_pos, len(s)) if x != -1
                )
                if first == len(s):
                    res.append(s[i:])
                    i = len(s)
                elif first == k:
                    res.append(s[i:k])
                    i = len(s)
                elif first == j:
                    res.append(s[i:j] + "  ")
                    i = j + 2
                    in_block = True
                else:
                    res.append(s[i:m_pos] + " " * len(m_match.group()))
                    i = m_match.end()
                    in_str = m_close(m_match)
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
                # names can live inside string literals (zig `test "…"`)
                # which _effective_lines blanked — re-match the raw line
                mr = d.pattern.match(lines[ln_no])
                name = (mr or m).groupdict().get("name") or ""
                name = name.strip()
                if d.filter_keywords and name in _KW_NOT_NAME:
                    continue
                ctype = d.ctype
                if d.ctype == "function" and class_parent_open():
                    ctype = "method"
                start = ln_no
                if spec.prefix_extend is not None:
                    # template-prefix merge: pull `template <...>` lines
                    # above the definition into its span (reference
                    # merge_cpp_template_prefix_chunks)
                    while start > 0 and spec.prefix_extend.match(
                        eff[start - 1]
                    ):
                        start -= 1
                pending = {
                    "start": start, "match_line": ln_no, "ctype": ctype,
                    "name": name, "def": d, "from_col": m.start(),
                    "crumbs": list(open_caps),
                }
                break
        for col, ch in enumerate(s):
            if ch == "{":
                depth += 1
                if pending is not None and (
                    pending["match_line"] < ln_no
                    or col >= pending["from_col"]
                ):
                    open_caps.append({**pending, "close_at": depth - 1})
                    pending = None
            elif ch == "}":
                depth = max(0, depth - 1)
                while open_caps and open_caps[-1]["close_at"] >= depth:
                    emit(open_caps.pop(), ln_no)
            elif ch == ";" and pending is not None and (
                pending["match_line"] < ln_no or col >= pending["from_col"]
            ):
                if pending["def"].semi_opens:
                    # file-scoped namespace: stays open until EOF
                    open_caps.append({**pending, "close_at": -1})
                elif pending["def"].semi_emits:
                    emit(pending, ln_no)
                pending = None
        if pending is not None:
            if pending["def"].eol_emits and pending["match_line"] == ln_no:
                # a directive's backslash continuations belong to its
                # span (tree-sitter's preproc nodes include them)
                end = ln_no
                while (
                    end < len(lines) - 1
                    and lines[end].rstrip().endswith("\\")
                ):
                    end += 1
                emit(pending, end)
                pending = None
            elif ln_no - pending["match_line"] >= 8:  # odd syntax: give up
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


# --- end-keyword block languages (Ruby, Elixir) -------------------------
# Blocks close with the ``end`` keyword instead of ``}``. The capture
# tables mirror the reference's tags.scm files
# (ck-chunk/queries/ruby/tags.scm: class/module -> @class/@module,
# method/singleton_method -> @function;
# ck-chunk/queries/elixir/tags.scm: defmodule/defprotocol/defimpl ->
# @module, def/defp/defmacro*/defguard*/defdelegate -> @function,
# defstruct -> @definition.struct, @spec/@type/@callback/@behaviour ->
# single-line text captures).

_RUBY_CAPS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"^\s*class\s+(?:<<\s*)?(?P<name>[\w:.]+)"), "class"),
    (re.compile(r"^\s*module\s+(?P<name>[\w:]+)"), "module"),
    (re.compile(r"^\s*def\s+(?P<name>(?:self\.)?[\w?!=\[\]<>+\-*/%~^]+)"),
     "function"),
)
# block openers that consume an ``end`` without being captures
_RUBY_OPEN_RE = re.compile(
    r"^\s*(?:if|unless|while|until|case|begin|for)\b"
)
_RUBY_DO_RE = re.compile(r"(?:^|\s)do(?:\s*\|[^|]*\|)?\s*$")
# modifier forms (`x if y`) never open a block; one-line `def x; end` is
# handled because both tokens sit on one line.

_ELIXIR_CAPS: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"^\s*defmodule\s+(?P<name>[\w.]+)"), "module"),
    (re.compile(r"^\s*defprotocol\s+(?P<name>[\w.]+)"), "module"),
    (re.compile(r"^\s*defimpl\s+(?P<name>[\w.]+)"), "module"),
    (re.compile(
        r"^\s*def(?:p|macro|macrop|guard|guardp|delegate)?"
        r"\s+(?P<name>[\w?!]+)"
    ), "function"),
)
_ELIXIR_LINE_CAPS: tuple[tuple[re.Pattern, str], ...] = (
    # single-expression captures with no `do` block
    (re.compile(r"^\s*defstruct\b"), "class"),
    (re.compile(r"^\s*defdelegate\s+(?P<name>[\w?!]+)"), "function"),
    (re.compile(
        r"^\s*@(?:spec|type|typep|opaque|callback|macrocallback|"
        r"optional_callbacks|behaviou?r)\b"
    ), "text"),
)
_ELIXIR_DO_RE = re.compile(r"(?:^|\s)do\s*$")
_ELIXIR_INLINE_DO_RE = re.compile(r",\s*do:")


def end_block_chunks(
    src: str, lang: str
) -> list[tuple[int, int, str, str, int]]:
    """Structural captures for ``end``-delimited languages. Depth is the
    count of open blocks (captures and anonymous if/do blocks alike);
    each ``end`` closes the innermost. Strings/comments are blanked
    before matching, as in the brace engine."""
    caps = _RUBY_CAPS if lang == "ruby" else _ELIXIR_CAPS
    line_caps = () if lang == "ruby" else _ELIXIR_LINE_CAPS
    spec = LangSpec(name=lang, defs=(), comment_prefixes=("#",),
                    line_comment="#")
    lines = src.splitlines()
    eff = _effective_lines(lines, spec)
    out: list[tuple[int, int, str, str, int]] = []
    stack: list[dict | None] = []  # None = anonymous (non-capture) block
    open_caps: list[dict] = []

    def emit(cap: dict, end_ln: int) -> None:
        crumb = ".".join(c["name"] for c in cap["crumbs"] if c["name"])
        own = cap["name"]
        crumb = f"{crumb}.{own}" if crumb and own else (crumb or own)
        out.append(
            (cap["start"] + 1, end_ln + 1, cap["ctype"], crumb,
             len(cap["crumbs"]))
        )

    for ln_no, s in enumerate(eff):
        stripped = s.strip()
        if not stripped:
            continue
        matched_cap = None
        for pat, ctype in caps:
            m = pat.match(s)
            if m:
                name = m.groupdict().get("name") or ""
                if ctype == "function" and open_caps and (
                    open_caps[-1]["ctype"] in ("class", "module")
                ):
                    ctype = "method"
                matched_cap = {
                    "start": ln_no, "ctype": ctype, "name": name,
                    "crumbs": list(open_caps),
                }
                break
        if matched_cap is None:
            for pat, ctype in line_caps:
                m = pat.match(s)
                if m:
                    crumb0 = ".".join(
                        c["name"] for c in open_caps if c["name"]
                    )
                    name = (m.groupdict().get("name") or "") if m.groupdict() else ""
                    crumb = (
                        f"{crumb0}.{name}" if crumb0 and name
                        else (crumb0 or name)
                    )
                    out.append(
                        (ln_no + 1, ln_no + 1, ctype, crumb, len(open_caps))
                    )
                    break
        # block accounting
        opens = 0
        if lang == "ruby":
            if matched_cap is not None or _RUBY_OPEN_RE.match(s):
                # `while x do` / `for i in xs do`: the trailing `do` is
                # part of the same block, not a second one
                opens += 1
            elif _RUBY_DO_RE.search(s):
                opens += 1
        else:
            if _ELIXIR_DO_RE.search(s) and not _ELIXIR_INLINE_DO_RE.search(s):
                opens += 1
            elif matched_cap is not None:
                # `def f(x), do: expr` / multiline head without `do` yet:
                # treat as single-line capture
                emit(matched_cap, ln_no)
                matched_cap = None
            # anonymous functions (`fn x -> ... end`) consume an `end` too
            opens += len(re.findall(r"(?:^|[\s(,\[=])fn\b", s))
        closes = len(re.findall(r"(?:^|[\s;(\[])end\b", s))
        for _ in range(opens):
            if matched_cap is not None:
                stack.append(matched_cap)
                open_caps.append(matched_cap)
                matched_cap = None
            else:
                stack.append(None)
        for _ in range(closes):
            if not stack:
                break
            top = stack.pop()
            if top is not None:
                if open_caps and open_caps[-1] is top:
                    open_caps.pop()
                emit(top, ln_no)
    while stack:  # EOF closes whatever is still open
        top = stack.pop()
        if top is not None:
            if open_caps and open_caps[-1] is top:
                open_caps.pop()
            emit(top, len(lines) - 1)
    out.sort(key=lambda c: (c[0], -c[1], c[4]))
    return out


# --- Haskell ------------------------------------------------------------

_HS_DECL_RE = re.compile(r"^(?P<name>[a-z_][\w']*|\([^)]*\))")
_HS_KIND_RE = re.compile(
    r"^(?P<kw>data|newtype|type\s+family|type|class|instance)\b"
)


def haskell_chunks(src: str) -> list[tuple[int, int, str, str, int]]:
    """Haskell top-level declarations with equation merge: a signature
    (``name ::``) and all consecutive equations of the same ``name``
    collapse into one ``function`` chunk (reference
    merge_haskell_functions, ck-chunk/src/lib.rs:715-826; captures per
    queries/haskell/tags.scm: data/newtype/type family -> module,
    class/instance -> class, signature+function -> function)."""
    lines = src.splitlines()
    # split into top-level decl blocks: a block starts at a non-blank
    # column-0 line and swallows following indented/blank lines
    blocks: list[tuple[int, int, str]] = []  # (start, end, head line)
    cur_start = None
    cur_head = ""
    for i, ln in enumerate(lines):
        if ln and not ln[0].isspace():
            if cur_start is not None:
                end = i - 1
                while end > cur_start and not lines[end].strip():
                    end -= 1
                blocks.append((cur_start, end, cur_head))
            cur_start, cur_head = i, ln
    if cur_start is not None:
        end = len(lines) - 1
        while end > cur_start and not lines[end].strip():
            end -= 1
        blocks.append((cur_start, end, cur_head))

    def decl_of(head: str, body: str = "") -> tuple[str, str] | None:
        s = head.strip()
        if s.startswith("--") or s.startswith("{-"):
            return None
        mk = _HS_KIND_RE.match(s)
        if mk:
            kw = mk.group("kw")
            rest = s[mk.end():].strip()
            name = re.match(r"[\w.']+", rest)
            nm = name.group() if name else ""
            if kw in ("class", "instance"):
                return ("class", nm)
            return ("module", nm)
        if s.startswith(("module ", "import ", "{-#", "infix")):
            return None
        if "::" in s:
            nm = s.split("::")[0].strip().split()[0] if s.split("::")[0].strip() else ""
            return ("function", nm)
        m = _HS_DECL_RE.match(s)
        # an equation: `name args = ...` or guard clauses (`| cond = ...`)
        # on the head or any continuation line of the block
        if m and ("=" in s or "|" in s or "=" in body or "|" in body):
            return ("function", m.group("name"))
        return None

    out: list[tuple[int, int, str, str, int]] = []
    i = 0
    while i < len(blocks):
        s0, e0, head = blocks[i]
        d = decl_of(head, "\n".join(lines[s0 + 1 : e0 + 1]))
        if d is None:
            i += 1
            continue
        ctype, name = d
        end = e0
        j = i + 1
        if ctype == "function" and name:
            # equation merge: absorb consecutive same-name decls
            # (comment-only blocks between equations are skipped, as in
            # the reference's look-ahead)
            while j < len(blocks):
                s1, e1, head1 = blocks[j]
                st = head1.strip()
                if st.startswith("--") or st.startswith("{-"):
                    j += 1
                    continue
                d1 = decl_of(head1, "\n".join(lines[s1 + 1 : e1 + 1]))
                if d1 is not None and d1[0] == "function" and d1[1] == name:
                    end = e1
                    j += 1
                else:
                    break
        out.append((s0 + 1, end + 1, ctype, name, 0))
        i = j if j > i + 1 else i + 1
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
    "c": (("//", "/*", "*"), ()),
    "cpp": (("//", "/*", "*"), ("[[",)),
    "csharp": (("//", "/*", "*"), ("[",)),
    "dart": (("//", "/*", "*"), ("@",)),
    "zig": (("//",), ()),
    "ruby": (("#",), ()),
    "elixir": (("#",), ()),
    "haskell": (("--", "{-"), ()),
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
    elif lang in ("ruby", "elixir"):
        caps = end_block_chunks(src, lang)
    elif lang == "haskell":
        caps = haskell_chunks(src)
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
