"""Structural (AST) chunker: captures, breadcrumbs, containment, gap
fill, striding — semantics mirroring ck-chunk's query chunker."""

import pyarrow as pa
import pytest

from ck_ray.chunker import (
    ast_chunk_batch,
    line_window_chunks,
    python_chunks,
    structural_chunks,
)

SRC = '''\
"""module docstring"""
import os

CONST = 1


def top(a, b):
    x = a + b
    return x


@some.decorator
class Outer:
    """doc"""

    attr = 2

    def method_one(self):
        return 1

    async def method_two(self):
        def inner():
            return 2
        return inner

    class Inner:
        def deep(self):
            return 3


def tail():
    pass
'''


def _rows(src=SRC, **kw):
    return python_chunks(src, **kw)


def test_captures_types_and_spans():
    rows = _rows()
    by_crumb = {r[3]: r for r in rows if r[3]}
    assert by_crumb["top"][:2] == (7, 9)
    assert by_crumb["top"][2] == "function"
    # decorator included in the class span
    assert by_crumb["Outer"][:2] == (12, 28)
    assert by_crumb["Outer"][2] == "class"
    assert by_crumb["Outer.method_one"][2] == "method"
    assert by_crumb["Outer.method_two"][2] == "method"
    # def nested in a function is a function, with full ancestry
    assert by_crumb["Outer.method_two.inner"][2] == "function"
    assert by_crumb["Outer.Inner"][2] == "class"
    assert by_crumb["Outer.Inner.deep"][2] == "method"
    assert by_crumb["Outer.Inner.deep"][4] == 2  # depth = #ancestors


def test_gap_fill_covers_every_line_exactly_once():
    rows = _rows()
    n = len(SRC.splitlines())
    covered = []
    for s, e, ctype, _, depth in rows:
        if depth == 0:  # top-level captures + text gaps partition the file
            covered.extend(range(s, e + 1))
    assert sorted(covered) == list(range(1, n + 1))
    assert len(set(covered)) == len(covered)
    # the module header is a text chunk
    texts = [r for r in rows if r[2] == "text"]
    assert texts[0][:2] == (1, 6)


def test_containment_identical_span_suppressed():
    src = "class A:\n    def m(self):\n        pass\n"
    rows = python_chunks(src)
    spans = [(r[0], r[1]) for r in rows]
    assert len(spans) == len(set(spans))  # no duplicate spans
    src2 = "@d\nclass A:\n    pass\n"
    rows2 = python_chunks(src2)
    assert rows2[0][:2] == (1, 3)  # decorator in span


def test_parents_before_children_order():
    rows = _rows()
    pos = {r[3]: i for i, r in enumerate(rows) if r[3]}
    assert pos["Outer"] < pos["Outer.method_one"]
    assert pos["Outer.Inner"] < pos["Outer.Inner.deep"]


def test_striding_splits_long_chunks():
    body = "\n".join(f"    x{i} = {i}" for i in range(30))
    src = f"def big():\n{body}\n"
    rows = python_chunks(src, max_lines=10, overlap=2)
    strides = [r for r in rows if r[3].startswith("big#s")]
    assert len(strides) >= 3
    assert all(r[1] - r[0] + 1 <= 10 for r in strides)
    # stride windows overlap by 2 and cover the whole def
    assert strides[0][0] == 1
    assert strides[-1][1] == 31
    for a, b in zip(strides, strides[1:]):
        assert b[0] == a[0] + 8


def test_fallback_for_unsupported_and_bad_syntax():
    t = pa.table(
        {
            "repo": ["r", "r", "r", "r"],
            "path": ["a.lua", "b.py", "c.py", "d.rs"],
            "commit": ["0", "0", "0", "0"],
            "lang": ["lua", "python", "python", "rust"],
            "content": [
                "print(hello)\n" * 30,  # no structural chunker for lua
                "def ok():\n    pass\n",
                "def broken(:\n",  # SyntaxError -> fallback
                "just prose, no definitions\n" * 30,  # captures nothing
            ],
        }
    )
    out = ast_chunk_batch(t)
    df = out.to_pandas()
    for p in ("a.lua", "d.rs"):  # both take the line-window fallback
        sub = df[df["path"] == p]
        assert (sub["chunk_type"] == "text").all()
        assert len(sub) == len(line_window_chunks(30))
    okpy = df[df["path"] == "b.py"]
    assert set(okpy["chunk_type"]) == {"function"}
    bad = df[df["path"] == "c.py"]
    assert (bad["chunk_type"] == "text").all()


def test_chunk_text_matches_span():
    t = pa.table(
        {
            "repo": ["r"],
            "path": ["x.py"],
            "commit": ["0"],
            "lang": ["python"],
            "content": [SRC],
        }
    )
    df = ast_chunk_batch(t).to_pandas()
    lines = SRC.splitlines()
    for _, r in df.iterrows():
        assert r["text"] == "\n".join(lines[r["line_start"] - 1 : r["line_end"]])


def test_line_windows_match_semantic_chunker():
    """The fallback reproduces semantic.chunk_batch's window layout."""
    from ck_ray.semantic import chunk_batch

    content = "\n".join(f"line {i}" for i in range(47))
    t = pa.table(
        {
            "repo": ["r"], "path": ["d.txt"], "commit": ["0"],
            "lang": ["text"], "content": [content],
        }
    )
    a = chunk_batch(t).to_pandas()[["line_start", "line_end"]]
    b = ast_chunk_batch(t).to_pandas()[["line_start", "line_end"]]
    assert a.values.tolist() == b.values.tolist()


@pytest.mark.parametrize("n", [1, 4, 5, 20, 21, 36, 37, 100])
def test_window_emission_rule(n):
    """Windows at s=0,16,32,…; emitted iff s==0 or s+4 < n (the SQL
    oracle's closed form) — pinned against the generator."""
    rows = line_window_chunks(n)
    expect = [
        (s + 1, min(s + 20, n))
        for s in range(0, n, 16)
        if s == 0 or s + 4 < n
    ]
    assert [(r[0], r[1]) for r in rows] == expect


# ---- per-language structural captures, mirroring the reference's
# query_chunker tests (ck-chunk/src/query_chunker.rs:269-560)


def _caps(src, lang):
    from ck_ray.chunker import structural_chunks

    return structural_chunks(src, lang)


def test_rust_captures_core_constructs():
    src = (
        "mod sample {\n"
        "    pub struct Thing;\n"
        "\n"
        "    impl Thing {\n"
        "        pub fn new() -> Self { Self }\n"
        "        fn helper(&self) {}\n"
        "    }\n"
        "}\n"
        "\n"
        "fn util() {}\n"
        "\n"
        "trait Runner {\n"
        "    fn run(&self);\n"
        "}\n"
    )
    rows = _caps(src, "rust")
    by = {(r[2], r[3]): r for r in rows}
    assert ("function", "util") in by
    assert ("method", "sample.Thing.new") in by
    assert ("class", "sample.Thing") in by  # struct Thing;
    assert ("module", "sample") in by
    assert by[("module", "sample")][0:2] == (1, 8)
    # impl block is a module chunk with breadcrumb sample.Thing
    impls = [r for r in rows if r[2] == "module" and r[0] == 4]
    assert impls and impls[0][3] == "sample.Thing"
    # trait method DECLARATION (no body) is not captured, like the
    # reference's function_signature_item exclusion
    assert not any(r[3].endswith("run") for r in rows)
    assert ("class", "Runner") in by  # the trait itself is
    # depth: method inside impl inside mod = 2 ancestors
    assert by[("method", "sample.Thing.new")][4] == 2


def test_go_captures_core_constructs():
    src = (
        "package main\n"
        "\n"
        'func (s *Server) Handle(w io.Writer) {\n'
        '\tfmt.Println("hi { not a brace }")\n'
        "}\n"
        "\n"
        "func main() {\n"
        "\treturn\n"
        "}\n"
        "\n"
        "type Config struct {\n"
        "\tName string\n"
        "}\n"
        "\n"
        "type Alias = Config\n"
    )
    rows = _caps(src, "go")
    by = {(r[2], r[3]): r for r in rows}
    assert ("method", "Handle") in by  # receiver -> method
    assert ("function", "main") in by
    assert ("class", "Config") in by  # type_declaration -> class
    assert ("class", "Alias") in by  # brace-less type alias
    assert by[("class", "Config")][0:2] == (11, 13)
    # the quoted brace inside Println must not break the span
    assert by[("method", "Handle")][0:2] == (3, 5)


def test_javascript_captures_core_constructs():
    src = (
        "// Utility function\n"
        "export const util = () => {\n"
        "    return 42;\n"
        "};\n"
        "\n"
        "export class Example {\n"
        "    constructor() {}\n"
        "\n"
        "    // Another comment\n"
        "    run = () => {\n"
        "        return util();\n"
        "    };\n"
        "}\n"
        "\n"
        "const compute = (x) => x * 2;\n"
        "\n"
        "if (x) {\n"
        "    nope();\n"
        "}\n"
    )
    rows = _caps(src, "javascript")
    by = {(r[2], r[3]): r for r in rows}
    assert ("function", "util") in by  # exported arrow
    assert ("class", "Example") in by
    assert ("method", "Example.run") in by
    assert ("method", "Example.constructor") in by
    assert ("function", "compute") in by  # one-line arrow
    assert by[("function", "compute")][0:2] == (15, 15)
    # control flow is NOT a capture
    assert not any(r[3].endswith("if") for r in rows)


def test_java_captures_core_constructs():
    src = (
        "public class Greeter {\n"
        "    private String name;\n"
        "\n"
        "    public Greeter(String name) {\n"
        "        this.name = name;\n"
        "    }\n"
        "\n"
        "    @Override\n"
        "    public String hello(int n) throws Exception {\n"
        "        if (n > 0) {\n"
        "            return name;\n"
        "        }\n"
        '        return "";\n'
        "    }\n"
        "}\n"
        "\n"
        "interface Runner { }\n"
    )
    rows = _caps(src, "java")
    by = {(r[2], r[3]): r for r in rows}
    assert ("class", "Greeter") in by
    assert ("method", "Greeter.Greeter") in by  # constructor
    assert ("method", "Greeter.hello") in by
    assert ("class", "Runner") in by
    assert by[("method", "Greeter.hello")][0:2] == (9, 14)
    # the if-statement inside the method is not a capture
    assert sum(1 for r in rows if r[2] == "method") == 2


def test_markdown_captures_sections_and_fences():
    src = (
        "# Title\n"
        "\n"
        "Intro paragraph.\n"
        "\n"
        "Setext Section\n"
        "==============\n"
        "\n"
        "## Usage\n"
        "\n"
        "```rust\n"
        "fn main() {}\n"
        "```\n"
        "\n"
        "- Item one\n"
    )
    rows = _caps(src, "markdown")
    mods = {r[3]: r for r in rows if r[2] == "module"}
    assert "Title" in mods
    assert "Setext Section" in mods
    assert "Setext Section.Usage" in mods
    assert mods["Setext Section.Usage"][4] == 1  # nested one level
    fences = [r for r in rows if r[2] == "text" and r[0] == 10]
    assert fences and fences[0][1] == 12  # the fenced block incl. ```


def test_trivia_and_chunk_hash_columns():
    from ck_ray.chunker import compute_chunk_hash

    src = (
        "class Greeter:\n"
        "    # helper below\n"
        "    @staticmethod\n"
        "    def hello():\n"
        '        return "hi"\n'
        "    # trailing note\n"
    )
    t = pa.table(
        {
            "repo": ["r"], "path": ["g.py"], "commit": ["0"],
            "lang": ["python"], "content": [src],
        }
    )
    df = ast_chunk_batch(t).to_pandas()
    m = df[df["breadcrumb"] == "Greeter.hello"].iloc[0]
    assert any("@staticmethod" in s for s in m["leading_trivia"])
    assert any("# helper below" in s for s in m["leading_trivia"])
    assert any("# trailing note" in s for s in m["trailing_trivia"])
    # chunk hash covers text + trivia (reference compute_chunk_hash)
    assert m["chunk_hash"] == compute_chunk_hash(
        m["text"], list(m["leading_trivia"]), list(m["trailing_trivia"])
    )
    # a trivia-only change MUST change the hash
    other = compute_chunk_hash(m["text"], ["# different"], [])
    assert other != m["chunk_hash"]


def test_byte_spans_crlf_and_unicode():
    crlf = (
        "struct Código {\r\n"
        "    x: i32,\r\n"
        "}\r\n"
        "fn útil() {}\r\n"
    )
    t = pa.table(
        {
            "repo": ["r"], "path": ["c.rs"], "commit": ["0"],
            "lang": ["rust"], "content": [crlf],
        }
    )
    df = ast_chunk_batch(t).to_pandas()
    raw = crlf.encode("utf-8")
    for _, r in df.iterrows():
        sl = raw[r["byte_start"]:r["byte_end"]].decode("utf-8")
        # the raw byte slice reproduces the chunk with ORIGINAL (\r\n)
        # internal terminators; the text column is \n-joined
        assert sl.replace("\r\n", "\n") == r["text"]
        assert r["byte_start"] <= r["byte_end"]
        assert r["line_start"] >= 1 and r["line_start"] <= r["line_end"]


def test_spec_override_dir(tmp_path, monkeypatch):
    """CK_CHUNK_SPEC_DIR overrides/extends the per-language specs — the
    reference's CK_CHUNK_QUERY_DIR tags.scm mechanism
    (ck-chunk/src/query_chunker.rs:204-245)."""
    import json

    from ck_ray import chunker as ch

    # a brand-new language: haskell top-level equations as functions
    spec = {
        "name": "haskell",
        "defs": [
            {"pattern": "^(?P<name>[a-z]\\w*)\\s+.*=", "ctype": "function",
             "eol_emits": True}
        ],
        "comment_prefixes": ["--"],
        "line_comment": "--",
    }
    d = tmp_path / "specs"
    d.mkdir()
    (d / "haskell.json").write_text(json.dumps(spec))
    monkeypatch.setenv(ch.SPEC_OVERRIDE_DIR_ENV, str(d))
    ch._spec_cache.clear()
    src = "main = putStrLn hello\n\nhelper x = x + 1\n"
    rows = ch.structural_chunks(src, "haskell")
    names = {r[3] for r in rows if r[2] == "function"}
    assert names == {"main", "helper"}

    # ... and an override REPLACING a built-in (rust: functions only)
    (d / "rust.json").write_text(json.dumps({
        "name": "rust",
        "defs": [{"pattern": "^\\s*fn\\s+(?P<name>\\w+)",
                  "ctype": "function"}],
        "comment_prefixes": ["//"],
    }))
    ch._spec_cache.clear()
    rows = ch.structural_chunks("fn a() {}\nstruct B { x: i32 }\n", "rust")
    assert {r[2] for r in rows if r[3]} == {"function"}  # struct ignored

    monkeypatch.delenv(ch.SPEC_OVERRIDE_DIR_ENV)
    ch._spec_cache.clear()
    rows = ch.structural_chunks("fn a() {}\nstruct B { x: i32 }\n", "rust")
    assert any(r[2] == "class" for r in rows)  # built-in restored


def test_c_captures_core_constructs():
    src = (
        "#include <stdio.h>\n"
        "#define MAX(a,b) ((a)>(b)?(a):(b))\n"
        "#define LIMIT 100\n"
        "\n"
        "typedef struct point {\n"
        "    int x;\n"
        "} point_t;\n"
        "\n"
        "enum color { RED, GREEN };\n"
        "\n"
        "static int add(int a, int b) {\n"
        "    return a + b;\n"
        "}\n"
        "\n"
        "void *alloc_buf(size_t n)\n"
        "{\n"
        "    return malloc(n);\n"
        "}\n"
        "\n"
        "int declared_only(int a);\n"
    )
    rows = _caps(src, "c")
    by = {(r[2], r[3]): r for r in rows}
    assert ("function", "MAX") in by  # function-like macro
    assert ("text", "LIMIT") in by  # object macro
    assert ("class", "point") in by
    assert ("class", "color") in by
    assert by[("function", "add")][0:2] == (11, 13)
    # K&R style: brace on its own line still closes the span
    assert by[("function", "alloc_buf")][0:2] == (15, 18)
    # declarations without a body are not captured (reference
    # cpp_queries_skip_function_body_declarations)
    assert not any(r[3] == "declared_only" for r in rows)


def test_cpp_captures_core_constructs():
    src = (
        "namespace geo {\n"
        "\n"
        "template <typename T>\n"
        "class Point {\n"
        "public:\n"
        "    Point(T x, T y) : x_(x), y_(y) {}\n"
        "    T norm() const {\n"
        "        return x_ * x_;\n"
        "    }\n"
        "    virtual void draw() = 0;\n"
        "private:\n"
        "    T x_;\n"
        "};\n"
        "\n"
        "template <typename T>\n"
        "T clamp(T v, T lo, T hi) {\n"
        "    return v < lo ? lo : v;\n"
        "}\n"
        "\n"
        "}  // namespace geo\n"
    )
    rows = _caps(src, "cpp")
    by = {(r[2], r[3]): r for r in rows}
    assert ("module", "geo") in by
    # template-prefix merge: class span starts at the `template <...>`
    # line (reference merge_cpp_template_prefix_chunks)
    assert by[("class", "geo.Point")][0:2] == (3, 13)
    assert by[("method", "geo.Point.Point")][0:2] == (6, 6)
    assert ("method", "geo.Point.norm") in by
    # pure-virtual declaration is not captured
    assert not any(r[3].endswith("draw") for r in rows)
    # free function inside a namespace stays a function
    assert by[("function", "geo.clamp")][0:2] == (15, 18)


def test_csharp_captures_core_constructs():
    src = (
        "namespace Geo.Shapes;\n"
        "\n"
        "public sealed class Point\n"
        "{\n"
        "    private readonly int _x;\n"
        "\n"
        "    public Point(int x)\n"
        "    {\n"
        "        _x = x;\n"
        "    }\n"
        "\n"
        "    public int Norm() => _x * _x;\n"
        "\n"
        "    public static int Dist(Point a, Point b)\n"
        "    {\n"
        "        return 0;\n"
        "    }\n"
        "}\n"
        "\n"
        "public interface IShape\n"
        "{\n"
        "    int Area();\n"
        "}\n"
    )
    rows = _caps(src, "csharp")
    by = {(r[2], r[3]): r for r in rows}
    assert ("module", "Geo.Shapes") in by  # file-scoped namespace
    assert ("class", "Geo.Shapes.Point") in by
    assert ("method", "Geo.Shapes.Point.Point") in by
    assert by[("method", "Geo.Shapes.Point.Dist")][0:2] == (14, 17)
    assert ("module", "Geo.Shapes.IShape") in by


def test_dart_captures_core_constructs():
    src = (
        "const int limit = 100;\n"
        "\n"
        "class Point {\n"
        "  final int x;\n"
        "\n"
        "  Point(this.x);\n"
        "\n"
        "  int norm() {\n"
        "    return x * x;\n"
        "  }\n"
        "}\n"
        "\n"
        "int clamp(int v, int hi) {\n"
        "  return v > hi ? hi : v;\n"
        "}\n"
    )
    rows = _caps(src, "dart")
    by = {(r[2], r[3]): r for r in rows}
    assert ("text", "limit") in by  # top-level const -> @module.text
    assert ("class", "Point") in by
    assert ("method", "Point.norm") in by
    assert by[("function", "clamp")][0:2] == (13, 15)


def test_zig_captures_core_constructs():
    src = (
        'const std = @import("std");\n'
        "\n"
        "pub const Point = struct {\n"
        "    x: i32,\n"
        "\n"
        "    pub fn norm(self: Point) i32 {\n"
        "        return self.x * self.x;\n"
        "    }\n"
        "};\n"
        "\n"
        "pub fn clamp(v: i32, hi: i32) i32 {\n"
        "    return if (v > hi) hi else v;\n"
        "}\n"
        "\n"
        'test "clamp caps" {\n'
        "    try std.testing.expect(clamp(5, 3) == 3);\n"
        "}\n"
    )
    rows = _caps(src, "zig")
    by = {(r[2], r[3]): r for r in rows}
    assert ("module", "std") in by  # top-level const decl
    assert ("class", "Point") in by
    assert ("method", "Point.norm") in by
    assert by[("function", "clamp")][0:2] == (11, 13)
    assert ("module", "clamp caps") in by  # test block


def test_ruby_captures_core_constructs():
    src = (
        "module Geo\n"
        "  class Point\n"
        "    def initialize(x)\n"
        "      @x = x\n"
        "    end\n"
        "\n"
        "    def self.origin\n"
        "      new(0)\n"
        "    end\n"
        "\n"
        "    def norm\n"
        "      [@x].map { |v| v * v }.sum\n"
        "    end\n"
        "  end\n"
        "\n"
        "  def self.distance(a, b)\n"
        "    if a == b\n"
        "      return 0\n"
        "    end\n"
        "    [a, b].each do |p|\n"
        "      puts p\n"
        "    end\n"
        "  end\n"
        "end\n"
    )
    rows = _caps(src, "ruby")
    by = {(r[2], r[3]): r for r in rows}
    assert by[("module", "Geo")][0:2] == (1, 24)
    assert by[("class", "Geo.Point")][0:2] == (2, 14)
    assert ("method", "Geo.Point.initialize") in by
    assert ("method", "Geo.Point.self.origin") in by
    # if/end and do/end inside the method balance correctly
    assert by[("method", "Geo.self.distance")][0:2] == (16, 23)
    assert by[("method", "Geo.Point.norm")][4] == 2  # depth


def test_elixir_captures_core_constructs():
    src = (
        "defmodule Geo.Point do\n"
        "  @behaviour Geo.Shape\n"
        "  @spec norm(t()) :: number()\n"
        "\n"
        "  defstruct x: 0\n"
        "\n"
        "  def norm(%__MODULE__{x: x}) do\n"
        "    x * x\n"
        "  end\n"
        "\n"
        "  defp helper(v), do: v * 2\n"
        "\n"
        "  def scale(p, f) do\n"
        "    Enum.map([p.x], fn v -> v * f end)\n"
        "  end\n"
        "end\n"
    )
    rows = _caps(src, "elixir")
    by = {(r[2], r[3]): r for r in rows}
    assert by[("module", "Geo.Point")][0:2] == (1, 16)
    assert by[("method", "Geo.Point.norm")][0:2] == (7, 9)
    # `defp f(x), do: expr` single-line form
    assert by[("method", "Geo.Point.helper")][0:2] == (11, 11)
    # inline `fn ... end` must not close the def block early
    assert by[("method", "Geo.Point.scale")][0:2] == (13, 15)
    # @spec / @behaviour / defstruct single-line captures
    line_caps = [r for r in rows if r[0] == r[1] and r[2] in ("text", "class")]
    assert len(line_caps) >= 3


def test_haskell_equation_merge():
    src = (
        "module Geo where\n"
        "\n"
        "data Point = Point Int Int\n"
        "  deriving (Show)\n"
        "\n"
        "norm :: Point -> Int\n"
        "norm (Point x y) = x * x + y * y\n"
        "\n"
        "factorial :: Integer -> Integer\n"
        "factorial 0 = 1\n"
        "factorial n = n * factorial (n - 1)\n"
        "\n"
        "-- guard style\n"
        "clamp lo hi v\n"
        "  | v < lo = lo\n"
        "  | otherwise = v\n"
        "\n"
        "class Shape a where\n"
        "  area :: a -> Int\n"
        "\n"
        "instance Shape Point where\n"
        "  area _ = 0\n"
    )
    rows = _caps(src, "haskell")
    by = {(r[2], r[3]): r for r in rows}
    assert by[("module", "Point")][0:2] == (3, 4)  # data decl
    # signature + equation merge into ONE function chunk (reference
    # merge_haskell_functions, ck-chunk/src/lib.rs:715-826)
    assert by[("function", "norm")][0:2] == (6, 7)
    assert by[("function", "factorial")][0:2] == (9, 11)
    assert len([r for r in rows if r[3] == "factorial"]) == 1
    # guard-style equation with no `=` on the head line
    assert by[("function", "clamp")][0:2] == (14, 16)
    assert ("class", "Shape") in by


# --- adversarial capture fidelity (reference tree-sitter behaviors the
# line heuristics historically missed: strings containing braces across
# lines, preprocessor tricks, nested templates —
# ck-chunk/src/query_chunker.rs capture suites)


def test_rust_raw_string_braces_do_not_close_spans():
    src = (
        'fn raw() {\n'
        '    let s = r#"\n'
        '} } }\n'
        '{\n'
        '"#;\n'
        '}\n'
        '\n'
        'fn after_raw() {}\n'
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "rust")}
    assert caps[("function", "raw")] == (1, 6)
    assert caps[("function", "after_raw")] == (8, 8)


def test_js_template_literal_braces_do_not_close_spans():
    src = (
        "function tmpl() {\n"
        "  const s = `\n"
        "  } } {\n"
        "  `;\n"
        "  return s;\n"
        "}\n"
        "\n"
        "function after() { return 2; }\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "javascript")}
    assert caps[("function", "tmpl")] == (1, 6)
    assert caps[("function", "after")] == (8, 8)


def test_c_define_brace_is_not_structural():
    src = (
        "#define OPEN {\n"
        "#define SQUARE(x) ((x) * (x))\n"
        "\n"
        "void helper(int n) {\n"
        '    printf("%d", n);\n'
        "}\n"
        "\n"
        "int compute(int a, int b) {\n"
        "    return a + b;\n"
        "}\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "c")}
    # the stray '#define OPEN {' must NOT become a container: helper and
    # compute are top-level functions with exact spans, OPEN a 1-line
    # macro, SQUARE a macro-function
    assert caps[("text", "OPEN")] == (1, 1)
    assert caps[("function", "SQUARE")] == (2, 2)
    assert caps[("function", "helper")] == (4, 6)
    assert caps[("function", "compute")] == (8, 10)


def test_c_macro_continuation_spans_whole_body():
    src = (
        "#define MULTI(a, b) do { \\\n"
        "    int x = (a); \\\n"
        "    { (b); } \\\n"
        "} while (0)\n"
        "\n"
        "int after_macro(void) { return 3; }\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "c")}
    # tree-sitter's preproc_function_def spans the continuations; the
    # body's unbalanced-looking braces never leak into the file scope
    assert caps[("function", "MULTI")] == (1, 4)
    assert caps[("function", "after_macro")] == (6, 6)


def test_cpp_preproc_raw_string_and_nested_template():
    src = (
        "#if 0\n"
        "} stray close\n"
        "#endif\n"
        "template <typename T, template <class> class C>\n"
        "class Wrapper {\n"
        "public:\n"
        "    void run() {}\n"
        "};\n"
        "\n"
        'const char* q = R"sql(\n'
        "} } {\n"
        ')sql";\n'
        "\n"
        "int plain() { return 1; }\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "cpp")}
    # nested-template prefix merges into the class span; the raw string
    # and the #if-guarded stray brace never open/close anything
    assert caps[("class", "Wrapper")] == (4, 8)
    assert caps[("method", "Wrapper.run")] == (7, 7)
    assert caps[("function", "plain")] == (14, 14)


def test_csharp_verbatim_string_single_line_braces():
    src = (
        "class P {\n"
        '    string s = @"} } {";\n'
        "    public void Go() {}\n"
        "}\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "csharp")}
    assert caps[("class", "P")] == (1, 4)
    assert caps[("method", "P.Go")] == (3, 3)


def test_string_braces_after_comment_close():
    """A quoted brace AFTER a multi-line comment closes on the same
    line must still be blanked (review finding: the remainder skipped
    string blanking while a carry was open)."""
    src = (
        "int f(void) {\n"
        " /* guard\n"
        ' */ const char *s = "}";\n'
        " return 1;\n"
        "}\n"
        "\n"
        "int g(void) { return 2; }\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "c")}
    assert caps[("function", "f")] == (1, 5)
    assert caps[("function", "g")] == (7, 7)


def test_string_braces_after_raw_string_close():
    src = (
        "fn f() {\n"
        '    let a = r#"\n'
        '"#; let b = "}";\n'
        "}\n"
        "fn g() {}\n"
    )
    caps = {(c[2], c[3]): (c[0], c[1]) for c in structural_chunks(src, "rust")}
    assert caps[("function", "f")] == (1, 4)
    assert caps[("function", "g")] == (5, 5)
