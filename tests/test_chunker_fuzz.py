"""Cross-language chunker fuzz: every structural engine (Python AST,
brace heuristics, ruby/elixir end-blocks, Haskell equation merge,
Markdown sections) must uphold the reference chunk invariants on
MUTATED input — truncation mid-construct, shuffled blocks, injected
junk/comments/blanks, unicode — never crash, never emit an invalid
span, and keep the byte-span contract (``Span``,
ck-core/src/lib.rs:124-217) exact:

1. 1 <= line_start <= line_end <= n_lines for every row;
2. every line is covered by >= 1 depth-0/text row (gap-fill contract,
   ck-chunk/src/query_chunker.rs:430-560);
3. raw_bytes[byte_start:byte_end] reproduces the chunk's text modulo
   original line terminators.

Constructs are assembled from per-language fragments, so most mutants
still look like real code — more discriminating than pure noise.
"""

import random

import pyarrow as pa
import pytest

from ck_ray.chunker import ast_chunk_batch, structural_chunks

FRAGMENTS: dict[str, list[str]] = {
    "python": [
        "def f(x):\n    return x + 1\n",
        "class K:\n    def m(self):\n        pass\n",
        "@deco\ndef g():\n    yield 1\n",
        "X = 1\n",
    ],
    "rust": [
        "fn f(x: i32) -> i32 {\n    x + 1\n}\n",
        "struct S {\n    a: u8,\n}\n",
        "impl S {\n    fn m(&self) {}\n}\n",
        "pub const N: usize = 4;\n",
    ],
    "go": [
        "func F(x int) int {\n    return x\n}\n",
        "type T struct {\n    A int\n}\n",
        "func (t *T) M() {}\n",
    ],
    "javascript": [
        "function f(x) {\n    return x;\n}\n",
        "class K {\n    m() {\n        return 1;\n    }\n}\n",
        "const g = (a) => {\n    return a;\n};\n",
    ],
    "typescript": [
        "function f(x: number): number {\n    return x;\n}\n",
        "interface I {\n    a: string;\n}\n",
        "export class K {\n    m(): void {}\n}\n",
    ],
    "java": [
        "public class K {\n    int m() {\n        return 1;\n    }\n}\n",
        "@Override\npublic void run() {\n}\n",
    ],
    "c": [
        "int f(int x) {\n    return x + 1;\n}\n",
        "struct s {\n    int a;\n};\n",
        "#define SQ(x) ((x) * (x))\n",
        "typedef enum color { RED, BLUE } color_t;\n",
    ],
    "cpp": [
        "template <typename T>\nT f(T x) {\n    return x;\n}\n",
        "class K {\npublic:\n    int m() { return 1; }\n};\n",
        "namespace ns {\nint g() { return 2; }\n}\n",
    ],
    "csharp": [
        "public class K {\n    public int M() {\n        return 1;\n    }\n}\n",
        "namespace N;\npublic record R(int A);\n",
    ],
    "dart": [
        "class K {\n  int m() {\n    return 1;\n  }\n}\n",
        "int f(int x) {\n  return x;\n}\n",
    ],
    "zig": [
        "pub fn f(x: i32) i32 {\n    return x + 1;\n}\n",
        "const S = struct {\n    a: u8,\n};\n",
    ],
    "ruby": [
        "def f(x)\n  x + 1\nend\n",
        "class K\n  def m\n    1\n  end\nend\n",
        "module M\n  def self.g\n  end\nend\n",
    ],
    "elixir": [
        "defmodule M do\n  def f(x), do: x + 1\nend\n",
        "defmodule K do\n  defp g(a) do\n    a\n  end\nend\n",
    ],
    "haskell": [
        "f :: Int -> Int\nf 0 = 0\nf n = n + 1\n",
        "data T = A | B\n",
        "g x = x * 2\n",
    ],
    "markdown": [
        "# Title\n\nintro text\n",
        "## Section\n\nbody line\n\n```python\nx = 1\n```\n",
        "- item one\n- item two\n",
    ],
}

JUNK = ["", "   ", "// junk ~!@#$", "# junk", "naïve café – unicode", "}}{{"]


def _mutate(rng: random.Random, lang: str) -> str:
    frags = FRAGMENTS[lang]
    parts = [rng.choice(frags) for _ in range(rng.randint(1, 6))]
    rng.shuffle(parts)
    src = "".join(parts)
    lines = src.splitlines()
    for _ in range(rng.randint(0, 4)):
        kind = rng.randrange(4)
        if not lines:
            break
        i = rng.randrange(len(lines))
        if kind == 0:
            lines.insert(i, rng.choice(JUNK))
        elif kind == 1:
            del lines[i]
        elif kind == 2:
            lines.insert(i, lines[i])
        else:  # truncate mid-construct
            lines = lines[:i + 1]
    return "\n".join(lines) + ("\n" if rng.random() < 0.8 else "")


@pytest.mark.parametrize("lang", sorted(FRAGMENTS))
def test_fuzz_invariants(lang):
    rng = random.Random(hash(lang) & 0xFFFF)
    for trial in range(25):
        src = _mutate(rng, lang)
        n_lines = len(src.splitlines())
        rows = structural_chunks(src, lang)
        if rows is not None:
            covered = set()
            for s, e, ctype, _crumb, depth in rows:
                assert 1 <= s <= e <= n_lines, (lang, trial, (s, e, n_lines))
                if depth == 0 or ctype == "text":
                    covered.update(range(s, e + 1))
            assert covered == set(range(1, n_lines + 1)), (lang, trial)

        if not src.splitlines():
            continue
        t = pa.table({
            "repo": ["r"], "path": [f"f.{lang}"], "commit": ["0"],
            "lang": [lang], "content": [src],
        })
        out = ast_chunk_batch(t)
        raw = src.encode("utf-8")
        for r in out.to_pylist():
            sl = raw[r["byte_start"]:r["byte_end"]].decode("utf-8")
            assert sl.replace("\r\n", "\n").replace("\r", "\n") == r["text"], (
                lang, trial, r["breadcrumb"]
            )
