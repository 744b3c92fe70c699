"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the exact input shape from BASELINE.json's ``input_hint``:
``(repo: string, path: string, commit: string, lang: string, content: string)``
with the token distribution the index must be exercised on:

- hot terms (``def``, ``return``, ``self``, ``if``, ``the``, ``fn``,
  ``let``) in >80% of files — drives the groupby(term) skew path;
- snake_case + camelCase identifiers, per-file unique rare ids;
- >=40-byte tokens (must vanish under RemoveLongFilter semantics);
- path-segment-only terms (indexed under the ``path`` field, absent from
  ``content`` — pins the content-field-only default query semantics,
  reference ``ck-engine/src/lib.rs:765``);
- mixed line endings (``\\n`` / ``\\r\\n`` / bare ``\\r``), unicode
  identifiers, empty / whitespace-only / multi-MB rows, exact-duplicate
  contents under distinct (repo, path).

Same (seed, n_files) always produces the identical table (no wall clock,
no external state). Rows are emitted sorted by (repo, path).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 2  # bump when generation logic changes (invalidates caches)


def wrap_lines(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Deterministically wrap space-separated text into 7-token lines
    (every 7th space becomes ``\\n``). The tokenizer splits on any
    non-alnum byte, so wrapping changes NO term, tf, dl or score — only
    the rendered line structure; DuckDB oracles apply the identical RE2
    rewrite in SQL (``regexp_replace(text, '((?:\\S+ ){6}\\S+) ', …, 'g')``)."""
    import pyarrow.compute as pc

    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    return pc.replace_substring_regex(arr, r"((?:\S+ ){6}\S+) ", "\\1\n")

HOT_TERMS = ["def", "return", "self", "if", "the", "fn", "let"]

SNAKE_IDS = [
    "parse_request_body", "get_user_by_id", "build_index_segment",
    "merge_posting_runs", "compute_doc_stats", "read_parquet_block",
    "tokenize_source_file", "apply_skip_blocks", "score_candidates",
    "flush_segment_writer",
]
CAMEL_IDS = [
    "getUserById", "parseRequestBody", "buildIndexSegment", "mergePostingRuns",
    "computeDocStats", "readParquetBlock", "tokenizeSourceFile",
    "scoreCandidates", "flushSegmentWriter", "applySkipBlocks",
]
MID_TERMS = [
    "query", "index", "batch", "stream", "shard", "merge", "varint", "delta",
    "posting", "segment", "lexical", "semantic", "hybrid", "cursor", "buffer",
    "context", "window", "vector", "schema", "column",
]
UNICODE_IDS = ["naïve", "café", "übermut", "数据索引", "переменная", "λάμδα"]
LONG_TOKEN = "x" * 41  # 41 bytes: dropped by the 40-byte RemoveLongFilter
EXTS = ["rs", "py", "js", "ts", "go", "java", "c", "cpp", "rb", "hs", "md", "txt", "", "zzz"]
EXT_LANG = {
    "rs": "rust", "py": "python", "js": "javascript", "ts": "typescript",
    "go": "go", "java": "java", "c": "c", "cpp": "cpp", "rb": "ruby",
    "hs": "haskell", "md": "markdown", "txt": "text", "": "", "zzz": "",
}
PKGS = ["core", "engine", "util", "io", "net", "model", "index", "search"]
# path segments that never appear in content (FIXTURES.md §1.1)
PATH_ONLY_SEGS = ["zqpathonly", "xvroutemod"]


def _content(rng: np.random.RandomState, file_no: int, lang: str) -> str:
    n_lines = int(rng.randint(5, 80))
    rare = f"uq{file_no:07d}marker"  # per-file unique term for top-1 tests
    # draw all randomness as arrays up front (vectorized; ~5x faster than
    # per-word rng calls — matters when generating 100k+ files)
    hot_on = rng.rand(n_lines) < 0.85
    hot_i = rng.randint(len(HOT_TERMS), size=n_lines)
    mid_i = rng.randint(len(MID_TERMS), size=n_lines)
    ident_r = rng.rand(n_lines)
    snake_i = rng.randint(len(SNAKE_IDS), size=n_lines)
    camel_i = rng.randint(len(CAMEL_IDS), size=n_lines)
    uni_on = rng.rand(n_lines) < 0.05
    uni_i = rng.randint(len(UNICODE_IDS), size=n_lines)
    long_on = rng.rand(n_lines) < 0.03
    mid2_on = rng.rand(n_lines) < 0.3
    mid2_i = rng.randint(len(MID_TERMS), size=n_lines)
    lines = []
    for i in range(n_lines):
        words = []
        if hot_on[i]:
            words.append(HOT_TERMS[hot_i[i]])
        words.append(MID_TERMS[mid_i[i]])
        if ident_r[i] < 0.35:
            words.append(SNAKE_IDS[snake_i[i]])
        elif ident_r[i] < 0.6:
            words.append(CAMEL_IDS[camel_i[i]])
        if uni_on[i]:
            words.append(UNICODE_IDS[uni_i[i]])
        if long_on[i]:
            words.append(LONG_TOKEN)
        if mid2_on[i]:
            words.append(MID_TERMS[mid2_i[i]])
        lines.append(f"{'    ' if i % 4 else ''}{' '.join(words)}(arg_{i % 7});")
    lines.insert(int(rng.randint(n_lines)), f"// {rare}")
    ending = "\n"
    er = rng.rand()
    if er < 0.05:
        ending = "\r\n"
    elif er < 0.07:
        ending = "\r"
    return ending.join(lines) + ending


def generate_corpus(
    n_files: int = 200, seed: int = 42, n_orgs: int = 4
) -> pa.Table:
    """Build the corpus table in memory (deterministic in (seed, n_files))."""
    rng = np.random.RandomState(seed)
    # Zipf-ish repo sizes: repo j of org i gets weight ~ 1/(rank)
    n_repos = max(2, n_files // 50)
    weights = 1.0 / np.arange(1, n_repos + 1)
    weights /= weights.sum()
    repo_names = [f"org{i % n_orgs}/repo{i}" for i in range(n_repos)]
    commits = {
        r: "".join(rng.choice(list("0123456789abcdef"), 40)) for r in repo_names
    }
    repo_of = rng.choice(n_repos, size=n_files, p=weights)

    rows: list[tuple[str, str, str, str, str]] = []
    for fno in range(n_files):
        repo = repo_names[repo_of[fno]]
        ext = EXTS[rng.randint(len(EXTS))]
        segs = [PKGS[rng.randint(len(PKGS))] for _ in range(int(rng.randint(1, 4)))]
        if rng.rand() < 0.02:
            segs.insert(0, PATH_ONLY_SEGS[rng.randint(len(PATH_ONLY_SEGS))])
        name = f"file{fno:06d}" + (f".{ext}" if ext else "")
        path = "/".join(["src", *segs, name])
        lang = EXT_LANG[ext]
        content = _content(rng, fno, lang)
        rows.append((repo, path, commits[repo], lang, content))

    # edge rows (deterministic, appended before the final sort)
    base_repo = repo_names[0]
    edge = [
        (base_repo, "src/edge/empty.py", commits[base_repo], "python", ""),
        (base_repo, "src/edge/blank.py", commits[base_repo], "python", "   \n\t\n  \n"),
        (base_repo, "src/edge/crlf.c", commits[base_repo], "c",
         "def the merge\r\nreturn posting_list\r\nlet snake_case value\r\n"),
    ]
    if n_files >= 50:
        big = ("big_payload_line the merge index " + LONG_TOKEN + "\n") * 2000
        edge.append((base_repo, "src/edge/big.rs", commits[base_repo], "rust", big))
        # exact duplicate content across distinct (repo, path): same sha256
        dup_src = rows[10][4]
        other = repo_names[min(1, n_repos - 1)]
        edge.append((other, "src/edge/dup_a.py", commits[other], "python", dup_src))
        edge.append((other, "src/edge/dup_b.py", commits[other], "python", dup_src))
    rows.extend(edge)
    rows.sort(key=lambda r: (r[0], r[1]))
    cols = list(zip(*rows))
    return pa.table(
        {
            "repo": pa.array(cols[0], pa.string()),
            "path": pa.array(cols[1], pa.string()),
            "commit": pa.array(cols[2], pa.string()),
            "lang": pa.array(cols[3], pa.string()),
            "content": pa.array(cols[4], pa.string()),
        }
    )


def corpus_parquet(
    n_files: int, seed: int = 42, out_dir: str = "/tmp/ck_ray_corpus", *,
    rows_per_file: int = 4096,
) -> str:
    """Write (or reuse a cached) corpus parquet dir; returns the directory.

    Multiple part files so Ray's read parallelizes; cache key is
    (n_files, seed) so repeated test/bench runs don't regenerate.
    """
    d = os.path.join(out_dir, f"n{n_files}_s{seed}_g{GEN_VERSION}")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    t = generate_corpus(n_files, seed)
    nparts = max(1, (t.num_rows + rows_per_file - 1) // rows_per_file)
    for i in range(nparts):
        pq.write_table(
            t.slice(i * rows_per_file, rows_per_file),
            os.path.join(d, f"part-{i:05d}.parquet"),
        )
    with open(done, "w") as f:
        f.write(f"{t.num_rows}\n")
    return d


def text_rows_mask(content) -> pa.Array:
    """Reference binary sniff (``is_text_file``,
    ck-index/src/lib.rs:1598-1625): ripgrep's NUL heuristic over the
    first 8 KiB — a NUL byte there marks the row binary; empty content
    (and NULs past 8 KiB) is text. Vectorized: byte-wise slice + substring
    scan, no Python loop."""
    import pyarrow.compute as pc

    arr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) \
        else content
    head = pc.binary_slice(arr.cast(pa.binary()), 0, 8192)
    return pc.invert(pc.match_substring(head, "\x00"))


def preview_column(content, n_lines: int = 3):
    """First ``n_lines`` lines of each string, Rust ``str::lines`` exact:
    split at ``\\n`` with terminator semantics (a trailing ``\\n`` yields
    no final empty line) and ONE trailing ``\\r`` stripped per line —
    the reference's lexical-result snippet
    (``content_text.lines().take(3).join("\\n")``,
    ck-engine/src/lib.rs:794-798; carried to clients as
    ``JsonlSearchResult.snippet``, ck-core/src/lib.rs:264-374).
    Fully vectorized: one RE2 extract + two fix-up kernels."""
    import pyarrow.compute as pc

    arr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) \
        else content
    pat = r"^(?P<p>[^\n]*(?:\n[^\n]*){0,%d})" % max(n_lines - 1, 0)
    p = pc.struct_field(pc.extract_regex(arr, pat), "p")
    # a trailing \n is a terminator (no empty final line) — but ONLY when
    # the extract consumed the whole string; otherwise a trailing \n in
    # the window is a legitimate empty n-th line
    whole = pc.equal(pc.utf8_length(p), pc.utf8_length(arr))
    # each line sheds one trailing \r ONLY when it pairs with a \n
    # (Rust lines() keeps a bare trailing \r on the final line — the
    # std doctest's "baz\r" case)
    p = pc.replace_substring(p, "\r\n", "\n")
    p = pc.if_else(whole, pc.replace_substring_regex(p, r"\n$", ""), p)
    # when the capture stopped AT a \n (not whole), the window's last
    # line is \n-terminated in the source, so its trailing \r pairs too
    return pc.if_else(whole, p, pc.replace_substring_regex(p, r"\r$", ""))
