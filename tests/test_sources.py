"""Filesystem corpus sources: gitignore-aware walk + directory/JSONL
readers (reference collect_files, ck-index/src/lib.rs:211-262)."""

import json
import os

import pyarrow as pa
import pytest

from ck_ray.sources import (
    parse_ignore_lines,
    read_code_dir,
    read_corpus_jsonl,
    walk_code_files,
)


def _mk(root, rel, data=b"x = 1\n"):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(p, mode) as f:
        f.write(data)


@pytest.fixture()
def tree(tmp_path):
    root = str(tmp_path / "repo")
    _mk(root, "main.py", b"def main():\n    return 1\n")
    _mk(root, "lib/util.rs", b"fn util() {}\n")
    _mk(root, "lib/debug.log", b"log line\n")
    _mk(root, "lib/keep.log", b"kept\n")
    _mk(root, "secret.txt", b"root secret\n")
    _mk(root, "lib/secret.txt", b"nested secret\n")
    _mk(root, "build/out.o", b"obj\n")
    _mk(root, "node_modules/dep/index.js", b"module\n")
    _mk(root, ".hidden_file", b"hidden\n")
    _mk(root, "bin.dat", b"\x00\x01binary")
    _mk(root, "notutf8.py", b"\xff\xfe\x00bad")
    _mk(root, ".gitignore", "*.log\n!keep.log\nbuild/\n/secret.txt\n")
    _mk(root, "lib/.gitignore", "util.rs.bak\n")
    _mk(root, "lib/util.rs.bak", b"backup\n")
    return root


class TestWalk:
    def test_gitignore_semantics(self, tree):
        rels = walk_code_files(tree)
        assert "main.py" in rels
        assert "lib/util.rs" in rels
        # *.log ignored, !keep.log re-included (last match wins)
        assert "lib/debug.log" not in rels
        assert "lib/keep.log" in rels
        # dir-only pattern prunes the whole subtree
        assert not any(r.startswith("build/") for r in rels)
        # anchored /secret.txt hits only the root-level file
        assert "secret.txt" not in rels
        assert "lib/secret.txt" in rels
        # nested .gitignore applies beneath its own dir
        assert "lib/util.rs.bak" not in rels
        # default excludes + hidden rule
        assert not any(r.startswith("node_modules/") for r in rels)
        assert ".hidden_file" not in rels
        assert ".gitignore" not in rels
        # binary/invalid files ARE walked (the sniff is a read-side stage)
        assert "bin.dat" in rels
        # deterministic order
        assert rels == sorted(rels)

    def test_no_ignore_mode(self, tree):
        rels = walk_code_files(tree, respect_ignore=False)
        assert "lib/debug.log" in rels and "secret.txt" in rels
        # default excludes still apply (reference skips .git/.ck always)
        assert not any(r.startswith("node_modules/") for r in rels)

    def test_extra_excludes(self, tree):
        rels = walk_code_files(tree, extra_excludes=("*.py",))
        assert "main.py" not in rels and "lib/util.rs" in rels

    def test_gitignore_vs_ckignore_switches(self, tree):
        # a .ckignore at root excludes *.rs; .gitignore excludes *.log
        _mk(tree, ".ckignore", "*.rs\n")
        both = walk_code_files(tree)
        assert "lib/util.rs" not in both and "lib/debug.log" not in both
        # --no-ignore: only .ckignore applies
        no_git = walk_code_files(tree, respect_gitignore=False)
        assert "lib/util.rs" not in no_git
        assert "lib/debug.log" in no_git and "secret.txt" in no_git
        # --no-ckignore: only .gitignore applies
        no_ck = walk_code_files(tree, respect_ckignore=False)
        assert "lib/util.rs" in no_ck and "lib/debug.log" not in no_ck
        # extra_excludes still bite with every ignore file disabled
        none = walk_code_files(
            tree, respect_gitignore=False, respect_ckignore=False,
            extra_excludes=("*.rs",),
        )
        assert "lib/util.rs" not in none and "lib/debug.log" in none

    def test_no_default_excludes(self, tree):
        rels = walk_code_files(
            tree, respect_ignore=False, default_excludes=False
        )
        assert any(r.startswith("node_modules/") for r in rels)
        # hidden-file rule is independent of default excludes
        assert ".hidden_file" not in rels

    def test_double_star_and_class(self, tmp_path):
        root = str(tmp_path / "r2")
        _mk(root, "a/b/c/deep.tmp", b"t\n")
        _mk(root, "a/x1.py", b"p\n")
        _mk(root, "a/x2.py", b"p\n")
        _mk(root, ".gitignore", "**/*.tmp\na/x[2].py\n")
        rels = walk_code_files(root)
        assert "a/b/c/deep.tmp" not in rels
        assert "a/x1.py" in rels and "a/x2.py" not in rels

    def test_parse_skips_comments_blanks(self):
        rules = parse_ignore_lines(["# c", "", "  ", "*.o\n"])
        assert len(rules) == 1 and not rules[0].negate


class TestReadCodeDir:
    def test_corpus_schema_and_sniff(self, ray_session, tree):
        t = pa.Table.from_pandas(
            read_code_dir(tree, repo="myrepo", commit="abc").to_pandas()
        )
        assert t.column_names == ["repo", "path", "commit", "lang", "content"]
        rows = {
            r["path"]: r for r in t.to_pylist()
        }
        # binary (NUL sniff) and invalid-utf8 rows dropped at the read
        assert "bin.dat" not in rows and "notutf8.py" not in rows
        assert rows["main.py"]["lang"] == "python"
        assert rows["lib/util.rs"]["lang"] == "rust"
        assert rows["lib/keep.log"]["lang"] == ""
        assert rows["main.py"]["content"] == "def main():\n    return 1\n"
        assert all(r["repo"] == "myrepo" and r["commit"] == "abc"
                   for r in rows.values())

    def test_empty_dir(self, ray_session, tmp_path):
        root = str(tmp_path / "empty")
        os.makedirs(root)
        ds = read_code_dir(root)
        assert ds.count() == 0

    def test_feeds_index_build(self, ray_session, tree, tmp_path):
        """The walked corpus is a drop-in input for the index build."""
        from ck_ray.build import IndexConfig, build_index
        from ck_ray.query import BM25Engine

        idx = str(tmp_path / "idx")
        build_index(read_code_dir(tree), idx, IndexConfig(num_parts=4))
        eng = BM25Engine(idx, num_shards=1)
        hits = eng.search("util", top_k=5)
        assert any("util.rs" in p for p in hits["path"].tolist())
        eng.close()


class TestReadJsonl:
    def test_roundtrip(self, ray_session, tmp_path):
        p = str(tmp_path / "c.jsonl")
        with open(p, "w") as f:
            f.write(json.dumps({"path": "a.py", "content": "def a(): pass"}))
            f.write("\n")
            f.write(json.dumps(
                {"path": "b.rs", "content": "fn b() {}", "repo": "r",
                 "commit": "c1", "lang": "rust"}))
            f.write("\n")
        t = pa.Table.from_pandas(read_corpus_jsonl(p).to_pandas())
        rows = sorted(t.to_pylist(), key=lambda r: r["path"])
        assert rows[0]["lang"] == "python"  # detected from extension
        assert rows[0]["commit"] == "WORKTREE" and rows[0]["repo"] == ""
        assert rows[1] == {"repo": "r", "path": "b.rs", "commit": "c1",
                           "lang": "rust", "content": "fn b() {}"}


class TestCliCorpusDir:
    def test_index_and_search_from_dir(self, ray_session, tree, tmp_path):
        """--corpus-dir drives the same index+lex path as --corpus."""
        import io
        from contextlib import redirect_stderr, redirect_stdout

        from ck_ray import cli

        idx = str(tmp_path / "cliidx")

        def run(args):
            out, err = io.StringIO(), io.StringIO()
            with redirect_stdout(out), redirect_stderr(err):
                code = cli.main([str(a) for a in args])
            return code, out.getvalue(), err.getvalue()

        code, _, err = run(
            ["--index", "--corpus-dir", tree, "--index-dir", idx,
             "--num-parts", "4"]
        )
        assert code == 0, err
        code, out, err = run(["--lex", "util", "--index-dir", idx, "--topk", "5"])
        assert code == 0, err
        assert "util.rs" in out
