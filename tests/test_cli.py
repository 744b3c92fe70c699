"""CLI integration tests, mirroring the reference's
``ck-cli/tests/integration_tests.rs`` (drive argv, assert stdout + exit
code). Most tests call ``cli.main(argv)`` in-process against the shared
pytest Ray session — same argv surface, same output contract, ~50x less
wall time than booting a fresh Ray per invocation; one true subprocess
round-trip (``test_subprocess_end_to_end``) keeps the spawn/exit-code
path honest."""

import io
import json
import os
import subprocess
import sys
from contextlib import redirect_stderr, redirect_stdout
from types import SimpleNamespace

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory, ray_session):
    """A corpus parquet + built index, shared by the CLI tests."""
    import pyarrow.parquet as pq

    from ck_ray.corpus import generate_corpus

    d = tmp_path_factory.mktemp("cli")
    corpus = str(d / "corpus")
    os.makedirs(corpus)
    pq.write_table(generate_corpus(300, seed=21), os.path.join(corpus, "part-0.parquet"))
    idx = str(d / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx, "--num-parts", "4"])
    assert r.returncode == 0, r.stderr
    return corpus, idx


def run(args):
    """In-process CLI invocation: returns (returncode, stdout, stderr)
    shaped like subprocess.CompletedProcess."""
    from ck_ray import cli

    out, err = io.StringIO(), io.StringIO()
    try:
        with redirect_stdout(out), redirect_stderr(err):
            code = cli.main([str(a) for a in args])
    except SystemExit as e:  # argparse errors
        code = int(e.code or 0)
    return SimpleNamespace(
        returncode=code, stdout=out.getvalue(), stderr=err.getvalue()
    )


def run_subprocess(args, timeout=900):
    return subprocess.run(
        [sys.executable, "-m", "ck_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, timeout=timeout,
    )


def test_subprocess_end_to_end(cli_env):
    """One real spawn: fresh interpreter, fresh Ray, search the shared
    index, grep-style exit codes."""
    _, idx = cli_env
    r = run_subprocess(["--lex", "uq0000042marker", "--index-dir", idx,
                        "--topk", "5"])
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.strip().splitlines()) == 1
    miss = run_subprocess(["--lex", "zz_absent_zz", "--index-dir", idx])
    assert miss.returncode == 1 and miss.stdout.strip() == ""


def test_index_and_status(cli_env):
    _, idx = cli_env
    r = run(["--status", "--index-dir", idx])
    assert r.returncode == 0
    st = json.loads(r.stdout)
    assert st["num_docs"] == 306


def test_lexical_search(cli_env):
    _, idx = cli_env
    r = run(["--lex", "uq0000042marker", "--index-dir", idx, "--topk", "5"])
    assert r.returncode == 0
    assert len(r.stdout.strip().splitlines()) == 1  # unique marker -> 1 hit


def test_lexical_snippet_flags(cli_env):
    """--jsonl carries the 3-line snippet (`preview`) by default;
    --no-snippet drops it; --scores adds the raw BM25 score to text
    output; --json-v1 wraps in the versioned envelope."""
    _, idx = cli_env
    r = run(["--lex", "uq0000042marker", "--index-dir", idx,
             "--topk", "5", "--jsonl"])
    assert r.returncode == 0
    rec = json.loads(r.stdout.strip().splitlines()[0])
    assert rec.get("preview") and "\n" in rec["preview"]
    assert len(rec["preview"].split("\n")) <= 3
    r2 = run(["--lex", "uq0000042marker", "--index-dir", idx,
              "--topk", "5", "--jsonl", "--no-snippet"])
    rec2 = json.loads(r2.stdout.strip().splitlines()[0])
    assert "preview" not in rec2
    r3 = run(["--lex", "uq0000042marker", "--index-dir", idx,
              "--topk", "5", "--scores"])
    parts = r3.stdout.strip().splitlines()[0].split(":")
    assert len(parts) == 4 and float(parts[2]) > 0  # path:norm:score:doc_id
    r4 = run(["--lex", "uq0000042marker", "--index-dir", idx,
              "--topk", "5", "--json-v1"])
    env = json.loads(r4.stdout)
    assert env["version"] == 1 and len(env["results"]) == 1


def test_regex_modes_and_exit_codes(cli_env):
    corpus, _ = cli_env
    hit = run(["getUserById", "--corpus", corpus, "--topk", "3"])
    assert hit.returncode == 0 and len(hit.stdout.strip().splitlines()) == 3
    ci = run(["GETUSERBYID", "--corpus", corpus, "-i", "--topk", "1"])
    assert ci.returncode == 0
    miss = run(["zz_absent_zz", "--corpus", corpus])
    assert miss.returncode == 1 and miss.stdout.strip() == ""
    err = run(["pattern"])  # no corpus
    assert err.returncode == 2


def test_files_with_matches_and_json(cli_env):
    corpus, _ = cli_env
    r = run(["merge", "--corpus", corpus, "-l"])
    assert r.returncode == 0
    paths = r.stdout.strip().splitlines()
    assert len(paths) == len(set(paths)) > 10
    j = run(["uq0000042marker", "--corpus", corpus, "--json"])
    arr = json.loads(j.stdout)  # --json = one array; --jsonl = lines
    assert isinstance(arr, list)
    # reference documented contract (output-formats.md): file/line/content
    rec = arr[0]
    assert {"file", "line", "content", "repo", "path"} <= set(rec)
    assert isinstance(rec["line"], int) and rec["file"] == rec["path"]
    assert "uq0000042marker" in rec["content"]
    assert rec["span"]["line_start"] == rec["line"]
    # JSONL: same schema, one object per line, incl. the Rust-struct
    # 'snippet' spelling
    jl = run(["uq0000042marker", "--corpus", corpus, "--jsonl"])
    lrec = json.loads(jl.stdout.strip().splitlines()[0])
    assert lrec["snippet"] == lrec["content"] == rec["content"]


def test_full_section_flag(cli_env):
    corpus, _ = cli_env
    r = run(["uq0000042marker", "--corpus", corpus, "--full-section", "--json"])
    rec = json.loads(r.stdout)[0]
    assert "section" in rec and "uq0000042marker" in rec["section"]


def test_semantic_and_hybrid_smoke(cli_env):
    corpus, _ = cli_env
    s = run(["--sem", "merge posting runs", "--corpus", corpus, "--topk", "3"])
    assert s.returncode == 0 and len(s.stdout.strip().splitlines()) == 3
    h = run(["--hybrid", "merge", "--corpus", corpus, "--topk", "5"])
    assert h.returncode == 0 and len(h.stdout.strip().splitlines()) == 5


def test_files_without_match_and_exclude(cli_env):
    corpus, _ = cli_env
    # -L: every file NOT containing the unique marker
    rl = run(["uq0000042marker", "--corpus", corpus, "-l"])
    rL = run(["uq0000042marker", "--corpus", corpus, "-L"])
    assert rl.returncode == 0 and rL.returncode == 0
    n_l = len(rl.stdout.strip().splitlines())
    n_L = len(rL.stdout.strip().splitlines())
    assert n_l == 1 and n_l + n_L == 306
    # --exclude removes the matching file entirely
    rx = run(["uq0000042marker", "--corpus", corpus, "-l",
              "--exclude", "src/*"])
    assert rx.returncode == 1 and rx.stdout.strip() == ""


def test_json_array_vs_jsonl(cli_env):
    corpus, _ = cli_env
    ra = run(["uq0000042marker", "--corpus", corpus, "-l", "--json"])
    arr = json.loads(ra.stdout)
    assert isinstance(arr, list) and len(arr) == 1
    rj = run(["uq0000042marker", "--corpus", corpus, "-l", "--jsonl"])
    recs = [json.loads(x) for x in rj.stdout.strip().splitlines()]
    assert recs == arr


def test_inspect_and_dump_chunks(cli_env):
    corpus, _ = cli_env
    import pyarrow.parquet as pq

    path = pq.read_table(os.path.join(corpus, "part-0.parquet"))["path"][0].as_py()
    ri = run(["--inspect", path, "--corpus", corpus])
    assert ri.returncode == 0
    info = json.loads(ri.stdout)
    assert info["path"] == path and info["n_tokens"] > 0
    rd = run(["--dump-chunks", path, "--corpus", corpus, "--jsonl"])
    assert rd.returncode == 0
    chunks = [json.loads(x) for x in rd.stdout.strip().splitlines()]
    assert chunks and all(c["path"] == path for c in chunks)
    assert chunks[0]["line_start"] == 1


def test_clean(tmp_path, cli_env):
    corpus, _ = cli_env
    idx = str(tmp_path / "cleanme")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx, "--num-parts", "2"])
    assert r.returncode == 0
    r2 = run(["--clean", "--index-dir", idx])
    assert r2.returncode == 0 and not os.path.exists(idx)
    # refuses a non-index dir
    other = str(tmp_path / "notindex")
    os.makedirs(other)
    r3 = run(["--clean", "--index-dir", other])
    assert r3.returncode == 2 and os.path.exists(other)


def test_add_switch_model_and_status_verbose(cli_env, tmp_path_factory):
    """--add upserts one file without deleting the rest; --switch-model
    persists a registry-validated choice the status report exposes;
    --status-verbose adds lineage (reference main.rs:288-321)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cli_add")
    corpus = str(d / "corpus")
    os.makedirs(corpus)
    from ck_ray.corpus import generate_corpus

    base = generate_corpus(50, seed=33)
    pq.write_table(base, os.path.join(corpus, "part-0.parquet"))
    idx = str(d / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "4"])
    assert r.returncode == 0, r.stderr
    n0 = json.loads(run(["--status", "--index-dir", idx]).stdout)["num_docs"]

    # corpus gains one brand-new file; --add must index ONLY it
    new_row = pa.table(
        {
            "repo": ["org0/new"], "path": ["src/added_one.py"],
            "commit": ["f" * 40], "lang": ["python"],
            "content": ["def added_marker_fn():\n    return 42\n"],
        }
    )
    pq.write_table(new_row, os.path.join(corpus, "part-1.parquet"))
    r = run(["--add", "src/added_one.py", "--corpus", corpus,
             "--index-dir", idx])
    assert r.returncode == 0, r.stderr
    st = json.loads(run(["--status-json", "--index-dir", idx]).stdout)
    assert st["num_docs"] == n0 + 1
    # the added doc is searchable; nothing was deleted
    r = run(["--lex", "added_marker_fn", "--index-dir", idx, "--topk", "3"])
    assert r.returncode == 0 and "added_one.py" in r.stdout
    r = run(["--lex", "uq0000042marker", "--index-dir", idx, "--topk", "3"])
    assert r.returncode == 0 and len(r.stdout.strip().splitlines()) == 1

    # --switch-model persists; --status surfaces it; bogus name errors
    r = run(["--switch-model", "bge-small", "--index-dir", idx])
    assert r.returncode == 0 and "bge-small" in r.stdout
    st = json.loads(run(["--status", "--index-dir", idx]).stdout)
    assert st["model"] == "bge-small"
    assert run(["--switch-model", "not-a-model", "--index-dir", idx]).returncode == 2

    sv = json.loads(run(["--status-verbose", "--index-dir", idx]).stdout)
    assert sv["parts"] and sv["epochs"]


def test_clean_orphans_flag(tmp_path_factory):
    """--clean-orphans tombstones index docs absent from the corpus but
    reindexes nothing (reference --clean-orphans, main.rs:285)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cli_orphans")
    corpus = str(d / "corpus")
    os.makedirs(corpus)
    from ck_ray.corpus import generate_corpus

    base = generate_corpus(40, seed=44)
    pq.write_table(base, os.path.join(corpus, "part-0.parquet"))
    idx = str(d / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "4"])
    assert r.returncode == 0, r.stderr
    gone_path = base["path"][0].as_py()

    # corpus loses its first 10 docs
    pq.write_table(base.slice(10), os.path.join(corpus, "part-0.parquet"))
    r = run(["--clean-orphans", "--corpus", corpus, "--index-dir", idx])
    assert r.returncode == 0, r.stderr
    st = json.loads(run(["--status", "--index-dir", idx]).stdout)
    assert st["num_docs"] == base.num_rows - 10
    # the orphan is gone from lexical results
    r = run(["--lex", gone_path, "--index-dir", idx, "--topk", "40",
             "--jsonl"])
    assert gone_path not in r.stdout


def test_no_filename_and_compat_flags(cli_env):
    corpus, idx = cli_env
    plain = run(["uq0000042marker", "--corpus", corpus])
    noname = run(["uq0000042marker", "--corpus", corpus, "--no-filename"])
    assert plain.returncode == 0 and noname.returncode == 0
    assert ":" in plain.stdout.strip()
    assert plain.stdout.strip().split(":", 1)[1] == noname.stdout.strip()
    # -n / -H / -R accepted (defaults already match their meaning)
    r = run(["-n", "-H", "-R", "uq0000042marker", "--corpus", corpus])
    assert r.returncode == 0 and r.stdout == plain.stdout


def test_rerank_flag(cli_env):
    corpus, _ = cli_env
    r = run(["--sem", "merge posting runs", "--corpus", corpus,
             "--rerank", "--topk", "5"])
    assert r.returncode == 0
    assert len(r.stdout.strip().splitlines()) == 5


def test_rerank_model_flag(cli_env):
    corpus, _ = cli_env
    r = run(["--sem", "merge posting runs", "--corpus", corpus,
             "--rerank", "--rerank-model", "bge", "--topk", "5"])
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.strip().splitlines()) == 5


def test_force_rebuild(cli_env, tmp_path_factory):
    corpus, _ = cli_env
    idx = str(tmp_path_factory.mktemp("force") / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "2"])
    assert r.returncode == 0, r.stderr
    # a second plain --index into a committed dir must fail ...
    r2 = run(["--index", "--corpus", corpus, "--index-dir", idx,
              "--num-parts", "2"])
    assert r2.returncode != 0
    # ... and --force wipes + rebuilds
    r3 = run(["--index", "--force", "--corpus", corpus, "--index-dir", idx,
              "--num-parts", "2"])
    assert r3.returncode == 0, r3.stderr
    r4 = run(["merge", "--lex", "--index-dir", idx, "--topk", "3"])
    assert r4.returncode == 0, r4.stderr


def test_force_recovers_wedged_index(cli_env, tmp_path_factory):
    """--force must recover a PARTIALLY-committed index (epoch dir
    present, manifest.json missing — a crash between epoch commit and
    manifest write), and must refuse to wipe a non-index directory."""
    corpus, _ = cli_env
    idx = str(tmp_path_factory.mktemp("wedge") / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "2"])
    assert r.returncode == 0, r.stderr
    os.remove(os.path.join(idx, "manifest.json"))  # wedge it
    r2 = run(["--index", "--force", "--corpus", corpus, "--index-dir", idx,
              "--num-parts", "2"])
    assert r2.returncode == 0, r2.stderr
    r3 = run(["merge", "--lex", "--index-dir", idx, "--topk", "3"])
    assert r3.returncode == 0, r3.stderr
    # refuse to wipe a directory that is not an index
    notidx = str(tmp_path_factory.mktemp("notidx"))
    with open(os.path.join(notidx, "precious.txt"), "w") as f:
        f.write("keep me")
    r4 = run(["--index", "--force", "--corpus", corpus,
              "--index-dir", notidx, "--num-parts", "2"])
    assert r4.returncode == 2
    assert os.path.exists(os.path.join(notidx, "precious.txt"))


def test_serve_needs_args():
    r = run(["--serve"])
    assert r.returncode == 2
    assert "--serve needs" in r.stderr


def test_conflicting_corpus_sources(cli_env, tmp_path):
    corpus, _ = cli_env
    r = run(["--status", "--corpus", corpus, "--corpus-dir", str(tmp_path)])
    assert r.returncode == 2
    assert "exactly one" in r.stderr


def test_compact_flag(cli_env):
    _, idx = cli_env
    r = run(["--compact", "--index-dir", idx])
    assert r.returncode == 0, r.stderr
    assert "compacted" in r.stdout
    r = run(["merge", "--lex", "--index-dir", idx, "--topk", "3"])
    assert r.returncode == 0, r.stderr


def test_long_flag_aliases_match_shorts(cli_env):
    """Reference long names (--word-regexp, --fixed-strings,
    --after/before-context, --files-without-matches) behave exactly like
    the shorts they alias."""
    corpus, _ = cli_env
    short = run(["-w", "-F", "uq0000042marker", "--corpus", corpus])
    long_ = run(["--word-regexp", "--fixed-strings", "uq0000042marker",
                 "--corpus", corpus])
    assert short.returncode == 0
    assert long_.stdout == short.stdout and long_.returncode == 0
    a = run(["-A", "1", "-B", "1", "uq0000042marker", "--corpus", corpus])
    b = run(["--after-context", "1", "--before-context", "1",
             "uq0000042marker", "--corpus", corpus])
    assert b.stdout == a.stdout
    c = run(["-L", "uq0000042marker", "--corpus", corpus])
    d = run(["--files-without-matches", "uq0000042marker",
             "--corpus", corpus])
    assert d.stdout == c.stdout


def test_quiet_suppresses_status_not_results(cli_env, tmp_path_factory):
    corpus, _ = cli_env
    idx = str(tmp_path_factory.mktemp("quiet") / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "4", "-q"])
    assert r.returncode == 0
    assert r.stdout == ""  # "indexed N docs..." suppressed
    hit = run(["--lex", "uq0000042marker", "--index-dir", idx, "-q"])
    assert hit.returncode == 0 and "uq" not in hit.stderr
    assert hit.stdout.strip()  # results still print under --quiet


def test_print_default_ckignore():
    r = run(["--print-default-ckignore"])
    assert r.returncode == 0
    assert "*.png" in r.stdout and "node_modules/" in r.stdout
    assert r.stdout.startswith("# .ckignore")


def test_positional_paths_walk_as_corpus(ray_session, tmp_path):
    """Reference `ck "pattern" src/` shape: positional dirs/files become
    the corpus when no --corpus* source is given."""
    root = tmp_path / "repo"
    (root / "src").mkdir(parents=True)
    (root / "other").mkdir()
    (root / "src" / "a.py").write_text("def alpha_marker(): pass\n")
    (root / "other" / "b.py").write_text("def alpha_marker(): pass\n")
    r = run(["alpha_marker", str(root / "src")])
    assert r.returncode == 0, r.stderr
    assert "a.py" in r.stdout and "b.py" not in r.stdout
    # two positional roots union their trees
    r2 = run(["alpha_marker", str(root / "src"), str(root / "other")])
    assert "a.py" in r2.stdout and "b.py" in r2.stdout
    # a FILE positional narrows to that file
    r3 = run(["alpha_marker", str(root / "other" / "b.py")])
    assert "b.py" in r3.stdout and "a.py" not in r3.stdout
    # nonexistent path: loud usage error
    r4 = run(["alpha_marker", str(root / "nope")])
    assert r4.returncode == 2 and "no such file" in r4.stderr


def test_positional_paths_filter_parquet_corpus(cli_env):
    """With a --corpus source, positional paths are prefix filters."""
    corpus, _ = cli_env
    everywhere = run(["uq0000042marker", "--corpus", corpus])
    hit_path = everywhere.stdout.strip().split(":", 1)[0]
    prefix = hit_path.rsplit("/", 1)[0]
    kept = run(["uq0000042marker", "--corpus", corpus, prefix])
    assert kept.stdout == everywhere.stdout
    dropped = run(["uq0000042marker", "--corpus", corpus,
                   "definitely/absent/prefix"])
    assert dropped.stdout.strip() == ""


def test_limit_is_topk_alias(cli_env):
    _, idx = cli_env
    a = run(["--lex", "def", "--index-dir", idx, "--topk", "3"])
    b = run(["--lex", "def", "--index-dir", idx, "--limit", "3"])
    assert a.returncode == 0 and b.stdout == a.stdout


def test_model_mismatch_enforcement(cli_env, tmp_path_factory):
    """Reference 0.7.0 model-compatibility guard: --sem --model X against
    an index persisted with model Y refuses with recovery guidance;
    matching or omitted --model proceeds."""
    corpus, _ = cli_env
    idx = str(tmp_path_factory.mktemp("mm") / "idx")
    r = run(["--index", "--corpus", corpus, "--index-dir", idx,
             "--num-parts", "4", "-q"])
    assert r.returncode == 0, r.stderr
    assert run(["--switch-model", "bge-small", "--index-dir", idx,
                "-q"]).returncode == 0
    bad = run(["--sem", "merge", "--corpus", corpus, "--index-dir", idx,
               "--model", "nomic-v1.5"])
    assert bad.returncode == 2 and "model mismatch" in bad.stderr
    ok = run(["--sem", "merge", "--corpus", corpus, "--index-dir", idx,
              "--model", "bge-small", "--topk", "3"])
    assert ok.returncode == 0, ok.stderr


def test_ckignore_auto_created_on_first_dir_index(ray_session, tmp_path):
    """Reference 0.5.3: first --index of a tree writes .ckignore with the
    defaults; the walk then honors it (config noise like *.json skipped);
    --no-ckignore suppresses creation."""
    root = tmp_path / "tree"
    root.mkdir()
    (root / "a.py").write_text("def gamma_probe(): pass\n")
    (root / "noise.json").write_text('{"gamma_probe": 1}\n')
    idx = str(tmp_path / "idx")
    r = run(["--index", "--corpus-dir", str(root), "--index-dir", idx,
             "--num-parts", "2"])
    assert r.returncode == 0, r.stderr
    ck = root / ".ckignore"
    assert ck.exists() and "*.json" in ck.read_text()
    hits = run(["--lex", "gamma_probe", "--index-dir", idx])
    assert "a.py" in hits.stdout and "noise.json" not in hits.stdout
    # second index run leaves the (user-editable) file alone
    before = ck.read_text()
    ck.write_text(before + "# user edit\n")
    idx2 = str(tmp_path / "idx2")
    assert run(["--index", "--corpus-dir", str(root), "--index-dir", idx2,
                "--num-parts", "2"]).returncode == 0
    assert ck.read_text().endswith("# user edit\n")
    # --no-ckignore: no auto-creation
    root2 = tmp_path / "tree2"
    root2.mkdir()
    (root2 / "b.py").write_text("x = 1\n")
    idx3 = str(tmp_path / "idx3")
    assert run(["--index", "--corpus-dir", str(root2), "--index-dir", idx3,
                "--num-parts", "2", "--no-ckignore"]).returncode == 0
    assert not (root2 / ".ckignore").exists()


def test_sem_full_section(cli_env):
    """Reference `--sem --full-section`: semantic hits carry the whole
    containing section (the chunk text), not a one-line preview."""
    corpus, _ = cli_env
    r = run(["--sem", "merge posting", "--corpus", corpus,
             "--full-section", "--topk", "3", "--json"])
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout)[0]
    assert "section" in rec and len(rec["section"].splitlines()) > 1
    # span bounds cover the section
    assert rec["line_start"] >= 1


def test_lexical_advanced_query_syntax(cli_env):
    """Slop / prefix / phrase-prefix syntax survives the CLI argv path
    (quoting, star, tilde all reach the parser intact)."""
    _, idx = cli_env
    # dictionary prefix: every uqNNNNNNNmarker term matches uq0000042*
    r = run(["--lex", "uq0000042*", "--index-dir", idx, "--topk", "5"])
    assert r.returncode == 0
    assert len(r.stdout.strip().splitlines()) == 1
    # sloppy phrase: exact-adjacency DOCS still match at any slop
    # (compare paths, not output lines — normalized scores shift when
    # slop widens the match set; topk=300 covers the whole corpus)
    def paths(r):
        return {ln.split(":")[0] for ln in r.stdout.strip().splitlines()}

    r0 = run(["--lex", '"merge window"', "--index-dir", idx,
              "--topk", "300"])
    r2 = run(["--lex", '"merge window"~2', "--index-dir", idx,
              "--topk", "300"])
    assert r0.returncode in (0, 1) and r2.returncode in (0, 1)
    assert paths(r0) <= paths(r2)  # slop only widens
    # phrase-prefix
    r3 = run(["--lex", '"merge wi"*', "--index-dir", idx,
              "--topk", "300"])
    assert r3.returncode in (0, 1)
    assert paths(r0) <= paths(r3)


def test_percolate_mode(ray_session, tmp_path):
    """--percolate matches a directory corpus against a registry file."""
    import json as _json

    root = tmp_path / "tree"
    root.mkdir()
    (root / "a.py").write_text("def merge_window():\n    return 1\n")
    (root / "b.py").write_text("def other_thing():\n    return 2\n")
    reg = tmp_path / "queries.json"
    reg.write_text(_json.dumps({
        "mw": "merge AND window",
        "none": "zzznotpresent",
        "pre": "oth*",
    }))
    r = run(["--percolate", str(reg), "--corpus-dir", str(root), "--jsonl"])
    assert r.returncode == 0, r.stderr
    rows = [_json.loads(ln) for ln in r.stdout.strip().splitlines()]
    got = {(x["query_name"], x["path"]) for x in rows}
    assert got == {("mw", "a.py"), ("pre", "b.py")}

    r2 = run(["--percolate", str(reg)])
    assert r2.returncode == 2  # needs a corpus source
