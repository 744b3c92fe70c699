"""`python -m ck_ray.job` — the ray-job-submit entrypoints (build / query /
pipeline), run in-process against the session Ray so each subcommand's
single-JSON-line contract and metrics are exercised end to end."""

import json

import pytest

from ck_ray import job
from ck_ray.corpus import corpus_parquet

SF = "/root/testdata/sf0.001"


def _last_json(capsys) -> dict:
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    corpus = corpus_parquet(300, seed=7)
    idx = str(tmp_path_factory.mktemp("jobidx") / "idx")
    rc = job.main([
        "build", "--corpus", corpus, "--index-dir", idx, "--num-parts", "4",
    ])
    assert rc == 0
    return idx


def test_build_emits_metrics(ray_session, tmp_path, capsys):
    corpus = corpus_parquet(100, seed=9)
    idx = str(tmp_path / "idx")
    rc = job.main([
        "build", "--corpus", corpus, "--index-dir", idx, "--num-parts", "2",
    ])
    assert rc == 0
    b = _last_json(capsys)
    assert b["job"] == "build"
    assert b["num_docs"] >= 100 and b["files_per_sec"] > 0
    assert b["n_postings"] > 0 and b["wall_s"] > 0


def test_query_subcommand(built_index, capsys):
    rc = job.main([
        "query", "--index-dir", built_index, "--top-k", "5", "--repeat", "2",
        "def", "merge",
    ])
    assert rc == 0
    q = _last_json(capsys)
    assert q["job"] == "query" and q["n_queries"] == 2
    assert q["p50_ms"] > 0 and q["p99_ms"] >= q["p50_ms"]
    hits = q["results"]["def"]
    assert 0 < len(hits) <= 5
    assert {"doc_id", "score", "path"} <= set(hits[0])


def test_query_subcommand_facets(built_index, capsys):
    """--facets FIELD reports full-match-set counts per query (fuzzy
    query included — expansion shapes work through the job surface)."""
    rc = job.main([
        "query", "--index-dir", built_index, "--top-k", "3",
        "--facets", "lang", "merge", "mrege~2",
    ])
    assert rc == 0
    q = _last_json(capsys)
    f = q["facets"]["merge"]
    assert f["total"] == sum(f["lang"].values()) > 0
    # fuzzy expansion reaches at least the exact term's match set
    assert q["facets"]["mrege~2"]["total"] >= f["total"]


def test_query_subcommand_agg_and_sort(built_index, capsys):
    """--agg runs a full-match-set aggregation; --sort-by orders top-k
    by a numeric fast field (desc default, :asc flips)."""
    rc = job.main([
        "query", "--index-dir", built_index, "--top-k", "5",
        "--agg", "stats:dl_content", "--sort-by", "n_bytes", "merge",
    ])
    assert rc == 0
    q = _last_json(capsys)
    st = q["aggregations"]["merge"]
    assert st["count"] > 0 and st["sum"] >= st["count"] * st["min"]
    hits = q["sorted_by_field"]["merge"]
    vals = [h["n_bytes"] for h in hits]
    assert vals == sorted(vals, reverse=True) and len(vals) <= 5
    rc = job.main([
        "query", "--index-dir", built_index, "--top-k", "5",
        "--agg", "histogram:n_bytes:256", "--sort-by", "n_bytes:asc",
        "merge",
    ])
    assert rc == 0
    q = _last_json(capsys)
    h = q["aggregations"]["merge"]["buckets"]
    assert sum(h.values()) == st["count"]  # same match set, same total
    vals = [x["n_bytes"] for x in q["sorted_by_field"]["merge"]]
    assert vals == sorted(vals)


def test_query_subcommand_extended_stats_and_percentiles(
    built_index, capsys
):
    """--agg extended_stats adds exact moments + variance/std; --agg
    percentiles reports exact discrete quantiles (optional Q list)."""
    import math

    rc = job.main([
        "query", "--index-dir", built_index,
        "--agg", "extended_stats:dl_content", "merge",
    ])
    assert rc == 0
    xs = _last_json(capsys)["aggregations"]["merge"]
    assert xs["count"] > 0 and xs["sum_sq"] >= xs["sum"]
    assert math.isclose(
        xs["std_deviation"], math.sqrt(xs["variance"]), rel_tol=0
    )
    rc = job.main([
        "query", "--index-dir", built_index,
        "--agg", "percentiles:dl_content:0.5,0.9", "merge",
    ])
    assert rc == 0
    ps = _last_json(capsys)["aggregations"]["merge"]["percentiles"]
    assert set(ps) == {"0.5", "0.9"} and ps["0.5"] <= ps["0.9"]


def test_pipeline_subcommand_writes_parquet(ray_session, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = job.main([
        "pipeline", "--name", "corpus_stats", "--sf-dir", SF,
        "--output", out_dir,
    ])
    assert rc == 0
    p = _last_json(capsys)
    assert p["rows"] > 0
    import pyarrow.dataset as pads

    assert pads.dataset(out_dir).count_rows() == p["rows"]


def test_pipeline_unknown_name(ray_session, capsys):
    rc = job.main(["pipeline", "--name", "nope", "--sf-dir", SF])
    assert rc == 2


def test_compact_subcommand(built_index, capsys):
    # compaction is query-identical, so mutating the shared index is safe
    rc = job.main(["compact", "--index-dir", built_index])
    assert rc == 0
    c = _last_json(capsys)
    assert c["job"] == "compact" and c["compacted_from"] == ["epoch-0001"]
    rc = job.main(["query", "--index-dir", built_index, "--top-k", "3", "def"])
    assert rc == 0
    assert len(_last_json(capsys)["results"]["def"]) > 0


def test_delete_by_query_subcommand(ray_session, tmp_path, capsys):
    """delete-by-query mutates the index, so it gets a private one: the
    deleted match set must vanish from later queries and the emitted
    metrics must carry the tombstone count."""
    corpus = corpus_parquet(150, seed=13)
    idx = str(tmp_path / "idx")
    assert job.main([
        "build", "--corpus", corpus, "--index-dir", idx,
        "--num-parts", "2",
    ]) == 0
    rc = job.main(["query", "--index-dir", idx, "--top-k", "5", "merge"])
    assert rc == 0
    before = len(_last_json(capsys)["results"]["merge"])
    assert before > 0

    rc = job.main(["delete-by-query", "--index-dir", idx, "merge"])
    assert rc == 0
    d = _last_json(capsys)
    assert d["job"] == "delete-by-query" and d["n_deleted"] > 0
    assert d["epoch"] == "epoch-0002"

    rc = job.main(["query", "--index-dir", idx, "--top-k", "5", "merge"])
    assert rc == 0
    assert len(_last_json(capsys)["results"]["merge"]) == 0


def test_merge_subcommand(ray_session, tmp_path, capsys):
    """`job merge A B --out-dir M`: fresh output index answering
    queries from both sources; sources untouched."""
    ca = corpus_parquet(80, seed=21, out_dir=str(tmp_path / "ca"))
    cb = corpus_parquet(60, seed=22, out_dir=str(tmp_path / "cb"))
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    for c, i in ((ca, ia), (cb, ib)):
        assert job.main([
            "build", "--corpus", c, "--index-dir", i, "--num-parts", "2",
        ]) == 0
    out = str(tmp_path / "merged")
    rc = job.main(["merge", ia, ib, "--out-dir", out])
    assert rc == 0
    m = _last_json(capsys)
    assert m["job"] == "merge" and m["n_sources"] == 2
    assert m["num_docs"] > 0
    rc = job.main(["query", "--index-dir", out, "--top-k", "3", "def"])
    assert rc == 0
    assert len(_last_json(capsys)["results"]["def"]) > 0


def test_curate_subcommand(ray_session, tmp_path, capsys):
    out_dir = str(tmp_path / "cleaned")
    rc = job.main([
        "curate", "--sf-dir", SF, "--output", out_dir, "--quota", "5",
    ])
    assert rc == 0
    c = _last_json(capsys)
    assert c["job"] == "curate" and c["n_kept"] > 0
    import pyarrow.dataset as pads

    back = pads.dataset(out_dir, partitioning="hive").to_table()
    assert back.num_rows == c["n_kept"]
    assert c["n_partitions"] >= 1


def test_job_percolate(ray_session, tmp_path, capsys):
    """percolate subcommand: registry file -> streamed parquet pairs."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ck_ray import job

    t = pa.table(
        {
            "path": pa.array(["a.py", "b.py", "c.py"]),
            "content": pa.array(
                ["merge window here", "nothing relevant", "window merge"]
            ),
        }
    )
    corpus = tmp_path / "corpus.parquet"
    pq.write_table(t, str(corpus))
    reg = tmp_path / "reg.json"
    reg.write_text(_json.dumps({"mw": '"merge window"', "w": "window"}))
    out_dir = str(tmp_path / "out")
    rc = job.main([
        "percolate", "--corpus", str(corpus), "--queries", str(reg),
        "--output", out_dir,
    ])
    assert rc == 0
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["job"] == "percolate" and line["n_queries"] == 2
    import pyarrow.dataset as pads

    got = pads.dataset(out_dir).to_table().to_pandas()
    pairs = set(zip(got["query_name"], got["path"]))
    assert pairs == {("mw", "a.py"), ("w", "a.py"), ("w", "c.py")}
