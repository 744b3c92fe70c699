"""Model registry + token estimator (reference ck-models / tokenizer.rs)."""

import pytest

from ck_ray.models import ModelRegistry, TokenEstimator, create_embedder


def test_resolve_alias_and_full_name():
    reg = ModelRegistry()
    alias, cfg = reg.resolve("bge-small")
    assert cfg.name == "BAAI/bge-small-en-v1.5" and cfg.dimensions == 384
    alias2, cfg2 = reg.resolve("jina-embeddings-v2-base-code")
    assert alias2 == "jina-code" and cfg2.max_tokens == 8192
    assert reg.resolve(None)[0] == "bge-small"  # default
    with pytest.raises(KeyError, match="Available models"):
        reg.resolve("nope")


def test_registry_roundtrip(tmp_path):
    reg = ModelRegistry()
    reg.default_model = "jina-code"
    p = str(tmp_path / "models.json")
    reg.save(p)
    back = ModelRegistry.load(p)
    assert back.default_model == "jina-code"
    assert back.resolve("minilm")[1].max_tokens == 256
    assert ModelRegistry.load(str(tmp_path / "missing.json")).aliases() == reg.aliases()


def test_create_embedder_dimensions():
    e = create_embedder("nomic-v1.5")
    emb = e.embed_texts(["hello world"])
    assert emb.shape == (1, 768)
    assert create_embedder().embed_texts(["x"]).shape == (1, 384)


def test_token_estimate_ratios():
    import math

    # natural language: ~4.8 chars/token
    nl = ("the quick brown fox jumps over the lazy dog. " * 10).strip()
    assert TokenEstimator.estimate_tokens(nl) == math.ceil(len(nl) / 4.8)
    # code: braces/semicolons on most lines -> 4.2
    code = "fn main() {\n    let x = 1;\n    call(x);\n}\n"
    assert TokenEstimator.count_code_indicators(code) >= 2
    assert TokenEstimator.estimate_tokens(code) == math.ceil(len(code) / 4.2)
    assert TokenEstimator.estimate_tokens("") == 0


def test_token_limits():
    assert TokenEstimator.get_model_limit("BAAI/bge-small-en-v1.5") == 512
    assert TokenEstimator.get_model_limit("unknown-model") == 8192
    assert TokenEstimator.exceeds_limit("x" * 10_000, 512)
    assert not TokenEstimator.exceeds_limit("short", 512)


def test_cli_list_models_and_model_flag(tmp_path):
    import json as _json
    import os
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "ck_ray.cli", "--list-models"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0
    reg = _json.loads(r.stdout)
    emb = reg["embedding"]
    assert "bge-small" in emb and emb["bge-small"]["dimensions"] == 384
    assert reg["rerank"]["jina"]["name"] == "jina-reranker-v1-turbo-en"


def test_rerank_registry_resolution():
    import pytest

    from ck_ray.models import RerankModelRegistry, create_reranker

    reg = RerankModelRegistry()
    assert reg.resolve()[0] == "jina"  # default
    assert reg.resolve("BAAI/bge-reranker-base")[0] == "bge"  # full name
    assert reg.aliases() == ["bge", "jina", "mxbai"]
    with pytest.raises(KeyError):
        reg.resolve("nope")
    rr = create_reranker("mxbai")
    assert rr.model_config.provider == "mixedbread"
    # stand-in still scores deterministically
    s = rr.rerank("merge posting", ["merge posting runs", "unrelated"])
    assert len(s) == 2 and s[0] > s[1]
