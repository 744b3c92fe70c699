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


def test_embedder_provider_seam(ray_session):
    """register_embedder_provider swaps a user-supplied model backend
    (simulating the reference's ONNX/fastembed provider) into the SAME
    Ray pipeline: one registry call, nothing else changes — chunking,
    actor-pool shape, schema and search all run unmodified against the
    custom vectors. Documents the one-line swap claim
    (ck-embed/src/lib.rs:151-289)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ck_ray.models import (
        _EMBEDDER_PROVIDERS,
        create_embedder,
        register_embedder_provider,
    )
    from ck_ray.semantic import (
        PseudoEmbedder,
        build_chunk_embeddings,
        semantic_search,
    )

    class FakeOnnxEmbedder:
        """Stands in for a model-loading backend: 'loads' in __init__,
        embeds deterministically (first-char code one-hot, unit norm)."""

        def __init__(self, cfg):
            self.dim = cfg.dimensions  # "model load" happens here
            self.calls = 0

        def embed_texts(self, texts):
            out = np.zeros((len(texts), self.dim), dtype=np.float32)
            for i, s in enumerate(texts):
                out[i, (ord(s[0]) if s else 0) % self.dim] = 1.0
            return out

        def __call__(self, t):
            emb = self.embed_texts(t["text"].to_pylist())
            return t.append_column(
                "embedding",
                pa.array(list(emb), pa.list_(pa.float32(), self.dim)),
            )

    n = 6
    ds = ray.data.from_arrow(
        pa.table(
            {
                "repo": ["r"] * n,
                "path": [f"p{i}" for i in range(n)],
                "commit": ["0"] * n,
                "lang": ["text"] * n,
                "content": ["alpha one", "beta two", "gamma three",
                            "delta four", "alpha five", "zeta six"],
            }
        )
    )

    base = build_chunk_embeddings(ds, concurrency=2).to_pandas()
    register_embedder_provider("fastembed", FakeOnnxEmbedder)
    try:
        # resolves "minilm" -> provider "fastembed" -> the fake model
        assert isinstance(create_embedder("minilm"), FakeOnnxEmbedder)
        cust = build_chunk_embeddings(
            ds, concurrency=2, model="minilm"
        ).to_pandas()
        # chunk layout identical — ONLY the vectors changed
        for col in ("doc_id", "path", "chunk_id", "line_start",
                    "line_end", "text"):
            assert list(cust[col]) == list(base[col])
        assert len(base["embedding"].iloc[0]) == 64       # pseudo dim
        assert len(cust["embedding"].iloc[0]) == 384      # config dim
        for _, r in cust.iterrows():
            v = np.asarray(r["embedding"])
            assert v[ord(r["text"][0]) % 384] == 1.0 and v.sum() == 1.0
        # end-to-end search against the custom vectors: query "alpha..."
        # matches exactly the chunks starting with 'a'
        emb_ds = build_chunk_embeddings(ds, concurrency=2, model="minilm")
        hits = semantic_search(emb_ds, "alpha query", top_k=6,
                               model="minilm")
        top = hits[hits["score"] > 0.99]
        assert sorted(top["path"]) == ["p0", "p4"]
    finally:
        del _EMBEDDER_PROVIDERS["fastembed"]
    assert isinstance(create_embedder("minilm"), PseudoEmbedder)


def test_reranker_provider_seam(ray_session):
    """register_reranker_provider swaps a user cross-encoder into the
    rerank stage; unregistering restores the pseudo path."""
    from ck_ray.models import (
        _RERANKER_PROVIDERS,
        create_reranker,
        register_reranker_provider,
    )
    from ck_ray.semantic import PseudoReranker

    class FakeCrossEncoder:
        def __init__(self, cfg):
            self.cfg = cfg

        def rerank(self, query, texts):
            return [float(len(t)) for t in texts]  # deterministic fake

    register_reranker_provider("fastembed", FakeCrossEncoder)
    try:
        rr = create_reranker("jina")  # jina alias -> provider fastembed
        assert isinstance(rr, FakeCrossEncoder)
        assert rr.rerank("q", ["aa", "a"]) == [2.0, 1.0]
    finally:
        del _RERANKER_PROVIDERS["fastembed"]
    assert isinstance(create_reranker("jina"), PseudoReranker)


def test_real_onnx_embedder_smoke(ray_session):
    """Proof of the provider seam against a REAL model: when
    ``CK_ONNX_MODEL_DIR`` points at a fastembed-style export
    (``model.onnx`` + ``tokenizer.json``) and onnxruntime/tokenizers
    are installed, a genuine ONNX embedder registers through the same
    one-line seam the fake uses and the unmodified chunk->embed->search
    pipeline runs real inference end-to-end. Auto-skips in this
    container (no models, no onnxruntime); run on any machine with a
    sentence-embedding export to validate the swap claim for real."""
    import os

    import pytest as _pytest

    model_dir = os.environ.get("CK_ONNX_MODEL_DIR")
    if not model_dir:
        _pytest.skip("CK_ONNX_MODEL_DIR not set (no local ONNX models)")
    ort = _pytest.importorskip("onnxruntime")
    toklib = _pytest.importorskip("tokenizers")
    onnx_path = os.path.join(model_dir, "model.onnx")
    tok_path = os.path.join(model_dir, "tokenizer.json")
    if not (os.path.exists(onnx_path) and os.path.exists(tok_path)):
        _pytest.skip("CK_ONNX_MODEL_DIR lacks model.onnx/tokenizer.json")

    import numpy as np
    import pyarrow as pa
    import ray.data

    from ck_ray.models import (
        _EMBEDDER_PROVIDERS,
        register_embedder_provider,
    )
    from ck_ray.semantic import build_chunk_embeddings, semantic_search

    class OnnxEmbedder:
        """Real fastembed-shaped backend: session + tokenizer load once
        per actor (__init__); mean-pooled, L2-normalized embeddings."""

        def __init__(self, cfg):
            self.session = ort.InferenceSession(
                onnx_path, providers=["CPUExecutionProvider"]
            )
            self.tokenizer = toklib.Tokenizer.from_file(tok_path)
            self.tokenizer.enable_truncation(max_length=512)
            self.tokenizer.enable_padding()

        def embed_texts(self, texts):
            encs = self.tokenizer.encode_batch(
                [s if s else " " for s in texts]
            )
            ids = np.array([e.ids for e in encs], dtype=np.int64)
            mask = np.array(
                [e.attention_mask for e in encs], dtype=np.int64
            )
            feeds = {"input_ids": ids, "attention_mask": mask}
            if "token_type_ids" in {
                i.name for i in self.session.get_inputs()
            }:
                feeds["token_type_ids"] = np.zeros_like(ids)
            hidden = self.session.run(None, feeds)[0]
            m = mask[:, :, None].astype(np.float32)
            emb = (hidden * m).sum(1) / np.clip(m.sum(1), 1e-9, None)
            emb /= np.clip(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None
            )
            return emb.astype(np.float32)

        def __call__(self, t):
            emb = self.embed_texts(t["text"].to_pylist())
            return t.append_column(
                "embedding",
                pa.array(list(emb), pa.list_(pa.float32(), emb.shape[1])),
            )

    n = 4
    ds = ray.data.from_arrow(
        pa.table(
            {
                "repo": ["r"] * n,
                "path": [f"p{i}" for i in range(n)],
                "commit": ["0"] * n,
                "lang": ["text"] * n,
                "content": [
                    "quicksort and mergesort are sorting algorithms",
                    "the cat sat on the warm windowsill all afternoon",
                    "gradient descent optimizes neural network weights",
                    "recipes for sourdough bread need a starter",
                ],
            }
        )
    )
    register_embedder_provider("fastembed", OnnxEmbedder)
    try:
        emb_ds = build_chunk_embeddings(ds, concurrency=2, model="minilm")
        hits = semantic_search(
            emb_ds, "how do sorting algorithms work", top_k=4,
            model="minilm",
        )
        # a real sentence embedder must rank the sorting doc first
        assert hits.iloc[0]["path"] == "p0"
        assert hits.iloc[0]["score"] > hits.iloc[-1]["score"]
    finally:
        del _EMBEDDER_PROVIDERS["fastembed"]
