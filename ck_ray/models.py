"""Model registry + token estimator (reference ``ck-models/src/lib.rs``,
``ck-embed/src/tokenizer.rs``).

The registry maps short aliases to embedding-model configs and resolves
either an alias or a full model name (``ck-models/src/lib.rs:21-133``);
it round-trips through JSON like the reference's project config file.
``create_embedder`` is the provider swap point: every provider maps to
the deterministic ``PseudoEmbedder`` in this container (no ONNX models
available) but carries the real config's dimensions, so swapping in a
model-loading class changes nothing else.

``TokenEstimator`` reproduces the reference's estimation rules
(``ck-embed/src/tokenizer.rs:13-98``): chars-per-token ratio 4.2 / 4.4 /
4.8 chosen by code-indicator density per line, per-model token limits,
and ``exceeds_limit``.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import asdict, dataclass, field


@dataclass
class ModelConfig:
    name: str
    provider: str
    dimensions: int
    max_tokens: int
    description: str = ""


def _default_models() -> dict[str, ModelConfig]:
    return {
        "bge-small": ModelConfig(
            "BAAI/bge-small-en-v1.5", "fastembed", 384, 512,
            "Small, fast English embedding model",
        ),
        "minilm": ModelConfig(
            "sentence-transformers/all-MiniLM-L6-v2", "fastembed", 384, 256,
            "Lightweight English embedding model",
        ),
        "nomic-v1.5": ModelConfig(
            "nomic-embed-text-v1.5", "fastembed", 768, 8192,
            "High-quality English embedding model with large context window",
        ),
        "jina-code": ModelConfig(
            "jina-embeddings-v2-base-code", "fastembed", 768, 8192,
            "Code-specific embedding model",
        ),
        "mxbai-xsmall": ModelConfig(
            "mixedbread-ai/mxbai-embed-xsmall-v1", "mixedbread", 384, 4096,
            "Mixedbread xsmall embedding model",
        ),
    }


def _resolve_alias_or_name(models: dict, default: str, requested, kind: str):
    """Alias OR full model name -> (alias, config); unknown raises with
    the available alias list (reference ``resolve_alias_or_name``) —
    the one resolution contract shared by both registries."""
    key = requested or default
    if key in models:
        return key, models[key]
    for alias, cfg in models.items():
        if cfg.name == key:
            return alias, cfg
    raise KeyError(
        f"Unknown {kind} {key!r}. Available models: "
        + ", ".join(sorted(models))
    )


@dataclass
class ModelRegistry:
    models: dict[str, ModelConfig] = field(default_factory=_default_models)
    default_model: str = "bge-small"

    def resolve(self, requested: str | None = None) -> tuple[str, ModelConfig]:
        return _resolve_alias_or_name(
            self.models, self.default_model, requested, "model"
        )

    def aliases(self) -> list[str]:
        return sorted(self.models)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(
                {
                    "default_model": self.default_model,
                    "models": {a: asdict(c) for a, c in self.models.items()},
                },
                fh, indent=1,
            )

    @classmethod
    def load(cls, path: str) -> "ModelRegistry":
        if not os.path.exists(path):
            return cls()
        raw = json.load(open(path))
        return cls(
            models={
                a: ModelConfig(**c) for a, c in raw.get("models", {}).items()
            },
            default_model=raw.get("default_model", "bge-small"),
        )


@dataclass
class RerankModelConfig:
    name: str
    provider: str
    description: str = ""


def _default_rerank_models() -> dict[str, RerankModelConfig]:
    # reference rerank registry (ck-models/src/lib.rs:166-211)
    return {
        "jina": RerankModelConfig(
            "jina-reranker-v1-turbo-en", "fastembed",
            "Jina Turbo reranker (default) tuned for English code + text "
            "relevance",
        ),
        "bge": RerankModelConfig(
            "BAAI/bge-reranker-base", "fastembed",
            "BGE reranker base model for multilingual use cases",
        ),
        "mxbai": RerankModelConfig(
            "mixedbread-ai/mxbai-rerank-xsmall-v1", "mixedbread",
            "Mixedbread xsmall reranker (quantized) optimized for local "
            "inference",
        ),
    }


@dataclass
class RerankModelRegistry:
    """Rerank-model aliases (reference ``ck-models/src/lib.rs:166-258``);
    same alias-or-full-name resolution contract as ``ModelRegistry``."""

    models: dict[str, RerankModelConfig] = field(
        default_factory=_default_rerank_models
    )
    default_model: str = "jina"

    def resolve(
        self, requested: str | None = None
    ) -> tuple[str, RerankModelConfig]:
        return _resolve_alias_or_name(
            self.models, self.default_model, requested, "rerank model"
        )

    def aliases(self) -> list[str]:
        return sorted(self.models)


# provider name -> factory(cfg) -> reranker. Contract (what
# PseudoReranker implements): rerank(query: str, texts: list[str]) ->
# array of float scores, one per text, higher = more relevant.
_RERANKER_PROVIDERS: dict[str, object] = {}


def register_reranker_provider(provider: str, factory) -> None:
    """Plug a REAL cross-encoder backend in (reference
    ``ck-embed/src/reranker.rs:26-39``): any RerankModelConfig whose
    ``provider`` matches is constructed by ``factory(cfg)`` instead of
    the deterministic PseudoReranker. Same one-line-swap contract as
    ``register_embedder_provider``."""
    _RERANKER_PROVIDERS[provider] = factory


def create_reranker(
    model: str | None = None, registry: RerankModelRegistry | None = None
):
    """Provider swap point for the rerank stage: alias/name -> reranker.

    A provider registered via ``register_reranker_provider`` wins;
    otherwise every provider maps to the deterministic
    ``PseudoReranker`` (no ONNX cross-encoders in this container —
    reference providers live in ``ck-embed/src/reranker.rs:26-39``);
    the instance carries the resolved config so a model-loading class
    drops in unchanged."""
    alias, cfg = (registry or RerankModelRegistry()).resolve(model)
    factory = _RERANKER_PROVIDERS.get(cfg.provider)
    if factory is not None:
        return factory(cfg)
    from .semantic import PseudoReranker

    rr = PseudoReranker()
    rr.model_alias, rr.model_config = alias, cfg
    return rr


# provider name -> factory(cfg: ModelConfig) -> embedder. The contract
# an embedder must satisfy (what PseudoEmbedder implements):
#   embed_texts(list[str]) -> np.ndarray[(n, cfg.dimensions), float32]
#   __call__(pa.Table with a text column) -> same table + "embedding"
#     fixed-size-list<float32, dimensions> column
_EMBEDDER_PROVIDERS: dict[str, object] = {}


def register_embedder_provider(provider: str, factory) -> None:
    """Plug a REAL model backend in (the reference's fastembed/ONNX
    providers, ``ck-embed/src/lib.rs:151-289``): any ModelConfig whose
    ``provider`` matches is constructed by ``factory(cfg)`` instead of
    the deterministic PseudoEmbedder. One call on the driver is enough —
    the embed stage resolves the factory driver-side and cloudpickles it
    into each pool actor, whose ``__init__`` runs it once (model load
    happens once per actor, never per batch). Nothing else in the
    pipeline changes (proved by tests/test_models.py seam test)."""
    _EMBEDDER_PROVIDERS[provider] = factory


def create_embedder(model: str | None = None, registry: ModelRegistry | None = None):
    """Provider swap point: alias/name -> embedder instance.

    A provider registered via ``register_embedder_provider`` wins;
    otherwise every provider resolves to the deterministic
    PseudoEmbedder (this container has no ONNX runtime/models —
    reference providers live in ``ck-embed/src/lib.rs:151-289``),
    carrying the config's real dimensions."""
    _, cfg = (registry or ModelRegistry()).resolve(model)
    factory = _EMBEDDER_PROVIDERS.get(cfg.provider)
    if factory is not None:
        return factory(cfg)
    from .semantic import PseudoEmbedder

    return PseudoEmbedder(dim=cfg.dimensions)


class TokenEstimator:
    """Reference's heuristic token estimator (tokenizer.rs:13-98)."""

    MODEL_LIMITS = {
        "BAAI/bge-small-en-v1.5": 512,
        "sentence-transformers/all-MiniLM-L6-v2": 512,
        "nomic-embed-text-v1": 8192,
        "nomic-embed-text-v1.5": 8192,
        "jina-embeddings-v2-base-code": 8192,
        "BAAI/bge-base-en-v1.5": 512,
        "BAAI/bge-large-en-v1.5": 512,
    }

    @staticmethod
    def count_code_indicators(text: str) -> int:
        count = 0
        for line in text.splitlines():
            t = line.strip()
            if not t or t.startswith("//") or t.startswith("#"):
                continue
            if "{" in t or "}" in t:
                count += 1
            if ";" in t and not t.endswith("."):
                count += 1
            if "fn " in t or "def " in t or "function " in t or "func " in t:
                count += 1
            if "->" in t or "=>" in t or "::" in t:
                count += 1
            if t.startswith(("pub ", "private ", "public ")):
                count += 1
        return count

    @classmethod
    def estimate_tokens(cls, text: str) -> int:
        if not text:
            return 0
        n_chars = len(text)
        total_lines = max(len(text.splitlines()), 1)
        density = cls.count_code_indicators(text) / total_lines
        if density > 0.3:
            cpt = 4.2  # code: symbols + identifiers tokenize denser
        elif density > 0.1:
            cpt = 4.4  # mixed
        else:
            cpt = 4.8  # natural language
        return math.ceil(n_chars / cpt)

    @classmethod
    def exceeds_limit(cls, text: str, max_tokens: int) -> bool:
        return cls.estimate_tokens(text) > max_tokens

    @classmethod
    def get_model_limit(cls, model_name: str) -> int:
        return cls.MODEL_LIMITS.get(model_name, 8192)
