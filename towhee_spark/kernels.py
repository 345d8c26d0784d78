"""Vectorized Arrow feature kernels (the engine's hot path).

Replaces Towhee's model-bearing operators (e.g. sentence_embedding.*,
towhee/runtime/hub_ops/sentence_embedding.py:26) with batched
``pandas_udf`` kernels: the Python boundary is crossed once per Arrow
batch, never per row, and heavy state (a model) is cached once per
executor Python worker — mirroring Towhee's OperatorPool reuse
(towhee/runtime/operator_manager/operator_pool.py:56-126) with a
module-level cache.

The test/bench kernel is a deterministic hashed bag-of-tokens embedding:
pure numpy, reproducible bit-for-bit by the single-node oracle
(np.allclose parity per BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Per-worker operator cache (≈ Towhee OperatorPool Shareable semantics)
_WORKER_CACHE: dict[str, object] = {}


def worker_singleton(key: str, factory):
    """One instance per executor Python worker, created lazily — the Spark
    analogue of SharedType.Shareable (towhee/operator/base.py:20-29)."""
    if key not in _WORKER_CACHE:
        _WORKER_CACHE[key] = factory()
    return _WORKER_CACHE[key]


# ---------------------------------------------------------------------------
# Deterministic hashed bag-of-tokens embedding

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a(token: str) -> int:
    """FNV-1a 64-bit — tiny, public-domain hash; identical in oracle/engine."""
    h = _FNV_OFFSET
    for b in token.encode("utf-8"):
        h = np.uint64(h ^ np.uint64(b)) * _FNV_PRIME
    return int(h)


def embed_tokens_np(texts: "pd.Series | list[str]", dim: int = 64) -> np.ndarray:
    """Hashed bag-of-tokens embedding, L2-normalized. (n, dim) float32.

    token → bucket h % dim with sign from bit 63 (feature-hashing trick);
    deterministic accumulation in sorted-row order. Single-node oracle AND
    the kernel body — the same function runs on both sides of parity.
    """
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, text in enumerate(texts):
        if not text:
            continue
        for tok in str(text).split():
            h = _fnv1a(tok)
            sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
            out[i, h % dim] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out.astype(np.float32)


def embed_text_udf(dim: int = 64):
    """Batched Arrow UDF: text → array<float> embedding (zero per-row
    serialization; the np loop is per-token CPU work inside one batch)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        mat = embed_tokens_np(texts.fillna("").tolist(), dim)
        return pd.Series(list(mat))

    return embed


# ---------------------------------------------------------------------------
# numpy utility kernels (Towhee towhee.np_normalize, hub_ops/utils.py:23)

@F.pandas_udf(T.ArrayType(T.FloatType()))
def np_normalize(vecs: pd.Series) -> pd.Series:
    """L2-normalize an array<float> column (Arrow-batched)."""
    def norm1(v):
        a = np.asarray(v, dtype=np.float32)
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return vecs.map(norm1)


def cosine_expr(a, b):
    """Native (JVM, codegen) cosine similarity between two array<float/double>
    columns: zip_with dot product + aggregate norms — no Python at all."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def dot_expr(a, b):
    """Native dot product of two array columns (left-fold, deterministic
    accumulation order — float-stable across engines)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)
