"""Hashed-token feature embeddings (the cheap document embedding feeding
the learned partitioner — SURVEY.md §7 stage 2).

Feature hashing: each token maps to (bucket, sign) via a keyed blake2b
64-bit digest; a document's embedding is the L2-normalized signed bucket
count vector. Deterministic across executors (no PYTHONHASHSEED
dependence), vectorized per Arrow batch with a per-batch unique-token cache
(Zipfian text makes the cache hit rate high).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType


def _token_hash64(token: str, seed: int) -> int:
    h = hashlib.blake2b(
        token.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    )
    return int.from_bytes(h.digest(), "little")


def embed_tokens_numpy(tokens: list[str], dim: int, seed: int) -> np.ndarray:
    """Reference single-doc implementation (tests + driver-side use)."""
    v = np.zeros(dim, dtype=np.float64)
    for t in tokens:
        h = _token_hash64(t, seed)
        v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def make_hashed_embedding_udf(dim: int = 64, seed: int = 42):
    """pandas_udf: text string -> array<float> L2-normalized embedding."""

    @pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        cache: dict[str, tuple[int, float]] = {}

        def tok_feat(t: str) -> tuple[int, float]:
            f = cache.get(t)
            if f is None:
                h = _token_hash64(t, seed)
                f = (h % dim, 1.0 if (h >> 32) & 1 else -1.0)
                cache[t] = f
            return f

        out = np.empty(len(texts), dtype=object)
        for i, txt in enumerate(texts):
            if txt is None:
                continue
            v = np.zeros(dim, dtype=np.float64)
            for t in txt.split():
                b, s = tok_feat(t)
                v[b] += s
            n = np.linalg.norm(v)
            out[i] = (v / n if n > 0 else v).astype(np.float32)
        return pd.Series(out)

    return embed
