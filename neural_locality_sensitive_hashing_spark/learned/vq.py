"""Vector-quantized partitioner: spherical k-means codebook + IVF probes.

Re-imagines the reference's VQ-VAE trainer (``nlsh/trainers/vqvae.py``:
encoder output snapped to the nearest codebook vector via argmax lookup,
straight-through gradients, reconstruction pull) under the engine's
constraints: with the decoder dropped and the codebook trained directly on
the (normalized) data, the argmax-lookup semantics reduce to spherical
k-means — each vector's bucket is its nearest centroid, multi-probe is the
n nearest centroids. That is exactly an IVF (inverted-file) index: the
classic scale path for ANN when hyperplane codes are too coarse.

Driver-side numpy only; centroids ship to executors via closure capture
(same broadcast-on-pickle contract as the learned sigmoid partitioner).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def train_vq_codebook(
    x: np.ndarray,
    n_centroids: int = 64,
    iters: int = 20,
    seed: int = 42,
) -> np.ndarray:
    """(n, d) sample -> (n_centroids, d) unit-norm codebook.

    Spherical k-means: assign by max dot product on normalized vectors,
    update = renormalized mean. Empty clusters are reseeded from the
    point farthest from its centroid (deterministic). Initialization is a
    seeded row sample — fully deterministic for a fixed (x, seed)."""
    rng = np.random.default_rng(seed)
    xn = _normalize(np.asarray(x, dtype=np.float64))
    n = len(xn)
    k = min(n_centroids, n)
    init = rng.choice(n, size=k, replace=False)
    c = xn[np.sort(init)].copy()
    for _ in range(iters):
        sims = xn @ c.T  # (n, k)
        assign = sims.argmax(axis=1)
        best = sims[np.arange(n), assign]
        newc = np.zeros_like(c)
        counts = np.bincount(assign, minlength=k)
        np.add.at(newc, assign, xn)
        for j in range(k):
            if counts[j] == 0:
                newc[j] = xn[best.argmin()]  # reseed from worst-fit point
            else:
                newc[j] /= counts[j]
        c = _normalize(newc)
    return c


def vq_codes_numpy(x: np.ndarray, codebook: np.ndarray, n_probes: int = 1) -> np.ndarray:
    """(n, d) vectors -> (n, n_probes) nearest-centroid ids, ordered by
    descending dot product on the normalized vector (ties -> lower id,
    matching the SQL oracle's ORDER BY dot DESC, cid ASC)."""
    xn = _normalize(np.asarray(x, dtype=np.float64))
    sims = xn @ codebook.T  # (n, k)
    # stable sort keeps ascending centroid id on ties -> "dot DESC, cid ASC"
    order = np.argsort(-sims, axis=1, kind="stable")
    return order[:, :n_probes].astype(np.int64)


def make_vq_code_udf(codebook: np.ndarray, n_probes: int = 1):
    """pandas_udf: array<float> embedding -> array<bigint> probe centroid
    ids (first = assigned bucket)."""
    cb = np.asarray(codebook, dtype=np.float64)

    @pandas_udf(ArrayType(LongType()))
    def codes(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=object)
        ok = [i for i, v in enumerate(vecs) if v is not None]
        if ok:
            m = np.stack([np.asarray(vecs.iloc[i], dtype=np.float64) for i in ok])
            probe = vq_codes_numpy(m, cb, n_probes)
            for j, i in enumerate(ok):
                out[i] = probe[j]
        return pd.Series(out)

    return codes
