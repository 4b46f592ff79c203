"""VQ/IVF partitioner: codebook determinism, probe ordering, recall."""

from __future__ import annotations

import numpy as np

from neural_locality_sensitive_hashing_spark.learned.vq import (
    train_vq_codebook,
    vq_codes_numpy,
)


def _clustered(seed=5, k=12, per=50, d=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d))
    return np.repeat(centers, per, axis=0) + 0.05 * rng.standard_normal((k * per, d))


def test_codebook_deterministic_and_unit_norm():
    x = _clustered()
    c1 = train_vq_codebook(x, n_centroids=16, seed=9)
    c2 = train_vq_codebook(x, n_centroids=16, seed=9)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def test_probe_order_is_descending_similarity():
    x = _clustered()
    cb = train_vq_codebook(x, n_centroids=16, seed=9)
    probes = vq_codes_numpy(x[:5], cb, n_probes=4)
    xn = x[:5] / np.linalg.norm(x[:5], axis=1, keepdims=True)
    sims = xn @ cb.T
    for i in range(5):
        got = [sims[i, c] for c in probes[i]]
        assert got == sorted(got, reverse=True)


def test_ivf_buckets_recall_planted_clusters():
    """Same-cluster points share the assigned centroid (bucket) — the IVF
    index groups true neighbors."""
    x = _clustered(k=12, per=50)
    cb = train_vq_codebook(x, n_centroids=12, seed=9)
    assign = vq_codes_numpy(x, cb, 1)[:, 0]
    same = 0
    for c in range(12):
        grp = assign[c * 50 : (c + 1) * 50]
        vals, counts = np.unique(grp, return_counts=True)
        same += counts.max() / 50
    assert same / 12 >= 0.9  # >=90% of each cluster lands in one bucket
