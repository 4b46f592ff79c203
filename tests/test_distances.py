"""Bernoulli code-distance kernels (K10-K12): hand-computed golden values
and analytic identities (mirrors the reference's golden-value test style,
nlsh/learning/tests/test_distances.py — values independently derived)."""

from __future__ import annotations

import math

import numpy as np

from neural_locality_sensitive_hashing_spark.learned.distances import (
    bernoulli_cross_entropy,
    bernoulli_entropy,
    bernoulli_jsd,
    bernoulli_kl,
    bernoulli_symkl,
    hellinger,
    pairwise_bernoulli_kl,
    tanh_cosine,
)


def test_kl_golden():
    p = np.array([[0.5, 0.5]])
    q = np.array([[0.25, 0.75]])
    # per bit: 0.5 ln(0.5/0.25) + 0.5 ln(0.5/0.75) = 0.5 ln 2 - 0.5 ln 1.5
    per_bit = 0.5 * math.log(2.0) + 0.5 * math.log(0.5 / 0.75)
    want = 2 * per_bit  # symmetric bits
    np.testing.assert_allclose(bernoulli_kl(p, q), [want], rtol=1e-12)
    # identity and non-negativity
    assert bernoulli_kl(p, p)[0] == 0.0
    assert bernoulli_kl(q, p)[0] > 0.0


def test_symkl_and_ce_relations():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.05, 0.95, size=(8, 6))
    q = rng.uniform(0.05, 0.95, size=(8, 6))
    np.testing.assert_allclose(
        bernoulli_symkl(p, q), bernoulli_kl(p, q) + bernoulli_kl(q, p), rtol=1e-12
    )
    # KL = CE - entropy
    np.testing.assert_allclose(
        bernoulli_kl(p, q),
        bernoulli_cross_entropy(p, q) - bernoulli_entropy(p),
        rtol=1e-10,
    )


def test_edge_probs_finite():
    p = np.array([[0.0, 1.0]])
    q = np.array([[1.0, 0.0]])
    for fn in (bernoulli_kl, bernoulli_cross_entropy, bernoulli_jsd, hellinger):
        v = fn(p, q)
        assert np.isfinite(v).all()
    assert bernoulli_jsd(p, p)[0] == 0.0


def test_jsd_golden_and_bounds():
    p = np.array([[1.0]])
    q = np.array([[0.0]])
    # maximally different single Bernoulli: JSD -> ln 2
    np.testing.assert_allclose(bernoulli_jsd(p, q), [math.log(2.0)], rtol=1e-6)
    r = np.array([[0.3]])
    s = np.array([[0.7]])
    assert 0.0 < bernoulli_jsd(r, s)[0] < math.log(2.0)
    np.testing.assert_allclose(bernoulli_jsd(r, s), bernoulli_jsd(s, r), rtol=1e-12)


def test_hellinger_golden():
    p = np.array([[0.5]])
    q = np.array([[0.5]])
    assert hellinger(p, q)[0] < 1e-5
    far = hellinger(np.array([[1.0]]), np.array([[0.0]]))[0]
    np.testing.assert_allclose(far, 1.0, atol=1e-5)


def test_pairwise_matches_rowwise():
    rng = np.random.default_rng(1)
    p = rng.uniform(0.1, 0.9, size=(5, 4))
    q = rng.uniform(0.1, 0.9, size=(7, 4))
    full = pairwise_bernoulli_kl(p, q)
    assert full.shape == (5, 7)
    for i in range(5):
        for j in range(7):
            np.testing.assert_allclose(
                full[i, j], bernoulli_kl(p[i : i + 1], q[j : j + 1])[0], rtol=1e-10
            )


def test_tanh_cosine():
    a = np.array([[1.0, 2.0, 3.0]])
    assert abs(tanh_cosine(a, a)[0]) < 1e-12
    b = -a
    np.testing.assert_allclose(tanh_cosine(a, b), [2.0], rtol=1e-12)
