"""Training-time code distances (K10-K12): multivariate-Bernoulli
divergences and tanh-cosine, as driver-side numpy kernels.

The reference defines these as torch modules used ONLY inside its offline
trainers (``nlsh/learning/distances.py:46-312``) — they never touch the
query path, so here they are plain numpy functions consumed by the
driver-side partitioner trainers (the Spark executors only ever see the
fitted (W, b)). Each distance treats a code vector p ∈ (0,1)^h as h
independent Bernoulli parameters.

Conventions (all row-wise over (n, h) matrices, returning (n,)):
  - ``bernoulli_kl(p, q)``       Σ_k p_k log(p_k/q_k) + (1-p_k) log((1-p_k)/(1-q_k))
  - ``bernoulli_symkl(p, q)``    KL(p‖q) + KL(q‖p)
  - ``bernoulli_cross_entropy``  -Σ_k p_k log q_k + (1-p_k) log(1-q_k)
  - ``bernoulli_entropy(p)``     cross entropy of p with itself
  - ``bernoulli_jsd(p, q)``      ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2
  - ``hellinger(p, q)``          √(1 - Σ affinity)/√2 per Bernoulli pair, summed
  - ``tanh_cosine(a, b)``        1 - cos(tanh codes)

Probabilities are clamped to [eps, 1-eps] so the edge values 0/1 are
well-defined (the reference relies on torch's same guard through logits).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _clamp(p: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(p, dtype=np.float64), _EPS, 1.0 - _EPS)


def bernoulli_kl(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise KL(p‖q) between multivariate Bernoulli codes."""
    p = _clamp(p)
    q = _clamp(q)
    kl = p * np.log(p / q) + (1.0 - p) * np.log((1.0 - p) / (1.0 - q))
    return kl.sum(axis=-1)


def bernoulli_symkl(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    return bernoulli_kl(p, q) + bernoulli_kl(q, p)


def bernoulli_cross_entropy(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise CE(p, q) = -Σ p log q + (1-p) log(1-q)."""
    p = _clamp(p)
    q = _clamp(q)
    ce = -(p * np.log(q) + (1.0 - p) * np.log(1.0 - q))
    return ce.sum(axis=-1)


def bernoulli_entropy(p: np.ndarray) -> np.ndarray:
    return bernoulli_cross_entropy(p, p)


def bernoulli_jsd(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise Jensen-Shannon divergence (symmetric, bounded)."""
    p = _clamp(p)
    q = _clamp(q)
    m = 0.5 * (p + q)
    return 0.5 * bernoulli_kl(p, m) + 0.5 * bernoulli_kl(q, m)


def hellinger(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Row-wise sum of per-bit Hellinger distances:
    H(p_k, q_k) = sqrt(1 - (sqrt(p q) + sqrt((1-p)(1-q))))."""
    p = _clamp(p)
    q = _clamp(q)
    affinity = np.sqrt(p * q) + np.sqrt((1.0 - p) * (1.0 - q))
    return np.sqrt(np.maximum(1.0 - affinity, 0.0)).sum(axis=-1)


def pairwise_bernoulli_kl(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, h) x (m, h) -> (n, m) KL matrix — the reference's einsum
    pairwise form (``nlsh/learning/distances.py:105-131``), used for
    hardest-negative mining over code distributions."""
    p = _clamp(p)
    q = _clamp(q)
    # Σ_k p log p + (1-p) log(1-p)  (row term, independent of q)
    row = (p * np.log(p) + (1.0 - p) * np.log(1.0 - p)).sum(axis=1)[:, None]
    # -Σ_k p log q + (1-p) log(1-q) for every (i, j)
    cross = -(p @ np.log(q).T + (1.0 - p) @ np.log(1.0 - q).T)
    return row + cross


def tanh_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise 1 − cos between tanh-activated codes (K12)."""
    ta = np.tanh(np.asarray(a, dtype=np.float64))
    tb = np.tanh(np.asarray(b, dtype=np.float64))
    num = (ta * tb).sum(axis=-1)
    den = np.linalg.norm(ta, axis=-1) * np.linalg.norm(tb, axis=-1)
    return 1.0 - num / np.maximum(den, _EPS)
