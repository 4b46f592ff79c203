"""MinHash determinism + accuracy (golden style of the reference's tests)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.functions.minhash import (
    estimate_jaccard,
    make_minhash_udf,
    minhash_numpy,
    minhash_params,
)


def test_params_deterministic():
    a1, b1 = minhash_params(128, 42)
    a2, b2 = minhash_params(128, 42)
    assert (a1 == a2).all() and (b1 == b2).all()
    assert (a1 % 2 == 1).all()  # bijections mod 2^64


def test_udf_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    sets = [rng.integers(-(2**62), 2**62, size=rng.integers(1, 50)).tolist() for _ in range(20)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sets)], "i int, sh array<long>")
    udf = make_minhash_udf(32, 42)
    got = {r.i: list(r.sig) for r in df.select("i", udf(F.col("sh")).alias("sig")).collect()}
    a, b = minhash_params(32, 42)
    for i, s in enumerate(sets):
        want = list(minhash_numpy(np.array(s, dtype=np.int64), a, b))
        assert got[i] == want, f"row {i}"


def test_null_and_empty(spark):
    df = spark.createDataFrame([(0, None), (1, []), (2, [5])], "i int, sh array<long>")
    udf = make_minhash_udf(8, 42)
    rows = {r.i: r.sig for r in df.select("i", udf(F.col("sh")).alias("sig")).collect()}
    assert rows[0] is None and rows[1] is None
    assert len(rows[2]) == 8


def test_estimate_accuracy():
    """Identical sets -> 1.0; disjoint -> ~0; half-overlap -> ~0.33 (J=1/3)."""
    rng = np.random.default_rng(0)
    a, b = minhash_params(256, 42)
    s1 = rng.integers(0, 2**62, 1000, dtype=np.int64)
    s2 = np.concatenate([s1[:500], rng.integers(0, 2**62, 500, dtype=np.int64)])
    sig1 = minhash_numpy(s1, a, b)
    sig1b = minhash_numpy(s1, a, b)
    sig2 = minhash_numpy(s2, a, b)
    assert estimate_jaccard(sig1, sig1b) == 1.0
    est = estimate_jaccard(sig1, sig2)
    true_j = 500 / 1500
    assert abs(est - true_j) < 0.12
