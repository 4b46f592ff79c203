from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.functions.simhash import (
    hamming_distance,
    simhash_numpy,
    simhash_udf,
)


def test_udf_matches_numpy(spark):
    rng = np.random.default_rng(3)
    sets = [rng.integers(-(2**62), 2**62, size=rng.integers(1, 40)).tolist() for _ in range(15)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sets)], "i int, sh array<long>")
    got = {r.i: r.c for r in df.select("i", simhash_udf(F.col("sh")).alias("c")).collect()}
    for i, s in enumerate(sets):
        assert got[i] == simhash_numpy(np.array(s, dtype=np.int64)), f"row {i}"


def test_single_element_identity():
    # simhash of a single hash is the hash itself (every bit is majority)
    h = np.array([0x0123456789ABCDEF], dtype=np.int64)
    assert simhash_numpy(h) == 0x0123456789ABCDEF


def test_hamming(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming_distance(F.col("a"), F.col("b")).alias("h")).first().h == 2


def test_near_sets_near_codes():
    rng = np.random.default_rng(1)
    s1 = rng.integers(0, 2**62, 500, dtype=np.int64)
    s2 = s1.copy()
    s2[:10] = rng.integers(0, 2**62, 10, dtype=np.int64)  # 2% change
    c1, c2 = simhash_numpy(s1), simhash_numpy(s2)
    d = bin((c1 ^ c2) & ((1 << 64) - 1)).count("1")
    assert d <= 12  # near-dup -> small Hamming distance
