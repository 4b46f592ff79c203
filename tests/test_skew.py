"""Skew scenario (FIXTURES §4): a planted mega-bucket must complete under
the pair cap via the chain path, stay connected, and not hurt recall on
non-boilerplate pairs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.dedup import (
    minhash_dup_pairs,
    shingle_documents,
)

# small cap so the 600-member boilerplate group exercises the chain path
CFG = DedupConfig(bucket_pair_cap=64)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rng = np.random.default_rng(9)
    vocab = [f"w{i:04d}" for i in range(20000)]
    rows = []
    # 600 identical boilerplate docs (the mega bucket; 30% of corpus)
    boiler = " ".join(vocab[j] for j in rng.integers(0, 20000, 40))
    for i in range(600):
        rows.append((i, boiler))
    # 100 near-dup pairs (1-token change out of 100 -> jaccard ~0.95)
    nid = 1000
    for _ in range(100):
        toks = [vocab[j] for j in rng.integers(0, 20000, 100)]
        rows.append((nid, " ".join(toks)))
        toks2 = list(toks)
        toks2[50] = vocab[int(rng.integers(0, 20000))]
        rows.append((nid + 1, " ".join(toks2)))
        nid += 2
    # 700 unique
    for i in range(700):
        rows.append((10000 + i, " ".join(vocab[j] for j in rng.integers(0, 20000, 80))))
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_mega_bucket_completes_and_recall_holds(spark, skewed_docs):
    pairs = minhash_dup_pairs(skewed_docs, CFG).persist()
    got = {(r.a, r.b) for r in pairs.collect()}

    # non-boilerplate near-dup pairs: recall >= 0.99
    want = {(i, i + 1) for i in range(1000, 1200, 2)}
    recall = len(want & got) / len(want)
    assert recall >= 0.99, f"non-boilerplate recall {recall}"

    # mega-bucket stays fully connected through chain pairs (identical docs
    # -> every chain link verifies at jaccard 1.0)
    boiler_ids = set(range(600))
    boiler_pairs = [(a, b) for a, b in got if a in boiler_ids and b in boiler_ids]
    # chain pairs are O(n), far below the 179k all-pairs
    assert len(boiler_pairs) < 5000
    parent = list(range(600))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in boiler_pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(600)}) == 1, "mega-bucket split by capping"


def test_no_silent_truncation_is_observable(spark, skewed_docs):
    """bucket_stats exposes the skew that triggered capping (pair_mass vs
    emitted pairs) — the drop is measurable, not silent."""
    from neural_locality_sensitive_hashing_spark.operators.candidates import (
        bucket_stats,
        explode_bands,
    )
    from neural_locality_sensitive_hashing_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(shingle_documents(skewed_docs, CFG), CFG)
    stats = bucket_stats(explode_bands(sigs, CFG))
    worst = stats.agg(F.max("max_bucket").alias("m"), F.sum("pair_mass").alias("pm")).first()
    assert worst.m >= 600  # the planted mega bucket is visible
    assert worst.pm > 100_000  # and its quadratic pair mass is reported
