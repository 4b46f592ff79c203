"""Long-repeat (winnowing) pass: golden + planted-fixture recovery."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.suffix import long_repeat_pairs

CFG = DedupConfig(long_repeat_min_tokens=64)
W = 16


def _words(rng, n):
    return [f"t{int(x):05d}" for x in rng.integers(0, 30000, n)]


def test_shared_block_detected_and_absent_block_not(spark):
    rng = np.random.default_rng(11)
    block = _words(rng, CFG.long_repeat_min_tokens + W - 1)  # exactly the guarantee bound
    a = " ".join(_words(rng, 300) + block)
    b = " ".join(block + _words(rng, 300))
    c = " ".join(_words(rng, 400))
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "doc_id long, text string")
    pairs = long_repeat_pairs(df, CFG, winnow_window=W).collect()
    assert [(p.a, p.b) for p in pairs] == [(0, 1)]


def test_short_docs_no_fp(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "a b c")], "doc_id long, text string")
    assert long_repeat_pairs(df, CFG, winnow_window=W).count() == 0


def test_planted_longrepeat_groups_recovered(spark, pages_1k):
    pages_path, truth_path = pages_1k
    pages = spark.read.parquet(pages_path)
    truth = spark.read.parquet(truth_path)
    pairs = long_repeat_pairs(pages, CFG, winnow_window=W).persist()
    lr = truth.where(F.col("kind") == "longrepeat")
    want = {}
    for r in lr.collect():
        want.setdefault(r.group_id, []).append(r.doc_id)
    want_pairs = {
        (min(v), max(v)) for v in want.values() if len(v) == 2
    }
    got_pairs = {(r.a, r.b) for r in pairs.collect()}
    missing = want_pairs - got_pairs
    assert not missing, f"missed planted long-repeat pairs: {missing}"
    # low global Jaccard by construction -> MinHash must NOT see these
    # (that's the whole reason this pass exists); sanity: block/total < τ
    assert len(want_pairs) > 0
