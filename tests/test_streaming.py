"""Incremental (Structured Streaming) dedup == batch dedup on the union."""

from __future__ import annotations

import os

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.dedup import minhash_dup_pairs
from neural_locality_sensitive_hashing_spark.streaming.incremental import run_incremental

CFG = DedupConfig()


def test_incremental_equals_batch(spark, pages_1k, tmp_path):
    pages_path, _ = pages_1k
    pages = spark.read.parquet(pages_path)

    # split the corpus into 3 "crawl" files arriving over time
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    n = pages.count()
    parts = [
        pages.where(f"doc_id % 3 = {i}").coalesce(1) for i in range(3)
    ]
    for i, part in enumerate(parts):
        part.write.parquet(f"{input_dir}/batch_{i}.parquet")
    # flatten: file source wants files, parquet dirs-of-dirs are fine too
    dedup = run_incremental(spark, f"{input_dir}/*", str(tmp_path / "state"), CFG)

    streamed = {(r.a, r.b) for r in dedup.dup_pairs().collect()}
    batch = {(r.a, r.b) for r in minhash_dup_pairs(pages, CFG).collect()}
    missing = batch - streamed
    extra = streamed - batch
    assert not missing, f"streaming missed pairs: {list(missing)[:5]}"
    assert not extra, f"streaming invented pairs: {list(extra)[:5]}"
    assert n == 1000
