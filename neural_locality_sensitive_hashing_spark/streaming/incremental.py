"""Incremental (streaming) near-duplicate detection.

The batch pipeline's stages are idempotent over snapshot tables, which makes
incremental dedup a `foreachBatch` refinement (SURVEY.md §2.10): for each
micro-batch of newly crawled pages,

    1. signature the new docs (same kernels as batch),
    2. candidate-join new bands against ALL bands seen so far
       (new×all ⊇ every pair that involves a new doc; old×old pairs were
       emitted by earlier batches — together that is exactly the batch
       pipeline's pair set),
    3. exact-verify and append to the dup_pairs store,
    4. append new signatures to the signature store.

State lives in parquet stores (Iceberg-style append tables), not in Spark's
operator state — so the stream can restart from its checkpoint and the
result is identical to a batch run over the union of all inputs
(test_streaming.py asserts set-equality with the batch pipeline).
Clustering stays a batch step over the accumulated pair store (union-find
is global by nature; run it on demand or per N batches).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.candidates import (
    candidate_pairs,
    explode_bands,
)
from neural_locality_sensitive_hashing_spark.operators.dedup import signatures_fused
from neural_locality_sensitive_hashing_spark.operators.verify import jaccard_verify

PAGES_SCHEMA = (
    "doc_id bigint, url string, warc_ts timestamp, html binary, text string, lang string"
)


class IncrementalDeduper:
    """foreachBatch sink: maintains signature + dup-pair stores."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.sig_store = os.path.join(state_dir, "signatures")
        self.pair_store = os.path.join(state_dir, "dup_pairs")

    def _existing_sigs(self) -> DataFrame | None:
        if not os.path.exists(self.sig_store):
            return None
        return self.spark.read.parquet(self.sig_store)

    def process_batch(self, new_pages: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        new_sigs = signatures_fused(new_pages, cfg).persist()

        old = self._existing_sigs()
        all_sigs = new_sigs if old is None else new_sigs.unionByName(old)

        new_bands = explode_bands(new_sigs, cfg)
        all_bands = explode_bands(all_sigs, cfg)
        # new×all candidate join; candidate_pairs machinery needs one table,
        # so tag sides and keep only pairs touching a new doc
        new_ids = new_sigs.select("doc_id")
        cands = candidate_pairs(all_bands.unionByName(new_bands).dropDuplicates(
            ["doc_id", "band", "bucket"]
        ), cfg)
        touching_new = cands.join(
            new_ids.withColumnRenamed("doc_id", "a"), "a", "left_semi"
        ).unionByName(
            cands.join(new_ids.withColumnRenamed("doc_id", "b"), "b", "left_semi")
                 .select("a", "b")
        ).dropDuplicates(["a", "b"])

        dups = jaccard_verify(touching_new, all_sigs.select("doc_id", "sh"), cfg)
        dups.select("a", "b", "jaccard").write.mode("append").parquet(self.pair_store)
        new_sigs.select("doc_id", "sh", "sig").write.mode("append").parquet(self.sig_store)
        new_sigs.unpersist()

    def dup_pairs(self) -> DataFrame:
        return self.spark.read.parquet(self.pair_store).dropDuplicates(["a", "b"])


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    cfg: DedupConfig | None = None,
) -> IncrementalDeduper:
    """Drain all available files from input_dir through the incremental
    pipeline (Trigger.AvailableNow) and return the deduper for inspection."""
    cfg = cfg or DedupConfig()
    dedup = IncrementalDeduper(spark, cfg, state_dir)
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(dedup.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return dedup
