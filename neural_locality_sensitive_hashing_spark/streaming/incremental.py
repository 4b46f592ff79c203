"""Incremental (streaming) near-duplicate detection.

The batch pipeline's stages are idempotent over snapshot tables, which makes
incremental dedup a `foreachBatch` refinement (SURVEY.md §2.10): for each
micro-batch of newly crawled pages,

    1. signature the new docs (same kernels as batch),
    2. candidate-generate new×new (grouped self-join with skew capping)
       PLUS new×old via an equi-join of the new bands against the
       accumulated BAND STORE — old×old is never rescanned; per-batch
       work is O(new×new + new-band probes), not O(total²),
    3. exact-verify and append to the dup_pairs store (tagged batch_id),
    4. append new signatures and new bands to their stores.

State lives in parquet stores (Iceberg-style append tables), not in Spark's
operator state — so the stream can restart from its checkpoint.

Equivalence contract vs a batch run over the union of all inputs:
*identical pair set for buckets below ``bucket_pair_cap``* (each pair is
emitted exactly once — by the batch that contributes its later doc). For
over-cap buckets the batch pipeline emits rank-dependent chain+tree pairs
while the increment emits new×all collisions, so pair SETS differ there;
both preserve bucket connectivity, so cluster assignments agree
(test_streaming.py asserts pair-set equality below cap and cluster-level
equivalence with a planted over-cap bucket).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.candidates import (
    candidate_pairs,
    candidate_pairs_two_sided,
    explode_bands,
)
from neural_locality_sensitive_hashing_spark.operators.dedup import signatures_fused
from neural_locality_sensitive_hashing_spark.operators.verify import jaccard_verify

PAGES_SCHEMA = (
    "doc_id bigint, url string, warc_ts timestamp, html binary, text string, lang string"
)


class IncrementalDeduper:
    """foreachBatch sink: maintains signature + band + dup-pair stores."""

    def __init__(self, spark: SparkSession, cfg: DedupConfig, state_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.sig_store = os.path.join(state_dir, "signatures")
        self.band_store = os.path.join(state_dir, "bands")
        self.pair_store = os.path.join(state_dir, "dup_pairs")

    def _read_store(self, path: str) -> DataFrame | None:
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def process_batch(self, new_pages: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        new_sigs = signatures_fused(new_pages, cfg).persist()
        new_bands = explode_bands(new_sigs, cfg).persist()

        # new×new with the full skew-capped machinery ...
        cands = candidate_pairs(new_bands, cfg)
        # ... plus new×old: probe the accumulated band store directly —
        # the ONLY work touching earlier batches is this equi-join; no
        # old×old candidate is ever regenerated.
        old_bands = self._read_store(self.band_store)
        if old_bands is not None:
            cands = cands.unionByName(
                candidate_pairs_two_sided(new_bands, old_bands, cfg)
            ).dropDuplicates(["a", "b"])

        old_sigs = self._read_store(self.sig_store)
        all_sets = new_sigs.select("doc_id", "sh")
        if old_sigs is not None:
            all_sets = all_sets.unionByName(old_sigs.select("doc_id", "sh"))

        dups = jaccard_verify(cands, all_sets, cfg)
        (
            dups.select("a", "b", "jaccard")
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(self.pair_store)
        )
        new_bands.write.mode("append").parquet(self.band_store)
        new_sigs.select("doc_id", "sh", "sig").write.mode("append").parquet(self.sig_store)
        new_bands.unpersist()
        new_sigs.unpersist()

    def dup_pairs(self) -> DataFrame:
        return (
            self.spark.read.parquet(self.pair_store)
            .select("a", "b", "jaccard")
            .dropDuplicates(["a", "b"])
        )

    def dup_pairs_with_batch(self) -> DataFrame:
        return self.spark.read.parquet(self.pair_store)


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
