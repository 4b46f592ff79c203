"""Incremental (streaming) per-URL recrawl dedup.

The batch recrawl tier (operators/recrawl.py) keeps the newest crawl per
canonical URL with one window over the full corpus. On a live crawl the
corpus never stops arriving, so this module maintains the same table as a
``foreachBatch`` UPSERT against a hash-partitioned parquet store — one
row per canonical URL: the winning crawl (newest ``warc_ts``, ties to the
highest ``crawl_id``) plus the accumulated crawl count.

Per batch (bounded by BATCH size, never store size):

    1. canonicalize + reduce the batch: one winner row + count per
       canonical URL (``max_by`` over (warc_ts, crawl_id)),
    2. read ONLY the store partitions the batch's canonical URLs hash
       into (``pfx = pmod(xxhash64(canonical_url), parts)``; driver-side
       ``isin`` on the partition column → parquet directory pruning,
       same layout contract as streaming/incremental.py's stores),
    3. full-outer merge on canonical_url: newest crawl wins, counts sum,
    4. dynamic-partition-overwrite the TOUCHED partitions only
       (untouched directories are never listed, read, or rewritten —
       the per-batch write is Iceberg ``MERGE INTO`` semantics done with
       plain parquet).

At-least-once with idempotent replay at PARTITION-DIRECTORY granularity:
foreachBatch is at-least-once, so every row carries ``last_batch_id``. A
replayed batch (restart between the partition write and the stream
checkpoint commit) finds ``last_batch_id == batch_id`` on rows it already
updated and re-applies as a no-op — counts never double, winners never
regress — which also heals a crash that landed only SOME partition
directories (rows in cleanly written partitions skip, rows in unwritten
partitions apply). The guard does NOT cover a crash INSIDE one
directory's dynamic-overwrite commit (old files removed, new files not
yet moved): that window loses the directory's rows, and closing it needs
an atomic table commit — exactly the Iceberg MERGE INTO in the scale
note below, whose snapshot commit makes the per-directory swap
transactional.

The store is an ID TABLE (canonical_url → winning crawl_id/url/warc_ts +
count), not a payload table: html/text stay in the append-only crawl log
and are gathered by crawl_id when the content-dedup tier runs — the same
ids-only-shuffle/gather-late philosophy as every ANN path in this repo
(rewriting payloads on every upsert would turn each micro-batch into a
corpus-payload write).

Scale note: at 10^12 URLs the store is the crawl frontier's index table;
the same layout maps to an Iceberg table bucket-partitioned by
canonical_url where step 4 is a real MERGE INTO. ``localCheckpoint``
before the write truncates lineage so Spark permits the self-referential
store rewrite; on Iceberg the MERGE does this natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.operators.recrawl import canonical_url
from neural_locality_sensitive_hashing_spark.streaming.incremental import (
    PAGES_SCHEMA,
    recover_store,
)

_STORE_COLS = [
    "canonical_url",
    "crawl_id",
    "url",
    "warc_ts",
    "n_crawls",
    "last_batch_id",
    "pfx",
]


class IncrementalRecrawl:
    """foreachBatch sink: maintains the latest-crawl-per-canonical-URL
    store (one row per canonical URL, hash-partitioned)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        store_parts: int = 16,
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.store_parts = store_parts
        self.id_col = id_col
        self.store = os.path.join(state_dir, "latest_crawls")

    def _pfx(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.store_parts))

    def _read_touched(self, pfx_values: list[int]) -> DataFrame | None:
        recover_store(self.store)
        if not os.path.exists(self.store):
            return None
        return (
            self.spark.read.parquet(self.store)
            .where(F.col("pfx").isin(pfx_values))
        )

    def _reduce_batch(self, pages: DataFrame, batch_id: int) -> DataFrame:
        """One row per canonical URL in the batch: the winning crawl +
        how many batch rows collapsed into it."""
        c = pages.withColumn("canonical_url", canonical_url(F.col("url")))
        ordk = F.struct(F.col("warc_ts"), F.col(self.id_col))
        win = F.max_by(
            F.struct(F.col(self.id_col).alias("crawl_id"), "url", "warc_ts"),
            ordk,
        ).alias("w")
        return (
            c.groupBy("canonical_url")
            .agg(win, F.count("*").alias("new_crawls"))
            .select(
                "canonical_url",
                F.col("w.crawl_id").alias("crawl_id"),
                F.col("w.url").alias("url"),
                F.col("w.warc_ts").alias("warc_ts"),
                F.col("new_crawls"),
                F.lit(int(batch_id)).alias("last_batch_id"),
                self._pfx(F.col("canonical_url")).alias("pfx"),
            )
        )

    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        b = self._reduce_batch(pages, batch_id).persist()
        pfx_values = [r[0] for r in b.select("pfx").distinct().collect()]
        if not pfx_values:
            # empty micro-batch (file sources can deliver a zero-row file):
            # a dynamic overwrite of an empty frame on a FRESH store would
            # create the store dir with only _SUCCESS and no parquet files,
            # making every later read fail with unable-to-infer-schema —
            # and on an existing store it is a no-op anyway. Skip it.
            b.unpersist()
            return
        old = self._read_touched(pfx_values)
        if old is None:
            merged = b.select(
                "canonical_url",
                "crawl_id",
                "url",
                "warc_ts",
                F.col("new_crawls").alias("n_crawls"),
                "last_batch_id",
                "pfx",
            )
        else:
            o = old.select(
                *[F.col(c).alias(f"o_{c}") for c in _STORE_COLS]
            )
            j = b.join(
                o, b["canonical_url"] == o["o_canonical_url"], "full_outer"
            )
            # replay guard: this batch's contribution is already merged
            replay = F.col("o_last_batch_id") == F.lit(int(batch_id))
            batch_wins = F.col("o_canonical_url").isNull() | (
                ~replay
                & (
                    F.struct(F.col("warc_ts"), F.col("crawl_id"))
                    > F.struct(F.col("o_warc_ts"), F.col("o_crawl_id"))
                )
            )
            pick = lambda new, oldc: F.when(batch_wins, new).otherwise(oldc)  # noqa: E731
            merged = j.select(
                F.coalesce("canonical_url", "o_canonical_url").alias(
                    "canonical_url"
                ),
                pick(F.col("crawl_id"), F.col("o_crawl_id")).alias("crawl_id"),
                pick(F.col("url"), F.col("o_url")).alias("url"),
                pick(F.col("warc_ts"), F.col("o_warc_ts")).alias("warc_ts"),
                (
                    F.coalesce("o_n_crawls", F.lit(0))
                    + F.when(
                        replay | F.col("canonical_url").isNull(), F.lit(0)
                    ).otherwise(F.coalesce("new_crawls", F.lit(0)))
                ).alias("n_crawls"),
                F.when(
                    replay | F.col("canonical_url").isNull(),
                    F.col("o_last_batch_id"),
                )
                .otherwise(F.lit(int(batch_id)))
                .alias("last_batch_id"),
                F.coalesce("pfx", "o_pfx").alias("pfx"),
            )
        # truncate lineage: the write targets the path the plan reads
        merged = merged.localCheckpoint()
        (
            merged.repartition("pfx")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pfx")
            .parquet(self.store)
        )
        b.unpersist()

    def latest_crawls(self) -> DataFrame:
        recover_store(self.store)
        if not os.path.exists(self.store):
            raise FileNotFoundError(self.store)
        return self.spark.read.parquet(self.store).select(
            "canonical_url", "crawl_id", "url", "warc_ts", "n_crawls"
        )


def run_incremental_recrawl(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    store_parts: int = 16,
) -> IncrementalRecrawl:
    """Drain all available files from input_dir through the incremental
    recrawl tier (Trigger.AvailableNow) and return the sink."""
    sink = IncrementalRecrawl(spark, state_dir, store_parts)
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def run_incremental_recrawl_warc(
    spark: SparkSession,
    warc_dir: str,
    state_dir: str,
    store_parts: int = 16,
    max_files_per_trigger: int = 1,
) -> IncrementalRecrawl:
    """Continuous crawl ingestion from RAW archives: WARC files landing
    in ``warc_dir`` drain straight into the latest-crawl store — the
    crawler drops an archive, the store stays current; no parquet
    staging hop. One archive per micro-batch by default, and the parse
    is the same zero-shuffle binaryFile -> mapInPandas read as the batch
    tier (sources/warc.py), so each micro-batch's only exchange is the
    store upsert's own canonical_url aggregation.

    The per-record ``crawl_id`` is content-derived (xxhash64 of path +
    in-file record ordinal, see read_warc_stream) so a replayed
    micro-batch reproduces identical rows for the ``last_batch_id``
    replay guard."""
    from neural_locality_sensitive_hashing_spark.sources.warc import (
        read_warc_stream,
    )

    sink = IncrementalRecrawl(spark, state_dir, store_parts, id_col="crawl_id")
    pages = read_warc_stream(spark, warc_dir, max_files_per_trigger)
    q = (
        pages.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


def run_incremental_recrawl_wet(
    spark: SparkSession,
    wet_dir: str,
    state_dir: str,
    store_parts: int = 16,
    max_files_per_trigger: int = 1,
) -> IncrementalRecrawl:
    """WET flavour of :func:`run_incremental_recrawl_warc`: extracted-text
    archives landing in ``wet_dir`` drain into the same latest-crawl
    store — the store is a (canonical_url, crawl_id, url, warc_ts, ...)
    index with no payload column, so the two archive flavours feed it
    identically; only the zero-shuffle parse differs. Same content-derived
    ``crawl_id`` replay-idempotence contract."""
    from neural_locality_sensitive_hashing_spark.sources.warc import (
        read_wet_stream,
    )

    sink = IncrementalRecrawl(spark, state_dir, store_parts, id_col="crawl_id")
    pages = read_wet_stream(spark, wet_dir, max_files_per_trigger)
    q = (
        pages.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
