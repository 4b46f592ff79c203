"""Checkpoint catalog: per-stage snapshot tables + per-partition lineage.

The reference caches its expensive intermediate (self-kNN) to a file and
reloads it if present (``precompute.py:89-97``, ``nlsh/data.py:41-44``);
here every pipeline stage writes an idempotent snapshot table keyed by a
content fingerprint, so a killed job resumes at the first missing stage
and completed stages are never recomputed.

Storage is parquet directories with a ``_meta.json`` sidecar (an
Iceberg-style snapshot: fingerprint, schema, row count, commit time — the
sandbox has no Iceberg runtime jar; when one is available the same writer
API maps to ``df.writeTo(...).createOrReplace()``, gated in
``write_snapshot``). Lineage: every write appends one row per partition
(stage, partition_id, rows, fingerprint) to the ``_lineage`` table.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _meta_path(base: str, stage: str) -> str:
    return os.path.join(base, stage, "_meta.json")


def _data_path(base: str, stage: str) -> str:
    return os.path.join(base, stage, "data")


class CheckpointCatalog:
    """Filesystem-backed stage snapshot catalog with lineage metrics."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        iceberg_table_prefix: str | None = None,
    ):
        """``iceberg_table_prefix`` (e.g. ``"cat.db"``) switches snapshot
        writes to the Iceberg DataFrameWriterV2 path:
        ``df.writeTo(f"{prefix}.{stage}").createOrReplace()``. Requires an
        Iceberg runtime jar + a configured ``spark.sql.catalog.<cat>``;
        absent those, write_snapshot raises a clean RuntimeError instead of
        a deep Spark stack. Default (None) keeps the parquet + _meta.json
        sidecar layout."""
        self.spark = spark
        self.base = base_dir
        self.iceberg_table_prefix = iceberg_table_prefix
        os.makedirs(base_dir, exist_ok=True)

    # -- snapshots ----------------------------------------------------------

    def has_snapshot(self, stage: str, fingerprint: str) -> bool:
        p = _meta_path(self.base, stage)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return meta.get("fingerprint") == fingerprint and meta.get("committed") is True

    def read_snapshot(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(_data_path(self.base, stage))

    def write_snapshot(self, df: DataFrame, stage: str, fingerprint: str) -> DataFrame:
        """Write stage output + meta + per-partition lineage; returns a
        re-read of the snapshot (so downstream reads columnar parquet and
        the upstream lineage is cut — the checkpoint role in the fixpoint
        loop)."""
        t0 = time.time()
        if self.iceberg_table_prefix is not None:
            table = f"{self.iceberg_table_prefix}.{stage}"
            try:
                df.writeTo(table).using("iceberg").createOrReplace()
            except Exception as e:  # missing jar / unconfigured catalog
                raise RuntimeError(
                    f"Iceberg snapshot write to {table!r} failed — the "
                    "Iceberg runtime jar and spark.sql.catalog."
                    f"{self.iceberg_table_prefix.split('.')[0]} must be "
                    "configured; unset iceberg_table_prefix to use the "
                    "parquet sidecar layout"
                ) from e
        stage_dir = os.path.join(self.base, stage)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        data = _data_path(self.base, stage)
        df.write.mode("overwrite").parquet(data)

        out = self.spark.read.parquet(data)
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("fingerprint", F.lit(fingerprint))
            .withColumn("wall_ms", F.lit(int((time.time() - t0) * 1000)))
        )
        lineage_dir = os.path.join(self.base, "_lineage")
        part_rows.select(
            "stage", "partition_id", "rows", "fingerprint", "wall_ms"
        ).write.mode("append").parquet(lineage_dir)

        n_rows = out.count()
        with open(_meta_path(self.base, stage), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fingerprint,
                    "rows": n_rows,
                    "schema": out.schema.jsonValue(),
                    "wall_ms": int((time.time() - t0) * 1000),
                    "committed": True,
                },
                f,
            )
        return out

    def drop_snapshot(self, stage: str) -> None:
        stage_dir = os.path.join(self.base, stage)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)

    def write_bucketed_table(
        self, df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32
    ) -> DataFrame:
        """Persist a snapshot as a BUCKETED catalog table (hash-bucketed +
        sorted by ``bucket_col``): any later equi-join on that column
        scans the table co-located — Spark shuffles only the other side
        (verified by plan assertion in tests/test_bucketed_join.py). This
        is the 100 TB pattern for repeatedly-probed state (signature /
        band stores): pay the partitioning once at write, never again per
        query. Maps 1:1 onto Iceberg ``bucket(n, col)`` partition
        transforms."""
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", os.path.join(self.base, f"_table_{table}"))
            .saveAsTable(table)
        )
        return self.spark.table(table)

    def lineage(self) -> DataFrame | None:
        p = os.path.join(self.base, "_lineage")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    # -- metrics (S8: the reference's logger.log(name, value, step) sink,
    #    ``nlsh/loggers.py:6-97``, as an appendable table next to lineage) --

    def write_metrics(self, metrics: dict[str, float], run_id: str) -> None:
        rows = [(run_id, k, float(v)) for k, v in metrics.items()]
        df = self.spark.createDataFrame(rows, "run_id string, metric string, value double")
        df.write.mode("append").parquet(os.path.join(self.base, "_metrics"))

    def metrics(self) -> DataFrame | None:
        p = os.path.join(self.base, "_metrics")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)
