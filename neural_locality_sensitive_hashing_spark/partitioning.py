"""Scan fan-out for kernel-heavy stages.

A small parquet table reads as a single scan partition (one ~10 MB file
<< ``spark.sql.files.maxPartitionBytes``), so an expensive per-document
Arrow kernel right above the scan runs on ONE core while the other 31
idle — measured on the sf0.1 documents table: the simhash-60 code kernel
alone was ~2 s single-threaded. ``fan_out`` repartitions such a scan to
the session's shuffle parallelism; when the input already has at least
that many partitions (any real-scale corpus), it is a NO-OP — no extra
exchange is ever added on the 100 TB path. The shuffled payload in the
small case is by construction small (it is the under-split scan itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's shuffle parallelism iff its
    current partition count is lower; identity otherwise. Round-robin
    (keyless) repartition: Spark's sort-before-repartition keeps the
    row-to-partition assignment deterministic under task retry
    (SPARK-23207), and the kernels above are per-row pure functions, so
    results are partitioning-invariant."""
    sess_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= sess_parts:
        return df
    return df.repartition(sess_parts)
