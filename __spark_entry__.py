"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neural_locality_sensitive_hashing_spark.queries import QUERIES, get_oracles
from neural_locality_sensitive_hashing_spark.queries import (
    q_minhash_dedup_clusters,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: MinHash-LSH near-duplicate clustering of the
    documents table at sf0.001."""
    return q_minhash_dedup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return get_oracles()
