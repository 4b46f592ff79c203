"""Vector similarity search over an embedding column.

This is the reference's actual query path (hash query → probe buckets →
exact distance → top-k, ``nlsh/indexer.py:56-96``) in DataFrame form:

- ``knn_bruteforce``: the exact baseline (reference's ``precompute.py:57-67``
  ground-truth pattern) — crossJoin + native cosine + ranking window.
  Small/test scale only; at 100 TB the LSH path below replaces it.
- ``hyperplane_codes`` + ``ann_lsh``: signed-random-projection LSH — the
  reference's learned encoder (``nlsh/hashings.py:66-92``) degenerates to
  random hyperplanes when untrained; banding the code bits gives the same
  multi-probe recall knob (``eval.py:148-196``) as a (bands × bits) split.

All distance math is native Catalyst (`zip_with`/`aggregate` — JVM-side);
only the bit-packing of projection signs is a vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def dot(a: Column, b: Column) -> Column:
    """Native dot product of two array<double> columns (no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors -> (query_id, neighbor_id, cosine, rank).

    Self-matches excluded. The query side should be small (it is broadcast);
    ties broken deterministically by neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    sim = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return sim.select("*", F.row_number().over(w).alias("rank")).where(F.col("rank") <= k)


def hyperplane_params(dim: int, num_bands: int, bits_per_band: int, seed: int) -> np.ndarray:
    """(num_bands*bits_per_band, dim) Gaussian hyperplanes, deterministic."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_bands * bits_per_band, dim))


def make_hyperplane_udf(planes: np.ndarray, num_bands: int, bits_per_band: int):
    """pandas_udf: array<float> embedding -> array<bigint> band bucket codes.

    Batch kernel: one (batch, dim) x (dim, nbits) matmul, sign, MSB-first
    bit-pack per band (the reference's bit-pack semantics,
    ``nlsh/utils.pyx:7-15``), then mix the band index in so bands don't
    collide with each other.
    """
    p = planes.T.copy()  # (dim, nbits)
    weights = (1 << np.arange(bits_per_band - 1, -1, -1, dtype=np.int64))  # MSB-first

    @pandas_udf(ArrayType(LongType()))
    def codes(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=object)
        ok = [i for i, v in enumerate(vecs) if v is not None]
        if ok:
            m = np.stack([np.asarray(vecs.iloc[i], dtype=np.float64) for i in ok])
            bits = (m @ p > 0).astype(np.int64)  # (n, nbits)
            bands = bits.reshape(len(ok), num_bands, bits_per_band)
            packed = (bands * weights).sum(axis=2)  # (n, num_bands)
            mixed = packed + (np.arange(num_bands, dtype=np.int64) << np.int64(32))
            for j, i in enumerate(ok):
                out[i] = mixed[j]
        return pd.Series(out)

    return codes


def ann_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    num_bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine via hyperplane-LSH bucket join.

    corpus codes explode to (neighbor_id, band, bucket); queries likewise;
    equi-join on (band, bucket) replaces the crossJoin — the same J1 bucket
    join as the reference's index probe. Exact cosine re-ranks candidates.
    """
    planes = hyperplane_params(dim, num_bands, bits_per_band, seed)
    udf = make_hyperplane_udf(planes, num_bands, bits_per_band)

    def with_codes(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(name),
            _as_double(F.col(vec_col)).alias(f"{name}_v"),
            F.posexplode(udf(F.col(vec_col))).alias("band", "bucket"),
        )

    qc = with_codes(queries, "query_id")
    cc = with_codes(corpus, "neighbor_id")
    cand = (
        qc.join(cc, ["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_similarity(F.col("query_id_v"), F.col("neighbor_id_v")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return sim.select("*", F.row_number().over(w).alias("rank")).where(F.col("rank") <= k)
