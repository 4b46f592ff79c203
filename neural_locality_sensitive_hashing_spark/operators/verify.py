"""Exact verification of candidate pairs — the reference's "true distance"
pass (``nlsh/indexer.py:84-91``: gather candidates, exact distance, top-k)
re-expressed as a gather-join back to the shingle sets + a Jaccard kernel.

The Jaccard itself runs as an Arrow-batched numpy merge-intersection
(``_jaccard_udf``): it replaced the native ``array_intersect`` /
``array_union`` expressions after measurement showed the JVM
implementations allocate a hash set + two result arrays per row, stalling
the shared local heap at high thread counts (see the UDF docstring for
numbers). The native expressions remain available through
``functions.text``/SQL for composability; SimHash verification stays fully
native (``bit_count(a ^ b)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions.simhash import hamming_distance


@pandas_udf(DoubleType())
def _jaccard_udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
    """Exact set Jaccard of two array<long> columns (elements unique).

    numpy merge-intersection per pair; chosen over native
    `array_intersect`/`array_union` because the JVM implementations
    allocate a hash set + two result arrays per row — at 32 local threads
    that allocation rate stalls the shared heap (measured 9.5s at
    local[8] -> 37.5s at local[32] for the same verify stage; the Arrow
    kernel removes the regression)."""
    out = np.zeros(len(sa), dtype=np.float64)
    for i in range(len(sa)):
        a = sa.iloc[i]
        b = sb.iloc[i]
        if a is None or b is None:
            continue
        a = np.frombuffer(a, dtype="<i8") if isinstance(a, (bytes, bytearray)) else np.asarray(a, dtype=np.int64)
        b = np.frombuffer(b, dtype="<i8") if isinstance(b, (bytes, bytearray)) else np.asarray(b, dtype=np.int64)
        inter = np.intersect1d(a, b, assume_unique=True).size
        union = a.size + b.size - inter
        out[i] = inter / union if union else 0.0
    return pd.Series(out)


def jaccard_verify(
    pairs: DataFrame,
    shingle_sets: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    set_col: str = "sh",
) -> DataFrame:
    """(a, b) candidates × (doc_id, sh) -> (a, b, jaccard) with jaccard >= τ.

    The gather-join (SURVEY.md J3): two hash joins back to the narrow
    (doc_id, shingle-set) projection — never to the wide pages table, so
    `html`/`text` are pruned out of the shuffle.
    """
    sets_a = shingle_sets.select(F.col(id_col).alias("a"), F.col(set_col).alias("sh_a"))
    sets_b = shingle_sets.select(F.col(id_col).alias("b"), F.col(set_col).alias("sh_b"))
    return (
        pairs.join(sets_a, "a")
        .join(sets_b, "b")
        .select("a", "b", _jaccard_udf(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
    )


def simhash_verify(
    pairs: DataFrame,
    codes: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    code_col: str = "simhash",
) -> DataFrame:
    """(a, b) × (doc_id, simhash) -> pairs within the Hamming ball."""
    ca = codes.select(F.col(id_col).alias("a"), F.col(code_col).alias("code_a"))
    cb = codes.select(F.col(id_col).alias("b"), F.col(code_col).alias("code_b"))
    return (
        pairs.join(ca, "a")
        .join(cb, "b")
        .select("a", "b", hamming_distance(F.col("code_a"), F.col("code_b")).alias("hamming"))
        .where(F.col("hamming") <= cfg.simhash_hamming_max)
    )
