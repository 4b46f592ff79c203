"""Exact verification of candidate pairs — the reference's "true distance"
pass (``nlsh/indexer.py:84-91``: gather candidates, exact distance, top-k)
re-expressed as a join back to the shingle sets + a native set-Jaccard.

All verification math is JVM-side (`array_intersect` / `array_union` /
`bit_count`) inside whole-stage codegen; no Python in the verify path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions.simhash import hamming_distance


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
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(sets_a, "a")
        .join(sets_b, "b")
        .select("a", "b", F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"))
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
