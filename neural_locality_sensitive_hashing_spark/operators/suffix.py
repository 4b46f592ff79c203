"""Long exact-repeat detection: the "suffix-array pass" re-imagined as
distributed winnowing fingerprints (SURVEY.md §2.8, stage-3 verifier).

A classical suffix array over a 100 TB concatenated corpus does not
distribute; the equivalent *pair-detection* semantics do: two documents
share a verbatim token block of length >= L+w-1 iff they share at least one
robust-winnowing fingerprint computed with L-token grams and window w
(Schleimer/Wilkerson/Aiken, MOSS winnowing theorem). That turns "find long
exact repeats" into the engine's one universal primitive — an equi-join on
a fingerprint column:

    tokens -> L-gram xxhash64 (native slice+hash) -> sliding-window min
           -> distinct fingerprints -> explode -> self-join -> pairs

Everything is native Catalyst (higher-order functions); no UDF at all.
Detected pairs feed the same union-find as MinHash/SimHash pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions import text as T


def winnow_fingerprints(tokens_col: Column, gram_len: int, window: int) -> Column:
    """array<string> tokens -> array<bigint> winnowed L-gram fingerprints.

    Docs shorter than gram_len yield an empty array (they cannot contain a
    long repeat). Guarantee: any shared token run of >= gram_len + window - 1
    tokens produces at least one shared fingerprint in both docs.
    """
    n = F.size(tokens_col)
    gram_hashes = F.transform(
        F.sequence(F.lit(0), n - gram_len),
        lambda i: F.xxhash64(F.slice(tokens_col, i + 1, gram_len)),
    )
    m = F.size(gram_hashes)
    winnowed = F.when(
        m >= window,
        F.transform(
            F.sequence(F.lit(0), m - window),
            lambda j: F.array_min(F.slice(gram_hashes, j + 1, window)),
        ),
    ).otherwise(gram_hashes)  # short docs keep all gram hashes
    return F.when(n >= gram_len, F.array_distinct(winnowed)).otherwise(
        F.array().cast("array<long>")
    )


def long_repeat_pairs(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    winnow_window: int = 16,
) -> DataFrame:
    """-> (a, b, n_shared_fp): doc pairs sharing >=1 winnowed fingerprint,
    i.e. a verbatim block of >= gram_len + window - 1 tokens."""
    gram_len = cfg.long_repeat_min_tokens
    fps = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            winnow_fingerprints(T.tokens(F.col(text_col)), gram_len, winnow_window)
        ).alias("fp"),
    ).dropDuplicates(["doc_id", "fp"])
    l = fps.alias("l")
    r = fps.alias("r")
    return (
        l.join(r, "fp")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("n_shared_fp"))
    )
