"""Long exact-repeat detection: the "suffix-array pass" re-imagined as
distributed winnowing fingerprints (SURVEY.md §2.8, stage-3 verifier).

A classical suffix array over a 100 TB concatenated corpus does not
distribute; the equivalent *pair-detection* semantics do: two documents
share a verbatim token block of length >= L+w-1 iff they share at least one
robust-winnowing fingerprint computed with L-token grams and window w
(Schleimer/Wilkerson/Aiken, MOSS winnowing theorem). That turns "find long
exact repeats" into the engine's one universal primitive — an equi-join on
a fingerprint column:

    tokens -> per-token xxhash64 (native) -> L-gram polynomial hash +
    sliding-window min (vectorized numpy pandas UDF) -> distinct
    fingerprints -> explode -> self-join -> pairs

The L-gram hashing runs in numpy (one (m, L) windowed multiply per doc)
because an L=64 rolling fold as native expressions would need 63 chained
zip_with passes — the Arrow batch kernel is the faster path here.
Detected pairs feed the same union-find as MinHash/SimHash pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions import text as T


def _gram_weights(gram_len: int) -> np.ndarray:
    rng = np.random.default_rng(7919 * gram_len)
    return (rng.integers(1, 2**63, size=gram_len, dtype=np.uint64) * 2 + 1).astype(np.uint64)


def make_winnow_udf(gram_len: int, window: int):
    """pandas_udf: array<bigint> token hashes -> array<bigint> winnowed
    L-gram fingerprints. Guarantee: any shared token run of
    >= gram_len + window - 1 tokens yields >= 1 shared fingerprint.
    Docs shorter than gram_len return an empty array."""
    weights = _gram_weights(gram_len)

    @pandas_udf(ArrayType(LongType()))
    def winnow(hashes: pd.Series) -> pd.Series:
        out = np.empty(len(hashes), dtype=object)
        for i, v in enumerate(hashes):
            if v is None:
                continue
            h = np.asarray(v, dtype=np.int64).view(np.uint64)
            n = len(h)
            if n < gram_len:
                out[i] = np.empty(0, dtype=np.int64)
                continue
            wins = np.lib.stride_tricks.sliding_window_view(h, gram_len)
            with np.errstate(over="ignore"):
                grams = (wins * weights[None, :]).sum(axis=1, dtype=np.uint64)
            if len(grams) >= window:
                sel = np.lib.stride_tricks.sliding_window_view(grams, window).min(axis=1)
            else:
                sel = grams
            out[i] = np.unique(sel).view(np.int64)
        return pd.Series(out)

    return winnow


def winnow_fingerprints(tokens_col: Column, gram_len: int, window: int) -> Column:
    """array<string> tokens -> array<bigint> winnowed fingerprints."""
    token_hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    return make_winnow_udf(gram_len, window)(token_hashes)


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
