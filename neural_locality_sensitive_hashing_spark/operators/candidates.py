"""LSH banding + bucket self-join candidate-pair generation with skew control.

This is the Spark realization of the reference's inverted index + probe
(``nlsh/indexer.py:6-96``): the bucket→rows dict is never materialized —
a self-equi-join on (band, bucket) *is* the index probe (SURVEY.md §2.3 J2).

Skew: the reference *trains* bucket balance into its hash function
(``nlsh/trainers/proposed.py:101-118``) and monitors size dispersion
(``nlsh/trainers/base.py:87-90``). At Spark scale, boilerplate pages create
mega-buckets where the all-pairs self-join is O(n²); buckets larger than
``bucket_pair_cap`` instead emit a sorted *chain + stride* of pairs —
connectivity-preserving for union-find (every member still links to the
component) at O(n) pairs — and the drop is logged, never silent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig


def band_buckets(sig_col: Column, num_bands: int, rows_per_band: int) -> Column:
    """signature array<bigint> -> array<bigint> of per-band bucket hashes.

    bucket[b] = xxhash64(b, sig[b*r : (b+1)*r]) — band index is mixed in so
    identical row-slices in different bands never collide. Fully native.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.xxhash64(b, F.slice(sig_col, b * F.lit(rows_per_band) + 1, rows_per_band)),
    )


def explode_bands(
    signatures: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """(doc_id, sig) -> (doc_id, band, bucket), one row per (doc, band)."""
    return signatures.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(band_buckets(F.col(sig_col), cfg.num_bands, cfg.rows_per_band)).alias(
            "band", "bucket"
        ),
    )


def candidate_pairs(
    bands: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """(doc_id, band, bucket) -> distinct candidate (a, b) with a < b.

    Normal buckets: all-pairs self-join (AQE skew-join splits stragglers).
    Oversized buckets (> cfg.bucket_pair_cap members): sorted chain
    (i, i+1) plus binary-tree parent links (i, i//2) — O(n) pairs total.
    The chain keeps locally-adjacent (most-likely-to-verify) pairs; the
    tree caps the component diameter at O(log n) so the union-find
    fixpoint converges in logarithmically many rounds even for a
    boilerplate mega-bucket with millions of members (a chain alone would
    need O(n) label-propagation rounds — fatal at 10^12 docs). Dropped
    pair counts per bucket are derivable from `bucket_stats`.
    """
    cap = cfg.bucket_pair_cap
    nparts = cfg.candidate_partitions
    # one exchange on (band, bucket) feeds both the size tag and the rank —
    # cheaper than a groupBy-count + join-back (two shuffles of the bands)
    w = Window.partitionBy("band", "bucket")
    tagged = bands.select(
        "band",
        "bucket",
        "doc_id",
        F.count("*").over(w).alias("bucket_size"),
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
    ).persist()

    small = tagged.where(F.col("bucket_size") <= cap).select("band", "bucket", "doc_id")
    if nparts:
        small = small.repartition(nparts, "band", "bucket")
    l = small.alias("l")
    r = small.alias("r")
    pairs_small = (
        l.join(r, ["band", "bucket"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )

    ranked = tagged.where(F.col("bucket_size") > cap).select(
        "band", "bucket", "doc_id", "rn"
    )
    chain_rgt = ranked.select(
        "band", "bucket", F.col("doc_id").alias("b_doc"), (F.col("rn") - 1).alias("rn")
    )
    chain = ranked.join(chain_rgt, ["band", "bucket", "rn"]).select(
        F.col("doc_id").alias("a"), F.col("b_doc").alias("b")
    )
    tree_rgt = ranked.select(
        "band",
        "bucket",
        F.col("doc_id").alias("b_doc"),
        (F.col("rn") * 2).alias("rn"),  # parent rn -> children 2rn (and 2rn+1 below)
    )
    tree = (
        ranked.join(tree_rgt, ["band", "bucket", "rn"])
        .select(F.col("doc_id").alias("a"), F.col("b_doc").alias("b"))
        .unionByName(
            ranked.join(
                tree_rgt.withColumn("rn", F.col("rn") + 1), ["band", "bucket", "rn"]
            ).select(F.col("doc_id").alias("a"), F.col("b_doc").alias("b"))
        )
    )
    pairs_big = chain.unionByName(tree).where(F.col("a") != F.col("b")).select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    )

    return pairs_small.unionByName(pairs_big).dropDuplicates(["a", "b"])


def bucket_stats(bands: DataFrame) -> DataFrame:
    """Skew monitor — Spark analogue of the reference's index-size logging
    (``nlsh/trainers/base.py:87-90``): bucket count, size stddev/max, and
    total candidate-pair mass per band."""
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("bucket_size").alias("max_bucket"),
            F.round(F.stddev("bucket_size"), 4).alias("std_bucket"),
            F.sum(F.expr("bucket_size * (bucket_size - 1) / 2")).alias("pair_mass"),
        )
    )
