"""End-to-end dedup pipelines (SURVEY.md §3 E2 Spark re-expression):

    pages -> shingle/MinHash signatures -> band explode -> bucket self-join
          -> exact-Jaccard verify -> union-find -> clusters

plus the cheap exact (fingerprint groupBy) and SimHash variants. Each
pipeline is a pure DataFrame -> DataFrame function so stages compose with
the checkpoint manager (plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.functions import text as T
from neural_locality_sensitive_hashing_spark.functions.minhash import (
    make_minhash_udf,
    make_shingle_sig_udf,
)
from neural_locality_sensitive_hashing_spark.functions.simhash import simhash_udf
from neural_locality_sensitive_hashing_spark.operators.candidates import (
    candidate_pairs,
    explode_bands,
)
from neural_locality_sensitive_hashing_spark.operators.connected_components import (
    clusters_with_singletons,
    connected_components,
)
from neural_locality_sensitive_hashing_spark.operators.verify import (
    jaccard_verify,
    jaccard_verify_bcast,
    jaccard_verify_screened,
    simhash_verify,
)
from neural_locality_sensitive_hashing_spark.partitioning import fan_out


def shingle_documents(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, sh) narrow projection. Column pruning happens here: only
    (id, text) are read from the source; `html` never crosses a shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        T.shingle_set(F.col(text_col), cfg.shingle_k).alias("sh"),
    )


def minhash_signatures(
    shingled: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """(doc_id, sh) -> (doc_id, sh, sig). One Arrow-batched UDF pass."""
    udf = make_minhash_udf(cfg.num_perm, cfg.minhash_seed)
    return shingled.withColumn("sig", udf(F.col("sh")))


def signatures_fused(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, sh, sig) via the fused tokenize+shingle+MinHash UDF
    — the hot-path variant (one Arrow round trip, no JVM garbage from
    interpreted higher-order functions). Preferred by the pipeline; the
    native shingle_set/minhash pair remains for composability and the
    string-shingle driver queries."""
    docs = fan_out(docs)
    udf = make_shingle_sig_udf(
        cfg.shingle_k, cfg.num_perm, cfg.minhash_seed,
        shingle_hash_bytes=cfg.shingle_hash_bytes,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("s")
    ).select("doc_id", F.col("s.sh").alias("sh"), F.col("s.sig").alias("sig"))


def banded_signatures_fused(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, sh, bands) with the LSH banding fused INTO the
    Arrow kernel: the 1 KB/doc signature never leaves the Python worker
    and the per-doc 32x interpreted slice+xxhash64 band exprs disappear —
    a pure byte/allocation cut on the pipeline's hottest cached table.
    Candidate semantics are unchanged (identical docs collide per band);
    only the band hash family differs from explode_bands, which remains
    the sig-level API."""
    docs = fan_out(docs)
    udf = make_shingle_sig_udf(
        cfg.shingle_k, cfg.num_perm, cfg.minhash_seed,
        num_bands=cfg.num_bands, rows_per_band=cfg.rows_per_band,
        sig_prefix_perms=cfg.screen_perms if cfg.verify_screen else 0,
        shingle_hash_bytes=cfg.shingle_hash_bytes,
    )
    cols = ["doc_id", F.col("s.sh").alias("sh"), F.col("s.bands").alias("bands")]
    if cfg.verify_screen:
        cols.append(F.col("s.sigp").alias("sigp"))
    return docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("s")
    ).select(*cols)


def explode_fused_bands(banded: DataFrame) -> DataFrame:
    """(doc_id, bands) -> (doc_id, band, bucket) for candidate_pairs."""
    return banded.select(
        "doc_id", F.posexplode("bands").alias("band", "bucket")
    )


def minhash_dup_pairs(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full candidate-generation + verification -> (a, b, jaccard).

    Cache lifecycle: `sigs` is persisted because banding AND the verify
    gather-join consume it; the returned DataFrame is lazy, so the cache
    must outlive this function. Callers that materialize the result and
    loop (benchmarks, streaming) should release it via
    `spark.catalog.clearCache()` or by unpersisting the plan's cached
    ancestor — bench.py does exactly that between queries."""
    sigs = banded_signatures_fused(docs, cfg, id_col, text_col)
    sigs = sigs.persist()
    bands = explode_fused_bands(sigs)
    cands = candidate_pairs(bands, cfg)
    if cfg.verify_screen:
        return jaccard_verify_screened(cands, sigs.select("doc_id", "sh", "sigp"), cfg)
    # r10 size-gated verify strategy (guide §3.2/§8): within the gate the
    # shingle-set table is broadcast once and pairs verify via local
    # lookup — the gather joins shipped the full sets per candidate pair
    # through Arrow (~1 KB/pair). The gate count runs on the persisted
    # sigs table (one row per doc), so the same job PREPAYS the cache
    # materialization every downstream consumer needs — no separate scan
    # of the raw docs. Identical jaccard values either way; both bounds
    # are measured crossovers (config.py).
    if cfg.verify_broadcast_max_docs:
        n_docs = sigs.count()
        if cfg.verify_broadcast_min_docs < n_docs <= cfg.verify_broadcast_max_docs:
            return jaccard_verify_bcast(cands, sigs.select("doc_id", "sh"), cfg)
    return jaccard_verify(cands, sigs.select("doc_id", "sh"), cfg)


def minhash_dedup_clusters(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, cluster_id) over ALL docs (singletons label themselves)."""
    pairs = minhash_dup_pairs(docs, cfg, id_col, text_col)
    labels = connected_components(pairs, cfg.max_cc_iterations)
    return clusters_with_singletons(labels, docs, id_col)


def exact_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicates via fingerprint equi-join -> (a, b). No O(n²):
    group on the 128-bit fingerprint, self-join within groups."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"), T.fingerprint_md5(F.col(text_col)).alias("fp")
    )
    l = fp.alias("l")
    r = fp.alias("r")
    return (
        l.join(r, "fp")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )


def exact_dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, cluster_id = min doc_id sharing the fingerprint).
    One shuffle (window over fp) — no join, no union-find needed since
    exact-duplicate equality is already transitive."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"), T.fingerprint_md5(F.col(text_col)).alias("fp")
    )
    w = Window.partitionBy("fp")
    return fp.select("doc_id", F.min("doc_id").over(w).alias("cluster_id"))


def simhash_dup_pairs(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit code into 4×16-bit chunks
    (any pair within Hamming distance <= 3 shares at least one exact chunk
    — pigeonhole), bucket self-join per chunk, verify with bit_count.
    -> (a, b, hamming)."""
    codes = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        simhash_udf(T.shingle_set(F.col(text_col), cfg.shingle_k)).alias("simhash"),
    ).persist()
    chunks = codes.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), c -> shiftrightunsigned(simhash, c * 16) & 65535)"
            )
        ).alias("band", "bucket"),
    )
    cands = candidate_pairs(chunks, cfg)
    return simhash_verify(cands, codes, cfg)
