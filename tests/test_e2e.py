"""End-to-end oracle tests (FIXTURES.md §2/§4, reference pattern:
*oracle = exact brute-force computation at small scale; system output must
reach a recall threshold against it* — nlsh/trainers/base.py:94-115).

Oracle dup pairs = exact pairwise shingle-set Jaccard >= τ via crossJoin;
oracle clusters = connected components of oracle pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.config import DedupConfig
from neural_locality_sensitive_hashing_spark.operators.connected_components import (
    connected_components,
)
from neural_locality_sensitive_hashing_spark.operators.dedup import (
    exact_dedup_clusters,
    exact_dup_pairs,
    minhash_dedup_clusters,
    minhash_dup_pairs,
    shingle_documents,
)

CFG = DedupConfig()


@pytest.fixture(scope="module")
def corpus(spark, pages_1k):
    pages_path, truth_path = pages_1k
    pages = spark.read.parquet(pages_path).persist()
    truth = spark.read.parquet(truth_path).persist()
    sh = shingle_documents(pages, CFG).persist()
    l = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    r = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    oracle_pairs = (
        l.crossJoin(r)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= CFG.jaccard_threshold)
        .persist()
    )
    oracle_pairs.count()
    return pages, truth, oracle_pairs


def _partition(rows) -> set[frozenset]:
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    return {frozenset(v) for v in by_cluster.values()}


def test_dup_pair_recall_and_precision(spark, corpus):
    pages, truth, oracle_pairs = corpus
    found = minhash_dup_pairs(pages, CFG).persist()
    n_oracle = oracle_pairs.count()
    assert n_oracle > 50, "fixture should plant a non-trivial number of dup pairs"
    hit = found.join(oracle_pairs.select("a", "b"), ["a", "b"]).count()
    recall = hit / n_oracle
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({hit}/{n_oracle})"
    # verify is the exact oracle metric -> found pairs are a subset of oracle
    assert found.join(oracle_pairs.select("a", "b"), ["a", "b"], "left_anti").count() == 0


def test_cluster_partition_matches_oracle(spark, corpus):
    pages, truth, oracle_pairs = corpus
    ours = _partition(minhash_dedup_clusters(pages, CFG).collect())
    oracle_cc = connected_components(oracle_pairs).collect()
    singles = {r.doc_id for r in pages.select("doc_id").collect()} - {
        r.doc_id for r in oracle_cc
    }
    oracle = _partition(oracle_cc) | {frozenset([d]) for d in singles}
    assert ours == oracle


def test_exact_dup_groups_recovered(spark, corpus):
    pages, truth, _ = corpus
    pairs = exact_dup_pairs(pages)
    # every truth 'exact' group is one fingerprint-cluster
    clusters = exact_dedup_clusters(pages)
    j = truth.where(F.col("kind") == "exact").join(clusters, "doc_id")
    split = j.groupBy("group_id").agg(F.countDistinct("cluster_id").alias("k")).where("k > 1")
    assert split.count() == 0
    # and no false merges: distinct texts never share a cluster
    merged = (
        clusters.join(pages.select("doc_id", "text"), "doc_id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("text").alias("k"))
        .where("k > 1")
    )
    assert merged.count() == 0
    assert pairs.count() > 0


def test_determinism_two_runs(spark, corpus):
    pages, _, _ = corpus
    p1 = sorted((r.a, r.b) for r in minhash_dup_pairs(pages, CFG).collect())
    p2 = sorted((r.a, r.b) for r in minhash_dup_pairs(pages, CFG).collect())
    assert p1 == p2


def test_decontam_broadcast_gate_and_shuffle_fallback(spark):
    """VERDICT r5 item 4: the benchmark-gram broadcast is size-gated in
    the style of embedding_dup_pairs_broadcast — a mis-sized 'benchmark'
    raises loudly instead of OOMing the driver, and the broadcast=False
    shuffle-gram-join fallback computes identical hits."""
    import pytest
    from neural_locality_sensitive_hashing_spark.queries import q_benchmark_decontam

    sf = "/root/testdata/sf0.001"
    with pytest.raises(ValueError, match="broadcast=False"):
        q_benchmark_decontam(spark, sf, max_broadcast_bench_docs=3)

    fast = {tuple(r) for r in q_benchmark_decontam(spark, sf).collect()}
    slow = {
        tuple(r) for r in q_benchmark_decontam(spark, sf, broadcast=False).collect()
    }
    assert fast and fast == slow
