"""Exact long-repeat verifier tier INSIDE the dedup job at the 1M-doc
scale -> BENCH/longrepeat_job.json.

Measures what `run_dedup_job --long-repeat-exact 79` does end-to-end —
the full MinHash-LSH pipeline PLUS the exact verbatim-run tier feeding
one union-find (SURVEY §7 stage 3) — with the cluster invariant asserted
against construction truth every trial:

  * plain clusters == 821,479, the determinism constant on this corpus
    (unbroken since round 2; re-derived here from the same persisted
    evidence, not quoted);
  * every planted long-repeat pair (shared verbatim 128-token block,
    global Jaccard ~0.06 << tau=0.7 — the MinHash-invisible case the
    tier exists for) lands in the SAME cluster under the tier;
  * tier clusters <= plain - n_planted_pairs: each planted pair merges
    two otherwise-distinct clusters, and chance >=79-token runs between
    same-base near-dup mutants can only merge further;
  * tier cluster count identical across trials (determinism).

One trial shares the expensive evidence across both union-finds:
signatures -> candidates -> verify (persisted) feeds CC(dups) and
CC(dups U lre), so the plain/tier delta is a property of one run, not
of two noisy ones. The TIMED window is the with-tier job (what a user
pays); the plain CC runs after the clock stops, for the invariant only.

Protocol per BENCH/BASELINE.md discipline: deterministic cached input,
3 trials, median + min, conditions labeled, caches dropped per trial.

    python tools/bench_longrepeat_job.py [n_docs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(os.environ.get("BENCH_LRE_JOB_TRIALS", "3"))
    master = os.environ.get("BENCH_LRE_JOB_MASTER", "local[32]")
    min_run = 79  # the winnowing guarantee bound at defaults (64 + 16 - 1)

    from pyspark.sql import functions as F

    from neural_locality_sensitive_hashing_spark import DedupConfig, spark_session
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset
    from neural_locality_sensitive_hashing_spark.operators.candidates import (
        candidate_pairs,
    )
    from neural_locality_sensitive_hashing_spark.operators.connected_components import (
        clusters_with_singletons,
        connected_components,
    )
    from neural_locality_sensitive_hashing_spark.operators.dedup import (
        banded_signatures_fused,
        explode_fused_bands,
    )
    from neural_locality_sensitive_hashing_spark.operators.suffix import (
        long_repeat_pairs_exact,
        release_caches,
    )
    from neural_locality_sensitive_hashing_spark.operators.verify import (
        jaccard_verify,
    )

    cfg = DedupConfig()
    assert cfg.long_repeat_min_tokens + 16 - 1 == min_run
    pages_path, truth_path = write_pages_dataset(
        f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42
    )
    spark = spark_session(
        "bench_longrepeat_job", master=master, shuffle_partitions=None
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path).select("doc_id", "text")

    planted = (
        spark.read.parquet(truth_path)
        .where(F.col("kind") == "longrepeat")
        .groupBy("group_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .where(F.col("a") < F.col("b"))
        .persist()
    )
    n_planted = planted.count()
    assert n_planted > 0, "fixture must plant long-repeat pairs"

    walls, n_tiers, n_plains, lre_counts = [], set(), set(), set()
    for t in range(trials):
        t0 = time.monotonic()
        sigs = banded_signatures_fused(pages, cfg).persist()
        cands = candidate_pairs(explode_fused_bands(sigs), cfg)
        dups = jaccard_verify(cands, sigs.select("doc_id", "sh"), cfg).persist()
        lre = (
            long_repeat_pairs_exact(pages, cfg)
            .where(F.col("max_run") >= F.lit(min_run))
            .persist()
        )
        merged = dups.select("a", "b").unionByName(
            lre.select("a", "b")
        ).dropDuplicates(["a", "b"])
        labels_tier = connected_components(merged, cfg.max_cc_iterations)
        clusters_tier = clusters_with_singletons(
            labels_tier, sigs, "doc_id"
        ).persist()
        n_tier = clusters_tier.select("cluster_id").distinct().count()
        walls.append(round(time.monotonic() - t0, 2))
        n_tiers.add(n_tier)
        lre_counts.add(lre.count())

        # clock stopped: invariant evidence over the SAME persisted run
        labels_plain = connected_components(
            dups.select("a", "b"), cfg.max_cc_iterations
        )
        n_plain = (
            clusters_with_singletons(labels_plain, sigs, "doc_id")
            .select("cluster_id")
            .distinct()
            .count()
        )
        n_plains.add(n_plain)
        assert n_plain == 821_479, f"determinism constant broken: {n_plain}"
        assert n_tier <= n_plain - n_planted, (
            f"tier must merge every planted pair: {n_tier} > "
            f"{n_plain} - {n_planted}"
        )
        ca = clusters_tier.select(
            F.col("doc_id").alias("a"), F.col("cluster_id").alias("ca")
        )
        cb = clusters_tier.select(
            F.col("doc_id").alias("b"), F.col("cluster_id").alias("cb")
        )
        split = (
            planted.join(ca, "a")
            .join(cb, "b")
            .where(F.col("ca") != F.col("cb"))
            .count()
        )
        assert split == 0, f"{split} planted pairs not co-clustered"

        for h in (sigs, dups, lre, clusters_tier):
            h.unpersist()
        release_caches()
        spark.catalog.clearCache()
        print(
            f"# trial {t}: {walls[-1]}s, tier clusters {n_tier} "
            f"(plain {n_plain}, delta {n_plain - n_tier}), "
            f"{n_planted} planted pairs co-clustered",
            file=sys.stderr,
        )
    assert len(n_tiers) == 1, f"nondeterministic tier clusters: {n_tiers}"

    med = statistics.median(walls)
    out = {
        "n_docs": n_docs,
        "master": master,
        "trials": trials,
        "min_run": min_run,
        "planted_pairs": n_planted,
        "lre_pairs": sorted(lre_counts)[0] if len(lre_counts) == 1 else sorted(lre_counts),
        "clusters_plain": sorted(n_plains)[0],
        "clusters_with_tier": sorted(n_tiers)[0],
        "walls": walls,
        "median_wall": med,
        "median_docs_per_s": round(n_docs / med, 1),
        "min_docs_per_s": round(n_docs / min(walls), 1),
    }
    with open(os.path.join(REPO, "BENCH", "longrepeat_job.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
