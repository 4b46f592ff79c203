"""One-off stage probe for the webtext_dedup flagship (guide §1.1):
times each pipeline stage with the noop sink / count in one session over
the same cached 50k-doc corpus bench.py uses."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn, trials=3):
    walls = []
    for _ in range(trials):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    print(f"{label}: walls=" + " ".join(f"{w:.2f}" for w in walls))


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs_n = int(os.environ.get("BENCH_WEBTEXT_DOCS", "50000"))
    from neural_locality_sensitive_hashing_spark import DedupConfig, spark_session
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset
    from neural_locality_sensitive_hashing_spark.operators import dedup as D
    from neural_locality_sensitive_hashing_spark.operators.candidates import candidate_pairs
    from neural_locality_sensitive_hashing_spark.operators.connected_components import (
        clusters_with_singletons, connected_components,
    )

    spark = spark_session("probe-webtext", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(shingle_hash_bytes=4)

    cache_dir = os.environ.get("BENCH_WEBTEXT_DIR", f"/tmp/nlsh_bench_webtext_{docs_n}")
    pages_path, _ = write_pages_dataset(cache_dir, docs_n, seed=42)
    pages = spark.read.parquet(pages_path)
    print("pages:", pages.count(), "partitions:", pages.rdd.getNumPartitions())

    sigs = D.banded_signatures_fused(pages, cfg)
    t("1 banded_signatures_fused (noop)", lambda: sigs.write.format("noop").mode("overwrite").save())

    def cands_run():
        s = D.banded_signatures_fused(pages, cfg).persist()
        c = candidate_pairs(D.explode_fused_bands(s), cfg)
        c.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    t("2 sigs+candidates (noop)", cands_run)

    def pairs_run():
        p = D.minhash_dup_pairs(pages, cfg)
        n = p.count()
        spark.catalog.clearCache()
        return n
    print("pairs rows:", D.minhash_dup_pairs(pages, cfg).count()); spark.catalog.clearCache()
    t("3 dup_pairs (count)", pairs_run)

    def full_run():
        D.minhash_dedup_clusters(pages, cfg).count()
        spark.catalog.clearCache()
    t("4 full clusters (count)", full_run)
    spark.stop()


if __name__ == "__main__":
    main()
