"""Micro-bench for iterating on single queries (guide §1.4):
times `fn(spark, sf_dir)` with BOTH the bench's collect-to-count
methodology and a noop-sink full-materialization, N trials each, in one
session. Does not touch bench.py (frozen).

Usage: python tools/bench_one.py <query> [<query> ...] [--trials N] [--noop]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="also time noop-sink")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.queries import (
        QUERIES,
        q_embedding_dup_pairs_fast,
        q_token_stats,
    )

    benchable = dict(QUERIES)
    benchable["embedding_dup_pairs_fast"] = q_embedding_dup_pairs_fast
    benchable["token_stats"] = q_token_stats

    spark = spark_session("bench-one", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.queries:
        fn = benchable[name]
        walls = []
        for t in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
            spark.catalog.clearCache()
        walls_s = " ".join(f"{w:.3f}" for w in walls)
        print(f"{name}: count rows={n} walls=[{walls_s}] "
              f"median={sorted(walls)[len(walls)//2]:.3f}")
        if args.noop:
            walls = []
            for t in range(args.trials):
                spark.sparkContext.setJobDescription(f"{name} noop trial {t}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
                spark.catalog.clearCache()
            walls_s = " ".join(f"{w:.3f}" for w in walls)
            print(f"{name}: noop walls=[{walls_s}] "
                  f"median={sorted(walls)[len(walls)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
