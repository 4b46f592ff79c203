"""Dump `.explain("formatted")` for every headline bench query to
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan evidence
(guide §1: capture the plan shape before and after each change).

Usage:
    python tools/dump_plans.py <tag> <suffix> [query ...]

e.g. `python tools/dump_plans.py r10 before` dumps all headline queries;
name specific queries to refresh only those. Plan-only (no execution):
queries are built lazily and explainString is read off the QueryExecution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.queries import (
        QUERIES,
        q_embedding_dup_pairs_fast,
        q_token_stats,
    )
    from bench import HEADLINE

    benchable = dict(QUERIES)
    benchable["embedding_dup_pairs_fast"] = q_embedding_dup_pairs_fast
    benchable["token_stats"] = q_token_stats

    spark = spark_session("dump-plans", shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in HEADLINE:
        if only and name not in only:
            continue
        df = benchable[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} plan lines)")
    spark.stop()


if __name__ == "__main__":
    main()
