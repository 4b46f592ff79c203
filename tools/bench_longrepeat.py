"""Exact long-repeat pass at the 1M-doc scale -> BENCH/longrepeat_raw.json.

Benches operators/suffix.py::long_repeat_pairs_exact — the winnowed
candidate join + positional-gram diagonal exact verify (the SURVEY §2.8
suffix-array pass carried to exact run lengths) — over the standard 1M
synthetic webtext corpus, with construction-truth asserts every trial:

  * every planted long-repeat pair (verbatim 128-token block, low global
    Jaccard — the MinHash-invisible case this pass exists for) must be
    reported with max_run >= 128 (>= because a Zipf token adjacent to the
    block can extend the true run);
  * the winnowing guarantee bound is gram_len + window - 1 = 79 tokens,
    so 128-token blocks are theorem-covered, not luck-covered;
  * pair count must be identical across trials (determinism).

Protocol per BENCH/BASELINE.md discipline: deterministic cached input,
3 trials, median + min, conditions labeled.

    python tools/bench_longrepeat.py [n_docs]
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
    trials = int(os.environ.get("BENCH_LONGREPEAT_TRIALS", "3"))
    master = os.environ.get("BENCH_LONGREPEAT_MASTER", "local[32]")

    from pyspark.sql import functions as F

    from neural_locality_sensitive_hashing_spark import DedupConfig, spark_session
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset
    from neural_locality_sensitive_hashing_spark.operators.suffix import (
        long_repeat_pairs_exact,
    )

    cfg = DedupConfig(long_repeat_min_tokens=64)
    window = 16
    pages_path, truth_path = write_pages_dataset(
        f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42
    )
    spark = spark_session("bench_longrepeat", master=master, shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)

    # construction truth: planted long-repeat pairs (groups of exactly 2)
    truth = spark.read.parquet(truth_path).where(F.col("kind") == "longrepeat")
    want_pairs = {
        (r.a, r.b)
        for r in truth.groupBy("group_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .where(F.col("a") < F.col("b"))
        .collect()
    }
    assert want_pairs, "fixture must plant long-repeat pairs"

    walls, counts = [], set()
    planted_runs = None
    for t in range(trials):
        t0 = time.monotonic()
        got = long_repeat_pairs_exact(
            pages, cfg, winnow_window=window
        ).collect()
        walls.append(round(time.monotonic() - t0, 2))
        counts.add(len(got))
        spark.catalog.clearCache()
        got_map = {(r.a, r.b): r.max_run for r in got}
        missing = [p for p in want_pairs if p not in got_map]
        assert not missing, f"missed planted pairs: {missing[:5]}..."
        short = [
            (p, got_map[p]) for p in want_pairs if got_map[p] < 128
        ]
        assert not short, f"planted 128-token blocks under-measured: {short[:5]}"
        planted_runs = sorted(got_map[p] for p in want_pairs)
        print(
            f"# trial {t}: {walls[-1]}s, {len(got)} pairs, "
            f"{len(want_pairs)} planted recovered",
            file=sys.stderr,
        )
    assert len(counts) == 1, f"nondeterministic pair count: {counts}"

    med = statistics.median(walls)
    out = {
        "n_docs": n_docs,
        "master": master,
        "trials": trials,
        "gram_len": cfg.long_repeat_min_tokens,
        "winnow_window": window,
        "pairs": counts.pop(),
        "planted_pairs": len(want_pairs),
        "planted_max_run_min": planted_runs[0],
        "planted_max_run_max": planted_runs[-1],
        "walls": walls,
        "median_wall": med,
        "median_docs_per_s": round(n_docs / med, 1),
        "min_docs_per_s": round(n_docs / min(walls), 1),
    }
    with open(os.path.join(REPO, "BENCH", "longrepeat_raw.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
