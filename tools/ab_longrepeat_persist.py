"""Interleaved same-session A/B: persist_grams for long_repeat_pairs_exact.

Settles the round-8 INCONCLUSIVE cached-vs-recomputed comparison (adjacent
contiguous blocks read cached 74-119 s vs recomputed 60-133 s — pure window
noise) with the repo's own noise-floor discipline: ALTERNATE single trials
of the two variants inside ONE Spark session, so every A trial has a B
neighbour from the same host-noise window and the pairwise ratios cancel
the +/-70% between-window swings this VM shows even on 60-130 s jobs.

Per trial: full long_repeat_pairs_exact(...).collect() at n_docs, caches
released between trials (release_caches + clearCache), pair count and
planted construction truth (128-token blocks >= 128) asserted every trial.

Writes BENCH/longrepeat_persist_ab.json with per-pair ratios and the
paired-median verdict.

    python tools/ab_longrepeat_persist.py [n_docs] [pairs_of_trials]
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
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    master = os.environ.get("AB_LONGREPEAT_MASTER", "local[32]")

    from pyspark.sql import functions as F

    from neural_locality_sensitive_hashing_spark import DedupConfig, spark_session
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset
    from neural_locality_sensitive_hashing_spark.operators.suffix import (
        long_repeat_pairs_exact,
        release_caches,
    )

    cfg = DedupConfig(long_repeat_min_tokens=64)
    window = 16
    pages_path, truth_path = write_pages_dataset(
        f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42
    )
    spark = spark_session("ab_longrepeat", master=master, shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    truth = spark.read.parquet(truth_path).where(F.col("kind") == "longrepeat")
    want_pairs = {
        (r.a, r.b)
        for r in truth.groupBy("group_id")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .where(F.col("a") < F.col("b"))
        .collect()
    }
    assert want_pairs, "fixture must plant long-repeat pairs"

    def trial(persist: bool) -> tuple[float, int]:
        t0 = time.monotonic()
        got = long_repeat_pairs_exact(
            pages, cfg, winnow_window=window, persist_grams=persist
        ).collect()
        wall = round(time.monotonic() - t0, 2)
        release_caches()
        spark.catalog.clearCache()
        got_map = {(r.a, r.b): r.max_run for r in got}
        missing = [p for p in want_pairs if p not in got_map]
        assert not missing, f"missed planted pairs: {missing[:5]}"
        short = [(p, got_map[p]) for p in want_pairs if got_map[p] < 128]
        assert not short, f"under-measured: {short[:5]}"
        return wall, len(got)

    # one throwaway warmup (JVM/codegen/scan caches) charged to neither arm
    trial(False)

    recompute, cached, ratios, counts = [], [], [], set()
    for p in range(n_pairs):
        # alternate arm ORDER per pair (RC, CR, RC, ...) so slow drift
        # inside a window cannot systematically favour one arm
        order = [False, True] if p % 2 == 0 else [True, False]
        walls = {}
        for persist in order:
            w, n = trial(persist)
            counts.add(n)
            walls[persist] = w
            print(
                f"# pair {p} {'cached' if persist else 'recompute'}: {w}s",
                file=sys.stderr,
            )
        recompute.append(walls[False])
        cached.append(walls[True])
        ratios.append(round(walls[True] / walls[False], 3))
    assert len(counts) == 1, f"nondeterministic pair count: {counts}"

    med_ratio = statistics.median(ratios)
    # paired verdict: cached wins only if it wins in (almost) every
    # window, i.e. the ratio band sits clearly below 1.0
    if max(ratios) < 0.9:
        verdict = "cached_wins"
    elif min(ratios) > 1.1:
        verdict = "recompute_wins"
    else:
        verdict = "inside_noise"
    out = {
        "n_docs": n_docs,
        "master": master,
        "pairs_of_trials": n_pairs,
        "recompute_walls": recompute,
        "cached_walls": cached,
        "pair_ratios_cached_over_recompute": ratios,
        "median_ratio": med_ratio,
        "median_recompute": statistics.median(recompute),
        "median_cached": statistics.median(cached),
        "result_pairs": counts.pop(),
        "verdict": verdict,
    }
    with open(os.path.join(REPO, "BENCH", "longrepeat_persist_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
