"""Learned-partitioner hyperparameter grid on the DIFFUSE driver
embeddings — the round-3 verdict's open question: can more bits, a larger
training sample, or a different balance/objective make the learned rows
dominate raw hyperplanes at ≥3 probe points on the adversarial corpus
(BENCH/PROBE_SWEEP.md showed 0.177 recall@32 probes for the 10-bit /
2048-sample baseline)?

For each config: driver-side fit (numpy), then recall@10 + mean candidate
mass at a few probe points, against the brute-force oracle.  Dominance is
judged per CANDIDATE SCANNED: a learned point dominates if some hyperplane
point has >= its candidate mass but < its recall.  Writes
BENCH/LEARNED_GRID.md; the winner's full row-set goes into PROBE_SWEEP.md
(run tools/bench_probe_sweep.py after updating its params).

Usage: python tools/bench_learned_grid.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64
K = 10
N_QUERIES = 64
PROBES = [4, 16, 48]

# (label, n_bits, sample_rows, train_kwargs)
GRID = [
    ("baseline 10b/2k", 10, 2048, {}),
    ("16b/2k", 16, 2048, {}),
    ("20b/2k", 20, 2048, {}),
    ("10b/8k", 10, 8192, {}),
    ("16b/8k", 16, 8192, {}),
    ("16b/8k bal=1.0", 16, 8192, {"balance_weight": 1.0}),
    ("16b/8k bal=0.25", 16, 8192, {"balance_weight": 0.25}),
    ("16b/8k hardest", 16, 8192, {"negative_mode": "hardest"}),
    ("16b/8k triplet", 16, 8192, {"objective": "triplet"}),
    ("8b/8k", 8, 8192, {}),
]

# (label, n_bands, n_bits, probes_per_band, extra_fit_kwargs) — the
# OR-amplification axis; round-5 adds more-bands-fewer-bits points and
# per-band feature bagging (decorrelated ensembles) aimed at the
# >=15%-mass frontier where raw 8x8 hyperplanes still won in round 4
MB_GRID = [
    ("4 bands x 8b", 4, 8, [1, 4, 8], {}),
    ("4 bands x 10b", 4, 10, [2, 8, 16], {}),
    ("8 bands x 10b", 8, 10, [1, 4, 8], {}),
    ("8 bands x 6b", 8, 6, [1, 2, 4], {}),
    ("16 bands x 5b", 16, 5, [1, 2], {}),
    ("8 bands x 6b bag0.7", 8, 6, [1, 2, 4], {"feature_bag_frac": 0.7}),
    ("16 bands x 5b bag0.5", 16, 5, [1, 2], {"feature_bag_frac": 0.5}),
    ("8 bands x 8b bag0.7", 8, 8, [2, 4, 8], {"feature_bag_frac": 0.7}),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.learned.partitioner import (
        make_learned_code_udf,
    )
    from neural_locality_sensitive_hashing_spark.operators import similarity as S
    from neural_locality_sensitive_hashing_spark.operators.learned import (
        fit_partitioner_on_sample,
        learned_ann,
    )
    from neural_locality_sensitive_hashing_spark.operators.metrics import (
        bucket_join_candidate_count,
        mean_recall_at_k,
    )

    spark = spark_session("learned-grid", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    queries = emb.where(F.col("vec_id") < N_QUERIES).persist()
    n_corpus = emb.count()
    exact = (
        S.knn_bruteforce(queries, emb, k=K).select("query_id", "neighbor_id").persist()
    )
    exact.count()

    lines = [
        "# BENCH/LEARNED_GRID — learned partitioner tuning on the diffuse corpus",
        "",
        f"corpus {n_corpus} vectors ({sf_dir}), {N_QUERIES} queries, "
        f"recall@{K} vs brute-force cosine.",
        "",
        "| config | n_probes | recall@10 | mean candidates | % of corpus |",
        "|---|---|---|---|---|",
    ]
    results: list[tuple] = []
    for label, n_bits, sample_rows, kw in GRID:
        t0 = time.time()
        weights = fit_partitioner_on_sample(
            emb, n_bits=n_bits, sample_rows=sample_rows, seed=42, **kw
        )
        fit_s = time.time() - t0
        for n_probes in PROBES:
            ann = (
                learned_ann(queries, emb, weights, k=K, n_probes=n_probes)
                .select("query_id", "neighbor_id")
                .persist()
            )
            rec = mean_recall_at_k(ann, exact, k=K)
            n_cand = bucket_join_candidate_count(
                queries, emb,
                make_learned_code_udf(weights, n_probes=n_probes),
                make_learned_code_udf(weights, n_probes=1),
            )
            ann.unpersist()
            mean_c = n_cand / N_QUERIES
            pct = 100.0 * mean_c / n_corpus
            lines.append(
                f"| {label} | {n_probes} | {rec:.3f} | {mean_c:.0f} | {pct:.1f}% |"
            )
            results.append((label, n_probes, rec, mean_c))
            print(f"{lines[-1]}  (fit {fit_s:.1f}s)", file=sys.stderr)

    # multiband learned: B independent codes unioned (band-offset buckets)
    from neural_locality_sensitive_hashing_spark.learned.partitioner import (
        make_multiband_code_udf,
    )
    from neural_locality_sensitive_hashing_spark.operators.learned import (
        fit_multiband_on_sample,
        learned_ann_multiband,
    )

    lines += [
        "",
        "Multi-band learned (B independent codes unioned — OR-amplification):",
        "",
        "| config | probes/band | recall@10 | mean candidates | % of corpus |",
        "|---|---|---|---|---|",
    ]
    for label, n_bands, n_bits, probe_list, mb_kw in MB_GRID:
        wl = fit_multiband_on_sample(
            emb, n_bands=n_bands, n_bits=n_bits, sample_rows=8192, seed=42, **mb_kw
        )
        for n_probes in probe_list:
            ann = (
                learned_ann_multiband(queries, emb, wl, k=K, n_probes=n_probes)
                .select("query_id", "neighbor_id")
                .persist()
            )
            rec = mean_recall_at_k(ann, exact, k=K)
            n_cand = bucket_join_candidate_count(
                queries, emb,
                make_multiband_code_udf(wl, n_probes=n_probes),
                make_multiband_code_udf(wl, n_probes=1),
            )
            ann.unpersist()
            mean_c = n_cand / N_QUERIES
            pct = 100.0 * mean_c / n_corpus
            lines.append(
                f"| {label} | {n_probes} | {rec:.3f} | {mean_c:.0f} | {pct:.1f}% |"
            )
            results.append((f"{label} p{n_probes}", n_probes, rec, mean_c))
            print(lines[-1], file=sys.stderr)

    # hyperplane reference points at matched masses (8 bands x 8 bits)
    lines += [
        "",
        "Hyperplane reference (8x8, same corpus):",
        "",
        "| n_probes | recall@10 | mean candidates | % of corpus |",
        "|---|---|---|---|",
    ]
    hyper: list[tuple] = []
    for n_probes in [1, 2, 4, 8, 16]:
        cand = S.ann_lsh_candidates(
            queries, emb, dim=DIM, num_bands=8, bits_per_band=8, n_probes=n_probes
        ).persist()
        n_cand = cand.count()
        ann = S.ann_lsh(
            queries, emb, dim=DIM, k=K, num_bands=8, bits_per_band=8,
            n_probes=n_probes,
        ).select("query_id", "neighbor_id")
        rec = mean_recall_at_k(ann, exact, k=K)
        cand.unpersist()
        mean_c = n_cand / N_QUERIES
        hyper.append((n_probes, rec, mean_c))
        lines.append(
            f"| {n_probes} | {rec:.3f} | {mean_c:.0f} | "
            f"{100.0 * mean_c / n_corpus:.1f}% |"
        )
        print(lines[-1], file=sys.stderr)

    # dominance per candidate scanned: a learned point beats the frontier
    # if its recall exceeds the hyperplane curve's (linearly interpolated)
    # recall at the SAME candidate mass
    def hyper_recall_at(mass: float) -> float:
        pts = sorted((c, r) for _, r, c in hyper)
        if mass <= pts[0][0]:
            return pts[0][1] * mass / pts[0][0]  # through origin
        for (c0, r0), (c1, r1) in zip(pts, pts[1:]):
            if mass <= c1:
                return r0 + (r1 - r0) * (mass - c0) / (c1 - c0)
        return pts[-1][1]  # beyond the last measured point: flat

    lines += [
        "",
        "Frontier comparison (learned recall vs hyperplane recall interpolated "
        "at the same candidate mass):",
        "",
        "| config | mass | learned r@10 | hyperplane r@10 @ same mass | verdict |",
        "|---|---|---|---|---|",
    ]
    for label, n_probes, rec, mean_c in results:
        href = hyper_recall_at(mean_c)
        verdict = "BEATS" if rec > href else "loses"
        lines.append(
            f"| {label} | {mean_c:.0f} | {rec:.3f} | {href:.3f} | {verdict} |"
        )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "LEARNED_GRID.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
