"""Candidate-fan-out comparison: MinHash banding vs learned partitioner
as the DEDUP bucketer — the reference's actual thesis (neural LSH cuts
candidate mass at equal recall; its `query_size` metric,
``nlsh/trainers/base.py:98``) measured on the dedup path end-to-end.

Every method shares the SAME exact-Jaccard verify over the SAME shingle
sets; only candidate GENERATION differs, so recall differences are purely
the bucketer's. Ground truth = exhaustive shared-shingle candidates (a
pair with J > 0 shares >= 1 shingle, so this misses nothing) + the same
verify. Writes BENCH/LEARNED_DEDUP.md.

Usage: python tools/bench_learned_dedup.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

    from pyspark.sql import functions as F

    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.config import DedupConfig
    from neural_locality_sensitive_hashing_spark.datagen import write_pages_dataset
    from neural_locality_sensitive_hashing_spark.functions.embedding import (
        make_hashed_embedding_udf,
    )
    from neural_locality_sensitive_hashing_spark.operators.candidates import (
        candidate_pairs,
    )
    from neural_locality_sensitive_hashing_spark.operators.dedup import (
        banded_signatures_fused,
        explode_fused_bands,
        shingle_documents,
    )
    from neural_locality_sensitive_hashing_spark.operators.learned import (
        fit_multiband_on_sample,
        fit_partitioner_on_sample,
    )
    from neural_locality_sensitive_hashing_spark.learned.partitioner import (
        make_learned_code_udf,
        make_multiband_code_udf,
    )
    from neural_locality_sensitive_hashing_spark.operators.verify import jaccard_verify

    spark = spark_session("learned-dedup", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig()

    pages_path, _ = write_pages_dataset(f"/tmp/nlsh_bench_webtext_{n_docs}", n_docs, seed=42)
    docs = spark.read.parquet(pages_path).select("doc_id", "text").persist()
    docs.count()
    sh = shingle_documents(docs, cfg).persist()
    sh.count()

    def verify(cands):
        return jaccard_verify(cands, sh, cfg)

    # ground truth: every pair sharing >= 1 shingle, exactly verified
    ex = sh.select("doc_id", F.explode("sh").alias("g"))
    all_cands = (
        ex.alias("l")
        .join(ex.alias("r"), "g")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    ).persist()
    n_all = all_cands.count()
    truth = {(r.a, r.b) for r in verify(all_cands).collect()}
    print(f"# truth: {len(truth)} dup pairs of {n_all} J>0 pairs", file=sys.stderr)

    rows = []

    def record(label, cand_df):
        t0 = time.time()
        cand_df = cand_df.persist()
        n_cand = cand_df.count()
        found = {(r.a, r.b) for r in verify(cand_df).collect()}
        wall = time.time() - t0
        rec = len(found & truth) / max(1, len(truth))
        rows.append((label, n_cand, len(found), rec, wall))
        cand_df.unpersist()
        print(f"# {label}: cand={n_cand} pairs={len(found)} recall={rec:.4f}",
              file=sys.stderr)

    # MinHash banding (the engine default, 32 bands x 4 rows)
    sigs = banded_signatures_fused(docs, cfg).persist()
    record("MinHash 32x4 banding", candidate_pairs(explode_fused_bands(sigs), cfg))
    sigs.unpersist()

    # learned bucketers over the hashed-token embedding
    embed = make_hashed_embedding_udf(dim=64, seed=cfg.minhash_seed)
    emb = docs.select(
        "doc_id", embed(F.col("text")).alias("embedding")
    ).persist()
    emb.count()

    def learned_cands(code_udf):
        buckets = (
            emb.select(
                "doc_id", F.posexplode(code_udf(F.col("embedding"))).alias("band", "bucket")
            )
            .select("doc_id", F.lit(0).alias("band"), "bucket")
            .dropDuplicates(["doc_id", "bucket"])
        )
        return candidate_pairs(buckets, cfg)

    w1 = fit_partitioner_on_sample(emb, n_bits=10, seed=cfg.minhash_seed)
    record("learned single 10b, 4 probes", learned_cands(make_learned_code_udf(w1, n_probes=4)))

    for n_bands, n_probes in [(4, 1), (4, 2), (8, 1)]:
        wl = fit_multiband_on_sample(emb, n_bands=n_bands, n_bits=10, seed=cfg.minhash_seed)
        record(
            f"learned multiband {n_bands}x10b, {n_probes} probes/band",
            learned_cands(make_multiband_code_udf(wl, n_probes=n_probes)),
        )

    # round-5 feature-bagged winner from the ANN frontier, tried on the
    # dedup path too (completeness: does decorrelation change the
    # honest-negative story here?)
    wl_bag = fit_multiband_on_sample(
        emb, n_bands=8, n_bits=8, seed=cfg.minhash_seed, feature_bag_frac=0.7
    )
    for n_probes in (1, 2):
        record(
            f"learned bagged 8x8b bag0.7, {n_probes} probes/band",
            learned_cands(make_multiband_code_udf(wl_bag, n_probes=n_probes)),
        )

    lines = [
        "# BENCH/LEARNED_DEDUP — candidate fan-out: MinHash banding vs learned bucketers",
        "",
        f"{n_docs} synthetic pages (datagen seed 42), tau={cfg.jaccard_threshold};",
        f"ground truth = exhaustive shared-shingle candidates ({n_all} J>0 pairs)",
        f"+ the shared exact verify -> {len(truth)} true dup pairs. Every method",
        "below uses the IDENTICAL verify; only candidate generation differs,",
        "so candidates-at-recall is a pure bucketer comparison (the",
        "reference's query_size-vs-recall tradeoff on the dedup path).",
        "",
        "| bucketer | candidates | dup pairs | recall | wall (s) |",
        "|---|---|---|---|---|",
        f"| exhaustive (truth) | {n_all} | {len(truth)} | 1.0000 | — |",
    ]
    for label, n_cand, n_found, rec, wall in rows:
        lines.append(f"| {label} | {n_cand} | {n_found} | {rec:.4f} | {wall:.1f} |")
    lines += [
        "",
        "Reading (HONEST NEGATIVE for the learned side on THIS task):",
        "MinHash banding wins the dedup path outright — fewer candidates",
        "than the exhaustive J>0 set at recall 1.0000, because shingle-",
        "space banding is exactly calibrated to the Jaccard measure the",
        "verify applies (S-curve miss < ~2e-4 at J = tau, -> 0 above).",
        "The learned bucketers hash a 64-dim Zipfian token embedding in",
        "which RANDOM doc pairs are already correlated (shared head",
        "tokens), so buckets blow up: 6-20x the candidate mass at 0.61-",
        "0.96 recall. Multi-band probing recovers recall (0.61 -> 0.96 at",
        "4x10b going 1 -> 2 probes/band) but never beats MinHash here.",
        "Even the round-5 feature-bagged 8x8b construction — which DOES",
        "beat hyperplanes on the embedding-ANN frontier — posts 24-65x",
        "MinHash's candidate mass at 0.62-0.81 recall on this path: the",
        "negative is about measure mismatch (Jaccard vs embedding",
        "cosine), and no amount of band decorrelation fixes that.",
        "The learned partitioner's win is the EMBEDDING-space tasks",
        "(cosine ANN/near-dup: BENCH/PROBE_SWEEP.md, LEARNED_GRID.md)",
        "where the measure it is trained on matches the query measure —",
        "this table is why minhash_dup_pairs stays the dedup default.",
        "",
        f"Reproduce: `python tools/bench_learned_dedup.py {n_docs}`",
    ]
    with open(os.path.join(REPO, "BENCH", "LEARNED_DEDUP.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
