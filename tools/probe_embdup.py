"""One-off stage probe for embedding_dup_pairs (guide §1.1: find where the
time goes before touching anything). Times each pipeline stage with the
noop sink in one session. Not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")

from pyspark.sql import functions as F


def t(label, df, trials=3):
    walls = []
    for _ in range(trials):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    print(f"{label}: walls=" + " ".join(f"{w:.2f}" for w in walls))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from neural_locality_sensitive_hashing_spark import spark_session
    from neural_locality_sensitive_hashing_spark.operators import similarity as S
    from neural_locality_sensitive_hashing_spark.queries import (
        ANN_DIM, ANN_SEED, EMB_DUP_TAU, load,
    )

    spark = spark_session("probe-embdup", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf_dir, "embeddings")
    num_bands, bits = S.derive_banding(EMB_DUP_TAU, max_bands=32)
    print(f"banding: {num_bands}x{bits}")
    planes = S.hyperplane_params(ANN_DIM, num_bands, bits, ANN_SEED)
    udf = S.make_hyperplane_udf(planes, num_bands, bits, n_probes=1)
    ec = emb.select(F.col("vec_id").alias("doc_id"), F.explode(udf(F.col("embedding"))).alias("bucket"))
    t("1 ec (codes+explode)", ec)
    cand = S.lsh_bucket_self_join(ec)
    print("cand rows:", cand.count())
    t("2 cand (self-join+dedup)", cand)
    va = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    paired = cand.join(va, "a").join(vb, "b").select("a", "b", "va", "vb")
    t("3 paired (gather joins)", paired)
    scored = paired.mapInArrow(S._pair_cosine_arrow, "a long, b long, cosine_raw double")
    out = scored.select("a", "b", F.round(F.col("cosine_raw"), 6).alias("cosine")).where(
        F.col("cosine") >= EMB_DUP_TAU
    )
    t("4 full (verify)", out)
    spark.stop()


if __name__ == "__main__":
    main()
