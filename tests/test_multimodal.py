"""Multimodal binary-column plumbing: schema, determinism, batch shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_locality_sensitive_hashing_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_media_features,
    generate_media,
    media_metadata,
)


def test_decode_schema_and_determinism(spark):
    media = generate_media(spark, 50).persist()
    f1 = decode_media_features(media)
    assert f1.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,"
        "feature:array<float>,frame_count:bigint>"
    )
    rows1 = {r.media_id: (r.n_bytes, tuple(r.feature[:4]), r.frame_count)
             for r in f1.collect()}
    rows2 = {r.media_id: (r.n_bytes, tuple(r.feature[:4]), r.frame_count)
             for r in decode_media_features(media).collect()}
    assert rows1 == rows2
    assert len(rows1) == 50
    assert all(len(r.feature) == FEATURE_DIM for r in f1.collect())


def test_video_frame_sampling_stub(spark):
    media = generate_media(spark, 80)
    feats = decode_media_features(media).persist()
    vids = feats.where(F.col("kind") == "video").collect()
    assert all(v.frame_count == 1 + v.n_bytes // 4096 for v in vids)
    others = feats.where(F.col("kind") != "video").collect()
    assert all(o.frame_count == 1 for o in others)


def test_metadata_prunes_payload(spark, tmp_path):
    path = str(tmp_path / "media.parquet")
    generate_media(spark, 20).write.parquet(path)
    meta = media_metadata(spark.read.parquet(path))
    rows = meta.collect()
    assert len(rows) == 20
    assert all(16 <= r.width <= 4096 for r in rows)
    # column pruning must reach the scan: ReadSchema excludes payload bytes
    plan = meta._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    struct = read_schema[0].split("ReadSchema:")[1]
    assert "payload" not in struct, struct
    assert "meta:string" in struct, struct


def test_features_feed_ann_plumbing(spark):
    """Decoded features join into the similarity stack unchanged."""
    from neural_locality_sensitive_hashing_spark.operators.similarity import knn_bruteforce

    media = generate_media(spark, 60)
    feats = decode_media_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    nn = knn_bruteforce(feats.where(F.col("vec_id") < 5), feats, k=3)
    got = nn.groupBy("query_id").count().collect()
    assert len(got) == 5 and all(r["count"] == 3 for r in got)


def test_frame_sampling_and_feature_ann(spark):
    """Frame-sample explode + feature-column ANN chain: multimodal features
    flow straight into the similarity operators."""
    from neural_locality_sensitive_hashing_spark.functions.multimodal import (
        decode_media_features,
        generate_media,
        sample_frames,
    )
    from neural_locality_sensitive_hashing_spark.operators.similarity import (
        knn_bruteforce,
    )

    media = generate_media(spark, 40, seed=11)
    frames = sample_frames(media)
    rows = frames.groupBy("media_id").count().collect()
    assert len(rows) == 40
    by_kind = {r.media_id: r for r in media.collect()}
    for r in rows:
        if by_kind[r.media_id].kind == "video":
            assert r["count"] >= 1
        else:
            assert r["count"] == 1

    feats = decode_media_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    q = feats.where(F.col("vec_id") < 5)
    knn = knn_bruteforce(q, feats, k=3)
    got = knn.groupBy("query_id").count().collect()
    assert len(got) == 5 and all(r["count"] == 3 for r in got)
