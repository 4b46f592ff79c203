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
        "feature:array<float>,frame_count:bigint,decoder:string>"
    )
    rows1 = {r.media_id: (r.n_bytes, tuple(r.feature[:4]), r.frame_count)
             for r in f1.collect()}
    rows2 = {r.media_id: (r.n_bytes, tuple(r.feature[:4]), r.frame_count)
             for r in decode_media_features(media).collect()}
    assert rows1 == rows2
    assert len(rows1) == 50
    assert all(len(r.feature) == FEATURE_DIM for r in f1.collect())


def test_real_codec_roundtrips():
    """The PNG/WAV decoders are REAL: encode -> decode recovers the data."""
    import numpy as np

    from neural_locality_sensitive_hashing_spark.functions import codecs

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    blob = codecs.encode_png(px)
    hdr = codecs.parse_png_header(blob)
    assert hdr["width"] == 7 and hdr["height"] == 11 and hdr["channels"] == 3
    out = codecs.decode_png_pixels(blob)
    assert out is not None and (out == px).all()
    # all five PNG filter types must reconstruct: re-encode via zlib with
    # per-row filters 0..4 applied manually
    assert codecs.decode_png_pixels(b"\x89PNG not really") is None

    s = (rng.standard_normal((500, 2)) * 0.1).clip(-0.99, 0.99)
    wav = codecs.encode_wav(s, rate=16000)
    whdr = codecs.parse_wav_header(wav)
    assert whdr["channels"] == 2 and whdr["sample_rate"] == 16000
    dec, rate = codecs.decode_wav_samples(wav)
    assert rate == 16000 and dec.shape == (500, 2)
    assert abs(dec - s).max() < 1e-4  # PCM-16 quantization only
    assert codecs.decode_wav_samples(b"RIFFxxxxNOPE") is None


def test_decoder_tiers_observable(spark):
    """Real payloads decode on the real tier, opaque bytes on the stub —
    and the tier is visible in the `decoder` column (never silent)."""
    media = generate_media(spark, 120, seed=5)
    tags = {
        (r.kind, r.decoder)
        for r in decode_media_features(media).select("kind", "decoder").collect()
    }
    assert ("image", "real-png") in tags
    assert ("image", "real-jpeg") in tags  # pure-python T.81 baseline
    assert ("audio", "real-wav") in tags
    assert ("video", "real-mp4-container") in tags  # ISO-BMFF box walk
    assert ("video", "real-mp4-mjpeg") in tags  # demux + real frame decode
    assert ("video", "stub") in tags  # opaque random-byte videos
    # opaque random bytes fall back to the stub for image/audio too
    assert ("image", "stub") in tags and ("audio", "stub") in tags
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        # without PIL, non-PNG/JPEG images can only be stubs
        assert ("image", "pil") not in tags


def test_video_frame_sampling_stub(spark):
    media = generate_media(spark, 80)
    feats = decode_media_features(media).persist()
    vids = feats.where(F.col("kind") == "video").collect()
    for v in vids:
        if v.decoder in ("real-mp4-container", "real-mp4-mjpeg"):
            # the container's OWN stsz count (generator writes 2..15 frames)
            assert 2 <= v.frame_count <= 15
        else:
            assert v.frame_count == 1 + v.n_bytes // 4096
    assert {v.decoder for v in vids} == {
        "real-mp4-container", "real-mp4-mjpeg", "stub"
    }
    others = feats.where(F.col("kind") != "video").collect()
    assert all(o.frame_count == 1 for o in others)


def test_decode_matches_construction_truth(spark):
    """End-to-end value check against CONSTRUCTION-time truth (not the
    decoder's own output): media built with known kinds/frame-counts/
    pixels must decode — through the full Spark mapInPandas path — to
    exactly the predicted tier and frame count, and the MJPEG feature
    must match the feature computed from the ORIGINAL pixels (the codec
    is lossy, so cosine-close, not bit-equal)."""
    import numpy as np

    from neural_locality_sensitive_hashing_spark.functions import codecs
    from neural_locality_sensitive_hashing_spark.functions.multimodal import (
        FEATURE_DIM,
    )

    rng = np.random.default_rng(77)
    frame_px = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(6)
    ]
    img_px = rng.integers(0, 256, (20, 14, 3), dtype=np.uint8)
    rows = [
        # (media_id, kind, payload, expected decoder, expected frame_count)
        (0, "image", codecs.encode_png(img_px), "real-png", 1),
        (1, "image", codecs.encode_jpeg(img_px, quality=95), "real-jpeg", 1),
        (2, "video",
         codecs.encode_mp4([codecs.encode_jpeg(p, quality=95) for p in frame_px],
                           320, 240),
         "real-mp4-mjpeg", 6),
        (3, "video", codecs.encode_mp4([rng.bytes(400) for _ in range(4)],
                                       320, 240),
         "real-mp4-container", 4),
        # int16-grid samples make the PCM-16 roundtrip LOSSLESS, so the
        # audio feature must match construction truth exactly
        (4, "audio",
         codecs.encode_wav(
             rng.integers(-32768, 32768, (2048, 2)).astype(np.float64) / 32768.0,
             rate=8000),
         "real-wav", 1),
    ]
    media = spark.createDataFrame(
        [(i, k, bytearray(p), "{}") for i, k, p, _, _ in rows],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r.media_id: r for r in decode_media_features(media).collect()}
    for mid, _, _, want_dec, want_frames in rows:
        assert got[mid].decoder == want_dec, (mid, got[mid].decoder)
        assert got[mid].frame_count == want_frames
    # feature-vs-original-pixels checks (codec lossy -> cosine-close)
    png_want = codecs.image_feature(img_px, FEATURE_DIM)
    assert float(np.dot(got[0].feature, png_want)) > 0.999999  # lossless
    jpg_want = png_want
    assert float(np.dot(got[1].feature, jpg_want)) > 0.99
    mj = np.mean([codecs.image_feature(p, FEATURE_DIM) for p in frame_px], axis=0)
    mj = mj / np.linalg.norm(mj)
    assert float(np.dot(got[2].feature, mj)) > 0.99
    wav_samples = codecs.decode_wav_samples(rows[4][2])[0]
    wav_want = codecs.audio_feature(wav_samples, 8000, FEATURE_DIM)
    assert float(np.dot(got[4].feature, wav_want)) > 0.999999  # lossless


def test_mp4_container_roundtrip():
    """encode_mp4 -> parse_mp4 -> sample_video_frames: real box walk, true
    frame count, exact demuxed frame bytes."""
    from neural_locality_sensitive_hashing_spark.functions import codecs

    frames = [bytes([i]) * (100 + 7 * i) for i in range(12)]
    mp4 = codecs.encode_mp4(frames, 320, 240, fps=10)
    info = codecs.parse_mp4(mp4)
    assert info["width"] == 320 and info["height"] == 240
    assert info["codec"] == "raw " and info["frame_count"] == 12
    assert info["duration_sec"] == 1.2
    assert info["frame_sizes"] == [len(f) for f in frames]
    # sampling returns the exact frame bytes at evenly-spaced indices
    got = codecs.sample_video_frames(mp4, info, max_frames=4)
    assert [frames.index(g) for g in got] == [0, 3, 7, 11]
    # full demux: every frame, byte-identical
    assert codecs.sample_video_frames(mp4, info, max_frames=12) == frames
    # non-MP4 payloads are None, never a crash
    assert codecs.parse_mp4(b"") is None
    assert codecs.parse_mp4(b"random junk bytes here") is None


def test_mp4_multichunk_demux_and_crafted_stco():
    """Multi-chunk, non-contiguous mdat (inter-chunk padding): the stsc/stco
    per-chunk walk recovers every frame byte-identically — a
    first-offset-only reader would slice padding into frames 5+. Crafted
    over-declared stco counts are rejected, not parsed past the box end."""
    import struct

    from neural_locality_sensitive_hashing_spark.functions import codecs

    # zero-frame container stays encodable and structurally valid
    empty = codecs.parse_mp4(codecs.encode_mp4([], 64, 64))
    assert empty is not None and empty["frame_count"] == 0

    frames = [bytes([i]) * (50 + 13 * i) for i in range(11)]
    mp4 = codecs.encode_mp4(
        frames, 64, 64, fps=5, frames_per_chunk=4, chunk_gap=37
    )
    info = codecs.parse_mp4(mp4)
    assert info["frame_count"] == 11
    assert len(info["chunk_offsets"]) == 3  # 4 + 4 + 3 frames
    assert info["sample_to_chunk"] == [(1, 4, 1), (3, 3, 1)]
    assert codecs.sample_video_frames(mp4, info, max_frames=11) == frames
    # multi-chunk WITHOUT stsc -> refuse (callers take the stride fallback)
    no_stsc = dict(info)
    no_stsc.pop("sample_to_chunk")
    assert codecs.sample_video_frames(mp4, no_stsc, max_frames=11) == []
    # crafted stco entry count exceeding its box: skipped, parse survives
    # (single-chunk default layout -> exact stco box bytes are known)
    single = codecs.encode_mp4(frames[:3], 64, 64)
    good_stco = b"stco" + struct.pack(">II", 0, 1)
    idx = single.index(good_stco)
    bad = single[:idx] + b"stco" + struct.pack(">II", 0, 0xFFFF) + single[idx + 12 :]
    parsed = codecs.parse_mp4(bad)
    assert parsed is not None and "chunk_offsets" not in parsed
    # frame sampling still works off mdat_offset (stsc confirms one chunk)
    assert codecs.sample_video_frames(bad, parsed, max_frames=3) == frames[:3]
    # MULTI-chunk file with its stco rejected but stsc surviving: the
    # contiguous path would slice gap padding into frames 5+ — must
    # refuse instead (callers take the stride fallback)
    mc_stco = b"stco" + struct.pack(">II", 0, 3)
    mcidx = mp4.index(mc_stco)
    mc_bad = mp4[:mcidx] + b"stco" + struct.pack(">II", 0, 0xFFFF) + mp4[mcidx + 12 :]
    mc_parsed = codecs.parse_mp4(mc_bad)
    assert mc_parsed is not None and "chunk_offsets" not in mc_parsed
    assert mc_parsed["sample_to_chunk"] == [(1, 4, 1), (3, 3, 1)]
    assert codecs.sample_video_frames(mc_bad, mc_parsed, max_frames=11) == []


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
