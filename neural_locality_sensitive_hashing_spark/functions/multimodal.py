"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schema, Arrow batch shape,
`mapInPandas` iterator signature, partition-preserving metadata extraction.
Decode is tiered per payload (functions/codecs.py):

    1. REAL stdlib decoders — pure-python PNG (zlib inflate + filter
       reconstruction) and PCM-16 WAV — tried first so PNG/WAV features
       are identical with or without optional libraries installed,
    2. PIL when importable (images in other formats),
    3. the deterministic `_fake_decode_*` stub for everything else
       (video container demux needs libav, absent here).

Which tier fired is observable in the ``decoder`` output column — the
fallback is never silent.

Media rows use the typed layout:
    media(media_id BIGINT, kind STRING, payload BINARY, meta STRING-json)
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 32

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("frame_count", LongType()),
        StructField("decoder", StringType()),
    ]
)


def _decode_features(payload: bytes, kind: str) -> tuple[np.ndarray, str]:
    """(feature, decoder-tag): real decode when the format allows, stub
    otherwise. Tags: 'pil' / 'real-png' / 'real-wav' / 'stub'."""
    from neural_locality_sensitive_hashing_spark.functions import codecs

    if kind == "image":
        px = codecs.decode_png_pixels(payload)
        if px is not None:
            return codecs.image_feature(px, FEATURE_DIM), "real-png"
        px = codecs.decode_image_pixels(payload)
        if px is not None:
            return codecs.image_feature(px, FEATURE_DIM), "pil"
    elif kind == "audio":
        dec = codecs.decode_wav_samples(payload)
        if dec is not None:
            return codecs.audio_feature(dec[0], dec[1], FEATURE_DIM), "real-wav"
    return _fake_decode_features(payload, kind), "stub"


def _fake_decode_features(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction.

    REAL DECODE NOT IMPLEMENTED in this sandbox (no PIL/libav): features
    are a seeded hash-expansion of the payload bytes — deterministic,
    shape-correct, and unique per payload, so downstream join/ANN plumbing
    is fully exercisable.
    """
    digest = hashlib.blake2b(payload, digest_size=8, key=kind.encode()[:16]).digest()
    rng = np.random.default_rng(int.from_bytes(digest, "little"))
    v = rng.standard_normal(FEATURE_DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _fake_frame_count(payload: bytes, kind: str) -> int:
    if kind == "video":
        return 1 + len(payload) // 4096  # "frame-sample" stub: 1 per 4 KiB
    return 1


def decode_media_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature, frame_count) via
    mapInPandas: per-partition Arrow batch iterator, binary payloads never
    shuffled (extraction happens where the bytes already live — the same
    narrow-before-shuffle rule as dropping `html` before the bucket join)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            frames = []
            decoders = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                f, tag = _decode_features(raw, kind)
                feats.append(f)
                decoders.append(tag)
                frames.append(_fake_frame_count(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                    "frame_count": frames,
                    "decoder": decoders,
                }
            )

    return media.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing: explode each video payload into frame rows
    (media_id, frame_idx, frame_feature). The frame decode is the same
    documented stub; the Spark side — explode shape, per-frame feature
    schema, payload locality — is real. Images/audio yield one frame."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload, kind in zip(pdf["media_id"], pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = _fake_frame_count(raw, kind)
                step = max(1, every_n_bytes)
                for fi in range(n_frames):
                    chunk = raw[fi * step : (fi + 1) * step]
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append(_fake_decode_features(chunk, kind))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_feature": feats})

    return media.mapInPandas(
        extract,
        "media_id long, frame_idx long, frame_feature array<float>",
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection without touching payload bytes (native
    json_tuple over the meta column; payload column pruned by Catalyst)."""
    return media.select(
        "media_id",
        "kind",
        F.get_json_object("meta", "$.width").cast("int").alias("width"),
        F.get_json_object("meta", "$.height").cast("int").alias("height"),
        F.get_json_object("meta", "$.codec").alias("codec"),
    )


def generate_media(spark, n: int, seed: int = 42, real_fraction: float = 0.5) -> DataFrame:
    """Deterministic synthetic media table for tests: ``real_fraction`` of
    image/audio rows carry REAL payloads (valid PNG / PCM-16 WAV built by
    the codecs module's encoders) so the real decode tier is exercised;
    the rest are opaque random bytes that exercise the stub tier."""
    from neural_locality_sensitive_hashing_spark.functions.codecs import (
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[int(rng.integers(0, 3))]
        if kind != "video" and rng.random() < real_fraction:
            if kind == "image":
                h, w, ch = int(rng.integers(4, 24)), int(rng.integers(4, 24)), 3
                payload = encode_png(rng.integers(0, 256, (h, w, ch), dtype=np.uint8))
            else:
                samples = rng.standard_normal((int(rng.integers(64, 2048)), 1)) * 0.2
                payload = encode_wav(samples, rate=8000)
        else:
            payload = rng.bytes(int(rng.integers(64, 16384)))
        meta = json.dumps(
            {"width": int(rng.integers(16, 4096)), "height": int(rng.integers(16, 4096)),
             "codec": kind[:3]}
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
