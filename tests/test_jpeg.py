"""Pure-python baseline JPEG codec (functions/jpeg.py): roundtrip
accuracy, header parsing, mode rejection, and decode totality (any byte
string -> ndarray or None, never an exception)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_locality_sensitive_hashing_spark.functions.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
    parse_jpeg_header,
)


def _gradient(h: int, w: int, ch: int = 3) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    planes = [
        ((x * 255) // max(w - 1, 1)),
        ((y * 255) // max(h - 1, 1)),
        ((x + y) * 255 // max(h + w - 2, 1)),
    ]
    return np.stack(planes[:ch], axis=-1).astype(np.uint8)


def test_flat_image_exact():
    """A constant image is exactly representable (DC-only blocks): the
    roundtrip must be bit-exact at any quality/subsampling."""
    for sub in ("444", "422", "420"):
        for val in (0, 128, 255, 37):
            px = np.full((16, 24, 3), val, dtype=np.uint8)
            out = decode_jpeg_pixels(encode_jpeg(px, quality=75, subsampling=sub))
            assert out is not None and out.shape == px.shape
            assert (out == px).all(), (sub, val)


def _chroma_subsampled_reference(px: np.ndarray, sy: int, sx: int) -> np.ndarray:
    """What a perfect (DCT-lossless) chroma-subsampled pipeline would
    return: YCbCr, (sy x sx)-box-averaged chroma, nearest upsample, back
    to RGB. Comparing the decode against THIS isolates codec error from
    the intrinsic subsampling loss (steep gradients lose
    ~chroma-step/2 by design)."""
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = y.shape
    ph, pw = -(-h // sy) * sy, -(-w // sx) * sx
    out = []
    for c in (cb, cr):
        pad = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
        ds = pad.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        out.append(np.repeat(np.repeat(ds, sy, 0), sx, 1)[:h, :w])
    cb, cr = out[0] - 128.0, out[1] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


_SUB_FACTORS = {"444": (1, 1), "422": (1, 2), "420": (2, 2)}


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("size", [(8, 8), (16, 16), (17, 23), (40, 56)])
def test_gradient_roundtrip_accuracy(sub, size):
    """Smooth gradients survive q92 with small per-pixel error — this is
    a lossy codec, so the bound is tolerance, not equality. Non-multiple-
    of-MCU sizes exercise edge-block padding. Subsampled decodes are
    compared against a numpy-subsampled reference so the bound measures
    CODEC error, not the intrinsic chroma-subsampling loss."""
    h, w = size
    px = _gradient(h, w)
    out = decode_jpeg_pixels(encode_jpeg(px, quality=92, subsampling=sub))
    assert out is not None and out.shape == (h, w, 3)
    sy, sx = _SUB_FACTORS[sub]
    ref = px if sub == "444" else _chroma_subsampled_reference(px, sy, sx)
    err = np.abs(out.astype(int) - ref.astype(int)).max()
    assert err <= (6 if sub == "444" else 10), (sub, size, err)


def test_grayscale_roundtrip():
    px = _gradient(24, 16, ch=1)
    blob = encode_jpeg(px, quality=92)
    hdr = parse_jpeg_header(blob)
    assert hdr["components"] == 1 and hdr["baseline"]
    out = decode_jpeg_pixels(blob)
    assert out is not None and out.shape == (24, 16, 1)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 6


def test_restart_markers():
    """DRI/RSTn every few MCUs: the decoder's restart path (bit-stream
    realignment + DC predictor reset) must reproduce the no-DRI result."""
    px = _gradient(32, 48)
    plain = decode_jpeg_pixels(encode_jpeg(px, quality=90))
    with_dri = decode_jpeg_pixels(encode_jpeg(px, quality=90, restart_interval=3))
    assert plain is not None and with_dri is not None
    assert (plain == with_dri).all()


def test_header_parse_fields():
    px = _gradient(19, 31)
    hdr = parse_jpeg_header(encode_jpeg(px, quality=80, subsampling="420"))
    assert hdr == {
        "width": 31,
        "height": 19,
        "components": 3,
        "bit_depth": 8,
        "progressive": False,
        "baseline": True,
    }
    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # no SOF


def test_unsupported_modes_return_none_not_wrong_pixels():
    """Progressive (SOF2) is outside the baseline subset: the decoder
    must refuse (None) so the caller's stub tier stays observable —
    never a silent wrong decode. Header parse still reports it."""
    blob = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    # rewrite the SOF0 marker (FF C0) to SOF2 (FF C2)
    idx = bytes(blob).index(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    hdr = parse_jpeg_header(bytes(blob))
    assert hdr is not None and hdr["progressive"]
    assert decode_jpeg_pixels(bytes(blob)) is None
    # 12-bit precision: refused likewise
    blob12 = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    i12 = bytes(blob12).index(b"\xff\xc0")
    blob12[i12 + 4] = 12  # precision byte of the SOF body
    assert decode_jpeg_pixels(bytes(blob12)) is None


def test_hostile_sof_dims_refused_before_allocation():
    """SOF height/width are attacker bytes, and coefficient arrays are
    sized from them before any entropy data is read: a 65535x65535
    header over a tiny scan would commit ~34 GB and OOM-kill the
    executor before MemoryError is catchable. The decoder must refuse
    (None) via the _MAX_BLOCKS pre-allocation cap — same discipline as
    warc.py's _MAX_HEADER/_MAX_RECORD — and do so instantly."""
    import time

    blob = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    idx = bytes(blob).index(b"\xff\xc0")
    # SOF0 body: marker(2) len(2) precision(1) h(2) w(2) ...
    blob[idx + 5 : idx + 9] = b"\xff\xff\xff\xff"  # h = w = 65535
    t0 = time.monotonic()
    assert decode_jpeg_pixels(bytes(blob)) is None
    assert time.monotonic() - t0 < 1.0  # refused at the header, not after
    # just-over-the-cap is refused; the legitimate tier stays decodable
    from neural_locality_sensitive_hashing_spark.functions.jpeg import _MAX_BLOCKS

    side = int((_MAX_BLOCKS // 3) ** 0.5) * 8 + 8  # 3 comps at 4:4:4
    over = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    i2 = bytes(over).index(b"\xff\xc0")
    over[i2 + 5 : i2 + 7] = side.to_bytes(2, "big")
    over[i2 + 7 : i2 + 9] = side.to_bytes(2, "big")
    assert decode_jpeg_pixels(bytes(over)) is None


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4, 1), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), subsampling="411")


def test_determinism():
    px = _gradient(24, 24)
    assert encode_jpeg(px, quality=85) == encode_jpeg(px, quality=85)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_decode_total_on_arbitrary_bytes(payload):
    """Totality: decode of ANY byte string returns ndarray or None."""
    out = decode_jpeg_pixels(payload)
    assert out is None or isinstance(out, np.ndarray)
    hdr = parse_jpeg_header(payload)
    assert hdr is None or isinstance(hdr, dict)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300), st.integers(0, 290))
def test_decode_total_on_corrupted_real_jpeg(tail, cut):
    """Truncations/splices of a REAL jpeg hit the deep decode paths (huffman
    tables parsed, entropy stream mangled) — still ndarray or None."""
    base = encode_jpeg(_gradient(16, 16), quality=70)
    mangled = base[: min(cut, len(base))] + tail
    out = decode_jpeg_pixels(mangled)
    assert out is None or isinstance(out, np.ndarray)


def test_bitreader_accumulator_stays_bounded():
    """The entropy bit-reader must truncate its accumulator to the
    unconsumed bits after every read (as the writer does): without the
    mask, acc grows with every byte consumed and each shift costs
    O(stream-length), which made decode quadratic in entropy-stream size
    (measured 4.2 -> 101 us/byte from 8 KB to 132 KB before the fix)."""
    from neural_locality_sensitive_hashing_spark.functions.jpeg import _BitReader

    rng = np.random.default_rng(3)
    buf = bytes(b if b != 0xFF else 0xFE for b in rng.bytes(4096))
    r = _BitReader(buf, 0)
    for i in range(3000):
        k = 1 + (i % 11)
        got = r.bits(k)
        assert 0 <= got < (1 << k)
        assert r.acc.bit_length() <= r.n, (i, r.acc, r.n)
