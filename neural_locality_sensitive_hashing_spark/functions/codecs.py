"""Real (library-free) media codecs for the multimodal columns.

The sandbox ships no PIL/libav, but PNG, baseline JPEG, and WAV are
decodable library-free — zlib inflate + filter reconstruction for PNG,
the pure-numpy T.81 baseline codec in functions/jpeg.py, RIFF chunk
walk + PCM frombuffer for WAV — so those formats get REAL decode paths;
PIL is tried first when present (`decode_image_pixels`). MP4 / ISO-BMFF
containers are parsed for real too (`parse_mp4`: box walk collecting
mvhd/tkhd/stsd/stsz/stco; `sample_video_frames`: exact frame byte
slices at the container's own boundaries), and MJPEG frames inside them
decode for real via the JPEG path; only NON-JPEG per-frame video codec
decode (h264/vp9) remains stubbed in functions/multimodal.py.

All functions are deterministic and None-safe: unrecognized payloads
return None and the caller falls back to the stub featureizer (tagged so
the fallback is observable, never silent).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from neural_locality_sensitive_hashing_spark.functions.jpeg import (  # noqa: F401
    decode_jpeg_pixels,
    encode_jpeg,
    parse_jpeg_header,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba


def parse_png_header(payload: bytes) -> dict | None:
    """IHDR fields of a PNG payload, or None if not a PNG."""
    if len(payload) < 33 or not payload.startswith(PNG_SIG):
        return None
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color,
        "channels": _PNG_CHANNELS.get(color),
        "interlaced": bool(interlace),
        "compression": comp,
        "filter_method": filt,
    }


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            break


def _unfilter_png(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-row filters (0=None 1=Sub 2=Up 3=Average 4=Paeth)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png_pixels(payload: bytes) -> np.ndarray | None:
    """(h, w, channels) uint8 pixels of an 8-bit non-interlaced PNG —
    a REAL decode (zlib inflate + filter reconstruction), stdlib only.
    Returns None for non-PNG or unsupported variants (16-bit, palette,
    interlaced)."""
    hdr = parse_png_header(payload)
    if (
        hdr is None
        or hdr["bit_depth"] != 8
        or hdr["channels"] is None
        or hdr["interlaced"]
    ):
        return None
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    if not idat:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    return _unfilter_png(raw, h, stride, ch).reshape(h, w, ch)


def decode_image_pixels(payload: bytes) -> np.ndarray | None:
    """Best-available image decode: PIL when importable (any format),
    else the pure-python PNG / baseline-JPEG paths."""
    try:  # optional dependency — absent in this sandbox
        import io

        from PIL import Image  # type: ignore

        with Image.open(io.BytesIO(payload)) as im:
            arr = np.asarray(im.convert("RGBA") if im.mode == "P" else im)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    except Exception:  # noqa: BLE001 — no PIL or not an image it knows
        px = decode_png_pixels(payload)
        return px if px is not None else decode_jpeg_pixels(payload)


def parse_wav_header(payload: bytes) -> dict | None:
    """fmt-chunk fields + data size of a RIFF/WAVE payload, or None."""
    if len(payload) < 44 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt: dict | None = None
    data_size = None
    data_off = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt " and size >= 16:
            audio_fmt, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = {
                "audio_format": audio_fmt,
                "channels": ch,
                "sample_rate": rate,
                "bits_per_sample": bits,
            }
        elif cid == b"data":
            data_size = size
            data_off = pos + 8
        pos += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        return None
    bytes_per_frame = fmt["channels"] * fmt["bits_per_sample"] // 8
    fmt["data_offset"] = data_off
    fmt["data_size"] = data_size
    fmt["n_frames"] = data_size // bytes_per_frame if bytes_per_frame else 0
    return fmt


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int] | None:
    """(samples float64 in [-1, 1] shaped (n, channels), sample_rate) of a
    PCM 16-bit WAV — a REAL decode. None for non-WAV / non-PCM16."""
    hdr = parse_wav_header(payload)
    if hdr is None or hdr["audio_format"] != 1 or hdr["bits_per_sample"] != 16:
        return None
    off, size, ch = hdr["data_offset"], hdr["data_size"], hdr["channels"]
    n = min(size, len(payload) - off) // 2
    pcm = np.frombuffer(payload, dtype="<i2", count=n, offset=off)
    n_frames = len(pcm) // ch
    return (
        pcm[: n_frames * ch].reshape(n_frames, ch).astype(np.float64) / 32768.0,
        hdr["sample_rate"],
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal 8-bit non-interlaced PNG encoder (filter 0 rows) — the
    inverse of decode_png_pixels, for deterministic test/datagen media."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal PCM-16 WAV encoder — inverse of decode_wav_samples."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(s * 32768.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    ch = s.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container parsing (pure struct walk — no codec decode)
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in buf[start:end]."""
    off = start
    while off + 8 <= end:
        size, btype = struct.unpack(">I4s", buf[off : off + 8])
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[off + 8 : off + 16])
            body = off + 16
        elif size == 0:  # to end of file
            size = end - off
        if size < 8 or off + size > end:
            return
        yield btype, body, off + size
        off += size


def parse_mp4(payload: bytes) -> dict | None:
    """Container-level metadata of an ISO-BMFF (MP4) payload, or None.

    A real box walk — ftyp gate, then moov/trak/mdia/minf/stbl descent
    collecting mvhd (timescale, duration), tkhd (width, height), stsd
    (sample-entry fourcc), stsz (per-frame sizes — the TRUE frame count),
    and stco/co64 (chunk offsets). Codec decode of the frames themselves
    is out of scope (no libav in-sandbox); everything the CONTAINER
    carries is parsed for real."""
    if len(payload) < 16:
        return None
    head = list(_mp4_boxes(payload, 0, len(payload)))
    if not head or head[0][0] != b"ftyp":
        return None
    info: dict = {"brand": payload[head[0][1] : head[0][1] + 4].decode("ascii", "replace")}

    def walk(start: int, end: int) -> None:
        for btype, b0, b1 in _mp4_boxes(payload, start, end):
            if btype in _MP4_CONTAINERS:
                walk(b0, b1)
            elif btype == b"mvhd" and b1 - b0 >= 20:
                ver = payload[b0]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", payload[b0 + 20 : b0 + 32])
                else:
                    ts, dur = struct.unpack(">II", payload[b0 + 12 : b0 + 20])
                info["timescale"] = ts
                info["duration_sec"] = round(dur / ts, 6) if ts else 0.0
            elif btype == b"tkhd" and b1 - b0 >= 84:
                w16, h16 = struct.unpack(">II", payload[b1 - 8 : b1])
                info["width"], info["height"] = w16 >> 16, h16 >> 16
            elif btype == b"stsd" and b1 - b0 >= 16:
                # body: version/flags(4) + entry_count(4) + entry size(4) + fourcc(4)
                info["codec"] = payload[b0 + 12 : b0 + 16].decode("ascii", "replace")
            elif btype == b"stsz" and b1 - b0 >= 12:
                uniform, count = struct.unpack(">II", payload[b0 + 4 : b0 + 12])
                # bound the declared count by what the payload can hold:
                # frames live in this same buffer, so count x size (or the
                # 4-byte size entries) can never exceed it — rejects a
                # crafted count=0xFFFFFFFF that would materialize a
                # multi-GB list from a 60-byte payload
                if uniform:
                    if count == 0 or uniform * count > len(payload):
                        continue
                    info["frame_sizes"] = [uniform] * count
                else:
                    if b0 + 12 + 4 * count > b1:
                        continue
                    info["frame_sizes"] = list(
                        struct.unpack(f">{count}I", payload[b0 + 12 : b0 + 12 + 4 * count])
                    )
                info["frame_count"] = count
            elif btype == b"stco" and b1 - b0 >= 8:
                (n,) = struct.unpack(">I", payload[b0 + 4 : b0 + 8])
                # bound the declared entry count by the box end, like stsz:
                # an over-declared count would otherwise read the following
                # boxes' bytes as chunk offsets (silently wrong frame
                # slices) or raise past the payload end, voiding the parse
                if b0 + 8 + 4 * n > b1:
                    continue
                info["chunk_offsets"] = list(
                    struct.unpack(f">{n}I", payload[b0 + 8 : b0 + 8 + 4 * n])
                )
            elif btype == b"co64" and b1 - b0 >= 8:
                (n,) = struct.unpack(">I", payload[b0 + 4 : b0 + 8])
                if b0 + 8 + 8 * n > b1:
                    continue
                info["chunk_offsets"] = list(
                    struct.unpack(f">{n}Q", payload[b0 + 8 : b0 + 8 + 8 * n])
                )
            elif btype == b"stsc" and b1 - b0 >= 8:
                (n,) = struct.unpack(">I", payload[b0 + 4 : b0 + 8])
                if b0 + 8 + 12 * n > b1:
                    continue
                # entries: (first_chunk 1-based, samples_per_chunk, sdi)
                info["sample_to_chunk"] = [
                    struct.unpack(
                        ">III", payload[b0 + 8 + 12 * i : b0 + 20 + 12 * i]
                    )
                    for i in range(n)
                ]
            elif btype == b"mdat":
                info["mdat_offset"], info["mdat_end"] = b0, b1

    try:
        for btype, b0, b1 in head:
            if btype == b"moov":
                walk(b0, b1)
            elif btype == b"mdat":
                info["mdat_offset"], info["mdat_end"] = b0, b1
    except struct.error:
        return None
    # honor the "or None" contract: an ftyp with no usable sample table
    # is not a parsed video (callers may truthiness-test the result)
    return info if "frame_count" in info else None


def sample_video_frames(
    payload: bytes, info: dict, max_frames: int = 8
) -> list[bytes]:
    """Evenly-spaced frame SAMPLES as raw byte slices, located via the
    container's own sample tables. Single-chunk files (our encoder's
    default, and faststart MP4s) walk stsz sizes from the one chunk
    offset; multi-chunk files walk stsc/stco PER CHUNK — each chunk's
    frames start at that chunk's own offset, so non-contiguous mdat
    layouts slice correctly. A multi-chunk stco without a usable stsc
    (or an stsc that does not cover every sample) returns [] so callers
    take their stride fallback instead of silently slicing wrong bytes.
    This is the real frame-sampling half of the video pipeline; only the
    codec decode of each frame's bytes remains stubbed."""
    sizes = info.get("frame_sizes")
    if not sizes:
        return []
    chunk_offsets = info.get("chunk_offsets")
    if chunk_offsets and len(chunk_offsets) > 1:
        stc = info.get("sample_to_chunk")
        if not stc:
            return []
        offsets: list[int] = []
        si = 0
        for ci in range(len(chunk_offsets)):
            spc = 0  # samples in this chunk: last stsc entry with first_chunk <= ci+1
            for first, per, _sdi in stc:
                if first <= ci + 1:
                    spc = per
                else:
                    break
            base = chunk_offsets[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                offsets.append(base)
                base += sizes[si]
                si += 1
        if si < len(sizes):
            return []  # stsc/stco don't cover every sample: inconsistent container
    else:
        # contiguous-from-one-offset path: only valid when the sample
        # tables don't contradict it. If stsc says the FIRST chunk holds
        # fewer than all samples (multi-chunk layout) while stco was
        # missing or rejected (e.g. the over-declared-count guard), a
        # contiguous walk would silently slice inter-chunk bytes into
        # frames — refuse so callers take their stride fallback.
        stc = info.get("sample_to_chunk")
        if stc and (len(stc) > 1 or stc[0][1] < len(sizes)):
            return []
        base = (chunk_offsets or [info.get("mdat_offset", 0)])[0]
        offsets = [base]
        for s in sizes[:-1]:
            offsets.append(offsets[-1] + s)
    n = len(sizes)
    idx = sorted({int(i * (n - 1) / max(1, max_frames - 1)) for i in range(min(max_frames, n))})
    out = []
    for i in idx:
        lo, hi = offsets[i], offsets[i] + sizes[i]
        if hi <= len(payload):
            out.append(payload[lo:hi])
    return out


def encode_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    frames_per_chunk: int | None = None,
    chunk_gap: int = 0,
) -> bytes:
    """Minimal structurally-valid ISO-BMFF writer (ftyp + moov with one
    raw-fourcc video track + mdat) — the deterministic test / datagen
    inverse of parse_mp4 / sample_video_frames.

    Default layout is one chunk of contiguous frames. ``frames_per_chunk``
    writes a MULTI-CHUNK stsc/stco layout; ``chunk_gap`` inserts padding
    bytes between chunks inside mdat, producing the non-contiguous layout
    that exercises sample_video_frames' per-chunk stsc walk (a
    first-offset-only reader slices garbage on such files)."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(body), btype) + body

    n = len(frames)
    timescale = fps
    # max(..., 1) keeps range()'s step nonzero for an empty frame list —
    # a zero-frame container is still structurally valid (stsz count 0)
    fpc = frames_per_chunk if frames_per_chunk else max(n, 1)
    # chunk layout: list of per-chunk frame counts + relative chunk starts
    chunk_counts = [min(fpc, n - i) for i in range(0, n, fpc)] or [0]
    frame_iter = iter(frames)
    chunks = [[next(frame_iter) for _ in range(c)] for c in chunk_counts]
    rel_offsets = []
    pos = 0
    for ch in chunks:
        rel_offsets.append(pos)
        pos += sum(len(f) for f in ch) + chunk_gap
    mdat_body = (b"\x00" * chunk_gap).join(b"".join(ch) for ch in chunks)
    mvhd = box(b"mvhd", b"\x00" + b"\x00" * 11 + struct.pack(">II", timescale, n) + b"\x00" * 80)
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 16 + b"\x00" * 56
        + struct.pack(">II", width << 16, height << 16),
    )
    # sample entry: size(4) + fourcc(4) + reserved(6) + data_ref_index(2)
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + struct.pack(">I4s", 16, b"raw ") + b"\x00" * 8)
    stts = box(b"stts", struct.pack(">IIII", 0, 1, n, 1))
    # stsc run-length: one entry per change in samples-per-chunk
    stsc_entries = []
    for ci, c in enumerate(chunk_counts):
        if not stsc_entries or stsc_entries[-1][1] != c:
            stsc_entries.append((ci + 1, c))
    stsc = box(
        b"stsc",
        struct.pack(">II", 0, len(stsc_entries))
        + b"".join(struct.pack(">III", first, c, 1) for first, c in stsc_entries),
    )
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames))
    # stco needs the absolute mdat body offset: compute sizes bottom-up
    # with a placeholder, then rewrite (single pass, fixed layout)
    def assemble(mdat_body_off: int) -> bytes:
        stco = box(
            b"stco",
            struct.pack(">II", 0, len(rel_offsets))
            + b"".join(struct.pack(">I", mdat_body_off + r) for r in rel_offsets),
        )
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdhd = box(b"mdhd", b"\x00" * 12 + struct.pack(">II", timescale, n) + b"\x00" * 4)
        hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return moov

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    moov = assemble(0)
    mdat_body_off = len(ftyp) + len(moov) + 8
    moov = assemble(mdat_body_off)  # same length: placeholder only changed value
    mdat = box(b"mdat", mdat_body)
    return ftyp + moov + mdat


def image_feature(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature from decoded pixels: per-channel moments +
    16-bin gray histogram + 4x4 downsampled gray thumbnail, L2-normalized."""
    px = pixels.astype(np.float64)
    gray = px[:, :, : min(3, px.shape[2])].mean(axis=2)
    chans = px.reshape(-1, px.shape[2])
    mom = np.concatenate([chans.mean(axis=0)[:4], chans.std(axis=0)[:4]])
    mom = np.pad(mom, (0, 8 - len(mom)))
    hist, _ = np.histogram(gray, bins=16, range=(0, 255))
    hist = hist / max(gray.size, 1)
    h, w = gray.shape
    ys = np.linspace(0, h, 5, dtype=int)
    xs = np.linspace(0, w, 5, dtype=int)
    thumb = np.array(
        [
            gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(4)
            for j in range(4)
        ]
    ) / 255.0
    v = np.concatenate([mom / 255.0, hist, thumb])[:dim]
    v = np.pad(v, (0, dim - len(v)))
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def audio_feature(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Deterministic feature from PCM: RMS, zero-crossing rate, peak,
    mean + 12 log-spaced FFT band magnitudes + channel count, padded."""
    mono = samples.mean(axis=1)
    if len(mono) == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt((mono**2).mean()))
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono[: 1 << 14]))
    edges = np.unique(
        np.geomspace(1, max(len(spec) - 1, 2), 13).astype(int)
    )
    bands = np.array(
        [spec[edges[i] : edges[i + 1]].mean() if edges[i] < edges[i + 1] else 0.0
         for i in range(len(edges) - 1)]
    )
    bands = bands / (bands.max() + 1e-12)
    v = np.concatenate(
        [[rms, zcr, float(np.abs(mono).max()), float(mono.mean()),
          samples.shape[1] / 8.0, min(rate, 96000) / 96000.0], bands]
    )[:dim]
    v = np.pad(v, (0, dim - len(v)))
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)
