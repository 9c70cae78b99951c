"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas iterators.

The IMAGE decode path is REAL (pure stdlib, no PIL needed):

* ``parse_image_header`` reads width/height/format from magic bytes for
  PNG (IHDR), JPEG (SOF marker walk), GIF and BMP.
* ``decode_png_gray`` fully decodes 8-bit grayscale PNGs: chunk walk,
  zlib-inflate of the concatenated IDAT stream, and scanline
  un-filtering for all five PNG filter types (None/Sub/Up/Average/
  Paeth).
* ``synthetic_media`` fabricates deterministic real PNG payloads (the
  container has no media files), so decode is exercised end-to-end:
  the encoder writes dimensions into the PNG, the decoder must parse
  them back out, and the pixel gradient round-trips bit-exact.

* ``decode_wav`` fully decodes RIFF/WAVE PCM audio (stdlib wave
  module): sample rate, channels, samples, duration — features are a
  real per-segment RMS energy profile of the decoded waveform.
* ``parse_mp4_duration`` walks MP4 boxes to moov/mvhd for container
  duration; ``encode_minimal_mp4`` fabricates valid containers.

VIDEO FRAME extraction is REAL for animated GIF (``encode_gif_anim`` /
``decode_gif_frames``: a full GIF-LZW codec with variable code width,
dictionary growth, CLEAR resets and the KwKwK case; ``frame_pixels``
addresses frames on the accumulated-delay timeline). The remaining
boundary is CODEC-compressed tracks only (H.264/VP9 in MP4/WebM),
which need libav/ffmpeg — not shipped in this container.

Reference parity: the reference has no media pipeline; this module is
the training-data-pipeline extension requested by the build brief.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("content", T.BinaryType()),     # opaque payload
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),      # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# Header parsing (magic bytes -> format/width/height), pure stdlib
# ---------------------------------------------------------------------------

def parse_image_header(content: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Return (format, width, height) parsed from the payload's magic
    bytes, or (None, None, None) if the format is not recognized."""
    if not content or len(content) < 10:
        return (None, None, None)
    # PNG: 8-byte magic, then IHDR chunk: len(4) 'IHDR'(4) W(4) H(4) ...
    if content[:8] == _PNG_MAGIC and len(content) >= 24 and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        return ("png", w, h)
    # JPEG: SOI then marker segments; dims live in the first SOF marker.
    if content[:2] == b"\xff\xd8":
        i = 2
        n = len(content)
        while i + 4 <= n:
            if content[i] != 0xFF:
                i += 1
                continue
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            if i + 4 > n:
                break
            seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
            # SOF0..SOF15 minus DHT(C4)/DAC(CC)/JPG(C8)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", content[i + 5:i + 9])
                    return ("jpeg", w, h)
                break
            i += 2 + seg_len
        return ("jpeg", None, None)
    # GIF: 6-byte signature then little-endian u16 logical screen dims.
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return ("gif", w, h)
    # BMP: 'BM', dims at offsets 18/22 (BITMAPINFOHEADER, little-endian i32).
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return ("bmp", w, abs(h))
    return (None, None, None)


# ---------------------------------------------------------------------------
# Minimal PNG codec for 8-bit grayscale (encode + full pixel decode)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, pixel_fn) -> bytes:
    """Encode an 8-bit grayscale PNG; ``pixel_fn(x, y) -> 0..255``."""
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None per scanline
        for x in range(width):
            raw.append(pixel_fn(x, y) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(content: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale PNG to (width, height, pixels) where
    pixels is row-major bytes. Supports all five scanline filters."""
    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    width = height = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(content):
        (length,) = struct.unpack(">I", content[i:i + 4])
        tag = content[i + 4:i + 8]
        data = content[i + 8:i + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
            if bit_depth != 8 or color_type != 0:
                raise ValueError("only 8-bit grayscale PNGs are supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width  # bytes per scanline, bpp=1
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(1, stride):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * width:(y + 1) * width] = line
        prev = bytes(line)
    return (width, height, bytes(out))


# ---------------------------------------------------------------------------
# WAV (PCM) codec and MP4 duration parse — pure stdlib
# ---------------------------------------------------------------------------

def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Mono 16-bit PCM WAV from integer samples (range -32768..32767)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[int, int, list[int], int]:
    """Real audio decode (RIFF/WAVE via the stdlib wave module):
    returns (sample_rate, n_channels, samples, duration_ms)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    duration_ms = nframes * 1000 // max(rate, 1)
    return (rate, nch, samples, duration_ms)


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def encode_minimal_mp4(duration_ms: int) -> bytes:
    """Minimal valid MP4 container: ftyp + moov(mvhd) with timescale
    1000 so mvhd duration IS milliseconds. Carries no media track —
    enough structure for metadata parity; frame payloads would live in
    mdat."""
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1000, duration_ms) + b"\x00" * 80,
    )
    return ftyp + _mp4_box(b"moov", mvhd)


def parse_mp4_duration(content: bytes) -> int | None:
    """Walk top-level MP4 boxes to moov/mvhd; duration in ms (version-0
    mvhd: timescale u32 + duration u32 at offset 12 into the payload)."""
    i = 0
    while i + 8 <= len(content):
        (size,) = struct.unpack(">I", content[i:i + 4])
        tag = content[i + 4:i + 8]
        if size < 8:
            return None
        if tag == b"moov":
            j = i + 8
            end = i + size
            while j + 8 <= end:
                (bsize,) = struct.unpack(">I", content[j:j + 4])
                if content[j + 4:j + 8] == b"mvhd" and bsize >= 28:
                    timescale, duration = struct.unpack(
                        ">II", content[j + 20:j + 28])
                    return duration * 1000 // max(timescale, 1)
                j += max(bsize, 8)
            return None
        i += size
    return None


# ---------------------------------------------------------------------------
# Animated GIF codec (pure stdlib: LZW encode/decode) — REAL video-frame
# extraction for the one moving-picture format that needs no codec libs
# ---------------------------------------------------------------------------

def encode_gif_anim(width: int, height: int, frames: list[bytes],
                    delay_cs: int = 10) -> bytes:
    """Minimal GIF89a animation: grayscale 256-entry palette, one
    Graphic Control Extension (delay in centiseconds) per frame, and a
    valid LZW stream per frame (9-bit literal codes with a CLEAR before
    every 254 pixels, so the dictionary never grows — simplest legal
    encoder, any decoder accepts it)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    for v in range(256):
        out += bytes((v, v, v))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for px in frames:
        assert len(px) == width * height
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += bytes([8])  # LZW minimum code size
        # bitstream of 9-bit codes, LSB first
        bits = bytearray()
        acc = n_acc = 0

        def emit(code: int):
            nonlocal acc, n_acc
            acc |= code << n_acc
            n_acc += 9
            while n_acc >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                n_acc -= 8

        CLEAR, END = 256, 257
        emit(CLEAR)
        for i, b in enumerate(px):
            if i and i % 254 == 0:
                emit(CLEAR)  # keep the decoder's table (and width) fixed
            emit(b)
        emit(END)
        if n_acc:
            bits.append(acc & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(content: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Full animated-GIF decode (general LZW with dictionary growth and
    variable code width, not just the subset our encoder emits).
    Returns (width, height, [(delay_ms, pixels)])."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", content[6:10])
    flags = content[10]
    i = 13
    if flags & 0x80:
        i += 3 * (2 << (flags & 0x07))  # skip global color table
    delay_ms = 0
    frames: list[tuple[int, bytes]] = []
    while i < len(content):
        b0 = content[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = content[i + 1]
            i += 2
            if label == 0xF9 and content[i] >= 4:
                delay_ms = struct.unpack("<H", content[i + 2:i + 4])[0] * 10
            while content[i]:  # data sub-blocks
                i += 1 + content[i]
            i += 1
            continue
        if b0 == 0x2C:  # image descriptor
            fflags = content[i + 9]
            i += 10
            if fflags & 0x80:
                i += 3 * (2 << (fflags & 0x07))  # local color table
            min_code = content[i]
            i += 1
            data = bytearray()
            while content[i]:
                ln = content[i]
                data += content[i + 1:i + 1 + ln]
                i += 1 + ln
            i += 1
            frames.append((delay_ms, _lzw_decode(bytes(data), min_code)))
            continue
        raise ValueError(f"unknown GIF block 0x{b0:02x} at {i}")
    return w, h, frames


def _lzw_decode(data: bytes, min_code: int) -> bytes:
    """General GIF LZW: variable code width, dictionary growth, CLEAR
    resets, KwKwK case."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = {c: bytes([c]) for c in range(1 << min_code)}

    def reset():
        return dict(base), end + 1, min_code + 1

    table, next_code, width = reset()
    out = bytearray()
    acc = n_acc = pos = 0
    prev: bytes | None = None
    while True:
        while n_acc < width:
            if pos >= len(data):
                return bytes(out)
            acc |= data[pos] << n_acc
            n_acc += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def frame_pixels(content: bytes, frame_ts_ms: int) -> bytes:
    """Video FRAME decode. REAL for animated GIF (the full LZW codec
    above): returns the pixel bytes of the frame covering
    ``frame_ts_ms`` on the accumulated-delay timeline (last frame for
    timestamps past the end). Codec-compressed tracks (H.264/VP9 in
    MP4/WebM) still need libav/ffmpeg, which this container does not
    ship — that boundary is now codec formats only, not 'video'."""
    if content[:6] in (b"GIF87a", b"GIF89a"):
        _w, _h, frames = decode_gif_frames(content)
        if not frames:
            raise ValueError("GIF has no frames")
        t = 0
        for delay_ms, px in frames:
            t += max(delay_ms, 10)
            if frame_ts_ms < t:
                return px
        return frames[-1][1]
    raise NotImplementedError(
        "frame decode for codec-compressed video (e.g. H.264 in MP4) "
        "requires codec libraries not present in this container")


# ---------------------------------------------------------------------------
# Feature extraction over binary media columns
# ---------------------------------------------------------------------------

def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a learned encoder: byte histogram
    moments over the raw payload (no decode)."""
    if content is None:
        return [0.0] * dim
    acc = [0.0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b / 255.0
    n = max(len(content), 1)
    return [round(x / n, 6) for x in acc]


def _pixel_histogram(pixels: bytes, dim: int) -> list[float]:
    """Normalized ``dim``-bin intensity histogram over decoded pixels —
    a real feature of the real decoded image."""
    bins = [0] * dim
    for p in pixels:
        bins[p * dim // 256] += 1
    n = max(len(pixels), 1)
    return [round(b / n, 6) for b in bins]


def _rms_profile(samples: list[int], dim: int) -> list[float]:
    """Per-segment RMS energy over decoded PCM samples, normalized by
    full scale — a real feature of the real decoded waveform."""
    n = len(samples)
    if n == 0:
        return [0.0] * dim
    out = []
    for k in range(dim):
        seg = samples[k * n // dim:(k + 1) * n // dim] or [0]
        ms = sum(s * s for s in seg) / len(seg)
        out.append(round((ms ** 0.5) / 32768.0, 6))
    return out


def extract_features(
    media: DataFrame, decode_fn: str = "real", dim: int = 8, batch_size: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns. The
    Arrow batch shape (iterator of pdf chunks) is exactly what a real
    GPU-encoder stage needs: batch the payloads, run the decoder once
    per chunk, emit fixed-size vectors.

    decode_fn="real" decodes per modality, all pure stdlib:
      image — PNG/JPEG/GIF/BMP header parse; grayscale PNG pixels fully
        decoded, features = intensity histogram;
      audio — RIFF/WAVE PCM fully decoded (wave module), features =
        per-segment RMS energy profile, duration from the frame count;
      video — container metadata (MP4 mvhd duration) parsed; FRAME
        pixel decode is the one remaining stub (frame_pixels) — no
        codec libraries in this container; features fall back to byte
        moments.
    decode_fn="fake": byte-level moments, no decode (any payload kind).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights, durs, feats = [], [], [], [], []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                fmt = w = h = dur = None
                if decode_fn == "real" and kind == "audio":
                    rate, nch, samples, dur = decode_wav(content)
                    fmt = "wav"
                    feats.append(_rms_profile(samples, dim))
                elif decode_fn == "real" and kind == "video":
                    dur = parse_mp4_duration(content)
                    fmt = "mp4" if dur is not None else None
                    feats.append(_fake_features(content, dim))
                elif decode_fn == "real":
                    fmt, w, h = parse_image_header(content)
                    if fmt == "png":
                        dw, dh, pixels = decode_png_gray(content)
                        feats.append(_pixel_histogram(pixels, dim))
                        w, h = dw, dh
                    elif fmt == "gif":
                        # real pixels for GIFs too (first frame)
                        dw, dh, gframes = decode_gif_frames(bytes(content))
                        feats.append(_pixel_histogram(gframes[0][1], dim))
                        w, h = dw, dh
                    else:
                        feats.append(_fake_features(content, dim))
                else:
                    fmt, w, h = parse_image_header(content)
                    feats.append(_fake_features(content, dim))
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)),
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Synthetic media (deterministic REAL PNGs derived from the documents table)
# ---------------------------------------------------------------------------

def synthetic_media(spark, documents: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic media table from documents (the container
    ships no media files). For kind="image" each row carries a REAL
    grayscale PNG whose dimensions are arithmetic in doc_id —
    width = 1 + doc_id % 64, height = 1 + (doc_id * 7) % 64; audio rows
    carry real 8 kHz PCM WAVs with duration_ms = 100 + doc_id % 400;
    video rows carry minimal MP4 containers with duration_ms =
    1000 + (doc_id * 13) % 9000 — all arithmetic in doc_id so an SQL
    oracle can verify what each decoder extracts. Other kinds carry the
    utf-8 text bytes as an opaque payload."""
    if kind not in ("image", "audio", "video", "gifvideo"):
        return documents.select(
            F.col("doc_id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.encode(F.col("text"), "utf-8").alias("content"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights, durs, mimes = [], [], [], [], []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                seed = did % 251
                w = h = dur = None
                if kind == "image":
                    w = 1 + did % 64
                    h = 1 + (did * 7) % 64
                    payloads.append(
                        encode_png_gray(w, h, lambda x, y: (x * 3 + y * 5 + seed) % 256)
                    )
                    mimes.append("image/png")
                elif kind == "audio":
                    dur = 100 + did % 400
                    rate = 8000
                    n = rate * dur // 1000
                    samples = [(((i * 37 + seed) % 2048) - 1024) * 16
                               for i in range(n)]
                    payloads.append(encode_wav_pcm16(rate, samples))
                    mimes.append("audio/wav")
                elif kind == "gifvideo":
                    # REAL moving pictures: animated GIF, frame pixels
                    # arithmetic in (doc_id, frame) so SQL oracles can
                    # verify the decoded frames
                    nf = 2 + did % 4
                    w = 4 + did % 8
                    h = 3 + did % 5
                    dur = nf * 100
                    frames = [
                        bytes(((x * 3 + y * 5 + seed + f * 11) % 256)
                              for y in range(h) for x in range(w))
                        for f in range(nf)
                    ]
                    payloads.append(encode_gif_anim(w, h, frames, delay_cs=10))
                    mimes.append("image/gif")
                else:
                    dur = 1000 + (did * 13) % 9000
                    payloads.append(encode_minimal_mp4(dur))
                    mimes.append("video/mp4")
                widths.append(w)
                heights.append(h)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": kind,
                    "content": payloads,
                    "mime": mimes,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    from kineo_spark.scale import spread_small_scan

    # the per-row Python codec work below is the expensive part — make
    # sure a one-row-group documents scan doesn't serialize it (guide
    # §2.5 unsplittable input; no-op when the scan already has >= cores
    # partitions)
    ids = spread_small_scan(documents.select("doc_id"))
    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),     # re-encoded PNG
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor integer-factor DOWNSCALE of grayscale-PNG
    payloads: real decode (all five scanline filters) + real
    re-encode through the pure-stdlib PNG codec, Arrow-batched
    mapInPandas, zero shuffle (reference has no media surface; this is
    the resize step of the §multimodal pipeline — at 100 TB the same
    batch shape feeds a GPU resizer). Output pixel (x, y) samples
    source (x*factor, y*factor); out dims = max(1, dim // factor)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_c, ws, hs = [], [], []
            for content in pdf["content"]:
                w, h, px = decode_png_gray(bytes(content))
                ow, oh = max(1, w // factor), max(1, h // factor)
                data = bytes(
                    px[(y * factor) * w + (x * factor)]
                    for y in range(oh) for x in range(ow)
                )
                out_c.append(
                    encode_png_gray(ow, oh, lambda x, y: data[y * ow + x]))
                ws.append(ow)
                hs.append(oh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_c,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.filter(F.col("mime") == "image/png").select(
        "media_id", "content").mapInPandas(run, schema=RESIZED_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode grayscale-PNG payloads and emit (media_id, width, height,
    pixel_sum) — the verification read-back for resize/encode round
    trips and a cheap corpus-health probe (all-black/all-white
    detectors at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, sums = [], [], []
            for content in pdf["content"]:
                w, h, px = decode_png_gray(bytes(content))
                ws.append(w)
                hs.append(h)
                sums.append(int(sum(px)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps to sample at; the
    decode of each frame is the stubbed step. Shows the partitioning
    shape (one row per (video, frame_ts))."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def extract_frames(media: DataFrame, at_ms: int = 150,
                   batch_size: int = 256) -> DataFrame:
    """REAL video-frame extraction over animated-GIF payloads in the
    standard Arrow-batched mapInPandas shape (the same batching a GPU
    frame encoder would consume): per media row, decode the frame
    covering ``at_ms`` and emit (media_id, n_frames, frame_index,
    n_pixels, pixel_sum)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfs, idxs, nps, sums = [], [], [], []
            for content in pdf["content"]:
                _w, _h, frames = decode_gif_frames(bytes(content))
                t = 0
                idx = len(frames) - 1
                for j, (delay_ms, _px) in enumerate(frames):
                    t += max(delay_ms, 10)
                    if at_ms < t:
                        idx = j
                        break
                px = frames[idx][1]
                nfs.append(len(frames))
                idxs.append(idx)
                nps.append(len(px))
                sums.append(int(sum(px)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.array(nfs, dtype="Int32"),
                    "frame_index": pd.array(idxs, dtype="Int32"),
                    "n_pixels": pd.array(nps, dtype="Int64"),
                    "pixel_sum": pd.array(sums, dtype="Int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run, schema=FRAME_SCHEMA)
