"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Media bytes live in their own parquet/Iceberg BINARY column, so columnar
pruning means metadata-only queries never read them; decode and feature
extraction run as mapInPandas over partition-sized Arrow batches (one task
streams batches instead of materializing a partition of blobs).

Decoders are real, pure numpy + stdlib (no media libraries ship in this
container, and none are needed for these formats):

- PNG  : zlib inflate + full scanline unfilter (None/Sub/Up/Average/Paeth),
         color types gray / RGB / palette / gray+alpha / RGBA, 8-bit,
         non-interlaced. Sub unfilters as a vectorized per-lane cumsum;
         Average/Paeth are sequential per pixel BY SPEC (each pixel needs
         the reconstructed left neighbour) — row loop vectorized across
         channels, O(pixels) small-constant Python for those two filters.
- PPM  : P6 binary RGB.
- BMP  : BITMAPINFOHEADER, 24bpp uncompressed, bottom-up BGR.
- WAV  : RIFF/PCM-16 mono/stereo — samples, duration, RMS, zero crossings.
- MP4  : top-level box walk + mvhd timescale/duration (container metadata
         only: frame-level decode needs codec libraries and is the one
         thing this module does not do — see extract_features).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

IMAGE_STATS_SCHEMA = ("media_id long, fmt string, width long, height long, "
                      "channels long, pix_sum long")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# --------------------------------------------------------------- PNG codec

def png_encode(arr: np.ndarray, row_filters=None) -> bytes:
    """8-bit non-interlaced PNG from an (h, w) or (h, w, c) uint8 array,
    c in {1, 3, 4}. row_filters: per-row filter type 0-4 (default all 0);
    filtering is computed from the original pixels, fully vectorized."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if row_filters is None:
        row_filters = np.zeros(h, dtype=np.int64)
    flat = a.reshape(h, w * c).astype(np.int64)
    prev = np.vstack([np.zeros((1, w * c), np.int64), flat[:-1]])
    left = np.zeros_like(flat)
    left[:, c:] = flat[:, :-c]
    upleft = np.zeros_like(prev)
    upleft[:, c:] = prev[:, :-c]
    raw = bytearray()
    for y in range(h):
        ft = int(row_filters[y])
        line, p, lf, ul = flat[y], prev[y], left[y], upleft[y]
        if ft == 0:
            out = line
        elif ft == 1:
            out = line - lf
        elif ft == 2:
            out = line - p
        elif ft == 3:
            out = line - (lf + p) // 2
        else:  # Paeth
            out = line - _paeth(lf, p, ul)
        raw.append(ft)
        raw.extend((out % 256).astype(np.uint8).tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 9.4), vectorized."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(buf: bytes) -> np.ndarray:
    """(h, w, channels) uint8 from an 8-bit non-interlaced PNG."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, palette, hdr = 8, [], None, None
    while pos + 8 <= len(buf):
        (length,), tag = struct.unpack(">I", buf[pos:pos + 4]), \
            buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    w, h, depth, color_type, _, _, interlace = hdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    c = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * c
    rows = raw.reshape(h, stride)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, w * c), dtype=np.int64)
    for y in range(h):
        ft, line = int(filters[y]), data[y]
        p = out[y - 1] if y else np.zeros(w * c, np.int64)
        if ft == 0:
            out[y] = line
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            out[y] = np.cumsum(line.reshape(w, c), axis=0).reshape(-1) % 256
        elif ft == 2:
            out[y] = (line + p) % 256
        else:  # Average / Paeth need the reconstructed left neighbour
            row = out[y]
            lf = np.zeros(c, np.int64)
            for x in range(w):
                s = slice(x * c, x * c + c)
                if ft == 3:
                    row[s] = (line[s] + (lf + p[s]) // 2) % 256
                else:
                    ul = p[x * c - c:x * c] if x else np.zeros(c, np.int64)
                    row[s] = (line[s] + _paeth(lf, p[s], ul)) % 256
                lf = row[s]
    img = out.astype(np.uint8).reshape(h, w, c)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        img = palette[img[:, :, 0]]
    return img


# --------------------------------------------------------- PPM / BMP codecs

def ppm_encode(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def ppm_decode(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P6":
        raise ValueError("not a binary PPM")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":  # comment to end of line
            while buf[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    return np.frombuffer(buf, np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3)


def bmp_encode(arr: np.ndarray) -> bytes:
    """24bpp uncompressed BMP (bottom-up rows, BGR, 4-byte row padding)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # flip rows, RGB->BGR
    data = body.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + info + data


def bmp_decode(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", buf[10:14])[0]
    w, h = struct.unpack("<ii", buf[18:26])
    planes, bpp = struct.unpack("<HH", buf[26:30])
    compression = struct.unpack("<I", buf[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24bpp uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(buf, np.uint8, count=h * row_bytes,
                         offset=offset).reshape(h, row_bytes)
    img = body[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch -> (h, w, c) uint8."""
    if buf[:8] == _PNG_SIG:
        return png_decode(buf)
    if buf[:2] == b"P6":
        return ppm_decode(buf)
    if buf[:2] == b"BM":
        return bmp_decode(buf)
    raise ValueError("unknown image format")


# --------------------------------------------------------- WAV / MP4 parse

def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """PCM-16 mono WAV from an int16 array."""
    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(s))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(s)) + s)


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """(samples int16 [n, channels], sample_rate) from a PCM-16 RIFF WAV."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, n_ch, data = 12, None, 1, None
    while pos + 8 <= len(buf):
        tag, length = buf[pos:pos + 4], struct.unpack(
            "<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1:
                raise ValueError("only PCM WAV supported")
        elif tag == b"data":
            data = np.frombuffer(body, "<i2")
        pos += 8 + length + (length & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data.reshape(-1, n_ch), rate


def mp4_boxes(buf: bytes) -> list[tuple[str, int]]:
    """Top-level ISO-BMFF box walk: [(type, size), ...]."""
    out, pos = [], 0
    while pos + 8 <= len(buf):
        size = struct.unpack(">I", buf[pos:pos + 4])[0]
        tag = buf[pos + 4:pos + 8].decode("latin1")
        if size == 1:  # 64-bit size
            size = struct.unpack(">Q", buf[pos + 8:pos + 16])[0]
        if size < 8:
            break
        out.append((tag, size))
        pos += size
    return out


def mp4_duration_ms(buf: bytes) -> int | None:
    """Scan for the mvhd box (any nesting) and return duration in ms."""
    idx = buf.find(b"mvhd")
    if idx < 0:
        return None
    version = buf[idx + 4]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", buf[idx + 24:idx + 36])
    else:
        timescale, duration = struct.unpack(">II", buf[idx + 16:idx + 24])
    return int(duration * 1000 // timescale) if timescale else None


def mp4_encode_stub(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd) — container metadata only."""
    mvhd = (b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80)
    moov_body = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    return ftyp + struct.pack(">I", 8 + len(moov_body)) + b"moov" + moov_body


# ------------------------------------------------------------- synth tables

def synth_media(spark, n: int = 64, seed: int = 5):
    """Deterministic media table with typed metadata and REAL payloads:
    images are decodable PNGs (pixel (y, x, c) = (x + y + c + i) % 256,
    row filter y % 5 so every unfilter path runs), audio is PCM-16 WAV
    (seeded sine-ish int16), video is a minimal ISO-BMFF container."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    w, h = 8 + i % 9, 8 + (i * 3) % 7
                    y, x, c = np.ogrid[:h, :w, :3]
                    arr = ((x + y + c + i) % 256).astype(np.uint8)
                    payload = png_encode(arr, row_filters=np.arange(h) % 5)
                    rows.append((i, kind, payload, "image/png", w, h, None))
                elif kind == "audio":
                    rng = np.random.default_rng((seed, i))
                    samples = (rng.integers(-2000, 2000, 800)
                               + (1000 * np.sin(np.arange(800) / 7))
                               ).astype(np.int16)
                    payload = wav_encode(samples, rate=8000)
                    rows.append((i, kind, payload, "audio/wav",
                                 None, None, 100))
                else:
                    dur = 1000 + i * 10
                    payload = mp4_encode_stub(dur)
                    rows.append((i, kind, payload, "video/mp4",
                                 64 + i % 256, 64 + i % 128, dur))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synth_images(spark, n: int = 60):
    """Deterministic image-only table cycling PNG / PPM / BMP encodings of
    the same closed-form pixel pattern — decoded stats are analytically
    computable, so a SQL oracle can verify the real decoders end-to-end:
    image i has w = 8 + i % 9, h = 8 + (i * 3) % 7,
    channels = (1, 3, 4)[(i // 3) % 3] for PNG (3 for PPM/BMP),
    pixel (y, x, c) = (x + y + c + i) % 256, PNG row filter = y % 5."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fmt = ("png", "ppm", "bmp")[i % 3]
                w, h = 8 + i % 9, 8 + (i * 3) % 7
                ch = (1, 3, 4)[(i // 3) % 3] if fmt == "png" else 3
                y, x, c = np.ogrid[:h, :w, :ch]
                arr = ((x + y + c + i) % 256).astype(np.uint8)
                if fmt == "png":
                    payload = png_encode(arr, row_filters=np.arange(h) % 5)
                elif fmt == "ppm":
                    payload = ppm_encode(arr)
                else:
                    payload = bmp_encode(arr)
                rows.append((i, fmt, payload))
            yield pd.DataFrame(rows, columns=["media_id", "fmt", "payload"])

    return spark.range(n).mapInPandas(gen, "media_id long, fmt string, "
                                           "payload binary")


# ---------------------------------------------------------------- operators

def image_stats(images_df):
    """Decode every payload (PNG/PPM/BMP magic dispatch) and emit exact
    integer stats: dimensions, channels, and the sum of all pixel values —
    one wrong filter, palette entry, padding byte, or BGR swap changes
    pix_sum, so an analytic oracle over the synth pattern pins the whole
    decode path."""
    def run(batches):
        for pdf in batches:
            recs = []
            for mid, fmt, payload in zip(pdf["media_id"], pdf["fmt"],
                                         pdf["payload"]):
                img = decode_image(bytes(payload))
                h, w, c = img.shape
                recs.append((int(mid), fmt, w, h, c,
                             int(img.astype(np.int64).sum())))
            yield pd.DataFrame(recs, columns=[
                "media_id", "fmt", "width", "height", "channels", "pix_sum"])

    return images_df.mapInPandas(run, IMAGE_STATS_SCHEMA)


def _image_feature(payload: bytes) -> np.ndarray:
    """Real image feature: 16-bin normalized gray histogram."""
    img = decode_image(payload).astype(np.int64)
    gray = img.mean(axis=2) if img.ndim == 3 else img
    hist, _ = np.histogram(gray, bins=FEATURE_DIM, range=(0, 256))
    v = hist.astype(np.float32)
    n = np.linalg.norm(v)
    return v / n if n else v


def _audio_feature(payload: bytes) -> np.ndarray:
    """Real audio feature: per-segment RMS over FEATURE_DIM segments."""
    samples, _ = wav_decode(payload)
    mono = samples.astype(np.float64).mean(axis=1)
    segs = np.array_split(mono, FEATURE_DIM)
    v = np.array([np.sqrt((s * s).mean()) if s.size else 0.0 for s in segs],
                 dtype=np.float32)
    n = np.linalg.norm(v)
    return v / n if n else v


def _video_feature(payload: bytes) -> np.ndarray:
    """Container-level video feature: duration + top-level box profile.
    Frame-level decode needs codec libraries (H.264 etc.) that do not ship
    here; this is container metadata, not pixels — documented limit."""
    boxes = mp4_boxes(payload)
    dur = mp4_duration_ms(payload) or 0
    v = np.zeros(FEATURE_DIM, dtype=np.float32)
    v[0] = dur
    v[1] = len(boxes)
    for tag, size in boxes[:FEATURE_DIM - 2]:
        # stable bucket: Python's hash() is salted per process (PYTHONHASHSEED),
        # which would make the feature differ across executors/retries
        slot = zlib.crc32(tag.encode("latin-1", "replace"))
        v[2 + slot % (FEATURE_DIM - 2)] += size
    n = np.linalg.norm(v)
    return v / n if n else v


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in (md5-seeded unit vector) for plumbing tests
    on payloads that are not real media bytes."""
    seed = int(hashlib.md5(payload).hexdigest()[:15], 16)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(media_df, deterministic_features: bool = False):
    """mapInPandas feature extraction over the binary payload column.

    deterministic_features=False (default) runs the REAL decoders:
    image -> gray histogram, audio -> segment RMS, video -> container
    profile. deterministic_features=True keeps the md5-seeded fake for
    plumbing tests over arbitrary bytes."""
    def run(batches):
        for pdf in batches:
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                p = bytes(p)
                if deterministic_features:
                    feats.append(_fake_feature(p).tolist())
                elif kind == "image":
                    feats.append(_image_feature(p).tolist())
                elif kind == "audio":
                    feats.append(_audio_feature(p).tolist())
                else:
                    feats.append(_video_feature(p).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len),
                "feature": feats,
            })

    return media_df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media_df, every_ms: int = 1000):
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows — the
    partition-exploding step a video pipeline runs before decode (frame
    decode itself needs codec libraries; see _video_feature)."""
    v = media_df.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("frame_ts_ms"))
