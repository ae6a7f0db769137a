"""Vectorized integer codecs for posting-list blocks (numpy, no per-row Python).

Re-expresses the reference's codec layer (include/pisa/codec/*) for Spark:
encode/decode run inside Arrow-batched pandas UDFs on whole numpy arrays.

- varint: 7-bit little-endian groups, MSB = continuation. Functionally the
  reference's TightVariableByte role (codec/block_codecs.hpp:14-100): the
  byte-aligned fallback family standing in for MaskedVByte/StreamVByte etc.
  Exact byte layout is this engine's own — the reference's own tests prove
  encodings are result-invariant, so rank-identity never depends on codec
  byte identity (test/docker/benchmark/encodings.sh runs all 14).
- Elias-Fano: lo/hi split with l = max(0, floor(log2(u/n))) low bits, high
  bits unary-gapped (codec/compact_elias_fano.hpp:21-137 semantics, minus
  the skip-pointer machinery — Spark-side skipping happens at block/shard
  granularity instead).

Posting docIDs are stored as continuous gap-1 streams (strictly increasing
docs => gaps >= 1 => store gap-1, first value relative to base -1), mirroring
src/block_inverted_index.cpp:88-130; tf values are stored as tf-1.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------------- varint

def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint64 array as LEB128-style varints (vectorized).

    Returns (bytes, per-value byte lengths) — lengths let callers compute
    block byte offsets into the stream without re-encoding.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.size, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nbytes += (x > 0)
        x >>= np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    cur = v.copy()
    for b in range(int(nbytes.max())):
        mask = nbytes > b
        byte = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] > b + 1).astype(np.uint8)
        out[offsets[mask] + b] = byte | (more << 7)
        cur[mask] >>= np.uint64(7)
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lengths(values)[0]


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a varint byte stream to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lengths.max())):
        mask = lengths > i
        vals[mask] |= (b[starts[mask] + i] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    if count is not None and vals.size != count:
        raise ValueError(f"varint stream held {vals.size} values, expected {count}")
    return vals


# --------------------------------------------------------------- Elias-Fano

def ef_encode(values: np.ndarray, universe: int) -> bytes:
    """Encode a monotone non-decreasing uint64 array over [0, universe]."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    header = varint_encode(np.array([n, universe], dtype=np.uint64))
    if n == 0:
        return header
    u = max(int(universe), 1)
    l = max(0, int(np.floor(np.log2(u / n))) if u >= n else 0)
    # low bits: n fields of l bits, little-endian bit order
    if l > 0:
        low_bits = ((v[:, None] >> np.arange(l, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
        low = np.packbits(low_bits.ravel(), bitorder="little")
    else:
        low = np.zeros(0, dtype=np.uint8)
    # high bits: unary-gapped — bit set at (v_i >> l) + i
    hi_pos = (v >> np.uint64(l)).astype(np.int64) + np.arange(n, dtype=np.int64)
    hi_nbits = int(hi_pos[-1]) + 1
    hi = np.zeros(hi_nbits, dtype=np.uint8)
    hi[hi_pos] = 1
    high = np.packbits(hi, bitorder="little")
    return header + bytes([l]) + varint_encode(
        np.array([low.size, high.size], dtype=np.uint64)
    ) + low.tobytes() + high.tobytes()


def ef_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode ef_encode output -> (values, universe)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    # parse varint header manually (n, universe)
    pos = 0
    hdr = []
    for _ in range(2):
        val, shift = 0, 0
        while True:
            byte = int(b[pos]); pos += 1
            val |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                break
        hdr.append(val)
    n, universe = hdr
    if n == 0:
        return np.zeros(0, dtype=np.uint64), universe
    l = int(b[pos]); pos += 1
    sizes = []
    for _ in range(2):
        val, shift = 0, 0
        while True:
            byte = int(b[pos]); pos += 1
            val |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                break
        sizes.append(val)
    low_size, high_size = sizes
    low = b[pos:pos + low_size]; pos += low_size
    high = b[pos:pos + high_size]
    hi_bits = np.unpackbits(high, bitorder="little")
    set_pos = np.flatnonzero(hi_bits)[:n].astype(np.uint64)
    v_high = set_pos - np.arange(n, dtype=np.uint64)
    if l > 0:
        low_bits = np.unpackbits(low, bitorder="little")[: n * l].reshape(n, l)
        v_low = (low_bits.astype(np.uint64) << np.arange(l, dtype=np.uint64)).sum(axis=1)
    else:
        v_low = np.zeros(n, dtype=np.uint64)
    return (v_high << np.uint64(l)) | v_low, universe


# ------------------------------------------------ fixed-width bitpack (bp)

def bp_encode(values: np.ndarray) -> bytes:
    """Per-block fixed-width bitpack: [varint n][1B width][bits LE-packed].

    The SIMD-BP128 role (reference codec/simdbp.hpp:1-32, the benchmark
    default codec): every value in a block packed at the block's max bit
    width. The reference's 128-lane SIMD layout is register-oriented; the
    numpy packbits layout keeps the same width-per-block compression with
    whole-array vectorization, which is the Arrow-batch analogue."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    header = varint_encode(np.array([n], dtype=np.uint64))
    if n == 0:
        return header
    width = max(1, int(v.max()).bit_length())
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64))
            & np.uint64(1)).astype(np.uint8)
    return header + bytes([width]) + np.packbits(
        bits.ravel(), bitorder="little").tobytes()


def bp_decode(buf: bytes) -> np.ndarray:
    """Decode bp_encode output -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    pos, n, shift = 0, 0, 0
    while True:
        byte = int(b[pos]); pos += 1
        n |= (byte & 0x7F) << shift
        shift += 7
        if not byte & 0x80:
            break
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    width = int(b[pos]); pos += 1
    bits = np.unpackbits(b[pos:], bitorder="little")[: n * width]
    return (bits.reshape(n, width).astype(np.uint64)
            << np.arange(width, dtype=np.uint64)).sum(axis=1)


# ------------------------------------------------------- posting-row codecs

CODECS = ("varint", "ef", "bp128", "opt")

# per-block optimal dispatch: each block is encoded with whichever base
# codec is smallest and tagged with one byte — the role of the reference's
# OptPFD/partitioned-EF family (pick the cheapest representation per block)
# re-expressed as a dispatch over this engine's three base codecs.
_OPT_CODECS = ("varint", "ef", "bp128")


def encode_gap_stream(docs: np.ndarray, base: int, codec: str) -> bytes:
    """Encode strictly-increasing docIDs relative to `base` (exclusive)."""
    d = np.asarray(docs, dtype=np.int64)
    if codec == "varint":
        gaps = np.diff(d, prepend=np.int64(base)) - 1
        return varint_encode(gaps.astype(np.uint64))
    if codec == "ef":
        rel = (d - base - 1).astype(np.uint64)
        return ef_encode(rel, int(rel[-1]) if rel.size else 0)
    if codec == "bp128":
        gaps = (np.diff(d, prepend=np.int64(base)) - 1).astype(np.uint64)
        return bp_encode(gaps)
    if codec == "opt":
        best_i, best = min(
            ((i, encode_gap_stream(d, base, c))
             for i, c in enumerate(_OPT_CODECS)),
            key=lambda t: len(t[1]))
        return bytes([best_i]) + best
    raise ValueError(f"unknown codec {codec!r}")


def decode_gap_stream(buf: bytes, base: int, codec: str, count: int | None = None) -> np.ndarray:
    if codec == "varint":
        gaps = varint_decode(buf, count).astype(np.int64)
        return np.cumsum(gaps + 1) + base
    if codec == "ef":
        rel, _ = ef_decode(buf)
        if count is not None and rel.size != count:
            raise ValueError("ef stream count mismatch")
        return rel.astype(np.int64) + base + 1
    if codec == "bp128":
        gaps = bp_decode(buf).astype(np.int64)
        if count is not None and gaps.size != count:
            raise ValueError("bp128 stream count mismatch")
        return np.cumsum(gaps + 1) + base
    if codec == "opt":
        return decode_gap_stream(buf[1:], base, _OPT_CODECS[buf[0]], count)
    raise ValueError(f"unknown codec {codec!r}")


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode((np.asarray(tfs, dtype=np.uint64) - np.uint64(1)))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64) + 1
