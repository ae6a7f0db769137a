"""PISA lookup-table (v1) binary format: reader, writer, Spark bridge.

The reference stores its term lexicons and document maps as memory-mapped
"lookup tables" — a bidirectional id <-> binary-payload map designed for
O(1) forward lookup and binary-search reverse lookup without parsing the
whole structure (reference `docs/src/specs/lookup-table.md`,
`include/pisa/lookup_table.hpp:1-229`, `src/lookup_table.cpp`).

Inside this engine the lexicon/docmap roles are parquet DataFrames joined
by Catalyst (SURVEY §2.1: a distributed join subsumes the mmap structure),
so the format is an INTEROP surface, not a query path: `read_lookup_table`
ingests a table built by the reference's tools (e.g. its term lexicon) and
`encode_lookup_table`/`write_lookup_table` emit tables the reference's
`lexicon lookup/rlookup` tooling can consume. Byte layout follows the spec
exactly:

    [0x87][version=1][flags][5 x 0x00]  -- 8-byte header
    [u64 LE N]                          -- element count
    [(N+1) x u32/u64 LE offsets]        -- relative to first payload byte
    [payloads]                          -- raw bytes, not 0-terminated

Flags: bit 0 = SORTED (payloads ascending, enables binary search),
bit 1 = WIDE_OFFSETS (64-bit offsets instead of 32-bit).
Validation errors mirror the reference's messages
(`test_lookup_table.cpp:112-175`).
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

MAGIC = 0x87
VERSION = 1
FLAG_SORTED = 0b001
FLAG_WIDE_OFFSETS = 0b010


class LookupTable:
    """Zero-copy view over an encoded lookup table (bytes or memmap)."""

    def __init__(self, buf) -> None:
        b = np.frombuffer(buf, dtype=np.uint8) if isinstance(
            buf, (bytes, bytearray, memoryview)) else np.asarray(buf)
        if b.size < 3:
            raise ValueError("not enough bytes for header")
        if b[0] != MAGIC:
            raise ValueError(
                "lookup table verification byte invalid: must be 0x87 "
                f"but {hex(int(b[0]))} given")
        if b[1] != VERSION:
            raise ValueError(f"only version 1 is valid but {int(b[1])} given")
        if b.size < 8:
            raise ValueError("not enough bytes for header")
        if b[3:8].any():
            raise ValueError("bytes 3-7 must be all 0 but are "
                             + " ".join(hex(int(x)) for x in b[3:8]))
        if b.size < 16:
            raise ValueError("not enough bytes for offsets")
        flags = int(b[2])
        self.sorted = bool(flags & FLAG_SORTED)
        self.wide = bool(flags & FLAG_WIDE_OFFSETS)
        n = int(b[8:16].view("<u8")[0])
        width = 8 if self.wide else 4
        off_end = 16 + (n + 1) * width
        if b.size < off_end:
            raise ValueError("not enough bytes for offsets")
        self._offsets = b[16:off_end].view("<u8" if self.wide else "<u4")
        self._payloads = b[off_end:]
        self._n = n

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, k: int) -> bytes:
        if not 0 <= k < self._n:
            raise IndexError(k)
        return self._payloads[int(self._offsets[k]):
                              int(self._offsets[k + 1])].tobytes()

    def find(self, payload: bytes) -> int | None:
        """payload -> id; binary search when SORTED (the reference's
        reverse-lookup path), linear scan otherwise."""
        if self.sorted:
            lo, hi = 0, self._n
            while lo < hi:
                mid = (lo + hi) // 2
                if self[mid] < payload:
                    lo = mid + 1
                else:
                    hi = mid
            return lo if lo < self._n and self[lo] == payload else None
        for i in range(self._n):
            if self[i] == payload:
                return i
        return None

    def to_list(self) -> list[bytes]:
        return [self[i] for i in range(self._n)]


def encode_lookup_table(payloads: Sequence[bytes | str],
                        sorted_flag: bool | None = None,
                        wide_offsets: bool | None = None) -> bytes:
    """Encode payloads (ids = positions) into the v1 byte layout.

    `sorted_flag` defaults to whether the payloads ARE ascending;
    `wide_offsets` defaults to whatever the total payload size needs."""
    items = [p.encode() if isinstance(p, str) else bytes(p)
             for p in payloads]
    if sorted_flag is None:
        sorted_flag = all(items[i] <= items[i + 1]
                          for i in range(len(items) - 1))
    total = sum(len(p) for p in items)
    if wide_offsets is None:
        wide_offsets = total > 0xFFFFFFFF
    flags = (FLAG_SORTED if sorted_flag else 0) \
        | (FLAG_WIDE_OFFSETS if wide_offsets else 0)
    offsets = np.zeros(len(items) + 1,
                       dtype="<u8" if wide_offsets else "<u4")
    offsets[1:] = np.cumsum([len(p) for p in items])
    return (bytes([MAGIC, VERSION, flags, 0, 0, 0, 0, 0])
            + np.array([len(items)], dtype="<u8").tobytes()
            + offsets.tobytes()
            + b"".join(items))


def write_lookup_table(payloads: Iterable[bytes | str], path: str,
                       **kw) -> None:
    with open(path, "wb") as f:
        f.write(encode_lookup_table(list(payloads), **kw))


def read_lookup_table(path: str) -> LookupTable:
    """Memory-map a lookup table from disk — the reference's access mode:
    offsets and payloads are touched lazily, never parsed up front."""
    return LookupTable(np.memmap(path, dtype=np.uint8, mode="r"))


# ------------------------------------------------------------ Spark bridge

def lookup_table_to_df(spark, path: str, id_col: str = "term_id",
                       payload_col: str = "term"):
    """Ingest a reference-built lookup table as a (id, payload) DataFrame —
    e.g. load the reference's term lexicon to query its index artifacts or
    to pin term-id parity. Payloads are decoded as UTF-8 strings (the
    lexicon/docmap use case; raw bytes callers can use LookupTable
    directly)."""
    lt = read_lookup_table(path)
    rows = [(i, lt[i].decode()) for i in range(len(lt))]
    return spark.createDataFrame(rows, f"{id_col} long, {payload_col} string")


def lexicon_to_lookup_table(index, path: str) -> dict:
    """Export this engine's term lexicon as a v1 lookup table the
    reference's tools can mmap. Term ids are dense ranks over the sorted
    vocabulary (plans/build.py), so ids = positions and the SORTED flag is
    set — binary-search reverse lookup works exactly as in the reference."""
    terms = [r.term for r in
             index.lexicon.select("term").orderBy("term_id").collect()]
    write_lookup_table(terms, path, sorted_flag=True)
    return {"terms": len(terms), "path": path,
            "bytes": os.path.getsize(path)}
