"""PISA lookup-table v1 binary format: byte-level parity with the
reference's own test vectors (test_lookup_table.cpp:112-240,
docs/src/specs/lookup-table.md) plus the Spark bridge."""

import numpy as np
import pytest

from pisa_spark.sources.lookup_table import (FLAG_SORTED, FLAG_WIDE_OFFSETS,
                                             LookupTable,
                                             encode_lookup_table,
                                             lexicon_to_lookup_table,
                                             lookup_table_to_df,
                                             read_lookup_table,
                                             write_lookup_table)


def test_invalid_headers_match_reference_messages():
    # ref test_lookup_table.cpp "LookupTable::from" sections
    with pytest.raises(ValueError, match="must be 0x87 but 0x0 given"):
        LookupTable(bytes([0, 0, 0, 0]))
    with pytest.raises(ValueError, match="only version 1 is valid but 0"):
        LookupTable(bytes([0x87, 0, 0, 0]))
    with pytest.raises(ValueError, match="only version 1 is valid but 2"):
        LookupTable(bytes([0x87, 2, 0, 0]))
    with pytest.raises(ValueError, match="not enough bytes for header"):
        LookupTable(bytes([0x87, 1, 0, 0]))
    with pytest.raises(ValueError,
                       match="bytes 3-7 must be all 0 but are "
                             "0x0 0x0 0x0 0x0 0x1"):
        LookupTable(bytes([0x87, 1, 0, 0, 0, 0, 0, 1]))
    with pytest.raises(ValueError,
                       match="bytes 3-7 must be all 0 but are "
                             "0x1 0x2 0x3 0x4 0x5"):
        LookupTable(bytes([0x87, 1, 0, 1, 2, 3, 4, 5]))


def test_offset_bounds_match_reference():
    # empty table narrow offsets: header + u64 size + one u32 offset
    assert len(LookupTable(bytes([0x87, 1]) + bytes(18))) == 0
    # empty table wide offsets
    assert len(LookupTable(
        bytes([0x87, 1, FLAG_WIDE_OFFSETS]) + bytes(21))) == 0
    # empty table must still have the single trailing offset
    with pytest.raises(ValueError, match="not enough bytes for offsets"):
        LookupTable(bytes([0x87, 1]) + bytes(14))
    # size=1 but only one offset's worth of bytes
    with pytest.raises(ValueError, match="not enough bytes for offsets"):
        LookupTable(bytes([0x87, 1]) + bytes(6) + bytes([1]) + bytes(7))
    # 12 offset bytes: not enough for 3 wide, enough for 3 narrow (N=2)
    with pytest.raises(ValueError, match="not enough bytes for offsets"):
        LookupTable(bytes([0x87, 1, FLAG_WIDE_OFFSETS]) + bytes(5)
                    + bytes([2]) + bytes(7) + bytes(12))
    assert len(LookupTable(bytes([0x87, 1, 0]) + bytes(5)
                           + bytes([2]) + bytes(7) + bytes(12))) == 2


def test_reference_a_bcd_efgh_vector():
    """The spec's worked example: [a, bcd, efgh], narrow offsets —
    byte-for-byte (test_lookup_table.cpp:204-240)."""
    ref_bytes = (bytes([0x87, 1, 0]) + bytes(5)           # header
                 + bytes([3]) + bytes(7)                  # N = 3
                 + bytes(4)                               # offset 0
                 + bytes([1]) + bytes(3)                  # offset 1
                 + bytes([4]) + bytes(3)                  # offset 4
                 + bytes([8]) + bytes(3)                  # offset 8
                 + b"abcdefgh")                           # payloads
    lt = LookupTable(ref_bytes)
    assert len(lt) == 3
    assert [lt[0], lt[1], lt[2]] == [b"a", b"bcd", b"efgh"]
    # our encoder reproduces the reference bytes exactly (sorted=False:
    # "a" < "bcd" < "efgh" would auto-set SORTED, the ref vector has 0)
    assert encode_lookup_table([b"a", b"bcd", b"efgh"],
                               sorted_flag=False) == ref_bytes


def test_roundtrip_all_flag_combinations():
    payloads = [b"alpha", b"beta", b"", b"\x00binary\xff", b"zz"]
    for sorted_flag in (False, True):
        for wide in (False, True):
            buf = encode_lookup_table(payloads, sorted_flag=sorted_flag,
                                      wide_offsets=wide)
            lt = LookupTable(buf)
            assert lt.to_list() == payloads
            assert lt.sorted == sorted_flag and lt.wide == wide
            flags = buf[2]
            assert bool(flags & FLAG_SORTED) == sorted_flag
            assert bool(flags & FLAG_WIDE_OFFSETS) == wide


def test_find_binary_search_and_linear():
    terms = sorted([b"apple", b"banana", b"cherry", b"fig", b"grape"])
    lt = LookupTable(encode_lookup_table(terms))  # auto-detects sorted
    assert lt.sorted
    for i, t in enumerate(terms):
        assert lt.find(t) == i
    assert lt.find(b"durian") is None
    assert lt.find(b"") is None
    # unsorted: linear scan still finds
    shuffled = [b"fig", b"apple", b"grape"]
    lt2 = LookupTable(encode_lookup_table(shuffled))
    assert not lt2.sorted
    assert lt2.find(b"grape") == 2 and lt2.find(b"kiwi") is None


def test_write_read_mmap(tmp_path):
    path = str(tmp_path / "terms.lt")
    write_lookup_table(["aa", "bb", "cc"], path)
    lt = read_lookup_table(path)
    assert lt.to_list() == [b"aa", b"bb", b"cc"] and lt.sorted


def test_spark_bridge_and_lexicon_export(spark, tmp_path):
    from pisa_spark.config import IndexConfig
    from pisa_spark.plans.build import build_index, extract_pages
    from pisa_spark.sources import webtext

    cfg = IndexConfig(shard_span=128)
    idx = build_index(
        extract_pages(webtext.generate(spark, 80, seed=3), cfg), cfg)
    path = str(tmp_path / "lexicon.lt")
    info = lexicon_to_lookup_table(idx, path)
    lex = {r.term: r.term_id for r in idx.lexicon.collect()}
    assert info["terms"] == len(lex)
    lt = read_lookup_table(path)
    assert lt.sorted  # dense ids over sorted vocabulary
    # id <-> payload parity with the engine's lexicon, both directions
    for term, tid in lex.items():
        assert lt[tid] == term.encode()
        assert lt.find(term.encode()) == tid
    # ingest back through the DataFrame bridge and join-match
    df = lookup_table_to_df(spark, path)
    back = {r.term: r.term_id for r in df.collect()}
    assert back == lex
