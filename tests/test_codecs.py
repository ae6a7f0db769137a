"""Codec round-trip properties (mirrors reference test/test_block_codecs.cpp
and test_compact_elias_fano.cpp strategy: random sequences round-trip)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_spark.operators.codecs import (
    decode_gap_stream,
    decode_tfs,
    ef_decode,
    ef_encode,
    encode_gap_stream,
    encode_tfs,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(0, 2**50), min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=300))
@settings(max_examples=60, deadline=None)
def test_ef_roundtrip(values):
    arr = np.sort(np.array(values, dtype=np.uint64))
    out, universe = ef_decode(ef_encode(arr, int(arr[-1])))
    assert (out == arr).all()


@given(
    st.lists(st.integers(0, 10**7), min_size=1, max_size=400, unique=True),
    st.sampled_from(["varint", "ef"]),
)
@settings(max_examples=60, deadline=None)
def test_gap_stream_roundtrip(docs, codec):
    arr = np.sort(np.array(docs, dtype=np.int64))
    base = int(arr[0]) - 1
    buf = encode_gap_stream(arr, base, codec)
    out = decode_gap_stream(buf, base, codec, len(arr))
    assert (out == arr).all()


def test_gap_stream_base_minus_one():
    docs = np.array([0, 1, 5, 100], dtype=np.int64)
    for codec in ("varint", "ef"):
        buf = encode_gap_stream(docs, -1, codec)
        assert (decode_gap_stream(buf, -1, codec, 4) == docs).all()


@given(st.lists(st.integers(1, 10**6), min_size=0, max_size=300))
@settings(max_examples=40, deadline=None)
def test_tf_roundtrip(tfs):
    arr = np.array(tfs, dtype=np.int64)
    assert (decode_tfs(encode_tfs(arr), len(arr)) == arr).all()


def test_varint_count_mismatch_raises():
    with pytest.raises(ValueError):
        varint_decode(varint_encode(np.array([1, 2], dtype=np.uint64)), 3)
