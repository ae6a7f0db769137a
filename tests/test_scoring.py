"""Scorer formula fidelity (float32, reference include/pisa/scorer/*)."""

import math

import numpy as np

from pisa_spark.functions.scoring import Bm25, Dph, LinearQuantizer, Pl2, Qld, make_scorer


def test_bm25_matches_hand_computation():
    s = Bm25(k1=0.9, b=0.4)
    num_docs, df, avg_len = 1000, 10, 50.0
    idf = np.float32(max(1e-6, math.log((1000 - 10 + 0.5) / (10 + 0.5)))) * np.float32(1.9)
    got_idf = s.idf(np.array([df]), num_docs)[0]
    assert np.isclose(got_idf, idf, rtol=1e-6)
    part = s.doc_part(np.array([3]), np.array([60]), avg_len)[0]
    expect = 3.0 / (3.0 + 0.9 * (1 - 0.4 + 0.4 * 60 / 50.0))
    assert np.isclose(part, expect, rtol=1e-6)
    assert part.dtype == np.float32


def test_bm25_idf_epsilon_clamp():
    # df > N/2 makes raw idf negative; reference clamps at 1e-6 (bm25.hpp:33)
    s = Bm25()
    idf = s.idf(np.array([900]), 1000)[0]
    assert np.isclose(idf, np.float32(1e-6) * np.float32(1.9))


def test_qld_nonnegative_and_formula():
    s = Qld(mu=1000.0)
    score = s.score(np.array([5]), np.array([100]), collection_len=50000, cf=20)[0]
    expect = max(0.0, math.log(1000 / 1100) + math.log1p(5 * 50000 / (1000 * 20)))
    assert np.isclose(score, expect, rtol=1e-5)
    zero = s.score(np.array([1]), np.array([10**9]), collection_len=100, cf=100)[0]
    assert zero == 0.0


def test_pl2_dph_finite():
    pl2 = Pl2(c=1.0)
    v = pl2.score(np.array([2, 5]), np.array([40, 80]), num_docs=1000,
                  avg_len=50.0, cf=30)
    assert np.isfinite(v).all()
    dph = Dph()
    v = dph.score(np.array([2, 5]), np.array([40, 80]), num_docs=1000,
                  avg_len=50.0, cf=30)
    assert np.isfinite(v).all()


def test_dispatch():
    assert isinstance(make_scorer("bm25"), Bm25)
    assert isinstance(make_scorer("qld"), Qld)


def test_linear_quantizer_range():
    # reference src/linear_quantizer.cpp:22-40: range [1, 2^bits)
    q = LinearQuantizer(10.0, 8)
    out = q(np.array([0.0, 5.0, 10.0], dtype=np.float32))
    assert out[0] == 1
    assert out[-1] == 2**8 - 1
    assert (out >= 1).all() and (out < 2**8).all()
