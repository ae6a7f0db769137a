"""Scorers: numpy float32 kernels matching the reference formulas exactly.

Each scorer maps vectorized (freq, doc_len) arrays plus per-term / collection
stats to float32 scores, preserving the reference's float32 expression order
so pruned executors produce score-identical output:

- bm25 (reference include/pisa/scorer/bm25.hpp:24-44):
    idf  = max(1e-6, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)
    part = f / (f + k1 * (1 - b + b * (dl/avgdl)))
    score = idf * part            [k1=0.9, b=0.4 defaults, scorer.hpp:14-22]
- qld  (scorer/qld.hpp:25-42): max(0, ln(mu/(dl+mu)) + log1p(f * C/(mu*cf_t)))
- pl2  (scorer/pl2.hpp:25-40): DFR PL2, c parameter
- dph  (scorer/dph.hpp:21-36): parameter-free DFR

For bm25 the score factors as (per-term constant idf) x (doc-dependent
part); block-max metadata therefore stores max(part) per block and the
executor multiplies by idf — identical upper bounds, but block maxima stay
valid whatever df re-weighting the query applies. qld/pl2/dph do not factor
this way, so their block maxima are stored as full scores.

All arithmetic is numpy float32 end-to-end (no float64 temporaries) to stay
bit-compatible with the reference's `float` math.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
_EPS = F32(1e-6)
_LOG2PI = None  # computed lazily in f32


class Bm25:
    """Separable: score = idf(term) * doc_part(freq, doc_len)."""

    separable = True

    def __init__(self, k1: float = 0.9, b: float = 0.4):
        self.k1 = F32(k1)
        self.b = F32(b)

    def idf(self, df, num_docs) -> np.ndarray:
        """query_term_weight, bm25.hpp:30-35 (vectorized over terms)."""
        fdf = np.asarray(df, dtype=F32)
        n = F32(num_docs)
        idf = np.log((n - fdf + F32(0.5)) / (fdf + F32(0.5)), dtype=F32)
        return np.maximum(_EPS, idf) * (F32(1.0) + self.k1)

    def doc_part(self, freq, doc_len, avg_len) -> np.ndarray:
        """doc_term_weight, bm25.hpp:24-27; norm_len = dl/avgdl
        (wand_data.hpp:117)."""
        f = np.asarray(freq, dtype=F32)
        norm_len = np.asarray(doc_len, dtype=F32) / F32(avg_len)
        return f / (f + self.k1 * (F32(1.0) - self.b + self.b * norm_len))

    def score(self, freq, doc_len, *, df, num_docs, avg_len,
              collection_len=None, cf=None) -> np.ndarray:
        return self.idf(df, num_docs) * self.doc_part(freq, doc_len, avg_len)


class Qld:
    separable = False

    def __init__(self, mu: float = 1000.0):
        self.mu = F32(mu)

    def score(self, freq, doc_len, *, df=None, num_docs=None, avg_len=None,
              collection_len=None, cf=None) -> np.ndarray:
        """cf may be a scalar (one term) or a per-row array (mixed terms)."""
        mu = self.mu
        term_component = F32(collection_len) / (mu * np.asarray(cf, dtype=F32))
        dl = np.asarray(doc_len, dtype=F32)
        f = np.asarray(freq, dtype=F32)
        a = np.log(mu / (dl + mu), dtype=F32)
        b = np.log1p(f * term_component, dtype=F32)
        return np.maximum(F32(0.0), a + b)


class Pl2:
    separable = False

    def __init__(self, c: float = 1.0):
        self.c = F32(c)

    def score(self, freq, doc_len, *, df=None, num_docs=None, avg_len=None,
              collection_len=None, cf=None) -> np.ndarray:
        f32 = F32
        freq = np.asarray(freq, dtype=f32)
        dl = np.asarray(doc_len, dtype=f32)
        tfn = freq * np.log2(f32(1.0) + (self.c * f32(avg_len)) / dl, dtype=f32)
        norm = f32(1.0) / (tfn + f32(1.0))
        # cf may be scalar or per-row array (see Qld.score)
        f = (f32(1.0) * np.asarray(cf, dtype=f32)) / (f32(1.0) * f32(num_docs))
        e = np.log(f32(1.0) / f32(2.0), dtype=f32)
        two_pi = f32(2.0) * f32(np.pi)
        return norm * (
            tfn * np.log2(f32(1.0) / f, dtype=f32)
            + f * e
            + f32(0.5) * np.log2(two_pi * tfn, dtype=f32)
            + tfn * (np.log2(tfn, dtype=f32) - e)
        )


class Dph:
    separable = False

    def score(self, freq, doc_len, *, df=None, num_docs=None, avg_len=None,
              collection_len=None, cf=None) -> np.ndarray:
        f32 = F32
        freq = np.asarray(freq, dtype=f32)
        dl = np.asarray(doc_len, dtype=f32)
        f = freq / dl
        norm = (f32(1.0) - f) * (f32(1.0) - f) / (freq + f32(1.0))
        two_pi = f32(2.0) * f32(np.pi)
        # cf may be scalar or per-row array (see Qld.score)
        return norm * (
            freq * np.log2(
                (freq * f32(avg_len) / dl)
                * (f32(num_docs) / np.asarray(cf, dtype=f32)), dtype=f32
            )
            + f32(0.5) * np.log2(two_pi * freq * (f32(1.0) - f), dtype=f32)
        )


class Quantized:
    """Identity scorer: the stored 'frequency' IS the pre-quantized score
    (reference scorer/quantized.hpp:141-143)."""

    separable = False
    stats_free = True  # needs no df/cf at encode time

    def score(self, freq, doc_len, *, df=None, num_docs=None, avg_len=None,
              collection_len=None, cf=None) -> np.ndarray:
        return np.asarray(freq, dtype=F32)


def make_scorer(name: str, params: dict[str, float] | None = None):
    """Dispatch by name (reference scorer.hpp:24-48)."""
    params = params or {}
    if name == "quantized":
        return Quantized()
    if name == "bm25":
        return Bm25(params.get("k1", 0.9), params.get("b", 0.4))
    if name == "qld":
        return Qld(params.get("mu", 1000.0))
    if name == "pl2":
        return Pl2(params.get("c", 1.0))
    if name == "dph":
        return Dph()
    raise ValueError(f"unknown scorer: {name!r}")


class LinearQuantizer:
    """value -> floor(v/max * (2^bits - 2)) + 1, range [1, 2^bits)
    (reference src/linear_quantizer.cpp:22-40)."""

    def __init__(self, max_value: float, bits: int):
        if not 2 <= bits <= 32:
            raise ValueError("bits must be in [2, 32]")
        if max_value <= 0:
            raise ValueError("max_value must be positive")
        self.max_value = F32(max_value)
        self.range = np.float64(2 ** bits - 2)

    def __call__(self, values) -> np.ndarray:
        v = np.asarray(values, dtype=F32)
        scaled = (v.astype(np.float64) / np.float64(self.max_value)) * self.range
        return (np.floor(scaled).astype(np.uint32) + 1)
