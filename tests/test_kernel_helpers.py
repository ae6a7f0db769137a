"""Pure-numpy property tests for the vectorized traversal-kernel helpers.

The round-5 kernel computes per-range bounds and candidate extraction in
batch (`range_ubs_batch`, `spans_nonempty`, `docs_in_batch`); these pin
them bit-identical to the scalar methods they replaced (`range_ub`,
`blocks_overlapping`, `docs_in`) over randomized posting shapes — no
Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_spark.operators.topk import F32, _TermRun


def _make_run(rng: np.random.Generator, n_docs: int, n_postings: int,
              block: int) -> _TermRun:
    docs = np.sort(rng.choice(n_docs, size=n_postings, replace=False)
                   ).astype(np.int64)
    tfs = rng.integers(1, 5, size=n_postings).astype(np.int64)
    blk_bounds = list(range(block - 1, n_postings, block))
    if not blk_bounds or blk_bounds[-1] != n_postings - 1:
        blk_bounds.append(n_postings - 1)
    run = _TermRun.__new__(_TermRun)
    run.term_id = 0
    run.codec = "varint"
    run.weight = F32(1.0)
    run.df = n_postings
    run.cf = int(tfs.sum())
    run.idf = F32(1.0)
    run.n = n_postings
    run.base_doc = int(docs[0]) - 1
    run.last_doc = int(docs[-1])
    run._docs = docs
    run._tfs = tfs
    run.blk_last = docs[np.asarray(blk_bounds)]
    run.blk_ub = rng.random(len(blk_bounds)).astype(F32)
    run.ub = F32(run.blk_ub.max())
    return run


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       n_docs=st.integers(50, 3000),
       span=st.sampled_from([16, 64, 128, 256]))
def test_range_ubs_batch_matches_scalar(seed, n_docs, span):
    rng = np.random.default_rng(seed)
    n_postings = int(rng.integers(5, max(6, n_docs // 2)))
    run = _make_run(rng, n_docs, n_postings, block=int(rng.integers(4, 64)))
    los = np.arange(0, n_docs, span, dtype=np.int64)
    his = np.minimum(los + span, n_docs)
    batch = run.range_ubs_batch(los, his)
    scalar = np.array([run.range_ub(int(lo), int(hi))
                       for lo, hi in zip(los, his)], dtype=F32)
    assert batch.dtype == np.dtype(F32)
    np.testing.assert_array_equal(batch, scalar)
    nonempty = run.spans_nonempty(los, his)
    scalar_ne = np.array(
        [run.blocks_overlapping(int(lo), int(hi))[0]
         <= run.blocks_overlapping(int(lo), int(hi))[1]
         for lo, hi in zip(los, his)])
    np.testing.assert_array_equal(nonempty, scalar_ne)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       n_docs=st.integers(50, 3000),
       span=st.sampled_from([16, 64, 256]))
def test_docs_in_batch_matches_scalar_union(seed, n_docs, span):
    rng = np.random.default_rng(seed)
    n_postings = int(rng.integers(5, max(6, n_docs // 2)))
    run = _make_run(rng, n_docs, n_postings, block=32)
    all_los = np.arange(0, n_docs, span, dtype=np.int64)
    pick = rng.random(all_los.size) < 0.5  # disjoint subset, gaps included
    los = all_los[pick]
    his = np.minimum(los + span, n_docs)
    if los.size == 0:
        return
    batch = run.docs_in_batch(los, his)
    scalar = np.concatenate(
        [run.docs_in(int(lo), int(hi))[0] for lo, hi in zip(los, his)])
    np.testing.assert_array_equal(batch, scalar)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_range_ubs_batch_empty_and_edge_ranges(seed):
    rng = np.random.default_rng(seed)
    run = _make_run(rng, 1000, 20, block=8)
    # ranges entirely before, inside gaps, and after the posting span
    los = np.array([0, run.last_doc + 1, 990], dtype=np.int64)
    his = np.array([1, run.last_doc + 5, 1000], dtype=np.int64)
    batch = run.range_ubs_batch(los, his)
    scalar = np.array([run.range_ub(int(lo), int(hi))
                       for lo, hi in zip(los, his)], dtype=F32)
    np.testing.assert_array_equal(batch, scalar)
