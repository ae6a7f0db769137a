"""Top-k query executors: exhaustive (ranked_or), MaxScore, Block-Max-WAND.

Dataflow (all algorithms share it):

    queries --analyze--> (qid, term, weight)
            --join lexicon-->  (qid, term_id, weight, df, cf, max_*)
            --join postings--> one row per (qid, shard, term) posting run
            --join shards-->   + per-shard doc-length array
            --groupBy(qid, shard_id).applyInPandas(kernel)
            --window top-k-->  (qid, doc_id, score, rank)

The per-shard kernel + global merge mirrors the reference's range_query
(include/pisa/range_query.hpp:8-37): per-docID-range top-k, then a final
k-merge — which is exactly Spark's partial/final TakeOrderedAndProject
shape, here expressed as a row_number window per qid.

Kernels are numpy-vectorized adaptations of the reference traversal
algorithms (cursor loops don't vectorize; doc-range batching does):

- exhaustive: score every doc in the union (ranked_or_query.hpp:16-56);
  float32 canonical accumulation -> the rank-identity oracle.
- maxscore  (maxscore_query.hpp:14-147): per doc-range, split lists into
  essential/non-essential by the suffix-upper-bound rule against the
  running threshold; candidates come only from essential lists;
  non-essential lists are probed by searchsorted lookup with bound
  re-filtering in descending-max-score order.
- block_max_maxscore (block_max_maxscore_query.hpp:10-101): maxscore with
  the remaining non-essential mass bounded PER DOC by the max of the block
  that would contain the doc in each unprobed list (the reference's
  block_max_score at the cursor, batched per doc-range) — tighter pruning,
  identical ranking.
- block_max_wand (block_max_wand_query.hpp:10-169): per doc-range, skip
  the whole range when the sum of per-term block maxima is below the
  threshold; then filter candidates by their per-doc sum of block maxima
  before any scoring (the deep skip + partial-break of the reference,
  batched).

Safety: all pruning uses strict `bound < theta` skips and survivors are
re-scored in canonical term order, so every algorithm returns exactly the
exhaustive top-k including ties (ties broken score desc, doc asc — the
reference's finalize() sorts by score only, topk_queue.hpp:73-83, so we pin
the doc-asc rule as documented in SURVEY §7).

Threshold seeding (reference topk_queue.hpp:23-31, tools/queries.cpp): pass
`thresholds={qid: theta0}` to start kernels above zero; with an exact k-th
score this stays rank-safe (ties kept); overestimates prune like the
reference's unsafe mode.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from pisa_spark.config import IndexConfig
from pisa_spark.functions.scoring import make_scorer
from pisa_spark.functions.tokenize import analyze_query_terms
from pisa_spark.operators import codecs

F32 = np.float32

TOPK_PARTIAL_SCHEMA = "qid string, doc_id long, score float"

ALGORITHMS = ("ranked_or", "maxscore", "block_max_maxscore", "wand",
              "block_max_wand", "ranked_and", "block_max_ranked_and")

# TaaT variants share the exhaustive kernel: scoring every candidate in a
# doc-range batch IS term-at-a-time accumulation over that range
# (ranked_or_taat_query.hpp:9-37; the lazy accumulator is a single-node
# memory trick with no distributed analogue).
_ALGORITHM_ALIASES = {
    "ranked_or_taat": "ranked_or",
    "ranked_or_taat_lazy": "ranked_or",
}


class _TermRun:
    """One (shard, term) posting run: lazy block decoding + bounds."""

    __slots__ = ("term_id", "n", "base_doc", "last_doc", "blk_last",
                 "doc_offs", "tf_offs", "blk_ub", "ub", "docs_bin", "tfs_bin",
                 "df", "cf", "idf", "weight", "_docs", "_tfs", "codec")

    def __init__(self, row, scorer, stats, weight: float, weighted: bool,
                 codec: str):
        self.term_id = int(row.term_id)
        self.n = int(row.n)
        self.base_doc = int(row.base_doc)
        self.last_doc = int(row.last_doc)
        self.blk_last = np.asarray(row.block_last_docs, dtype=np.int64)
        self.doc_offs = np.asarray(row.block_doc_offs, dtype=np.int64)
        self.tf_offs = np.asarray(row.block_tf_offs, dtype=np.int64)
        self.docs_bin = bytes(row.docs_bin)
        self.tfs_bin = bytes(row.tfs_bin)
        self.df = int(row.df)
        self.cf = int(row.cf)
        self.codec = codec
        w = F32(weight) if weighted else F32(1.0)
        self.weight = w
        if scorer.separable:
            self.idf = F32(scorer.idf(np.array([self.df]), stats["num_docs"])[0]) * w
        else:
            self.idf = w
        self.blk_ub = (np.asarray(row.block_max_part, dtype=F32) * self.idf)
        self.ub = F32(self.blk_ub.max()) if self.blk_ub.size else F32(0.0)
        self._docs = None
        self._tfs = None

    @classmethod
    def merged(cls, shard_runs: list) -> "_TermRun":
        """One run over the term's postings across ALL shards (ascending
        global docIDs): the serve path's whole-index traversal — the
        reference's cursors walk one in-memory index, not one per shard
        (tools/queries.cpp:279-340). Decodes each shard run once; block
        metadata concatenates because blk_last/doc ids are absolute."""
        runs = sorted(shard_runs, key=lambda r: r.base_doc)
        r0 = runs[0]
        self = cls.__new__(cls)
        self.term_id = r0.term_id
        self.codec = r0.codec
        self.weight = r0.weight
        self.df = r0.df
        self.cf = r0.cf
        self.idf = r0.idf
        self.n = sum(r.n for r in runs)
        self.base_doc = r0.base_doc
        self.last_doc = runs[-1].last_doc
        ds, ts = zip(*(r.decode_all() for r in runs))
        self._docs = np.concatenate(ds)
        self._tfs = np.concatenate(ts)
        self.blk_last = np.concatenate([r.blk_last for r in runs])
        self.blk_ub = np.concatenate([r.blk_ub for r in runs])
        self.ub = F32(self.blk_ub.max()) if self.blk_ub.size else F32(0.0)
        self.doc_offs = None
        self.tf_offs = None
        self.docs_bin = b""
        self.tfs_bin = b""
        return self

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        if self._docs is None:
            if self.codec == "varint":
                self._docs = codecs.decode_gap_stream(
                    self.docs_bin, self.base_doc, "varint", self.n)
            else:  # per-block codecs (ef, bp128)
                parts, prev = [], self.base_doc
                offs = list(self.doc_offs) + [len(self.docs_bin)]
                for i in range(len(offs) - 1):
                    d = codecs.decode_gap_stream(
                        self.docs_bin[offs[i]:offs[i + 1]], prev, self.codec)
                    prev = int(d[-1])
                    parts.append(d)
                self._docs = np.concatenate(parts)
            self._tfs = codecs.decode_tfs(self.tfs_bin, self.n)
        return self._docs, self._tfs

    def blocks_overlapping(self, lo: int, hi: int) -> tuple[int, int]:
        """Inclusive block index span intersecting doc range [lo, hi)."""
        nblk = self.blk_last.size
        b0 = int(np.searchsorted(self.blk_last, lo, "left"))
        if b0 >= nblk:
            return 1, 0  # empty span
        b1 = int(np.searchsorted(self.blk_last, hi - 1, "left"))
        b1 = min(b1, nblk - 1)
        return b0, b1

    def range_ub(self, lo: int, hi: int) -> np.float32:
        b0, b1 = self.blocks_overlapping(lo, hi)
        if b0 > b1:
            return F32(0.0)
        return F32(self.blk_ub[b0:b1 + 1].max())

    def _range_block_spans(self, los: np.ndarray,
                           his: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """blocks_overlapping vectorized over ascending [lo, hi) ranges."""
        nblk = self.blk_last.size
        b0 = np.searchsorted(self.blk_last, los, "left")
        b1 = np.minimum(np.searchsorted(self.blk_last, his - 1, "left"),
                        nblk - 1)
        return b0, b1

    def spans_nonempty(self, los: np.ndarray, his: np.ndarray) -> np.ndarray:
        nblk = self.blk_last.size
        if nblk == 0:
            return np.zeros(los.size, dtype=bool)
        b0, b1 = self._range_block_spans(los, his)
        return (b0 < nblk) & (b0 <= b1)

    def range_ubs_batch(self, los: np.ndarray, his: np.ndarray) -> np.ndarray:
        """range_ub vectorized over many ranges: per-range interval max of
        blk_ub via one padded maximum.reduceat (bit-identical to the scalar
        slice-max — f32 max is order-independent)."""
        nblk = self.blk_last.size
        if nblk == 0:
            return np.zeros(los.size, dtype=F32)
        b0, b1 = self._range_block_spans(los, his)
        empty = (b0 >= nblk) | (b0 > b1)
        padded = np.concatenate((self.blk_ub, np.zeros(1, dtype=F32)))
        ind = np.empty(2 * los.size, dtype=np.intp)
        ind[0::2] = np.minimum(b0, nblk)
        ind[1::2] = b1 + 1
        # even slots reduce over [b0, b1+1) == the block span; odd slots are
        # inter-range garbage and are discarded
        out = np.maximum.reduceat(padded, ind)[0::2]
        out[empty] = F32(0.0)
        return out.astype(F32, copy=False)

    def docs_in(self, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
        docs, tfs = self.decode_all()
        i0 = np.searchsorted(docs, lo, "left")
        i1 = np.searchsorted(docs, hi, "left")
        return docs[i0:i1], tfs[i0:i1]

    def docs_in_batch(self, los: np.ndarray, his: np.ndarray) -> np.ndarray:
        """Docs present in ANY of the disjoint [lo, hi) ranges, in one pass
        (batched searchsorted + interval difference-mask)."""
        docs, _ = self.decode_all()
        i0 = np.searchsorted(docs, los, "left")
        i1 = np.searchsorted(docs, his, "left")
        mark = np.zeros(docs.size + 1, dtype=np.int32)
        np.add.at(mark, i0, 1)
        np.add.at(mark, i1, -1)
        return docs[np.cumsum(mark[:-1]) > 0]

    def doc_term_ub(self, doc_ids: np.ndarray) -> np.ndarray:
        """Per-doc upper bound using the TERM max score for docs present in
        this run (plain WAND semantics, wand_query.hpp:38-89: bounds come
        from per-term max scores only, no block refinement)."""
        docs, _ = self.decode_all()
        idx = np.searchsorted(docs, doc_ids, "left")
        idx_c = np.minimum(idx, max(docs.size - 1, 0))
        present = (docs.size > 0) & (idx < docs.size) & (docs[idx_c] == doc_ids)
        out = np.zeros(doc_ids.size, dtype=F32)
        out[present] = self.ub
        return out

    def doc_block_ub(self, doc_ids: np.ndarray) -> np.ndarray:
        """Per-doc upper bound from the block that would contain each doc
        (block_max_scored_cursor.hpp block_max_score semantics)."""
        idx = np.searchsorted(self.blk_last, doc_ids, "left")
        out = np.zeros(doc_ids.size, dtype=F32)
        mask = (idx < self.blk_last.size) & (doc_ids > self.base_doc)
        out[mask] = self.blk_ub[idx[mask]]
        return out

    def contrib(self, doc_ids: np.ndarray, scorer, stats,
                doc_lens: np.ndarray, shard_base: int) -> np.ndarray:
        """Actual score contribution for given docs (0 when absent)."""
        docs, tfs = self.decode_all()
        idx = np.searchsorted(docs, doc_ids, "left")
        idx_c = np.minimum(idx, docs.size - 1)
        present = (docs.size > 0) & (docs[idx_c] == doc_ids) & (idx < docs.size)
        out = np.zeros(doc_ids.size, dtype=F32)
        if not present.any():
            return out
        p_docs = doc_ids[present]
        p_tfs = tfs[idx[present]]
        dl = doc_lens[p_docs - shard_base]
        if scorer.separable:
            out[present] = self.idf * scorer.doc_part(p_tfs, dl, stats["avg_len"])
        else:
            out[present] = self.weight * scorer.score(
                p_tfs, dl, df=self.df, cf=self.cf,
                num_docs=stats["num_docs"], avg_len=stats["avg_len"],
                collection_len=stats["collection_len"])
        return out


def _canonical_scores(doc_ids: np.ndarray, runs: list[_TermRun], scorer,
                      stats, doc_lens: np.ndarray, shard_base: int) -> np.ndarray:
    """Sum contributions in fixed ascending term_id order (float32) so every
    algorithm produces bit-identical scores for the same doc."""
    total = np.zeros(doc_ids.size, dtype=F32)
    for run in sorted(runs, key=lambda r: r.term_id):
        total = total + run.contrib(doc_ids, scorer, stats, doc_lens, shard_base)
    return total


class _TopK:
    """Running top-k with tie-keeping threshold (topk_queue.hpp analogue;
    ties at the k-th score are kept so the global doc-asc tie-break stays
    exact)."""

    def __init__(self, k: int, theta0: float = 0.0):
        self.k = k
        self.docs: np.ndarray = np.zeros(0, dtype=np.int64)
        self.scores: np.ndarray = np.zeros(0, dtype=F32)
        self.theta = F32(theta0)
        self.seeded = theta0 > 0.0

    def merge(self, docs: np.ndarray, scores: np.ndarray) -> None:
        if docs.size == 0:
            return
        self.docs = np.concatenate((self.docs, docs))
        self.scores = np.concatenate((self.scores, scores))
        if self.docs.size > self.k:
            kth = np.partition(self.scores, self.scores.size - self.k)[
                self.scores.size - self.k]
            keep = self.scores >= kth
            self.docs, self.scores = self.docs[keep], self.scores[keep]
            self.theta = max(self.theta, F32(kth))
        elif self.docs.size == self.k and not self.seeded:
            self.theta = max(self.theta, F32(self.scores.min()))


def _active_ranges(runs: list[_TermRun], shard_base: int, shard_end: int,
                   range_span: int) -> np.ndarray:
    """Doc ranges (indices) that intersect at least one posting block."""
    n_ranges = (shard_end - shard_base + range_span - 1) // range_span
    diff = np.zeros(n_ranges + 1, dtype=np.int64)
    for run in runs:
        firsts = np.concatenate(([run.base_doc + 1], run.blk_last[:-1] + 1))
        starts = np.clip((firsts - shard_base) // range_span, 0, n_ranges - 1)
        ends = np.clip((run.blk_last - shard_base) // range_span, 0, n_ranges - 1)
        np.add.at(diff, starts, 1)
        np.add.at(diff, ends + 1, -1)
    return np.flatnonzero(np.cumsum(diff[:-1]) > 0)


def _conjunction_docs(runs: list[_TermRun], lo: int, hi: int) -> np.ndarray:
    """Docs present in every run within [lo, hi): candidate-probe from the
    shortest list (and_query.hpp:18-65 semantics, batched via searchsorted
    — the sort-merge skip loop vectorized)."""
    runs_sorted = sorted(runs, key=lambda r: r.n)
    cand = runs_sorted[0].docs_in(lo, hi)[0]
    for run in runs_sorted[1:]:
        if cand.size == 0:
            return cand
        docs, _ = run.decode_all()
        idx = np.searchsorted(docs, cand, "left")
        idx_c = np.minimum(idx, docs.size - 1)
        cand = cand[(docs[idx_c] == cand) & (idx < docs.size)]
    return cand


def _run_kernel(algorithm: str, runs: list[_TermRun], k: int, scorer, stats,
                doc_lens: np.ndarray, shard_base: int, range_span: int,
                theta0: float, n_query_terms: int | None = None,
                counters: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
    """counters (optional dict) accumulates the reference profile_queries
    metrics: ranges visited/skipped, docs actually scored; posting/block
    decode counts are read off the runs afterwards (see profile_queries)."""
    c = counters if counters is not None else {}
    c.setdefault("ranges", 0)
    c.setdefault("ranges_skipped", 0)
    c.setdefault("docs_scored", 0)
    shard_end = shard_base + doc_lens.size
    topk = _TopK(k, theta0)
    if algorithm in ("ranked_and", "block_max_ranked_and"):
        # conjunction: a term absent from this shard empties the whole shard
        if n_query_terms is not None and len(runs) < n_query_terms:
            return topk.docs, topk.scores
    if algorithm == "ranked_or":
        # exhaustive disjunction: one pass, no pruning
        all_docs = np.unique(np.concatenate([r.decode_all()[0] for r in runs]))
        scores = _canonical_scores(all_docs, runs, scorer, stats, doc_lens,
                                   shard_base)
        c["docs_scored"] += int(all_docs.size)
        pos = scores > 0  # reference finalize() drops <= 0 (topk_queue.hpp:77)
        topk.merge(all_docs[pos], scores[pos])
        return topk.docs, topk.scores

    ridx = _active_ranges(runs, shard_base, shard_end, range_span)
    if ridx.size == 0:
        return topk.docs, topk.scores
    los = shard_base + ridx * range_span
    his = np.minimum(los + range_span, shard_end)
    # per-(run, range) upper bounds, vectorized across ALL ranges up front
    # (one searchsorted pair + one reduceat per run instead of four numpy
    # calls per run per range)
    if algorithm == "wand":
        # plain WAND: per-term bounds only (no block-max refinement)
        ub_mat = np.stack([
            np.where(run.spans_nonempty(los, his), run.ub, F32(0.0))
            for run in runs]).astype(F32, copy=False)
    else:
        ub_mat = np.stack([run.range_ubs_batch(los, his) for run in runs])
    sum_ub = ub_mat.sum(axis=0, dtype=F32)
    if counters is None:
        # hot path: visit ranges in DESCENDING bound order so theta converges
        # in the first few ranges and the rest bulk-prune via early exit.
        # Result-identical to docID order: a doc whose exact score reaches the
        # true k-th score is never discarded (theta <= true k-th throughout,
        # final filtering is exact canonical scores), and the caller's
        # (score desc, doc asc) rank cut is order-independent.
        visit = np.argsort(-sum_ub, kind="stable")
        descending = True
        if algorithm in ("block_max_wand", "wand", "maxscore",
                         "block_max_maxscore") and visit.size > 12:
            # two-wave pruning for the disjunctive algorithms: a short
            # sequential head converges theta, then every remaining live
            # range is processed in ONE vectorized bulk pass below (per-doc
            # bounds + one canonical scoring) — removes the per-range Python
            # loop from the hot serve path. Safe: the bulk prune uses the
            # head's theta, which can only be <= the fully-sequential theta,
            # so it scores a superset of the sequential candidates; exact
            # canonical scores decide the rest. Conjunctive algorithms keep
            # the per-range walk (their candidate SET depends on the
            # intersection semantics, not just pruning).
            bulk_tail = visit[8:]
            visit = visit[:8]
        else:
            bulk_tail = None
    else:
        bulk_tail = None
        # profile mode keeps the reference's docID-order walk so the
        # visited/skipped counters keep their published semantics
        # (tools/profile_queries.cpp range loop)
        visit = np.arange(ridx.size)
        descending = False
    for j in visit:
        lo = int(los[j])
        hi = int(his[j])
        # pruning threshold with a few float32 ulps of slack: upper-bound
        # sums accumulate in a different order than canonical scores, so an
        # exactly-tied doc's bound can round 1 ulp below theta. Final
        # filtering uses exact canonical scores, so results stay exact.
        prune = topk.theta * F32(1.0 - 1e-6)
        ubs = ub_mat[:, j]
        c["ranges"] += 1
        if sum_ub[j] < prune or not (ubs > 0).any():
            c["ranges_skipped"] += 1
            if descending:
                break  # every remaining range has an equal-or-smaller bound
            continue  # whole range cannot beat theta (block-max range skip)
        order = np.argsort(ubs, kind="stable")

        if algorithm in ("block_max_wand", "wand"):
            cand = np.unique(np.concatenate(
                [run.docs_in(lo, hi)[0] for run in runs]))
            if cand.size == 0:
                continue
            bound = np.zeros(cand.size, dtype=F32)
            for run in runs:
                bound += (run.doc_block_ub(cand)
                          if algorithm == "block_max_wand"
                          else run.doc_term_ub(cand))
            cand = cand[bound >= prune]
        elif algorithm in ("ranked_and", "block_max_ranked_and"):
            cand = _conjunction_docs(runs, lo, hi)
            if cand.size == 0:
                continue
            if algorithm == "block_max_ranked_and":
                # block-level bound before scoring
                # (block_max_ranked_and_query.hpp semantics)
                bound = np.zeros(cand.size, dtype=F32)
                for run in runs:
                    bound += run.doc_block_ub(cand)
                cand = cand[bound >= prune]
        elif algorithm in ("maxscore", "block_max_maxscore"):
            # non-essential prefix (ascending ub) with cum-ub strictly below
            # theta can never alone lift a doc past the threshold
            cum = np.cumsum(ubs[order], dtype=F32)
            n_noness = int(np.searchsorted(cum, prune, "left"))
            noness = [(runs[i], ubs[i]) for i in order[:n_noness]]
            ess = [runs[i] for i in order[n_noness:]]
            if not ess:
                continue
            cand = np.unique(np.concatenate(
                [run.docs_in(lo, hi)[0] for run in ess]))
            if cand.size == 0:
                continue
            partial = np.zeros(cand.size, dtype=F32)
            for run in ess:
                partial += run.contrib(cand, scorer, stats, doc_lens, shard_base)
            noness_sorted = sorted(noness, key=lambda p: -p[1])
            if algorithm == "block_max_maxscore":
                # per-doc refinement: bound each candidate's remaining
                # non-essential mass by the max of the BLOCK that would
                # contain it in each unprobed list, not the list's range
                # max (reference block_max_maxscore_query.hpp:10-101's
                # block_max_score at the cursor, batched per doc-range).
                # Still a safe upper bound per doc, so pruning stays exact.
                nb = [run.doc_block_ub(cand) for run, _ in noness_sorted]
                rem = (np.sum(nb, axis=0, dtype=F32) if nb
                       else np.zeros(cand.size, dtype=F32))
                keep = partial + rem >= prune
                cand, partial, rem = cand[keep], partial[keep], rem[keep]
                nb = [b[keep] for b in nb]
                for i, (run, _) in enumerate(noness_sorted):
                    if cand.size == 0:
                        break
                    partial += run.contrib(cand, scorer, stats, doc_lens,
                                           shard_base)
                    rem = rem - nb[i]
                    keep = partial + rem >= prune
                    cand, partial, rem = cand[keep], partial[keep], rem[keep]
                    nb = [b[keep] for b in nb]
            else:
                remaining = F32(sum(ub for _, ub in noness))
                keep = partial + remaining >= prune
                cand, partial = cand[keep], partial[keep]
                for run, ub in noness_sorted:
                    if cand.size == 0:
                        break
                    partial += run.contrib(cand, scorer, stats, doc_lens,
                                           shard_base)
                    remaining = F32(remaining - ub)
                    keep = partial + remaining >= prune
                    cand, partial = cand[keep], partial[keep]
        else:
            raise ValueError(f"unknown algorithm {algorithm!r}")

        if cand.size == 0:
            continue
        scores = _canonical_scores(cand, runs, scorer, stats, doc_lens,
                                   shard_base)
        c["docs_scored"] += int(cand.size)
        keep = (scores >= topk.theta) & (scores > 0)
        topk.merge(cand[keep], scores[keep])

    if bulk_tail is not None and bulk_tail.size:
        prune = topk.theta * F32(1.0 - 1e-6)
        live = bulk_tail[(sum_ub[bulk_tail] >= prune)
                         & (sum_ub[bulk_tail] > 0)]
        if live.size:
            blos, bhis = los[live], his[live]
            cand = np.unique(np.concatenate(
                [run.docs_in_batch(blos, bhis) for run in runs]))
            if cand.size:
                # per-doc bound at each algorithm's own granularity: block
                # max for the block-max family, term max for wand/maxscore
                block_refined = algorithm in ("block_max_wand",
                                              "block_max_maxscore")
                bound = np.zeros(cand.size, dtype=F32)
                for run in runs:
                    bound += (run.doc_block_ub(cand) if block_refined
                              else run.doc_term_ub(cand))
                cand = cand[bound >= prune]
            if cand.size:
                scores = _canonical_scores(cand, runs, scorer, stats,
                                           doc_lens, shard_base)
                c["docs_scored"] += int(cand.size)
                keep = (scores >= topk.theta) & (scores > 0)
                topk.merge(cand[keep], scores[keep])
    return topk.docs, topk.scores


def make_query_terms_df(spark, queries: list[str], cfg: IndexConfig):
    rows = analyze_query_terms(queries, cfg)
    return spark.createDataFrame(rows, "qid string, term string, weight double")


# ------------------------------------------------------------ serving path

# driver-memory bounds for the serve caches: above these the serve path
# declines and topk_search falls back to the fully distributed join plan
SERVE_MAX_DOCS = 1 << 23            # doc_lens dict (~64 MB int64)
SERVE_MAX_PARTIAL_ROWS = 1 << 21    # shards x queries x k merge bound
SERVE_COLLECT_MAX_POSTINGS = 1 << 22  # per-call driver fetch bound
SERVE_CACHE_MAX_POSTINGS = 1 << 24    # resident posting-row cache budget


class _ServeState:
    """Driver-resident serving state, built lazily per index and cached on
    it — the re-expression of what the reference query tools do before
    evaluating anything: load the term lexicon and document sizes into
    memory and mmap the index (tools/queries.cpp:279-340). Here the
    "mmap" is a lazily-populated per-term cache of encoded posting rows
    fetched from the distributed index (one column-pruned job per group of
    first-seen terms), bounded by SERVE_CACHE_MAX_POSTINGS with FIFO
    eviction."""

    __slots__ = ("tmeta", "smeta", "bc_shards", "n_shards",
                 "rows_by_term", "cached_postings", "complete", "term_runs",
                 "global_doc_lens")

    def __init__(self, tmeta, smeta, bc_shards):
        self.tmeta = tmeta
        self.smeta = smeta
        self.bc_shards = bc_shards
        self.n_shards = len(smeta)
        # global doc-length array indexed by docID: lets unweighted
        # queries traverse ONE virtual shard — one kernel invocation per
        # query instead of one per shard. Span-aligned builds leave docID
        # gaps at bucket boundaries; gap slots stay 0 and never appear in
        # any posting list. Requires only non-overlapping shard ranges.
        bases = sorted(smeta.values(), key=lambda m: m[0])
        prev_end, ok = 0, True
        for b, dl in bases:
            if b < prev_end:
                ok = False
                break
            prev_end = b + dl.size
        if ok and bases:
            g = np.zeros(prev_end, dtype=np.int64)
            for b, dl in bases:
                g[b:b + dl.size] = dl
            self.global_doc_lens = g
        else:
            self.global_doc_lens = None
        self.rows_by_term: dict[str, dict] = {}
        self.cached_postings = 0
        # True when the ENTIRE index's posting rows are resident (small
        # indexes prefetch at state build, the reference's load-up-front
        # model) — per-query fetch jobs and eviction are then skipped.
        self.complete = False
        # unweighted _TermRun reuse across queries, keyed (term_id,
        # shard_id): a run is immutable except its lazily-decoded
        # docs/tfs arrays, so repeat terms skip the block decode — the
        # reference's cursors likewise read the same in-memory lists on
        # every query. Evicted together with rows_by_term.
        self.term_runs: dict[tuple[int, int], object] = {}


def _serve_state(index, prefetch: bool = True):
    """Build (once) or fetch the index's _ServeState; None when the index
    exceeds the driver-memory bounds (callers fall back to the
    distributed join plan).

    prefetch=False builds/returns the METADATA-ONLY state (lexicon +
    shard meta — two bounded collects, no posting bytes): the batch
    executor needs tmeta/smeta for driver-side query analysis but runs
    its kernels executor-side and never reads the driver row cache, so
    it must not pay the whole-index posting fetch. The prefetch runs
    lazily on the first interactive-serve use instead."""
    cached = getattr(index, "_serve_state", None)
    if cached is not None:
        if cached is False:
            return None
        if prefetch:
            _serve_prefetch(index, cached)
        return cached
    spark = index.lexicon.sparkSession
    if index.stats.get("num_docs", 1 << 62) > SERVE_MAX_DOCS:
        index._serve_state = False
        return None
    cap = index.cfg.lexicon_broadcast_max
    rows = (index.lexicon.select("term", "term_id", "df", "cf")
            .limit(cap + 1).collect())
    if len(rows) > cap:
        index._serve_state = False
        return None
    tmeta = {r["term"]: (int(r["term_id"]), int(r["df"]), int(r["cf"]))
             for r in rows}
    smeta = {}
    for r in index.shards.select("shard_id", "base_doc", "doc_lens").collect():
        smeta[int(r["shard_id"])] = (
            int(r["base_doc"]), np.asarray(r["doc_lens"], dtype=np.int64))
    bc = spark.sparkContext.broadcast(smeta)
    st = _ServeState(tmeta, smeta, bc)
    index._serve_state = st
    if prefetch:
        _serve_prefetch(index, st)
    return st


def _serve_prefetch(index, st) -> None:
    """Whole-index posting prefetch: when every posting row fits the
    resident cache budget, fetch them ALL in one job — the reference's
    query tools likewise load/mmap the full index before serving a single
    query (tools/queries.cpp:279-340). Per-query serve latency then never
    pays a Spark job: first-seen terms are already resident. No-op when
    already complete or when the index exceeds the budget (the lazy
    bounded per-term cache handles those)."""
    if st.complete:
        return
    tmeta = st.tmeta
    total_postings = sum(m[1] for m in tmeta.values())
    if total_postings > SERVE_CACHE_MAX_POSTINGS:
        return
    src = getattr(index, "postings_str", None)
    pdf = (src if src is not None else index.postings).toPandas()
    if "term" in pdf.columns:
        pdf = pdf.assign(
            term_id=pdf["term"].map(lambda t: tmeta[t][0]))
    else:
        id2term = {m[0]: t for t, m in tmeta.items()}
        pdf = pdf.assign(term=pdf["term_id"].map(id2term))
    id2meta = {m[0]: (m[1], m[2]) for m in tmeta.values()}
    pdf = pdf.assign(
        df=pdf["term_id"].map(lambda t: id2meta[int(t)][0]),
        cf=pdf["term_id"].map(lambda t: id2meta[int(t)][1]))
    terms_np = pdf["term"].to_numpy()
    pdf = pdf.drop(columns=["term"])
    for t, row in zip(terms_np, pdf.itertuples(index=False)):
        st.rows_by_term.setdefault(t, {})[int(row.shard_id)] = row
    st.cached_postings = total_postings
    st.complete = True


def _topk_search_serve(index, queries: list[str], k: int, algorithm: str,
                       weighted: bool, range_span: int,
                       thresholds: dict[str, float] | None, with_urls: bool):
    """Low-latency executor (the reference's interactive `queries` tool
    shape, tools/queries.cpp:279-462).

    The join plan pays a lexicon-join job, a postings+shards join, a
    groupBy shuffle and a window stage per call — seconds of scheduling
    floor for milliseconds of work. Here query terms resolve against the
    driver-cached lexicon (no job), and the posting rows for the query
    vocabulary are fetched in ONE column-pruned job into the per-term
    serve cache (repeat terms: zero jobs) — then the traversal kernels run
    driver-side over the cached rows, exactly as the reference runs them
    over its mmap'd index. Oversized term sets (fetch above
    SERVE_COLLECT_MAX_POSTINGS) run the kernels executor-side instead, in
    a single mapInPandas pass over the term-filtered postings. Both modes
    produce the join plan's exact ranking ((score desc, doc asc), same
    kernels, same float32 scores).

    Returns None when the index/meta exceeds the serve bounds."""
    from pyspark.sql import functions as F

    st = _serve_state(index)
    if st is None:
        return None
    cfg = index.cfg
    spark = index.lexicon.sparkSession
    stats = dict(index.stats)
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    codec = cfg.codec
    thr = dict(thresholds or {})

    term_queries: dict[int, list] = {}
    term_stats: dict[int, tuple] = {}
    n_terms: dict[str, int] = {}
    tid_of_term: dict[str, int] = {}
    for qid, term, w in analyze_query_terms(queries, cfg):
        n_terms.setdefault(qid, 0)
        meta = st.tmeta.get(term)
        if meta is None:
            continue  # unknown term dropped (reference query_parser.cpp:33-38)
        tid, df_, cf_ = meta
        tid_of_term[term] = tid
        term_queries.setdefault(tid, []).append((qid, float(w)))
        term_stats[tid] = (df_, cf_)
        n_terms[qid] += 1
    if st.n_shards * max(1, len(n_terms)) * k > SERVE_MAX_PARTIAL_ROWS:
        return None

    out_schema = "qid string, doc_id long, score float, rank int"
    enc_str = getattr(index, "postings_str", None)

    def _filtered_posts(terms: list[str]):
        """Term-filtered posting rows with term_id/df/cf attached lazily.
        Prefers the string-keyed rows: the id-keyed postings view is a
        lazy broadcast join whose lexicon broadcast would be rebuilt on
        EVERY query job (~350 ms/query measured at 60k docs)."""
        if enc_str is not None:
            return enc_str.filter(F.col("term").isin(terms))
        return index.postings.filter(
            F.col("term_id").isin([tid_of_term[t] for t in terms]))

    def _attach_meta(pdf: pd.DataFrame) -> pd.DataFrame:
        if "term" in pdf.columns:
            pdf = pdf.assign(
                term_id=pdf["term"].map(tid_of_term)).drop(columns=["term"])
        return pdf.assign(
            df=pdf["term_id"].map(lambda t: term_stats[int(t)][0]),
            cf=pdf["term_id"].map(lambda t: term_stats[int(t)][1]))

    def _kernel_over_shards(shard_rows, doc_lens_of, run_cache=None):
        """Run the traversal kernels for every (shard, query); shard_rows:
        iterable of (shard_id, [row, ...]). run_cache (driver mode only):
        (term_id, shard_id) -> _TermRun memo so repeat terms skip block
        decode across calls (runs are immutable; unweighted only)."""
        out_q, out_d, out_s = [], [], []
        for sid, rows in shard_rows:
            shard_base, doc_lens = doc_lens_of(int(sid))
            by_query: dict[str, list] = {}
            for row in rows:
                if weighted:
                    shared = None
                elif run_cache is not None:
                    rkey = (int(row.term_id), int(sid))
                    shared = run_cache.get(rkey)
                    if shared is None:
                        shared = _TermRun(row, scorer, stats, 1.0, False,
                                          codec)
                        run_cache[rkey] = shared
                else:
                    shared = _TermRun(row, scorer, stats, 1.0, False, codec)
                for qid, w in term_queries.get(int(row.term_id), ()):
                    r = shared if shared is not None else _TermRun(
                        row, scorer, stats, w, weighted, codec)
                    by_query.setdefault(qid, []).append(r)
            for qid, runs in by_query.items():
                docs_, scores_ = _run_kernel(
                    algorithm, runs, k, scorer, stats, doc_lens, shard_base,
                    range_span, float(thr.get(qid, 0.0)),
                    n_query_terms=n_terms.get(qid))
                out_q.append(np.repeat(qid, docs_.size))
                out_d.append(docs_)
                out_s.append(scores_)
        if not out_q:
            return pd.DataFrame({"qid": pd.Series(dtype=object),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float32")})
        return pd.DataFrame({
            "qid": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d).astype(np.int64),
            "score": np.concatenate(out_s).astype(np.float32)})

    if not term_stats:
        partial = pd.DataFrame({"qid": pd.Series(dtype=object),
                                "doc_id": pd.Series(dtype="int64"),
                                "score": pd.Series(dtype="float32")})
    else:
        missing = ([] if st.complete else
                   [t for t in tid_of_term if t not in st.rows_by_term])
        est_fetch = sum(st.tmeta[t][1] for t in missing)
        if est_fetch <= SERVE_COLLECT_MAX_POSTINGS:
            # ---- driver mode: fetch first-seen terms' rows (one job, or
            # zero if all cached), kernel locally
            if missing:
                fetched = _attach_meta(_filtered_posts(missing).toPandas())
                id2term = {tid_of_term[t]: t for t in missing}
                for t in missing:
                    st.rows_by_term[t] = {}
                for row in fetched.itertuples(index=False):
                    t = id2term[int(row.term_id)]
                    st.rows_by_term[t][int(row.shard_id)] = row
                st.cached_postings += int(fetched["n"].sum()) if len(fetched) else 0
                # FIFO eviction: drop oldest terms not in this query
                current = set(tid_of_term)
                while st.cached_postings > SERVE_CACHE_MAX_POSTINGS:
                    victim = next((t for t in st.rows_by_term
                                   if t not in current), None)
                    if victim is None:
                        break
                    rows = st.rows_by_term.pop(victim)
                    st.cached_postings -= sum(int(r.n) for r in rows.values())
                    vtid = st.tmeta[victim][0]
                    st.term_runs.pop((vtid, -1), None)
                    for vsid in rows:
                        st.term_runs.pop((vtid, int(vsid)), None)
            if not weighted and st.global_doc_lens is not None:
                # ---- whole-index traversal: every resident term's shard
                # rows merge into ONE global run (memoized), and each query
                # runs ONE kernel over the dense global doc space — the
                # reference's single-cursor-set walk, vs one kernel per
                # (shard, query). Identical ranking: same kernels, same
                # float32 scores, docIDs/block metadata are absolute.
                def _global_run(t: str):
                    key = (tid_of_term[t], -1)
                    g = st.term_runs.get(key)
                    if g is None:
                        rows = st.rows_by_term.get(t, {})
                        sruns = [_TermRun(r, scorer, stats, 1.0, False,
                                          codec) for r in rows.values()]
                        if not sruns:
                            return None
                        g = (sruns[0] if len(sruns) == 1
                             else _TermRun.merged(sruns))
                        st.term_runs[key] = g
                    return g

                qid_terms: dict[str, list] = {}
                for tid, qws in term_queries.items():
                    for qid, _w in qws:
                        qid_terms.setdefault(qid, []).append(tid)
                term_of_tid = {tid_of_term[t]: t for t in tid_of_term}
                gdl = st.global_doc_lens
                out_q, out_d, out_s = [], [], []
                for qid, tids in qid_terms.items():
                    runs = [g for tid in tids
                            if (g := _global_run(term_of_tid[tid]))]
                    if not runs:
                        continue
                    docs_, scores_ = _run_kernel(
                        algorithm, runs, k, scorer, stats, gdl, 0,
                        range_span, float(thr.get(qid, 0.0)),
                        n_query_terms=n_terms.get(qid))
                    out_q.append(np.repeat(qid, docs_.size))
                    out_d.append(docs_)
                    out_s.append(scores_)
                if out_q:
                    partial = pd.DataFrame({
                        "qid": np.concatenate(out_q),
                        "doc_id": np.concatenate(out_d).astype(np.int64),
                        "score": np.concatenate(out_s).astype(np.float32)})
                else:
                    partial = pd.DataFrame({
                        "qid": pd.Series(dtype=object),
                        "doc_id": pd.Series(dtype="int64"),
                        "score": pd.Series(dtype="float32")})
            else:
                shard_rows: dict[int, list] = {}
                for t in tid_of_term:
                    for sid, row in st.rows_by_term.get(t, {}).items():
                        shard_rows.setdefault(sid, []).append(row)
                partial = _kernel_over_shards(shard_rows.items(),
                                              lambda sid: st.smeta[sid],
                                              run_cache=st.term_runs)
        else:
            # ---- distributed mode: kernels run executor-side in one
            # mapInPandas pass over the term-filtered postings (co-located
            # by shard; coalesced so the python-worker round-trip count
            # stays small for a latency-path job)
            posts = _filtered_posts(list(tid_of_term))
            parts = spark.sparkContext.defaultParallelism
            if not getattr(index, "postings_colocated", False):
                posts = posts.repartition(min(parts, st.n_shards),
                                          "shard_id")
            else:
                posts = posts.coalesce(min(parts, 16))
            bc_shards = st.bc_shards

            def run(batches):
                chunks = [c for c in batches if len(c)]
                if not chunks:
                    return
                pdf = _attach_meta(chunks[0] if len(chunks) == 1
                                   else pd.concat(chunks, ignore_index=True))
                smeta = bc_shards.value
                yield _kernel_over_shards(
                    ((sid, list(grp.itertuples(index=False)))
                     for sid, grp in pdf.groupby("shard_id", sort=False)),
                    lambda sid: smeta[sid])

            partial = posts.mapInPandas(
                run, schema=TOPK_PARTIAL_SCHEMA).toPandas()

    if len(partial):
        # driver-side k-merge of the per-shard partials — same
        # (score desc, doc asc) total order as the join plan's window
        partial = partial.sort_values(["qid", "score", "doc_id"],
                                      ascending=[True, False, True],
                                      kind="mergesort")
        partial["rank"] = (partial.groupby("qid", sort=False).cumcount() + 1
                           ).astype("int32")
        partial = partial[partial["rank"] <= k]
    else:
        partial = partial.assign(rank=pd.Series(dtype="int32"))
    out = spark.createDataFrame(partial, out_schema)
    if with_urls:
        return (out.join(index.docs.select("doc_id", "url"), "doc_id")
                .select("qid", "doc_id", "url", "score", "rank"))
    return out


def topk_search(index, queries: list[str] | object, k: int = 10,
                algorithm: str = "maxscore", weighted: bool = False,
                range_span: int = 16384,
                thresholds: dict[str, float] | None = None,
                with_urls: bool = True):
    """Run BM25 (or configured scorer) top-k retrieval.

    queries: raw query lines or a (qid, term, weight) DataFrame.
    Returns DataFrame (qid, doc_id, url, score, rank); with_urls=False skips
    the doclex join (one fewer join per query — latency path).

    List queries route through the one-job serve plan (_topk_search_serve,
    identical kernels and ranking) whenever the index fits the serve
    bounds; the fully distributed join plan below is the fallback and the
    path for DataFrame query sets.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    algorithm = _ALGORITHM_ALIASES.get(algorithm, algorithm)
    if isinstance(queries, list):
        served = _topk_search_serve(index, queries, k, algorithm, weighted,
                                    range_span, thresholds, with_urls)
        if served is not None:
            return served
    cfg = index.cfg
    spark = index.lexicon.sparkSession
    stats = dict(index.stats)
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    if isinstance(queries, list):
        qterms = make_query_terms_df(spark, queries, cfg)
    else:
        qterms = queries

    # unknown terms are dropped by the inner join
    # (reference query_parser.cpp:33-38)
    q = qterms.join(index.lexicon.select("term", "term_id", "df", "cf"), "term")
    # conjunction algorithms need the per-query term count to empty shards
    # that lack one of the terms
    q = q.withColumn(
        "n_query_terms",
        F.count("*").over(W.partitionBy("qid")).cast("int"))
    # the query side is small by construction: broadcast it so the postings
    # table is never shuffled (scan + broadcast-hash-join + partial prune)
    joined = (
        F.broadcast(q).join(index.postings, "term_id")
        .join(index.shards.select("shard_id", "base_doc", "doc_lens")
              .withColumnRenamed("base_doc", "shard_base"), "shard_id")
    )

    codec = cfg.codec
    thr = dict(thresholds or {})

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid, shard_id = key[0], int(key[1])
        doc_lens = np.asarray(pdf["doc_lens"].iat[0], dtype=np.int64)
        shard_base = int(pdf["shard_base"].iat[0])
        runs = [
            _TermRun(row, scorer, stats, float(row.weight), weighted, codec)
            for row in pdf.itertuples(index=False)
        ]
        docs, scores = _run_kernel(
            algorithm, runs, k, scorer, stats, doc_lens, shard_base,
            range_span, float(thr.get(qid, 0.0)),
            n_query_terms=int(pdf["n_query_terms"].iat[0]))
        return pd.DataFrame({
            "qid": np.repeat(qid, docs.size),
            "doc_id": docs,
            "score": scores.astype(np.float32),
        })

    partial = joined.groupBy("qid", "shard_id").applyInPandas(
        kernel, schema=TOPK_PARTIAL_SCHEMA)

    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if not with_urls:
        return ranked.select("qid", "doc_id", "score", "rank")
    return (
        ranked.join(index.docs.select("doc_id", "url"), "doc_id")
        .select("qid", "doc_id", "url", "score", "rank")
    )


PROFILE_SCHEMA = ("qid string, shard_id long, postings_decoded long, "
                  "blocks_decoded long, docs_scored long, ranges long, "
                  "ranges_skipped long")


def profile_queries(index, queries: list[str] | object, k: int = 10,
                    algorithm: str = "block_max_wand",
                    range_span: int = 16384):
    """Per-(query, shard) execution counters (reference
    tools/profile_queries.cpp: its block_freq_index counts postings/blocks
    touched per query; here the kernels count ranges visited/skipped and
    docs fully scored, and posting/block decode counts are read off the
    lazily-decoded runs after the kernel returns).

    Returns (qid, shard_id, postings_decoded, blocks_decoded, docs_scored,
    ranges, ranges_skipped) — aggregate over shard_id for per-query totals.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    algorithm = _ALGORITHM_ALIASES.get(algorithm, algorithm)
    cfg = index.cfg
    spark = index.lexicon.sparkSession
    stats = dict(index.stats)
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    qterms = (make_query_terms_df(spark, queries, cfg)
              if isinstance(queries, list) else queries)
    q = qterms.join(index.lexicon.select("term", "term_id", "df", "cf"),
                    "term")
    q = q.withColumn("n_query_terms",
                     F.count("*").over(W.partitionBy("qid")).cast("int"))
    joined = (
        F.broadcast(q).join(index.postings, "term_id")
        .join(index.shards.select("shard_id", "base_doc", "doc_lens")
              .withColumnRenamed("base_doc", "shard_base"), "shard_id")
    )
    codec = cfg.codec

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid, shard_id = key[0], int(key[1])
        doc_lens = np.asarray(pdf["doc_lens"].iat[0], dtype=np.int64)
        shard_base = int(pdf["shard_base"].iat[0])
        runs = [_TermRun(row, scorer, stats, float(row.weight), False, codec)
                for row in pdf.itertuples(index=False)]
        counters: dict = {}
        _run_kernel(algorithm, runs, k, scorer, stats, doc_lens, shard_base,
                    range_span, 0.0,
                    n_query_terms=int(pdf["n_query_terms"].iat[0]),
                    counters=counters)
        decoded = [r for r in runs if r._docs is not None]
        return pd.DataFrame({
            "qid": [qid], "shard_id": [shard_id],
            "postings_decoded": [sum(r.n for r in decoded)],
            "blocks_decoded": [sum(int(r.blk_last.size) for r in decoded)],
            "docs_scored": [counters["docs_scored"]],
            "ranges": [counters["ranges"]],
            "ranges_skipped": [counters["ranges_skipped"]],
        })

    return joined.groupBy("qid", "shard_id").applyInPandas(
        kernel, schema=PROFILE_SCHEMA)


def topk_search_batch(index, queries: list[str], k: int = 10,
                      algorithm: str = "maxscore", weighted: bool = False,
                      range_span: int = 16384,
                      thresholds: dict[str, float] | None = None,
                      with_urls: bool = False):
    """Batch-query executor: the physical strategy for LARGE query sets.

    topk_search joins the query table into the postings, which duplicates a
    hot term's posting row once per query using it. Here the (small by
    construction — reference query files are KBs) analyzed query set is
    broadcast instead, the postings are filtered to the query vocabulary and
    co-located by shard, and ONE kernel pass per shard answers every query —
    the reference's evaluate_queries shape (parallel over queries, shared
    mmap'd index, evaluate_queries.cpp:154-156) with shards as the unit of
    parallelism. Results are identical to topk_search (same kernels).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    algorithm = _ALGORITHM_ALIASES.get(algorithm, algorithm)
    cfg = index.cfg
    spark = index.lexicon.sparkSession
    stats = dict(index.stats)
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())

    # ---- query analysis: when the driver-resident serve state exists
    # (lexicon + shard metadata cached, same bounds as the interactive
    # path), analyze driver-side — zero Spark jobs before the main pass.
    # The reference's evaluate_queries likewise resolves terms against the
    # loaded lexicon before any evaluation (evaluate_queries.cpp:79-101).
    st = (_serve_state(index, prefetch=False)
          if isinstance(queries, list) else None)
    term_queries: dict[int, list] = {}
    term_stats: dict[int, tuple] = {}
    n_terms: dict[str, int] = {}
    tid_of_term: dict[str, int] = {}
    if st is not None:
        for qid, term, w in analyze_query_terms(queries, cfg):
            n_terms.setdefault(qid, 0)
            meta = st.tmeta.get(term)
            if meta is None:
                continue  # unknown term dropped (query_parser.cpp:33-38)
            tid, df_, cf_ = meta
            tid_of_term[term] = tid
            term_queries.setdefault(tid, []).append((qid, float(w)))
            term_stats[tid] = (df_, cf_)
            n_terms[qid] += 1
    else:
        qterms = (make_query_terms_df(spark, queries, cfg)
                  if isinstance(queries, list) else queries)
        qrows = (qterms.join(
            index.lexicon.select("term", "term_id", "df", "cf"), "term")
            .select("qid", "term_id", "weight", "df", "cf").collect())
        for r in qrows:
            term_queries.setdefault(int(r["term_id"]), []).append(
                (r["qid"], float(r["weight"])))
            term_stats[int(r["term_id"])] = (int(r["df"]), int(r["cf"]))
            n_terms[r["qid"]] = n_terms.get(r["qid"], 0) + 1
    bc = spark.sparkContext.broadcast(
        (term_queries, term_stats, n_terms, dict(thresholds or {})))

    from pisa_spark.operators.partitioning import (partition_values,
                                                   round_robin_expr)

    parts = spark.sparkContext.defaultParallelism
    wanted = list(term_stats)
    enc_str = getattr(index, "postings_str", None)
    smeta_bc = st.bc_shards if st is not None else None
    if st is not None and enc_str is not None:
        # string-keyed rows: the id-keyed postings view is a lazy broadcast
        # join whose lexicon broadcast would be rebuilt on every batch job
        posts = enc_str.filter(F.col("term").isin(list(tid_of_term)))
    elif st is not None:
        posts = index.postings.filter(F.col("term_id").isin(wanted))
    else:
        posts = (index.postings.filter(F.col("term_id").isin(wanted))
                 .join(index.shards.select(
                     "shard_id", F.col("base_doc").alias("shard_base"),
                     "doc_lens"), "shard_id"))
    if getattr(index, "postings_colocated", False) and smeta_bc is not None:
        # docwise-encoded buckets already hold whole shards: coalesce
        # merges partitions without splitting them, so the shuffle the
        # repartition below pays is skipped entirely
        posts = (posts.coalesce(parts)
                 .sortWithinPartitions("shard_id"))
    else:
        # shards -> partitions round-robin: shard ids are dense ints, and
        # raw hash placement would idle ~1/e of the executors when
        # shards ~ cores
        vals = partition_values(spark, parts)
        posts = (posts.repartition(
            parts, round_robin_expr(F.col("shard_id"), parts, vals))
            .sortWithinPartitions("shard_id"))

    codec = cfg.codec

    def run_shard(pdf: pd.DataFrame):
        tq, tstats, ntq, thr = bc.value
        if smeta_bc is not None:
            shard_base, doc_lens = smeta_bc.value[int(pdf["shard_id"].iat[0])]
        else:
            doc_lens = np.asarray(pdf["doc_lens"].iat[0], dtype=np.int64)
            shard_base = int(pdf["shard_base"].iat[0])
        if "term" in pdf.columns:
            pdf = pdf.assign(
                term_id=pdf["term"].map(tid_of_term)).drop(columns=["term"])
        pdf = pdf.assign(
            df=pdf["term_id"].map(lambda t: tstats[int(t)][0]),
            cf=pdf["term_id"].map(lambda t: tstats[int(t)][1]),
            weight=1.0)
        by_query: dict[str, list] = {}
        for row in pdf.itertuples(index=False):
            shared = None if weighted else _TermRun(
                row, scorer, stats, 1.0, False, codec)
            for qid, w in tq.get(int(row.term_id), ()):
                # unweighted runs share one object => one decode per row
                # even when many queries use the term
                run = shared if shared is not None else _TermRun(
                    row, scorer, stats, w, weighted, codec)
                by_query.setdefault(qid, []).append(run)
        out_q, out_d, out_s = [], [], []
        for qid, runs in by_query.items():
            docs, scores = _run_kernel(
                algorithm, runs, k, scorer, stats, doc_lens, shard_base,
                range_span, float(thr.get(qid, 0.0)),
                n_query_terms=ntq.get(qid))
            out_q.append(np.repeat(qid, docs.size))
            out_d.append(docs)
            out_s.append(scores)
        if not out_q:
            return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
        return pd.DataFrame({
            "qid": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d).astype(np.int64),
            "score": np.concatenate(out_s).astype(np.float32)})

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["shard_id"].iat[-1]
            tail = pdf["shard_id"].to_numpy() == last
            if tail.all():
                carry = pdf
                continue
            first_tail = int(np.flatnonzero(tail).min())
            complete, carry = pdf.iloc[:first_tail], pdf.iloc[first_tail:]
            for _, grp in complete.groupby("shard_id", sort=False):
                yield run_shard(grp)
        if carry is not None and len(carry):
            for _, grp in carry.groupby("shard_id", sort=False):
                yield run_shard(grp)

    partial = posts.mapInPandas(run, schema=TOPK_PARTIAL_SCHEMA)
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (partial.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k))
    if not with_urls:
        return ranked.select("qid", "doc_id", "score", "rank")
    return (ranked.join(index.docs.select("doc_id", "url"), "doc_id")
            .select("qid", "doc_id", "url", "score", "rank"))


def _corpus_tf(docs_df, id_col: str, text_col: str):
    """(tf, doc_len, n_docs, total_tokens) for the exhaustive DataFrame
    scorers, with the corpus tokenized exactly ONCE.

    The naive lineage (toks -> doc_len / tf / cf branches + driver stats)
    re-runs the tokenize+explode scan once per consumer — four full passes
    per query — because Catalyst does not share common subplans across
    DataFrame branches. tf is therefore materialized with an eager
    localCheckpoint (scoped to this call: every invocation recomputes from
    the parquet input), and doc_len / df / cf / collection stats are all
    derived from it: dl == sum(tf) per doc and cf == sum(tf) per term are
    the same integers toks.groupBy(...).count() produces."""
    from collections import Counter

    from pyspark.sql import functions as F

    from pisa_spark.functions.tokenize import english_tokens

    # tf built in ONE fused Arrow pass (the index build's tokenize shape,
    # plans/build.doc_term_counts): per-doc Counter inside mapInPandas
    # emits the (doc_id, term, tf) rows directly — no token explode, no
    # aggregation shuffle. Row-identical to
    # explode(english_tokens_col).groupBy(doc_id, term).count() (both
    # tokenizers are pinned to the same oracle; verified equal at sf1.0),
    # measured ~30% faster. Row order differs (no shuffle), which no
    # downstream aggregate observes.
    id_type = dict(docs_df.dtypes)[id_col]

    def run(batches):
        for pdf in batches:
            ids: list = []
            terms: list = []
            tfs: list = []
            dls: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                c = Counter(t.lower() for t in english_tokens(text or ""))
                ids.extend([did] * len(c))
                terms.extend(c.keys())
                tfs.extend(c.values())
                dls.extend([sum(c.values())] * len(c))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "term": terms, "tf": tfs, "dl": dls})

    # dl (the doc's token count) is denormalized onto every tf row by the
    # same pass — the scorers then need NO doc_len aggregate+join at all
    # (one less broadcast build + join per query); 8 bytes/row in a
    # checkpoint that exists anyway.
    tf = (docs_df.select(id_col, text_col)
          .mapInPandas(run,
                       f"doc_id {id_type}, term string, tf long, dl long")
          .localCheckpoint())
    # one driver job for both collection stats (doc count includes
    # zero-token docs, so it comes from docs_df, not tf)
    row = (docs_df.agg(F.count("*").alias("n"))
           .crossJoin(tf.agg(F.sum("tf").alias("t"))).collect()[0])
    return tf, int(row["n"]), int(row["t"] or 0)


def bm25_topk_dataframe(docs_df, queries: list[str], k: int = 10,
                        id_col: str = "doc_id", text_col: str = "text",
                        k1: float = 0.9, b: float = 0.4,
                        cfg: IndexConfig | None = None):
    """Pure-DataFrame exhaustive BM25 top-k over raw documents — the
    reference's ranked_or_taat (ranked_or_taat_query.hpp:9-37) expressed as
    Spark's natural groupBy(doc).sum -> window top-k shape, entirely in
    built-in functions (whole-stage codegen, no UDF, no index needed).

    Double precision throughout: this is the cross-engine (DuckDB) oracle
    path; the float32 reference-faithful path is the index + kernel
    executors. Ranking is on round(score, 6) with doc-asc ties so both
    engines agree on near-equal sums."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F


    cfg = cfg or IndexConfig()
    spark = docs_df.sparkSession
    tf, n_docs, total = _corpus_tf(docs_df, id_col, text_col)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    avg_len = float(total) / n_docs if n_docs else 1.0

    qrows = sorted({(qid, term) for qid, term, _ in
                   analyze_query_terms(queries, cfg)})
    qdf = spark.createDataFrame(qrows, "qid string, term string")

    idf = (
        F.greatest(F.lit(1e-6),
                   F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                         / (F.col("df") + 0.5)))
        * F.lit(1.0 + k1)
    )
    part = F.col("tf") / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * F.col("dl") / F.lit(avg_len)))
    scored = (
        qdf.join(tf, "term").join(df_t, "term")
        .select("qid", "doc_id", (idf * part).alias("partial"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "score", "rank")
    )


def qld_topk_dataframe(docs_df, queries: list[str], k: int = 10,
                       id_col: str = "doc_id", text_col: str = "text",
                       mu: float = 1000.0, cfg: IndexConfig | None = None):
    """Pure-DataFrame exhaustive QLD (Dirichlet LM) top-k — the reference
    scorer/qld.hpp:25-38 formula max(0, ln(mu/(dl+mu)) + ln1p(f*C/(mu*cf)))
    as built-in expressions. Double precision + round(6): the cross-engine
    oracle path (the float32-faithful path is IndexConfig(scorer='qld') +
    the kernel executors)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F


    cfg = cfg or IndexConfig()
    spark = docs_df.sparkSession
    tf, _n_docs, collection_len = _corpus_tf(docs_df, id_col, text_col)
    cf_t = tf.groupBy("term").agg(F.sum("tf").alias("cf"))

    qrows = sorted({(qid, term) for qid, term, _ in
                   analyze_query_terms(queries, cfg)})
    qdf = spark.createDataFrame(qrows, "qid string, term string")

    part = (
        F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
        + F.log1p(F.col("tf") * (F.lit(float(collection_len))
                                 / (F.lit(mu) * F.col("cf"))))
    )
    scored = (
        qdf.join(tf, "term").join(cf_t, "term")
        .select("qid", "doc_id",
                F.greatest(F.lit(0.0), part).alias("partial"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
        .filter(F.col("score") > 0)
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank"))


def pl2_topk_dataframe(docs_df, queries: list[str], k: int = 10,
                       id_col: str = "doc_id", text_col: str = "text",
                       c: float = 1.0, cfg: IndexConfig | None = None):
    """Pure-DataFrame exhaustive PL2 (DFR) top-k — the reference
    scorer/pl2.hpp:25-40 formula
        tfn  = tf * log2(1 + c*avgdl/dl)
        norm = 1/(tfn + 1)
        f    = cf / N
        norm * (tfn*log2(1/f) + f*ln(1/2) + 0.5*log2(2*pi*tfn)
                + tfn*(log2(tfn) - ln(1/2)))
    as built-in expressions. Double precision + round(6): the cross-engine
    oracle path (the float32-faithful path is IndexConfig(scorer='pl2') +
    the kernel executors)."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F


    cfg = cfg or IndexConfig()
    spark = docs_df.sparkSession
    tf, n_docs, total = _corpus_tf(docs_df, id_col, text_col)
    cf_t = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    avg_len = float(total) / n_docs if n_docs else 1.0

    qrows = sorted({(qid, term) for qid, term, _ in
                   analyze_query_terms(queries, cfg)})
    qdf = spark.createDataFrame(qrows, "qid string, term string")

    tfn = F.col("tf") * F.log2(F.lit(1.0)
                               + F.lit(c * avg_len) / F.col("dl"))
    norm = F.lit(1.0) / (tfn + F.lit(1.0))
    freq = F.col("cf") / F.lit(float(n_docs))
    e = F.lit(math.log(0.5))
    part = norm * (
        tfn * F.log2(F.lit(1.0) / freq)
        + freq * e
        + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * tfn)
        + tfn * (F.log2(tfn) - e)
    )
    scored = (
        qdf.join(tf, "term").join(cf_t, "term")
        .select("qid", "doc_id", part.alias("partial"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank"))


def dph_topk_dataframe(docs_df, queries: list[str], k: int = 10,
                       id_col: str = "doc_id", text_col: str = "text",
                       cfg: IndexConfig | None = None):
    """Pure-DataFrame exhaustive DPH (parameter-free DFR) top-k — the
    reference scorer/dph.hpp:21-36 formula
        f    = tf/dl
        norm = (1-f)^2 / (tf+1)
        norm * (tf*log2((tf*avgdl/dl) * (N/cf)) + 0.5*log2(2*pi*tf*(1-f)))
    as built-in expressions. Double precision + round(6): the cross-engine
    oracle path (the float32-faithful path is IndexConfig(scorer='dph') +
    the kernel executors)."""
    import math

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F


    cfg = cfg or IndexConfig()
    spark = docs_df.sparkSession
    tf, n_docs, total = _corpus_tf(docs_df, id_col, text_col)
    cf_t = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    avg_len = float(total) / n_docs if n_docs else 1.0

    qrows = sorted({(qid, term) for qid, term, _ in
                   analyze_query_terms(queries, cfg)})
    qdf = spark.createDataFrame(qrows, "qid string, term string")

    f = F.col("tf") / F.col("dl")
    norm = (F.lit(1.0) - f) * (F.lit(1.0) - f) / (F.col("tf") + F.lit(1.0))
    part = norm * (
        F.col("tf") * F.log2(
            (F.col("tf") * F.lit(avg_len) / F.col("dl"))
            * (F.lit(float(n_docs)) / F.col("cf")))
        + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * F.col("tf")
                              * (F.lit(1.0) - f))
    )
    scored = (
        qdf.join(tf, "term").join(cf_t, "term")
        .select("qid", "doc_id", part.alias("partial"))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum("partial"), 6).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "doc_id", "score", "rank"))


def trec_output(results_df, run_id: str = "pisa_spark"):
    """Format results as TREC run lines: qid Q0 url rank score run_id
    (reference evaluate_queries.cpp:159-172)."""
    from pyspark.sql import functions as F

    return results_df.select(
        F.concat_ws(" ", "qid", F.lit("Q0"), "url", "rank",
                    F.format_string("%.6f", "score"), F.lit(run_id)).alias("line"))
