"""Posting-list materialization: doc-sharded, block-encoded, block-max'd.

Scale design (the part the reference, a single-node engine, never needed):

- The docID space is partitioned into **shards** of `cfg.shard_span` docs
  (shard_id = doc_id // span). Every (shard_id, term_id) posting run is
  therefore bounded by shard_span postings, so a stopword with df == N can
  never form a hot aggregation key: skew is bounded *by construction*,
  which is the salted repartition-by-term-hash strategy with the salt made
  deterministic (salt == doc range) so that runs stay doc-sorted and
  query-side merge is a concatenation, mirroring how the reference's invert
  merges doc-sorted batch runs (src/invert.cpp:163-236). Doc-sharding is
  also the reference's own distribution story (range_query over docID
  ranges, include/pisa/range_query.hpp:8-37).
- Rows are encoded by a mapInPandas kernel over partitions hash-partitioned
  on (shard_id, term_id) and sorted on (shard_id, term_id, doc_id): groups
  are contiguous; a carry buffer stitches groups split across Arrow batches.
  No collect_list ever materializes a full posting list as one JVM object.
- Per row: docIDs as a continuous gap-1 varint/EF stream with per-block
  (cfg.block_size postings) byte offsets, last-docIDs and block-max scores
  — the WAND data of reference include/pisa/wand_data.hpp:86-112 and block
  layout of src/block_inverted_index.cpp:88-130 re-expressed columnar.
- For bm25 the stored block max is the doc-dependent factor
  f/(f+k1(1-b+b·dl/avg)) (max_part); the executor multiplies by the term's
  idf — identical bounds, no df join needed at encode time. Non-separable
  scorers (qld/pl2/dph) get full-score block maxima via a term-stats join.

Encoded schema (one row per shard × term):
    shard_id long, term_id long, n long, sum_tf long, base_doc long,
    last_doc long, block_last_docs array<long>, block_doc_offs array<int>,
    block_tf_offs array<int>, block_max_part array<float>,
    docs_bin binary, tfs_bin binary

`n` and `sum_tf` let per-term df/cf/max-score stats aggregate from these
rows (one per shard × term) instead of the ~100× larger flat postings.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pisa_spark.config import IndexConfig
from pisa_spark.functions.scoring import make_scorer
from pisa_spark.operators import codecs

ENCODED_SCHEMA = (
    "shard_id long, term_id long, n long, sum_tf long, base_doc long, "
    "last_doc long, "
    "block_last_docs array<long>, block_doc_offs array<int>, "
    "block_tf_offs array<int>, block_max_part array<float>, "
    "docs_bin binary, tfs_bin binary"
)

FLAT_SCHEMA = "term_id long, doc_id long, tf long"

_ENCODED_COLUMNS = [
    "shard_id", "term_id", "n", "sum_tf", "base_doc", "last_doc",
    "block_last_docs", "block_doc_offs", "block_tf_offs",
    "block_max_part", "docs_bin", "tfs_bin",
]


def _empty_encoded() -> pd.DataFrame:
    """Zero-row frame matching ENCODED_SCHEMA."""
    return pd.DataFrame({
        c: pd.Series(dtype="int64" if c in (
            "shard_id", "term_id", "n", "sum_tf", "base_doc", "last_doc")
            else object)
        for c in _ENCODED_COLUMNS})


def _variable_boundaries(part: np.ndarray, bsz: int, quantum: int = 16,
                         lam: float | None = None) -> np.ndarray:
    """Score-optimal block boundaries for one posting run (VBMW).

    Objective (reference include/pisa/score_opt_partition.hpp:1-200, used by
    wand_utils.hpp:55-83 VariableBlock): choose boundaries minimizing
    sum over blocks of [lambda + sum_i(block_max - part_i)] — the "lost
    score area" that makes block-max bounds loose — with block span capped
    at 2*bsz. The reference approximates the shortest-path DP with eps
    windows (eps1=0.01, eps2=0.4); here the same objective runs exactly on
    a quantum-grid of candidate boundaries (grid coarsening plays the role
    of the eps approximation; fixed boundaries all sit on the grid, so the
    result is never worse than the fixed partition under the objective).

    lam=None self-tunes to 0.25x the fixed partition's mean per-block lost
    area: flat runs (lost area ~0) keep big blocks, skewed runs buy extra
    boundaries only where they reclaim 4x their cost. Returns block START
    offsets (first element 0).
    """
    n = part.size
    if n <= quantum:
        return np.zeros(1, dtype=np.int64)
    nodes = np.arange(0, n, quantum, dtype=np.int64)
    nodes = np.append(nodes, n)
    m = nodes.size
    p64 = part.astype(np.float64)
    S = np.concatenate(([0.0], np.cumsum(p64)))
    qmax = np.maximum.reduceat(p64, nodes[:-1])
    if lam is None:
        fixed_starts = np.arange(0, n, bsz, dtype=np.int64)
        fixed_ends = np.append(fixed_starts[1:], n)
        fmax = np.maximum.reduceat(p64, fixed_starts)
        lost_fixed = float(
            (fmax * (fixed_ends - fixed_starts)).sum() - S[-1])
        lam = max(1e-9, 0.25 * lost_fixed / fixed_starts.size)
    max_span = max(1, (2 * bsz) // quantum)
    dist = np.full(m, np.inf)
    dist[0] = 0.0
    prev = np.zeros(m, dtype=np.int64)
    for j in range(1, m):
        e_ = nodes[j]
        run_max = 0.0
        best, bi = np.inf, j - 1
        for i in range(j - 1, max(-1, j - 1 - max_span), -1):
            if qmax[i] > run_max:
                run_max = qmax[i]
            c = dist[i] + lam + run_max * (e_ - nodes[i]) - (S[e_] - S[nodes[i]])
            if c < best:
                best, bi = c, i
        dist[j] = best
        prev[j] = bi
    bounds = []
    j = m - 1
    while j > 0:
        j = int(prev[j])
        bounds.append(nodes[j])
    return np.array(bounds[::-1], dtype=np.int64)


def _encode_batch(pdf: pd.DataFrame, cfg: IndexConfig, stats: dict,
                  scorer) -> pd.DataFrame:
    """Encode one pandas batch of complete (shard_id, term_id) groups.

    Input columns: shard_id, term_id, doc_id, tf, doc_len (+ df, cf when the
    scorer is non-separable). Rows pre-sorted by (shard_id, term_id, doc_id).
    """
    if not len(pdf):
        # zero-row input (e.g. a shard whose docs all tokenized empty):
        # return an empty frame in the encoded shape instead of running the
        # group-boundary kernel, which assumes >= 1 group
        return _empty_encoded()
    span = cfg.shard_span
    bsz = cfg.block_size
    shard = pdf["shard_id"].to_numpy()
    term = pdf["term_id"].to_numpy()
    docs = pdf["doc_id"].to_numpy()
    tfs = pdf["tf"].to_numpy()
    doc_len = pdf["doc_len"].to_numpy()

    # group boundaries over the whole batch
    change = (shard[1:] != shard[:-1]) | (term[1:] != term[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    ends = np.concatenate((starts[1:], [len(pdf)]))

    # vectorized across the batch: gap-1 stream (group starts rebased to the
    # shard base), tf-1 stream, per-posting score part
    base = shard * span - 1
    prev = np.empty_like(docs)
    prev[1:] = docs[:-1]
    prev[starts] = base[starts]
    gaps = (docs - prev - 1).astype(np.uint64)

    if scorer.separable:
        part = scorer.doc_part(tfs, doc_len, stats["avg_len"])
    else:
        part = scorer.score(
            tfs, doc_len,
            df=pdf["df"].to_numpy() if "df" in pdf else None,
            cf=pdf["cf"].to_numpy() if "cf" in pdf else None,
            num_docs=stats["num_docs"], avg_len=stats["avg_len"],
            collection_len=stats["collection_len"],
        )

    if cfg.codec == "varint":
        doc_bytes, doc_lens_b = codecs.varint_encode_with_lengths(gaps)
        doc_byte_off = np.concatenate(([0], np.cumsum(doc_lens_b)))
    else:
        doc_bytes, doc_byte_off = None, None  # per-group EF below
    tf_bytes, tf_lens_b = codecs.varint_encode_with_lengths(
        tfs.astype(np.uint64) - np.uint64(1))
    tf_byte_off = np.concatenate(([0], np.cumsum(tf_lens_b)))

    variable = cfg.block_partition == "variable"
    rows = []
    doc_mv = memoryview(doc_bytes) if doc_bytes is not None else None
    tf_mv = memoryview(tf_bytes)
    tf_sums = dict(zip(starts, np.add.reduceat(tfs, starts)))
    for s, e in zip(starts, ends):
        n = e - s
        g_docs = docs[s:e]
        if variable:
            blk_starts = s + _variable_boundaries(
                part[s:e], bsz, cfg.vbmw_quantum, cfg.vbmw_lambda)
        else:
            blk_starts = np.arange(s, e, bsz)
        blk_ends = np.append(blk_starts[1:], e)
        blk_last = g_docs[blk_ends - s - 1]  # last doc of each block
        blk_max = np.maximum.reduceat(part[s:e], blk_starts - s).astype(np.float32)
        tf_offs = (tf_byte_off[blk_starts] - tf_byte_off[s]).astype(np.int32)
        if cfg.codec == "varint":
            d_bin = bytes(doc_mv[doc_byte_off[s]:doc_byte_off[e]])
            d_offs = (doc_byte_off[blk_starts] - doc_byte_off[s]).astype(np.int32)
        else:
            # per-block encode over block-relative monotone values
            chunks, d_offs, off = [], [], 0
            b0 = int(base[s])
            for bs, be in zip(blk_starts, blk_ends):
                prev_last = int(docs[bs - 1]) if bs > s else b0
                buf = codecs.encode_gap_stream(docs[bs:be], prev_last,
                                               cfg.codec)
                d_offs.append(off)
                chunks.append(buf)
                off += len(buf)
            d_bin = b"".join(chunks)
            d_offs = np.array(d_offs, dtype=np.int32)
        rows.append((
            int(shard[s]), int(term[s]), int(n), int(tf_sums[s]),
            int(base[s]), int(g_docs[-1]),
            blk_last.tolist(), d_offs.tolist(), tf_offs.tolist(),
            blk_max.tolist(),
            d_bin, bytes(tf_mv[tf_byte_off[s]:tf_byte_off[e]]),
        ))
    return pd.DataFrame(rows, columns=[
        "shard_id", "term_id", "n", "sum_tf", "base_doc", "last_doc",
        "block_last_docs", "block_doc_offs", "block_tf_offs",
        "block_max_part", "docs_bin", "tfs_bin",
    ])


def _group_carry(batches: Iterator[pd.DataFrame], encode) -> Iterator[pd.DataFrame]:
    """Yield encoded frames, carrying the (possibly incomplete) trailing
    group of each Arrow batch into the next so no group is split."""
    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        # rows are sorted, so the trailing group is the contiguous run of
        # rows equal to the last (shard_id, term_id) key
        last_shard = pdf["shard_id"].iat[-1]
        last_term = pdf["term_id"].iat[-1]
        tail = (pdf["shard_id"].to_numpy() == last_shard) & \
               (pdf["term_id"].to_numpy() == last_term)
        if tail.all():
            carry = pdf
            continue
        first_tail = int(np.flatnonzero(tail).min())
        complete, carry = pdf.iloc[:first_tail], pdf.iloc[first_tail:]
        if len(complete):
            yield encode(complete)
    if carry is not None and len(carry):
        yield encode(carry)


def encode_postings(tf_df, cfg: IndexConfig, stats: dict,
                    num_partitions: int | None = None):
    """tf_df: (term_id, doc_id, tf, doc_len[, df, cf]) -> encoded posting rows.

    One shuffle, hash-partitioned on (shard_id, term_id) — the salted
    repartition-by-term-hash of the north rule with shard_id as the
    deterministic salt — then partition-local sort + streaming encode.
    """
    from pyspark.sql import functions as F

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    if (not scorer.separable and not getattr(scorer, "stats_free", False)
            and ("df" not in tf_df.columns or "cf" not in tf_df.columns)):
        raise ValueError("non-separable scorer requires df/cf columns in tf_df")

    with_shard = tf_df.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
    parts = num_partitions or with_shard.sparkSession.sparkContext.defaultParallelism * 2
    arranged = (
        with_shard
        .repartition(parts, "shard_id", "term_id")
        .sortWithinPartitions("shard_id", "term_id", "doc_id")
    )

    def run(batches):
        yield from _group_carry(
            batches, lambda pdf: _encode_batch(pdf, cfg, stats, scorer))

    return arranged.mapInPandas(run, schema=ENCODED_SCHEMA)


def encode_postings_docwise(doc_terms, vocab: dict, cfg: IndexConfig,
                            stats: dict, num_partitions: int | None = None):
    """Doc-wise encode path for broadcastable vocabularies: shuffle the
    COMPACT per-doc token rows by shard (~100x less data than the exploded
    (term, doc, tf) rows) and do explode + term-id remap + (term, doc) sort
    in numpy inside the kernel. Output rows are identical to
    encode_postings'. This mirrors the reference's invert batch path even
    more closely: build a per-batch inverted index straight from the
    forward index (src/invert.cpp:135-161), with doc-shards as batches.

    Requires a separable or stats-free scorer (bm25/quantized): df/cf are
    not known doc-wise. Web-scale vocabularies use encode_postings.
    """
    from pyspark.sql import functions as F

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    if not scorer.separable and not getattr(scorer, "stats_free", False):
        raise ValueError("docwise encode requires separable/stats-free scorer")
    spark = doc_terms.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    bc = spark.sparkContext.broadcast(vocab)
    span = cfg.shard_span

    # shards are dense sequential ints and equal-sized by construction:
    # round-robin placement (shard s -> partition s % parts) beats raw hash,
    # which strands ~1/e of the partitions empty when n_shards ~ parts
    from pisa_spark.operators.partitioning import (partition_values,
                                                   round_robin_expr)

    vals = partition_values(spark, parts)
    arranged = (
        doc_terms.select(
            (F.col("doc_id") / F.lit(span)).cast("long").alias("shard_id"),
            "doc_id", "doc_len", "terms", "tfs")
        .repartition(parts, round_robin_expr(F.col("shard_id"), parts, vals))
        .sortWithinPartitions("shard_id", "doc_id")
    )

    def encode_shards(pdf: pd.DataFrame) -> pd.DataFrame:
        v = bc.value
        n_tok = pdf["terms"].map(len).to_numpy(dtype=np.int64)
        doc = np.repeat(pdf["doc_id"].to_numpy(), n_tok)
        dl = np.repeat(pdf["doc_len"].to_numpy(), n_tok)
        if len(doc) == 0:
            return _encode_batch(pd.DataFrame({
                "shard_id": [], "term_id": [], "doc_id": [], "tf": [],
                "doc_len": []}), cfg, stats, scorer)
        terms_flat = np.concatenate(pdf["terms"].to_numpy())
        tfs_flat = np.concatenate(pdf["tfs"].to_numpy()).astype(np.int64)
        tid = pd.Series(terms_flat).map(v).to_numpy(dtype=np.int64)
        order = np.lexsort((doc, tid, doc // span))
        flat = pd.DataFrame({
            "shard_id": (doc // span)[order],
            "term_id": tid[order],
            "doc_id": doc[order],
            "tf": tfs_flat[order],
            "doc_len": dl[order],
        })
        return _encode_batch(flat, cfg, stats, scorer)

    def run(batches):
        # carry whole shards across Arrow batches (same trick as
        # _group_carry but keyed on shard_id only: a shard's docs are
        # contiguous after the sort)
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
            if len(complete):
                yield encode_shards(complete)
        if carry is not None and len(carry):
            yield encode_shards(carry)

    return arranged.mapInPandas(run, schema=ENCODED_SCHEMA)


# ------------------------------------------------------------------- decode

def decode_rows(pdf: pd.DataFrame, cfg: IndexConfig) -> pd.DataFrame:
    """Decode encoded posting rows back to flat (term_id, doc_id, tf)."""
    out_term, out_doc, out_tf = [], [], []
    for row in pdf.itertuples(index=False):
        n = int(row.n)
        tfs = codecs.decode_tfs(bytes(row.tfs_bin), n)
        if cfg.codec == "varint":
            docs = codecs.decode_gap_stream(
                bytes(row.docs_bin), int(row.base_doc), "varint", n)
        else:  # per-block codecs (ef, bp128)
            docs_parts = []
            offs = list(row.block_doc_offs) + [len(row.docs_bin)]
            prev_last = int(row.base_doc)
            for bi in range(len(offs) - 1):
                chunk = bytes(row.docs_bin[offs[bi]:offs[bi + 1]])
                d = codecs.decode_gap_stream(chunk, prev_last, cfg.codec)
                prev_last = int(d[-1])
                docs_parts.append(d)
            docs = np.concatenate(docs_parts)
        out_term.append(np.full(n, row.term_id, dtype=np.int64))
        out_doc.append(docs.astype(np.int64))
        out_tf.append(tfs.astype(np.int64))
    if not out_term:
        return pd.DataFrame({"term_id": [], "doc_id": [], "tf": []}).astype("int64")
    return pd.DataFrame({
        "term_id": np.concatenate(out_term),
        "doc_id": np.concatenate(out_doc),
        "tf": np.concatenate(out_tf),
    })


def decode_postings(enc_df, cfg: IndexConfig):
    """Encoded posting rows -> flat (term_id, doc_id, tf) DataFrame.

    This is the `--check` path (reference src/compress.cpp:106-110): a
    round-trip decode that tests compare against the pre-encode postings.
    """
    def run(batches):
        for pdf in batches:
            yield decode_rows(pdf, cfg)

    return enc_df.mapInPandas(run, schema=FLAT_SCHEMA)
