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
- Rows are encoded by a mapInArrow kernel over partitions hash-partitioned
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
import pyarrow as pa

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


ENCODED_PA_SCHEMA = pa.schema([
    ("shard_id", pa.int64()), ("term_id", pa.int64()), ("n", pa.int64()),
    ("sum_tf", pa.int64()), ("base_doc", pa.int64()), ("last_doc", pa.int64()),
    ("block_last_docs", pa.list_(pa.int64())),
    ("block_doc_offs", pa.list_(pa.int32())),
    ("block_tf_offs", pa.list_(pa.int32())),
    ("block_max_part", pa.list_(pa.float32())),
    ("docs_bin", pa.binary()), ("tfs_bin", pa.binary()),
])

# string-keyed encode output: `term` (string) instead of `term_id` — used
# by the lexicon-last build flow, where dense term_ids are assigned FROM
# the encoded rows (~100x smaller than the flat postings) and joined back
ENCODED_STR_SCHEMA = ENCODED_SCHEMA.replace("term_id long", "term string")
ENCODED_STR_PA_SCHEMA = pa.schema(
    [pa.field("term", pa.string()) if f.name == "term_id" else f
     for f in ENCODED_PA_SCHEMA])


def _empty_encoded() -> pd.DataFrame:
    """Zero-row frame matching ENCODED_SCHEMA."""
    return pd.DataFrame({
        c: pd.Series(dtype="int64" if c in (
            "shard_id", "term_id", "n", "sum_tf", "base_doc", "last_doc")
            else object)
        for c in _ENCODED_COLUMNS})


def _empty_encoded_batch() -> pa.RecordBatch:
    return pa.RecordBatch.from_pylist([], schema=ENCODED_PA_SCHEMA)


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


def _encode_arrays(shard: np.ndarray, term: np.ndarray, docs: np.ndarray,
                   tfs: np.ndarray, doc_len: np.ndarray,
                   cfg: IndexConfig, stats: dict, scorer,
                   df: np.ndarray | None = None,
                   cf: np.ndarray | None = None,
                   term_dict: pa.Array | None = None) -> pa.RecordBatch:
    """Encode complete (shard_id, term_id) groups into one Arrow batch.

    Inputs are numpy arrays pre-sorted by (shard_id, term_id, doc_id);
    docs/shard are int64, term may be int32 (batch-local dictionary codes)
    and doc_len any numeric dtype (consumed as float32 by the scorer).
    The whole kernel is columnar: block boundaries, block maxima and byte
    offsets are computed with batch-wide numpy ops, and the output
    RecordBatch wraps the varint streams ZERO-COPY (each row's docs_bin /
    tfs_bin is an offset slice of one shared buffer — no per-group bytes()
    materialization, no per-row Python). The per-group Python loop survives
    only for VBMW boundary DP and per-block codecs (ef/bp128/opt), which
    are inherently per-list.

    With term_dict set, `term` holds batch-local dictionary codes and the
    output carries the term STRING column (take from the dictionary)
    instead of term_id — the lexicon-last build flow."""
    n_rows = docs.size
    if n_rows == 0:
        if term_dict is not None:
            return pa.RecordBatch.from_pylist([],
                                              schema=ENCODED_STR_PA_SCHEMA)
        return _empty_encoded_batch()
    span = cfg.shard_span
    bsz = cfg.block_size

    # group boundaries over the whole batch
    change = (shard[1:] != shard[:-1]) | (term[1:] != term[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    ends = np.concatenate((starts[1:], [n_rows]))
    n_groups = starts.size

    # vectorized across the batch: gap-1 stream (group starts rebased to the
    # shard base), tf-1 stream, per-posting score part. base is GROUP-level
    # (n_groups), not per-token — the kernel is bandwidth-bound and a full
    # n-sized int64 temporary costs two DRAM passes for values only ever
    # read at group starts.
    base_g = shard[starts].astype(np.int64) * span - 1
    prev = np.empty(n_rows, dtype=np.int64)
    prev[1:] = docs[:-1]
    prev[starts] = base_g
    gaps_signed = docs - prev - 1
    if gaps_signed.size and int(gaps_signed.min()) < 0:
        # a negative gap would wrap silently in the uint64 cast and
        # corrupt the index: the input was mis-sorted, or a shard's rows
        # were split across partitions (shuffle-free encode invariant)
        raise ValueError(
            "posting docs not strictly increasing within a (shard, term) "
            "run — mis-sorted input or shard split across partitions")

    if scorer.separable:
        part = scorer.doc_part(tfs, doc_len, stats["avg_len"])
    else:
        part = scorer.score(
            tfs, doc_len, df=df, cf=cf,
            num_docs=stats["num_docs"], avg_len=stats["avg_len"],
            collection_len=stats["collection_len"],
        )

    tf_bytes, tf_lens_b = codecs.varint_encode_with_lengths(tfs - 1)
    tf_byte_off = np.concatenate(([0], np.cumsum(tf_lens_b)))

    # ---- block boundaries (absolute batch offsets, all groups at once)
    if cfg.block_partition == "variable":
        parts_list = []
        nblk = np.empty(n_groups, dtype=np.int64)
        for g in range(n_groups):
            s, e = int(starts[g]), int(ends[g])
            bs = s + _variable_boundaries(
                part[s:e], bsz, cfg.vbmw_quantum, cfg.vbmw_lambda)
            parts_list.append(bs)
            nblk[g] = bs.size
        abs_start = np.concatenate(parts_list)
        cum_nblk = np.concatenate(([0], np.cumsum(nblk)))
    else:
        n_g = ends - starts
        nblk = (n_g + bsz - 1) // bsz
        cum_nblk = np.concatenate(([0], np.cumsum(nblk)))
        total = int(cum_nblk[-1])
        grp_of_blk = np.repeat(np.arange(n_groups), nblk)
        blk_in_grp = np.arange(total) - cum_nblk[grp_of_blk]
        abs_start = starts[grp_of_blk] + blk_in_grp * bsz
    total = int(cum_nblk[-1])
    if cfg.block_partition == "variable":
        grp_of_blk = np.repeat(np.arange(n_groups), nblk)
    abs_end = np.empty(total, dtype=np.int64)
    abs_end[:-1] = abs_start[1:]
    abs_end[cum_nblk[1:] - 1] = ends  # last block of each group

    blk_last = docs[abs_end - 1]
    blk_max = np.maximum.reduceat(part, abs_start).astype(np.float32)
    grp_start_of_blk = starts[grp_of_blk]
    tf_offs_vals = (tf_byte_off[abs_start]
                    - tf_byte_off[grp_start_of_blk]).astype(np.int32)

    # ---- docID streams + per-block byte offsets
    if cfg.codec == "varint":
        doc_bytes, doc_lens_b = codecs.varint_encode_with_lengths(
            gaps_signed)
        doc_byte_off = np.concatenate(([0], np.cumsum(doc_lens_b)))
        d_offs_vals = (doc_byte_off[abs_start]
                       - doc_byte_off[grp_start_of_blk]).astype(np.int32)
        grp_doc_bytes = doc_byte_off[np.append(starts, n_rows)]
    elif cfg.codec in ("ef", "bp128"):
        # batch per-block encode: widths, headers, bit positions and the
        # final packbits all computed across EVERY block at once
        # (codecs.ef_encode_blocks / bp_encode_blocks — byte-identical to
        # the per-block encoders, no per-block Python)
        if cfg.codec == "ef":
            block_prev = np.where(abs_start > grp_start_of_blk,
                                  docs[abs_start - 1],
                                  base_g[grp_of_blk])
            doc_bytes, chunk_lens = codecs.ef_encode_blocks(
                docs, abs_start, abs_end, block_prev)
        else:
            doc_bytes, chunk_lens = codecs.bp_encode_blocks(
                gaps_signed.astype(np.uint64), abs_start, abs_end)
        cum_chunk = np.concatenate(([0], np.cumsum(chunk_lens)))
        d_offs_vals = (cum_chunk[:-1]
                       - cum_chunk[cum_nblk[grp_of_blk]]).astype(np.int32)
        grp_doc_bytes = cum_chunk[cum_nblk]
    else:
        # per-block encode over block-relative monotone values (dispatch /
        # DP codecs: opt, pef, pefu, bic — inherently per-list)
        chunks: list[bytes] = []
        chunk_lens = np.empty(total, dtype=np.int64)
        for b in range(total):
            bs, be = int(abs_start[b]), int(abs_end[b])
            gs = int(grp_start_of_blk[b])
            prev_last = (int(docs[bs - 1]) if bs > gs
                         else int(base_g[grp_of_blk[b]]))
            buf = codecs.encode_gap_stream(docs[bs:be], prev_last, cfg.codec)
            chunks.append(buf)
            chunk_lens[b] = len(buf)
        doc_bytes = b"".join(chunks)
        cum_chunk = np.concatenate(([0], np.cumsum(chunk_lens)))
        d_offs_vals = (cum_chunk[:-1]
                       - cum_chunk[cum_nblk[grp_of_blk]]).astype(np.int32)
        grp_doc_bytes = cum_chunk[cum_nblk]

    # ---- assemble the Arrow batch (zero-copy where the layout allows)
    # The Arrow binary/list columns carry int32 offsets; a batch whose
    # encoded stream crossed 2 GiB would silently wrap on the casts below
    # and corrupt the index. Batches stay far under this by construction
    # (Arrow batch size + one carried group / the docwise token gate), so
    # enforce it: fail loudly instead of corrupting.
    _I32_MAX = np.int64(2**31 - 1)
    if (int(cum_nblk[-1]) > _I32_MAX or len(doc_bytes) > _I32_MAX
            or len(tf_bytes) > _I32_MAX):
        raise OverflowError(
            "encoded batch exceeds int32 Arrow offsets "
            f"(blocks={int(cum_nblk[-1])}, doc_bytes={len(doc_bytes)}, "
            f"tf_bytes={len(tf_bytes)}); lower shard_span / Arrow batch size")
    offs32 = cum_nblk.astype(np.int32)

    def _list(vals: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(
            pa.array(offs32, type=pa.int32()), pa.array(vals, type=typ))

    def _bin(stream: bytes, grp_offs: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.binary(), n_groups,
            [None, pa.py_buffer(grp_offs.astype(np.int32)),
             pa.py_buffer(stream)])

    if term_dict is not None:
        import pyarrow.compute as pc

        term_col = pc.take(term_dict, pa.array(term[starts]))
        out_schema = ENCODED_STR_PA_SCHEMA
    else:
        term_col = pa.array(term[starts], type=pa.int64())
        out_schema = ENCODED_PA_SCHEMA
    arrays = [
        pa.array(shard[starts], type=pa.int64()),
        term_col,
        pa.array((ends - starts).astype(np.int64), type=pa.int64()),
        pa.array(np.add.reduceat(tfs, starts, dtype=np.int64),
                 type=pa.int64()),
        pa.array(base_g, type=pa.int64()),
        pa.array(docs[ends - 1], type=pa.int64()),
        _list(blk_last, pa.int64()),
        _list(d_offs_vals, pa.int32()),
        _list(tf_offs_vals, pa.int32()),
        _list(blk_max, pa.float32()),
        _bin(doc_bytes, grp_doc_bytes),
        _bin(tf_bytes, tf_byte_off[np.append(starts, n_rows)]),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def _encode_batch(pdf: pd.DataFrame, cfg: IndexConfig, stats: dict,
                  scorer) -> pd.DataFrame:
    """pandas shim over _encode_arrays (tests + small callers)."""
    if not len(pdf):
        return _empty_encoded()
    rb = _encode_arrays(
        pdf["shard_id"].to_numpy(), pdf["term_id"].to_numpy(),
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy(),
        pdf["doc_len"].to_numpy(), cfg, stats, scorer,
        df=pdf["df"].to_numpy() if "df" in pdf else None,
        cf=pdf["cf"].to_numpy() if "cf" in pdf else None)
    return rb.to_pandas()


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


def _arrow_cols(rb: pa.RecordBatch, names: list[str]) -> dict:
    return {c: rb.column(c).to_numpy(zero_copy_only=False) for c in names}


def _encode_col_stream(batches: Iterator[pa.RecordBatch], names: list[str],
                       encode) -> Iterator[pa.RecordBatch]:
    """Stream Arrow batches of sorted (shard_id, term_id, ...) rows into
    `encode`, carrying the (possibly incomplete) trailing group of each
    batch into the next so no group is split. Columns travel as numpy
    arrays end-to-end — no pandas materialization."""
    carry: dict | None = None
    for rb in batches:
        cols = _arrow_cols(rb, names)
        if carry is not None and carry["shard_id"].size:
            cols = {c: np.concatenate([carry[c], cols[c]]) for c in names}
        n = cols["shard_id"].size
        if n == 0:
            continue
        # rows are sorted, so the trailing group is the contiguous run of
        # rows equal to the last (shard_id, term_id) key
        tail = ((cols["shard_id"] == cols["shard_id"][-1])
                & (cols["term_id"] == cols["term_id"][-1]))
        if tail.all():
            carry = cols
            continue
        first_tail = int(np.flatnonzero(tail).min())
        carry = {c: cols[c][first_tail:] for c in names}
        yield encode({c: cols[c][:first_tail] for c in names})
    if carry is not None and carry["shard_id"].size:
        yield encode(carry)


def encode_postings(tf_df, cfg: IndexConfig, stats: dict,
                    num_partitions: int | None = None):
    """tf_df: (term_id, doc_id, tf, doc_len[, df, cf]) -> encoded posting rows.

    One shuffle, hash-partitioned on (shard_id, term_id) — the salted
    repartition-by-term-hash of the north rule with shard_id as the
    deterministic salt — then partition-local sort + streaming encode
    (mapInArrow: numpy in, zero-copy Arrow out; no pandas boundary).
    """
    from pyspark.sql import functions as F

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    need_stats = (not scorer.separable
                  and not getattr(scorer, "stats_free", False))
    if need_stats and ("df" not in tf_df.columns or "cf" not in tf_df.columns):
        raise ValueError("non-separable scorer requires df/cf columns in tf_df")

    with_shard = tf_df.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
    parts = num_partitions or with_shard.sparkSession.sparkContext.defaultParallelism * 2
    arranged = (
        with_shard
        .repartition(parts, "shard_id", "term_id")
        .sortWithinPartitions("shard_id", "term_id", "doc_id")
    )
    names = ["shard_id", "term_id", "doc_id", "tf", "doc_len"]
    if "df" in tf_df.columns and "cf" in tf_df.columns:
        names += ["df", "cf"]

    def encode(cols: dict) -> pa.RecordBatch:
        return _encode_arrays(
            cols["shard_id"], cols["term_id"], cols["doc_id"],
            cols["tf"], cols["doc_len"], cfg, stats, scorer,
            df=cols.get("df"), cf=cols.get("cf"))

    def run(batches):
        yield from _encode_col_stream(batches, names, encode)

    return arranged.select(*names).mapInArrow(run, schema=ENCODED_SCHEMA)


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

    vocab_holder: list = []  # per-executor lazily-built Arrow value set

    def encode_shards(rb: pa.RecordBatch) -> pa.RecordBatch:
        import pyarrow.compute as pc

        if not vocab_holder:
            v = bc.value
            # value set ordered by term_id, so index_in IS the id lookup
            vocab_holder.append(pa.array(sorted(v, key=v.get)))
        doc_ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
        dls = rb.column("doc_len").to_numpy(zero_copy_only=False)
        terms_list = rb.column("terms")
        n_tok = pc.list_value_length(terms_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = np.repeat(doc_ids, n_tok)
        if doc.size == 0:
            return _empty_encoded_batch()
        dl = np.repeat(dls, n_tok)
        tid = pc.index_in(terms_list.flatten(), vocab_holder[0]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tfs_flat = rb.column("tfs").flatten().to_numpy(
            zero_copy_only=False).astype(np.int64)
        sh = doc // span
        # docs arrive sorted within each shard, so ONE stable sort on the
        # combined (shard, term) key yields contiguous groups with
        # ascending docs — numpy's stable int sort is radix (O(n)), ~3x
        # cheaper than the 3-key lexsort it replaces on this hot path
        key = sh * np.int64(len(vocab_holder[0])) + tid
        order = np.argsort(key, kind="stable")
        return _encode_arrays(sh[order], tid[order], doc[order],
                              tfs_flat[order], dl[order], cfg, stats, scorer)

    def run(batches):
        # carry whole shards across Arrow batches (same trick as the
        # exploded path's carry but keyed on shard_id only: a shard's docs
        # are contiguous after the sort)
        carry: pa.RecordBatch | None = None
        for rb in batches:
            if carry is not None and carry.num_rows:
                rb = (pa.Table.from_batches([carry, rb])
                      .combine_chunks().to_batches()[0])
            if not rb.num_rows:
                continue
            shard_np = rb.column("shard_id").to_numpy(zero_copy_only=False)
            tail = shard_np == shard_np[-1]
            if tail.all():
                carry = rb
                continue
            first_tail = int(np.flatnonzero(tail).min())
            carry = rb.slice(first_tail)
            yield encode_shards(rb.slice(0, first_tail))
        if carry is not None and carry.num_rows:
            yield encode_shards(carry)

    return arranged.mapInArrow(run, schema=ENCODED_SCHEMA)


def encode_postings_docwise_str(doc_terms, cfg: IndexConfig, stats: dict,
                                num_partitions: int | None = None,
                                shard_stride: int = 1,
                                bucket_starts: list[int] | None = None):
    """Doc-wise encode WITHOUT a vocabulary: emits string-keyed encoded
    rows (ENCODED_STR_SCHEMA). Terms are dictionary-encoded batch-locally
    (Arrow C kernel), groups keyed on the local codes, and the term string
    re-attached per encoded row — so no vocab broadcast, no term-id
    assignment, and no flat (term, doc, tf) shuffle anywhere before the
    encode. The lexicon is derived AFTERWARD from these rows (~avg_len x
    fewer than flat postings) and term_ids joined back (plans/build.py).

    Works for ANY vocabulary size; the binding constraint is the per-task
    working set of one doc-shard's exploded tokens (cfg.shard_span x
    avg_len) — plans/build.py gates on that and falls back to
    encode_postings_str above the bound.

    shard_stride: when the caller pre-filtered the input to every
    shard_stride-th shard (the manifest build's bucket resume), shard ids
    share a common stride and the round-robin placement key must be the
    shard's RANK within the bucket (shard_id // stride) — keying on the
    raw id would land all work on parts/gcd(stride, parts) partitions.

    bucket_starts: the global doc_id at which each docID-assignment
    bucket begins (plans/build.py assign_rank_ids meta). When given, the
    encode runs SHUFFLE-FREE: the rank shuffle already left every bucket
    whole on one partition with doc_ids ascending in partition order, so
    every shard that does not straddle a bucket boundary is encoded by a
    narrow mapInArrow over doc_terms as-is — the (shard)-keyed
    repartition of the full token mass (the build's second-largest
    shuffle) disappears. Only the <= n_buckets shards that straddle a
    non-span-aligned bucket boundary are routed through the exploded
    (shard, term)-shuffled path, then repartitioned by shard so the
    colocation invariant (one shard -> one partition) still holds for
    the union. At cluster scale the straddle mass is n_buckets x span
    docs — vanishing against the corpus."""
    from pyspark.sql import functions as F

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    if not scorer.separable and not getattr(scorer, "stats_free", False):
        raise ValueError("docwise encode requires separable/stats-free scorer")
    spark = doc_terms.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    span = cfg.shard_span

    from pisa_spark.operators.partitioning import (partition_values,
                                                   round_robin_expr)

    base_cols = doc_terms.select(
        (F.col("doc_id") / F.lit(span)).cast("long").alias("shard_id"),
        "doc_id", "doc_len", "terms", "tfs")

    def encode_shards(rb: pa.RecordBatch) -> pa.RecordBatch:
        import pyarrow.compute as pc

        doc_ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
        dls = rb.column("doc_len").to_numpy(zero_copy_only=False)
        terms_list = rb.column("terms")
        n_tok = pc.list_value_length(terms_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = int(n_tok.sum())
        if n == 0:
            return pa.RecordBatch.from_pylist([],
                                              schema=ENCODED_STR_PA_SCHEMA)
        n_docs = doc_ids.size
        # Docs arrive doc_id-sorted, so every shard is one contiguous token
        # range: sort each shard SEGMENT by local term code (stable keeps
        # docs ascending) instead of one global argsort over an int64
        # (shard*V + tid) key. Same (shard, term, doc) order, but the sort
        # and gathers run on cache-resident segment slices and the per-token
        # temporaries are int32 — the kernel is DRAM-bandwidth-bound under
        # task concurrency, so bytes touched, not instructions, is the cost.
        tok_off = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(n_tok, out=tok_off[1:])
        sh_doc = doc_ids // span
        seg_doc = np.concatenate(
            ([0], np.flatnonzero(sh_doc[1:] != sh_doc[:-1]) + 1))
        seg_tok = tok_off[seg_doc]
        seg_end = np.append(seg_tok[1:], n)
        dict_enc = terms_list.flatten().dictionary_encode()
        tid = dict_enc.indices.to_numpy(zero_copy_only=False)
        if tid.dtype != np.int32:
            tid = tid.astype(np.int32)
        docidx = np.repeat(np.arange(n_docs, dtype=np.int32), n_tok)
        tfs_flat = rb.column("tfs").flatten().to_numpy(zero_copy_only=False)
        tid_o = np.empty(n, dtype=np.int32)
        didx_o = np.empty(n, dtype=np.int32)
        tf_o = np.empty(n, dtype=tfs_flat.dtype)
        for s, e in zip(seg_tok, seg_end):
            o = np.argsort(tid[s:e], kind="stable")
            tid_o[s:e] = tid[s:e][o]
            didx_o[s:e] = docidx[s:e][o]
            tf_o[s:e] = tfs_flat[s:e][o]
        # doc_id / doc_len / shard per posting via small per-doc lookup
        # tables (cache-resident) — not pre-sort n-sized int64 repeats
        doc_o = doc_ids[didx_o]
        dl_o = dls.astype(np.float32)[didx_o]
        sh_o = np.repeat(sh_doc[seg_doc], seg_end - seg_tok)
        return _encode_arrays(sh_o, tid_o, doc_o, tf_o, dl_o, cfg, stats,
                              scorer, term_dict=dict_enc.dictionary)

    def run(batches):
        carry: pa.RecordBatch | None = None
        for rb in batches:
            if carry is not None and carry.num_rows:
                rb = (pa.Table.from_batches([carry, rb])
                      .combine_chunks().to_batches()[0])
            if not rb.num_rows:
                continue
            shard_np = rb.column("shard_id").to_numpy(zero_copy_only=False)
            tail = shard_np == shard_np[-1]
            if tail.all():
                carry = rb
                continue
            first_tail = int(np.flatnonzero(tail).min())
            carry = rb.slice(first_tail)
            yield encode_shards(rb.slice(0, first_tail))
        if carry is not None and carry.num_rows:
            yield encode_shards(carry)

    if bucket_starts is not None and shard_stride == 1:
        straddle = sorted({s // span for s in bucket_starts if s % span})
        # straddle shards shuffle as COMPACT doc rows (token arrays intact,
        # same narrow kernel) — only if most of the corpus straddles is the
        # one classic full repartition cheaper than the two-branch plan
        if len(straddle) * span * 2 > max(1, stats.get("num_docs", 0)):
            bucket_starts = None
    if bucket_starts is not None and shard_stride == 1:
        # ---- shuffle-free plan (see docstring)
        interior = (base_cols.filter(~F.col("shard_id").isin(straddle))
                    if straddle else base_cols)
        encoded = interior.mapInArrow(run, schema=ENCODED_STR_SCHEMA)
        if straddle:
            # compact-row shuffle of ONLY the straddling shards through the
            # same docwise kernel (no token explode, no (shard, term)
            # grouping pass). Placement is exact — straddle-list rank i
            # lands on partition i % bparts — because a hash repartition
            # over O(parts) distinct shard ids strands ~1/e of the
            # partitions (operators/partitioning.py).
            bparts = max(1, min(parts, len(straddle)))
            vals_b = partition_values(spark, bparts)
            rank_of = (F.array_position(
                F.lit(np.array(straddle, dtype=np.int64)),
                F.col("shard_id")) - 1).cast("long")
            boundary = (
                base_cols.filter(F.col("shard_id").isin(straddle))
                .repartition(bparts, round_robin_expr(rank_of, bparts, vals_b))
                .sortWithinPartitions("shard_id", "doc_id")
                .mapInArrow(run, schema=ENCODED_STR_SCHEMA))
            encoded = encoded.unionByName(boundary)
        return encoded

    vals = partition_values(spark, parts)
    place_key = (F.col("shard_id") / F.lit(shard_stride)).cast("long") \
        if shard_stride > 1 else F.col("shard_id")
    arranged = (
        base_cols
        .repartition(parts, round_robin_expr(place_key, parts, vals))
        .sortWithinPartitions("shard_id", "doc_id")
    )
    return arranged.mapInArrow(run, schema=ENCODED_STR_SCHEMA)


def encode_postings_str(flat_df, cfg: IndexConfig, stats: dict,
                        num_partitions: int | None = None):
    """String-keyed exploded encode: flat_df (term string, doc_id, tf,
    doc_len) -> ENCODED_STR_SCHEMA rows. The web-scale fallback when one
    doc-shard's token mass exceeds the docwise working-set bound: shuffles
    the flat rows on (shard_id, term) — each group still bounded by
    shard_span postings — and group-detects on batch-local dictionary
    codes (monotone over the sorted input)."""
    from pyspark.sql import functions as F

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    if not scorer.separable and not getattr(scorer, "stats_free", False):
        raise ValueError("string-keyed encode requires separable/stats-free "
                         "scorer (df/cf flows use the term_id path)")
    with_shard = flat_df.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
    parts = (num_partitions
             or with_shard.sparkSession.sparkContext.defaultParallelism * 2)
    arranged = (
        with_shard
        .repartition(parts, "shard_id", "term")
        .sortWithinPartitions("shard_id", "term", "doc_id")
        .select("shard_id", "term", "doc_id", "tf", "doc_len")
    )

    def encode(rb: pa.RecordBatch) -> pa.RecordBatch:
        dict_enc = rb.column("term").dictionary_encode()
        tid = dict_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return _encode_arrays(
            rb.column("shard_id").to_numpy(zero_copy_only=False),
            tid,
            rb.column("doc_id").to_numpy(zero_copy_only=False),
            rb.column("tf").to_numpy(zero_copy_only=False).astype(np.int64),
            rb.column("doc_len").to_numpy(zero_copy_only=False),
            cfg, stats, scorer, term_dict=dict_enc.dictionary)

    def run(batches):
        carry: pa.RecordBatch | None = None
        for rb in batches:
            if carry is not None and carry.num_rows:
                rb = (pa.Table.from_batches([carry, rb])
                      .combine_chunks().to_batches()[0])
            if not rb.num_rows:
                continue
            shard_np = rb.column("shard_id").to_numpy(zero_copy_only=False)
            last_term = rb.column("term")[rb.num_rows - 1]
            import pyarrow.compute as pc

            term_tail = pc.equal(rb.column("term"), last_term).to_numpy(
                zero_copy_only=False)
            tail = (shard_np == shard_np[-1]) & term_tail
            if tail.all():
                carry = rb
                continue
            first_tail = int(np.flatnonzero(tail).min())
            carry = rb.slice(first_tail)
            yield encode(rb.slice(0, first_tail))
        if carry is not None and carry.num_rows:
            yield encode(carry)

    return arranged.mapInArrow(run, schema=ENCODED_STR_SCHEMA)


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
