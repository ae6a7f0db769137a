"""Index build pipeline: web pages -> inverted index tables.

Spark-first re-expression of the reference pipeline
parse_collection -> invert -> create_wand_data -> compress_inverted_index
(docs/src/guide/indexing-pipeline.md):

1. extract text from html + tokenize + per-doc term counts in ONE
   mapInPandas pass running directly on the table scan — the html payload
   is never shuffled, and the forward index stays transient, as term
   strings, until the lexicon join (the reference likewise keeps
   batch-local dicts until merge, src/forward_index_builder.cpp:209-273),
2. dense docIDs by global URL rank (doubles as the reorder-by-URL
   compression win, docs/src/guide/reordering.md:46-66): URL range
   boundaries are sampled from the RAW table's url column (a column-pruned
   parquet scan — never re-running the tokenize UDF the way a
   RangePartitioner sample of its output would), each tokenized row gets a
   bucket id from those boundaries, one hash shuffle on the bucket id +
   partition-local sort makes buckets contiguous and url-sorted, and
   doc_id = bucket offset + (monotonic id - bucket's min monotonic id).
   No global window, no wide-payload range shuffle,
3. collection stats fused into the same per-bucket aggregation job,
4. lexicon = distinct terms, dense term_ids (sorted, like fwd.terms),
5. postings = encode_postings (doc-sharded, block-encoded, block-max'd),
6. per-term stats (df, cf, max score) aggregated from the ENCODED posting
   rows (one row per shard x term) rather than the 100x larger flat
   postings — the WAND data of wand_data.hpp:36-115.

All stages optionally checkpoint through a BuildManifest for resume.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pandas as pd

from pisa_spark.config import DEFAULT_CONFIG, IndexConfig
from pisa_spark.functions.scoring import make_scorer
from pisa_spark.functions.text import extract_text_batch
from pisa_spark.functions.tokenize import make_analyzer
from pisa_spark.operators.postings import (encode_postings,
                                           encode_postings_docwise)
from pisa_spark.plans.checkpoint import BuildManifest


@dataclass
class InvertedIndex:
    """The index as a set of DataFrames (reference artifact -> table):

    docs     (doc_id, url, doc_len, shard_id)      — doclex + .sizes
    lexicon  (term, term_id, df, cf, max_part, max_score) — termlex + WAND term stats
    postings encoded rows (see operators/postings.py) — inv + WAND block maxes
    shards   (shard_id, base_doc, doc_lens)        — per-shard doc lengths
    stats    {num_docs, collection_len, avg_len}   — WAND global stats
    """

    docs: object
    lexicon: object
    postings: object
    shards: object
    stats: dict
    cfg: IndexConfig
    # True when every doc-shard's posting rows are guaranteed to live in a
    # single DataFrame partition (the docwise encode's shard-keyed
    # repartition survives the lazy broadcast-join view) — the low-latency
    # serve path (operators/topk.py) can then kernel straight over the
    # cached partitions without a co-locating shuffle.
    postings_colocated: bool = False
    # lexicon-last indexes: the underlying string-keyed encoded rows. The
    # serve path filters these by term STRING directly — the id-keyed
    # `postings` view is a lazy broadcast join whose lexicon broadcast
    # would otherwise be rebuilt on every single-query job (~350 ms/query
    # measured at 60k docs).
    postings_str: object = None


def dense_ids(df, order_col: str, id_col: str, num_partitions: int | None = None):
    """Assign dense 0..N-1 IDs in global `order_col` order, scalably: one
    range-partitioning shuffle + partition-local sort, then arithmetic on
    monotonically_increasing_id (pid in the upper bits, per-partition row
    number in the lower 33) offset by collected per-partition counts.

    No global window, and — unlike a window over spark_partition_id — no
    second shuffle of the (potentially wide) payload columns."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    mask = (1 << 33) - 1
    arranged = (
        df.repartitionByRange(parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_mono", F.monotonically_increasing_id())
        .persist()
    )
    counts = (
        arranged.select(F.shiftright("_mono", 33).alias("_pid"))
        .groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets, acc = [], 0
    for row in counts:  # range partitions are key-ordered, so pid order
        offsets.append((int(row["_pid"]), acc))  # == global key order
        acc += row["count"]
    offsets_df = spark.createDataFrame(offsets or [(0, 0)],
                                       "_pid long, _offset long")
    out = (
        arranged
        .withColumn("_pid", F.shiftright("_mono", 33))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col,
                    F.col("_offset") + (F.col("_mono").bitwiseAND(F.lit(mask))))
        .drop("_pid", "_mono", "_offset")
    )
    return out, arranged


def extract_pages(pages_df, cfg: IndexConfig = DEFAULT_CONFIG,
                  filter_lang: str | None = "en"):
    """web_pages(url, warc_ts, html, text, lang) -> (url, text) via the
    byte-identical extractor. Rows failing the lang filter are dropped
    before tokenization (pushed ahead of the UDF by Catalyst)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = pages_df
    if filter_lang is not None and "lang" in df.columns:
        df = df.filter(F.col("lang") == filter_lang)

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return extract_text_batch(html)

    return df.select("url", _extract(F.col("html")).alias("text"))


TOKENS_SCHEMA = ("url string, doc_len int, "
                 "terms array<string>, tfs array<int>")


def doc_term_counts(pages_df, cfg: IndexConfig,
                    html_col: str | None = None):
    """(url, text|html) -> one row per doc with distinct terms and their
    counts as compact arrays — the per-batch forward index + run-length
    count of reference src/invert.cpp:43-69 fused (optionally with HTML
    extraction) into a single Arrow pass running straight on the table
    scan. One row per doc keeps the Python->Arrow boundary cheap; the
    (term, tf) explode happens JVM-side afterwards."""
    from collections import Counter

    analyze = make_analyzer(cfg)
    use_html = html_col is not None
    src_col = html_col if use_html else "text"

    def run(batches):
        from pisa_spark.functions.text import strip_html, strip_http_headers

        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[src_col]):
                if use_html:
                    if payload is None:
                        text = ""
                    else:
                        if isinstance(payload, (bytes, bytearray)):
                            payload = bytes(payload).decode(
                                "utf-8", errors="replace")
                        text = strip_html(strip_http_headers(payload))
                else:
                    text = payload
                toks = analyze(text) if text else []
                counts = Counter(toks)
                rows.append((url, len(toks),
                             list(counts.keys()),
                             np.fromiter(counts.values(), dtype=np.int32,
                                         count=len(counts))))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "doc_len", "terms", "tfs"])

    return pages_df.select("url", src_col).mapInPandas(run, TOKENS_SCHEMA)


def _quantize_postings(tf_full, cfg: IndexConfig, scorer, stats: dict):
    """(term_id, doc_id, tf, doc_len) -> tf replaced by the linearly
    quantized float32 score; returns (df, new cfg with scorer='quantized',
    pass-through scorer, true per-term (df, cf)). Costs one extra scoring
    pass to find the global max score, like the reference's wand-data
    pre-pass. The returned term stats are the PRE-quantization df/cf — the
    reference's wand_data keeps term collection frequency, not a sum of
    quantized scores, so the lexicon must carry these instead of sum_tf."""
    import dataclasses

    from pyspark.sql import functions as F

    from pisa_spark.functions.scoring import LinearQuantizer, make_scorer

    term_stats_pre = (
        tf_full.groupBy("term_id")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
    joined = tf_full.join(term_stats_pre, "term_id")
    num_docs, avg_len = stats["num_docs"], stats["avg_len"]
    collection_len = stats["collection_len"]

    @F.pandas_udf("float")
    def _score(tf: pd.Series, dl: pd.Series, df: pd.Series,
               cf: pd.Series) -> pd.Series:
        if scorer.separable:
            idf = scorer.idf(df.to_numpy(), num_docs)
            return pd.Series(
                idf.astype(np.float32)
                * scorer.doc_part(tf.to_numpy(), dl.to_numpy(), avg_len))
        # non-separable scorers take per-row df/cf arrays (one numpy pass)
        return pd.Series(scorer.score(
            tf.to_numpy(), dl.to_numpy(),
            df=df.to_numpy(), cf=cf.to_numpy(),
            num_docs=num_docs, avg_len=avg_len,
            collection_len=collection_len).astype(np.float32))

    scored = joined.withColumn("_score", _score("tf", "doc_len", "df", "cf"))
    max_score = scored.agg(F.max("_score")).collect()[0][0] or 1.0
    quant = LinearQuantizer(float(max_score), cfg.quantize_bits)

    @F.pandas_udf("long")
    def _q(s: pd.Series) -> pd.Series:
        return pd.Series(quant(s.to_numpy()).astype(np.int64))

    out = scored.select("term_id", "doc_id", _q("_score").alias("tf"),
                        "doc_len")
    new_cfg = dataclasses.replace(cfg, scorer="quantized", quantize_bits=None)
    return out, new_cfg, make_scorer("quantized"), term_stats_pre


# --------------------------------------------------- global rank assignment

def _bare_parquet_files(df) -> list | None:
    """Leaf parquet files when df's analyzed plan is pure column pruning
    over one file relation. inputFiles() returns the leaf files even when
    the plan has filters/limits/joins above the scan, where footer-derived
    counts/samples would mis-state the post-filter data — so only a bare
    scan (column pruning over one relation) takes these shortcuts."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        bare = all(line.lstrip("+- :").startswith(
            ("Relation", "Project", "SubqueryAlias", "View"))
            for line in plan.splitlines() if line.strip())
        if not bare:
            return None
        files = df.inputFiles()
        if not files or not all(f.endswith(".parquet") for f in files):
            return None
        return sorted(files)
    except Exception:
        return None


def _footer_count(df) -> int | None:
    """Row count from parquet footers (driver-side metadata reads — cheap on
    local disk and on object stores alike); None when the plan isn't a plain
    parquet scan. Saves the count() job _sample_cuts would otherwise run."""
    files = _bare_parquet_files(df)
    if files is None:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            total += pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
        return total
    except Exception:
        return None


_CUT_SAMPLE_MAX_FILES = 64
_CUT_SAMPLE_MAX_GROUPS = 256  # total row-group column reads across files


def _arrow_cut_sample(df, col: str, need: int) -> list | None:
    """Driver-side systematic sample of `col` read straight from the parquet
    leaves with pyarrow — replaces the Spark sample job that billed a fixed
    ~0.7-1.1 s scheduler+scan cost to every build at every cluster size
    (RangePartitioner's sample job shape, without the job). Bounded at any
    scale: at most _CUT_SAMPLE_MAX_FILES evenly spaced files are opened and
    at most _CUT_SAMPLE_MAX_GROUPS row groups' `col` column is read in
    total (evenly spaced within each file, incl. first and last — a file
    sorted by `col` must contribute samples from its whole key range or
    the cuts skew), strided down to a per-file quota — bounded column
    reads however large the table. Returns None (caller falls back to the Spark sample
    job) for non-parquet lineage, filtered plans, schema mismatch, or any
    read error. Cut quality only affects bucket BALANCE, never rank
    correctness (assign_rank_ids computes exact global ranks within any
    bucketing), and the 4x-buckets-per-partition layout absorbs sampling
    error."""
    files = _bare_parquet_files(df)
    if not files:
        return None
    try:
        import numpy as np
        import pyarrow.parquet as pq

        if len(files) > _CUT_SAMPLE_MAX_FILES:
            step = len(files) / _CUT_SAMPLE_MAX_FILES
            files = [files[int(i * step)]
                     for i in range(_CUT_SAMPLE_MAX_FILES)]
        per_file = max(8, -(-need * 2 // len(files)))
        vals: list = []
        for f in files:
            pf = pq.ParquetFile(f.removeprefix("file:"))
            if col not in pf.schema_arrow.names:
                return None
            ngr = pf.metadata.num_row_groups
            if ngr <= 0:
                continue
            k = min(ngr, max(4, _CUT_SAMPLE_MAX_GROUPS // len(files)))
            picks = sorted({round(i * (ngr - 1) / max(1, k - 1))
                            for i in range(k)})
            quota = -(-per_file // len(picks))
            for g in picks:
                arr = pf.read_row_group(g, columns=[col]).column(0)
                n = len(arr)
                if n == 0:
                    continue
                stride = max(1, n // quota)
                vals.extend(arr.take(np.arange(0, n, stride)).to_pylist())
        return vals
    except Exception:
        return None


def _sample_cuts(df, col: str, parts: int, per_part: int = 48,
                 approx_count: int | None = None) -> list:
    """parts-1 sorted range cut points for `col`, from a driver-side sample
    (what RangePartitioner does, but reading ONLY `col` from `df` — so a
    cheap column-pruned source can stand in for an expensive lineage).
    approx_count skips the count() job (any near-count works: it only
    sizes the sample fraction)."""
    if parts <= 1:
        return []
    arrow_vals = _arrow_cut_sample(df, col, parts * per_part)
    if arrow_vals is not None and len(arrow_vals) >= parts * 4:
        vals = sorted(v for v in arrow_vals if v is not None)
        cuts: list = []
        for i in range(1, parts):
            c = vals[min(len(vals) - 1, (i * len(vals)) // parts)] \
                if vals else None
            if c is not None and (not cuts or c > cuts[-1]):
                cuts.append(c)
        return cuts
    cnt = approx_count if approx_count is not None else df.count()
    if cnt == 0:
        return []
    frac = min(1.0, (parts * per_part * 1.2) / cnt)
    vals = sorted(r[0] for r in df.select(col).sample(False, frac, seed=13)
                  .collect() if r[0] is not None)
    if len(vals) < parts * 4 and frac < 1.0:
        # approx_count overcounted (or the data is tiny): the sample came
        # back too thin to cut `parts` balanced ranges — resample at a
        # fraction sized from the observed row count instead of silently
        # funneling the build's dominant stage into a few buckets
        observed = max(1, round(len(vals) / frac))
        frac = min(1.0, (parts * per_part * 1.2) / observed)
        vals = sorted(r[0] for r in df.select(col).sample(False, frac, seed=13)
                      .collect() if r[0] is not None)
    cuts: list = []
    for i in range(1, parts):
        c = vals[min(len(vals) - 1, (i * len(vals)) // parts)] if vals else None
        if c is not None and (not cuts or c > cuts[-1]):
            cuts.append(c)
    return cuts


def _bucket_expr(col: str, cuts: list):
    """pid = number of cut points <= col — a chain of comparisons that
    whole-stage codegen handles; no per-row Python, no extra shuffle."""
    from pyspark.sql import functions as F

    e = F.lit(0)
    for c in cuts:
        e = e + (F.col(col) >= F.lit(c)).cast("int")
    return e.cast("long")


def assign_rank_ids(df, order_col: str, id_col: str, cuts: list, parts: int,
                    extra_aggs: list | None = None, persist: bool = True,
                    align: int = 1):
    """Assign dense 0..N-1 ids in global `order_col` order without a global
    window and without range-sampling `df`'s (possibly expensive) lineage:
    bucket by the precomputed cut points, one hash shuffle on the bucket id,
    partition-local sort, then id = bucket offset + (mono - bucket min mono).
    Buckets are contiguous within a partition after the sort, so the
    arithmetic holds even when several buckets hash into one partition.

    Returns (with_ids, arranged_cached, meta_rows); meta_rows carries one
    row per bucket including any `extra_aggs` (lets callers fuse their own
    global stats into this job instead of running another).

    Placement: buckets land on partitions round-robin (bucket i -> partition
    i % parts, via operators.partitioning) instead of by raw hash — with
    only O(parts) distinct bucket values, hash placement leaves ~1/e of the
    partitions empty and doubles up others, a 2x straggler on the build's
    dominant stage. Callers pass MORE buckets than parts (e.g. 4x) so
    cut-sampling error also averages out across a partition's buckets."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pisa_spark.operators.partitioning import (partition_values,
                                                   round_robin_expr)

    spark = df.sparkSession
    vals = partition_values(spark, parts)
    # DESER level: the columnar cache build for serialized levels pays a
    # compression pass that contends badly at high task concurrency
    # (measured: +15s on 300k docs at 16 cores, free at 4)
    arranged = (
        df.withColumn("_pid", _bucket_expr(order_col, cuts))
        .repartition(parts, round_robin_expr(F.col("_pid"), parts, vals))
        .sortWithinPartitions("_pid", order_col)
        .withColumn("_mono", F.monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    aggs = [F.count("*").alias("_n"), F.min("_mono").alias("_m0")]
    aggs += list(extra_aggs or [])
    meta = sorted(arranged.groupBy("_pid").agg(*aggs).collect(),
                  key=lambda r: r["_pid"])
    # align > 1: pad each bucket's id offset up to the next multiple —
    # ids stay contiguous WITHIN a bucket with holes only at bucket seams.
    # Passing align=shard_span makes every bucket start span-aligned, so
    # NO doc shard ever straddles a bucket boundary and the docwise encode
    # is fully shuffle-free with zero boundary work (the straddle mass
    # otherwise grows with the bucket count, i.e. with the cluster size —
    # the higher-parallelism build paid strictly more encode work). Holes
    # are tails of a bucket's last shard: present docs still occupy the
    # first (doc_id - shard_base) positions, so doc_lens indexing and
    # every downstream consumer are unaffected; gap cost in the docID
    # codecs is a few extra bits per seam.
    offsets, acc = [], 0
    for r in meta:  # buckets are ordered by cut point, so pid order == key order
        acc = -(-acc // align) * align
        offsets.append((int(r["_pid"]), acc, int(r["_m0"])))
        acc += int(r["_n"])
    odf = spark.createDataFrame(offsets or [(0, 0, 0)],
                                "_pid long, _off long, _m0 long")
    out = (
        arranged.join(F.broadcast(odf), "_pid")
        .withColumn(id_col, F.col("_off") + F.col("_mono") - F.col("_m0"))
        .drop("_pid", "_mono", "_off", "_m0")
    )
    return out, arranged, meta


def _f32(x: float) -> float:
    return float(np.float32(x))



def _vocab_probe(terms_distinct, cap: int):
    """One job that BOTH decides small-vs-web-scale vocabulary and fetches
    it when small. Arrow toPandas instead of collect(): Row-object
    materialization of a 100k+ string vocabulary costs seconds of DRIVER
    time — a fixed cost that bills straight against build scaling."""
    pdf = terms_distinct.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        return None
    return sorted(pdf["term"].tolist())


def _lexicon_from_vocab(spark, vocab: list):
    """Dense term_ids for a sorted vocabulary, shipped via Arrow (a plain
    createDataFrame over 100k+ Python tuples serializes row-by-row —
    seconds of fixed driver time)."""
    lex_pdf = pd.DataFrame(
        {"term": vocab, "term_id": np.arange(len(vocab), dtype=np.int64)})
    return spark.createDataFrame(lex_pdf, "term string, term_id long")


_LEXICON_SCHEMA = ("term string, term_id long, df long, cf long, "
                   "max_part float, max_score float")


def _max_score_np(df_arr: np.ndarray, max_part: np.ndarray, scorer,
                  cfg: IndexConfig, stats: dict) -> np.ndarray:
    """max_score column, numpy — mirrors the distributed lexicon stage's
    expressions bit-for-bit (bm25: double idf * double(max_part) cast
    float32, like the SQL; other separable: scorer.idf f32 * f32)."""
    mp = max_part.astype(np.float32)
    if scorer.separable and cfg.scorer == "bm25":
        dfv = df_arr.astype(np.float64)
        idf = np.maximum(1e-6, np.log(
            (float(stats["num_docs"]) - dfv + 0.5) / (dfv + 0.5))
        ) * (1.0 + cfg.bm25_k1)
        return (idf * mp.astype(np.float64)).astype(np.float32)
    if scorer.separable:
        return scorer.idf(df_arr, stats["num_docs"]) * mp
    return mp


def _lexicon_from_term_agg(spark, agg_pdf: pd.DataFrame, scorer,
                           cfg: IndexConfig, stats: dict):
    """Full lexicon (term, term_id, df, cf, max_part, max_score) built
    DRIVER-side from the one-scan per-term aggregation of the encoded
    rows (broadcastable vocabularies only), shipped via Arrow. Fusing the
    vocabulary probe and the WAND term-stats scan into one job removes a
    whole pass over the encoded cache from every lexicon-last build."""
    agg_pdf = agg_pdf.sort_values("term", kind="mergesort").reset_index(
        drop=True)
    agg_pdf["term_id"] = np.arange(len(agg_pdf), dtype=np.int64)
    agg_pdf["max_score"] = _max_score_np(
        agg_pdf["df"].to_numpy(), agg_pdf["max_part"].to_numpy(),
        scorer, cfg, stats)
    out = agg_pdf[["term", "term_id", "df", "cf", "max_part", "max_score"]]
    return spark.createDataFrame(out, _LEXICON_SCHEMA)


def _lexicon_driver_ids(spark, aggd, scorer, cfg: IndexConfig, stats: dict):
    """Dense sorted-term ids for a BROADCAST-size vocabulary, assigned
    driver-side from one slim Arrow transfer of the term column and
    joined back onto the cached term-agg rows (stats stay distributed).

    Rationale: when n_vocab <= lexicon_broadcast_max the term_id join
    below broadcasts the lexicon anyway, so a driver round-trip of the
    vocabulary is already in the plan — assigning ids there adds nothing
    serial that wasn't. The distributed alternative (range-sample +
    rank shuffle, kept for larger vocabularies) costs ~3 s of fixed
    small-job overhead per build, billed identically at every cluster
    size — a direct tax on build scaling efficiency.

    The round-trip stays in Arrow end-to-end: toArrow ->
    pc.sort_indices driver-side, then the sorted vocabulary ships back
    as an IPC-bytes broadcast VARIABLE and each task computes
    term_id = pc.index_in(term, sorted_terms) — the rank in sorted
    order IS the dense id. No createDataFrame (measured ~0.5-1.7 s of
    serial driver conversion at 596k rows), no LocalRelation that every
    downstream job re-materializes (~1.1 s each), and no broadcast-hash
    -join relation built single-threaded on the driver. Arrow's
    unsigned-byte string order == Spark's UTF8 binary order."""
    from pyspark.sql.types import LongType, StructField, StructType

    terms = aggd.select("term").toArrow().column("term").combine_chunks()
    terms_sorted = pc.take(terms, pc.sort_indices(terms))
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink,
                           pa.schema([("term", pa.string())])) as w:
        w.write_batch(pa.record_batch([terms_sorted], names=["term"]))
    bv = spark.sparkContext.broadcast(sink.getvalue().to_pybytes())
    out_schema = StructType(
        list(aggd.schema.fields) + [StructField("term_id", LongType())])

    def attach(batches):
        vs = (pa.ipc.open_stream(pa.py_buffer(bv.value)).read_all()
              .column("term").combine_chunks())
        for rb in batches:
            ids = pc.index_in(rb.column("term"),
                              value_set=vs).cast(pa.int64())
            yield rb.append_column("term_id", ids)

    lex_ids = aggd.mapInArrow(attach, schema=out_schema)
    return _with_max_score(lex_ids, scorer, cfg, stats).select(
        "term", "term_id", "df", "cf", "max_part", "max_score")


def _term_agg_of(enc_str):
    """Per-term WAND stats straight off the string-keyed encoded rows."""
    from pyspark.sql import functions as F

    return enc_str.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"),
        F.max(F.array_max("block_max_part")).alias("max_part"))


def join_term_ids(enc_str_df, lexicon_df, broadcast_max: int):
    """Attach dense term_ids to string-keyed encoded posting rows (the
    lexicon-last join-back, shared by the resumable build and load_index).

    Broadcasts the lexicon when it fits the broadcast bound — a hash probe
    per encoded row on the scan, the index itself never shuffles; above
    the bound it is a sort-merge join. The caller's parquet artifacts are
    the backing store, so the view stays lazy either way."""
    from pyspark.sql import functions as F

    from pisa_spark.operators.postings import _ENCODED_COLUMNS

    lex = lexicon_df.select("term", "term_id")
    n = _footer_count(lex)
    if n is None:
        n = lex.count()
    if n <= broadcast_max:
        joined = enc_str_df.join(F.broadcast(lex), "term")
    else:
        joined = enc_str_df.join(lex, "term")
    return joined.drop("term").select(*_ENCODED_COLUMNS)



def _with_max_score(lex, scorer, cfg: IndexConfig, stats: dict):
    """Append the max_score column to a (.., df, cf, max_part) lexicon DF —
    the WAND term upper bound (wand_data.hpp:64-115); SQL doubles for bm25
    (kernels recompute idf in float32 themselves), scorer.idf pandas UDF
    for other separable scorers, pass-through otherwise."""
    from pyspark.sql import functions as F

    if scorer.separable and cfg.scorer == "bm25":
        n_docs, k1 = stats["num_docs"], cfg.bm25_k1
        idf = F.greatest(
            F.lit(1e-6),
            F.log((F.lit(float(n_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5))) * F.lit(1.0 + k1)
        return lex.withColumn(
            "max_score", (idf * F.col("max_part")).cast("float"))
    if scorer.separable:
        n_docs = stats["num_docs"]

        @F.pandas_udf("float")
        def _max_score(df_col: pd.Series, mp: pd.Series) -> pd.Series:
            idf = scorer.idf(df_col.to_numpy(), n_docs)
            return pd.Series(idf * mp.to_numpy(dtype=np.float32))

        return lex.withColumn("max_score", _max_score("df", "max_part"))
    return lex.withColumn("max_score", F.col("max_part").cast("float"))


def build_index(docs_df, cfg: IndexConfig = DEFAULT_CONFIG,
                out_dir: str | None = None, n_buckets: int = 8,
                url_col: str = "url", text_col: str = "text",
                html_col: str | None = None,
                eager: bool = False,
                bucket_min_tokens: int = 1 << 25) -> InvertedIndex:
    """Build the full index from a (url, text) or (url, html) DataFrame.

    With html_col set, extraction is fused into the tokenize pass (one
    Python/Arrow boundary for the whole scalar layer). With out_dir set,
    every stage checkpoints through a BuildManifest and a rerun resumes,
    skipping completed artifacts/buckets. With eager=True every stage is
    materialized inside this call and per-phase wall seconds are recorded
    in stats["phase_seconds"] (build metrics, north-rule requirement).
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    spark = docs_df.sparkSession
    manifest = BuildManifest(out_dir) if out_dir else None
    t_start = time.time()
    phase_t = [time.time()]
    phases: dict = {}

    def _phase(name: str) -> None:
        now = time.time()
        phases[name] = round(now - phase_t[0], 3)
        phase_t[0] = now

    parts = spark.sparkContext.defaultParallelism

    payload = html_col if html_col else text_col
    src = docs_df.select(F.col(url_col).alias("url"),
                         F.col(payload).alias(payload if html_col else "text"))

    # ---- stage: fused extract+tokenize on the raw scan, then dense
    # URL-ordered docIDs. URL cut points are sampled from the RAW input
    # (column-pruned scan — the html payload is neither sampled nor
    # shuffled; only the ~10x slimmer token arrays move).
    # doc_terms is the ROOT artifact: everything docID-dependent derives
    # from it, and downstream marks gate on its durability (see below).
    # docs is a projection — rebuilt from the artifact if missing, never by
    # re-running the tokenize stage (a re-run could assign different ids
    # and silently orphan already-marked postings buckets).
    _mark_gate = None
    _join_writes = None
    _tok_cache = None
    bucket_starts = None  # per-bucket doc_id starts; enables the
    # shuffle-free docwise encode (lost on parquet resume, where
    # doc_terms' physical partitioning is file splits, not buckets)
    if manifest and manifest.done("doc_terms"):
        doc_terms = manifest.read_df(spark, "doc_terms")
        stats = manifest.state["stats"]
        if manifest.done("docs"):
            docs = manifest.read_df(spark, "docs")
        else:
            manifest.write_df("docs", doc_terms.select(
                "doc_id", "url", "doc_len", "shard_id"))
            docs = manifest.read_df(spark, "docs")
    else:
        # 4x more buckets than partitions: round-robin placement gives each
        # partition ~4 equal buckets, averaging out cut-sampling error
        # sampled under the SOURCE column name so the pyarrow footer path
        # can match the file schema; cut points are plain values, the
        # downstream bucket expression applies them to the aliased column
        cuts = _sample_cuts(docs_df.select(url_col), url_col, parts * 4,
                            approx_count=_footer_count(docs_df))
        _phase("url_cuts")
        tokenized = doc_term_counts(src, cfg, html_col=html_col)
        # align=shard_span: bucket doc_id offsets pad to span multiples, so
        # no shard straddles a bucket seam and the docwise encode runs with
        # zero shuffle at ANY bucket count (see assign_rank_ids)
        doc_terms, _tok_cache, meta = assign_rank_ids(
            tokenized, "url", "doc_id", cuts, parts,
            extra_aggs=[F.sum("doc_len").alias("_dl")],
            align=cfg.shard_span)
        # ---- collection stats, fused into the rank job
        # (wand_data.hpp:52-60: m_avg_len = float(len / double(num_docs)))
        _phase("tokenize_rank")
        num_docs = sum(int(r["_n"]) for r in meta)
        collection_len = sum(int(r["_dl"] or 0) for r in meta)
        bucket_starts, _acc = [], 0
        for r in meta:  # sorted by _pid == doc_id order; mirrors the
            _acc = -(-_acc // cfg.shard_span) * cfg.shard_span  # align pad
            bucket_starts.append(_acc)
            _acc += int(r["_n"])
        stats = {
            "num_docs": num_docs,
            "collection_len": collection_len,
            "avg_len": _f32(collection_len / num_docs) if num_docs else 0.0,
        }
        doc_terms = doc_terms.withColumn(
            "shard_id",
            (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
        docs = doc_terms.select("doc_id", "url", "doc_len", "shard_id")
        if manifest:
            import threading

            manifest.set_stats(stats)

            # Durability writes run CONCURRENTLY with the encode stage's
            # bucket jobs (they scan the same tokenize cache): serializing
            # them added their full wall time to every checkpointed build.
            # Consistency rule: nothing downstream is MARKED complete until
            # the doc_terms artifact (the stable source a resume re-reads)
            # is durable — bucket workers join this thread before marking.
            _write_errs: list = []

            def _writer(name, df, partition_by=None):
                def run():
                    try:
                        manifest.write_df(name, df, partition_by=partition_by)
                    except BaseException as ex:  # re-raised at join
                        _write_errs.append(ex)
                t = threading.Thread(target=run)
                t.start()
                return t

            # the artifact is partitioned by the postings bucket key (shard
            # mod n_buckets) so a RESUMED build's bucket jobs partition-
            # prune their scans to 1/n_buckets of the corpus
            _doc_terms_thread = _writer(
                "doc_terms",
                doc_terms.withColumn(
                    "_bucket", F.pmod("shard_id", F.lit(n_buckets))),
                partition_by=["_bucket"])
            _docs_thread = _writer("docs", docs)

            def _mark_gate():
                _doc_terms_thread.join()
                if _write_errs:
                    raise _write_errs[0]

            def _join_writes():
                _doc_terms_thread.join()
                _docs_thread.join()
                if _write_errs:
                    raise _write_errs[0]

    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    colocated = False  # set True by the shard-keyed docwise encode paths
    enc_str_handle = None  # lexicon-last string-keyed rows (serve path)
    lexicon = None  # set early by the fused lexicon-last small-vocab paths
    plain_scoring = (cfg.quantize_bits is None
                     and (scorer.separable
                          or getattr(scorer, "stats_free", False)))
    # lexicon-LAST flow (the default/bm25 path): encode string-keyed posting
    # rows first, then derive the lexicon from the ENCODED rows (~avg_len x
    # fewer than flat postings) and join term_ids back. This removes the
    # vocabulary probe/distinct job over the flat token stream, the vocab
    # broadcast, and the flat-postings/lexicon join — the three pieces that
    # do not shrink with executors. Quantized and non-separable-scorer
    # builds need per-term stats BEFORE encoding, so they keep the
    # lexicon-first flow. Manifest (resumable) builds run lexicon-last too:
    # their postings buckets are keyed on DOC SHARDS (shard_id mod
    # n_buckets — stable across resumes because doc_ids come from the
    # checkpointed docs artifact), not on term_ids.
    lexicon_last = plain_scoring
    vocab_map = None
    true_term_stats = None
    if not lexicon_last:
        # flat forward index: (doc_id, doc_len, term, tf) — JVM-side explode
        # of the compact per-doc arrays (map_to_postings, invert.cpp:43-53)
        flat_terms = doc_terms.select(
            "doc_id", "doc_len",
            F.explode(F.arrays_zip("terms", "tfs")).alias("z")
        ).select(
            "doc_id", "doc_len",
            F.col("z.terms").alias("term"),
            F.col("z.tfs").cast("long").alias("tf"))

        # ---- stage: lexicon (sorted distinct terms -> dense term_ids, like
        # fwd.terms; reference src/forward_index_builder.cpp:168-177)
        if manifest and manifest.done("lexicon_base"):
            lexicon_base = manifest.read_df(spark, "lexicon_base")
        else:
            terms_distinct = flat_terms.select("term").distinct()
            vocab = _vocab_probe(terms_distinct, cfg.lexicon_broadcast_max)
            if vocab is not None:
                vocab_map = {t: i for i, t in enumerate(vocab)}
                lex_with_ids = _lexicon_from_vocab(spark, vocab)
            else:
                terms_distinct = terms_distinct.persist(
                    StorageLevel.MEMORY_AND_DISK_DESER)
                term_cuts = _sample_cuts(terms_distinct, "term", parts * 4)
                lex_with_ids, _lex_cache, _ = assign_rank_ids(
                    terms_distinct, "term", "term_id", term_cuts, parts)
            if manifest:
                manifest.write_df("lexicon_base", lex_with_ids)
                lexicon_base = manifest.read_df(spark, "lexicon_base")
                terms_distinct.unpersist()
            else:
                lexicon_base = lex_with_ids
        _phase("lexicon_base")

        # ---- stage: tf table (term remap, reference :176-194)
        tf_full = (
            flat_terms
            .join(lexicon_base.select("term", "term_id"), "term")
            .select("term_id", "doc_id", "tf", "doc_len")
        )
        if cfg.quantize_bits and cfg.scorer != "quantized":
            # score every posting (float32), quantize into the tf slot, and
            # flip the index to the pass-through scorer — the reference's
            # compress --quantize flow (block_inverted_index.hpp:446-468,
            # linear_quantizer.cpp; its wand-data pass likewise re-streams
            # the index to find the global max score first).
            tf_full, cfg, scorer, true_term_stats = _quantize_postings(
                tf_full, cfg, scorer, stats)
        elif not scorer.separable:
            # non-separable scorers need df/cf at encode time (full-score
            # block maxima); separable ones derive term stats from the
            # encoded rows
            term_stats_pre = (
                tf_full.groupBy("term_id")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
            tf_full = tf_full.join(term_stats_pre, "term_id")

    # ---- stage: per-shard doc length arrays (wand_data doc_lens).
    # Defined here so eager mode can materialize it CONCURRENTLY with the
    # posting encode (independent DAG branches; Spark schedules jobs from
    # separate driver threads side by side) — serializing them just adds
    # a fixed job latency to every build.
    shards = None
    shards_thread = None
    if manifest and manifest.done("shards"):
        shards = manifest.read_df(spark, "shards")
    else:
        shards_raw = (
            docs.groupBy("shard_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("doc_id", "doc_len"))).alias("dl"))
            .select(
                "shard_id",
                (F.col("shard_id") * cfg.shard_span).alias("base_doc"),
                F.transform("dl", lambda x: x["doc_len"]).alias("doc_lens"),
            )
        )
        if not manifest:
            shards = shards_raw.persist()
            if eager:
                import threading

                shards_err: list = []

                def _materialize_shards():
                    try:
                        shards.count()
                    except BaseException as ex:  # re-raised at join()
                        shards_err.append(ex)

                shards_thread = threading.Thread(target=_materialize_shards)
                shards_thread.start()
        else:
            # manifest: write the shards artifact CONCURRENTLY with the
            # encode stage (independent DAG branch, same overlap as the
            # eager in-memory path); the mark gates on the root doc_terms
            # artifact like every docID-dependent artifact
            import threading

            shards_err = []

            def _write_shards():
                try:
                    manifest.write_df("shards", shards_raw,
                                      pre_mark=_mark_gate)
                except BaseException as ex:  # re-raised at join()
                    shards_err.append(ex)

            shards_thread = threading.Thread(target=_write_shards)
            shards_thread.start()

    # ---- stage: encoded postings (bucketed for per-partition resume).
    # Unfinished buckets run as CONCURRENT Spark jobs from driver threads:
    # each bucket's real work is a fraction of a second of cluster time, so
    # serial execution is dominated by per-job scheduling overhead —
    # concurrent jobs share the task slots and overlap that overhead
    # (the manifest serializes its own updates; a crash still resumes at
    # the per-bucket granularity).
    def _run_buckets(build_one) -> None:
        import concurrent.futures as futures

        todo = [b for b in range(n_buckets)
                if not manifest.done(f"postings/bucket={b}")]
        if not todo:
            return
        with futures.ThreadPoolExecutor(max_workers=len(todo)) as pool:
            for _ in pool.map(build_one, todo):  # re-raises worker errors
                pass

    if manifest and not lexicon_last:
        if _join_writes is not None:
            _join_writes()  # lexicon-first flow: serialize after the root writes
        tf_bucketed = tf_full.withColumn(
            "_bucket", F.pmod(F.xxhash64("term_id"), F.lit(n_buckets)))

        def _build_bucket_tid(b: int) -> None:
            enc = encode_postings(
                tf_bucketed.filter(F.col("_bucket") == b).drop("_bucket"),
                cfg, stats)
            manifest.write_df(f"postings/bucket={b}", enc)

        _run_buckets(_build_bucket_tid)
        bucket_paths = [manifest.artifact_path(f"postings/bucket={b}")
                        for b in range(n_buckets)]
        for p in bucket_paths:
            spark.catalog.refreshByPath(p)
        postings = spark.read.parquet(*bucket_paths)
        _phase("encode_postings")
    elif manifest and lexicon_last:
        # lexicon-last RESUMABLE flow: string-keyed encode in n_buckets
        # independent jobs keyed on doc shards (bucket b = shards with
        # shard_id % n_buckets == b) — each bucket writes its own artifact
        # and a killed build resumes at the first unfinished bucket. Doc
        # shards are the stable resume key the term_id bucketing could not
        # provide here (term_ids do not exist until the lexicon is derived
        # from these very rows).
        from pisa_spark.operators.postings import (encode_postings_docwise_str,
                                                   encode_postings_str)

        docwise = (cfg.shard_span * max(stats["avg_len"], 1.0)
                   <= cfg.docwise_max_tokens)
        shard_of = (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long")

        def _encode_str(src_docs, stride: int = 1):
            if docwise:
                return encode_postings_docwise_str(
                    src_docs, cfg, stats, shard_stride=stride)
            flat = src_docs.select(
                "doc_id", "doc_len",
                F.explode(F.arrays_zip("terms", "tfs")).alias("z")
            ).select("doc_id", "doc_len",
                     F.col("z.terms").alias("term"),
                     F.col("z.tfs").cast("long").alias("tf"))
            return encode_postings_str(flat, cfg, stats)

        # Resume granularity adapts to the work size (a pure function of
        # the manifest-recorded corpus stats, so resumes always agree with
        # the original run's choice): below bucket_min_tokens per bucket,
        # per-bucket jobs cost more in scheduling + extra scans than a
        # resume could ever save — the encode runs as ONE job (a killed
        # small build re-encodes in seconds) overlapped with the root
        # artifact writes. Above the bound, n_buckets independent jobs each
        # partition-prune the doc_terms artifact to their own bucket (the
        # corpus is still read only once across all jobs) and a killed
        # build resumes at the first unfinished bucket.
        single_job = (stats["collection_len"] / max(1, n_buckets)
                      < bucket_min_tokens)
        if single_job:
            if not manifest.done("postings"):
                manifest.write_df("postings", _encode_str(doc_terms),
                                  pre_mark=_mark_gate)
            if _join_writes is not None:
                _join_writes()
            enc_str = manifest.read_df(spark, "postings")
        else:
            if _mark_gate is not None:
                # wait for the root doc_terms artifact, then source every
                # bucket job from its partition-pruned scan
                _mark_gate()
                doc_terms = manifest.read_df(spark, "doc_terms")

            def _build_bucket_str(b: int) -> None:
                if "_bucket" in doc_terms.columns:
                    part_docs = doc_terms.filter(F.col("_bucket") == b)
                else:
                    part_docs = doc_terms.filter(
                        F.pmod(shard_of, F.lit(n_buckets)) == b)
                manifest.write_df(f"postings/bucket={b}",
                                  _encode_str(part_docs, stride=n_buckets),
                                  pre_mark=_mark_gate)

            _run_buckets(_build_bucket_str)
            if _join_writes is not None:
                _join_writes()
            bucket_paths = [manifest.artifact_path(f"postings/bucket={b}")
                            for b in range(n_buckets)]
            for p in bucket_paths:
                spark.catalog.refreshByPath(p)
            enc_str = spark.read.parquet(*bucket_paths)
        enc_str_handle = enc_str
        _phase("encode_postings")
        # ---- stage: lexicon from the ENCODED rows, then term_ids joined
        # back onto the parquet-backed string-keyed rows (the postings
        # artifact keeps TERM STRINGS so a bucket never has to be rewritten
        # when the vocabulary changes resume-to-resume — load_index
        # re-joins ids the same way). Vocabulary probe and WAND term stats
        # are ONE fused aggregation scan; for broadcastable vocabularies
        # the whole lexicon is then assembled driver-side (Arrow).
        if manifest.done("lexicon"):
            lexicon = manifest.read_df(spark, "lexicon")
        else:
            aggd = _term_agg_of(enc_str).persist(
                StorageLevel.MEMORY_AND_DISK_DESER)
            n_vocab = aggd.count()
            if n_vocab <= cfg.lexicon_driver_max:
                lex_full = _lexicon_from_term_agg(
                    spark, aggd.toPandas(), scorer, cfg, stats)
            elif n_vocab <= cfg.lexicon_broadcast_max:
                # broadcast-size vocabulary: driver id-assignment over a
                # slim term-only transfer (see _lexicon_driver_ids)
                lex_full = _lexicon_driver_ids(spark, aggd, scorer, cfg,
                                               stats)
            else:
                # web-scale vocabulary: distributed dense-id
                # assignment over the cached term-agg rows (driver
                # round-trip cost is linear in vocab size and serial)
                term_cuts = _sample_cuts(aggd, "term", parts * 4)
                lex_ids, _lex_cache, _ = assign_rank_ids(
                    aggd, "term", "term_id", term_cuts, parts)
                lex_full = _with_max_score(lex_ids, scorer, cfg,
                                           stats).select(
                    "term", "term_id", "df", "cf", "max_part", "max_score")
            manifest.write_df("lexicon", lex_full)
            aggd.unpersist()
            lexicon = manifest.read_df(spark, "lexicon")
        postings = join_term_ids(enc_str, lexicon,
                                 cfg.lexicon_broadcast_max)
        _phase("lexicon_base")
    elif lexicon_last:
        from pisa_spark.operators.postings import (encode_postings_docwise_str,
                                                   encode_postings_str)

        if cfg.shard_span * max(stats["avg_len"], 1.0) <= cfg.docwise_max_tokens:
            # doc-wise on the in-memory lineage: bucket_starts (from the
            # rank-assignment meta) makes this encode SHUFFLE-FREE — the
            # rank shuffle's bucket partitioning is reused, and only
            # bucket-boundary-straddling shards take the shuffled path
            enc_str = encode_postings_docwise_str(
                doc_terms, cfg, stats, bucket_starts=bucket_starts)
            colocated = True
        else:
            # shard token mass exceeds the docwise working-set bound:
            # exploded (shard, term)-shuffled encode, groups bounded by
            # shard_span postings regardless of document length
            flat = doc_terms.select(
                "doc_id", "doc_len",
                F.explode(F.arrays_zip("terms", "tfs")).alias("z")
            ).select("doc_id", "doc_len",
                     F.col("z.terms").alias("term"),
                     F.col("z.tfs").cast("long").alias("tf"))
            enc_str = encode_postings_str(flat, cfg, stats)
        enc_str = enc_str.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        enc_str_handle = enc_str
        # ---- stage: lexicon from the ENCODED rows (sorted distinct terms
        # -> dense term_ids, fwd.terms semantics) + term_id join-back.
        # The per-term aggregation is ONE fused job that (a) materializes
        # the encode cache (cache-on-first-scan), (b) decides small-vs-
        # web-scale vocabulary, (c) fetches the vocabulary AND its WAND
        # term stats when small — the lexicon is then assembled driver-side
        # (Arrow), removing the separate lexicon_meta scan over the cache.
        # the vocabulary probe is ONE fused job (materializes the encode
        # cache AND the per-term agg cache, returns only a count — no
        # driver data transfer at any vocabulary size)
        aggd = _term_agg_of(enc_str).persist(StorageLevel.MEMORY_AND_DISK_DESER)
        if os.environ.get("PISA_PROFILE_ENCODE"):
            # diagnostic split of the fused job (scaling-ladder forensics):
            # materialize the cache alone, then agg the cached rows alone
            bd = stats.setdefault("encode_breakdown", {})
            _t = time.time()
            bd["enc_rows"] = enc_str.count()
            bd["materialize_s"] = round(time.time() - _t, 3)
            bd["enc_parts"] = enc_str.rdd.getNumPartitions()
            _t = time.time()
            n_vocab = aggd.count()
            bd["term_agg_s"] = round(time.time() - _t, 3)
        else:
            n_vocab = aggd.count()
        _phase("encode_postings")
        _t_lex = time.time()
        if n_vocab <= cfg.lexicon_driver_max:
            # small vocabulary: the driver round-trip (collect + pandas
            # assemble + ship back) is the fastest path. persist +
            # materialize: left as a LocalRelation, every downstream job
            # re-materializes the local rows into its plan — measured
            # ~1-2 s per 200-query batch at 300k docs
            agg_pdf = aggd.toPandas()
            aggd.unpersist()
            lexicon = _lexicon_from_term_agg(spark, agg_pdf, scorer,
                                             cfg, stats).persist()
            lexicon.count()
        elif n_vocab <= cfg.lexicon_broadcast_max:
            # broadcast-size vocabulary: driver id-assignment over a slim
            # term-only Arrow transfer, stats joined distributed (see
            # _lexicon_driver_ids) — one job + the count below, replacing
            # the range-sample job and the rank shuffle whose ~3 s fixed
            # small-job cost billed identically at every cluster size.
            lexicon = _lexicon_driver_ids(spark, aggd, scorer, cfg,
                                          stats).persist()
            lexicon.count()
            aggd.unpersist()
        else:
            # web-scale vocabulary: distributed dense-id assignment
            # over the cached term-agg rows. The driver path's cost is
            # linear in vocabulary size and SERIAL (measured 4 s of a
            # 31 s 8-core build at 596k terms — a fixed tax every cluster
            # size pays equally); this one is a parallel ~1 s floor.
            term_cuts = _sample_cuts(aggd, "term", parts * 4)
            lex_ids, _lex_cache, _ = assign_rank_ids(
                aggd, "term", "term_id", term_cuts, parts)
            lexicon = _with_max_score(lex_ids, scorer, cfg, stats).select(
                "term", "term_id", "df", "cf", "max_part",
                "max_score").persist()
            lexicon.count()
            _lex_cache.unpersist()
            aggd.unpersist()
        if os.environ.get("PISA_PROFILE_ENCODE"):
            stats.setdefault("lexicon_breakdown", {})[
                "lexicon_s"] = round(time.time() - _t_lex, 3)
        lexicon_base = lexicon.select("term", "term_id")
        if n_vocab <= cfg.lexicon_broadcast_max:
            postings = (enc_str.join(F.broadcast(lexicon_base), "term")
                        .drop("term"))
        else:
            # non-broadcast vocabulary: the id join is a sort-merge SHUFFLE
            # of the whole index — unlike the broadcast case, every
            # downstream action would re-pay it, so persist the join result
            # (the one extra cache copy is cheaper than re-shuffling the
            # index per query batch)
            postings = (enc_str.join(lexicon_base, "term").drop("term")
                        .persist(StorageLevel.MEMORY_AND_DISK_DESER))
        from pisa_spark.operators.postings import _ENCODED_COLUMNS

        # broadcast-vocabulary case: postings stays a LAZY broadcast-join
        # view over the cached encoded rows — materializing it into a
        # second cache would re-copy the whole index through memory
        # (measured 3-15 s per build, pure bandwidth) for a join that costs
        # microseconds per probe at query time. enc_str (already
        # materialized by the vocab probe) is the single backing cache.
        postings = postings.select(*_ENCODED_COLUMNS)
        _phase("lexicon_base")
    elif vocab_map is not None and plain_scoring:
        # broadcastable vocabulary: doc-wise encode skips the exploded
        # (term, doc, tf) shuffle entirely (operators/postings.py)
        postings = encode_postings_docwise(
            doc_terms, vocab_map, cfg, stats).persist()
        colocated = True
        if eager:
            postings.count()
        _phase("encode_postings")
    else:
        postings = encode_postings(tf_full, cfg, stats).persist()
        if eager:
            postings.count()
        _phase("encode_postings")

    # ---- stage: per-shard doc length arrays — defined above; join the
    # concurrent materialization (or write through the manifest)
    if shards is None:  # manifest build path: join the concurrent write
        shards_thread.join()
        if shards_err:
            raise shards_err[0]
        shards = manifest.read_df(spark, "shards")
    elif shards_thread is not None:
        shards_thread.join()
        if shards_err:
            raise shards_err[0]
    _phase("shards")

    # ---- stage: lexicon with term stats + max scores (WAND term metadata),
    # aggregated from the encoded rows (one per shard x term) — ~100x fewer
    # rows than the flat postings the reference streams twice
    # (wand_data.hpp:64-115). The fused lexicon-last paths above already
    # built it in the same scan as the vocabulary probe (lexicon set).
    if lexicon is not None:
        pass
    elif manifest and manifest.done("lexicon"):
        lexicon = manifest.read_df(spark, "lexicon")
    else:
        term_meta = postings.groupBy("term_id").agg(
            F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"),
            F.max(F.array_max("block_max_part")).alias("max_part"))
        if true_term_stats is not None:
            # quantized path: sum_tf aggregates quantized scores, not term
            # collection frequency — carry the pre-quantization df/cf
            # (reference wand_data term stats semantics)
            term_meta = (term_meta.drop("df", "cf")
                         .join(true_term_stats, "term_id"))
        lex = _with_max_score(lexicon_base.join(term_meta, "term_id"),
                              scorer, cfg, stats)
        if manifest:
            manifest.write_df("lexicon", lex)
            lexicon = manifest.read_df(spark, "lexicon")
        else:
            lexicon = lex.persist()
            if eager:
                lexicon.count()
    _phase("lexicon_meta")
    stats["phase_seconds"] = phases
    stats["build_seconds"] = round(time.time() - t_start, 3)

    if manifest:
        manifest.record_metric("build_seconds", round(time.time() - t_start, 3))
        manifest.record_metric("num_docs", stats["num_docs"])
        # the artifacts are only readable with the config that wrote them
        # (codec, block layout, analyzer chain) — persist it so load_index
        # restores it without the caller re-stating build flags
        manifest.record_metric("index_config", cfg.to_json_dict())

    # ---- release the forward index (eager in-memory builds): every
    # downstream artifact (encoded postings, lexicon, shards) now lives in
    # its own materialized cache, but `docs` is still a lazy projection
    # over the tokenize cache — whose full (terms, tfs) arrays are ~20x
    # the slim docmap and would otherwise stay resident in executor
    # storage for the index's whole serving life (measured 1.9 GB vs the
    # 2.9 GB total at 1.2M docs). Re-persist the slim projection, then
    # drop the fat cache. A query service keeps the inverted index hot,
    # not the forward index (the reference serves from the inv/wand mmaps
    # alone; fwd is a build-time artifact).
    if eager and manifest is None and _tok_cache is not None:
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        docs.count()
        _tok_cache.unpersist()

    return InvertedIndex(docs=docs, lexicon=lexicon, postings=postings,
                         shards=shards, stats=stats, cfg=cfg,
                         postings_colocated=colocated,
                         postings_str=enc_str_handle)


def load_index(spark, out_dir: str,
               cfg: IndexConfig | None = None) -> InvertedIndex:
    """Load a persisted index. cfg=None restores the config the index was
    BUILT with from the manifest (codec/block layout/analyzer chain are
    baked into the artifacts); pass a cfg only to override deliberately."""
    manifest = BuildManifest(out_dir)
    if cfg is None:
        saved = manifest.state.get("metrics", {}).get("index_config")
        cfg = (IndexConfig.from_json_dict(saved) if saved
               else DEFAULT_CONFIG)
    # postings/bucket=N subdirs surface as a partition column; drop it
    postings = spark.read.parquet(manifest.artifact_path("postings"))
    if "bucket" in postings.columns:
        postings = postings.drop("bucket")
    lexicon = manifest.read_df(spark, "lexicon")
    enc_str_handle = None
    if "term" in postings.columns:
        # lexicon-last artifacts keep term STRINGS: re-attach dense ids
        # from the lexicon the same way the build did
        enc_str_handle = postings
        postings = join_term_ids(postings, lexicon,
                                 cfg.lexicon_broadcast_max)
    return InvertedIndex(
        docs=manifest.read_df(spark, "docs"),
        lexicon=lexicon,
        postings=postings,
        shards=manifest.read_df(spark, "shards"),
        stats=manifest.state["stats"],
        cfg=cfg,
        postings_str=enc_str_handle,
    )
