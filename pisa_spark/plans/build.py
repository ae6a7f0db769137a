"""Index build pipeline: web pages -> inverted index tables.

Spark-first re-expression of the reference pipeline
parse_collection -> invert -> create_wand_data -> compress_inverted_index
(docs/src/guide/indexing-pipeline.md):

1. extract text from html (Arrow UDF; byte-identical invariant),
2. dense docIDs by URL sort (doubles as the reorder-by-URL compression win,
   docs/src/guide/reordering.md:46-66) — scalable range-partitioned
   rank assignment, never a single-partition global window,
3. tokenize + per-doc term counts inside one mapInPandas pass (the forward
   index stays transient, as term strings, until the lexicon join —
   reference builds batch-local dicts, src/forward_index_builder.cpp:209-273),
4. lexicon = distinct terms, dense term_ids (sorted, like fwd.terms),
5. postings = encode_postings (doc-sharded, block-encoded, block-max'd),
6. doc/term/collection stats (the WAND data of wand_data.hpp:36-115).

All stages optionally checkpoint through a BuildManifest for resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pisa_spark.config import DEFAULT_CONFIG, IndexConfig
from pisa_spark.functions.scoring import make_scorer
from pisa_spark.functions.text import extract_text_batch
from pisa_spark.functions.tokenize import make_analyzer
from pisa_spark.operators.postings import encode_postings
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


TOKENS_SCHEMA = ("doc_id long, url string, doc_len int, "
                 "terms array<string>, tfs array<int>")


def doc_term_counts(docs_with_ids, cfg: IndexConfig,
                    html_col: str | None = None):
    """(doc_id, url, text|html) -> one row per doc with distinct terms and
    their counts as compact arrays — the per-batch forward index +
    run-length count of reference src/invert.cpp:43-69 fused (optionally
    with HTML extraction) into a single Arrow pass. One row per doc keeps
    the Python->Arrow boundary cheap; the (term, tf) explode happens
    JVM-side afterwards."""
    from collections import Counter

    analyze = make_analyzer(cfg)
    use_html = html_col is not None
    src_col = html_col if use_html else "text"

    def run(batches):
        from pisa_spark.functions.text import strip_html, strip_http_headers

        for pdf in batches:
            rows = []
            for doc_id, url, payload in zip(pdf["doc_id"], pdf["url"],
                                            pdf[src_col]):
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
                rows.append((doc_id, url, len(toks),
                             list(counts.keys()),
                             np.fromiter(counts.values(), dtype=np.int32,
                                         count=len(counts))))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "url", "doc_len", "terms", "tfs"])

    cols = ["doc_id", "url", src_col]
    return docs_with_ids.select(*cols).mapInPandas(run, TOKENS_SCHEMA)


def _f32(x: float) -> float:
    return float(np.float32(x))


def build_index(docs_df, cfg: IndexConfig = DEFAULT_CONFIG,
                out_dir: str | None = None, n_buckets: int = 8,
                url_col: str = "url", text_col: str = "text",
                html_col: str | None = None) -> InvertedIndex:
    """Build the full index from a (url, text) or (url, html) DataFrame.

    With html_col set, extraction is fused into the tokenize pass (one
    Python/Arrow boundary for the whole scalar layer). With out_dir set,
    every stage checkpoints through a BuildManifest and a rerun resumes,
    skipping completed artifacts/buckets.
    """
    from pyspark.sql import functions as F

    spark = docs_df.sparkSession
    manifest = BuildManifest(out_dir) if out_dir else None
    t_start = time.time()

    payload = html_col if html_col else text_col
    src = docs_df.select(F.col(url_col).alias("url"),
                         F.col(payload).alias(payload if html_col else "text"))

    # ---- stage: docs (dense URL-ordered docIDs) + fused extract/tokenize.
    # dense_ids range-partitions on the slim url key (the payload column is
    # carried through the one shuffle but never evaluated by a UDF before
    # it, so the range-sampling pass stays cheap).
    if manifest and manifest.done("docs") and manifest.done("doc_terms"):
        docs = manifest.read_df(spark, "docs")
        doc_terms = manifest.read_df(spark, "doc_terms")
        cached = None
    else:
        with_ids, cached = dense_ids(src, "url", "doc_id")
        doc_terms_raw = doc_term_counts(with_ids, cfg, html_col=html_col)
        if manifest:
            manifest.write_df("doc_terms", doc_terms_raw)
            doc_terms = manifest.read_df(spark, "doc_terms")
        else:
            doc_terms = doc_terms_raw.persist()
        docs_raw = doc_terms.select(
            "doc_id", "url", "doc_len",
            (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long")
            .alias("shard_id"))
        if manifest:
            manifest.write_df("docs", docs_raw)
            docs = manifest.read_df(spark, "docs")
        else:
            docs = docs_raw

    # ---- stage: collection stats (wand_data.hpp:52-60 semantics)
    if manifest and manifest.state["stats"]:
        stats = manifest.state["stats"]
    else:
        agg = docs.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("total")).collect()[0]
        num_docs = int(agg["n"])
        collection_len = int(agg["total"] or 0)
        stats = {
            "num_docs": num_docs,
            "collection_len": collection_len,
            # reference: m_avg_len = float(collection_len / double(num_docs))
            "avg_len": _f32(collection_len / num_docs) if num_docs else 0.0,
        }
        if manifest:
            manifest.set_stats(stats)

    # flat forward index: (doc_id, doc_len, term, tf) — JVM-side explode of
    # the compact per-doc arrays (map_to_postings, reference invert.cpp:43-53)
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
        lex_with_ids, lex_cache = dense_ids(terms_distinct, "term", "term_id")
        if manifest:
            manifest.write_df("lexicon_base", lex_with_ids)
            lexicon_base = manifest.read_df(spark, "lexicon_base")
        else:
            lexicon_base = lex_with_ids.persist()

    # ---- stage: tf table (term remap, reference :176-194)
    tf_full = (
        flat_terms
        .join(lexicon_base, "term")
        .select("term_id", "doc_id", "tf", "doc_len")
    )
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    term_stats = (
        tf_full.groupBy("term_id")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )
    if not scorer.separable:
        tf_full = tf_full.join(term_stats, "term_id")

    # ---- stage: encoded postings (bucketed for per-partition resume)
    if manifest:
        tf_bucketed = tf_full.withColumn(
            "_bucket", F.pmod(F.xxhash64("term_id"), F.lit(n_buckets)))
        for b in range(n_buckets):
            name = f"postings/bucket={b}"
            if manifest.done(name):
                continue
            enc = encode_postings(
                tf_bucketed.filter(F.col("_bucket") == b).drop("_bucket"),
                cfg, stats)
            manifest.write_df(name, enc)
        bucket_paths = [manifest.artifact_path(f"postings/bucket={b}")
                        for b in range(n_buckets)]
        for p in bucket_paths:
            spark.catalog.refreshByPath(p)
        postings = spark.read.parquet(*bucket_paths)
    else:
        postings = encode_postings(tf_full, cfg, stats).persist()

    # ---- stage: per-shard doc length arrays (wand_data doc_lens)
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
        if manifest:
            manifest.write_df("shards", shards_raw)
            shards = manifest.read_df(spark, "shards")
        else:
            shards = shards_raw.persist()

    # ---- stage: lexicon with term stats + max scores (WAND term metadata)
    if manifest and manifest.done("lexicon"):
        lexicon = manifest.read_df(spark, "lexicon")
    else:
        max_part = (
            postings.groupBy("term_id")
            .agg(F.max(F.array_max("block_max_part")).alias("max_part"))
        )
        lex = (
            lexicon_base.join(term_stats, "term_id").join(max_part, "term_id")
        )
        if scorer.separable:
            k1, b_ = cfg.bm25_k1, cfg.bm25_b
            n_docs = stats["num_docs"]

            @F.pandas_udf("float")
            def _max_score(df_col: pd.Series, mp: pd.Series) -> pd.Series:
                idf = scorer.idf(df_col.to_numpy(), n_docs)
                return pd.Series(idf * mp.to_numpy(dtype=np.float32))

            lex = lex.withColumn("max_score", _max_score("df", "max_part"))
        else:
            lex = lex.withColumn("max_score", F.col("max_part").cast("float"))
        if manifest:
            manifest.write_df("lexicon", lex)
            lexicon = manifest.read_df(spark, "lexicon")
        else:
            lexicon = lex.persist()

    if manifest:
        manifest.record_metric("build_seconds", round(time.time() - t_start, 3))
        manifest.record_metric("num_docs", stats["num_docs"])

    if cached is not None:
        cached.unpersist()
    return InvertedIndex(docs=docs, lexicon=lexicon, postings=postings,
                         shards=shards, stats=stats, cfg=cfg)


def load_index(spark, out_dir: str, cfg: IndexConfig = DEFAULT_CONFIG) -> InvertedIndex:
    manifest = BuildManifest(out_dir)
    # postings/bucket=N subdirs surface as a partition column; drop it
    postings = spark.read.parquet(manifest.artifact_path("postings"))
    if "bucket" in postings.columns:
        postings = postings.drop("bucket")
    return InvertedIndex(
        docs=manifest.read_df(spark, "docs"),
        lexicon=manifest.read_df(spark, "lexicon"),
        postings=postings,
        shards=manifest.read_df(spark, "shards"),
        stats=manifest.state["stats"],
        cfg=cfg,
    )
