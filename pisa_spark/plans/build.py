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
    """Assign dense 0..N-1 IDs in global `order_col` order, scalably:
    range-partition, rank within partitions, then offset by partition
    counts — no single-partition global window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(parts, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = (
        arranged.groupBy("_pid").count()
        .orderBy("_pid")
        .collect()
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offsets_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long")
    w = W.partitionBy("_pid").orderBy(order_col)
    out = (
        arranged
        .withColumn("_rank", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, F.col("_offset") + F.col("_rank") - 1)
        .drop("_pid", "_rank", "_offset")
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


TOKENS_SCHEMA = "doc_id long, doc_len int, term string, tf int"


def doc_term_counts(docs_with_ids, cfg: IndexConfig):
    """(doc_id, text) -> (doc_id, doc_len, term, tf): tokenize and count
    per-doc in one Arrow pass — the per-batch forward index + run-length
    count of reference src/invert.cpp:43-69 without materializing token
    streams through a shuffle."""
    analyze = make_analyzer(cfg)

    def run(batches):
        for pdf in batches:
            ids, lens, terms, tfs = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = analyze(text) if text else []
                counts: dict[str, int] = {}
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                k = len(counts)
                ids.append(np.full(k, doc_id, dtype=np.int64))
                lens.append(np.full(k, len(toks), dtype=np.int32))
                terms.extend(counts.keys())
                tfs.append(np.fromiter(counts.values(), dtype=np.int32, count=k))
            if not ids:
                continue
            yield pd.DataFrame({
                "doc_id": np.concatenate(ids),
                "doc_len": np.concatenate(lens),
                "term": terms,
                "tf": np.concatenate(tfs),
            })

    return docs_with_ids.select("doc_id", "text").mapInPandas(run, TOKENS_SCHEMA)


def _f32(x: float) -> float:
    return float(np.float32(x))


def build_index(docs_df, cfg: IndexConfig = DEFAULT_CONFIG,
                out_dir: str | None = None, n_buckets: int = 8,
                url_col: str = "url", text_col: str = "text") -> InvertedIndex:
    """Build the full index from a (url, text) DataFrame.

    With out_dir set, every stage checkpoints through a BuildManifest and a
    rerun resumes, skipping completed artifacts/buckets.
    """
    from pyspark.sql import functions as F

    spark = docs_df.sparkSession
    manifest = BuildManifest(out_dir) if out_dir else None
    t_start = time.time()

    src = docs_df.select(F.col(url_col).alias("url"), F.col(text_col).alias("text"))

    # ---- stage: docs (dense URL-ordered docIDs + doc lengths)
    if manifest and manifest.done("docs") and manifest.done("doc_terms"):
        docs = manifest.read_df(spark, "docs")
        doc_terms = manifest.read_df(spark, "doc_terms")
        cached = None
    else:
        with_ids, cached = dense_ids(src, "url", "doc_id")
        doc_terms_raw = doc_term_counts(with_ids, cfg)
        if manifest:
            manifest.write_df("doc_terms", doc_terms_raw)
            doc_terms = manifest.read_df(spark, "doc_terms")
        else:
            doc_terms = doc_terms_raw.persist()
        docs_raw = (
            with_ids.select("doc_id", "url")
            .join(
                doc_terms.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len")),
                "doc_id", "left")
            .fillna({"doc_len": 0})
            .withColumn("shard_id",
                        (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
        )
        if manifest:
            manifest.write_df("docs", docs_raw)
            docs = manifest.read_df(spark, "docs")
        else:
            docs = docs_raw.persist()

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

    # ---- stage: lexicon (sorted distinct terms -> dense term_ids, like
    # fwd.terms; reference src/forward_index_builder.cpp:168-177)
    if manifest and manifest.done("lexicon_base"):
        lexicon_base = manifest.read_df(spark, "lexicon_base")
    else:
        terms_distinct = doc_terms.select("term").distinct()
        lex_with_ids, lex_cache = dense_ids(terms_distinct, "term", "term_id")
        if manifest:
            manifest.write_df("lexicon_base", lex_with_ids)
            lexicon_base = manifest.read_df(spark, "lexicon_base")
        else:
            lexicon_base = lex_with_ids.persist()

    # ---- stage: tf table (term remap, reference :176-194) + doc_len join
    tf_full = (
        doc_terms
        .join(lexicon_base, "term")
        .select("term_id", "doc_id", F.col("tf").cast("long").alias("tf"),
                "doc_len")
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
