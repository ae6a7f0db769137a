"""Incremental (micro-batch) index ingestion via Structured Streaming.

The reference is batch-only (SURVEY §2.10) — its closest feature is the
resumable `parse_collection merge` over batch files. This module goes one
step further in the Spark-native direction: `readStream` over a growing
web-pages source, with each micro-batch running the SAME build stages
(tokenize -> docIDs -> encode) through foreachBatch and appending a
SEGMENT to the on-disk index:

- docID space: each segment gets a fresh base aligned UP to the shard span,
  so a shard never spans segments, doc_lens arrays stay per-shard dense,
  and (shard, term) runs from different segments are disjoint doc ranges —
  exactly the multi-run layout the query kernels already merge.
- lexicon: new terms append with the next free term_ids (stable ids across
  segments; global df/cf re-aggregate from the encoded rows at load).
- score safety under drifting collection stats: BM25's stored block-max
  parts were computed with the segment's avg_len. For a query-time
  avg_len', part(avg')/part(avg) <= max(1, avg'/avg) (cross-multiplying
  f/(f + c + d/avg) shows the ratio is bounded by avg'/avg), so load-time
  bounds are multiplied by that factor per segment — bounds stay upper
  bounds, kernels re-score candidates exactly, rank identity holds.
"""

from __future__ import annotations

import json
import os

from pisa_spark.config import DEFAULT_CONFIG, IndexConfig


def _seg_meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "segments.json")


def _load_segments(out_dir: str) -> dict:
    p = _seg_meta_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"segments": [], "next_base": 0, "next_term_id": 0}


def _save_segments(out_dir: str, state: dict) -> None:
    tmp = _seg_meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, _seg_meta_path(out_dir))


def ingest_batch(batch_df, out_dir: str, cfg: IndexConfig = DEFAULT_CONFIG,
                 html_col: str | None = "html") -> dict:
    """Append one micro-batch of pages as a new index segment. Returns the
    segment record. Driven by foreachBatch (or called directly for tests /
    backfills)."""
    from pyspark.sql import functions as F

    from pisa_spark.operators.postings import encode_postings_docwise
    from pisa_spark.plans.build import (_sample_cuts, assign_rank_ids,
                                        doc_term_counts)

    spark = batch_df.sparkSession
    state = _load_segments(out_dir)
    seg_id = len(state["segments"])
    base = state["next_base"]
    parts = max(spark.sparkContext.defaultParallelism // 2, 2)

    src = batch_df.select(F.col("url"),
                          F.col(html_col) if html_col else F.col("text"))
    cuts = _sample_cuts(batch_df.select("url"), "url", parts)
    tokenized = doc_term_counts(src, cfg, html_col=html_col)
    with_ids, cache, meta = assign_rank_ids(
        tokenized, "url", "doc_id", cuts, parts,
        extra_aggs=[F.sum("doc_len").alias("_dl")])
    n_docs = sum(int(r["_n"]) for r in meta)
    dlen = sum(int(r["_dl"] or 0) for r in meta)
    if n_docs == 0:
        cache.unpersist()
        return {}
    doc_terms = with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(base))

    # lexicon delta: stable ids, new terms appended sorted
    known = {}
    lex_path = os.path.join(out_dir, "lexicon_terms")
    if state["segments"]:
        for r in spark.read.parquet(lex_path).collect():
            known[r["term"]] = r["term_id"]
    batch_terms = sorted(
        r[0] for r in
        doc_terms.select(F.explode("terms").alias("t")).distinct().collect())
    new_terms = [t for t in batch_terms if t not in known]
    nxt = state["next_term_id"]
    for t in new_terms:
        known[t] = nxt
        nxt += 1
    if new_terms:
        spark.createDataFrame(
            [(t, known[t]) for t in new_terms], "term string, term_id long"
        ).write.mode("append").parquet(lex_path)

    seg_avg = dlen / n_docs if n_docs else 1.0
    stats = {"num_docs": n_docs, "collection_len": dlen,
             "avg_len": float(seg_avg)}
    enc = encode_postings_docwise(doc_terms, known, cfg, stats,
                                  num_partitions=parts)
    enc.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"postings/segment={seg_id}"))
    (doc_terms.select("doc_id", "url", "doc_len")
     .write.mode("overwrite")
     .parquet(os.path.join(out_dir, f"docs/segment={seg_id}")))
    cache.unpersist()

    span = cfg.shard_span
    seg = {"segment": seg_id, "base": base, "n_docs": n_docs,
           "collection_len": dlen, "avg_len": seg_avg}
    state["segments"].append(seg)
    state["next_base"] = base + ((n_docs + span - 1) // span) * span
    state["next_term_id"] = nxt
    _save_segments(out_dir, state)
    return seg


def stream_index(pages_stream_df, out_dir: str,
                 cfg: IndexConfig = DEFAULT_CONFIG,
                 html_col: str | None = "html",
                 checkpoint_dir: str | None = None, trigger: dict | None = None):
    """Start the streaming ingestion: every micro-batch appends a segment.
    `trigger` defaults to availableNow (drain-and-stop; pass e.g.
    {"processingTime": "30 seconds"} for continuous ingestion)."""
    os.makedirs(out_dir, exist_ok=True)

    def handle(batch_df, batch_id: int) -> None:
        ingest_batch(batch_df, out_dir, cfg, html_col=html_col)

    writer = (pages_stream_df.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation",
                      checkpoint_dir or os.path.join(out_dir, "_checkpoint")))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def load_stream_index(spark, out_dir: str,
                      cfg: IndexConfig = DEFAULT_CONFIG):
    """Assemble an InvertedIndex over all ingested segments, with per-segment
    block-bound rescaling to the CURRENT collection avg_len (see module
    docstring for the safety argument)."""
    from pyspark.sql import functions as F

    from pisa_spark.functions.scoring import make_scorer
    from pisa_spark.plans.build import InvertedIndex, _f32

    state = _load_segments(out_dir)
    if not state["segments"]:
        raise ValueError(f"no segments ingested under {out_dir}")
    num_docs = sum(s["n_docs"] for s in state["segments"])
    collection_len = sum(s["collection_len"] for s in state["segments"])
    stats = {"num_docs": num_docs, "collection_len": collection_len,
             "avg_len": _f32(collection_len / num_docs)}

    post_parts = []
    for s in state["segments"]:
        p = spark.read.parquet(
            os.path.join(out_dir, f"postings/segment={s['segment']}"))
        scale = max(1.0, float(stats["avg_len"]) / float(s["avg_len"]))
        if scale > 1.0:
            p = p.withColumn(
                "block_max_part",
                F.transform("block_max_part",
                            lambda x: (x * F.lit(scale)).cast("float")))
        post_parts.append(p)
    postings = post_parts[0]
    for p in post_parts[1:]:
        postings = postings.unionByName(p)
    postings = postings.persist()

    docs = spark.read.option("basePath", os.path.join(out_dir, "docs")) \
        .parquet(os.path.join(out_dir, "docs")).drop("segment") \
        .withColumn("shard_id",
                    (F.col("doc_id") / F.lit(cfg.shard_span)).cast("long"))
    shards = (docs.groupBy("shard_id")
              .agg(F.array_sort(
                  F.collect_list(F.struct("doc_id", "doc_len"))).alias("dl"))
              .select("shard_id",
                      (F.col("shard_id") * cfg.shard_span).alias("base_doc"),
                      F.transform("dl", lambda x: x["doc_len"])
                      .alias("doc_lens"))).persist()

    lexicon_base = spark.read.parquet(os.path.join(out_dir, "lexicon_terms"))
    term_meta = postings.groupBy("term_id").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"),
        F.max(F.array_max("block_max_part")).alias("max_part"))
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    lex = lexicon_base.join(term_meta, "term_id")
    if scorer.separable and cfg.scorer == "bm25":
        idf = F.greatest(
            F.lit(1e-6),
            F.log((F.lit(float(num_docs)) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5))) * F.lit(1.0 + cfg.bm25_k1)
        lex = lex.withColumn("max_score",
                             (idf * F.col("max_part")).cast("float"))
    else:
        lex = lex.withColumn("max_score", F.col("max_part").cast("float"))
    return InvertedIndex(docs=docs, lexicon=lex.persist(), postings=postings,
                         shards=shards, stats=stats, cfg=cfg)
