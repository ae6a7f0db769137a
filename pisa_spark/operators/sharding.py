"""Collection sharding + shard selection (reference SURVEY §2.7).

- partition_collection: the `partition_fwd_index` analogue
  (reference src/sharding.cpp:26-120, tools/partition_fwd_index.cpp):
  assign every document a shard either randomly (seeded, stable) or from an
  explicit (url -> shard) mapping table. In Spark the shard column IS the
  physical partitioning (write.partitionBy / repartition), so "splitting
  the forward index into files" becomes one column + one write.
- taily_shard_stats / taily_select: per-shard per-term score moments and
  the expected-score shard ranking they support (reference
  include/pisa/taily_stats.hpp:19-60, tools/taily_stats.cpp) — resource
  selection for selective search over many index shards.
"""

from __future__ import annotations


def partition_collection(docs_df, n_shards: int, method: str = "random",
                         seed: int = 1902741, mapping=None,
                         url_col: str = "url"):
    """Append a `shard` column.

    method="random": stable seeded assignment by url hash (the reference's
    random sharding shuffles titles with a fixed-seed RNG — same contract:
    deterministic given the seed, uniform in expectation).
    method="mapping": join an explicit (url, shard) table (the reference's
    shard title files).
    """
    from pyspark.sql import functions as F

    if method == "random":
        return docs_df.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col(url_col), F.lit(seed)),
                   F.lit(n_shards)).cast("int"))
    if method == "mapping":
        if mapping is None:
            raise ValueError("mapping DataFrame required")
        return docs_df.join(mapping, url_col)
    raise ValueError(f"unknown method {method!r}")


def write_sharded(docs_df, path: str, n_shards: int, **kw) -> None:
    """Materialize the sharded collection as one directory per shard
    (basename.000, .001, ... in the reference; partition dirs here)."""
    sharded = partition_collection(docs_df, n_shards, **kw)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)


def taily_shard_stats(index):
    """Per (shard_id, term_id): posting count + score expectation/variance
    (taily_stats.hpp feature set, at shard granularity)."""
    from pyspark.sql import functions as F

    from pisa_spark.tools import scored_postings

    sp = scored_postings(index).withColumn(
        "shard_id",
        (F.col("doc_id") / F.lit(index.cfg.shard_span)).cast("long"))
    return sp.groupBy("shard_id", "term_id").agg(
        F.count("*").cast("long").alias("any"),
        F.avg("score").alias("expected_value"),
        F.var_pop("score").alias("variance"))


def taily_select(index, queries: list[str], n_shards_out: int = 2,
                 shard_stats=None):
    """Rank shards per query by expected aggregate score mass
    Σ_t any_t,s · E[score_t,s] — the first-moment core of Taily's
    resource-selection estimate (the full method fits gamma tails; this
    keeps the DataFrame shape and the moments needed to extend to it).

    Returns (qid, shard_id, mass, rank) with rank <= n_shards_out."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pisa_spark.operators.topk import make_query_terms_df

    stats = shard_stats if shard_stats is not None else taily_shard_stats(index)
    spark = index.lexicon.sparkSession
    qt = (make_query_terms_df(spark, queries, index.cfg)
          .join(index.lexicon.select("term", "term_id"), "term")
          .select("qid", "term_id").distinct())
    mass = (qt.join(stats, "term_id")
            .groupBy("qid", "shard_id")
            .agg(F.sum(F.col("any") * F.col("expected_value")).alias("mass")))
    w = W.partitionBy("qid").orderBy(F.desc("mass"), F.asc("shard_id"))
    return (mass.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_shards_out))
