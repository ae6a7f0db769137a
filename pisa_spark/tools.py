"""Index/query tooling mirroring the reference CLI utilities.

Reference tools (tools/*.cpp) re-expressed as DataFrame queries over the
index tables:

- count_postings        (tools/count_postings.cpp)
- thresholds            (tools/thresholds.cpp: true k-th score per query)
- kth_threshold         (tools/kth_threshold.cpp: threshold lower bound
                         from the k-th best single-term / pair scores)
- intersection          (tools/compute_intersection.cpp /
                         include/pisa/intersection.hpp: posting count +
                         max score of term subsets)
- selective_queries     (tools/selective_queries.cpp: queries whose OR
                         candidate set is small relative to the corpus)
- sample_inverted_index (tools/sample_inverted_index.cpp)
- taily_stats           (include/pisa/taily_stats.hpp: per-term score
                         expectation/variance for shard selection)
- map_queries / stem_queries (tools/map_queries.cpp, tools/stem_queries.cpp)

All heavy paths stay DataFrame-shaped: decoded postings are produced by the
vectorized decode UDF (operators/postings.py) and scored by the same float32
numpy kernels as the executors, so thresholds produced here are safe seeds
for topk_search(thresholds=...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pisa_spark.config import IndexConfig
from pisa_spark.functions.scoring import make_scorer
from pisa_spark.functions.tokenize import analyze_query_terms, make_analyzer
from pisa_spark.operators.postings import decode_postings
from pisa_spark.operators.topk import make_query_terms_df, topk_search


def _qterms(index, queries):
    spark = index.lexicon.sparkSession
    if isinstance(queries, list):
        qterms = make_query_terms_df(spark, queries, index.cfg)
    else:
        qterms = queries
    return qterms.join(
        index.lexicon.select("term", "term_id", "df", "cf"), "term")


def count_postings(index, queries: list[str]):
    """(qid, n_postings): total postings across the query's terms
    (reference tools/count_postings.cpp)."""
    from pyspark.sql import functions as F

    return (_qterms(index, queries)
            .groupBy("qid")
            .agg(F.sum("df").cast("long").alias("n_postings")))


def scored_postings(index):
    """Flat (term_id, doc_id, tf, score float32) — every posting scored with
    the engine's exact float32 kernel. The doc_len comes from the docs
    table; the scorer's per-term stats from the lexicon."""
    from pyspark.sql import functions as F

    cfg = index.cfg
    scorer = make_scorer(cfg.scorer, cfg.scorer_params())
    stats = dict(index.stats)
    flat = decode_postings(index.postings, cfg)
    joined = (flat
              .join(index.docs.select("doc_id", "doc_len"), "doc_id")
              .join(index.lexicon.select("term_id", "df", "cf"), "term_id"))

    @F.pandas_udf("float")
    def _score(tf: pd.Series, doc_len: pd.Series, df: pd.Series,
               cf: pd.Series) -> pd.Series:
        if scorer.separable:
            idf = scorer.idf(df.to_numpy(), stats["num_docs"])
            part = scorer.doc_part(tf.to_numpy(), doc_len.to_numpy(),
                                   stats["avg_len"])
            return pd.Series(idf.astype(np.float32) * part)
        out = np.empty(len(tf), dtype=np.float32)
        tfa, dla = tf.to_numpy(), doc_len.to_numpy()
        dfa, cfa = df.to_numpy(), cf.to_numpy()
        for i in range(len(tf)):  # per-term stats vary row to row
            out[i] = scorer.score(
                tfa[i:i + 1], dla[i:i + 1], df=dfa[i], cf=cfa[i],
                num_docs=stats["num_docs"], avg_len=stats["avg_len"],
                collection_len=stats["collection_len"])[0]
        return pd.Series(out)

    return joined.select(
        "term_id", "doc_id", "tf",
        _score("tf", "doc_len", "df", "cf").alias("score"))


def thresholds(index, queries: list[str], k: int = 10,
               algorithm: str = "ranked_or"):
    """True k-th score per query (reference tools/thresholds.cpp). Queries
    with fewer than k results get threshold 0."""
    from pyspark.sql import functions as F

    res = topk_search(index, queries, k=k, algorithm=algorithm,
                      with_urls=False)
    return (res.filter(F.col("rank") == k)
            .select("qid", F.col("score").alias("threshold")))


def kth_threshold(index, queries: list[str], k: int = 10):
    """Threshold lower bound from single-term evidence: for each query,
    max over its terms of the k-th best single-posting score (reference
    tools/kth_threshold.cpp single-term estimate). Safe seed for
    topk_search(thresholds=...)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    sp = scored_postings(index)
    w = W.partitionBy("term_id").orderBy(F.desc("score"), F.asc("doc_id"))
    kth_per_term = (sp.withColumn("_r", F.row_number().over(w))
                    .filter(F.col("_r") == k)
                    .select("term_id", F.col("score").alias("kth")))
    return (_qterms(index, queries)
            .join(kth_per_term, "term_id")
            .groupBy("qid")
            .agg(F.max("kth").alias("threshold")))


def intersection(index, queries: list[str], max_terms: int = 2):
    """Posting count + max score of every term PAIR (and singles) per query
    (reference include/pisa/intersection.hpp Intersection::compute,
    tools/compute_intersection.cpp with --combinations)."""
    from pyspark.sql import functions as F

    if max_terms != 2:
        raise NotImplementedError("pairs (and singles) only")
    sp = scored_postings(index)
    qt = _qterms(index, queries).select("qid", "term_id").distinct()
    qsp = qt.join(sp, "term_id").select(
        "qid", "term_id", "doc_id", "score")
    singles = qsp.groupBy("qid", "term_id").agg(
        F.count("*").cast("long").alias("n_postings"),
        F.max("score").alias("max_score"),
    ).select("qid", F.col("term_id").alias("term_a"),
             F.lit(None).cast("long").alias("term_b"),
             "n_postings", "max_score")
    a = qsp.select("qid", F.col("term_id").alias("term_a"),
                   "doc_id", F.col("score").alias("score_a"))
    b = qsp.select("qid", F.col("term_id").alias("term_b"),
                   "doc_id", F.col("score").alias("score_b"))
    pairs = (a.join(b, ["qid", "doc_id"])
             .filter(F.col("term_a") < F.col("term_b"))
             .groupBy("qid", "term_a", "term_b")
             .agg(F.count("*").cast("long").alias("n_postings"),
                  F.max(F.col("score_a") + F.col("score_b"))
                  .alias("max_score")))
    return singles.unionByName(pairs)


def selective_queries(index, queries: list[str], max_ratio: float = 0.01):
    """Queries whose OR-candidate set is under max_ratio of the corpus
    (reference tools/selective_queries.cpp)."""
    from pyspark.sql import functions as F

    from pisa_spark.operators.boolean import or_count

    n = index.stats["num_docs"] or 1
    return (or_count(index, queries)
            .withColumn("selectivity", F.col("n_docs") / F.lit(float(n)))
            .filter(F.col("selectivity") < max_ratio)
            .select("qid", "n_docs", "selectivity"))


def sample_inverted_index(index, fraction: float, seed: int = 13):
    """Posting-list subsample: keeps each (shard, term) row with prob
    `fraction` (reference tools/sample_inverted_index.cpp samples postings;
    rows here are bounded runs, the unit the engine shards by)."""
    return index.postings.sample(False, fraction, seed=seed)


def taily_stats(index):
    """Per-term score expectation/variance + df over the full index
    (reference include/pisa/taily_stats.hpp feature set: any = df,
    expected_value = E[score], variance = Var[score])."""
    from pyspark.sql import functions as F

    sp = scored_postings(index)
    return sp.groupBy("term_id").agg(
        F.count("*").cast("long").alias("any"),
        F.avg("score").alias("expected_value"),
        F.var_pop("score").alias("variance"),
    )


def map_queries(index, queries: list[str]):
    """Query text -> term_ids (reference tools/map_queries.cpp); unknown
    terms dropped like the query parser."""
    from pyspark.sql import functions as F

    return (_qterms(index, queries)
            .groupBy("qid")
            .agg(F.sort_array(F.collect_list("term_id")).alias("term_ids")))


def stem_queries(queries: list[str], cfg: IndexConfig | None = None):
    """Rewrite query lines through the analyzer incl. the Porter2 stemmer
    (reference tools/stem_queries.cpp). Pure driver-side transform."""
    cfg = cfg or IndexConfig(stemmer="porter2")
    analyze = make_analyzer(cfg)
    out = []
    for i, line in enumerate(queries):
        line = line.strip()
        if not line:
            continue
        if ":" in line.split(" ", 1)[0]:
            qid, _, rest = line.partition(":")
        else:
            qid, rest = str(i), line
        out.append(f"{qid}:{' '.join(analyze(rest))}")
    return out
