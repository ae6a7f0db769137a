"""Unranked boolean operators and index-metadata tools.

DataFrame compositions over the decoded posting table — the shapes Catalyst
already executes well (semi-joins, counts), so no custom kernels:

- and_query (reference query/algorithm/and_query.hpp:18-65): docs containing
  every query term == groupBy(doc).count == n_terms over the postings of the
  query's terms (sort-merge/hash join ≡ the skipping loop).
- or_query<with_freqs> (or_query.hpp:12-48): union size / total postings.
- Intersection::compute (include/pisa/intersection.hpp:13-97): posting count
  + max single-doc score sum of an arbitrary term subset.
- count_postings / extract_maxscores / thresholds tools (tools/*.cpp):
  one-line aggregations over the metadata tables.
"""

from __future__ import annotations

from pisa_spark.operators.postings import decode_postings
from pisa_spark.operators.topk import make_query_terms_df, topk_search


def _query_postings(index, queries):
    """Flat postings restricted to the query terms: (qid, term_id, doc_id,
    tf, n_query_terms). Join-before-decode so only needed runs decode.

    List queries resolve term ids DRIVER-side through the index's serve
    lexicon (the reference loads the lexicon into memory before query
    eval, tools/queries.cpp:279-340): the distributed plan then needs no
    lexicon join, no per-qid window, and no distinct exchange — the
    postings restriction is an isin() filter pushed into the cached scan
    and the tiny query table is broadcast. Falls back to the fully
    distributed join plan for DataFrame query sets or indexes whose
    lexicon exceeds the driver bound."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pisa_spark.functions.tokenize import analyze_query_terms
    from pisa_spark.operators.topk import _serve_state

    spark = index.lexicon.sparkSession
    if isinstance(queries, list):
        st = _serve_state(index, prefetch=False)
        if st is not None:
            per_q: dict[str, list[int]] = {}
            for qid, term, _w in analyze_query_terms(queries, index.cfg):
                meta = st.tmeta.get(term)
                if meta is not None:
                    per_q.setdefault(qid, []).append(meta[0])
            rows = [(qid, tid, len(tids))
                    for qid, tids in per_q.items() for tid in tids]
            q = spark.createDataFrame(
                rows, "qid string, term_id long, n_query_terms int")
            tids = sorted({tid for _, tid, _ in rows})
            flat = decode_postings(
                index.postings.filter(F.col("term_id").isin(tids)),
                index.cfg)
            return F.broadcast(q).join(flat, "term_id")
        qterms = make_query_terms_df(spark, queries, index.cfg)
    else:
        qterms = queries
    q = (
        qterms.join(index.lexicon.select("term", "term_id"), "term")
        .withColumn("n_query_terms",
                    F.count("*").over(W.partitionBy("qid")).cast("int"))
        .select("qid", "term_id", "n_query_terms")
    )
    flat = decode_postings(index.postings.join(
        q.select("term_id").distinct(), "term_id"), index.cfg)
    return q.join(flat, "term_id")


def and_query(index, queries):
    """(qid, doc_id) pairs where the doc contains ALL query terms."""
    from pyspark.sql import functions as F

    qp = _query_postings(index, queries)
    return (
        qp.groupBy("qid", "doc_id", "n_query_terms")
        .agg(F.count("*").alias("n_present"))
        .filter(F.col("n_present") == F.col("n_query_terms"))
        .select("qid", "doc_id")
    )


def and_count(index, queries):
    from pyspark.sql import functions as F

    return and_query(index, queries).groupBy("qid").agg(
        F.count("*").alias("n_docs"))


def or_count(index, queries, with_freqs: bool = False):
    """Union size per query; with_freqs counts total postings instead
    (or_query<true>, or_query.hpp:12-48)."""
    from pyspark.sql import functions as F

    qp = _query_postings(index, queries)
    if with_freqs:
        return qp.groupBy("qid").agg(F.count("*").alias("n_postings"))
    return qp.select("qid", "doc_id").distinct().groupBy("qid").agg(
        F.count("*").alias("n_docs"))


def intersection_compute(index, queries, k_for_scores: int = 1_000_000):
    """Per query: intersection posting count + max summed score over the
    intersection (reference Intersection::compute, intersection.hpp:41-74).
    Returns (qid, size, max_score)."""
    from pyspark.sql import functions as F

    inter = and_query(index, queries)
    sizes = inter.groupBy("qid").agg(F.count("*").alias("size"))
    # scores of intersection docs: conjunction executor at large k
    scored = topk_search(index, queries, k=k_for_scores,
                         algorithm="ranked_and")
    maxes = scored.groupBy("qid").agg(F.max("score").alias("max_score"))
    return sizes.join(maxes, "qid", "left")


def index_posting_totals(index):
    """Whole-index posting totals (tools/count_postings.cpp run without a
    query file). Renamed from count_postings: tools.count_postings is the
    per-QUERY variant — same reference tool, different granularity."""
    from pyspark.sql import functions as F

    return index.lexicon.agg(
        F.sum("df").alias("total_postings"),
        F.sum("cf").alias("total_occurrences"),
        F.count("*").alias("n_terms"))


def extract_maxscores(index):
    """(term, max_score) — tools/extract_maxscores.cpp."""
    return index.lexicon.select("term", "term_id", "max_score")


def thresholds(index, queries, k: int = 10, algorithm: str = "maxscore"):
    """True k-th score per query (tools/thresholds.cpp:24-51): run the
    engine, take the k-th best score."""
    from pyspark.sql import functions as F

    res = topk_search(index, queries, k=k, algorithm=algorithm)
    return (
        res.filter(F.col("rank") == k)
        .select("qid", F.col("score").alias("threshold"))
    )
