"""TREC-style retrieval evaluation over .qrels (the reference's regression
harness shape: evaluate_queries -> TREC run -> trec_eval against qrels,
reference test/docker/benchmark/evaluate.sh:8-25, expected-eval.txt).

Metrics per query and averaged, all as DataFrame aggregations:

- MAP        (trec_eval `map`): mean over queries of
              sum(precision@rank at each relevant hit) / num_rel
- P@k        (`P_30`-style): relevant in top-k / k
- nDCG@k     (`ndcg_cut_k`): DCG_k / ideal DCG_k with linear gain
              rel / log2(rank + 1) (trec_eval's ndcg_cut gain)
- recall@k

Inputs: a results DataFrame (qid, doc key column, rank) as produced by
operators.topk.topk_search, and a qrels DataFrame (qid, key, rel) —
parse_qrels reads the 4-column TREC format `qid 0 docno rel`.
"""

from __future__ import annotations


def parse_qrels(spark, lines: list[str], key_col: str = "url"):
    """TREC qrels lines `qid iter docno rel` -> DataFrame(qid, key, rel)."""
    rows = []
    for line in lines:
        parts = line.split()
        if len(parts) >= 4:
            rows.append((parts[0], parts[2], int(parts[3])))
    return spark.createDataFrame(rows, f"qid string, {key_col} string, rel int")


def evaluate_run(results_df, qrels_df, k: int = 10, key_col: str = "url"):
    """Per-query metrics DataFrame:
    (qid, num_rel, num_rel_ret, ap, p_at_k, ndcg_at_k, recall_at_k)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rel = qrels_df.filter(F.col("rel") > 0)
    num_rel = rel.groupBy("qid").agg(
        F.count("*").cast("long").alias("num_rel"))

    hits = (results_df.select("qid", key_col, "rank")
            .join(rel, ["qid", key_col], "left")
            .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
            .withColumn("is_rel", (F.col("rel") > 0).cast("double")))

    w = (W.partitionBy("qid").orderBy("rank")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    scored = (hits
              .withColumn("cum_rel", F.sum("is_rel").over(w))
              .withColumn("prec_at", F.col("cum_rel") / F.col("rank"))
              .withColumn("gain", F.col("rel")
                          / F.log2(F.col("rank") + F.lit(1.0))))

    # AP and num_rel_ret follow trec_eval `map`/`num_rel_ret` semantics:
    # aggregated over the FULL run depth. Only P/nDCG/recall are @k.
    per_q = (scored.groupBy("qid")
             .agg(F.sum(F.col("is_rel") * F.col("prec_at")).alias("ap_num"),
                  F.sum("is_rel").cast("long").alias("num_rel_ret"),
                  F.sum(F.when(F.col("rank") <= k, F.col("is_rel"))
                        .otherwise(F.lit(0.0))).cast("long").alias("rel_at_k"),
                  F.sum(F.when(F.col("rank") <= k, F.col("gain"))
                        .otherwise(F.lit(0.0))).alias("dcg")))

    # ideal DCG: relevant docs sorted by rel desc, ranks 1..min(num_rel, k)
    wq = W.partitionBy("qid").orderBy(F.desc("rel"), key_col)
    ideal = (rel.withColumn("irank", F.row_number().over(wq))
             .filter(F.col("irank") <= k)
             .groupBy("qid")
             .agg(F.sum(F.col("rel")
                        / F.log2(F.col("irank") + F.lit(1.0))).alias("idcg")))

    return (num_rel.join(per_q, "qid", "left").join(ideal, "qid", "left")
            .select(
                "qid", "num_rel",
                F.coalesce("num_rel_ret", F.lit(0)).alias("num_rel_ret"),
                F.round(F.coalesce(F.col("ap_num"), F.lit(0.0))
                        / F.col("num_rel"), 6).alias("ap"),
                F.round(F.coalesce(F.col("rel_at_k"), F.lit(0))
                        / F.lit(float(k)), 6).alias("p_at_k"),
                F.round(F.coalesce(F.col("dcg"), F.lit(0.0))
                        / F.coalesce(F.col("idcg"), F.lit(1.0)), 6)
                .alias("ndcg_at_k"),
                F.round(F.coalesce(F.col("rel_at_k"), F.lit(0))
                        / F.col("num_rel"), 6).alias("recall_at_k"),
            ))


def summarize(per_query_df) -> dict:
    """Mean metrics across queries (the trec_eval `all` row)."""
    from pyspark.sql import functions as F

    row = per_query_df.agg(
        F.count("*").alias("num_q"),
        F.avg("ap").alias("map"),
        F.avg("p_at_k").alias("p_at_k"),
        F.avg("ndcg_at_k").alias("ndcg_at_k"),
        F.avg("recall_at_k").alias("recall_at_k")).collect()[0]
    return {k: (round(float(v), 4) if k != "num_q" else int(v))
            for k, v in row.asDict().items()}
