"""Stage-level profiling of the index build at a given core count.

Usage: python scripts/profile_build.py CORES [N_DOCS] [DRIVER_MEM]
Prints per-stage wall seconds so scaling bottlenecks are attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
    mem = sys.argv[3] if len(sys.argv) > 3 else "8g"
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem

    from pyspark.sql import functions as F

    from pisa_spark.config import IndexConfig
    from pisa_spark.functions.scoring import make_scorer
    from pisa_spark.operators.postings import encode_postings
    from pisa_spark.plans.build import dense_ids, doc_term_counts
    from pisa_spark.session import get_spark
    from pisa_spark.sources import webtext

    spark = get_spark(app_name=f"profile-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    path = f"/root/repo/.cache/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        webtext.generate(spark, n_docs, seed=13).write.mode(
            "overwrite").parquet(path)
    pages = spark.read.parquet(path)
    spark.range(1).count()
    stages = {}
    cfg = IndexConfig(shard_span=1 << 14)

    t = time.time()
    src = pages.filter(F.col("lang") == "en").select("url", "html")
    with_ids, cached = dense_ids(src, "url", "doc_id")
    stages["1_dense_ids_materialize"] = round(time.time() - t, 2)

    t = time.time()
    doc_terms = doc_term_counts(with_ids, cfg, html_col="html").persist()
    doc_terms.count()
    stages["2_extract_tokenize"] = round(time.time() - t, 2)

    t = time.time()
    agg = doc_terms.agg(F.count("*").alias("n"),
                        F.sum("doc_len").alias("total")).collect()[0]
    stats = {"num_docs": int(agg["n"]),
             "collection_len": int(agg["total"]),
             "avg_len": float(agg["total"]) / int(agg["n"])}
    stages["3_stats"] = round(time.time() - t, 2)

    flat_terms = doc_terms.select(
        "doc_id", "doc_len",
        F.explode(F.arrays_zip("terms", "tfs")).alias("z")
    ).select("doc_id", "doc_len", F.col("z.terms").alias("term"),
             F.col("z.tfs").cast("long").alias("tf"))

    t = time.time()
    terms_distinct = flat_terms.select("term").distinct()
    lexicon_base, _ = dense_ids(terms_distinct, "term", "term_id")
    lexicon_base = lexicon_base.persist()
    lexicon_base.count()
    stages["4_lexicon"] = round(time.time() - t, 2)

    t = time.time()
    tf_full = (flat_terms.join(lexicon_base, "term")
               .select("term_id", "doc_id", "tf", "doc_len"))
    postings = encode_postings(tf_full, cfg, stats).persist()
    postings.count()
    stages["5_encode_postings"] = round(time.time() - t, 2)

    t = time.time()
    term_stats = (tf_full.groupBy("term_id")
                  .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
    mp = postings.groupBy("term_id").agg(
        F.max(F.array_max("block_max_part")).alias("max_part"))
    lexicon_base.join(term_stats, "term_id").join(mp, "term_id").count()
    stages["6_term_meta"] = round(time.time() - t, 2)

    total = sum(stages.values())
    print(json.dumps({"cores": cores, "n_docs": n_docs, "mem": mem,
                      "stages": stages, "total": round(total, 2)}))


if __name__ == "__main__":
    main()
