"""spark-submit entry: index build + BM25 top-k, packaged via --py-files.

Usage (north rule's deployment shape):

    cd /root/repo && zip -qr /tmp/pisa_spark.zip pisa_spark
    spark-submit --master local[8] --py-files /tmp/pisa_spark.zip \
        scripts/submit_job.py [n_docs] [out_dir]

On a cluster, swap --master and add executor confs; pisa_spark/session.py's
malloc env must be exported to executors via spark.executorEnv.* (see
README). The job is resumable: re-submitting with the same out_dir skips
completed artifacts through the checkpoint manifest.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None

    spark = SparkSession.builder.appName("pisa-spark-submit").getOrCreate()

    from pisa_spark.config import IndexConfig
    from pisa_spark.operators.topk import topk_search, trec_output
    from pisa_spark.plans.build import build_index
    from pisa_spark.sources import webtext

    cfg = IndexConfig(shard_span=1 << 10)
    pages = webtext.generate(spark, n_docs, seed=13)
    idx = build_index(pages, cfg, html_col="html", out_dir=out_dir)
    queries = webtext.synth_queries(10, seed=3)
    res = topk_search(idx, queries, k=10, algorithm="block_max_wand")
    lines = [r["line"] for r in trec_output(res).collect()]
    print(json.dumps({
        "num_docs": idx.stats["num_docs"],
        "n_result_lines": len(lines),
        "first": lines[:3],
        "phase_seconds": idx.stats.get("phase_seconds", {}),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
