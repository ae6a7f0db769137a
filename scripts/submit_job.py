"""spark-submit entry: index build + BM25 top-k, packaged via --py-files.

Usage (north rule's deployment shape):

    cd /root/repo && zip -qr /tmp/pisa_spark.zip pisa_spark
    spark-submit --master local[8] --py-files /tmp/pisa_spark.zip \
        scripts/submit_job.py [n_docs] [out_dir] [--input TABLE_OR_PATH]

--input reads the corpus from an Iceberg catalog table name or a parquet
path (sources.readers.load_web_pages) instead of generating one; n_docs
is ignored then.

On a cluster, swap --master and add executor confs; pisa_spark/session.py's
malloc env must be exported to executors via spark.executorEnv.* (see
README). The job is resumable: re-submitting with the same out_dir skips
completed artifacts through the checkpoint manifest.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    args = list(sys.argv[1:])
    input_src = None
    if "--input" in args:
        i = args.index("--input")
        input_src = args[i + 1]
        del args[i:i + 2]
    n_docs = int(args[0]) if len(args) > 0 else 2000
    out_dir = args[1] if len(args) > 1 else None

    spark = SparkSession.builder.appName("pisa-spark-submit").getOrCreate()

    from pisa_spark.config import IndexConfig
    from pisa_spark.operators.topk import topk_search, trec_output
    from pisa_spark.plans.build import build_index
    from pisa_spark.sources import webtext
    from pisa_spark.sources.readers import load_web_pages

    cfg = IndexConfig(shard_span=1 << 10)
    if input_src is not None:
        pages = load_web_pages(spark, input_src, langs=["en"])
    else:
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
