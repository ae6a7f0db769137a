"""Stage-level profiling of the index build at a given core count.

Usage: python scripts/profile_build.py CORES [N_DOCS] [DRIVER_MEM]
Prints per-stage wall seconds (the build's own phase_seconds instrumentation,
so the numbers always reflect the real build_index flow) plus the batch
query throughput, so scaling bottlenecks are attributable per phase.
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

    from pisa_spark.config import IndexConfig
    from pisa_spark.operators.topk import topk_search_batch
    from pisa_spark.plans.build import build_index
    from pisa_spark.session import get_spark
    from pisa_spark.sources import webtext

    spark = get_spark(app_name=f"profile-{cores}", cores=cores)
    path = f"/root/repo/.cache/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        webtext.generate(spark, n_docs, seed=13).write.mode(
            "overwrite").parquet(path)
    pages = spark.read.parquet(path)
    spark.range(1).count()
    cfg = IndexConfig(shard_span=1 << 14)

    t0 = time.time()
    idx = build_index(pages, cfg, html_col="html", eager=True)
    build_s = time.time() - t0

    queries = webtext.synth_queries(100, seed=29)
    t0 = time.time()
    topk_search_batch(idx, queries, k=10,
                      algorithm="block_max_wand").count()
    query_s = time.time() - t0

    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "mem": mem,
        "stages": idx.stats.get("phase_seconds", {}),
        "build_total": round(build_s, 2),
        "batch_100q_seconds": round(query_s, 2),
    }))


if __name__ == "__main__":
    main()
