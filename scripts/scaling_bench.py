"""Two-parallelism scaling evidence (BASELINE.json north rule).

Runs the identical index build + batch query workload at local[N] and
local[4N] on the same on-disk corpus and reports throughput at both plus
scaling efficiency = thr(4N) / (4 * thr(N)). Writes/updates BENCH.md.

Each measurement runs in its own fresh JVM (subprocess) to avoid GC/session
carry-over; best of `repeats` is kept (cold-start noise on a shared box).

Usage: python scripts/scaling_bench.py [n_docs] [N] [repeats]
       python scripts/scaling_bench.py --worker CORES NDOCS   (internal)
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def ensure_corpus(n_docs: int) -> str:
    path = f"/root/repo/.cache/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pisa_spark.session import get_spark
        from pisa_spark.sources import webtext

        spark = get_spark(app_name="corpus-gen", cores=32)
        webtext.generate(spark, n_docs, seed=13).write.mode(
            "overwrite").parquet(path)
        spark.stop()
    return path


def worker(cores: int, n_docs: int) -> None:
    from pisa_spark.config import IndexConfig
    from pisa_spark.operators.topk import topk_search
    from pisa_spark.plans.build import build_index
    from pisa_spark.session import get_spark
    from pisa_spark.sources import webtext

    spark = get_spark(app_name=f"pisa-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    pages = spark.read.parquet(f"/root/repo/.cache/bench_corpus_{n_docs}")
    spark.range(1).count()  # JVM warm-up outside the timed region

    cfg = IndexConfig(shard_span=1 << 14)
    t0 = time.time()
    idx = build_index(pages, cfg, html_col="html")
    idx.postings.count()
    idx.lexicon.count()
    build_s = time.time() - t0

    queries = webtext.synth_queries(100, seed=29)
    topk_search(idx, queries[:2], k=10, algorithm="block_max_wand",
                with_urls=False).count()  # warm-up
    t0 = time.time()
    topk_search(idx, queries, k=10, algorithm="block_max_wand",
                with_urls=False).count()
    query_s = time.time() - t0
    print(json.dumps({
        "cores": cores,
        "build_seconds": round(build_s, 2),
        "build_docs_per_sec": round(idx.stats["num_docs"] / build_s, 1),
        "batch_100q_seconds": round(query_s, 2),
        "queries_per_sec": round(100 / query_s, 2),
    }))


def run_subprocess(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    ensure_corpus(n_docs)

    runs = {n: [], 4 * n: []}
    for _ in range(repeats):
        for cores in (n, 4 * n):
            runs[cores].append(run_subprocess(cores, n_docs))
    lo = max(runs[n], key=lambda r: r["build_docs_per_sec"])
    hi = max(runs[4 * n], key=lambda r: r["build_docs_per_sec"])
    build_eff = hi["build_docs_per_sec"] / (4 * lo["build_docs_per_sec"])
    lo_q = max(runs[n], key=lambda r: r["queries_per_sec"])
    hi_q = max(runs[4 * n], key=lambda r: r["queries_per_sec"])
    query_eff = hi_q["queries_per_sec"] / (4 * lo_q["queries_per_sec"])
    print(json.dumps({
        "n_docs": n_docs, "lo": lo, "hi": hi,
        "build_scaling_efficiency": round(build_eff, 3),
        "query_scaling_efficiency": round(query_eff, 3),
        "all_runs": runs,
    }))

    stamp = datetime.date.today().isoformat()
    md = f"""# BENCH — measured numbers (pisa_spark)

Updated {stamp} by scripts/scaling_bench.py on this container
(single JVM per measurement, local mode; cores stand in for executors per
the sandbox rule in BASELINE.md; best of {repeats} fresh-JVM runs).

## Scaling: identical workload at local[{n}] vs local[{4 * n}]

Corpus: {n_docs} synthetic web pages (sources/webtext.py, seed 13), full
pipeline = HTML extract -> tokenize -> postings -> varint block encode ->
block-max metadata; query workload = 100 BM25 top-10 queries,
Block-Max-WAND executor.

| metric | local[{n}] | local[{4 * n}] | scaling efficiency (target >= 0.8) |
|---|---|---|---|
| index build docs/sec | {lo['build_docs_per_sec']} | {hi['build_docs_per_sec']} | {round(build_eff, 3)} |
| index build seconds | {lo['build_seconds']} | {hi['build_seconds']} | |
| batch 100-query seconds | {lo_q['batch_100q_seconds']} | {hi_q['batch_100q_seconds']} | |
| queries/sec (batch) | {lo_q['queries_per_sec']} | {hi_q['queries_per_sec']} | {round(query_eff, 3)} |

Efficiency = throughput(local[{4 * n}]) / (4 x throughput(local[{n}])).

Caveats: one machine shares memory bandwidth, the driver, and the OS page
cache across all cores, so this under-reports true multi-executor scaling;
per-round headline numbers are in BENCH_r{{N}}.json (bench.py).
"""
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
