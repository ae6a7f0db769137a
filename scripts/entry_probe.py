"""Per-entry isolation probe (guide §1.4): time one queries() entry with the
noop sink (computes every column, no sink cost), print partition counts of
the base scans, and optionally dump .explain('formatted').

Usage: python scripts/entry_probe.py SF_DIR ENTRY [ENTRY ...] [--repeats N]
       [--explain-dir DIR] [--count]
--count times .count() instead of the noop sink (matches bench.py's
methodology exactly).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0]
    entries = args[1:]
    repeats = 3
    explain_dir = None
    use_count = "--count" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--repeats":
            repeats = int(sys.argv[i + 1])
            entries = [e for e in entries if e != sys.argv[i + 1]]
        if a == "--explain-dir":
            explain_dir = sys.argv[i + 1]
            entries = [e for e in entries if e != explain_dir]

    import __spark_entry__ as entry_mod
    from pisa_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="entry-probe", cores=cpus)
    qs = entry_mod.queries()

    docs = entry_mod._documents(spark, sf_dir)
    print(f"documents scan partitions: {docs.rdd.getNumPartitions()}  "
          f"rows={docs.count()}")

    for name in entries:
        needs_index = name in {
            "bm25_topk_bmw", "bm25_topk_maxscore", "bm25_topk_batch",
            "bm25_topk_quantized", "bm25_topk_wand", "bm25_topk_bmm",
            "bm25_topk_ranked_and", "bm25_topk_bm_ranked_and",
            "bm25_topk_weighted", "boolean_and_count", "boolean_or_count",
            "count_postings", "intersection_pairs", "intersection_triples",
            "selective_queries", "taily_stats", "profile_queries",
            "taily_thresholds"}
        if needs_index:
            entry_mod._get_index(spark, sf_dir).postings.count()  # untimed
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = qs[name](spark, sf_dir)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(repeats):
            t0 = time.time()  # construction inside the timer, as bench.py
            df = qs[name](spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        med = sorted(runs)[len(runs) // 2]
        print(f"{name}: median {med:.3f}s  runs={[round(r, 3) for r in runs]}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
