"""Deterministic key->partition placement for low-cardinality shuffle keys.

Spark's `repartition(parts, col)` places rows by Murmur3(col) % parts. When
the column has only ~parts distinct values (docID buckets, doc shards),
random hash placement leaves ~1/e of the partitions empty and doubles up
others — a 2x straggler on exactly the stages that dominate the build. A
real cluster hits the same effect, so the fix lives in the engine, not the
benchmark.

`partition_values(spark, parts)` finds, for each target partition p, a long
value v_p with Murmur3(v_p) % parts == p (probed with Spark's own `hash`
expression in one millisecond-scale local job, so the probe can never drift
from the engine's partitioner). `round_robin_expr(key, parts, vals)` then
maps key k -> v_(k % parts): repartitioning on that column places key k on
partition k % parts EXACTLY — perfect round-robin for dense integer keys
(bucket indices, shard ids), immune to hash collisions.
"""

from __future__ import annotations

_VALS_CACHE: dict[int, list[int]] = {}


def partition_values(spark, parts: int) -> list[int]:
    """One long per partition p such that pmod(hash(v_p), parts) == p."""
    if parts in _VALS_CACHE:
        return _VALS_CACHE[parts]
    from pyspark.sql import functions as F

    by_p: dict[int, int] = {}
    lo = 0
    while len(by_p) < parts:
        rows = (spark.range(lo, lo + parts * 64)
                .select("id", F.pmod(F.hash("id"), F.lit(parts)).alias("p"))
                .collect())
        for r in rows:
            by_p.setdefault(int(r["p"]), int(r["id"]))
        lo += parts * 64
    vals = [by_p[p] for p in range(parts)]
    _VALS_CACHE[parts] = vals
    return vals


def round_robin_expr(key_col, parts: int, vals: list[int]):
    """Column expr v_(key % parts); repartition(parts, <this>) places key k
    on partition k % parts."""
    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(v).cast("long") for v in vals])
    return F.element_at(arr, (F.pmod(key_col, F.lit(parts))).cast("int") + 1)
