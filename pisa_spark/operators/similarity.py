"""Similarity search over embedding columns (array<float>).

- cosine_topk: exact brute-force top-k — the baseline/oracle. Query side is
  broadcast; scoring is a native zip_with/aggregate expression (JVM,
  codegen'd); per-query top-k via window — Spark's partial/final
  TakeOrderedAndProject handles the merge.
- lsh_ann_topk: the scale path — signed-random-projection LSH buckets
  (deterministic, seed-derived hyperplanes) shrink the candidate set, then
  the exact cosine reranks within buckets. Recall measured vs brute force
  in tests; probes > 1 trades compute for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk(embeddings, query_ids: list[int], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k by cosine for each query id (excluding self)."""
    from pyspark.sql import Window as W

    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
                          _norm(F.col(vec_col)).alias("nrm"))
    q = e.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = (
        e.join(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid",
                F.round(dot / (F.col("qn") * F.col("nrm")), 6).alias("cosine"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "cosine", "rank")
    )


def _projections(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_bucket_udf(dim: int | None = None, n_planes: int = 12, seed: int = 7):
    """pandas UDF: embedding -> signed-projection bucket id (int).

    dim may be None: the hyperplanes are then derived from the batch's own
    vector length on the executor (cached per dim) — the planes are
    seed-deterministic, so every worker generates the same matrix and no
    driver-side row peek is needed."""
    planes_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        planes_cache[dim] = _projections(dim, n_planes, seed)

    def bucket(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series(np.zeros(0, dtype=np.int64))
        mat = np.stack(vecs.to_numpy())
        d = mat.shape[1]
        planes = planes_cache.get(d)
        if planes is None:
            planes = planes_cache[d] = _projections(d, n_planes, seed)
        signs = (mat @ planes.T) > 0
        return pd.Series(
            (signs.astype(np.int64)
             << np.arange(n_planes, dtype=np.int64)).sum(axis=1))

    return F.pandas_udf(bucket, "long")


def lsh_multi_bucket_udf(dim: int | None, n_planes: int, seeds: list[int]):
    """pandas UDF: embedding -> array of bucket ids, one per seed (= one
    per probe table), in seed order.

    One scan + one Arrow boundary + one stacked matmul replaces `probes`
    separate UDF passes over the corpus (guide §4: cross the Python
    boundary once and vectorize inside). Bit-identical to applying
    lsh_bucket_udf per seed: the per-seed plane matrices are generated
    independently and only stacked for the matmul."""
    cache: dict[int, np.ndarray] = {}

    def planes_for(d: int) -> np.ndarray:
        p = cache.get(d)
        if p is None:
            p = cache[d] = np.concatenate(
                [_projections(d, n_planes, s) for s in seeds])
        return p

    if dim is not None:
        planes_for(dim)
    weights = np.arange(n_planes, dtype=np.int64)

    def bucket(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series(np.zeros((0, len(seeds)), dtype=np.int64).tolist())
        mat = np.stack(vecs.to_numpy())
        signs = (mat @ planes_for(mat.shape[1]).T) > 0
        per_tbl = signs.reshape(len(vecs), len(seeds), n_planes)
        ids = (per_tbl.astype(np.int64) << weights).sum(axis=2)
        return pd.Series(list(ids))

    return F.pandas_udf(bucket, "array<long>")


def lsh_ann_topk(embeddings, query_ids: list[int], k: int = 10,
                 n_planes: int = 12, probes: int = 1, multiprobe: int = 1,
                 seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int | None = None):
    """ANN top-k: candidates = vectors sharing a bucket with the query in any
    of `probes` hash tables (multiprobe additionally checks buckets within
    `multiprobe` flipped sign bits), exact cosine rerank inside candidates.

    At cluster scale the bucketed join replaces the crossJoin of the exact
    path: each table is one shuffle keyed on (table, bucket). `dim` is
    optional — when omitted, the bucket UDF derives the hyperplanes from
    the vectors' own length executor-side (no driver row peek)."""
    from pyspark.sql import Window as W

    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
                          _norm(F.col(vec_col)).alias("nrm"))
    multi = lsh_multi_bucket_udf(dim, n_planes,
                                 [seed + t for t in range(probes)])
    buckets = e.select(
        "vid", F.posexplode(multi("v")).alias("tbl", "bucket"))
    # materialize the bucket table once: the query side, the corpus side
    # of the candidate join, and the join-key null-check pushdown would
    # otherwise each re-run the ArrowEvalPython bucket pass (guide §4.4
    # duplication — observed twice per table in the physical plan)
    buckets = buckets.localCheckpoint()

    qb = buckets.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), "tbl", "bucket")
    if multiprobe > 0:
        # probe buckets within hamming distance 1 of the query's bucket
        # (flip each sign bit once); exact rerank keeps results correct
        flips = F.array(F.lit(0), *[F.lit(1 << j) for j in range(n_planes)])
        qb = qb.select(
            "qid", "tbl",
            F.explode(F.transform(
                flips, lambda m: F.col("bucket").bitwiseXOR(m))).alias("bucket"))
    cand = (
        buckets.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid").distinct()
    )
    q = e.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = (
        cand.join(e, "vid").join(F.broadcast(q), "qid")
        .select("qid", "vid",
                F.round(dot / (F.col("qn") * F.col("nrm")), 6).alias("cosine"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vid", "cosine", "rank")
    )


# ----------------------------------------------------------------- IVF ANN

def _spherical_kmeans(mat: np.ndarray, nlists: int, iters: int,
                      seed: int) -> np.ndarray:
    """Deterministic spherical k-means (cosine assignment) on unit rows —
    the coarse quantizer of an IVF index (Faiss IVF role re-expressed:
    train driver-side on a bounded sample, assign executor-side)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(mat.shape[0], size=min(nlists, mat.shape[0]),
                          replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, mat)
        counts = np.bincount(assign, minlength=cent.shape[0])
        empty = counts == 0
        # empty list: keep the previous centroid (stays selectable)
        new[empty] = cent[empty]
        n2 = np.linalg.norm(new, axis=1, keepdims=True)
        cent = new / np.clip(n2, 1e-12, None)
    return cent.astype(np.float32)


def ivf_assign_udf(centroids: np.ndarray):
    """pandas UDF: embedding -> nearest-centroid (cosine) list id. The
    centroid matrix travels in the task closure (nlists x dim floats —
    KBs), so assignment is one vectorized pass per Arrow batch."""
    cent = np.ascontiguousarray(centroids, dtype=np.float32)

    def assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series(np.zeros(0, dtype=np.int32))
        mat = np.stack(vecs.to_numpy()).astype(np.float32)
        mat = mat / np.clip(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
        return pd.Series((mat @ cent.T).argmax(axis=1).astype(np.int32))

    return F.pandas_udf(assign, "int")


def ivf_ann_topk(embeddings, query_ids: list[int], k: int = 10,
                 nlists: int = 64, nprobe: int = 4,
                 train_sample: int = 20000, iters: int = 5, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF ANN top-k: k-means coarse quantizer + inverted lists + exact
    cosine rerank inside the probed lists.

    The scale path alongside lsh_ann_topk: centroids train driver-side on
    a deterministic hash-sampled subset (one bounded job, <= train_sample
    vectors), every vector is assigned its nearest list in one vectorized
    UDF pass, and each query probes its `nprobe` nearest lists — the
    candidate join is broadcast (query side is tiny by construction) and
    touches ~nprobe/nlists of the corpus instead of all of it. Rerank is
    the exact cosine expression, so returned scores are exact and recall
    is the only approximation (raise nprobe to trade compute for recall).
    """
    from pyspark.sql import Window as W

    e = embeddings.select(F.col(id_col).alias("vid"),
                          F.col(vec_col).alias("v"),
                          _norm(F.col(vec_col)).alias("nrm"))

    spark = embeddings.sparkSession
    empty = spark.createDataFrame(
        [], "qid long, vid long, cosine double, rank int")

    # ---- train: deterministic hash-sampled subset, driver k-means
    n_total = embeddings.count()
    if n_total == 0:
        return empty
    step = max(1, n_total // max(train_sample, 1))
    sample_pdf = (e.filter(F.pmod(F.xxhash64("vid"), F.lit(step)) == 0)
                  .select("vid", "v").orderBy("vid")
                  .limit(train_sample).toPandas())
    mat = np.stack(sample_pdf["v"].to_numpy()).astype(np.float32)
    cent = _spherical_kmeans(mat, nlists, iters, seed)

    # ---- assign inverted lists (one narrow UDF pass)
    assigned = e.withColumn("list", ivf_assign_udf(cent)("v"))

    # ---- probe: query vectors -> nprobe nearest centroids (driver; the
    # query set is a small list by contract)
    q_pdf = (e.filter(F.col("vid").isin(query_ids))
             .select("vid", "v").toPandas())
    if q_pdf.empty:  # none of the requested ids exist in the table
        return empty
    qmat = np.stack(q_pdf["v"].to_numpy()).astype(np.float32)
    qmat = qmat / np.clip(np.linalg.norm(qmat, axis=1, keepdims=True),
                          1e-12, None)
    order = np.argsort(-(qmat @ cent.T), axis=1, kind="stable")
    probes = order[:, :min(nprobe, cent.shape[0])]
    q_lists = spark.createDataFrame(
        [(int(q), int(l)) for q, row in zip(q_pdf["vid"], probes)
         for l in row],
        "qid long, list int")

    cand = (assigned.join(F.broadcast(q_lists), "list")
            .filter(F.col("vid") != F.col("qid"))
            .select("qid", "vid").distinct())
    q = e.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = (cand.join(e, "vid").join(F.broadcast(q), "qid")
              .select("qid", "vid",
                      F.round(dot / (F.col("qn") * F.col("nrm")),
                              6).alias("cosine")))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "vid", "cosine", "rank"))
