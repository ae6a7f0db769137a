"""Readers, reordering, checkpoint/resume, and encode internals."""

import json
import shutil

import numpy as np
import pandas as pd
import pytest

from pisa_spark.config import IndexConfig
from pisa_spark.operators import codecs
from pisa_spark.operators.postings import _encode_batch, _group_carry
from pisa_spark.operators.reorder import (
    compressed_size,
    random_mapping,
    reorder_index,
    url_mapping,
)
from pisa_spark.operators.topk import topk_search
from pisa_spark.plans.build import build_index, extract_pages
from pisa_spark.sources import webtext
from pisa_spark.sources.readers import read_jsonl, read_plaintext

CACHE = "/root/repo/.cache/test_extras"


def test_read_plaintext(spark, tmp_path=None):
    p = f"{CACHE}/plain.txt"
    import os

    os.makedirs(CACHE, exist_ok=True)
    with open(p, "w") as f:
        f.write("doc1 hello world\ndoc2 second document text\ndoc3\n")
    out = {r.url: r.text for r in read_plaintext(spark, p).collect()}
    assert out == {"doc1": "hello world", "doc2": "second document text",
                   "doc3": ""}


def test_read_jsonl(spark):
    p = f"{CACHE}/docs.jsonl"
    import os

    os.makedirs(CACHE, exist_ok=True)
    with open(p, "w") as f:
        f.write('{"title": "t1", "content": "body one", "url": "u1"}\n')
        f.write('{"title": "t2", "content": "body two"}\n')
    out = {r.url: r.text for r in read_jsonl(spark, p).collect()}
    assert out == {"u1": "body one", "t2": "body two"}


@pytest.fixture(scope="module")
def small_index(spark):
    cfg = IndexConfig(shard_span=64)
    pdf = webtext.generate_pandas(150, seed=13)
    return build_index(extract_pages(spark.createDataFrame(pdf), cfg), cfg)


def test_reorder_random_preserves_results(spark, small_index):
    """Reordering permutes docIDs but must not change ranked URL output
    (reference: encodings/orderings are result-invariant)."""
    mapping = random_mapping(small_index.docs, seed=7)
    re_idx = reorder_index(small_index, mapping)
    qs = webtext.synth_queries(10, seed=29)
    a = topk_search(small_index, qs, k=5).toPandas()
    b = topk_search(re_idx, qs, k=5).toPandas()
    ka = sorted(map(tuple, a[["qid", "url", "rank"]].values.tolist()))
    kb = sorted(map(tuple, b[["qid", "url", "rank"]].values.tolist()))
    assert ka == kb


def test_url_order_compresses_better_than_random(spark, small_index):
    """URL-ordered docIDs give smaller gap encodings than a random
    permutation (the point of reorder-by-URL, reordering.md:46-66)."""
    rand_idx = reorder_index(small_index, random_mapping(small_index.docs, 7))
    url_size = compressed_size(small_index)  # built URL-ordered by default
    rand_size = compressed_size(rand_idx)
    assert url_size <= rand_size


def test_checkpoint_resume_skips_completed(spark):
    out = f"{CACHE}/resume_idx"
    shutil.rmtree(out, ignore_errors=True)
    cfg = IndexConfig(shard_span=64)
    pdf = webtext.generate_pandas(120, seed=13)
    docs = extract_pages(spark.createDataFrame(pdf), cfg)
    # bucket_min_tokens=0 forces the per-bucket resume mode this test
    # exercises (at this corpus size the adaptive default would collapse
    # the encode to a single job — covered by the test below)
    build_index(docs, cfg, out_dir=out, n_buckets=4, bucket_min_tokens=0)
    m1 = json.load(open(f"{out}/manifest.json"))
    build_index(docs, cfg, out_dir=out, n_buckets=4, bucket_min_tokens=0)
    m2 = json.load(open(f"{out}/manifest.json"))
    assert all(m2["completed"][k]["ts"] == m1["completed"][k]["ts"]
               for k in m1["completed"])
    # killed-run simulation: one bucket missing -> only it rebuilds
    del m2["completed"]["postings/bucket=2"]
    shutil.rmtree(f"{out}/postings/bucket=2")
    json.dump(m2, open(f"{out}/manifest.json", "w"))
    idx = build_index(docs, cfg, out_dir=out, n_buckets=4,
                      bucket_min_tokens=0)
    m3 = json.load(open(f"{out}/manifest.json"))
    assert m3["completed"]["postings/bucket=0"]["ts"] == m1["completed"]["postings/bucket=0"]["ts"]
    assert m3["completed"]["postings/bucket=2"]["ts"] != m1["completed"]["postings/bucket=2"]["ts"]
    assert idx.postings.count() > 0
    # per-artifact metrics: every completed entry carries write seconds +
    # on-disk size (north rule: per-partition lineage + metrics)
    for name, meta in m3["completed"].items():
        assert meta["seconds"] >= 0 and meta["files"] >= 1, name
        assert meta["bytes"] > 0, name
    assert m3["metrics"]["num_docs"] == idx.stats["num_docs"] > 0
    assert m3["metrics"]["build_seconds"] > 0


def test_checkpoint_single_job_mode_matches_inmem(spark):
    """Adaptive resume granularity: below bucket_min_tokens the postings
    stage is ONE job recorded as a single 'postings' artifact; a rerun
    skips everything, load_index round-trips, and the ranking matches the
    in-memory build exactly."""
    from pisa_spark.plans.build import load_index

    out = f"{CACHE}/resume_single"
    shutil.rmtree(out, ignore_errors=True)
    cfg = IndexConfig(shard_span=64)
    pdf = webtext.generate_pandas(120, seed=13)
    docs = extract_pages(spark.createDataFrame(pdf), cfg)
    idx = build_index(docs, cfg, out_dir=out, n_buckets=4)
    m1 = json.load(open(f"{out}/manifest.json"))
    assert "postings" in m1["completed"]
    assert not any(k.startswith("postings/") for k in m1["completed"])
    build_index(docs, cfg, out_dir=out, n_buckets=4)
    m2 = json.load(open(f"{out}/manifest.json"))
    assert all(m2["completed"][k]["ts"] == m1["completed"][k]["ts"]
               for k in m1["completed"])
    mem = build_index(docs, cfg)
    qs = webtext.synth_queries(8, seed=29)
    want = {(r.qid, r.rank, r.url)
            for r in topk_search(mem, qs, k=5).collect()}
    got = {(r.qid, r.rank, r.url)
           for r in topk_search(idx, qs, k=5).collect()}
    assert got == want
    loaded = load_index(spark, out, cfg)
    got_l = {(r.qid, r.rank, r.url)
             for r in topk_search(loaded, qs, k=5).collect()}
    assert got_l == want


def test_group_carry_never_splits_groups():
    """Groups spanning Arrow batch boundaries must encode once."""
    rows = []
    for term in range(5):
        for doc in range(0, 40, 2):
            rows.append((0, term, doc, 1, 10))
    pdf = pd.DataFrame(rows, columns=["shard_id", "term_id", "doc_id", "tf",
                                      "doc_len"])
    batches = [pdf.iloc[:17], pdf.iloc[17:48], pdf.iloc[48:]]
    seen = []

    def fake_encode(p):
        groups = p.groupby(["shard_id", "term_id"]).size()
        seen.extend(groups.index.tolist())
        return p.iloc[:0]

    list(_group_carry(iter(batches), fake_encode))
    assert sorted(seen) == [(0, t) for t in range(5)]
    assert len(seen) == len(set(seen))  # each group exactly once


def test_encode_batch_block_layout():
    cfg = IndexConfig(shard_span=1000, block_size=4)
    from pisa_spark.functions.scoring import make_scorer

    stats = {"num_docs": 100, "avg_len": 50.0, "collection_len": 5000}
    docs = np.array([3, 10, 11, 40, 77, 200, 340, 341, 342], dtype=np.int64)
    pdf = pd.DataFrame({
        "shard_id": 0, "term_id": 9, "doc_id": docs,
        "tf": np.arange(1, 10), "doc_len": 50,
    })
    out = _encode_batch(pdf, cfg, stats, make_scorer("bm25"))
    row = out.iloc[0]
    assert row.n == 9
    assert row.base_doc == -1
    assert list(row.block_last_docs) == [40, 341, 342]  # blocks of 4
    dec = codecs.decode_gap_stream(bytes(row.docs_bin), -1, "varint", 9)
    assert (dec == docs).all()
    # block byte offsets let a single block decode independently
    offs = list(row.block_doc_offs) + [len(row.docs_bin)]
    blk1 = codecs.decode_gap_stream(
        bytes(row.docs_bin[offs[1]:offs[2]]), 40, "varint", 4)
    assert (blk1 == docs[4:8]).all()


def test_recursive_graph_bisection_mapping(spark, small_index):
    """BP reordering (recursive_graph_bisection.hpp): the mapping is a
    valid permutation, ranked output is unchanged, and the BP order
    compresses at least as well as a random permutation (iid synthetic
    docs have no URL-topic clustering, so BP must find the term-sharing
    structure URL order can't)."""
    from pisa_spark.operators.reorder import bp_mapping

    mapping = bp_mapping(small_index, depth=2, iterations=3)
    rows = mapping.collect()
    n = small_index.stats["num_docs"]
    assert len(rows) == n
    assert sorted(r["new_doc_id"] for r in rows) == list(range(n))

    bp_idx = reorder_index(small_index, mapping)
    qs = webtext.synth_queries(8, seed=29)
    a = topk_search(small_index, qs, k=5).toPandas()
    b = topk_search(bp_idx, qs, k=5).toPandas()
    ka = sorted(map(tuple, a[["qid", "url", "rank"]].values.tolist()))
    kb = sorted(map(tuple, b[["qid", "url", "rank"]].values.tolist()))
    assert ka == kb

    rand_idx = reorder_index(small_index, random_mapping(small_index.docs, 7))
    assert compressed_size(bp_idx) <= compressed_size(rand_idx)


def test_bp_checkpoint_resume_and_clustered_win(spark, tmp_path):
    """Reliable BP restart (north-rule lineage requirement): with
    checkpoint_dir every (level, iteration) state is a parquet artifact; a
    rerun resumes (identical mapping, zero recompute — manifest timestamps
    unchanged). On a clustered corpus whose urls carry no topical signal,
    the BP order must beat the URL order for compressed size — the win the
    i.i.d. corpus cannot show."""
    import json

    from pisa_spark.config import IndexConfig
    from pisa_spark.operators.reorder import bp_mapping
    from pisa_spark.plans.build import build_index

    clustered = webtext.generate_clustered(spark, 600, n_clusters=8)
    cfg = IndexConfig(shard_span=256, codec="ef")
    idx = build_index(clustered, cfg)  # URL order (default)

    ck = str(tmp_path / "bp_ck")
    m1 = bp_mapping(idx, depth=3, iterations=3, checkpoint_dir=ck).collect()
    stamps1 = json.load(open(f"{ck}/manifest.json"))["completed"]
    assert any(k.startswith("bp/level=") for k in stamps1)
    m2 = bp_mapping(idx, depth=3, iterations=3, checkpoint_dir=ck).collect()
    stamps2 = json.load(open(f"{ck}/manifest.json"))["completed"]
    assert {k: v["ts"] for k, v in stamps1.items()} == \
           {k: v["ts"] for k, v in stamps2.items()}  # nothing recomputed
    key = lambda rows: sorted((r["doc_id"], r["new_doc_id"]) for r in rows)
    assert key(m1) == key(m2)

    bp_idx = reorder_index(idx, spark.createDataFrame(
        m1, "doc_id long, new_doc_id long"), cfg)
    assert compressed_size(bp_idx) < compressed_size(idx)


def test_shuffle_free_encode_identical_to_shuffled(spark):
    """The bucket-aligned (shuffle-free) docwise encode must produce
    byte-identical encoded rows to the (shard)-repartitioned plan. The
    build path now aligns bucket offsets to the shard span, so NO shard
    ever straddles a bucket seam — asserted here — and the straddle
    branch is exercised separately below with a hand-built layout."""
    import pisa_spark.operators.postings as P
    import pisa_spark.plans.build as B
    from pisa_spark.sources import webtext

    docs = webtext.generate(spark, 4000, seed=11)
    span = 16
    cfg = IndexConfig(shard_span=span)
    seen = {}
    orig = P.encode_postings_docwise_str

    def spy(*a, **kw):
        seen["starts"] = kw.get("bucket_starts")
        return orig(*a, **kw)

    P.encode_postings_docwise_str = spy
    try:
        idx_new = B.build_index(docs, cfg, html_col="html")
        rows_new = sorted(map(tuple,
                              idx_new.postings.drop("term_id").collect()))
    finally:
        P.encode_postings_docwise_str = orig
    starts = seen["starts"]
    assert starts is not None and len(starts) > 1
    # span-aligned bucket offsets: the shuffle-free plan has no boundary
    # branch at any parallelism (the straddle mass used to grow with the
    # bucket count, taxing exactly the higher-parallelism build)
    assert all(s % span == 0 for s in starts)

    def legacy(*a, **kw):
        kw["bucket_starts"] = None
        return orig(*a, **kw)

    P.encode_postings_docwise_str = legacy
    try:
        idx_old = B.build_index(docs, cfg, html_col="html")
        rows_old = sorted(map(tuple,
                              idx_old.postings.drop("term_id").collect()))
    finally:
        P.encode_postings_docwise_str = orig
    assert rows_new == rows_old and rows_new


def test_straddle_branch_identical_to_shuffled(spark):
    """Unaligned bucket_starts (callers outside the aligned build path):
    bucket-straddling shards route through the compact-row boundary
    branch and must still be byte-identical to the classic plan."""
    from pyspark.sql import functions as F

    import pisa_spark.operators.postings as P
    from pisa_spark.functions.scoring import make_scorer  # noqa: F401
    from pisa_spark.sources import webtext

    from pisa_spark.config import IndexConfig
    from pisa_spark.plans.build import doc_term_counts

    span = 16
    cfg = IndexConfig(shard_span=span)
    pages = webtext.generate(spark, 600, seed=23)
    toks = doc_term_counts(pages.select("url", "html"), cfg,
                           html_col="html")
    # hand-built rank layout: 2 partitions, each one contiguous doc_id
    # bucket with an UNALIGNED seam at 250 (shard 15 straddles)
    from pyspark.sql import Window as W

    ranked = toks.withColumn(
        "doc_id", F.row_number().over(W.orderBy("url")) - 1)
    n = ranked.count()
    seam = 250
    assert seam % span != 0
    layout = (ranked.repartition(2, (F.col("doc_id") >= seam).cast("int"))
              .sortWithinPartitions("doc_id"))
    # repartition(2, bool) may hash both buckets anywhere; rebuild with
    # range partitioning so each partition IS one contiguous bucket
    layout = ranked.repartitionByRange(2, (F.col("doc_id") >= seam))\
        .sortWithinPartitions("doc_id")
    stats = {"num_docs": n, "collection_len": 0, "avg_len": 1.0}
    free = P.encode_postings_docwise_str(
        layout, cfg, dict(stats), bucket_starts=[0, seam])
    classic = P.encode_postings_docwise_str(layout, cfg, dict(stats),
                                            bucket_starts=None)
    a = sorted(map(tuple, free.collect()))
    b = sorted(map(tuple, classic.collect()))
    assert a == b and a
    straddle_shard = seam // span
    assert any(r[0] == straddle_shard for r in a)


def test_lexicon_driver_ids_identical_to_small_path(spark):
    """The broadcast-size lexicon branch (driver id-assignment over a
    slim term-only transfer, stats joined distributed) must produce the
    SAME lexicon — ids, stats, max_score bits — and the same query
    results as the small-vocab driver path."""
    from pisa_spark.plans.build import build_index
    from pisa_spark.sources import webtext

    docs = webtext.generate(spark, 800, seed=23)
    cfg_small = IndexConfig(shard_span=64)
    cfg_mid = IndexConfig(shard_span=64, lexicon_driver_max=0)
    idx_a = build_index(docs, cfg_small, html_col="html")
    idx_b = build_index(docs, cfg_mid, html_col="html")
    lex_a = sorted(map(tuple, idx_a.lexicon.collect()))
    lex_b = sorted(map(tuple, idx_b.lexicon.collect()))
    assert lex_a == lex_b and lex_a
    qs = webtext.synth_queries(8, seed=31)
    qa = sorted(map(tuple, topk_search(
        idx_a, qs, k=10, algorithm="block_max_wand").collect()))
    qb = sorted(map(tuple, topk_search(
        idx_b, qs, k=10, algorithm="block_max_wand").collect()))
    assert qa == qb and qa


def test_arrow_cut_sample_covers_sorted_file(spark, tmp_path):
    """_arrow_cut_sample must sample the WHOLE key range of a parquet
    file sorted by the cut column (evenly spaced row groups incl. first
    and last), must refuse filtered plans, and the cuts it feeds
    _sample_cuts must keep bucket balance sane."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pisa_spark.plans.build import _arrow_cut_sample, _sample_cuts

    urls = [f"https://site-{i:06d}.example/page" for i in range(20000)]
    path = str(tmp_path / "sorted.parquet")
    pq.write_table(pa.table({"url": urls}), path, row_group_size=1000)

    df = spark.read.parquet(path)
    vals = _arrow_cut_sample(df, "url", 256)
    assert vals is not None and len(vals) >= 256
    # samples span the key range: something from the first and last 15%
    lo, hi = urls[3000], urls[17000]
    assert min(vals) < lo and max(vals) > hi

    # filtered plan => no shortcut (footer sample would mis-state data)
    assert _arrow_cut_sample(df.filter("url > 'https://site-1'"),
                             "url", 64) is None
    # missing column => no shortcut
    assert _arrow_cut_sample(df, "nope", 64) is None

    # end-to-end: cuts from the arrow path divide the sorted file evenly
    cuts = _sample_cuts(df, "url", 8)
    assert 4 <= len(cuts) <= 7
    import bisect

    counts = [0] * (len(cuts) + 1)
    for u in urls:
        counts[bisect.bisect_right(cuts, u)] += 1
    assert max(counts) < 2.5 * (len(urls) / len(counts))


def test_build_on_parquet_matches_inmemory(spark, tmp_path):
    """A build whose cuts come from the driver-side arrow sampler must
    produce the same lexicon and query results as the same corpus built
    from an in-memory DataFrame (which takes the Spark sample path)."""
    docs = webtext.generate(spark, 600, seed=47)
    path = str(tmp_path / "corpus")
    docs.write.parquet(path)
    cfg = IndexConfig(shard_span=64)
    idx_mem = build_index(docs, cfg, html_col="html")
    idx_pq = build_index(spark.read.parquet(path), cfg, html_col="html")
    lex_a = sorted(map(tuple, idx_mem.lexicon.collect()))
    lex_b = sorted(map(tuple, idx_pq.lexicon.collect()))
    assert lex_a == lex_b and lex_a
    qs = webtext.synth_queries(8, seed=7)
    qa = sorted(map(tuple, topk_search(
        idx_mem, qs, k=10, algorithm="block_max_wand").collect()))
    qb = sorted(map(tuple, topk_search(
        idx_pq, qs, k=10, algorithm="block_max_wand").collect()))
    assert qa == qb and qa
