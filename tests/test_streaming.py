"""Incremental micro-batch ingestion (streaming/incremental.py): segments
append, docIDs never collide, term_ids stay stable, and queries over the
multi-segment index are rank-identical to a from-scratch batch build over
the same documents."""

import shutil

import pytest
from pyspark.sql import functions as F

from pisa_spark.config import IndexConfig
from pisa_spark.operators.topk import topk_search
from pisa_spark.plans.build import build_index, extract_pages
from pisa_spark.sources import webtext
from pisa_spark.streaming.incremental import (ingest_batch,
                                              load_stream_index,
                                              stream_index)

CFG = IndexConfig(shard_span=64)
OUT = "/root/repo/.cache/stream_idx"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(webtext.generate_pandas(240, seed=13))


def _key(rows):
    return sorted((r.qid, r.rank, r.doc_id if hasattr(r, "doc_id") else None,
                   round(float(r.score), 5)) for r in rows)


def test_incremental_segments_match_batch_build(spark, corpus):
    shutil.rmtree(OUT, ignore_errors=True)
    pages = extract_pages(corpus, CFG).orderBy("url").collect()
    third = len(pages) // 3
    batches = [pages[:third], pages[third:2 * third], pages[2 * third:]]
    for rows in batches:
        bdf = spark.createDataFrame(rows, "url string, text string")
        seg = ingest_batch(bdf, OUT, CFG, html_col=None)
        assert seg["n_docs"] == len(rows)

    sidx = load_stream_index(spark, OUT, CFG)
    assert sidx.stats["num_docs"] == len(pages)

    queries = webtext.synth_queries(20, seed=7)
    got = topk_search(sidx, queries, k=10, algorithm="block_max_wand")
    got_rows = got.collect()

    bidx = build_index(extract_pages(corpus, CFG), CFG)
    want_rows = topk_search(bidx, queries, k=10,
                            algorithm="block_max_wand").collect()
    # compare on (qid, rank, url, score): docIDs differ by segment bases,
    # urls identify documents
    gk = sorted((r.qid, r.rank, r.url, round(float(r.score), 4))
                for r in got_rows)
    wk = sorted((r.qid, r.rank, r.url, round(float(r.score), 4))
                for r in want_rows)
    assert gk == wk


def test_incremental_pruned_matches_exhaustive(spark, corpus):
    sidx = load_stream_index(spark, OUT, CFG)
    queries = webtext.synth_queries(15, seed=11)
    oracle = topk_search(sidx, queries, k=10, algorithm="ranked_or",
                         with_urls=False).collect()
    for alg in ("wand", "maxscore", "block_max_wand"):
        got = topk_search(sidx, queries, k=10, algorithm=alg,
                          with_urls=False).collect()
        assert _key(got) == _key(oracle), alg


def test_stream_index_readstream(spark, corpus, tmp_path):
    """End-to-end through writeStream/foreachBatch with availableNow."""
    src_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "sidx")
    docs = extract_pages(corpus, CFG).limit(60)
    docs.write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream
              .schema("url string, text string")
              .option("maxFilesPerTrigger", 2)
              .parquet(src_dir))
    q = stream_index(stream, out, CFG, html_col=None)
    q.awaitTermination(120)
    sidx = load_stream_index(spark, out, CFG)
    assert sidx.stats["num_docs"] == 60
    res = topk_search(sidx, webtext.synth_queries(5, seed=3), k=5)
    assert res.count() > 0


def test_incremental_large_vocab_path(spark, corpus):
    """With lexicon_broadcast_max shrunk below the vocab size, ingest takes
    the distributed lexicon-delta + exploded-encode path (no driver-side
    vocab dict); results must stay rank-identical to the broadcast path."""
    import tempfile

    small = IndexConfig(shard_span=64, lexicon_broadcast_max=5)
    with tempfile.TemporaryDirectory() as out:
        pages = extract_pages(corpus, small).orderBy("url").limit(120).collect()
        half = len(pages) // 2
        for rows in (pages[:half], pages[half:]):
            bdf = spark.createDataFrame(rows, "url string, text string")
            seg = ingest_batch(bdf, out, small, html_col=None)
            assert seg["n_docs"] == len(rows)
        sidx = load_stream_index(spark, out, small)
        # term_ids must be dense and unique across the two deltas
        lex = sidx.lexicon.select("term", "term_id").collect()
        ids = sorted(r["term_id"] for r in lex)
        assert ids == list(range(len(ids)))
        queries = webtext.synth_queries(10, seed=7)
        got = topk_search(sidx, queries, k=10, algorithm="block_max_wand")
        bdf_all = spark.createDataFrame(pages, "url string, text string")
        bidx = build_index(bdf_all, IndexConfig(shard_span=64))
        want = topk_search(bidx, queries, k=10, algorithm="block_max_wand")
        gk = sorted((r.qid, r.rank, r.url, round(float(r.score), 4))
                    for r in got.collect())
        wk = sorted((r.qid, r.rank, r.url, round(float(r.score), 4))
                    for r in want.collect())
        assert gk == wk


def test_ingest_batch_idempotent_per_batch_id(spark, corpus):
    """A replayed micro-batch (same batch_id) must not append a duplicate
    segment (foreachBatch crash-replay safety)."""
    import tempfile

    with tempfile.TemporaryDirectory() as out:
        pages = extract_pages(corpus, CFG).limit(40).collect()
        bdf = spark.createDataFrame(pages, "url string, text string")
        seg1 = ingest_batch(bdf, out, CFG, html_col=None, batch_id=0)
        seg2 = ingest_batch(bdf, out, CFG, html_col=None, batch_id=0)  # replay
        assert seg2["segment"] == seg1["segment"]
        sidx = load_stream_index(spark, out, CFG)
        assert sidx.stats["num_docs"] == len(pages)


def test_ingest_recovers_from_orphan_lexicon_append(spark, corpus):
    """Crash between the lexicon append and the segments.json commit: the
    replayed/next batch must not assign colliding term_ids (the next free
    id comes from the lexicon TABLE, not the stale committed counter)."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as out:
        pages = extract_pages(corpus, CFG).orderBy("url").limit(80).collect()
        half = len(pages) // 2
        b1 = spark.createDataFrame(pages[:half], "url string, text string")
        ingest_batch(b1, out, CFG, html_col=None, batch_id=0)
        # simulate the orphan append: extra terms in the lexicon table with
        # ids beyond next_term_id, but segments.json not updated
        from pisa_spark.streaming.incremental import _load_segments
        st = _load_segments(out)
        orphan_base = st["next_term_id"]
        spark.createDataFrame(
            [("zzorphan1", orphan_base), ("zzorphan2", orphan_base + 1)],
            "term string, term_id long"
        ).write.mode("append").parquet(os.path.join(out, "lexicon_terms"))
        b2 = spark.createDataFrame(pages[half:], "url string, text string")
        ingest_batch(b2, out, CFG, html_col=None, batch_id=1)
        lex = (spark.read.parquet(os.path.join(out, "lexicon_terms"))
               .collect())
        ids = [r["term_id"] for r in lex]
        assert len(ids) == len(set(ids)), "term_id collision after orphan append"
        sidx = load_stream_index(spark, out, CFG)
        assert topk_search(sidx, webtext.synth_queries(5, seed=3),
                           k=5).count() > 0
