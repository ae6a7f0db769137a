"""Skew handling: stopword-grade terms (df == N) must never form an
unbounded aggregation key (SURVEY §7 risk 5; the north rule's heavy-hitter
splitting). The doc-shard span bounds every (shard, term) posting run by
construction — the deterministic salt — and query-side merge of the runs is
exercised by rank-identity on queries containing the heavy terms."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.config import IndexConfig
from pisa_spark.operators.topk import topk_search
from pisa_spark.plans.build import build_index, extract_pages
from pisa_spark.sources import webtext

N_DOCS = 400
SPAN = 50  # small span => heavy terms split into many runs


@pytest.fixture(scope="module")
def index(spark):
    cfg = IndexConfig(shard_span=SPAN)
    pages = spark.createDataFrame(webtext.generate_pandas(N_DOCS, seed=13))
    return build_index(extract_pages(pages, cfg), cfg)


def test_no_group_exceeds_shard_span(index):
    assert index.postings.agg(F.max("n")).collect()[0][0] <= SPAN


def test_heavy_hitter_splits_into_runs(index):
    num_docs = index.stats["num_docs"]
    # heaviest stopword-grade term (the generator salts 5-15 stopwords from
    # a 10-word pool into each doc)
    heavy = (index.lexicon.orderBy(F.desc("df")).first())
    runs = (index.postings.filter(F.col("term_id") == heavy["term_id"])
            .select("shard_id", "n", "base_doc", "last_doc")
            .orderBy("shard_id").collect())
    df = sum(r["n"] for r in runs)
    assert df > 0.5 * num_docs          # a true heavy hitter
    assert len(runs) >= df // SPAN      # split across >= df/span runs
    for r in runs:                      # runs stay inside their doc range
        # base_doc is the gap-stream base: the doc BEFORE the shard start
        assert r["base_doc"] == r["shard_id"] * SPAN - 1
        assert r["shard_id"] * SPAN <= r["last_doc"] < (r["shard_id"] + 1) * SPAN


def test_heavy_hitter_queries_rank_identical(index):
    queries = ["H1:the", "H2:the and of", "H3:the term0000",
               "H4:a the is term0001 term0002"]
    oracle = topk_search(index, queries, k=10, algorithm="ranked_or",
                         with_urls=False).collect()
    assert {r.qid for r in oracle} == {"H1", "H2", "H3", "H4"}
    for alg in ("wand", "block_max_wand", "maxscore"):
        got = topk_search(index, queries, k=10, algorithm=alg,
                          with_urls=False).collect()
        key = lambda rows: sorted(
            (r.qid, r.rank, r.doc_id, float(r.score)) for r in rows)
        assert key(got) == key(oracle), alg


def test_group_size_histogram_is_metricable(index):
    """The build exposes per-run sizes: the skew metric the north rule asks
    for is derivable as a one-line aggregation."""
    hist = (index.postings.groupBy().agg(
        F.max("n").alias("max_run"),
        F.avg("n").alias("avg_run"),
        F.count("*").alias("runs")).collect()[0])
    assert hist["max_run"] <= SPAN and hist["runs"] > 0
