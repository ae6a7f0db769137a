"""Rank-identity of pruned executors vs the exhaustive oracle.

Mirrors the reference's central correctness test
(test/test_ranked_queries.cpp:119-168): every pruned algorithm must return
the same result set as exhaustive ranked_or. We require *exact* equality of
(doc_id, float32 score, rank) — stronger than the reference's 0.1% — because
all executors accumulate scores in canonical ascending-term_id order.

Also checks against an independent pure-Python float32 BM25 (same canonical
order), plus threshold seeding, weighted queries, and unknown-term drops.
"""

import collections
import math

import numpy as np
import pytest

from pisa_spark.config import IndexConfig
from pisa_spark.functions.tokenize import analyze_query_terms, make_analyzer
from pisa_spark.operators.topk import topk_search, trec_output
from pisa_spark.plans.build import build_index, extract_pages
from pisa_spark.sources import webtext

N_DOCS = 300
N_QUERIES = 40
K = 10


@pytest.fixture(scope="module")
def corpus():
    return webtext.generate_pandas(N_DOCS, seed=13)


@pytest.fixture(scope="module")
def index(spark, corpus):
    cfg = IndexConfig(shard_span=64)  # several shards at 300 docs
    pages = spark.createDataFrame(corpus)
    return build_index(extract_pages(pages, cfg), cfg)


@pytest.fixture(scope="module")
def queries():
    return webtext.synth_queries(N_QUERIES, seed=29)


@pytest.fixture(scope="module")
def pyref(corpus):
    """Pure-python float32 BM25 with canonical term-order accumulation."""
    cfg = IndexConfig()
    analyze = make_analyzer(cfg)
    en = corpus[corpus.lang == "en"].sort_values("url").reset_index(drop=True)
    postings: dict = collections.defaultdict(dict)
    doc_len: dict = {}
    for d, text in enumerate(en["text"]):
        toks = analyze(text)
        doc_len[d] = len(toks)
        for t in toks:
            postings[t][d] = postings[t].get(d, 0) + 1
    n = len(en)
    avg = np.float32(sum(doc_len.values()) / n)
    lex_order = {t: i for i, t in enumerate(sorted(postings))}

    def topk(qterms, k=K):
        f32 = np.float32
        scores: dict = collections.defaultdict(f32)
        known = sorted((t for t, _ in qterms if t in postings),
                       key=lex_order.__getitem__)
        for t in known:
            df = len(postings[t])
            idf = f32(max(1e-6, math.log(
                (f32(n) - f32(df) + f32(0.5)) / (f32(df) + f32(0.5))))) * f32(1.9)
            for d, f in postings[t].items():
                f = f32(f)
                nl = f32(doc_len[d]) / avg
                scores[d] = scores[d] + idf * (
                    f / (f + f32(0.9) * (f32(1.0) - f32(0.4) + f32(0.4) * nl)))
        items = [(d, s) for d, s in scores.items() if s > 0]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]

    return topk


@pytest.fixture(scope="module")
def oracle_results(index, queries):
    out = topk_search(index, queries, k=K, algorithm="ranked_or",
                      range_span=128).toPandas()
    return {
        q: [(r.doc_id, r.score) for r in g.sort_values("rank").itertuples()]
        for q, g in out.groupby("qid")
    }


@pytest.mark.parametrize("algorithm", ["maxscore", "block_max_wand"])
def test_pruned_matches_exhaustive_exactly(index, queries, oracle_results,
                                           algorithm):
    out = topk_search(index, queries, k=K, algorithm=algorithm,
                      range_span=128).toPandas()
    got = {
        q: [(r.doc_id, r.score) for r in g.sort_values("rank").itertuples()]
        for q, g in out.groupby("qid")
    }
    assert set(got) == set(oracle_results)
    for q in oracle_results:
        assert got[q] == oracle_results[q], f"query {q}"


def test_oracle_matches_pure_python(index, oracle_results, queries, pyref):
    cfg = IndexConfig()
    qmap = collections.defaultdict(list)
    for qid, term, w in analyze_query_terms(queries, cfg):
        qmap[qid].append((term, w))
    # internal doc_ids are url-rank MONOTONE but not dense (span-aligned
    # bucket seams leave id holes); map to the pyref's dense url ranks
    ids = sorted(int(r["doc_id"])
                 for r in index.docs.select("doc_id").collect())
    rank_of = {d: i for i, d in enumerate(ids)}
    answered = 0
    for q, got in oracle_results.items():
        got = [(rank_of[d], s) for d, s in got]
        ref = pyref(qmap[q])
        assert [d for d, _ in ref] == [d for d, _ in got], f"query {q}"
        for (d1, s1), (d2, s2) in zip(ref, got):
            assert abs(s1 - s2) <= 1e-6 * max(abs(s1), 1.0)
        answered += 1
    assert answered > N_QUERIES // 2


def test_unknown_only_query_returns_nothing(index):
    out = topk_search(index, ["Q0:zzzunknownterm qqqmissing"], k=K).toPandas()
    assert len(out) == 0


def test_threshold_seeding_rank_safe(index, queries, oracle_results):
    # seed each query with its true k-th score (reference tools/thresholds.cpp)
    thresholds = {q: float(res[-1][1]) for q, res in oracle_results.items()
                  if len(res) == K}
    out = topk_search(index, queries, k=K, algorithm="maxscore",
                      range_span=128, thresholds=thresholds).toPandas()
    got = {
        q: [(r.doc_id, r.score) for r in g.sort_values("rank").itertuples()]
        for q, g in out.groupby("qid")
    }
    for q in oracle_results:
        assert got[q] == oracle_results[q], f"query {q}"


def test_weighted_query_doubles_duplicate_term(index, spark):
    # a query with a duplicated term gets weight 2 for it; in weighted mode
    # its contribution doubles (reference cursor/scored_cursor.hpp:10-17)
    qs = ["Qw:term0000 term0000"]
    plain = topk_search(index, qs, k=5, weighted=False).toPandas()
    weighted = topk_search(index, qs, k=5, weighted=True).toPandas()
    if len(plain) and len(weighted):
        p = plain.sort_values("rank").iloc[0]
        w = weighted.sort_values("rank").iloc[0]
        assert w.doc_id == p.doc_id
        assert np.isclose(w.score, 2 * p.score, rtol=1e-6)


def test_trec_output_format(index):
    res = topk_search(index, ["Q1:term0000"], k=3)
    lines = [r.line for r in trec_output(res).collect()]
    assert len(lines) <= 3
    for line in lines:
        parts = line.split(" ")
        assert parts[0] == "Q1" and parts[1] == "Q0"
        assert parts[2].startswith("https://")
        float(parts[4])


def test_batch_executor_identity(index, queries):
    """topk_search_batch (shard-partitioned, queries broadcast) returns
    exactly what the join executor returns, for every algorithm."""
    from pisa_spark.operators.topk import topk_search_batch

    def key(rows):
        return sorted((r.qid, r.rank, r.doc_id, round(float(r.score), 6))
                      for r in rows)

    for alg in ("ranked_or", "maxscore", "block_max_wand", "wand",
                "ranked_and"):
        a = key(topk_search(index, queries, k=K, algorithm=alg,
                            with_urls=False).collect())
        b = key(topk_search_batch(index, queries, k=K,
                                  algorithm=alg).collect())
        assert a == b, alg


def test_batch_executor_skips_posting_prefetch(index, queries):
    """A batch-only workload must not pay the interactive serve path's
    whole-index posting fetch: its kernels run executor-side and never
    read the driver row cache — it only needs the lexicon/shard metadata.
    The prefetch then runs lazily on the first interactive-serve call."""
    from pisa_spark.operators.topk import topk_search_batch

    if hasattr(index, "_serve_state"):
        del index._serve_state
    topk_search_batch(index, queries, k=K).collect()
    st = index._serve_state
    assert st is not None and st is not False  # metadata built...
    assert not st.complete and not st.rows_by_term  # ...no posting bytes
    topk_search(index, queries[:1], k=K, with_urls=False).collect()
    assert st.complete  # first serve call prefetched
    del index._serve_state


def test_serve_path_decline_and_eviction(index, queries, monkeypatch):
    """The serve plan must (a) decline and fall back to the distributed
    join plan when the index exceeds its driver-memory bounds, and (b)
    return identical rankings under a tiny posting-cache budget that
    forces FIFO eviction between calls."""
    from pisa_spark.operators import topk as T

    def key(rows):
        return sorted((r.qid, r.rank, r.doc_id, round(float(r.score), 6))
                      for r in rows)

    baseline = key(T.topk_search(index, queries, k=K,
                                 algorithm="block_max_wand",
                                 with_urls=False).collect())
    # (a) bounds exceeded -> serve declines, distributed plan answers
    monkeypatch.setattr(T, "SERVE_MAX_DOCS", 0)
    if hasattr(index, "_serve_state"):
        del index._serve_state
    declined = key(T.topk_search(index, queries, k=K,
                                 algorithm="block_max_wand",
                                 with_urls=False).collect())
    assert declined == baseline
    monkeypatch.undo()
    # (b) tiny cache budget: alternating term sets force FIFO eviction of
    # the other set's terms on every call; rankings must not change
    qa, qb = queries[: len(queries) // 2], queries[len(queries) // 2:]
    base_a = key(T.topk_search(index, qa, k=K, algorithm="block_max_wand",
                               with_urls=False).collect())
    base_b = key(T.topk_search(index, qb, k=K, algorithm="block_max_wand",
                               with_urls=False).collect())
    monkeypatch.setattr(T, "SERVE_CACHE_MAX_POSTINGS", 1)
    if hasattr(index, "_serve_state"):
        del index._serve_state
    for _ in range(2):
        got_a = key(T.topk_search(index, qa, k=K,
                                  algorithm="block_max_wand",
                                  with_urls=False).collect())
        got_b = key(T.topk_search(index, qb, k=K,
                                  algorithm="block_max_wand",
                                  with_urls=False).collect())
        assert got_a == base_a and got_b == base_b
    if hasattr(index, "_serve_state"):
        del index._serve_state


@pytest.mark.parametrize("variant", [
    {"codec": "bp128"},
    {"codec": "opt"},
    {"codec": "s8b"},
    {"codec": "s16"},
    {"codec": "qmx"},
    {"block_partition": "variable"},
    {"codec": "bp128", "block_partition": "variable"},
])
def test_layout_variants_rank_identity(spark, corpus, queries,
                                       oracle_results, variant):
    """Physical-layout variants (bitpacked blocks, VBMW variable blocks)
    must be result-invariant — the reference's encodings.sh property
    (all 14 codecs produce identical rankings)."""
    cfg = IndexConfig(shard_span=64, **variant)
    idx = build_index(extract_pages(spark.createDataFrame(corpus), cfg), cfg)
    out = topk_search(idx, queries, k=K, algorithm="block_max_wand",
                      range_span=128).toPandas()
    got = {
        q: [(r.doc_id, r.score) for r in g.sort_values("rank").itertuples()]
        for q, g in out.groupby("qid")
    }
    assert set(got) == set(oracle_results)
    for q in oracle_results:
        assert got[q] == oracle_results[q], f"query {q} variant {variant}"


def test_reference_algorithm_names_resolve(index, queries, oracle_results):
    """Every reference CLI algorithm string must resolve and stay
    rank-identical (block_max_maxscore is now a real kernel with per-doc
    block-refined non-essential bounds; taat aliases fold into ranked_or)."""
    for name in ("block_max_maxscore", "ranked_or_taat", "ranked_or_taat_lazy"):
        out = topk_search(index, queries[:8], k=K, algorithm=name,
                          range_span=128).toPandas()
        got = {
            q: [(r.doc_id, r.score) for r in g.sort_values("rank").itertuples()]
            for q, g in out.groupby("qid")
        }
        for q in got:
            assert got[q] == oracle_results[q], (name, q)


def test_block_max_maxscore_prunes_at_least_as_tight(index, queries):
    """The per-doc block-refined non-essential bound (reference
    block_max_maxscore_query.hpp:10-101) must never score MORE docs than
    plain maxscore's range-granular bound, and ranking stays identical
    (the previous test). Counters via profile_queries."""
    from pyspark.sql import functions as F

    from pisa_spark.operators.topk import profile_queries

    per_alg = {}
    for name in ("maxscore", "block_max_maxscore"):
        prof = (profile_queries(index, queries[:8], k=K, algorithm=name,
                                range_span=128)
                .agg(F.sum("docs_scored")).collect()[0][0])
        per_alg[name] = int(prof)
    assert per_alg["block_max_maxscore"] <= per_alg["maxscore"]


def test_serve_prefetch_whole_index(index, queries):
    """Small indexes load every posting row into the serve cache at state
    build (the reference loads/mmaps the full index before serving,
    tools/queries.cpp:279-340): first-seen terms must already be resident
    — no per-query fetch job — and rankings stay identical."""
    from pisa_spark.operators import topk as T

    if hasattr(index, "_serve_state"):
        del index._serve_state

    def key(rows):
        return sorted((r.qid, r.rank, r.doc_id, round(float(r.score), 6))
                      for r in rows)

    base = key(T.topk_search(index, queries, k=K,
                             algorithm="block_max_wand",
                             with_urls=False).collect())
    st = index._serve_state
    assert st and st.complete
    assert st.cached_postings == sum(m[1] for m in st.tmeta.values())
    # every lexicon term is resident
    assert set(st.rows_by_term) == set(st.tmeta)
    again = key(T.topk_search(index, queries, k=K,
                              algorithm="block_max_wand",
                              with_urls=False).collect())
    assert again == base
    del index._serve_state


def test_serve_global_run_identity(index, queries):
    """The whole-index traversal (one merged run per term, one kernel per
    query over the global doc space) must rank identically to the
    per-shard kernel loop, for every pruned algorithm."""
    from pisa_spark.operators import topk as T

    if hasattr(index, "_serve_state"):
        del index._serve_state

    def key(rows):
        return sorted((r.qid, r.rank, r.doc_id, round(float(r.score), 6))
                      for r in rows)

    for alg in ("block_max_wand", "maxscore", "block_max_maxscore",
                "ranked_and"):
        g = key(T.topk_search(index, queries, k=K, algorithm=alg,
                              with_urls=False).collect())
        st = index._serve_state
        assert st.global_doc_lens is not None  # global path engaged
        saved = st.global_doc_lens
        st.global_doc_lens = None              # force per-shard loop
        try:
            p = key(T.topk_search(index, queries, k=K, algorithm=alg,
                                  with_urls=False).collect())
        finally:
            st.global_doc_lens = saved
        assert g == p, alg
    del index._serve_state


def test_batch_executor_join_fallback_identity(index, queries, monkeypatch):
    """topk_search_batch's join-based plan (used for DataFrame query sets
    and indexes above the driver serve bounds) returns exactly what the
    serve-state fast path returns."""
    from pisa_spark.operators import topk as T

    def key(rows):
        return sorted((r.qid, r.rank, r.doc_id, round(float(r.score), 6))
                      for r in rows)

    fast = key(T.topk_search_batch(index, queries, k=K,
                                   algorithm="block_max_wand").collect())
    monkeypatch.setattr(T, "SERVE_MAX_DOCS", 0)
    if hasattr(index, "_serve_state"):
        del index._serve_state
    fallback = key(T.topk_search_batch(index, queries, k=K,
                                       algorithm="block_max_wand").collect())
    assert fallback == fast
    monkeypatch.undo()
    if hasattr(index, "_serve_state"):
        del index._serve_state
