"""Formula pins for the pure-DataFrame PL2/DPH oracle paths.

The DataFrame paths (operators/topk.py pl2_topk_dataframe /
dph_topk_dataframe) are the double-precision cross-engine oracles the
driver compares against DuckDB twins; this test pins their arithmetic to
an independent numpy float64 recomputation of the reference formulas
(scorer/pl2.hpp:25-40, scorer/dph.hpp:21-36) so a drift in either the
Spark expression or the SQL twin is caught locally, not only at driver
time.
"""

import math
from collections import Counter

import pytest

from pisa_spark.config import IndexConfig
from pisa_spark.functions.tokenize import analyze_query_terms, tokens_batch
from pisa_spark.operators.topk import (dph_topk_dataframe,
                                       pl2_topk_dataframe)
from pisa_spark.sources import webtext

N_DOCS = 120
QUERIES = webtext.synth_queries(5, seed=31)


@pytest.fixture(scope="module")
def corpus():
    pdf = webtext.generate_pandas(N_DOCS, seed=13)
    pdf = pdf[["url", "text"]].copy()
    pdf["doc_id"] = range(len(pdf))
    toks = tokens_batch(pdf["text"], IndexConfig())
    docs = {int(i): list(t) for i, t in zip(pdf["doc_id"], toks)}
    return pdf, docs


def _collection_stats(docs):
    dl = {d: len(t) for d, t in docs.items() if t}
    cf = Counter()
    for t in docs.values():
        cf.update(t)
    n = len(docs)
    avg = sum(dl.values()) / n
    return dl, cf, n, avg


def _expected(docs, queries, scorer):
    dl, cf, n, avg = _collection_stats(docs)
    qterms = {}
    for qid, term, _ in analyze_query_terms(queries, IndexConfig()):
        qterms.setdefault(qid, set()).add(term)
    out = {}
    for qid, terms in qterms.items():
        scores = {}
        for d, toks in docs.items():
            tfc = Counter(toks)
            s = 0.0
            for term in terms:
                tf = tfc.get(term, 0)
                if not tf:
                    continue
                if scorer == "pl2":
                    tfn = tf * math.log2(1.0 + avg / dl[d])
                    f = cf[term] / n
                    e = math.log(0.5)
                    s += (1.0 / (tfn + 1.0)) * (
                        tfn * math.log2(1.0 / f) + f * e
                        + 0.5 * math.log2(2.0 * math.pi * tfn)
                        + tfn * (math.log2(tfn) - e))
                else:  # dph
                    fr = tf / dl[d]
                    norm = (1.0 - fr) * (1.0 - fr) / (tf + 1.0)
                    s += norm * (
                        tf * math.log2((tf * avg / dl[d]) * (n / cf[term]))
                        + 0.5 * math.log2(2.0 * math.pi * tf * (1.0 - fr)))
            if s:
                scores[d] = s
        out[qid] = scores
    return out


@pytest.mark.parametrize("scorer", ["pl2", "dph"])
def test_dataframe_scorer_matches_numpy_float64(spark, corpus, scorer):
    pdf, docs = corpus
    sdf = spark.createDataFrame(pdf)
    fn = pl2_topk_dataframe if scorer == "pl2" else dph_topk_dataframe
    got = fn(sdf, QUERIES, k=10, id_col="doc_id").collect()
    assert got, "no results"
    exp = _expected(docs, QUERIES, scorer)
    for r in got:
        want = exp[r.qid][r.doc_id]
        assert abs(float(r.score) - want) < 5e-6, (
            f"{scorer} {r.qid}/{r.doc_id}: {r.score} vs {want}")
    # ranks are dense 1..k per qid, ordered by score desc then doc_id
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-float(r.score), r.doc_id) for r in rows]
        assert keys == sorted(keys)
