"""Sharding utilities (partition_fwd_index analogue + Taily selection) and
the record/topic readers (reference src/sharding.cpp, taily_stats.hpp,
src/parser.cpp, test/test_trec_topic_reader.cpp)."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.config import IndexConfig
from pisa_spark.operators.sharding import (partition_collection, taily_select,
                                           taily_shard_stats)
from pisa_spark.plans.build import build_index, extract_pages
from pisa_spark.sources import webtext
from pisa_spark.sources.readers import (parse_trec_topics, read_jsonl,
                                        read_plaintext)


@pytest.fixture(scope="module")
def index(spark):
    cfg = IndexConfig(shard_span=64)
    pages = spark.createDataFrame(webtext.generate_pandas(200, seed=13))
    return build_index(extract_pages(pages, cfg), cfg)


def test_partition_collection_random_stable_and_uniform(spark):
    docs = spark.createDataFrame(
        [(f"u{i:04d}", "x") for i in range(400)], "url string, text string")
    a = partition_collection(docs, 4).collect()
    b = partition_collection(docs, 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded => stable
    counts = {}
    for r in a:
        counts[r["shard"]] = counts.get(r["shard"], 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    assert max(counts.values()) < 2.2 * min(counts.values())


def test_partition_collection_mapping(spark):
    docs = spark.createDataFrame([("a", "x"), ("b", "y")],
                                 "url string, text string")
    mapping = spark.createDataFrame([("a", 7), ("b", 9)],
                                    "url string, shard int")
    got = {r["url"]: r["shard"]
           for r in partition_collection(docs, 2, method="mapping",
                                         mapping=mapping).collect()}
    assert got == {"a": 7, "b": 9}


def test_taily_shard_stats_and_select(spark, index):
    stats = taily_shard_stats(index)
    row = stats.first()
    assert row["any"] > 0 and row["variance"] >= 0
    sel = taily_select(index, ["Q1:the term0001", "Q2:term0002"],
                       n_shards_out=2, shard_stats=stats).collect()
    by_q = {}
    for r in sel:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) <= 2
        assert all(r["mass"] > 0 for r in rows)


def test_load_web_pages(spark, tmp_path):
    """The primary-input loader resolves parquet paths AND catalog table
    names onto the same validated (url, warc_ts, html, text, lang)
    scan, prunes columns, and pushes the lang filter."""
    from pisa_spark.sources import webtext
    from pisa_spark.sources.readers import load_web_pages

    pages = webtext.generate(spark, 120, seed=5)
    p = str(tmp_path / "web_pages.parquet")
    pages.write.parquet(p)

    via_path = load_web_pages(spark, p)
    assert via_path.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert via_path.count() == 120

    pages.createOrReplaceTempView("web_pages_t")
    via_table = load_web_pages(spark, "web_pages_t")
    assert via_table.count() == 120

    en_only = load_web_pages(spark, p, langs=["en"])
    n_en = pages.filter("lang = 'en'").count()
    assert en_only.count() == n_en < 120

    # lang filter reaches the parquet scan (pushed, not post-filtered)
    plan = en_only._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan

    pruned = load_web_pages(spark, p, columns=("url", "text"))
    assert pruned.columns == ["url", "text"]

    bad = pages.select("warc_ts", "lang")
    bad.write.parquet(str(tmp_path / "bad.parquet"))
    with pytest.raises(ValueError, match="need url"):
        load_web_pages(spark, str(tmp_path / "bad.parquet"))


def test_read_plaintext(spark, tmp_path):
    p = tmp_path / "docs.txt"
    p.write_text("D1 hello world\nD2 spark index\nD3\n")
    got = {r["url"]: r["text"] for r in read_plaintext(spark, str(p)).collect()}
    assert got == {"D1": "hello world", "D2": "spark index", "D3": ""}


def test_read_jsonl(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"title": "T1", "content": "abc"}\n'
                 '{"title": "T2", "content": "def", "url": "http://x"}\n')
    got = {r["url"]: r["text"] for r in read_jsonl(spark, str(p)).collect()}
    assert got == {"T1": "abc", "http://x": "def"}


def test_parse_trec_topics():
    text = """
<top>
<num> Number: 301
<title> International Organized Crime
<desc> Description:
Identify organizations that participate in international criminal activity.
<narr> Narrative: blah
</top>
<top>
<num> 302
<title>
Poliomyelitis and Post-Polio
</top>
"""
    qs = parse_trec_topics(text)
    assert qs == ["301:International Organized Crime",
                  "302:Poliomyelitis and Post-Polio"]
    descs = parse_trec_topics(text, field="desc")
    assert descs[0].startswith("301:Identify organizations")


# ------------------------------------------------- Taily gamma-tail model

def test_gammaincc_known_values():
    """Q(1,x)=e^-x; Q(k,x) for integer k equals the Poisson CDF sum."""
    import math

    from pisa_spark.functions.gamma import gammaincc

    for x in (0.1, 1.0, 3.0, 10.0):
        assert abs(gammaincc(1.0, x) - math.exp(-x)) < 1e-12
    # Q(3, x) = e^-x (1 + x + x^2/2)
    for x in (0.5, 2.0, 7.0):
        want = math.exp(-x) * (1 + x + x * x / 2)
        assert abs(gammaincc(3.0, x) - want) < 1e-12
    assert gammaincc(2.5, 0.0) == 1.0


def test_gamma_tail_inverse_roundtrip():
    from pisa_spark.functions.gamma import gamma_tail_count, gamma_tail_inverse

    any_c, k, theta = 5000.0, 2.3, 1.7
    for n_c in (1.0, 10.0, 100.0):
        s = gamma_tail_inverse(any_c, k, theta, n_c)
        assert abs(gamma_tail_count(any_c, k, theta, s) - n_c) < 1e-3 * n_c
    # fewer docs than n_c -> threshold 0
    assert gamma_tail_inverse(5.0, k, theta, 10.0) == 0.0


def test_taily_thresholds_and_gamma_select(spark, index):
    from pisa_spark.operators.sharding import (taily_select_gamma,
                                               taily_thresholds)

    queries = webtext.synth_queries(6, seed=29)
    stats = taily_shard_stats(index).persist()
    thr = {r["qid"]: r["threshold"]
           for r in taily_thresholds(index, queries, n_c=10,
                                     shard_stats=stats).collect()}
    thr_loose = {r["qid"]: r["threshold"]
                 for r in taily_thresholds(index, queries, n_c=50,
                                           shard_stats=stats).collect()}
    assert thr
    for qid, t in thr.items():
        assert t >= 0.0
        # deeper rank target => lower (or equal) estimated score cutoff
        assert thr_loose[qid] <= t + 1e-9

    sel = taily_select_gamma(index, queries, n_shards_out=2, n_c=10,
                             shard_stats=stats).collect()
    by_q = {}
    for r in sel:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) <= 2
        assert all(r["est_above"] >= 0.0 for r in rows)
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
    stats.unpersist()


def test_taily_threshold_tracks_truth(spark, index):
    """The gamma estimate of the k-th score should land within a small
    factor of the true k-th BM25 score on conjunctive-ish queries (it is
    an estimator, not a bound — assert order-of-magnitude quality)."""
    from pisa_spark.operators.topk import topk_search
    from pisa_spark.operators.sharding import taily_thresholds

    queries = webtext.synth_queries(6, seed=29)
    true_kth = {r["qid"]: float(r["score"])
                for r in topk_search(index, queries, k=10,
                                     with_urls=False).collect()
                if r["rank"] == 10}
    est = {r["qid"]: float(r["threshold"])
           for r in taily_thresholds(index, queries, n_c=10).collect()}
    checked = 0
    for qid, t in true_kth.items():
        if est.get(qid, 0.0) > 0:
            assert 0.1 * t < est[qid] < 10 * t, (qid, t, est[qid])
            checked += 1
    assert checked >= 2


def test_read_trectext(spark, tmp_path):
    from pisa_spark.sources.readers import read_trectext

    p = tmp_path / "coll.trectext"
    p.write_text(
        "<DOC>\n<DOCNO> WSJ-1 </DOCNO>\n<HL>ignored</HL>\n"
        "<TEXT>\nfirst part\n</TEXT>\n<TEXT>second part</TEXT>\n</DOC>\n"
        "<DOC>\n<DOCNO>WSJ-2</DOCNO>\n<TEXT>only</TEXT>\n</DOC>\n"
        "<DOC>\n<TEXT>no docno: skipped</TEXT>\n</DOC>\n")
    rows = {r["title"]: r for r in read_trectext(spark, str(p)).collect()}
    assert set(rows) == {"WSJ-1", "WSJ-2"}
    assert rows["WSJ-1"]["url"] == "WSJ-1"
    assert "first part" in rows["WSJ-1"]["text"]
    assert "second part" in rows["WSJ-1"]["text"]
    assert rows["WSJ-2"]["text"] == "only"


def test_read_trecweb(spark, tmp_path):
    from pisa_spark.sources.readers import read_trecweb

    p = tmp_path / "coll.trecweb"
    p.write_text(
        "<DOC>\n<DOCNO>GX-1</DOCNO>\n<DOCHDR>\nhttp://a.example/x\n"
        "HTTP/1.1 200 OK\nContent-Type: text/html\n</DOCHDR>\n"
        "<html><body>Alpha page</body></html>\n</DOC>\n"
        "<DOC>\n<DOCNO>GX-2</DOCNO>\n<DOCHDR>\nhttp://b.example/y\n"
        "</DOCHDR>\n<html>Beta</html>\n</DOC>\n")
    rows = {r["title"]: r for r in read_trecweb(spark, str(p)).collect()}
    assert rows["GX-1"]["url"] == "http://a.example/x"
    assert rows["GX-1"]["text"] == "<html><body>Alpha page</body></html>"
    assert rows["GX-2"]["url"] == "http://b.example/y"
    assert rows["GX-2"]["text"] == "<html>Beta</html>"


def test_read_warc(spark, tmp_path):
    from pisa_spark.sources.readers import read_warc

    def rec(wtype, headers, payload):
        head = "".join(h + "\r\n" for h in headers)
        return (f"WARC/1.0\r\nWARC-Type: {wtype}\r\n{head}"
                f"Content-Length: {len(payload)}\r\n\r\n{payload}")

    p = tmp_path / "coll.warc"
    p.write_text(
        rec("warcinfo", [], "software: fake-crawler")
        + "\r\n\r\n"
        + rec("response",
              ["WARC-Target-URI: http://c.example/1",
               "WARC-TREC-ID: clue-0001",
               "WARC-Record-ID: <urn:uuid:aaa>"],
              "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              "<html>Gamma doc</html>")
        + "\r\n\r\n"
        + rec("response",
              ["WARC-Target-URI: http://c.example/2",
               "WARC-Record-ID: <urn:uuid:bbb>"],
              "HTTP/1.1 200 OK\r\n\r\n<html>Delta doc</html>")
        + "\r\n\r\n"
        + rec("request", ["WARC-Record-ID: <urn:uuid:ccc>"],
              "GET /1 HTTP/1.1"))
    rows = sorted(read_warc(spark, str(p)).collect(),
                  key=lambda r: r["url"])
    assert len(rows) == 2  # warcinfo + request records dropped
    assert rows[0]["title"] == "clue-0001"  # TREC id wins over record id
    assert rows[0]["url"] == "http://c.example/1"
    assert rows[0]["text"].startswith("HTTP/1.1 200 OK")
    assert "<html>Gamma doc</html>" in rows[0]["text"]
    assert rows[1]["title"] == "urn:uuid:bbb"  # record-id fallback
    # payload's own blank line (HTTP header/body break) stays intact
    assert "\r\n\r\n<html>Delta doc</html>" in rows[1]["text"]


def test_read_wapo(spark, tmp_path):
    import json as _json

    from pisa_spark.sources.readers import read_wapo

    p = tmp_path / "coll.jl"
    rec1 = {"id": "wp-1", "article_url": "http://wapo/1", "contents": [
        {"type": "kicker", "content": "Opinion"},
        {"type": "title", "content": "Headline here"},
        {"type": "byline", "content": "By Someone"},
        {"type": "sanitized_html", "content": "Body paragraph."},
        {"type": "author_info", "name": "A. Writer", "bio": "Columnist"},
        {"type": "image", "caption": "A photo", "blurb": "blurbed"},
        {"type": "date", "content": None}]}
    rec2 = {"id": "wp-2", "contents": []}
    p.write_text(_json.dumps(rec1) + "\n" + _json.dumps(rec2) + "\n")
    rows = {r["title"]: r for r in read_wapo(spark, str(p)).collect()}
    assert rows["wp-1"]["url"] == "http://wapo/1"
    t = rows["wp-1"]["text"]
    # reference order + separators (src/parser.cpp:158-180)
    assert t == (" Opinion Headline here By Someone Body paragraph."
                 " A. Writer Columnist A photo blurbed ")
    assert rows["wp-2"]["url"] == "wp-2" and rows["wp-2"]["text"] == ""
