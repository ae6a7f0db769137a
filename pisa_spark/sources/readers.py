"""Record readers for the reference's collection formats (§2.1 of SURVEY.md).

The webtext graft's primary input is the Iceberg-shaped web_pages table
(sources/webtext.py), but the reference also ingests plaintext and jsonl
record streams (src/parser.cpp:55-79); these readers map them onto the same
(url, text) document-record shape (document_record.hpp:9-23: title is the
unique document identifier).

trecweb/trectext/warc/wapo parsers are out of scope for the webtext graft
(the Iceberg table already carries per-url html/text) — see SURVEY §2.1.
"""

from __future__ import annotations


def read_plaintext(spark, path: str):
    """One document per line: `title content...` (src/parser.cpp:69-79,
    document_record.hpp:25-43). Title doubles as the url/doc key."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\s+", 2)
    return lines.select(
        F.get(parts, 0).alias("url"),
        F.coalesce(F.get(parts, 1), F.lit("")).alias("text"),
    ).filter(F.length("url") > 0)


def read_jsonl(spark, path: str):
    """{"title": ..., "content": ..., "url"?: ...} per line
    (parse_jsonl_record, src/parser.cpp:55-65). Explicit schema — no
    inference (the engine's schema system is fixed, SURVEY §1)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("title", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ])
    df = spark.read.schema(schema).json(path)
    return df.select(
        F.coalesce(F.col("url"), F.col("title")).alias("url"),
        F.coalesce(F.col("content"), F.lit("")).alias("text"),
    )


def read_queries(path: str) -> list[str]:
    """Query file: one query per line, optional `qid:` prefix
    (docs/src/guide/querying.md:3-14)."""
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def parse_trec_topics(text: str, field: str = "title") -> list[str]:
    """TREC topic file -> `qid:text` query lines (the extract_topics tool;
    reference test/test_trec_topic_reader.cpp format: <top> blocks with
    <num> Number: N and <title>/<desc>/<narr> fields)."""
    import re

    out = []
    for block in re.split(r"<top>", text):
        num = re.search(r"<num>\s*(?:Number:)?\s*([^\s<]+)", block)
        if not num:
            continue
        tag = {"title": "title", "desc": "desc", "narrative": "narr"}[field] \
            if field in ("title", "desc", "narrative") else field
        m = re.search(rf"<{tag}>\s*(?:Topic:|Description:|Narrative:)?\s*"
                      rf"(.*?)(?=<(?:title|desc|narr|num|/top)>|\Z)",
                      block, re.S)
        if m:
            q = " ".join(m.group(1).split())
            if q:
                out.append(f"{num.group(1)}:{q}")
    return out


def read_trec_topics(path: str, field: str = "title") -> list[str]:
    with open(path) as f:
        return parse_trec_topics(f.read(), field)
