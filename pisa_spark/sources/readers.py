"""Record readers for the reference's collection formats (§2.1 of SURVEY.md).

The webtext graft's primary input is the Iceberg-shaped web_pages table
(sources/webtext.py), but the reference also ingests plaintext and jsonl
record streams (src/parser.cpp:55-79); these readers map them onto the same
(url, text) document-record shape (document_record.hpp:9-23: title is the
unique document identifier).

trecweb/trectext/warc/wapo record streams (src/parser.cpp:83-183) are also
supported: records are split JVM-side with a multi-character `lineSep`
(one text-scan task per HDFS split, no Python in the loop) and parsed with
Column regexes, so every reader is a plain distributed DataFrame scan.
Each returns (url, title, text): `title` is the reference's document key
(DOCNO / WARC-TREC-ID / wapo id; document_record.hpp:9-23) and `url`
falls back to it when the stream carries no real url, matching the
engine's url-keyed corpus shape.
"""

from __future__ import annotations

WEB_PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def load_web_pages(spark, source: str, langs: list[str] | None = None,
                   columns: tuple[str, ...] = WEB_PAGES_COLUMNS):
    """Load the engine's primary input — the Iceberg table of
    Common-Crawl-style web pages (url string, warc_ts timestamp,
    html binary, text string, lang string) — from a catalog table name
    or a parquet path.

    `source` containing a path separator (or `.parquet`) reads parquet;
    anything else resolves through the session catalog
    (`spark.read.table`), which is how an Iceberg table is addressed once
    its catalog is configured on the cluster (spark.sql.catalog.* confs —
    no engine-side code depends on the format). Either way the result is
    a plain DataFrame scan: the `columns` projection prunes the scan to
    the needed columns and a `langs` filter is a pushable predicate, so
    Iceberg/parquet do partition pruning + row-group skipping before any
    engine operator runs.
    """
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in ("url",) if c not in df.columns]
    if missing or not ({"html", "text"} & set(df.columns)):
        raise ValueError(
            f"{source}: need url plus html or text; has {df.columns}")
    df = df.select(*[c for c in columns if c in df.columns])
    if langs is not None and "lang" in df.columns:
        df = df.filter(df.lang.isin(list(langs)))
    return df


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


def _split_records(spark, path: str, delimiter: str):
    """Distributed record split: the text source's multi-character lineSep
    plays the role of the reference's per-record stream readers
    (src/parser.cpp:68-80 record_parser) — each HDFS split yields its own
    records, so parsing scales with input size like any other scan."""
    return spark.read.option("lineSep", delimiter).text(path)


def read_trectext(spark, path: str):
    """TREC SGML text records: <DOC> blocks with <DOCNO>id</DOCNO> and one
    or more <TEXT>...</TEXT> sections whose concatenation is the content
    (trec_record_parser, src/parser.cpp:31-53,83-85; the trecpp text
    format). Records without a DOCNO are skipped, like the reference's
    skip-invalid-record path."""
    from pyspark.sql import functions as F

    recs = _split_records(spark, path, "<DOC>")
    docno = F.trim(F.regexp_extract(
        "value", r"(?s)<DOCNO>(.*?)</DOCNO>", 1))
    text = F.array_join(F.regexp_extract_all(
        "value", F.lit(r"(?s)<TEXT>(.*?)</TEXT>"), F.lit(1)), "\n")
    return (recs
            .select(docno.alias("title"), text.alias("text"))
            .filter(F.length("title") > 0)
            .select(F.col("title").alias("url"), "title", "text"))


def read_trecweb(spark, path: str):
    """TREC web records: <DOC> blocks carrying <DOCNO>, a <DOCHDR> whose
    first line is the crawled URL, and the raw page after </DOCHDR>
    (src/parser.cpp:86-109; the trecpp web format). The page keeps its
    HTTP headers — StripHtmlFilter/HTTP-strip downstream handle them the
    same way the reference's parse_html_content does."""
    from pyspark.sql import functions as F

    recs = _split_records(spark, path, "<DOC>")
    docno = F.trim(F.regexp_extract(
        "value", r"(?s)<DOCNO>(.*?)</DOCNO>", 1))
    dochdr = F.regexp_extract("value", r"(?s)<DOCHDR>\s*(.*?)</DOCHDR>", 1)
    url = F.trim(F.get(F.split(dochdr, r"[\r\n]+", 2), 0))
    # F.trim strips spaces only — records are newline-framed, so trim all
    # whitespace around the page body with a regex
    body = F.regexp_replace(
        F.regexp_extract("value", r"(?s)</DOCHDR>(.*?)</DOC>", 1),
        r"(?s)^\s+|\s+$", "")
    return (recs
            .select(docno.alias("title"), url.alias("url"),
                    body.alias("text"))
            .filter(F.length("title") > 0)
            .select(F.coalesce(F.nullif("url", F.lit("")),
                               F.col("title")).alias("url"),
                    "title", "text"))


def read_warc(spark, path: str):
    """WARC (ISO 28500) response records: WARC/x.y header block, blank
    line, then the captured HTTP response. Mirrors src/parser.cpp:110-145:
    keep only WARC-Type: response records, key on WARC-TREC-ID when
    present else WARC-Record-ID, url from WARC-Target-URI; everything
    after the WARC header block (HTTP headers included) is the content.
    Records are delimited by the mandatory blank line + next version
    marker, so gzip-unaware plain .warc files split distributedly."""
    from pyspark.sql import functions as F

    recs = _split_records(spark, path, "\r\n\r\nWARC/")
    # value = "<version>\r\n<warc headers>\r\n\r\n<http response...>"
    # (the first record keeps its "WARC/" prefix; later ones start at the
    # version digits — the header regexes are anchored per line either way)
    warc_hdr = F.get(F.split("value", r"\r\n\r\n", 2), 0)
    field = lambda name: F.trim(F.regexp_extract(  # noqa: E731
        warc_hdr, rf"(?mi)^{name}:\s*(.*?)\s*$", 1))
    rest = F.coalesce(F.get(F.split("value", r"\r\n\r\n", 2), 1), F.lit(""))
    return (recs
            .filter(F.lower(field("WARC-Type")) == "response")
            .select(
                F.regexp_replace(field("WARC-Target-URI"), r"^<|>$", "")
                 .alias("target_uri"),
                F.coalesce(
                    F.nullif(field("WARC-TREC-ID"), F.lit("")),
                    F.regexp_replace(field("WARC-Record-ID"), r"^<|>$", ""))
                 .alias("title"),
                rest.alias("text"))
            .filter(F.length("title") > 0)
            .select(F.coalesce(F.nullif("target_uri", F.lit("")),
                               F.col("title")).alias("url"),
                    "title", "text"))


def read_wapo(spark, path: str):
    """Washington Post collection (JSONL): one article per line with `id`,
    `article_url` and a heterogeneous `contents` array; the document text
    is the space-joined concatenation of kicker/title/byline/text
    contents, author name + bio, and image caption + blurb, in stream
    order — the exact field set src/parser.cpp:146-183 appends. Pure
    Column aggregation over the parsed array (no Python per record)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    content_t = T.StructType([
        T.StructField("type", T.StringType(), True),
        T.StructField("subtype", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("bio", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("blurb", T.StringType(), True),
    ])
    schema = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("article_url", T.StringType(), True),
        T.StructField("contents", T.ArrayType(content_t), True),
    ])
    df = spark.read.schema(schema).json(path).filter(F.col("id").isNotNull())

    def piece(c):
        blank = F.lit("")
        txt = F.when(
            c["type"].isin("kicker", "title", "byline", "text",
                           "sanitized_html"),
            F.concat(F.lit(" "), F.coalesce(c["content"], blank)))
        author = F.when(
            c["type"] == "author_info",
            F.concat(F.lit(" "), F.coalesce(c["name"], blank),
                     F.lit(" "), F.coalesce(c["bio"], blank)))
        image = F.when(
            c["type"] == "image",
            F.concat(F.lit(" "), F.coalesce(c["caption"], blank),
                     F.lit(" "), F.coalesce(c["blurb"], blank),
                     F.lit(" ")))
        return F.coalesce(txt, author, image, blank)

    text = F.array_join(
        F.transform(F.coalesce("contents", F.array()), piece), "")
    return df.select(
        F.coalesce(F.nullif("article_url", F.lit("")),
                   F.col("id")).alias("url"),
        F.col("id").alias("title"),
        text.alias("text"))


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
