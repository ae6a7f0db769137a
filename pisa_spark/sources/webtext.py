"""Deterministic synthetic Common-Crawl-style webtext corpus.

Produces the input table shape from FIXTURES.md / BASELINE.json input_hint:

    web_pages(url string, warc_ts timestamp, html binary, text string,
              lang string)

`text` is the ground-truth extraction of `html` under the reference
extractor's semantics (src/text_filter.cpp:14-45): the generator builds the
HTML around known text pieces whose join-rule outcome is derivable by
construction, so `functions.text.strip_html` must reproduce `text`
byte-identically. The corpus exercises:

- <script>/<style> content that must NOT leak into the text;
- empty inline elements and whitespace-only text nodes (no double spaces);
- HTML entities (&amp; etc.) decoded in text nodes;
- English-lexer edge tokens: abbreviations (U.S.A.), possessives (dog's),
  mixed case, digits, punctuation-only junk;
- Zipf-distributed vocabulary plus stopword-grade heavy hitters in ~every
  document (the skew-splitting test from FIXTURES.md);
- a "broken" page per ~BROKEN_EVERY docs with >= 1000 parse errors that must
  extract to the empty string;
- a few non-"en" rows for language filtering.

Everything is keyed on (seed, doc index) so output is identical regardless
of Spark partitioning, and generation runs distributed via mapInPandas for
benchmark-scale corpora.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

VOCAB_SIZE = 2000
STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"]
SPECIALS = ["U.S.A.", "dog's", "O'Neill", "MiXeD", "x86", "e.g.", "--", "42"]
BROKEN_EVERY = 97
NON_EN_EVERY = 53
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

WEB_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _vocab() -> list[str]:
    return [f"term{i:04d}" for i in range(VOCAB_SIZE)]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


_VOCAB = _vocab()
_PROBS = _zipf_probs(VOCAB_SIZE)


def _doc_tokens(rng: np.random.Generator, i: int) -> list[str]:
    n = int(rng.integers(40, 200))
    body = [_VOCAB[j] for j in rng.choice(VOCAB_SIZE, size=n, p=_PROBS)]
    # stopword-grade heavy hitters in ~every doc (skew test)
    n_stop = int(rng.integers(5, 15))
    for _ in range(n_stop):
        body.insert(int(rng.integers(0, len(body) + 1)), STOPWORDS[int(rng.integers(0, len(STOPWORDS)))])
    # sprinkle lexer-edge specials deterministically
    if i % 7 == 0:
        body.insert(int(rng.integers(0, len(body) + 1)), SPECIALS[i % len(SPECIALS)])
    return body


def _sentences(tokens: list[str], rng: np.random.Generator) -> list[str]:
    out, i = [], 0
    while i < len(tokens):
        ln = int(rng.integers(6, 14))
        out.append(" ".join(tokens[i:i + ln]) + ".")
        i += ln
    return out


def _make_page(i: int, seed: int) -> tuple[str, dt.datetime, bytes, str, str]:
    url = f"https://site{i % 37:02d}.example/p/{i:010d}"
    ts = EPOCH + dt.timedelta(seconds=i * 7)
    rng = np.random.default_rng(np.random.SeedSequence([seed, i]))

    if i % BROKEN_EVERY == 96:
        # >=1000 bare '&' parse errors -> extractor must return ""
        html = "<html><body><p>junk " + ("& " * 1100) + "</p></body></html>"
        return url, ts, html.encode(), "", "en"

    lang = "xx" if i % NON_EN_EVERY == 52 else "en"
    title = f"Page {i} site{i % 37:02d}"
    tokens = _doc_tokens(rng, i)
    sents = _sentences(tokens, rng)

    parts: list[str] = []          # html body fragments
    texts: list[str] = []          # their ground-truth extractions, in order
    for j, s in enumerate(sents):
        esc = s.replace("&", "&amp;").replace("<", "&lt;")
        if j % 5 == 4 and " " in s:
            # structured paragraph: <div>A<span>B</span><span></span>C</div>
            # join rule => "A B C" (empty span contributes nothing, no space)
            a, b = s.split(" ", 1)
            parts.append(f"<div>{a}<span>{b}</span><span></span></div>")
            texts.append(f"{a} {b}")
        elif j % 5 == 2:
            # whitespace-only text node between inline elements => single space
            parts.append(f"<p><b>{esc}</b> <i>ok</i></p>")
            texts.append(f"{s} ok")
        else:
            parts.append(f"<p>{esc}</p>")
            texts.append(s)

    html = (
        "<html><head><title>" + title + "</title>"
        "<script>var x = 1; if (x &lt; 2) { junk(); }</script>"
        "<style>.c { margin: 0; }</style></head>\n<body>\n"
        + "\n".join(parts)
        + "\n</body></html>"
    )
    # reference join rule: title joins body paragraphs with single spaces;
    # whitespace-only nodes between <p> blocks contribute nothing.
    text = " ".join([title] + texts)
    return url, ts, html.encode(), text, lang


def generate_pandas(n_docs: int, seed: int = 13, start: int = 0) -> pd.DataFrame:
    rows = [_make_page(i, seed) for i in range(start, start + n_docs)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate(spark, n_docs: int, seed: int = 13, partitions: int | None = None):
    """Distributed deterministic generation: one row per doc index."""
    from pyspark.sql import functions as F

    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_make_page(int(i), seed) for i in ids]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, schema=WEB_PAGES_SCHEMA)


def generate_clustered(spark, n_docs: int, n_clusters: int = 16,
                       seed: int = 17, vocab_per_cluster: int = 120,
                       partitions: int | None = None):
    """(url, text) corpus of topical clusters with disjoint content
    vocabularies where the URL carries NO topical signal (keyed on a
    multiplicative hash of the doc index). On this shape URL ordering is
    equivalent to random for gap compression, while recursive graph
    bisection can rediscover the clusters and co-locate their docIDs —
    the corpus the BP-vs-URL layout comparison needs (the i.i.d. main
    corpus cannot show a BP win; docs/src/guide/reordering.md:46-66)."""
    from pyspark.sql import functions as F  # noqa: F401

    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)
    probs = _zipf_probs(vocab_per_cluster)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
                c = i % n_clusters
                n = int(rng.integers(30, 80))
                toks = [f"c{c:02d}t{j:03d}"
                        for j in rng.choice(vocab_per_cluster, size=n, p=probs)]
                for _ in range(int(rng.integers(2, 6))):
                    toks.insert(int(rng.integers(0, len(toks) + 1)),
                                STOPWORDS[int(rng.integers(0, len(STOPWORDS)))])
                url = f"https://x{(i * 2654435761) % (1 << 32):08x}.example/{i}"
                rows.append((url, " ".join(toks)))
            yield pd.DataFrame(rows, columns=["url", "text"])

    return base.mapInPandas(gen, schema="url string, text string")


def synth_queries(n_queries: int = 100, seed: int = 29) -> list[str]:
    """Reference-style query lines 'Qi:term term ...' (FIXTURES.md §2):
    1-6 terms sampled across the df spectrum, with duplicate-term queries
    (weight accumulation), unknown terms (dropped), and all-stopword
    queries."""
    rng = np.random.default_rng(seed)
    lines = []
    for q in range(n_queries):
        if q % 17 == 16:
            terms = list(rng.choice(STOPWORDS, size=3))
        else:
            n = int(rng.integers(1, 7))
            ranks = np.minimum(
                rng.zipf(1.3, size=n) - 1, VOCAB_SIZE - 1
            )
            terms = [_VOCAB[r] for r in ranks]
            if q % 11 == 10:
                terms.append(terms[0])          # duplicate -> weight 2
            if q % 13 == 12:
                terms.append("zzzunknownterm")  # dropped with warning
        lines.append(f"Q{q}:" + " ".join(terms))
    return lines
