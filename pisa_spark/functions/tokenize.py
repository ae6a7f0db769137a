"""Tokenizers and token filters.

Reference semantics (reference src/tokenizer.cpp, src/token_filter.cpp):

- WhitespaceTokenizer: split on runs of isspace (src/tokenizer.cpp:31-41).
- EnglishTokenizer: a first-match-wins lexer over three token classes
  (src/tokenizer.cpp:70-78; "parsing process takes the first match from
  left to right"):
      1. abbreviation  ([a-zA-Z]+\\.){2,}      -> periods removed
      2. possessive    [a-zA-Z0-9]+'[a-zA-Z]+  -> keep prefix before '
      3. term          [a-zA-Z0-9]+            -> as-is
  everything else is dropped. Python re alternation is also ordered
  first-match at each position, so one alternation regex reproduces the
  lexer exactly.
- LowercaseFilter (src/token_filter.cpp:41-52), StopWordRemover
  (src/token_filter.cpp:54-71), Porter2 (src/token_filter.cpp:16-27,
  gated here on an optional stemmer library).

The DuckDB-oracle equivalent of the English tokenizer is the same regex via
regexp_extract_all (RE2 is likewise leftmost, alternation-ordered) plus the
same per-class transform — see __spark_entry__.py oracle_sql().

Vectorized entry: tokenize_df() appends an array<string> column using a
pandas UDF (Arrow batches; no per-row Python UDF).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd

from pisa_spark.config import IndexConfig

# Alternation order == reference lexer rule order (src/tokenizer.cpp:72-75).
# Positional groups: abbreviation, possessive, plain term — findall on
# positional groups avoids Match-object + lastgroup overhead per token
# (~1.25x on the hot build kernel).
ENGLISH_TOKEN_RE = re.compile(
    r"((?:[a-zA-Z]+\.){2,})"
    r"|([a-zA-Z0-9]+'[a-zA-Z]+)"
    r"|([a-zA-Z0-9]+)"
)

_WS_RE = re.compile(r"\S+")


def english_tokens(text: str) -> list[str]:
    """EnglishTokenizer incl. per-class transforms (src/tokenizer.cpp:50-64)."""
    return [abbr.replace(".", "") if abbr
            else (poss[:poss.index("'")] if poss else term)
            for abbr, poss, term in ENGLISH_TOKEN_RE.findall(text)]


def whitespace_tokens(text: str) -> list[str]:
    return _WS_RE.findall(text)


_TOKENIZERS = {"english": english_tokens, "whitespace": whitespace_tokens}


def _porter2():
    try:
        import Stemmer  # PyStemmer

        stemmer = Stemmer.Stemmer("english")
        return lambda toks: stemmer.stemWords(toks)
    except ImportError:
        pass
    try:
        import snowballstemmer

        stemmer = snowballstemmer.stemmer("english")
        return stemmer.stemWords
    except ImportError:
        # pure-python fallback implementing the same published algorithm
        from pisa_spark.functions.stemmer import stem_words

        return stem_words


def make_analyzer(cfg: IndexConfig):
    """Build text -> list[str] analyzer: tokenizer + token-filter chain.

    Mirrors the reference TextAnalyzer composition (src/text_analyzer.cpp:43-53).
    """
    tokenize = _TOKENIZERS[cfg.tokenizer]
    if cfg.stemmer == "porter2":
        stem = _porter2()
    elif cfg.stemmer == "krovetz":
        from pisa_spark.functions.kstem import KrovetzStemmer

        _kstem = KrovetzStemmer(cfg.kstem_lexicon).stem
        stem = lambda toks: [_kstem(t) for t in toks]  # noqa: E731
    elif cfg.stemmer is None:
        stem = None
    else:
        raise ValueError(f"unknown stemmer {cfg.stemmer!r}")
    stopwords = cfg.stopwords

    def analyze(text: str) -> list[str]:
        toks = tokenize(text)
        if cfg.lowercase:
            toks = [t.lower() for t in toks]
        if stopwords:
            toks = [t for t in toks if t not in stopwords]
        if stem is not None:
            toks = list(stem(toks))
        return toks

    return analyze


def tokens_batch(texts: pd.Series, cfg: IndexConfig) -> pd.Series:
    analyze = make_analyzer(cfg)
    return texts.map(lambda t: analyze(t) if t is not None else [])


def tokenize_df(df, text_col: str = "text", out_col: str = "terms",
                cfg: IndexConfig | None = None):
    """Append an array<string> token column (Arrow-batched pandas UDF)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cfg = cfg or IndexConfig()

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        return tokens_batch(texts, cfg)

    return df.withColumn(out_col, _tok(F.col(text_col)))


def analyze_query_terms(queries: Iterable[str], cfg: IndexConfig):
    """Parse query lines (optional 'qid:' prefix) with the SAME analyzer as
    indexing (reference src/query/query_parser.cpp:28-44). Returns rows
    (qid, term, weight) where weight = occurrence count of the term in the
    query (reference src/query.cpp:45-82 dedup policy)."""
    analyze = make_analyzer(cfg)
    rows = []
    for i, line in enumerate(queries):
        line = line.strip()
        if not line:
            continue
        if ":" in line.split(" ", 1)[0]:
            qid, _, rest = line.partition(":")
        else:
            qid, rest = str(i), line
        counts: dict[str, int] = {}
        for t in analyze(rest):
            counts[t] = counts.get(t, 0) + 1
        for term, w in counts.items():
            rows.append((qid, term, float(w)))
    return rows
