"""Text analysis operators for large-scale training-data pipelines.

All of these stay JVM-side (built-in functions + higher-order lambdas, no
Python in the hot path) so they whole-stage-codegen and scale linearly:

- english_tokens_col: the reference English lexer (src/tokenizer.cpp:70-78)
  as a native Column expression — same regex alternation and per-class
  transforms as functions/tokenize.py, for SQL-oracle-comparable operators.
- token_stats / language_id / quality_score / fingerprint: the
  length/stopword/punctuation heuristics a webtext curation pipeline runs
  before indexing or training.

Each has an equivalent ANSI-SQL form (DuckDB) in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Same alternation as functions/tokenize.ENGLISH_TOKEN_RE (single source of
# truth for semantics; duplicated literal because this one must be engine-
# parseable in both Spark and RE2/DuckDB).
ENGLISH_TOKEN_PATTERN = r"([a-zA-Z]+\.){2,}|[a-zA-Z0-9]+'[a-zA-Z]+|[a-zA-Z0-9]+"

# stopword list shared with the synthetic corpus generator and lang-id
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"]


def english_tokens_col(text_col, lowercase: bool = True):
    """array<string> of reference-lexer tokens, as a native expression."""
    toks = F.regexp_extract_all(text_col, F.lit(ENGLISH_TOKEN_PATTERN), 0)

    def norm(t):
        out = (
            F.when(t.rlike(r"^([a-zA-Z]+\.){2,}$"), F.regexp_replace(t, r"\.", ""))
            .when(t.contains("'"), F.substring_index(t, "'", 1))
            .otherwise(t)
        )
        return F.lower(out) if lowercase else out

    return F.transform(toks, norm)


def with_tokens(docs, text_col: str = "text", out_col: str = "tokens"):
    return docs.withColumn(out_col, english_tokens_col(F.col(text_col)))


def token_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_tokens, n_unique, avg_token_len) per document."""
    t = with_tokens(docs, text_col)
    return t.select(
        F.col(id_col),
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_unique"),
        F.when(F.size("tokens") > 0,
               F.aggregate("tokens", F.lit(0.0),
                           lambda acc, x: acc + F.length(x)) / F.size("tokens"))
        .otherwise(F.lit(0.0)).alias("avg_token_len"),
    )


def language_id(docs, id_col: str = "doc_id", text_col: str = "text",
                threshold: float = 0.02):
    """n-gram-free heuristic language ID: share of tokens that are English
    stopwords; >= threshold => 'en' else 'und'."""
    t = with_tokens(docs, text_col)
    stop_hits = F.size(F.filter(
        "tokens", lambda x: x.isin(*EN_STOPWORDS)))
    ratio = F.when(F.size("tokens") > 0,
                   stop_hits / F.size("tokens")).otherwise(F.lit(0.0))
    return t.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


def quality_score(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Length/punctuation/stopword quality features + a composite score in
    [0, 1]: the standard cheap filters of a webtext curation pipeline."""
    t = with_tokens(docs, text_col)
    n_tok = F.size("tokens")
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.size(F.filter(
        "tokens", lambda x: x.isin(*EN_STOPWORDS))) / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 20) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = len_ok * (
        F.lit(0.5)
        + F.lit(0.25) * F.least(stop_ratio / F.lit(0.04), F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio / F.lit(0.2), F.lit(1.0)))
    )
    return t.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def fingerprint(docs, id_col: str = "doc_id", text_col: str = "text",
                window: int = 8):
    """Winnowing-style document fingerprint: the minimum md5 over all
    `window`-token shingles (rolling-hash fingerprinting as in reference-free
    near-dup detection); docs shorter than the window hash the whole token
    stream."""
    t = with_tokens(docs, text_col)
    n = F.size("tokens")
    shingles = F.when(
        n >= window,
        F.transform(F.sequence(F.lit(0), n - window),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("tokens", i + 1, window))))
    ).otherwise(F.array(F.md5(F.concat_ws(" ", "tokens"))))
    return t.select(
        F.col(id_col),
        F.array_min(shingles).alias("fingerprint"),
    )
