"""Tokenizer fidelity vs reference lexer rules (src/tokenizer.cpp:50-78)."""

from pisa_spark.config import IndexConfig
from pisa_spark.functions.tokenize import (
    analyze_query_terms,
    english_tokens,
    make_analyzer,
    whitespace_tokens,
)


def test_english_abbreviation_periods_removed():
    assert english_tokens("U.S.A.") == ["USA"]
    assert english_tokens("e.g. example") == ["eg", "example"]


def test_english_possessive_keeps_prefix():
    assert english_tokens("dog's bone") == ["dog", "bone"]
    # possessive consumes the whole match, keeps only the prefix before '
    assert english_tokens("O'Neill") == ["O"]


def test_english_plain_terms_and_junk():
    assert english_tokens("x86 --- foo_bar") == ["x86", "foo", "bar"]
    assert english_tokens("...") == []


def test_english_first_match_order():
    # abbreviation wins over term at the same position
    assert english_tokens("a.b.c.d") == ["abc", "d"]


def test_whitespace_tokenizer():
    assert whitespace_tokens("  a\tb\nc  ") == ["a", "b", "c"]


def test_lowercase_and_stopwords():
    cfg = IndexConfig(tokenizer="english", lowercase=True,
                      stopwords=frozenset({"the"}))
    analyze = make_analyzer(cfg)
    assert analyze("The Cat") == ["cat"]


def test_query_parse_weights_and_qid():
    cfg = IndexConfig()
    rows = analyze_query_terms(["Q7:foo foo bar"], cfg)
    assert ("Q7", "foo", 2.0) in rows
    assert ("Q7", "bar", 1.0) in rows


def test_query_parse_no_qid():
    rows = analyze_query_terms(["foo"], IndexConfig())
    assert rows == [("0", "foo", 1.0)]
