"""Operators: postings build, codecs, block-max, top-k executors, dedup, ANN."""
