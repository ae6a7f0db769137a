"""Scalar function layer: text extraction, tokenization, scoring."""
