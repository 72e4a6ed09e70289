"""Reusable column expressions shared by the ETL, query, and operator layers.

Everything here is built-in-function composition (JVM-side, codegen-able) —
zero Python row UDFs, per SURVEY.md §2.11.
"""

from .columns import (
    cosine_similarity,
    cosine_similarity_arrow,
    cosine_similarity_sql,
    dow_monday0,
    is_weekend,
    l2_norm,
    hashed_word_shingles,
    occurrence_count,
    punct_ratio,
    round_pz,
    round_pz_sql,
    word_shingles,
    word_tokens,
)

__all__ = [
    "cosine_similarity",
    "cosine_similarity_arrow",
    "cosine_similarity_sql",
    "dow_monday0",
    "is_weekend",
    "l2_norm",
    "hashed_word_shingles",
    "occurrence_count",
    "punct_ratio",
    "round_pz",
    "round_pz_sql",
    "word_shingles",
    "word_tokens",
]
