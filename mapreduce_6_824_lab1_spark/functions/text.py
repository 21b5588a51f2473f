"""Shared text primitives — the tokenization rule is pinned HERE, once.

The lab's ``wc.go`` map function splits contents on non-letter runs
(``unicode.IsLetter`` — public MIT 6.824 Lab 1 spec; SURVEY.md §2.B B1).
Our fixture ``documents.text`` is verified to be single-space-separated
lowercase words with no leading/trailing/double spaces (FIXTURES.md), so the
pinned rule is a single-space split — the one rule every text query AND every
DuckDB oracle must share verbatim (the #1 hash-mismatch risk, SURVEY.md §7.1).

DuckDB oracle equivalent of :func:`tokens_col`:  ``string_split(text, ' ')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_DELIM = " "

# DuckDB-side fragment, interpolated into oracle SQL strings so the rule
# literally cannot drift between engines.
SQL_TOKENS = "string_split(text, ' ')"


def tokens_col(col: str | Column = "text") -> Column:
    """Array-of-words column for a text column (Spark side of the pinned rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, TOKEN_DELIM)


def words_of(df, *keep: str):
    """Explode a documents-like DataFrame to one row per token.

    Returns columns ``[*keep, word]``. Pure built-ins: stays inside
    whole-stage codegen — this is the hot path of every wordcount-family
    query and must never touch Python per row.
    """
    return df.select(*keep, F.explode(tokens_col("text")).alias("word"))
