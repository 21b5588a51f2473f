"""Query/oracle registry.

Every operator implementation registers itself here with an optional DuckDB
oracle SQL string. ``__spark_entry__.py`` exposes these dicts to the driver;
tests iterate them for local oracle-parity checks (the same check the driver
runs at sf0.01 — SURVEY.md §5.2).

Conventions enforced across the codebase (SURVEY.md §7.3):
- every computed column is aliased IDENTICALLY in Spark and oracle SQL;
- double aggregates are ``round(x, 2)`` (or finer for unit-scale values);
- timestamps in outputs are formatted to ``yyyy-MM-dd HH:mm:ss`` strings;
- arrays in outputs are joined to comma-separated strings, numerically sorted;
- tokenization is pinned to a single-space split of ``documents.text``
  (verified clean: no leading/trailing/double spaces in the fixtures).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query callable ``(spark, sf_dir) -> DataFrame``.

    ``oracle`` is equivalent ANSI SQL for DuckDB over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). ``None`` => genuinely non-SQL-expressible; the driver records
    a weaker rows-only check.
    """

    def deco(fn):
        assert name not in QUERIES, f"duplicate query key {name!r}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
