"""Query registry: name → (Spark builder, DuckDB oracle SQL).

This is the single source of truth behind ``__spark_entry__.py``'s
``queries()`` / ``oracle_sql()`` contract. Conventions that keep the
driver's order-insensitive value-hash comparison stable:

- every computed/aggregate column is aliased identically on both sides;
- integer-ish outputs are explicit INT or BIGINT on both sides
  (DuckDB ``year()`` returns BIGINT, Spark INT — always cast);
- money aggregates are summed as DECIMAL(18,2) (exact, order-
  independent) then cast to DOUBLE — double-summation would differ in
  ulps between engines;
- timestamps leave the result as formatted strings, dates, or epoch
  BIGINTs — never raw timestamps (testdata mixes ms/ns physical types);
- floating-point *derived* values (cosines, ratios) are rounded to 6
  decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # ANSI/DuckDB SQL, or None → driver does rows-only check


_REGISTRY: list[QuerySpec] = []


def register(name: str, builder: QueryFn, oracle: str | None) -> None:
    _REGISTRY.append(QuerySpec(name, builder, oracle))


def specs() -> list[QuerySpec]:
    _ensure_loaded()
    return list(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {s.name: s.builder for s in specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in specs() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import analytics, llm_queries, reference_queries, streaming_queries  # noqa: F401

    reference_queries.register_all()
    analytics.register_all()
    llm_queries.register_all()
    streaming_queries.register_all()
