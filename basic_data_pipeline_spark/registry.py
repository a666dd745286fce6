"""Query registry: one named entry per operator from SURVEY.md §2.

Each registered query couples (a) a Spark DataFrame callable
``(spark, sf_dir) -> DataFrame`` with (b) an equivalent ANSI-SQL oracle
string that DuckDB runs over the same parquet fixtures. The driver compares
row-count + schema + order-insensitive value hash, so every computed column
is aliased identically on both sides, and float aggregates are rounded the
same way on both sides to absorb accumulation-order differences.

Queries marked ``headline=True`` form the bench.py suite.
Queries with ``oracle=None`` are non-SQL-expressible (LSH internals,
streaming statefulness); the driver records a rows-only check and our own
pytest self-consistency asserts cover semantics.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool
    doc: str


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values() if q.headline}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported here (not at module top) to avoid circular imports: the query
    # modules import `query` from this module.
    from basic_data_pipeline_spark.queries import cdc_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import llm_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import relational  # noqa: F401
    from basic_data_pipeline_spark.queries import scale_queries  # noqa: F401
    from basic_data_pipeline_spark.queries import streaming_queries  # noqa: F401

    _LOADED = True
