"""Query registry: the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, where SQL-expressible,
its ANSI-SQL oracle twin that DuckDB runs over the same parquet tables.
The driver hash-compares the two at sf0.01 — so both sides must agree on
column NAMES, TYPES, and rounded float values (see SURVEY.md §5.3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    operators: tuple[str, ...] = ()  # SURVEY.md §2 operator IDs covered
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    operators: tuple[str, ...] | list[str] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query (and optional oracle SQL twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(operators), bench)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    # Imports are deferred so `import cloudvectordb_spark` stays cheap.
    from cloudvectordb_spark.operators import (  # noqa: F401
        curation,
        dedup,
        events,
        functions_ops,
        multimodal,
        pipeline,
        pq,
        relational,
        search,
        sources,
        subqueries,
        text_ops,
        udfs,
        vector_ops,
        windows,
    )

    return dict(_REGISTRY)
