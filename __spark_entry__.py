"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke query; ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 operator with its
DuckDB twin (see cloudvectordb_spark.registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-k similarity search (the CloudVectorDB
    identity query — reference S4 consumer path) on sf0.001."""
    from cloudvectordb_spark.operators.vector_ops import knn_exact_cosine
    from cloudvectordb_spark.session import configure_for_oracle

    configure_for_oracle(spark)
    return knn_exact_cosine(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sys

    from cloudvectordb_spark.registry import all_queries, import_errors
    from cloudvectordb_spark.session import configure_for_oracle

    all_queries()
    for mod, err in import_errors.items():  # partial registry must be loud
        print(f"registry import error: {mod}: {err}", file=sys.stderr)

    def self_configuring(fn: Callable) -> Callable:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver hands us ITS session; pin the confs (UTC, Arrow,
            # nanos-as-long) and ship the package zip to executors before
            # any plan references our Python closures
            configure_for_oracle(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        return run

    return {name: self_configuring(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from cloudvectordb_spark.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
