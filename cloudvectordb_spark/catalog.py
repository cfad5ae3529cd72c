"""Fixture-table catalog: scans (SURVEY.md §2 A1) and SQL registration (A6).

All ten driver-generated tables (TESTDATA.md, FIXTURES.md) load as plain
parquet scans — Spark's vectorized reader with predicate pushdown and
column pruning applies automatically because callers express filters /
projections as Column expressions, never inside UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any scale:
# region is 5 rows, nation 25 at every sf (FIXTURES.md row counts).
BROADCAST_DIMS = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A1 Parquet scan for one fixture table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects outright. We read nanos as long
    (legacy conf) and truncate to microseconds — exactly what DuckDB does
    when it surfaces the same column as TIMESTAMP (µs), so oracle
    comparisons stay bit-identical.

    The returned DataFrame (an immutable logical plan — callers always
    derive, never mutate) is cached per (session, file fingerprint):
    every fresh ``spark.read.parquet`` costs a driver-side file listing
    + footer schema read, which at bench granularity is ~0.2 s/job of
    pure driver overhead repeated for every table of every query run
    (round-7 verdict). The fingerprint is mtime_ns+size, so a
    regenerated fixture — even within the same second — reloads.
    """
    import os

    from cloudvectordb_spark.cache import artifact_cache, session_key, source_tag

    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"

    def build() -> DataFrame:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            return df
        return spark.read.parquet(path)

    return artifact_cache(
        ("fixture_load", source_tag(path), session_key(spark)), build
    )


def spread_narrow_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a scan whose split count is far below cluster parallelism.

    Parquet scans parallelize per row group; a small fixture file with ONE
    row group caps every downstream narrow stage (tokenize/shingle/UDF) at
    one task regardless of core count. Production-scale inputs arrive in
    thousands of splits and take the no-op branch — the repartition only
    fires when the input is so narrow that shuffling it is trivially cheap
    (fewer splits than cores implies a small scan by construction, given
    ``spark.sql.files.maxPartitionBytes`` bounds bytes per split).

    Call this before CPU-heavy per-row work, never before joins/aggs
    (those repartition on their keys anyway).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(target // 2, 2):
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """A6: expose every fixture table to ``spark.sql`` under its own name.

    Memoized per (session, sf_dir): re-registration re-reads every
    parquet footer for schema (~1s of driver-side work per call), which
    would otherwise tax each spark.sql query. Registering views for a
    DIFFERENT sf_dir on the same session invalidates the memo.
    """
    tag = getattr(spark, "_cvdb_views_for", None)
    if tag == sf_dir:
        return
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    spark._cvdb_views_for = sf_dir
