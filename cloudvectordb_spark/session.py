"""SparkSession factory with scale-aware defaults.

Local-mode testing config; the same settings (AQE, Arrow, UTC, explicit
shuffle parallelism) are what we'd ship on a 1000-executor cluster — only
``spark.sql.shuffle.partitions`` scales with data volume (rule of thumb:
~2-3x total cores, targeting 128-256 MB post-shuffle partitions at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "cloudvectordb-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime partition coalescing, skew-join splitting, dynamic
      join-strategy switching — the 100 TB insurance policy.
    - Arrow on: every Python crossing (pandas UDF / mapInPandas) is
      columnar-batched, not row-pickled.
    - UTC session timezone: parquet timestamps compare bit-identical with
      the DuckDB oracle.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make ``cloudvectordb_spark`` importable inside executor Python
    workers regardless of the driver process's cwd/sys.path: zip the
    package once per session and ``addPyFile`` it. Without this, any
    mapInPandas/applyInPandas closure that references a module-level
    function dies with ModuleNotFoundError when the driver runs from a
    foreign directory (exactly how the verification harness runs us)."""
    if getattr(spark, "_cvdb_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import cloudvectordb_spark

    pkg_dir = os.path.dirname(os.path.abspath(cloudvectordb_spark.__file__))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(prefix="cloudvectordb_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    spark._cvdb_pkg_shipped = True


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply the session settings the DuckDB-oracle comparison depends on
    to an externally-provided session (the driver passes its own)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ship_package(spark)
    return spark
