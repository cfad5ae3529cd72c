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
    # Multi-tenant serving fairness (round 12): SPARK_GRAFT_SCHEDULER=FAIR
    # switches job scheduling from the default FIFO to FAIR so concurrent
    # callers in separate pools (see ``scheduler_pool``) round-robin for
    # task slots instead of queueing behind one heavy caller's stages.
    # Results are scheduling-order-independent either way (pytest/probe
    # pinned); the option only changes WHO waits. Read at JVM start —
    # it cannot be flipped on a live session.
    sched = os.environ.get("SPARK_GRAFT_SCHEDULER")
    if sched:
        builder = builder.config("spark.scheduler.mode", sched.upper())
        if sched.upper() == "FAIR":
            # weighted pools for WRITER ISOLATION (round-13 verdict
            # #4): equal-weight round-robin still hands a mutation job
            # half the slots, which is where the serve-under-mutation
            # p95 tail came from. The shipped allocation gives
            # ``serving`` an 8:1 weight and a minShare of half the
            # cores (slots it reclaims IMMEDIATELY when a batch
            # arrives), while ``maintenance`` writers backfill the
            # idle capacity between batches. Unlisted pool names keep
            # Spark's defaults (weight 1), so multi-tenant callers are
            # unaffected.
            builder = builder.config(
                "spark.scheduler.allocation.file", _fair_pools_file()
            )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _fair_pools_file() -> str:
    """Write (once) the FAIR allocation XML defining the engine's two
    standing pools and return its path.

    The path is PER-USER (uid in the filename): a fixed world-shared
    name under a sticky-bit /tmp breaks on multi-user boxes — a
    pre-existing file owned by another user makes the atomic
    ``os.replace`` fail (EPERM) and kills ``get_session`` whenever
    FAIR is on, or silently serves another process's allocation
    content (round-13 ADVICE item 4). The content is deterministic
    per box, so processes of the SAME user sharing the file stay
    correct; the replace stays atomic for crash safety."""
    import tempfile

    uid = os.getuid() if hasattr(os, "getuid") else "u"
    path = os.path.join(
        tempfile.gettempdir(), f"cloudvectordb_fair_pools_{uid}.xml"
    )
    cores = os.cpu_count() or 8
    xml = f"""<?xml version="1.0"?>
<allocations>
  <pool name="serving">
    <schedulingMode>FIFO</schedulingMode>
    <weight>8</weight>
    <minShare>{max(4, cores // 2)}</minShare>
  </pool>
  <pool name="maintenance">
    <schedulingMode>FIFO</schedulingMode>
    <weight>1</weight>
    <minShare>0</minShare>
  </pool>
</allocations>
"""
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(xml)
    os.replace(tmp, path)
    return path


class scheduler_pool:
    """Context manager tagging THIS THREAD's Spark jobs with a named
    scheduler pool — the per-tenant unit of fairness under
    ``SPARK_GRAFT_SCHEDULER=FAIR``. Pools are created on first use with
    default settings (weight 1, minShare 0, FIFO inside the pool);
    FAIR mode shares task slots round-robin BETWEEN pools, so one
    tenant's heavy batch cannot starve another pool's small queries —
    the property tools/multitenant_probe.py measures. Under FIFO mode
    the tag is inert (jobs queue globally), so callers can always wrap
    their work in a pool and let the session option decide.

    The property is thread-local in the JVM (each py4j-connected
    driver thread carries its own), matching the engine's
    thread-per-caller fan-out pattern."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name

    def __enter__(self):
        sc = self.spark.sparkContext
        self._outer = sc.getLocalProperty("spark.scheduler.pool")
        sc.setLocalProperty("spark.scheduler.pool", self.name)
        return self

    def __exit__(self, *exc):
        # restore what the thread had on entry (an outer pool block or
        # a caller-set tag), not bare None — clearing unconditionally
        # would silently drop the rest of the outer block's jobs into
        # the default pool and lose their fairness share
        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", self._outer
        )
        return False


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
