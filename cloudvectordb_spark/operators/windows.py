"""Window functions, sorts, top-k (SURVEY.md §2 groups E and F).

All ranking windows carry an explicit deterministic tie-break key
(SURVEY.md §5.3.2 determinism discipline) so Spark and the DuckDB oracle
rank identically. Global top-k uses ``orderBy().limit()`` which Spark
plans as ``TakeOrderedAndProject`` — a per-partition heap + driver merge,
no full sort even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.ranking import ntile_from_row_number, with_global_row_number
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# E1: ranking — top 3 orders per customer
# ---------------------------------------------------------------------------
@query(
    "rank_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    operators=("E1", "E4"),
)
def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# E1 variants: rank / dense_rank / ntile over a global ordering per group
# ---------------------------------------------------------------------------
@query(
    "supplier_balance_ranks",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           rank()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank,
           dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS bal_dense_rank,
           ntile(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
    FROM supplier
    """,
    operators=("E1",),
)
def supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    # The ordering (s_acctbal DESC, s_suppkey) is a TOTAL order (suppkey is
    # unique), so rank == dense_rank == row_number; compute ONE exact
    # distributed global row_number (ranking.py — value-bucketed, no
    # single-partition window) and derive all three outputs from it.
    ranked = with_global_row_number(
        supp, "s_acctbal", [F.asc("s_suppkey")], descending=True, rn_col="_rn"
    )
    return ranked.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.col("_rn").alias("bal_rank"),
        F.col("_rn").alias("bal_dense_rank"),
        ntile_from_row_number(F.col("_rn"), F.col("_total_rows"), 4).alias(
            "quartile"
        ),
    )


# ---------------------------------------------------------------------------
# E2: lag/lead — inter-event gap per user (exact microsecond arithmetic
# on both sides: unix_micros in Spark, epoch_us in DuckDB)
# ---------------------------------------------------------------------------
@query(
    "event_gaps",
    oracle="""
    SELECT user_id,
           count(*)                                          AS n_events,
           round(avg(gap_sec), 4)                            AS avg_gap_sec,
           round(max(gap_sec), 4)                            AS max_gap_sec
    FROM (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0 AS gap_sec
      FROM events
    )
    GROUP BY user_id
    """,
    operators=("E2", "H5"),
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp_diff is NTZ-and-LTZ generic; unix_micros rejects TIMESTAMP_NTZ.
    gap = (
        F.timestamp_diff("MICROSECOND", F.lag("ts", 1).over(w), F.col("ts"))
        / 1000000.0
    )
    return (
        ev.withColumn("gap_sec", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("gap_sec"), 4).alias("avg_gap_sec"),
            F.round(F.max("gap_sec"), 4).alias("max_gap_sec"),
        )
    )


# ---------------------------------------------------------------------------
# E3: frame aggregate — running total per customer (same accumulation
# order on both sides -> identical floats; rounded anyway)
# ---------------------------------------------------------------------------
@query(
    "running_order_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    operators=("E3",),
)
def running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# F2: global top-k (TakeOrderedAndProject — no full sort)
# ---------------------------------------------------------------------------
@query(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    operators=("F2", "F1"),
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# F1/F3: multi-key global sort + limit/offset pagination
# ---------------------------------------------------------------------------
@query(
    "sort_page_offset",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    LIMIT 50 OFFSET 100
    """,
    operators=("F1", "F3"),
)
def sort_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .orderBy(
            F.asc("c_mktsegment"), F.desc("c_acctbal"), F.asc("c_custkey")
        )
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# E3 with a RANGE frame: 7-day rolling event volume per type. Raw events
# first reduce to (type, day) counts — map-side combine collapses 100 TB
# of events to ~types x days rows BEFORE any window — then the RANGE
# frame (value-based, so gap days weigh correctly, unlike a ROWS frame)
# runs over that tiny keyed aggregate. Day ordinal is an int on both
# engines so the frame bounds are engine-identical.
# ---------------------------------------------------------------------------
@query(
    "events_rolling_7d",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_ord,
             CAST(min(CAST(ts AS DATE)) AS TIMESTAMP)              AS day,
             count(*)                                              AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n_events,
           CAST(sum(n_events) OVER (
             PARTITION BY event_type ORDER BY day_ord
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d
    FROM daily
    """,
    operators=("E3", "E1", "D1", "H5"),
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_ord"),
            F.to_date("ts").alias("day"),
        )
        .groupBy("event_type", "day_ord")
        .agg(
            F.min("day").cast("timestamp").alias("day"),
            F.count("*").alias("n_events"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_ord")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.sum("n_events").over(w).cast("bigint").alias("rolling_7d"),
    )


# ---------------------------------------------------------------------------
# Range-partition planner: exact interpolated septile edges of the sort
# key — the bounds a rangepartitioned sort/Z-order layout would use.
# Spark's own range partitioner samples; this produces EXACT edges with
# one percentile aggregate (single pass + tiny final reduce), the
# deterministic variant a layout manifest should persist. posexplode
# turns the edge array into (bucket, upper_bound) rows.
# ---------------------------------------------------------------------------
@query(
    "range_partition_bounds",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(o_totalprice,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS edges
      FROM orders
    )
    SELECT CAST(b.i AS BIGINT)          AS bucket,
           round(edges[b.i], 2)         AS upper_bound
    FROM q CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS i) b
    """,
    operators=("F1", "D5", "H7"),
)
def range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    edges = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(i / 8.0) for i in range(1, 8)]))
        .alias("edges")
    )
    return edges.select(
        F.posexplode("edges").alias("pos", "edge")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("bucket"),
        F.round("edge", 2).alias("upper_bound"),
    )


# ---------------------------------------------------------------------------
# E1 completeness: percent_rank + cume_dist — the two normalized ranking
# functions — over a PARTITIONED window (mktsegment), so the sort is
# per-segment and parallel; a global percent_rank would instead go
# through ranking.with_global_row_number (rn / total).
# ---------------------------------------------------------------------------
@query(
    "customer_balance_percentiles",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    operators=("E1",),
)
def customer_balance_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user —
# the canonical islands derivation (day minus per-user day-index is
# constant within a streak). Cousin of timestamp sessionization
# (events_sessions) at calendar grain; powers streak/retention
# features. One user-keyed window over the (user, day) dedup — the big
# reduction happens first, so the window input is days, not events.
# ---------------------------------------------------------------------------
@query(
    "user_activity_streaks",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - INTERVAL (row_number() OVER
               (PARTITION BY user_id ORDER BY day)) DAY AS island
      FROM du
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS len FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS longest_streak_days,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
    operators=("E1", "H5", "D1", "G4"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = du.withColumn(
        "island",
        F.col("day")
        - F.make_interval(days=F.row_number().over(w)),
    )
    streaks = grp.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak_days"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


# ---------------------------------------------------------------------------
# Bot-likeness screen: users whose inter-event gaps are suspiciously
# REGULAR (coefficient of variation below threshold over >= 20 events)
# — scripted traffic has clockwork gaps, humans are bursty. The
# behavioral filter applied before user-generated text enters a
# training corpus. Same per-user lag window as event_gaps, one stats
# aggregate per user.
# ---------------------------------------------------------------------------
_BOT_MIN_EVENTS = 20
_BOT_CV_MAX = 0.8


@query(
    "bot_like_users",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) / 1000000.0 AS gap_sec
      FROM events
    ),
    stats AS (
      SELECT user_id, count(gap_sec) AS n_gaps,
             avg(gap_sec) AS mu, stddev_samp(gap_sec) AS sigma
      FROM gaps GROUP BY user_id
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(sigma / mu, 6) AS gap_cv
    FROM stats
    WHERE n_gaps >= {_BOT_MIN_EVENTS} AND sigma / mu < {_BOT_CV_MAX}
    ORDER BY gap_cv, user_id
    """,
    operators=("E2", "D5", "B2", "H5"),
)
def bot_like_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.timestamp_diff("MICROSECOND", F.lag("ts", 1).over(w), F.col("ts"))
        / 1000000.0
    )
    stats = (
        ev.withColumn("gap_sec", gap)
        .groupBy("user_id")
        .agg(
            F.count("gap_sec").alias("n_gaps"),
            F.avg("gap_sec").alias("mu"),
            F.stddev_samp("gap_sec").alias("sigma"),
        )
    )
    return (
        stats.filter(
            (F.col("n_gaps") >= _BOT_MIN_EVENTS)
            & (F.col("sigma") / F.col("mu") < _BOT_CV_MAX)
        )
        .select(
            "user_id",
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            F.round(F.col("sigma") / F.col("mu"), 6).alias("gap_cv"),
        )
        .orderBy("gap_cv", "user_id")
    )


# ---------------------------------------------------------------------------
# F3 second cover: KEYSET pagination — the scale-correct form. OFFSET n
# must scan-and-discard n rows on every page (page depth costs grow
# linearly); the keyset form seeks WHERE key > last_seen and reads one
# page — constant work per page at any depth, which is why every
# large-result API paginates this way. Page 3 of the order list
# (page size 20) via the (o_orderdate, o_orderkey) compound cursor.
# ---------------------------------------------------------------------------
_PAGE_SIZE = 20
# the cursor a client would have kept from page 2's last row — derived
# deterministically here so the oracle can replay it: the 40th row of
# the global (o_orderdate, o_orderkey) order.
@query(
    "orders_keyset_pagination",
    oracle=f"""
    WITH cursor AS (
      SELECT o_orderdate AS cd, o_orderkey AS ck FROM orders
      ORDER BY o_orderdate, o_orderkey LIMIT 1 OFFSET {2 * _PAGE_SIZE - 1}
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM orders o, cursor
    WHERE (o.o_orderdate, o.o_orderkey) > (cursor.cd, cursor.ck)
    ORDER BY o.o_orderdate, o.o_orderkey
    LIMIT {_PAGE_SIZE}
    """,
    operators=("F3", "F1", "B2"),
)
def orders_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cur = (
        orders.orderBy("o_orderdate", "o_orderkey")
        .limit(2 * _PAGE_SIZE)
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            F.col("o_orderdate").alias("cd"), F.col("o_orderkey").alias("ck")
        )
        .collect()[0]  # bounded: the client's cursor
    )
    seek = (F.col("o_orderdate") > cur.cd) | (
        (F.col("o_orderdate") == cur.cd) & (F.col("o_orderkey") > cur.ck)
    )
    return (
        orders.filter(seek)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_PAGE_SIZE)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )
