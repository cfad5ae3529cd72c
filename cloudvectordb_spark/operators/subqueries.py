"""Correlated/scalar subquery shapes (SURVEY.md §4 "subquery
decorrelation"; B-group predicates composed with C4/C5 joins).

Catalyst decorrelates these automatically when written as SQL; the
DataFrame forms below express the same semantics explicitly as
aggregate-then-join — the decorrelated plan — so the physical shape is
identical either way and stays broadcast-friendly: every subquery result
here is a small aggregate (per-group min/avg), exactly what you want
flowing into a 100 TB fact join as the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: row matching a correlated per-group MIN (cheapest
# supplier per part)
# ---------------------------------------------------------------------------
@query(
    "cheapest_supplier_per_part",
    oracle="""
    SELECT p_partkey, s_suppkey, s_acctbal
    FROM part
    JOIN supplier ON s_suppkey = p_partkey % 100 + 1
    WHERE s_acctbal = (
      SELECT min(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_suppkey % 10 = supplier.s_suppkey % 10
    )
    ORDER BY p_partkey
    LIMIT 50
    """,
    operators=("C1", "D1", "B2"),
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture schema has no partsupp table, so the part->supplier
    relationship is a deterministic synthetic FK (partkey % 100 + 1) on
    both sides; the correlated scalar subquery (min acctbal within the
    supplier's mod-10 group) is what's under test."""
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    grp_min = (
        supp.groupBy((F.col("s_suppkey") % 10).alias("g"))
        .agg(F.min("s_acctbal").alias("min_bal"))
    )
    s = supp.join(
        F.broadcast(grp_min),
        (F.col("s_suppkey") % 10) == F.col("g"),
    ).filter(F.col("s_acctbal") == F.col("min_bal"))
    return (
        part.join(s, F.col("s_suppkey") == F.col("p_partkey") % 100 + 1)
        .select("p_partkey", "s_suppkey", "s_acctbal")
        .orderBy("p_partkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS with a date-window correlation
# ---------------------------------------------------------------------------
@query(
    "priority_orders_with_late_items",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    operators=("C4", "B3", "D1"),
)
def priority_orders_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: filter by a correlated per-key average
# ---------------------------------------------------------------------------
@query(
    "small_quantity_order_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    WHERE l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_orderkey % 50 = lineitem.l_orderkey % 50
    )
    """,
    operators=("D1", "B2", "C2", "D2"),
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation key is l_orderkey % 50 (the fixture has no p_brand/
    container axis); decorrelated: 50-row avg table broadcast into the
    fact scan — zero fact shuffle before the final global agg."""
    li = load(spark, sf_dir, "lineitem")
    avg_qty = (
        li.groupBy((F.col("l_orderkey") % 50).alias("g"))
        .agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    )
    return (
        li.join(F.broadcast(avg_qty), (F.col("l_orderkey") % 50) == F.col("g"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: anti join (no 1998 orders) + global scalar subquery
# ---------------------------------------------------------------------------
@query(
    "idle_rich_customers",
    oracle="""
    SELECT substr(c_name, 10, 2) AS cntry, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY 1
    """,
    operators=("C5", "D2", "B2", "D1"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= "1998-01-01"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy(F.substring("c_name", 10, 2).alias("cntry"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Events funnel: per-user stage progression (view -> cart -> purchase
# ordered by time) — the workhorse product-analytics correlated query
# ---------------------------------------------------------------------------
@query(
    "event_funnel_counts",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             min(ts) FILTER (WHERE event_type = 'click')     AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view) AS n_click_after_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click) AS n_full_funnel
    FROM stage
    """,
    operators=("D1", "D2", "B8", "E2"),
)
def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stage.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
        ).alias("n_click_after_view"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# Catalyst-decorrelated form: the SAME correlated EXISTS + scalar
# subquery text runs through spark.sql — proving the engine's SQL entry
# decorrelates automatically (SURVEY.md §4), not just our hand-rolled
# DataFrame forms above.
# ---------------------------------------------------------------------------
_CORRELATED_SQL = """
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 45
      )
    GROUP BY o_orderpriority
"""


@query(
    "sql_correlated_exists",
    oracle=_CORRELATED_SQL,
    operators=("A6", "C4", "D2", "B2"),
)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)


# ---------------------------------------------------------------------------
# A6/B2: scalar subquery through the SQL surface — Catalyst decorrelates
# the aggregate into a broadcast 1-row join; the DataFrame twin of this
# shape is the crossJoin(broadcast(agg)) used throughout the repo.
# ---------------------------------------------------------------------------
@query(
    "sql_parts_above_avg_price",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_retailprice > 1.01 * (SELECT avg(p_retailprice) FROM part)
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25
    """,
    operators=("A6", "B2", "D2", "F2"),
)
def sql_parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
        FROM part
        WHERE p_retailprice > 1.01 * (SELECT avg(p_retailprice) FROM part)
        ORDER BY p_retailprice DESC, p_partkey
        LIMIT 25
        """
    )


# ---------------------------------------------------------------------------
# A6: correlated LATERAL subquery — top-2 orders per nation through the
# SQL surface. Catalyst rewrites the correlated LIMIT into a ranked
# window join (DecorrelateInnerQuery), so the executed plan is the same
# partitioned top-k-per-group shape as rank_orders_per_customer — the
# SQL text is the point: users of the reference write this form.
# ---------------------------------------------------------------------------
_LATERAL_SQL = """
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) t
"""


@query(
    "sql_lateral_topk_per_nation",
    oracle=_LATERAL_SQL,
    operators=("A6", "E4", "C1", "F2"),
)
def sql_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# A6/H5: recursive CTE (Spark 4 WITH RECURSIVE) — a date spine from the
# observed event-time bounds, left-joined to daily counts to surface
# ingestion gaps (days with zero events), the data-quality check a
# pipeline runs before trusting a time range. The IDENTICAL SQL text
# runs on Spark and the DuckDB oracle; recursion depth = number of
# days, a driver-side-trivial calendar, while the daily counts reduce
# corpus-side with map-side combine.
# ---------------------------------------------------------------------------
_DATE_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
      FROM events
    ),
    spine(day) AS (
      SELECT d0 FROM bounds
      UNION ALL
      SELECT day + INTERVAL '1' DAY FROM spine, bounds WHERE day < d1
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT s.day, CAST(COALESCE(n, 0) AS BIGINT) AS n_events, n IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@query(
    "sql_recursive_date_spine_gaps",
    oracle=_DATE_SPINE_SQL,
    operators=("A6", "H5", "C3", "B6"),
)
def sql_recursive_date_spine_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_DATE_SPINE_SQL)
