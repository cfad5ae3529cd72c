"""Classic decision-support shapes completing the TPC-H-style relational
suite (SURVEY.md §2 groups B/C/D/F; [HARNESS] relational bar).

Round 1 shipped Q1/Q2/Q3/Q4/Q5/Q10/Q13/Q17/Q21/Q22 analogues
(relational.py, subqueries.py); this module adds the remaining shapes the
fixture schema can express — Q6 (single-scan delta), Q7 (nation-pair
volume), Q8 (market share ratio), Q9 (margin by nation/year), Q14 (promo
ratio), Q15 (argmax supplier), Q18 (HAVING semi-join), Q19 (disjunctive
predicate pushdown). The fixture has no PARTSUPP table and lineitem
carries no shipmode/commitdate, so Q11/Q12/Q16/Q20 have no faithful
analogue; Q9's supplycost is proxied from p_retailprice.

Plan-shape policy (SCALE.md "fact-join policy"): lineitem/orders/customer
are facts — their mutual joins are pinned ``shuffle_hash`` so fixture-
scale size estimates can't flip Catalyst into broadcasting a fact.
region/nation are the only explicitly-broadcast dims (truly fixed
cardinality: 5 / 25 rows at every SF). supplier and part scale linearly
with SF (supplier 10 -> 1,000, part 200 -> 20,000 across the fixtures;
~1B / ~20B rows at the 100 TB design point), so they carry NO broadcast
hint — AQE broadcasts them from runtime stats while they fit and falls
back to a shuffle join when they don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# Q6 shape: single-scan filtered global aggregate — the purest pushdown
# test (B2/B3 predicates must reach the parquet scan; D2 global agg).
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue_delta",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
           count(*)                                    AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    operators=("B2", "B3", "D2", "H6"),
)
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair trade volume. Two fact-fact joins
# (lineitem-orders, orders-customer) shuffle on their keys; the nation
# pair predicate applies across both directions.
# ---------------------------------------------------------------------------
@query(
    "nation_trade_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    operators=("C1", "C2", "D1", "B7", "H5"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    oc = orders.join(cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
    return (
        li.join(oc.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share — a conditional-sum / total-sum ratio per year.
# The share division happens after aggregation, so the heavy plan is one
# shuffle on the group key; the ratio is a cheap post-agg projection.
# ---------------------------------------------------------------------------
@query(
    "regional_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(sum(CASE WHEN ns.n_name = 'NATION_2'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region   ON nc.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY 1
    """,
    operators=("C1", "C2", "D1", "B8", "H6"),
)
def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # The p_type filter cuts part ~6x before broadcast; at 100 TB the
    # filtered part-dim is the one broadcast worth re-checking (p_type
    # has 6 values), but the partkey equi-join shuffles fine if Catalyst
    # demotes it.
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    oc = orders.join(cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(oc.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: margin by supplier nation and year. The fixture has no
# PARTSUPP, so cost is proxied as 60% of p_retailprice per unit — the
# plan shape (3-way fact join + part/supplier dims + two-key group) is
# what matters, not the cost model.
# ---------------------------------------------------------------------------
@query(
    "product_line_margin",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity
                               AS DECIMAL(18, 6))) AS DOUBLE), 2) AS margin
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    operators=("C1", "C2", "D1", "B5", "H6"),
)
def product_line_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    # Signed margins cancel, so a double sum's value depends on partial-agg
    # order and can straddle the round(.., 2) boundary vs the oracle; a
    # fixed-point decimal sum is exact and association-order-free on both
    # engines (the per-row cast is deterministic: binary doubles never sit
    # exactly on a half-ulp decimal boundary).
    margin = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year")
        )
        .agg(F.round(F.sum(margin).cast("double"), 2).alias("margin"))
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue ratio — conditional aggregation over one
# month of shipments, part dim broadcast after no filter (ratio needs
# both branches).
# ---------------------------------------------------------------------------
@query(
    "promo_revenue_ratio",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    operators=("C1", "C2", "D2", "B8", "H6"),
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: argmax supplier by quarterly revenue. The global max is a
# one-row aggregate broadcast back over the per-supplier totals — no
# global sort, no single-partition window (SCALE.md "global ranking").
# ---------------------------------------------------------------------------
@query(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    operators=("C1", "C2", "D1", "D2", "F1"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING over a fact aggregate, semi-joined back to the
# order/customer detail. The heavy aggregate happens FIRST, on the
# narrow (orderkey, quantity) projection; only qualifying keys join.
# ---------------------------------------------------------------------------
@query(
    "large_quantity_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS okey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 170
    )
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON okey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    operators=("C1", "D1", "F2", "B2"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 170)
        .select("okey", F.round("raw_qty", 2).alias("sum_qty"))
    )
    return (
        big.join(orders.hint("shuffle_hash"), F.col("okey") == F.col("o_orderkey"))
        .join(cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive multi-band predicate across the join — the OR
# of brand/size/quantity bands must still push the partkey equi-join
# and let Catalyst keep per-branch predicates on each side's scan.
# ---------------------------------------------------------------------------
@query(
    "disjunctive_band_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 45
           AND l_quantity BETWEEN 20 AND 45)
    """,
    operators=("C1", "C2", "B7", "B3", "D2"),
)
def disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Pre-filter each side with the OR's per-side projection (Catalyst
    # derives these too, but stating them keeps the scans tight even if
    # a future plan change loses the inferred filter).
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#12", "Brand#23")
    )
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 45)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 temporal dimension join: each customer's segment "changes" at a
# content-derived date, producing a two-version validity history; orders
# join the version VALID AT their order date. The validity predicate is
# an equi-join on custkey plus a range condition — Spark executes it as
# a hash join with the range as a post-filter, so at 100 TB it shuffles
# once on the key like any FK join (never a nested loop). The change
# dates derive from md5(custkey), so the whole history is replayable.
# ---------------------------------------------------------------------------
@query(
    "scd2_dimension_join",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_mktsegment AS segment, 1 AS version,
             TIMESTAMP '1970-01-01' AS valid_from,
             TIMESTAMP '1995-01-01' + INTERVAL (CAST((
               ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1))) AS INTEGER
             ) % 80) MONTH AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, c_mktsegment || '_V2', 2,
             TIMESTAMP '1995-01-01' + INTERVAL (CAST((
               ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1))) AS INTEGER
             ) % 80) MONTH,
             TIMESTAMP '9999-12-31'
      FROM customer
    )
    SELECT h.segment, CAST(h.version AS BIGINT) AS version,
           count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN hist h ON h.c_custkey = o.o_custkey
               AND o.o_orderdate >= h.valid_from
               AND o.o_orderdate < h.valid_to
    GROUP BY h.segment, h.version
    """,
    operators=("C6", "C1", "H5", "H4", "D1", "G1"),
)
def scd2_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    change_month = (
        F.ascii(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1)) % 80
    )
    change_date = F.to_timestamp(F.lit("1995-01-01")) + F.make_interval(
        months=change_month
    )
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).cast("bigint").alias("version"),
        F.to_timestamp(F.lit("1970-01-01")).alias("valid_from"),
        change_date.alias("valid_to"),
    )
    v2 = cust.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_V2")).alias("segment"),
        F.lit(2).cast("bigint").alias("version"),
        change_date.alias("valid_from"),
        F.to_timestamp(F.lit("9999-12-31")).alias("valid_to"),
    )
    hist = v1.unionByName(v2)
    joined = orders.join(
        hist,
        (orders.o_custkey == hist.c_custkey)
        & (orders.o_orderdate >= hist.valid_from)
        & (orders.o_orderdate < hist.valid_to),
    )
    return joined.groupBy("segment", "version").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence with lift: part pairs bought in the same
# order, scored by lift = P(a,b) / (P(a) P(b)), floored on support.
# The pair fan-out is per-order C(basket, 2) — bounded by basket size
# (~4 lines here), NEVER corpus x corpus; the self-join key is the
# order id, so at 100 TB it is one keyed shuffle and the pair counts
# combine map-side. The association-rules primitive for recommender
# candidate generation.
# ---------------------------------------------------------------------------
_BASKET_MIN_SUPPORT = 3


@query(
    "part_cooccurrence_lift",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM baskets),
    part_n AS (SELECT l_partkey, count(*) AS np FROM baskets GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS nab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, CAST(nab AS BIGINT) AS nab,
           round((nab / n_orders.n)
                 / ((pa.np / n_orders.n) * (pb.np / n_orders.n)), 4) AS lift
    FROM pairs
    JOIN part_n pa ON pa.l_partkey = part_a
    JOIN part_n pb ON pb.l_partkey = part_b
    CROSS JOIN n_orders
    WHERE nab >= {_BASKET_MIN_SUPPORT}
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
    operators=("C9", "C1", "D1", "D3", "F2", "H6"),
)
def part_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    part_n = baskets.groupBy("l_partkey").agg(F.count("*").alias("np"))
    a = baskets.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("nab"))
        .filter(F.col("nab") >= _BASKET_MIN_SUPPORT)
    )
    pa = part_n.select(F.col("l_partkey").alias("part_a"), F.col("np").alias("na"))
    pb = part_n.select(F.col("l_partkey").alias("part_b"), F.col("np").alias("nb"))
    scored = (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("nab").cast("bigint").alias("nab"),
            F.round(
                (F.col("nab") / F.col("n"))
                / ((F.col("na") / F.col("n")) * (F.col("nb") / F.col("n"))),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b")).limit(20)


# ---------------------------------------------------------------------------
# Supplier SLA fill rate: share of a supplier's line items shipped
# within 30 days of the order date, with average ship delay — the
# operational scorecard behind supplier ranking. One fact-fact join on
# the order key (ShuffledHash at scale, like the Q3/Q10 shapes) and a
# conditional aggregate per supplier.
# ---------------------------------------------------------------------------
@query(
    "supplier_fill_rate",
    oracle="""
    SELECT l_suppkey,
           count(*) AS n_lines,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 4)
             AS avg_ship_delay_days,
           round(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                          THEN 1.0 ELSE 0.0 END) / count(*), 6) AS fill_rate_30d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_suppkey
    """,
    operators=("C1", "D1", "H5", "B8", "H6"),
)
def supplier_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    delay = F.date_diff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg(delay), 4).alias("avg_ship_delay_days"),
            F.round(
                F.sum(F.when(delay <= 30, 1.0).otherwise(0.0)) / F.count("*"),
                6,
            ).alias("fill_rate_30d"),
        )
    )


# ---------------------------------------------------------------------------
# Unit-price dispersion per part: coefficient of variation of the
# realized unit price (extendedprice / quantity) across a part's line
# items — the pricing-consistency screen (high CV = negotiated chaos or
# data errors). One keyed stats aggregate; top-20 most dispersed via
# TakeOrdered, floored on a line count so singleton parts don't rank.
# ---------------------------------------------------------------------------
@query(
    "part_price_dispersion",
    oracle="""
    WITH up AS (
      SELECT l_partkey, l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    ),
    stats AS (
      SELECT l_partkey, count(*) AS n,
             avg(unit_price) AS mu, stddev_samp(unit_price) AS sigma
      FROM up GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(n AS BIGINT) AS n_lines,
           round(mu, 4) AS mean_unit_price,
           round(sigma / mu, 6) AS price_cv
    FROM stats
    WHERE n >= 5
    ORDER BY price_cv DESC, l_partkey
    LIMIT 20
    """,
    operators=("D5", "B2", "H6", "F2"),
)
def part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    up = li.filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    stats = up.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.avg("unit_price").alias("mu"),
        F.stddev_samp("unit_price").alias("sigma"),
    )
    return (
        stats.filter(F.col("n") >= 5)
        .select(
            "l_partkey",
            F.col("n").cast("bigint").alias("n_lines"),
            F.round("mu", 4).alias("mean_unit_price"),
            F.round(F.col("sigma") / F.col("mu"), 6).alias("price_cv"),
        )
        .orderBy(F.desc("price_cv"), F.asc("l_partkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Return-rate offenders: parts whose line items are flagged 'R'
# (returned) far above the corpus base rate — the product-quality
# screen. Per-part conditional aggregate vs a broadcast base rate;
# floored on volume, top-20 by excess ratio.
# ---------------------------------------------------------------------------
@query(
    "part_return_rate_offenders",
    oracle="""
    WITH base AS (
      SELECT sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)
             / count(*) AS base_rate
      FROM lineitem
    ),
    per_part AS (
      SELECT l_partkey, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END)
             / count(*) AS return_rate
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(n AS BIGINT) AS n_lines,
           round(return_rate, 6) AS return_rate,
           round(return_rate / (SELECT base_rate FROM base), 4) AS vs_base
    FROM per_part
    WHERE n >= 10
    ORDER BY return_rate / (SELECT base_rate FROM base) DESC, l_partkey
    LIMIT 20
    """,
    operators=("D1", "D2", "B8", "H6", "F2"),
)
def part_return_rate_offenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    is_r = F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
    base = li.agg((F.sum(is_r) / F.count("*")).alias("base_rate"))
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        (F.sum(is_r) / F.count("*")).alias("return_rate"),
    )
    return (
        per_part.filter(F.col("n") >= 10)
        .crossJoin(F.broadcast(base))
        .select(
            "l_partkey",
            F.col("n").cast("bigint").alias("n_lines"),
            F.round("return_rate", 6).alias("return_rate"),
            F.round(F.col("return_rate") / F.col("base_rate"), 4).alias(
                "vs_base"
            ),
        )
        .orderBy(F.desc("vs_base"), F.asc("l_partkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q3-shape shipping priority: revenue of not-yet-shipped lineitems on
# BUILDING-segment customers' pre-cutoff orders, top-10 orders. The
# classic 3-table star probe: both date predicates push into the fact
# scans, customer carries NO broadcast hint (it scales with SF — AQE
# decides from runtime stats), and the top-10 is a
# TakeOrderedAndProject — no global sort. (The fixture carries no
# o_shippriority column; the ranking semantics are unchanged without it.)
# ---------------------------------------------------------------------------
@query(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    operators=("C1", "C2", "B2", "D1", "F2"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < "1995-03-15")
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > "1995-03-15")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    # no broadcast hint on customer: it SCALES with SF (fact-join policy,
    # SCALE.md) — AQE broadcasts it from runtime stats while small and
    # shuffles when not; the segment filter pre-shrinks it either way
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).join(
        li, li["l_orderkey"] == orders["o_orderkey"]
    )
    agg = joined.groupBy(
        F.col("l_orderkey").alias("o_orderkey"), "o_orderdate"
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return agg.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


# ---------------------------------------------------------------------------
# B8/H5 ops view: open-order backlog aging. Non-finalized orders ('O' /
# 'P') bucketed by age relative to the corpus max order date — the
# fulfillment dashboard's aging report. One scan, calendar arithmetic,
# map-side-combined aggregate.
# ---------------------------------------------------------------------------
@query(
    "orders_backlog_aging",
    oracle="""
    WITH ref AS (SELECT max(o_orderdate) AS dmax FROM orders)
    SELECT o_orderstatus,
           CASE WHEN date_diff('day', o_orderdate, ref.dmax) < 365 THEN '<1y'
                WHEN date_diff('day', o_orderdate, ref.dmax) < 1095 THEN '1-3y'
                ELSE '3y+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS backlog_value
    FROM orders, ref
    WHERE o_orderstatus <> 'F'
    GROUP BY 1, 2
    """,
    operators=("B8", "H5", "D1", "B2"),
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("dmax"))
    age = F.datediff(F.col("dmax"), F.col("o_orderdate"))
    bucket = (
        F.when(age < 365, "<1y").when(age < 1095, "1-3y").otherwise("3y+")
    )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(ref))
        .groupBy("o_orderstatus", bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("backlog_value"),
        )
    )


# ---------------------------------------------------------------------------
# D5 market-structure analytic: supplier revenue concentration per
# nation as a Herfindahl-Hirschman index — sum of squared revenue
# shares; 1/n for perfectly even supply, 1.0 for a monopoly. Two keyed
# aggregates; the per-nation totals broadcast into the share division.
# ---------------------------------------------------------------------------
@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    tot AS (SELECT s_nationkey, sum(r) AS t, count(*) AS n_sup
            FROM rev GROUP BY s_nationkey)
    SELECT rev.s_nationkey AS nationkey,
           CAST(max(tot.n_sup) AS BIGINT) AS n_suppliers,
           round(sum((rev.r / tot.t) * (rev.r / tot.t)), 6) AS hhi
    FROM rev JOIN tot USING (s_nationkey)
    GROUP BY rev.s_nationkey
    """,
    operators=("D5", "D1", "C1", "H6"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
        )
    )
    tot = rev.groupBy(F.col("s_nationkey").alias("tn")).agg(
        F.sum("r").alias("t"), F.count("*").alias("n_sup")
    )
    share2 = (F.col("r") / F.col("t")) * (F.col("r") / F.col("t"))
    return (
        rev.join(F.broadcast(tot), rev["s_nationkey"] == tot["tn"])
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.max("n_sup").cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share2), 6).alias("hhi"),
        )
    )


# ---------------------------------------------------------------------------
# H5/D1: weekday revenue profile — the calendar seasonality view
# (ISO day-of-week so both engines number Monday=1..Sunday=7).
# ---------------------------------------------------------------------------
@query(
    "weekday_revenue_profile",
    oracle="""
    SELECT CAST(isodow(o_orderdate) AS INTEGER) AS iso_weekday,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           round(avg(o_totalprice), 4) AS avg_order_value
    FROM orders GROUP BY 1
    """,
    operators=("H5", "D1", "H6"),
)
def weekday_revenue_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Spark dayofweek: Sunday=1..Saturday=7; convert to ISO Monday=1..Sunday=7
    iso = ((F.dayofweek("o_orderdate") + 5) % 7) + 1
    return orders.groupBy(iso.cast("int").alias("iso_weekday")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
    )


# ---------------------------------------------------------------------------
# B8/D1 pricing view: quantity response by discount band — the
# elasticity read a pricing review starts from (does deeper discounting
# actually move volume?). Single scan, banded aggregate.
# ---------------------------------------------------------------------------
@query(
    "discount_quantity_elasticity",
    oracle="""
    SELECT CASE WHEN l_discount < 0.03 THEN '0-2%'
                WHEN l_discount < 0.06 THEN '3-5%'
                WHEN l_discount < 0.09 THEN '6-8%'
                ELSE '9%+' END AS discount_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(l_quantity), 4) AS avg_quantity,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_revenue
    FROM lineitem GROUP BY 1
    """,
    operators=("B8", "D1", "H6", "B3"),
)
def discount_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") < 0.03, "0-2%")
        .when(F.col("l_discount") < 0.06, "3-5%")
        .when(F.col("l_discount") < 0.09, "6-8%")
        .otherwise("9%+")
    )
    return li.groupBy(band.alias("discount_band")).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.avg("l_quantity"), 4).alias("avg_quantity"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("net_revenue"),
    )


# ---------------------------------------------------------------------------
# D5/H6 revenue-concentration curve: what share of total revenue the
# top-decile customers carry — the 80/20 read on the customer base.
# Exact interpolated decile via window percent_rank (identical
# definition both engines when computed from the explicit rank/count).
# ---------------------------------------------------------------------------
@query(
    "customer_revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT r, row_number() OVER (ORDER BY r DESC, o_custkey) AS rn,
             count(*) OVER () AS n
      FROM rev
    )
    SELECT CAST(count(*) FILTER (WHERE rn <= ceil(n / 10.0)) AS BIGINT)
             AS n_top_decile,
           round(sum(r) FILTER (WHERE rn <= ceil(n / 10.0)) / sum(r), 6)
             AS top_decile_revenue_share,
           round(sum(r), 2) AS total_revenue
    FROM ranked
    """,
    operators=("D5", "D1", "E1", "H6"),
)
def customer_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import with_global_row_number

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    # bucketed exact global rank: the customer dimension is
    # corpus-proportional (~15M rows/TB), so the rank must never funnel
    # through one task — with_global_row_number keys every exchange
    ranked = with_global_row_number(
        rev,
        "r",
        [F.asc("o_custkey")],
        descending=True,
        rn_col="rn",
        total_col="n",
    ).select("r", "rn", "n")
    top = F.col("rn") <= F.ceil(F.col("n") / 10.0)
    return ranked.agg(
        F.count(F.when(top, 1)).cast("bigint").alias("n_top_decile"),
        F.round(
            F.sum(F.when(top, F.col("r"))) / F.sum("r"), 6
        ).alias("top_decile_revenue_share"),
        F.round(F.sum("r"), 2).alias("total_revenue"),
    )
