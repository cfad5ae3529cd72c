"""Scalar-function surface + remaining aggregate/join forms
(SURVEY.md §2 H5, H9, D4, D6, D7-cube, C6, L6, K2-langid).

Each query exercises one function family end-to-end with an oracle twin
where the function is SQL-expressible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# H5: date/time functions — order-year rollup + shipping delay
# ---------------------------------------------------------------------------
@query(
    "order_year_stats",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS order_year,
           count(*)                            AS n_lineitems,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_ship_delay_days,
           min(date_trunc('quarter', o_orderdate))                  AS first_quarter
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
    operators=("H5", "C1", "D1"),
)
def order_year_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 4).alias(
                "avg_ship_delay_days"
            ),
            F.min(F.date_trunc("quarter", "o_orderdate")).alias("first_quarter"),
        )
    )


# ---------------------------------------------------------------------------
# H9: map functions over the JSON props payload
# ---------------------------------------------------------------------------
@query(
    "events_map_props",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE json_extract(props, '$.k') IS NOT NULL) AS n_with_k,
           round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6)      AS avg_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT))                AS max_k
    FROM events
    GROUP BY event_type
    """,
    operators=("H9", "H10", "D1"),
)
def events_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.withColumn("m", m)
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.map_contains_key("m", F.lit("k")), 1)).alias("n_with_k"),
            F.round(F.avg(F.element_at("m", F.lit("k"))), 6).alias("avg_k"),
            F.max(F.element_at("m", F.lit("k"))).alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# D6: collect_list / collect_set (deterministic via sort_array -> string)
# ---------------------------------------------------------------------------
@query(
    "user_event_collections",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           array_to_string(list_sort(list(event_id)), ',')            AS event_ids
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
    operators=("D6",),
)
def user_event_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types_seen"),
        F.concat_ws(",", F.sort_array(F.collect_list("event_id"))).alias("event_ids"),
    )


# ---------------------------------------------------------------------------
# D7: CUBE (rollup's sibling) over two independent dimensions
# ---------------------------------------------------------------------------
@query(
    "cube_order_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    operators=("D7",),
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# C6: theta / band (range) join — acctbal proximity pairs
# ---------------------------------------------------------------------------
@query(
    "acctbal_band_join",
    oracle="""
    SELECT s_suppkey, count(*) AS n_close_customers
    FROM supplier
    JOIN customer
      ON c_custkey <= 200
     AND s_acctbal BETWEEN c_acctbal - 100 AND c_acctbal + 100
    GROUP BY s_suppkey
    """,
    operators=("C6", "D1"),
)
def acctbal_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: Spark plans broadcast-nested-loop with the
    small side broadcast — the only sane physical shape for a pure range
    predicate. At 100 TB you'd bucketize the band key first (turn it into
    equi-join on bucket +/- 1); this query keeps the pure form honest."""
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    cond = (F.col("s_acctbal") >= F.col("c_acctbal") - 100) & (
        F.col("s_acctbal") <= F.col("c_acctbal") + 100
    )
    return (
        supp.join(F.broadcast(cust), cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close_customers"))
    )


# ---------------------------------------------------------------------------
# D4: approximate distinct (HLL). The sketch estimate itself is engine-
# specific, so the ORACLE-CHECKED contract is the exact count plus the
# 5% accuracy envelope as a boolean: the hash matches only if Spark's
# HLL++ estimate lands within 5% of the true distinct for every group.
# ---------------------------------------------------------------------------
@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    operators=("D4", "D3"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id") - F.countDistinct("user_id")
            )
            <= 0.05 * F.countDistinct("user_id")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# D4 mergeable-sketch architecture: Apache DataSketches HLL via Spark's
# hll_sketch_agg / hll_union_agg. The 100 TB pattern this demonstrates:
# per-partition (here per-day) sketches are built ONCE, stored small
# (~4 KB each), and any rollup (week, month, all-time) is a UNION of
# sketches — never a rescan of raw events. The union of same-lgK HLL
# sketches is register-wise max, so estimate(union(daily)) must track
# estimate(direct-over-all-rows) to well under the sketch's own
# standard error — the oracle-checked merge invariant uses a 1%
# envelope (union results read through DataSketches' composite
# estimator, update-built sketches through HIP, and whether the
# direct agg internally merges depends on partition layout, so exact
# equality could flake under different parallelism), alongside the
# approx_distinct_users-style 5% accuracy envelope vs the exact
# distinct. Sketch bytes themselves
# are engine-specific and stay out of the compared columns.
# ---------------------------------------------------------------------------
@query(
    "hll_daily_merge_rollup",
    oracle="""
    SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total,
           CAST((SELECT sum(d) FROM (
              SELECT count(DISTINCT user_id) AS d
              FROM events GROUP BY CAST(ts AS DATE))) AS BIGINT)
             AS sum_daily_exact,
           true AS merged_matches_direct,
           true AS merged_within_5pct
    FROM events
    """,
    operators=("D4", "D3", "H5"),
)
def hll_daily_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("d_exact"),
    )
    rolled = daily.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est_merged"),
        F.sum("d_exact").cast("bigint").alias("sum_daily_exact"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_est_direct"),
        F.countDistinct("user_id").cast("bigint").alias("exact_total"),
    )
    return rolled.crossJoin(direct).select(
        "n_days",
        "exact_total",
        "sum_daily_exact",
        # 1% envelope, not exact equality: a union result reads through
        # DataSketches' composite estimator while an update-built sketch
        # uses HIP, and whether the "direct" agg internally merges
        # depends on partition layout — exact equality can flake under
        # different parallelism even when both estimates are sound
        # (round-7 ADVICE). 1% is far tighter than the lgK=12 standard
        # error (~1.6%) yet robust to the estimator-path difference.
        (
            F.abs(F.col("_est_merged") - F.col("_est_direct"))
            <= 0.01 * F.col("_est_direct")
        ).alias("merged_matches_direct"),
        (
            F.abs(F.col("_est_merged") - F.col("exact_total"))
            <= 0.05 * F.col("exact_total")
        ).alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# K2: language-ID heuristic (marker-word overlap, argmax)
# ---------------------------------------------------------------------------
_EN = ("the", "and", "of", "to", "in", "a")
_ES = ("el", "la", "de", "en", "y", "los")


@query(
    "doc_lang_id",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains(['{"', '".join(_EN)}'], x))) AS BIGINT) AS en_score,
           CAST(len(list_filter(toks, x -> list_contains(['{"', '".join(_ES)}'], x))) AS BIGINT) AS es_score,
           CASE WHEN len(list_filter(toks, x -> list_contains(['{"', '".join(_EN)}'], x)))
                  >= len(list_filter(toks, x -> list_contains(['{"', '".join(_ES)}'], x)))
                THEN 'en' ELSE 'es' END AS pred_lang
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    WHERE doc_id < 100
    """,
    operators=("K2", "H8"),
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split(F.lower("text"), " ")
    en = F.size(F.filter(toks, lambda x: x.isin(*_EN))).cast("bigint")
    es = F.size(F.filter(toks, lambda x: x.isin(*_ES))).cast("bigint")
    return docs.select(
        "doc_id",
        en.alias("en_score"),
        es.alias("es_score"),
        F.when(en >= es, "en").otherwise("es").alias("pred_lang"),
    )


# ---------------------------------------------------------------------------
# K2: BPE-ish subword token counting via regex (both engines share the
# pattern; greedy left-to-right matching is identical)
# ---------------------------------------------------------------------------
@query(
    "doc_bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z]{1,4}')) AS BIGINT) AS n_subwords,
           CAST(len(string_split(text, ' ')) AS BIGINT)                       AS n_words
    FROM documents
    WHERE doc_id < 100
    """,
    operators=("K2", "H2"),
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{1,4}"), 0))
        .cast("bigint")
        .alias("n_subwords"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# L6: UDTF — chunk long documents into fixed-width segments
# ---------------------------------------------------------------------------
_CHUNK = 100


@query(
    "doc_chunks_udtf",
    oracle=f"""
    SELECT doc_id, i AS chunk_idx,
           substr(text, 1 + (CAST(i AS INTEGER) - 1) * {_CHUNK}, {_CHUNK}) AS chunk
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, CAST(ceil(length(text) / {_CHUNK}.0) AS BIGINT))) AS i
        FROM documents
        WHERE doc_id < 50
    )
    """,
    operators=("L6", "H1"),
)
def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx bigint, chunk string")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            for i in range(0, len(text), _CHUNK):
                yield doc_id, i // _CHUNK + 1, text[i : i + _CHUNK]

    spark.udtf.register("chunk_doc", ChunkDoc)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM documents_v d, LATERAL chunk_doc(d.doc_id, d.text) c
        WHERE d.doc_id < 50
        """
    )


# ---------------------------------------------------------------------------
# D7 completion: GROUPING SETS with grouping_id — independent aggregation
# granularities in one pass (rollup/cube's general form)
# ---------------------------------------------------------------------------
@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')               AS status,
           coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
           count(*)                                     AS n_orders,
           round(sum(o_totalprice), 2)                  AS total,
           CAST(grouping(o_orderstatus) * 2 + grouping(year(o_orderdate)) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
    """,
    operators=("D7", "H5"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')                      AS status,
               coalesce(CAST(year(o_orderdate) AS STRING), 'ALL')  AS yr,
               count(*)                                            AS n_orders,
               round(sum(o_totalprice), 2)                         AS total,
               CAST(grouping(o_orderstatus) * 2 + grouping(year(o_orderdate)) AS BIGINT) AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
        """
    )


# ---------------------------------------------------------------------------
# Skew-salted join as a DRIVER-CHECKED query (the helper lives in
# skew.py; this registers its semantics): events.user_id x customer,
# hot keys spread over 8 salts. Salting is a pure physical rewrite —
# identical rows out — so the oracle is the PLAIN join aggregated per
# segment; the hash compare proves the rewrite changes nothing. AQE
# skew-split is the first line of defense; this is the deterministic
# fallback for keys too hot even for split partitions.
# ---------------------------------------------------------------------------
@query(
    "salted_event_segment_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    operators=("C1", "D1", "H4"),
)
def salted_event_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.skew import salted_join

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on="user_id", n_salts=8, salt_source="event_id")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# D-surface parity: max_by / min_by — the latest-event-snapshot per key
# WITHOUT a window: one aggregate pass (map-side combinable) instead of
# a sort-based row_number filter, the cheaper plan when only the argmax
# row is needed. Tie-broken by event_id inside a struct so both engines
# pick identically.
# ---------------------------------------------------------------------------
@query(
    "latest_event_snapshot",
    oracle="""
    WITH keyed AS (
      SELECT *, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
      FROM events
    )
    SELECT user_id,
           arg_max(event_type, k) AS last_type,
           arg_max(value, k)      AS last_value,
           max(ts)                AS last_ts,
           arg_min(event_type, k) AS first_type
    FROM keyed
    GROUP BY user_id
    """,
    operators=("D1", "D6", "E2"),
)
def latest_event_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # sortable string key: DuckDB's arg_max does not take struct keys
    epoch = F.timestamp_diff(
        "MICROSECOND", F.to_timestamp(F.lit("1970-01-01")).cast("timestamp_ntz")
        if dict(ev.dtypes)["ts"] == "timestamp_ntz"
        else F.to_timestamp(F.lit("1970-01-01")),
        F.col("ts"),
    )
    key = F.concat(
        F.lpad(epoch.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("last_type"),
        F.max_by("value", key).alias("last_value"),
        F.max("ts").alias("last_ts"),
        F.min_by("event_type", key).alias("first_type"),
    )


# ---------------------------------------------------------------------------
# D3/D4: bitmap-accelerated exact distinct count — integer keys bucket
# into fixed-width bitmaps (bitmap_bucket_number / bit_position), each
# bucket ORs its bits with bitmap_construct_agg, and the counts sum.
# EXACT like COUNT(DISTINCT) but mergeable like a sketch (bitmaps OR
# across partitions/days), the materialized-rollup trick for int-keyed
# distinct counts at 100 TB. The oracle replays the plain distinct
# count — equality IS the check.
# ---------------------------------------------------------------------------
@query(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_distinct_users
    FROM events
    GROUP BY event_type
    """,
    operators=("D3", "D4", "H4", "D1"),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_distinct_users")
    )


# ---------------------------------------------------------------------------
# C6 at 100 TB: the BUCKETIZED range join — the scale path the pure
# broadcast-nested-loop form (acctbal_band_join above) deliberately
# doesn't take. Bucket width = band width, explode ONE side into its 3
# adjacent buckets, keyed equi-join on the bucket, exact band filter
# after. Both sides shuffle on the bucket key (no broadcast, no nested
# loop, no row cap); per-row candidate fan-in is bounded by bucket
# occupancy. Identical results to the pure form, proven by the oracle
# running the plain band join.
# ---------------------------------------------------------------------------
@query(
    "acctbal_band_join_bucketized",
    oracle="""
    SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_close_customers
    FROM supplier JOIN customer
      ON s_acctbal BETWEEN c_acctbal - 100 AND c_acctbal + 100
    GROUP BY s_suppkey
    """,
    operators=("C6", "D1", "H6"),
)
def acctbal_band_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.floor(F.col("s_acctbal") / 100).cast("long").alias("sb"),
    )
    cand = supp.select(
        "s_suppkey",
        "s_acctbal",
        F.explode(
            F.array(F.col("sb") - 1, F.col("sb"), F.col("sb") + 1)
        ).alias("bucket"),
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_acctbal", F.floor(F.col("c_acctbal") / 100).cast("long").alias("bucket")
    )
    # each (s, c) pair can match in at most one bucket (c's bucket is
    # unique), so no post-join dedup is needed
    return (
        cand.join(cust, "bucket")
        .filter(
            (F.col("s_acctbal") >= F.col("c_acctbal") - 100)
            & (F.col("s_acctbal") <= F.col("c_acctbal") + 100)
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").cast("bigint").alias("n_close_customers"))
    )


# ---------------------------------------------------------------------------
# D4/D5: approximate quantiles with an oracle-checked accuracy envelope
# (the approx_distinct_users pattern applied to approx_percentile): the
# sketch values are engine-specific, so the checked contract is the
# exact quantiles plus a boolean asserting the sketch landed within 1%
# of the value RANGE for every probed quantile.
# ---------------------------------------------------------------------------
@query(
    "approx_price_quantiles",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                      AS n,
           round(quantile_cont(o_totalprice, 0.5), 6)    AS p50,
           round(quantile_cont(o_totalprice, 0.9), 6)    AS p90,
           round(quantile_cont(o_totalprice, 0.99), 6)   AS p99,
           true AS approx_within_1pct_of_range
    FROM orders
    """,
    operators=("D4", "D5", "D2"),
)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))")
    approx = F.expr(
        "approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)"
    )
    rng = F.max("o_totalprice") - F.min("o_totalprice")
    agg = orders.agg(
        F.count("*").alias("n"),
        exact.alias("ex"),
        approx.alias("ap"),
        rng.alias("rng"),
    )
    within = F.aggregate(
        F.zip_with(
            F.col("ex"), F.col("ap"), lambda e, a: F.abs(e - a) <= 0.01 * F.col("rng")
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    return agg.select(
        "n",
        F.round(F.element_at("ex", 1), 6).alias("p50"),
        F.round(F.element_at("ex", 2), 6).alias("p90"),
        F.round(F.element_at("ex", 3), 6).alias("p99"),
        within.alias("approx_within_1pct_of_range"),
    )


# ---------------------------------------------------------------------------
# H4/D2: order-insensitive table content checksum — the migration /
# replication integrity primitive for 100 TB copies: one narrow scan,
# one tiny aggregate row out, no sort anywhere. Per-row signature =
# first 15 hex digits of md5 over a canonical projection (stable-typed
# columns; money cast to DECIMAL(18,2) so both engines render identical
# strings); the table signature combines XOR (order-insensitive, exact)
# with a modular sum and the row count so pair-cancellation can't slip
# through. DuckDB recomputes the identical signature from the same
# parquet — a cross-engine checksum equality proof.
# ---------------------------------------------------------------------------
@query(
    "table_content_checksum",
    oracle="""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR),
               CAST(o_custkey AS VARCHAR),
               o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
               o_orderpriority)), 1, 15)) AS BIGINT) AS sig
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT)            AS n_rows,
           CAST(bit_xor(sig) AS BIGINT)        AS xor_sig,
           CAST(sum(sig % 1000003) AS BIGINT)  AS modsum_sig
    FROM h
    """,
    operators=("H4", "D2", "A1"),
)
def table_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.col("o_orderpriority"),
    )
    sig = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return orders.select(sig.alias("sig")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(sig)").cast("long").alias("xor_sig"),
        F.sum(F.col("sig") % 1000003).cast("long").alias("modsum_sig"),
    )


# ---------------------------------------------------------------------------
# B-group surface: UNPIVOT (wide -> long) — melting measure columns is the
# standard prep step before generic per-metric aggregation/plotting. Spark's
# df.unpivot is a zero-shuffle projection (each row fans out to
# len(measures) rows map-side); the agg after it combines map-side.
# ---------------------------------------------------------------------------
@query(
    "unpivot_measure_stats",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure, count(*) AS n,
           round(sum(val), 2) AS sum_val, round(avg(val), 6) AS avg_val
    FROM long GROUP BY l_returnflag, measure
    """,
    operators=("B1", "D1", "G1"),
)
def unpivot_measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("val"), 2).alias("sum_val"),
        F.round(F.avg("val"), 6).alias("avg_val"),
    )


# ---------------------------------------------------------------------------
# D-group surface: FILTER (WHERE ...) aggregate clauses — one scan computing
# several differently-filtered aggregates (the alternative is N scans or
# N CASE-WHEN pyramids). Identical ANSI syntax in Spark and DuckDB.
# ---------------------------------------------------------------------------
@query(
    "filtered_agg_priority_profile",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                                  AS n_orders,
           count(*)    FILTER (WHERE o_orderstatus = 'F')            AS n_finished,
           round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1995), 2)
                                                                     AS rev_1995,
           round(avg(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2)
                                                                     AS avg_big_order
    FROM orders GROUP BY o_orderpriority
    """,
    operators=("D1", "B8", "H5"),
)
def filtered_agg_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr("count(*) FILTER (WHERE o_orderstatus = 'F')").alias("n_finished"),
        F.expr(
            "round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1995), 2)"
        ).alias("rev_1995"),
        F.expr(
            "round(avg(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2)"
        ).alias("avg_big_order"),
    )


# ---------------------------------------------------------------------------
# D4 planning statistic: join-cardinality estimate from HLL sketches by
# inclusion-exclusion — |A∩B| ~= est(A) + est(B) - est(A∪B). At 100 TB this
# is how you price a join BEFORE running it: two linear passes producing
# KB-sized mergeable sketches, no shuffle join. The oracle pins the exact
# overlap and asserts the estimate lands within 10% (same envelope pattern
# as approx_distinct_users).
# ---------------------------------------------------------------------------
@query(
    "join_cardinality_estimate",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT)  AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT)  AS exact_b,
           CAST((SELECT count(*) FROM a JOIN b USING (user_id)) AS BIGINT)
                                                     AS exact_overlap,
           true                                      AS approx_within_10pct
    """,
    operators=("D4", "D3", "C1"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    sk = a.agg(F.hll_sketch_agg("user_id").alias("sk")).unionAll(
        b.agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    est_union = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    ests = (
        a.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_a"))
        .crossJoin(
            b.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_b"))
        )
        .crossJoin(est_union)
    )
    exacts = (
        a.distinct()
        .agg(F.count("*").alias("exact_a"))
        .crossJoin(b.distinct().agg(F.count("*").alias("exact_b")))
        .crossJoin(
            a.distinct()
            .join(b.distinct(), "user_id")
            .agg(F.count("*").alias("exact_overlap"))
        )
    )
    return exacts.crossJoin(ests).select(
        "exact_a",
        "exact_b",
        "exact_overlap",
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                - F.col("exact_overlap")
            )
            <= 0.10 * F.col("exact_overlap")
        ).alias("approx_within_10pct"),
    )


# ---------------------------------------------------------------------------
# C5 data quality: referential-integrity audit — the standard pre-flight
# before any fact-dim join pipeline. Each check is one left-anti join
# (shuffle on the key, zero rows out when the constraint holds); a clean
# corpus returns 0s, which the oracle pins exactly rather than assuming.
# ---------------------------------------------------------------------------
@query(
    "referential_orphan_audit",
    oracle="""
    SELECT 'lineitem_without_order' AS check_name,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'order_without_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer_without_order',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey)) AS BIGINT)
    """,
    operators=("C5", "G1", "D2"),
)
def referential_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    def check(name: str, left: DataFrame, lk: str, right: DataFrame, rk: str):
        return (
            left.join(right, left[lk] == right[rk], "left_anti")
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )

    return (
        check("lineitem_without_order", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(check("order_without_customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(check("customer_without_order", cust, "c_custkey", orders, "o_custkey"))
    )


# ---------------------------------------------------------------------------
# D5 statistical test: chi-square independence of the (priority, status)
# contingency table. Observed/expected both come from ONE scan (groupBy +
# two broadcast-sized margin aggregates); the test statistic is a pure
# expression — the pattern for any categorical-drift or A/B independence
# check over 100 TB of rows with a bounded category domain.
# ---------------------------------------------------------------------------
@query(
    "chi_square_priority_status",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS o
      FROM orders GROUP BY 1, 2
    ), rowm AS (SELECT pri, sum(o) AS r FROM obs GROUP BY pri),
       colm AS (SELECT st, sum(o) AS c FROM obs GROUP BY st),
       tot  AS (SELECT sum(o) AS n FROM obs)
    SELECT round(sum(pow(obs.o - (rowm.r * colm.c / tot.n), 2)
                     / (rowm.r * colm.c / tot.n)), 4) AS chi2,
           CAST((count(DISTINCT obs.pri) - 1) * (count(DISTINCT obs.st) - 1) AS BIGINT)
             AS dof
    FROM obs JOIN rowm USING (pri) JOIN colm USING (st) CROSS JOIN tot
    """,
    operators=("D5", "D1", "H6"),
)
def chi_square_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    ).agg(F.count("*").alias("o"))
    rowm = obs.groupBy("pri").agg(F.sum("o").alias("r"))
    colm = obs.groupBy("st").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    return (
        obs.join(F.broadcast(rowm), "pri")
        .join(F.broadcast(colm), "st")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - exp, F.lit(2)) / exp), 4).alias("chi2"),
            (
                (F.countDistinct("pri") - 1) * (F.countDistinct("st") - 1)
            ).cast("long").alias("dof"),
        )
    )


# ---------------------------------------------------------------------------
# H5/H7: calendar gap-fill WITHOUT recursion — sequence() + explode builds
# the date spine as one bounded array (days between min and max), then a
# left join zero-fills missing days. This is the 100 TB form of the date
# spine (sql_recursive_date_spine_gaps shows the WITH RECURSIVE
# equivalent and SCALE.md documents why recursion does not scale: the
# spine here is O(days), computed once, never iterative).
# ---------------------------------------------------------------------------
@query(
    "calendar_fill_daily_revenue",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
             CAST(max(date_trunc('day', ts)) AS DATE) AS d1
      FROM events
    ), spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n, round(sum(value), 2) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT CAST(spine.day AS TIMESTAMP) AS day,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n_purchases,
           round(coalesce(daily.rev, 0.0), 2)   AS revenue
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    operators=("H5", "H7", "C3", "D1"),
)
def calendar_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("rev"))
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_purchases"),
            F.round(F.coalesce("rev", F.lit(0.0)), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# D5 two-sample Kolmogorov-Smirnov distance between per-source length
# distributions (src0 vs src1) — the standard "did this source drift /
# differ?" test for corpus curation. ECDFs are built with window
# COUNTs over the pooled sample (one exchange, no collect); the KS
# statistic is the max ECDF gap evaluated at sample points (where the
# max is always attained). Bounded-domain groupings keep this shape
# identical at any corpus size.
# ---------------------------------------------------------------------------
@query(
    "ks_source_length_drift",
    oracle="""
    WITH pool AS (
      SELECT n_chars, source FROM documents WHERE source IN ('src0', 'src1')
    ), sizes AS (
      SELECT count(*) FILTER (WHERE source = 'src0') AS na,
             count(*) FILTER (WHERE source = 'src1') AS nb
      FROM pool
    ), pts AS (
      SELECT DISTINCT n_chars AS v FROM pool
    ), ecdf AS (
      SELECT pts.v,
             (SELECT count(*) FROM pool WHERE source = 'src0' AND n_chars <= pts.v)
               AS ca,
             (SELECT count(*) FROM pool WHERE source = 'src1' AND n_chars <= pts.v)
               AS cb
      FROM pts
    )
    SELECT CAST(sizes.na AS BIGINT) AS n_a,
           CAST(sizes.nb AS BIGINT) AS n_b,
           round(max(abs(CAST(ca AS DOUBLE) / sizes.na
                         - CAST(cb AS DOUBLE) / sizes.nb)), 5) AS ks_stat
    FROM ecdf CROSS JOIN sizes
    GROUP BY sizes.na, sizes.nb
    """,
    operators=("D5", "D2", "B4"),
)
def ks_source_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import with_global_prefix_sums

    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    # Reduce the pool to one row per distinct value first (the ECDF's
    # sample points), then build both cumulative counts with the bucketed
    # distributed prefix-sum primitive — NO single-partition window over
    # corpus-scaling input (ranking.py; the naive Window.orderBy form is
    # exactly what tools/plan_audit.py hard-flags). Both ECDFs cumulate
    # under ONE bucket pass (round 15) — two chained single-weight calls
    # re-derived the first call's whole plan inside the second.
    per_v = (
        docs.groupBy("n_chars")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("wa"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("wb"),
        )
    )
    t = with_global_prefix_sums(
        per_v, "n_chars", ["wa", "wb"], ["ca0", "cb0"], ["na", "nb"]
    )
    # inclusive ECDF counts at each sample point
    t = t.withColumn("ca", F.col("ca0") + F.col("wa")).withColumn(
        "cb", F.col("cb0") + F.col("wb")
    )
    return t.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("na")
                    - F.col("cb").cast("double") / F.col("nb")
                )
            ),
            5,
        ).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# D5 time-series: lag-1 autocorrelation of daily purchase revenue — the
# "is today predictive of tomorrow?" screen before forecasting. corr()
# over the (day, lag(day)) pairs; one bounded daily aggregate then one
# tiny window.
# ---------------------------------------------------------------------------
@query(
    "daily_revenue_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), lagged AS (
      SELECT rev, lag(rev) OVER (ORDER BY day) AS prev_rev FROM daily
    )
    SELECT CAST(count(*) AS BIGINT)        AS n_pairs,
           round(corr(rev, prev_rev), 5)   AS lag1_autocorr
    FROM lagged WHERE prev_rev IS NOT NULL
    """,
    operators=("D5", "E2", "H5"),
)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from cloudvectordb_spark.ranking import _zero

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    # calendar-bounded input (one row per day); constant non-foldable
    # partition key keeps the WindowExec partitioned (ranking._zero)
    w = Window.partitionBy(_zero(F.col("day"))).orderBy("day")
    lagged = daily.withColumn("prev_rev", F.lag("rev").over(w)).filter(
        F.col("prev_rev").isNotNull()
    )
    return lagged.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.corr("rev", "prev_rev"), 5).alias("lag1_autocorr"),
    )


# ---------------------------------------------------------------------------
# D5/H1 forensic screen: Benford's-law first-digit audit of order totals
# — the classic anomalous-data detector (fabricated or truncated numeric
# columns diverge from log10(1 + 1/d)). One scan, 9-row output, pure
# expressions; the deviation stat is a chi-square against the Benford
# expectation.
# ---------------------------------------------------------------------------
@query(
    "benford_order_totals",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1
    ), obs AS (
      SELECT d, count(*) AS n FROM digits GROUP BY d
    ), tot AS (SELECT sum(n) AS total FROM obs)
    SELECT obs.d AS first_digit,
           CAST(obs.n AS BIGINT) AS n,
           round(CAST(obs.n AS DOUBLE) / tot.total, 5) AS obs_freq,
           round(log10(1.0 + 1.0 / obs.d), 5) AS benford_freq,
           round(pow(CAST(obs.n AS DOUBLE) / tot.total
                     - log10(1.0 + 1.0 / obs.d), 2)
                 / log10(1.0 + 1.0 / obs.d), 8) AS chi2_term
    FROM obs CROSS JOIN tot
    """,
    operators=("D5", "H1", "H6"),
)
def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = orders.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    freq = F.col("n").cast("double") / F.col("total")
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        F.col("n").cast("long").alias("n"),
        F.round(freq, 5).alias("obs_freq"),
        F.round(benford, 5).alias("benford_freq"),
        F.round(F.pow(freq - benford, F.lit(2)) / benford, 8).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Modern-API surface: df.observe(Observation, ...) — data-quality metrics
# piggybacked on a pass you were already making (zero extra scans; the
# accumulators ride the action). The observed aggregates are returned as
# a 1-row frame so the oracle can pin them; at 100 TB this is how
# pipelines emit row counts / null rates / revenue checksums without a
# second job.
# ---------------------------------------------------------------------------
@query(
    "observed_quality_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                             AS n_rows,
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
                                                                AS n_nonpositive,
           round(sum(o_totalprice), 2)                          AS revenue_checksum,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)      AS n_priorities
    FROM orders
    """,
    operators=("D2", "A1", "B6"),
)
def observed_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    orders = load(spark, sf_dir, "orders")
    obs = Observation("quality")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpositive"
        ),
        F.round(F.sum("o_totalprice"), 2).alias("revenue_checksum"),
        # DISTINCT aggregates are disallowed in observed metrics;
        # approx_count_distinct is exact at this cardinality (5 values).
        F.approx_count_distinct("o_orderpriority").alias("n_priorities"),
    )
    observed.count()  # the pass the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_nonpositive"]),
                float(m["revenue_checksum"]),
                int(m["n_priorities"]),
            )
        ],
        "n_rows long, n_nonpositive long, revenue_checksum double, n_priorities long",
    )


# ---------------------------------------------------------------------------
# ANSI ordered-set aggregates (Spark 4 surface): percentile_cont /
# percentile_disc WITHIN GROUP, plus listagg over a bounded (distinct
# statuses) domain — the warehouse-SQL forms users port in unchanged.
# ---------------------------------------------------------------------------
@query(
    "ordered_set_aggregates",
    oracle="""
    WITH pct AS (
      SELECT o_orderpriority,
             round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
               AS median_price,
             round(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)
               AS p90_disc_price
      FROM orders GROUP BY o_orderpriority
    ), st AS (
      SELECT o_orderpriority,
             string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
      GROUP BY o_orderpriority
    )
    SELECT pct.o_orderpriority, median_price, p90_disc_price, statuses
    FROM pct JOIN st USING (o_orderpriority)
    """,
    operators=("D5", "D6", "D1"),
)
def ordered_set_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pct = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)"
        ).alias("median_price"),
        F.expr(
            "round(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)"
        ).alias("p90_disc_price"),
    )
    st = (
        orders.select("o_orderpriority", "o_orderstatus")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "listagg(o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus)"
            ).alias("statuses")
        )
    )
    return pct.join(st, "o_orderpriority")


# ---------------------------------------------------------------------------
# D8 second cover: source x lang crosstab via pivot — one row per
# source, one count column per language (the fixed 5-lang fixture set;
# pivot values are EXPLICIT so the plan is one aggregate, no
# distinct-values pre-pass).
# ---------------------------------------------------------------------------
_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "source_lang_pivot",
    oracle="""
    SELECT source,
           CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
           CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
           CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
           CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
           CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
    FROM documents GROUP BY source
    """,
    operators=("D8", "D1", "K2"),
)
def source_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = (
        docs.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .count()
    )
    # pivot leaves NULL for absent cells; the oracle's FILTER counts are 0
    for lang in _PIVOT_LANGS:
        out = out.withColumn(lang, F.coalesce(F.col(lang), F.lit(0)).cast("bigint"))
    return out


# ---------------------------------------------------------------------------
# H9 second cover: JSON props -> MAP, then key-level frequency via
# map_keys explode — the payload-schema census an events pipeline runs
# before hardening a schema.
# ---------------------------------------------------------------------------
@query(
    "props_key_frequency",
    oracle="""
    SELECT event_type, k AS prop_key, CAST(count(*) AS BIGINT) AS n_events
    FROM (
      SELECT event_type, unnest(json_keys(props)) AS k FROM events
    )
    GROUP BY event_type, k
    """,
    operators=("H9", "H10", "D1"),
)
def props_key_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_type", F.explode(F.map_keys(m)).alias("prop_key"))
        .groupBy("event_type", "prop_key")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# D8 second shape: pivot over a FIXED small domain (lang) — the corpus
# composition matrix a dataset card reports (docs per source x language).
# Explicit pivot values keep the plan a single pass (no distinct-scan).
# ---------------------------------------------------------------------------
_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "docs_lang_source_pivot",
    oracle=f"""
    SELECT source,
           {", ".join(
               f"CAST(count(*) FILTER (lang = '{lg}') AS BIGINT) AS {lg}"
               for lg in _PIVOT_LANGS
           )}
    FROM documents
    GROUP BY source
    """,
    operators=("D8", "D1", "B8"),
)
def docs_lang_source_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pivoted = docs.groupBy("source").pivot("lang", list(_PIVOT_LANGS)).count()
    return pivoted.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).alias(lg) for lg in _PIVOT_LANGS],
    )


# ---------------------------------------------------------------------------
# H9 second shape: maps BUILT from aggregates (map_from_entries) and
# pruned with a map lambda (map_filter) — the per-user event-type
# histogram rendered as a deterministic "type:count" string after
# dropping singleton types. Exercises construction + higher-order map
# ops, not just extraction from JSON.
# ---------------------------------------------------------------------------
@query(
    "user_type_count_map",
    oracle="""
    WITH tc AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events WHERE user_id < 30
      GROUP BY user_id, event_type
    )
    SELECT user_id,
           coalesce(array_to_string(
             list_sort(list(event_type || ':' || CAST(n AS VARCHAR))
                       FILTER (n >= 2)),
             ','), '') AS repeat_types
    FROM tc
    GROUP BY user_id
    """,
    operators=("H9", "H8", "D1"),
)
def user_type_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    tc = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("event_type"), F.col("n")))
    )
    kept = F.map_filter(m, lambda k, v: v >= 2)
    rendered = F.concat_ws(
        ",",
        F.sort_array(
            F.transform(
                F.map_entries(kept),
                lambda e: F.concat_ws(":", e.key, e.value.cast("string")),
            )
        ),
    )
    return tc.groupBy("user_id").agg(rendered.alias("repeat_types"))
