"""Event-stream semantics in batch-checkable form (SURVEY.md §2 group J,
C8 as-of join, H10 JSON).

Each query here is written so the SAME groupBy/window shape runs unchanged
on a streaming DataFrame (see ``cloudvectordb_spark.streaming``); the
batch forms are what the DuckDB oracle verifies. Window bucketing uses
epoch-aligned origins so Spark's ``F.window`` and DuckDB's ``time_bucket``
agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query


def _src_fp(p):
    # mtime_ns+size fingerprint (cache.source_tag): same-second
    # fixture regens still invalidate derived artifacts
    from cloudvectordb_spark.cache import source_tag

    return source_tag(p)


# ---------------------------------------------------------------------------
# J1: tumbling window aggregate (1 hour)
# ---------------------------------------------------------------------------
@query(
    "events_tumbling_hour",
    oracle="""
    SELECT date_trunc('hour', ts)     AS ws,
           event_type,
           count(*)                   AS n,
           round(sum(value), 2)       AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("J1", "D1", "A5"),  # A5: streaming twin reads the same
    # schema via readStream (streaming.jobs.read_events_stream)
    bench=True,
)
def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# J2: sliding window aggregate (10 min window, 5 min slide) — each event
# lands in exactly two windows; the oracle materializes both via UNION ALL
# of epoch-aligned 5-minute buckets (time_bucket origin 2000-01-01 is a
# multiple of 5 min from Spark's 1970-01-01 origin, so buckets coincide).
# ---------------------------------------------------------------------------
@query(
    "events_sliding_10m",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws,
             event_type, value FROM events
    )
    SELECT ws, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM b
    GROUP BY ws, event_type
    """,
    operators=("J2", "D1"),
)
def events_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# J2 second cover (round-5 verdict #6): hourly rolling activity on a
# 15-minute slide — each event lands in exactly 4 windows; the oracle
# materializes all four via UNION ALL of shifted epoch-aligned 15-minute
# buckets (15 min divides 1 h, so bucket starts coincide with Spark's
# window starts). Adds COUNT(DISTINCT) inside a sliding window — the
# shape the 10m/5m twin doesn't exercise.
# ---------------------------------------------------------------------------
@query(
    "events_sliding_hour_users",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - k.k * INTERVAL '15 minutes' AS ws,
             user_id, value
      FROM events, (SELECT unnest(range(0, 4)) AS k) k
    )
    SELECT ws,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM b
    GROUP BY ws
    """,
    operators=("J2", "D3", "D1"),
)
def events_sliding_hour_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "n_events", "n_users", "sum_value")
    )


# ---------------------------------------------------------------------------
# J3: session window (30-minute gap) — oracle twin via lag-gap islands
# ---------------------------------------------------------------------------
@query(
    "events_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             -- >= (not >) matches Spark's half-open session_window: a gap
             -- of exactly 30 minutes STARTS a new session (session spans
             -- [start, last+gap) exclusive of the right edge).
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             -- event_id tiebreak matches the Spark window's total order
             -- (equal-ts rows make a ROWS-frame running sum ambiguous)
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts)              AS session_start,
           max(ts)              AS session_last,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    operators=("J3",),
    bench=True,
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize with an explicit gap-flag + running-sum window rather
    than the built-in ``F.session_window`` aggregate: identical output
    (same half-open >= gap semantics, microsecond-exact), same single
    exchange on user_id, but ~2.5x faster — session_window's generic
    merging aggregate buffers per-session state, while this shape is two
    streaming window passes over one sort. The STREAMING path
    (streaming/jobs.py sessionize) keeps the native session_window,
    which is required there for watermark-aware state eviction."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    # timestamp_diff works for both TIMESTAMP and TIMESTAMP_NTZ (the driver
    # testdata has shipped both flavors across rounds); unix_micros rejects NTZ.
    prev_ts = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) >= gap_us),
        1,
    ).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("_sid", sid)
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_last", "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# J4: watermark semantics, batch-checkable form — keep only events within
# the watermark horizon of the observed max event time.
# ---------------------------------------------------------------------------
@query(
    "events_within_watermark",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '24 hours'
    """,
    operators=("J4",),
)
def events_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("cutoff")
    )
    return (
        ev.crossJoin(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("cutoff"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# J5 (batch twin = G4): exactly-once event ids
# ---------------------------------------------------------------------------
@query(
    "events_dedup_ids",
    oracle="""
    SELECT count(*) AS n_rows, count(DISTINCT event_id) AS n_unique
    FROM events
    """,
    operators=("J5", "G4", "D3"),
)
def events_dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # dropDuplicates is the batch twin of dropDuplicatesWithinWatermark
    deduped = ev.dropDuplicates(["event_id"])
    return ev.agg(F.count("*").alias("n_rows")).crossJoin(
        deduped.agg(F.count("*").alias("n_unique"))
    )


# ---------------------------------------------------------------------------
# J7: stream-static enrichment join (batch twin) — events x customer dim
# ---------------------------------------------------------------------------
@query(
    "events_enriched_segment",
    oracle="""
    SELECT c_mktsegment,
           count(*)              AS n_events,
           round(sum(value), 2)  AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    operators=("J7", "C1"),
)
def events_enriched_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# H10: JSON extraction from the props payload
# ---------------------------------------------------------------------------
@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*)                                            AS n,
           min(CAST(json_extract(props, '$.k') AS BIGINT))     AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT))     AS max_k,
           round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    operators=("H10", "D1"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# C8: as-of join — for each purchase, the latest click at-or-before it,
# per user. Spark has no native as-of join: implemented as the classic
# union + ordered window "last non-null carry-forward", which is a single
# shuffle on (user_id) — scales linearly, no range explosion at 100 TB.
# DuckDB oracle uses its native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------
@query(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    operators=("C8", "E2"),
    bench=True,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("bigint").alias("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    # clicks sort before purchases at equal ts (side 0 < 1) => inclusive asof
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


# ---------------------------------------------------------------------------
# C6/E2 + streaming J-column: purchase<-clicks interval (range) join —
# every click by the same user in the 30 minutes before a purchase. The
# SAME code (streaming/jobs.py:interval_join_purchase_clicks) runs
# stream-stream under the micro-batch engine with watermarked, evictable
# state; driven by tests/test_events_streaming.py. Batch form here is the
# oracle-checked twin.
# ---------------------------------------------------------------------------
@query(
    "purchase_click_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
           c.event_id AS click_id, c.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '30 minutes' AND p.ts
    """,
    operators=("C6", "E2", "C8"),
)
def purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.streaming.jobs import interval_join_purchase_clicks

    return interval_join_purchase_clicks(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# D4 mergeable-sketch form: per-day HLL sketches of distinct users,
# union-merged into a total estimate. The capability this adds over
# approx_count_distinct is REAGGREGATABILITY: daily sketch rows are a
# rollup table you can store and later union across any date range
# without touching raw events — the only way distinct-count rollups work
# at 100 TB (exact distincts don't compose; sketches do). Deterministic
# (no RNG in the sketch), but no DuckDB twin -> rows-only; accuracy is
# pytest-gated against the exact distinct.
# ---------------------------------------------------------------------------
@query(
    "hll_daily_rollup_union",
    # The sketch estimator is engine-specific, so the oracle pins the exact
    # day count + exact distinct users + the union-estimate 5% envelope as
    # a boolean — the hash matches only if the merged sketch is accurate.
    oracle="""
    SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT)          AS exact_union_users,
           true                                             AS est_within_5pct
    FROM events
    """,
    operators=("D4", "D3", "H5"),
)
def hll_daily_rollup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    sketch = daily.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_union_users"))
    return sketch.crossJoin(exact).select(
        "n_days",
        "exact_union_users",
        (
            F.abs(F.col("est") - F.col("exact_union_users"))
            <= 0.05 * F.col("exact_union_users")
        ).alias("est_within_5pct"),
    )


# ---------------------------------------------------------------------------
# E2/D1: event-type transition matrix — per-user lead() then a global
# count per (from, to): the Markov-chain summary behind funnel and
# journey analysis. One (user_id) window exchange + one small aggregate;
# the matrix itself is |types|^2 rows at any corpus size.
# ---------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    operators=("E2", "D1", "C1"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# C1/D3/H5: retention cohorts — users grouped by first-seen date, counted
# distinct on each subsequent day offset. Two shuffles total (first-seen
# agg on user_id; cohort-cell agg), with the firsts side reusable as a
# broadcast when the user dimension is small relative to events (it is:
# |users| << |events| by definition here).
# ---------------------------------------------------------------------------
@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT CAST(cohort_date AS TIMESTAMP) AS cohort_ts,
           CAST(CAST(e.ts AS DATE) - cohort_date AS BIGINT) AS day_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts USING (user_id)
    GROUP BY cohort_ts, day_offset
    """,
    operators=("C1", "D3", "H5", "D1"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            F.col("cohort_date").cast("timestamp").alias("cohort_ts"),
            F.datediff(F.to_date("ts"), F.col("cohort_date"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_ts", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# J1/D5 composition: rate-anomaly monitor — flag minutes whose event
# volume exceeds mean + 3 sigma of the per-minute distribution (the
# alert a streaming ingest pipeline evaluates per micro-batch; here the
# batch-replayable form). Events collapse to per-minute counts FIRST
# (map-side combine), so the stats pass runs over minutes, not events.
# ---------------------------------------------------------------------------
@query(
    "events_rate_anomalies",
    oracle="""
    WITH per_min AS (
      SELECT date_trunc('minute', ts) AS minute, count(*) AS n_events
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT avg(n_events) AS mu, stddev_samp(n_events) AS sigma FROM per_min
    )
    SELECT CAST(minute AS TIMESTAMP) AS minute, n_events,
           round((n_events - mu) / sigma, 4) AS z
    FROM per_min, stats
    WHERE n_events > mu + 3 * sigma
    """,
    operators=("J1", "D5", "H5", "B2"),
)
def events_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_min = ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count("*").alias("n_events")
    )
    stats = per_min.agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sigma"),
    )
    return (
        per_min.crossJoin(F.broadcast(stats))
        .filter(F.col("n_events") > F.col("mu") + 3 * F.col("sigma"))
        .select(
            "minute",
            "n_events",
            F.round((F.col("n_events") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style continuous-aggregate rollup: day grain derived from
# hour partials derived from minute partials — never from raw events
# twice. count/sum are mergeable, so each level re-aggregates the one
# below it; at 100 TB the raw corpus is scanned ONCE (at minute grain,
# with map-side partial aggregation) and every coarser grain works over
# the 1440x-smaller partial table, the continuous-aggregate maintenance
# pattern of timeseries stores. The oracle replays the same three-level
# cascade so both engines accumulate over identical partial groupings.
# ---------------------------------------------------------------------------
@query(
    "hypertable_rollup_daily",
    oracle="""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS ws, event_type,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    ),
    hour AS (
      SELECT date_trunc('hour', ws) AS ws, event_type,
             CAST(sum(n) AS BIGINT) AS n, sum(sv) AS sv
      FROM minute GROUP BY 1, 2
    )
    SELECT date_trunc('day', ws) AS ws_day, event_type,
           CAST(sum(n) AS BIGINT) AS n, round(sum(sv), 2) AS sum_value
    FROM hour GROUP BY 1, 2
    """,
    operators=("J1", "D1", "H5"),
)
def hypertable_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("ws"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    hour = minute.groupBy(
        F.date_trunc("hour", "ws").alias("ws"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    return (
        hour.groupBy(F.date_trunc("day", "ws").alias("ws_day"), "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.round(F.sum("sv"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day DISTINCT users per day — windowed COUNT(DISTINCT) has no
# direct window-function form, so this is the standard exact shape:
# dedup events to (day, user) pairs FIRST (the big reduction, map-side
# combinable), then a bounded self-join of the day spine against the
# trailing-week pairs, then count distinct per day. The join fan-out is
# |days| x 7 x |daily actives| — calendar-sized, not event-sized — so
# 100 TB of raw events reduce before anything quadratic. (The approx
# alternative is the mergeable HLL rollup in hll_daily_rollup_union.)
# ---------------------------------------------------------------------------
@query(
    "rolling_7d_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           count(DISTINCT u.user_id) AS active_7d
    FROM days d
    JOIN du u ON u.day <= d.day AND u.day > d.day - INTERVAL '7 days'
    GROUP BY d.day
    """,
    operators=("D3", "E3", "C6", "H5"),
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().alias("d")
    u = du.alias("u")
    return (
        days.join(
            u,
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") > F.col("d.day") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("active_7d"))
    )


# ---------------------------------------------------------------------------
# H10 via VARIANT (Spark 4): parse props once into the binary
# semi-structured type, extract typed fields with variant_get — the
# shredded-JSON path that replaces per-access string re-parsing
# (get_json_object) with one parse per row; at 100 TB the difference is
# a full JSON tokenize per FIELD versus per ROW. Same aggregate as the
# string-path twin events_json_props, so the two are comparable.
# ---------------------------------------------------------------------------
@query(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           count(*)                                     AS n,
           CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    operators=("H10", "D1"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Recency-weighted engagement: sum(value * exp(-age/tau)) per user with
# age measured from the corpus max event time — the time-decay feature
# every ranking/recommendation pipeline derives. Pure expression work
# after a 1-row broadcast of the anchor timestamp: the decay weight is
# computed in the scan stage and the per-user sum combines map-side.
# ---------------------------------------------------------------------------
_DECAY_TAU_DAYS = 7.0


@query(
    "user_decay_scores",
    oracle=f"""
    WITH anchor AS (SELECT max(ts) AS t1 FROM events)
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value * exp(-(epoch_us(t1) - epoch_us(ts))
                                 / (86400000000.0 * {_DECAY_TAU_DAYS}))), 4)
             AS decay_score
    FROM events CROSS JOIN anchor
    GROUP BY user_id
    """,
    operators=("H6", "H5", "D1", "D2"),
)
def user_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("t1"))
    age_us = F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("t1"))
    weight = F.exp(-age_us / (86400000000.0 * _DECAY_TAU_DAYS))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * weight), 4).alias("decay_score"),
        )
    )


# ---------------------------------------------------------------------------
# Order-2 sequence mining: the most frequent (prev2 -> prev1 -> current)
# event-type paths per corpus — the n-gram generalization of the
# order-1 transition matrix above; the input to next-event prediction
# features. One window per user (same exchange the sessionizer uses)
# and a vocabulary-sized count table.
# ---------------------------------------------------------------------------
@query(
    "event_trigram_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2, p1, event_type AS cur, count(*) AS n
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY p2, p1, cur
    ORDER BY n DESC, p2, p1, cur
    LIMIT 25
    """,
    operators=("E2", "D1", "F2"),
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.groupBy("p2", "p1", "cur")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("p2"), F.asc("p1"), F.asc("cur"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Time-bounded funnel: view -> click -> purchase where each step lands
# within 1 hour of the previous one — the attribution-correct funnel
# (an unbounded funnel overcounts users who clicked days later). Per
# user: earliest view, earliest qualifying click after it, earliest
# qualifying purchase after that — three ordered min-aggregates over
# one user-keyed shuffle; the global stage counts reduce to one row.
# ---------------------------------------------------------------------------
@query(
    "timed_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts >= v.t_view AND e.ts < v.t_view + INTERVAL '1' HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= c.t_click AND e.ts < c.t_click + INTERVAL '1' HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_1h,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_1h
    """,
    operators=("J1", "C1", "D2", "H5", "B3"),
)
def timed_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") >= F.col("t_view"))
            & (F.col("ts") < F.col("t_view") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("t_click"))
            & (F.col("ts") < F.col("t_click") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").cast("bigint").alias("n_view"))
        .crossJoin(c.agg(F.count("*").cast("bigint").alias("n_click_1h")))
        .crossJoin(p.agg(F.count("*").cast("bigint").alias("n_purchase_1h")))
    )


# ---------------------------------------------------------------------------
# Hour-of-week seasonality: avg events per (day-of-week, hour) cell —
# the load profile behind capacity planning and anomaly baselines
# (events_rate_anomalies measures deviation; this is the baseline
# shape). Two grouped aggregates: per-(date, dow, hour) counts, then
# the 168-cell average; everything combines map-side.
# ---------------------------------------------------------------------------
@query(
    "hour_of_week_seasonality",
    oracle="""
    WITH per_slot AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             CAST(hour(ts) AS BIGINT) AS hr,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT dow, hr,
           CAST(sum(n) AS BIGINT) AS total_events,
           round(avg(n), 4) AS avg_events_per_day
    FROM per_slot GROUP BY dow, hr
    """,
    operators=("H5", "D1", "J1"),
)
def hour_of_week_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_slot = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"),
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    ).agg(F.count("*").alias("n"))
    return per_slot.groupBy("dow", "hr").agg(
        F.sum("n").cast("bigint").alias("total_events"),
        F.round(F.avg("n"), 4).alias("avg_events_per_day"),
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness: per day, the daily actives over the trailing-week
# actives — the engagement-intensity ratio product teams track. Same
# calendar-bounded derivation as rolling_7d_distinct_users: reduce to
# (day, user) first, one trailing-range self-join, conditional distinct
# counts (today vs window) in a single aggregate.
# ---------------------------------------------------------------------------
@query(
    "dau_wau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau,
           count(DISTINCT u.user_id) AS wau,
           round(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
                 * 1.0 / count(DISTINCT u.user_id), 6) AS stickiness
    FROM days d
    JOIN du u ON u.day <= d.day AND u.day > d.day - INTERVAL '7 days'
    GROUP BY d.day
    """,
    operators=("D3", "B8", "H5", "C6"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct().alias("d")
    u = du.alias("u")
    j = days.join(
        u,
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") > F.col("d.day") - F.expr("INTERVAL 7 DAYS")),
    )
    today_user = F.when(F.col("u.day") == F.col("d.day"), F.col("u.user_id"))
    return j.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct(today_user).alias("dau"),
        F.countDistinct("u.user_id").alias("wau"),
        F.round(
            F.countDistinct(today_user) / F.countDistinct("u.user_id"), 6
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# Session-level type affinity: which event types co-occur in the SAME
# session more than their independent rates predict (lift > 1) — the
# session-grain basket analysis that separates "click then purchase in
# one visit" from coincidence across days. Composes the sessionizer's
# gap-flag derivation (same single user-keyed exchange) with pair
# counting over per-session type sets; pair fan-out is C(types, 2) <=
# C(5, 2) per session.
# ---------------------------------------------------------------------------
@query(
    "session_event_type_affinity",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    st AS (
      SELECT DISTINCT user_id, sid, event_type FROM numbered
    ),
    n_sessions AS (SELECT CAST(count(DISTINCT (user_id, sid)) AS DOUBLE) AS n FROM st),
    type_n AS (SELECT event_type, count(*) AS nt FROM st GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS nab
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.sid = b.sid
       AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, CAST(nab AS BIGINT) AS nab,
           round((nab / ns.n) / ((ta.nt / ns.n) * (tb.nt / ns.n)), 4) AS lift
    FROM pairs
    JOIN type_n ta ON ta.event_type = type_a
    JOIN type_n tb ON tb.event_type = type_b
    CROSS JOIN n_sessions ns
    """,
    operators=("J3", "C9", "D1", "D3", "H6"),
)
def session_event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) >= gap_us),
        1,
    ).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    st = (
        ev.withColumn("sid", sid)
        .select("user_id", "sid", "event_type")
        .distinct()
    )
    n_sessions = st.select("user_id", "sid").distinct().agg(
        F.count("*").cast("double").alias("n")
    )
    type_n = st.groupBy("event_type").agg(F.count("*").alias("nt"))
    a = st.select("user_id", "sid", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "sid", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("nab"))
    )
    ta = type_n.select(F.col("event_type").alias("type_a"), F.col("nt").alias("na"))
    tb = type_n.select(F.col("event_type").alias("type_b"), F.col("nt").alias("nb"))
    return (
        pairs.join(ta, "type_a")
        .join(tb, "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            F.col("nab").cast("bigint").alias("nab"),
            F.round(
                (F.col("nab") / F.col("n"))
                / ((F.col("na") / F.col("n")) * (F.col("nb") / F.col("n"))),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Growth accounting, daily: split each day's actives into NEW (first
# day ever) vs RETURNING. First-seen reduces per user with one
# min-aggregate; the daily split is a conditional distinct count. The
# canonical top-of-dashboard growth metric.
# ---------------------------------------------------------------------------
@query(
    "daily_new_vs_returning",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    first_seen AS (
      SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
    )
    SELECT du.day,
           count(DISTINCT CASE WHEN du.day = f.first_day
                               THEN du.user_id END) AS n_new,
           count(DISTINCT CASE WHEN du.day <> f.first_day
                               THEN du.user_id END) AS n_returning
    FROM du JOIN first_seen f ON du.user_id = f.user_id
    GROUP BY du.day
    """,
    operators=("D3", "B8", "H5", "C1"),
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = du.join(first_seen, "user_id")
    return j.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
        ).alias("n_new"),
        F.countDistinct(
            F.when(F.col("day") != F.col("first_day"), F.col("user_id"))
        ).alias("n_returning"),
    )


# ---------------------------------------------------------------------------
# Growth accounting, full: each day's actives split into NEW (first day
# ever), RETAINED (also active in the prior 7 days), and RESURRECTED
# (seen before, but not in the prior 7 days). The standard
# new/retained/resurrected ledger; churn is the complement on the
# prior-window side. One first-seen reduction + one trailing-window
# presence flag via the calendar-bounded self-join.
# ---------------------------------------------------------------------------
@query(
    "growth_accounting_weekly",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    first_seen AS (
      SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
    ),
    prior AS (
      SELECT DISTINCT a.day, a.user_id
      FROM du a JOIN du b
        ON a.user_id = b.user_id
       AND b.day < a.day AND b.day >= a.day - INTERVAL '7 days'
    )
    SELECT du.day,
           count(DISTINCT CASE WHEN du.day = f.first_day
                               THEN du.user_id END) AS n_new,
           count(DISTINCT CASE WHEN du.day <> f.first_day
                                AND p.user_id IS NOT NULL
                               THEN du.user_id END) AS n_retained,
           count(DISTINCT CASE WHEN du.day <> f.first_day
                                AND p.user_id IS NULL
                               THEN du.user_id END) AS n_resurrected
    FROM du
    JOIN first_seen f ON du.user_id = f.user_id
    LEFT JOIN prior p ON p.day = du.day AND p.user_id = du.user_id
    GROUP BY du.day
    """,
    operators=("D3", "B8", "H5", "C3", "C6"),
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    a, b = du.alias("a"), du.alias("b")
    prior = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.day") < F.col("a.day"))
            & (F.col("b.day") >= F.col("a.day") - F.expr("INTERVAL 7 DAYS")),
        )
        .select(F.col("a.day").alias("day"), F.col("a.user_id").alias("user_id"))
        .distinct()
        .withColumn("in_prior", F.lit(1))
    )
    j = (
        du.join(first_seen, "user_id")
        .join(prior, ["day", "user_id"], "left")
    )
    is_new = F.col("day") == F.col("first_day")
    has_prior = F.col("in_prior").isNotNull()
    return j.groupBy("day").agg(
        F.countDistinct(F.when(is_new, F.col("user_id"))).alias("n_new"),
        F.countDistinct(
            F.when(~is_new & has_prior, F.col("user_id"))
        ).alias("n_retained"),
        F.countDistinct(
            F.when(~is_new & ~has_prior, F.col("user_id"))
        ).alias("n_resurrected"),
    )


# ---------------------------------------------------------------------------
# Cohort retention triangle: users bucketed by first-seen week, tracked
# by distinct activity in each subsequent week — the classic retention
# matrix every growth dashboard draws. Scale shape: first-seen is one
# keyed reduction on user_id, activity weeks one keyed distinct, the
# join is user-keyed, and the final aggregate's key space is
# calendar x calendar (bounded by retention horizon, not corpus size).
# ---------------------------------------------------------------------------
@query(
    "cohort_retention_matrix",
    oracle="""
    WITH first AS (
      -- TIMESTAMP on both engines: Spark date_trunc yields timestamp,
      -- DuckDB yields DATE, and pandas dtypes must agree for the gate
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT)
             AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    operators=("H5", "D3", "D1", "C1"),
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("weeks_since"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Behavioral entropy: Shannon entropy of each user's event-type mix —
# the diversity feature separating single-action accounts (entropy ~ 0,
# often automation) from full-surface users (entropy ~ ln 5). Two
# keyed aggregates: per-(user, type) counts then the entropy fold;
# everything combines map-side.
# ---------------------------------------------------------------------------
@query(
    "user_event_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id)
    SELECT c.user_id,
           CAST(count(*) AS BIGINT) AS n_types,
           round(-sum((n / CAST(tot AS DOUBLE))
                      * ln(n / CAST(tot AS DOUBLE))), 6) AS entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
    operators=("D1", "H6", "C1"),
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


# ---------------------------------------------------------------------------
# A5/A3 E2E: readStream -> checkpointed foreachBatch parquet sink ->
# read-back. The one registered query that exercises the full streaming
# lifecycle (source offsets, micro-batch commits, idempotent restart)
# rather than a batch twin: the sink path is mtime-keyed, so repeat
# invocations restart from the committed checkpoint and reprocess
# NOTHING (exactly-once) — the read-back aggregate is identical no
# matter how many times the query runs. Oracle = the same aggregate
# straight off the events table, proving no row was lost or duplicated
# through the stream -> sink -> scan roundtrip.
# ---------------------------------------------------------------------------
@query(
    "streaming_sink_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY event_type
    """,
    operators=("A5", "A3", "J1"),
)
def streaming_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from cloudvectordb_spark.streaming.jobs import (
        read_events_stream,
        run_to_parquet_sink,
    )

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{_src_fp(src)}".encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), "cloudvectordb_stream_sink", tag)
    run_to_parquet_sink(
        read_events_stream(spark, sf_dir),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    sunk = spark.read.parquet(os.path.join(root, "out"))
    return sunk.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# E2 gap repair: forward-fill (last observation carried forward) with the
# ANSI IGNORE NULLS window form — the standard time-series imputation
# before feature extraction. Nulls are simulated deterministically
# (value < 5 -> missing) since the fixture column is fully populated. One
# exchange on user_id; the fill streams through the per-user sort.
# ---------------------------------------------------------------------------
@query(
    "ffill_event_values",
    oracle="""
    WITH gapped AS (
      SELECT user_id, ts, event_id,
             CASE WHEN value < 5 THEN NULL ELSE value END AS v
      FROM events
    ), filled AS (
      SELECT user_id,
             v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      FROM gapped
    )
    SELECT user_id,
           CAST(count(*) FILTER (WHERE v IS NULL) AS BIGINT)   AS n_missing,
           CAST(count(*) FILTER (WHERE v IS NULL AND fv IS NOT NULL) AS BIGINT)
                                                               AS n_filled,
           round(sum(fv), 2)                                   AS sum_filled_series
    FROM filled GROUP BY user_id
    """,
    operators=("E2", "B6", "D1"),
)
def ffill_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    gapped = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") < 5, None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = gapped.withColumn("fv", F.last("v", ignorenulls=True).over(w))
    return filled.groupBy("user_id").agg(
        F.count(F.when(F.col("v").isNull(), 1)).cast("long").alias("n_missing"),
        F.count(F.when(F.col("v").isNull() & F.col("fv").isNotNull(), 1))
        .cast("long")
        .alias("n_filled"),
        F.round(F.sum("fv"), 2).alias("sum_filled_series"),
    )


# ---------------------------------------------------------------------------
# K2/E-group hybrid: sequence-pattern mining over sessionized events —
# "did a view lead to a purchase in the same session?" expressed as a
# regex over the session's ordered event-initial string. The per-session
# string is bounded by session length (watermark-bounded in streaming),
# so the regex runs on short strings; sessionization reuses the exact
# events_sessions logic (30-min gap, (ts, event_id) tiebreak).
# ---------------------------------------------------------------------------
@query(
    "session_pattern_match",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, left(event_type, 1) AS c,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, c,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), strs AS (
      SELECT user_id, sid,
             string_agg(c, '' ORDER BY ts, event_id) AS seq
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           count(*)                                   AS n_sessions,
           CAST(sum(CASE WHEN regexp_matches(seq, 'v.*p') THEN 1 ELSE 0 END)
                AS BIGINT)                            AS n_view_then_buy,
           round(sum(CASE WHEN regexp_matches(seq, 'v.*p') THEN 1 ELSE 0 END)
                 / count(*), 5)                       AS conversion_rate
    FROM strs GROUP BY user_id
    """,
    operators=("K2", "E2", "H2", "D6"),
)
def session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp_diff is the NTZ-safe gap idiom (see events_sessions).
    prev_ts = F.lag(F.col("ts")).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts"))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("c"),
    ).withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    strs = sess.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("c")))
                ),
                lambda x: x.c,
            ),
            "",
        ).alias("seq")
    )
    hit = F.col("seq").rlike("v.*p").cast("int")
    return strs.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(hit).cast("long").alias("n_view_then_buy"),
        F.round(F.sum(hit) / F.count("*"), 5).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# D5/E3 time-series smoothing: exponentially weighted moving average of
# daily purchase revenue, alpha=0.3, in CLOSED FORM — ewma_t =
# sum_i a*(1-a)^(t-i)*x_i + (1-a)^t*x_0 — so it is a window sum of
# power-weighted terms, not a sequential recurrence: one bounded
# calendar-sized window, exact on both engines.
# ---------------------------------------------------------------------------
@query(
    "daily_revenue_ewma",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, sum(value) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT day, rev,
             CAST(row_number() OVER (ORDER BY day) - 1 AS INTEGER) AS t
      FROM daily
    )
    SELECT CAST(a.day AS TIMESTAMP) AS day,
           round(a.rev, 2) AS rev,
           round(sum(CASE WHEN b.t = 0 THEN pow(0.7, a.t) * b.rev
                          ELSE 0.3 * pow(0.7, a.t - b.t) * b.rev END), 2)
             AS ewma
    FROM idx a JOIN idx b ON b.t <= a.t
    GROUP BY a.day, a.rev, a.t
    """,
    operators=("D5", "E3", "H5", "H6"),
)
def daily_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import _zero

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    # calendar-bounded input; _zero keeps the window partitioned
    w = Window.partitionBy(_zero(F.col("day"))).orderBy("day")
    idx = daily.withColumn("t", (F.row_number().over(w) - 1).cast("int"))
    a = idx.select(
        F.col("day").alias("a_day"), F.col("rev").alias("a_rev"), F.col("t").alias("a_t")
    )
    b = idx.select(F.col("rev").alias("b_rev"), F.col("t").alias("b_t"))
    joined = a.join(b, F.col("b_t") <= F.col("a_t"))
    term = F.when(
        F.col("b_t") == 0, F.pow(F.lit(0.7), F.col("a_t")) * F.col("b_rev")
    ).otherwise(
        0.3 * F.pow(F.lit(0.7), F.col("a_t") - F.col("b_t")) * F.col("b_rev")
    )
    return (
        joined.groupBy("a_day", "a_rev", "a_t")
        .agg(F.round(F.sum(term), 2).alias("ewma"))
        .select(
            F.col("a_day").cast("timestamp").alias("day"),
            F.round("a_rev", 2).alias("rev"),
            "ewma",
        )
    )


# ---------------------------------------------------------------------------
# Session quality: bounce rate by entry event type — share of sessions
# that end after their first event, keyed by what the session STARTED
# with. Reuses the canonical 30-min sessionization; the aggregate is
# bounded by the event-type domain.
# ---------------------------------------------------------------------------
@query(
    "session_bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), entry AS (
      SELECT user_id, sid, event_type,
             first_value(event_type) OVER (PARTITION BY user_id, sid
               ORDER BY ts, event_id) AS entry_type
      FROM sess
    ), per_session AS (
      SELECT user_id, sid, min(entry_type) AS entry_type, count(*) AS n_events
      FROM entry GROUP BY 1, 2
    )
    SELECT entry_type,
           count(*)                                        AS n_sessions,
           CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounced,
           round(count(*) FILTER (WHERE n_events = 1) * 1.0 / count(*), 5)
             AS bounce_rate
    FROM per_session GROUP BY entry_type
    """,
    operators=("K2", "E2", "D1"),
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts")).over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")) >= 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("entry_type"),
        F.count("*").alias("n_events"),
    )
    bounced = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per_session.groupBy("entry_type").agg(
        F.count("*").alias("n_sessions"),
        F.sum(bounced).cast("long").alias("n_bounced"),
        F.round(F.sum(bounced) / F.count("*"), 5).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# J1/A3 "hypertable rollup": the continuous-aggregate pattern. History
# is served from a MATERIALIZED hourly rollup (pre-aggregated parquet,
# built once per fixture version and reused — the TimescaleDB/continuous
# -aggregate shape); only the live tail (ts >= cutoff) scans raw events.
# The merge query unions rollup + tail and re-aggregates to daily — so
# at 100 TB a dashboard query reads |hours| x |types| rollup rows plus
# the tail's raw slice, never the full history. The oracle recomputes
# everything from raw, proving rollup + tail == ground truth.
# ---------------------------------------------------------------------------
_ROLLUP_CUTOFF = "2024-01-20 00:00:00"


def ensure_hourly_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the pre-cutoff hourly rollup (mtime-keyed, atomic
    publish — the same index-lifecycle discipline as ensure_ivf_index)."""
    import os
    import shutil
    import tempfile

    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    tag = (
        f"{sf_dir.strip('/').replace('/', '_')}_"
        f"{hashlib.md5(_src_fp(src).encode()).hexdigest()[:12]}_h1"
    )
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_rollup", tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build = f"{path}.build{os.getpid()}"
        ev = load(spark, sf_dir, "events").filter(F.col("ts") < _ROLLUP_CUTOFF)
        (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
            .write.mode("overwrite")
            .parquet(build)
        )
        try:
            os.rename(build, path)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    return path


@query(
    "events_hypertable_rollup",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("J1", "A3", "D1", "H5"),
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals over the FULL range, merged from the materialized
    hourly rollup (history) + a raw scan of only the live tail."""
    rollup = spark.read.parquet(ensure_hourly_rollup(spark, sf_dir)).select(
        F.date_trunc("day", "hour").alias("day"),
        "event_type",
        F.col("n").alias("cnt"),
        "sum_value",
    )
    tail = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts") >= _ROLLUP_CUTOFF)
        .select(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
            F.lit(1).cast("bigint").alias("cnt"),
            F.col("value").alias("sum_value"),
        )
    )
    return (
        rollup.unionByName(tail)
        .groupBy("day", "event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J1/H5 trending with exponential decay: score each event_type by
# sum(value * 0.5^(age_days)) against the corpus max timestamp — the
# standard "what's hot now" ranking where yesterday counts half. Closed
# form, no loop: one scan computes the reference time (scalar broadcast)
# and the decayed aggregate; at 100 TB the decay weight is a pure
# per-row expression and the aggregate is a map-side-combined groupBy.
# ---------------------------------------------------------------------------
@query(
    "events_trending_decay",
    oracle="""
    WITH ref AS (SELECT max(ts) AS tmax FROM events)
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value * pow(0.5,
                 date_diff('microsecond', ts, ref.tmax) / 86400000000.0)), 4)
             AS decayed_score
    FROM events, ref
    GROUP BY event_type
    """,
    operators=("J1", "H5", "H6", "D1"),
)
def events_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("tmax"))
    # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike (direct
    # casts to long reject NTZ); MICROSECOND precision because SECOND
    # truncation crosses boundaries differently in Spark vs DuckDB
    age_days = F.expr("timestampdiff(MICROSECOND, ts, tmax)") / F.lit(86400000000.0)
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.pow(F.lit(0.5), age_days)), 4).alias(
                "decayed_score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# J1 x E4: top event type per hour — the windowed-trending leaderboard
# (rank WITHIN each window, so the window exchange carries only
# per-(hour, type) partial counts and the rank sees |types| rows per
# hour).
# ---------------------------------------------------------------------------
@query(
    "events_hourly_top_types",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS ws, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT ws, event_type, n, sum_value, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY ws
                                   ORDER BY n DESC, event_type) AS rank
      FROM hourly
    ) WHERE rank <= 2
    """,
    operators=("J1", "E4", "E1", "D1"),
)
def events_hourly_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )
    wr = Window.partitionBy("ws").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        hourly.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= 2)
    )


# ---------------------------------------------------------------------------
# E2/D5 behavioral metric: inter-arrival gaps per user — the engagement
# cadence number (median seconds between a user's consecutive events).
# One lag window per user partition (parallel across users), then a
# global exact-percentile summary per event count band.
# ---------------------------------------------------------------------------
@query(
    "user_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    ),
    per_user AS (
      SELECT user_id, count(*) AS n_gaps,
             quantile_cont(gap_us, 0.5) / 1e6 AS median_gap_s
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT CASE WHEN n_gaps < 5 THEN 'light'
                WHEN n_gaps < 20 THEN 'regular' ELSE 'heavy' END AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(median_gap_s), 4) AS avg_median_gap_s
    FROM per_user GROUP BY 1
    """,
    operators=("E2", "D5", "B8", "H5"),
)
def user_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROSECOND precision: SECOND-level truncation crosses boundaries
    # differently in Spark vs DuckDB (same idiom as events_trending_decay)
    gaps = ev.select(
        "user_id",
        F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
               "(PARTITION BY user_id ORDER BY ts, event_id), ts)").alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        (F.percentile(F.col("gap_us"), F.lit(0.5)) / 1e6).alias("median_gap_s"),
    )
    band = (
        F.when(F.col("n_gaps") < 5, "light")
        .when(F.col("n_gaps") < 20, "regular")
        .otherwise("heavy")
    )
    return per_user.groupBy(band.alias("band")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("median_gap_s"), 4).alias("avg_median_gap_s"),
    )


# ---------------------------------------------------------------------------
# J3/D1 product view over sessionization: the session-duration histogram
# — the engagement-depth distribution a product dashboard tracks. Same
# gaps-and-islands sessionizer as events_sessions, then duration buckets
# (microsecond-precision both engines) into a tiny aggregate.
# ---------------------------------------------------------------------------
@query(
    "session_duration_histogram",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             -- event_id tiebreak: with a ROWS frame, equal-ts rows make
             -- the running sum order-ambiguous between engines
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_id,
             date_diff('microsecond', min(ts), max(ts)) / 60000000.0 AS dur_min,
             count(*) AS n_events
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT CASE WHEN n_events = 1 THEN 'bounce'
                WHEN dur_min < 5 THEN '<5m'
                WHEN dur_min < 30 THEN '5-30m'
                ELSE '30m+' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(n_events), 4) AS avg_events
    FROM sessions GROUP BY 1
    """,
    operators=("J3", "D1", "B8", "H5"),
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                       "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
                >= 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")  # tiebreak keeps the ROWS frame total-ordered
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(wr))
    sessions = numbered.groupBy("user_id", "session_id").agg(
        (
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))") / 60_000_000.0
        ).alias("dur_min"),
        F.count("*").alias("n_events"),
    )
    bucket = (
        F.when(F.col("n_events") == 1, "bounce")
        .when(F.col("dur_min") < 5, "<5m")
        .when(F.col("dur_min") < 30, "5-30m")
        .otherwise("30m+")
    )
    return sessions.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
    )


# ---------------------------------------------------------------------------
# J4 second cover: lateness census. Arrival order is the md5 permutation
# of event_id (the fixture's event_id follows event time, so raw ids
# would show zero lateness; the deterministic shuffle stands in for the
# out-of-order ingest a real stream has): each event's lateness is how
# far the event-time high-water mark had already advanced when it
# arrived — exactly the quantity a watermark must cover. One arrival-
# ordered running max; the summary says what watermark delay would have
# accepted which share of the stream.
# ---------------------------------------------------------------------------
@query(
    "events_lateness_census",
    oracle="""
    WITH arr AS (
      SELECT ts,
             max(ts) OVER (ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    ),
    lat AS (
      SELECT date_diff('microsecond', ts, high_water) / 60000000.0
               AS late_min
      FROM arr
    )
    SELECT CASE WHEN late_min <= 0 THEN 'on_time'
                WHEN late_min <= 60 THEN '<=1h'
                WHEN late_min <= 360 THEN '<=6h'
                ELSE '>6h' END AS lateness_band,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(late_min), 4) AS max_late_min
    FROM lat GROUP BY 1
    """,
    operators=("J4", "E3", "D1", "H5"),
)
def events_lateness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import with_global_running_max

    ev = load(spark, sf_dir, "events")
    # distributed running max over arrival order: the first 2 hex chars
    # of the md5 arrival key are a monotone coarsening of the order
    # (256 uniform buckets), so with_global_running_max computes the
    # exact global high-water mark with every exchange keyed — no
    # corpus-proportional single-task window (round-5 verdict #2)
    ord_key = F.md5(F.col("event_id").cast("string"))
    arr = with_global_running_max(
        ev.select("ts", "event_id").withColumn("_ord", ord_key),
        bucket=F.substring(F.col("_ord"), 1, 2),
        order=[F.asc("_ord"), F.asc("event_id")],
        value_col="ts",
        out_col="high_water",
    ).select("ts", "high_water")
    late_min = (
        F.expr("timestampdiff(MICROSECOND, ts, high_water)") / 60_000_000.0
    )
    band = (
        F.when(late_min <= 0, "on_time")
        .when(late_min <= 60, "<=1h")
        .when(late_min <= 360, "<=6h")
        .otherwise(">6h")
    )
    return arr.select(band.alias("lateness_band"), late_min.alias("lm")).groupBy(
        "lateness_band"
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.max("lm"), 4).alias("max_late_min"),
    )


# ---------------------------------------------------------------------------
# J5 second cover: dedup keeping the EARLIEST record per event_id, with
# the duplicate count — the batch twin of streaming dropDuplicates that
# also reports HOW duplicated the stream was.
# ---------------------------------------------------------------------------
@query(
    "events_dedup_keep_first",
    oracle="""
    SELECT event_id,
           min(ts) AS first_ts,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM events
    GROUP BY event_id
    HAVING count(*) >= 1 AND event_id < 500
    """,
    operators=("J5", "G4", "D1"),
)
def events_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.groupBy("event_id").agg(
        F.min("ts").alias("first_ts"),
        F.count("*").cast("bigint").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# J7 second cover: stream-static enrichment against the customer
# dimension (user_id + 1 keys into c_custkey on the fixture) — the
# identical join shape runs under the micro-batch engine with the dim as
# the static side; per-segment rollup proves the values.
# ---------------------------------------------------------------------------
@query(
    "events_customer_segment_rollup",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id + 1
    GROUP BY c.c_mktsegment
    """,
    operators=("J7", "C1", "D3", "D1"),
)
def events_customer_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(cust, cust["c_custkey"] == ev["user_id"] + 1)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# C8 strict variant: as-of with value carry — for each signup, the latest
# view STRICTLY before it (attribution must not credit a same-instant
# impression), carrying the matched event's id alongside its timestamp.
# Same union + ordered-window shape as asof_purchase_click, one shuffle
# on user_id; the side ordering (signup 0 < view 1 at equal ts) is what
# turns the carry inclusive->strict.
# ---------------------------------------------------------------------------
@query(
    "asof_signup_prior_view",
    oracle="""
    SELECT s.event_id, s.user_id, s.ts,
           v.ts AS last_view_ts, v.event_id AS last_view_id
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON s.user_id = v.user_id AND s.ts > v.ts
    """,
    operators=("C8", "E2"),
)
def asof_signup_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id"
    )
    # at equal ts the view sorts AFTER the signup (side 1 > 0), so the
    # carry below never sees a same-instant view: strict as-of
    unioned = views.unionByName(signups)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = F.last(
        F.when(
            F.col("side") == 1, F.struct(F.col("ts"), F.col("event_id"))
        ),
        ignorenulls=True,
    ).over(w)
    return (
        unioned.withColumn("lv", carry)
        .filter(F.col("side") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("lv.ts").alias("last_view_ts"),
            F.col("lv.event_id").alias("last_view_id"),
        )
    )


# ---------------------------------------------------------------------------
# A5/J5 E2E with PLANTED duplicates: two readStream copies of the same
# source union into one stream, so every event_id arrives exactly twice
# across the query's micro-batches; dropDuplicatesWithinWatermark must
# physically remove the second copy before the checkpointed sink. The
# 90-day watermark exceeds the fixture's 30-day span, so no dedup state
# ever evicts and the stream's output is exactly one copy per event_id
# — which is why the single-table batch aggregate below is a full value
# oracle for a REAL streaming-dedup run (not a batch twin). Sink path
# is source-fingerprint-keyed: re-invocations restart from the
# committed checkpoint and reprocess nothing.
# ---------------------------------------------------------------------------
@query(
    "streaming_union_dedup_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events
    GROUP BY event_type
    """,
    operators=("A5", "J5", "G4", "J4"),
)
def streaming_union_dedup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    sunk = _dedup_roundtrip_sunk(spark, sf_dir)
    return sunk.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def _dedup_roundtrip_sunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The union-doubled → dedup-within-watermark → parquet-sink stream
    (see the roundtrip note above), returned as the SUNK batch frame.
    Checkpoint root is source-fingerprint-keyed, so the two queries
    reading it (roundtrip summary + the sliding/stateful combo below)
    run the stream once per fixture generation."""
    import hashlib
    import os
    import tempfile

    from cloudvectordb_spark.streaming.jobs import (
        dedup_within_watermark,
        read_events_stream,
        run_to_parquet_sink,
    )

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(
        f"dd|{os.path.abspath(sf_dir)}|{_src_fp(src)}".encode()
    ).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), "cloudvectordb_stream_dedup", tag
    )
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    run_to_parquet_sink(
        dedup_within_watermark(doubled, watermark="90 days"),
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
    )
    return spark.read.parquet(os.path.join(root, "out"))


# ---------------------------------------------------------------------------
# The full streaming lifecycle in ONE query (round 15): the union-doubled
# stream dedup-sinks exactly one copy per event_id (A5 readStream, J4
# watermark, J5 dropDuplicatesWithinWatermark, G4 exact dedup), then the
# SUNK output serves two downstream shapes — a 10m/5m sliding-window
# census per event type (J2: each event lands in exactly two windows)
# and a per-user stateful peak-exposure fold (J6 batch twin via L3
# applyInPandas: max prefix sum over time-ordered values — the running
# state a streaming per-key processor would carry; kernel shape matches
# user_running_total_grouped_map / streaming.jobs.running_user_totals_
# stream). Output grain: event_type, with the order-free global state
# summary (n_users exact, max peak — no cross-user float sum) repeated
# via a 1-row BNLJ. The oracle replays dedup as the raw table (the
# 90-day watermark exceeds the fixture span, so the stream provably
# re-emits exactly the source — pinned by streaming_union_dedup_
# roundtrip) and the stateful fold as a frame-bounded window max.
# ---------------------------------------------------------------------------
@query(
    "streaming_dedup_sliding_stateful_e2e",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws,
             event_type
      FROM events
    ),
    sw AS (
      SELECT event_type, CAST(count(DISTINCT ws) AS BIGINT) AS n_windows_10m
      FROM slid GROUP BY event_type
    ),
    base AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2)     AS sum_value
      FROM events GROUP BY event_type
    ),
    run AS (
      SELECT user_id,
             round(sum(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING), 2) AS rv
      FROM events
    ),
    peak AS (SELECT user_id, max(rv) AS peak FROM run GROUP BY user_id),
    st AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             round(max(peak), 2)      AS max_user_peak
      FROM peak
    )
    SELECT b.event_type, b.n, b.sum_value, sw.n_windows_10m,
           st.n_users, st.max_user_peak
    FROM base b JOIN sw USING (event_type) CROSS JOIN st
    """,
    operators=("A5", "J2", "J4", "J5", "J6", "G4", "L3", "D1"),
)
def streaming_dedup_sliding_stateful_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    sunk = _dedup_roundtrip_sunk(spark, sf_dir)

    base = sunk.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    sw = (
        sunk.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("_n"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_windows_10m"))
    )

    def peak_state(pdf: pd.DataFrame) -> pd.DataFrame:
        # the per-key state fold a streaming processor would run: walk
        # events in time order carrying (running, peak) — emitted once
        # per key at end-of-stream. cumsum rounded at 2dp exactly like
        # the oracle's frame sum (same sequential order ⇒ same float).
        pdf = pdf.sort_values(["ts", "event_id"])
        rv = pdf["value"].cumsum().round(2)
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "peak": [rv.max()]}
        )

    peaks = (
        sunk.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(peak_state, "user_id bigint, peak double")
    )
    st = peaks.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.max("peak"), 2).alias("max_user_peak"),
    )
    return base.join(sw, "event_type").crossJoin(st).select(
        "event_type", "n", "sum_value", "n_windows_10m",
        "n_users", "max_user_peak",
    )


# ---------------------------------------------------------------------------
# J2 third cover: 4-hour window sliding by 1 hour (each event in exactly
# 4 windows) with the D5 statistical aggregates inside the slide — the
# shape neither sliding twin exercises. Oracle materializes the window
# membership via 4 shifted epoch-aligned hourly buckets (1 h divides
# 4 h, so bucket starts coincide with Spark's window starts).
# ---------------------------------------------------------------------------
@query(
    "events_sliding_4h_value_stats",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts)
               - k.k * INTERVAL '1 hour' AS ws,
             event_type, value
      FROM events, (SELECT unnest(range(0, 4)) AS k) k
    )
    SELECT ws, event_type,
           CAST(count(*) AS BIGINT)      AS n,
           round(avg(value), 6)          AS avg_value,
           round(stddev_samp(value), 6)  AS sd_value
    FROM b
    GROUP BY ws, event_type
    """,
    operators=("J2", "D5", "D1"),
)
def events_sliding_4h_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "4 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "avg_value", "sd_value")
    )


# ---------------------------------------------------------------------------
# J4 third cover: the watermark DROP census — classify every event
# against the stream's would-be watermark cutoff (global max(ts) minus
# the 6-hour delay) per event type: how many rows a late-data policy
# would drop vs keep, and the kept value mass. The CASE WHEN
# classification mirrors what a watermarked streaming agg admits.
# ---------------------------------------------------------------------------
@query(
    "events_watermark_drop_census",
    oracle="""
    WITH c AS (SELECT max(ts) - INTERVAL '6 hours' AS cutoff FROM events)
    SELECT event_type,
           CAST(count(*) FILTER (WHERE ts < cutoff) AS BIGINT)  AS n_late,
           CAST(count(*) FILTER (WHERE ts >= cutoff) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN ts >= cutoff THEN value END), 2) AS kept_value
    FROM events, c
    GROUP BY event_type
    """,
    operators=("J4", "B8", "D2", "H5"),
)
def events_watermark_drop_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 6 HOURS")).alias("cutoff")
    )
    kept = F.col("ts") >= F.col("cutoff")
    return (
        ev.crossJoin(F.broadcast(cutoff))  # one-row global cutoff
        .groupBy("event_type")
        .agg(
            F.count(F.when(~kept, 1)).cast("bigint").alias("n_late"),
            F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
            F.round(F.sum(F.when(kept, F.col("value"))), 2).alias("kept_value"),
        )
    )


# ---------------------------------------------------------------------------
# J5 fourth cover, the OTHER dedup semantics: keep-LAST per key — the
# state-store "latest value wins" shape (dropDuplicates keeps first;
# streaming state upserts keep last). Deterministic total order via
# (ts, event_id) tiebreak.
# ---------------------------------------------------------------------------
@query(
    "events_state_keep_last",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)    AS n_keys,
           round(sum(value), 2)        AS sum_last_value
    FROM ranked WHERE rn = 1
    GROUP BY event_type
    """,
    operators=("J5", "E1", "D1"),
)
def events_state_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.round(F.sum("value"), 2).alias("sum_last_value"),
        )
    )


# ---------------------------------------------------------------------------
# J7 third cover: two-hop stream-static enrichment — events through the
# customer dim to the nation dim (both broadcast-sized static sides),
# per-nation activity. The static side of a stream-static join is
# always the broadcast candidate; two chained dims is the realistic
# enrichment shape.
# ---------------------------------------------------------------------------
@query(
    "events_enriched_nation_value",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT)               AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(avg(value), 6)                    AS avg_value
    FROM events
    JOIN customer ON user_id = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    operators=("J7", "C1", "C2", "D3"),
)
def events_enriched_nation_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )
