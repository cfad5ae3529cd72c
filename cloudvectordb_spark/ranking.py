"""Scale-safe global ranking primitives (SURVEY.md §2 E1/E4/F1/F2).

A bare ``Window.orderBy(...)`` with no partition spec funnels the ENTIRE
input through one task (Spark warns ``WindowExec: No Partition Defined``)
— the classic 100-TB scale-killer. Two replacements cover every global
ranking shape this engine uses:

- ``global_topk_ranked``: when only the top-k survive, plan
  ``orderBy().limit(k)`` — Catalyst emits ``TakeOrderedAndProject``
  (per-partition heap top-k, driver merge of n_partitions x k rows) —
  then rank the <= k survivors with a constant-partitioned window.

- ``with_global_row_number``: when every row needs its exact global
  position (full-table rank / ntile), bucket rows by VALUE RANGE with a
  broadcast (min, max), count per bucket (tiny), turn counts into
  cumulative offsets, and add the bucket-local row_number. Global row
  number = bucket offset + local row number — exact for any bucket
  boundaries because bucketing is monotone in the order value. All
  exchanges are keyed (no single-partition stage); the only caveat is
  value skew concentrating one bucket: equal values share a bucket by
  construction, so a hot value held by p% of rows funnels p% of the
  input through one bucket's local window. Measured at 60M rows
  (tools/relational_scale_probe.py, BASELINE.md): uniform 12.4 s, 50%
  hot value 23.8 s (1.9x). Mitigation for known-skewed order values:
  pre-aggregate per distinct value and rank the (value, count) table
  instead (the customer_revenue_concentration pattern), or pick a
  higher-cardinality order column. The all-equal degenerate case
  (span = 0) puts every row in bucket 0 — equivalent to the
  single-reducer window this helper replaces — and means a global
  order on that column is meaningless anyway.

Cost note: like Spark's own RangePartitioner (sample pass before a
global sort), these helpers take a second pass over the input for the
(min, max) / per-bucket stats. The input subtree therefore appears
several times in the LOGICAL plan, but AQE exchange reuse collapses the
duplicates at runtime — the final adaptive plan of
customer_revenue_concentration shows the input aggregate's exchange
computed once and ReusedExchange everywhere else. Callers feeding an
expensive non-exchange-terminated subtree should persist it first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 256


def _zero(col: Column) -> Column:
    """A constant-0 partition key the optimizer can NOT constant-fold away.

    ``partitionBy(F.lit(0))`` is stripped by Catalyst (foldable partition
    expressions are eliminated), which turns the window back into the
    warned "No Partition Defined" single-partition form. pmod(hash(col), 1)
    is 0 for every row but non-foldable, so the explicit partitioning — and
    the planner's knowledge that the input is already bounded — survives.
    """
    return F.pmod(F.xxhash64(col), F.lit(1))


def global_topk_ranked(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows under ``order`` with a 1..k bigint rank, without a
    single-partition window over the full input.

    ``order`` must be a deterministic TOTAL order (include a unique
    tiebreak column) so the result is replayable and oracle-matchable.
    """
    w = Window.partitionBy(_zero(F.col(df.columns[0]))).orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(w).cast("bigint"))
    )


def with_global_row_number(
    df: DataFrame,
    value_col: str,
    tiebreaks: list[Column],
    descending: bool = False,
    rn_col: str = "global_rn",
    total_col: str = "_total_rows",
    n_buckets: int = _BUCKETS,
) -> DataFrame:
    """Add the exact global row number under (value_col [DESC], *tiebreaks)
    plus the total row count, with no single-partition exchange.

    (value_col, *tiebreaks) must be a total order — equal values must be
    broken by a unique key, else the assigned positions are ambiguous.
    """
    val = F.col(value_col).cast("double")
    stats = df.agg(
        F.min(val).alias("_vmin"), F.max(val).alias("_vmax")
    )
    span = F.col("_vmax") - F.col("_vmin")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((val - F.col("_vmin")) / span * n_buckets),
            F.lit(n_buckets - 1),
        )
    )
    tagged = df.crossJoin(F.broadcast(stats)).withColumn("_bucket", bucket)

    # Tiny side: one row per non-empty bucket -> cumulative offsets in
    # global traversal order. n_buckets rows at most, so the constant
    # partition is explicit and trivially cheap.
    bucket_order = F.desc("_bucket") if descending else F.asc("_bucket")
    wo = Window.partitionBy(_zero(F.col("_bucket"))).orderBy(bucket_order)
    offsets = (
        tagged.groupBy("_bucket")
        .agg(F.count("*").alias("_bn"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_bn").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "_tot",
            F.sum("_bn").over(
                Window.partitionBy(_zero(F.col("_bucket"))).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select("_bucket", "_offset", "_tot")
    )

    value_order = F.desc(value_col) if descending else F.asc(value_col)
    wl = Window.partitionBy("_bucket").orderBy(value_order, *tiebreaks)
    return (
        tagged.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            rn_col,
            (F.col("_offset") + F.row_number().over(wl)).cast("bigint"),
        )
        .withColumn(total_col, F.col("_tot").cast("bigint"))
        .drop("_bucket", "_vmin", "_vmax", "_offset", "_bn", "_tot")
    )


def with_global_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    cum_col: str = "cum_before",
    total_col: str = "_total_weight",
    n_buckets: int = _BUCKETS,
) -> DataFrame:
    """Add the exact EXCLUSIVE prefix sum of ``weight_col`` under the
    global ``order_col`` ascending order (plus the grand total), with no
    single-partition exchange — the distributed scan primitive behind
    sequence packing / offset assignment.

    ``order_col`` must be unique (a total order by itself). Same shape as
    ``with_global_row_number``: bucket rows by value range (monotone, so
    bucket order == global order), reduce each bucket to its weight sum
    (tiny table), turn bucket sums into cumulative offsets, then add the
    bucket-local running sum. cum_before = bucket offset + local exclusive
    cumsum — exact for any bucket boundaries.
    """
    return with_global_prefix_sums(
        df, order_col, [weight_col], [cum_col], [total_col], n_buckets
    )


def with_global_prefix_sums(
    df: DataFrame,
    order_col: str,
    weight_cols: list[str],
    cum_cols: list[str],
    total_cols: list[str],
    n_buckets: int = _BUCKETS,
) -> DataFrame:
    """N exclusive prefix sums (plus grand totals) under ONE bucket pass
    (round 15): one stats aggregate, one offsets table, one bucket-local
    window ordering shared by every weight column. Chaining N single-
    weight calls instead re-derives the previous call's whole plan as
    the next call's input (N× the stats/offset/window machinery —
    ks_source_length_drift executed 21 scans that way)."""
    if not (len(weight_cols) == len(cum_cols) == len(total_cols)):
        raise ValueError(
            "with_global_prefix_sums: weight_cols, cum_cols and "
            f"total_cols must have equal lengths (got {len(weight_cols)}"
            f"/{len(cum_cols)}/{len(total_cols)}) — the output zip "
            "would silently drop trailing columns"
        )
    val = F.col(order_col).cast("double")
    stats = df.agg(F.min(val).alias("_vmin"), F.max(val).alias("_vmax"))
    span = F.col("_vmax") - F.col("_vmin")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor((val - F.col("_vmin")) / span * n_buckets),
            F.lit(n_buckets - 1),
        )
    )
    tagged = df.crossJoin(F.broadcast(stats)).withColumn("_bucket", bucket)

    wo = Window.partitionBy(_zero(F.col("_bucket"))).orderBy(F.asc("_bucket"))
    wtot = Window.partitionBy(_zero(F.col("_bucket"))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = tagged.groupBy("_bucket").agg(
        *[F.sum(F.col(w)).alias(f"_bw{i}") for i, w in enumerate(weight_cols)]
    )
    for i in range(len(weight_cols)):
        offsets = offsets.withColumn(
            f"_offset{i}",
            F.coalesce(
                F.sum(f"_bw{i}").over(
                    wo.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).withColumn(f"_tot{i}", F.sum(f"_bw{i}").over(wtot))
    offsets = offsets.select(
        "_bucket",
        *[f"_offset{i}" for i in range(len(weight_cols))],
        *[f"_tot{i}" for i in range(len(weight_cols))],
    )

    wl = Window.partitionBy("_bucket").orderBy(F.asc(order_col))
    out = tagged.join(F.broadcast(offsets), "_bucket")
    for i, (w, c, t) in enumerate(zip(weight_cols, cum_cols, total_cols)):
        local_cum = F.coalesce(
            F.sum(w).over(wl.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        out = out.withColumn(
            c, (F.col(f"_offset{i}") + local_cum).cast("bigint")
        ).withColumn(t, F.col(f"_tot{i}").cast("bigint"))
    return out.drop(
        "_bucket",
        "_vmin",
        "_vmax",
        *[f"_offset{i}" for i in range(len(weight_cols))],
        *[f"_tot{i}" for i in range(len(weight_cols))],
    )


def with_global_running_max(
    df: DataFrame,
    bucket: Column,
    order: list[Column],
    value_col: str,
    out_col: str = "run_max",
) -> DataFrame:
    """Add the exact INCLUSIVE global running max of ``value_col`` under
    the total order (bucket ASC, *order), with no single-partition
    exchange — the distributed form of
    ``max(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``.

    ``bucket`` must be a monotone coarsening of the global order (every
    row of bucket b sorts before every row of bucket b+1 — e.g. a
    fixed-width prefix of the order key) with a bounded number of
    distinct values. Same shape as ``with_global_prefix_sum``: reduce
    each bucket to its max (tiny table, one row per bucket), take the
    exclusive prefix-max over bucket maxima on that tiny table, then
    combine with the bucket-local running max. Spark ``greatest`` skips
    NULLs, so the first bucket (no predecessor) falls back to its local
    running max alone.
    """
    tagged = df.withColumn("_bucket", bucket)
    # tiny side: <= n_buckets rows, so the constant partition is bounded
    wo = Window.partitionBy(_zero(F.col("_bucket"))).orderBy(F.asc("_bucket"))
    offsets = (
        tagged.groupBy("_bucket")
        .agg(F.max(value_col).alias("_bmax"))
        .withColumn(
            "_prev_max",
            F.max("_bmax").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .select("_bucket", "_prev_max")
    )
    wl = (
        Window.partitionBy("_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, F.greatest(F.max(value_col).over(wl), F.col("_prev_max")))
        .drop("_bucket", "_prev_max")
    )


def ntile_from_row_number(rn: Column, total: Column, n: int) -> Column:
    """SQL ``ntile(n)`` from a precomputed global row number: the first
    ``total % n`` buckets take ``ceil(total/n)`` rows, the rest take
    ``floor(total/n)`` — bit-for-bit the Spark/DuckDB ntile contract."""
    q = F.floor(total / n)
    rem = total % n
    big = q + 1
    in_big = rn <= rem * big
    return (
        F.when(in_big, F.floor((rn - 1) / big) + 1)
        .otherwise(rem + F.floor((rn - rem * big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("bigint")
    )
