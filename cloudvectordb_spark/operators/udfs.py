"""UDF-surface queries (SURVEY.md §2 L1-L3, A6, J6-batch-twin).

The reference pipeline (/root/reference/README.md:2, S3 "building the
embeddings with the encoder") forces Python crossings; this module pins
the three crossing styles against the oracle so the slow path stays
honest:

- L1 row-at-a-time UDF — registered once to prove the API, deliberately
  on a filtered slice (the hot path uses built-ins; see doc_quality in
  operators.text_ops for the JVM-side equivalent).
- L2 Arrow-vectorized pandas UDF — the sanctioned fast path for numpy
  vector math; batch-for-batch ~10-100x the L1 form.
- L3 grouped-map applyInPandas — per-key imperative logic; its result is
  oracle-checked against the pure-SQL window twin, which is also the
  batch twin of J6 (applyInPandasWithState) in streaming.jobs.
- A6 — a query expressed ENTIRELY as spark.sql over registered views,
  proving the SQL entry point end-to-end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load, register_views
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# L1: scalar row-at-a-time Python UDF (bounded slice; API-proof, not hot path)
# ---------------------------------------------------------------------------
@query(
    "udf_priority_score",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE
             WHEN o_orderpriority LIKE '1%' THEN 100
             WHEN o_orderpriority LIKE '2%' THEN 80
             WHEN o_orderpriority LIKE '3%' THEN 60
             WHEN o_orderpriority LIKE '4%' THEN 40
             ELSE 20
           END + CASE WHEN o_totalprice > 200000 THEN 5 ELSE 0 END AS BIGINT)
             AS priority_score
    FROM orders
    WHERE o_orderkey < 500
    """,
    operators=("L1",),
)
def udf_priority_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("bigint")
    def score(priority: str, total: float) -> int:
        base = {"1": 100, "2": 80, "3": 60, "4": 40}.get(priority[:1], 20)
        return base + (5 if total > 200000 else 0)

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey", score("o_orderpriority", "o_totalprice").alias("priority_score")
    )


# ---------------------------------------------------------------------------
# L2: Arrow-vectorized pandas UDF — numpy cosine against a broadcast probe.
# The fast path for K7 when expression trees get too deep; one Arrow batch
# in, one numpy matmul out.
# ---------------------------------------------------------------------------
@query(
    "pandas_udf_cosine_vs_probe",
    oracle="""
    WITH p AS (
      SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pv), 6)
             AS cos_to_probe
    FROM embeddings e, p
    WHERE e.vec_id < 500
    """,
    operators=("L2", "K7"),
)
def pandas_udf_cosine_vs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    probe = np.asarray(
        emb.filter(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )
    pnorm = float(np.sqrt((probe * probe).sum()))

    @F.pandas_udf("double")
    def cos_to_probe(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        dots = m @ probe
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * pnorm))

    return (
        emb.filter(F.col("vec_id") < 500)
        .select("vec_id", F.round(cos_to_probe("embedding"), 6).alias("cos_to_probe"))
    )


# ---------------------------------------------------------------------------
# L3 grouped-map == batch twin of J6 (applyInPandasWithState): per-user
# running cumulative value over event time. The streaming-native form is
# streaming.jobs.running_user_totals_stream; tests assert all three agree.
# ---------------------------------------------------------------------------
@query(
    "user_running_total_grouped_map",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM events
    WHERE user_id < 10
    """,
    operators=("L3", "J6", "E3"),
)
def user_running_total_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)

    def running(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = pdf[["user_id", "event_id"]].copy()
        out["running_value"] = pdf["value"].cumsum().round(2)
        return out

    return ev.select("user_id", "event_id", "ts", "value").groupBy("user_id").applyInPandas(
        running, "user_id bigint, event_id bigint, running_value double"
    )


# ---------------------------------------------------------------------------
# A6: pure-SQL entry point over registered views (TPC-H Q10 shape)
# ---------------------------------------------------------------------------
@query(
    "sql_returned_revenue_by_customer",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    operators=("A6", "C1", "D1", "F2"),
    bench=True,
)
def sql_returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # SHUFFLE_HASH(lineitem): keyed shuffle for the fact-fact join — the
    # returnflag filter keeps ~25% of lineitem, which Catalyst's fixture
    # estimate would otherwise broadcast (fact-sized at 100 TB).
    # Q10's GROUP BY (c_custkey, c_name, n_name) is functionally
    # determined by c_custkey, so the dimension joins move AFTER the
    # top-20 cut: the fact-fact join and the aggregate shuffle carry
    # only (custkey, revenue) — no customer-name strings through two
    # exchanges — and customer/nation broadcast-join onto 20 rows.
    # Identical result under FK integrity (orphan custkeys would be
    # dropped post- instead of pre-limit; referential_orphan_audit
    # shows the fixtures have none, as does TPC-H by spec).
    return spark.sql(
        """
        SELECT c_custkey, c_name, n_name, revenue
        FROM (
          SELECT /*+ SHUFFLE_HASH(lineitem) */
                 o_custkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM orders
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
          GROUP BY o_custkey
          ORDER BY revenue DESC, o_custkey
          LIMIT 20
        ) top
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """
    )


# ---------------------------------------------------------------------------
# L5 via mapInArrow — the zero-copy sibling of mapInPandas (Arrow
# RecordBatch in, RecordBatch out; no pandas materialization). Used here
# for the vector-norm profile: norms computed with numpy over the Arrow
# buffer directly. Chunk semantics identical to mapInPandas, so the
# same 100 TB partitioning story applies; the saving is the per-batch
# pandas conversion.
# ---------------------------------------------------------------------------
@query(
    "arrow_vector_norms",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x)))), 6) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
    operators=("L5", "K6", "K12", "D1"),
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings").select("label", "embedding")

    def norms(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            vecs = np.stack(tbl["embedding"].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            out = pa.table(
                {
                    "label": tbl["label"],
                    "norm": pa.array(np.sqrt((vecs * vecs).sum(axis=1))),
                }
            )
            yield from out.to_batches()

    per_row = emb.mapInArrow(norms, schema="label int, norm double")
    return per_row.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# L-group, declarative form: a SQL UDF (CREATE FUNCTION ... RETURN expr,
# Spark 4) + parameterized spark.sql. Unlike Python UDFs, a SQL UDF is
# INLINED by Catalyst — full codegen, predicate pushdown through it,
# zero serialization boundary — which makes it the right first choice
# for any scalar logic expressible as an expression. The oracle inlines
# the same expression (DuckDB macros would be the literal equivalent).
# ---------------------------------------------------------------------------
@query(
    "sql_udf_revenue_bands",
    oracle="""
    SELECT band, count(*) AS n_lines, round(sum(net), 2) AS net_revenue
    FROM (
      SELECT l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net,
             CASE WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax) < 20000
                  THEN 'low'
                  WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax) < 60000
                  THEN 'mid' ELSE 'high' END AS band
      FROM lineitem WHERE l_quantity <= 30
    ) GROUP BY band
    """,
    operators=("L1", "A6", "D1", "B8"),
)
def sql_udf_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE, t DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(x DOUBLE) RETURNS STRING"
        " RETURN CASE WHEN x < 20000 THEN 'low'"
        " WHEN x < 60000 THEN 'mid' ELSE 'high' END"
    )
    # parameterized SQL: the quantity cap binds as a named parameter
    return spark.sql(
        """
        SELECT band, count(*) AS n_lines, round(sum(net), 2) AS net_revenue
        FROM (
          SELECT net_price(l_extendedprice, l_discount, l_tax) AS net,
                 price_band(net_price(l_extendedprice, l_discount, l_tax)) AS band
          FROM lineitem WHERE l_quantity <= :qty_cap
        ) GROUP BY band
        """,
        args={"qty_cap": 30},
    )


# ---------------------------------------------------------------------------
# J6/L3 second cover: per-user EWMA of event values — the genuinely
# SEQUENTIAL per-key state (EWMA_t = a*x_t + (1-a)*EWMA_{t-1}) computed
# the stateful way (applyInPandas loop per user, the batch twin of an
# applyInPandasWithState stream), while the ORACLE uses the closed form
# sum a*(1-a)^(n-i)*x_i — an iterative operator with a full value
# oracle, no unrolling needed.
# ---------------------------------------------------------------------------
_EWMA_A = 0.5


@query(
    "user_value_ewma_stateful",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
             count(*)    OVER (PARTITION BY user_id)                        AS n
      FROM events
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           round(sum(CASE WHEN i = 1
                          THEN value * pow(1 - {_EWMA_A}, n - 1)
                          ELSE {_EWMA_A} * value * pow(1 - {_EWMA_A}, n - i)
                     END), 4) AS ewma_value
    FROM ordered GROUP BY user_id
    """,
    operators=("J6", "L3", "E2", "D1"),
)
def user_value_ewma_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values(["ts", "event_id"])
        e = None
        for x in pdf["value"]:
            e = x if e is None else _EWMA_A * x + (1 - _EWMA_A) * e
        r4 = math.copysign(math.floor(abs(e) * 1e4 + 0.5), e) / 1e4
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma_value": [r4],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        ewma, "user_id long, n_events bigint, ewma_value double"
    )


# ---------------------------------------------------------------------------
# L4: grouped-AGG pandas UDF (the UDAF crossing style, distinct from the
# grouped-MAP form above) — token-weighted mean document length per
# language, the corpus-card statistic where long docs count by their
# token mass. Sums stay integer-exact in float64 (n_chars, token counts
# both << 2^53), so the oracle's SQL arithmetic reproduces the UDAF's
# value bit-for-bit under the shared round-6.
# ---------------------------------------------------------------------------
@query(
    "lang_weighted_len_udaf",
    oracle="""
    SELECT lang,
           round(sum(CAST(n_chars AS DOUBLE) * len(string_split(text, ' ')))
                 / sum(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
             AS w_mean_chars,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    operators=("L4", "K2", "D1"),
)
def lang_weighted_len_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(x: pd.Series, w: pd.Series) -> float:
        num = float((x.astype("float64") * w.astype("float64")).sum())
        den = float(w.astype("float64").sum())
        return num / den

    # Spark forbids mixing a grouped-agg pandas UDF with built-in aggs
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # second pandas UDAF rather than F.count
    @pandas_udf("long")
    def n_rows(x: pd.Series) -> int:
        return int(len(x))

    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    return docs.groupBy("lang").agg(
        F.round(wmean(F.col("n_chars"), F.col("n_tokens")), 6).alias(
            "w_mean_chars"
        ),
        n_rows(F.col("doc_id")).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# J6 third cover: per-key PEAK/DRAWDOWN state machine — the classic
# "track the running max, report the worst dip" per-key stateful logic
# (two state registers per key: peak, max_drawdown), batch-twinned as a
# grouped-map cummax over event-time order. The oracle replays the same
# state machine with SQL window frames.
# ---------------------------------------------------------------------------
@query(
    "user_value_peak_drawdown",
    oracle="""
    WITH runs AS (
      SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events
    )
    SELECT user_id,
           round(max(peak), 2)          AS peak_value,
           round(max(peak - value), 2)  AS max_drawdown
    FROM runs
    GROUP BY user_id
    """,
    operators=("J6", "L3", "D1"),
)
def user_value_peak_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")

    def drawdown(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        peak = pdf["value"].cummax()
        # aggregate UNROUNDED: Python round() is half-to-even while the
        # DuckDB oracle (and Spark F.round) round half away from zero —
        # rounding happens once, JVM-side, below.
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "peak_value": [float(peak.iloc[-1])],
                "max_drawdown": [float((peak - pdf["value"]).max())],
            }
        )

    return (
        ev.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            drawdown,
            "user_id bigint, peak_value double, max_drawdown double",
        )
        .select(
            "user_id",
            F.round("peak_value", 2).alias("peak_value"),
            F.round("max_drawdown", 2).alias("max_drawdown"),
        )
    )
