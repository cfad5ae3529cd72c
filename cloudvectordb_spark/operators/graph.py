"""Iterative graph analytics over derived document graphs (SURVEY.md §2
C1/D1 composition; [SCOPE] BASELINE.json:6 — corpus-structure analysis a
training-data pipeline runs on its near-dup graph to find hub/boilerplate
clusters).

``connected_components`` (operators/dedup.py) already proves the Pregel
min-label loop; this module adds weighted importance: PageRank over the
exact shingle-Jaccard near-dup graph. The Spark side is the standard
scalable loop — contributions = ranks ⋈ edges, grouped by destination,
localCheckpoint per round to cut lineage — and the DuckDB oracle UNROLLS
the same fixed iteration count as chained CTEs, so this iterative
algorithm is VALUE-level verified, not just rows-only.

100 TB shape: edges/degrees/ranks are all keyed DataFrames (no driver
state beyond the loop counter); each round is one keyed join + one keyed
aggregation, the same shuffle pattern as the CC loop. Rounds are fixed
(10), so the whole job is 10 chained stages — no convergence-check
actions on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.dedup import _CC_PAIRS_SQL, _CC_TAU, shingle_jaccard_edges
from cloudvectordb_spark.registry import query

_PR_ITERS = 10
_PR_DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    iters: int = _PR_ITERS,
    damping: float = _PR_DAMPING,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over an undirected edge list; returns (node, degree, rank)
    for every node with >= 1 edge. Symmetrized edges mean every node has
    out-degree >= 1, so there is no dangling-mass correction term."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()  # 10 rounds re-derive the edge set otherwise
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d")).select(
        F.col("u").alias("dnode"), "d"
    )
    n = deg.count()  # bounded: one scalar, the loop's only driver value
    ranks = deg.select(F.col("dnode").alias("node"), F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            ranks.join(deg, ranks.node == deg.dnode)
            .join(sym, ranks.node == sym.u)
            .select(F.col("v").alias("node"), (F.col("r") / F.col("d")).alias("c"))
        )
        ranks = (
            contribs.groupBy("node")
            .agg((F.lit(base) + damping * F.sum("c")).alias("r"))
            .localCheckpoint()
        )
    return ranks.join(deg, ranks.node == deg.dnode).select(
        "node", F.col("d").cast("bigint").alias("degree"), "r"
    )


def _pagerank_oracle_sql(tau: float, iters: int, damping: float) -> str:
    """The exact PageRank computation as chained (unrolled) CTEs —
    recursive CTEs can't aggregate over the recursive term, so a fixed
    iteration count unrolls instead; generated once at import time."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, so
    # without it p10 re-expands the whole chain back to the O(n^2) pairs
    # CTE once per reference — measured 161 s vs ~2 s materialized.
    parts = [
        _CC_PAIRS_SQL.format(tau=tau).replace(
            "pairs AS (", "pairs AS MATERIALIZED ("
        ),
        """,
    edges AS MATERIALIZED (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    deg AS MATERIALIZED (SELECT u, count(*) AS d FROM edges GROUP BY u),
    nn AS MATERIALIZED (SELECT count(*) AS cnt FROM deg),
    p0 AS MATERIALIZED (
      SELECT u AS node, 1.0 / (SELECT cnt FROM nn) AS r FROM deg)
    """,
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    p{t} AS MATERIALIZED (
      SELECT e.v AS node,
             {1.0 - damping} / (SELECT cnt FROM nn)
               + {damping} * sum(p.r / dg.d) AS r
      FROM p{t - 1} p
      JOIN edges e ON p.node = e.u
      JOIN deg dg ON p.node = dg.u
      GROUP BY e.v
    )"""
        )
    parts.append(
        f"""
    SELECT p.node AS doc_id,
           CAST(dg.d AS BIGINT) AS degree,
           round(p.r, 6)        AS rank
    FROM p{iters} p JOIN deg dg ON p.node = dg.u
    """
    )
    return "".join(parts)


@query(
    "doc_similarity_pagerank",
    oracle=_pagerank_oracle_sql(_CC_TAU, _PR_ITERS, _PR_DAMPING),
    operators=("C1", "D1", "G5", "H7"),
)
def doc_similarity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank documents by centrality in the near-dup graph — high-rank
    nodes are template/boilerplate hubs worth human review beyond plain
    cluster canonicalization."""
    docs = load(spark, sf_dir, "documents")
    pr = pagerank(shingle_jaccard_edges(docs, _CC_TAU))
    return pr.select(
        F.col("node").alias("doc_id"),
        "degree",
        F.round("r", 6).alias("rank"),
    )
