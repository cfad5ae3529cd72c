"""Vector similarity operators (SURVEY.md §2 K6-K8, K12, C7, C10, E4;
reference S3/S4: "building the embeddings ... building the vectordb",
/root/reference/README.md:2).

Exact kNN here is the correctness baseline: broadcast the (small) probe
set against the corpus, score with the JVM-side higher-order cosine
expression, take top-k per probe with a rank window. At 100 TB the same
plan holds — probes broadcast, the corpus never shuffles, and the window
runs after an (probe_id)-partitioned exchange of only (probe, id, score)
triples. The approximate / partitioned-index path lives in
``operators.pipeline`` (K9/K10).

Scores are computed in DOUBLE and rounded to 6 decimals BEFORE ranking on
both sides so Spark and the DuckDB oracle order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import vector as V
from cloudvectordb_spark.ranking import global_topk_ranked
from cloudvectordb_spark.registry import query


def exact_knn(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K8 exact kNN: broadcast probes x corpus, cosine top-k per probe.

    Returns (probe_id, neighbor_id, score, rank). Deterministic: rank on
    (rounded score DESC, neighbor_id ASC).
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(p))
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(V.cosine(vec_col, "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# K8/E4/C10: exact kNN, 5 probes, top-10
# ---------------------------------------------------------------------------
@query(
    "knn_exact_cosine",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT p.probe_id,
             e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
      FROM embeddings e, p
      WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    # C7: exact_knn IS the bounded cross join (corpus.crossJoin(
    # broadcast(probes)) — the oracle's `FROM embeddings e, p` twin).
    operators=("K8", "K7", "E4", "C10", "C2", "C7"),
    bench=True,
)
def knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return exact_knn(emb, probes, k=10)


# ---------------------------------------------------------------------------
# K6/K12: norm statistics & embedding quality gates per label
# ---------------------------------------------------------------------------
@query(
    "vector_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))), 6)
             AS avg_norm,
           count(*) FILTER (WHERE len(embedding) = 64) AS n_dim_ok
    FROM embeddings
    GROUP BY label
    """,
    operators=("K6", "K12", "H8", "D1"),
)
def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("norm", V.l2_norm("embedding"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.count(F.when(F.size("embedding") == 64, 1)).alias("n_dim_ok"),
        )
    )


# ---------------------------------------------------------------------------
# K7/C7: pairwise similarity metrics over a bounded probe set
# ---------------------------------------------------------------------------
@query(
    "vector_pair_metrics",
    oracle="""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim,
           round(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)     AS dot_prod,
           round(list_distance(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), 6)          AS l2_dist
    FROM embeddings a, embeddings b
    WHERE a.vec_id < 20 AND b.vec_id < 20 AND a.vec_id < b.vec_id
    """,
    operators=("K7", "C7", "H8"),
)
def vector_pair_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(V.cosine("va", "vb"), 6).alias("cos_sim"),
            F.round(V.dot("va", "vb"), 6).alias("dot_prod"),
            F.round(V.l2_distance("va", "vb"), 6).alias("l2_dist"),
        )
    )


# ---------------------------------------------------------------------------
# G6/C10: semantic near-duplicate pairs (cosine over threshold).
# All-pairs is bounded here; the scale path is the LSH/IVF bucket join
# (operators.pipeline) which turns this into an equi-join on bucket id.
# ---------------------------------------------------------------------------
@query(
    "semantic_dup_pairs",
    oracle="""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    """,
    operators=("G6", "C10", "K7"),
)
def semantic_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(V.cosine("va", "vb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


# ---------------------------------------------------------------------------
# L4-shape (oracle-checkable): per-label centroid in long form
# ---------------------------------------------------------------------------
@query(
    "label_centroids_long",
    oracle="""
    SELECT label, i AS dim_idx, round(avg(v), 6) AS centroid_val
    FROM (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[]))        AS v,
             generate_subscripts(embedding, 1)          AS i
      FROM embeddings
    )
    GROUP BY label, i
    """,
    operators=("L4", "H7", "D1"),
)
def label_centroids_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "label",
            (F.col("pos") + 1).cast("bigint").alias("dim_idx"),
            F.col("v").cast("double").alias("v"),
        )
        .groupBy("label", "dim_idx")
        .agg(F.round(F.avg("v"), 6).alias("centroid_val"))
    )


# ---------------------------------------------------------------------------
# K6: L2 normalization invariant — unit norm after normalize
# ---------------------------------------------------------------------------
@query(
    "vector_normalize_check",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), y -> y * y)))),
             z -> z * z))), 6) AS unit_norm
    FROM embeddings
    WHERE vec_id < 10
    """,
    operators=("K6", "H8"),
)
def vector_normalize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    n = V.l2_norm("embedding")
    unit = F.transform("embedding", lambda x: x.cast("double") / n)
    unit_norm = F.sqrt(
        F.aggregate(
            F.transform(unit, lambda z: z * z), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return emb.select("vec_id", F.round(unit_norm, 6).alias("unit_norm"))


# ---------------------------------------------------------------------------
# K8 fast path: numpy-matmul exact kNN with per-partition partial top-k.
# Each Arrow batch scores ALL probes at once (one BLAS matmul) and emits
# only its local top-k per probe, so the exchange carries at most
# k x n_probes rows PER PARTITION instead of the full n_corpus x n_probes
# score matrix — the map-side-combine idea applied to kNN. Exact, not
# approximate: global top-k of unioned local top-ks == true top-k.
# ---------------------------------------------------------------------------
def exact_knn_fast(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    import numpy as np
    import pandas as pd

    rows = probes.select(id_col, vec_col).collect()  # bounded probe set
    probe_ids = np.array([r[0] for r in rows], dtype=np.int64)
    pm = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    pm /= np.linalg.norm(pm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ pm.T  # (batch, n_probes)
            out_p, out_n, out_s = [], [], []
            for j, pid in enumerate(probe_ids):
                col = sims[:, j]
                cand = np.flatnonzero(ids != pid)
                # Local selection must use the SAME total order as the final
                # global rank (rounded score DESC, neighbor_id ASC), else a
                # raw-score near-tie straddling the local-k boundary can drop
                # the row the oracle ranks first. Threshold-select on the
                # rounded score (keeping boundary ties), then exact-sort.
                # half-up (Spark F.round / DuckDB round() convention):
                # np.round is banker's half-even and would diverge from
                # the oracle at exact .5e-7 boundaries
                r = np.sign(col[cand]) * np.floor(np.abs(col[cand]) * 1e6 + 0.5) / 1e6
                if len(cand) > k:
                    thr = np.partition(r, len(r) - k)[len(r) - k]
                    keep = np.flatnonzero(r >= thr)
                else:
                    keep = np.arange(len(cand))
                order = np.lexsort((ids[cand[keep]], -r[keep]))[:k]
                top = cand[keep[order]]
                out_p.extend([pid] * len(top))
                out_n.extend(ids[top])
                out_s.extend(r[keep[order]])
            yield pd.DataFrame(
                {"probe_id": out_p, "neighbor_id": out_n, "score": out_s}
            )

    local = corpus.mapInPandas(
        score, schema="probe_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


@query(
    "knn_exact_fast",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT p.probe_id,
             e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.probe_vec), 6) AS score
      FROM embeddings e, p
      WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "L2", "L5", "E4"),
    bench=True,
)
def knn_exact_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same answer as knn_exact_cosine (same oracle SQL), different
    physical path: BLAS batch scoring + partial top-k."""
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return exact_knn_fast(emb, probes, k=10)


# ---------------------------------------------------------------------------
# K6 storage path: int8 scalar quantization. At 100 TB the index holds
# 4x fewer bytes if vectors store as int8 + one scale per vector; search
# dequantizes on the fly. Pure higher-order expressions (no UDF) so the
# oracle verifies the quantize -> dequantize -> fidelity loop exactly.
# ---------------------------------------------------------------------------
@query(
    "embedding_int8_quant_error",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS scale
      FROM embeddings WHERE vec_id < 200
    ),
    d AS (
      SELECT vec_id, v, scale,
             list_transform(v, x -> round(x / scale) * scale) AS vq
      FROM q
    )
    SELECT vec_id,
           round(scale, 8) AS scale,
           round(list_cosine_similarity(v, vq), 6) AS cos_fidelity,
           round(sqrt(list_sum(list_transform(
             list_zip(v, vq), p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS l2_err
    FROM d
    """,
    operators=("K6", "H8", "K12"),
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    v = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / 127.0
    q = emb.select("vec_id", v.alias("v"), scale.alias("scale"))
    vq = F.transform("v", lambda x: F.round(x / F.col("scale")) * F.col("scale"))
    d = q.select("vec_id", "v", "scale", vq.alias("vq"))
    diff_sq = F.aggregate(
        F.zip_with("v", "vq", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "vec_id",
        F.round("scale", 8).alias("scale"),
        F.round(V.cosine("v", "vq"), 6).alias("cos_fidelity"),
        F.round(F.sqrt(diff_sq), 6).alias("l2_err"),
    )


# ---------------------------------------------------------------------------
# Late-interaction (ColBERT-style maxsim) retrieval: documents are bags of
# chunk vectors; score(query, doc) = sum over query chunks of the max
# cosine against any doc chunk. The fixture has no chunk table, so vec_id
# % 50 partitions the embeddings into 50 pseudo-documents (deterministic,
# oracle-replayable); pseudo-doc 0's first 10 chunks act as the query.
#
# Scale shape: the query side is broadcast (a query is tens of chunks);
# the corpus streams through one cross-score projection, then two
# key-local aggregations — max per (doc, query_chunk), sum per doc — both
# combine map-side, so the only shuffled rows are (doc, chunk, sim)
# triples already reduced per input partition. Per-pair cosines are
# rounded to 6 BEFORE max/sum so both engines rank identically.
# ---------------------------------------------------------------------------
@query(
    "maxsim_late_interaction",
    oracle="""
    WITH chunks AS (
      SELECT vec_id % 50 AS pdoc, vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    probe AS (
      SELECT vec_id AS probe_chunk, v FROM chunks WHERE pdoc = 0
      ORDER BY vec_id LIMIT 10
    ),
    best AS (
      SELECT c.pdoc, p.probe_chunk,
             max(round(list_cosine_similarity(p.v, c.v), 6)) AS best_sim
      FROM chunks c CROSS JOIN probe p
      WHERE c.pdoc <> 0
      GROUP BY 1, 2
    ),
    scored AS (SELECT pdoc, round(sum(best_sim), 6) AS maxsim FROM best GROUP BY 1)
    SELECT pdoc, maxsim,
           CAST(row_number() OVER (ORDER BY maxsim DESC, pdoc) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    operators=("K8", "K7", "E4", "C10", "L6"),
    bench=True,
)
def maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "pdoc", F.col("vec_id") % 50
    )
    probe = (
        emb.filter(F.col("pdoc") == 0)
        .orderBy("vec_id")
        .limit(10)
        .select(F.col("vec_id").alias("probe_chunk"), F.col("embedding").alias("pv"))
    )
    best = (
        emb.filter(F.col("pdoc") != 0)
        .crossJoin(F.broadcast(probe))
        .groupBy("pdoc", "probe_chunk")
        .agg(F.max(F.round(V.cosine("embedding", "pv"), 6)).alias("best_sim"))
    )
    scored = best.groupBy("pdoc").agg(F.round(F.sum("best_sim"), 6).alias("maxsim"))
    # Top-5 via TakeOrderedAndProject; at real scale `scored` is one row
    # per document, so a bare global rank window would single-partition it.
    return global_topk_ranked(scored, [F.desc("maxsim"), F.asc("pdoc")], 5)


# ---------------------------------------------------------------------------
# K6/K8: binary (sign) quantization + Hamming-distance search — the 1-bit
# compression tier below PQ (32x less I/O than float32; Hamming is a few
# xor+popcount instructions). Signatures pack into two 32-bit words held
# in bigints so neither engine hits signed-shift overflow at bit 63, and
# the WHOLE path — packing, xor/popcount distance, per-probe top-k — is
# value-level oracle-checked. Corpus scan is map-only; candidates then
# rank under a keyed (per-probe) window. At 100 TB the binary scan is the
# cheap first stage; exact rescore of survivors follows the PQ pattern.
# ---------------------------------------------------------------------------
def _pack_sign_word(vec_col: str, offset: int):
    """Bits offset..offset+31 of the sign pattern as a bigint word."""
    return F.expr(
        f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + IF(element_at({vec_col}, i + {offset} + 1) > 0, "
        f"shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
    )


_BINQ_PACK_SQL = """
    packed AS (
      SELECT vec_id,
             list_sum(list_transform(generate_series(1, 32),
               i -> CASE WHEN embedding[i] > 0
                         THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)) AS w0,
             list_sum(list_transform(generate_series(33, 64),
               i -> CASE WHEN embedding[i] > 0
                         THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END)) AS w1
      FROM embeddings
    )
"""


@query(
    "binary_quant_hamming_topk",
    oracle=f"""
    WITH {_BINQ_PACK_SQL}
    SELECT probe_id, neighbor_id, hamming, rank FROM (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(p.w0, c.w0))
                + bit_count(xor(p.w1, c.w1)) AS BIGINT) AS hamming,
             CAST(row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY bit_count(xor(p.w0, c.w0)) + bit_count(xor(p.w1, c.w1)),
                        c.vec_id) AS BIGINT) AS rank
      FROM packed p JOIN packed c ON c.vec_id <> p.vec_id
      WHERE p.vec_id < 3
    ) WHERE rank <= 10
    """,
    operators=("K6", "K8", "K12", "E4", "H4"),
)
def binary_quant_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        _pack_sign_word("embedding", 0).alias("w0"),
        _pack_sign_word("embedding", 32).alias("w1"),
    )
    probes = packed.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("w0").alias("p0"),
        F.col("w1").alias("p1"),
    )
    hamming = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("p0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("p1")))
    ).cast("bigint")
    scored = (
        packed.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            hamming.alias("hamming"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K6/K8: Matryoshka-style truncated-dimension retrieval — rank by cosine
# over only the FIRST 16 of 64 dims (4x less compute/IO, the "adaptive
# dimensionality" serving trick), flagging which truncated hits survive
# in the full-dim top-10. Cosine is scale-invariant, so truncation needs
# no renormalization for ranking. Entirely Column expressions; the
# overlap flag joins two bounded top-k sets.
# ---------------------------------------------------------------------------
_MATRYOSHKA_DIM = 16


@query(
    "matryoshka_truncated_knn",
    oracle=f"""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
      FROM embeddings WHERE vec_id < 3
    ),
    t16 AS (
      SELECT probe_id, neighbor_id, score16, rank16 FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[])[1:{_MATRYOSHKA_DIM}],
                 p.pv[1:{_MATRYOSHKA_DIM}]), 6) AS score16,
               CAST(row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[])[1:{_MATRYOSHKA_DIM}],
                            p.pv[1:{_MATRYOSHKA_DIM}]), 6) DESC,
                          e.vec_id) AS BIGINT) AS rank16
        FROM embeddings e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rank16 <= 10
    ),
    tfull AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]), p.pv), 6) DESC,
                          e.vec_id) AS r
        FROM embeddings e, p WHERE e.vec_id <> p.probe_id
      ) WHERE r <= 10
    )
    SELECT t16.probe_id, t16.neighbor_id, t16.score16, t16.rank16,
           tfull.neighbor_id IS NOT NULL AS in_full_top10
    FROM t16 LEFT JOIN tfull
      ON t16.probe_id = tfull.probe_id AND t16.neighbor_id = tfull.neighbor_id
    """,
    operators=("K6", "K8", "K12", "E4", "H7"),
)
def matryoshka_truncated_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    short = emb.select(
        "vec_id", F.slice("embedding", 1, _MATRYOSHKA_DIM).alias("v16"), "embedding"
    )
    probes = short.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v16").alias("p16"),
        F.col("embedding").alias("pfull"),
    )
    scored = (
        short.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("v16", "p16"), 6).alias("score16"),
            F.round(V.cosine("embedding", "pfull"), 6).alias("score_full"),
        )
    )
    w16 = Window.partitionBy("probe_id").orderBy(
        F.desc("score16"), F.asc("neighbor_id")
    )
    wfull = Window.partitionBy("probe_id").orderBy(
        F.desc("score_full"), F.asc("neighbor_id")
    )
    t16 = (
        scored.withColumn("rank16", F.row_number().over(w16).cast("bigint"))
        .filter(F.col("rank16") <= 10)
        .select("probe_id", "neighbor_id", "score16", "rank16")
    )
    tfull = (
        scored.withColumn("rf", F.row_number().over(wfull))
        .filter(F.col("rf") <= 10)
        .select("probe_id", F.col("neighbor_id").alias("full_neighbor"))
    )
    return (
        t16.join(
            tfull,
            (t16.probe_id == tfull.probe_id)
            & (t16.neighbor_id == tfull.full_neighbor),
            "left",
        )
        .select(
            t16.probe_id,
            "neighbor_id",
            "score16",
            "rank16",
            F.col("full_neighbor").isNotNull().alias("in_full_top10"),
        )
    )


# ---------------------------------------------------------------------------
# K12: per-dimension variance profile — the dimensional-collapse check
# run before trusting an embedding space (dead dims => wasted capacity,
# near-zero variance across many dims => collapse). posexplode keeps it
# one linear pass; the groupBy key space is exactly `dim` (64 groups),
# so the shuffle is trivial at any corpus size and combines map-side.
# ---------------------------------------------------------------------------
@query(
    "embedding_dim_variance_profile",
    oracle="""
    WITH u AS (
      SELECT s.dim AS dim, s.x AS x
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(l)),
                 i -> struct_pack(dim := i - 1, x := l[i]))) AS s
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS l FROM embeddings)
      )
    )
    SELECT CAST(dim AS BIGINT)          AS dim,
           round(avg(x), 6)             AS mean,
           round(var_samp(x), 6)        AS variance,
           var_samp(x) < 1e-9           AS is_dead
    FROM u GROUP BY dim
    """,
    operators=("K12", "K6", "H7", "H8", "D1", "D5"),
)
def embedding_dim_variance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
        )
        .groupBy("dim")
        .agg(
            F.round(F.avg("x"), 6).alias("mean"),
            F.round(F.var_samp("x"), 6).alias("variance"),
            (F.var_samp("x") < 1e-9).alias("is_dead"),
        )
        .select(F.col("dim").cast("bigint"), "mean", "variance", "is_dead")
    )


# ---------------------------------------------------------------------------
# K8: reciprocal nearest neighbors — pairs where EACH vector is in the
# OTHER's top-k. The mutual-match filter behind bitext/parallel-corpus
# mining and high-precision duplicate detection: one-directional kNN
# has hubness false positives; reciprocity kills them. Shape: one
# directed top-k table (probes bounded here; banded/IVF at scale),
# self-joined on the reversed pair — the join input is k rows per
# probe, never corpus x corpus.
# ---------------------------------------------------------------------------
_RNN_K = 5
_RNN_LIM = 50


@query(
    "reciprocal_nn_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < {_RNN_LIM}
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_cosine_similarity(a.e, b.e), 6) AS score
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    topk AS (
      SELECT src, dst, score,
             row_number() OVER (PARTITION BY src
                                ORDER BY score DESC, dst) AS rnk
      FROM scored QUALIFY rnk <= {_RNN_K}
    )
    SELECT t1.src AS a_id, t1.dst AS b_id, t1.score
    FROM topk t1 JOIN topk t2 ON t1.src = t2.dst AND t1.dst = t2.src
    WHERE t1.src < t1.dst
    """,
    operators=("K8", "K7", "E4", "C9", "C10"),
)
def reciprocal_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _RNN_LIM)
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"))
    scored = (
        a.join(F.broadcast(b), F.col("src") != F.col("dst"))
        .select(
            "src", "dst", F.round(V.cosine("ea", "eb"), 6).alias("score")
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _RNN_K)
        .select("src", "dst", "score")
    )
    rev = topk.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    return (
        topk.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("a_id"), F.col("dst").alias("b_id"), "score"
        )
    )


# ---------------------------------------------------------------------------
# K12: embedding drift between snapshots — per-label centroid shift
# when the corpus grows (old snapshot = vec_id < 400 vs full). The QA
# gate run after an encoder refresh or a large ingest: a label whose
# centroid moved far means its region of the space was re-shaped and
# downstream indexes (IVF cells, PQ codebooks) need rebuilding. Shape:
# posexplode -> (label, dim) means per snapshot (map-side combinable),
# a (label, dim)-keyed join, one sqrt per label.
# ---------------------------------------------------------------------------
_DRIFT_OLD_LIM = 400


@query(
    "embedding_drift_centroid_shift",
    oracle=f"""
    WITH expl AS (
      SELECT label, s.dim AS dim, s.x AS x, vec_id < {_DRIFT_OLD_LIM} AS is_old
      FROM (
        SELECT vec_id, label,
               unnest(list_transform(generate_series(1, len(l)),
                        i -> struct_pack(dim := i - 1, x := l[i]))) AS s
        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS l
              FROM embeddings)
      )
    ),
    old_c AS (
      SELECT label, dim, avg(x) AS m FROM expl WHERE is_old GROUP BY label, dim
    ),
    new_c AS (
      SELECT label, dim, avg(x) AS m FROM expl GROUP BY label, dim
    )
    SELECT o.label,
           round(sqrt(sum((o.m - n.m) * (o.m - n.m))), 6) AS centroid_shift
    FROM old_c o JOIN new_c n ON o.label = n.label AND o.dim = n.dim
    GROUP BY o.label
    """,
    operators=("K12", "K6", "D1", "C1", "H6", "H7"),
)
def embedding_drift_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    expl = emb.select(
        "label",
        (F.col("vec_id") < _DRIFT_OLD_LIM).alias("is_old"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    old_c = (
        expl.filter("is_old")
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("m_old"))
    )
    new_c = expl.groupBy("label", "dim").agg(F.avg("x").alias("m_new"))
    return (
        old_c.join(new_c, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("m_old") - F.col("m_new"), 2))), 6
            ).alias("centroid_shift")
        )
    )


# ---------------------------------------------------------------------------
# K12/K8: matryoshka dimension sweep — recall@10 of truncated-dimension
# cosine (8/16/32 of 64) against the full-width ranking, per probe, in
# ONE query. "How many dims does this space actually need" as a
# measured number instead of a guess; fully deterministic (no seeded
# index), so unlike the ANN recall reports this carries a value-level
# oracle. Scale shape: widths explode a constant 3-element array; each
# width's scoring is the same broadcast-probe scan as exact kNN.
# ---------------------------------------------------------------------------
_MATRYOSHKA_WIDTHS = (8, 16, 32)


@query(
    "matryoshka_recall_curve",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    p AS (SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < 3),
    full_top AS (
      SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, v.vec_id,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY list_cosine_similarity(v.e, p.pe) DESC, v.vec_id) AS r
        FROM v, p WHERE v.vec_id <> p.probe_id
      ) WHERE r <= 10
    ),
    trunc_top AS (
      SELECT w, probe_id, vec_id FROM (
        SELECT ws.w, p.probe_id, v.vec_id,
               row_number() OVER (PARTITION BY ws.w, p.probe_id
                 ORDER BY list_cosine_similarity(v.e[1:ws.w], p.pe[1:ws.w]) DESC,
                          v.vec_id) AS r
        FROM v, p, (SELECT unnest(ARRAY{list(_MATRYOSHKA_WIDTHS)}) AS w) ws
        WHERE v.vec_id <> p.probe_id
      ) WHERE r <= 10
    )
    SELECT CAST(t.w AS BIGINT) AS width, t.probe_id,
           round(count(f.vec_id) / 10.0, 2) AS recall_at_10
    FROM trunc_top t
    LEFT JOIN full_top f
      ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
    GROUP BY t.w, t.probe_id
    """,
    operators=("K12", "K8", "K7", "E4", "H7", "H8"),
)
def matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    scored = emb.crossJoin(F.broadcast(probes)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    wfull = Window.partitionBy("probe_id").orderBy(
        F.desc(V.cosine("e", "pe")), F.asc("vec_id")
    )
    full_top = (
        scored.withColumn("r", F.row_number().over(wfull))
        .filter(F.col("r") <= 10)
        .select("probe_id", "vec_id")
    )
    widths = F.array(*[F.lit(w) for w in _MATRYOSHKA_WIDTHS])
    tr = scored.select(
        "probe_id",
        "vec_id",
        F.explode(widths).alias("w"),
        V.cosine(F.slice("e", 1, F.col("w")), F.slice("pe", 1, F.col("w"))).alias(
            "s"
        ),
    )
    wt = Window.partitionBy("w", "probe_id").orderBy(
        F.desc("s"), F.asc("vec_id")
    )
    trunc_top = (
        tr.withColumn("r", F.row_number().over(wt))
        .filter(F.col("r") <= 10)
        .select("w", "probe_id", "vec_id")
    )
    hits = trunc_top.join(
        full_top.select(
            F.col("probe_id").alias("fp"), F.col("vec_id").alias("fv")
        ),
        (F.col("probe_id") == F.col("fp")) & (F.col("vec_id") == F.col("fv")),
        "left",
    )
    return hits.groupBy(
        F.col("w").cast("bigint").alias("width"), "probe_id"
    ).agg(F.round(F.count("fv") / 10.0, 2).alias("recall_at_10"))


# ---------------------------------------------------------------------------
# K6/K8/H8: BINARY quantization + Hamming kNN — the 64x-compression ANN
# path (sign bit per dimension; 64 dims -> two 32-bit words in bigints).
# Distance becomes bit_count(xor(...)) — pure integer expression work
# inside whole-stage codegen, scanning 8 bytes per vector instead of
# 256: the cheapest possible first-pass filter at 100 TB, normally
# followed by an exact rescore of the survivors (the PQ/ADC pattern,
# pq.py). Deterministic end-to-end, so unlike the trained-index paths
# the ENTIRE search carries a value-level DuckDB oracle.
# ---------------------------------------------------------------------------
def _bq_word(col, start: int):
    """Sign bits of a 32-element slice packed into one bigint (bit i set
    iff element i >= 0). pow(2, i) is exact in double up to 2^52, so the
    packing stays expression-only (shiftleft needs a literal shift)."""
    bits = F.transform(
        F.slice(col, start, 32),
        lambda x, i: F.when(x >= 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


@query(
    "binary_quantized_hamming_knn",
    oracle="""
    WITH w AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(embedding[1:32],
               (x,i) -> CASE WHEN x >= 0 THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END)) AS BIGINT) AS w1,
             CAST(list_sum(list_transform(embedding[33:64],
               (x,i) -> CASE WHEN x >= 0 THEN (1::BIGINT << (i-1)) ELSE 0::BIGINT END)) AS BIGINT) AS w2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS probe_id, w1 AS q1, w2 AS q2 FROM w WHERE vec_id IN (0, 1, 2)),
    d AS (
      SELECT q.probe_id, w.vec_id,
             CAST(bit_count(xor(q.q1, w.w1)) + bit_count(xor(q.q2, w.w2)) AS BIGINT) AS hamming
      FROM q JOIN w ON w.vec_id <> q.probe_id
    ),
    r AS (
      SELECT probe_id, vec_id, hamming,
             row_number() OVER (PARTITION BY probe_id ORDER BY hamming, vec_id) AS rk
      FROM d
    )
    SELECT probe_id, vec_id, hamming, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 10
    """,
    operators=("K8", "K6", "H8", "E4", "C10"),
)
def binary_quantized_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        _bq_word(F.col("embedding"), 1).alias("w1"),
        _bq_word(F.col("embedding"), 33).alias("w2"),
    )
    probes = words.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("w1").alias("q1"),
        F.col("w2").alias("q2"),
    )
    scored = (
        words.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                F.bit_count(F.col("q1").bitwiseXOR(F.col("w1")))
                + F.bit_count(F.col("q2").bitwiseXOR(F.col("w2")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("probe_id", "vec_id", "hamming", "rk")
    )


# ---------------------------------------------------------------------------
# K6/K12: int8 scalar quantization quality — per-vector symmetric
# quantization (scale = 127/max|x|), reconstruction RMSE aggregated per
# label. The compression-quality audit run before shipping a quantized
# index: all expression work (no UDF), and the whole computation has an
# exact DuckDB twin (floor(x*scale + 0.5) avoids engine-specific
# round-half conventions).
# ---------------------------------------------------------------------------
@query(
    "int8_quantization_error",
    oracle="""
    WITH v AS (
      SELECT label, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
      FROM embeddings
    ),
    e AS (
      SELECT label,
             sqrt(list_avg(list_transform(embedding,
               x -> pow(CAST(x AS DOUBLE)
                        - floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5)
                          / (127.0 / amax), 2)))) AS rmse
      FROM v WHERE amax > 0
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(rmse), 6)      AS avg_rmse,
           round(max(rmse), 6)      AS max_rmse
    FROM e GROUP BY label
    """,
    operators=("K6", "K12", "H8", "D1"),
)
def int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    amax = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    v = emb.select("label", "embedding", amax.alias("amax")).filter(F.col("amax") > 0)
    scale = F.lit(127.0) / F.col("amax")
    sq_err = F.transform(
        F.col("embedding"),
        lambda x: F.pow(
            x.cast("double") - F.floor(x.cast("double") * scale + 0.5) / scale, 2
        ),
    )
    rmse = F.sqrt(
        F.aggregate(sq_err, F.lit(0.0), lambda a, b: a + b) / F.size("embedding")
    )
    return (
        v.select("label", rmse.alias("rmse"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.avg("rmse"), 6).alias("avg_rmse"),
            F.round(F.max("rmse"), 6).alias("max_rmse"),
        )
    )


# ---------------------------------------------------------------------------
# K6/K12: Johnson-Lindenstrauss random projection (64 -> 16 dims) with an
# md5-replayable sign matrix, so the ENTIRE sketch path has a value-level
# DuckDB oracle (same trick as minhash_banded_pairs_md5). JL sketches are
# the cheap-prefilter tier below int8/PQ: 4x fewer floats per vector with
# distance distortion bounded w.h.p.; at 100 TB the projection is a pure
# map stage (16 fixed +/-1 dot products per vector, matrix in the plan,
# zero shuffle) and the distance check here measures the actual
# distortion on bounded pairs.
# ---------------------------------------------------------------------------
_JL_OUT = 16
_JL_IN = 64


def _jl_sign(i: int, j: int) -> int:
    import hashlib

    return 1 if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] in "02468ace" else -1


def jl_project(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append ``jl`` — the 16-dim signed-sum projection of ``vec_col``
    (scaled 1/sqrt(16)); JVM-side higher-order functions, no Python."""
    dims = []
    for i in range(_JL_OUT):
        signs = ",".join(
            f"{_jl_sign(i, j)}D" for j in range(_JL_IN)
        )
        dims.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, array({signs}),"
                " (x, s) -> CAST(x AS DOUBLE) * s), 0D, (acc, x) -> acc + x) / 4"
            ).alias(f"jl{i}")
        )
    return df.withColumn("jl", F.array(*dims))


@query(
    "jl_projection_distance_check",
    oracle=f"""
    WITH signs AS (
      SELECT i, j,
             CASE WHEN substr(md5(i || '_' || j), 1, 1)
                  IN ('0','2','4','6','8','a','c','e')
                  THEN 1.0 ELSE -1.0 END AS s
      FROM range({_JL_OUT}) t(i), range({_JL_IN}) u(j)
    ), proj AS (
      SELECT e.vec_id,
             list(dim ORDER BY i) AS jl
      FROM (
        SELECT e2.vec_id, s.i,
               sum(CAST(e2.embedding[s.j + 1] AS DOUBLE) * s.s) / 4 AS dim
        FROM embeddings e2, signs s
        WHERE e2.vec_id < 40
        GROUP BY e2.vec_id, s.i
      ) AS e
      GROUP BY e.vec_id
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sqrt(list_sum(list_transform(
               list_zip(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])),
               p -> (p[1] - p[2]) * (p[1] - p[2])))) AS d64,
             sqrt(list_sum(list_transform(
               list_zip(a.jl, b.jl), p -> (p[1] - p[2]) * (p[1] - p[2])))) AS d16
      FROM proj a JOIN proj b ON a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
    )
    SELECT id_a, id_b, round(d64, 4) AS d64, round(d16, 4) AS d16,
           round(d16 / d64, 3) AS distortion
    FROM pairs
    """,
    operators=("K6", "K12", "H8", "C9", "H4"),
)
def jl_projection_distance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    proj = jl_project(emb).select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"), "jl"
    )
    a = proj.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("jl").alias("ja")
    )
    b = proj.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("jl").alias("jb")
    )
    l2 = (
        lambda x, y: F.sqrt(
            F.expr(
                f"aggregate(zip_with({x}, {y}, (p, q) -> (p - q) * (p - q)),"
                " 0D, (acc, z) -> acc + z)"
            )
        )
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(l2("va", "vb"), 4).alias("d64"),
        F.round(l2("ja", "jb"), 4).alias("d16"),
        F.round(l2("ja", "jb") / l2("va", "vb"), 3).alias("distortion"),
    )


# ---------------------------------------------------------------------------
# K8: kNN through the JL tier — coarse top-C by 16-dim distance (4x less
# compute/IO than full vectors), exact rescore of C candidates, top-k
# out. The md5-replayable projection makes even the CANDIDATE SET
# deterministic, so unlike recall-gated IVF/PQ this prefilter path has a
# full value-level oracle. At 100 TB: coarse pass is a linear map over a
# 4x smaller representation; rescore touches C rows/probe.
# ---------------------------------------------------------------------------
@query(
    "jl_prefilter_knn",
    oracle=f"""
    WITH signs AS (
      SELECT i, j,
             CASE WHEN substr(md5(i || '_' || j), 1, 1)
                  IN ('0','2','4','6','8','a','c','e')
                  THEN 1.0 ELSE -1.0 END AS s
      FROM range({_JL_OUT}) t(i), range({_JL_IN}) u(j)
    ), proj AS (
      SELECT e.vec_id, list(dim ORDER BY i) AS jl
      FROM (
        SELECT e2.vec_id, s.i,
               sum(CAST(e2.embedding[s.j + 1] AS DOUBLE) * s.s) / 4 AS dim
        FROM embeddings e2, signs s
        GROUP BY e2.vec_id, s.i
      ) AS e
      GROUP BY e.vec_id
    ), coarse AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             round(sqrt(list_sum(list_transform(list_zip(p.jl, c.jl),
                  z -> (z[1] - z[2]) * (z[1] - z[2])))), 6) AS d16
      FROM proj p JOIN proj c ON p.vec_id < 3 AND c.vec_id <> p.vec_id
    ), cands AS (
      SELECT probe_id, cand_id FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY d16, cand_id) AS rn
        FROM coarse
      ) WHERE rn <= 50
    ), rescored AS (
      SELECT cands.probe_id, cands.cand_id,
             round(sqrt(list_sum(list_transform(
               list_zip(CAST(ep.embedding AS DOUBLE[]), CAST(ec.embedding AS DOUBLE[])),
               z -> (z[1] - z[2]) * (z[1] - z[2])))), 4) AS dist
      FROM cands
      JOIN embeddings ep ON ep.vec_id = cands.probe_id
      JOIN embeddings ec ON ec.vec_id = cands.cand_id
    )
    SELECT probe_id, cand_id AS neighbor_id, dist,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY dist, cand_id) AS rank
      FROM rescored
    ) WHERE rank <= 10
    """,
    operators=("K8", "K6", "E4", "C10"),
)
def jl_prefilter_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    proj = jl_project(emb).select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"), "jl"
    )
    probes = proj.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("jl").alias("pjl"),
    )
    l2 = (
        lambda x, y: F.sqrt(
            F.expr(
                f"aggregate(zip_with({x}, {y}, (p, q) -> (p - q) * (p - q)),"
                " 0D, (acc, z) -> acc + z)"
            )
        )
    )
    # d16 rounds to 6 BEFORE the rank cut on both sides: DuckDB's grouped
    # sum and Spark's sequential fold can differ in the last ulp, and an
    # unrounded near-tie at the C=50 boundary would flip the candidate
    # set (round-4 advisor finding) — same rounded-score discipline as
    # exact_knn.
    coarse = (
        proj.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("cand_id"),
            F.round(l2("jl", "pjl"), 6).alias("d16"),
            "v",
            "pv",
        )
    )
    w = Window.partitionBy("probe_id").orderBy("d16", "cand_id")
    cands = coarse.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 50)
    rescored = cands.select(
        "probe_id",
        F.col("cand_id").alias("neighbor_id"),
        F.round(l2("v", "pv"), 4).alias("dist"),
    )
    wr = Window.partitionBy("probe_id").orderBy("dist", "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("probe_id", "neighbor_id", "dist", "rank")
    )


# ---------------------------------------------------------------------------
# K6/K8 binary-quantization tier: sign-bit codes + Hamming-distance ANN.
# The most aggressive compression rung under PQ: 1 bit per dimension —
# dim-64 vectors become TWO 32-bit halves in bigints (16 bytes vs 256
# for float32), and the candidate scan is xor + bit_count per half,
# which whole-stage codegen compiles to SIMD-friendly popcount loops.
# On the unit sphere sign agreement tracks cosine (the classic SimHash
# bound: P[sign match] = 1 - theta/pi per random direction; here the
# directions are the coordinate axes), so Hamming top-C is a usable
# candidate generator with exact rescore on top — the bit-level analogue
# of the PQ-ADC recipe. Fully deterministic (no training at all), so
# codes, candidate sets, and results all carry value oracles.
# At 100 TB: the code table is ~1/16th the corpus bytes; scan cost is
# two xors + two popcounts per row; rescore touches C rows per probe.
# ---------------------------------------------------------------------------
_BQ_CAND_C = 50


def binary_quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append sign-bit halves (h0, h1): bit j of h0 is 1 iff v[j] > 0
    for j in 0..31, h1 covers 32..63. Two 32-bit halves sidestep the
    bigint sign bit, so Spark and DuckDB agree without unsigned types."""
    v = F.col(vec_col).cast("array<double>")

    def half(lo: int) -> F.Column:
        # 2^i instead of a shift: F.shiftleft needs a literal amount, and
        # pow(2, i) is exact in double for i <= 31, matching the SQL
        # twin's (1::BIGINT << (i-1)) bit for bit.
        bits = F.transform(
            F.slice(v, lo + 1, 32),
            lambda x, i: F.when(
                x > 0.0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc + b)

    return df.withColumn("h0", half(0)).withColumn("h1", half(32))


_BQ_CODES_SQL = """bq AS (
      SELECT vec_id,
             list_sum(list_transform(CAST(embedding AS DOUBLE[])[1:32],
               (x, i) -> CASE WHEN x > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS h0,
             list_sum(list_transform(CAST(embedding AS DOUBLE[])[33:64],
               (x, i) -> CASE WHEN x > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS h1
      FROM embeddings
    )"""


@query(
    "binary_quant_code_stats",
    # codes are fully deterministic => exact per-vector oracle on a
    # bounded slice: the packed halves plus the popcount (bits set)
    oracle=f"""
    WITH {_BQ_CODES_SQL}
    SELECT vec_id, CAST(h0 AS BIGINT) AS h0, CAST(h1 AS BIGINT) AS h1,
           CAST(bit_count(CAST(h0 AS BIGINT)) + bit_count(CAST(h1 AS BIGINT)) AS BIGINT)
             AS n_positive_dims
    FROM bq WHERE vec_id < 100
    """,
    operators=("K6", "H4", "B1"),
)
def binary_quant_code_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return binary_quantize(emb).select(
        "vec_id",
        "h0",
        "h1",
        (F.expr("bit_count(h0)") + F.expr("bit_count(h1)"))
        .cast("bigint")
        .alias("n_positive_dims"),
    )


@query(
    "binary_quant_hamming_knn",
    oracle=f"""
    WITH {_BQ_CODES_SQL},
    pb AS (SELECT vec_id AS probe_id, h0 AS p0, h1 AS p1 FROM bq WHERE vec_id < 3),
    ham AS (
      SELECT pb.probe_id, c.vec_id,
             CAST(bit_count(xor(CAST(c.h0 AS BIGINT), CAST(pb.p0 AS BIGINT)))
                + bit_count(xor(CAST(c.h1 AS BIGINT), CAST(pb.p1 AS BIGINT))) AS BIGINT)
               AS hamming
      FROM bq c, pb WHERE c.vec_id <> pb.probe_id
    ),
    cand AS (
      SELECT probe_id, vec_id, hamming FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY hamming, vec_id) AS rn
        FROM ham
      ) WHERE rn <= {_BQ_CAND_C}
    )
    SELECT probe_id, neighbor_id, hamming, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT c.probe_id, c.vec_id AS neighbor_id, c.hamming,
             round(list_cosine_similarity(CAST(ec.embedding AS DOUBLE[]),
                                          CAST(ep.embedding AS DOUBLE[])), 6) AS score,
             row_number() OVER (PARTITION BY c.probe_id
                                ORDER BY round(list_cosine_similarity(
                                  CAST(ec.embedding AS DOUBLE[]),
                                  CAST(ep.embedding AS DOUBLE[])), 6) DESC,
                                c.vec_id) AS rank
      FROM cand c
      JOIN embeddings ec ON ec.vec_id = c.vec_id
      JOIN embeddings ep ON ep.vec_id = c.probe_id
    ) WHERE rank <= 10
    """,
    operators=("K8", "K6", "H4", "E4", "C10"),
)
def binary_quant_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-candidate ANN over sign-bit codes + exact cosine rescore,
    top-10 for 3 probes. The Hamming scan touches only (vec_id, h0, h1)
    — a 24-byte projection of the corpus — and the float vectors are
    read back for just C candidates per probe."""
    emb = load(spark, sf_dir, "embeddings")
    codes = binary_quantize(emb).select("vec_id", "h0", "h1")
    pb = binary_quantize(emb.filter(F.col("vec_id") < 3)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("h0").alias("p0"),
        F.col("h1").alias("p1"),
    )
    ham = (
        codes.crossJoin(F.broadcast(pb))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            (
                F.expr("bit_count(h0 ^ p0)") + F.expr("bit_count(h1 ^ p1)")
            )
            .cast("bigint")
            .alias("hamming"),
        )
    )
    wc = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
    cand = (
        ham.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= _BQ_CAND_C)
        .select("probe_id", "vec_id", "hamming")
    )
    pv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    rescored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "hamming",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K8 at fleet scale: SHARDED search with a lossless top-k merge. A
# 100 TB corpus is never one index tree — vectors split into S shards
# (here a deterministic md5 split so the oracle can replay it), every
# shard serves its LOCAL top-k independently (its own executors, its
# own cell-pruned scan), and the coordinator merges S bounded lists
# with one window over S*k rows per probe. The merge is LOSSLESS for
# exact scoring: every global top-k member ranks <= k inside its own
# shard, so the union of per-shard top-k lists always contains the
# global answer — the invariant the value oracle pins by ranking over
# the UNSHARDED corpus. Cross-shard tie order is deterministic
# (rounded score DESC, neighbor_id ASC on both levels). This is the
# scatter-gather topology every distributed vector store runs; the
# shard column in the output shows which shard produced each winner.
# ---------------------------------------------------------------------------
@query(
    "sharded_knn_merge",
    oracle="""
    WITH p AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS probe_vec
      FROM embeddings WHERE vec_id < 3
    ), scored AS (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          p.probe_vec), 6) AS score,
             CASE WHEN substring(md5(CAST(e.vec_id AS VARCHAR)), 1, 1) < '8'
                  THEN 0 ELSE 1 END AS shard
      FROM embeddings e, p WHERE e.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, CAST(shard AS INTEGER) AS shard,
           rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "E4", "G1", "H4", "F2", "C2"),
)
def sharded_knn_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    shard = F.when(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1) < "8", 0
    ).otherwise(1)
    probes = emb.filter(F.col("vec_id") < 3)
    parts = []
    for s in (0, 1):
        local = exact_knn(
            emb.withColumn("shard", shard).filter(F.col("shard") == s),
            probes,
            k=10,
        )
        parts.append(
            local.select(
                "probe_id",
                "neighbor_id",
                "score",
                F.lit(s).cast("int").alias("shard"),
            )
        )
    merged = parts[0].unionByName(parts[1])
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("probe_id", "neighbor_id", "score", "shard", "rank")
    )
