"""Two-level hierarchical IVF (IMI-style coarse quantization; K9 deep
form). Level 1 is the persisted 8-cell Lloyd's layout
(operators.pipeline); level 2 trains k2=4 fine centroids WITHIN each
parent cell — 32 fine cells total, so a 2x2 probe (top-2 parents, top-2
children each) scans ~4/32 of the corpus instead of 2/8.

Everything stays md5-deterministic with the engine's rounding
discipline, so the fine layout, probe cells, and search results all
carry FULL value oracles: the per-parent training chain unrolls into
long-form CTEs grouped by parent — the same one-chain-covers-all-groups
trick the PQ oracle uses for subspaces.

Scale shape: fine training is ROUNDS2 passes of (zero-shuffle literal
assignment + one (parent, child, dim) groupBy whose output is k1*k2*dim
rows); per-round driver state is k1*k2*dim doubles. The fine assignment
expression selects each row's parent matrix from ONE 3-deep nested
literal (element_at by parent id) — no join, no shuffle, whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.pipeline import (
    _IVF_ROUNDS,
    _KM_CTES,
    _KM_D2,
    ensure_ivf_index,
    index_centroids,
    ivf_vectors_frame,
)
from cloudvectordb_spark.registry import query

_K2 = 4
_IVF2_ROUNDS = 2
_FIT_CAP = 100_000

# centroids-by-parent cached per (immutable) level-1 index path in the
# unified cloudvectordb_spark.cache (plain floats — process-wide entry)

GroupCents = dict[int, list[tuple[int, list[float]]]]


def _fine_matrices(cents2: GroupCents, k1: int):
    """(3-deep matrix literal, 2-deep cid literal) indexed by parent id.
    Parents must be contiguous 0..k1-1 (asserted at train time); inner
    lists may be ragged when a fine cell dropped."""
    mats = [[c for _, c in cents2[p]] for p in range(k1)]
    cids = [[int(cid) for cid, _ in cents2[p]] for p in range(k1)]
    return F.lit(mats), F.lit(cids)


def assign_fine_cells_blas(
    df: DataFrame,
    cents2: GroupCents,
    k1: int,
    parent_col: str = "centroid_id",
    vec_col: str = "embedding",
    out: str = "child_id",
) -> DataFrame:
    """Arrow-batched BLAS fine assignment (round 8): at probe scale the
    expression path below carries a k1*k2*dim literal tree (320k
    literals at 100x50x64) and interprets per-row array lambdas — the
    10M-doc IMI probe measured it eating most of the two-level build's
    theoretical n*(k1+k2) win. This kernel groups each Arrow batch by
    parent and runs one ||x||^2+||c||^2-2xC' matmul per parent group —
    same rounding (floor(|d2|*1e6+0.5)/1e6 == round(d2,6) for d2 >= 0
    up to matmul-summation ulps, the assign_cells_blas precedent) and
    same tie order (child ids ascending within a parent, np.argmin
    takes the first minimum), so layouts match the expression path —
    pytest-pinned on the fixture index."""
    import numpy as np
    from pyspark.sql import types as T

    mats = {
        p: (
            np.array([cid for cid, _ in cents2[p]], dtype=np.int64),
            np.array([c for _, c in cents2[p]], dtype=np.float64),
        )
        for p in range(k1)
    }
    for p, (cids_p, _) in mats.items():
        assert (np.diff(cids_p) > 0).all(), "child ids must ascend"

    def run(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            parents = pdf[parent_col].to_numpy()
            child = np.empty(len(pdf), dtype=np.int64)
            for p in np.unique(parents):
                idx = np.where(parents == p)[0]
                cids_p, cmat = mats[int(p)]
                xs = x[idx]
                d2 = (
                    (xs * xs).sum(axis=1)[:, None]
                    + (cmat * cmat).sum(axis=1)[None, :]
                    - 2.0 * (xs @ cmat.T)
                )
                d2 = np.floor(np.abs(d2) * 1e6 + 0.5) / 1e6
                child[idx] = cids_p[d2.argmin(axis=1)]
            pdf = pdf.copy()
            pdf[out] = child.astype(np.int32)
            yield pdf

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.IntegerType())]
    )
    return df.mapInPandas(run, schema=schema)


def assign_fine_cells(
    df: DataFrame,
    cents2: GroupCents,
    k1: int,
    parent_col: str = "centroid_id",
    vec_col: str = "embedding",
    out: str = "child_id",
) -> DataFrame:
    """Per-row nearest FINE centroid within the row's parent cell —
    round(d2, 6) argmin, ties to the smaller child id (the oracle's
    total order), via one 3-deep literal lookup. Dispatches to the
    BLAS kernel above when the literal tree would be large (total fine
    cells x dim past the kmeans_det threshold); every registered query
    (k1=8, k2<=4) stays on the JVM expression path."""
    from cloudvectordb_spark.operators.kmeans_det import (
        _BLAS_CELLS_THRESHOLD,
    )

    n_cells = sum(len(v) for v in cents2.values())
    dim = len(next(iter(cents2.values()))[0][1])
    if n_cells * dim > _BLAS_CELLS_THRESHOLD:
        return assign_fine_cells_blas(df, cents2, k1, parent_col, vec_col, out)
    mats, cids = _fine_matrices(cents2, k1)
    v = F.col(vec_col).cast("array<double>")
    pmat = F.element_at(mats, F.col(parent_col) + 1)
    pcid = F.element_at(cids, F.col(parent_col) + 1)
    structs = F.transform(
        pmat,
        lambda c, i: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                ),
                6,
            ).alias("d"),
            F.element_at(pcid, i + F.lit(1)).alias("cid"),
        ),
    )
    return df.withColumn(out, F.array_min(structs)["cid"])


def train_fine_centroids(
    spark: SparkSession, sf_dir: str, k2: int = _K2, rounds: int = _IVF2_ROUNDS
) -> tuple[str, GroupCents, int]:
    """(level1_path, {parent: [(child_id, centroid)]}, k1). md5-seeded
    per-parent Lloyd's on the pinned fit sample; cached per index path."""
    from cloudvectordb_spark.cache import artifact_cache

    path = ensure_ivf_index(spark, sf_dir)
    return artifact_cache(
        ("ivf2_fine", path, k2, rounds),
        lambda: _train_fine_centroids_impl(spark, path, k2, rounds),
    )


def _train_fine_centroids_impl(
    spark: SparkSession, path: str, k2: int, rounds: int
) -> tuple[str, GroupCents, int]:
    k1 = len(index_centroids(spark, path))
    vectors = ivf_vectors_frame(spark, path).filter(
        F.col("vec_id") < _FIT_CAP
    )
    assert {
        r.centroid_id for r in vectors.select("centroid_id").distinct().collect()
    } == set(range(k1)), "level-1 cells must be contiguous 0..k1-1"

    w = Window.partitionBy("centroid_id").orderBy("h", "vec_id")
    seeds = (
        vectors.withColumn(
            "h",
            F.md5(
                F.concat(
                    F.lit("ivf2|"),
                    F.col("centroid_id").cast("string"),
                    F.lit("|"),
                    F.col("vec_id").cast("string"),
                )
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k2)
        .select("centroid_id", "rn", "embedding")
        .collect()  # bounded: k1 * k2 rows
    )
    cents2: GroupCents = {}
    for r in sorted(seeds, key=lambda r: (r.centroid_id, r.rn)):
        cents2.setdefault(r.centroid_id, []).append(
            (r.rn - 1, [float(x) for x in r.embedding])
        )

    for _ in range(rounds):
        asg = assign_fine_cells(vectors, cents2, k1)
        upd = (
            asg.select(
                "centroid_id",
                "child_id",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "dim", "x"
                ),
            )
            .groupBy("centroid_id", "child_id", "dim")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()  # bounded: k1 * k2 * dim rows
        )
        nxt: dict = {}
        for r in upd:
            nxt.setdefault(r.centroid_id, {}).setdefault(r.child_id, {})[r.dim] = r.m
        cents2 = {
            p: [
                (cid, [dims[i] for i in sorted(dims)])
                for cid, dims in sorted(children.items())
            ]
            for p, children in sorted(nxt.items())
        }
    return (path, cents2, k1)


def _fine_cells_py(vec, cents2_for_parent, nprobe: int = 2) -> list[int]:
    """Driver-side replica of assign_fine_cells' total order for probe
    vectors (bounded nprobe * k2 work)."""
    import math

    import numpy as np

    v = np.asarray(vec, dtype=np.float64)
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    scored = sorted(
        (r6(float(np.add.reduce((v - np.asarray(c, dtype=np.float64)) ** 2))), cid)
        for cid, c in cents2_for_parent
    )
    return [cid for _, cid in scored[:nprobe]]


# The per-parent fine-training chain as long-form CTEs off km_assign.
def _ivf2_cte_sql(k2: int = _K2, rounds: int = _IVF2_ROUNDS, dim: int = 64) -> str:
    d2 = (
        "round(list_sum(list_transform(list_zip(e.v, c.v),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    parts = [
        f"""f_fit AS (
      SELECT vec_id, v, cid AS parent FROM km_assign WHERE vec_id < {_FIT_CAP}
    )""",
        f"""f_c0 AS (
      SELECT parent, CAST(rn - 1 AS INTEGER) AS cid, v FROM (
        SELECT parent, v, row_number() OVER (PARTITION BY parent
          ORDER BY md5('ivf2|' || parent || '|' || CAST(vec_id AS VARCHAR)),
                   vec_id) AS rn
        FROM f_fit
      ) WHERE rn <= {k2}
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""f_a{r} AS (
      SELECT vec_id, parent, v, cid FROM (
        SELECT e.vec_id, e.parent, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c.cid) AS rn
        FROM f_fit e JOIN f_c{r - 1} c ON c.parent = e.parent
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""f_c{r} AS (
      SELECT parent, cid, list(m ORDER BY i) AS v FROM (
        SELECT a.parent, a.cid, t.i, round(avg(a.v[t.i]), 6) AS m
        FROM f_a{r} a, range(1, {dim + 1}) t(i)
        GROUP BY a.parent, a.cid, t.i
      ) GROUP BY parent, cid
    )"""
        )
    parts.append(
        f"""f_assign AS (
      SELECT vec_id, parent, v, child FROM (
        SELECT e.vec_id, e.cid AS parent, e.v, c.cid AS child,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2}, c.cid) AS rn
        FROM km_assign e JOIN f_c{rounds} c ON c.parent = e.cid
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)


_IVF2_CTES = _ivf2_cte_sql()


@query(
    "ivf2_cell_counts",
    # exact (parent, child) histogram — deterministic end to end
    oracle=f"""
    WITH {_KM_CTES},
    {_IVF2_CTES}
    SELECT CAST(parent AS INTEGER) AS parent_id,
           CAST(child AS INTEGER) AS child_id,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM f_assign GROUP BY parent, child
    """,
    operators=("K9", "D1", "L4"),
)
def ivf2_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    path, cents2, k1 = train_fine_centroids(spark, sf_dir)
    vectors = ivf_vectors_frame(spark, path)
    asg = assign_fine_cells(vectors, cents2, k1)
    return asg.groupBy(
        F.col("centroid_id").cast("int").alias("parent_id"),
        F.col("child_id").cast("int").alias("child_id"),
    ).agg(F.count("*").cast("bigint").alias("n_vectors"))


@query(
    "ivf2_topk_search",
    oracle=f"""
    WITH {_KM_CTES},
    {_IVF2_CTES},
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    p_parents AS (
      SELECT probe_id, cid AS parent FROM (
        SELECT e.vec_id AS probe_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    p_cells AS (
      SELECT DISTINCT parent, child FROM (
        SELECT pp.probe_id, pp.parent, c.cid AS child,
               row_number() OVER (PARTITION BY pp.probe_id, pp.parent
                 ORDER BY round(list_sum(list_transform(list_zip(p.pv, c.v),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), 6), c.cid) AS rn
        FROM p_parents pp
        JOIN p ON p.probe_id = pp.probe_id
        JOIN f_c{_IVF2_ROUNDS} c ON c.parent = pp.parent
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM f_assign a
      JOIN p_cells pc ON pc.parent = a.parent AND pc.child = a.child
      CROSS JOIN p
      WHERE a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K9", "K8", "E4"),
)
def ivf2_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical probe: top-2 parents, top-2 fine cells within each —
    4 of 32 cells scanned — then BLAS exact top-10 over the pruned set.
    One probe-collect job; cell selection is driver-side bounded work."""
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py
    from cloudvectordb_spark.operators.vector_ops import exact_knn_fast

    path, cents2, k1 = train_fine_centroids(spark, sf_dir)
    cents1 = index_centroids(spark, path)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    cells = set()
    for r in probe_rows:
        for parent in nearest_cells_py(r.embedding, cents1, 2):
            for child in _fine_cells_py(r.embedding, cents2[parent], 2):
                cells.add((parent, child))
    probes_local = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="vec_id long, embedding array<float>",
    )
    vectors = ivf_vectors_frame(spark, path)
    asg = assign_fine_cells(vectors, cents2, k1)
    cond = F.lit(False)
    for parent, child in sorted(cells):
        cond = cond | (
            (F.col("centroid_id") == parent) & (F.col("child_id") == child)
        )
    pruned = asg.filter(cond).select("vec_id", "embedding")
    return exact_knn_fast(pruned, probes_local, k=10)


# ---------------------------------------------------------------------------
# K8/B1 composition: metadata-filtered ANN through the IVF layout — the
# two pruning mechanisms STACK: the literal cell filter prunes parquet
# partitions, the label predicate pushes into the surviving cells' scans
# (PushedFilters), and only then does vector math run. This is the
# standard "filtered vector search" (pre-filter strategy) a vector DB
# user expects; the exact form without the index is filtered_knn_search.
# ---------------------------------------------------------------------------
@query(
    "filtered_ivf_knn",
    oracle=f"""
    WITH {_KM_CTES},
    lab AS (SELECT vec_id, label FROM embeddings),
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id, lab.label,
             round(list_cosine_similarity(a.v, p.pv), 6) AS score
      FROM km_assign a
      JOIN lab ON lab.vec_id = a.vec_id
      CROSS JOIN p
      WHERE a.cid IN (SELECT cid FROM probe_cells)
        AND lab.label IN (1, 3)
        AND a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, label, score, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    operators=("K8", "K9", "B1", "B4", "E4"),
)
def filtered_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 among label-{1,3} vectors inside the probes' top-2 cells:
    partition pruning (literal isin on centroid_id) + predicate pushdown
    (label isin) compose before any cosine is computed."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py

    path = ensure_ivf_index(spark, sf_dir)
    cents = index_centroids(spark, path)
    probe_rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 3)
        .select("vec_id", "embedding")
        .collect()
    )
    cell_ids = sorted(
        {c for r in probe_rows for c in nearest_cells_py(r.embedding, cents, 2)}
    )
    pv = spark.createDataFrame(
        [(r.vec_id, r.embedding) for r in probe_rows],
        schema="probe_id long, probe_vec array<float>",
    )
    vectors = ivf_vectors_frame(spark, path)
    scored = (
        vectors.filter(
            F.col("centroid_id").isin(cell_ids) & F.col("label").isin(1, 3)
        )
        .crossJoin(F.broadcast(pv))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# K12 capstone: one verified dashboard row per ANN tier — mean recall@10
# vs the exact baseline for the IVF cell probe, the multi-probe LSH
# bucket join, and the sign-bit Hamming candidates. Each tier uses ITS
# OWN ranking metric's exact baseline (cosine for IVF/binary, L2 for
# LSH — identical rankings on the unit sphere, but rounded tie order
# differs, so the baselines stay separate). All three tiers are
# deterministic, so the whole matrix carries a value oracle.
# ---------------------------------------------------------------------------
def _tier_recall_sql() -> str:
    from cloudvectordb_spark.operators.pipeline import _LSH_CTES
    from cloudvectordb_spark.operators.vector_ops import _BQ_CODES_SQL

    cos = (
        "round(list_cosine_similarity(CAST({a}.embedding AS DOUBLE[]),"
        " CAST({b}.embedding AS DOUBLE[])), 6)"
    )
    return f"""
    WITH {_KM_CTES},
    {_LSH_CTES},
    {_BQ_CODES_SQL},
    p AS (SELECT vec_id AS probe_id, v AS pv FROM km_emb WHERE vec_id < 3),
    exact_cos AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(e.v, p.pv), 6) DESC,
                          e.vec_id) AS rn
        FROM km_emb e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rn <= 10
    ),
    exact_l2 AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.probe_id
                 -- rank by round(sqrt(d2), 6) to match the Spark side's
                 -- rounded DISTANCE: d and d2 order identically but
                 -- their rounded tie-sets differ, so the vec_id
                 -- tiebreak could flip top-10 boundary membership
                 ORDER BY round(sqrt(list_sum(list_transform(list_zip(e.v, p.pv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])))), 6),
                          e.vec_id) AS rn
        FROM km_emb e, p WHERE e.vec_id <> p.probe_id
      ) WHERE rn <= 10
    ),
    ivf_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    ivf10 AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.probe_id, a.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY round(list_cosine_similarity(a.v, p.pv), 6) DESC,
                          a.vec_id) AS rn
        FROM km_assign a, p
        WHERE a.cid IN (SELECT cid FROM ivf_cells) AND a.vec_id <> p.probe_id
      ) WHERE rn <= 10
    ),
    lsh_pb AS (
      SELECT b.vec_id AS probe_id, b.table_id, b.bucket + o.o AS bucket
      FROM lsh_b b, (SELECT unnest(generate_series(-1, 1)) AS o) o
      WHERE b.vec_id < 3
    ),
    lsh10 AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT c2.probe_id, c2.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY c2.probe_id
                 -- round(sqrt(d2), 6): same rounded metric as Spark's
                 -- lsh_multiprobe_knn (see exact_l2 note above)
                 ORDER BY round(sqrt(list_sum(list_transform(
                     list_zip(ec.v, p.pv),
                     z -> (z[1] - z[2]) * (z[1] - z[2])))), 6), c2.vec_id) AS rn
        FROM (SELECT DISTINCT pb.probe_id, c.vec_id
              FROM lsh_b c JOIN lsh_pb pb
                ON c.table_id = pb.table_id AND c.bucket = pb.bucket
              WHERE c.vec_id <> pb.probe_id) c2
        JOIN km_emb ec ON ec.vec_id = c2.vec_id
        JOIN p ON p.probe_id = c2.probe_id
      ) WHERE rn <= 10
    ),
    bq_pb AS (SELECT vec_id AS probe_id, h0 AS p0, h1 AS p1 FROM bq WHERE vec_id < 3),
    bq_cand AS (
      SELECT probe_id, vec_id FROM (
        SELECT pb.probe_id, c.vec_id,
               row_number() OVER (PARTITION BY pb.probe_id ORDER BY
                 bit_count(xor(CAST(c.h0 AS BIGINT), CAST(pb.p0 AS BIGINT)))
                 + bit_count(xor(CAST(c.h1 AS BIGINT), CAST(pb.p1 AS BIGINT))),
                 c.vec_id) AS rn
        FROM bq c, bq_pb pb WHERE c.vec_id <> pb.probe_id
      ) WHERE rn <= 50
    ),
    bq10 AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT bc.probe_id, bc.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY bc.probe_id
                 ORDER BY round(list_cosine_similarity(ec.v, p.pv), 6) DESC,
                          bc.vec_id) AS rn
        FROM bq_cand bc
        JOIN km_emb ec ON ec.vec_id = bc.vec_id
        JOIN p ON p.probe_id = bc.probe_id
      ) WHERE rn <= 10
    ),
    tiers AS (
      SELECT 'ivf' AS tier, e.probe_id,
             count(t.neighbor_id) / 10.0 AS recall
      FROM exact_cos e LEFT JOIN ivf10 t
        ON t.probe_id = e.probe_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.probe_id
      UNION ALL
      SELECT 'lsh_multiprobe', e.probe_id, count(t.neighbor_id) / 10.0
      FROM exact_l2 e LEFT JOIN lsh10 t
        ON t.probe_id = e.probe_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.probe_id
      UNION ALL
      SELECT 'binary_hamming', e.probe_id, count(t.neighbor_id) / 10.0
      FROM exact_cos e LEFT JOIN bq10 t
        ON t.probe_id = e.probe_id AND t.neighbor_id = e.neighbor_id
      GROUP BY e.probe_id
    )
    SELECT tier, round(avg(recall), 6) AS mean_recall_at_10
    FROM tiers GROUP BY tier
    """


@query(
    "ann_tier_recall_summary",
    oracle=_tier_recall_sql(),
    operators=("K12", "K8", "K9", "K10", "K6"),
)
def ann_tier_recall_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean recall@10 per ANN tier (ivf, lsh_multiprobe, binary_hamming)
    vs the matching exact baseline — the cross-tier quality dashboard,
    composed from the already-verified per-tier search queries."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.pipeline import (
        ivf_topk_search,
        lsh_multiprobe_knn,
    )
    from cloudvectordb_spark.operators.vector_ops import (
        binary_quant_hamming_knn,
        exact_knn,
    )

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    # exact_cos is ≤ 3·10 rows and is the baseline for TWO tiers (ivf +
    # binary) — gathered once and re-entered as a local relation so the
    # final plan carries one exact cosine corpus pass, not two
    # (round 15; same integers, driver round-trip is exact). Budget-
    # enforced (round 16): ≤ |probes|·k by the top-k construction.
    from cloudvectordb_spark.gather import bounded_gather

    exact_cos_rows = bounded_gather(
        exact_knn(emb, probes, k=10).select("probe_id", "neighbor_id"),
        "ann_tier_recall_summary exact baseline",
    )
    exact_cos = spark.createDataFrame(
        [(int(r.probe_id), int(r.neighbor_id)) for r in exact_cos_rows],
        schema="probe_id long, neighbor_id long",
    )

    pv = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    scored = (
        emb.crossJoin(F.broadcast(pv))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.l2_distance("embedding", "probe_vec"), 6).alias("d"),
        )
    )
    wl = Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    exact_l2 = (
        scored.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id")
    )

    def tier_recall(name: str, approx: DataFrame, exact: DataFrame) -> DataFrame:
        a = approx.select("probe_id", F.col("neighbor_id").alias("a_n"))
        per_probe = (
            exact.join(
                a,
                (exact["probe_id"] == a["probe_id"])
                & (exact["neighbor_id"] == a["a_n"]),
                "left",
            )
            .groupBy(exact["probe_id"])
            .agg((F.count("a_n") / 10.0).alias("recall"))
        )
        return per_probe.agg(
            F.lit(name).alias("tier"),
            F.round(F.avg("recall"), 6).alias("mean_recall_at_10"),
        )

    out = tier_recall("ivf", ivf_topk_search(spark, sf_dir), exact_cos)
    out = out.unionByName(
        tier_recall("lsh_multiprobe", lsh_multiprobe_knn(spark, sf_dir), exact_l2)
    )
    out = out.unionByName(
        tier_recall(
            "binary_hamming", binary_quant_hamming_knn(spark, sf_dir), exact_cos
        )
    )
    return out
