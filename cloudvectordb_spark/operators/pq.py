"""Product quantization (K9-family compression path; reference S4
"building the vectordb", /root/reference/README.md:2).

The memory-bound half of a vector index at 100 TB: vectors compressed
M-subspace x K-centroid codes (here 8 x 16 over dim-64 => 8 bytes per
vector, 32x smaller than float32), searched with an ADC (asymmetric
distance computation) scan against per-probe lookup tables, then
exact-rescored on a small candidate buffer — the FAISS IVF-PQ recipe
re-expressed in Spark terms:

- codebook TRAINING is sample-bounded (like any ANN library: train on a
  capped sample regardless of corpus size) — seeded Lloyd iterations on
  the driver, broadcast to workers;
- ENCODING is distributed (mapInPandas, Arrow batches, one argmin per
  subspace per vector — pure numpy);
- the ADC SCAN is distributed (each worker sums table lookups over its
  partition's codes; probes' tables ride along as a broadcast closure);
- RESCORE joins the top-C ADC candidates back to the float vectors and
  re-ranks with exact cosine — candidates shrink per-partition BEFORE
  the join, so the expensive exact math touches C rows per probe, not
  the corpus.

Vectors are unit-normalized before quantization so ADC's L2^2 ranks
identically to cosine (||a-b||^2 = 2 - 2*cos on the unit sphere).
Seeded + sample-order pinned => deterministic, but KMeans itself has no
SQL twin: the query is rows-only; fidelity is pytest-gated by recall@10
vs the exact-kNN oracle path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query

_M = 8          # subspaces
_K = 16         # centroids per subspace (4-bit codes)
_SAMPLE_CAP = 4096
_SEED = 42
_ITERS = 15
_RESCORE_C = 100


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def train_pq_codebooks_from_df(
    emb: DataFrame,
    m: int = _M,
    k: int = _K,
    sample_cap: int = _SAMPLE_CAP,
    seed: int = _SEED,
    iters: int = _ITERS,
) -> np.ndarray:
    """(m, k, dim/m) codebooks from seeded Lloyd on a bounded, ordered
    sample. Sample order is pinned (ORDER BY vec_id) so retraining is
    bit-reproducible run to run — the determinism discipline every
    seeded component in this engine follows."""
    rows = (
        emb.filter(F.col("vec_id") < sample_cap)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    x = _normalize_rows(np.array([r["embedding"] for r in rows], dtype=np.float64))
    dim = x.shape[1]
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub))
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[s] = cent
    return books


def train_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = _M,
    k: int = _K,
    sample_cap: int = _SAMPLE_CAP,
    seed: int = _SEED,
    iters: int = _ITERS,
) -> np.ndarray:
    """Fixture-table convenience wrapper over train_pq_codebooks_from_df."""
    return train_pq_codebooks_from_df(
        load(spark, sf_dir, "embeddings"), m, k, sample_cap, seed, iters
    )


def pq_encode(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """Distributed encode: (vec_id, code array<int>) — argmin per
    subspace per vector, one Arrow batch at a time. The codebook is tiny
    (m*k*dsub doubles) and ships inside the closure."""
    m, _, dsub = books.shape

    def run(batches):
        for pdf in batches:
            x = _normalize_rows(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "code": list(codes)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id long, code array<int>"
    )


def adc_scores(encoded: DataFrame, probes: list[tuple[int, np.ndarray]], books: np.ndarray) -> DataFrame:
    """ADC scan: for each probe, a (m, k) table of squared sub-distances
    is precomputed once; each corpus vector's approximate distance is m
    table lookups summed. Emits (probe_id, vec_id, adc_dist)."""
    m, k, dsub = books.shape
    tables = []
    for pid, pv in probes:
        t = np.empty((m, k))
        for s in range(m):
            t[s] = (((books[s] - pv[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(axis=1))
        tables.append((pid, t))

    def run(batches):
        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy())  # (n, m)
            ids = pdf["vec_id"].to_numpy()
            out_pid, out_vid, out_d = [], [], []
            for pid, t in tables:
                d = t[np.arange(m)[None, :], codes].sum(axis=1)  # (n,)
                out_pid.append(np.full(len(ids), pid, dtype=np.int64))
                out_vid.append(ids)
                out_d.append(d)
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_pid),
                    "vec_id": np.concatenate(out_vid),
                    "adc_dist": np.round(np.concatenate(out_d), 9),
                }
            )

    return encoded.mapInPandas(run, schema="probe_id long, vec_id long, adc_dist double")


_PQ_BOOK_CACHE: dict = {}  # in-process: tag -> codebooks ndarray


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray]:
    """(encoded codes DataFrame, codebooks) for ``sf_dir``, building each
    at most once per fixture version — codebook training and corpus
    encoding are INDEX-BUILD work (the S4 bulk phase), so repeat searches
    read the persisted code parquet instead of re-running Lloyd + the
    encode scan. Same mtime-keyed atomic-rename publish as the IVF index."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{_M}|{_K}|{_SEED}|{_ITERS}".encode()
    ).hexdigest()[:10]
    tag = f"{key}_{int(os.path.getmtime(src))}"
    if tag not in _PQ_BOOK_CACHE:
        _PQ_BOOK_CACHE[tag] = train_pq_codebooks(spark, sf_dir)
    books = _PQ_BOOK_CACHE[tag]
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_pq", tag)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        build_dir = f"{path}.build{os.getpid()}"
        pq_encode(load(spark, sf_dir, "embeddings"), books).write.mode(
            "overwrite"
        ).parquet(build_dir)
        try:
            os.rename(build_dir, path)
        except OSError:  # concurrent publisher won — use theirs
            shutil.rmtree(build_dir, ignore_errors=True)
    return spark.read.parquet(path), books


@query(
    "pq_topk_search",
    oracle=None,  # seeded KMeans codebooks aren't SQL-replayable; recall pytest-gated
    operators=("K9", "K8", "K6", "L2", "L3", "E4"),
    bench=True,
)
def pq_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC candidate generation + exact cosine rescore, top-10 for 3
    probes. Output matches the exact-kNN shape (probe_id, neighbor_id,
    score, rank) so recall is directly measurable against it."""
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    encoded, books = ensure_pq_index(spark, sf_dir)
    probe_rows = (
        emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    )
    probes = [
        (r["vec_id"], _normalize_rows(np.array([r["embedding"]], dtype=np.float64))[0])
        for r in probe_rows
    ]

    scores = adc_scores(encoded, probes, books).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    wc = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    cands = (
        scores.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= _RESCORE_C)
        .select("probe_id", "vec_id")
    )
    pv = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    rescored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(pv), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


@query(
    "pq_code_histogram",
    # Code values derive from seeded KMeans, but the encoding invariants
    # are SQL-checkable per subspace: every corpus vector gets one code
    # and every code lies in [0, 16). The hash matches only if both hold
    # for all 8 subspaces.
    oracle=f"""
    SELECT CAST(t.i AS INTEGER) AS subspace,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_rows,
           true AS codes_in_range
    FROM (SELECT unnest(generate_series(0, {_M - 1})) AS i) t
    """,
    operators=("K9", "K12", "D1", "L5"),
)
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression diagnostics (K12-style quality gate for the compressed
    index): per-subspace row totals + code-range check. The per-codeword
    balance histogram stays available via the same posexplode groupBy."""
    encoded, _ = ensure_pq_index(spark, sf_dir)
    return (
        encoded.select(F.posexplode("code").alias("subspace", "centroid"))
        .groupBy("subspace")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (
                (F.min("centroid") >= 0) & (F.max("centroid") < _K)
            ).alias("codes_in_range"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the canonical composed index — coarse quantizer prunes cells
# (partition pruning on the parquet layout), PQ-ADC scans only the codes
# inside the selected cells, exact rescore fixes the top of the list.
# I/O per probe ≈ (nprobe/k) × corpus × 8 bytes of codes — the two
# approximations multiply: cell pruning cuts candidates, code compression
# cuts bytes per candidate. Build reuses the IVF assignments and the
# global PQ codebooks; codes persist partitioned by centroid_id so the
# probe-time isin filter is a genuine partition filter.
# ---------------------------------------------------------------------------
_IVFPQ_CACHE: dict = {}


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray, DataFrame]:
    """(codes-partitioned-by-cell DataFrame, codebooks, centroids)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        read_ivf_index,
    )

    vectors, centroids = read_ivf_index(spark, ensure_ivf_index(spark, sf_dir))
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = hashlib.md5(
        f"ivfpq|{os.path.abspath(sf_dir)}|{_M}|{_K}|{_SEED}".encode()
    ).hexdigest()[:10]
    tag = f"{key}_{int(os.path.getmtime(src))}"
    if tag not in _PQ_BOOK_CACHE:
        _PQ_BOOK_CACHE[tag] = train_pq_codebooks(spark, sf_dir)
    books = _PQ_BOOK_CACHE[tag]
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_ivfpq", tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_dir = f"{path}.build{os.getpid()}"
        codes = pq_encode(vectors, books).join(
            vectors.select("vec_id", "centroid_id"), "vec_id"
        )
        codes.write.mode("overwrite").partitionBy("centroid_id").parquet(build_dir)
        try:
            os.rename(build_dir, path)
        except OSError:  # concurrent publisher won
            shutil.rmtree(build_dir, ignore_errors=True)
    return spark.read.parquet(path), books, centroids


@query(
    "ivfpq_topk_search",
    oracle=None,  # seeded KMeans cells + codebooks; recall pytest-gated
    operators=("K9", "K8", "K6", "L2", "L3", "E4", "A3"),
)
def ivfpq_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-pruned ADC + exact rescore, top-10 for 3 probes; output shape
    matches exact kNN so recall is directly measurable."""
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    codes, books, centroids = ensure_ivfpq_index(spark, sf_dir)

    probe_rows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    probes = [
        (r["vec_id"], _normalize_rows(np.array([r["embedding"]], dtype=np.float64))[0])
        for r in probe_rows
    ]

    # coarse quantizer: nearest 2 cells per probe -> literal isin filter
    pv = spark.createDataFrame(
        [(pid, [float(x) for x in vec]) for pid, vec in probes],
        schema="probe_id long, pv array<double>",
    )
    pc = pv.crossJoin(F.broadcast(centroids)).withColumn(
        "cdist", V.l2_distance("pv", "centroid")
    )
    wp = Window.partitionBy("probe_id").orderBy("cdist", "centroid_id")
    cell_ids = sorted(
        {
            r.centroid_id
            for r in pc.withColumn("crank", F.row_number().over(wp))
            .filter(F.col("crank") <= 2)
            .select("centroid_id")
            .collect()
        }
    )

    pruned = codes.filter(F.col("centroid_id").isin(cell_ids)).select(
        "vec_id", "code"
    )
    scores = adc_scores(pruned, probes, books).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    wc = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    cands = (
        scores.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= _RESCORE_C)
        .select("probe_id", "vec_id")
    )
    pvec = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    rescored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(pvec), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )
