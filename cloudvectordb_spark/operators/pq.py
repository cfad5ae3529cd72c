"""Product quantization (K9-family compression path; reference S4
"building the vectordb", /root/reference/README.md:2).

The memory-bound half of a vector index at 100 TB: vectors compressed
M-subspace x K-centroid codes (here 8 x 16 over dim-64 => 8 bytes per
vector, 32x smaller than float32), searched with an ADC (asymmetric
distance computation) scan against per-probe lookup tables, then
exact-rescored on a small candidate buffer — the FAISS IVF-PQ recipe
re-expressed in Spark terms:

- codebook TRAINING is sample-bounded (like any ANN library: train on a
  capped sample regardless of corpus size) — DETERMINISTIC fixed-round
  Lloyd iterations on the driver (md5-seeded, rounded distances/means —
  the same engine-owned recipe as operators.kmeans_det), broadcast to
  workers;
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

Round-5 upgrade: the RNG-seeded trainer became md5-seeded fixed-round
Lloyd's with the same rounding discipline on every comparison key
(norms round to 7, normalized components to 9, distances and means to
6), so the ENTIRE path — codebooks, codes, ADC candidate sets, final
top-k — unrolls into DuckDB CTE stages and carries a FULL value-level
oracle (previously rows-only; recall stays pytest-gated as
defense-in-depth).
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
_DSUB = 8       # dims per subspace (64 / _M)
_SAMPLE_CAP = 4096
_PQ_ROUNDS = 4  # fixed Lloyd rounds — unrolls into the oracle CTEs
_RESCORE_C = 100
# Self-scaling default (round-9 verdict #3): the fixed C=100 pool is the
# measured recall cliff at 1M structured vectors (0.10 recall — 8-byte
# ADC margins drop below quantization error and true neighbors fall
# outside the top-100 ADC order), while C = 0.2% of N recovers >= 0.9
# at trivial cost (2000 exact cosines/probe at 1M). The default is now
# max(floor, 0.2% of indexed N) so a user indexing 100M vectors gets
# the scaled pool WITHOUT reading the docs; the floor IS the fixture
# constant, so every existing oracle (fixtures are <= 50k rows, where
# 0.2% < 100) is unchanged by construction.
_RESCORE_FRACTION = 0.002


def default_rescore_c(spark: SparkSession, sf_dir: str) -> int:
    """max(_RESCORE_C, ceil(_RESCORE_FRACTION * N)) with N = the indexed
    corpus size, read once per fixture version from the embeddings
    parquet footers (metadata-only count, no data scan) and cached."""
    import math
    import os

    from cloudvectordb_spark.cache import artifact_cache, source_tag

    src = os.path.join(sf_dir, "embeddings.parquet")
    n = artifact_cache(
        ("embeddings_count", source_tag(src)),
        lambda: load(spark, sf_dir, "embeddings").count(),
    )
    return max(_RESCORE_C, math.ceil(_RESCORE_FRACTION * n))


def _half_up(x: np.ndarray, p: int) -> np.ndarray:
    """Vectorized round-half-away-from-zero to ``p`` decimals — the same
    convention as Spark F.round and DuckDB round(); numpy's own round()
    is half-even and would diverge at .5 boundaries."""
    f = 10.0 ** p
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    """Unit-normalize with ORACLE-REPLAYABLE arithmetic: the norm rounds
    to 7 decimals BEFORE the division (absorbing summation-order ulps
    between numpy's 8-way-unrolled reduce and DuckDB's sequential
    list_sum), then components round to 9. Every downstream distance is
    computed from doubles that are bit-identical across engines."""
    n = _half_up(np.sqrt(np.add.reduce(x * x, axis=1)), 7)
    n[n == 0.0] = 1.0
    return _half_up(x / n[:, None], 9)


def _pq_seed_ranks_prefixed(
    prefix: str, s: int, vec_ids: list[int]
) -> list[int]:
    """Sample indices ordered by md5('{prefix}{s}|{vec_id}') — the
    per-subspace deterministic 'random' pick both engines compute
    identically; the prefix namespaces the normalized-vector ('pq') and
    residual ('rpq') trainers' sample orders."""
    import hashlib

    return sorted(
        range(len(vec_ids)),
        key=lambda i: (
            hashlib.md5(f"{prefix}{s}|{vec_ids[i]}".encode()).hexdigest(),
            vec_ids[i],
        ),
    )


def _pq_lloyd(
    x: np.ndarray,
    ids: list[int],
    m: int,
    k: int,
    rounds: int,
    seed_prefix: str = "pq",
) -> np.ndarray:
    """The md5-seeded fixed-round Lloyd core over an already-prepared
    (n, dim) matrix — shared by the normalized-vector and residual
    trainers. Distances round to 6 before the argmin (ties -> lower
    cid), means round to 6 after each update — exactly the total order
    the oracle CTEs replay. Cells that empty out drop on both sides
    identically; their codebook rows stay +inf so no encoder can select
    them."""
    dim = x.shape[1]
    dsub = dim // m
    books = np.full((m, k, dsub), np.inf)
    for s in range(m):
        sub = x[:, s * dsub : (s + 1) * dsub]
        seed_idx = _pq_seed_ranks_prefixed(seed_prefix, s, ids)[:k]
        cents: dict[int, np.ndarray] = {
            cid: sub[idx].copy() for cid, idx in enumerate(seed_idx)
        }
        for _ in range(rounds):
            cid_list = sorted(cents)
            cmat = np.stack([cents[c] for c in cid_list])
            d2 = _half_up(
                ((sub[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2), 6
            )
            assign = d2.argmin(axis=1)  # first min == smallest cid
            nxt: dict[int, np.ndarray] = {}
            for j, c in enumerate(cid_list):
                mask = assign == j
                if mask.any():
                    nxt[c] = _half_up(sub[mask].mean(axis=0), 6)
            cents = nxt
        for c, v in cents.items():
            books[s, c] = v
    return books


def train_pq_codebooks_from_df(
    emb: DataFrame,
    m: int = _M,
    k: int = _K,
    sample_cap: int = _SAMPLE_CAP,
    rounds: int = _PQ_ROUNDS,
) -> np.ndarray:
    """(m, k, dim/m) codebooks from md5-seeded fixed-round Lloyd on the
    pinned sample (vec_id < sample_cap, ordered, unit-normalized)."""
    rows = (
        emb.filter(F.col("vec_id") < sample_cap)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    x = _normalize_rows(np.array([r["embedding"] for r in rows], dtype=np.float64))
    return _pq_lloyd(x, ids, m, k, rounds, "pq")


def train_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    m: int = _M,
    k: int = _K,
    sample_cap: int = _SAMPLE_CAP,
    rounds: int = _PQ_ROUNDS,
) -> np.ndarray:
    """Fixture-table convenience wrapper over train_pq_codebooks_from_df."""
    return train_pq_codebooks_from_df(
        load(spark, sf_dir, "embeddings"), m, k, sample_cap, rounds
    )


def pq_encode(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """Distributed encode: (vec_id, code array<int>) — argmin per
    subspace per vector over the ROUNDED distance (the oracle's total
    order), one Arrow batch at a time. The codebook is tiny (m*k*dsub
    doubles) and ships inside the closure."""
    m, _, dsub = books.shape

    def run(batches):
        for pdf in batches:
            x = _normalize_rows(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                d2 = _half_up(
                    ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2), 6
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "code": list(codes)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id long, code array<int>"
    )


def adc_scores(encoded: DataFrame, probes: list[tuple[int, np.ndarray]], books: np.ndarray) -> DataFrame:
    """ADC scan: for each probe, a (m, k) table of ROUNDED squared
    sub-distances is precomputed once; each corpus vector's approximate
    distance is m table lookups summed (re-rounded to 6 so engines agree
    on the candidate cut). Emits (probe_id, vec_id, adc_dist)."""
    m, k, dsub = books.shape
    tables = []
    for pid, pv in probes:
        t = np.empty((m, k))
        for s in range(m):
            t[s] = _half_up(
                ((books[s] - pv[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(axis=1),
                6,
            )
        tables.append((pid, t))

    def run(batches):
        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy())  # (n, m)
            ids = pdf["vec_id"].to_numpy()
            out_pid, out_vid, out_d = [], [], []
            for pid, t in tables:
                d = _half_up(t[np.arange(m)[None, :], codes].sum(axis=1), 6)
                out_pid.append(np.full(len(ids), pid, dtype=np.int64))
                out_vid.append(ids)
                out_d.append(d)
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_pid),
                    "vec_id": np.concatenate(out_vid),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    return encoded.mapInPandas(run, schema="probe_id long, vec_id long, adc_dist double")


# ---------------------------------------------------------------------------
# DuckDB oracle twin: the trainer + encoder unrolled into CTE stages
# (the same trick as kmeans_det.kmeans_cte_sql, with (vec_id, s) long
# form so ONE chain of CTEs covers all 8 subspaces).
# Defines: pq_nrm, pq_sub, pq_c{0..R}, pq_codes (full-corpus codes).
# ---------------------------------------------------------------------------
_PQ_D2 = (
    "round(list_sum(list_transform(list_zip(e.sv, c.sv),"
    " p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
)


def pq_cte_sql(rounds: int = _PQ_ROUNDS) -> str:
    parts = [
        """pq_nrm AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> round(x / round(sqrt(list_sum(list_transform(
                      CAST(embedding AS DOUBLE[]), y -> y * y))), 7), 9)) AS nv
      FROM embeddings
    )""",
        f"""pq_sub AS (
      SELECT vec_id, s.s, nv[s.s * {_DSUB} + 1 : s.s * {_DSUB} + {_DSUB}] AS sv
      FROM pq_nrm, range({_M}) s(s)
    )""",
        f"""pq_c0 AS (
      SELECT s, CAST(rn - 1 AS INTEGER) AS cid, sv FROM (
        SELECT s, sv, row_number() OVER (PARTITION BY s
          ORDER BY md5('pq' || s || '|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM pq_sub WHERE vec_id < {_SAMPLE_CAP}
      ) WHERE rn <= {_K}
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""pq_a{r} AS (
      SELECT vec_id, s, sv, cid FROM (
        SELECT e.vec_id, e.s, e.sv, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, e.s
                                  ORDER BY {_PQ_D2}, c.cid) AS rn
        FROM pq_sub e JOIN pq_c{r - 1} c ON c.s = e.s
        WHERE e.vec_id < {_SAMPLE_CAP}
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""pq_c{r} AS (
      SELECT s, cid, list(m ORDER BY i) AS sv FROM (
        SELECT a.s, a.cid, t.i, round(avg(a.sv[t.i]), 6) AS m
        FROM pq_a{r} a, range(1, {_DSUB + 1}) t(i)
        GROUP BY a.s, a.cid, t.i
      ) GROUP BY s, cid
    )"""
        )
    parts.append(
        f"""pq_codes AS (
      SELECT vec_id, s, cid FROM (
        SELECT e.vec_id, e.s, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, e.s
                                  ORDER BY {_PQ_D2}, c.cid) AS rn
        FROM pq_sub e JOIN pq_c{rounds} c ON c.s = e.s
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)


_PQ_CTES = pq_cte_sql()

# probe ADC tables + candidate cut, shared by the PQ and IVF-PQ oracles
_PQ_PROBE_CTES = f"""pq_ptab AS (
      SELECT e.vec_id AS probe_id, c.s, c.cid, {_PQ_D2} AS d
      FROM pq_sub e JOIN pq_c{_PQ_ROUNDS} c ON c.s = e.s
      WHERE e.vec_id < 3
    ),
    pq_adc AS (
      SELECT t.probe_id, k.vec_id, round(sum(t.d), 6) AS adc_dist
      FROM pq_codes k JOIN pq_ptab t ON t.s = k.s AND t.cid = k.cid
      WHERE k.vec_id <> t.probe_id
      GROUP BY t.probe_id, k.vec_id
    )"""

_PQ_RESCORE_SQL = f"""
    SELECT probe_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT probe_id, neighbor_id, score,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM (
        SELECT c.probe_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(CAST(ec.embedding AS DOUBLE[]),
                                            CAST(ep.embedding AS DOUBLE[])), 6)
                 AS score
        FROM pq_cand c
        JOIN embeddings ec ON ec.vec_id = c.vec_id
        JOIN embeddings ep ON ep.vec_id = c.probe_id
      )
    ) WHERE rank <= 10
"""


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray]:
    """(encoded codes DataFrame, codebooks) for ``sf_dir``, building each
    at most once per fixture version — codebook training and corpus
    encoding are INDEX-BUILD work (the S4 bulk phase), so repeat searches
    read the persisted code parquet instead of re-running Lloyd + the
    encode scan. Fingerprint-keyed atomic-rename publish like the IVF
    index; codebooks process-wide + codes frame session-cached in the
    unified cloudvectordb_spark.cache."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import (
        artifact_cache,
        build_lock,
        session_key,
        source_tag,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{_M}|{_K}|md5lloyd{_PQ_ROUNDS}"
        f"|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    books = artifact_cache(
        ("pq_books", tag), lambda: train_pq_codebooks(spark, sf_dir)
    )
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_pq", tag)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        with build_lock(path):
            if not os.path.exists(marker):
                build_dir = f"{path}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
                pq_encode(load(spark, sf_dir, "embeddings"), books).write.mode(
                    "overwrite"
                ).parquet(build_dir)
                try:
                    os.rename(build_dir, path)
                except OSError:  # concurrent publisher won — use theirs
                    shutil.rmtree(build_dir, ignore_errors=True)
    codes = artifact_cache(
        ("pq_codes_frame", path, session_key(spark)),
        lambda: spark.read.parquet(path),
    )
    return codes, books


def _normalized_probes(emb: DataFrame, n: int = 3) -> list[tuple[int, np.ndarray]]:
    rows = emb.filter(F.col("vec_id") < n).orderBy("vec_id").collect()
    return [
        (
            r["vec_id"],
            _normalize_rows(np.array([r["embedding"]], dtype=np.float64))[0],
        )
        for r in rows
    ]


@query(
    "pq_topk_search",
    # FULL value oracle (round-5): md5-seeded fixed-round Lloyd + rounded
    # comparison keys make codebooks, codes, the ADC candidate cut, and
    # the rescore all SQL-replayable. Recall stays pytest-gated too.
    oracle=f"""
    WITH {_PQ_CTES},
    {_PQ_PROBE_CTES},
    pq_cand AS (
      SELECT probe_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY adc_dist, vec_id) AS rn
        FROM pq_adc
      ) WHERE rn <= {_RESCORE_C}
    )
    {_PQ_RESCORE_SQL}
    """,
    operators=("K9", "K8", "K6", "L2", "L3", "E4"),
    bench=True,
)
def pq_topk_search(
    spark: SparkSession, sf_dir: str, rescore_c: int | None = None
) -> DataFrame:
    """PQ-ADC candidate generation + exact cosine rescore, top-10 for 3
    probes. Output matches the exact-kNN shape (probe_id, neighbor_id,
    score, rank) so recall is directly measurable against it.

    ``rescore_c`` (default ``_RESCORE_C``, the oracle's constant): the
    candidate-pool width. A FIXED pool is the measured recall cliff at
    1M structured vectors (BASELINE.md round 8) — 8-byte-code distance
    margins drop below quantization error, true neighbors fall outside
    the top-100 ADC order. The production knob is scaling C with
    corpus size (rescore cost stays trivial: C exact cosines/probe);
    tools/recall_report.py --rescore-c measures the recovery."""
    from cloudvectordb_spark.functions import vector as V

    c = default_rescore_c(spark, sf_dir) if rescore_c is None else rescore_c
    emb = load(spark, sf_dir, "embeddings")
    encoded, books = ensure_pq_index(spark, sf_dir)
    probes = _normalized_probes(emb)

    scores = adc_scores(encoded, probes, books).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    wc = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    cands = (
        scores.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= c)
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
    # Deterministic codes => the EXACT per-(subspace, code) histogram is
    # the oracle (upgraded from the round-2 invariant form).
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT CAST(s AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM pq_codes GROUP BY s, cid
    """,
    operators=("K9", "K12", "D1", "L5"),
)
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression diagnostics (K12-style quality gate for the compressed
    index): the full code-balance crosstab — skewed cells mean wasted
    codebook capacity and hot ADC buckets."""
    encoded, _ = ensure_pq_index(spark, sf_dir)
    return (
        encoded.select(F.posexplode("code").alias("subspace", "code"))
        .groupBy("subspace", "code")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the canonical composed index — coarse quantizer prunes cells
# (partition pruning on the parquet layout), PQ-ADC scans only the codes
# inside the selected cells, exact rescore fixes the top of the list.
# I/O per probe ≈ (nprobe/k) × corpus × 8 bytes of codes — the two
# approximations multiply: cell pruning cuts candidates, code compression
# cuts bytes per candidate. Build reuses the IVF assignments and the
# global PQ codebooks; codes persist partitioned by centroid_id so the
# probe-time isin filter is a genuine partition filter. Both quantizers
# are md5-deterministic (round-5), so even the COMPOSED index carries a
# full value oracle.
# ---------------------------------------------------------------------------


def ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray, list]:
    """(codes-partitioned-by-cell DataFrame, codebooks, centroid list)."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import (
        artifact_cache,
        build_lock,
        session_key,
        source_tag,
    )
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        read_ivf_index,
    )

    ivf_path = ensure_ivf_index(spark, sf_dir)
    cents = index_centroids(spark, ivf_path)
    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.md5(
        f"ivfpq|{os.path.abspath(sf_dir)}|{_M}|{_K}|md5lloyd{_PQ_ROUNDS}"
        f"|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    books = artifact_cache(
        ("pq_books", tag), lambda: train_pq_codebooks(spark, sf_dir)
    )
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_ivfpq", tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        with build_lock(path):
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                build_dir = f"{path}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
                vectors, _ = read_ivf_index(spark, ivf_path)
                codes = pq_encode(vectors, books).join(
                    vectors.select("vec_id", "centroid_id"), "vec_id"
                )
                # one shuffle on the key -> one file per cell (see
                # write_ivf_index: 4.3x faster at 2k cells, compacted
                # layout for the cell-pruned scans)
                codes.repartition("centroid_id").write.mode(
                    "overwrite"
                ).partitionBy("centroid_id").parquet(build_dir)
                try:
                    os.rename(build_dir, path)
                except OSError:  # concurrent publisher won
                    shutil.rmtree(build_dir, ignore_errors=True)
    codes = artifact_cache(
        ("ivfpq_codes_frame", path, session_key(spark)),
        lambda: spark.read.parquet(path),
    )
    return codes, books, cents


def _ivfpq_oracle() -> str:
    from cloudvectordb_spark.operators.pipeline import _IVF_ROUNDS, _KM_CTES, _KM_D2

    return f"""
    WITH {_KM_CTES},
    {_PQ_CTES},
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    pr_codes AS (
      SELECT k.vec_id, k.s, k.cid
      FROM pq_codes k JOIN km_assign a ON a.vec_id = k.vec_id
      WHERE a.cid IN (SELECT cid FROM probe_cells)
    ),
    {_PQ_PROBE_CTES.replace("pq_codes k", "pr_codes k")},
    pq_cand AS (
      SELECT probe_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY adc_dist, vec_id) AS rn
        FROM pq_adc
      ) WHERE rn <= {_RESCORE_C}
    )
    {_PQ_RESCORE_SQL}
    """


@query(
    "ivfpq_topk_search",
    oracle=_ivfpq_oracle(),
    operators=("K9", "K8", "K6", "L2", "L3", "E4", "A3"),
)
def ivfpq_topk_search(
    spark: SparkSession, sf_dir: str, rescore_c: int | None = None
) -> DataFrame:
    """Cell-pruned ADC + exact rescore, top-10 for 3 probes; output shape
    matches exact kNN so recall is directly measurable. ``rescore_c``:
    see pq_topk_search — the corpus-scaled candidate-pool knob."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py

    c = default_rescore_c(spark, sf_dir) if rescore_c is None else rescore_c
    emb = load(spark, sf_dir, "embeddings")
    codes, books, cents = ensure_ivfpq_index(spark, sf_dir)
    probes = _normalized_probes(emb)
    probe_raw = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )

    # coarse quantizer against the RAW vectors (the IVF layout's space):
    # driver-side over the cached centroid list, same rounded total order
    raw_rows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    cell_ids = sorted(
        {c for r in raw_rows for c in nearest_cells_py(r["embedding"], cents, 2)}
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
        .filter(F.col("crank") <= c)
        .select("probe_id", "vec_id")
    )
    rescored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(probe_raw), "probe_id")
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


# ---------------------------------------------------------------------------
# K12 compression-fidelity gate: per-vector PQ reconstruction error —
# the squared distance between the normalized vector and its codeword
# concatenation, i.e. exactly the sum of the per-subspace assignment
# distances the encoder minimized. The number that tells you whether
# m/k are sized right BEFORE recall degrades in production.
# ---------------------------------------------------------------------------
@query(
    "pq_reconstruction_error",
    oracle=f"""
    WITH {_PQ_CTES},
    errs AS (
      SELECT e.vec_id, e.s, {_PQ_D2} AS d
      FROM pq_sub e
      JOIN pq_codes k ON k.vec_id = e.vec_id AND k.s = e.s
      JOIN pq_c{_PQ_ROUNDS} c ON c.s = k.s AND c.cid = k.cid
      WHERE e.vec_id < 100
    )
    SELECT vec_id, round(sum(d), 6) AS recon_err
    FROM errs GROUP BY vec_id
    """,
    operators=("K12", "K9", "K6", "L5"),
)
def pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    _, books = ensure_pq_index(spark, sf_dir)
    m, _, dsub = books.shape

    def run(batches):
        for pdf in batches:
            x = _normalize_rows(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            )
            total = np.zeros(len(x))
            for s in range(m):
                sub = x[:, s * dsub : (s + 1) * dsub]
                d2 = _half_up(
                    ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2), 6
                )
                total += d2.min(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "recon_err": _half_up(total, 6),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id long, recon_err double"
    )


# ---------------------------------------------------------------------------
# K9 lifecycle for the compressed tier: append delta vectors' CODES
# against the FROZEN codebooks (no retrain — codebook drift is handled
# by periodic rebuilds, like the IVF centroids). Work ∝ delta size;
# the ADC scan picks the new codes up on its next read.
# ---------------------------------------------------------------------------
def append_to_pq_index(
    new_vectors: DataFrame, path: str, books: "np.ndarray"
) -> None:
    """Encode ``new_vectors`` (vec_id, embedding) with the existing
    codebooks and append to the persisted code parquet."""
    pq_encode(new_vectors, books).write.mode("append").parquet(path)


# ---------------------------------------------------------------------------
# Residual IVF-PQ (the standard quality upgrade from Jégou et al. 2011,
# and what FAISS IndexIVFPQ encodes by default): instead of quantizing
# the vector itself with GLOBAL codebooks, quantize its RESIDUAL vs a
# per-cell anchor. Residuals concentrate near the origin with far less
# variance, so the same m x k code budget spends its precision on the
# part of the vector the coarse quantizer did NOT explain. The ADC
# identity that makes per-cell scoring sound: for ANY per-cell anchor
# g(c) and x in cell c,  q - x = (q - g(c)) - (x - g(c)), so the ADC
# distance between the probe's PER-CELL residual and the stored
# residual code approximates ||q - x||^2 directly — distances stay
# comparable ACROSS cells and one global candidate cut is sound.
#
# Metric alignment (learned the hard way — a first cut quantized
# RAW-space residuals and measured recall 0.70 vs plain IVF-PQ's 0.867
# on the 20k structured corpus): the engine's search metric is COSINE,
# so residuals must live on the unit sphere where L2^2 = 2 - 2*cos.
# Vectors are unit-normalized (the same rounded arithmetic as pq_nrm)
# and the anchor is the NORMALIZED frozen IVF centroid; cells remain
# the raw-space IVF partitions (they are just the data layout — the
# identity above holds for any anchor).
#
# Everything stays md5-deterministic: normalization rounds 7/9, the
# anchor subtraction is exact IEEE on bit-identical doubles, the
# residual trainer is the same fixed-round Lloyd under the 'rpq' seed
# namespace, and the whole composed index — coarse cells, residual
# codebooks, codes, ADC cut, rescore — unrolls into DuckDB CTEs for a
# FULL value oracle.
# At 100 TB the layout is identical to plain IVF-PQ (codes partitioned
# by cell; probes read nprobe partitions); only the per-probe table
# build grows by a factor of nprobe — driver-side constants.
# ---------------------------------------------------------------------------


def _normalized_centroids(cents: list) -> dict[int, np.ndarray]:
    """cid -> unit-normalized centroid under the oracle's rounded
    arithmetic (norm to 7, components to 9 — the pq_nrm discipline)."""
    return {
        cid: _normalize_rows(np.asarray([v], dtype=np.float64))[0]
        for cid, v in cents
    }


def train_pq_codebooks_residual(
    spark: SparkSession,
    sf_dir: str,
    m: int = _M,
    k: int = _K,
    sample_cap: int = _SAMPLE_CAP,
    rounds: int = _PQ_ROUNDS,
) -> np.ndarray:
    """(m, k, dim/m) codebooks trained on the pinned sample's
    unit-sphere RESIDUALS: normalized vector minus the NORMALIZED
    frozen IVF centroid of its cell (metric alignment — see the block
    comment)."""
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        read_ivf_index,
    )

    ivf_path = ensure_ivf_index(spark, sf_dir)
    vectors, _ = read_ivf_index(spark, ivf_path)
    cents = index_centroids(spark, ivf_path)
    cn = _normalized_centroids(cents)
    rows = (
        vectors.filter(F.col("vec_id") < sample_cap)
        .orderBy("vec_id")
        .select("vec_id", "embedding", "centroid_id")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    nv = _normalize_rows(
        np.array([r["embedding"] for r in rows], dtype=np.float64)
    )
    x = nv - np.stack([cn[r["centroid_id"]] for r in rows])
    return _pq_lloyd(x, ids, m, k, rounds, "rpq")


def pq_encode_residual(
    vectors: DataFrame, books: np.ndarray, cents: list
) -> DataFrame:
    """Distributed residual encode: (vec_id, code, centroid_id) —
    unit-normalize, subtract the row's NORMALIZED frozen cell centroid,
    then the usual rounded argmin per subspace. Centroid matrix and
    codebooks are tiny and ship in the closure."""
    m, _, dsub = books.shape
    cn = _normalized_centroids(cents)
    cid_list = sorted(cn)
    cmat = np.stack([cn[c] for c in cid_list])
    cindex = {cid: i for i, cid in enumerate(cid_list)}

    def run(batches):
        for pdf in batches:
            x = _normalize_rows(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            )
            cells = pdf["centroid_id"].to_numpy()
            idx = np.array([cindex[c] for c in cells], dtype=np.int64)
            r = x - cmat[idx]
            codes = np.empty((len(r), m), dtype=np.int32)
            for s in range(m):
                sub = r[:, s * dsub : (s + 1) * dsub]
                d2 = _half_up(
                    ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(
                        axis=2
                    ),
                    6,
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "code": list(codes),
                    "centroid_id": cells.astype(np.int32),
                }
            )

    return vectors.select("vec_id", "embedding", "centroid_id").mapInPandas(
        run, schema="vec_id long, code array<int>, centroid_id int"
    )


def adc_scores_residual(
    encoded: DataFrame,
    probes_raw: list[tuple[int, np.ndarray]],
    books: np.ndarray,
    cents: list,
    cell_ids: list[int],
) -> DataFrame:
    """Residual ADC scan: one (m, k) lookup table per (probe, probed
    cell) — the NORMALIZED probe's residual vs THAT cell's normalized
    centroid — then each code row sums lookups from its own cell's
    table. nprobe × m × k doubles of tables ride in the closure;
    distances are comparable across cells (see block comment),
    re-rounded to 6."""
    m, _, dsub = books.shape
    cn = _normalized_centroids(cents)
    tables: dict[tuple[int, int], np.ndarray] = {}
    for pid, pv in probes_raw:
        pn = _normalize_rows(pv[None, :])[0]
        for cell in cell_ids:
            rq = pn - cn[cell]
            t = np.empty((m, books.shape[1]))
            for s in range(m):
                t[s] = _half_up(
                    (
                        (books[s] - rq[s * dsub : (s + 1) * dsub][None, :])
                        ** 2
                    ).sum(axis=1),
                    6,
                )
            tables[(pid, cell)] = t

    def run(batches):
        for pdf in batches:
            codes = np.stack(pdf["code"].to_numpy())
            ids = pdf["vec_id"].to_numpy()
            cells = pdf["centroid_id"].to_numpy()
            out_pid, out_vid, out_d = [], [], []
            for (pid, cell), t in tables.items():
                mask = cells == cell
                if not mask.any():
                    continue
                d = _half_up(
                    t[np.arange(m)[None, :], codes[mask]].sum(axis=1), 6
                )
                out_pid.append(np.full(int(mask.sum()), pid, dtype=np.int64))
                out_vid.append(ids[mask])
                out_d.append(d)
            if not out_pid:
                yield pd.DataFrame(
                    {
                        "probe_id": np.array([], dtype=np.int64),
                        "vec_id": np.array([], dtype=np.int64),
                        "adc_dist": np.array([], dtype=np.float64),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "probe_id": np.concatenate(out_pid),
                    "vec_id": np.concatenate(out_vid),
                    "adc_dist": np.concatenate(out_d),
                }
            )

    return encoded.mapInPandas(
        run, schema="probe_id long, vec_id long, adc_dist double"
    )


def ensure_ivfpq_residual_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, np.ndarray, list]:
    """(residual codes partitioned by cell, residual codebooks,
    centroid list) — build-once like ensure_ivfpq_index."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import (
        artifact_cache,
        build_lock,
        session_key,
        source_tag,
    )
    from cloudvectordb_spark.operators.pipeline import (
        ensure_ivf_index,
        index_centroids,
        read_ivf_index,
    )

    ivf_path = ensure_ivf_index(spark, sf_dir)
    cents = index_centroids(spark, ivf_path)
    src = os.path.join(sf_dir, "embeddings.parquet")
    # "n1" = residual-space version (unit-sphere residuals vs normalized
    # anchors); bumping it orphans any artifact built by the raw-space
    # first cut so it can never serve the cosine-aligned query.
    tag = hashlib.md5(
        f"rivfpq-n1|{os.path.abspath(sf_dir)}|{_M}|{_K}|md5lloyd{_PQ_ROUNDS}"
        f"|{source_tag(src)}".encode()
    ).hexdigest()[:16]
    books = artifact_cache(
        ("rpq_books", tag),
        lambda: train_pq_codebooks_residual(spark, sf_dir),
    )
    path = os.path.join(tempfile.gettempdir(), "cloudvectordb_rivfpq", tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        with build_lock(path):
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                build_dir = f"{path}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
                vectors, _ = read_ivf_index(spark, ivf_path)
                pq_encode_residual(vectors, books, cents).repartition(
                    "centroid_id"
                ).write.mode("overwrite").partitionBy("centroid_id").parquet(
                    build_dir
                )
                try:
                    os.rename(build_dir, path)
                except OSError:  # concurrent publisher won
                    shutil.rmtree(build_dir, ignore_errors=True)
    codes = artifact_cache(
        ("rivfpq_codes_frame", path, session_key(spark)),
        lambda: spark.read.parquet(path),
    )
    return codes, books, cents


def pq_residual_cte_sql(rounds: int = _PQ_ROUNDS) -> str:
    """CTE text for the residual quantizer (append after _KM_CTES):
    rpq_res (vec_id, cell, nv = v - centroid), rpq_sub, rpq_c{r}
    codebooks under the 'rpq' seed namespace, rpq_codes (vec_id, cell,
    s, cid). Mirrors train_pq_codebooks_residual + pq_encode_residual
    stage for stage."""
    from cloudvectordb_spark.operators.pipeline import _IVF_ROUNDS

    nrm = (
        "list_transform({v}, x -> round(x / round(sqrt(list_sum("
        "list_transform({v}, y -> y * y))), 7), 9))"
    )
    parts = [
        f"""rpq_cn AS (
      SELECT cid, {nrm.format(v='v')} AS cv FROM km_c{_IVF_ROUNDS}
    )""",
        f"""rpq_res AS (
      SELECT a.vec_id, a.cid AS cell,
             list_transform(list_zip({nrm.format(v='a.v')}, c.cv),
                            p -> p[1] - p[2]) AS nv
      FROM km_assign a JOIN rpq_cn c ON c.cid = a.cid
    )""",
        f"""rpq_sub AS (
      SELECT vec_id, cell, s.s,
             nv[s.s * {_DSUB} + 1 : s.s * {_DSUB} + {_DSUB}] AS sv
      FROM rpq_res, range({_M}) s(s)
    )""",
        f"""rpq_c0 AS (
      SELECT s, CAST(rn - 1 AS INTEGER) AS cid, sv FROM (
        SELECT s, sv, row_number() OVER (PARTITION BY s
          ORDER BY md5('rpq' || s || '|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM rpq_sub WHERE vec_id < {_SAMPLE_CAP}
      ) WHERE rn <= {_K}
    )""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""rpq_a{r} AS (
      SELECT vec_id, s, sv, cid FROM (
        SELECT e.vec_id, e.s, e.sv, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, e.s
                                  ORDER BY {_PQ_D2}, c.cid) AS rn
        FROM rpq_sub e JOIN rpq_c{r - 1} c ON c.s = e.s
        WHERE e.vec_id < {_SAMPLE_CAP}
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""rpq_c{r} AS (
      SELECT s, cid, list(m ORDER BY i) AS sv FROM (
        SELECT a.s, a.cid, t.i, round(avg(a.sv[t.i]), 6) AS m
        FROM rpq_a{r} a, range(1, {_DSUB + 1}) t(i)
        GROUP BY a.s, a.cid, t.i
      ) GROUP BY s, cid
    )"""
        )
    parts.append(
        f"""rpq_codes AS (
      SELECT vec_id, cell, s, cid FROM (
        SELECT e.vec_id, e.cell, e.s, c.cid,
               row_number() OVER (PARTITION BY e.vec_id, e.s
                                  ORDER BY {_PQ_D2}, c.cid) AS rn
        FROM rpq_sub e JOIN rpq_c{rounds} c ON c.s = e.s
      ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)


def _ivfpq_residual_oracle() -> str:
    from cloudvectordb_spark.operators.pipeline import (
        _IVF_ROUNDS,
        _KM_CTES,
        _KM_D2,
    )

    return f"""
    WITH {_KM_CTES},
    {pq_residual_cte_sql()},
    probe_cells AS (
      SELECT DISTINCT cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_D2}, c.cid) AS rn
        FROM km_emb e, km_c{_IVF_ROUNDS} c WHERE e.vec_id < 3
      ) WHERE rn <= 2
    ),
    rq AS (
      SELECT p.vec_id AS probe_id, cc.cid AS cell,
             list_transform(list_zip(
               list_transform(p.v, x -> round(x / round(sqrt(list_sum(
                 list_transform(p.v, y -> y * y))), 7), 9)),
               cc.cv), q -> q[1] - q[2]) AS nv
      FROM km_emb p CROSS JOIN (
        SELECT pc.cid, n.cv FROM probe_cells pc
        JOIN rpq_cn n ON n.cid = pc.cid
      ) cc
      WHERE p.vec_id < 3
    ),
    rq_sub AS (
      SELECT probe_id, cell, s.s,
             nv[s.s * {_DSUB} + 1 : s.s * {_DSUB} + {_DSUB}] AS sv
      FROM rq, range({_M}) s(s)
    ),
    rpq_ptab AS (
      SELECT e.probe_id, e.cell, c.s, c.cid, {_PQ_D2} AS d
      FROM rq_sub e JOIN rpq_c{_PQ_ROUNDS} c ON c.s = e.s
    ),
    rpq_adc AS (
      SELECT t.probe_id, k.vec_id, round(sum(t.d), 6) AS adc_dist
      FROM rpq_codes k
      JOIN rpq_ptab t
        ON t.cell = k.cell AND t.s = k.s AND t.cid = k.cid
      WHERE k.cell IN (SELECT cid FROM probe_cells)
        AND k.vec_id <> t.probe_id
      GROUP BY t.probe_id, k.vec_id
    ),
    pq_cand AS (
      SELECT probe_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY adc_dist, vec_id) AS rn
        FROM rpq_adc
      ) WHERE rn <= {_RESCORE_C}
    )
    {_PQ_RESCORE_SQL}
    """


@query(
    "ivfpq_residual_topk_search",
    oracle=_ivfpq_residual_oracle(),
    operators=("K9", "K8", "K6", "L2", "L3", "E4", "A3"),
)
def ivfpq_residual_topk_search(
    spark: SparkSession, sf_dir: str, rescore_c: int | None = None
) -> DataFrame:
    """Residual IVF-PQ search (see module comment above the residual
    block): cell-pruned residual-ADC candidate generation + exact
    cosine rescore, top-10 for 3 probes — output shape matches exact
    kNN so recall is directly measurable against it and against plain
    ivfpq_topk_search. ``rescore_c``: the corpus-scaled candidate-pool
    knob, as in pq_topk_search."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.kmeans_det import nearest_cells_py

    c = default_rescore_c(spark, sf_dir) if rescore_c is None else rescore_c
    emb = load(spark, sf_dir, "embeddings")
    codes, books, cents = ensure_ivfpq_residual_index(spark, sf_dir)
    raw_rows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    probes_raw = [
        (r["vec_id"], np.asarray(r["embedding"], dtype=np.float64))
        for r in raw_rows
    ]
    cell_ids = sorted(
        {
            cell
            for r in raw_rows
            for cell in nearest_cells_py(r["embedding"], cents, 2)
        }
    )
    probe_raw = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )

    pruned = codes.filter(F.col("centroid_id").isin(cell_ids)).select(
        "vec_id", "code", "centroid_id"
    )
    scores = adc_scores_residual(
        pruned, probes_raw, books, cents, cell_ids
    ).filter(F.col("vec_id") != F.col("probe_id"))
    wc = Window.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
    cands = (
        scores.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= c)
        .select("probe_id", "vec_id")
    )
    rescored = (
        cands.join(emb, "vec_id")
        .join(F.broadcast(probe_raw), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(V.cosine("embedding", "probe_vec"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )
