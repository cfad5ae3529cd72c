"""Near-duplicate detection (SURVEY.md §2 G5, plus the exact-Jaccard
baseline; [SCOPE] BASELINE.json:6 "dedup" in the LLM-data-pipeline sense).

Two paths:
  - exact n-gram Jaccard over shingle sets: pure Column expressions with a
    DuckDB oracle twin — the correctness baseline.
  - MinHash-LSH (pyspark.ml) banding: the 100 TB path — shingle ->
    minhash signature -> band bucket equi-join, which replaces the
    quadratic all-pairs comparison with a shuffle on bucket ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# G5 exact baseline: pairwise n-gram Jaccard over a bounded doc set
# ---------------------------------------------------------------------------
@query(
    "ngram_jaccard_pairs",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE doc_id < 30
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
    FROM s a, s b
    WHERE a.doc_id < b.doc_id
    """,
    operators=("G5", "C7", "H7", "H8"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sh = docs.select(
        "doc_id", F.array_distinct(TX.word_shingles("text", 3)).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_distinct(F.concat("sa", "sb"))).cast("double")
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.round(F.try_divide(inter, union), 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# G5 scale path: MinHash-LSH candidate pairs (token-set Jaccard)
# ---------------------------------------------------------------------------
def minhash_candidate_pairs(
    docs: DataFrame,
    dist_threshold: float = 0.9,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Banded MinHash join: returns (a_id, b_id, jaccard_dist) candidate
    pairs with Jaccard distance under the threshold. The
    approxSimilarityJoin is an equi-join on (table, band hash) under the
    hood — linear shuffle, no all-pairs blowup at 100 TB."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select("doc_id", TX.tokens("text").alias("toks"))
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 18)
    feat = tf.transform(toks)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feat)
    joined = mh.approxSimilarityJoin(feat, feat, dist_threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@query(
    "minhash_dedup_pairs",
    # MLlib MinHashLSH's seeded hashes aren't DuckDB-replayable, so the
    # registered form carries an INVARIANT value oracle (r6 verdict #7)
    # instead of the raw pair list: two DuckDB-recomputed counts plus two
    # invariants of the emitted set that must be exactly zero. The G5
    # BENCH representative stays minhash_banded_pairs_md5 below (same
    # banded-join plan shape, fully replayable signatures); the raw MLlib
    # pair list remains available via minhash_candidate_pairs.
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents WHERE doc_id < 100
    ),
    p AS (
      SELECT CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS i,
             CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) AS u
      FROM t a, t b WHERE a.doc_id < b.doc_id
    )
    SELECT CAST(count(*) FILTER (WHERE 1.0 - i / u <= 0.9) AS BIGINT)
             AS n_exact_pairs_at_tau,
           CAST(count(*) FILTER (WHERE i = u) AS BIGINT) AS n_identical_pairs,
           CAST(0 AS BIGINT) AS n_emitted_outside_tau,
           CAST(0 AS BIGINT) AS n_identical_missed
    FROM p
    """,
    operators=("G5", "K1", "L3"),
)
def minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH parity path, value-checked via invariants:

    - soundness: every emitted pair's EXACT token-set Jaccard distance
      is within the requested tau. Not probabilistic — MLlib's
      approxSimilarityJoin post-filters candidates on the true
      keyDistance, so an out-of-tau emission would be a real bug (or a
      HashingTF index collision shifting a boundary pair; zero on the
      fixtures at both sf, asserted by the oracle row).
    - completeness floor: pairs with IDENTICAL token sets produce
      identical signatures, collide in every band, and must ALL be
      emitted (the fixtures contain such pairs, so this is non-vacuous).

    The two count columns (exact pairs at tau, identical pairs) are
    recomputed independently by DuckDB, giving the row real value-level
    content beyond the zero assertions."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    emitted = minhash_candidate_pairs(docs, dist_threshold=0.9)
    tok = docs.select(
        "doc_id", F.array_distinct(TX.tokens("text")).alias("toks")
    )
    a = tok.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("ta"))
    b = tok.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    union = F.size(F.array_distinct(F.concat("ta", "tb"))).cast("double")
    pairs = a.join(F.broadcast(b), F.col("a_id") < F.col("b_id")).select(
        "a_id",
        "b_id",
        (1.0 - F.try_divide(inter, union)).alias("dist"),
        (inter == union).alias("identical"),
    )
    stats = pairs.agg(
        F.count(F.when(F.col("dist") <= 0.9, 1))
        .cast("bigint")
        .alias("n_exact_pairs_at_tau"),
        F.count(F.when(F.col("identical"), 1))
        .cast("bigint")
        .alias("n_identical_pairs"),
    )
    outside = (
        emitted.join(pairs, ["a_id", "b_id"], "left")
        .agg(
            F.count(F.when(F.col("dist") > 0.9, 1))
            .cast("bigint")
            .alias("n_emitted_outside_tau")
        )
    )
    missed = (
        pairs.filter("identical")
        .join(emitted, ["a_id", "b_id"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_identical_missed"))
    )
    return stats.crossJoin(outside).crossJoin(missed)


# ---------------------------------------------------------------------------
# SimHash fingerprints: signature from token hashes — pure expressions
# (hash + bit ops), no UDF. Hamming-near signatures are dedup candidates;
# at scale, band the signature bits for the equi-join.
#
# Two token-hash modes:
# - "xxhash64" (default, 64-bit): the fast scale path.
# - "md5" (60-bit): bit-for-bit reproducible in DuckDB (md5_number_upper
#   byteswapped == Spark conv(substr(md5, 1, 15), 16, 10)), which is what
#   lets the registered queries carry FULL value-level oracles instead of
#   rows-only checks. ~3x slower per token than xxhash64; use for audits.
# ---------------------------------------------------------------------------
def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash bigint) via explode -> per-bit vote -> reassemble."""
    if hash_fn == "md5":
        nbits = 60  # 15 hex chars stay < 2^63 under ANSI bigint cast
        th = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    else:
        nbits = 64
        th = F.xxhash64("tok")
    toks = docs.select(
        F.col(id_col), F.explode(TX.tokens(text_col)).alias("tok")
    ).withColumn("th", th)
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("bit"),
        F.col("th"),
    ).withColumn(
        "vote",
        F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


# DuckDB twin of the md5-mode simhash over docs with doc_id < {lim}:
# md5_number_upper is the FIRST 8 md5 bytes little-endian; the HUGEINT
# byteswap + //16 reconstructs Spark's conv(substr(md5_hex, 1, 15), 16, 10).
_SIMHASH_MD5_SIGS_SQL = """
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < {lim}
    ),
    th AS (
      SELECT doc_id,
        CAST((
          (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
          (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
          (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
          (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
          (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
          (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
          (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
          CAST((u >> 56) & 255 AS HUGEINT)
        ) // 16 AS BIGINT) AS th
      FROM (SELECT doc_id, md5_number_upper(tok) AS u FROM toks)
    ),
    bits AS (
      SELECT doc_id, b.i AS bit,
             CASE WHEN (th >> b.i) & 1 = 1 THEN 1 ELSE -1 END AS vote
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i) b
    ),
    votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2),
    sigs AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
"""


@query(
    "simhash_signatures",
    oracle=f"""
    WITH {_SIMHASH_MD5_SIGS_SQL.format(lim=100)}
    SELECT doc_id, simhash FROM sigs
    """,
    operators=("G5", "H4"),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return simhash(docs, hash_fn="md5")


# ---------------------------------------------------------------------------
# G5 canonicalization: connected components over near-dup pairs.
# Pregel-style min-label propagation — each round is one equi-join +
# groupBy-min; rounds needed = graph diameter (tiny for dup clusters).
# At 100 TB the edge list comes from the MinHash banding above instead of
# exact all-pairs; the propagation loop is unchanged. Oracle replays the
# same closure with a recursive CTE.
# ---------------------------------------------------------------------------
_CC_TAU = 0.5

_CC_PAIRS_SQL = """
    WITH RECURSIVE s AS (
      SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM s a, s b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= {tau}
    )
"""


def shingle_jaccard_edges(docs: DataFrame, tau: float) -> DataFrame:
    """(src, dst) near-dup edges: exact trigram-shingle Jaccard >= tau.

    Inverted-index candidate generation — only pairs SHARING a shingle can
    clear any Jaccard threshold — turns O(n^2) scoring into an equi-join
    on shingle (1-band exact banding; MinHash banding is the lossy
    version of this same shape). Hot shingles would skew the join at
    scale; AQE skew-split handles it, and a df-cap prefilter is the
    standard lossy escalation.
    """
    sh = docs.select(
        "doc_id", F.array_distinct(TX.word_shingles("text", 3)).alias("sh")
    )
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    cand = (
        inv.alias("x")
        .join(inv.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
        )
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_distinct(F.concat("sa", "sb"))).cast("double")
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("j", F.try_divide(inter, union))
        .filter(F.col("j") >= tau)
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    stats: dict | None = None,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Min-label components over an undirected edge list; returns
    (node bigint, component bigint) for every node with >= 1 edge.
    Deterministic: every node labels with its component's global min.

    Two execution modes, same fixed point:

    - **driver union-find** when the (symmetrized, distinct) edge list
      holds <= ``driver_threshold`` rows: collect once, path-compressed
      DSU, min-per-root labeling. A near-dup pair graph is ∝ duplicate
      count, not corpus size, so delta-scale graphs (the
      CorpusPipeline.append path: ~20k edges at a 100k delta) finish in
      milliseconds instead of paying ~6 Spark jobs of fixed overhead
      per propagation round (measured ~20 s of pure job latency at 10M
      corpus scale). 1M rows is ~tens of MB on the driver.
    - **distributed min-label propagation with pointer doubling**
      above the threshold (or with ``driver_threshold=0`` to force it —
      the convergence tests and `tools/cc_adversarial_probe.py` do).
      Each round does (1) neighbor-min propagation and (2) a pointer
      jump (component <- its component's component, taking the min) —
      path compression that makes convergence O(log diameter) Spark
      rounds instead of O(diameter) (round-9: a 64-node chain measured
      63 rounds plain vs 6 with doubling; each round is a full
      shuffle).

    ``stats``: receives {"rounds": N, "round_secs": [...], "mode": ...}
    (driver mode reports rounds=0 — no shuffle rounds happened)."""
    import time as _time
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    # materialize once: every propagation round + its convergence check
    # would otherwise re-execute the full upstream edge derivation
    sym = sym.localCheckpoint()
    if driver_threshold and sym.count() <= driver_threshold:
        t0 = _time.perf_counter()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in sym.collect():
            u, v = int(row.u), int(row.v)
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)  # min-root union
        comp_min: dict[int, int] = {}
        for n in parent:
            r = find(n)
            comp_min[r] = min(comp_min.get(r, n), n)
        out = edges.sparkSession.createDataFrame(
            sorted((n, comp_min[find(n)]) for n in parent),
            schema="node bigint, component bigint",
        )
        if stats is not None:
            stats["rounds"] = 0
            stats["round_secs"] = []
            stats["mode"] = "driver"
            stats["driver_secs"] = round(_time.perf_counter() - t0, 3)
        return out
    if stats is not None:
        stats["mode"] = "distributed"
    labels = sym.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("component")
    )
    rounds = 0
    round_secs: list[float] = []
    while True:
        rounds += 1
        t0 = _time.perf_counter()
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jump: component <- min(component, component's component)
        # — labels are also a node->label map, so one self-join halves
        # every label-chain's length (classic path compression)
        jump = stepped.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        new_labels = (
            stepped.join(jump, stepped.component == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("jcomp", F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # cut the growing lineage
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        round_secs.append(round(_time.perf_counter() - t0, 2))
        labels = new_labels
        if changed == 0:
            if stats is not None:
                stats["rounds"] = rounds
                stats["round_secs"] = round_secs
            return labels


@query(
    "dedup_canonical_clusters",
    oracle=f"""
    {_CC_PAIRS_SQL.format(tau=_CC_TAU)},
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    reach (src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    members AS (
      SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
      FROM reach GROUP BY src
    )
    SELECT doc_id, canonical_id,
           CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS cluster_size
    FROM members
    """,
    operators=("G5", "G4", "C1", "D1"),
)
def dedup_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each near-dup doc mapped to its cluster's min doc_id (the canonical
    keeper). WITH RECURSIVE needs DuckDB to seed the recursion, so the
    oracle uses transitive closure; Spark uses the scalable propagation."""
    docs = load(spark, sf_dir, "documents")
    comp = connected_components(shingle_jaccard_edges(docs, _CC_TAU))
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
    )


def simhash_fast(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scale path for xxhash64-mode signatures: the expression form
    explodes (doc, token, bit) — a 64x row amplification through the
    vote groupBy (1.9B shuffle rows per 1M docs, 18 s measured). Here
    the JVM hashes tokens, ONE groupBy collects each doc's hash list
    (30M rows, not 1.9B), and the per-doc vote/sign/pack runs in numpy.
    Bit-identical to simhash(hash_fn='xxhash64') — Java's arithmetic
    >> only differs from the logical shift in bits that & 1 discards,
    and the packed signature's two's-complement value is reproduced
    exactly (pytest parity). The md5-mode expression form stays the
    oracle-replayable path for the registered queries."""
    import numpy as np
    import pandas as pd

    hashed = docs.select(
        F.col(id_col), F.explode(TX.tokens(text_col)).alias("tok")
    ).select(id_col, F.xxhash64("tok").alias("th"))
    grouped = hashed.groupBy(id_col).agg(F.collect_list("th").alias("ths"))

    def sig(batches):
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for ths in pdf["ths"]:
                h = np.asarray(ths, dtype=np.int64).view(np.uint64)
                bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sb = votes > 0
                low = int((sb[:63].astype(np.uint64) << shifts[:63]).sum())
                out.append(low - (1 << 63) if sb[63] else low)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return grouped.mapInPandas(sig, schema=f"{id_col} long, simhash long")


# ---------------------------------------------------------------------------
# G5 SimHash banding: complete the SimHash dedup path (simhash() above
# computes signatures; this finds the candidate pairs). Split the 64-bit
# signature into 4 x 16-bit bands -> equi-join per band -> exact hamming
# (bit_count(xor)) <= threshold filter. Pigeonhole gives PROVABLE recall:
# any pair within hamming distance 3 differs in <= 3 bands, so at least
# one band matches exactly — the banded equi-join cannot miss it (the
# pytest asserts this against brute-force hamming). All pure bit-op
# Column expressions; the only shuffle is the per-band equi-join, linear
# in corpus size like the MinHash path.
# ---------------------------------------------------------------------------
_SIMHASH_HAM_T = 3


def simhash_band_pairs(
    signatures: DataFrame, id_col: str = "doc_id", sig_col: str = "simhash",
    bands: int = 4, max_hamming: int = _SIMHASH_HAM_T, nbits: int = 64,
) -> DataFrame:
    """(a_id, b_id, hamming) candidate pairs from banded signatures.
    Guaranteed to contain every pair with hamming <= bands - 1."""
    width = nbits // bands
    banded = signatures.select(
        F.col(id_col),
        F.col(sig_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.expr(
                        f"(CAST({sig_col} AS BIGINT) >> {b * width}) "
                        f"& {(1 << width) - 1}"
                    ).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, sig_col, "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            ).cast("bigint").alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


@query(
    "simhash_band_dedup_pairs",
    # md5-mode signatures are DuckDB-replayable, so the WHOLE banded path
    # (band equi-join + xor/bit_count hamming) carries a value-level
    # oracle. 60-bit sigs -> 4 bands x 15 bits; pigeonhole recall holds
    # identically (hamming <= 3 differs in <= 3 of 4 bands).
    oracle=f"""
    WITH {_SIMHASH_MD5_SIGS_SQL.format(lim=200)},
    banded AS (
      SELECT doc_id, simhash, b.band,
             (simhash >> (b.band * 15)) & 32767 AS key
      FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b USING (band, key)
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_HAM_T}
    """,
    operators=("G5", "H4", "C7"),
)
def simhash_band_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_band_pairs(simhash(docs, hash_fn="md5"), nbits=60)


# ---------------------------------------------------------------------------
# G5 incremental ingest dedup: dedup a NEW batch against the existing
# corpus without ever self-joining the corpus. Both sides band their
# signatures; the equi-join is new-batch-sized on one side, so each
# micro-batch of ingest costs O(|batch| x bucket_occupancy), never
# O(|corpus|^2) — the shape that lets a 100 TB corpus absorb daily
# increments. In production the corpus side is a persisted band index
# (bucketed parquet keyed on (band, key)); here it derives inline from
# the same fixture for the oracle's benefit.
# ---------------------------------------------------------------------------
_INCR_NEW_SOURCES = ("src0", "src1", "src2")


def simhash_band_pairs_between(
    new_sigs: DataFrame, corpus_sigs: DataFrame,
    id_col: str = "doc_id", sig_col: str = "simhash",
    bands: int = 4, max_hamming: int = _SIMHASH_HAM_T, nbits: int = 64,
) -> DataFrame:
    """(new_id, corpus_id, hamming) pairs across two signature sets.
    Same pigeonhole recall as simhash_band_pairs: any cross pair with
    hamming <= bands - 1 shares at least one exact band."""
    width = nbits // bands

    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(out_id),
            F.col(sig_col).alias(f"_{out_id}_sig"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(CAST({sig_col} AS BIGINT) >> {b * width}) "
                            f"& {(1 << width) - 1}"
                        ).alias("key"),
                    )
                    for b in range(bands)
                ])
            ).alias("bk"),
        ).select(out_id, f"_{out_id}_sig", "bk.band", "bk.key")

    pairs = (
        banded(new_sigs, "new_id")
        .join(banded(corpus_sigs, "corpus_id"), ["band", "key"])
        .select(
            "new_id",
            "corpus_id",
            F.bit_count(
                F.col("_new_id_sig").bitwiseXOR(F.col("_corpus_id_sig"))
            ).cast("bigint").alias("hamming"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


@query(
    "incremental_simhash_dedup",
    oracle=f"""
    WITH {_SIMHASH_MD5_SIGS_SQL.format(lim=200)},
    tagged AS (
      SELECT s.doc_id, s.simhash,
             d.source IN {_INCR_NEW_SOURCES} AS is_new
      FROM sigs s JOIN documents d USING (doc_id)
    ),
    banded AS (
      SELECT doc_id, simhash, is_new, b.band,
             (simhash >> (b.band * 15)) & 32767 AS key
      FROM tagged CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
    )
    SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id,
           CAST(bit_count(xor(n.simhash, o.simhash)) AS BIGINT) AS hamming
    FROM banded n JOIN banded o USING (band, key)
    WHERE n.is_new AND NOT o.is_new
      AND bit_count(xor(n.simhash, o.simhash)) <= {_SIMHASH_HAM_T}
    """,
    operators=("G5", "H4", "C1"),
)
def incremental_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sigs = simhash(docs, hash_fn="md5").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    is_new = F.col("source").isin(*_INCR_NEW_SOURCES)
    return simhash_band_pairs_between(
        sigs.filter(is_new), sigs.filter(~is_new), nbits=60
    )


# ---------------------------------------------------------------------------
# G5 MinHash with engine-replayable hashes: 8 permutation hashes from
# md5(p:shingle) (same conv/byteswap bridge as the md5 simhash mode), 4
# bands x 2 rows, band equi-join, and the minhash Jaccard ESTIMATE
# (fraction of agreeing permutations) — every stage value-checked by the
# DuckDB oracle, unlike the pyspark.ml MinHashLSH twin whose seeded JVM
# hashes are not replayable (minhash_dedup_pairs stays the fast-path
# demo; this is the auditable path). Long-format plan: one shingle
# explode x 8 permutations -> per-(doc, p) min -> per-(doc, band) key;
# every shuffle is keyed, the candidate join is banded equi, and the
# estimate join touches only candidate pairs x 8 rows.
# ---------------------------------------------------------------------------
_MINHASH_P = 8
_MINHASH_BANDS = 4  # 2 rows per band
_MINHASH_LIM = 200



@query(
    "minhash_banded_pairs_md5",
    bench=True,  # G5 bench representative (oracle-backed; see note above)
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
      FROM documents WHERE doc_id < {_MINHASH_LIM}
    ),
    hp AS (
      SELECT doc_id, p,
        CAST((
          (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
          (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
          (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
          (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
          (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
          (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
          (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
          CAST((u >> 56) & 255 AS HUGEINT)
        ) // 16 AS BIGINT) AS th
      FROM (
        SELECT doc_id, p.p AS p,
               md5_number_upper(CAST(p.p AS VARCHAR) || ':' || g) AS u
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASH_P - 1})) AS p) p
      )
    ),
    mhp AS (SELECT doc_id, p, min(th) AS mh FROM hp GROUP BY doc_id, p),
    banded AS (
      SELECT doc_id, p // 2 AS band,
             string_agg(CAST(mh AS VARCHAR), ':' ORDER BY p) AS key
      FROM mhp GROUP BY doc_id, p // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM banded a JOIN banded b USING (band, key)
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.a_id, c.b_id,
           round(avg(CASE WHEN ma.mh = mb.mh THEN 1.0 ELSE 0.0 END), 4)
             AS est_jaccard
    FROM cand c
    JOIN mhp ma ON ma.doc_id = c.a_id
    JOIN mhp mb ON mb.doc_id = c.b_id AND mb.p = ma.p
    GROUP BY c.a_id, c.b_id
    """,
    # C9: the candidate stage is a self-join pairing — `banded` aliased
    # a/b, equi-joined on (band, key) with a_id < b_id ordering.
    operators=("G5", "H4", "C1", "D1", "C9"),
)
def minhash_banded_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _MINHASH_LIM)
    return minhash_banded_pairs_df(docs)


def minhash_banded_pairs_df(docs: DataFrame) -> DataFrame:
    """The banded-MinHash pipeline on ANY (doc_id, text) frame — the
    registered query above runs it on the (_MINHASH_LIM-capped, oracle-
    replayable) fixture; tools/minhash_scale_probe.py runs the SAME code
    at 1M/10M docs. Shape: shingle -> P md5 permutations -> per-(doc, p)
    min -> band keys -> (band, key) equi-join for candidates -> signature
    re-join verify. Every stage is a keyed groupBy/join — never
    all-pairs."""
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("g"),
    )
    hp = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_MINHASH_P - 1))).alias("p"),
        "g",
    ).select(
        "doc_id",
        "p",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("p").cast("string"), F.lit(":"), F.col("g"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("th"),
    )
    mhp = hp.groupBy("doc_id", "p").agg(F.min("th").alias("mh"))
    banded = (
        mhp.withColumn("band", F.expr("p div 2"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ":",
                F.min(F.when(F.col("p") % 2 == 0, F.col("mh"))).cast("string"),
                F.min(F.when(F.col("p") % 2 == 1, F.col("mh"))).cast("string"),
            ).alias("key")
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    ma = mhp.select(
        F.col("doc_id").alias("a_id"), "p", F.col("mh").alias("mh_a")
    )
    mb = mhp.select(
        F.col("doc_id").alias("b_id"), "p", F.col("mh").alias("mh_b")
    )
    return (
        cand.join(ma, "a_id")
        .join(mb, ["b_id", "p"])
        .groupBy("a_id", "b_id")
        .agg(
            F.round(
                F.avg(F.when(F.col("mh_a") == F.col("mh_b"), 1.0).otherwise(0.0)),
                4,
            ).alias("est_jaccard")
        )
    )


def minhash_banded_pairs_fast(docs: DataFrame) -> DataFrame:
    """Production twin of minhash_banded_pairs_df: same banding scheme
    (P=8 permutations, 4 bands of 2), same output schema
    (a_id, b_id, est_jaccard), with the two measured hot spots removed:

    - permutations are P xxhash64 COLUMNS per (doc, shingle) row
      (JVM-side, seeded by permutation id) instead of a P-way row
      explode + md5+conv — the shingle stream is never amplified;
    - the verify stage compares the two 8-slot signature ARRAYS with
      one zip_with fold instead of re-joining per permutation.

    xxhash64 is not replayable in DuckDB, so this twin is NOT a
    registered query — the md5 form keeps the value oracle; this one
    is pinned by planted-corpus recall (pytest + the scale probes:
    same 0.98 recall, ~3x cheaper at 10M docs) and by the exact-dup
    invariant (identical shingle sets always pair at est_jaccard=1).
    The hash function is the standard speed-vs-replayability knob at
    100 TB; both paths share every downstream consumer (CC, survivors,
    cross-source matrix)."""
    P = _MINHASH_P
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("g"),
    )
    sig = (
        sh.select(
            "doc_id",
            *[F.xxhash64(F.lit(p), F.col("g")).alias(f"h{p}") for p in range(P)],
        )
        .groupBy("doc_id")
        .agg(*[F.min(f"h{p}").alias(f"m{p}") for p in range(P)])
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            F.col(f"m{2 * b}").cast("string"),
                            F.col(f"m{2 * b + 1}").cast("string"),
                        ).alias("key"),
                    )
                    for b in range(P // 2)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    arr = F.array(*[F.col(f"m{p}") for p in range(P)])
    sa = sig.select(F.col("doc_id").alias("a_id"), arr.alias("sa"))
    sb = sig.select(F.col("doc_id").alias("b_id"), arr.alias("sb"))
    est = F.round(
        F.aggregate(
            F.zip_with(
                "sa", "sb", lambda x, y: F.when(x == y, 1.0).otherwise(0.0)
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        / F.lit(float(P)),
        4,
    )
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", est.alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# Signature-level MinHash API (round-10 verdict #7, incremental append):
# the banded pipelines above fuse shingle->sig->band->verify into one
# plan; the incremental path needs the SIGNATURE as a first-class,
# persistable artifact so appending a delta never re-shingles the
# corpus — sigs are computed once per doc at ingest (cost ∝ delta),
# stored as one 8-slot bigint array per doc (~72 B/doc — 10B docs is
# ~720 GB of narrow columnar state, scanned only by keyed equi-joins),
# and bands re-derive from sigs without touching text. Both hashers
# produce the same schema; 'md5' slots equal the registered oracle
# pipeline's mhp stage, 'fast' equals minhash_banded_pairs_fast's.
# ---------------------------------------------------------------------------
def minhash_sigs(docs: DataFrame, hasher: str = "fast") -> DataFrame:
    """(doc_id, sig array<bigint>) — the P=8 min-perm signature of each
    doc's distinct 3-word shingles. Docs with < 3 words have no
    shingles and NO sig row (they can never near-dup pair — identical
    to the fused pipelines, where they vanish at the explode)."""
    P = _MINHASH_P
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("g"),
    )
    if hasher == "fast":
        return (
            sh.select(
                "doc_id",
                *[
                    F.xxhash64(F.lit(p), F.col("g")).alias(f"h{p}")
                    for p in range(P)
                ],
            )
            .groupBy("doc_id")
            .agg(
                F.array(
                    *[F.min(f"h{p}") for p in range(P)]
                ).alias("sig")
            )
        )
    if hasher == "md5":
        hp = sh.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(P - 1))).alias("p"),
            "g",
        ).select(
            "doc_id",
            "p",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("p").cast("string"), F.lit(":"), F.col("g")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("th"),
        )
        return (
            hp.groupBy("doc_id")
            .agg(
                F.array(
                    *[
                        F.min(F.when(F.col("p") == p, F.col("th")))
                        for p in range(P)
                    ]
                ).alias("sig")
            )
        )
    raise ValueError(f"unknown hasher {hasher!r} (use 'fast' or 'md5')")


def minhash_bands_hashed(sigs: DataFrame, id_out: str = "doc_id") -> DataFrame:
    """(id, band, key) with a NUMERIC key — xxhash64 over the band's two
    sig slots instead of the string concat. Used for the ingest
    service's persisted corpus-band cache: joining 40M+ cached band
    rows on (int, bigint) is markedly cheaper than hashing 30-byte
    strings, and a (vanishingly rare) xxhash64 collision can only ADD a
    candidate pair — the exact est_jaccard verify on the full sigs
    removes it, so pair results are identical to the string scheme."""
    P = _MINHASH_P
    return sigs.select(
        F.col("doc_id").alias(id_out),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.col("sig")[2 * b], F.col("sig")[2 * b + 1]
                        ).alias("key"),
                    )
                    for b in range(P // 2)
                ]
            )
        ).alias("bk"),
    ).select(id_out, "bk.band", "bk.key")


def _minhash_bands_of_sigs(sigs: DataFrame, id_out: str = "doc_id") -> DataFrame:
    """(id, band, key) from a sig frame — 2 slots per band, P//2 bands,
    the exact banding scheme of both fused pipelines."""
    P = _MINHASH_P
    return sigs.select(
        F.col("doc_id").alias(id_out),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            F.col("sig")[2 * b].cast("string"),
                            F.col("sig")[2 * b + 1].cast("string"),
                        ).alias("key"),
                    )
                    for b in range(P // 2)
                ]
            )
        ).alias("bk"),
    ).select(id_out, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _minhash_est(sa: str, sb: str):
    P = _MINHASH_P
    return F.round(
        F.aggregate(
            F.zip_with(
                sa, sb, lambda x, y: F.when(x == y, 1.0).otherwise(0.0)
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        / F.lit(float(P)),
        4,
    )


def minhash_pairs_within(sigs: DataFrame) -> DataFrame:
    """(a_id, b_id, est_jaccard) candidate pairs WITHIN one sig frame —
    band equi-join for candidates, one array fold to verify. Same
    banding + estimate arithmetic as the fused pipelines (est is an
    exact multiple of 1/8 on every engine, so the value is
    hash-scheme-exact, not float-fuzzy)."""
    banded = _minhash_bands_of_sigs(sigs)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("sb"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", _minhash_est("sa", "sb").alias("est_jaccard"))
    )


def minhash_pairs_between(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    broadcast_new: bool = True,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard) candidate pairs BETWEEN a delta
    sig frame and the persisted corpus sigs — the incremental dedup
    join: candidates are a (band, key) equi-join (the corpus side is
    narrow persisted state, never re-shingled text), verification
    touches candidates only.

    ``broadcast_new`` (default) is the incremental-append shape: the
    delta is small BY CONSTRUCTION (that's what makes it a delta), so
    its band keys and the candidate set broadcast, and the corpus side
    — bands derived from the sig scan, then the sig re-read for the
    verify — STREAMS through two broadcast-hash joins with no corpus
    shuffle at all (measured at 10M corpus + 100k delta: the corpus
    never moves). A corpus-sized 'delta' should use the symmetric
    within-join (or run()) instead; pass broadcast_new=False to force
    shuffle joins on both sides."""
    maybe_bc = F.broadcast if broadcast_new else (lambda df: df)
    # ``corpus_bands``: a pre-derived/persisted (corpus_id, band, key)
    # frame (the ingest service's rolling cache) — skips re-deriving
    # band keys per corpus row on every append. The delta side MUST use
    # the same key encoding; a bigint key marks the hashed scheme
    # (minhash_bands_hashed), a string key the canonical concat.
    if corpus_bands is not None:
        bc = corpus_bands
        hashed = dict(corpus_bands.dtypes).get("key") == "bigint"
        bn = (
            minhash_bands_hashed(new_sigs, id_out="new_id")
            if hashed
            else _minhash_bands_of_sigs(new_sigs, id_out="new_id")
        )
    else:
        bn = _minhash_bands_of_sigs(new_sigs, id_out="new_id")
        bc = _minhash_bands_of_sigs(corpus_sigs, id_out="corpus_id")
    cand = (
        bc.join(maybe_bc(bn), ["band", "key"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    sn = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sa"))
    sc = corpus_sigs.select(
        F.col("doc_id").alias("corpus_id"), F.col("sig").alias("sb")
    )
    # corpus sigs stream against the broadcast candidate set first, so
    # the verify join also never shuffles the corpus side
    return (
        sc.join(maybe_bc(cand), "corpus_id")
        .join(maybe_bc(sn), "new_id")
        .select(
            "new_id", "corpus_id", _minhash_est("sa", "sb").alias("est_jaccard")
        )
    )


def minhash_pairs_between_state(
    new_sigs: DataFrame,
    state,
    broadcast_new: bool = True,
    n_new: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard) candidates BETWEEN a delta sig
    frame and a bucketed ``CorpusSigState`` — the bucket-sharded twin
    of ``minhash_pairs_between`` (round-13 verdict #1), pair-set
    IDENTICAL to it (pytest-pinned): bucket pruning only removes rows
    that cannot equi-join (same xxhash64, same modulus on both sides).

    Two point-read prunes, both adaptive (skipped for corpus-sized
    inputs, where they cannot help):

    1. CANDIDATE scan: the delta's band keys name their buckets (one
       tiny distinct over ≤4·|delta| cached rows); the corpus band
       scan batch-prunes to those buckets — ∝ touched buckets, flat in
       corpus size for a bounded delta.
    2. VERIFY scan: the candidate set (persisted once — the band join
       runs exactly once) names its corpus ids' buckets; the corpus
       SIG scan prunes the same way. An empty candidate set returns
       without touching the sig state at all.
    """
    from cloudvectordb_spark.operators.sigstate import _PRUNE_MAX, band_bucket

    spark = new_sigs.sparkSession
    maybe_bc = F.broadcast if broadcast_new else (lambda df: df)
    # the delta side uses the SAME band-folded single bigint join key
    # as the state cache (sigstate._bucketize): one-key probes take the
    # LongHashedRelation fast path (10× over the composite probe)
    bn = minhash_bands_hashed(new_sigs, id_out="new_id").select(
        "new_id", F.xxhash64("band", "key").alias("bk")
    )
    prune_bound = min(state.nb // 2, _PRUNE_MAX)
    touched = None
    if n_new is not None and 4 * n_new <= prune_bound:
        # ≤4 band rows per doc — worth ONE small job to learn the
        # touched set only when it could actually prune (the state
        # accessor re-checks the realized size and skips an IN-list
        # that grew past the batch-stat sweet spot)
        tb = (
            bn.select(band_bucket(F.col("bk"), state.nb).alias("b"))
            .distinct()
            .collect()
        )
        touched = [int(r.b) for r in tb]
    import time as _time

    t0 = _time.perf_counter()
    cand = (
        state.bands(touched)
        .join(maybe_bc(bn), ["bk"])
        .select("new_id", "corpus_id")
        .distinct()
        .persist()
    )
    state.defer_release(cand)
    n_cand = cand.count()
    if stats is not None:
        stats["cand_scan_s"] = round(_time.perf_counter() - t0, 2)
        stats["n_cand"] = n_cand
        stats["touched_buckets"] = len(touched) if touched is not None else -1
    if n_cand == 0:
        return spark.createDataFrame(
            [], schema="new_id long, corpus_id long, est_jaccard double"
        )
    touched_ids = None
    if n_cand <= prune_bound:
        ti = (
            cand.select(band_bucket(F.col("corpus_id"), state.nb).alias("b"))
            .distinct()
            .collect()
        )
        touched_ids = [int(r.b) for r in ti]
    sn = new_sigs.select(F.col("doc_id").alias("new_id"), F.col("sig").alias("sa"))
    sc = state.sigs(touched_ids).select(
        F.col("doc_id").alias("corpus_id"), F.col("sig").alias("sb")
    )
    return (
        sc.join(maybe_bc(cand), "corpus_id")
        .join(maybe_bc(sn), "new_id")
        .select(
            "new_id", "corpus_id", _minhash_est("sa", "sb").alias("est_jaccard")
        )
    )


def minhash_pairs_between_sharded(
    new_sigs: DataFrame,
    sstate,
    concurrent: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """(new_id, corpus_id, est_jaccard) candidates BETWEEN a delta and
    an S-shard ``ShardedSigState`` — the scatter-gather fleet path for
    the mid-size-delta regime (round-13 verdict #2 → round 14):

    - SCATTER: the delta's band keys route by bucket to their owning
      shard's contiguous range; each shard joins ONLY its keys against
      its range-pruned band scan (∝ state/S rows read — the sorted
      bucketed cache's batch min/max stats skip every other shard's
      batches). The S legs submit from S driver threads, mirroring
      ``search_sharded``: on a fleet each leg is a different machine's
      local scan.
    - GATHER: the union of S bounded candidate sets. The verify join
      routes candidate corpus_ids the same way (sbucket ranges), so
      the sig point-reads are range-pruned per shard too.

    Pair-set IDENTICAL to ``minhash_pairs_between_state`` /
    ``minhash_pairs_between`` (pytest-pinned): the shard ranges
    partition bucket space, and bucket is a pure function of the join
    key on both sides, so every equi-joinable (delta key, corpus key)
    pair meets in exactly one shard. Unlike the ≤_PRUNE_MAX IN-list,
    range predicates stay cheap no matter how many buckets a 10k-doc
    delta touches — per-shard scan cost is ∝ state/S where the
    single-state probe pays the full band scan.

    ``stats`` (optional) receives per-shard scatter walls and
    candidate counts — the evidence ``tools/sigshard_probe.py``
    records."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from cloudvectordb_spark.operators.sigstate import band_bucket

    spark = new_sigs.sparkSession
    bn = (
        minhash_bands_hashed(new_sigs, id_out="new_id")
        .select("new_id", F.xxhash64("band", "key").alias("bk"))
        .withColumn("bucket", band_bucket(F.col("bk"), sstate.nb))
        .persist()
    )
    sstate.state.defer_release(bn)
    bn.count()

    def scatter(s: int):
        lo, hi = sstate.ranges[s]
        keys = bn.filter((F.col("bucket") >= lo) & (F.col("bucket") < hi))
        t0 = _time.perf_counter()
        cand_s = (
            sstate.bands_shard(s)
            .join(F.broadcast(keys.select("new_id", "bk")), ["bk"])
            .select("new_id", "corpus_id")
            .distinct()
            .persist()
        )
        n = cand_s.count()
        return s, cand_s, n, round(_time.perf_counter() - t0, 3)

    if concurrent and sstate.n_shards > 1:
        with ThreadPoolExecutor(max_workers=sstate.n_shards) as pool:
            legs = list(pool.map(scatter, range(sstate.n_shards)))
    else:
        legs = [scatter(s) for s in range(sstate.n_shards)]
    legs.sort(key=lambda t: t[0])
    if stats is not None:
        stats["per_shard_cand_s"] = [t[3] for t in legs]
        stats["per_shard_n_cand"] = [t[2] for t in legs]
    cands = [c for _, c, n, _ in legs if n]
    for _, c, _, _ in legs:
        sstate.state.defer_release(c)
    if not cands:
        return spark.createDataFrame(
            [], schema="new_id long, corpus_id long, est_jaccard double"
        )
    # Delta-sized and broadcast into EVERY verify leg — persist once so
    # the S legs share one signature computation instead of re-deriving
    # the delta tokenize+minhash per leg (round 15: the un-persisted
    # frame put S copies of that subtree in the gather plan; executed
    # scans dropped ~4x at S=4). Released with the other deferred
    # frames on the state's release_pending().
    sn = new_sigs.select(
        F.col("doc_id").alias("new_id"), F.col("sig").alias("sa")
    ).persist()
    sstate.state.defer_release(sn)

    def verify(s: int, cand_s: DataFrame) -> DataFrame:
        # candidate corpus ids route by SBUCKET — each verify leg reads
        # only shards whose sig range can hold its candidates
        routed = cand_s.withColumn(
            "sb", band_bucket(F.col("corpus_id"), sstate.nb)
        )
        lo, hi = sstate.ranges[s]
        mine = routed.filter(
            (F.col("sb") >= lo) & (F.col("sb") < hi)
        ).select("new_id", "corpus_id")
        sc = sstate.sigs_shard(s).select(
            F.col("doc_id").alias("corpus_id"), F.col("sig").alias("sb_sig")
        )
        return (
            sc.join(F.broadcast(mine), "corpus_id")
            .join(F.broadcast(sn), "new_id")
            .select(
                "new_id",
                "corpus_id",
                _minhash_est("sa", "sb_sig").alias("est_jaccard"),
            )
        )

    from functools import reduce as _reduce

    # gather dedup: the same pair can surface in TWO shards (different
    # bands of one pair route to different buckets) — the coordinator
    # dedups the bounded union, like the unsharded path's distinct().
    # Persisted (bounded: ≤ |candidate pairs| rows) so the S verify
    # legs share one distinct pass instead of re-running the
    # union+exchange per leg (round 15).
    all_cand = _reduce(DataFrame.unionByName, cands).distinct().persist()
    sstate.state.defer_release(all_cand)
    out = [verify(s, all_cand) for s in range(sstate.n_shards)]
    return _reduce(DataFrame.unionByName, out)


@query(
    "minhash_incremental_pairs",
    # the incremental-append join (CorpusPipeline.append's dedup stage)
    # value-oracled end to end: md5 signatures for a parity-split
    # new/corpus partition, banded (band, key) equi-join BETWEEN the
    # frames, est_jaccard from the 8-slot agreement — DuckDB replays
    # every stage (same md5 bridge as minhash_banded_pairs_md5)
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
      FROM documents WHERE doc_id < 500
    ),
    hp AS (
      SELECT doc_id, p,
        CAST((
          (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
          (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
          (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
          (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
          (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
          (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
          (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
          CAST((u >> 56) & 255 AS HUGEINT)
        ) // 16 AS BIGINT) AS th
      FROM (
        SELECT doc_id, p.p AS p,
               md5_number_upper(CAST(p.p AS VARCHAR) || ':' || g) AS u
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) p
      )
    ),
    mhp AS (SELECT doc_id, p, min(th) AS mh FROM hp GROUP BY doc_id, p),
    banded AS (
      SELECT doc_id, p // 2 AS band,
             string_agg(CAST(mh AS VARCHAR), ':' ORDER BY p) AS key
      FROM mhp GROUP BY doc_id, p // 2
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
      FROM banded n JOIN banded o USING (band, key)
      WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
    )
    SELECT c.new_id, c.corpus_id,
           round(avg(CASE WHEN ma.mh = mb.mh THEN 1.0 ELSE 0.0 END), 4)
             AS est_jaccard
    FROM cand c
    JOIN mhp ma ON ma.doc_id = c.new_id
    JOIN mhp mb ON mb.doc_id = c.corpus_id AND mb.p = ma.p
    GROUP BY c.new_id, c.corpus_id
    """,
    operators=("G5", "H4", "C1", "D1"),
)
def minhash_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 incremental: the delta-vs-corpus banded join that gives
    CorpusPipeline.append its cost-∝-delta dedup — new docs (odd ids,
    standing in for an arriving batch) match against the corpus frame
    (even ids, standing in for the persisted signature state) without
    any within-frame pairing."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    sigs = minhash_sigs(docs, hasher="md5")
    return minhash_pairs_between(
        sigs.filter(F.col("doc_id") % 2 == 1),
        sigs.filter(F.col("doc_id") % 2 == 0),
    )


def _ensure_sig_state_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per fixture generation) an on-disk dedup-state dir
    holding the EVEN-doc_id corpus sigs — the persisted signature
    state the sharded scatter-gather query probes. Same
    fingerprint+lock discipline as ensure_text_index."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    from cloudvectordb_spark.cache import build_lock, source_tag

    src = os.path.join(sf_dir, "documents.parquet")
    fp = hashlib.md5(f"sigstate-v1|{source_tag(src)}".encode()).hexdigest()[:16]
    root = os.path.join(
        tempfile.gettempdir(), "cloudvectordb_sigstate", fp
    )
    if os.path.exists(os.path.join(root, "_DONE")):
        return root
    with build_lock(root):
        if os.path.exists(os.path.join(root, "_DONE")):
            return root
        build = f"{root}.build{os.getpid()}_{uuid.uuid4().hex[:8]}"
        docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
        minhash_sigs(
            docs.filter(F.col("doc_id") % 2 == 0), hasher="md5"
        ).write.mode("overwrite").parquet(os.path.join(build, "sigs"))
        open(os.path.join(build, "_DONE"), "w").close()
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    return root


@query(
    "minhash_sharded_state_pairs",
    # the SAME result set as minhash_incremental_pairs, produced by the
    # round-14 scatter-gather fleet path: the corpus sigs live in a
    # persisted bucket-sorted state, 4 bucket-range shards each probe
    # only their range (batch-stat pruned), and the gather unions the
    # bounded candidate sets. DuckDB replays the logical join — shard
    # routing is physical only, so the oracle is the incremental one.
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
      FROM documents WHERE doc_id < 500
    ),
    hp AS (
      SELECT doc_id, p,
        CAST((
          (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
          (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
          (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
          (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
          (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
          (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
          (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
          CAST((u >> 56) & 255 AS HUGEINT)
        ) // 16 AS BIGINT) AS th
      FROM (
        SELECT doc_id, p.p AS p,
               md5_number_upper(CAST(p.p AS VARCHAR) || ':' || g) AS u
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) p
      )
    ),
    mhp AS (SELECT doc_id, p, min(th) AS mh FROM hp GROUP BY doc_id, p),
    banded AS (
      SELECT doc_id, p // 2 AS band,
             string_agg(CAST(mh AS VARCHAR), ':' ORDER BY p) AS key
      FROM mhp GROUP BY doc_id, p // 2
    ),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
      FROM banded n JOIN banded o USING (band, key)
      WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0
    )
    SELECT c.new_id, c.corpus_id,
           round(avg(CASE WHEN ma.mh = mb.mh THEN 1.0 ELSE 0.0 END), 4)
             AS est_jaccard
    FROM cand c
    JOIN mhp ma ON ma.doc_id = c.new_id
    JOIN mhp mb ON mb.doc_id = c.corpus_id AND mb.p = ma.p
    GROUP BY c.new_id, c.corpus_id
    """,
    operators=("G5", "H4", "C1", "D1"),
)
def minhash_sharded_state_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 fleet shape: the delta (odd ids) probes a PERSISTED
    bucket-sorted signature state through 4 bucket-range shards —
    scatter (per-shard range-pruned band join), gather (dedup union),
    range-routed sig verify. Value-identical to the single-state and
    classic incremental joins (the shard ranges partition bucket
    space); the oracle replays the logical join."""
    from cloudvectordb_spark.operators.sigstate import sharded_sig_state

    sd = _ensure_sig_state_dir(spark, sf_dir)
    sstate = sharded_sig_state(spark, sd, 4)
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 500) & (F.col("doc_id") % 2 == 1)
    )
    return minhash_pairs_between_sharded(
        minhash_sigs(docs, hasher="md5"), sstate
    )


# ---------------------------------------------------------------------------
# Dedup analytics: cross-source duplication matrix — for every source
# pair, how many near-dup pairs cross it. The triage view a corpus
# owner reads before deciding which source to drop or down-weight
# (mirror sites show up as hot off-diagonal cells). Reuses the banded
# md5-simhash pairs (value-level oracle) joined twice to sources; the
# matrix is |sources|^2 rows, tiny at any corpus size.
# ---------------------------------------------------------------------------
@query(
    "dup_cross_source_matrix",
    oracle=f"""
    WITH {_SIMHASH_MD5_SIGS_SQL.format(lim=200)},
    banded AS (
      SELECT doc_id, simhash, b.band,
             (simhash >> (b.band * 15)) & 32767 AS key
      FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM banded a JOIN banded b USING (band, key)
      WHERE a.doc_id < b.doc_id
        AND bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_HAM_T}
    )
    SELECT least(da.source, db.source)    AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_dup_pairs
    FROM pairs
    JOIN documents da ON da.doc_id = a_id
    JOIN documents db ON db.doc_id = b_id
    GROUP BY 1, 2
    """,
    operators=("G5", "H4", "C1", "D1", "B8"),
)
def dup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = simhash_band_pairs(simhash(docs, hash_fn="md5"), nbits=60)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_dup_pairs"))
    )


# ---------------------------------------------------------------------------
# G4 at CHUNK granularity: fixed 20-token non-overlapping chunks,
# hashed exactly; a chunk seen in more than one document is boilerplate
# (headers, navboxes, license blocks), and a doc's duplicated-chunk
# fraction is the removal signal — the sub-document dedup pass of
# C4-style pipelines, complementing doc-level exact/near dedup. Explode
# -> two keyed aggregations; chunk hashes are 8-byte xxhash64 on the
# Spark side and full strings in the oracle (only the BOOLEAN
# "duplicated" status must agree, making the hash choice free).
# ---------------------------------------------------------------------------
_CHUNK_TOKENS = 20


@query(
    "chunk_level_dup_fraction",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) // {_CHUNK_TOKENS}, 0)),
               i -> array_to_string(
                      (string_split(text, ' '))[(i - 1) * {_CHUNK_TOKENS} + 1 : i * {_CHUNK_TOKENS}],
                      ' '))) AS chunk
      FROM documents
    ),
    freq AS (
      SELECT chunk, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           round(sum(CASE WHEN f.ndocs > 1 THEN 1.0 ELSE 0.0 END) / count(*), 6)
             AS dup_chunk_frac
    FROM chunks c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
    operators=("G4", "H1", "H4", "H7", "H8", "D1", "D3"),
)
def chunk_level_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = TX.tokens("text")
    n_chunks = F.greatest(
        F.floor(F.size(t) / _CHUNK_TOKENS).cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(1), n_chunks)
    chunk_arr = F.when(n_chunks >= 1, idx).otherwise(
        F.array().cast("array<int>")
    )
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                chunk_arr,
                lambda i: F.concat_ws(
                    " ", F.slice(t, (i - 1) * _CHUNK_TOKENS + 1, _CHUNK_TOKENS)
                ),
            )
        ).alias("chunk"),
    ).select("doc_id", F.xxhash64("chunk").alias("chunk"))
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.round(
                F.sum(F.when(F.col("ndocs") > 1, 1.0).otherwise(0.0))
                / F.count("*"),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


# ---------------------------------------------------------------------------
# G5 containment dedup: directional near-dup — doc A is (almost) wholly
# CONTAINED in doc B when |shingles(A) ∩ shingles(B)| >= tau * |A|. The
# web-corpus case Jaccard misses: article + article-with-boilerplate has
# low Jaccard (union inflated by the boilerplate) but containment ~1 for
# the article side. Same inverted-index shape as the Jaccard path: only
# pairs SHARING a shingle reach the counter — an equi-join on shingle,
# never all-pairs; the size join is per-doc metadata.
# ---------------------------------------------------------------------------
_CONTAIN_TAU = 0.8
_CONTAIN_LIM = 2000


@query(
    "containment_dup_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
      FROM documents WHERE doc_id < {_CONTAIN_LIM}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
      FROM tok a JOIN tok b USING (g)
      WHERE a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.a_id, s.b_id,
           CAST(s.shared AS BIGINT) AS n_shared,
           round(s.shared / CAST(na.n AS DOUBLE), 6) AS containment
    FROM shared s JOIN sizes na ON na.doc_id = s.a_id
    WHERE s.shared >= {_CONTAIN_TAU} * na.n
    """,
    operators=("G5", "K2", "C1", "D1"),
)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs (a contained-in b) at tau=0.8 over
    word trigrams. Output (a_id, b_id, n_shared, containment)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _CONTAIN_LIM)
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("g"),
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = tok.select(F.col("doc_id").alias("a_id"), "g")
    b = tok.select(F.col("doc_id").alias("b_id"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes, shared["a_id"] == sizes["doc_id"])
        .filter(F.col("shared") >= _CONTAIN_TAU * F.col("n"))
        .select(
            "a_id",
            "b_id",
            F.col("shared").cast("bigint").alias("n_shared"),
            F.round(F.col("shared") / F.col("n").cast("double"), 6).alias(
                "containment"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: assign every doc by the md5 of its
# near-dup CLUSTER canonical, not its own id — the whole dup family
# lands on one side, so a test doc can never have a near-duplicate in
# train (the intra-corpus complement of benchmark_contamination). The
# census reports, per split, how many docs moved relative to the naive
# id-hash split — the docs the naive split was silently leaking.
# Scales: edges are the inverted-index equi-join, CC is the measured
# pointer-doubling kernel, and the split itself is a pure projection.
# ---------------------------------------------------------------------------
_SPLIT_CASE = """CASE WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                  WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                  ELSE 'test' END"""


def _split_expr(col: str):
    b = F.substring(F.md5(F.col(col).cast("string")), 1, 1)
    return F.when(b < "c", "train").when(b < "e", "val").otherwise("test")


@query(
    "leakage_safe_split_census",
    oracle=f"""
    {_CC_PAIRS_SQL.format(tau=_CC_TAU)},
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    reach (src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    members AS (
      SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
      FROM reach GROUP BY src
    ),
    tagged AS (
      SELECT d.doc_id,
             coalesce(m.canonical_id, d.doc_id) AS canonical_id,
             {_SPLIT_CASE.format(col='coalesce(m.canonical_id, d.doc_id)')} AS split,
             {_SPLIT_CASE.format(col='d.doc_id')} AS id_split
      FROM documents d LEFT JOIN members m USING (doc_id)
    )
    SELECT split,
           CAST(count(*) AS BIGINT)                    AS n_docs,
           CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters,
           CAST(count(*) FILTER (WHERE doc_id != canonical_id) AS BIGINT)
                                                        AS n_dup_members,
           CAST(count(*) FILTER (WHERE split != id_split) AS BIGINT)
                                                        AS n_moved_vs_id_split
    FROM tagged GROUP BY split
    """,
    operators=("K2", "G5", "H4", "B8", "D3"),
)
def leakage_safe_split_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    comp = connected_components(shingle_jaccard_edges(docs, _CC_TAU))
    tagged = (
        docs.select("doc_id")
        .join(
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("canonical_id"),
            ),
            "doc_id",
            "left",
        )
        .withColumn(
            "canonical_id", F.coalesce("canonical_id", F.col("doc_id"))
        )
        .withColumn("split", _split_expr("canonical_id"))
        .withColumn("id_split", _split_expr("doc_id"))
    )
    return tagged.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("canonical_id").cast("bigint").alias("n_clusters"),
        F.count(F.when(F.col("doc_id") != F.col("canonical_id"), 1))
        .cast("bigint")
        .alias("n_dup_members"),
        F.count(F.when(F.col("split") != F.col("id_split"), 1))
        .cast("bigint")
        .alias("n_moved_vs_id_split"),
    )


# ---------------------------------------------------------------------------
# The leakage AUDIT that motivates the canonical split: count near-dup
# pairs straddling the split boundary under (a) the naive id-hash
# assignment — nonzero on any corpus with dup families — and (b) the
# canonical assignment — structurally zero, because both ends of every
# edge share a canonical and therefore a side. Both counts ride the
# value oracle: a regression that breaks family-atomic assignment
# fails the hash, not just an eyeball.
# ---------------------------------------------------------------------------
@query(
    "split_leakage_audit",
    oracle=f"""
    {_CC_PAIRS_SQL.format(tau=_CC_TAU)},
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    reach (src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    members AS (
      SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
      FROM reach GROUP BY src
    ),
    tagged AS (
      SELECT d.doc_id,
             {_SPLIT_CASE.format(col='coalesce(m.canonical_id, d.doc_id)')} AS split,
             {_SPLIT_CASE.format(col='d.doc_id')} AS id_split
      FROM documents d LEFT JOIN members m USING (doc_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE ta.id_split != tb.id_split) AS BIGINT)
                                   AS id_split_leaks,
           CAST(count(*) FILTER (WHERE ta.split != tb.split) AS BIGINT)
                                   AS canonical_split_leaks
    FROM pairs p
    JOIN tagged ta ON p.a_id = ta.doc_id
    JOIN tagged tb ON p.b_id = tb.doc_id
    """,
    operators=("G5", "K2", "C1", "D2"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # The shingle-Jaccard edge derivation (inverted-index self-join +
    # exact Jaccard rescore — the query's dominant cost) feeds BOTH
    # connected_components (which materializes its own symmetrized
    # copy) AND the final leak-counting join. localCheckpoint it once
    # (round 16) so the final plan reads the materialized edge list
    # instead of re-running the whole self-join; lazy, so the cost
    # lands inside this invocation's first job, and the blocks die
    # with the returned plan (no cross-run reuse).
    edges = shingle_jaccard_edges(docs, _CC_TAU).localCheckpoint(eager=False)
    comp = connected_components(edges)
    tagged = (
        docs.select("doc_id")
        .join(
            comp.select(
                F.col("node").alias("doc_id"),
                F.col("component").alias("canonical_id"),
            ),
            "doc_id",
            "left",
        )
        .withColumn(
            "canonical_id", F.coalesce("canonical_id", F.col("doc_id"))
        )
        .select(
            "doc_id",
            _split_expr("canonical_id").alias("split"),
            _split_expr("doc_id").alias("id_split"),
        )
    )
    ta = tagged.select(
        F.col("doc_id").alias("src"),
        F.col("split").alias("a_split"),
        F.col("id_split").alias("a_id_split"),
    )
    tb = tagged.select(
        F.col("doc_id").alias("dst"),
        F.col("split").alias("b_split"),
        F.col("id_split").alias("b_id_split"),
    )
    return (
        edges.join(ta, "src")
        .join(tb, "dst")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.count(F.when(F.col("a_id_split") != F.col("b_id_split"), 1))
            .cast("bigint")
            .alias("id_split_leaks"),
            F.count(F.when(F.col("a_split") != F.col("b_split"), 1))
            .cast("bigint")
            .alias("canonical_split_leaks"),
        )
    )
