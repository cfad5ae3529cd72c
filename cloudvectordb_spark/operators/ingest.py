"""End-to-end incremental ingest (round 8, verdict task 3): the
reference's S1->S4 story ("building the vectordb",
/root/reference/README.md:2) run the way a production corpus actually
grows — a NEW-DOCS BATCH arrives and every index artifact is maintained
with work proportional to the DELTA, never a corpus rescan.

The composed stages, all previously proven in isolation
(incremental_embedding_refresh, ivf_delta_assign_counts,
postings_incremental_merge, vector_upsert_merge), now run as ONE
pipeline over a deterministic md5 base/delta split so DuckDB replays
the whole journey value-for-value:

  1. arrival     — delta batch = docs whose md5(doc_id) starts >= 'e'
                   (~12.5%); base = the already-ingested corpus.
  2. dedup screen— drop delta docs whose content hash (md5(text))
                   already exists in the base, and in-batch dups
                   (keep lowest doc_id per hash). Anti-join on the
                   16-byte hash key — hash-partitioned at scale, never
                   an all-pairs compare.
  3. embed delta — ONLY survivors cross the encoder (mapInPandas stub;
                   the oracle checks the encoder contract: one vector
                   per doc, fixed dim, unit L2 norm).
  4. IVF assign  — survivors' vectors land in frozen full-corpus
                   centroid cells (work ∝ delta; the deterministic
                   trainer's CTEs replay the exact cell ids).
  5. postings    — base postings + delta postings merge by (term,
                   doc_id) tf-addition; the oracle-proved invariant is
                   merged == FULL REBUILD on the merged corpus, checked
                   both directions (exceptAll counts, in-plan).

The one-row summary carries the per-stage counts and the equality /
contract booleans. tools/incremental_ingest.py is the companion scale
probe (cost-∝-delta measurement at 1M docs; BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.registry import query

_TERMS = ("data", "query", "fast")
_TERMS_SQL = "('" + "', '".join(_TERMS) + "')"


def _split(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic base/delta split: md5(doc_id) first hex char
    >= 'e' -> delta (~2/16 of docs). SQL-replayable."""
    in_delta = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) >= "e"
    return docs.filter(~in_delta), docs.filter(in_delta)


def screened_delta(docs: DataFrame) -> DataFrame:
    """Stage 2: the delta batch after the content-hash dedup screen
    (vs base and in-batch). Shared by the query and the scale probe."""
    base, delta = _split(docs)
    base_hashes = base.select(F.md5("text").alias("h")).distinct()
    # anti-join on the 16-byte content hash: delta shuffles on the hash
    # key against base's hash projection — no broadcast of the (corpus-
    # sized) base side, no all-pairs compare; AQE may still broadcast
    # at fixture scale.
    fresh = delta.withColumn("h", F.md5("text")).join(
        base_hashes, "h", "left_anti"
    )
    wb = Window.partitionBy("h").orderBy("doc_id")
    return (
        fresh.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "h")
    )


def _ingest_oracle() -> str:
    from cloudvectordb_spark.operators.pipeline import _KM_CTES

    return f"""
    WITH {_KM_CTES},
    d AS (
      SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'e' AS in_delta
      FROM documents
    ),
    base AS (SELECT doc_id, text FROM d WHERE NOT in_delta),
    delta AS (SELECT doc_id, text FROM d WHERE in_delta),
    screened AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM delta
        WHERE md5(text) NOT IN (SELECT md5(text) FROM base)
      ) WHERE rn = 1
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM screened),
    bp AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM base
      ) WHERE term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    dp AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM screened
      ) WHERE term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    merged AS (
      SELECT term, doc_id, CAST(sum(tf) AS BIGINT) AS tf
      FROM (SELECT * FROM bp UNION ALL SELECT * FROM dp)
      GROUP BY term, doc_id
    ),
    full_p AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus
      ) WHERE term IN {_TERMS_SQL} GROUP BY term, doc_id
    ),
    dv AS (
      SELECT a.vec_id, a.cid FROM km_assign a
      WHERE a.vec_id IN (SELECT doc_id FROM screened)
    ),
    eq AS (
      SELECT
        (SELECT count(*) FROM
          (SELECT * FROM merged EXCEPT ALL SELECT * FROM full_p)) = 0
        AND
        (SELECT count(*) FROM
          (SELECT * FROM full_p EXCEPT ALL SELECT * FROM merged)) = 0
          AS ok
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM base)     AS n_base_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM delta)    AS n_delta_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM delta)
        - (SELECT CAST(count(*) AS BIGINT) FROM screened)
                                                      AS n_dup_screened,
      (SELECT CAST(count(*) AS BIGINT) FROM screened) AS n_ingested,
      true                                            AS embeddings_ok,
      (SELECT CAST(count(*) AS BIGINT) FROM dv)       AS n_delta_vectors,
      (SELECT CAST(count(DISTINCT cid) AS BIGINT) FROM dv)
                                                      AS n_cells_touched,
      (SELECT CAST(count(*) AS BIGINT) FROM merged)   AS n_merged_postings,
      (SELECT CAST(sum(tf) AS BIGINT) FROM merged)    AS merged_total_tf,
      (SELECT ok FROM eq)                             AS postings_merge_equals_rebuild,
      (SELECT CAST(count(*) AS BIGINT) FROM corpus)   AS final_corpus_docs
    """


@query(
    "incremental_ingest_e2e",
    oracle=_ingest_oracle(),
    operators=("H4", "C5", "K5", "K9", "K2", "G4", "D1"),
)
def incremental_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.operators.kmeans_det import assign_cells
    from cloudvectordb_spark.operators.pipeline import (
        EMBED_DIM,
        embed_documents,
        ensure_ivf_index,
        index_centroids,
    )

    docs = load(spark, sf_dir, "documents")
    base, delta = _split(docs)
    scr = screened_delta(docs)

    # stage counts (one-row frames, BNLJ-composed at the end)
    s_base = base.agg(F.count("*").cast("bigint").alias("n_base_docs"))
    s_delta = delta.agg(F.count("*").cast("bigint").alias("n_delta_docs"))
    s_scr = scr.agg(F.count("*").cast("bigint").alias("n_ingested"))

    # stage 3: embed ONLY the survivors; fold the encoder contract
    # (fixed dim, unit norm at 4 dp) into one boolean
    emb_out = embed_documents(scr)
    sq_norm = F.round(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x.cast("double")
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        4,
    )
    s_emb = emb_out.agg(
        F.min(
            (F.size("embedding") == EMBED_DIM) & (sq_norm == 1.0)
        ).alias("embeddings_ok")
    )

    # stage 4: survivors' vectors -> frozen full-corpus centroids
    emb = load(spark, sf_dir, "embeddings")
    delta_vecs = emb.join(
        scr.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    cents = index_centroids(spark, ensure_ivf_index(spark, sf_dir))
    s_assign = assign_cells(delta_vecs, cents).agg(
        F.count("*").cast("bigint").alias("n_delta_vectors"),
        F.countDistinct("centroid_id").cast("bigint").alias("n_cells_touched"),
    )

    # stage 5: postings merge == full rebuild on the merged corpus
    def postings(d: DataFrame) -> DataFrame:
        return (
            d.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
            .filter(F.col("term").isin(*_TERMS))
            .groupBy("term", "doc_id")
            .agg(F.count("*").cast("bigint").alias("tf"))
        )

    merged = (
        postings(base)
        .unionAll(postings(scr))
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    full_rebuild = postings(base.unionByName(scr))
    d1 = merged.exceptAll(full_rebuild).agg(
        F.count("*").alias("_d1")
    )
    d2 = full_rebuild.exceptAll(merged).agg(
        F.count("*").alias("_d2")
    )
    s_post = merged.agg(
        F.count("*").cast("bigint").alias("n_merged_postings"),
        F.sum("tf").cast("bigint").alias("merged_total_tf"),
    )

    return (
        s_base.crossJoin(s_delta)
        .crossJoin(s_scr)
        .crossJoin(s_emb)
        .crossJoin(s_assign)
        .crossJoin(s_post)
        .crossJoin(d1)
        .crossJoin(d2)
        .select(
            "n_base_docs",
            "n_delta_docs",
            (F.col("n_delta_docs") - F.col("n_ingested"))
            .cast("bigint")
            .alias("n_dup_screened"),
            "n_ingested",
            "embeddings_ok",
            "n_delta_vectors",
            "n_cells_touched",
            "n_merged_postings",
            "merged_total_tf",
            ((F.col("_d1") == 0) & (F.col("_d2") == 0)).alias(
                "postings_merge_equals_rebuild"
            ),
            (F.col("n_base_docs") + F.col("n_ingested"))
            .cast("bigint")
            .alias("final_corpus_docs"),
        )
    )
