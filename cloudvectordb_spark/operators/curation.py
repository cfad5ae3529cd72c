"""Training-corpus curation operators (SURVEY.md §2 K2/G4/G5 extensions;
[SCOPE] BASELINE.json:6 — "add the LLM-data-pipeline operators").

The reference's S1 stage builds "a very large dataset"
(/root/reference/README.md:2); these are the corpus-management steps a
100 TB text pipeline runs between raw ingest and training: deterministic
splits, repetition-based quality gates, benchmark decontamination, and
budgeted corpus mixing. Everything is Column-expression / groupBy only —
no UDFs — so each query is one declarative plan with DuckDB oracle twins.

Scale notes per query are inline; the common theme: the only shuffles are
per-doc-key aggregations (map-side combine applies) and the benchmark
side of decontamination is broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load, spread_narrow_scan
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.registry import query


# ---------------------------------------------------------------------------
# Deterministic train/val/test split: bucket on the first hex digit of
# md5(doc_id). Content-free, reproducible across engines and reruns, no
# seeded RNG — the standard way to split a corpus that keeps growing
# (a new doc lands in a stable split forever). Pure projection + one
# tiny aggregate; at 100 TB the split column is computed in the scan
# stage and the groupBy reduces map-side to 3 rows per task.
# ---------------------------------------------------------------------------
@query(
    "corpus_split_counts",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END                                AS split,
           count(*)                                            AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)   AS total_tokens
    FROM documents
    GROUP BY 1
    """,
    operators=("K2", "B8", "D1", "H4"),
)
def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(bucket < "c", "train").when(bucket < "e", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), TX.token_count("text").alias("ntok"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition scores (Gopher-style quality rules): fraction of duplicated
# bigrams and mass of the single most frequent unigram. High values flag
# boilerplate / degenerate text for removal before training. The bigram
# side is a pure array expression (zero shuffle); the unigram side is an
# explode -> per-(doc,term) count -> per-doc max/sum — two key-local
# aggregations that combine map-side, then one join on doc_id.
# ---------------------------------------------------------------------------
@query(
    "doc_repetition_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100
    ),
    bi AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                            i -> array_to_string(toks[i:i+1], ' ')) AS bg
      FROM t
    ),
    bigram AS (
      SELECT doc_id,
             round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
               AS dup_bigram_frac
      FROM bi
    ),
    cnt AS (
      SELECT doc_id, term, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id < 100)
      GROUP BY doc_id, term
    ),
    uni AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_unigram_frac
      FROM cnt GROUP BY doc_id
    )
    SELECT bigram.doc_id, dup_bigram_frac, top_unigram_frac
    FROM bigram JOIN uni USING (doc_id)
    """,
    operators=("K2", "H7", "H8", "D1", "C1"),
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bg = TX.word_shingles("text", 2)
    bigram = docs.select(
        "doc_id",
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
            6,
        ).alias("dup_bigram_frac"),
    )
    cnt = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    uni = cnt.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_unigram_frac")
    )
    return bigram.join(uni, "doc_id")


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training docs sharing any word-trigram
# with the held-out eval set. The eval set is an EXPLICIT literal id
# predicate — doc_id % 97 == 0 AND doc_id < _EVAL_MAX_DOC_ID — standing
# in for a fixed benchmark suite: at most _EVAL_MAX_DOC_ID/97 + 1 = 51
# docs at ANY corpus size, so the broadcast side is bounded by
# construction (51 docs x per-doc distinct trigrams), never corpus-
# proportional. The training side streams through an explode +
# broadcast-hash-join + per-doc count with no all-pairs comparison.
# This is the exact shape of 13-gram decontamination runs on production
# corpora (trigrams here because the fixture vocabulary is tiny).
# ---------------------------------------------------------------------------
_EVAL_MAX_DOC_ID = 4850
@query(
    "benchmark_contamination",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS g
      FROM documents
    ),
    ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0 AND doc_id < 4850),
    tr AS (SELECT doc_id, g FROM sh WHERE NOT (doc_id % 97 = 0 AND doc_id < 4850))
    SELECT tr.doc_id, count(*) AS n_shared_trigrams
    FROM tr JOIN ev USING (g)
    GROUP BY tr.doc_id
    """,
    operators=("K2", "G5", "H7", "C1", "D1"),
    bench=True,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_narrow_scan(load(spark, sf_dir, "documents"), spark)
    # Filter BEFORE shingling so each branch tokenizes only its own slice
    # of the corpus (eval = the <=51-doc literal benchmark set, train =
    # the rest) — the shingle explode totals one corpus pass instead of
    # two full passes filtered late.
    is_eval = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < _EVAL_MAX_DOC_ID)
    return contamination_scan(docs.filter(~is_eval), docs.filter(is_eval))


def contamination_scan(
    train: DataFrame, eval_docs: DataFrame, n: int = 3
) -> DataFrame:
    """The decontamination core on ANY (doc_id, text) frames: flag train
    docs sharing an n-word shingle with the (bounded, broadcastable)
    eval set. tools/contamination_probe.py runs this SAME code at 1M+
    docs with planted contamination."""

    def shingled(side: DataFrame) -> DataFrame:
        # Join on the 8-byte xxhash64 of each shingle, not the string:
        # the broadcast set and the probe keys shrink to fixed-width
        # longs (~20% faster here, far more at 13-gram production sizes).
        # A cross-side collision would need ~2^64/|ev x tr| luck; the
        # value-level oracle (string join) would catch it if it ever hit.
        return side.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.array_distinct(TX.word_shingles("text", n)),
                    lambda x: F.xxhash64(x),
                )
            ).alias("g"),
        )

    ev = shingled(eval_docs).select("g").distinct()
    tr = shingled(train)
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_trigrams"))
    )


# ---------------------------------------------------------------------------
# Budgeted corpus mixing: per language, rank docs by a quality proxy and
# keep documents until a per-language token budget is exhausted — the
# "sample X tokens of lang Y at quality-descending order" step of corpus
# composition. One window (partitioned by lang — parallel across
# languages) computes the running token total; the final aggregate is
# tiny. At 100 TB the per-lang ordering is the only big sort, and it is
# range-partitioned by Spark's window exchange.
# ---------------------------------------------------------------------------
_TOKEN_BUDGET = 2000


@query(
    "token_budget_mixture",
    oracle=f"""
    WITH scored AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS ntok, n_chars
      FROM documents
    ),
    cum AS (
      SELECT lang, doc_id, ntok,
             sum(ntok) OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS running_tokens
      FROM scored
    )
    SELECT lang,
           count(*)                    AS n_docs_kept,
           CAST(sum(ntok) AS BIGINT)   AS tokens_kept
    FROM cum
    WHERE running_tokens <= {_TOKEN_BUDGET}
    GROUP BY lang
    """,
    operators=("K2", "E3", "E1", "D1", "B3"),
)
def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", "doc_id", TX.token_count("text").alias("ntok"), "n_chars"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = scored.withColumn("running_tokens", F.sum("ntok").over(w))
    return (
        cum.filter(F.col("running_tokens") <= _TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs_kept"),
            F.sum("ntok").cast("bigint").alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# K2/E3 at scale: SEQUENCE PACKING — concatenate the corpus in doc_id
# order and chunk it into fixed 512-token training sequences. Each doc's
# start offset is the exclusive global prefix sum of token counts,
# computed DISTRIBUTED by ranking.with_global_prefix_sum (value-bucketed
# offsets + bucket-local cumsum — no single-partition window; the naive
# `sum() OVER (ORDER BY ...)` form funnels 100 TB through one task).
# The bin assignment and boundary-crossing flag are then per-row math.
# ---------------------------------------------------------------------------
_PACK_BIN = 512


@query(
    "sequence_packing_offsets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      FROM documents
    ),
    c AS (
      SELECT doc_id, ntok,
             CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, ntok, start_offset,
           start_offset // {_PACK_BIN}                AS bin_first,
           (start_offset + ntok - 1) // {_PACK_BIN}   AS bin_last,
           (start_offset // {_PACK_BIN})
             <> ((start_offset + ntok - 1) // {_PACK_BIN}) AS spans_boundary
    FROM c
    """,
    operators=("K2", "E3", "F1", "D1"),
)
def sequence_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import with_global_prefix_sum

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count("text").cast("bigint").alias("ntok")
    )
    packed = with_global_prefix_sum(docs, "doc_id", "ntok", cum_col="start_offset")
    bin_first = F.expr(f"start_offset div {_PACK_BIN}")
    bin_last = F.expr(f"(start_offset + ntok - 1) div {_PACK_BIN}")
    return packed.select(
        "doc_id",
        "ntok",
        "start_offset",
        bin_first.alias("bin_first"),
        bin_last.alias("bin_last"),
        (bin_first != bin_last).alias("spans_boundary"),
    )


# ---------------------------------------------------------------------------
# K2/H4: stratified deterministic sampling — per-language keep rates via
# an md5 threshold on doc_id (en keeps 50%, de 75%, fr/es 25%, zh 12.5%).
# Content-free and engine-replayable: a fixed-width hex prefix compares
# lexicographically == numerically, so `substr(md5(id),1,2) < 'c0'` IS
# the 75% Bernoulli draw, reproducible forever (a re-run or a late-
# arriving shard keeps exactly the same docs — the property seeded RNG
# sampling loses when partitioning changes). One narrow scan, one tiny
# groupBy(lang); the sample predicate is a pushable scan-stage column.
# ---------------------------------------------------------------------------
_LANG_THRESH = {"en": "80", "de": "c0", "fr": "40", "es": "40", "zh": "20"}


@query(
    "stratified_hash_sample",
    oracle=f"""
    WITH t AS (
      SELECT lang, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE lang {' '.join(f"WHEN '{k}' THEN '{v}'" for k, v in _LANG_THRESH.items())}
                         ELSE '00' END AS keep
      FROM documents
    )
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN len(string_split(text, ' '))
                         ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM t GROUP BY lang
    """,
    operators=("K2", "H4", "D1", "B8"),
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    thresh = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _LANG_THRESH.items()
        ],
        F.lit("00"),
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < thresh
    return (
        docs.select("lang", keep.alias("keep"), TX.token_count("text").alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("ntok")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# K2/D1: distribution drift between the train and val splits — add-one-
# smoothed unigram KL divergence per language (the drift monitor a data
# pipeline runs when a new crawl lands; complements order_price_drift_psi
# which buckets a numeric column). Single explode pass with conditional
# aggregation per (lang, term); per-lang totals are a 5-row broadcast.
# ---------------------------------------------------------------------------
@query(
    "split_unigram_kl",
    oracle="""
    WITH tok AS (
      SELECT lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                  THEN 'train' ELSE 'val' END AS split,
             unnest(string_split(text, ' ')) AS term
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
    ),
    counts AS (
      SELECT lang, term,
             sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS ctr,
             sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)   AS cva
      FROM tok GROUP BY lang, term
    ),
    tot AS (
      SELECT lang, sum(ctr) AS ttr, sum(cva) AS tva, count(*) AS v
      FROM counts GROUP BY lang
    )
    SELECT c.lang,
           CAST(t.v AS BIGINT)   AS n_terms,
           CAST(t.ttr AS BIGINT) AS train_tokens,
           CAST(t.tva AS BIGINT) AS val_tokens,
           round(sum(((c.ctr + 1.0) / (t.ttr + t.v))
                 * ln(((c.ctr + 1.0) / (t.ttr + t.v))
                    / ((c.cva + 1.0) / (t.tva + t.v)))), 6) AS kl
    FROM counts c JOIN tot t USING (lang)
    GROUP BY c.lang, t.v, t.ttr, t.tva
    """,
    operators=("K2", "K1", "D1", "B8"),
)
def split_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    tok = (
        docs.filter(bucket < "e")
        .select(
            "lang",
            F.when(bucket < "c", "train").otherwise("val").alias("split"),
            F.explode(TX.tokens("text")).alias("term"),
        )
    )
    counts = tok.groupBy("lang", "term").agg(
        F.sum((F.col("split") == "train").cast("bigint")).alias("ctr"),
        F.sum((F.col("split") == "val").cast("bigint")).alias("cva"),
    )
    tot = counts.groupBy("lang").agg(
        F.sum("ctr").alias("ttr"),
        F.sum("cva").alias("tva"),
        F.count("*").alias("v"),
    )
    joined = counts.join(F.broadcast(tot), "lang")
    p = (F.col("ctr") + 1.0) / (F.col("ttr") + F.col("v"))
    q = (F.col("cva") + 1.0) / (F.col("tva") + F.col("v"))
    return joined.groupBy("lang", "v", "ttr", "tva").agg(
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl")
    ).select(
        "lang",
        F.col("v").cast("bigint").alias("n_terms"),
        F.col("ttr").cast("bigint").alias("train_tokens"),
        F.col("tva").cast("bigint").alias("val_tokens"),
        "kl",
    )


# ---------------------------------------------------------------------------
# K2: temperature-scaled source mixing — the multinomial sampling-weight
# computation behind "alpha-sampling" multilingual/multi-source corpora
# (p_i ∝ n_i^alpha with alpha<1 upweights small sources). Two tiny
# aggregations; the weights table is #sources rows, the artifact a
# sampler joins against at training time. Expected epoch tokens =
# weight * budget, all closed-form and oracle-exact.
# ---------------------------------------------------------------------------
_MIX_ALPHA = 0.7
_MIX_BUDGET = 100_000


@query(
    "source_mixing_weights",
    oracle=f"""
    WITH n AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    z AS (SELECT sum(n_tokens ** {_MIX_ALPHA}) AS z FROM n)
    SELECT source, n_tokens,
           round(n_tokens ** {_MIX_ALPHA} / (SELECT z FROM z), 6) AS weight,
           CAST(floor(n_tokens ** {_MIX_ALPHA} / (SELECT z FROM z)
                      * {_MIX_BUDGET}) AS BIGINT) AS epoch_tokens
    FROM n
    """,
    operators=("K2", "D1", "D2", "H6"),
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("bigint").alias("n_tokens")
    )
    pw = F.pow(F.col("n_tokens"), F.lit(_MIX_ALPHA))
    z = n.agg(F.sum(pw).alias("z"))
    return (
        n.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            F.round(pw / F.col("z"), 6).alias("weight"),
            F.floor(pw / F.col("z") * _MIX_BUDGET).cast("bigint").alias(
                "epoch_tokens"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle: the global training order for one epoch,
# derived from a content-free hash key — replayable forever (resume from
# step k re-derives the same order; changing the seed string re-shuffles).
# The exact global position comes from the value-bucketed distributed
# row_number (ranking.py), so no single-partition sort materializes even
# over a 100 TB corpus; a training loader only needs ORDER BY shard-local
# ranges of shuffle_pos. Fixed-width md5-prefix hex compares
# lexicographically == numerically, which is what lets DuckDB replay the
# exact order by string comparison while Spark buckets on the bigint.
# ---------------------------------------------------------------------------
_SHUFFLE_SEED = "epoch0"


@query(
    "deterministic_corpus_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':{_SHUFFLE_SEED}'), 1, 15),
                      doc_id) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
    operators=("F1", "H4", "K2"),
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import with_global_row_number

    docs = load(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "_shufkey",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SHUFFLE_SEED}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    ranked = with_global_row_number(
        keyed, "_shufkey", [F.asc("doc_id")], rn_col="shuffle_pos"
    )
    return ranked.select("doc_id", F.col("shuffle_pos").cast("bigint"))


# ---------------------------------------------------------------------------
# Quality-filter funnel: per-source survival counts through the curation
# cascade (length -> stopword ratio -> bigram repetition). One scan with
# conditional aggregates (map-side combine), so the funnel over 100 TB
# costs the same as any per-source groupBy; the stages are cumulative
# (stage N implies stages < N), which is what makes the output a funnel
# rather than independent filter counts.
# ---------------------------------------------------------------------------
@query(
    "quality_filter_funnel",
    oracle="""
    WITH t AS (
      SELECT source,
             len(string_split(text, ' ')) AS ntok,
             CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'for'], x))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio,
             1.0 - CAST(len(list_distinct(list_transform(
                     generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                     i -> array_to_string((string_split(text, ' '))[i:i+1], ' ')))) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')) - 1, 1) AS dup_bigram_frac
      FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN ntok >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
           CAST(sum(CASE WHEN ntok >= 10 AND stop_ratio < 0.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_ok,
           CAST(sum(CASE WHEN ntok >= 10 AND stop_ratio < 0.5
                          AND dup_bigram_frac <= 0.8
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_final
    FROM t GROUP BY source
    """,
    operators=("K2", "B8", "D1", "H8"),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bg = TX.word_shingles("text", 2)
    ntok = TX.token_count("text")
    t = docs.select(
        "source",
        ntok.alias("ntok"),
        TX.stopword_ratio("text").alias("stop_ratio"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bg)).cast("double")
            / F.greatest(ntok - 1, F.lit(1))
        ).alias("dup_bigram_frac"),
    )
    len_ok = F.col("ntok") >= 10
    stop_ok = len_ok & (F.col("stop_ratio") < 0.5)
    final_ok = stop_ok & (F.col("dup_bigram_frac") <= 0.8)
    return t.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(len_ok, 1).otherwise(0)).cast("bigint").alias("n_len_ok"),
        F.sum(F.when(stop_ok, 1).otherwise(0)).cast("bigint").alias("n_stop_ok"),
        F.sum(F.when(final_ok, 1).otherwise(0)).cast("bigint").alias("n_final"),
    )


# ---------------------------------------------------------------------------
# Uniform negative sampling for contrastive training: k pseudo-random
# negatives per anchor from a content-free hash — neg_id =
# md5(anchor:i) mod n — so the draw is reproducible forever and
# embarrassingly parallel (no shuffle at all until nothing: it is a pure
# projection off the anchor set; the corpus is never scanned). Distinct
# from triplet_mining's HARD negatives (label-aware windows): uniform
# negatives are the cheap in-batch complement every contrastive recipe
# mixes in. Same md5 bridge as the epoch shuffle makes it value-level
# oracle-checkable.
# ---------------------------------------------------------------------------
_NEG_K = 4


@query(
    "uniform_negative_pairs",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id < 100),
    drawn AS (
      SELECT anchor_id, s.i,
        CAST((
          (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
          (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
          (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
          (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
          (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
          (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
          (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
          CAST((u >> 56) & 255 AS HUGEINT)
        ) // 16 AS BIGINT) % (SELECT n_docs FROM n) AS neg_id
      FROM anchors
      CROSS JOIN (SELECT unnest(generate_series(0, {_NEG_K - 1})) AS i) s
      CROSS JOIN LATERAL (SELECT md5_number_upper(
        CAST(anchor_id AS VARCHAR) || ':' || CAST(s.i AS VARCHAR)) AS u) h
    )
    SELECT anchor_id, CAST(i AS BIGINT) AS draw, neg_id
    FROM drawn WHERE neg_id <> anchor_id
    """,
    operators=("K3", "H4", "B1"),
)
def uniform_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    anchors = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("anchor_id")
    )
    drawn = (
        anchors.select(
            "anchor_id",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("draw"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "anchor_id",
            F.col("draw").cast("bigint"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("anchor_id").cast("string"),
                                F.lit(":"),
                                F.col("draw").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_docs")
            ).alias("neg_id"),
        )
    )
    return drawn.filter(F.col("neg_id") != F.col("anchor_id"))


# ---------------------------------------------------------------------------
# Quality-weighted deterministic sampling (Efraimidis–Spirakis): key =
# u^(1/w) with u a content-free md5-derived uniform and w = n_chars as
# the quality proxy; the top-k keys ARE a weighted sample without
# replacement. Deterministic forever (reruns, repartitions, late shards
# keep the same sample) unlike rand()-seeded sampling; one projection +
# TakeOrdered top-k. Keys round to 9 dp with doc_id tie-break so both
# engines rank identically.
# ---------------------------------------------------------------------------
_WSAMPLE_K = 100


@query(
    "weighted_corpus_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(pow(
               (CAST((
                 (CAST((u >> 0)  & 255 AS HUGEINT) * 72057594037927936) +
                 (CAST((u >> 8)  & 255 AS HUGEINT) * 281474976710656) +
                 (CAST((u >> 16) & 255 AS HUGEINT) * 1099511627776) +
                 (CAST((u >> 24) & 255 AS HUGEINT) * 4294967296) +
                 (CAST((u >> 32) & 255 AS HUGEINT) * 16777216) +
                 (CAST((u >> 40) & 255 AS HUGEINT) * 65536) +
                 (CAST((u >> 48) & 255 AS HUGEINT) * 256) +
                 CAST((u >> 56) & 255 AS HUGEINT)
               ) // 16 AS BIGINT) + 1.0) / 1152921504606846976.0,
               1.0 / n_chars), 9) AS skey
      FROM (SELECT doc_id, n_chars,
                   md5_number_upper('ws:' || CAST(doc_id AS VARCHAR)) AS u
            FROM documents)
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, skey
    FROM keyed
    ORDER BY skey DESC, doc_id
    LIMIT {_WSAMPLE_K}
    """,
    operators=("K2", "H4", "H6", "F2"),
)
def weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    u_int = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    uniform = (u_int + 1.0) / 1152921504606846976.0  # (0, 1]; 2^60
    skey = F.round(F.pow(uniform, 1.0 / F.col("n_chars")), 9)
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            skey.alias("skey"),
        )
        .orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Contrastive batch construction: assign items to batches so no batch
# holds two items of the same label — the in-batch-negatives guarantee
# (every other item in the batch is a valid negative). The assignment
# is just the per-label row_number (deterministic hash order), so batch
# b holds at most one item per label BY CONSTRUCTION; the query emits
# per-batch counts plus the all_labels_distinct proof column the oracle
# re-derives. One label-partitioned window — parallel across labels.
# ---------------------------------------------------------------------------
@query(
    "contrastive_batch_assignment",
    oracle="""
    WITH assigned AS (
      SELECT label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS batch_id
      FROM embeddings
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id,
           count(*) AS n_items,
           count(DISTINCT label) AS n_labels,
           count(*) = count(DISTINCT label) AS all_labels_distinct
    FROM assigned
    GROUP BY batch_id
    """,
    operators=("K3", "E1", "D1", "D3", "H4"),
)
def contrastive_batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    assigned = emb.select(
        "label", F.row_number().over(w).cast("bigint").alias("batch_id")
    )
    return assigned.groupBy("batch_id").agg(
        F.count("*").alias("n_items"),
        F.countDistinct("label").alias("n_labels"),
        (F.count("*") == F.countDistinct("label")).alias("all_labels_distinct"),
    )


# ---------------------------------------------------------------------------
# Source-quality leaderboard: the per-source composite a corpus owner
# ranks sources by when budgeting a mix — exact-dup rate, quality-gate
# pass rate, mean tokens, all from ONE scan of the corpus (three
# conditional aggregates per source), ordered worst-first by dup rate.
# Each component exists as a standalone query; this is the joined
# decision view.
# ---------------------------------------------------------------------------
@query(
    "source_quality_leaderboard",
    oracle=r"""
    WITH t AS (
      SELECT source,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h,
             len(string_split(text, ' ')) AS ntok,
             CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'for'], x))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stop_ratio
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           round(1.0 - count(DISTINCT h) * 1.0 / count(*), 6) AS dup_rate,
           round(sum(CASE WHEN ntok >= 10 AND stop_ratio < 0.5
                          THEN 1.0 ELSE 0.0 END) / count(*), 6) AS quality_rate,
           round(avg(ntok), 4) AS mean_tokens
    FROM t GROUP BY source
    ORDER BY dup_rate DESC, source
    """,
    operators=("K2", "G4", "D1", "D3", "B8", "F1"),
)
def source_quality_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ntok = TX.token_count("text")
    quality = (ntok >= 10) & (TX.stopword_ratio("text") < 0.5)
    t = docs.select(
        "source",
        TX.content_hash("text").alias("h"),
        ntok.alias("ntok"),
        quality.alias("q"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                1.0 - F.countDistinct("h") / F.count("*"), 6
            ).alias("dup_rate"),
            F.round(
                F.sum(F.when(F.col("q"), 1.0).otherwise(0.0)) / F.count("*"), 6
            ).alias("quality_rate"),
            F.round(F.avg("ntok"), 4).alias("mean_tokens"),
        )
        .orderBy(F.desc("dup_rate"), F.asc("source"))
    )


# ---------------------------------------------------------------------------
# A/B bucketing with SRM check: content-hash users into two arms and
# verify the realized split against 50/50 — the sample-ratio-mismatch
# guard every experimentation platform runs before trusting a result.
# Same md5 bridge as the split/sample family (stable forever, no RNG);
# the z-statistic against the binomial null is pure arithmetic on two
# counts.
# ---------------------------------------------------------------------------
@query(
    "ab_assignment_srm_check",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    arms AS (
      SELECT CASE WHEN substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
      FROM users
    ),
    counts AS (
      SELECT CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             count(*) AS n
      FROM arms
    )
    SELECT n_a, n_b,
           round(abs(n_a - n_b) / sqrt(n * 0.5 * 0.5) / 2.0, 6) AS srm_z,
           abs(n_a - n_b) / sqrt(n * 0.5 * 0.5) / 2.0 < 4 AS split_healthy
    FROM counts
    """,
    operators=("H4", "B8", "D2", "H6"),
)
def ab_assignment_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    counts = users.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.count("*").alias("n"),
    )
    z = F.abs(F.col("n_a") - F.col("n_b")) / F.sqrt(F.col("n") * 0.25) / 2.0
    return counts.select(
        "n_a", "n_b", F.round(z, 6).alias("srm_z"), (z < 4).alias("split_healthy")
    )


# ---------------------------------------------------------------------------
# G6/K2 semantic decontamination: the embedding-space complement of
# benchmark_contamination. Trigram overlap catches verbatim leakage;
# paraphrased eval items share no n-grams but DO sit next to their
# training twin in embedding space, so production decontamination runs
# BOTH filters. Same bounded-eval-side discipline: the eval set is the
# literal id predicate (<= 51 rows at any corpus size) and rides as a
# broadcast; the train side streams through one cosine scan — cost
# |corpus| x |eval|, linear in the corpus, no shuffle before the final
# per-doc aggregate.
# ---------------------------------------------------------------------------
_SEM_CONTAM_TAU = 0.3


@query(
    "semantic_contamination_audit",
    oracle=f"""
    WITH ev AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % 97 = 0 AND vec_id < {_EVAL_MAX_DOC_ID}
    ),
    tr AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE NOT (vec_id % 97 = 0 AND vec_id < {_EVAL_MAX_DOC_ID})
    ),
    hits AS (
      SELECT tr.vec_id AS train_id, ev.vec_id AS eval_id,
             round(list_cosine_similarity(tr.v, ev.v), 6) AS cos_sim
      FROM tr, ev
      WHERE round(list_cosine_similarity(tr.v, ev.v), 6) >= {_SEM_CONTAM_TAU}
    )
    SELECT train_id,
           CAST(count(*) AS BIGINT) AS n_eval_hits,
           max(cos_sim) AS max_sim
    FROM hits GROUP BY train_id
    """,
    operators=("G6", "K2", "K7", "C10", "D1"),
)
def semantic_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training vectors whose cosine to ANY held-out eval vector clears
    tau — flagged with hit count and worst similarity for review."""
    from cloudvectordb_spark.functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    is_eval = (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < _EVAL_MAX_DOC_ID)
    ev = emb.filter(is_eval).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ev_vec")
    )
    tr = emb.filter(~is_eval).select(
        F.col("vec_id").alias("train_id"), "embedding"
    )
    hits = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "train_id",
            F.round(V.cosine("embedding", "ev_vec"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _SEM_CONTAM_TAU)
    )
    return hits.groupBy("train_id").agg(
        F.count("*").cast("bigint").alias("n_eval_hits"),
        F.max("cos_sim").alias("max_sim"),
    )


# ---------------------------------------------------------------------------
# Training-sequence PACKING: concatenate documents into fixed
# token-budget bins (the standard pre-training batching step — short
# docs pack together so no sequence pads to the context length). The
# deterministic contiguous scheme: within each source, docs pack in
# doc_id order and a doc opens bin floor(tokens_before / budget) —
# reproducible across engines/reruns, no RNG, and a doc that straddles
# the boundary belongs to the bin it STARTED in (overflow reported,
# never silently truncated). Packing is per-source (window partitioned
# on source), so the sequential cumsum parallelizes across sources —
# the production sharding; a single global order would serialize the
# whole corpus through one task at 100 TB.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512


@query(
    "token_budget_packing",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS ntok
      FROM documents
    ),
    packed AS (
      SELECT source, ntok,
             CAST(floor(
               (sum(ntok) OVER (PARTITION BY source
                                ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - ntok)
               / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT)     AS n_docs,
           CAST(sum(ntok) AS BIGINT)    AS bin_tokens,
           round(sum(ntok) / {_PACK_BUDGET}.0, 6) AS fill_ratio
    FROM packed
    GROUP BY source, bin_id
    """,
    operators=("K1", "E3", "H6", "D1"),
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "source", "doc_id", TX.token_count("text").alias("ntok")
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("ntok").over(w) - F.col("ntok")) / float(_PACK_BUDGET)
        ).cast("bigint"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("bin_tokens"),
        F.round(F.sum("ntok") / float(_PACK_BUDGET), 6).alias("fill_ratio"),
    )
