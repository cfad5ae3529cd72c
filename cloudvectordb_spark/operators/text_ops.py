"""Text analysis & exact dedup over the document corpus (SURVEY.md §2
K1, K2, G4, H1-H4; reference S1 "building a very large dataset",
/root/reference/README.md:2).

Everything is Column-expression-only (JVM-side): tokenization, shingling,
quality scoring, and content hashing all run inside whole-stage codegen,
so the same plan streams through 100 TB of text with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.ranking import _zero
from cloudvectordb_spark.registry import query

_STOPLIST_SQL = "['" + "', '".join(TX.STOPWORDS) + "']"


# ---------------------------------------------------------------------------
# K2/D1: corpus stats per language
# ---------------------------------------------------------------------------
@query(
    "doc_token_stats",
    oracle="""
    SELECT lang,
           count(*)                                       AS n_docs,
           round(avg(len(string_split(text, ' '))), 4)    AS avg_tokens,
           round(avg(n_chars), 4)                         AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
    # K1: TX.token_count is the whitespace tokenizer applied per doc.
    operators=("K2", "H1", "D1", "K1"),
    bench=True,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ntok = TX.token_count("text").cast("bigint")
    return (
        docs.withColumn("ntok", ntok)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ntok"), 4).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("ntok").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# K2: per-document quality score (stopword ratio + token count gates)
# ---------------------------------------------------------------------------
@query(
    "doc_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round(CAST(len(list_filter(toks, x -> list_contains({_STOPLIST_SQL}, x))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE), 6) AS stop_ratio,
           (len(toks) >= 10 AND
            CAST(len(list_filter(toks, x -> list_contains({_STOPLIST_SQL}, x))) AS DOUBLE)
                 / CAST(len(toks) AS DOUBLE) < 0.5) AS is_quality
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE doc_id < 100
    """,
    operators=("K2", "H7", "H8", "B2"),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ratio = TX.stopword_ratio("text")
    return docs.select(
        "doc_id",
        TX.token_count("text").cast("bigint").alias("n_tokens"),
        F.round(ratio, 6).alias("stop_ratio"),
        ((TX.token_count("text") >= 10) & (ratio < 0.5)).alias("is_quality"),
    )


# ---------------------------------------------------------------------------
# G4/H4: exact dedup by normalized content hash
# ---------------------------------------------------------------------------
@query(
    "doc_exact_dedup_stats",
    oracle=r"""
    SELECT source,
           count(*)                                                          AS n_docs,
           count(DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) AS n_unique
    FROM documents
    GROUP BY source
    """,
    operators=("G4", "H4", "H1", "D3"),
)
def doc_exact_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", TX.content_hash("text"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_unique"),
        )
    )


# ---------------------------------------------------------------------------
# H4: document fingerprints (content-hash prefix)
# ---------------------------------------------------------------------------
@query(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 16) AS fp
    FROM documents
    WHERE doc_id < 50
    """,
    operators=("H4", "H2", "B2"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))


# ---------------------------------------------------------------------------
# K1/H7: word-shingle statistics (the MinHash input representation)
# ---------------------------------------------------------------------------
@query(
    "doc_shingle_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(sh) AS BIGINT)                 AS n_shingles,
           CAST(len(list_distinct(sh)) AS BIGINT)  AS n_distinct_shingles
    FROM (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> array_to_string(toks[i:i+2], ' ')
             ) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    WHERE doc_id < 100
    """,
    operators=("K1", "H7", "H8"),
)
def doc_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = TX.word_shingles("text", 3)
    return docs.select(
        "doc_id",
        F.size(sh).cast("bigint").alias("n_shingles"),
        F.size(F.array_distinct(sh)).cast("bigint").alias("n_distinct_shingles"),
    )


# ---------------------------------------------------------------------------
# H3/C7: string-distance matrix (bounded cross join)
# ---------------------------------------------------------------------------
@query(
    "name_edit_distances",
    oracle="""
    SELECT s_suppkey, c_custkey, levenshtein(s_name, c_name) AS edit_dist
    FROM supplier, customer
    WHERE s_suppkey <= 10 AND c_custkey <= 10
    """,
    operators=("H3", "C7"),
)
def name_edit_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 10)
    return supp.crossJoin(F.broadcast(cust)).select(
        "s_suppkey",
        "c_custkey",
        F.levenshtein("s_name", "c_name").cast("bigint").alias("edit_dist"),
    )


# ---------------------------------------------------------------------------
# K2: TF-IDF top terms per document — pure DataFrame (explode -> tf ->
# df -> idf join), fully oracle-checkable unlike the HashingTF path.
# Map-side combine shrinks the tf shuffle; the per-term df table is tiny
# (vocabulary-sized) and broadcasts into the scoring join at any corpus
# size.
# ---------------------------------------------------------------------------
@query(
    "doc_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents WHERE doc_id < 100
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
    dfreq AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / dfreq.df), 6) AS tfidf
      FROM tf, n_docs
      JOIN dfreq ON tf.term = dfreq.term
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    operators=("K2", "K1", "D1", "E4", "C2"),
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = tok.select("doc_id").distinct().count()
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# The LLM-data-curation composition: language filter -> quality gates
# (length + stopword ratio) -> exact near-dup removal (normalized-hash
# keep-first) -> per-source acceptance stats. One declarative plan:
# Catalyst fuses the filters into the scan; the only shuffles are the
# dedup window and the final small aggregate.
# ---------------------------------------------------------------------------
@query(
    "curated_corpus_stats",
    oracle="""
    WITH gated AS (
      SELECT doc_id, source, n_chars,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM documents
      WHERE lang IN ('en', 'es')
        AND n_chars BETWEEN 50 AND 10000
        AND len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(['the','a','of','and','to','in','is','for'], x)))
            >= 0.05 * len(string_split(text, ' '))
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT source,
           count(*)                      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS total_chars
    FROM kept
    GROUP BY source
    """,
    operators=("K2", "G4", "B4", "B3", "D1", "E1"),
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.functions import text as TX

    docs = load(spark, sf_dir, "documents")
    gated = (
        docs.filter(F.col("lang").isin("en", "es"))
        .filter(F.col("n_chars").between(50, 10000))
        .filter(
            TX.stopword_ratio("text") >= 0.05
        )
        .withColumn("h", F.md5(TX.normalize_text("text")))
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# K2: Gopher-style composite quality gate — the multi-signal document
# filter every pretraining pipeline runs (token-count bounds, mean word
# length, stopword mass). All Column expressions over the token array;
# the scan computes everything in one narrow pass, no shuffle at all
# until the (tiny) downstream consumer aggregates survivors.
# ---------------------------------------------------------------------------
@query(
    "doc_quality_gate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS ntok,
           round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / len(toks), 6) AS mean_word_len,
           round(CAST(len(list_filter(toks,
                        x -> list_contains({_STOPLIST_SQL}, x))) AS DOUBLE)
                 / len(toks), 6) AS stop_ratio,
           (len(toks) BETWEEN 20 AND 400)
             AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                    / len(toks) BETWEEN 2 AND 8)
             AND (CAST(len(list_filter(toks,
                          x -> list_contains({_STOPLIST_SQL}, x))) AS DOUBLE)
                    / len(toks) <= 0.3) AS passes
    FROM t
    """,
    operators=("K2", "H8", "B7", "B8"),
)
def doc_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = TX.tokens("text")
    ntok = F.size(t).cast("bigint")
    char_sum = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.try_divide(char_sum.cast("double"), ntok)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*TX.STOPWORDS)))
    stop_ratio = F.try_divide(n_stop.cast("double"), ntok)
    passes = (
        ntok.between(20, 400) & mean_wl.between(2, 8) & (stop_ratio <= 0.3)
    )
    return docs.select(
        "doc_id",
        ntok.alias("ntok"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        passes.alias("passes"),
    )


# ---------------------------------------------------------------------------
# K2/D1/F2: corpus vocabulary head — top-20 terms by frequency with rank
# (the Zipf profile a tokenizer-training run inspects first). explode ->
# map-side-combined count -> TakeOrderedAndProject top-k via
# ranking.global_topk_ranked: no single-partition window even though the
# vocabulary at 100 TB is itself huge.
# ---------------------------------------------------------------------------
@query(
    "vocab_head_zipf",
    oracle="""
    WITH tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    )
    SELECT term, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
    FROM tf QUALIFY rank <= 20
    """,
    operators=("K2", "K1", "D1", "F2"),
)
def vocab_head_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import global_topk_ranked

    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    return global_topk_ranked(tf, [F.desc("freq"), F.asc("term")], 20)


# ---------------------------------------------------------------------------
# K2/H1: stopword scrubbing — the remove-and-measure cleaning shape (same
# plumbing as PII redaction: filter the token stream, reassemble, report
# the compression). Pure per-row expressions; verified end-to-end by the
# oracle recomputing the scrub from the raw text.
# ---------------------------------------------------------------------------
@query(
    "doc_stopword_scrub",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS chars_before,
           CAST(length(array_to_string(list_filter(toks,
                  x -> NOT list_contains({_STOPLIST_SQL}, x)), ' '))
                AS BIGINT) AS chars_after,
           round(CAST(length(array_to_string(list_filter(toks,
                  x -> NOT list_contains({_STOPLIST_SQL}, x)), ' '))
                AS DOUBLE) / length(text), 6) AS keep_ratio
    FROM t
    """,
    operators=("K2", "H1", "H8", "B1"),
)
def doc_stopword_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    kept = F.array_join(
        F.filter(TX.tokens("text"), lambda x: ~x.isin(*TX.STOPWORDS)), " "
    )
    before = F.length("text").cast("bigint")
    after = F.length(kept).cast("bigint")
    return docs.select(
        "doc_id",
        before.alias("chars_before"),
        after.alias("chars_after"),
        F.round(F.try_divide(after.cast("double"), before), 6).alias(
            "keep_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# K2/H2: PII redaction — regex-scrub emails and phone-shaped numbers,
# reporting per-doc match counts and the redacted length. The fixture
# text is synthetic word soup with no real PII, so a deterministic
# contact suffix derived from doc_id is appended first (the plumbing —
# regexp_count + global regexp_replace in one scan-stage pass — is what
# a real pipeline points at raw crawl text; patterns are deliberately in
# the RE2/Java-regex common subset so the oracle replays them exactly).
# Pure per-row expressions: zero shuffle, pushes through the scan.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "pii_redaction_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(contact, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(contact,
                  '{_EMAIL_RE}', '<EMAIL>', 'g'),
                  '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM t
    """,
    operators=("K2", "H2", "H1", "B1"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(contact, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(contact, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(contact, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# K2: bigram language-model scoring — the CCNet-style "perplexity filter"
# that ranks docs by how probable their text is under a corpus n-gram
# model. The model is the corpus itself (bigram MLE: p(w2|w1) =
# c(w1 w2) / c(w1 ·)), so every doc bigram has a model entry and the
# whole computation is two keyed aggregations plus one keyed join — the
# model table is NEVER broadcast (vocab² rows at 100 TB) and never
# collected; low avg_logprob = boilerplate-unlike, high = degenerate
# repetition. Scored subset is doc_id < 200; the model uses ALL docs.
# ---------------------------------------------------------------------------
@query(
    "doc_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks
    ),
    model AS (SELECT bg, count(*) AS c_pair FROM pairs GROUP BY bg),
    w1tot AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c_pair) AS c_w1
      FROM model GROUP BY 1
    ),
    m2 AS (
      SELECT bg, c_pair, c_w1
      FROM model JOIN w1tot ON string_split(model.bg, ' ')[1] = w1tot.w1
    )
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           round(avg(ln(c_pair / c_w1)), 6) AS avg_logprob
    FROM pairs p JOIN m2 USING (bg)
    WHERE p.doc_id < 200
    GROUP BY p.doc_id
    """,
    operators=("K2", "K1", "D1", "C1"),
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(TX.word_shingles("text", 2)).alias("bg")
    )
    model = pairs.groupBy("bg").agg(F.count("*").alias("c_pair"))
    w1tot = (
        model.withColumn("w1", F.split("bg", " ")[0])
        .groupBy("w1")
        .agg(F.sum("c_pair").alias("c_w1"))
    )
    m2 = (
        model.withColumn("w1", F.split("bg", " ")[0])
        .join(w1tot, "w1")
        .select("bg", "c_pair", "c_w1")
    )
    return (
        pairs.filter(F.col("doc_id") < 200)
        .join(m2, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c_pair") / F.col("c_w1"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# K1: BPE tokenizer training, iteration 0 — the frequency table of
# adjacent symbol pairs inside words, weighted by word occurrence (the
# argmax of this table IS the first BPE merge). substr arithmetic on
# both engines (no empty-delimiter split quirks); counts combine
# map-side; the top-20 head goes through global_topk_ranked, so the
# full pair table (bounded by vocab size) never single-partitions.
# ---------------------------------------------------------------------------
@query(
    "bpe_merge_pair_counts",
    oracle="""
    WITH pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(length(word) - 1, 0)),
               i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    ),
    tf AS (SELECT pair, count(*) AS freq FROM pairs GROUP BY pair)
    SELECT pair, CAST(freq AS BIGINT) AS freq,
           CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rank
    FROM tf QUALIFY rank <= 20
    """,
    operators=("K1", "K2", "D1", "F2"),
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudvectordb_spark.ranking import global_topk_ranked

    docs = load(spark, sf_dir, "documents")
    char_pairs = F.expr(
        "CASE WHEN length(word) >= 2 THEN "
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    tf = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .select(F.explode(char_pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    return global_topk_ranked(tf, [F.desc("freq"), F.asc("pair")], 20)


# ---------------------------------------------------------------------------
# K1 via pyspark.ml.feature (the MLlib tokenization pipeline, next to the
# Column-expression path used everywhere else): RegexTokenizer ->
# StopWordsRemover (the shared fixture stoplist) -> NGram(2). All three
# transformers emit deterministic string arrays, so unlike HashingTF
# this ml pipeline carries a full value-level oracle. Each transformer
# is a narrow map over the corpus — no shuffle until the final stats.
# ---------------------------------------------------------------------------
@query(
    "ml_tokenizer_ngram_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '),
                         x -> NOT list_contains({_STOPLIST_SQL}, x)) AS kept
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_kept_tokens,
           CAST(greatest(len(kept) - 1, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN len(kept) >= 2 THEN kept[1] || ' ' || kept[2]
                ELSE NULL END AS first_bigram
    FROM t
    """,
    operators=("K1", "K2", "H1", "H7"),
)
def ml_tokenizer_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import NGram, RegexTokenizer, StopWordsRemover

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=" ", toLowercase=False
    ).transform(docs)
    # caseSensitive=True matches the oracle's case-sensitive list_contains
    # (the default case-folding would silently diverge on capitalized
    # stopwords, which the lowercase fixture corpus never exercises).
    kept = StopWordsRemover(
        inputCol="toks",
        outputCol="kept",
        stopWords=list(TX.STOPWORDS),
        caseSensitive=True,
    ).transform(toks)
    grams = NGram(n=2, inputCol="kept", outputCol="bigrams").transform(kept)
    return grams.select(
        "doc_id",
        F.size("kept").cast("bigint").alias("n_kept_tokens"),
        F.greatest(F.size("kept") - 1, F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.when(F.size("kept") >= 2, F.element_at("bigrams", 1)).alias(
            "first_bigram"
        ),
    )


# ---------------------------------------------------------------------------
# K2: PMI term-association mining — pointwise mutual information of
# adjacent token pairs vs their unigram marginals, the classic
# collocation / query-expansion statistic. Three linear aggregates
# (bigram counts, unigram counts, totals); the join fan-in is
# vocabulary-sized, far below corpus size, and the top-k is
# TakeOrdered. Restricted to pairs seen >= 5 times so the PMI isn't
# dominated by singleton noise.
# ---------------------------------------------------------------------------
@query(
    "term_pmi_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                   i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
      FROM toks
    ),
    bigrams AS (
      SELECT p.a AS a, p.b AS b, count(*) AS nab FROM bg GROUP BY p.a, p.b
    ),
    uni AS (
      SELECT unnest(t) AS term FROM toks
    ),
    ucnt AS (SELECT term, count(*) AS n FROM uni GROUP BY term),
    tot AS (
      SELECT CAST(sum(nab) AS DOUBLE) AS n_pairs,
             (SELECT CAST(sum(n) AS DOUBLE) FROM ucnt) AS n_terms
      FROM bigrams
    )
    SELECT a, b, CAST(nab AS BIGINT) AS nab,
           round(ln((nab / tot.n_pairs)
                 / ((ua.n / tot.n_terms) * (ub.n / tot.n_terms))), 6) AS pmi
    FROM bigrams
    JOIN ucnt ua ON ua.term = a
    JOIN ucnt ub ON ub.term = b
    CROSS JOIN tot
    WHERE nab >= 5
    ORDER BY pmi DESC, a, b
    LIMIT 20
    """,
    operators=("K2", "H7", "H8", "D1", "C1", "F2"),
)
def term_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        F.explode(TX.word_shingles("text", 2)).alias("pair")
    ).select(
        F.split("pair", " ").getItem(0).alias("a"),
        F.split("pair", " ").getItem(1).alias("b"),
    )
    bigrams = pairs.groupBy("a", "b").agg(F.count("*").alias("nab"))
    uni = docs.select(F.explode(TX.tokens("text")).alias("term"))
    ucnt = uni.groupBy("term").agg(F.count("*").alias("n"))
    tot = bigrams.agg(F.sum("nab").cast("double").alias("n_pairs")).crossJoin(
        ucnt.agg(F.sum("n").cast("double").alias("n_terms"))
    )
    ua = ucnt.select(F.col("term").alias("a"), F.col("n").alias("na"))
    ub = ucnt.select(F.col("term").alias("b"), F.col("n").alias("nb"))
    scored = (
        bigrams.filter(F.col("nab") >= 5)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("nab").cast("bigint").alias("nab"),
            F.round(
                F.log(
                    (F.col("nab") / F.col("n_pairs"))
                    / ((F.col("na") / F.col("n_terms")) * (F.col("nb") / F.col("n_terms")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b")).limit(20)


# ---------------------------------------------------------------------------
# K2: distinctive terms per source — each source's top-3 terms by
# smoothed log-ratio of in-source rate vs corpus rate, the "what makes
# this source different" view used to spot contaminated or off-domain
# feeds. Two keyed aggregates (term x source, term) + a vocabulary-
# sized join; the per-source ranking window partitions by source.
# ---------------------------------------------------------------------------
@query(
    "source_distinctive_terms",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    st AS (SELECT source, term, count(*) AS n FROM tok GROUP BY source, term),
    stot AS (SELECT source, CAST(sum(n) AS DOUBLE) AS tot FROM st GROUP BY source),
    g AS (SELECT term, count(*) AS gn FROM tok GROUP BY term),
    gtot AS (SELECT CAST(count(*) AS DOUBLE) AS gt FROM tok),
    scored AS (
      SELECT st.source, st.term,
             round(ln(((st.n + 1.0) / (stot.tot + 1.0))
                   / ((g.gn + 1.0) / ((SELECT gt FROM gtot) + 1.0))), 6) AS log_ratio
      FROM st JOIN stot USING (source) JOIN g USING (term)
      WHERE st.n >= 5
    )
    SELECT source, term, log_ratio,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY log_ratio DESC, term) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 3
    """,
    operators=("K2", "D1", "C1", "E4", "H6"),
)
def source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(TX.tokens("text")).alias("term"))
    st = tok.groupBy("source", "term").agg(F.count("*").alias("n"))
    stot = st.groupBy("source").agg(F.sum("n").cast("double").alias("tot"))
    g = tok.groupBy("term").agg(F.count("*").alias("gn"))
    gtot = tok.agg(F.count("*").cast("double").alias("gt"))
    scored = (
        st.filter(F.col("n") >= 5)
        .join(stot, "source")
        .join(g, "term")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            "term",
            F.round(
                F.log(
                    ((F.col("n") + 1.0) / (F.col("tot") + 1.0))
                    / ((F.col("gn") + 1.0) / (F.col("gt") + 1.0))
                ),
                6,
            ).alias("log_ratio"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("log_ratio"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# K2: vocabulary growth curve (Heaps'-law profile) — cumulative distinct
# vocabulary after each decile of the corpus, computed WITHOUT any
# ordered scan: each term reduces to its FIRST-occurrence doc (one
# min-aggregate), first-occurrence docs bucket into deciles, and the
# cumulative sum runs over 10 rows. Sub-linear growth is healthy;
# near-linear growth means unbounded junk vocabulary (OCR noise, ids) —
# the tokenizer-budget planning signal.
# ---------------------------------------------------------------------------
@query(
    "vocab_growth_curve",
    oracle="""
    WITH n AS (SELECT count(*) AS nd FROM documents),
    first_seen AS (
      SELECT term, min(doc_id) AS first_doc
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    by_decile AS (
      SELECT CAST((first_doc * 10) // (SELECT nd FROM n) + 1 AS BIGINT) AS decile,
             count(*) AS new_terms
      FROM first_seen GROUP BY 1
    )
    SELECT decile, CAST(new_terms AS BIGINT) AS new_terms,
           CAST(sum(new_terms) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
    FROM by_decile
    """,
    operators=("K2", "D1", "E3", "H6"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nd = docs.agg(F.count("*").alias("nd"))
    first_seen = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    by_decile = (
        first_seen.crossJoin(F.broadcast(nd))
        .groupBy(
            ((F.col("first_doc") * 10 / F.col("nd")).cast("bigint") + 1).alias(
                "decile"
            )
        )
        .agg(F.count("*").alias("new_terms"))
    )
    # 10-row cumulative over a bounded input. The partition key must hash
    # a REAL column (ranking._zero): pmod(xxhash64(lit(0)), 1) is foldable
    # — Catalyst strips it and the window silently degrades to the
    # single-partition "No Partition Defined" form.
    w = (
        Window.partitionBy(_zero(F.col("decile")))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return by_decile.select(
        "decile",
        F.col("new_terms").cast("bigint").alias("new_terms"),
        F.sum("new_terms").over(w).cast("bigint").alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# K2: language-tag consistency — per declared language, how many docs
# carry an English-stopword ratio that contradicts the tag (non-en docs
# loaded with en stopwords, en docs with none) — the metadata-vs-
# content audit run before trusting per-language corpus budgets. Pure
# expression work + one per-lang conditional aggregate.
# ---------------------------------------------------------------------------
@query(
    "lang_tag_consistency",
    oracle="""
    WITH t AS (
      SELECT lang,
             CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'for'], x))) AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS en_stop_ratio
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(en_stop_ratio), 6) AS avg_en_stop_ratio,
           CAST(sum(CASE WHEN lang <> 'en' AND en_stop_ratio > 0.2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect_nonen,
           CAST(sum(CASE WHEN lang = 'en' AND en_stop_ratio < 0.02
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect_en
    FROM t GROUP BY lang
    """,
    operators=("K2", "B8", "D1", "H8"),
)
def lang_tag_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ratio = TX.stopword_ratio("text")
    t = docs.select("lang", F.coalesce(ratio, F.lit(0.0)).alias("r"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("r"), 6).alias("avg_en_stop_ratio"),
        F.sum(
            F.when((F.col("lang") != "en") & (F.col("r") > 0.2), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_suspect_nonen"),
        F.sum(
            F.when((F.col("lang") == "en") & (F.col("r") < 0.02), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_suspect_en"),
    )


# ---------------------------------------------------------------------------
# K2/H2: encoding-noise screen — share of characters outside printable
# ASCII per declared language. High ratios in a Latin-script language
# flag mojibake / OCR damage; near-zero in zh flags transliterated or
# mis-tagged text. One regexp_replace per row, per-lang aggregate.
# ---------------------------------------------------------------------------
@query(
    "nonascii_ratio_by_lang",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(CAST(len(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE)
                     / greatest(len(text), 1)), 6) AS avg_nonascii_ratio,
           CAST(sum(CASE WHEN len(regexp_replace(text, '[ -~]', '', 'g')) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_nonascii
    FROM documents
    GROUP BY lang
    """,
    operators=("K2", "H2", "H1", "D1"),
)
def nonascii_ratio_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_nonascii = F.length(F.regexp_replace("text", "[ -~]", ""))
    ratio = n_nonascii.cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(ratio), 6).alias("avg_nonascii_ratio"),
        F.sum(F.when(n_nonascii > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_nonascii"),
    )


# ---------------------------------------------------------------------------
# K1 tokenizer TRAINING: real iterative BPE — bpe_merge_pair_counts shows
# round-0 statistics; this runs the actual merge loop. Per round: one
# weighted pair count over the word-frequency table (vocab-bounded, NOT
# corpus-bounded — identical work at any corpus size once words are
# counted), a 1-row TakeOrdered argmax collect, and an Arrow-batched
# merge of the symbol sequences. Deterministic by construction (count
# desc, then lexicographic pair tiebreak), so reruns are bit-identical —
# pytest-gated (tests/test_operators.py) like the other iterative
# algorithms (connected components, PageRank) — AND, because the round
# count is fixed, the whole loop unrolls into a value-level DuckDB
# oracle (_BPE_ORACLE below): greedy left-to-right pair merging is
# string replace() on a space-separated symbol representation.
# ---------------------------------------------------------------------------
_BPE_ROUNDS = 5


def _bpe_oracle_stage(r: int) -> str:
    return f"""
pairs{r} AS (
  SELECT p.pair[1] AS a, p.pair[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq, unnest(list_zip(syms, syms[2:])) AS pair
    FROM (SELECT freq, string_split(trim(rep), '  ') AS syms FROM vocab{r})
  ) p
  WHERE p.pair[2] IS NOT NULL
  GROUP BY 1, 2
), best{r} AS (
  SELECT a, b, cnt FROM pairs{r} ORDER BY cnt DESC, a, b LIMIT 1
), vocab{r + 1} AS (
  SELECT word, freq,
         replace(rep, ' ' || best{r}.a || '  ' || best{r}.b || ' ',
                 ' ' || best{r}.a || best{r}.b || ' ') AS rep
  FROM vocab{r} CROSS JOIN best{r}
)"""


# The FULL merge loop has a value-level oracle: fixed rounds unroll into
# chained CTE stages, and the greedy left-to-right non-overlapping pair
# merge is SQL replace() on a DOUBLE-space-delimited symbol string whose
# match pattern consumes only the inner half of each boundary
# (' a  b ' -> ' ab '). With single spaces, adjacent occurrences share
# the delimiter and replace() under-merges ('abab' kept ' ab a b ' while
# the Spark loop produced ['ab','ab'] — the round-4 advisor finding);
# with half-consumed double boundaries every greedy left-to-right match
# has its own delimiters, so the two scans agree on all inputs
# (tests/test_operators.py::test_bpe_oracle_adjacent_repeats).
_BPE_ORACLE = (
    """WITH vocab0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         '  ' || array_to_string(regexp_split_to_array(word, ''), '  ') || '  ' AS rep
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),"""
    + ",".join(_bpe_oracle_stage(r) for r in range(_BPE_ROUNDS))
    + "\nSELECT * FROM (\n"
    + " UNION ALL ".join(
        f'SELECT CAST({r + 1} AS BIGINT) AS merge_rank, a AS "left",'
        f' b AS "right", a || b AS merged, cnt AS pair_count FROM best{r}'
        for r in range(_BPE_ROUNDS)
    )
    + ")"
)


@query("bpe_train_merges", oracle=_BPE_ORACLE, operators=("K1", "K2", "D1"))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, merged string, pair_count long"
    ).select(
        F.col("merge_rank").cast("long").alias("merge_rank"),
        "left",
        "right",
        "merged",
        "pair_count",
    )


def _bpe_greedy_merge(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right non-overlapping (a, b) -> ab — the exact
    scan the oracle's half-consumed double-space replace() performs."""
    res, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            res.append(a + b)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _bpe_train_on_vocab(vocab: list, rounds: int) -> list:
    """Driver-side merge training on a collected (word, freq) vocab —
    the classic BPE trainer shape (one corpus pass upstream, then a
    pure-Python loop over the vocab, which fits in memory by
    construction: Heap's law bounds distinct words far below corpus
    tokens). Semantics are IDENTICAL to the former per-round Spark
    loop: pair counts are freq-weighted adjacent POSITIONS (overlaps
    counted), argmax tiebreak count desc then (a, b) ascending, merges
    applied greedy left-to-right. Mutates ``vocab`` syms in place;
    returns the merge table."""
    merges = []
    for rank in range(rounds):
        counts: dict = {}
        for _, freq, syms in vocab:
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + freq
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank + 1, a, b, a + b, int(cnt)))
        for entry in vocab:
            syms = entry[2]
            if len(syms) >= 2:
                entry[2] = _bpe_greedy_merge(syms, a, b)
    return merges


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = _BPE_ROUNDS, min_freq: int = 1
) -> tuple[list, DataFrame]:
    """Production-shape BPE training (round-8 verdict #5): ONE Spark job
    aggregates the word-frequency vocab; merge training is a driver
    loop over that vocab (ZERO jobs per merge — the former per-round
    pair-count job + argmax collect + checkpoint multiplied job count
    by the merge count, 32k jobs for a 32k vocab); the learned merge
    table then applies back to the distributed vocab in ONE
    mapInPandas pass for downstream consumers. Output is bit-identical
    to the per-round Spark loop (same unrolled-CTE oracle;
    tools/bpe_probe.py pins job-count-vs-rounds flatness).

    At 100 TB the collected vocab is distinct-words-bounded by Heap's
    law AND prunable: ``min_freq`` drops hapax/noise words BEFORE the
    collect (tokenizer trainers standardly prune; the default 1 keeps
    the fixtures' few-thousand-row vocab exact for the oracle)."""
    docs = load(spark, sf_dir, "documents")
    vocab_df = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if min_freq > 1:
        vocab_df = vocab_df.filter(F.col("freq") >= min_freq)
    rows = vocab_df.collect()  # THE one Spark job before training; vocab-bounded
    vocab = [[r.word, int(r.freq), list(r.word)] for r in rows]
    merges = _bpe_train_on_vocab(vocab, rounds)

    # distributed apply of the full merge table in rank order — what a
    # tokenizer-application job does with the trained artifact
    merge_pairs = [(m[1], m[2]) for m in merges]

    def apply_all(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                for a, b in merge_pairs:
                    if len(syms) >= 2:
                        syms = _bpe_greedy_merge(syms, a, b)
                out.append(syms)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    final_vocab = vocab_df.withColumn("syms", F.expr("split(word, '')")).mapInPandas(
        apply_all, "word string, freq long, syms array<string>"
    )
    return merges, final_vocab


# ---------------------------------------------------------------------------
# K1 tokenizer loop CLOSED: apply the learned merges back to the corpus
# and measure what they bought — symbols per corpus occurrence before vs
# after the 5 merges (the compression a BPE vocab exists to deliver).
# Same unrolled-CTE oracle as the trainer: vocab5's double-space rep
# yields the post-merge symbol counts exactly.
# ---------------------------------------------------------------------------
@query(
    "bpe_compression_ratio",
    oracle=(
        """WITH vocab0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         '  ' || array_to_string(regexp_split_to_array(word, ''), '  ') || '  ' AS rep
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),"""
        + ",".join(_bpe_oracle_stage(r) for r in range(_BPE_ROUNDS))
        + f"""
    SELECT CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(freq * len(string_split(trim(v0.rep), '  '))) AS BIGINT)
             AS symbols_before,
           CAST(sum(freq * len(string_split(trim(v5.rep), '  '))) AS BIGINT)
             AS symbols_after,
           round(sum(freq * len(string_split(trim(v5.rep), '  ')))
                 / CAST(sum(freq * len(string_split(trim(v0.rep), '  '))) AS DOUBLE), 6)
             AS compression_ratio
    FROM vocab0 v0 JOIN vocab{_BPE_ROUNDS} v5 USING (word, freq)
    """
    ),
    operators=("K1", "K2", "D2", "L5"),
)
def bpe_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-weighted symbols-per-occurrence before/after the learned
    merges — the number a tokenizer training run reports."""
    _, vocab = _bpe_train(spark, sf_dir)
    return vocab.agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * F.length("word")).cast("bigint").alias("symbols_before"),
        F.sum(F.col("freq") * F.size("syms")).cast("bigint").alias("symbols_after"),
        F.round(
            F.sum(F.col("freq") * F.size("syms"))
            / F.sum(F.col("freq") * F.length("word")).cast("double"),
            6,
        ).alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# K1 token counting, BPE-ish regex flavor: the GPT-style pre-tokenizer
# classes (letter runs | digit runs | single punctuation) instead of
# whitespace splitting — the count that actually predicts byte-pair
# token budgets (punctuation and numbers tokenize separately). Pure
# regexp expression, one aggregate; the whitespace count rides along so
# the per-language inflation factor (regex/ws) is the deliverable.
# ---------------------------------------------------------------------------
_BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@query(
    "token_count_bpe_regex",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4) AS avg_ws_tokens,
           round(avg(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}'))), 4)
             AS avg_bpe_tokens,
           round(avg(CAST(len(regexp_extract_all(text, '{_BPE_TOKEN_RE}')) AS DOUBLE)
                     / greatest(len(string_split(text, ' ')), 1)), 6)
             AS avg_inflation
    FROM documents
    GROUP BY lang
    """,
    operators=("K1", "K2", "H2", "D1"),
)
def token_count_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{_BPE_TOKEN_RE}', 0)"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(ws), 4).alias("avg_ws_tokens"),
        F.round(F.avg(bpe), 4).alias("avg_bpe_tokens"),
        F.round(
            F.avg(bpe.cast("double") / F.greatest(ws, F.lit(1))), 6
        ).alias("avg_inflation"),
    )


# ---------------------------------------------------------------------------
# H4/K2 document fingerprinting via a TRUE rolling hash (Rabin-Karp
# polynomial over 8-char windows, B=257 mod 2^31-1) + winnowing-style
# selection (min hash per block of 16 positions — the MOSS fingerprint
# scheme). Every operation is exact integer arithmetic, so the oracle
# matches bit-for-bit with no rounding discipline needed. At 100 TB the
# position explode is the cost knob — winnowing keeps the STORED
# fingerprints at len/16 per doc, which is the point of the scheme.
# (doc_fingerprints is the whole-document md5 flavor; this is the
# substring-resolution flavor plagiarism/overlap detectors need.)
# ---------------------------------------------------------------------------
_RH_POWERS = [1, 257, 66049, 16974593, 67503107, 168429323, 336663071, 623063367]
_RH_MOD = 2147483647
_RH_BLOCK = 16


def _rh_terms_sql(textref: str, posref: str) -> str:
    return " + ".join(
        f"(ascii(substr({textref}, CAST({posref} + {j} AS INTEGER), 1)) * "
        f"{p}::BIGINT % {_RH_MOD})"
        for j, p in enumerate(_RH_POWERS)
    )


@query(
    "doc_winnowing_fingerprints",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p
      FROM documents WHERE doc_id < 200
    ),
    h AS (
      SELECT doc_id, p, ({_rh_terms_sql('text', 'p')}) % {_RH_MOD} AS rh
      FROM pos
    ),
    fp AS (
      SELECT doc_id, (p - 1) // {_RH_BLOCK} AS block, min(rh) AS fp
      FROM h GROUP BY doc_id, (p - 1) // {_RH_BLOCK}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
           CAST(min(fp) AS BIGINT) AS min_fp,
           CAST(max(fp) AS BIGINT) AS max_fp
    FROM fp GROUP BY doc_id
    """,
    operators=("H4", "K2", "H1", "D1"),
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pos = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)))
        ).alias("p"),
    )
    terms = None
    for j, pw in enumerate(_RH_POWERS):
        c = F.ascii(F.expr(f"substr(text, CAST(p + {j} AS INT), 1)")).cast("long")
        t = (c * F.lit(pw).cast("long")) % F.lit(_RH_MOD).cast("long")
        terms = t if terms is None else terms + t
    h = pos.select("doc_id", "p", (terms % F.lit(_RH_MOD)).alias("rh"))
    fp = (
        h.groupBy("doc_id", F.expr(f"(p - 1) div {_RH_BLOCK}").alias("block"))
        .agg(F.min("rh").alias("fp"))
    )
    return fp.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_fingerprints"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct"),
        F.min("fp").cast("bigint").alias("min_fp"),
        F.max("fp").cast("bigint").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# H4/G5: winnowing OVERLAP pairs — the use the fingerprints exist for.
# Two docs sharing >= 5 distinct winnowed fingerprints share real
# substring content (each fingerprint witnesses an identical 8-char
# window that survived min-selection in both). The join is an equi-join
# on fingerprint — the inverted-index shape again, never all-pairs;
# shared-everywhere fingerprints (boilerplate) are the skew axis and the
# df-cap prefilter is the standard lossy escalation.
# ---------------------------------------------------------------------------
_WINNOW_MIN_SHARED = 5


@query(
    "winnowing_overlap_pairs",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p
      FROM documents WHERE doc_id < 200
    ),
    h AS (
      SELECT doc_id, p, ({_rh_terms_sql('text', 'p')}) % {_RH_MOD} AS rh
      FROM pos
    ),
    fp AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, (p - 1) // {_RH_BLOCK} AS block, min(rh) AS fp
        FROM h GROUP BY doc_id, (p - 1) // {_RH_BLOCK}
      )
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(count(*) AS BIGINT) AS n_shared_fps
    FROM fp a JOIN fp b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {_WINNOW_MIN_SHARED}
    """,
    operators=("H4", "G5", "C1", "D1"),
)
def winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pos = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)))
        ).alias("p"),
    )
    terms = None
    for j, pw in enumerate(_RH_POWERS):
        c = F.ascii(F.expr(f"substr(text, CAST(p + {j} AS INT), 1)")).cast("long")
        t = (c * F.lit(pw).cast("long")) % F.lit(_RH_MOD).cast("long")
        terms = t if terms is None else terms + t
    h = pos.select("doc_id", "p", (terms % F.lit(_RH_MOD)).alias("rh"))
    fp = (
        h.groupBy("doc_id", F.expr(f"(p - 1) div {_RH_BLOCK}").alias("block"))
        .agg(F.min("rh").alias("fp"))
        .select("doc_id", "fp")
        .distinct()
    )
    a = fp.select(F.col("doc_id").alias("a_id"), "fp")
    b = fp.select(F.col("doc_id").alias("b_id"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("bigint").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= _WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# K2 language-ID, the real n-gram heuristic: per-language character-
# trigram PROFILES (top-20 trigrams by corpus frequency, the classic
# Cavnar-Trenkle shape) self-trained from the labeled corpus, then each
# doc classified by profile-overlap count (argmax, lexicographic lang
# tiebreak). Output is the confusion matrix — the audit view that says
# whether the declared lang tags are trustworthy. Profiles are
# vocabulary-bounded (langs x 20 rows) and broadcast; the doc side is
# one explode + join. Deterministic => full value oracle.
# ---------------------------------------------------------------------------
_LANGPROF_TOP = 20


@query(
    "lang_trigram_confusion",
    oracle=f"""
    WITH tri AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(length(text) - 2, 0)),
               i -> substr(lower(text), CAST(i AS INTEGER), 3)))) AS g
      FROM documents
    ),
    prof AS (
      SELECT lang, g FROM (
        SELECT lang, g, count(*) AS n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, g) AS rn
        FROM tri GROUP BY lang, g
      ) WHERE rn <= {_LANGPROF_TOP}
    ),
    scores AS (
      SELECT t.doc_id, t.lang AS true_lang, p.lang AS cand_lang,
             count(*) AS score
      FROM tri t JOIN prof p ON p.g = t.g
      GROUP BY t.doc_id, t.lang, p.lang
    ),
    pred AS (
      SELECT doc_id, true_lang, cand_lang AS pred_lang FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cand_lang) AS rn
        FROM scores
      ) WHERE rn = 1
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    """,
    operators=("K2", "H2", "E1", "D1"),
)
def lang_trigram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # trigram explode via expr: substring-with-column-start needs the SQL
    # form inside the transform lambda
    tri = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, greatest(length(text) - 2, 0)),"
                " i -> substring(lower(text), i, 3)))"
            )
        ).alias("g"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("g"))
    prof = (
        tri.groupBy("lang", "g")
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _LANGPROF_TOP)
        .select(F.col("lang").alias("cand_lang"), "g")
    )
    scores = (
        tri.join(F.broadcast(prof), "g")
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    wp = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    pred = (
        scores.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# H3 second cover: near-identical part names (edit distance <= 2) — the
# catalog-hygiene scan that finds typo'd duplicate product entries.
# Bounded slice; at scale the blocking key (first 4 chars) turns the
# cross join into a per-block join.
# ---------------------------------------------------------------------------
@query(
    "part_name_typo_pairs",
    oracle="""
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
    WHERE a.p_partkey < 100 AND b.p_partkey < 100
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    operators=("H3", "C7", "B2"),
)
def part_name_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    a = part.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        F.substring("p_name", 1, 4).alias("blk"),
    )
    b = part.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.substring("p_name", 1, 4).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a_key") < F.col("b_key"))
        .withColumn("edit_dist", F.levenshtein("a_name", "b_name").cast("bigint"))
        .filter(F.col("edit_dist") <= 2)
        .select("a_key", "b_key", "edit_dist")
    )


# ---------------------------------------------------------------------------
# K2/H2: character-class profile per language — the encoding/content
# census (letter/digit/punctuation/space shares) that catches OCR noise,
# markup leakage, and mis-tagged languages in one scan of regex counts.
# ---------------------------------------------------------------------------
@query(
    "char_class_profile",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(len(regexp_extract_all(text, '[a-zA-Z]'))
                     / greatest(length(text), 1)), 6) AS letter_share,
           round(avg(len(regexp_extract_all(text, '[0-9]'))
                     / greatest(length(text), 1)), 6) AS digit_share,
           round(avg(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                     / greatest(length(text), 1)), 6) AS punct_share
    FROM documents GROUP BY lang
    """,
    operators=("K2", "H2", "H1", "D1"),
)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ln = F.greatest(F.length("text"), F.lit(1))

    def share(pat: str):
        return F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)")).cast(
            "double"
        ) / ln

    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg(share("[a-zA-Z]")), 6).alias("letter_share"),
        F.round(F.avg(share("[0-9]")), 6).alias("digit_share"),
        F.round(F.avg(share("[^a-zA-Z0-9 ]")), 6).alias("punct_share"),
    )
