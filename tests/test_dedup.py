"""Dedup invariants (SURVEY.md §5.3.3): exact, MinHash, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.operators.dedup import minhash_candidate_pairs, simhash


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_collapses_normalized_duplicates(spark):
    df = _docs(
        spark,
        [
            (1, "Hello   World"),
            (2, "  hello world "),
            (3, "something else entirely"),
        ],
    )
    n = df.withColumn("h", TX.content_hash("text")).select("h").distinct().count()
    assert n == 2


def test_minhash_finds_injected_near_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " tomorrow"
    far = "completely different words about spark shuffles and parquet scans here"
    df = _docs(spark, [(1, base), (2, near), (3, far)])
    pairs = minhash_candidate_pairs(df, dist_threshold=0.5).collect()
    found = {(r.a_id, r.b_id) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found


def test_minhash_no_false_merge_on_disjoint_vocab(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight"),
        ],
    )
    assert minhash_candidate_pairs(df, dist_threshold=0.5).count() == 0


def test_simhash_identical_docs_same_signature(spark):
    df = _docs(spark, [(1, "spark shuffles parquet scans"), (2, "spark shuffles parquet scans")])
    rows = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert rows[1] == rows[2]


def test_simhash_deterministic_across_runs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    a = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert a == b and len(a) == 20


def test_simhash_banding_provable_recall(spark, sf_dir):
    """Pigeonhole guarantee: 4 bands catch EVERY pair with hamming <= 3.
    Compare the banded equi-join against brute-force over signatures."""
    from pyspark.sql import functions as F2

    from cloudvectordb_spark.catalog import load as load2
    from cloudvectordb_spark.operators.dedup import (
        _SIMHASH_HAM_T,
        simhash,
        simhash_band_pairs,
    )

    docs = load2(spark, sf_dir, "documents").filter(F2.col("doc_id") < 200)
    sigs = simhash(docs)
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_band_pairs(sigs).collect()
    }

    local = sorted((r["doc_id"], r["simhash"]) for r in sigs.collect())
    want = {}
    for i in range(len(local)):
        for j in range(i + 1, len(local)):
            h = bin(local[i][1] ^ local[j][1]).count("1")
            if h <= _SIMHASH_HAM_T:
                want[(local[i][0], local[j][0])] = h
    assert got == want
    for h in got.values():
        assert 0 <= h <= _SIMHASH_HAM_T


def test_pagerank_conserves_mass(spark, sf_dir):
    """PageRank over the near-dup graph: ranks are a probability
    distribution (sum 1) because symmetric edges leave no dangling mass."""
    from cloudvectordb_spark.operators.graph import doc_similarity_pagerank

    rows = doc_similarity_pagerank(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["rank"] > 0
        assert r["degree"] >= 1


def test_incremental_band_pairs_pigeonhole_recall(spark, sf_dir):
    """Every (new, corpus) pair within hamming <= 3 must survive the
    banded cross-join — pigeonhole over 4 bands, asymmetric variant."""
    from cloudvectordb_spark.operators.dedup import simhash_band_pairs_between

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sigs = simhash(docs, hash_fn="md5").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    is_new = F.col("source").isin("src0", "src1", "src2")
    new_s, old_s = sigs.filter(is_new), sigs.filter(~is_new)
    got = {
        (r.new_id, r.corpus_id)
        for r in simhash_band_pairs_between(new_s, old_s, nbits=60).collect()
    }
    brute = (
        new_s.select(F.col("doc_id").alias("n_id"), F.col("simhash").alias("ns"))
        .crossJoin(
            old_s.select(F.col("doc_id").alias("o_id"), F.col("simhash").alias("os"))
        )
        .withColumn("h", F.bit_count(F.col("ns").bitwiseXOR(F.col("os"))))
        .filter(F.col("h") <= 3)
        .collect()
    )
    assert {(r.n_id, r.o_id) for r in brute} <= got


def test_connected_components_chain_converges_logarithmically(spark):
    """Round-9: pointer doubling must make CC rounds O(log diameter) —
    a 64-node chain (worst case for plain min-label propagation, which
    needs 63 rounds = 63 full shuffles) must finish in <= 10, with the
    correct single component. Star and two-cluster shapes sanity-check
    the labels."""
    from cloudvectordb_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    stats: dict = {}
    labels = {
        r.node: r.component
        for r in connected_components(
            chain, stats=stats, driver_threshold=0  # force distributed
        ).collect()
    }
    assert stats["mode"] == "distributed"
    assert set(labels.values()) == {0} and len(labels) == 64
    assert stats["rounds"] <= 10, f"chain took {stats['rounds']} rounds"

    two = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src long, dst long"
    )
    got = {
        r.node: r.component for r in connected_components(two).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_driver_mode_matches_distributed(spark):
    """The bounded-graph driver union-find (the CorpusPipeline.append
    fast path) must produce the EXACT labels the distributed
    propagation does on the same graph — chains, a star, a cycle,
    self-loops and duplicate/reversed edges all at once."""
    from cloudvectordb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)]          # a chain
        + [(100, x) for x in (101, 102, 103)]    # a star
        + [(200, 201), (201, 202), (202, 200)]   # a cycle
        + [(300, 300), (301, 300), (300, 301)],  # self-loop + dup/reversed
        "src long, dst long",
    )
    s1: dict = {}
    s2: dict = {}
    a = {
        r.node: r.component
        for r in connected_components(edges, stats=s1).collect()
    }
    b = {
        r.node: r.component
        for r in connected_components(
            edges, stats=s2, driver_threshold=0
        ).collect()
    }
    assert s1["mode"] == "driver" and s2["mode"] == "distributed"
    assert a == b and set(a.values()) == {0, 100, 200, 300}


def test_simhash_fast_bit_identical_to_expression_form(spark, sf_dir):
    """The vectorized xxhash64 signature path (ONE groupBy of hash
    lists + numpy vote/pack — no 64x per-bit row amplification) must be
    bit-identical to the expression form, including sign-bit packing."""
    from cloudvectordb_spark.operators.dedup import simhash, simhash_fast

    docs = load(spark, sf_dir, "documents")
    a = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash_fast(docs).collect()}
    assert a == b and len(a) > 0
    assert any(v < 0 for v in a.values()), "fixture should exercise bit 63"


def test_minhash_fast_twin_quality_and_exact_dup_invariant(spark, sf_dir):
    """The xxhash64 production twin must (a) give est_jaccard exactly
    1.0 for identical shingle sets — an exact duplicate can never
    escape whatever the hash function is — and (b) recover planted
    one-word-edit near-dups at least as well as the md5 oracle form
    on the same corpus."""
    import pandas as pd

    from cloudvectordb_spark.operators.dedup import (
        minhash_banded_pairs_df,
        minhash_banded_pairs_fast,
    )

    # planted corpus: every 10th doc near-duplicates its predecessor
    # (probe generator shape), plus one EXACT duplicate pair
    from tools.minhash_scale_probe import synthetic_docs

    docs = synthetic_docs(spark, 3000, parts=4)
    exact_pair = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1_000_001, 1_000_002],
                "text": ["alpha beta gamma delta epsilon zeta"] * 2,
            }
        )
    )
    corpus = docs.unionByName(exact_pair)

    fast = minhash_banded_pairs_fast(corpus).persist()
    exact_hits = fast.filter(
        (F.col("a_id") == 1_000_001) & (F.col("b_id") == 1_000_002)
    ).collect()
    assert len(exact_hits) == 1 and exact_hits[0].est_jaccard == 1.0

    planted = 3000 // 10
    def recall(pairs_df):
        hits = pairs_df.filter(
            (F.col("est_jaccard") >= 0.5)
            & (F.col("b_id") == F.col("a_id") + 1)
            & (F.col("a_id") % 10 == 0)
            & (F.col("a_id") < 3000)
        ).count()
        return hits / planted

    r_fast = recall(fast)
    r_md5 = recall(minhash_banded_pairs_df(docs))
    fast.unpersist()
    assert r_fast >= 0.9, r_fast
    assert r_fast >= r_md5 - 0.05, (r_fast, r_md5)  # different perms, same guarantee


def test_minhash_sig_pipeline_parity_both_hashers(spark, sf_dir):
    """The signature-level API (minhash_sigs -> minhash_pairs_within)
    must produce EXACTLY the fused pipelines' pairs for both hashers —
    it is the same banding scheme split at the persistable signature
    (the incremental-append state), so any drift here silently breaks
    append-vs-rebuild equality."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.dedup import (
        minhash_banded_pairs_df,
        minhash_banded_pairs_fast,
        minhash_pairs_within,
        minhash_sigs,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    for hasher, fused in (
        ("md5", minhash_banded_pairs_df),
        ("fast", minhash_banded_pairs_fast),
    ):
        got = {
            (r.a_id, r.b_id, r.est_jaccard)
            for r in minhash_pairs_within(minhash_sigs(docs, hasher)).collect()
        }
        want = {(r.a_id, r.b_id, r.est_jaccard) for r in fused(docs).collect()}
        assert got == want and want, hasher


def test_minhash_pairs_between_matches_within_on_split(spark, sf_dir):
    """Between-frame candidates == the within-frame pairs that cross an
    id split: the incremental join finds exactly the pairs a joint run
    would, no more, no less."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.dedup import (
        minhash_pairs_between,
        minhash_pairs_within,
        minhash_sigs,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sigs = minhash_sigs(docs, "fast")
    new_s = sigs.filter(F.col("doc_id") >= 150)
    old_s = sigs.filter(F.col("doc_id") < 150)
    got = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in minhash_pairs_between(new_s, old_s).collect()
    }
    want = {
        (r.b_id, r.a_id, r.est_jaccard)
        for r in minhash_pairs_within(sigs)
        .filter((F.col("a_id") < 150) & (F.col("b_id") >= 150))
        .collect()
    }
    assert got == want and want
