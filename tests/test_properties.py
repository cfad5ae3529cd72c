"""Property-based tests (SURVEY.md §5.3.3): vector algebra laws and
dedup invariants hold for arbitrary inputs, not just fixtures.

Strategy: hypothesis generates the data; ONE Spark DataFrame per example
batch is too slow, so examples are collected into a single frame per
property (deterministic derandomized profile) and checked in bulk.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from cloudvectordb_spark.functions import text as TX
from cloudvectordb_spark.functions import vector as V

DIM = 8

finite_f = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False, width=32
)
vec = st.lists(finite_f, min_size=DIM, max_size=DIM)


def _vector_frame(spark, pairs):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        schema="id long, va array<float>, vb array<float>",
    )


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=30))
def test_cosine_symmetry_and_bounds(spark, pairs):
    df = _vector_frame(spark, pairs)
    rows = df.select(
        V.cosine("va", "vb").alias("ab"), V.cosine("vb", "va").alias("ba")
    ).collect()
    for r in rows:
        if r.ab is None:  # zero-norm input -> NULL by contract
            assert r.ba is None
            continue
        assert math.isclose(r.ab, r.ba, rel_tol=0, abs_tol=0), "cosine must be symmetric"
        assert -1.0 - 1e-9 <= r.ab <= 1.0 + 1e-9, "cosine out of [-1, 1]"


@settings(max_examples=30, deadline=None)
@given(st.lists(vec, min_size=1, max_size=30))
def test_self_cosine_is_one_and_normalize_idempotent(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], schema="id long, va array<float>"
    )
    out = df.select(
        "id",
        V.cosine("va", "va").alias("self_cos"),
        V.l2_norm(V.l2_normalize("va")).alias("unit_norm"),
        V.l2_norm(V.l2_normalize(V.l2_normalize("va"))).alias("unit_norm2"),
        V.l2_norm("va").alias("norm"),
    ).collect()
    for r in out:
        if r.norm == 0.0:
            assert r.self_cos is None
            continue
        assert math.isclose(r.self_cos, 1.0, abs_tol=1e-6), "cos(v, v) == 1"
        # float32 storage of normalized elements costs ~1e-7 per element
        assert math.isclose(r.unit_norm, 1.0, abs_tol=1e-5), "||normalize(v)|| == 1"
        assert math.isclose(
            r.unit_norm2, r.unit_norm, abs_tol=1e-5
        ), "normalize is idempotent"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=30))
def test_l2_distance_matches_numpy_and_triangle_zero(spark, pairs):
    df = _vector_frame(spark, pairs)
    rows = df.select("id", V.l2_distance("va", "vb").alias("d")).collect()
    for r in rows:
        a, b = pairs[r.id]
        expect = float(np.linalg.norm(np.array(a, dtype=np.float64) - np.array(b, dtype=np.float64)))
        # JVM sums sequentially over float32-stored elements; numpy float64
        # over the same post-storage values can differ only by accumulation
        assert math.isclose(r.d, expect, rel_tol=1e-5, abs_tol=1e-4)
        assert r.d >= 0.0


texts = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=40), min_size=1, max_size=25
)


@settings(max_examples=25, deadline=None)
@given(texts)
def test_exact_dedup_never_drops_distinct_normalized(spark, docs):
    """G4 invariant: hash-dedup keeps exactly one row per distinct
    normalized text — never fewer (no false merges beyond normalization,
    sha2-256 collisions out of scope)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], schema="id long, text string"
    )
    normed = df.withColumn("h", F.sha2(TX.normalize_text("text"), 256))
    kept = normed.dropDuplicates(["h"]).count()
    distinct_normed = {
        r.n for r in df.select(TX.normalize_text("text").alias("n")).collect()
    }
    assert kept == len(distinct_normed)


@settings(max_examples=25, deadline=None)
@given(texts)
def test_word_shingles_short_docs_yield_empty_not_error(spark, docs):
    """Regression (ADVICE r1): docs with fewer than n tokens must produce an
    empty shingle array, not SparkRuntimeException INVALID_PARAMETER_VALUE
    from a descending sequence(1, 0). Real corpora contain empty/short docs."""
    docs = list(docs) + ["", "one", "two words"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], schema="id long, text string"
    )
    rows = df.select(
        F.size(TX.tokens("text")).alias("ntok"),
        TX.word_shingles("text", 3).alias("sh"),
    ).collect()
    for r in rows:
        expected = max(r.ntok - 2, 0)
        assert len(r.sh) == expected
        for s in r.sh:
            assert len(s.split(" ")) == 3


@settings(max_examples=25, deadline=None)
@given(texts)
def test_stopword_ratio_in_unit_interval(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], schema="id long, text string"
    )
    rows = df.select(TX.stopword_ratio("text").alias("r")).collect()
    for r in rows:
        if r.r is not None:
            assert 0.0 <= r.r <= 1.0


# ---------------------------------------------------------------------------
# Global ranking primitives (ranking.py): the value-bucketed distributed
# row_number / prefix-sum must agree with the single-machine definition
# for ANY value distribution — duplicates, negatives, all-equal, skew.
# ---------------------------------------------------------------------------
rank_vals = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=1,
    max_size=50,
)


@settings(max_examples=20, deadline=None)
@given(rank_vals)
def test_global_row_number_matches_sorted_order(spark, vals):
    from cloudvectordb_spark.ranking import with_global_row_number

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {
        r.id: (r.rn, r._total_rows)
        for r in with_global_row_number(
            df, "v", [F.asc("id")], rn_col="rn"
        ).collect()
    }
    expect = {
        i: pos + 1
        for pos, (v, i) in enumerate(
            sorted((float(v), i) for i, v in enumerate(vals))
        )
    }
    assert {k: v[0] for k, v in got.items()} == expect
    assert all(v[1] == len(vals) for v in got.values())


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=50))
def test_global_prefix_sum_matches_python_cumsum(spark, weights):
    from cloudvectordb_spark.ranking import with_global_prefix_sum

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "k long, w long"
    )
    got = {
        r.k: r.cum_before
        for r in with_global_prefix_sum(df, "k", "w").collect()
    }
    acc, expect = 0, {}
    for i, w in enumerate(weights):
        expect[i] = acc
        acc += w
    assert got == expect


@settings(max_examples=20, deadline=None)
@given(rank_vals, st.integers(min_value=1, max_value=8))
def test_global_running_max_matches_python_scan(spark, vals, n_buckets):
    """with_global_running_max == the single-window running max for ANY
    values (duplicates, negatives, all-equal) and ANY monotone bucket
    width — including the 1-bucket degenerate case."""
    from cloudvectordb_spark.ranking import with_global_running_max

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    width = -(-len(vals) // n_buckets)  # ceil: monotone coarsening of id
    got = {
        r.id: r.run_max
        for r in with_global_running_max(
            df, F.floor(F.col("id") / width), [F.asc("id")], "v"
        ).collect()
    }
    run, expect = float("-inf"), {}
    for i, v in enumerate(vals):
        run = max(run, float(v))
        expect[i] = run
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=1, max_value=7),
)
def test_misra_gries_superset_guarantee(stream, cap, n_batches):
    """Pure-python MG merge (operators/scale_patterns.mg_merge): for ANY
    stream and ANY batching, every key with true count > n/cap survives
    in the final summary — the superset property heavy_hitters_sketch_
    exact's exact second pass relies on."""
    from collections import Counter

    from cloudvectordb_spark.operators.scale_patterns import mg_merge

    true = Counter(stream)
    n = len(stream)
    chunk = max(1, n // n_batches)
    counters: dict = {}
    for i in range(0, n, chunk):
        counters = mg_merge(counters, Counter(stream[i : i + chunk]), cap)
    assert len(counters) <= cap
    for key, cnt in true.items():
        if cnt > n / cap:
            assert key in counters, (key, cnt, n, cap)


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_half_up_matches_duckdb_round(vals):
    """pq._half_up (the numpy half-away-from-zero used by every
    deterministic trainer) must agree with DuckDB round() on the same
    doubles — the cross-engine contract the PQ oracles depend on."""
    import duckdb

    from cloudvectordb_spark.operators.pq import _half_up

    arr = np.array(vals, dtype=np.float64)
    ours = _half_up(arr, 6)
    con = duckdb.connect()
    duck = [
        con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [float(v)]).fetchone()[0]
        for v in vals
    ]
    assert np.array_equal(ours, np.array(duck, dtype=np.float64))


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.binary(min_size=0, max_size=600),
)
@settings(max_examples=60, deadline=None)
def test_netpbm_p6_roundtrip_any_geometry(w, h, payload):
    """parse_netpbm must decode every well-formed P6 payload (any
    geometry, zero-padded pixel block) to the exact integer luma grid,
    and reject truncated ones with ValueError, never crash."""
    from cloudvectordb_spark.operators.multimodal import parse_netpbm

    need = w * h * 3
    raw = (payload * ((need // max(len(payload), 1)) + 1))[:need] if payload else bytes(need)
    ppm = f"P6\n{w} {h}\n255\n".encode() + raw
    img = parse_netpbm(ppm)
    assert img.shape == (h, w)
    for p in range(min(w * h, 16)):
        r, g, b = raw[3 * p], raw[3 * p + 1], raw[3 * p + 2]
        assert img[p // w, p % w] == (299 * r + 587 * g + 114 * b) // 1000

    if need > 0:
        truncated = f"P6\n{w} {h}\n255\n".encode() + raw[:-1]
        try:
            parse_netpbm(truncated)
            assert False, "truncated payload must raise"
        except ValueError:
            pass


@given(st.lists(st.floats(-4, 4, allow_nan=False, width=32), min_size=64, max_size=64))
@settings(max_examples=40, deadline=None)
def test_binary_pack_bits_equal_sign_pattern_numpy(vals):
    """Pure-python replica of the packing contract: bit j set iff
    v[j] > 0 — checked against the Spark expression on a 1-row frame in
    the fixture-driven test; here the arithmetic identity (sum of 2^i
    over positive dims) is pinned for arbitrary floats."""
    h0 = sum((1 << i) for i in range(32) if vals[i] > 0)
    h1 = sum((1 << i) for i in range(32) if vals[32 + i] > 0)
    packed = (h1 << 32) | h0
    for j, x in enumerate(vals):
        assert ((packed >> j) & 1) == (1 if x > 0 else 0)


_VOCAB_FIXTURE = (
    "data", "query", "fast", "merge", "stream", "vector", "window",
    "scan", "join", "hash", "sort", "table", "batch", "small", "agg",
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(_VOCAB_FIXTURE), min_size=1, max_size=4,
            unique=True,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_batch_scoring_equals_single_query_scoring(spark, sf_dir, term_sets):
    """PROPERTY: for ANY query batch over the fixture vocabulary
    (overlapping terms allowed — the regression class fixed in
    bm25_batch_pruned), per-query batched BM25 scores equal the
    single-query indexed scorer bit-for-bit."""
    from cloudvectordb_spark.operators.search import (
        bm25_scores_batch,
        bm25_scores_indexed,
    )

    batch = tuple((i, tuple(ts)) for i, ts in enumerate(term_sets))
    got = {}
    for r in bm25_scores_batch(spark, sf_dir, batch).collect():
        got.setdefault(r.query_id, {})[r.doc_id] = r.bm25
    for qid, ts in batch:
        want = {
            r.doc_id: r.bm25
            for r in bm25_scores_indexed(spark, sf_dir, tuple(ts)).collect()
        }
        assert got.get(qid, {}) == want


# ---------------------------------------------------------------------------
# Round-9 kernels: driver-side BPE trainer and capped sub-bucket pairing.
# Pure-python properties (no Spark job per example — hypothesis-friendly).
# ---------------------------------------------------------------------------
bpe_words = st.lists(
    st.tuples(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(bpe_words)
def test_bpe_driver_trainer_matches_naive_reference(vocab_items):
    """PROPERTY: for ANY (word, freq) vocab, the driver-side trainer's
    per-round best pair equals a from-scratch naive recount (position-
    weighted counts, count-desc then lexicographic tiebreak), and its
    merged symbol sequences re-concatenate to the original words."""
    from cloudvectordb_spark.operators.text_ops import (
        _bpe_greedy_merge,
        _bpe_train_on_vocab,
    )

    vocab = [[w, f, list(w)] for w, f in vocab_items]
    ref = [[w, f, list(w)] for w, f in vocab_items]
    merges = _bpe_train_on_vocab(vocab, rounds=4)

    # naive reference replay: recount + argmin on the SAME tiebreak
    for rank, a, b, merged, cnt in merges:
        counts = {}
        for _, f, syms in ref:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        (ra, rb), rc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (ra, rb, ra + rb, rc) == (a, b, merged, cnt)
        for entry in ref:
            entry[2] = _bpe_greedy_merge(entry[2], ra, rb)

    # losslessness: merging never changes the underlying characters
    for (w, _f, syms), (w2, _f2) in zip(vocab, vocab_items):
        assert "".join(syms) == w == w2


pair_ids = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=2, max_size=60, unique=True
)


@settings(max_examples=40, deadline=None)
@given(pair_ids, st.integers(min_value=1, max_value=7))
def test_sub_bucket_fanout_covers_each_pair_exactly_once(ids, nsub):
    """PROPERTY: the (ti, tj) task fan-out used by the capped dedup
    kernel places EVERY unordered id pair of a cell in EXACTLY one
    task, for any id set and any sub-bucket count."""
    tasks: dict = {}
    for x in ids:
        s = x % nsub
        for t in range(nsub):
            tasks.setdefault((min(s, t), max(s, t)), set()).add(x)
    seen = {}
    for (ti, tj), members in tasks.items():
        if ti == tj:
            cand = [
                (a, b)
                for a in members
                for b in members
                if a < b and a % nsub == ti and b % nsub == ti
            ]
        else:
            aa = [m for m in members if m % nsub == ti]
            bb = [m for m in members if m % nsub == tj]
            cand = [(min(a, b), max(a, b)) for a in aa for b in bb]
        for p in cand:
            assert p not in seen, f"pair {p} duplicated"
            seen[p] = (ti, tj)
    n = len(ids)
    assert len(seen) == n * (n - 1) // 2


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_driver_mode_matches_reference(spark, edges):
    """The driver union-find fast path (the CorpusPipeline.append dedup
    finisher) must compute exactly the min-label components a plain BFS
    reference finds, on ARBITRARY graphs — self-loops, duplicates,
    reversed edges, disconnected pieces, whatever hypothesis throws."""
    from cloudvectordb_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    got = {
        r.node: r.component
        for r in connected_components(df, stats=stats).collect()
    }
    assert stats["mode"] == "driver"

    # reference: adjacency BFS, min label per component
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    seen: set = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            comp.append(n)
            stack.extend(adj[n] - seen)
        m = min(comp)
        for n in comp:
            want[n] = m
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcdefgh "), min_size=0, max_size=60
        ),
        min_size=2,
        max_size=12,
    )
)
def test_minhash_between_equals_within_cross_slice(spark, texts):
    """For ANY corpus and any id split, the incremental between-frame
    join must find exactly the within-frame pairs that cross the split
    — the invariant CorpusPipeline.append's rebuild-equality rests on."""
    from cloudvectordb_spark.operators.dedup import (
        minhash_pairs_between,
        minhash_pairs_within,
        minhash_sigs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = minhash_sigs(docs, "fast")
    cut = len(texts) // 2
    got = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in minhash_pairs_between(
            sigs.filter(F.col("doc_id") >= cut),
            sigs.filter(F.col("doc_id") < cut),
        ).collect()
    }
    want = {
        (r.b_id, r.a_id, r.est_jaccard)
        for r in minhash_pairs_within(sigs)
        .filter((F.col("a_id") < cut) & (F.col("b_id") >= cut))
        .collect()
    }
    assert got == want
