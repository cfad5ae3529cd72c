"""Invariant tests for the search-surface operators (operators/search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.search import (
    bm25_keyword_search,
    filtered_knn_search,
    hybrid_rrf_search,
    vector_upsert_merge,
    _QUERY_TERMS,
)


def test_bm25_only_matching_docs_scored(spark, sf_dir):
    rows = bm25_keyword_search(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 20
    assert all(r["bm25"] > 0 for r in rows)
    scores = [r["bm25"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    # every returned doc really contains >= 1 query term
    ids = [r["doc_id"] for r in rows]
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select(
            "doc_id",
            F.arrays_overlap(
                F.split("text", " "), F.array(*[F.lit(t) for t in _QUERY_TERMS])
            ).alias("hit"),
        )
        .collect()
    )
    assert all(r["hit"] for r in docs)


def test_rrf_bounded_and_ranked(spark, sf_dir):
    rows = hybrid_rrf_search(spark, sf_dir).orderBy("rank").collect()
    assert len(rows) == 10
    # rrf of two rankings with k=60: each component in (0, 1/61]
    assert all(0 < r["rrf_score"] <= 2 / 61 for r in rows)
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_filtered_knn_respects_predicate(spark, sf_dir):
    rows = filtered_knn_search(spark, sf_dir).collect()
    assert rows
    assert all(r["label"] in (1, 3) for r in rows)
    assert all(r["neighbor_id"] != r["probe_id"] for r in rows)
    per_probe = {}
    for r in rows:
        per_probe.setdefault(r["probe_id"], []).append(r["rank"])
    for ranks in per_probe.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_upsert_merge_last_wins(spark, sf_dir):
    rows = {r["vec_id"]: r for r in vector_upsert_merge(spark, sf_dir).collect()}
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 60)
        .collect()
    }
    for vid, r in rows.items():
        assert vid % 7 != 0, "deleted keys must not survive"
        assert r["version"] == 0, "no upsert touches vec_id < 60"
        assert abs(r["v0"] - emb[vid][0]) < 1e-4
    # every non-deleted base key < 60 survives
    assert set(rows) == {v for v in emb if v % 7 != 0}


def test_radius_search_threshold(spark, sf_dir):
    from cloudvectordb_spark.operators.search import radius_search, _RADIUS_TAU

    rows = radius_search(spark, sf_dir).collect()
    assert rows
    assert all(r["score"] >= _RADIUS_TAU for r in rows)
    assert all(r["neighbor_id"] != r["probe_id"] for r in rows)


def test_diversified_topk_label_cap(spark, sf_dir):
    from cloudvectordb_spark.operators.search import diversified_topk_search

    rows = diversified_topk_search(spark, sf_dir).collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault((r["probe_id"], r["label"]), 0)
        per[(r["probe_id"], r["label"])] += 1
    assert max(per.values()) <= 2, "at most 2 hits per label per probe"
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for rs in by_probe.values():
        rs.sort(key=lambda r: r["rank"])
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= 6


def test_rerank_subset_of_candidates_and_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F2

    from cloudvectordb_spark.catalog import load as load2
    from cloudvectordb_spark.operators.search import (
        _RERANK_C,
        rerank_cross_encoder_topk,
    )
    from cloudvectordb_spark.operators.vector_ops import exact_knn

    a = rerank_cross_encoder_topk(spark, sf_dir).collect()
    b = rerank_cross_encoder_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "stub must be deterministic"

    emb = load2(spark, sf_dir, "embeddings")
    cands = {
        (r["probe_id"], r["neighbor_id"])
        for r in exact_knn(emb, emb.filter(F2.col("vec_id") < 3), k=_RERANK_C).collect()
    }
    assert {(r["probe_id"], r["neighbor_id"]) for r in a} <= cands
    per_probe = {}
    for r in a:
        per_probe.setdefault(r["probe_id"], []).append(r)
    for rs in per_probe.values():
        assert len(rs) == 10
        rs.sort(key=lambda r: r["rank"])
        scores = [r["ce_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_mmr_diversifies_and_keeps_relevance(spark, sf_dir):
    """MMR invariants: 5 distinct picks from the top-20 pool; the first
    pick is the single most relevant doc; every later pick's max
    similarity to earlier picks is <= the most-redundant skipped
    alternative would have been (spot: picks are not simply the top-5 by
    relevance unless that already is diverse)."""
    from cloudvectordb_spark.functions import vector as V
    from cloudvectordb_spark.operators.search import mmr_diversified_search

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    rel = {
        r.vec_id: r.rel
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(V.cosine("embedding", "pv"), 6).alias("rel"))
        .collect()
    }
    picks = sorted(
        (r.pick_order, r.vec_id, r.mmr)
        for r in mmr_diversified_search(spark, sf_dir).collect()
    )
    assert [p[0] for p in picks] == [1, 2, 3, 4, 5]
    ids = [p[1] for p in picks]
    assert len(set(ids)) == 5
    top1 = max(rel, key=lambda v: (rel[v], -v))
    assert ids[0] == top1
    # mmr scores are non-increasing in pick order after the first
    # (greedy argmax over a shrinking set with a growing penalty)
    scores = [p[2] for p in picks[1:]]
    assert scores == sorted(scores, reverse=True)


def test_bm25_indexed_equals_inline_bit_for_bit(spark, sf_dir):
    """The persisted inverted index must serve EXACTLY the scores the
    inline tokenize path computes — counts are stored exactly, so any
    difference means index staleness or a scoring-path divergence."""
    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.search import (
        bm25_scores,
        bm25_scores_indexed,
    )

    inline = {
        r.doc_id: r.bm25
        for r in bm25_scores(load(spark, sf_dir, "documents")).collect()
    }
    indexed = {
        r.doc_id: r.bm25 for r in bm25_scores_indexed(spark, sf_dir).collect()
    }
    assert inline == indexed and len(inline) > 0


def test_bm25_pruned_lossless_and_strictly_fewer_pairs(spark, tmp_path):
    """WAND/max-score pruning (round 8): on a skewed corpus the pruned
    path must (a) return EXACTLY the unpruned top-k — bit-identical
    scores and ranks — while (b) exact-scoring strictly fewer
    (doc, term) pairs than the full postings scan. Skew: 'data' is a
    stopword-like term in every doc (flat, low idf), 'query' appears
    with high tf in a handful of docs (high idf, dominates top-k) —
    most docs' upper bounds can't reach the top-20 threshold."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.search import (
        _bm25_pruned_parts,
        bm25_scores_indexed,
        text_index_frames,
    )
    from cloudvectordb_spark.ranking import global_topk_ranked

    sfd = tmp_path / "sf"
    sfd.mkdir()
    rows = []
    for i in range(500):
        if i < 30:  # >=k contenders with the rare term, so the top-20
            # threshold exceeds the common term's max-score bound and
            # every data-only doc is provably out of reach
            text = "data " + "query " * (5 + i) + "filler"
        else:  # the crowd: common term only, varying length
            text = "data " + "pad " * (i % 17 + 1) + "noise"
        rows.append((i, text.strip(), "en", f"s{i}", len(text)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(sfd / "documents.parquet")

    terms = ("data", "query", "fast")
    unpruned = {
        (r.doc_id, r.bm25, r.rank)
        for r in global_topk_ranked(
            bm25_scores_indexed(spark, str(sfd), terms),
            [F.desc("bm25"), F.asc("doc_id")],
            20,
        ).collect()
    }
    pairs, scored = _bm25_pruned_parts(spark, str(sfd), terms, 20)
    pruned = {
        (r.doc_id, r.bm25, r.rank)
        for r in global_topk_ranked(
            scored, [F.desc("bm25"), F.asc("doc_id")], 20
        ).collect()
    }
    assert pruned == unpruned and len(pruned) == 20
    postings = text_index_frames(spark, str(sfd))[0]
    full_pairs = postings.filter(F.col("term").isin(*terms)).count()
    scored_pairs = pairs.count()
    assert scored_pairs < full_pairs, (scored_pairs, full_pairs)


def test_phrase_match_trigram_fold(spark, tmp_path):
    """phrase_match_counts folds left-to-right over the positional
    postings; a 3-term phrase exercises the multi-step offset logic
    (including overlapping occurrences and decoy prefixes)."""
    import pandas as pd

    from cloudvectordb_spark.operators.search import phrase_match_counts

    sfd = tmp_path / "sf"
    sfd.mkdir()
    rows = [
        (0, "big data query fast big data query engine", "en", "s", 1),
        (1, "big data queries big data slow", "en", "s", 1),  # decoy prefix
        (2, "data query big big data query big data query", "en", "s", 1),
        (3, "nothing here at all", "en", "s", 1),
        (4, "big data big data query", "en", "s", 1),  # partial then full
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(sfd / "documents.parquet")
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_counts(
            spark, str(sfd), ("big", "data", "query")
        ).collect()
    }
    assert got == {0: 2, 2: 2, 4: 1}


def test_phrase_match_fuzz_vs_naive(spark, tmp_path):
    """Seeded fuzz: 40 random word-soup docs, three random phrases —
    the positional-postings fold must agree with a naive Python scan
    on every doc (counts, not just membership)."""
    import random

    import pandas as pd

    from cloudvectordb_spark.operators.search import phrase_match_counts

    rng = random.Random(8)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
        for _ in range(40)
    ]
    sfd = tmp_path / "sf"
    sfd.mkdir()
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(sfd / "documents.parquet")

    def naive(text: str, phrase: tuple) -> int:
        toks = text.split(" ")
        m = len(phrase)
        return sum(
            1
            for i in range(len(toks) - m + 1)
            if tuple(toks[i : i + m]) == phrase
        )

    for plen in (2, 3, 4):
        phrase = tuple(rng.choice(vocab) for _ in range(plen))
        got = {
            r.doc_id: r.n_occurrences
            for r in phrase_match_counts(spark, str(sfd), phrase).collect()
        }
        exp = {
            i: naive(t, phrase)
            for i, t in enumerate(docs)
            if naive(t, phrase) > 0
        }
        assert got == exp, (phrase, got, exp)


def test_text_index_rebuilds_on_fixture_mtime(spark, sf_dir, tmp_path):
    """Index staleness guard: the postings artifact is keyed on the
    documents fixture's mtime, so a regenerated fixture must produce a
    NEW index directory (and the old one can never serve stale scores)."""
    import os
    import shutil

    from cloudvectordb_spark.operators.search import ensure_text_index

    sfd = tmp_path / "sf"
    sfd.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "documents.parquet"),
        sfd / "documents.parquet",
    )
    r1 = ensure_text_index(spark, str(sfd))
    assert os.path.exists(os.path.join(r1, "_DONE"))
    st = os.stat(sfd / "documents.parquet")
    os.utime(sfd / "documents.parquet", (st.st_atime, st.st_mtime + 10))
    r2 = ensure_text_index(spark, str(sfd))
    assert r1 != r2 and os.path.exists(os.path.join(r2, "_DONE"))


def test_fuzzy_bm25_recovers_clean_query(spark, sf_dir):
    """The typo set ("dta", "qery", "fast") must correct to the clean
    query terms, so bm25_fuzzy_search's top-20 is bit-identical to
    bm25_keyword_search's."""
    from cloudvectordb_spark.operators.search import (
        bm25_fuzzy_search,
        bm25_keyword_search,
    )

    a = [
        (r.doc_id, r.bm25, r.rank)
        for r in bm25_fuzzy_search(spark, sf_dir)
        .select("doc_id", "bm25", "rank")
        .collect()
    ]
    b = [
        (r.doc_id, r.bm25, r.rank)
        for r in bm25_keyword_search(spark, sf_dir)
        .select("doc_id", "bm25", "rank")
        .collect()
    ]
    assert sorted(a) == sorted(b) and len(a) == 20


def test_fuzzy_hits_exclude_distance_two(spark, sf_dir):
    """"scna" (transposition of "scan") shares deletion variants with
    "scan" ("sca", "scn") so the variant join ADMITS the candidate, but
    plain Levenshtein distance is 2 — the verify filter must drop it."""
    from cloudvectordb_spark.operators.search import _fuzzy_hits

    assert _fuzzy_hits(spark, sf_dir, ("scna",)).count() == 0


def test_bm25_batch_slot0_equals_single_query(spark, sf_dir):
    """Batch slot 0 carries the bm25_keyword_search term set, so its
    per-query top-10 must be bit-for-bit the single-query top-10 —
    batching may change the plan shape, never the arithmetic."""
    from cloudvectordb_spark.operators.search import (
        bm25_batch_topk,
        bm25_keyword_search,
    )

    batch = {
        (r.doc_id, r.bm25, r.rank)
        for r in bm25_batch_topk(spark, sf_dir)
        .filter("query_id = 0")
        .select("doc_id", "bm25", "rank")
        .collect()
    }
    single = {
        (r.doc_id, r.bm25, r.rank)
        for r in bm25_keyword_search(spark, sf_dir)
        .filter("rank <= 10")
        .select("doc_id", "bm25", "rank")
        .collect()
    }
    assert batch == single and len(batch) == 10


def test_bm25_batch_one_postings_scan_serves_all_queries(spark, sf_dir):
    """The whole batch must be served from ONE postings scan (one
    pushed IN-list over the union of query terms) — per-query scans
    would re-multiply the corpus cost batching exists to amortize.
    Also pins every batch query present with a full 1..k rank."""
    from cloudvectordb_spark.operators.search import (
        _BATCH_K,
        _BATCH_QUERIES,
        bm25_batch_topk,
        bm25_scores_batch,
    )

    df = bm25_scores_batch(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # each FileScan prints its read schema once; postings is the only
    # index artifact carrying a tf column, so exactly one FileScan line
    # with tf in its column list == exactly one postings scan (the plan
    # string truncates Location, so the path itself isn't matchable)
    assert plan.count("textindex") >= 1
    assert (
        sum(
            1
            for ln in plan.splitlines()
            if "FileScan" in ln and ",tf#" in ln
        )
        == 1
    )

    out = bm25_batch_topk(spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == {qid for qid, _ in _BATCH_QUERIES}
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, _BATCH_K + 1))


def test_prefix_autocomplete_pushes_startswith(spark, sf_dir):
    """Autocomplete serves from term_meta only: the prefix predicate
    must push into the term_meta parquet scan, and no postings or
    documents scan may appear anywhere in the plan."""
    import contextlib
    import io

    from cloudvectordb_spark.operators.search import prefix_autocomplete

    df = prefix_autocomplete(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    assert "StringStartsWith(term,s)" in txt
    assert "/postings" not in txt and "documents.parquet" not in txt

    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all(r.term.startswith("s") for r in rows)


def test_serve_query_batch_empty_and_nomatch(spark, sf_dir):
    """The serving kernel must return an empty typed frame for an empty
    request batch, and a query whose terms match nothing must simply be
    absent from the output (no nulls, no crash) while other queries in
    the same batch are unaffected."""
    from cloudvectordb_spark.operators.search import serve_query_batch

    empty = spark.createDataFrame([], schema="query_id int, term string")
    out = serve_query_batch(spark, sf_dir, empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "doc_id",
        "bm25",
        "rank",
    ]

    mixed = spark.createDataFrame(
        [(7, "data"), (8, "zzzznotaterm")],
        schema="query_id int, term string",
    )
    rows = serve_query_batch(spark, sf_dir, mixed).collect()
    qids = {r.query_id for r in rows}
    assert 7 in qids and 8 not in qids


def test_bm25_batch_pruned_overlapping_terms_lossless(spark, sf_dir):
    """Regression: a term SHARED by two batch queries must not
    double-count in the pruned path's exact scoring (the (doc, term)
    side dedups). Overlapping batch: both queries carry 'data'; pruned
    per-query top-10 must equal the unpruned batch path bit-for-bit."""
    from cloudvectordb_spark.operators.search import (
        batch_topk_per_query,
        bm25_batch_pruned_scores,
        bm25_scores_batch,
    )

    batch = ((0, ("data", "query")), (1, ("data", "stream", "merge")))
    _, scored = bm25_batch_pruned_scores(spark, sf_dir, batch, k=10)
    pruned = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in batch_topk_per_query(scored, 10).collect()
    }
    full = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in batch_topk_per_query(
            bm25_scores_batch(spark, sf_dir, batch), 10
        ).collect()
    }
    assert pruned == full and len(pruned) == 20


def test_bm25_batch_pruned_fewer_pairs_than_full(spark, sf_dir):
    """The batched pruned path must exact-score fewer (query, doc,
    term) pairs than the full batch join would (pruning does real
    work on the fixture's term-frequency skew)."""
    from pyspark.sql import functions as F

    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        bm25_batch_pruned_scores,
        text_index_frames,
    )

    survivor_pairs, _ = bm25_batch_pruned_scores(spark, sf_dir)
    postings, *_rest = text_index_frames(spark, sf_dir)
    all_terms = sorted({t for _, ts in _BATCH_QUERIES for t in ts})
    full_pairs = sum(
        postings.filter(F.col("term").isin(*ts)).count()
        for _, ts in _BATCH_QUERIES
    )
    assert survivor_pairs.count() < full_pairs


def test_route_bm25_batch_cost_model():
    from cloudvectordb_spark.operators.search import (
        _BATCH_QUERIES,
        _COLD_PAIR_COST,
        _HOT_PAIR_COST,
        route_bm25_batch,
    )

    # hot profile (r=1): the (r-1)*P term vanishes, so no postings
    # volume ever justifies the five extra pruned stages
    huge = {t: 10**9 for _, ts in _BATCH_QUERIES for t in ts}
    strategy, p = route_bm25_batch(huge, _BATCH_QUERIES, 10, _HOT_PAIR_COST)
    assert strategy == "unpruned" and p == 11 * 10**9
    # cold profile: prunes above the overhead bar, not below
    small = {t: 10 for _, ts in _BATCH_QUERIES for t in ts}
    assert route_bm25_batch(small, _BATCH_QUERIES, 10, _COLD_PAIR_COST)[0] == "unpruned"
    big = {t: 1000 for _, ts in _BATCH_QUERIES for t in ts}
    assert route_bm25_batch(big, _BATCH_QUERIES, 10, _COLD_PAIR_COST)[0] == "pruned"


def test_bm25_batch_adaptive_tracks_unpruned_plan(spark, sf_dir):
    """The router's answer rows are the lossless batch top-k whichever
    arm it picks, and the fixture corpus drives the cold profile onto
    the pruned arm for real."""
    from cloudvectordb_spark.operators.search import (
        bm25_batch_adaptive,
        bm25_batch_adaptive_cold,
        bm25_batch_topk,
    )

    base = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in bm25_batch_topk(spark, sf_dir).collect()
    }
    hot = bm25_batch_adaptive(spark, sf_dir).collect()
    uniform = {
        (r.query_id, r.doc_id, r.bm25, r.rank)
        for r in hot
        if r.case_name == "uniform"
    }
    assert uniform == base
    assert {r.strategy for r in hot} == {"unpruned"}
    cold = bm25_batch_adaptive_cold(spark, sf_dir).collect()
    assert {r.strategy for r in cold} == {"pruned"}  # ~4.3k pairs > bar
    assert {
        (r.query_id, r.doc_id, r.bm25, r.rank) for r in cold
    } == base  # pruned arm is lossless through the router too
