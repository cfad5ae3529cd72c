"""Incremental CorpusPipeline.append at rehearsal scale (round-10
verdict #7): 10M-doc corpus + 100k-doc delta, cost ∝ delta.

Reuses the composed rehearsal's artifacts (tools/e2e_scale_probe.py
must have run first at --n N): its docs are the corpus, its pinned-k
IVF is the serving index. Two phases, separately timed:

  bootstrap  one-time state migration for an index that predates the
             facade's persisted dedup state: minhash sigs over the
             corpus (ONE text pass) + canonical labels replayed from
             the rehearsal's persisted verified pairs (CC only, no
             re-shingling). Cost ∝ corpus — paid once, ever.
  append     CorpusPipeline.append over a fresh 100k delta with
             planted near-dups against the corpus (every 10th delta
             doc perturbs an existing corpus doc's text, the same
             planting scheme as the rehearsal corpus) plus unique
             docs. Cost ∝ delta: the corpus text is never touched.

Printed JSON records both walls, the delta dedup recall on the planted
cross-corpus dups, the handoff counts, and the ratio of append wall to
the composed full-rebuild wall (the rehearsal's own total).

Usage:
  python tools/append_probe.py --n 10000000 --delta 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cloudvectordb_spark.session import get_session

DUP_EVERY = 10  # delta doc j with j%10==1 near-dups corpus doc j-1


def synthetic_delta(spark, n_corpus: int, n_delta: int, parts: int = 32):
    """(doc_id, text) delta with ids ABOVE the corpus range: every
    DUP_EVERY-th doc is a 1-word perturbation of corpus doc (j-1)'s
    text (the rehearsal's planting scheme, so est_jaccard ~0.94 at the
    3-shingle/30-word shape); the rest use a disjoint vocabulary."""
    import pandas as pd
    from zlib import crc32

    from tools.minhash_scale_probe import VOCAB, WORDS_PER_DOC

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = []
            for j in ids:
                j = int(j)
                if j % DUP_EVERY == 1:
                    base = j - 1  # an existing corpus doc's words
                    words = [
                        f"w{crc32(f'{base}:{k}'.encode()) % VOCAB}"
                        for k in range(WORDS_PER_DOC)
                    ]
                    words[WORDS_PER_DOC // 2] = f"zd{j}"
                else:  # disjoint vocab: never pairs with anything
                    words = [
                        f"dw{crc32(f'd{j}:{k}'.encode())}"
                        for k in range(WORDS_PER_DOC)
                    ]
                texts.append(" ".join(words))
            yield pd.DataFrame(
                {"doc_id": ids + n_corpus, "text": texts}
            )

    return spark.range(0, n_delta, 1, parts).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def bootstrap_state(spark, root: str, index_path: str, tau: float) -> dict:
    from cloudvectordb_spark.api import CorpusPipeline
    from cloudvectordb_spark.operators.dedup import (
        connected_components,
        minhash_sigs,
    )

    sd = CorpusPipeline._state_dir(index_path)
    if os.path.exists(os.path.join(sd, "meta.json")):
        return {"skipped": True}
    docs = spark.read.parquet(f"{root}/docs")
    t0 = time.perf_counter()
    minhash_sigs(docs, hasher="fast").write.mode("overwrite").parquet(
        f"{sd}/sigs"
    )
    sigs_wall = time.perf_counter() - t0
    # labels replay from the rehearsal's persisted verified pairs —
    # narrow state, no text
    t0 = time.perf_counter()
    pairs = spark.read.parquet(f"{root}/pairs_fast")
    labels = connected_components(pairs, src="a_id", dst="b_id")
    labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical")
    ).write.mode("overwrite").parquet(f"{sd}/labels")
    labels_wall = time.perf_counter() - t0
    stats = docs.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).first()
    CorpusPipeline._write_state_meta(
        index_path,
        {
            "hasher": "fast",
            "tau": tau,
            "n_docs": int(stats.n),
            "max_doc_id": int(stats.mx),
            "text_col": "text",
            # seed the maintained index counter (round-12 verdict #4):
            # the migration touches the index once; appends never
            # recount the corpus after this
            "n_indexed": spark.read.parquet(
                f"{index_path}/vectors"
            ).count(),
        },
    )
    return {
        "sigs_wall_s": round(sigs_wall, 1),
        "labels_wall_s": round(labels_wall, 1),
    }


def _run_one_append(
    spark, root: str, index_path: str, n_corpus: int, n_delta: int,
    id_base: int | None = None,
) -> dict:
    from cloudvectordb_spark.api import CorpusPipeline

    base = id_base if id_base is not None else n_corpus
    delta = synthetic_delta(spark, base, n_delta)
    delta.write.mode("overwrite").parquet(f"{root}/delta_docs_{base}_{n_delta}")
    delta = spark.read.parquet(f"{root}/delta_docs_{base}_{n_delta}")
    t0 = time.perf_counter()
    out = CorpusPipeline.append(spark, index_path, delta)
    append_wall = time.perf_counter() - t0
    n_planted = n_delta // DUP_EVERY
    return {
        "delta": out["delta"],
        "append_wall_s": round(append_wall, 1),
        "delta_docs_per_s": int(n_delta / append_wall),
        "survivors": out["survivors"],
        "removed": out["removed"],
        "demoted": out["demoted"],
        "indexed": out["indexed"],
        "planted_cross_dups": n_planted,
        "planted_recall": round(out["removed"] / max(1, n_planted), 4),
        "walls": out.get("walls", {}),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--delta", type=int, default=100_000)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--root", default=None)
    ap.add_argument(
        "--scaling",
        default=None,
        help="comma list of delta sizes (e.g. 10000,100000,1000000): "
        "snapshot the index+state once, then append each size against "
        "a restored snapshot — the cost-∝-delta evidence in one JSON "
        "(also exercises the broadcast->shuffle fallback past "
        "CorpusPipeline._BROADCAST_DELTA_MAX)",
    )
    ap.add_argument(
        "--sequence",
        default=None,
        help="comma list of delta sizes appended BACK-TO-BACK with no "
        "state restore — the steady-state ingest-service shape, where "
        "the forward-rolled sig cache makes appends after the first "
        "read only the delta's own sig files (round-12 verdict #4)",
    )
    args = ap.parse_args()
    root = args.root or f"/tmp/cloudvectordb_e2e/{args.n}"
    index_path = f"{root}/ivf"
    if not os.path.exists(f"{index_path}/vectors"):
        raise SystemExit(f"run tools/e2e_scale_probe.py --n {args.n} first")

    spark = get_session("append-probe")
    boot = bootstrap_state(spark, root, index_path, args.tau)

    if args.sequence:
        import json as _json

        from cloudvectordb_spark.api import CorpusPipeline

        # always start from the pristine snapshot so the sequence is
        # reproducible (create it on first use, like --scaling)
        import shutil

        snap = f"{root}/ivf_snapshot"
        if not os.path.exists(snap):
            shutil.copytree(index_path, snap)
        shutil.rmtree(index_path)
        shutil.copytree(snap, index_path)
        rows = []
        id_base = args.n
        for n_delta in (int(x) for x in args.sequence.split(",")):
            rows.append(
                _run_one_append(
                    spark, root, index_path, args.n, n_delta,
                    id_base=id_base,
                )
            )
            id_base = int(
                CorpusPipeline._read_state_meta(index_path)["max_doc_id"]
            ) + 1
        print(
            _json.dumps(
                {
                    "metric": "append_sequence_probe",
                    "corpus": args.n,
                    "bootstrap": boot,
                    "runs": rows,
                }
            )
        )
        return 0

    if args.scaling:
        import shutil

        snap = f"{root}/ivf_snapshot"
        if not os.path.exists(snap):
            shutil.copytree(index_path, snap)
        rows = []
        for n_delta in (int(x) for x in args.scaling.split(",")):
            shutil.rmtree(index_path)
            shutil.copytree(snap, index_path)
            rows.append(
                _run_one_append(spark, root, index_path, args.n, n_delta)
            )
        print(
            json.dumps(
                {
                    "metric": "append_scaling_probe",
                    "corpus": args.n,
                    "bootstrap": boot,
                    "runs": rows,
                }
            )
        )
        return 0

    result = {
        "metric": "append_probe",
        "corpus": args.n,
        "bootstrap": boot,
        **_run_one_append(spark, root, index_path, args.n, args.delta),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
