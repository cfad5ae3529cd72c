"""Continuous-serving latency probe: run the checkpointed text serving
job (streaming/jobs.run_query_serving) against the 1M-doc probe index
and report per-micro-batch latency — the operational number a request
topic consumer cares about. Request files are written first, so the
micro-batch engine drains them back-to-back (maxFilesPerTrigger=1);
each trigger scores its batch against the static postings in one plan.

Usage: python tools/serving_probe.py [--docs 1000000] [--files 8]
                                     [--queries-per-file 4]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--queries-per-file", type=int, default=4)
    args = ap.parse_args()

    spark = get_session("serving-probe")
    from tools.text_index_probe import _probe_batch, ensure_docs

    root = os.path.join("/tmp", "cloudvectordb_textprobe", str(args.docs))
    docs_path = ensure_docs(spark, args.docs, root)
    sf_dir = os.path.dirname(docs_path)

    import shutil
    import tempfile

    from cloudvectordb_spark.operators.search import ensure_text_index
    from cloudvectordb_spark.streaming.jobs import run_query_serving

    ensure_text_index(spark, sf_dir)  # amortized build, not timed

    work = tempfile.mkdtemp(prefix="serving_probe_")
    try:
        qdir = os.path.join(work, "requests")
        total_q = args.files * args.queries_per_file
        batch = _probe_batch(total_q)
        for f in range(args.files):
            part = batch[
                f * args.queries_per_file : (f + 1) * args.queries_per_file
            ]
            (
                spark.createDataFrame(
                    [(qid, t) for qid, ts in part for t in ts],
                    schema="query_id int, term string",
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(qdir)
            )

        durations = run_query_serving(
            spark,
            sf_dir,
            qdir,
            os.path.join(work, "results"),
            os.path.join(work, "ckpt"),
            k=10,
        )
        n_rows = spark.read.parquet(os.path.join(work, "results")).count()
        out = {
            "n_docs": args.docs,
            "n_request_files": args.files,
            "queries_per_file": args.queries_per_file,
            "n_batches_processed": len(durations),
            "result_rows": n_rows,
            "batch_latency_ms_median": statistics.median(durations),
            "batch_latency_ms_p_max": max(durations),
            "batch_latency_ms_first": durations[0] if durations else None,
            "per_query_ms_median": round(
                statistics.median(durations) / args.queries_per_file, 1
            ),
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
