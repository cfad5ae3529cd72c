"""Measured storage footprint per index tier — the bytes behind the
compression claims (float32 vectors vs 8-byte PQ codes vs 16-byte
sign-bit halves). Builds/reuses the persisted layouts for --sf and
prints one JSON line of bytes-per-vector by tier.

    python tools/footprint_report.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudvectordb_spark.session import get_session  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    spark = get_session("footprint")

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import ensure_ivf_index
    from cloudvectordb_spark.operators.pq import ensure_pq_index
    from cloudvectordb_spark.operators.vector_ops import binary_quantize

    n = load(spark, args.sf, "embeddings").count()

    ivf_path = ensure_ivf_index(spark, args.sf)
    ivf_bytes = du(os.path.join(ivf_path, "vectors"))

    # PQ codes layout (persisted parquet of (vec_id, code[8]))
    ensure_pq_index(spark, args.sf)
    import glob
    import tempfile

    pq_dirs = glob.glob(os.path.join(tempfile.gettempdir(), "cloudvectordb_pq", "*"))
    pq_bytes = min((du(d) for d in pq_dirs), default=0)

    # binary codes written fresh (vec_id, h0, h1)
    bq_dir = os.path.join(tempfile.gettempdir(), "cloudvectordb_bq_probe")
    binary_quantize(load(spark, args.sf, "embeddings")).select(
        "vec_id", "h0", "h1"
    ).write.mode("overwrite").parquet(bq_dir)
    bq_bytes = du(bq_dir)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "n_vectors": n,
                "ivf_float32_bytes_per_vec": round(ivf_bytes / n, 1),
                "pq_code_bytes_per_vec": round(pq_bytes / n, 1),
                "binary_code_bytes_per_vec": round(bq_bytes / n, 1),
                "pq_vs_float_ratio": round(ivf_bytes / max(pq_bytes, 1), 1),
                "binary_vs_float_ratio": round(ivf_bytes / max(bq_bytes, 1), 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
