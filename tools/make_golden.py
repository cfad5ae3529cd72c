"""Regenerate tests/golden/trained_artifact.json — the committed golden
hashes gating the K4 trainer (round-4 verdict item 5).

Records, at sf0.001:
- fixture_sha: sha256 of documents.parquet (the golden is only valid for
  this exact fixture; the pytest SKIPS loudly if the driver regenerated
  testdata, rather than failing on unrelated data drift)
- proj_sha:    sha256 of the trained encoder.npz proj array bytes
- emb_sha:     sha256 over the embed_documents_trained_artifact rows
               (doc_id, dim, c1, c2) sorted by doc_id

Run after any INTENTIONAL trainer change: python tools/make_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
    "trained_artifact.json",
)


def file_sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def compute(spark) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from cloudvectordb_spark.catalog import load
    from cloudvectordb_spark.operators.pipeline import (
        embed_with_artifact,
        ensure_trained_artifact,
    )

    art = ensure_trained_artifact(spark, SF_DIR)
    proj = np.load(os.path.join(art, "encoder.npz"))["proj"]
    # (doc_id, dim, c1, c2) per doc — the summary the registered query
    # used to expose before it switched to contract invariants in round 7;
    # computed here directly from the embeddings so the committed golden
    # emb_sha stays comparable across that change.
    out = embed_with_artifact(
        load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 200), art
    ).select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("c1"),
        F.round(F.element_at("embedding", 2).cast("double"), 5).alias("c2"),
    )
    rows = sorted((r.doc_id, r.dim, r.c1, r.c2) for r in out.collect())
    emb_repr = ";".join(f"{d}:{dim}:{c1:.5f}:{c2:.5f}" for d, dim, c1, c2 in rows)
    return {
        "sf_dir": SF_DIR,
        "fixture_sha": file_sha(os.path.join(SF_DIR, "documents.parquet")),
        "proj_sha": hashlib.sha256(proj.tobytes()).hexdigest(),
        "proj_shape": list(proj.shape),
        "emb_sha": hashlib.sha256(emb_repr.encode()).hexdigest(),
        "n_emb_rows": len(rows),
    }


if __name__ == "__main__":
    from cloudvectordb_spark.session import get_session

    golden = compute(get_session("make-golden"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=2)
    print(json.dumps(golden, indent=2))
    print(f"wrote {OUT}")
