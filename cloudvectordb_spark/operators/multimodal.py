"""Multimodal columns (SURVEY.md §2 K11, A4; [SCOPE] BASELINE.json:6
"multimodal columns").

Image/audio/video are opaque ``binary`` columns with typed metadata.
The container has no codec libraries, so the DECODE step is a clearly
marked stub (``decode_stub``) — but the Spark-side plumbing is real and
oracle-verified: BinaryType columns, Arrow-batched mapInPandas with the
correct batch shape, and byte-level metadata (length, sha256) that DuckDB
recomputes from the same source text.

Real ingestion path (A4): ``spark.read.format("binaryFile")`` ->
(path, modificationTime, length, content binary); here the fixture text
doubles as the payload so the check is end-to-end deterministic.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.registry import query


def decode_stub(payload: bytes) -> dict:
    """STUB for the modality decoder (image decode / audio resample /
    frame sample). No codec libs in this container — raises if asked for
    a real decode; metadata extraction below never needs it."""
    raise NotImplementedError("modality decode requires codec libraries (PIL/ffmpeg)")


def binary_metadata(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """K11 plumbing: binary column -> typed metadata via Arrow batches."""

    def run(batches):
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha_hex": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    return df.mapInPandas(run, schema="doc_id long, byte_len long, sha_hex string")


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text)               AS sha_hex
    FROM documents
    WHERE doc_id < 100
    """,
    operators=("K11", "A4", "L5", "H4"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text re-encoded as a BinaryType payload, pushed through
    the mapInPandas metadata extractor, verified byte-for-byte by the
    oracle (ascii fixture text => utf-8 bytes == DuckDB's encode())."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return binary_metadata(with_payload)
