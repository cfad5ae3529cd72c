from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cloudvectordb_spark.catalog import load
from cloudvectordb_spark.operators.multimodal import binary_metadata, decode_stub


def test_decode_stub_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG...")


def test_binary_metadata_matches_driver_side_hash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    got = {r.doc_id: (r.byte_len, r.sha_hex) for r in binary_metadata(payloads).collect()}
    for r in docs.collect():
        raw = r.text.encode("utf-8")
        assert got[r.doc_id] == (len(raw), hashlib.sha256(raw).hexdigest())


def test_binary_metadata_handles_real_binary(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01\xff\xfe")), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: (r.byte_len, r.sha_hex) for r in binary_metadata(df).collect()}
    assert got[1] == (4, hashlib.sha256(b"\x00\x01\xff\xfe").hexdigest())
    assert got[2] == (0, hashlib.sha256(b"").hexdigest())
