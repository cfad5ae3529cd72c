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


def test_image_features_deterministic_and_shaped(spark, sf_dir):
    from cloudvectordb_spark.operators.multimodal import multimodal_image_features

    r1 = {r.doc_id: (r.px_mean, r.px_std, r.hist4_csv)
          for r in multimodal_image_features(spark, sf_dir).collect()}
    r2 = {r.doc_id: (r.px_mean, r.px_std, r.hist4_csv)
          for r in multimodal_image_features(spark, sf_dir).collect()}
    assert r1 == r2 and len(r1) > 0
    for mean, std, hist in r1.values():
        assert 0 <= mean <= 255 and std >= 0
        assert len(hist.split(",")) == 4


def test_fake_decode_shape():
    from cloudvectordb_spark.operators.multimodal import fake_decode_image

    img = fake_decode_image(b"abc" * 100, width=16)
    assert img.shape == (16, 16)
    # short payload zero-pads deterministically
    img2 = fake_decode_image(b"xy", width=16)
    assert img2.shape == (16, 16) and img2[0, 0] == ord(b"x") and img2[15, 15] == 0


def test_decode_stub_raises():
    import pytest as _pytest
    from cloudvectordb_spark.operators.multimodal import decode_stub

    with _pytest.raises(NotImplementedError):
        decode_stub(b"payload")


def test_decode_image_works_with_or_without_pil():
    """decode_image must be deterministic for NON-image payloads in every
    environment: with PIL, a text payload fails to parse and falls back;
    without PIL, the fallback runs directly — same result either way.
    With PIL present it must also decode a real image."""
    from cloudvectordb_spark.operators.multimodal import (
        _HAS_PIL,
        decode_image,
        fake_decode_image,
    )

    payload = b"not an image, just text " * 20
    img = decode_image(payload, width=16)
    assert img.shape == (16, 16)
    assert (img == fake_decode_image(payload, width=16)).all()

    if _HAS_PIL:
        import io

        import numpy as np
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.arange(64, dtype="uint8").reshape(8, 8), mode="L"
        ).save(buf, format="PNG")
        real = decode_image(buf.getvalue(), width=16)
        assert real.shape == (16, 16)
        # a real decode must NOT equal the byte-reinterpretation fallback
        assert not (real == fake_decode_image(buf.getvalue(), width=16)).all()


def test_parse_netpbm_real_decode_in_this_container():
    """Round-4 verdict item 4: a REAL decode must execute here (no PIL,
    no codec libs). P6 header tokenization incl. comments, BT.601 integer
    luma, and the resized decode_image path must all differ from the
    byte-reinterpretation fallback on the same payload."""
    import numpy as np

    from cloudvectordb_spark.operators.multimodal import (
        _nearest_resize,
        decode_image,
        fake_decode_image,
        parse_netpbm,
    )

    # P6 with comment: 2x2 RGB — known luma values
    rgb = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    p6 = b"P6\n# a comment\n2 2\n255\n" + rgb
    img = parse_netpbm(p6)
    assert img.shape == (2, 2)
    assert img.tolist() == [
        [(299 * 255) // 1000, (587 * 255) // 1000],
        [(114 * 255) // 1000, 255],  # weights sum to 1000 => white stays 255
    ]

    # P5 grayscale passes through untouched
    p5 = b"P5 4 1 255 " + bytes([0, 64, 128, 255])
    assert parse_netpbm(p5).tolist() == [[0, 64, 128, 255]]

    # decode_image must take the REAL branch for the PPM payload: equal
    # to the parsed+resized image, distinct from the fallback
    w = 16
    big = b"P6\n8 8\n255\n" + bytes(range(192))
    via_decode = decode_image(big, width=w)
    assert (via_decode == _nearest_resize(parse_netpbm(big), w)).all()
    assert not (via_decode == fake_decode_image(big, width=w)).all()

    # malformed payloads fall back, never raise
    for bad in (b"P6\n8 8\n255\n" + bytes(10), b"P7 1 1 255 x", b"hello"):
        out = decode_image(bad, width=w)
        assert out.shape == (w, w)
        assert (out == fake_decode_image(bad, width=w)).all()

    # nearest resize is deterministic subsampling
    base = np.arange(64, dtype=np.uint8).reshape(8, 8)
    down = _nearest_resize(base, 4)
    assert down.tolist() == base[::2, ::2].tolist()
