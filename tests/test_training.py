"""K4 boundary: stub encoder training artifact round-trip + determinism.
The real TorchDistributor path needs torch (absent here) and must fail
with a clear ImportError, not a deep stack."""

from __future__ import annotations

import numpy as np
import pytest

from cloudvectordb_spark.training import (
    encode_texts_stub,
    load_encoder_stub,
    train_encoder_distributed,
    train_encoder_stub,
)


def test_stub_train_roundtrip(tmp_path):
    shards = tmp_path / "shards"
    shards.mkdir()
    art = train_encoder_stub(str(shards), str(tmp_path / "artifact"))
    proj = load_encoder_stub(art)
    assert proj.shape == (1024, 64) and proj.dtype == np.float32
    # same seed -> identical artifact
    art2 = train_encoder_stub(str(shards), str(tmp_path / "artifact2"))
    assert np.array_equal(proj, load_encoder_stub(art2))


def test_stub_encode_deterministic_and_normalized(tmp_path):
    shards = tmp_path / "s"
    shards.mkdir()
    proj = load_encoder_stub(train_encoder_stub(str(shards), str(tmp_path / "a")))
    v1 = encode_texts_stub(["the quick brown fox", "hola el mundo"], proj)
    v2 = encode_texts_stub(["the quick brown fox", "hola el mundo"], proj)
    assert np.array_equal(v1, v2)
    norms = np.sqrt((v1.astype(np.float64) ** 2).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_missing_shards_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        train_encoder_stub(str(tmp_path / "nope"), str(tmp_path / "a"))


def test_distributed_path_requires_torch():
    with pytest.raises(ImportError, match="torch"):
        train_encoder_distributed(lambda: None)
