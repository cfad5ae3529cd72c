"""K4: encoder training boundary (SURVEY.md §2 K4; reference S2 "then
training encoders", /root/reference/README.md:2).

Training is NOT a DataFrame op — it's the one stage that leaves the
engine. The contract here is the *boundary*:

  triplet shards (A3 parquet, written by operators.pipeline.
  export_triplet_shards) -> train_encoder() -> an encoder ARTIFACT
  (directory with weights + meta) -> operators.pipeline.embed_documents
  loads it per-worker inside mapInPandas (S3).

Two implementations behind one signature:

- ``train_encoder_distributed`` — the real path: wraps
  ``pyspark.ml.torch.distributor.TorchDistributor`` (public PySpark
  API). Requires torch at runtime; this container ships none, so the
  call raises a clear error unless torch is importable. The train_fn is
  user-supplied — the engine does not own the model architecture.
- ``train_encoder_stub`` — a deterministic, dependency-free stand-in
  used by tests and the e2e pipeline: "trains" a seeded random
  projection (numpy) from token-hash space to EMBED_DIM and saves it as
  an .npz artifact. Deterministic given (seed, dim), so oracle-adjacent
  tests stay stable.
"""

from __future__ import annotations

import json
import os

import numpy as np

EMBED_DIM = 64
_VOCAB_HASH_DIM = 1024


def train_encoder_stub(
    triplet_shard_dir: str, artifact_dir: str, dim: int = EMBED_DIM, seed: int = 42
) -> str:
    """Deterministic stand-in for S2: emit a seeded random-projection
    encoder artifact. Reads nothing from the shards beyond asserting they
    exist (the projection is data-independent), which keeps CI free of a
    torch dependency while exercising the artifact hand-off."""
    if not os.path.isdir(triplet_shard_dir):
        raise FileNotFoundError(f"triplet shards not found: {triplet_shard_dir}")
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((_VOCAB_HASH_DIM, dim)).astype(np.float32)
    os.makedirs(artifact_dir, exist_ok=True)
    np.savez(os.path.join(artifact_dir, "encoder.npz"), proj=proj)
    with open(os.path.join(artifact_dir, "meta.json"), "w") as f:
        json.dump({"dim": dim, "seed": seed, "kind": "stub-projection"}, f)
    return artifact_dir


def load_encoder_stub(artifact_dir: str) -> np.ndarray:
    """Load the stub artifact's projection matrix (workers call this once
    per partition inside mapInPandas)."""
    return np.load(os.path.join(artifact_dir, "encoder.npz"))["proj"]


def encode_texts_stub(texts: list[str], proj: np.ndarray) -> np.ndarray:
    """Hash-bag-of-words -> projection. Deterministic (CRC32, not Python's
    process-salted hash()); L2-normalized."""
    from zlib import crc32

    out = np.zeros((len(texts), proj.shape[1]), dtype=np.float32)
    for i, t in enumerate(texts):
        bag = np.zeros(proj.shape[0], dtype=np.float32)
        for tok in t.lower().split():
            bag[crc32(tok.encode()) % proj.shape[0]] += 1.0
        v = bag @ proj
        n = float(np.sqrt((v * v).sum()))
        out[i] = v / n if n > 0 else v
    return out


def train_encoder_distributed(
    train_fn, num_processes: int = 2, use_gpu: bool = False, **kwargs
):
    """The real S2 path: distribute ``train_fn`` with TorchDistributor.

    ``train_fn(**kwargs)`` runs once per process under torch.distributed;
    it should read triplet shards, run contrastive training, and write the
    artifact. Raises ImportError when torch is absent (this container)."""
    import importlib

    if importlib.util.find_spec("torch") is None:
        raise ImportError(
            "torch is not installed; use train_encoder_stub for CI, or install "
            "torch on the cluster for real encoder training"
        )
    from pyspark.ml.torch.distributor import TorchDistributor

    return TorchDistributor(
        num_processes=num_processes, local_mode=False, use_gpu=use_gpu
    ).run(train_fn, **kwargs)
