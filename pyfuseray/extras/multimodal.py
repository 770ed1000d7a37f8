"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so
the DECODE KERNEL is stubbed (``decode_image`` raises
``NotImplementedError`` unless ``fake=True`` supplies the deterministic
test decoder) — but the Ray-side plumbing is real and tested: schema
(binary payload + metadata columns), actor-pool stage signature, small
batch sizes for wide binary rows, and fixed-shape float32 feature
output (the shape a real ResNet-style extractor would produce;
reference ``app/MultiDim.py:173-187`` is the serial analogue).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),        # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

FEATURE_DIM = 64


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to an HxWx3 array.

    STUB: real decoding needs an image library that is not present in
    this container. ``fake=True`` returns a deterministic pseudo-decode
    (seeded by the payload digest) with the right dtype/shape so the
    distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


class MediaFeatureStage:
    """Actor-pool stage: (media_id, payload, ...) -> (media_id, feature).

    A real deployment loads the decoder/model once per actor here; the
    test path uses the deterministic fake decoder + a fixed random
    projection as the "model". Use small ``batch_size`` (payloads are
    wide binary rows) and ``num_cpus``/``num_gpus`` per actor sized to
    the model.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM, fake: bool = True):
        self.fake = fake
        rng = np.random.default_rng(1234)  # the "model": loaded once per actor
        self.projection = rng.standard_normal((8 * 8 * 3, feature_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            img = decode_image(p, fake=self.fake).astype(np.float32).ravel() / 255.0
            v = img @ self.projection
            v /= max(float(np.linalg.norm(v)), 1e-30)
            feats.append(v.astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def extract_features(
    media: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
    fake: bool = True,
) -> rd.Dataset:
    """media table -> (media_id, feature: list<float32>[FEATURE_DIM])."""
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload rows are wide
        concurrency=concurrency,
    )


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image"] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array([8] * n, type=pa.int32()),
            "height": pa.array([8] * n, type=pa.int32()),
            "sample_rate": pa.array([0] * n, type=pa.int32()),
        }
    )
