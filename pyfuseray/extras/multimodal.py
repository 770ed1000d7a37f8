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


def decode_audio(payload: bytes, *, fake: bool = False,
                 n_samples: int = 2048) -> np.ndarray:
    """Decode encoded audio to a float32 waveform.

    STUB like ``decode_image``: real decoding needs an audio library not
    present here; ``fake=True`` yields a deterministic pseudo-waveform
    seeded by the payload digest."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n_samples)).astype(np.float32)


def decode_video_frames(payload: bytes, *, fake: bool = False,
                        n_frames: int = 16) -> list[np.ndarray]:
    """Decode encoded video to a list of HxWx3 frames (STUB, see above)."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    base = hashlib.md5(payload or b"").digest()
    return [decode_image(base + bytes([i]), fake=True) for i in range(n_frames)]


class ResizeStage:
    """Actor-pool stage: decode -> block-average resize -> raw-RGB
    payload with updated dims. The resize math (vectorized reshape-mean)
    is real; only the decode kernel is the environment stub."""

    def __init__(self, out_w: int = 4, out_h: int = 4, fake: bool = True):
        self.out_w, self.out_h, self.fake = out_w, out_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload = []
        for p in batch.column("payload").to_pylist():
            img = decode_image(p, fake=self.fake).astype(np.float32)
            h, w, _ = img.shape
            fy, fx = h // self.out_h, w // self.out_w
            small = img[: fy * self.out_h, : fx * self.out_w].reshape(
                self.out_h, fy, self.out_w, fx, 3
            ).mean(axis=(1, 3))
            out_payload.append(small.astype(np.uint8).tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array([self.out_w] * n, pa.int32()),
                "height": pa.array([self.out_h] * n, pa.int32()),
                "sample_rate": batch.column("sample_rate"),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: one video row -> ``n_frames`` frame rows
    (media_id, frame_idx, payload) — the flat-map shape for video
    pipelines (each output row is one decoded-frame payload)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            decoded = decode_video_frames(p, fake=self.fake,
                                          n_frames=self.n_frames)
            for i, frame in enumerate(decoded):
                ids.append(mid)
                fidx.append(i)
                frames.append(frame.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: audio payload -> fixed-dim log-spectrum feature
    (real numpy rfft; decode kernel stubbed)."""

    def __init__(self, n_bins: int = 32, fake: bool = True):
        self.n_bins, self.fake = n_bins, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        feats = []
        for p in batch.column("payload").to_pylist():
            wave = decode_audio(p, fake=self.fake)
            spec = np.abs(np.fft.rfft(wave))
            # average into n_bins log-magnitude bands, l2-normalized
            usable = spec[: (spec.size // self.n_bins) * self.n_bins]
            bands = np.log1p(usable.reshape(self.n_bins, -1).mean(axis=1))
            bands /= max(float(np.linalg.norm(bands)), 1e-30)
            feats.append(bands.astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def synth_media(n: int, seed: int = 42, kinds: tuple[str, ...] = ("image",)) -> pa.Table:
    """Deterministic fake media table for tests (kinds cycle per row)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes() for _ in range(n)]
    kind_col = [kinds[i % len(kinds)] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(kind_col, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array([8] * n, type=pa.int32()),
            "height": pa.array([8] * n, type=pa.int32()),
            "sample_rate": pa.array([16000] * n, type=pa.int32()),
        }
    )
