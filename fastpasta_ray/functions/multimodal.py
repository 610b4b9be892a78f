"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are NOT in this container, so the decode
kernels are deterministic fakes / NotImplementedError stubs (clearly
marked). The Ray-side plumbing is real and tested: schema, actor-pool
signatures, batch sizing for large binary payloads, output layout.

At 100 TB the rules for binary columns: small ``batch_size`` (payload ×
batch × concurrency must fit worker heap), actor pools so codec setup
happens once per actor, and zero-copy Arrow binary buffers end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),       # opaque encoded bytes
        ("media_type", pa.string()),    # "image/png", "audio/wav", ...
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

# recommended map_batches kwargs for large binary payloads
MEDIA_BATCH_KWARGS = dict(batch_format="pyarrow", batch_size=32)


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:06d}" for i in range(n)], type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/png"] * n, type=pa.string()),
            "width": pa.array([64] * n, type=pa.int32()),
            "height": pa.array([64] * n, type=pa.int32()),
            "sample_rate": pa.array([0] * n, type=pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool stage: decode image payloads → (h, w, c) arrays.

    STUB: real decode requires PIL/opencv (not in this container). With
    ``fake=True`` produces a deterministic pseudo-decode (hash-seeded pixel
    stats) so downstream plumbing is testable end to end."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        # real impl: import PIL here (once per actor) — keeps the heavy
        # codec setup out of the per-batch path
        if not fake:
            raise NotImplementedError(
                "real image decode needs PIL/opencv — not available in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        means, stds = [], []
        for p in payloads:
            a = np.frombuffer(p, dtype=np.uint8)
            means.append(float(a.mean()) if len(a) else 0.0)
            stds.append(float(a.std()) if len(a) else 0.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array((w * h).astype(np.int64)),
                "mean_value": pa.array(np.round(means, 4)),
                "std_value": pa.array(np.round(stds, 4)),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize decoded images to (target, target).

    The resize MATH is real (vectorized nearest-neighbor index gather);
    only the byte→pixel decode is the deterministic fake (payload bytes
    reshaped to height×width, truncated/padded) because no codec libs
    exist in this container — swap ``_decode`` for PIL in production."""

    def __init__(self, target: int = 32, fake: bool = True):
        self.target = target
        if not fake:
            raise NotImplementedError(
                "real image decode needs PIL/opencv — not available in this container"
            )

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        a = np.frombuffer(payload, dtype=np.uint8)
        need = w * h
        if len(a) < need:
            a = np.pad(a, (0, need - len(a)))
        return a[:need].reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        out_px = []
        for p, wi, hi in zip(batch["payload"].to_pylist(), w, h):
            img = self._decode(p, int(wi), int(hi))
            yi = (np.arange(t) * hi // t).astype(np.int64)
            xi = (np.arange(t) * wi // t).astype(np.int64)
            out_px.append(img[np.ix_(yi, xi)].reshape(-1))
        flat = np.concatenate(out_px) if out_px else np.zeros(0, dtype=np.uint8)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "resized": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=pa.uint8()), t * t
                ),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: take every Nth frame of a video payload.

    STUB decode (no ffmpeg here): payload bytes are treated as a stream of
    fixed-size frames (w×h bytes each); real impl swaps ``_frames``. The
    Ray-side shape — small batch_size, per-frame output rows (flat_map
    layout), actor init — is the real contract."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def _frames(self, payload: bytes, w: int, h: int) -> np.ndarray:
        fsz = max(w * h, 1)
        n = len(payload) // fsz
        return np.frombuffer(payload[: n * fsz], dtype=np.uint8).reshape(n, fsz)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_fidx, out_mean = [], [], []
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        for mid, p, wi, hi in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), w, h
        ):
            fr = self._frames(p, int(wi), int(hi))[:: self.every_n]
            out_id.extend([mid] * len(fr))
            out_fidx.extend(range(len(fr)))
            out_mean.extend(np.round(fr.mean(axis=1), 4).tolist() if len(fr) else [])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.string()),
                "frame_idx": pa.array(out_fidx, type=pa.int64()),
                "frame_mean": pa.array(out_mean, type=pa.float64()),
            }
        )


class AudioFrameSampler:
    """Actor-pool stage: sample every Nth frame of an audio payload.

    STUB decode (no soundfile/librosa here): treats payload bytes as PCM
    u8; real impl swaps `_decode`."""

    def __init__(self, every_n: int = 1000):
        self.every_n = every_n

    def _decode(self, payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_n, out_mean = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            samples = self._decode(p)[:: self.every_n]
            out_id.append(mid)
            out_n.append(len(samples))
            out_mean.append(float(np.round(samples.mean(), 6)) if len(samples) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.string()),
                "n_samples": pa.array(out_n, type=pa.int64()),
                "mean_sample": pa.array(out_mean, type=pa.float64()),
            }
        )
