"""Multimodal (image/audio/video) column stages — real plumbing, stubbed codecs.

Treats media as opaque ``binary`` payload columns with typed metadata
(media_type, width/height or sample_rate, byte length). The Ray-side shape —
actor-pool ``map_batches`` with small batches (large rows!), Arrow binary
columns end-to-end, schema'd outputs — is real and tested; only the codec
kernels are stubs, because no image/audio libraries exist in this container.

Stub policy (per project brief): ``DecodeImage(strict=True)`` raises
``NotImplementedError`` exactly where a real decoder (PIL/libjpeg) would be
invoked; ``strict=False`` (default, used by tests) substitutes a
DETERMINISTIC fake decode — feature values derived from the payload bytes —
so downstream plumbing (schema, batching, actor signatures) is exercised
honestly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png" | "audio/wav" | ...
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media payloads for tests (no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(64, 4096, n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(["image/png" if i % 2 == 0 else "audio/wav" for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(rng.integers(16, 512, n, dtype=np.int32), pa.int32()),
            "meta_height": pa.array(rng.integers(16, 512, n, dtype=np.int32), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor-pool stage: decode + feature-extract an image payload column.

    Real deployment: ``__init__`` loads the codec / model once per actor;
    ``__call__`` decodes a SMALL batch (large binary rows → keep
    ``batch_size`` low, e.g. 32–128, so batch × concurrency fits worker
    heaps). Here the decode kernel is stubbed.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # real version: self.codec = PIL/torchvision loaded once per actor

    def _decode_stub(self, payload: bytes) -> tuple[int, float]:
        if self.strict:
            raise NotImplementedError(
                "image decode requires an image codec library (PIL/libjpeg), "
                "not available in this container — plumbing only"
            )
        # deterministic fake: byte stats stand in for decoded-pixel stats
        a = np.frombuffer(payload, dtype=np.uint8)
        return len(a), float(a.mean()) if len(a) else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        sizes, means = [], []
        for v in batch.column("payload").to_pylist():
            s, m = self._decode_stub(v or b"")
            sizes.append(s)
            means.append(m)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_bytes": pa.array(sizes, pa.int64()),
                "mean_intensity": pa.array(means, pa.float64()),
                "meta_width": batch.column("meta_width"),
                "meta_height": batch.column("meta_height"),
            }
        )


class ResizeImage:
    """Stubbed resize stage — validates/propagates metadata, fakes pixels."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("resize requires an image library")
        n = batch.num_rows
        batch = batch.set_column(
            batch.column_names.index("meta_width"), "meta_width",
            pa.array([self.w] * n, pa.int32()),
        )
        return batch.set_column(
            batch.column_names.index("meta_height"), "meta_height",
            pa.array([self.h] * n, pa.int32()),
        )


class SampleFrames:
    """Video frame-sampling stub: emits one row per sampled frame index —
    the flat_map-shaped explode a real frame sampler produces."""

    def __init__(self, every_n: int = 10, strict: bool = False):
        self.every_n, self.strict = every_n, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("frame sampling requires a video codec")
        ids, frames = [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n_frames = max(1, len(payload or b"") // 256)  # fake frame count
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
        )
