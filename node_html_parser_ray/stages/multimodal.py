"""Multimodal column stages: decode / feature-extract over opaque binary.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(media_ref, kind).  The Ray-side plumbing — schema, small batch sizes for
large payloads, actor signature, output layout — is real and tested; the
actual codec is STUBBED: real decoding requires PIL/ffmpeg which are not in
this container, so ``MediaDecodeStage(real_decode=True)`` raises
``NotImplementedError`` unless the libs import, and the default path uses a
deterministic fake decoder (content-hash-derived dimensions + features) so
pipelines exercise the full dataflow deterministically.

Scale note: payload batches must stay small (batch_size 8-64) so
``batch_size × payload × concurrency`` fits worker heaps; callers pass
``batch_size`` accordingly — the stage itself is payload-size-agnostic.
"""
from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa

__all__ = ["MediaDecodeStage", "MEDIA_FEATURES_SCHEMA", "fake_payload_batch"]

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("features", pa.list_(pa.float32(), 16)),
    ]
)


def fake_payload_batch(batch: pa.Table) -> pa.Table:
    """Derive a deterministic fake binary payload from media_ref (testing).

    Stands in for fetching the real bytes from blob storage keyed by
    media_ref; byte length varies with the ref hash.
    """
    refs = batch.column("media_ref").to_pylist()
    payloads = []
    for ref in refs:
        seed = zlib.crc32(ref.encode())
        n = 64 + seed % 512
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        payloads.append(rng.bytes(n))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class MediaDecodeStage:
    """Actor-pool stage: binary payload -> (dims, feature vector).

    ``__init__`` loads the (stub) decoder once per actor; ``__call__``
    processes one batch.  Pass ``real_decode=True`` once PIL/ffmpeg exist.
    """

    def __init__(self, real_decode: bool = False, feature_dim: int = 16) -> None:
        self.feature_dim = feature_dim
        self.decoder = None
        if real_decode:
            try:
                import PIL.Image  # noqa: F401

                self.decoder = "pil"
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in "
                    "this container; use the deterministic fake decoder"
                ) from e

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = zlib.crc32(payload)
        width = 64 + (h & 0x3FF)
        height = 64 + ((h >> 10) & 0x3FF)
        rng = np.random.RandomState(h & 0x7FFFFFFF)
        features = rng.standard_normal(self.feature_dim).astype(np.float32)
        return width, height, features

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = (
            batch.column("kind").to_pylist()
            if "kind" in batch.column_names
            else ["image"] * len(refs)
        )
        payloads = batch.column("payload").to_pylist()
        widths: list[int] = []
        heights: list[int] = []
        n_bytes: list[int] = []
        feats = np.empty((len(refs), self.feature_dim), dtype=np.float32)
        for i, payload in enumerate(payloads):
            payload = payload or b""
            if self.decoder == "pil":  # pragma: no cover - not in container
                raise NotImplementedError("real decode path not available here")
            w, h, f = self._decode_fake(payload)
            widths.append(w)
            heights.append(h)
            n_bytes.append(len(payload))
            feats[i] = f
        features_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.feature_dim
        )
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(kinds, pa.string()),
                pa.array(widths, pa.int32()),
                pa.array(heights, pa.int32()),
                pa.array(n_bytes, pa.int64()),
                features_col,
            ],
            schema=MEDIA_FEATURES_SCHEMA,
        )
