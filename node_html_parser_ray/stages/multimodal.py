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

from .dedup import _mix64


def _fake_bytes(seed: int, n: int) -> bytes:
    """Deterministic pseudo-random bytes via a vectorized splitmix64 stream.

    Replaces per-row ``np.random.RandomState(seed)`` — whose Mersenne
    initialization (~0.2 ms/row) was the dominant CPU cost of every fake
    codec path — with one numpy pass (~30x cheaper)."""
    words = (n + 7) >> 3
    idx = np.arange(words, dtype=np.uint64) + np.uint64(seed & 0xFFFFFFFF)
    return _mix64(idx).tobytes()[:n]


def _fake_floats(seed: int, n: int) -> np.ndarray:
    """Deterministic float32 features in [-1, 1) from the same stream."""
    u = (_mix64(np.arange(n, dtype=np.uint64) + np.uint64(seed & 0xFFFFFFFF))
         >> np.uint64(40)).astype(np.float32)
    return (u / np.float32(1 << 24) * 2 - 1).astype(np.float32)


__all__ = [
    "MediaDecodeStage",
    "AudioFeatureStage",
    "AUDIO_FEATURES_SCHEMA",
    "audio_features_schema",
    "media_features_schema",
    "ImageResizeStage",
    "FrameSampleStage",
    "MEDIA_FEATURES_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
    "fake_payload_batch",
]

def media_features_schema(feature_dim: int = 16) -> pa.Schema:
    """Output schema of MediaDecodeStage for a given feature width
    (round-4 review: the fixed 16-wide constant crashed any stage
    constructed with a non-default feature_dim)."""
    return pa.schema(
        [
            ("media_ref", pa.string()),
            ("kind", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("n_bytes", pa.int64()),
            ("features", pa.list_(pa.float32(), feature_dim)),
        ]
    )


MEDIA_FEATURES_SCHEMA = media_features_schema()


def payload_batch_size(avg_payload_bytes: int,
                       budget_bytes: int = 8 << 20,
                       lo: int = 8, hi: int = 1024) -> int:
    """Batch size for payload-bearing actor stages from a HEAP BUDGET,
    not a constant: ``batch_size x payload x concurrency`` is what must
    fit a worker heap (module scale note above), so the right batch size
    is budget/payload — 8-64 for real multi-MB media, ~1024 (capped) for
    the <1 KB deterministic fakes here.  A constant 32 was sized for the
    real-payload case and cost ~10x the necessary actor-task overhead on
    small payloads (round-5 bench)."""
    return max(lo, min(hi, budget_bytes // max(1, avg_payload_bytes)))


# max bytes a fake_payload_batch payload can reach (64 + seed % 512);
# payload_batch_size callers size their heap budget against this — keep
# it in lockstep with the sizing expression below
FAKE_PAYLOAD_MAX_BYTES = 64 + 512


def fake_payload_batch(batch: pa.Table) -> pa.Table:
    """Derive a deterministic fake binary payload from media_ref (testing).

    Stands in for fetching the real bytes from blob storage keyed by
    media_ref; byte length varies with the ref hash.
    """
    refs = batch.column("media_ref").to_pylist()
    payloads = []
    for ref in refs:
        seed = zlib.crc32(ref.encode())
        n = 64 + seed % (FAKE_PAYLOAD_MAX_BYTES - 64)
        payloads.append(_fake_bytes(seed, n))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


RESIZE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

FRAME_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int64()),
        ("frame", pa.binary()),
    ]
)


class ImageResizeStage:
    """Actor-pool stage: binary image payload -> resized payload at (w, h).

    Real plumbing (schema, per-actor setup, small-batch contract); the codec
    is STUBBED — a real build swaps ``_resize_fake`` for PIL's
    ``Image.open(...).resize(...)`` loaded once in ``__init__``.  The stub is
    deterministic: output bytes are a content-hash-seeded stream sized
    proportionally to the target area, so downstream size accounting is
    realistic.
    """

    def __init__(self, width: int = 224, height: int = 224,
                 real_decode: bool = False,
                 payload_column: str = "payload") -> None:
        self.width = width
        self.height = height
        self.payload_column = payload_column
        self._pil = None
        if real_decode:
            # probe the import like MediaDecodeStage (round-4 review: the
            # unconditional refusal contradicted the module contract —
            # real_decode=True must use the lib wherever the wheel exists)
            try:
                import PIL.Image

                self._pil = PIL.Image
            except Exception as e:  # pragma: no cover
                raise NotImplementedError(
                    "real resize requires PIL, not present in this "
                    "container; use the deterministic fake"
                ) from e

    def _resize_fake(self, payload: bytes) -> bytes:
        seed = zlib.crc32(payload)
        n = max(16, (self.width * self.height) // 512)
        return _fake_bytes(seed, n)

    def _resize_real(self, payload: bytes) -> bytes:  # pragma: no cover
        import io

        img = self._pil.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((self.width, self.height)).save(out, format="PNG")
        return out.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column(self.payload_column).to_pylist()
        resize = self._resize_real if self._pil is not None else self._resize_fake
        out = [resize(p or b"") for p in payloads]
        n = len(refs)
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array([self.width] * n, pa.int32()),
                pa.array([self.height] * n, pa.int32()),
                pa.array(out, pa.binary()),
                pa.array([len(b) for b in out], pa.int64()),
            ],
            schema=RESIZE_SCHEMA,
        )


class FrameSampleStage:
    """Actor-pool stage: video payload -> one output ROW PER SAMPLED FRAME
    (flat-map shape: a batch of n videos emits n × n_frames rows).

    Real plumbing: per-actor decoder setup, frame timestamps, exploded
    output rows sized for downstream batching.  The codec is STUBBED — a
    real build replaces ``_frames_fake`` with ffmpeg keyframe extraction;
    the stub deterministically slices the payload into ``n_frames`` chunks
    at evenly spaced fake timestamps.
    """

    def __init__(self, n_frames: int = 4, duration_ms: int = 10_000,
                 real_decode: bool = False) -> None:
        if n_frames < 1:
            # round-4 review: n_frames=0 raised ZeroDivisionError on the
            # first non-empty payload, mid-job — fail at construction
            raise ValueError(f"n_frames must be >= 1, got {n_frames}")
        self.n_frames = n_frames
        self.duration_ms = duration_ms
        if real_decode:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg, not present here"
            )

    def _frames_fake(self, payload: bytes) -> list[bytes]:
        if not payload:
            return [b""] * self.n_frames
        step = max(1, len(payload) // self.n_frames)
        return [payload[i * step:(i + 1) * step] for i in range(self.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_ref: list[str] = []
        o_idx: list[int] = []
        o_ts: list[int] = []
        o_frame: list[bytes] = []
        for ref, payload in zip(refs, payloads):
            frames = self._frames_fake(payload or b"")
            for i, fr in enumerate(frames):
                o_ref.append(ref)
                o_idx.append(i)
                o_ts.append(i * self.duration_ms // max(1, self.n_frames))
                o_frame.append(fr)
        return pa.Table.from_arrays(
            [
                pa.array(o_ref, pa.string()),
                pa.array(o_idx, pa.int32()),
                pa.array(o_ts, pa.int64()),
                pa.array(o_frame, pa.binary()),
            ],
            schema=FRAME_SCHEMA,
        )


def audio_features_schema(feature_dim: int = 16) -> pa.Schema:
    """Output schema of AudioFeatureStage for a given feature width."""
    return pa.schema(
        [
            ("media_ref", pa.string()),
            ("duration_ms", pa.int64()),
            ("sample_rate", pa.int32()),
            ("n_windows", pa.int32()),
            ("features", pa.list_(pa.float32(), feature_dim)),
        ]
    )


AUDIO_FEATURES_SCHEMA = audio_features_schema()


class AudioFeatureStage:
    """Actor-pool stage: audio payload -> (duration, windowed features).

    Same contract as the image/video stages: per-actor decoder setup in
    ``__init__`` (import-guarded — ``real_decode=True`` uses soundfile
    where the wheel exists, raises cleanly here), per-batch work in
    ``__call__``, small-batch sizing left to the caller because payloads
    are large.  The stub decoder is deterministic: duration derives from
    byte length at a nominal bitrate and features are a content-hash-seeded
    spectrogram-mean stand-in, so downstream pipelines exercise realistic
    shapes.
    """

    NOMINAL_BYTES_PER_SEC = 16_000  # stub bitrate: 128 kbit/s

    def __init__(self, real_decode: bool = False, feature_dim: int = 16,
                 window_ms: int = 250) -> None:
        self.feature_dim = feature_dim
        self.window_ms = window_ms
        self.schema = audio_features_schema(feature_dim)
        self._sf = None
        if real_decode:
            try:
                import soundfile  # type: ignore

                self._sf = soundfile
            # Exception, not ImportError: the standard soundfile failure
            # mode is an OSError from a missing libsndfile shared library
            # (round-4 review) — that must also surface as the clean
            # NotImplementedError, not an unexplained actor crash
            except Exception as e:  # pragma: no cover
                raise NotImplementedError(
                    "real audio decode requires soundfile/ffmpeg, not "
                    "present in this container; use the deterministic fake"
                ) from e

    def _decode_fake(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        h = zlib.crc32(payload)
        duration_ms = max(1, len(payload) * 1000 // self.NOMINAL_BYTES_PER_SEC)
        sample_rate = 16_000
        n_windows = max(1, duration_ms // self.window_ms)
        features = _fake_floats(h, self.feature_dim)
        return duration_ms, sample_rate, n_windows, features

    def _decode_real(self, payload: bytes):  # pragma: no cover - no wheel
        import io

        data, rate = self._sf.read(io.BytesIO(payload))
        data = np.atleast_2d(np.asarray(data, dtype=np.float32).T)
        duration_ms = int(data.shape[1] * 1000 / rate)
        n_windows = max(1, duration_ms // self.window_ms)
        strips = np.array_split(np.abs(data).mean(axis=0), self.feature_dim)
        feats = np.array([s.mean() if s.size else 0.0 for s in strips],
                         dtype=np.float32)
        return duration_ms, int(rate), n_windows, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        decode = self._decode_real if self._sf is not None else self._decode_fake
        dur: list[int] = []
        rate: list[int] = []
        wins: list[int] = []
        feats = np.empty((len(refs), self.feature_dim), dtype=np.float32)
        for i, payload in enumerate(payloads):
            d, r, w, f = decode(payload or b"")
            dur.append(d)
            rate.append(r)
            wins.append(w)
            feats[i] = f
        features_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.feature_dim
        )
        return pa.Table.from_arrays(
            [
                pa.array(refs, pa.string()),
                pa.array(dur, pa.int64()),
                pa.array(rate, pa.int32()),
                pa.array(wins, pa.int32()),
                features_col,
            ],
            schema=self.schema,
        )


class MediaDecodeStage:
    """Actor-pool stage: binary payload -> (dims, feature vector).

    ``__init__`` loads the (stub) decoder once per actor; ``__call__``
    processes one batch.  Pass ``real_decode=True`` once PIL/ffmpeg exist.
    """

    def __init__(self, real_decode: bool = False, feature_dim: int = 16) -> None:
        self.feature_dim = feature_dim
        self.schema = media_features_schema(feature_dim)
        self.decoder = None
        self._pil = None
        if real_decode:
            try:
                import PIL.Image

                self._pil = PIL.Image  # module cached once per actor
                self.decoder = "pil"
            # Exception, not ImportError: a broken native dependency must
            # also surface as the clean NotImplementedError (round-4 review)
            except Exception as e:  # pragma: no cover
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in "
                    "this container; use the deterministic fake decoder"
                ) from e

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = zlib.crc32(payload)
        width = 64 + (h & 0x3FF)
        height = 64 + ((h >> 10) & 0x3FF)
        features = _fake_floats(h, self.feature_dim)
        return width, height, features

    def _decode_pil(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Real decode: dims + a pooled-grayscale feature vector.

        Runs wherever the PIL wheel exists (not this container — covered by
        an import-guarded test that skips when PIL is absent).
        """
        import io

        img = self._pil.open(io.BytesIO(payload))
        width, height = img.size
        gray = np.asarray(img.convert("L"), dtype=np.float32) / 255.0
        # average-pool the image into feature_dim horizontal strips
        strips = np.array_split(gray, self.feature_dim, axis=0)
        features = np.array([s.mean() if s.size else 0.0 for s in strips],
                            dtype=np.float32)
        return width, height, features

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = (
            batch.column("kind").to_pylist()
            if "kind" in batch.column_names
            else ["image"] * len(refs)
        )
        payloads = batch.column("payload").to_pylist()
        decode_one = self._decode_pil if self.decoder == "pil" else self._decode_fake
        widths: list[int] = []
        heights: list[int] = []
        n_bytes: list[int] = []
        feats = np.empty((len(refs), self.feature_dim), dtype=np.float32)
        for i, payload in enumerate(payloads):
            payload = payload or b""
            w, h, f = decode_one(payload)
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
            schema=self.schema,
        )
