"""Multimodal column stages: image/audio/video as opaque binary + metadata.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs): `DETERMINISTIC_FAKE_DECODE` derives stable
pseudo-features from the payload bytes so the Ray-side plumbing — schema,
batch size, actor pool signature, output layout — is real and testable.
Swap `_fake_*` for a real decoder (PIL / torchaudio / pyav) in production;
the stage contract does not change.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

DETERMINISTIC_FAKE_DECODE = True

IMAGE_FEATURES_SCHEMA = pa.schema([
    pa.field("item_id", pa.int64()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_channels", pa.int32()),
    pa.field("features", pa.list_(pa.float32())),
    pa.field("status", pa.string()),
])


def _fake_decode_image(payload: bytes):
    """STUB decoder: derives (w, h, c) and a 32-d feature vector from the
    byte content.  Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty image payload")
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    feats = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
    return w, h, 3, feats


class ImageFeatureBatch:
    """Actor-pool image decode/feature stage.

    Real-world shape: model/codec loads once in __init__ (per actor), work
    happens per batch over zero-copy binary cells; batches must stay small
    because payloads are large (pipeline sets batch_size accordingly).
    """

    def __init__(self, feature_dim: int = 32):
        # production: load the vision model / codec ONCE here
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws, hs, cs, feats, status = [], [], [], [], []
        for payload in payloads:
            try:
                w, h, c, f = _fake_decode_image(payload or b"")
                ws.append(w)
                hs.append(h)
                cs.append(c)
                feats.append(f[:self.feature_dim].tolist())
                status.append("ok")
            except Exception as e:
                ws.append(0)
                hs.append(0)
                cs.append(0)
                # empty (not null) keeps the list column rectangular-friendly
                # for downstream pandas/tensor conversion
                feats.append([])
                status.append(f"error: {type(e).__name__}")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(ws, pa.int32()),
             pa.array(hs, pa.int32()), pa.array(cs, pa.int32()),
             pa.array(feats, pa.list_(pa.float32())),
             pa.array(status, pa.string())],
            schema=IMAGE_FEATURES_SCHEMA)


def image_features(ds, *, batch_size: int = 8, concurrency=None):
    """Large binary payloads => small batches.  Task-compute by default
    (warm-worker decoder singleton); explicit concurrency => actor pool."""
    if concurrency is not None:
        return ds.map_batches(ImageFeatureBatch, batch_size=batch_size,
                              batch_format="pyarrow", concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(ImageFeatureBatch)(batch)
    return ds.map_batches(fn, batch_size=batch_size, batch_format="pyarrow")


class FrameSampleBatch:
    """Video frame-sampling stage (STUB): emits one row per sampled frame
    index — the flat_map-shaped layout a real sampler would produce."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        frame_idx: List[int] = []
        frame_sig: List[bytes] = []
        for item_id, payload in zip(batch.column("item_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
            payload = payload or b""
            n_frames = max(1, len(payload) // 1024)  # STUB: 1 "frame"/KiB
            for fi in range(0, n_frames, self.every_n):
                ids_out.append(item_id)
                frame_idx.append(fi)
                frame_sig.append(hashlib.blake2b(
                    payload[fi * 1024:(fi + 1) * 1024], digest_size=8).digest())
        return pa.Table.from_arrays(
            [pa.array(ids_out, pa.int64()), pa.array(frame_idx, pa.int32()),
             pa.array(frame_sig, pa.binary())],
            names=["item_id", "frame_idx", "frame_sig"])


def sample_frames(ds, *, every_n: int = 30, batch_size: int = 4, concurrency=None):
    if concurrency is not None:
        return ds.map_batches(FrameSampleBatch,
                              fn_constructor_kwargs={"every_n": every_n},
                              batch_size=batch_size, batch_format="pyarrow",
                              concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(FrameSampleBatch, every_n=every_n)(batch)
    return ds.map_batches(fn, batch_size=batch_size, batch_format="pyarrow")


AUDIO_FEATURES_SCHEMA = pa.schema([
    pa.field("item_id", pa.int64()),
    pa.field("duration_s", pa.float32()),
    pa.field("sample_rate", pa.int32()),
    pa.field("mfcc", pa.list_(pa.float32())),
    pa.field("status", pa.string()),
])


class AudioFeatureBatch:
    """Audio decode/feature stage (STUB decoder, real plumbing): emits
    duration/sample-rate metadata + a fixed-width pseudo-MFCC vector."""

    def __init__(self, n_mfcc: int = 13):
        # production: load the audio codec / feature extractor ONCE here
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs, srs, mfccs, status = [], [], [], []
        for payload in payloads:
            payload = payload or b""
            if not payload:
                durs.append(0.0)
                srs.append(0)
                mfccs.append([])
                status.append("error: empty")
                continue
            digest = hashlib.sha256(payload).digest()
            durs.append(len(payload) / 32000.0)  # STUB: 16 kHz 16-bit mono
            srs.append(16000)
            feats = np.frombuffer(digest[:self.n_mfcc * 2], dtype=np.uint16)
            mfccs.append((feats.astype(np.float32) / 655.35 - 50.0).tolist())
            status.append("ok")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(durs, pa.float32()),
             pa.array(srs, pa.int32()), pa.array(mfccs, pa.list_(pa.float32())),
             pa.array(status, pa.string())],
            schema=AUDIO_FEATURES_SCHEMA)


def audio_features(ds, *, batch_size: int = 8, concurrency=None):
    if concurrency is not None:
        return ds.map_batches(AudioFeatureBatch, batch_size=batch_size,
                              batch_format="pyarrow", concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(AudioFeatureBatch)(batch)
    return ds.map_batches(fn, batch_size=batch_size, batch_format="pyarrow")
