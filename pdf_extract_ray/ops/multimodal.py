"""Multimodal column stages: image/audio/video as opaque binary + metadata.

Decode kernels: baseline AND progressive JPEG (SOF0/1/2, spectral
selection + successive approximation), PNG, uncompressed BMP and PCM
WAV are decoded FOR REAL with the pure-python codecs in ops/codecs.py
(huffman+IDCT / zlib / struct / wave) — dimensions, channels and
features come from actual pixels/samples.  Formats that still need an
external codec (arithmetic-coded/12-bit JPEG, H.264, ...) fall back to
the declared deterministic fake (`DETERMINISTIC_FAKE_DECODE` path) so
the Ray-side plumbing — schema, batch size, actor pool signature,
output layout — stays total and testable; swap the fallback for
PIL/pyav in production without changing the stage contract.  Video
frame sampling is REAL for MJPEG-in-AVI (RIFF container walk +
per-frame JPEG decode); MP4 gets a real container walk (moov/stbl
sample tables -> actual frame byte ranges) with fake pixel sigs."""
from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import (decode_bmp, decode_jpeg, decode_png, decode_wav,
                     sniff_media)

# the FALLBACK for undecodable formats is fake; png/bmp/wav decode real
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
    """FALLBACK decoder for formats without a pure-stdlib codec: derives
    (w, h, c) and a feature vector from the byte content.  Raises on
    empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty image payload")
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    feats = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
    return w, h, 3, feats


def _image_features_real(img: np.ndarray, dim: int) -> np.ndarray:
    """Real features from decoded pixels: per-channel mean/std (up to 4
    channels) + 16-bin luminance histogram, padded/truncated to `dim`."""
    px = img.astype(np.float32) / 255.0
    feats = []
    for c in range(min(img.shape[2], 4)):
        feats.append(float(px[:, :, c].mean()))
        feats.append(float(px[:, :, c].std()))
    lum = px[:, :, :3].mean(axis=2) if img.shape[2] >= 3 else px[:, :, 0]
    hist, _ = np.histogram(lum, bins=16, range=(0.0, 1.0))
    feats.extend((hist / max(1, lum.size)).tolist())
    out = np.zeros(dim, dtype=np.float32)
    n = min(dim, len(feats))
    out[:n] = np.asarray(feats[:n], dtype=np.float32)
    return out


def decode_image(payload: bytes, feature_dim: int):
    """-> (w, h, channels, features): real decode for baseline
    JPEG/PNG/BMP, declared deterministic fake for anything else."""
    kind = sniff_media(payload or b"")
    if kind == "png":
        img = decode_png(payload)
    elif kind == "bmp":
        img = decode_bmp(payload)
    elif kind == "jpeg":
        try:
            img = decode_jpeg(payload)
        except ValueError:
            # arithmetic/12-bit/damaged: the declared fake keeps the
            # stage total (baseline AND progressive decode for real)
            w, h, c, f = _fake_decode_image(payload)
            return w, h, c, f[:feature_dim]
    else:
        w, h, c, f = _fake_decode_image(payload)
        return w, h, c, f[:feature_dim]
    h, w, c = img.shape
    return w, h, c, _image_features_real(img, feature_dim)


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
                w, h, c, f = decode_image(payload or b"", self.feature_dim)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                feats.append(f.tolist())
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
    """Video frame-sampling stage: REAL decode for MJPEG-in-AVI
    (ops/codecs.parse_avi_mjpeg container walk + decode_jpeg per
    sampled frame — frame_sig hashes the DECODED RGB pixels, so
    re-muxed containers with identical frames dedup together).  MP4
    gets a REAL container walk (ops/codecs.parse_mp4_samples: moov/
    trak/stbl sample tables -> actual frame byte ranges; seeks land on
    the nearest preceding stss sync sample, like a real sampler) —
    frame_sig hashes the actual coded sample payload and rows carry
    status='container' because H.264 pixel decode stays out of scope.
    Anything else keeps the declared byte-window fake so the stage
    stays total.  Emits one row per sampled frame — the
    flat_map-shaped layout."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codecs import decode_jpeg, parse_avi_mjpeg, parse_mp4_samples
        ids_out: List[int] = []
        frame_idx: List[int] = []
        frame_sig: List[bytes] = []
        status: List[str] = []
        for item_id, payload in zip(batch.column("item_id").to_pylist(),
                                    batch.column("payload").to_pylist()):
            payload = payload or b""
            kind = sniff_media(payload)
            if kind == "avi":
                try:
                    frames = parse_avi_mjpeg(payload)
                    for fi in range(0, len(frames), self.every_n):
                        img = decode_jpeg(frames[fi])
                        ids_out.append(item_id)
                        frame_idx.append(fi)
                        frame_sig.append(hashlib.blake2b(
                            img.tobytes(), digest_size=8).digest())
                        status.append("ok")
                    continue
                except Exception:
                    pass  # damaged AVI: fall through to the fake path
            elif kind == "mp4":
                try:
                    samples = parse_mp4_samples(payload)["samples"]
                    syncs = [i for i, s in enumerate(samples) if s[2]] \
                        or list(range(len(samples)))
                    picked = []
                    for target in range(0, len(samples), self.every_n):
                        # nearest preceding keyframe (first one if the
                        # target precedes every sync sample)
                        prev = [i for i in syncs if i <= target]
                        pick = prev[-1] if prev else syncs[0]
                        if pick not in picked:
                            picked.append(pick)
                    for fi in picked:
                        off, size, _ = samples[fi]
                        ids_out.append(item_id)
                        frame_idx.append(fi)
                        frame_sig.append(hashlib.blake2b(
                            payload[off:off + size],
                            digest_size=8).digest())
                        status.append("container")
                    continue
                except ValueError:
                    pass  # damaged MP4: fall through to the fake path
            n_frames = max(1, len(payload) // 1024)  # fake: 1 "frame"/KiB
            for fi in range(0, n_frames, self.every_n):
                ids_out.append(item_id)
                frame_idx.append(fi)
                frame_sig.append(hashlib.blake2b(
                    payload[fi * 1024:(fi + 1) * 1024], digest_size=8).digest())
                status.append("fake")
        return pa.Table.from_arrays(
            [pa.array(ids_out, pa.int64()), pa.array(frame_idx, pa.int32()),
             pa.array(frame_sig, pa.binary()),
             pa.array(status, pa.string())],
            names=["item_id", "frame_idx", "frame_sig", "status"])


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
    """Audio decode/feature stage: REAL decode for PCM WAV (stdlib wave —
    true duration/rate + per-segment RMS envelope standing in for MFCC),
    declared deterministic fake for compressed formats."""

    def __init__(self, n_mfcc: int = 13):
        # production: load the audio codec / feature extractor ONCE here
        self.n_mfcc = n_mfcc

    def _wav_features(self, payload: bytes):
        samples, rate, _sw = decode_wav(payload)
        mono = samples.mean(axis=1)
        dur = len(mono) / float(rate)
        segs = np.array_split(mono, self.n_mfcc)
        rms = [float(np.sqrt(np.mean(s * s))) if len(s) else 0.0
               for s in segs]
        return dur, rate, rms

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
            if sniff_media(payload) == "wav":
                try:
                    dur, rate, rms = self._wav_features(payload)
                    durs.append(dur)
                    srs.append(rate)
                    mfccs.append(rms)
                    status.append("ok")
                    continue
                except Exception as e:
                    durs.append(0.0)
                    srs.append(0)
                    mfccs.append([])
                    status.append(f"error: {type(e).__name__}")
                    continue
            digest = hashlib.sha256(payload).digest()
            durs.append(len(payload) / 32000.0)  # FAKE: 16 kHz 16-bit mono
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


RESIZED_IMAGE_SCHEMA = pa.schema([
    pa.field("item_id", pa.int64()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_channels", pa.int32()),
    pa.field("pixels", pa.binary()),
    pa.field("status", pa.string()),
])


def _resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Real nearest-neighbor resample (pure numpy index math)."""
    sh, sw = img.shape[0], img.shape[1]
    ys = (np.arange(h) * (sh / h)).astype(np.int64).clip(0, sh - 1)
    xs = (np.arange(w) * (sw / w)).astype(np.int64).clip(0, sw - 1)
    return img[ys][:, xs]


class ResizeImageBatch:
    """Actor-pool image resize stage: decode (real for PNG/BMP), resize
    to a fixed (width, height) with nearest-neighbor index math, emit
    RAW interleaved uint8 pixels + dims.  Formats without a pure-stdlib
    codec emit a DETERMINISTIC pseudo-image (hash-seeded gradient,
    status='fake') so the stage stays total — swap for PIL in
    production without changing the contract."""

    def __init__(self, width: int = 32, height: int = 32):
        # production: codec/accelerator context loads ONCE per actor
        self.width = int(width)
        self.height = int(height)

    def _fallback(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        base = np.frombuffer(digest, np.uint8).astype(np.float32)
        col = np.resize(base, self.width)
        row = np.resize(base[::-1], self.height)
        grad = (row[:, None] + col[None, :]) / 2.0
        return np.stack([grad, np.flipud(grad), np.fliplr(grad)],
                        axis=2).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        px, ws, hs, cs, status = [], [], [], [], []
        for payload in payloads:
            payload = payload or b""
            try:
                kind = sniff_media(payload)
                if kind == "png":
                    img, st = decode_png(payload), "ok"
                elif kind == "bmp":
                    img, st = decode_bmp(payload), "ok"
                elif kind == "jpeg":
                    try:
                        img, st = decode_jpeg(payload), "ok"
                    except ValueError:
                        img, st = self._fallback(payload), "fake"
                elif not payload:
                    raise ValueError("empty image payload")
                else:
                    img, st = self._fallback(payload), "fake"
                out = _resize_nearest(img, self.width, self.height)
                px.append(np.ascontiguousarray(out).tobytes())
                ws.append(self.width)
                hs.append(self.height)
                cs.append(out.shape[2])
                status.append(st)
            except Exception as e:
                px.append(b"")
                ws.append(0)
                hs.append(0)
                cs.append(0)
                status.append(f"error: {type(e).__name__}")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(ws, pa.int32()),
             pa.array(hs, pa.int32()), pa.array(cs, pa.int32()),
             pa.array(px, pa.binary()), pa.array(status, pa.string())],
            schema=RESIZED_IMAGE_SCHEMA)


def resize_images(ds, *, width: int = 32, height: int = 32,
                  batch_size: int = 8, concurrency=None):
    """Large binary payloads in AND out => small batches; actor pool
    when `concurrency` is set, warm-worker task singleton otherwise."""
    if concurrency is not None:
        return ds.map_batches(ResizeImageBatch,
                              fn_constructor_kwargs={"width": width,
                                                     "height": height},
                              batch_size=batch_size,
                              batch_format="pyarrow",
                              concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(ResizeImageBatch, width=width, height=height)(batch)
    return ds.map_batches(fn, batch_size=batch_size,
                          batch_format="pyarrow")


RESAMPLED_AUDIO_SCHEMA = pa.schema([
    pa.field("item_id", pa.int64()),
    pa.field("sample_rate", pa.int32()),
    pa.field("n_samples", pa.int32()),
    pa.field("pcm16", pa.binary()),
    pa.field("status", pa.string()),
])


class ResampleAudioBatch:
    """Actor-pool audio resample stage: REAL decode for PCM WAV (stdlib
    wave), downmix to mono, LINEAR-interpolation resample to
    `target_rate` (one np.interp per clip — the standard polyphase-free
    baseline), emit raw little-endian int16 PCM.  Non-WAV payloads emit
    a DETERMINISTIC hash-seeded PCM clip (status='fake') so the stage
    stays total — swap the decoder in production without changing the
    contract."""

    def __init__(self, target_rate: int = 4000):
        # production: codec context / resampler state loads ONCE here
        self.target_rate = int(target_rate)

    def _resample(self, mono: np.ndarray, rate: int) -> np.ndarray:
        if len(mono) == 0 or rate == self.target_rate:
            return mono
        n_out = int((len(mono) - 1) * self.target_rate / rate) + 1
        pos = np.arange(n_out, dtype=np.float64) * (rate /
                                                    self.target_rate)
        return np.interp(pos, np.arange(len(mono), dtype=np.float64),
                         mono)

    def _fallback(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        seed = np.frombuffer(digest, np.uint8).astype(np.float64)
        n = self.target_rate // 4
        return np.resize(seed / 255.0 - 0.5, n)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates, ns, pcms, status = [], [], [], []
        for payload in payloads:
            payload = payload or b""
            try:
                if not payload:
                    raise ValueError("empty audio payload")
                if sniff_media(payload) == "wav":
                    samples, rate, _sw = decode_wav(payload)
                    mono = samples.mean(axis=1)
                    out, st = self._resample(mono, rate), "ok"
                else:
                    out, st = self._fallback(payload), "fake"
                pcm = np.clip(np.rint(out * 32767.0), -32768,
                              32767).astype("<i2")
                rates.append(self.target_rate)
                ns.append(len(pcm))
                pcms.append(pcm.tobytes())
                status.append(st)
            except Exception as e:
                rates.append(0)
                ns.append(0)
                pcms.append(b"")
                status.append(f"error: {type(e).__name__}")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(rates, pa.int32()),
             pa.array(ns, pa.int32()), pa.array(pcms, pa.binary()),
             pa.array(status, pa.string())],
            schema=RESAMPLED_AUDIO_SCHEMA)


def resample_audio(ds, *, target_rate: int = 4000, batch_size: int = 8,
                   concurrency=None):
    """Large binary payloads -> SMALL batches (the multimodal sizing
    rule); actor pool when `concurrency` is given, warm task singleton
    otherwise."""
    if concurrency is not None:
        return ds.map_batches(ResampleAudioBatch,
                              fn_constructor_kwargs={
                                  "target_rate": target_rate},
                              batch_size=batch_size,
                              batch_format="pyarrow",
                              concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(ResampleAudioBatch, target_rate=target_rate)(batch)
    return ds.map_batches(fn, batch_size=batch_size,
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# perceptual image dedup (dHash)
# ---------------------------------------------------------------------------


def _block_mean(g: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Exact area-mean downsample of a 2-D float array to (rows, cols)
    via reduceat over integer block edges (no codec, no float grid)."""
    if g.shape[0] < rows or g.shape[1] < cols:
        # upscale tiny images first so every block is non-empty
        rep_r = -(-rows * 2 // g.shape[0])
        rep_c = -(-cols * 2 // g.shape[1])
        g = np.repeat(np.repeat(g, rep_r, axis=0), rep_c, axis=1)
    r_edges = (np.arange(rows + 1) * g.shape[0]) // rows
    c_edges = (np.arange(cols + 1) * g.shape[1]) // cols
    rs = np.add.reduceat(g, r_edges[:-1], axis=0)
    cs = np.add.reduceat(rs, c_edges[:-1], axis=1)
    areas = (np.diff(r_edges)[:, None]
             * np.diff(c_edges)[None, :]).astype(np.float64)
    return cs / areas


_DHASH_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of decoded pixels: luminance -> exact
    9x8 block means -> horizontal gradient sign bits.  Invariant to
    encoding container (PNG vs BMP of the same pixels hash equal) and
    to uniform brightness shifts (gradient comparison)."""
    px = img.astype(np.float64)
    g = px[:, :, :3].mean(axis=2) if img.shape[2] >= 3 else px[:, :, 0]
    m = _block_mean(g, 8, 9)
    bits = (m[:, 1:] > m[:, :-1]).ravel()
    return int((_DHASH_BITS[bits]).sum(dtype=np.uint64))


class ImageDHashBatch:
    """Actor-pool perceptual-hash stage: decode (real for PNG/BMP,
    deterministic declared-fake pseudo-pixels otherwise — the
    ResizeImageBatch contract), emit (item_id, dhash, status).  The
    hash is 8 B/image, so the downstream dedup shuffle never carries
    pixels."""

    def __init__(self):
        # production: codec context loads ONCE per actor
        pass

    def _fallback(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        base = np.frombuffer(digest, np.uint8).astype(np.float32)
        col = np.resize(base, 36)
        row = np.resize(base[::-1], 32)
        grad = (row[:, None] + col[None, :]) / 2.0
        return grad[:, :, None].astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        hashes, status = [], []
        for payload in payloads:
            payload = payload or b""
            try:
                kind = sniff_media(payload)
                if kind == "png":
                    img, st = decode_png(payload), "ok"
                elif kind == "bmp":
                    img, st = decode_bmp(payload), "ok"
                elif kind == "jpeg":
                    try:
                        img, st = decode_jpeg(payload), "ok"
                    except ValueError:
                        img, st = self._fallback(payload), "fake"
                else:
                    img, st = self._fallback(payload), "fake"
                hashes.append(np.int64(np.uint64(dhash64(img))))
                status.append(st)
            except Exception as e:
                hashes.append(np.int64(-1))
                status.append(f"error: {type(e).__name__}")
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(hashes, pa.int64()),
             pa.array(status, pa.string())],
            names=["item_id", "dhash", "status"])


def image_dhash_groups(ds, *, batch_size: int = 8, concurrency=None,
                       min_group: int = 2):
    """Perceptual image dedup: dHash every payload (small batches — the
    multimodal sizing rule), then ONE (dhash, item_id) aggregation
    shuffle electing min-id representatives -> (dhash, item_id,
    n_items) for groups of >= min_group pixel-equivalent images.
    Decode failures are status-gated out before the aggregate (the
    int64 column is a VIEW of the uint64 hash, so sign carries no
    meaning).  The exact_dedup
    shape over an 8 B perceptual key: at 100 TB the exchange carries
    16 B/image regardless of pixel volume."""
    from ray.data.aggregate import Count, Min

    if concurrency is not None:
        hashed = ds.map_batches(ImageDHashBatch, batch_size=batch_size,
                                batch_format="pyarrow",
                                concurrency=concurrency)
    else:
        from ..util import task_udf

        def fn(batch):
            return task_udf(ImageDHashBatch)(batch)
        hashed = ds.map_batches(fn, batch_size=batch_size,
                                batch_format="pyarrow")

    agg = hashed.map_batches(
        lambda b: b.filter(pc.invert(pc.starts_with(b.column("status"),
                                                    "error"))),
        batch_format="pyarrow") \
        .groupby("dhash").aggregate(Min("item_id"), Count())

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table({
            "dhash": pc.cast(b.column("dhash"), pa.int64()),
            "item_id": pc.cast(b.column("min(item_id)"), pa.int64()),
            "n_items": pc.cast(b.column("count()"), pa.int64())})
        return t.filter(pc.greater_equal(t.column("n_items"),
                                         pa.scalar(min_group, pa.int64())))

    return agg.map_batches(finish, batch_format="pyarrow")
