"""Pure-stdlib media decoders for the multimodal stages.

The container ships no PIL/pyav, but PNG (zlib is stdlib), uncompressed
BMP (struct) and PCM WAV (stdlib `wave`) are decodable from first
principles — so the image/audio stages run a REAL decode for those
formats and fall back to the declared deterministic fake only for
formats that genuinely need an external codec (JPEG, MP4, ...).

Implemented from the public format specs:
- PNG: RFC 2083 / W3C PNG spec (IHDR/IDAT chunks, filters 0-4,
  8-bit gray/RGB/RGBA/gray+alpha, non-interlaced).
- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, 24/32-bit uncompressed.
- WAV: RIFF PCM via the stdlib `wave` module.
"""
from __future__ import annotations

import io
import struct
import zlib
from typing import Tuple

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
WAV_MAGIC = b"RIFF"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(payload: bytes) -> str:
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(BMP_MAGIC):
        return "bmp"
    if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def decode_png(data: bytes) -> np.ndarray:
    """-> uint8 array (h, w, channels).  8-bit, non-interlaced only."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                line[i] = (int(line[i])
                           + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(height, width, ch)


def decode_bmp(data: bytes) -> np.ndarray:
    """-> uint8 array (h, w, 3).  24/32-bit uncompressed BI_RGB only."""
    if not data.startswith(BMP_MAGIC) or len(data) < 54:
        raise ValueError("not a BMP")
    pixel_off, = struct.unpack("<I", data[10:14])
    hdr_size, = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression, = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    stride = ((width * bytes_pp + 3) // 4) * 4
    need = pixel_off + stride * height
    if len(data) < need:
        raise ValueError("truncated BMP data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height,
                         offset=pixel_off).reshape(height, stride)
    px = rows[:, :width * bytes_pp].reshape(height, width, bytes_pp)
    if flip:
        px = px[::-1]
    # BGR(A) -> RGB
    return px[:, :, 2::-1].copy()


def decode_wav(data: bytes) -> Tuple[np.ndarray, int, int]:
    """-> (samples float64 in [-1, 1] shaped (n, channels), rate, width)."""
    with wave_open(data) as w:
        n = w.getnframes()
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return arr.reshape(-1, ch), rate, sw


def wave_open(data: bytes):
    import wave
    return wave.open(io.BytesIO(data), "rb")


# -- encoders (fixture-side: deterministic test payload construction) -------


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w, c) -> PNG bytes (filter 0 scanlines)."""
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> 24-bit bottom-up BMP bytes."""
    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (stride - len(row))
    off = 54
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0)
            + bytes(body))


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float64 (n, ch) in [-1, 1] -> 16-bit PCM WAV bytes."""
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767.0)
                      .astype("<i2").tobytes())
    return buf.getvalue()
