#!/usr/bin/env python
"""Media-codec fuzz sweep: baseline + progressive JPEG, PNG, BMP, WAV,
MJPEG-AVI and MP4 parsers under random byte mutations, truncations and
cross-format splices, with a per-input SIGALRM watchdog.

Contract: every decoder either returns a decoded object or raises
ValueError — never hangs, never leaks IndexError/KeyError/struct.error
(the multimodal stages' declared-fake fallback catches exactly
ValueError; anything else turns a damaged row into status='error').

Usage: python tools/media_fuzz.py [seconds=180] [seed=20260820]
"""
import os
import random
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pdf_extract_ray.ops.codecs import (build_mp4, decode_bmp,
                                        decode_jpeg, decode_png,
                                        decode_wav, encode_avi_mjpeg,
                                        encode_bmp, encode_jpeg,
                                        encode_jpeg_progressive,
                                        encode_png, encode_png_palette,
                                        encode_wav, parse_avi_mjpeg,
                                        parse_mp4_samples)


class Hang(Exception):
    pass


def main() -> int:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260820
    rng = random.Random(seed)
    nprng = np.random.RandomState(seed & 0x7FFFFFFF)

    yy, xx = np.mgrid[0:24, 0:16]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)[:, :, None] \
        .repeat(3, axis=2)
    gray = img[:, :, :1]
    samples = (nprng.randint(-3000, 3000, (400, 2))).astype(np.int16)
    corpus = [
        ("jpeg", encode_jpeg(img, restart_interval=2), decode_jpeg),
        ("jpeg_sub", encode_jpeg(img, subsample=True), decode_jpeg),
        ("pjpeg", encode_jpeg_progressive(img), decode_jpeg),
        ("pjpeg_sa", encode_jpeg_progressive(img, successive=True),
         decode_jpeg),
        ("pjpeg_gray", encode_jpeg_progressive(gray, successive=True),
         decode_jpeg),
        ("png", encode_png(img), decode_png),
        ("png_adam7", encode_png(img, interlace=True), decode_png),
        ("png_pal", encode_png_palette(
            (img[:, :, 0] % 16), nprng.randint(
                0, 256, (16, 3)).astype(np.uint8),
            trns=bytes(range(8))), decode_png),
        ("bmp", encode_bmp(img), decode_bmp),
        ("wav", encode_wav(samples, 16000), decode_wav),
        ("avi", encode_avi_mjpeg([img, img]), parse_avi_mjpeg),
        ("mp4", build_mp4([bytes([i]) * 50 for i in range(12)]),
         parse_mp4_samples),
    ]
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(Hang()))
    hangs = crashes = n = 0
    t0 = time.time()
    while time.time() - t0 < budget:
        name, base, dec = corpus[rng.randrange(len(corpus))]
        buf = bytearray(base)
        mode = rng.random()
        if mode < 0.45:
            for _ in range(rng.randint(1, 8)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        elif mode < 0.75:
            buf = buf[:rng.randint(2, len(buf))]
        else:  # splice a window from another format's bytes
            other = corpus[rng.randrange(len(corpus))][1]
            k = rng.randint(1, min(64, len(other)))
            src = rng.randint(0, len(other) - k)
            dst = rng.randint(0, max(1, len(buf) - k))
            buf[dst:dst + k] = other[src:src + k]
        data = bytes(buf)
        n += 1
        signal.alarm(8)
        try:
            dec(data)
        except ValueError:
            pass
        except Hang:
            hangs += 1
            print(f"HANG {name} len={len(data)}")
        except Exception as e:
            crashes += 1
            print(f"CRASH {name}: {type(e).__name__}: {e}")
        finally:
            signal.alarm(0)
    print(f"inputs={n} hangs={hangs} crashes={crashes} "
          f"wall={time.time()-t0:.0f}s")
    return 1 if hangs or crashes else 0


if __name__ == "__main__":
    sys.exit(main())
