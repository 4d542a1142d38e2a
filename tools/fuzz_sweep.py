#!/usr/bin/env python
"""Extended engine fuzz sweep: every pdfgen generator, random byte
mutations + truncations + cross-document splices, through all three
public extraction surfaces, with a per-input SIGALRM watchdog.

The engine must never hang or hard-crash on corrupt input (the pipeline
UDF totalizes exceptions to error rows, but a hang stalls a whole
partition at crawl scale).  Round-3 baseline: ~20k inputs / 7 min,
0 hangs, 0 hard crashes.  Failing inputs are saved under /tmp for
regression-fixture promotion (see tests/test_adversarial_fixtures.py
TestCorruptXref for two real infinite loops found this way).

Usage: python tools/fuzz_sweep.py [seconds=420] [seed=20260817]
"""
import os
import random
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pdf_extract_ray.data.pdfgen as g
from pdf_extract_ray.engine import extract_text_from_mem
from pdf_extract_ray.engine.api import (extract_text_from_mem_by_pages,
                                        get_metadata)


class Hang(Exception):
    pass


def main() -> int:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 420
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817

    gens = []
    for name in dir(g):
        if name.startswith("pdf_"):
            try:
                gens.append((name, getattr(g, name)()))
            except TypeError:
                pass
    print(f"generators: {len(gens)}")

    signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(Hang()))
    rng = random.Random(seed)
    hangs = crashes = n = 0
    t_start = time.time()
    surfaces = [extract_text_from_mem, extract_text_from_mem_by_pages,
                get_metadata]
    while time.time() - t_start < budget:
        name, base = gens[rng.randrange(len(gens))]
        buf = bytearray(base)
        mode = rng.random()
        if mode < 0.5:  # byte mutations
            for _ in range(rng.randint(1, 16)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
        elif mode < 0.75:  # truncation
            buf = buf[:rng.randrange(len(buf))]
        else:  # splice a chunk from another generator's doc
            _, other = gens[rng.randrange(len(gens))]
            a, b = sorted((rng.randrange(len(buf)), rng.randrange(len(buf))))
            o = rng.randrange(max(1, len(other) - (b - a) or 1))
            buf[a:b] = other[o:o + (b - a)]
        data = bytes(buf)
        fn = surfaces[rng.randrange(3)]
        n += 1
        try:
            signal.alarm(8)
            fn(data)
        except Hang:
            hangs += 1
            path = f"/tmp/fuzz_hang_{hangs}.bin"
            with open(path, "wb") as f:
                f.write(data)
            print(f"HANG {name} via {fn.__name__} -> {path}")
        except (RecursionError, MemoryError) as e:
            crashes += 1
            path = f"/tmp/fuzz_crash_{crashes}.bin"
            with open(path, "wb") as f:
                f.write(data)
            print(f"{type(e).__name__} {name} via {fn.__name__} -> {path}")
        except Exception:
            pass  # orderly failure: exactly what the pipeline totalizes
        finally:
            signal.alarm(0)
    print(f"done: {n} inputs, hangs={hangs}, hard-crashes={crashes}")
    return 1 if (hangs or crashes) else 0


if __name__ == "__main__":
    sys.exit(main())
