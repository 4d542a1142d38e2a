"""PDF Function objects (reference src/lib.rs:1119-1231).

The reference constructs Functions only as Separation-colorspace tint
transforms and never evaluates them for text extraction (Type0.eval is a
stub upstream too) — what matters for parity is the CONSTRUCTION failure
modes: required keys and types raise exactly where the reference panics.
Evaluation is provided for Type2 (exponential) and Type0 (sampled,
nearest-sample) as a usable extra.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from .objects import (PdfError, Stream, get_num_array, maybe_deref,
                      maybe_get_obj)


@dataclass
class Type0Func:
    domain: List[float]
    range: List[float]
    contents: bytes
    size: List[int]
    bits_per_sample: int
    encode: List[float]
    decode: List[float]

    def eval(self, inputs: List[float]) -> List[float]:
        """Nearest-sample evaluation (the reference's eval is a stub; this
        is a best-effort extra, 8/16-bit samples only)."""
        n_in = len(self.domain) // 2
        n_out = len(self.range) // 2
        idx = 0
        stride = 1
        for i in range(n_in):
            d0, d1 = self.domain[2 * i], self.domain[2 * i + 1]
            e0, e1 = self.encode[2 * i], self.encode[2 * i + 1]
            x = min(max(inputs[i] if i < len(inputs) else d0, d0), d1)
            t = (x - d0) / (d1 - d0) if d1 != d0 else 0.0
            e = e0 + t * (e1 - e0)
            j = min(max(int(round(e)), 0), self.size[i] - 1)
            idx += j * stride
            stride *= self.size[i]
        out = []
        bps = self.bits_per_sample
        if bps not in (8, 16):
            return [self.range[2 * i] for i in range(n_out)]
        bytes_per = bps // 8
        maxv = float((1 << bps) - 1)
        for o in range(n_out):
            off = (idx * n_out + o) * bytes_per
            if off + bytes_per > len(self.contents):
                out.append(self.range[2 * o])
                continue
            v = int.from_bytes(self.contents[off:off + bytes_per], "big") / maxv
            d0, d1 = self.decode[2 * o], self.decode[2 * o + 1]
            out.append(d0 + v * (d1 - d0))
        return out


@dataclass
class Type2Func:
    c0: Optional[List[float]]
    c1: Optional[List[float]]
    n: float

    def eval(self, inputs: List[float]) -> List[float]:
        x = inputs[0] if inputs else 0.0
        c0 = self.c0 if self.c0 is not None else [0.0]
        c1 = self.c1 if self.c1 is not None else [1.0]
        return [a + (x ** self.n) * (b - a) for a, b in zip(c0, c1)]


@dataclass
class Type3Func:
    pass


@dataclass
class Type4Func:
    contents: bytes


def make_function(doc, obj):
    """Function::new parity: dispatch on FunctionType with the reference's
    required-key failure modes (src/lib.rs:1168-1230)."""
    obj = maybe_deref(doc, obj)
    if isinstance(obj, Stream):
        d = obj.dict
    elif isinstance(obj, dict):
        d = obj
    else:
        raise PdfError("function must be dict or stream")
    ft = maybe_get_obj(doc, d, b"FunctionType")
    if isinstance(ft, bool) or not isinstance(ft, int):
        raise PdfError("missing FunctionType")
    if ft == 0:
        if not isinstance(obj, Stream):
            raise PdfError("type 0 functions must be streams")
        rng = get_num_array(doc, d, b"Range")
        domain = get_num_array(doc, d, b"Domain")
        if rng is None or domain is None:
            raise PdfError("Range/Domain required")
        size_o = maybe_get_obj(doc, d, b"Size")
        if not isinstance(size_o, list):
            raise PdfError("Size required")
        size = []
        for x in size_o:
            x = maybe_deref(doc, x)
            if isinstance(x, bool) or not isinstance(x, int):
                raise PdfError("bad Size entry")
            size.append(x)
        bps = maybe_get_obj(doc, d, b"BitsPerSample")
        if isinstance(bps, bool) or not isinstance(bps, int):
            raise PdfError("BitsPerSample required")
        encode = get_num_array(doc, d, b"Encode")
        if encode is None:
            encode = []
            for s in size:
                encode.extend([0.0, float(s - 1)])
        decode = get_num_array(doc, d, b"Decode")
        if decode is None:
            decode = list(rng)
        from .document import _contents_bytes
        return Type0Func(domain=domain, range=rng,
                         contents=_contents_bytes(obj, doc), size=size,
                         bits_per_sample=bps, encode=encode, decode=decode)
    if ft == 2:
        c0 = get_num_array(doc, d, b"C0")
        c1 = get_num_array(doc, d, b"C1")
        n = maybe_get_obj(doc, d, b"N")
        if isinstance(n, bool) or not isinstance(n, (int, float)):
            raise PdfError("N required")
        return Type2Func(c0=c0, c1=c1, n=float(n))
    if ft == 3:
        return Type3Func()
    if ft == 4:
        if not isinstance(obj, Stream):
            raise PdfError("type 4 functions should be streams")
        from .document import _contents_bytes
        return Type4Func(contents=_contents_bytes(obj, doc))
    raise PdfError(f"unhandled function type {ft}")
