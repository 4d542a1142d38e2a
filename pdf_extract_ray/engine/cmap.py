"""Adobe CMap parsing (ToUnicode + CID byte mapping).

Python equivalent of the adobe-cmap-parser crate the reference uses at
src/lib.rs:929 (`get_unicode_map`) and src/lib.rs:992 (`get_byte_mapping`),
written from Adobe Tech Note #5014 (CMap spec).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from .lexer import Lexer, _IS_REG, parse_number
from .objects import Name, PdfError, PdfString


@dataclass
class CodeRange:
    width: int
    start: int
    end: int


@dataclass
class CIDRange:
    src_code_lo: int
    src_code_hi: int
    dst_cid_lo: int


@dataclass
class ByteMapping:
    codespace: List[CodeRange] = field(default_factory=list)
    cid: List[CIDRange] = field(default_factory=list)


def _tokens(data: bytes):
    """Yield CMap tokens: parsed objects or operator byte-strings."""
    lx = Lexer(data)
    while True:
        lx.skip_ws()
        if lx.pos >= lx.end:
            return
        c = lx.buf[lx.pos]
        if c in b"/(<[":
            try:
                yield lx.parse_object(allow_ref=False)
            except PdfError:
                lx.pos += 1
            continue
        if c in b"+-.0123456789":
            tok = lx.read_regular_token()
            try:
                yield parse_number(tok)
            except PdfError:
                pass
            continue
        if not _IS_REG[c]:
            lx.pos += 1
            continue
        tok = lx.read_regular_token()
        if tok:
            yield tok
        else:
            lx.pos += 1


def _code_of(b: bytes) -> int:
    return int.from_bytes(b, "big") if b else 0


def get_unicode_map_raw(data: bytes) -> Dict[int, bytes]:
    """src char code -> destination bytes (UTF-16BE), from bfchar/bfrange."""
    out: Dict[int, bytes] = {}
    toks = list(_tokens(data))
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if t == b"beginbfchar":
            i += 1
            while i < n and toks[i] != b"endbfchar":
                src = toks[i]
                dst = toks[i + 1] if i + 1 < n else None
                if isinstance(src, PdfString) and isinstance(dst, PdfString):
                    out[_code_of(src)] = bytes(dst)
                    i += 2
                else:
                    i += 1
        elif t == b"beginbfrange":
            i += 1
            while i < n and toks[i] != b"endbfrange":
                lo = toks[i]
                hi = toks[i + 1] if i + 1 < n else None
                dst = toks[i + 2] if i + 2 < n else None
                if isinstance(lo, PdfString) and isinstance(hi, PdfString):
                    lo_c, hi_c = _code_of(lo), _code_of(hi)
                    if isinstance(dst, PdfString):
                        base = _code_of(dst)
                        w = len(dst)
                        for k in range(hi_c - lo_c + 1):
                            out[lo_c + k] = (base + k).to_bytes(max(w, 1), "big")
                    elif isinstance(dst, list):
                        for k, d in enumerate(dst):
                            if isinstance(d, PdfString) and lo_c + k <= hi_c:
                                out[lo_c + k] = bytes(d)
                    i += 3
                else:
                    i += 1
        i += 1
    return out


def get_byte_mapping(data: bytes) -> ByteMapping:
    """codespacerange + cidrange/cidchar -> ByteMapping
    (adobe-cmap-parser `get_byte_mapping` equivalent)."""
    bm = ByteMapping()
    toks = list(_tokens(data))
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if t == b"begincodespacerange":
            i += 1
            while i < n and toks[i] != b"endcodespacerange":
                lo = toks[i]
                hi = toks[i + 1] if i + 1 < n else None
                if isinstance(lo, PdfString) and isinstance(hi, PdfString):
                    bm.codespace.append(CodeRange(width=len(lo), start=_code_of(lo), end=_code_of(hi)))
                    i += 2
                else:
                    i += 1
        elif t == b"begincidrange":
            i += 1
            while i < n and toks[i] != b"endcidrange":
                lo = toks[i]
                hi = toks[i + 1] if i + 1 < n else None
                dst = toks[i + 2] if i + 2 < n else None
                if isinstance(lo, PdfString) and isinstance(hi, PdfString) and isinstance(dst, int):
                    bm.cid.append(CIDRange(_code_of(lo), _code_of(hi), dst))
                    i += 3
                else:
                    i += 1
        elif t == b"begincidchar":
            i += 1
            while i < n and toks[i] != b"endcidchar":
                src = toks[i]
                dst = toks[i + 1] if i + 1 < n else None
                if isinstance(src, PdfString) and isinstance(dst, int):
                    c = _code_of(src)
                    bm.cid.append(CIDRange(c, c, dst))
                    i += 2
                else:
                    i += 1
        i += 1
    if not bm.codespace:
        raise PdfError("CMap has no codespace ranges")
    return bm
