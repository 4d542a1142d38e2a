"""Content-stream tokenizer: bytes -> [(operator, [operands])].

Equivalent of lopdf's `Content::decode` used at reference src/lib.rs:1582.
Operands are parsed with the shared object lexer (numbers/strings/names/
arrays/dicts); inline images (BI ... ID <binary> EI) are skipped as a unit.
"""
from __future__ import annotations

from typing import List, Tuple

from .lexer import _IS_REG, _IS_WS, Lexer, parse_number
from .objects import NULL, PdfError

Operation = Tuple[str, list]


def parse_content(data: bytes) -> List[Operation]:
    lx = Lexer(data)
    ops: List[Operation] = []
    operands: list = []
    buf, end = lx.buf, lx.end
    while True:
        # skip_ws fast path inlined (one call per token otherwise):
        # plain ws bytes loop here, %-comments defer to the regex
        pos = lx.pos
        while pos < end and _IS_WS[buf[pos]]:
            pos += 1
        if pos < end and buf[pos] == 0x25:
            lx.pos = pos
            lx.skip_ws()
            pos = lx.pos
        lx.pos = pos
        if pos >= end:
            break
        c = buf[pos]
        if c in b"/(<[":
            operands.append(lx.parse_object(allow_ref=False))
            continue
        if c in b"+-.0123456789":
            tok = lx.read_regular_token()
            try:
                operands.append(parse_number(tok))
            except PdfError:
                operands = []
            continue
        if c == 0x5D or c == 0x7B or c == 0x7D or c == 0x29 or c == 0x3E:
            # stray delimiter: skip (lenient, like lopdf's tolerant parse)
            lx.pos += 1
            continue
        tok = lx.read_regular_token()
        if not tok:
            lx.pos += 1
            continue
        if tok == b"BI":
            _skip_inline_image(lx)
            operands = []
            continue
        if tok == b"true":
            operands.append(True)
            continue
        if tok == b"false":
            operands.append(False)
            continue
        if tok == b"null":
            operands.append(NULL)
            continue
        ops.append((tok.decode("latin-1"), operands))
        operands = []
    return ops


_INLINE_NCOMP = {b"G": 1, b"DeviceGray": 1, b"RGB": 3, b"DeviceRGB": 3,
                 b"CMYK": 4, b"DeviceCMYK": 4}


def _inline_data_length(params: dict):
    """Exact byte length of UNCOMPRESSED inline-image data from the dict
    (spec 8.9.7: rows are byte-aligned); None when a filter is present or
    the geometry is incomplete — the caller then falls back to the EI
    scan."""
    if b"F" in params or b"Filter" in params:
        return None
    w = params.get(b"W", params.get(b"Width"))
    h = params.get(b"H", params.get(b"Height"))
    if not isinstance(w, int) or not isinstance(h, int) or w < 0 or h < 0:
        return None
    if params.get(b"IM", params.get(b"ImageMask")) is True:
        bpc, ncomp = 1, 1
    else:
        bpc = params.get(b"BPC", params.get(b"BitsPerComponent"))
        cs = params.get(b"CS", params.get(b"ColorSpace"))
        cs_key = bytes(cs) if isinstance(cs, (bytes, bytearray)) or \
            type(cs).__name__ == "Name" else None
        ncomp = _INLINE_NCOMP.get(cs_key)
        if not isinstance(bpc, int) or ncomp is None:
            return None
    return h * ((w * bpc * ncomp + 7) // 8)


def _skip_inline_image(lx: Lexer) -> None:
    """Skip `BI <dict entries> ID <binary data> EI`.

    The dict is parsed (not discarded): for uncompressed images the data
    length is computed exactly from W/H/BPC/CS, so binary bytes that
    happen to spell ` EI ` cannot truncate the skip; filtered images fall
    back to the delimited-EI scan."""
    params: dict = {}
    pending_key = None
    while True:
        lx.skip_ws()
        if lx.pos >= lx.end:
            return
        save = lx.pos
        if _IS_REG[lx.buf[lx.pos]]:
            tok = lx.read_regular_token()
            if tok == b"ID":
                break
            if not tok:
                lx.pos = save + 1
                continue
            # numbers / booleans arrive as regular tokens here
            val = None
            if tok == b"true":
                val = True
            elif tok == b"false":
                val = False
            else:
                try:
                    val = parse_number(tok)
                except PdfError:
                    val = None
            if pending_key is not None and val is not None:
                params[pending_key] = val
                pending_key = None
            continue
        try:
            obj = lx.parse_object(allow_ref=False)
            nm = type(obj).__name__ == "Name"
            if pending_key is None and nm:
                pending_key = bytes(obj)
            elif pending_key is not None:
                params[pending_key] = obj
                pending_key = None
        except PdfError:
            lx.pos = save + 1
    # one whitespace byte after ID, then binary data until EI
    if lx.pos < lx.end and lx.buf[lx.pos] in b"\x00\t\n\x0c\r ":
        lx.pos += 1
    start = lx.pos

    n = _inline_data_length(params)
    if n is not None and start + n <= lx.end:
        probe = Lexer(lx.buf, start + n, lx.end)
        probe.skip_ws()
        # mirror the fallback scan's delimiter check: `EI` must be
        # followed by a non-regular byte, else a token like `EIX` just
        # past the computed geometry would be consumed here but not there
        if lx.buf[probe.pos:probe.pos + 2] == b"EI" and (
                probe.pos + 2 >= lx.end or not _IS_REG[lx.buf[probe.pos + 2]]):
            lx.pos = probe.pos + 2
            return
        # geometry didn't line up with an EI: fall through to the scan
    buf, end = lx.buf, lx.end
    # prefer a whitespace-delimited EI (the normal spec shape); fall back to
    # any EI followed by a non-regular char (binary data may abut it)
    for require_ws_before in (True, False):
        pos = start
        while True:
            idx = buf.find(b"EI", pos, end)
            if idx < 0:
                break
            before_ok = (not require_ws_before) or idx == 0 \
                or buf[idx - 1] in b"\x00\t\n\x0c\r "
            after_ok = idx + 2 >= end or not _IS_REG[buf[idx + 2]]
            if before_ok and after_ok:
                lx.pos = idx + 2
                return
            pos = idx + 2
    lx.pos = end
