"""Content-stream tokenizer: bytes -> [(operator, [operands])].

Equivalent of lopdf's `Content::decode` used at reference src/lib.rs:1582.
Operands are parsed with the shared object lexer (numbers/strings/names/
arrays/dicts); inline images (BI ... ID <binary> EI) are skipped as a unit.
"""
from __future__ import annotations

from typing import List, Tuple

from .lexer import _IS_REG, Lexer, parse_number
from .objects import NULL, PdfError

Operation = Tuple[str, list]


def parse_content(data: bytes) -> List[Operation]:
    lx = Lexer(data)
    ops: List[Operation] = []
    operands: list = []
    while True:
        lx.skip_ws()
        if lx.pos >= lx.end:
            break
        c = lx.buf[lx.pos]
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


def _skip_inline_image(lx: Lexer) -> None:
    """Skip `BI <dict entries> ID <binary data> EI`."""
    # skip dict entries until ID
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
        try:
            lx.parse_object(allow_ref=False)
        except PdfError:
            lx.pos = save + 1
    # one whitespace byte after ID, then binary data until EI
    if lx.pos < lx.end and lx.buf[lx.pos] in b"\x00\t\n\x0c\r ":
        lx.pos += 1
    start = lx.pos
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
