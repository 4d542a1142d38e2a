"""PDF object lexer/parser, written from the PDF 32000-1:2008 spec §7.

Shared by the document body parser (engine/document.py), the content-stream
tokenizer (engine/content.py) and the CMap parser (engine/cmap.py).  The
reference outsourced this layer to the lopdf crate; we rebuild it
(SURVEY.md §7 step 1).
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

from .objects import NULL, Name, PdfError, PdfString, Ref, Stream, f32

# C-speed scanners for the hot paths (profiled: skip_ws/read_regular_token
# dominate parse time when done byte-by-byte in Python)
_WS_RUN = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_REG_RUN = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"
_IS_WS = bytearray(256)
for _b in WHITESPACE:
    _IS_WS[_b] = 1
_IS_DELIM = bytearray(256)
for _b in DELIMS:
    _IS_DELIM[_b] = 1
_IS_REG = bytearray(1 if not (_IS_WS[i] or _IS_DELIM[i]) else 0 for i in range(256))
_IS_WS_OR_PCT = bytearray(_IS_WS)
_IS_WS_OR_PCT[0x25] = 1  # '%' starts a comment (whitespace-equivalent)
_REF_RE = re.compile(
    rb"(\d+)[\x00\t\n\x0c\r ]+(\d+)[\x00\t\n\x0c\r ]+R"
    rb"(?![^\x00\t\n\x0c\r ()<>\[\]{}/%])")

_HEX = {}
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX[_c] = _i
for _i, _c in enumerate(b"0123456789ABCDEF"):
    _HEX[_c] = _i


class Lexer:
    """Cursor over a bytes buffer with PDF token/object parsing."""

    __slots__ = ("buf", "pos", "end")

    def __init__(self, buf: bytes, pos: int = 0, end: Optional[int] = None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    # -- low-level ---------------------------------------------------------

    def skip_ws(self) -> None:
        # fast paths (profiled ~2x): no whitespace at all, or exactly one
        # non-comment ws byte; the regex handles runs and %-comments
        pos = self.pos
        buf = self.buf
        if pos >= self.end or not _IS_WS_OR_PCT[buf[pos]]:
            return
        if buf[pos] != 0x25:
            pos += 1
            if pos >= self.end or not _IS_WS_OR_PCT[buf[pos]]:
                self.pos = pos
                return
        m = _WS_RUN.match(buf, self.pos, self.end)
        if m is not None:
            self.pos = m.end()

    def peek(self) -> int:
        return self.buf[self.pos] if self.pos < self.end else -1

    def read_regular_token(self) -> bytes:
        """Read a run of regular (non-delimiter, non-ws) characters."""
        m = _REG_RUN.match(self.buf, self.pos, self.end)
        self.pos = m.end()
        return m.group()

    def expect_keyword(self, kw: bytes) -> None:
        self.skip_ws()
        tok = self.read_regular_token()
        if tok != kw:
            raise PdfError(f"expected {kw!r}, got {tok!r} at {self.pos}")

    # -- object parsing ----------------------------------------------------

    def parse_object(self, allow_ref: bool = True):
        """Parse one object. `allow_ref=False` for content streams/CMaps
        where `R` is not a thing and bare numbers stay numbers."""
        # skip_ws inlined (profiled: this is the hottest skip_ws call
        # site; typical separators are 0-2 plain ws bytes — loop those
        # here, defer %-comments to the regex path)
        buf, pos, end = self.buf, self.pos, self.end
        while pos < end:
            c = buf[pos]
            if _IS_WS[c]:
                pos += 1
            elif c == 0x25:  # '%' comment: regex consumes run + comments
                self.pos = pos
                self.skip_ws()
                pos = self.pos
            else:
                break
        if pos >= end:
            self.pos = pos
            raise PdfError("EOF while parsing object")
        self.pos = pos
        c = buf[pos]
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x3C:  # '<'
            if pos + 1 < self.end and buf[pos + 1] == 0x3C:
                d = self._parse_dict()
                return d
            return self._parse_hex_string()
        if c == 0x5B:  # '['
            return self._parse_array(allow_ref)
        if c == 0x5D:  # ']'
            raise PdfError("unexpected ]")
        if c in b"+-.0123456789":
            return self._parse_number_or_ref(allow_ref)
        tok = self.read_regular_token()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return NULL
        raise PdfError(f"unexpected token {tok!r} at {pos}")

    def _parse_name(self) -> Name:
        m = _REG_RUN.match(self.buf, self.pos + 1, self.end)
        raw = m.group()
        self.pos = m.end()
        if b"#" not in raw:
            return Name(raw)
        out = bytearray()
        i = 0
        n = len(raw)
        while i < n:
            c = raw[i]
            if c == 0x23 and i + 2 < n:
                h1, h2 = raw[i + 1], raw[i + 2]
                if h1 in _HEX and h2 in _HEX:
                    out.append(_HEX[h1] * 16 + _HEX[h2])
                    i += 3
                    continue
            out.append(c)
            i += 1
        return Name(bytes(out))

    def _parse_literal_string(self) -> PdfString:
        buf, end = self.buf, self.end
        pos = self.pos + 1  # skip '('
        out = bytearray()
        depth = 1
        while pos < end:
            c = buf[pos]
            if c == 0x5C:  # backslash
                pos += 1
                if pos >= end:
                    break
                e = buf[pos]
                if e == 0x6E:
                    out.append(0x0A)
                elif e == 0x72:
                    out.append(0x0D)
                elif e == 0x74:
                    out.append(0x09)
                elif e == 0x62:
                    out.append(0x08)
                elif e == 0x66:
                    out.append(0x0C)
                elif e in b"01234567":  # octal, up to 3 digits
                    val = e - 0x30
                    n = 1
                    while n < 3 and pos + 1 < end and buf[pos + 1] in b"01234567":
                        pos += 1
                        val = val * 8 + (buf[pos] - 0x30)
                        n += 1
                    out.append(val & 0xFF)
                elif e == 0x0D:  # line continuation \<CR>[<LF>]
                    if pos + 1 < end and buf[pos + 1] == 0x0A:
                        pos += 1
                elif e == 0x0A:
                    pass
                else:  # \( \) \\ and any other char -> itself
                    out.append(e)
                pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    self.pos = pos
                    return PdfString(bytes(out))
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        raise PdfError("unterminated literal string")

    def _parse_hex_string(self) -> PdfString:
        buf, end = self.buf, self.end
        pos = self.pos + 1  # skip '<'
        # fast path (profiled ~4x): clean even-length hex (possibly with
        # whitespace BETWEEN byte pairs — fromhex skips exactly the same
        # separators the loop does) in one C call; anything fromhex
        # rejects (odd nibble count, junk bytes, ws splitting a pair)
        # falls through to the quirk-preserving byte loop
        j = buf.find(b">", pos, end)
        if j >= 0:
            try:
                s = bytes.fromhex(buf[pos:j].decode("ascii"))
                self.pos = j + 1
                return PdfString(s)
            except (ValueError, UnicodeDecodeError):
                pass
        out = bytearray()
        hi = None
        while pos < end:
            c = buf[pos]
            if c == 0x3E:  # '>'
                pos += 1
                if hi is not None:
                    out.append(hi * 16)
                self.pos = pos
                return PdfString(bytes(out))
            v = _HEX.get(c)
            if v is not None:
                if hi is None:
                    hi = v
                else:
                    out.append(hi * 16 + v)
                    hi = None
            pos += 1
        raise PdfError("unterminated hex string")

    def _parse_array(self, allow_ref: bool) -> list:
        # ws fast path inlined (same shape as parse_object's)
        buf, end = self.buf, self.end
        pos = self.pos + 1  # skip '['
        out = []
        append = out.append
        parse = self.parse_object
        while True:
            while pos < end and _IS_WS[buf[pos]]:
                pos += 1
            if pos < end and buf[pos] == 0x25:
                self.pos = pos
                self.skip_ws()
                pos = self.pos
                continue
            if pos >= end:
                raise PdfError("unterminated array")
            if buf[pos] == 0x5D:
                self.pos = pos + 1
                return out
            self.pos = pos
            append(parse(allow_ref))
            pos = self.pos

    def _parse_dict(self) -> dict:
        buf, end = self.buf, self.end
        pos = self.pos + 2  # skip '<<'
        out = {}
        parse = self.parse_object
        while True:
            while pos < end and _IS_WS[buf[pos]]:
                pos += 1
            if pos < end and buf[pos] == 0x25:
                self.pos = pos
                self.skip_ws()
                pos = self.pos
                continue
            if pos + 1 < end and buf[pos] == 0x3E and buf[pos + 1] == 0x3E:
                self.pos = pos + 2
                return out
            if pos >= end:
                raise PdfError("unterminated dict")
            self.pos = pos
            if buf[pos] == 0x2F:  # keys are names: skip the dispatch
                key = self._parse_name()
            else:
                key = parse()
                if not isinstance(key, Name):
                    raise PdfError(f"dict key not a name: {key!r}")
            val = parse()
            out[bytes(key)] = val
            pos = self.pos

    def _parse_number_or_ref(self, allow_ref: bool):
        buf, end = self.buf, self.end
        if allow_ref:
            # one-shot `N G R` match (the dominant case in dicts); the
            # byte-loop fallback below also covers %-comments between
            # the three tokens
            m = _REF_RE.match(buf, self.pos, end)
            if m is not None:
                self.pos = m.end()
                return Ref(int(m.group(1)), int(m.group(2)))
        m = _REG_RUN.match(buf, self.pos, end)
        tok = m.group()
        self.pos = m.end()
        num = parse_number(tok)
        if allow_ref and type(num) is int and num >= 0:
            # `N G R` lookahead in pure byte loops (profiled: the old
            # token-by-token fallback cost 2 skip_ws + 2 regex token
            # reads per bare integer in arrays — widths arrays are full
            # of them; this scan fails after a handful of byte compares)
            p = self.pos
            while True:
                while p < end and _IS_WS[buf[p]]:
                    p += 1
                if p < end and buf[p] == 0x25:  # %-comment to EOL
                    while p < end and buf[p] != 0x0D and buf[p] != 0x0A:
                        p += 1
                    continue
                break
            q = p
            while q < end and 0x30 <= buf[q] <= 0x39:
                q += 1
            if q > p and (q >= end or not _IS_REG[buf[q]]):
                r = q
                while True:
                    while r < end and _IS_WS[buf[r]]:
                        r += 1
                    if r < end and buf[r] == 0x25:
                        while r < end and buf[r] != 0x0D and buf[r] != 0x0A:
                            r += 1
                        continue
                    break
                if r < end and buf[r] == 0x52 and (
                        r + 1 >= end or not _IS_REG[buf[r + 1]]):
                    self.pos = r + 1
                    return Ref(num, int(buf[p:q]))
        return num


def parse_number(tok: bytes):
    """Integer -> int; real -> float rounded through f32 (lopdf parity)."""
    if not tok:
        raise PdfError("empty number token")
    if b"." in tok:
        # real fast path: skip the int() attempt (exception churn — reals
        # dominate content-stream operands)
        try:
            return f32(float(tok))
        except ValueError:
            raise PdfError(f"bad number {tok!r}") from None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return f32(float(tok))
    except ValueError:
        raise PdfError(f"bad number {tok!r}") from None


def parse_indirect_object(lx: Lexer, doc=None) -> Tuple[Tuple[int, int], object]:
    """Parse `num gen obj ... endobj` at the lexer position.

    Returns ((num, gen), object).  If the object is a stream, its /Length is
    resolved through `doc` when indirect; a missing/bogus Length falls back
    to scanning for `endstream`.
    """
    lx.skip_ws()
    num_tok = lx.read_regular_token()
    lx.skip_ws()
    gen_tok = lx.read_regular_token()
    lx.expect_keyword(b"obj")
    if not num_tok.isdigit() or not gen_tok.isdigit():
        raise PdfError(f"bad object header {num_tok!r} {gen_tok!r}")
    obj = lx.parse_object()
    lx.skip_ws()
    save = lx.pos
    kw = lx.read_regular_token()
    if kw == b"stream":
        if not isinstance(obj, dict):
            raise PdfError("stream without dict")
        # EOL after `stream`: CRLF or LF
        if lx.peek() == 0x0D:
            lx.pos += 1
        if lx.peek() == 0x0A:
            lx.pos += 1
        start = lx.pos
        length = obj.get(b"Length")
        data = None
        if isinstance(length, Ref) and doc is not None:
            try:
                length = doc.get_object(length)
            except Exception:
                length = None
        if isinstance(length, int) and 0 <= length <= lx.end - start:
            candidate = lx.buf[start:start + length]
            # validate that `endstream` actually follows
            probe = Lexer(lx.buf, start + length, lx.end)
            probe.skip_ws()
            if probe.buf[probe.pos:probe.pos + 9] == b"endstream":
                data = candidate
                lx.pos = probe.pos + 9
        if data is None:  # scan for endstream
            idx = lx.buf.find(b"endstream", start, lx.end)
            if idx < 0:
                raise PdfError("unterminated stream")
            raw_end = idx
            # strip the single EOL that precedes endstream, if present
            if raw_end > start and lx.buf[raw_end - 1] == 0x0A:
                raw_end -= 1
                if raw_end > start and lx.buf[raw_end - 1] == 0x0D:
                    raw_end -= 1
            elif raw_end > start and lx.buf[raw_end - 1] == 0x0D:
                raw_end -= 1
            data = lx.buf[start:raw_end]
            lx.pos = idx + 9
        obj = Stream(obj, bytes(data))
        lx.skip_ws()
        save = lx.pos
        kw = lx.read_regular_token()
    if kw != b"endobj":
        # tolerate missing endobj; rewind so caller sees following bytes
        lx.pos = save
    return (int(num_tok), int(gen_tok)), obj
