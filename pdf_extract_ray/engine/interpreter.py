"""Content-stream interpreter: the Tm/Td/TJ text-positioning state machine.

Reproduces the reference's `Processor::process_stream` op dispatch
(/root/reference/src/lib.rs:1581-1876) and `show_text`
(src/lib.rs:1276-1327) with float64 math in the same operation order as
euclid's Transform2D (row-major, row-vector convention), so positions are
bit-identical.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Tuple

from .content import parse_content
from .fonts import PdfFont, make_font
from .objects import (Name, PdfError, PdfString, Stream, as_num,
                      maybe_get_obj, require_dict)

log = logging.getLogger(__name__)

NAN = float("nan")

# Transform = (m11, m12, m21, m22, m31, m32), row-major; point maps as
# (x, y) -> (x*m11 + y*m21 + m31, x*m12 + y*m22 + m32), like euclid.
Transform = Tuple[float, float, float, float, float, float]

IDENTITY: Transform = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def mul(a: Transform, b: Transform) -> Transform:
    """Apply `a` then `b` (euclid `a.post_transform(&b)`), with euclid's
    exact product/sum ordering for float parity."""
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


def translation(tx: float, ty: float) -> Transform:
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


def transform_vector(m: Transform, vx: float, vy: float) -> Tuple[float, float]:
    return (vx * m[0] + vy * m[2], vx * m[1] + vy * m[3])


class TextState:
    __slots__ = ("font", "font_size", "character_spacing", "word_spacing",
                 "horizontal_scaling", "leading", "rise", "tm")

    def __init__(self):
        self.font: Optional[PdfFont] = None
        self.font_size = NAN
        self.character_spacing = 0.0
        self.word_spacing = 0.0
        self.horizontal_scaling = 1.0
        self.leading = 0.0
        self.rise = 0.0
        self.tm: Transform = IDENTITY

    def clone(self) -> "TextState":
        c = TextState.__new__(TextState)
        for s in TextState.__slots__:
            setattr(c, s, getattr(self, s))
        return c


class GraphicsState:
    __slots__ = ("ctm", "ts", "smask", "fill_colorspace", "fill_color",
                 "stroke_colorspace", "stroke_color", "line_width")

    def __init__(self):
        self.ctm: Transform = IDENTITY
        self.ts = TextState()
        self.smask = None
        self.fill_colorspace = "DeviceGray"
        self.fill_color: List[float] = []
        self.stroke_colorspace = "DeviceGray"
        self.stroke_color: List[float] = []
        self.line_width = 1.0

    def clone(self) -> "GraphicsState":
        c = GraphicsState.__new__(GraphicsState)
        c.ctm = self.ctm
        c.ts = self.ts.clone()
        c.smask = self.smask
        c.fill_colorspace = self.fill_colorspace
        c.fill_color = list(self.fill_color)
        c.stroke_colorspace = self.stroke_colorspace
        c.stroke_color = list(self.stroke_color)
        c.line_width = self.line_width
        return c


def show_text(gs: GraphicsState, s: bytes, output) -> None:
    """Per-glyph event emission + tm advance (src/lib.rs:1276-1327).

    The generic products are specialized inline (tsm has the fixed shape
    (h,0,0,1,0,rise), the advance is a pure translation): same float ops
    in the same order as `mul`, minus the zero terms — a zero product
    term only ever changes the sign of a zero, which no downstream
    comparison can observe.
    """
    ts = gs.ts
    font = ts.font
    if font is None:
        raise PdfError("show text with no font set")
    output.begin_word()
    c0, c1, c2, c3, c4, c5 = gs.ctm
    get_width = font.get_width
    decode_char = font.decode_char
    out_char = output.output_character
    # loop invariants: inside one Tj only the tm TRANSLATION row (t4,t5)
    # changes, and no operator can touch the text state mid-string — so
    # the linear part of m = tm * ctm, the tsm scale factors, spacings
    # and font size hoist out of the per-glyph loop.  Every product is
    # the same operands in the same order as the per-glyph computation,
    # so the emitted floats are bit-identical.
    h = ts.horizontal_scaling
    rise = ts.rise
    t0, t1, t2, t3, t4, t5 = ts.tm
    m0 = t0 * c0 + t1 * c2
    m1 = t0 * c1 + t1 * c3
    m2 = t2 * c0 + t3 * c2
    m3 = t2 * c1 + t3 * c3
    hm0 = h * m0
    hm1 = h * m1
    r4 = rise * m2
    r5 = rise * m3
    char_spacing = ts.character_spacing
    word_extra = char_spacing + ts.word_spacing
    font_size = ts.font_size
    for code, length in font.char_codes(s):
        m4 = t4 * c0 + t5 * c2 + c4
        m5 = t4 * c1 + t5 * c3 + c5
        # trm = tsm * (tm * ctm) with tsm = (h, 0, 0, 1, 0, rise)
        trm = (hm0, hm1, m2, m3, r4 + m4, r5 + m5)
        w0 = get_width(code) / 1000.0
        # word spacing only for single-byte code 32 (src/lib.rs:1307-1312)
        spacing = word_extra if (code == 32 and length == 1) \
            else char_spacing
        out_char(trm, w0, spacing, font_size, decode_char(code))
        # (w0 - 0.0/1000.0) == w0 bit-exactly for every float (incl.
        # -0.0 and NaN), so the reference's ws.0 term drops out
        tx = h * (w0 * font_size + spacing)
        # tm = T(tx, 0) * tm: only the translation row changes
        t4 = tx * t0 + t4
        t5 = tx * t1 + t5
    ts.tm = (t0, t1, t2, t3, t4, t5)
    output.end_word()


def apply_state(doc, gs: GraphicsState, state: dict) -> None:
    """ExtGState application: SMask only (src/lib.rs:1337-1364)."""
    from .objects import maybe_deref
    for k, v in state.items():
        if k == b"SMask":
            v = maybe_deref(doc, v)
            if isinstance(v, Name):
                if bytes(v) == b"None":
                    gs.smask = None
                else:
                    raise PdfError("unexpected smask name")
            elif isinstance(v, dict):
                gs.smask = v
            else:
                raise PdfError(f"unexpected smask type {v!r}")
        elif k == b"Type":
            if not (isinstance(v, Name) and bytes(v) == b"ExtGState"):
                raise PdfError("unexpected type")
        # everything else: logged-and-ignored in the reference


def make_colorspace(doc, name: bytes, resources: dict) -> str:
    """Colorspace resolution (src/lib.rs:1449-1569).  Only the Pattern-ness
    matters downstream (SC/SCN drop components for Pattern); we resolve to a
    string tag but keep the reference's failure modes for unknown spaces."""
    if name in (b"DeviceGray", b"DeviceRGB", b"DeviceCMYK", b"Pattern"):
        return name.decode()
    colorspaces = require_dict(doc, resources, b"ColorSpace")
    cs = maybe_get_obj(doc, colorspaces, name)
    if cs is None:
        raise PdfError(f"missing colorspace {name!r}")
    if isinstance(cs, list):
        first = cs[0]
        if not isinstance(first, Name):
            raise PdfError("first arg must be a name")
        cs_name = bytes(first).decode("latin-1")
        if cs_name == "Separation":
            # validate like the reference (src/lib.rs:1461-1514): name,
            # alternate space, tint-transform Function construction
            from .objects import maybe_deref as _deref
            if not isinstance(cs[1], Name):
                raise PdfError("second arg must be a name")
            alt = _deref(doc, cs[2])
            if isinstance(alt, Name):
                if bytes(alt) not in (b"DeviceGray", b"DeviceRGB", b"DeviceCMYK"):
                    raise PdfError("unexpected color space name")
            elif isinstance(alt, list):
                a0 = alt[0]
                if not isinstance(a0, Name):
                    raise PdfError("first arg must be a name")
                if bytes(a0) not in (b"ICCBased", b"CalGray", b"CalRGB", b"Lab"):
                    raise PdfError("Unexpected color space name")
            else:
                raise PdfError("Alternate space should be name or array")
            from .functions import make_function
            make_function(doc, cs[3])  # constructed for parity of failures
            return cs_name
        if cs_name in ("ICCBased", "CalGray", "CalRGB", "Lab",
                       "Pattern", "DeviceGray", "DeviceRGB", "DeviceCMYK", "DeviceN"):
            return cs_name
        raise PdfError(f"color_space {name!r} {cs_name!r}")
    if isinstance(cs, Name):
        csn = bytes(cs)
        if csn in (b"DeviceRGB", b"DeviceGray"):
            return csn.decode()
        raise PdfError(f"unexpected colorspace name {csn!r}")
    raise PdfError("bad colorspace object")


class Processor:
    """Per-document interpreter state: font cache keyed by resource name
    (shared across pages AND across differing Resources dicts, exactly like
    the reference's Processor.font_table, src/lib.rs:1571-1579)."""

    # `Do` recursion bound: the reference recurses unboundedly (a
    # self-referencing Form XObject would overflow its stack); our UDF
    # must totalize instead of crashing, so cap the nesting depth.
    MAX_DO_DEPTH = 64

    def __init__(self):
        self.font_table = {}
        self._depth = 0

    def process_stream(self, doc, content: bytes, resources: dict,
                       media_box, output, page_num: int) -> None:
        if self._depth >= self.MAX_DO_DEPTH:
            raise PdfError("XObject recursion too deep")
        self._depth += 1
        try:
            self._process_stream_inner(doc, content, resources, media_box,
                                       output, page_num)
        finally:
            self._depth -= 1

    def _process_stream_inner(self, doc, content: bytes, resources: dict,
                              media_box, output, page_num: int) -> None:
        operations = parse_content(content)
        gs = GraphicsState()
        gs_stack: List[GraphicsState] = []
        mc_depth = 0
        tlm: Transform = IDENTITY
        path: List[tuple] = []

        for op, operands in operations:
            if op == "TJ":
                arr = operands[0] if operands else None
                if isinstance(arr, list):
                    ts = gs.ts
                    for e in arr:
                        if isinstance(e, PdfString):
                            show_text(gs, bytes(e), output)
                        elif isinstance(e, bool):
                            pass
                        elif isinstance(e, (int, float)):
                            tj = float(e)
                            tx = ts.horizontal_scaling * ((0.0 - tj / 1000.0) * ts.font_size)
                            ts.tm = mul(translation(tx, 0.0), ts.tm)
            elif op == "Tj":
                o = operands[0]
                if not isinstance(o, PdfString):
                    raise PdfError(f"unexpected Tj operand {o!r}")
                show_text(gs, bytes(o), output)
            elif op == "Td":
                if len(operands) != 2:
                    raise PdfError("Td needs 2 operands")
                tlm = mul(translation(as_num(operands[0]), as_num(operands[1])), tlm)
                gs.ts.tm = tlm
                output.end_line()
            elif op == "TD":
                if len(operands) != 2:
                    raise PdfError("TD needs 2 operands")
                tx, ty = as_num(operands[0]), as_num(operands[1])
                gs.ts.leading = -ty
                tlm = mul(translation(tx, ty), tlm)
                gs.ts.tm = tlm
                output.end_line()
            elif op == "T*":
                tlm = mul(translation(0.0, -gs.ts.leading), tlm)
                gs.ts.tm = tlm
                output.end_line()
            elif op == "Tm":
                if len(operands) != 6:
                    raise PdfError("Tm needs 6 operands")
                tlm = (as_num(operands[0]), as_num(operands[1]),
                       as_num(operands[2]), as_num(operands[3]),
                       as_num(operands[4]), as_num(operands[5]))
                gs.ts.tm = tlm
                output.end_line()
            elif op == "BT" or op == "ET":
                tlm = IDENTITY
                gs.ts.tm = tlm
            elif op == "cm":
                if len(operands) != 6:
                    raise PdfError("cm needs 6 operands")
                m = (as_num(operands[0]), as_num(operands[1]),
                     as_num(operands[2]), as_num(operands[3]),
                     as_num(operands[4]), as_num(operands[5]))
                gs.ctm = mul(m, gs.ctm)
            elif op == "Tf":
                fonts = require_dict(doc, resources, b"Font")
                name = operands[0]
                if not isinstance(name, Name):
                    raise PdfError("Tf operand not a name")
                key = bytes(name)
                font = self.font_table.get(key)
                if font is None:
                    font = make_font(doc, require_dict(doc, fonts, key))
                    self.font_table[key] = font
                gs.ts.font = font
                gs.ts.font_size = as_num(operands[1])
            elif op == "Tc":
                gs.ts.character_spacing = as_num(operands[0])
            elif op == "Tw":
                gs.ts.word_spacing = as_num(operands[0])
            elif op == "Tz":
                gs.ts.horizontal_scaling = as_num(operands[0]) / 100.0
            elif op == "TL":
                gs.ts.leading = as_num(operands[0])
            elif op == "Ts":
                gs.ts.rise = as_num(operands[0])
            elif op == "q":
                gs_stack.append(gs.clone())
            elif op == "Q":
                if gs_stack:
                    gs = gs_stack.pop()
                else:
                    log.warning("No state to pop")
            elif op == "gs":
                ext_gstate = require_dict(doc, resources, b"ExtGState")
                name = operands[0]
                if not isinstance(name, Name):
                    raise PdfError("gs operand not a name")
                apply_state(doc, gs, require_dict(doc, ext_gstate, bytes(name)))
            elif op == "CS":
                name = operands[0]
                if not isinstance(name, Name):
                    raise PdfError("CS operand not a name")
                gs.stroke_colorspace = make_colorspace(doc, bytes(name), resources)
            elif op == "cs":
                name = operands[0]
                if not isinstance(name, Name):
                    raise PdfError("cs operand not a name")
                gs.fill_colorspace = make_colorspace(doc, bytes(name), resources)
            elif op in ("SC", "SCN"):
                if gs.stroke_colorspace == "Pattern":
                    gs.stroke_color = []
                else:
                    gs.stroke_color = [as_num(x) for x in operands]
            elif op in ("sc", "scn"):
                if gs.fill_colorspace == "Pattern":
                    gs.fill_color = []
                else:
                    gs.fill_color = [as_num(x) for x in operands]
            elif op == "w":
                gs.line_width = as_num(operands[0])
            elif op == "m":
                path.append(("m", as_num(operands[0]), as_num(operands[1])))
            elif op == "l":
                path.append(("l", as_num(operands[0]), as_num(operands[1])))
            elif op == "c":
                path.append(("c",) + tuple(as_num(x) for x in operands[:6]))
            elif op == "v":
                x, y = _current_point(path)
                path.append(("c", x, y, as_num(operands[0]), as_num(operands[1]),
                             as_num(operands[2]), as_num(operands[3])))
            elif op == "y":
                path.append(("c", as_num(operands[0]), as_num(operands[1]),
                             as_num(operands[2]), as_num(operands[3]),
                             as_num(operands[2]), as_num(operands[3])))
            elif op == "h":
                path.append(("h",))
            elif op == "re":
                path.append(("re",) + tuple(as_num(x) for x in operands[:4]))
            elif op == "S":
                output.stroke(gs.ctm, gs.stroke_colorspace, gs.stroke_color, path)
                path = []
            elif op in ("F", "f"):
                output.fill(gs.ctm, gs.fill_colorspace, gs.fill_color, path)
                path = []
            elif op == "n":
                path = []
            elif op in ("BMC", "BDC"):
                mc_depth += 1
            elif op == "EMC":
                mc_depth = max(0, mc_depth - 1)
            elif op == "Do":
                # recursive subdocument processing (src/lib.rs:1860-1869)
                xobjects = require_dict(doc, resources, b"XObject")
                name = operands[0]
                if not isinstance(name, Name):
                    raise PdfError("Do operand not a name")
                xf = maybe_get_obj(doc, xobjects, bytes(name))
                if not isinstance(xf, Stream):
                    raise PdfError(f"missing XObject {bytes(name)!r}")
                if xf.dict.get(b"Subtype") == b"Image":
                    # DELIBERATE divergence: the reference recurses into
                    # EVERY XObject (src/lib.rs:1860-1869) and panics
                    # when the image entropy bytes fail Content::decode
                    # (lib.rs:1582 .unwrap()) — i.e. every scanned PDF
                    # crashes it.  Totalization trumps crash parity
                    # (same policy as the Do depth cap): images carry
                    # no text, skip them.
                    continue
                sub_res = xf.dict.get(b"Resources")
                if sub_res is not None:
                    from .objects import maybe_deref
                    sub_res = maybe_deref(doc, sub_res)
                sub_res = sub_res if isinstance(sub_res, dict) else resources
                from .document import _contents_bytes
                self.process_stream(doc, _contents_bytes(xf, doc), sub_res,
                                    media_box, output, page_num)
            # everything else is logged-and-ignored in the reference:
            # i J j M d ri s f* B B* b W w* G g RG rg K k and unknowns


def _current_point(path: List[tuple]) -> Tuple[float, float]:
    if not path:
        raise PdfError("current point on empty path")
    last = path[-1]
    if last[0] == "m" or last[0] == "l":
        return last[1], last[2]
    if last[0] == "c":
        return last[5], last[6]
    raise PdfError("no current point")
