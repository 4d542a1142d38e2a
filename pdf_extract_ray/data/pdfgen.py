"""Deterministic synthetic PDF writer for fixtures and the pages table.

Implements the generator classes from FIXTURES.md §F2, each exercising a
decode path of the extraction engine (reference anchors listed there).
Everything is seed-free and bit-stable: same call -> same bytes.
"""
from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Tuple


class PdfBuilder:
    """Assemble a classic xref-table PDF from numbered object bodies."""

    def __init__(self, version: str = "1.4"):
        self.bodies: List[bytes] = []

    def add(self, body: bytes) -> int:
        """Add object body (without `N 0 obj`/`endobj`); returns object num."""
        self.bodies.append(body)
        return len(self.bodies)

    def stream(self, d: str, data: bytes, compress: bool = False) -> int:
        if compress:
            data = zlib.compress(data)
            d = d[:-2].rstrip() + " /Filter /FlateDecode >>" if d.endswith(">>") else d
        d_full = d[:-2].rstrip() + f" /Length {len(data)} >>" if d.endswith(">>") else d
        return self.add(d_full.encode("latin-1") + b"\nstream\n" + data + b"\nendstream")

    def build(self, root_num: int, info_num: Optional[int] = None,
              version: str = "1.4") -> bytes:
        out = bytearray()
        out += f"%PDF-{version}\n%\xc2\xb5\xc2\xb6\n".encode("latin-1")
        offsets = [0]
        for i, body in enumerate(self.bodies, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_off = len(out)
        n = len(self.bodies) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        trailer = f"trailer\n<< /Size {n} /Root {root_num} 0 R"
        if info_num:
            trailer += f" /Info {info_num} 0 R"
        trailer += f" >>\nstartxref\n{xref_off}\n%%EOF\n"
        out += trailer.encode()
        return bytes(out)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _single_page(b: PdfBuilder, font_objs: Dict[str, int], content: bytes,
                 media_box: str = "[0 0 612 792]", compress: bool = False) -> int:
    font_entries = " ".join(f"/{k} {v} 0 R" for k, v in font_objs.items())
    content_num = b.stream("<< >>", content, compress=compress)
    page_num = b.add(
        f"<< /Type /Page /Parent {{PARENT}} /MediaBox {media_box} "
        f"/Resources << /Font << {font_entries} >> >> "
        f"/Contents {content_num} 0 R >>".encode())
    pages_num = b.add(f"<< /Type /Pages /Kids [{page_num} 0 R] /Count 1 >>".encode())
    b.bodies[page_num - 1] = b.bodies[page_num - 1].replace(
        b"{PARENT}", f"{pages_num} 0 R".encode())
    root_num = b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    return root_num


def pdf_simple_helvetica(text: str = "Hello World", compress: bool = False) -> bytes:
    """Core-font metrics + standard encoding widths, Tj/Td
    (ref src/lib.rs:586-655, core_fonts.rs)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    lines = text.split("\n")
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14.4 Td")
        ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    root = _single_page(b, {"F1": f1}, "\n".join(ops).encode("latin-1"),
                        compress=compress)
    return b.build(root)


def pdf_winansi_differences(text: str = "café “quoted”") -> bytes:
    """Encoding dict + BaseEncoding=WinAnsi + Differences remap
    (ref src/lib.rs:469-543)."""
    b = PdfBuilder()
    # remap code 0x80 -> eacute, 0x81 -> quotedblleft, 0x82 -> quotedblright
    enc = b.add(b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
                b"/Differences [128 /eacute /quotedblleft /quotedblright] >>")
    f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               f"/Encoding {enc} 0 R >>".encode())
    payload = (text.replace("é", "\x80")
                   .replace("“", "\x81")
                   .replace("”", "\x82"))
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(payload) + ") Tj ET").encode("latin-1")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_macroman(text: str = "résumé café") -> bytes:
    """MacRomanEncoding named encoding (ref src/lib.rs:354-365)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               b"/Encoding /MacRomanEncoding >>")
    payload = text.replace("é", "\x8e")  # MacRoman 0x8E = eacute
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(payload) + ") Tj ET").encode("latin-1")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_tounicode_bfchar(text: str = "AB☃") -> bytes:
    """ToUnicode CMap with bfchar + bfrange (ref src/lib.rs:920-968)."""
    b = PdfBuilder()
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"12 dict begin begincmap\n"
            b"/CMapName /Custom def\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"2 beginbfchar\n<41> <0041>\n<43> <2603>\nendbfchar\n"
            b"1 beginbfrange <42> <42> <0042> endbfrange\n"
            b"endcmap end end\n")
    cm = b.stream("<< >>", cmap)
    f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               f"/ToUnicode {cm} 0 R >>".encode())
    payload = text.replace("☃", "C")  # code 0x43 -> U+2603 via bfchar
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(payload) + ") Tj ET").encode("latin-1")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_identity_h(text: str = "Unicode 你好!") -> bytes:
    """Type0/CID font, Identity-H, 2-byte codes, W widths + DW, ToUnicode
    (ref src/lib.rs:971-1089)."""
    b = PdfBuilder()
    codes = []
    bfchars = []
    for i, ch in enumerate(text):
        code = 0x0100 + i
        codes.append(code)
        cps = ch.encode("utf-16-be").hex()
        bfchars.append(f"<{code:04x}> <{cps}>")
    cmap_txt = ("/CIDInit /ProcSet findresource begin\n"
                "12 dict begin begincmap\n"
                "1 begincodespacerange <0000> <ffff> endcodespacerange\n"
                f"{len(bfchars)} beginbfchar\n" + "\n".join(bfchars) +
                "\nendbfchar\nendcmap end end\n").encode()
    cm = b.stream("<< >>", cmap_txt)
    desc = b.add(b"<< /Type /FontDescriptor /FontName /Fake-CID /Flags 4 "
                 b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                 b"/Descent -200 /CapHeight 700 /StemV 80 >>")
    # W: list form [cid [w...]] covering half the codes; rest fall to DW 600
    w_covered = codes[:len(codes) // 2]
    w_str = f"[{w_covered[0]} [" + " ".join("500" for _ in w_covered) + "]]"
    cidfont = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake-CID "
                    f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                    f"/Supplement 0 >> /FontDescriptor {desc} 0 R /DW 600 "
                    f"/W {w_str} >>".encode())
    f1 = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-CID "
               f"/Encoding /Identity-H /DescendantFonts [{cidfont} 0 R] "
               f"/ToUnicode {cm} 0 R >>".encode())
    hexstr = "".join(f"{c:04x}" for c in codes)
    content = f"BT /F1 12 Tf 72 700 Td <{hexstr}> Tj ET".encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_type3(text: str = "abc") -> bytes:
    """Type3 font with mandatory Widths + Differences
    (ref src/lib.rs:692-765)."""
    b = PdfBuilder()
    glyph = b.stream("<< >>", b"0 0 750 750 re f")
    enc = b.add(b"<< /Type /Encoding /Differences [97 /a /b /c] >>")
    f1 = b.add(f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 750 750] "
               f"/FontMatrix [0.001 0 0 0.001 0 0] "
               f"/CharProcs << /a {glyph} 0 R /b {glyph} 0 R /c {glyph} 0 R >> "
               f"/Encoding {enc} 0 R /FirstChar 97 /LastChar 99 "
               f"/Widths [750 750 750] >>".encode())
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_tj_array() -> bytes:
    """TJ array with kerning adjustments + word spacing on byte 32
    (ref src/lib.rs:1656-1688, 1307-1312)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content = (b"BT /F1 12 Tf 2 Tw 1 Tc 72 700 Td "
               b"[(Ker) -120 (ned words) 250.5 (here)] TJ ET")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_multiline_layout() -> bytes:
    """Tm/Td/TD/T* line moves hitting all three PlainText reconstruction
    thresholds (ref src/lib.rs:1730-1782, 2161-2190)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content = (b"BT /F1 12 Tf\n"
               b"1 0 0 1 72 720 Tm (First line) Tj\n"
               b"24 TL T* (far below) Tj\n"         # 24 > 1.5*12 -> newline
               b"0 -14 Td (left and down) Tj\n"     # 14 > 0.5*12, x left -> newline
               b"300 0 Td (gap) Tj\n"               # x jump -> space
               b"ET")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_multipage(n_pages: int = 3, compress: bool = False) -> bytes:
    """Multi-page with inherited Resources/MediaBox from the Pages parent
    (ref src/lib.rs:2352-2362, 2401-2416)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>")
    page_nums = []
    content_nums = []
    for i in range(n_pages):
        data = f"BT /F1 14 Tf 72 {700 - 10 * i} Td (Page {i + 1} of {n_pages}) Tj ET".encode()
        content_nums.append(b.stream("<< >>", data, compress=compress))
    for cn in content_nums:
        # Page dicts with NO Resources/MediaBox: inherited from parent
        page_nums.append(b.add(f"<< /Type /Page /Parent {{PARENT}} "
                               f"/Contents {cn} 0 R >>".encode()))
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pages_num = b.add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
                      f"/MediaBox [0 0 612 792] "
                      f"/Resources << /Font << /F1 {f1} 0 R >> >> >>".encode())
    for p in page_nums:
        b.bodies[p - 1] = b.bodies[p - 1].replace(b"{PARENT}", f"{pages_num} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    return b.build(root)


def pdf_xobject_form() -> bytes:
    """`Do` Form XObject recursion with its own Resources
    (ref src/lib.rs:1860-1869)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    f2 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    xo_content = b"BT /F9 10 Tf 72 650 Td (from xobject) Tj ET"
    xo = b.stream(f"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
                  f"/Resources << /Font << /F9 {f2} 0 R >> >> >>", xo_content)
    content = f"BT /F1 12 Tf 72 700 Td (outer) Tj ET /X1 Do".encode()
    content_num = b.stream("<< >>", content)
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} /MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f1} 0 R >> "
                 f"/XObject << /X1 {xo} 0 R >> >> "
                 f"/Contents {content_num} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    return b.build(root)


def pdf_q_q_cm() -> bytes:
    """q/Q graphics-state stack + cm composition affecting positions
    (ref src/lib.rs:1622-1632, 1783-1791)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content = (b"BT /F1 12 Tf 72 700 Td (base) Tj ET\n"
               b"q 2 0 0 2 10 -350 cm "
               b"BT /F1 12 Tf 72 700 Td (scaled) Tj ET Q\n"
               b"BT /F1 12 Tf 72 650 Td (after) Tj ET")
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_flate_xrefstream(text: str = "xref stream doc") -> bytes:
    """FlateDecode content + xref stream + object stream layout
    (rebuilt parser surface, SURVEY.md §7 step 1)."""
    content_data = zlib.compress(
        ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode())
    # objects: 1=catalog 2=pages 3=page (in objstm), 4=font (in objstm),
    # 5=content stream, 6=objstm, 7=xref stream
    catalog = b"<< /Type /Catalog /Pages 2 0 R >>"
    pages = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    page = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>")
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    # object stream holds 1,2,3,4
    inner = [catalog, pages, page, font]
    offs = []
    pos = 0
    for body in inner:
        offs.append(pos)
        pos += len(body) + 1
    head = " ".join(f"{n} {o}" for n, o in zip([1, 2, 3, 4], offs)).encode()
    objstm_data = head + b"\n" + b"\n".join(inner) + b"\n"
    first = len(head) + 1
    objstm_z = zlib.compress(objstm_data)

    out = bytearray(b"%PDF-1.5\n%\xc2\xb5\n")
    offsets = {}
    offsets[5] = len(out)
    out += (f"5 0 obj\n<< /Length {len(content_data)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + content_data + b"\nendstream\nendobj\n")
    offsets[6] = len(out)
    out += (f"6 0 obj\n<< /Type /ObjStm /N 4 /First {first} "
            f"/Length {len(objstm_z)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + objstm_z + b"\nendstream\nendobj\n")
    xref_off = len(out)
    # xref stream: W [1 4 2]; entries for objects 0..7
    entries = []
    entries.append((0, 0, 0xFFFF))
    entries.append((2, 6, 0))  # 1 in objstm 6 idx 0
    entries.append((2, 6, 1))
    entries.append((2, 6, 2))
    entries.append((2, 6, 3))
    entries.append((1, offsets[5], 0))
    entries.append((1, offsets[6], 0))
    entries.append((1, xref_off, 0))
    xdata = b"".join(t.to_bytes(1, "big") + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
                     for t, f2, f3 in entries)
    xz = zlib.compress(xdata)
    out += (f"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R "
            f"/Length {len(xz)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + xz + b"\nendstream\nendobj\n")
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def pdf_zapf_symbol() -> bytes:
    """Symbol + ZapfDingbats FontSpecific lookup (ref src/lib.rs:629-633)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Symbol >>")
    f2 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /ZapfDingbats >>")
    # Symbol 0x61 = alpha; ZapfDingbats 0x61 = a1 (U+2701)
    content = (b"BT /F1 12 Tf 72 700 Td (abg) Tj ET\n"
               b"BT /F2 12 Tf 72 650 Td (abc) Tj ET")
    root = _single_page(b, {"F1": f1, "F2": f2}, content)
    return b.build(root)


def pdf_rc4_encrypted(text: str = "secret text") -> bytes:
    """RC4 (R2/V1) encrypted doc with empty user password."""
    import hashlib
    import struct as _struct
    from ..engine.crypt import PAD, rc4

    doc_id = bytes(range(16))
    p = -1
    # owner password = user password = empty: O = RC4(md5(pad(owner))[:5], pad(user))
    okey = hashlib.md5(PAD).digest()[:5]
    o = rc4(okey, PAD)
    h = hashlib.md5()
    h.update(PAD)
    h.update(o)
    h.update(_struct.pack("<i", p))
    h.update(doc_id)
    key = h.digest()[:5]
    u = rc4(key, PAD)

    def objkey(num, gen):
        hh = hashlib.md5()
        hh.update(key)
        hh.update(_struct.pack("<i", num)[:3])
        hh.update(_struct.pack("<i", gen)[:2])
        return hh.digest()[:10]

    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    cn_placeholder = b.stream("<< >>", b"")  # will replace with encrypted
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} /MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f1} 0 R >> >> "
                 f"/Contents {cn_placeholder} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    enc_num = b.add(
        b"<< /Filter /Standard /V 1 /R 2 /Length 40 "
        b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
        b"/P -1 >>")
    enc_content = rc4(objkey(cn_placeholder, 0), content)
    b.bodies[cn_placeholder - 1] = (
        f"<< /Length {len(enc_content)} >>".encode()
        + b"\nstream\n" + enc_content + b"\nendstream")
    raw = b.build(root)
    # patch trailer to add /Encrypt and /ID
    raw = raw.replace(
        b" >>\nstartxref",
        f" /Encrypt {enc_num} 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>] >>\nstartxref".encode())
    return raw


# registry used by the pages-table generator
PDF_GENERATORS = {
    "pdf_simple_helvetica": pdf_simple_helvetica,
    "pdf_winansi_differences": pdf_winansi_differences,
    "pdf_macroman": pdf_macroman,
    "pdf_tounicode_bfchar": pdf_tounicode_bfchar,
    "pdf_identity_h": pdf_identity_h,
    "pdf_type3": pdf_type3,
    "pdf_tj_array": pdf_tj_array,
    "pdf_multiline_layout": pdf_multiline_layout,
    "pdf_multipage": pdf_multipage,
    "pdf_xobject_form": pdf_xobject_form,
    "pdf_q_q_cm": pdf_q_q_cm,
    "pdf_flate_xrefstream": pdf_flate_xrefstream,
    "pdf_zapf_symbol": pdf_zapf_symbol,
}


def _encrypted_doc_skeleton(b: "PdfBuilder", enc_body: bytes, content_enc: bytes):
    """Shared layout for the encrypted fixtures: font/page tree + an
    already-encrypted content stream + the Encrypt dict."""
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    cn = b.add(f"<< /Length {len(content_enc)} >>".encode()
               + b"\nstream\n" + content_enc + b"\nendstream")
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} /MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f1} 0 R >> >> "
                 f"/Contents {cn} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    enc_num = b.add(enc_body)
    return root, enc_num, cn


def pdf_aes128_encrypted(text: str = "aes secret") -> bytes:
    """V4/R4 AESV2 (AES-128-CBC) with empty user+owner password."""
    import hashlib
    import struct as _struct
    from ..engine.aes import aes_cbc_encrypt
    from ..engine.crypt import PAD, rc4

    doc_id = bytes(range(16, 32))
    p = -3904  # typical permission bits
    klen = 16
    # Algorithm 3: O entry (owner password == user password == empty)
    h = hashlib.md5(PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h[:klen]).digest()
    okey = h[:klen]
    step = PAD
    for i in range(20):
        step = rc4(bytes(bb ^ i for bb in okey), step)
    o = step
    # Algorithm 2: file key (R4)
    h = hashlib.md5()
    h.update(PAD)
    h.update(o[:32])
    h.update(_struct.pack("<i", p))
    h.update(doc_id)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:klen]).digest()
    key = key[:klen]
    # Algorithm 5: U entry (R4)
    hu = hashlib.md5()
    hu.update(PAD)
    hu.update(doc_id)
    step = rc4(key, hu.digest())
    for i in range(1, 20):
        step = rc4(bytes(bb ^ i for bb in key), step)
    u = step + bytes(16)

    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    b = PdfBuilder()
    # object number of the content stream in the skeleton is 2 (font is 1)
    cn_num = 2
    objkey = hashlib.md5(
        key + _struct.pack("<i", cn_num)[:3] + _struct.pack("<i", 0)[:2]
        + b"sAlT").digest()[:16]
    iv = bytes(range(32, 48))  # deterministic fixture IV
    content_enc = aes_cbc_encrypt(objkey, iv, content)
    enc_body = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 /AuthEvent /DocOpen >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
        b"/P " + str(p).encode() + b" >>")
    root, enc_num, _cn = _encrypted_doc_skeleton(b, enc_body, content_enc)
    raw = b.build(root)
    return raw.replace(
        b" >>\nstartxref",
        f" /Encrypt {enc_num} 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>] >>\nstartxref".encode())


def pdf_aes256_encrypted(text: str = "aes256 secret") -> bytes:
    """V5/R6 AESV3 (AES-256-CBC, ISO 32000-2) with empty user password."""
    from ..engine.aes import aes_cbc_encrypt, aes_cbc_no_pad_encrypt
    from ..engine.crypt import _hash_r6

    file_key = bytes(range(64, 96))
    vsalt = bytes(range(8))
    ksalt = bytes(range(8, 16))
    pw = b""
    u = _hash_r6(pw, vsalt)[:32] + vsalt + ksalt
    ikey = _hash_r6(pw, ksalt)
    ue = aes_cbc_no_pad_encrypt(ikey, bytes(16), file_key)
    o = bytes(48)  # owner entry unused by the empty-user-password path
    oe = bytes(32)

    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    iv = bytes(range(48, 64))
    content_enc = aes_cbc_encrypt(file_key, iv, content)
    enc_body = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /Length 32 /AuthEvent /DocOpen >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
        b"/UE <" + ue.hex().encode() + b"> /OE <" + oe.hex().encode() + b"> "
        b"/P -3904 >>")
    b = PdfBuilder()
    root, enc_num, _cn = _encrypted_doc_skeleton(b, enc_body, content_enc)
    raw = b.build(root)
    doc_id = bytes(range(16))
    return raw.replace(
        b" >>\nstartxref",
        f" /Encrypt {enc_num} 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>] >>\nstartxref".encode())


def _cff_minimal() -> bytes:
    """Minimal Type1C font program: 2 glyphs, custom encoding
    (0x41 -> custom-string glyph 'eacute' via SID 391, 0x42 -> 'A'/SID 34)."""
    def index(items):
        if not items:
            return (0).to_bytes(2, "big")
        data = b"".join(items)
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        osz = 1 if offs[-1] < 256 else 2
        out = len(items).to_bytes(2, "big") + bytes([osz])
        for o in offs:
            out += o.to_bytes(osz, "big")
        return out + data

    def dict_int(v, op):
        b = bytes([29]) + (v & 0xFFFFFFFF).to_bytes(4, "big")
        return b + bytes([op])

    header = bytes([1, 0, 4, 4])
    name_idx = index([b"TestCFF"])
    string_idx = index([b"eacute"])
    gsubr = index([])
    charset = bytes([0]) + (391).to_bytes(2, "big") + (34).to_bytes(2, "big")
    encoding = bytes([0, 2, 0x41, 0x42])
    charstrings = index([bytes([14])] * 3)  # .notdef + 2 glyphs, endchar

    def build(charset_off, enc_off, cs_off):
        top = (dict_int(charset_off, 15) + dict_int(enc_off, 16)
               + dict_int(cs_off, 17))
        top_idx = index([top])
        pre = header + name_idx + top_idx + string_idx + gsubr
        a = len(pre)
        b_ = a + len(charset)
        c = b_ + len(encoding)
        return pre + charset + encoding + charstrings, a, b_, c

    _blob, a, b_, c = build(0, 0, 0)
    blob, a2, b2, c2 = build(a, b_, c)
    assert (a2, b2, c2) == (a, b_, c)
    return blob


def pdf_cff_type1c(text: str = "AB") -> bytes:
    """Simple font whose unicode map comes from an embedded Type1C (CFF)
    charset/encoding (ref src/lib.rs:406-442).  'A' decodes via the custom
    string-index glyph (eacute), 'B' via standard-string SID."""
    b = PdfBuilder()
    cff = b.stream("<< /Subtype /Type1C >>", _cff_minimal())
    desc = b.add(f"<< /Type /FontDescriptor /FontName /TestCFF /Flags 4 "
                 f"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                 f"/Descent -200 /CapHeight 700 /StemV 80 "
                 f"/FontFile3 {cff} 0 R >>".encode())
    f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
               f"/FirstChar 65 /LastChar 66 /Widths [500 500] "
               f"/FontDescriptor {desc} 0 R >>".encode())
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


PDF_GENERATORS["pdf_cff_type1c"] = pdf_cff_type1c


def pdf_textstate_ops() -> bytes:
    """Tz (horizontal scaling), Ts (rise), Tc/Tw spacing, gs (ExtGState
    with SMask) — the text-state ops not covered by other fixtures
    (ref src/lib.rs:1697-1729, 1792-1797)."""
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    gs1 = b.add(b"<< /Type /ExtGState /SMask /None >>")
    content = (b"/GS1 gs\n"
               b"BT /F1 12 Tf\n"
               b"72 700 Td 50 Tz (squeezed text) Tj\n"   # 50% h-scale
               b"100 Tz 0 -30 Td 3 Ts (raised) Tj 0 Ts ( base) Tj\n"
               b"0 -30 Td 2 Tc 4 Tw (w i d e) Tj\n"
               b"ET")
    content_num = b.stream("<< >>", content)
    page = b.add(f"<< /Type /Page /Parent {{P}} /MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f1} 0 R >> "
                 f"/ExtGState << /GS1 {gs1} 0 R >> >> "
                 f"/Contents {content_num} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(b"{P}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    return b.build(root)


def pdf_cid_word_spacing_quirk() -> bytes:
    """Word spacing applies only to SINGLE-byte code 32: a CID font with
    2-byte codes gets NO Tw advance even when a code maps to a space
    (ref src/lib.rs:1307-1312)."""
    b = PdfBuilder()
    text = "a b"
    codes = [0x0100, 0x0020, 0x0102]  # middle code IS 0x20 but 2 bytes wide
    bfchars = [f"<{c:04x}> <{ord(ch):04x}>" for c, ch in zip(codes, text)]
    cmap_txt = ("1 begincodespacerange <0000> <ffff> endcodespacerange\n"
                f"{len(bfchars)} beginbfchar\n" + "\n".join(bfchars) +
                "\nendbfchar\n").encode()
    cm = b.stream("<< >>", cmap_txt)
    desc = b.add(b"<< /Type /FontDescriptor /FontName /QuirkCID /Flags 4 "
                 b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                 b"/Descent -200 /CapHeight 700 /StemV 80 >>")
    cidfont = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /QuirkCID "
                    f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                    f"/Supplement 0 >> /FontDescriptor {desc} 0 R /DW 500 >>".encode())
    f1 = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /QuirkCID "
               f"/Encoding /Identity-H /DescendantFonts [{cidfont} 0 R] "
               f"/ToUnicode {cm} 0 R >>".encode())
    hexstr = "".join(f"{c:04x}" for c in codes)
    content = f"BT /F1 12 Tf 1000 Tw 72 700 Td <{hexstr}> Tj ET".encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


PDF_GENERATORS["pdf_textstate_ops"] = pdf_textstate_ops
PDF_GENERATORS["pdf_cid_word_spacing_quirk"] = pdf_cid_word_spacing_quirk


# ---------------------------------------------------------------------------
# adversarial fixtures (round 2): real-world damage / exotic-feature patterns
# targeting the residual real-corpus parity risks (VERDICT r1 "missing" #1).
# Test-only: deliberately NOT wired into make_payload so the cached pages
# corpus and its goldens stay byte-stable.
# ---------------------------------------------------------------------------


def pdf_corrupt_startxref(text: str = "recovered text") -> bytes:
    """startxref points at a garbage offset: the xref chain is unusable and
    the document loads only through the brute-force recovery scan
    (document.py:_recover_scan, the lopdf repair-path analogue)."""
    raw = pdf_simple_helvetica(text)
    idx = raw.rfind(b"startxref")
    return raw[:idx] + b"startxref\n42\n%%EOF\n"


def pdf_truncated_xref(text: str = "truncated xref") -> bytes:
    """xref table promises N entries but is cut off after the free entry:
    the int() parse of the `trailer` keyword aborts the chain and recovery
    rebuilds the object index from `N G obj` headers."""
    raw = pdf_simple_helvetica(text)
    i = raw.rfind(b"xref\n")
    j = raw.find(b"trailer", i)
    section = raw[i:j].split(b"\n")
    damaged = b"\n".join(section[:3]) + b"\n"  # header + count + 1 entry
    return raw[:i] + damaged + raw[j:]


def pdf_hybrid_xref(text: str = "hybrid xref doc") -> bytes:
    """Hybrid-reference file (PDF 1.5 spec 7.5.8.4): the classic xref
    table marks the font object FREE; its real entry lives in an xref
    STREAM referenced from the trailer's /XRefStm.  Readers that ignore
    /XRefStm cannot resolve the font (document.py:101-107)."""
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    content_data = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    content = (f"<< /Length {len(content_data)} >>".encode()
               + b"\nstream\n" + content_data + b"\nendstream")
    page = (b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 1 0 R >> >> /Contents 2 0 R >>")
    pages = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    catalog = b"<< /Type /Catalog /Pages 4 0 R >>"

    out = bytearray(b"%PDF-1.5\n%\xc2\xb5\xc2\xb6\n")
    offsets = {}
    for num, body in ((1, font), (2, content), (3, page), (4, pages),
                      (5, catalog)):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

    # xref stream (object 6): carries ONLY the font entry
    xrefstm_off = len(out)
    entry = (1).to_bytes(1, "big") + offsets[1].to_bytes(4, "big") + (0).to_bytes(2, "big")
    xz = zlib.compress(entry)
    out += (f"6 0 obj\n<< /Type /XRef /Size 7 /Index [1 1] /W [1 4 2] "
            f"/Root 5 0 R /Length {len(xz)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + xz + b"\nendstream\nendobj\n")

    # classic xref table: object 1 deliberately FREE
    xref_off = len(out)
    out += b"xref\n0 7\n"
    out += b"0000000000 65535 f \n"
    out += b"0000000000 00000 f \n"  # font: only in the xref stream
    for num in (2, 3, 4, 5):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += f"{xrefstm_off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size 7 /Root 5 0 R /XRefStm {xrefstm_off} >>\n"
            f"startxref\n{xref_off}\n%%EOF\n").encode()
    return bytes(out)


def pdf_embedded_cmap_multibyte() -> bytes:
    """Type0 font whose /Encoding is an EMBEDDED CMap stream with a mixed
    1-byte + 2-byte codespace and a hole (lead bytes 80-813F map to no
    range).  Exercises the greedy 1..4-byte codespace match and the
    reference's cid = code + dst_lo quirk (src/lib.rs:983-1035, 1060-1080).
    Codes after the hole are dropped (next_char -> None ends the show)."""
    b = PdfBuilder()
    cid_cmap = (b"%!PS-Adobe-3.0 Resource-CMap\n"
                b"/CIDInit /ProcSet findresource begin\n"
                b"12 dict begin begincmap\n"
                b"/CMapName /Mixed-H def /CMapType 1 def\n"
                b"2 begincodespacerange\n<00> <7f>\n<8140> <9ffc>\n"
                b"endcodespacerange\n"
                b"2 begincidrange\n<00> <7f> 0\n<8140> <9ffc> 0\n"
                b"endcidrange\nendcmap end end\n")
    enc = b.stream("<< /Type /CMap /CMapName /Mixed-H >>", cid_cmap)
    # ToUnicode keyed on the resulting CIDs (== raw code, dst lo 0)
    bfchars = ["<0041> <004d>",  # code 0x41 -> 'M'
               "<0042> <0069>",  # 0x42 -> 'i'
               "<0043> <0078>",  # 0x43 -> 'x'
               "<8140> <0065>",  # 2-byte 0x8140 -> 'e'
               "<8141> <0064>"]  # 2-byte 0x8141 -> 'd'
    tounicode = ("/CIDInit /ProcSet findresource begin\n"
                 "12 dict begin begincmap\n"
                 "1 begincodespacerange <0000> <ffff> endcodespacerange\n"
                 f"{len(bfchars)} beginbfchar\n" + "\n".join(bfchars) +
                 "\nendbfchar\nendcmap end end\n").encode()
    cm = b.stream("<< >>", tounicode)
    desc = b.add(b"<< /Type /FontDescriptor /FontName /MixedCID /Flags 4 "
                 b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                 b"/Descent -200 /CapHeight 700 /StemV 80 >>")
    cidfont = b.add(f"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /MixedCID "
                    f"/CIDSystemInfo << /Registry (Test) /Ordering (Mixed) "
                    f"/Supplement 0 >> /FontDescriptor {desc} 0 R /DW 600 "
                    f"/W [33088 [500 500]] >>".encode())  # 33088 = 0x8140
    f1 = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /MixedCID "
               f"/Encoding {enc} 0 R /DescendantFonts [{cidfont} 0 R] "
               f"/ToUnicode {cm} 0 R >>".encode())
    # M i x (1-byte) e d (2-byte), then hole byte 0x80 0x20 and codes that
    # would decode but are unreachable past the hole
    hexstr = "414243" + "81408141" + "8020" + "4142"
    content = f"BT /F1 12 Tf 72 700 Td <{hexstr}> Tj ET".encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_subset_partial_widths(text: str = "ABCD") -> bytes:
    """Subset-tagged core font (ABCDEF+Helvetica is NOT a core-font name:
    no prefix stripping, matching the reference) WITH a partial Widths
    array: FirstChar..LastChar covers only A..C; code 'D' falls through to
    /MissingWidth (read from the font dict, src/lib.rs:657)."""
    b = PdfBuilder()
    desc = b.add(b"<< /Type /FontDescriptor /FontName /ABCDEF+Helvetica "
                 b"/Flags 32 /FontBBox [0 0 1000 1000] /ItalicAngle 0 "
                 b"/Ascent 718 /Descent -207 /CapHeight 718 /StemV 88 >>")
    f1 = b.add(f"<< /Type /Font /Subtype /TrueType "
               f"/BaseFont /ABCDEF+Helvetica /FirstChar 65 /LastChar 67 "
               f"/Widths [600 0 650] /MissingWidth 250 "
               f"/FontDescriptor {desc} 0 R >>".encode())
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


def pdf_subset_no_widths(text: str = "no widths here") -> bytes:
    """Subset-tagged font with NO Widths at all: the reference's
    substitution path looks up metrics by the ORIGINAL base name, finds
    nothing for 'ABCDEF+Helvetica', and leaves the width map EMPTY (quirk,
    src/lib.rs:586-655).  Text still decodes via PDFDocEncoding."""
    b = PdfBuilder()
    desc = b.add(b"<< /Type /FontDescriptor /FontName /ABCDEF+Helvetica "
                 b"/Flags 32 /FontBBox [0 0 1000 1000] /ItalicAngle 0 "
                 b"/Ascent 718 /Descent -207 /CapHeight 718 /StemV 88 >>")
    f1 = b.add(f"<< /Type /Font /Subtype /TrueType "
               f"/BaseFont /ABCDEF+Helvetica "
               f"/FontDescriptor {desc} 0 R >>".encode())
    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    root = _single_page(b, {"F1": f1}, content)
    return b.build(root)


ADVERSARIAL_GENERATORS = {
    "pdf_corrupt_startxref": pdf_corrupt_startxref,
    "pdf_truncated_xref": pdf_truncated_xref,
    "pdf_hybrid_xref": pdf_hybrid_xref,
    "pdf_embedded_cmap_multibyte": pdf_embedded_cmap_multibyte,
    "pdf_subset_partial_widths": pdf_subset_partial_widths,
    "pdf_subset_no_widths": pdf_subset_no_widths,
}


def pdf_incremental_update(old_text: str = "original text",
                           new_text: str = "updated text") -> bytes:
    """Incremental update (PDF spec 7.5.6): the original body stays
    untouched; an APPENDED section rewrites the content-stream object and
    adds a new xref table whose /Prev points at the original xref.  The
    newest xref section must win for the updated object while every other
    object resolves through the /Prev chain."""
    base = pdf_simple_helvetica(old_text)
    # object 2 is the content stream in pdf_simple_helvetica's layout
    content = ("BT /F1 12 Tf 72 720 Td (" + _esc(new_text) + ") Tj ET").encode("latin-1")
    new_obj = (f"<< /Length {len(content)} >>".encode()
               + b"\nstream\n" + content + b"\nendstream")
    prev_xref = int(base[base.rfind(b"startxref") + 9:base.rfind(b"%%EOF")]
                    .strip())
    out = bytearray(base)
    obj_off = len(out)
    out += b"2 0 obj\n" + new_obj + b"\nendobj\n"
    xref_off = len(out)
    out += (b"xref\n0 1\n0000000000 65535 f \n"
            b"2 1\n" + f"{obj_off:010d} 00000 n \n".encode())
    root_m = base.rfind(b"/Root")
    root_num = int(base[root_m + 5:root_m + 12].split()[0])
    size_m = base.rfind(b"/Size")
    size = int(base[size_m + 5:size_m + 12].split()[0])
    out += (f"trailer\n<< /Size {size} /Root {root_num} 0 R "
            f"/Prev {prev_xref} >>\nstartxref\n{xref_off}\n%%EOF\n").encode()
    return bytes(out)


ADVERSARIAL_GENERATORS["pdf_incremental_update"] = pdf_incremental_update


def pdf_aes128_objstm(text: str = "objstm aes secret") -> bytes:
    """AES-128 encrypted document whose catalog/pages/page/font live in an
    OBJECT STREAM — the modern writer default.  The ObjStm container is
    encrypted like any stream; objects inside it carry no per-object crypt
    (PDF spec 7.5.7), so the reader must decrypt the container exactly
    once (document.py:_load_objstm)."""
    import hashlib
    import struct as _struct
    from ..engine.aes import aes_cbc_encrypt
    from ..engine.crypt import PAD, rc4

    doc_id = bytes(range(16, 32))
    p = -3904
    klen = 16
    h = hashlib.md5(PAD).digest()
    for _ in range(50):
        h = hashlib.md5(h[:klen]).digest()
    okey = h[:klen]
    step = PAD
    for i in range(20):
        step = rc4(bytes(bb ^ i for bb in okey), step)
    o = step
    h = hashlib.md5()
    h.update(PAD)
    h.update(o[:32])
    h.update(_struct.pack("<i", p))
    h.update(doc_id)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:klen]).digest()
    key = key[:klen]
    hu = hashlib.md5()
    hu.update(PAD)
    hu.update(doc_id)
    step = rc4(key, hu.digest())
    for i in range(1, 20):
        step = rc4(bytes(bb ^ i for bb in key), step)
    u = step + bytes(16)

    def objkey(num, gen):
        return hashlib.md5(key + _struct.pack("<i", num)[:3]
                           + _struct.pack("<i", gen)[:2]
                           + b"sAlT").digest()[:16]

    content = ("BT /F1 12 Tf 72 700 Td (" + _esc(text) + ") Tj ET").encode()
    content_enc = aes_cbc_encrypt(objkey(5, 0), bytes(range(16)), content)

    inner = [b"<< /Type /Catalog /Pages 2 0 R >>",
             b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
             b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
             b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"]
    offs, pos = [], 0
    for b_ in inner:
        offs.append(pos)
        pos += len(b_) + 1
    head = " ".join(f"{n} {off}" for n, off in zip([1, 2, 3, 4], offs)).encode()
    objstm_plain = head + b"\n" + b"\n".join(inner) + b"\n"
    first = len(head) + 1
    objstm_stored = aes_cbc_encrypt(objkey(6, 0), bytes(range(16, 32)),
                                    zlib.compress(objstm_plain))

    out = bytearray(b"%PDF-1.6\n%\xc2\xb5\n")
    offsets = {}
    offsets[5] = len(out)
    out += (f"5 0 obj\n<< /Length {len(content_enc)} >>\n".encode()
            + b"stream\n" + content_enc + b"\nendstream\nendobj\n")
    offsets[6] = len(out)
    out += (f"6 0 obj\n<< /Type /ObjStm /N 4 /First {first} "
            f"/Length {len(objstm_stored)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + objstm_stored + b"\nendstream\nendobj\n")
    offsets[8] = len(out)
    enc_body = (b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /Length 16 "
                b"/AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF "
                b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode()
                + b"> /P " + str(p).encode() + b" >>")
    out += b"8 0 obj\n" + enc_body + b"\nendobj\n"
    xref_off = len(out)
    entries = [(0, 0, 0xFFFF), (2, 6, 0), (2, 6, 1), (2, 6, 2), (2, 6, 3),
               (1, offsets[5], 0), (1, offsets[6], 0), (1, xref_off, 0),
               (1, offsets[8], 0)]
    xdata = b"".join(t.to_bytes(1, "big") + f2.to_bytes(4, "big")
                     + f3.to_bytes(2, "big") for t, f2, f3 in entries)
    xz = zlib.compress(xdata)
    out += (f"7 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] /Root 1 0 R "
            f"/Encrypt 8 0 R /ID [<{doc_id.hex()}> <{doc_id.hex()}>] "
            f"/Length {len(xz)} /Filter /FlateDecode >>\n".encode()
            + b"stream\n" + xz + b"\nendstream\nendobj\n")
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def pdf_encrypted_corrupt_startxref(text: str = "objstm aes secret") -> bytes:
    """The encrypted+recovery COMBO (VERDICT r2 #5): an AES-128 doc whose
    catalog/page tree live in an ENCRYPTED object stream AND whose
    startxref points at garbage.  The loader must brute-force-scan for
    object headers, harvest Root/Encrypt/ID from the /Type /XRef stream
    it finds, skip the still-encrypted ObjStm on the first index pass,
    then re-index its members after decrypt_document installs the file
    key (crypt.py:decrypt_document -> Document._index_objstms)."""
    raw = pdf_aes128_objstm(text)
    idx = raw.rfind(b"startxref")
    return raw[:idx] + b"startxref\n13\n%%EOF\n"


ADVERSARIAL_GENERATORS["pdf_aes128_objstm"] = pdf_aes128_objstm
ADVERSARIAL_GENERATORS["pdf_encrypted_corrupt_startxref"] = \
    pdf_encrypted_corrupt_startxref


# ---------------------------------------------------------------------------
# Writer-profile generators (VERDICT r3 item 1): fixtures that mimic the
# operator/structure mixes real PDF writers emit, so byte parity is
# anchored on realistic shapes, not only on single-feature fixtures.
# All three register in PDF_GENERATORS, so the differential-property,
# span-parity and fuzz suites cover them automatically.
# ---------------------------------------------------------------------------


def _a85_encode(data: bytes) -> bytes:
    """PDF ASCII85 serialization (no <~ leader, ~> terminator)."""
    import base64
    return base64.a85encode(data) + b"~>"


def _lzw_encode(data: bytes) -> bytes:
    """Valid (deliberately size-inefficient) PDF LZW stream: a CLEAR
    code before every literal keeps the decoder table at its initial
    size, so every code is 9 bits — exercises the LZWDecode path
    without reimplementing adaptive code-width logic fixture-side."""
    buf = bytearray()
    acc = 0
    n = 0

    def emit(code: int):
        nonlocal acc, n
        acc = (acc << 9) | code
        n += 9
        while n >= 8:
            n -= 8
            buf.append((acc >> n) & 0xFF)

    emit(256)
    for byte in data:
        emit(byte)
        emit(256)
    emit(257)
    if n:
        buf.append((acc << (8 - n)) & 0xFF)
    return bytes(buf)


def pdf_latex_style() -> bytes:
    """pdfTeX-profile fixture: Type1 SUBSET fonts (ABCDEF+ prefixes),
    one re-encoded to low codes via /Differences carrying ligature and
    punctuation glyph names (fi/fl/emdash/quotedbl*), one with NO
    /Encoding entry whose embedded Type1 FontFile supplies the builtin
    encoding (`dup N /name put` cleartext, engine/type1.py), kerned TJ
    arrays throughout, Flate-compressed content — the standard LaTeX
    document shape (reference parity surface: src/lib.rs:391-518
    encoding priority + TJ positioning)."""
    b = PdfBuilder()
    clear = (b"%!PS-AdobeFont-1.0: TestRoman 001.001\n"
             b"/FontName /ABCDEF+TestRoman def\n"
             b"/PaintType 0 def\n"
             b"/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
             b"/Encoding 256 array\n"
             b"0 1 255 {1 index exch /.notdef put} for\n"
             b"dup 65 /alpha put\n"
             b"dup 66 /beta put\n"
             b"dup 67 /summation put\n"
             b"readonly def\n"
             b"currentdict end\n"
             b"currentfile eexec\n")
    binary = bytes(range(64))
    t1_program = clear + binary + b"\n0" * 8 + b"\ncleartomark\n"
    ff = b.stream(
        f"<< /Length1 {len(clear)} /Length2 {len(binary)} "
        f"/Length3 0 >>", t1_program)
    desc2 = b.add(
        f"<< /Type /FontDescriptor /FontName /ABCDEF+TestRoman "
        f"/Flags 4 /ItalicAngle 0 /Ascent 694 /Descent -194 "
        f"/StemV 69 /FontBBox [-40 -250 1009 750] "
        f"/FontFile {ff} 0 R >>".encode())
    f2 = b.add(
        f"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+TestRoman "
        f"/FirstChar 65 /LastChar 67 /Widths [500 500 500] "
        f"/FontDescriptor {desc2} 0 R >>".encode())
    f1 = b.add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /GHIJKL+TestItalic "
        b"/FirstChar 1 /LastChar 5 /Widths [556 556 1000 500 500] "
        b"/Encoding << /Differences [1 /fi /fl /emdash /quotedblleft "
        b"/quotedblright] >> >>")
    content = (b"BT\n"
               b"/F1 9.96 Tf\n"
               b"72 700 Td\n"
               b"[(\\001nds) -250 (and) -250 (\\002ies)] TJ\n"
               b"0 -11.96 Td\n"
               b"[(\\004kerned\\005) -278 (\\003) -278 (dash)] TJ\n"
               b"/F2 9.96 Tf\n"
               b"0 -11.96 Td\n"
               b"[(A) 28 (BC)] TJ\n"
               b"ET")
    root = _single_page(b, {"F1": f1, "F2": f2}, content, compress=True)
    return b.build(root)


def pdf_word_style() -> bytes:
    """Word-profile fixture: PDF 1.7 xref-stream + ObjStm layout, two
    pages — page 1 simple /TrueType with /WinAnsiEncoding (smart
    quotes and en-dash from the 0x80-0x9F WinAnsi region), page 2
    Type0/CIDFontType2 Identity-H whose ToUnicode carries BOTH a
    bfrange and a SURROGATE-PAIR bfchar (emoji) — plus an Info
    dictionary inside the object stream (reference parity surface:
    src/lib.rs CMap bfchar/bfrange + UTF-16BE handling)."""
    widths = " ".join(["500"] * 117)
    tounicode = (b"/CIDInit /ProcSet findresource begin\n"
                 b"12 dict begin\nbegincmap\n"
                 b"/CMapName /Adobe-Identity-UCS def\n"
                 b"/CMapType 2 def\n"
                 b"1 begincodespacerange\n<0000> <FFFF>\n"
                 b"endcodespacerange\n"
                 b"2 beginbfchar\n"
                 b"<0005> <D83DDE00>\n"
                 b"<0006> <0021>\n"
                 b"endbfchar\n"
                 b"1 beginbfrange\n"
                 b"<0010> <0019> <0041>\n"
                 b"endbfrange\n"
                 b"endcmap\nCMapName currentdict /CMap defineresource "
                 b"pop\nend\nend\n")
    inner = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 10 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F0 6 0 R >> >> /Contents 11 0 R >>",
        (b"<< /Type /Font /Subtype /TrueType /BaseFont /Calibri "
         b"/FirstChar 32 /LastChar 148 /Widths [" + widths.encode()
         + b"] /Encoding /WinAnsiEncoding >>"),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Calibri "
        b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
        b"/ToUnicode 12 0 R >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Calibri "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor 8 0 R /DW 1000 "
        b"/W [16 [500 500 500 500 500 500 500 500 500 500]] >>",
        b"<< /Type /FontDescriptor /FontName /Calibri /Flags 4 "
        b"/ItalicAngle 0 /Ascent 750 /Descent -250 /StemV 80 "
        b"/FontBBox [-503 -313 1240 1026] >>",
        b"<< /Title (Quarterly Report) /Author (A. Writer) "
        b"/Producer (WordProfile 1.0) >>",
    ]
    offs, pos = [], 0
    for body in inner:
        offs.append(pos)
        pos += len(body) + 1
    nums = list(range(1, len(inner) + 1))
    head = " ".join(f"{n} {o}" for n, o in zip(nums, offs)).encode()
    objstm_data = head + b"\n" + b"\n".join(inner) + b"\n"
    first = len(head) + 1
    objstm_z = zlib.compress(objstm_data)

    content1 = zlib.compress(
        b"BT /F1 11 Tf 72 700 Td (Hello \\223Word\\224 \\226 style) "
        b"Tj ET")
    content2 = zlib.compress(
        b"BT /F0 12 Tf 72 700 Td <001000110012001300140005> Tj ET")
    tounicode_z = zlib.compress(tounicode)

    out = bytearray(b"%PDF-1.7\n%\xc2\xb5\n")
    offsets = {}
    offsets[10] = len(out)
    out += (f"10 0 obj\n<< /Length {len(content1)} /Filter /FlateDecode"
            f" >>\n".encode() + b"stream\n" + content1
            + b"\nendstream\nendobj\n")
    offsets[11] = len(out)
    out += (f"11 0 obj\n<< /Length {len(content2)} /Filter "
            f"/FlateDecode >>\n".encode() + b"stream\n" + content2
            + b"\nendstream\nendobj\n")
    offsets[12] = len(out)
    out += (f"12 0 obj\n<< /Length {len(tounicode_z)} /Filter "
            f"/FlateDecode >>\n".encode() + b"stream\n" + tounicode_z
            + b"\nendstream\nendobj\n")
    offsets[13] = len(out)
    out += (f"13 0 obj\n<< /Type /ObjStm /N {len(inner)} "
            f"/First {first} /Length {len(objstm_z)} "
            f"/Filter /FlateDecode >>\n".encode()
            + b"stream\n" + objstm_z + b"\nendstream\nendobj\n")
    xref_off = len(out)
    entries = [(0, 0, 0xFFFF)]
    for idx in range(len(inner)):
        entries.append((2, 13, idx))
    for num in (10, 11, 12, 13):
        entries.append((1, offsets[num], 0))
    entries.append((1, xref_off, 0))
    xdata = b"".join(t.to_bytes(1, "big") + f2.to_bytes(4, "big")
                     + f3.to_bytes(2, "big") for t, f2, f3 in entries)
    xz = zlib.compress(xdata)
    out += (f"14 0 obj\n<< /Type /XRef /Size 15 /W [1 4 2] "
            f"/Root 1 0 R /Info 9 0 R /Length {len(xz)} "
            f"/Filter /FlateDecode >>\n".encode()
            + b"stream\n" + xz + b"\nendstream\nendobj\n")
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def pdf_ghostscript_style() -> bytes:
    """Ghostscript-pdfwrite-profile fixture: ASCII85+Flate filter CHAIN
    on the page content, an LZWDecode Form XObject invoked with Do, an
    ObjStm-heavy xref STREAM with the PNG Up predictor
    (/DecodeParms /Predictor 12), and a base-14 font re-encoded via
    /Differences — the classic ps2pdf output shape (reference parity
    surface: filter chains src/lib.rs:1257 + Do recursion)."""
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /Differences [200 /dotlessi /germandbls] "
            b">> >>")
    inner = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> "
        b"/XObject << /Fm1 6 0 R >> >> /Contents 5 0 R >>",
        font,
    ]
    offs, pos = [], 0
    for body in inner:
        offs.append(pos)
        pos += len(body) + 1
    head = " ".join(f"{n} {o}"
                    for n, o in zip([1, 2, 3, 4], offs)).encode()
    objstm_data = head + b"\n" + b"\n".join(inner) + b"\n"
    first = len(head) + 1
    objstm_z = zlib.compress(objstm_data)

    content_raw = (b"BT /F1 10 Tf 72 700 Td "
                   b"(ghostscript ma\\310n l\\311ne) Tj ET\n"
                   b"q 1 0 0 1 0 0 cm /Fm1 Do Q")
    content_a85 = _a85_encode(zlib.compress(content_raw))
    xobj_raw = b"BT /F1 10 Tf 72 650 Td (from lzw xobject) Tj ET"
    xobj_lzw = _lzw_encode(xobj_raw)

    out = bytearray(b"%PDF-1.5\n%\xc2\xb5\n")
    offsets = {}
    offsets[5] = len(out)
    out += (f"5 0 obj\n<< /Length {len(content_a85)} /Filter "
            f"[/ASCII85Decode /FlateDecode] >>\n".encode()
            + b"stream\n" + content_a85 + b"\nendstream\nendobj\n")
    offsets[6] = len(out)
    out += (f"6 0 obj\n<< /Type /XObject /Subtype /Form "
            f"/BBox [0 0 612 792] /Length {len(xobj_lzw)} "
            f"/Filter /LZWDecode >>\n".encode()
            + b"stream\n" + xobj_lzw + b"\nendstream\nendobj\n")
    offsets[7] = len(out)
    out += (f"7 0 obj\n<< /Type /ObjStm /N 4 /First {first} "
            f"/Length {len(objstm_z)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + objstm_z
            + b"\nendstream\nendobj\n")
    xref_off = len(out)
    entries = [(0, 0, 0xFFFF), (2, 7, 0), (2, 7, 1), (2, 7, 2),
               (2, 7, 3), (1, offsets[5], 0), (1, offsets[6], 0),
               (1, offsets[7], 0), (1, xref_off, 0)]
    # PNG Up predictor over W [1 4 2] rows (7 columns)
    rows = [t.to_bytes(1, "big") + f2.to_bytes(4, "big")
            + f3.to_bytes(2, "big") for t, f2, f3 in entries]
    pred = bytearray()
    prev = bytes(7)
    for row in rows:
        pred.append(2)
        pred += bytes((a - p) & 0xFF for a, p in zip(row, prev))
        prev = row
    xz = zlib.compress(bytes(pred))
    out += (f"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] "
            f"/DecodeParms << /Predictor 12 /Columns 7 >> "
            f"/Root 1 0 R /Length {len(xz)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + xz + b"\nendstream\nendobj\n")
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


PDF_GENERATORS["pdf_latex_style"] = pdf_latex_style
PDF_GENERATORS["pdf_word_style"] = pdf_word_style
PDF_GENERATORS["pdf_ghostscript_style"] = pdf_ghostscript_style


# ---------------------------------------------------------------------------
# Writer-profile wave 2 (VERDICT r4 item 7): scanned-image pages, AcroForm
# field text, multi-generation incremental updates with object shadowing,
# and pathological page trees.  All register in PDF_GENERATORS /
# ADVERSARIAL_GENERATORS so the differential-property, span-parity,
# subset-invariance and fuzz suites cover them automatically.
# ---------------------------------------------------------------------------


def pdf_scanned_image() -> bytes:
    """Scanner-profile fixture: the page is ONE full-page DCTDecode
    image XObject drawn via cm + Do with NO text operators anywhere.
    The reference recurses into EVERY XObject Do names (no /Subtype
    check, src/lib.rs:1860-1869), so the JPEG entropy bytes get
    tokenized as a content stream; none of them form text-showing
    sequences, so extraction yields EMPTY text — never an error.  The
    image is a real baseline JPEG (ops/codecs.encode_jpeg)."""
    import numpy as np

    from ..ops.codecs import encode_jpeg
    yy, xx = np.mgrid[0:44, 0:32]
    img = np.stack([(yy * 5) % 256, (xx * 7) % 256,
                    ((xx + yy) * 3) % 256], axis=2).astype(np.uint8)
    jpg = encode_jpeg(img)
    b = PdfBuilder()
    im = b.stream("<< /Type /XObject /Subtype /Image /Width 32 "
                  "/Height 44 /ColorSpace /DeviceRGB "
                  "/BitsPerComponent 8 /Filter /DCTDecode >>", jpg)
    cs = b.stream("<< >>", b"q 612 0 0 792 0 0 cm /Im0 Do Q")
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} "
                 f"/MediaBox [0 0 612 792] "
                 f"/Resources << /XObject << /Im0 {im} 0 R >> >> "
                 f"/Contents {cs} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>"
                  .encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(
        b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    return b.build(root)


def pdf_acroform_fields() -> bytes:
    """AcroForm fixture: page body text PLUS an interactive form whose
    text fields carry /V values and widget /AP appearance streams with
    their own Tj operators.  The reference walks PAGE CONTENT STREAMS
    only — field values and appearance streams are never drawn — so
    extraction must yield exactly the body text."""
    b = PdfBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 "
                 b"/BaseFont /Helvetica >>")
    ap = b.stream("<< /Type /XObject /Subtype /Form "
                  "/BBox [0 0 200 20] >>",
                  b"BT /F1 10 Tf 2 5 Td (FIELD APPEARANCE TEXT) Tj ET")
    field1 = b.add(f"<< /FT /Tx /T (name) /V (typed into field one) "
                   f"/Type /Annot /Subtype /Widget "
                   f"/Rect [72 600 272 620] "
                   f"/AP << /N {ap} 0 R >> >>".encode())
    field2 = b.add(b"<< /FT /Ch /T (color) /V (blue) "
                   b"/Opt [(red) (blue)] /Type /Annot /Subtype /Widget "
                   b"/Rect [72 560 272 580] >>")
    cs = b.stream("<< >>", b"BT /F1 12 Tf 72 700 Td "
                           b"(Visible body text only) Tj ET")
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} "
                 f"/MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {font} 0 R >> >> "
                 f"/Annots [{field1} 0 R {field2} 0 R] "
                 f"/Contents {cs} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>"
                  .encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(
        b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R "
                 f"/AcroForm << /Fields [{field1} 0 R {field2} 0 R] "
                 f"/NeedAppearances true >> >>".encode())
    return b.build(root)


def pdf_multigen_shadowing() -> bytes:
    """THREE-generation incremental update chain (PDF 7.5.6): gen 1 is
    a plain doc (text 'generation one', Info /Title (v1)); gen 2
    appends a replacement content stream ('generation two') with an
    xref whose /Prev points at gen 1; gen 3 appends BOTH another
    content replacement ('generation three') AND a shadowing Info
    object (/Title (v3)).  Newest xref wins per object: text must be
    'generation three', Title 'v3', and every untouched object must
    resolve through the two-step /Prev chain."""
    b = PdfBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 "
                 b"/BaseFont /Helvetica >>")
    cs = b.stream("<< >>", b"BT /F1 12 Tf 72 720 Td "
                           b"(generation one) Tj ET")
    page = b.add(f"<< /Type /Page /Parent {{PARENT}} "
                 f"/MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {font} 0 R >> >> "
                 f"/Contents {cs} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>"
                  .encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(
        b"{PARENT}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    info = b.add(b"<< /Title (v1) /Producer (gen1) >>")
    out = bytearray(b.build(root, info_num=info))
    size = len(b.bodies) + 1

    def append_gen(objs, prev_off):
        """objs: {num: body}; appends objects + xref subsections +
        trailer; returns new startxref offset."""
        offs = {}
        for num, body in sorted(objs.items()):
            offs[num] = len(out)
            out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")
        xref_off = len(out)
        out.extend(b"xref\n0 1\n0000000000 65535 f \n")
        for num in sorted(offs):
            out.extend(f"{num} 1\n{offs[num]:010d} 00000 n \n".encode())
        out.extend((f"trailer\n<< /Size {size} /Root {root} 0 R "
                    f"/Info {info} 0 R /Prev {prev_off} >>\n"
                    f"startxref\n{xref_off}\n%%EOF\n").encode())
        return xref_off

    def content_obj(text):
        data = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
        return (f"<< /Length {len(data)} >>".encode()
                + b"\nstream\n" + data + b"\nendstream")

    prev1 = int(out[out.rfind(b"startxref") + 9:out.rfind(b"%%EOF")]
                .strip())
    prev2 = append_gen({cs: content_obj("generation two")}, prev1)
    append_gen({cs: content_obj("generation three"),
                info: b"<< /Title (v3) /Producer (gen3) >>"}, prev2)
    return bytes(out)


def pdf_pagetree_cycle() -> bytes:
    """Pathological page tree with a CYCLE: the intermediate Pages
    node's /Kids contains the leaf page AND a back-reference to the
    root Pages node.  The walk must terminate (visited-set semantics),
    emit the page exactly once, and extract its text."""
    b = PdfBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 "
                 b"/BaseFont /Helvetica >>")
    cs = b.stream("<< >>", b"BT /F1 12 Tf 72 720 Td "
                           b"(cycle survivor) Tj ET")
    # object numbers fixed up manually: 3=page, 4=mid Pages, 5=root Pages
    page = b.add(f"<< /Type /Page /Parent 4 0 R "
                 f"/MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {font} 0 R >> >> "
                 f"/Contents {cs} 0 R >>".encode())
    mid = b.add(f"<< /Type /Pages /Parent 5 0 R "
                f"/Kids [{page} 0 R 5 0 R] /Count 1 >>".encode())
    top = b.add(f"<< /Type /Pages /Kids [{mid} 0 R] /Count 1 >>"
                .encode())
    assert (page, mid, top) == (3, 4, 5)
    root = b.add(f"<< /Type /Catalog /Pages {top} 0 R >>".encode())
    return b.build(root)


def pdf_pagetree_inherited() -> bytes:
    """Pathological page tree exercising ATTRIBUTE INHERITANCE and
    junk-Kids tolerance: /Resources and /MediaBox live ONLY on the
    root Pages node (the leaf page has neither, resolving both through
    two /Parent hops, src/lib.rs:2352-2362), and the /Kids arrays
    contain garbage entries (an integer, a string object reference)
    that the walk must skip."""
    b = PdfBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 "
                 b"/BaseFont /Helvetica >>")
    junk = b.add(b"(not a page)")
    cs = b.stream("<< >>", b"BT /F1 12 Tf 72 720 Td "
                           b"(inherited resources) Tj ET")
    page = b.add(f"<< /Type /Page /Parent {{MID}} "
                 f"/Contents {cs} 0 R >>".encode())
    mid = b.add(f"<< /Type /Pages /Parent {{TOP}} "
                f"/Kids [42 {junk} 0 R {page} 0 R] /Count 1 >>".encode())
    top = b.add(f"<< /Type /Pages /Kids [{mid} 0 R] /Count 1 "
                f"/MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> >>"
                .encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(
        b"{MID}", f"{mid} 0 R".encode())
    b.bodies[mid - 1] = b.bodies[mid - 1].replace(
        b"{TOP}", f"{top} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {top} 0 R >>".encode())
    return b.build(root)


PDF_GENERATORS["pdf_scanned_image"] = pdf_scanned_image
PDF_GENERATORS["pdf_acroform_fields"] = pdf_acroform_fields
ADVERSARIAL_GENERATORS["pdf_multigen_shadowing"] = pdf_multigen_shadowing
ADVERSARIAL_GENERATORS["pdf_pagetree_cycle"] = pdf_pagetree_cycle
ADVERSARIAL_GENERATORS["pdf_pagetree_inherited"] = pdf_pagetree_inherited
