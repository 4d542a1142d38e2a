"""Minimal CFF (Compact Font Format) parser: enough to recover the
code -> glyph-name encoding of an embedded Type1C font program.

Python equivalent of the cff-parser crate usage at reference
src/lib.rs:406-442 (`Table::parse`, `encoding.get_code_to_sid_table`,
`string_by_id`), written from Adobe Tech Note #5176 (CFF spec).  Only the
structures needed for text extraction are parsed: header, INDEXes, Top
DICT (charset/Encoding offsets), charset, encoding, string INDEX.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .objects import PdfError

# CFF standard strings, SID 0..390 (spec Appendix A)
STANDARD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M N "
    "O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q r "
    "s t u v w x y z braceleft bar braceright asciitilde exclamdown cent "
    "sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash "
    "dagger daggerdbl periodcentered paragraph bullet quotesinglbase "
    "quotedblbase quotedblright guillemotright ellipsis perthousand "
    "questiondown grave acute circumflex tilde macron breve dotaccent "
    "dieresis ring cedilla hungarumlaut ogonek caron emdash AE "
    "ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash "
    "oe germandbls onesuperior logicalnot mu trademark Eth onehalf "
    "plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron "
    "exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior "
    "ampersandsmall Acutesmall parenleftsuperior parenrightsuperior "
    "twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle "
    "threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle "
    "eightoldstyle nineoldstyle commasuperior threequartersemdash "
    "periodsuperior questionsmall asuperior bsuperior centsuperior "
    "dsuperior esuperior isuperior lsuperior msuperior nsuperior osuperior "
    "rsuperior ssuperior tsuperior ff ffi ffl parenleftinferior "
    "parenrightinferior Circumflexsmall hyphensuperior Gravesmall Asmall "
    "Bsmall Csmall Dsmall Esmall Fsmall Gsmall Hsmall Ismall Jsmall "
    "Ksmall Lsmall Msmall Nsmall Osmall Psmall Qsmall Rsmall Ssmall "
    "Tsmall Usmall Vsmall Wsmall Xsmall Ysmall Zsmall colonmonetary "
    "onefitted rupiah Tildesmall exclamdownsmall centoldstyle Lslashsmall "
    "Scaronsmall Zcaronsmall Dieresissmall Brevesmall Caronsmall "
    "Dotaccentsmall Macronsmall figuredash hypheninferior Ogoneksmall "
    "Ringsmall Cedillasmall questiondownsmall oneeighth threeeighths "
    "fiveeighths seveneighths onethird twothirds zerosuperior "
    "foursuperior fivesuperior sixsuperior sevensuperior eightsuperior "
    "ninesuperior zeroinferior oneinferior twoinferior threeinferior "
    "fourinferior fiveinferior sixinferior seveninferior eightinferior "
    "nineinferior centinferior dollarinferior periodinferior "
    "commainferior Agravesmall Aacutesmall Acircumflexsmall Atildesmall "
    "Adieresissmall Aringsmall AEsmall Ccedillasmall Egravesmall "
    "Eacutesmall Ecircumflexsmall Edieresissmall Igravesmall Iacutesmall "
    "Icircumflexsmall Idieresissmall Ethsmall Ntildesmall Ogravesmall "
    "Oacutesmall Ocircumflexsmall Otildesmall Odieresissmall OEsmall "
    "Oslashsmall Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall "
    "Yacutesmall Thornsmall Ydieresissmall 001.000 001.001 001.002 "
    "001.003 Black Bold Book Light Medium Regular Roman Semibold"
).split()
assert len(STANDARD_STRINGS) == 391, len(STANDARD_STRINGS)


def _read_index(data: bytes, pos: int) -> Tuple[List[bytes], int]:
    """CFF INDEX -> (items, new_pos)."""
    if pos + 2 > len(data):
        raise PdfError("truncated CFF INDEX")
    count = int.from_bytes(data[pos:pos + 2], "big")
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise PdfError(f"bad CFF offSize {off_size}")
    offs = []
    for i in range(count + 1):
        offs.append(int.from_bytes(data[pos:pos + off_size], "big"))
        pos += off_size
    base = pos - 1
    items = []
    for i in range(count):
        items.append(data[base + offs[i]:base + offs[i + 1]])
    return items, base + offs[count]


def _parse_dict(data: bytes) -> Dict[int, list]:
    """CFF DICT: {op: operands}; two-byte ops keyed as 0xC00 | b2."""
    out: Dict[int, list] = {}
    operands: list = []
    pos = 0
    n = len(data)
    while pos < n:
        b0 = data[pos]
        if b0 <= 21:  # operator
            if b0 == 12:
                pos += 1
                op = 0xC00 | data[pos]
            else:
                op = b0
            out[op] = operands
            operands = []
            pos += 1
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            pos += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[pos + 1] + 108)
            pos += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[pos + 1] - 108)
            pos += 2
        elif b0 == 28:
            v = int.from_bytes(data[pos + 1:pos + 3], "big", signed=True)
            operands.append(v)
            pos += 3
        elif b0 == 29:
            v = int.from_bytes(data[pos + 1:pos + 5], "big", signed=True)
            operands.append(v)
            pos += 5
        elif b0 == 30:  # real: BCD nibbles
            pos += 1
            s = ""
            done = False
            while pos < n and not done:
                for nib in (data[pos] >> 4, data[pos] & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                pos += 1
            try:
                operands.append(float(s) if s else 0.0)
            except ValueError:
                operands.append(0.0)
        else:
            raise PdfError(f"bad CFF dict byte {b0}")
    return out


class CFFTable:
    def __init__(self, data: bytes):
        if len(data) < 4:
            raise PdfError("truncated CFF")
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        if not top_dicts:
            raise PdfError("CFF without Top DICT")
        top = _parse_dict(top_dicts[0])
        self.strings = strings
        self.charset_off = top.get(15, [0])[0]
        self.encoding_off = top.get(16, [0])[0]
        cs_off = top.get(17, [None])[0]
        if cs_off is None:
            raise PdfError("CFF without CharStrings")
        charstrings, _ = _read_index(data, int(cs_off))
        self.n_glyphs = len(charstrings)
        self.data = data

    def string_by_id(self, sid: int) -> Optional[str]:
        if sid < 391:
            return STANDARD_STRINGS[sid]
        i = sid - 391
        if i < len(self.strings):
            return self.strings[i].decode("latin-1")
        return None

    def charset(self) -> List[int]:
        """gid -> SID (gid 0 is always .notdef/SID 0)."""
        n = self.n_glyphs
        off = int(self.charset_off)
        if off == 0:  # ISOAdobe: identity SIDs
            return list(range(n))
        if off in (1, 2):  # Expert / ExpertSubset predefined: approximate
            return list(range(n))
        data = self.data
        fmt = data[off]
        sids = [0]
        pos = off + 1
        if fmt == 0:
            for _ in range(n - 1):
                sids.append(int.from_bytes(data[pos:pos + 2], "big"))
                pos += 2
        elif fmt in (1, 2):
            nleft_size = 1 if fmt == 1 else 2
            while len(sids) < n:
                first = int.from_bytes(data[pos:pos + 2], "big")
                pos += 2
                nleft = int.from_bytes(data[pos:pos + nleft_size], "big")
                pos += nleft_size
                for k in range(nleft + 1):
                    if len(sids) < n:
                        sids.append(first + k)
        else:
            raise PdfError(f"bad charset format {fmt}")
        return sids

    def code_to_gid(self) -> Dict[int, int]:
        """Encoding: char code -> gid."""
        off = int(self.encoding_off)
        if off in (0, 1):
            # predefined Standard/Expert encoding: resolved by name in
            # code_to_sid below
            return {}
        data = self.data
        fmt = data[off]
        out: Dict[int, int] = {}
        pos = off + 1
        base_fmt = fmt & 0x7F
        if base_fmt == 0:
            n_codes = data[pos]
            pos += 1
            for gid in range(1, n_codes + 1):
                out[data[pos]] = gid
                pos += 1
        elif base_fmt == 1:
            n_ranges = data[pos]
            pos += 1
            gid = 1
            for _ in range(n_ranges):
                first = data[pos]
                nleft = data[pos + 1]
                pos += 2
                for k in range(nleft + 1):
                    out[first + k] = gid
                    gid += 1
        else:
            raise PdfError(f"bad encoding format {fmt}")
        if fmt & 0x80:  # supplements
            n_sups = data[pos]
            pos += 1
            # supplements map code -> SID directly; approximate by skipping
            pos += 3 * n_sups
        return out

    def code_to_sid(self) -> Dict[int, int]:
        """char code -> SID (the crate's get_code_to_sid_table)."""
        charset = self.charset()
        off = int(self.encoding_off)
        if off in (0, 1):
            # predefined Standard (0) / Expert (1) encoding: code -> name
            # -> SID, limited to glyphs present in the charset
            from ..tables.encodings import EXPERT_ENCODING, STANDARD_ENCODING
            enc = STANDARD_ENCODING if off == 0 else EXPERT_ENCODING
            name_to_sid = {}
            for gid, sid in enumerate(charset):
                nm = self.string_by_id(sid)
                if nm is not None and nm not in name_to_sid:
                    name_to_sid[nm] = sid
            out = {}
            for code, nm in enumerate(enc):
                if nm is not None and nm in name_to_sid:
                    out[code] = name_to_sid[nm]
            return out
        out = {}
        for code, gid in self.code_to_gid().items():
            if 0 <= gid < len(charset):
                out[code] = charset[gid]
        return out


def parse_cff(data: bytes) -> CFFTable:
    return CFFTable(data)


def cff_code_to_names(data: bytes) -> Dict[int, str]:
    """char code -> glyph name for an embedded Type1C font."""
    t = parse_cff(data)
    out: Dict[int, str] = {}
    for code, sid in t.code_to_sid().items():
        nm = t.string_by_id(sid)
        if nm is not None:
            out[code] = nm
    return out
