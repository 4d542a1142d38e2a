"""Unit tests for the engine sub-operators (SURVEY.md §5 plan, item 1)."""
import math

import pytest

from pdf_extract_ray.engine.cmap import get_byte_mapping, get_unicode_map_raw
from pdf_extract_ray.engine.content import parse_content
from pdf_extract_ray.engine.devices import PlainTextOutput
from pdf_extract_ray.engine.interpreter import (IDENTITY, mul, translation,
                                                transform_vector)
from pdf_extract_ray.engine.lexer import Lexer
from pdf_extract_ray.engine.objects import (Name, PdfString, Ref, f32,
                                            pdf_to_utf8, to_utf8)
from pdf_extract_ray.tables.encodings import (MAC_ROMAN_ENCODING,
                                              WIN_ANSI_ENCODING)
from pdf_extract_ray.tables.glyphnames import GLYPH_NAME_TO_UNICODE
from pdf_extract_ray.tables.pdfdoc import PDFDOC_ENCODING
from pdf_extract_ray.tables.zapf import ZAPF_NAME_TO_UNICODE


class TestTables:
    def test_encoding_spot_checks(self):
        # FIXTURES.md §F5 anchors
        assert WIN_ANSI_ENCODING[0x93] == "quotedblleft"
        assert GLYPH_NAME_TO_UNICODE["quotedblleft"] == 0x201C
        assert MAC_ROMAN_ENCODING[0xA5] == "bullet"
        assert GLYPH_NAME_TO_UNICODE["fi"] == 0xFB01
        assert ZAPF_NAME_TO_UNICODE["a10"] == 0x2721
        assert PDFDOC_ENCODING[0x18] == 0x02D8  # breve
        assert PDFDOC_ENCODING[ord("A")] == ord("A")

    def test_pdfdoc_decode(self):
        assert pdf_to_utf8(b"Hello") == "Hello"
        # UTF-16BE BOM path
        assert pdf_to_utf8(b"\xfe\xff\x00H\x00i") == "Hi"
        # len > 2 check is strict: a bare BOM is table-decoded
        assert to_utf8(PDFDOC_ENCODING, b"\xfe\xff") == "þÿ"


class TestLexer:
    def parse(self, data, **kw):
        return Lexer(data).parse_object(**kw)

    def test_numbers(self):
        assert self.parse(b"42") == 42
        assert self.parse(b"-17") == -17
        assert self.parse(b"+3") == 3
        assert self.parse(b"3.14") == f32(3.14)
        assert self.parse(b".5") == 0.5
        assert self.parse(b"-.25") == -0.25

    def test_real_is_f32(self):
        # lopdf parses reals as f32; 0.1 is not representable
        v = self.parse(b"0.1")
        assert v != 0.1 and abs(v - 0.1) < 1e-8

    def test_strings(self):
        assert self.parse(rb"(simple)") == b"simple"
        assert self.parse(rb"(with (nested) parens)") == b"with (nested) parens"
        assert self.parse(rb"(esc \n\t\\\(\))") == b"esc \n\t\\()"
        assert self.parse(rb"(octal \101\12\1)") == b"octal A\n\x01"
        assert self.parse(b"(line\\\ncont)") == b"linecont"

    def test_hex_strings(self):
        assert self.parse(b"<48656C6C6F>") == b"Hello"
        assert self.parse(b"<4 86 56C6C 6F>") == b"Hello"
        assert self.parse(b"<484>") == b"H@"  # odd digit pads 0

    def test_names(self):
        assert self.parse(b"/Name") == b"Name"
        assert isinstance(self.parse(b"/Name"), Name)
        assert self.parse(b"/A#20B") == b"A B"
        assert self.parse(b"/Lime#20Green") == b"Lime Green"

    def test_arrays_dicts_refs(self):
        assert self.parse(b"[1 2 /X (s)]") == [1, 2, b"X", b"s"]
        d = self.parse(b"<< /A 1 /B [2 3] /C << /D 4 >> >>")
        assert d == {b"A": 1, b"B": [2, 3], b"C": {b"D": 4}}
        assert self.parse(b"12 0 R") == Ref(12, 0)
        assert self.parse(b"12 0 R", allow_ref=False) == 12
        # number followed by non-R token stays a number
        lx = Lexer(b"12 0 obj")
        assert lx.parse_object() == 12

    def test_comments_and_ws(self):
        assert self.parse(b"% comment\n  42") == 42


class TestContent:
    def test_basic_ops(self):
        ops = parse_content(b"BT /F1 12 Tf 72 720 Td (Hi) Tj ET")
        assert [o[0] for o in ops] == ["BT", "Tf", "Td", "Tj", "ET"]
        assert ops[1][1] == [b"F1", 12]
        assert ops[3][1] == [b"Hi"]
        assert isinstance(ops[3][1][0], PdfString)

    def test_tj_array(self):
        ops = parse_content(b"[(A) -120 (B) 250.5 (C)] TJ")
        arr = ops[0][1][0]
        assert arr[0] == b"A" and arr[1] == -120
        assert arr[3] == f32(250.5)

    def test_inline_image_skipped(self):
        data = (b"q BI /W 2 /H 2 /CS /RGB /BPC 8 ID \x00\x01\x02EI Q "
                b"BT (x) Tj ET")
        ops = parse_content(data)
        names = [o[0] for o in ops]
        assert "BI" not in names and "Tj" in names

    def test_unknown_ops_kept(self):
        ops = parse_content(b"1 0 0 1 0 0 cm 0.5 g")
        assert [o[0] for o in ops] == ["cm", "g"]


class TestCMap:
    def test_bfchar_bfrange(self):
        data = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
                b"2 beginbfchar <41> <0041> <43> <2603> endbfchar\n"
                b"1 beginbfrange <50> <52> <0061> endbfrange\n")
        m = get_unicode_map_raw(data)
        assert m[0x41] == b"\x00\x41"
        assert m[0x43] == b"\x26\x03"
        assert m[0x50] == b"\x00\x61"
        assert m[0x51] == b"\x00\x62"
        assert m[0x52] == b"\x00\x63"

    def test_bfrange_array_dst(self):
        data = b"1 beginbfrange <01> <02> [<0058> <0059>] endbfrange"
        m = get_unicode_map_raw(data)
        assert m[1] == b"\x00X" and m[2] == b"\x00Y"

    def test_byte_mapping(self):
        data = (b"2 begincodespacerange <00> <80> <8140> <9FFC> "
                b"endcodespacerange\n"
                b"1 begincidrange <8140> <9FFC> 633 endcidrange\n")
        bm = get_byte_mapping(data)
        widths = sorted({r.width for r in bm.codespace})
        assert widths == [1, 2]
        assert bm.cid[0].src_code_lo == 0x8140
        assert bm.cid[0].dst_cid_lo == 633


class TestTransforms:
    def test_mul_order(self):
        t = mul(translation(10, 20), (2.0, 0.0, 0.0, 2.0, 0.0, 0.0))
        # translate then scale: (0,0) -> (20, 40)
        assert t[4] == 20 and t[5] == 40

    def test_vector_ignores_translation(self):
        m = (1.0, 0.0, 0.0, 1.0, 100.0, 200.0)
        assert transform_vector(m, 12, 12) == (12.0, 12.0)


class TestPlainTextHeuristics:
    """The three thresholds at reference src/lib.rs:2169-2182, driven by
    synthetic char events (FIXTURES.md §F5)."""

    def emit(self, events, media_box=(0, 0, 612, 792)):
        dev = PlainTextOutput()
        dev.begin_page(1, media_box, None)
        for word in events:
            dev.begin_word()
            for (x, y, width, fs, ch) in word:
                trm = (fs, 0.0, 0.0, fs, x, 792.0 - y)  # pre-flipped y
                dev.output_character(trm, width, 0.0, 1.0, ch)
            dev.end_word()
        dev.end_page()
        return dev.get_text()

    def test_same_line_no_separator(self):
        out = self.emit([[(72, 72, 0.5, 12, "A")], [(78, 72, 0.5, 12, "B")]])
        # gap 0 -> no space (78 == last_end 72+6)
        assert out.endswith("AB")

    def test_space_on_gap(self):
        out = self.emit([[(72, 72, 0.5, 12, "A")], [(81, 72, 0.5, 12, "B")]])
        # 81 > 78 + 1.2 -> space
        assert out.endswith("A B")

    def test_newline_on_large_y_jump(self):
        out = self.emit([[(72, 72, 0.5, 12, "A")], [(72, 110, 0.5, 12, "B")]])
        assert out.endswith("A\n\nB")  # both y-rules fire (left + >1.5x)

    def test_small_y_jump_same_column_no_newline(self):
        out = self.emit([[(72, 72, 0.5, 12, "A")], [(90, 75, 0.5, 12, "B")]])
        # dy=3 < 18, moved right -> space only (x > last_end + 1.2)
        assert out.endswith("A B")

    def test_first_char_only_at_word_start(self):
        out = self.emit([[(72, 72, 0.5, 12, "A"), (500, 300, 0.5, 12, "B")]])
        # second char of the same word: no separators ever inserted
        assert out.endswith("AB")


class TestSqrtNan:
    def test_negative_area_is_nan_not_crash(self):
        dev = PlainTextOutput()
        dev.begin_page(1, (0, 0, 612, 792), None)
        dev.begin_word()
        # mirrored transform -> tx*ty < 0 -> Rust sqrt gives NaN
        trm = (-12.0, 0.0, 0.0, 12.0, 72.0, 720.0)
        dev.output_character(trm, 0.5, 0.0, 1.0, "A")
        dev.end_word()
        assert dev.get_text() == "A"


class TestFunctions:
    def test_type2_exponential(self):
        from pdf_extract_ray.engine.functions import make_function
        d = {b"FunctionType": 2, b"C0": [0.0], b"C1": [1.0], b"N": 1}
        f = make_function(None, d)
        assert f.eval([0.5]) == [0.5]
        d2 = {b"FunctionType": 2, b"N": 2}
        assert make_function(None, d2).eval([0.5]) == [0.25]

    def test_type0_sampled(self):
        from pdf_extract_ray.engine.functions import make_function
        from pdf_extract_ray.engine.objects import Stream
        s = Stream({b"FunctionType": 0, b"Domain": [0, 1], b"Range": [0, 1],
                    b"Size": [2], b"BitsPerSample": 8, b"Length": 2},
                   bytes([0, 255]))
        f = make_function(None, s)
        assert f.eval([0.0]) == [0.0]
        assert f.eval([1.0]) == [1.0]

    def test_missing_keys_raise(self):
        import pytest as _pytest
        from pdf_extract_ray.engine.functions import make_function
        from pdf_extract_ray.engine.objects import PdfError
        with _pytest.raises(PdfError):
            make_function(None, {b"FunctionType": 2})  # no N
        with _pytest.raises(PdfError):
            make_function(None, {b"FunctionType": 0})  # type0 not a stream
        with _pytest.raises(PdfError):
            make_function(None, {b"FunctionType": 9})

    def test_separation_colorspace_builds_function(self):
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        from pdf_extract_ray.engine import extract_text_from_mem
        b = PdfBuilder()
        f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        content = (b"/Sep1 cs 1 scn BT /F1 12 Tf 72 700 Td (sep) Tj ET")
        content_num = b.stream("<< >>", content)
        tint = b.add(b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] "
                     b"/C1 [1 1 1] /N 1 >>")
        page = b.add(f"<< /Type /Page /Parent {{P}} /MediaBox [0 0 612 792] "
                     f"/Resources << /Font << /F1 {f1} 0 R >> "
                     f"/ColorSpace << /Sep1 [/Separation /Spot1 /DeviceRGB "
                     f"{tint} 0 R] >> >> /Contents {content_num} 0 R >>".encode())
        pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
        b.bodies[page - 1] = b.bodies[page - 1].replace(b"{P}", f"{pages} 0 R".encode())
        root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
        assert extract_text_from_mem(b.build(root)) == "\n\nsep"
