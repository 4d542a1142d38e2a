"""Adversarial real-world-damage fixtures (round 2, VERDICT r1 next-round
#8): corrupted xref chains, hybrid-reference files, multi-byte non-Identity
CMaps with codespace holes, subset fonts with partial Widths.  Each anchors
a reference decode path (citations on the generators in data/pdfgen.py);
goldens freeze the engine's behavior WITHOUT touching the existing
test_golden_extract goldens (parity freeze).
"""
from pdf_extract_ray.data.pdfgen import (pdf_corrupt_startxref,
                                         pdf_embedded_cmap_multibyte,
                                         pdf_hybrid_xref,
                                         pdf_simple_helvetica,
                                         pdf_subset_no_widths,
                                         pdf_subset_partial_widths,
                                         pdf_truncated_xref)
from pdf_extract_ray.engine import extract_text_from_mem
from pdf_extract_ray.engine.api import get_metadata
from pdf_extract_ray.engine.document import Document
from pdf_extract_ray.engine.fonts import make_font
from pdf_extract_ray.engine.objects import maybe_get_obj


def _first_font(buf: bytes):
    doc = Document(buf)
    page = doc.get_object(doc.get_pages()[1])
    res = maybe_get_obj(doc, page, b"Resources")
    fonts = maybe_get_obj(doc, res, b"Font")
    (_name, ref), = fonts.items()
    return make_font(doc, maybe_get_obj(doc, fonts, _name))


class TestCorruptXref:
    def test_corrupt_startxref_recovers_identically(self):
        pristine = extract_text_from_mem(pdf_simple_helvetica("recovered text"))
        assert extract_text_from_mem(pdf_corrupt_startxref()) == pristine
        assert pristine == "\n\nrecovered text"

    def test_truncated_xref_table_recovers(self):
        pristine = extract_text_from_mem(pdf_simple_helvetica("truncated xref"))
        assert extract_text_from_mem(pdf_truncated_xref()) == pristine

    def test_corrupt_doc_metadata_still_works(self):
        m = get_metadata(pdf_corrupt_startxref())
        assert m["page_count"] == "1"

    def test_huge_xref_count_terminates(self):
        """A flipped digit can make a subsection claim 10^15 entries;
        the lenient token fallback must bail when the lexer stops
        advancing instead of spinning count times (regression: fuzz
        found an effectively-infinite loop here)."""
        import re
        import time
        base = pdf_simple_helvetica("huge count")
        # inflate the subsection count ("0 N\n" after the xref keyword)
        mutated = re.sub(rb"xref\r?\n0 (\d+)",
                         lambda m: b"xref\n0 " + m.group(1) + b"0" * 12,
                         base, count=1)
        assert mutated != base
        t0 = time.perf_counter()
        out = extract_text_from_mem(mutated)  # recovery path or error text
        assert time.perf_counter() - t0 < 30.0
        assert isinstance(out, str)

    def test_zero_width_xref_stream_terminates(self):
        """W=[0,0,0] makes the xref-stream entry cursor never advance —
        the parser must reject it (recovery scan still extracts)."""
        import time
        from pdf_extract_ray.data.pdfgen import pdf_flate_xrefstream
        base = pdf_flate_xrefstream("spin test")
        mutated = base.replace(b"/W [1 4 2]", b"/W [0 0 0]", 1)
        assert mutated != base
        t0 = time.perf_counter()
        out = extract_text_from_mem(mutated)
        assert time.perf_counter() - t0 < 30.0
        assert out == "\n\nspin test"  # recovery scan repairs it


class TestHybridXref:
    def test_font_resolved_via_xrefstm(self):
        # the classic table marks the font object free; only the /XRefStm
        # xref stream maps it — text decodes only if that path works
        assert extract_text_from_mem(pdf_hybrid_xref()) == "\n\nhybrid xref doc"

    def test_classic_entries_still_used(self):
        doc = Document(pdf_hybrid_xref())
        assert doc.get_pages()  # page tree comes from the classic table
        assert extract_text_from_mem(pdf_hybrid_xref("two words")) == "\n\ntwo words"


class TestEmbeddedCMap:
    def test_mixed_width_codespace(self):
        # 1-byte codes 41 42 43 -> 'Mix', 2-byte 8140 8141 -> 'ed';
        # hole byte 0x80 0x20 has no codespace match at widths 1..4 so the
        # remaining (otherwise decodable) codes are dropped
        assert extract_text_from_mem(pdf_embedded_cmap_multibyte()) == "\n\nMixed"

    def test_cid_widths_from_w_list(self):
        font = _first_font(pdf_embedded_cmap_multibyte())
        assert font.get_width(0x8140) == 500.0
        assert font.get_width(0x8141) == 500.0
        assert font.get_width(0x41) == 600.0  # DW fallback

    def test_greedy_match_consumes_two_bytes(self):
        font = _first_font(pdf_embedded_cmap_multibyte())
        codes = list(font.char_codes(bytes([0x41, 0x81, 0x40])))
        assert codes == [(0x41, 1), (0x8140, 2)]
        # hole: lead byte 0x80 never matches any width -> decode ends
        assert list(font.char_codes(bytes([0x80, 0x20, 0x41]))) == []


class TestSubsetFonts:
    def test_partial_widths_text(self):
        assert extract_text_from_mem(pdf_subset_partial_widths()) == "\n\nABCD"

    def test_partial_widths_map(self):
        font = _first_font(pdf_subset_partial_widths())
        assert font.get_width(65) == 600.0
        assert font.get_width(66) == 0.0    # explicit 0 in Widths
        assert font.get_width(67) == 650.0
        assert font.get_width(68) == 250.0  # outside range -> MissingWidth

    def test_no_widths_empty_map_quirk(self):
        # 'ABCDEF+Helvetica' is not a core-font name (no prefix stripping,
        # ref src/lib.rs:586-655): substitution looks up metrics by the
        # ORIGINAL name, finds none, leaves the width map empty
        font = _first_font(pdf_subset_no_widths())
        assert font.widths == {}
        assert font.get_width(65) == 0.0  # MissingWidth default 0

    def test_no_widths_text_still_decodes(self):
        assert extract_text_from_mem(pdf_subset_no_widths()) == "\n\nno widths here"


class TestType3CharProcs:
    """VERDICT r1 verify item #3: the reference never reads CharProcs
    d0/d1 — Type3 advances come from the Widths array only
    (src/lib.rs:692-765).  A glyph proc declaring a CONFLICTING d0 width
    must not change text or span positions."""

    @staticmethod
    def _make(glyph_stream: bytes) -> bytes:
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        glyph = b.stream("<< >>", glyph_stream)
        enc = b.add(b"<< /Type /Encoding /Differences [97 /a /b /c] >>")
        f1 = b.add(f"<< /Type /Font /Subtype /Type3 /FontBBox [0 0 750 750] "
                   f"/FontMatrix [0.001 0 0 0.001 0 0] "
                   f"/CharProcs << /a {glyph} 0 R /b {glyph} 0 R "
                   f"/c {glyph} 0 R >> "
                   f"/Encoding {enc} 0 R /FirstChar 97 /LastChar 99 "
                   f"/Widths [750 750 750] >>".encode())
        content = b"BT /F1 12 Tf 72 700 Td (abc) Tj ET"
        root = _single_page(b, {"F1": f1}, content)
        return b.build(root)

    def test_d0_in_charproc_ignored(self):
        from pdf_extract_ray.engine.api import extract_text_and_spans_from_mem
        plain = self._make(b"0 0 750 750 re f")
        with_d0 = self._make(b"999 0 d0 0 0 750 750 re f")
        t1, s1 = extract_text_and_spans_from_mem(plain)
        t2, s2 = extract_text_and_spans_from_mem(with_d0)
        assert t1 == t2 == "\n\nabc"
        assert s1 == s2  # positions driven by Widths, never by d0

    def test_d1_in_charproc_ignored(self):
        from pdf_extract_ray.engine.api import extract_text_and_spans_from_mem
        plain = self._make(b"0 0 750 750 re f")
        with_d1 = self._make(b"999 0 0 0 750 750 d1 0 0 750 750 re f")
        assert (extract_text_and_spans_from_mem(plain)
                == extract_text_and_spans_from_mem(with_d1))


class TestIncrementalUpdate:
    def test_newest_xref_section_wins(self):
        from pdf_extract_ray.data.pdfgen import pdf_incremental_update
        # the appended update rewrites the content stream; the /Prev chain
        # must resolve every untouched object while the new xref overrides
        # the rewritten one (first-seen-wins over chain traversal order)
        assert extract_text_from_mem(pdf_incremental_update()) \
            == "\n\nupdated text"

    def test_prev_chain_still_resolves_untouched_objects(self):
        from pdf_extract_ray.data.pdfgen import pdf_incremental_update
        m = get_metadata(pdf_incremental_update("a", "b"))
        assert m["page_count"] == "1"  # page tree lives in the ORIGINAL body


class TestEncryptedObjStm:
    def test_aes_doc_with_objects_in_object_stream(self):
        """Real-world modern layout: AES-128 doc whose page tree lives in
        an encrypted ObjStm.  The container decrypts exactly once; inner
        objects carry no per-object crypt (spec 7.5.7).  This was a real
        bug: _load_objstm decompressed ciphertext before round 2."""
        from pdf_extract_ray.data.pdfgen import pdf_aes128_objstm
        assert extract_text_from_mem(pdf_aes128_objstm()) \
            == "\n\nobjstm aes secret"

    def test_metadata_via_encrypted_objstm(self):
        from pdf_extract_ray.data.pdfgen import pdf_aes128_objstm
        assert get_metadata(pdf_aes128_objstm())["page_count"] == "1"

    def test_encrypted_and_corrupt_startxref_combo(self):
        """VERDICT r2 #5: a doc that is BOTH xref-corrupted and
        encrypted (catalog inside an encrypted ObjStm).  Recovery scans
        object headers, harvests Root/Encrypt/ID from the xref STREAM,
        and the ObjStm members index only after decrypt installs the
        file key — output must equal the clean encrypted path."""
        from pdf_extract_ray.data.pdfgen import (
            pdf_aes128_objstm, pdf_encrypted_corrupt_startxref)
        pristine = extract_text_from_mem(pdf_aes128_objstm())
        assert extract_text_from_mem(pdf_encrypted_corrupt_startxref()) \
            == pristine == "\n\nobjstm aes secret"


def test_output_doc_encrypted_api():
    """Public-API parity: output_doc_encrypted = decrypt + device run
    (src/lib.rs:2364-2372)."""
    from pdf_extract_ray.data.pdfgen import pdf_aes128_objstm
    from pdf_extract_ray.engine import output_doc_encrypted
    from pdf_extract_ray.engine.devices import PlainTextOutput
    from pdf_extract_ray.engine.document import Document
    doc = Document(pdf_aes128_objstm())
    dev = PlainTextOutput()
    output_doc_encrypted(doc, dev, "")
    assert dev.get_text() == "\n\nobjstm aes secret"


class TestRecoveryXrefStream:
    """Recovery on xref-STREAM layouts: no classic `trailer` keyword
    exists, so the scan must harvest Root/Encrypt/ID from /Type /XRef
    stream dicts; encrypted ObjStms re-index after the file key exists."""

    @staticmethod
    def _break(raw: bytes) -> bytes:
        idx = raw.rfind(b"startxref")
        return raw[:idx] + b"startxref\n42\n%%EOF\n"

    def test_plain_xrefstream_recovery(self):
        from pdf_extract_ray.data.pdfgen import pdf_flate_xrefstream
        raw = pdf_flate_xrefstream("xrefstream recovery")
        assert extract_text_from_mem(self._break(raw)) \
            == extract_text_from_mem(raw)

    def test_encrypted_objstm_recovery(self):
        # hardest combo: broken startxref + AES + page tree in an
        # encrypted ObjStm: recovery finds the Encrypt ref in the XRef
        # stream dict, decrypt re-indexes the ObjStm interior
        from pdf_extract_ray.data.pdfgen import pdf_aes128_objstm
        raw = pdf_aes128_objstm()
        assert extract_text_from_mem(self._break(raw)) \
            == "\n\nobjstm aes secret"


class TestMetadataAndUnicode:
    def test_astral_tounicode_surrogate_pair(self):
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        cps = "\U0001F600".encode("utf-16-be").hex()
        cmap = (b"1 begincodespacerange <00> <FF> endcodespacerange\n"
                b"1 beginbfchar\n<41> <" + cps.encode() + b">\nendbfchar\n")
        cm = b.stream("<< >>", cmap)
        f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                   f"/ToUnicode {cm} 0 R >>".encode())
        root = _single_page(b, {"F1": f1},
                            b"BT /F1 12 Tf 72 700 Td (A) Tj ET")
        assert "\U0001F600" in extract_text_from_mem(b.build(root))

    def test_utf16be_info_strings(self):
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        title = b"\xfe\xff" + "Tïtlé ☃".encode("utf-16-be")
        esc = bytearray()
        for c in title:
            if c in b"()\\":
                esc += b"\\" + bytes([c])
            elif 32 <= c < 127:
                esc.append(c)
            else:
                esc += f"\\{c:03o}".encode()
        info = b.add(b"<< /Title (" + bytes(esc) + b") /Author (Plain Name) >>")
        root = _single_page(b, {"F1": f1},
                            b"BT /F1 12 Tf 72 700 Td (x) Tj ET")
        m = get_metadata(b.build(root, info_num=info))
        assert m["Title"] == "Tïtlé ☃"
        assert m["Author"] == "Plain Name"


class TestDeepPageTree:
    def test_100k_deep_tree_no_recursion_error(self):
        """One page at the bottom of a pathologically deep Pages chain:
        iterative DFS must survive where recursion would blow the stack."""
        depth = 100_000
        out = bytearray(b"%PDF-1.4\n")
        offsets = {}
        n_font = depth + 3
        n_content = depth + 4
        # object 1 = catalog, 2..depth+1 = Pages chain, depth+2 = page
        offsets[1] = len(out)
        out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        for i in range(2, depth + 2):
            offsets[i] = len(out)
            kid = i + 1
            out += (f"{i} 0 obj\n<< /Type /Pages /Kids [{kid} 0 R] "
                    f"/Count 1 /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {n_font} 0 R >> >> "
                    f">>\nendobj\n").encode()
        offsets[depth + 2] = len(out)
        out += (f"{depth + 2} 0 obj\n<< /Type /Page /Parent {depth + 1} 0 R "
                f"/Contents {n_content} 0 R >>\nendobj\n").encode()
        offsets[n_font] = len(out)
        out += (f"{n_font} 0 obj\n<< /Type /Font /Subtype /Type1 "
                f"/BaseFont /Helvetica >>\nendobj\n").encode()
        data = b"BT /F1 12 Tf 72 700 Td (deep) Tj ET"
        offsets[n_content] = len(out)
        out += (f"{n_content} 0 obj\n<< /Length {len(data)} >>\n".encode()
                + b"stream\n" + data + b"\nendstream\nendobj\n")
        xref_off = len(out)
        n = n_content + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for i in range(1, n):
            out += f"{offsets[i]:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {n} /Root 1 0 R >>\n"
                f"startxref\n{xref_off}\n%%EOF\n").encode()
        assert extract_text_from_mem(bytes(out)) == "\n\ndeep"


class TestFontEdgeCases:
    def test_widths_as_indirect_reference(self):
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        w = b.add(b"[500 500 500]")
        f1 = b.add(f"<< /Type /Font /Subtype /TrueType /BaseFont /Custom "
                   f"/FirstChar 65 /LastChar 67 /Widths {w} 0 R >>".encode())
        root = _single_page(b, {"F1": f1},
                            b"BT /F1 12 Tf 72 700 Td (ABC) Tj ET")
        assert extract_text_from_mem(b.build(root)) == "\n\nABC"

    def test_identity_v_cid(self):
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        bfchars = [f"<{0x0100 + i:04x}> <{ord(c):04x}>"
                   for i, c in enumerate("Vert")]
        cmap_txt = ("1 begincodespacerange <0000> <ffff> "
                    "endcodespacerange\n"
                    f"{len(bfchars)} beginbfchar\n" + "\n".join(bfchars)
                    + "\nendbfchar\n").encode()
        cm = b.stream("<< >>", cmap_txt)
        desc = b.add(b"<< /Type /FontDescriptor /FontName /VFont /Flags 4 "
                     b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                     b"/Descent -200 /CapHeight 700 /StemV 80 >>")
        cid = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
                    f"/VFont /CIDSystemInfo << /Registry (Adobe) "
                    f"/Ordering (Identity) /Supplement 0 >> "
                    f"/FontDescriptor {desc} 0 R /DW 600 >>".encode())
        f1 = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /VFont "
                   f"/Encoding /Identity-V /DescendantFonts [{cid} 0 R] "
                   f"/ToUnicode {cm} 0 R >>".encode())
        hexstr = "".join(f"{0x0100 + i:04x}" for i in range(4))
        root = _single_page(
            b, {"F1": f1},
            f"BT /F1 12 Tf 72 700 Td <{hexstr}> Tj ET".encode())
        assert extract_text_from_mem(b.build(root)) == "\n\nVert"

    def test_out_of_range_differences_fails_cleanly(self):
        # reference panics on table[300]; we raise (IndexError) — any
        # orderly exception totalizes to an error row in the pipeline
        import pytest as _pytest
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        b = PdfBuilder()
        enc = b.add(b"<< /Type /Encoding /Differences [300 /eacute] >>")
        f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                   f"/Encoding {enc} 0 R >>".encode())
        root = _single_page(b, {"F1": f1},
                            b"BT /F1 12 Tf 72 700 Td (hi) Tj ET")
        with _pytest.raises(Exception):
            extract_text_from_mem(b.build(root))


class TestInlineImages:
    """BI/ID/EI skipping: uncompressed images compute the exact data
    length from the dict (spec 8.9.7 byte-aligned rows), so binary bytes
    spelling ' EI ' cannot truncate the skip; filtered images use the
    delimited-EI scan."""

    @staticmethod
    def _make(img_dict: bytes, img_data: bytes) -> bytes:
        from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
        content = (b"BT /F1 12 Tf 72 700 Td (before) Tj ET\n"
                   b"BI " + img_dict + b" ID " + img_data + b" EI\n"
                   b"BT /F1 12 Tf 72 650 Td (after) Tj ET")
        b = PdfBuilder()
        f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        root = _single_page(b, {"F1": f1}, content)
        return b.build(root)

    def test_fake_ei_inside_uncompressed_data(self):
        data = bytes(range(21)) + b" EI " + bytes(range(64, 87))  # 48 B
        out = extract_text_from_mem(
            self._make(b"/W 4 /H 4 /CS /RGB /BPC 8", data))
        assert out == "\n\nbefore\n\nafter"

    def test_image_mask_one_bpc(self):
        out = extract_text_from_mem(
            self._make(b"/W 4 /H 4 /IM true", b"\xff\x00\x01\x02"))
        assert "before" in out and "after" in out

    def test_filtered_image_falls_back_to_scan(self):
        import zlib
        out = extract_text_from_mem(self._make(
            b"/W 4 /H 4 /CS /RGB /BPC 8 /F /Fl", zlib.compress(bytes(48))))
        assert "before" in out and "after" in out

    def test_long_form_keys(self):
        data = bytes(range(21)) + b" EI " + bytes(range(64, 87))
        out = extract_text_from_mem(self._make(
            b"/Width 4 /Height 4 /ColorSpace /DeviceRGB "
            b"/BitsPerComponent 8", data))
        assert out == "\n\nbefore\n\nafter"


def test_form_xobject_matrix_ignored_quirk():
    """The reference's `Do` never applies the form's /Matrix or clips to
    /BBox (src/lib.rs:1860-1869) — positions must be identical with and
    without a scaling Matrix.  Parity freeze, don't 'fix'."""
    from pdf_extract_ray.data.pdfgen import PdfBuilder
    from pdf_extract_ray.engine.api import extract_text_and_spans_from_mem

    def make(matrix: bytes) -> bytes:
        b = PdfBuilder()
        f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        xo_content = b"BT /F1 10 Tf 72 650 Td (inner) Tj ET"
        mat = (" /Matrix " + matrix.decode()) if matrix else ""
        xo = b.stream("<< /Type /XObject /Subtype /Form "
                      "/BBox [0 0 612 792]" + mat + " >>", xo_content)
        content_num = b.stream("<< >>", b"/X1 Do")
        page = b.add(f"<< /Type /Page /Parent {{P}} /MediaBox [0 0 612 792] "
                     f"/Resources << /Font << /F1 {f1} 0 R >> "
                     f"/XObject << /X1 {xo} 0 R >> >> "
                     f"/Contents {content_num} 0 R >>".encode())
        pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>"
                      .encode())
        b.bodies[page - 1] = b.bodies[page - 1].replace(
            b"{P}", f"{pages} 0 R".encode())
        root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
        return b.build(root)

    assert extract_text_and_spans_from_mem(make(b"")) \
        == extract_text_and_spans_from_mem(make(b"[2 0 0 2 50 50]"))


class TestWriterProfilesWave2:
    """VERDICT r4 item 7: scanned-image pages, AcroForm text,
    multi-generation shadowing, pathological page trees."""

    def test_scanned_image_empty_not_error(self):
        from pdf_extract_ray.data.pdfgen import pdf_scanned_image
        from pdf_extract_ray.engine.api import (extract_text_from_mem,
                                                get_metadata)
        data = pdf_scanned_image()
        assert extract_text_from_mem(data) == ""
        assert get_metadata(data)["page_count"] == "1"

    def test_image_do_skip_only_for_images(self):
        # the /Subtype /Image skip must NOT affect Form XObjects
        from pdf_extract_ray.data.pdfgen import pdf_xobject_form
        from pdf_extract_ray.engine.api import extract_text_from_mem
        assert extract_text_from_mem(pdf_xobject_form()) \
            == "\n\nouter\n\nfrom xobject"

    def test_acroform_values_do_not_leak(self):
        from pdf_extract_ray.data.pdfgen import pdf_acroform_fields
        from pdf_extract_ray.engine.api import extract_text_from_mem
        txt = extract_text_from_mem(pdf_acroform_fields())
        assert txt == "\n\nVisible body text only"
        assert "typed into field" not in txt
        assert "FIELD APPEARANCE" not in txt

    def test_multigen_newest_generation_wins(self):
        from pdf_extract_ray.data.pdfgen import pdf_multigen_shadowing
        from pdf_extract_ray.engine.api import (extract_text_from_mem,
                                                get_metadata)
        data = pdf_multigen_shadowing()
        assert extract_text_from_mem(data) == "\n\ngeneration three"
        meta = get_metadata(data)
        assert meta["Title"] == "v3"
        assert meta["Producer"] == "gen3"

    def test_multigen_truncated_to_gen2_reads_gen2(self):
        # chopping the file at the end of generation 2 must yield the
        # gen-2 view — evidence the /Prev chain actually resolves
        from pdf_extract_ray.data.pdfgen import pdf_multigen_shadowing
        from pdf_extract_ray.engine.api import (extract_text_from_mem,
                                                get_metadata)
        data = pdf_multigen_shadowing()
        second_eof = data.find(b"%%EOF", data.find(b"%%EOF") + 1)
        gen2 = data[:second_eof + 6]
        assert extract_text_from_mem(gen2) == "\n\ngeneration two"
        assert get_metadata(gen2)["Title"] == "v1"

    def test_pagetree_cycle_terminates_single_page(self):
        from pdf_extract_ray.data.pdfgen import pdf_pagetree_cycle
        from pdf_extract_ray.engine.api import (extract_text_from_mem,
                                                extract_text_from_mem_by_pages)
        assert extract_text_from_mem(pdf_pagetree_cycle()) \
            == "\n\ncycle survivor"
        pages = extract_text_from_mem_by_pages(pdf_pagetree_cycle())
        assert len(pages) == 1  # the cycle must not duplicate the page

    def test_pagetree_inheritance_and_junk_kids(self):
        from pdf_extract_ray.data.pdfgen import pdf_pagetree_inherited
        from pdf_extract_ray.engine.api import extract_text_from_mem
        assert extract_text_from_mem(pdf_pagetree_inherited()) \
            == "\n\ninherited resources"
