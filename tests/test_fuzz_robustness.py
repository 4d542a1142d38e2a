"""Robustness: the engine must never hang or crash the process on
corrupted input — web-scale crawls are full of truncated/garbled files.
Any exception type is acceptable (the pipeline totalizes to error rows);
what's forbidden is non-exception failure."""
import pytest

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

from pdf_extract_ray.data.pdfgen import (pdf_identity_h, pdf_multipage,
                                         pdf_simple_helvetica,
                                         pdf_flate_xrefstream)
from pdf_extract_ray.engine import extract_text_from_mem

BASES = [
    pdf_simple_helvetica("fuzz base"),
    pdf_identity_h("fz"),
    pdf_multipage(2),
    pdf_flate_xrefstream("fz"),
]


def _try_extract(buf: bytes):
    try:
        out = extract_text_from_mem(buf)
        assert isinstance(out, str)
    except RecursionError:
        raise AssertionError("unbounded recursion on corrupt input")
    except Exception:
        pass  # any orderly failure is fine


if HAVE_HYPOTHESIS:
    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, len(BASES) - 1), st.data())
    def test_mutated_pdfs_fail_cleanly(base_idx, data):
        base = bytearray(BASES[base_idx])
        n_mut = data.draw(st.integers(1, 12))
        for _ in range(n_mut):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] = data.draw(st.integers(0, 255))
        _try_extract(bytes(base))

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, len(BASES) - 1), st.integers(0, 100))
    def test_truncated_pdfs_fail_cleanly(base_idx, pct):
        base = BASES[base_idx]
        _try_extract(base[:len(base) * pct // 100])

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=2048))
    def test_random_bytes_fail_cleanly(blob):
        _try_extract(b"%PDF-1.4\n" + blob)


def test_deep_xobject_recursion_bounded():
    """Self-referencing Do must not blow the stack: build an XObject whose
    content invokes itself."""
    from pdf_extract_ray.data.pdfgen import PdfBuilder
    b = PdfBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # xobject that Do's itself (resources reference the same xobject)
    xo = b.stream("<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] >>",
                  b"/X1 Do")
    content = b.stream("<< >>", b"/X1 Do BT /F1 12 Tf (t) Tj ET")
    page = b.add(f"<< /Type /Page /Parent {{P}} /MediaBox [0 0 612 792] "
                 f"/Resources << /Font << /F1 {f1} 0 R >> "
                 f"/XObject << /X1 {xo} 0 R >> >> "
                 f"/Contents {content} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [{page} 0 R] /Count 1 >>".encode())
    b.bodies[page - 1] = b.bodies[page - 1].replace(b"{P}", f"{pages} 0 R".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    _try_extract(b.build(root))


def test_cyclic_page_tree_bounded():
    from pdf_extract_ray.data.pdfgen import PdfBuilder
    b = PdfBuilder()
    # Pages node whose kid is itself
    pages = b.add(b"<< /Type /Pages /Kids [1 0 R] /Count 1 >>")
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    _try_extract(b.build(root))


def test_type1_fontfile_embedded_encoding():
    """Embedded Type1 font program /Encoding overrides (engine/type1.py)."""
    from pdf_extract_ray.data.pdfgen import PdfBuilder, _single_page
    prog = (b"%!PS-AdobeFont-1.0: Test\n"
            b"/FontName /TestT1 def\n"
            b"/Encoding 256 array\n"
            b"0 1 255 {1 index exch /.notdef put} for\n"
            b"dup 65 /eacute put\n"
            b"dup 66 /adieresis put\n"
            b"readonly def\n"
            b"currentdict end\ncurrentfile eexec\n" + b"\x00" * 32)
    b = PdfBuilder()
    ff = b.stream("<< /Length1 100 /Length2 32 /Length3 0 >>", prog)
    desc = b.add(f"<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
                 f"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
                 f"/Descent -200 /CapHeight 700 /StemV 80 "
                 f"/FontFile {ff} 0 R >>".encode())
    f1 = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
               f"/FirstChar 65 /LastChar 66 /Widths [500 500] "
               f"/FontDescriptor {desc} 0 R >>".encode())
    root = _single_page(b, {"F1": f1}, b"BT /F1 12 Tf 72 700 Td (AB) Tj ET")
    out = extract_text_from_mem(b.build(root))
    assert out == "\n\néä"


if HAVE_HYPOTHESIS:
    def _adversarial_bases():
        from pdf_extract_ray.data.pdfgen import ADVERSARIAL_GENERATORS
        return [gen() for gen in ADVERSARIAL_GENERATORS.values()]

    _ADV = _adversarial_bases()

    @settings(max_examples=120, deadline=None)
    @given(st.integers(0, 10**6), st.data())
    def test_mutated_adversarial_pdfs_fail_cleanly(seed, data):
        """Mutation fuzz over the round-2 adversarial corpus too —
        encrypted ObjStm, hybrid xref, embedded CMaps, incremental
        updates all carry their own parser paths."""
        base = bytearray(_ADV[seed % len(_ADV)])
        n_mut = data.draw(st.integers(1, 12))
        for _ in range(n_mut):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] = data.draw(st.integers(0, 255))
        _try_extract(bytes(base))

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10**6), st.integers(0, 100))
    def test_truncated_adversarial_pdfs_fail_cleanly(seed, pct):
        base = _ADV[seed % len(_ADV)]
        _try_extract(base[:len(base) * pct // 100])
