"""Pure-Python PDF text-extraction engine (reference-parity core).

The per-row `bytes -> text` transform that the Ray Data pipeline maps over
Arrow batches.  See SURVEY.md §1-§3 for the semantics contract.
"""
from .api import (extract_text, extract_text_and_spans_from_mem,
                  extract_text_by_pages, extract_text_by_pages_encrypted,
                  extract_text_encrypted, extract_text_from_mem,
                  extract_text_from_mem_by_pages,
                  extract_text_from_mem_by_pages_encrypted,
                  extract_text_from_mem_encrypted, get_metadata,
                  output_doc, output_doc_encrypted, output_doc_page)
from .devices import (HTMLOutput, OutputDev, PlainTextOutput, SVGOutput,
                      SpanTextOutput)
from .document import Document, load_document
from .objects import PdfError

__all__ = [
    "extract_text", "extract_text_from_mem", "extract_text_encrypted",
    "extract_text_from_mem_encrypted", "extract_text_by_pages",
    "extract_text_by_pages_encrypted", "extract_text_from_mem_by_pages",
    "extract_text_from_mem_by_pages_encrypted",
    "extract_text_and_spans_from_mem", "get_metadata",
    "output_doc", "output_doc_encrypted", "output_doc_page",
    "OutputDev", "PlainTextOutput", "SpanTextOutput", "HTMLOutput",
    "SVGOutput",
    "Document", "load_document", "PdfError",
]
