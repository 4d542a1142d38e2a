"""Deterministic synthetic `pages` table (FIXTURES.md §F1).

Schema is the driver-mandated input_hint shape:
    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

Payload mix by row index i % 10:  0-6 PDF (cycling the F2 generator
classes), 7-8 HTML (F3 classes), 9 junk/edge cases.  Everything derives
from the row index via a hash — no RNG state, no wall clock — so any
shard of any size is reproducible independently.
"""
from __future__ import annotations

import datetime
import hashlib
import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from .htmlgen import html_article, html_linkfarm, html_malformed, html_nested
from .pdfgen import (pdf_aes128_encrypted, pdf_cff_type1c,
                     pdf_flate_xrefstream, pdf_identity_h, pdf_macroman,
                     pdf_multiline_layout, pdf_multipage, pdf_q_q_cm,
                     pdf_simple_helvetica, pdf_tj_array, pdf_tounicode_bfchar,
                     pdf_type3, pdf_winansi_differences, pdf_xobject_form,
                     pdf_zapf_symbol)

PAGES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])

_WORDS = ("data stream page crawl extract parse glyph text block shard "
          "byte token font table index batch actor arrow block queue").split()

_LANGS = ("en", "de", "hu", "fr", "")

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _h(i: int, salt: str = "") -> int:
    return int.from_bytes(hashlib.sha256(f"{salt}:{i}".encode()).digest()[:8], "big")


def _lorem(i: int, n_words: int) -> str:
    h = _h(i, "lorem")
    out = []
    for k in range(n_words):
        out.append(_WORDS[(h + k * 2654435761) % len(_WORDS)])
    return " ".join(out)


def make_payload(i: int, giant: bool = False) -> bytes:
    """Deterministic payload for row i."""
    cls = i % 10
    if giant:
        # multi-page giant (skew bucket exerciser): many pages of text
        return pdf_multipage(n_pages=40 + (i % 10) * 10, compress=True)
    if cls == 0:
        return pdf_simple_helvetica(f"Document {i}: " + _lorem(i, 12 + i % 30))
    if cls == 1:
        k = i % 3
        if k == 0:
            return pdf_tj_array()
        if k == 1:
            return pdf_multiline_layout()
        return pdf_aes128_encrypted(f"rc4aes {i}")
    if cls == 2:
        return pdf_winansi_differences() if i % 2 else pdf_macroman()
    if cls == 3:
        return pdf_identity_h(f"CID {i} " + _lorem(i, 6))
    if cls == 4:
        return pdf_multipage(n_pages=2 + i % 4, compress=bool(i % 2))
    if cls == 5:
        k = i % 3
        if k == 0:
            return pdf_type3()
        if k == 1:
            return pdf_xobject_form()
        return pdf_cff_type1c()
    if cls == 6:
        if i % 3 == 0:
            return pdf_flate_xrefstream(f"xref stream doc {i}")
        if i % 3 == 1:
            return pdf_q_q_cm()
        return pdf_zapf_symbol()
    if cls == 7:
        return html_article(_lorem(i, 60 + i % 80), title=f"Article {i}")
    if cls == 8:
        k = i % 3
        if k == 0:
            return html_nested([_lorem(i, 25 + j * 3) for j in range(4)])
        if k == 1:
            return html_linkfarm()
        return html_malformed(_lorem(i, 20))
    # junk / edge cases
    k = i % 4
    if k == 0:
        return b""
    if k == 1:
        return b"%PDF-1.4\ntruncated garbage"
    if k == 2:
        return hashlib.sha256(str(i).encode()).digest() * 8  # binary noise
    return b"plain text, neither pdf nor html: " + _lorem(i, 10).encode()


def make_pages_table(n_rows: int, n_giants: int = 0, offset: int = 0) -> pa.Table:
    urls, tss, payloads, texts, langs = [], [], [], [], []
    for j in range(n_rows):
        i = offset + j
        giant = n_giants > 0 and j >= n_rows - n_giants
        urls.append(f"https://example.org/doc/{i:06d}")
        tss.append(_EPOCH + datetime.timedelta(seconds=137 * i))
        payloads.append(make_payload(i, giant=giant))
        texts.append(_lorem(i, 40))  # pre-existing crawl text; NOT the input
        langs.append(_LANGS[i % 5])
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()),
         pa.array(tss, pa.timestamp("us")),
         pa.array(payloads, pa.binary()),
         pa.array(texts, pa.string()),
         pa.array(langs, pa.string())],
        schema=PAGES_SCHEMA)


def pages_parquet_path(n_rows: int, n_giants: int = 0,
                       cache_dir: str = "/tmp/pdf_extract_ray_cache",
                       n_shards: int = 1) -> str:
    """Write (once) and return a cached deterministic pages parquet dir.

    Sharded so the Ray reader can parallelize; cache key includes the
    generator parameters."""
    key = f"pages_v2_n{n_rows}_g{n_giants}_s{n_shards}"
    out_dir = os.path.join(cache_dir, key)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + n_shards - 1) // n_shards
    made = 0
    for s in range(n_shards):
        rows = min(per, n_rows - made)
        if rows <= 0:
            break
        giants = 0
        if s == n_shards - 1:
            giants = n_giants
        tbl = make_pages_table(rows, n_giants=giants, offset=made)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{s:04d}.parquet"))
        made += rows
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
