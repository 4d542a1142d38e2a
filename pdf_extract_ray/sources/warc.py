"""WARC reader — the Common Crawl wire format (ISO 28500).

Parses WARC/1.0 and WARC/1.1 files (plain or gzip, including the
per-record-gzip-member layout Common Crawl ships) into the canonical
pages rows (url, warc_ts, html) that pipelines/extract consumes.

Scale shape: files are the parallel unit — ray.data.read_binary_files
streams (path, bytes) blocks and ONE flat map parses each file's
records; nothing shuffles, and a 256-node cluster reads 256+ WARC
shards concurrently exactly like the parquet path.  The parser is
TOTAL: malformed headers, bad lengths and truncated tails skip the
record (or the remainder of the file) rather than raising — a crawl
archive always contains damage.

WARC framing (public spec): each record is
    WARC/1.x CRLF  (header lines)  CRLF CRLF  payload[Content-Length]
    CRLF CRLF
`response` / `resource` records carry the document; for `response` the
payload is an HTTP/1.x message whose body starts after the first
CRLFCRLF.
"""
from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa

_MAX_HDR = 64 * 1024  # a header block larger than this is damage


def _parse_warc_ts(value: str) -> int:
    """WARC-Date (ISO 8601, e.g. 2024-01-02T03:04:05Z) -> int64 us
    since epoch; 0 on damage."""
    try:
        s = value.strip().replace("Z", "")
        return int(np.datetime64(s, "us").astype(np.int64))
    except Exception:
        return 0


def parse_warc_records(buf: bytes, types=("response", "resource")):
    """Yield (url, ts_us, payload_bytes) for every record whose
    WARC-Type is in `types` in one WARC buffer (already decompressed).
    `response` payloads strip their HTTP message head; `resource` and
    `conversion` (WET) payloads pass through.  Total: damaged records
    are skipped; an unparseable region ends the scan."""
    pos = 0
    n = len(buf)
    while pos < n:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = buf.find(b"\r\n\r\n", start, start + _MAX_HDR)
        if hdr_end < 0:
            return
        try:
            lines = buf[start:hdr_end].decode("latin-1").split("\r\n")
        except Exception:
            pos = hdr_end + 4
            continue
        fields = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if length < 0 or body_end > n:
            return  # truncated tail
        rtype = fields.get("warc-type", "")
        if rtype in types:
            payload = buf[body_start:body_end]
            if rtype == "response":
                # strip the HTTP message head; body = after CRLFCRLF
                he = payload.find(b"\r\n\r\n")
                payload = payload[he + 4:] if he >= 0 else b""
            url = fields.get("warc-target-uri", "")
            if url:
                yield (url, _parse_warc_ts(fields.get("warc-date", "")),
                       payload)
        pos = body_end


def _maybe_gunzip(buf: bytes) -> bytes:
    """Decompress gzip buffers (multi-member — the Common Crawl
    record-per-member layout concatenates transparently); plain buffers
    pass through; broken gzip yields b'' (total)."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    try:
        return gzip.decompress(buf)
    except Exception:
        return b""


def warc_rows(path: str, buf: bytes,
              types=("response", "resource")) -> pa.Table:
    """One WARC file -> pages-schema Arrow table."""
    urls, tss, payloads = [], [], []
    for url, ts, html in parse_warc_records(_maybe_gunzip(bytes(buf)),
                                            types=types):
        urls.append(url)
        tss.append(ts)
        payloads.append(html)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(
            np.asarray(tss, np.int64).view("datetime64[us]")),
        "html": pa.array(payloads, pa.binary())})


def read_warc(paths):
    """WARC shard path(s) -> ray.data.Dataset (url, warc_ts, html) —
    drop-in for the parquet pages source (feed to
    pipelines.extract.extract_dataset unchanged)."""
    import ray

    def parse(batch: pa.Table) -> pa.Table:
        parts = [warc_rows(p, b) for p, b in
                 zip(batch.column("path").to_pylist(),
                     batch.column("bytes").to_pylist())]
        parts = [t for t in parts if t.num_rows] or [warc_rows("", b"")]
        return pa.concat_tables(parts)

    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(parse, batch_format="pyarrow")


def write_warc(rows, path: str, *, gzip_members: bool = False):
    """Test/fixture helper: write (url, ts_us, html) rows as a WARC
    file — one response record each, optionally one gzip member per
    record (the Common Crawl layout)."""
    out = bytearray()
    for url, ts_us, html in rows:
        date = np.datetime64(int(ts_us), "us").item() \
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {date}\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode("latin-1")
        rec = hdr + http + b"\r\n\r\n"
        out += gzip.compress(bytes(rec)) if gzip_members else rec
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_wet(paths):
    """WET shard path(s) (Common Crawl's pre-extracted plain-text
    conversion format — WARC framing, `conversion` records, UTF-8 text
    payloads) -> ray.data.Dataset (url, warc_ts, text).  The text
    column decodes lossily (crawl text is never clean UTF-8); same
    files-as-parallel-unit shape as read_warc."""
    import ray

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, texts = [], [], []
        for p, b in zip(batch.column("path").to_pylist(),
                        batch.column("bytes").to_pylist()):
            for url, ts, payload in parse_warc_records(
                    _maybe_gunzip(bytes(b)), types=("conversion",)):
                urls.append(url)
                tss.append(ts)
                texts.append(payload.decode("utf-8", "replace"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, np.int64).view("datetime64[us]")),
            "text": pa.array(texts, pa.string())})

    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(parse, batch_format="pyarrow")


def write_wet(rows, path: str, *, gzip_members: bool = False):
    """Fixture helper: (url, ts_us, text) rows -> a WET file
    (conversion records)."""
    out = bytearray()
    for url, ts_us, text in rows:
        date = np.datetime64(int(ts_us), "us").item() \
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        body = text.encode("utf-8")
        hdr = (f"WARC/1.0\r\nWARC-Type: conversion\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {date}\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode("latin-1")
        rec = hdr + body + b"\r\n\r\n"
        out += gzip.compress(bytes(rec)) if gzip_members else rec
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_docs_jsonl(paths):
    """JSONL corpus reader (one {"doc_id", "text", ...} object per
    line — the interchange format most text-corpus releases ship
    besides parquet) -> ray.data.Dataset with string/int64 columns.
    Thin wrapper over ray.data.read_json (which already streams and
    parallelizes per file); here for source-format completeness next
    to WARC/WET."""
    import ray
    return ray.data.read_json(paths)
