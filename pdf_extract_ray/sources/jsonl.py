"""JSONL source/sink — the Dolma / CC-derivative interchange format
(one JSON object per line, usually gzip shards: `*.jsonl.gz`).

Scale shape: FILES are the parallel unit, exactly like the WARC
reader — `ray.data.read_binary_files` streams (path, bytes) blocks and
ONE flat map parses each shard with pyarrow's C++ JSON reader (no
per-line Python in the clean path); nothing shuffles.  Writing goes
through `Dataset.write_json`-style per-block tasks that each emit one
`part-<task>.jsonl.gz` shard — resumable, never one giant file.

The reader is TOTAL in the WARC tradition: a shard that the vectorized
parser rejects (truncated gzip, corrupt line) falls back to a per-line
salvage pass that keeps every valid line and drops damage — a crawl
derivative always contains some.  The salvage path only pays its
per-line cost on damaged files.
"""
from __future__ import annotations

import gzip
import io
import json

import numpy as np
import pyarrow as pa


def _parse_shard(data: bytes, columns: list[str] | None = None):
    """One shard's bytes -> pyarrow Table (vectorized fast path,
    per-line salvage on damage).  Returns None for undecodable files."""
    import pyarrow.json as pajson

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except Exception:
            # truncated/torn gzip: zlib's streaming decompressor hands
            # back the readable prefix (GzipFile would discard it)
            import zlib
            try:
                data = zlib.decompressobj(31).decompress(data)
            except Exception:
                return None
            # drop the (likely torn) final line
            data = data[:data.rfind(b"\n") + 1]
            if not data:
                return None
    if not data.strip():
        return None
    try:
        tab = pajson.read_json(io.BytesIO(data))
    except Exception:
        # damaged line(s): per-line salvage (slow path, damage only)
        rows = []
        for line in data.split(b"\n"):
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except Exception:
                continue
            if isinstance(obj, dict):
                rows.append(obj)
        if not rows:
            return None
        tab = pa.Table.from_pylist(rows)
    if columns is not None:
        keep = [c for c in columns if c in tab.column_names]
        tab = tab.select(keep)
    return tab


def read_jsonl(paths, columns: list[str] | None = None):
    """JSONL shards (plain or .gz) -> Dataset.  `paths` is a file, a
    directory, or a list of files; `columns` prunes at the parse (the
    bytes still stream once — JSONL has no column projection, which is
    exactly why the parquet path is preferred for hot tables)."""
    import os

    import ray

    # NOTE: ray.data.read_binary_files force-detects compression from
    # the .gz extension (pa.Codec.detect; compression=None is
    # indistinguishable from unset) and RAISES on a truncated member —
    # but damage handling must stay in _parse_shard where it is total.
    # So the shard list is expanded driver-side (a metadata op, same as
    # any reader's file listing) and each task opens its own raw bytes;
    # files remain the parallel unit.
    if isinstance(paths, (str, bytes)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith((".jsonl", ".jsonl.gz", ".json", ".gz"))))
        else:
            files.append(p)

    if not files:
        cols = columns or []
        return ray.data.from_arrow(pa.table(
            {c: pa.array([], pa.string()) for c in cols}))

    def parse(batch: pa.Table) -> pa.Table:
        tabs = []
        for path in batch.column("item").to_pylist():
            try:
                with open(path, "rb") as f:
                    data = f.read()
            except OSError:
                continue
            t = _parse_shard(data, columns)
            if t is not None and t.num_rows:
                tabs.append(t)
        if not tabs:
            return pa.table({})
        return pa.concat_tables(tabs, promote_options="permissive")

    return ray.data.from_items(files).map_batches(
        parse, batch_format="pyarrow", batch_size=1)


def write_jsonl_gz(ds, out_dir: str):
    """Dataset -> gzip JSONL shards under `out_dir` (one
    part-NNNNN.jsonl.gz per block task; resumable layout, never one
    giant file).  Serialization is pandas' C to_json (no per-row
    Python); mtime is pinned to 0 so shard bytes are deterministic for
    identical blocks."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch, task_idx=[0]):
        import uuid
        df = batch
        payload = df.to_json(orient="records", lines=True,
                             force_ascii=False, date_format="iso")
        if not payload.endswith("\n"):
            payload += "\n"
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(payload.encode("utf-8"))
        name = f"part-{uuid.uuid4().hex[:12]}.jsonl.gz"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.rename(tmp, os.path.join(out_dir, name))
        import pandas as pd
        return pd.DataFrame({"path": [os.path.join(out_dir, name)],
                             "n_rows": [len(df)]})

    return ds.map_batches(dump, batch_format="pandas").materialize()
