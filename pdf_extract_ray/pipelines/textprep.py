"""End-to-end training-data prep: the composed flagship a corpus team
actually runs.

    pages (url, html)
      -> extract (PDF parity engine / HTML boilerplate strip)
      -> keep status == 'ok'
      -> exact near-corpus dedup (md5 of extracted text, keep first url)
      -> enrich: token count, quality score, language id
      -> (optionally) quality filter
      -> partitioned parquet

Shuffle discipline: exact dedup is ONE hash shuffle partitioned by
text_md5 with a map-side combine (each block pre-drops its own dups, so
hot duplicate groups stay bounded); each partition keeps the min-url row
per md5.  Every other stage is a shuffle-free map.
"""
from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from .extract import extract_dataset


def _keep_ok(batch: pa.Table) -> pa.Table:
    # spans dropped: text-prep output is text-oriented, and Arrow's hash
    # join cannot carry list<struct> payload columns
    out = batch.filter(pc.equal(batch.column("status"), "ok"))
    return out.drop_columns(["spans", "error"])


def _enrich(batch: pa.Table) -> pa.Table:
    """Token count, quality score, lang id over extracted_text (reuses the
    ops kernels on a renamed view)."""
    from ..ops.textstats import LangIdBatch, quality_batch
    from ..util import task_udf
    view = pa.Table.from_arrays(
        [pa.array(range(batch.num_rows), pa.int64()),
         batch.column("extracted_text")],
        names=["doc_id", "text"])
    q = quality_batch(view)
    lang = task_udf(LangIdBatch)(view)
    out = batch
    for name, col in (("n_tokens", q.column("n_tokens")),
                      ("quality_score", q.column("quality_score")),
                      ("pred_lang", lang.column("pred_lang"))):
        out = out.append_column(name, col)
    return out


def textprep_dataset(pages_ds, *, num_partitions: int = 32,
                     min_quality: Optional[float] = None,
                     batch_size: int = 64,
                     checkpoint_dir: Optional[str] = None):
    """Composed pipeline over a (url, html) Dataset.

    The extracted/ok dataset feeds BOTH join inputs (full rows + the
    (md5,url) dedup decision).  Ray Data re-executes shared lazy lineage
    once per consumer, so the expensive extraction stage MUST be pinned
    before the lineage forks: `checkpoint_dir` writes it to partitioned
    parquet and re-reads (the 100-TB path — resumable, object store
    stays small); otherwise it is materialized into the object store
    (fine while extracted text × replication fits cluster memory).
    Either way extraction runs exactly once.
    """
    extracted = extract_dataset(pages_ds, batch_size=batch_size,
                                with_spans=False)
    ok = extracted.map_batches(_keep_ok, batch_format="pyarrow")
    if checkpoint_dir is not None:
        import ray
        ok.write_parquet(checkpoint_dir)
        ok = ray.data.read_parquet(checkpoint_dir)
    else:
        ok = ok.materialize()
    return _dedup_enrich(ok, num_partitions=num_partitions,
                         min_quality=min_quality)


def _min_url_per_md5(batch: pa.Table) -> pa.Table:
    """Map-side exact-dedup combine: md5 the text, keep this batch's
    min-url row per md5 (text_md5 kept for the partition resolve).  The
    combine bounds hot duplicate groups — a boilerplate text duplicated
    millions of times ships at most one row per upstream block."""
    import pandas as pd
    texts = batch.column("extracted_text").to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    batch = batch.append_column("text_md5", pa.array(md5s, pa.string()))
    keep = pd.DataFrame({"m": md5s,
                         "u": batch.column("url").to_pandas()}) \
        .groupby("m", sort=False)["u"].idxmin().to_numpy()
    keep.sort()
    return batch.take(pa.array(keep))


def _dedup_enrich(ok_ds, *, num_partitions: int,
                  min_quality: Optional[float]):
    """Global exact dedup + enrichment over an already-extracted ok
    dataset (the post-checkpoint phase of the composed pipeline).

    Dedup is ONE hash shuffle: rows partition by text_md5 after a
    map-side combine (each block pre-drops its own dups), and each
    partition keeps the min-url row per md5 — the same survivor set as
    the round-2 groupby-Min + hash-join-back pair, with one less
    all-to-all and no join aggregator actors (A/B at sf0.1, 32 CPUs:
    3.8 s -> 0.44 s for the dedup stage)."""
    import numpy as np

    from ..ops.dedup import _grouped_by_partition

    hashed = ok_ds.map_batches(_min_url_per_md5, batch_format="pyarrow")

    def pick(df):
        if len(df) == 0:
            return df.drop(columns=["text_md5"])
        idx = df.groupby("text_md5", sort=False)["url"].idxmin()
        return df.loc[np.sort(idx.to_numpy())].drop(columns=["text_md5"])

    deduped = _grouped_by_partition(hashed, ["text_md5"], pick,
                                    n_parts=num_partitions)

    enriched = deduped.map_batches(_enrich, batch_format="pyarrow")
    if min_quality is not None:
        enriched = enriched.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("quality_score"),
                                                min_quality)),
            batch_format="pyarrow")
    return enriched


def run_textprep(input_dir: str, output_dir: str, *,
                 num_partitions: int = 32,
                 min_quality: Optional[float] = None,
                 resume: bool = True):
    """Checkpointed composed run, resumable at two granularities:

    Phase 1 (per-partition): extraction through run_extract's manifest
    machinery — a preempted job skips finished partitions on restart.
    Phase 2 (global): dedup shuffle + enrichment read the phase-1 parquet
    (never re-extract) and write the final output; its completion marker
    is `manifest/textprep.json` (atomic rename).

    Returns the job metrics dict ({"extract": ..., "rows_out": ...}).
    """
    import json
    import os

    import pyarrow.compute as _pc
    import ray

    from .extract import run_extract

    extract_dir = os.path.join(output_dir, "extracted")
    final_dir = os.path.join(output_dir, "textprep")
    marker = os.path.join(output_dir, "manifest", "textprep.json")
    os.makedirs(os.path.dirname(marker), exist_ok=True)

    if resume and os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)  # whole job already finished

    job = run_extract(input_dir, extract_dir, with_spans=False,
                      resume=resume, batch_size=64)

    import glob as _glob
    part_files = sorted(_glob.glob(
        os.path.join(extract_dir, "part=*", "*.parquet")))
    keep_cols = ["url", "extracted_text", "status", "kind",
                 "payload_bytes", "n_chars"]
    ok = ray.data.read_parquet(part_files) \
        .map_batches(lambda b: b.filter(_pc.equal(b.column("status"), "ok"))
                     .select(keep_cols),
                     batch_format="pyarrow")
    result = _dedup_enrich(ok, num_partitions=num_partitions,
                           min_quality=min_quality)
    import shutil
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)  # phase-2 output rebuilt atomically
    result.write_parquet(final_dir)
    n_out = ray.data.read_parquet(final_dir).count()
    metrics = {"extract": job, "rows_out": n_out, "output": final_dir}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=1)
    os.replace(tmp, marker)
    return metrics
