"""Crawl-side preparation BEFORE extraction: canonicalize URLs, apply
robots.txt-style disallow rules, deduplicate by canonical URL, THEN
extract.  At 100 TB the ordering is the whole point — disallowed and
duplicate pages drop while they are still one url string + one binary
payload, before anyone pays content extraction for them.

Stage shape:
  1. normalize_urls        map-only (ops/weburl canonicalizer)
  2. robots_filter + drop  map-only (tiny rule table broadcast once)
  3. canonical-URL dedup   map-side keep-min combine, then ONE
                           norm_url-hash partition pass (the textprep
                           exact-dedup discipline — no groupby+join
                           pair, no second all-to-all)
  4. extract_dataset       the engine stage, on survivors only

Reference parity note: the reference engine (jrmuizel/pdf-extract) has
no crawl frontier — this pipeline is part of the training-data surface
this repo adds on top of the extraction semantics.
"""
from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np
import pandas as pd

from ..ops import weburl
from ..ops.dedup import _grouped_by_partition
from .extract import extract_dataset


def _keep_min_url(df: pd.DataFrame) -> pd.DataFrame:
    """Keep the lexicographically-first original url per canonical url
    (deterministic survivor election, same rule map-side and in the
    partition resolve)."""
    if len(df) == 0:
        return df
    idx = df.groupby("norm_url", sort=False)["url"].idxmin()
    return df.loc[np.sort(idx.to_numpy())]


def crawlprep_dataset(pages_ds, *,
                      rules: Iterable[Tuple[str, str]] = (),
                      num_partitions: int = 32,
                      batch_size: int = 64,
                      with_spans: bool = False):
    """Composed crawl-prep chain over a (url, html, ...) Dataset.

    Returns the lazy extraction Dataset (RESULT_SCHEMA) over the pages
    that survive robots filtering and canonical-URL dedup.  Unparseable
    urls canonicalize to "" and form one dedup group — exactly one
    survives, matching the "never throw away data silently" policy
    (the extractor will then record its own status for that row).
    """
    normed = weburl.normalize_urls(pages_ds, "url", "norm_url")

    rules = list(rules)
    if rules:
        flagged = weburl.robots_filter(normed, rules, url_col="norm_url")

        def _drop_blocked(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["blocked"] == 0].drop(
                columns=["blocked", "host"])
        normed = flagged.map_batches(_drop_blocked, batch_format="pandas")

    combined = normed.map_batches(_keep_min_url, batch_format="pandas")
    deduped = _grouped_by_partition(combined, ["norm_url"], _keep_min_url,
                                    n_parts=num_partitions)

    def _strip(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["norm_url"])

    survivors = deduped.map_batches(_strip, batch_format="pandas")
    return extract_dataset(survivors, batch_size=batch_size,
                           with_spans=with_spans)
