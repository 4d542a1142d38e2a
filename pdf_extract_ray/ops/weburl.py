"""URL parsing / normalization operators (Ray Data native, vectorized).

Web-scale corpora key almost everything on URLs: host-level grouping,
crawl dedup by canonical URL, per-domain quality policies.  This module
provides batch-wide kernels (single compiled-regex pandas passes — no
per-row Python) that any pipeline stage can map over a `url:string`
column, e.g. the Common-Crawl-style pages table
(url, warc_ts, html, text, lang) this repo's extraction pipeline reads.

Semantics (documented preconditions, mirrored by the SQL oracles):

parse_urls
  scheme://[userinfo@]host[:port][/path][?query][#fragment]
  - host is lowercased by the parser (DNS is case-insensitive);
    scheme likewise.  path/query/fragment keep their case.
  - path_depth = number of non-empty `/`-separated path segments
    ("" and "/" are depth 0).
  - rows that don't match the shape (no "://", empty host) parse to
    null host and depth 0 — the kernel is total, never raises.

normalize_urls  (crawl-dedup canonicalization)
  - scheme + host lowercased; userinfo dropped
  - default ports stripped (http:80, https:443); other ports kept
  - fragment dropped
  - runs of consecutive `/` in the path collapsed to one
  - empty path -> "/"
  - tracking params removed from the query: any `utm_*` key (query
    otherwise kept byte-for-byte, original order); an emptied query
    drops its `?`
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_URL_RE = (
    r'^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://'
    r'(?:(?P<userinfo>[^/?#@]*)@)?'
    r'(?P<host>[^/?#:@]*)'
    r'(?::(?P<port>[0-9]*))?'
    r'(?P<path>[^?#]*)'
    r'(?:\?(?P<query>[^#]*))?'
    r'(?:#(?P<fragment>.*))?$'
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443"}


def parse_url_frame(urls: pd.Series) -> pd.DataFrame:
    """Vectorized URL split: one compiled-regex extract over the batch.

    Returns columns scheme, host, port, path, query, fragment (object
    dtype, NaN where absent / unparseable) plus int64 path_depth and
    bool has_query.  host and scheme come back lowercased.
    """
    urls = urls.fillna("").astype(str)
    parts = urls.str.extract(_URL_RE)
    bad = parts["host"].isna() | (parts["host"] == "")
    parts.loc[bad, ["scheme", "host", "port", "path", "query",
                    "fragment"]] = np.nan
    parts["scheme"] = parts["scheme"].str.lower()
    parts["host"] = parts["host"].str.lower()
    path = parts["path"].fillna("")
    # depth = count of non-empty segments: strip leading/trailing '/',
    # collapse runs, then count separators on non-empty remainder.
    trimmed = path.str.replace(r"/{2,}", "/", regex=True) \
                  .str.strip("/")
    depth = trimmed.str.count("/") + 1
    parts["path_depth"] = np.where(trimmed == "", 0, depth).astype(np.int64)
    parts["has_query"] = parts["query"].notna() & (parts["query"] != "")
    return parts


def _clean_query(query: pd.Series) -> pd.Series:
    """Drop utm_* params from a query string, keeping the rest in
    original order.  Vectorized: one regex removes each `utm_*` key
    (with its leading '&' when mid-string), a second strips a leading
    '&' left by a removed first param."""
    q = query.fillna("")
    q = q.str.replace(r"&?utm_[^&]*", "", regex=True)
    q = q.str.replace(r"^&+", "", regex=True)
    return q


def normalize_url_series(urls: pd.Series) -> pd.Series:
    """Canonical crawl-dedup form (see module docstring).  Unparseable
    rows normalize to "" (never raise)."""
    parts = parse_url_frame(urls)
    scheme = parts["scheme"].fillna("")
    host = parts["host"].fillna("")
    port = parts["port"].fillna("")
    defaults = scheme.map(_DEFAULT_PORTS).fillna("")
    keep_port = (port != "") & (port != defaults)
    portseg = np.where(keep_port, ":" + port, "")
    path = parts["path"].fillna("").str.replace(r"/{2,}", "/", regex=True)
    path = path.where(path != "", "/")
    query = _clean_query(parts["query"])
    qseg = np.where(query != "", "?" + query, "")
    out = scheme + "://" + host + portseg + path + qseg
    out = out.where(host != "", "")
    return out


# --- Ray Data stage wrappers ------------------------------------------------

def parse_urls(ds, url_col: str = "url", keep: list | None = None):
    """Map-only stage: append scheme/host/port/path/query/path_depth/
    has_query columns parsed from `url_col`.  `keep` limits the input
    columns copied through (None = all)."""
    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        parts = parse_url_frame(df[url_col])
        base = df if keep is None else df[keep]
        out = base.reset_index(drop=True)
        for c in ("scheme", "host", "port", "path", "query",
                  "path_depth", "has_query"):
            out[c] = parts[c].reset_index(drop=True)
        return out
    return ds.map_batches(_batch, batch_format="pandas")


def normalize_urls(ds, url_col: str = "url", out_col: str = "norm_url"):
    """Map-only stage: append the canonical form of `url_col`."""
    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = normalize_url_series(df[url_col]).to_numpy()
        return out
    return ds.map_batches(_batch, batch_format="pandas")


def host_stats(ds, url_col: str = "url", lang_col: str = "lang"):
    """Per-host crawl stats: doc count, total path depth, #urls with a
    query string, #distinct langs.  One groupby shuffle on host after a
    map-side (host, lang) pre-aggregate — scale path: the exchange
    carries one row per (host, lang), not per document."""
    from ray.data.aggregate import Sum

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        parts = parse_url_frame(df[url_col])
        g = pd.DataFrame({
            "host": parts["host"].fillna(""),
            "lang": df[lang_col].fillna("und").to_numpy(),
            "depth": parts["path_depth"].to_numpy(),
            "with_query": parts["has_query"].to_numpy().astype(np.int64),
        })
        agg = g.groupby(["host", "lang"], as_index=False).agg(
            n_docs=("depth", "size"), depth_sum=("depth", "sum"),
            with_query=("with_query", "sum"))
        return agg

    per_hl = ds.map_batches(_batch, batch_format="pandas") \
        .groupby(["host", "lang"]) \
        .aggregate(Sum("n_docs"), Sum("depth_sum"), Sum("with_query"))
    # tiny second hop: one row per (host, lang)
    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("host", as_index=False).agg(
            n_docs=("sum(n_docs)", "sum"),
            depth_sum=("sum(depth_sum)", "sum"),
            with_query=("sum(with_query)", "sum"),
            n_langs=("lang", "nunique"))
        return out
    return per_hl.groupby("host").map_groups(_roll, batch_format="pandas")


def normalized_dedup_stats(ds, url_col: str = "url"):
    """Per-host canonical-URL dedup stats: total urls, distinct
    canonical urls, lexicographically-first canonical url.  Pattern:
    map-side normalize + (host, norm) combine, one shuffle keyed on
    (host, norm), then a per-host rollup over the already-unique rows."""
    from ray.data.aggregate import Sum

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        norm = normalize_url_series(df[url_col])
        parts = parse_url_frame(pd.Series(norm.to_numpy()))
        g = pd.DataFrame({"host": parts["host"].fillna("").to_numpy(),
                          "norm_url": norm.to_numpy()})
        agg = g.groupby(["host", "norm_url"], as_index=False) \
               .agg(n=("norm_url", "size"))
        return agg

    per_url = ds.map_batches(_batch, batch_format="pandas") \
        .groupby(["host", "norm_url"]).aggregate(Sum("n"))

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("host", as_index=False).agg(
            n_urls=("sum(n)", "sum"),
            n_distinct=("norm_url", "nunique"),
            first_url=("norm_url", "min"))
    return per_url.groupby("host").map_groups(_roll, batch_format="pandas")


def robots_filter(ds, rules, url_col: str = "url"):
    """robots.txt-style URL filtering: `rules` is a small list of
    (host, path_prefix) disallow pairs, broadcast once via ray.put; a
    URL is blocked when its host has a rule whose prefix starts its
    path.  Map-only: per batch, one parse pass, then one vectorized
    startswith per DISTINCT prefix (rule sets are tiny by nature —
    the loop is over rule prefixes, never rows).  Appends a `blocked`
    int64 column (1 = disallowed)."""
    import ray

    by_prefix: dict = {}
    for host, prefix in rules:
        by_prefix.setdefault(prefix, set()).add(host)
    rules_ref = ray.put({p: np.array(sorted(hs), dtype=object)
                         for p, hs in by_prefix.items()})

    def _batch(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(rules_ref)
        parts = parse_url_frame(df[url_col])
        host = parts["host"].fillna("")
        path = parts["path"].fillna("")
        blocked = np.zeros(len(df), dtype=bool)
        for prefix, hosts in table.items():
            blocked |= (path.str.startswith(prefix)
                        & host.isin(hosts)).to_numpy()
        out = df.copy()
        out["host"] = host.to_numpy()
        out["blocked"] = blocked.astype(np.int64)
        return out

    return ds.map_batches(_batch, batch_format="pandas")


def parse_robots_txt(data: bytes, agent: str = "*"):
    """Parse robots.txt bytes into the disallow-prefix list for
    `agent` (exact-name group match, falling back to the '*' group),
    the format the rest of this module's robots_filter consumes.
    Damage-total: undecodable bytes replace, junk lines skip, empty
    Disallow values (meaning allow-all markers) drop.  Group
    semantics: consecutive User-agent lines share the following rule
    block (RFC 9309)."""
    text = data.decode("utf-8", "replace")
    groups: dict = {}
    current_agents: list = []
    rules_open = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_open:
                current_agents = []
                rules_open = False
            current_agents.append(val.lower())
            for a in current_agents:
                groups.setdefault(a, [])
        elif key == "disallow":
            rules_open = True
            if val:
                for a in (current_agents or ["*"]):
                    groups.setdefault(a, []).append(val)
        elif key in ("allow", "crawl-delay", "sitemap"):
            rules_open = True  # closes the agent run, rules ignored
    return groups.get(agent.lower(), groups.get("*", []))


def crawl_schedule(ds, *, url_col: str = "url",
                   base_delay_ms: int = 500):
    """Politeness-scheduled crawl plan: per-host FIFO slots (url asc —
    deterministic without timestamps) with a host-derived crawl delay
    (base_delay_ms * (1 + len(host) % 4), standing in for a
    robots.txt Crawl-delay), so fetch_at_ms = slot * delay.  The
    frontier-scheduling shape every crawler needs: ONE host-keyed
    partition pass, no global sort.

    -> (url, host, slot [0-based], fetch_at_ms); unparseable URLs
    (no host) are absent."""
    parsed = parse_urls(ds, url_col=url_col, keep=[url_col]) \
        .map_batches(lambda df: df[df["host"].notna()]
                     [[url_col, "host"]], batch_format="pandas")

    def schedule(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"url": "object", "host": "object", "slot": "int64",
                "fetch_at_ms": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(["host", url_col]).reset_index(drop=True)
        slot = df.groupby("host").cumcount().astype(np.int64)
        delay = (df["host"].str.len().fillna(0).astype(np.int64)
                 % 4 + 1) * base_delay_ms
        return pd.DataFrame({
            "url": df[url_col], "host": df["host"], "slot": slot,
            "fetch_at_ms": (slot * delay).astype(np.int64)}) \
            .astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(parsed, ["host"], schedule,
                                 n_parts=16)
