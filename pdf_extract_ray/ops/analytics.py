"""Distributed analytics operators: window-style top-k per group, exact
distinct counts, exact grouped medians without a global sort, and corpus
vocabulary building — the aggregate shapes a training-data pipeline needs
beyond plain groupby sums.

Scale discipline:
- topk_per_group: every batch emits its local top-k per group (map-side
  combine), so the shuffle carries at most n_blocks x n_groups x k rows;
  the final per-group selection touches only those candidates.
- distinct_count: batches pre-deduplicate (group, value) pairs before the
  exact two-stage distinct (the shuffle moves unique pairs, not rows).
- grouped_median: EXACT median with no global sort — one native
  (group, value) count aggregation builds a histogram; each group's
  histogram (bounded by the value cardinality, not the row count) is then
  resolved in one pass.  Partitioning assumption: a group's distinct
  VALUES fit in memory (holds for bounded-domain metrics like lengths).
- word_frequencies: per-batch Counter (map-side combine) -> ONE groupby
  sum over (word, partial_count) -> per-batch partial top-k -> tiny
  driver merge (same pattern as top_customers).
"""
from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def topk_per_group(ds, group_col: str, value_col: str, id_col: str,
                   k: int = 3):
    """Top-k rows per group by (value desc, id asc) with a dense 1-based
    rank -> (group, id, value, rank).  Assumes a bounded number of groups
    (each group's k candidates per block reach one map_groups call)."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col, id_col]).to_pandas()
        df = df.sort_values([group_col, value_col, id_col],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby(group_col, sort=False)
                                    .head(k), preserve_index=False)

    cands = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([value_col, id_col],
                            ascending=[False, True]).head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return cands.groupby(group_col).map_groups(final, batch_format="pandas")


def distinct_count(ds, group_col: str, value_col: str):
    """Exact count(distinct value) per group -> (group, n_distinct)."""
    def dedup(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(), preserve_index=False)

    pairs = ds.map_batches(dedup, batch_format="pyarrow")
    uniq = pairs.groupby([group_col, value_col]).count()
    out = uniq.map_batches(
        lambda b: b.select([group_col]), batch_format="pyarrow") \
        .groupby(group_col).count()
    return out.map_batches(
        lambda b: pa.table({group_col: b.column(group_col),
                            "n_distinct": pc.cast(b.column("count()"),
                                                  pa.int64())}),
        batch_format="pyarrow")


def grouped_median(ds, group_col: str, value_col: str):
    """Exact median per group -> (group, median) as float64 (mean of the
    two middle values for even counts, matching SQL MEDIAN)."""
    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(dtype=np.float64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        total = cnts.sum()
        cum = np.cumsum(cnts)
        lo_pos = (total - 1) // 2  # 0-based
        hi_pos = total // 2
        lo = vals[np.searchsorted(cum, lo_pos, side="right")]
        hi = vals[np.searchsorted(cum, hi_pos, side="right")]
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "median": [(lo + hi) / 2.0]})

    return hist.groupby(group_col).map_groups(resolve, batch_format="pandas")


def word_frequencies(ds, text_col: str = "text", k: int = 100) -> pa.Table:
    """Corpus vocabulary: top-k words by count (ties broken by word asc)
    -> pa.Table (word, n).  Words split on single spaces, empties dropped
    (mirrors SQL string_split)."""
    import collections

    def partial_counts(b: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for t in b.column(text_col).to_pylist():
            c.update(w for w in (t or "").split(" ") if w)
        words = list(c.keys())
        return pa.table({"word": pa.array(words, pa.string()),
                         "n": pa.array([c[w] for w in words], pa.int64())})

    from ray.data.aggregate import Sum
    summed = ds.map_batches(partial_counts, batch_format="pyarrow") \
               .groupby("word").aggregate(Sum("n"))

    def partial_topk(b: pa.Table) -> pa.Table:
        words = np.asarray(b.column("word").to_pylist(), dtype=object)
        n = np.asarray(b.column("sum(n)").to_pylist(), dtype=np.int64)
        idx = np.lexsort((words, -n))[:k]
        return pa.table({"word": pa.array(words[idx].tolist(), pa.string()),
                         "n": pa.array(n[idx], pa.int64())})

    cands: List[tuple] = []
    for b in summed.map_batches(partial_topk, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        cands.extend(zip(b.column("word").to_pylist(),
                         b.column("n").to_pylist()))
    cands.sort(key=lambda t: (-t[1], t[0]))
    top = cands[:k]
    return pa.table({"word": pa.array([w for w, _ in top], pa.string()),
                     "n": pa.array([n for _, n in top], pa.int64())})


def grouped_value_ranks(ds, group_col: str, value_col: str, id_col: str):
    """RANK() and DENSE_RANK() of `value_col` within `group_col` for
    EVERY row, with no row-level shuffle -> (id, group, value, rnk,
    dense_rnk).

    Value-based window ranks depend only on the per-(group, value)
    histogram: rank = 1 + #rows with a smaller value in the group,
    dense = 1 + #smaller distinct values.  So: per-batch partial counts
    -> one tiny (group, value) groupby -> the driver builds cumulative
    ranks per group -> the lookup broadcasts via ray.put and a map-side
    pandas merge assigns both ranks per row.  The full corpus is never
    shuffled.  Bound: distinct (group, value) pairs fit in memory (the
    grouped_median assumption — value domains like char counts are
    bounded)."""
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             value_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({
            group_col: b.column(group_col).to_pandas(),
            value_col: b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby([group_col, value_col], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col], pa.string()),
            value_col: pa.array(idx[value_col].to_numpy(np.int64)),
            "n": pa.array(g.to_numpy(np.int64))})

    hist = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby([group_col, value_col]).aggregate(Sum("n"))

    rows = hist.take_all()
    df = pd.DataFrame({
        group_col: [r[group_col] for r in rows],
        value_col: np.array([r[value_col] for r in rows], np.int64),
        "n": np.array([r["sum(n)"] for r in rows], np.int64),
    }).sort_values([group_col, value_col], kind="mergesort")
    grp = df.groupby(group_col, sort=False)
    df["rnk"] = grp["n"].cumsum() - df["n"] + 1
    df["dense_rnk"] = grp.cumcount() + 1
    lookup = df[[group_col, value_col, "rnk", "dense_rnk"]] \
        .reset_index(drop=True)
    lookup_ref = ray.put(lookup)

    def assign(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        df = pd.DataFrame({
            id_col: b.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64),
            group_col: b.column(group_col).to_pandas(),
            value_col: b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        out = df.merge(lk, on=[group_col, value_col], how="left")
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
            group_col: pa.array(out[group_col], pa.string()),
            value_col: pa.array(out[value_col].to_numpy(np.int64)),
            "rnk": pa.array(out["rnk"].to_numpy(np.int64)),
            "dense_rnk": pa.array(out["dense_rnk"].to_numpy(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_percentiles(ds, group_col: str, value_col: str,
                        percents=(25, 50, 75, 95)):
    """EXACT discrete percentiles per group with no global sort ->
    (group, p25, p50, ...).  Same histogram shape as grouped_median:
    one (group, value) count aggregate (bounded by value cardinality),
    then each group's percentiles resolve in one cumsum+searchsorted
    pass.  Index arithmetic is integer-exact (ceil(p*n/100) via
    (p*n+99)//100 — DuckDB quantile_disc semantics), so no float
    boundary can pick a neighboring element."""
    hist = ds.groupby([group_col, value_col]).count()
    pcols = [f"p{p}" for p in percents]

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(dtype=np.int64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)
        out = {group_col: [df[group_col].iloc[0]]}
        for p, name in zip(percents, pcols):
            target = (p * total + 99) // 100  # ceil(p*n/100), integer
            out[name] = [int(vals[np.searchsorted(cum, target,
                                                  side="left")])]
        return pd.DataFrame(out)

    return hist.groupby(group_col).map_groups(resolve,
                                              batch_format="pandas")


def grouped_mode(ds, group_col: str, value_col: str):
    """Most frequent value per group (ties -> smallest value) ->
    (group, mode_value, n_occurrences).  One (group, value) count
    aggregate; each group's argmax resolves in one pass."""
    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[value_col].to_numpy(dtype=np.int64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        best = np.lexsort((vals, -cnts))[0]
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "mode_value": [int(vals[best])],
                             "n_occurrences": [int(cnts[best])]})

    return hist.groupby(group_col).map_groups(resolve,
                                              batch_format="pandas")


def grouped_quartiles_cont(ds, group_col: str, value_col: str):
    """EXACT interpolated (continuous) quartiles per group, scaled x4
    so every result is an INTEGER -> (group, q1_x4, q2_x4, q3_x4).

    quantile_cont(q) interpolates  x[lo] + (x[hi]-x[lo]) * frac  at
    pos = (n-1)*q; for quartiles frac is a multiple of 1/4, so 4*value
    is exact integer arithmetic:  x[lo]*(4-rem) + x[hi]*rem  with
    pos4 = (n-1)*k, lo = pos4 // 4, rem = pos4 % 4.  Same histogram
    shape as grouped_percentiles (one bounded (group, value) count
    aggregate, cumsum + searchsorted rank lookups — no whole-group
    sort shuffle), and no float can sit on a rank boundary."""
    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(dtype=np.int64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)

        def at_rank(r: int) -> int:  # 0-based rank lookup
            return int(vals[np.searchsorted(cum, r, side="right")])

        out = {group_col: [df[group_col].iloc[0]]}
        for k, name in ((1, "q1_x4"), (2, "q2_x4"), (3, "q3_x4")):
            pos4 = (total - 1) * k
            lo, rem = pos4 // 4, pos4 % 4
            v = at_rank(lo) * (4 - rem)
            if rem:
                v += at_rank(lo + 1) * rem
            out[name] = [v]
        return pd.DataFrame(out)

    return hist.groupby(group_col).map_groups(resolve,
                                              batch_format="pandas")


def grouped_corr(ds, group_col: str, x_col: str, y_col: str):
    """Pearson correlation per group from EXACT integer moment sums ->
    (group, corr_xy).  Map-side per-batch partials (n, sx, sy, sxx,
    syy, sxy) over int64 inputs combine associatively, so the shuffle
    carries O(blocks x groups) six-int rows; the final float is
    computed with the SAME IEEE op sequence the SQL uses
    (num = n*sxy - sx*sy exactly as int, then one double divide of two
    exact doubles), making the output bit-identical across engines —
    the zscore_by_source discipline."""
    import math
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        p = pd.DataFrame({group_col: df[group_col], "n": 1,
                          "sx": x, "sy": y, "sxx": x * x, "syy": y * y,
                          "sxy": x * y})
        g = p.groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n"), Sum("sx"), Sum("sy"),
                                      Sum("sxx"), Sum("syy"), Sum("sxy"))

    def finish(b: pa.Table) -> pa.Table:
        rows = b.to_pylist()
        groups, corrs = [], []
        for r in rows:
            n, sx, sy = int(r["sum(n)"]), int(r["sum(sx)"]), int(r["sum(sy)"])
            sxx, syy, sxy = (int(r["sum(sxx)"]), int(r["sum(syy)"]),
                             int(r["sum(sxy)"]))
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx <= 0 or dy <= 0:
                continue
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(dx)) * math.sqrt(float(dy))
            groups.append(r[group_col])
            corrs.append(num / den)
        return pa.table({group_col: pa.array(groups),
                         "corr_xy": pa.array(corrs, pa.float64())})

    return sums.map_batches(finish, batch_format="pyarrow")


def grouped_regression(ds, group_col: str, x_col: str, y_col: str):
    """Per-group simple linear regression (REGR_SLOPE/REGR_INTERCEPT)
    from EXACT integer moment sums -> (group, slope, intercept).

    Same combine-able six-int partials as grouped_corr (n, sx, sy,
    sxx, syy, sxy — the shuffle carries O(blocks x groups) rows); the
    finish computes slope = (n*sxy - sx*sy) / (n*sxx - sx*sx) with the
    numerator/denominator formed exactly in integers and ONE double
    divide, and intercept = (sy - slope*sx) / n with the same IEEE op
    sequence the oracle SQL spells out — bit-identical floats across
    engines.  Groups with zero x-variance are dropped (slope
    undefined), matching the SQL's WHERE guard."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy(np.int64)
        y = df[y_col].to_numpy(np.int64)
        p = pd.DataFrame({group_col: df[group_col], "n": 1,
                          "sx": x, "sy": y, "sxx": x * x,
                          "sxy": x * y})
        g = p.groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n"), Sum("sx"), Sum("sy"),
                                      Sum("sxx"), Sum("sxy"))

    def finish(b: pa.Table) -> pa.Table:
        groups, slopes, intercepts = [], [], []
        for r in b.to_pylist():
            n, sx, sy = (int(r["sum(n)"]), int(r["sum(sx)"]),
                         int(r["sum(sy)"]))
            sxx, sxy = int(r["sum(sxx)"]), int(r["sum(sxy)"])
            dx = n * sxx - sx * sx
            if dx <= 0:
                continue
            slope = float(n * sxy - sx * sy) / float(dx)
            intercept = (float(sy) - slope * float(sx)) / float(n)
            groups.append(r[group_col])
            slopes.append(slope)
            intercepts.append(intercept)
        return pa.table({group_col: pa.array(groups),
                         "slope": pa.array(slopes, pa.float64()),
                         "intercept": pa.array(intercepts, pa.float64())})

    return sums.map_batches(finish, batch_format="pyarrow")


def grouped_mad(ds, group_col: str, value_col: str):
    """Median absolute deviation per group, scaled x4 so the result is
    INTEGER-exact -> (group, mad_x4).

    Two bounded (group, value)-histogram aggregates (the grouped_median
    shape — shuffles carry value counts, never rows): pass 1 yields
    each group's median in x2 units (sum of the two middle values —
    integer even for even counts); the deviations |2x - m2| are
    integers, so pass 2's median of deviations in x2 units gives MAD
    in x4 units with no float anywhere."""
    hist = ds.groupby([group_col, value_col]).count().materialize()

    def med2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(dtype=np.int64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)
        lo = int(vals[np.searchsorted(cum, (total - 1) // 2,
                                      side="right")])
        hi = int(vals[np.searchsorted(cum, total // 2, side="right")])
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "m2": np.array([lo + hi], np.int64)})

    m2 = {r[group_col]: int(r["m2"])
          for r in hist.groupby(group_col)
          .map_groups(med2, batch_format="pandas").take_all()}

    def dev_counts(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df[group_col].isin(m2)]
        mm = df[group_col].map(m2).to_numpy(np.int64)
        dev = np.abs(2 * df[value_col].to_numpy(np.int64) - mm)
        return pa.table({group_col: pa.array(df[group_col].to_numpy()),
                         "dev": pa.array(dev),
                         "count()": pa.array(df["count()"].to_numpy(
                             np.int64))})

    from ray.data.aggregate import Sum
    dev_hist = hist.map_batches(dev_counts, batch_format="pyarrow") \
        .groupby([group_col, "dev"]).aggregate(Sum("count()"))

    def mad4(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("dev")
        vals = df["dev"].to_numpy(dtype=np.int64)
        cnts = df["sum(count())"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)
        lo = int(vals[np.searchsorted(cum, (total - 1) // 2,
                                      side="right")])
        hi = int(vals[np.searchsorted(cum, total // 2, side="right")])
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "mad_x4": np.array([lo + hi], np.int64)})

    return dev_hist.groupby(group_col).map_groups(mad4,
                                                  batch_format="pandas")


def grouped_ntile(ds, group_col: str, value_col: str, id_col: str,
                  k: int = 4, num_partitions: int = 16):
    """NTILE(k) OVER (PARTITION BY group ORDER BY value, id) for every
    row -> (id, group, value, tile).  Deterministic: (value, id) is a
    total order, so the SQL window is unambiguous.

    No whole-group sort anywhere: rownum = base_rank(group, value) +
    tie_rank(id within its (group, value) tie class).  Base ranks come
    from the tiny (group, value) histogram (the grouped_value_ranks
    machinery) and broadcast via ray.put together with the group sizes;
    the only row-level shuffle hashes BY (group, value), so the unit a
    single task orders is one tie class, never one group — at 100 TB
    the "en" group spreads over every partition while each equal-value
    slice stays local.  Tile split follows SQL NTILE: the first n%k
    tiles get ceil(n/k) rows."""
    import ray
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             value_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({
            group_col: b.column(group_col).to_pandas(),
            value_col: b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby([group_col, value_col], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col], pa.string()),
            value_col: pa.array(idx[value_col].to_numpy(np.int64)),
            "n": pa.array(g.to_numpy(np.int64))})

    hist = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby([group_col, value_col]).aggregate(Sum("n"))
    rows = hist.take_all()
    hdf = pd.DataFrame({
        group_col: [r[group_col] for r in rows],
        value_col: np.array([r[value_col] for r in rows], np.int64),
        "n": np.array([r["sum(n)"] for r in rows], np.int64),
    }).sort_values([group_col, value_col], kind="mergesort")
    grp = hdf.groupby(group_col, sort=False)
    hdf["base"] = grp["n"].cumsum() - hdf["n"]  # rows strictly below
    counts = grp["n"].sum().to_dict()
    lookup = hdf[[group_col, value_col, "base"]].reset_index(drop=True)
    bcast = ray.put((lookup, counts))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {id_col: "int64", group_col: "object",
                value_col: "int64", "tile": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {c: t for c, t in cols.items() if t != "object"})
        lk, cnt = ray.get(bcast)
        df = df.sort_values([group_col, value_col, id_col],
                            kind="mergesort").reset_index(drop=True)
        tie = df.groupby([group_col, value_col], sort=False).cumcount() \
            .to_numpy(np.int64)
        m = df.merge(lk, on=[group_col, value_col], how="left")
        r0 = m["base"].to_numpy(np.int64) + tie  # 0-based rownum
        n = df[group_col].map(cnt).to_numpy(np.int64)
        kk = np.int64(k)
        q, rem = n // kk, n % kk
        big = rem * (q + 1)
        tile = np.where(r0 < big, r0 // (q + 1),
                        rem + (r0 - big) // np.maximum(q, 1)) + 1
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            group_col: df[group_col].to_numpy(),
            value_col: df[value_col].to_numpy(np.int64),
            "tile": tile.astype(np.int64)})

    def to_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            group_col: b.column(group_col),
            value_col: pc.cast(b.column(value_col), pa.int64())})

    return _grouped_by_partition(
        ds.map_batches(to_rows, batch_format="pyarrow"),
        [group_col, value_col], resolve, n_parts=num_partitions)


def grouped_pct_ranks(ds, group_col: str, value_col: str, id_col: str):
    """PERCENT_RANK() and CUME_DIST() of `value_col` within `group_col`
    for EVERY row, no row-level shuffle -> (id, group, value, pct_rank,
    cume_dist).

    Same machinery as grouped_value_ranks: both windows are pure
    functions of the (group, value) histogram — pct_rank =
    (rank-1)/(n-1), cume_dist = rows_at_or_below/n — so the tiny
    histogram aggregates, the driver turns it into per-(group, value)
    doubles (one correctly-rounded int64/int64 division each, hence
    bit-identical to the SQL engine's), and a broadcast merge assigns
    them map-side.  n=1 groups get pct_rank 0.0 (SQL convention)."""
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             value_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({
            group_col: b.column(group_col).to_pandas(),
            value_col: b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby([group_col, value_col], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col], pa.string()),
            value_col: pa.array(idx[value_col].to_numpy(np.int64)),
            "n": pa.array(g.to_numpy(np.int64))})

    hist = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby([group_col, value_col]).aggregate(Sum("n"))
    rows = hist.take_all()
    df = pd.DataFrame({
        group_col: [r[group_col] for r in rows],
        value_col: np.array([r[value_col] for r in rows], np.int64),
        "n": np.array([r["sum(n)"] for r in rows], np.int64),
    }).sort_values([group_col, value_col], kind="mergesort")
    grp = df.groupby(group_col, sort=False)
    cum = grp["n"].cumsum().to_numpy(np.int64)
    rank = (cum - df["n"].to_numpy(np.int64) + 1)
    size = grp["n"].transform("sum").to_numpy(np.int64)
    denom = np.maximum(size - 1, 1).astype(np.float64)
    df["pct_rank"] = (rank - 1).astype(np.float64) / denom
    df["cume_dist"] = cum.astype(np.float64) / size.astype(np.float64)
    lookup = df[[group_col, value_col, "pct_rank", "cume_dist"]] \
        .reset_index(drop=True)
    lookup_ref = ray.put(lookup)

    def assign(b: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        df = pd.DataFrame({
            id_col: b.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64),
            group_col: b.column(group_col).to_pandas(),
            value_col: b.column(value_col).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        out = df.merge(lk, on=[group_col, value_col], how="left")
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(np.int64)),
            group_col: pa.array(out[group_col], pa.string()),
            value_col: pa.array(out[value_col].to_numpy(np.int64)),
            "pct_rank": pa.array(out["pct_rank"].to_numpy(np.float64)),
            "cume_dist": pa.array(
                out["cume_dist"].to_numpy(np.float64))})

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_skew(ds, group_col: str, value_col: str):
    """Population skewness per group from EXACT integer moment sums ->
    (group, skew).  The grouped_corr discipline: per-batch partials
    (n, s1, s2, s3) over int64 values combine associatively, the
    shuffle carries O(blocks x groups) four-int rows, and the final
    float is one arbitrary-precision-int -> double cast plus the SAME
    IEEE op sequence the SQL oracle spells out
    (num = n^2*s3 - 3n*s1*s2 + 2*s1^3, d = n*s2 - s1^2,
    skew = num / (sqrt(d))^3) — bit-identical across engines.  The int
    products exceed int64, so the merge runs in Python ints (exact);
    the SQL side uses HUGEINT.  Groups with zero variance are dropped
    (SQL: WHERE d > 0)."""
    import math
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        x = df[value_col].to_numpy(np.int64)
        # int64 is exact up to |x| <= 2M AND batch-sum headroom (x^3 <=
        # 8.4e18 edge): vectorized fast path, python-int fallback
        if len(x) == 0 or (np.abs(x).max() < 1_000_000
                           and len(x) < 1_000_000):
            p = pd.DataFrame({group_col: df[group_col], "n": 1,
                              "s1": x, "s2": x * x, "s3": x * x * x})
            g = p.groupby(group_col, sort=False, as_index=False).sum()
            s2s = [str(int(v)) for v in g["s2"]]
            s3s = [str(int(v)) for v in g["s3"]]
        else:
            xi = df[value_col].astype(object)
            p = pd.DataFrame({group_col: df[group_col], "n": 1,
                              "s1": x, "s2": xi * xi,
                              "s3": xi * xi * xi})
            g = p.groupby(group_col, sort=False, as_index=False).sum()
            s2s = [str(v) for v in g["s2"]]
            s3s = [str(v) for v in g["s3"]]
        return pa.table({
            group_col: pa.array(g[group_col], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s1": pa.array(g["s1"].to_numpy(np.int64)),
            "s2": pa.array(s2s, pa.string()),
            "s3": pa.array(s3s, pa.string())})

    # exact big-int partials travel as strings; the per-group count is
    # tiny so the final merge sums python ints per group in one task
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "skew": "float64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"skew": "float64"})
        out_g, out_s = [], []
        for gname, sub in df.groupby(group_col, sort=False):
            n = int(sub["n"].sum())
            s1 = int(sub["s1"].sum())
            s2 = sum(int(v) for v in sub["s2"])
            s3 = sum(int(v) for v in sub["s3"])
            d = n * s2 - s1 * s1
            if d <= 0:
                continue
            num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
            sd = math.sqrt(float(d))
            out_g.append(gname)
            out_s.append(float(num) / (sd * sd * sd))
        return pd.DataFrame({group_col: out_g,
                             "skew": np.array(out_s, np.float64)})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(partials, [group_col], merge,
                                 n_parts=8)


def ngram_frequencies(ds, text_col: str = "text", k: int = 100):
    """Corpus top-k word BIGRAMS (count desc, gram asc tie-break) ->
    pa.Table (gram, n).  Adjacency is over each doc's empty-filtered
    word sequence (split on single spaces), mirroring the SQL
    row_number-then-self-join definition exactly.

    Same scale shape as word_frequencies: per-batch vectorized partial
    counts (one flatten + one shifted comparison, no per-word Python),
    one bounded groupby over distinct grams, per-block partial top-k,
    tiny driver merge."""
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words = pc.split_pattern(b.column(text_col), pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        off = off - off[0]
        flat = words.flatten().to_pandas().to_numpy(object)
        doc = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(off))
        ne = np.fromiter((len(w) > 0 for w in flat), bool, len(flat))
        w, d = flat[ne], doc[ne]
        if len(w) < 2:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        adj = d[1:] == d[:-1]
        grams = pd.Series(w[:-1][adj]).str.cat(
            pd.Series(w[1:][adj]), sep=" ")
        vc = grams.value_counts()
        return pa.table({
            "gram": pa.array(vc.index.to_numpy(object), pa.string()),
            "n": pa.array(vc.to_numpy(np.int64))})

    summed = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("n"))

    def partial_topk(b: pa.Table) -> pa.Table:
        grams = np.asarray(b.column("gram").to_pylist(), dtype=object)
        n = np.asarray(b.column("sum(n)").to_pylist(), dtype=np.int64)
        idx = np.lexsort((grams, -n))[:k]
        return pa.table({"gram": pa.array(grams[idx].tolist(),
                                          pa.string()),
                         "n": pa.array(n[idx], pa.int64())})

    cands = []
    for b in summed.map_batches(partial_topk, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        cands.extend(zip(b.column("gram").to_pylist(),
                         b.column("n").to_pylist()))
    cands.sort(key=lambda t: (-t[1], t[0]))
    top = cands[:k]
    return pa.table({"gram": pa.array([g for g, _ in top], pa.string()),
                     "n": pa.array([n for _, n in top], pa.int64())})


def source_vocab_stats(ds, group_col: str = "source",
                       text_col: str = "text"):
    """Lexical-diversity report per source: total words, distinct words
    and type-token ratio -> (source, n_words, n_distinct, ttr).

    Scale shape: each batch explodes to (source, word) pairs but
    DEDUPLICATES them per batch before the shuffle (map-side combine
    carrying per-batch pair counts), so the exchange moves at most
    n_blocks x |local vocab| rows; one (source, word) groupby sums,
    then a bounded per-source fold.  ttr = n_distinct/n_words is one
    int64/int64 double division — bit-identical vs SQL."""
    from ray.data.aggregate import Sum

    def pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        words = pc.split_pattern(b.column(text_col), pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        off = off - off[0]
        flat = words.flatten().to_pandas().to_numpy(object)
        src = np.repeat(b.column(group_col).to_pandas()
                        .to_numpy(object), np.diff(off))
        ne = np.fromiter((len(w) > 0 for w in flat), bool, len(flat))
        g = pd.DataFrame({group_col: src[ne], "word": flat[ne]}) \
            .groupby([group_col, "word"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col], pa.string()),
            "word": pa.array(idx["word"], pa.string()),
            "cnt": pa.array(g.to_numpy(np.int64))})

    per_word = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby([group_col, "word"]).aggregate(Sum("cnt"))

    def fold(b: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            group_col: b.column(group_col).to_pandas(),
            "n_words": pc.cast(b.column("sum(cnt)"),
                               pa.int64()).to_numpy(),
            "n_distinct": 1}) \
            .groupby(group_col, sort=False, as_index=False).sum()
        return pa.table({
            group_col: pa.array(g[group_col], pa.string()),
            "n_words": pa.array(g["n_words"].to_numpy(np.int64)),
            "n_distinct": pa.array(g["n_distinct"].to_numpy(np.int64))})

    agg = per_word.map_batches(fold, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n_words"), Sum("n_distinct"))

    def finish(b: pa.Table) -> pa.Table:
        nw = pc.cast(b.column("sum(n_words)"), pa.int64()).to_numpy()
        nd = pc.cast(b.column("sum(n_distinct)"), pa.int64()).to_numpy()
        return pa.table({
            group_col: pc.cast(b.column(group_col), pa.string()),
            "n_words": pa.array(nw),
            "n_distinct": pa.array(nd),
            "ttr": pa.array(nd.astype(np.float64)
                            / np.maximum(nw, 1).astype(np.float64))})

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_histogram(ds, group_col: str, value_col: str, *,
                      bucket_width: int = 100):
    """Equal-width histogram per group -> (group, bucket, n_rows) with
    bucket = floor(value / width) (SQL's integer-division bucketing).
    Pure map-side pre-aggregation: each batch collapses to its distinct
    (group, bucket) partial counts before ONE tiny groupby-sum — the
    shuffle payload is O(groups x buckets x blocks), never O(rows)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({
            group_col: b.column(group_col).to_numpy(zero_copy_only=False),
            "bucket": np.floor_divide(v, bucket_width),
        }).groupby([group_col, "bucket"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "bucket"]).aggregate(Sum("n"))

    return agg.map_batches(
        lambda b: pa.table({
            group_col: b.column(group_col),
            "bucket": pc.cast(b.column("bucket"), pa.int64()),
            "n_rows": pc.cast(b.column("sum(n)"), pa.int64())}),
        batch_format="pyarrow")


def grouped_iqr_outliers(ds, group_col: str, value_col: str):
    """Tukey-fence outlier counts per group -> (group, q1, q3,
    n_outliers, n_docs): values outside [q1 - 1.5*IQR, q3 + 1.5*IQR]
    with q1/q3 = DuckDB quantile_disc(0.25/0.75).

    Everything resolves from the SAME single (group, value) count
    aggregate as grouped_percentiles — quantiles via integer-exact
    ceil(p*n/100) index math AND the fence test via the doubled-integer
    comparison 2*v < 2*q1 - 3*(q3-q1) (so the 1.5x multiplier never
    touches floats), so the whole operator is one bounded-cardinality
    shuffle and zero extra passes over the data."""
    import numpy as np
    import pandas as pd

    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(dtype=np.int64)
        cnts = df["count()"].to_numpy(dtype=np.int64)
        total = int(cnts.sum())
        cum = np.cumsum(cnts)
        q1 = int(vals[np.searchsorted(cum, (25 * total + 99) // 100,
                                      side="left")])
        q3 = int(vals[np.searchsorted(cum, (75 * total + 99) // 100,
                                      side="left")])
        iqr3 = 3 * (q3 - q1)
        out_mask = (2 * vals < 2 * q1 - iqr3) | (2 * vals > 2 * q3 + iqr3)
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "q1": [q1], "q3": [q3],
                             "n_outliers": [int(cnts[out_mask].sum())],
                             "n_docs": [total]})

    return hist.groupby(group_col).map_groups(resolve,
                                              batch_format="pandas")


def skyline_2d(ds, *, id_col: str, min_col: str, max_col: str):
    """2-D Pareto skyline: rows not dominated by any other row, where q
    dominates p iff q[min_col] <= p[min_col] AND q[max_col] >=
    p[max_col] with at least one strict.  -> (id_col, min_col, max_col).
    Ties on BOTH dimensions are mutually non-dominating: all such
    duplicates stay in the skyline (the SQL NOT-EXISTS semantics).

    Scale shape (the classic distributed skyline): dominance is
    transitive, so a point dominated inside its own block is dominated
    globally — every batch reduces to its LOCAL skyline map-side
    (vectorized: per-min-value max filter + one sorted cummax scan),
    and only those survivors (for real 2-D data, a sliver of the input)
    move to a single final task that runs the same scan over the union.
    The merge input is O(blocks x local skyline size); if an
    anti-correlated domain ever made that large, replace the final task
    with one more partition level of the same kernel."""

    def _sky(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        mx = df.groupby(min_col)[max_col].transform("max")
        df = df[df[max_col] == mx]
        df = df.sort_values([min_col, max_col], ascending=[True, False],
                            kind="mergesort")
        price = df[min_col].to_numpy()
        size = df[max_col].to_numpy().astype(np.float64)
        grp_first = np.concatenate(([True], price[1:] != price[:-1]))
        cm = np.maximum.accumulate(size)
        prev = np.concatenate(([-np.inf], cm[:-1]))
        # max size among STRICTLY cheaper rows = prev cummax at the
        # first row of each equal-min group (ties share one size here,
        # the per-min max kept above)
        pgm = prev[np.flatnonzero(grp_first)]
        gid = np.cumsum(grp_first) - 1
        return df[size > pgm[gid]]

    def local(b: pa.Table) -> pa.Table:
        df = b.select([id_col, min_col, max_col]).to_pandas()
        return pa.Table.from_pandas(_sky(df), preserve_index=False)

    survivors = ds.map_batches(local, batch_format="pyarrow") \
        .repartition(1)
    return survivors.map_batches(
        lambda df: _sky(df), batch_format="pandas", batch_size=None)


def grouped_gini(ds, group_col: str, value_col: str):
    """Gini impurity of the value distribution per group, in EXACT
    integer arithmetic -> (group, n_rows, ssq, gini_ppm) where
    gini = 1 - sum((c_v/t)^2) = (t^2 - sum(c_v^2)) / t^2, reported in
    parts-per-million via integer floor division so no float summation
    order can diverge from the SQL oracle.

    Scale shape: ONE native (group, value) count aggregation (the
    grouped_median histogram — shuffle bounded by the value domain, not
    the row count), then per-batch partial (t, ssq) sums per group
    (each (group, value) pair appears exactly once globally, so the
    partials are safely combinable) and a tiny final groupby."""
    from ray.data.aggregate import Sum

    hist = ds.groupby([group_col, value_col]).count()

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_col: b.column(group_col).to_pandas(),
            "c": pc.cast(b.column("count()"), pa.int64()).to_numpy(),
        })
        df["c2"] = df["c"] * df["c"]
        g = df.groupby(group_col, sort=False, as_index=False).sum()
        return pa.table({group_col: pa.array(g[group_col]),
                         "t": pa.array(g["c"].to_numpy(np.int64)),
                         "s2": pa.array(g["c2"].to_numpy(np.int64))})

    agg = hist.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("t"), Sum("s2"))

    def finish(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("sum(t)"), pa.int64()).to_numpy()
        s2 = pc.cast(b.column("sum(s2)"), pa.int64()).to_numpy()
        # object dtype: t*t can exceed int64 only at absurd group sizes,
        # but the ppm product (t*t - s2) * 1e6 can overflow first — do
        # the division in Python ints exactly like the HUGEINT oracle
        ppm = np.array([((int(a) * int(a) - int(b_)) * 1_000_000)
                        // (int(a) * int(a)) for a, b_ in zip(t, s2)],
                       np.int64)
        return pa.table({group_col: b.column(group_col),
                         "n_rows": pa.array(t),
                         "ssq": pa.array(s2),
                         "gini_ppm": pa.array(ppm)})

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_kurtosis(ds, group_col: str, value_col: str):
    """Population EXCESS kurtosis per group from exact integer moment
    sums -> (group, kurt).  The grouped_skew discipline extended to the
    4th moment: per-batch partials (n, s1..s4) combine associatively
    (big products as python ints / HUGEINT — s4 and n^3*s4 overflow
    int64 early), and the final float is
        kurt = double(A) / (double(dd) * double(dd)) - 3.0
    with A = n^3*s4 - 4*n^2*s1*s3 + 6*n*s1^2*s2 - 3*s1^4 and
    dd = n*s2 - s1^2 — the same IEEE op sequence both engines, so the
    doubles are bit-identical.  Zero-variance groups drop (dd > 0)."""
    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        x = df[value_col].to_numpy(np.int64)
        # x^4 headroom in int64 needs |x| < 55k AND small batch sums
        if len(x) == 0 or (np.abs(x).max() < 30_000
                           and len(x) < 10_000):
            p = pd.DataFrame({group_col: df[group_col], "n": 1,
                              "s1": x, "s2": x * x, "s3": x ** 3,
                              "s4": x ** 4})
            g = p.groupby(group_col, sort=False, as_index=False).sum()
            s2s = [str(int(v)) for v in g["s2"]]
            s3s = [str(int(v)) for v in g["s3"]]
            s4s = [str(int(v)) for v in g["s4"]]
        else:
            xi = df[value_col].astype(object)
            p = pd.DataFrame({group_col: df[group_col], "n": 1,
                              "s1": x, "s2": xi * xi, "s3": xi ** 3,
                              "s4": xi ** 4})
            g = p.groupby(group_col, sort=False, as_index=False).sum()
            s2s = [str(v) for v in g["s2"]]
            s3s = [str(v) for v in g["s3"]]
            s4s = [str(v) for v in g["s4"]]
        return pa.table({
            group_col: pa.array(g[group_col], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s1": pa.array(g["s1"].to_numpy(np.int64)),
            "s2": pa.array(s2s, pa.string()),
            "s3": pa.array(s3s, pa.string()),
            "s4": pa.array(s4s, pa.string())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "kurt": "float64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"kurt": "float64"})
        out_g, out_k = [], []
        for gname, sub in df.groupby(group_col, sort=False):
            n = int(sub["n"].sum())
            s1 = int(sub["s1"].sum())
            s2 = sum(int(v) for v in sub["s2"])
            s3 = sum(int(v) for v in sub["s3"])
            s4 = sum(int(v) for v in sub["s4"])
            dd = n * s2 - s1 * s1
            if dd <= 0:
                continue
            a = (n ** 3 * s4 - 4 * n * n * s1 * s3
                 + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
            out_g.append(gname)
            out_k.append(float(a) / (float(dd) * float(dd)) - 3.0)
        return pd.DataFrame({group_col: out_g,
                             "kurt": np.array(out_k, np.float64)})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(partials, [group_col], merge,
                                 n_parts=8)


def mannwhitney_u(ds, group_col: str, value_col: str,
                  group_a: str, group_b: str):
    """Mann-Whitney U rank-sum statistic between two groups in EXACT
    integers -> one row (n_a, n_b, two_r_a, two_u_a), where two_r_a is
    the DOUBLED midrank sum of group A (doubling keeps tie-averaged
    ranks integral) and two_u_a = two_r_a - n_a*(n_a+1) = 2*U_A.

    Scale shape: the grouped_median histogram trick — ONE native
    (value, group) count aggregation bounds the exchange by the value
    domain, then a single tiny task walks the sorted histogram once:
    a tie block of size c after p predecessors contributes
    cnt_a * (2p + c + 1) doubled ranks.  No row-level sort anywhere."""

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b.column(group_col), group_a),
                   pc.equal(b.column(group_col), group_b))
        return b.filter(m).select([group_col, value_col])

    hist = ds.map_batches(keep, batch_format="pyarrow") \
        .groupby([value_col, group_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_a": "int64", "n_b": "int64",
                "two_r_a": "int64", "two_u_a": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy()
        cnt = df["count()"].to_numpy(np.int64)
        is_a = (df[group_col] == group_a).to_numpy()
        # per distinct value: total count c and count in A
        first = np.r_[True, vals[1:] != vals[:-1]]
        vid = np.cumsum(first) - 1
        nvals = int(vid[-1]) + 1
        c_tot = np.zeros(nvals, np.int64)
        c_a = np.zeros(nvals, np.int64)
        np.add.at(c_tot, vid, cnt)
        np.add.at(c_a, vid, np.where(is_a, cnt, 0))
        p = np.r_[0, np.cumsum(c_tot)[:-1]]
        two_r_a = int((c_a * (2 * p + c_tot + 1)).sum())
        n_a = int(c_a.sum())
        n_b = int(c_tot.sum()) - n_a
        return pd.DataFrame({"n_a": [n_a], "n_b": [n_b],
                             "two_r_a": [two_r_a],
                             "two_u_a": [two_r_a - n_a * (n_a + 1)]})

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def ks_statistic(ds, group_col: str, value_col: str,
                 group_a: str, group_b: str):
    """Two-sample Kolmogorov-Smirnov statistic in EXACT integers ->
    one row (n_a, n_b, d_num, d_den) with D = d_num / d_den:
    d_num = max over distinct values of |cum_a*n_b - cum_b*n_a| and
    d_den = n_a*n_b — cross-multiplied empirical CDFs, so no float
    division can disagree with the SQL window-sum oracle.

    Same scale shape as mannwhitney_u: ONE bounded (value, group)
    histogram aggregation, one tiny sorted-walk task."""

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b.column(group_col), group_a),
                   pc.equal(b.column(group_col), group_b))
        return b.filter(m).select([group_col, value_col])

    hist = ds.map_batches(keep, batch_format="pyarrow") \
        .groupby([value_col, group_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_a": "int64", "n_b": "int64",
                "d_num": "int64", "d_den": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy()
        cnt = df["count()"].to_numpy(np.int64)
        is_a = (df[group_col] == group_a).to_numpy()
        first = np.r_[True, vals[1:] != vals[:-1]]
        vid = np.cumsum(first) - 1
        nvals = int(vid[-1]) + 1
        c_a = np.zeros(nvals, np.int64)
        c_b = np.zeros(nvals, np.int64)
        np.add.at(c_a, vid, np.where(is_a, cnt, 0))
        np.add.at(c_b, vid, np.where(is_a, 0, cnt))
        cum_a, cum_b = np.cumsum(c_a), np.cumsum(c_b)
        n_a, n_b = int(cum_a[-1]), int(cum_b[-1])
        d_num = int(np.abs(cum_a * n_b - cum_b * n_a).max())
        return pd.DataFrame({"n_a": [n_a], "n_b": [n_b],
                             "d_num": [d_num], "d_den": [n_a * n_b]})

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def emd_1d(ds, group_col: str, value_col: str,
           group_a: str, group_b: str):
    """1-D earth mover's (Wasserstein-1) distance between two groups'
    empirical distributions in EXACT integers -> one row (n_a, n_b,
    emd_num, emd_den) with EMD = emd_num / emd_den:
    emd_num = sum over consecutive distinct values of
    |cum_a*n_b - cum_b*n_a| * (v_next - v), emd_den = n_a*n_b — the
    cross-multiplied-CDF-area identity, so no float division or
    summation order can disagree with the SQL window-sum oracle.
    Complements ks_statistic (sup norm) with the L1 transport norm.

    Scale shape: same as mannwhitney_u/ks_statistic — ONE bounded
    (value, group) histogram aggregation, one tiny sorted-walk task;
    the per-term products are folded through object (arbitrary
    precision) ints so wide value domains cannot silently overflow."""

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b.column(group_col), group_a),
                   pc.equal(b.column(group_col), group_b))
        return b.filter(m).select([group_col, value_col])

    hist = ds.map_batches(keep, batch_format="pyarrow") \
        .groupby([value_col, group_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_a": "int64", "n_b": "int64",
                "emd_num": "int64", "emd_den": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(np.int64)
        cnt = df["count()"].to_numpy(np.int64)
        is_a = (df[group_col] == group_a).to_numpy()
        first = np.r_[True, vals[1:] != vals[:-1]]
        vid = np.cumsum(first) - 1
        nvals = int(vid[-1]) + 1
        v = vals[first]
        c_a = np.zeros(nvals, np.int64)
        c_b = np.zeros(nvals, np.int64)
        np.add.at(c_a, vid, np.where(is_a, cnt, 0))
        np.add.at(c_b, vid, np.where(is_a, 0, cnt))
        cum_a, cum_b = np.cumsum(c_a), np.cumsum(c_b)
        n_a, n_b = int(cum_a[-1]), int(cum_b[-1])
        if nvals > 1:
            terms = (np.abs(cum_a[:-1] * n_b - cum_b[:-1] * n_a)
                     .astype(object) * (v[1:] - v[:-1]).astype(object))
            emd_num = int(terms.sum())
        else:
            emd_num = 0
        return pd.DataFrame({"n_a": [n_a], "n_b": [n_b],
                             "emd_num": [emd_num],
                             "emd_den": [n_a * n_b]}).astype(cols)

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def quantile_map_1d(ds, group_col: str, value_col: str,
                    group_a: str, group_b: str):
    """Quantile normalization (empirical distribution matching): map
    each distinct value of group A onto group B's distribution ->
    (value, n_a_le, mapped) where mapped = min{ y in B :
    cumB(y) * n_a >= cumA(value) * n_b } — the smallest B value whose
    CDF position first reaches the A value's CDF position, in EXACT
    cross-multiplied integers (no float quantile interpolation can
    disagree with the SQL oracle).  The cross-source feature-alignment
    shape (batch-effect removal, score calibration across cohorts).

    Scale shape: the mannwhitney/ks discipline — ONE bounded
    (value, group) histogram aggregation, one tiny sorted-walk task
    doing a single searchsorted."""

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b.column(group_col), group_a),
                   pc.equal(b.column(group_col), group_b))
        return b.filter(m).select([group_col, value_col])

    hist = ds.map_batches(keep, batch_format="pyarrow") \
        .groupby([value_col, group_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"value": "int64", "n_a_le": "int64", "mapped": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(np.int64)
        cnt = df["count()"].to_numpy(np.int64)
        is_a = (df[group_col] == group_a).to_numpy()
        va, ca = vals[is_a], cnt[is_a]
        vb, cb = vals[~is_a], cnt[~is_a]
        n_a, n_b = int(ca.sum()), int(cb.sum())
        if n_a == 0 or n_b == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        cum_a = np.cumsum(ca)
        cum_b = np.cumsum(cb)
        idx = np.searchsorted(cum_b * n_a, cum_a * n_b, side="left")
        return pd.DataFrame({"value": va, "n_a_le": cum_a,
                             "mapped": vb[idx]}).astype(cols)

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def psi_drift(ds, group_col: str, value_col: str,
              group_a: str, group_b: str, *, n_bins: int = 10):
    """Population Stability Index between two groups' distributions
    over COMBINED-decile bins -> ONE row (n_a, n_b, n_bins_used,
    n_bins_skipped, psi_ppm).  The standard ML drift metric
    (PSI < 0.1 stable, > 0.25 shifted).  Bin boundaries are the
    combined distribution's exact discrete quantiles (the
    grouped_percentiles (p*n+99)//100 == DuckDB quantile_disc index
    math), bin membership is the integer count of boundaries below the
    value, and bins empty on either side are SKIPPED and counted
    (deterministic on both engines — no epsilon smoothing).  The one
    float expression ((p-q)*ln(p/q), summed in bin order) mirrors the
    SQL text.

    Scale shape: ONE bounded (value, group) histogram aggregation, one
    tiny sorted-walk task (the mannwhitney/ks/emd discipline)."""
    import math

    def keep(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(b.column(group_col), group_a),
                   pc.equal(b.column(group_col), group_b))
        return b.filter(m).select([group_col, value_col])

    hist = ds.map_batches(keep, batch_format="pyarrow") \
        .groupby([value_col, group_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_a": "int64", "n_b": "int64", "n_bins_used": "int64",
                "n_bins_skipped": "int64", "psi_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(value_col)
        vals = df[value_col].to_numpy(np.int64)
        cnt = df["count()"].to_numpy(np.int64)
        is_a = (df[group_col] == group_a).to_numpy()
        first = np.r_[True, vals[1:] != vals[:-1]]
        vid = np.cumsum(first) - 1
        nvals = int(vid[-1]) + 1
        v = vals[first]
        c_a = np.zeros(nvals, np.int64)
        c_b = np.zeros(nvals, np.int64)
        np.add.at(c_a, vid, np.where(is_a, cnt, 0))
        np.add.at(c_b, vid, np.where(is_a, 0, cnt))
        c_all = c_a + c_b
        cum = np.cumsum(c_all)
        total = int(cum[-1])
        # combined deciles, quantile_disc index math
        bnd = np.array([
            int(v[np.searchsorted(
                cum, (i * 10 * total + 99) // 100, side="left")])
            for i in range(1, n_bins)], np.int64)
        bins = np.searchsorted(bnd, v, side="left")  # #boundaries < v
        n0 = np.zeros(n_bins, np.int64)
        n1 = np.zeros(n_bins, np.int64)
        np.add.at(n0, bins, c_a)
        np.add.at(n1, bins, c_b)
        na, nb = int(c_a.sum()), int(c_b.sum())
        if na == 0 or nb == 0:
            # one side absent: mirrors the SQL exactly (zero PSI sum,
            # every nonempty bin counts as one-sided/skipped)
            return pd.DataFrame([{
                "n_a": na, "n_b": nb, "n_bins_used": 0,
                "n_bins_skipped": int((n0 + n1 > 0).sum()),
                "psi_ppm": 0}]).astype(cols)
        acc, used, skipped = 0.0, 0, 0
        for i in range(n_bins):
            if n0[i] == 0 and n1[i] == 0:
                continue
            if n0[i] == 0 or n1[i] == 0:
                skipped += 1
                continue
            p = int(n0[i]) / na
            q = int(n1[i]) / nb
            acc += (p - q) * math.log(p / q)
            used += 1
        return pd.DataFrame([{
            "n_a": na, "n_b": nb, "n_bins_used": used,
            "n_bins_skipped": skipped,
            "psi_ppm": math.floor(acc * 1_000_000)}]).astype(cols)

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def grouped_weighted_median(ds, group_col: str, value_col: str,
                            weight_col: str):
    """Lower weighted median per group in EXACT integers -> (group,
    wmedian): the smallest value v with 2 * cumweight(v) >= total
    weight (so no float boundary or interpolation can diverge from the
    SQL window-sum oracle).

    Scale shape: per-batch PARTIAL (group, value) weight sums (map-side
    combine — the only exchange then carries weight partials, bounded
    by distinct values per block) feed ONE group-keyed partition pass
    whose resolve merges the partials and walks the sorted histogram.
    A near-unique value domain (prices) makes a native keyed aggregate
    pure overhead — measured 6.8 s -> ~1 s at sf0.1 replacing it with
    this single exchange.  Assumption: a GROUP's distinct values fit a
    partition (grouped_median's documented bound; beyond that use the
    quantile sketch)."""

    wcol = "w"

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col, weight_col]).to_pandas()
        g = df.groupby([group_col, value_col], sort=False,
                       as_index=False)[weight_col].sum()
        return pa.table({
            group_col: pa.array(g[group_col]),
            value_col: pa.array(g[value_col].to_numpy(np.int64)),
            "w": pa.array(g[weight_col].to_numpy(np.int64))})

    hist = ds.map_batches(partial, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "wmedian": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"wmedian": "int64"})
        df = df.groupby([group_col, value_col], sort=False,
                        as_index=False)[wcol].sum()
        df = df.sort_values([group_col, value_col], kind="mergesort")
        w = df[wcol].to_numpy(np.int64)
        g = df[group_col].to_numpy()
        first = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(first) - 1
        cw = pd.Series(w).groupby(gid).cumsum().to_numpy()
        tot = np.zeros(int(gid[-1]) + 1, np.int64)
        np.add.at(tot, gid, w)
        hit = 2 * cw >= tot[gid]
        # hit is monotone within a group (cw increases), so the first
        # hit is where hit flips; the shift stays INSIDE the group
        prev = pd.Series(hit).groupby(gid).shift(
            1, fill_value=False).to_numpy(bool)
        take = hit & ~prev
        vals = df[value_col].to_numpy(np.int64)
        return pd.DataFrame({group_col: g[take],
                             "wmedian": vals[take]})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(hist, [group_col], resolve, n_parts=8)


def gini_mean_difference(ds, group_col: str, value_col: str,
                         id_col: str):
    """Gini mean difference per group in EXACT integers -> (group,
    gmd_num, n_pairs) with GMD = gmd_num / n_pairs:
    gmd_num = sum over all unordered pairs of |x_i - x_j|, computed
    WITHOUT pairing via the order-statistic identity
    sum_{i<j}(x_(j) - x_(i)) = sum_i (2i - n + 1) * x_(i)  (0-based i),
    which a tie block of c equal values v starting at position p
    contributes  v * (2*(c*p + c*(c-1)/2) - c*(n-1))  to — so one
    bounded (group, value) histogram is all that ever shuffles (the
    mannwhitney_u discipline; no row-level sort, no O(n^2) pairs)."""

    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "gmd_num": "int64",
                "n_pairs": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"gmd_num": "int64", "n_pairs": "int64"})
        df = df.sort_values([group_col, value_col], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        c = df["count()"].to_numpy(np.int64)
        first = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(first) - 1
        ngroups = int(gid[-1]) + 1
        n = np.zeros(ngroups, np.int64)
        np.add.at(n, gid, c)
        # start position p of each tie block inside its group
        cum = pd.Series(c).groupby(gid).cumsum().to_numpy()
        p = cum - c
        contrib = v * (2 * (c * p + c * (c - 1) // 2) - c * (n[gid] - 1))
        num = np.zeros(ngroups, np.int64)
        np.add.at(num, gid, contrib)
        out_g = g[first]
        return pd.DataFrame({group_col: out_g,
                             "gmd_num": num,
                             "n_pairs": n * (n - 1) // 2})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(hist, [group_col], resolve, n_parts=8)


def grouped_chi2_cells(ds, group_col: str, value_col: str,
                       null_value: str = "und"):
    """Chi-square contingency cells for a (group, value) cross-tab in
    EXACT integer arithmetic: per cell, expected_ppm =
    floor(row_tot*col_tot*1e6 / N) and chi2_term_ppm =
    floor((o*N - row_tot*col_tot)^2 * 1e6 / (row_tot*col_tot*N)) —
    the (o-e)^2/e term cleared of float division so no summation order
    can diverge from a HUGEINT oracle.

    Scale shape: ONE native (group, value) count aggregation (shuffle
    bounded by the domain product, not the row count); the margins and
    per-cell terms come from the tiny cross-tab on the driver (same
    discipline as lang_pivot's reshape — |groups| x |values| rows,
    independent of corpus size)."""
    def prep(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()), null_value)
        v = pc.fill_null(pc.cast(b.column(value_col), pa.string()), null_value)
        return pa.table({group_col: g, value_col: v})

    hist = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby([group_col, value_col]).count()
    rows = hist.take_all()
    if not rows:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             value_col: pd.Series([], dtype=object),
                             "observed": pd.Series([], dtype=np.int64),
                             "expected_ppm": pd.Series([], dtype=np.int64),
                             "chi2_term_ppm": pd.Series([], dtype=np.int64)})
    df = pd.DataFrame(rows).rename(columns={"count()": "o"})
    df["o"] = df["o"].astype(object).map(int)
    n = int(df["o"].sum())
    rtot = df.groupby(group_col)["o"].transform("sum").map(int)
    ctot = df.groupby(value_col)["o"].transform("sum").map(int)
    exp_ppm, term_ppm = [], []
    for o, r, c in zip(df["o"], rtot, ctot):
        rc = r * c
        exp_ppm.append(rc * 1_000_000 // n)
        d = o * n - rc
        term_ppm.append(d * d * 1_000_000 // (rc * n))
    out = pd.DataFrame({group_col: df[group_col],
                        value_col: df[value_col],
                        "observed": df["o"].astype(np.int64),
                        "expected_ppm": np.array(exp_ppm, np.int64),
                        "chi2_term_ppm": np.array(term_ppm, np.int64)})
    return out.reset_index(drop=True)


def grouped_entropy(ds, group_col: str, value_col: str,
                    null_value: str = "und"):
    """Shannon entropy (nats) of the value mix per group, reported as
    floor(H * 1e6) -> (group, n_rows, entropy_ppm).  H is a float, but
    both engines derive it from the SAME exact integer counts; the ppm
    floor leaves ~1e10 units of slack above double rounding noise, and
    the driver-side sum runs in sorted value order for determinism.

    Scale shape: identical to grouped_chi2_cells — one native
    (group, value) count, tiny cross-tab finish."""
    import math

    def prep(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()), null_value)
        v = pc.fill_null(pc.cast(b.column(value_col), pa.string()), null_value)
        return pa.table({group_col: g, value_col: v})

    hist = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby([group_col, value_col]).count()
    rows = hist.take_all()
    if not rows:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "entropy_ppm": pd.Series([], dtype=np.int64)})
    df = pd.DataFrame(rows).rename(columns={"count()": "o"}) \
        .sort_values([group_col, value_col])
    out_g, out_n, out_e = [], [], []
    for g, grp in df.groupby(group_col, sort=True):
        t = int(grp["o"].sum())
        h = 0.0
        for o in grp["o"]:
            p = int(o) / t
            h += -p * math.log(p)
        out_g.append(g)
        out_n.append(t)
        out_e.append(math.floor(h * 1_000_000))
    return pd.DataFrame({group_col: out_g,
                         "n_rows": np.array(out_n, np.int64),
                         "entropy_ppm": np.array(out_e, np.int64)})


def grouped_geomean(ds, group_col: str, value_col: str,
                    scale: int = 1000):
    """Geometric mean of a positive measure per group as
    floor(exp(mean(ln v)) * scale + 0.5) -> (group, n_pos,
    geomean_milli).  Rows with v <= 0 or null are excluded (matching
    the SQL's WHERE v > 0 gate).  The +0.5 (round-half-up, identical
    expression in the SQL) keeps EXACT-integer geomeans — where
    exp(ln x) lands one ulp under x — mid-interval instead of on the
    floor boundary.  Distributed: per-batch partial (sum ln, count)
    combine under a native Sum — float partials, but the milli
    quantum sits ~1e7 units above cross-engine summation-order
    noise."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()), "")
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        mask = np.isfinite(v) & (v > 0)
        df = pd.DataFrame({group_col: g.to_numpy(zero_copy_only=False),
                           "lnv": np.where(mask, np.log(
                               np.where(mask, v, 1.0)), 0.0),
                           "n": mask.astype(np.int64)})
        agg = df.groupby(group_col, sort=False, as_index=False).sum()
        return pa.table({group_col: pa.array(agg[group_col]),
                         "lnsum": pa.array(agg["lnv"].to_numpy(np.float64)),
                         "n": pa.array(agg["n"].to_numpy(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("lnsum"), Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        import math
        ln = pc.cast(b.column("sum(lnsum)"), pa.float64()).to_numpy()
        n = pc.cast(b.column("sum(n)"), pa.int64()).to_numpy()
        keep = n > 0  # a group with no positive rows has no geomean
        gm = [math.floor(math.exp(s / k) * scale + 0.5)
              for s, k in zip(ln[keep], n[keep])]
        return pa.table({group_col: b.column(group_col).filter(
                             pa.array(keep)),
                         "n_pos": pa.array(n[keep]),
                         "geomean_milli": pa.array(np.array(gm, np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_trimmed_mean(ds, group_col: str, value_col: str,
                         trim_den: int = 10, scale: int = 1000):
    """10%-trimmed mean per group in EXACT integers -> (group, n_rows,
    n_kept, trimmed_mean_milli): drop the lo = n // trim_den smallest
    and largest rows by value rank, mean of the rest as
    floor(sum * scale / n_kept).  Rank cuts inside a tie block are
    value-identical, so the kept SUM is well-defined without any
    row-level ordering — only the bounded (group, value) histogram
    shuffles (the grouped_gmd discipline), and the per-bucket
    bottom/top removals come from segmented cumulative counts."""
    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "n_rows": "int64",
                "n_kept": "int64", "trimmed_mean_milli": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {k: t for k, t in cols.items() if k != group_col})
        df = df.sort_values([group_col, value_col], kind="mergesort")
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        c = df["count()"].to_numpy(np.int64)
        first = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(first) - 1
        ngroups = int(gid[-1]) + 1
        n = np.zeros(ngroups, np.int64)
        np.add.at(n, gid, c)
        lo = n // trim_den
        cum = pd.Series(c).groupby(gid).cumsum().to_numpy()
        prev = cum - c
        bot = np.clip(lo[gid] - prev, 0, c)
        top = np.clip(lo[gid] - (n[gid] - cum), 0, c)
        kept = np.clip(c - bot - top, 0, None)
        sums = np.zeros(ngroups, np.int64)
        np.add.at(sums, gid, v * kept)
        n_kept = n - 2 * lo
        tm = np.array([int(s) * scale // int(k) if k > 0 else 0
                       for s, k in zip(sums, n_kept)], np.int64)
        return pd.DataFrame({group_col: g[first],
                             "n_rows": n, "n_kept": n_kept,
                             "trimmed_mean_milli": tm})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(hist, [group_col], resolve, n_parts=8)


def global_row_number(ds, key_col: str, id_col: str):
    """Global ROW_NUMBER() OVER (ORDER BY key, id) WITHOUT a global
    sort -> (id, key, global_rank), 1-based.

    Two-phase zipWithIndex: (1) one native groupby(key).count() builds
    the key histogram whose exclusive prefix sums are each key's rank
    offset (broadcast once via ray.put — the histogram is bounded by
    the KEY cardinality, not rows; for bounded-domain keys like text
    lengths that is thousands of entries at 100 TB); (2) one
    key-partitioned pass ranks ids WITHIN each key (vectorized
    sort + per-key cumcount across the whole partition).  For truly
    continuous keys where the histogram itself would not fit, use a
    range-partitioned sort instead — this op trades on the bounded
    domain.  No stage ever holds more than a partition."""
    import ray
    from .dedup import _grouped_by_partition

    hist = ds.groupby(key_col).count().to_pandas()
    if len(hist) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            key_col: pd.Series([], dtype=np.int64),
            "global_rank": pd.Series([], dtype=np.int64)}))
    hist = hist.sort_values(key_col)
    keys = hist[key_col].to_numpy(np.int64)
    cnt = hist["count()"].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    lut_ref = ray.put((keys, offsets))

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 key_col: np.empty(0, np.int64),
                                 "global_rank": np.empty(0, np.int64)})
        k_arr, off = ray.get(lut_ref)
        df = df.sort_values([key_col, id_col], kind="mergesort")
        kv = df[key_col].to_numpy(np.int64)
        within = df.groupby(key_col, sort=False).cumcount().to_numpy()
        base = off[np.searchsorted(k_arr, kv)]
        return pd.DataFrame({id_col: df[id_col].to_numpy(np.int64),
                             key_col: kv,
                             "global_rank": base + within + 1})

    return _grouped_by_partition(
        ds.map_batches(lambda t: t.select([key_col, id_col]),
                       batch_format="pyarrow"),
        [key_col], rank_part)


def woe_iv(ds, bucket_col: str, flag_col: str):
    """Weight-of-evidence / information-value table for a categorical
    feature vs a boolean event -> (bucket, n_bad, n_good, woe_ppm,
    iv_ppb).  The grouped_entropy discipline: ONE native
    (bucket, flag) count shuffle (bounded by the bucket x 2 key
    space), tiny driver finish; woe = ln((bad_i/B)/(good_i/G)) is a
    float, but both engines derive it from the SAME exact integer
    counts with the SAME op order, and the ppm/ppb floors leave wide
    slack above double rounding noise.  Buckets missing an outcome are
    dropped (woe undefined), matching the SQL's WHERE guard."""
    import math

    hist = ds.map_batches(
        lambda b: pa.table({bucket_col: b.column(bucket_col),
                            "_bad": pc.cast(b.column(flag_col),
                                            pa.int64())}),
        batch_format="pyarrow").groupby([bucket_col, "_bad"]).count()
    rows = hist.take_all()
    empty = pd.DataFrame({bucket_col: pd.Series([], dtype=np.int64),
                          "n_bad": pd.Series([], dtype=np.int64),
                          "n_good": pd.Series([], dtype=np.int64),
                          "woe_ppm": pd.Series([], dtype=np.int64),
                          "iv_ppb": pd.Series([], dtype=np.int64)})
    if not rows:
        return empty
    df = pd.DataFrame(rows).rename(columns={"count()": "n"})
    piv = df.pivot_table(index=bucket_col, columns="_bad", values="n",
                         aggfunc="sum", fill_value=0)
    bad = piv[1].to_numpy(np.int64) if 1 in piv.columns \
        else np.zeros(len(piv), np.int64)
    good = piv[0].to_numpy(np.int64) if 0 in piv.columns \
        else np.zeros(len(piv), np.int64)
    B, G = int(bad.sum()), int(good.sum())
    out_b, out_nb, out_ng, out_w, out_iv = [], [], [], [], []
    for bkt, nb, ng in zip(piv.index.to_numpy(), bad, good):
        nb, ng = int(nb), int(ng)
        if nb == 0 or ng == 0 or B == 0 or G == 0:
            continue
        pb = nb / B
        pg = ng / G
        woe = math.log(pb / pg)
        iv = (pb - pg) * woe
        out_b.append(int(bkt)); out_nb.append(nb); out_ng.append(ng)
        out_w.append(math.floor(woe * 1_000_000))
        out_iv.append(math.floor(iv * 1_000_000_000))
    if not out_b:
        return empty
    return pd.DataFrame({bucket_col: np.array(out_b, np.int64),
                         "n_bad": np.array(out_nb, np.int64),
                         "n_good": np.array(out_ng, np.int64),
                         "woe_ppm": np.array(out_w, np.int64),
                         "iv_ppb": np.array(out_iv, np.int64)})


def smoothed_target_mean(ds, cat_col: str, target_col: str,
                         m: int = 20, scale: int = 1000):
    """Smoothed target encoding (the classic mean-encoding feature):
    enc(cat) = (sum_target_cat + m * prior) / (n_cat + m), prior = the
    global mean -> (cat, n_rows, enc_milli).  ONE native groupby over
    exact integer (sum, count) partials; the global prior is the sum
    of those SAME partials (no second scan).  Float op order is spelled
    identically in the oracle SQL; floor(enc * scale) leaves wide slack
    above double noise."""
    import math
    from ray.data.aggregate import Sum, Count

    agg = ds.map_batches(
        lambda b: pa.table({cat_col: b.column(cat_col),
                            "_t": pc.cast(b.column(target_col),
                                          pa.int64())}),
        batch_format="pyarrow").groupby(cat_col) \
        .aggregate(Sum("_t"), Count()).to_pandas()
    if len(agg) == 0:
        return pd.DataFrame({cat_col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "enc_milli": pd.Series([], dtype=np.int64)})
    sums = agg["sum(_t)"].to_numpy(np.int64)
    cnts = agg["count()"].to_numpy(np.int64)
    prior = float(int(sums.sum())) / float(int(cnts.sum()))
    enc = [math.floor((float(int(s)) + float(m) * prior)
                      / float(int(n) + m) * scale)
           for s, n in zip(sums, cnts)]
    return pd.DataFrame({cat_col: agg[cat_col],
                         "n_rows": cnts,
                         "enc_milli": np.array(enc, np.int64)})


def grouped_kendall(ds, group_col: str, x_col: str, y_col: str):
    """Exact Kendall tau-b pair counts per group -> (group, n_pairs,
    n_concordant, n_discordant, n_tie_x, n_tie_y, n_tie_both) — ALL
    integers, so the oracle comparison has no float boundary at all
    (tau-b itself is derivable from the counts).

    ONE hash-partition exchange on the group key; within a partition
    every group's full pair set is enumerated with the repeat/offset
    ragged-window trick (no per-group Python loop) and classified with
    vectorized sign comparisons.  Partitioning assumption: per-group
    pair counts are quadratic in group size, so group sizes must be
    bounded (sessions/users, not the whole corpus) — for larger groups
    use an O(n log n) inversion count per group instead."""
    from .dedup import _grouped_by_partition

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series([], dtype=np.int64),
            "n_pairs": pd.Series([], dtype=np.int64),
            "n_concordant": pd.Series([], dtype=np.int64),
            "n_discordant": pd.Series([], dtype=np.int64),
            "n_tie_x": pd.Series([], dtype=np.int64),
            "n_tie_y": pd.Series([], dtype=np.int64),
            "n_tie_both": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        gid, guniq = pd.factorize(df[group_col], sort=False)
        order = np.argsort(gid, kind="stable")
        gid = gid[order]
        x = df[x_col].to_numpy(np.int64)[order]
        y = df[y_col].to_numpy(np.int64)[order]
        n = len(gid)
        # group-run boundaries -> all intra-group (i<j) pairs
        starts = np.concatenate(([0], np.flatnonzero(np.diff(gid)) + 1))
        ends = np.concatenate((starts[1:], [n]))
        c = ends - starts
        idx = np.arange(n)
        cnt = np.repeat(ends, c) - idx - 1  # pairs to the right, in-group
        total = int(cnt.sum())
        if total == 0:
            return empty
        left = np.repeat(idx, cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        right = left + 1 + offs
        xl, xr = x[left], x[right]
        yl, yr = y[left], y[right]
        dx = (xr > xl).astype(np.int8) - (xr < xl).astype(np.int8)
        dy = (yr > yl).astype(np.int8) - (yr < yl).astype(np.int8)
        # one fused (group, category) bincount instead of six scattered
        # np.add.at passes (measured ~10x on 10^7-pair partitions):
        # cat 0 = concordant, 1 = discordant, 2 = tie_x, 3 = tie_y,
        # 4 = tie_both
        prod = dx * dy
        cat = np.full(total, 3, np.int64)
        cat[prod > 0] = 0
        cat[prod < 0] = 1
        zx = dx == 0
        cat[zx & (dy != 0)] = 2
        cat[zx & (dy == 0)] = 4
        pg = gid[left]
        ng = int(gid[-1]) + 1
        counts = np.bincount(pg * 5 + cat,
                             minlength=ng * 5).reshape(ng, 5)
        npair = counts.sum(axis=1)
        present = npair > 0
        return pd.DataFrame({
            group_col: np.asarray(guniq)[present],
            "n_pairs": npair[present].astype(np.int64),
            "n_concordant": counts[present, 0].astype(np.int64),
            "n_discordant": counts[present, 1].astype(np.int64),
            "n_tie_x": counts[present, 2].astype(np.int64),
            "n_tie_y": counts[present, 3].astype(np.int64),
            "n_tie_both": counts[present, 4].astype(np.int64)})

    # pair work is QUADRATIC in group size, so the adaptive
    # collapse-to-one-task gate must trip far earlier than the default
    # 1M rows: 64k rows is ~tens of millions of pairs, still a
    # sub-second single task after the fused bincount
    return _grouped_by_partition(
        ds.map_batches(lambda t: t.select([group_col, x_col, y_col]),
                       batch_format="pyarrow"),
        [group_col], pairs, small_rows=65_536)


def mutual_information(ds, col_a: str, col_b: str,
                       null_value: str = "und"):
    """Mutual information between two categorical columns, with the
    marginal and joint entropies -> ONE row (n_rows, h_a_ppm, h_b_ppm,
    h_joint_ppm, mi_ppm), all ppm-floored nats.  The feature-redundancy
    / leakage screen: MI(label, split_key) >> 0 means the split leaks.

    All four floats derive from the SAME exact integer (a, b) counts;
    terms accumulate in sorted key order and MI = H(a) + H(b) -
    H(joint) is computed in FLOAT before its own floor (the SQL
    mirrors the expression, not the rounded parts).  Scale shape: one
    bounded (a, b) histogram aggregate (the contingency shape), tiny
    driver finish."""
    import math

    def prep(b: pa.Table) -> pa.Table:
        a = pc.fill_null(pc.cast(b.column(col_a), pa.string()), null_value)
        v = pc.fill_null(pc.cast(b.column(col_b), pa.string()), null_value)
        return pa.table({col_a: a, col_b: v})

    rows = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby([col_a, col_b]).count().take_all()
    cols = ["n_rows", "h_a_ppm", "h_b_ppm", "h_joint_ppm", "mi_ppm"]
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    df = pd.DataFrame(rows).rename(columns={"count()": "o"})
    t = int(df["o"].sum())

    def ent(series_counts) -> float:
        h = 0.0
        for o in series_counts:
            p = int(o) / t
            h += -p * math.log(p)
        return h

    ha = ent(df.groupby(col_a)["o"].sum().sort_index())
    hb = ent(df.groupby(col_b)["o"].sum().sort_index())
    hj = ent(df.sort_values([col_a, col_b])["o"])
    return pd.DataFrame([{
        "n_rows": t,
        "h_a_ppm": math.floor(ha * 1_000_000),
        "h_b_ppm": math.floor(hb * 1_000_000),
        "h_joint_ppm": math.floor(hj * 1_000_000),
        "mi_ppm": math.floor((ha + hb - hj) * 1_000_000),
    }]).astype(np.int64)


def grouped_spearman(ds, group_col: str, x_col: str, y_col: str):
    """Spearman rank correlation per group -> (group, n, rho), exact
    to the bit vs SQL: ranks are DOUBLED MIDRANKS (2*rank + ties - 1,
    an integer — the mannwhitney_chars discipline), the moment sums
    over them are exact int64, and rho is Pearson over those integers
    computed with the same IEEE op sequence as grouped_corr.

    Needs whole-group rank context, so it is one group-keyed partition
    pass (cardinality = group count, e.g. sources), NOT a row shuffle
    per value; within the pass ranking is pandas' C rank kernel.
    int64-safe while n_group <= ~1e6 (sxx <= n*(2n)^2)."""
    import math

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "n": "int64", "rho": "float64"}
        out_rows = []
        if len(df):
            for g, sub in df.groupby(group_col, sort=False):
                x = sub[x_col].to_numpy(np.int64)
                y = sub[y_col].to_numpy(np.int64)
                n = len(sub)
                # doubled midranks: 2 * average-rank, always integral
                dx = (pd.Series(x).rank(method="average")
                      .to_numpy(np.float64) * 2).astype(np.int64)
                dy = (pd.Series(y).rank(method="average")
                      .to_numpy(np.float64) * 2).astype(np.int64)
                sx, sy = int(dx.sum()), int(dy.sum())
                sxx = int((dx * dx).sum())
                syy = int((dy * dy).sum())
                sxy = int((dx * dy).sum())
                vx = n * sxx - sx * sx
                vy = n * syy - sy * sy
                if vx <= 0 or vy <= 0:
                    continue
                num = float(n * sxy - sx * sy)
                den = math.sqrt(float(vx)) * math.sqrt(float(vy))
                out_rows.append({group_col: g, "n": n,
                                 "rho": num / den})
        if not out_rows:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "rho": pd.Series([], dtype="float64")})
        return pd.DataFrame(out_rows)[list(cols)]

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, [group_col], per_group)


def _group_word_counts(ds, group_col: str = "source",
                       text_col: str = "text"):
    """(group, word, cnt) exact term counts: per-batch explode +
    LOCAL (group, word) pre-count (map-side combine) then one native
    groupby sum — the shuffle carries at most n_blocks x |local
    vocab| rows, never raw tokens.  Shared by source_vocab_stats-class
    lexical ops."""
    from ray.data.aggregate import Sum

    def pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        words = pc.split_pattern(
            pc.coalesce(b.column(text_col), pa.scalar("")), pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        off = off - off[0]
        flat = words.flatten().to_pandas().to_numpy(object)
        src = np.repeat(b.column(group_col).to_pandas()
                        .to_numpy(object), np.diff(off))
        ne = np.fromiter((len(w) > 0 for w in flat), bool, len(flat))
        g = pd.DataFrame({group_col: src[ne], "word": flat[ne]}) \
            .groupby([group_col, "word"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            group_col: pa.array(idx[group_col], pa.string()),
            "word": pa.array(idx["word"], pa.string()),
            "cnt": pa.array(g.to_numpy(np.int64))})

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby([group_col, "word"]).aggregate(Sum("cnt"))


def hapax_stats(ds, group_col: str = "source", text_col: str = "text"):
    """Hapax-legomena rate per group: words occurring EXACTLY ONCE
    within the group vs its distinct vocabulary -> (group, n_words,
    n_distinct, n_hapax, hapax_ppm).  Vocabulary-freshness signal
    (high hapax share = productive/unbounded vocab, low = template
    text) — the truncated-integer ppm makes the rate oracle-exact.

    Shuffle = the shared (group, word) count exchange; the per-group
    fold is a bounded batch pass over unique terms (map-side partial
    -> one tiny groupby)."""
    from ray.data.aggregate import Sum

    per_word = _group_word_counts(ds, group_col, text_col)

    def fold(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b.column("sum(cnt)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        g = pd.DataFrame({group_col: b.column(group_col).to_pandas(),
                          "n_words": cnt, "n_distinct": 1,
                          "n_hapax": (cnt == 1).astype(np.int64)}) \
            .groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = per_word.map_batches(fold, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n_words"), Sum("n_distinct"),
                                      Sum("n_hapax"))

    def finish(b: pa.Table) -> pa.Table:
        nw = pc.cast(b.column("sum(n_words)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        nd = pc.cast(b.column("sum(n_distinct)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        nh = pc.cast(b.column("sum(n_hapax)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            group_col: pc.cast(b.column(group_col), pa.string()),
            "n_words": pa.array(nw), "n_distinct": pa.array(nd),
            "n_hapax": pa.array(nh),
            "hapax_ppm": pa.array(nh * 1_000_000
                                  // np.maximum(nd, 1))})

    return agg.map_batches(finish, batch_format="pyarrow")


def source_bow_gram(ds, group_col: str = "source",
                    text_col: str = "text"):
    """Bag-of-words Gram matrix between group term-count vectors:
    every (a <= b) group pair's EXACT integer dot product
    sum_w cnt_a(w)*cnt_b(w) -> (src_a, src_b, dot); the diagonal rows
    ARE the squared norms, so cosine similarity is derivable
    downstream without any float leaving the engine.

    Scale shape: the shared (group, word) count exchange, then a
    word-keyed partition pass emits per-partition PARTIAL pair
    products (each word contributes its <= G^2/2 local outer
    product), and one tiny (src_a, src_b) groupby sums them — the
    second shuffle carries O(parts x G^2) rows, independent of corpus
    size.  int64-safe while sum cnt_a*cnt_b < 2^63 (holds far past
    1e9-token groups for natural vocabularies)."""
    from ray.data.aggregate import Sum

    per_word = _group_word_counts(ds, group_col, text_col)

    def pair_products(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src_a": "object", "src_b": "object", "dot": "int64"}
        if len(df) == 0:
            return pd.DataFrame(
                {"src_a": pd.Series([], dtype=object),
                 "src_b": pd.Series([], dtype=object),
                 "dot": pd.Series([], dtype="int64")})
        d = pd.DataFrame({"word": df["word"].to_numpy(object),
                          "src": df[group_col].to_numpy(object),
                          "cnt": df["sum(cnt)"].to_numpy(np.int64)})
        m = d.merge(d, on="word", suffixes=("_a", "_b"))
        m = m[m["src_a"] <= m["src_b"]]
        m["dot"] = m["cnt_a"] * m["cnt_b"]
        out = m.groupby(["src_a", "src_b"], as_index=False)["dot"].sum()
        return out.astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(per_word, ["word"], pair_products)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_a": pc.cast(b.column("src_a"), pa.string()),
            "src_b": pc.cast(b.column("src_b"), pa.string()),
            "dot": pc.cast(b.column("sum(dot)"), pa.int64())})

    return partials.groupby(["src_a", "src_b"]).aggregate(Sum("dot")) \
        .map_batches(finish, batch_format="pyarrow")


def grouped_absdev(ds, group_col: str, value_col: str):
    """Brown-Forsythe dispersion partials per group: the EXACT sum of
    |x - median_g| around the group's discrete median
    (sorted[(n-1)//2], the quantile_disc 0.5 convention) ->
    (group, n, median, sum_absdev) — all int64, no float anywhere.
    The robust-variance screen behind Levene/Brown-Forsythe tests.

    Median needs whole-group order context -> one group-keyed
    partition pass; inside, a (group, value) lexsort gives every
    median by index and the absolute deviations vectorize."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "n": "int64", "median": "int64",
                "sum_absdev": "int64"}
        if len(df) == 0:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "median": pd.Series([], dtype="int64"),
                 "sum_absdev": pd.Series([], dtype="int64")})
        codes, uniques = pd.factorize(df[group_col], sort=False)
        x = df[value_col].to_numpy(np.int64)
        o = np.lexsort((x, codes))
        cs, xs = codes[o], x[o]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        sizes = np.diff(np.r_[starts, len(cs)])
        med = xs[starts + (sizes - 1) // 2]
        dev = np.abs(xs - np.repeat(med, sizes))
        sums = np.add.reduceat(dev, starts)
        return pd.DataFrame({
            group_col: np.asarray(uniques, object)[cs[starts]],
            "n": sizes.astype(np.int64), "median": med,
            "sum_absdev": sums.astype(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, [group_col], per_group)


def top_word_per_source(ds, group_col: str = "source",
                        text_col: str = "text"):
    """Most frequent word per group (tie -> lexicographically smallest
    word) -> (group, top_word, cnt).  The argmax-over-vocabulary
    shape on the shared (group, word) count exchange.

    Map-side candidate generation: every post-aggregation batch emits
    its local top-1 per group (counts are already global there), so
    the final resolve touches O(groups x blocks) candidate rows, not
    the vocabulary."""

    per_word = _group_word_counts(ds, group_col, text_col)

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        d = pd.DataFrame({group_col: b.column(group_col).to_pandas(),
                          "word": b.column("word").to_pandas(),
                          "cnt": pc.cast(b.column("sum(cnt)"),
                                         pa.int64()).to_numpy(
                              zero_copy_only=False)})
        d = d.sort_values([group_col, "cnt", "word"],
                          ascending=[True, False, True],
                          kind="mergesort").drop_duplicates(group_col)
        return pa.Table.from_pandas(d, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "top_word": "object",
                "cnt": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        d = df.sort_values([group_col, "cnt", "word"],
                           ascending=[True, False, True],
                           kind="mergesort").drop_duplicates(group_col)
        return pd.DataFrame({
            group_col: d[group_col].to_numpy(object),
            "top_word": d["word"].to_numpy(object),
            "cnt": d["cnt"].to_numpy(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    cands = per_word.map_batches(local_top, batch_format="pyarrow")
    return _grouped_by_partition(cands, [group_col], resolve)


def source_vocab_jaccard(ds, group_col: str = "source",
                         text_col: str = "text"):
    """Pairwise vocabulary Jaccard between groups: for every group
    pair (a < b) sharing at least one word, |V_a ∩ V_b| via the
    shared (group, word) count exchange and a word-keyed partition
    pass (each word emits its local strict-pair grid), plus each
    group's distinct-vocabulary size -> (src_a, src_b, n_a, n_b,
    n_inter, jaccard_ppm = truncated |∩|*1e6 // |∪|).  The
    corpus-overlap screen behind source-contamination audits.

    Scale shape: the pair exchange carries O(parts x G^2) rows
    (G = group count), never tokens; the G vocabulary sizes are a
    bounded driver-side dict (groups = sources, O(10^2)), looked up
    inside the finishing map — the lang_pivot small-side precedent."""
    from ray.data.aggregate import Sum

    per_word = _group_word_counts(ds, group_col, text_col)
    mat = per_word.materialize()

    def sizes_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64())})
        g = pd.Series(b.column(group_col).to_pandas()).value_counts()
        return pa.table({group_col: pa.array(g.index, pa.string()),
                         "nd": pa.array(g.to_numpy(np.int64))})

    size_rows = mat.map_batches(sizes_fold, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("nd")).take_all()
    sizes = {r[group_col]: int(r["sum(nd)"]) for r in size_rows}

    def pair_emit(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src_a": "object", "src_b": "object", "inter": "int64"}
        if len(df) == 0:
            return pd.DataFrame(
                {"src_a": pd.Series([], dtype=object),
                 "src_b": pd.Series([], dtype=object),
                 "inter": pd.Series([], dtype="int64")})
        d = pd.DataFrame({"word": df["word"].to_numpy(object),
                          "src": df[group_col].to_numpy(object)})
        m = d.merge(d, on="word", suffixes=("_a", "_b"))
        m = m[m["src_a"] < m["src_b"]]
        if len(m) == 0:
            return pd.DataFrame(
                {"src_a": pd.Series([], dtype=object),
                 "src_b": pd.Series([], dtype=object),
                 "inter": pd.Series([], dtype="int64")})
        out = m.groupby(["src_a", "src_b"], as_index=False).size() \
            .rename(columns={"size": "inter"})
        return out.astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(mat, ["word"], pair_emit)
    agg = partials.groupby(["src_a", "src_b"]).aggregate(Sum("inter"))

    def finish(b: pa.Table) -> pa.Table:
        sa = b.column("src_a").to_pandas().to_numpy(object)
        sb = b.column("src_b").to_pandas().to_numpy(object)
        inter = pc.cast(b.column("sum(inter)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        na = np.fromiter((sizes.get(s, 0) for s in sa), np.int64,
                         len(sa))
        nb = np.fromiter((sizes.get(s, 0) for s in sb), np.int64,
                         len(sb))
        union = np.maximum(na + nb - inter, 1)
        return pa.table({
            "src_a": pa.array(sa, pa.string()),
            "src_b": pa.array(sb, pa.string()),
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "n_inter": pa.array(inter),
            "jaccard_ppm": pa.array(inter * 1_000_000 // union)})

    return agg.map_batches(finish, batch_format="pyarrow")


def equiwidth_histogram(ds, value_col: str, *, n_bins: int = 10):
    """Equi-width histogram over an integer column: bin = (x - min)
    * n_bins // (max - min + 1) from the GLOBAL min/max ->
    (bin, lo, hi, n_rows) with lo/hi the exact integer bin bounds.
    Pure integer binning, so both engines place every row
    identically — no float edge can split a value.

    Two cheap passes, both map-side combined: a tiny Min/Max
    aggregate, then per-batch bincounts summed in one bounded
    groupby.  The min/max scalar pair broadcasts by closure (two
    ints, not a table)."""
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo_v, hi_v = mm.get(f"min({value_col})"), mm.get(f"max({value_col})")
    cols = {"bin": "int64", "lo": "int64", "hi": "int64",
            "n_rows": "int64"}
    if lo_v is None or hi_v is None:
        return pd.DataFrame(columns=list(cols)).astype(cols)
    lo_v, hi_v = int(lo_v), int(hi_v)
    width_den = hi_v - lo_v + 1

    def count(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        x = b.column(value_col).to_pandas().dropna() \
            .to_numpy(np.int64)
        bins = (x - lo_v) * n_bins // width_den
        c = np.bincount(bins, minlength=n_bins)
        nz = np.flatnonzero(c)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "n_rows": pa.array(c[nz].astype(np.int64))})

    agg = ds.map_batches(count, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n_rows"))

    def finish(b: pa.Table) -> pa.Table:
        bins = pc.cast(b.column("bin"), pa.int64()).to_numpy(
            zero_copy_only=False)
        # bin b holds x with b*den <= (x-lo)*n_bins < (b+1)*den:
        # lo_b = lo + ceil(b*den / n_bins), hi_b = lo +
        # ceil((b+1)*den / n_bins) - 1 — exact integer bounds; ceil
        # via (a + n - 1) // n (positive operands ONLY — DuckDB's //
        # truncates toward zero while numpy floors, so the negated
        # idiom would diverge between engines)
        lo_b = lo_v + (bins * width_den + n_bins - 1) // n_bins
        hi_b = lo_v + ((bins + 1) * width_den + n_bins - 1) // n_bins - 1
        return pa.table({
            "bin": pa.array(bins),
            "lo": pa.array(lo_b.astype(np.int64)),
            "hi": pa.array(np.minimum(hi_b, hi_v).astype(np.int64)),
            "n_rows": pc.cast(b.column("sum(n_rows)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def table_profile(ds, columns):
    """Column profiler — the data-quality summary every ingest runs
    first: per column (column, n_rows, n_null, n_distinct, min_v,
    max_v) with min/max formatted as DuckDB-parity VARCHAR (ints via
    str, timestamps via their canonical 'YYYY-MM-DD HH:MM:SS[.ffffff]'
    form, doubles via shortest-roundtrip repr — both engines print
    shortest-roundtrip).

    Scale shape: ONE fact pass emits a bounded per-batch partial row
    per column (counts + native min/max carried as an EXACT int64 key
    for ints/timestamps, float64 for floats, the string itself for
    strings — never compared through lossy casts), merged on the
    driver (blocks x columns rows); the distinct counts ride a
    (column, value-string) pre-dedup exchange + one bounded fold —
    value strings only need to be injective WITHIN the engine, so
    repr() is safe even where formats could differ."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        schema = {"col": pa.array([], pa.string()),
                  "kind": pa.array([], pa.int64()),
                  "n_rows": pa.array([], pa.int64()),
                  "n_nonnull": pa.array([], pa.int64()),
                  "min_i": pa.array([], pa.int64()),
                  "max_i": pa.array([], pa.int64()),
                  "min_f": pa.array([], pa.float64()),
                  "max_f": pa.array([], pa.float64()),
                  "min_s": pa.array([], pa.string()),
                  "max_s": pa.array([], pa.string())}
        if b.num_rows == 0:
            return pa.table(schema)
        rows = []
        for c in columns:
            s = b.column(c).to_pandas()
            nn = s.dropna()
            row = {"col": c, "n_rows": len(s), "n_nonnull": len(nn),
                   "kind": 3, "min_i": 0, "max_i": 0,
                   "min_f": 0.0, "max_f": 0.0, "min_s": "",
                   "max_s": ""}
            if len(nn):
                if pd.api.types.is_datetime64_any_dtype(s):
                    v = nn.to_numpy().astype("datetime64[us]") \
                        .astype(np.int64)
                    row.update(kind=1, min_i=int(v.min()),
                               max_i=int(v.max()))
                elif pd.api.types.is_integer_dtype(nn):
                    row.update(kind=0, min_i=int(nn.min()),
                               max_i=int(nn.max()))
                elif pd.api.types.is_float_dtype(nn):
                    row.update(kind=2, min_f=float(nn.min()),
                               max_f=float(nn.max()))
                else:
                    vals = nn.astype(str)
                    row.update(kind=3, min_s=vals.min(),
                               max_s=vals.max())
            else:
                row["kind"] = -1
            rows.append(row)
        df = pd.DataFrame(rows)
        return pa.Table.from_pandas(df[list(schema)],
                                    preserve_index=False)

    col_id = {c: i for i, c in enumerate(columns)}

    def distinct_ints(b: pa.Table) -> pa.Table:
        # numeric/timestamp distincts ride a TYPED (col_id, int64)
        # exchange — values are injectively the int64 bit pattern
        # (timestamps as epoch-us, floats as raw bits with -0.0
        # folded to 0.0 to match SQL equality), so the wide groupby
        # hashes ints, never strings
        schema = {"cid": pa.array([], pa.int64()),
                  "val": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(schema)
        frames = []
        for c in columns:
            nn = b.column(c).to_pandas().dropna()
            if len(nn) == 0:
                continue
            if pd.api.types.is_datetime64_any_dtype(nn):
                v = nn.to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
            elif pd.api.types.is_integer_dtype(nn):
                v = nn.to_numpy(np.int64)
            elif pd.api.types.is_float_dtype(nn):
                f = nn.to_numpy(np.float64)
                v = np.where(f == 0.0, 0.0, f).view(np.int64)
            else:
                continue
            u = pd.unique(v)
            frames.append(pd.DataFrame({"cid": col_id[c], "val": u}))
        if not frames:
            return pa.table(schema)
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    def distinct_strs(b: pa.Table) -> pa.Table:
        schema = {"cid": pa.array([], pa.int64()),
                  "val": pa.array([], pa.string())}
        if b.num_rows == 0:
            return pa.table(schema)
        frames = []
        for c in columns:
            nn = b.column(c).to_pandas().dropna()
            if len(nn) == 0 or pd.api.types.is_numeric_dtype(nn) \
                    or pd.api.types.is_datetime64_any_dtype(nn):
                continue
            u = pd.unique(nn.astype(str))
            frames.append(pd.DataFrame({"cid": col_id[c], "val": u}))
        if not frames:
            return pa.table(schema)
        df = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    def nd_fold(df: pd.DataFrame) -> pd.DataFrame:
        # value-hash partitioning puts every (cid, val) pair wholly in
        # one partition, so local nunique partials sum to the exact
        # global distinct count
        cols = {"cid": "int64", "nd": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.drop_duplicates(["cid", "val"]).groupby("cid").size()
        return pd.DataFrame({"cid": g.index.to_numpy(np.int64),
                             "nd": g.to_numpy(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    mat = ds.materialize()
    ndist: dict = {}
    for emit in (distinct_ints, distinct_strs):
        pairs = mat.map_batches(emit, batch_format="pyarrow")
        for r in _grouped_by_partition(pairs, ["val"],
                                       nd_fold).take_all():
            c = columns[int(r["cid"])]
            ndist[c] = ndist.get(c, 0) + int(r["nd"])

    part_rows = mat.map_batches(partials,
                                batch_format="pyarrow").take_all()
    out_cols = {"column": "object", "n_rows": "int64",
                "n_null": "int64", "n_distinct": "int64",
                "min_v": "object", "max_v": "object"}
    acc: dict = {}
    for r in part_rows:
        c = r["col"]
        st = acc.setdefault(c, {"n": 0, "nn": 0, "kind": -1,
                                "mn": None, "mx": None})
        st["n"] += int(r["n_rows"])
        st["nn"] += int(r["n_nonnull"])
        k = int(r["kind"])
        if k < 0:
            continue
        st["kind"] = k
        mn = (int(r["min_i"]) if k in (0, 1)
              else float(r["min_f"]) if k == 2 else r["min_s"])
        mx = (int(r["max_i"]) if k in (0, 1)
              else float(r["max_f"]) if k == 2 else r["max_s"])
        st["mn"] = mn if st["mn"] is None else min(st["mn"], mn)
        st["mx"] = mx if st["mx"] is None else max(st["mx"], mx)

    def fmt(v, kind):
        if v is None:
            return ""
        if kind == 1:
            return str(pd.Timestamp(v, unit="us"))
        return repr(v) if kind == 2 else str(v)

    out = [{"column": c, "n_rows": st["n"],
            "n_null": st["n"] - st["nn"],
            "n_distinct": ndist.get(c, 0),
            "min_v": fmt(st["mn"], st["kind"]),
            "max_v": fmt(st["mx"], st["kind"])}
           for c in columns for st in [acc[c]]] if acc else []
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def global_topk_offset(ds, key_col: str, value_col: str, *,
                       k: int = 20, offset: int = 100):
    """Paginated global top-k: rows ranked by (cents DESC, key ASC)
    with `offset` skipped -> (rank, key, cents), rank 1-based over
    the full ordering.  The ORDER BY ... LIMIT k OFFSET m engine
    primitive; cents = round(value*100) keeps the sort key an exact
    integer so no float tie can reorder across engines.

    Scale shape: each batch keeps only its local top-(offset+k)
    (vectorized argpartition+sort), the driver merges the bounded
    blocks x (offset+k) survivors — no global sort, no full
    shuffle."""
    need = offset + k

    def local_top(b: pa.Table) -> pa.Table:
        schema = {"key": pa.array([], pa.int64()),
                  "cents": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(schema)
        key = b.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.rint(np.nan_to_num(
            b.column(value_col).to_numpy(zero_copy_only=False)
            .astype(np.float64)) * 100).astype(np.int64)
        if len(key) > need:
            # full (cents DESC, key ASC) local order — argpartition on
            # cents alone could keep the wrong rows of a tie group
            # that the global key tie-break would have ranked in
            sel = np.lexsort((key, -cents))[:need]
            key, cents = key[sel], cents[sel]
        return pa.table({"key": pa.array(key),
                         "cents": pa.array(cents)})

    rows = ds.map_batches(local_top, batch_format="pyarrow").take_all()
    out_cols = {"rank": "int64", "key": "int64", "cents": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    key = np.array([r["key"] for r in rows], np.int64)
    cents = np.array([r["cents"] for r in rows], np.int64)
    o = np.lexsort((key, -cents))[offset:need]
    return pd.DataFrame({
        "rank": np.arange(offset + 1, offset + 1 + len(o), dtype=np.int64),
        "key": key[o], "cents": cents[o]}).astype(out_cols)


def embedding_quant_stats(ds, *, scale: int = 1000):
    """Per-label quantized embedding energy: every element maps to
    floor(CAST(x AS DOUBLE) * scale) — an exact integer in BOTH
    engines (float32 promotes to the same double before the multiply)
    — and sums per vector, then per label -> (label, n_vecs, sum_q).
    The integer-exact audit aggregate for an embedding column (drift
    between two snapshots shows as a sum_q delta with no float noise).

    Map-only: Arrow list offsets -> one reduceat per batch, null
    embeddings contribute 0 (the similarity._stack zero-vector
    policy), one bounded label groupby."""
    from ray.data.aggregate import Sum

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64())})
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        off = emb.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        off = off - off[0]
        vals = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(np.nan_to_num(vals) * scale).astype(np.int64)
        cq = np.r_[0, np.cumsum(q)]
        sums = cq[off[1:]] - cq[off[:-1]]
        lab = b.column("label").to_pandas()
        lab = lab.fillna(-1).to_numpy(np.int64) if lab.isna().any() \
            else lab.to_numpy(np.int64)
        g = pd.DataFrame({"label": lab, "n_vecs": 1, "sum_q": sums}) \
            .groupby("label", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("label").aggregate(Sum("n_vecs"), Sum("sum_q"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": pc.cast(b.column("label"), pa.int64()),
            "n_vecs": pc.cast(b.column("sum(n_vecs)"), pa.int64()),
            "sum_q": pc.cast(b.column("sum(sum_q)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def source_lcp(ds, group_col: str = "source", text_col: str = "text"):
    """Template detector: the longest common prefix of ALL texts in a
    group -> (group, n_docs, lcp_len, lcp).  Uses the order-statistic
    identity LCP(set) = LCP(lexmin, lexmax) — so the whole reduction
    is an associative (min, max) pair: map-side per-batch string
    min/max partials, a bounded driver merge (blocks x groups rows),
    and one LCP scan over two strings per group.  A boilerplate-heavy
    source shows a long shared prefix; organic text shows ~0."""

    def partial(b: pa.Table) -> pa.Table:
        schema = {group_col: pa.array([], pa.string()),
                  "n": pa.array([], pa.int64()),
                  "mn": pa.array([], pa.string()),
                  "mx": pa.array([], pa.string())}
        if b.num_rows == 0:
            return pa.table(schema)
        t = b.column(text_col).to_pandas().fillna("")
        g = pd.DataFrame({group_col: b.column(group_col).to_pandas()
                          .to_numpy(object), "t": t}) \
            .groupby(group_col, sort=False)["t"] \
            .agg(n="size", mn="min", mx="max").reset_index()
        return pa.table({
            group_col: pa.array(g[group_col], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "mn": pa.array(g["mn"], pa.string()),
            "mx": pa.array(g["mx"], pa.string())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out_cols = {group_col: "object", "n_docs": "int64",
                "lcp_len": "int64", "lcp": "object"}
    acc: dict = {}
    for r in rows:
        g = r[group_col]
        st = acc.get(g)
        if st is None:
            acc[g] = [int(r["n"]), r["mn"], r["mx"]]
        else:
            st[0] += int(r["n"])
            st[1] = min(st[1], r["mn"])
            st[2] = max(st[2], r["mx"])
    out = []
    for g in sorted(acc):
        n, mn, mx = acc[g]
        k = 0
        lim = min(len(mn), len(mx))
        while k < lim and mn[k] == mx[k]:
            k += 1
        out.append({group_col: g, "n_docs": n, "lcp_len": k,
                    "lcp": mn[:k]})
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def grouped_anova_f(ds, group_col: str, value_col: str,
                    null_value: str = "und"):
    """One-way ANOVA F statistic over integer values in an EXACT
    floor-quantized decomposition both engines reproduce bit-for-bit:
    per group, B_g = (s1_g^2 * 1e6) // n_g (an exact integer floor of
    the rational between-group term); SSB_micro = sum(B_g) -
    (S1^2 * 1e6) // N and SSW_micro = S2 * 1e6 - sum(B_g); F_micro =
    (SSB_micro * (N-k) * 1e6) // (SSW_micro * (k-1)) guarded to
    positive operands (Python // floors, DuckDB // truncates — they
    agree only on non-negatives).  No float enters until never.

    Scale shape: per-batch (group, n, s1, s2) integer partials ->
    ONE bounded groupby -> single-row driver finish over k group rows
    (k = |groups|, independent of corpus size).  The x^2 partial is
    int64-safe for value domains up to ~3e9 per batch row count; the
    oracle uses HUGEINT throughout."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()),
                         null_value)
        v = pc.fill_null(pc.cast(b.column(value_col), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g.to_pandas(), "n": 1, "s1": v,
                           "s2": v * v})
        a = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({"g": pa.array(a["g"], pa.string()),
                         "n": pa.array(a["n"].to_numpy(np.int64)),
                         "s1": pa.array(a["s1"].to_numpy(np.int64)),
                         "s2": pa.array(a["s2"].to_numpy(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("n"), Sum("s1"), Sum("s2")) \
        .take_all()
    out_cols = {"n_rows": "int64", "n_groups": "int64",
                "ssb_micro": "int64", "ssw_micro": "int64",
                "f_micro": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    M = 1_000_000
    nn = s1t = s2t = sb = 0
    for r in rows:
        n, s1, s2 = int(r["sum(n)"]), int(r["sum(s1)"]), int(r["sum(s2)"])
        nn += n
        s1t += s1
        s2t += s2
        sb += (s1 * s1 * M) // n
    k = len(rows)
    ssb = sb - (s1t * s1t * M) // nn
    ssw = s2t * M - sb
    f_micro = ((ssb * (nn - k) * M) // (ssw * (k - 1))
               if (k > 1 and nn > k and ssb > 0 and ssw > 0) else 0)
    return pd.DataFrame([{"n_rows": nn, "n_groups": k,
                          "ssb_micro": ssb, "ssw_micro": ssw,
                          "f_micro": f_micro}]).astype(out_cols)


def label_centroid_cosine(ds, *, scale: int = 1000):
    """Pairwise cosine similarity between per-label embedding
    centroids — centroid direction == direction of the per-label SUM,
    so the whole statistic reduces to exact integer (label, dim)
    sums of floor(x * scale) elements: dot products and squared norms
    are then Python-int exact, and the only floats are one division
    and two sqrts in a pinned IEEE order both engines share ->
    (label_a, label_b, dot, cosine).

    Scale shape: per-batch (label, dim) partial sums (vectorized
    reshape + one np.add per batch), ONE bounded groupby over
    |labels| x dim rows, driver finish on the tiny matrix.  Null
    embeddings are zero vectors (similarity._stack policy) and
    contribute nothing to the sums."""
    from ray.data.aggregate import Sum

    def pre(b: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lab = b.column("label").to_pandas()
        lab = lab.fillna(-1).to_numpy(np.int64) if lab.isna().any() \
            else lab.to_numpy(np.int64)
        off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        lens = np.diff(off)
        vals = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(np.nan_to_num(vals) * scale).astype(np.int64)
        # ragged guard: only constant-dim rows fold vectorized; rows
        # with a deviant length (or null -> len 0) fold per-row
        if len(lens) == 0:
            return empty
        dim = int(np.bincount(lens).argmax()) if lens.max() > 0 else 0
        if dim == 0:
            return empty
        reg = lens == dim
        parts = []
        if reg.any():
            mat = np.empty((int(reg.sum()), dim), np.int64)
            starts = off[:-1][reg]
            idx = starts[:, None] + np.arange(dim)[None, :]
            mat[:] = q[idx]
            df = pd.DataFrame(mat)
            df["label"] = lab[reg]
            g = df.groupby("label", sort=False).sum()
            long = g.reset_index().melt(
                id_vars="label", var_name="dim", value_name="s")
            parts.append(long)
        if (~reg).any():
            rows = []
            for i in np.flatnonzero(~reg):
                for d in range(int(lens[i])):
                    rows.append((int(lab[i]), d, int(q[off[i] + d])))
            if rows:
                parts.append(pd.DataFrame(rows,
                                          columns=["label", "dim", "s"]))
        if not parts:
            return empty
        out = pd.concat(parts, ignore_index=True)
        return pa.table({"label": pa.array(out["label"]
                                           .to_numpy(np.int64)),
                         "dim": pa.array(out["dim"].astype(np.int64)
                                         .to_numpy()),
                         "s": pa.array(out["s"].to_numpy(np.int64))})

    rows = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(["label", "dim"]).aggregate(Sum("s")).take_all()
    out_cols = {"label_a": "int64", "label_b": "int64",
                "dot": "int64", "cosine": "float64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    import math
    vecs: dict = {}
    for r in rows:
        vecs.setdefault(int(r["label"]), {})[int(r["dim"])] = \
            int(r["sum(s)"])
    labels = sorted(vecs)
    dense = {}
    dmax = max((max(d) for d in vecs.values() if d), default=-1) + 1
    for c in labels:
        v = np.zeros(dmax, dtype=object)
        for d, s in vecs[c].items():
            v[d] = s
        dense[c] = v
    out = []
    for i, a in enumerate(labels):
        na = int(sum(int(x) * int(x) for x in dense[a]))
        for bl in labels[i + 1:]:
            nb = int(sum(int(x) * int(x) for x in dense[bl]))
            dot = int(sum(int(x) * int(y)
                          for x, y in zip(dense[a], dense[bl])))
            if na > 0 and nb > 0:
                cos = float(dot) / (math.sqrt(float(na))
                                    * math.sqrt(float(nb)))
            else:
                cos = 0.0
            out.append({"label_a": a, "label_b": bl, "dot": dot,
                        "cosine": cos})
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


# ---------------------------------------------------------------------------
# Round-5 wave A: privacy / effect-size / partial-correlation audits
# ---------------------------------------------------------------------------


def l_diversity_audit(ds, *, group_cols=("source",), bucket_col="n_chars",
                      bucket_width: int = 64, sensitive_col: str = "lang"):
    """l-diversity audit (privacy): quasi-identifier groups =
    (group_cols..., bucket_col // bucket_width); l = number of DISTINCT
    sensitive values per group.  Groups with l == 1 leak the sensitive
    attribute of every member -> l_ok = false.

    -> (group_cols..., size_class, n_rows, l_distinct, l_ok), one row
    per QI group.  Scale shape: per-batch (QI, sensitive) distinct
    pre-dedup, ONE native groupby over the deduped pairs carrying both
    the row count partial and the distinct partial (pairs bounded by
    |QI| x |sensitive domain|, not rows)."""
    from ray.data.aggregate import Count, Sum
    gcols = list(group_cols)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[sensitive_col] = df[sensitive_col].fillna("und")
        df["size_class"] = (df[bucket_col].fillna(0).astype(np.int64)
                            // bucket_width)
        g = df.groupby(gcols + ["size_class", sensitive_col],
                       as_index=False).size()
        return g.rename(columns={"size": "n_part"})

    agg = ds.map_batches(pre, batch_format="pandas") \
        .groupby(gcols + ["size_class", sensitive_col]) \
        .aggregate(Sum("n_part")).materialize()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {c: "object" for c in gcols}
        cols.update({"size_class": "int64", "n_rows": "int64",
                     "l_distinct": "int64", "l_ok": "bool"})
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby(gcols + ["size_class"], as_index=False).agg(
            n_rows=("sum(n_part)", "sum"),
            l_distinct=(sensitive_col, "nunique"))
        g["l_ok"] = g["l_distinct"] >= 2
        return g.astype(cols)

    # sensitive values of one QI group must meet in one partition
    from .dedup import _grouped_by_partition
    return _grouped_by_partition(agg, gcols + ["size_class"], finish,
                                 n_parts=8)


def effect_size_by_group(ds, group_col: str, value_col: str):
    """Cohen's d of each group AGAINST THE REST of the corpus, from
    exact integer moments (one map-side partial pass + tiny driver
    finish; rest-moments = totals - group moments, so no second scan).

    d = (mean_g - mean_rest) / pooled_sd with the textbook pooled
    sample variance; the float expression tree is mirrored verbatim by
    the DuckDB oracle, so doubles compare bit-identically.
    -> (group, n, mean_milli, d_milli is NOT emitted — d as float64)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].fillna(0).astype(np.int64).to_numpy()
        g = pd.DataFrame({group_col: df[group_col].fillna(""),
                          "sx": v, "sxx": v * v, "n": 1})
        return g.groupby(group_col, as_index=False).sum()

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(group_col).aggregate(Sum("sx"), Sum("sxx"), Sum("n")) \
        .materialize()
    rows = agg.take_all()  # bounded: one row per group
    out_cols = {group_col: "object", "n": "int64", "d": "float64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    tot_n = sum(int(r["sum(n)"]) for r in rows)
    tot_sx = sum(int(r["sum(sx)"]) for r in rows)
    tot_sxx = sum(int(r["sum(sxx)"]) for r in rows)
    out = []
    for r in sorted(rows, key=lambda r: r[group_col]):
        ns, sxs, sxxs = (int(r["sum(n)"]), int(r["sum(sx)"]),
                         int(r["sum(sxx)"]))
        nr, sxr, sxxr = tot_n - ns, tot_sx - sxs, tot_sxx - sxxs
        if ns < 2 or nr < 2:
            continue
        # var = (n*sxx - sx^2) / (n*(n-1)), exact-integer numerators
        var_s = float(ns * sxxs - sxs * sxs) / float(ns * (ns - 1))
        var_r = float(nr * sxxr - sxr * sxr) / float(nr * (nr - 1))
        pooled = ((ns - 1) * var_s + (nr - 1) * var_r) \
            / float(ns + nr - 2)
        if pooled <= 0:
            continue
        import math
        d = (float(sxs) / ns - float(sxr) / nr) / math.sqrt(pooled)
        out.append({group_col: r[group_col], "n": ns, "d": d})
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def partial_corr_three(ds, x_col: str, y_col: str, z_col: str):
    """First-order partial correlation r_xy.z over the whole table from
    EXACT integer moments: one map-side partial pass, Python-int driver
    totals (overflow-free), then the textbook formula
    (r_xy - r_xz r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)) with each pairwise
    r in the repo's grouped_corr IEEE evaluation order — the oracle
    mirrors the float expression tree exactly.
    -> one row (n, r_xy, r_xz, r_yz, partial_r)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].fillna(0).astype(np.int64).to_numpy()
        y = df[y_col].fillna(0).astype(np.int64).to_numpy()
        z = df[z_col].fillna(0).astype(np.int64).to_numpy()
        return pd.DataFrame({
            "n": [len(df)], "sx": [x.sum()], "sy": [y.sum()],
            "sz": [z.sum()], "sxx": [(x * x).sum()],
            "syy": [(y * y).sum()], "szz": [(z * z).sum()],
            "sxy": [(x * y).sum()], "sxz": [(x * z).sum()],
            "syz": [(y * z).sum()]})

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    out_cols = {"n": "int64", "r_xy": "float64", "r_xz": "float64",
                "r_yz": "float64", "partial_r": "float64"}
    n = sum(int(r["n"]) for r in rows)
    if n < 3:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    t = {k: sum(int(r[k]) for r in rows) for k in
         ("sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz")}
    import math

    def corr(sa, sb, saa, sbb, sab):
        va = n * saa - sa * sa
        vb = n * sbb - sb * sb
        if va <= 0 or vb <= 0:
            return None
        return float(n * sab - sa * sb) \
            / (math.sqrt(float(va)) * math.sqrt(float(vb)))

    r_xy = corr(t["sx"], t["sy"], t["sxx"], t["syy"], t["sxy"])
    r_xz = corr(t["sx"], t["sz"], t["sxx"], t["szz"], t["sxz"])
    r_yz = corr(t["sy"], t["sz"], t["syy"], t["szz"], t["syz"])
    if r_xy is None or r_xz is None or r_yz is None:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    prod = (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)
    if prod <= 0.0:  # |r| can touch 1.0 on degenerate inputs
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    pr = (r_xy - r_xz * r_yz) / math.sqrt(prod)
    return pd.DataFrame({"n": [n], "r_xy": [r_xy], "r_xz": [r_xz],
                         "r_yz": [r_yz], "partial_r": [pr]}) \
        .astype(out_cols)


def mad_anomalies(ds, group_col: str, value_col: str,
                  id_col: str = "doc_id", *, top_k: int = 50):
    """Global top-k robust outliers: score = |2v - m2| * 2e6 //
    max(mad_x4, 1) — the integer robust z in ppm, with m2 (2x the
    group median) and mad_x4 (4x the group MAD) EXACT from one
    (group, value) histogram aggregate (grouped_mad's units; the dev
    histogram is DERIVED from the value histogram, so one exchange
    covers both medians).  -> top_k rows (id, group, dev_x2,
    score_ppm), ties broken (score desc, group asc, id asc) — the
    same ORDER BY ... LIMIT set as the oracle.

    Scale shape: histogram exchange bounded by |group| x |value
    domain|; per-group resolve via hash-partitioned pass; stats (one
    row per group) broadcast into a map-side score + per-batch exact
    top-k candidates; driver merges top_k x n_blocks rows."""
    import ray

    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "m2": "int64", "mad_x4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = []
        for g, sub in df.groupby(group_col):
            sub = sub.sort_values(value_col)
            vals = sub[value_col].to_numpy(np.int64)
            cnts = sub["count()"].to_numpy(np.int64)
            n = int(cnts.sum())
            cum = np.cumsum(cnts)
            lo = int(vals[np.searchsorted(cum, (n - 1) // 2 + 1)])
            hi = int(vals[np.searchsorted(cum, n // 2 + 1)])
            m2 = lo + hi
            dev = np.abs(2 * vals - m2)
            dsub = pd.DataFrame({"d": dev, "c": cnts}) \
                .groupby("d", as_index=False).sum().sort_values("d")
            dv = dsub["d"].to_numpy(np.int64)
            dc = dsub["c"].to_numpy(np.int64)
            dcum = np.cumsum(dc)
            dlo = int(dv[np.searchsorted(dcum, (n - 1) // 2 + 1)])
            dhi = int(dv[np.searchsorted(dcum, n // 2 + 1)])
            out.append({group_col: g, "m2": m2, "mad_x4": dlo + dhi})
        return pd.DataFrame(out).astype(cols)

    from .dedup import _grouped_by_partition
    stats_rows = _grouped_by_partition(hist, [group_col], resolve,
                                       n_parts=8).take_all()
    out_cols = {id_col: "int64", group_col: "object",
                "dev_x2": "int64", "score_ppm": "int64"}
    if not stats_rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    stats = {r[group_col]: (int(r["m2"]), int(r["mad_x4"]))
             for r in stats_rows}
    ref = ray.put(stats)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
        st = ray.get(ref)
        m2 = df[group_col].map(lambda g: st.get(g, (0, 0))[0])
        mad = df[group_col].map(
            lambda g: max(st.get(g, (0, 1))[1], 1))
        v = df[value_col].fillna(0).astype(np.int64)
        dev = (2 * v - m2).abs().astype(np.int64)
        sc = dev * 2_000_000 // mad.astype(np.int64)
        out = pd.DataFrame({
            id_col: df[id_col].astype(np.int64),
            group_col: df[group_col], "dev_x2": dev,
            "score_ppm": sc.astype(np.int64)})
        return out.sort_values(
            ["score_ppm", group_col, id_col],
            ascending=[False, True, True]).head(top_k).astype(out_cols)

    cand = ds.map_batches(score, batch_format="pandas").take_all()
    if not cand:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(cand).sort_values(
        ["score_ppm", group_col, id_col],
        ascending=[False, True, True]).head(top_k) \
        .reset_index(drop=True).astype(out_cols)


def winsorized_mean_mad(ds, group_col: str, value_col: str, *,
                        k: int = 3):
    """Robust (MAD-winsorized) mean per group, INTEGER-exact: values
    clamped to median +- k*MAD in x4 units (m2 = 2*median, mad_x4 =
    4*MAD are both integers from the value histogram), then averaged
    with truncating milli division.  ONE (group, value) histogram
    exchange computes median, MAD and the clamped sum — the clamped
    sum is a pure function of the histogram.
    -> (group, n, sum_clamped4, wmean_milli)."""

    hist = ds.groupby([group_col, value_col]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "n": "int64",
                "sum_clamped4": "int64", "wmean_milli": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = []
        for g, sub in df.groupby(group_col):
            sub = sub.sort_values(value_col)
            vals = sub[value_col].to_numpy(np.int64)
            cnts = sub["count()"].to_numpy(np.int64)
            n = int(cnts.sum())
            cum = np.cumsum(cnts)
            lo = int(vals[np.searchsorted(cum, (n - 1) // 2 + 1)])
            hi = int(vals[np.searchsorted(cum, n // 2 + 1)])
            m2 = lo + hi
            dev = np.abs(2 * vals - m2)
            dsub = pd.DataFrame({"d": dev, "c": cnts}) \
                .groupby("d", as_index=False).sum().sort_values("d")
            dv = dsub["d"].to_numpy(np.int64)
            dc = dsub["c"].to_numpy(np.int64)
            dcum = np.cumsum(dc)
            dlo = int(dv[np.searchsorted(dcum, (n - 1) // 2 + 1)])
            dhi = int(dv[np.searchsorted(dcum, n // 2 + 1)])
            mad4 = dlo + dhi
            lo4 = 2 * m2 - k * mad4
            hi4 = 2 * m2 + k * mad4
            clamped = np.clip(4 * vals, lo4, hi4)
            s4 = int((clamped * cnts).sum())
            # truncating signed division = DuckDB's `//`
            wm = (abs(s4) * 1000 // (4 * n)) * (1 if s4 >= 0 else -1)
            out.append({group_col: g, "n": n, "sum_clamped4": s4,
                       "wmean_milli": wm})
        return pd.DataFrame(out).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(hist, [group_col], resolve, n_parts=8)


def l1_line_fit(ds, x_col: str, y_col: str, *, slopes=tuple(range(11))):
    """Robust L1 line fit y ~ m*x + b over a small integer slope grid:
    for each candidate m, b(m) = LOWER MEDIAN of the residuals
    y - m*x (the L1-optimal intercept, quantile_disc parity), loss(m)
    = sum |y - m*x - b(m)|; winner = min loss, ties -> smaller m.
    Everything is exact integers -> one row
    (slope, intercept, l1_loss).

    Scale shape: ONE (m, resid) histogram exchange (map-side combine
    over the slope-grid cross product), per-m median + loss resolved
    from the histogram (loss = sum cnt*|r - b| is a pure histogram
    function), tiny driver argmin."""
    from ray.data.aggregate import Sum
    grid = list(slopes)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"m": "int64", "r": "int64", "c": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        x = df[x_col].fillna(0).astype(np.int64).to_numpy()
        y = df[y_col].fillna(0).astype(np.int64).to_numpy()
        frames = []
        for m in grid:
            r = y - m * x
            g = pd.Series(r).value_counts()
            frames.append(pd.DataFrame({
                "m": np.full(len(g), m, np.int64),
                "r": g.index.to_numpy(np.int64),
                "c": g.to_numpy(np.int64)}))
        return pd.concat(frames, ignore_index=True).astype(cols)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"m": "int64", "b0": "int64", "l1": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = []
        for m, sub in df.groupby("m"):
            g = sub.groupby("r", as_index=False)["c"].sum() \
                .sort_values("r")
            rv = g["r"].to_numpy(np.int64)
            cv = g["c"].to_numpy(np.int64)
            n = int(cv.sum())
            cum = np.cumsum(cv)
            b = int(rv[np.searchsorted(cum, (n - 1) // 2 + 1)])
            loss = int((np.abs(rv - b) * cv).sum())
            out.append({"m": int(m), "b0": b, "l1": loss})
        return pd.DataFrame(out).astype(cols)

    # m-keyed partition pass (11 keys), NOT the native (m, resid)
    # sort-aggregate (~10k+ int keys = the known pathology); the
    # per-m resid histogram resolves locally
    from .dedup import _grouped_by_partition
    rows = _grouped_by_partition(
        ds.map_batches(partial, batch_format="pandas"), ["m"],
        resolve, n_parts=4).take_all()
    out_cols = {"slope": "int64", "intercept": "int64",
                "l1_loss": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    best = min(rows, key=lambda r: (int(r["l1"]), int(r["m"])))
    return pd.DataFrame({"slope": [int(best["m"])],
                         "intercept": [int(best["b0"])],
                         "l1_loss": [int(best["l1"])]}) \
        .astype(out_cols)


def eta_squared(ds, group_col: str, value_col: str,
                null_value: str = "und"):
    """ANOVA variance-explained (eta^2 = SSB/SST) in the EXACT
    floor-quantized integer decomposition grouped_anova_f pins:
    B_g = (s1_g^2 * 1e6) // n_g, SSB_micro = sum(B_g) -
    (S1^2 * 1e6) // N, SST_micro = S2*1e6 - (S1^2*1e6)//N,
    eta2_ppm = SSB_micro * 1e6 // SST_micro (non-negative operands
    only, so Python floor == DuckDB trunc).  -> one row
    (n_rows, n_groups, ssb_micro, sst_micro, eta2_ppm).

    Scale shape: identical to grouped_anova_f — per-batch integer
    partials, ONE bounded groupby, single-row driver finish."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()),
                         null_value)
        v = pc.fill_null(pc.cast(b.column(value_col), pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g.to_pandas(), "n": 1, "s1": v,
                           "s2": v * v})
        a = df.groupby("g", sort=False, as_index=False).sum()
        return pa.table({"g": pa.array(a["g"], pa.string()),
                         "n": pa.array(a["n"].to_numpy(np.int64)),
                         "s1": pa.array(a["s1"].to_numpy(np.int64)),
                         "s2": pa.array(a["s2"].to_numpy(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("n"), Sum("s1"), Sum("s2")) \
        .take_all()
    out_cols = {"n_rows": "int64", "n_groups": "int64",
                "ssb_micro": "int64", "sst_micro": "int64",
                "eta2_ppm": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    nn = sum(int(r["sum(n)"]) for r in rows)
    t1 = sum(int(r["sum(s1)"]) for r in rows)
    t2 = sum(int(r["sum(s2)"]) for r in rows)
    sb = sum((int(r["sum(s1)"]) ** 2 * 1_000_000)
             // int(r["sum(n)"]) for r in rows)
    ssb = sb - (t1 * t1 * 1_000_000) // nn
    sst = t2 * 1_000_000 - (t1 * t1 * 1_000_000) // nn
    eta = ssb * 1_000_000 // sst if (sst > 0 and ssb > 0) else 0
    return pd.DataFrame({"n_rows": [nn], "n_groups": [len(rows)],
                         "ssb_micro": [ssb], "sst_micro": [sst],
                         "eta2_ppm": [eta]}).astype(out_cols)


def rank_biserial(ds, group_col: str, value_col: str,
                  group_a: str, group_b: str):
    """Rank-biserial effect size for the Mann-Whitney comparison:
    r = 1 - 2U_A/(n_A n_B), computed from mannwhitney_u's EXACT
    doubled-U integer (2U_A = two_u_a, so r = 1 - two_u_a/(n_A n_B)).
    -> one row (n_a, n_b, two_u_a, rank_biserial_ppm) with the ppm a
    truncating signed division (DuckDB `//` parity).  Same histogram
    exchange as mannwhitney_u; zero extra passes."""
    import pandas as pd
    mw = mannwhitney_u(ds, group_col, value_col, group_a, group_b)
    df = mw.to_pandas() if not isinstance(mw, pd.DataFrame) else mw
    out_cols = {"n_a": "int64", "n_b": "int64", "two_u_a": "int64",
                "rank_biserial_ppm": "int64"}
    if len(df) == 0 or int(df["n_a"].iloc[0]) == 0 \
            or int(df["n_b"].iloc[0]) == 0:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    n_a = int(df["n_a"].iloc[0])
    n_b = int(df["n_b"].iloc[0])
    two_u = int(df["two_u_a"].iloc[0])
    num = n_a * n_b * 1_000_000 - two_u * 1_000_000
    den = n_a * n_b
    ppm = (abs(num) // den) * (1 if num >= 0 else -1)
    return pd.DataFrame({"n_a": [n_a], "n_b": [n_b],
                         "two_u_a": [two_u],
                         "rank_biserial_ppm": [ppm]}).astype(out_cols)
