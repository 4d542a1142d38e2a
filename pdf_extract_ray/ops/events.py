"""Event-stream operators: windowed aggregation and sessionization.

The reference is batch-only (SURVEY.md §2.8) — these are the rebuild-level
streaming-shaped operators a training-data pipeline needs (the brief's
"windowed aggregate" custom-operator class), expressed Ray-Data-first:

- tumbling window aggregate: floor the timestamp to the window inside
  `map_batches` (vectorized), then ONE groupby over (window, key) with
  native aggregates — the pre-aggregation happens in the map stage.
- sessionization (gap-based): partition by user via groupby, order rows
  within the group by time, split where the gap exceeds the threshold.
  Partitioning assumption (documented per the brief): one user's events
  fit in one group's memory; hot users would need salting by day first.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def hourly_event_stats(ds):
    """-> (hour, event_type, n_events, total_value); hour = ts floored."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.Table.from_arrays(
            [hour, batch.column("event_type"), batch.column("value")],
            names=["hour", "event_type", "value"])

    agg = ds.map_batches(add_window, batch_format="pyarrow") \
            .groupby(["hour", "event_type"]).aggregate(Count(), Sum("value"))

    def rename(b: pa.Table) -> pa.Table:
        # integer cents: double-sum low-order bits are summation-order
        # dependent, so emit an exactly-comparable integer
        s = b.column("sum(value)").to_numpy(zero_copy_only=False)
        cents = np.rint(np.asarray(s, dtype=np.float64) * 100.0).astype(np.int64)
        return pa.Table.from_arrays(
            # us precision: match DuckDB's TIMESTAMP for the driver compare
            [pc.cast(b.column("hour"), pa.timestamp("us")),
             b.column("event_type"),
             pc.cast(b.column("count()"), pa.int64()),
             pa.array(cents, pa.int64())],
            names=["hour", "event_type", "n_events", "total_value_cents"])

    return agg.map_batches(rename, batch_format="pyarrow")


def sliding_window_counts(ds, *, window_minutes: int = 60,
                          slide_minutes: int = 15):
    """Sliding-window aggregate (window > slide => overlapping windows):
    each event lands in window/slide consecutive windows.  Ray shape:
    the map stage EXPLODES each event into its window keys (vectorized —
    the map-side fanout is the streaming-window trick; payload per row is
    just (window_start, event_type)), then ONE groupby counts.
    -> (window_start, event_type, n_events)."""
    from ray.data.aggregate import Count
    slide_us = slide_minutes * 60 * 1_000_000
    n_windows = window_minutes // slide_minutes

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
                  .astype("datetime64[us]").astype(np.int64)
        base = (ts // slide_us) * slide_us
        n = len(ts)
        starts = np.concatenate(
            [base - k * slide_us for k in range(n_windows)])
        et = pa.concat_arrays(
            [batch.column("event_type").combine_chunks()] * n_windows)
        return pa.table({
            "window_start": pa.array(starts.astype("datetime64[us]"),
                                     pa.timestamp("us")),
            "event_type": et})

    agg = ds.map_batches(explode, batch_format="pyarrow") \
            .groupby(["window_start", "event_type"]).count()
    return agg.map_batches(
        lambda b: pa.table({
            "window_start": pc.cast(b.column("window_start"),
                                    pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_events": pc.cast(b.column("count()"), pa.int64())}),
        batch_format="pyarrow")


def sessionize(ds, gap_minutes: int = 30):
    """-> (user_id, n_sessions, n_events): gap-based sessions per user."""
    gap_us = gap_minutes * 60 * 1_000_000

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized: one (user, ts) lexsort; a session starts at every
        # group boundary or gap > threshold; per-user counts via
        # reduceat at the group starts — no Python loop over users
        n = len(df)
        cols = {"user_id": "int64", "n_sessions": "int64",
                "n_events": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, user))
        u, t = user[order], ts[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = u[1:] != u[:-1]
        new_sess = gch.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.nonzero(gch)[0]
        n_sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        n_events = np.diff(np.r_[starts, n])
        return pd.DataFrame({"user_id": u[starts],
                             "n_sessions": n_sessions,
                             "n_events": n_events}).astype(cols)

    # partition-level grouping: users hashed into bounded partitions
    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def running_totals(ds):
    """Prefix window aggregation: per-user running sum of `value` in
    (ts, event_id) order -> (event_id, user_id, running_cents).

    One partition-level shuffle (users hashed into bounded partitions,
    the sessionize shape); within a partition ONE lexsort + a segmented
    cumulative sum (cumsum minus its value at each user's first row) —
    no per-user loop.  Cents are rounded per PREFIX, exactly like the
    SQL window sum, and the accumulation order (ts, event_id) is pinned
    on both engines so float prefix sums agree.  Partitioning
    assumption: one user's events fit a partition (salt by time bucket
    with carried boundary sums beyond that — the sessionize_salted
    lift)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"event_id": "int64", "user_id": "int64",
                "running_cents": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        val = df["value"].to_numpy(dtype=np.float64)
        order = np.lexsort((eid, ts, user))
        u, e, v = user[order], eid[order], val[order]
        # per-user SEQUENTIAL left-to-right accumulation (pandas grouped
        # cumsum) — same float op order as the SQL running window, so
        # the cents rounding cannot diverge; a cross-user cumsum minus
        # per-segment base would be mathematically equal but float-drift
        run = pd.Series(v).groupby(pd.Series(u), sort=False).cumsum() \
            .to_numpy()
        return pd.DataFrame({
            "event_id": e, "user_id": u,
            "running_cents": np.round(run * 100.0).astype(np.int64),
        }).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def range_window_sums(ds, *, window_minutes: int = 60):
    """RANGE-frame time window: per event, the sum of the SAME USER's
    values whose ts lies in [ts - window, ts] — SQL `SUM(..) OVER
    (PARTITION BY user ORDER BY ts RANGE BETWEEN INTERVAL .. PRECEDING
    AND CURRENT ROW)`, which (unlike a ROWS frame) includes every
    ts-peer of the current row -> (event_id, user_id, win_cents).

    Summed quantity is per-row integer cents, so the window total is
    order-independent and EXACT against the oracle (a float window sum
    would drift in the low bits with DuckDB's segment-tree association
    order).  Shape: one user-hash shuffle; per partition ONE lexsort +
    cumulative cents + two global searchsorted probes over a composite
    (user-rank * BIG + clamped-ts) key — the per-user segments never
    loop, and the window bounds resolve as prefix differences.
    Partitioning assumption: one user's events fit a partition (salt by
    time bucket with carried boundary prefixes beyond that)."""
    win_us = window_minutes * 60 * 1_000_000

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"event_id": "int64", "user_id": "int64",
                "win_cents": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.round(
            df["value"].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, e, c = user[order], ts[order], eid[order], cents[order]
        # composite key: user segments separated by > (ts span + window)
        # so a probe at t - win never crosses into the previous user
        t0 = t - t.min()
        rank = np.empty(n, np.int64)
        rank[0] = 0
        np.cumsum(u[1:] != u[:-1], out=rank[1:])
        big = t0.max() + win_us + 2
        key = rank * big + t0
        prefix = np.concatenate(([0], np.cumsum(c)))
        lo = np.searchsorted(key, key - win_us, side="left")
        hi = np.searchsorted(key, key, side="right")  # include ts peers
        return pd.DataFrame({
            "event_id": e, "user_id": u,
            "win_cents": prefix[hi] - prefix[lo],
        }).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_partition,
                                 n_parts=32)


def sessionize_salted(ds, gap_minutes: int = 30, *, salt_days: int = 1,
                      n_parts: int = 64):
    """Hot-user-safe sessionization: the documented fix for the plain
    operator's partitioning assumption ("one user's events fit in one
    partition").

    Stage 1 salts the key to (user_id, day-bucket): each partition sees
    at most one user-DAY of events and emits (n_sessions, first_ts,
    last_ts, n_events) per bucket — bounded regardless of how hot the
    user is over time.
    Stage 2 merges the tiny per-bucket summaries per user: consecutive
    present buckets whose boundary gap <= threshold collapse one session
    (exactly the sessions the unsalted pass would have joined), so the
    result is IDENTICAL to sessionize() — same SQL oracle."""
    gap_us = gap_minutes * 60 * 1_000_000
    day_us = salt_days * 86_400 * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized (same kernel as sessionize.per_user, grouped on
        # (user, day)); also emits each bucket's first/last event time
        # for the boundary merge
        n = len(df)
        cols = {"user_id": "int64", "day": "int64", "n_sessions": "int64",
                "first_ts": "int64", "last_ts": "int64",
                "n_events": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        day = df["_day"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, day, user))
        u, d, t = user[order], day[order], ts[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        new_sess = gch.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.nonzero(gch)[0]
        ends = np.r_[starts[1:] - 1, n - 1]
        return pd.DataFrame({
            "user_id": u[starts], "day": d[starts],
            "n_sessions": np.add.reduceat(new_sess.astype(np.int64),
                                          starts),
            "first_ts": t[starts], "last_ts": t[ends],
            "n_events": np.diff(np.r_[starts, n])}).astype(cols)

    def add_day(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
                  .astype("datetime64[us]").astype(np.int64)
        return batch.append_column("_day", pa.array(ts // day_us, pa.int64()))

    from .dedup import _grouped_by_partition
    salted = ds.map_batches(add_day, batch_format="pyarrow")
    partials = _grouped_by_partition(salted, ["user_id", "_day"],
                                     per_bucket, n_parts=n_parts)

    def merge_all(df: pd.DataFrame) -> pd.DataFrame:
        # collapse boundary pairs: next bucket's first event within the
        # gap of this bucket's last event -> one fewer session.
        # Vectorized over ALL users in the partition (one lexsort +
        # reduceat) — per-tiny-group map_groups never appears.
        n = len(df)
        cols = {"user_id": "int64", "n_sessions": "int64",
                "n_events": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        day = df["day"].to_numpy(dtype=np.int64)
        order = np.lexsort((day, user))
        u = user[order]
        ns = df["n_sessions"].to_numpy(dtype=np.int64)[order]
        ft = df["first_ts"].to_numpy(dtype=np.int64)[order]
        lt = df["last_ts"].to_numpy(dtype=np.int64)[order]
        ne = df["n_events"].to_numpy(dtype=np.int64)[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = u[1:] != u[:-1]
        collapse = np.zeros(n, dtype=np.int64)
        collapse[1:] = (~gch[1:] & ((ft[1:] - lt[:-1]) <= gap_us)
                        ).astype(np.int64)
        starts = np.nonzero(gch)[0]
        return pd.DataFrame({
            "user_id": u[starts],
            "n_sessions": (np.add.reduceat(ns, starts)
                           - np.add.reduceat(collapse, starts)),
            "n_events": np.add.reduceat(ne, starts)}).astype(cols)

    from .dedup import _grouped_by_partition as _gbp
    return _gbp(partials, ["user_id"], merge_all, n_parts=n_parts)


def top_customers_by_spend(orders_ds, customer_ds, k: int = 10):
    """Top-k customers by total spend, dimension fetched AFTER the top-k:

    1. one groupby shuffles only (custkey, partial sum, partial count);
    2. per-batch partial top-k over the aggregate (no global sort — each
       block emits its k best, the driver merges n_blocks x k rows);
    3. only the k winning customer names are fetched from the dimension
       via a map-side `pc.is_in` filter — the customer table is never
       materialized anywhere."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Sum

    agg = orders_ds.groupby("o_custkey").aggregate(Sum("o_totalprice"), Count())

    def partial_topk(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("sum(o_totalprice)").to_pylist(),
                       dtype=np.float64)
        ck = np.asarray(batch.column("o_custkey").to_pylist(), dtype=np.int64)
        idx = np.lexsort((ck, -s))[:k]
        return batch.take(pa.array(idx))

    cands = sorted(
        agg.map_batches(partial_topk, batch_format="pyarrow").take_all(),
        key=lambda r: (-float(r["sum(o_totalprice)"]), int(r["o_custkey"])))
    top = cands[:k]

    keys = pa.array([int(r["o_custkey"]) for r in top], pa.int64())
    keys_ref = ray.put(keys)

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("c_custkey"), value_set=ray.get(keys_ref)))

    names = {}
    for b in customer_ds.map_batches(pick, batch_format="pyarrow") \
                        .iter_batches(batch_format="pyarrow"):
        for ck, cn in zip(b.column("c_custkey").to_pylist(),
                          b.column("c_name").to_pylist()):
            names[ck] = cn

    rows = []
    for rank, r in enumerate(top, start=1):
        ck = int(r["o_custkey"])
        # integer cents: double-sum low-order bits are order-dependent
        cents = int(np.rint(float(r["sum(o_totalprice)"]) * 100.0))
        rows.append((rank, ck, names.get(ck, ""),
                     cents, int(r["count()"])))
    return pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.int64()),
         pa.array([r[2] for r in rows], pa.string()),
         pa.array([r[3] for r in rows], pa.int64()),
         pa.array([r[4] for r in rows], pa.int64())],
        names=["rank", "c_custkey", "c_name", "total_spend_cents", "n_orders"])


def event_gaps(ds, *, n_parts: int = 32):
    """LAG window: per-user gap to the previous event in (ts, event_id)
    order -> (event_id, user_id, gap_us int64; -1 for each user's first
    event).

    One partition-level shuffle (users hashed into bounded partitions,
    the running_totals shape); within a partition ONE lexsort + a
    shifted diff masked at user boundaries — no per-user loop.  Gaps in
    exact integer microseconds, so both engines agree bit-for-bit.
    Partitioning assumption: one user's events fit a partition (salt by
    time bucket with carried boundary timestamps beyond that — the
    sessionize_salted lift)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "gap_us": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, e = user[order], ts[order], eid[order]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        gap[1:] = np.where(u[1:] == u[:-1], t[1:] - t[:-1], -1)
        return pd.DataFrame({"event_id": e, "user_id": u,
                             "gap_us": gap}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def event_transitions(ds, *, n_parts: int = 32):
    """Markov transition counts: per (previous event_type -> event_type)
    pair within a user's (ts, event_id)-ordered stream -> (prev_type,
    event_type, n_transitions).

    One partition-level shuffle (the event_gaps shape); within a
    partition ONE lexsort + a shifted comparison masked at user
    boundaries, then per-partition pair counts; a tiny
    (|types|^2)-key groupby merges the partials."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"prev_type": "object", "event_type": "object",
                "n": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype({"n": "int64"})
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        et = df["event_type"].to_numpy(dtype=object)
        order = np.lexsort((eid, ts, user))
        u, t = user[order], et[order]
        same = np.zeros(n, dtype=bool)
        same[1:] = u[1:] == u[:-1]
        pairs = pd.DataFrame({"prev_type": np.r_[[""], t[:-1]][same],
                              "event_type": t[same]})
        g = pairs.groupby(["prev_type", "event_type"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({"prev_type": idx["prev_type"],
                             "event_type": idx["event_type"],
                             "n": g.to_numpy(np.int64)})

    from ray.data.aggregate import Sum

    from .dedup import _grouped_by_partition
    parts = _grouped_by_partition(ds, ["user_id"], per_user,
                                  n_parts=n_parts)
    agg = parts.groupby(["prev_type", "event_type"]).aggregate(Sum("n"))
    return agg.map_batches(
        lambda b: pa.table({
            "prev_type": b.column("prev_type"),
            "event_type": b.column("event_type"),
            "n_transitions": pc.cast(b.column("sum(n)"), pa.int64())}),
        batch_format="pyarrow")


def latest_event_per_user(ds):
    """First-class combinable ARGMAX: each user's latest event by
    (ts, event_id) -> (user_id, event_id, ts, event_type).

    Map-side per-batch argmax per user shrinks every block to one row
    per user seen in it; ONE id-partitioned pass picks the global
    argmax per user.  No sort, no join — the exchange carries at most
    (#users x #blocks) single rows."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(["user_id", "event_id", "ts", "event_type"])
        df = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "event_id": b.column("event_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "ts": b.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
            "event_type": b.column("event_type").to_pandas()})
        order = np.lexsort((df["event_id"].to_numpy(),
                            df["ts"].to_numpy(),
                            df["user_id"].to_numpy()))
        df = df.iloc[order]
        keep = df.groupby("user_id", sort=False).tail(1)
        return pa.table({
            "user_id": pa.array(keep["user_id"].to_numpy(np.int64)),
            "event_id": pa.array(keep["event_id"].to_numpy(np.int64)),
            "ts": pa.array(keep["ts"].to_numpy(np.int64)),
            "event_type": pa.array(keep["event_type"], pa.string())})

    from .dedup import _grouped_by_partition
    cands = ds.map_batches(partial, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "event_id": "int64", "ts": "int64",
                "event_type": "object"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {k: v for k, v in cols.items() if v != "object"})
        order = np.lexsort((df["event_id"].to_numpy(np.int64),
                            df["ts"].to_numpy(np.int64),
                            df["user_id"].to_numpy(np.int64)))
        df = df.iloc[order]
        return df.groupby("user_id", sort=False).tail(1)

    picked = _grouped_by_partition(cands, ["user_id"], resolve,
                                   n_parts=32)
    return picked.map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "ts": pc.cast(pc.cast(b.column("ts"), pa.int64()),
                          pa.timestamp("us")),
            "event_type": b.column("event_type")}),
        batch_format="pyarrow")


def window3_sums(ds, *, window: int = 3):
    """Bounded-frame window aggregation: per-user sum of the current +
    (window-1) preceding event values in (ts, event_id) order ->
    (event_id, user_id, w_sum_cents).  The SQL shape is
    SUM(cents) OVER (PARTITION BY user ORDER BY ts, id
                     ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW).

    Values are rounded to INTEGER cents per row first (same rounding on
    both engines), so the windowed sum is exact integer arithmetic —
    no float accumulation-order skew.  One partition-level shuffle
    (the running_totals shape); within a partition ONE lexsort + a
    vectorized prefix-difference (cum[i] - cum[i-window] clamped to
    each user's segment start) — no per-user loop, no rolling-window
    object."""
    w = int(window)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"event_id": "int64", "user_id": "int64",
                "w_sum_cents": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.round(df["value"].to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, e, c = user[order], eid[order], cents[order]
        gcum = np.cumsum(c)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0))
        # user-local prefix sum: global cumsum minus the cumsum just
        # before each segment
        base = np.where(seg_start > 0, gcum[seg_start - 1], 0)
        prefix = gcum - base
        j = np.arange(n) - w
        in_seg = j >= seg_start
        wsum = prefix - np.where(in_seg, prefix[np.maximum(j, 0)], 0)
        return pd.DataFrame({
            "event_id": e, "user_id": u, "w_sum_cents": wsum,
        }).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def rolling_median(ds, *, window: int = 5):
    """Per-user rolling MEDIAN over the trailing `window` events in
    (ts, event_id) order -> (event_id, user_id, med_cents): the SQL
    shape  quantile_disc(cents, 0.5) OVER (PARTITION BY user
    ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW).

    Values round to integer cents first, and the median is the
    DISCRETE lower median (1-based sorted index ceil(n/2), DuckDB
    quantile_disc semantics), so the result is integer-exact.  One
    user-keyed partition pass (the window3_sums shape); within a
    partition ONE lexsort, then one np.sort of fixed-width sliding
    windows per distinct width w <= window (ragged segment-start
    windows are just the smaller fixed widths, selected by each row's
    user-local position) — no per-row loop, no rolling-window
    object."""
    w = int(window)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"event_id": "int64", "user_id": "int64",
                "med_cents": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.round(df["value"].to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, e, c = user[order], eid[order], cents[order]
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0))
        width = np.minimum(np.arange(n) - seg_start + 1, w)
        med = np.empty(n, np.int64)
        for k in range(1, w + 1):
            rows = np.flatnonzero(width == k)
            if len(rows) == 0:
                continue
            # trailing window of width k ends at each selected row
            wins = np.sort(
                np.lib.stride_tricks.sliding_window_view(c, k)[rows
                                                               - (k - 1)],
                axis=1)
            med[rows] = wins[:, (k + 1) // 2 - 1]
        return pd.DataFrame({
            "event_id": e, "user_id": u, "med_cents": med,
        }).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def attribute_purchases(ds, *, touch_types=("click", "view"),
                        conv_type: str = "purchase",
                        window_hours: int = 24, n_parts: int = 32):
    """Last-touch attribution: each conversion event maps to its user's
    most recent PRECEDING touch event (click/view) within
    `window_hours` -> (event_id, user_id, touch_event_id), sentinel
    -1 when no touch qualifies (the as-of-left discipline: output
    schema stays non-nullable).

    One user-keyed partition pass; within a partition one lexsort by
    (user, ts, event_id) and ONE segmented maximum.accumulate
    (relational._seg_last_idx — the shared as-of kernel) forward-fills
    the latest touch index, so conversions, touches and the window
    test all resolve without any per-user loop.  "Preceding" is strict
    row order (ts ties break on event_id), matching the SQL frame
    ROWS UNBOUNDED PRECEDING .. 1 PRECEDING."""
    window_us = int(window_hours) * 3_600 * 1_000_000
    touch_set = set(touch_types)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "touch_event_id": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        from .relational import _seg_last_idx
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        etype = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, user))
        u, t, e, ty = user[order], ts[order], eid[order], etype[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = u[1:] != u[:-1]
        is_touch = np.isin(ty, list(touch_set))
        last, valid = _seg_last_idx(is_touch, gch)
        conv = ty == conv_type
        li = last[conv]
        ok = valid[conv] & (li >= 0) \
            & (t[conv] - t[np.maximum(li, 0)] <= window_us)
        touch_id = np.where(ok, e[np.maximum(li, 0)], -1)
        return pd.DataFrame({
            "event_id": e[conv], "user_id": u[conv],
            "touch_event_id": touch_id}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def funnel_counts(ds, steps=("view", "click", "purchase"), *,
                  window_hours: int = 6, n_parts: int = 32):
    """Ordered funnel conversion: how many users performed step 1, then
    step 2 within `window_hours` of their FIRST step-1 event, then step
    3 within the window of that first qualifying step-2 event ->
    (step, n_users).

    One user-partitioned shuffle; within a partition each stage is a
    vectorized mask + grouped min over ALL users at once (no per-user
    loop), chaining  t_k = min ts  with the strict ( > t_{k-1},
    <= t_{k-1} + W ) inclusion in exact integer microseconds.  Each
    partition emits a |steps|-row partial; a tiny groupby sums."""
    window_us = int(window_hours) * 3_600 * 1_000_000
    step_list = list(steps)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"step": "int64", "n_users": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        etype = df["event_type"].to_numpy()
        t_prev = None  # per-user Series of the previous step's anchor
        counts = []
        user_s = pd.Series(user)
        for i, step in enumerate(step_list):
            m = etype == step
            if i > 0:
                # EXACT int64 anchor lookup: users without a prior-step
                # anchor are masked out first, so no NaN/float64 anchor
                # ever enters the boundary comparisons
                has_prev = user_s.isin(t_prev.index).to_numpy()
                m = m & has_prev
                pv = np.zeros(len(user), np.int64)
                if m.any():
                    pv[m] = t_prev.reindex(user[m]).to_numpy(np.int64)
                m = m & (ts > pv) & (ts <= pv + window_us)
            sel = pd.DataFrame({"u": user[m], "t": ts[m]})
            t_prev = sel.groupby("u")["t"].min()
            counts.append(len(t_prev))
        return pd.DataFrame({
            "step": np.arange(1, len(step_list) + 1, dtype=np.int64),
            "n_users": np.array(counts, np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    from ray.data.aggregate import Sum
    partials = _grouped_by_partition(ds, ["user_id"], per_partition,
                                     n_parts=n_parts)
    out = partials.groupby("step").aggregate(Sum("n_users"))
    import pyarrow.compute as _pc
    return out.map_batches(
        lambda b: pa.table({
            "step": _pc.cast(b.column("step"), pa.int64()),
            "n_users": _pc.cast(b.column("sum(n_users)"), pa.int64())}),
        batch_format="pyarrow")


def user_first_last(ds, *, n_parts: int = 32):
    """FIRST_VALUE / LAST_VALUE window per user over the (ts, event_id)
    total order -> (user_id, first_type, last_type).

    Classic arg_min/arg_max combiner: every batch folds to at most TWO
    rows per user present (its local extreme events), so the shuffle
    carries O(users x blocks) tiny partials instead of the event
    stream; a user-keyed partition pass picks the global extremes.
    Associative and order-free — no sort of the full stream anywhere."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        cols = ["user_id", "min_ts", "min_eid", "first_type",
                "max_ts", "max_eid", "last_type"]
        if b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "min_ts": pa.array([], pa.int64()),
                "min_eid": pa.array([], pa.int64()),
                "first_type": pa.array([], pa.string()),
                "max_ts": pa.array([], pa.int64()),
                "max_eid": pa.array([], pa.int64()),
                "last_type": pa.array([], pa.string())})
        user = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        eid = b.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = b.column("event_type").to_pandas().to_numpy(object)
        order = np.lexsort((eid, ts, user))
        u = user[order]
        first_idx = np.r_[True, u[1:] != u[:-1]]
        last_idx = np.r_[u[1:] != u[:-1], True]
        fi, li = order[first_idx], order[last_idx]
        return pa.table({
            "user_id": pa.array(u[first_idx]),
            "min_ts": pa.array(ts[fi]), "min_eid": pa.array(eid[fi]),
            "first_type": pa.array(et[fi], pa.string()),
            "max_ts": pa.array(ts[li]), "max_eid": pa.array(eid[li]),
            "last_type": pa.array(et[li], pa.string())})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "first_type": "object",
                "last_type": "object"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"user_id": "int64"})
        lo = df.sort_values(["user_id", "min_ts", "min_eid"],
                            kind="mergesort") \
            .groupby("user_id", sort=False, as_index=False).first()
        hi = df.sort_values(["user_id", "max_ts", "max_eid"],
                            kind="mergesort") \
            .groupby("user_id", sort=False, as_index=False).last()
        return pd.DataFrame({
            "user_id": lo["user_id"].to_numpy(np.int64),
            "first_type": lo["first_type"].to_numpy(object),
            "last_type": hi["last_type"].to_numpy(object)})

    from .dedup import _grouped_by_partition
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _grouped_by_partition(partials, ["user_id"], resolve,
                                 n_parts=n_parts)


def event_next_gaps(ds, *, n_parts: int = 32):
    """LEAD window: per-user gap to the NEXT event in (ts, event_id)
    order -> (event_id, user_id, next_gap_us int64; -1 for each user's
    last event).

    The event_gaps kernel mirrored forward: one partition-level shuffle
    (users hashed into bounded partitions), within a partition ONE
    lexsort + a shifted diff masked at user boundaries — no per-user
    loop.  Exact integer microseconds, so both engines agree
    bit-for-bit."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "next_gap_us": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, e = user[order], ts[order], eid[order]
        gap = np.empty(n, dtype=np.int64)
        gap[-1] = -1
        gap[:-1] = np.where(u[1:] == u[:-1], t[1:] - t[:-1], -1)
        return pd.DataFrame({"event_id": e, "user_id": u,
                             "next_gap_us": gap}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def value_share(ds):
    """Ratio-to-report window: each event's share of its event_type's
    total value -> (event_id, event_type, value_cents, share_ppm).

    SUM(...) OVER (PARTITION BY type) needs NO row shuffle: the
    denominator domain is |event_types| (tiny), so pass 1 is a map-side
    per-batch partial sum per type merged on the driver, and pass 2 is
    a map-only division against the broadcast totals.  Integer-exact:
    values quantize to cents per row (order-independent), shares are
    floor parts-per-million of bigint cents — bit-identical to the SQL
    window."""
    import ray

    totals: dict = {}
    partials = ds.map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("value"), pa.scalar(100.0))), pa.int64()),
        }).group_by("event_type").aggregate([("cents", "sum")]),
        batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column("event_type").to_pylist(),
                        b.column("cents_sum").to_pylist()):
            totals[k] = totals.get(k, 0) + int(v)
    totals_ref = ray.put(totals)

    def share(b: pa.Table) -> pa.Table:
        tot = ray.get(totals_ref)
        et = b.column("event_type").to_pandas()
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        denom = et.map(tot).to_numpy(np.int64)
        ppm = (cents * 1_000_000) // denom
        return pa.table({
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "event_type": b.column("event_type"),
            "value_cents": pa.array(cents, pa.int64()),
            "share_ppm": pa.array(ppm, pa.int64())})

    return ds.map_batches(share, batch_format="pyarrow")


def retention_cohorts_cal(ds, *, n_parts: int = 32):
    """Weekly retention triangle, CALENDAR variant (Monday-start
    weeks, timestamp cohort column — DuckDB date_trunc('week')
    parity; the epoch-week variant below is `retention_cohorts`):
    cohort a user by the Monday-start
    week of their FIRST event, then count distinct users active in
    each later week -> (cohort_week, offset_weeks, n_users).

    Scale shape: map-side per-batch dedup of (user, week) pairs first
    (the exchange carries at most n_users x n_weeks rows, not one row
    per event), then ONE user-keyed partition pass — every row of a
    user lands in one partition, so the per-partition distinct-user
    counts per (cohort, offset) cell are EXACT partials and a tiny
    (|weeks|^2/2)-key groupby sums them.  Week truncation is integer
    day arithmetic on epoch-microsecond timestamps (DuckDB
    date_trunc('week') = Monday start; epoch day 0 is a Thursday),
    so no float or calendar library enters the comparison."""
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition

    def week_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "week_day": pa.array([], pa.int64())})
        ts = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = ts // 86_400_000_000
        week = day - ((day + 3) % 7)  # Monday-start (day 0 = Thursday)
        uid = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pair = pd.DataFrame({"user_id": uid, "week_day": week}) \
            .drop_duplicates()
        return pa.table({"user_id": pa.array(pair["user_id"].to_numpy(),
                                             pa.int64()),
                         "week_day": pa.array(pair["week_day"].to_numpy(),
                                              pa.int64())})

    pairs = ds.map_batches(week_pairs, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cohort_day": "int64", "offset_weeks": "int64",
                "n_users": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.drop_duplicates(["user_id", "week_day"])
        cohort = df.groupby("user_id")["week_day"].transform("min")
        cells = pd.DataFrame({
            "cohort_day": cohort.to_numpy(np.int64),
            "offset_weeks": (df["week_day"].to_numpy(np.int64)
                             - cohort.to_numpy(np.int64)) // 7})
        g = cells.groupby(["cohort_day", "offset_weeks"],
                          sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({"cohort_day": idx["cohort_day"],
                             "offset_weeks": idx["offset_weeks"],
                             "n_users": g.to_numpy(np.int64)}).astype(cols)

    partials = _grouped_by_partition(pairs, ["user_id"], per_partition,
                                     n_parts=n_parts)
    out = partials.groupby(["cohort_day", "offset_weeks"]) \
        .aggregate(Sum("n_users"))

    def finish(b: pa.Table) -> pa.Table:
        day = pc.cast(b.column("cohort_day"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wk = (day * 86_400_000_000).astype("datetime64[us]")
        return pa.table({
            "cohort_week": pa.array(wk, pa.timestamp("us")),
            "offset_weeks": pc.cast(b.column("offset_weeks"), pa.int64()),
            "n_users": pc.cast(b.column("sum(n_users)"), pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def user_paths(ds, *, k: int = 3, n_parts: int = 32):
    """Behavioural path mining: each user's first `k` event types in
    (ts, event_id) order joined with '>' into a path string, counted
    across users -> (path, n_users).

    One user-keyed partition pass (each user wholly in one partition,
    so per-partition path counts are exact partials); within a
    partition ONE lexsort + segmented rank takes the head-k rows of
    every user at once, and the k-slot path strings are built by
    COLUMN-WISE numpy concatenation (k string adds over user-count
    arrays — no per-user join loop).  A |paths|-key groupby sums the
    partials; the key domain is bounded by |event_types|^k."""
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"path": "object", "n_users": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"n_users": "int64"})
        user = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(dtype=object)
        order = np.lexsort((eid, ts, user))
        u, t = user[order], et[order]
        n = len(u)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        # segmented rank: position within each user's run
        idx = np.arange(n)
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - seg_start
        head = rank < k
        hu, ht, hr = u[head], t[head], rank[head]
        users = hu[hr == 0]
        # k-slot matrix: slot[r][user_pos] = type at rank r (or "")
        upos = np.cumsum(hr == 0) - 1
        path = np.full(len(users), "", dtype=object)
        for r in range(k):
            m = hr == r
            slot = np.full(len(users), "", dtype=object)
            slot[upos[m]] = ht[m]
            if r == 0:
                path = slot
            else:
                has = slot != ""
                path[has] = path[has] + ">" + slot[has]
        g = pd.Series(path).groupby(pd.Series(path), sort=False).size()
        return pd.DataFrame({"path": g.index.to_numpy(object),
                             "n_users": g.to_numpy(np.int64)})

    partials = _grouped_by_partition(ds, ["user_id"], per_partition,
                                     n_parts=n_parts)
    out = partials.groupby("path").aggregate(Sum("n_users"))
    return out.map_batches(
        lambda b: pa.table({
            "path": b.column("path"),
            "n_users": pc.cast(b.column("sum(n_users)"), pa.int64())}),
        batch_format="pyarrow")


def nth_event_per_user(ds, *, n: int = 3, n_parts: int = 32):
    """NTH_VALUE window: each user's n-th event in (ts, event_id) order
    -> (user_id, event_id, ts, event_type); users with fewer than n
    events emit nothing (the row_number() = n filter semantics).

    Combinable bounded-top-n: a user's global n-th smallest event is
    always among the union of its per-block n smallest, so every batch
    folds to at most n rows per user present (vectorized lexsort +
    within-user rank mask, no per-user loop), and ONE user-keyed
    partition pass picks the exact n-th from those candidates.  The
    exchange carries O(users x blocks x n) rows, never the stream."""

    def partial(b: pa.Table) -> pa.Table:
        cols = ["user_id", "event_id", "ts", "event_type"]
        if b.num_rows == 0:
            return b.select(cols)
        user = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        eid = b.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u = order.size
        uu = user[order]
        first = np.r_[True, uu[1:] != uu[:-1]]
        # within-user 0-based rank via cumcount over the sorted runs
        starts = np.flatnonzero(first)
        rank = np.arange(u) - np.repeat(starts,
                                        np.diff(np.r_[starts, u]))
        keep = order[rank < n]
        return b.select(cols).take(pa.array(np.sort(keep)))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "event_id": "int64",
                "event_type": "object"}
        if len(df) == 0:
            out = pd.DataFrame(columns=["user_id", "event_id", "ts",
                                        "event_type"])
            out["ts"] = pd.to_datetime(out["ts"])
            return out.astype({"user_id": "int64", "event_id": "int64"})
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        nth = df.groupby("user_id", sort=False).nth(n - 1)
        return nth[["user_id", "event_id", "ts", "event_type"]]

    from .dedup import _grouped_by_partition
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _grouped_by_partition(partials, ["user_id"], resolve,
                                 n_parts=n_parts)


def record_high_events(ds, *, n_parts: int = 32):
    """Running-max (high-watermark) window: flags each event whose value
    STRICTLY exceeds every earlier value of the same user in (ts,
    event_id) order -> (event_id, user_id, is_record); a user's first
    event is a record by definition.

    One user-keyed partition pass (the event_gaps shape): within a
    partition ONE lexsort + a grouped cummax (pandas' single-pass
    Cython kernel) shifted by one row inside each user run —
    comparisons only, no float arithmetic, so the flags are bit-exact
    vs the SQL window."""

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "is_record": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        val = df["value"].to_numpy(np.float64)
        order = np.lexsort((eid, ts, user))
        u, v = user[order], val[order]
        first = np.r_[True, u[1:] != u[:-1]]
        gid = np.cumsum(first) - 1
        cmax = pd.Series(v).groupby(gid).cummax().to_numpy()
        prev = np.r_[-np.inf, cmax[:-1]]  # max of rows strictly before
        rec = first | (v > prev)
        return pd.DataFrame({"event_id": eid[order],
                             "user_id": u,
                             "is_record": rec.astype(np.int64)})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_part,
                                 n_parts=n_parts)


def user_value_integral(ds, *, n_parts: int = 32):
    """Time-weighted value sum per user (the area under the step curve
    between consecutive events) -> (user_id, integral_c2s): for each
    event with a successor, value contributes
    round(value*100) * ((next_ts - ts) whole seconds) — all integers,
    so the LEAD-window oracle agrees bit-for-bit.  Users with a single
    event emit nothing (their LEAD is NULL in SQL too).

    One user-keyed partition pass, lexsort + shifted diff masked at
    user boundaries (the event_gaps kernel), per-partition integer
    groupby — no per-user loops."""

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "integral_c2s": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        vc2 = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, v = user[order], ts[order], vc2[order]
        nxt = np.zeros(n, dtype=bool)
        nxt[:-1] = u[1:] == u[:-1]  # row i has a successor in-run
        gap_s = np.zeros(n, np.int64)
        gap_s[:-1] = (t[1:] - t[:-1]) // 1_000_000
        contrib = np.where(nxt, v * gap_s, 0)
        g = pd.DataFrame({"user_id": u[nxt], "c": contrib[nxt]}) \
            .groupby("user_id", sort=False, as_index=False).sum()
        return pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                             "integral_c2s": g["c"].to_numpy(np.int64)})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_part,
                                 n_parts=n_parts)


def session_stats(ds, gap_minutes: int = 30):
    """Session-level funnel health in ONE row: total sessions, bounce
    sessions (exactly one event), bounce ppm, the largest session, and
    mean session length in milli-events -> (n_sessions, n_bounce,
    bounce_ppm, max_session_events, avg_session_events_milli).

    Same partitioning contract as sessionize (users hash into bounded
    partitions; events of one user in one partition — the salted lift
    applies identically).  Per partition: ONE (user, ts) lexsort +
    reduceat over session starts gives per-SESSION event counts; only
    a 4-number partial leaves each partition."""
    gap_us = gap_minutes * 60 * 1_000_000

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_sessions": "int64", "n_bounce": "int64",
                "n_events": "int64", "max_len": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, user))
        u, t = user[order], ts[order]
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.nonzero(new_sess)[0]
        lens = np.diff(np.r_[starts, n])
        return pd.DataFrame({"n_sessions": [len(starts)],
                             "n_bounce": [int((lens == 1).sum())],
                             "n_events": [n],
                             "max_len": [int(lens.max())]}).astype(cols)

    from ray.data.aggregate import Max, Sum

    from .dedup import _grouped_by_partition
    parts = _grouped_by_partition(ds, ["user_id"], per_part, n_parts=32)
    agg = parts.aggregate(Sum("n_sessions"), Sum("n_bounce"),
                          Sum("n_events"), Max("max_len"))
    ns = int(agg.get("sum(n_sessions)") or 0)
    nb = int(agg.get("sum(n_bounce)") or 0)
    ne = int(agg.get("sum(n_events)") or 0)
    ml = int(agg.get("max(max_len)") or 0)
    return pd.DataFrame([{
        "n_sessions": ns, "n_bounce": nb,
        "bounce_ppm": nb * 1_000_000 // ns if ns else 0,
        "max_session_events": ml,
        "avg_session_events_milli": ne * 1000 // ns if ns else 0,
    }]).astype(np.int64)


def user_value_ewma(ds, *, window: int = 16):
    """Dyadic windowed EWMA per user: over the last `window` events in
    (ts, event_id) order, the weighted sum of integer cents with weights
    2^(window-1-j) for lag j (newest row weighs 2^(window-1), the
    oldest surviving row weighs 1) -> (event_id, user_id, ewma_scaled).
    Dividing by 2^window would give the alpha=1/2 truncated EWMA; the
    SCALED value is returned so the result is an exact BIGINT the SQL
    oracle reproduces bit-for-bit (no float weight ever exists).

    Shape: one user-hash partition pass (the running_totals shape);
    within a partition ONE lexsort + `window` vectorized shifted adds
    masked at user boundaries — no per-user loop, no per-row Python.
    Partitioning assumption: one user's events fit a partition (salt by
    time bucket and carry the 16-row tail beyond that)."""
    shift = window - 1

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"event_id": "int64", "user_id": "int64",
                "ewma_scaled": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        # floor(value*100) matches the oracle's CAST(floor(v*100) AS
        # BIGINT) exactly: both engines compute v*100 in float64 first
        cents = np.floor(np.nan_to_num(
            df["value"].to_numpy(dtype=np.float64)) * 100.0) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, e, c = user[order], eid[order], cents[order]
        # rank within user segment (sorted, so a cumsum over same-user
        # flags); lag-j contribution is valid only when j <= rank
        rank = np.arange(n, dtype=np.int64)
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        rank -= np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        out = np.zeros(n, dtype=np.int64)
        for j in range(window):
            w = np.int64(1) << np.int64(shift - j)
            contrib = c[: n - j] * w if j else c * w
            valid = rank[j:] >= j
            out[j:][valid] += contrib[valid]
        return pd.DataFrame({"event_id": e, "user_id": u,
                             "ewma_scaled": out}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def rolling_spikes(ds, *, window: int = 16, min_n: int = 8):
    """Rolling anomaly counter per user, EXACT integers end to end: a
    row is a spike when its value deviates from its trailing
    `window`-row mean by more than 2 trailing standard deviations —
    tested as (n*c - s)^2 > 4*(n*q - s^2) with c = integer cents,
    s/q = window sum / sum-of-squares, n = window row count (>= min_n
    rows required, so the warmup rows never fire) -> (user_id, n_eval,
    n_spikes).  Both sides of the inequality are products of bounded
    int64 window sums, so Ray and DuckDB agree bit-for-bit — no float
    variance ever exists.

    Shape: one user-hash partition pass; within a partition ONE
    lexsort, two cumulative sums, and window bounds clamped to each
    user's first row via maximum.accumulate — no per-user loop."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        cols = {"user_id": "int64", "n_eval": "int64", "n_spikes": "int64"}
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.floor(np.nan_to_num(
            df["value"].to_numpy(dtype=np.float64)) * 100.0) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, c = user[order], cents[order]
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        gstart = np.maximum.accumulate(
            np.where(starts, np.arange(n), 0))
        lo = np.maximum(gstart, np.arange(n) - (window - 1))
        cs = np.concatenate([[0], np.cumsum(c)])
        cq = np.concatenate([[0], np.cumsum(c * c)])
        idx = np.arange(n)
        s = cs[idx + 1] - cs[lo]
        q = cq[idx + 1] - cq[lo]
        wn = idx + 1 - lo
        lhs = (wn * c - s)
        spike = (wn >= min_n) & (lhs * lhs > 4 * (wn * q - s * s))
        ev = wn >= min_n
        g = pd.DataFrame({"user_id": u,
                          "n_eval": ev.astype(np.int64),
                          "n_spikes": spike.astype(np.int64)}) \
            .groupby("user_id", sort=False).sum().reset_index()
        return g.astype(cols)

    from .dedup import _grouped_by_partition
    # one row per user per PARTITION — and a user's rows never split
    # across partitions (that is _grouped_by_partition's contract), so
    # the per-partition sums ARE the final answer: no second exchange
    return _grouped_by_partition(ds, ["user_id"], per_user, n_parts=32)


def transition_entropy(ds, *, n_parts: int = 32):
    """Markov out-transition entropy per source state: the Shannon
    entropy (nats) of the next-event-type mix following each
    event_type, reported as floor(H * 1e6) -> (prev_type, n_trans,
    entropy_ppm).  Built on the oracle-tested event_transitions counts
    (one partition pass + a |types|^2 groupby); the entropy finish
    runs driver-side over the tiny cross-tab in sorted event_type
    order, the exact accumulation order the SQL mirrors (grouped
    entropy pattern, ops/analytics.grouped_entropy)."""
    import math

    cells = event_transitions(ds, n_parts=n_parts).take_all()
    cols = {"prev_type": "object", "n_trans": "int64",
            "entropy_ppm": "int64"}
    if not cells:
        return pd.DataFrame(columns=list(cols)).astype(
            {"n_trans": "int64", "entropy_ppm": "int64"})
    df = pd.DataFrame(cells).sort_values(["prev_type", "event_type"])
    out_g, out_n, out_e = [], [], []
    for g, grp in df.groupby("prev_type", sort=True):
        t = int(grp["n_transitions"].sum())
        h = 0.0
        for o in grp["n_transitions"]:
            p = int(o) / t
            h += -p * math.log(p)
        out_g.append(g)
        out_n.append(t)
        out_e.append(math.floor(h * 1_000_000))
    return pd.DataFrame({"prev_type": out_g,
                         "n_trans": np.array(out_n, np.int64),
                         "entropy_ppm": np.array(out_e, np.int64)})


def hourly_gapfill(ds, *, ts_col: str = "ts"):
    """Gap-filled tumbling hourly counts: every hour between the
    stream's first and last event appears, zero-count hours included ->
    (hour, n_events) sorted by hour.  The canonical densify step before
    any time-series model (autocorrelation, seasonality, anomaly
    windows) — a plain groupby silently drops empty buckets.

    Scale shape: the full volume folds map-side to per-batch (hour,
    partial-count) rows; ONE bounded groupby sums them (key space =
    hours in the time span — 8.8k/year regardless of row count); the
    zero-fill reindex runs driver-side over that tiny table."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hour": pa.array([], pa.timestamp("us")),
                             "n": pa.array([], pa.int64())})
        hour = pc.floor_temporal(pc.cast(b.column(ts_col),
                                         pa.timestamp("us")), unit="hour")
        t = pa.table({"hour": hour}).group_by("hour") \
            .aggregate([("hour", "count")])
        return pa.table({"hour": t.column("hour"),
                         "n": pc.cast(t.column("hour_count"), pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour").aggregate(Sum("n"))
    rows = agg.take_all()
    cols = {"n_events": "int64"}
    if not rows:
        return pd.DataFrame({"hour": pd.Series([], dtype="datetime64[us]"),
                             "n_events": pd.Series([], dtype=np.int64)})
    df = pd.DataFrame(rows).rename(columns={"sum(n)": "n_events"})
    df["hour"] = df["hour"].astype("datetime64[us]")
    full = pd.date_range(df["hour"].min(), df["hour"].max(),
                         freq="h").astype("datetime64[us]")
    out = df.set_index("hour").reindex(full, fill_value=0).reset_index() \
        .rename(columns={"index": "hour"})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


def scd2_intervals(ds, *, n_parts: int = 32):
    """SCD-2 history build: collapse each user's event stream (ordered
    by ts, event_id) into validity intervals of runs of EQUAL
    consecutive event_type -> (user_id, event_type, valid_from,
    valid_to_us, n_events), where valid_to_us is the NEXT interval's
    start in integer microseconds (-1 for the open current interval).
    The dimension-table "track attribute changes over time" shape
    (gaps-and-islands emitting LEAD-closed intervals).

    One user-keyed partition pass (the event_gaps shape); within a
    partition one lexsort + vectorized island detection via factorized
    type codes (None factorizes to -1, so runs of NULL types form
    islands exactly like SQL's IS DISTINCT FROM).  No per-user loop.
    Partitioning assumption: one user's events fit a partition (salt by
    time bucket with carried boundary state beyond that)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "event_type": "object",
                "valid_from": "datetime64[us]", "valid_to_us": "int64",
                "n_events": "int64"}
        n = len(df)
        if n == 0:
            out = pd.DataFrame(columns=list(cols))
            out["valid_from"] = out["valid_from"].astype("datetime64[us]")
            return out.astype({k: v for k, v in cols.items()
                               if k != "valid_from"})
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        ts_i = ts.astype(np.int64)  # NaT -> int64 min: sorts first, total
        eid = df["event_id"].to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(df["event_type"], use_na_sentinel=True)
        order = np.lexsort((eid, ts_i, user))
        u, t, c = user[order], ts[order], codes[order]
        brk = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, n])
        iu, it, ic = u[starts], t[starts], c[starts]
        nxt = np.full(len(starts), -1, np.int64)
        same_user = iu[:-1] == iu[1:]
        nxt[:-1] = np.where(same_user, it[1:].astype(np.int64), -1)
        types = np.where(ic >= 0, uniq.take(np.maximum(ic, 0)), None)
        return pd.DataFrame({
            "user_id": iu, "event_type": types, "valid_from": it,
            "valid_to_us": nxt,
            "n_events": sizes.astype(np.int64)})

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def user_active_time(ds, *, window_s: int = 300, n_parts: int = 32):
    """Session-free activity coverage: per user, the total time covered
    by the union of [ts, ts + W) activity windows, in EXACT integer
    microseconds -> (user_id, active_us, n_events).  Because windows
    are uniform, the union telescopes to sum(min(next_ts - ts, W)) with
    the last event contributing W — one LEAD + clamp, no interval
    merge, bit-identical to the SQL window oracle.

    One user-keyed partition pass; within a partition one lexsort, a
    shifted diff masked at user boundaries, and a vectorized grouped
    sum.  Rows with NULL ts are dropped (no position on the axis)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "active_us": "int64",
                "n_events": "int64"}
        w_us = np.int64(window_s) * 1_000_000
        df = df[df["ts"].notna()]
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, user))
        u, t = user[order], ts[order]
        contrib = np.full(n, w_us, np.int64)
        same = u[:-1] == u[1:]
        contrib[:-1] = np.where(same, np.minimum(t[1:] - t[:-1], w_us),
                                w_us)
        g = pd.DataFrame({"user_id": u, "active_us": contrib}) \
            .groupby("user_id", as_index=False) \
            .agg(active_us=("active_us", "sum"),
                 n_events=("active_us", "size"))
        return g.astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def peer_group_sums(ds, *, n_parts: int = 32):
    """GROUPS-frame window (GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING):
    per event, the sum of value cents over its TS-PEER GROUP plus the
    neighboring distinct-ts peer groups of the same user -> (event_id,
    user_id, frame_cents).  The peer-group frame type SQL defines
    beside ROWS and RANGE (DuckDB 1.0 lacks GROUPS mode, so the oracle
    states the identical semantics as a per-group ROWS window joined
    back to events).

    One user-keyed partition pass; within a partition one lexsort,
    vectorized distinct-ts block detection, per-block bincount sums,
    and shifted same-user adds — no per-user loop.  Null values sum as
    0 (SQL SUM null-skip policy).  Exact integer cents."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "frame_cents": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        val = df["value"].to_numpy(dtype=np.float64)
        cents = np.rint(np.nan_to_num(val) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, c, e = user[order], ts[order], cents[order], eid[order]
        new_blk = np.r_[True, (u[1:] != u[:-1]) | (t[1:] != t[:-1])]
        bid = np.cumsum(new_blk) - 1
        nb = int(bid[-1]) + 1
        bsum = np.zeros(nb, np.int64)
        np.add.at(bsum, bid, c)
        ub = u[new_blk]
        fsum = bsum.copy()
        fsum[1:] += np.where(ub[1:] == ub[:-1], bsum[:-1], 0)
        fsum[:-1] += np.where(ub[1:] == ub[:-1], bsum[1:], 0)
        return pd.DataFrame({"event_id": e, "user_id": u,
                             "frame_cents": fsum[bid]}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


_HOUR_US = 3_600_000_000


def user_value_locf(ds, *, n_parts: int = 32):
    """Hourly LOCF resample (the time-series feature-fill standard):
    per user, an hourly grid from the user's first to last observed
    hour, carrying the hour's LAST event value (exact integer cents)
    forward across gap hours -> (user_id, hour, cents_locf).  Events
    with NULL value are ignored on both engines (no observation).

    One user-keyed partition pass; within a partition one lexsort,
    per-(user, hour) last-observation pick via run boundaries,
    vectorized ragged grid construction (repeat + cumsum), a sorted
    left merge, and ONE global maximum.accumulate LOCF — each user's
    first grid hour is observed by construction, so the accumulate
    needs no per-user reset.  Grid rows are O(sum of user spans in
    hours); a multi-year span per user would need a coarser grid or
    span cap upstream."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "hour": "datetime64[us]",
                "cents_locf": "int64"}
        df = df[df["value"].notna() & df["ts"].notna()]
        n = len(df)
        if n == 0:
            out = pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                "hour": pd.Series(
                                    dtype="datetime64[us]"),
                                "cents_locf": pd.Series(
                                    dtype=np.int64)})
            return out
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.rint(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, t, c = user[order], ts[order], cents[order]
        h = t // _HOUR_US  # hour index (integer)
        # last event per (user, hour): the run's final element
        last = np.r_[(u[1:] != u[:-1]) | (h[1:] != h[:-1]), True]
        ou, oh, oc = u[last], h[last], c[last]
        # per-user span -> ragged hourly grid via repeat + cumsum
        ustart = np.flatnonzero(np.r_[True, ou[1:] != ou[:-1]])
        uend = np.r_[ustart[1:], ou.size] - 1
        h0, h1 = oh[ustart], oh[uend]
        span = (h1 - h0 + 1).astype(np.int64)
        total = int(span.sum())
        gu = np.repeat(ou[ustart], span)
        # grid hour = h0 repeated + within-user offset 0..span-1
        offs = np.arange(total, dtype=np.int64) \
            - np.repeat(np.r_[0, np.cumsum(span)[:-1]], span)
        gh = np.repeat(h0, span) + offs
        # observed slot -> grid position by DIRECT ARITHMETIC (each
        # user's grid is the contiguous hour range [h0, h1]):
        # pos = user_grid_offset + (hour - h0).  No join/merge — the
        # pandas left-merge here was 8 of the op's 9 seconds at sf0.1.
        goff = np.r_[0, np.cumsum(span)[:-1]]
        uidx = np.cumsum(np.r_[True, ou[1:] != ou[:-1]]) - 1
        pos = goff[uidx] + (oh - h0[uidx])
        obsmask = np.zeros(total, bool)
        obsmask[pos] = True
        valarr = np.zeros(total, np.int64)
        valarr[pos] = oc
        src = np.maximum.accumulate(
            np.where(obsmask, np.arange(total), 0))
        return pd.DataFrame({
            "user_id": gu,
            "hour": (gh * _HOUR_US).astype("datetime64[us]"),
            "cents_locf": valarr[src]}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def user_burstiness(ds, *, n_parts: int = 32):
    """Fano factor (index of dispersion) of each user's hourly event
    counts over the user's active span, zero hours included ->
    (user_id, n_hours, n_events, fano_ppm) with fano_ppm =
    (n_hours * sum(x^2) - S^2) * 1e6 // (n_hours * S) — variance over
    mean in ONE exact integer rational (no float anywhere), the
    burstiness screen separating steady emitters from spiky ones.

    One user-keyed partition pass; per-(user, hour) counts are run
    lengths of one lexsort, per-user moments are segmented sums — zero
    hours enter via the span term only, so the pass never materializes
    gap rows (unlike a gapfill+variance chain)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_hours": "int64",
                "n_events": "int64", "fano_ppm": "int64"}
        df = df[df["ts"].notna()]
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, user))
        u, t = user[order], ts[order]
        h = t // _HOUR_US
        new = np.r_[True, (u[1:] != u[:-1]) | (h[1:] != h[:-1])]
        runs = np.flatnonzero(new)
        x = np.diff(np.r_[runs, u.size]).astype(np.int64)
        ru, rh = u[runs], h[runs]
        ustart = np.flatnonzero(np.r_[True, ru[1:] != ru[:-1]])
        uend = np.r_[ustart[1:], ru.size] - 1
        cs = np.r_[0, np.cumsum(x)]
        csq = np.r_[0, np.cumsum(x * x)]
        s = cs[np.r_[ustart[1:], ru.size]] - cs[ustart]
        ssq = csq[np.r_[ustart[1:], ru.size]] - csq[ustart]
        n_hours = rh[uend] - rh[ustart] + 1
        num = (n_hours * ssq - s * s) * 1_000_000
        den = n_hours * s
        return pd.DataFrame({
            "user_id": ru[ustart], "n_hours": n_hours, "n_events": s,
            "fano_ppm": num // den}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def capped_running_balance(ds, *, neg_types=("purchase", "error"),
                           n_parts: int = 32):
    """Running balance clamped at zero (inventory / prepaid-credit
    semantics): per user in (ts, event_id) order, balance_t =
    max(0, balance_{t-1} + delta_t) with delta = +cents for credit
    events and -cents for `neg_types` -> (event_id, user_id,
    balance_cents).  The nonlinear recurrence resolves CLOSED-FORM via
    the reflection identity  b_t = prefix_t - min(0, running_min of
    prefix)  — so both engines compute it with two plain windows
    (prefix sum + running min), no row-at-a-time loop anywhere.

    One user-keyed partition pass; grouped cumsum/cummin are pandas
    C kernels.  Null values sum as 0 (SQL SUM null-skip)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "user_id": "int64",
                "balance_cents": "int64"}
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.rint(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        neg = df["event_type"].isin(list(neg_types)).to_numpy()
        delta = np.where(neg, -cents, cents)
        order = np.lexsort((eid, ts, user))
        u, e, d = user[order], eid[order], delta[order]
        g = pd.DataFrame({"u": u, "d": d})
        pre = g.groupby("u", sort=False)["d"].cumsum().to_numpy(np.int64)
        g["pre"] = pre
        runmin = g.groupby("u", sort=False)["pre"].cummin() \
            .to_numpy(np.int64)
        bal = pre - np.minimum(runmin, 0)
        return pd.DataFrame({"event_id": e, "user_id": u,
                             "balance_cents": bal}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


_MOTIF_LETTER = {"view": "v", "purchase": "p", "click": "c",
                 "signup": "s", "error": "e"}


def sequence_motifs(ds, motifs, *, n_parts: int = 32):
    """Event-sequence motif mining: encode each user's event-type
    stream (ordered by ts, event_id) as a letter string (v/p/c/s/e,
    unknown -> x) and count, per regex motif, the users whose sequence
    CONTAINS a match -> (motif, n_users).  The behavioral-pattern
    screen ("view-streak then purchase", "triple purchase", ...);
    motifs must stay in the RE2 <-> Python-re common subset (no
    backrefs/lookarounds) so both engines agree.

    One user-keyed partition pass builds the per-user strings (letters
    via a vectorized uint8 LUT, one join per user — strings are
    user-sized, never corpus-sized); each partition then counts every
    motif with ONE compiled vectorized str.contains pass and the
    bounded (motif, count) partials merge in a tiny groupby."""
    from ray.data.aggregate import Sum

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"motif": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        letters = df["event_type"].map(_MOTIF_LETTER).fillna("x") \
            .to_numpy(object)
        order = np.lexsort((eid, ts, user))
        u, le = user[order], letters[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, u.size]
        seqs = pd.Series(["".join(le[bounds[i]:bounds[i + 1]])
                          for i in range(len(starts))])
        rows = [{"motif": m,
                 "n": int(seqs.str.contains(m, regex=True).sum())}
                for m in motifs]
        return pd.DataFrame(rows).astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(ds, ["user_id"], per_user,
                                     n_parts=n_parts)
    agg = partials.groupby("motif").aggregate(Sum("n"))
    return agg.map_batches(
        lambda b: pa.table({
            "motif": pc.cast(b.column("motif"), pa.string()),
            "n_users": pc.cast(b.column("sum(n)"), pa.int64())}),
        batch_format="pyarrow")


def changepoint_by_user(ds, *, n_parts: int = 32):
    """Single change-point screen per user (binary-segmentation step
    1): over the user's cents series in (ts, event_id) order, find the
    split k (1 <= k < n) maximizing the EXACT integer mean-shift
    statistic |A_k| = |s1 * n2 - s2 * n1| (the cross-multiplied
    mean gap scaled by n1*n2 — deterministic and oracle-exact, unlike
    the variance-normalized CUSUM statistic whose rational compare
    cannot be expressed in one SQL ORDER BY), ties -> smallest k.
    -> (user_id, n_events, split_k, gap_num, n1, n2); users with < 2
    events are dropped.

    One user-keyed partition pass; prefix sums are one grouped cumsum,
    A_k is vectorized; only the per-user argmax walks run lengths.
    int64-safe: |A| <= total_cents * n."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "split_k": "int64", "gap_num": "int64",
                "n1": "int64", "n2": "int64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.rint(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, c = user[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, m])
        # within-user prefix sums via global cumsum minus group base
        g = np.cumsum(np.r_[0, c])[1:]
        base = np.repeat(g[starts] - c[starts], sizes)
        pre = g - base                       # s1 at split k = row idx+1
        k_in = np.arange(m) - np.repeat(starts, sizes) + 1
        n_u = np.repeat(sizes, sizes)
        tot = np.repeat(pre[starts + sizes - 1], sizes)
        a = np.abs(pre * (n_u - k_in) - (tot - pre) * k_in)
        rows = []
        uu = u[starts]
        for i, st in enumerate(starts):
            n = int(sizes[i])
            if n < 2:
                continue
            seg = a[st:st + n - 1]
            k = int(np.argmax(seg))  # first max = smallest k
            rows.append({"user_id": int(uu[i]), "n_events": n,
                         "split_k": k + 1, "gap_num": int(seg[k]),
                         "n1": k + 1, "n2": n - (k + 1)})
        if not rows:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        return pd.DataFrame(rows).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def runs_test_by_user(ds, *, n_parts: int = 32):
    """Wald-Wolfowitz runs screen per user: over the cents series in
    (ts, event_id) order, drop values equal to the user's discrete
    median (quantile_disc 0.5 = sorted[(n-1)//2], ties keep the SQL
    convention), sign the rest (+/- vs median) and count sign runs ->
    (user_id, n_pos, n_neg, n_runs).  Randomness check for event
    streams: too few runs = trending, too many = oscillating.

    One user-keyed partition pass (the changepoint_by_user shape);
    median + signs + run boundaries are all vectorized — the only
    Python loop is over users present in the partition, bounded by
    group count, not rows.  Exact integers end-to-end."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_pos": "int64",
                "n_neg": "int64", "n_runs": "int64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.rint(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, c = user[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, m])
        # discrete median per user: sorted cents[(n-1)//2], computed
        # from a (user, cents) lexsort so every group is one slice
        o2 = np.lexsort((c, u))
        med = c[o2][starts + (sizes - 1) // 2]
        med_row = np.repeat(med, sizes)
        keep = c != med_row
        sign = np.where(c > med_row, 1, -1)
        rows = []
        uu = u[starts]
        for i, st in enumerate(starts):
            k = keep[st:st + sizes[i]]
            s = sign[st:st + sizes[i]][k]
            n_pos = int((s > 0).sum())
            n_neg = int(len(s) - n_pos)
            n_runs = int(1 + (s[1:] != s[:-1]).sum()) if len(s) else 0
            rows.append({"user_id": int(uu[i]), "n_pos": n_pos,
                         "n_neg": n_neg, "n_runs": n_runs})
        return pd.DataFrame(rows).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def peak_hour_by_user(ds, *, n_parts: int = 32):
    """Mode hour-of-day per user (tie -> smallest hour) ->
    (user_id, peak_hour, n_at_peak).  Activity-profile classic.

    Map-side (user, hour) pre-count per batch bounds the shuffle at
    24 rows per user per block; the keyed partition pass only merges
    those partials and picks the argmax — no raw-event shuffle."""

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "hour": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ts = b.column("ts").to_pandas()
        ok = ts.notna().to_numpy()
        g = pd.DataFrame({"user_id": b.column("user_id").to_pandas()
                          .to_numpy()[ok].astype(np.int64),
                          "hour": ts.dt.hour.to_numpy()[ok]
                          .astype(np.int64)}) \
            .groupby(["user_id", "hour"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({"user_id": pa.array(idx["user_id"], pa.int64()),
                         "hour": pa.array(idx["hour"], pa.int64()),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "peak_hour": "int64",
                "n_at_peak": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby(["user_id", "hour"], as_index=False)["cnt"].sum()
        g = g.sort_values(["user_id", "cnt", "hour"],
                          ascending=[True, False, True],
                          kind="mergesort")
        out = g.drop_duplicates("user_id")
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "peak_hour": out["hour"].to_numpy(np.int64),
            "n_at_peak": out["cnt"].to_numpy(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return _grouped_by_partition(pre_ds, ["user_id"], resolve,
                                 n_parts=n_parts)


def type_switch_rate(ds, *, n_parts: int = 32):
    """Per-user event-type switching rate: over the (ts, event_id)
    ordered stream, n_switches = count of consecutive pairs whose
    event_type differs, n_pairs = n-1, switch_ppm = the truncated
    integer rate -> (user_id, n_pairs, n_switches, switch_ppm); users
    with < 2 events are dropped.  Behavioral-diversity screen.

    One user-keyed partition pass; boundary comparison is one
    vectorized shift over factorized type codes."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_pairs": "int64",
                "n_switches": "int64", "switch_ppm": "int64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        typ = pd.factorize(df["event_type"].fillna(""))[0]
        order = np.lexsort((eid, ts, user))
        u, t = user[order], typ[order]
        same_u = u[1:] == u[:-1]
        switch = (t[1:] != t[:-1]) & same_u
        g = pd.DataFrame({"u": u[1:][same_u],
                          "sw": switch[same_u].astype(np.int64)})
        agg = g.groupby("u", as_index=False).agg(
            n_pairs=("sw", "size"), n_switches=("sw", "sum"))
        if len(agg) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        pairs = agg["n_pairs"].to_numpy(np.int64)
        sw = agg["n_switches"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": agg["u"].to_numpy(np.int64),
            "n_pairs": pairs, "n_switches": sw,
            "switch_ppm": sw * 1_000_000 // pairs}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def event_gap_quantiles(ds, *, n_parts: int = 32):
    """Inter-event-gap distribution per user: consecutive-gap
    microseconds in (ts, event_id) order -> (user_id, n_gaps,
    min_gap_us, med_gap_us, max_gap_us); users with < 2 events are
    dropped.  med = discrete median (sorted[(n-1)//2], the
    quantile_disc 0.5 convention) — exact int64 end-to-end.

    One user-keyed partition pass; gaps, per-user min/max and the
    median index lookup are all computed from two lexsorts — no
    per-user Python loop."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_gaps": "int64",
                "min_gap_us": "int64", "med_gap_us": "int64",
                "max_gap_us": "int64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, user))
        u, t = user[order], ts[order]
        same_u = u[1:] == u[:-1]
        gu = u[1:][same_u]
        gap = (t[1:] - t[:-1])[same_u]
        if len(gu) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        o2 = np.lexsort((gap, gu))
        su, sg = gu[o2], gap[o2]
        starts = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
        sizes = np.diff(np.r_[starts, len(su)])
        med = sg[starts + (sizes - 1) // 2]
        return pd.DataFrame({
            "user_id": su[starts], "n_gaps": sizes.astype(np.int64),
            "min_gap_us": sg[starts],
            "med_gap_us": med,
            "max_gap_us": sg[starts + sizes - 1]}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def user_type_entropy(ds, *, n_parts: int = 32):
    """Shannon entropy (nats) of each user's event-type mix ->
    (user_id, n_events, n_types, entropy_ppm = floor(H * 1e6)).
    Behavioral-diversity screen; H is float but both engines derive
    it from the SAME exact integer counts and the ppm floor sits far
    above double noise (the grouped_entropy discipline, made
    per-user scale-safe).

    Map-side (user, type) pre-count bounds the shuffle at
    |type alphabet| rows per user per block; the user-keyed partition
    pass merges partials and computes -p ln p with one reduceat per
    partition — no driver-side cross-tab (users are O(corpus), unlike
    sources)."""

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "et": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = pd.DataFrame({
            "user_id": b.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "et": b.column("event_type").to_pandas()
            .fillna("").to_numpy(object)}) \
            .groupby(["user_id", "et"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({"user_id": pa.array(idx["user_id"],
                                             pa.int64()),
                         "et": pa.array(idx["et"], pa.string()),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64",
                "n_types": "int64", "entropy_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby(["user_id", "et"], as_index=False)["cnt"].sum()
        g = g.sort_values(["user_id", "et"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        tot = np.add.reduceat(c, starts)
        p = c / np.repeat(tot, sizes)
        h = np.add.reduceat(-p * np.log(p), starts)
        return pd.DataFrame({
            "user_id": u[starts], "n_events": tot.astype(np.int64),
            "n_types": sizes.astype(np.int64),
            "entropy_ppm": np.floor(h * 1_000_000).astype(np.int64)
        }).astype(cols)

    from .dedup import _grouped_by_partition
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    return _grouped_by_partition(pre_ds, ["user_id"], resolve,
                                 n_parts=n_parts)


def user_value_autocorr(ds, *, n_parts: int = 32):
    """Lag-1 autocorrelation of each user's cents series in
    (ts, event_id) order -> (user_id, n_pairs, acf1).  Trend/momentum
    screen for event streams: acf1 near +1 = persistent level, near
    -1 = alternating.

    All six moment sums over the (x_t, x_{t+1}) pair stream are EXACT
    int64 (cents), and the float is formed with the grouped_corr IEEE
    op sequence (int64 num/den terms -> one double divide), so the
    output is bit-identical vs SQL.  One user-keyed partition pass;
    pair extraction is a masked shift, per-user moments one pandas
    groupby — no per-user Python loop.  int64-safe while
    n_user * sum(cents^2) < 2^63 (holds past 1e6 events/user at
    ~$1e3 values)."""

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_pairs": "int64",
                "acf1": "float64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        cents = np.rint(np.nan_to_num(
            df["value"].to_numpy(np.float64)) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, c = user[order], cents[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(columns=list(cols)).astype(cols)
        x, y = c[:-1][same], c[1:][same]
        g = pd.DataFrame({"u": u[1:][same], "n": 1, "sx": x, "sy": y,
                          "sxx": x * x, "syy": y * y, "sxy": x * y}) \
            .groupby("u", as_index=False).sum()
        n = g["n"].to_numpy(np.int64)
        sx = g["sx"].to_numpy(np.int64)
        sy = g["sy"].to_numpy(np.int64)
        vx = n * g["sxx"].to_numpy(np.int64) - sx * sx
        vy = n * g["syy"].to_numpy(np.int64) - sy * sy
        num = (n * g["sxy"].to_numpy(np.int64) - sx * sy)
        ok = (vx > 0) & (vy > 0)
        acf = num[ok].astype(np.float64) \
            / (np.sqrt(vx[ok].astype(np.float64))
               * np.sqrt(vy[ok].astype(np.float64)))
        return pd.DataFrame({
            "user_id": g["u"].to_numpy(np.int64)[ok],
            "n_pairs": n[ok], "acf1": acf}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(ds, ["user_id"], per_user,
                                 n_parts=n_parts)


def type_transitions(ds, *, n_parts: int = 32):
    """Event-type Markov transition counts over per-user ordered
    streams: every consecutive (ts, event_id)-ordered pair within a
    user contributes one (from_type, to_type) observation; counts sum
    globally -> (from_type, to_type, n_pairs).  The empirical
    transition matrix behind session-behavior models.

    One user-keyed partition pass emits LOCAL (from, to) counts
    (bounded by the type-alphabet squared per partition, never by
    rows), then a tiny groupby sums partials.  Null types fold to ''
    (the corpus-wide COALESCE policy)."""
    from ray.data.aggregate import Sum

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"from_type": "object", "to_type": "object",
                "n_pairs": "int64"}
        df = df[df["ts"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        codes, uniq = pd.factorize(df["event_type"].fillna(""))
        order = np.lexsort((eid, ts, user))
        u, t = user[order], codes[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = pd.DataFrame({"f": t[:-1][same], "t": t[1:][same]}) \
            .groupby(["f", "t"], sort=False).size()
        idx = g.index.to_frame(index=False)
        names = np.asarray(uniq, object)
        return pd.DataFrame({
            "from_type": names[idx["f"].to_numpy()],
            "to_type": names[idx["t"].to_numpy()],
            "n_pairs": g.to_numpy(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(ds, ["user_id"], per_user,
                                     n_parts=n_parts)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "from_type": pc.cast(b.column("from_type"), pa.string()),
            "to_type": pc.cast(b.column("to_type"), pa.string()),
            "n_pairs": pc.cast(b.column("sum(n_pairs)"), pa.int64())})

    return partials.groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n_pairs")) \
        .map_batches(finish, batch_format="pyarrow")


def dau_stickiness(ds, *, n_parts: int = 32):
    """Monthly activity summary: MAU (distinct users), the sum of
    daily DAU over the month's observed days, and the stickiness
    ratio sum_dau / (n_days * mau) in truncated ppm ->
    (month, mau, n_days, sum_dau, stickiness_ppm).  month/day are
    epoch-derived integers (day = epoch_us // 86.4e9, month =
    year*12+month-1) so every step is exact in both engines.

    Scale shape: map-side per-batch (user, day) dedup bounds the
    exchange at unique user-days per block; ONE user-keyed partition
    pass finishes each user's distinct day/month sets exactly once
    and emits bounded (day|month, count) partials; a tiny groupby
    sums them and the driver assembles the O(months) result."""

    US_DAY = 86_400_000_000

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64()),
                             "month": pa.array([], pa.int64())})
        ts = b.column("ts").to_pandas()
        ok = ts.notna().to_numpy()
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[ok]
        t = ts[ok]
        day = (t.to_numpy().astype("datetime64[us]").astype(np.int64)
               // US_DAY)
        month = (t.dt.year.to_numpy(np.int64) * 12
                 + t.dt.month.to_numpy(np.int64) - 1)
        df = pd.DataFrame({"user_id": u, "day": day, "month": month}) \
            .drop_duplicates(["user_id", "day"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"kind": "int64", "key": "int64", "cnt": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        days = df.drop_duplicates(["user_id", "day"])
        months = df.drop_duplicates(["user_id", "month"])
        dg = days.groupby("day").size()
        mg = months.groupby("month").size()
        return pd.DataFrame({
            "kind": np.r_[np.zeros(len(dg), np.int64),
                          np.ones(len(mg), np.int64)],
            "key": np.r_[dg.index.to_numpy(np.int64),
                         mg.index.to_numpy(np.int64)],
            "cnt": np.r_[dg.to_numpy(np.int64),
                         mg.to_numpy(np.int64)]}).astype(cols)

    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    partials = _grouped_by_partition(pre_ds, ["user_id"], per_user,
                                     n_parts=n_parts)
    rows = partials.groupby(["kind", "key"]).aggregate(Sum("cnt")) \
        .take_all()

    out_cols = {"month": "int64", "mau": "int64", "n_days": "int64",
                "sum_dau": "int64", "stickiness_ppm": "int64"}
    mau = {int(r["key"]): int(r["sum(cnt)"]) for r in rows
           if r["kind"] == 1}
    per_month: dict = {}
    for r in rows:
        if r["kind"] == 0:
            day = int(r["key"])
            ts = pd.Timestamp(day * US_DAY, unit="us")
            mo = ts.year * 12 + ts.month - 1
            nd, sd = per_month.get(mo, (0, 0))
            per_month[mo] = (nd + 1, sd + int(r["sum(cnt)"]))
    out = [{"month": mo, "mau": mau.get(mo, 0), "n_days": nd,
            "sum_dau": sd,
            "stickiness_ppm": sd * 1_000_000
            // max(nd * mau.get(mo, 0), 1)}
           for mo, (nd, sd) in sorted(per_month.items())]
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def retention_cohorts(ds, *, n_parts: int = 32):
    """Weekly retention triangle: cohort = each user's FIRST active
    epoch-week (epoch_days // 7 — exact in both engines), one row per
    (cohort_week, week_offset) with the distinct users active at that
    offset -> (cohort_week, week_offset, n_users); offset 0 rows are
    the cohort sizes.  THE canonical product-analytics pipeline.

    Scale shape: map-side (user, week) dedup, ONE user-keyed
    partition pass per user (min week + distinct offsets emitted as
    bounded partial counts), tiny (cohort, offset) groupby sum — the
    exchange never carries raw events."""

    US_WEEK = 7 * 86_400_000_000

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "week": pa.array([], pa.int64())})
        ts = b.column("ts").to_pandas()
        ok = ts.notna().to_numpy()
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[ok]
        week = (ts[ok].to_numpy().astype("datetime64[us]")
                .astype(np.int64) // US_WEEK)
        df = pd.DataFrame({"user_id": u, "week": week}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cohort_week": "int64", "week_offset": "int64",
                "cnt": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        d = df.drop_duplicates(["user_id", "week"])
        first = d.groupby("user_id")["week"].transform("min")
        g = pd.DataFrame({
            "cohort_week": first.to_numpy(np.int64),
            "week_offset": (d["week"] - first).to_numpy(np.int64)}) \
            .groupby(["cohort_week", "week_offset"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pd.DataFrame({
            "cohort_week": idx["cohort_week"].to_numpy(np.int64),
            "week_offset": idx["week_offset"].to_numpy(np.int64),
            "cnt": g.to_numpy(np.int64)}).astype(cols)

    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    partials = _grouped_by_partition(pre_ds, ["user_id"], per_user,
                                     n_parts=n_parts)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": pc.cast(b.column("cohort_week"),
                                   pa.int64()),
            "week_offset": pc.cast(b.column("week_offset"),
                                   pa.int64()),
            "n_users": pc.cast(b.column("sum(cnt)"), pa.int64())})

    return partials.groupby(["cohort_week", "week_offset"]) \
        .aggregate(Sum("cnt")).map_batches(finish,
                                           batch_format="pyarrow")


def user_lifespan_hist(ds, *, n_parts: int = 32):
    """Distribution of user lifespans: whole days between each user's
    first and last event -> (lifespan_days, n_users), exact integers
    (floor of the microsecond span / 86400e6 — positive operands, so
    DuckDB's truncating // and numpy's floor // agree).

    Map-side per-batch (user, min, max) partials bound the exchange
    at one row per user per block; one user-keyed partition pass
    merges them and pre-counts spans, a tiny groupby sums."""

    US_DAY = 86_400_000_000

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        ts = b.column("ts").to_pandas()
        ok = ts.notna().to_numpy()
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[ok]
        t = ts[ok].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": u, "mn": t, "mx": t}) \
            .groupby("user_id", as_index=False) \
            .agg(mn=("mn", "min"), mx=("mx", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"lifespan_days": "int64", "n_users": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("user_id", as_index=False) \
            .agg(mn=("mn", "min"), mx=("mx", "max"))
        days = (g["mx"].to_numpy(np.int64)
                - g["mn"].to_numpy(np.int64)) // US_DAY
        c = pd.Series(days).value_counts()
        return pd.DataFrame({
            "lifespan_days": c.index.to_numpy(np.int64),
            "n_users": c.to_numpy(np.int64)}).astype(cols)

    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    pre_ds = ds.map_batches(pre, batch_format="pyarrow")
    partials = _grouped_by_partition(pre_ds, ["user_id"], resolve,
                                     n_parts=n_parts)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "lifespan_days": pc.cast(b.column("lifespan_days"),
                                     pa.int64()),
            "n_users": pc.cast(b.column("sum(n_users)"), pa.int64())})

    return partials.groupby("lifespan_days").aggregate(Sum("n_users")) \
        .map_batches(finish, batch_format="pyarrow")


def user_daily_ohlc(ds, *, n_parts: int = 32):
    """Per (user, day) OHLC bars over event value: open/close are the
    values at the earliest/latest (ts, event_id) — the composite key
    makes the tie-break total and deterministic — high/low are
    max/min.  All four are SELECTED doubles (never summed), so the
    floats are exact in both engines; day is the integer epoch-day
    (epoch_us // 86_400_000_000, all-positive so floor == truncate).

    Scale shape: per-batch vectorized partial bars per (user, day)
    (one lexsort per batch — each partial carries its own
    open/close anchors), then ONE (user, day)-keyed partition pass
    merges partials by re-running the same argmin/argmax over the
    few candidate rows per bar.  The exchange carries one row per
    (user, day, batch), never raw events."""
    from .dedup import _grouped_by_partition

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        schema = {"user_id": pa.int64(), "day": pa.int64(),
                  "o_ts": pa.int64(), "o_eid": pa.int64(),
                  "open": pa.float64(), "c_ts": pa.int64(),
                  "c_eid": pa.int64(), "close": pa.float64(),
                  "high": pa.float64(), "low": pa.float64(),
                  "n_events": pa.int64()}
        if b.num_rows == 0:
            return pa.table({k: pa.array([], t)
                             for k, t in schema.items()})
        u = pc.fill_null(pc.cast(b.column("user_id"), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ts_col = b.column("ts")
        if pa.types.is_timestamp(ts_col.type):
            ts_col = pc.cast(ts_col, pa.timestamp("us"))
        ts = pc.fill_null(pc.cast(ts_col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        eid = pc.fill_null(pc.cast(b.column("event_id"), pa.int64()),
                           -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.nan_to_num(b.column("value")
                          .to_numpy(zero_copy_only=False)
                          .astype(np.float64))
        day = ts // DAY_US
        order = np.lexsort((eid, ts, day, u))
        u, ts, eid, v, day = (a[order] for a in (u, ts, eid, v, day))
        new = np.empty(len(u), bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)] - 1
        # within a (user, day) run the rows are (ts, eid)-sorted:
        # first row = open anchor, last = close anchor
        hi = np.maximum.reduceat(v, starts)
        lo = np.minimum.reduceat(v, starts)
        cnt = np.r_[starts[1:], len(u)] - starts
        return pa.table({
            "user_id": pa.array(u[starts]), "day": pa.array(day[starts]),
            "o_ts": pa.array(ts[starts]), "o_eid": pa.array(eid[starts]),
            "open": pa.array(v[starts]), "c_ts": pa.array(ts[ends]),
            "c_eid": pa.array(eid[ends]), "close": pa.array(v[ends]),
            "high": pa.array(hi), "low": pa.array(lo),
            "n_events": pa.array(cnt.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "day": "int64", "open": "float64",
                "high": "float64", "low": "float64", "close": "float64",
                "n_events": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(["user_id", "day", "o_ts", "o_eid"],
                            kind="stable")
        first = df.groupby(["user_id", "day"], as_index=False, sort=False) \
            .agg(open=("open", "first"))
        df2 = df.sort_values(["user_id", "day", "c_ts", "c_eid"],
                             kind="stable")
        last = df2.groupby(["user_id", "day"], as_index=False, sort=False) \
            .agg(close=("close", "last"))
        rng = df.groupby(["user_id", "day"], as_index=False, sort=False) \
            .agg(high=("high", "max"), low=("low", "min"),
                 n_events=("n_events", "sum"))
        out = first.merge(last, on=["user_id", "day"]) \
                   .merge(rng, on=["user_id", "day"])
        return out[list(cols)].astype(cols)

    return _grouped_by_partition(partials, ["user_id", "day"], resolve,
                                 n_parts=n_parts)


def user_survival_km(ds, *, censor_us: int = 604_800_000_000):
    """Kaplan-Meier survival curve over user lifetimes (churn
    analysis): duration = whole days between a user's first and last
    event; users whose last event falls within `censor_us` of the
    corpus end are right-CENSORED (still alive at observation end) —
    they stay in the risk set through their duration but add no death.
    -> one row per death day: (day, n_risk, n_events, log_surv_ppm)
    where log_surv_ppm is the running sum of
    floor(1e6 * ln(1 - d_i/n_i)) — the log of the product-limit
    estimator as an ORDER-FREE integer cumsum (each step's float ln is
    floored to ppm before summation, so both engines agree exactly);
    a saturated step (d == n, survival hits 0) contributes the
    sentinel -1e15.

    Scale shape: per-batch (user, min_ts, max_ts) partials -> ONE
    native user-keyed Min/Max aggregate -> map-side bounded day
    histogram (d_events, leaving per day) -> driver cumsum over the
    day domain (bounded by the corpus time span, not by users)."""
    import math

    from ray.data.aggregate import Max, Min, Sum

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "f": pa.array([], pa.int64()),
                             "l": pa.array([], pa.int64())})
        u = pc.fill_null(pc.cast(b.column("user_id"), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ts_col = b.column("ts")
        if pa.types.is_timestamp(ts_col.type):
            ts_col = pc.cast(ts_col, pa.timestamp("us"))
        ts = pc.fill_null(pc.cast(ts_col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"user_id": u, "f": ts, "l": ts}) \
            .groupby("user_id", sort=False, as_index=False) \
            .agg(f=("f", "min"), l=("l", "max"))
        return pa.table({"user_id": pa.array(g["user_id"]
                                             .to_numpy(np.int64)),
                         "f": pa.array(g["f"].to_numpy(np.int64)),
                         "l": pa.array(g["l"].to_numpy(np.int64))})

    users = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("f"), Max("l")) \
        .materialize()

    out_cols = {"day": "int64", "n_risk": "int64", "n_events": "int64",
                "log_surv_ppm": "int64"}
    gmax_rows = users.aggregate(Max("max(l)"))
    if not gmax_rows or gmax_rows.get("max(max(l))") is None:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    gmax = int(gmax_rows["max(max(l))"])
    cutoff = gmax - censor_us

    def day_hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "d_events": pa.array([], pa.int64()),
                             "leaving": pa.array([], pa.int64())})
        f = b.column("min(f)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        last = b.column("max(l)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dur = (last - f) // DAY_US
        observed = (last <= cutoff).astype(np.int64)
        g = pd.DataFrame({"day": dur, "d_events": observed,
                          "leaving": 1}) \
            .groupby("day", sort=False, as_index=False).sum()
        return pa.table({"day": pa.array(g["day"].to_numpy(np.int64)),
                         "d_events": pa.array(g["d_events"]
                                              .to_numpy(np.int64)),
                         "leaving": pa.array(g["leaving"]
                                             .to_numpy(np.int64))})

    rows = users.map_batches(day_hist, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("d_events"), Sum("leaving")) \
        .take_all()
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    hist = sorted((int(r["day"]), int(r["sum(d_events)"]),
                   int(r["sum(leaving)"])) for r in rows)
    n_total = sum(lv for _, _, lv in hist)
    out = []
    n_risk = n_total
    log_ppm = 0
    for day, d, leaving in hist:
        if d > 0:
            if d < n_risk:
                term = math.floor(1_000_000.0 * math.log(
                    1.0 - float(d) / float(n_risk)))
            else:
                term = -1_000_000_000_000_000
            log_ppm += term
            out.append({"day": day, "n_risk": n_risk, "n_events": d,
                        "log_surv_ppm": log_ppm})
        n_risk -= leaving
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def user_value_interp(ds, *, grid_us: int = 3_600_000_000,
                      n_parts: int = 32):
    """Linear-interpolation resampling of each user's value series
    onto an hourly grid — the gap-filling counterpart to
    user_value_locf, in EXACT scaled integers: with per-(user, ts)
    values deduped (largest event_id wins) and quantized to
    v_milli = floor(value * 1000), a grid point t inside segment
    [t0, t1) gets v0 + trunc((v1 - v0) * (t - t0) / (t1 - t0)) —
    integer TRUNCATING division, mirroring DuckDB's `//` on signed
    operands (Python's floor-div differs on negatives, so the kernel
    truncates explicitly) -> (user_id, hour, value_milli).

    Scale shape: ONE user-keyed partition pass; inside a partition the
    resolve is fully vectorized WITHOUT per-user loops — instead of
    locating each grid point's segment (a per-user searchsorted), it
    walks the SEGMENTS: every consecutive event pair (t0, t1) owns the
    grid points in [t0, t1), whose count is a closed form, so
    np.repeat + arange generates all grid rows in one shot; a user's
    last event emits its own grid point when it lands exactly on the
    grid."""
    from .dedup import _grouped_by_partition

    def prep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64()),
                             "eid": pa.array([], pa.int64()),
                             "vm": pa.array([], pa.int64())})
        u = pc.fill_null(pc.cast(b.column("user_id"), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ts_col = b.column("ts")
        if pa.types.is_timestamp(ts_col.type):
            ts_col = pc.cast(ts_col, pa.timestamp("us"))
        ts = pc.fill_null(pc.cast(ts_col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        eid = pc.fill_null(pc.cast(b.column("event_id"), pa.int64()),
                           -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.nan_to_num(b.column("value")
                          .to_numpy(zero_copy_only=False)
                          .astype(np.float64))
        vm = np.floor(v * 1000.0).astype(np.int64)
        return pa.table({"user_id": pa.array(u), "ts_us": pa.array(ts),
                         "eid": pa.array(eid), "vm": pa.array(vm)})

    H = grid_us

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "hour": "int64",
                "value_milli": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        # (user, ts) dedupe: largest eid wins
        df = df.sort_values(["user_id", "ts_us", "eid"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        vm = df["vm"].to_numpy(np.int64)
        last_of_ts = np.ones(len(df), bool)
        last_of_ts[:-1] = (u[:-1] != u[1:]) | (ts[:-1] != ts[1:])
        u, ts, vm = u[last_of_ts], ts[last_of_ts], vm[last_of_ts]
        n = len(u)
        out_parts = []
        # segments: consecutive rows of the SAME user
        if n > 1:
            seg = u[:-1] == u[1:]
            t0, t1 = ts[:-1][seg], ts[1:][seg]
            v0, v1 = vm[:-1][seg], vm[1:][seg]
            su = u[:-1][seg]
            h_start = -((-t0) // H)          # ceil(t0 / H)
            h_end = -((-t1) // H) - 1        # last grid < t1
            cnt = np.maximum(h_end - h_start + 1, 0)
            if cnt.sum() > 0:
                rep = np.repeat(np.arange(len(cnt)), cnt)
                # arange within each segment
                offs = np.arange(len(rep)) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt)
                hh = h_start[rep] + offs
                t = hh * H
                num = (v1[rep] - v0[rep]) * (t - t0[rep])
                den = t1[rep] - t0[rep]
                q = np.sign(num) * (np.abs(num) // den)  # truncation
                out_parts.append(pd.DataFrame({
                    "user_id": su[rep], "hour": hh,
                    "value_milli": v0[rep] + q}))
        # each user's LAST event emits a point when exactly on-grid
        is_last = np.ones(n, bool)
        is_last[:-1] = u[:-1] != u[1:]
        lu, lt, lv = u[is_last], ts[is_last], vm[is_last]
        on_grid = lt % H == 0
        if on_grid.any():
            out_parts.append(pd.DataFrame({
                "user_id": lu[on_grid], "hour": lt[on_grid] // H,
                "value_milli": lv[on_grid]}))
        if not out_parts:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = pd.concat(out_parts, ignore_index=True)
        return out.astype(cols)

    partials = ds.map_batches(prep, batch_format="pyarrow")
    return _grouped_by_partition(partials, ["user_id"], resolve,
                                 n_parts=n_parts)


def event_type_stationary(ds, *, iters: int = 8, n_parts: int = 32):
    """Markov stationary-distribution probe: power iteration over the
    empirical event-type transition matrix (the oracled
    type_transitions kernel), in EXACT ppm integers so every engine
    agrees bit for bit -> (event_type, v_ppm).

    v0 puts all 1e6 ppm on the lexicographically smallest state; each
    of the `iters` fixed rounds computes
    v'[j] = sum_i (v[i] * c[i][j]) // tot[i] with per-term floor
    division (mass leaks to the floor, deliberately — exactness over
    stochasticity).  States with no outgoing edges get a self-loop
    (c = tot = 1) so they hold mass like a PageRank dangling fix.

    Scale shape: the distributed work IS type_transitions (one
    user-keyed pass + a type-alphabet-bounded groupby); the matrix is
    alphabet^2 rows, so the iteration itself is driver-side tiny."""
    tr = type_transitions(ds, n_parts=n_parts).take_all()
    out_cols = {"event_type": "object", "v_ppm": "int64"}
    if not tr:
        return pd.DataFrame(columns=list(out_cols)).astype(
            {"v_ppm": "int64"})
    states = sorted({r["from_type"] for r in tr}
                    | {r["to_type"] for r in tr})
    tot: dict = {}
    for r in tr:
        tot[r["from_type"]] = tot.get(r["from_type"], 0) \
            + int(r["n_pairs"])
    mat = [(r["from_type"], r["to_type"], int(r["n_pairs"]),
            tot[r["from_type"]]) for r in tr]
    mat += [(s, s, 1, 1) for s in states if s not in tot]
    v = {s: 0 for s in states}
    v[states[0]] = 1_000_000
    for _ in range(iters):
        nxt = {s: 0 for s in states}
        for src, dst, c, t in mat:
            nxt[dst] += (v[src] * c) // t
        v = nxt
    return pd.DataFrame({"event_type": states,
                         "v_ppm": [v[s] for s in states]}) \
        .astype({"v_ppm": "int64"})


def mann_kendall_daily(ds, *, ts_col: str = "ts",
                       n_parts: int = 8):
    """Mann-Kendall trend test over the DAILY event-count series:
    S = sum over day pairs i<j of sign(c_j - c_i), an exact integer
    (the nonparametric monotone-trend statistic; S >> 0 = growth).
    -> one row (n_days, s_stat, n_concordant, n_discordant).

    Scale shape: daily counts via ONE (day) groupby (the exchange is
    bounded by the date domain, not events); the O(days^2) pair scan
    runs on the driver over that bounded series — days grow with
    calendar time, never with corpus size."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": "int64", "c_part": "int64"}
        t = pd.to_datetime(df[ts_col], errors="coerce")
        ok = t.notna()
        if not ok.any():
            return pd.DataFrame(columns=list(cols)).astype(cols)
        days = (t[ok].values.astype("datetime64[D]")
                .astype(np.int64))
        g = pd.Series(days).value_counts()
        return pd.DataFrame({"day": g.index.to_numpy(np.int64),
                             "c_part": g.to_numpy(np.int64)}) \
            .astype(cols)

    rows = ds.map_batches(day_partial, batch_format="pandas") \
        .groupby("day").aggregate(Sum("c_part")).take_all()
    out_cols = {"n_days": "int64", "s_stat": "int64",
                "n_concordant": "int64", "n_discordant": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    ser = sorted((int(r["day"]), int(r["sum(c_part)"])) for r in rows)
    c = np.asarray([v for _, v in ser], np.int64)
    diff = c[None, :] - c[:, None]
    iu = np.triu_indices(len(c), k=1)
    signs = np.sign(diff[iu])
    return pd.DataFrame({
        "n_days": [len(c)], "s_stat": [int(signs.sum())],
        "n_concordant": [int((signs > 0).sum())],
        "n_discordant": [int((signs < 0).sum())]}).astype(out_cols)
