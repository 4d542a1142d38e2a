"""Relational operators over the TPC-H-ish tables (Ray Data native).

Scale discipline per operator:
- pricing_summary (TPC-H Q1 shape): derived columns are vectorized
  pyarrow.compute inside map_batches; the shuffle carries only the
  6-value (returnflag, linestatus) key space through ONE native groupby.
- revenue_by_nation: orders are PRE-AGGREGATED per custkey before the
  join (the shuffle moves (custkey, sum) pairs, never order rows), then
  one hash join against the customer dimension, a second tiny groupby per
  nation, and a driver-side lookup of the 25-row nation names.
- asof_join_orders: as-of (most-recent-at-or-before) join, an operator
  Ray Data lacks.  Both sides are hash-partitioned BY KEY into bounded
  partitions (same pattern as dedup._grouped_by_partition) in ONE
  shuffle; each partition resolves all of its users with one sort +
  np.searchsorted pass, and the (custkey, orderdate) -> max(orderkey)
  tie-break dedup happens inside the partition (an up-front native Max
  aggregate would cost a second full shuffle for no volume reduction).
  Partitioning assumption: one user's orders + events fit in one
  partition's memory (salting by time range would defuse a hot user).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(lineitem_ds, cutoff: str = "2000-01-01"):
    """TPC-H Q1 pricing summary: -> (l_returnflag, l_linestatus,
    sum_qty_cents, sum_base_price_cents, sum_disc_price_cents,
    sum_charge_cents, n_rows).  Money/quantity sums emitted as integer
    cents (double-sum low bits are summation-order dependent)."""
    from ray.data.aggregate import Count, Sum
    cutoff_ts = np.datetime64(cutoff, "us")

    def derive(b: pa.Table) -> pa.Table:
        mask = pc.less_equal(b.column("l_shipdate"),
                             pa.scalar(cutoff_ts.item(), pa.timestamp("us")))
        b = b.filter(mask)
        ext = b.column("l_extendedprice")
        disc = b.column("l_discount")
        tax = b.column("l_tax")
        disc_price = pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), tax))
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty": b.column("l_quantity"),
            "base": ext,
            "disc_price": disc_price,
            "charge": charge})

    agg = lineitem_ds.map_batches(derive, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("qty"), Sum("base"), Sum("disc_price"),
                   Sum("charge"), Count())

    def finish(b: pa.Table) -> pa.Table:
        def cents(col):
            v = np.asarray(b.column(col).to_pylist(), dtype=np.float64)
            return pa.array(np.rint(v * 100.0).astype(np.int64), pa.int64())
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty_cents": cents("sum(qty)"),
            "sum_base_price_cents": cents("sum(base)"),
            "sum_disc_price_cents": cents("sum(disc_price)"),
            "sum_charge_cents": cents("sum(charge)"),
            "n_rows": pc.cast(b.column("count()"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(orders_ds, customer_ds, nation_ds, *,
                      num_partitions=None):
    """-> (n_name, revenue_cents, n_customers): total order revenue per
    customer nation.  Orders pre-aggregate per custkey BEFORE the join."""
    import ray
    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        # join aggregator actors carry fixed spin-up cost; 16 partitions
        # saturate a single node, real clusters pass num_partitions
        num_partitions = max(2, min(16, cpus))

    per_cust = orders_ds.groupby("o_custkey").aggregate(Sum("o_totalprice"))
    per_cust = per_cust.map_batches(
        lambda b: pa.table({"c_custkey": b.column("o_custkey"),
                            "spend": b.column("sum(o_totalprice)")}),
        batch_format="pyarrow")
    cust = customer_ds.map_batches(
        lambda b: b.select(["c_custkey", "c_nationkey"]),
        batch_format="pyarrow")
    joined = per_cust.join(cust, join_type="inner",
                           num_partitions=num_partitions, on=("c_custkey",))
    per_nation = joined.groupby("c_nationkey").aggregate(Sum("spend"), Count())

    # 25-row dimension: take to the driver, no shuffle
    names = {}
    for b in nation_ds.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b.column("n_nationkey").to_pylist(),
                        b.column("n_name").to_pylist()):
            names[k] = n

    def finish(b: pa.Table) -> pa.Table:
        keys = b.column("c_nationkey").to_pylist()
        spend = np.asarray(b.column("sum(spend)").to_pylist(), dtype=np.float64)
        return pa.table({
            "n_name": pa.array([names.get(k, "") for k in keys], pa.string()),
            "revenue_cents": pa.array(np.rint(spend * 100.0).astype(np.int64),
                                      pa.int64()),
            "n_customers": pc.cast(b.column("count()"), pa.int64())})

    return per_nation.map_batches(finish, batch_format="pyarrow")


def asof_join_orders(events_ds, orders_ds, *, n_parts: int = 64,
                     how: str = "inner"):
    """As-of join: each event matches its user's most recent order at or
    before the event time -> (event_id, user_id, ts, o_orderkey,
    o_orderdate).  `how="inner"` drops events with no prior order;
    `how="left"` keeps them with the sentinel (-1, epoch) so the output
    schema stays non-nullable (mirrors the oracle's COALESCE).

    Orders are deduped to max(o_orderkey) per (custkey, orderdate) INSIDE
    the per-partition resolve so ties are deterministic (mirrors the SQL
    oracle's CTE) without paying a separate aggregate shuffle."""
    from .dedup import _grouped_by_partition

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("o_custkey"), pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            "ts": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
            "event_id": pa.array([None] * n, pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64())})

    def event_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("user_id"), pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            "ts": pc.cast(b.column("ts"), pa.timestamp("us")),
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "o_orderkey": pa.array([None] * n, pa.int64())})

    both = events_ds.map_batches(event_rows, batch_format="pyarrow").union(
        orders_ds.map_batches(order_rows, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, g in df.groupby("key", sort=False):
            orders = g[g["side"] == 1]
            events = g[g["side"] == 0]
            if len(events) == 0:
                continue
            ets = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            eids = events["event_id"].to_numpy()
            if len(orders):
                ots = orders["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                okeys_raw = orders["o_orderkey"].to_numpy()
                # in-partition tie-break dedup: keep max orderkey per date
                order_sort = np.lexsort((okeys_raw, ots))
                ots = ots[order_sort]
                okeys = okeys_raw[order_sort]
                last = np.r_[ots[1:] != ots[:-1], True]  # last (=max) per ts
                ots = ots[last]
                okeys = okeys[last]
                idx = np.searchsorted(ots, ets, side="right") - 1
            else:
                idx = np.full(len(ets), -1)
            for eid, t, i in zip(eids, ets, idx):
                if i >= 0:
                    out.append((int(eid), int(key), t, int(okeys[i]),
                                int(ots[i])))
                elif how == "left":
                    out.append((int(eid), int(key), t, -1, 0))
        res = pd.DataFrame(out, columns=["event_id", "user_id", "ts",
                                         "o_orderkey", "o_orderdate"])
        if len(res):
            res["ts"] = res["ts"].astype("datetime64[us]")
            res["o_orderdate"] = res["o_orderdate"].astype("datetime64[us]")
        else:
            res = res.astype({"event_id": "int64", "user_id": "int64",
                              "ts": "datetime64[us]", "o_orderkey": "int64",
                              "o_orderdate": "datetime64[us]"})
        return res

    return _grouped_by_partition(both, ["key"], resolve, n_parts=n_parts)


def asof_join_orders_salted(events_ds, orders_ds, *, n_parts: int = 64,
                            how: str = "inner", salt_days: int = 365):
    """Hot-key-safe as-of join — same output (and SQL oracle) as
    asof_join_orders, but the big shuffle key is salted to
    (user, time-bucket) so no partition ever holds more than one
    user-BUCKET of rows (the sessionize_salted pattern; VERDICT r2 #4).

    Stage 1 (the only full-volume shuffle, salted): each (user, bucket)
    partition tie-dedups its orders, resolves its events against
    same-bucket prior orders, and emits (a) resolved matches, (b)
    unresolved events — no in-bucket prior order, (c) ONE boundary row =
    the bucket's last order.  Any order in an EARLIER bucket is strictly
    before every event of this bucket, so the correct match for an
    unresolved event is exactly the latest earlier boundary.
    Stage 2 (tiny): per user, the per-bucket boundary rows + unresolved
    bucket markers merge; each unresolved bucket gets its carry-in order
    (latest earlier boundary).
    Stage 3 (unresolved events only): carry-ins co-locate with their
    events on (user, bucket) and finish the match; `how="left"` keeps
    carry-less events with the (-1, epoch) sentinel."""
    from .dedup import _grouped_by_partition

    bucket_us = salt_days * 86_400 * 1_000_000

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ts = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        day = pc.divide(pc.cast(ts, pa.int64()), bucket_us)
        return pa.table({
            "key": pc.cast(b.column("o_custkey"), pa.int64()),
            "_day": day,
            "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            "ts": ts,
            "event_id": pa.array([None] * n, pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64())})

    def event_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ts = pc.cast(b.column("ts"), pa.timestamp("us"))
        day = pc.divide(pc.cast(ts, pa.int64()), bucket_us)
        return pa.table({
            "key": pc.cast(b.column("user_id"), pa.int64()),
            "_day": day,
            "side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            "ts": ts,
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "o_orderkey": pa.array([None] * n, pa.int64())})

    both = events_ds.map_batches(event_rows, batch_format="pyarrow").union(
        orders_ds.map_batches(order_rows, batch_format="pyarrow"))

    _COLS = ["kind", "event_id", "user_id", "day", "ts",
             "o_orderkey", "o_orderdate"]
    _TYPES = {c: "int64" for c in _COLS[1:]}
    _TYPES["kind"] = "int8"

    def resolve_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (key, day), g in df.groupby(["key", "_day"], sort=False):
            key, day = int(key), int(day)
            orders = g[g["side"] == 1]
            events = g[g["side"] == 0]
            okeys = ots = None
            if len(orders):
                ots = orders["ts"].to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                okeys_raw = orders["o_orderkey"].to_numpy()
                order_sort = np.lexsort((okeys_raw, ots))
                ots = ots[order_sort]
                okeys = okeys_raw[order_sort]
                last = np.r_[ots[1:] != ots[:-1], True]
                ots, okeys = ots[last], okeys[last]
                # (c) boundary: the bucket's last (tie-deduped) order
                out.append((2, -1, key, day, 0,
                            int(okeys[-1]), int(ots[-1])))
            if len(events) == 0:
                continue
            ets = events["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            eids = events["event_id"].to_numpy()
            idx = (np.searchsorted(ots, ets, side="right") - 1
                   if okeys is not None else np.full(len(ets), -1))
            for eid, t, i in zip(eids, ets, idx):
                if i >= 0:   # (a) resolved in-bucket
                    out.append((0, int(eid), key, day, t,
                                int(okeys[i]), int(ots[i])))
                else:        # (b) unresolved: needs an earlier bucket
                    out.append((1, int(eid), key, day, t, -1, 0))
        return pd.DataFrame(out, columns=_COLS).astype(_TYPES)

    staged = _grouped_by_partition(both, ["key", "_day"], resolve_bucket,
                                   n_parts=n_parts).materialize()

    resolved = staged.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)),
        batch_format="pyarrow")
    unresolved = staged.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 1)),
        batch_format="pyarrow")

    # stage 2 input: boundaries + one marker per unresolved bucket
    def summaries(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("kind"), 0))
        df = t.select(["kind", "user_id", "day", "o_orderkey",
                       "o_orderdate"]).to_pandas()
        df = df.drop_duplicates(subset=["kind", "user_id", "day"])
        return pa.Table.from_pandas(df, preserve_index=False)

    summary = staged.map_batches(summaries, batch_format="pyarrow")

    def carry_per_user(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for user, g in df.groupby("user_id", sort=False):
            bounds = g[g["kind"] == 2].sort_values("day")
            needs = g.loc[g["kind"] == 1, "day"].unique()
            if not len(needs) or not len(bounds):
                continue
            bdays = bounds["day"].to_numpy()
            for d in needs:
                i = np.searchsorted(bdays, d) - 1  # latest bucket < d
                if i >= 0:
                    row = bounds.iloc[i]
                    out.append((int(user), int(d), int(row["o_orderkey"]),
                                int(row["o_orderdate"])))
        return pd.DataFrame(out, columns=["user_id", "day", "o_orderkey",
                                          "o_orderdate"]
                            ).astype({"user_id": "int64", "day": "int64",
                                      "o_orderkey": "int64",
                                      "o_orderdate": "int64"})

    carries = _grouped_by_partition(summary, ["user_id"], carry_per_user,
                                    n_parts=n_parts)

    # stage 3: match unresolved events to their bucket's carry-in
    carry_rows = carries.map_batches(
        lambda b: pa.table({
            "kind": pa.array(np.full(b.num_rows, 2, np.int8), pa.int8()),
            "event_id": pa.array([-1] * b.num_rows, pa.int64()),
            "user_id": b.column("user_id"), "day": b.column("day"),
            "ts": pa.array([0] * b.num_rows, pa.int64()),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": b.column("o_orderdate")}),
        batch_format="pyarrow")

    def finish_unresolved(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (user, day), g in df.groupby(["user_id", "day"], sort=False):
            carry = g[g["kind"] == 2]
            ok, od = (int(carry["o_orderkey"].iloc[0]),
                      int(carry["o_orderdate"].iloc[0])) \
                if len(carry) else (None, None)
            for r in g[g["kind"] == 1].itertuples():
                if ok is not None:
                    out.append((0, int(r.event_id), int(user), int(day),
                                int(r.ts), ok, od))
                elif how == "left":
                    out.append((0, int(r.event_id), int(user), int(day),
                                int(r.ts), -1, 0))
        return pd.DataFrame(out, columns=_COLS).astype(_TYPES)

    late = _grouped_by_partition(unresolved.union(carry_rows),
                                 ["user_id", "day"], finish_unresolved,
                                 n_parts=n_parts)

    def to_output(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts": pc.cast(b.column("ts"), pa.timestamp("us")),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": pc.cast(b.column("o_orderdate"),
                                   pa.timestamp("us"))})

    return resolved.union(late).map_batches(to_output,
                                            batch_format="pyarrow")


def _big_order_custkeys(orders_ds, min_total: float):
    """Map-side filter + per-batch dedup of the join key: the anti/semi
    probe side ships only distinct custkeys per block."""
    def distinct_keys(b: pa.Table) -> pa.Table:
        mask = pc.greater(b.column("o_totalprice"), pa.scalar(min_total))
        keys = pc.unique(b.filter(mask).column("o_custkey"))
        return pa.table({"c_custkey": keys})
    return orders_ds.map_batches(distinct_keys, batch_format="pyarrow")


def _semi_anti_join(customer_ds, orders_ds, *, min_total: float,
                    join_type: str, num_partitions=None):
    import ray
    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(16, cpus))
    keys = _big_order_custkeys(orders_ds, min_total)
    return customer_ds.join(keys, join_type=join_type,
                            num_partitions=num_partitions,
                            on=("c_custkey",))


def customers_with_big_orders(customer_ds, orders_ds, *,
                              min_total: float = 400000.0,
                              num_partitions=None):
    """LEFT SEMI hash join: customers having at least one order above
    `min_total` -> (c_custkey, c_name); probe side is pre-deduped
    map-side so the shuffle carries distinct keys only."""
    return _semi_anti_join(customer_ds, orders_ds, min_total=min_total,
                           join_type="left_semi",
                           num_partitions=num_partitions)


def customers_without_big_orders(customer_ds, orders_ds, *,
                                 min_total: float = 400000.0,
                                 num_partitions=None):
    """LEFT ANTI hash join: customers with NO order above `min_total`."""
    return _semi_anti_join(customer_ds, orders_ds, min_total=min_total,
                           join_type="left_anti",
                           num_partitions=num_partitions)
