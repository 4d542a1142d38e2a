"""Relational operators over the TPC-H-ish tables (Ray Data native).

Scale discipline per operator:
- pricing_summary (TPC-H Q1 shape): derived columns are vectorized
  pyarrow.compute inside map_batches; the shuffle carries only the
  6-value (returnflag, linestatus) key space through ONE native groupby.
- revenue_by_nation: ONE custkey-partitioned shuffle carrying map-side
  (custkey, partial sum) rows unioned with (custkey, nationkey) customer
  rows; partitions emit per-nation partials, a 25-key groupby merges,
  and the 25-row nation names resolve on the driver.
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
                      num_partitions: int = 16):
    """-> (n_name, revenue_cents, n_customers): total order revenue per
    customer nation.

    ONE full shuffle total (round-3 rewrite; the round-2 groupby +
    hash-join pair cost two all-to-alls plus join-actor spin-up — A/B at
    sf0.1, 32 CPUs: ~20 s -> ~4.1 s, cent-identical): orders partial-sum
    per custkey map-side, union with tagged (custkey, nationkey)
    customer rows, hash-partition by custkey once; each partition maps
    its custkeys to nations and emits per-nation partials, which a tiny
    25-key groupby merges.  The 25-row nation dimension resolves on the
    driver."""
    from ray.data.aggregate import Sum

    from .dedup import _grouped_by_partition

    def opart(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": b.column("o_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "spend": b.column("o_totalprice").to_numpy(
                zero_copy_only=False)})
        g = df.groupby("key", sort=False)["spend"].sum()
        n = len(g)
        return pa.table({
            "key": pa.array(g.index.to_numpy(np.int64)),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "spend": pa.array(g.to_numpy(np.float64)),
            "nk": pa.array(np.full(n, -1, np.int64))})

    def cpart(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("c_custkey"), pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "spend": pa.array(np.zeros(n, np.float64)),
            "nk": pc.cast(b.column("c_nationkey"), pa.int64())})

    both = orders_ds.map_batches(opart, batch_format="pyarrow").union(
        customer_ds.map_batches(cpart, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nk": "int64", "spend": "float64", "ncust": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        cust = df[df["side"] == 1]
        nk = dict(zip(cust["key"].to_numpy(np.int64),
                      cust["nk"].to_numpy(np.int64)))
        o = df[df["side"] == 0]
        per = o.groupby("key", sort=False)["spend"].sum()
        keys = per.index.to_numpy(np.int64)
        nks = np.array([nk.get(k, -1) for k in keys], np.int64)
        valid = nks >= 0  # inner-join semantics: unknown custkeys drop
        sub = pd.DataFrame({"nk": nks[valid],
                            "spend": per.to_numpy()[valid]})
        g = sub.groupby("nk", sort=False)["spend"].agg(["sum", "count"])
        return pd.DataFrame({"nk": g.index.to_numpy(np.int64),
                             "spend": g["sum"].to_numpy(),
                             "ncust": g["count"].to_numpy(np.int64)})

    parts = _grouped_by_partition(both, ["key"], resolve,
                                  n_parts=num_partitions)
    agg = parts.groupby("nk").aggregate(Sum("spend"), Sum("ncust"))

    # 25-row dimension: take to the driver, no shuffle
    names = {}
    for b in nation_ds.iter_batches(batch_format="pyarrow"):
        for k, n in zip(b.column("n_nationkey").to_pylist(),
                        b.column("n_name").to_pylist()):
            names[k] = n

    def finish(b: pa.Table) -> pa.Table:
        keys = b.column("nk").to_pylist()
        spend = np.asarray(b.column("sum(spend)").to_pylist(),
                           dtype=np.float64)
        return pa.table({
            "n_name": pa.array([names.get(k, "") for k in keys],
                               pa.string()),
            "revenue_cents": pa.array(np.rint(spend * 100.0)
                                      .astype(np.int64), pa.int64()),
            "n_customers": pc.cast(b.column("sum(ncust)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def _seg_last_idx(flag: np.ndarray, group_change: np.ndarray):
    """Segmented forward scan: for every row, the index of the last
    preceding row (inclusive) with `flag` set WITHIN its group.
    Returns (last_idx, valid) where valid marks rows whose match lies in
    the same group.  One maximum.accumulate instead of a Python loop
    over groups — the kernel behind every as-of resolve here."""
    n = len(flag)
    idx = np.arange(n)
    last = np.maximum.accumulate(np.where(flag, idx, -1))
    starts = np.nonzero(group_change)[0]
    gid = np.cumsum(group_change) - 1
    return last, last >= starts[gid]


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
        # vectorized merge: sort (key, ts, orders-before-events,
        # orderkey), then one segmented forward scan picks, per event,
        # the latest order at ts' <= ts — with the max orderkey among
        # equal-ts orders (the sort puts it last), i.e. exactly the
        # per-user tie-break-dedup + searchsorted the loop version did.
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=["event_id", "user_id", "ts",
                                         "o_orderkey", "o_orderdate"]
                                ).astype({"event_id": "int64",
                                          "user_id": "int64",
                                          "ts": "datetime64[us]",
                                          "o_orderkey": "int64",
                                          "o_orderdate": "datetime64[us]"})
        key = df["key"].to_numpy(dtype=np.int64)
        side = df["side"].to_numpy(dtype=np.int8)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        okey = df["o_orderkey"].to_numpy(dtype=np.float64)  # NaN on events
        eid = df["event_id"].to_numpy(dtype=np.float64)
        order = np.lexsort((okey, (1 - side), ts, key))
        key_s, side_s = key[order], side[order]
        ts_s, okey_s, eid_s = ts[order], okey[order], eid[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = key_s[1:] != key_s[:-1]
        last, valid = _seg_last_idx(side_s == 1, gch)
        is_ev = side_s == 0
        hit = is_ev & valid
        out_eid = eid_s[hit].astype(np.int64)
        out_key = key_s[hit]
        out_ts = ts_s[hit]
        out_ok = okey_s[last[hit]].astype(np.int64)
        out_ot = ts_s[last[hit]]
        if how == "left":
            miss = is_ev & ~valid
            out_eid = np.concatenate([out_eid,
                                      eid_s[miss].astype(np.int64)])
            out_key = np.concatenate([out_key, key_s[miss]])
            out_ts = np.concatenate([out_ts, ts_s[miss]])
            out_ok = np.concatenate(
                [out_ok, np.full(int(miss.sum()), -1, np.int64)])
            out_ot = np.concatenate(
                [out_ot, np.zeros(int(miss.sum()), np.int64)])
        return pd.DataFrame({
            "event_id": out_eid, "user_id": out_key,
            "ts": out_ts.astype("datetime64[us]"),
            "o_orderkey": out_ok,
            "o_orderdate": out_ot.astype("datetime64[us]")})

    return _grouped_by_partition(both, ["key"], resolve, n_parts=n_parts)


def asof_join_orders_salted(events_ds, orders_ds, *, n_parts: int = 64,
                            how: str = "inner", salt_days: int = 365):
    """Hot-key-safe as-of join — same output (and SQL oracle) as
    asof_join_orders, but the big shuffle key is salted to
    (user, time-bucket) so no partition ever holds more than one
    user-BUCKET of rows (the sessionize_salted pattern; VERDICT r2 #4).

    Stage 1 (the only full-volume shuffle, salted): each (user, bucket)
    partition tie-dedups its orders, resolves its events against
    same-bucket prior orders (vectorized: one lexsort + one segmented
    forward scan per partition, no per-group Python loop), and emits
    (a) resolved matches, (b) unresolved events — no in-bucket prior
    order, (c) ONE boundary row = the bucket's last order.  Any order
    in an EARLIER bucket is strictly before every event of this bucket,
    so the correct match for an unresolved event is exactly the latest
    earlier boundary.
    Late stage (one small user-keyed shuffle): unresolved events and
    boundaries merge per user with the same segmented-scan kernel;
    `how="left"` keeps carry-less events with the (-1, epoch)
    sentinel."""
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
        # same vectorized segmented-scan kernel as the plain resolve,
        # grouped on (key, day); additionally emits one boundary row
        # per bucket (its last, tie-deduped order) for the carry merge
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=_COLS).astype(_TYPES)
        key = df["key"].to_numpy(dtype=np.int64)
        day = df["_day"].to_numpy(dtype=np.int64)
        side = df["side"].to_numpy(dtype=np.int8)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        okey = df["o_orderkey"].to_numpy(dtype=np.float64)
        eid = df["event_id"].to_numpy(dtype=np.float64)
        order = np.lexsort((okey, (1 - side), ts, day, key))
        key_s, day_s, side_s = key[order], day[order], side[order]
        ts_s, okey_s, eid_s = ts[order], okey[order], eid[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = (key_s[1:] != key_s[:-1]) | (day_s[1:] != day_s[:-1])
        last, valid = _seg_last_idx(side_s == 1, gch)
        is_ev = side_s == 0
        hit = is_ev & valid
        miss = is_ev & ~valid
        # (c) boundaries: last order index of each group, where present
        ends = np.r_[np.nonzero(gch)[0][1:] - 1, n - 1]
        bsel = valid[ends] if len(ends) else np.zeros(0, bool)
        bidx = last[ends][bsel]
        n_hit, n_miss, n_b = int(hit.sum()), int(miss.sum()), len(bidx)
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(n_hit, np.int8),
                                    np.ones(n_miss, np.int8),
                                    np.full(n_b, 2, np.int8)]),
            "event_id": np.concatenate([eid_s[hit].astype(np.int64),
                                        eid_s[miss].astype(np.int64),
                                        np.full(n_b, -1, np.int64)]),
            "user_id": np.concatenate([key_s[hit], key_s[miss],
                                       key_s[bidx]]),
            "day": np.concatenate([day_s[hit], day_s[miss], day_s[bidx]]),
            "ts": np.concatenate([ts_s[hit], ts_s[miss],
                                  np.zeros(n_b, np.int64)]),
            "o_orderkey": np.concatenate(
                [okey_s[last[hit]].astype(np.int64),
                 np.full(n_miss, -1, np.int64),
                 okey_s[bidx].astype(np.int64)]),
            "o_orderdate": np.concatenate(
                [ts_s[last[hit]], np.zeros(n_miss, np.int64),
                 ts_s[bidx]])}).astype(_TYPES)

    staged = _grouped_by_partition(both, ["key", "_day"], resolve_bucket,
                                   n_parts=n_parts).materialize()

    resolved = staged.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), 0)),
        batch_format="pyarrow")

    # late stage (the ONLY other shuffle; each Ray Sort has seconds of
    # fixed cost, so stages 2+3 of the round-2 design collapse into one
    # user-keyed pass): unresolved events + per-bucket boundaries merge
    # per user — an event in bucket d takes the latest boundary of a
    # STRICTLY earlier bucket (any order there precedes every event of
    # bucket d).  Partitioning assumption (far weaker than the plain
    # join's whole-user one): a user's unresolved-tail events (events
    # before the first order of their bucket) + one boundary per bucket
    # fit in one partition.
    late_in = staged.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("kind"), 0)),
        batch_format="pyarrow")

    def finish_late(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=_COLS).astype(_TYPES)
        user = df["user_id"].to_numpy(dtype=np.int64)
        day = df["day"].to_numpy(dtype=np.int64)
        kind = df["kind"].to_numpy(dtype=np.int8)
        ts = df["ts"].to_numpy(dtype=np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        okey = df["o_orderkey"].to_numpy(dtype=np.int64)
        odate = df["o_orderdate"].to_numpy(dtype=np.int64)
        # (user, day, kind): events (1) precede boundaries (2) at equal
        # day, so the scan only ever hands an event an EARLIER bucket's
        # boundary
        order = np.lexsort((kind, day, user))
        user_s, day_s, kind_s = user[order], day[order], kind[order]
        ts_s, eid_s = ts[order], eid[order]
        okey_s, odate_s = okey[order], odate[order]
        gch = np.empty(n, dtype=bool)
        gch[0] = True
        gch[1:] = user_s[1:] != user_s[:-1]
        last, valid = _seg_last_idx(kind_s == 2, gch)
        is_ev = kind_s == 1
        hit = is_ev & valid
        parts = {
            "event_id": [eid_s[hit]], "user_id": [user_s[hit]],
            "day": [day_s[hit]], "ts": [ts_s[hit]],
            "o_orderkey": [okey_s[last[hit]]],
            "o_orderdate": [odate_s[last[hit]]]}
        if how == "left":
            miss = is_ev & ~valid
            nm = int(miss.sum())
            parts["event_id"].append(eid_s[miss])
            parts["user_id"].append(user_s[miss])
            parts["day"].append(day_s[miss])
            parts["ts"].append(ts_s[miss])
            parts["o_orderkey"].append(np.full(nm, -1, np.int64))
            parts["o_orderdate"].append(np.zeros(nm, np.int64))
        out = {k: np.concatenate(v) for k, v in parts.items()}
        out["kind"] = np.zeros(len(out["event_id"]), np.int8)
        return pd.DataFrame(out)[_COLS].astype(_TYPES)

    late = _grouped_by_partition(late_in, ["user_id"], finish_late,
                                 n_parts=max(4, n_parts // 4))

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
    """Semi/anti join fused into ONE custkey-partitioned shuffle (no join
    aggregator actors): map-side-deduped probe keys union with customer
    rows, each partition filters its customers by membership in its key
    set.  Same semantics as Dataset.join(left_semi/left_anti) — A/B'd
    faster (the hash-join actor pool costs seconds of spin-up on a small
    session and an extra exchange at scale)."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    want = join_type == "left_semi"

    def tag_keys(b: pa.Table) -> pa.Table:
        mask = pc.greater(b.column("o_totalprice"), pa.scalar(min_total))
        keys = pc.unique(pc.cast(b.filter(mask).column("o_custkey"),
                                 pa.int64()))
        n = len(keys)
        return pa.table({
            "c_custkey": keys,
            "c_name": pa.array([""] * n, pa.string()),
            "_is_key": pa.array(np.ones(n, np.int8))})

    def tag_cust(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_name": pc.cast(b.column("c_name"), pa.string()),
            "_is_key": pa.array(np.zeros(b.num_rows, np.int8))})

    tagged = customer_ds.map_batches(tag_cust, batch_format="pyarrow") \
        .union(orders_ds.map_batches(tag_keys, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        is_key = df["_is_key"].to_numpy() == 1
        cust = df.loc[~is_key, ["c_custkey", "c_name"]]
        member = cust["c_custkey"].isin(df.loc[is_key, "c_custkey"])
        return cust.loc[member if want else ~member]

    return _grouped_by_partition(tagged, ["c_custkey"], resolve,
                                 n_parts=num_partitions)


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


def _cap_partitions(num_partitions, cap: int = 16):
    """Default hash-join partition count: bounded by cluster CPUs (join
    aggregator actors carry fixed spin-up cost; Ray 2.49 deadlocks a
    small session when concurrent join pools oversubscribe CPUs)."""
    if num_partitions is not None:
        return num_partitions
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus))


def shipping_priority(customer_ds, orders_ds, lineitem_ds, *,
                      segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10,
                      num_partitions=None):
    """TPC-H Q3 shape: top-k undelivered orders by revenue for one market
    segment -> (o_orderkey, revenue_c4, o_orderdate).

    Two partition shuffles, no joins (the former semi-join + groupby +
    hash-join plan cost four exchanges plus join actors: ~17.6 s ->
    ~12 s at sf0.1):
    1. custkey pass — segment custkeys (map-side filtered + deduped)
       union with open order rows; each partition keeps orders whose
       custkey is in its segment set (the semi join, fused).
    2. orderkey pass — surviving orders union with map-side
       (orderkey, int-c4 revenue) lineitem partials (exact integers:
       price cents x (100 - disc*100)); each partition sums revenue
       and attaches the order date.
    The final top-k is per-block partial top-k + a tiny driver merge —
    no global sort anywhere."""
    import ray

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    cut = pa.scalar(np.datetime64(cutoff, "us").item(), pa.timestamp("us"))
    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def seg_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("c_mktsegment"), pa.scalar(segment))
        keys = pc.unique(pc.cast(b.filter(m).column("c_custkey"),
                                 pa.int64()))
        n = len(keys)
        return pa.table({
            "key": keys,
            "o_orderkey": pa.array(np.full(n, -1, np.int64)),
            "o_orderdate": pa.array(np.full(n, -1, np.int64))})

    def open_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("o_orderdate"), cut))
        return pa.table({
            "key": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_orderdate": pc.cast(pc.cast(b.column("o_orderdate"),
                                           pa.timestamp("us")),
                                   pa.int64())})

    stage1 = customer_ds.map_batches(seg_keys, batch_format="pyarrow") \
        .union(orders_ds.map_batches(open_orders, batch_format="pyarrow"))

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": "int64", "o_orderdate": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_key = df["o_orderkey"].to_numpy(np.int64) < 0
        seg = set(df["key"].to_numpy(np.int64)[is_key].tolist())
        o = df[~is_key]
        keep = o["key"].isin(seg).to_numpy()
        return pd.DataFrame({
            "o_orderkey": o["o_orderkey"].to_numpy(np.int64)[keep],
            "o_orderdate": o["o_orderdate"].to_numpy(np.int64)[keep],
        }).astype(cols)

    sel = _grouped_by_partition(stage1, ["key"], semi,
                                n_parts=num_partitions)

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "rev_c4": pa.array(np.full(n, -1, np.int64)),
            "o_orderdate": b.column("o_orderdate")})

    def partial_rev(b: pa.Table) -> pa.Table:
        sd = b.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        b = b.filter(pa.array(sd > cut_us))
        if b.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([], pa.int64())})
        # exact integer revenue in 1e-4-dollar units: prices are exact
        # cents and discounts exact 2-decimals, so
        # price_cents * (100 - disc*100) is an integer identity on both
        # engines — no float rounding can disagree at any half-way point
        pcents = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        d100 = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        df = pd.DataFrame({
            "o_orderkey": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "rev_c4": pcents * (100 - d100)})
        g = df.groupby("o_orderkey", sort=False)["rev_c4"].sum()
        n = len(g)
        return pa.table({
            "o_orderkey": pa.array(g.index.to_numpy(np.int64)),
            "rev_c4": pa.array(g.to_numpy(np.int64)),
            "o_orderdate": pa.array(np.full(n, -1, np.int64))})

    stage2 = sel.map_batches(order_rows, batch_format="pyarrow").union(
        lineitem_ds.map_batches(partial_rev, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": "int64", "revenue_c4": "int64",
                "o_orderdate": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_li = df["o_orderdate"].to_numpy(np.int64) < 0
        rev = df[is_li].groupby("o_orderkey", sort=False)["rev_c4"].sum()
        o = df[~is_li]
        r = o["o_orderkey"].map(rev).to_numpy(np.float64)
        keep = ~np.isnan(r)  # inner semantics: no post-cutoff lineitems
        o = o[keep]
        out = pd.DataFrame({
            "o_orderkey": o["o_orderkey"].to_numpy(np.int64),
            "revenue_c4": r[keep].astype(np.int64),
            "o_orderdate": o["o_orderdate"].to_numpy(np.int64),
        }).astype(cols)
        # partial top-k inside the partition: at most k candidates leave
        idx = np.lexsort((out["o_orderkey"].to_numpy(),
                          -out["revenue_c4"].to_numpy()))[:k]
        return out.iloc[np.sort(idx)]

    cands_ds = _grouped_by_partition(stage2, ["o_orderkey"], attach,
                                     n_parts=num_partitions)
    cands = sorted(
        cands_ds.take_all(),
        key=lambda r: (-int(r["revenue_c4"]), int(r["o_orderkey"])))[:k]
    return ray.data.from_items(cands).map_batches(
        lambda b: pa.table({
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "revenue_c4": pc.cast(b.column("revenue_c4"), pa.int64()),
            "o_orderdate": pc.cast(pc.cast(b.column("o_orderdate"),
                                           pa.int64()),
                                   pa.timestamp("us"))}),
        batch_format="pyarrow")


def order_priority_counts(orders_ds, lineitem_ds, *,
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          num_partitions=None):
    """TPC-H Q4 shape: orders in a window having at least one lineitem
    shipped AFTER the order date -> (o_orderpriority, n_orders).

    The correlated EXISTS predicate (l_shipdate > o_orderdate)
    decorrelates into ONE orderkey-partitioned shuffle: lineitem ships
    only map-side (orderkey, max shipdate) partials, the date-filtered
    order rows union in, and each partition resolves its orders' EXISTS
    test and emits per-priority partial counts; a 5-key groupby merges.
    (The former native-groupby-max + hash-join plan cost two exchanges
    plus join actors: ~15 s -> ~11 s at sf0.1; the remaining wall is
    the one honest exchange over per-block (orderkey, max) partials —
    unsorted lineitem caps the map-side reduction.)"""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    lo = pa.scalar(np.datetime64(date_from, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_to, "us").item(), pa.timestamp("us"))

    def partial_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "ship": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string())})
        df = pd.DataFrame({
            "o_orderkey": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "ship": b.column("l_shipdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)})
        g = df.groupby("o_orderkey", sort=False)["ship"].max()
        n = len(g)
        return pa.table({
            "o_orderkey": pa.array(g.index.to_numpy(np.int64)),
            "ship": pa.array(g.to_numpy(np.int64)),
            "o_orderdate": pa.array(np.full(n, -1, np.int64)),
            "o_orderpriority": pa.array([""] * n, pa.string())})

    def window(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        b = b.filter(m)
        n = b.num_rows
        return pa.table({
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "ship": pa.array(np.full(n, -1, np.int64)),
            "o_orderdate": pc.cast(pc.cast(b.column("o_orderdate"),
                                           pa.timestamp("us")), pa.int64()),
            "o_orderpriority": b.column("o_orderpriority")})

    both = lineitem_ds.map_batches(partial_max, batch_format="pyarrow") \
        .union(orders_ds.map_batches(window, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderpriority": "object", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"n": "int64"})
        is_ship = df["o_orderdate"].to_numpy(np.int64) < 0
        mx = df[is_ship].groupby("o_orderkey", sort=False)["ship"].max()
        o = df[~is_ship]
        last = o["o_orderkey"].map(mx).fillna(-(1 << 62)).to_numpy(
            np.int64)
        late = o[last > o["o_orderdate"].to_numpy(np.int64)]
        g = late.groupby("o_orderpriority", sort=False).size()
        return pd.DataFrame({"o_orderpriority": g.index.to_numpy(object),
                             "n": g.to_numpy(np.int64)})

    parts = _grouped_by_partition(both, ["o_orderkey"], resolve,
                                  n_parts=num_partitions)
    from ray.data.aggregate import Sum
    agg = parts.groupby("o_orderpriority").aggregate(Sum("n"))
    return agg.map_batches(
        lambda b: pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_orders": pc.cast(b.column("sum(n)"), pa.int64())}),
        batch_format="pyarrow")


def large_volume_customers(customer_ds, orders_ds, lineitem_ds, *,
                           min_qty: int = 250, num_partitions=None):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    `min_qty`, with their customer -> (c_custkey, c_name, o_orderkey,
    o_orderdate, totalprice_cents, sum_qty).

    HAVING fused into ONE orderkey-partitioned shuffle: lineitem ships
    map-side (orderkey, int64 qty) partials (quantities are integral,
    so sums are exact and order-free), order rows union in, and each
    partition sums its orders' quantities, applies the HAVING filter,
    and attaches the order columns in place — no join.  The few
    qualifying rows then fetch customer names via a broadcast `is_in`
    filter (the top_customers pattern); the customer table is never
    shuffled.  (The former groupby + two sequenced hash joins: ~17.5 s
    -> ~4.5 s at sf0.1.)"""
    import ray

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def partial_qty(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "qty": pa.array([], pa.int64()),
                "c_custkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.int64()),
                "totalprice_cents": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "o_orderkey": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "qty": np.rint(b.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)})
        g = df.groupby("o_orderkey", sort=False)["qty"].sum()
        n = len(g)
        return pa.table({
            "o_orderkey": pa.array(g.index.to_numpy(np.int64)),
            "qty": pa.array(g.to_numpy(np.int64)),
            "c_custkey": pa.array(np.full(n, -1, np.int64)),
            "o_orderdate": pa.array(np.full(n, -1, np.int64)),
            "totalprice_cents": pa.array(np.full(n, -1, np.int64))})

    def order_cols(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "qty": pa.array(np.zeros(n, np.int64)),
            "c_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderdate": pc.cast(pc.cast(b.column("o_orderdate"),
                                           pa.timestamp("us")), pa.int64()),
            "totalprice_cents": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), pa.scalar(100.0))), pa.int64())})

    both = lineitem_ds.map_batches(partial_qty, batch_format="pyarrow") \
        .union(orders_ds.map_batches(order_cols, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_custkey": "int64", "o_orderkey": "int64",
                "o_orderdate": "int64", "totalprice_cents": "int64",
                "sum_qty": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_li = df["c_custkey"].to_numpy(np.int64) < 0
        qty = df[is_li].groupby("o_orderkey", sort=False)["qty"].sum()
        o = df[~is_li]
        sq = o["o_orderkey"].map(qty).fillna(0).to_numpy(np.int64)
        keep = sq > min_qty
        o = o[keep]
        return pd.DataFrame({
            "c_custkey": o["c_custkey"].to_numpy(np.int64),
            "o_orderkey": o["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": o["o_orderdate"].to_numpy(np.int64),
            "totalprice_cents": o["totalprice_cents"].to_numpy(np.int64),
            "sum_qty": sq[keep]}).astype(cols)

    big = _grouped_by_partition(both, ["o_orderkey"], resolve,
                                n_parts=num_partitions).materialize()

    keys = pc.unique(pa.concat_arrays([
        b.column("c_custkey").combine_chunks()
        for b in big.iter_batches(batch_format="pyarrow")
        if b.num_rows] or [pa.array([], pa.int64())]))
    keys_ref = ray.put(keys)

    def pick_names(b: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(b.column("c_custkey"), pa.int64()),
                     value_set=ray.get(keys_ref))
        b = b.filter(m)
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_name": b.column("c_name")})

    names = {}
    for b in customer_ds.map_batches(pick_names, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for k, nm in zip(b.column("c_custkey").to_pylist(),
                         b.column("c_name").to_pylist()):
            names[k] = nm

    def finish(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_name": pa.array([names.get(k, "") for k in keys],
                               pa.string()),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": pc.cast(b.column("o_orderdate"),
                                   pa.timestamp("us")),
            "totalprice_cents": b.column("totalprice_cents"),
            "sum_qty": b.column("sum_qty")})

    return big.map_batches(finish, batch_format="pyarrow")


def orders_above_customer_avg(orders_ds, *, num_partitions=None):
    """Correlated-subquery shape: orders strictly pricier than their own
    customer's average order price -> (o_orderkey, o_custkey,
    totalprice_cents).

    The correlation decorrelates into ONE custkey-partitioned shuffle
    (a customer's orders co-locate, so per-customer int64 cent sum +
    count and the row filter happen in the same partition pass — the
    round-2-style groupby + join-back cost two exchanges plus join
    actors, ~8.4 s -> ~2.1 s at sf0.1).  The inclusion test is the
    INTEGER cross-multiplication  cents * n > sum_cents , so no float
    summation-order difference between engines can flip a row at the
    boundary (the weighted_sample discipline)."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("o_totalprice"), pa.scalar(100.0))), pa.int64())})

    cents = orders_ds.map_batches(to_cents, batch_format="pyarrow")

    def above(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": "int64", "o_custkey": "int64",
                "totalprice_cents": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("o_custkey", sort=False)["cents"]
        tot = g.transform("sum").to_numpy(np.int64)
        n = g.transform("size").to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        keep = c * n > tot
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64)[keep],
            "o_custkey": df["o_custkey"].to_numpy(np.int64)[keep],
            "totalprice_cents": c[keep]}).astype(cols)

    return _grouped_by_partition(cents, ["o_custkey"], above,
                                 n_parts=num_partitions)


def customer_order_distribution(customer_ds, orders_ds, *,
                                num_partitions=None):
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers -> (n_orders, n_customers).

    ONE custkey-partitioned shuffle (the customer_order_coverage
    shape): orders partial-count per custkey map-side, union with
    tagged customer keys; each partition merges its keys' counts for
    KNOWN customers only (orphaned order custkeys drop, matching the
    LEFT JOIN from customer) and emits its partition-local histogram
    (n_orders -> count) — so the second aggregate is over
    O(partitions x distinct order counts) tiny rows, never
    per-customer rows."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def opart(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"key": b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)})
        g = df.groupby("key", sort=False).size()
        return pa.table({
            "key": pa.array(g.index.to_numpy(np.int64)),
            "n": pa.array(g.to_numpy(np.int64)),
            "known": pa.array(np.zeros(len(g), bool))})

    def cpart(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("c_custkey"), pa.int64()),
            "n": pa.array(np.zeros(n, np.int64)),
            "known": pa.array(np.ones(n, bool))})

    both = orders_ds.map_batches(opart, batch_format="pyarrow").union(
        customer_ds.map_batches(cpart, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_orders": "int64", "n_customers": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("key", sort=False).agg(
            n_orders=("n", "sum"), known=("known", "max"))
        hist = g[g["known"]].groupby("n_orders", sort=False).size()
        return pd.DataFrame({
            "n_orders": hist.index.to_numpy(np.int64),
            "n_customers": hist.to_numpy(np.int64)}).astype(cols)

    partial = _grouped_by_partition(both, ["key"], resolve,
                                    n_parts=num_partitions)
    from ray.data.aggregate import Sum
    out = partial.groupby("n_orders").aggregate(Sum("n_customers"))
    return out.map_batches(
        lambda b: pa.table({
            "n_orders": pc.cast(b.column("n_orders"), pa.int64()),
            "n_customers": pc.cast(b.column("sum(n_customers)"),
                                   pa.int64())}),
        batch_format="pyarrow")


def brand_supplier_distinct(lineitem_ds, part_ds, *, num_partitions=None):
    """TPC-H Q16 shape: distinct suppliers that shipped each part brand
    -> (p_brand, n_suppliers).

    Pass 1 is ONE partkey-partitioned shuffle: lineitem ships map-side
    DISTINCT (partkey, suppkey) pairs, part ships (partkey, brand)
    rows; each partition attaches the brand to its pairs and dedups
    (brand, suppkey) locally — no join actors, no broadcast of the
    part table (part is fact-sized at TPC-H scale).  Pass 2 is ONE
    brand-keyed pass over near-distinct (brand, suppkey) pairs
    (|brands| x |suppliers| at most) finishing with a grouped
    nunique."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def lpart(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": b.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "supp": b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
        }).drop_duplicates()
        return pa.table({
            "key": pa.array(df["key"].to_numpy(np.int64)),
            "supp": pa.array(df["supp"].to_numpy(np.int64)),
            "brand": pa.array([None] * len(df), pa.string())})

    def ppart(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(b.column("p_partkey"), pa.int64()),
            "supp": pa.array(np.full(b.num_rows, -1, np.int64)),
            "brand": pc.cast(b.column("p_brand"), pa.string())})

    both = lineitem_ds.map_batches(lpart, batch_format="pyarrow").union(
        part_ds.map_batches(ppart, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "l_suppkey": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"l_suppkey": "int64"})
        dim = df[df["supp"] < 0]
        fact = df[df["supp"] >= 0]
        brand = dict(zip(dim["key"].to_numpy(np.int64),
                         dim["brand"].tolist()))
        b = fact["key"].map(brand)
        out = pd.DataFrame({"p_brand": b.to_numpy(),
                            "l_suppkey": fact["supp"].to_numpy(np.int64)})
        out = out[out["p_brand"].notna()].drop_duplicates()
        return out

    pairs = _grouped_by_partition(both, ["key"], attach,
                                  n_parts=num_partitions)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "n_suppliers": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"n_suppliers": "int64"})
        g = df.groupby("p_brand", sort=False)["l_suppkey"].nunique()
        return pd.DataFrame({"p_brand": g.index.to_numpy(),
                             "n_suppliers": g.to_numpy(np.int64)})

    # pass-1 output is near-distinct (brand, suppkey) pairs bounded by
    # |brands| x |suppliers|; one brand-keyed pass finishes (the former
    # distinct_count cost TWO native groupby exchanges)
    return _grouped_by_partition(pairs, ["p_brand"], count_distinct,
                                 n_parts=num_partitions)


def rich_quiet_customers(customer_ds, orders_ds, *,
                         big_order_total: float = 300000.0,
                         num_partitions=None):
    """TPC-H Q22 shape: customers with above-average positive account
    balance and no order above `big_order_total`, grouped by nation ->
    (nationkey, n_customers, total_acctbal_cents).

    Step 1: ONE tiny global aggregate of INTEGER cents (sum, count)
    over positive-balance customers — exact, so the above-average test
    is the integer cross-multiplication  cents * n > sum_cents  (no
    float-boundary row flips vs the oracle).  Step 2: the rich
    customers union tagged distinct big-order custkeys into ONE
    id-partitioned pass that keeps customers with no such order (anti
    semantics, no join actors) and emits per-partition
    (nationkey, count, cents) partials; a |nations|-row groupby
    merges."""
    from .dedup import _grouped_by_partition
    from ray.data.aggregate import Count, Sum
    num_partitions = _cap_partitions(num_partitions)

    def cust_cents(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("c_acctbal"), pa.scalar(100.0))), pa.int64())})

    cust = customer_ds.map_batches(cust_cents,
                                   batch_format="pyarrow").materialize()
    pos = cust.filter(expr="cents > 0")
    agg = pos.aggregate(Sum("cents"), Count())
    total_cents = int(agg["sum(cents)"] or 0)
    n_pos = int(agg["count()"] or 0)
    if n_pos == 0:
        import ray
        return ray.data.from_arrow(pa.table({
            "nationkey": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "total_acctbal_cents": pa.array([], pa.int64())}))

    def rich_rows(b: pa.Table) -> pa.Table:
        c = b.column("cents").to_numpy(zero_copy_only=False)
        keep = c * n_pos > total_cents
        t = b.filter(pa.array(keep))
        return pa.table({"key": t.column("c_custkey"),
                         "nationkey": t.column("nationkey"),
                         "cents": t.column("cents")})

    rich = cust.map_batches(rich_rows, batch_format="pyarrow")

    def okeys(b: pa.Table) -> pa.Table:
        mask = pc.greater(b.column("o_totalprice"),
                          pa.scalar(big_order_total))
        keys = pc.unique(pc.cast(
            b.filter(mask).column("o_custkey"), pa.int64()))
        n = len(keys)
        return pa.table({"key": keys,
                         "nationkey": pa.array(np.full(n, -1, np.int64)),
                         "cents": pa.array(np.zeros(n, np.int64))})

    both = rich.union(orders_ds.map_batches(okeys,
                                            batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nationkey": "int64", "n_customers": "int64",
                "total_acctbal_cents": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        has_order = df.groupby("key", sort=False)["nationkey"] \
            .transform("min") < 0
        quiet = df[(~has_order) & (df["nationkey"] >= 0)]
        g = quiet.groupby("nationkey", sort=False)["cents"] \
            .agg(["size", "sum"])
        return pd.DataFrame({
            "nationkey": g.index.to_numpy(np.int64),
            "n_customers": g["size"].to_numpy(np.int64),
            "total_acctbal_cents": g["sum"].to_numpy(np.int64),
        }).astype(cols)

    partial = _grouped_by_partition(both, ["key"], resolve,
                                    n_parts=num_partitions)
    out = partial.groupby("nationkey").aggregate(
        Sum("n_customers"), Sum("total_acctbal_cents"))
    return out.map_batches(
        lambda b: pa.table({
            "nationkey": pc.cast(b.column("nationkey"), pa.int64()),
            "n_customers": pc.cast(b.column("sum(n_customers)"),
                                   pa.int64()),
            "total_acctbal_cents": pc.cast(
                b.column("sum(total_acctbal_cents)"), pa.int64())}),
        batch_format="pyarrow")


def _c4_revenue(b: pa.Table):
    """Exact integer revenue units: cents x (100 - discount cents) —
    the shipping_priority (Q3) discipline, immune to float summation
    order."""
    price_c = pc.cast(pc.round(pc.multiply(
        b.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
    disc_c = pc.cast(pc.round(pc.multiply(
        b.column("l_discount"), pa.scalar(100.0))), pa.int64())
    return pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                            disc_c))


def top_supplier_revenue(lineitem_ds, supplier_ds, *,
                         start: str = "1996-01-01",
                         end: str = "1996-04-01"):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter -> (s_suppkey, s_name, total_revenue_c4).

    Map-side per-batch (suppkey, c4) partial sums -> ONE bounded
    groupby (|suppliers| rows) -> a tiny global Max aggregate -> a
    map-side equality filter.  The winner set (usually one row)
    fetches its name via an is_in filter over supplier — the
    top_customers shape, no join, no sort."""
    import ray
    from ray.data.aggregate import Sum

    lo = pa.scalar(np.datetime64(start, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(end, "us").item(), pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))
        b = b.filter(m)
        df = pd.DataFrame({
            "suppkey": b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "c4": _c4_revenue(b).to_numpy(zero_copy_only=False)})
        g = df.groupby("suppkey", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = lineitem_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("suppkey").aggregate(Sum("c4")).materialize()
    mx = rev.aggregate(ray.data.aggregate.Max("sum(c4)"))["max(sum(c4))"]
    if mx is None:
        return ray.data.from_arrow(pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_c4": pa.array([], pa.int64())}))
    mxv = int(mx)
    winners = rev.map_batches(
        lambda b: b.filter(pc.equal(b.column("sum(c4)"),
                                    pa.scalar(mxv, pa.int64()))),
        batch_format="pyarrow")
    wk = {int(r["suppkey"]) for r in winners.take_all()}
    names = supplier_ds.map_batches(
        lambda b: b.filter(pc.is_in(pc.cast(b.column("s_suppkey"),
                                            pa.int64()),
                                    pa.array(sorted(wk), pa.int64()))),
        batch_format="pyarrow")
    nmap = {int(r["s_suppkey"]): r["s_name"] for r in names.take_all()}
    rows = sorted(wk)
    return ray.data.from_arrow(pa.table({
        "s_suppkey": pa.array(rows, pa.int64()),
        "s_name": pa.array([nmap.get(k, "") for k in rows], pa.string()),
        "total_revenue_c4": pa.array([int(mx)] * len(rows), pa.int64())}))


def top_return_customers(customer_ds, orders_ds, lineitem_ds, *,
                         start: str = "1996-01-01",
                         end: str = "1996-04-01", k: int = 20,
                         num_partitions=None):
    """TPC-H Q10 shape: top-k customers by RETURNED revenue for orders
    placed in a quarter -> (c_custkey, c_name, revenue_c4).

    ONE orderkey-partitioned shuffle fuses the lineitem->orders join:
    map-side (orderkey, c4) partials over returnflag='R' rows union
    with in-window (orderkey, custkey) order rows; each partition
    attaches custkeys and emits per-custkey partials.  A second
    custkey-keyed pass fuses the global per-customer sum with a
    partition-local top-k, a tiny driver merge picks the k winners (no
    global sort), and c_name arrives via an is_in filter."""
    import ray
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    lo = pa.scalar(np.datetime64(start, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(end, "us").item(), pa.timestamp("us"))

    def li_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), pa.scalar("R")))
        df = pd.DataFrame({
            "key": b.column("l_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "c4": _c4_revenue(b).to_numpy(zero_copy_only=False)})
        g = df.groupby("key", sort=False, as_index=False).sum()
        return pa.table({
            "key": pa.array(g["key"].to_numpy(np.int64)),
            "c4": pa.array(g["c4"].to_numpy(np.int64)),
            "custkey": pa.array(np.full(len(g), -1, np.int64))})

    def o_rows(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        b = b.filter(m)
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "custkey": pc.cast(b.column("o_custkey"), pa.int64())})

    both = lineitem_ds.map_batches(li_part, batch_format="pyarrow") \
        .union(orders_ds.map_batches(o_rows, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"custkey": "int64", "c4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_o = df["custkey"].to_numpy(np.int64) >= 0
        omap = dict(zip(df["key"].to_numpy(np.int64)[is_o],
                        df["custkey"].to_numpy(np.int64)[is_o]))
        li = df[~is_o]
        ck = li["key"].map(omap)
        keep = ck.notna().to_numpy()
        out = pd.DataFrame({
            "custkey": ck.to_numpy()[keep].astype(np.int64),
            "c4": li["c4"].to_numpy(np.int64)[keep]})
        return out.groupby("custkey", sort=False, as_index=False).sum() \
            .astype(cols)

    per_cust = _grouped_by_partition(both, ["key"], attach,
                                     n_parts=num_partitions)

    def sum_topk(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"custkey": "int64", "revenue_c4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("custkey", sort=False)["c4"].sum() \
            .rename("revenue_c4").reset_index()
        return g.sort_values(["revenue_c4", "custkey"],
                             ascending=[False, True]).head(k) \
            .astype(cols)

    # custkey-keyed pass fuses the global sum AND the partition-local
    # top-k (the former plan paid a native groupby exchange plus a
    # separate top-k map); the driver merges k x partitions rows
    cand = _grouped_by_partition(per_cust, ["custkey"], sum_topk,
                                 n_parts=num_partitions).take_all()
    if not cand:
        return ray.data.from_arrow(pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue_c4": pa.array([], pa.int64())}))
    top = pd.DataFrame(cand).sort_values(
        ["revenue_c4", "custkey"], ascending=[False, True]).head(k)
    wk = top["custkey"].to_numpy(np.int64)
    names = customer_ds.map_batches(
        lambda b: b.filter(pc.is_in(pc.cast(b.column("c_custkey"),
                                            pa.int64()),
                                    pa.array(sorted(wk), pa.int64()))),
        batch_format="pyarrow")
    nmap = {int(r["c_custkey"]): r["c_name"] for r in names.take_all()}
    return ray.data.from_arrow(pa.table({
        "c_custkey": pa.array(wk, pa.int64()),
        "c_name": pa.array([nmap.get(int(c), "") for c in wk],
                           pa.string()),
        "revenue_c4": pa.array(top["revenue_c4"].to_numpy(np.int64),
                               pa.int64())}))


def min_cost_supplier_per_part(lineitem_ds, supplier_ds, *,
                               num_partitions=None):
    """TPC-H Q2 shape: for every part that shipped, the supplier with
    the LOWEST account balance among its shippers (ties -> smallest
    suppkey) -> (partkey, suppkey, acctbal_cents).

    Three keyed passes, no join actors: (1) map-side distinct
    (partkey, suppkey) pairs; (2) suppkey-partitioned pass attaches
    INTEGER acctbal cents from the tagged supplier union; (3)
    partkey-partitioned argmin with the deterministic
    (cents, suppkey) lexicographic tie-break."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def pairs(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "suppkey": b.column("l_suppkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "partkey": b.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
        }).drop_duplicates()
        df["cents"] = np.int64(0)
        df["is_dim"] = False
        return pa.Table.from_pandas(df, preserve_index=False)

    def supp(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "partkey": pa.array(np.full(n, -1, np.int64)),
            "cents": pc.cast(pc.round(pc.multiply(
                b.column("s_acctbal"), pa.scalar(100.0))), pa.int64()),
            "is_dim": pa.array(np.ones(n, bool))})

    both = lineitem_ds.map_batches(pairs, batch_format="pyarrow").union(
        supplier_ds.map_batches(supp, batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"partkey": "int64", "suppkey": "int64", "cents": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        dim = df[df["is_dim"]]
        cmap = dict(zip(dim["suppkey"].to_numpy(np.int64),
                        dim["cents"].to_numpy(np.int64)))
        fact = df[~df["is_dim"]].drop_duplicates(["partkey", "suppkey"])
        c = fact["suppkey"].map(cmap)
        keep = c.notna().to_numpy()
        return pd.DataFrame({
            "partkey": fact["partkey"].to_numpy(np.int64)[keep],
            "suppkey": fact["suppkey"].to_numpy(np.int64)[keep],
            "cents": c.to_numpy()[keep].astype(np.int64)}).astype(cols)

    withbal = _grouped_by_partition(both, ["suppkey"], attach,
                                    n_parts=num_partitions)

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"partkey": "int64", "suppkey": "int64",
                "acctbal_cents": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(["partkey", "cents", "suppkey"])
        first = df.drop_duplicates("partkey", keep="first")
        return pd.DataFrame({
            "partkey": first["partkey"].to_numpy(np.int64),
            "suppkey": first["suppkey"].to_numpy(np.int64),
            "acctbal_cents": first["cents"].to_numpy(np.int64),
        }).astype(cols)

    return _grouped_by_partition(withbal, ["partkey"], argmin,
                                 n_parts=num_partitions)


def disjunctive_part_revenue(lineitem_ds, part_ds, *, num_partitions=None):
    """TPC-H Q19 shape: one-row revenue total under a DISJUNCTIVE
    part+lineitem predicate -> (revenue_c4, n_items).

    ONE partkey-partitioned pass attaches (brand, size) to in-filter
    lineitem rows (no join actors, no fact-sized broadcast); the OR of
    conjunctive clauses evaluates vectorized per partition and only
    (c4, n) partials leave — a two-int global sum finishes."""
    from .dedup import _grouped_by_partition
    from ray.data.aggregate import Sum
    import ray
    num_partitions = _cap_partitions(num_partitions)

    def li_rows(b: pa.Table) -> pa.Table:
        qty = pc.cast(b.column("l_quantity"), pa.float64())
        return pa.table({
            "key": pc.cast(b.column("l_partkey"), pa.int64()),
            "c4": _c4_revenue(b),
            "qty": qty,
            "size": pa.array(np.full(b.num_rows, -1, np.int64)),
            "brand": pa.array([None] * b.num_rows, pa.string())})

    def p_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("p_partkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "qty": pa.array(np.zeros(n, np.float64)),
            "size": pc.cast(b.column("p_size"), pa.int64()),
            "brand": pc.cast(b.column("p_brand"), pa.string())})

    both = lineitem_ds.map_batches(li_rows, batch_format="pyarrow") \
        .union(part_ds.map_batches(p_rows, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"revenue_c4": "int64", "n_items": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["size"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        dkeys = dim["key"].to_numpy(np.int64)
        bmap = pd.Series(dim["brand"].to_numpy(), index=dkeys)
        smap = pd.Series(dim["size"].to_numpy(np.int64), index=dkeys)
        fact = df[~is_dim]
        keys = fact["key"]
        qty = fact["qty"].to_numpy(np.float64)
        c4 = fact["c4"].to_numpy(np.int64)
        # vectorized dim-attribute lookup (Series.map = one hash join
        # in C; rows without a part row get ""/-1 and fail both arms)
        brand = keys.map(bmap).fillna("").to_numpy()
        size = keys.map(smap).fillna(-1).to_numpy(np.int64)
        m = (((brand == "Brand#1") & (size <= 10) & (qty <= 20))
             | ((brand == "Brand#2") & (size <= 25) & (qty <= 30)))
        return pd.DataFrame({"revenue_c4": [int(c4[m].sum())],
                             "n_items": [int(m.sum())]}).astype(cols)

    partials = _grouped_by_partition(both, ["key"], resolve,
                                     n_parts=num_partitions)
    agg = partials.aggregate(Sum("revenue_c4"), Sum("n_items"))
    return ray.data.from_arrow(pa.table({
        "revenue_c4": pa.array([int(agg["sum(revenue_c4)"] or 0)],
                               pa.int64()),
        "n_items": pa.array([int(agg["sum(n_items)"] or 0)],
                            pa.int64())}))


def range_join_counts(orders_ds, events_ds, *, window_hours: int = 24,
                      num_partitions=None):
    """Range (band) join, an operator Ray Data lacks: per order, how
    many of the SAME user's events fall in [orderdate, orderdate + W)
    -> (o_orderkey, n_events), zero-count orders included (LEFT
    semantics).

    ONE user-partitioned shuffle carrying both sides union'd; within a
    partition the counts come from a single lexsort + segmented
    cumulative rank scan, NOT per-order slicing: each order emits two
    PROBES (window start, inclusive; window end, exclusive), probes
    sort BEFORE events at equal timestamps, and the running per-user
    event count at each probe position gives  n = rank(end) -
    rank(start)  for every order at once.  Partitioning assumption:
    one user's orders + events fit in one partition (salt by time
    bucket with boundary-window overlap beyond that)."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    window_us = int(window_hours) * 3_600 * 1_000_000

    def o_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64())
        return pa.table({
            "user": pc.cast(b.column("o_custkey"), pa.int64()),
            "t": t,
            "okey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "is_event": pa.array(np.zeros(n, np.int8), pa.int8())})

    def e_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        t = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                    pa.int64())
        return pa.table({
            "user": pc.cast(b.column("user_id"), pa.int64()),
            "t": t,
            "okey": pa.array(np.full(n, -1, np.int64)),
            "is_event": pa.array(np.ones(n, np.int8), pa.int8())})

    both = orders_ds.map_batches(o_rows, batch_format="pyarrow").union(
        events_ds.map_batches(e_rows, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": "int64", "n_events": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        user = df["user"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        okey = df["okey"].to_numpy(np.int64)
        is_ev = df["is_event"].to_numpy(np.int8)
        is_probe = is_ev == 0
        n_orders = int(is_probe.sum())
        if n_orders == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        # each order contributes two probe rows: [start, end)
        pu = np.concatenate([user[is_probe], user[is_probe]])
        pt = np.concatenate([t[is_probe], t[is_probe] + window_us])
        pk = np.concatenate([okey[is_probe], okey[is_probe]])
        sign = np.concatenate([np.full(n_orders, -1, np.int64),
                               np.ones(n_orders, np.int64)])
        eu, et = user[is_ev == 1], t[is_ev == 1]
        u = np.concatenate([pu, eu])
        tt = np.concatenate([pt, et])
        ev = np.concatenate([np.zeros(2 * n_orders, np.int8),
                             np.ones(len(eu), np.int8)])
        # probes (ev=0) sort before events (ev=1) at equal (user, t):
        # start-probe excludes nothing at t (>= is inclusive via the
        # cum BEFORE the first equal event), end-probe is exclusive
        order = np.lexsort((ev, tt, u))
        us, evs = u[order], ev[order]
        cum = np.cumsum(evs.astype(np.int64))
        new_seg = np.empty(len(us), bool)
        new_seg[0] = True
        new_seg[1:] = us[1:] != us[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(len(us)), 0))
        base = np.where(seg_start > 0, cum[seg_start - 1], 0)
        rank = cum - base  # events at or before this row, within user
        probe_pos = order < 2 * n_orders  # positions holding probes
        # rank AT a probe row counts exactly the events sorted before
        # it in its user segment (the probe itself contributes 0)
        pr = rank[probe_pos]
        pidx = order[probe_pos]  # original probe indices 0..2n-1
        counts = np.zeros(n_orders, np.int64)
        # start probe i and end probe i+n_orders both map to order i
        np.add.at(counts, pidx % n_orders, sign[pidx] * pr)
        return pd.DataFrame({
            "o_orderkey": pk[:n_orders],
            "n_events": counts}).astype(cols)

    return _grouped_by_partition(both, ["user"], resolve,
                                 n_parts=num_partitions)


def local_supplier_volume(customer_ds, orders_ds, lineitem_ds,
                          supplier_ds, nation_ds, *,
                          start: str = "1996-01-01",
                          end: str = "1997-01-01",
                          relation: str = "same",
                          num_partitions=None):
    """TPC-H Q5 shape (relation="same"): revenue from lineitems whose
    CUSTOMER and SUPPLIER share a nation, grouped by that nation ->
    (n_name, revenue_c4).  TPC-H Q7 shape (relation="cross"): revenue
    where the nations DIFFER, grouped by the ordered pair ->
    (cust_nation, supp_nation, revenue_c4).

    A 4-hop join fused into THREE keyed partition passes (no join
    actors), each moving the fact rows once with only the columns the
    next hop needs:
      1. orderkey pass — in-window orders (orderkey -> custkey) union
         map-side (orderkey, suppkey, c4) lineitem rows; emits fact
         rows with custkey attached.
      2. custkey pass — customer (custkey -> nationkey) union the
         pass-1 rows; emits rows with the customer nation attached.
      3. suppkey pass — supplier (suppkey -> nationkey) union pass-2
         rows; applies the nation relation (== for Q5, != for Q7) and
         emits per-key int-c4 partials.
    A |nations|(^2)-row groupby merges and the 25-row nation name
    table resolves on the driver (the revenue_by_nation discipline)."""
    import ray
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    lo = pa.scalar(np.datetime64(start, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(end, "us").item(), pa.timestamp("us"))

    # ---- pass 1: attach custkey to lineitem rows by orderkey
    def li_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("l_orderkey"), pa.int64()),
            "c4": _c4_revenue(b),
            "supp": pc.cast(b.column("l_suppkey"), pa.int64()),
            "attach": pa.array(np.full(n, -1, np.int64))})

    def o_rows(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        b = b.filter(m)
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "supp": pa.array(np.full(n, -1, np.int64)),
            "attach": pc.cast(b.column("o_custkey"), pa.int64())})

    def attach_pass(df: pd.DataFrame) -> pd.DataFrame:
        """Generic hop: dim rows carry attach >= 0; fact rows rekey to
        the attached id and carry (c4, supp) forward."""
        cols = {"key": "int64", "c4": "int64", "supp": "int64",
                "attach": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["attach"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        amap = dict(zip(dim["key"].to_numpy(np.int64),
                        dim["attach"].to_numpy(np.int64)))
        fact = df[~is_dim]
        a = fact["key"].map(amap)
        keep = a.notna().to_numpy()
        return pd.DataFrame({
            "key": a.to_numpy()[keep].astype(np.int64),
            "c4": fact["c4"].to_numpy(np.int64)[keep],
            "supp": fact["supp"].to_numpy(np.int64)[keep],
            "attach": np.full(int(keep.sum()), -1, np.int64),
        }).astype(cols)

    hop1 = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(o_rows, batch_format="pyarrow")),
        ["key"], attach_pass, n_parts=num_partitions)
    # hop1 rows: key=custkey, supp, c4

    def c_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("c_custkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "supp": pa.array(np.full(n, -1, np.int64)),
            "attach": pc.cast(b.column("c_nationkey"), pa.int64())})

    hop2 = _grouped_by_partition(
        hop1.union(customer_ds.map_batches(c_rows,
                                           batch_format="pyarrow")),
        ["key"], attach_pass, n_parts=num_partitions)
    # hop2 rows: key=customer nationkey, supp, c4 -> rekey by supp for
    # the final hop (swap key & supp so the generic pass partitions on
    # the supplier)
    def swap(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("supp"),
                         "c4": b.column("c4"),
                         "supp": b.column("key"),
                         "attach": b.column("attach")})

    hop2s = hop2.map_batches(swap, batch_format="pyarrow")

    def s_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("s_suppkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "supp": pa.array(np.full(n, -1, np.int64)),
            "attach": pc.cast(b.column("s_nationkey"), pa.int64())})

    cross = relation == "cross"

    def final_pass(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"cnat": "int64", "snat": "int64", "revenue_c4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["attach"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        smap = dict(zip(dim["key"].to_numpy(np.int64),
                        dim["attach"].to_numpy(np.int64)))
        fact = df[~is_dim]
        snat = fact["key"].map(smap)
        cnat = fact["supp"].to_numpy(np.int64)
        sv = snat.fillna(-1).to_numpy(np.int64)
        keep = snat.notna().to_numpy() \
            & ((sv != cnat) if cross else (sv == cnat))
        g = pd.DataFrame({"cnat": cnat[keep], "snat": sv[keep],
                          "revenue_c4": fact["c4"].to_numpy(
                              np.int64)[keep]}) \
            .groupby(["cnat", "snat"], sort=False, as_index=False).sum()
        return g.astype(cols)

    partials = _grouped_by_partition(
        hop2s.union(supplier_ds.map_batches(s_rows,
                                            batch_format="pyarrow")),
        ["key"], final_pass, n_parts=num_partitions)
    agg = partials.groupby(["cnat", "snat"]).aggregate(Sum("revenue_c4"))
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in nation_ds.take_all()}

    def finish(b: pa.Table) -> pa.Table:
        ck = b.column("cnat").to_pylist()
        rev = pc.cast(b.column("sum(revenue_c4)"), pa.int64())
        cn = pa.array([names.get(int(k), "") for k in ck], pa.string())
        if not cross:
            return pa.table({"n_name": cn, "revenue_c4": rev})
        sk = b.column("snat").to_pylist()
        return pa.table({
            "cust_nation": cn,
            "supp_nation": pa.array([names.get(int(k), "") for k in sk],
                                    pa.string()),
            "revenue_c4": rev})

    return agg.map_batches(finish, batch_format="pyarrow")


def forecast_revenue(lineitem_ds, *, start: str = "1996-01-01",
                     end: str = "1997-01-01", disc_c2_lo: int = 5,
                     disc_c2_hi: int = 7, max_qty: int = 24):
    """TPC-H Q6 shape (reference has no SQL engine; shape from the
    public spec): revenue increase from dropping small-quantity
    discounts -> ONE row (revenue_c4, n_rows).

    Map-only: every batch folds to a single partial row (exact int
    1e-4-dollar units: ext_c2 * disc_c2 — both 2dp, so the product is
    exact), the driver sums the per-batch partials.  No shuffle, no
    groupby — the cheapest possible plan at any scale."""
    lo = np.datetime64(start, "us")
    hi = np.datetime64(end, "us")

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        disc_c2 = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        m = ((ship >= lo) & (ship < hi) & (qty < max_qty)
             & (disc_c2 >= disc_c2_lo) & (disc_c2 <= disc_c2_hi))
        ext_c2 = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        return pa.table({
            "revenue_c4": pa.array([int((ext_c2 * disc_c2[m]).sum())],
                                   pa.int64()),
            "n_rows": pa.array([int(m.sum())], pa.int64())})

    parts = lineitem_ds.map_batches(partial,
                                    batch_format="pyarrow").take_all()
    return pa.table({
        "revenue_c4": pa.array([sum(r["revenue_c4"] for r in parts)],
                               pa.int64()),
        "n_rows": pa.array([sum(r["n_rows"] for r in parts)],
                           pa.int64())})


def small_qty_revenue(lineitem_ds, part_ds, *, brand: str = "Brand#13",
                      num_partitions=None):
    """TPC-H Q17 shape: revenue from lineitems of one brand's parts with
    quantity below 20% of that part's average quantity -> ONE row
    (revenue_cents, n_small).

    The brand's partkey set is collected once and broadcast (the
    promo_revenue discipline — part is ~3% of lineitem rows, the brand
    slice ~0.1%), pruning the fact BEFORE its single partkey-hash
    shuffle; each partition resolves all of its parts' correlated
    averages locally with the integer-exact gate
    5*qty*n < sum_qty  <=>  qty < 0.2*avg(qty)  (quantities are
    integral), so no float boundary can flip membership vs the SQL
    oracle.  With a dim too big to broadcast, attach the brand flag via
    a partkey hop pass (the local_supplier_volume shape) instead."""
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    rows = part_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_brand"), brand))
                   .select(["p_partkey"]),
        batch_format="pyarrow").take_all()
    keys = np.sort(np.array([r["p_partkey"] for r in rows], np.int64))

    def li_rows(b: pa.Table) -> pa.Table:
        pk = pc.cast(b.column("l_partkey"), pa.int64()).to_numpy()
        if len(keys):
            idx = np.searchsorted(keys, pk)
            idx[idx >= len(keys)] = 0
            m = keys[idx] == pk
        else:
            m = np.zeros(len(pk), bool)
        qty = b.column("l_quantity").to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        ext_c2 = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        return pa.table({"key": pa.array(pk[m]),
                         "qty": pa.array(qty),
                         "price_c2": pa.array(ext_c2)})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"revenue_cents": "int64", "n_small": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("key")["qty"].agg(["sum", "count"])
        sq = df["key"].map(g["sum"]).to_numpy(np.int64)
        n = df["key"].map(g["count"]).to_numpy(np.int64)
        keep = 5 * df["qty"].to_numpy(np.int64) * n < sq
        return pd.DataFrame({
            "revenue_cents": [int(df["price_c2"].to_numpy(
                np.int64)[keep].sum())],
            "n_small": [int(keep.sum())]}).astype(cols)

    partials = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow"),
        ["key"], resolve, n_parts=num_partitions).take_all()
    return pa.table({
        "revenue_cents": pa.array(
            [sum(r["revenue_cents"] for r in partials)], pa.int64()),
        "n_small": pa.array([sum(r["n_small"] for r in partials)],
                            pa.int64())})


def market_share(customer_ds, orders_ds, lineitem_ds, supplier_ds,
                 nation_ds, region_ds, part_ds, *,
                 r_name: str = "EUROPE", p_type: str = "ECONOMY",
                 target_nation: str = "NATION_3",
                 start: str = "1995-01-01", end: str = "1997-01-01",
                 num_partitions=None):
    """TPC-H Q8 shape: the target nation's share of revenue for one part
    type sold to one region's customers, per order year ->
    (o_year, target_c4, total_c4) exact ints (share = target/total).

    Plan: part's matching-key set and supplier -> nationkey map
    broadcast (both dims are <=3% of the fact; at a scale where they
    stop fitting, attach them via extra hop passes — the
    local_supplier_volume shape), so the fact moves through just TWO
    keyed partition passes: orderkey (attach year + custkey to the
    pruned lineitem rows) then custkey (attach the customer's nation,
    gate on the region's 5-nation set, fold to per-year partials).
    A |years|-row groupby merges."""
    import ray
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    lo = pa.scalar(np.datetime64(start, "us").item(), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(end, "us").item(), pa.timestamp("us"))

    pk_rows = part_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_type"), p_type))
                   .select(["p_partkey"]),
        batch_format="pyarrow").take_all()
    part_keys = np.sort(np.array([r["p_partkey"] for r in pk_rows],
                                 np.int64))
    s_rows = supplier_ds.select_columns(
        ["s_suppkey", "s_nationkey"]).take_all()
    sk = np.array([r["s_suppkey"] for r in s_rows], np.int64)
    order_ = np.argsort(sk)
    sk = sk[order_]
    snat_v = np.array([r["s_nationkey"] for r in s_rows],
                      np.int64)[order_]
    nk_to_region = {int(r["n_nationkey"]): int(r["n_regionkey"])
                    for r in nation_ds.take_all()}
    region_keys = {r["r_name"]: int(r["r_regionkey"])
                   for r in region_ds.take_all()}
    target_keys = {r["n_name"]: int(r["n_nationkey"])
                   for r in nation_ds.take_all()}
    if r_name not in region_keys or target_nation not in target_keys:
        # empty/missing dims: typed empty result (totality on empty)
        import ray as _ray
        return _ray.data.from_arrow(pa.table({
            "o_year": pa.array([], pa.int64()),
            "target_c4": pa.array([], pa.int64()),
            "total_c4": pa.array([], pa.int64())}))
    region_key = region_keys[r_name]
    region_nations = frozenset(k for k, v in nk_to_region.items()
                               if v == region_key)
    target_key = target_keys[target_nation]

    def li_rows(b: pa.Table) -> pa.Table:
        pk = pc.cast(b.column("l_partkey"), pa.int64()).to_numpy()
        if len(part_keys):
            idx = np.searchsorted(part_keys, pk)
            idx[idx >= len(part_keys)] = 0
            m = part_keys[idx] == pk
        else:
            m = np.zeros(len(pk), bool)
        ext_c2 = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        disc_c2 = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        sup = pc.cast(b.column("l_suppkey"), pa.int64()).to_numpy()[m]
        sidx = np.searchsorted(sk, sup)
        sidx[sidx >= len(sk)] = 0
        snat = np.where(sk[sidx] == sup, snat_v[sidx], -1)
        n = int(m.sum())
        return pa.table({
            "key": pa.array(pc.cast(b.column("l_orderkey"),
                                    pa.int64()).to_numpy()[m]),
            "c4": pa.array(ext_c2 * (100 - disc_c2)),
            "snat": pa.array(snat),
            "yr": pa.array(np.full(n, -1, np.int64)),
            "attach": pa.array(np.full(n, -1, np.int64))})

    def o_rows(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        b = b.filter(m)
        yr = pd.DatetimeIndex(b.column("o_orderdate").to_pandas()) \
            .year.to_numpy(np.int64)
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "snat": pa.array(np.full(n, -1, np.int64)),
            "yr": pa.array(yr),
            "attach": pc.cast(b.column("o_custkey"), pa.int64())})

    def attach_order(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"key": "int64", "c4": "int64", "snat": "int64",
                "yr": "int64", "attach": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["attach"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        kmap = dict(zip(dim["key"].to_numpy(np.int64),
                        zip(dim["attach"].to_numpy(np.int64),
                            dim["yr"].to_numpy(np.int64))))
        fact = df[~is_dim]
        hit = fact["key"].map(kmap)
        keep = hit.notna().to_numpy()
        pairs = np.array([p for p in hit.to_numpy()[keep]],
                         np.int64).reshape(-1, 2)
        return pd.DataFrame({
            "key": pairs[:, 0],
            "c4": fact["c4"].to_numpy(np.int64)[keep],
            "snat": fact["snat"].to_numpy(np.int64)[keep],
            "yr": pairs[:, 1],
            "attach": np.full(int(keep.sum()), -1, np.int64),
        }).astype(cols)

    hop1 = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(o_rows, batch_format="pyarrow")),
        ["key"], attach_order, n_parts=num_partitions)

    def c_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("c_custkey"), pa.int64()),
            "c4": pa.array(np.zeros(n, np.int64)),
            "snat": pa.array(np.full(n, -1, np.int64)),
            "yr": pa.array(np.full(n, -1, np.int64)),
            "attach": pc.cast(b.column("c_nationkey"), pa.int64())})

    rn = np.sort(np.array(sorted(region_nations), np.int64))

    def final_pass(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_year": "int64", "target_c4": "int64",
                "total_c4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["attach"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        cmap = dict(zip(dim["key"].to_numpy(np.int64),
                        dim["attach"].to_numpy(np.int64)))
        fact = df[~is_dim]
        cnat = fact["key"].map(cmap)
        cv = cnat.fillna(-1).to_numpy(np.int64)
        keep = np.isin(cv, rn)
        snat = fact["snat"].to_numpy(np.int64)[keep]
        c4 = fact["c4"].to_numpy(np.int64)[keep]
        yr = fact["yr"].to_numpy(np.int64)[keep]
        g = pd.DataFrame({
            "o_year": yr,
            "target_c4": np.where(snat == target_key, c4, 0),
            "total_c4": c4}) \
            .groupby("o_year", sort=False, as_index=False).sum()
        return g.astype(cols)

    partials = _grouped_by_partition(
        hop1.union(customer_ds.map_batches(c_rows,
                                           batch_format="pyarrow")),
        ["key"], final_pass, n_parts=num_partitions)
    agg = partials.groupby("o_year").aggregate(Sum("target_c4"),
                                               Sum("total_c4"))
    return agg.map_batches(
        lambda b: pa.table({
            "o_year": pc.cast(b.column("o_year"), pa.int64()),
            "target_c4": pc.cast(b.column("sum(target_c4)"), pa.int64()),
            "total_c4": pc.cast(b.column("sum(total_c4)"), pa.int64())}),
        batch_format="pyarrow")


def profit_by_nation_year(orders_ds, lineitem_ds, supplier_ds, nation_ds,
                          part_ds, *, name_substr: str = "widget",
                          num_partitions=None):
    """TPC-H Q9 shape (adapted: no partsupp table exists, so supply cost
    is 50% of p_retailprice): profit by supplier nation and order year
    for parts whose name contains `name_substr` ->
    (nation, o_year, profit_c4).

    profit_c4 = ext_c2*(100-disc_c2) - qty*retail_c2*50 — every term a
    product of <=2dp inputs, so int64-exact vs the oracle.  part map
    (matching keys -> retail_c2) and supplier -> nationkey map broadcast
    once; the fact moves through ONE orderkey partition pass to pick up
    the year, folding to (snat, year) partials inside the pass."""
    import ray
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    p_rows = part_ds.map_batches(
        lambda b: b.filter(pc.match_substring(b.column("p_name"),
                                              name_substr))
                   .select(["p_partkey", "p_retailprice"]),
        batch_format="pyarrow").take_all()
    pk = np.array([r["p_partkey"] for r in p_rows], np.int64)
    porder = np.argsort(pk)
    pk = pk[porder]
    retail_c2 = np.rint(np.array([r["p_retailprice"] for r in p_rows],
                                 np.float64)[porder] * 100) \
        .astype(np.int64)
    s_rows = supplier_ds.select_columns(
        ["s_suppkey", "s_nationkey"]).take_all()
    sk = np.array([r["s_suppkey"] for r in s_rows], np.int64)
    sorder = np.argsort(sk)
    sk = sk[sorder]
    snat_v = np.array([r["s_nationkey"] for r in s_rows],
                      np.int64)[sorder]

    def li_rows(b: pa.Table) -> pa.Table:
        part = pc.cast(b.column("l_partkey"), pa.int64()).to_numpy()
        if len(pk):
            idx = np.searchsorted(pk, part)
            idx[idx >= len(pk)] = 0
            m = pk[idx] == part
        else:
            m = np.zeros(len(part), bool)
        rc2 = retail_c2[np.searchsorted(pk, part[m])] if m.any() else \
            np.zeros(0, np.int64)
        ext_c2 = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        disc_c2 = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        qty = b.column("l_quantity").to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        sup = pc.cast(b.column("l_suppkey"), pa.int64()).to_numpy()[m]
        sidx = np.searchsorted(sk, sup)
        sidx[sidx >= len(sk)] = 0
        snat = np.where(sk[sidx] == sup, snat_v[sidx], -1)
        amt = ext_c2 * (100 - disc_c2) - qty * rc2 * 50
        return pa.table({
            "key": pa.array(pc.cast(b.column("l_orderkey"),
                                    pa.int64()).to_numpy()[m]),
            "amt": pa.array(amt),
            "snat": pa.array(snat),
            "attach": pa.array(np.full(int(m.sum()), -1, np.int64))})

    def o_rows(b: pa.Table) -> pa.Table:
        yr = pd.DatetimeIndex(b.column("o_orderdate").to_pandas()) \
            .year.to_numpy(np.int64)
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "amt": pa.array(np.zeros(n, np.int64)),
            "snat": pa.array(np.full(n, -1, np.int64)),
            "attach": pa.array(yr)})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"snat": "int64", "o_year": "int64", "profit_c4": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["attach"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        ymap = dict(zip(dim["key"].to_numpy(np.int64),
                        dim["attach"].to_numpy(np.int64)))
        fact = df[~is_dim]
        yr = fact["key"].map(ymap)
        keep = yr.notna().to_numpy()
        g = pd.DataFrame({
            "snat": fact["snat"].to_numpy(np.int64)[keep],
            "o_year": yr.to_numpy()[keep].astype(np.int64),
            "profit_c4": fact["amt"].to_numpy(np.int64)[keep]}) \
            .groupby(["snat", "o_year"], sort=False, as_index=False) \
            .sum()
        return g.astype(cols)

    partials = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(o_rows, batch_format="pyarrow")),
        ["key"], resolve, n_parts=num_partitions)
    agg = partials.groupby(["snat", "o_year"]).aggregate(
        Sum("profit_c4"))
    names = {int(r["n_nationkey"]): r["n_name"]
             for r in nation_ds.take_all()}

    def finish(b: pa.Table) -> pa.Table:
        keys = b.column("snat").to_pylist()
        return pa.table({
            "nation": pa.array([names.get(int(k), "") for k in keys],
                               pa.string()),
            "o_year": pc.cast(b.column("o_year"), pa.int64()),
            "profit_c4": pc.cast(b.column("sum(profit_c4)"),
                                 pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def late_priority_counts(lineitem_ds, orders_ds, *, late_days: int = 60,
                         high=("1-URGENT", "2-HIGH"),
                         num_partitions=None):
    """TPC-H Q12 shape (adapted: the synthetic lineitem has no
    l_shipmode/l_commitdate, so "late" = shipped more than `late_days`
    after the order date and the grouping key is l_returnflag):
    per returnflag, late-lineitem counts split by order priority ->
    (l_returnflag, n_high_late, n_low_late).

    Both inputs are fact-sized, so nothing broadcasts: ONE orderkey-hash
    partition pass over the union (lineitem rows carry shipdate+flag,
    order rows carry orderdate+priority class), each partition resolves
    its orders' lateness locally and folds to per-flag partials; a
    |flags|-row groupby merges."""
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    late_us = np.int64(late_days) * 86_400_000_000
    high_set = frozenset(high)

    def li_rows(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]") \
            .view(np.int64)
        return pa.table({
            "key": pc.cast(b.column("l_orderkey"), pa.int64()),
            "t_us": pa.array(ship),
            "flag": pc.cast(b.column("l_returnflag"), pa.string()),
            "pri": pa.array(np.full(b.num_rows, -1, np.int64))})

    def o_rows(b: pa.Table) -> pa.Table:
        o_us = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]") \
            .view(np.int64)
        pri = np.fromiter(
            (1 if p in high_set else 0
             for p in b.column("o_orderpriority").to_pylist()),
            np.int64, b.num_rows)
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "t_us": pa.array(o_us),
            "flag": pa.array([""] * b.num_rows, pa.string()),
            "pri": pa.array(pri)})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_returnflag": "object", "n_high_late": "int64",
                "n_low_late": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"n_high_late": "int64", "n_low_late": "int64"})
        is_dim = df["pri"].to_numpy(np.int64) >= 0
        dim = df[is_dim]
        omap = dict(zip(dim["key"].to_numpy(np.int64),
                        zip(dim["t_us"].to_numpy(np.int64),
                            dim["pri"].to_numpy(np.int64))))
        fact = df[~is_dim]
        hit = fact["key"].map(omap)
        keep = hit.notna().to_numpy()
        if not keep.any():
            return pd.DataFrame(columns=list(cols)).astype(
                {"n_high_late": "int64", "n_low_late": "int64"})
        pairs = np.array([p for p in hit.to_numpy()[keep]],
                         np.int64).reshape(-1, 2)
        late = fact["t_us"].to_numpy(np.int64)[keep] \
            > pairs[:, 0] + late_us
        hi = pairs[:, 1] == 1
        g = pd.DataFrame({
            "l_returnflag": fact["flag"].to_numpy()[keep],
            "n_high_late": (late & hi).astype(np.int64),
            "n_low_late": (late & ~hi).astype(np.int64)}) \
            .groupby("l_returnflag", sort=False, as_index=False).sum()
        return g.astype({"n_high_late": "int64", "n_low_late": "int64"})

    partials = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(o_rows, batch_format="pyarrow")),
        ["key"], resolve, n_parts=num_partitions)
    agg = partials.groupby("l_returnflag").aggregate(
        Sum("n_high_late"), Sum("n_low_late"))
    return agg.map_batches(
        lambda b: pa.table({
            "l_returnflag": pc.cast(b.column("l_returnflag"),
                                    pa.string()),
            "n_high_late": pc.cast(b.column("sum(n_high_late)"),
                                   pa.int64()),
            "n_low_late": pc.cast(b.column("sum(n_low_late)"),
                                  pa.int64())}),
        batch_format="pyarrow")


def sole_late_supplier(lineitem_ds, orders_ds, *, late_days: int = 90,
                       status: str = "F", num_partitions=None):
    """TPC-H Q21 shape (adapted: "kept waiting" = shipped more than
    `late_days` after the order date; only finished orders,
    o_orderstatus = `status`): suppliers who were the SOLE late supplier
    of a multi-supplier order -> (s_suppkey, numwait).

    Q21's EXISTS / NOT EXISTS pair is per-order set logic, so it
    resolves entirely inside ONE orderkey-hash partition pass: each
    partition holds every lineitem of its orders plus the order's
    date (orders rows pre-filtered to `status` before the union), and
    emits the lone late supplier of each order with >= 2 distinct
    suppliers.  A supplier-keyed count merges — no join, no second
    row-level shuffle."""
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)
    late_us = np.int64(late_days) * 86_400_000_000

    def li_rows(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]") \
            .view(np.int64)
        return pa.table({
            "key": pc.cast(b.column("l_orderkey"), pa.int64()),
            "supp": pc.cast(b.column("l_suppkey"), pa.int64()),
            "t_us": pa.array(ship)})

    def o_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("o_orderstatus"), status))
        o_us = b.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]") \
            .view(np.int64)
        return pa.table({
            "key": pc.cast(b.column("o_orderkey"), pa.int64()),
            "supp": pa.array(np.full(b.num_rows, -1, np.int64)),
            "t_us": pa.array(o_us)})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s_suppkey": "int64", "numwait": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        is_dim = df["supp"].to_numpy(np.int64) < 0
        dim = df[is_dim]
        omap = dict(zip(dim["key"].to_numpy(np.int64),
                        dim["t_us"].to_numpy(np.int64)))
        fact = df[~is_dim]
        o_us = fact["key"].map(omap)
        keep = o_us.notna().to_numpy()
        if not keep.any():
            return pd.DataFrame(columns=list(cols)).astype(cols)
        sub = pd.DataFrame({
            "key": fact["key"].to_numpy(np.int64)[keep],
            "supp": fact["supp"].to_numpy(np.int64)[keep],
            "late": fact["t_us"].to_numpy(np.int64)[keep]
            > o_us.to_numpy()[keep].astype(np.int64) + late_us})
        # distinct (order, supplier) pairs, flagged late if ANY of the
        # pair's lineitems is late
        pairs = sub.groupby(["key", "supp"], sort=False,
                            as_index=False)["late"].any()
        po = pairs.groupby("key", sort=False).agg(
            ns=("supp", "size"), nl=("late", "sum"))
        late_only = pairs[pairs["late"]]
        sole = late_only.set_index("key")["supp"]
        hits = po[(po["ns"] >= 2) & (po["nl"] == 1)].index
        if len(hits) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = sole.loc[sole.index.isin(hits)].to_frame("s_suppkey") \
            .groupby("s_suppkey", sort=False).size() \
            .to_frame("numwait").reset_index()
        return g.astype(cols)

    partials = _grouped_by_partition(
        lineitem_ds.map_batches(li_rows, batch_format="pyarrow").union(
            orders_ds.map_batches(o_rows, batch_format="pyarrow")),
        ["key"], resolve, n_parts=num_partitions)
    agg = partials.groupby("s_suppkey").aggregate(Sum("numwait"))
    return agg.map_batches(
        lambda b: pa.table({
            "s_suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "numwait": pc.cast(b.column("sum(numwait)"), pa.int64())}),
        batch_format="pyarrow")


def significant_parts(lineitem_ds, supplier_ds, *,
                      nation_key: int = 3, mean_mult: int = 2,
                      num_partitions=None):
    """TPC-H Q11 shape (adapted: no partsupp table, so "inventory
    value" = revenue ext*(1-disc) of lineitems supplied by one
    nation's suppliers; Q11's fixed-fraction cutoff is scale-dependent
    — at 10x the parts each share shrinks 10x — so the gate is
    scale-FREE: parts worth more than `mean_mult`x the mean part
    value) -> (p_partkey, value_c4).

    One broadcast (the nation's supplier set) prunes the fact map-side;
    ONE partkey groupby over exact-int partials gives per-part values;
    the grand total and part count fold from that BOUNDED aggregate
    (distinct parts, not rows), and the HAVING gate is the integer
    cross-multiplication n_parts * value > mean_mult * total — no
    float boundary."""
    from ray.data.aggregate import Sum
    num_partitions = _cap_partitions(num_partitions)
    s_rows = supplier_ds.map_batches(
        lambda b: b.filter(pc.equal(pc.cast(b.column("s_nationkey"),
                                            pa.int64()),
                                    nation_key))
                   .select(["s_suppkey"]),
        batch_format="pyarrow").take_all()
    sk = np.sort(np.array([r["s_suppkey"] for r in s_rows], np.int64))

    def partial(b: pa.Table) -> pa.Table:
        sup = pc.cast(b.column("l_suppkey"), pa.int64()).to_numpy()
        if len(sk):
            idx = np.searchsorted(sk, sup)
            idx[idx >= len(sk)] = 0
            m = sk[idx] == sup
        else:
            m = np.zeros(len(sup), bool)
        ext_c2 = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        disc_c2 = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        g = pd.DataFrame({
            "p_partkey": pc.cast(b.column("l_partkey"),
                                 pa.int64()).to_numpy()[m],
            "value_c4": ext_c2 * (100 - disc_c2)}) \
            .groupby("p_partkey", sort=False, as_index=False).sum()
        return pa.table({
            "p_partkey": pa.array(g["p_partkey"].to_numpy(np.int64)),
            "value_c4": pa.array(g["value_c4"].to_numpy(np.int64))})

    per_part = lineitem_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_partkey").aggregate(Sum("value_c4")).materialize()
    vals = [r["sum(value_c4)"] for r in
            per_part.select_columns(["sum(value_c4)"]).take_all()]
    total, n_parts = sum(vals), len(vals)

    def gate(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column("sum(value_c4)"), pa.int64()).to_numpy()
        if len(v) == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "value_c4": pa.array([], pa.int64())})
        keep = np.fromiter((n_parts * int(x) > mean_mult * total
                            for x in v), bool, len(v))
        return pa.table({
            "p_partkey": pa.array(pc.cast(
                b.column("p_partkey"), pa.int64()).to_numpy()[keep]),
            "value_c4": pa.array(v[keep])})

    return per_part.map_batches(gate, batch_format="pyarrow")


def dominant_suppliers(lineitem_ds, *, share_inv: int = 5,
                       num_partitions=None):
    """TPC-H Q20 shape (adapted: no partsupp, so "excess availability"
    = a supplier shipped MORE THAN 1/`share_inv` of a part's total
    shipped quantity — 1/5 by default, well above the 1/10 fair share
    of the synthetic supplier pool): per supplier, how many parts they
    dominate -> (s_suppkey, n_parts_dominated).

    ONE partkey-hash partition pass computes per-(part, supplier)
    quantity AND the part total locally (all rows of a part co-locate),
    emitting dominated pairs under the integer-exact gate
    share_inv * supp_qty > total_qty; a supplier-keyed count merges.
    No joins, no broadcast, one row-level shuffle of (part, supp, qty)
    triples pre-combined per batch."""
    from ray.data.aggregate import Sum
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def pre(b: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "key": pc.cast(b.column("l_partkey"), pa.int64()).to_numpy(),
            "supp": pc.cast(b.column("l_suppkey"),
                            pa.int64()).to_numpy(),
            "qty": b.column("l_quantity").to_numpy(
                zero_copy_only=False).astype(np.int64)}) \
            .groupby(["key", "supp"], sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"s_suppkey": "int64", "n_parts_dominated": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby(["key", "supp"], sort=False,
                       as_index=False)["qty"].sum()
        tot = g.groupby("key", sort=False)["qty"].transform("sum")
        dom = g[share_inv * g["qty"].to_numpy(np.int64)
                > tot.to_numpy(np.int64)]
        out = dom.groupby("supp", sort=False).size() \
            .to_frame("n_parts_dominated").reset_index() \
            .rename(columns={"supp": "s_suppkey"})
        return out.astype(cols)

    partials = _grouped_by_partition(
        lineitem_ds.map_batches(pre, batch_format="pyarrow"),
        ["key"], resolve, n_parts=num_partitions)
    agg = partials.groupby("s_suppkey").aggregate(
        Sum("n_parts_dominated"))
    return agg.map_batches(
        lambda b: pa.table({
            "s_suppkey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "n_parts_dominated": pc.cast(
                b.column("sum(n_parts_dominated)"), pa.int64())}),
        batch_format="pyarrow")


def bloom_semi_revenue(lineitem_ds, part_ds, *, max_size: int = 10,
                       m_bits: int = 1 << 20, k: int = 7,
                       num_partitions=None):
    """Bloom-pushdown semi-join: per-brand revenue from lineitems whose
    part passes a selective dim predicate (p_size <= max_size) ->
    (p_brand, revenue_c4, n_items).

    The crawl-scale join strategy this demonstrates: when the dim side
    is too big to broadcast as an exact set but its BLOOM FILTER fits
    (m/8 bytes regardless of key count), push the filter into the fact
    scan — the map-side prefilter drops the non-matching majority of
    fact rows BEFORE any exchange, so the one keyed partition pass only
    carries probable matches.  Bloom false positives cannot corrupt the
    result: the partition pass re-checks membership EXACTLY against the
    co-partitioned dim keys (no false negatives by construction, FPs
    filtered there).  Finish is per-brand int-c4 partials + a tiny
    |brands| merge — exact integer money end-to-end."""
    import ray

    from .dedup import _grouped_by_partition
    from .sketch import _bloom_positions, bloom_build

    num_partitions = _cap_partitions(num_partitions)

    def dim_filter(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("p_size"),
                                   pa.scalar(max_size)))
        return pa.table({
            "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
            "p_brand": b.column("p_brand")})

    dim = part_ds.map_batches(dim_filter,
                              batch_format="pyarrow").materialize()
    bloom = bloom_build(dim, "p_partkey", m_bits=m_bits, k=k)
    bits_ref = ray.put(np.frombuffer(bloom, np.uint8))

    def fact_prefilter(b: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(keys) == 0:
            hit = np.zeros(0, bool)
        else:
            pos = _bloom_positions(keys, m_bits, k).reshape(len(keys), k)
            hit = ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1) \
                .all(axis=1)
        b = b.filter(pa.array(hit))
        n = b.num_rows
        return pa.table({
            "key": pc.cast(b.column("l_partkey"), pa.int64()),
            "c4": _c4_revenue(b),
            "brand": pa.array([""] * n, pa.string()),
            "is_dim": pa.array(np.zeros(n, np.int8), pa.int8())})

    def dim_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "key": b.column("p_partkey"),
            "c4": pa.array(np.zeros(n, np.int64)),
            "brand": b.column("p_brand"),
            "is_dim": pa.array(np.ones(n, np.int8), pa.int8())})

    both = lineitem_ds.map_batches(fact_prefilter,
                                   batch_format="pyarrow") \
        .union(dim.map_batches(dim_rows, batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "c4": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"c4": "int64", "n": "int64"})
        is_dim = df["is_dim"].to_numpy(np.int8) == 1
        bmap = dict(zip(df["key"].to_numpy(np.int64)[is_dim],
                        df["brand"].to_numpy(object)[is_dim]))
        fact = df[~is_dim]
        brands = fact["key"].map(bmap)
        keep = brands.notna().to_numpy()  # exact check kills Bloom FPs
        g = pd.DataFrame({
            "p_brand": brands.to_numpy(object)[keep],
            "c4": fact["c4"].to_numpy(np.int64)[keep],
            "n": 1}).groupby("p_brand", sort=False, as_index=False).sum()
        return g

    partials = _grouped_by_partition(both, ["key"], resolve,
                                     n_parts=num_partitions)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "revenue_c4": "int64",
                "n_items": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"revenue_c4": "int64", "n_items": "int64"})
        g = df.groupby("p_brand", sort=False, as_index=False)[
            ["c4", "n"]].sum()
        return pd.DataFrame({"p_brand": g["p_brand"],
                             "revenue_c4": g["c4"].to_numpy(np.int64),
                             "n_items": g["n"].to_numpy(np.int64)})

    return _grouped_by_partition(partials, ["p_brand"], merge)


def copurchase_pairs(lineitem_ds, part_ds, *, num_partitions=None):
    """Market-basket brand co-occurrence: for every unordered pair of
    DISTINCT part brands appearing in the same order -> (brand_a,
    brand_b, n_orders) with brand_a < brand_b.

    Scale shape: the partkey->brand dim rides a broadcast lookup into
    the fact scan (dense-key numpy array — promo_revenue discipline;
    with a dim too big to broadcast, attach brand via one partkey hop
    pass first).  Orders span blocks, so pair formation needs the whole
    order co-located: ONE orderkey-keyed partition pass dedups
    (order, brand) and emits pairs fully vectorized — groups are
    bucketed BY SIZE k and each size class forms its C(k,2) pairs in a
    single reshape + triu gather (brand domain ~25, so k <= 25 and the
    per-partition pair partials are bounded by C(25,2) keys).  A tiny
    300-key groupby merges the partials — the only row-weight exchange
    is the orderkey pass over (orderkey, brand_id) int pairs."""
    from ray.data.aggregate import Sum

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    rows = part_ds.map_batches(
        lambda b: b.select(["p_partkey", "p_brand"]),
        batch_format="pyarrow").take_all()
    pk = np.array([r["p_partkey"] for r in rows], np.int64)
    brands = sorted({r["p_brand"] for r in rows})
    bid_of = {s: i for i, s in enumerate(brands)}
    size = int(pk.max()) + 1 if len(pk) else 1
    lut = np.full(size, -1, np.int32)  # -1 = partkey not in the dim
    lut[pk] = np.array([bid_of[r["p_brand"]] for r in rows], np.int32)
    nb = max(len(brands), 1)

    def li_rows(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("l_orderkey"), pa.int64()).to_numpy()
        part = pc.cast(b.column("l_partkey"), pa.int64()).to_numpy()
        # drop fact rows whose partkey the dim doesn't cover (partial
        # dims happen on filtered/degenerate inputs; totality > crash)
        bid = np.where(part < size, lut[np.minimum(part, size - 1)],
                       np.int32(-1))
        ok = bid >= 0
        return pa.table({"okey": pa.array(key[ok]),
                         "bid": pa.array(bid[ok])})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        okey = df["okey"].to_numpy(np.int64)
        bid = df["bid"].to_numpy(np.int64)
        # distinct (order, brand) via one packed sort: 12 bid bits
        # (brand domain ~25 << 4096) under 51 orderkey bits — exact up
        # to orderkeys ~2.2e15, far past TPC-H scale
        u = np.unique(okey * np.int64(4096) + bid)
        ob = u % 4096
        starts = np.flatnonzero(np.r_[True, (u >> 12)[1:] != (u >> 12)[:-1]])
        sizes = np.diff(np.r_[starts, u.size])
        counts = np.zeros(nb * nb, np.int64)
        for k in np.unique(sizes):
            if k < 2:
                continue
            grp = ob[starts[sizes == k][:, None] + np.arange(k)]
            ii, jj = np.triu_indices(int(k), 1)
            a = grp[:, ii].ravel()
            c = grp[:, jj].ravel()
            np.add.at(counts, a * nb + c, 1)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"a": nz // nb, "b": nz % nb,
                             "n": counts[nz]})

    fact = lineitem_ds.map_batches(li_rows, batch_format="pyarrow")
    partials = _grouped_by_partition(fact, ["okey"], pairs,
                                     n_parts=num_partitions)
    agg = partials.groupby(["a", "b"]).aggregate(Sum("n"))
    blist = pa.array(brands, pa.string())

    def finish(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column("a"), pa.int64()).to_numpy()
        c = pc.cast(b.column("b"), pa.int64()).to_numpy()
        return pa.table({
            "brand_a": blist.take(pa.array(a)),
            "brand_b": blist.take(pa.array(c)),
            "n_orders": pc.cast(b.column("sum(n)"), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def asof_join_orders_forward(events_ds, orders_ds, *, n_parts: int = 64):
    """FORWARD as-of join: each event matches its user's EARLIEST order
    at or after the event time (min o_orderkey among equal-date orders)
    -> (event_id, user_id, ts, o_orderkey, o_orderdate), inner.

    Zero new kernel: forward-asof == backward-asof on the negated time
    axis (and negated orderkey, so the backward max-okey tie-break
    becomes the forward min-okey one).  Both sides negate int64
    microseconds on entry and the output un-negates — the partition
    pass, segmented scan and tie-break dedup are asof_join_orders
    verbatim."""

    def neg_events(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.timestamp("us"))
        neg = pc.multiply(pc.cast(ts, pa.int64()), -1)
        return pa.table({
            "event_id": pc.cast(b.column("event_id"), pa.int64()),
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "ts": pc.cast(neg, pa.timestamp("us"))})

    def neg_orders(b: pa.Table) -> pa.Table:
        od = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        neg = pc.multiply(pc.cast(od, pa.int64()), -1)
        return pa.table({
            "o_orderkey": pc.multiply(
                pc.cast(b.column("o_orderkey"), pa.int64()), -1),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderdate": pc.cast(neg, pa.timestamp("us"))})

    ev = events_ds.map_batches(neg_events, batch_format="pyarrow")
    od = orders_ds.map_batches(neg_orders, batch_format="pyarrow")
    out = asof_join_orders(ev, od, n_parts=n_parts, how="inner")

    def unneg(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.multiply(
            pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                    pa.int64()), -1), pa.timestamp("us"))
        odt = pc.cast(pc.multiply(
            pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64()), -1), pa.timestamp("us"))
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts": ts,
            "o_orderkey": pc.multiply(b.column("o_orderkey"), -1),
            "o_orderdate": odt})

    return out.map_batches(unneg, batch_format="pyarrow")


def order_total_audit(orders_ds, lineitem_ds, *, num_partitions=None):
    """Cross-table consistency audit in EXACT integers: does
    o_totalprice equal sum(l_extendedprice*(1-l_discount)*(1+l_tax))
    per order? -> ONE row (n_orders, n_with_lines, n_mismatched,
    max_abs_diff_c6).

    All arithmetic in integer 1e-6-dollar units ("c6"): prices carry 2
    decimals and discount/tax 2 decimals each, so
    e_c2 * (100 - d_c2) * (100 + t_c2) is integral and exact; the
    order's header total scales by 1e4 to the same units.  No float
    ever sums, so Ray and DuckDB agree bit-for-bit.

    Scale shape: the revenue_by_nation union pattern — both sides fold
    to (orderkey, side, c6) rows map-side (lineitem pre-aggregates per
    batch), ONE orderkey-keyed partition pass reconciles, a tiny
    all-reduce sums the four counters."""
    from ray.data.aggregate import Count, Max, Sum

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def order_rows(b: pa.Table) -> pa.Table:
        c2 = np.rint(b.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "okey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "c6": pa.array(c2 * 10_000)})

    def line_rows(b: pa.Table) -> pa.Table:
        okey = pc.cast(b.column("l_orderkey"), pa.int64()).to_numpy()
        e = np.rint(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        d = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        t = np.rint(b.column("l_tax").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        c6 = e * (100 - d) * (100 + t)
        g = pd.DataFrame({"okey": okey, "c6": c6}) \
            .groupby("okey", sort=False, as_index=False).sum()
        return pa.table({
            "okey": pa.array(g["okey"].to_numpy(np.int64)),
            "side": pa.array(np.ones(len(g), np.int8), pa.int8()),
            "c6": pa.array(g["c6"].to_numpy(np.int64))})

    both = orders_ds.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem_ds.map_batches(line_rows,
                                       batch_format="pyarrow"))

    def reconcile(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_orders": "int64", "n_with_lines": "int64",
                "n_mismatched": "int64", "max_abs_diff_c6": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.pivot_table(index="okey", columns="side", values="c6",
                           aggfunc="sum")
        hdr = g.get(0)
        lin = g.get(1)
        has_hdr = hdr.notna() if hdr is not None else None
        if hdr is None:
            return pd.DataFrame({"n_orders": [0], "n_with_lines": [0],
                                 "n_mismatched": [0],
                                 "max_abs_diff_c6": [0]})
        if lin is None:
            lin = hdr * np.nan
        both_m = hdr.notna() & lin.notna()
        diff = (hdr[both_m] - lin[both_m]).abs().astype(np.int64)
        return pd.DataFrame({
            "n_orders": [int(hdr.notna().sum())],
            "n_with_lines": [int(both_m.sum())],
            "n_mismatched": [int((diff != 0).sum())],
            "max_abs_diff_c6": [int(diff.max()) if len(diff) else 0]})

    parts = _grouped_by_partition(both, ["okey"], reconcile,
                                  n_parts=num_partitions)
    agg = parts.groupby(None).aggregate(
        Sum("n_orders"), Sum("n_with_lines"), Sum("n_mismatched"),
        Max("max_abs_diff_c6"))
    return agg.map_batches(
        lambda b: pa.table({
            "n_orders": pc.cast(b.column("sum(n_orders)"), pa.int64()),
            "n_with_lines": pc.cast(b.column("sum(n_with_lines)"),
                                    pa.int64()),
            "n_mismatched": pc.cast(b.column("sum(n_mismatched)"),
                                    pa.int64()),
            "max_abs_diff_c6": pc.cast(
                b.column("max(max_abs_diff_c6)"), pa.int64())}),
        batch_format="pyarrow")


def union_by_name(*datasets):
    """UNION ALL BY NAME across Datasets with drifting schemas — the
    crawl-snapshot ingestion case (a column added or dropped between
    crawls must not break the union).  Each input is map-projected onto
    the merged column set (missing columns become typed nulls; column
    order normalized to the merged order) and the results chain through
    Dataset.union, which is metadata-only — no data moves.

    Type policy: a column appearing in several inputs must carry the
    same Arrow type in all of them (the caller owns coercion);
    first-seen type wins for the null fill of absent columns."""
    def _arrow_type(t):
        # pandas-backed blocks report numpy dtypes / python classes;
        # parquet-backed ones report Arrow DataTypes — normalize so the
        # null fill is always a typed Arrow array (object dtype means
        # strings by this repo's conventions)
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t) if not isinstance(t, np.dtype) else t
        if dt.kind == "O":
            return pa.string()
        return pa.from_numpy_dtype(dt)

    merged: dict = {}
    schemas = []
    for ds in datasets:
        sch = ds.schema()
        schemas.append(sch)
        for name, typ in zip(sch.names, sch.types):
            merged.setdefault(name, _arrow_type(typ))
    names = list(merged)

    def project(sch):
        have = set(sch.names)

        def _batch(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = []
            for name in names:
                if name in have:
                    cols.append(b.column(name))
                else:
                    cols.append(pa.nulls(n, merged[name]))
            return pa.Table.from_arrays(cols, names=names)
        return _batch

    parts = [ds.map_batches(project(sch), batch_format="pyarrow")
             for ds, sch in zip(datasets, schemas)]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def column_completeness(ds, count_cols):
    """Per-column non-null counts + total rows in ONE map-side combine
    pass -> single row (n_rows, <col>_nonnull ...).  The schema-drift
    audit that pairs with union_by_name."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        data = {"n_rows": pa.array([len(b)], pa.int64())}
        for c in count_cols:
            nn = len(b) - b.column(c).null_count
            data[f"{c}_nonnull"] = pa.array([nn], pa.int64())
        return pa.table(data)

    aggs = [Sum("n_rows")] + [Sum(f"{c}_nonnull") for c in count_cols]
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    row = {"n_rows": int(agg.get("sum(n_rows)", 0) or 0)}
    for c in count_cols:
        row[f"{c}_nonnull"] = int(agg.get(f"sum({c}_nonnull)", 0) or 0)
    return pd.DataFrame([row]).astype(np.int64)


def range_lookup_join(fact_ds, dim_ds, *, value_col: str, lo_col: str,
                      hi_col: str, label_col: str):
    """Point-in-range dim lookup (the IP-to-geo / price-band shape):
    append `label_col` to every fact row whose `value_col` lands in a
    dim interval [lo, hi) — inner-join semantics, rows outside every
    band are dropped.

    The dim side is SMALL BY CONTRACT (a band table, not a fact):
    its sorted (lo, hi, label) arrays are broadcast ONCE via ray.put
    and every fact batch resolves with one np.searchsorted — zero
    fact shuffle, which is the whole point vs. expressing a BETWEEN
    join as a theta-join shuffle.  Intervals must be non-overlapping
    (asserted); gaps are allowed (the hi check drops gap rows)."""
    import ray

    dim = dim_ds.to_pandas() if hasattr(dim_ds, "to_pandas") else dim_ds
    if len(dim) == 0 or lo_col not in dim.columns:
        # empty Ray blocks lose their schema -> 0-column frame
        lo = np.empty(0, np.int64)
        hi = np.empty(0, np.int64)
        labels = np.empty(0, object)
    else:
        dim = dim.sort_values(lo_col)
        lo = dim[lo_col].to_numpy(np.int64)
        hi = dim[hi_col].to_numpy(np.int64)
        labels = dim[label_col].to_numpy()
    if len(lo) > 1 and (hi[:-1] > lo[1:]).any():
        raise ValueError("range_lookup_join: overlapping dim intervals")
    lut_ref = ray.put((lo, hi, labels))

    def lookup(b: pa.Table) -> pa.Table:
        l_, h_, lab = ray.get(lut_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(l_, v, side="right") - 1
        posc = np.clip(pos, 0, len(l_) - 1)
        ok = (pos >= 0) & (v < h_[posc]) if len(l_) else \
            np.zeros(len(v), bool)
        out = b.filter(pa.array(ok))
        return out.append_column(label_col,
                                 pa.array(lab[posc[ok]]))

    return fact_ds.map_batches(lookup, batch_format="pyarrow")


def asof_join_orders_nearest(events_ds, orders_ds, *, n_parts: int = 64):
    """NEAREST as-of join: each event matches its user's temporally
    closest order — the latest order at-or-before the event (backward
    leg, max o_orderkey among equal dates) vs the earliest order
    strictly after it (forward leg, min o_orderkey); the smaller
    absolute gap wins and the backward side wins exact ties ->
    (event_id, user_id, ts, o_orderkey, o_orderdate), inner (events of
    users with no orders drop).

    One partition pass resolves BOTH directions: the user-keyed union
    shuffles once; within a partition two lexsorts feed the same
    _seg_last_idx segmented scan — forward-asof is backward-asof on
    the negated time axis with negated orderkeys (the
    asof_join_orders_forward identity), so no new kernel and no second
    exchange exists.  Partitioning assumption: one user's rows fit a
    partition (salt by time bucket with boundary order carries beyond
    that — the asof_join_orders_salted lift)."""
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

    cols = {"event_id": "int64", "user_id": "int64",
            "ts": "datetime64[us]", "o_orderkey": "int64",
            "o_orderdate": "datetime64[us]"}

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        key = df["key"].to_numpy(dtype=np.int64)
        side = df["side"].to_numpy(dtype=np.int8)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        okey = df["o_orderkey"].to_numpy(dtype=np.float64)  # NaN on events
        eid = df["event_id"].to_numpy(dtype=np.float64)
        is_o = side == 1

        def leg(ts_ax, ok_ax, orders_first):
            # orders_first: at equal ts, orders sort BEFORE events so an
            # equal-ts order is eligible (backward, at-or-before);
            # otherwise AFTER, making the leg strict (forward, after)
            tie = (1 - side) if orders_first else side
            order = np.lexsort((ok_ax, tie, ts_ax, key))
            gch = np.empty(n, dtype=bool)
            gch[0] = True
            gch[1:] = key[order][1:] != key[order][:-1]
            last, valid = _seg_last_idx(is_o[order], gch)
            return order, last, valid

        # backward leg: latest order <= ts, max okey among equal dates
        b_ord, b_last, b_valid = leg(ts, okey, True)
        b_ok = np.full(n, -1, np.int64)
        b_ot = np.zeros(n, np.int64)
        b_hit = np.zeros(n, dtype=bool)
        ev_b = (side[b_ord] == 0)
        hit_b = ev_b & b_valid
        rows_b = b_ord[hit_b]
        b_hit[rows_b] = True
        b_ok[rows_b] = okey[b_ord][b_last[hit_b]].astype(np.int64)
        b_ot[rows_b] = ts[b_ord][b_last[hit_b]]
        # forward leg: earliest order > ts, min okey among equal dates
        f_ord, f_last, f_valid = leg(-ts, -okey, False)
        f_ok = np.full(n, -1, np.int64)
        f_ot = np.zeros(n, np.int64)
        f_hit = np.zeros(n, dtype=bool)
        ev_f = (side[f_ord] == 0)
        hit_f = ev_f & f_valid
        rows_f = f_ord[hit_f]
        f_hit[rows_f] = True
        # the negation lived only in the SORT keys; values read back
        # from the original arrays
        f_ok[rows_f] = okey[f_ord][f_last[hit_f]].astype(np.int64)
        f_ot[rows_f] = ts[f_ord][f_last[hit_f]]
        # pick the closer side; backward wins ties
        ev = side == 0
        any_hit = ev & (b_hit | f_hit)
        gap_b = np.where(b_hit, ts - b_ot, np.int64(2**62))
        gap_f = np.where(f_hit, f_ot - ts, np.int64(2**62))
        use_b = b_hit & (gap_b <= gap_f)
        sel_ok = np.where(use_b, b_ok, f_ok)[any_hit]
        sel_ot = np.where(use_b, b_ot, f_ot)[any_hit]
        return pd.DataFrame({
            "event_id": eid[any_hit].astype(np.int64),
            "user_id": key[any_hit],
            "ts": ts[any_hit].astype("datetime64[us]"),
            "o_orderkey": sel_ok,
            "o_orderdate": sel_ot.astype("datetime64[us]")}).astype(cols)

    return _grouped_by_partition(both, ["key"], resolve, n_parts=n_parts)


def reorder_rate(orders_ds, *, max_gap_days: int = 7,
                 n_parts: int = 32):
    """Quick-reorder propensity per customer: over the (o_orderdate,
    o_orderkey)-ordered order stream, count consecutive pairs placed
    within `max_gap_days` -> (o_custkey, n_pairs, n_quick, quick_ppm,
    all integers, truncated ppm); single-order customers drop.
    Repeat-purchase-cadence screen.

    One custkey-keyed partition pass; gaps are one masked diff over a
    lexsort — no per-customer Python loop."""

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_custkey": "int64", "n_pairs": "int64",
                "n_quick": "int64", "quick_ppm": "int64"}
        df = df[df["o_orderdate"].notna()]
        m = len(df)
        if m == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        cust = df["o_custkey"].to_numpy(dtype=np.int64)
        ts = df["o_orderdate"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        okey = df["o_orderkey"].to_numpy(dtype=np.int64)
        order = np.lexsort((okey, ts, cust))
        c, t = cust[order], ts[order]
        same = c[1:] == c[:-1]
        if not same.any():
            return pd.DataFrame(columns=list(cols)).astype(cols)
        gap = (t[1:] - t[:-1])[same]
        quick = (gap <= max_gap_days * 86_400_000_000).astype(np.int64)
        g = pd.DataFrame({"c": c[1:][same], "q": quick})
        agg = g.groupby("c", as_index=False).agg(
            n_pairs=("q", "size"), n_quick=("q", "sum"))
        pairs = agg["n_pairs"].to_numpy(np.int64)
        quick_n = agg["n_quick"].to_numpy(np.int64)
        return pd.DataFrame({
            "o_custkey": agg["c"].to_numpy(np.int64),
            "n_pairs": pairs, "n_quick": quick_n,
            "quick_ppm": quick_n * 1_000_000 // pairs}).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(orders_ds, ["o_custkey"], per_cust,
                                 n_parts=n_parts)


def spend_activity_corr(orders_ds, events_ds, *, n_parts: int = 32):
    """Cross-table Pearson correlation between per-user order spend
    and per-user event value (users present in BOTH tables) ->
    one row (scope='all', n, corr_xy).  The cross-dataset signal a
    feature-store join would feed a model.

    Values are FLOOR()ed to whole integer units per row before
    summing — floor is exactly reproducible in both engines (unlike
    round's half-away vs half-even split), so every moment is an
    exact integer.  Scale shape: map-side per-user partial sums on
    EACH side (the exchange carries one row per user per block, never
    raw facts), a tagged union instead of a hash join (the
    revenue_by_nation single-shuffle pattern), one user-keyed
    partition pass that keeps both-sided users and emits ONE local
    moment partial row per partition, and a tiny driver-side finish
    with Python-int exactness + the grouped_corr IEEE float order.
    int64-safe while sum(x^2) < 2^63 (~sf100 for TPC-H dollar
    magnitudes)."""

    def o_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "ox": pa.array([], pa.int64()),
                             "oy": pa.array([], pa.int64())})
        u = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.floor(np.nan_to_num(
            b.column("o_totalprice").to_numpy(zero_copy_only=False)
            .astype(np.float64))).astype(np.int64)
        g = pd.DataFrame({"u": u, "x": v}).groupby(
            "u", as_index=False).agg(x=("x", "sum"), ox=("x", "size"))
        return pa.table({"u": pa.array(g["u"].to_numpy(np.int64)),
                         "x": pa.array(g["x"].to_numpy(np.int64)),
                         "y": pa.array(np.zeros(len(g), np.int64)),
                         "ox": pa.array(g["ox"].to_numpy(np.int64)),
                         "oy": pa.array(np.zeros(len(g), np.int64))})

    def e_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "ox": pa.array([], pa.int64()),
                             "oy": pa.array([], pa.int64())})
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.floor(np.nan_to_num(
            b.column("value").to_numpy(zero_copy_only=False)
            .astype(np.float64))).astype(np.int64)
        g = pd.DataFrame({"u": u, "y": v}).groupby(
            "u", as_index=False).agg(y=("y", "sum"), oy=("y", "size"))
        return pa.table({"u": pa.array(g["u"].to_numpy(np.int64)),
                         "x": pa.array(np.zeros(len(g), np.int64)),
                         "y": pa.array(g["y"].to_numpy(np.int64)),
                         "ox": pa.array(np.zeros(len(g), np.int64)),
                         "oy": pa.array(g["oy"].to_numpy(np.int64))})

    tagged = orders_ds.map_batches(o_partial, batch_format="pyarrow") \
        .union(events_ds.map_batches(e_partial, batch_format="pyarrow"))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": "int64", "sx": "int64", "sy": "int64",
                "sxx": "int64", "syy": "int64", "sxy": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("u", as_index=False).sum()
        g = g[(g["ox"] > 0) & (g["oy"] > 0)]
        if len(g) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        return pd.DataFrame({"n": [len(g)], "sx": [x.sum()],
                             "sy": [y.sum()], "sxx": [(x * x).sum()],
                             "syy": [(y * y).sum()],
                             "sxy": [(x * y).sum()]}).astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(tagged, ["u"], moments,
                                     n_parts=n_parts)

    import math
    rows = partials.take_all()
    n = sum(int(r["n"]) for r in rows)
    out_cols = {"scope": "object", "n": "int64", "corr_xy": "float64"}
    if n == 0:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    sx = sum(int(r["sx"]) for r in rows)
    sy = sum(int(r["sy"]) for r in rows)
    sxx = sum(int(r["sxx"]) for r in rows)
    syy = sum(int(r["syy"]) for r in rows)
    sxy = sum(int(r["sxy"]) for r in rows)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(vx)) * math.sqrt(float(vy))
    return pd.DataFrame({"scope": ["all"], "n": [n],
                         "corr_xy": [num / den]}).astype(out_cols)


def nation_revenue_hhi(orders_ds, customer_ds, *, n_parts: int = 32):
    """Herfindahl-Hirschman revenue-concentration index per nation:
    x_c = each ordering customer's total floor()ed order dollars,
    HHI = sum(x_c^2) / (sum x_c)^2 in truncated integer ppm ->
    (nation, n_cust, sum_x, hhi_ppm).  Market-concentration screen
    (1e6/n = perfectly even, 1e6 = single-customer nation).

    floor() per row (not round) keeps every moment an exact integer in
    both engines.  Scale shape: map-side per-customer spend partials
    on the fact side, a tagged union with the (custkey, nationkey) dim
    (no hash join), ONE custkey-keyed partition pass that finishes
    each customer exactly once and folds per-nation partials with
    PYTHON-INT exactness — sum(x^2) overflows int64 near 1e6 heavy
    customers per partition, so the x^2 partial crosses the wire
    split as (quot, rem) by 1e18 and the driver reassembles big ints
    (nations are bounded, 25 rows).  The DuckDB oracle uses HUGEINT
    for the same quantities."""

    def o_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.floor(np.nan_to_num(
            b.column("o_totalprice").to_numpy(zero_copy_only=False)
            .astype(np.float64))).astype(np.int64)
        g = pd.DataFrame({"k": k, "x": v}).groupby(
            "k", as_index=False)["x"].sum()
        return pa.table({"k": pa.array(g["k"].to_numpy(np.int64)),
                         "x": pa.array(g["x"].to_numpy(np.int64)),
                         "nat": pa.array(np.full(len(g), -1,
                                                 np.int64))})

    def c_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k),
                         "x": pa.array(np.zeros(len(k), np.int64)),
                         "nat": pa.array(n)})

    tagged = orders_ds.map_batches(o_partial, batch_format="pyarrow") \
        .union(customer_ds.map_batches(c_rows, batch_format="pyarrow"))

    SPLIT = 10 ** 18

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": "int64", "n_cust": "int64", "sum_x": "int64",
                "x2_quot": "int64", "x2_rem": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("k", as_index=False).agg(
            x=("x", "sum"), nat=("nat", "max"))
        g = g[(g["nat"] >= 0) & (g["x"] > 0)]
        if len(g) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        rows = []
        for nat, sub in g.groupby("nat"):
            xs = sub["x"].to_numpy(np.int64)
            x2 = sum(int(v) * int(v) for v in xs)
            q, r = divmod(x2, SPLIT)
            rows.append({"nation": int(nat), "n_cust": len(xs),
                         "sum_x": int(xs.sum()), "x2_quot": q,
                         "x2_rem": r})
        return pd.DataFrame(rows).astype(cols)

    from .dedup import _grouped_by_partition
    partials = _grouped_by_partition(tagged, ["k"], fold,
                                     n_parts=n_parts)

    rows = partials.take_all()
    out_cols = {"nation": "int64", "n_cust": "int64", "sum_x": "int64",
                "hhi_ppm": "int64"}
    acc: dict = {}
    for r in rows:
        nat = int(r["nation"])
        n, sx, x2 = acc.get(nat, (0, 0, 0))
        acc[nat] = (n + int(r["n_cust"]), sx + int(r["sum_x"]),
                    x2 + int(r["x2_quot"]) * SPLIT + int(r["x2_rem"]))
    out = [{"nation": nat, "n_cust": n, "sum_x": sx,
            "hhi_ppm": x2 * 1_000_000 // (sx * sx)}
           for nat, (n, sx, x2) in sorted(acc.items()) if sx > 0]
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def nation_pareto80(orders_ds, customer_ds, *, n_parts: int = 32):
    """Pareto revenue coverage per nation: the minimum number of
    customers whose descending-spend prefix reaches 80% of the
    nation's floor()ed revenue -> (nation, n_cust, n_top80,
    top80_ppm).  The 80/20 concentration screen; the threshold test
    is the exact integer compare 5*(cum - x) < 4*total, so no float
    boundary can flip a row, and equal spends contribute identical
    cumsum steps, making n_top80 tie-order independent.

    Scale shape: the nation_revenue_hhi tagged-union custkey pass
    reduces orders to one exact spend per customer; a second keyed
    pass over (nation, x) sorts within nation (group cardinality
    bounded at the nation count; rows already one-per-customer)."""

    def o_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.floor(np.nan_to_num(
            b.column("o_totalprice").to_numpy(zero_copy_only=False)
            .astype(np.float64))).astype(np.int64)
        g = pd.DataFrame({"k": k, "x": v}).groupby(
            "k", as_index=False)["x"].sum()
        return pa.table({"k": pa.array(g["k"].to_numpy(np.int64)),
                         "x": pa.array(g["x"].to_numpy(np.int64)),
                         "nat": pa.array(np.full(len(g), -1,
                                                 np.int64))})

    def c_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k),
                         "x": pa.array(np.zeros(len(k), np.int64)),
                         "nat": pa.array(n)})

    tagged = orders_ds.map_batches(o_partial, batch_format="pyarrow") \
        .union(customer_ds.map_batches(c_rows, batch_format="pyarrow"))

    def cust_spend(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": "int64", "x": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("k", as_index=False).agg(
            x=("x", "sum"), nat=("nat", "max"))
        g = g[(g["nat"] >= 0) & (g["x"] > 0)]
        return pd.DataFrame({
            "nation": g["nat"].to_numpy(np.int64),
            "x": g["x"].to_numpy(np.int64)}).astype(cols)

    from .dedup import _grouped_by_partition
    spends = _grouped_by_partition(tagged, ["k"], cust_spend,
                                   n_parts=n_parts)

    def per_nation(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": "int64", "n_cust": "int64",
                "n_top80": "int64", "top80_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        nat = df["nation"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        o = np.lexsort((-x, nat))
        n, xs = nat[o], x[o]
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        sizes = np.diff(np.r_[starts, len(n)])
        cum = np.cumsum(xs)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]]
                         if len(starts) > 1 else np.array([0]), sizes)
        cum_in = cum - base
        total = np.repeat(cum_in[starts + sizes - 1], sizes)
        needed = 5 * (cum_in - xs) < 4 * total
        n80 = np.add.reduceat(needed.astype(np.int64), starts)
        return pd.DataFrame({
            "nation": n[starts],
            "n_cust": sizes.astype(np.int64),
            "n_top80": n80,
            "top80_ppm": n80 * 1_000_000 // sizes}).astype(cols)

    return _grouped_by_partition(spends, ["nation"], per_nation,
                                 n_parts=min(n_parts, 25))


def copurchase_lift(lineitem_ds, part_ds, *, num_partitions=None):
    """Association-rule metrics over brand co-occurrence: for every
    unordered brand pair in the same order -> (brand_a, brand_b,
    n_ab, n_a, n_b, lift_ppm) where lift = P(ab)/(P(a)P(b)) =
    n_ab * n_orders / (n_a * n_b), emitted as truncated integer ppm
    computed with PYTHON-INT exactness (n_ab * n_orders * 1e6
    overflows int64 past ~1e9 orders; the finish table is bounded by
    the brand-pair count, so big ints are free).

    Scale shape mirrors copurchase_pairs: broadcast partkey->brand
    LUT into the fact scan, ONE orderkey-keyed partition pass that
    emits pair partials AND per-brand order-incidence partials AND a
    local distinct-order count from the same dedup (kind-tagged,
    all bounded by the brand alphabet), one tiny groupby merge."""
    from ray.data.aggregate import Sum

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    rows = part_ds.map_batches(
        lambda b: b.select(["p_partkey", "p_brand"]),
        batch_format="pyarrow").take_all()
    pk = np.array([r["p_partkey"] for r in rows], np.int64)
    brands = sorted({r["p_brand"] for r in rows})
    bid_of = {s: i for i, s in enumerate(brands)}
    size = int(pk.max()) + 1 if len(pk) else 1
    lut = np.full(size, -1, np.int32)
    lut[pk] = np.array([bid_of[r["p_brand"]] for r in rows], np.int32)
    nb = max(len(brands), 1)

    def li_rows(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("l_orderkey"), pa.int64()).to_numpy()
        part = pc.cast(b.column("l_partkey"), pa.int64()).to_numpy()
        bid = np.where(part < size, lut[np.minimum(part, size - 1)],
                       np.int32(-1))
        ok = bid >= 0
        return pa.table({"okey": pa.array(key[ok]),
                         "bid": pa.array(bid[ok])})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # kind 0: (a=brand_a, b=brand_b) pair count; kind 1: (a=brand,
        # b=0) order-incidence count; kind 2: local distinct orders
        cols = {"kind": "int64", "a": "int64", "b": "int64",
                "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        okey = df["okey"].to_numpy(np.int64)
        bid = df["bid"].to_numpy(np.int64)
        u = np.unique(okey * np.int64(4096) + bid)
        ob = u % 4096
        starts = np.flatnonzero(np.r_[True,
                                      (u >> 12)[1:] != (u >> 12)[:-1]])
        sizes = np.diff(np.r_[starts, u.size])
        counts = np.zeros(nb * nb, np.int64)
        for kk in np.unique(sizes):
            if kk < 2:
                continue
            grp = ob[starts[sizes == kk][:, None] + np.arange(kk)]
            ii, jj = np.triu_indices(int(kk), 1)
            np.add.at(counts, grp[:, ii].ravel() * nb
                      + grp[:, jj].ravel(), 1)
        nz = np.flatnonzero(counts)
        inc = np.bincount(ob, minlength=nb)
        bi = np.flatnonzero(inc)
        out = pd.DataFrame({
            "kind": np.r_[np.zeros(len(nz), np.int64),
                          np.ones(len(bi), np.int64), [2]],
            "a": np.r_[nz // nb, bi, [0]],
            "b": np.r_[nz % nb, np.zeros(len(bi), np.int64), [0]],
            "n": np.r_[counts[nz], inc[bi], [len(starts)]]})
        return out.astype(cols)

    fact = lineitem_ds.map_batches(li_rows, batch_format="pyarrow")
    partials = _grouped_by_partition(fact, ["okey"], fold,
                                     n_parts=num_partitions)
    agg_rows = partials.groupby(["kind", "a", "b"]) \
        .aggregate(Sum("n")).take_all()

    out_cols = {"brand_a": "object", "brand_b": "object",
                "n_ab": "int64", "n_a": "int64", "n_b": "int64",
                "lift_ppm": "int64"}
    n_orders = 0
    inc: dict = {}
    pairs: dict = {}
    for r in agg_rows:
        k, n = int(r["kind"]), int(r["sum(n)"])
        if k == 2:
            n_orders += n
        elif k == 1:
            inc[int(r["a"])] = inc.get(int(r["a"]), 0) + n
        else:
            key = (int(r["a"]), int(r["b"]))
            pairs[key] = pairs.get(key, 0) + n
    out = [{"brand_a": brands[a], "brand_b": brands[b], "n_ab": n,
            "n_a": inc[a], "n_b": inc[b],
            "lift_ppm": n * n_orders * 1_000_000 // (inc[a] * inc[b])}
           for (a, b), n in sorted(pairs.items())]
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)


def fk_orphans(child_ds, child_key: str, parent_ds, parent_key: str,
               relationship: str, *, n_parts: int = 32):
    """Referential-integrity audit for one FK edge -> single row
    (relationship, n_child_rows, n_orphan_rows, n_orphan_keys): child
    rows whose key has no parent.  The ingest gate every warehouse
    load runs before joins are trusted.

    Scale shape: map-side per-key child ROW counts (the exchange
    carries one row per distinct key per batch) tagged-unioned with
    map-side-deduped parent keys — no hash join, ONE key-partitioned
    pass; each partition folds to three numbers, the driver adds a
    handful of partial rows."""
    from .dedup import _grouped_by_partition

    def c_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        k = pc.fill_null(pc.cast(b.column(child_key), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ks, cnt = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(ks),
                         "c": pa.array(cnt.astype(np.int64)),
                         "p": pa.array(np.zeros(len(ks), np.int64))})

    def p_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64())})
        k = np.unique(
            pc.fill_null(pc.cast(b.column(parent_key), pa.int64()), -1)
            .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"k": pa.array(k),
                         "c": pa.array(np.zeros(len(k), np.int64)),
                         "p": pa.array(np.ones(len(k), np.int64))})

    tagged = child_ds.map_batches(c_partial, batch_format="pyarrow") \
        .union(parent_ds.map_batches(p_partial, batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_child_rows": "int64", "n_orphan_rows": "int64",
                "n_orphan_keys": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("k", as_index=False).agg(c=("c", "sum"),
                                                p=("p", "max"))
        orphan = (g["p"] == 0) & (g["c"] > 0)
        return pd.DataFrame([{
            "n_child_rows": int(g["c"].sum()),
            "n_orphan_rows": int(g.loc[orphan, "c"].sum()),
            "n_orphan_keys": int(orphan.sum())}]).astype(cols)

    parts = _grouped_by_partition(tagged, ["k"], fold, n_parts=n_parts)
    rows = parts.take_all()
    out_cols = {"relationship": "object", "n_child_rows": "int64",
                "n_orphan_rows": "int64", "n_orphan_keys": "int64"}
    tot = {c: 0 for c in ("n_child_rows", "n_orphan_rows",
                          "n_orphan_keys")}
    for r in rows:
        for c in tot:
            tot[c] += int(r[c])
    out = pd.DataFrame([{"relationship": relationship, **tot}])
    return out[list(out_cols)].astype(
        {k: v for k, v in out_cols.items() if k != "relationship"})


def nation_theil(orders_ds, customer_ds, *, n_parts: int = 32):
    """Theil-T inequality index of customer order spend per nation ->
    (nation, n_cust, total_x, theil_ppm).  T = (1/n) * sum_i
    (x_i/mu) * ln(x_i/mu); 0 = perfectly even, ln(n) = one customer
    holds everything.  The inequality-decomposition counterpart to
    the HHI screen (nation_revenue_hhi).

    Determinism: each customer's term is floored to ppm BEFORE the
    per-nation sum — term_ppm = floor(1e6 * r * ln(r * n)) with
    r = CAST(x AS DOUBLE)/CAST(X AS DOUBLE) — so the cross-engine sum
    is an order-free INTEGER sum; x (floored dollars) and X, n (exact
    integer totals) feed identical IEEE expressions in both engines.

    Scale shape: the nation_revenue_hhi tagged-union custkey pass
    resolves each customer's (nation, x) exactly once; nation totals
    are a bounded groupby (<=25 rows) broadcast back; the term pass is
    map-only with per-batch per-nation integer partials."""
    import math

    import ray
    from ray.data.aggregate import Count, Sum

    from .dedup import _grouped_by_partition

    def o_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.floor(np.nan_to_num(
            b.column("o_totalprice").to_numpy(zero_copy_only=False)
            .astype(np.float64))).astype(np.int64)
        g = pd.DataFrame({"k": k, "x": v}).groupby(
            "k", as_index=False)["x"].sum()
        return pa.table({"k": pa.array(g["k"].to_numpy(np.int64)),
                         "x": pa.array(g["x"].to_numpy(np.int64)),
                         "nat": pa.array(np.full(len(g), -1, np.int64))})

    def c_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64())})
        k = b.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = b.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k),
                         "x": pa.array(np.zeros(len(k), np.int64)),
                         "nat": pa.array(n)})

    tagged = orders_ds.map_batches(o_partial, batch_format="pyarrow") \
        .union(customer_ds.map_batches(c_rows, batch_format="pyarrow"))

    def per_customer(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": "int64", "x": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("k", as_index=False).agg(
            x=("x", "sum"), nat=("nat", "max"))
        g = g[(g["nat"] >= 0) & (g["x"] > 0)]
        return pd.DataFrame({"nation": g["nat"].to_numpy(np.int64),
                             "x": g["x"].to_numpy(np.int64)})

    cust = _grouped_by_partition(tagged, ["k"], per_customer,
                                 n_parts=n_parts).materialize()

    tot_rows = cust.groupby("nation").aggregate(
        Count(), Sum("x")).take_all()
    out_cols = {"nation": "int64", "n_cust": "int64", "total_x": "int64",
                "theil_ppm": "int64"}
    if not tot_rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    totals = {int(r["nation"]): (int(r["count()"]), int(r["sum(x)"]))
              for r in tot_rows}
    lut_ref = ray.put(totals)

    def term_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"nation": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        lut = ray.get(lut_ref)
        nat = b.column("nation").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = b.column("x").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keys = np.array(sorted(lut), np.int64)
        ns = np.array([lut[k][0] for k in keys], np.float64)
        Xs = np.array([float(lut[k][1]) for k in keys], np.float64)
        pos = np.searchsorted(keys, nat)
        n_arr = ns[pos]
        X_arr = Xs[pos]
        r = x / X_arr
        term = np.floor(1_000_000.0 * r * np.log(r * n_arr)) \
            .astype(np.int64)
        g = pd.DataFrame({"nation": nat, "t": term}) \
            .groupby("nation", sort=False, as_index=False).sum()
        return pa.table({"nation": pa.array(g["nation"]
                                            .to_numpy(np.int64)),
                         "t": pa.array(g["t"].to_numpy(np.int64))})

    srows = cust.map_batches(term_partial, batch_format="pyarrow") \
        .groupby("nation").aggregate(Sum("t")).take_all()
    tsum = {int(r["nation"]): int(r["sum(t)"]) for r in srows}
    out = []
    for nat in sorted(totals):
        n, X = totals[nat]
        # clamp before the // — floored terms can push the sum a few
        # ppm below 0 when T ~ 0, and Python floors negatives where
        # DuckDB truncates; GREATEST(s,0) keeps both engines on
        # positive operands
        out.append({"nation": nat, "n_cust": n, "total_x": X,
                    "theil_ppm": max(tsum.get(nat, 0), 0) // n})
    _ = math  # documented-import guard
    return pd.DataFrame(out).astype(out_cols)


_BUSDAY_C = np.array([0, 1, 2, 2, 2, 3, 4], np.int64)


def _busday_rank(days: np.ndarray) -> np.ndarray:
    """g(d) = #weekdays in epoch-day interval [0, d) — closed form off
    the 1970-01-01-is-Thursday anchor, so business-day distances are
    g(b) - g(a) with no calendar table.  Positive inputs only (epoch
    days of real dates), so // and % agree with SQL."""
    return 5 * (days // 7) + _BUSDAY_C[days % 7]


def business_days_latency(orders_ds, lineitem_ds, *,
                          num_partitions=None):
    """Order->ship business-day latency (weekends excluded) per
    returnflag, in EXACT integers: busdays((order, ship]) =
    g(ship+1) - g(order+1) with the closed-form weekday rank ->
    (returnflag, n_items, sum_busdays, avg_busdays_ppm, max_busdays).

    Scale shape: the order_total_audit union pattern — one
    orderkey-keyed co-partition joins header order dates to line ship
    dates (pandas merge inside the partition, no per-row Python), each
    partition emits per-flag partials, a tiny groupby finishes."""
    from ray.data.aggregate import Max, Sum

    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    def order_rows(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b.column("o_orderdate"), pa.date32()),
                      pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "okey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "day": pa.array(day),
            "flag": pa.array([""] * b.num_rows, pa.string())})

    def line_rows(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(b.column("l_shipdate"), pa.date32()),
                      pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
            "side": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            "day": pa.array(day),
            "flag": pc.cast(pc.fill_null(b.column("l_returnflag"), ""),
                            pa.string())})

    both = orders_ds.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem_ds.map_batches(line_rows,
                                       batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"returnflag": "object", "n": "int64", "s": "int64",
                "mx": "int64"}
        hdr = df[df["side"] == 0][["okey", "day"]] \
            .rename(columns={"day": "oday"})
        lin = df[df["side"] == 1]
        if len(hdr) == 0 or len(lin) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        j = lin.merge(hdr, on="okey", how="inner")
        bus = _busday_rank(j["day"].to_numpy(np.int64) + 1) \
            - _busday_rank(j["oday"].to_numpy(np.int64) + 1)
        g = pd.DataFrame({"returnflag": j["flag"].to_numpy(object),
                          "n": 1, "s": bus, "mx": bus}) \
            .groupby("returnflag", sort=False, as_index=False) \
            .agg(n=("n", "sum"), s=("s", "sum"), mx=("mx", "max"))
        return g.astype(cols)

    parts = _grouped_by_partition(both, ["okey"], resolve,
                                  n_parts=num_partitions)
    agg = parts.groupby("returnflag").aggregate(
        Sum("n"), Sum("s"), Max("mx"))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mx = b.column("max(mx)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "returnflag": pc.cast(b.column("returnflag"), pa.string()),
            "n_items": pa.array(n),
            "sum_busdays": pa.array(s),
            "avg_busdays_ppm": pa.array(
                np.where(n > 0, (s * 1_000_000) // np.maximum(n, 1),
                         0)),
            "max_busdays": pa.array(mx)})

    return agg.map_batches(finish, batch_format="pyarrow")


def customer_feature_table(customer_ds, orders_ds, nation_ds, *,
                           num_partitions=None):
    """Feature-store wide build: one row per customer joining dim
    attributes (mktsegment, nation name via broadcast) to order-derived
    features (count, exact-cent spend totals/average, first/last order
    epoch day, active span) -> (c_custkey, mktsegment, nation,
    acctbal_cents, n_orders, total_cents, avg_order_cents, first_day,
    last_day, span_days).  Customers with no orders keep -1 day
    sentinels and zero spend (LEFT JOIN semantics).

    Scale shape: orders pre-aggregate per batch, then ONE custkey-keyed
    co-partition resolves customer+aggregate rows; the nation dim
    broadcasts once via ray.put (25 rows — never a shuffle side)."""
    import ray
    from .dedup import _grouped_by_partition
    num_partitions = _cap_partitions(num_partitions)

    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in nation_ds.take_all()}
    nat_ref = ray.put(nat)

    def cust_rows(b: pa.Table) -> pa.Table:
        bal = np.rint(b.column("c_acctbal")
                      .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({
            "ckey": pc.cast(b.column("c_custkey"), pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "nkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "seg": pc.cast(pc.fill_null(b.column("c_mktsegment"), ""),
                           pa.string()),
            "n": pa.array(np.zeros(b.num_rows, np.int64)),
            "tot": pa.array(bal),  # reuse: acctbal cents ride here
            "f": pa.array(np.zeros(b.num_rows, np.int64)),
            "l": pa.array(np.zeros(b.num_rows, np.int64))})

    def order_rows(b: pa.Table) -> pa.Table:
        ckey = pc.cast(b.column("o_custkey"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = np.rint(b.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        day = pc.cast(pc.cast(b.column("o_orderdate"), pa.date32()),
                      pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"ckey": ckey, "n": 1, "tot": cents,
                          "f": day, "l": day}) \
            .groupby("ckey", sort=False, as_index=False) \
            .agg(n=("n", "sum"), tot=("tot", "sum"), f=("f", "min"),
                 l=("l", "max"))
        m = len(g)
        return pa.table({
            "ckey": pa.array(g["ckey"].to_numpy(np.int64)),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "nkey": pa.array(np.zeros(m, np.int64)),
            "seg": pa.array([""] * m, pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "tot": pa.array(g["tot"].to_numpy(np.int64)),
            "f": pa.array(g["f"].to_numpy(np.int64)),
            "l": pa.array(g["l"].to_numpy(np.int64))})

    both = customer_ds.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders_ds.map_batches(order_rows,
                                     batch_format="pyarrow"))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_custkey": "int64", "mktsegment": "object",
                "nation": "object", "acctbal_cents": "int64",
                "n_orders": "int64", "total_cents": "int64",
                "avg_order_cents": "int64", "first_day": "int64",
                "last_day": "int64", "span_days": "int64"}
        cust = df[df["side"] == 0]
        if len(cust) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {k: v for k, v in cols.items() if v == "int64"})
        o = df[df["side"] == 1]
        agg = o.groupby("ckey", sort=False, as_index=True).agg(
            n=("n", "sum"), tot=("tot", "sum"), f=("f", "min"),
            l=("l", "max")) if len(o) else None
        nmap = ray.get(nat_ref)
        ck = cust["ckey"].to_numpy(np.int64)
        if agg is not None:
            n = agg["n"].reindex(ck, fill_value=0).to_numpy(np.int64)
            tot = agg["tot"].reindex(ck, fill_value=0) \
                .to_numpy(np.int64)
            f = agg["f"].reindex(ck).to_numpy()
            lst = agg["l"].reindex(ck).to_numpy()
        else:
            n = tot = np.zeros(len(ck), np.int64)
            f = lst = np.full(len(ck), np.nan)
        has = n > 0
        f_i = np.where(has, np.nan_to_num(f, nan=-1), -1) \
            .astype(np.int64)
        l_i = np.where(has, np.nan_to_num(lst, nan=-1), -1) \
            .astype(np.int64)
        return pd.DataFrame({
            "c_custkey": ck,
            "mktsegment": cust["seg"].to_numpy(object),
            "nation": [nmap.get(int(k), "") for k in
                       cust["nkey"].to_numpy(np.int64)],
            "acctbal_cents": cust["tot"].to_numpy(np.int64),
            "n_orders": n,
            "total_cents": tot,
            "avg_order_cents": np.where(has, tot // np.maximum(n, 1),
                                        0).astype(np.int64),
            "first_day": f_i, "last_day": l_i,
            "span_days": np.where(has, l_i - f_i, 0)
            .astype(np.int64)}).astype(cols)

    return _grouped_by_partition(both, ["ckey"], resolve,
                                 n_parts=num_partitions)


def bucketed_join_counts(ds_left, ds_right, out_root, *,
                         left_key: str, right_key: str,
                         n_buckets: int = 16):
    """Hive-style BUCKETED-storage join: both sides are written
    partitioned by bucket = key % n_buckets (one parquet dir per
    bucket), then joined BUCKET-LOCALLY — each bucket's inner join
    runs in ONE task reading only its two bucket directories, with NO
    shuffle at join time.  This is the co-partitioned layout a 100-TB
    warehouse pays for once at write time and amortizes across every
    downstream key join; the per-bucket counts prove the bucket-local
    plan equals the global join.

    -> (bucket, n_left, n_right, n_joined), one row per bucket."""
    import os

    import pandas as pd
    import ray

    left_root = os.path.join(out_root, "left")
    right_root = os.path.join(out_root, "right")

    def write_bucketed(ds, key, root):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df[key].notna()].copy()
            df["bucket"] = (df[key].astype(np.int64) % n_buckets) \
                .astype(np.int64)
            return df
        ds.map_batches(tag, batch_format="pandas") \
            .write_parquet(root, partition_cols=["bucket"])

    write_bucketed(ds_left, left_key, left_root)
    write_bucketed(ds_right, right_key, right_root)

    def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        import glob as _glob

        import pyarrow.parquet as pq
        cols = {"bucket": "int64", "n_left": "int64",
                "n_right": "int64", "n_joined": "int64"}
        out = []
        for b in batch["bucket"]:
            b = int(b)

            def read(root, col):
                files = sorted(_glob.glob(os.path.join(
                    root, f"bucket={b}", "*.parquet")))
                if not files:
                    return pd.Series([], dtype=np.int64)
                t = pd.concat([pq.read_table(f, columns=[col])
                               .to_pandas() for f in files])
                return t[col].astype(np.int64)

            lk = read(left_root, left_key)
            rk = read(right_root, right_key)
            joined = int(rk.map(lk.value_counts()).fillna(0).sum()) \
                if len(lk) and len(rk) else 0
            out.append({"bucket": b, "n_left": len(lk),
                        "n_right": len(rk), "n_joined": joined})
        return pd.DataFrame(out).astype(cols)

    buckets = ray.data.from_pandas(
        pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64)}))
    return buckets.map_batches(join_bucket, batch_format="pandas",
                               batch_size=1)
