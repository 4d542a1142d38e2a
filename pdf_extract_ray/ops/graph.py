"""Distributed graph operators for dedup-cluster resolution.

A crawl-scale near-dup pass (MinHash/SimHash -> verified pairs) leaves a
PAIR LIST; turning pairs into clusters so one canonical doc per cluster
survives is a connected-components problem (the CC-Net / RefinedWeb
dedup shape).  The reference (jrmuizel/pdf-extract) stops at text
extraction, so this whole module is "beyond the reference" training-data
machinery.

Algorithm family: iterative min-label propagation with path halving and
local contraction — the public MapReduce-CC lineage (hash-min /
two-phase style algorithms, e.g. Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014; Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE 2013), re-expressed
as Ray Data joins/groupbys.

Scale design:
- connected_components: iterative min-label propagation expressed as
  Ray Data joins/groupbys.  Per round: one hash join (edges x labels,
  shuffles EDGE-ID PAIRS only — 16 B/edge), one groupby-min over
  candidate labels, then a POINTER-JUMPING self-join (label <- its
  label's label) that halves path lengths, giving O(log diameter)
  rounds instead of O(diameter).  Convergence is detected by the label
  sum (strictly decreasing until fixpoint), a scalar aggregate per
  round.  Labels are materialized once per round — they are O(nodes),
  never O(edges).
- interval_self_join: banded all-pairs within |value diff| <= tol inside
  each group — ONE group-key shuffle, then an in-partition sort +
  two-pointer sweep (O(n log n + output) per group, never a cross
  product).  Partitioning assumption: one group's rows fit in a
  partition (same assumption as ops/relational.asof_join documents; use
  value-bucket salting with boundary overlap if a group outgrows it).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .corpus import _coalesce_nonempty, _default_parts


def connected_components(edges_ds, src: str = "src", dst: str = "dst", *,
                         num_partitions: int | None = None,
                         max_rounds: int = 64,
                         single_task_edges: int = 4_000_000):
    """Connected components over an undirected edge list.

    edges_ds: Dataset with two int64-castable id columns (src, dst).
    Returns a Dataset (node, component) covering every node incident to
    at least one edge (callers union isolated nodes back in if they need
    them); component is the minimum node id reachable.

    Adaptive finish (the greedy_drop_ids residual pattern): after the
    block-local contraction, if the surviving star edges fit one worker
    task (<= single_task_edges int64 pairs, ~64 MB at the default), ONE
    union-find task resolves them exactly and the join/groupby loop is
    skipped — the loop is the at-scale path for contracted graphs that
    are still distributed-sized.
    """
    if num_partitions is None:
        num_partitions = _default_parts()

    def sym(b: pa.Table) -> pa.Table:
        a = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != c
        a, c = a[keep], c[keep]
        return pa.table({"b": np.concatenate([a, c]),
                         "cand": np.concatenate([c, a])})

    def local_star(b: pa.Table) -> pa.Table:
        """Block-local union-find contraction: collapse every component
        visible WITHIN this block to star edges (node <-> local root).
        Components are preserved exactly (within-block transitivity is
        compressed, cross-block edges survive as stars sharing nodes);
        the global iterate then converges in rounds proportional to the
        CONTRACTED graph's diameter — for banded/bucketed dup graphs,
        whose candidate pairs are emitted block-locally, that is 1-3
        rounds instead of O(log component-diameter).  The union-find
        loop is per-edge Python but block-bounded (~64k edges)."""
        if b.num_rows == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "cand": pa.array([], pa.int64())})
        a = b.column("b").to_numpy(zero_copy_only=False)
        c = b.column("cand").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([a, c]), return_inverse=True)
        parent = np.arange(len(nodes))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        half = len(a)
        for i in range(half):
            ra, rc = find(inv[i]), find(inv[half + i])
            if ra != rc:
                # root at the smaller NODE ID (stable across block
                # orderings)
                if nodes[ra] < nodes[rc]:
                    parent[rc] = ra
                else:
                    parent[ra] = rc
        roots = nodes[np.array([find(i) for i in range(len(nodes))])]
        keep = roots != nodes
        n2, r2 = nodes[keep], roots[keep]
        return pa.table({"b": np.concatenate([n2, r2]),
                         "cand": np.concatenate([r2, n2])})

    edges = edges_ds.map_batches(sym, batch_format="pyarrow") \
        .map_batches(local_star, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())}))
    if n_edges <= single_task_edges:
        # bounded single-task finish: all star edges in one block, one
        # exact union-find, labels emitted directly (root = component
        # min by construction — union always parents the larger root)
        def finish(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "component": pa.array([], pa.int64())})
            stars = local_star(b)
            n = stars.column("b").to_numpy(zero_copy_only=False)
            r = stars.column("cand").to_numpy(zero_copy_only=False)
            half = len(n) // 2
            node, comp = n[:half], r[:half]
            roots = np.unique(comp)
            return pa.table({
                "node": np.concatenate([node, roots]),
                "component": np.concatenate([comp, roots])})

        return edges.repartition(1).map_batches(
            finish, batch_format="pyarrow", batch_size=None)

    # nonempty-block guard for the edge side of every round's join
    edge_parts = max(1, min(num_partitions, (n_edges + 65535) // 65536))
    edges = edges.repartition(edge_parts).materialize()

    def with_self(b: pa.Table) -> pa.Table:
        return pa.table({"b": b.column("b"), "cand": b.column("b")})

    def _rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # schema-less empty aggregate block
            return pa.table({"b": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        return pa.table({"b": t.column("b"),
                         "label": t.column(t.column_names[-1])})

    # round 0: label(v) = min(v, neighbors) — the self edge folds the
    # node's own id into the same groupby-min
    cand0 = edges.union(edges.map_batches(with_self, batch_format="pyarrow"))
    labels = (cand0.groupby("b").min("cand")
              .map_batches(_rename, batch_format="pyarrow").materialize())
    # size the per-round label repartition ONCE from the true node count
    # (count() on materialized data is metadata-only); folding the
    # repartition into each round's plan saves a count+reshuffle job per
    # round, and node count is invariant across rounds
    label_parts = max(1, min(num_partitions, (labels.count() + 65535)
                             // 65536))
    labels = labels.repartition(label_parts).materialize()
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        # propagate: for each edge (b, cand), candidate label of b is
        # label(cand); the join shuffles (edge endpoint, 8 B label) only.
        # ONE join per lazy plan (two concurrent hash joins deadlock
        # small sessions — Ray 2.49); labels is materialized between.
        prop = edges.join(
            labels.map_batches(
                lambda t: pa.table({"cand": t.column("b"),
                                    "label": t.column("label")}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=num_partitions,
            on=("cand",)) \
            .map_batches(
                lambda t: pa.table({"b": t.column("b"),
                                    "label": t.column("label")}),
                batch_format="pyarrow")
        labels = (prop.union(labels).groupby("b").min("label")
                  .map_batches(_rename, batch_format="pyarrow")
                  .repartition(label_parts).materialize())

        # pointer jumping: label <- label(label) (path halving; turns
        # O(diameter) propagation rounds into O(log diameter))
        jump = labels.map_batches(
            lambda t: pa.table({"b": t.column("label"),
                                "orig": t.column("b")}),
            batch_format="pyarrow").join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("b",))
        labels = (jump.map_batches(
            lambda t: pa.table({"b": t.column("orig"),
                                "label": t.column("label")}),
            batch_format="pyarrow")
            .repartition(label_parts).materialize())

        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t.column("b"),
                            "component": t.column("label")}),
        batch_format="pyarrow")


def _banded_pairs_part(df: pd.DataFrame, group_cols: list[str],
                       value_col: str, id_col: str, tol: int,
                       keep_group: bool,
                       ghost_col: str | None = None) -> pd.DataFrame:
    """Vectorized banded-pair sweep over a WHOLE partition (many groups
    at once): groups are factorized and encoded into one int64 composite
    key `gid * (value_span + tol + 1) + value`, so consecutive groups
    sit more than `tol` apart and a single global searchsorted window
    can never cross a group boundary — no per-group Python loop.  With
    `ghost_col`, ghost-ghost pairs are dropped (the salted variant's
    exactly-once rule)."""
    def _empty() -> pd.DataFrame:
        out = pd.DataFrame({"id_a": np.empty(0, np.int64),
                            "id_b": np.empty(0, np.int64)})
        if keep_group:
            for g in group_cols:
                out[g] = df[g].iloc[:0]
        return out

    if len(df) == 0:
        return _empty()
    if len(group_cols) == 1:
        gid, _ = pd.factorize(df[group_cols[0]], sort=False)
    else:
        gid, _ = pd.factorize(
            pd.MultiIndex.from_frame(df[group_cols]), sort=False)
    vals = df[value_col].to_numpy().astype(np.int64)
    vmin = int(vals.min())
    span = int(vals.max()) - vmin + tol + 1
    key = gid.astype(np.int64) * span + (vals - vmin)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    ids = df[id_col].to_numpy().astype(np.int64)[order]
    n = len(key_s)
    # for each i, rows j in (i, hi) have key[j] - key[i] <= tol (same
    # group by construction); expand the ragged windows without a loop
    hi = np.searchsorted(key_s, key_s + tol, side="right")
    idx = np.arange(n)
    cnt = np.maximum(hi - idx - 1, 0)
    total = int(cnt.sum())
    if total == 0:
        return _empty()
    left = np.repeat(idx, cnt)
    offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    right = left + 1 + offs
    if ghost_col is not None:
        ghost = df[ghost_col].to_numpy().astype(bool)[order]
        keep = ~(ghost[left] & ghost[right])
        left, right = left[keep], right[keep]
        if not len(left):
            return _empty()
    a, b2 = ids[left], ids[right]
    out = pd.DataFrame({"id_a": np.minimum(a, b2),
                        "id_b": np.maximum(a, b2)})
    if keep_group:
        for g in group_cols:
            out[g] = df[g].to_numpy()[order][left]
    return out


def interval_self_join(ds, group_cols: list[str], value_col: str,
                       id_col: str, *, tol: int, keep_group: bool = False):
    """All pairs (id_a < id_b) within each group whose values differ by
    at most tol -> Dataset (id_a, id_b) (+ the group columns when
    keep_group — edges never cross groups, so each pair has exactly one
    group value).  ONE hash-partition exchange on the group key (the
    adaptive _grouped_by_partition shape: small inputs collapse to one
    task, no sort-exchange fixed cost); within a partition every group
    is swept with the composite-key vectorized window
    (output-sensitive, no cross product, no per-group Python)."""
    from .dedup import _grouped_by_partition

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _banded_pairs_part(df, group_cols, value_col, id_col,
                                  tol, keep_group)

    cols = list(group_cols) + [value_col, id_col]
    return _grouped_by_partition(
        ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow"),
        group_cols, pairs, n_parts=_default_parts())


def interval_self_join_salted(ds, group_cols: list[str], value_col: str,
                              id_col: str, *, tol: int):
    """interval_self_join with VALUE-BUCKET SALTING: identical output,
    but a hot group is split across partitions by value bucket of width
    max(tol, 1), so no partition ever holds a whole group (the
    asof_join_salted lift).  Cross-bucket pairs are covered by emitting
    every row a second time as a GHOST in the next bucket: a bucket's
    partition forms own-own and own-ghost pairs (ghost-ghost pairs are
    the previous bucket's own-own pairs and are skipped), and bucket
    width >= tol guarantees non-adjacent buckets cannot pair — each
    qualifying pair is emitted exactly once, no dedup shuffle."""
    width = max(int(tol), 1)

    def salt(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = v // width
        own = b.append_column("_bucket", pa.array(bucket)) \
               .append_column("_ghost", pa.array(np.zeros(len(v), bool)))
        ghost = b.append_column("_bucket", pa.array(bucket + 1)) \
                 .append_column("_ghost", pa.array(np.ones(len(v), bool)))
        return pa.concat_tables([own, ghost])

    from .dedup import _grouped_by_partition

    salt_cols = list(group_cols) + ["_bucket"]

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # drop ghost-ghost (owned by the previous bucket) and any
        # ghost-own duplicate of an own-own pair (same ids both present
        # as own is impossible — a row is own in exactly one bucket)
        return _banded_pairs_part(df, salt_cols, value_col, id_col,
                                  tol, False, ghost_col="_ghost")

    cols = list(group_cols) + [value_col, id_col]
    return _grouped_by_partition(
        ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow")
          .map_batches(salt, batch_format="pyarrow"),
        salt_cols, pairs, n_parts=_default_parts())


def _node_outdegrees(edges_ds, src: str, dst: str):
    """Shared degree pass for both PageRank variants -> Dataset (node,
    outdeg) covering every node incident to an edge.  Map-side: src
    contributes per-batch partial counts, dst contributes its PER-BATCH
    DISTINCT ids only (np.unique) — the shuffle payload is O(nodes x
    blocks), never one row per edge."""
    from .dedup import _grouped_by_partition

    def deg_rows(b: pa.Table) -> pa.Table:
        s = b.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        sdf = pd.DataFrame({"node": s}).groupby("node").size() \
            .rename("outdeg").reset_index()
        ddf = pd.DataFrame({"node": np.unique(d), "outdeg": 0})
        return pa.Table.from_pandas(pd.concat([sdf, ddf]),
                                    preserve_index=False)

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # empty graph: keep the typed schema
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "outdeg": pd.Series(dtype="int64")})
        g = df.groupby("node", sort=False)["outdeg"].sum()
        return pd.DataFrame({"node": g.index.to_numpy(np.int64),
                             "outdeg": g.to_numpy(np.int64)})

    return _grouped_by_partition(
        edges_ds.map_batches(deg_rows, batch_format="pyarrow"),
        ["node"], deg_merge)


def pagerank(edges_ds, src: str = "src", dst: str = "dst", *,
             damping: float = 0.85, iters: int = 10,
             num_partitions=None, single_task_edges: int = 4_000_000):
    """Distributed PageRank over an (src, dst) edge list (directed;
    pass both directions for an undirected graph) -> (node, rank).

    Power iteration as Ray Data passes: the edge list is projected to
    2 x int64 and pinned once; per iteration the rank vector broadcasts
    via ray.put (8 B/node), each edge block emits per-destination
    contribution partials PRE-SUMMED per block, and the driver streams
    the bounded partials into one bincount (no exchange per
    iteration).  The driver holds only the O(nodes) rank vector —
    edges never leave the object store after the pin.  This targets
    dedup/citation-scale graphs whose NODE set fits a broadcast; for
    node sets beyond that, swap the broadcast for a rank-side hash
    join keyed on src (same contribution kernel).  Dangling mass
    (nodes with no out-edges) redistributes uniformly, matching the
    standard formulation.  Not SQL-oracled (float accumulation order
    differs between engines); tests pin parity against a local numpy
    reference."""
    import ray
    import pyarrow.compute as pc
    from .dedup import _grouped_by_partition

    degs = _node_outdegrees(edges_ds, src, dst).to_pandas()
    if len(degs) == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    nodes = degs["node"].to_numpy(np.int64)
    outdeg = degs["outdeg"].to_numpy(np.int64)
    n = len(nodes)
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    order = np.argsort(nodes)
    nodes, outdeg = nodes[order], outdeg[order]
    rank = np.full(n, 1.0 / n)
    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "s": pc.cast(b.column(src), pa.int64()),
            "d": pc.cast(b.column(dst), pa.int64())}),
        batch_format="pyarrow").materialize()

    if edges.count() <= single_task_edges:
        # ADAPTIVE bounded finish (the bfs_hops/CC pattern): a
        # block-sized edge set runs ALL power iterations in ONE worker
        # task — the same searchsorted + bincount + dangling math, just
        # without `iters` fixed-cost dataset rounds (measured ~3.5 s ->
        # ~1 s warm at sf0.1).  The streamed loop below stays for
        # bigger graphs and is pinned by tests via single_task_edges=0.
        def all_iters(b: pa.Table, _nodes=nodes, _outdeg=outdeg,
                      _n=n) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"node": pa.array(_nodes, pa.int64()),
                                 "rank": pa.array(
                                     np.full(_n, 1.0 / _n))})
            s = b.column("s").to_numpy(zero_copy_only=False)
            d = b.column("d").to_numpy(zero_copy_only=False)
            si = np.searchsorted(_nodes, s)
            di = np.searchsorted(_nodes, d)
            r = np.full(_n, 1.0 / _n)
            for _ in range(int(iters)):
                w = r[si] / _outdeg[si]
                incoming = np.bincount(di, weights=w, minlength=_n)
                dangling = r[_outdeg == 0].sum()
                r = ((1.0 - damping) / _n
                     + damping * (incoming + dangling / _n))
            return pa.table({"node": pa.array(_nodes, pa.int64()),
                             "rank": pa.array(r, pa.float64())})

        return edges.repartition(1).map_batches(
            all_iters, batch_format="pyarrow", batch_size=None)

    for _ in range(int(iters)):
        ref = ray.put(rank)

        def contrib(b: pa.Table, _nodes=nodes, _outdeg=outdeg) -> pa.Table:
            r = ray.get(ref)
            s = b.column("s").to_numpy(zero_copy_only=False)
            d = b.column("d").to_numpy(zero_copy_only=False)
            si = np.searchsorted(_nodes, s)
            w = r[si] / _outdeg[si]
            g = pd.DataFrame({"d": d, "w": w}).groupby("d", sort=False) \
                ["w"].sum()
            return pa.table({
                "node": pa.array(g.index.to_numpy(np.int64)),
                "w": pa.array(g.to_numpy(np.float64), pa.float64())})

        # merge the pre-summed per-block partials on the driver (this
        # variant already holds the O(nodes) rank vector there — see
        # docstring); streaming bincount beats a groupby exchange per
        # iteration by ~2x wall at sf0.1 (A/B: 9-17s -> 4-5s warm)
        incoming = np.zeros(n)
        for b in edges.map_batches(contrib, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows == 0:
                continue
            idx = np.searchsorted(nodes, b.column("node").to_numpy(
                zero_copy_only=False))
            incoming += np.bincount(
                idx, weights=b.column("w").to_numpy(
                    zero_copy_only=False), minlength=n)
        dangling = rank[outdeg == 0].sum()
        rank = ((1.0 - damping) / n
                + damping * (incoming + dangling / n))

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank": pa.array(rank, pa.float64())}))


def pagerank_partitioned(edges_ds, src: str = "src", dst: str = "dst", *,
                         damping: float = 0.85, iters: int = 10,
                         n_parts: int = 32):
    """PageRank without the broadcast rank vector — the scale path for
    node sets too large to ship to every task (pagerank()'s documented
    limit).  Ranks live as a DATASET (node, rank, outdeg) co-partitioned
    with the edges; per iteration:

    1. src-keyed pass: edges union rank rows; each partition maps its
       src ranks onto its edges and emits per-dst contribution partials
       PLUS one row carrying the partition's dangling-rank sum.
    2. a tiny driver merge of the n_parts dangling partials (scalar);
    3. dst-keyed pass: contribution partials union (node, outdeg) rows;
       each partition emits its nodes' new ranks.

    2 bounded partition shuffles per iteration, edge payload 16 B, rank
    payload 24 B/node — nothing is ever O(graph) on the driver.  Tests
    pin agreement with pagerank() (same numpy reference)."""
    import ray
    import pyarrow.compute as pc
    from .dedup import _grouped_by_partition

    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "key": pc.cast(b.column(src), pa.int64()),
            "dst": pc.cast(b.column(dst), pa.int64()),
            "val": pa.array(np.full(b.num_rows, -1.0), pa.float64())}),
        batch_format="pyarrow").materialize()

    # initial state: node set + out-degrees (the shared degree pass)
    state = _node_outdegrees(edges_ds, src, dst).materialize()
    n = state.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    r0 = 1.0 / n
    state = state.map_batches(
        lambda b: b.append_column("rank", pa.array(
            np.full(b.num_rows, r0), pa.float64())),
        batch_format="pyarrow").materialize()

    for _ in range(int(iters)):
        # pass 1 (key = src node): rank rows ride with val >= 0
        rank_rows = state.map_batches(
            lambda b: pa.table({
                "key": b.column("node"),
                "dst": pc.cast(pc.subtract(pa.scalar(0, pa.int64()),
                                           b.column("outdeg")),
                               pa.int64()),
                "val": b.column("rank")}),
            batch_format="pyarrow")

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"node": "int64", "w": "float64", "dang": "bool"}
            if len(df) == 0:
                return pd.DataFrame(columns=list(cols)).astype(cols)
            is_state = df["val"].to_numpy() >= 0.0
            st = df[is_state]
            skeys = st["key"].to_numpy(np.int64)
            svals = st["val"].to_numpy(np.float64)
            sdeg = -st["dst"].to_numpy(np.int64)
            o = np.argsort(skeys)
            skeys, svals, sdeg = skeys[o], svals[o], sdeg[o]
            dangling = float(svals[sdeg == 0].sum())
            e = df[~is_state]
            sk = e["key"].to_numpy(np.int64)
            # vectorized rank/outdeg lookup (every edge's src has its
            # state row in this partition by construction)
            si = np.searchsorted(skeys, sk)
            w = svals[si] / np.maximum(sdeg[si], 1)
            g = pd.DataFrame({"node": e["dst"].to_numpy(np.int64),
                              "w": w}).groupby("node", sort=False) \
                ["w"].sum().reset_index()
            g["dang"] = False
            # dangling mass rides an explicitly FLAGGED row (a node-id
            # sentinel would collide with real ids, e.g. negative ones)
            extra = pd.DataFrame({"node": [0], "w": [dangling],
                                  "dang": [True]})
            return pd.concat([g, extra], ignore_index=True).astype(cols)

        partials = _grouped_by_partition(edges.union(rank_rows), ["key"],
                                         contrib,
                                         n_parts=n_parts).materialize()
        dang = sum(r["w"] for r in partials.map_batches(
            lambda b: b.filter(b.column("dang")).select(["w"]),
            batch_format="pyarrow").take_all())
        incoming = partials.map_batches(
            lambda b: b.filter(pc.equal(b.column("dang"),
                                        pa.scalar(False)))
            .select(["node", "w"]),
            batch_format="pyarrow")

        # pass 2 (key = node): merge incoming with the carried outdeg
        carried = state.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "w": pc.cast(pc.subtract(
                    pa.scalar(-1.0), pc.cast(b.column("outdeg"),
                                             pa.float64())),
                    pa.float64())}),
            batch_format="pyarrow")
        base = (1.0 - damping) / n + damping * dang / n

        def new_rank(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"node": "int64", "outdeg": "int64",
                    "rank": "float64"}
            if len(df) == 0:
                return pd.DataFrame(columns=list(cols)).astype(cols)
            w = df["w"].to_numpy(np.float64)
            is_state = w <= -1.0
            st = df[is_state]
            inc = df[~is_state].groupby("node", sort=False)["w"].sum()
            nodes = st["node"].to_numpy(np.int64)
            outd = (-st["w"].to_numpy(np.float64) - 1.0).astype(np.int64)
            iv = inc.reindex(nodes, fill_value=0.0).to_numpy(np.float64)
            return pd.DataFrame({
                "node": nodes, "outdeg": outd,
                "rank": base + damping * iv}).astype(cols)

        state = _grouped_by_partition(incoming.union(carried), ["node"],
                                      new_rank,
                                      n_parts=n_parts).materialize()

    return state.map_batches(
        lambda b: b.select(["node", "rank"]), batch_format="pyarrow")


def triangle_counts(edges_ds, *, group_cols=(), id_a: str = "id_a",
                    id_b: str = "id_b", broadcast_max_nodes: int = 200_000,
                    single_task_edges: int = 4_000_000):
    """Distributed triangle counting over undirected edges (id_a < id_b)
    -> (group..., n_triangles) (one global row when group_cols is
    empty; edges must not cross groups).

    The Suri-Vassilvitskii / Cohen MapReduce shape: every edge is
    ORIENTED from its lower to its higher endpoint under the total
    order (degree, id) — so each node's out-degree is O(sqrt(m)) and a
    hub node can never fan out quadratically.  Each wedge (v, w) spawned
    at its lowest-ordered corner u matches the oriented edge v->w
    exactly once, so triangles count exactly once with no dedup.

    Stages (all exact integers): (1) degree pass — map-side per-batch
    partial counts, one node-hash merge; (2) orientation — degrees
    attached map-side from a bounded broadcast (<= broadcast_max_nodes
    nodes) or via a node-keyed union-resolve pass (no hash-join actors)
    beyond that; (3) wedges — src-hash partition, in-partition lexsort +
    ragged-window pair expansion (the interval_self_join kernel, no
    per-node loop); (4) membership — wedges and edges TAGGED and
    union-shuffled on (v, w): a partition counts wedge rows whose (v, w)
    also carries an edge row, pre-sums per group, and a trivially small
    final groupby finishes."""
    import ray

    from .dedup import _grouped_by_partition
    gcols = list(group_cols)
    # pin the (possibly expensive) edge lineage once: the degree pass,
    # the orientation pass and the single-task path all re-read it
    edges_ds = edges_ds.materialize()

    def deg_rows(b: pa.Table) -> pa.Table:
        a = b.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"node": np.concatenate([a, d])}) \
            .groupby("node", sort=False).size().reset_index(name="deg")
        return pa.table({"node": pa.array(g["node"].to_numpy(np.int64)),
                         "deg": pa.array(g["deg"].to_numpy(np.int64))})

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"node": "int64", "deg": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("node", sort=False)["deg"].sum()
        return pd.DataFrame({"node": g.index.to_numpy(np.int64),
                             "deg": g.to_numpy(np.int64)})

    deg = _grouped_by_partition(
        edges_ds.map_batches(deg_rows, batch_format="pyarrow"),
        ["node"], deg_merge).materialize()

    if deg.count() == 0:
        import ray as _ray
        cols = {g: pa.array([], pa.string()) for g in gcols}
        cols["n_triangles"] = pa.array([], pa.int64())
        return _ray.data.from_arrow(pa.table(cols))

    def orient_frame(df: pd.DataFrame) -> pd.DataFrame:
        # (deg, id) lexicographic orientation; carries the dst order key
        a = df[id_a].to_numpy(np.int64)
        b = df[id_b].to_numpy(np.int64)
        da = df["_deg_a"].to_numpy(np.int64)
        db = df["_deg_b"].to_numpy(np.int64)
        swap = (db < da) | ((db == da) & (b < a))
        out = pd.DataFrame({
            "src": np.where(swap, b, a),
            "dst": np.where(swap, a, b),
            "dst_deg": np.where(swap, da, db)})
        for g in gcols:
            out[g] = df[g].to_numpy()
        return out

    if deg.count() <= broadcast_max_nodes:
        degmap = {r["node"]: r["deg"] for r in deg.take_all()}
        ref = ray.put(degmap)

        def orient(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            dm = ray.get(ref)
            df["_deg_a"] = df[id_a].map(dm).astype(np.int64)
            df["_deg_b"] = df[id_b].map(dm).astype(np.int64)
            return pa.Table.from_pandas(orient_frame(df),
                                        preserve_index=False)

        oriented = edges_ds.map_batches(orient, batch_format="pyarrow") \
            .materialize()
    else:
        # at-scale path: attach each endpoint's degree with a node-keyed
        # union-resolve (tagged edge + degree rows share one shuffle;
        # the partition merges locally — no hash-join aggregator pool)
        def attach(col, dcol, eds):
            def tag_edges(b: pa.Table) -> pa.Table:
                t = b.to_pandas()
                t["_key"] = t[col].to_numpy(np.int64)
                t["_is_deg"] = False
                t["deg"] = np.int64(0)
                return pa.Table.from_pandas(t, preserve_index=False)

            def tag_deg(b: pa.Table) -> pa.Table:
                return pa.table({
                    "_key": b.column("node"),
                    "_is_deg": pa.array(
                        np.ones(b.num_rows, bool)),
                    "deg": b.column("deg")})

            u = eds.map_batches(tag_edges, batch_format="pyarrow") \
                .union(deg.map_batches(tag_deg, batch_format="pyarrow"))

            def resolve(df: pd.DataFrame) -> pd.DataFrame:
                e = df[~df["_is_deg"]].drop(columns=["_is_deg", "deg"])
                if len(e) == 0:
                    e[dcol] = pd.Series(dtype=np.int64)
                    return e.drop(columns=["_key"], errors="ignore")
                d = df[df["_is_deg"]].set_index("_key")["deg"]
                e[dcol] = e["_key"].map(d).astype(np.int64)
                return e.drop(columns=["_key"])

            return _grouped_by_partition(u, ["_key"], resolve)

        withdeg = attach(id_a, "_deg_a", edges_ds)
        withdeg = attach(id_b, "_deg_b", withdeg)
        oriented = withdeg.map_batches(
            lambda b: pa.Table.from_pandas(orient_frame(b.to_pandas()),
                                           preserve_index=False),
            batch_format="pyarrow").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"v": "int64", "w": "int64", "is_edge": "int64"}
        base = {**cols, **{g: "object" for g in gcols}}
        if len(df) == 0:
            out = pd.DataFrame(columns=list(base))
            return out.astype(cols)
        df = df.sort_values(["src", "dst_deg", "dst"], kind="mergesort")
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        n = len(src)
        seg_start = np.zeros(n, np.int64)
        new_seg = np.empty(n, bool)
        new_seg[0] = True
        new_seg[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_seg)
        seg_end = np.empty(n, np.int64)
        ends = np.append(starts[1:], n)
        seg_end = np.repeat(ends, np.diff(np.append(starts, n)))
        idx = np.arange(n)
        cnt = seg_end - idx - 1
        total = int(cnt.sum())
        if total == 0:
            out = pd.DataFrame(columns=list(base))
            return out.astype(cols)
        left = np.repeat(idx, cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        right = left + 1 + offs
        out = pd.DataFrame({"v": dst[left], "w": dst[right],
                            "is_edge": np.zeros(total, np.int64)})
        for g in gcols:
            out[g] = df[g].to_numpy()[left]
        return out.astype(cols)

    wedge_rows = _grouped_by_partition(oriented, ["src"], wedges)

    def edge_rows_fn(b: pa.Table) -> pa.Table:
        t = b.to_pandas()
        out = pd.DataFrame({"v": t["src"].to_numpy(np.int64),
                            "w": t["dst"].to_numpy(np.int64),
                            "is_edge": np.ones(len(t), np.int64)})
        for g in gcols:
            out[g] = t[g].to_numpy()
        return pa.Table.from_pandas(out, preserve_index=False)

    unioned = wedge_rows.union(
        oriented.map_batches(edge_rows_fn, batch_format="pyarrow"))

    def resolve_tri(df: pd.DataFrame) -> pd.DataFrame:
        cols = {**{g: "object" for g in gcols}, "n_triangles": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(
                {"n_triangles": "int64"})
        g = df.groupby(["v", "w"], sort=False)["is_edge"]
        n_w = g.transform("size") - g.transform("sum")
        has_e = g.transform("max")
        tri = (df["is_edge"] == 0) & (has_e > 0)
        out = df[tri].copy() if gcols else df
        if gcols:
            r = out.groupby(gcols, sort=False, as_index=False).size() \
                .rename(columns={"size": "n_triangles"})
            r["n_triangles"] = r["n_triangles"].astype(np.int64)
            return r
        n = int(tri.sum())
        return pd.DataFrame({"n_triangles": np.array([n], np.int64)})

    # ADAPTIVE bounded finish (the bfs/pagerank pattern): a block-sized
    # oriented edge set runs wedges + membership + the final group sum
    # in ONE task using the SAME kernels, skipping the two remaining
    # partition exchanges.  Distributed path pinned via
    # single_task_edges=0 in tests.
    n_edges_total = oriented.count()
    if n_edges_total <= single_task_edges:
        def tri_task(df: pd.DataFrame) -> pd.DataFrame:
            w = wedges(df)
            e = pd.DataFrame({"v": df["src"].to_numpy(np.int64),
                              "w": df["dst"].to_numpy(np.int64),
                              "is_edge": np.ones(len(df), np.int64)})
            for g in gcols:
                e[g] = df[g].to_numpy()
            return resolve_tri(pd.concat([w, e], ignore_index=True))

        norm = oriented.map_batches(lambda b: b, batch_format="pyarrow",
                                    batch_size=None)
        return norm.map_batches(tri_task, batch_format="pandas",
                                batch_size=max(n_edges_total, 1))

    partials = _grouped_by_partition(unioned, ["v", "w"], resolve_tri)

    from ray.data.aggregate import Sum
    if gcols:
        agg = partials.groupby(gcols).aggregate(Sum("n_triangles"))
    else:
        agg = partials.groupby(None).aggregate(Sum("n_triangles"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {g: b.column(g) for g in gcols}
        cols["n_triangles"] = pc.cast(b.column("sum(n_triangles)"),
                                      pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def bfs_hops(edges_ds, seeds_ds, *, src: str = "src", dst: str = "dst",
             node_col: str = "node", max_hops: int = 6,
             num_partitions: int | None = None,
             single_task_edges: int = 4_000_000):
    """Multi-source BFS hop distances over an undirected edge list ->
    (node_col, hop): the shortest hop count from ANY seed, for every
    node within `max_hops`.  Seeds themselves get hop 0 (even when
    isolated).

    Frontier iteration, bounded by max_hops rounds; per round exactly
    two keyed exchanges and NO join actor pools:
      1. expand — tagged union of (symmetrized edges keyed by src,
         frontier keyed by node): partitions holding a frontier node
         emit its neighbors, pre-deduped per partition;
      2. dedupe-and-filter — tagged union of (known distances,
         candidates) keyed by node keeps only first-visited nodes,
         which become the next frontier.
    Frontier and distance sets are O(nodes); the edge set is
    re-exchanged each round (on a long-lived cluster, pre-partition the
    symmetrized edges by src once and pin them so rounds reuse the
    layout).  Early exit when a frontier drains.

    ADAPTIVE bounded finish (the connected_components pattern): a graph
    whose symmetrized edge set fits one block (<= single_task_edges
    int64 pairs, ~64 MB at the default) runs ALL rounds in ONE task —
    sorted-adjacency searchsorted expansion, identical semantics — and
    skips max_hops x 2 fixed-cost exchanges (measured 6.7 s -> ~1 s at
    sf0.1).  The loop path stays for bigger graphs and is pinned by
    tests via single_task_edges=0.
    """
    import pyarrow.compute as pc
    from .dedup import _grouped_by_partition

    n_parts = num_partitions or _default_parts()

    def sym(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column(src), pa.int64())
        d = pc.cast(b.column(dst), pa.int64())
        return pa.table({
            "key": pa.concat_arrays([a.combine_chunks(),
                                     d.combine_chunks()]),
            "nbr": pa.concat_arrays([d.combine_chunks(),
                                     a.combine_chunks()]),
            "side": pa.array(np.zeros(2 * b.num_rows, np.int64))})

    edges = edges_ds.map_batches(sym, batch_format="pyarrow") \
        .materialize()

    def seed_rows(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column(node_col), pa.int64())
        return pa.table({node_col: n,
                         "hop": pa.array(np.zeros(b.num_rows, np.int64))})

    dist = _grouped_by_partition(
        seeds_ds.map_batches(seed_rows, batch_format="pyarrow"),
        [node_col],
        lambda df: df.drop_duplicates(subset=[node_col]),
        n_parts=n_parts).materialize()
    frontier = dist

    if edges.count() <= single_task_edges:
        # tagged union of edges (side 0) + seeds (side 1) into ONE
        # block; the whole frontier iteration runs in a single task
        seed_tag = dist.map_batches(
            lambda b: pa.table({
                "key": pc.cast(b.column(node_col), pa.int64()),
                "nbr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "side": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow")

        def bfs_task(b: pa.Table) -> pa.Table:
            empty = pa.table({node_col: pa.array([], pa.int64()),
                              "hop": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            side = b.column("side").to_numpy(zero_copy_only=False)
            key = b.column("key").to_numpy(zero_copy_only=False)                 .astype(np.int64)
            nbr = b.column("nbr").to_numpy(zero_copy_only=False)                 .astype(np.int64)
            seeds = np.unique(key[side == 1])
            if not len(seeds):
                return empty
            ek, ev = key[side == 0], nbr[side == 0]
            order = np.argsort(ek, kind="stable")
            ek, ev = ek[order], ev[order]
            known = seeds.copy()  # sorted
            out_nodes = [seeds]
            out_hops = [np.zeros(len(seeds), np.int64)]
            frontier = seeds
            for h in range(max_hops):
                lo = np.searchsorted(ek, frontier, side="left")
                hi = np.searchsorted(ek, frontier, side="right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if tot == 0:
                    break
                starts = np.cumsum(cnt) - cnt
                idx = np.repeat(lo, cnt)                     + (np.arange(tot) - np.repeat(starts, cnt))
                cand = np.unique(ev[idx])
                pos = np.minimum(np.searchsorted(known, cand),
                                 len(known) - 1)
                new = cand[known[pos] != cand]
                if not len(new):
                    break
                out_nodes.append(new)
                out_hops.append(np.full(len(new), h + 1, np.int64))
                known = np.union1d(known, new)
                frontier = new
            return pa.table({
                node_col: pa.array(np.concatenate(out_nodes)),
                "hop": pa.array(np.concatenate(out_hops))})

        return edges.union(seed_tag).repartition(1).map_batches(
            bfs_task, batch_format="pyarrow", batch_size=None)

    for h in range(max_hops):
        f_tag = frontier.map_batches(
            lambda b: pa.table({
                "key": pc.cast(b.column(node_col), pa.int64()),
                "nbr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "side": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow")

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            front = df.loc[df["side"] == 1, "key"].unique()
            m = (df["side"].to_numpy() == 0) \
                & df["key"].isin(front).to_numpy()
            out = df.loc[m, ["nbr"]].drop_duplicates()
            return pd.DataFrame({node_col: out["nbr"].to_numpy(np.int64),
                                 "side": np.ones(len(out), np.int64)})

        cand = _grouped_by_partition(edges.union(f_tag), ["key"], expand,
                                     n_parts=n_parts).materialize()
        if cand.count() == 0:
            break

        d_tag = dist.map_batches(
            lambda b: pa.table({
                node_col: pc.cast(b.column(node_col), pa.int64()),
                "side": pa.array(np.zeros(b.num_rows, np.int64))}),
            batch_format="pyarrow")

        def newly(df: pd.DataFrame, _h=h) -> pd.DataFrame:
            known = df.loc[df["side"] == 0, node_col].unique()
            c = df.loc[df["side"] == 1, node_col].drop_duplicates()
            new = c[~c.isin(known)]
            return pd.DataFrame({node_col: new.to_numpy(np.int64),
                                 "hop": np.full(len(new), _h + 1,
                                                np.int64)})

        frontier = _grouped_by_partition(d_tag.union(cand), [node_col],
                                         newly,
                                         n_parts=n_parts).materialize()
        if frontier.count() == 0:
            break
        dist = dist.union(frontier).materialize()

    return dist


def chain_edges(ds, group_cols: list[str], value_col: str, id_col: str,
                *, num_partitions: int | None = None):
    """Path-graph edge list: each row linked to its successor in
    (value_col, id_col) order within its group -> (id_a, id_b).  One
    group-key exchange, per-group sort + shift (the interval_self_join
    partitioning assumption: one group's rows fit a partition)."""
    from .dedup import _grouped_by_partition

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        df = df.sort_values(group_cols + [value_col, id_col],
                            kind="mergesort")
        ids = df[id_col].to_numpy().astype(np.int64)
        gkey = pd.util.hash_pandas_object(
            df[group_cols], index=False).to_numpy()
        same = np.concatenate((gkey[1:] == gkey[:-1], [False]))
        return pd.DataFrame({"id_a": ids[:-1][same[:-1]]
                             if len(ids) else np.empty(0, np.int64),
                             "id_b": ids[1:][same[:-1]]
                             if len(ids) else np.empty(0, np.int64)})

    cols = list(group_cols) + [value_col, id_col]
    return _grouped_by_partition(
        ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow"),
        list(group_cols), pairs,
        n_parts=num_partitions or _default_parts())


def kcore_nodes(edges_ds, *, k: int, src: str = "src", dst: str = "dst",
                node_col: str = "node",
                num_partitions: int | None = None,
                single_task_edges: int = 4_000_000,
                max_rounds: int = 100):
    """k-core decomposition membership: the maximal subgraph in which
    every node has >= k DISTINCT neighbors -> (node_col, core_deg)
    with core_deg = the node's degree inside the core.  The classic
    peeling fixpoint (repeatedly delete nodes of degree < k) — spam /
    boilerplate link-farm detection on the doc-similarity graph.

    Per round: ONE keyed degree pass over the surviving symmetrized
    edge set, then the dropped-node set is removed from both endpoint
    columns via the adaptive drop (bounded broadcast when small,
    left_anti hash join at scale — ops/dedup.drop_rows_by_id).  Rounds
    are data-bounded: each round deletes at least one node or
    terminates.  Self-loops are discarded and parallel edges deduped
    up front, so degree = distinct-neighbor count.

    ADAPTIVE bounded finish (the connected_components pattern): a
    symmetrized edge set that fits one block (<= single_task_edges)
    peels ALL rounds in one task with bincount degrees — identical
    semantics, none of the per-round exchange fixed cost; the loop
    path is pinned by tests via single_task_edges=0."""
    import ray
    from .dedup import _grouped_by_partition

    n_parts = num_partitions or _default_parts()
    empty = pa.table({node_col: pa.array([], pa.int64()),
                      "core_deg": pa.array([], pa.int64())})

    def sym(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column(src), pa.int64()).combine_chunks()
        d = pc.cast(b.column(dst), pa.int64()).combine_chunks()
        key = pa.concat_arrays([a, d])
        nbr = pa.concat_arrays([d, a])
        ka = key.to_numpy(zero_copy_only=False)
        na = nbr.to_numpy(zero_copy_only=False)
        keep = ka != na  # self-loops contribute no peeling degree
        return pa.table({"key": pa.array(ka[keep]),
                         "nbr": pa.array(na[keep])})

    # dedupe parallel edges once: (key, nbr) distinct via one keyed pass
    edges = _grouped_by_partition(
        edges_ds.map_batches(sym, batch_format="pyarrow"),
        ["key"], lambda df: df.drop_duplicates(subset=["key", "nbr"]),
        n_parts=n_parts).materialize()

    def _peel_all(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({node_col: np.empty(0, np.int64),
                                 "core_deg": np.empty(0, np.int64)})
        key = df["key"].to_numpy(np.int64)
        nbr = df["nbr"].to_numpy(np.int64)
        while True:
            if not len(key):
                return pd.DataFrame({node_col: np.empty(0, np.int64),
                                     "core_deg": np.empty(0, np.int64)})
            uniq, inv = np.unique(key, return_inverse=True)
            deg = np.bincount(inv)
            good = uniq[deg >= k]
            if len(good) == len(uniq):
                return pd.DataFrame({
                    node_col: uniq,
                    "core_deg": deg.astype(np.int64)})
            in_good_k = good[np.clip(np.searchsorted(good, key), 0,
                                     max(len(good) - 1, 0))] == key \
                if len(good) else np.zeros(len(key), bool)
            in_good_n = good[np.clip(np.searchsorted(good, nbr), 0,
                                     max(len(good) - 1, 0))] == nbr \
                if len(good) else np.zeros(len(key), bool)
            keep = in_good_k & in_good_n
            key, nbr = key[keep], nbr[keep]

    if edges.count() <= single_task_edges:
        out = edges.repartition(1).map_batches(
            _peel_all, batch_format="pandas", batch_size=None)
        return out.map_batches(
            lambda t: t if t.num_rows or t.column_names else empty,
            batch_format="pyarrow")

    for _ in range(max_rounds):
        def degs(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("key", sort=False, as_index=False) \
                .agg(deg=("nbr", "size"))
            return g

        deg_ds = _grouped_by_partition(edges, ["key"], degs,
                                       n_parts=n_parts).materialize()
        bad = deg_ds.map_batches(
            lambda b: pa.table({"doc_id": pc.cast(
                b.filter(pc.less(b.column("deg"), k)).column("key"),
                pa.int64())}),
            batch_format="pyarrow").materialize()
        if bad.count() == 0:
            return deg_ds.map_batches(
                lambda b: pa.table({
                    node_col: pc.cast(b.column("key"), pa.int64()),
                    "core_deg": pc.cast(b.column("deg"), pa.int64())})
                if b.num_rows else empty,
                batch_format="pyarrow")
        edges = _kcore_drop(edges, bad).materialize()
        if edges.count() == 0:
            return ray.data.from_arrow(empty)
    raise RuntimeError(f"kcore_nodes: no fixpoint in {max_rounds} rounds")


def _kcore_drop(edges, bad):
    """Remove edges with EITHER endpoint in `bad` (doc_id column) via
    the adaptive drop: key-side first, then neighbor-side with the
    columns swapped so drop_rows_by_id's id_col contract is reused."""
    from .dedup import drop_rows_by_id

    keyed = drop_rows_by_id(
        edges.map_batches(
            lambda t: pa.table({"doc_id": t.column("key"),
                                "nbr": t.column("nbr")}),
            batch_format="pyarrow"), bad)
    swapped = drop_rows_by_id(
        keyed.map_batches(
            lambda t: pa.table({"doc_id": t.column("nbr"),
                                "nbr": t.column("doc_id")}),
            batch_format="pyarrow"), bad)
    return swapped.map_batches(
        lambda t: pa.table({"key": t.column("nbr"),
                            "nbr": t.column("doc_id")}),
        batch_format="pyarrow")


def degree_histogram(edges_ds, *, src: str = "src", dst: str = "dst"):
    """Degree-distribution histogram of an undirected simple graph:
    symmetrize, drop self-loops, dedupe parallel edges, count each
    node's distinct neighbors, then histogram the degrees ->
    (degree, n_nodes) sorted by degree.  The standard first look at a
    web/link graph (power-law check, hub detection threshold pick).

    Scale shape: symmetrize + dedupe map-side; ONE key-hash partition
    pass both dedupes globally (every copy of a key's edges lands in
    one partition, so global distinct == partition-local distinct) AND
    counts that key's neighbors — then only (degree) singles flow into
    a tiny histogram groupby whose key space is bounded by the max
    degree.  No second full-edge exchange, no driver-side edge list.
    Partitioning assumption: one node's neighbor list fits a partition
    (true up to ~100M-degree hubs at 16 B/edge; cap or sample beyond)."""
    from ray.data.aggregate import Count

    from .dedup import _grouped_by_partition

    def sym(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(src), pa.int64())
        d = pc.cast(b.column(dst), pa.int64())
        t = pa.table({"key": pa.concat_arrays([
                          pa.array(s.to_numpy(zero_copy_only=False)),
                          pa.array(d.to_numpy(zero_copy_only=False))]),
                      "nbr": pa.concat_arrays([
                          pa.array(d.to_numpy(zero_copy_only=False)),
                          pa.array(s.to_numpy(zero_copy_only=False))])})
        keep = pc.not_equal(t.column("key"), t.column("nbr"))
        # map-side dedupe shrinks the exchange (parallel edges collapse
        # per block before the shuffle)
        return t.filter(keep).group_by(["key", "nbr"]).aggregate([])

    def degrees(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"degree": pd.Series([], dtype=np.int64)})
        d = df.drop_duplicates(["key", "nbr"]).groupby(
            "key", sort=False).size()
        return pd.DataFrame({"degree": d.to_numpy(np.int64)})

    deg = _grouped_by_partition(
        edges_ds.map_batches(sym, batch_format="pyarrow"),
        ["key"], degrees)
    hist = deg.groupby("degree").aggregate(Count())
    out = hist.map_batches(
        lambda b: pa.table({
            "degree": pc.cast(b.column("degree"), pa.int64()),
            "n_nodes": pc.cast(b.column("count()"), pa.int64())}),
        batch_format="pyarrow")
    return out.sort("degree")


def common_neighbor_pairs(edges_ds, *, min_common: int = 2,
                          src: str = "src", dst: str = "dst",
                          max_degree: int = 8192,
                          num_partitions: int = 32):
    """Link prediction / structural-similarity mining on an undirected
    simple graph: for every unordered node pair (a < b) sharing at
    least `min_common` distinct neighbors -> (a, b, common,
    jaccard_ppm) where jaccard_ppm = common * 1e6 // (deg_a + deg_b -
    common) — the common-neighbors score and the neighborhood-Jaccard
    coefficient in exact integers (no float can reorder the ranking
    vs the SQL self-join oracle).

    Scale shape: symmetrize + map-side dedupe (the degree_histogram
    discipline), then ONE neighbor-keyed partition pass that both
    dedupes each neighborhood globally AND emits its C(k,2) candidate
    pairs fully vectorized (size-class reshape + triu gather — no
    per-node Python loop) PLUS that node's exact degree as a marker
    row (b = -1; a node's whole neighborhood lives in one partition,
    so its degree needs no second exchange).  Partials fold per
    partition (hash groupby), so the only pair-weight exchange is
    bounded by distinct-pairs-per-partition, then one keyed Sum
    merges them.  Degrees (bounded by node count) broadcast into the
    finishing map — no join on the pair stream.

    Node ids must be non-negative (degree marker rows use b = -1).

    Hub guard: neighborhoods larger than `max_degree` are SKIPPED for
    pair emission (a 1M-degree hub would emit 5e11 pairs); their
    degree rows still flow, so Jaccard stays exact for pairs emitted
    by smaller shared neighbors.  At web scale, salt or sample hubs
    upstream instead of raising the cap."""
    from .dedup import _grouped_by_partition

    def sym(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(src), pa.int64())
        d = pc.cast(b.column(dst), pa.int64())
        t = pa.table({"key": pa.concat_arrays([
                          pa.array(s.to_numpy(zero_copy_only=False)),
                          pa.array(d.to_numpy(zero_copy_only=False))]),
                      "nbr": pa.concat_arrays([
                          pa.array(d.to_numpy(zero_copy_only=False)),
                          pa.array(s.to_numpy(zero_copy_only=False))])})
        keep = pc.not_equal(t.column("key"), t.column("nbr"))
        return t.filter(keep).group_by(["key", "nbr"]).aggregate([])

    empty_t = pa.table({"a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "common": pa.array([], pa.int64()),
                        "jaccard_ppm": pa.array([], pa.int64())})

    rows = edges_ds.map_batches(sym, batch_format="pyarrow")

    def pairs_and_degrees(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        key = df["key"].to_numpy(np.int64)
        nbr = df["nbr"].to_numpy(np.int64)
        order = np.lexsort((nbr, key))
        k, v = key[order], nbr[order]
        keep = np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
        k, v = k[keep], v[keep]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.r_[starts, k.size])
        deg = pd.DataFrame({"a": k[starts], "b": np.int64(-1),
                            "n": sizes.astype(np.int64)})
        pa_, pb_ = [], []
        for g in np.unique(sizes):
            if g < 2 or g > max_degree:
                continue
            grp = v[starts[sizes == g][:, None] + np.arange(g)]
            ii, jj = np.triu_indices(int(g), 1)
            pa_.append(grp[:, ii].ravel())
            pb_.append(grp[:, jj].ravel())
        if not pa_:
            return deg.astype(cols)
        aa = np.concatenate(pa_)
        bb = np.concatenate(pb_)
        if v.size and int(v.max()) < (1 << 31):
            # fold duplicates via ONE packed-int64 unique (ids < 2^31
            # by the documented non-negative contract; measured ~3x
            # the pandas hash-groupby on dense graphs)
            packed, cnt = np.unique(aa * np.int64(1 << 31) + bb,
                                    return_counts=True)
            pairs = pd.DataFrame({"a": packed >> 31,
                                  "b": packed & np.int64((1 << 31) - 1),
                                  "n": cnt.astype(np.int64)})
        else:
            pairs = pd.DataFrame({"a": aa, "b": bb, "n": np.int64(1)}) \
                .groupby(["a", "b"], sort=False, as_index=False) \
                .agg(n=("n", "sum"))
        return pd.concat([deg, pairs], ignore_index=True).astype(cols)

    partials = _grouped_by_partition(rows, ["key"], pairs_and_degrees,
                                     n_parts=num_partitions)

    # merge partials with a hash-partitioned pandas pass, NOT the native
    # two-key sort aggregate (measured 156 s vs 0.1 s on a 66k-key
    # single-block input — the weighted_median pathology)
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        return df.groupby(["a", "b"], sort=False, as_index=False) \
            .agg(n=("n", "sum")).astype(cols)

    agg = _grouped_by_partition(partials, ["a", "b"], merge,
                                n_parts=num_partitions).materialize()
    if agg.count() == 0:
        import ray
        return ray.data.from_arrow(empty_t)

    deg_rows = agg.map_batches(
        lambda b: b.filter(pc.equal(b.column("b"), -1)),
        batch_format="pyarrow").take_all()
    deg_nodes = np.array([r["a"] for r in deg_rows], np.int64)
    deg_vals = np.array([int(r["n"]) for r in deg_rows], np.int64)
    o = np.argsort(deg_nodes)
    deg_nodes, deg_vals = deg_nodes[o], deg_vals[o]

    def finish(b: pa.Table) -> pa.Table:
        bb = pc.cast(b.column("b"), pa.int64()).to_numpy(
            zero_copy_only=False)
        n = pc.cast(b.column("n"), pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (bb >= 0) & (n >= min_common)
        if not keep.any():
            return empty_t
        a = pc.cast(b.column("a"), pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        bb, n = bb[keep], n[keep]
        da = deg_vals[np.searchsorted(deg_nodes, a)]
        db = deg_vals[np.searchsorted(deg_nodes, bb)]
        union = da + db - n
        jac = np.where(union > 0, n * 1_000_000 // np.maximum(union, 1),
                       -1)
        return pa.table({"a": pa.array(a), "b": pa.array(bb),
                         "common": pa.array(n),
                         "jaccard_ppm": pa.array(jac.astype(np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow")


def hits(edges_ds, src: str = "src", dst: str = "dst", *,
         iters: int = 20, single_task_edges: int = 4_000_000):
    """HITS hubs & authorities over a DIRECTED (src, dst) edge list ->
    (node, hub, authority), L1-normalized each half-step (Kleinberg's
    power iteration).  The link-farm / mutual-reinforcement companion
    to pagerank: authorities concentrate on heavily-pointed-to pages,
    hubs on pages pointing at many authorities.

    Scale shape mirrors pagerank: edges are projected to 2 x int64 and
    pinned once; per half-step the current vector broadcasts via
    ray.put (8 B/node), each edge block emits PRE-SUMMED per-endpoint
    contribution partials (bincount per block), and the driver merges
    the bounded partials — the driver holds only the O(nodes) vectors,
    edges never move after the pin.  Block-sized graphs take the
    adaptive bounded finish (ALL iterations in ONE worker task — the
    bfs/pagerank/CC pattern); the streamed loop below is the at-scale
    path, pinned by tests via single_task_edges=0.  Not SQL-oracled
    (iterative float); tests pin parity against a local numpy
    reference and loop-vs-finish agreement."""
    import ray

    degs = _node_outdegrees(edges_ds, src, dst).to_pandas()
    if len(degs) == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64())}))
    nodes = np.sort(degs["node"].to_numpy(np.int64))
    n = len(nodes)

    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "s": pc.cast(b.column(src), pa.int64()),
            "d": pc.cast(b.column(dst), pa.int64())}),
        batch_format="pyarrow").materialize()

    def _steps(si, di, _n, _iters):
        h = np.full(_n, 1.0 / _n)
        a = np.full(_n, 1.0 / _n)
        for _ in range(int(_iters)):
            a = np.bincount(di, weights=h[si], minlength=_n)
            tot = a.sum()
            a = a / tot if tot > 0 else np.full(_n, 1.0 / _n)
            h = np.bincount(si, weights=a[di], minlength=_n)
            tot = h.sum()
            h = h / tot if tot > 0 else np.full(_n, 1.0 / _n)
        return h, a

    if edges.count() <= single_task_edges:
        def all_iters(b: pa.Table, _nodes=nodes, _n=n) -> pa.Table:
            if b.num_rows == 0:
                flat = np.full(_n, 1.0 / _n)
                return pa.table({"node": pa.array(_nodes, pa.int64()),
                                 "hub": pa.array(flat),
                                 "authority": pa.array(flat)})
            si = np.searchsorted(_nodes,
                                 b.column("s").to_numpy(
                                     zero_copy_only=False))
            di = np.searchsorted(_nodes,
                                 b.column("d").to_numpy(
                                     zero_copy_only=False))
            h, a = _steps(si, di, _n, iters)
            return pa.table({"node": pa.array(_nodes, pa.int64()),
                             "hub": pa.array(h, pa.float64()),
                             "authority": pa.array(a, pa.float64())})

        return edges.repartition(1).map_batches(
            all_iters, batch_size=None, batch_format="pyarrow")

    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)

    def _half_step(vec, from_col, to_col):
        ref = ray.put(vec)

        def contrib(b: pa.Table, _nodes=nodes, _n=n) -> pa.Table:
            v = ray.get(ref)
            fi = np.searchsorted(_nodes, b.column(from_col).to_numpy(
                zero_copy_only=False))
            ti = np.searchsorted(_nodes, b.column(to_col).to_numpy(
                zero_copy_only=False))
            out = np.bincount(ti, weights=v[fi], minlength=_n)
            nz = np.flatnonzero(out)
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "w": pa.array(out[nz], pa.float64())})

        acc = np.zeros(n)
        for batch in edges.map_batches(
                contrib, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            acc[batch.column("i").to_numpy(zero_copy_only=False)] += \
                batch.column("w").to_numpy(zero_copy_only=False)
        tot = acc.sum()
        return acc / tot if tot > 0 else np.full(n, 1.0 / n)

    for _ in range(int(iters)):
        a = _half_step(h, "s", "d")
        h = _half_step(a, "d", "s")

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "hub": pa.array(h, pa.float64()),
        "authority": pa.array(a, pa.float64())}))


def degree_assortativity(edges_ds, a_col: str = "id_a",
                         b_col: str = "id_b", *, n_parts: int = 16):
    """Degree assortativity coefficient: the Pearson correlation of
    (deg(src), deg(dst)) over the DIRECTED orientation set (each
    undirected edge counted both ways — the standard Newman r).
    EXACT integer moments end to end; the single float formula mirrors
    the oracle's expression tree.  -> one row (n_directed, r).

    Scale shape: degrees = one node-keyed pass over exploded
    endpoints; degree ATTACHMENT avoids any broadcast of the (node ->
    degree) table via TWO tagged-union keyed passes (the
    revenue_by_nation pattern): edges keyed by src pick up deg(src)
    inside the partition, re-key by dst, pick up deg(dst), emit
    integer moment partials.  No joins, no driver-side node table."""
    import math

    from .dedup import _grouped_by_partition

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "dst": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        a = df[a_col].astype(np.int64).to_numpy()
        b = df[b_col].astype(np.int64).to_numpy()
        return pd.DataFrame({"src": np.r_[a, b],
                             "dst": np.r_[b, a]}).astype(cols)

    directed = edges_ds.map_batches(orient, batch_format="pandas") \
        .materialize()

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["deg"] = np.int64(-1)  # -1 marks an edge row
        return df[["src", "dst", "deg"]]

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "dst": "int64", "deg": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("src", as_index=False).size()
        # degree row: dst = -1 sentinel, deg = out-degree(src) partial
        return pd.DataFrame({"src": g["src"].astype(np.int64),
                             "dst": np.int64(-1),
                             "deg": g["size"].astype(np.int64)}) \
            .astype(cols)

    tagged1 = directed.map_batches(tag_edges, batch_format="pandas") \
        .union(directed.map_batches(deg_partial,
                                    batch_format="pandas"))

    def attach_src(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "dst": "int64", "deg_src": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        degs = df[df["dst"] == -1].groupby("src")["deg"].sum()
        e = df[df["dst"] != -1]
        return pd.DataFrame({
            "src": e["src"].astype(np.int64),
            "dst": e["dst"].astype(np.int64),
            "deg_src": e["src"].map(degs).fillna(0)
            .astype(np.int64)}).astype(cols)

    with_src = _grouped_by_partition(tagged1, ["src"], attach_src,
                                     n_parts=n_parts).materialize()

    def tag_edges2(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"dst": df["dst"].astype(np.int64),
                             "deg_src": df["deg_src"]
                             .astype(np.int64),
                             "deg": np.int64(-1)})

    def deg_partial2(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"dst": "int64", "deg_src": "int64", "deg": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("src", as_index=False).size()
        return pd.DataFrame({"dst": g["src"].astype(np.int64),
                             "deg_src": np.int64(-1),
                             "deg": g["size"].astype(np.int64)}) \
            .astype(cols)

    tagged2 = with_src.map_batches(tag_edges2, batch_format="pandas") \
        .union(directed.map_batches(deg_partial2,
                                    batch_format="pandas"))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": "int64", "sx": "int64", "sy": "int64",
                "sxx": "int64", "syy": "int64", "sxy": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        degs = df[df["deg"] != -1].groupby("dst")["deg"].sum()
        e = df[df["deg"] == -1]
        if len(e) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        x = e["deg_src"].astype(np.int64).to_numpy()
        y = e["dst"].map(degs).fillna(0).astype(np.int64).to_numpy()
        return pd.DataFrame({
            "n": [len(e)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())],
            "sxy": [int((x * y).sum())]})

    rows = _grouped_by_partition(tagged2, ["dst"], moments,
                                 n_parts=n_parts).take_all()
    out_cols = {"n_directed": "int64", "r": "float64"}
    n = sum(int(r["n"]) for r in rows)
    if n < 2:
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
    r = float(n * sxy - sx * sy) \
        / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    return pd.DataFrame({"n_directed": [n], "r": [r]}) \
        .astype(out_cols)
