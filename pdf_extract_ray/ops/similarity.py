"""Similarity search over an embedding column (Ray Data native).

- brute_force_topk: baseline ANN — numpy matmul per batch against a
  broadcast query matrix (`ray.put` once, read per task), local top-k per
  batch, tiny global merge.  Scales linearly; no shuffle.
- lsh_topk: scale path — random-hyperplane LSH bucketing; each query only
  scans candidate buckets.  Same output contract for bucketed recall.
- cosine_neardup_pairs: embedding near-duplicate detection via the same
  LSH buckets + exact cosine verify within bucket.
"""
from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

import pyarrow.compute as pc

import numpy as np
import pyarrow as pa


def _stack(batch_col) -> np.ndarray:
    """Embedding column -> (n, d) float64.  Null embeddings become zero
    vectors (cosine 0 against everything — never a neighbor, never a
    centroid contribution beyond the count) so crawl-grade gaps cannot
    crash the vector ops; _normalize already guards zero norms."""
    rows = batch_col.to_pylist()
    dim = next((len(r) for r in rows if r is not None), 0)
    if any(r is None for r in rows):
        rows = [([0.0] * dim if r is None else r) for r in rows]
    return np.asarray(rows, dtype=np.float64) if rows \
        else np.empty((0, dim), np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _empty_topk() -> pa.Table:
    """Typed empty (query_id, neighbor_id, rank) result — the ANN ops
    are total on empty corpora / empty query sets (empty partitions are
    routine at scale; Ray blocks lose their schema otherwise)."""
    return pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64()),
         pa.array([], pa.int64())],
        names=["query_id", "neighbor_id", "rank"])


def brute_force_topk(ds, query_ids: List[int], query_vecs: np.ndarray,
                     k: int = 10, exclude_self: bool = True):
    """-> pa.Table (query_id, neighbor_id, rank); rank 1 = most similar.

    Per-batch partial top-k (k candidates per query per batch) then a
    driver-side merge of the small candidate set: the full corpus never
    leaves the workers, only (n_batches x n_query x k) rows do.
    """
    import ray
    if len(query_ids) == 0:
        return _empty_topk()
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)
    qid_set = set(query_ids) if exclude_self else frozenset()

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = qm @ vecs.T  # (n_query, n_batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in idx:
                out_q.append(qi)
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int32()), pa.array(out_n, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["q_idx", "neighbor_id", "cos_sim"])

    candidates = ds.map_batches(partial, batch_format="pyarrow")
    # global merge: tiny result set, safe to take_all
    best: List[List[Tuple[float, int]]] = [[] for _ in query_ids]
    for b in candidates.iter_batches(batch_format="pyarrow"):
        for qi, nid, s in zip(b.column("q_idx").to_pylist(),
                              b.column("neighbor_id").to_pylist(),
                              b.column("cos_sim").to_pylist()):
            if exclude_self and nid == query_ids[qi]:
                continue
            heapq.heappush(best[qi], (s, -nid))
            if len(best[qi]) > k:
                heapq.heappop(best[qi])
    out_q, out_n, out_r = [], [], []
    for qi, qid in enumerate(query_ids):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, neg_nid) in enumerate(ranked, start=1):
            out_q.append(qid)
            out_n.append(-neg_nid)
            out_r.append(rank)
    return pa.Table.from_arrays(
        [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
         pa.array(out_r, pa.int64())],
        names=["query_id", "neighbor_id", "rank"])


def min_k_rows(ds, key: str, k: int) -> pa.Table:
    """Rows holding the k smallest `key` values WITHOUT a global sort:
    each batch emits its local k-minimum rows (a map), the driver merges
    the tiny n_blocks x k candidate set.  Result sorted by `key`."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(key).to_pylist())
        idx = np.argsort(keys, kind="stable")[:k]
        return batch.take(pa.array(idx))

    cands = ds.map_batches(partial, batch_format="pyarrow")
    batches = list(cands.iter_batches(batch_format="pyarrow"))
    if not batches:  # empty corpus: typed empty via the dataset schema
        sch = ds.schema()
        return getattr(sch, "base_schema", sch).empty_table()
    merged = pa.concat_tables(batches)
    keys = np.asarray(merged.column(key).to_pylist())
    idx = np.argsort(keys, kind="stable")[:k]
    return merged.take(pa.array(idx))


def label_centroids(ds, *, dim: int) -> pa.Table:
    """Mean embedding per label -> (label, dim_idx, mean_e6) with the
    mean scaled to integer micro-units for exact comparison.  Map-side
    combine: each batch reduces to one (sum-vector, count) per label; the
    driver merges the tiny per-label partials (n_labels x n_blocks)."""
    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        vecs = _stack(batch.column("embedding"))
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(vecs[m].sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "vsum": pa.array(out_s, pa.list_(pa.float64())),
            "n": pa.array(out_n, pa.int64())})

    sums: dict = {}
    counts: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for lab, vs, n in zip(b.column("label").to_pylist(),
                              b.column("vsum").to_pylist(),
                              b.column("n").to_pylist()):
            if lab in sums:
                sums[lab] = sums[lab] + np.asarray(vs)
                counts[lab] += n
            else:
                sums[lab] = np.asarray(vs)
                counts[lab] = n
    out_l, out_d, out_m = [], [], []
    for lab in sorted(sums):
        mean = sums[lab] / counts[lab]
        for d in range(dim):
            out_l.append(lab)
            out_d.append(d)
            out_m.append(int(np.rint(mean[d] * 1e6)))
    return pa.table({"label": pa.array(out_l, pa.int32()),
                     "dim_idx": pa.array(out_d, pa.int64()),
                     "mean_e6": pa.array(out_m, pa.int64())})


class HyperplaneLSH:
    """Random-hyperplane signatures: n_bits sign bits -> bucket id."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_bits, dim))

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        out = np.zeros(len(vecs), dtype=np.int64)
        for i in range(signs.shape[1]):
            out = (out << 1) | signs[:, i].astype(np.int64)
        return out


class Bucketer:
    """LSH bucket-column stage (planes built once per instance)."""

    def __init__(self, dim: int, n_bits: int):
        self.lsh = HyperplaneLSH(dim, n_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_stack(batch.column("embedding")))
        buckets = self.lsh.bucket(vecs)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def lsh_bucketed(ds, *, dim: int, n_bits: int = 10, concurrency=None):
    """Attach an LSH `bucket` column; downstream groupby('bucket') gives
    co-candidate partitions for near-dup / candidate generation.  Task
    compute by default; explicit `concurrency` opts into an actor pool."""
    if concurrency is not None:
        return ds.map_batches(Bucketer,
                              fn_constructor_kwargs={"dim": dim, "n_bits": n_bits},
                              batch_format="pyarrow", concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(Bucketer, dim=dim, n_bits=n_bits)(batch)
    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_topk(ds, query_ids: List[int], query_vecs: np.ndarray, *, dim: int,
             k: int = 10, n_bits: int = 8, probe_hamming: int = 1):
    """Scale-path ANN: hyperplane-LSH bucketing + multi-probe.

    Each query scans only the corpus rows whose bucket is within
    `probe_hamming` bit flips of the query's bucket (multi-probe LSH), so
    the per-query work drops from O(corpus) to O(corpus / 2^n_bits *
    n_probes).  Candidate buckets are broadcast as a filter; the scan is
    the same batched matmul as brute force.  Approximate: recall depends
    on n_bits/probe_hamming (documented; the brute-force operator is the
    exact baseline)."""
    import ray
    if len(query_ids) == 0:
        return _empty_topk()
    lsh = HyperplaneLSH(dim, n_bits)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_buckets = lsh.bucket(q)
    probe: set = set()
    for b in q_buckets:
        probe.add(int(b))
        if probe_hamming >= 1:
            for bit in range(n_bits):
                probe.add(int(b) ^ (1 << bit))
    probe_ref = ray.put(probe)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        from ..util import task_udf
        probe_set = ray.get(probe_ref)
        qm = ray.get(q_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        # warm-worker singleton: planes built once per worker, not per batch
        buckets = task_udf(HyperplaneLSH, dim=dim, n_bits=n_bits).bucket(vecs)
        mask = np.fromiter((int(b) in probe_set for b in buckets),
                           dtype=bool, count=len(buckets))
        if not mask.any():
            return pa.Table.from_arrays(
                [pa.array([], pa.int32()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["q_idx", "neighbor_id", "cos_sim"])
        vecs = vecs[mask]
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)[mask]
        sims = qm @ vecs.T
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in idx:
                out_q.append(qi)
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int32()), pa.array(out_n, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["q_idx", "neighbor_id", "cos_sim"])

    candidates = ds.map_batches(partial, batch_format="pyarrow")
    best: List[List[Tuple[float, int]]] = [[] for _ in query_ids]
    for b in candidates.iter_batches(batch_format="pyarrow"):
        for qi, nid, s in zip(b.column("q_idx").to_pylist(),
                              b.column("neighbor_id").to_pylist(),
                              b.column("cos_sim").to_pylist()):
            if nid == query_ids[qi]:
                continue
            heapq.heappush(best[qi], (s, -nid))
            if len(best[qi]) > k:
                heapq.heappop(best[qi])
    out_q, out_n, out_r = [], [], []
    for qi, qid in enumerate(query_ids):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, neg_nid) in enumerate(ranked, start=1):
            out_q.append(qid)
            out_n.append(-neg_nid)
            out_r.append(rank)
    return pa.Table.from_arrays(
        [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
         pa.array(out_r, pa.int64())],
        names=["query_id", "neighbor_id", "rank"])


class MultiTableBucketer:
    """Emit (table, bucket, vec_id, embedding) rows for `n_tables`
    independent hyperplane tables (seeds 42, 43, ...).  More tables =
    higher near-dup recall at higher n_bits; built once per worker via
    task_udf."""

    def __init__(self, dim: int, n_bits: int, n_tables: int):
        self.lshs = [HyperplaneLSH(dim, n_bits, seed=42 + t)
                     for t in range(n_tables)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_stack(batch.column("embedding")))
        n = len(vecs)
        tabs, out = [], []
        for t, lsh in enumerate(self.lshs):
            tabs.append(np.full(n, t, dtype=np.int32))
            out.append(lsh.bucket(vecs))
        nt = len(self.lshs)
        rep = pa.concat_tables([batch.select(["vec_id", "embedding"])] * nt)
        return pa.table({
            "table": pa.array(np.concatenate(tabs), pa.int32()),
            "bucket": pa.array(np.concatenate(out), pa.int64()),
            "vec_id": rep.column("vec_id"),
            "embedding": rep.column("embedding")})


def _hash_sample(ds, *, keep: int = 11, mod: int = 97):
    """Deterministic hash-based sample of embeddings AS A DATASET (never
    pulled to the driver): every shard derives membership from vec_id
    alone, no RNG state.  keep/mod sets the sampling rate (~11%); at
    crawl scale, lower it so the training set stays ~1-10M vectors."""

    def flt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        mask = (ids * np.int64(2654435761)) % np.int64(mod) < np.int64(keep)
        return batch.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow")


def _bounded_head_vectors(ds, max_rows: int) -> np.ndarray:
    """Pull at most `max_rows` embeddings to the driver (init seeding
    only — the Lloyd iterations never do this)."""
    out, total = [], 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        out.append(_stack(b.column("embedding")))
        total += len(out[-1])
        if total >= max_rows:
            break
    if not out:
        return np.empty((0, 0), dtype=np.float64)
    return np.concatenate(out)[:max_rows]


def kmeans_fit(ds, k: int, *, iters: int = 10, max_init_rows: int = 2048,
               sample_keep: int = 11, sample_mod: int = 97):
    """DISTRIBUTED k-means for the IVF coarse quantizer.

    - Training set: a deterministic hash-sample of the corpus kept as a
      Dataset (``_hash_sample``) and pinned once — the sample is spread
      across the cluster, never collected.
    - Init: deterministic farthest-point seeding on a driver-BOUNDED
      slice of the sample (``max_init_rows``) — random seeding can drop
      two seeds into one true cluster and Lloyd never recovers.
    - Lloyd: each iteration broadcasts the centroids via ``ray.put`` and
      every batch emits its partial (cluster -> vector sum, count); the
      driver merges only the tiny (n_blocks x k x dim) partials — the
      ops/similarity.label_centroids map-side-combine shape.

    Returns (k', dim) normalized centroids, or ``None`` when the sample
    is empty (degenerate corpus — callers fall back to brute force)."""
    import ray

    sample = _hash_sample(ds, keep=sample_keep, mod=sample_mod) \
        .map_batches(lambda b: pa.table({"embedding": b.column("embedding")}),
                     batch_format="pyarrow").materialize()
    init = _bounded_head_vectors(sample, max_init_rows)
    if init.size == 0:
        return None
    v = _normalize(init)
    k = min(k, len(v))
    chosen = [0]
    best_sim = v @ v[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, v @ v[nxt])
    cent = v[chosen].copy()

    for _ in range(iters):
        cent_ref = ray.put(cent)
        kk, dim = cent.shape

        def partial(batch: pa.Table, _ref=cent_ref, _k=kk, _d=dim):
            cm = ray.get(_ref)
            vecs = _normalize(_stack(batch.column("embedding")))
            if len(vecs) == 0:
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "vsum": pa.array([], pa.list_(pa.float64())),
                                 "n": pa.array([], pa.int64())})
            assign = np.argmax(vecs @ cm.T, axis=1)
            sums = np.zeros((_k, _d), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=_k).astype(np.int64)
            nz = np.nonzero(counts)[0]
            return pa.table({
                "cluster": pa.array(nz.astype(np.int32), pa.int32()),
                "vsum": pa.array(sums[nz].tolist(), pa.list_(pa.float64())),
                "n": pa.array(counts[nz], pa.int64())})

        sums = np.zeros((kk, dim), dtype=np.float64)
        counts = np.zeros(kk, dtype=np.int64)
        for b in sample.map_batches(partial, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
            cl = np.asarray(b.column("cluster").to_pylist(), dtype=np.int64)
            if len(cl) == 0:
                continue
            vs = np.asarray(b.column("vsum").to_pylist(), dtype=np.float64)
            nn = np.asarray(b.column("n").to_pylist(), dtype=np.int64)
            np.add.at(sums, cl, vs)
            np.add.at(counts, cl, nn)
        nonempty = counts > 0
        prev = cent.copy()
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _normalize(cent)
        # converged: each remaining iteration costs a full pass over the
        # sample Dataset (fixed scheduling overhead dominates at bench
        # scale), so stop as soon as the centroids stop moving
        if np.abs(cent - prev).max() < 1e-9:
            break
    return cent


def ivf_topk(ds, query_ids: List[int], query_vecs: np.ndarray, *, dim: int,
             k: int = 10, n_clusters: int = 16, n_probe: int = 4):
    """IVF ANN — the coarse-quantizer scale path (complement of lsh_topk):

    1. DISTRIBUTED k-means (``kmeans_fit``: hash-sampled training
       Dataset, per-batch partial sums, tiny k x dim driver merge per
       Lloyd iteration) trains the coarse quantizer; a degenerate/empty
       corpus falls back to the exact brute-force baseline;
    2. centroids broadcast once via ray.put;
    3. each batch assigns its vectors to the nearest centroid and scans
       ONLY rows whose cluster is among the query's `n_probe` closest
       lists — per-query work drops to ~n_probe/n_clusters of the corpus;
    4. per-batch partial top-k + tiny driver merge (same contract as
       brute_force_topk, which is the exact-recall baseline).
    Approximate: recall depends on n_clusters/n_probe."""
    if len(query_ids) == 0:
        return _empty_topk()
    import ray

    cent = kmeans_fit(ds, n_clusters)
    if cent is None:
        # empty/degenerate sample: exact scan is both the safest and the
        # cheapest thing on a corpus this small (ADVICE r2: ivf_topk must
        # be total on degenerate input)
        return brute_force_topk(ds, query_ids, query_vecs, k=k)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_union = set(int(c) for row in q_lists for c in row)
    cent_ref = ray.put(cent)
    q_ref = ray.put(q)
    lists_ref = ray.put([set(int(c) for c in row) for row in q_lists])
    union_ref = ray.put(probe_union)

    def partial(batch: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref)
        qm = ray.get(q_ref)
        per_q_lists = ray.get(lists_ref)
        union = ray.get(union_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        assign = np.argmax(vecs @ cm.T, axis=1)
        mask = np.fromiter((int(a) in union for a in assign),
                           dtype=bool, count=len(assign))
        out_q, out_n, out_s = [], [], []
        if mask.any():
            vecs_f = vecs[mask]
            ids = np.asarray(batch.column("vec_id").to_pylist(),
                             dtype=np.int64)[mask]
            assign_f = assign[mask]
            sims = qm @ vecs_f.T
            kk = min(k + 1, sims.shape[1])
            for qi in range(sims.shape[0]):
                in_list = np.fromiter(
                    (int(a) in per_q_lists[qi] for a in assign_f),
                    dtype=bool, count=len(assign_f))
                if not in_list.any():
                    continue
                s = np.where(in_list, sims[qi], -np.inf)
                idx = np.argpartition(-s, min(kk, in_list.sum()) - 1)[:kk]
                for j in idx:
                    if in_list[j]:
                        out_q.append(qi)
                        out_n.append(int(ids[j]))
                        out_s.append(float(s[j]))
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int32()), pa.array(out_n, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["q_idx", "neighbor_id", "cos_sim"])

    candidates = ds.map_batches(partial, batch_format="pyarrow")
    best: List[List[Tuple[float, int]]] = [[] for _ in query_ids]
    for b in candidates.iter_batches(batch_format="pyarrow"):
        for qi, nid, s in zip(b.column("q_idx").to_pylist(),
                              b.column("neighbor_id").to_pylist(),
                              b.column("cos_sim").to_pylist()):
            if nid == query_ids[qi]:
                continue
            heapq.heappush(best[qi], (s, -nid))
            if len(best[qi]) > k:
                heapq.heappop(best[qi])
    out_q, out_n, out_r = [], [], []
    for qi, qid in enumerate(query_ids):
        ranked = sorted(best[qi], key=lambda t: (-t[0], -t[1]))
        for rank, (s, neg_nid) in enumerate(ranked, start=1):
            out_q.append(qid)
            out_n.append(-neg_nid)
            out_r.append(rank)
    return pa.Table.from_arrays(
        [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
         pa.array(out_r, pa.int64())],
        names=["query_id", "neighbor_id", "rank"])


def cosine_neardup_pairs(ds, *, dim: int, threshold: float = 0.9,
                         n_bits: int = 8, n_tables: int = 1,
                         n_parts: int = 64):
    """Embedding-cosine near-dup pairs: hyperplane-LSH bucketing + exact
    cosine verify, with all grouping done at PARTITION level (buckets are
    hashed into `n_parts` bounded partitions; one vectorized pass resolves
    every bucket in a partition — no per-tiny-group map_groups, ever).

    Scale guidance (expected bucket size ~= n_rows * n_tables / 2^n_bits):
    pick n_bits ~= log2(n_rows / 1000) so intra-bucket exact cosine stays
    O(1000^2) per bucket, and raise `n_tables` (independent hyperplane
    tables, union of candidates) to recover the recall that extra planes
    cost.  The intra-bucket pass is the documented partitioning
    assumption: one bucket's vectors fit in one partition's memory."""
    from ..util import task_udf

    def bucketize(batch: pa.Table) -> pa.Table:
        return task_udf(MultiTableBucketer, dim=dim, n_bits=n_bits,
                        n_tables=n_tables)(batch)

    banded = ds.map_batches(bucketize, batch_format="pyarrow")

    def resolve(df) -> "pd.DataFrame":
        import pandas as pd
        rows = []
        df = df[df.duplicated(subset=["table", "bucket"], keep=False)]
        for (_t, _bkt), g in df.groupby(["table", "bucket"], sort=False):
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy()
            raw = g["embedding"].tolist()
            dim = next((len(r) for r in raw if r is not None), 0)
            raw = [([0.0] * dim if r is None else r) for r in raw]
            vecs = _normalize(np.asarray(raw, dtype=np.float64))
            sims = vecs @ vecs.T
            order = np.argsort(ids)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    a, b = order[ii], order[jj]
                    if ids[a] == ids[b]:
                        continue
                    s = float(sims[a, b])
                    if s >= threshold:
                        rows.append((int(ids[a]), int(ids[b]), s))
        return pd.DataFrame(rows, columns=["vec_id_a", "vec_id_b", "cos_sim"]
                            ).astype({"vec_id_a": "int64",
                                      "vec_id_b": "int64"})

    from .dedup import _grouped_by_partition
    pairs = _grouped_by_partition(banded, ["table", "bucket"], resolve,
                                  n_parts=n_parts)

    def drop_dup(df):
        return df.drop_duplicates(subset=["vec_id_a", "vec_id_b"])
    return _grouped_by_partition(pairs, ["vec_id_a", "vec_id_b"], drop_dup,
                                 n_parts=16)


def pca_fit(ds, vec_col: str = "embedding", *, k: int = 8):
    """Distributed PCA fit: ONE map pass emits per-block moment partials
    (n, sum_x [d], sum_outer [d*d] — the label_centroids / IRLS
    partial-sum shape), the driver forms the d x d covariance and
    eigendecomposes it (d ~ 64-1024: trivially driver-sized even at
    100 TB, because the partials are corpus-size-independent).

    Returns (mean [d], components [k, d]) with a deterministic sign
    convention (each component's largest-|entry| is positive).
    """

    def partials(b: pa.Table) -> pa.Table:
        X = _stack(b.column(vec_col))
        if X.ndim != 2 or len(X) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "ss": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "ss": pa.array([(X.T @ X).ravel().tolist()],
                           pa.list_(pa.float64()))})

    n = 0
    s = None
    ss = None
    for r in ds.map_batches(partials, batch_format="pyarrow").take_all():
        n += r["n"]
        rs = np.asarray(r["s"])
        rss = np.asarray(r["ss"])
        s = rs if s is None else s + rs
        ss = rss if ss is None else ss + rss
    if n == 0 or s is None:
        return None, None  # empty corpus: caller emits a typed empty
    d = len(s)
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T.copy()  # [k, d], descending variance
    # sign convention for determinism across runs
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(ds, mean: np.ndarray, comps: np.ndarray,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """Project every vector onto the fitted components -> (id, proj
    list<double>[k]).  mean/components ride the task closure (broadcast
    once); one vectorized matmul per batch."""
    mean = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(comps, dtype=np.float64)

    def project(b: pa.Table) -> pa.Table:
        X = _stack(b.column(vec_col))
        if X.ndim != 2 or len(X) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "proj": pa.array([], pa.list_(pa.float64()))})
        P = (X - mean) @ comps.T
        return pa.table({id_col: b.column(id_col),
                         "proj": pa.array(P.tolist(),
                                          pa.list_(pa.float64()))})

    return ds.map_batches(project, batch_format="pyarrow")


def kmeans_assign(ds, centroids: np.ndarray):
    """Map-side nearest-centroid assignment over normalized cosine
    (the trained quantizer broadcast ONCE via ray.put, one matmul per
    batch) -> Dataset (vec_id, cluster).  With kmeans_fit this is the
    complete distributed clustering pipeline: fit's shuffle carries
    (k x dim) partial sums, assign moves nothing at all."""
    import ray
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        cm = ray.get(cent_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        cl = np.argmax(vecs @ cm.T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.asarray(
                batch.column("vec_id").to_pylist(), np.int64)),
            "cluster": pa.array(cl)})

    return ds.map_batches(assign, batch_format="pyarrow")


# --- product quantization (PQ) ANN ------------------------------------------

def pq_fit(ds, *, m: int = 8, k: int = 16, iters: int = 8,
           max_init_rows: int = 2048, sample_keep: int = 11,
           sample_mod: int = 97):
    """DISTRIBUTED product-quantizer training (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the D-dim
    space splits into `m` subspaces of D/m dims, each with its own
    `k`-word EUCLIDEAN codebook -> np.ndarray (m, k, D/m).

    Scale shape mirrors kmeans_fit: a deterministic hash-sample stays a
    Dataset; every Lloyd iteration broadcasts all m codebooks once and
    each batch emits (m x k x D/m sums, m x k counts) partials — ALL
    subspaces assign in the same pass, so the iteration cost is one
    sweep regardless of m.  Init: evenly-strided rows of a bounded
    deterministic slice (per subspace).  Returns None on a degenerate
    (empty) sample."""
    import ray

    sample = _hash_sample(ds, keep=sample_keep, mod=sample_mod) \
        .map_batches(lambda b: pa.table(
            {"embedding": b.column("embedding")}),
            batch_format="pyarrow").materialize()
    init = _bounded_head_vectors(sample, max_init_rows)
    if init.size == 0:
        return None
    n0, dim = init.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    kk = min(k, n0)
    stride = max(1, n0 // kk)
    books = np.stack([init[::stride][:kk, j * sub:(j + 1) * sub].copy()
                      for j in range(m)])  # (m, kk, sub)

    for _ in range(iters):
        ref = ray.put(books)

        def partial(batch: pa.Table, _ref=ref, _m=m, _k=kk, _s=sub):
            bk = ray.get(_ref)
            vecs = _stack(batch.column("embedding"))
            if len(vecs) == 0:
                return pa.table({"sums": pa.array([], pa.binary()),
                                 "counts": pa.array([], pa.binary())})
            sums = np.zeros((_m, _k, _s))
            counts = np.zeros((_m, _k), np.int64)
            for j in range(_m):
                v = vecs[:, j * _s:(j + 1) * _s]
                d = ((v[:, None, :] - bk[j][None, :, :]) ** 2).sum(2)
                a = np.argmin(d, axis=1)
                np.add.at(sums[j], a, v)
                np.add.at(counts[j], a, 1)
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([counts.tobytes()], pa.binary())})

        sums = np.zeros((m, kk, sub))
        counts = np.zeros((m, kk), np.int64)
        for r in sample.map_batches(partial,
                                    batch_format="pyarrow").take_all():
            if not r["sums"]:
                continue
            sums += np.frombuffer(r["sums"]).reshape(m, kk, sub)
            counts += np.frombuffer(r["counts"],
                                    np.int64).reshape(m, kk)
        nz = counts > 0
        new = books.copy()
        new[nz] = sums[nz] / counts[nz][:, None]
        if np.allclose(new, books, atol=1e-12):
            break
        books = new
    return books


def pq_encode(ds, codebooks: np.ndarray):
    """Map-side PQ encoding (codebooks broadcast ONCE) -> Dataset
    (vec_id, codes) with codes a list<uint8> of length m — the 8x-64x
    compressed representation that makes billion-vector ANN fit in
    memory.  No shuffle."""
    import ray
    bk = np.ascontiguousarray(codebooks, dtype=np.float64)
    ref = ray.put(bk)
    m, kk, sub = bk.shape

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "codes": pa.array([], pa.list_(pa.uint8()))})
        b = ray.get(ref)
        vecs = _stack(batch.column("embedding"))
        codes = np.empty((len(vecs), m), np.uint8)
        for j in range(m):
            v = vecs[:, j * sub:(j + 1) * sub]
            d = ((v[:, None, :] - b[j][None, :, :]) ** 2).sum(2)
            codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table({
            "vec_id": pa.array(np.asarray(
                batch.column("vec_id").to_pylist(), np.int64)),
            "codes": pa.array(list(codes), pa.list_(pa.uint8()))})

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(ds, query_ids: List[int], query_vecs: np.ndarray,
            codebooks: np.ndarray, k: int = 10,
            exclude_self: bool = True):
    """ADC (asymmetric distance computation) top-k over PQ codes ->
    pa.Table (query_id, neighbor_id, rank), same contract as
    brute_force_topk.  Each task builds the (n_query x m x k') exact
    query-to-codeword distance table once per batch and scores every
    code row with pure table lookups + a sum over m — no
    reconstruction, no full-dim math per candidate.  Per-batch partial
    top-k, tiny driver merge."""
    import heapq

    import ray
    if len(query_ids) == 0:
        return _empty_topk()
    bk = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, sub = bk.shape
    q = np.asarray(query_vecs, dtype=np.float64)
    # (n_q, m, kk) exact subspace distances
    tables = np.stack([(((q[:, j * sub:(j + 1) * sub][:, None, :]
                          - bk[j][None, :, :]) ** 2).sum(2))
                       for j in range(m)], axis=1)
    t_ref = ray.put(tables)
    qid_set = set(query_ids) if exclude_self else frozenset()

    encoded = pq_encode(ds, bk)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"q_idx": pa.array([], pa.int32()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        tb = ray.get(t_ref)  # (n_q, m, kk)
        ids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        codes = np.asarray(
            [c for c in batch.column("codes").to_pylist()], np.int64)
        # dist[q, row] = sum_j tb[q, j, codes[row, j]]
        n_q = tb.shape[0]
        cols = np.arange(m)
        d = tb[:, cols[None, :], codes].sum(axis=2)  # (n_q, n_rows)
        out_q, out_n, out_d = [], [], []
        kk2 = min(k + (1 if exclude_self else 0), d.shape[1])
        for qi in range(n_q):
            idx = np.argpartition(d[qi], kk2 - 1)[:kk2]
            for j in idx:
                out_q.append(qi)
                out_n.append(int(ids[j]))
                out_d.append(float(d[qi, j]))
        return pa.table({"q_idx": pa.array(out_q, pa.int32()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "dist": pa.array(out_d, pa.float64())})

    best: dict = {}
    for b in encoded.map_batches(partial,
                                 batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for qi, nid, dist in zip(b.column("q_idx").to_pylist(),
                                 b.column("neighbor_id").to_pylist(),
                                 b.column("dist").to_pylist()):
            if exclude_self and query_ids[qi] == nid:
                continue
            # heap keeps the k best under the FINAL (dist asc, nid asc)
            # preference: evict the max tuple (-dist, -nid) so dist
            # ties deterministically keep the smaller nid regardless
            # of batch arrival order
            heapq.heappush(best.setdefault(qi, []),
                           (-dist, -nid))
            if len(best[qi]) > k:
                heapq.heappop(best[qi])
    out_q, out_n, out_r = [], [], []
    for qi in range(len(query_ids)):
        cands = sorted(((-negd, -negn) for negd, negn in
                        best.get(qi, [])),
                       key=lambda t: (t[0], t[1]))[:k]
        for r, (_, nid) in enumerate(cands, 1):
            out_q.append(query_ids[qi])
            out_n.append(nid)
            out_r.append(r)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def ivfpq_topk(ds, query_ids: List[int], query_vecs: np.ndarray, *,
               dim: int, k: int = 10, n_clusters: int = 16,
               n_probe: int = 4, m: int = 8, pq_k: int = 16,
               rerank: int = 0):
    """IVFADC (Jegou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011, §IV): IVF coarse quantizer + PQ on
    RESIDUALS, ADC scan restricted to the probed inverted lists — the
    billion-vector production ANN layout, composing ivf_topk's coarse
    path with pq_topk's compressed scan.

    1. kmeans_fit trains the coarse quantizer (distributed: hash-
       sampled Dataset, per-batch partial sums);
    2. the residual dataset (normalized vec - centroid[assign]) trains
       ONE shared set of PQ codebooks via pq_fit (standard IVFADC —
       codebooks shared across lists, distributed Lloyd);
    3. one encode+scan pass: each batch assigns, PQ-encodes residuals
       (m uint8 codes/vector — the memory layout that fits 1e9 vectors
       in RAM) and ADC-scores ONLY rows whose list a query probes, via
       per-(query, list) lookup tables built from the query residual;
    4. per-batch partial top-k + tiny driver merge (brute_force_topk
       contract: (query_id, neighbor_id, rank) by distance asc, id-asc
       ties, self excluded).

    `rerank` > 0 enables the IVFADC+R refinement (Jegou et al. §V):
    the ADC scan keeps a `rerank`-deep shortlist per query, then ONE
    bounded fetch pass pulls the shortlist's exact vectors (<= n_q x
    rerank rows to the driver) and exact cosine re-scores the final
    top-k — ADC does the corpus-scale pruning, exact math does the
    ranking, which is how production IVFADC recovers exact-tier
    recall at PQ memory cost.

    Falls back to exact brute force on degenerate (empty) corpora.
    Approximate: recall tracks n_probe/n_clusters, m and rerank."""
    import ray
    if len(query_ids) == 0:
        return _empty_topk()
    cent = kmeans_fit(ds, n_clusters)
    if cent is None:
        return brute_force_topk(ds, query_ids, query_vecs, k=k)
    cent_ref = ray.put(cent)

    def residualize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int32()),
                "embedding": pa.array([], pa.list_(pa.float64()))})
        cm = ray.get(cent_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        assign = np.argmax(vecs @ cm.T, axis=1)
        res = vecs - cm[assign]
        ids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(assign.astype(np.int32), pa.int32()),
            "embedding": pa.array(res.tolist(),
                                  pa.list_(pa.float64()))})

    # materialized once: pq_fit's sample pass + the scan pass both read
    # it, and at scale this IS the stored index input (cluster + codes)
    res_ds = ds.map_batches(residualize,
                            batch_format="pyarrow").materialize()
    books = pq_fit(res_ds, m=m, k=pq_k)
    if books is None:
        return brute_force_topk(ds, query_ids, query_vecs, k=k)
    bk = np.ascontiguousarray(books, np.float64)
    mm, kk, sub = bk.shape
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_lists = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]
    # per-(query, probed list) ADC tables from the query RESIDUAL:
    # ||q - v||^2 ~ sum_j || (q - c)_j - codeword_j ||^2
    tabs = {}
    for qi in range(len(query_ids)):
        for c in q_lists[qi]:
            qr = q[qi] - cent[int(c)]
            tabs[(qi, int(c))] = np.stack(
                [(((qr[j * sub:(j + 1) * sub][None, :]
                    - bk[j]) ** 2).sum(1)) for j in range(mm)])
    tabs_ref = ray.put(tabs)
    books_ref = ray.put(bk)
    depth = max(k, rerank) if rerank else k

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table({"q_idx": pa.array([], pa.int32()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        tt = ray.get(tabs_ref)
        b = ray.get(books_ref)
        ids = np.asarray(batch.column("vec_id").to_pylist(), np.int64)
        clus = np.asarray(batch.column("cluster").to_pylist(),
                          np.int64)
        res = _stack(batch.column("embedding"))
        codes = np.empty((len(res), mm), np.int64)
        for j in range(mm):
            v = res[:, j * sub:(j + 1) * sub]
            d = ((v[:, None, :] - b[j][None, :, :]) ** 2).sum(2)
            codes[:, j] = np.argmin(d, axis=1)
        cols = np.arange(mm)
        out_q, out_n, out_d = [], [], []
        kk2 = depth + 1
        for (qi, c), tab in tt.items():
            sel = clus == c
            if not sel.any():
                continue
            cs = codes[sel]
            d = tab[cols[None, :], cs].sum(axis=1)
            nsel = ids[sel]
            top = np.argpartition(d, min(kk2, len(d)) - 1)[:kk2] \
                if len(d) > kk2 else np.arange(len(d))
            out_q.extend([qi] * len(top))
            out_n.extend(nsel[top].tolist())
            out_d.extend(d[top].tolist())
        return pa.table({"q_idx": pa.array(out_q, pa.int32()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "dist": pa.array(out_d, pa.float64())})

    best: List[list] = [[] for _ in query_ids]
    for bt in res_ds.map_batches(scan, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for qi, nid, dist in zip(bt.column("q_idx").to_pylist(),
                                 bt.column("neighbor_id").to_pylist(),
                                 bt.column("dist").to_pylist()):
            if query_ids[qi] == nid:
                continue
            # max-heap eviction on (-dist, -nid): dist ties keep the
            # smaller id deterministically regardless of arrival order
            heapq.heappush(best[qi], (-dist, -nid))
            if len(best[qi]) > depth:
                heapq.heappop(best[qi])
    out_q, out_n, out_r = [], [], []
    if rerank:
        # IVFADC+R: one bounded fetch of the shortlist's exact vectors
        # (<= n_q * rerank rows), exact cosine re-score on the driver
        want = set()
        for qi in range(len(query_ids)):
            want.update(-negn for _, negn in best[qi])
        want_ref = ray.put(want)

        def fetch(batch: pa.Table) -> pa.Table:
            empty = pa.table({
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float64()))})
            if batch.num_rows == 0:
                return empty
            w = ray.get(want_ref)
            ids = np.asarray(batch.column("vec_id").to_pylist(),
                             np.int64)
            mask = np.fromiter((int(i) in w for i in ids), bool,
                               len(ids))
            if not mask.any():
                return empty
            vecs = _normalize(_stack(batch.column("embedding")))[mask]
            return pa.table({
                "vec_id": pa.array(ids[mask]),
                "embedding": pa.array(vecs.tolist(),
                                      pa.list_(pa.float64()))})

        vec_by_id = {}
        for bt in ds.map_batches(fetch, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for vid, v in zip(bt.column("vec_id").to_pylist(),
                              bt.column("embedding").to_pylist()):
                vec_by_id[int(vid)] = np.asarray(v, np.float64)
        for qi, qid in enumerate(query_ids):
            cand_ids = sorted({-negn for _, negn in best[qi]}
                              & vec_by_id.keys())
            if not cand_ids:
                continue
            mat = np.stack([vec_by_id[i] for i in cand_ids])
            sims = mat @ q[qi]
            order = sorted(range(len(cand_ids)),
                           key=lambda i: (-sims[i], cand_ids[i]))[:k]
            for r, i in enumerate(order, 1):
                out_q.append(qid)
                out_n.append(cand_ids[i])
                out_r.append(r)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "rank": pa.array(out_r, pa.int64())})
    for qi, qid in enumerate(query_ids):
        cands = sorted(((-negd, -negn) for negd, negn in best[qi]),
                       key=lambda t: (t[0], t[1]))[:k]
        for r, (_, nid) in enumerate(cands, 1):
            out_q.append(qid)
            out_n.append(nid)
            out_r.append(r)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "neighbor_id": pa.array(out_n, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})


def mmr_select(ds, *, dim: int, k: int = 16, m: int = 64,
               lam_milli: int = 700):
    """Maximal-Marginal-Relevance diverse subset selection (Carbonell &
    Goldstein 1998) — the training-data curation shape "pick k docs
    that are relevant AND mutually diverse": query = the corpus mean
    embedding, candidates = distributed top-m by cosine relevance, then
    the greedy MMR loop runs on the driver over only those m rows ->
    (rank, vec_id, relevance_milli, mmr_milli).

    Determinism: candidate and greedy ties break on vec_id ascending;
    scores quantize to floor-milli only in the OUTPUT (selection uses
    the full doubles, which both passes compute identically).

    Scale shape: pass 1 = mean via per-batch (sum, n) partials; pass 2
    = per-batch local top-m candidates (m rows per block to the
    driver, corpus never moves); the greedy loop is O(k*m) on m<=64
    rows."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    lam = lam_milli / 1000.0

    def sum_partial(b: pa.Table) -> pa.Table:
        v = _stack(b.column("embedding"))
        if v.shape[0] == 0 or v.shape[1] == 0:
            return pa.table({"s": pa.array([[0.0] * dim],
                                           pa.list_(pa.float64())),
                             "n": pa.array([0], pa.int64())})
        return pa.table({"s": pa.array([v.sum(axis=0).tolist()],
                                       pa.list_(pa.float64())),
                         "n": pa.array([int(v.shape[0])], pa.int64())})

    rows = ds.map_batches(sum_partial, batch_format="pyarrow") \
        .take_all()
    out_cols = {"rank": "int64", "vec_id": "int64",
                "relevance_milli": "int64", "mmr_milli": "int64"}
    n_total = sum(int(r["n"]) for r in rows)
    if n_total == 0:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    mean = np.sum([np.asarray(r["s"], np.float64) for r in rows],
                  axis=0) / n_total
    q = mean / (np.linalg.norm(mean) or 1.0)
    q_ref = ray.put(q)

    def cand_partial(b: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        v = _stack(b.column("embedding"))
        ids = pc.fill_null(pc.cast(b.column("vec_id"), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if v.shape[0] == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64()),
                             "emb": pa.array([],
                                             pa.list_(pa.float64()))})
        sims = _normalize(v) @ qv
        order = np.lexsort((ids, -sims))[:m]
        return pa.table({
            "vec_id": pa.array(ids[order]),
            "sim": pa.array(sims[order]),
            "emb": pa.array([v[i].tolist() for i in order],
                            pa.list_(pa.float64()))})

    cand = []
    for b in ds.map_batches(cand_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            cand.append((int(b.column("vec_id")[i].as_py()),
                         float(b.column("sim")[i].as_py()),
                         np.asarray(b.column("emb")[i].as_py(),
                                    np.float64)))
    cand.sort(key=lambda t: (-t[1], t[0]))
    cand = cand[:m]
    if not cand:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    ids = np.asarray([c[0] for c in cand], np.int64)
    rel = np.asarray([c[1] for c in cand], np.float64)
    vecs = _normalize(np.stack([c[2] for c in cand]))
    pair = vecs @ vecs.T
    chosen: list = []
    avail = np.ones(len(cand), bool)
    out = []
    for rank in range(1, min(k, len(cand)) + 1):
        if chosen:
            max_sim = pair[:, chosen].max(axis=1)
        else:
            max_sim = np.zeros(len(cand))
        score = lam * rel - (1.0 - lam) * max_sim
        score[~avail] = -np.inf
        # ties on score -> smallest vec_id (ids are cand-sorted, but
        # re-sorting by (-score, id) pins it regardless)
        j = int(np.lexsort((ids, -score))[0])
        chosen.append(j)
        avail[j] = False
        out.append({"rank": rank, "vec_id": int(ids[j]),
                    "relevance_milli": int(np.floor(rel[j] * 1000)),
                    "mmr_milli": int(np.floor(score[j] * 1000))})
    return pd.DataFrame(out).astype(out_cols)


def embedding_exact_dedup(ds, *, scale: int = 1000,
                          id_col: str = "vec_id",
                          emb_col: str = "embedding"):
    """EXACT duplicate-vector groups under floor(x*scale) quantization:
    one row per distinct quantized vector, keeper = smallest id,
    n_dups = members.  The byte-level companion to the cosine near-dup
    path (catches re-ingested / re-encoded identical embeddings that
    cosine thresholds would also catch but pay O(pairs) for).

    -> (vec_id, n_dups).  Scale shape: map-side quantize + per-batch
    (key, min, count) combine, ONE hash-partitioned pass on the
    quantized-string key (the exact_dedup single-shuffle pattern)."""
    import pandas as pd

    def combine(b: pa.Table) -> pa.Table:
        cols = {"key": "object", "vec_id": "int64", "n": "int64"}
        if b.num_rows == 0:
            return pa.Table.from_pandas(
                pd.DataFrame(columns=list(cols)).astype(cols),
                preserve_index=False)
        ids = np.asarray(pc.fill_null(b.column(id_col), -1).to_pylist(),
                         np.int64)
        q = np.floor(_stack(b.column(emb_col)) * float(scale)) \
            .astype(np.int64)
        keys = ["," .join(map(str, row)) for row in q]
        g = pd.DataFrame({"key": keys, "vec_id": ids, "n": 1}) \
            .groupby("key", as_index=False) \
            .agg(vec_id=("vec_id", "min"), n=("n", "sum"))
        return pa.Table.from_pandas(g.astype(cols),
                                    preserve_index=False)

    pre = ds.map_batches(combine, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_id": "int64", "n_dups": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.groupby("key", as_index=False) \
            .agg(vec_id=("vec_id", "min"), n_dups=("n", "sum"))
        return g[["vec_id", "n_dups"]].astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(pre, ["key"], resolve, n_parts=16)


def knn_label_eval(ds, *, n_queries: int = 20, k: int = 5,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   label_col: str = "label"):
    """FULLY-ORACLED k-NN label prediction eval: for the n_queries
    smallest ids, find the k nearest neighbors by EXACT integer dot of
    floor(x*1000)-quantized vectors (self excluded, ties by neighbor
    id asc — the ip_topk_exact metric) and predict the majority
    neighbor label (ties -> smallest label).  -> one row per query
    (query_id, true_label, pred_label, correct).

    Scale shape: query matrix broadcast once (ray.put), per-batch
    integer matmul + partial top-k carrying neighbor labels, bounded
    driver merge (n_queries x k rows)."""
    import heapq

    import pandas as pd
    import ray

    head = min_k_rows(ds, id_col, n_queries)
    qids = head.column(id_col).to_pylist()
    out_cols = {"query_id": "int64", "true_label": "int64",
                "pred_label": "int64", "correct": "bool"}
    if not qids:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    true_labels = [int(x) if x is not None else -1
                   for x in head.column(label_col).to_pylist()]
    qm = np.floor(_stack(head.column(emb_col)) * 1000.0) \
        .astype(np.int64)
    q_ref = ray.put(qm)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"qi": pa.array([], pa.int32()),
                          "nid": pa.array([], pa.int64()),
                          "lab": pa.array([], pa.int64()),
                          "dot": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        qm_ = ray.get(q_ref)
        ids = np.asarray(pc.fill_null(b.column(id_col), -1).to_pylist(),
                         np.int64)
        labs = np.asarray(pc.fill_null(b.column(label_col), -1)
                          .to_pylist(), np.int64)
        v = np.floor(_stack(b.column(emb_col)) * 1000.0) \
            .astype(np.int64)
        dots = qm_ @ v.T
        out_q, out_n, out_l, out_d = [], [], [], []
        kk = min(k + 1, dots.shape[1])
        for qi in range(dots.shape[0]):
            idx = np.argpartition(-dots[qi], kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_n.extend(ids[idx].tolist())
            out_l.extend(labs[idx].tolist())
            out_d.extend(dots[qi][idx].tolist())
        return pa.table({"qi": pa.array(out_q, pa.int32()),
                         "nid": pa.array(out_n, pa.int64()),
                         "lab": pa.array(out_l, pa.int64()),
                         "dot": pa.array(out_d, pa.int64())})

    best: list = [[] for _ in qids]
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for qi, nid, lab, dot in zip(b.column("qi").to_pylist(),
                                     b.column("nid").to_pylist(),
                                     b.column("lab").to_pylist(),
                                     b.column("dot").to_pylist()):
            if qids[qi] == nid:
                continue
            # max-heap emulation: keep k best by (dot desc, nid asc)
            heapq.heappush(best[qi], (dot, -nid, lab))
            if len(best[qi]) > k:
                heapq.heappop(best[qi])
    out = []
    for qi, qid in enumerate(qids):
        neigh = sorted(((d, -negn, lab) for d, negn, lab in best[qi]),
                       key=lambda t: (-t[0], t[1]))[:k]
        if not neigh:
            continue
        votes: dict = {}
        for _, _, lab in neigh:
            votes[lab] = votes.get(lab, 0) + 1
        pred = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0][0]
        out.append({"query_id": int(qid),
                    "true_label": true_labels[qi],
                    "pred_label": int(pred),
                    "correct": int(pred) == true_labels[qi]})
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    return pd.DataFrame(out).astype(out_cols)
