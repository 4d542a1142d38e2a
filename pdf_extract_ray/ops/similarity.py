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

import numpy as np
import pyarrow as pa


def _stack(batch_col) -> np.ndarray:
    return np.asarray(batch_col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, query_ids: List[int], query_vecs: np.ndarray,
                     k: int = 10, exclude_self: bool = True):
    """-> pa.Table (query_id, neighbor_id, rank); rank 1 = most similar.

    Per-batch partial top-k (k candidates per query per batch) then a
    driver-side merge of the small candidate set: the full corpus never
    leaves the workers, only (n_batches x n_query x k) rows do.
    """
    import ray
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
        probe_set = ray.get(probe_ref)
        qm = ray.get(q_ref)
        vecs = _normalize(_stack(batch.column("embedding")))
        buckets = HyperplaneLSH(qm.shape[1], n_bits).bucket(vecs)
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


def cosine_neardup_pairs(ds, *, dim: int, threshold: float = 0.9,
                         n_bits: int = 8):
    """Embedding-cosine near-dup pairs: LSH bucket groupby + exact cosine
    verify within each bucket (only intra-bucket pairs are computed)."""
    bucketed = lsh_bucketed(ds, dim=dim, n_bits=n_bits)

    def bucket_pairs(df):
        import pandas as pd
        rows = []
        if len(df) > 1:
            ids = df["vec_id"].to_numpy()
            vecs = _normalize(np.asarray(df["embedding"].tolist(), dtype=np.float64))
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
        return pd.DataFrame(rows, columns=["vec_id_a", "vec_id_b", "cos_sim"])

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    def first_pair(df):
        return df.head(1)
    return pairs.groupby(["vec_id_a", "vec_id_b"]).map_groups(
        first_pair, batch_format="pandas")
