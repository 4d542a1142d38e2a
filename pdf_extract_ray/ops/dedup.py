"""Deduplication operators (Ray Data native).

- exact_dedup: md5(text) hash + ONE native groupby().aggregate(Min, Count)
  pass; the shuffle key is the 16-byte digest, never the text itself.
- minhash_lsh_pairs: word-shingle MinHash signatures (vectorized numpy with
  a per-worker word-hash cache), banded LSH, then PARTITION-level grouping:
  buckets are hashed into a bounded number of partitions and each partition
  resolves all of its buckets in one vectorized pass — per-tiny-group
  map_groups overhead (the classic LSH-on-Ray trap) never appears.
- simhash_pairs: 64-bit SimHash, 4x16-bit band bucketing, Hamming check
  inside buckets; same partition-level grouping.
- ngram_jaccard verify: exact character-n-gram Jaccard for candidate pairs
  (broadcast candidate-id semi-join filters the corpus map-side; texts
  attach to pairs via hash joins partitioned on doc_id — the corpus is
  never materialized on the driver).
"""
from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _md5_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    digests = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
               for t in texts]
    return pa.Table.from_arrays(
        [pa.array(digests, pa.string()), batch.column("doc_id")],
        names=["text_md5", "doc_id"])


def exact_dedup_groups(ds):
    """-> (doc_id = min per identical text, n_dups) in ONE aggregation
    shuffle of (md5, doc_id) pairs."""
    from ray.data.aggregate import Count, Min
    hashed = ds.map_batches(_md5_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_md5").aggregate(Min("doc_id"), Count())

    def rename(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.Table.from_arrays(
            [pc.cast(b.column("min(doc_id)"), pa.int64()),
             pc.cast(b.column("count()"), pa.int64())],
            names=["doc_id", "n_dups"])

    return agg.map_batches(rename, batch_format="pyarrow")


def exact_dedup_keep_first(ds):
    """Full dedup: one surviving doc_id (min) per distinct text."""
    return exact_dedup_groups(ds).select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# partition-level grouping helper
# ---------------------------------------------------------------------------

# Test hook: when True, _grouped_by_partition always takes the
# hash-partitioned shuffle path, never the single-task small-input
# fast path — lets tests assert both paths produce identical results.
_FORCE_SHUFFLE = False


def _grouped_by_partition(ds, key_cols: List[str], fn, n_parts: int = 64,
                          small_rows: int = 1_000_000,
                          small_bytes: int = 128 * 1024 * 1024):
    """groupby(key).apply(fn) without per-tiny-group overhead: hash the key
    into `n_parts` partitions, shuffle once on the small partition id, and
    let `fn` handle one partition's DataFrame (all of its groups) at once.
    `fn(df) -> DataFrame`; rows of one key always land in one partition.

    ADAPTIVE (AQE-style): the input is pinned and, when it is small
    (<= `small_rows` rows AND <= `small_bytes`; a 1M-row pandas
    resolve costs well under a second, the sort exchange costs 2-5 s), ALL groups resolve in
    one worker task — identical semantics (`fn` already handles many
    groups per partition; "one partition" simply becomes "the whole
    input") and none of the sort-exchange's seconds of fixed cost.
    Bigger inputs take the hash-partitioned shuffle, which would
    materialize internally anyway, so the up-front pin is not extra."""
    mat = ds.materialize()
    n = mat.count()
    if (not _FORCE_SHUFFLE and 0 < n <= small_rows
            and (mat.size_bytes() or 0) <= small_bytes):
        # normalize block types per block first (Ray 2.49 cannot merge
        # mixed arrow/pandas blocks into one batch or repartition them),
        # then batch_size=n coalesces everything into ONE pandas batch
        # resolved in one task
        norm = mat.map_batches(lambda b: b, batch_format="pyarrow",
                               batch_size=None)
        return norm.map_batches(fn, batch_format="pandas", batch_size=n)

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for col in key_cols:
            vals = batch.column(col).to_pandas()
            col_h = pd.util.hash_array(np.asarray(vals)).astype(np.uint64)
            h = h * np.uint64(1000003) + col_h
        return batch.append_column("_part", pa.array(
            (h % np.uint64(n_parts)).astype(np.int64), pa.int64()))

    withpart = mat.map_batches(add_part, batch_format="pyarrow")
    return withpart.groupby("_part").map_groups(
        lambda df: fn(df.drop(columns=["_part"])), batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


class MinHashBatch:
    """Stateful stage: permutation params built once per worker
    (SURVEY.md §2.3 pattern).  Emits one row per (doc, band)."""

    def __init__(self, n_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.n_perm = n_perm
        self.bands = bands
        self.rows_per_band = n_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(n_perm)

    def _shingle_hashes(self, text: str) -> np.ndarray:
        """Vectorized k-shingle hashes: per-word hashes (pandas'
        fixed-key siphash — one C call per doc, VERDICT r2 #6 shape)
        combined with a rolling polynomial over uint64 (wraps mod
        2^64)."""
        words = (text or "").split()
        k = self.shingle_k
        if not words:
            return np.empty(0, dtype=np.uint64)
        wh = pd.util.hash_array(
            np.asarray(words, dtype=object)).astype(np.uint64)
        if len(words) < k:
            k = len(words)
        B = np.uint64(1099511628211)
        acc = wh[:len(wh) - k + 1].copy()
        for j in range(1, k):
            acc = acc * B + wh[j:len(wh) - k + 1 + j]
        return acc

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text)
        if len(h) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (n_perm, n_shingles): ((a*h + b) mod p), min over shingles
        v = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1).astype(np.uint64)

    def _signatures(self, texts) -> np.ndarray:
        """Batch signatures: shingle hashes of MANY docs concatenate into
        one (n_perm, total_shingles) permutation pass with per-doc minima
        via np.minimum.reduceat — same math as signature(), one matmul-
        sized kernel instead of a Python-loop per doc.  Chunked so the
        intermediate stays under ~32 MB."""
        n = len(texts)
        sigs = np.zeros((n, self.n_perm), dtype=np.uint64)
        hashes = [self._shingle_hashes(t) for t in texts]
        idx = [i for i in range(n) if len(hashes[i])]
        max_elems = 4_000_000 // self.n_perm * self.n_perm
        start = 0
        while start < len(idx):
            chunk, total = [], 0
            while start < len(idx) and (not chunk or
                                        total + len(hashes[idx[start]])
                                        <= max_elems):
                chunk.append(idx[start])
                total += len(hashes[idx[start]])
                start += 1
            concat = np.concatenate([hashes[i] for i in chunk])
            offs = np.zeros(len(chunk), dtype=np.int64)
            np.cumsum([len(hashes[i]) for i in chunk[:-1]], out=offs[1:])
            v = (self.a[:, None] * concat[None, :]
                 + self.b[:, None]) % _MERSENNE
            mins = np.minimum.reduceat(v, offs, axis=1)  # (n_perm, chunk)
            sigs[chunk] = mins.T.astype(np.uint64)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = len(doc_ids)
        sigs = self._signatures(texts)
        r = self.rows_per_band
        # vectorized band bucket ids: hash each band slice row-wise
        out_doc = np.repeat(np.asarray(doc_ids, dtype=np.int64), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        buckets = np.empty(n * self.bands, dtype=np.uint64)
        B = np.uint64(1099511628211)
        for band in range(self.bands):
            sl = sigs[:, band * r:(band + 1) * r]
            acc = sl[:, 0].copy()
            for j in range(1, r):
                acc = acc * B + sl[:, j]
            buckets[band::self.bands] = acc
        sig_bytes = [sigs[i].tobytes() for i in range(n)]
        out_sig = [sig_bytes[i] for i in range(n) for _ in range(self.bands)]
        return pa.Table.from_arrays(
            [pa.array(out_doc, pa.int64()), pa.array(out_band, pa.int32()),
             pa.array(buckets.astype(np.int64), pa.int64()),
             pa.array(out_sig, pa.binary())],
            names=["doc_id", "band", "bucket", "sig"])


def _resolve_minhash_partition(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """All LSH buckets of one partition -> candidate pairs.

    Singleton buckets (the overwhelming majority at selective band
    widths) are dropped with one vectorized duplicated() mask BEFORE the
    group loop — iterating pandas groups costs ~100us each."""
    rows = []
    df = df[df.duplicated(subset=["band", "bucket"], keep=False)]
    for (_band, _bucket), g in df.groupby(["band", "bucket"], sort=False):
        if len(g) < 2:
            continue
        docs = g["doc_id"].to_numpy()
        order = np.argsort(docs)
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64)
                         for s in g["sig"].to_numpy()])[order]
        docs = docs[order]
        for ii in range(len(docs)):
            eq = (sigs[ii + 1:] == sigs[ii]).mean(axis=1)
            for jj in np.nonzero(eq >= threshold)[0]:
                a, b = docs[ii], docs[ii + 1 + jj]
                if a != b:
                    rows.append((int(a), int(b), float(eq[jj])))
    return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "est_jaccard"]
                        ).astype({"doc_id_a": "int64", "doc_id_b": "int64"})


def _dedupe_pairs(pairs, extra_cols: List[str]):
    """Global pair dedup via partition-level grouping."""
    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_id_a", "doc_id_b"])
    return _grouped_by_partition(pairs, ["doc_id_a", "doc_id_b"], resolve,
                                 n_parts=16)


class MinHashBandsOnly(MinHashBatch):
    """Band rows WITHOUT the signature payload: ~24 B/doc/band through the
    shuffle instead of ~540 B.  The scale path for 10^12-doc corpora:
    candidates come out unverified and are exact-verified downstream
    (verify_pairs_jaccard), which touches only the candidate pairs."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        full = super().__call__(batch)
        return full.drop_columns(["sig"])


def _minhash_map(ds, cls, n_perm, bands, shingle_k, concurrency):
    """Task-compute by default (warm-worker singletons, no actor-pool
    spin-up); explicit `concurrency` opts into an actor pool."""
    if concurrency is not None:
        return ds.map_batches(
            cls, fn_constructor_kwargs={"n_perm": n_perm, "bands": bands,
                                        "shingle_k": shingle_k},
            batch_format="pyarrow", concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(cls, n_perm=n_perm, bands=bands,
                        shingle_k=shingle_k)(batch)
    return ds.map_batches(fn, batch_format="pyarrow")


def bands_for_threshold(n_perm: int, threshold: float,
                        min_catch: float = 0.9) -> int:
    """Threshold-matched LSH band count: the FEWEST bands (longest rows
    -> most selective buckets, fewest false-positive candidates) whose
    catch probability  1 - (1 - t^r)^b  at Jaccard == `threshold` stays
    >= `min_catch`.  A high verify threshold (0.95) with the generic
    16-band config floods the verifier with ~50x false positives; 4
    bands x 16 rows keeps >=0.9 recall at the threshold (and ~1.0 for
    exact dups) while cutting candidates by an order of magnitude."""
    best = n_perm
    for b in (2, 4, 8, 16, 32):
        if n_perm % b:
            continue
        r = n_perm // b
        if 1.0 - (1.0 - threshold ** r) ** b >= min_catch:
            return b
    return best


def _cluster_parts() -> int:
    """Pair-resolution shuffle width: half the cluster CPUs (the ccprep
    join-sizing rule — A/B at 32 CPUs: 16 partitions beat 32 by ~2x
    because hash aggregator actors otherwise starve the map tasks).
    Scales with the cluster instead of a hardcoded single-node default:
    at 100 TB the bucket table is billions of rows and the resolve
    shuffle must widen with the node count."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // 2)


def minhash_lsh_candidates(ds, *, n_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, concurrency=None,
                           max_bucket=None, star_bucket=None,
                           n_parts=None):
    """Unverified candidate pairs (doc_id_a, doc_id_b) from LSH buckets —
    minimal shuffle payload; follow with verify_pairs_jaccard.

    Degenerate-bucket controls (boilerplate/spam clusters at crawl
    scale would emit O(bucket^2) pairs and dominate the job):
    - `star_bucket`: a bucket larger than this emits STAR pairs only
      (its minimum doc id against every other member — O(bucket) rows,
      deterministic).  Verified star edges keep the cluster connected,
      so the downstream greedy/CC drop resolves it as keep-one — the
      right call for boilerplate — while edges between members whose
      similarity only shows pairwise (not via the root) are forgone.
    - `max_bucket`: a bucket larger than this is skipped outright;
      members still pair through their other, more selective bands.
    """
    banded = _minhash_map(ds, MinHashBandsOnly, n_perm, bands, shingle_k,
                          concurrency)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated(subset=["band", "bucket"], keep=False)]
        cols_a, cols_b = [], []
        for (_b, _k), g in df.groupby(["band", "bucket"], sort=False):
            if len(g) < 2:
                continue
            if max_bucket is not None and len(g) > max_bucket:
                continue
            docs = np.unique(g["doc_id"].to_numpy(np.int64))
            if len(docs) < 2:
                continue
            if star_bucket is not None and len(docs) > star_bucket:
                cols_a.append(np.full(len(docs) - 1, docs[0], np.int64))
                cols_b.append(docs[1:])
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            cols_a.append(docs[ii])
            cols_b.append(docs[jj])
        if not cols_a:
            return pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                                 "doc_id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_id_a": np.concatenate(cols_a),
                             "doc_id_b": np.concatenate(cols_b)})

    pairs = _grouped_by_partition(banded, ["bucket"], resolve,
                                  n_parts=n_parts or _cluster_parts())
    return _dedupe_pairs(pairs, [])


def minhash_lsh_pairs(ds, *, n_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5,
                      concurrency=None, n_parts=None):
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold."""
    banded = _minhash_map(ds, MinHashBatch, n_perm, bands, shingle_k,
                          concurrency)
    pairs = _grouped_by_partition(
        banded, ["bucket"],
        lambda df: _resolve_minhash_partition(df, threshold),
        n_parts=n_parts or _cluster_parts())
    return _dedupe_pairs(pairs, ["est_jaccard"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashBatch:
    """Stateful 64-bit SimHash stage: vectorized word hashing (pandas'
    fixed-key siphash, one C call per doc) + fully vectorized bit
    accumulation (one (n_words, 64) bit matrix per doc, packed with
    np.packbits — no per-bit Python loop)."""

    _SHIFTS = np.arange(63, -1, -1, dtype=np.uint64)

    def _word_hashes(self, words: List[str]) -> np.ndarray:
        return pd.util.hash_array(
            np.asarray(words, dtype=object)).astype(np.uint64)

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        wh = self._word_hashes(words)
        # (n_words, 64) sign matrix: +1 where bit set, -1 where clear
        bits = ((wh[:, None] >> self._SHIFTS[None, :]) & np.uint64(1))
        acc = bits.astype(np.int64).sum(axis=0) * 2 - len(words)
        return int.from_bytes(np.packbits(acc > 0).tobytes(), "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self.simhash(t) for t in batch.column("text").to_pylist()]
        # store as int64 (two's complement) for Arrow friendliness
        signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hashes]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(signed, pa.int64())],
            names=["doc_id", "simhash"])


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word features (thin wrapper over the
    vectorized batch stage; kept as the unit-testable scalar surface)."""
    from ..util import task_udf
    return task_udf(SimHashBatch).simhash(text)


def simhash_batch(batch: pa.Table) -> pa.Table:
    from ..util import task_udf
    return task_udf(SimHashBatch)(batch)


def simhash_pairs(ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket on each of the 4 16-bit bands
    (a pair within Hamming<=3 of 64 bits shares at least one exact band),
    verify Hamming distance inside the bucket."""
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch.column("simhash").to_pylist(), dtype=np.int64)
        uh = sh.view(np.uint64)
        n = len(sh)
        doc = np.repeat(np.asarray(batch.column("doc_id").to_pylist(),
                                   dtype=np.int64), 4)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        key = np.empty(n * 4, dtype=np.int64)
        for bnd in range(4):
            key[bnd::4] = ((uh >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
                           ).astype(np.int64) + (bnd << 16)
        return pa.Table.from_arrays(
            [pa.array(doc, pa.int64()), pa.array(band, pa.int32()),
             pa.array(key, pa.int64()),
             pa.array(np.repeat(sh, 4), pa.int64())],
            names=["doc_id", "band", "band_key", "simhash"])

    banded = hashed.map_batches(band_rows, batch_format="pyarrow")

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        df = df[df.duplicated(subset=["band_key"], keep=False)]
        for _key, g in df.groupby("band_key", sort=False):
            if len(g) < 2:
                continue
            recs = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    a, b = recs[i], recs[j]
                    if a[0] == b[0]:
                        continue
                    ham = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
                    if ham <= max_hamming:
                        rows.append((int(a[0]), int(b[0]), int(ham)))
        return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "hamming"]
                            ).astype({"doc_id_a": "int64",
                                      "doc_id_b": "int64",
                                      "hamming": "int64"})

    pairs = _grouped_by_partition(banded, ["band_key"], resolve,
                                  n_parts=_cluster_parts())
    return _dedupe_pairs(pairs, ["hamming"])


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def char_ngrams(text: str, n: int = 3) -> set:
    return {text[i:i + n] for i in range(max(0, len(text) - n + 1))}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


_NGRAM_P = np.uint64(0x9E3779B97F4A7C15)


def _hashed_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Sorted UNIQUE uint64 hashes of the char-level n-grams of `text` —
    the vectorized twin of `char_ngrams` (same set semantics up to
    negligible 64-bit collisions).  UTF-32 decode keeps the windows
    char-exact (not byte-approximate); the polynomial rolls in uint64
    wraparound arithmetic, no Python loop."""
    if len(text) < n:
        return np.empty(0, np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(cps, n)
    p = int(_NGRAM_P)
    pows = np.array([pow(p, n - 1 - j, 1 << 64) for j in range(n)],
                    np.uint64)
    h = win @ pows  # uint64 matmul wraps mod 2**64 — intended
    h.sort()
    keep = np.empty(len(h), bool)
    keep[0] = True
    np.not_equal(h[1:], h[:-1], out=keep[1:])
    return h[keep]


def _jaccard_hashed(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique hashed-ngram arrays (matches
    ngram_jaccard's empty-set convention)."""
    if not len(a) and not len(b):
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def greedy_drop_ids(pairs_ds, *, n_parts: int = 16, max_rounds: int = 64,
                    worker_finish_threshold: int = 1_000_000):
    """Distributed keep-smallest near-dup resolution.

    Input: verified/candidate pairs ``(doc_id_a, doc_id_b)``.  Output: a
    Dataset with one column ``doc_id`` — the ids the deterministic
    greedy drops.  Semantics are byte-identical to the sequential rule
    "sort all (min,max)-normalized pairs; for each, if the smaller id is
    still kept, drop the larger" — i.e. the complement of the
    lexicographically-first maximal independent set of the near-dup
    graph — but computed by round-based distributed peeling with NO
    driver-side pair iteration:

      each round, a node that never appears as the max of a surviving
      pair has no smaller undetermined neighbour and is KEPT; the max
      partners of kept nodes are DROPPED; pairs touching a dropped node
      are resolved and removed.  Rounds ~ half the longest dup *chain*:
      clique-shaped dup clusters (the crawl-scale common case) finish in
      one round.

    Every step is a hash-partitioned shuffle of int64 pair rows
    (``_grouped_by_partition``); the driver holds only Dataset handles
    and a per-round row count.  Peeling rounds kill the clique mass;
    once the surviving pair count drops to ``worker_finish_threshold``
    the residual chain-tail resolves sequentially inside ONE worker
    task (``repartition(1)`` + map_batches — the recursion bottoming
    out, still never on the driver).  The result is distinct.
    """
    import ray
    import pyarrow.compute as pc

    def normalize(batch: pa.Table) -> pa.Table:
        a, b = batch.column("doc_id_a"), batch.column("doc_id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(lo, hi))

    def finish_in_worker(batch: pa.Table) -> pa.Table:
        norm = set(zip(batch.column("a").to_pylist(),
                       batch.column("b").to_pylist()))
        drop: set = set()
        for keep_id, drop_id in sorted(norm):
            if keep_id not in drop:
                drop.add(drop_id)
        return pa.table({"doc_id": pa.array(sorted(drop), pa.int64())})

    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    pairs = pairs_ds.map_batches(normalize,
                                 batch_format="pyarrow").materialize()
    drops = []
    for _ in range(max_rounds):
        n_pairs = pairs.count()
        if n_pairs == 0:
            break
        if n_pairs <= worker_finish_threshold:
            drops.append(pairs.repartition(1).map_batches(
                finish_in_worker, batch_format="pyarrow",
                batch_size=None).materialize())
            break

        # -- find this round's drops: group pair endpoints by node;
        # a node with no is_max row is a kept root -> its partners drop
        def node_rows(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            node = np.concatenate([a, b])
            other = np.concatenate([b, np.zeros(len(b), np.int64)])
            is_max = np.concatenate([np.zeros(len(a), np.int8),
                                     np.ones(len(b), np.int8)])
            return pa.table({"node": node, "other": other,
                             "is_max": pa.array(is_max, pa.int8())})

        def resolve_roots(df: pd.DataFrame) -> pd.DataFrame:
            has_smaller = df.loc[df.is_max == 1, "node"].unique()
            roots = df[(df.is_max == 0) & ~df.node.isin(has_smaller)]
            return pd.DataFrame(
                {"doc_id": roots["other"].unique().astype("int64")})

        d_new = _grouped_by_partition(
            pairs.map_batches(node_rows, batch_format="pyarrow"),
            ["node"], resolve_roots, n_parts=n_parts).materialize()
        if d_new.count() == 0:
            break  # cannot happen on a nonempty graph; safety only
        drops.append(d_new)

        # -- resolve pairs touching a dropped node: one membership
        # shuffle per endpoint (marker rows co-partitioned with pairs)
        def survivors(ds, key):
            markers = d_new.map_batches(
                lambda bb, _k=key: pa.table(
                    {"a": bb.column("doc_id") if _k == "a"
                     else pa.array([0] * bb.num_rows, pa.int64()),
                     "b": bb.column("doc_id") if _k == "b"
                     else pa.array([0] * bb.num_rows, pa.int64()),
                     "_m": pa.array([1] * bb.num_rows, pa.int8())}),
                batch_format="pyarrow")
            tagged = ds.map_batches(
                lambda bb: bb.append_column(
                    "_m", pa.array(np.zeros(bb.num_rows, np.int8),
                                   pa.int8())),
                batch_format="pyarrow").union(markers)

            def resolve(df: pd.DataFrame) -> pd.DataFrame:
                bad = df.loc[df._m == 1, key].unique()
                out = df[(df._m == 0) & ~df[key].isin(bad)]
                return out[["a", "b"]].astype("int64")

            return _grouped_by_partition(tagged, [key], resolve,
                                         n_parts=n_parts)

        pairs = survivors(survivors(pairs, "a"), "b").materialize()

    if not drops:
        return ray.data.from_arrow(empty)
    out = drops[0]
    for d in drops[1:]:
        out = out.union(d)
    # distinct (the same id can drop via several roots/rounds' partners)
    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_id"])
    return _grouped_by_partition(out, ["doc_id"], dedup, n_parts=n_parts)


def drop_rows_by_id(ds, drop_ids, *, id_col: str = "doc_id",
                    broadcast_limit: int = 1_000_000,
                    num_partitions=None):
    """Remove rows of `ds` whose `id_col` appears in the `drop_ids`
    Dataset (single ``doc_id`` column).  Bounded broadcast fast path
    (``ray.put`` + map-side ``is_in``) when the drop set is small, else
    a ``left_anti`` hash join on the id — the verify_pairs_jaccard
    dual-path shape."""
    import ray
    import pyarrow.compute as pc

    n_drop = drop_ids.count()
    if n_drop == 0:
        return ds
    if n_drop <= broadcast_limit:
        # type-preserving concat: the drop column may be int64 doc ids
        # or string urls — is_in and the anti join handle both.  Empty
        # blocks can carry a null-typed column (pandas-object schema
        # loss) — skip them; n_drop > 0 guarantees a real chunk exists
        chunks = [c for b in drop_ids.iter_batches(batch_format="pyarrow")
                  for c in b.column("doc_id").chunks if len(c)]
        ref = ray.put(pa.concat_arrays(chunks))

        def not_dropped(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column(id_col),
                                      value_set=ray.get(ref)))
            return batch.filter(mask)

        return ds.map_batches(not_dropped, batch_format="pyarrow")

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(32, cpus))
    right = drop_ids.map_batches(
        lambda b: pa.table({id_col: b.column("doc_id")}),
        batch_format="pyarrow")
    return ds.join(right, join_type="left_anti",
                   num_partitions=num_partitions, on=(id_col,))


def verify_pairs_jaccard(pairs_ds, docs_ds, *, n: int = 3,
                         threshold: float = 0.6, num_partitions=None,
                         broadcast_limit: int = 100_000):
    """Verify candidate pairs with exact n-gram Jaccard — scale-safe:

    1. pairs (tiny: LSH survivors) are pinned once so collecting their id
       set does not re-execute the LSH lineage;
    2. the DISTINCT candidate-id set is broadcast via ray.put and docs are
       filtered to it inside map_batches (map-side semi-join — the full
       corpus text never leaves the read stage);
    3a. candidate sets up to `broadcast_limit` ids take the FAST path:
       the filtered texts (bounded by the candidate count, NOT the
       corpus) broadcast once via ray.put and pairs verify in a plain
       map — no join machinery;
    3b. larger candidate sets attach texts to pairs via two hash joins
       partitioned on doc_id;
    4. the exact Jaccard check runs per surviving pair.

    No driver-side CORPUS materialization on either path — the broadcast
    fast path holds only candidate texts, the same bound as the join
    path's shuffle."""
    import ray
    import pyarrow.compute as pc

    if num_partitions is None:
        # join aggregators reserve CPU budget / num_partitions each; cap
        # partitions at the cluster CPU count so a join never deadlocks a
        # small session, while still fanning out on a real cluster
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(32, cpus))

    pairs = pairs_ds.materialize()  # bounded: LSH survivors
    # candidate-id collection in NUMPY, not a python set: at the 100M
    # scale check the survivor-id set is ~1M+ ids and a python int set
    # costs ~70 B/id on the DRIVER (plus the mapped plasma pages);
    # np.unique over int64 chunks is ~8 B/id and one pass
    id_parts = []
    for batch in pairs.select_columns(["doc_id_a", "doc_id_b"]) \
                      .iter_batches(batch_format="pyarrow"):
        for col in ("doc_id_a", "doc_id_b"):
            arr = batch.column(col).combine_chunks()
            id_parts.append(np.asarray(arr.to_numpy(
                zero_copy_only=False), np.int64))
    ids_arr = np.unique(np.concatenate(id_parts)) if id_parts \
        else np.empty(0, np.int64)
    if ids_arr.size == 0:
        # No candidates (clean corpus): short-circuit before the join
        # machinery.  CONTRACT NOTE (Ray 2.49): an empty Dataset —
        # even one built from a typed Arrow table — loses its
        # block-level schema, so hash-JOINING this result crashes
        # ("No match for FieldRef").  select_columns/iter_batches/
        # count are fine, and every in-repo consumer (ccprep's CC +
        # greedy paths, the query wrappers) counts or iterates before
        # any join; external callers must guard joins with a count.
        return ray.data.from_arrow(pa.table(
            {"doc_id_a": pa.array([], pa.int64()),
             "doc_id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}))
    id_set = pa.array(ids_arr, pa.int64())  # already unique + sorted
    ref = ray.put(id_set)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=ray.get(ref))
        out = batch.filter(mask)
        return pa.Table.from_arrays(
            [out.column("doc_id"), out.column("text")],
            names=["doc_id", "text"])

    # bounded by the candidate count -> safe (and single-executed) to pin
    docs_f = docs_ds.map_batches(keep_candidates,
                                 batch_format="pyarrow").materialize()

    if ids_arr.size <= broadcast_limit:
        lookup = {}
        for b in docs_f.iter_batches(batch_format="pyarrow"):
            for d, t in zip(b.column("doc_id").to_pylist(),
                            b.column("text").to_pylist()):
                lookup[d] = t
        lk_ref = ray.put(lookup)

        def verify_bc(batch: pa.Table) -> pa.Table:
            lk = ray.get(lk_ref)
            # memoized hashed-ngram arrays: each doc's set is built ONCE
            # per batch no matter how many pairs it appears in (dup
            # clusters make the pair list quadratic in cluster size)
            memo: dict = {}
            miss = object()  # None is a valid memo value (absent doc)

            def grams(i):
                g = memo.get(i, miss)
                if g is miss:
                    t = lk.get(i)
                    g = None if t is None else _hashed_ngrams(t, n)
                    memo[i] = g
                return g

            out = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
            for a, b in zip(batch.column("doc_id_a").to_pylist(),
                            batch.column("doc_id_b").to_pylist()):
                ga, gb = grams(a), grams(b)
                if ga is None or gb is None:
                    continue
                j = _jaccard_hashed(ga, gb)
                if j >= threshold:
                    out["doc_id_a"].append(a)
                    out["doc_id_b"].append(b)
                    out["jaccard"].append(j)
            return pa.Table.from_arrays(
                [pa.array(out["doc_id_a"], pa.int64()),
                 pa.array(out["doc_id_b"], pa.int64()),
                 pa.array(out["jaccard"], pa.float64())],
                names=["doc_id_a", "doc_id_b", "jaccard"])

        # large batches amortize the per-doc memo across pairs; memory is
        # bounded by unique-docs-per-batch x ~8 B/char of gram hashes
        return pairs.map_batches(verify_bc, batch_format="pyarrow",
                                 batch_size=32_768)

    def side(name):
        return docs_f.map_batches(
            lambda b, _n=name: pa.Table.from_arrays(
                [b.column("doc_id"), b.column("text")],
                names=[f"doc_id_{_n}", f"text_{_n}"]),
            batch_format="pyarrow")

    # the partition resolves that produced `pairs` emit EMPTY,
    # schema-less blocks for pair-free partitions; pyarrow's join key
    # resolution crashes on them ("No match ... FieldRef doc_id_a" —
    # reproduced on the 10M-doc ccprep run).  Repartition so no block
    # is empty (the ops/corpus._coalesce_nonempty guard, sized
    # ~64k rows/block).
    n_pairs = pairs.count()
    pairs = pairs.repartition(
        max(1, min(num_partitions, (n_pairs + 65535) // 65536)))
    docs_f = docs_f.repartition(
        max(1, min(num_partitions, (int(ids_arr.size) + 65535) // 65536)))
    # sequence the two joins (pin the tiny intermediate) so their
    # aggregator pools never contend for the same CPU budget at once
    joined = pairs.join(side("a"), join_type="inner",
                        num_partitions=num_partitions,
                        on=("doc_id_a",)).materialize()
    n_joined = joined.count()
    if n_joined == 0:
        # same contract note as the no-candidates short-circuit above:
        # consumers may select/iterate/count this typed-empty Dataset
        # but must not hash-join it without a row-count guard (Ray
        # 2.49 drops block schema on empty datasets)
        return ray.data.from_arrow(pa.table(
            {"doc_id_a": pa.array([], pa.int64()),
             "doc_id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}))
    # the first join's aggregators can also emit empty blocks
    joined = joined.repartition(
        max(1, min(num_partitions, (n_joined + 65535) // 65536)))
    joined = joined.join(side("b"), join_type="inner",
                         num_partitions=num_partitions, on=("doc_id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        memo: dict = {}  # doc_id -> hashed grams; dup clusters reuse it

        def grams(i, t):
            g = memo.get(i)
            if g is None:
                g = memo[i] = _hashed_ngrams(t, n)
            return g

        out = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
        for a, b, ta, tb in zip(batch.column("doc_id_a").to_pylist(),
                                batch.column("doc_id_b").to_pylist(),
                                batch.column("text_a").to_pylist(),
                                batch.column("text_b").to_pylist()):
            j = _jaccard_hashed(grams(a, ta), grams(b, tb))
            if j >= threshold:
                out["doc_id_a"].append(a)
                out["doc_id_b"].append(b)
                out["jaccard"].append(j)
        return pa.Table.from_arrays(
            [pa.array(out["doc_id_a"], pa.int64()),
             pa.array(out["doc_id_b"], pa.int64()),
             pa.array(out["jaccard"], pa.float64())],
            names=["doc_id_a", "doc_id_b", "jaccard"])

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact-threshold set-similarity self-join (prefix filtering)
# ---------------------------------------------------------------------------


def _doc_gram_sets(batch: pa.Table, id_col: str, text_col: str, n: int):
    """Distinct word n-gram hash SET per document -> (ids, doc_of, gh,
    sizes); gh is sorted ascending within each doc (lexsort order), so
    per-doc slices are ready for assume_unique set intersection."""
    from .corpus import _word_hashes, _gram_hashes
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    texts = batch.column(text_col).to_pylist()
    row_of, wh, _counts = _word_hashes(texts)
    if n == 1:
        grow, gh = row_of, wh
    else:
        grow, gh = _gram_hashes(row_of, wh, n)
    if len(gh) == 0:
        return (ids, np.empty(0, np.int64), np.empty(0, np.uint64),
                np.zeros(len(texts), np.int64))
    order = np.lexsort((gh, grow))
    g, r = gh[order], grow[order]
    first = np.concatenate(([True], (g[1:] != g[:-1]) | (r[1:] != r[:-1])))
    g, r = g[first], r[first]
    sizes = np.bincount(r, minlength=len(texts)).astype(np.int64)
    return ids, r, g, sizes


def _broadcast_candidate_grams(docs_ds, pairs, *, id_col: str,
                               text_col: str, n: int,
                               broadcast_limit: int, on_overflow: str):
    """Verify-tail helper shared by both exact ssjoins: collect the
    candidate doc ids appearing in `pairs`, fetch their distinct gram
    sets in ONE corpus scan, and broadcast them as THREE FLAT numpy
    arrays (ids_sorted, slice_bounds, grams_concat) via one ray.put.
    Flat arrays serialize zero-copy through the object store — a dict
    of per-doc arrays costs seconds to pickle on the driver and seconds
    more to unpickle in EVERY verify task (measured 5 s of a 6 s wall
    at sf0.1); the flat layout makes both ends near-free.  Grams stay
    sorted within each doc (the _doc_gram_sets contract), so per-pair
    slices feed assume_unique set intersection directly."""
    import ray

    parts = [np.empty(0, np.int64)]
    for b in pairs.iter_batches(batch_format="pyarrow"):
        parts.append(np.unique(np.concatenate([
            b.column("doc_id_a").to_numpy(zero_copy_only=False)
             .astype(np.int64),
            b.column("doc_id_b").to_numpy(zero_copy_only=False)
             .astype(np.int64)])))
    ids = np.unique(np.concatenate(parts))
    if len(ids) > broadcast_limit:
        raise ValueError(
            f"{len(ids)} candidate docs exceed broadcast_limit="
            f"{broadcast_limit}; {on_overflow}")
    id_ref = ray.put(pa.array(ids))

    def cand_grams(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "gram": pa.array([], pa.int64())})
        out = b.filter(pc.is_in(b.column(id_col),
                                value_set=ray.get(id_ref)))
        if out.num_rows == 0:
            return empty
        bids, r, g, _sizes = _doc_gram_sets(out, id_col, text_col, n)
        if not len(g):
            return empty
        return pa.table({"doc_id": pa.array(bids[r]),
                         "gram": pa.array(g.view(np.int64))})

    flat = docs_ds.map_batches(cand_grams, batch_format="pyarrow") \
        .to_pandas()
    doc = flat["doc_id"].to_numpy(np.int64)
    gram = flat["gram"].to_numpy(np.int64).view(np.uint64)
    order = np.argsort(doc, kind="stable")  # per-doc gram order kept
    doc, gram = doc[order], gram[order]
    uids, starts = np.unique(doc, return_index=True)
    bounds = np.concatenate((starts, [len(doc)])).astype(np.int64)
    return ray.put((uids, bounds, gram))


def _pair_gram_counts(lk, av: np.ndarray, bv: np.ndarray):
    """Exact per-pair set-intersection counts against the flat
    broadcast layout -> (valid_mask, n_inter, size_a, size_b).  The
    per-pair loop is bounded by the candidate-pair count and works on
    slices of one array — no dict lookups, no per-doc objects."""
    uids, bounds, gram = lk
    pos_a = np.searchsorted(uids, av)
    pos_b = np.searchsorted(uids, bv)
    np.clip(pos_a, 0, len(uids) - 1, out=pos_a)
    np.clip(pos_b, 0, len(uids) - 1, out=pos_b)
    ok = np.zeros(len(av), bool) if not len(uids) else \
        (uids[pos_a] == av) & (uids[pos_b] == bv)
    inter = np.zeros(len(av), np.int64)
    sa = np.zeros(len(av), np.int64)
    sb = np.zeros(len(av), np.int64)
    for i in np.flatnonzero(ok):
        a0, a1 = bounds[pos_a[i]], bounds[pos_a[i] + 1]
        b0, b1 = bounds[pos_b[i]], bounds[pos_b[i] + 1]
        sa[i], sb[i] = a1 - a0, b1 - b0
        if sa[i] and sb[i]:
            inter[i] = np.intersect1d(gram[a0:a1], gram[b0:b1],
                                      assume_unique=True).size
    ok &= (sa > 0) & (sb > 0)
    return ok, inter, sa, sb


def _driver_dedupe_pairs(cand, num_partitions: int):
    """Drain per-partition candidate pairs to the driver, dedupe with
    one lexsort, and rebuild a materialized Dataset sized for parallel
    verify.  Returns None when no candidates survive.  Bounded by the
    same near-dup-rate bound that justifies the broadcast verify (whose
    helper drains the pair list driver-side anyway) — replacing a full
    _grouped_by_partition exchange (A/B ~1.5 s at sf0.1)."""
    import ray

    a_parts = [np.empty(0, np.int64)]
    b_parts = [np.empty(0, np.int64)]
    for b in cand.iter_batches(batch_format="pyarrow"):
        a_parts.append(b.column("doc_id_a").to_numpy(
            zero_copy_only=False).astype(np.int64))
        b_parts.append(b.column("doc_id_b").to_numpy(
            zero_copy_only=False).astype(np.int64))
    a_all = np.concatenate(a_parts)
    b_all = np.concatenate(b_parts)
    if a_all.size == 0:
        return None
    order = np.lexsort((b_all, a_all))
    a_all, b_all = a_all[order], b_all[order]
    keep = np.r_[True, (a_all[1:] != a_all[:-1])
                 | (b_all[1:] != b_all[:-1])]
    a_all, b_all = a_all[keep], b_all[keep]
    pairs = ray.data.from_arrow(pa.table({
        "doc_id_a": pa.array(a_all), "doc_id_b": pa.array(b_all)}))
    n_parts = min(num_partitions, max(1, a_all.size // 32_768))
    if n_parts > 1:
        pairs = pairs.repartition(n_parts)
    return pairs.materialize()



def ssjoin_jaccard(docs_ds, *, n: int = 3, t_num: int = 1, t_den: int = 2,
                   hot_k: int = 2048, sample_mod: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None,
                   broadcast_limit: int = 500_000):
    """EXACT-threshold Jaccard set-similarity self-join via prefix
    filtering (Chaudhuri et al. 2006 / Vernica et al. 2010 shape) —
    the deterministic complement to minhash_lsh_pairs: every pair of
    documents whose distinct word-n-gram sets have Jaccard >= t_num /
    t_den, with NO probabilistic misses.  -> (doc_id_a, doc_id_b,
    n_inter, n_union), gated all-integer (n_inter * t_den >= t_num *
    n_union) so no float boundary can flip membership vs the SQL oracle.

    Scale shape:
      0. hot-token pass (optional, `hot_k`): gram frequencies over a
         deterministic 1/`sample_mod` doc sample, per-partition top-k,
         driver merge of <= n_parts x hot_k rows, ONE bounded broadcast.
         The canonical token order is (cold tokens by hash) < (hot
         tokens by ascending frequency) — the df-ascending approximation
         that keeps frequent tokens OUT of prefixes, so no prefix token
         group is ever stop-word-sized (the classic all-pairs blowup).
      1. prefix postings: map-side; doc with s distinct tokens emits its
         first s - ceil(t*s) + 1 tokens in canonical order (the prefix
         theorem: any pair with J >= t shares a prefix token under ANY
         fixed total order).
      2. candidate pairs: one token-keyed partition pass; within a token
         group all pairs pass the length filter min*t_den >= t_num*max.
         One more (a,b)-keyed pass dedupes pairs emitted by several
         shared prefix tokens.
      3. verify: candidates are BOUNDED (above-threshold pair rate ~
         near-dup rate, same bound verify_pairs_jaccard documents) ->
         candidate docs' gram sets broadcast once via ray.put, pairs
         verified in a map with exact sorted-set intersection.
         `broadcast_limit` guards the bound; beyond it, band the pairs
         through verify_pairs_jaccard's join path instead.
    """
    import ray
    import pyarrow.compute as pc

    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(32, cpus // 2))

    _P = np.uint64(0x9E3779B97F4A7C15)

    # ---- pass 0: hot-token canonical order (bounded broadcast) ----
    hot_ref = None
    if hot_k:
        def sample_counts(b: pa.Table) -> pa.Table:
            empty = pa.table({"gh": pa.array([], pa.int64()),
                              "cnt": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            ids, r, g, _sz = _doc_gram_sets(b, id_col, text_col, n)
            if not len(g):
                return empty
            dh = (ids[r].astype(np.uint64) * _P) >> np.uint64(33)
            m = (dh % np.uint64(sample_mod)) == 0
            if not m.any():
                return empty
            uq, ct = np.unique(g[m], return_counts=True)
            return pa.table({"gh": pa.array(uq.view(np.int64)),
                             "cnt": pa.array(ct.astype(np.int64))})

        def part_top(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"gh": pd.Series([], dtype=np.int64),
                                     "cnt": pd.Series([], dtype=np.int64)})
            s = df.groupby("gh", as_index=False)["cnt"].sum()
            return s[s["cnt"] > 1].nlargest(hot_k, "cnt")

        tops = _grouped_by_partition(
            docs_ds.map_batches(sample_counts, batch_format="pyarrow"),
            ["gh"], part_top, n_parts=num_partitions).to_pandas()
        if len(tops):
            # each gh lives in ONE partition, so per-partition sums are
            # global; merge the <= n_parts x hot_k survivors
            tops = tops.sort_values(["cnt", "gh"]).tail(hot_k)
            hot_wh = tops["gh"].to_numpy(np.int64).view(np.uint64)
            # ascending frequency -> ascending canonical key; most
            # frequent token sorts LAST (least likely in any prefix)
            hot_key = (np.uint64(1) << np.uint64(63)) \
                + np.arange(len(hot_wh), dtype=np.uint64)
            srt = np.argsort(hot_wh)
            hot_ref = ray.put((hot_wh[srt], hot_key[srt]))

    def canon(g: np.ndarray) -> np.ndarray:
        key = g >> np.uint64(1)  # cold: < 2**63
        if hot_ref is not None:
            hw, hk = ray.get(hot_ref)
            pos = np.minimum(np.searchsorted(hw, g), len(hw) - 1)
            m = hw[pos] == g
            key[m] = hk[pos[m]]
        return key

    # ---- pass 1: prefix postings (map-side; rank = the token's
    # position in the doc's canonical order, for the positional filter)
    def prefix_postings(b: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "doc": pa.array([], pa.int64()),
                          "size": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ids, r, g, sizes = _doc_gram_sets(b, id_col, text_col, n)
        if not len(g):
            return empty
        key = canon(g)
        order = np.lexsort((key, r))
        r2, k2 = r[order], key[order]
        starts = np.concatenate(([0], np.cumsum(sizes)))
        rank = np.arange(len(r2)) - starts[r2]
        s = sizes[r2]
        # prefix length p = s - ceil(s * t) + 1, all-integer
        p = s + ((-s * t_num) // t_den) + 1
        keep = rank < p
        return pa.table({"key": pa.array(k2[keep].view(np.int64)),
                         "doc": pa.array(ids[r2[keep]]),
                         "size": pa.array(s[keep]),
                         "rank": pa.array(rank[keep])})

    prefix = docs_ds.map_batches(prefix_postings, batch_format="pyarrow")

    # ---- pass 2: candidate pairs per prefix-token group ----
    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id_a": np.int64, "doc_id_b": np.int64}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        df = df.sort_values(["key", "doc"], kind="mergesort")
        key = df["key"].to_numpy(np.int64)
        doc = df["doc"].to_numpy(np.int64)
        size = df["size"].to_numpy(np.int64)
        grp_start = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1])))
        c = np.diff(np.concatenate((grp_start, [len(key)])))
        local = np.arange(len(key)) - np.repeat(grp_start, c)
        n_follow = np.repeat(c, c) - 1 - local
        total = int(n_follow.sum())
        if total == 0:
            return pd.DataFrame({c_: pd.Series([], dtype=t)
                                 for c_, t in cols.items()})
        a_idx = np.repeat(np.arange(len(key)), n_follow)
        off = np.concatenate(([0], np.cumsum(n_follow)))[:-1]
        b_idx = a_idx + (np.arange(total) - np.repeat(off, n_follow)) + 1
        sa, sb = size[a_idx], size[b_idx]
        ok = np.minimum(sa, sb) * t_den >= t_num * np.maximum(sa, sb)
        da, db = doc[a_idx][ok], doc[b_idx][ok]
        return pd.DataFrame({"doc_id_a": np.minimum(da, db),
                             "doc_id_b": np.maximum(da, db)}) \
            .drop_duplicates()

    cand = _grouped_by_partition(prefix, ["key"], gen_pairs,
                                 n_parts=num_partitions)

    empty_out = pa.table({"doc_id_a": pa.array([], pa.int64()),
                          "doc_id_b": pa.array([], pa.int64()),
                          "n_inter": pa.array([], pa.int64()),
                          "n_union": pa.array([], pa.int64())})
    pairs = _driver_dedupe_pairs(cand, num_partitions)
    if pairs is None:
        return ray.data.from_arrow(empty_out)

    # ---- pass 3: broadcast-verify the bounded candidate set (flat
    # zero-copy gram arrays; see _broadcast_candidate_grams) ----
    sets_ref = _broadcast_candidate_grams(
        docs_ds, pairs, id_col=id_col, text_col=text_col, n=n,
        broadcast_limit=broadcast_limit,
        on_overflow="raise the threshold or verify via the "
                    "verify_pairs_jaccard join path")

    def verify(b: pa.Table) -> pa.Table:
        lk = ray.get(sets_ref)
        av = b.column("doc_id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bv = b.column("doc_id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok, inter, sa, sb = _pair_gram_counts(lk, av, bv)
        union = sa + sb - inter
        keep = ok & (inter * t_den >= t_num * union)
        return pa.table({"doc_id_a": pa.array(av[keep]),
                         "doc_id_b": pa.array(bv[keep]),
                         "n_inter": pa.array(inter[keep]),
                         "n_union": pa.array(union[keep])})

    return pairs.map_batches(verify, batch_format="pyarrow",
                             batch_size=32_768)


def prefix_dedup_best(ds, *, k_words: int = 8, n_parts: int = 64):
    """Keep-BEST fuzzy-key dedup: docs sharing the same first `k_words`
    words keep only the longest variant (max n_chars, min doc_id on
    ties) -> (doc_id, n_chars).  The CCNet-style "keep the richest
    copy" policy, vs exact_dedup's keep-min-id.

    Combinable ARGMAX (the latest_event_per_user shape): every batch
    folds to one candidate per prefix present — the shuffle carries
    O(prefixes x blocks) rows of (prefix md5, doc_id, n_chars), never
    text — and ONE keyed partition pass picks the global winner."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pandas().fillna("")
        pfx = texts.str.split(" ").str[:k_words].str.join(" ")
        df = pd.DataFrame({
            "pfx_md5": [hashlib.md5(p.encode()).hexdigest()
                        for p in pfx],
            "doc_id": b.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "n_chars": pc.cast(b.column("n_chars"),
                               pa.int64()).to_numpy()})
        df = df.sort_values(["pfx_md5", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        best = df.groupby("pfx_md5", sort=False, as_index=False).first()
        return pa.Table.from_pandas(best, preserve_index=False)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "n_chars": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(["pfx_md5", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        best = df.groupby("pfx_md5", sort=False, as_index=False).first()
        return best[["doc_id", "n_chars"]]

    cands = ds.map_batches(partial, batch_format="pyarrow")
    return _grouped_by_partition(cands, ["pfx_md5"], resolve,
                                 n_parts=n_parts)


def ssjoin_containment(docs_ds, *, n: int = 3, t_num: int = 3,
                       t_den: int = 4, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_partitions: int | None = None,
                       broadcast_limit: int = 500_000):
    """EXACT-threshold CONTAINMENT self-join (directional subset
    similarity): every ordered pair (a, b) with
    |grams(a) & grams(b)| / |grams(a)| >= t_num/t_den, a != b ->
    (doc_id_a, doc_id_b, n_inter, n_a), all-integer gate
    (n_inter * t_den >= t_num * n_a).  Finds QUOTED/SUBSET duplicates
    that symmetric Jaccard misses (a short doc fully contained in a
    long one has low Jaccard but containment 1.0).

    Scale shape (ssjoin_jaccard's passes, asymmetric variant):
      1. postings: map-side, every doc emits ALL distinct gram hashes
         with a prefix flag on its s - ceil(t*s) + 1 smallest (the
         prefix theorem applies to the CONTAINED side only; the
         container side must be fully indexed).
      2. candidates: one gram-keyed partition pass pairs prefix-flagged
         rows against every co-occurring doc, directional length filter
         s_b * t_den >= t_num * s_a; one (a,b)-keyed dedupe pass.
      3. verify: bounded candidate set, gram sets broadcast once, exact
         sorted intersection, both directions gated independently.
    Known cost: full postings make hot-gram groups df-sized — the
    containment join's inherent index weight.  At crawl scale, band
    hot grams (star_bucket style) or pre-gate probe docs; here the
    corpus-wide gram df is bounded by the synthetic vocabulary."""
    import ray

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(32, cpus // 2))

    def postings(b: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "doc": pa.array([], pa.int64()),
                          "size": pa.array([], pa.int64()),
                          "pfx": pa.array([], pa.int8())})
        if b.num_rows == 0:
            return empty
        ids, r, g, sizes = _doc_gram_sets(b, id_col, text_col, n)
        if not len(g):
            return empty
        order = np.lexsort((g, r))
        r2, g2 = r[order], g[order]
        starts = np.concatenate(([0], np.cumsum(sizes)))
        rank = np.arange(len(r2)) - starts[r2]
        s = sizes[r2]
        p = s + ((-s * t_num) // t_den) + 1
        return pa.table({"key": pa.array(g2.view(np.int64)),
                         "doc": pa.array(ids[r2]),
                         "size": pa.array(s),
                         "pfx": pa.array((rank < p).astype(np.int8))})

    posts = docs_ds.map_batches(postings, batch_format="pyarrow")

    def gen_pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id_a": np.int64, "doc_id_b": np.int64}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        df = df.sort_values(["key", "doc"], kind="mergesort")
        key = df["key"].to_numpy(np.int64)
        doc = df["doc"].to_numpy(np.int64)
        size = df["size"].to_numpy(np.int64)
        pfx = df["pfx"].to_numpy(np.int8)
        # ALL gram groups at once: every prefix-flagged row probes its
        # whole group — a_idx repeats each flagged row by its group
        # size, b_idx walks the group's range (one flat-array pass, no
        # per-group Python loop)
        first = np.concatenate(([True], key[1:] != key[:-1]))
        gid = np.cumsum(first) - 1
        grp_start = np.flatnonzero(first)
        c = np.diff(np.concatenate((grp_start, [len(key)])))
        flagged = np.flatnonzero(pfx == 1)
        fg = gid[flagged]
        reps = c[fg]
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({cn: pd.Series([], dtype=t)
                                 for cn, t in cols.items()})
        a_idx = np.repeat(flagged, reps)
        off = np.concatenate(([0], np.cumsum(reps)))[:-1]
        within = np.arange(total) - np.repeat(off, reps)
        b_idx = np.repeat(grp_start[fg], reps) + within
        m = (doc[a_idx] != doc[b_idx]) \
            & (size[b_idx] * t_den >= t_num * size[a_idx])
        return pd.DataFrame({
            "doc_id_a": doc[a_idx][m],
            "doc_id_b": doc[b_idx][m]}).drop_duplicates()

    cand = _grouped_by_partition(posts, ["key"], gen_pairs,
                                 n_parts=num_partitions)
    empty_out = pa.table({"doc_id_a": pa.array([], pa.int64()),
                          "doc_id_b": pa.array([], pa.int64()),
                          "n_inter": pa.array([], pa.int64()),
                          "n_a": pa.array([], pa.int64())})
    pairs = _driver_dedupe_pairs(cand, num_partitions)
    if pairs is None:
        return ray.data.from_arrow(empty_out)

    sets_ref = _broadcast_candidate_grams(
        docs_ds, pairs, id_col=id_col, text_col=text_col, n=n,
        broadcast_limit=broadcast_limit,
        on_overflow="band hot grams or pre-gate probes")

    def verify(b: pa.Table) -> pa.Table:
        lk = ray.get(sets_ref)
        av = b.column("doc_id_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bv = b.column("doc_id_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok, inter, sa, _sb = _pair_gram_counts(lk, av, bv)
        keep = ok & (inter * t_den >= t_num * sa)
        return pa.table({"doc_id_a": pa.array(av[keep]),
                         "doc_id_b": pa.array(bv[keep]),
                         "n_inter": pa.array(inter[keep]),
                         "n_a": pa.array(sa[keep])})

    return pairs.map_batches(verify, batch_format="pyarrow",
                             batch_size=32_768)


def _levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Exact Levenshtein distance over BYTES (DuckDB's levenshtein()
    is byte-based: levenshtein('héllo','hello') = 2).  Row DP where
    the left-neighbor dependency resolves as a min-plus prefix scan:
    cur[j] = min_k<=j (t[k] + (j-k)) = j + cummin(t - idx)[j], so the
    inner loop is pure numpy — no per-cell Python."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b, np.uint8)
    m = len(bv)
    prev = np.arange(m + 1, dtype=np.int64)
    idx = np.arange(m + 1, dtype=np.int64)
    for i, ca in enumerate(a):
        t = np.empty(m + 1, np.int64)
        t[0] = i + 1
        t[1:] = np.minimum(prev[1:] + 1, prev[:-1] + (bv != ca))
        prev = np.minimum.accumulate(t - idx) + idx
    return int(prev[m])


def adjacent_edit_distance(ds, *, max_bytes: int = 400,
                           n_parts: int = 32):
    """Exact byte-Levenshtein over consecutive-id document pairs:
    every (doc_id, doc_id+1) pair where BOTH texts are <= `max_bytes`
    UTF-8 bytes -> (doc_id_a, doc_id_b, len_a, len_b, dist).  The
    edit-distance verify kernel of a near-dup pipeline, demonstrated
    on a deterministic O(n) pair set (in production the pair stream
    comes from LSH candidates — same keyed-pair resolve, different
    pair source); the byte cap bounds the O(len^2) DP per pair.

    Scale shape: each qualifying doc emits <= 2 (pair_id, role) rows
    map-side (only text that passes the cap moves), ONE pair-keyed
    partition pass assembles both roles and runs the numpy row-DP —
    pairs are independent, so partitions parallelize freely."""

    def emit(b: pa.Table) -> pa.Table:
        schema = {"pair_id": pa.array([], pa.int64()),
                  "doc_id": pa.array([], pa.int64()),
                  "role": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())}
        if b.num_rows == 0:
            return pa.table(schema)
        txt = pc.coalesce(pc.cast(b.column("text"), pa.string()),
                          pa.scalar(""))
        nb = pc.binary_length(pc.cast(txt, pa.binary())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ok = nb <= max_bytes
        if not ok.any():
            return pa.table(schema)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[ok]
        ts = txt.to_pandas().to_numpy(object)[ok]
        pair = np.concatenate([ids, ids - 1])
        role = np.concatenate([np.zeros(len(ids), np.int64),
                               np.ones(len(ids), np.int64)])
        return pa.table({"pair_id": pa.array(pair),
                         "doc_id": pa.array(np.concatenate([ids, ids])),
                         "role": pa.array(role),
                         "text": pa.array(np.concatenate([ts, ts]),
                                          pa.string())})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id_a": "int64", "doc_id_b": "int64",
                "len_a": "int64", "len_b": "int64", "dist": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        g = df.sort_values(["pair_id", "role"], kind="mergesort")
        pid = g["pair_id"].to_numpy(np.int64)
        role = g["role"].to_numpy(np.int64)
        txt = g["text"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, pid[1:] != pid[:-1]])
        sizes = np.diff(np.r_[starts, len(pid)])
        rows = []
        for st, sz in zip(starts, sizes):
            if sz != 2 or role[st] != 0 or role[st + 1] != 1:
                continue
            a = str(txt[st]).encode("utf-8")
            bb = str(txt[st + 1]).encode("utf-8")
            rows.append({"doc_id_a": int(pid[st]),
                         "doc_id_b": int(pid[st]) + 1,
                         "len_a": len(a), "len_b": len(bb),
                         "dist": _levenshtein_bytes(a, bb)})
        if not rows:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        return pd.DataFrame(rows).astype(cols)

    pairs = ds.map_batches(emit, batch_format="pyarrow")
    return _grouped_by_partition(pairs, ["pair_id"], resolve,
                                 n_parts=n_parts)


def source_dup_rate(ds, *, n_parts: int = 32):
    """Per-source exact-duplicate pressure: share of docs whose text
    md5 occurs more than once WITHIN the source -> (source, n_docs,
    n_dup_docs, dup_ppm).  The release-gate metric that decides
    whether a source needs the full dedup chain.

    Scale shape: map-side (source, md5) local pre-count, one native
    groupby sum over fingerprints (never text), then a bounded
    per-source fold — the exact_dedup exchange discipline reused as
    a metric."""
    from ray.data.aggregate import Sum

    def pre(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "h": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        txt = pc.coalesce(pc.cast(b.column("text"), pa.string()),
                          pa.scalar("")).to_pandas().to_numpy(object)
        h = [hashlib.md5(str(t).encode("utf-8")).hexdigest()
             for t in txt]
        g = pd.DataFrame({"source": b.column("source").to_pandas()
                          .to_numpy(object), "h": h}) \
            .groupby(["source", "h"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({"source": pa.array(idx["source"],
                                            pa.string()),
                         "h": pa.array(idx["h"], pa.string()),
                         "cnt": pa.array(g.to_numpy(np.int64))})

    counts = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(["source", "h"]).aggregate(Sum("cnt"))

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_dup_docs": pa.array([], pa.int64())})
        cnt = pc.cast(b.column("sum(cnt)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        g = pd.DataFrame({
            "source": b.column("source").to_pandas().to_numpy(object),
            "n_docs": cnt,
            "n_dup_docs": np.where(cnt > 1, cnt, 0)}) \
            .groupby("source", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = counts.map_batches(fold, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_docs"), Sum("n_dup_docs"))

    def finish(b: pa.Table) -> pa.Table:
        nd = pc.cast(b.column("sum(n_docs)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        du = pc.cast(b.column("sum(n_dup_docs)"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "source": pc.cast(b.column("source"), pa.string()),
            "n_docs": pa.array(nd), "n_dup_docs": pa.array(du),
            "dup_ppm": pa.array(du * 1_000_000
                                // np.maximum(nd, 1))})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact duplicated-substring spans (suffix-array semantics, Lee et al. 2022)
# ---------------------------------------------------------------------------


def sa_dup_spans(ds, *, min_len: int = 8, n_parts=None):
    """EXACT duplicated-substring spans >= `min_len` tokens — the
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022) ExactSubstr semantics, built as a DISTRIBUTED
    PREFIX-DOUBLING suffix equivalence (Manber-Myers rounds on
    `_grouped_by_partition`) instead of a monolithic suffix array:

    - round 0: token equality classes (rank = group-min packed
      (doc, pos) — EXACT representatives, no hashing in any decision);
    - round t: rank_{t}[p] = class of (rank[p], rank[p + 2^(t-1)]),
      formed by ONE position-aligned pass (dense per-doc positions,
      bucket ghosts carry ranks backward) + ONE pair-keyed class pass;
    - final key (rank[p], rank[p + min_len - 2^T]) compares windows of
      exactly `min_len` tokens; classes with >= 2 window-valid members
      are duplicated windows; per-doc interval union (windows merge
      when starts differ <= min_len) yields maximal spans.

    Tokenization contract (shared with the DuckDB oracle): single-space
    split, empty tokens dropped, positions over the filtered list.

    Returns Dataset (doc_id, start_tok, end_tok, n_tokens).

    Scale shape: every pass is a hash-partitioned exchange over
    (doc, pos, rank) int64 rows — no global sort, no driver
    materialization; 2*ceil(log2(min_len)) + 3 passes total.  Rank
    representatives pack (doc_id * P + pos) into int64 where P is the
    max per-doc token count rounded up to a power of two (bound checked
    at run time; at 10^12-doc scale switch the representative to the
    two-column (doc, pos) form)."""
    import ray
    from ray.data.aggregate import Max

    parts = n_parts or _cluster_parts()
    # position bucket size.  The ghost scheme is EXACT for any align
    # step k (ghosts are emitted directly into bucket (pos-k)//B, so
    # correctness never depends on B vs k); B only tunes shuffle
    # granularity — min_len > B is fine.
    B = 4096

    def tokenize(b: pa.Table) -> pa.Table:
        """Columnar (doc, pos, tok, valid) expansion — single-space
        split + explode, empty tokens dropped, positions over the
        filtered list (same contract as the DuckDB oracle).  Fully
        vectorized: no per-token Python (this stage touches every
        token of the corpus)."""
        cols = {"doc": pa.int64(), "pos": pa.int64(),
                "tok": pa.string(), "valid": pa.bool_()}
        doc = b.column("doc_id").to_pandas()
        keep = doc.notna()
        doc = doc[keep]
        txt = b.column("text").to_pandas()[keep].fillna("")
        s = txt.str.split(" ").explode()
        s = s[s.str.len() > 0]
        idx = s.index.to_numpy()
        if len(idx) == 0:
            return pa.table({k: pa.array([], t) for k, t in cols.items()})
        # tokens of one row are contiguous after explode: segmented
        # arange gives filtered positions, run lengths give doc sizes
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        run_len = np.diff(np.r_[starts, len(idx)])
        pos = np.arange(len(idx)) - np.repeat(starts, run_len)
        n_tok = np.repeat(run_len, run_len)
        return pa.table({
            "doc": pa.array(doc.loc[idx].to_numpy(np.int64), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "tok": pa.array(s.to_numpy(), pa.string()),
            "valid": pa.array(pos + min_len <= n_tok, pa.bool_())})

    out_cols = {"doc_id": "int64", "start_tok": "int64",
                "end_tok": "int64", "n_tokens": "int64"}
    empty = pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    toks = ds.map_batches(tokenize, batch_format="pyarrow") \
        .materialize()
    if toks.count() == 0:
        # empty results lose their Dataset schema in Ray 2.49 — the
        # repo-wide convention is the typed pandas empty instead
        return empty
    max_pos = toks.aggregate(Max("pos"))["max(pos)"]
    # P must cover the largest LOOKUP offset pos + k (k <= min_len),
    # or packed keys alias into the next doc's range
    P = 1 << int(max_pos + min_len + 1).bit_length()

    def pack(doc: np.ndarray, pos: np.ndarray) -> np.ndarray:
        out = doc * P + pos
        if (out // P != doc).any():
            raise ValueError("doc_id*P overflows int64 — use the "
                             "two-column representative at this scale")
        return out

    def class_pass(df: pd.DataFrame) -> pd.DataFrame:
        """Assign rank = group-min packed (doc,pos) per key group."""
        cols = {"doc": "int64", "pos": "int64", "r": "int64",
                "valid": "bool"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        rep = pack(df["doc"].to_numpy(np.int64),
                   df["pos"].to_numpy(np.int64))
        df = df.assign(_rep=rep)
        r = df.groupby(["k1", "k2"], sort=False)["_rep"] \
            .transform("min")
        return pd.DataFrame({
            "doc": df["doc"].to_numpy(np.int64),
            "pos": df["pos"].to_numpy(np.int64),
            "r": r.to_numpy(np.int64),
            "valid": df["valid"].to_numpy(bool)}).astype(cols)

    # round 0: token classes (k1 = token, k2 constant)
    def tok_key(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc": b.column("doc"), "pos": b.column("pos"),
            "valid": b.column("valid"), "k1": b.column("tok"),
            "k2": pa.array(np.zeros(b.num_rows, np.int64))})

    ranked = _grouped_by_partition(
        toks.map_batches(tok_key, batch_format="pyarrow"),
        ["k1"], class_pass, n_parts=parts).materialize()

    def align(ranked_ds, k: int):
        """One position-aligned pass: emit (doc,pos,valid,k1=r[p],
        k2=r[p+k] or unique sentinel)."""
        def prep(b: pa.Table) -> pa.Table:
            doc = b.column("doc").to_numpy(zero_copy_only=False)
            pos = b.column("pos").to_numpy(zero_copy_only=False)
            r = b.column("r").to_numpy(zero_copy_only=False)
            v = b.column("valid").to_numpy(zero_copy_only=False)
            bkt = pos // B
            ghost_sel = (pos - k) // B != bkt
            out = {
                "doc": np.concatenate([doc, doc[ghost_sel]]),
                "pos": np.concatenate([pos, pos[ghost_sel]]),
                "r": np.concatenate([r, r[ghost_sel]]),
                "valid": np.concatenate([v, v[ghost_sel]]),
                "bucket": np.concatenate([bkt,
                                          (pos - k)[ghost_sel] // B]),
            }
            return pa.table({c: pa.array(a) for c, a in out.items()})

        def resolve(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"doc": "int64", "pos": "int64", "valid": "bool",
                    "k1": "int64", "k2": "int64"}
            if len(df) == 0:
                return pd.DataFrame(columns=list(cols)).astype(cols)
            df = df.drop_duplicates(["doc", "pos", "bucket"])
            doc = df["doc"].to_numpy(np.int64)
            pos = df["pos"].to_numpy(np.int64)
            r = df["r"].to_numpy(np.int64)
            v = df["valid"].to_numpy(bool)
            own = df["bucket"].to_numpy(np.int64) == pos // B
            key = pack(doc, pos)
            order = np.argsort(key, kind="stable")
            skey = key[order]
            sr = r[order]
            want = pack(doc[own], pos[own] + k)
            idx = np.searchsorted(skey, want)
            found = (idx < len(skey))
            idx_c = np.minimum(idx, len(skey) - 1)
            found &= skey[idx_c] == want
            k2 = np.where(found, sr[idx_c],
                          -pack(doc[own], pos[own]) - 1)
            return pd.DataFrame({
                "doc": doc[own], "pos": pos[own],
                "valid": v[own], "k1": r[own],
                "k2": k2.astype(np.int64)}).astype(cols)

        return _grouped_by_partition(
            ranked_ds.map_batches(prep, batch_format="pyarrow"),
            ["doc", "bucket"], resolve, n_parts=parts)

    step = 1
    while step * 2 < min_len:
        ranked = _grouped_by_partition(
            align(ranked, step), ["k1", "k2"], class_pass,
            n_parts=parts).materialize()
        step *= 2
    # final window key: prefixes of exactly min_len tokens
    final = align(ranked, min_len - step)

    def dup_pass(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc": "int64", "pos": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df[df["valid"]]
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        sz = df.groupby(["k1", "k2"], sort=False)["doc"] \
            .transform("size")
        hit = df[sz >= 2]
        return pd.DataFrame({
            "doc": hit["doc"].to_numpy(np.int64),
            "pos": hit["pos"].to_numpy(np.int64)}).astype(cols)

    flagged = _grouped_by_partition(final, ["k1", "k2"], dup_pass,
                                    n_parts=parts)

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "start_tok": "int64",
                "end_tok": "int64", "n_tokens": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values(["doc", "pos"])
        doc = df["doc"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        brk = np.ones(len(df), bool)
        if len(df) > 1:
            same = doc[1:] == doc[:-1]
            near = (pos[1:] - pos[:-1]) <= min_len
            brk[1:] = ~(same & near)
        isl = np.cumsum(brk)
        g = pd.DataFrame({"doc": doc, "pos": pos, "isl": isl}) \
            .groupby("isl", sort=False) \
            .agg(doc_id=("doc", "first"), start_tok=("pos", "min"),
                 end_tok=("pos", "max"))
        g["end_tok"] += min_len - 1
        g["n_tokens"] = g["end_tok"] - g["start_tok"] + 1
        return g.reset_index(drop=True).astype(cols)

    spans = _grouped_by_partition(flagged, ["doc"], islands,
                                  n_parts=parts).materialize()
    if spans.count() == 0:
        return empty
    return spans
