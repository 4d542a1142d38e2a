"""Deduplication operators (Ray Data native).

- exact_dedup: md5(text) hash-partitioned groupby, keep min(doc_id).
  The shuffle key is the 16-byte digest, never the text itself.
- minhash_lsh_pairs: word-shingle MinHash signatures (vectorized numpy),
  banded LSH (b bands x r rows), groupby on (band, band_hash) buckets,
  candidate pairs emitted per bucket, global pair dedup.  The classic
  shingle->minhash->band->bucket-groupby plan: the only all-to-all is on
  tiny (band_hash, sig) rows, pre-aggregated per batch.
- simhash_pairs: 64-bit SimHash, 4x16-bit band bucketing, Hamming<=3 check
  inside buckets.
- ngram_jaccard: exact character-n-gram Jaccard verification for candidate
  pairs (the verify stage after LSH).
"""
from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _md5_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.Table.from_arrays(
        [pa.array(digests, pa.string()), batch.column("doc_id")],
        names=["text_md5", "doc_id"])


def exact_dedup_groups(ds):
    """-> (doc_id = min per identical text, n_dups).  groupby shuffles only
    (md5, doc_id) pairs."""
    hashed = ds.map_batches(_md5_batch, batch_format="pyarrow")
    agg = hashed.groupby("text_md5").min("doc_id")
    counts = hashed.groupby("text_md5").count()
    # join the two small aggregates on the driver side would materialize;
    # instead compute both in one map_groups pass:
    def per_group(df):
        import pandas as pd
        return pd.DataFrame({
            "doc_id": [int(df["doc_id"].min())],
            "n_dups": [int(len(df))],
        })
    del agg, counts
    return hashed.groupby("text_md5").map_groups(per_group, batch_format="pandas")


def exact_dedup_keep_first(ds):
    """Full dedup: one surviving row (min doc_id) per distinct text."""
    hashed = ds.map_batches(_md5_batch, batch_format="pyarrow")
    def keep_first(df):
        return df.sort_values("doc_id").head(1)[["doc_id"]]
    return hashed.groupby("text_md5").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (uint64)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
    return out


class MinHashBatch:
    """Stateful stage: permutation params computed once per actor
    (SURVEY.md §2.3 pattern).  Emits one row per (doc, band)."""

    def __init__(self, n_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        self.n_perm = n_perm
        self.bands = bands
        self.rows_per_band = n_perm // bands
        self.shingle_k = shingle_k
        self.a, self.b = _perm_params(n_perm)

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_k)
        if len(h) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (n_perm, n_shingles): ((a*h + b) mod p), min over shingles
        v = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_bucket, out_sig = [], [], [], []
        r = self.rows_per_band
        for doc_id, text in zip(doc_ids, texts):
            sig = self.signature(text)
            sig_bytes = sig.tobytes()
            for band in range(self.bands):
                band_slice = sig[band * r:(band + 1) * r]
                bucket = hashlib.blake2b(band_slice.tobytes(),
                                         digest_size=8).hexdigest()
                out_doc.append(doc_id)
                out_band.append(band)
                out_bucket.append(bucket)
                out_sig.append(sig_bytes)
        return pa.Table.from_arrays(
            [pa.array(out_doc, pa.int64()), pa.array(out_band, pa.int32()),
             pa.array(out_bucket, pa.string()), pa.array(out_sig, pa.binary())],
            names=["doc_id", "band", "bucket", "sig"])


def _bucket_pairs(df, n_perm: int, threshold: float):
    """Candidate pairs within one LSH bucket, scored by signature overlap."""
    import pandas as pd
    rows = []
    if len(df) > 1:
        docs = df["doc_id"].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in df["sig"]]
        order = np.argsort(docs)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                a, b = order[ii], order[jj]
                if docs[a] == docs[b]:
                    continue
                est = float(np.mean(sigs[a] == sigs[b]))
                if est >= threshold:
                    rows.append((int(docs[a]), int(docs[b]), est))
    return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "est_jaccard"])


def minhash_lsh_pairs(ds, *, n_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5,
                      concurrency=None):
    """Near-duplicate candidate pairs with estimated Jaccard >= threshold.
    Pairs found in several buckets are deduped by a final tiny groupby."""
    from ..util import default_concurrency
    if concurrency is None:
        concurrency = default_concurrency()
    banded = ds.map_batches(
        MinHashBatch,
        fn_constructor_kwargs={"n_perm": n_perm, "bands": bands,
                               "shingle_k": shingle_k},
        batch_format="pyarrow", concurrency=concurrency)
    pairs = banded.groupby(["band", "bucket"]).map_groups(
        lambda df: _bucket_pairs(df, n_perm, threshold), batch_format="pandas")

    def first_pair(df):
        return df.sort_values("est_jaccard", ascending=False).head(1)
    return pairs.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        first_pair, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word features."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += np.where(bits.astype(np.int64) == 1, 1, -1)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= (1 << (63 - i))
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id")
    hashes = [simhash64(t) for t in batch.column("text").to_pylist()]
    # store as int64 (two's complement) for Arrow friendliness
    signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hashes]
    return pa.Table.from_arrays(
        [doc_ids, pa.array(signed, pa.int64())], names=["doc_id", "simhash"])


def simhash_pairs(ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket on each of the 4 16-bit bands
    (a pair within Hamming<=3 of 64 bits shares at least one exact band),
    verify Hamming distance inside the bucket."""
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        doc, band, key, sh = [], [], [], []
        for d, h in zip(batch.column("doc_id").to_pylist(),
                        batch.column("simhash").to_pylist()):
            uh = h & ((1 << 64) - 1)
            for bnd in range(4):
                doc.append(d)
                band.append(bnd)
                key.append((uh >> (16 * bnd)) & 0xFFFF)
                sh.append(h)
        return pa.Table.from_arrays(
            [pa.array(doc, pa.int64()), pa.array(band, pa.int32()),
             pa.array(key, pa.int32()), pa.array(sh, pa.int64())],
            names=["doc_id", "band", "band_key", "simhash"])

    banded = hashed.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(df):
        import pandas as pd
        rows = []
        if len(df) > 1:
            recs = sorted(zip(df["doc_id"], df["simhash"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    a, b = recs[i], recs[j]
                    if a[0] == b[0]:
                        continue
                    ham = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
                    if ham <= max_hamming:
                        rows.append((int(a[0]), int(b[0]), int(ham)))
        return pd.DataFrame(rows, columns=["doc_id_a", "doc_id_b", "hamming"])

    pairs = banded.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def first_pair(df):
        return df.head(1)
    return pairs.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        first_pair, batch_format="pandas")


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


def verify_pairs_jaccard(pairs_ds, docs_ds, *, n: int = 3, threshold: float = 0.6):
    """Verify candidate pairs with exact n-gram Jaccard.  The docs side is
    broadcast via ray.put (small-side lookup inside map_batches, no shuffle
    join) — callers at true scale should pre-filter docs to candidate ids."""
    import ray
    id_to_text = {}
    for batch in docs_ds.iter_batches(batch_format="pyarrow"):
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            id_to_text[d] = t
    ref = ray.put(id_to_text)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        out = {"doc_id_a": [], "doc_id_b": [], "jaccard": []}
        for a, b in zip(batch.column("doc_id_a").to_pylist(),
                        batch.column("doc_id_b").to_pylist()):
            ta, tb = lookup.get(a), lookup.get(b)
            if ta is None or tb is None:
                continue
            j = ngram_jaccard(ta, tb, n)
            if j >= threshold:
                out["doc_id_a"].append(a)
                out["doc_id_b"].append(b)
                out["jaccard"].append(j)
        return pa.Table.from_arrays(
            [pa.array(out["doc_id_a"], pa.int64()),
             pa.array(out["doc_id_b"], pa.int64()),
             pa.array(out["jaccard"], pa.float64())],
            names=["doc_id_a", "doc_id_b", "jaccard"])

    return pairs_ds.map_batches(verify, batch_format="pyarrow")
