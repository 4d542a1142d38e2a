"""Sketch operators: HyperLogLog approximate distinct counting.

The mergeable-sketch pattern for 100-TB streams: every batch folds its
rows into a fixed-size register array per group (map-side combine — the
shuffle carries one 2^p-byte sketch per group per block, independent of
row count), one groupby merges sketches by element-wise max, and the
estimator runs on the tiny merged result.  Standard HLL from the public
Flajolet et al. 2007 paper with the usual small/large-range corrections.

Exact counterpart for verification: ops/analytics.py:distinct_count.
"""
from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hash64(values) -> np.ndarray:
    """Stable vectorized 64-bit hashes.  Numeric arrays take pandas'
    splitmix64-style finalizer (pure C, excellent avalanche for HLL
    register selection); everything else goes through the deterministic
    fixed-key siphash of pd.util.hash_array on str() values.  Both are
    process-independent (no PYTHONHASHSEED)."""
    arr = np.asarray(values, dtype=object)
    try:
        num = arr.astype(np.int64)
    except (TypeError, ValueError, OverflowError):
        return pd.util.hash_array(
            np.asarray([str(v) for v in arr], dtype=object)
        ).astype(np.uint64)
    return pd.util.hash_array(num).astype(np.uint64)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate(registers: np.ndarray) -> float:
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((registers == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return float(est)


def hll_sketch_batch(values, p: int = 12) -> np.ndarray:
    """Fold values into a fresh 2^p-register HLL sketch (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64((1 << 64) - 1)
    # rank = leading zeros of the remaining 64-p bits, +1 (cap 64-p+1).
    # Integral bit-position (ADVICE r2): float64 log2 rounds 2^k-eps up
    # to 2^k for remainders >= 2^53, biasing the rank by one.
    nz = rest != 0
    lead = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        v = rest[nz].copy()
        top = np.zeros(len(v), dtype=np.uint8)  # floor(log2(v)), exact
        for s in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(s))
            top[big] += np.uint8(s)
            v[big] >>= np.uint64(s)
        lead[nz] = (63 - top) + 1
    np.maximum.at(regs, idx, lead)
    return regs


def approx_distinct_count(ds, group_col: str, value_col: str, *,
                          p: int = 12):
    """Approximate count(distinct value) per group -> (group,
    n_distinct_approx:int64).  Typical error ~1.04/sqrt(2^p) (~1.6% at
    p=12)."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        groups = []
        sketches = []
        for g, sub in df.groupby(group_col, sort=False):
            groups.append(g)
            sketches.append(hll_sketch_batch(sub[value_col].tolist(), p).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "sketch": pa.array(sketches, pa.binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for s in df["sketch"]:
            regs = np.maximum(regs, np.frombuffer(s, dtype=np.uint8))
        return pd.DataFrame({group_col: [df[group_col].iloc[0]],
                             "n_distinct_approx": [int(round(_estimate(regs)))]})

    out = partials.groupby(group_col).map_groups(merge, batch_format="pandas")
    return out


# ---------------------------------------------------------------------------
# mergeable quantile sketch
# ---------------------------------------------------------------------------


def _compress(values: np.ndarray, weights: np.ndarray, k: int):
    """Weighted order statistics -> k equi-weight centroids (the merge/
    compress primitive of a centroid-based quantile sketch, after
    Dunning's t-digest idea with uniform sizing)."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    w = weights[order].astype(np.float64)
    total = w.sum()
    if len(v) <= k:
        return v.copy(), w.copy()
    cum = np.cumsum(w) - w / 2.0
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.clip(np.searchsorted(cum, targets), 0, len(v) - 1)
    return v[idx].copy(), np.full(k, total / k)


def _sketch_quantile(v: np.ndarray, w: np.ndarray, q: float) -> float:
    cum = np.cumsum(w) - w / 2.0
    t = q * w.sum()
    return float(np.interp(t, cum, v))


def approx_quantiles(ds, group_col: str, value_col: str,
                     qs=(0.5, 0.95, 0.99), *, k: int = 512):
    """Approximate quantiles per group -> (group, q, value) via a
    mergeable equi-weight centroid sketch: every batch compresses its
    values to <=k weighted centroids per group (map-side combine — the
    shuffle carries k points per group per block, independent of rows),
    a per-batch COMBINER re-compresses same-group partials at bounded
    fan-in to 4k centroids (so the final merge holds
    ~(n_blocks/combine-batch) x 4k points per group, never
    n_blocks x k — the crawl-scale single-worker trap), and one
    map_groups merges and interpolates.  Empirical rank error <1% at
    k=512; exact counterparts: grouped_median / a full sort."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        groups, cv, cw = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            v, w = _compress(sub[value_col].to_numpy(dtype=np.float64),
                             np.ones(len(sub)), k)
            groups.append(g)
            cv.append(v.tolist())
            cw.append(w.tolist())
        return pa.table({group_col: pa.array(groups),
                         "cv": pa.array(cv, pa.list_(pa.float64())),
                         "cw": pa.array(cw, pa.list_(pa.float64()))})

    def combine(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        groups, cv, cw = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            groups.append(g)
            if len(sub) == 1:
                cv.append(list(sub["cv"].iloc[0]))
                cw.append(list(sub["cw"].iloc[0]))
                continue
            v = np.concatenate([np.asarray(x) for x in sub["cv"]])
            w = np.concatenate([np.asarray(x) for x in sub["cw"]])
            # 4k intermediate centroids: quantization granularity
            # ~mass/8k per point — far below the 1% rank-error budget,
            # unlike an aggressive re-compression back to k
            v2, w2 = _compress(v, w, 4 * k)
            cv.append(v2.tolist())
            cw.append(w2.tolist())
        return pa.table({group_col: pa.array(groups),
                         "cv": pa.array(cv, pa.list_(pa.float64())),
                         "cw": pa.array(cw, pa.list_(pa.float64()))})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
                 .map_batches(combine, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # merged set stays UNCOMPRESSED (n_blocks x k points per group —
        # small); re-compressing here compounds quantization error badly
        # around CDF gaps (bimodal data)
        v = np.concatenate([np.asarray(x) for x in df["cv"]])
        w = np.concatenate([np.asarray(x) for x in df["cw"]])
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        g = df[group_col].iloc[0]
        return pd.DataFrame({
            group_col: [g] * len(qs),
            "q": list(qs),
            "value": [_sketch_quantile(v, w, q) for q in qs]})

    return partials.groupby(group_col).map_groups(merge,
                                                  batch_format="pandas")


# ---------------------------------------------------------------------------
# Bloom filter (mergeable membership sketch)
# ---------------------------------------------------------------------------


def _bloom_positions(values, m_bits: int, k: int) -> np.ndarray:
    """k positions per value via double hashing (Kirsch-Mitzenmacher)."""
    h = _hash64(values)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
    ks = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None])
            % np.uint64(m_bits)).reshape(-1)


def bloom_build(ds, value_col: str, *, m_bits: int = 1 << 23,
                k: int = 7, fanin: int = 32) -> bytes:
    """Build a Bloom filter over a column -> filter bytes (m_bits/8).

    Mergeable by construction: every batch folds its values into a local
    bitmap (map-side combine — one m/8-byte bitmap per block,
    independent of row count) and bitmaps OR together through a
    DATASET-NATIVE TREE REDUCE: repeated `map_batches(batch_size=fanin)`
    passes OR up to `fanin` bitmaps into one inside workers, so the
    driver only ever pulls the single final bitmap — never
    O(n_blocks) x m/8 bytes (the crawl-scale driver-merge trap).
    m=8M bits / k=7 -> <1% FP at ~800k inserts."""
    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        vals = b.column(value_col).to_pylist()
        if vals:
            pos = _bloom_positions(vals, m_bits, k)
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1),
                                           (pos & 7).astype(np.uint8)))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    def or_batch(b: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for blob in b.column("bloom").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    merged = ds.map_batches(partial, batch_format="pyarrow") \
               .map_batches(or_batch, batch_format="pyarrow",
                            batch_size=fanin).materialize()
    while merged.count() > 1:
        n = merged.count()
        merged = merged.repartition(max(1, (n + fanin - 1) // fanin)) \
            .map_batches(or_batch, batch_format="pyarrow",
                         batch_size=fanin).materialize()
    rows = merged.take(1)
    if not rows:
        return bytes(m_bits // 8)
    return rows[0]["bloom"]


def bloom_contains(ds, value_col: str, bloom: bytes, *, k: int = 7):
    """-> ds + `maybe_seen` bool column: no false negatives, FP rate set
    by the filter sizing.  The filter broadcasts once via ray.put."""
    import ray
    m_bits = len(bloom) * 8
    ref = ray.put(np.frombuffer(bloom, dtype=np.uint8))

    def check(b: pa.Table) -> pa.Table:
        bits = ray.get(ref)
        vals = b.column(value_col).to_pylist()
        if not vals:
            return b.append_column("maybe_seen", pa.array([], pa.bool_()))
        pos = _bloom_positions(vals, m_bits, k).reshape(len(vals), k)
        hit = (bits[pos >> 3] & np.left_shift(
            np.uint8(1), (pos & 7).astype(np.uint8))) != 0
        return b.append_column("maybe_seen",
                               pa.array(hit.all(axis=1), pa.bool_()))

    return ds.map_batches(check, batch_format="pyarrow")


def heavy_hitter_words(ds, text_col: str = "text", *, ratio: int = 30):
    """EXACT heavy hitters — words whose count*ratio >= total words —
    without a vocabulary-sized shuffle (the web-corpus vocabulary is
    unbounded; a plain groupby ships every (word, count) pair).

    Two passes (the Misra-Gries family, in its vectorized batch form):
    1. Every batch counts its OWN words exactly (pandas value_counts —
       no per-word Python) and reports only words with batch_count *
       2*ratio >= batch_n, plus its word total.  A word dropped by a
       batch had batch_count < batch_n/(2*ratio) there, so its summed
       undercount U < N/(2*ratio) = T/2 — every word with true count
       >= T = N/ratio keeps merged est > T/2 and survives the candidate
       cut est * 2*ratio >= N (integer-exact, inclusive => superset).
       Summary size per batch is bounded by 2*ratio words (counts above
       batch_n/(2*ratio) can't number more); driver merge is
       O(blocks * ratio).
    2. Candidates broadcast into ONE map-side filtered exact count; the
       final integer-exact cut count * ratio >= N matches the SQL
       HAVING clause verbatim.

    -> pa.Table (word, n_occurrences) — exact, not approximate.
    """
    import pandas as pd

    def summary(b: pa.Table) -> pa.Table:
        s = b.column(text_col).to_pandas().str.split(" ").explode()
        s = s[(s != "") & s.notna()]
        n = len(s)
        if n == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "est": pa.array([], pa.int64()),
                             "nw": pa.array([], pa.int64())})
        vc = s.value_counts()
        keep = vc[vc * (2 * ratio) >= n]
        # the "" sentinel row carries the batch word total even when no
        # word clears the local cut — "" never occurs as a real word
        return pa.table({
            "word": pa.array([""] + keep.index.tolist(), pa.string()),
            "est": pa.array(np.concatenate(
                [[0], keep.to_numpy(np.int64)]).astype(np.int64)),
            "nw": pa.array([n] + [0] * len(keep), pa.int64()),
        })

    est: dict = {}
    total = 0
    for r in ds.map_batches(summary, batch_format="pyarrow").take_all():
        if r["word"]:  # "" is the per-batch totals sentinel, not a word
            est[r["word"]] = est.get(r["word"], 0) + r["est"]
        total += r["nw"]
    if total == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "n_occurrences": pa.array([], pa.int64())})
    cand = sorted(w for w, e in est.items() if e * 2 * ratio >= total)
    if not cand:
        return pa.table({"word": pa.array([], pa.string()),
                         "n_occurrences": pa.array([], pa.int64())})

    cand_set = set(cand)

    def exact(b: pa.Table) -> pa.Table:
        s = b.column(text_col).to_pandas().str.split(" ").explode()
        s = s[s.isin(cand_set)]
        vc = s.value_counts()
        return pa.table({"word": pa.array(vc.index.tolist(), pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    from ray.data.aggregate import Sum
    out = []
    for r in ds.map_batches(exact, batch_format="pyarrow") \
            .groupby("word").aggregate(Sum("n")).take_all():
        if r["sum(n)"] * ratio >= total:
            out.append((r["word"], int(r["sum(n)"])))
    out.sort()
    return pa.table({
        "word": pa.array([w for w, _ in out], pa.string()),
        "n_occurrences": pa.array([n for _, n in out], pa.int64())})


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

_CMS_SALT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment


def _cms_rows(h0: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices from base hashes — row i re-mixes h0
    with the splitmix64 increment so the depth hash functions are
    pairwise independent enough for the CM guarantee; all pandas C
    paths."""
    out = np.empty((depth, len(h0)), np.int64)
    for i in range(depth):
        # salt computed in Python ints mod 2^64: numpy scalar uint64
        # multiply warns on the (intended) wraparound
        salt = np.uint64((0x9E3779B97F4A7C15 * (i + 1)) % (1 << 64))
        mixed = pd.util.hash_array((h0 + salt).astype(np.int64))
        out[i] = (mixed % np.uint64(width)).astype(np.int64)
    return out


def cms_word_counts(ds, text_col: str = "text", *,
                    width: int = 4096, depth: int = 4):
    """Approximate per-word corpus counts via a Count-Min sketch
    -> Dataset (word, approx_count).

    The mergeable-sketch shape (same as HLL): every batch folds its
    exploded words into ONE (depth x width) int64 matrix — the driver
    merge is a sum of ~128 KB partials per block, independent of corpus
    size — then the query pass broadcasts the merged sketch and looks
    up each distinct word map-side (min over the depth rows).  CM
    guarantee: approx_count >= true count always; overshoot exceeds
    eps*N with probability <= (1/2)^depth at width = 2/eps.  Exact
    counterpart for verification: ops/analytics.word_frequencies."""
    import ray

    def explode(b: pa.Table):
        s = pd.Series(b.column(text_col).to_pylist(), dtype=object)
        words = s.str.split(" ").explode()
        return words[words.notna()].to_numpy(dtype=object)

    def partial(b: pa.Table) -> pa.Table:
        w = explode(b)
        mat = np.zeros((depth, width), np.int64)
        if len(w):
            h0 = pd.util.hash_array(w).astype(np.uint64)
            rows = _cms_rows(h0, depth, width)
            for i in range(depth):
                np.add.at(mat[i], rows[i], 1)
        return pa.table({"mat": pa.array([mat.tobytes()], pa.binary())})

    mat = np.zeros((depth, width), np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        mat += np.frombuffer(r["mat"], np.int64).reshape(depth, width)
    ref = ray.put(mat)

    def query(b: pa.Table) -> pa.Table:
        w = explode(b)
        if len(w) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "approx_count": pa.array([], pa.int64())})
        uniq = pd.unique(w)
        m = ray.get(ref)
        h0 = pd.util.hash_array(uniq).astype(np.uint64)
        rows = _cms_rows(h0, depth, width)
        est = m[np.arange(depth)[:, None], rows].min(axis=0)
        return pa.table({"word": pa.array(list(uniq), pa.string()),
                         "approx_count": pa.array(est, pa.int64())})

    # per-batch distinct -> one tiny max-merge (all estimates of a word
    # are identical, max is just the dedup)
    return ds.map_batches(query, batch_format="pyarrow") \
        .groupby("word").max("approx_count") \
        .map_batches(lambda b: pa.table({
            "word": b.column("word"),
            "approx_count": pc.cast(
                b.column("max(approx_count)"), pa.int64())}),
            batch_format="pyarrow")


def kmv_group_overlap(ds, group_col: str, id_col: str, *, k: int = 64):
    """KMV set-operation sketch: per group keep the k smallest
    distinct 60-bit md5 hashes of the id column, then estimate every
    group PAIR's |A|, |B|, |A u B| (union sketch = k smallest of the
    merged hash sets — the standard KMV closure) and |A n B| by
    inclusion-exclusion, clamped at 0 -> (group_a, group_b, est_a,
    est_b, est_union, est_intersection).  Like kmv_distinct_users,
    every number is DETERMINISTIC (md5, integer //), so the sketch
    math itself is oracle-checkable; under-k sets estimate exactly.

    Scale shape: per-batch per-group distinct ids -> md5 -> local
    k-min partials (the exchange carries <= |groups| x k hashes per
    batch); the driver merges bounded |groups| x k lists and does the
    pairwise finish on sketches only."""
    M60 = 1 << 60

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "hv": pa.array([], pa.int64())})
        g = pc.fill_null(pc.cast(b.column(group_col), pa.string()),
                         "und").to_pandas().to_numpy(object)
        ids = pc.fill_null(pc.cast(b.column(id_col), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"g": g, "i": ids}).drop_duplicates()
        memo: Dict[int, int] = {}
        hv = np.fromiter(
            (memo.setdefault(int(i), int(hashlib.md5(
                str(int(i)).encode()).hexdigest()[:15], 16))
             for i in df["i"]), np.int64, len(df))
        df = pd.DataFrame({"g": df["g"].to_numpy(object), "hv": hv})
        top = df.sort_values(["g", "hv"]).groupby("g").head(k)
        return pa.table({"g": pa.array(top["g"].to_numpy(object),
                                       pa.string()),
                         "hv": pa.array(top["hv"].to_numpy(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out_cols = {"group_a": "object", "group_b": "object",
                "est_a": "int64", "est_b": "int64",
                "est_union": "int64", "est_intersection": "int64"}
    num_cols = {c: t for c, t in out_cols.items() if t == "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(num_cols)
    sk: Dict[str, np.ndarray] = {}
    df = pd.DataFrame(rows)
    for g, sub in df.groupby("g"):
        sk[str(g)] = np.unique(sub["hv"].to_numpy(np.int64))[:k]

    def est(hv: np.ndarray) -> int:
        if len(hv) < k:
            return len(hv)
        return (k - 1) * M60 // int(hv[-1])

    groups = sorted(sk)
    out = []
    for i, a in enumerate(groups):
        for b_ in groups[i + 1:]:
            u = np.unique(np.concatenate([sk[a], sk[b_]]))[:k]
            ea, eb, eu = est(sk[a]), est(sk[b_]), est(u)
            out.append({"group_a": a, "group_b": b_, "est_a": ea,
                        "est_b": eb, "est_union": eu,
                        "est_intersection": max(ea + eb - eu, 0)})
    if not out:
        return pd.DataFrame(columns=list(out_cols)).astype(num_cols)
    return pd.DataFrame(out).astype(num_cols)


def ams_f2(ds, key_col: str, *, n_rows: int = 16):
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996)
    over per-key event counts, FULLY deterministic so the estimate
    itself is oracle-checkable: key frequencies c_k come from one
    key-domain groupby; each of the 16 estimator rows assigns key k
    the sign of one NIBBLE of md5(str(k)) (+1 when the hex digit is
    0-7), S_r = sum(sign_r(k) * c_k); the estimate is the estimator
    mean floor(sum(S_r^2) / 16) -> one row
    (exact_f2, est_f2, ratio_ppm).

    Scale shape: ONE bounded key-domain exchange (same envelope as
    distinct_count), then a map-side 16-value fold -> tiny driver
    combine; the sketch payload per block is 16 ints regardless of
    rows.  md5 signing matches the SQL oracle digit for digit."""
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        k = pc.fill_null(pc.cast(b.column(key_col), pa.int64()), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(1, index=k).groupby(level=0, sort=False).sum()
        return pa.table({"k": pa.array(g.index.to_numpy(np.int64)),
                         "n": pa.array(g.to_numpy(np.int64))})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n"))

    def sketch_partial(b: pa.Table) -> pa.Table:
        cols = {f"s{r}": pa.array([0], pa.int64()) for r in range(n_rows)}
        cols["f2"] = pa.array([0], pa.int64())
        if b.num_rows == 0:
            return pa.table(cols)
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # nibble signs: one md5 per key yields all 16 estimator rows
        digs = np.frombuffer(
            b"".join(hashlib.md5(str(int(x)).encode()).hexdigest()
                     [:n_rows].encode() for x in k),
            dtype=np.uint8).reshape(len(k), n_rows)
        sign = np.where(digs < ord('8'), 1, -1).astype(np.int64)
        s = (sign * c[:, None]).sum(axis=0)
        out = {f"s{r}": pa.array([int(s[r])], pa.int64())
               for r in range(n_rows)}
        out["f2"] = pa.array([int((c * c).sum())], pa.int64())
        return pa.table(out)

    rows = counts.map_batches(sketch_partial, batch_format="pyarrow") \
        .take_all()
    out_cols = {"exact_f2": "int64", "est_f2": "int64",
                "ratio_ppm": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    s = [sum(int(r[f"s{i}"]) for r in rows) for i in range(n_rows)]
    exact = sum(int(r["f2"]) for r in rows)
    if exact == 0:  # empty input leaves only zero-row partials
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    est = sum(v * v for v in s) // n_rows
    return pd.DataFrame([{"exact_f2": exact, "est_f2": est,
                          "ratio_ppm": (est * 1_000_000) // exact}]) \
        .astype(out_cols)


def _md5_cell(words, salt: int, width: int) -> np.ndarray:
    """Deterministic SQL-reproducible CMS cell index: the first 15 hex
    chars of md5(word + ':' + salt) as an integer, mod width — exactly
    DuckDB's CAST('0x' || substr(md5(w || ':' || i), 1, 15) AS BIGINT)
    % width (15 hex chars = 60 bits, always < 2^63)."""
    import hashlib
    out = np.empty(len(words), np.int64)
    suffix = f":{salt}".encode()
    for i, w in enumerate(words):
        h = hashlib.md5(w.encode("utf-8") + suffix).hexdigest()
        out[i] = int(h[:15], 16) % width
    return out


def cms_oracle_table(ds, *, depth: int = 4, width: int = 512,
                     top_k: int = 40, text_col: str = "text"):
    """FULLY-ORACLED count-min sketch: md5-derived hash rows make
    every counter cell — and therefore every estimate — deterministic
    and SQL-reproducible (the KMV/AMS treatment applied to CMS;
    cms_word_counts keeps the fast siphash variant for production).

    Builds the depth x width counter table over all corpus words, then
    reports the top_k TRUE words with their exact count, the CMS
    estimate (min over rows of the hashed cell), and the overcount.
    -> (word, true_cnt, est_cnt, overcount), est_cnt >= true_cnt
    always (the CMS one-sided guarantee, asserted by construction).

    Scale shape: per-batch word value_counts -> (row, cell) partials
    (exchange bounded by depth x batch vocab), ONE cell groupby to the
    depth*width counter table (bounded, driver-held), exact top-k via
    the word_frequencies pattern, estimates driver-side over top_k
    words only."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cell_partials(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"row": "int64", "cell": "int64", "cnt_part": "int64"}
        s = df[text_col].fillna("").str.split(" ").explode()
        s = s[s.str.len() > 0]
        if len(s) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        vc = s.value_counts()
        words = vc.index.to_numpy()
        cnts = vc.to_numpy(np.int64)
        frames = []
        for i in range(depth):
            frames.append(pd.DataFrame({
                "row": np.full(len(words), i, np.int64),
                "cell": _md5_cell(words, i, width),
                "cnt_part": cnts}))
        return pd.concat(frames, ignore_index=True) \
            .groupby(["row", "cell"], as_index=False).sum() \
            .astype(cols)

    counter_rows = ds.map_batches(cell_partials, batch_format="pandas") \
        .groupby(["row", "cell"]).aggregate(Sum("cnt_part")).take_all()
    counter = {(int(r["row"]), int(r["cell"])): int(r["sum(cnt_part)"])
               for r in counter_rows}

    def word_partials(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"word": "object", "cnt_part": "int64"}
        s = df[text_col].fillna("").str.split(" ").explode()
        s = s[s.str.len() > 0]
        if len(s) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        return s.value_counts().rename_axis("word") \
            .reset_index(name="cnt_part").astype(cols)

    agg = ds.map_batches(word_partials, batch_format="pandas") \
        .groupby("word").aggregate(Sum("cnt_part"))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"word": "object", "true_cnt": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.rename(columns={"sum(cnt_part)": "true_cnt"})
        return df.sort_values(["true_cnt", "word"],
                              ascending=[False, True]) \
            .head(top_k)[["word", "true_cnt"]].astype(cols)

    cand = agg.map_batches(local_topk, batch_format="pandas") \
        .take_all()
    out_cols = {"word": "object", "true_cnt": "int64",
                "est_cnt": "int64", "overcount": "int64"}
    if not cand:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)
    top = pd.DataFrame(cand).sort_values(
        ["true_cnt", "word"], ascending=[False, True]).head(top_k) \
        .reset_index(drop=True)
    words = top["word"].tolist()
    ests = []
    for w in words:
        est = min(counter.get(
            (i, int(_md5_cell([w], i, width)[0])), 0)
            for i in range(depth))
        ests.append(est)
    top["est_cnt"] = np.asarray(ests, np.int64)
    top["overcount"] = top["est_cnt"] - top["true_cnt"]
    assert (top["overcount"] >= 0).all(), "CMS one-sided bound broken"
    return top.astype(out_cols)


def _md5_bloom_positions(u: int, m_bits: int, k: int):
    import hashlib
    h = hashlib.md5(str(u).encode()).hexdigest()
    return [int(h[8 * i:8 * i + 8], 16) % m_bits for i in range(k)]


def bloom_anti_audit(dim_ds, fact_ds, *, dim_key: str, fact_key: str,
                     m_bits: int = 1024, k: int = 4):
    """Bloom-prefiltered ANTI join audit with the fully-deterministic
    md5 sketch (the bloom_fpr_audit filter): dim keys populate the
    m_bits/k filter; every fact row probes it.  Rows the filter
    rejects are DEFINITELY not in the dim (the anti-join fast path —
    no exchange, no exact lookup); rows it accepts take the exact
    check, which exposes the false positives the anti join must still
    filter.  anti_join_n == n_bloom_negative + n_false_pos ==
    the true NOT-IN count, which the oracle computes directly.

    -> one row (n_members, n_bits_set, n_probes, n_bloom_negative,
    n_bloom_positive, n_false_pos, anti_join_n).

    Scale shape: the filter is m_bits/8 bytes however many dim keys;
    the exact re-check set is the DIM side (broadcast-bounded, the
    dims-are-small convention); the fact side is ONE map-only pass
    emitting per-batch partial counts."""
    import pandas as pd
    import ray

    key_parts = []
    for b in dim_ds.iter_batches(batch_format="pyarrow"):
        arr = b.column(dim_key).combine_chunks()
        v = np.asarray(arr.to_numpy(zero_copy_only=False))
        v = v[~pd.isna(v)] if v.dtype == object else v
        key_parts.append(v.astype(np.int64))
    keys = np.unique(np.concatenate(key_parts)) if key_parts \
        else np.empty(0, np.int64)
    bits = np.zeros(m_bits, bool)
    for u in keys.tolist():
        for p in _md5_bloom_positions(u, m_bits, k):
            bits[p] = True
    bits_ref = ray.put(bits)
    keys_ref = ray.put(keys)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_probes": "int64", "n_neg": "int64", "n_pos": "int64",
                "n_fp": "int64"}
        vals = df[fact_key].dropna().astype(np.int64).to_numpy()
        if len(vals) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        bt = ray.get(bits_ref)
        ks = ray.get(keys_ref)
        uniq, inv = np.unique(vals, return_inverse=True)
        upos = np.array([all(bt[p] for p in
                             _md5_bloom_positions(int(u), m_bits, k))
                         for u in uniq], bool)
        umem = np.isin(uniq, ks)
        pos = upos[inv]
        mem = umem[inv]
        return pd.DataFrame({
            "n_probes": [len(vals)],
            "n_neg": [int((~pos).sum())],
            "n_pos": [int(pos.sum())],
            "n_fp": [int((pos & ~mem).sum())]})

    parts = fact_ds.map_batches(probe, batch_format="pandas") \
        .take_all()
    out_cols = {"n_members": "int64", "n_bits_set": "int64",
                "n_probes": "int64", "n_bloom_negative": "int64",
                "n_bloom_positive": "int64", "n_false_pos": "int64",
                "anti_join_n": "int64"}
    n_probes = sum(int(r["n_probes"]) for r in parts)
    n_neg = sum(int(r["n_neg"]) for r in parts)
    n_pos = sum(int(r["n_pos"]) for r in parts)
    n_fp = sum(int(r["n_fp"]) for r in parts)
    return pd.DataFrame({
        "n_members": [int(keys.size)],
        "n_bits_set": [int(bits.sum())],
        "n_probes": [n_probes], "n_bloom_negative": [n_neg],
        "n_bloom_positive": [n_pos], "n_false_pos": [n_fp],
        "anti_join_n": [n_neg + n_fp]}).astype(out_cols)
