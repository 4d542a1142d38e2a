"""Text-analysis operators over a document corpus (Ray Data native).

Large-scale training-data pipeline staples (graft brief): token counting,
quality scoring, language-ID (n-gram heuristic), document fingerprinting
(rolling hash / winnowing).  All are single-pass `map_batches` transforms,
vectorized batch-wide (pyarrow.compute kernels, or flat-numpy-array passes
where no kernel exists — winnowing hashes all docs of a batch at once),
with no shuffle.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --- token counting ---------------------------------------------------------

def token_count_batch(batch: pa.Table) -> pa.Table:
    """tokens = single-space-separated words: count(' ') + 1 on non-empty.
    Matches the SQL oracle `length(text) - length(replace(text,' ','')) + 1`."""
    text = batch.column("text")
    n_spaces = pc.count_substring(text, " ")
    n_tokens = pc.add(n_spaces, 1)
    n_tokens = pc.if_else(pc.equal(pc.utf8_length(text), 0),
                          pa.scalar(0, pa.int64()),
                          pc.cast(n_tokens, pa.int64()))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_tokens], names=["doc_id", "n_tokens"])


def token_counts(ds):
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


# --- quality scoring --------------------------------------------------------

def quality_batch(batch: pa.Table) -> pa.Table:
    """Length/word-shape quality features + a simple score, fully
    vectorized; formula mirrors the SQL oracle exactly."""
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_spaces = pc.count_substring(text, " ")
    n_tokens = pc.cast(pc.add(n_spaces, 1), pa.int64())
    n_tokens = pc.if_else(pc.equal(n_chars, 0), pa.scalar(0, pa.int64()), n_tokens)
    nonspace = pc.subtract(n_chars, pc.cast(n_spaces, pa.int64()))
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    ns = nonspace.to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        avg_token_len = np.where(nt > 0, ns / nt, 0.0)
    score = np.minimum(1.0, nt / 100.0) * np.where(
        (avg_token_len >= 2.0) & (avg_token_len <= 10.0), 1.0, 0.5)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_chars, n_tokens,
         pa.array(avg_token_len, pa.float64()), pa.array(score, pa.float64())],
        names=["doc_id", "n_chars_calc", "n_tokens", "avg_token_len", "quality_score"])


def quality_scores(ds):
    return ds.map_batches(quality_batch, batch_format="pyarrow")


# --- language identification ------------------------------------------------

# tiny deterministic per-language profiles: common function words.  This is
# a heuristic classifier (n-gram/stopword evidence), not a model download.
_LANG_PROFILES: Dict[str, frozenset] = {
    "en": frozenset("the a and of to in is are was for with on at it this that".split()),
    "de": frozenset("der die das und ist ein eine mit von zu den im nicht auch".split()),
    "fr": frozenset("le la les et de un une est en du au pour que dans".split()),
    "es": frozenset("el los las y es de en un una se del por para con".split()),
    "hu": frozenset("a az és hogy nem is egy van de meg ez el".split()),
}
_LANG_ORDER = tuple(sorted(_LANG_PROFILES))


class LangIdBatch:
    """Actor-pool friendly language-ID stage: profiles built once.

    Fully vectorized (ADVICE r2): lower + whitespace-split + per-lang
    stopword membership run as Arrow kernels over the flattened word
    array; per-doc hit counts come from cumsum differences at the list
    offsets.  Semantics identical to the per-word scalar loop: first
    language in sorted order with the strictly-highest stopword hit
    count wins; zero hits -> 'und'; confidence = hits / n_words."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LANG_PROFILES.items()}
        self._sets = {lang: pa.array(sorted(words), pa.string())
                      for lang, words in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_arrays(
                [batch.column("doc_id"), pa.array([], pa.string()),
                 pa.array([], pa.float64())],
                names=["doc_id", "pred_lang", "lang_confidence"])
        words = pc.utf8_split_whitespace(
            pc.utf8_lower(batch.column("text")))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = words.flatten()
        # Python str.split() drops empties; Arrow's split keeps "" for
        # leading/trailing/empty-text runs — mask them out of the counts
        ne = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(ne)])
        n_words = cs[off[1:]] - cs[off[:-1]]
        hits = np.empty((len(_LANG_ORDER), n), dtype=np.int64)
        for li, lang in enumerate(_LANG_ORDER):
            hm = pc.is_in(flat, value_set=self._sets[lang]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            hcs = np.concatenate([[0], np.cumsum(hm)])
            hits[li] = hcs[off[1:]] - hcs[off[:-1]]
        best_idx = np.argmax(hits, axis=0)  # first max = sorted-order tie
        best = hits[best_idx, np.arange(n)]
        langs = np.asarray(_LANG_ORDER, dtype=object)
        preds = np.where(best > 0, langs[best_idx], "und")
        confs = np.where(n_words > 0,
                         best / np.maximum(n_words, 1), 0.0)
        return pa.Table.from_arrays(
            [batch.column("doc_id"),
             pa.array(preds.tolist(), pa.string()),
             pa.array(confs, pa.float64())],
            names=["doc_id", "pred_lang", "lang_confidence"])


def lang_id(ds, concurrency=None):
    if concurrency is not None:
        return ds.map_batches(LangIdBatch, batch_format="pyarrow",
                              concurrency=concurrency)
    from ..util import task_udf

    def fn(batch):
        return task_udf(LangIdBatch)(batch)
    return ds.map_batches(fn, batch_format="pyarrow")


# --- document fingerprinting (rolling hash + winnowing) ---------------------

_FP_BASE = np.uint64(0x100000001B3)  # FNV-ish odd multiplier, mod 2^64


def _winnow_batch(texts, k: int = 8, w: int = 4):
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme)
    for a WHOLE batch of texts in one flat numpy pass: byte k-gram
    polynomial hashes (uint64 wrap-around), per window of w consecutive
    grams select the leftmost minimum, drop consecutive re-selections.
    Grams and windows never cross document boundaries (validity masks on
    the flat arrays).  Returns (doc_of, fp) — selected fingerprint
    hashes (shifted into int64-positive range) and their doc row index.
    Content-identical k-grams hash identically regardless of position,
    so shared substrings of length >= w + k - 1 share a fingerprint."""
    enc = [(t or "").encode("utf-8", "surrogatepass") for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    total = int(lens.sum())
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if total < k:
        return empty
    flat = np.frombuffer(b"".join(enc), np.uint8).astype(np.uint64)
    doc_of = np.repeat(np.arange(len(enc)), lens)
    # Horner over k shifted contiguous slices (beats a strided matvec)
    ng = total - k + 1
    gh = np.zeros(ng, np.uint64)
    for j in range(k):
        gh *= _FP_BASE
        gh += flat[j:j + ng]
    g_ok = doc_of[:ng] == doc_of[k - 1:]
    gdoc = doc_of[:ng]
    # keep only in-doc grams, contiguous per doc by construction
    gh, gdoc = gh[g_ok], gdoc[g_ok]
    if len(gh) < w:
        return empty
    # leftmost window-min via w shifted contiguous passes (strict <
    # keeps the leftmost index on ties), windows all inside one doc
    nw = len(gh) - w + 1
    best = gh[:nw].copy()
    sel = np.arange(nw)
    for j in range(1, w):
        upd = gh[j:j + nw] < best
        best[upd] = gh[j:j + nw][upd]
        sel[upd] = np.flatnonzero(upd) + j
    w_ok = gdoc[:nw] == gdoc[w - 1:]
    sel = sel[w_ok]
    if not len(sel):
        return empty
    # drop consecutive duplicate selections (same gram picked by the
    # next window) — doc change always changes sel, grams are doc-unique
    keep = np.empty(len(sel), bool)
    keep[0] = True
    np.not_equal(sel[1:], sel[:-1], out=keep[1:])
    picked = sel[keep]
    return gdoc[picked].astype(np.int64), (gh[picked] >> np.uint64(3)) \
        .astype(np.int64)


def _winnow_fingerprints(text: str, k: int = 8, w: int = 4) -> List[int]:
    """Single-text wrapper over the batch kernel (tests / ad-hoc use)."""
    _, fp = _winnow_batch([text], k, w)
    return fp.tolist()


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Per-doc fingerprint summary: count + min, from one flat-array
    winnowing pass over the whole batch (no per-row Python)."""
    texts = batch.column("text").to_pylist()
    doc_of, fp = _winnow_batch(texts)
    n = batch.num_rows
    n_fps = np.bincount(doc_of, minlength=n).astype(np.int64)
    min_fp = np.zeros(n, np.int64)
    if len(fp):
        order = np.lexsort((fp, doc_of))
        first = np.concatenate(([True], doc_of[order][1:]
                                != doc_of[order][:-1]))
        min_fp[doc_of[order][first]] = fp[order][first]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(n_fps), pa.array(min_fp)],
        names=["doc_id", "n_fingerprints", "min_fingerprint"])


def fingerprints(ds):
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def normalize_text(ds, *, form: str = "NFC"):
    """Unicode normalization + whitespace collapse + control-char strip —
    the canonicalization pass run before hashing/dedup at corpus scale.
    Fully vectorized: pyarrow.compute utf8_normalize + regex replace.
    -> (doc_id, norm_text, n_chars_norm)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(b.column("text"), form=form)
        t = pc.replace_substring_regex(t, pattern=r"[\x00-\x08\x0b-\x1f\x7f]",
                                       replacement="")
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "norm_text": t,
            "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64())})

    return ds.map_batches(norm, batch_format="pyarrow")


# BPE-ish pre-tokenizer (GPT-2-style shape, RE2-compatible: no lookahead —
# contraction suffixes, letter runs, digit runs, punctuation runs, ws runs)
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'|\s+")


def bpe_token_counts(ds):
    """-> (doc_id, n_bpe_tokens): subword-style token counts via ONE
    vectorized RE2 pass (pyarrow count_substring_regex); DuckDB runs the
    byte-identical pattern through its own RE2, so the operator is
    exactly oracle-comparable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"),
                                     pattern=BPE_ISH_PATTERN)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow")


def lm_perplexity_scores(ds, *, vocab_k: int = 50_000,
                         keep_cols: tuple = ()):
    """CCNet-style quality signal: per-doc mean negative log2 probability
    under a corpus unigram model -> (doc_id, lm_bits_per_token).

    Two passes, both scale-shaped: pass 1 builds the model exactly like
    word_frequencies (per-batch Counter combine -> one groupby sum ->
    partial top-k -> tiny driver merge; the broadcast model is bounded at
    `vocab_k` entries, with OOV words floored at 0.1/total).  Pass 2 is a
    pure map: vectorized-ish scoring against the broadcast model.  Lower
    bits = more stereotypical text (the filter keeps the middle band in a
    CCNet-style setup)."""
    import math

    import pyarrow as pa
    import ray

    from .analytics import word_frequencies

    vocab = word_frequencies(ds.map_batches(
        lambda b: pa.table({"text": b.column("text")}),
        batch_format="pyarrow"), "text", k=vocab_k)
    counts = dict(zip(vocab.column("word").to_pylist(),
                      vocab.column("n").to_pylist()))
    total = max(1, sum(counts.values()))
    logp = {w: math.log2(c / total) for w, c in counts.items()}
    oov = math.log2(0.1 / total)
    model_ref = ray.put((logp, oov))

    def score(b: pa.Table) -> pa.Table:
        # vectorized: split to a flat word array once, map through the
        # model with one pandas dict-map, per-doc means via cumsum
        # differences at the list offsets (the LangIdBatch shape)
        import pandas as pd
        import pyarrow.compute as pc

        lp, oo = ray.get(model_ref)
        n = b.num_rows
        if n == 0:
            return pa.table({"doc_id": b.column("doc_id"),
                             **{c: b.column(c) for c in keep_cols},
                             "lm_bits_per_token": pa.array([],
                                                           pa.float64())})
        words = pc.split_pattern(b.column("text"), pattern=" ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = words.flatten()
        ne = pc.not_equal(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        wl = pd.Series(flat.to_pandas()).map(lp).fillna(oo).to_numpy(
            dtype=np.float64)
        wl = np.where(ne, wl, 0.0)
        cs = np.concatenate([[0.0], np.cumsum(wl)])
        sums = cs[off[1:]] - cs[off[:-1]]
        cn = np.concatenate([[0], np.cumsum(ne.astype(np.int64))])
        counts = cn[off[1:]] - cn[off[:-1]]
        out = np.where(counts > 0, -sums / np.maximum(counts, 1), 0.0)
        return pa.table({"doc_id": b.column("doc_id"),
                         **{c: b.column(c) for c in keep_cols},
                         "lm_bits_per_token": pa.array(out, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def lm_buckets(ds, *, vocab_k: int = 50_000, k: int = 3):
    """CCNet-style head/middle/tail corpus split: per LANGUAGE, docs are
    NTILE(k)-bucketed by unigram-LM bits-per-token (head = most
    stereotypical / lowest bits) -> (doc_id, lang, lm_bits_q, bucket).

    Composition of two scale-shaped stages: lm_perplexity_scores (tiny
    broadcast model, pure map) then ops/analytics.grouped_ntile over the
    score quantized to integer micro-bits (deterministic total order
    (lm_bits_q, doc_id) — no float boundary ambiguity).  Per-language
    bucket sizes differ by at most one (the SQL NTILE guarantee), which
    is what makes the split usable as reproducible train-data tiers."""
    from .analytics import grouped_ntile

    scored = lm_perplexity_scores(ds, vocab_k=vocab_k,
                                  keep_cols=("lang",))

    def quantize(b: pa.Table) -> pa.Table:
        bits = b.column("lm_bits_per_token").to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "lang": pc.cast(b.column("lang"), pa.string()),
            "lm_bits_q": pa.array(np.rint(bits * 1e6).astype(np.int64))})

    tiles = grouped_ntile(scored.map_batches(quantize,
                                             batch_format="pyarrow"),
                          "lang", "lm_bits_q", "doc_id", k=k)
    names = {1: "head", 2: "middle", 3: "tail"}

    def label(b: pa.Table) -> pa.Table:
        t = b.column("tile").to_pylist()
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "lang": pc.cast(b.column("lang"), pa.string()),
            "lm_bits_q": pc.cast(b.column("lm_bits_q"), pa.int64()),
            "bucket": pa.array([names.get(v, str(v)) for v in t],
                               pa.string())})

    return tiles.map_batches(label, batch_format="pyarrow")


# PII redaction patterns (RE2 — identical semantics in pyarrow.compute
# and DuckDB regexp_replace, verified on planted fixtures in
# tests/test_graph_ops.py::TestRedactPII); order matters: emails first
# (their domains would otherwise be half-eaten by the IP rule), then
# IPs, then phones.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = (r"(?:\+?1[ .\-]?)?(?:\([0-9]{3}\)[ .\-]?|[0-9]{3}[ .\-])"
             r"[0-9]{3}[ .\-][0-9]{4}")


def redact_pii(ds, text_col: str = "text"):
    """Scrub emails / IPv4 addresses / US-style phone numbers ->
    (doc_id, text) with [EMAIL]/[IP]/[PHONE] placeholders.  Pure
    map-side, zero shuffles; the three compiled RE2 kernels run
    vectorized over whole Arrow string columns (pyarrow
    replace_substring_regex), never per-row Python."""
    import pyarrow.compute as _pc

    def scrub(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        t = _pc.replace_substring_regex(t, pattern=PII_EMAIL,
                                        replacement="[EMAIL]")
        t = _pc.replace_substring_regex(t, pattern=PII_IPV4,
                                        replacement="[IP]")
        t = _pc.replace_substring_regex(t, pattern=PII_PHONE,
                                        replacement="[PHONE]")
        return b.set_column(b.schema.get_field_index(text_col),
                            text_col, t)

    return ds.map_batches(scrub, batch_format="pyarrow")


def bpe_learn(ds, *, n_merges: int = 50, vocab_k: int = 10_000):
    """Byte-pair-encoding merge-rule learning (sentencepiece-style) ->
    pa.Table (merge_rank, left, right, pair_count).

    The corpus-sized work is the DISTRIBUTED word-frequency aggregate
    (ops/analytics.word_frequencies: per-batch Counter combine, one
    bounded groupby, partial top-k); BPE's merge loop then runs on that
    BOUNDED (word -> count) table — the standard formulation (Sennrich
    et al. 2016 trains on exactly this table), so the driver step is
    O(vocab_k), independent of corpus size, like the IVF seeding.
    Deterministic: pair ties break lexicographically.  Words are
    space-split; each word ends with the '</w>' end-of-word symbol."""
    from .analytics import word_frequencies

    vocab = word_frequencies(ds, "text", k=vocab_k)
    words = vocab.column("word").to_pylist()
    counts = vocab.column("n").to_pylist()
    seqs = [tuple(w) + ("</w>",) for w in words]

    merges = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for seq, c in zip(seqs, counts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        joined = left + right
        new_seqs = []
        for seq in seqs:
            out, i, n = [], 0, len(seq)
            while i < n:
                if (i + 1 < n and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs

    return pa.table({
        "merge_rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64())})


def bpe_encode_stats(ds, merges, *, text_col: str = "text"):
    """Apply learned BPE merge rules to the corpus (the tokenization
    stage of a training-data pipeline) -> per-source
    (source, n_docs, n_words, n_tokens).

    Scale shape: encoding is MAP-ONLY (embarrassingly parallel); the
    merge table is tiny (n_merges rows) and captured by value in the
    actor closure, built into a rank dict once per actor.  Per batch,
    words explode to a flat frame, each UNIQUE word is encoded once
    (memoized across batches per worker — Zipf makes the memo hit rate
    ~99%), token lengths map back vectorized, and only per-source
    partial sums leave the worker; a |sources|-key groupby merges them.
    Greedy lowest-rank pair merging — the canonical BPE apply (equal to
    replaying merges in rank order)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ranks = {}
    pair_of = {}
    for k, l, r in zip(merges.column("merge_rank").to_pylist(),
                       merges.column("left").to_pylist(),
                       merges.column("right").to_pylist()):
        ranks[(l, r)] = k
        pair_of[k] = (l, r)

    class EncodeBatch:
        def __init__(self):
            self.memo: dict = {}

        def _tok_len(self, word: str) -> int:
            got = self.memo.get(word)
            if got is not None:
                return got
            seq = list(word) + ["</w>"]
            while len(seq) > 1:
                best_rank = None
                for i in range(len(seq) - 1):
                    r = ranks.get((seq[i], seq[i + 1]))
                    if r is not None and (best_rank is None
                                          or r < best_rank):
                        best_rank = r
                if best_rank is None:
                    break
                left, right = pair_of[best_rank]
                out, i, n = [], 0, len(seq)
                while i < n:
                    if (i + 1 < n and seq[i] == left
                            and seq[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            self.memo[word] = len(seq)
            return len(seq)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"source": pa.array([], pa.string()),
                                 "n_docs": pa.array([], pa.int64()),
                                 "n_words": pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64())})
            src = b.column("source").to_pandas()
            words = b.column(text_col).to_pandas().str.split()
            ex = words.explode().dropna()
            uniq = pd.unique(ex.to_numpy(dtype=object))
            tokmap = {w: self._tok_len(w) for w in uniq}
            tok = ex.map(tokmap)
            per_row_tokens = tok.groupby(level=0).sum()
            per_row_words = ex.groupby(level=0).size()
            df = pd.DataFrame({
                "source": src,
                "w": per_row_words.reindex(src.index, fill_value=0)
                .to_numpy(np.int64),
                "t": per_row_tokens.reindex(src.index, fill_value=0)
                .to_numpy(np.int64)})
            g = df.groupby("source", sort=False).agg(
                n_docs=("w", "size"), n_words=("w", "sum"),
                n_tokens=("t", "sum")).reset_index()
            return pa.table({
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "n_words": pa.array(g["n_words"].to_numpy(np.int64)),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64))})

    partials = ds.map_batches(EncodeBatch, batch_format="pyarrow",
                              concurrency=(1, 8))
    agg = partials.groupby("source").aggregate(
        Sum("n_docs"), Sum("n_words"), Sum("n_tokens"))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b.column("source"),
            "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
            "n_words": pc.cast(b.column("sum(n_words)"), pa.int64()),
            "n_tokens": pc.cast(b.column("sum(n_tokens)"), pa.int64())}),
        batch_format="pyarrow")


def char_class_profile(ds, group_col: str = "source",
                       text_col: str = "text"):
    """Character-class composition per group: total chars and the
    exact counts of alphabetic / space / digit / other characters,
    plus alpha_ppm -> (group, n_chars, n_alpha, n_space, n_digit,
    n_other, alpha_ppm).  Script/encoding sanity screen (a source
    whose 'other' share spikes is mojibake or markup).

    Map-only: per-batch vectorized class counts (pandas str.count on
    single-char classes — the SQL oracle uses the identical classes
    via length(regexp_replace)) pre-summed per group, one tiny
    groupby."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def pre(b: pa.Table) -> pa.Table:
        schema = {group_col: pa.array([], pa.string()),
                  "n_chars": pa.array([], pa.int64()),
                  "n_alpha": pa.array([], pa.int64()),
                  "n_space": pa.array([], pa.int64()),
                  "n_digit": pa.array([], pa.int64())}
        if b.num_rows == 0:
            return pa.table(schema)
        t = b.column(text_col).to_pandas().fillna("")
        g = pd.DataFrame({
            group_col: b.column(group_col).to_pandas()
            .to_numpy(object),
            "n_chars": t.str.len().to_numpy(np.int64),
            "n_alpha": t.str.count(r"[a-zA-Z]").to_numpy(np.int64),
            "n_space": t.str.count(r" ").to_numpy(np.int64),
            "n_digit": t.str.count(r"[0-9]").to_numpy(np.int64)}) \
            .groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n_chars"), Sum("n_alpha"),
                                      Sum("n_space"), Sum("n_digit"))

    def finish(b: pa.Table) -> pa.Table:
        nc = pc.cast(b.column("sum(n_chars)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        na = pc.cast(b.column("sum(n_alpha)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        ns = pc.cast(b.column("sum(n_space)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        nd = pc.cast(b.column("sum(n_digit)"), pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            group_col: pc.cast(b.column(group_col), pa.string()),
            "n_chars": pa.array(nc), "n_alpha": pa.array(na),
            "n_space": pa.array(ns), "n_digit": pa.array(nd),
            "n_other": pa.array(nc - na - ns - nd),
            "alpha_ppm": pa.array(na * 1_000_000
                                  // np.maximum(nc, 1))})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Round-5 wave A: encoding-damage (mojibake) audit
# ---------------------------------------------------------------------------

# classic UTF-8-read-as-Latin-1 artifacts: 'Ã' (C3-prefixed two-byte
# sequences), 'â€' (E2 80 punctuation family) and the replacement char
_MOJIBAKE_MARKERS = ("Ã", "â€", "�")


def mojibake_audit(ds, *, group_col: str = "source",
                   text_col: str = "text"):
    """Per-group encoding-damage audit: how many documents carry
    mojibake markers ('Ã', 'â€', U+FFFD — the UTF-8-decoded-as-Latin-1
    fingerprints) and how many contain ANY non-ASCII character at all.

    -> (group, n_docs, n_mojibake_docs, n_nonascii_docs,
        mojibake_ppm [truncated integer]).  Map-side per-group partial
    counts (vectorized str.contains), one tiny groupby sum."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        txt = df[text_col].fillna("")
        moji = pd.Series(False, index=df.index)
        for m in _MOJIBAKE_MARKERS:
            moji |= txt.str.contains(m, regex=False)
        nonascii = txt.str.contains(r"[^\x00-\x7f]", regex=True)
        g = pd.DataFrame({group_col: df[group_col].fillna(""),
                          "n_docs": 1,
                          "n_mojibake_docs": moji.astype(np.int64),
                          "n_nonascii_docs": nonascii.astype(np.int64)})
        return g.groupby(group_col, as_index=False).sum()

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby(group_col) \
        .aggregate(Sum("n_docs"), Sum("n_mojibake_docs"),
                   Sum("n_nonascii_docs"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {group_col: "object", "n_docs": "int64",
                "n_mojibake_docs": "int64", "n_nonascii_docs": "int64",
                "mojibake_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = pd.DataFrame({
            group_col: df[group_col],
            "n_docs": df["sum(n_docs)"].astype(np.int64),
            "n_mojibake_docs":
                df["sum(n_mojibake_docs)"].astype(np.int64),
            "n_nonascii_docs":
                df["sum(n_nonascii_docs)"].astype(np.int64)})
        out["mojibake_ppm"] = (out["n_mojibake_docs"] * 1_000_000
                               // out["n_docs"])
        return out.astype(cols)

    return agg.map_batches(finish, batch_format="pandas")


def char_bigram_entropy(ds, *, group_col: str = "source",
                        text_col: str = "text"):
    """Per-group character-bigram entropy table: H(pair), H(left
    char) and the conditional H(c2|c1) = H(pair) - H(c1), each as the
    ORDER-FREE integer sum of per-term floor(1e6 * -p ln p) (the
    user_type_entropy ppm pattern, so DuckDB reproduces every column
    exactly).  Pairs are adjacent characters WITHIN a document.
    -> (group, n_pairs, h_pair_ppm, h_left_ppm, h_cond_ppm).

    Scale shape: fully vectorized pair extraction (one UTF-32 view of
    the batch's concatenated text, separator-masked, position ->
    document via searchsorted), per-batch (group, c1, c2) partial
    counts, one pair-keyed exchange bounded by the bigram domain,
    per-group entropy resolve."""
    import pandas as pd

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"g": "object", "c1": "int64", "c2": "int64",
                "o": "int64"}
        txt = df[text_col].fillna("")
        grp = df[group_col].fillna("").astype(str)
        if len(df) == 0 or int(txt.str.len().sum()) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        big = "\x01".join(txt.tolist())
        codes = np.frombuffer(big.encode("utf-32-le"), np.uint32)
        if len(codes) < 2:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        c1 = codes[:-1].astype(np.int64)
        c2 = codes[1:].astype(np.int64)
        valid = (c1 != 1) & (c2 != 1)
        lens = txt.str.len().to_numpy(np.int64)
        ends = np.cumsum(lens + 1)  # separator after each doc
        doc_of = np.searchsorted(ends, np.arange(len(c1)),
                                 side="right")
        g = pd.DataFrame({"g": grp.to_numpy()[doc_of][valid],
                          "c1": c1[valid], "c2": c2[valid], "o": 1})
        return g.groupby(["g", "c1", "c2"], as_index=False).sum() \
            .astype(cols)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"group": "object", "n_pairs": "int64",
                "h_pair_ppm": "int64", "h_left_ppm": "int64",
                "h_cond_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = []
        for g, sub in df.groupby("g"):
            pc_ = sub.groupby(["c1", "c2"], as_index=False)["o"].sum()
            t = int(pc_["o"].sum())
            if t == 0:
                continue
            p = pc_["o"].to_numpy(np.float64) / t
            hp = int(np.floor(1_000_000 * (-p * np.log(p)))
                     .astype(np.int64).sum())
            lc = pc_.groupby("c1", as_index=False)["o"].sum()
            q = lc["o"].to_numpy(np.float64) / t
            hl = int(np.floor(1_000_000 * (-q * np.log(q)))
                     .astype(np.int64).sum())
            out.append({"group": g, "n_pairs": t, "h_pair_ppm": hp,
                        "h_left_ppm": hl, "h_cond_ppm": hp - hl})
        if not out:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        return pd.DataFrame(out).astype(cols)

    from .dedup import _grouped_by_partition
    return _grouped_by_partition(
        ds.map_batches(pairs, batch_format="pandas"), ["g"], resolve,
        n_parts=8)
