"""Distributed quality-classifier training and scoring (the FineWeb /
DCLM model-based filtering shape: learn a tiny model that imitates or
replaces a rule-based gate, then score the whole corpus map-side).

The reference (jrmuizel/pdf-extract) has no ML surface; this is part of
the beyond-the-reference training-data suite.

Scale design:
- logreg_fit_irls: Newton/IRLS for logistic regression.  Each iteration
  is ONE map_batches pass that emits, per batch, the partial gradient
  X^T(y-p) (d floats) and partial Hessian X^T W X (d^2 floats); the
  driver sums the tiny partials (n_blocks x d^2 numbers, d ~ 10) and
  solves a d x d system.  No corpus row ever leaves its block — the
  only driver-side data is O(d^2) per block.  IRLS converges in ~5-8
  iterations (quadratic), so the whole fit is a handful of linear
  passes regardless of corpus size.
- logreg_score: weights broadcast in the task closure; one vectorized
  map_batches pass.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa


def logreg_fit_irls(ds, featurize: Callable[[pa.Table], tuple],
                    *, dim: int, iters: int = 8, ridge: float = 1e-3,
                    tol: float = 1e-6) -> np.ndarray:
    """Fit logistic regression by distributed IRLS.

    featurize(batch) -> (X float64 [n, dim], y float64 [n] in {0,1});
    it runs inside every map task, so features never materialize as a
    dataset.  Returns the weight vector (float64 [dim]).  `ridge` keeps
    the Newton step bounded when classes are separable."""
    beta = np.zeros(dim, dtype=np.float64)

    for _ in range(iters):
        b_cur = beta.copy()

        def partials(b: pa.Table, _beta=b_cur) -> pa.Table:
            X, y = featurize(b)
            eta = X @ _beta
            p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30.0, 30.0)))
            w = p * (1.0 - p)
            g = X.T @ (y - p)                      # [d]
            H = (X * w[:, None]).T @ X             # [d, d]
            return pa.table({
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "h": pa.array([H.ravel().tolist()], pa.list_(pa.float64())),
            })

        parts = ds.map_batches(partials, batch_format="pyarrow") \
            .take_all()
        if not parts:  # empty corpus: the zero model (p = 0.5)
            break
        g = np.sum([np.asarray(r["g"]) for r in parts], axis=0)
        H = np.sum([np.asarray(r["h"]) for r in parts], axis=0) \
            .reshape(dim, dim)
        H[np.diag_indices(dim)] += ridge
        step = np.linalg.solve(H, g)
        beta = beta + step
        if float(np.max(np.abs(step))) < tol:
            break
    return beta


def logreg_score(ds, featurize: Callable[[pa.Table], tuple],
                 beta: np.ndarray, id_col: str = "doc_id"):
    """Score every row with a fitted model -> (id_col, score) in one
    vectorized pass; weights ride the task closure (broadcast once)."""
    beta = np.asarray(beta, dtype=np.float64)

    def score(b: pa.Table) -> pa.Table:
        X, _ = featurize(b)
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30.0, 30.0)))
        return pa.table({id_col: b.column(id_col),
                         "score": pa.array(p, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def text_gate_features(text_col: str = "text",
                       label_fn: Callable | None = None):
    """Featurizer factory for word-stream documents: intercept, word
    count (log1p), distinct-word ratio, mean word length.  label_fn
    (batch -> float64 [n]) supplies training labels; None for scoring."""

    import pandas as pd

    def featurize(b: pa.Table):
        texts = b.column(text_col).to_pandas().reset_index(drop=True)
        n = len(texts)
        # vectorized word stats: one explode, grouped size/nunique/char
        # sums — no per-row Python
        ex = texts.str.split(" ").explode()
        ex = ex[(ex != "") & ex.notna()]
        g = ex.groupby(level=0)
        idx = pd.RangeIndex(n)
        k = g.size().reindex(idx, fill_value=0).to_numpy(np.float64)
        nuniq = g.nunique().reindex(idx, fill_value=0) \
            .to_numpy(np.float64)
        chars = ex.str.len().groupby(level=0).sum() \
            .reindex(idx, fill_value=0).to_numpy(np.float64)
        safe_k = np.where(k > 0, k, 1.0)
        dr = np.where(k > 0, nuniq / safe_k, 0.0)
        ml = np.where(k > 0, chars / safe_k, 0.0)
        X = np.column_stack([np.ones(n), np.log1p(k), dr, ml])
        y = label_fn(b) if label_fn is not None else np.zeros(n)
        return X, np.asarray(y, np.float64)

    return featurize


def isotonic_calibration(ds, score_col: str, label_col: str):
    """Isotonic (PAVA) calibration of a binary label against an integer
    score -> one row per pooled block (score_lo, score_hi, n, pos,
    cal_ppm) with cal_ppm = pos * 1e6 // n: the maximal-block
    pool-adjacent-violators fit, i.e. the non-decreasing step function
    of P(label | score) that minimizes squared error.  The standard
    classifier-calibration shape (reliability curve without arbitrary
    binning).  All outputs are exact integers: blocks pool by comparing
    COUNT-CROSS-MULTIPLIED positives (pos_i * n_j vs pos_j * n_i), so
    no float mean can reorder pooling between runs.

    Scale shape: ONE bounded (score, label) histogram aggregate (the
    mannwhitney/ks discipline), then a single tiny task runs the
    sequential PAVA stack over the distinct-score histogram — PAVA is
    inherently ordered, but its input is O(distinct scores), never
    O(rows).  Not SQL-oracled (PAVA is iterative); tests pin the fit
    against a brute-force local reference."""
    import pandas as pd
    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        lab = pc.cast(pc.fill_null(b.column(label_col), False),
                      pa.int64())
        return pa.table({"s": pc.cast(b.column(score_col), pa.int64()),
                         "y": lab})

    hist = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby(["s", "y"]).count()

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"score_lo": "int64", "score_hi": "int64", "n": "int64",
                "pos": "int64", "cal_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        df = df.sort_values("s")
        s = df["s"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        cnt = df["count()"].to_numpy(np.int64)
        first = np.r_[True, s[1:] != s[:-1]]
        vid = np.cumsum(first) - 1
        nv = int(vid[-1]) + 1
        sv = s[first]
        n_v = np.zeros(nv, np.int64)
        p_v = np.zeros(nv, np.int64)
        np.add.at(n_v, vid, cnt)
        np.add.at(p_v, vid, np.where(y == 1, cnt, 0))
        # PAVA stack over the distinct-score histogram: each block is
        # (lo_idx, hi_idx, n, pos); merge while mean(prev) > mean(cur),
        # compared as pos_prev * n_cur > pos_cur * n_prev (exact ints)
        blocks: list[list[int]] = []
        for i in range(nv):
            blocks.append([i, i, int(n_v[i]), int(p_v[i])])
            while (len(blocks) > 1 and
                   blocks[-2][3] * blocks[-1][2]
                   > blocks[-1][3] * blocks[-2][2]):
                lo, _, n1, p1 = blocks.pop(-2)
                blocks[-1] = [lo, blocks[-1][1],
                              n1 + blocks[-1][2], p1 + blocks[-1][3]]
        return pd.DataFrame({
            "score_lo": [int(sv[b[0]]) for b in blocks],
            "score_hi": [int(sv[b[1]]) for b in blocks],
            "n": [b[2] for b in blocks],
            "pos": [b[3] for b in blocks],
            "cal_ppm": [b[3] * 1_000_000 // b[2] for b in blocks],
        }).astype(cols)

    return hist.repartition(1).map_batches(resolve,
                                           batch_format="pandas",
                                           batch_size=None)


def nb_lang_confusion(ds, *, text_col: str = "text",
                      label_col: str = "lang"):
    """Multinomial Naive Bayes language classifier, trained and
    evaluated on the corpus itself, with the whole model in EXACT
    log-ppm integers -> confusion matrix (true_lang, pred_lang,
    n_docs).

    Training pass: per-batch (lang, word) token counts plus per-lang
    doc counts (carried in reserved ''-word rows, which real tokens
    can never occupy because empty tokens are dropped) -> ONE bounded
    (lang, word) groupby (vocab-domain, not row-domain).  The model
    is Laplace-smoothed: logp_ppm(c, w) = floor(1e6 * ln((cnt + 1) /
    (tot_c + V))), prior_ppm(c) = floor(1e6 * ln(n_c / N)) — the same
    double->floor construction as the oracle SQL (the nation_theil
    precedent), so per-term integers match bit for bit and the summed
    scores are exact.

    Scoring pass: the model (langs x vocab ints) broadcasts via
    ray.put; each batch builds its docs' tf rows over the vocab index
    and scores all classes in ONE numpy matmul; argmax ties break to
    the lexicographically smallest lang (np.argmax first-hit over
    ascending class order).  Emits (true, pred) partials -> tiny
    groupby.  Null text folds to '', null lang to 'und' (corpus
    COALESCE policy)."""
    import collections
    import math

    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def train_partial(b: pa.Table) -> pa.Table:
        cnt: collections.Counter = collections.Counter()
        texts = b.column(text_col).to_pylist() if text_col in \
            b.column_names else [""] * b.num_rows
        langs = b.column(label_col).to_pylist() if label_col in \
            b.column_names else ["und"] * b.num_rows
        for lang, t in zip(langs, texts):
            lang = lang if lang is not None else "und"
            cnt[(lang, "")] += 1  # doc-count carrier row
            for w in (t or "").split(" "):
                if w:
                    cnt[(lang, w)] += 1
        ks = list(cnt.keys())
        return pa.table({
            "lang": pa.array([k[0] for k in ks], pa.string()),
            "word": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([cnt[k] for k in ks], pa.int64())})

    rows = ds.map_batches(train_partial, batch_format="pyarrow") \
        .groupby(["lang", "word"]).aggregate(Sum("n")).take_all()
    out_cols = {"true_lang": "object", "pred_lang": "object",
                "n_docs": "int64"}
    if not rows:
        return pd.DataFrame(columns=list(out_cols)).astype(
            {"n_docs": "int64"})
    n_docs_c: dict = {}
    wc: dict = {}
    vocab_set = set()
    for r in rows:
        lang, word, n = r["lang"], r["word"], int(r["sum(n)"])
        if word == "":
            n_docs_c[lang] = n_docs_c.get(lang, 0) + n
        else:
            wc[(lang, word)] = n
            vocab_set.add(word)
    langs = sorted(n_docs_c)
    vocab = sorted(vocab_set)
    V, N = len(vocab), sum(n_docs_c.values())
    widx = {w: i for i, w in enumerate(vocab)}
    tot_c = {c: 0 for c in langs}
    for (c, _), n in wc.items():
        tot_c[c] += n
    L = len(langs)
    logp = np.zeros((max(V, 1), L), np.int64)
    default = np.zeros(L, np.int64)
    prior = np.zeros(L, np.int64)
    M = 1_000_000
    for j, c in enumerate(langs):
        den = tot_c[c] + V
        prior[j] = math.floor(M * math.log(n_docs_c[c] / N))
        if den > 0:
            default[j] = math.floor(M * math.log(1.0 / den))
            logp[:, j] = default[j]
    for (c, w), n in wc.items():
        logp[widx[w], langs.index(c)] = math.floor(
            M * math.log((n + 1.0) / (tot_c[c] + V)))
    model_ref = ray.put((widx, logp, default, prior, langs))

    def score_partial(b: pa.Table) -> pa.Table:
        wi, lp, dflt, pr, cls = ray.get(model_ref)
        texts = b.column(text_col).to_pylist()
        labels = ["und" if v is None else v
                  for v in b.column(label_col).to_pylist()]
        n = len(texts)
        doc_idx, toks = [], []
        for i, t in enumerate(texts):
            ws = [w for w in (t or "").split(" ") if w]
            doc_idx.extend([i] * len(ws))
            toks.extend(ws)
        scores = np.tile(pr, (n, 1)).astype(np.int64)
        if toks:
            codes, uniq = pd.factorize(np.asarray(toks, object))
            rowmap = np.stack([lp[wi[w]] if w in wi else dflt
                               for w in uniq])
            np.add.at(scores, np.asarray(doc_idx, np.int64),
                      rowmap[codes])
        preds = [cls[int(j)] for j in np.argmax(scores, axis=1)] \
            if cls else ["und"] * n
        cm = collections.Counter(zip(labels, preds))
        ks = list(cm.keys())
        return pa.table({
            "true_lang": pa.array([x[0] for x in ks], pa.string()),
            "pred_lang": pa.array([x[1] for x in ks], pa.string()),
            "n": pa.array([cm[x] for x in ks], pa.int64())})

    out = ds.map_batches(score_partial, batch_format="pyarrow") \
        .groupby(["true_lang", "pred_lang"]).aggregate(Sum("n")) \
        .take_all()
    df = pd.DataFrame(out)
    if df.empty:
        return pd.DataFrame(columns=list(out_cols)).astype(
            {"n_docs": "int64"})
    df = df.rename(columns={"sum(n)": "n_docs"})
    df["n_docs"] = df["n_docs"].astype("int64")
    return df[["true_lang", "pred_lang", "n_docs"]]


def pr_curve(ds, *, score_col: str = "score_milli",
             label_col: str = "label",
             thresholds=(100, 250, 500, 750, 900)):
    """Precision/recall curve at fixed integer-milli thresholds from
    exact confusion counts: prediction = score >= t.  -> one row per
    threshold (threshold, tp, fp, fn, tn, precision_ppm, recall_ppm;
    truncating integer ppm, -1 when the denominator is zero).
    Map-side per-threshold partial counts, one tiny sum."""
    import pandas as pd
    from ray.data.aggregate import Sum
    ts = list(thresholds)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].fillna(0).astype(np.int64).to_numpy()
        y = df[label_col].fillna(False).astype(bool).to_numpy()
        rows = []
        for t in ts:
            p = s >= t
            rows.append({"threshold": t,
                         "tp": int((p & y).sum()),
                         "fp": int((p & ~y).sum()),
                         "fn": int((~p & y).sum()),
                         "tn": int((~p & ~y).sum())})
        return pd.DataFrame(rows)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("threshold").aggregate(Sum("tp"), Sum("fp"),
                                        Sum("fn"), Sum("tn"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"threshold": "int64", "tp": "int64", "fp": "int64",
                "fn": "int64", "tn": "int64", "precision_ppm": "int64",
                "recall_ppm": "int64"}
        if len(df) == 0:
            return pd.DataFrame(columns=list(cols)).astype(cols)
        out = pd.DataFrame({
            "threshold": df["threshold"].astype(np.int64),
            "tp": df["sum(tp)"].astype(np.int64),
            "fp": df["sum(fp)"].astype(np.int64),
            "fn": df["sum(fn)"].astype(np.int64),
            "tn": df["sum(tn)"].astype(np.int64)})
        pd_den = out["tp"] + out["fp"]
        rc_den = out["tp"] + out["fn"]
        out["precision_ppm"] = np.where(
            pd_den > 0, out["tp"] * 1_000_000 // pd_den.clip(lower=1),
            -1).astype(np.int64)
        out["recall_ppm"] = np.where(
            rc_den > 0, out["tp"] * 1_000_000 // rc_den.clip(lower=1),
            -1).astype(np.int64)
        return out.astype(cols)

    return agg.map_batches(finish, batch_format="pandas")


def bias_model(events_ds, *, user_col: str = "user_id",
               item_col: str = "event_type", value_col: str = "value",
               n_parts: int = 16):
    """Two-round additive bias model r ~ mu + b_u + b_i (the classic
    recommender baseline) with INTEGER-exact arithmetic: r =
    floor(value), mu and every bias update are TRUNCATING means
    (sign * (|sum| // n) — DuckDB's `//` truncates toward zero while
    Python's floors, so the signed form is the only
    division both engines agree on).  -> one row per item
    (item, n, b_i, resid_abs_sum) after round 2.

    Scale shape: one global mean pass; each round is ONE user-keyed
    partition pass (b_u is a per-user scalar resolved locally) whose
    map side pre-aggregates (item, resid) partials, plus a tiny item
    groupby; the <=|items| b_i vector broadcasts back.  Users never
    need a global table — their bias lives inside their partition."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def base(df: pd.DataFrame) -> pd.DataFrame:
        r = np.floor(df[value_col].fillna(0).astype(np.float64)) \
            .astype(np.int64)
        return pd.DataFrame({
            "u": df[user_col].fillna(-1).astype(np.int64),
            "it": df[item_col].fillna(""), "r": r})

    rows_ds = events_ds.map_batches(base, batch_format="pandas") \
        .materialize()
    tot = rows_ds.map_batches(
        lambda df: pd.DataFrame({"s": [int(df["r"].sum())],
                                 "n": [len(df)]}),
        batch_format="pandas").take_all()
    n_all = sum(int(r["n"]) for r in tot)
    out_cols = {"it": "object", "n": "int64", "b_i": "int64",
                "resid_abs_sum": "int64"}
    if n_all == 0:
        return pd.DataFrame(columns=list(out_cols)).astype(out_cols)

    def tdiv(s: int, n: int) -> int:
        return (abs(s) // n) * (1 if s >= 0 else -1)

    mu = tdiv(sum(int(r["s"]) for r in tot), n_all)

    from .dedup import _grouped_by_partition

    def item_partials(bi_map, final):
        """user-keyed pass: resolve b_u locally (with current b_i
        folded in), emit per-item residual partials."""

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"it": "object", "s": "int64", "a": "int64",
                    "n": "int64"}
            if len(df) == 0:
                return pd.DataFrame(columns=list(cols)).astype(cols)
            bi = df["it"].map(lambda i: bi_map.get(i, 0)) \
                .astype(np.int64)
            base_r = (df["r"].astype(np.int64) - mu - bi) \
                .reset_index(drop=True)
            u = df["u"].reset_index(drop=True)
            gs = pd.DataFrame({"u": u, "br": base_r}) \
                .groupby("u")["br"].agg(["sum", "size"])
            # truncating signed division, vectorized (no per-group
            # python): matches DuckDB's `//`
            bu_val = (gs["sum"].abs().to_numpy(np.int64)
                      // gs["size"].to_numpy(np.int64)) \
                * np.where(gs["sum"].to_numpy(np.int64) >= 0, 1, -1)
            bu = u.map(pd.Series(bu_val, index=gs.index)) \
                .astype(np.int64)
            resid = base_r - bu
            out = pd.DataFrame({"it": df["it"].reset_index(drop=True),
                                "s": resid, "a": resid.abs(), "n": 1})
            return out.groupby("it", as_index=False).sum() \
                .astype(cols)
        return fn

    def round_pass(bi_map, final=False):
        part = _grouped_by_partition(rows_ds, ["u"],
                                     item_partials(bi_map, final),
                                     n_parts=n_parts)
        agg = part.groupby("it").aggregate(Sum("s"), Sum("a"),
                                           Sum("n")).take_all()
        return {r["it"]: (int(r["sum(s)"]), int(r["sum(a)"]),
                          int(r["sum(n)"])) for r in agg}

    r1 = round_pass({})
    bi1 = {it: tdiv(s, n) for it, (s, a, n) in r1.items()}
    r2 = round_pass(bi1)
    out = []
    for it in sorted(r2):
        s, a, n = r2[it]
        out.append({"it": it, "n": n,
                    "b_i": bi1.get(it, 0) + tdiv(s, n),
                    "resid_abs_sum": a})
    return pd.DataFrame(out).astype(out_cols)
