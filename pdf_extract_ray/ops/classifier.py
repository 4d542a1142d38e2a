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
