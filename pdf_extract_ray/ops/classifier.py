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
