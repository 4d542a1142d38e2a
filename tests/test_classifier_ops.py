"""Unit tests for ops/classifier.py: distributed IRLS logistic
regression must (a) match a single-machine numpy IRLS on the same data
to float tolerance (the distributed partials change only summation
grouping), (b) separate a planted signal, and (c) score monotonically
in the deciding feature."""
import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, n_blocks=4):
    import ray
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def _local_irls(X, y, iters=8, ridge=1e-3, tol=1e-6):
    beta = np.zeros(X.shape[1])
    for _ in range(iters):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-np.clip(eta, -30.0, 30.0)))
        w = p * (1.0 - p)
        g = X.T @ (y - p)
        H = (X * w[:, None]).T @ X
        H[np.diag_indices(X.shape[1])] += ridge
        step = np.linalg.solve(H, g)
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            break
    return beta


def _make_table(rng, n=400):
    """Two numeric features; label depends on f1 via a logistic rule."""
    f1 = rng.normal(0, 1, n)
    f2 = rng.normal(0, 1, n)
    y = (f1 + 0.2 * rng.normal(0, 1, n) > 0).astype(np.float64)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "f1": pa.array(f1), "f2": pa.array(f2),
        "y": pa.array(y),
    }), np.column_stack([np.ones(n), f1, f2]), y


def _make_featurize():
    # nested closure: cloudpickle ships it by value (a module-level test
    # function would be pickled by reference and fail to import on the
    # Ray workers)
    def featurize(b: pa.Table):
        f1 = b.column("f1").to_numpy(zero_copy_only=False)
        f2 = b.column("f2").to_numpy(zero_copy_only=False)
        X = np.column_stack([np.ones(len(f1)), f1, f2])
        y = (b.column("y").to_numpy(zero_copy_only=False)
             if "y" in b.column_names else np.zeros(len(f1)))
        return X, y

    return featurize


@pytest.mark.usefixtures("ray_session")
class TestLogregIRLS:
    def test_matches_local_irls(self):
        from pdf_extract_ray.ops.classifier import logreg_fit_irls
        tbl, X, y = _make_table(np.random.RandomState(5))
        beta = logreg_fit_irls(_ds(tbl), _make_featurize(), dim=3)
        expect = _local_irls(X, y)
        assert np.allclose(beta, expect, rtol=1e-6, atol=1e-8)

    def test_separates_planted_signal(self):
        from pdf_extract_ray.ops.classifier import (logreg_fit_irls,
                                                    logreg_score)
        tbl, X, y = _make_table(np.random.RandomState(9))
        beta = logreg_fit_irls(_ds(tbl), _make_featurize(), dim=3)
        scores = logreg_score(_ds(tbl), _make_featurize(), beta).to_pandas()
        s = scores.sort_values("doc_id")["score"].to_numpy()
        acc = np.mean((s > 0.5) == (y > 0.5))
        assert acc > 0.9
        # the deciding weight dominates the noise weight
        assert abs(beta[1]) > 5 * abs(beta[2])

    def test_gate_features_shape(self):
        from pdf_extract_ray.ops.classifier import text_gate_features
        tbl = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a bb ccc", ""], pa.string()),
        })
        X, y = text_gate_features()(tbl)
        assert X.shape == (2, 4)
        assert X[0, 2] == 1.0          # all words distinct
        assert X[0, 3] == 2.0          # mean word length (1+2+3)/3
        assert X[1, 1] == 0.0 and X[1, 2] == 0.0
