"""Wave-35 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave35_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
class TestSourceWeightedJaccard:
    def test_hand_computed(self):
        m = _entry("wj")
        docs = pd.DataFrame({
            "doc_id": range(2),
            "source": ["a", "b"],
            "text": ["x x y", "x y y z"],
            "lang": ["en"] * 2, "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["source_weighted_jaccard"](td)
        r = out.iloc[0]
        # a: {x:2, y:1, z:0}; b: {x:1, y:2, z:1}
        # min = 1+1+0 = 2; max = 2+2+1 = 5
        assert (r["source_a"], r["source_b"]) == ("a", "b")
        assert int(r["min_sum"]) == 2
        assert int(r["max_sum"]) == 5
        assert int(r["wj_ppm"]) == 400_000

    def test_identical_sources_jaccard_one(self):
        m = _entry("wj2")
        docs = pd.DataFrame({
            "doc_id": range(2),
            "source": ["a", "b"],
            "text": ["p q q", "p q q"],
            "lang": ["en"] * 2, "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["source_weighted_jaccard"](td)
        assert int(out.iloc[0]["wj_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestSeasonalIndex:
    def test_uniform_and_skewed(self):
        m = _entry("si")
        orders = pd.DataFrame({
            "o_orderkey": range(3),
            "o_custkey": [1] * 3,
            "o_orderdate": pd.to_datetime(
                ["1995-01-10", "1995-02-10", "1995-02-20"]),
            "o_totalprice": [1.00, 1.00, 2.00],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["seasonal_index"](td) \
                .set_index("month_of_year")
        # total 400c; jan 100c -> 100*12e6/400 = 3e6; feb 300c -> 9e6
        assert int(out.loc[1, "index_ppm"]) == 3_000_000
        assert int(out.loc[2, "index_ppm"]) == 9_000_000
        assert int(out.loc[2, "n_orders"]) == 2


@pytest.mark.usefixtures("ray_session")
class TestFoldBalanceReport:
    def test_matches_reference_shares(self):
        m = _entry("fb")
        docs = pd.DataFrame({
            "doc_id": np.arange(100),
            "lang": ["en" if i % 2 == 0 else "de"
                     for i in range(100)],
            "source": ["s"] * 100, "text": ["x"] * 100,
            "n_chars": [1] * 100,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["fold_balance_report"](td)
        M = 1_000_000
        folds = np.asarray([
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5
            for i in range(100)])
        langs = np.asarray(docs["lang"])
        for _, r in out.iterrows():
            f, l_ = int(r["fold"]), r["lang"]
            n = int(((folds == f) & (langs == l_)).sum())
            ft = int((folds == f).sum())
            lt = int((langs == l_).sum())
            assert int(r["n_docs"]) == n
            assert int(r["fold_share_ppm"]) == n * M // ft
            assert int(r["global_share_ppm"]) == lt * M // 100
            assert int(r["dev_ppm"]) == abs(
                n * M // ft - lt * M // 100)
        # every (fold, lang) combination with members is present
        assert int(out["n_docs"].sum()) == 100
