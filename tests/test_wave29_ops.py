"""Wave-29 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave29_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


DAY = 86_400_000_000


def _events(pairs):
    """pairs: list of (user, day)."""
    return pd.DataFrame({
        "event_id": range(len(pairs)),
        "user_id": [u for u, _ in pairs],
        "ts": pd.to_datetime([d * DAY for _, d in pairs], unit="us"),
        "event_type": ["a"] * len(pairs),
        "value": [0.0] * len(pairs),
        "props": ["{}"] * len(pairs),
    })


@pytest.mark.usefixtures("ray_session")
class TestDauChurnJaccard:
    def test_hand_computed(self):
        m = _entry("cj")
        # day0: {1,2}; day1: {2,3}: both=1, union=3 -> 1/3
        ev = _events([(1, 0), (2, 0), (2, 1), (3, 1)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["dau_churn_jaccard"](td)
        assert len(out) == 1
        r = out.iloc[0]
        assert (int(r["n_active"]), int(r["n_prev"]),
                int(r["n_both"])) == (2, 2, 1)
        assert int(r["jaccard_ppm"]) == 1_000_000 // 3

    def test_identical_days_jaccard_one(self):
        m = _entry("cj2")
        ev = _events([(1, 0), (2, 0), (1, 1), (2, 1)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["dau_churn_jaccard"](td)
        assert int(out.iloc[0]["jaccard_ppm"]) == 1_000_000

    def test_gap_days_skipped(self):
        m = _entry("cj3")
        ev = _events([(1, 0), (1, 5)])  # no consecutive days
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["dau_churn_jaccard"](td)
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestUserGrowthCurve:
    def test_hand_computed(self):
        m = _entry("gc")
        # user1 first on day0, user2 day0, user3 day2
        ev = _events([(1, 0), (2, 0), (1, 1), (3, 2), (2, 2)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["user_growth_curve"](td) \
                .set_index("day")
        assert int(out.loc[0, "new_users"]) == 2
        assert 1 not in out.index  # no NEW users on day 1
        assert int(out.loc[2, "new_users"]) == 1
        assert int(out.loc[2, "cum_users"]) == 3
        assert out["cum_users"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
class TestCompressRatio:
    def test_repetitive_compresses_harder(self):
        m = _entry("cr")
        docs = pd.DataFrame({
            "doc_id": [0, 1],
            "source": ["rep", "rand"],
            "text": ["abc " * 500,
                     " ".join(str(i * 7919 % 100000)
                              for i in range(500))],
            "lang": ["en"] * 2, "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["compress_ratio_by_source"](td) \
                .set_index("source")
        assert int(out.loc["rep", "ratio_ppm"]) \
            < int(out.loc["rand", "ratio_ppm"])
        assert (out["comp_bytes"] <= out["raw_bytes"] + 64).all()
        assert (out["ratio_ppm"] > 0).all()

    def test_deterministic(self):
        m = _entry("cr2")
        a = m.queries()["compress_ratio_by_source"](
            "/root/testdata/sf0.001").sort_values("source") \
            .reset_index(drop=True)
        b = m.queries()["compress_ratio_by_source"](
            "/root/testdata/sf0.001").sort_values("source") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
