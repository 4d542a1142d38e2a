"""Wave-24 op kernels: hand-computed expectations independent of the
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
        f"entry_wave24_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


DAY = 86_400_000_000


@pytest.mark.usefixtures("ray_session")
class TestTypeLagXcorr:
    def test_planted_lag(self):
        m = _entry("xc")
        # type 'a' fires on days 0..9, type 'b' echoes 3 days later
        days_a = list(range(10))
        days_b = [d + 3 for d in days_a]
        ev = pd.DataFrame({
            "event_id": range(20),
            "ts": pd.to_datetime(
                [d * DAY for d in days_a] + [d * DAY for d in days_b],
                unit="us"),
            "event_type": ["a"] * 10 + ["b"] * 10,
            "user_id": [1] * 20,
            "value": [0.0] * 20,
            "props": ["{}"] * 20,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["type_lag_xcorr"](td) \
                .set_index("lag")
        assert len(out) == 15
        # xcorr at lag 3 = 10 overlapping days; best flag there
        assert int(out.loc[3, "xcorr"]) == 10
        assert int(out.loc[3, "is_best"]) == 1
        assert int(out["is_best"].sum()) == 1

    def test_single_type_empty(self):
        m = _entry("xc2")
        ev = pd.DataFrame({
            "event_id": [1], "ts": pd.to_datetime([0], unit="us"),
            "event_type": ["only"], "user_id": [1],
            "value": [0.0], "props": ["{}"],
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["type_lag_xcorr"](td)
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestAnalyzeTableSketch:
    def test_small_table_exact_ndv(self):
        m = _entry("an")
        orders = pd.DataFrame({
            "o_orderkey": [1, 2, 3, 3],
            "o_custkey": [7, 7, 7, 8],
            "o_orderdate": pd.to_datetime(
                ["1995-01-01"] * 4),
            "o_totalprice": [1.00, 2.00, 2.00, None],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["analyze_table_sketch"](td) \
                .set_index("column_name")
        # < 128 distincts -> KMV estimate is EXACT
        assert int(out.loc["o_orderkey", "ndv_est"]) == 3
        assert int(out.loc["o_custkey", "ndv_est"]) == 2
        assert int(out.loc["order_day", "ndv_est"]) == 1
        assert int(out.loc["total_cents", "ndv_est"]) == 2
        assert int(out.loc["total_cents", "n_nulls"]) == 1
        assert int(out.loc["o_orderkey", "min_v"]) == 1
        assert int(out.loc["o_orderkey", "max_v"]) == 3
        assert int(out.loc["total_cents", "min_v"]) == 100
        assert int(out.loc["total_cents", "max_v"]) == 200

    def test_kmv_estimate_reasonable_at_scale(self):
        m = _entry("an2")
        out = m.queries()["analyze_table_sketch"](
            "/root/testdata/sf0.01").set_index("column_name")
        n_orders = int(out.loc["o_orderkey", "n_rows"])
        est = int(out.loc["o_orderkey", "ndv_est"])
        # orderkeys unique: estimate within 30% of truth
        assert abs(est - n_orders) <= 0.3 * n_orders


@pytest.mark.usefixtures("ray_session")
class TestSequenceGaps:
    def test_hand_computed(self):
        m = _entry("sg")
        orders = pd.DataFrame({
            "o_orderkey": [1, 2, 7, 8, 8, 20],
            "o_custkey": [1] * 6,
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 6),
            "o_totalprice": [1.0] * 6,
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["sequence_gaps"](td)
        r = out.iloc[0]
        assert int(r["n_keys"]) == 5
        assert (int(r["min_key"]), int(r["max_key"])) == (1, 20)
        # range 1..20 holds 20 slots, 5 filled -> 15 missing
        assert int(r["n_missing"]) == 15
        # largest run: 9..19 = 11 missing keys (8 -> 20 jump)
        assert int(r["largest_run"]) == 11

    def test_cross_bucket_boundary_run(self):
        m = _entry("sg2")
        # keys straddle the 4096 bucket boundary with a gap across it
        orders = pd.DataFrame({
            "o_orderkey": [4000, 9000],
            "o_custkey": [1, 1],
            "o_orderdate": pd.to_datetime(["1995-01-01"] * 2),
            "o_totalprice": [1.0, 1.0],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["sequence_gaps"](td)
        assert int(out.iloc[0]["largest_run"]) == 4999
