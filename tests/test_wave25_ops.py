"""Wave-25 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave25_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
class TestTypeDwellTime:
    def test_hand_computed(self):
        m = _entry("dw")
        # user 1: a@0 -> b@1h -> a@4h (dwell a=1h, b=3h; last a open)
        ev = pd.DataFrame({
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([0, H, 4 * H], unit="us"),
            "event_type": ["a", "b", "a"],
            "value": [0.0] * 3, "props": ["{}"] * 3,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["type_dwell_time"](td) \
                .set_index("event_type")
        assert int(out.loc["a", "n_segments"]) == 1
        assert int(out.loc["a", "total_dwell_us"]) == H
        assert int(out.loc["b", "total_dwell_us"]) == 3 * H
        assert int(out.loc["b", "avg_dwell_us"]) == 3 * H

    def test_single_event_users_emit_nothing(self):
        m = _entry("dw2")
        ev = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 2],
            "ts": pd.to_datetime([0, H], unit="us"),
            "event_type": ["a", "b"],
            "value": [0.0] * 2, "props": ["{}"] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["type_dwell_time"](td)
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestYoyRevenue:
    def test_hand_computed(self):
        m = _entry("yoy")
        orders = pd.DataFrame({
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1] * 3,
            "o_orderdate": pd.to_datetime(
                ["1995-03-15", "1996-03-02", "1996-04-01"]),
            "o_totalprice": [2.00, 3.00, 5.00],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["yoy_revenue"](td).set_index("month")
        m95 = (1995 - 1970) * 12 + 2
        m96 = m95 + 12
        assert int(out.loc[m96, "prev_year_cents"]) == 200
        # (300-200)*1e6 // 200 = 500000
        assert int(out.loc[m96, "yoy_ppm"]) == 500_000
        assert int(out.loc[m95, "yoy_ppm"]) == 0  # no prior year

    def test_negative_yoy_truncates_toward_zero(self):
        m = _entry("yoy2")
        orders = pd.DataFrame({
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderdate": pd.to_datetime(["1995-01-01",
                                           "1996-01-01"]),
            "o_totalprice": [3.00, 1.00],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["yoy_revenue"](td)
        row = out[out["prev_year_cents"] > 0].iloc[0]
        # (100-300)*1e6 / 300 = -666666.67 -> trunc -666666
        assert int(row["yoy_ppm"]) == -666_666


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingDimProfile:
    def test_hand_computed(self):
        m = _entry("dp")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "vec_id": [0, 1],
                "embedding": [[0.5] * 64,
                              [-0.0005] + [0.25] * 63],
            }).to_parquet(os.path.join(td, "embeddings.parquet"))
            out = m.queries()["embedding_dim_profile"](td) \
                .set_index("dim")
        assert len(out) == 64
        # dim 0: q values 500 and floor(-0.5) = -1
        assert int(out.loc[0, "sum_q"]) == 499
        assert int(out.loc[0, "min_q"]) == -1
        assert int(out.loc[0, "max_q"]) == 500
        # other dims: 500 + 250
        assert int(out.loc[1, "sum_q"]) == 750
        assert (out["n"] == 2).all()

    def test_null_embeddings_excluded(self):
        m = _entry("dp2")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "vec_id": [0, 1],
                "embedding": [[1.0] * 64, None],
            }).to_parquet(os.path.join(td, "embeddings.parquet"))
            out = m.queries()["embedding_dim_profile"](td)
        assert (out["n"] == 1).all()
        assert (out["sum_q"] == 1000).all()
