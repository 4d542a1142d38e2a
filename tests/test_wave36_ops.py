"""Wave-36 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import math
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave36_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


DAY = 86_400_000_000


def _ev_days(day_counts):
    rows = []
    for d, n in day_counts.items():
        rows += [d] * n
    return pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [1] * len(rows),
        "ts": pd.to_datetime([d * DAY for d in rows], unit="us"),
        "event_type": ["a"] * len(rows),
        "value": [0.0] * len(rows),
        "props": ["{}"] * len(rows),
    })


@pytest.mark.usefixtures("ray_session")
class TestDailyAcf:
    def test_alternating_series_negative_lag1(self):
        m = _entry("acf")
        # counts 1,3,1,3,... -> lag-1 ACF == -1, lag-2 == +1
        ev = _ev_days({d: (1 if d % 2 == 0 else 3)
                       for d in range(10)})
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["daily_acf"](td).set_index("lag")
        assert int(out.loc[1, "acf_ppm"]) == -1_000_000
        assert int(out.loc[2, "acf_ppm"]) == 1_000_000
        assert int(out.loc[1, "n_pairs"]) == 9

    def test_reference_formula(self):
        m = _entry("acf2")
        out = m.queries()["daily_acf"]("/root/testdata/sf0.001")
        assert (out["acf_ppm"].abs() <= 1_000_001).all()
        assert out["lag"].tolist() == list(range(1, len(out) + 1))


@pytest.mark.usefixtures("ray_session")
class TestDailyPeaks:
    def test_hand_computed(self):
        m = _entry("pk")
        # series over days 0..4: 1, 5, 2, 7, 3 -> peaks at d=1,3;
        # top day 3 (count 7)
        ev = _ev_days({0: 1, 1: 5, 2: 2, 3: 7, 4: 3})
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["daily_peaks"](td)
        r = out.iloc[0]
        assert int(r["n_days"]) == 5
        assert int(r["n_peaks"]) == 2
        assert int(r["top_day"]) == 3
        assert int(r["top_count"]) == 7

    def test_gap_days_count_as_zero(self):
        m = _entry("pk2")
        # days 0 and 2 active, day 1 missing -> series 2,0,2:
        # no interior peak, top day 0 (tie breaks earliest)
        ev = _ev_days({0: 2, 2: 2})
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["daily_peaks"](td)
        r = out.iloc[0]
        assert int(r["n_days"]) == 3
        assert int(r["n_peaks"]) == 0
        assert int(r["top_day"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestElasticityByBrand:
    def test_perfect_negative_relation(self):
        m = _entry("el")
        # quantity falls exactly as discount rises -> corr == -1
        part = pd.DataFrame({"p_partkey": [1],
                             "p_brand": ["B#1"],
                             "p_name": ["x"], "p_type": ["t"],
                             "p_size": [1],
                             "p_retailprice": [1.0]})
        li = pd.DataFrame({
            "l_orderkey": range(4), "l_partkey": [1] * 4,
            "l_suppkey": [1] * 4, "l_linenumber": [1] * 4,
            "l_quantity": [40.0, 30.0, 20.0, 10.0],
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.00, 0.01, 0.02, 0.03],
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4, "l_linestatus": ["O"] * 4,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * 4),
        })
        with tempfile.TemporaryDirectory() as td:
            part.to_parquet(os.path.join(td, "part.parquet"))
            li.to_parquet(os.path.join(td, "lineitem.parquet"))
            out = m.queries()["elasticity_by_brand"](td)
        r = out.iloc[0]
        assert r["brand"] == "B#1"
        assert int(r["n_items"]) == 4
        assert abs(float(r["corr_dq"]) + 1.0) < 1e-12
