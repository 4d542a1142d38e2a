"""Wave-31 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave31_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000


def _ev(rows):
    """rows: list of (user, hour, type)."""
    return pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [u for u, _, _ in rows],
        "ts": pd.to_datetime([h * H for _, h, _ in rows], unit="us"),
        "event_type": [t for _, _, t in rows],
        "value": [0.0] * len(rows),
        "props": ["{}"] * len(rows),
    })


@pytest.mark.usefixtures("ray_session")
class TestLinearAttribution:
    def test_equal_split_hand_computed(self):
        m = _entry("la")
        # user 1: click@0, view@1, purchase@2 -> each touch 500000
        # user 2: view@0, purchase@1 -> view gets 1000000
        ev = _ev([(1, 0, "click"), (1, 1, "view"), (1, 2, "purchase"),
                  (2, 0, "view"), (2, 1, "purchase")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["linear_attribution"](td) \
                .set_index("touch_type")
        assert int(out.loc["click", "n_touches"]) == 1
        assert int(out.loc["click", "total_credit_ppm"]) == 500_000
        assert int(out.loc["view", "n_touches"]) == 2
        assert int(out.loc["view", "total_credit_ppm"]) == 1_500_000

    def test_window_excludes_old_touches(self):
        m = _entry("la2")
        # click 8 days before purchase -> outside the 7d window
        day = 24
        ev = _ev([(1, 0, "click"), (1, 8 * day, "purchase"),
                  (1, 8 * day - 1, "view")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["linear_attribution"](td) \
                .set_index("touch_type")
        assert "click" not in out.index
        assert int(out.loc["view", "total_credit_ppm"]) == 1_000_000

    def test_floor_split_three_touches(self):
        m = _entry("la3")
        ev = _ev([(1, 0, "view"), (1, 1, "view"), (1, 2, "click"),
                  (1, 3, "purchase")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["linear_attribution"](td) \
                .set_index("touch_type")
        unit = 1_000_000 // 3
        assert int(out.loc["view", "total_credit_ppm"]) == 2 * unit
        assert int(out.loc["click", "total_credit_ppm"]) == unit


@pytest.mark.usefixtures("ray_session")
class TestDiffInDiff:
    def test_hand_computed(self):
        m = _entry("did")
        orders = pd.DataFrame({
            "o_orderkey": range(4),
            "o_custkey": [1, 1, 2, 2],  # 1 = treat, 2 = control
            "o_orderdate": pd.to_datetime(
                ["1994-06-01", "1995-06-01"] * 2),
            "o_totalprice": [1.00, 5.00, 2.00, 3.00],
        })
        with tempfile.TemporaryDirectory() as td:
            orders.to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["diff_in_diff"](td)
        r = out.iloc[0]
        # treat: 100 -> 500 (+400); ctrl: 200 -> 300 (+100) -> +300
        assert int(r["did_cents"]) == 300
        assert int(r["treat_before_cents"]) == 100
        assert int(r["ctrl_after_cents"]) == 300


@pytest.mark.usefixtures("ray_session")
class TestRboRankings:
    def test_identical_rankings_rbo(self):
        m = _entry("rbo")
        out = m.queries()["rbo_rankings"]("/root/testdata/sf0.001")
        assert len(out) == 8
        # truncated RBO at depth 20 with p=.9 maxes at
        # (1-p) * sum p^(d-1) = 1 - p^20
        p = Fraction(9, 10)
        max_ppm = int((1 - p ** 20) * 1_000_000)
        assert (out["rbo_ppm"] <= max_ppm).all()
        assert (out["rbo_ppm"] >= 0).all()
        assert (out["overlap_at_20"].between(0, 20)).all()

    def test_reference_formula_on_synthetic_lists(self):
        # independent check of the RBO math via the module function
        # shape: identical lists must hit the truncated maximum
        p = Fraction(9, 10)
        la = list(range(20))
        sa, sb = set(), set()
        rbo = Fraction(0)
        for d in range(1, 21):
            sa.add(la[d - 1])
            sb.add(la[d - 1])
            rbo += (p ** (d - 1)) * Fraction(len(sa & sb), d)
        rbo *= (1 - p)
        assert int(rbo * 1_000_000) == int((1 - p ** 20) * 1_000_000)
