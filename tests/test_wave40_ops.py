"""Wave-40 op kernels: hand-computed expectations independent of the
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
        f"entry_wave40_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


DAY = 86_400_000_000
H = 3_600_000_000


def _ev(rows):
    """rows: (user, us_timestamp)."""
    return pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [u for u, _ in rows],
        "ts": pd.to_datetime([t for _, t in rows], unit="us"),
        "event_type": ["a"] * len(rows),
        "value": [0.0] * len(rows),
        "props": ["{}"] * len(rows),
    })


@pytest.mark.usefixtures("ray_session")
class TestDauNewReturning:
    def test_hand_computed(self):
        m = _entry("nr")
        # user 1 active days 0,1; user 2 active days 1,1 (dup), 2
        ev = _ev([(1, 0), (1, DAY), (2, DAY), (2, DAY + 1),
                  (2, 2 * DAY)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["dau_new_returning"](td) \
                .set_index("day")
        assert int(out.loc[0, "n_new"]) == 1
        assert int(out.loc[0, "n_returning"]) == 0
        # day 1: user 1 returning, user 2 new
        assert int(out.loc[1, "n_new"]) == 1
        assert int(out.loc[1, "n_returning"]) == 1
        assert int(out.loc[2, "n_returning"]) == 1

    def test_totals_match_growth_curve(self):
        m = _entry("nr2")
        nr = m.queries()["dau_new_returning"](
            "/root/testdata/sf0.001").set_index("day")
        gc = m.queries()["user_growth_curve"](
            "/root/testdata/sf0.001").set_index("day")
        for d in gc.index:
            assert int(nr.loc[d, "n_new"]) == int(
                gc.loc[d, "new_users"])


@pytest.mark.usefixtures("ray_session")
class TestUserHourEntropy:
    def test_single_hour_zero_entropy(self):
        m = _entry("he")
        ev = _ev([(1, 5 * H), (1, 5 * H + 100), (1, 29 * H)])
        # hours: 5, 5, 5 (29h % 24 = 5) -> entropy 0
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["user_hour_entropy"](td).to_pandas()
        r = out.iloc[0]
        assert int(r["n_hours"]) == 1
        assert int(r["entropy_ppm"]) == 0

    def test_two_uniform_hours(self):
        m = _entry("he2")
        ev = _ev([(1, 0), (1, H)])  # hours 0 and 1, one each
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["user_hour_entropy"](td).to_pandas()
        r = out.iloc[0]
        # per-term floor of 1e6 * 0.5 ln 2, twice
        term = math.floor(1_000_000 * 0.5 * math.log(2))
        assert int(r["entropy_ppm"]) == 2 * term
        assert int(r["n_events"]) == 2
        assert int(r["n_hours"]) == 2
