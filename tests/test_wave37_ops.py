"""Wave-37 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave37_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


MIN = 60_000_000


def _ev(rows):
    """rows: (user, minutes, type)."""
    return pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [u for u, _, _ in rows],
        "ts": pd.to_datetime([m * MIN for _, m, _ in rows],
                             unit="us"),
        "event_type": [t for _, _, t in rows],
        "value": [0.0] * len(rows),
        "props": ["{}"] * len(rows),
    })


@pytest.mark.usefixtures("ray_session")
class TestSessionTypeLift:
    def test_hand_computed(self):
        m = _entry("sl")
        # user 1: session A (a,b within 30min), then a 60-min gap,
        # session B (a only).  user 2: session C (b only).
        ev = _ev([(1, 0, "a"), (1, 10, "b"), (1, 80, "a"),
                  (2, 0, "b")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["session_type_lift"](td)
        assert len(out) == 1
        r = out.iloc[0]
        # 3 sessions; a in 2, b in 2, together in 1
        # lift = 3*1*1e6 // (2*2) = 750000
        assert (r["type_a"], r["type_b"]) == ("a", "b")
        assert int(r["n_ab"]) == 1
        assert int(r["lift_ppm"]) == 750_000

    def test_gap_exactly_30min_same_session(self):
        m = _entry("sl2")
        # 30-min gap is NOT > GAP -> same session
        ev = _ev([(1, 0, "a"), (1, 30, "b")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["session_type_lift"](td)
        assert int(out.iloc[0]["n_ab"]) == 1
        assert int(out.iloc[0]["lift_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestDecayEss:
    def test_uniform_weights_full_ess(self):
        m = _entry("ess")
        # every user one event at the SAME time -> equal weights ->
        # ESS == n_users exactly
        ev = _ev([(u, 0, "a") for u in range(5)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["decay_ess"](td)
        r = out.iloc[0]
        assert int(r["n_users"]) == 5
        assert int(r["ess_x100"]) == 500

    def test_skewed_weights_shrink_ess(self):
        m = _entry("ess2")
        # user 1 has 10 fresh events, user 2 has 1 -> ESS < 2
        ev = _ev([(1, 0, "a")] * 10 + [(2, 0, "a")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["decay_ess"](td)
        r = out.iloc[0]
        F = 1 << 20
        sw, sw2 = 11 * F, (10 * F) ** 2 + F ** 2
        assert int(r["ess_x100"]) == (sw * sw * 100) // sw2


@pytest.mark.usefixtures("ray_session")
class TestLosoMeanChars:
    def test_hand_computed(self):
        m = _entry("lo")
        docs = pd.DataFrame({
            "doc_id": range(4),
            "source": ["a", "a", "b", "b"],
            "n_chars": [10, 20, 100, 200],
            "lang": ["en"] * 4, "text": ["x"] * 4,
        })
        M = 1_000_000
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["loso_mean_chars"](td) \
                .set_index("source")
        overall = 330 * M // 4
        # without a: mean(100,200) = 150
        assert int(out.loc["a", "mean_wo_ppm"]) == 150 * M
        assert int(out.loc["a", "delta_ppm"]) == 150 * M - overall
        # without b: mean(10,20) = 15
        assert int(out.loc["b", "mean_wo_ppm"]) == 15 * M
