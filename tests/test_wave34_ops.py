"""Wave-34 op kernels: hand-computed expectations independent of the
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
        f"entry_wave34_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000
DAY = 86_400_000_000


def _ev(rows):
    return pd.DataFrame({
        "event_id": range(len(rows)),
        "user_id": [u for u, _, _ in rows],
        "ts": pd.to_datetime([t for _, t, _ in rows], unit="us"),
        "event_type": [e for _, _, e in rows],
        "value": [0.0] * len(rows),
        "props": ["{}"] * len(rows),
    })


@pytest.mark.usefixtures("ray_session")
class TestMarkovEntropyRate:
    def test_deterministic_chain_zero_entropy(self):
        m = _entry("me")
        ev = _ev([(1, i * H, "ab"[i % 2]) for i in range(8)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["markov_entropy_rate"](td)
        r = out.iloc[0]
        assert int(r["n_transitions"]) == 7
        assert int(r["entropy_rate_ppm"]) == 0  # fully predictable

    def test_uniform_two_way_split(self):
        m = _entry("me2")
        # a -> b and a -> c equally; b,c always -> a
        seq = ["a", "b", "a", "c", "a", "b", "a", "c", "a"]
        ev = _ev([(1, i * H, t) for i, t in enumerate(seq)])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["markov_entropy_rate"](td)
        r = out.iloc[0]
        T = len(seq) - 1  # 8 transitions
        # src a has 4 transitions, 2 each to b and c:
        # each term floor(1e6 * (2/8) * ln(4/2)); b,c rows are
        # deterministic -> 0
        term = math.floor(1_000_000 * (2 / 8) * math.log(2))
        assert int(r["entropy_rate_ppm"]) == 2 * term
        assert int(r["n_states"]) == 3


@pytest.mark.usefixtures("ray_session")
class TestSimpsonFlipReport:
    def test_constructed_flip(self):
        m = _entry("sf")
        # within each source chars and tokens anti-correlate, but
        # pooled across sources they correlate positively
        docs = pd.DataFrame({
            "doc_id": range(4),
            "source": ["lo", "lo", "hi", "hi"],
            "n_chars": [10, 20, 110, 120],
            # tokens counted as spaces+1: craft token counts via text
            "text": ["w w w", "w w",          # lo: 3 then 2 (falls)
                     "w " * 12 + "w", "w " * 11 + "w"],  # hi: 13, 12
            "lang": ["en"] * 4,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["simpson_flip_report"](td) \
                .set_index("scope")
        assert int(out.loc["overall", "cov_sign"]) == 1
        assert int(out.loc["lo", "cov_sign"]) == -1
        assert int(out.loc["hi", "cov_sign"]) == -1
        assert int(out.loc["lo", "flips_overall"]) == 1
        assert int(out.loc["hi", "flips_overall"]) == 1
        assert int(out.loc["overall", "flips_overall"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestChurnTrainingSet:
    def test_labels_hand_computed(self):
        m = _entry("ch")
        # axis ends at day 20; user 1 last active day 2 (churned),
        # user 2 active day 20 (retained)
        ev = _ev([(1, 1 * DAY, "a"), (1, 2 * DAY, "a"),
                  (2, 0, "a"), (2, 20 * DAY, "a")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["churn_training_set"](td) \
                .set_index("user_id")
        assert int(out.loc[1, "churned"]) == 1
        assert int(out.loc[2, "churned"]) == 0
        assert int(out.loc[1, "n_events"]) == 2
        assert int(out.loc[2, "first_day"]) == 0
        assert int(out.loc[2, "last_day"]) == 20

    def test_boundary_exactly_14_days(self):
        m = _entry("ch2")
        ev = _ev([(1, 0, "a"), (2, 14 * DAY, "a")])
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["churn_training_set"](td) \
                .set_index("user_id")
        # gap exactly 14 -> churned by the >= rule
        assert int(out.loc[1, "churned"]) == 1
        assert int(out.loc[2, "churned"]) == 0
