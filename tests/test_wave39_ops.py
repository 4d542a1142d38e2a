"""Wave-39 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave39_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


MIN = 60_000_000


@pytest.mark.usefixtures("ray_session")
class TestConformalCoverage:
    def test_coverage_near_nominal_on_sf(self):
        m = _entry("cc")
        out = m.queries()["conformal_coverage"](
            "/root/testdata/sf0.001")
        assert len(out) > 0
        # tiny per-source calibration sets make the NOMINAL level
        # unreliable; pin structure, not statistics (the DuckDB
        # oracle pins exactness)
        assert (out["coverage_ppm"] <= 1_000_000).all()
        assert (out["n_inside"] <= out["n_train"]).all()
        assert (out["coverage_ppm"]
                == out["n_inside"] * 1_000_000
                // out["n_train"]).all()

    def test_constant_lengths_full_coverage(self):
        m = _entry("cc2")
        docs = pd.DataFrame({
            "doc_id": range(40),
            "source": ["s"] * 40,
            "n_chars": [100] * 40,
            "lang": ["en"] * 40, "text": ["x"] * 40,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["conformal_coverage"](td)
        assert int(out.iloc[0]["coverage_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestStableTopWords:
    def test_universal_word_is_stable(self):
        m = _entry("st")
        # 'common' appears in every doc; fold-specific words don't
        docs = pd.DataFrame({
            "doc_id": range(50),
            "text": [f"common uniq{i}" for i in range(50)],
            "lang": ["en"] * 50, "source": ["s"] * 50,
            "n_chars": [1] * 50,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["stable_top_words"](td)
        st = out[out["word"] == "common"]
        assert len(st) == 1
        assert int(st.iloc[0]["min_rank"]) == 1
        assert int(st.iloc[0]["max_rank"]) == 1
        # singleton words appear in exactly one fold -> only words
        # in ALL folds survive; each uniq word fails
        assert not out["word"].str.startswith("uniq").any() \
            or len(out) < 50


@pytest.mark.usefixtures("ray_session")
class TestSessionConversionByEntry:
    def test_hand_computed(self):
        m = _entry("sc")
        rows = [
            (1, 0, "view"), (1, 5, "purchase"),   # converts
            (1, 90, "view"), (1, 95, "click"),    # no purchase
            (2, 0, "click"), (2, 10, "purchase"),  # converts
        ]
        ev = pd.DataFrame({
            "event_id": range(len(rows)),
            "user_id": [u for u, _, _ in rows],
            "ts": pd.to_datetime([mm * MIN for _, mm, _ in rows],
                                 unit="us"),
            "event_type": [t for _, _, t in rows],
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["session_conversion_by_entry"](td) \
                .set_index("entry_type")
        assert int(out.loc["view", "n_sessions"]) == 2
        assert int(out.loc["view", "n_converted"]) == 1
        assert int(out.loc["view", "conversion_ppm"]) == 500_000
        assert int(out.loc["click", "conversion_ppm"]) == 1_000_000
