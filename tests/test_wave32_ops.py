"""Wave-32 op kernels: hand-computed expectations independent of the
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
        f"entry_wave32_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
class TestCurriculumOrder:
    def test_round_robin_interleave(self):
        m = _entry("cu")
        # two buckets: chars 0-15 -> bucket 0; 16-31 -> bucket 1
        docs = pd.DataFrame({
            "doc_id": [10, 20, 30, 40],
            "n_chars": [5, 20, 8, 25],
            "lang": ["en"] * 4, "source": ["s"] * 4,
            "text": ["x"] * 4,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["curriculum_order"](td).to_pandas() \
                .sort_values("epoch_pos").reset_index(drop=True)
        # bucket 0: docs 10, 30 (pos 0, 64); bucket 1: 20, 40 (1, 65)
        assert out["doc_id"].tolist() == [10, 20, 30, 40]
        assert out["epoch_pos"].tolist() == [0, 1, 64, 65]

    def test_positions_unique(self):
        m = _entry("cu2")
        out = m.queries()["curriculum_order"](
            "/root/testdata/sf0.001").to_pandas()
        assert not out["epoch_pos"].duplicated().any()
        docs = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id"])
        assert len(out) == len(docs)


@pytest.mark.usefixtures("ray_session")
class TestNegativeSamplingTable:
    def test_hand_computed(self):
        m = _entry("ns")
        docs = pd.DataFrame({
            "doc_id": [0],
            "text": ["b b b b a a c " + "d " * 9],
            "lang": ["en"], "source": ["s"], "n_chars": [1],
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["negative_sampling_table"](td) \
                .set_index("term")
        # tf: a=2 (w=1), b=4 (w=2), c=1 (w=1), d=9 (w=3)
        assert int(out.loc["b", "weight"]) == 2
        assert int(out.loc["d", "weight"]) == 3
        # cum in lexicographic order: a=1, b=3, c=4, d=7
        assert out["cum_weight"].tolist() == [1, 3, 4, 7]

    def test_weights_are_isqrt(self):
        m = _entry("ns2")
        out = m.queries()["negative_sampling_table"](
            "/root/testdata/sf0.001")
        for _, r in out.iterrows():
            assert int(r["weight"]) == math.isqrt(int(r["tf"]))
        assert out["cum_weight"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
class TestUserLast3Types:
    def test_newest_first_tail(self):
        m = _entry("l3")
        ev = pd.DataFrame({
            "event_id": range(5),
            "user_id": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime([0, H, 2 * H, 3 * H, 0], unit="us"),
            "event_type": ["a", "b", "c", "d", "z"],
            "value": [0.0] * 5, "props": ["{}"] * 5,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["user_last3_types"](td).to_pandas() \
                .set_index("user_id")
        assert out.loc[1, "last3"] == "d>c>b"
        assert int(out.loc[1, "n_events"]) == 4
        assert out.loc[2, "last3"] == "z"
        assert int(out.loc[2, "n_events"]) == 1

    def test_event_id_tiebreak(self):
        m = _entry("l32")
        # equal timestamps: larger event_id is "newer"
        ev = pd.DataFrame({
            "event_id": [5, 9],
            "user_id": [1, 1],
            "ts": pd.to_datetime([0, 0], unit="us"),
            "event_type": ["first", "second"],
            "value": [0.0] * 2, "props": ["{}"] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["user_last3_types"](td).to_pandas()
        assert out.iloc[0]["last3"] == "second>first"
