"""Wave-26 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave26_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


WEEK = 604_800_000_000


@pytest.mark.usefixtures("ray_session")
class TestContrastivePairs:
    def test_hand_computed_with_bucket_boundary(self):
        m = _entry("cp")
        # doc_ids straddle the 4096 bucket boundary: the (4000, 5000)
        # pair must still appear exactly once (ghost machinery)
        docs = pd.DataFrame({
            "doc_id": [1, 2, 4000, 5000],
            "source": ["s1", "s1", "s1", "s2"],
            "lang": ["en"] * 4, "text": ["x"] * 4,
            "n_chars": [1] * 4,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["contrastive_pairs"](td).to_pandas() \
                .sort_values("id_a").reset_index(drop=True)
        assert out[["id_a", "id_b"]].values.tolist() == [
            [1, 2], [2, 4000], [4000, 5000]]
        assert out["label"].tolist() == [1, 1, 0]

    def test_pair_count_is_n_minus_one(self):
        m = _entry("cp2")
        out = m.queries()["contrastive_pairs"](
            "/root/testdata/sf0.001").to_pandas()
        docs = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id"])
        assert len(out) == docs["doc_id"].nunique() - 1
        # no duplicate pairs
        assert not out.duplicated(["id_a", "id_b"]).any()


@pytest.mark.usefixtures("ray_session")
class TestEncodingAdvisor:
    def test_hand_computed_runs(self):
        m = _entry("ea")
        docs = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "lang": ["en", "en", "de", "en"],   # 3 runs
            "source": ["a", "a", "a", "a"],     # 1 run
            "text": ["x"] * 4, "n_chars": [1] * 4,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["encoding_advisor"](td) \
                .set_index("column_name")
        assert int(out.loc["lang", "n_runs"]) == 3
        assert int(out.loc["source", "n_runs"]) == 1
        assert int(out.loc["source", "rle_ratio_ppm"]) == 250_000

    def test_runs_cross_bucket_boundary(self):
        m = _entry("ea2")
        # same value across the 4096 boundary: still ONE run
        docs = pd.DataFrame({
            "doc_id": [4095, 4096],
            "lang": ["en", "en"], "source": ["a", "b"],
            "text": ["x"] * 2, "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["encoding_advisor"](td) \
                .set_index("column_name")
        assert int(out.loc["lang", "n_runs"]) == 1
        assert int(out.loc["source", "n_runs"]) == 2


@pytest.mark.usefixtures("ray_session")
class TestDecayScore:
    def test_hand_computed_halving(self):
        m = _entry("ds")
        # max ts anchors age 0; events at 0, 1 and 2 weeks back
        ev = pd.DataFrame({
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime(
                [2 * WEEK, 1 * WEEK, 0], unit="us"),
            "event_type": ["a"] * 3,
            "value": [0.0] * 3, "props": ["{}"] * 3,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["decay_score"](td).to_pandas() \
                .set_index("user_id")
        F = 1 << 20
        # user 1: ages 0w and 1w -> F + F/2; user 2: age 2w -> F/4
        assert int(out.loc[1, "decay_score"]) == F + F // 2
        assert int(out.loc[2, "decay_score"]) == F // 4

    def test_cap_at_20_weeks(self):
        m = _entry("ds2")
        ev = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime([0, 100 * WEEK], unit="us"),
            "event_type": ["a"] * 2,
            "value": [0.0] * 2, "props": ["{}"] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["decay_score"](td).to_pandas()
        # 100-week-old event contributes (1<<20)>>20 = 1
        assert int(out.iloc[0]["decay_score"]) == (1 << 20) + 1
