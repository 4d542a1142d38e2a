"""Wave-19 op kernels: hand-computed expectations independent of the
DuckDB oracle (which tests Ray==SQL, not Ray==math)."""
import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray
    return ray.data.from_pandas(df)


H = 3_600_000_000  # one hour in microseconds


@pytest.mark.usefixtures("ray_session")
class TestUserValueInterp:
    def test_single_segment_hand_computed(self):
        from pdf_extract_ray.ops.events import user_value_interp
        # user 1: value 1.0 at t=0, value 4.0 at t=3h
        df = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime([0, 3 * H], unit="us"),
            "value": [1.0, 4.0],
        })
        out = user_value_interp(_ds(df)).to_pandas().sort_values("hour") \
            .reset_index(drop=True)
        # grid points: h=0 (1000), h=1 (1000+3000*1/3=2000), h=2 (3000),
        # and the LAST event at t=3h lands exactly on-grid -> h=3 (4000)
        assert out["hour"].tolist() == [0, 1, 2, 3]
        assert out["value_milli"].tolist() == [1000, 2000, 3000, 4000]
        assert (out["user_id"] == 1).all()

    def test_truncating_division_negative_slope(self):
        from pdf_extract_ray.ops.events import user_value_interp
        # 10.0 at t=0 down to 0.0 at t=3h: slope -10000/3 milli per hr.
        # trunc(-10000*1/3) = -3333 (floor would give -3334).
        df = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [7, 7],
            "ts": pd.to_datetime([0, 3 * H], unit="us"),
            "value": [10.0, 0.0],
        })
        out = user_value_interp(_ds(df)).to_pandas().sort_values("hour") \
            .reset_index(drop=True)
        assert out["value_milli"].tolist() == [
            10000, 10000 - 3333, 10000 - 6666, 0]

    def test_dedupe_largest_event_id_wins(self):
        from pdf_extract_ray.ops.events import user_value_interp
        df = pd.DataFrame({
            "event_id": [5, 9, 1],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([0, 0, H], unit="us"),
            "value": [1.0, 2.0, 2.0],
        })
        out = user_value_interp(_ds(df)).to_pandas().sort_values("hour") \
            .reset_index(drop=True)
        # eid=9 wins at t=0 -> 2000 flat to h=1
        assert out["value_milli"].tolist() == [2000, 2000]

    def test_off_grid_last_event_emits_nothing_extra(self):
        from pdf_extract_ray.ops.events import user_value_interp
        df = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime([H // 2, H + H // 2], unit="us"),
            "value": [0.0, 2.0],
        })
        out = user_value_interp(_ds(df)).to_pandas()
        # only h=1 lies in [0.5h, 1.5h); value = 0 + 2000*0.5h/1h = 1000
        assert out["hour"].tolist() == [1]
        assert out["value_milli"].tolist() == [1000]

    def test_single_event_user(self):
        from pdf_extract_ray.ops.events import user_value_interp
        df = pd.DataFrame({
            "event_id": [1, 2],
            "user_id": [1, 2],
            "ts": pd.to_datetime([2 * H, H // 3], unit="us"),
            "value": [5.0, 9.0],
        })
        out = user_value_interp(_ds(df)).to_pandas()
        # user 1 on-grid -> one row; user 2 off-grid -> none
        assert out["user_id"].tolist() == [1]
        assert out["value_milli"].tolist() == [5000]


@pytest.mark.usefixtures("ray_session")
class TestZorderLayout:
    def test_interleave_hand_computed(self):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "entry_wave19", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            # doc_id=3 (y=3), n_chars=130 (x=2): z = interleave bits
            # x=0b0010, y=0b0011 -> z = y0 + 2*x0 + 4*y1 + 8*x1 + ...
            #   = 1 + 0 + 4 + 8 = 13
            pd.DataFrame({"doc_id": [3], "n_chars": [130]}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["zorder_layout"](td)
            assert out["z"].tolist() == [13]
            assert out["n_docs"].tolist() == [1]
            assert out["min_chars"].tolist() == [130]
            assert out["max_chars"].tolist() == [130]

    def test_x_saturates_at_15(self):
        import importlib.util
        import os
        import tempfile
        spec = importlib.util.spec_from_file_location(
            "entry_wave19b", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        with tempfile.TemporaryDirectory() as td:
            # n_chars huge -> x=15 (0b1111), doc_id=16 -> y=0
            # z = sum over bits of x at odd positions = 2+8+32+128 = 170
            pd.DataFrame({"doc_id": [16], "n_chars": [10 ** 6]}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["zorder_layout"](td)
            assert out["z"].tolist() == [170]


@pytest.mark.usefixtures("ray_session")
class TestBestSplitChars:
    def test_perfect_split_hand_computed(self):
        import importlib.util
        import os
        import tempfile
        spec = importlib.util.spec_from_file_location(
            "entry_wave19c", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        with tempfile.TemporaryDirectory() as td:
            # short docs en, long docs de: threshold 10 separates
            # perfectly -> gini 0
            pd.DataFrame({
                "doc_id": [1, 2, 3, 4],
                "lang": ["en", "en", "de", "de"],
                "n_chars": [5, 10, 20, 30],
            }).to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["best_split_chars"](td)
            assert len(out) == 1
            r = out.iloc[0]
            assert int(r["threshold"]) == 10
            assert int(r["n_left"]) == 2 and int(r["n_right"]) == 2
            assert int(r["gini_ppm"]) == 0

    def test_tie_breaks_to_smallest_threshold(self):
        import importlib.util
        import os
        import tempfile
        spec = importlib.util.spec_from_file_location(
            "entry_wave19d", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        with tempfile.TemporaryDirectory() as td:
            # all same lang: every split has gini 0 -> smallest v wins
            pd.DataFrame({
                "doc_id": [1, 2, 3],
                "lang": ["en", "en", "en"],
                "n_chars": [1, 2, 3],
            }).to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["best_split_chars"](td)
            assert int(out.iloc[0]["threshold"]) == 1
