"""Hand-computed unit tests for the round-3 wave-5 operators: 1-D EMD,
SCD-2 intervals, activity coverage, and common-neighbor link prediction
(the sf0.01/sf0.001 DuckDB oracle covers the same operators at scale via
tools/check_oracle.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


def _ts(s):
    return np.datetime64(s, "us").item()


@pytest.mark.usefixtures("ray_session")
class TestEmd1d:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.analytics import emd_1d
        t = pa.table({
            "g": pa.array(["a", "a", "a", "b"], pa.string()),
            "v": pa.array([1, 1, 3, 2], pa.int64())})
        out = emd_1d(_ds(t), "g", "v", "a", "b").to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        # a = {1: 2/3, 3: 1/3}, b = {2: 1}; W1 = 2/3 * 1 + 1/3 * 1 = 1
        assert (int(r.n_a), int(r.n_b)) == (3, 1)
        assert int(r.emd_num) == 3 and int(r.emd_den) == 3

    def test_identical_distributions_zero(self):
        from pdf_extract_ray.ops.analytics import emd_1d
        t = pa.table({
            "g": pa.array(["a", "b", "a", "b"], pa.string()),
            "v": pa.array([5, 5, 9, 9], pa.int64())})
        out = emd_1d(_ds(t), "g", "v", "a", "b").to_pandas()
        assert int(out.iloc[0].emd_num) == 0

    def test_single_distinct_value(self):
        from pdf_extract_ray.ops.analytics import emd_1d
        t = pa.table({"g": pa.array(["a", "b"], pa.string()),
                      "v": pa.array([7, 7], pa.int64())})
        out = emd_1d(_ds(t), "g", "v", "a", "b").to_pandas()
        r = out.iloc[0]
        assert int(r.emd_num) == 0 and int(r.emd_den) == 1


@pytest.mark.usefixtures("ray_session")
class TestScd2Intervals:
    def test_islands_and_lead_close(self):
        from pdf_extract_ray.ops.events import scd2_intervals
        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
            "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                            _ts("2024-01-03"), _ts("2024-01-04"),
                            _ts("2024-01-01")], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "b", "a", "x"],
                                   pa.string())})
        out = scd2_intervals(_ds(t)).to_pandas() \
            .sort_values(["user_id", "valid_from"]).reset_index(drop=True)
        assert list(out["user_id"]) == [7, 7, 7, 8]
        assert list(out["event_type"]) == ["a", "b", "a", "x"]
        assert list(out["n_events"]) == [2, 1, 1, 1]
        us = lambda s: int(np.datetime64(s, "us").astype(np.int64))
        assert list(out["valid_to_us"]) == [
            us("2024-01-03"), us("2024-01-04"), -1, -1]

    def test_null_type_runs_form_islands(self):
        from pdf_extract_ray.ops.events import scd2_intervals
        t = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                            _ts("2024-01-03")], pa.timestamp("us")),
            "event_type": pa.array(["a", None, None], pa.string())})
        out = scd2_intervals(_ds(t)).to_pandas()
        assert len(out) == 2  # 'a' island + one NULL island of size 2
        assert list(out.sort_values("valid_from")["n_events"]) == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestUserActiveTime:
    def test_telescoping_clamp(self):
        from pdf_extract_ray.ops.events import user_active_time
        base = np.datetime64("2024-01-01T00:00:00", "us")
        secs = [0, 100, 1000]
        t = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array([(base + np.timedelta64(s, "s")).item()
                            for s in secs], pa.timestamp("us"))})
        out = user_active_time(_ds(t), window_s=300).to_pandas()
        assert len(out) == 1
        # min(100, 300) + min(900, 300) + 300 = 700 s
        assert int(out.iloc[0].active_us) == 700 * 1_000_000
        assert int(out.iloc[0].n_events) == 3


@pytest.mark.usefixtures("ray_session")
class TestCommonNeighborPairs:
    def _graph(self):
        # edges: 1-2, 1-3, 2-3, 2-4 (undirected, given once each)
        return pa.table({"src": pa.array([1, 1, 2, 2], pa.int64()),
                         "dst": pa.array([2, 3, 3, 4], pa.int64())})

    def test_hand_computed_jaccard(self):
        from pdf_extract_ray.ops.graph import common_neighbor_pairs
        out = common_neighbor_pairs(_ds(self._graph()), min_common=1) \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        got = {(int(r.a), int(r.b)): (int(r.common), int(r.jaccard_ppm))
               for r in out.itertuples()}
        # degrees: 1->2, 2->3, 3->2, 4->1
        assert got == {(1, 2): (1, 250000), (1, 3): (1, 333333),
                       (1, 4): (1, 500000), (2, 3): (1, 250000),
                       (3, 4): (1, 500000)}

    def test_min_common_filters(self):
        from pdf_extract_ray.ops.graph import common_neighbor_pairs
        out = common_neighbor_pairs(_ds(self._graph()), min_common=2) \
            .to_pandas()
        assert len(out) == 0

    def test_parallel_edges_and_self_loops_ignored(self):
        from pdf_extract_ray.ops.graph import common_neighbor_pairs
        t = pa.table({"src": pa.array([1, 2, 1, 1, 3, 3], pa.int64()),
                      "dst": pa.array([2, 1, 1, 3, 3, 2], pa.int64())})
        # simple graph: 1-2, 1-3, 2-3 (triangle)
        out = common_neighbor_pairs(_ds(t), min_common=1).to_pandas()
        got = {(int(r.a), int(r.b)): (int(r.common), int(r.jaccard_ppm))
               for r in out.itertuples()}
        # each pair shares exactly the third vertex; jaccard = 1/3
        assert got == {(1, 2): (1, 333333), (1, 3): (1, 333333),
                       (2, 3): (1, 333333)}
