"""Hand-computed / reference-parity tests for the round-3 wave-6
operators: HITS, GROUPS-frame peer-window sums, isotonic (PAVA)
calibration, and source JSD."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


def _ts(s):
    return np.datetime64(s, "us").item()


def _hits_numpy(edges, iters):
    """Local reference: L1-normalized HITS over (src, dst) pairs."""
    nodes = np.sort(np.unique(np.concatenate([edges[:, 0], edges[:, 1]])))
    n = len(nodes)
    si = np.searchsorted(nodes, edges[:, 0])
    di = np.searchsorted(nodes, edges[:, 1])
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = np.bincount(di, weights=h[si], minlength=n)
        a = a / a.sum() if a.sum() > 0 else np.full(n, 1.0 / n)
        h = np.bincount(si, weights=a[di], minlength=n)
        h = h / h.sum() if h.sum() > 0 else np.full(n, 1.0 / n)
    return nodes, h, a


@pytest.mark.usefixtures("ray_session")
class TestHits:
    def _edges(self):
        # small directed graph with a clear hub (1) and authority (4)
        return np.array([[1, 4], [2, 4], [3, 4], [1, 5], [1, 6],
                         [2, 5]], np.int64)

    def test_numpy_parity_bounded_finish(self):
        from pdf_extract_ray.ops.graph import hits
        e = self._edges()
        t = pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
        out = hits(_ds(t), iters=15).to_pandas().sort_values("node")
        nodes, h, a = _hits_numpy(e, 15)
        assert list(out["node"]) == list(nodes)
        assert np.allclose(out["hub"].to_numpy(), h, rtol=1e-12)
        assert np.allclose(out["authority"].to_numpy(), a, rtol=1e-12)
        # node 4 is the top authority, node 1 the top hub
        best_auth = out.loc[out["authority"].idxmax(), "node"]
        best_hub = out.loc[out["hub"].idxmax(), "node"]
        assert int(best_auth) == 4 and int(best_hub) == 1

    def test_loop_path_agrees_with_finish(self):
        from pdf_extract_ray.ops.graph import hits
        e = self._edges()
        t = pa.table({"src": pa.array(e[:, 0]), "dst": pa.array(e[:, 1])})
        fast = hits(_ds(t), iters=8).to_pandas().sort_values("node")
        slow = hits(_ds(t), iters=8, single_task_edges=0) \
            .to_pandas().sort_values("node")
        assert np.allclose(fast["hub"].to_numpy(), slow["hub"].to_numpy(),
                           rtol=1e-9)
        assert np.allclose(fast["authority"].to_numpy(),
                           slow["authority"].to_numpy(), rtol=1e-9)

    def test_empty_graph(self):
        from pdf_extract_ray.ops.graph import hits
        t = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        out = hits(_ds(t)).to_pandas()
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestPeerGroupSums:
    def test_hand_computed_tie_groups(self):
        from pdf_extract_ray.ops.events import peer_group_sums
        # user 7: ts groups [t1: e1+e2], [t2: e3], [t3: e4]; user 8: e5
        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 8], pa.int64()),
            "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-01"),
                            _ts("2024-01-02"), _ts("2024-01-03"),
                            _ts("2024-01-01")], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64())})
        out = peer_group_sums(_ds(t)).to_pandas()
        got = {int(r.event_id): int(r.frame_cents)
               for r in out.itertuples()}
        # group sums (cents): g1=300, g2=400, g3=800; user 8: 1600
        assert got == {1: 700, 2: 700, 3: 1500, 4: 1200, 5: 1600}

    def test_null_value_sums_as_zero(self):
        from pdf_extract_ray.ops.events import peer_group_sums
        t = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array([_ts("2024-01-01"), _ts("2024-01-02")],
                           pa.timestamp("us")),
            "value": pa.array([None, 3.0], pa.float64())})
        out = peer_group_sums(_ds(t)).to_pandas()
        got = {int(r.event_id): int(r.frame_cents)
               for r in out.itertuples()}
        assert got == {1: 300, 2: 300}


def _pava_reference(scores, labels):
    """Brute-force PAVA over raw rows: pool adjacent blocks while any
    mean decreases; returns list of (lo, hi, n, pos)."""
    df = pd.DataFrame({"s": scores, "y": labels}).groupby("s")["y"] \
        .agg(["size", "sum"]).reset_index()
    blocks = [[r["s"], r["s"], int(r["size"]), int(r["sum"])]
              for _, r in df.iterrows()]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            lo1, hi1, n1, p1 = blocks[i]
            lo2, hi2, n2, p2 = blocks[i + 1]
            if p1 * n2 > p2 * n1:
                blocks[i:i + 2] = [[lo1, hi2, n1 + n2, p1 + p2]]
                changed = True
                break
    return [tuple(b) for b in blocks]


@pytest.mark.usefixtures("ray_session")
class TestIsotonicCalibration:
    def test_brute_force_parity(self):
        from pdf_extract_ray.ops.classifier import isotonic_calibration
        rng = np.random.RandomState(7)
        scores = rng.randint(0, 20, 200)
        labels = (rng.rand(200) < (scores / 25.0 + 0.1))
        t = pa.table({"s": pa.array(scores.astype(np.int64)),
                      "y": pa.array(labels)})
        out = isotonic_calibration(_ds(t), "s", "y").to_pandas() \
            .sort_values("score_lo").reset_index(drop=True)
        ref = _pava_reference(scores, labels.astype(int))
        got = [(int(r.score_lo), int(r.score_hi), int(r.n), int(r.pos))
               for r in out.itertuples()]
        assert got == ref
        # fit is non-decreasing and mass-preserving
        rates = out["pos"] / out["n"]
        assert (rates.diff().dropna() >= 0).all()
        assert out["n"].sum() == 200 and out["pos"].sum() == labels.sum()
        assert (out["cal_ppm"] ==
                out["pos"] * 1_000_000 // out["n"]).all()

    def test_already_monotone_keeps_blocks(self):
        from pdf_extract_ray.ops.classifier import isotonic_calibration
        t = pa.table({"s": pa.array([1, 1, 2, 2], pa.int64()),
                      "y": pa.array([False, False, True, True])})
        out = isotonic_calibration(_ds(t), "s", "y").to_pandas()
        assert len(out) == 2
        assert list(out.sort_values("score_lo")["cal_ppm"]) == [0, 1000000]


@pytest.mark.usefixtures("ray_session")
class TestSourceJsd:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import source_jsd
        t = pa.table({
            "source": pa.array(["src0", "src1"], pa.string()),
            "text": pa.array(["a a b", "a b b"], pa.string())})
        out = source_jsd(_ds(t), "src0", "src1")
        assert len(out) == 1
        r = out.iloc[0]
        assert (int(r.n_a), int(r.n_b), int(r.vocab_n)) == (3, 3, 2)
        expect = 0.5 * ((2 / 3) * math.log((2 / 3) / 0.5)
                        + (1 / 3) * math.log((1 / 3) / 0.5)) \
            + 0.5 * ((1 / 3) * math.log((1 / 3) / 0.5)
                     + (2 / 3) * math.log((2 / 3) / 0.5))
        assert int(r.jsd_ppm) == math.floor(expect * 1_000_000)

    def test_identical_sources_zero(self):
        from pdf_extract_ray.ops.corpus import source_jsd
        t = pa.table({
            "source": pa.array(["src0", "src1"], pa.string()),
            "text": pa.array(["x y z", "x y z"], pa.string())})
        out = source_jsd(_ds(t), "src0", "src1")
        assert int(out.iloc[0].jsd_ppm) == 0

    def test_disjoint_sources_ln2(self):
        from pdf_extract_ray.ops.corpus import source_jsd
        t = pa.table({
            "source": pa.array(["src0", "src1"], pa.string()),
            "text": pa.array(["a a", "b b"], pa.string())})
        out = source_jsd(_ds(t), "src0", "src1")
        assert int(out.iloc[0].jsd_ppm) == math.floor(
            math.log(2) * 1_000_000)


@pytest.mark.usefixtures("ray_session")
class TestQuantileMap1d:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.analytics import quantile_map_1d
        # A = {1, 2, 3}; B = {10, 20, 30}: identity mapping by rank
        t = pa.table({
            "g": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
            "v": pa.array([1, 2, 3, 10, 20, 30], pa.int64())})
        out = quantile_map_1d(_ds(t), "g", "v", "a", "b").to_pandas() \
            .sort_values("value").reset_index(drop=True)
        assert list(out["value"]) == [1, 2, 3]
        assert list(out["mapped"]) == [10, 20, 30]

    def test_skewed_sizes(self):
        from pdf_extract_ray.ops.analytics import quantile_map_1d
        # A = {5}, B = {1, 2}: cumA(5)*nB = 1*2; first cumB*nA >= 2 is
        # value 2 (cumB(1)*1 = 1 < 2, cumB(2)*1 = 2)
        t = pa.table({
            "g": pa.array(["a", "b", "b"], pa.string()),
            "v": pa.array([5, 1, 2], pa.int64())})
        out = quantile_map_1d(_ds(t), "g", "v", "a", "b").to_pandas()
        assert list(out["mapped"]) == [2]

    def test_empty_side(self):
        from pdf_extract_ray.ops.analytics import quantile_map_1d
        t = pa.table({"g": pa.array(["a"], pa.string()),
                      "v": pa.array([1], pa.int64())})
        out = quantile_map_1d(_ds(t), "g", "v", "a", "b").to_pandas()
        assert len(out) == 0
