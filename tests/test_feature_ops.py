"""Unit tests for the round-3 feature-engineering / lookup operators:
range_lookup_join (broadcast point-in-range dim join), global_row_number
(distributed ROW_NUMBER without a global sort), woe_iv, smoothed target
encoding, and grouped Kendall pair counts — each against a small naive
reference.  The sf0.01 DuckDB oracles (price_band_orders,
global_doc_rank, quantity_woe, lang_target_encoding,
user_value_kendall) cover the composed queries; these pin the operator
semantics on adversarial shapes (gaps between bands, out-of-range
probes, all-tied groups, single-outcome buckets)."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(obj):
    import ray
    if isinstance(obj, pd.DataFrame):
        return ray.data.from_pandas(obj)
    return ray.data.from_arrow(obj)


@pytest.mark.usefixtures("ray_session")
class TestRangeLookupJoin:
    def _dim(self):
        return pd.DataFrame({"lo": [0, 10, 50], "hi": [10, 20, 60],
                             "band": ["a", "b", "c"]})

    def test_basic_and_gap_and_outside(self):
        from pdf_extract_ray.ops.relational import range_lookup_join
        fact = pa.table({"v": pa.array([0, 9, 10, 19, 20, 49, 50, 59,
                                        60, -1], pa.int64())})
        out = range_lookup_join(_ds(fact), self._dim(), value_col="v",
                                lo_col="lo", hi_col="hi",
                                label_col="band").to_pandas()
        got = dict(zip(out["v"], out["band"]))
        # 20..49 is a gap, 60 and -1 are outside every band
        assert got == {0: "a", 9: "a", 10: "b", 19: "b",
                       50: "c", 59: "c"}

    def test_overlapping_dim_rejected(self):
        from pdf_extract_ray.ops.relational import range_lookup_join
        dim = pd.DataFrame({"lo": [0, 5], "hi": [10, 15],
                            "band": ["a", "b"]})
        fact = pa.table({"v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            range_lookup_join(_ds(fact), dim, value_col="v",
                              lo_col="lo", hi_col="hi", label_col="band")

    def test_empty_fact_and_empty_dim(self):
        from pdf_extract_ray.ops.relational import range_lookup_join
        empty_fact = pa.table({"v": pa.array([], pa.int64())})
        out = range_lookup_join(_ds(empty_fact), self._dim(),
                                value_col="v", lo_col="lo", hi_col="hi",
                                label_col="band").to_pandas()
        assert len(out) == 0
        fact = pa.table({"v": pa.array([1, 2], pa.int64())})
        empty_dim = pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                  "hi": pd.Series([], dtype=np.int64),
                                  "band": pd.Series([], dtype=object)})
        out = range_lookup_join(_ds(fact), empty_dim, value_col="v",
                                lo_col="lo", hi_col="hi",
                                label_col="band").to_pandas()
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestGlobalRowNumber:
    def test_matches_sorted_rank(self):
        from pdf_extract_ray.ops.analytics import global_row_number
        rng = np.random.RandomState(7)
        key = rng.randint(0, 5, 200).astype(np.int64)  # heavy ties
        ids = rng.permutation(200).astype(np.int64)
        ds = _ds(pd.DataFrame({"k": key, "i": ids}))
        out = global_row_number(ds, "k", "i").to_pandas() \
            .sort_values("global_rank")
        ref = pd.DataFrame({"k": key, "i": ids}) \
            .sort_values(["k", "i"]).reset_index(drop=True)
        assert out["i"].to_numpy().tolist() == ref["i"].tolist()
        assert out["global_rank"].to_numpy().tolist() == \
            list(range(1, 201))

    def test_empty(self):
        from pdf_extract_ray.ops.analytics import global_row_number
        ds = _ds(pa.table({"k": pa.array([], pa.int64()),
                           "i": pa.array([], pa.int64())}))
        assert len(global_row_number(ds, "k", "i").to_pandas()) == 0


@pytest.mark.usefixtures("ray_session")
class TestWoeIv:
    def test_known_answer_and_single_outcome_dropped(self):
        from pdf_extract_ray.ops.analytics import woe_iv
        # bucket 1: 2 bad / 1 good; bucket 2: 1 bad / 3 good;
        # bucket 3: only good -> dropped
        b = [1, 1, 1, 2, 2, 2, 2, 3, 3]
        f = [1, 1, 0, 1, 0, 0, 0, 0, 0]
        ds = _ds(pa.table({"bkt": pa.array(b, pa.int64()),
                           "flag": pa.array([bool(x) for x in f])}))
        out = woe_iv(ds, "bkt", "flag")
        out = out.sort_values("bkt").reset_index(drop=True)
        assert out["bkt"].tolist() == [1, 2]
        B, G = 3, 6
        w1 = math.log((2 / B) / (1 / G))
        w2 = math.log((1 / B) / (3 / G))
        assert out["woe_ppm"].tolist() == [
            math.floor(w1 * 1e6), math.floor(w2 * 1e6)]
        assert out["iv_ppb"].tolist() == [
            math.floor((2 / B - 1 / G) * w1 * 1e9),
            math.floor((1 / B - 3 / G) * w2 * 1e9)]

    def test_empty(self):
        from pdf_extract_ray.ops.analytics import woe_iv
        ds = _ds(pa.table({"bkt": pa.array([], pa.int64()),
                           "flag": pa.array([], pa.bool_())}))
        assert len(woe_iv(ds, "bkt", "flag")) == 0


@pytest.mark.usefixtures("ray_session")
class TestSmoothedTargetMean:
    def test_known_answer(self):
        from pdf_extract_ray.ops.analytics import smoothed_target_mean
        ds = _ds(pa.table({"c": pa.array(["a", "a", "b"], pa.string()),
                           "t": pa.array([10, 20, 100], pa.int64())}))
        out = smoothed_target_mean(ds, "c", "t", m=2, scale=1000) \
            .sort_values("c").reset_index(drop=True)
        prior = 130.0 / 3.0
        enc_a = math.floor((30.0 + 2.0 * prior) / 4.0 * 1000)
        enc_b = math.floor((100.0 + 2.0 * prior) / 3.0 * 1000)
        assert out["enc_milli"].tolist() == [enc_a, enc_b]
        assert out["n_rows"].tolist() == [2, 1]


@pytest.mark.usefixtures("ray_session")
class TestGroupedKendall:
    @staticmethod
    def _naive(df):
        rows = []
        for g, grp in df.groupby("g"):
            x = grp["x"].to_numpy()
            y = grp["y"].to_numpy()
            nc = nd = tx = ty = tb = np_ = 0
            for i in range(len(x)):
                for j in range(i + 1, len(x)):
                    dx = np.sign(x[j] - x[i])
                    dy = np.sign(y[j] - y[i])
                    np_ += 1
                    if dx * dy > 0:
                        nc += 1
                    elif dx * dy < 0:
                        nd += 1
                    elif dx == 0 and dy == 0:
                        tb += 1
                    elif dx == 0:
                        tx += 1
                    else:
                        ty += 1
            if np_:
                rows.append((g, np_, nc, nd, tx, ty, tb))
        return sorted(rows)

    def test_matches_naive_with_ties(self):
        from pdf_extract_ray.ops.analytics import grouped_kendall
        rng = np.random.RandomState(11)
        df = pd.DataFrame({
            "g": rng.randint(0, 8, 300).astype(np.int64),
            "x": rng.randint(0, 10, 300).astype(np.int64),  # tie-heavy
            "y": rng.randint(0, 6, 300).astype(np.int64)})
        out = grouped_kendall(_ds(df), "g", "x", "y").to_pandas()
        got = sorted(zip(out["g"], out["n_pairs"], out["n_concordant"],
                         out["n_discordant"], out["n_tie_x"],
                         out["n_tie_y"], out["n_tie_both"]))
        assert [tuple(int(v) for v in r) for r in got] == \
            [tuple(int(v) for v in r) for r in self._naive(df)]

    def test_single_row_groups_absent(self):
        from pdf_extract_ray.ops.analytics import grouped_kendall
        df = pd.DataFrame({"g": np.array([1, 2, 2], np.int64),
                           "x": np.array([5, 1, 2], np.int64),
                           "y": np.array([5, 1, 2], np.int64)})
        out = grouped_kendall(_ds(df), "g", "x", "y").to_pandas()
        assert out["g"].tolist() == [2]
        assert out["n_concordant"].tolist() == [1]
