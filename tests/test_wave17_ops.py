"""Wave-17 op kernels: hand-computed expectations independent of the
DuckDB oracle (which tests Ray==SQL, not Ray==math)."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray
    return ray.data.from_pandas(df)


@pytest.mark.usefixtures("ray_session")
class TestGroupedAnovaF:
    def test_two_group_hand_computed(self):
        from pdf_extract_ray.ops.analytics import grouped_anova_f
        # groups: a = [10, 20], b = [30, 50]  (n=4, k=2)
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [10, 20, 30, 50]})
        out = grouped_anova_f(_ds(df), "g", "v")
        assert len(out) == 1
        r = out.iloc[0]
        M = 1_000_000
        # B_a = (30^2*M)//2, B_b = (80^2*M)//2, T = (110^2*M)//4
        sb = (900 * M) // 2 + (6400 * M) // 2
        ssb = sb - (12100 * M) // 4
        ssw = (100 + 400 + 900 + 2500) * M - sb
        assert int(r["n_rows"]) == 4 and int(r["n_groups"]) == 2
        assert int(r["ssb_micro"]) == ssb
        assert int(r["ssw_micro"]) == ssw
        assert int(r["f_micro"]) == (ssb * 2 * M) // (ssw * 1)

    def test_zero_within_variance_guard(self):
        from pdf_extract_ray.ops.analytics import grouped_anova_f
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [5, 5, 9, 9]})
        out = grouped_anova_f(_ds(df), "g", "v")
        # SSW == 0 -> guarded F of 0, decomposition still reported
        assert int(out.iloc[0]["ssw_micro"]) == 0
        assert int(out.iloc[0]["f_micro"]) == 0

    def test_single_group(self):
        from pdf_extract_ray.ops.analytics import grouped_anova_f
        df = pd.DataFrame({"g": ["a"] * 3, "v": [1, 2, 3]})
        out = grouped_anova_f(_ds(df), "g", "v")
        assert int(out.iloc[0]["n_groups"]) == 1
        assert int(out.iloc[0]["f_micro"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestLabelCentroidCosine:
    def test_parallel_and_orthogonal(self):
        from pdf_extract_ray.ops.analytics import label_centroid_cosine
        import ray
        tbl = pa.table({
            "label": pa.array([0, 0, 1, 2], pa.int32()),
            "embedding": pa.array(
                [[1.0, 0.0], [3.0, 0.0], [2.0, 0.0], [0.0, 5.0]],
                pa.list_(pa.float32()))})
        out = label_centroid_cosine(ray.data.from_arrow(tbl))
        out = out.set_index(["label_a", "label_b"])
        # labels 0 and 1 are colinear -> cosine 1.0 exactly
        assert out.loc[(0, 1), "cosine"] == pytest.approx(1.0, abs=0)
        # label 2 is orthogonal to both
        assert out.loc[(0, 2), "dot"] == 0
        assert out.loc[(0, 2), "cosine"] == 0.0
        assert out.loc[(1, 2), "cosine"] == 0.0

    def test_quantization_floor(self):
        from pdf_extract_ray.ops.analytics import label_centroid_cosine
        import ray
        # floor(-0.0015 * 1000) = -2, floor(0.0015 * 1000) = 1
        tbl = pa.table({
            "label": pa.array([0, 1], pa.int32()),
            "embedding": pa.array([[-0.0015], [0.0015]],
                                  pa.list_(pa.float32()))})
        out = label_centroid_cosine(ray.data.from_arrow(tbl))
        assert int(out.iloc[0]["dot"]) == -2 * 1
        assert out.iloc[0]["cosine"] == pytest.approx(-1.0)


@pytest.mark.usefixtures("ray_session")
class TestUserDailyOhlc:
    def test_hand_computed_bars(self):
        from pdf_extract_ray.ops.events import user_daily_ohlc
        day = 86_400_000_000
        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 8],
            "ts": pd.to_datetime(
                [10 * day + 5, 10 * day + 1, 10 * day + 9,
                 11 * day + 2, 10 * day + 3], unit="us"),
            "value": [2.0, 1.0, 4.0, 9.0, 5.0]})
        out = user_daily_ohlc(_ds(df)).to_pandas() \
            .sort_values(["user_id", "day"]).reset_index(drop=True)
        assert len(out) == 3
        u7d10 = out.iloc[0]
        assert (int(u7d10["user_id"]), int(u7d10["day"])) == (7, 10)
        assert u7d10["open"] == 1.0 and u7d10["close"] == 4.0
        assert u7d10["high"] == 4.0 and u7d10["low"] == 1.0
        assert int(u7d10["n_events"]) == 3
        assert out.iloc[1]["open"] == 9.0 and out.iloc[1]["close"] == 9.0

    def test_tie_break_is_event_id(self):
        from pdf_extract_ray.ops.events import user_daily_ohlc
        df = pd.DataFrame({
            "event_id": [2, 1, 3],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([1000, 1000, 1000], unit="us"),
            "value": [20.0, 10.0, 30.0]})
        out = user_daily_ohlc(_ds(df)).to_pandas()
        assert out.iloc[0]["open"] == 10.0   # eid 1 wins the tie
        assert out.iloc[0]["close"] == 30.0  # eid 3


@pytest.mark.usefixtures("ray_session")
class TestFkOrphans:
    def test_planted_orphans(self):
        from pdf_extract_ray.ops.relational import fk_orphans
        child = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3]})
        parent = pd.DataFrame({"p": [1, 2, 9]})
        out = fk_orphans(_ds(child), "k", _ds(parent), "p", "c->p")
        r = out.iloc[0]
        assert r["relationship"] == "c->p"
        assert int(r["n_child_rows"]) == 6
        assert int(r["n_orphan_rows"]) == 3   # the three k=3 rows
        assert int(r["n_orphan_keys"]) == 1

    def test_clean_edge(self):
        from pdf_extract_ray.ops.relational import fk_orphans
        child = pd.DataFrame({"k": [1, 2]})
        parent = pd.DataFrame({"p": [1, 2, 3]})
        out = fk_orphans(_ds(child), "k", _ds(parent), "p", "x")
        assert int(out.iloc[0]["n_orphan_rows"]) == 0
        assert int(out.iloc[0]["n_orphan_keys"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestNationTheil:
    def test_even_and_concentrated(self):
        from pdf_extract_ray.ops.relational import nation_theil
        # nation 0: two equal customers -> T = 0
        # nation 1: spend 1 vs 999 -> T near ln(2) * (999/1000) side
        orders = pd.DataFrame({
            "o_custkey": [1, 2, 3, 4],
            "o_totalprice": [50.0, 50.0, 1.0, 999.0]})
        cust = pd.DataFrame({
            "c_custkey": [1, 2, 3, 4],
            "c_nationkey": np.array([0, 0, 1, 1], np.int32)})
        out = nation_theil(_ds(orders), _ds(cust)) \
            .sort_values("nation").reset_index(drop=True)
        assert int(out.iloc[0]["theil_ppm"]) == 0
        n1 = out.iloc[1]
        x, total = 999.0, 1000.0
        t999 = math.floor(1e6 * (x / total) * math.log(x / total * 2))
        t1 = math.floor(1e6 * (1.0 / total) * math.log(1.0 / total * 2))
        assert int(n1["theil_ppm"]) == max(t999 + t1, 0) // 2
        assert int(n1["total_x"]) == 1000


@pytest.mark.usefixtures("ray_session")
class TestUserSurvivalKm:
    def test_hand_computed_curve(self):
        from pdf_extract_ray.ops.events import user_survival_km
        day = 86_400_000_000
        # durations: u1=0d, u2=0d, u3=1d, u4=2d, u5=2d; all observed
        # (gmax is u5's last event; censor window 1us below everything)
        rows = []
        for uid, (start, dur) in enumerate(
                [(0, 0), (day, 0), (0, day), (0, 2 * day),
                 (day, 2 * day)], 1):
            rows.append((uid, start))
            rows.append((uid, start + dur))
        df = pd.DataFrame(rows, columns=["user_id", "ts_us"])
        df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
        out = user_survival_km(_ds(df[["user_id", "ts"]]), censor_us=0)
        assert list(out["day"]) == [0, 1, 2]
        assert list(out["n_risk"]) == [5, 3, 2]
        assert list(out["n_events"]) == [2, 1, 2]
        t0 = math.floor(1e6 * math.log(1.0 - 2.0 / 5.0))
        t1 = math.floor(1e6 * math.log(1.0 - 1.0 / 3.0))
        assert int(out.iloc[0]["log_surv_ppm"]) == t0
        assert int(out.iloc[1]["log_surv_ppm"]) == t0 + t1
        # saturated last step -> sentinel dominates
        assert int(out.iloc[2]["log_surv_ppm"]) < -10**14

    def test_censored_users_stay_at_risk(self):
        from pdf_extract_ray.ops.events import user_survival_km
        day = 86_400_000_000
        # cutoff = gmax - day/2 = 1.5 day.  u1 dies at day 1 (last event
        # at 1.0 day <= cutoff -> observed); u2 has duration 1 day but
        # its last event (1.75 day) is inside the censor window ->
        # censored; u3 defines gmax (2 day) -> censored at day 2
        df = pd.DataFrame({
            "user_id": [1, 1, 2, 2, 3, 3],
            "ts": pd.to_datetime(
                [0, day, 3 * day // 4, 7 * day // 4, 0, 2 * day],
                unit="us")})
        out = user_survival_km(_ds(df), censor_us=day // 2)
        assert len(out) == 1
        r = out.iloc[0]
        # at day 1 all three are still at risk, one observed death
        assert (int(r["day"]), int(r["n_risk"]),
                int(r["n_events"])) == (1, 3, 1)


@pytest.mark.usefixtures("ray_session")
class TestKmvGroupOverlap:
    def test_under_k_is_exact(self):
        from pdf_extract_ray.ops.sketch import kmv_group_overlap
        df = pd.DataFrame({
            "g": ["a"] * 4 + ["b"] * 3,
            "i": [1, 2, 3, 4, 3, 4, 5]})
        out = kmv_group_overlap(_ds(df), "g", "i")
        r = out.iloc[0]
        assert (int(r["est_a"]), int(r["est_b"])) == (4, 3)
        assert int(r["est_union"]) == 5
        assert int(r["est_intersection"]) == 2

    def test_disjoint_groups(self):
        from pdf_extract_ray.ops.sketch import kmv_group_overlap
        df = pd.DataFrame({"g": ["a", "a", "b"], "i": [1, 2, 99]})
        out = kmv_group_overlap(_ds(df), "g", "i")
        assert int(out.iloc[0]["est_intersection"]) == 0
