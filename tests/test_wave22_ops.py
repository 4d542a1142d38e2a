"""Wave-22 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave22_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
class TestQuotaAllocation:
    def _run(self, counts):
        m = _entry("qa")
        rows = []
        for src, n in counts.items():
            rows += [src] * n
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({"doc_id": np.arange(len(rows)),
                          "source": rows}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            return m.queries()["quota_allocation"](td) \
                .set_index("source")

    def test_exact_thirds_largest_remainder(self):
        # 3 sources with counts 1,1,1: base 333 each, leftover 1 goes
        # to the tied-largest remainder with smallest source name
        out = self._run({"a": 1, "b": 1, "c": 1})
        assert out["base_slots"].tolist() == [333, 333, 333]
        assert out.loc["a", "slots"] == 334
        assert int(out["slots"].sum()) == 1000

    def test_proportionality(self):
        out = self._run({"x": 3, "y": 1})
        assert out.loc["x", "slots"] == 750
        assert out.loc["y", "slots"] == 250

    def test_remainder_order(self):
        # counts 2,1,1 over N=4: bases 500,250,250 rem 0 -> no bonus
        out = self._run({"p": 2, "q": 1, "r": 1})
        assert out["slots"].tolist() == [500, 250, 250]
        # counts 5,1,1 over N=7: 1000*5/7=714 r2, 1000/7=142 r6,142 r6
        out = self._run({"p": 5, "q": 1, "r": 1})
        assert out.loc["p", "base_slots"] == 714
        # leftover = 1000-714-142-142 = 2 -> the two biggest
        # remainders are q and r (6/7 each) -> both get +1
        assert out["slots"].tolist() == [714, 143, 143]


@pytest.mark.usefixtures("ray_session")
class TestTradeDistance:
    def test_sf0001_invariants(self):
        m = _entry("td")
        out = m.queries()["trade_distance"]("/root/testdata/sf0.001")
        # source nation has distance 0; everything else positive or -1
        src = out.sort_values("nation").iloc[0]["nation"]
        d = dict(zip(out["nation"], out["dist_cost"]))
        assert d[min(d)] == 0
        assert all(v == -1 or v >= 0 for v in d.values())
        # deterministic across runs
        out2 = m.queries()["trade_distance"]("/root/testdata/sf0.001")
        assert dict(zip(out2["nation"], out2["dist_cost"])) == d

    def test_triangle_inequality_after_relaxation(self):
        # with 6 rounds on a <=25-node graph every settled distance
        # must satisfy d[v] <= d[u] + w(u,v) being impossible to
        # improve by one more round ONLY if diameter <= 6; just check
        # monotonicity: rerunning relaxation inside the op converged
        # for the sf graph (all reachable nodes settled)
        m = _entry("td2")
        out = m.queries()["trade_distance"]("/root/testdata/sf0.001")
        assert (out["dist_cost"] >= -1).all()
        assert len(out) >= 2


@pytest.mark.usefixtures("ray_session")
class TestHierarchyShare:
    def test_hand_computed(self):
        m = _entry("hs")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({"r_regionkey": [0, 1],
                          "r_name": ["AMERICA", "ASIA"]}) \
                .to_parquet(os.path.join(td, "region.parquet"))
            pd.DataFrame({"n_nationkey": [0, 1, 2],
                          "n_name": ["BRAZIL", "CANADA", "JAPAN"],
                          "n_regionkey": [0, 0, 1]}) \
                .to_parquet(os.path.join(td, "nation.parquet"))
            pd.DataFrame({"c_custkey": [10, 20, 30],
                          "c_nationkey": [0, 1, 2]}) \
                .to_parquet(os.path.join(td, "customer.parquet"))
            pd.DataFrame({"o_custkey": [10, 10, 20, 30],
                          "o_totalprice": [1.00, 2.00, 3.00, 4.00]}) \
                .to_parquet(os.path.join(td, "orders.parquet"))
            out = m.queries()["hierarchy_share"](td) \
                .set_index("nation")
        # AMERICA: BRAZIL 300c, CANADA 300c (region 600c);
        # ASIA: JAPAN 400c; total 1000c
        b = out.loc["BRAZIL"]
        assert int(b["revenue_cents"]) == 300
        assert int(b["nation_in_region_ppm"]) == 500_000
        assert int(b["region_share_ppm"]) == 600_000
        j = out.loc["JAPAN"]
        assert int(j["nation_in_region_ppm"]) == 1_000_000
        assert int(j["region_share_ppm"]) == 400_000

    def test_shares_sum_to_one_per_region(self):
        m = _entry("hs2")
        out = m.queries()["hierarchy_share"]("/root/testdata/sf0.001")
        # within each region the nation shares sum to <= 1e6 (floor
        # division loses at most |nations| ppm)
        for _, g in out.groupby("region"):
            assert 1_000_000 - len(g) <= int(
                g["nation_in_region_ppm"].sum()) <= 1_000_000
        regs = out.drop_duplicates("region")
        assert 1_000_000 - len(regs) <= int(
            regs["region_share_ppm"].sum()) <= 1_000_000
