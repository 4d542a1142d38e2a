"""Wave-43 ops: hand-computed kernels independent of the DuckDB oracle
(event_order_audit is vacuous on the clean corpus by design — the SNM
is_dup=0 precedent — so the inversion kernel is pinned with PLANTED
out-of-order events here)."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave43_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _events(td, rows):
    pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                "event_type", "value"]) \
        .astype({"ts": "datetime64[us]"}) \
        .to_parquet(os.path.join(td, "events.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestEventOrderAudit:
    def test_planted_inversions(self):
        m = _entry("eoa")
        t0 = pd.Timestamp("2024-01-01")
        s = pd.Timedelta(seconds=1)
        rows = [
            # user 1: eids 5,3,9 in ts order -> one inversion (5->3)
            (5, 1, t0, "a", 1.0),
            (3, 1, t0 + s, "a", 1.0),
            (9, 1, t0 + 2 * s, "a", 1.0),
            # user 2: clean
            (1, 2, t0, "a", 1.0),
            (2, 2, t0 + s, "a", 1.0),
            # user 3: fully reversed eids -> 2 inversions
            (30, 3, t0, "a", 1.0),
            (20, 3, t0 + s, "a", 1.0),
            (10, 3, t0 + 2 * s, "a", 1.0),
        ]
        with tempfile.TemporaryDirectory() as td:
            _events(td, rows)
            out = m.queries()["event_order_audit"](td)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
        got = {int(r.user_id): (int(r.n_events), int(r.n_inversions))
               for r in out.itertuples()}
        assert got == {1: (3, 1), 3: (3, 2)}

    def test_tie_breaks_by_eid_are_not_inversions(self):
        m = _entry("eoa2")
        t0 = pd.Timestamp("2024-01-01")
        rows = [(7, 1, t0, "a", 1.0), (2, 1, t0, "a", 1.0)]
        with tempfile.TemporaryDirectory() as td:
            _events(td, rows)
            out = m.queries()["event_order_audit"](td)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
        # equal ts sorts by eid in BOTH engines -> (2,7) order, clean
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestInterarrivalBuckets:
    def test_hand_computed_log2_buckets(self):
        m = _entry("iab")
        t0 = pd.Timestamp("2024-01-01")
        rows = [
            (1, 1, t0, "a", 1.0),
            (2, 1, t0 + pd.Timedelta(seconds=1), "a", 1.0),   # gap 1 -> b1
            (3, 1, t0 + pd.Timedelta(seconds=8), "a", 1.0),   # gap 7 -> b3
            (4, 2, t0, "a", 1.0),
            (5, 2, t0 + pd.Timedelta(seconds=100), "a", 1.0),  # gap 100 -> b6
        ]
        with tempfile.TemporaryDirectory() as td:
            _events(td, rows)
            out = m.queries()["interarrival_buckets"](td) \
                .set_index("bucket")["n_gaps"].to_dict()
        assert out == {1: 1, 3: 1, 6: 1}


@pytest.mark.usefixtures("ray_session")
class TestDowHourHeatmap:
    def test_epoch_day_zero_is_thursday_mapped(self):
        m = _entry("dhh")
        rows = [(1, 1, pd.Timestamp("1970-01-01 05:00:00"), "a", 1.0)]
        with tempfile.TemporaryDirectory() as td:
            _events(td, rows)
            out = m.queries()["dow_hour_heatmap"](td)
        # 1970-01-01 was a Thursday: (0 + 3) % 7 = 3, hour 5
        assert out.values.tolist() == [[3, 5, 1]]


@pytest.mark.usefixtures("ray_session")
class TestIpfRaking:
    def test_margins_converge_to_uniform(self):
        m = _entry("ipf")
        out = m.queries()["ipf_raking"]("/root/testdata/sf0.001")
        total = out["n_docs"].sum() * 1_000_000
        ns = out["source"].nunique()
        nl = out["lang"].nunique()
        cells_per_col = out.groupby("lang").size().max()
        cells_per_row = out.groupby("source").size().max()
        # the LAST step scales columns: col margins hit their targets
        # exactly up to one integer-floor unit per cell
        col = out.groupby("lang")["raked_mass_ppm"].sum()
        assert (abs(col - total / nl) <= nl + cells_per_col).all()
        # row margins converge within 2% after 4 rounds
        row = out.groupby("source")["raked_mass_ppm"].sum()
        assert (abs(row - total / ns) <= total // 50).all()
        assert abs(out["raked_mass_ppm"].sum() - total) \
            <= total // 100


@pytest.mark.usefixtures("ray_session")
class TestAliasSamplingTable:
    def test_exact_mass_invariant(self):
        m = _entry("alias")
        out = m.queries()["alias_sampling_table"](
            "/root/testdata/sf0.001")
        UNIT = 1_000_000
        n = len(out)
        assert n == out["source"].nunique()
        # reconstruct each source's mass: own slot prob + (UNIT - prob)
        # from every slot that aliases to it
        mass = {s: 0 for s in out["source"]}
        for r in out.itertuples():
            mass[r.source] += r.prob_ppm
            if r.alias_source:
                mass[r.alias_source] += UNIT - r.prob_ppm
        # masses must sum to n * UNIT exactly and match the scaled
        # per-source doc shares within the remainder distribution
        assert sum(mass.values()) == n * UNIT
        import pandas as pd
        docs = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["source"])
        counts = docs["source"].fillna("").value_counts().sort_index()
        total = int(counts.sum())
        base = {s: (int(c) * n * UNIT) // total
                for s, c in counts.items()}
        rem = n * UNIT - sum(base.values())
        for i, s in enumerate(sorted(base)):
            want = base[s] + (1 if i < rem else 0)
            assert mass[s] == want, (s, mass[s], want)

    def test_deterministic(self):
        m = _entry("alias2")
        a = m.queries()["alias_sampling_table"]("/root/testdata/sf0.001")
        b = m.queries()["alias_sampling_table"]("/root/testdata/sf0.001")
        assert a.values.tolist() == b.values.tolist()
