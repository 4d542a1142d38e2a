"""Wave-38 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave38_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


MIN = 60_000_000


@pytest.mark.usefixtures("ray_session")
class TestGainsTable:
    def test_perfectly_ranked_positives(self):
        m = _entry("gt")
        # 20 docs; the 4 longest are the only positives -> the top
        # two deciles (2 docs each) capture all positives
        docs = pd.DataFrame({
            "doc_id": range(20),
            "n_chars": [1000 - i * 10 for i in range(20)],
            "lang": ["en" if i < 4 else "de" for i in range(20)],
            "source": ["s"] * 20, "text": ["x"] * 20,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["gains_table_chars"](td) \
                .set_index("decile")
        assert (out["n"] == 2).all()
        assert int(out.loc[1, "n_pos"]) == 2
        assert int(out.loc[2, "n_pos"]) == 2
        assert int(out.loc[2, "cum_pos_ppm"]) == 1_000_000
        assert int(out.loc[3, "n_pos"]) == 0
        assert int(out.loc[10, "cum_pos_ppm"]) == 1_000_000

    def test_remainder_distribution(self):
        m = _entry("gt2")
        # 23 docs: deciles sized 3,3,3,2,2,... (first N%10 get +1)
        docs = pd.DataFrame({
            "doc_id": range(23),
            "n_chars": range(23, 0, -1),
            "lang": ["de"] * 23,
            "source": ["s"] * 23, "text": ["x"] * 23,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["gains_table_chars"](td)
        assert out["n"].tolist() == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]


@pytest.mark.usefixtures("ray_session")
class TestKmvContainment:
    def test_subset_containment_estimates_full(self):
        m = _entry("kc")
        # type 'sub' users are a strict subset of 'sup' users;
        # under 64 distinct, KMV is exact -> containment 1e6
        rows = []
        for u in range(30):
            rows.append(("sup", u))
        for u in range(10):
            rows.append(("sub", u))
        ev = pd.DataFrame({
            "event_id": range(len(rows)),
            "user_id": [u for _, u in rows],
            "ts": pd.to_datetime([0] * len(rows), unit="us"),
            "event_type": [t for t, _ in rows],
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["kmv_containment"](td) \
                .set_index(["type_a", "type_b"])
        assert int(out.loc[("sub", "sup"),
                           "est_containment_ppm"]) == 1_000_000
        # sup in sub: 10/30
        assert int(out.loc[("sup", "sub"),
                           "est_containment_ppm"]) \
            == 10 * 1_000_000 // 30
        assert int(out.loc[("sub", "sup"), "est_a"]) == 10


@pytest.mark.usefixtures("ray_session")
class TestSessionEntryExit:
    def test_hand_computed(self):
        m = _entry("se")
        # user 1: session (a..b), gap, session (c); user 2: (d)
        rows = [(1, 0, "a"), (1, 10, "b"), (1, 80, "c"),
                (2, 0, "d")]
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
            out = m.queries()["session_entry_exit"](td)
        got = {(r["entry_type"], r["exit_type"]): int(r["n_sessions"])
               for _, r in out.iterrows()}
        assert got == {("a", "b"): 1, ("c", "c"): 1, ("d", "d"): 1}

    def test_single_event_sessions(self):
        m = _entry("se2")
        ev = pd.DataFrame({
            "event_id": [1],
            "user_id": [1],
            "ts": pd.to_datetime([0], unit="us"),
            "event_type": ["solo"],
            "value": [0.0], "props": ["{}"],
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["session_entry_exit"](td)
        assert out.iloc[0]["entry_type"] == "solo"
        assert out.iloc[0]["exit_type"] == "solo"
