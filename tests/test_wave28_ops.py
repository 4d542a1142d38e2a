"""Wave-28 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave28_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
class TestLangKappa:
    def test_perfect_agreement(self):
        m = _entry("ka")
        # texts saturated with unambiguous stopwords -> lang_id
        # predicts correctly -> kappa 1.0
        docs = pd.DataFrame({
            "doc_id": [0, 1],
            "text": ["the of and to in is", "der die und das ist"],
            "lang": ["en", "de"],
            "source": ["s"] * 2, "n_chars": [10] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["lang_kappa"](td)
        r = out.iloc[0]
        assert int(r["n_docs"]) == 2 and int(r["n_agree"]) == 2
        assert int(r["po_ppm"]) == 1_000_000
        # pe = (1*1 + 1*1)/4 = 0.5 -> kappa = (1-.5)/(1-.5) = 1
        assert int(r["pe_ppm"]) == 500_000
        assert int(r["kappa_ppm"]) == 1_000_000

    def test_kappa_formula_reference(self):
        m = _entry("ka2")
        out = m.queries()["lang_kappa"]("/root/testdata/sf0.001")
        r = out.iloc[0]
        N, agree = int(r["n_docs"]), int(r["n_agree"])
        po, pe = int(r["po_ppm"]), int(r["pe_ppm"])
        assert po == agree * 1_000_000 // N
        assert -1_000_000 <= int(r["kappa_ppm"]) <= 1_000_000
        assert 0 <= pe <= 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestConsistentHashBalance:
    def test_matches_reference_ring_walk(self):
        m = _entry("ch")
        users = [3, 17, 99, 250, 1024]
        ev = pd.DataFrame({
            "event_id": range(len(users) * 2),
            "user_id": users * 2,  # dupes must not double-count
            "ts": pd.to_datetime([0] * len(users) * 2, unit="us"),
            "event_type": ["a"] * len(users) * 2,
            "value": [0.0] * len(users) * 2,
            "props": ["{}"] * len(users) * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["consistent_hash_balance"](td)
        ring = sorted(
            (int(hashlib.md5(f"shard{i}:v{j}".encode())
                 .hexdigest()[:15], 16), i)
            for i in range(8) for j in range(4))
        expect: dict = {}
        for u in users:
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            shard = next((s for p, s in ring if p >= h), ring[0][1])
            expect[shard] = expect.get(shard, 0) + 1
        got = dict(zip(out["shard"].astype(int),
                       out["n_users"].astype(int)))
        assert got == expect
        assert int(out["n_users"].sum()) == len(users)


@pytest.mark.usefixtures("ray_session")
class TestRrfFusion:
    def test_fusion_scores_and_ranks(self):
        m = _entry("rrf")
        out = m.queries()["rrf_fusion"]("/root/testdata/sf0.001")
        assert len(out) > 0
        # per query: ranks are 1..k contiguous, scores non-increasing
        for _, g in out.groupby("query_id"):
            g = g.sort_values("fused_rank")
            assert g["fused_rank"].tolist() == list(
                range(1, len(g) + 1))
            assert (np.diff(g["rrf_score"].to_numpy()) <= 0).all()
        # every score is a sum of 1e6//(60+r) terms with r in 1..20
        lo, hi = 1_000_000 // 80, 2 * (1_000_000 // 61)
        assert out["rrf_score"].between(lo, hi).all()

    def test_deterministic(self):
        m = _entry("rrf2")
        a = m.queries()["rrf_fusion"]("/root/testdata/sf0.001")
        b = m.queries()["rrf_fusion"]("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(a, b)
