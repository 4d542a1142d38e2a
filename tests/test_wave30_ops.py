"""Wave-30 op kernels: hand-computed expectations independent of the
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
        f"entry_wave30_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
class TestJoinSizeEstimate:
    def test_exact_join_size(self):
        m = _entry("js")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({"o_custkey": [1, 1, 1, 2, 9]}) \
                .to_parquet(os.path.join(td, "orders.parquet"))
            pd.DataFrame({"c_custkey": [1, 2, 2, 3]}) \
                .to_parquet(os.path.join(td, "customer.parquet"))
            out = m.queries()["join_size_estimate"](td)
        r = out.iloc[0]
        # key 1: 3*1; key 2: 1*2; key 9 has no customer -> 5
        assert int(r["exact_rows"]) == 5
        # est: only keys whose md5 first nibble is '0' contribute x16
        est = 0
        for k, p in ((1, 3), (2, 2)):
            if hashlib.md5(str(k).encode()).hexdigest()[0] == "0":
                est += p
        assert int(r["est_rows"]) == 16 * est

    def test_sf001_exact_matches_duckdb_shape(self):
        import duckdb
        m = _entry("js2")
        out = m.queries()["join_size_estimate"](
            "/root/testdata/sf0.001")
        truth = duckdb.sql(
            "SELECT count(*) FROM "
            "read_parquet('/root/testdata/sf0.001/orders.parquet') o "
            "JOIN "
            "read_parquet('/root/testdata/sf0.001/customer.parquet')"
            " c ON c.c_custkey = o.o_custkey").fetchone()[0]
        assert int(out.iloc[0]["exact_rows"]) == truth


@pytest.mark.usefixtures("ray_session")
class TestConformalCharsInterval:
    def test_matches_reference_formula(self):
        m = _entry("cf")
        rng = np.random.RandomState(3)
        docs = pd.DataFrame({
            "doc_id": np.arange(200),
            "source": ["s"] * 200,
            "n_chars": rng.randint(10, 500, 200),
            "lang": ["en"] * 200, "text": ["x"] * 200,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["conformal_chars_interval"](td)
        cal_mask = np.array([
            hashlib.md5(str(i).encode()).hexdigest()[0] < "4"
            for i in docs["doc_id"]])
        tr = docs[~cal_mask]
        ca = docs[cal_mask]
        M = 1_000_000
        mean = int(tr["n_chars"].sum()) * M // len(tr)
        resid = np.sort(np.abs(
            ca["n_chars"].to_numpy(np.int64) * M - mean))
        q = int(resid[(len(resid) - 1) * 90 // 100])
        r = out.iloc[0]
        assert int(r["n_train"]) == len(tr)
        assert int(r["n_cal"]) == len(ca)
        assert int(r["mean_ppm"]) == mean
        assert int(r["q90_resid_ppm"]) == q


@pytest.mark.usefixtures("ray_session")
class TestMarkovNextAccuracy:
    def test_deterministic_chain_perfect_accuracy(self):
        m = _entry("mk")
        # a->b->a->b...: the argmax predictor is always right
        n = 10
        ev = pd.DataFrame({
            "event_id": range(n),
            "user_id": [1] * n,
            "ts": pd.to_datetime([i * H for i in range(n)],
                                 unit="us"),
            "event_type": ["a", "b"] * (n // 2),
            "value": [0.0] * n, "props": ["{}"] * n,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["markov_next_accuracy"](td)
        r = out.iloc[0]
        assert int(r["n_transitions"]) == n - 1
        assert int(r["n_correct"]) == n - 1
        assert int(r["accuracy_ppm"]) == 1_000_000

    def test_majority_prediction(self):
        m = _entry("mk2")
        # a->b twice, a->c once: predictor says b after a;
        # transitions: a-b, b-a, a-b, b-a, a-c -> correct: the two
        # a->b hits; b->a is also argmax for b (only option) -> 4/5
        types = ["a", "b", "a", "b", "a", "c"]
        ev = pd.DataFrame({
            "event_id": range(6),
            "user_id": [1] * 6,
            "ts": pd.to_datetime([i * H for i in range(6)],
                                 unit="us"),
            "event_type": types,
            "value": [0.0] * 6, "props": ["{}"] * 6,
        })
        with tempfile.TemporaryDirectory() as td:
            ev.to_parquet(os.path.join(td, "events.parquet"))
            out = m.queries()["markov_next_accuracy"](td)
        r = out.iloc[0]
        assert int(r["n_transitions"]) == 5
        assert int(r["n_correct"]) == 4
        assert int(r["accuracy_ppm"]) == 800_000
