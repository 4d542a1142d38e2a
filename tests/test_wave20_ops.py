"""Wave-20 op kernels: hand-computed expectations independent of the
DuckDB oracle (which tests Ray==SQL, not Ray==math)."""
import hashlib
import math
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _ds(df):
    import ray
    return ray.data.from_pandas(df)


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave20_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


H = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
class TestNbLangConfusion:
    def test_separable_corpus(self):
        from pdf_extract_ray.ops.classifier import nb_lang_confusion
        df = pd.DataFrame({
            "lang": ["a", "b"],
            "text": ["x x", "y"],
        })
        out = nb_lang_confusion(_ds(df)).sort_values(
            ["true_lang", "pred_lang"]).reset_index(drop=True)
        # doc 1: score_a = ln.5 + 2 ln(3/4) > score_b = ln.5 + 2 ln(1/3)
        # doc 2: score_b = ln.5 + ln(2/3) > score_a = ln.5 + ln(1/4)
        assert out.values.tolist() == [["a", "a", 1], ["b", "b", 1]]

    def test_tie_breaks_to_smallest_lang(self):
        from pdf_extract_ray.ops.classifier import nb_lang_confusion
        # identical class-conditional stats -> identical scores -> 'a'
        df = pd.DataFrame({"lang": ["b", "a"], "text": ["x", "x"]})
        out = nb_lang_confusion(_ds(df)).sort_values(
            ["true_lang", "pred_lang"]).reset_index(drop=True)
        assert out.values.tolist() == [["a", "a", 1], ["b", "a", 1]]

    def test_null_text_and_lang_fold(self):
        from pdf_extract_ray.ops.classifier import nb_lang_confusion
        df = pd.DataFrame({"lang": [None, "en"],
                           "text": [None, "w w w"]})
        out = nb_lang_confusion(_ds(df))
        # total, one prediction per doc
        assert int(out["n_docs"].sum()) == 2
        assert set(out["true_lang"]) == {"und", "en"}


@pytest.mark.usefixtures("ray_session")
class TestEventTypeStationary:
    def _events(self, types):
        n = len(types)
        return pd.DataFrame({
            "user_id": [1] * n,
            "event_id": list(range(n)),
            "ts": pd.to_datetime([i * H for i in range(n)], unit="us"),
            "event_type": types,
        })

    def test_two_cycle_even_iterations(self):
        from pdf_extract_ray.ops.events import event_type_stationary
        # A->B->A: matrix swaps all mass each round; 8 (even) rounds
        # return everything to A
        out = event_type_stationary(_ds(self._events(["A", "B", "A"])))
        got = dict(zip(out["event_type"], out["v_ppm"]))
        assert got == {"A": 1_000_000, "B": 0}

    def test_absorbing_dangling_state(self):
        from pdf_extract_ray.ops.events import event_type_stationary
        # A->B only: B gets a self-loop, absorbs all mass after round 1
        out = event_type_stationary(_ds(self._events(["A", "B"])))
        got = dict(zip(out["event_type"], out["v_ppm"]))
        assert got == {"A": 0, "B": 1_000_000}

    def test_floor_leak_split(self):
        from pdf_extract_ray.ops.events import event_type_stationary
        # A splits 1:2 between B and C (then both absorb):
        # v(B) = 1e6*1//3, v(C) = 1e6*2//3 — per-term floors
        out = event_type_stationary(
            _ds(self._events(["A", "B", "A", "C", "A", "C"])))
        got = dict(zip(out["event_type"], out["v_ppm"]))
        # transitions: A->B 1, B->A 1, A->C 2, C->A 1 (last C ends)
        # round structure is cyclic; just pin total-mass conservation
        # bound (floors only ever LOSE ppm) and determinism
        assert sum(got.values()) <= 1_000_000
        out2 = event_type_stationary(
            _ds(self._events(["A", "B", "A", "C", "A", "C"])))
        assert dict(zip(out2["event_type"], out2["v_ppm"])) == got


@pytest.mark.usefixtures("ray_session")
class TestAmsF2:
    def test_matches_reference_formula(self):
        from pdf_extract_ray.ops.sketch import ams_f2
        counts = {1: 3, 2: 5, 7: 2, 9: 1}
        rows = []
        for u, c in counts.items():
            rows += [u] * c
        df = pd.DataFrame({"user_id": rows})
        out = ams_f2(_ds(df), "user_id")
        exact = sum(c * c for c in counts.values())
        s = [0] * 16
        for u, c in counts.items():
            hx = hashlib.md5(str(u).encode()).hexdigest()
            for r in range(16):
                s[r] += c if hx[r] < "8" else -c
        est = sum(v * v for v in s) // 16
        r0 = out.iloc[0]
        assert int(r0["exact_f2"]) == exact
        assert int(r0["est_f2"]) == est
        assert int(r0["ratio_ppm"]) == (est * 1_000_000) // exact

    def test_single_key(self):
        from pdf_extract_ray.ops.sketch import ams_f2
        # one key: every estimator row is (+-c)^2 = c^2 -> est == exact
        df = pd.DataFrame({"user_id": [4] * 7})
        out = ams_f2(_ds(df), "user_id")
        assert int(out.iloc[0]["exact_f2"]) == 49
        assert int(out.iloc[0]["est_f2"]) == 49
        assert int(out.iloc[0]["ratio_ppm"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestZonemapPrune:
    def test_clustered_vs_unclustered(self):
        m = _entry("zm")
        with tempfile.TemporaryDirectory() as td:
            # 128 docs = 2 pages; n_chars 150 everywhere (inside the
            # n_chars predicate), doc_ids 0..127 (outside the doc_id
            # predicate 1000..2000)
            pd.DataFrame({"doc_id": np.arange(128),
                          "n_chars": [150] * 128}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["zonemap_prune"](td) \
                .set_index("predicate")
            d = out.loc["doc_id_range"]
            assert (int(d["pages_total"]), int(d["pages_scanned"]),
                    int(d["rows_matched"])) == (2, 0, 0)
            assert int(d["prune_ppm"]) == 1_000_000
            c = out.loc["n_chars_range"]
            assert (int(c["pages_total"]), int(c["pages_scanned"]),
                    int(c["rows_matched"])) == (2, 2, 128)
            assert int(c["prune_ppm"]) == 0

    def test_partial_page_overlap(self):
        m = _entry("zm2")
        with tempfile.TemporaryDirectory() as td:
            # one page [990..1010]: overlaps doc_id range 1000..2000
            # but only 11 rows match
            pd.DataFrame({"doc_id": np.arange(990, 1011),
                          "n_chars": [10] * 21}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["zonemap_prune"](td) \
                .set_index("predicate")
            d = out.loc["doc_id_range"]
            # doc_ids 990..1010 span pages 15 (960-1023); 1 page total
            assert int(d["pages_total"]) == 1
            assert int(d["pages_scanned"]) == 1
            assert int(d["rows_matched"]) == 11


@pytest.mark.usefixtures("ray_session")
class TestJackknifeMean:
    def test_constant_column_zero_se(self):
        m = _entry("jk")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({"doc_id": np.arange(32),
                          "n_chars": [250] * 32}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["jackknife_mean_chars"](td)
            r = out.iloc[0]
            assert int(r["n_rows"]) == 32
            assert int(r["mean_ppm"]) == 250_000_000
            assert int(r["jk_se_ppm"]) == 0

    def test_matches_reference_formula(self):
        m = _entry("jk2")
        rng = [17, 250, 33, 900, 5, 120, 77, 410]
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({"doc_id": np.arange(8), "n_chars": rng}) \
                .to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["jackknife_mean_chars"](td)
            N, S, M, G = 8, sum(rng), 1_000_000, 16
            folds = {g: (0, 0) for g in range(G)}
            for i, v in enumerate(rng):
                n, s = folds[i % 16]
                folds[i % 16] = (n + 1, s + v)
            mg = [((S - s) * M // (N - n)) if N - n > 0 else 0
                  for n, s in folds.values()]
            mbar = sum(mg) // G
            jv = ((G - 1) * sum((x - mbar) ** 2 for x in mg)) // G
            r = out.iloc[0]
            assert int(r["n_rows"]) == N
            assert int(r["mean_ppm"]) == S * M // N
            assert int(r["jk_se_ppm"]) == math.floor(math.sqrt(jv))
