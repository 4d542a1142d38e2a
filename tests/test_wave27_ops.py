"""Wave-27 op kernels: hand-computed expectations independent of the
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
        f"entry_wave27_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
class TestFeatureHashingStats:
    def test_hand_computed(self):
        m = _entry("fh")
        docs = pd.DataFrame({
            "doc_id": [0, 1],
            "text": ["apple apple pear", "apple fig"],
            "lang": ["en"] * 2, "source": ["s"] * 2,
            "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["feature_hashing_stats"](td)
        def bk(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8],
                       16) % 256
        expect = {}
        for term, tf in (("apple", 3), ("pear", 1), ("fig", 1)):
            b = bk(term)
            t, f = expect.get(b, (0, 0))
            expect[b] = (t + 1, f + tf)
        got = {int(r["bucket"]): (int(r["n_terms"]),
                                  int(r["total_tf"]))
               for _, r in out.iterrows()}
        assert got == expect
        assert int(out["total_tf"].sum()) == 5


@pytest.mark.usefixtures("ray_session")
class TestSnmDupCandidates:
    def test_window_pairs_and_dup_flag(self):
        m = _entry("snm")
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "n_chars": [5, 5, 9],
            "text": ["same!", "same!", "different"],
            "lang": ["en"] * 3, "source": ["s"] * 3,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["snm_dup_candidates"](td).to_pandas() \
                .sort_values("id_a").reset_index(drop=True)
        # sorted by (n_chars, doc_id): 1, 2, 3
        assert out[["id_a", "id_b"]].values.tolist() == [[1, 2],
                                                         [2, 3]]
        assert out["is_dup"].tolist() == [1, 0]
        assert out["len_diff"].tolist() == [0, 4]

    def test_bucket_boundary_pair(self):
        m = _entry("snm2")
        # lengths 63 and 64 live in different 64-buckets; ghost rows
        # must still produce the adjacent pair exactly once
        docs = pd.DataFrame({
            "doc_id": [1, 2],
            "n_chars": [63, 64],
            "text": ["a", "b"],
            "lang": ["en"] * 2, "source": ["s"] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["snm_dup_candidates"](td).to_pandas()
        assert out[["id_a", "id_b"]].values.tolist() == [[1, 2]]


@pytest.mark.usefixtures("ray_session")
class TestLabelPropagationLangs:
    def test_majority_and_tiebreak(self):
        m = _entry("lp")
        prefix = "x" * 64
        docs = pd.DataFrame({
            "doc_id": range(5),
            "text": [prefix + "1", prefix + "2", prefix + "3",
                     "short", "short"],
            "lang": ["en", "en", "de", "fr", "es"],
            "source": ["s"] * 5, "n_chars": [65] * 3 + [5, 5],
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["label_propagation_langs"](td) \
                .to_pandas()
        big = out[out["n_docs"] == 3].iloc[0]
        assert big["majority_lang"] == "en"
        assert int(big["n_relabel"]) == 1
        # the two "short" docs tie 1-1 -> lexicographically smaller
        small = out[out["n_docs"] == 2].iloc[0]
        assert small["majority_lang"] == "es"
        assert int(small["n_relabel"]) == 1

    def test_singletons_excluded(self):
        m = _entry("lp2")
        docs = pd.DataFrame({
            "doc_id": [0], "text": ["only"], "lang": ["en"],
            "source": ["s"], "n_chars": [4],
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["label_propagation_langs"](td) \
                .to_pandas()
        assert len(out) == 0
