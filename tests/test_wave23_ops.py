"""Wave-23 op kernels: hand-computed expectations independent of the
DuckDB oracle."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_wave23_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
class TestExpectationsAudit:
    def test_detects_every_violation_kind(self):
        m = _entry("ea")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "doc_id": [1, 1, 2, 3],          # dup doc_id
                "lang": ["en", None, "xx", "de"],  # null + off-list
                "text": ["ab", "c", "", "hello"],
                "n_chars": [2, 1, -5, 99],       # neg + len mismatch
            }).to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["expectations_audit"](td) \
                .set_index("check_name")
        assert int(out.loc["doc_id_unique", "n_violations"]) == 1
        assert int(out.loc["lang_not_null", "n_violations"]) == 1
        # 'xx' and NULL->'' both fail the accepted set
        assert int(out.loc["lang_accepted", "n_violations"]) == 2
        assert int(out.loc["n_chars_nonneg", "n_violations"]) == 1
        # rows 3 (-5 vs len 0) and 4 (99 vs 5) mismatch
        assert int(out.loc["n_chars_matches_text",
                           "n_violations"]) == 2
        assert int(out["passed"].sum()) == 0

    def test_clean_corpus_passes(self):
        m = _entry("ea2")
        out = m.queries()["expectations_audit"](
            "/root/testdata/sf0.001").set_index("check_name")
        assert (out["passed"] == 1).all()
        assert len(out) == 5


@pytest.mark.usefixtures("ray_session")
class TestHypotheticalRank:
    def test_hand_computed(self):
        m = _entry("hr")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "doc_id": range(4),
                "source": ["s", "s", "s", "s"],
                "n_chars": [50, 150, 600, 2000],
            }).to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["hypothetical_rank"](td) \
                .set_index("probe")
        # probe 100: one doc shorter -> rank 2 of 5 slots
        assert int(out.loc[100, "rank"]) == 2
        assert int(out.loc[100, "pct_ppm"]) == 2 * 1_000_000 // 5
        # probe 500: two shorter -> rank 3
        assert int(out.loc[500, "rank"]) == 3
        # probe 1000: three shorter -> rank 4
        assert int(out.loc[1000, "rank"]) == 4


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingPairDot:
    def test_hand_computed_and_quantization(self):
        m = _entry("pd")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "vec_id": [0, 1, 2, 3, 4],  # 4 has no partner
                "embedding": [[0.5, -0.25], [1.0, 2.0],
                              [0.0015, 0.0], [1.0, 1.0],
                              [9.0, 9.0]],
            }).to_parquet(os.path.join(td, "embeddings.parquet"))
            out = m.queries()["embedding_pair_dot"](td).to_pandas() \
                .sort_values("vec_a").reset_index(drop=True)
        # pair (0,1): floor(0.5*1000)=500, floor(-0.25*1000)=-250
        #   dot = 500*1000 + (-250)*2000 = 0
        # pair (2,3): floor(1.5)=1 -> 1*1000 + 0*1000 = 1000
        assert out["vec_a"].tolist() == [0, 2]
        assert out["dot_q"].tolist() == [0, 1000]

    def test_floor_quantization_negative(self):
        m = _entry("pd2")
        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame({
                "vec_id": [0, 1],
                "embedding": [[-0.0005], [1.0]],
            }).to_parquet(os.path.join(td, "embeddings.parquet"))
            out = m.queries()["embedding_pair_dot"](td).to_pandas()
        # floor(-0.5) = -1 (floor, NOT truncation) * 1000
        assert out["dot_q"].tolist() == [-1000]
