"""Wave-33 op kernels: hand-computed expectations independent of the
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
        f"entry_wave33_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _sampled_ids(n):
    return [i for i in range(n)
            if hashlib.md5(str(i).encode()).hexdigest()[0] < "4"]


@pytest.mark.usefixtures("ray_session")
class TestTheilSenSlope:
    def test_exact_linear_relation(self):
        m = _entry("ts")
        # tokens = 2 per 10 chars exactly -> every slope 200 milli
        ids = list(range(64))
        docs = pd.DataFrame({
            "doc_id": ids,
            "n_chars": [10 * (i + 1) for i in ids],
            "text": [" ".join(["w"] * (2 * (i + 1))) for i in ids],
            "lang": ["en"] * len(ids), "source": ["s"] * len(ids),
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["theil_sen_slope"](td)
        r = out.iloc[0]
        ns = len(_sampled_ids(64))
        assert int(r["n_sample"]) == ns
        assert int(r["n_pairs"]) == ns * (ns - 1) // 2
        assert int(r["slope_milli"]) == 200

    def test_negative_slope_truncates_toward_zero(self):
        m = _entry("ts2")
        # pick two sampled ids; tokens FALL as chars grow:
        # dy=-1, dx=3 -> trunc(-1000/3) = -333 (floor would be -334)
        sid = _sampled_ids(50)[:2]
        docs = pd.DataFrame({
            "doc_id": sid,
            "n_chars": [10, 13],
            "text": ["w w", "w"],
            "lang": ["en"] * 2, "source": ["s"] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["theil_sen_slope"](td)
        assert int(out.iloc[0]["slope_milli"]) == -333


@pytest.mark.usefixtures("ray_session")
class TestCandidateKeyAudit:
    def test_detects_keys(self):
        m = _entry("ck")
        docs = pd.DataFrame({
            "doc_id": range(4),
            "lang": ["en", "en", "de", "de"],
            "source": ["a", "b", "a", "b"],
            "n_chars": [1, 1, 2, 2],
            "text": ["x"] * 4,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["candidate_key_audit"](td) \
                .set_index("key_set")
        assert len(out) == 7
        # lang alone: 2 distinct of 4 -> not a key
        assert int(out.loc["lang", "is_key"]) == 0
        assert int(out.loc["lang", "n_distinct"]) == 2
        # lang+source is unique here
        assert int(out.loc["lang+source", "is_key"]) == 1
        # lang+n_chars: values pair up (en,1),(de,2) -> 2 distinct
        assert int(out.loc["lang+n_chars", "is_key"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestSourceCoverGreedy:
    def test_greedy_order_hand_computed(self):
        m = _entry("sc")
        docs = pd.DataFrame({
            "doc_id": range(3),
            "source": ["big", "mid", "tiny"],
            "text": ["a b c d e f", "e f g h", "a z"],
            "lang": ["en"] * 3, "n_chars": [1] * 3,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["source_cover_greedy"](td)
        # vocab = 9 terms (a-h, z); target = ceil(.9*9) = 9
        # greedy: big gains 6; mid gains g,h (2); tiny gains z (1)
        assert out["source"].tolist() == ["big", "mid", "tiny"]
        assert out["gained_terms"].tolist() == [6, 2, 1]
        assert out["cum_terms"].tolist() == [6, 8, 9]

    def test_tie_breaks_to_smallest_source(self):
        m = _entry("sc2")
        docs = pd.DataFrame({
            "doc_id": range(2),
            "source": ["zz", "aa"],
            "text": ["p q", "r s"],
            "lang": ["en"] * 2, "n_chars": [1] * 2,
        })
        with tempfile.TemporaryDirectory() as td:
            docs.to_parquet(os.path.join(td, "documents.parquet"))
            out = m.queries()["source_cover_greedy"](td)
        assert out["source"].tolist()[0] == "aa"
