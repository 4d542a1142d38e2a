"""Subset invariance: a MAP-ONLY per-row operator must commute with row
filtering — running on a subset equals filtering the full result.  Any
accidental cross-row dependency (batch-relative math, corpus-level
state leaking into a per-row stat) breaks this immediately.  Ops
with DELIBERATE corpus-level state (lm_scores' trained LM, tfidf's df)
are excluded by design — their cross-row dependency is the point.  Oracles
can't catch that class (both engines would share the dependency), so
this property pins it independently."""
import importlib.util
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

# queries whose output is one row per input doc, map-only by contract
MAP_ONLY = ["token_counts", "quality_scores", "normalize_text",
            "lang_id", "repetition_scores", "redact_pii",
            "dataset_splits", "deterministic_sample", "fingerprints",
            "chunk_for_training",
            # round 5 map-only ops
            "c4_line_filter", "probe_positions"]


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_subset", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def subset_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_subset")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        if t == "documents":
            ids = tab.column("doc_id").to_pylist()
            import pyarrow as pa
            keep = pa.array([i % 3 == 0 for i in ids])
            tab = tab.filter(keep)
        pq.write_table(tab, str(dst / f"{t}.parquet"))
    return str(dst)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", MAP_ONLY)
def test_map_only_ops_commute_with_filter(subset_sf, name):
    m = _entry()
    q = m.queries()[name]
    full = q(SF)
    if hasattr(full, "to_pandas"):
        full = full.to_pandas()
    full = pd.DataFrame(full)
    sub = q(subset_sf)
    if hasattr(sub, "to_pandas"):
        sub = sub.to_pandas()
    sub = pd.DataFrame(sub)
    expected = full[full["doc_id"] % 3 == 0]
    pd.testing.assert_frame_equal(_canon(expected), _canon(sub))
    assert len(sub) > 0
