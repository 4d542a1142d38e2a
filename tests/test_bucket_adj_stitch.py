"""Regression tests for the _BUCKET_ADJ boundary-stitch fix (round-3
ADVICE, medium): globally-adjacent pairs must survive entirely-empty
INTERIOR buckets.  The old one-bucket-back ghost scheme dropped the
pair spanning an empty bucket (doc_ids [1, 9000] with B=4096 leave
bucket 1 empty) and could emit spurious pairs when unrelated buckets
co-hashed into one partition.  The stitch (per-bucket boundary rows,
sequence_gaps pattern) is exact for any id/length distribution; these
tests pin BOTH partition paths (adaptive small + forced shuffle)."""
import os
import tempfile

import numpy as np
import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_stitch_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _docs(td, doc_ids, sources=None, n_chars=None, texts=None):
    n = len(doc_ids)
    pd.DataFrame({
        "doc_id": doc_ids,
        "source": sources or ["s"] * n,
        "lang": ["en"] * n,
        "text": texts or [f"t{i}" for i in doc_ids],
        "n_chars": n_chars or [1] * n,
    }).to_parquet(os.path.join(td, "documents.parquet"))


def _run(q, td, force_shuffle):
    from pdf_extract_ray.ops import dedup as dedup_mod
    assert dedup_mod._FORCE_SHUFFLE is False
    dedup_mod._FORCE_SHUFFLE = force_shuffle
    try:
        res = q(td)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        return pd.DataFrame(res)
    finally:
        dedup_mod._FORCE_SHUFFLE = False


@pytest.mark.usefixtures("ray_session")
class TestEmptyInteriorBucket:
    @pytest.mark.parametrize("force", [False, True])
    def test_contrastive_pair_spans_empty_bucket(self, force):
        m = _entry(f"cp{int(force)}")
        with tempfile.TemporaryDirectory() as td:
            # buckets 0 and 2 occupied, bucket 1 (4096..8191) empty
            _docs(td, [1, 9000], sources=["a", "b"])
            out = _run(m.queries()["contrastive_pairs"], td, force) \
                .sort_values("id_a").reset_index(drop=True)
        assert out[["id_a", "id_b", "label"]].values.tolist() == \
            [[1, 9000, 0]]

    @pytest.mark.parametrize("force", [False, True])
    def test_contrastive_sparse_ids_match_lead(self, force):
        m = _entry(f"cps{int(force)}")
        rng = np.random.RandomState(7)
        ids = np.unique(rng.randint(0, 300_000, size=60))
        srcs = [f"s{i % 3}" for i in range(len(ids))]
        with tempfile.TemporaryDirectory() as td:
            _docs(td, ids.tolist(), sources=srcs)
            out = _run(m.queries()["contrastive_pairs"], td, force) \
                .sort_values("id_a").reset_index(drop=True)
        exp = pd.DataFrame({"doc_id": ids, "source": srcs}) \
            .sort_values("doc_id")
        want = pd.DataFrame({
            "id_a": exp["doc_id"].to_numpy()[:-1],
            "id_b": exp["doc_id"].to_numpy()[1:],
            "label": (exp["source"].to_numpy()[:-1]
                      == exp["source"].to_numpy()[1:]).astype(int)})
        assert out[["id_a", "id_b", "label"]].values.tolist() == \
            want.values.tolist()

    @pytest.mark.parametrize("force", [False, True])
    def test_snm_pair_spans_empty_length_bucket(self, force):
        m = _entry(f"snm{int(force)}")
        with tempfile.TemporaryDirectory() as td:
            # n_chars 10 and 9000: buckets 0 and 140 (B=64), all
            # interior length-buckets empty
            _docs(td, [1, 2], n_chars=[10, 9000],
                  texts=["same", "same"])
            out = _run(m.queries()["snm_dup_candidates"], td, force) \
                .sort_values("id_a").reset_index(drop=True)
        assert out[["id_a", "id_b", "len_diff", "is_dup"]] \
            .values.tolist() == [[1, 2, 8990, 1]]

    @pytest.mark.parametrize("force", [False, True])
    def test_snm_gappy_lengths_match_lead(self, force):
        m = _entry(f"snms{int(force)}")
        rng = np.random.RandomState(11)
        n = 40
        ids = np.arange(1, n + 1)
        chars = rng.choice([5, 70, 200, 5000, 9001, 20000], size=n) \
            .astype(int)
        texts = [f"body{i % 4}" for i in range(n)]
        with tempfile.TemporaryDirectory() as td:
            _docs(td, ids.tolist(), n_chars=chars.tolist(),
                  texts=texts)
            out = _run(m.queries()["snm_dup_candidates"], td, force) \
                .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        import hashlib
        h = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        exp = pd.DataFrame({"did": ids, "ch": chars, "h": h}) \
            .sort_values(["ch", "did"]).reset_index(drop=True)
        want = pd.DataFrame({
            "id_a": exp["did"].to_numpy()[:-1],
            "id_b": exp["did"].to_numpy()[1:],
            "len_diff": exp["ch"].to_numpy()[1:]
            - exp["ch"].to_numpy()[:-1],
            "is_dup": (exp["h"].to_numpy()[:-1]
                       == exp["h"].to_numpy()[1:]).astype(int)}) \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert out[["id_a", "id_b", "len_diff", "is_dup"]] \
            .values.tolist() == want.values.tolist()

    @pytest.mark.parametrize("force", [False, True])
    def test_encoding_advisor_counts_cross_empty_bucket_run(
            self, force):
        m = _entry(f"ea{int(force)}")
        with tempfile.TemporaryDirectory() as td:
            # [1:en/a, 9000:en/b, 20000:fr/b] across empty buckets:
            # lang runs = 2 (en,fr), source runs = 2 (a,b)
            pd.DataFrame({
                "doc_id": [1, 9000, 20000],
                "source": ["a", "b", "b"],
                "lang": ["en", "en", "fr"],
                "text": ["x", "y", "z"],
                "n_chars": [1, 1, 1],
            }).to_parquet(os.path.join(td, "documents.parquet"))
            out = _run(m.queries()["encoding_advisor"], td, force) \
                .sort_values("column_name").reset_index(drop=True)
        assert out[["column_name", "n_rows", "n_runs"]] \
            .values.tolist() == [["lang", 3, 2], ["source", 3, 2]]
