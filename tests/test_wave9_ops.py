"""Semantic tests for the round-3 wave-9/10 audit + sketch queries —
the DuckDB oracle proves cross-engine parity; these pin the actual
STATISTICAL/semantic behavior (sketch accuracy, planted-change
detection, plan arithmetic)."""
import importlib.util
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod_w9", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture()
def synth_sf(tmp_path):
    """Tiny synthetic sf dir with controlled events/documents."""
    rng = np.random.RandomState(11)
    n = 20_000
    users = rng.randint(0, 5_000, n)  # ~4.9k distinct expected
    users[:500] = 42  # planted hot key: 500+ events -> needs salts
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (np.arange(n) * np.timedelta64(997, "ms")).astype(
        "timedelta64[us]")
    events = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users.astype(np.int64)),
        "event_type": pa.array(
            np.array(["view", "click"], object)[rng.randint(0, 2, n)],
            pa.string()),
        "value": pa.array(rng.rand(n) * 100),
        "props": pa.array(["{}"] * n, pa.string())})
    # tokens = 4 + i%13 (>= 4 words so snapshot truncation changes
    # text), sentences = i%3, n_chars = exact linear combination so
    # the OLS fit is exact
    texts, xs, ys = [], [], []
    for i in range(200):
        t = " ".join(["w"] * (4 + i % 13)) + ". next" * (i % 3)
        texts.append(t)
        xs.append(t.count(" ") + 1)
        ys.append(t.count(". "))
    nchars = 7 + 5 * np.array(xs, np.int64) + 11 * np.array(ys,
                                                            np.int64)
    docs = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 200, pa.string()),
        "source": pa.array(["src0"] * 100 + ["src1"] * 100,
                           pa.string()),
        "n_chars": pa.array(nchars)})
    src = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       str(tmp_path / f"{t}.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
class TestKmvAccuracy:
    def test_estimate_within_kmv_error(self, synth_sf):
        m = _entry()
        out = m.queries()["kmv_distinct_users"](synth_sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        r = out.iloc[0]
        true = len(pd.read_parquet(
            os.path.join(synth_sf, "events.parquet"),
            columns=["user_id"])["user_id"].unique())
        assert int(r.k) == 64
        # KMV relative std error ~ 1/sqrt(k-1) = 12.6%; allow 4 sigma
        assert abs(int(r.est_distinct) - true) < 0.5 * true

    def test_under_k_exact(self, synth_sf):
        m = _entry()
        out = m.queries()["kmv_distinct_users"]("/root/testdata/sf0.001")
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        r = out.iloc[0]
        assert int(r.k) < 64 and int(r.est_distinct) == int(r.k)


@pytest.mark.usefixtures("ray_session")
class TestBucketMerkleDiff:
    def test_planted_changes_flag_their_buckets(self, synth_sf):
        m = _entry()
        out = m.queries()["bucket_merkle_diff"](synth_sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        # OLD drops doc_id % 5 == 0; NEW truncates doc_id % 7 == 0.
        # Every bucket containing such a doc differs; others must not.
        ids = np.arange(200)
        changed = set((ids[(ids % 5 == 0) | (ids % 7 == 0)] % 64)
                      .tolist())
        got = set(out.loc[out["differs"], "bucket"].astype(int))
        assert got == changed
        same = out.loc[~out["differs"]]
        assert (same["n_old"] == same["n_new"]).all()
        assert (same["xor_old"] == same["xor_new"]).all()


@pytest.mark.usefixtures("ray_session")
class TestSaltingPlan:
    def test_ceil_and_threshold(self, synth_sf):
        m = _entry()
        out = m.queries()["salting_plan"](synth_sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        counts = pd.read_parquet(
            os.path.join(synth_sf, "events.parquet"),
            columns=["user_id"])["user_id"].value_counts()
        hot = counts[counts > 60]
        assert len(out) == len(hot)
        if len(hot) == 0:
            return
        got = dict(zip(out["user_id"].astype(int),
                       out["n_salts"].astype(int)))
        for uid, c in hot.items():
            assert got[int(uid)] == -(-int(c) // 60)


@pytest.mark.usefixtures("ray_session")
class TestPsiSemantics:
    def test_identical_distributions_near_zero(self, synth_sf):
        m = _entry()
        out = m.queries()["psi_chars_drift"](synth_sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        r = out.iloc[0]
        # src0 and src1 n_chars patterns are near-identical (i % 13 /
        # i % 3 windows shift slightly between id ranges) -> PSI well
        # under the 0.1 "stable" threshold
        assert abs(int(r.psi_ppm)) < 30000


@pytest.mark.usefixtures("ray_session")
class TestOls2:
    def test_matches_numpy_lstsq(self, synth_sf):
        m = _entry()
        out = m.queries()["ols2_by_source"](synth_sf)
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        docs = pd.read_parquet(os.path.join(synth_sf,
                                            "documents.parquet"))
        for src in ["src0", "src1"]:
            d = docs[docs["source"] == src]
            x = d["text"].str.count(" ").to_numpy() + 1
            y = d["text"].str.count(r"\. ").to_numpy()
            z = d["n_chars"].to_numpy(np.float64)
            X = np.column_stack([np.ones(len(d)), x, y])
            beta, *_ = np.linalg.lstsq(X, z, rcond=None)
            assert np.allclose(beta, [7, 5, 11])  # fixture is exact
            r = out[out["source"] == src].iloc[0]
            got = np.array([r.b0_ppm, r.b_tok_ppm, r.b_sent_ppm],
                           np.float64) / 1e6
            assert np.allclose(got, beta, atol=2e-6), (got, beta)


class TestLevenshteinKernel:
    """The byte-DP must agree with DuckDB's byte-based levenshtein()
    exactly — the adjacent_edit_distance oracle depends on it."""

    def test_differential_vs_duckdb(self):
        import random
        import duckdb
        from pdf_extract_ray.ops.dedup import _levenshtein_bytes
        con = duckdb.connect()
        rng = random.Random(7)
        alpha = "abcé 漢xy"
        for _ in range(300):
            a = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(0, 14)))
            b = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(0, 14)))
            want = con.execute("SELECT levenshtein(?, ?)",
                               [a, b]).fetchone()[0]
            got = _levenshtein_bytes(a.encode(), b.encode())
            assert got == want, (a, b, got, want)
        con.close()

    def test_edges(self):
        from pdf_extract_ray.ops.dedup import _levenshtein_bytes
        assert _levenshtein_bytes(b"", b"") == 0
        assert _levenshtein_bytes(b"", b"abc") == 3
        assert _levenshtein_bytes(b"abc", b"") == 3
        assert _levenshtein_bytes(b"abc", b"abc") == 0
        assert _levenshtein_bytes(b"kitten", b"sitting") == 3
