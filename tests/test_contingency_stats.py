"""Contingency-stat kernels (grouped_chi2_cells / grouped_entropy /
grouped_geomean): exact-integer unit fixtures, degenerate
distributions, and a DuckDB differential on the oracled queries at
sf0.001 (the driver re-checks at sf0.01)."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from pdf_extract_ray.ops.analytics import (grouped_chi2_cells,
                                           grouped_entropy,
                                           grouped_geomean)

SF = "/root/testdata/sf0.001"


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


class TestChi2Cells:
    def test_hand_computed_2x2(self, ray_session):
        # contingency: a/x=3 a/y=1, b/x=1 b/y=3 ; N=8, margins 4 each
        rows = {"g": ["a"] * 3 + ["a"] + ["b"] + ["b"] * 3,
                "v": ["x"] * 3 + ["y"] + ["x"] + ["y"] * 3}
        out = grouped_chi2_cells(_ds(rows), "g", "v") \
            .sort_values(["g", "v"]).reset_index(drop=True)
        # e = 4*4/8 = 2 -> expected_ppm 2_000_000 per cell
        assert (out["expected_ppm"] == 2_000_000).all()
        # term = (o*N - rc)^2 / (rc*N) = (24-16)^2/128 = 0.5 per cell
        assert (out["chi2_term_ppm"] == 500_000).all()
        assert list(out["observed"]) == [3, 1, 1, 3]

    def test_independent_table_zero_terms(self, ray_session):
        rows = {"g": ["a", "a", "b", "b"], "v": ["x", "y", "x", "y"]}
        out = grouped_chi2_cells(_ds(rows), "g", "v")
        assert (out["chi2_term_ppm"] == 0).all()


class TestEntropy:
    def test_single_value_zero(self, ray_session):
        out = grouped_entropy(_ds({"g": ["a"] * 5, "v": ["x"] * 5}),
                              "g", "v")
        assert list(out["entropy_ppm"]) == [0]
        assert list(out["n_rows"]) == [5]

    def test_uniform_is_ln_k(self, ray_session):
        out = grouped_entropy(
            _ds({"g": ["a"] * 4, "v": ["w", "x", "y", "z"]}), "g", "v")
        assert out["entropy_ppm"].iloc[0] == int(np.log(4) * 1_000_000)


class TestGeomean:
    def test_exact_powers(self, ray_session):
        # geomean(2, 8) = 4 -> 4000 milli
        out = grouped_geomean(_ds({"g": ["a", "a"], "v": [2, 8]}),
                              "g", "v").take_all()
        assert out[0]["geomean_milli"] == 4000
        assert out[0]["n_pos"] == 2

    def test_nonpositive_rows_excluded(self, ray_session):
        out = grouped_geomean(
            _ds({"g": ["a", "a", "a", "b"], "v": [5, 0, -3, 0]}),
            "g", "v").take_all()
        assert len(out) == 1  # b has no positive rows -> dropped
        assert out[0]["n_pos"] == 1
        assert out[0]["geomean_milli"] == 5000  # round-half-up rescue


@pytest.mark.parametrize("name", ["lang_chi2_cells",
                                  "lang_entropy_by_source",
                                  "geomean_chars_by_source"])
def test_matches_duckdb(ray_session, name):
    import __ray_entry__ as entry
    got = entry.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(entry.oracle_sql()[name]).fetchdf()
    keys = [c for c in ("source", "lang") if c in got.columns]
    g = got.sort_values(keys).reset_index(drop=True)
    w = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], w[sorted(w.columns)], check_dtype=False)


class TestTrimmedMean:
    def test_hand_1_to_10(self, ray_session):
        from pdf_extract_ray.ops.analytics import grouped_trimmed_mean
        out = grouped_trimmed_mean(
            _ds({"g": ["a"] * 10, "v": list(range(1, 11))}),
            "g", "v").take_all()
        # lo = 1: keep ranks 2..9 -> 2..9, sum 44, mean 5.5
        assert out[0]["n_rows"] == 10
        assert out[0]["n_kept"] == 8
        assert out[0]["trimmed_mean_milli"] == 5500

    def test_ties_across_cut(self, ray_session):
        from pdf_extract_ray.ops.analytics import grouped_trimmed_mean
        # 20 rows: ten 1s then ten 5s; lo=2 -> drop two 1s and two 5s
        out = grouped_trimmed_mean(
            _ds({"g": ["a"] * 20, "v": [1] * 10 + [5] * 10}),
            "g", "v").take_all()
        assert out[0]["n_kept"] == 16
        assert out[0]["trimmed_mean_milli"] == (8 * 1 + 8 * 5) * 1000 // 16

    def test_small_group_untrimmed(self, ray_session):
        from pdf_extract_ray.ops.analytics import grouped_trimmed_mean
        out = grouped_trimmed_mean(_ds({"g": ["a"] * 3, "v": [1, 2, 9]}),
                                   "g", "v").take_all()
        assert out[0]["n_kept"] == 3
        assert out[0]["trimmed_mean_milli"] == 4000


class TestOovRate:
    def test_small_fixture(self, ray_session):
        from pdf_extract_ray.ops.corpus import oov_rate
        rows = {"source": ["s1", "s1", "s2"],
                "text": ["a a b", "a c", "b b z q"]}
        out = {r["source"]: r for r in
               oov_rate(_ds(rows), k=2).take_all()}
        # counts: a=3 b=3 c=1 z=1 q=1 -> top-2 = {a, b}
        assert out["s1"]["n_tokens"] == 5
        assert out["s1"]["oov_tokens"] == 1  # 'c'
        assert out["s2"]["n_tokens"] == 4
        assert out["s2"]["oov_tokens"] == 2  # z, q
        assert out["s2"]["oov_ppm"] == 500_000


class TestUnionByName:
    def test_schema_drift_union(self, ray_session):
        from pdf_extract_ray.ops.relational import union_by_name
        a = ray.data.from_pandas(pd.DataFrame(
            {"id": [1, 2], "x": ["p", "q"]}))
        b = ray.data.from_pandas(pd.DataFrame(
            {"id": [3], "y": [7]}))
        u = union_by_name(a, b)
        rows = sorted(u.take_all(), key=lambda r: r["id"])
        assert [r["id"] for r in rows] == [1, 2, 3]
        assert rows[0]["x"] == "p" and rows[0]["y"] is None
        assert rows[2]["x"] is None and rows[2]["y"] == 7

    def test_column_completeness(self, ray_session):
        from pdf_extract_ray.ops.relational import column_completeness
        ds = ray.data.from_pandas(pd.DataFrame(
            {"a": [1, None, 3], "b": [None, None, "z"]}))
        out = column_completeness(ds, ["a", "b"])
        assert out.iloc[0]["n_rows"] == 3
        assert out.iloc[0]["a_nonnull"] == 2
        assert out.iloc[0]["b_nonnull"] == 1


class TestSessionStats:
    def test_hand_sessions(self, ray_session):
        from pdf_extract_ray.ops.events import session_stats
        ts = pd.to_datetime([
            "2026-01-01 10:00", "2026-01-01 10:10",  # u1 sess A (2)
            "2026-01-01 12:00",                      # u1 sess B (1)
            "2026-01-01 09:00",                      # u2 sess C (1)
        ])
        ds = ray.data.from_pandas(pd.DataFrame(
            {"user_id": [1, 1, 1, 2], "ts": ts}))
        out = session_stats(ds).iloc[0]
        assert out["n_sessions"] == 3
        assert out["n_bounce"] == 2
        assert out["bounce_ppm"] == 666_666
        assert out["max_session_events"] == 2
        assert out["avg_session_events_milli"] == 1333


class TestDupRateAutocorr:
    def test_dup_rate_small(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["a", "a", "b", "c"],
            "source": ["s", "s", "s", "t"],
            "lang": ["en"] * 4,
            "n_chars": [1] * 4,
        })
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["dup_rate_by_source"](str(tmp_path))
        row = out.set_index("source").loc["s"]
        assert row["n_docs"] == 3 and row["n_unique"] == 2
        assert row["dup_ppm"] == 333_333
        assert out.set_index("source").loc["t"]["dup_ppm"] == 0

    def test_hourly_autocorr_matches_duckdb(self, ray_session):
        import duckdb
        import __ray_entry__ as entry
        sf = "/root/testdata/sf0.001"
        got = entry.queries()["hourly_autocorr"](sf)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        want = con.execute(entry.oracle_sql()["hourly_autocorr"]).fetchdf()
        assert len(got) == len(want) == 1
        assert int(got["n_pairs"].iloc[0]) == int(want["n_pairs"].iloc[0])
        # bit-identical float discipline (same IEEE op order)
        assert got["lag1_corr"].iloc[0] == want["lag1_corr"].iloc[0]


class TestCrawlBudget:
    def test_hamilton_apportionment_sums_to_budget(self, ray_session,
                                                   tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # 3/3/1 docs over 10000 -> base 4285/4285/1428 (sum 9998),
        # two leftovers by remainder: rem 5,5,4 -> a,b get +1
        t = pa.table({"doc_id": list(range(7)),
                      "text": ["x"] * 7,
                      "source": ["a"] * 3 + ["b"] * 3 + ["c"],
                      "lang": ["en"] * 7,
                      "n_chars": [1] * 7})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["crawl_budget"](str(tmp_path)) \
            .set_index("source")
        assert int(out["quota"].sum()) == 10_000
        assert out.loc["a"]["quota"] == 4286
        assert out.loc["b"]["quota"] == 4286
        assert out.loc["c"]["quota"] == 1428


class TestBigramPerplexity:
    def test_uniform_two_state_chain(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # one user alternating A,B,A,B... -> every transition prob 1
        # (A always -> B, B always -> A) -> perplexity exactly 1.0
        n = 10
        t = pa.table({
            "event_id": list(range(n)),
            "ts": pa.array([1_000_000 * i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": [1] * n,
            "event_type": ["A", "B"] * (n // 2),
            "value": [1.0] * n,
            "props": ["{}"] * n})
        pq.write_table(t, str(tmp_path / "events.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["event_bigram_perplexity"](str(tmp_path))
        assert int(out["n_transitions"].iloc[0]) == n - 1
        assert int(out["perplexity_micro"].iloc[0]) == 1_000_000


class TestHarmonicGini:
    def test_harmonic_exact(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # HM(2, 6) = 2/(1/2 + 1/6) = 3.0 -> 3000 milli
        t = pa.table({"doc_id": [1, 2], "text": ["x", "y"],
                      "source": ["s", "s"], "lang": ["en"] * 2,
                      "n_chars": [2, 6]})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["harmonic_mean_chars"](str(tmp_path))
        row = out.to_pandas().iloc[0] if not hasattr(out, "iloc") \
            else out.iloc[0]
        assert row["harmonic_mean_milli"] == 3000

    def test_gini_extremes(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import __ray_entry__ as entry
        # perfectly balanced: gini 0
        t = pa.table({"doc_id": [1, 2, 3, 4], "text": ["x"] * 4,
                      "source": ["a", "a", "b", "b"],
                      "lang": ["en"] * 4, "n_chars": [1] * 4})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = entry.queries()["host_balance_gini"](str(tmp_path))
        assert int(out["gini_ppm"].iloc[0]) == 0
        # skewed 9 vs 1: GMD = 8, mean = 5 -> gini = 8/10 = 0.8
        t2 = pa.table({"doc_id": list(range(10)), "text": ["x"] * 10,
                       "source": ["a"] * 9 + ["b"],
                       "lang": ["en"] * 10, "n_chars": [1] * 10})
        pq.write_table(t2, str(tmp_path / "documents.parquet"))
        out2 = entry.queries()["host_balance_gini"](str(tmp_path))
        assert int(out2["gini_ppm"].iloc[0]) == 800_000


class TestSplitLeakage:
    def test_planted_leak(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # find ids on both sides of the hash split, plant a shared text
        train_ids = [i for i in range(40)
                     if (i * 2654435761) % 10 < 8][:2]
        eval_ids = [i for i in range(40)
                    if (i * 2654435761) % 10 >= 8][:2]
        ids = train_ids + eval_ids
        texts = ["LEAK", "unique-a", "LEAK", "unique-b"]
        t = pa.table({"doc_id": ids, "text": texts,
                      "source": ["s"] * 4, "lang": ["en"] * 4,
                      "n_chars": [4] * 4})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["split_leakage_report"](str(tmp_path))
        assert int(out["eval_docs_leaked"].iloc[0]) == 1
        assert int(out["texts_leaked"].iloc[0]) == 1
        assert int(out["leak_pairs"].iloc[0]) == 1


class TestCharMixLorenz:
    def test_char_classes(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.table({"doc_id": [1], "text": ["ab 12"],
                      "source": ["s"], "lang": ["en"], "n_chars": [5]})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["char_class_mix"](str(tmp_path)).iloc[0]
        assert out["n_chars_total"] == 5
        assert out["alpha_ppm"] == 400_000
        assert out["digit_ppm"] == 400_000
        assert out["space_ppm"] == 200_000

    def test_lorenz_monotone_and_total(self, ray_session):
        import __ray_entry__ as entry
        out = entry.queries()["host_lorenz"]("/root/testdata/sf0.001")
        s = out["share_ppm"].to_numpy()
        assert (np.diff(s) >= 0).all()
        assert s[-1] == 1_000_000  # decile 10 covers all docs


class TestWelchEffective:
    def test_welch_symmetric_zero(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # identical value distributions in both variants -> t == 0
        n = 8
        t = pa.table({
            "event_id": list(range(n)),
            "ts": pa.array([1_000_000 * i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": [0, 1, 2, 3, 4, 5, 6, 7],
            "event_type": ["x"] * n,
            "value": [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0],
            "props": ["{}"] * n})
        pq.write_table(t, str(tmp_path / "events.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["welch_t_value"](str(tmp_path))
        assert int(out["t_micro"].iloc[0]) == 0
        assert int(out["n_a"].iloc[0]) == 4

    def test_effective_langs_balanced(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.table({"doc_id": [1, 2, 3, 4], "text": ["x"] * 4,
                      "source": ["s"] * 4,
                      "lang": ["en", "de", "en", "de"],
                      "n_chars": [1] * 4})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        import __ray_entry__ as entry
        out = entry.queries()["effective_langs"](str(tmp_path))
        # two balanced langs -> exactly 2.0 effective
        assert int(out["effective_langs_ppm"].iloc[0]) == 2_000_000
