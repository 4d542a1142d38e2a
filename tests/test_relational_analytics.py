"""Unit tests for ops/relational.py and ops/analytics.py over small
in-memory tables with hand-computed answers (the sf0.01 DuckDB oracle
covers the same operators at scale via tools/check_oracle.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_asof_join_basic(self):
        from pdf_extract_ray.ops.relational import asof_join_orders
        ts = lambda s: np.datetime64(s, "us").item()
        events = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "ts": pa.array([ts("2024-01-05"), ts("2024-01-01"),
                            ts("2023-12-01"), ts("2024-01-05")],
                           pa.timestamp("us"))})
        orders = pa.table({
            "o_orderkey": pa.array([100, 101, 102, 200], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
            "o_orderdate": pa.array(
                [ts("2024-01-01"), ts("2024-01-04"), ts("2024-01-01"),
                 ts("2024-01-01")], pa.timestamp("us"))})
        out = asof_join_orders(_ds(events), _ds(orders)).to_pandas()
        got = {int(r.event_id): int(r.o_orderkey) for r in out.itertuples()}
        # event 1 (Jan 5): latest order Jan 4 -> 101
        # event 2 (Jan 1): tie on Jan 1 orders 100/102 -> max key 102
        # event 3 (Dec 1): no prior order -> dropped
        # event 4: user 8 has no orders -> dropped
        assert got == {1: 101, 2: 102}

    def test_pricing_summary_counts(self):
        from pdf_extract_ray.ops.relational import pricing_summary
        ts = lambda s: np.datetime64(s, "us").item()
        li = pa.table({
            "l_returnflag": pa.array(["A", "A", "N"], pa.string()),
            "l_linestatus": pa.array(["F", "F", "O"], pa.string()),
            "l_quantity": pa.array([2.0, 3.0, 1.0], pa.float64()),
            "l_extendedprice": pa.array([10.0, 20.0, 5.0], pa.float64()),
            "l_discount": pa.array([0.1, 0.0, 0.5], pa.float64()),
            "l_tax": pa.array([0.0, 0.1, 0.0], pa.float64()),
            "l_shipdate": pa.array([ts("1999-01-01"), ts("1999-06-01"),
                                    ts("2001-01-01")], pa.timestamp("us"))})
        out = pricing_summary(_ds(li), cutoff="2000-01-01").to_pandas()
        row = out[out.l_returnflag == "A"].iloc[0]
        assert row.n_rows == 2
        assert row.sum_qty_cents == 500
        assert row.sum_base_price_cents == 3000
        # 10*0.9 + 20*1.0 = 29 ; charge: 9 + 20*1.1 = 31
        assert row.sum_disc_price_cents == 2900
        assert row.sum_charge_cents == 3100
        assert (out.l_returnflag == "N").sum() == 0  # filtered by cutoff


@pytest.mark.usefixtures("ray_session")
class TestAnalytics:
    def test_topk_per_group(self):
        from pdf_extract_ray.ops.analytics import topk_per_group
        t = pa.table({"lang": pa.array(["en", "en", "en", "de"], pa.string()),
                      "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "n_chars": pa.array([10, 30, 30, 5], pa.int64())})
        out = topk_per_group(_ds(t), "lang", "n_chars", "doc_id", k=2) \
            .to_pandas().sort_values(["lang", "rank"])
        en = out[out.lang == "en"]
        # ties on 30 break by doc_id asc: 2 then 3
        assert list(en.doc_id) == [2, 3]
        assert list(en["rank"]) == [1, 2]
        assert list(out[out.lang == "de"].doc_id) == [4]

    def test_distinct_count(self):
        from pdf_extract_ray.ops.analytics import distinct_count
        t = pa.table({"event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                      "user_id": pa.array([1, 1, 2, 1], pa.int64())})
        out = distinct_count(_ds(t), "event_type", "user_id").to_pandas()
        got = dict(zip(out.event_type, out.n_distinct))
        assert got == {"a": 2, "b": 1}

    def test_grouped_median_even_odd(self):
        from pdf_extract_ray.ops.analytics import grouped_median
        t = pa.table({"source": pa.array(["x"] * 4 + ["y"] * 3, pa.string()),
                      "n_chars": pa.array([1, 3, 5, 7, 10, 20, 30], pa.int64())})
        out = grouped_median(_ds(t), "source", "n_chars").to_pandas()
        got = dict(zip(out.source, out["median"]))
        assert got["x"] == 4.0   # (3+5)/2
        assert got["y"] == 20.0

    def test_word_frequencies(self):
        from pdf_extract_ray.ops.analytics import word_frequencies
        t = pa.table({"text": pa.array(["a b a", "b a", "c"], pa.string())})
        out = word_frequencies(_ds(t), "text", k=2)
        assert out.column("word").to_pylist() == ["a", "b"]
        assert out.column("n").to_pylist() == [3, 2]


@pytest.mark.usefixtures("ray_session")
class TestSketch:
    def test_hll_within_tolerance_of_exact(self):
        from pdf_extract_ray.ops.sketch import approx_distinct_count
        n = 5000
        t = pa.table({
            "g": pa.array(["a" if i % 3 else "b" for i in range(n)], pa.string()),
            "v": pa.array([i % 700 for i in range(n)], pa.int64())})
        out = approx_distinct_count(_ds(t), "g", "v", p=12).to_pandas()
        got = dict(zip(out.g, out.n_distinct_approx))
        # exact: 'a' sees values i%700 for i not divisible by 3; 'b' the rest
        exact_a = len({i % 700 for i in range(n) if i % 3})
        exact_b = len({i % 700 for i in range(n) if not i % 3})
        assert abs(got["a"] - exact_a) / exact_a < 0.05
        assert abs(got["b"] - exact_b) / exact_b < 0.05

    def test_hll_deterministic(self):
        from pdf_extract_ray.ops.sketch import hll_sketch_batch, _estimate
        import numpy as np
        r1 = hll_sketch_batch(list(range(1000)))
        r2 = hll_sketch_batch(list(range(1000)))
        assert (r1 == r2).all()
        assert abs(_estimate(r1) - 1000) / 1000 < 0.05


@pytest.mark.usefixtures("ray_session")
class TestWindowsAndCentroids:
    def test_sliding_window_fanout(self):
        from pdf_extract_ray.ops.events import sliding_window_counts
        ts = np.datetime64("2024-01-01T00:31:00", "us").item()
        t = pa.table({"ts": pa.array([ts], pa.timestamp("us")),
                      "event_type": pa.array(["x"], pa.string())})
        out = sliding_window_counts(_ds(t), window_minutes=60,
                                    slide_minutes=15).to_pandas()
        # one event -> 4 overlapping windows: 00:30, 00:15, 00:00, 23:45
        assert len(out) == 4
        assert set(out.n_events) == {1}
        starts = sorted(str(s) for s in out.window_start)
        assert starts[-1].endswith("00:30:00")

    def test_label_centroids_exact(self):
        from pdf_extract_ray.ops.similarity import label_centroids
        t = pa.table({
            "label": pa.array([1, 1, 2], pa.int32()),
            "embedding": pa.array([[1.0, 0.0], [3.0, 2.0], [5.0, 5.0]],
                                  pa.list_(pa.float32()))})
        out = label_centroids(_ds(t), dim=2)
        got = {(l, d): m for l, d, m in zip(out.column("label").to_pylist(),
                                            out.column("dim_idx").to_pylist(),
                                            out.column("mean_e6").to_pylist())}
        assert got[(1, 0)] == 2_000_000 and got[(1, 1)] == 1_000_000
        assert got[(2, 0)] == 5_000_000 and got[(2, 1)] == 5_000_000


@pytest.mark.usefixtures("ray_session")
class TestAsofProperty:
    def test_asof_matches_bruteforce(self):
        """Randomized cross-check: the distributed as-of join must equal a
        per-event linear scan for every (event, order) configuration."""
        from hypothesis import given, settings, strategies as st
        from pdf_extract_ray.ops.relational import asof_join_orders

        @settings(max_examples=12, deadline=None)
        @given(st.data())
        def run(data):
            n_ev = data.draw(st.integers(1, 12))
            n_or = data.draw(st.integers(0, 12))
            ev_ts = [data.draw(st.integers(0, 50)) for _ in range(n_ev)]
            ev_user = [data.draw(st.integers(1, 3)) for _ in range(n_ev)]
            or_ts = [data.draw(st.integers(0, 50)) for _ in range(n_or)]
            or_user = [data.draw(st.integers(1, 3)) for _ in range(n_or)]
            day = 86400_000_000  # us

            events = pa.table({
                "event_id": pa.array(range(n_ev), pa.int64()),
                "user_id": pa.array(ev_user, pa.int64()),
                "ts": pa.array([t * day for t in ev_ts], pa.timestamp("us"))})
            orders = pa.table({
                "o_orderkey": pa.array(range(100, 100 + n_or), pa.int64()),
                "o_custkey": pa.array(or_user, pa.int64()),
                "o_orderdate": pa.array([t * day for t in or_ts],
                                        pa.timestamp("us"))})
            out = asof_join_orders(_ds(events), _ds(orders),
                                   n_parts=4).to_pandas()
            got = {int(r.event_id): int(r.o_orderkey)
                   for r in out.itertuples()}

            expect = {}
            for eid in range(n_ev):
                best = None  # (date, orderkey)
                for ok_, ou, ot in zip(range(100, 100 + n_or), or_user, or_ts):
                    if ou == ev_user[eid] and ot <= ev_ts[eid]:
                        if best is None or (ot, ok_) > best:
                            best = (ot, ok_)
                if best is not None:
                    expect[eid] = best[1]
            assert got == expect

        run()

    def test_asof_salted_matches_bruteforce_random(self):
        """Randomized cross-check for the salted path: tiny buckets
        (salt_days=3) force heavy carry-in traffic; output must equal a
        per-event linear scan."""
        from hypothesis import given, settings, strategies as st
        from pdf_extract_ray.ops.relational import asof_join_orders_salted

        @settings(max_examples=8, deadline=None)
        @given(st.data())
        def run(data):
            n_ev = data.draw(st.integers(1, 12))
            n_or = data.draw(st.integers(0, 12))
            ev_ts = [data.draw(st.integers(0, 50)) for _ in range(n_ev)]
            ev_user = [data.draw(st.integers(1, 3)) for _ in range(n_ev)]
            or_ts = [data.draw(st.integers(0, 50)) for _ in range(n_or)]
            or_user = [data.draw(st.integers(1, 3)) for _ in range(n_or)]
            day = 86400_000_000
            events = pa.table({
                "event_id": pa.array(range(n_ev), pa.int64()),
                "user_id": pa.array(ev_user, pa.int64()),
                "ts": pa.array([t * day for t in ev_ts], pa.timestamp("us"))})
            orders = pa.table({
                "o_orderkey": pa.array(range(100, 100 + n_or), pa.int64()),
                "o_custkey": pa.array(or_user, pa.int64()),
                "o_orderdate": pa.array([t * day for t in or_ts],
                                        pa.timestamp("us"))})
            out = asof_join_orders_salted(_ds(events), _ds(orders),
                                          n_parts=4,
                                          salt_days=3).to_pandas()
            got = {int(r.event_id): int(r.o_orderkey)
                   for r in out.itertuples()}
            expect = {}
            for eid in range(n_ev):
                best = None
                for ok_, ou, ot in zip(range(100, 100 + n_or), or_user,
                                       or_ts):
                    if ou == ev_user[eid] and ot <= ev_ts[eid]:
                        if best is None or (ot, ok_) > best:
                            best = (ot, ok_)
                if best is not None:
                    expect[eid] = best[1]
            assert got == expect

        run()

    def test_asof_salted_matches_plain_on_skew(self):
        """The hot-key-salted as-of join must be row-identical to the
        plain one on a skewed fixture (one user owns ~90% of rows) with
        buckets small enough that carry-in paths fire."""
        from pdf_extract_ray.ops.relational import (asof_join_orders,
                                                    asof_join_orders_salted)
        rng = np.random.RandomState(5)
        day = 86400_000_000
        n_ev, n_or = 300, 120
        ev_user = np.where(rng.rand(n_ev) < 0.9, 7,
                           rng.randint(1, 5, n_ev)).astype(np.int64)
        or_user = np.where(rng.rand(n_or) < 0.9, 7,
                           rng.randint(1, 5, n_or)).astype(np.int64)
        # order days clustered early so many event-buckets have no
        # in-bucket order and must take the carry-in
        ev_days = rng.randint(0, 365, n_ev)
        or_days = rng.randint(0, 120, n_or)
        events = pa.table({
            "event_id": pa.array(range(n_ev), pa.int64()),
            "user_id": pa.array(ev_user, pa.int64()),
            "ts": pa.array((ev_days * day).tolist(), pa.timestamp("us"))})
        orders = pa.table({
            "o_orderkey": pa.array(range(100, 100 + n_or), pa.int64()),
            "o_custkey": pa.array(or_user, pa.int64()),
            "o_orderdate": pa.array((or_days * day).tolist(),
                                    pa.timestamp("us"))})
        for how in ("inner", "left"):
            plain = asof_join_orders(_ds(events), _ds(orders), n_parts=4,
                                     how=how).to_pandas() \
                .sort_values("event_id").reset_index(drop=True)
            salted = asof_join_orders_salted(
                _ds(events), _ds(orders), n_parts=4, how=how,
                salt_days=30).to_pandas() \
                .sort_values("event_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                plain[["event_id", "user_id", "ts", "o_orderkey",
                       "o_orderdate"]],
                salted[["event_id", "user_id", "ts", "o_orderkey",
                        "o_orderdate"]])


@pytest.mark.usefixtures("ray_session")
class TestIVF:
    def test_ivf_full_recall_on_clustered_data(self):
        """On genuinely clustered vectors the IVF coarse quantizer finds
        the true lists and recall@k vs brute force is perfect."""
        from pdf_extract_ray.ops.similarity import brute_force_topk, ivf_topk
        import ray
        rng = np.random.RandomState(11)
        centers = _normalize_rows(rng.normal(size=(4, 16)))
        vecs, ids = [], []
        for i in range(400):
            c = centers[i % 4]
            vecs.append((c + 0.05 * rng.normal(size=16)).tolist())
            ids.append(i)
        t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array(vecs, pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(t)
        qids = ids[:4]
        qvecs = np.asarray(vecs[:4], dtype=np.float64)
        exact = brute_force_topk(ds, qids, qvecs, k=5)
        approx = ivf_topk(ds, qids, qvecs, dim=16, k=5,
                          n_clusters=4, n_probe=1)

        def sets(tab):
            out = {}
            for q, n in zip(tab.column("query_id").to_pylist(),
                            tab.column("neighbor_id").to_pylist()):
                out.setdefault(q, set()).add(n)
            return out
        se, sa = sets(exact), sets(approx)
        for q in se:
            assert len(sa[q] & se[q]) / len(se[q]) >= 0.8

    def test_ivf_distributed_training_recall_10x(self):
        """Distributed k-means (kmeans_fit) at n_clusters=64 on a 10x
        corpus: recall@k vs brute force stays high (VERDICT r2 #3)."""
        from pdf_extract_ray.ops.similarity import brute_force_topk, ivf_topk
        import ray
        rng = np.random.RandomState(3)
        centers = _normalize_rows(rng.normal(size=(16, 16)))
        vecs = [(centers[i % 16] + 0.04 * rng.normal(size=16)).tolist()
                for i in range(4000)]
        ids = list(range(4000))
        t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                      "embedding": pa.array(vecs, pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(t).repartition(8)
        qids = ids[:3]
        qvecs = np.asarray(vecs[:3], dtype=np.float64)
        exact = brute_force_topk(ds, qids, qvecs, k=5)
        approx = ivf_topk(ds, qids, qvecs, dim=16, k=5,
                          n_clusters=64, n_probe=8)

        def sets(tab):
            out = {}
            for q, n in zip(tab.column("query_id").to_pylist(),
                            tab.column("neighbor_id").to_pylist()):
                out.setdefault(q, set()).add(n)
            return out
        se, sa = sets(exact), sets(approx)
        for q in se:
            assert len(sa[q] & se[q]) / len(se[q]) >= 0.8

    def test_ivf_total_on_empty_and_tiny_corpus(self):
        """ADVICE r2: ivf_topk must not raise on degenerate input —
        empty corpus and a corpus whose hash-sample selects no rows both
        fall back to the exact brute-force path."""
        from pdf_extract_ray.ops.similarity import ivf_topk
        import ray
        q = np.eye(1, 8, dtype=np.float64)
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "embedding": pa.array([], pa.list_(pa.float32()))})
        out = ivf_topk(ray.data.from_arrow(empty), [0], q, dim=8, k=3)
        assert out.num_rows == 0
        # vec_id 1 hashes outside the 11/97 sample window -> empty sample
        one = pa.table({"vec_id": pa.array([1], pa.int64()),
                        "embedding": pa.array([[1.0] * 8],
                                              pa.list_(pa.float32()))})
        out2 = ivf_topk(ray.data.from_arrow(one), [99], q, dim=8, k=3)
        assert out2.num_rows <= 1  # total, no raise


def _normalize_rows(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


@pytest.mark.usefixtures("ray_session")
class TestQuantileSketch:
    def test_quantiles_close_to_exact(self):
        from pdf_extract_ray.ops.sketch import approx_quantiles
        rng = np.random.RandomState(9)
        n = 20000
        vals = np.concatenate([rng.exponential(10.0, n // 2),
                               rng.normal(100.0, 5.0, n // 2)])
        g = ["a" if i % 2 else "b" for i in range(n)]
        t = pa.table({"g": pa.array(g, pa.string()),
                      "v": pa.array(vals, pa.float64())})
        out = approx_quantiles(_ds(t), "g", "v", (0.5, 0.95, 0.99)) \
            .to_pandas()
        import pandas as pd
        df = pd.DataFrame({"g": g, "v": vals})
        for _, row in out.iterrows():
            sub = df[df.g == row.g].v.to_numpy()
            # rank (CDF) error is the principled sketch metric: value
            # error blows up wherever the density has a gap (bimodal
            # p50) no matter how good the sketch is
            rank = (sub <= row.value).mean()
            assert abs(rank - row.q) < 0.01, (row.g, row.q, rank)


@pytest.mark.usefixtures("ray_session")
class TestSaltedSessionize:
    def test_boundary_merge_matches_plain(self):
        """A hot user whose session straddles the day-salt boundary: the
        two per-day partials must merge back into one session."""
        import ray
        from pdf_extract_ray.ops.events import sessionize, sessionize_salted
        us = lambda s: np.datetime64(s, "us").item()
        rows = [
            (1, us("2024-01-01T23:50:00")),  # session A, day 0
            (1, us("2024-01-02T00:05:00")),  # 15 min gap -> SAME session
            (1, us("2024-01-02T09:00:00")),  # new session
            (2, us("2024-01-01T10:00:00")),
            (2, us("2024-01-03T10:00:00")),  # bucket gap > threshold
        ]
        t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                      "ts": pa.array([r[1] for r in rows],
                                     pa.timestamp("us"))})
        plain = sessionize(ray.data.from_arrow(t), gap_minutes=30) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        salted = sessionize_salted(ray.data.from_arrow(t), gap_minutes=30) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        assert plain.equals(salted)
        got = dict(zip(plain.user_id, plain.n_sessions))
        assert got == {1: 2, 2: 2}


@pytest.mark.usefixtures("ray_session")
class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        from pdf_extract_ray.ops.sketch import bloom_build, bloom_contains
        seen = pa.table({"v": pa.array([f"doc-{i}" for i in range(5000)],
                                       pa.string())})
        bloom = bloom_build(_ds(seen), "v")
        probe = pa.table({"v": pa.array(
            [f"doc-{i}" for i in range(5000)]
            + [f"new-{i}" for i in range(5000)], pa.string())})
        out = bloom_contains(_ds(probe), "v", bloom).to_pandas()
        hits = dict(zip(out.v, out.maybe_seen))
        assert all(hits[f"doc-{i}"] for i in range(5000))  # no false negs
        fp = sum(hits[f"new-{i}"] for i in range(5000)) / 5000
        assert fp < 0.01, fp


@pytest.mark.usefixtures("ray_session")
class TestTpchShapes:
    """Hand-computed answers for the Q3/Q4/Q18/correlated-avg/LAG wave
    (the sf0.01 DuckDB oracle covers the same operators at scale)."""

    def _ts(self, s):
        return np.datetime64(s, "us").item()

    def test_shipping_priority(self):
        from pdf_extract_ray.ops.relational import shipping_priority
        ts = self._ts
        cust = pa.table({
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"],
                                     pa.string())})
        orders = pa.table({
            "o_orderkey": pa.array([10, 11, 12], pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderdate": pa.array(
                [ts("1998-01-01"), ts("1998-07-01"), ts("1998-01-01")],
                pa.timestamp("us"))})
        li = pa.table({
            "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0],
                                        pa.float64()),
            "l_discount": pa.array([0.1, 0.0, 0.0, 0.0], pa.float64()),
            "l_shipdate": pa.array(
                [ts("1998-07-01"), ts("1998-08-01"), ts("1998-07-02"),
                 ts("1998-07-02")], pa.timestamp("us"))})
        out = shipping_priority(_ds(cust), _ds(orders), _ds(li),
                                cutoff="1998-06-01").to_pandas()
        # order 11 is not open (placed after cutoff); order 12 is not
        # BUILDING; order 10 revenue = 10*0.9 + 20 = 29.0 -> 290000 c4
        assert list(out.o_orderkey) == [10]
        assert list(out.revenue_c4) == [290000]

    def test_order_priority_counts(self):
        from pdf_extract_ray.ops.relational import order_priority_counts
        ts = self._ts
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                [ts("1996-03-01"), ts("1996-03-01"), ts("1995-01-01")],
                pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH",
                                         "1-URGENT"], pa.string())})
        li = pa.table({
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_shipdate": pa.array(
                [ts("1996-04-01"),   # after orderdate -> counts
                 ts("1996-02-01"),   # before -> no
                 ts("1995-02-01")],  # order outside window
                pa.timestamp("us"))})
        out = order_priority_counts(_ds(orders), _ds(li)).to_pandas()
        got = dict(zip(out.o_orderpriority, out.n_orders))
        assert got == {"1-URGENT": 1}

    def test_large_volume_customers(self):
        from pdf_extract_ray.ops.relational import large_volume_customers
        ts = self._ts
        cust = pa.table({
            "c_custkey": pa.array([5, 6], pa.int64()),
            "c_name": pa.array(["five", "six"], pa.string())})
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([5, 6], pa.int64()),
            "o_orderdate": pa.array([ts("2000-01-01")] * 2,
                                    pa.timestamp("us")),
            "o_totalprice": pa.array([12.34, 1.0], pa.float64())})
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_quantity": pa.array([2.0, 3.0, 10.0], pa.float64())})
        out = large_volume_customers(_ds(cust), _ds(orders), _ds(li),
                                     min_qty=4).to_pandas()
        out = out.sort_values("o_orderkey").reset_index(drop=True)
        assert list(out.o_orderkey) == [1, 2]
        assert list(out.sum_qty) == [5, 10]
        assert list(out.totalprice_cents) == [1234, 100]
        assert list(out.c_name) == ["five", "six"]

    def test_orders_above_customer_avg(self):
        from pdf_extract_ray.ops.relational import \
            orders_above_customer_avg
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 8], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0],
                                     pa.float64())})
        out = orders_above_customer_avg(_ds(orders)).to_pandas()
        # user 7 avg = 20 -> only order 3 strictly above; user 8's single
        # order equals its own avg exactly -> excluded in both engines
        assert list(out.o_orderkey) == [3]
        assert list(out.totalprice_cents) == [3000]

    def test_event_gaps(self):
        from pdf_extract_ray.ops.events import event_gaps
        ts = self._ts
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 8, 7], pa.int64()),
            "ts": pa.array(
                [ts("2024-01-01T00:00:00"), ts("2024-01-01T00:00:05"),
                 ts("2024-01-01T00:00:00"), ts("2024-01-01T00:01:05")],
                pa.timestamp("us"))})
        out = event_gaps(_ds(ev)).to_pandas()
        got = dict(zip(out.event_id, out.gap_us))
        assert got == {1: -1, 2: 5_000_000, 3: -1, 4: 60_000_000}


@pytest.mark.usefixtures("ray_session")
class TestGroupedValueRanks:
    def test_ranks_match_window_semantics(self):
        from pdf_extract_ray.ops.analytics import grouped_value_ranks
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "source": pa.array(["a", "a", "a", "a", "b", "b"],
                               pa.string()),
            "n_chars": pa.array([10, 10, 20, 5, 7, 7], pa.int64())})
        out = grouped_value_ranks(_ds(tbl), "source", "n_chars",
                                  "doc_id").to_pandas()
        got = {int(r.doc_id): (int(r.rnk), int(r.dense_rnk))
               for r in out.itertuples()}
        # a: 5 -> (1,1); 10,10 -> (2,2); 20 -> (4,3); b: 7,7 -> (1,1)
        assert got == {4: (1, 1), 1: (2, 2), 2: (2, 2), 3: (4, 3),
                       5: (1, 1), 6: (1, 1)}


@pytest.mark.usefixtures("ray_session")
class TestPercentilesModeSetOps:
    def test_grouped_percentiles_disc_semantics(self):
        from pdf_extract_ray.ops.analytics import grouped_percentiles
        tbl = pa.table({
            "source": pa.array(["a"] * 4 + ["b"] * 5, pa.string()),
            "n_chars": pa.array([1, 2, 3, 4, 10, 20, 30, 40, 50],
                                pa.int64())})
        out = grouped_percentiles(_ds(tbl), "source", "n_chars") \
            .to_pandas().set_index("source")
        # DuckDB quantile_disc: element at ceil(q*n)-1 (0-based)
        assert list(out.loc["a", ["p25", "p50", "p75", "p95"]]) == \
            [1, 2, 3, 4]
        assert list(out.loc["b", ["p25", "p50", "p75", "p95"]]) == \
            [20, 30, 40, 50]

    def test_grouped_mode_tie_breaks_smallest(self):
        from pdf_extract_ray.ops.analytics import grouped_mode
        tbl = pa.table({
            "source": pa.array(["a"] * 5, pa.string()),
            "n_chars": pa.array([7, 7, 3, 3, 9], pa.int64())})
        out = grouped_mode(_ds(tbl), "source", "n_chars").to_pandas()
        assert int(out.mode_value.iloc[0]) == 3     # tie 2-2 -> smaller
        assert int(out.n_occurrences.iloc[0]) == 2

    def test_shared_ids_intersect(self):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "entry_mod2", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        out = m._q_shared_user_ids("/root/testdata/sf0.001").to_pandas()
        import duckdb
        exp = duckdb.sql("""
            SELECT user_id
            FROM read_parquet('/root/testdata/sf0.001/events.parquet')
            INTERSECT
            SELECT o_custkey
            FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
        """).df()
        assert sorted(out.user_id) == sorted(exp.user_id)


@pytest.mark.usefixtures("ray_session")
class TestEventWindows2:
    def _ev(self):
        ts = lambda s: np.datetime64(s, "us").item()
        return pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array(
                [ts("2024-01-01T00:00:00"), ts("2024-01-01T00:01:00"),
                 ts("2024-01-01T00:02:00"), ts("2024-01-01T00:00:00"),
                 ts("2024-01-01T00:00:00")], pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "a", "c", "a"],
                                   pa.string())})

    def test_event_transitions(self):
        from pdf_extract_ray.ops.events import event_transitions
        out = event_transitions(_ds(self._ev())).to_pandas()
        got = {(r.prev_type, r.event_type): int(r.n_transitions)
               for r in out.itertuples()}
        # user7: a->b, b->a ; user8 (tie ts, event_id order): c->a
        assert got == {("a", "b"): 1, ("b", "a"): 1, ("c", "a"): 1}

    def test_latest_event_per_user(self):
        from pdf_extract_ray.ops.events import latest_event_per_user
        out = latest_event_per_user(_ds(self._ev())).to_pandas()
        got = {int(r.user_id): int(r.event_id) for r in out.itertuples()}
        # user 7: latest ts -> event 3; user 8: ts tie -> max event_id 5
        assert got == {7: 3, 8: 5}


@pytest.mark.usefixtures("ray_session")
class TestWave4Ops:
    def test_window3_sums(self):
        from pdf_extract_ray.ops.events import window3_sums
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array([ts("2024-01-01T00:00:00"),
                            ts("2024-01-01T00:01:00"),
                            ts("2024-01-01T00:02:00"),
                            ts("2024-01-01T00:03:00"),
                            ts("2024-01-01T00:00:00"),
                            ts("2024-01-01T00:01:00")],
                           pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 0.5, 0.25],
                              pa.float64())})
        out = window3_sums(_ds(ev)).to_pandas()
        got = {int(r.event_id): int(r.w_sum_cents)
               for r in out.itertuples()}
        # user 7: 100, 100+200, 100+200+400, 200+400+800 (frame of 3)
        # user 8: 50, 50+25 (window never crosses users)
        assert got == {1: 100, 2: 300, 3: 700, 4: 1400, 5: 50, 6: 75}

    def test_grouped_quartiles_cont(self):
        from pdf_extract_ray.ops.analytics import grouped_quartiles_cont
        t = pa.table({
            "source": pa.array(["s"] * 4 + ["t"] * 3, pa.string()),
            "n_chars": pa.array([10, 20, 30, 40, 1, 2, 4], pa.int64())})
        out = grouped_quartiles_cont(_ds(t), "source", "n_chars") \
            .to_pandas().set_index("source")
        # s (n=4): q1 at pos 0.75 -> 17.5 (x4=70); q2 at 1.5 -> 25
        # (x4=100); q3 at 2.25 -> 32.5 (x4=130)
        assert list(out.loc["s", ["q1_x4", "q2_x4", "q3_x4"]]) \
            == [70, 100, 130]
        # t (n=3): q1 at pos 0.5 -> 1.5 (x4=6); q2 -> 2 (8); q3 at
        # pos 1.5 -> 3 (12)
        assert list(out.loc["t", ["q1_x4", "q2_x4", "q3_x4"]]) \
            == [6, 8, 12]

    def test_grouped_corr(self):
        from pdf_extract_ray.ops.analytics import grouped_corr
        t = pa.table({
            "g": pa.array(["a"] * 3 + ["b"] * 3 + ["c"] * 2, pa.string()),
            "x": pa.array([1, 2, 3, 1, 2, 3, 5, 5], pa.int64()),
            "y": pa.array([2, 4, 6, 6, 4, 2, 1, 9], pa.int64())})
        out = grouped_corr(_ds(t), "g", "x", "y").to_pandas() \
            .set_index("g")["corr_xy"]
        assert out.loc["a"] == pytest.approx(1.0)
        assert out.loc["b"] == pytest.approx(-1.0)
        # group c: x constant -> zero variance -> dropped
        assert "c" not in out.index

    def test_customer_order_distribution(self):
        from pdf_extract_ray.ops.relational import \
            customer_order_distribution
        cust = pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
        orders = pa.table({
            "o_custkey": pa.array([1, 1, 2, 99], pa.int64())})
        out = customer_order_distribution(_ds(cust), _ds(orders)) \
            .to_pandas()
        got = {int(r.n_orders): int(r.n_customers)
               for r in out.itertuples()}
        # cust 1 has 2 orders, cust 2 has 1, custs 3+4 have 0; the
        # orphan order custkey 99 must NOT count
        assert got == {0: 2, 1: 1, 2: 1}

    def test_brand_supplier_distinct(self):
        from pdf_extract_ray.ops.relational import brand_supplier_distinct
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["B1", "B1", "B2"], pa.string())})
        li = pa.table({
            "l_partkey": pa.array([1, 1, 2, 3, 3, 7], pa.int64()),
            "l_suppkey": pa.array([10, 10, 11, 10, 12, 13], pa.int64())})
        out = brand_supplier_distinct(_ds(li), _ds(part)).to_pandas()
        got = {r.p_brand: int(r.n_suppliers) for r in out.itertuples()}
        # B1: suppliers {10, 11}; B2: {10, 12}; partkey 7 has no part
        # row and drops
        assert got == {"B1": 2, "B2": 2}

    def test_rich_quiet_customers(self):
        from pdf_extract_ray.ops.relational import rich_quiet_customers
        cust = pa.table({
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_nationkey": pa.array([0, 0, 1, 1, 1], pa.int32()),
            "c_acctbal": pa.array([100.0, 100.0, 100.0, 100.0, -50.0],
                                  pa.float64())})
        # avg positive balance = 100 -> nobody strictly above; shift
        # one balance up to make custs 1..2 the rich set
        cust = pa.table({
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_nationkey": pa.array([0, 1, 1, 1, 1], pa.int32()),
            "c_acctbal": pa.array([200.0, 200.0, 10.0, 10.0, -50.0],
                                  pa.float64())})
        orders = pa.table({
            "o_custkey": pa.array([2, 3], pa.int64()),
            "o_totalprice": pa.array([999999.0, 5.0], pa.float64())})
        out = rich_quiet_customers(_ds(cust), _ds(orders),
                                   big_order_total=1000.0).to_pandas()
        # rich (cents*n > total): 1 and 2 (avg=105); 2 has a big order
        # -> quiet rich = {1} in nation 0
        got = {int(r.nationkey): (int(r.n_customers),
                                  int(r.total_acctbal_cents))
               for r in out.itertuples()}
        assert got == {0: (1, 20000)}


@pytest.mark.usefixtures("ray_session")
class TestTpchShapes2:
    def _li(self):
        ts = lambda s: np.datetime64(s, "us").item()
        return pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_partkey": pa.array([10, 11, 10, 12], pa.int64()),
            "l_suppkey": pa.array([5, 6, 5, 6], pa.int64()),
            "l_quantity": pa.array([10.0, 25.0, 15.0, 40.0],
                                   pa.float64()),
            "l_extendedprice": pa.array([100.0, 200.0, 50.0, 400.0],
                                        pa.float64()),
            "l_discount": pa.array([0.0, 0.1, 0.0, 0.5], pa.float64()),
            "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string()),
            "l_shipdate": pa.array(
                [ts("1996-02-01"), ts("1996-02-01"), ts("1996-03-01"),
                 ts("1999-01-01")], pa.timestamp("us"))})

    def test_top_supplier_revenue(self):
        from pdf_extract_ray.ops.relational import top_supplier_revenue
        supp = pa.table({
            "s_suppkey": pa.array([5, 6], pa.int64()),
            "s_name": pa.array(["s5", "s6"], pa.string())})
        out = top_supplier_revenue(_ds(self._li()), _ds(supp)) \
            .to_pandas()
        # window [1996-01-01, 1996-04-01): supp 5 rev = (10000+5000)*100
        # = 1.5e6 c4; supp 6 rev = 20000*90 = 1.8e6 c4 -> supp 6 wins
        assert len(out) == 1
        r = out.iloc[0]
        assert (int(r.s_suppkey), r.s_name, int(r.total_revenue_c4)) \
            == (6, "s6", 1_800_000)

    def test_top_return_customers(self):
        from pdf_extract_ray.ops.relational import top_return_customers
        ts = lambda s: np.datetime64(s, "us").item()
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([100, 101, 100], pa.int64()),
            "o_orderdate": pa.array(
                [ts("1996-01-15"), ts("1996-02-15"), ts("1999-05-01")],
                pa.timestamp("us"))})
        cust = pa.table({
            "c_custkey": pa.array([100, 101], pa.int64()),
            "c_name": pa.array(["c100", "c101"], pa.string())})
        out = top_return_customers(_ds(cust), _ds(orders),
                                   _ds(self._li()), k=5).to_pandas()
        got = {int(r.c_custkey): (r.c_name, int(r.revenue_c4))
               for r in out.itertuples()}
        # R rows in-window: order1 line1 (cust 100, 10000*100), order2
        # line (cust 101, 5000*100); order3 is out of window
        assert got == {100: ("c100", 1_000_000),
                       101: ("c101", 500_000)}

    def test_min_cost_supplier_per_part(self):
        from pdf_extract_ray.ops.relational import \
            min_cost_supplier_per_part
        supp = pa.table({
            "s_suppkey": pa.array([5, 6], pa.int64()),
            "s_acctbal": pa.array([50.0, 10.0], pa.float64())})
        out = min_cost_supplier_per_part(_ds(self._li()), _ds(supp)) \
            .to_pandas()
        got = {int(r.partkey): (int(r.suppkey), int(r.acctbal_cents))
               for r in out.itertuples()}
        # part 10 shipped by 5 only; part 11 by 6; part 12 by 6
        assert got == {10: (5, 5000), 11: (6, 1000), 12: (6, 1000)}

    def test_disjunctive_part_revenue(self):
        from pdf_extract_ray.ops.relational import \
            disjunctive_part_revenue
        part = pa.table({
            "p_partkey": pa.array([10, 11, 12], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#1"],
                                pa.string()),
            "p_size": pa.array([5, 20, 40], pa.int32())})
        out = disjunctive_part_revenue(_ds(self._li()), _ds(part)) \
            .to_pandas().iloc[0]
        # clause1 (Brand#1, size<=10, qty<=20): lines 1 (part10 qty10,
        # 10000*100) and 3 (part10 qty15, 5000*100); clause2 (Brand#2,
        # size<=25, qty<=30): line 2 (part11 qty25, 20000*90); line 4
        # fails both (part12 size 40, qty 40)
        assert int(out.revenue_c4) == 1_000_000 + 500_000 + 1_800_000
        assert int(out.n_items) == 3


@pytest.mark.usefixtures("ray_session")
class TestFunnel:
    def test_funnel_counts_windowed(self):
        from pdf_extract_ray.ops.events import funnel_counts
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
            "ts": pa.array([
                ts("2024-01-01T00:00:00"),   # u1 view
                ts("2024-01-01T01:00:00"),   # u1 click (in window)
                ts("2024-01-01T01:30:00"),   # u1 purchase (in window)
                ts("2024-01-01T00:00:00"),   # u2 view
                ts("2024-01-01T09:00:00"),   # u2 click (OUT of 6h)
                ts("2024-01-01T00:00:00"),   # u3 click only (no view)
                ts("2024-01-01T00:10:00"),   # u3 view
                ts("2024-01-01T00:05:00"),   # u3 purchase BEFORE click
            ], pa.timestamp("us")),
            "event_type": pa.array(
                ["view", "click", "purchase", "view", "click",
                 "click", "view", "purchase"], pa.string())})
        out = funnel_counts(_ds(ev), steps=("view", "click", "purchase"),
                            window_hours=6).to_pandas()
        got = {int(r.step): int(r.n_users) for r in out.itertuples()}
        # u1 completes all three; u2 stops at view (click too late);
        # u3 has a view but no click AFTER it -> step1 only
        assert got == {1: 3, 2: 1, 3: 1}

    def test_funnel_strict_ordering(self):
        from pdf_extract_ray.ops.events import funnel_counts
        ts = lambda s: np.datetime64(s, "us").item()
        # click exactly AT the view timestamp must NOT count (strict >)
        ev = pa.table({
            "user_id": pa.array([9, 9], pa.int64()),
            "ts": pa.array([ts("2024-01-01T00:00:00"),
                            ts("2024-01-01T00:00:00")],
                           pa.timestamp("us")),
            "event_type": pa.array(["view", "click"], pa.string())})
        out = funnel_counts(_ds(ev), steps=("view", "click"),
                            window_hours=6).to_pandas()
        got = {int(r.step): int(r.n_users) for r in out.itertuples()}
        assert got == {1: 1, 2: 0}


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_range_join_counts(self):
        from pdf_extract_ray.ops.relational import range_join_counts
        ts = lambda s: np.datetime64(s, "us").item()
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 7, 8], pa.int64()),
            "o_orderdate": pa.array(
                [ts("2024-01-01T00:00:00"), ts("2024-01-02T00:00:00"),
                 ts("2024-01-01T00:00:00")], pa.timestamp("us"))})
        events = pa.table({
            "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
            "ts": pa.array([
                ts("2024-01-01T00:00:00"),  # == o1 start: counted (>=)
                ts("2024-01-01T23:59:59"),  # inside o1's day
                ts("2024-01-02T00:00:00"),  # == o1 window end:
                                            # excluded there, counts
                                            # for o2 (its start)
                ts("2023-12-31T23:59:59"),  # before o1
                ts("2024-01-01T12:00:00"),  # user 9: nobody's order
            ], pa.timestamp("us"))})
        out = range_join_counts(_ds(orders), _ds(events),
                                window_hours=24).to_pandas()
        got = {int(r.o_orderkey): int(r.n_events)
               for r in out.itertuples()}
        # o1 (u7, Jan1): events at 00:00 and 23:59:59 -> 2 (boundary
        # event at Jan2 00:00 is exclusive); o2 (u7, Jan2): 1;
        # o3 (u8): no events for user 8 -> 0 (LEFT semantics)
        assert got == {1: 2, 2: 1, 3: 0}


@pytest.mark.usefixtures("ray_session")
class TestGroupedMad:
    def test_exact_x4_units(self):
        from pdf_extract_ray.ops.analytics import grouped_mad
        t = pa.table({
            "source": pa.array(["a"] * 5 + ["b"] * 4, pa.string()),
            "n_chars": pa.array([1, 2, 3, 4, 100, 10, 20, 30, 40],
                                pa.int64())})
        out = grouped_mad(_ds(t), "source", "n_chars").to_pandas() \
            .set_index("source")["mad_x4"]
        # a: median 3 -> devs |x-3| = [2,1,0,1,97] -> MAD 1 -> x4 = 4
        assert int(out.loc["a"]) == 4
        # b: median 25 -> devs [15,5,5,15] -> MAD 10 -> x4 = 40
        assert int(out.loc["b"]) == 40


@pytest.mark.usefixtures("ray_session")
class TestNtileAndQ17Wave:
    def test_ntile_split_and_tie_order(self):
        """SQL NTILE: first n%k tiles take ceil(n/k) rows; order is the
        deterministic (value, id) total order, so equal values fall to
        tiles by doc id."""
        from pdf_extract_ray.ops.analytics import grouped_ntile
        # group a: n=6, k=4 -> tile sizes 2,2,1,1 over order
        #   (5,#4) (7,#6) (7,#9) (10,#1) (10,#2) (20,#3)
        # group b: n=3, k=4 -> sizes 1,1,1 (tile 4 empty)
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 6, 9, 11, 12, 13],
                               pa.int64()),
            "source": pa.array(["a"] * 6 + ["b"] * 3, pa.string()),
            "n_chars": pa.array([10, 10, 20, 5, 7, 7, 8, 8, 1],
                                pa.int64())})
        out = grouped_ntile(_ds(tbl), "source", "n_chars", "doc_id",
                            k=4).to_pandas()
        got = {int(r.doc_id): int(r.tile) for r in out.itertuples()}
        assert got == {4: 1, 6: 1, 9: 2, 1: 2, 2: 3, 3: 4,
                       13: 1, 11: 2, 12: 3}

    def test_small_qty_revenue_boundary_exact(self):
        """The 20%-of-average gate is strict: qty*5*n == sum_qty must
        NOT count (matches SQL's l_quantity < 0.2*avg)."""
        from pdf_extract_ray.ops.relational import small_qty_revenue
        # part 1: qtys [1, 4, 5] sum=10 n=3 -> gate 15*q < 30 wait:
        #   5*q*n < sq -> q=1: 15<10? no. Use qtys [1, 9]: sq=10 n=2,
        #   5*1*2=10 == 10 -> excluded (boundary); [1, 14]: 10 < 15 in.
        li = pa.table({
            "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_quantity": pa.array([1.0, 9.0, 1.0, 14.0, 8.0]),
            "l_extendedprice": pa.array([10.0, 1.0, 7.5, 1.0, 1.0])})
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#13", "Brand#13", "Brand#9"],
                                pa.string())})
        out = small_qty_revenue(_ds(li), _ds(part),
                                brand="Brand#13").to_pandas()
        # part1 qty1: 5*1*2=10 == 10 -> out; part2 qty1: 10 < 15 -> in
        # part3 filtered by brand
        assert int(out.n_small.iloc[0]) == 1
        assert int(out.revenue_cents.iloc[0]) == 750

    def test_forecast_revenue_exact_ints(self):
        from pdf_extract_ray.ops.relational import forecast_revenue
        li = pa.table({
            "l_shipdate": pa.array(
                [np.datetime64("1996-06-01", "us")] * 3
                + [np.datetime64("1997-06-01", "us")],
                pa.timestamp("us")),
            "l_quantity": pa.array([10.0, 30.0, 5.0, 5.0]),
            "l_discount": pa.array([0.06, 0.06, 0.04, 0.06]),
            "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0])})
        out = forecast_revenue(_ds(li)).to_pandas()
        # only row 1 passes (row 2 qty>=24, row 3 disc 4, row 4 date)
        assert int(out.n_rows.iloc[0]) == 1
        assert int(out.revenue_c4.iloc[0]) == 10000 * 6


@pytest.mark.usefixtures("ray_session")
class TestLateShipmentWave:
    def test_late_priority_strict_boundary(self):
        """Exactly 60 days after the order date is NOT late (strict >)."""
        from pdf_extract_ray.ops.relational import late_priority_counts
        d0 = np.datetime64("1995-01-01", "us")
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_returnflag": pa.array(["A", "A", "N"], pa.string()),
            "l_shipdate": pa.array(
                [d0 + np.timedelta64(60, "D"),     # boundary: not late
                 d0 + np.timedelta64(61, "D"),     # late
                 d0 + np.timedelta64(90, "D")],    # late
                pa.timestamp("us"))})
        orders = pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": pa.array([d0, d0], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"],
                                        pa.string())})
        out = late_priority_counts(_ds(li), _ds(orders)).to_pandas() \
            .set_index("l_returnflag")
        assert int(out.loc["A", "n_high_late"]) == 1
        assert int(out.loc["A", "n_low_late"]) == 0
        assert int(out.loc["N", "n_low_late"]) == 1

    def test_sole_late_supplier_set_logic(self):
        """Only multi-supplier finished orders with EXACTLY one late
        supplier count; two late lineitems of the same supplier are one
        late supplier."""
        from pdf_extract_ray.ops.relational import sole_late_supplier
        d0 = np.datetime64("1995-01-01", "us")
        late = d0 + np.timedelta64(91, "D")
        ok = d0 + np.timedelta64(10, "D")
        li = pa.table({
            #  o1: supp 7 late twice, supp 8 on time -> counts for 7
            #  o2: single-supplier order, late       -> excluded (ns<2)
            #  o3: both suppliers late               -> excluded (nl=2)
            #  o4: status 'O'                        -> excluded
            "l_orderkey": pa.array([1, 1, 1, 2, 3, 3, 4, 4], pa.int64()),
            "l_suppkey": pa.array([7, 7, 8, 7, 7, 8, 7, 8], pa.int64()),
            "l_shipdate": pa.array(
                [late, late, ok, late, late, late, late, ok],
                pa.timestamp("us"))})
        orders = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "F", "O"], pa.string()),
            "o_orderdate": pa.array([d0] * 4, pa.timestamp("us"))})
        out = sole_late_supplier(_ds(li), _ds(orders)).to_pandas()
        assert {int(r.s_suppkey): int(r.numwait)
                for r in out.itertuples()} == {7: 1}

    def test_pct_rank_singleton_and_ties(self):
        from pdf_extract_ray.ops.analytics import grouped_pct_ranks
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "source": pa.array(["a", "a", "a", "a", "b"], pa.string()),
            "n_chars": pa.array([10, 10, 20, 30, 99], pa.int64())})
        out = grouped_pct_ranks(_ds(tbl), "source", "n_chars",
                                "doc_id").to_pandas().set_index("doc_id")
        # group a (n=4): ranks 1,1,3,4 -> pct (r-1)/3; cume 2/4,2/4,3/4,1
        assert out.loc[1, "pct_rank"] == 0.0
        assert out.loc[2, "pct_rank"] == 0.0
        assert out.loc[3, "pct_rank"] == pytest.approx(2 / 3, abs=0)
        assert out.loc[4, "pct_rank"] == 1.0
        assert out.loc[1, "cume_dist"] == 0.5
        assert out.loc[3, "cume_dist"] == 0.75
        # singleton group: pct_rank 0, cume_dist 1 (SQL convention)
        assert out.loc[5, "pct_rank"] == 0.0
        assert out.loc[5, "cume_dist"] == 1.0


@pytest.mark.usefixtures("ray_session")
class TestFirstLastSkewClusters:
    def test_user_first_last_tiebreak_and_singleton(self):
        from pdf_extract_ray.ops.events import user_first_last
        t0 = np.datetime64("2024-01-01T00:00:00", "us")
        tbl = pa.table({
            # user 1: ties on ts -> event_id breaks (first=eid 2, last=
            # eid 5); user 2: single event
            "event_id": pa.array([5, 2, 3, 9], pa.int64()),
            "ts": pa.array([t0, t0, t0 - np.timedelta64(1, "h"), t0],
                           pa.timestamp("us")).take([1, 1, 3, 3])
            if False else pa.array(
                [t0, t0, t0, t0 + np.timedelta64(1, "h")],
                pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["c", "a", "b", "z"], pa.string())})
        out = user_first_last(_ds(tbl)).to_pandas().set_index("user_id")
        assert out.loc[1, "first_type"] == "a"   # eid 2 wins the tie
        assert out.loc[1, "last_type"] == "c"    # eid 5 is last
        assert out.loc[2, "first_type"] == "z"
        assert out.loc[2, "last_type"] == "z"

    def test_grouped_skew_bigint_path_matches_fast_path(self):
        """Values > 1e6 force the python-int partial; both paths give
        the same float because the merge math is exact either way."""
        from pdf_extract_ray.ops.analytics import grouped_skew
        small = [10, 20, 20, 90]
        scale = 10_000_000
        big = [v * scale for v in small]
        t1 = pa.table({"source": pa.array(["s"] * 4, pa.string()),
                       "n_chars": pa.array(small, pa.int64())})
        t2 = pa.table({"source": pa.array(["s"] * 4, pa.string()),
                       "n_chars": pa.array(big, pa.int64())})
        a = grouped_skew(_ds(t1), "source", "n_chars").to_pandas()
        b = grouped_skew(_ds(t2), "source", "n_chars").to_pandas()
        # skewness is scale-invariant; both must equal the numpy value
        x = np.array(small, np.float64)
        m = x.mean()
        expect = ((x - m) ** 3).mean() / (((x - m) ** 2).mean() ** 1.5)
        assert float(a["skew"].iloc[0]) == pytest.approx(expect, rel=1e-12)
        assert float(b["skew"].iloc[0]) == pytest.approx(
            float(a["skew"].iloc[0]), rel=1e-12)

    def test_grouped_skew_zero_variance_dropped(self):
        from pdf_extract_ray.ops.analytics import grouped_skew
        tbl = pa.table({"source": pa.array(["c", "c"], pa.string()),
                        "n_chars": pa.array([7, 7], pa.int64())})
        out = grouped_skew(_ds(tbl), "source", "n_chars").to_pandas()
        assert len(out) == 0

    def test_kmeans_assign_nearest_and_deterministic(self):
        from pdf_extract_ray.ops.similarity import (kmeans_assign,
                                                    kmeans_fit)
        rng = np.random.RandomState(7)
        # three tight clusters on distinct axes
        base = np.eye(3)
        vecs = np.repeat(base, 40, axis=0) + rng.normal(
            0, 0.05, (120, 3))
        tbl = pa.table({
            "vec_id": pa.array(np.arange(120), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs])})
        cent = kmeans_fit(_ds(tbl), k=3, iters=5, sample_keep=97,
                          sample_mod=97)  # keep every row
        out1 = kmeans_assign(_ds(tbl), cent).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        out2 = kmeans_assign(_ds(tbl), cent).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert out1.equals(out2)
        # every true cluster maps to one label, and labels differ
        lab = out1.cluster.to_numpy()
        g = [set(lab[i * 40:(i + 1) * 40]) for i in range(3)]
        assert all(len(s) == 1 for s in g)
        assert len(set.union(*g)) == 3
        # nearest-centroid invariant
        cm = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        assert (np.argmax(vn @ cm.T, axis=1) == lab).all()


@pytest.mark.usefixtures("ray_session")
class TestQ11Q20Shapes:
    def test_significant_parts_mean_gate_strict(self):
        """Gate is strict >: a part exactly AT mean_mult x mean is out."""
        from pdf_extract_ray.ops.relational import significant_parts
        # nation-3 suppliers: 7, 8.  values (c4 = price_c2 * 100 at
        # disc 0): parts 1..4 -> 100, 100, 100, 500 -> total 800,
        # n=4, gate: 4*v > 2*800 -> v > 400 -> only part 4.
        li = pa.table({
            "l_partkey": pa.array([1, 2, 3, 4, 9], pa.int64()),
            "l_suppkey": pa.array([7, 7, 8, 8, 5], pa.int64()),
            "l_extendedprice": pa.array([1.0, 1.0, 1.0, 5.0, 99.0]),
            "l_discount": pa.array([0.0] * 5)})
        supp = pa.table({
            "s_suppkey": pa.array([5, 7, 8], pa.int64()),
            "s_nationkey": pa.array([1, 3, 3], pa.int64())})
        out = significant_parts(_ds(li), _ds(supp), nation_key=3,
                                mean_mult=2).to_pandas()
        assert out.p_partkey.tolist() == [4]
        # exactly at the boundary: make part 4 worth 400 -> empty…
        li2 = pa.table({
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_suppkey": pa.array([7, 7], pa.int64()),
            "l_extendedprice": pa.array([1.0, 1.0]),
            "l_discount": pa.array([0.0, 0.0])})
        out2 = significant_parts(_ds(li2), _ds(supp), nation_key=3,
                                 mean_mult=2).to_pandas()
        assert len(out2) == 0  # both parts equal the mean, 2x gate out

    def test_dominant_suppliers_share_gate(self):
        from pdf_extract_ray.ops.relational import dominant_suppliers
        # part 1: qtys supp7=30, supp8=70 -> shares 30/70%; with
        # share_inv=2 (majority) only supp8; boundary: part 2 split
        # 50/50 -> nobody (strict >)
        li = pa.table({
            "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([7, 8, 7, 8], pa.int64()),
            "l_quantity": pa.array([30.0, 70.0, 5.0, 5.0])})
        out = dominant_suppliers(_ds(li), share_inv=2).to_pandas()
        assert {int(r.s_suppkey): int(r.n_parts_dominated)
                for r in out.itertuples()} == {8: 1}


@pytest.mark.usefixtures("ray_session")
class TestSourceVocabStats:
    def test_counts_and_ttr(self):
        from pdf_extract_ray.ops.analytics import source_vocab_stats
        tbl = pa.table({
            "source": pa.array(["a", "a", "b"], pa.string()),
            "text": pa.array(["x y  x", "y z", ""], pa.string())})
        out = source_vocab_stats(_ds(tbl)).to_pandas() \
            .set_index("source")
        # source a: words x,y,x,y,z -> n=5, distinct {x,y,z}=3
        assert int(out.loc["a", "n_words"]) == 5
        assert int(out.loc["a", "n_distinct"]) == 3
        assert float(out.loc["a", "ttr"]) == 3.0 / 5.0
        # source b: empty text -> no words -> no row
        assert "b" not in out.index


@pytest.mark.usefixtures("ray_session")
class TestRangeWindowSums:
    def test_hand_computed_with_peers_and_boundary(self):
        from pdf_extract_ray.ops.events import range_window_sums
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array([
                ts("2024-01-01T00:00:00"),   # 1
                ts("2024-01-01T00:30:00"),   # 2: 1+2
                ts("2024-01-01T01:00:00"),   # 3: boundary INCLUSIVE 1+2+4
                ts("2024-01-01T01:00:00"),   # 4: ts PEER of 3 -> same set
                ts("2024-01-01T02:00:01"),   # 5: window empty of others
                ts("2024-01-01T00:00:00"),   # 6: other user
                ts("2024-01-01T00:59:59"),   # 7: inside window
            ], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 0.5, 0.25],
                              pa.float64())})
        out = range_window_sums(_ds(ev)).to_pandas()
        got = {int(r.event_id): int(r.win_cents) for r in out.itertuples()}
        # RANGE frame: peers of the current ts are in-frame BOTH ways —
        # events 3 and 4 (same user, same ts) each see 1+2+4+8
        assert got == {1: 100, 2: 300, 3: 1500, 4: 1500, 5: 1600,
                       6: 50, 7: 75}

    def test_matches_naive_on_random(self):
        from pdf_extract_ray.ops.events import range_window_sums
        rng = np.random.RandomState(11)
        n = 400
        base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
        tsv = base + rng.randint(0, 6 * 3600, n) * 1_000_000
        ev = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.randint(0, 5, n).astype(np.int64)),
            "ts": pa.array(tsv, pa.timestamp("us")),
            "value": pa.array(np.round(rng.uniform(0, 50, n), 2),
                              pa.float64())})
        out = range_window_sums(_ds(ev)).to_pandas() \
            .set_index("event_id").win_cents
        users = ev.column("user_id").to_numpy()
        cents = np.round(ev.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        win = 3600 * 1_000_000
        for i in range(n):
            mask = (users == users[i]) & (tsv >= tsv[i] - win) \
                & (tsv <= tsv[i])
            assert out.loc[i] == cents[mask].sum(), i


@pytest.mark.usefixtures("ray_session")
class TestGroupedHistogram:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.analytics import grouped_histogram
        t = pa.table({
            "source": pa.array(["a", "a", "a", "b", "b"]),
            "n_chars": pa.array([5, 99, 100, 250, 251], pa.int64())})
        out = grouped_histogram(_ds(t), "source", "n_chars",
                                bucket_width=100).to_pandas()
        got = {(r.source, int(r.bucket)): int(r.n_rows)
               for r in out.itertuples()}
        assert got == {("a", 0): 2, ("a", 1): 1, ("b", 2): 2}


@pytest.mark.usefixtures("ray_session")
class TestGroupedRegression:
    def test_matches_numpy_lstsq(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import grouped_regression
        rng = np.random.default_rng(7)
        x = rng.integers(1, 1000, 200)
        y = (3 * x + 17 + rng.integers(-50, 50, 200)).astype(np.int64)
        tbl = pa.table({"g": pa.array(["a"] * 200, pa.string()),
                        "x": pa.array(x, pa.int64()),
                        "y": pa.array(y, pa.int64())})
        out = grouped_regression(_ds(tbl), "g", "x", "y").to_pandas()
        slope, intercept = np.polyfit(x.astype(float),
                                      y.astype(float), 1)
        assert abs(float(out.slope[0]) - slope) < 1e-9
        assert abs(float(out.intercept[0]) - intercept) < 1e-6

    def test_zero_variance_group_dropped(self):
        from pdf_extract_ray.ops.analytics import grouped_regression
        tbl = pa.table({"g": pa.array(["z", "z", "ok", "ok"], pa.string()),
                        "x": pa.array([5, 5, 1, 2], pa.int64()),
                        "y": pa.array([1, 9, 10, 20], pa.int64())})
        out = grouped_regression(_ds(tbl), "g", "x", "y").to_pandas()
        assert list(out.g) == ["ok"]
        assert abs(float(out.slope[0]) - 10.0) < 1e-12


@pytest.mark.usefixtures("ray_session")
class TestBloomSemiRevenue:
    def test_fp_recheck_keeps_result_exact(self):
        """Deliberately undersized filter (64 bits, 500 alien keys) ->
        false positives guaranteed; the partition-level exact re-check
        must still produce the true join result."""
        import numpy as np
        from pdf_extract_ray.ops.relational import bloom_semi_revenue
        n_alien = 500
        li = pa.table({
            "l_partkey": pa.array(
                [1, 2, 1] + list(range(1000, 1000 + n_alien)),
                pa.int64()),
            "l_extendedprice": pa.array(
                [100.0, 200.0, 50.0] + [10.0] * n_alien, pa.float64()),
            "l_discount": pa.array(
                [0.0, 0.1, 0.0] + [0.0] * n_alien, pa.float64())})
        part = pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["B1", "B2", "B1"], pa.string()),
            "p_size": pa.array([5, 5, 50], pa.int64())})
        out = bloom_semi_revenue(_ds(li), _ds(part), max_size=10,
                                 m_bits=64, k=2).to_pandas() \
            .set_index("p_brand").sort_index()
        # B1: part 1 -> 100*100*100 + 50*100*100 ; B2: 200*100*90
        assert int(out.loc["B1", "revenue_c4"]) == 150_00 * 100
        assert int(out.loc["B1", "n_items"]) == 2
        assert int(out.loc["B2", "revenue_c4"]) == 200_00 * 90
        assert int(out.loc["B2", "n_items"]) == 1
        assert list(out.index) == ["B1", "B2"]


@pytest.mark.usefixtures("ray_session")
class TestRollingMedian:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.events import rolling_median
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array([ts(f"2024-01-01T00:0{i}:00")
                            for i in range(6)]
                           + [ts("2024-01-01T00:00:00"),
                              ts("2024-01-01T00:01:00")],
                           pa.timestamp("us")),
            "value": pa.array([5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 0.5, 0.25],
                              pa.float64())})
        out = rolling_median(_ds(ev), window=5).to_pandas()
        got = {int(r.event_id): int(r.med_cents)
               for r in out.itertuples()}
        # user 7 cents: 500 100 900 300 700 200; trailing-5 lower
        # medians: [500], [100 500]->100, [100 500 900]->500,
        # [100 300 500 900]->300, [100 300 500 700 900]->500,
        # [100 200 300 700 900]->300.  user 8: 50; [25 50]->25
        assert got == {1: 500, 2: 100, 3: 500, 4: 300, 5: 500, 6: 300,
                       7: 50, 8: 25}

    def test_matches_naive(self):
        from pdf_extract_ray.ops.events import rolling_median
        rng = np.random.default_rng(5)
        n = 300
        users = rng.integers(0, 7, n)
        tss = np.datetime64("2024-01-01", "us") + \
            rng.integers(0, 10**9, n).astype("timedelta64[us]")
        vals = np.round(rng.uniform(0, 100, n), 2)
        ev = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(tss),
            "value": pa.array(vals)})
        out = rolling_median(_ds(ev), window=5).to_pandas()
        got = {int(r.event_id): int(r.med_cents)
               for r in out.itertuples()}
        cents = np.round(vals * 100).astype(np.int64)
        df = pd.DataFrame({"e": np.arange(n), "u": users, "t": tss,
                           "c": cents}).sort_values(["u", "t", "e"])
        for u, g in df.groupby("u"):
            cs = g["c"].to_numpy()
            for i, e in enumerate(g["e"].to_numpy()):
                win = np.sort(cs[max(0, i - 4): i + 1])
                assert got[int(e)] == win[(len(win) + 1) // 2 - 1], e


@pytest.mark.usefixtures("ray_session")
class TestAttributedPurchases:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.events import attribute_purchases
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array([
                ts("2024-01-01T00:00:00"),   # 1 u1 click
                ts("2024-01-01T01:00:00"),   # 2 u1 purchase -> 1
                ts("2024-01-01T02:00:00"),   # 3 u1 error (not a touch)
                ts("2024-01-02T03:00:00"),   # 4 u1 purchase: click 26h old -> -1
                ts("2024-01-01T00:00:00"),   # 5 u2 purchase, no touch -> -1
                ts("2024-01-01T00:00:00"),   # 6 u2 view AFTER by id order
                ts("2024-01-01T00:00:00"),   # 7 u3 view (ts tie, id before)
                ts("2024-01-01T00:00:00"),   # 8 u3 purchase -> 7
            ], pa.timestamp("us")),
            "event_type": pa.array(
                ["click", "purchase", "error", "purchase",
                 "purchase", "view", "view", "purchase"], pa.string())})
        out = attribute_purchases(_ds(ev)).to_pandas()
        got = {int(r.event_id): int(r.touch_event_id)
               for r in out.itertuples()}
        assert got == {2: 1, 4: -1, 5: -1, 8: 7}

    def test_window_boundary_inclusive(self):
        from pdf_extract_ray.ops.events import attribute_purchases
        ts = lambda s: np.datetime64(s, "us").item()
        ev = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array([ts("2024-01-01T00:00:00"),
                            ts("2024-01-02T00:00:00")],  # exactly 24h
                           pa.timestamp("us")),
            "event_type": pa.array(["click", "purchase"], pa.string())})
        out = attribute_purchases(_ds(ev)).to_pandas()
        assert out.touch_event_id.tolist() == [1]


@pytest.mark.usefixtures("ray_session")
class TestRetentionCohorts:
    def test_hand_computed_week_boundaries(self):
        from pdf_extract_ray.ops.events import retention_cohorts_cal
        ts = lambda s: np.datetime64(s, "us").item()
        # 2024-01-01 is a Monday.  user 1: first event week of Jan 1,
        # active again weeks +1 and +3 (two events in week +1 must
        # count once).  user 2: first event SUNDAY Jan 7 (still week
        # of Jan 1), active Monday Jan 8 (offset 1).  user 3: cohort
        # week of Jan 8 only.
        ev = pa.table({
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([ts("2024-01-01T10:00:00"),
                            ts("2024-01-09T00:00:00"),
                            ts("2024-01-10T23:59:59"),
                            ts("2024-01-22T05:00:00"),
                            ts("2024-01-07T12:00:00"),
                            ts("2024-01-08T00:00:00"),
                            ts("2024-01-08T09:00:00")],
                           pa.timestamp("us"))})
        out = retention_cohorts_cal(_ds(ev)).to_pandas()
        got = {(str(np.datetime64(r.cohort_week, "D")),
                int(r.offset_weeks)): int(r.n_users)
               for r in out.itertuples()}
        assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 2,
                       ("2024-01-01", 3): 1, ("2024-01-08", 0): 1}

    def test_epoch_week_variant_agrees_on_aligned_weeks(self):
        # The epoch-week variant buckets by epoch_days // 7 (weeks
        # start Thursday, day 0 = 1970-01-01); on events whose Monday
        # calendar weeks coincide with epoch-week buckets the offset
        # structure must match the calendar variant cell-for-cell.
        from pdf_extract_ray.ops.events import (retention_cohorts,
                                                retention_cohorts_cal)
        ts = lambda s: np.datetime64(s, "us").item()
        # 2024-01-04 is a Thursday AND all events stay inside
        # Thu..Sun, so both weekly bucketings agree.
        ev = pa.table({
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([ts("2024-01-04T10:00:00"),
                            ts("2024-01-12T00:00:00"),
                            ts("2024-01-05T12:00:00")],
                           pa.timestamp("us"))})
        epoch = retention_cohorts(_ds(ev)).to_pandas()
        got = {int(r.week_offset): int(r.n_users)
               for r in epoch.itertuples()}
        assert got == {0: 2, 1: 1}
        cal = retention_cohorts_cal(_ds(ev)).to_pandas()
        got_cal = {int(r.offset_weeks): int(r.n_users)
                   for r in cal.itertuples()}
        assert got_cal == got


@pytest.mark.usefixtures("ray_session")
class TestUserPaths:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.events import user_paths
        ts = lambda s: np.datetime64(s, "us").item()
        # user 1: a>b>c (4th event ignored); user 2 has a ts tie broken
        # by event_id (10 before 11); user 3: single event -> 'a'.
        ev = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 10, 11, 20], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([ts("2024-01-01T00:00:01"),
                            ts("2024-01-01T00:00:02"),
                            ts("2024-01-01T00:00:03"),
                            ts("2024-01-01T00:00:04"),
                            ts("2024-01-01T00:00:05"),
                            ts("2024-01-01T00:00:05"),
                            ts("2024-01-01T00:00:06")],
                           pa.timestamp("us")),
            "event_type": pa.array(["a", "b", "c", "d",
                                    "b", "a", "a"], pa.string())})
        out = user_paths(_ds(ev), k=3).to_pandas()
        got = dict(zip(out["path"], out["n_users"].astype(int)))
        assert got == {"a>b>c": 1, "b>a": 1, "a": 1}


@pytest.mark.usefixtures("ray_session")
class TestSkyline2d:
    def _run(self, ids, price, size):
        from pdf_extract_ray.ops.analytics import skyline_2d
        t = pa.table({"id": pa.array(ids, pa.int64()),
                      "price": pa.array(price, pa.float64()),
                      "size": pa.array(size, pa.int64())})
        out = skyline_2d(_ds(t), id_col="id", min_col="price",
                         max_col="size").to_pandas()
        return set(out["id"].astype(int)) if len(out) else set()

    @staticmethod
    def _naive(ids, price, size):
        pts = list(zip(ids, price, size))
        keep = set()
        for i, p, s in pts:
            dominated = any(
                q <= p and t >= s and (q < p or t > s)
                for _, q, t in pts)
            if not dominated:
                keep.add(i)
        return keep

    def test_hand_computed_with_ties(self):
        # (1) cheapest, (2) biggest, (3) dominated, (4)+(5) exact
        # duplicates on the frontier -> both kept, (6) same price as 1
        # but smaller -> dominated
        ids = [1, 2, 3, 4, 5, 6]
        price = [1.0, 9.0, 5.0, 3.0, 3.0, 1.0]
        size = [2, 10, 3, 7, 7, 1]
        assert self._run(ids, price, size) == {1, 2, 4, 5}
        assert self._naive(ids, price, size) == {1, 2, 4, 5}

    def test_matches_bruteforce_randomized(self):
        rng = np.random.default_rng(3)
        n = 300
        ids = list(range(n))
        price = [float(x) for x in rng.integers(0, 40, n)]  # many ties
        size = [int(x) for x in rng.integers(0, 40, n)]
        assert self._run(ids, price, size) \
            == self._naive(ids, price, size)


class TestGroupedGini:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.analytics import grouped_gini
        t = pa.table({
            "source": pa.array(["a"] * 4 + ["b"] * 3, pa.string()),
            "lang": pa.array(["en", "en", "de", "fr",
                              "en", "en", "en"], pa.string())})
        out = grouped_gini(_ds(t), "source", "lang").to_pandas() \
            .set_index("source")
        # a: counts {en:2, de:1, fr:1}, t=4, ssq=6 -> (16-6)*1e6//16
        assert int(out.loc["a", "n_rows"]) == 4
        assert int(out.loc["a", "ssq"]) == 6
        assert int(out.loc["a", "gini_ppm"]) == (16 - 6) * 1_000_000 // 16
        # b: pure -> gini 0
        assert int(out.loc["b", "gini_ppm"]) == 0

    def test_matches_float_formula(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import grouped_gini
        rng = np.random.RandomState(7)
        src = rng.choice(list("xyz"), 500)
        lang = rng.choice(["en", "de", "fr", "it", "pt"], 500)
        t = pa.table({"source": pa.array(src.tolist(), pa.string()),
                      "lang": pa.array(lang.tolist(), pa.string())})
        out = grouped_gini(_ds(t), "source", "lang").to_pandas()
        df = pd.DataFrame({"source": src, "lang": lang})
        for _, r in out.iterrows():
            c = df[df["source"] == r["source"]]["lang"].value_counts()
            tt = int(c.sum())
            gini = 1.0 - float((c ** 2).sum()) / (tt * tt)
            assert abs(r["gini_ppm"] / 1e6 - gini) < 2e-6


class TestCopurchasePairs:
    def test_cross_block_orders_and_dedup(self):
        from pdf_extract_ray.ops.relational import copurchase_pairs
        # order 1 has brands A,B (B twice -> dedup); order 2 has A only;
        # order 3 has A,B,C -> 3 pairs
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 1, 2, 3, 3, 3], pa.int64()),
            "l_partkey": pa.array([10, 20, 21, 10, 10, 20, 30],
                                  pa.int64())})
        part = pa.table({
            "p_partkey": pa.array([10, 20, 21, 30], pa.int64()),
            "p_brand": pa.array(["A", "B", "B", "C"], pa.string())})
        out = copurchase_pairs(_ds(li).repartition(4), _ds(part)) \
            .to_pandas()
        got = {(r.brand_a, r.brand_b): int(r.n_orders)
               for r in out.itertuples()}
        assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


class TestNthEventPerUser:
    def test_matches_pandas_rank(self):
        import numpy as np
        from pdf_extract_ray.ops.events import nth_event_per_user
        rng = np.random.RandomState(3)
        n = 400
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s")),
            "user_id": pa.array(rng.randint(0, 40, n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["view", "click", "buy"], n).tolist(),
                pa.string())})
        out = nth_event_per_user(_ds(t).repartition(8), n=3) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        exp = df.groupby("user_id").nth(2).sort_values("user_id") \
            .reset_index(drop=True)
        assert len(out) == len(exp)
        assert (out["event_id"].to_numpy()
                == exp["event_id"].to_numpy()).all()

    def test_short_users_dropped(self):
        from pdf_extract_ray.ops.events import nth_event_per_user
        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(pd.to_datetime(
                ["2024-01-01"] * 5)),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["a"] * 5, pa.string())})
        out = nth_event_per_user(_ds(t), n=3).to_pandas()
        assert set(out["user_id"]) == {1}
        assert int(out["event_id"].iloc[0]) == 3  # eid tiebreak


class TestAsofForward:
    def test_matches_naive_forward(self):
        import numpy as np
        from pdf_extract_ray.ops.relational import asof_join_orders_forward
        rng = np.random.RandomState(11)
        ne, no = 120, 60
        ev = pa.table({
            "event_id": pa.array(np.arange(ne), pa.int64()),
            "user_id": pa.array(rng.randint(0, 12, ne), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 500_000, ne), unit="s"))})
        od = pa.table({
            "o_orderkey": pa.array(np.arange(no), pa.int64()),
            "o_custkey": pa.array(rng.randint(0, 12, no), pa.int64()),
            "o_orderdate": pa.array(
                pd.to_datetime("2024-01-01") + pd.to_timedelta(
                    rng.randint(0, 500_000, no) // 3600 * 3600,
                    unit="s"))})
        out = asof_join_orders_forward(_ds(ev).repartition(5),
                                       _ds(od).repartition(3)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        e, o = ev.to_pandas(), od.to_pandas()
        # tie-dedup: min orderkey per (cust, date); then earliest >= ts
        o = o.sort_values("o_orderkey").groupby(
            ["o_custkey", "o_orderdate"], as_index=False).first()
        rows = []
        for r in e.itertuples():
            c = o[(o["o_custkey"] == r.user_id)
                  & (o["o_orderdate"] >= r.ts)]
            if len(c):
                c = c.sort_values(["o_orderdate", "o_orderkey"]).iloc[0]
                rows.append((r.event_id, int(c["o_orderkey"]),
                             c["o_orderdate"]))
        exp = pd.DataFrame(rows, columns=["event_id", "o_orderkey",
                                          "o_orderdate"]) \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == len(exp)
        assert (out["o_orderkey"].to_numpy()
                == exp["o_orderkey"].to_numpy()).all()
        assert (out["o_orderdate"].to_numpy()
                == exp["o_orderdate"].to_numpy()).all()


class TestRecordHighEvents:
    def test_matches_naive(self):
        import numpy as np
        from pdf_extract_ray.ops.events import record_high_events
        rng = np.random.RandomState(5)
        n = 300
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(
                               rng.randint(0, 9999, n), unit="s")),
            "user_id": pa.array(rng.randint(0, 25, n), pa.int64()),
            "value": pa.array(
                rng.choice([1.0, 2.5, 2.5, 7.0, -3.0], n))})
        out = record_high_events(_ds(t).repartition(6)).to_pandas() \
            .set_index("event_id")["is_record"]
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        seen: dict = {}
        for r in df.itertuples():
            rec = r.user_id not in seen or r.value > seen[r.user_id]
            seen[r.user_id] = max(seen.get(r.user_id, -1e18), r.value)
            assert int(out.loc[r.event_id]) == int(rec), r


class TestPrefixDedupBest:
    def test_keeps_longest_cross_block(self):
        from pdf_extract_ray.ops.dedup import prefix_dedup_best
        pfx = "a b c d e f g h"
        docs = [
            (1, pfx + " tail one", 30),
            (2, pfx + " much longer tail here", 40),   # winner
            (3, pfx, 15),
            (4, "different prefix words x y z w v u", 20),  # own group
            (5, pfx + " equal", 40),  # ties 2 on n_chars -> id 2 wins
        ]
        t = pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "n_chars": pa.array([d[2] for d in docs], pa.int64())})
        out = prefix_dedup_best(_ds(t).repartition(4), k_words=8) \
            .to_pandas()
        assert set(out["doc_id"]) == {2, 4}


class TestGroupedKurtosis:
    def test_matches_numpy_formula(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import grouped_kurtosis
        rng = np.random.RandomState(9)
        src = rng.choice(list("ab"), 600)
        val = rng.randint(0, 5000, 600)
        t = pa.table({"source": pa.array(src.tolist(), pa.string()),
                      "n_chars": pa.array(val, pa.int64())})
        out = grouped_kurtosis(_ds(t).repartition(5),
                               "source", "n_chars").to_pandas() \
            .set_index("source")["kurt"]
        for g in "ab":
            x = val[src == g].astype(np.float64)
            mu = x.mean()
            kurt = len(x) * ((x - mu) ** 4).sum() \
                / (((x - mu) ** 2).sum() ** 2) - 3.0
            assert abs(out.loc[g] - kurt) < 1e-6

    def test_binary_is_minus_two(self):
        from pdf_extract_ray.ops.analytics import grouped_kurtosis
        t = pa.table({"source": pa.array(["a"] * 4, pa.string()),
                      "n_chars": pa.array([0, 0, 7, 7], pa.int64())})
        out = grouped_kurtosis(_ds(t), "source", "n_chars").to_pandas()
        assert abs(float(out["kurt"].iloc[0]) + 2.0) < 1e-12


class TestMannWhitney:
    def test_matches_naive_midranks(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import mannwhitney_u
        rng = np.random.RandomState(17)
        src = rng.choice(["a", "b", "c"], 500)  # c must be ignored
        val = rng.randint(0, 50, 500)  # heavy ties
        t = pa.table({"source": pa.array(src.tolist(), pa.string()),
                      "n_chars": pa.array(val, pa.int64())})
        out = mannwhitney_u(_ds(t).repartition(7), "source", "n_chars",
                            "a", "b").to_pandas().iloc[0]
        # naive midranks over the a/b subset
        m = src != "c"
        v, g = val[m], src[m]
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), np.float64)
        sv = v[order]
        i = 0
        pos = 1
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
            pos += j - i
            i = j
        r_a = ranks[g == "a"].sum()
        n_a = int((g == "a").sum())
        assert int(out["n_a"]) == n_a
        assert int(out["two_r_a"]) == int(round(2 * r_a))
        assert int(out["two_u_a"]) == int(round(2 * (r_a
                                                     - n_a * (n_a + 1) / 2)))


class TestKsStatistic:
    def test_matches_naive_cdf_sup(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import ks_statistic
        rng = np.random.RandomState(23)
        src = rng.choice(["a", "b", "zz"], 400)
        val = np.where(src == "a", rng.randint(0, 40, 400),
                       rng.randint(10, 60, 400))
        t = pa.table({"source": pa.array(src.tolist(), pa.string()),
                      "n_chars": pa.array(val, pa.int64())})
        out = ks_statistic(_ds(t).repartition(6), "source", "n_chars",
                           "a", "b").to_pandas().iloc[0]
        xa = np.sort(val[src == "a"]); xb = np.sort(val[src == "b"])
        grid = np.unique(np.r_[xa, xb])
        fa = np.searchsorted(xa, grid, side="right") / len(xa)
        fb = np.searchsorted(xb, grid, side="right") / len(xb)
        d = np.abs(fa - fb).max()
        assert abs(out["d_num"] / out["d_den"] - d) < 1e-12
        assert int(out["n_a"]) == len(xa) and int(out["n_b"]) == len(xb)


class TestWeightedMedian:
    def test_matches_naive_and_first_row_edge(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import grouped_weighted_median
        # group "a": value 1 holds >= half the weight -> first row wins
        t = pa.table({
            "g": pa.array(["a", "a", "a", "b", "b", "b"], pa.string()),
            "v": pa.array([1, 2, 3, 10, 20, 30], pa.int64()),
            "w": pa.array([5, 2, 2, 1, 1, 4], pa.int64())})
        out = grouped_weighted_median(_ds(t).repartition(3),
                                      "g", "v", "w").to_pandas() \
            .set_index("g")["wmedian"]
        # a: tot=9, cum(1)=5, 2*5>=9 -> 1 ; b: tot=6, cum(10)=1,
        # cum(20)=2, cum(30)=6, first 2*cw>=6 at 30... check: 2*2=4<6,
        # 2*6=12>=6 -> 30
        assert int(out.loc["a"]) == 1
        assert int(out.loc["b"]) == 30

    def test_random_matches_naive(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import grouped_weighted_median
        rng = np.random.RandomState(31)
        g = rng.choice(list("pqr"), 400)
        v = rng.randint(0, 60, 400)
        w = rng.randint(1, 9, 400)
        t = pa.table({"g": pa.array(g.tolist(), pa.string()),
                      "v": pa.array(v, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        out = grouped_weighted_median(_ds(t).repartition(7),
                                      "g", "v", "w").to_pandas() \
            .set_index("g")["wmedian"]
        df = pd.DataFrame({"g": g, "v": v, "w": w}) \
            .groupby(["g", "v"], as_index=False)["w"].sum()
        for grp, sub in df.groupby("g"):
            sub = sub.sort_values("v")
            cw = sub["w"].cumsum()
            tot = sub["w"].sum()
            exp = int(sub["v"][(2 * cw >= tot)].iloc[0])
            assert int(out.loc[grp]) == exp


class TestGiniMeanDifference:
    def test_matches_allpairs_naive(self):
        import numpy as np
        from pdf_extract_ray.ops.analytics import gini_mean_difference
        rng = np.random.RandomState(41)
        g = rng.choice(list("xy"), 150)
        v = rng.randint(0, 25, 150)  # heavy ties
        t = pa.table({"source": pa.array(g.tolist(), pa.string()),
                      "n_chars": pa.array(v, pa.int64()),
                      "doc_id": pa.array(np.arange(150), pa.int64())})
        out = gini_mean_difference(_ds(t).repartition(5), "source",
                                   "n_chars", "doc_id").to_pandas() \
            .set_index("source")
        for grp in "xy":
            x = v[g == grp].astype(np.int64)
            naive = sum(abs(int(a) - int(b))
                        for i, a in enumerate(x) for b in x[i + 1:])
            n = len(x)
            assert int(out.loc[grp, "gmd_num"]) == naive
            assert int(out.loc[grp, "n_pairs"]) == n * (n - 1) // 2


class TestOrderTotalAudit:
    def test_hand_built_counters(self):
        from pdf_extract_ray.ops.relational import order_total_audit
        # order 1: exact match; order 2: off by 1 cent-c6; order 3: no
        # lines; order 4: match with discount/tax
        li = pa.table({
            "l_orderkey": pa.array([1, 1, 2, 4], pa.int64()),
            "l_extendedprice": pa.array([10.00, 5.00, 7.00, 8.00]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.10]),
            "l_tax": pa.array([0.0, 0.0, 0.0, 0.05])})
        # hdr: 1 -> 15.00 (match), 2 -> 7.01 (mismatch by 0.01*1e4 c6),
        # 4 -> 8*0.9*1.05 = 7.56 (match)
        od = pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_totalprice": pa.array([15.00, 7.01, 9.99, 7.56])})
        out = order_total_audit(_ds(od).repartition(3),
                                _ds(li).repartition(2)).to_pandas()
        r = out.iloc[0]
        assert int(r["n_orders"]) == 4
        assert int(r["n_with_lines"]) == 3
        assert int(r["n_mismatched"]) == 1
        assert int(r["max_abs_diff_c6"]) == 100_00  # one cent in c6


class TestOrderStreaks:
    def test_matches_naive_runs(self):
        import importlib.util
        import os

        import numpy as np
        spec = importlib.util.spec_from_file_location(
            "entry_streaks", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        out = m._q_order_streaks("/root/testdata/sf0.001").to_pandas() \
            .set_index("o_custkey")["max_streak"]
        import pyarrow.parquet as pq
        df = pq.read_table(
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice"]).to_pandas()
        df["p"] = np.rint(df["o_totalprice"] * 100).astype(np.int64)
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        for cust, sub in df.groupby("o_custkey"):
            best = cur = 1
            vals = sub["p"].tolist()
            for a, b in zip(vals, vals[1:]):
                cur = cur + 1 if b > a else 1
                best = max(best, cur)
            assert int(out.loc[cust]) == best, cust


class TestAsofNearest:
    def test_matches_naive_nearest(self):
        import numpy as np
        from pdf_extract_ray.ops.relational import asof_join_orders_nearest
        rng = np.random.RandomState(13)
        ne, no = 150, 70
        ev = pa.table({
            "event_id": pa.array(np.arange(ne), pa.int64()),
            "user_id": pa.array(rng.randint(0, 14, ne), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 500_000, ne) // 3600 * 3600, unit="s"))})
        od = pa.table({
            "o_orderkey": pa.array(np.arange(no), pa.int64()),
            "o_custkey": pa.array(rng.randint(0, 14, no), pa.int64()),
            "o_orderdate": pa.array(
                pd.to_datetime("2024-01-01") + pd.to_timedelta(
                    rng.randint(0, 500_000, no) // 3600 * 3600,
                    unit="s"))})
        out = asof_join_orders_nearest(_ds(ev).repartition(5),
                                       _ds(od).repartition(3)) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        e, o = ev.to_pandas(), od.to_pandas()
        rows = []
        for r in e.itertuples():
            mine = o[o["o_custkey"] == r.user_id]
            back = mine[mine["o_orderdate"] <= r.ts]
            fwd = mine[mine["o_orderdate"] > r.ts]
            cand = []
            if len(back):
                bd = back["o_orderdate"].max()
                bk = int(back[back["o_orderdate"] == bd]
                         ["o_orderkey"].max())
                cand.append((int((r.ts - bd).total_seconds()), 0, bk, bd))
            if len(fwd):
                fd = fwd["o_orderdate"].min()
                fk = int(fwd[fwd["o_orderdate"] == fd]
                         ["o_orderkey"].min())
                cand.append((int((fd - r.ts).total_seconds()), 1, fk, fd))
            if cand:
                cand.sort()  # smaller gap first; backward (0) wins ties
                rows.append((r.event_id, cand[0][2], cand[0][3]))
        exp = pd.DataFrame(rows, columns=["event_id", "o_orderkey",
                                          "o_orderdate"]) \
            .sort_values("event_id").reset_index(drop=True)
        assert len(out) == len(exp)
        assert (out["o_orderkey"].to_numpy()
                == exp["o_orderkey"].to_numpy()).all()
        assert (out["o_orderdate"].to_numpy()
                == exp["o_orderdate"].to_numpy()).all()


class TestUserValueEwma:
    def test_matches_naive_weighted_window(self):
        import numpy as np
        from pdf_extract_ray.ops.events import user_value_ewma
        rng = np.random.RandomState(7)
        n = 400
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 9, n), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(rng.randint(0, 9999, n),
                                             unit="s")),
            "value": pa.array(rng.uniform(0, 500, n))})
        out = user_value_ewma(_ds(t).repartition(6)).to_pandas() \
            .set_index("event_id")["ewma_scaled"]
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        for uid, grp in df.groupby("user_id"):
            c = np.floor(grp["value"].to_numpy() * 100.0).astype(np.int64)
            for i in range(len(c)):
                lo = max(0, i - 15)
                exp = sum(int(c[j]) << (15 - (i - j))
                          for j in range(lo, i + 1))
                eid = grp["event_id"].to_numpy()[i]
                assert int(out.loc[eid]) == exp, (uid, i)

    def test_window_truncates_and_isolates_users(self):
        from pdf_extract_ray.ops.events import user_value_ewma
        # 20 events of value 1.0 for one user: after 16 rows the scaled
        # sum saturates at 100 * (2^16 - 1); a second user's single row
        # must not see the first user's history
        n = 20
        t = pa.table({
            "event_id": pa.array(list(range(n)) + [99], pa.int64()),
            "user_id": pa.array([1] * n + [2], pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(list(range(n)) + [5],
                                             unit="s")),
            "value": pa.array([1.0] * (n + 1))})
        out = user_value_ewma(_ds(t).repartition(3)).to_pandas() \
            .set_index("event_id")["ewma_scaled"]
        assert int(out.loc[0]) == 100 << 15
        assert int(out.loc[n - 1]) == 100 * ((1 << 16) - 1)
        assert int(out.loc[99]) == 100 << 15


class TestRollingSpikes:
    def test_matches_naive_integer_test(self):
        import numpy as np
        from pdf_extract_ray.ops.events import rolling_spikes
        rng = np.random.RandomState(3)
        n = 600
        vals = rng.uniform(0, 50, n)
        vals[rng.randint(0, n, 25)] *= 40  # planted spikes
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 7, n), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(rng.randint(0, 99999, n),
                                             unit="s")),
            "value": pa.array(vals)})
        out = rolling_spikes(_ds(t).repartition(5)).to_pandas() \
            .set_index("user_id")
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        total_spikes = 0
        for uid, grp in df.groupby("user_id"):
            c = np.floor(grp["value"].to_numpy() * 100.0).astype(np.int64)
            ev = sp = 0
            for i in range(len(c)):
                w = c[max(0, i - 15): i + 1]
                wn = len(w)
                if wn < 8:
                    continue
                ev += 1
                s, q = int(w.sum()), int((w * w).sum())
                if (wn * int(c[i]) - s) ** 2 > 4 * (wn * q - s * s):
                    sp += 1
            assert int(out.loc[uid, "n_eval"]) == ev, uid
            assert int(out.loc[uid, "n_spikes"]) == sp, uid
            total_spikes += sp
        assert total_spikes > 0  # planted anomalies actually fire


class TestHourlyGapfill:
    def test_holes_are_zero_filled(self):
        from pdf_extract_ray.ops.events import hourly_gapfill
        ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                             "2024-01-01 03:05", "2024-01-01 05:59"])
        t = pa.table({"ts": pa.array(ts)})
        out = hourly_gapfill(_ds(t).repartition(3))
        assert len(out) == 6  # 00..05 inclusive
        assert out["n_events"].tolist() == [2, 0, 0, 1, 0, 1]
        hrs = pd.to_datetime(out["hour"])
        assert hrs.iloc[0] == pd.Timestamp("2024-01-01 00:00")
        assert (hrs.diff().dropna() == pd.Timedelta(hours=1)).all()

    def test_empty_input_total(self):
        from pdf_extract_ray.ops.events import hourly_gapfill
        t = pa.table({"ts": pa.array([], pa.timestamp("us"))})
        out = hourly_gapfill(_ds(t))
        assert len(out) == 0


class TestMutualInformation:
    def test_matches_naive(self):
        import math
        import numpy as np
        from pdf_extract_ray.ops.analytics import mutual_information
        rng = np.random.RandomState(41)
        n = 500
        a = np.array(["x", "y", "z"], dtype=object)[rng.randint(0, 3, n)]
        # b correlated with a -> MI > 0
        b = np.where(rng.rand(n) < 0.7, a,
                     np.array(["x", "y", "z"], dtype=object)[
                         rng.randint(0, 3, n)])
        t = pa.table({"lang": pa.array(a), "source": pa.array(b)})
        out = mutual_information(_ds(t).repartition(4), "lang", "source")
        df = pd.DataFrame({"a": a, "b": b})

        def ent(counts):
            tt = counts.sum()
            return sum(-(o / tt) * math.log(o / tt) for o in counts)

        ha = ent(df.groupby("a").size().sort_index())
        hb = ent(df.groupby("b").size().sort_index())
        hj = ent(df.groupby(["a", "b"]).size().sort_index())
        assert int(out["n_rows"].iloc[0]) == n
        assert int(out["h_a_ppm"].iloc[0]) == math.floor(ha * 1e6)
        assert int(out["h_joint_ppm"].iloc[0]) == math.floor(hj * 1e6)
        assert int(out["mi_ppm"].iloc[0]) \
            == math.floor((ha + hb - hj) * 1e6)
        assert int(out["mi_ppm"].iloc[0]) > 0

    def test_independent_is_near_zero_and_identical_is_h(self):
        from pdf_extract_ray.ops.analytics import mutual_information
        a = ["p", "q"] * 50
        t = pa.table({"lang": pa.array(a, pa.string()),
                      "source": pa.array(a, pa.string())})
        out = mutual_information(_ds(t), "lang", "source")
        # identical columns: MI == H(a) == ln 2
        assert int(out["mi_ppm"].iloc[0]) == int(out["h_a_ppm"].iloc[0])
        assert abs(int(out["mi_ppm"].iloc[0]) - 693147) <= 1
