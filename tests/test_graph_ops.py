"""Unit tests for ops/graph.py: distributed connected components
(min-label propagation + pointer jumping) and the banded interval
self-join, against naive union-find / brute-force references.  The
sf0.01 DuckDB oracle (dup_clusters, recursive CTE) covers the composed
query; these pin the operator semantics on adversarial shapes (long
chains that force multiple propagation rounds, merged stars, isolated
self-loops)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


def _edges(pairs):
    return pa.table({
        "src": pa.array([a for a, _ in pairs], pa.int64()),
        "dst": pa.array([b for _, b in pairs], pa.int64()),
    })


def _naive_components(pairs):
    """Union-find reference: node -> min id of its component."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def _run(self, pairs, **kw):
        from pdf_extract_ray.ops.graph import connected_components
        out = connected_components(_ds(_edges(pairs)), **kw).to_pandas()
        if out.empty:  # Ray drops the schema on zero-row datasets
            return {}
        return dict(zip(out["node"], out["component"]))

    # single_task_edges=0 forces the distributed join/groupby loop (the
    # at-scale path); the default exercises the bounded one-task finish
    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_chain_forces_multiple_rounds(self, kw):
        # a 40-node path with ids descending: min id sits at one END, so
        # plain propagation needs ~diameter rounds — pointer jumping must
        # still converge well inside max_rounds
        pairs = [(i + 1, i) for i in range(40)]
        got = self._run(pairs, **kw)
        assert got == {n: 0 for n in range(41)}

    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_two_stars_merged_by_bridge(self, kw):
        pairs = [(100, i) for i in range(1, 5)] + \
                [(200, i) for i in range(201, 205)] + [(4, 204)]
        got = self._run(pairs, **kw)
        expect = _naive_components(pairs)
        assert got == expect

    def test_disjoint_components_and_self_loops(self):
        pairs = [(1, 2), (2, 3), (7, 7), (10, 11), (5, 5)]
        got = self._run(pairs)
        # pure self-loop nodes carry no real edge -> not covered
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_empty_edges(self):
        got = self._run([])
        assert got == {}

    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_random_graph_matches_union_find(self, kw):
        rng = np.random.RandomState(7)
        pairs = [(int(a), int(b))
                 for a, b in rng.randint(0, 60, size=(80, 2)) if a != b]
        got = self._run(pairs, **kw)
        assert got == _naive_components(pairs)


@pytest.mark.usefixtures("ray_session")
class TestIntervalSelfJoin:
    def test_pairs_within_tolerance(self):
        from pdf_extract_ray.ops.graph import interval_self_join
        tbl = pa.table({
            "g": pa.array(["x", "x", "x", "x", "y", "y", "z"]),
            "v": pa.array([10, 11, 13, 30, 10, 11, 5], pa.int64()),
            "i": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        })
        out = interval_self_join(_ds(tbl), ["g"], "v", "i", tol=2) \
            .to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == {(1, 2), (2, 3), (5, 6)}

    def test_salted_equals_plain_on_random_groups(self):
        from pdf_extract_ray.ops.graph import (interval_self_join,
                                               interval_self_join_salted)
        rng = np.random.RandomState(17)
        n = 150
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], size=n),
            "v": rng.randint(0, 30, size=n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        })
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        for tol in (0, 2, 5):
            plain = interval_self_join(_ds(tbl), ["g"], "v", "i",
                                       tol=tol).to_pandas()
            salted = interval_self_join_salted(_ds(tbl), ["g"], "v", "i",
                                               tol=tol).to_pandas()
            sp = set(zip(plain["id_a"], plain["id_b"]))
            ss = set(zip(salted["id_a"], salted["id_b"]))
            assert ss == sp, f"tol={tol}"

    def test_salted_skewed_single_group(self):
        # one giant group: the salted path must split it by value bucket
        # and still produce the exact pair set
        from pdf_extract_ray.ops.graph import (interval_self_join,
                                               interval_self_join_salted)
        rng = np.random.RandomState(23)
        n = 400
        df = pd.DataFrame({
            "g": ["hot"] * n,
            "v": rng.randint(0, 1000, size=n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        })
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        plain = interval_self_join(_ds(tbl), ["g"], "v", "i",
                                   tol=7).to_pandas()
        salted = interval_self_join_salted(_ds(tbl), ["g"], "v", "i",
                                           tol=7).to_pandas()
        assert set(zip(salted["id_a"], salted["id_b"])) \
            == set(zip(plain["id_a"], plain["id_b"]))
        assert len(salted) == len(plain)  # exactly-once emission, no dups

    def test_matches_bruteforce_on_random_groups(self):
        from pdf_extract_ray.ops.graph import interval_self_join
        rng = np.random.RandomState(3)
        n = 120
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], size=n),
            "v": rng.randint(0, 40, size=n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        })
        tol = 3
        expect = set()
        for _, grp in df.groupby("g"):
            v = grp["v"].to_numpy()
            ids = grp["i"].to_numpy()
            for a in range(len(v)):
                for b in range(a + 1, len(v)):
                    if abs(int(v[a]) - int(v[b])) <= tol:
                        expect.add((min(ids[a], ids[b]),
                                    max(ids[a], ids[b])))
        out = interval_self_join(
            _ds(pa.Table.from_pandas(df, preserve_index=False)),
            ["g"], "v", "i", tol=tol).to_pandas()
        got = set(zip(out["id_a"], out["id_b"]))
        assert got == expect


@pytest.mark.usefixtures("ray_session")
class TestNeardupClustering:
    def test_planted_copies_cluster_with_originals(self):
        """Perturbed copies (id + 1M, like _with_neardup_copies) must land
        in their original's component via the LSH->verify->CC chain."""
        from pdf_extract_ray.ops.dedup import (minhash_lsh_pairs,
                                               verify_pairs_jaccard)
        from pdf_extract_ray.ops.graph import connected_components
        rng = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(50)]
        base = {i: " ".join(rng.choice(vocab, size=60)) for i in range(8)}
        rows = [(i, t) for i, t in base.items()]
        for i, t in base.items():
            words = t.split(" ")
            words[5] = "CHANGED"
            rows.append((i + 1_000_000, " ".join(words)))
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
        pairs = minhash_lsh_pairs(_ds(tbl), threshold=0.4)
        verified = verify_pairs_jaccard(pairs, _ds(tbl), threshold=0.6)
        comp = connected_components(
            verified.select_columns(["doc_id_a", "doc_id_b"]),
            "doc_id_a", "doc_id_b").to_pandas()
        lab = dict(zip(comp["node"], comp["component"]))
        for i in base:
            assert lab.get(i + 1_000_000) == lab.get(i) == i


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def _run(self, texts, ratio, n_blocks=6):
        import ray
        from pdf_extract_ray.ops.sketch import heavy_hitter_words
        tbl = pa.table({"text": pa.array(texts, pa.string())})
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        out = heavy_hitter_words(ds, ratio=ratio)
        return dict(zip(out.column("word").to_pylist(),
                        out.column("n_occurrences").to_pylist()))

    def _naive(self, texts, ratio):
        import collections
        c = collections.Counter(
            w for t in texts for w in t.split(" ") if w)
        total = sum(c.values())
        return {w: n for w, n in c.items() if n * ratio >= total}

    def test_matches_naive_exact(self):
        rng = np.random.RandomState(31)
        vocab = [f"w{i}" for i in range(40)]
        # Zipf-ish skew so some words pass the cut and some don't
        probs = 1.0 / np.arange(1, 41)
        probs /= probs.sum()
        texts = [" ".join(rng.choice(vocab, size=30, p=probs))
                 for _ in range(120)]
        for ratio in (10, 30, 100):
            assert self._run(texts, ratio) == self._naive(texts, ratio)

    def test_thin_spread_word_not_lost(self):
        # a word JUST above threshold, spread one-per-document across
        # many blocks — the per-batch Misra-Gries must not drop it from
        # the candidate set (the merged-error bound at work)
        rng = np.random.RandomState(41)
        filler = [f"f{i}" for i in range(500)]  # high-cardinality noise
        texts = [("needle " if i % 2 == 0 else "")
                 + " ".join(rng.choice(filler, size=25))
                 for i in range(200)]
        ratio = 60  # threshold ~ total/60 ~ 87; needle count = 100
        got = self._run(texts, ratio, n_blocks=8)
        expect = self._naive(texts, ratio)
        assert "needle" in expect  # fixture sanity
        assert got == expect

    def test_all_distinct_batches_keep_totals(self):
        """Batches whose Misra-Gries counters drain to empty must still
        contribute their word/decrement totals to the global threshold
        (regression: the totals row used to be dropped with the
        counters)."""
        texts = ["hot hot hot"] * 30 + \
                [" ".join(f"u{i}_{j}" for j in range(130))
                 for i in range(20)]
        got = self._run(texts, ratio=40, n_blocks=8)
        assert got == self._naive(texts, 40)


@pytest.mark.usefixtures("ray_session")
class TestRedactPII:
    def test_planted_pii_scrubbed(self):
        import ray
        from pdf_extract_ray.ops.textstats import redact_pii
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([
                "contact me a.b+c@ex-ample.co.uk or 192.168.001.1 now",
                "call +1 (555) 123-4567 or 555-123-4567 x89",
                "no pii here",
                "ip 10.0.0.255 email x@y.io phone 5551234567",
            ], pa.string()),
        })
        out = redact_pii(ray.data.from_arrow(tbl)).to_pandas() \
            .sort_values("doc_id")["text"].tolist()
        assert out == [
            "contact me [EMAIL] or [IP] now",
            "call [PHONE] or [PHONE] x89",
            "no pii here",
            # bare 10-digit runs are deliberately NOT matched (too many
            # false positives on ids/timestamps in web text)
            "ip [IP] email [EMAIL] phone 5551234567",
        ]

    def test_matches_duckdb_regexp_replace(self):
        """Same RE2 patterns through DuckDB — pins engine agreement on
        matching text (the sf0.01 oracle only sees match-free text)."""
        import duckdb
        import ray
        from pdf_extract_ray.ops.textstats import (PII_EMAIL, PII_IPV4,
                                                   PII_PHONE, redact_pii)
        texts = [
            "a@b.co 1.2.3.4 (123) 456-7890",
            "mixed: x.y@z.org, 255.255.255.255, +1 222-333-4444 end",
            "edge a@b.c a@b.cd 999.999.999.999 1.2.3.4.5",
        ]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = redact_pii(ray.data.from_arrow(tbl)).to_pandas() \
            .sort_values("doc_id")["text"].tolist()
        con = duckdb.connect()
        for t, p in zip(texts, got):
            sql = con.execute(
                """SELECT regexp_replace(regexp_replace(regexp_replace(
                       ?, ?, '[EMAIL]', 'g'), ?, '[IP]', 'g'),
                       ?, '[PHONE]', 'g')""",
                [t, PII_EMAIL, PII_IPV4, PII_PHONE]).fetchone()[0]
            assert p == sql


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingPCA:
    def test_matches_local_pca_subspace(self):
        import ray
        from pdf_extract_ray.ops.similarity import pca_fit, pca_project
        rng = np.random.RandomState(13)
        d, n, k = 16, 300, 4
        # anisotropic data: known dominant directions
        scales = np.array([10, 7, 5, 3] + [0.5] * (d - 4))
        X = rng.normal(0, 1, (n, d)) * scales
        tbl = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl).repartition(5).materialize()
        mean, comps = pca_fit(ds, k=k)

        # local reference PCA on the same data
        Xc = X - X.mean(axis=0)
        cov = (Xc.T @ Xc) / n
        w, v = np.linalg.eigh(cov)
        ref = v[:, ::-1][:, :k].T

        assert comps.shape == (k, d)
        # orthonormal rows
        assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-8)
        # same subspace: |cos| of matched components ~ 1
        for i in range(k):
            assert abs(float(comps[i] @ ref[i])) > 0.99, i

        proj = pca_project(ds, mean, comps).to_pandas() \
            .sort_values("vec_id")
        P = np.asarray(proj["proj"].tolist())
        assert P.shape == (n, k)
        # projected variance is in descending component order
        var = P.var(axis=0)
        assert np.all(np.diff(var) <= 1e-6)

    def test_empty_input_is_total(self):
        # empty corpora return (None, None) instead of raising — empty
        # partitions are routine at scale (see tests/test_empty_inputs)
        import ray
        from pdf_extract_ray.ops.similarity import pca_fit
        tbl = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        })
        mean, comps = pca_fit(ray.data.from_arrow(tbl))
        assert mean is None and comps is None


@pytest.mark.usefixtures("ray_session")
class TestClusterDedup:
    def test_cluster_canonicals_planted(self):
        """Keep-one-per-CC-cluster dedup: planted copies (id+1M) always
        drop (their original has the smaller id); survivors are exactly
        one doc per component plus all never-paired docs."""
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "entry_mod", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        sf = "/root/testdata/sf0.001"
        surv = set(m._q_neardup_cluster_dedup(sf).to_pandas()["doc_id"])
        comp = m._q_neardup_clusters(sf).to_pandas()
        assert all(i < 1_000_000 for i in surv)  # every copy dropped
        # survivors inside components are exactly the component minima
        by_comp = comp.groupby("component")["node"].min()
        clustered = set(comp["node"])
        assert set(by_comp) == surv & clustered
        # determinism
        surv2 = set(m._q_neardup_cluster_dedup(sf).to_pandas()["doc_id"])
        assert surv2 == surv


@pytest.mark.usefixtures("ray_session")
class TestCcprepClusterPolicy:
    def test_cluster_policy_runs_and_is_deterministic(self):
        import ray
        from pdf_extract_ray.data.pages import pages_parquet_path
        from pdf_extract_ray.pipelines.ccprep import ccprep_dataset

        def run():
            ds = ray.data.read_parquet(pages_parquet_path(100),
                                       columns=["url", "html"])
            return ccprep_dataset(ds, min_quality=0.1,
                                  neardup_threshold=0.95,
                                  drop_policy="cluster").to_pandas()

        a, b = run(), run()
        assert len(a) > 0
        assert sorted(a["url"]) == sorted(b["url"])

    def test_cluster_policy_drops_at_least_mis_complement(self):
        """Both policies resolve the same verified pair graph; the
        cluster policy keeps exactly one doc per component, so it can
        never keep MORE docs than the maximal-independent-set policy."""
        import ray
        from pdf_extract_ray.data.pages import pages_parquet_path
        from pdf_extract_ray.pipelines.ccprep import ccprep_dataset

        def run(policy):
            ds = ray.data.read_parquet(pages_parquet_path(100),
                                       columns=["url", "html"])
            return ccprep_dataset(ds, min_quality=0.1,
                                  neardup_threshold=0.95,
                                  drop_policy=policy).to_pandas()

        mis = run("mis")
        clu = run("cluster")
        assert len(clu) <= len(mis)
        # docs untouched by any near-dup pair survive under BOTH
        # policies, so the smaller (cluster) result can differ from the
        # MIS result only on clustered docs — never on the isolated core
        assert set(clu["url"]) & set(mis["url"])


@pytest.mark.usefixtures("ray_session")
class TestPageRank:
    @staticmethod
    def _local_pagerank(edges, n_nodes_map, damping=0.85, iters=10):
        import numpy as np
        nodes = sorted(n_nodes_map)
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        outdeg = np.zeros(n)
        for s, _d in edges:
            outdeg[idx[s]] += 1
        rank = np.full(n, 1.0 / n)
        for _ in range(iters):
            incoming = np.zeros(n)
            for s, d in edges:
                incoming[idx[d]] += rank[idx[s]] / outdeg[idx[s]]
            dangling = rank[outdeg == 0].sum()
            rank = (1 - damping) / n + damping * (incoming + dangling / n)
        return dict(zip(nodes, rank))

    def test_matches_local_reference(self):
        import ray
        import numpy as np
        import pyarrow as pa
        from pdf_extract_ray.ops.graph import pagerank
        rng = np.random.default_rng(7)
        edges = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, 40, (300, 2))
                        if a != b})
        nodes = {v for e in edges for v in e}
        t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                      "dst": pa.array([e[1] for e in edges], pa.int64())})
        got = pagerank(ray.data.from_arrow(t), iters=10).to_pandas()
        want = self._local_pagerank(edges, nodes, iters=10)
        assert len(got) == len(nodes)
        for r in got.itertuples():
            assert abs(r.rank - want[int(r.node)]) < 1e-9
        # ranks form a probability distribution
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_dangling_and_isolated_sink(self):
        import ray
        import pyarrow as pa
        from pdf_extract_ray.ops.graph import pagerank
        # 1 -> 2 -> 3, 3 dangles; star into 3 makes it the max
        t = pa.table({"src": pa.array([1, 2, 4, 5], pa.int64()),
                      "dst": pa.array([2, 3, 3, 3], pa.int64())})
        got = pagerank(ray.data.from_arrow(t), iters=15).to_pandas() \
            .set_index("node")["rank"]
        assert got.idxmax() == 3
        assert abs(got.sum() - 1.0) < 1e-9

    def test_partitioned_variant_agrees(self):
        import ray
        import numpy as np
        import pyarrow as pa
        from pdf_extract_ray.ops.graph import pagerank, pagerank_partitioned
        rng = np.random.default_rng(11)
        edges = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, 60, (400, 2))
                        if a != b})
        t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                      "dst": pa.array([e[1] for e in edges], pa.int64())})
        bc = pagerank(ray.data.from_arrow(t), iters=6).to_pandas() \
            .set_index("node")["rank"].sort_index()
        pt = pagerank_partitioned(ray.data.from_arrow(t), iters=6,
                                  n_parts=8).to_pandas() \
            .set_index("node")["rank"].sort_index()
        assert list(bc.index) == list(pt.index)
        # same math, different float accumulation order
        assert np.allclose(bc.to_numpy(), pt.to_numpy(), atol=1e-12)
        assert abs(pt.sum() - 1.0) < 1e-9

    def test_partitioned_handles_negative_node_ids(self):
        """Regression: the dangling-mass row used to ride node id -1,
        colliding with real negative ids and dropping their incoming
        mass; it now rides an explicit flag column."""
        import ray
        import numpy as np
        import pyarrow as pa
        from pdf_extract_ray.ops.graph import pagerank, pagerank_partitioned
        t = pa.table({"src": pa.array([-1, 2, 3, -5], pa.int64()),
                      "dst": pa.array([2, -1, -1, 3], pa.int64())})
        bc = pagerank(ray.data.from_arrow(t), iters=8).to_pandas() \
            .set_index("node")["rank"].sort_index()
        pt = pagerank_partitioned(ray.data.from_arrow(t), iters=8,
                                  n_parts=4).to_pandas() \
            .set_index("node")["rank"].sort_index()
        assert list(bc.index) == list(pt.index) == [-5, -1, 2, 3]
        assert np.allclose(bc.to_numpy(), pt.to_numpy(), atol=1e-12)
        assert abs(pt.sum() - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
class TestTriangleCounts:
    def _tbl(self, pairs, groups=None):
        t = {"id_a": pa.array([min(a, b) for a, b in pairs], pa.int64()),
             "id_b": pa.array([max(a, b) for a, b in pairs], pa.int64())}
        if groups is not None:
            t["g"] = pa.array(groups, pa.string())
        return pa.table(t)

    def _naive(self, pairs):
        import itertools
        es = {(min(a, b), max(a, b)) for a, b in pairs}
        nodes = sorted({x for e in es for x in e})
        return sum(1 for a, b, c in itertools.combinations(nodes, 3)
                   if (a, b) in es and (a, c) in es and (b, c) in es)

    def test_matches_naive_random(self):
        from pdf_extract_ray.ops.graph import triangle_counts
        rng = np.random.RandomState(3)
        pairs = {(min(a, b), max(a, b))
                 for a, b in rng.randint(0, 30, (200, 2)) if a != b}
        out = triangle_counts(_ds(self._tbl(sorted(pairs)))).to_pandas()
        assert out.n_triangles.tolist() == [self._naive(pairs)]

    def test_union_resolve_degree_path_agrees(self):
        # broadcast_max_nodes=0 forces the at-scale degree-attach path
        from pdf_extract_ray.ops.graph import triangle_counts
        rng = np.random.RandomState(9)
        pairs = {(min(a, b), max(a, b))
                 for a, b in rng.randint(0, 25, (150, 2)) if a != b}
        tbl = self._tbl(sorted(pairs))
        a = triangle_counts(_ds(tbl)).to_pandas()
        b = triangle_counts(_ds(tbl),
                            broadcast_max_nodes=0).to_pandas()
        assert a.n_triangles.tolist() == b.n_triangles.tolist() \
            == [self._naive(pairs)]

    def test_grouped_cliques_and_hub(self):
        import itertools
        from pdf_extract_ray.ops.graph import triangle_counts
        pairs, groups = [], []
        for grp, base, k in (("x", 0, 5), ("y", 100, 4)):
            for a, b in itertools.combinations(range(base, base + k), 2):
                pairs.append((a, b))
                groups.append(grp)
        # star (hub) in its own group: no triangles despite high degree
        for leaf in range(201, 208):
            pairs.append((200, leaf))
            groups.append("z")
        out = triangle_counts(_ds(self._tbl(pairs, groups)),
                              group_cols=["g"]).to_pandas() \
            .set_index("g").n_triangles
        assert out.get("x") == 10 and out.get("y") == 4
        assert out.get("z", 0) in (0, None) or out.get("z") == 0

    def test_empty_edges(self):
        from pdf_extract_ray.ops.graph import triangle_counts
        out = triangle_counts(_ds(self._tbl([]))).to_pandas()
        assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestBfsHops:
    def _run(self, pairs, seeds, **kw):
        import ray
        from pdf_extract_ray.ops.graph import bfs_hops
        seeds_t = pa.table({"node": pa.array(seeds, pa.int64())})
        out = bfs_hops(_ds(_edges(pairs)), ray.data.from_arrow(seeds_t),
                       **kw).to_pandas()
        return dict(zip(out["node"].astype(int), out["hop"].astype(int)))

    def test_path_graph_exact_distances(self):
        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
                 (8, 9)]
        got = self._run(pairs, seeds=[1], max_hops=4)
        assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}

    def test_multi_seed_min_and_isolated_seed(self):
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
        # seed 99 touches no edge -> hop 0 only; node 3 is 1 from seed 4
        got = self._run(pairs, seeds=[1, 4, 99], max_hops=6)
        # 10/11 unreachable from any seed -> absent
        assert got == {1: 0, 4: 0, 99: 0, 2: 1, 3: 1}

    def test_early_exit_on_drained_frontier(self):
        got = self._run([(1, 2)], seeds=[1], max_hops=50)
        assert got == {1: 0, 2: 1}

    def test_cycle(self):
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
        got = self._run(pairs, seeds=[1], max_hops=6)
        assert got == {1: 0, 2: 1, 4: 1, 3: 2}

    def test_forced_shuffle_path(self):
        # the at-scale hash-partitioned path of every _grouped_by_partition
        # inside bfs_hops must agree with the small-input fast path
        from pdf_extract_ray.ops import dedup as dedup_mod
        pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
        expect = self._run(pairs, seeds=[1, 10], max_hops=3)
        assert dedup_mod._FORCE_SHUFFLE is False
        dedup_mod._FORCE_SHUFFLE = True
        try:
            got = self._run(pairs, seeds=[1, 10], max_hops=3)
        finally:
            dedup_mod._FORCE_SHUFFLE = False
        assert got == expect == {1: 0, 10: 0, 2: 1, 11: 1, 3: 2, 4: 3}


@pytest.mark.usefixtures("ray_session")
class TestChainEdges:
    def test_chain_ordering_and_groups(self):
        from pdf_extract_ray.ops.graph import chain_edges
        t = pa.table({
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "g": pa.array(["a", "a", "a", "b", "b", "c"]),
            "v": pa.array([30, 10, 20, 2, 1, 5], pa.int64())})
        import ray
        out = chain_edges(ray.data.from_arrow(t), ["g"], "v", "id") \
            .to_pandas()
        got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
        assert got == {(2, 3), (3, 1), (5, 4)}


@pytest.mark.usefixtures("ray_session")
class TestBfsSingleTaskPath:
    def test_single_task_equals_loop_path(self):
        import numpy as np
        import ray

        from pdf_extract_ray.ops.graph import bfs_hops
        rng = np.random.RandomState(13)
        e = pa.table({"src": pa.array(rng.randint(0, 60, 150), pa.int64()),
                      "dst": pa.array(rng.randint(0, 60, 150), pa.int64())})
        seeds = pa.table({"node": pa.array([0, 7, 13], pa.int64())})
        fast = bfs_hops(ray.data.from_arrow(e).repartition(4),
                        ray.data.from_arrow(seeds),
                        max_hops=4).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        slow = bfs_hops(ray.data.from_arrow(e).repartition(4),
                        ray.data.from_arrow(seeds),
                        max_hops=4, single_task_edges=0).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(fast, slow)
        assert (fast[fast["node"].isin([0, 7, 13])]["hop"] == 0).all()


@pytest.mark.usefixtures("ray_session")
class TestPagerankSingleTaskPath:
    def test_single_task_equals_streamed_loop(self):
        import numpy as np
        import ray

        from pdf_extract_ray.ops.graph import pagerank
        rng = np.random.default_rng(19)
        edges = sorted({(int(a), int(b))
                        for a, b in rng.integers(0, 50, (300, 2))
                        if a != b})
        t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                      "dst": pa.array([e[1] for e in edges], pa.int64())})
        fast = pagerank(ray.data.from_arrow(t), iters=8).to_pandas() \
            .set_index("node")["rank"].sort_index()
        slow = pagerank(ray.data.from_arrow(t), iters=8,
                        single_task_edges=0).to_pandas() \
            .set_index("node")["rank"].sort_index()
        assert list(fast.index) == list(slow.index)
        assert np.allclose(fast.to_numpy(), slow.to_numpy(), atol=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestTriangleSingleTaskPath:
    def test_single_task_equals_distributed(self):
        import numpy as np
        import ray

        from pdf_extract_ray.ops.graph import triangle_counts
        rng = np.random.RandomState(29)
        pairs = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                        for a, b in rng.randint(0, 40, (200, 2))
                        if a != b})
        t = pa.table({"id_a": pa.array([p[0] for p in pairs], pa.int64()),
                      "id_b": pa.array([p[1] for p in pairs], pa.int64())})
        fast = triangle_counts(ray.data.from_arrow(t)).to_pandas()
        slow = triangle_counts(ray.data.from_arrow(t),
                               single_task_edges=0).to_pandas()
        assert int(fast["n_triangles"].iloc[0]) \
            == int(slow["n_triangles"].iloc[0]) > 0


def _naive_kcore(pairs, k):
    """Reference peeling: dict node -> in-core distinct-neighbor degree."""
    nbrs: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(nbrs):
            if len(nbrs[n]) < k:
                for m in nbrs.pop(n):
                    if m in nbrs:
                        nbrs[m].discard(n)
                changed = True
    return {n: len(s) for n, s in nbrs.items()}


@pytest.mark.usefixtures("ray_session")
class TestKCore:
    def _run(self, pairs, k, **kw):
        from pdf_extract_ray.ops.graph import kcore_nodes
        out = kcore_nodes(_ds(_edges(pairs)), k=k, **kw).to_pandas()
        if out.empty:
            return {}
        return dict(zip(out["node"], out["core_deg"]))

    # loop: every per-round exchange runs (degree pass + adaptive drop);
    # fast: the bounded single-task bincount peel
    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_k4_with_peeling_tail(self, kw):
        # K4 core survives; the 4-5-6-7 chain peels over THREE rounds
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 5), (5, 6), (6, 7)]
        got = self._run(pairs, k=3, **kw)
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_empty_core(self, kw):
        # tree: no 2-core at all
        pairs = [(0, 1), (1, 2), (1, 3), (3, 4)]
        assert self._run(pairs, k=2, **kw) == {}

    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_parallel_edges_and_self_loops_ignored(self, kw):
        # triangle + duplicated/reversed edges + self loops: degree must
        # count DISTINCT neighbors, so the triangle is a 2-core not 3-core
        pairs = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)]
        assert self._run(pairs, k=3, **kw) == {}
        assert self._run(pairs, k=2, **kw) == {1: 2, 2: 2, 3: 2}

    def test_empty_input(self):
        assert self._run([], k=2) == {}

    @pytest.mark.parametrize("kw", [{}, {"single_task_edges": 0}],
                             ids=["fast", "loop"])
    def test_random_graph_matches_naive(self, kw):
        rng = np.random.RandomState(11)
        pairs = [(int(a), int(b))
                 for a, b in rng.randint(0, 40, size=(160, 2))]
        for k in (2, 3, 5):
            assert self._run(pairs, k=k, **kw) == _naive_kcore(pairs, k)


class TestDegreeHistogram:
    def test_matches_naive(self):
        from pdf_extract_ray.ops.graph import degree_histogram
        rng = np.random.RandomState(17)
        m = 500
        src = rng.randint(0, 40, m)
        dst = rng.randint(0, 40, m)
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        out = degree_histogram(_ds(t).repartition(6)).to_pandas()
        # naive: undirected simple graph degrees
        pairs = set()
        for a, b in zip(src.tolist(), dst.tolist()):
            if a != b:
                pairs.add((a, b))
                pairs.add((b, a))
        deg: dict = {}
        for a, _ in pairs:
            deg[a] = deg.get(a, 0) + 1
        exp = pd.Series(list(deg.values())).value_counts().sort_index()
        assert out["degree"].tolist() == exp.index.tolist()
        assert out["n_nodes"].tolist() == exp.tolist()
        assert (out["degree"].to_numpy()[1:]
                > out["degree"].to_numpy()[:-1]).all()

    def test_self_loops_and_parallel_edges_ignored(self):
        from pdf_extract_ray.ops.graph import degree_histogram
        t = pa.table({"src": pa.array([1, 1, 1, 2, 3], pa.int64()),
                      "dst": pa.array([1, 2, 2, 1, 3], pa.int64())})
        out = degree_histogram(_ds(t)).to_pandas()
        # only edge 1-2 survives: two nodes of degree 1
        assert out["degree"].tolist() == [1]
        assert out["n_nodes"].tolist() == [2]


class TestTransitionEntropy:
    def test_matches_naive_counts(self):
        import math
        from pdf_extract_ray.ops.events import transition_entropy
        rng = np.random.RandomState(23)
        n = 400
        types = np.array(["view", "cart", "buy"], dtype=object)
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 10, n), pa.int64()),
            "ts": pa.array(pd.to_datetime("2024-01-01")
                           + pd.to_timedelta(rng.randint(0, 9999, n),
                                             unit="s")),
            "event_type": pa.array(types[rng.randint(0, 3, n)])})
        out = transition_entropy(_ds(t).repartition(5)) \
            .set_index("prev_type")
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        counts: dict = {}
        for _, grp in df.groupby("user_id"):
            et = grp["event_type"].tolist()
            for a, b in zip(et[:-1], et[1:]):
                counts.setdefault(a, {})
                counts[a][b] = counts[a].get(b, 0) + 1
        for prev, dist in counts.items():
            tot = sum(dist.values())
            h = sum(-(o / tot) * math.log(o / tot)
                    for _, o in sorted(dist.items()))
            assert int(out.loc[prev, "n_trans"]) == tot
            assert int(out.loc[prev, "entropy_ppm"]) \
                == math.floor(h * 1_000_000)
