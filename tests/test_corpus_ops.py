"""Unit tests for ops/corpus.py (decontamination, repetition stats,
chunk dedup, tf-idf top terms) over small in-memory tables with
hand-computed answers plus naive-Python property checks (the sf0.01
DuckDB oracle covers the same operators at scale)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray
    return ray.data.from_arrow(tbl)


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def _naive_grams(text, n):
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    def test_overlap_counts(self):
        from pdf_extract_ray.ops.corpus import decontaminate
        # doc 0 (0 % 11 == 0) is the benchmark; grams are 2-words
        tbl = _docs([
            (0, "a b c d"),            # bench grams: "a b", "b c", "c d"
            (1, "a b x y b c"),        # overlaps: "a b", "b c" -> 2
            (2, "x y z"),              # no overlap
            (3, "c d"),                # overlap: "c d" -> 1
        ])
        out = decontaminate(_ds(tbl), n=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.doc_id.tolist() == [1, 2, 3]
        assert out.n_overlaps.tolist() == [2, 0, 1]
        assert out.contaminated.tolist() == [True, False, True]

    def test_short_docs_report_zero(self):
        from pdf_extract_ray.ops.corpus import decontaminate
        tbl = _docs([(0, "a b c d e"), (1, "a b"), (2, "q")])
        out = decontaminate(_ds(tbl), n=5).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.doc_id.tolist() == [1, 2]
        assert out.n_overlaps.tolist() == [0, 0]

    def test_matches_naive_sets(self):
        from pdf_extract_ray.ops.corpus import decontaminate
        rng = np.random.default_rng(7)
        vocab = list("abcdefg")
        rows = [(i, " ".join(rng.choice(vocab, rng.integers(3, 40))))
                for i in range(40)]
        n = 3
        bench = set()
        for i, t in rows:
            if i % 11 == 0:
                bench |= _naive_grams(t, n)
        want = {i: len(_naive_grams(t, n) & bench)
                for i, t in rows if i % 11 != 0}
        out = decontaminate(_ds(_docs(rows)), n=n).to_pandas()
        got = dict(zip(out.doc_id, out.n_overlaps))
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestRepetitionScores:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import repetition_scores
        tbl = _docs([
            (1, "a b a b a"),   # words: 5/2 distinct; 2-grams: "a b"x2,
                                # "b a"x2 -> 4 total, 2 distinct, top 2
            (2, "x"),           # 1 word, no 2-grams
            (3, "p q r"),       # all distinct
        ])
        out = repetition_scores(_ds(tbl)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.n_words.tolist() == [5, 1, 3]
        assert out.n_distinct_words.tolist() == [2, 1, 3]
        assert out.n_2grams.tolist() == [4, 0, 2]
        assert out.n_distinct_2grams.tolist() == [2, 0, 2]
        assert out.top_2gram_count.tolist() == [2, 0, 1]

    def test_matches_naive(self):
        from pdf_extract_ray.ops.corpus import repetition_scores
        rng = np.random.default_rng(3)
        vocab = list("abcd")
        rows = [(i, " ".join(rng.choice(vocab, rng.integers(1, 25))))
                for i in range(30)]
        out = repetition_scores(_ds(_docs(rows))).to_pandas()
        for _, r in out.iterrows():
            t = dict(rows)[r.doc_id]
            w = t.split(" ")
            g = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
            from collections import Counter
            assert r.n_words == len(w)
            assert r.n_distinct_words == len(set(w))
            assert r.n_2grams == len(g)
            assert r.n_distinct_2grams == len(set(g))
            assert r.top_2gram_count == (max(Counter(g).values())
                                         if g else 0)


@pytest.mark.usefixtures("ray_session")
class TestGopherFilter:
    def test_gate_rules(self):
        from pdf_extract_ray.ops.corpus import gopher_filter
        tbl = _docs([
            (1, " ".join(f"w{i}" for i in range(20))),    # clean -> keep
            (2, " ".join(["a b"] * 10)),                  # dup-heavy
            (3, "short doc"),                             # too few words
            (4, " ".join(f"w{i}" for i in range(200))),   # too many words
        ])
        out = gopher_filter(_ds(tbl), min_words=10, max_words=100,
                            max_dup_2gram_frac=0.2,
                            max_top_2gram_frac=0.2).to_pandas()
        assert out.doc_id.tolist() == [1]
        assert out.n_words.tolist() == [20]
        assert out.dup_2gram_frac.tolist() == [0.0]

    def test_single_word_doc_passes_gram_rules(self):
        from pdf_extract_ray.ops.corpus import gopher_filter
        out = gopher_filter(_ds(_docs([(7, "solo")])), min_words=1,
                            max_words=5).to_pandas()
        assert out.doc_id.tolist() == [7]
        assert out.dup_2gram_frac.tolist() == [0.0]
        assert out.top_2gram_frac.tolist() == [0.0]


@pytest.mark.usefixtures("ray_session")
class TestChunkDedup:
    def test_first_occurrence_wins(self):
        from pdf_extract_ray.ops.corpus import chunk_dedup
        tbl = _docs([
            (1, "a b c d"),        # chunks (2w): "a b", "c d"
            (2, "a b x y"),        # "a b" dup -> keeps "x y"
            (3, "c d a b"),        # both dup -> doc vanishes
            (4, "c d q"),          # "c d" dup -> keeps "q"
        ])
        out = chunk_dedup(_ds(tbl), chunk_words=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.doc_id.tolist() == [1, 2, 4]
        assert out.text.tolist() == ["a b c d", "x y", "q"]
        assert out.n_chunks_kept.tolist() == [2, 1, 1]

    def test_within_doc_duplicate_spans_collapse(self):
        from pdf_extract_ray.ops.corpus import chunk_dedup
        tbl = _docs([(5, "a b a b c")])  # chunks: "a b", "a b", "c"
        out = chunk_dedup(_ds(tbl), chunk_words=2).to_pandas()
        assert out.text.tolist() == ["a b c"]
        assert out.n_chunks_kept.tolist() == [2]

    def test_chunk_order_preserved(self):
        from pdf_extract_ray.ops.corpus import chunk_dedup
        words = [f"w{i}" for i in range(23)]
        tbl = _docs([(9, " ".join(words))])
        out = chunk_dedup(_ds(tbl), chunk_words=4).to_pandas()
        assert out.text.tolist() == [" ".join(words)]
        assert out.n_chunks_kept.tolist() == [6]  # 5 full + 1 partial


@pytest.mark.usefixtures("ray_session")
class TestTfidfTopTerms:
    def test_rarity_ranking(self):
        from pdf_extract_ray.ops.corpus import tfidf_top_terms
        tbl = _docs([
            (1, "common rare common"),   # rare df=1 tf=1 > common df=3
            (2, "common common unique"),  # unique df=1
            (3, "common solo solo"),     # solo df=1 tf=2
        ])
        out = tfidf_top_terms(_ds(tbl)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out.term.tolist() == ["rare", "unique", "solo"]
        assert out.tf.tolist() == [1, 1, 2]
        assert out.df.tolist() == [1, 1, 1]

    def test_tie_breaks_on_term(self):
        from pdf_extract_ray.ops.corpus import tfidf_top_terms
        # both terms tf=1 df=1 -> alphabetically first wins
        tbl = _docs([(1, "zeta alpha"), (2, "zeta alpha")])
        out = tfidf_top_terms(_ds(tbl)).to_pandas()
        # after doc 1+2 share both terms: df=2 for each, still tied
        assert set(out.term) == {"alpha"}


@pytest.mark.usefixtures("ray_session")
class TestKernels:
    def test_gram_hashes_respect_row_boundaries(self):
        from pdf_extract_ray.ops.corpus import _word_hashes, _gram_hashes
        row_of, wh, counts = _word_hashes(["a b c", "d e"])
        assert counts.tolist() == [3, 2]
        grow, gh = _gram_hashes(row_of, wh, 2)
        # "a b","b c" from row 0; "d e" from row 1 — never "c d"
        assert grow.tolist() == [0, 0, 1]
        row_of2, wh2, _ = _word_hashes(["c d"])
        _, gh2 = _gram_hashes(row_of2, wh2, 2)
        assert gh2[0] not in set(gh.tolist())

    def test_word_hash_equality_matches_strings(self):
        from pdf_extract_ray.ops.corpus import _word_hashes
        _, wh, _ = _word_hashes(["x y x", "y x"])
        assert wh[0] == wh[2] == wh[4]
        assert wh[1] == wh[3]
        assert wh[0] != wh[1]


@pytest.mark.usefixtures("ray_session")
class TestFuzzyDecontaminate:
    def test_planted_near_copy_flags(self):
        import ray
        from pdf_extract_ray.ops.corpus import fuzzy_decontaminate
        words = [f"w{i}" for i in range(40)]
        bench_text = " ".join(words)                    # doc 0 (bench)
        near = " ".join(words[:38] + ["x", "y"])        # doc 1: high overlap
        far = " ".join(f"z{i}" for i in range(40))      # doc 2: disjoint
        short = "a b c"                                 # doc 3: <5 words
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([bench_text, near, far, short],
                             pa.string())})
        out = fuzzy_decontaminate(
            ray.data.from_arrow(tbl), threshold_pct=50).to_pandas()
        got = dict(zip(out.doc_id, out.contaminated))
        # train docs only (doc 0 is the bench slice)
        assert set(out.doc_id) == {1, 2, 3}
        # doc1: 34 shared 5-grams of 36 each -> jaccard 34/38 >= 0.5
        assert got[1] and not got[2] and not got[3]
        n = dict(zip(out.doc_id, out.n_contaminating))
        assert n[1] == 1 and n[2] == 0 and n[3] == 0

    def test_threshold_boundary_integer_exact(self):
        import ray
        from pdf_extract_ray.ops.corpus import fuzzy_decontaminate
        # bench doc: grams G = {g1..g6}; train doc shares exactly s of
        # them with na=nb=6 -> jaccard = s/(12-s); threshold 50% hits
        # exactly at s=4 (4/8 = 0.5, >= holds)
        w = [f"c{i}" for i in range(10)]  # 6 grams for 10 words
        bench = " ".join(w)
        # train: first 8 words shared (4 grams), then diverge
        train = " ".join(w[:8] + ["q1", "q2"])
        tbl = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([bench, train], pa.string())})
        out = fuzzy_decontaminate(
            ray.data.from_arrow(tbl), threshold_pct=50).to_pandas()
        assert bool(out[out.doc_id == 1].contaminated.iloc[0]) is True
        out49 = fuzzy_decontaminate(
            ray.data.from_arrow(tbl), threshold_pct=51).to_pandas()
        assert bool(out49[out49.doc_id == 1].contaminated.iloc[0]) is False


@pytest.mark.usefixtures("ray_session")
class TestPackSequences:
    def _docs(self, rows):
        import ray
        import pyarrow as pa
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}))

    def test_invariants_and_determinism(self):
        from pdf_extract_ray.ops.corpus import pack_sequences
        rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 13) % 40)))
                for i in range(60)]
        rows.append((999, " ".join(f"x{j}" for j in range(100))))  # giant
        ds = self._docs(rows)
        out = pack_sequences(ds, max_tokens=50).to_pandas()
        out2 = pack_sequences(self._docs(rows), max_tokens=50).to_pandas()
        # deterministic across runs
        pd.testing.assert_frame_equal(
            out.sort_values("seq_id").reset_index(drop=True),
            out2.sort_values("seq_id").reset_index(drop=True))
        # every input doc lands in exactly one sequence
        assert int(out["n_docs"].sum()) == len(rows)
        # budget respected unless a sequence is a single oversized doc
        over = out[out["n_tokens"] > 50]
        assert (over["n_docs"] == 1).all()
        # token accounting is exact
        total_in = sum(len(t.split()) for _, t in rows)
        assert int(out["n_tokens"].sum()) == total_in
        # text joins members with the document separator
        joined = out[out["n_docs"] > 1].iloc[0]
        assert joined["text"].count("\n\n") == joined["n_docs"] - 1

    def test_oversized_doc_isolated(self):
        from pdf_extract_ray.ops.corpus import pack_sequences
        rows = [(1, "a b c"), (2, " ".join(["t"] * 30)), (3, "d e")]
        out = pack_sequences(self._docs(rows), max_tokens=10).to_pandas()
        big = out[out["seq_id"] == 2]
        assert len(big) == 1 and int(big["n_docs"].iloc[0]) == 1
        assert int(big["n_tokens"].iloc[0]) == 30


@pytest.mark.usefixtures("ray_session")
class TestBm25TopDocs:
    def test_matches_real_bm25_ordering(self):
        # the algebraic key (W + 3*N*dl)/tf must induce EXACTLY the
        # classic BM25 within-term ordering (k1=1.2, b=0.75, rational
        # idf) — verify against a naive float BM25 on a corpus with
        # varied dl and tf
        from pdf_extract_ray.ops.corpus import bm25_top_docs
        rows = [
            (1, "apple apple banana cherry"),
            (2, "apple banana banana banana cherry date elder fig"),
            (3, "apple"),
            (4, "banana cherry cherry date date date"),
            (5, "elder elder elder elder fig"),
        ]
        out = bm25_top_docs(_ds(_docs(rows)), k=3).to_pandas()
        texts = {d: t.split(" ") for d, t in rows}
        n_docs = len(rows)
        w_total = sum(len(w) for w in texts.values())
        avgdl = w_total / n_docs
        dfc = {}
        for w in texts.values():
            for t in set(w):
                dfc[t] = dfc.get(t, 0) + 1
        k1, b = 1.2, 0.75
        for term in dfc:
            idf = (n_docs - dfc[term] + 0.5) / (dfc[term] + 0.5)
            scored = []
            for d, w in texts.items():
                tf = w.count(term)
                if tf == 0:
                    continue
                denom = tf + k1 * (1 - b + b * len(w) / avgdl)
                scored.append((-idf * tf * (k1 + 1) / denom, d))
            want = [d for _, d in sorted(scored)][:3]
            got = out[out.term == term].sort_values("rank")
            assert got.doc_id.tolist() == want, term
            assert got["rank"].tolist() == list(range(1, len(want) + 1))

    def test_counts_and_types(self):
        from pdf_extract_ray.ops.corpus import bm25_top_docs
        out = bm25_top_docs(
            _ds(_docs([(7, "x y x"), (8, "y")])), k=2).to_pandas()
        row = out[(out.term == "x")].iloc[0]
        assert (row.doc_id, row.tf, row.df, row.dl) == (7, 2, 1, 3)
        assert set(out[out.term == "y"].doc_id) == {7, 8}
        for c in ("doc_id", "tf", "df", "dl", "rank"):
            assert out[c].dtype == np.int64, c


@pytest.mark.usefixtures("ray_session")
class TestDupSpanStats:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import dup_span_stats
        tbl = _docs([
            (1, "a b c d e f"),      # grams: abcde, bcdef
            (2, "a b c d e"),        # gram abcde -> dup with doc 1
            (3, "q r s t u v w"),    # 3 unique grams
            (4, "x y z"),            # < 5 words -> no row
            (5, "m m m m m m"),      # 2 positions of the SAME gram ->
                                     # within-doc duplicate counts
        ])
        out = dup_span_stats(_ds(tbl), n=5).to_pandas() \
            .set_index("doc_id").sort_index()
        assert 4 not in out.index
        assert out.loc[1].tolist() == [2, 1]   # abcde dup, bcdef unique
        assert out.loc[2].tolist() == [1, 1]
        assert out.loc[3].tolist() == [3, 0]
        assert out.loc[5].tolist() == [2, 2]

    def test_matches_naive(self):
        from pdf_extract_ray.ops.corpus import dup_span_stats
        rng = np.random.RandomState(4)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.choice(vocab, rng.randint(3, 30))))
                for i in range(60)]
        out = dup_span_stats(_ds(_docs(rows)), n=5).to_pandas() \
            .set_index("doc_id")
        from collections import Counter
        n = 5
        grams = {d: [" ".join(t.split(" ")[i:i + n])
                     for i in range(len(t.split(" ")) - n + 1)]
                 for d, t in rows}
        cnt = Counter(g for gs in grams.values() for g in gs)
        for d, gs in grams.items():
            if not gs:
                assert d not in out.index
                continue
            assert out.loc[d, "n_grams"] == len(gs)
            assert out.loc[d, "n_dup_grams"] == sum(
                1 for g in gs if cnt[g] > 1)


def _sdocs(rows):
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
class TestCrossSourceOverlap:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import cross_source_overlap
        tbl = _sdocs([
            ("s1", "a b c d"),      # 2-grams: ab bc cd
            ("s1", "a b"),          # ab (dup within source — distinct)
            ("s2", "b c d e"),      # bc cd de
            ("s3", "x y"),          # xy (no overlap with anyone)
        ])
        out = cross_source_overlap(_ds(tbl), n=2).to_pandas()
        out = out.sort_values(["source_a", "source_b"]).reset_index(
            drop=True)
        # s1 ∩ s2 = {bc, cd}; s3 shares nothing -> omitted
        assert out.source_a.tolist() == ["s1"]
        assert out.source_b.tolist() == ["s2"]
        assert out.shared_ngrams.tolist() == [2]

    def test_matches_naive_sets(self):
        from pdf_extract_ray.ops.corpus import cross_source_overlap
        rng = np.random.default_rng(11)
        vocab = list("abcdef")
        rows = [(f"s{int(i % 4)}",
                 " ".join(rng.choice(vocab, rng.integers(3, 25))))
                for i in range(60)]
        n = 3
        per_src = {}
        for s, t in rows:
            per_src.setdefault(s, set()).update(_naive_grams(t, n))
        want = {}
        srcs = sorted(per_src)
        for i, a in enumerate(srcs):
            for b in srcs[i + 1:]:
                k = len(per_src[a] & per_src[b])
                if k:
                    want[(a, b)] = k
        out = cross_source_overlap(_ds(_sdocs(rows)), n=n).to_pandas()
        got = {(r.source_a, r.source_b): r.shared_ngrams
               for r in out.itertuples()}
        assert got == want

    def test_empty_and_disjoint(self):
        from pdf_extract_ray.ops.corpus import cross_source_overlap
        out = cross_source_overlap(
            _ds(_sdocs([("a", "p q r"), ("b", "x y z")])), n=2
        ).to_pandas()
        assert len(out) == 0
        assert list(out.columns) == ["source_a", "source_b",
                                     "shared_ngrams"]


@pytest.mark.usefixtures("ray_session")
class TestVocabJaccard:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import vocab_jaccard
        tbl = _sdocs([
            ("s1", "a b c"),
            ("s1", "a d"),          # s1 vocab {a b c d}
            ("s2", "c d e"),        # s2 vocab {c d e}
        ])
        out = vocab_jaccard(_ds(tbl)).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r.source_a, r.source_b) == ("s1", "s2")
        assert r.inter_words == 2          # {c, d}
        assert r.union_words == 5          # {a b c d e}
        assert r.jaccard == 2.0 / 5.0

    def test_matches_naive_sets(self):
        from pdf_extract_ray.ops.corpus import vocab_jaccard
        rng = np.random.default_rng(13)
        vocab = [f"w{int(k)}" for k in range(30)]
        rows = [(f"s{int(i % 5)}",
                 " ".join(rng.choice(vocab, rng.integers(1, 20))))
                for i in range(80)]
        per_src = {}
        for s, t in rows:
            per_src.setdefault(s, set()).update(t.split(" "))
        out = vocab_jaccard(_ds(_sdocs(rows))).to_pandas()
        for r in out.itertuples():
            a, b = per_src[r.source_a], per_src[r.source_b]
            assert r.inter_words == len(a & b)
            assert r.union_words == len(a | b)
            assert r.jaccard == len(a & b) / len(a | b)
        # every overlapping pair present
        srcs = sorted(per_src)
        n_pairs = sum(1 for i, a in enumerate(srcs)
                      for b in srcs[i + 1:]
                      if per_src[a] & per_src[b])
        assert len(out) == n_pairs


@pytest.mark.usefixtures("ray_session")
class TestGroupedIqrOutliers:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.analytics import grouped_iqr_outliers
        # group g: values 1..10 plus an extreme 1000
        vals = list(range(1, 11)) + [1000]
        tbl = pa.table({
            "source": pa.array(["g"] * len(vals), pa.string()),
            "n_chars": pa.array(vals, pa.int64())})
        out = grouped_iqr_outliers(_ds(tbl), "source",
                                   "n_chars").to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        # quantile_disc over 11 values: q1 = v[ceil(.25*11)=3] = 3,
        # q3 = v[ceil(.75*11)=9] = 9; fences [-6, 18] -> only 1000 out
        assert (r.q1, r.q3) == (3, 9)
        assert r.n_outliers == 1
        assert r.n_docs == 11

    def test_no_outliers_uniform(self):
        from pdf_extract_ray.ops.analytics import grouped_iqr_outliers
        tbl = pa.table({
            "source": pa.array(["g"] * 8, pa.string()),
            "n_chars": pa.array([5] * 8, pa.int64())})
        out = grouped_iqr_outliers(_ds(tbl), "source",
                                   "n_chars").to_pandas()
        assert out.iloc[0].n_outliers == 0


@pytest.mark.usefixtures("ray_session")
class TestGramEditPairs:
    def test_hand_computed_no_false_positives(self):
        from pdf_extract_ray.ops.corpus import gram_edit_pairs
        # grams of doc A: abcd, bcde; doc B: abce (abcd~abce dist 1,
        # bcde is dist>1 from both).  'dcba' (doc C) is a reversal of
        # abcd -> distance 4, and 'abdc' is a transposition of abcd ->
        # Levenshtein distance 2: NEITHER may be reported even though
        # transpositions share no positional-deletion bucket by
        # construction.  Windows never cross doc boundaries.
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["abcde", "abce", "dcba", "abdc"],
                             pa.string())})
        out = gram_edit_pairs(_ds(docs), n=4).to_pandas()
        pairs = set(zip(out["gram_a"], out["gram_b"]))
        assert ("abcd", "abce") in pairs
        assert all(sum(x != y for x, y in zip(a, b)) == 1
                   for a, b in pairs)
        assert ("abcd", "abdc") not in pairs
        assert ("abcd", "dcba") not in pairs
        # boundary check: no gram may contain characters of two docs
        grams = set(out["gram_a"]) | set(out["gram_b"])
        assert all(g.isalpha() for g in grams)

    def test_exactly_once_emission(self):
        from pdf_extract_ray.ops.corpus import gram_edit_pairs
        # 'aaaa' vs 'aaab' differ at one position; the pair must appear
        # exactly once even though both grams share several deletion
        # buckets ('aaa' at multiple positions).
        docs = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aaaa", "aaab"], pa.string())})
        out = gram_edit_pairs(_ds(docs), n=4).to_pandas()
        assert list(zip(out["gram_a"], out["gram_b"])) \
            == [("aaaa", "aaab")]


@pytest.mark.usefixtures("ray_session")
class TestRemoveDupSpans:
    def test_hand_computed(self):
        from pdf_extract_ray.ops.corpus import remove_dup_spans
        # docs 1+2 share the 5-gram 'a b c d e' -> words 0..4 covered
        # in both; doc 3 is shorter than n and is kept verbatim; doc 4
        # repeats one gram WITHIN itself -> fully covered -> ''.
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c d e f", "a b c d e x",
                              "q w e r",
                              "z z z z z z z z z z"], pa.string())})
        out = remove_dup_spans(_ds(docs), n=5).to_pandas() \
            .set_index("doc_id").sort_index()
        assert list(out["clean_text"]) == ["f", "x", "q w e r", ""]
        assert list(out["n_removed"].astype(int)) == [5, 5, 0, 10]

    def test_no_dups_identity(self):
        from pdf_extract_ray.ops.corpus import remove_dup_spans
        docs = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d e f g", "h i j k l m n"],
                             pa.string())})
        out = remove_dup_spans(_ds(docs), n=5).to_pandas() \
            .set_index("doc_id").sort_index()
        assert list(out["clean_text"]) == ["a b c d e f g",
                                           "h i j k l m n"]
        assert out["n_removed"].sum() == 0


def _naive_ssjoin(rows, n, t_num, t_den):
    """Brute-force exact Jaccard over distinct word n-gram sets."""
    sets = {i: _naive_grams(t, n) for i, t in rows}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ga, gb = sets[a], sets[b]
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            union = len(ga | gb)
            if inter * t_den >= t_num * union:
                out.add((a, b, inter, union))
    return out


@pytest.mark.usefixtures("ray_session")
class TestSsjoinJaccard:
    def _run(self, rows, **kw):
        from pdf_extract_ray.ops.dedup import ssjoin_jaccard
        out = ssjoin_jaccard(_ds(_docs(rows)), **kw).to_pandas()
        if len(out) == 0:  # Ray 2.49: to_pandas of all-empty drops cols
            return set()
        return set(zip(out["doc_id_a"].astype(int),
                       out["doc_id_b"].astype(int),
                       out["n_inter"].astype(int),
                       out["n_union"].astype(int)))

    def test_hand_computed(self):
        rows = [(1, "a b c d e"), (2, "a b c d x"),
                (3, "p q r s t"), (4, "p q r s t")]
        # 3-gram sets: 1={abc,bcd,cde}, 2={abc,bcd,cdx} -> J=2/4=0.5
        got = self._run(rows, n=3, t_num=1, t_den=2)
        assert got == {(1, 2, 2, 4), (3, 4, 3, 3)}

    def test_matches_bruteforce_randomized(self):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.choice(vocab, rng.integers(0, 15))))
                for i in range(40)]
        for n, tn, td in [(1, 3, 5), (2, 1, 2), (3, 1, 3)]:
            got = self._run(rows, n=n, t_num=tn, t_den=td)
            assert got == _naive_ssjoin(rows, n, tn, td), (n, tn, td)

    def test_hot_token_order_no_false_negatives(self):
        # every doc shares one stop word; hot-token ordering must push
        # it out of prefixes WITHOUT losing above-threshold pairs
        rows = [(i, f"the u{i} v{i} x{i} y{i}") for i in range(30)]
        rows += [(100, "the a b c d"), (101, "the a b c e")]
        got = self._run(rows, n=1, t_num=3, t_den=5,
                        hot_k=4, sample_mod=1)
        assert got == _naive_ssjoin(rows, 1, 3, 5)

    def test_empty_and_short_docs(self):
        rows = [(1, ""), (2, ""), (3, "a b"), (4, "x")]
        assert self._run(rows, n=3, t_num=1, t_den=2) == set()


class TestPmiPairs:
    def test_matches_naive(self):
        import itertools
        import math

        import ray

        from pdf_extract_ray.ops.corpus import pmi_pairs
        docs = [
            "the cat sat", "the dog sat", "the cat ran",
            "dog park fun", "cat park", "the the the",
            "fun cat dog", "park run fun dog",
        ]
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs, pa.string())})
        out = pmi_pairs(ray.data.from_arrow(t).repartition(3),
                        vocab_k=6, k=20).to_pandas()

        # naive reference
        sets = [set(w for w in d.split(" ") if w) for d in docs]
        df: dict = {}
        for s in sets:
            for w in s:
                df[w] = df.get(w, 0) + 1
        vocab = sorted(df, key=lambda w: (-df[w], w))[:6]
        n = len(docs)
        pairs: dict = {}
        for s in sets:
            present = sorted(x for x in s if x in vocab)
            for a, b in itertools.combinations(present, 2):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
        exp = sorted(
            ((a, b, c, (c * n * 1_000_000) // (df[a] * df[b]))
             for (a, b), c in pairs.items()),
            key=lambda r: (-r[3], r[0], r[1]))[:20]
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == exp
        # sanity: PMI ppm is monotone in the true log-PMI
        logs = [math.log(r[3]) for r in exp if r[3] > 0]
        assert logs == sorted(logs, reverse=True)


class TestNeardupEvalReport:
    def test_planted_dups_full_recall(self):
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "entry_ndeval", os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
                "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        out = m._q_neardup_eval_report("/root/testdata/sf0.001")
        r = out.iloc[0]
        # graded mutations put pairs on BOTH sides of the threshold, so
        # the report is informative (not trivially 1.0) yet the stack
        # must stay strong on the clear cases
        assert int(r["n_truth"]) > 10
        assert r["recall"] >= 0.9
        assert 0.7 <= r["precision"] <= 1.0
        assert r["f1"] >= 0.8


class TestSsjoinContainment:
    def test_subset_doc_found_and_matches_naive(self):
        import itertools

        import ray

        from pdf_extract_ray.ops.dedup import ssjoin_containment
        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
        docs = [
            (1, base),                                   # full doc
            (2, " ".join(base.split()[:10])),            # strict subset
            (3, base + " extra words appended here ok"), # superset
            (4, "totally different content with no overlap at all x y"),
        ]
        t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                      "text": pa.array([d[1] for d in docs], pa.string())})
        out = ssjoin_containment(ray.data.from_arrow(t).repartition(3),
                                 n=3, t_num=3, t_den=4).to_pandas()
        got = {(r.doc_id_a, r.doc_id_b) for r in out.itertuples()}

        def grams(s):
            w = s.split(" ")
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

        exp = set()
        for (ia, ta), (ib, tb) in itertools.permutations(docs, 2):
            ga, gb = grams(ta), grams(tb)
            if ga and 4 * len(ga & gb) >= 3 * len(ga):
                exp.add((ia, ib))
        assert got == exp
        assert (2, 1) in got      # subset doc contained in full doc
        assert (1, 3) in got      # full doc contained in superset
        assert (1, 2) not in got  # big-in-small direction fails


class TestReadabilityScores:
    def test_matches_naive_counts_and_formula(self):
        import math
        import re
        from pdf_extract_ray.ops.corpus import readability_scores
        texts = ["Hello world. This is fine! Right?",
                 "aeiou bcd xyz. one two three four",
                 "", "NO VOWELS HR", None,
                 "Unicode space stays one word."]
        srcs = ["a", "a", "b", "b", "b", "c"]
        t = pa.table({"source": pa.array(srcs, pa.string()),
                      "text": pa.array(texts, pa.string())})
        out = readability_scores(_ds(t).repartition(3)).to_pandas() \
            .set_index("source")
        w_re = re.compile(r"[^ \t\n\r\f\v]+")
        s_re = re.compile(r"[.!?]+")
        y_re = re.compile(r"[aeiouAEIOU]+")
        for src in ["a", "b", "c"]:
            tx = [x or "" for x, s in zip(texts, srcs) if s == src]
            W = sum(len(w_re.findall(x)) for x in tx)
            S = sum(len(s_re.findall(x)) for x in tx)
            Y = sum(len(y_re.findall(x)) for x in tx)
            assert int(out.loc[src, "words"]) == W
            assert int(out.loc[src, "sentences"]) == S
            assert int(out.loc[src, "syllables"]) == Y
            exp = math.floor((206.835 - 1.015 * (W / max(S, 1))
                              - 84.6 * (Y / max(W, 1))) * 1000)
            assert int(out.loc[src, "flesch_milli"]) == exp

    def test_unicode_space_is_not_a_separator(self):
        from pdf_extract_ray.ops.corpus import readability_scores
        # \xa0 must NOT split words: the explicit ASCII class is the
        # cross-engine (Python re vs RE2) contract
        t = pa.table({"source": pa.array(["x"], pa.string()),
                      "text": pa.array(["one\u00a0two"], pa.string())})
        out = readability_scores(_ds(t)).to_pandas()
        assert int(out["words"].iloc[0]) == 1
