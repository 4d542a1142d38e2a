"""Training-data operator tests: dedup, similarity, text stats."""
import numpy as np
import pyarrow as pa
import pytest

from pdf_extract_ray.ops.dedup import (MinHashBatch, ngram_jaccard, simhash64)
from pdf_extract_ray.ops.textstats import (_winnow_fingerprints,
                                           quality_batch, token_count_batch)


def docs_table(rows):
    return pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.int64()),
         pa.array([r[1] for r in rows], pa.string())],
        names=["doc_id", "text"])


class TestTextStatsLocal:
    def test_token_counts(self):
        t = docs_table([(1, "a b c"), (2, ""), (3, "one")])
        out = token_count_batch(t)
        assert out.column("n_tokens").to_pylist() == [3, 0, 1]

    def test_quality(self):
        t = docs_table([(1, " ".join(["the quick brown fox"] * 30)), (2, "")])
        out = quality_batch(t)
        rows = out.to_pylist()
        assert rows[0]["quality_score"] == 1.0
        assert rows[1]["quality_score"] == 0.0
        assert rows[0]["n_tokens"] == 120

    def test_winnowing_deterministic_and_shift_robust(self):
        a = _winnow_fingerprints("the quick brown fox jumps over the dog")
        b = _winnow_fingerprints("the quick brown fox jumps over the dog")
        assert a == b and len(a) > 0
        # shared substring -> shared fingerprints
        c = _winnow_fingerprints("XX the quick brown fox jumps over the dog")
        assert set(a) & set(c)

    def test_winnowing_batch_kernel_matches_naive(self):
        # flat-array batch kernel == per-text naive winnowing (leftmost
        # window min, consecutive-selection dedupe, uint64 poly hash)
        from pdf_extract_ray.ops.textstats import _winnow_batch, _FP_BASE

        def naive(text, k=8, w=4):
            data = text.encode("utf-8", "surrogatepass")
            if len(data) < k:
                return []
            B, M = int(_FP_BASE), 1 << 64
            hs = []
            for i in range(len(data) - k + 1):
                h = 0
                for j in range(k):
                    h = (h * B + data[i + j]) % M
                hs.append(h)
            fps, last = [], -1
            for i in range(len(hs) - w + 1):
                win = hs[i:i + w]
                idx = i + win.index(min(win))
                if idx != last:
                    fps.append(min(win) >> 3)
                    last = idx
            return fps

        texts = ["", "x", "x" * 8, "ab " * 20, "é中文 unicode" * 4,
                 "the quick brown fox", "aaaaaaaaaaaaaaaa"]
        doc_of, fp = _winnow_batch(texts)
        for i, t in enumerate(texts):
            assert fp[doc_of == i].tolist() == naive(t), repr(t)


class TestMinHashLocal:
    def test_signature_similarity_tracks_jaccard(self):
        mh = MinHashBatch()
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base.replace("dog", "cat")
        far = "completely different words in this one with nothing shared"
        s1, s2, s3 = (mh.signature(t) for t in (base, near, far))
        near_sim = float(np.mean(s1 == s2))
        far_sim = float(np.mean(s1 == s3))
        assert near_sim > 0.5 > far_sim

    def test_simhash_hamming(self):
        base = " ".join(f"word{i}" for i in range(60))
        near = base.replace("word3", "wordX")
        far = " ".join(f"other{i}" for i in range(60))
        h1, h2, h3 = simhash64(base), simhash64(near), simhash64(far)
        ham_near = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
        ham_far = bin((h1 ^ h3) & ((1 << 64) - 1)).count("1")
        assert simhash64(base) == h1  # deterministic
        assert ham_near < ham_far and ham_far > 20

    def test_ngram_jaccard(self):
        assert ngram_jaccard("abcdef", "abcdef") == 1.0
        assert ngram_jaccard("abcdef", "uvwxyz") == 0.0
        assert 0.0 < ngram_jaccard("abcdef", "abcxyz") < 1.0


class TestOpsOnRay:
    @pytest.fixture(scope="class")
    def docs_ds(self, ray_session):
        import ray
        rows = [(i, f"doc {i} " + " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
                for i in range(40)]
        rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact dups
        return ray.data.from_arrow(docs_table(rows))

    def test_exact_dedup(self, docs_ds):
        from pdf_extract_ray.ops.dedup import exact_dedup_groups
        out = exact_dedup_groups(docs_ds).to_pandas()
        assert len(out) == 40  # 45 rows, 5 dup texts
        dup_rows = out[out["n_dups"] > 1]
        assert sorted(dup_rows["doc_id"]) == [0, 1, 2, 3, 4]
        assert (dup_rows["n_dups"] == 2).all()

    def test_exact_dedup_keep_first(self, docs_ds):
        from pdf_extract_ray.ops.dedup import exact_dedup_keep_first
        out = exact_dedup_keep_first(docs_ds).to_pandas()
        assert len(out) == 40
        assert not set(range(100, 105)) & set(out["doc_id"])

    def test_minhash_finds_exact_dups(self, docs_ds):
        from pdf_extract_ray.ops.dedup import minhash_lsh_pairs
        pairs = minhash_lsh_pairs(docs_ds, threshold=0.9).to_pandas()
        found = {tuple(p) for p in pairs[["doc_id_a", "doc_id_b"]].values}
        for i in range(5):
            assert (i, 100 + i) in found

    def test_brute_force_topk_matches_numpy(self, ray_session):
        import ray
        from pdf_extract_ray.ops.similarity import brute_force_topk
        rng = np.random.RandomState(7)
        vecs = rng.normal(size=(50, 16)).astype(np.float64)
        tbl = pa.Table.from_arrays(
            [pa.array(range(50), pa.int64()),
             pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))],
            names=["vec_id", "embedding"])
        ds = ray.data.from_arrow(tbl)
        out = brute_force_topk(ds, [0, 1], vecs[:2], k=5).to_pandas()
        # single-process ground truth (float32 round-trip like the table)
        v32 = vecs.astype(np.float32).astype(np.float64)
        v32n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
        qn = vecs[:2] / np.linalg.norm(vecs[:2], axis=1, keepdims=True)
        sims = qn @ v32n.T
        for qi in (0, 1):
            order = [i for i in np.argsort(-sims[qi]) if i != qi][:5]
            got = out[out["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
            assert got == order

    def test_image_features_plumbing(self, ray_session):
        import ray
        from pdf_extract_ray.ops.multimodal import image_features
        tbl = pa.Table.from_arrays(
            [pa.array([1, 2, 3], pa.int64()),
             pa.array([b"payload-one", b"", b"payload-three"], pa.binary())],
            names=["item_id", "payload"])
        out = image_features(ray.data.from_arrow(tbl)).to_pandas()
        assert len(out) == 3
        by_id = {r.item_id: r for r in out.itertuples()}
        assert by_id[1].status == "ok" and len(by_id[1].features) == 32
        assert by_id[2].status.startswith("error")


def test_minhash_candidates_lightweight(ray_session):
    import ray
    from pdf_extract_ray.ops.dedup import (minhash_lsh_candidates,
                                           verify_pairs_jaccard)
    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30)))
            for i in range(30)]
    rows += [(100 + i, rows[i][1]) for i in range(3)]  # exact dups
    ds = ray.data.from_arrow(docs_table(rows))
    pairs = minhash_lsh_candidates(ds)
    verified = verify_pairs_jaccard(pairs, ds, threshold=0.9).to_pandas()
    found = {tuple(p) for p in verified[["doc_id_a", "doc_id_b"]].values}
    for i in range(3):
        assert (i, 100 + i) in found


def _greedy_reference(pairs):
    """The sequential keep-smallest rule the distributed peeling must
    reproduce byte-for-byte (the round-2 driver-side implementation)."""
    norm = {(a, b) if a < b else (b, a) for a, b in pairs if a != b}
    drop = set()
    for keep_id, drop_id in sorted(norm):
        if keep_id not in drop:
            drop.add(drop_id)
    return drop


def test_greedy_drop_ids_matches_sequential(ray_session):
    import random

    import ray
    from pdf_extract_ray.ops.dedup import greedy_drop_ids

    rng = random.Random(7)
    rand_graph = [(rng.randrange(50), rng.randrange(50))
                  for _ in range(120)]         # random multigraph
    cases = [
        [],                                    # empty
        [(1, 2)],                              # single pair
        [(2, 1), (1, 2)],                      # reversed duplicate
        [(1, 2), (2, 3)],                      # chain: 3 survives via 2
        [(1, 2), (2, 3), (3, 4)],              # 2-round chain
        [(1, 2), (1, 3), (2, 3)],              # clique
        list(zip(range(0, 20), range(1, 21))),  # long chain
        [(5, 5)],                              # self-loop dropped
        rand_graph,
    ]
    # default path: peeling immediately bottoms out in the bounded
    # single-worker finish (the common small-residual case)
    for pairs in cases:
        tbl = pa.table(
            {"doc_id_a": pa.array([p[0] for p in pairs], pa.int64()),
             "doc_id_b": pa.array([p[1] for p in pairs], pa.int64())})
        out = greedy_drop_ids(ray.data.from_arrow(tbl))
        got = set() if out.count() == 0 else set(out.to_pandas()["doc_id"])
        assert got == _greedy_reference(pairs), pairs
    # forced distributed peeling (threshold 0): multi-round chain + the
    # random multigraph must still match the sequential rule exactly;
    # threshold 20 on the random graph exercises the hybrid path
    # (peel until the residual shrinks, then bounded worker finish)
    for pairs, thr in ([(1, 2), (2, 3), (3, 4)], 0), (rand_graph, 0), \
                      (rand_graph, 20):
        tbl = pa.table(
            {"doc_id_a": pa.array([p[0] for p in pairs], pa.int64()),
             "doc_id_b": pa.array([p[1] for p in pairs], pa.int64())})
        out = greedy_drop_ids(ray.data.from_arrow(tbl), n_parts=4,
                              worker_finish_threshold=thr)
        got = set() if out.count() == 0 else set(out.to_pandas()["doc_id"])
        assert got == _greedy_reference(pairs), (pairs, thr)


def test_drop_rows_by_id_paths(ray_session):
    import ray
    from pdf_extract_ray.ops.dedup import drop_rows_by_id

    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(10), pa.int64()),
         "v": pa.array(range(10), pa.int64())}))
    drops = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([2, 5, 7], pa.int64())}))
    for limit in (100, 1):  # broadcast path, then join path
        out = drop_rows_by_id(ds, drops, broadcast_limit=limit).to_pandas()
        assert sorted(out.doc_id) == [0, 1, 3, 4, 6, 8, 9]
    # empty drop set: unchanged
    empty = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64())}))
    assert drop_rows_by_id(ds, empty).count() == 10


def test_bpe_token_counts(ray_session):
    import ray
    from pdf_extract_ray.ops.textstats import bpe_token_counts
    t = docs_table([(1, "Hello world's fun!"), (2, ""), (3, "it's 42")])
    out = bpe_token_counts(ray.data.from_arrow(t)).to_pandas()
    got = dict(zip(out.doc_id, out.n_bpe_tokens))
    # Hello| world|'s| fun|! ; it|'s| 42
    assert got == {1: 5, 2: 0, 3: 3}


def test_lm_perplexity_scores(ray_session):
    import ray
    from pdf_extract_ray.ops.textstats import lm_perplexity_scores
    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(20)] + [(99, "zyx qwv unseen")]
    t = docs_table(rows)
    out = lm_perplexity_scores(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")
    # stereotypical docs score fewer bits/token than the rare-word doc
    assert out.loc[0, "lm_bits_per_token"] < out.loc[99, "lm_bits_per_token"]
    assert abs(out.loc[0, "lm_bits_per_token"]
               - out.loc[5, "lm_bits_per_token"]) < 1e-12


def test_bands_for_threshold_operating_points():
    from pdf_extract_ray.ops.dedup import bands_for_threshold
    # fewest bands whose catch prob at J == t stays >= 0.9
    assert bands_for_threshold(64, 0.95) == 4
    assert bands_for_threshold(64, 0.85) == 8
    assert bands_for_threshold(64, 0.60) == 32
    # exact dups are still caught with near-certainty at 4 bands
    b, r = 4, 16
    assert 1 - (1 - 0.99 ** r) ** b > 0.999


def test_star_bucket_keeps_cluster_connected(ray_session):
    import ray
    from pdf_extract_ray.ops.dedup import (minhash_lsh_candidates,
                                           verify_pairs_jaccard)
    # 12 identical docs: a degenerate boilerplate bucket
    text = " ".join(f"tok{j}" for j in range(40))
    rows = [(i, text) for i in range(12)]
    ds = ray.data.from_arrow(docs_table(rows))
    pairs = minhash_lsh_candidates(ds, star_bucket=4).to_pandas()
    # star fanout: O(k) per (band, bucket), never k*(k-1)/2
    assert 11 <= len(pairs) <= 11 * 16
    # every pair roots at the min id -> the cluster stays connected
    assert set(pairs["doc_id_a"]) == {0}
    assert set(pairs["doc_id_b"]) == set(range(1, 12))
    verified = verify_pairs_jaccard(
        minhash_lsh_candidates(ds, star_bucket=4), ds,
        threshold=0.95).to_pandas()
    assert set(verified["doc_id_b"]) == set(range(1, 12))


def test_resize_images_real_and_fallback(ray_session):
    import ray
    import numpy as np
    from pdf_extract_ray.ops.codecs import encode_png
    from pdf_extract_ray.ops.multimodal import resize_images, _resize_nearest

    # real path: a 4x4 PNG with known pixels resized to 2x2 must equal
    # the numpy nearest-neighbor reference exactly
    img = (np.arange(4 * 4 * 3, dtype=np.uint8)).reshape(4, 4, 3)
    want = _resize_nearest(img, 2, 2)
    t = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array([encode_png(img), b"not-an-image"], pa.binary())],
        names=["item_id", "payload"])
    out = resize_images(ray.data.from_arrow(t), width=2, height=2) \
        .to_pandas().set_index("item_id")
    r1 = out.loc[1]
    assert r1.status == "ok" and (r1.width, r1.height) == (2, 2)
    got = np.frombuffer(r1.pixels, np.uint8).reshape(2, 2, 3)
    assert (got == want).all()
    # fallback path: deterministic fake, fixed dims, declared status
    r2 = out.loc[2]
    assert r2.status == "fake" and len(r2.pixels) == 2 * 2 * 3
    # empty payload -> error row, stage stays total
    t2 = pa.Table.from_arrays(
        [pa.array([3], pa.int64()), pa.array([b""], pa.binary())],
        names=["item_id", "payload"])
    out2 = resize_images(ray.data.from_arrow(t2), width=2,
                         height=2).to_pandas()
    assert out2.iloc[0].status.startswith("error")


def test_lm_buckets_balance_and_ordering(ray_session):
    """Per-language NTILE(3) balance (sizes differ <= 1) and order:
    every head doc scores <= every tail doc within its language."""
    import ray
    from pdf_extract_ray.ops.textstats import lm_buckets
    common = "the cat sat on the mat " * 5
    rare = "zyx qwv jjk plo uhg bnm " * 5
    texts, langs = [], []
    for i in range(8):
        texts.append(common if i < 5 else rare)
        langs.append("en")
    for i in range(4):
        texts.append(common if i < 2 else rare)
        langs.append("fr")
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())})
    out = lm_buckets(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == len(texts)
    for lang, sub in out.groupby("lang"):
        sizes = sub["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        head_max = sub.loc[sub.bucket == "head", "lm_bits_q"].max()
        tail_min = sub.loc[sub.bucket == "tail", "lm_bits_q"].min()
        assert head_max <= tail_min
    # the repeated-common-word docs are the most stereotypical -> head
    en = out[out.lang == "en"].set_index("doc_id")
    assert set(en.loc[[0, 1, 2], "bucket"]) == {"head"}


def test_ngram_frequencies_adjacency_and_tiebreak(ray_session):
    """Bigrams form over the empty-filtered sequence (double spaces do
    not break adjacency) and the top-k tie-break is gram asc."""
    import ray
    from pdf_extract_ray.ops.analytics import ngram_frequencies
    t = pa.table({"text": pa.array(
        ["a b  c", "a b", "z z", "b c"], pa.string())})
    out = ngram_frequencies(ray.data.from_arrow(t), "text", k=3)
    got = list(zip(out.column("gram").to_pylist(),
                   out.column("n").to_pylist()))
    # counts: "a b" 2, "b c" 2 ("a b  c" bridges the double space), "z z" 1
    assert got == [("a b", 2), ("b c", 2), ("z z", 1)]


def test_bpe_learn_known_sequence(ray_session):
    """Classic BPE example: corpus where 'ab' is the dominant pair."""
    import ray
    from pdf_extract_ray.ops.textstats import bpe_learn
    # words: "abab" x3, "ab" x2  (via repeated docs)
    t = pa.table({"text": pa.array(
        ["abab abab abab ab ab"], pa.string())})
    out = bpe_learn(ray.data.from_arrow(t), n_merges=3).to_pandas()
    # merge 1: (a,b) count = 2*3 + 1*2 = 8
    assert (out.loc[0, "left"], out.loc[0, "right"]) == ("a", "b")
    assert int(out.loc[0, "pair_count"]) == 8
    # merge 2: (ab,ab) in "abab" -> 3; (ab,</w>) -> 3+2=5 wait:
    # after merge1 seqs: (ab,ab,</w>) c3 ; (ab,</w>) c2
    # pairs: (ab,ab)=3, (ab,</w>)=3+2=5 -> merge 2 = (ab,</w>) 5
    assert (out.loc[1, "left"], out.loc[1, "right"]) == ("ab", "</w>")
    assert int(out.loc[1, "pair_count"]) == 5
    # after merge2: (ab,ab</w>) c3 ; (ab</w>) c2 -> merge 3 (ab,ab</w>)=3
    assert (out.loc[2, "left"], out.loc[2, "right"]) == ("ab", "ab</w>")
    assert int(out.loc[2, "pair_count"]) == 3


def test_bpe_learn_stops_below_two(ray_session):
    import ray
    from pdf_extract_ray.ops.textstats import bpe_learn
    t = pa.table({"text": pa.array(["xy"], pa.string())})
    out = bpe_learn(ray.data.from_arrow(t), n_merges=10).to_pandas()
    # every pair occurs once -> no merge with count >= 2
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
class TestCountMinSketch:
    def _corpus(self, seed=0, n=300, vocab=40):
        rng = np.random.RandomState(seed)
        # zipf-ish skew so there are real heavy hitters
        words = [f"w{int(i)}" for i in
                 np.minimum(rng.zipf(1.5, 4000), vocab)]
        texts = [" ".join(words[i::n]) for i in range(n)]
        exact = {}
        for w in words:
            exact[w] = exact.get(w, 0) + 1
        return texts, exact

    def test_one_sided_guarantee_and_exactness_at_wide_width(self):
        import ray
        import pyarrow as pa
        from pdf_extract_ray.ops.sketch import cms_word_counts
        texts, exact = self._corpus()
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(texts)})).repartition(8)
        out = cms_word_counts(ds, width=1 << 14, depth=4).to_pandas()
        got = dict(zip(out.word, out.approx_count))
        assert set(got) == set(exact)
        # CM guarantee: never an undercount (holds for ANY width)
        assert all(got[w] >= c for w, c in exact.items())
        # at width >> vocab the estimate should be exact
        assert got == exact

    def test_narrow_width_overcounts_within_bound(self):
        import ray
        import pyarrow as pa
        from pdf_extract_ray.ops.sketch import cms_word_counts
        texts, exact = self._corpus(seed=3)
        n_total = sum(exact.values())
        ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
        out = cms_word_counts(ds, width=64, depth=4).to_pandas()
        got = dict(zip(out.word, out.approx_count))
        assert all(got[w] >= c for w, c in exact.items())
        # e/width * N expected overshoot bound, generous 8x slack
        bound = 8 * 2.72 * n_total / 64
        assert all(got[w] - c <= bound for w, c in exact.items())


def test_bpe_encode_stats_parity_with_replay(ray_session):
    """Greedy lowest-rank apply == replaying merges in learned order
    (the canonical equivalence), and totals add up per source."""
    import ray
    from pdf_extract_ray.ops.textstats import bpe_learn, bpe_encode_stats
    texts = ["abab abab ab banana", "banana ab abab", "z z z abab"]
    srcs = ["s1", "s1", "s2"]
    t = pa.table({"source": pa.array(srcs, pa.string()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    merges = bpe_learn(ds, n_merges=8, vocab_k=100)
    out = bpe_encode_stats(ds, merges).to_pandas() \
        .set_index("source").sort_index()

    # local replay reference: apply merges sequentially in rank order
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))

    def replay_len(word):
        seq = list(word) + ["</w>"]
        for left, right in rules:
            out_, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out_.append(left + right)
                    i += 2
                else:
                    out_.append(seq[i])
                    i += 1
            seq = out_
        return len(seq)

    import collections
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, txt in zip(srcs, texts):
        ws = txt.split()
        want[s][0] += 1
        want[s][1] += len(ws)
        want[s][2] += sum(replay_len(w) for w in ws)
    for s in ("s1", "s2"):
        assert int(out.loc[s, "n_docs"]) == want[s][0]
        assert int(out.loc[s, "n_words"]) == want[s][1]
        assert int(out.loc[s, "n_tokens"]) == want[s][2]
    # merges really compress: tokens < raw chars+1 per word
    assert int(out["n_tokens"].sum()) < sum(
        len(w) + 1 for txt in texts for w in txt.split())


def test_event_next_gaps_and_value_share(ray_session):
    import ray
    import numpy as np
    from pdf_extract_ray.ops.events import event_next_gaps, value_share
    ts = lambda s: np.datetime64(s, "us").astype("datetime64[us]")
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 8, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a"], pa.string()),
        "value": pa.array([1.0, 2.0, 4.0, 1.0], pa.float64()),
        "ts": pa.array([ts("2024-01-01T00:00:00"),
                        ts("2024-01-01T00:00:05"),
                        ts("2024-01-01T00:00:00"),
                        ts("2024-01-01T00:01:05")], pa.timestamp("us"))})
    out = event_next_gaps(ray.data.from_arrow(ev)).to_pandas()
    got = dict(zip(out.event_id, out.next_gap_us))
    assert got == {1: 5_000_000, 2: 60_000_000, 3: -1, 4: -1}

    sh = value_share(ray.data.from_arrow(ev)).to_pandas()
    got = dict(zip(sh.event_id, sh.share_ppm))
    # type a total = 400 cents: 100/400=250000 ppm, 200/400=500000
    assert got == {1: 250_000, 2: 500_000, 4: 250_000, 3: 1_000_000}
    assert dict(zip(sh.event_id, sh.value_cents)) == \
        {1: 100, 2: 200, 3: 400, 4: 100}
