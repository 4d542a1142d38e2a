"""NULL tolerance: crawl metadata is never complete — text and lang
columns arrive null.  Policy (documented at the kernels): null text ==
empty text (COALESCE(text, '')); null lang counts as 'und' in the
lang-keyed aggregates.  A 10%-null fixture must run every text-family
query without an exception; the 22 crash sites a null sweep found
(word-hash explode misalignment, md5/encode on None, split on None,
native groupby over None keys) are fixed and held here."""
import importlib.util
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

NULL_SENSITIVE = [
    "token_counts", "quality_scores", "normalize_text", "lang_id",
    "repetition_scores", "redact_pii", "fingerprints", "exact_dedup",
    "minhash_neardup", "word_frequencies", "tfidf_top_terms",
    "gopher_filter", "decontaminate", "chunk_dedup", "lang_histogram",
    "langs_per_source", "dup_span_stats", "remove_dup_spans",
    "ssjoin_jaccard", "ssjoin_containment", "prefix_dedup_best",
    "snapshot_diff", "corpus_datacard", "lm_scores", "bpe_merges",
    # round 5 text-touching ops
    "c4_line_filter", "probe_positions", "mojibake_audit",
    "line_df_removal", "skipgram_counts", "kn_discount_counts",
    "c4prep", "cms_oracle_table", "partial_corr_chars",
    "l1_line_fit",
]


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_nulls")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        if t == "documents":
            ids = tab.column("doc_id").to_numpy()
            mask = ids % 10 == 0
            texts = [None if m else v for v, m in
                     zip(tab.column("text").to_pylist(), mask)]
            langs = [None if m else v for v, m in
                     zip(tab.column("lang").to_pylist(), mask)]
            tab = tab.set_column(
                tab.schema.get_field_index("text"), "text",
                pa.array(texts, pa.string()))
            tab = tab.set_column(
                tab.schema.get_field_index("lang"), "lang",
                pa.array(langs, pa.string()))
        pq.write_table(tab, str(dst / f"{t}.parquet"))
    return str(dst)


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_nulls", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_total_on_null_text_and_lang(null_sf, name):
    m = _entry()
    out = m.queries()[name](null_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) >= 0  # no exception is the contract


@pytest.mark.usefixtures("ray_session")
def test_null_text_counts_as_empty_in_dedup(null_sf):
    # all null-text docs share md5("") -> they form ONE exact-dup group
    m = _entry()
    out = m.queries()["exact_dedup"](null_sf).to_pandas()
    big = out[out["n_dups"] >= 50]  # the 10% null slice collapses
    assert len(big) >= 1


@pytest.fixture(scope="module")
def nan_sf(tmp_path_factory):
    """Numeric nulls: 5% null prices/values, null + zero embeddings."""
    dst = tmp_path_factory.mktemp("sf_nan")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        if t == "orders":
            v = tab.column("o_totalprice").to_pylist()
            k = tab.column("o_orderkey").to_pylist()
            v = [None if kk % 20 == 0 else vv for vv, kk in zip(v, k)]
            tab = tab.set_column(
                tab.schema.get_field_index("o_totalprice"),
                "o_totalprice", pa.array(v, pa.float64()))
        if t == "events":
            v = tab.column("value").to_pylist()
            e = tab.column("event_id").to_pylist()
            v = [None if ee % 20 == 0 else vv for vv, ee in zip(v, e)]
            tab = tab.set_column(tab.schema.get_field_index("value"),
                                 "value", pa.array(v, pa.float64()))
        if t == "embeddings":
            emb = tab.column("embedding").to_pylist()
            ids = tab.column("vec_id").to_pylist()
            out = []
            for vv, ii in zip(emb, ids):
                if ii % 25 == 0:
                    out.append([0.0] * len(vv))
                elif ii % 25 == 1:
                    out.append(None)
                else:
                    out.append(vv)
            tab = tab.set_column(
                tab.schema.get_field_index("embedding"), "embedding",
                pa.array(out, pa.list_(pa.float32())))
        pq.write_table(tab, str(dst / f"{t}.parquet"))
    return str(dst)


NAN_SENSITIVE = ["orders_by_dow", "benford_digits", "ann_topk",
                 "ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq",
                 "embedding_pca", "embedding_clusters",
                 "label_centroids", "embedding_neardup",
                 "ann_recall_report", "ann_topk_filtered", "tpch_q1",
                 "user_value_integral", "record_high_events"]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", NAN_SENSITIVE)
def test_total_on_null_measures_and_embeddings(nan_sf, name):
    m = _entry()
    out = m.queries()[name](nan_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) >= 0


@pytest.mark.usefixtures("ray_session")
def test_null_embedding_never_a_neighbor(nan_sf):
    # null embeddings become zero vectors: cosine 0 -> out-ranked by
    # every real vector in a full top-10
    m = _entry()
    out = m.queries()["ann_topk"](nan_sf).to_pandas()
    null_ids = {i for i in range(0, 500) if i % 25 == 1}
    # neighbors ranked 1..5 must never be a null-embedding row
    top5 = out[out["rank"] <= 5]
    assert not set(top5["neighbor_id"]).intersection(null_ids)


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    """Exotic unicode prepended to 10% of docs: emoji, CJK, RTL,
    zero-width, combining marks, fullwidth forms, control whitespace."""
    dst = tmp_path_factory.mktemp("sf_uni")
    exotic = ["🎉🚀 汉字测试 مرحبا עברית ​‌zw",
              "é combining å \U0001F600 astral",
              "ＦＵＬＬＷＩＤＴＨ ᴀɴᴅ sᴍᴀʟʟ",
              "\t tabs\nnewlines\r\n   spaces"]
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        tab = pq.read_table(f"{SF}/{t}.parquet")
        if t == "documents":
            ids = tab.column("doc_id").to_pylist()
            texts = [exotic[i % 4] + " " + v if i % 10 == 0 else v
                     for i, v in zip(ids, tab.column("text").to_pylist())]
            tab = tab.set_column(tab.schema.get_field_index("text"),
                                 "text", pa.array(texts, pa.string()))
        pq.write_table(tab, str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ["normalize_text", "fingerprints",
                                  "ssjoin_jaccard", "lang_id",
                                  "word_length_histogram"])
def test_total_on_exotic_unicode(unicode_sf, name):
    m = _entry()
    out = m.queries()[name](unicode_sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) >= 0


@pytest.mark.usefixtures("ray_session")
def test_giant_doc_skew(tmp_path):
    """One 200k-word doc among 50 normal ones: the flat-array text
    kernels must stay memory-bounded and correct under extreme row
    skew (the documents-table analog of the pages giants)."""
    import numpy as np
    import ray

    from pdf_extract_ray.ops.corpus import dup_span_stats
    from pdf_extract_ray.ops.dedup import exact_dedup_groups, \
        minhash_lsh_pairs
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(50)]
    giant = " ".join(rng.choice(vocab, 200_000))
    tab = pa.table({
        "doc_id": pa.array(range(51), pa.int64()),
        "text": pa.array(texts + [giant], pa.string())})
    ds = ray.data.from_arrow(tab).repartition(6)
    assert exact_dedup_groups(ds).count() == 51
    # minhash signature of the giant computes (chunked kernel)
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert len(pairs) >= 0
    stats = dup_span_stats(ds, n=5).to_pandas()
    assert len(stats) == 51
    g = stats[stats["doc_id"] == 50].iloc[0]
    assert g["n_grams"] > 190_000 if "n_grams" in stats.columns \
        else True
