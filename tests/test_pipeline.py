"""Pipeline-level tests (SURVEY.md §5 plan, item 3): the Ray Data pipeline
must produce byte-identical per-url text to the single-process engine, and
resume from its checkpoint manifest."""
import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from pdf_extract_ray.data.pages import make_pages_table, pages_parquet_path
from pdf_extract_ray.engine.api import extract_text_from_mem
from pdf_extract_ray.engine.html_extract import extract_html_text, sniff_payload
from pdf_extract_ray.pipelines.extract import run_extract

N_ROWS = 120


def reference_rows():
    """Single-process ground truth over the same synthetic table."""
    tbl = make_pages_table(N_ROWS)
    out = {}
    for url, payload in zip(tbl.column("url").to_pylist(),
                            tbl.column("html").to_pylist()):
        kind = sniff_payload(payload or b"")
        try:
            if kind == "pdf":
                out[url] = ("ok", extract_text_from_mem(payload))
            elif kind == "html":
                out[url] = ("ok", extract_html_text(payload))
            else:
                out[url] = (kind if kind == "empty" else "skipped", "")
        except Exception:
            out[url] = ("error", "")
    return out


@pytest.fixture(scope="module")
def extract_run(ray_session, tmp_path_factory):
    in_dir = pages_parquet_path(N_ROWS, n_shards=4,
                                cache_dir="/tmp/pdf_extract_ray_test_cache")
    out_dir = str(tmp_path_factory.mktemp("extract_out"))
    job = run_extract(in_dir, out_dir, batch_size=8)
    return in_dir, out_dir, job


def load_results(out_dir):
    rows = {}
    for f in glob.glob(os.path.join(out_dir, "part=*", "*.parquet")):
        t = pq.read_table(f)
        for r in t.to_pylist():
            rows[r["url"]] = r
    return rows


def test_byte_identical_per_url(extract_run):
    _in, out_dir, job = extract_run
    got = load_results(out_dir)
    want = reference_rows()
    assert len(got) == N_ROWS == len(want)
    for url, (w_status, w_text) in want.items():
        r = got[url]
        assert r["status"] == ("empty" if w_status == "ok" and not w_text
                               else w_status), url
        if w_status == "ok":
            assert r["extracted_text"] == w_text, url  # byte-identical


def test_spans_consistent(extract_run):
    _in, out_dir, _job = extract_run
    for r in load_results(out_dir).values():
        if r["status"] == "ok" and r["spans"]:
            text = r["extracted_text"]
            for s in r["spans"]:
                assert 0 <= s["start"] <= s["end"] <= len(text)
            # spans cover the non-separator characters in order
            assert all(a["start"] <= b["start"]
                       for a, b in zip(r["spans"], r["spans"][1:])
                       if a["page"] == b["page"])


def test_manifest_lineage_and_metrics(extract_run):
    _in, out_dir, job = extract_run
    manifests = sorted(glob.glob(os.path.join(out_dir, "manifest", "*.json")))
    assert manifests
    total = 0
    for m in manifests:
        d = json.load(open(m))
        assert d["lineage"]["input_files"], m
        assert d["rows"] > 0 and d["extract_wall_s"] > 0
        assert "statuses" in d and d["docs_per_s"] > 0
        total += d["rows"]
    assert total == N_ROWS
    assert job["rows"] == N_ROWS


def test_resume_skips_completed(extract_run):
    in_dir, out_dir, _job = extract_run
    n_parts = len(glob.glob(os.path.join(out_dir, "manifest", "*.json")))
    # everything done -> full skip
    job2 = run_extract(in_dir, out_dir, batch_size=8)
    assert job2["skipped_partitions"] == n_parts
    assert job2["partitions"] == 0
    # drop one manifest -> exactly that partition reruns
    victim = sorted(glob.glob(os.path.join(out_dir, "manifest", "*.json")))[0]
    os.remove(victim)
    job3 = run_extract(in_dir, out_dir, batch_size=8)
    assert job3["partitions"] == 1
    assert job3["skipped_partitions"] == n_parts - 1
    assert os.path.exists(victim)
    # rerun must REPLACE the partition dir, not append: no duplicate rows
    assert len(load_results(out_dir)) == N_ROWS
    total_rows = sum(pq.ParquetFile(f).metadata.num_rows
                     for f in glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    assert total_rows == N_ROWS


def test_output_partitioned(extract_run):
    _in, out_dir, _job = extract_run
    parts = glob.glob(os.path.join(out_dir, "part=*"))
    assert len(parts) > 1  # never one giant file


def test_size_bucketed_same_results(extract_run, ray_session, tmp_path):
    """The skew-bucketed pipeline produces the same rows as the plain one."""
    in_dir, plain_out, _job = extract_run
    out_dir = str(tmp_path / "bucketed")
    job = run_extract(in_dir, out_dir, size_buckets=True,
                      size_threshold_bytes=4096)
    assert job["rows"] == N_ROWS
    got = load_results(out_dir)
    want = load_results(plain_out)
    assert set(got) == set(want)
    for url, r in got.items():
        assert r["extracted_text"] == want[url]["extracted_text"], url
        assert r["status"] == want[url]["status"], url


def test_textprep_composed(ray_session):
    """Composed prep pipeline: dedup + enrichment over a corpus with
    deliberate duplicate payloads."""
    import ray
    from pdf_extract_ray.pipelines.textprep import textprep_dataset
    in_dir = pages_parquet_path(N_ROWS, n_shards=4,
                                cache_dir="/tmp/pdf_extract_ray_test_cache")
    ds = ray.data.read_parquet(in_dir, columns=["url", "html"])
    df = textprep_dataset(ds, num_partitions=4).to_pandas()
    assert len(df) > 0
    # dedup contract: one row per distinct extracted text
    assert df["extracted_text"].nunique() == len(df)
    # enrichment present and sane
    assert (df["n_tokens"] >= 1).all()
    assert df["quality_score"].between(0, 1).all()
    assert set(df["pred_lang"]).issubset({"en", "de", "fr", "es", "hu", "und"})
    # survivors are the minimum url per text group
    full = {}
    tbl = make_pages_table(N_ROWS)
    from pdf_extract_ray.engine.html_extract import extract_html_text, sniff_payload
    from pdf_extract_ray.engine.api import extract_text_from_mem
    for url, payload in zip(tbl.column("url").to_pylist(),
                            tbl.column("html").to_pylist()):
        kind = sniff_payload(payload or b"")
        try:
            text = (extract_text_from_mem(payload) if kind == "pdf"
                    else extract_html_text(payload) if kind == "html" else "")
        except Exception:
            text = ""
        if text:
            full.setdefault(text, []).append(url)
    expect = {min(urls) for urls in full.values()}
    assert set(df["url"]) == expect


def test_textprep_checkpointed_resume(ray_session, tmp_path):
    """Two-phase resumable textprep: phase 1 reuses the extract manifest
    machinery (per-partition skip), phase 2 has an atomic completion
    marker; a partially-wiped job redoes only the missing pieces."""
    import os

    from pdf_extract_ray.data.pages import pages_parquet_path
    from pdf_extract_ray.pipelines.textprep import run_textprep
    src = pages_parquet_path(200, n_giants=0, n_shards=2)
    out = str(tmp_path / "tp")

    m1 = run_textprep(src, out, num_partitions=4)
    assert m1["rows_out"] > 0
    assert m1["extract"]["partitions"] == 2

    # full resume: marker short-circuits everything
    m2 = run_textprep(src, out, num_partitions=4)
    assert m2 == m1

    # partial resume: wipe the phase-2 marker + ONE extract manifest
    os.remove(os.path.join(out, "manifest", "textprep.json"))
    mans = sorted(os.listdir(os.path.join(out, "extracted", "manifest")))
    os.remove(os.path.join(out, "extracted", "manifest", mans[0]))
    m3 = run_textprep(src, out, num_partitions=4)
    assert m3["rows_out"] == m1["rows_out"]
    assert m3["extract"]["partitions"] == 1      # only the wiped one reran
    assert m3["extract"]["skipped_partitions"] == 1


def test_ccprep_composed_and_resume(ray_session, tmp_path):
    """Full CC-style chain: extract -> enrich -> exact dedup -> quality
    filter -> near-dup removal, with two-phase checkpoint resume."""
    import os

    import ray

    from pdf_extract_ray.data.pages import pages_parquet_path
    from pdf_extract_ray.pipelines.ccprep import ccprep_dataset, run_ccprep
    src = pages_parquet_path(200, n_giants=0, n_shards=2)

    ds = ray.data.read_parquet(src, columns=["url", "html"])
    df = ccprep_dataset(ds, min_quality=0.1, neardup_threshold=0.95) \
        .to_pandas()
    assert len(df) > 0
    assert (df.quality_score >= 0.1).all()
    assert df.doc_id.is_unique

    out = str(tmp_path / "cc")
    m1 = run_ccprep(src, out, min_quality=0.1, neardup_threshold=0.95)
    assert m1["rows_out"] == len(df)  # file path == lazy path
    m2 = run_ccprep(src, out, min_quality=0.1, neardup_threshold=0.95)
    assert m2 == m1  # marker short-circuit
    assert os.path.exists(os.path.join(out, "manifest", "ccprep.json"))


class TestReleasePipeline:
    SF = "/root/testdata/sf0.001"

    def _pages(self):
        import importlib.util
        import os

        import ray
        spec = importlib.util.spec_from_file_location(
            "entry_rel", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return ray.data.read_parquet(m._pages_dir(self.SF),
                                     columns=["url", "html"])

    def _run(self):
        from pdf_extract_ray.pipelines.release import release_dataset
        return release_dataset(
            self._pages(), min_quality=0.1, neardup_threshold=0.95) \
            .to_pandas().sort_values("seq_id").reset_index(drop=True)

    def test_deterministic_and_budgeted(self):
        import pandas as pd
        a, b = self._run(), self._run()
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
        # budget: multi-doc sequences stay within max_tokens (256);
        # only single-doc sequences may exceed it
        multi = a[a["n_docs"] > 1]
        assert (multi["n_tokens"] <= 256).all()
        # shards bounded, ranks contiguous per shard
        assert a["shard"].between(0, 7).all()
        for _, sub in a.groupby("shard"):
            assert sorted(sub["pos"]) == list(range(1, len(sub) + 1))

    def test_eval_slice_and_contaminated_absent(self):
        import numpy as np
        from pdf_extract_ray.ops.corpus import decontaminate
        from pdf_extract_ray.pipelines.ccprep import ccprep_dataset
        import pyarrow as pa
        import ray
        surv = ccprep_dataset(self._pages(), min_quality=0.1,
                              neardup_threshold=0.95)
        docs = surv.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "text": b.column("extracted_text")}),
            batch_format="pyarrow").materialize()
        flags = decontaminate(docs, n=13, bench_mod=97,
                              with_totals=True).to_pandas()
        hard = flags[(flags["n_grams"] > 0)
                     & (2 * flags["n_overlaps"] >= flags["n_grams"])]
        bad = set(hard["doc_id"])
        out = self._run()
        # no packed sequence may contain a bench-slice or contaminated
        # doc: seq_id is the first member id; verify via the member
        # count proxy — rebuild the clean set and repack must match
        clean = docs.to_pandas()
        clean = clean[(clean["doc_id"] % 97 != 0)
                      & ~clean["doc_id"].isin(bad)]
        total_clean_ids = set(clean["doc_id"])
        # every seq_id must be a clean doc id (seq_id = first member)
        assert set(out["seq_id"]).issubset(total_clean_ids)

    def test_run_release_checkpoint_and_resume(self, tmp_path):
        import importlib.util
        import json
        import os

        from pdf_extract_ray.pipelines.release import run_release
        spec = importlib.util.spec_from_file_location(
            "entry_rel2", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "__ray_entry__.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        pages = m._pages_dir(self.SF)
        out = str(tmp_path / "rel")
        met = run_release(pages, out)
        assert met["rows_out"] > 0
        assert set(met["phases"]) >= {"ccprep", "decontaminate",
                                      "gopher_gate", "pack", "shard",
                                      "total"}
        # shard-partitioned layout on disk
        shards = [d for d in os.listdir(os.path.join(out, "release"))
                  if d.startswith("shard=")]
        assert len(shards) >= 1
        # resume returns the SAME manifest without recomputation
        met2 = run_release(pages, out)
        assert met2 == met
