"""WARC source reader: framing, gzip member layout, damage totality,
and end-to-end composition with the extraction pipeline."""
import numpy as np
import pyarrow as pa
import pytest

from pdf_extract_ray.sources.warc import (parse_warc_records, read_warc,
                                          warc_rows, write_warc)

TS = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def _rows():
    return [
        ("http://a.example/1", TS, b"<html><body><p>" + b"alpha one " * 30
         + b"</p></body></html>"),
        ("http://a.example/2", TS + 1_000_000,
         b"<html><body><p>" + b"beta two " * 30 + b"</p></body></html>"),
    ]


class TestFraming:
    def test_roundtrip_plain_and_gzip(self, tmp_path):
        for gz in (False, True):
            p = str(tmp_path / f"t{int(gz)}.warc")
            write_warc(_rows(), p, gzip_members=gz)
            tab = warc_rows(p, open(p, "rb").read())
            assert tab.num_rows == 2
            assert tab.column("url").to_pylist() == [r[0] for r in _rows()]
            assert tab.column("html").to_pylist() == [r[2] for r in _rows()]
            ts = tab.column("warc_ts").to_numpy(zero_copy_only=False) \
                .astype("datetime64[s]").astype(np.int64)
            assert ts[0] == TS // 1_000_000

    def test_skips_damage_and_non_response(self):
        good = bytearray()
        write = lambda rec: good.extend(rec)
        # a warcinfo record (skipped), a damaged length, a good response
        write(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
              b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
        write(b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://x/\r\n"
              b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
              b"Content-Length: notanumber\r\n\r\n")
        http = b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>"
        write(b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: http://y/\r\n"
              b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
              + f"Content-Length: {len(http)}\r\n\r\n".encode()
              + http + b"\r\n\r\n")
        recs = list(parse_warc_records(bytes(good)))
        assert [r[0] for r in recs] == ["http://y/"]
        assert recs[0][2] == b"<html>ok</html>"

    def test_truncated_tail_is_total(self):
        import gzip as _g
        p_rows = list(parse_warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://z/\r\n"
            b"Content-Length: 99999\r\n\r\nshort"))
        assert p_rows == []
        # broken gzip -> empty, not raise
        assert warc_rows("x", b"\x1f\x8b" + b"junk").num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestReadWarcPipeline:
    def test_read_and_extract_end_to_end(self, tmp_path):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        from pdf_extract_ray.pipelines.extract import extract_dataset
        p1 = str(tmp_path / "a.warc.gz")
        p2 = str(tmp_path / "b.warc")
        write_warc(_rows(), p1, gzip_members=True)
        write_warc([("http://b.example/9", TS,
                     b"<html><body><p>" + b"gamma nine " * 30
                     + b"</p></body></html>")], p2)
        ds = read_warc([p1, p2])
        out = extract_dataset(ds, with_spans=False).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert len(out) == 3
        assert (out["status"] == "ok").all()
        # byte parity with the single-process engine per url
        for url, ts, html in _rows():
            exp = extract_html_text(html)
            got = out[out["url"] == url]["extracted_text"].iloc[0]
            assert got == exp


@pytest.mark.usefixtures("ray_session")
class TestWetReader:
    def test_wet_roundtrip_and_type_isolation(self, tmp_path):
        from pdf_extract_ray.sources.warc import read_wet, write_wet
        p = str(tmp_path / "c.wet.gz")
        rows = [("http://w.example/1", TS, "hello wet world"),
                ("http://w.example/2", TS + 5, "zweite seite")]
        write_wet(rows, p, gzip_members=True)
        out = read_wet([p]).to_pandas().sort_values("url") \
            .reset_index(drop=True)
        assert out["text"].tolist() == [r[2] for r in rows]
        # a WET file contains no response records -> read_warc sees none
        assert read_warc([p]).to_pandas().shape[0] == 0


@pytest.mark.usefixtures("ray_session")
class TestJsonlSource:
    def test_jsonl_roundtrip(self, tmp_path):
        import json

        from pdf_extract_ray.sources.warc import read_docs_jsonl
        p = str(tmp_path / "docs.jsonl")
        rows = [{"doc_id": 1, "text": "hello world", "lang": "en"},
                {"doc_id": 2, "text": "zwei drei", "lang": "de"}]
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        out = read_docs_jsonl([p]).to_pandas().sort_values("doc_id")
        assert out["text"].tolist() == ["hello world", "zwei drei"]
        assert out["lang"].tolist() == ["en", "de"]


@pytest.mark.usefixtures("ray_session")
class TestWarcPdfPayload:
    def test_pdf_records_extract_through_engine(self, tmp_path):
        from pdf_extract_ray.data.pdfgen import pdf_simple_helvetica
        from pdf_extract_ray.engine.api import extract_text_from_mem
        from pdf_extract_ray.pipelines.extract import extract_dataset
        from pdf_extract_ray.sources.warc import read_warc, write_warc
        pdf = pdf_simple_helvetica("warc carried pdf payload")
        p = str(tmp_path / "pdfs.warc.gz")
        write_warc([("http://p.example/doc.pdf", TS, pdf)], p,
                   gzip_members=True)
        out = extract_dataset(read_warc([p]),
                              with_spans=False).to_pandas()
        assert len(out) == 1
        assert out["status"].iloc[0] == "ok"
        assert out["kind"].iloc[0] == "pdf"
        assert out["extracted_text"].iloc[0] \
            == extract_text_from_mem(pdf)


@pytest.mark.usefixtures("ray_session")
class TestWarcToReleaseEndToEnd:
    def test_raw_warc_shards_to_packed_training_shards(self, tmp_path):
        """The north-star path in one test: raw Common-Crawl-style WARC
        shards -> extract -> dedup/near-dup -> decontaminate -> gopher
        -> packed, sharded training sequences."""
        import pandas as pd

        from pdf_extract_ray.data.pages import make_payload
        from pdf_extract_ray.pipelines.release import release_dataset
        from pdf_extract_ray.sources.warc import read_warc, write_warc

        rows = [(f"http://cc.example/{i}", TS + i, make_payload(i))
                for i in range(120)]
        p1 = str(tmp_path / "shard0.warc.gz")
        p2 = str(tmp_path / "shard1.warc.gz")
        write_warc(rows[:60], p1, gzip_members=True)
        write_warc(rows[60:], p2, gzip_members=True)

        def run():
            return release_dataset(
                read_warc([p1, p2]), min_quality=0.05,
                neardup_threshold=0.95, min_words=3,
                max_dup_2gram_frac=0.9, max_top_2gram_frac=0.9) \
                .to_pandas().sort_values("seq_id") \
                .reset_index(drop=True)

        out = run()
        assert len(out) > 0
        assert set(out.columns) == {"seq_id", "text", "n_docs",
                                    "n_tokens", "shard", "pos"}
        multi = out[out["n_docs"] > 1]
        assert (multi["n_tokens"] <= 256).all()
        # determinism end to end, including the WARC parse
        pd.testing.assert_frame_equal(out, run())
