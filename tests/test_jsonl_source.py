"""JSONL source tests: write -> read roundtrip fidelity (exact text
bytes through JSON escaping, gzip shards), damage totality (corrupt
lines salvage the rest of the shard, truncated gzip salvages the
readable prefix, empty/garbage files parse to nothing), and column
pruning.  The sf0.01 oracle (jsonl_roundtrip: per-source count + char
total + min md5 recomputed from the roundtripped text) covers the
composed pipeline."""
import gzip
import json

import pandas as pd
import pytest


TRICKY = [
    'plain ascii',
    'newline\nand\ttab and "quotes" and back\\slash',
    'unicode: héllo 世界 \U0001f600  sep',
    '',
    'control \x01 char and / slash',
]


@pytest.mark.usefixtures("ray_session")
class TestJsonlRoundtrip:
    def test_write_read_exact(self, tmp_path):
        import ray
        from pdf_extract_ray.sources.jsonl import (read_jsonl,
                                                   write_jsonl_gz)
        df = pd.DataFrame({"doc_id": range(len(TRICKY)),
                           "text": TRICKY,
                           "source": ["s"] * len(TRICKY)})
        write_jsonl_gz(ray.data.from_pandas(df), str(tmp_path))
        back = read_jsonl(str(tmp_path)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert back["text"].tolist() == TRICKY
        assert back["doc_id"].tolist() == list(range(len(TRICKY)))

    def test_column_pruning(self, tmp_path):
        import ray
        from pdf_extract_ray.sources.jsonl import (read_jsonl,
                                                   write_jsonl_gz)
        df = pd.DataFrame({"doc_id": [1], "text": ["t"], "x": [9]})
        write_jsonl_gz(ray.data.from_pandas(df), str(tmp_path))
        back = read_jsonl(str(tmp_path), columns=["text"]).to_pandas()
        assert list(back.columns) == ["text"]


@pytest.mark.usefixtures("ray_session")
class TestJsonlDamage:
    def test_corrupt_line_salvages_rest(self, tmp_path):
        from pdf_extract_ray.sources.jsonl import read_jsonl
        p = tmp_path / "a.jsonl"
        lines = [json.dumps({"doc_id": 1, "text": "ok"}),
                 '{"doc_id": 2, "text": BROKEN',
                 json.dumps({"doc_id": 3, "text": "also ok"})]
        p.write_text("\n".join(lines) + "\n")
        back = read_jsonl(str(p)).to_pandas()
        assert sorted(back["doc_id"].tolist()) == [1, 3]

    def test_truncated_gzip_salvages_prefix(self, tmp_path):
        from pdf_extract_ray.sources.jsonl import read_jsonl
        payload = b"".join(
            json.dumps({"doc_id": i, "text": "x" * 50}).encode() + b"\n"
            for i in range(200))
        gz = gzip.compress(payload)
        p = tmp_path / "t.jsonl.gz"
        p.write_bytes(gz[:len(gz) // 2])  # torn shard
        back = read_jsonl(str(p)).to_pandas()
        # some prefix rows survive, none corrupted
        assert 0 < len(back) < 200
        assert (back["text"].str.len() == 50).all()

    def test_garbage_and_empty_files(self, tmp_path):
        from pdf_extract_ray.sources.jsonl import read_jsonl
        (tmp_path / "g.jsonl").write_bytes(b"\x00\xff garbage \xfe")
        (tmp_path / "e.jsonl").write_bytes(b"")
        (tmp_path / "ok.jsonl").write_text(
            json.dumps({"doc_id": 7, "text": "fine"}) + "\n")
        back = read_jsonl(str(tmp_path)).to_pandas()
        assert back["doc_id"].tolist() == [7]
