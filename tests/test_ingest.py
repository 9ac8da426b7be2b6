"""sources/ingest.py — JSONL/CSV staging: content parity, determinism,
resume, and end-to-end index-build equivalence with a parquet-native
build (same ids, same f32 score bits)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.sources import ingest

SF = "/root/testdata/sf0.001"
COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def jsonl_corpus(tmp_path_factory):
    """documents.parquet split into 3 jsonl shards."""
    d = tmp_path_factory.mktemp("jsonl_src")
    t = pq.read_table(f"{SF}/documents.parquet", columns=COLUMNS)
    per = (t.num_rows + 2) // 3
    paths = []
    for i in range(3):
        p = str(d / f"part_{i}.jsonl")
        with open(p, "w") as f:
            for row in t.slice(i * per, per).to_pylist():
                f.write(json.dumps(row, sort_keys=True) + "\n")
        paths.append(p)
    return paths, t


class TestStaging:
    def test_jsonl_content_parity(self, ray_session, jsonl_corpus, tmp_path):
        paths, src = jsonl_corpus
        staged = ingest.stage_to_parquet(
            paths, str(tmp_path / "out"), fmt="jsonl", columns=COLUMNS
        )
        got = pa.concat_tables(pq.read_table(p) for p in staged).sort_by(
            "doc_id"
        )
        assert got.num_rows == src.num_rows
        for c in COLUMNS:
            assert got[c].to_pylist() == src[c].to_pylist(), c

    def test_csv_content_parity(self, ray_session, tmp_path):
        import pyarrow.csv as pcsv

        src = pq.read_table(f"{SF}/documents.parquet", columns=COLUMNS)
        p = str(tmp_path / "docs.csv")
        pcsv.write_csv(src, p)
        staged = ingest.stage_to_parquet(
            [p], str(tmp_path / "out"), fmt="csv", columns=COLUMNS
        )
        got = pq.read_table(staged[0]).sort_by("doc_id")
        for c in COLUMNS:
            assert got[c].to_pylist() == src[c].to_pylist(), c

    def test_deterministic_bytes(self, ray_session, jsonl_corpus, tmp_path):
        paths, _src = jsonl_corpus
        a = ingest.stage_to_parquet(
            paths, str(tmp_path / "a"), fmt="jsonl", columns=COLUMNS
        )
        b = ingest.stage_to_parquet(
            paths, str(tmp_path / "b"), fmt="jsonl", columns=COLUMNS
        )
        for pa_, pb in zip(a, b):
            with open(pa_, "rb") as fa, open(pb, "rb") as fb:
                assert fa.read() == fb.read()

    def test_resume_skips_fresh_outputs(self, ray_session, jsonl_corpus, tmp_path):
        paths, _src = jsonl_corpus
        out = str(tmp_path / "out")
        staged = ingest.stage_to_parquet(
            paths, out, fmt="jsonl", columns=COLUMNS
        )
        mtimes = [os.path.getmtime(p) for p in staged]
        again = ingest.stage_to_parquet(
            paths, out, fmt="jsonl", columns=COLUMNS
        )
        assert again == staged
        assert [os.path.getmtime(p) for p in staged] == mtimes

    def test_chunked_jsonl_parse(self, ray_session, tmp_path, monkeypatch):
        """Force multi-chunk parsing and confirm schema pinning holds."""
        monkeypatch.setattr(ingest, "JSONL_CHUNK_BYTES", 512)
        rows = [
            {"doc_id": i, "text": f"tok{i} " * 20, "n": i % 5}
            for i in range(200)
        ]
        p = str(tmp_path / "many.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        n = ingest.convert_file(p, str(tmp_path / "o.parquet"), "jsonl")
        got = pq.read_table(str(tmp_path / "o.parquet"))
        assert n == 200 and got.num_rows == 200
        assert got["doc_id"].to_pylist() == [r["doc_id"] for r in rows]


class TestIndexEquivalence:
    def test_jsonl_built_index_matches_parquet_build(
        self, ray_session, jsonl_corpus, tmp_path
    ):
        """An index built from staged-JSONL parquet must score identically
        (same external ids, same f32 score bits) to the parquet-native
        documents index."""
        from frankensearch_ray.build import BuildConfig, build_index
        from frankensearch_ray.pipelines.docsearch import searcher_for
        from frankensearch_ray.search.searcher import LocalSearcher

        paths, _src = jsonl_corpus
        staged = ingest.stage_to_parquet(
            paths, str(tmp_path / "staged"), fmt="jsonl", columns=COLUMNS
        )
        cfg = BuildConfig(
            id_col="doc_id",
            content_col="text",
            html_col=None,
            verify_text_col=None,
            num_shards=4,
            salt_threshold=200,
            salt_buckets=4,
            target_partition_rows=2_000,
            numeric_cols=["n_chars"],
        )
        idx = str(tmp_path / "idx")
        build_index(staged, idx, cfg, resume=False)
        s_jsonl = LocalSearcher(idx)
        s_ref = searcher_for(SF)
        for q in ["hash merge window", "spark sort", "table"]:
            a = s_jsonl.search(q, limit=10)["hits"]
            b = s_ref.search(q, limit=10)["hits"]
            assert [(h["id"], h["score_bits"]) for h in a] == [
                (h["id"], h["score_bits"]) for h in b
            ], q


class TestIngestEdges:
    def test_empty_jsonl_stages_cleanly(self, ray_session, tmp_path):
        p = str(tmp_path / "empty.jsonl")
        open(p, "w").close()
        n = ingest.convert_file(p, str(tmp_path / "o.parquet"), "jsonl")
        assert n == 0
        assert pq.read_metadata(str(tmp_path / "o.parquet")).num_rows == 0

    def test_blank_lines_skipped(self, ray_session, tmp_path):
        p = str(tmp_path / "gaps.jsonl")
        with open(p, "w") as f:
            f.write('{"a": 1}\n\n   \n{"a": 2}\n')
        n = ingest.convert_file(p, str(tmp_path / "o.parquet"), "jsonl")
        assert n == 2
        assert pq.read_table(str(tmp_path / "o.parquet"))["a"].to_pylist() == [1, 2]

    def test_csv_quoting_roundtrip(self, ray_session, tmp_path):
        import pyarrow.csv as pcsv

        src = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ['has, comma', 'has "quotes"', "has\nnewline"], pa.string()
                ),
            }
        )
        p = str(tmp_path / "tricky.csv")
        pcsv.write_csv(src, p)
        n = ingest.convert_file(p, str(tmp_path / "o.parquet"), "csv")
        got = pq.read_table(str(tmp_path / "o.parquet"))
        assert n == 3
        assert got["text"].to_pylist() == src["text"].to_pylist()

    def test_unknown_format_rejected(self, ray_session, tmp_path):
        with pytest.raises(ValueError):
            ingest.convert_file("x", "y", "avro")


class TestGzip:
    def test_gz_jsonl_stages_identically(self, ray_session, jsonl_corpus, tmp_path):
        """A .jsonl.gz shard must stage to byte-identical parquet as its
        uncompressed twin (the crawl-shard arrival format)."""
        import gzip

        paths, _src = jsonl_corpus
        gz_paths = []
        for p in paths:
            gp = str(tmp_path / (os.path.basename(p) + ".gz"))
            with open(p, "rb") as f, gzip.open(gp, "wb") as g:
                g.write(f.read())
            gz_paths.append(gp)
        plain = ingest.stage_to_parquet(
            paths, str(tmp_path / "plain"), fmt="jsonl", columns=COLUMNS
        )
        gz = ingest.stage_to_parquet(
            gz_paths, str(tmp_path / "gz"), fmt="jsonl", columns=COLUMNS
        )
        assert len(plain) == len(gz) == len(paths)
        for a, b in zip(sorted(plain), sorted(gz)):
            ta = pq.read_table(a)
            tb = pq.read_table(b)
            assert ta.equals(tb), (a, b)

    def test_gz_csv_stages_identically(self, ray_session, tmp_path):
        import gzip

        rows = 'doc_id,text\n1,"a, quoted"\n2,plain\n'
        p = str(tmp_path / "x.csv")
        gp = str(tmp_path / "x.csv.gz")
        with open(p, "w") as f:
            f.write(rows)
        with gzip.open(gp, "wb") as g:
            g.write(rows.encode())
        a = ingest.stage_to_parquet([p], str(tmp_path / "a"), fmt="csv")
        b = ingest.stage_to_parquet([gp], str(tmp_path / "b"), fmt="csv")
        assert pq.read_table(a[0]).equals(pq.read_table(b[0]))
