"""fsfs lexical chunk policy (lexical_pipeline.rs:112-162) tests."""

from __future__ import annotations

from frankensearch_ray.pipelines.chunks import chunk_text, count_lexical_tokens


class TestChunkText:
    def test_default_policy_shape(self):
        text = "x" * 2000
        cs = chunk_text(text)
        assert [(c["byte_start"], c["byte_end"]) for c in cs] == [
            (0, 768),
            (672, 1440),
            (1344, 2000),
        ]
        assert [c["ordinal"] for c in cs] == [0, 1, 2]

    def test_short_doc_single_chunk(self):
        cs = chunk_text("hello world")
        assert len(cs) == 1 and cs[0]["byte_end"] == 11

    def test_empty(self):
        assert chunk_text("") == []

    def test_non_ascii_boundary_floors(self):
        # byte 768 falls inside a 2-byte char -> end floors to 767
        cs = chunk_text("a" + "é" * 500)
        assert cs[0]["byte_end"] == 767
        assert cs[1]["byte_start"] == 671  # floor(767-96) on a boundary

    def test_overlap_ge_max_clamped(self):
        cs = chunk_text("x" * 100, max_chars=10, overlap_chars=99)
        # overlap clamps to max-1 -> stride 1; still terminates
        assert cs[0]["byte_end"] == 10 and len(cs) == 91

    def test_token_count_class(self):
        # token chars: alnum plus _ - . / :
        assert count_lexical_tokens("src/main.rs foo_bar-baz a:b") == 3
        assert count_lexical_tokens("...") == 1
        assert count_lexical_tokens("   ") == 0
        assert count_lexical_tokens("é é") == 2


class TestFsfsChunkIndex:
    """FSFS 8-field chunk schema end-to-end (schema.rs:300-377,
    VERDICT r02 #8): parent_id keyword facet + token_count fast field on
    the chunk index."""

    def test_parent_facet_filters_to_one_parent(self, ray_session):
        from frankensearch_ray.contract.query_ast import QueryField, Term
        from frankensearch_ray.pipelines import chunksearch

        s = chunksearch._searcher("/root/testdata/sf0.001")
        docids, scores = s.evaluate(Term("7", [QueryField("parent_id", 1.0)]))
        assert len(docids) > 0
        ids = s.ids_for(docids)
        # chunk id = parent*1000 + ordinal
        assert all(int(i) // 1000 == 7 for i in ids)
        # const-score facet: 1.0 per hit, never BM25
        assert all(float(x) == 1.0 for x in scores)

    def test_token_count_fast_field_range(self, ray_session):
        import pyarrow.parquet as pq

        from frankensearch_ray.contract.query_ast import RangeI64
        from frankensearch_ray.pipelines import chunksearch

        sf = "/root/testdata/sf0.001"
        s = chunksearch._searcher(sf)
        docids, _ = s.evaluate(
            RangeI64(
                "token_count",
                {"value": 50, "bound": "Included"},
                None,
            )
        )
        src = pq.read_table(chunksearch.derive_chunk_source(sf))
        want = sum(1 for c in src["token_count"].to_pylist() if c >= 50)
        assert len(docids) == want
