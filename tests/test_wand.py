"""Pruned ≡ exhaustive differential — the reference's own internal gate
(``PLAN.md:513``): block-max pruning must never change ranks OR score bits."""

from __future__ import annotations

import numpy as np
import pytest

from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.contract.parser import parse_default
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.search.wand import search_pruned
from frankensearch_ray.sources import pages

UNION_QUERIES = [
    "rust ownership borrowing",
    "the",
    "the of and",
    "rust",
    "how do transformers work for text embeddings",
    "error handling search engine index cache memory",
    "nonexistentterm12345",
    "rust nonexistentterm12345",
]

FALLBACK_QUERIES = ['"error handling"', "+rust -python", "auth AND cache"]


@pytest.fixture(scope="module")
def t2_searcher(ray_session, tmp_index_root):
    paths = pages.tier_t2()
    index_dir = str(tmp_index_root / "t2_wand")
    cfg = BuildConfig(
        id_col="url",
        html_col="html",
        verify_text_col=None,
        num_shards=6,
        salt_threshold=2_000,  # head Zipf terms (df up to ~9k) get salted
        salt_buckets=4,
        target_partition_rows=1_250,
    )
    build_index(paths, index_dir, cfg, resume=False)
    return LocalSearcher(index_dir)


class TestPrunedEqualsExhaustive:
    @pytest.mark.parametrize("k", [1, 10, 100])
    def test_union_queries(self, t2_searcher, k):
        s = t2_searcher
        for q in UNION_QUERIES:
            node = parse_default(q).query
            pruned = search_pruned(s, node, k)
            assert pruned is not None, q
            p_doc, p_score = pruned
            docids, scores = s.evaluate(node)
            order = np.lexsort((docids, -scores.astype(np.float64)))[:k]
            assert list(p_doc) == list(docids[order]), q
            assert (
                p_score.view(np.uint32).tolist()
                == scores[order].view(np.uint32).tolist()
            ), q

    def test_fallback_shapes_return_none(self, t2_searcher):
        for q in FALLBACK_QUERIES:
            node = parse_default(q).query
            assert search_pruned(t2_searcher, node, 10) is None, q

    def test_search_api_pruned_matches_unpruned(self, t2_searcher):
        for q in UNION_QUERIES:
            a = t2_searcher.search(q, limit=10, pruning=True)["hits"]
            b = t2_searcher.search(q, limit=10, pruning=False)["hits"]
            assert [(h["docid"], h["score_bits"]) for h in a] == [
                (h["docid"], h["score_bits"]) for h in b
            ], q

    def test_offset_pages(self, t2_searcher):
        q = "the rust cache"
        full = t2_searcher.search(q, limit=30, pruning=False)["hits"]
        p2 = t2_searcher.search(q, limit=10, offset=10, pruning=True)["hits"]
        assert [h["docid"] for h in p2] == [h["docid"] for h in full[10:20]]
