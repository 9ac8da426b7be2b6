"""Relevance-quality harness gates (``core/src/metrics_eval.rs``).

Unit pins mirror the reference's own metric tests; the harness gate runs
the 120-doc reference corpus + ``queries.json`` qrels through the BM25
engine and pins nDCG/MRR/Recall (deterministic engine -> exact floats)
with bit-reproducible bootstrap CIs.  ``relevance.json``'s
``expected_top_10`` comes from the reference's HYBRID (semantic+lexical)
tier, which BASELINE scopes out — it is reported as a ceiling, not
asserted as parity.
"""

from __future__ import annotations

import pytest

from frankensearch_ray.eval.metrics import (
    bootstrap_ci,
    bootstrap_compare,
    evaluate_ranking,
    map_at_k,
    mrr,
    ndcg_at_k,
    recall_at_k,
)


class TestMetricUnits:
    """Mirrors metrics_eval.rs's inline #[test] pins."""

    def test_ndcg_perfect_ranking(self):
        assert ndcg_at_k(["a", "b", "c"], ["a", "b", "c"], 3) == pytest.approx(1.0)

    def test_ndcg_reversed_vs_perfect(self):
        rev = ndcg_at_k(["c", "b", "a"], ["a"], 3)
        assert 0.0 < rev < 1.0

    def test_ndcg_empty_relevant(self):
        assert ndcg_at_k(["a"], [], 10) == 0.0

    def test_ndcg_empty_retrieved(self):
        assert ndcg_at_k([], ["a"], 10) == 0.0

    def test_ndcg_k_zero(self):
        assert ndcg_at_k(["a"], ["a"], 0) == 0.0

    def test_ndcg_duplicates_count_once(self):
        once = ndcg_at_k(["a", "b"], ["a"], 2)
        duped = ndcg_at_k(["a", "a"], ["a"], 2)
        assert duped == pytest.approx(once)

    def test_mrr_rank1_and_rank3(self):
        assert mrr(["a", "x", "y"], ["a"]) == pytest.approx(1.0)
        assert mrr(["x", "y", "a"], ["a"]) == pytest.approx(1.0 / 3.0)
        assert mrr(["x", "y"], ["a"]) == 0.0

    def test_recall(self):
        assert recall_at_k(["a", "b"], ["a", "b"], 2) == pytest.approx(1.0)
        assert recall_at_k(["a", "x"], ["a", "b"], 2) == pytest.approx(0.5)

    def test_map_partial(self):
        # relevant at ranks 1 and 3 of k=3, |rel|=2:
        # (1/1 + 2/3) / 2
        assert map_at_k(["a", "x", "b"], ["a", "b"], 3) == pytest.approx(
            (1.0 + 2.0 / 3.0) / 2.0
        )

    def test_bootstrap_ci_deterministic(self):
        scores = [0.2, 0.4, 0.6, 0.8, 1.0]
        a = bootstrap_ci(scores, seed=42)
        b = bootstrap_ci(scores, seed=42)
        assert a == b
        assert a.lower <= a.mean <= a.upper
        assert a.mean == pytest.approx(0.6)
        assert bootstrap_ci([], seed=1) is None

    def test_bootstrap_compare_identical_is_insignificant(self):
        s = [0.5, 0.6, 0.7, 0.8]
        cmp = bootstrap_compare(s, list(s))
        assert cmp.mean_diff == 0.0
        assert not cmp.significant

    def test_bootstrap_compare_clear_difference(self):
        a = [0.9, 0.92, 0.88, 0.91, 0.9, 0.93, 0.89, 0.9]
        b = [0.1, 0.12, 0.08, 0.11, 0.1, 0.13, 0.09, 0.1]
        cmp = bootstrap_compare(a, b)
        assert cmp.significant and cmp.ci_lower > 0


@pytest.fixture(scope="module")
def t1_searcher(ray_session, tmp_path_factory):
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.search.searcher import LocalSearcher
    from frankensearch_ray.sources import pages

    d = str(tmp_path_factory.mktemp("relevance") / "idx")
    build_index(
        pages.tier_t1(),
        d,
        BuildConfig(
            id_col="url",
            html_col="html",
            verify_text_col="text",
            num_shards=4,
            salt_threshold=25,
            salt_buckets=2,
            target_partition_rows=50,
        ),
        resume=False,
    )
    return LocalSearcher(d)


class TestHarness:
    def _results(self, searcher, reference_queries):
        out = {}
        rel = {}
        for q in reference_queries:
            hits = searcher.search(q["query"], limit=10)["hits"]
            out[q["query"]] = [h["id"].split("/")[-1] for h in hits]
            rel[q["query"]] = q["relevant_ids"]
        return out, rel

    def test_bm25_quality_pinned(self, t1_searcher, reference_queries):
        """Engine + corpus + qrels are all deterministic: the aggregate
        metrics are EXACT floats — a silent ranking regression moves
        them.  Absolute levels are moderate by design: the qrels grade
        the reference's hybrid (semantic) tier, which BASELINE scopes
        out; the lexical engine is pinned, not maximized, here."""
        results, rel = self._results(t1_searcher, reference_queries)
        report = evaluate_ranking(results, rel, k=10, seed=42)
        means = {m: report["ci"][m].mean for m in report["ci"]}
        assert means["ndcg"] == pytest.approx(0.16007787127315432, abs=1e-12)
        assert means["map"] == pytest.approx(0.07560134310134312, abs=1e-12)
        assert means["mrr"] == pytest.approx(0.39871794871794874, abs=1e-12)
        assert means["recall"] == pytest.approx(0.1346153846153846, abs=1e-12)
        for m, ci in report["ci"].items():
            assert ci.lower <= ci.mean <= ci.upper
            assert ci.n_resamples == 1000
        # bit-reproducible CIs: same seed, same interval
        again = evaluate_ranking(results, rel, k=10, seed=42)
        assert report["ci"]["ndcg"] == again["ci"]["ndcg"]

    def test_pruned_equals_exhaustive_quality(
        self, t1_searcher, reference_queries
    ):
        """Paired bootstrap comparison drive: block-max-pruned rankings
        score IDENTICALLY to exhaustive (pruning is rank-exact), so the
        paired difference is exactly zero and insignificant."""
        rel = {q["query"]: q["relevant_ids"] for q in reference_queries}
        pruned, exhaustive = [], []
        for q in reference_queries:
            a = [
                h["id"].split("/")[-1]
                for h in t1_searcher.search(q["query"], limit=10)["hits"]
            ]
            b = [
                h["id"].split("/")[-1]
                for h in t1_searcher.search(
                    q["query"], limit=10, pruning=False
                )["hits"]
            ]
            pruned.append(ndcg_at_k(a, rel[q["query"]], 10))
            exhaustive.append(ndcg_at_k(b, rel[q["query"]], 10))
        cmp = bootstrap_compare(pruned, exhaustive, seed=42)
        assert cmp is not None
        assert cmp.mean_diff == 0.0
        assert not cmp.significant
