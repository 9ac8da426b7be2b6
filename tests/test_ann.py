"""Similarity-search quality gates over the embeddings table."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


class TestIvfRecall:
    def test_ivf_recall_vs_bruteforce(self, ray_session, sf_dir):
        """IVF with default nprobe must reach recall@10 >= 0.9 against the
        exact brute-force top-k on the same queries."""
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_ivf

        exact = knn_bruteforce(sf_dir)
        approx = knn_ivf(sf_dir)

        def neighbor_sets(t):
            out = {}
            for r in t.to_pylist():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        e, a = neighbor_sets(exact), neighbor_sets(approx)
        assert set(e) == set(a)
        recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"IVF recall@10 = {recall:.2f}"

    def test_lsh_recall_vs_bruteforce(self, ray_session, sf_dir):
        """SRP-LSH with default bits/tables must reach recall@10 >= 0.9
        against brute force (deterministic: seeded hyperplanes over the
        fixed synthetic embeddings)."""
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_lsh

        exact = knn_bruteforce(sf_dir)
        approx = knn_lsh(sf_dir)

        def neighbor_sets(t):
            out = {}
            for r in t.to_pylist():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        e, a = neighbor_sets(exact), neighbor_sets(approx)
        assert set(e) == set(a)
        recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"LSH recall@10 = {recall:.2f}"


class TestEmbeddingDedup:
    def test_pairs_match_duckdb(self, ray_session, sf_dir):
        import duckdb

        import __ray_entry__ as em

        t = em.queries()["dedup_embedding"](sf_dir)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        want = con.execute(em.oracle_sql()["dedup_embedding"]).fetch_arrow_table()
        assert t.to_pylist() == want.to_pylist()

    def test_empty_threshold(self, ray_session, sf_dir):
        from frankensearch_ray.pipelines.dedup import embedding_cosine_pairs

        assert len(embedding_cosine_pairs(sf_dir, threshold=1.01)) == 0
