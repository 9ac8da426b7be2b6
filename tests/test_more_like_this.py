"""more_like_this: similar-document search invariants.

Exact (doc_id, rank) parity with the f64 SQL recomputation is covered by
the driver-gate mirror in ``test_entry_oracle.py``; these pin the
engine-side contract: seed exclusion, deterministic term selection, and
the k / rank shape.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from frankensearch_ray.pipelines import docsearch

SF = "/root/testdata/sf0.001"


class TestMoreLikeThis:
    def test_seed_excluded_and_ranks_contiguous(self, ray_session):
        t = docsearch.more_like_this(SF, seed_doc_id=7, k=10)
        ids = t["doc_id"].to_pylist()
        assert 7 not in ids
        assert t["rank"].to_pylist() == list(range(len(ids)))
        assert 0 < len(ids) <= 10

    def test_deterministic(self, ray_session):
        a = docsearch.more_like_this(SF, seed_doc_id=3, k=5)
        b = docsearch.more_like_this(SF, seed_doc_id=3, k=5)
        assert a.equals(b)

    def test_k_monotone_prefix(self, ray_session):
        """Top-5 must be the prefix of top-10 (same scorer, same ties)."""
        small = docsearch.more_like_this(SF, seed_doc_id=7, k=5)
        big = docsearch.more_like_this(SF, seed_doc_id=7, k=10)
        assert small["doc_id"].to_pylist() == big["doc_id"].to_pylist()[:5]

    def test_unknown_seed_raises(self, ray_session):
        import pytest

        n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        with pytest.raises(ValueError):
            docsearch.more_like_this(SF, seed_doc_id=n + 10_000)

    def test_selection_respects_max_terms(self, ray_session):
        """With max_terms=1 the query degenerates to a single-term search:
        every hit must actually contain that term."""
        t = docsearch.more_like_this(SF, seed_doc_id=7, k=10, max_terms=1)
        # recompute the single selected term exactly as the operator does
        import re

        s = docsearch.searcher_for(SF)
        text = (
            pq.read_table(
                f"{SF}/documents.parquet",
                columns=["doc_id", "text"],
                filters=[("doc_id", "==", 7)],
            )["text"][0].as_py()
            or ""
        )
        tf: dict[str, int] = {}
        for tok in re.split(r"[^a-z0-9]+", text.lower()):
            if 3 <= len(tok) <= 64:
                tf[tok] = tf.get(tok, 0) + 1
        from frankensearch_ray.schema import FIELD_CONTENT

        cand = sorted(
            (-f, sum(int(r["df"]) for _b, r in s.term_rows(FIELD_CONTENT, w)), w)
            for w, f in tf.items()
        )
        term = cand[0][2]
        docids, _tfs, _df, _ = s.postings(FIELD_CONTENT, term)
        have = set(int(x) for x in s.ids_for(docids))
        assert set(t["doc_id"].to_pylist()) <= have


class TestTermSuggest:
    """term_suggest invariants; exact (term, df) parity is covered by the
    driver-gate mirror in test_entry_oracle.py."""

    def test_neighborhood_complete_vs_bruteforce(self, ray_session):
        """The probe plan must find exactly the vocabulary terms at
        edit distance <= 1 — cross-checked against a full-vocab walk."""
        from frankensearch_ray.pipelines.docsearch import (
            _edit1_neighborhood,
            searcher_for,
            term_suggest,
        )
        from frankensearch_ray.schema import FIELD_CONTENT

        q = "mergge"
        s = searcher_for(SF)
        vocab = set()
        for sid in range(s.num_shards):
            vocab.update(s.shards.iter_terms_range(sid, FIELD_CONTENT))

        def ed1(a: str, b: str) -> bool:
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            if la == lb:
                return sum(x != y for x, y in zip(a, b)) <= 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = 0
            while i < la and a[i] == b[i]:
                i += 1
            return a[i:] == b[i + 1 :]

        brute = {t for t in vocab if ed1(q, t)}
        probed = set(_edit1_neighborhood(q)) & vocab
        assert probed == brute
        got = set(term_suggest(SF, q, k=10_000)["term"].to_pylist())
        assert got == brute

    def test_df_ranking_and_ties(self, ray_session):
        from frankensearch_ray.pipelines.docsearch import term_suggest

        t = term_suggest(SF, "mergge", k=10)
        pairs = list(zip(t["df"].to_pylist(), t["term"].to_pylist()))
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
        assert all(d > 0 for d, _ in pairs)

    def test_max_edits_gate(self, ray_session):
        import pytest

        from frankensearch_ray.pipelines.docsearch import term_suggest

        with pytest.raises(ValueError):
            term_suggest(SF, "mergge", max_edits=2)


class TestIndexStats:
    def test_matches_doclen_sidecars(self, ray_session):
        """n_docs/total_tokens from manifest stats must equal what the
        doclen sidecars say; n_terms must equal a full vocab walk."""
        from frankensearch_ray.pipelines.docsearch import (
            doc_lengths,
            index_stats,
            searcher_for,
        )
        from frankensearch_ray.schema import FIELD_CONTENT

        t = index_stats(SF)
        dl = doc_lengths(SF)
        assert t["n_docs"][0].as_py() == dl.num_rows
        assert t["total_tokens"][0].as_py() == sum(dl["n_tokens"].to_pylist())
        s = searcher_for(SF)
        vocab = set()
        for sid in range(s.num_shards):
            vocab.update(s.shards.iter_terms_range(sid, FIELD_CONTENT))
        assert t["n_terms"][0].as_py() == len(vocab)
