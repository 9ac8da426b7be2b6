"""Live always-searchable delta (``state/live.py``; the reference's
``quill/src/delta.rs:784-930`` visibility semantics).

The two contracts under test:

1. **Immediate visibility** — an accepted upsert/delete is visible to the
   very next ``search()`` with no commit and no disk write.
2. **Commit equivalence** — live results are BIT-IDENTICAL (ids, docids,
   score_bits, ranks, totals) to committing the same pending window and
   reopening: the overlay allocates docids, BM25 stats, df, tombstones
   and no-op detection with exactly the committed path's algebra.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.sources.extract import render_page
from frankensearch_ray.state.live import LiveIndex

BASE = [
    ("d1", "alpha beta gamma rust ownership"),
    ("d2", "delta epsilon zeta rust borrow"),
    ("d3", "eta theta iota ownership model"),
    ("d4", "alpha ownership rust rust"),
    ("d5", "kappa lambda rust alpha"),
]

QUERIES = [
    "rust ownership",
    "alpha",
    "zygomorphic",
    "rust ownership zygomorphic",
    '"rust ownership"',
    '"zygomorphic penguins"',
]


def _pages(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array(
                [render_page(f"title {r[0]}", r[1]).encode() for r in rows],
                pa.binary(),
            ),
        }
    )


@pytest.fixture()
def idx(ray_session, tmp_path):
    src = tmp_path / "src.parquet"
    pq.write_table(_pages(BASE), src)
    d = str(tmp_path / "idx")
    build_index(
        [str(src)],
        d,
        BuildConfig(
            id_col="url",
            html_col="html",
            verify_text_col=None,
            num_shards=2,
            salt_threshold=10**9,
            target_partition_rows=3,
        ),
        resume=False,
    )
    return d


def _hits(res):
    return [
        (h["id"], h["docid"], h["score_bits"], h["rank"]) for h in res["hits"]
    ]


class TestLiveVisibility:
    def test_upsert_searchable_before_commit(self, idx):
        li = LiveIndex(idx)
        li.upsert(_pages([("d6", "zygomorphic penguins march")]))
        got = li.search("zygomorphic")["hits"]
        assert [h["id"] for h in got] == ["d6"]
        assert li.pending_ops() == 1
        # nothing durable yet: a fresh sealed searcher can't see it
        assert LocalSearcher(idx).search("zygomorphic")["hits"] == []

    def test_delete_and_replace_visible_before_commit(self, idx):
        li = LiveIndex(idx)
        li.delete(["d2"])
        assert all(
            h["id"] != "d2" for h in li.search("rust", limit=10)["hits"]
        )
        li.upsert(_pages([("d1", "rewritten nu content")]))
        assert {h["id"] for h in li.search("nu")["hits"]} == {"d1"}
        assert all(h["id"] != "d1" for h in li.search("alpha")["hits"])

    def test_noop_upsert_identical_content(self, idx):
        li = LiveIndex(idx)
        r1 = li.upsert(_pages([("d6", "zygomorphic penguins march")]))
        assert r1 == {"kept": 1, "noop": 0}
        dc = li.searcher.doc_count()
        r2 = li.upsert(_pages([("d6", "zygomorphic penguins march")]))
        assert r2 == {"kept": 0, "noop": 1}
        assert li.searcher.doc_count() == dc
        assert len(li.search("zygomorphic")["hits"]) == 1

    def test_last_write_wins_within_window(self, idx):
        li = LiveIndex(idx)
        li.upsert(_pages([("d6", "first version omicron")]))
        li.upsert(_pages([("d6", "second version upsilon")]))
        assert li.search("omicron")["hits"] == []
        assert [h["id"] for h in li.search("upsilon")["hits"]] == ["d6"]

    def test_close_discards_pending(self, idx):
        li = LiveIndex(idx)
        li.upsert(_pages([("d6", "zygomorphic penguins")]))
        li.close()
        assert li.search("zygomorphic")["hits"] == []
        assert LocalSearcher(idx).search("zygomorphic")["hits"] == []


class TestLiveEqualsCommitted:
    def _window(self, li):
        li.upsert(
            _pages(
                [
                    ("d6", "rust ownership borrowing is zygomorphic"),
                    ("d7", "zygomorphic zygomorphic penguins"),
                ]
            )
        )
        li.delete(["d3"])
        li.upsert(_pages([("d2", "delta rewritten rust ownership pi")]))

    def test_bitwise_equality_all_query_shapes(self, idx):
        li = LiveIndex(idx)
        self._window(li)
        live = {q: _hits(li.search(q, limit=10)) for q in QUERIES}
        live_tot = {
            q: li.search(q, limit=3, count=True)["total"] for q in QUERIES
        }
        live_dc = li.searcher.doc_count()
        li.commit()
        s = LocalSearcher(idx)
        assert s.doc_count() == live_dc
        for q in QUERIES:
            assert _hits(s.search(q, limit=10)) == live[q], q
            assert s.search(q, limit=3, count=True)["total"] == live_tot[q], q

    def test_pruned_equals_exhaustive_with_overlay(self, idx):
        li = LiveIndex(idx)
        self._window(li)
        for q in QUERIES:
            a = _hits(li.search(q, limit=10, pruning=True))
            b = _hits(li.search(q, limit=10, pruning=False))
            assert a == b, q

    def test_keyword_id_and_glob_over_overlay(self, idx):
        from frankensearch_ray.contract.query_ast import GlobQuery

        li = LiveIndex(idx)
        self._window(li)
        # id: keyword probe resolves the PENDING doc
        hits = li.search("id:d6")["hits"]
        assert [h["id"] for h in hits] == ["d6"]
        # glob expansion (regex class) sees overlay-only vocabulary
        d, _s = li.searcher.evaluate(GlobQuery(["content"], "zyg*phic"))
        got = set(li.searcher.ids_for(d))
        assert got == {"d6", "d7"}

    def test_snippets_hydrate_pending_docs(self, idx):
        li = LiveIndex(idx)
        self._window(li)
        res = li.search("zygomorphic", limit=2, snippets=True)
        assert all("zygomorphic" in (h["snippet"] or "") for h in res["hits"])

    def test_delete_then_readd_same_content(self, idx):
        """A delete followed by re-adding identical content must NOT
        no-op (the tombstoned revision is not live) — live and committed
        agree on the new docid."""
        li = LiveIndex(idx)
        li.delete(["d2"])
        assert li.search("delta")["hits"] == []
        li.upsert(_pages([("d2", "delta epsilon zeta rust borrow")]))
        live = _hits(li.search("delta", limit=10))
        assert [h[0] for h in live] == ["d2"]
        li.commit()
        assert _hits(LocalSearcher(idx).search("delta", limit=10)) == live

    def test_multi_batch_window_replayed_batch_for_batch(self, idx):
        li = LiveIndex(idx)
        for i in range(4):
            li.upsert(_pages([(f"n{i}", f"fresh doc rho sigma v{i}")]))
        li.delete(["n1"])
        live = _hits(li.search("rho", limit=10))
        li.commit()
        assert _hits(LocalSearcher(idx).search("rho", limit=10)) == live


class TestLiveFailedUpsertAtomicity:
    def test_failed_tokenize_leaves_overlay_untouched(self, idx):
        """A replacing upsert whose tokenize raises must change NOTHING:
        the replaced doc stays live (no orphan tombstone), the op is not
        logged, and commit converges to the pre-failure state."""
        from unittest import mock

        li = LiveIndex(idx)
        before = _hits(li.searcher.search("rust ownership", limit=10))
        assert any(h[0] == "d1" for h in before)
        bad = _pages([("d1", "replacement content that will fail")])
        with mock.patch(
            "frankensearch_ray.stages.tokenize.tokenize_partition",
            side_effect=ValueError("synthetic tokenize failure"),
        ):
            with pytest.raises(ValueError, match="synthetic"):
                li.upsert(bad)
        # d1 must still be live with its ORIGINAL content
        after = _hits(li.searcher.search("rust ownership", limit=10))
        assert after == before
        assert len(li._log) == 0
        assert len(li.overlay.tombstones) == 0
        # and a subsequent good upsert still works end to end
        li.upsert(_pages([("d6", "zygomorphic penguins ownership")]))
        assert any(
            h["id"] == "d6"
            for h in li.searcher.search("zygomorphic", limit=10)["hits"]
        )


class TestTitleOnlyUpsert:
    def test_title_only_change_is_not_a_noop(self, idx):
        """The upsert identity covers the TITLE too: an html upsert that
        changes only the title must reindex (the title is a boosted
        indexed field — hashing body text alone served stale titles
        forever), while a truly identical page stays a no-op."""
        import pyarrow as pa

        li = LiveIndex(idx)
        new_html = render_page("BRANDNEWTITLE d1", BASE[0][1]).encode()
        r = li.upsert(
            pa.table(
                {
                    "url": pa.array(["d1"], pa.string()),
                    "html": pa.array([new_html], pa.binary()),
                }
            )
        )
        assert r["kept"] == 1 and r["noop"] == 0
        hits = li.searcher.search("brandnewtitle", limit=10)["hits"]
        assert [h["id"] for h in hits] == ["d1"]
        # identical html is still a no-op
        r2 = li.upsert(
            pa.table(
                {
                    "url": pa.array(["d1"], pa.string()),
                    "html": pa.array([new_html], pa.binary()),
                }
            )
        )
        assert r2["noop"] == 1 and r2["kept"] == 0
