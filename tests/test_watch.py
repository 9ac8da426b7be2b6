"""Watch-mode incremental ingest (SURVEY §2.10): debounced micro-batch
apply with visibility-lag measurement, per the reference LiveIngestPipeline
semantics (``fsfs/src/runtime.rs:1778-2505``)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.sources.extract import render_page
from frankensearch_ray.state.watch import (
    VISIBILITY_LAG_BOUND_MS,
    WatchRunner,
)

BASE = [
    ("d1", "alpha beta gamma"),
    ("d2", "delta epsilon zeta"),
    ("d3", "eta theta iota"),
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


def _ids(d, q):
    return {h["id"] for h in LocalSearcher(d).search(q, limit=10)["hits"]}


class TestWatchRunner:
    def test_batched_mutations_apply_and_are_visible(self, idx):
        w = WatchRunner(idx, min_debounce_ms=0.0)
        w.submit_upsert(_pages([("d4", "fresh kappa content")]))
        w.submit_delete(["d2"])
        w.submit_upsert(_pages([("d1", "alpha rewritten mu")]))
        m = w.drain()
        assert m is not None
        assert _ids(idx, "kappa") == {"d4"}
        assert _ids(idx, "delta") == set()
        assert _ids(idx, "mu") == {"d1"}
        assert _ids(idx, "beta") == set()  # old d1 content replaced
        s = w.summary()
        assert s["batches"] == 1
        assert s["upserts"] == 2 and s["deletes"] == 1

    def test_last_write_wins_within_window(self, idx):
        w = WatchRunner(idx, min_debounce_ms=0.0)
        w.submit_upsert(_pages([("d9", "first version")]))
        w.submit_upsert(_pages([("d9", "second version wins")]))
        w.drain()
        assert _ids(idx, "wins") == {"d9"}
        assert _ids(idx, "first") == set()
        # one pending entry per id: a single upsert applied
        assert w.summary()["upserts"] == 1

    def test_noop_upsert_detected(self, idx):
        w = WatchRunner(idx, min_debounce_ms=0.0)
        w.submit_upsert(_pages([("d1", "alpha beta gamma")]))  # identical
        w.drain()
        assert w.summary()["noops"] == 1

    def test_debounce_coalesces_until_elapsed(self, idx):
        t = [0.0]
        w = WatchRunner(idx, min_debounce_ms=50.0, clock=lambda: t[0])
        w.submit_upsert(_pages([("d5", "pending nu doc")]))
        assert w.pump() is False  # window not yet elapsed
        assert _ids(idx, "nu") == set()
        t[0] += 0.1  # 100 ms later
        assert w.pump() is True
        assert _ids(idx, "nu") == {"d5"}

    def test_visibility_lag_measured_and_bounded(self, idx):
        w = WatchRunner(idx, min_debounce_ms=0.0)
        for i in range(3):
            w.submit_upsert(_pages([(f"x{i}", f"payload{i} words here")]))
            w.drain()
        s = w.summary()
        assert len(w.stats.visibility_lag_ms) == 3
        assert s["visibility_lag_ms_p95"] >= s["visibility_lag_ms_p50"] > 0
        # single-node micro-batches sit far under the 1 s barrier
        assert s["visibility_lag_ms_max"] < VISIBILITY_LAG_BOUND_MS
        assert s["updates_per_sec"] > 0

    def test_adaptive_debounce_tracks_apply_cost(self, idx):
        w = WatchRunner(
            idx, min_debounce_ms=1.0, max_debounce_ms=400.0, debounce_factor=2.0
        )
        w.submit_upsert(_pages([("a1", "one doc")]))
        w.drain()
        d1 = w.debounce_ms
        assert w.min_debounce_ms <= d1 <= w.max_debounce_ms
        # debounce ~ factor x smoothed apply time
        assert d1 == pytest.approx(
            max(w.min_debounce_ms, min(2.0 * w._apply_ewma_ms, w.max_debounce_ms)),
            rel=0.01,
        )


class TestDrainFailureRecovery:
    def test_failed_apply_restores_the_pending_window(self, idx):
        """A transient apply failure must NOT lose the window: the
        mutations are restored, a retry applies them, and the results
        are visible (previously the swap-before-apply dropped them)."""
        from unittest import mock

        w = WatchRunner(idx, min_debounce_ms=0.0)
        w.submit_upsert(_pages([("d9", "zygomorphic watch recovery")]))
        w.submit_delete(["d1"])
        import frankensearch_ray.state.maintenance as mnt

        with mock.patch.object(
            mnt, "delete_documents", side_effect=OSError("disk full")
        ):
            with pytest.raises(OSError):
                w.drain()
        # window restored: both mutations still pending
        assert set(w._pending) == {"d9", "d1"}
        assert w._pending_since is not None
        # retry succeeds and both mutations land
        w.drain()
        s = LocalSearcher(idx)
        hits = [
            h["id"] for h in s.search("zygomorphic", limit=10)["hits"]
        ]
        assert "d9" in hits
        assert not [
            h for h in s.search("alpha", limit=10)["hits"] if h["id"] == "d1"
        ]

    def test_empty_submit_does_not_arm_the_debounce(self, idx):
        w = WatchRunner(idx, min_debounce_ms=10_000.0)
        w.submit_upsert(_pages([]))
        w.submit_delete([])
        assert w._pending_since is None
        # a REAL submit arms the window from ITS OWN time, so the huge
        # debounce has not elapsed and pump must hold the batch
        w.submit_upsert(_pages([("d8", "held by debounce")]))
        assert w.pump() is False
