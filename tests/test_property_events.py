"""Hypothesis property gates for the event-analytics BUCKET KERNELS —
pure functions, so hundreds of random event streams are cheap (no Ray
pipeline per example).  Each kernel is compared against an independent
per-user brute force; the pipeline-level exchange invariance is pinned
separately in test_retention_cooccur_paths / test_funnel_sig."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_ray.pipelines import events as ev

SETTINGS = settings(max_examples=80, deadline=None)

TYPES = ["view", "click", "purchase", "signup", "error"]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 6),            # user_id
        st.integers(0, 5_000),        # ts (us)
        st.sampled_from(TYPES),       # event_type
    ),
    max_size=120,
)


def _tbl(rows):
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )


@SETTINGS
@given(events_strategy, st.integers(1, 3))
def test_funnel_kernel_matches_bruteforce(rows, nsteps):
    steps = TYPES[:nsteps]
    got = ev._funnel_bucket(_tbl(rows), steps)
    got_counts = dict(zip(got["step"].to_pylist(), got["n_users"].to_pylist()))
    by_user: dict[int, list] = {}
    for i, (u, t, e) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i, e))
    want = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        cur = -1
        for si, s in enumerate(steps):
            nxt = min((t for t, _i, e in evs if e == s and t > cur), default=None)
            if nxt is None:
                break
            cur = nxt
            want[si] += 1
    assert [got_counts.get(i, 0) for i in range(len(steps))] == want


@SETTINGS
@given(events_strategy)
def test_retention_kernel_matches_bruteforce(rows):
    t = _tbl(rows).select(["ts", "user_id", "event_type"])
    got = ev._retention_bucket(t, "signup")
    got_d = dict(
        zip(
            zip(got["cohort_week"].to_pylist(), got["week_offset"].to_pylist()),
            got["n_users"].to_pylist(),
        )
    )
    W = ev._WEEK_US
    first: dict[int, int] = {}
    for u, ts, e in rows:
        if e == "signup":
            w = ts // W
            if u not in first or w < first[u]:
                first[u] = w
    cells = set()
    for u, ts, _e in rows:
        if u in first and ts // W >= first[u]:
            cells.add((u, first[u], ts // W - first[u]))
    want: dict[tuple, int] = {}
    for _u, cw, off in cells:
        want[(cw, off)] = want.get((cw, off), 0) + 1
    assert got_d == want


@SETTINGS
@given(events_strategy, st.integers(1, 4), st.integers(1, 4_000))
def test_session_paths_kernel_matches_bruteforce(rows, max_len, gap_us):
    got = ev._session_paths_bucket(_tbl(rows), gap_us, max_len, n_shards=8)
    got_counts: dict[str, int] = {}
    for p, n in zip(got["path"].to_pylist(), got["n"].to_pylist()):
        got_counts[p] = got_counts.get(p, 0) + n
    by_user: dict[int, list] = {}
    for i, (u, t, e) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i, e))
    want: dict[str, int] = {}
    for evs in by_user.values():
        evs.sort()
        sess: list[list[str]] = []
        prev = None
        for t, _i, e in evs:
            if prev is None or t - prev > gap_us:
                sess.append([])
            sess[-1].append(e)
            prev = t
        for s in sess:
            p = ">".join(s[:max_len])
            want[p] = want.get(p, 0) + 1
    assert got_counts == want


class TestUniqueRows:
    """_unique_rows must be a bit-exact drop-in for
    np.unique(axis=0, return_inverse=True) — group VALUES, group ORDER,
    and the inverse mapping — including negatives and the int64
    overflow fallback."""

    @given(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2**32),
    )
    @settings(max_examples=60, deadline=None)
    def test_matches_axis0_unique(self, n, k, seed):
        import numpy as np

        from frankensearch_ray.pipelines.events import _unique_rows

        rng = np.random.default_rng(seed)
        key = rng.integers(-5, 6, size=(n, k)).astype(np.int64)
        want_u, want_inv = np.unique(key, axis=0, return_inverse=True)
        got_u, got_inv = _unique_rows(key)
        assert np.array_equal(got_u, want_u)
        assert np.array_equal(
            np.asarray(got_inv).reshape(-1), np.asarray(want_inv).reshape(-1)
        )

    def test_overflow_fallback(self, monkeypatch):
        import numpy as np

        from frankensearch_ray.pipelines import events as ev

        # radix is the per-column DISTINCT count, so triggering the real
        # 2**63 guard needs ~2^16 distinct values per column; shrink the
        # threshold instead so the fallback branch actually executes
        monkeypatch.setattr(ev, "_RADIX_OVERFLOW", 4)
        rng = np.random.default_rng(3)
        key = rng.integers(-5, 6, size=(50, 3)).astype(np.int64)
        want_u, want_inv = np.unique(key, axis=0, return_inverse=True)
        got_u, got_inv = ev._unique_rows(key)
        assert np.array_equal(got_u, want_u)
        assert np.array_equal(
            np.asarray(got_inv).reshape(-1), np.asarray(want_inv).reshape(-1)
        )
