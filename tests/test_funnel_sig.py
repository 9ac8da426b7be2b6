"""Gates for funnel_counts (ordered event-sequence prefixes) and
significant_terms (df-lift conditioned aggregation) — brute-force Python
differentials at sf0.001 plus crafted edge corpora."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.pipelines import corpus, events

SF = "/root/testdata/sf0.001"


def _funnel_bruteforce(rows, steps):
    """rows: (user_id, ts_us, event_type). Greedy = existence (earliest
    chain); returns per-step completing-user counts."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        cur = -1
        for i, s in enumerate(steps):
            nxt = min((t for t, e in evs if e == s and t > cur), default=None)
            if nxt is None:
                break
            cur = nxt
            counts[i] += 1
    return counts


@pytest.mark.parametrize(
    "steps",
    [
        ("view", "click", "purchase"),
        ("signup", "view", "click", "purchase"),
        ("purchase", "view"),
        ("error",),
    ],
)
def test_funnel_matches_bruteforce(ray_session, steps):
    t = pq.read_table(
        SF + "/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    rows = list(
        zip(
            t["user_id"].to_pylist(),
            t["ts"].cast(pa.int64()).to_pylist(),
            t["event_type"].to_pylist(),
        )
    )
    want = _funnel_bruteforce(rows, list(steps))
    got = events.funnel_counts(SF, steps=steps)
    assert got["n_users"].to_pylist() == want
    assert got["event_type"].to_pylist() == list(steps)


def test_funnel_bucket_invariance(ray_session):
    a = events.funnel_counts(SF, n_buckets=2)
    b = events.funnel_counts(SF, n_buckets=128)
    assert a.to_pydict() == b.to_pydict()


def test_funnel_edge_cases(ray_session, tmp_path):
    """Equal timestamps never chain (strictly-after contract); a user
    whose steps appear in the wrong order does not complete; a repeated
    first step retries the chain from the earliest occurrence only."""
    us = 1_000_000
    rows = [
        # u1: clean chain
        (1, 10 * us, "a"), (1, 20 * us, "b"), (1, 30 * us, "c"),
        # u2: b at the SAME ts as a -> must not count past step a
        (2, 10 * us, "a"), (2, 10 * us, "b"),
        # u3: reversed order
        (3, 50 * us, "b"), (3, 60 * us, "a"),
        # u4: greedy earliest-a still finds the later b
        (4, 10 * us, "a"), (4, 5 * us, "b"), (4, 40 * us, "b"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp_path, "events.parquet"))
    got = events.funnel_counts(str(tmp_path), steps=("a", "b"))
    # step a: users 1,2,3,4 all have an 'a'; step b strictly after: u1, u4
    assert got["n_users"].to_pylist() == [4, 2]


def test_funnel_rejects_duplicate_steps(ray_session):
    with pytest.raises(ValueError):
        events.funnel_counts(SF, steps=("view", "view"))


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_significant_terms_matches_bruteforce(ray_session):
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    toks = [set(_tok(s or "")) for s in t["text"].to_pylist()]
    n = len(toks)
    matched = [s for s in toks if "hash" in s and "merge" in s]
    f = len(matched)
    bg: dict[str, int] = {}
    fg: dict[str, int] = {}
    for s in toks:
        for w in s:
            bg[w] = bg.get(w, 0) + 1
    for s in matched:
        for w in s:
            fg[w] = fg.get(w, 0) + 1
    cand = [
        (-(fg[w] * n) / (bg[w] * f), w, fg[w], bg[w])
        for w in fg
        if fg[w] >= 5
    ]
    cand.sort(key=lambda x: (x[0], x[1]))
    want = [(w, a, b, i) for i, (_l, w, a, b) in enumerate(cand[:20])]
    got_tbl = corpus.significant_terms(SF, "hash", "merge", k=20, min_fg=5)
    got = list(
        zip(
            got_tbl["term"].to_pylist(),
            got_tbl["fg_df"].to_pylist(),
            got_tbl["bg_df"].to_pylist(),
            got_tbl["rank"].to_pylist(),
        )
    )
    assert got == want


def test_significant_terms_shard_invariance(ray_session):
    a = corpus.significant_terms(SF, k=10, n_shards=2)
    b = corpus.significant_terms(SF, k=10, n_shards=64)
    assert a.to_pydict() == b.to_pydict()


def test_significant_terms_no_match_is_empty(ray_session):
    got = corpus.significant_terms(SF, "zzzzqqq", "merge")
    assert got.num_rows == 0


def test_funnel_bucket_overflow_guard():
    """ADVICE r04 #2: the composite key raises instead of silently
    wrapping when n_users * bucket_span would exceed int64."""
    import pyarrow as pa
    import pytest

    from frankensearch_ray.pipelines.events import _funnel_bucket

    g = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 2**62, 2**62], pa.int64()),
            "event_type": pa.array(["view", "view", "click"]),
        }
    )
    with pytest.raises(OverflowError, match="n_buckets"):
        _funnel_bucket(g, ["view", "click"])
