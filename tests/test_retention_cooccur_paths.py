"""Differential + edge gates for cohort_retention, item_cooccurrence and
session_paths — brute-force Python oracles over crafted corpora plus
bucket/shard-count invariance (the pre-cut losslessness property) at
sf0.001.  The sf0.01 DuckDB gate lives in test_entry_oracle.py."""

from __future__ import annotations

import itertools
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.pipelines import events as ev

SF = "/root/testdata/sf0.001"
US = 1_000_000
WEEK = 7 * 86400 * US


def _write(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, item_or_None)."""
    eid, ts, uid, et, item = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(
                [json.dumps({"k": i}) if i is not None else "{}" for i in item]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


# --- cohort_retention -----------------------------------------------------------


def _retention_bruteforce(rows, signup_type="signup"):
    first = {}
    for _e, ts, u, et, _i in rows:
        if et == signup_type:
            w = ts // WEEK
            if u not in first or w < first[u]:
                first[u] = w
    cells = set()
    for _e, ts, u, et, _i in rows:
        if u in first and ts // WEEK >= first[u]:
            cells.add((u, first[u], ts // WEEK - first[u]))
    out = {}
    for _u, cw, off in cells:
        out[(cw, off)] = out.get((cw, off), 0) + 1
    return dict(sorted(out.items()))


def _retention_dict(t: pa.Table):
    return dict(
        zip(
            zip(t["cohort_week"].to_pylist(), t["week_offset"].to_pylist()),
            t["n_users"].to_pylist(),
        )
    )


def test_retention_crafted_edges(ray_session, tmp_path):
    rows = [
        # u1: activity BEFORE signup ignored; offset 0 and 2 active
        (0, 0 * WEEK + 5, 1, "view", None),
        (1, 1 * WEEK + 5, 1, "signup", None),
        (2, 3 * WEEK + 5, 1, "click", None),
        # u2: two signups -> FIRST one is the cohort
        (3, 0 * WEEK + 9, 2, "signup", None),
        (4, 2 * WEEK + 9, 2, "signup", None),
        (5, 2 * WEEK + 10, 2, "purchase", None),
        # u3: never signs up -> excluded entirely
        (6, 1 * WEEK, 3, "view", None),
        # u4: many events in one week count ONCE
        (7, 5 * WEEK, 4, "signup", None),
        (8, 5 * WEEK + 1, 4, "view", None),
        (9, 5 * WEEK + 2, 4, "view", None),
    ]
    sf = _write(tmp_path, rows)
    got = _retention_dict(ev.cohort_retention(sf, n_buckets=3))
    assert got == _retention_bruteforce(rows)
    # the signup event itself is offset-0 activity
    assert got[(1, 0)] == 1 and got[(1, 2)] == 1
    assert got[(0, 0)] == 1 and got[(0, 2)] == 1
    assert got[(5, 0)] == 1
    assert not any(cw == 1 and off == 0 and u == 3 for (cw, off), u in got.items())


def test_retention_matches_bruteforce_sf(ray_session):
    t = pq.read_table(
        SF + "/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    rows = list(
        zip(
            t["event_id"].to_pylist(),
            t["ts"].cast(pa.int64()).to_pylist(),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
            itertools.repeat(None),
        )
    )
    want = _retention_bruteforce(rows)
    for nb in (1, 64):
        got = _retention_dict(ev.cohort_retention(SF, n_buckets=nb))
        assert got == want, nb


# --- item_cooccurrence ----------------------------------------------------------


def _cooccur_bruteforce(rows, cap, k, event_type="click"):
    per_user: dict[int, set[int]] = {}
    for _e, _ts, u, et, item in rows:
        if et == event_type and item is not None:
            per_user.setdefault(u, set()).add(item)
    counts: dict[tuple[int, int], int] = {}
    for items in per_user.values():
        if len(items) > cap:
            continue
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(a, b, n) for (a, b), n in ranked]


def _cooccur_list(t: pa.Table):
    assert t["rank"].to_pylist() == list(range(len(t)))
    return list(
        zip(
            t["item_a"].to_pylist(),
            t["item_b"].to_pylist(),
            t["n_users"].to_pylist(),
        )
    )


def test_cooccurrence_crafted_edges(ray_session, tmp_path):
    rows = [
        # u1 and u2 both touch {7, 9}; duplicate (u1, 7) counts once
        (0, 10, 1, "click", 7),
        (1, 20, 1, "click", 7),
        (2, 30, 1, "click", 9),
        (3, 40, 2, "click", 9),
        (4, 50, 2, "click", 7),
        # u3 is over the cap (3 distinct > cap=2) -> dropped whole
        (5, 60, 3, "click", 7),
        (6, 70, 3, "click", 9),
        (7, 80, 3, "click", 11),
        # views never count
        (8, 90, 4, "view", 7),
        (9, 95, 4, "view", 9),
        # u5: single item -> no pair
        (10, 99, 5, "click", 42),
    ]
    sf = _write(tmp_path, rows)
    got = _cooccur_list(ev.item_cooccurrence(sf, k=5, max_items_per_user=2, n_buckets=3))
    assert got == [(7, 9, 2)]
    assert got == _cooccur_bruteforce(rows, cap=2, k=5)


def test_cooccurrence_matches_bruteforce_sf(ray_session):
    t = pq.read_table(
        SF + "/events.parquet", columns=["event_id", "user_id", "event_type", "props"]
    )
    rows = [
        (e, 0, u, et, json.loads(p).get("k"))
        for e, u, et, p in zip(
            t["event_id"].to_pylist(),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
            t["props"].to_pylist(),
        )
    ]
    want = _cooccur_bruteforce(rows, cap=50, k=15)
    for nb, ns in ((1, 1), (7, 5), (64, 32)):
        got = _cooccur_list(
            ev.item_cooccurrence(SF, k=15, n_buckets=nb, n_shards=ns)
        )
        assert got == want, (nb, ns)


# --- session_paths --------------------------------------------------------------


def _paths_bruteforce(rows, gap_us, max_len, k):
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for e, ts, u, et, _i in rows:
        by_user.setdefault(u, []).append((ts, e, et))
    counts: dict[str, int] = {}
    for evs in by_user.values():
        evs.sort()
        sess: list[list[str]] = []
        prev = None
        for ts, _e, et in evs:
            if prev is None or ts - prev > gap_us:
                sess.append([])
            sess[-1].append(et)
            prev = ts
        for s in sess:
            p = ">".join(s[:max_len])
            counts[p] = counts.get(p, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def _paths_list(t: pa.Table):
    assert t["rank"].to_pylist() == list(range(len(t)))
    return list(zip(t["path"].to_pylist(), t["n_sessions"].to_pylist()))


def test_session_paths_crafted_edges(ray_session, tmp_path):
    G = 30 * 60 * US
    rows = [
        # u1: gap EXACTLY equal keeps the session (strict > rule)
        (0, 0, 1, "view", None),
        (1, G, 1, "click", None),
        # one past the gap -> new session
        (2, 2 * G + 1, 1, "view", None),
        # u2: truncation at max_len=2 -> "view>click" despite 3 events
        (3, 0, 2, "view", None),
        (4, 1, 2, "click", None),
        (5, 2, 2, "purchase", None),
        # u3: same path as u1's first session
        (6, 0, 3, "view", None),
        (7, 5, 3, "click", None),
    ]
    sf = _write(tmp_path, rows)
    got = _paths_list(ev.session_paths(sf, max_len=2, k=10, n_buckets=3))
    assert got == [("view>click", 3), ("view", 1)]
    assert got == _paths_bruteforce(rows, G, 2, 10)


def test_session_paths_matches_bruteforce_sf(ray_session):
    t = pq.read_table(
        SF + "/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    rows = list(
        zip(
            t["event_id"].to_pylist(),
            t["ts"].cast(pa.int64()).to_pylist(),
            t["user_id"].to_pylist(),
            t["event_type"].to_pylist(),
            itertools.repeat(None),
        )
    )
    want = _paths_bruteforce(rows, 30 * 60 * US, 8, 20)
    for nb, ns in ((1, 1), (64, 32)):
        got = _paths_list(ev.session_paths(SF, n_buckets=nb, n_shards=ns))
        assert got == want, (nb, ns)


def test_session_paths_timestamp_tie_uses_event_id(ray_session, tmp_path):
    rows = [
        (5, 100, 1, "purchase", None),
        (2, 100, 1, "view", None),
        (9, 100, 1, "click", None),
    ]
    sf = _write(tmp_path, rows)
    got = _paths_list(ev.session_paths(sf, k=5))
    assert got == [("view>purchase>click", 1)]


# --- doc_click_stats (two-table hash equi-join) ---------------------------------


def test_doc_click_stats_crafted_edges(ray_session, tmp_path):
    rows = [
        # doc 1: two users; u1 clicks it twice (values 1.5 and 2.25)
        (0, 10, 1, "click", 1),
        (1, 20, 1, "click", 1),
        (2, 30, 2, "click", 1),
        # doc 2: one click, but also a view that must not count
        (3, 40, 3, "click", 2),
        (4, 50, 3, "view", 2),
        # item 99 has no matching document -> dropped (inner join)
        (5, 60, 4, "click", 99),
    ]
    sf = _write(tmp_path, rows)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "source": pa.array(["a", "b", "c"]),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = ev.doc_click_stats(sf, n_buckets=3)
    got = {
        r["doc_id"]: (r["source"], r["n_clicks"], r["n_users"], r["sum_value_milli"])
        for r in out.to_pylist()
    }
    # value column in _write is 1.0 for every row -> 1000 milli each
    assert got == {1: ("a", 3, 2, 3000), 2: ("b", 1, 1, 1000)}
    # doc 3 (no clicks) absent; item 99 (no doc) absent
    assert 3 not in got and 99 not in got


def test_doc_click_stats_matches_bruteforce_sf(ray_session):
    ev_t = pq.read_table(
        SF + "/events.parquet",
        columns=["user_id", "event_type", "value", "props"],
    )
    doc_t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "source"])
    src = dict(zip(doc_t["doc_id"].to_pylist(), doc_t["source"].to_pylist()))
    agg: dict[int, list] = {}
    for u, et, v, p in zip(
        ev_t["user_id"].to_pylist(),
        ev_t["event_type"].to_pylist(),
        ev_t["value"].to_pylist(),
        ev_t["props"].to_pylist(),
    ):
        if et != "click":
            continue
        item = json.loads(p).get("k")
        if item not in src:
            continue
        a = agg.setdefault(item, [0, set(), 0])
        a[0] += 1
        a[1].add(u)
        a[2] += int(np.floor(v * 1000))
    want = {
        d: (src[d], n, len(users), s) for d, (n, users, s) in agg.items()
    }
    for nb in (1, 64):
        out = ev.doc_click_stats(SF, n_buckets=nb)
        got = {
            r["doc_id"]: (
                r["source"],
                r["n_clicks"],
                r["n_users"],
                r["sum_value_milli"],
            )
            for r in out.to_pylist()
        }
        assert got == want, nb
