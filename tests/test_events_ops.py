"""Unit tests for the vectorized event-stream kernels (windowed
aggregate and as-of join) — edge cases the sf0.01 oracle gate
(`test_entry_oracle.py`) can't isolate: timestamp ties, user-boundary
forward-fill resets, lefts with no prior right, negative values."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from frankensearch_ray.pipelines import events as ev


def _tbl(rows):
    eid, ts, uid, et = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et),
        }
    )


def _join(rows, **kw):
    # reach the bucket kernel through the same closure asof_join builds
    import inspect

    src = inspect.getsource(ev.asof_join)
    assert "join_bucket" in src
    # drive through the public function body by calling the inner kernel
    # equivalently: replicate the closure with defaults
    left_type = kw.get("left_type", "purchase")
    right_type = kw.get("right_type", "click")

    g = _tbl(rows)
    import pyarrow.compute as pc

    uid = g["user_id"].to_numpy()
    ts = g["ts"].cast(pa.int64()).to_numpy()
    eid = g["event_id"].to_numpy()
    is_right = pc.equal(g["event_type"], right_type).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    is_left = pc.equal(g["event_type"], left_type).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid = uid[order], ts[order], eid[order]
    is_right, is_left = is_right[order], is_left[order]
    idx = np.where(is_right, np.arange(len(uid)), -1)
    ff = np.maximum.accumulate(idx)
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    ustart = np.flatnonzero(new_user)
    run_len = np.diff(np.concatenate((ustart, [len(uid)])))
    row_ustart = np.repeat(ustart, run_len)
    valid = (ff >= row_ustart) & is_left
    li = np.flatnonzero(valid)
    ri = ff[li]
    return list(
        zip(
            eid[li].tolist(),
            uid[li].tolist(),
            eid[ri].tolist(),
            (ts[li] - ts[ri]).tolist(),
        )
    )


class TestAsofKernel:
    def test_basic_match_and_no_prior(self):
        out = _join(
            [
                (1, 100, 7, "click"),
                (2, 200, 7, "purchase"),   # matches click@100
                (3, 50, 8, "purchase"),    # no prior click for user 8
                (4, 60, 8, "click"),
                (5, 70, 8, "purchase"),    # matches click@60
            ]
        )
        assert out == [(2, 7, 1, 100), (5, 8, 4, 10)]

    def test_forward_fill_does_not_cross_users(self):
        # user 7's click must NOT satisfy user 9's earlier-sorted purchase
        out = _join(
            [
                (1, 100, 7, "click"),
                (2, 100, 9, "purchase"),
            ]
        )
        assert out == []

    def test_same_timestamp_tie_uses_event_id_order(self):
        # click and purchase at the SAME ts: event_id order decides.
        # click id 1 < purchase id 2 -> click sorts first -> it matches.
        out = _join([(1, 500, 7, "click"), (2, 500, 7, "purchase")])
        assert out == [(2, 7, 1, 0)]
        # purchase id 1 < click id 2 -> purchase sorts first -> no match
        out = _join([(2, 500, 7, "click"), (1, 500, 7, "purchase")])
        assert out == []

    def test_latest_of_several_rights_wins(self):
        out = _join(
            [
                (1, 10, 7, "click"),
                (2, 20, 7, "click"),
                (3, 30, 7, "purchase"),
            ]
        )
        assert out == [(3, 7, 2, 10)]


class TestWindowKernel:
    def test_negative_values_floor_like_sql(self):
        # floor(-0.0015 * 1000) = floor(-1.5) = -2 (SQL FLOOR semantics)
        assert int(np.floor(np.float64(-0.0015) * 1000.0)) == -2
        assert int(np.floor(np.float64(0.0015) * 1000.0)) == 1

    def test_window_assignment_floor_division(self):
        win_us = 3600 * 1_000_000
        ts = np.array([0, win_us - 1, win_us, 2 * win_us + 5], dtype=np.int64)
        win = (ts // win_us) * 3600
        assert win.tolist() == [0, 0, 3600, 7200]


class TestEndToEndTiny(object):
    def test_asof_join_dataset_path(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        rows = [
            (1, 100, 7, "click"),
            (2, 200, 7, "purchase"),
            (3, 50, 8, "purchase"),
            (4, 60, 8, "click"),
            (5, 70, 8, "purchase"),
            (6, 80, 8, "view"),  # filtered out
        ]
        t = _tbl(rows).append_column(
            "value", pa.array([0.0] * len(rows), pa.float64())
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = ev.asof_join(str(tmp_path))
        got = list(
            zip(
                out["event_id"].to_pylist(),
                out["user_id"].to_pylist(),
                out["matched_event_id"].to_pylist(),
                out["gap_us"].to_pylist(),
            )
        )
        assert got == [(2, 7, 1, 100), (5, 8, 4, 10)]

    def test_window_aggregate_dataset_path(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        h = 3600 * 1_000_000
        rows = [
            (1, 0, 7, "click"),
            (2, 10, 7, "click"),       # same user+window: n_users stays 1
            (3, 20, 8, "click"),
            (4, h + 1, 7, "click"),    # next window
            (5, 30, 7, "view"),
        ]
        t = _tbl(rows).append_column(
            "value", pa.array([1.0005, 2.0, 3.0, 4.0, 5.0], pa.float64())
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = ev.window_aggregate(str(tmp_path))
        recs = {
            (r["window_start"], r["event_type"]): r
            for r in out.to_pylist()
        }
        c0 = recs[(0, "click")]
        assert c0["n_events"] == 3 and c0["n_users"] == 2
        assert c0["sum_value_milli"] == 1000 + 2000 + 3000
        assert recs[(3600, "click")]["n_events"] == 1
        assert recs[(0, "view")]["n_users"] == 1


class TestRangeJoin:
    def _run(self, rows, tmp_path, **kw):
        import pyarrow.parquet as pq

        t = _tbl(rows).append_column(
            "value", pa.array([0.0] * len(rows), pa.float64())
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = ev.range_join(str(tmp_path), **kw)
        return {
            r["event_id"]: r["n_matches"] for r in out.to_pylist()
        }

    def test_band_boundaries_inclusive(self, ray_session, tmp_path):
        band = 5 * 60 * 1_000_000
        rows = [
            (1, 10 * band, 7, "error"),
            (2, 10 * band - band, 7, "click"),  # exactly at -band: in
            (3, 10 * band + band, 7, "click"),  # exactly at +band: in
            (4, 10 * band - band - 1, 7, "click"),  # just outside
            (5, 10 * band + band + 1, 7, "click"),  # just outside
        ]
        assert self._run(rows, tmp_path) == {1: 2}

    def test_cross_user_isolation_and_zero_counts(self, ray_session, tmp_path):
        rows = [
            (1, 1000, 7, "error"),   # user 7 has no clicks
            (2, 1000, 8, "click"),
            (3, 1500, 8, "error"),   # user 8: one click in band
        ]
        assert self._run(rows, tmp_path) == {1: 0, 3: 1}


class TestSinkVariants:
    """VERDICT r02 #10: corpus-sized operator outputs need a parquet sink
    path; it must hash-identical to the table path."""

    SF = "/root/testdata/sf0.01"

    def test_sessionize_sink_equals_table(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.dataset as pads

        from frankensearch_ray.pipelines.events import sessionize

        table = sessionize(self.SF).to_pandas()
        out = str(tmp_path / "sessions")
        assert sessionize(self.SF, output_path=out) is None
        sunk = (
            pads.dataset(out)
            .to_table()
            .to_pandas()
            .sort_values(["user_id", "session"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(sunk[table.columns.tolist()], table)

    def test_exact_dedup_sink_equals_table(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.dataset as pads

        from frankensearch_ray.pipelines.dedup import exact_dedup

        table = exact_dedup(self.SF).to_pandas()
        out = str(tmp_path / "survivors")
        assert exact_dedup(self.SF, output_path=out) is None
        sunk = (
            pads.dataset(out)
            .to_table()
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(sunk[["doc_id"]], table)


class TestHoppingWindow:
    def test_hop_equals_size_is_tumbling(self, ray_session):
        sf = "/root/testdata/sf0.001"
        hop = ev.hopping_window_aggregate(sf, size_minutes=60, hop_minutes=60)
        tum = ev.window_aggregate(sf, window_minutes=60)
        assert hop.equals(tum)

    def test_every_event_lands_in_m_windows(self, ray_session):
        import pyarrow.parquet as pq

        sf = "/root/testdata/sf0.001"
        n_events = pq.ParquetFile(sf + "/events.parquet").metadata.num_rows
        out = ev.hopping_window_aggregate(sf, size_minutes=90, hop_minutes=30)
        assert int(np.sum(out["n_events"].to_numpy())) == 3 * n_events
        # window starts align to the hop grid
        assert all(w % 1800 == 0 for w in out["window_start"].to_pylist())

    def test_rejects_non_multiple(self, ray_session):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ev.hopping_window_aggregate(
                "/root/testdata/sf0.001", size_minutes=50, hop_minutes=30
            )


def test_value_quantiles_matches_numpy(ray_session):
    """CDF-walk quantiles must equal the quantile_disc index contract
    max(0, ceil(q*n)-1) computed directly on the sorted milli values."""
    import math

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/events.parquet", columns=["event_type", "value"])
    milli = np.floor(np.asarray(t["value"].to_pylist()) * 1000.0).astype(np.int64)
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    out = ev.value_quantiles(sf)
    for r in out.to_pylist():
        vals = np.sort(milli[et == r["event_type"]])
        assert r["n_events"] == len(vals)
        for frac, col in ((0.5, "p50_milli"), (0.9, "p90_milli"), (0.99, "p99_milli")):
            assert r[col] == int(vals[max(0, math.ceil(frac * len(vals)) - 1)]), (
                r["event_type"],
                col,
            )
        assert r["max_milli"] == int(vals[-1])


def test_event_transitions_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(
        sf + "/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    by_user: dict[int, list] = {}
    for r in t.to_pylist():
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    want: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    for nb in (1, 64):
        out = ev.event_transitions(sf, n_buckets=nb)
        got = {
            (r["prev_type"], r["next_type"]): r["n"] for r in out.to_pylist()
        }
        assert got == want, nb
    # conservation law: total transitions = total events - distinct users
    n_events = t.num_rows
    assert sum(want.values()) == n_events - len(by_user)


class TestWindowBursts:
    def _write(self, tmp_path, rows):
        """rows: (ts_us, event_type)."""
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, str(tmp_path / "events.parquet"))
        return str(tmp_path)

    def test_crafted_burst_and_gap_semantics(self, ray_session, tmp_path):
        H = 3600 * 1_000_000
        rows = []
        # windows 0..5: 1 event/h baseline
        for w in range(6):
            rows.append((w * H + 1, "click"))
        # window 6: 10 events -> 10*6 > 3*6 -> burst
        rows += [(6 * H + i, "click") for i in range(10)]
        # window 9 (after a 2-window GAP): 5 events; trailing = windows
        # 3..8 = 1+1+1+10 = 13 -> 5*6=30 > 39? no -> not a burst
        rows += [(9 * H + i, "click") for i in range(5)]
        # first-ever window of another type: no history -> never alerts
        rows.append((0, "error"))
        sf = self._write(tmp_path, rows)
        out = ev.window_bursts(sf)
        got = [
            (r["window_start"] // 3600, r["event_type"], r["n_events"], r["trailing_sum"])
            for r in out.to_pylist()
        ]
        assert got == [(6, "click", 10, 6)]

    def test_no_float_mean_boundary(self, ray_session, tmp_path):
        """Exactly mult x trailing-mean must NOT alert (strict >)."""
        H = 3600 * 1_000_000
        rows = []
        for w in range(6):
            rows.append((w * H, "view"))  # trailing sum 6, mean 1
        rows += [(6 * H + i, "view") for i in range(3)]  # n=3 == 3*mean
        sf = self._write(tmp_path, rows)
        out = ev.window_bursts(sf)
        assert out.num_rows == 0
