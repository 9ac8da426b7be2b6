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
) -> pa.Table:
    """Per-user gap sessions: (user_id, session, n_events, first/last
    event id, duration_sec).  Integer-exact for the SQL oracle."""
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
    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _sessionize_bucket(g, gap_us), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values(["user_id", "session"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)
