"""Event-stream operators over the ``events`` table.

Stateful-order operators Ray Data lacks natively, expressed as
``groupby(user).map_groups`` with a per-group time sort — the custom-
operator recipe of SURVEY §7: the partitioning assumption is that ONE
user's events fit one group (true for web-log sessionization; hot users
would be salted by day the same way head terms are salted by docid
range).

- ``sessionize``: gap-based sessions (new session when the gap since the
  previous event of the same user exceeds ``gap_minutes``) with
  per-session aggregates — the classic training-data prep step for
  behavioral corpora.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
) -> pa.Table:
    """Per-user gap sessions: (user_id, session, n_events, first/last
    event id, duration_sec).  Integer-exact for the SQL oracle."""
    import ray.data as rd

    gap_us = gap_minutes * 60 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()  # us since epoch
        new_session = np.concatenate(([True], np.diff(ts) > gap_us))
        session = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "session": session,
                    "event_id": g["event_id"].to_numpy(),
                    "ts_us": ts,
                }
            )
            .groupby(["user_id", "session"], as_index=False)
            .agg(
                n_events=("event_id", "size"),
                first_event=("event_id", "first"),
                last_event=("event_id", "last"),
                start_us=("ts_us", "min"),
                end_us=("ts_us", "max"),
            )
        )
        out["duration_sec"] = (out["end_us"] - out["start_us"]) // 1_000_000
        return out.drop(columns=["start_us", "end_us"])

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    pdf = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "user_id": pa.array(pdf["user_id"].astype("int64")),
            "session": pa.array(pdf["session"].astype("int64")),
            "n_events": pa.array(pdf["n_events"].astype("int64")),
            "first_event": pa.array(pdf["first_event"].astype("int64")),
            "last_event": pa.array(pdf["last_event"].astype("int64")),
            "duration_sec": pa.array(pdf["duration_sec"].astype("int64")),
        }
    )
