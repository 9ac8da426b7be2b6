"""Watch-mode incremental ingest (SURVEY §2.10 / §3.3).

The Ray-side analogue of the reference's ``LiveIngestPipeline``
(``fsfs/src/runtime.rs:1778-2505``): callers submit upserts/deletes as
they observe changes; the runner coalesces them behind an ADAPTIVE
debounce window (``runtime.rs:435``) and applies each drained micro-batch
as one searchable delta generation + manifest publish (one commit per
batch, ``runtime.rs:1951, 2498-2505``).  Mutation planning matches the
reference: upsert = content-hash compare (identical content is a no-op,
``index.rs:10236``), delete = tombstone, last-write-wins within a pending
window.

Two latency contracts are measured first-class (BASELINE methodology —
distributions, not averages):

- **apply latency**: wall time of one micro-batch commit (contract floor
  p95 ≤ 25 ms at reference scale, ``lexical_pipeline.rs:23-24``);
- **visibility lag**: submit → searchable time per mutation, bounded by
  the cross-process visibility barrier ≤ 1,000 ms (``config.rs:43-46``).
  The adaptive debounce window is capped so debounce + smoothed apply
  time stays under the bound.

The runner is caller-pumped (no hidden thread): ``pump()`` applies the
pending window if the debounce has elapsed, ``drain()`` applies it now.
Determinism makes it unit-testable and lets a driver loop own the clock.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from . import maintenance as mnt

VISIBILITY_LAG_BOUND_MS = 1_000.0  # config.rs:43-46


def _pctl(vals: list[float], p: float) -> float:
    if not vals:
        return 0.0
    s = sorted(vals)
    i = min(len(s) - 1, int(round(p / 100.0 * (len(s) - 1))))
    return s[i]


@dataclass
class WatchStats:
    batches: int = 0
    upserts: int = 0
    deletes: int = 0
    noops: int = 0
    apply_ms: list[float] = field(default_factory=list)
    visibility_lag_ms: list[float] = field(default_factory=list)
    t_first: float | None = None
    t_last: float | None = None

    def summary(self) -> dict:
        wall = (
            (self.t_last - self.t_first)
            if self.t_first is not None and self.t_last is not None
            else 0.0
        )
        n = self.upserts + self.deletes
        return {
            "batches": self.batches,
            "upserts": self.upserts,
            "deletes": self.deletes,
            "noops": self.noops,
            "updates_per_sec": (n / wall) if wall > 0 else float(n),
            "apply_ms_p50": _pctl(self.apply_ms, 50),
            "apply_ms_p95": _pctl(self.apply_ms, 95),
            "visibility_lag_ms_p50": _pctl(self.visibility_lag_ms, 50),
            "visibility_lag_ms_p95": _pctl(self.visibility_lag_ms, 95),
            "visibility_lag_ms_max": max(self.visibility_lag_ms, default=0.0),
        }


class WatchRunner:
    """Debounced micro-batch apply loop over one index directory."""

    def __init__(
        self,
        index_dir: str,
        min_debounce_ms: float = 10.0,
        max_debounce_ms: float = 500.0,
        debounce_factor: float = 2.0,
        auto_maintain: bool = True,
        clock=time.monotonic,
    ):
        self.index_dir = index_dir
        self.min_debounce_ms = float(min_debounce_ms)
        self.max_debounce_ms = float(max_debounce_ms)
        self.debounce_factor = float(debounce_factor)
        self.auto_maintain = auto_maintain
        self.clock = clock
        self.debounce_ms = self.min_debounce_ms
        self._apply_ewma_ms: float | None = None
        # pending window: id -> ("upsert", row-slice, t_submit) |
        #                   ("delete", None, t_submit)
        self._pending: dict[str, tuple] = {}
        self._pending_since: float | None = None
        self._id_col = None
        self.stats = WatchStats()

    def _cfg_id_col(self) -> str:
        if self._id_col is None:
            m = mnt.load_manifest(self.index_dir)
            self._id_col = m["config"].get("id_col", "url")
        return self._id_col

    # --- submission (change-detection feed) --------------------------------

    def submit_upsert(self, table: pa.Table) -> None:
        """Enqueue changed/new documents; last write per id wins within
        the pending window (reference mutation planning)."""
        now = self.clock()
        idc = self._cfg_id_col()
        for i, ext in enumerate(table[idc].to_pylist()):
            self._pending[ext] = ("upsert", table.slice(i, 1), now)
        if self._pending_since is None and self._pending:
            self._pending_since = now

    def submit_delete(self, ids: list[str]) -> None:
        now = self.clock()
        for ext in ids:
            self._pending[ext] = ("delete", None, now)
        if self._pending_since is None and self._pending:
            self._pending_since = now

    # --- apply loop --------------------------------------------------------

    def pump(self) -> bool:
        """Apply the pending window iff the debounce has elapsed.
        Returns True when a batch was applied."""
        if not self._pending:
            return False
        if (self.clock() - self._pending_since) * 1000.0 < self.debounce_ms:
            return False
        self.drain()
        return True

    def drain(self) -> dict | None:
        """Apply ALL pending mutations as one delta generation + one
        manifest publish (per-batch commit).  Returns the manifest."""
        if not self._pending:
            return None
        pending, self._pending = self._pending, {}
        since, self._pending_since = self._pending_since, None

        up_slices = [v[1] for v in pending.values() if v[0] == "upsert"]
        del_ids = [k for k, v in pending.items() if v[0] == "delete"]
        t0 = self.clock()
        if self.stats.t_first is None:
            self.stats.t_first = t0
        manifest = None
        n_noop = 0
        try:
            if del_ids:
                manifest = mnt.delete_documents(
                    self.index_dir, del_ids, auto_maintain=False
                )
            if up_slices:
                batch = pa.concat_tables(up_slices, promote_options="default")
                before = mnt.load_manifest(self.index_dir)
                n_live_before = sum(p["rows"] for p in before["partitions"])
                manifest = mnt.upsert_table(
                    self.index_dir, batch, auto_maintain=False
                )
                n_live_after = sum(p["rows"] for p in manifest["partitions"])
                # rows that allocated no new docid were hash-identical no-ops
                n_noop = len(batch) - (n_live_after - n_live_before)
            if self.auto_maintain:
                manifest = mnt.maybe_maintain(self.index_dir)
        except BaseException:
            # a transient apply failure (I/O, torn manifest, disk full)
            # must NOT lose the window: restore it — newer entries that
            # raced in keep last-write-wins priority over the restored
            # ones — and let the caller's next pump retry
            restored = dict(pending)
            restored.update(self._pending)
            self._pending = restored
            self._pending_since = (
                since if since is not None else self._pending_since
            )
            raise
        t1 = self.clock()

        apply_ms = (t1 - t0) * 1000.0
        self.stats.batches += 1
        self.stats.upserts += sum(1 for v in pending.values() if v[0] == "upsert")
        self.stats.deletes += len(del_ids)
        self.stats.noops += max(0, n_noop)
        self.stats.apply_ms.append(apply_ms)
        for _k, v in pending.items():
            self.stats.visibility_lag_ms.append((t1 - v[2]) * 1000.0)
        self.stats.t_last = t1

        # adaptive debounce (runtime.rs:435): batch longer when applies
        # are expensive, but never let debounce + expected apply cross
        # the visibility bound
        self._apply_ewma_ms = (
            apply_ms
            if self._apply_ewma_ms is None
            else 0.7 * self._apply_ewma_ms + 0.3 * apply_ms
        )
        cap = max(
            self.min_debounce_ms,
            min(
                self.max_debounce_ms,
                VISIBILITY_LAG_BOUND_MS - self._apply_ewma_ms,
            ),
        )
        self.debounce_ms = float(
            np.clip(
                self.debounce_factor * self._apply_ewma_ms,
                self.min_debounce_ms,
                cap,
            )
        )
        return manifest

    def summary(self) -> dict:
        return self.stats.summary()
