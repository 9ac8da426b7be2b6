"""Seeded maintenance-SCHEDULE laws — the E6.3 schedule generators
(``frankensearch-quill-gauntlet/src/metamorphic_maintenance_schedules.rs:185-343``)
ported faithfully: the splitmix64 `mix`, `seeded_batches`, and the three
schedule builders reproduce the reference's step sequences bit-for-bit
for a given (seed, corpus_len), and each law compares the perturbed
arm's full search observation against its control arm:

- e6.3-merge-schedule-v1: interleaved merges must not change the
  observation (merging is a maintenance decision).
- e6.3-reopen-recovery-v1: committed-boundary close/reopen cycles must
  restore exactly the durable state (see the reference's scope note —
  every reopen is preceded by a flush/commit BY DESIGN).
- e6.3-tombstone-compaction-v1: tombstone a seeded subset then compact;
  the observation must equal an index that never contained the
  tombstoned docs (no resurrection, no disturbance of survivors beyond
  declared tie order).

Observation = (external id, score_bits) lists for a fixed query panel,
compared in the declared tie order (score desc, external id asc) — our
engine's internal docid tie order legitimately differs between arms
(append order vs build order), exactly the "declared tie order" carve-out
the reference law names.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
MASK64 = (1 << 64) - 1

QUERIES = ["hash merge window", "scan join order", "the fast key", "stream"]


def _mix(state: list[int]) -> int:
    """splitmix64 step, exactly metamorphic_maintenance_schedules.rs:185."""
    state[0] = (state[0] + 0x9E3779B97F4A7C15) & MASK64
    z = state[0]
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return (z ^ (z >> 31)) & MASK64


def _seeded_batches(state: list[int], corpus_len: int) -> list[int]:
    assert corpus_len >= 2
    max_batches = min(corpus_len, 4)
    batches = 2 + (_mix(state) % max(1, max_batches - 1))
    batches = min(batches, corpus_len)
    base = corpus_len // batches
    sizes = [base] * batches
    for i in range(corpus_len % batches):
        sizes[i] += 1
    return [s for s in sizes if s > 0]


def merge_schedule(seed: int, corpus_len: int) -> list[tuple]:
    state = [seed & MASK64]
    steps: list[tuple] = []
    for index, count in enumerate(_seeded_batches(state, corpus_len)):
        steps.append(("ingest", count))
        steps.append(("flush",))
        if index == 0 or _mix(state) % 2 == 0:
            steps.append(("merge",))
    return steps


def reopen_recovery_schedule(seed: int, corpus_len: int) -> list[tuple]:
    state = [(seed ^ 0x5EED22225EED2222) & MASK64]
    steps: list[tuple] = []
    for index, count in enumerate(_seeded_batches(state, corpus_len)):
        steps.append(("ingest", count))
        if index == 0 or _mix(state) % 2 == 0:
            steps.append(("flush",))
            steps.append(("reopen",))
    return steps


def tombstone_compaction_schedule(seed: int, corpus_len: int) -> list[tuple]:
    state = [(seed ^ 0x7031333370313333) & MASK64]
    steps: list[tuple] = [
        ("ingest", c) for c in _seeded_batches(state, corpus_len)
    ]
    steps.append(("flush",))
    tombstoned: list[int] = []
    for corpus_index in range(corpus_len):
        if _mix(state) % 3 == 0 and len(tombstoned) + 1 < corpus_len:
            tombstoned.append(corpus_index)
    if not tombstoned:
        tombstoned.append(_mix(state) % corpus_len)
    for corpus_index in tombstoned:
        steps.append(("tombstone", corpus_index))
    steps.append(("compact",))
    return steps


# --- driving the schedules against the engine ------------------------------


def _corpus(n: int) -> pa.Table:
    t = pq.read_table(SF + "/documents.parquet").slice(0, n)
    return t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pc.cast(t["doc_id"], pa.string()),
    )


def _build(tmp_path, name: str, table: pa.Table) -> str:
    from frankensearch_ray.build import BuildConfig, build_index

    src = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, src)
    idx = str(tmp_path / name)
    cfg = BuildConfig(
        id_col="doc_id",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=4,
        salt_threshold=200,
        salt_buckets=4,
        target_partition_rows=2_000,
    )
    build_index([src], idx, cfg, resume=False)
    return idx


def _apply_schedule(tmp_path, name: str, corpus: pa.Table, steps) -> str:
    """Drive a schedule: the FIRST ingest seeds the index via a normal
    build (an index dir must exist before maintenance verbs), every
    later ingest goes through the maintenance append path.  Our appends
    commit durably per batch, so the reference's Flush step is the
    no-op boundary marker; Reopen drops every in-process handle
    (a fresh LocalSearcher reads only durable state)."""
    from frankensearch_ray.state import maintenance as mt

    idx = None
    pos = 0
    for step in steps:
        if step[0] == "ingest":
            batch = corpus.slice(pos, step[1])
            pos += step[1]
            if idx is None:
                idx = _build(tmp_path, name, batch)
            elif batch.num_rows:
                mt.append_table(idx, batch, auto_maintain=False)
        elif step[0] == "flush":
            pass  # every append above publishes a manifest (durable)
        elif step[0] == "merge":
            mt.merge_delta_generations(idx)
        elif step[0] == "reopen":
            pass  # observation helper below always opens fresh from disk
        elif step[0] == "tombstone":
            ext = corpus["doc_id"][step[1]].as_py()
            mt.delete_documents(idx, [ext], auto_maintain=False)
        elif step[0] == "compact":
            mt.compact(idx, min_tombstone_ratio=0.0)
        else:  # pragma: no cover
            raise AssertionError(step)
    assert pos == corpus.num_rows or any(s[0] == "tombstone" for s in steps)
    return idx


def _observe(idx: str) -> list:
    """Fresh-from-disk search observation in the declared tie order."""
    from frankensearch_ray.search.searcher import LocalSearcher

    s = LocalSearcher(idx)
    out = []
    for q in QUERIES:
        hits = s.search(q, limit=20)["hits"]
        out.append(
            sorted((-h["score_bits"], int(h["id"])) for h in hits)
        )
    return out


N = 24  # corpus size: small enough to walk many seeds, >= 2 batches


@pytest.mark.parametrize("seed", [1, 7, 42, 1337])
def test_merge_schedule_law(ray_session, tmp_path, seed):
    corpus = _corpus(N)
    steps = merge_schedule(seed, N)
    assert sum(c for s, *r in steps if s == "ingest" for c in r) == N
    perturbed = _apply_schedule(tmp_path, f"m{seed}", corpus, steps)
    control = _apply_schedule(
        tmp_path,
        f"mc{seed}",
        corpus,
        [s for s in steps if s[0] != "merge"],
    )
    assert _observe(perturbed) == _observe(control)


@pytest.mark.parametrize("seed", [1, 7, 42, 1337])
def test_reopen_recovery_schedule_law(ray_session, tmp_path, seed):
    corpus = _corpus(N)
    steps = reopen_recovery_schedule(seed, N)
    perturbed = _apply_schedule(tmp_path, f"r{seed}", corpus, steps)
    control = _apply_schedule(
        tmp_path,
        f"rc{seed}",
        corpus,
        [s for s in steps if s[0] != "reopen"],
    )
    assert _observe(perturbed) == _observe(control)


@pytest.mark.parametrize("seed", [1, 7, 42, 1337])
def test_tombstone_compaction_schedule_law(ray_session, tmp_path, seed):
    corpus = _corpus(N)
    steps = tombstone_compaction_schedule(seed, N)
    dead = sorted(i for s, *r in steps if s == "tombstone" for i in r)
    assert 1 <= len(dead) < N  # the schedule's own guarantee
    perturbed = _apply_schedule(tmp_path, f"t{seed}", corpus, steps)
    # control: an index that NEVER contained the tombstoned docs
    keep = [i for i in range(N) if i not in dead]
    control = _build(
        tmp_path, f"tc{seed}", corpus.take(pa.array(keep))
    )
    assert _observe(perturbed) == _observe(control)
