"""The remaining reference metamorphic maintenance laws
(``frankensearch-quill-gauntlet/src/metamorphic_maintenance_laws.rs`` +
the E6.3 registry in ``runner.rs:640-712``): duplicate-then-delete ≡
never-added, duplicate-live-id rejection publishes nothing (index-twice
≡ index-once), and flush/batch-schedule perturbation preserves the
total lexical observation up to tie order.

"Total lexical observation" = (id, score_bits) per hit over a query
suite; the allowed divergence set is CLOSED: equal score_bits sequences
with a permuted id order within equal-score runs (TieOrder), nothing
else — per the reference's allow-list discipline."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.state import maintenance as mnt

DOCS = [
    ("d1", "alpha beta gamma common"),
    ("d2", "alpha beta common"),
    ("d3", "beta gamma delta common"),
    ("d4", "delta epsilon common"),
    ("d5", "alpha epsilon zeta common"),
    ("d6", "zeta eta common common"),
]
QUERIES = ["alpha", "beta gamma", "common", "delta OR zeta", "+alpha -beta"]


def _table(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "text": pa.array([r[1] for r in rows]),
        }
    )


def _cfg():
    return BuildConfig(
        id_col="url",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=2,
        target_partition_rows=3,
    )


def _build(tmp_path, name, rows):
    d = str(tmp_path / name)
    src = str(tmp_path / f"{name}.parquet")
    pq.write_table(_table(rows), src)
    build_index([src], d, _cfg(), resume=False)
    return d


def _total_obs(index_dir):
    s = LocalSearcher(index_dir)
    return [
        [(h["id"], h["score_bits"]) for h in s.search(q, limit=50)["hits"]]
        for q in QUERIES
    ]


def assert_equiv_tie_order_only(a, b):
    """The closed allow-list: score_bits sequences exactly equal, id
    sets within each equal-score run equal — any other divergence
    (membership, count, score drift) fails."""
    assert len(a) == len(b)
    for ha, hb in zip(a, b):
        assert [x[1] for x in ha] == [x[1] for x in hb], "score divergence"
        assert sorted(ha) == sorted(hb), "membership divergence"


def test_duplicate_then_delete_equals_never_added(tmp_path, ray_session):
    """e6.3-duplicate-then-delete-v1: a rejected duplicate-ID batch
    stages nothing, so deleting the rejected ID afterwards leaves the
    index observationally identical to one that never saw the batch —
    allowed divergence: none beyond tie order."""
    d = _build(tmp_path, "dup_del", DOCS)
    baseline = _total_obs(d)
    m0 = mnt.load_manifest(d)
    batch = _table([("dx", "alpha injected once"), ("dx", "alpha injected twice")])
    with pytest.raises(ValueError, match="duplicate ids"):
        mnt.append_table(d, batch)
    # rejection published NOTHING (no staged rows, no generation bump)
    m1 = mnt.load_manifest(d)
    assert m1.get("generation", 0) == m0.get("generation", 0)
    assert LocalSearcher(d).doc_count() == len(DOCS)
    # deleting the rejected id is the never-added idempotent delete
    mnt.delete_documents(d, ["dx"], auto_maintain=False)
    assert_equiv_tie_order_only(_total_obs(d), baseline)
    never = _build(tmp_path, "never_added", DOCS)
    assert_equiv_tie_order_only(_total_obs(d), _total_obs(never))


def test_index_twice_equals_index_once(tmp_path, ray_session):
    """e6.3-duplicate-live-id-rejection-v1: re-indexing a live ID is a
    typed rejection with NO partial publication — the new ids riding in
    the same batch are not published either, so the observable state is
    exactly index-once."""
    d = _build(tmp_path, "twice", DOCS)
    baseline = _total_obs(d)
    batch = _table([("d1", "alpha beta gamma common"), ("fresh", "alpha fresh")])
    with pytest.raises(ValueError, match="already-live"):
        mnt.append_table(d, batch)
    s = LocalSearcher(d)
    assert s.doc_count() == len(DOCS)
    assert "fresh" not in {
        h["id"] for h in s.search("alpha", limit=50)["hits"]
    }, "rejected batch partially published"
    assert_equiv_tie_order_only(_total_obs(d), baseline)
    # and a subsequent legitimate commit still publishes nothing of it
    mnt.append_table(d, _table([("d7", "eta theta common")]), auto_maintain=False)
    assert "fresh" not in {
        h["id"]
        for h in LocalSearcher(d).search("alpha fresh", limit=50)["hits"]
    }


def test_flush_batch_schedule_preserves_observation(tmp_path, ray_session):
    """e6.3-flush-batch-schedule-v1: the same corpus, ids and config
    ingested under three different flush/batch schedules — one bulk
    build, per-doc appends, and appends interleaved with maintenance —
    give the same total lexical observation up to tie order."""
    bulk = _build(tmp_path, "bulk", DOCS)

    # schedule B: build on the first doc, append the rest one at a time
    b = _build(tmp_path, "perdoc", DOCS[:1])
    for row in DOCS[1:]:
        mnt.append_table(b, _table([row]), auto_maintain=False)

    # schedule C: two-doc batches with inline maintenance (tier merges
    # at fanout 2 exercise the merge path mid-schedule)
    c = _build(tmp_path, "batched", DOCS[:2])
    for i in range(2, len(DOCS), 2):
        mnt.append_table(c, _table(DOCS[i : i + 2]), auto_maintain=False)
        mnt.maybe_maintain(c, fanout=2)

    obs_bulk = _total_obs(bulk)
    assert any(len(h) for h in obs_bulk)
    assert_equiv_tie_order_only(obs_bulk, _total_obs(b))
    assert_equiv_tie_order_only(obs_bulk, _total_obs(c))
