"""Tier-merge admission fidelity vs the reference planner
(``frankensearch-quill/src/keeper.rs:1336-1509``, ``config.rs:22-31``):
width classification, bound-consecutive same-tier runs, the hole-ratio
gate, validation errors, and the watch-workload segment-count bound."""

from __future__ import annotations

import pytest

from frankensearch_ray.state.maintenance import TierMergePolicy, plan_tier_merge


def seg(sid, lo, hi):
    return {"segment_id": sid, "docid_lo": lo, "docid_hi": hi}


REF_POLICY = TierMergePolicy(
    fanout=3, small_max_width=16, medium_max_width=64, max_hole_ratio=0.5
)


def test_classify_widths_match_reference():
    # keeper.rs:14330-14332
    assert REF_POLICY.classify_width(16) == "small"
    assert REF_POLICY.classify_width(17) == "medium"
    assert REF_POLICY.classify_width(65) == "large"


def test_reference_example_plan_and_hole_gate():
    """keeper.rs:14323-14359 walked verbatim."""
    segments = [seg(1, 0, 4), seg(2, 6, 10), seg(3, 12, 16), seg(4, 80, 112)]
    plan = plan_tier_merge(segments, REF_POLICY)
    assert plan is not None
    assert plan["source_segment_ids"] == [1, 2, 3]
    assert (plan["docid_lo"], plan["docid_hi"]) == (0, 16)
    assert abs(plan["hole_ratio"] - 0.25) < 1e-12
    assert plan["tier"] == "small"
    # a 0.24 gate declines the same run
    tight = TierMergePolicy(
        fanout=3, small_max_width=16, medium_max_width=64, max_hole_ratio=0.24
    )
    assert plan_tier_merge(segments, tight) is None


def test_mixed_tier_runs_are_skipped():
    """A large segment interleaved in a small run blocks that window but
    not a later clean one."""
    segments = [
        seg(1, 0, 4),
        seg(2, 6, 100),  # medium — breaks the first window
        seg(3, 102, 106),
        seg(4, 108, 112),
        seg(5, 114, 118),
    ]
    plan = plan_tier_merge(segments, REF_POLICY)
    assert plan["source_segment_ids"] == [3, 4, 5]
    assert plan["tier"] == "small"


def test_validation_errors_match_reference():
    with pytest.raises(ValueError, match="empty docid range"):
        plan_tier_merge([seg(9, 20, 20)], REF_POLICY)
    with pytest.raises(ValueError, match="not .*ordered"):
        plan_tier_merge([seg(2, 6, 10), seg(1, 0, 4)], REF_POLICY)
    with pytest.raises(ValueError, match="fanout"):
        plan_tier_merge([], TierMergePolicy(fanout=1))
    with pytest.raises(ValueError, match="boundaries"):
        plan_tier_merge(
            [], TierMergePolicy(small_max_width=8, medium_max_width=8)
        )
    with pytest.raises(ValueError, match="hole ratio"):
        plan_tier_merge([], TierMergePolicy(max_hole_ratio=1.5))


def test_under_fanout_returns_none():
    assert plan_tier_merge([seg(1, 0, 4), seg(2, 6, 10)], REF_POLICY) is None


def apply_plan(segments, plan, new_id):
    kept = [
        s for s in segments if s["segment_id"] not in set(plan["source_segment_ids"])
    ]
    kept.append(seg(new_id, plan["docid_lo"], plan["docid_hi"]))
    return sorted(kept, key=lambda s: s["docid_lo"])


def test_watch_workload_segment_count_bounded():
    """keeper.rs:14373-14404 shape: unit appends with repeated planning
    keep the live segment count under 3 * (fanout - 1)."""
    policy = TierMergePolicy(
        fanout=4, small_max_width=4, medium_max_width=32, max_hole_ratio=0.5
    )
    segments = []
    nid = 10_001
    for batch in range(600):
        segments.append(seg(batch + 1, batch, batch + 1))
        segments.sort(key=lambda s: s["docid_lo"])
        while (plan := plan_tier_merge(segments, policy)) is not None:
            segments = apply_plan(segments, plan, nid)
            nid += 1
    bound = 3 * (policy.fanout - 1)
    assert len(segments) <= bound, f"{len(segments)} segments > bound {bound}"
    assert plan_tier_merge(segments, policy) is None
    for a, b in zip(segments, segments[1:]):
        assert a["docid_hi"] <= b["docid_lo"]


class TestIndexIntegration:
    """The planner wired into merge_delta_generations: appends roll
    small generations into mediums, a large never joins a small run,
    and every doc stays visible."""

    def test_sustained_appends_tier_up(self, tmp_path, ray_session):
        import pyarrow as pa

        from frankensearch_ray.build import BuildConfig, build_index
        from frankensearch_ray.search.searcher import LocalSearcher
        from frankensearch_ray.state import maintenance as mnt

        d = str(tmp_path / "idx")
        base = pa.table(
            {
                "url": [f"b{i}" for i in range(4)],
                "text": [f"base doc {i} tiertest" for i in range(4)],
            }
        )
        src = str(tmp_path / "base.parquet")
        import pyarrow.parquet as pq

        pq.write_table(base, src)
        build_index(
            [src],
            d,
            BuildConfig(
                id_col="url",
                content_col="text",
                html_col=None,
                verify_text_col=None,
                num_shards=2,
                target_partition_rows=10,
            ),
            resume=False,
        )
        fanout = 4
        for i in range(10):
            mnt.append_table(
                d,
                pa.table(
                    {
                        "url": [f"a{i}"],
                        "text": [f"tiertest sustained batch{i}"],
                    }
                ),
                auto_maintain=False,
            )
            mnt.maybe_maintain(d, fanout=fanout)
        m = mnt.load_manifest(d)
        spans = {
            int(r["generation"]): (int(r["p_lo"]), int(r["p_hi"]))
            for r in m.get("delta_gens", [])
        }
        widths = sorted(hi - lo for lo, hi in spans.values())
        # 10 unit appends at fanout 4 -> two width-4 mediums + two smalls
        assert widths == [1, 1, 4, 4], widths
        live_gens = {
            int(e.get("generation", 0) or 0)
            for e in m["shards"]
            if int(e.get("generation", 0) or 0) > 0
        }
        assert live_gens == set(spans)
        hits = {
            h["id"]
            for h in LocalSearcher(d).search("tiertest", limit=50)["hits"]
        }
        assert {f"a{j}" for j in range(10)} <= hits
