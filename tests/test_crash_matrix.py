"""Kill-point crash/resume matrix (VERDICT r03 #3; ``PLAN.md:527-529``
analogue — the reference drives seeded schedules with kills at every
commit arrow).

A build subprocess is killed (via the ``FSRAY_TEST_FAIL`` injection hook
in ``build.py``) at each commit point:

- ``phase_a:K``      — before partition K writes anything (other
                        partitions may or may not have committed);
- ``phase_a_mid:K``  — partition K's postings checkpoint on disk but its
                        stats done-marker NOT yet written (torn partition);
- ``phase_b:K``      — mid shard-encode;
- ``publish``        — manifest temp file written, rename pending.

A second subprocess then resumes (``resume=True``), and the ENTIRE index
tree must be byte-identical to a clean single-shot build (the build is
deterministic per partition/shard, so this is the strongest possible
recovery assert).  Manifest comparison drops the volatile ``metrics``
timings only.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BUILD_SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False)
from frankensearch_ray.build import BuildConfig, build_index
cfg = BuildConfig(id_col="doc_id", content_col="text", html_col=None,
                  verify_text_col=None, num_shards=2,
                  target_partition_rows=25, salt_threshold=30,
                  salt_buckets=2, numeric_cols=["num"])
build_index([sys.argv[1]], sys.argv[2], cfg, resume=True)
ray.shutdown()
"""

KILL_POINTS = ["phase_a:2", "phase_a_mid:1", "phase_b:1", "publish"]


def _make_source(path: str) -> None:
    n = 100
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(
                    [
                        f"alpha beta gamma doc {i} common words the of and"
                        for i in range(n)
                    ]
                ),
                "num": pa.array([i * 7 for i in range(n)], pa.int64()),
            }
        ),
        path,
        row_group_size=25,
    )


def _run_build(src: str, idx: str, fail: str | None = None) -> int:
    env = dict(os.environ)
    env.pop("FSRAY_TEST_FAIL", None)
    if fail:
        env["FSRAY_TEST_FAIL"] = fail
    p = subprocess.run(
        [sys.executable, "-c", BUILD_SCRIPT, src, idx],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    return p.returncode


def _tree_digest(idx: str) -> dict[str, str]:
    """Relative path -> sha256 of every index file; the manifest hashes
    its canonical JSON minus the volatile ``metrics`` timings."""
    out: dict[str, str] = {}
    root = Path(idx)
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        rel = str(p.relative_to(root))
        if rel.endswith(".tmp") or rel == "manifest.json.prev":
            continue  # crash debris / publish history, not index content
        if rel == "manifest.json":
            with open(p) as f:
                m = json.load(f)
            m.pop("metrics", None)
            m.pop("_checksum", None)  # checksum covers metrics
            body = json.dumps(m, sort_keys=True).encode()
            out[rel] = hashlib.sha256(body).hexdigest()
        else:
            out[rel] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


@pytest.fixture(scope="module")
def crash_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("crash_matrix")
    src = str(root / "docs.parquet")
    _make_source(src)
    ref = str(root / "ref_idx")
    assert _run_build(src, ref) == 0
    return root, src, _tree_digest(ref)


@pytest.mark.parametrize("kill", KILL_POINTS)
def test_kill_then_resume_is_byte_identical(crash_env, kill):
    root, src, ref_digest = crash_env
    idx = str(root / f"idx_{kill.replace(':', '_')}")
    rc = _run_build(src, idx, fail=kill)
    assert rc != 0, f"injected crash at {kill} did not kill the build"
    # resume must complete and reproduce the clean build bit-for-bit
    assert _run_build(src, idx) == 0
    got = _tree_digest(idx)
    assert got == ref_digest, {
        "missing": sorted(set(ref_digest) - set(got)),
        "extra": sorted(set(got) - set(ref_digest)),
        "diff": sorted(
            k for k in set(got) & set(ref_digest) if got[k] != ref_digest[k]
        ),
    }


def test_torn_manifest_resume_publishes_fresh(crash_env):
    """After the publish-point crash the manifest is absent/torn; the
    resumed build must publish a loadable, checksum-valid manifest."""
    from frankensearch_ray.build import load_manifest

    root, src, _ = crash_env
    idx = str(root / "idx_publish")  # produced by the matrix run above
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        # standalone invocation: reproduce the publish-point crash + resume
        assert _run_build(src, idx, fail="publish") != 0
        assert _run_build(src, idx) == 0
    m = load_manifest(idx)
    assert m["metrics"]["docs"] == 100
    assert m["_checksum"]
