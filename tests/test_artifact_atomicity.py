"""Crash/staleness matrix for the build-once pipeline artifacts
(`dedup.pair_graph_layout`, `corpus.dup_routes_layout`, ANN layouts
share the same temp-dir + rename discipline): a killed build must never
leave a valid-looking artifact, stale tmp dirs must not block a
rebuild, and corrupt/stale meta.json must force a rebuild — the same
torn-commit guarantees the manifest publish path pins."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"

KILL_SCRIPT = """
import os, sys
os.environ["FSRAY_CACHE"] = sys.argv[1]
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False)
import ray.data as rd
# crash INSIDE the artifact write: kill the process the first time a
# parquet fragment lands in the temp data dir
_orig = rd.Dataset.write_parquet
def dying_write(self, path, *a, **k):
    _orig(self, path, *a, **k)   # fragments exist on disk...
    os._exit(1)                  # ...but meta.json + rename never happen
rd.Dataset.write_parquet = dying_write
from frankensearch_ray.pipelines import {mod}
{call}
"""


@pytest.mark.parametrize(
    "mod,call,layout",
    [
        (
            "dedup",
            f'dedup.pair_graph_layout("{SF}")',
            "dedup_idx",
        ),
        (
            "corpus",
            f'corpus.dup_routes_layout("{SF}")',
            "dup_idx",
        ),
        (
            "ann",
            f'ann.q8_layout("{SF}")',
            "q8_idx",
        ),
    ],
)
def test_killed_artifact_build_leaves_no_valid_meta(
    ray_session, tmp_path, monkeypatch, mod, call, layout
):
    cache = str(tmp_path / "cache")
    env = dict(os.environ, FSRAY_CACHE=cache)
    script = KILL_SCRIPT.format(mod=mod, call=call)
    r = subprocess.run(
        [sys.executable, "-c", script, cache],
        capture_output=True,
        env=env,
        cwd="/root/repo",
    )
    assert r.returncode == 1, r.stderr.decode()[-2000:]
    # the kill landed after fragments were written but before publish:
    # no meta.json anywhere under the layout root
    root = os.path.join(cache, "sf0.001", layout)
    metas = []
    for dirpath, _, files in os.walk(root):
        if "meta.json" in files:
            metas.append(dirpath)
    assert metas == [], metas
    # a tmp dir WAS left behind (evidence the kill hit mid-write)
    tmps = [
        d
        for dirpath, dirs, _ in os.walk(root)
        for d in dirs
        if ".tmp" in d
    ]
    assert tmps, "kill point never reached the artifact write"


def test_stale_tmp_and_corrupt_meta_force_clean_rebuild(
    ray_session, tmp_path, monkeypatch
):
    from frankensearch_ray.pipelines import ann, corpus

    monkeypatch.setattr(ann, "CACHE_ROOT", str(tmp_path / "cache"))
    data_dir, n1 = corpus.dup_routes_layout(SF)
    out_dir = os.path.dirname(data_dir)
    # corrupt the meta -> rebuild (not a crash, not a stale reuse)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        f.write("{not json")
    # plus a stale tmp dir from a hypothetical dead writer
    stale = out_dir + ".deadbeef.tmp"
    os.makedirs(os.path.join(stale, "data"), exist_ok=True)
    data_dir2, n2 = corpus.dup_routes_layout(SF)
    assert (data_dir2, n2) == (data_dir, n1)
    with open(os.path.join(out_dir, "meta.json")) as f:
        assert json.load(f)["n_routes"] == n1
    # param change -> separate artifact, both coexist
    d3, n3 = corpus.dup_routes_layout(SF, n=7)
    assert d3 != data_dir
    # same discipline for the quantized-embedding layout
    q1 = ann.q8_layout(SF)
    with open(os.path.join(os.path.dirname(q1), "meta.json"), "w") as f:
        f.write("{not json")
    q2 = ann.q8_layout(SF)
    assert q2 == q1 and os.path.isdir(q2)
    assert ann.q8_layout(SF, scale=128) != q1
