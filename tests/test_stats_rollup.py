"""Chunked stats rollup ≡ serial rollup (SCALE.md §5 fix).

The manifest's field_stats come from per-partition stats sidecars; at
full scale those are read in chunked Ray tasks.  Chunking must not
change the result, and the chunked path must tolerate any chunk size.
"""

from __future__ import annotations

import json
import os

import pytest

from frankensearch_ray.build import (
    _part_paths,
    rollup_partition_stats,
)


def _write_stats(index_dir: str, pindex: int, docs: int, toks: int, posts: int):
    path = _part_paths(index_dir, pindex)["stats"]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "content": {"doc_count": docs, "total_tokens": toks},
                "title": {"doc_count": docs, "total_tokens": docs * 3},
                "postings_rows": posts,
            },
            f,
        )


@pytest.fixture()
def stats_dir(tmp_path):
    index_dir = str(tmp_path / "idx")
    expect = {"docs": 0, "toks": 0, "title_toks": 0, "posts": 0}
    for p in range(7):
        docs, toks, posts = 10 + p, 100 + 7 * p, 1000 + 13 * p
        _write_stats(index_dir, p, docs, toks, posts)
        expect["docs"] += docs
        expect["toks"] += toks
        expect["title_toks"] += docs * 3
        expect["posts"] += posts
    return index_dir, expect


def test_serial_path_single_chunk(stats_dir):
    index_dir, expect = stats_dir
    fs, posts = rollup_partition_stats(index_dir, list(range(7)), chunk=1000)
    assert fs["content"] == {
        "doc_count": expect["docs"],
        "total_tokens": expect["toks"],
    }
    assert fs["title"] == {
        "doc_count": expect["docs"],
        "total_tokens": expect["title_toks"],
    }
    assert posts == expect["posts"]


def test_chunked_remote_path_identical(stats_dir, ray_session):
    index_dir, _ = stats_dir
    serial = rollup_partition_stats(index_dir, list(range(7)), chunk=1000)
    for chunk in (1, 2, 3, 7):
        assert rollup_partition_stats(index_dir, list(range(7)), chunk=chunk) == serial


def test_empty_partition_list(tmp_path):
    fs, posts = rollup_partition_stats(str(tmp_path), [], chunk=3)
    assert posts == 0
    assert fs["content"] == {"doc_count": 0, "total_tokens": 0}
