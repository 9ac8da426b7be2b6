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


class TestHeavyHitters:
    def test_mg_guarantees_vs_exact(self, ray_session):
        """Misra-Gries contract at sf0.001: est <= true, undercount
        <= N/(m+1), and every term with true count > N/(m+1) survives
        into a large-k cut."""
        import re

        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines import textstats as ts

        sf = "/root/testdata/sf0.001"
        t = pq.read_table(sf + "/documents.parquet", columns=["text"])
        exact: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for w in re.split(r"[^a-z0-9]+", (s or "").lower()):
                if w:
                    exact[w] = exact.get(w, 0) + 1
        n = sum(exact.values())
        m = 256
        bound = n // (m + 1) + 1
        out = ts.heavy_hitters(sf, k=m, capacity=m)
        got = dict(zip(out["term"].to_pylist(), out["est_count"].to_pylist()))
        assert out["rank"].to_pylist() == list(range(len(got)))
        for term, est in got.items():
            assert est <= exact[term], term
            assert exact[term] - est <= bound, (term, exact[term], est)
        heavy = {w for w, c in exact.items() if c > bound}
        assert heavy <= set(got), heavy - set(got)

    def test_mg_compress_drops_to_capacity(self):
        import numpy as np

        from frankensearch_ray.pipelines.textstats import _mg_compress

        terms = np.array(list("abcdef"), dtype=object)
        counts = np.array([10, 9, 8, 3, 2, 1], dtype=np.int64)
        t2, c2, dec = _mg_compress(terms, counts, 3)
        assert dec == 3 and list(t2) == ["a", "b", "c"]
        assert list(c2) == [7, 6, 5]
        # under capacity: identity
        t3, c3, d3 = _mg_compress(terms[:2], counts[:2], 3)
        assert d3 == 0 and list(t3) == ["a", "b"]
