"""Rank-exact differential at 10k docs: full/bitmap/FOR posting blocks.

The 141-doc conformance corpus only produces Vint tail blocks; this
gate builds the 10k-doc tier (head terms span hundreds of full blocks,
mixing Bitmap and FOR kinds) and checks the engine's top-k — pruned AND
exhaustive — against the independent from-text scoring oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.build import BuildConfig, build_index
from frankensearch_ray.contract.parser import parse_default
from frankensearch_ray.search.oracle import ExhaustiveOracle
from frankensearch_ray.search.searcher import LocalSearcher
from frankensearch_ray.sources import pages
from frankensearch_ray.sources.extract import extract_scalar

QUERIES = [
    "rust ownership",           # fixture-doc terms
    "the of and",               # salted head terms (many full blocks)
    '"error handling"',
    "error value AND table",
]


@pytest.fixture(scope="module")
def t2_setup(ray_session, tmp_index_root):
    paths = pages.tier_t2()
    index_dir = str(tmp_index_root / "t2")
    cfg = BuildConfig(
        id_col="url",
        html_col="html",
        verify_text_col="text",
        num_shards=8,
        salt_threshold=2000,
        salt_buckets=4,
        target_partition_rows=1250,
    )
    build_index(paths, index_dir, cfg, resume=False)
    docs = []
    for p, path in enumerate(sorted(paths)):
        t = pq.read_table(path)
        for r in range(len(t)):
            title, text = extract_scalar(t["html"][r].as_py().decode("utf-8"))
            docs.append(((p << 32) | r, t["url"][r].as_py(), title, text))
    return LocalSearcher(index_dir), ExhaustiveOracle(docs)


@pytest.fixture(scope="module")
def vocab_queries():
    from frankensearch_ray.sources.pages import _vocab

    vocab, _ = _vocab()
    qs = []
    for i in (0, 1, 5, 50, 500, 5000):   # head -> tail synthetic terms
        qs.append(vocab[i])
    qs.append(f"{vocab[0]} {vocab[3]} {vocab[700]}")
    qs.append(f'"{vocab[0]} {vocab[1]}"')
    qs.append(f"{vocab[2]} AND {vocab[9]} -{vocab[40]}")
    return qs


def test_t2_rank_and_score_bits_identical(t2_setup, vocab_queries):
    searcher, oracle = t2_setup
    failures = []
    for q in QUERIES + vocab_queries:
        got = [
            (h["docid"], h["score_bits"])
            for h in searcher.search(q, limit=10)["hits"]
        ]
        want = [
            (h["docid"], h["score_bits"])
            for h in oracle.search(parse_default(q).query, limit=10)["hits"]
        ]
        if got != want:
            failures.append((q, want[:3], got[:3]))
    assert not failures, "\n".join(
        f"{q!r}\n want {w}\n got  {g}" for q, w, g in failures
    )
