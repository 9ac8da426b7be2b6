"""Extractor spec tests: per-row byte-identity invariant on synthesized pages."""

from __future__ import annotations

import pyarrow.parquet as pq

from frankensearch_ray.sources import pages
from frankensearch_ray.sources.extract import (
    extract_batch,
    extract_scalar,
    render_page,
)


def test_roundtrip_simple():
    cases = [
        ("Title", "hello world"),
        ("A & B <tag>", "first para\n\nsecond > para & more"),
        ("", ""),
        ("東京", "搜索引擎\n\nかなカナ"),
        ("t", "a\n\n\n\nb"),  # empty paragraph in the middle
    ]
    for title, text in cases:
        html = render_page(title, text)
        t2, x2 = extract_scalar(html)
        assert (t2, x2) == (title, text)


def test_t1_pages_invariant_scalar_and_batch():
    paths = pages.tier_t1()
    for path in paths:
        table = pq.read_table(path)
        titles, texts = extract_batch(table["html"].combine_chunks())
        for i in range(len(table)):
            html = table["html"][i].as_py().decode("utf-8")
            want_text = table["text"][i].as_py()
            t_s, x_s = extract_scalar(html)
            assert x_s == want_text, table["url"][i].as_py()
            assert titles[i].as_py() == t_s
            assert texts[i].as_py() == want_text


def test_t2_pages_deterministic_and_invariant_sampled():
    paths = pages.tier_t2()
    assert len(paths) == 8
    table = pq.read_table(paths[3])
    titles, texts = extract_batch(table["html"].combine_chunks())
    assert texts.to_pylist() == table["text"].to_pylist()
    # row regenerability: same seq -> same row
    row_a = pages._bulk_row(4321)
    row_b = pages._bulk_row(4321)
    assert row_a == row_b


def test_bulk_pool_is_zipf_skewed():
    rows = [pages._bulk_row(s) for s in range(200, 400)]
    from collections import Counter

    c = Counter()
    for r in rows:
        c.update(set(r["text"].split()))
    top_df = c.most_common(1)[0][1]
    assert top_df > 0.5 * len(rows)  # head term hits most docs
