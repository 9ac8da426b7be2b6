"""The 4 ``direct_boolean`` parse-tree goldens (fixture
``quill_language_contract.json``): directly-constructed Boolean queries
whose EVALUATION semantics (minimum_should_match, MustNot score 0,
mustnot-only = empty) are pinned against a tiny built index.

The fixture cases carry ``input: "synthetic"`` — the expected_ast IS the
query; what the reference asserts is how such an AST matches and scores
(``query.rs`` Boolean evaluation), so the gate here drives
``LocalSearcher.evaluate`` on the fixture ASTs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from frankensearch_ray.contract.query_ast import (
    Boolean,
    Clause,
    QueryField,
    Term,
)


def _ast_from_json(node: dict):
    """Fixture expected_ast -> query_ast nodes (content-field terms)."""
    t = node["type"]
    if t == "Term":
        return Term(node["text"], [QueryField("content", 1.0)])
    if t == "Boolean":
        return Boolean(
            [
                Clause(c["occur"], _ast_from_json(c["query"]))
                for c in node["children"]
            ]
        )
    raise AssertionError(f"unexpected node type {t}")


def _direct_cases(language_contract):
    return {
        c["id"]: c
        for c in language_contract["parse_tree_cases"]
        if c.get("parser") == "direct_boolean"
    }


DOCS = [
    ("doc-req", "required words only here"),
    ("doc-req-bonus", "required and bonus words"),
    ("doc-req-excl", "required but excluded too"),
    ("doc-bonus", "bonus without the must word"),
    ("doc-first", "first thing"),
    ("doc-second", "second thing"),
    ("doc-both", "first second together"),
    ("doc-incl", "included plainly"),
    ("doc-incl-excl", "included yet excluded"),
    ("doc-none", "nothing relevant at all"),
]


@pytest.fixture(scope="module")
def direct_index(ray_session, tmp_index_root):
    from frankensearch_ray.build import BuildConfig, build_index
    from frankensearch_ray.search.searcher import LocalSearcher

    src = tmp_index_root / "direct_boolean_src.parquet"
    pq.write_table(
        pa.table(
            {
                "url": [d[0] for d in DOCS],
                "text": [d[1] for d in DOCS],
            }
        ),
        str(src),
    )
    idx = str(tmp_index_root / "direct_boolean_idx")
    cfg = BuildConfig(
        id_col="url",
        content_col="text",
        html_col=None,
        verify_text_col=None,
        num_shards=2,
    )
    build_index([str(src)], idx, cfg, resume=False)
    return LocalSearcher(idx)


def _match_ids(searcher, node):
    docids, scores = searcher.evaluate(node)
    ids = searcher.ids_for(docids)
    return dict(zip(ids, scores))


def test_fixture_has_exactly_four(language_contract):
    assert len(_direct_cases(language_contract)) == 4


def test_should_optional_with_must(language_contract, direct_index):
    """minimum_should_match = 0 when a Must clause exists: Should adds
    score but is not required; MustNot excludes at score 0."""
    case = _direct_cases(language_contract)["query-boolean-should-optional-with-must"]
    node = _ast_from_json(case["expected_ast"])
    assert case["expected_ast"].get("minimum_should_match") == 0
    got = _match_ids(direct_index, node)
    assert set(got) == {"doc-req", "doc-req-bonus"}  # excluded doc dropped
    # the Should clause only ADDS score
    assert got["doc-req-bonus"] > got["doc-req"]
    # MustNot contributes score 0.0: the surviving doc's score equals the
    # same query without the MustNot clause
    no_not = Boolean([c for c in node.children if c.occur != "MustNot"])
    base = _match_ids(direct_index, no_not)
    assert np.float32(got["doc-req"]) == np.float32(base["doc-req"])


def test_should_only_required(language_contract, direct_index):
    """minimum_should_match = 1 when no Must exists: at least one Should
    must match."""
    case = _direct_cases(language_contract)["query-boolean-should-only-required"]
    node = _ast_from_json(case["expected_ast"])
    assert case["expected_ast"].get("minimum_should_match") == 1
    got = _match_ids(direct_index, node)
    assert set(got) == {"doc-first", "doc-second", "doc-both"}
    # both-should doc accumulates both contributions
    assert got["doc-both"] > max(got["doc-first"], got["doc-second"])


def test_should_plus_mustnot_required(language_contract, direct_index):
    case = _direct_cases(language_contract)[
        "query-boolean-should-plus-mustnot-required"
    ]
    node = _ast_from_json(case["expected_ast"])
    got = _match_ids(direct_index, node)
    assert set(got) == {"doc-incl"}


def test_mustnot_only_empty(language_contract, direct_index):
    """A Boolean of only MustNot clauses matches NOTHING (the reference's
    ``matching_semantics: empty``), not the complement."""
    case = _direct_cases(language_contract)["query-boolean-mustnot-only-empty"]
    assert case["expected_ast"].get("matching_semantics") == "empty"
    node = _ast_from_json(case["expected_ast"])
    got = _match_ids(direct_index, node)
    assert got == {}
