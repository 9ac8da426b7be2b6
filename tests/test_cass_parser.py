"""CASS query parser vs the 39 ``parser: "cass"`` parse-tree goldens.

Glob cases pin the wildcard classifier (``CassWildcardPattern`` +
strategy lowering); everything else pins the grammar + term lowering +
structured filters through ``parse_cass``.
"""

from __future__ import annotations

import pytest

from frankensearch_ray.contract.cass import (
    CassQueryFilters,
    classify_wildcard,
    parse_cass,
)


def _normalize(obj):
    if isinstance(obj, dict):
        return {
            k: _normalize(v)
            for k, v in obj.items()
            if k not in ("score", "matching_semantics")
        }
    if isinstance(obj, list):
        return [_normalize(v) for v in obj]
    return obj


def _cases(language_contract):
    by_id = {c["id"]: c for c in language_contract["parse_tree_cases"]}

    def resolve(ast):
        while isinstance(ast, dict) and set(ast.keys()) == {"ref"}:
            ast = by_id[ast["ref"]]["expected_ast"]
        return ast

    return [
        (c, resolve(c["expected_ast"]))
        for c in language_contract["parse_tree_cases"]
        if c.get("parser") == "cass"
    ]


def _filters(case) -> CassQueryFilters:
    f = case.get("filters") or {}
    return CassQueryFilters(
        agents=list(f.get("agents", [])),
        workspaces=list(f.get("workspaces", [])),
        created_from=f.get("created_from"),
        created_to=f.get("created_to"),
        source_filter=f.get("source_filter", "all"),
        source_id=f.get("source_id"),
    )


def test_all_cass_goldens(language_contract):
    failures = []
    for case, expected in _cases(language_contract):
        expected = _normalize(expected)
        if expected.get("type") == "Glob":
            got = _normalize(classify_wildcard(case["input"]))
        else:
            got = _normalize(
                parse_cass(case["input"], _filters(case)).query.to_json()
            )
        if got != expected:
            failures.append((case["id"], case["input"], expected, got))
    assert not failures, "\n".join(
        f"{cid}: {inp!r}\n  expected {exp}\n  got      {got}"
        for cid, inp, exp, got in failures
    )


def test_cass_diagnostics(language_contract):
    for case, _expected in _cases(language_contract):
        want = case.get("expected_diagnostic")
        if not want:
            continue
        parsed = parse_cass(case["input"], _filters(case))
        msgs = parsed.diagnostic_messages()
        assert any(want in m for m in msgs), (case["id"], want, msgs)


class TestGrammarEdges:
    def test_symbolic_operators(self):
        a = parse_cass("auth && cache").query.to_json()
        b = parse_cass("auth AND cache").query.to_json()
        assert a == b
        a = parse_cass("auth || cache").query.to_json()
        b = parse_cass("auth OR cache").query.to_json()
        assert a == b

    def test_truncation_diagnostic(self):
        parsed = parse_cass("a" * 10_001)
        assert parsed.was_truncated
        assert any("truncated" in m for m in parsed.diagnostic_messages())

    def test_single_ampersand_is_sanitized_away(self):
        got = parse_cass("a&b").query.to_json()
        # '&' -> space in sanitize: compound lowers to AND of two terms
        assert got["type"] == "Boolean" and len(got["children"]) == 2

    def test_glob_inside_query_lowers_to_regex_node(self):
        got = parse_cass("*suffix").query.to_json()
        assert got == {
            "type": "GlobQuery",
            "fields": ["content", "title"],
            "pattern": "*suffix",
        }
