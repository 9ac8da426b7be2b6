"""Default lenient parser vs the 18 ``default_lenient`` parse-tree goldens."""

from __future__ import annotations

import pytest

from frankensearch_ray.contract.parser import parse_default


def _normalize(obj):
    """Strip annotation-only keys the goldens carry (score hints etc.)."""
    if isinstance(obj, dict):
        return {
            k: _normalize(v)
            for k, v in obj.items()
            if k not in ("score", "matching_semantics")
        }
    if isinstance(obj, list):
        return [_normalize(v) for v in obj]
    return obj


def _default_cases(language_contract):
    return [
        c
        for c in language_contract["parse_tree_cases"]
        if c.get("parser") == "default_lenient"
    ]


def test_all_default_lenient_goldens(language_contract):
    failures = []
    for case in _default_cases(language_contract):
        parsed = parse_default(case["input"])
        got = _normalize(parsed.query.to_json())
        expected = _normalize(case["expected_ast"])
        if got != expected:
            failures.append((case["id"], case["input"], expected, got))
    assert not failures, "\n".join(
        f"{cid}: {inp!r}\n  expected {exp}\n  got      {got}"
        for cid, inp, exp, got in failures
    )


def test_diagnostics(language_contract):
    for case in _default_cases(language_contract):
        expected = case.get("expected_diagnostic")
        if not expected:
            continue
        parsed = parse_default(case["input"])
        msgs = parsed.diagnostic_messages()
        assert any(expected in m or m in expected for m in msgs), (
            case["id"],
            expected,
            msgs,
        )


def test_truncation():
    parsed = parse_default("a" * 10_001)
    assert parsed.was_truncated
    q = parsed.query.to_json()
    assert q["type"] == "Term" and len(q["text"]) == 10_000


@pytest.mark.parametrize(
    "query,expected_type",
    [("", "Empty"), ("   \n\t  ", "Empty"), ('"" ', "Empty")],
)
def test_empty_queries(query, expected_type):
    assert parse_default(query).query.to_json()["type"] == expected_type


def test_phrase_slop_parsed_into_tree():
    """``"a b"~2`` parses to a Phrase carrying slop=2 — the EVALUATOR
    rejects it with UnsupportedQuery (index.rs:10637-10641); the lenient
    parser itself keeps the tree faithful."""
    q = parse_default('"quick brown"~2').query.to_json()
    assert q["type"] == "Phrase" and q["slop"] == 2
    assert "prefix" not in q


def test_phrase_prefix_parsed_into_tree():
    """``"a b"*`` parses to a Phrase with prefix=true
    (query.rs:144, parse_phrase_suffix query.rs:2022-2055)."""
    q = parse_default('"quick brown"*').query.to_json()
    assert q["type"] == "Phrase" and q["slop"] == 0
    assert q.get("prefix") is True


def test_phrase_prefix_then_boost():
    q = parse_default('"quick brown"*^3').query.to_json()
    assert q["type"] == "Boost" and q["factor"] == 3.0
    assert q["query"].get("prefix") is True
