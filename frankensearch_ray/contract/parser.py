"""The default lenient query parser.

Re-implements the observable grammar of Quill's ``DefaultQueryParser``
(``crates/frankensearch-quill/src/query.rs:753-835`` and the grammar below
it), pinned by the 18 ``default_lenient`` ``parse_tree_cases`` goldens:

- whitespace-separated clauses, default join = implicit Should;
- ``AND`` binds tighter than ``OR``; implicit join binds loosest;
- ``+`` -> Must, ``-``/``NOT`` -> MustNot (repeated NOT is idempotent);
- one unquoted atom analyzing to >1 term becomes a Phrase (``src/main.rs``);
- quoted phrases; a quoted atom analyzing to one term collapses to Term;
- unterminated quotes recover with a diagnostic, never a syntax error;
- ``field:atom``, ``field:(group scope)``, ``field:[a TO b}`` ranges,
  ``field: IN [v1 v2]`` sets, ``^boost``, ``~slop``;
- unknown fields drop the fragment with diagnostics, keeping valid siblings;
- duplicate clauses at one level dedup structurally (keep-first);
- an all-negative root is repaired by appending ``Should(All)``.

Default search fields: ``content`` boost 1.0, ``title`` boost 2.0
(``lexical/src/lib.rs:80-81``); ``id`` is a raw keyword field.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Optional

from .analyzer import analyze_query_terms, truncate_query
from .query_ast import (
    MUST,
    MUST_NOT,
    SHOULD,
    All,
    Boolean,
    Boost,
    Clause,
    Empty,
    ParsedQuery,
    Phrase,
    QueryDiagnostic,
    QueryField,
    RangeBound,
    RangeStr,
    SetStr,
    Term,
)

DEFAULT_FIELDS = (QueryField("content", 1.0), QueryField("title", 2.0))
TITLE_BOOST = 2.0

# schema fields the default parser accepts (DEFAULT_SCHEMA, schema.rs:295-298)
_TEXT_FIELDS = {"content": 1.0, "title": TITLE_BOOST}
_KEYWORD_FIELDS = {"id"}
_KNOWN_FIELDS = set(_TEXT_FIELDS) | _KEYWORD_FIELDS

_FIELD_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


# --- lexer -----------------------------------------------------------------


@dataclass
class Tok:
    kind: str  # LPAREN RPAREN AND OR NOT PLUS MINUS ATOM RANGE SET BOOST
    raw: str = ""
    field: Optional[str] = None
    quoted: bool = False
    unterminated: bool = False
    slop: int = 0
    prefix: bool = False
    boost: Optional[float] = None
    # range parts
    lower: str = ""
    upper: str = ""
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    values: Optional[list[str]] = None


def _read_suffixes(text: str, i: int, tok: Tok) -> int:
    """Consume ``~slop`` and ``^boost`` suffixes at position i."""
    n = len(text)
    while i < n and text[i] in "~^":
        ch = text[i]
        j = i + 1
        while j < n and (text[j].isdigit() or text[j] in ".-"):
            j += 1
        body = text[i + 1 : j]
        if ch == "~":
            try:
                tok.slop = int(body)
            except ValueError:
                pass
        else:
            try:
                tok.boost = float(body)
            except ValueError:
                pass
        i = j
    return i


def _lex(text: str, diagnostics: list[QueryDiagnostic]) -> list[Tok]:
    toks: list[Tok] = []
    pending_field: Optional[str] = None
    i = 0
    n = len(text)

    def attach_field(tok: Tok) -> Tok:
        nonlocal pending_field
        if pending_field is not None and tok.field is None:
            tok.field = pending_field
        pending_field = None
        return tok

    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            t = attach_field(Tok("LPAREN"))
            toks.append(t)
            i += 1
            continue
        if ch == ")":
            t = Tok("RPAREN")
            i = _read_suffixes(text, i + 1, t)
            toks.append(t)
            continue
        if ch in "+-" and i + 1 < n and not text[i + 1].isspace() and text[i + 1] not in "()":
            toks.append(Tok("PLUS" if ch == "+" else "MINUS"))
            i += 1
            continue
        if ch in "\"'":
            quote = ch
            j = i + 1
            while j < n and text[j] != quote:
                j += 1
            unterminated = j >= n
            raw = text[i + 1 : j]
            t = Tok("ATOM", raw=raw, quoted=True, unterminated=unterminated)
            if unterminated:
                diagnostics.append(
                    QueryDiagnostic("syntax recovery", fragment=text[i:])
                )
                i = n
            else:
                # ``"a b"*`` marks a phrase-prefix; ``*`` and ``~slop`` are
                # mutually exclusive (query.rs:2022-2055 parse_phrase_suffix)
                end = j + 1
                if end < n and text[end] == "*":
                    t.prefix = True
                    end += 1
                i = _read_suffixes(text, end, t)
            toks.append(attach_field(t))
            continue
        if ch in "[{":
            close = {"]": True, "}": False}
            j = i + 1
            while j < n and text[j] not in "]}":
                j += 1
            inner = text[i + 1 : j]
            lower_inclusive = ch == "["
            upper_inclusive = j < n and text[j] == "]"
            t = Tok("RANGE")
            parts = inner.split(" TO ")
            if len(parts) == 2:
                t.lower = parts[0].strip()
                t.upper = parts[1].strip()
                t.lower_inclusive = lower_inclusive
                t.upper_inclusive = upper_inclusive
                i = _read_suffixes(text, j + 1 if j < n else n, t)
                toks.append(attach_field(t))
            else:
                diagnostics.append(
                    QueryDiagnostic("malformed range dropped", fragment=inner)
                )
                i = j + 1 if j < n else n
            continue
        # bare word
        j = i
        while j < n and not text[j].isspace() and text[j] not in "()\"'[{":
            j += 1
        word = text[i:j]
        i = j
        if word in ("AND", "OR", "NOT"):
            pending_field = None
            toks.append(Tok(word))
            continue
        if word == "IN":
            # set literal: IN [v1 v2 ...]
            k = i
            while k < n and text[k].isspace():
                k += 1
            if k < n and text[k] == "[":
                m = k + 1
                while m < n and text[m] != "]":
                    m += 1
                values = text[k + 1 : m].split()
                t = Tok("SET", values=values)
                i = _read_suffixes(text, m + 1 if m < n else n, t)
                toks.append(attach_field(t))
                continue
        # field prefix? split at the FIRST ':'
        field = None
        rest = word
        colon = word.find(":")
        if colon > 0 and _FIELD_NAME_RE.match(word[:colon]):
            field = word[:colon]
            rest = word[colon + 1 :]
            if rest == "":
                pending_field = field
                continue
        t = Tok("ATOM", raw=rest)
        if field is not None:
            t.field = field
            pending_field = None
        else:
            t = attach_field(t)
        # strip suffixes embedded in the word (rust^3, phrase~2)
        m = re.search(r"([~^])(-?[\d.]+)$", t.raw)
        while m:
            if m.group(1) == "~":
                try:
                    t.slop = int(m.group(2))
                except ValueError:
                    break
            else:
                try:
                    t.boost = float(m.group(2))
                except ValueError:
                    break
            t.raw = t.raw[: m.start()]
            m = re.search(r"([~^])(-?[\d.]+)$", t.raw)
        toks.append(t)
    return toks


# --- grammar ---------------------------------------------------------------


class _Dropped:
    """Sentinel: a fragment that lowered away (kept for clause counting)."""


DROPPED = _Dropped()


class DefaultQueryParser:
    """Lenient parser over the default 5-field schema.

    ``parse`` never raises on user input; malformed fragments become
    diagnostics (``query.rs:793-835``).

    ``analyze`` overrides the term-atomization function (query-side hook
    of the ``extension.Analyzer`` protocol) — an index built with a custom
    analyzer must atomize queries with the SAME analyzer or terms never
    match the dictionary.
    """

    def __init__(self, analyze=None):
        self._analyze = analyze or analyze_query_terms

    def parse(self, query: str) -> ParsedQuery:
        original = query
        query = truncate_query(query)
        was_truncated = len(query) < len(original)
        diagnostics: list[QueryDiagnostic] = []
        if was_truncated:
            diagnostics.append(
                QueryDiagnostic("query truncated to 10000 Unicode scalar values")
            )
        toks = _lex(query, diagnostics)
        node = self._parse_sequence(toks, 0, len(toks), None, diagnostics, top=True)
        node = _repair_root_all_negative(node, diagnostics)
        if node is DROPPED or node is None:
            node = Empty()
        return ParsedQuery(node, diagnostics, was_truncated)

    # sequence := clause+ (implicit Should join, loosest binding)
    def _parse_sequence(self, toks, start, end, scope_field, diagnostics, top=False):
        pos = [start]
        clauses: list[tuple[str, object]] = []  # (occur, node-or-DROPPED)
        syntactic = 0
        while pos[0] < end:
            occur, node = self._parse_or(toks, pos, end, scope_field, diagnostics)
            if node is None:
                break
            syntactic += 1
            clauses.append((occur or SHOULD, node))
        live = [(o, q) for o, q in clauses if q is not DROPPED]
        if syntactic == 0:
            return All() if not top else Empty()
        if syntactic == 1:
            if not live:
                return DROPPED
            occur, q = live[0]
            if occur == SHOULD:
                return q
            return Boolean([Clause(occur, q)])
        if not live:
            return DROPPED
        # structural dedup, keep-first (query-default-recursive-dedup)
        seen = set()
        out = []
        for occur, q in live:
            key = json.dumps({"occur": occur, "q": q.to_json()}, sort_keys=True)
            if key in seen:
                continue
            seen.add(key)
            out.append(Clause(occur, q))
        return Boolean(out)

    # or := and (OR and)*   — AND binds tighter than OR
    def _parse_or(self, toks, pos, end, scope_field, diagnostics):
        occur, left = self._parse_and(toks, pos, end, scope_field, diagnostics)
        if left is None:
            return occur, None
        children = [(occur, left)]
        while pos[0] < end and toks[pos[0]].kind == "OR":
            pos[0] += 1
            if pos[0] >= end:
                diagnostics.append(
                    QueryDiagnostic("dangling binary operator has no operand")
                )
                break
            o2, right = self._parse_and(toks, pos, end, scope_field, diagnostics)
            if right is None:
                diagnostics.append(
                    QueryDiagnostic("dangling binary operator has no operand")
                )
                break
            children.append((o2, right))
        if len(children) == 1:
            return children[0]
        live = [(o, q) for o, q in children if q is not DROPPED]
        if not live:
            return None, DROPPED
        out = [
            Clause(MUST_NOT if o == MUST_NOT else SHOULD, q) for o, q in live
        ]
        return None, Boolean(out, operator="OR")

    # and := unary (AND unary)*
    def _parse_and(self, toks, pos, end, scope_field, diagnostics):
        occur, left = self._parse_unary(toks, pos, end, scope_field, diagnostics)
        if left is None:
            return occur, None
        children = [(occur, left)]
        while pos[0] < end and toks[pos[0]].kind == "AND":
            pos[0] += 1
            if pos[0] >= end:
                diagnostics.append(
                    QueryDiagnostic(
                        "AND without an adjacent operand was recovered"
                    )
                )
                break
            o2, right = self._parse_unary(toks, pos, end, scope_field, diagnostics)
            if right is None:
                diagnostics.append(
                    QueryDiagnostic(
                        "AND without an adjacent operand was recovered"
                    )
                )
                break
            children.append((o2, right))
        if len(children) == 1:
            return children[0]
        live = [(o, q) for o, q in children if q is not DROPPED]
        if not live:
            return None, DROPPED
        out = [Clause(MUST_NOT if o == MUST_NOT else MUST, q) for o, q in live]
        return None, Boolean(out, operator="AND")

    # unary := (+|-|NOT)* primary
    def _parse_unary(self, toks, pos, end, scope_field, diagnostics):
        occur = None
        while pos[0] < end and toks[pos[0]].kind in ("PLUS", "MINUS", "NOT"):
            kind = toks[pos[0]].kind
            pos[0] += 1
            if kind == "PLUS":
                occur = MUST
            else:
                # repeated NOT is idempotent (query-boolean-repeated-not)
                occur = MUST_NOT
        node = self._parse_primary(toks, pos, end, scope_field, diagnostics)
        if node is None and occur is not None:
            diagnostics.append(QueryDiagnostic("dangling NOT has no operand"))
        return occur, node

    def _parse_primary(self, toks, pos, end, scope_field, diagnostics):
        if pos[0] >= end:
            return None
        tok = toks[pos[0]]
        if tok.kind == "RPAREN":
            pos[0] += 1
            return DROPPED
        if tok.kind == "LPAREN":
            inner_scope = tok.field if tok.field is not None else scope_field
            depth = 1
            j = pos[0] + 1
            while j < end and depth:
                if toks[j].kind == "LPAREN":
                    depth += 1
                elif toks[j].kind == "RPAREN":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            inner = self._parse_sequence(
                toks, pos[0] + 1, j, inner_scope, diagnostics
            )
            boost = toks[j].boost if j < end else None
            pos[0] = j + 1 if j < end else end
            if inner is DROPPED or inner is None:
                return DROPPED
            if boost is not None:
                return Boost(boost, inner)
            return inner
        if tok.kind == "RANGE":
            pos[0] += 1
            return self._lower_range(tok, scope_field, diagnostics)
        if tok.kind == "SET":
            pos[0] += 1
            return self._lower_set(tok, scope_field, diagnostics)
        if tok.kind == "ATOM":
            pos[0] += 1
            return self._lower_atom(tok, scope_field, diagnostics)
        # AND/OR at primary position: leading operator recovery
        diagnostics.append(
            QueryDiagnostic("AND without an adjacent operand was recovered")
            if tok.kind == "AND"
            else QueryDiagnostic("dangling binary operator has no operand")
        )
        pos[0] += 1
        return self._parse_primary(toks, pos, end, scope_field, diagnostics)

    # --- lowering ----------------------------------------------------------

    def _resolve_fields(self, explicit, scope_field, diagnostics):
        name = explicit if explicit is not None else scope_field
        if name is None:
            return list(DEFAULT_FIELDS), None
        if name in _TEXT_FIELDS:
            return [QueryField(name, _TEXT_FIELDS[name])], None
        if name in _KEYWORD_FIELDS:
            return [QueryField(name, 1.0)], "keyword"
        diagnostics.append(QueryDiagnostic(f"unknown field {name}"))
        diagnostics.append(QueryDiagnostic("unsupported field fragment dropped"))
        return None, None

    def _lower_atom(self, tok: Tok, scope_field, diagnostics):
        fields, kind = self._resolve_fields(tok.field, scope_field, diagnostics)
        if fields is None:
            return DROPPED
        if kind == "keyword":
            if not tok.raw:
                return DROPPED
            node = Term(tok.raw, fields)
        else:
            terms = self._analyze(tok.raw)
            if not terms:
                return DROPPED
            if len(terms) == 1:
                node = Term(terms[0], fields)
            else:
                node = Phrase(terms, tok.slop, fields, prefix=tok.prefix)
        if tok.boost is not None:
            node = Boost(tok.boost, node)
        return node

    def _lower_bound_value(self, value: str, kind) -> Optional[str]:
        if kind == "keyword":
            return value or None
        terms = self._analyze(value)
        return terms[0] if terms else None

    def _lower_range(self, tok: Tok, scope_field, diagnostics):
        fields, kind = self._resolve_fields(tok.field, scope_field, diagnostics)
        if fields is None:
            return DROPPED
        field_name = fields[0].name
        lower = self._lower_bound_value(tok.lower, kind)
        upper = self._lower_bound_value(tok.upper, kind)
        node = RangeStr(
            field_name,
            RangeBound("Included" if tok.lower_inclusive else "Excluded", lower)
            if lower is not None and tok.lower != "*"
            else None,
            RangeBound("Included" if tok.upper_inclusive else "Excluded", upper)
            if upper is not None and tok.upper != "*"
            else None,
        )
        if tok.boost is not None:
            return Boost(tok.boost, node)
        return node

    def _lower_set(self, tok: Tok, scope_field, diagnostics):
        fields, kind = self._resolve_fields(tok.field, scope_field, diagnostics)
        if fields is None:
            return DROPPED
        field_name = fields[0].name
        values: list[str] = []
        for v in tok.values or []:
            lowered = self._lower_bound_value(v, kind)
            if lowered is not None and lowered not in values:
                values.append(lowered)
        if not values:
            return DROPPED
        node = SetStr(field_name, values)
        if tok.boost is not None:
            return Boost(tok.boost, node)
        return node


def _repair_root_all_negative(node, diagnostics):
    """Append ``Should(All)`` when every root clause is MustNot
    (``query-default-all-negative-complement``)."""
    if isinstance(node, Boolean) and node.children and all(
        c.occur == MUST_NOT for c in node.children
    ):
        node.children.append(Clause(SHOULD, All()))
        diagnostics.append(
            QueryDiagnostic("all-negative query repaired with All")
        )
    return node


_PARSER = DefaultQueryParser()


def parse_default(query: str, analyze=None) -> ParsedQuery:
    if analyze is None:
        return _PARSER.parse(query)
    return DefaultQueryParser(analyze).parse(query)


def classify_query(query: str) -> str:
    """Trivial query-shape classification (``query.rs:437-478``)."""
    q = query.strip()
    if not q:
        return "Empty"
    if any(op in q for op in (" AND ", " OR ", " NOT ", "+", "-")):
        return "Boolean"
    if '"' in q:
        return "Phrase"
    return "Simple"
