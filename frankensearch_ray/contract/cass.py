"""The native CASS query parser: grammar, wildcard classes, filters.

Reference: ``quill/src/query.rs:3384-4330`` — an intentionally
non-standard boolean grammar where **OR binds tighter than AND**,
negation is idempotent, and a negative used as an OR operand or as the
whole root is wrapped in ``All + MustNot`` (complement semantics).
Pinned by the 39 ``parser: "cass"`` parse-tree goldens of
``tests/fixtures/quill_language_contract.json``.

Pipeline per query: 10k-scalar truncation -> lex (``"..."`` phrases,
``&&``/``||``/word operators, leading ``-`` = NOT; ``\\r`` is NOT
grammar whitespace) -> grammar with OR-group collection + recovery
diagnostics -> term lowering (sanitize -> wildcard classify -> CJK
bigrams / prefix-field term / regex glob) -> structured filters ANDed
onto the root.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from .analyzer import _is_cass_cjk, truncate_query
from .query_ast import (
    MUST,
    MUST_NOT,
    SHOULD,
    All,
    Boolean,
    Clause,
    Empty,
    GlobQuery,
    ParsedQuery,
    Phrase,
    QueryDiagnostic,
    QueryField,
    RangeI64,
    Term,
)

SEARCHABLE_FIELDS = ("title", "content", "title_prefix", "content_prefix")
PHRASE_FIELDS = ("title", "content")
REGEX_FIELDS = ("content", "title")


@dataclass
class CassQueryFilters:
    agents: list[str] = dc_field(default_factory=list)
    workspaces: list[str] = dc_field(default_factory=list)
    created_from: int | None = None
    created_to: int | None = None
    source_filter: str = "all"  # all | local | remote | source_id
    source_id: str | None = None


# --- wildcard classes (query.rs:3414-3520) ---------------------------------


_REGEX_SPECIALS = set("\\.+*?()[]{}|^$")


def _escape_regex(value: str) -> str:
    return "".join(("\\" + c) if c in _REGEX_SPECIALS else c for c in value)


def _complex_regex(pattern: str) -> str:
    out = []
    if pattern.startswith("*"):
        out.append(".*")
    core = pattern.lstrip("*").rstrip("*")
    for c in core:
        if c == "*":
            out.append(".*")
        elif c in _REGEX_SPECIALS and c != "*":
            out.append("\\" + c)
        else:
            out.append(c)
    if pattern.endswith("*"):
        out.append(".*")
    return "".join(out)


def parse_wildcard(term: str) -> tuple[str, str]:
    """Classify one sanitized term -> ``(class, core-or-pattern)``.

    Classes: Exact | Prefix | Suffix | Substring | Complex.  Core is
    lowercased; Complex keeps the full lowercased pattern."""
    starts = term.startswith("*")
    ends = term.endswith("*")
    core = term.strip("*")
    if not core:
        return "Exact", ""
    if "*" in core:
        return "Complex", term.lower()
    core = core.lower()
    if starts and ends:
        return "Substring", core
    if starts:
        return "Suffix", core
    if ends:
        return "Prefix", core
    return "Exact", core


def classify_wildcard(raw: str) -> dict:
    """Fixture-shaped classification record for one glob pattern."""
    klass, core = parse_wildcard(raw)
    if klass in ("Exact", "Prefix"):
        out = {
            "type": "Glob",
            "pattern": raw,
            "class": klass,
            "strategy": "TermQuery",
            "fields": list(SEARCHABLE_FIELDS),
        }
        if klass == "Prefix":
            out["normalized_term"] = core
        return out
    if klass == "Suffix":
        regex = ".*" + _escape_regex(core)
    elif klass == "Substring":
        regex = ".*" + _escape_regex(core) + ".*"
    else:
        regex = _complex_regex(core)
    out = {
        "type": "Glob",
        "pattern": raw,
        "class": klass,
        "strategy": "RegexQuery",
        "regex": regex,
        "fields": list(REGEX_FIELDS),
    }
    if klass == "Complex":
        out["question_mark_operator"] = False
    return out


# --- sanitize + lowering ---------------------------------------------------


def sanitize(raw: str) -> str:
    """Alphanumeric scalars, ``*``, ``"`` and ``-`` survive; everything
    else becomes a space (``query.rs:3469-3479``)."""
    return "".join(
        c if (c.isalnum() or c in '*"-') else " " for c in raw
    )


def _searchable() -> list[QueryField]:
    return [QueryField(n, 1.0) for n in SEARCHABLE_FIELDS]


def _is_empty(node) -> bool:
    return isinstance(node, Empty)


def _required(queries: list) -> object:
    queries = [q for q in queries if not _is_empty(q)]
    if not queries:
        return Empty()
    if len(queries) == 1:
        return queries[0]
    return Boolean([Clause(MUST, q) for q in queries], operator="AND")


def _cjk_terms(term: str) -> list[str]:
    chars = [c for c in term if _is_cass_cjk(c)]
    if len(chars) <= 1:
        return ["".join(chars)] if chars else []
    return ["".join(chars[i : i + 2]) for i in range(len(chars) - 1)]


def _lower_term_part(raw: str):
    klass, core = parse_wildcard(raw)
    if klass in ("Exact", "Prefix"):
        if not core:
            return None
        if any(_is_cass_cjk(c) for c in core):
            terms = _cjk_terms(core)
            return _required([Term(t, _searchable()) for t in terms])
        return Term(core, _searchable())
    return GlobQuery(list(REGEX_FIELDS), raw.lower())


def _lower_compound(parts: list[str]):
    queries = []
    for p in parts:
        q = _lower_term_part(p)
        if q is not None:
            queries.append(q)
    return _required(queries)


def lower_term(raw: str):
    return _lower_compound(sanitize(raw).split())


def lower_phrase(raw: str):
    terms = [t.strip("*").lower() for t in sanitize(raw).split()]
    terms = [t for t in terms if t]
    if len(terms) <= 1 or any(
        any(_is_cass_cjk(c) for c in t) for t in terms
    ):
        return _lower_compound(terms)
    return Phrase(terms, 0, [QueryField(n, 1.0) for n in PHRASE_FIELDS])


def _complement(query) -> Boolean:
    return Boolean([Clause(MUST, All()), Clause(MUST_NOT, query)])


# --- lexer (query.rs:4040-4118) -------------------------------------------


def _lex(query: str, diagnostics: list[QueryDiagnostic]):
    tokens: list[tuple] = []  # (kind, payload, offset); kind term|phrase|and|or|not
    word: list[str] = []
    word_offset = 0

    def flush():
        if not word:
            return
        text = "".join(word)
        word.clear()
        up = text.upper()
        if up == "AND":
            tokens.append(("and", None, word_offset))
        elif up == "OR":
            tokens.append(("or", None, word_offset))
        elif up == "NOT":
            tokens.append(("not", None, word_offset))
        else:
            tokens.append(("term", text, word_offset))

    i = 0
    n = len(query)
    byte_off = 0
    while i < n:
        ch = query[i]
        if ch == '"':
            flush()
            j = i + 1
            phrase = []
            closed = False
            while j < n:
                if query[j] == '"':
                    closed = True
                    break
                phrase.append(query[j])
                j += 1
            if phrase:
                tokens.append(("phrase", "".join(phrase), byte_off))
            if not closed:
                diagnostics.append(
                    QueryDiagnostic(
                        "CASS syntax recovery: unterminated phrase"
                    )
                )
            adv = (j + 1 if closed else j) - i
            byte_off += len(query[i : i + adv].encode("utf-8"))
            i += adv
            continue
        if ch == "&" and i + 1 < n and query[i + 1] == "&":
            flush()
            tokens.append(("and", None, byte_off))
            byte_off += 2
            i += 2
            continue
        if ch == "|" and i + 1 < n and query[i + 1] == "|":
            flush()
            tokens.append(("or", None, byte_off))
            byte_off += 2
            i += 2
            continue
        if ch == "-" and not word:
            tokens.append(("not", None, byte_off))
        elif ch in (" ", "\t", "\n"):
            flush()
        else:
            if not word:
                word_offset = byte_off
            word.append(ch)
        byte_off += len(ch.encode("utf-8"))
        i += 1
    flush()
    return tokens


# --- grammar (query.rs:4120-4310) ------------------------------------------


def _flush_or_group(pending: list, clauses: list[Clause]) -> None:
    if not pending:
        return
    group = Boolean([Clause(SHOULD, q) for q in pending], operator="OR")
    pending.clear()
    clauses.append(Clause(MUST, group))


def _apply(query, next_occur, state, pending, clauses) -> None:
    if state["in_or"] and state["just_saw_or"]:
        if (
            not pending
            and clauses
            and clauses[-1].occur in (MUST, MUST_NOT)
        ):
            clause = clauses.pop()
            pending.append(
                _complement(clause.query)
                if clause.occur == MUST_NOT
                else clause.query
            )
        pending.append(
            _complement(query) if next_occur == MUST_NOT else query
        )
    else:
        _flush_or_group(pending, clauses)
        state["in_or"] = False
        clauses.append(Clause(next_occur, query))
    state["just_saw_or"] = False


def _diag(diagnostics: list[QueryDiagnostic], message: str) -> None:
    diagnostics.append(
        QueryDiagnostic(f"CASS syntax recovery: {message}")
    )


def _parse_tokens(tokens, diagnostics):
    """Returns ``(query, negative)`` or None for an operand-free query."""
    clauses: list[Clause] = []
    pending: list = []
    state = {"in_or": False, "just_saw_or": False}
    next_occur = MUST
    saw_operand = False
    last_binary = None
    dangling_not = None

    for kind, payload, offset in tokens:
        if kind == "and":
            if not saw_operand or last_binary is not None:
                _diag(diagnostics, "AND without an adjacent operand was recovered")
            if dangling_not is not None:
                _diag(diagnostics, "NOT has no operand before AND")
                dangling_not = None
            _flush_or_group(pending, clauses)
            state["in_or"] = False
            state["just_saw_or"] = False
            next_occur = MUST
            last_binary = offset
        elif kind == "or":
            if not saw_operand or last_binary is not None:
                _diag(diagnostics, "OR without an adjacent operand was recovered")
            state["in_or"] = True
            state["just_saw_or"] = True
            last_binary = offset
        elif kind == "not":
            if not state["just_saw_or"]:
                _flush_or_group(pending, clauses)
                state["in_or"] = False
                state["just_saw_or"] = False
            next_occur = MUST_NOT
            if dangling_not is None:
                dangling_not = offset
            last_binary = None
        else:  # term | phrase
            query = (
                lower_term(payload) if kind == "term" else lower_phrase(payload)
            )
            if _is_empty(query):
                _diag(
                    diagnostics,
                    "empty term operand was skipped"
                    if kind == "term"
                    else "empty phrase operand was skipped",
                )
                continue
            _apply(query, next_occur, state, pending, clauses)
            next_occur = MUST
            saw_operand = True
            last_binary = None
            dangling_not = None

    _flush_or_group(pending, clauses)
    if dangling_not is not None:
        _diag(diagnostics, "dangling NOT has no operand")
    if last_binary is not None:
        _diag(diagnostics, "dangling binary operator has no operand")

    if len(clauses) == 1:
        c = clauses[0]
        return c.query, c.occur == MUST_NOT
    if not clauses:
        return None
    if all(c.occur == MUST_NOT for c in clauses):
        clauses.insert(0, Clause(MUST, All()))
    return Boolean(clauses, operator="AND"), False


# --- filters (query.rs:3730-3800) ------------------------------------------


def _string_filter(field_name: str, values: list[str]):
    if not values:
        return None
    return Boolean(
        [Clause(SHOULD, Term(v, [QueryField(field_name, 1.0)])) for v in values]
    )


def _apply_filters(root, filters: CassQueryFilters):
    f = filters
    if (
        not f.agents
        and not f.workspaces
        and f.created_from is None
        and f.created_to is None
        and f.source_filter == "all"
    ):
        return root
    clauses = [Clause(MUST, root)]
    for field_name, values in (("agent", f.agents), ("workspace", f.workspaces)):
        q = _string_filter(field_name, values)
        if q is not None:
            clauses.append(Clause(MUST, q))
    if f.created_from is not None or f.created_to is not None:
        clauses.append(
            Clause(
                MUST,
                RangeI64(
                    "created_at",
                    (
                        {"value": f.created_from, "bound": "Included"}
                        if f.created_from is not None
                        else None
                    ),
                    (
                        {"value": f.created_to, "bound": "Included"}
                        if f.created_to is not None
                        else None
                    ),
                ),
            )
        )
    source = None
    if f.source_filter == "local":
        source = ("origin_kind", "local")
    elif f.source_filter == "remote":
        source = ("origin_kind", "ssh")
    elif f.source_filter == "source_id":
        source = ("source_id", f.source_id or "")
    if source is not None:
        clauses.append(
            Clause(MUST, Term(source[1], [QueryField(source[0], 1.0)]))
        )
    if len(clauses) == 1:
        return clauses[0].query
    return Boolean(clauses)


# --- entry -----------------------------------------------------------------


def parse_cass(raw: str, filters: CassQueryFilters | None = None) -> ParsedQuery:
    filters = filters or CassQueryFilters()
    admitted = truncate_query(raw)
    was_truncated = len(admitted) < len(raw)
    diagnostics: list[QueryDiagnostic] = []
    if was_truncated:
        diagnostics.append(
            QueryDiagnostic(
                "CASS query truncated to 10000 Unicode scalar values"
            )
        )
    tokens = _lex(admitted, diagnostics)
    parsed = _parse_tokens(tokens, diagnostics)
    if parsed is None:
        root = All()
    else:
        query, negative = parsed
        root = _complement(query) if negative else query
    return ParsedQuery(
        query=_apply_filters(root, filters),
        diagnostics=diagnostics,
        was_truncated=was_truncated,
    )
