"""Query AST mirroring the reference Quill query model.

Node set follows ``crates/frankensearch-quill/src/query.rs:124-184``
(``Empty | All | Term | Phrase | Boolean | RangeStr | SetStr | Boost``)
with the JSON shape of the ``parse_tree_cases`` goldens in
``tests/fixtures/quill_language_contract.json``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

MUST = "Must"
SHOULD = "Should"
MUST_NOT = "MustNot"


@dataclass(frozen=True)
class QueryField:
    name: str
    boost: float

    def to_json(self):
        return {"name": self.name, "boost": self.boost}


@dataclass
class Empty:
    def to_json(self):
        return {"type": "Empty"}


@dataclass
class All:
    def to_json(self):
        return {"type": "All"}


@dataclass
class Term:
    text: str
    fields: list[QueryField]

    def to_json(self):
        return {
            "type": "Term",
            "text": self.text,
            "fields": [f.to_json() for f in self.fields],
        }


@dataclass
class Phrase:
    terms: list[str]
    slop: int
    fields: list[QueryField]
    prefix: bool = False

    def to_json(self):
        out = {
            "type": "Phrase",
            "terms": list(self.terms),
            "slop": self.slop,
            "fields": [f.to_json() for f in self.fields],
        }
        if self.prefix:
            out["prefix"] = True
        return out


@dataclass
class Clause:
    occur: str  # Must | Should | MustNot
    query: "Node"

    def to_json(self):
        return {"occur": self.occur, "query": self.query.to_json()}


@dataclass
class Boolean:
    children: list[Clause]
    operator: Optional[str] = None  # "AND" | "OR" | None (implicit join)

    def to_json(self):
        out: dict = {"type": "Boolean"}
        if self.operator:
            out["operator"] = self.operator
        out["children"] = [c.to_json() for c in self.children]
        return out


@dataclass
class Boost:
    factor: float
    query: "Node"

    def to_json(self):
        return {
            "type": "Boost",
            "factor": self.factor,
            "query": self.query.to_json(),
        }


@dataclass
class RangeBound:
    bound: str  # "Included" | "Excluded"
    value: str

    def to_json(self):
        return {"bound": self.bound, "value": self.value}


@dataclass
class RangeStr:
    field: str
    lower: Optional[RangeBound]
    upper: Optional[RangeBound]

    def to_json(self):
        out: dict = {"type": "RangeStr", "field": self.field}
        if self.lower is not None:
            out["lower"] = self.lower.to_json()
        if self.upper is not None:
            out["upper"] = self.upper.to_json()
        return out


@dataclass
class RangeI64:
    """Numeric range over an indexed i64 fast field (CASS created_at)."""

    field: str
    lower: Optional[dict]  # {"value": int, "bound": "Included"|"Excluded"}
    upper: Optional[dict]
    matched_score: float = 1.0

    def to_json(self):
        unbounded = {"bound": "Unbounded"}
        return {
            "type": "RangeI64",
            "field": self.field,
            "lower": dict(self.lower) if self.lower is not None else dict(unbounded),
            "upper": dict(self.upper) if self.upper is not None else dict(unbounded),
            "matched_score": self.matched_score,
        }


@dataclass
class GlobQuery:
    """Regex-lowered wildcard term over the CASS regex fields."""

    fields: list[str]
    pattern: str  # lowercased raw pattern

    def to_json(self):
        return {"type": "GlobQuery", "fields": list(self.fields), "pattern": self.pattern}


@dataclass
class SetStr:
    field: str
    values: list[str]

    def to_json(self):
        return {"type": "SetStr", "field": self.field, "values": list(self.values)}


Node = object  # union of the dataclasses above


@dataclass
class QueryDiagnostic:
    message: str
    fragment: Optional[str] = None


@dataclass
class ParsedQuery:
    query: Node
    diagnostics: list[QueryDiagnostic] = field(default_factory=list)
    was_truncated: bool = False

    def diagnostic_messages(self) -> list[str]:
        return [d.message for d in self.diagnostics]
