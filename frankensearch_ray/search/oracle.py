"""Exhaustive in-memory scoring oracle — the differential reference.

Independent execution path from the index/shard machinery (plain python
dicts + scalar loops over the scalar-reference analyzer), sharing only the
pinned contract kernel (``contract.bm25``/``fieldnorm``) — which is the
spec, not the implementation under test.  Mirrors the role of the
reference's differential gauntlet comparator
(``gauntlet/src/comparator.rs``, ``PLAN.md:507-513``): the engine must be
rank-identical (and score-bit-identical on this platform) to this oracle
on every corpus + query.
"""

from __future__ import annotations

import numpy as np

from ..contract import bm25
from ..contract.analyzer import analyze_admitted_scalar
from ..contract.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from ..contract.query_ast import (
    MUST,
    MUST_NOT,
    SHOULD,
    All,
    Boolean,
    Boost,
    Empty,
    Phrase,
    RangeStr,
    SetStr,
    Term,
)

_FIELDS = ("content", "title")


class ExhaustiveOracle:
    def __init__(self, docs: list[tuple[int, str, str, str]]):
        """``docs``: list of ``(docid, external_id, title, content)``."""
        self.postings: dict[tuple[str, str], dict[int, list[int]]] = {}
        self.doclen: dict[str, dict[int, int]] = {f: {} for f in _FIELDS}
        self.ids: dict[int, str] = {}
        self.docids: list[int] = []
        totals = {f: 0 for f in _FIELDS}
        for docid, ext_id, title, content in docs:
            self.ids[docid] = ext_id
            self.docids.append(docid)
            for fname, text in (("content", content), ("title", title)):
                toks = analyze_admitted_scalar(text or "")
                self.doclen[fname][docid] = len(toks)
                totals[fname] += len(toks)
                for tok, pos, _f, _t in toks:
                    self.postings.setdefault((fname, tok), {}).setdefault(
                        docid, []
                    ).append(pos)
        self.docids.sort()
        n = len(docs)
        self.stats = {
            f: {"doc_count": n, "total_tokens": totals[f]} for f in _FIELDS
        }

    # --- scoring helpers ---------------------------------------------------

    def _field_env(self, fname: str):
        st = self.stats[fname]
        n = st["doc_count"]
        avgdl = (
            np.float32(st["total_tokens"]) / np.float32(n)
            if n
            else np.float32(1.0)
        )
        return n, avgdl

    def _norm(self, fname: str, docid: int, avgdl) -> np.float32:
        fid = int(fieldnorm_to_id(self.doclen[fname][docid]))
        return bm25.cached_tf_component(id_to_fieldnorm(fid), avgdl)

    def _term_field_scores(self, term: str, fname: str, boost: float):
        plist = self.postings.get((fname, term))
        if not plist:
            return {}
        n, avgdl = self._field_env(fname)
        df = len(plist)
        w = bm25.term_weight(bm25.idf(df, n), boost)
        out = {}
        for docid, positions in plist.items():
            f = np.float32(len(positions))
            norm = self._norm(fname, docid, avgdl)
            out[docid] = np.float32(w) * (f / (f + norm))
        return out

    @staticmethod
    def _sum_parts(parts: list[dict]):
        out: dict[int, np.float32] = {}
        for part in parts:
            for docid, s in part.items():
                if docid in out:
                    out[docid] = np.float32(out[docid] + s)
                else:
                    out[docid] = np.float32(np.float32(0.0) + s)
        return out

    def _eval_term(self, node: Term, boost: float):
        parts = []
        for f in node.fields:
            if f.name in _FIELDS:
                parts.append(
                    self._term_field_scores(node.text, f.name, f.boost * boost)
                )
            elif f.name == "id":
                parts.append(
                    {
                        d: np.float32(1.0)
                        for d, ext in self.ids.items()
                        if ext == node.text
                    }
                )
        return self._sum_parts(parts)

    def _eval_phrase_field(self, terms, fname, boost):
        n, avgdl = self._field_env(fname)
        lists = []
        for t in terms:
            plist = self.postings.get((fname, t))
            if not plist:
                return {}
            lists.append(plist)
        cand = set(lists[0])
        for pl in lists[1:]:
            cand &= set(pl)
        out = {}
        idf_total = np.float32(0.0)
        for pl in lists:
            idf_total = np.float32(idf_total + bm25.idf(len(pl), n))
        w = bm25.term_weight(idf_total, boost)
        for docid in cand:
            base = lists[0][docid]
            count = 0
            for p in base:
                if all(p + i in lists[i][docid] for i in range(1, len(lists))):
                    count += 1
            if count:
                f = np.float32(count)
                norm = self._norm(fname, docid, avgdl)
                out[docid] = np.float32(w) * (f / (f + norm))
        return out

    def _eval_phrase(self, node: Phrase, boost: float):
        parts = [
            self._eval_phrase_field(node.terms, f.name, f.boost * boost)
            for f in node.fields
            if f.name in _FIELDS
        ]
        return self._sum_parts(parts)

    def _eval_range_set(self, node):
        if node.field == "id":
            out = {}
            for docid, ext in self.ids.items():
                if isinstance(node, SetStr):
                    ok = ext in node.values
                else:
                    ok = True
                    if node.lower is not None:
                        ok &= (
                            ext >= node.lower.value
                            if node.lower.bound == "Included"
                            else ext > node.lower.value
                        )
                    if node.upper is not None:
                        ok &= (
                            ext <= node.upper.value
                            if node.upper.bound == "Included"
                            else ext < node.upper.value
                        )
                if ok:
                    out[docid] = np.float32(1.0)
            return out
        if node.field not in _FIELDS:
            return {}
        out = {}
        for (fname, term), plist in self.postings.items():
            if fname != node.field:
                continue
            if isinstance(node, SetStr):
                ok = term in node.values
            else:
                ok = True
                if node.lower is not None:
                    ok &= (
                        term >= node.lower.value
                        if node.lower.bound == "Included"
                        else term > node.lower.value
                    )
                if node.upper is not None:
                    ok &= (
                        term <= node.upper.value
                        if node.upper.bound == "Included"
                        else term < node.upper.value
                    )
            if ok:
                for docid in plist:
                    out[docid] = np.float32(1.0)
        return out

    def evaluate(self, node, boost: float = 1.0) -> dict[int, np.float32]:
        if isinstance(node, Empty):
            return {}
        if isinstance(node, All):
            return {d: np.float32(1.0) for d in self.docids}
        if isinstance(node, Term):
            return self._eval_term(node, boost)
        if isinstance(node, Phrase):
            return self._eval_phrase(node, boost)
        if isinstance(node, Boost):
            inner = self.evaluate(node.query, boost)
            return {
                d: np.float32(s * np.float32(node.factor))
                for d, s in inner.items()
            }
        if isinstance(node, (RangeStr, SetStr)):
            return self._eval_range_set(node)
        if isinstance(node, Boolean):
            return self._eval_boolean(node, boost)
        raise TypeError(type(node))

    def _eval_boolean(self, node: Boolean, boost: float):
        musts, shoulds, nots = [], [], []
        for c in node.children:
            if c.occur == MUST:
                musts.append(self.evaluate(c.query, boost))
            elif c.occur == SHOULD:
                shoulds.append(self.evaluate(c.query, boost))
            elif c.occur == MUST_NOT:
                nots.append(set(self.evaluate(c.query, 1.0)))
        if musts:
            base = set(musts[0])
            for m in musts[1:]:
                base &= set(m)
            out = {}
            for d in base:
                acc = np.float32(0.0)
                for m in musts:
                    acc = np.float32(acc + m[d])
                for sh in shoulds:
                    if d in sh:
                        acc = np.float32(acc + sh[d])
                out[d] = acc
        elif shoulds:
            out = self._sum_parts(shoulds)
        else:
            return {}
        for ex in nots:
            out = {d: s for d, s in out.items() if d not in ex}
        return out

    def top_k(self, scores: dict[int, np.float32], limit: int, offset: int = 0):
        ranked = sorted(
            scores.items(), key=lambda kv: (-float(kv[1]), kv[0])
        )
        return [
            {
                "id": self.ids[d],
                "docid": d,
                "score": float(s),
                "score_bits": int(np.float32(s).view(np.uint32)),
                "rank": r,
            }
            for r, (d, s) in enumerate(ranked[offset : offset + limit])
        ]

    def search(self, parsed_query, limit: int = 10, offset: int = 0):
        scores = self.evaluate(parsed_query)
        return {
            "hits": self.top_k(scores, limit, offset),
            "total": len(scores),
        }
