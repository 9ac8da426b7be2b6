"""Snippet generation: fragment selection + highlighting over source text.

Pinned to the reference kernel (``quill/src/snippet.rs:1-330``; oracle
behavior ``lexical/src/lib.rs:988-1030``; fixture
``behavior_cases[behavior-snippet-output]``):

- token offsets are UTF-8 **byte** offsets into the trimmed source;
- fragments are maximal token windows whose byte span never exceeds
  ``max_chars`` (a single oversized token may exceed it — boundaries never
  split a token);
- fragment score = Σ per matching occurrence of weight
  ``1 / (1 + document_frequency)`` (f32); duplicate query terms keep their
  greatest weight; df == 0 or empty terms are ignored;
- ties prefer the earliest start offset, then the smallest stop offset;
- source is HTML-escaped (``" & ' < >``); trusted ``<b>``/``</b>`` tags wrap
  collapsed highlight ranges;
- ``snippet`` returns ``None`` when nothing matches; ``snippet_or_prefix``
  falls back to the escaped prefix bounded at the last token end within
  ``max_chars`` (or a char-boundary prefix when no token fits).
"""

from __future__ import annotations

import numpy as np

from ..contract.analyzer import MAX_TERM_BYTES, analyze_default_scalar

DEFAULT_SNIPPET_MAX_CHARS = 200

_ESCAPES = {
    '"': "&quot;",
    "&": "&amp;",
    "'": "&#x27;",
    "<": "&lt;",
    ">": "&gt;",
}


def escape_html(text: str) -> str:
    if not any(c in text for c in _ESCAPES):
        return text
    return "".join(_ESCAPES.get(c, c) for c in text)


class _Candidate:
    __slots__ = ("score", "start", "stop", "highlighted")

    def __init__(self, start: int):
        self.score = np.float32(0.0)
        self.start = start
        self.stop = start
        self.highlighted: list[tuple[int, int]] = []


def _better(cand: _Candidate, best: _Candidate | None) -> bool:
    if best is None:
        return True
    if cand.score != best.score:
        return cand.score > best.score
    if cand.start != best.start:
        return cand.start < best.start
    return cand.stop < best.stop


def _collapse(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for start, end in sorted(set(ranges)):
        if out and out[-1][1] > start:
            out[-1] = (out[-1][0], max(out[-1][1], end))
        else:
            out.append((start, end))
    return out


def _byte_slice(source_bytes: bytes, start: int, end: int) -> str:
    return source_bytes[start:end].decode("utf-8")


class SnippetGenerator:
    """Compiled once per query; renders every winner without shared state.

    ``terms`` maps analyzed term text -> snapshot document frequency for the
    snippet field (the reference weight source).
    """

    def __init__(
        self,
        terms: dict[str, int],
        max_chars: int = DEFAULT_SNIPPET_MAX_CHARS,
        highlight_prefix: str = "<b>",
        highlight_postfix: str = "</b>",
    ):
        self.weights: dict[str, np.float32] = {}
        for text, df in terms.items():
            if not text or df == 0:
                continue
            w = np.float32(1.0) / (np.float32(1.0) + np.float32(df))
            prev = self.weights.get(text)
            if prev is None or w > prev:
                self.weights[text] = w
        self.max_chars = max_chars
        self.prefix = highlight_prefix
        self.postfix = highlight_postfix

    def snippet(self, source: str) -> str | None:
        return self._generate(source, fallback_prefix=False)

    def snippet_or_prefix(self, source: str) -> str | None:
        return self._generate(source, fallback_prefix=True)

    def _generate(self, source: str, fallback_prefix: bool) -> str | None:
        source = source.strip()
        if not source:
            return None
        source_bytes = source.encode("utf-8")
        max_chars = self.max_chars

        current = _Candidate(0)
        best: _Candidate | None = None
        fallback_stop = 0

        for token, _pos, b_from, b_to in analyze_default_scalar(source):
            if b_to <= max_chars:
                fallback_stop = b_to
            if b_to - current.start > max_chars:
                completed, current = current, _Candidate(b_from)
                if completed.score > 0 and _better(completed, best):
                    best = completed
            current.stop = b_to
            if len(token.encode("utf-8")) <= MAX_TERM_BYTES:
                w = self.weights.get(token)
                if w is not None:
                    current.score = current.score + w
                    current.highlighted.append((b_from, b_to))
        if current.score > 0 and _better(current, best):
            best = current

        if best is not None:
            return self._render(source_bytes, best)
        if not fallback_prefix:
            return None

        if len(source_bytes) <= max_chars:
            stop = len(source_bytes)
        elif fallback_stop == 0:
            stop = max_chars
            while stop > 0 and (source_bytes[stop] & 0xC0) == 0x80:
                stop -= 1
        else:
            stop = fallback_stop
        if stop == 0:
            return None
        return escape_html(_byte_slice(source_bytes, 0, stop))

    def _render(self, source_bytes: bytes, frag: _Candidate) -> str:
        ranges = _collapse(
            [(s - frag.start, e - frag.start) for s, e in frag.highlighted]
        )
        text_bytes = source_bytes[frag.start : frag.stop]
        out: list[str] = []
        cursor = 0
        for start, end in ranges:
            out.append(escape_html(_byte_slice(text_bytes, cursor, start)))
            out.append(self.prefix)
            out.append(escape_html(_byte_slice(text_bytes, start, end)))
            out.append(self.postfix)
            cursor = end
        out.append(escape_html(_byte_slice(text_bytes, cursor, len(text_bytes))))
        return "".join(out)
