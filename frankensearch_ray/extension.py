"""User-extension surface: formal protocols + registries (SURVEY §2.11).

Mirrors the reference's pluggability seams:

- ``Analyzer`` ↔ the sealed ``TokenAnalyzer`` trait
  (``crates/frankensearch-quill/src/scribe.rs:142-176``): one object owns
  both the scalar token contract and the vectorized Arrow column path.
- ``LexicalRead`` / ``LexicalWrite`` ↔ the core traits
  (``crates/frankensearch-core/src/traits.rs:927-1062``): ``search`` +
  ``doc_count`` on the read side, ``index_documents`` / ``delete_documents``
  / ``upsert_documents`` / ``commit`` on the write side.  ``LocalSearcher``
  satisfies ``LexicalRead``; :class:`IndexWriter` (a facade over
  ``state.maintenance``) satisfies ``LexicalWrite``.

Custom analyzers plug in two ways:

1. **Same-process**: ``register_analyzer(obj)`` then
   ``BuildConfig(analyzer=obj.name)``.  The build resolves the object on
   the DRIVER (inside ``PhaseATokenizer.__init__``) and cloudpickle ships
   it to workers, so the registry never needs to exist in worker
   processes.
2. **Cross-process / re-open**: name the analyzer with a ``"module:attr"``
   spec (e.g. ``"myplugin.analyzers:SHOUT"``); :func:`get_analyzer`
   imports it lazily, so a searcher opening the index in a fresh process
   can still recover the exact query-side analysis.

The analyzer name is baked into the manifest config AND the per-partition
resume fingerprint, so switching analyzers forces a rebuild instead of
silently mixing token contracts (same discipline as the reference's
schema_id pinning, ``schema.rs:201-241``).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Iterable, Protocol, runtime_checkable

import numpy as np
import pyarrow as pa

from .contract import analyzer as _default_mod

DEFAULT_ANALYZER = "frankensearch_default"


@runtime_checkable
class Analyzer(Protocol):
    """The token contract one field analyzer must satisfy.

    ``analyze`` is the scalar reference (tokens with positions and UTF-8
    byte offsets); ``query_terms`` is the query-side analysis (admission
    applied); ``analyze_column`` is the vectorized batch path the build's
    hot loop calls.  :class:`ScalarAnalyzer` derives the latter two from
    ``analyze`` for quick plug-ins.
    """

    name: str

    def analyze(self, text: str) -> list[tuple[str, int, int, int]]:
        """-> [(token, position, byte_from, byte_to)], admission applied."""
        ...

    def query_terms(self, text: str) -> list[str]:
        """Query-side analysis: token texts only."""
        ...

    def analyze_column(
        self, texts: pa.Array
    ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        """Vectorized batch path: (tokens, doc_idx int64, positions u32),
        tokens of one doc contiguous and position-ordered."""
        ...


class ScalarAnalyzer:
    """Adapter base: implement ``analyze`` (or pass a function) and the
    column/query paths are derived.  The derived column path is a Python
    loop — fine for plug-in correctness, subclass ``analyze_column`` for
    a vectorized hot path (see the built-in default analyzer)."""

    name = "scalar"

    def __init__(
        self,
        fn: Callable[[str], Iterable[tuple[str, int, int, int]]] | None = None,
        name: str | None = None,
    ):
        if fn is not None:
            self._fn = fn
        if name is not None:
            self.name = name

    def analyze(self, text: str) -> list[tuple[str, int, int, int]]:
        return list(self._fn(text))

    def query_terms(self, text: str) -> list[str]:
        return [t[0] for t in self.analyze(text)]

    def analyze_column(
        self, texts: pa.Array
    ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        toks: list[str] = []
        doc_idx: list[int] = []
        positions: list[int] = []
        for i in range(len(texts)):
            v = texts[i].as_py()
            if v is None:
                continue
            for tok, pos, _b0, _b1 in self.analyze(v):
                toks.append(tok)
                doc_idx.append(i)
                positions.append(pos)
        return (
            pa.array(toks, pa.string()),
            np.asarray(doc_idx, dtype=np.int64),
            np.asarray(positions, dtype=np.uint32),
        )


class DefaultAnalyzer:
    """``frankensearch_default`` (``scribe.rs:742-786``): scalar contract +
    the vectorized Arrow path in ``contract.analyzer``."""

    name = DEFAULT_ANALYZER

    def analyze(self, text: str) -> list[tuple[str, int, int, int]]:
        return _default_mod.analyze_admitted_scalar(text)

    def query_terms(self, text: str) -> list[str]:
        return _default_mod.analyze_query_terms(text)

    def analyze_column(
        self, texts: pa.Array
    ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        return _default_mod.tokenize_column(texts)


class CassAnalyzer(ScalarAnalyzer):
    """CASS hyphen-normalize family (``scribe.rs:799-998``); the CASS
    index build has its own vectorized stage in ``cassindex`` — this
    registry entry exposes the scalar contract for plug-in use."""

    def __init__(self, hyphen_decompose: bool = True):
        self.name = "cass" if hyphen_decompose else "cass_prefix"
        self._hyphen = hyphen_decompose

    def analyze(self, text: str) -> list[tuple[str, int, int, int]]:
        return _default_mod.analyze_cass_scalar(
            text, hyphen_decompose=self._hyphen
        )


_REGISTRY: dict[str, Analyzer] = {}


def register_analyzer(obj: Analyzer) -> Analyzer:
    """Register by ``obj.name``.  Re-registering a name replaces it."""
    if not isinstance(obj, Analyzer):
        raise TypeError(
            f"{obj!r} does not satisfy the Analyzer protocol "
            "(need name / analyze / query_terms / analyze_column)"
        )
    _REGISTRY[obj.name] = obj
    return obj


def get_analyzer(name_or_obj: "str | Analyzer") -> Analyzer:
    """Resolve an analyzer: a registered name, a ``module:attr`` spec
    (imported lazily — the cross-process path), or an object satisfying
    the protocol (returned as-is)."""
    if isinstance(name_or_obj, str):
        if name_or_obj in _REGISTRY:
            return _REGISTRY[name_or_obj]
        if ":" in name_or_obj:
            mod_name, attr = name_or_obj.split(":", 1)
            obj = getattr(importlib.import_module(mod_name), attr)
            if isinstance(obj, type) or (
                callable(obj) and not isinstance(obj, Analyzer)
            ):
                obj = obj()  # factory / class spec
            return register_analyzer(obj)
        raise KeyError(
            f"unknown analyzer {name_or_obj!r}; registered: "
            f"{sorted(_REGISTRY)} (or use a 'module:attr' spec)"
        )
    if isinstance(name_or_obj, Analyzer):
        return name_or_obj
    raise TypeError(f"not an Analyzer: {name_or_obj!r}")


def analyzers() -> list[str]:
    return sorted(_REGISTRY)


register_analyzer(DefaultAnalyzer())
register_analyzer(CassAnalyzer(True))
register_analyzer(CassAnalyzer(False))


# --- read/write traits ------------------------------------------------------


@runtime_checkable
class LexicalRead(Protocol):
    """``core/src/traits.rs:927-1062`` read half: top-k search + O(1)
    doc_count.  ``LocalSearcher`` satisfies this."""

    def search(self, query: str, limit: int = ...) -> Any: ...

    def doc_count(self) -> int: ...


@runtime_checkable
class LexicalWrite(Protocol):
    """Write half: batch add / delete / upsert + commit (seal + merge)."""

    def index_documents(self, table: pa.Table) -> Any: ...

    def delete_documents(self, ids: list[str]) -> Any: ...

    def upsert_documents(self, table: pa.Table) -> Any: ...

    def commit(self) -> Any: ...


class IndexWriter:
    """``LexicalWrite`` facade over ``state.maintenance``.

    ``index_documents``/``upsert_documents``/``delete_documents`` apply a
    batch as a searchable delta generation immediately (the reference's
    always-searchable-delta bet Q3, ``PLAN.md:255-261``);  ``commit()``
    runs the inline maintenance policy (tiered merge + density-triggered
    compaction) and returns the published manifest — the durable seal.
    """

    def __init__(self, index_dir: str, auto_maintain: bool = False):
        self.index_dir = index_dir
        self.auto_maintain = auto_maintain

    def index_documents(self, table: pa.Table) -> dict:
        from .state import maintenance as mnt

        return mnt.append_table(
            self.index_dir, table, auto_maintain=self.auto_maintain
        )

    def delete_documents(self, ids: list[str]) -> dict:
        from .state import maintenance as mnt

        return mnt.delete_documents(
            self.index_dir, ids, auto_maintain=self.auto_maintain
        )

    def upsert_documents(self, table: pa.Table) -> dict:
        from .state import maintenance as mnt

        return mnt.upsert_table(
            self.index_dir, table, auto_maintain=self.auto_maintain
        )

    def commit(self) -> dict:
        from .state import maintenance as mnt

        return mnt.maybe_maintain(self.index_dir)
