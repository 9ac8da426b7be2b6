"""The CASS 15-field semantic schema, end-to-end on the Ray engine.

Reference: ``quill/src/schema.rs:379-497`` (``CASS_SEMANTIC_SCHEMA``) —
keyword facets (agent / workspace / source_id / origin_kind /
origin_host), ``msg_idx`` u64 + ``created_at`` i64 fast fields, text
fields analyzed with ``CassHyphenNormalize`` (positions on) and
edge-ngram prefix fields with ``CassPrefixNormalize`` (positions off),
plus stored-only columns carried as STOREDMETA (``segment.rs:44-67``).

Mapping onto the engine:

- text fields ``content``/``title`` keep ords 0/1 so the BM25 path
  (norms, avgdl, blockmax) applies unchanged — only the analyzer
  differs (CASS hyphen-decompose + CJK bigrams).
- prefix + keyword fields are CONST-SCORE postings (tf=1-style match
  semantics): they exist to filter and prefix-match, not to rank — the
  relevance signal stays on content/title.  They ride the same shard
  routing / salting / encode / probe machinery (a keyword facet like
  ``origin_kind=local`` IS a head term and salts like one).
- ``created_at`` / ``msg_idx`` are NUMERIC fast sidecars (the existing
  binary-search range path).
- stored-only columns land in a ``stored/part-*.parquet`` sidecar as one
  ``metadata_json`` per docid (positional, winners-only hydration).

CASS filter evaluation (``query.rs:3386-3649``) arrives through
``contract.cass.parse_cass`` — facet Should-groups, created-range and
source filters are ANDed onto the root and evaluated by the standard
kernel.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .contract.analyzer import (
    analyze_cass_scalar,
    build_preview,
    generate_edge_ngrams,
)
from .contract.fieldnorm import fieldnorm_to_id
from .schema import make_docids
from .stages.tokenize import (
    DOCLEN_SCHEMA,
    IDMAP_SCHEMA,
    POSTINGS_SCHEMA,
    content_hashes,
    numeric_table,
)

# field ords 0/1 MUST stay content/title: the BM25 norms/doclen layout is
# keyed to them (schema.rs field ids differ; ords here are engine-local)
CASS_TEXT_ORDS = {"content": 0, "title": 1}
CASS_PREFIX_ORDS = {"content_prefix": 2, "title_prefix": 3}
CASS_KEYWORD_ORDS = {
    "agent": 4,
    "workspace": 5,
    "source_id": 6,
    "origin_kind": 7,
    "origin_host": 8,
}
CASS_NUMERIC_COLS = ["created_at", "msg_idx"]
CASS_STORED_COLS = [
    "workspace_original",
    "source_path",
    "preview",
    "conversation_id",
]
PREFIX_SOURCE = {"content_prefix": "content", "title_prefix": "title"}

STORED_SCHEMA = pa.schema(
    [("docid", pa.uint64()), ("metadata_json", pa.string())]
)


def _col(table: pa.Table, name: str) -> pa.Array:
    a = table[name]
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


import re as _re

# texts of plain ASCII alnum words + spaces take a split() fast path:
# both CASS analyzers reduce to (lowered word, position=word index) on
# such input (no hyphens to decompose, no CJK, no mid-token punctuation)
# — equivalence is pytest-pinned against the scalar state machine
_SIMPLE_ASCII = _re.compile(r"[A-Za-z0-9 ]*\Z")


def _prefix_text_postings(
    texts: pa.Array, field_ord: int, docids: np.ndarray
) -> tuple[pa.Table, np.ndarray, int]:
    """Edge-ngram prefix-field postings, vectorized for simple-ASCII rows.

    The scalar pipeline is ``generate_edge_ngrams`` (per word, prefixes of
    2..=20 scalars, space-joined) -> ``CassPrefixNormalize``.  For rows of
    plain ``[A-Za-z0-9 ]`` text (the dominant shape) the composition
    reduces to: for word ``i`` of char length ``L_i``, emit
    ``min(L_i,20)-1`` lowered prefixes at consecutive positions — which
    this builds with 19 ``utf8_slice_codeunits`` passes (one per prefix
    length) and a segmented cumsum for positions, byte-identical to the
    scalar path (pytest-pinned differential).  Non-simple rows fall back
    to the scalar state machine."""
    import pyarrow.compute as pc

    from .contract.analyzer import (
        CASS_MAX_EDGE_NGRAM_CHARS,
        analyze_cass_scalar,
        generate_edge_ngrams,
    )

    t = pc.fill_null(
        texts if not isinstance(texts, pa.ChunkedArray) else texts.combine_chunks(),
        "",
    )
    n = len(t)
    counts = np.zeros(n, dtype=np.int64)
    simple = pc.match_substring_regex(t, r"^[A-Za-z0-9 ]*$").to_numpy(
        zero_copy_only=False
    )
    sim_rows = np.flatnonzero(simple)
    other_rows = np.flatnonzero(~simple)

    doc_parts: list[np.ndarray] = []
    term_parts: list[pa.Array] = []
    pos_parts: list[np.ndarray] = []

    if len(sim_rows):
        sub = pc.ascii_lower(t.take(pa.array(sim_rows)))
        lists = pc.split_pattern(sub, " ")
        flat = lists.flatten()
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        word_doc = np.repeat(sim_rows, sizes)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = wl > 0  # split("") artifacts of repeated/edge spaces
        flat = flat.filter(pa.array(keep))
        word_doc = word_doc[keep]
        wl = wl[keep]
        c = np.maximum(np.minimum(wl, CASS_MAX_EDGE_NGRAM_CHARS) - 1, 0)
        # positions: prefixes of word i start at the doc-running sum of c
        P = np.cumsum(c) - c
        if len(word_doc):
            run_starts = np.concatenate(
                ([0], np.flatnonzero(word_doc[1:] != word_doc[:-1]) + 1)
            )
            run_lens = np.diff(np.concatenate((run_starts, [len(word_doc)])))
            P = P - np.repeat(P[run_starts], run_lens)
            per_doc_total = np.add.reduceat(c, run_starts)
            counts[word_doc[run_starts]] = per_doc_total
        for ln in range(2, CASS_MAX_EDGE_NGRAM_CHARS + 1):
            m = wl >= ln
            if not m.any():
                break
            doc_parts.append(word_doc[m])
            term_parts.append(pc.utf8_slice_codeunits(flat.filter(pa.array(m)), 0, ln))
            pos_parts.append((P[m] + (ln - 2)).astype(np.int64))

    if len(other_rows):
        toks_doc, toks_term, toks_pos = [], [], []
        for r in other_rows:
            v = generate_edge_ngrams(t[int(r)].as_py())
            toks = analyze_cass_scalar(v, hyphen_decompose=False)
            if toks:
                counts[r] = toks[-1][1] + 1
            for tok, pos, _bf, _bt in toks:
                toks_doc.append(r)
                toks_term.append(tok)
                toks_pos.append(pos)
        doc_parts.append(np.asarray(toks_doc, dtype=np.int64))
        term_parts.append(pa.array(toks_term, pa.string()))
        pos_parts.append(np.asarray(toks_pos, dtype=np.int64))

    doc_idx = (
        np.concatenate(doc_parts) if doc_parts else np.zeros(0, np.int64)
    )
    total = len(doc_idx)
    if total == 0:
        return POSTINGS_SCHEMA.empty_table(), counts, 0
    terms = pa.concat_arrays(
        [p.cast(pa.string()) for p in term_parts]
    ) if len(term_parts) > 1 else term_parts[0].cast(pa.string())
    poss = np.concatenate(pos_parts)
    # per-(doc,term) position lists must aggregate ascending, as the
    # scalar emission order does
    order = np.lexsort((poss, doc_idx))
    flat_tbl = pa.table(
        {
            "doc": pa.array(doc_idx[order], pa.int64()),
            "term": pc.take(terms, pa.array(order)),
            "pos": pa.array(poss[order].astype(np.uint32), pa.uint32()),
        }
    )
    return _group_flat_postings(flat_tbl, field_ord, docids, counts, total)


def _group_flat_postings(
    flat: pa.Table,
    field_ord: int,
    docids: np.ndarray,
    counts: np.ndarray,
    total: int,
) -> tuple[pa.Table, np.ndarray, int]:
    grouped = flat.group_by(["doc", "term"], use_threads=False).aggregate(
        [("pos", "list"), ("pos", "count")]
    )
    g_doc = grouped["doc"].to_numpy()
    norm_ids = fieldnorm_to_id(counts)
    out = pa.table(
        {
            "field": pa.array(
                np.full(len(grouped), field_ord, dtype=np.uint8), pa.uint8()
            ),
            "term": grouped["term"],
            "docid": pa.array(docids[g_doc], pa.uint64()),
            "tf": grouped["pos_count"].cast(pa.uint32()),
            "norm": pa.array(norm_ids[g_doc], pa.uint8()),
            "positions": grouped["pos_list"].cast(pa.list_(pa.uint32())),
        },
        schema=POSTINGS_SCHEMA,
    )
    return out, counts, total


def _scalar_text_postings(
    texts: pa.Array, field_ord: int, docids: np.ndarray, analyze, pre=None
) -> tuple[pa.Table, np.ndarray, int]:
    """Python-scalar analyzer over a column -> postings rows.

    The CASS analyzers are position/byte-offset state machines
    (``scribe.rs:799-998``) pinned by goldens — scalar here (with a
    split() fast path for plain word-and-space text, the dominant shape
    of web corpora after extraction); partition-parallelism carries the
    throughput at scale.  ``pre`` is a text pre-transform applied before
    analysis (the prefix fields' edge-ngram expansion)."""
    n = len(texts)
    doc_idx: list[int] = []
    terms: list[str] = []
    poss: list[int] = []
    counts = np.zeros(n, dtype=np.int64)
    for r, v in enumerate(texts.to_pylist()):
        v = v or ""
        if pre is not None:
            v = pre(v)
        if _SIMPLE_ASCII.match(v):
            words = v.lower().split()
            if all(len(w) <= 256 for w in words):  # CASS_MAX_TOKEN_BYTES
                counts[r] = len(words)
                doc_idx.extend([r] * len(words))
                terms.extend(words)
                poss.extend(range(len(words)))
                continue
        toks = analyze(v)
        if toks:
            counts[r] = toks[-1][1] + 1  # distinct positions emitted
        for tok, pos, _bf, _bt in toks:
            doc_idx.append(r)
            terms.append(tok)
            poss.append(pos)
    total = len(terms)
    if total == 0:
        return POSTINGS_SCHEMA.empty_table(), counts, 0
    flat = pa.table(
        {
            "doc": pa.array(doc_idx, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "pos": pa.array(poss, pa.uint32()),
        }
    )
    grouped = flat.group_by(["doc", "term"], use_threads=False).aggregate(
        [("pos", "list"), ("pos", "count")]
    )
    g_doc = grouped["doc"].to_numpy()
    norm_ids = fieldnorm_to_id(counts)
    out = pa.table(
        {
            "field": pa.array(
                np.full(len(grouped), field_ord, dtype=np.uint8), pa.uint8()
            ),
            "term": grouped["term"],
            "docid": pa.array(docids[g_doc], pa.uint64()),
            "tf": grouped["pos_count"].cast(pa.uint32()),
            "norm": pa.array(norm_ids[g_doc], pa.uint8()),
            "positions": grouped["pos_list"].cast(pa.list_(pa.uint32())),
        },
        schema=POSTINGS_SCHEMA,
    )
    return out, counts, total


def _keyword_postings(
    values: pa.Array, field_ord: int, docids: np.ndarray
) -> pa.Table:
    """One exact (untokenized) term per non-null row, tf=1, no positions."""
    vals = values.to_pylist()
    rows = [(i, str(v)) for i, v in enumerate(vals) if v is not None and v != ""]
    if not rows:
        return POSTINGS_SCHEMA.empty_table()
    idx = np.array([r[0] for r in rows], dtype=np.int64)
    return pa.table(
        {
            "field": pa.array(
                np.full(len(rows), field_ord, dtype=np.uint8), pa.uint8()
            ),
            "term": pa.array([r[1] for r in rows], pa.string()),
            "docid": pa.array(docids[idx], pa.uint64()),
            "tf": pa.array(np.ones(len(rows), dtype=np.uint32), pa.uint32()),
            "norm": pa.array(np.zeros(len(rows), dtype=np.uint8), pa.uint8()),
            "positions": pa.array([[]] * len(rows), pa.list_(pa.uint32())),
        },
        schema=POSTINGS_SCHEMA,
    )


def cass_tokenize_partition(
    table: pa.Table, partition_index: int, *, id_col: str = "id"
):
    """CASS-schema analogue of ``tokenize_partition`` — same output
    contract (postings / doclen / idmap / numeric / stored / stats), so
    the whole downstream build (salting, shard routing, streamed encode,
    manifests, maintenance) is shared."""
    n = len(table)
    docids = make_docids(partition_index, n)
    ids = _col(table, id_col)
    if pa.types.is_integer(ids.type):
        ids = ids.cast(pa.string())

    parts = []
    totals = {}
    counts = {}
    for name, ord_ in CASS_TEXT_ORDS.items():
        tbl, cnt, tot = _scalar_text_postings(
            _col(table, name), ord_, docids, analyze_cass_scalar
        )
        parts.append(tbl)
        totals[name], counts[name] = tot, cnt
    for name, ord_ in CASS_PREFIX_ORDS.items():
        src = _col(table, PREFIX_SOURCE[name])
        tbl, _cnt, _tot = _prefix_text_postings(src, ord_, docids)
        parts.append(tbl)
    for name, ord_ in CASS_KEYWORD_ORDS.items():
        parts.append(_keyword_postings(_col(table, name), ord_, docids))

    postings = pa.concat_tables(parts)
    doclen = pa.table(
        {
            "docid": pa.array(docids, pa.uint64()),
            "norm_content": pa.array(
                fieldnorm_to_id(counts["content"]), pa.uint8()
            ),
            "norm_title": pa.array(fieldnorm_to_id(counts["title"]), pa.uint8()),
            "len_content": pa.array(
                counts["content"].astype(np.uint32), pa.uint32()
            ),
            "len_title": pa.array(counts["title"].astype(np.uint32), pa.uint32()),
        },
        schema=DOCLEN_SCHEMA,
    )
    content_arr = _col(table, "content")
    idmap = pa.table(
        {
            "docid": pa.array(docids, pa.uint64()),
            "id": ids,
            "content_hash": pa.array(content_hashes(content_arr), pa.uint64()),
        },
        schema=IDMAP_SCHEMA,
    )
    from .stages.tokenize import stored_table

    stored = stored_table(table, CASS_STORED_COLS, docids)
    stats = {
        "partition": partition_index,
        "rows": n,
        "content": {"doc_count": n, "total_tokens": totals["content"]},
        "title": {"doc_count": n, "total_tokens": totals["title"]},
        "postings_rows": len(postings),
    }
    return {
        "postings": postings,
        "doclen": doclen,
        "idmap": idmap,
        "numeric": numeric_table(table, CASS_NUMERIC_COLS, docids),
        "stored": stored,
        "stats": stats,
    }


class CassSearcher:
    """CASS query surface over a ``schema_kind="cass"`` index: the native
    grammar + structured filters (``query.rs:3386-3649``) evaluated by
    the standard kernel, plus STOREDMETA hydration."""

    def __init__(self, index_dir: str):
        from .search.searcher import LocalSearcher

        self.s = LocalSearcher(index_dir)

    def search(self, query: str, filters=None, limit: int = 10, offset: int = 0, count: bool = False):
        from .contract.cass import parse_cass

        parsed = parse_cass(query, filters)
        return self.s.run_parsed(
            parsed, limit=limit, offset=offset, count=count
        )

    def metadata_for(self, docid: int) -> dict:
        """STOREDMETA round-trip (shared LocalSearcher hydration)."""
        return self.s.metadata_for(docid)
