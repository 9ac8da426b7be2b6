"""The FSFS 8-field chunk schema, end-to-end on the Ray engine.

Reference: ``quill/src/schema.rs:300-377`` (``FSFS_CHUNK_SCHEMA``) —
``id`` keyword (deterministic unique chunk id), ``parent_id`` keyword
(parent-level replace/delete semantics), ``revision`` / ``chunk_ordinal``
/ ``byte_start`` / ``byte_end`` / ``token_count`` u64 fast fields (not
indexed), and ``content`` analyzed with the frankensearch default
analyzer (positions on, stored=false — content hydrates from canonical
storage, never STOREDMETA).

Mapping onto the engine (same dissolution as the CASS schema,
``cassindex.py``):

- ``content`` keeps ord 0 so the BM25 path (norms, avgdl, blockmax)
  applies unchanged; the title slot stays empty (zero counts).
- ``parent_id`` is a CONST-SCORE keyword postings field (ord 2): it
  filters, never ranks — a parent facet term rides the same shard
  routing / salting / encode / probe machinery.
- the five u64 fast fields are NUMERIC sidecars (binary-search range
  path, ``_eval_range_i64``).
- ``id`` lands in idmap + the IDHASH probe sidecar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .stages.tokenize import tokenize_partition

# content/title must stay ords 0/1 (BM25 doclen layout); parent_id is the
# first const-score ord after them
FSFS_KEYWORD_ORDS = {"parent_id": 2}
FSFS_NUMERIC_COLS = [
    "revision",
    "chunk_ordinal",
    "byte_start",
    "byte_end",
    "token_count",
]


def fsfs_tokenize_partition(
    table: pa.Table, partition_index: int, *, id_col: str = "id"
):
    """FSFS-schema analogue of ``tokenize_partition`` — same output
    contract (postings / doclen / idmap / numeric / stats), so the whole
    downstream build (salting, shard routing, streamed encode, manifests,
    maintenance) is shared.

    Content goes through the standard vectorized default analyzer;
    ``parent_id`` is appended as exact keyword postings (tf=1, no
    positions), exactly like a CASS facet.
    """
    from .cassindex import _col, _keyword_postings

    out = tokenize_partition(
        table,
        partition_index,
        id_col=id_col,
        content_col="content",
        html_col=None,
        verify_text_col=None,
        numeric_cols=FSFS_NUMERIC_COLS,
        stored_cols=None,
    )
    docids = out["idmap"]["docid"].to_numpy()
    kw = _keyword_postings(
        _col(table, "parent_id"), FSFS_KEYWORD_ORDS["parent_id"], docids
    )
    if len(kw):
        out["postings"] = pa.concat_tables([out["postings"], kw])
        out["stats"]["postings_rows"] = len(out["postings"])
    return out
