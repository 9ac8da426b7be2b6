"""Index schema constants (mirror of the reference default 5-field schema).

Reference: ``crates/frankensearch-quill/src/schema.rs:295-298`` — ``id``
Keyword stored, ``content``/``title`` Text (FrankensearchDefault analyzer,
positions on) with query-side boosts content=1.0 / title=2.0
(``lexical/src/lib.rs:80-81``).  We carry ``metadata`` as opaque JSON in the
idmap and ``ord``/docid as the (partition << 32 | row) lease layout.
"""

from __future__ import annotations

FIELD_CONTENT = 0
FIELD_TITLE = 1

FIELD_ORDS = {"content": FIELD_CONTENT, "title": FIELD_TITLE}
FIELD_NAMES = {v: k for k, v in FIELD_ORDS.items()}
FIELD_BOOSTS = {"content": 1.0, "title": 2.0}

PARTITION_SHIFT = 32  # docid = (partition_index << 32) | row_offset
ROW_MASK = (1 << PARTITION_SHIFT) - 1


def make_docids(partition_index: int, n_rows: int):
    import numpy as np

    base = np.uint64(partition_index) << np.uint64(PARTITION_SHIFT)
    return base + np.arange(n_rows, dtype=np.uint64)
