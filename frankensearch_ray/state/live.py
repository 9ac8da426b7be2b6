"""Live always-searchable delta (``quill/src/delta.rs:784-930`` analogue).

The reference's delta writer makes every accepted mutation searchable
IMMEDIATELY — before any commit/seal — while queries keep the full
contract (BM25 scoring, phrase, ranges, globs, id probes, snippets).
``state/watch.py`` covers the committed side (micro-batch → delta
generation, ≤1 s visibility); this module closes the gap in front of it:

- :class:`LiveIndex` wraps a built index and accepts ``upsert`` /
  ``delete`` batches whose effects are visible to the next ``search()``
  call with NO disk write;
- pending docs live in an in-memory **overlay segment** attached to the
  :class:`~frankensearch_ray.search.searcher.LocalSearcher` at its
  postings / blockmax / norms / stats / tombstone taps.  Docids, BM25
  stats, df, no-op upsert detection and tombstones are allocated with
  EXACTLY the algebra the committed path uses, so a live search result
  is bit-identical (ids, docids, score_bits, ranks) to committing the
  same mutations and reopening — pytest-pinned in
  ``tests/test_live.py``;
- ``commit()`` replays the pending operation log through the durable
  writer paths (``maintenance.upsert_table`` / ``delete_documents``)
  batch-for-batch and reopens the sealed searcher.

Scale shape: the overlay is bounded by the PENDING WINDOW (what a
single writer accepted since its last commit), never by the corpus —
the same bound the reference's in-memory delta carries.  A crash loses
only the uncommitted window; the sealed index (two-slot manifest) is
untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import FIELD_NAMES
from . import maintenance as mnt


class _Overlay:
    """In-memory delta segment state consumed by the searcher taps."""

    def __init__(self):
        # (field_ord, term) -> [docid arrays, tf arrays, norm arrays,
        #                       per-posting position lists]
        self.post: dict[tuple[int, str], list] = {}
        self.stats: dict[str, tuple[int, int]] = {}
        self.tombstones: set[int] = set()
        self.doclen_parts: dict[int, tuple] = {}
        self.idmaps: dict[int, pa.Table] = {}
        self.stored: dict[int, pa.Table | None] = {}
        self.sources: dict[int, tuple[list, bool]] = {}
        self.live_ids: dict[str, tuple[int, int]] = {}  # ext -> (docid, hash)
        self.numeric: dict[str, list] = {}  # field -> [(values, docids), ...]

    # --- searcher-facing API -------------------------------------------

    def postings_for(self, ford: int, term: str):
        e = self.post.get((ford, term))
        if e is None:
            return None
        d, tf, nm, pos = e
        if len(d) > 1:
            return (
                np.concatenate(d),
                np.concatenate(tf),
                np.concatenate(nm),
                [p for batch in pos for p in batch],
            )
        return d[0], tf[0], nm[0], list(pos[0])

    def terms_of(self, ford: int):
        return sorted(t for f, t in self.post if f == ford)

    def terms_matching(self, ford: int, node):
        from ..contract.query_ast import SetStr

        out = []
        if isinstance(node, SetStr):
            vals = set(node.values)
            return [t for t in self.terms_of(ford) if t in vals]
        lo = node.lower.value if node.lower is not None else None
        lo_inc = node.lower is None or node.lower.bound == "Included"
        hi = node.upper.value if node.upper is not None else None
        hi_inc = node.upper is None or node.upper.bound == "Included"
        for t in self.terms_of(ford):
            if lo is not None and (t < lo or (t == lo and not lo_inc)):
                continue
            if hi is not None and (t > hi or (t == hi and not hi_inc)):
                continue
            out.append(t)
        return out

    def ids_in_range(self, node) -> np.ndarray:
        from ..contract.query_ast import SetStr

        hits = []
        if isinstance(node, SetStr):
            for v in node.values:
                got = self.live_ids.get(v)
                if got is not None:
                    hits.append(got[0])
        else:
            lo = node.lower.value if node.lower is not None else None
            lo_inc = node.lower is None or node.lower.bound == "Included"
            hi = node.upper.value if node.upper is not None else None
            hi_inc = node.upper is None or node.upper.bound == "Included"
            for ext, (docid, _h) in self.live_ids.items():
                if lo is not None and (ext < lo or (ext == lo and not lo_inc)):
                    continue
                if hi is not None and (ext > hi or (ext == hi and not hi_inc)):
                    continue
                hits.append(docid)
        return np.array(sorted(hits), dtype=np.uint64)

    def numeric_for(self, field_name: str):
        parts = self.numeric.get(field_name)
        if not parts:
            return None, None
        v = np.concatenate([p[0] for p in parts])
        d = np.concatenate([p[1] for p in parts])
        return v.astype(np.int64), d.astype(np.uint64)


class LiveIndex:
    """Writer session with reference-delta visibility semantics.

    ``upsert(table)`` / ``delete(ids)`` are searchable on return;
    ``commit()`` makes them durable (replaying the same batches through
    the maintenance writer paths — allocation, no-op detection and
    tombstoning mirror those paths exactly, which is what makes live
    results bit-identical to committed ones); ``close()`` discards the
    pending window.
    """

    def __init__(self, index_dir: str):
        from ..search.searcher import LocalSearcher

        self.index_dir = index_dir
        self.searcher = LocalSearcher(index_dir)
        cfg = mnt._cfg_of(self.searcher.manifest)
        if cfg.schema_kind != "pages":
            raise ValueError(
                f"LiveIndex covers the pages schema; got {cfg.schema_kind!r}"
            )
        self.cfg = cfg
        self._analyzer = cfg.resolve_analyzer()
        self.overlay = _Overlay()
        self._next_pindex = 1 + max(
            (p["index"] for p in self.searcher.manifest["partitions"]),
            default=-1,
        )
        self._log: list[tuple[str, object]] = []
        self.searcher.attach_overlay(self.overlay)

    # --- helpers ---------------------------------------------------------

    def _content_of(self, table: pa.Table) -> pa.Array:
        cfg = self.cfg
        if cfg.html_col and cfg.html_col in table.column_names:
            from ..sources.extract import extract_batch
            from ..stages.tokenize import upsert_identity

            titles, content = extract_batch(table[cfg.html_col])
            return upsert_identity(content, titles)
        content = table[cfg.content_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        return content

    def _probe_current(self, ids: list[str]) -> dict[str, tuple[int, int]]:
        """Visible version per external id: pending overlay docs shadow
        sealed ones (identical to probing a committed index after the
        pending window was flushed)."""
        sealed = mnt._probe_ids(
            self.index_dir, self.searcher.manifest, ids
        )
        out = dict(sealed)
        for ext in ids:
            got = self.overlay.live_ids.get(ext)
            if got is not None:
                out[ext] = got
        # ids whose only version is tombstoned are not live
        return {
            e: (d, h)
            for e, (d, h) in out.items()
            if d not in self.overlay.tombstones
        }

    def _merge_tokenized(self, tok: dict, table: pa.Table, pindex: int):
        ov = self.overlay
        post = tok["postings"]
        if len(post):
            f = post["field"].to_numpy()
            d = post["docid"].to_numpy()
            tf = post["tf"].to_numpy()
            nm = post["norm"].to_numpy()
            pos = post["positions"].to_pylist()
            terms = post["term"].to_pylist()
            # group rows per (field, term), docid-ascending within a group
            # (pending windows are small; this is a latency path)
            by_key: dict[tuple[int, str], list[int]] = {}
            for i in range(len(post)):
                by_key.setdefault((int(f[i]), terms[i]), []).append(i)
            for key, rows in by_key.items():
                rows = sorted(rows, key=lambda i: d[i])
                entry = ov.post.setdefault(key, [[], [], [], []])
                entry[0].append(d[rows].astype(np.uint64))
                entry[1].append(tf[rows].astype(np.uint32))
                entry[2].append(nm[rows].astype(np.uint8))
                entry[3].append(
                    [np.asarray(pos[i], dtype=np.uint32) for i in rows]
                )
        dl = tok["doclen"]
        ov.doclen_parts[pindex] = (
            dl["docid"].to_numpy(),
            dl["norm_content"].to_numpy(),
            dl["norm_title"].to_numpy(),
        )
        st = tok["stats"]
        for ford, fname in FIELD_NAMES.items():
            cur = ov.stats.get(fname, (0, 0))
            fs = st.get(fname, {"doc_count": 0, "total_tokens": 0})
            ov.stats[fname] = (
                cur[0] + int(fs["doc_count"]),
                cur[1] + int(fs["total_tokens"]),
            )
        idmap = tok["idmap"]
        ov.idmaps[pindex] = idmap.select(["id"])
        ov.stored[pindex] = tok.get("stored")
        col = self.cfg.html_col or self.cfg.content_col
        raws = table[col].to_pylist()
        ov.sources[pindex] = (raws, bool(self.cfg.html_col))
        for i, ext in enumerate(idmap["id"].to_pylist()):
            ov.live_ids[ext] = (
                int(idmap["docid"][i].as_py()),
                int(idmap["content_hash"][i].as_py()),
            )
        num = tok.get("numeric")
        if num is not None and len(num):
            nf = num["field"].to_pylist()
            nv = num["value"].to_numpy()
            nd = num["docid"].to_numpy()
            for fname in set(nf):
                sel = np.asarray(nf) == fname
                self.overlay.numeric.setdefault(fname, []).append(
                    (nv[sel], nd[sel])
                )

    # --- mutations ---------------------------------------------------------

    def upsert(self, table: pa.Table) -> dict:
        """Replace-or-add with content-hash no-op detection — the
        ``maintenance.upsert_table`` algebra, applied to the overlay.
        Searchable on return; durable only after :meth:`commit`."""
        from ..stages.tokenize import content_hashes, tokenize_partition

        cfg = self.cfg
        ids = table[cfg.id_col].to_pylist()
        if len(set(ids)) != len(ids):
            raise ValueError("upsert batch contains duplicate ids")
        hashes = content_hashes(self._content_of(table))
        live = self._probe_current(ids)
        keep_rows, tombstone_docids = [], []
        for i, ext in enumerate(ids):
            hit = live.get(ext)
            if hit is not None:
                old_docid, old_hash = hit
                if old_hash == int(hashes[i]):
                    continue  # no-op upsert: identical content
                tombstone_docids.append(old_docid)
            keep_rows.append(i)
        applied = {"kept": len(keep_rows), "noop": len(ids) - len(keep_rows)}
        # tokenize FIRST: tokenize_partition can raise (extraction
        # verification, malformed columns), and applying the tombstones
        # before it would leave the replaced docs dead in the overlay
        # with no replacement and no log entry — live results would
        # silently diverge from the durable state the commit replays
        tok = new_table = pindex = None
        if keep_rows:
            new_table = table.take(pa.array(keep_rows, pa.int64()))
            verify = (
                cfg.verify_text_col
                if cfg.verify_text_col in new_table.column_names
                else None
            )
            tok = tokenize_partition(
                new_table,
                self._next_pindex,
                id_col=cfg.id_col,
                content_col=cfg.content_col,
                html_col=cfg.html_col,
                verify_text_col=verify,
                numeric_cols=cfg.numeric_cols or None,
                stored_cols=cfg.stored_cols or None,
                analyzer=self._analyzer,
            )
        # ---- no exceptions past this point: apply atomically ----
        self.overlay.tombstones.update(tombstone_docids)
        if tok is not None:
            pindex = self._next_pindex
            self._next_pindex += 1
            self._merge_tokenized(tok, new_table, pindex)
        self._log.append(("upsert", table))
        self.searcher.attach_overlay(self.overlay)
        return applied

    def delete(self, ids: list[str]) -> dict:
        """Tombstone the given external ids, visible on return."""
        live = self._probe_current(ids)
        self.overlay.tombstones.update(d for d, _h in live.values())
        for ext in ids:
            self.overlay.live_ids.pop(ext, None)
        self._log.append(("delete", list(ids)))
        self.searcher.attach_overlay(self.overlay)
        return {"tombstoned": len(live)}

    # --- reads ---------------------------------------------------------

    def search(self, query: str, **kw):
        return self.searcher.search(query, **kw)

    def pending_ops(self) -> int:
        return len(self._log)

    # --- durability ------------------------------------------------------

    def commit(self, auto_maintain: bool = False) -> dict:
        """Flush the pending window batch-for-batch through the durable
        writer paths and reopen the sealed searcher.  With
        ``auto_maintain`` the inline merge/compaction policy runs after
        the replay (post-compaction df can differ from the live view,
        exactly as it does for any committed index)."""
        from ..search.searcher import LocalSearcher

        manifest = None
        for kind, payload in self._log:
            if kind == "upsert":
                manifest = mnt.upsert_table(
                    self.index_dir, payload, auto_maintain=False
                )
            else:
                manifest = mnt.delete_documents(
                    self.index_dir, payload, auto_maintain=False
                )
        if auto_maintain and self._log:
            manifest = mnt.maybe_maintain(self.index_dir)
        self._log.clear()
        self.overlay = _Overlay()
        self.searcher = LocalSearcher(self.index_dir)
        self._next_pindex = 1 + max(
            (p["index"] for p in self.searcher.manifest["partitions"]),
            default=-1,
        )
        self.searcher.attach_overlay(self.overlay)
        return manifest if manifest is not None else self.searcher.manifest

    def close(self) -> None:
        """Discard the pending window (crash semantics: uncommitted
        mutations are lost; the sealed index is untouched)."""
        self._log.clear()
        self.overlay = _Overlay()
        self.searcher.detach_overlay()
