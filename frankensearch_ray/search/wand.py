"""Rank-safe block-max pruned top-k for Should-union term queries.

A windowed block-max WAND variant in the spirit of the reference's
``BufferedUnionScorer`` + Block-Max WAND / MaxScore strategies
(``argus.rs:4057-4300``, ``UNION_HORIZON`` score windows): the docid space
is swept in segments bounded by posting-block boundaries; a segment whose
summed per-clause block-max bounds stay strictly below the current
kth-best score is skipped without decoding.  Segments that survive are
scored EXACTLY with the same f32 clause-order accumulation as the
exhaustive kernel, so pruned results are bit-identical to exhaustive —
the reference's own differential gate (pruned ≡ exhaustive,
``PLAN.md:513``).

Bounds are computed from the durable (max_freq_code, min_fieldnorm_id)
pairs against the LIVE avgdl at query time (``quiver.rs:1769-1786``);
monotonicity of f32 rounding keeps the bound conservative for the f32
score sums.

Pruning applies when the root is a single Term or a Boolean of only
Should Term children (the dominant query class); anything else falls back
to the exhaustive evaluator — mirroring the reference's gating (pruning
iff top-docs root without exact count, ``index.rs:7907-7908``).
"""

from __future__ import annotations

import heapq

import numpy as np

from ..codecs import decode_postings_from
from ..contract import bm25
from ..contract.query_ast import SHOULD, Boolean, Term
from ..schema import FIELD_ORDS

MAX_BATCH_SEGMENTS = 64

# reference gate (index.rs:9971-9986): fan segment scoring across threads
# only when >= 2 segments and (>= 10k docs or >= 8 segments)
SEGMENT_FANOUT_THRESHOLD = 10_000
SEGMENT_COUNT_FANOUT_THRESHOLD = 8

# The exact kernel accumulates clause scores with f32 round-to-nearest,
# which can round UP above the real-number sum; bounds summed in f64 must
# therefore be padded before the strict-< pruning comparison or a sub-ulp
# sliver could prune a doc that ties/beats the kth score.  Relative error
# of an m-term f32 chain sum is < m * eps/2 (eps = 2^-23); padding by
# m * eps gives a 2x margin while staying far too small to cost pruning
# effectiveness.
_F32_EPS = float(np.finfo(np.float32).eps)


def _bound_pad(n_terms: int) -> float:
    return 1.0 + max(1, n_terms) * _F32_EPS


class _Leaf:
    """One (field, term) scorer: lazily block-decoded postings + bounds."""

    def __init__(self, searcher, field_name: str, term: str, boost: float):
        ford = FIELD_ORDS[field_name]
        self.searcher = searcher
        self.ford = ford
        n, avgdl = searcher.field_bm25(field_name)
        self.avgdl = float(avgdl)
        # blockmax decode + bucket-concat bookkeeping is snapshot-constant:
        # cached on the searcher and shared across queries
        entry = searcher.blockmax_entry(ford, term)
        self.empty = entry is None
        if self.empty:
            self.first_docs = np.zeros(0, np.uint64)
            self.bounds = np.zeros(0, np.float64)
            self.df = 0
            return
        df = entry["df"]
        self.df = int(df)
        self.weight = bm25.term_weight(bm25.idf(min(df, n), n), boost)
        self.tf_cache = bm25.compute_tf_cache(avgdl)
        self.rows = entry["rows"]
        self.block_row = entry["block_row"]
        self.block_offset = entry["block_offset"]
        self.first_docs = entry["first_docs"]
        # vectorized conservative block bound: weight * f/(f+norm(min_fn))
        freqs = bm25.block_max_frequency_from_code(entry["codes"]).astype(
            np.float32
        )
        norms = self.tf_cache[entry["minfn"].astype(np.int64)]
        self.bounds = (
            np.float32(self.weight) * (freqs / (freqs + norms))
        ).astype(np.float64)
        self._decoded = entry["decoded"]  # shared decoded-block cache

    def n_blocks(self) -> int:
        return len(self.first_docs)

    def decode_block(self, b: int):
        got = self._decoded.get(b)
        if got is not None:
            return got
        row = self.rows[self.block_row[b]]
        buf = row["postings"]
        off = int(self.block_offset[b])
        payload_len = int.from_bytes(buf[off + 2 : off + 4], "little")
        d, f = decode_postings_from(buf[: off + 4 + payload_len], off)
        self._decoded[b] = (d, f)
        return d, f

    def postings_in(self, lo: int, hi: int):
        """Decoded (docids, tfs) within [lo, hi) using block skipping."""
        if self.empty:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
        b0 = int(np.searchsorted(self.first_docs, lo, side="right")) - 1
        b0 = max(b0, 0)
        b1 = int(np.searchsorted(self.first_docs, hi, side="left"))
        ds, fs = [], []
        for b in range(b0, b1):
            d, f = self.decode_block(b)
            i0 = int(np.searchsorted(d, lo))
            i1 = int(np.searchsorted(d, hi))
            if i1 > i0:
                ds.append(d[i0:i1])
                fs.append(f[i0:i1])
        if not ds:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
        return np.concatenate(ds), np.concatenate(fs)

def _extract_union_clauses(searcher, node):
    """Return clause leaf lists for a pure Should-union of Terms, else None."""
    if isinstance(node, Term):
        terms = [node]
    elif isinstance(node, Boolean):
        if not node.children or any(c.occur != SHOULD for c in node.children):
            return None
        if not all(isinstance(c.query, Term) for c in node.children):
            return None
        terms = [c.query for c in node.children]
    else:
        return None
    clauses = []
    for t in terms:
        if any(f.name not in FIELD_ORDS for f in t.fields):
            # keyword (id) fields score outside the postings/blockmax
            # machinery — bail to the exhaustive kernel
            return None
        leaves = [_Leaf(searcher, f.name, t.text, f.boost) for f in t.fields]
        leaves = [l for l in leaves if not l.empty]
        if leaves:
            clauses.append(leaves)
    return clauses


def search_pruned(searcher, node, k: int):
    """Block-max pruned top-k.  Returns ``(docids, scores)`` of the top k by
    (score desc, docid asc), or ``None`` when the AST shape is unsupported
    (caller falls back to exhaustive)."""
    clauses = _extract_union_clauses(searcher, node)
    if clauses is None:
        return None
    leaves = [l for cl in clauses for l in cl]
    if not leaves:
        return np.zeros(0, np.uint64), np.zeros(0, np.float32)

    # segment sweep: boundaries at every block first_doc of every leaf
    events = np.unique(np.concatenate([l.first_docs for l in leaves]))
    n_seg = len(events)
    seg_end = np.concatenate((events[1:], [np.iinfo(np.uint64).max])).astype(
        np.uint64
    )
    # per-clause active bound per segment (bounds already conservative f32->f64);
    # clause bound = f32-sum over its leaves, matching score association.
    # leaf_seg keeps each leaf's per-segment bound for the MaxScore
    # essential-set test below.
    ub = np.zeros(n_seg, dtype=np.float64)
    leaf_seg: list[np.ndarray] = []
    for cl in clauses:
        cl_bound = np.zeros(n_seg, dtype=np.float32)
        for l in cl:
            idx = np.searchsorted(l.first_docs, events, side="right") - 1
            active = idx >= 0
            contrib = np.zeros(n_seg, dtype=np.float32)
            contrib[active] = l.bounds[idx[active]].astype(np.float32)
            leaf_seg.append(contrib.astype(np.float64))
            cl_bound = cl_bound + contrib
        ub += cl_bound.astype(np.float64)
    ub *= _bound_pad(len(leaves))

    def sweep(si: int, sj: int) -> list[tuple[float, int]]:
        """Score segment indices [si, sj) with a LOCAL heap.  A local
        theta is always <= what a global sweep would have reached at the
        same point, so pruning stays conservative: every global top-k
        winner survives its local sweep — partition-range fan-out merges
        to bit-identical results (``index.rs:7847-8121``)."""
        heap: list[tuple[float, int]] = []  # (score, -docid) min-heap

        def theta():
            return heap[0][0] if len(heap) >= k else -np.inf

        def push(docids: np.ndarray, scores: np.ndarray):
            # vectorized pre-filter: only candidates that can beat the
            # current worst enter the python heap loop (ties resolved
            # exactly below)
            if len(heap) >= k:
                th = heap[0][0]
                mask = scores >= np.float32(th)
                if not mask.all():
                    docids, scores = docids[mask], scores[mask]
            for d, s in zip(docids.tolist(), scores.tolist()):
                item = (s, -d)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)

        i = si
        while i < sj:
            # skip dead segments (strict <, so exact ties are never pruned)
            if len(heap) >= k and ub[i] < theta():
                i += 1
                continue
            # batch consecutive live segments
            j = i
            while (
                j < sj
                and (j - i) < MAX_BATCH_SEGMENTS
                and (len(heap) < k or ub[j] >= theta())
            ):
                j += 1
            lo, hi = int(events[i]), int(seg_end[j - 1])
            if hi <= lo:
                hi = lo + 1
            # MaxScore essential set (argus strategy enum): a doc appearing
            # ONLY in leaves whose summed batch bounds stay below theta can
            # never reach the heap — skip those leaves for candidate
            # GENERATION (scoring below still uses every leaf, so surviving
            # candidates are scored exactly).  Conservative f64 sums keep it
            # rank-safe.
            non_essential: set[int] = set()
            th = theta()
            if len(heap) >= k and len(leaves) > 1:
                batch_bound = np.array(
                    [ls[i:j].max() for ls in leaf_seg], dtype=np.float64
                )
                order = np.argsort(batch_bound)  # ascending
                csum = np.cumsum(batch_bound[order]) * _bound_pad(len(leaves))
                drop = csum < th  # prefix of weakest leaves, strictly below
                non_essential = set(np.asarray(order)[drop].tolist())
            # ONE decoded fetch per leaf per batch — candidate generation
            # and exact scoring share it (the old shape fetched twice:
            # postings_in here, then scores_for re-fetching per leaf —
            # half of every warm union query's searchsorted traffic)
            fetched = [l.postings_in(lo, hi) for l in leaves]
            # candidates: union of essential-leaf postings within [lo, hi)
            cand_parts = [
                fetched[li][0]
                for li in range(len(leaves))
                if li not in non_essential and len(fetched[li][0])
            ]
            if cand_parts:
                cand = cand_parts[0]
                for c in cand_parts[1:]:
                    cand = np.union1d(cand, c)
                cand = cand[searcher.live_mask(cand)]  # tombstone filter
                searcher._charge(len(cand) * len(leaves))
            if cand_parts and len(cand):
                # exact scoring, same association as the exhaustive kernel:
                # per clause: f32 sum over its field leaves; then
                # clause-order sum.  Norms gather ONCE per field per batch
                # (a pure per-docid lookup, so slicing the shared gather is
                # bit-identical to each leaf gathering its own subset).
                norms_by_ford: dict[int, np.ndarray] = {}
                total = np.zeros(len(cand), dtype=np.float32)
                li = 0
                for cl in clauses:
                    cl_score = np.zeros(len(cand), dtype=np.float32)
                    for l in cl:
                        d, f = fetched[li]
                        li += 1
                        if l.empty or len(d) == 0:
                            continue  # exact zero contribution
                        idx = np.searchsorted(cand, d)
                        present = (idx < len(cand)) & (
                            cand[np.minimum(idx, len(cand) - 1)] == d
                        )
                        if not present.any():
                            continue
                        isel = idx[present]
                        nb = norms_by_ford.get(l.ford)
                        if nb is None:
                            nb = searcher.norms.norms(l.ford, cand)
                            norms_by_ford[l.ford] = nb
                        contrib = np.zeros(len(cand), dtype=np.float32)
                        contrib[isel] = bm25.term_scores(
                            f[present], nb[isel], l.weight, l.tf_cache
                        )
                        cl_score = cl_score + contrib
                    total = total + cl_score
                push(cand, total)
            i = j
        return heap

    # intra-replica segment fan-out, gated like the reference
    # (``index.rs:9971-9986`` sealed_segment_fanout): >= 2 segments AND
    # (>= 10k candidate docs OR >= 8 segments).  The numpy decode/score
    # kernels release the GIL, so contiguous segment ranges overlap on
    # idle cores; each range keeps a local heap and the merge re-ranks by
    # the total-order key (score desc, docid asc) — bit-identical.
    threads = int(getattr(searcher, "segment_threads", 0) or 0)
    total_docs = sum(l.df for l in leaves)
    if (
        threads > 1
        and n_seg >= 2
        and (total_docs >= SEGMENT_FANOUT_THRESHOLD or n_seg >= SEGMENT_COUNT_FANOUT_THRESHOLD)
    ):
        from concurrent.futures import ThreadPoolExecutor

        t = min(threads, n_seg)
        cuts = np.linspace(0, n_seg, t + 1).astype(int)
        ranges = [
            (int(a), int(b)) for a, b in zip(cuts[:-1], cuts[1:]) if b > a
        ]
        with ThreadPoolExecutor(max_workers=len(ranges)) as ex:
            heaps = list(ex.map(lambda r: sweep(r[0], r[1]), ranges))
        items = [it for h in heaps for it in h]
    else:
        items = sweep(0, n_seg)

    if not items:
        return np.zeros(0, np.uint64), np.zeros(0, np.float32)
    ranked = sorted(items, key=lambda it: (-it[0], -it[1]))[:k]
    docids = np.array([-d for _s, d in ranked], dtype=np.uint64)
    scores = np.array([s for s, _d in ranked], dtype=np.float32)
    return docids, scores
