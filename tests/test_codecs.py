"""Codec roundtrip + property tests (FOR blocks, varints, blockmax, Q1 concat)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_ray import codecs


def _random_posting_list(rng, n, base=0):
    gaps = rng.integers(1, 1000, size=n).astype(np.uint64)
    docids = base + np.cumsum(gaps)
    tfs = rng.integers(1, 300, size=n).astype(np.uint32)
    norms = rng.integers(0, 256, size=n).astype(np.uint8)
    return docids, tfs, norms


class TestBitpack:
    @given(
        st.lists(st.integers(min_value=0, max_value=2**33 - 1), min_size=0, max_size=300),
    )
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, values):
        arr = np.array(values, dtype=np.uint64)
        width = int(arr.max()).bit_length() if len(arr) else 0
        packed = codecs.bitpack(arr, width)
        out = codecs.bitunpack(packed, len(arr), width)
        assert (out == arr).all()


class TestVarint:
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=200
        )
    )
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, values):
        arr = np.array(values, dtype=np.uint64)
        buf = codecs.varint_encode(arr)
        out = codecs.varint_decode(buf)
        assert (out == arr).all()

    def test_known_encodings(self):
        assert codecs.varint_encode(np.array([0], np.uint64)) == b"\x00"
        assert codecs.varint_encode(np.array([127], np.uint64)) == b"\x7f"
        assert codecs.varint_encode(np.array([128], np.uint64)) == b"\x80\x01"
        assert codecs.varint_encode(np.array([300], np.uint64)) == b"\xac\x02"


class TestPostings:
    @pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 5000])
    def test_roundtrip_sizes(self, n):
        rng = np.random.default_rng(n)
        docids, tfs, norms = _random_posting_list(rng, n)
        post, bm = codecs.encode_postings(docids, tfs, norms)
        d2, f2 = codecs.decode_postings(post)
        assert (d2 == docids).all()
        assert (f2 == tfs).all()
        recs = codecs.decode_blockmax(bm)
        assert len(recs) == (n + 127) // 128
        assert recs["first_doc"][0] == docids[0]

    def test_all_one_freqs_compact(self):
        docids = np.arange(1000, dtype=np.uint64) * 7
        tfs = np.ones(1000, dtype=np.uint32)
        norms = np.full(1000, 9, dtype=np.uint8)
        post, _ = codecs.encode_postings(docids, tfs, norms)
        # dense deltas (delta-1 == 6 -> 3 bits) + all-one freq byte
        assert len(post) < 1000  # < 1 byte per posting

    def test_blockmax_metadata(self):
        docids = np.arange(300, dtype=np.uint64)
        tfs = np.concatenate(
            [np.full(128, 5), np.full(128, 999), np.full(44, 2)]
        ).astype(np.uint32)
        norms = np.concatenate(
            [np.full(128, 10), np.full(128, 3), np.full(44, 200)]
        ).astype(np.uint8)
        _, bm = codecs.encode_postings(docids, tfs, norms)
        recs = codecs.decode_blockmax(bm)
        assert list(recs["max_freq_code"]) == [5, 255, 2]  # 999 saturates
        assert list(recs["min_fieldnorm_id"]) == [10, 3, 200]

    def test_block_offset_skip(self):
        rng = np.random.default_rng(0)
        docids, tfs, norms = _random_posting_list(rng, 1000)
        post, bm = codecs.encode_postings(docids, tfs, norms)
        recs = codecs.decode_blockmax(bm)
        # decoding from block 3's offset yields the tail postings
        off = int(recs["offset"][3])
        d2, f2 = codecs.decode_postings_from(post, off)
        assert (d2 == docids[3 * 128 :]).all()
        assert (f2 == tfs[3 * 128 :]).all()

    def test_q1_bucket_concat_equals_whole(self):
        """Concat of docid-disjoint ordered bucket lists decodes identically
        to one list over the union (the Q1 merge discipline)."""
        rng = np.random.default_rng(3)
        docids, tfs, norms = _random_posting_list(rng, 700)
        split = 350
        p1, _ = codecs.encode_postings(docids[:split], tfs[:split], norms[:split])
        p2, _ = codecs.encode_postings(docids[split:], tfs[split:], norms[split:])
        d_cat, f_cat = codecs.decode_postings(p1 + p2)
        assert (d_cat == docids).all()
        assert (f_cat == tfs).all()

    def test_huge_docids(self):
        # (partition << 32) | row layout must survive
        docids = (np.array([5, 5, 900_000], np.uint64) << np.uint64(32)) | np.array(
            [1, 2, 7], np.uint64
        )
        tfs = np.array([1, 2, 3], np.uint32)
        norms = np.array([0, 1, 2], np.uint8)
        post, _ = codecs.encode_postings(docids, tfs, norms)
        d2, f2 = codecs.decode_postings(post)
        assert (d2 == docids).all() and (f2 == tfs).all()


class TestPositions:
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=100_000), min_size=0, max_size=30
            ),
            min_size=0,
            max_size=40,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, lists):
        lists = [sorted(x) for x in lists]
        buf = codecs.encode_positions([np.array(x, np.uint32) for x in lists])
        out = codecs.decode_positions(buf, len(lists))
        assert [list(o) for o in out] == [list(x) for x in lists]


class TestBlockKinds:
    def test_roundtrip_all_kinds(self):
        """Bitmap (dense span<=512) / FOR (full sparse) / Vint (tail)
        blocks all roundtrip, with valid blockmax offsets."""
        import numpy as np

        from frankensearch_ray.codecs import (
            decode_blockmax,
            decode_postings,
            decode_postings_from,
            encode_postings,
        )

        rng = np.random.default_rng(1)
        for trial in range(120):
            n = int(rng.integers(1, 400))
            mode = trial % 3
            if mode == 0:
                d = np.sort(
                    rng.choice(500, size=min(n, 400), replace=False)
                ).astype(np.uint64)
            elif mode == 1:
                d = np.sort(rng.choice(10**7, size=n, replace=False)).astype(
                    np.uint64
                )
            else:
                d = np.sort(rng.choice(2**40, size=n, replace=False)).astype(
                    np.uint64
                )
            tf = rng.integers(1, 200, size=len(d)).astype(np.uint32)
            if trial % 5 == 0:
                tf[:] = 1
            fn = rng.integers(0, 255, size=len(d)).astype(np.uint8)
            p, bm = encode_postings(d, tf, fn)
            d2, tf2 = decode_postings(p)
            assert np.array_equal(d, d2) and np.array_equal(tf, tf2), trial
            for r in decode_blockmax(bm):
                off = int(r["offset"])
                plen = int.from_bytes(p[off + 2 : off + 4], "little")
                dd, _ = decode_postings_from(p[: off + 4 + plen], off)
                assert dd[0] == r["first_doc"]

    def test_kind_selection(self):
        import numpy as np

        from frankensearch_ray.codecs import (
            BLOCK_KIND_BITMAP,
            BLOCK_KIND_FOR,
            BLOCK_KIND_VINT,
            encode_postings,
        )

        ones = lambda n: np.ones(n, np.uint32)
        norms = lambda n: np.zeros(n, np.uint8)
        # 128 dense docids -> bitmap
        d = np.arange(128, dtype=np.uint64) * 2
        p, _ = encode_postings(d, ones(128), norms(128))
        assert p[0] == BLOCK_KIND_BITMAP
        # 128 sparse docids -> FOR
        d = np.arange(128, dtype=np.uint64) * 1000
        p, _ = encode_postings(d, ones(128), norms(128))
        assert p[0] == BLOCK_KIND_FOR
        # tail (<128) -> vint
        d = np.arange(5, dtype=np.uint64)
        p, _ = encode_postings(d, ones(5), norms(5))
        assert p[0] == BLOCK_KIND_VINT


class TestBatchEncodeIdentity:
    """The per-shard batch encoders (one varint pass over many terms) must
    be byte-identical to the per-term reference path."""

    def _shard_input(self, seed: int):
        import numpy as np
        import pyarrow as pa

        rng = np.random.default_rng(seed)
        rows = []
        for _ in range(250):
            term = f"t{rng.integers(0, 70):03d}"
            field = int(rng.integers(0, 2))
            bucket = int(rng.integers(0, 3))
            df = int(rng.choice([1, 2, 3, 5, 10, 100, 127, 128, 129, 300, 600]))
            base = int(rng.integers(0, 1 << 40))
            ds = np.sort(
                rng.choice(
                    np.arange(base, base + df * 50, dtype=np.uint64),
                    size=df,
                    replace=False,
                )
            )
            for d in ds:
                npos = int(rng.integers(0, 4))
                rows.append(
                    (
                        field,
                        term,
                        bucket,
                        int(d),
                        int(rng.integers(1, 9)),
                        int(rng.integers(0, 256)),
                        sorted(rng.integers(0, 1000, size=npos).tolist()),
                    )
                )
        cols = list(zip(*rows))
        return pa.table(
            {
                "field": pa.array(cols[0], pa.uint8()),
                "term": pa.array(cols[1]),
                "bucket": pa.array(cols[2], pa.uint32()),
                "docid": pa.array(cols[3], pa.uint64()),
                "tf": pa.array(cols[4], pa.uint32()),
                "norm": pa.array(cols[5], pa.uint8()),
                "positions": pa.array(cols[6], pa.list_(pa.uint32())),
            }
        )

    def test_batch_equals_per_term(self):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from frankensearch_ray.codecs import (
            encode_positions_flat,
            encode_postings,
        )
        from frankensearch_ray.stages.encode import encode_shard_table

        t = self._shard_input(11)
        out = encode_shard_table(t)

        pre = pc.dictionary_encode(t["term"].combine_chunks())
        rank = np.empty(len(pre.dictionary), dtype=np.int64)
        rank[pc.array_sort_indices(pre.dictionary).to_numpy()] = np.arange(
            len(pre.dictionary)
        )
        order = np.lexsort(
            (
                t["docid"].to_numpy(),
                t["bucket"].to_numpy(),
                rank[pre.indices.to_numpy()],
                t["field"].to_numpy(),
            )
        )
        ts = t.take(pa.array(order))
        field = ts["field"].to_numpy()
        bucket = ts["bucket"].to_numpy()
        docid = ts["docid"].to_numpy()
        tf = ts["tf"].to_numpy()
        norm = ts["norm"].to_numpy()
        codes = pc.dictionary_encode(ts["term"].combine_chunks()).indices.to_numpy()
        posc = ts["positions"].combine_chunks()
        pv = posc.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        po = posc.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ts)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = (
            (field[1:] != field[:-1])
            | (codes[1:] != codes[:-1])
            | (bucket[1:] != bucket[:-1])
        )
        starts = np.flatnonzero(change)
        ends = np.concatenate((starts[1:], [n]))
        assert len(out) == len(starts)
        n_short = n_long = 0
        for i, (s, e) in enumerate(zip(starts, ends)):
            p, b = encode_postings(docid[s:e], tf[s:e], norm[s:e])
            pos = encode_positions_flat(pv[po[s] : po[e]], po[s : e + 1])
            assert out["postings"][i].as_py() == p
            assert out["blockmax"][i].as_py() == b
            assert out["positions"][i].as_py() == pos
            if e - s < 128:
                n_short += 1
            else:
                n_long += 1
        assert n_short > 0 and n_long > 0  # both paths exercised
