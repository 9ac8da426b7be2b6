"""Hypothesis property gates: codec roundtrips + analyzer parity."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from frankensearch_ray.codecs import (
    decode_positions,
    decode_postings,
    encode_positions,
    encode_postings,
    varint_decode,
    varint_encode,
)
from frankensearch_ray.contract.analyzer import (
    analyze_admitted_scalar,
    analyze_cass_scalar,
    analyze_default_scalar,
)

SETTINGS = settings(max_examples=60, deadline=None)


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True
    ),
    st.data(),
)
def test_postings_roundtrip(docid_list, data):
    d = np.array(sorted(docid_list), dtype=np.uint64)
    tf = np.array(
        data.draw(
            st.lists(
                st.integers(1, 1000), min_size=len(d), max_size=len(d)
            )
        ),
        dtype=np.uint32,
    )
    fn = np.zeros(len(d), dtype=np.uint8)
    p, bm = encode_postings(d, tf, fn)
    d2, tf2 = decode_postings(p)
    assert np.array_equal(d, d2)
    assert np.array_equal(tf, tf2)


@SETTINGS
@given(
    st.lists(
        st.lists(st.integers(0, 100_000), min_size=0, max_size=40).map(sorted),
        min_size=1,
        max_size=60,
    )
)
def test_positions_roundtrip(plists):
    arrs = [np.array(p, dtype=np.uint32) for p in plists]
    buf = encode_positions(arrs)
    out = decode_positions(buf, len(arrs))
    assert len(out) == len(arrs)
    for a, b in zip(arrs, out):
        assert np.array_equal(a, b)


@SETTINGS
@given(st.lists(st.integers(0, 2**63 - 1), max_size=300))
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@SETTINGS
@given(st.text(max_size=300))
def test_analyzer_offsets_are_consistent(text):
    """Offsets are valid byte ranges; decoding the span and re-analyzing
    yields the same single token (admission aside)."""
    raw = text.encode("utf-8")
    prev_end = 0
    for token, pos, b_from, b_to in analyze_default_scalar(text):
        assert 0 <= b_from < b_to <= len(raw)
        assert b_from >= prev_end
        prev_end = b_to
        span = raw[b_from:b_to].decode("utf-8")
        retok = analyze_default_scalar(span)
        assert len(retok) == 1 and retok[0][0] == token


@SETTINGS
@given(st.text(max_size=300))
def test_analyzer_never_raises(text):
    analyze_admitted_scalar(text)
    analyze_cass_scalar(text)
    analyze_cass_scalar(text, hyphen_decompose=False)


@SETTINGS
@given(st.text(max_size=200))
def test_cass_parser_never_raises(text):
    from frankensearch_ray.contract.cass import parse_cass

    parsed = parse_cass(text)
    assert parsed.query is not None


@SETTINGS
@given(st.text(max_size=200))
def test_default_parser_never_raises(text):
    from frankensearch_ray.contract.parser import parse_default

    parsed = parse_default(text)
    assert parsed.query is not None


@given(st.lists(st.text(max_size=120), min_size=1, max_size=8))
def test_tokenize_column_matches_scalar(texts):
    """The vectorized column analyzer (RE2 runs + utf8proc lower, with the
    U+0130/astral scalar gate) is token/position-identical to the scalar
    reference on ARBITRARY unicode rows."""
    import pyarrow as pa

    from frankensearch_ray.contract.analyzer import (
        MAX_TERM_BYTES,
        analyze_default_scalar,
        tokenize_column,
    )

    tokens, doc_idx, positions = tokenize_column(pa.array(texts, pa.string()))
    got: dict[int, list] = {}
    for t, d, p in zip(tokens.to_pylist(), doc_idx.tolist(), positions.tolist()):
        got.setdefault(d, []).append((t, p))
    for i, text in enumerate(texts):
        want = [
            (t, p)
            for t, p, _f, _t in analyze_default_scalar(text)
            if len(t.encode()) <= MAX_TERM_BYTES
        ]
        have = sorted(got.get(i, []), key=lambda x: x[1])
        assert want == have, (i, text, want[:5], have[:5])


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_tok = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@given(q=_tok, t=_tok)
@settings(max_examples=300, deadline=None)
def test_edit1_neighborhood_is_exactly_levenshtein_le_1(q, t):
    """term_suggest's generate-and-probe plan: a token is in the edit-1
    neighbourhood of q iff its true Levenshtein distance to q is <= 1."""
    from frankensearch_ray.pipelines.docsearch import _edit1_neighborhood

    assert (t in set(_edit1_neighborhood(q))) == (_levenshtein(q, t) <= 1)


def test_block_size_invariance_representatives(ray_session):
    """Two shuffle-sensitive pipelines must be value-identical when Ray
    splits the corpus into many tiny blocks (256 KiB target) — the
    regression guard for the round-5 block-size invariance sweep."""
    import ray

    from frankensearch_ray.pipelines import corpus, dedup

    sf = "/root/testdata/sf0.001"
    base_m = dedup.minhash_pairs(sf).to_pandas()
    base_p = corpus.pack_sequences(sf).to_pandas()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256 * 1024
        tiny_m = dedup.minhash_pairs(sf).to_pandas()
        tiny_p = corpus.pack_sequences(sf).to_pandas()
    finally:
        ctx.target_max_block_size = old
    import pandas as pd

    pd.testing.assert_frame_equal(base_m, tiny_m)
    pd.testing.assert_frame_equal(base_p, tiny_p)
