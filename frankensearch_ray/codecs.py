"""Posting-list / position codecs: FOR bitpacking + LEB128 varints + blockmax.

Modeled on the reference compression contract
(``crates/frankensearch-quill/src/quiver.rs``: blocks of <=128 postings with
a self-delimiting header, frame-of-reference delta-1 bitpacking, freq_kind
0 = all-one / 1 = bitpacked freq-1, per-block max-freq/min-fieldnorm
metadata) re-expressed numpy-vectorized over u64 docids (the reference is
u32; our docids are ``(partition << 32) | row`` so 64-bit).

Layout (all little-endian):

- posting stream = concatenated blocks; block = ``[kind:u8][count:u8]
  [payload_len:u16]`` + payload.  kind 1 = FOR:
  ``first_doc:u64`` + (count>1: ``doc_width:u8`` + bitpacked count-1 values
  of ``delta-1`` at doc_width bits) + ``freq_kind:u8`` +
  (freq_kind 1: ``freq_width:u8`` + bitpacked count values of ``tf-1``).
- blockmax stream = one fixed 16-byte record per block:
  ``first_doc:u64, byte_offset:u32, max_freq_code:u8, min_fieldnorm_id:u8,
  pad:u16`` — the impact bound itself is computed at query time from live
  avgdl (``quiver.rs:1769-1786``; never baked into the build).
- position stream = one LEB128 varint sequence per posting run:
  ``count, pos_0, pos_1-pos_0, ...`` (first absolute, then deltas).

Concatenating the encoded streams of docid-disjoint, ordered runs is
byte-equivalent to encoding the concatenated input only at block
granularity; we instead concat at the *list* level (each salted bucket is
its own block sequence), which preserves decode output equality — the Q1
merge discipline (``PLAN.md:272-291``).
"""

from __future__ import annotations

import numpy as np

POSTINGS_PER_BLOCK = 128
BLOCK_KIND_FOR = 1
BLOCK_KIND_BITMAP = 2  # 512-bit dense bitmap when block span <= 512
BLOCK_KIND_VINT = 3  # partial tail block: LEB128 (delta, tf) stream
BITMAP_SPAN = 512

_BLOCKMAX_DTYPE = np.dtype(
    [
        ("first_doc", "<u8"),
        ("offset", "<u4"),
        ("max_freq_code", "u1"),
        ("min_fieldnorm_id", "u1"),
        ("pad", "<u2"),
    ]
)
assert _BLOCKMAX_DTYPE.itemsize == 16


# --- bitpacking ------------------------------------------------------------


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints into ``width``-bit little-endian-bit-order codes."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def bitunpack(buf: memoryview | bytes, count: int, width: int) -> np.ndarray:
    """Inverse of :func:`bitpack`; returns uint64 values."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=(count * width + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little")[: count * width]
    bits = bits.reshape(count, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return bits @ weights


def _width_for(max_value: int) -> int:
    return int(max_value).bit_length()


# --- vectorized LEB128 -----------------------------------------------------


def varint_encode_ex(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 encode -> ``(bytes_u8_array, nbytes_per_value)``.

    Exposing per-value byte counts lets batch encoders (one varint pass
    over MANY terms' concatenated streams) recover each term's byte span
    without re-encoding — LEB128 is per-value self-delimiting, so the
    concatenation of per-term encodings equals the encoding of the
    concatenated stream."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    # byte counts: one 7-bit group per threshold of 128**k
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        mask = v >= (np.uint64(1) << np.uint64(7 * k))
        if not mask.any():
            break
        nbytes[mask] += 1
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    return varint_encode_ex(values)[0].tobytes()


def varint_decode(buf: memoryview | bytes, max_count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    if max_count is not None:
        ends = ends[:max_count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        out[mask] |= (raw[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * k
        )
    return out


# --- posting blocks --------------------------------------------------------


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, fieldnorm_ids: np.ndarray
) -> tuple[bytes, bytes]:
    """Encode one docid-sorted posting list.

    Returns ``(postings_bytes, blockmax_bytes)``.  ``fieldnorm_ids`` are the
    per-posting doc fieldnorm ids of the indexed field (blockmax metadata).
    """
    n = len(docids)
    assert n > 0
    docids = docids.astype(np.uint64, copy=False)
    tfs = tfs.astype(np.uint32, copy=False)
    fieldnorm_ids = fieldnorm_ids.astype(np.uint8, copy=False)

    chunks: list[bytes] = []
    bm = np.empty((n + POSTINGS_PER_BLOCK - 1) // POSTINGS_PER_BLOCK, dtype=_BLOCKMAX_DTYPE)
    offset = 0
    for bi, start in enumerate(range(0, n, POSTINGS_PER_BLOCK)):
        d = docids[start : start + POSTINGS_PER_BLOCK]
        f = tfs[start : start + POSTINGS_PER_BLOCK]
        fn = fieldnorm_ids[start : start + POSTINGS_PER_BLOCK]
        count = len(d)

        span = int(d[-1] - d[0]) + 1
        if count < POSTINGS_PER_BLOCK:
            # partial tail block: canonical LEB128 (delta, tf) pairs
            kind = BLOCK_KIND_VINT
            stream = np.empty(2 * count, dtype=np.uint64)
            stream[0] = d[0]
            stream[2::2] = np.diff(d) - np.uint64(1)
            stream[1::2] = f
            payload = varint_encode(stream)
        elif span <= BITMAP_SPAN:
            # dense block: 512-bit docid bitmap (LSB-first) + freq section
            kind = BLOCK_KIND_BITMAP
            bits = np.zeros(BITMAP_SPAN, dtype=np.uint8)
            bits[(d - d[0]).astype(np.int64)] = 1
            parts = [
                int(d[0]).to_bytes(8, "little"),
                np.packbits(bits, bitorder="little").tobytes(),
            ]
            parts.append(_freq_section(f))
            payload = b"".join(parts)
        else:
            kind = BLOCK_KIND_FOR
            parts = [int(d[0]).to_bytes(8, "little")]
            if count > 1:
                deltas = np.diff(d) - np.uint64(1)
                w = _width_for(int(deltas.max())) if len(deltas) else 0
                parts.append(bytes([w]))
                parts.append(bitpack(deltas, w))
            parts.append(_freq_section(f))
            payload = b"".join(parts)
        header = bytes([kind, count]) + len(payload).to_bytes(2, "little")
        chunks.append(header + payload)

        bm[bi]["first_doc"] = d[0]
        bm[bi]["offset"] = offset
        bm[bi]["max_freq_code"] = min(int(f.max()), 255)
        bm[bi]["min_fieldnorm_id"] = int(fn.min())
        bm[bi]["pad"] = 0
        offset += len(header) + len(payload)

    return b"".join(chunks), bm.tobytes()


def _freq_section(f: np.ndarray) -> bytes:
    if (f == 1).all():
        return b"\x00"  # freq_kind 0: all-one
    fm1 = (f - 1).astype(np.uint64)
    wf = _width_for(int(fm1.max()))
    return bytes([1, wf]) + bitpack(fm1, wf)


def _decode_freqs(payload: memoryview, p: int, count: int) -> np.ndarray:
    freq_kind = payload[p]
    p += 1
    if freq_kind == 0:
        return np.ones(count, dtype=np.uint32)
    wf = payload[p]
    p += 1
    nb = (count * wf + 7) // 8
    return (bitunpack(payload[p : p + nb], count, wf) + 1).astype(np.uint32)


def decode_postings(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray]:
    """Decode a posting stream -> ``(docids: u64, tfs: u32)``."""
    view = memoryview(buf)
    docs: list[np.ndarray] = []
    tfs: list[np.ndarray] = []
    pos = 0
    end = len(view)
    while pos < end:
        kind = view[pos]
        count = view[pos + 1]
        payload_len = int.from_bytes(view[pos + 2 : pos + 4], "little")
        payload = view[pos + 4 : pos + 4 + payload_len]
        if kind == BLOCK_KIND_VINT:
            stream = varint_decode(payload, max_count=2 * count)
            d = stream[0::2].copy()
            d[1:] += np.uint64(1)
            np.cumsum(d, out=d)
            f = stream[1::2].astype(np.uint32)
        elif kind == BLOCK_KIND_BITMAP:
            first_doc = int.from_bytes(payload[0:8], "little")
            raw = np.frombuffer(payload[8 : 8 + BITMAP_SPAN // 8], dtype=np.uint8)
            offs = np.flatnonzero(np.unpackbits(raw, bitorder="little"))
            d = np.uint64(first_doc) + offs.astype(np.uint64)
            f = _decode_freqs(payload, 8 + BITMAP_SPAN // 8, count)
        else:
            assert kind == BLOCK_KIND_FOR, kind
            first_doc = int.from_bytes(payload[0:8], "little")
            p = 8
            d = np.empty(count, dtype=np.uint64)
            d[0] = first_doc
            if count > 1:
                w = payload[p]
                p += 1
                nb = ((count - 1) * w + 7) // 8
                deltas = bitunpack(payload[p : p + nb], count - 1, w)
                p += nb
                d[1:] = deltas + np.uint64(1)
                np.cumsum(d, out=d)
            f = _decode_freqs(payload, p, count)
        docs.append(d)
        tfs.append(f)
        pos += 4 + payload_len
    if not docs:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    return np.concatenate(docs), np.concatenate(tfs)


def decode_blockmax(buf: bytes | memoryview) -> np.ndarray:
    """Blockmax records as a structured array (zero-copy view)."""
    return np.frombuffer(buf, dtype=_BLOCKMAX_DTYPE)


def decode_postings_from(
    postings: bytes | memoryview, byte_offset: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode starting at a blockmax-recorded block offset (skip support)."""
    return decode_postings(memoryview(postings)[byte_offset:])


# --- position streams ------------------------------------------------------


def encode_positions(position_lists: list[np.ndarray] | "object") -> bytes:
    """Encode per-posting position lists into one varint stream.

    Accepts a python list of uint32 arrays/lists, in posting order.  Stream
    per posting: ``count, pos0, delta...``.
    """
    arrs = [np.asarray(p, dtype=np.uint64) for p in position_lists]
    if not arrs:
        return b""
    values = np.concatenate(arrs) if arrs else np.zeros(0, np.uint64)
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([len(a) for a in arrs], out=offsets[1:])
    return encode_positions_flat(values, offsets)


def positions_stream(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """The uint64 ``count, pos0, delta...`` stream for a flattened list slice.

    Every posting's first value is written ABSOLUTE (deltas never cross a
    posting boundary), so the stream of a row range equals the
    concatenation of its sub-ranges' streams — the property the per-shard
    batch encoder relies on to split one global stream at term boundaries.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    counts = np.diff(offsets).astype(np.uint64)
    n_lists = len(counts)
    if n_lists == 0:
        return np.zeros(0, dtype=np.uint64)
    values = np.asarray(values, dtype=np.uint64)
    n_vals = len(values)
    out = np.empty(n_lists + n_vals, dtype=np.uint64)
    rel = (offsets[:-1] - offsets[0]).astype(np.int64)
    count_pos = rel + np.arange(n_lists, dtype=np.int64)
    out[count_pos] = counts
    if n_vals:
        dv = np.empty(n_vals, dtype=np.uint64)
        dv[0] = values[0]
        np.subtract(values[1:], values[:-1], out=dv[1:])
        starts = rel[counts > 0]
        dv[starts] = values[starts]  # absolute first position per posting
        mask = np.ones(len(out), dtype=bool)
        mask[count_pos] = False
        out[mask] = dv
    return out


def encode_positions_flat(values: np.ndarray, offsets: np.ndarray) -> bytes:
    """Vectorized ``encode_positions`` over one flattened list column slice.

    ``values`` is the concatenation of the per-posting position lists
    (uint64-castable), ``offsets`` the n+1 list boundaries (absolute values
    allowed — only differences are used).  Same byte output as
    ``encode_positions``.
    """
    if len(offsets) <= 1:
        return b""
    return varint_encode(positions_stream(values, offsets))


def encode_positions_batch(
    values: np.ndarray, offsets: np.ndarray, group_bounds: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Encode MANY terms' position streams in one varint pass.

    ``offsets`` are the n+1 per-posting list boundaries covering the whole
    row range; ``group_bounds`` (g+1, int64) are posting-index boundaries of
    each term.  Returns ``(data_u8, byte_offsets)`` where term ``i``'s
    payload is ``data[byte_offsets[i]:byte_offsets[i+1]]`` — byte-identical
    to per-term :func:`encode_positions_flat` calls."""
    offsets = np.asarray(offsets, dtype=np.int64)
    group_bounds = np.asarray(group_bounds, dtype=np.int64)
    g = len(group_bounds) - 1
    if g <= 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    stream = positions_stream(values, offsets)
    data, nb = varint_encode_ex(stream)
    # term i's stream span: one count slot per posting + its values
    post_counts = np.diff(group_bounds)
    val_counts = offsets[group_bounds[1:]] - offsets[group_bounds[:-1]]
    sv = post_counts + val_counts
    stream_starts = np.concatenate(([0], np.cumsum(sv)[:-1]))
    byte_lens = np.add.reduceat(nb, stream_starts) if len(nb) else np.zeros(g, np.int64)
    byte_offsets = np.concatenate(([0], np.cumsum(byte_lens)))
    return data, byte_offsets


def encode_postings_short_batch(
    docids: np.ndarray,
    tfs: np.ndarray,
    fieldnorm_ids: np.ndarray,
    group_bounds: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-encode terms whose WHOLE posting list is one partial VINT block
    (df < ``POSTINGS_PER_BLOCK``) — the Zipf tail, i.e. almost every term.

    Inputs are row-aligned arrays already restricted to the selected terms'
    rows (docid-sorted within each term), with ``group_bounds`` (g+1) the
    row boundaries per term.  Returns ``(data_u8, byte_offsets, blockmax)``
    where term ``i``'s full block stream (header included) is
    ``data[byte_offsets[i]:byte_offsets[i+1]]`` and ``blockmax[i]`` is its
    single 16-byte record — byte-identical to :func:`encode_postings`."""
    group_bounds = np.asarray(group_bounds, dtype=np.int64)
    g = len(group_bounds) - 1
    if g <= 0:
        return (
            np.zeros(0, dtype=np.uint8),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=_BLOCKMAX_DTYPE),
        )
    d = docids.astype(np.uint64, copy=False)
    f = tfs.astype(np.uint64, copy=False)
    fn = fieldnorm_ids
    firsts = group_bounds[:-1]
    counts = np.diff(group_bounds)
    assert counts.max() < POSTINGS_PER_BLOCK
    dv = np.empty(len(d), dtype=np.uint64)
    if len(d):
        dv[0] = d[0]
        np.subtract(d[1:], d[:-1], out=dv[1:])
        dv[1:] -= np.uint64(1)
        dv[firsts] = d[firsts]  # absolute first docid per term
    stream = np.empty(2 * len(d), dtype=np.uint64)
    stream[0::2] = dv
    stream[1::2] = f
    payload, nb = varint_encode_ex(stream)
    plen = np.add.reduceat(nb, 2 * firsts) if len(nb) else np.zeros(g, np.int64)
    pay_off = np.concatenate(([0], np.cumsum(plen)))
    # assemble [kind, count, len_lo, len_hi] headers + payload slices in one
    # output buffer (4 header bytes per term)
    out_off = pay_off + 4 * np.arange(g + 1, dtype=np.int64)
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    h = out_off[:-1]
    out[h] = BLOCK_KIND_VINT
    out[h + 1] = counts.astype(np.uint8)
    out[h + 2] = (plen & 0xFF).astype(np.uint8)
    out[h + 3] = (plen >> 8).astype(np.uint8)
    if len(payload):
        term_of_byte = np.repeat(np.arange(g, dtype=np.int64), plen)
        out[np.arange(len(payload), dtype=np.int64) + 4 * (term_of_byte + 1)] = payload
    bm = np.empty(g, dtype=_BLOCKMAX_DTYPE)
    bm["first_doc"] = d[firsts] if len(d) else 0
    bm["offset"] = 0
    bm["max_freq_code"] = np.minimum(
        np.maximum.reduceat(f, firsts) if len(f) else np.zeros(g, np.uint64), 255
    ).astype(np.uint8)
    bm["min_fieldnorm_id"] = (
        np.minimum.reduceat(fn, firsts) if len(fn) else np.zeros(g, np.uint8)
    )
    bm["pad"] = 0
    return out, out_off, bm


def position_bounds(flat: np.ndarray, n_postings: int) -> np.ndarray:
    """Start index of each posting's [count, deltas...] segment in ``flat``."""
    bounds = np.empty(n_postings + 1, dtype=np.int64)
    i = 0
    fl = flat.tolist()  # python ints: ~10x faster sequential walk
    for k in range(n_postings):
        bounds[k] = i
        i += 1 + int(fl[i])
    bounds[n_postings] = i
    return bounds


def decode_positions(buf: bytes | memoryview, n_postings: int) -> list[np.ndarray]:
    """Decode the position stream back into per-posting uint32 arrays.

    One global prefix-sum over the delta stream (count slots zeroed, each
    segment's base subtracted) replaces a per-posting cumsum."""
    flat = varint_decode(buf)
    if n_postings == 0:
        return []
    bounds = position_bounds(flat, n_postings)
    work = flat.astype(np.int64, copy=True)
    work[bounds[:-1]] = 0  # count slots contribute nothing
    csum = np.cumsum(work)
    seg_base = csum[bounds[:-1]]  # cumsum value at each count slot
    out: list[np.ndarray] = []
    for k in range(n_postings):
        s, e = int(bounds[k]) + 1, int(bounds[k + 1])
        out.append((csum[s:e] - seg_base[k]).astype(np.uint32))
    return out


def decode_positions_subset(
    buf: bytes | memoryview, n_postings: int, wanted: np.ndarray
) -> list[np.ndarray]:
    """Decode only the position lists at posting indices ``wanted``.

    The varint stream is decoded once (vectorized); per-posting cumsum is
    materialized only for the requested indices — the phrase evaluator's
    candidate set, typically orders of magnitude smaller than df."""
    flat = varint_decode(buf)
    bounds = position_bounds(flat, n_postings)
    out: list[np.ndarray] = []
    for k in wanted:
        s, e = int(bounds[k]) + 1, int(bounds[k + 1])
        out.append(np.cumsum(flat[s:e]).astype(np.uint32))
    return out
