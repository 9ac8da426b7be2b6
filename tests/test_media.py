"""Multimodal plumbing invariants (table-path exactness is pinned by the
driver-style oracle gate; these cover the payload sink the SQL
comparison can't see)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def textstats_mod(ray_session):
    from frankensearch_ray.pipelines import textstats

    return textstats


def test_media_resize_sink_payload_lengths(textstats_mod, tmp_path):
    """The sink's resized payload byte lengths must equal the table
    path's out_bytes arithmetic, doc for doc."""
    table = textstats_mod.media_resize(SF).to_pandas().set_index("doc_id")
    out = tmp_path / "resized"
    assert textstats_mod.media_resize(SF, output_path=str(out)) is None
    sink = pq.read_table(str(out)).to_pandas().set_index("doc_id")
    assert len(sink) == len(table)
    got = sink["payload"].map(len)
    assert (got == table.loc[got.index, "out_bytes"]).all()
    assert (sink["out_bytes"] == table.loc[sink.index, "out_bytes"]).all()


def test_media_resize_identity_and_monotone(textstats_mod):
    """num=den is a byte-identity resize; halving shrinks every doc."""
    ident = textstats_mod.media_resize(SF, num=1, den=1).to_pandas()
    assert (ident["out_bytes"] == ident["in_bytes"]).all()
    half = textstats_mod.media_resize(SF).to_pandas()
    assert (half["out_bytes"] <= ident["out_bytes"]).all()


def _gradient_image(h, w):
    import numpy as np

    r = (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256
    g = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5) % 256
    b = (np.arange(h)[:, None] + np.arange(w)[None, :] * 11) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_bmp_roundtrip_pixel_exact():
    """encode -> decode is the identity, including padded odd widths."""
    import numpy as np

    from frankensearch_ray.pipelines import media_codec as mc

    for h, w in [(1, 1), (7, 5), (4, 4), (3, 9)]:
        img = _gradient_image(h, w)
        assert np.array_equal(mc.decode_bmp(mc.encode_bmp(img)), img)


def test_resize_nearest_matches_floor_map():
    import numpy as np

    from frankensearch_ray.pipelines import media_codec as mc

    img = _gradient_image(10, 6)
    out = mc.resize_nearest(img, 5, 3)
    want = img[(np.arange(5) * 10) // 5][:, (np.arange(3) * 6) // 3]
    assert np.array_equal(out, want)
    # upscale too
    up = mc.resize_nearest(img, 20, 12)
    want_up = img[(np.arange(20) * 10) // 20][:, (np.arange(12) * 6) // 12]
    assert np.array_equal(up, want_up)


def test_media_resizer_real_codec_pixel_exact(textstats_mod):
    """VERDICT r04 #3: a BMP payload takes the REAL decode->resample->
    re-encode path (pixel-exact against the floor-map reference); a
    non-BMP payload in the same batch keeps the declared stub
    arithmetic."""
    import numpy as np
    import pyarrow as pa

    from frankensearch_ray.pipelines import media_codec as mc

    img = _gradient_image(8, 6)
    bmp = mc.encode_bmp(img)
    txt = b"not an image " * 50
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([bmp, txt], pa.binary()),
        }
    )
    r = textstats_mod.MediaResizer(num=1, den=2, emit_payload=True)
    out = r(batch)
    # image row: decoded output pixels == independent nearest-neighbour
    got = mc.decode_bmp(out["payload"][0].as_py())
    want = img[(np.arange(4) * 8) // 4][:, (np.arange(3) * 6) // 3]
    assert np.array_equal(got, want)
    assert out["n_frames"][0].as_py() == 1
    assert out["out_bytes"][0].as_py() == len(out["payload"][0].as_py())
    # text row: stub byte arithmetic unchanged
    n = len(txt)
    full, tail = n // 256, n % 256
    assert out["out_bytes"][1].as_py() == full * 128 + tail // 2
    assert out["payload"][1].as_py() == txt[: full * 128 + tail // 2]


def test_png_roundtrip_pixel_exact():
    """encode_png -> decode_png is the identity for grey/RGB/RGBA at
    assorted shapes (filter-0 rows through a real zlib stream)."""
    import numpy as np

    from frankensearch_ray.pipelines import media_codec as mc

    rng = np.random.default_rng(7)
    for h, w, ch in [(1, 1, 1), (7, 5, 3), (4, 4, 4), (3, 9, 3), (16, 2, 1)]:
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        got = mc.decode_png(mc.encode_png(img))
        assert np.array_equal(got, img)
    # 2-D greyscale input is accepted and comes back as (H, W, 1)
    grey = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    assert np.array_equal(mc.decode_png(mc.encode_png(grey))[:, :, 0], grey)


def _png_filter_forward(img, ftypes):
    """Reference forward filterer (per the PNG spec) to exercise the
    decoder's unfilter paths 1-4 — builds the raw scanline stream."""
    import numpy as np

    h, w, ch = img.shape
    out = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = ftypes[y % len(ftypes)]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) & 0xFF
        elif f == 2:
            filt = (cur - prev) & 0xFF
        elif f == 3:
            filt = (cur - (left + prev) // 2) & 0xFF
        else:  # paeth
            p = left + prev - ul
            pa_, pb, pc_ = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            filt = (cur - pred) & 0xFF
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_png_decode_all_filter_types():
    """A PNG whose rows cycle through filters 0-4 decodes pixel-exactly
    (the encoder only emits filter 0, so build the stream by hand)."""
    import struct
    import zlib

    import numpy as np

    from frankensearch_ray.pipelines import media_codec as mc

    rng = np.random.default_rng(11)
    for ch, color in [(1, 0), (3, 2), (4, 6)]:
        img = rng.integers(0, 256, size=(10, 7, ch), dtype=np.uint8)
        stream = _png_filter_forward(img, ftypes=[0, 1, 2, 3, 4])

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        data = (
            mc.PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 10, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(mc.decode_png(data), img)


def test_png_out_of_profile_rejected():
    """Paletted / 16-bit / interlaced / truncated payloads raise
    ValueError (the resizer's fall-back-to-stub contract)."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from frankensearch_ray.pipelines import media_codec as mc

    good = mc.encode_png(np.zeros((4, 4, 3), np.uint8))
    with _pytest.raises(ValueError):
        mc.decode_png(good[:-20])  # truncated inside the IDAT chunk
    with _pytest.raises(ValueError):
        mc.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)  # no IHDR

    def with_ihdr(depth, color, interlace):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        body = (
            struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return mc.PNG_SIG + body + good[len(mc.PNG_SIG) + 25 :]

    for depth, color, il in [(16, 2, 0), (8, 3, 0), (8, 2, 1)]:
        with _pytest.raises(ValueError):
            mc.decode_png(with_ihdr(depth, color, il))


def test_media_resizer_png_path_pixel_exact(textstats_mod):
    """A PNG payload routes through the real codec: decoded output
    pixels equal the independent floor-map resample; a BMP and a text
    row in the same batch keep their own paths."""
    import numpy as np
    import pyarrow as pa

    from frankensearch_ray.pipelines import media_codec as mc

    img = _gradient_image(8, 6)
    png = mc.encode_png(img)
    bmp = mc.encode_bmp(img)
    txt = b"plain text " * 30
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([png, bmp, txt], pa.binary()),
        }
    )
    out = textstats_mod.MediaResizer(num=1, den=2, emit_payload=True)(batch)
    want = img[(np.arange(4) * 8) // 4][:, (np.arange(3) * 6) // 3]
    assert np.array_equal(mc.decode_png(out["payload"][0].as_py()), want)
    assert np.array_equal(mc.decode_bmp(out["payload"][1].as_py()), want)
    assert out["n_frames"][0].as_py() == 1
    n = len(txt)
    assert out["out_bytes"][2].as_py() == (n // 256) * 128 + (n % 256) // 2


def test_media_decoder_image_probe(textstats_mod):
    """probe_images=True runs the REAL codecs: BMP and PNG payloads emit
    their actual format/dims; text payloads (and out-of-profile magic
    prefixes) probe as non-images; the driver schema (probe off) is
    unchanged."""
    import pyarrow as pa

    from frankensearch_ray.pipelines import media_codec as mc

    img = _gradient_image(9, 4)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "payload": pa.array(
                [
                    mc.encode_bmp(img),
                    mc.encode_png(img[:, :, :1]),
                    b"just text",
                    b"\x89PNG\r\n\x1a\n" + b"\x00" * 40,  # bad PNG body
                ],
                pa.binary(),
            ),
        }
    )
    out = textstats_mod.MediaDecoder(probe_images=True)(batch)
    assert out["format"].to_pylist() == ["bmp", "png", "", ""]
    assert out["img_h"].to_pylist() == [9, 9, 0, 0]
    assert out["img_w"].to_pylist() == [4, 4, 0, 0]
    assert out["img_ch"].to_pylist() == [3, 1, 0, 0]
    # probe off: the driver entry's 3-column schema exactly
    off = textstats_mod.MediaDecoder()(batch)
    assert off.column_names == ["doc_id", "n_bytes", "n_frames"]


def test_media_resizer_bm_prefix_text_falls_back(textstats_mod):
    """A payload that merely STARTS with b'BM' but is not a valid BMP
    must fall back to the stub, not crash."""
    import pyarrow as pa

    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"BMystery text payload"], pa.binary()),
        }
    )
    out = textstats_mod.MediaResizer(num=1, den=2, emit_payload=False)(batch)
    assert out["out_bytes"][0].as_py() == len(b"BMystery text payload") // 2


def test_png_roundtrip_property():
    """Hypothesis-style sweep without the fixture cost: random shapes,
    channel counts and pixel content (including constant and extreme
    values) must round-trip; and decode of hand-filtered streams with
    random per-row filter types must equal the source image."""
    import numpy as np

    from frankensearch_ray.pipelines import media_codec as mc

    rng = np.random.default_rng(23)
    for trial in range(25):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 20))
        ch = int(rng.choice([1, 3, 4]))
        kind = trial % 3
        if kind == 0:
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        elif kind == 1:
            img = np.full((h, w, ch), int(rng.integers(0, 256)), np.uint8)
        else:  # extremes stress the filter arithmetic's mod-256 wrap
            img = rng.choice([0, 1, 254, 255], size=(h, w, ch)).astype(
                np.uint8
            )
        assert np.array_equal(mc.decode_png(mc.encode_png(img)), img)
        # random filter-type stream through the reference forward filter
        import struct
        import zlib

        ftypes = [int(f) for f in rng.integers(0, 5, size=h)]
        stream = _png_filter_forward(img, ftypes=ftypes)

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        color = {1: 0, 3: 2, 4: 6}[ch]
        data = (
            mc.PNG_SIG
            + chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
            )
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(mc.decode_png(data), img)
