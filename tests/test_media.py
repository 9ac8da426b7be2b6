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
