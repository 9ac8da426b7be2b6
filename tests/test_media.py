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
