"""Embedding-inference operator gates: exact stub-model contract,
one-model-load-per-actor lifecycle, and the packed-layout sink."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_stub_model_exact_contract():
    """encode() == the scalar hashing-trick definition, row by row."""
    import hashlib

    from frankensearch_ray.pipelines.embed import StubEmbedModel

    texts = ["the quick  brown fox", "", "   ", "fox fox fox", None]
    m = StubEmbedModel(dim=8)
    got = m.encode(pa.array(texts, pa.string()))

    def scalar(text):
        v = np.zeros(8, np.int64)
        for tok in (text or "").split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            v[h % 8] += 1 if (h >> 32) & 1 else -1
        return v

    for i, t in enumerate(texts):
        assert np.array_equal(got[i], scalar(t)), (i, t)


def test_embed_matches_duckdb_oracle(ray_session):
    import duckdb

    import __ray_entry__ as em

    t = em.queries()["embed_texts"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.execute(em.oracle_sql()["embed_texts"]).fetch_arrow_table()
    assert (
        t.sort_by([("doc_id", "ascending"), ("dim", "ascending")]).to_pylist()
        == want.to_pylist()
    )


def test_model_loads_once_per_actor_not_per_batch(ray_session, tmp_path):
    """The GPU-pattern gate: with concurrency=2 and many small batches,
    the model constructor runs at most twice (once per actor), never per
    batch."""
    from frankensearch_ray.pipelines.embed import embed_texts

    marker_dir = str(tmp_path / "inits")
    t = embed_texts(
        SF, batch_size=32, concurrency=2, init_marker_dir=marker_dir
    )
    n_docs = t.num_rows // 16
    n_batches = -(-n_docs // 32)
    assert n_batches > 2  # the test is vacuous otherwise
    inits = glob.glob(os.path.join(marker_dir, "*.init"))
    assert 1 <= len(inits) <= 2, f"{len(inits)} model loads for {n_batches} batches"


def test_sink_packs_rows_and_matches_table(ray_session, tmp_path):
    """output_path streams one packed list<int64> row per doc whose
    values equal the long-form table."""
    from frankensearch_ray.pipelines.embed import embed_texts

    table = embed_texts(SF).to_pandas()
    out = str(tmp_path / "emb")
    assert embed_texts(SF, output_path=out) is None
    packed = pq.read_table(out).to_pandas().set_index("doc_id")["embedding"]
    for doc_id, g in table.groupby("doc_id"):
        want = g.sort_values("dim")["value"].to_numpy()
        assert np.array_equal(np.asarray(packed.loc[doc_id]), want)
