"""Similarity-search quality gates over the embeddings table."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


class TestIvfRecall:
    def test_ivf_recall_vs_bruteforce(self, ray_session, sf_dir):
        """IVF with default nprobe must reach recall@10 >= 0.9 against the
        exact brute-force top-k on the same queries."""
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_ivf

        exact = knn_bruteforce(sf_dir)
        approx = knn_ivf(sf_dir)

        def neighbor_sets(t):
            out = {}
            for r in t.to_pylist():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        e, a = neighbor_sets(exact), neighbor_sets(approx)
        assert set(e) == set(a)
        recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"IVF recall@10 = {recall:.2f}"

    def test_lsh_recall_vs_bruteforce(self, ray_session, sf_dir):
        """SRP-LSH with default bits/tables must reach recall@10 >= 0.9
        against brute force (deterministic: seeded hyperplanes over the
        fixed synthetic embeddings)."""
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_lsh

        exact = knn_bruteforce(sf_dir)
        approx = knn_lsh(sf_dir)

        def neighbor_sets(t):
            out = {}
            for r in t.to_pylist():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        e, a = neighbor_sets(exact), neighbor_sets(approx)
        assert set(e) == set(a)
        recalls = [len(e[q] & a[q]) / len(e[q]) for q in e]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"LSH recall@10 = {recall:.2f}"


class TestEmbeddingDedup:
    def test_pairs_match_duckdb(self, ray_session, sf_dir):
        import duckdb

        import __ray_entry__ as em

        t = em.queries()["dedup_embedding"](sf_dir)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        want = con.execute(em.oracle_sql()["dedup_embedding"]).fetch_arrow_table()
        assert t.to_pylist() == want.to_pylist()

    def test_empty_threshold(self, ray_session, sf_dir):
        from frankensearch_ray.pipelines.dedup import embedding_cosine_pairs

        assert len(embedding_cosine_pairs(sf_dir, threshold=1.01)) == 0


class TestClusterEmbeddings:
    def test_deterministic_and_self_consistent(self, ray_session, sf_dir):
        import numpy as np

        from frankensearch_ray.pipelines.ann import (
            _batch_matrix,
            cluster_embeddings,
        )

        a = cluster_embeddings(sf_dir).to_pandas()
        b = cluster_embeddings(sf_dir).to_pandas()
        # fixed-order float reduction => bit-identical reruns
        assert a.equals(b)
        k = a["cluster"].nunique()
        assert 1 < k <= 8
        # self-consistency: every vector sits in the cluster whose
        # centroid (recomputed from the final assignment) is nearest
        import pyarrow.parquet as pq

        t = pq.read_table(sf_dir + "/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids, mat = _batch_matrix(t)
        order = np.argsort(ids)
        mat = mat[order]
        lab = a.sort_values("vec_id")["cluster"].to_numpy()
        cents = np.stack(
            [mat[lab == c].mean(axis=0) for c in range(int(lab.max()) + 1)
             if (lab == c).any()]
        )
        live = sorted(set(lab.tolist()))
        remap = {c: i for i, c in enumerate(live)}
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        nearest = d.argmin(axis=1)
        agree = (nearest == np.array([remap[c] for c in lab])).mean()
        # Lloyd converges to a local optimum: assignments are consistent
        # with the induced centroids for (nearly) every vector
        assert agree >= 0.98, f"self-consistency {agree:.3f}"

    def test_streaming_path_bit_identical_to_pinned(self, ray_session, sf_dir):
        """VERDICT r04 #2: above pin_threshold_bytes the input is never
        materialized — each Lloyd iteration re-scans the lazy plan —
        and the result is bit-identical to the pinned path."""
        from frankensearch_ray.pipelines.ann import cluster_embeddings

        pinned = cluster_embeddings(sf_dir)  # default: table fits, pins
        streamed = cluster_embeddings(sf_dir, pin_threshold_bytes=0)
        assert streamed.equals(pinned)

    def test_sink_matches_table(self, ray_session, sf_dir, tmp_path):
        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines.ann import cluster_embeddings

        table = cluster_embeddings(sf_dir).to_pandas()
        out = str(tmp_path / "clusters")
        assert cluster_embeddings(sf_dir, output_path=out) is None
        sink = (
            pq.read_table(out).to_pandas()[["vec_id", "cluster"]]
            .sort_values("vec_id").reset_index(drop=True)
        )
        assert sink.equals(table)


class TestPersistedLayoutPruning:
    """VERDICT r03 #1: knn queries must READ only probed/colliding
    partitions of the persisted layouts — bytes touched scale with the
    probe set, not the corpus."""

    def test_ivf_reads_scale_with_nprobe(self, ray_session, sf_dir):
        from frankensearch_ray.pipelines import ann

        ann.knn_ivf(sf_dir, query_ids=(0,), nprobe=2)
        s2 = dict(ann.LAST_SCAN)
        ann.knn_ivf(sf_dir, query_ids=(0,), nprobe=8)
        s8 = dict(ann.LAST_SCAN)
        assert s2["layout"] == "ivf"
        assert s2["partitions_read"] == 2
        assert s8["partitions_read"] == 8
        assert s2["files_read"] < s8["files_read"]
        assert 0 < s2["bytes_read"] < s8["bytes_read"] < s8["bytes_total"]
        assert s2["files_read"] < s2["files_total"]

    def test_lsh_reads_only_colliding_buckets(self, ray_session, sf_dir):
        from frankensearch_ray.pipelines import ann

        ann.knn_lsh(sf_dir, query_ids=(0,))
        s = dict(ann.LAST_SCAN)
        assert s["layout"] == "lsh"
        # one query collides with exactly one code (= one row group) per
        # table; the other 2^bits - 1 buckets per table stay unread
        assert s["partitions_read"] <= 24
        assert s["partitions_total"] > s["partitions_read"]
        assert 0 < s["bytes_read"] < s["bytes_total"]

    def test_layout_artifacts_cached(self, ray_session, sf_dir):
        """Second call must reuse the persisted layout (same files, no
        rebuild) — centroids/codes are per-corpus artifacts, never
        re-derived per query call (the round-3 structural gap)."""
        import glob
        import os

        from frankensearch_ray.pipelines import ann

        d = ann.ivf_layout(sf_dir)
        files = sorted(glob.glob(os.path.join(d, "*", "part-*.parquet")))
        mtimes = [os.path.getmtime(f) for f in files]
        assert ann.ivf_layout(sf_dir) == d
        assert [
            os.path.getmtime(f)
            for f in sorted(glob.glob(os.path.join(d, "*", "part-*.parquet")))
        ] == mtimes

    def test_ivf_exact_config_matches_bruteforce(self, ray_session, sf_dir):
        """The driver entry (nprobe=15) must reproduce the exact top-k —
        that equality is what moved knn_ivf to an oracled row."""
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_ivf

        assert knn_ivf(sf_dir, nprobe=15).equals(knn_bruteforce(sf_dir))

    def test_lsh_matches_bruteforce_at_driver_sf(self, ray_session, sf_dir):
        from frankensearch_ray.pipelines.ann import knn_bruteforce, knn_lsh

        assert knn_lsh(sf_dir).equals(knn_bruteforce(sf_dir))


def test_knn_filtered_neighbors_respect_predicate(ray_session):
    """Every neighbor carries the filtered label, and the result equals
    brute-force cosine restricted to that label."""
    import numpy as np
    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    got = ann.knn_filtered(sf, label=1).to_pandas()
    t = pq.read_table(sf + "/embeddings.parquet")
    labels = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert all(labels[n] == 1 for n in got["neighbor_id"])
    # local exact reference among label==1 rows
    ids = np.array(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    sel = np.array([labels[i] == 1 for i in ids])
    ids_f, m = ids[sel], mat[sel]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in (0, 1, 2, 3, 4):
        qv = mat[ids == q][0]
        qn = qv / np.linalg.norm(qv)
        sims = mn @ qn
        order = np.lexsort((ids_f, -sims))[:10]
        want = ids_f[order].tolist()
        have = got[got["query_id"] == q].sort_values("rank")[
            "neighbor_id"
        ].tolist()
        assert have == want, q


def test_embedding_quantize_sink_matches_table(ray_session, tmp_path):
    """Packed list<int8> sink layout must agree element-for-element with
    the long-form driver table, and reject non-power-of-two scales."""
    import pyarrow.parquet as pq

    from frankensearch_ray.pipelines import ann as am

    sf = "/root/testdata/sf0.001"
    long = am.embedding_quantize(sf)
    out = str(tmp_path / "q8")
    assert am.embedding_quantize(sf, output_path=out) is None
    packed = pq.read_table(out).sort_by("vec_id")
    ids = packed["vec_id"].to_pylist()
    qs = packed["q"].to_pylist()
    flat = {}
    for i, ql in zip(ids, qs):
        for d, v in enumerate(ql):
            flat[(i, d)] = v
    want = {
        (r["vec_id"], r["dim"]): r["q"] for r in long.to_pylist()
    }
    assert flat == want
    # int8 range respected
    assert all(-128 <= v <= 127 for v in flat.values())
    with pytest.raises(ValueError):
        am.embedding_quantize(sf, scale=100)


def test_knn_int8_recall_and_cache_determinism(ray_session):
    from frankensearch_ray.pipelines import ann as am

    sf = "/root/testdata/sf0.001"
    exact = am.knn_bruteforce(sf, k=10)
    got = am.knn_int8(sf, k=10)
    # int8 at scale 256 keeps high agreement with exact cosine on
    # unit-norm vectors (quantization noise ~1/512 per dim)
    by_q_exact = {}
    by_q_int8 = {}
    for r in exact.to_pylist():
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in got.to_pylist():
        by_q_int8.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert by_q_exact.keys() == by_q_int8.keys()
    recalls = [
        len(by_q_exact[q] & by_q_int8[q]) / len(by_q_exact[q])
        for q in by_q_exact
    ]
    assert min(recalls) >= 0.7 and sum(recalls) / len(recalls) >= 0.8
    # the layout is cached; a second call must be bit-identical
    again = am.knn_int8(sf, k=10)
    assert got.equals(again)
    # self is always rank 0 (dot with itself is the max for unit vectors)
    for r in got.to_pylist():
        if r["rank"] == 0:
            assert r["neighbor_id"] == r["query_id"]


def test_knn_int8_rerank_improves_on_raw_int8(ray_session):
    """With a generous shortlist, the reranked result must equal exact
    brute force (the shortlist contains the true top-k) — the standard
    guarantee of the two-stage pattern; and recall can never be worse
    than the raw int8 cut."""
    from frankensearch_ray.pipelines import ann as am

    sf = "/root/testdata/sf0.001"
    exact = am.knn_bruteforce(sf, k=10)
    rer = am.knn_int8_rerank(sf, k=10, shortlist=500)  # = corpus size
    assert rer.equals(exact)

    def _sets(t):
        out = {}
        for r in t.to_pylist():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, r, i = _sets(exact), _sets(am.knn_int8_rerank(sf, k=10)), _sets(
        am.knn_int8(sf, k=10)
    )
    rec_r = sum(len(e[q] & r[q]) for q in e) / sum(len(e[q]) for q in e)
    rec_i = sum(len(e[q] & i[q]) for q in e) / sum(len(e[q]) for q in e)
    assert rec_r >= rec_i


class TestIvfAppend:
    def _clone_table(self, sf, offset=10_000, n=50):
        import pyarrow.parquet as pq

        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        t = t.slice(0, n)
        import pyarrow as _pa

        return _pa.table(
            {
                "vec_id": _pa.array(
                    [v + offset for v in t["vec_id"].to_pylist()], _pa.int64()
                ),
                "embedding": t["embedding"],
            }
        )

    def test_append_becomes_visible_and_exact(self, ray_session, tmp_path, monkeypatch):
        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        before = am.knn_ivf(sf, k=2, nprobe=16)
        clones = self._clone_table(sf)
        n = am.ivf_append(sf, clones)
        assert n == 50
        after = am.knn_ivf(sf, k=2, nprobe=16)
        assert not after.equals(before)
        # each query's clone (identical vector, id+10000) must now sit
        # at rank 1, right behind the original (cos=1 tie, id asc)
        got = {}
        for r in after.to_pylist():
            got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        for q, hits in got.items():
            hits.sort()
            assert hits[0] == (0, q)
            assert hits[1] == (1, q + 10_000), hits

    def test_append_equals_union_rebuild_at_full_probe(
        self, ray_session, tmp_path, monkeypatch
    ):
        """With every cluster probed, the appended layout must give
        bit-identical results to a fresh layout built over the union
        corpus (partitioning differences can't matter at full probe)."""
        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        clones = self._clone_table(sf, offset=20_000, n=30)
        am.ivf_append(sf, clones)
        appended = am.knn_ivf(sf, k=10, nprobe=16)

        union_dir = tmp_path / "union_sf"
        union_dir.mkdir()
        base = pq.read_table(sf + "/embeddings.parquet")
        import pyarrow as _pa

        clone_full = _pa.table(
            {
                "vec_id": clones["vec_id"],
                "embedding": clones["embedding"],
                "label": base["label"].slice(0, 30),
            }
        )
        pq.write_table(
            _pa.concat_tables([base, clone_full]),
            str(union_dir / "embeddings.parquet"),
        )
        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache2"))
        rebuilt = am.knn_ivf(str(union_dir), k=10, nprobe=16)
        assert appended.equals(rebuilt)

    def test_uncommitted_append_is_invisible(self, ray_session, tmp_path, monkeypatch):
        import glob
        import os

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        before = am.knn_ivf(sf, k=10, nprobe=16)
        am.ivf_append(sf, self._clone_table(sf))
        layout = am.ivf_layout(sf)
        markers = glob.glob(os.path.join(layout, "appends", "*.ok"))
        assert len(markers) == 1
        # simulate the crash-before-publish state: data files on disk,
        # marker missing -> queries must not see the appended vectors
        os.remove(markers[0])
        assert am.knn_ivf(sf, k=10, nprobe=16).equals(before)
        # the scan accounting must also exclude the uncommitted parts
        assert am.LAST_SCAN["files_total"] == am.LAST_SCAN["files_read"]
        on_disk = glob.glob(os.path.join(layout, "*", "part-a*.parquet"))
        assert on_disk, "appended data files should still be on disk"


class TestLshAppend:
    def _clone_table(self, sf, offset=10_000, n=50):
        import pyarrow.parquet as pq

        t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
        t = t.slice(0, n)
        import pyarrow as _pa

        return _pa.table(
            {
                "vec_id": _pa.array(
                    [v + offset for v in t["vec_id"].to_pylist()], _pa.int64()
                ),
                "embedding": t["embedding"],
            }
        )

    def test_append_equals_union_rebuild(self, ray_session, tmp_path, monkeypatch):
        """LSH codes depend only on (seed, dim), so an appended layout
        must answer BIT-IDENTICALLY to a rebuild over the union corpus —
        at the default probe set, not just exhaustively."""
        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        before = am.knn_lsh(sf, k=10)
        clones = self._clone_table(sf, offset=30_000, n=40)
        n = am.lsh_append(sf, clones, n_tables=24)
        assert n == 40
        appended = am.knn_lsh(sf, k=10)
        assert not appended.equals(before)

        union_dir = tmp_path / "union_sf"
        union_dir.mkdir()
        base = pq.read_table(sf + "/embeddings.parquet")
        import pyarrow as _pa

        clone_full = _pa.table(
            {
                "vec_id": clones["vec_id"],
                "embedding": clones["embedding"],
                "label": base["label"].slice(0, 40),
            }
        )
        pq.write_table(
            _pa.concat_tables([base, clone_full]),
            str(union_dir / "embeddings.parquet"),
        )
        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache2"))
        rebuilt = am.knn_lsh(str(union_dir), k=10)
        assert appended.equals(rebuilt)

    def test_uncommitted_lsh_append_is_invisible(
        self, ray_session, tmp_path, monkeypatch
    ):
        import glob
        import os

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        before = am.knn_lsh(sf, k=10)
        am.lsh_append(sf, self._clone_table(sf), n_tables=24)
        layout = am.lsh_layout(sf, n_tables=24)
        markers = glob.glob(os.path.join(layout, "appends", "*.ok"))
        assert len(markers) == 1
        os.remove(markers[0])
        assert am.knn_lsh(sf, k=10).equals(before)
        assert glob.glob(os.path.join(layout, "t*-a*.parquet"))


class TestAppendSnapshotRace:
    """Concurrent append+query all-or-nothing: the committed-token
    snapshot is taken BEFORE the data-file glob, so a marker that lands
    in between can never admit a partial append (ADVICE r04 #1)."""

    def test_pre_glob_snapshot_rejects_late_marker(self, tmp_path):
        import os

        from frankensearch_ray.pipelines import ann as am

        layout = str(tmp_path / "layout")
        os.makedirs(os.path.join(layout, "appends"))
        tok = "ab" * 16
        # simulate the race: the glob ran while the append was mid-write
        # (it caught one of the append's two part files), THEN the
        # marker landed.  A snapshot taken before the glob is empty.
        snap = am._committed_append_tokens(layout)
        assert snap == set()
        caught = [os.path.join(layout, "c0", f"part-a{tok}-0.parquet")]
        with open(os.path.join(layout, "appends", tok + ".ok"), "w"):
            pass
        # pre-glob snapshot -> the partially-seen append stays invisible
        assert am._drop_uncommitted_appends(layout, caught, snap) == []
        # a snapshot taken after the marker (fresh query) admits it
        assert am._drop_uncommitted_appends(
            layout, caught, am._committed_append_tokens(layout)
        ) == caught
        # base-layout files (no append token) always pass
        base = [os.path.join(layout, "c0", "part-0.parquet")]
        assert am._drop_uncommitted_appends(layout, base, snap) == base


class TestAppendSchemaProjection:
    """ADVICE r04 #3: an append fed a table with extra / reordered
    columns writes parts schema-identical to the build-time layout —
    nothing the caller carried leaks into the layout files."""

    def _messy_clones(self, sf, offset=20_000, n=20):
        import pyarrow as _pa
        import pyarrow.parquet as pq

        t = pq.read_table(
            sf + "/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, n)
        # reordered + an extra column the layout must not absorb
        return _pa.table(
            {
                "junk": _pa.array(["x"] * n),
                "embedding": t["embedding"],
                "vec_id": _pa.array(
                    [v + offset for v in t["vec_id"].to_pylist()], _pa.int64()
                ),
            }
        )

    def test_ivf_append_projects_schema(self, ray_session, tmp_path, monkeypatch):
        import glob
        import os

        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        layout = am.ivf_layout(sf)
        base = sorted(glob.glob(os.path.join(layout, "*", "part-*.parquet")))
        base_schema = pq.read_schema(base[0])
        am.ivf_append(sf, self._messy_clones(sf))
        appended = [
            p
            for p in glob.glob(os.path.join(layout, "*", "part-a*.parquet"))
        ]
        assert appended
        for p in appended:
            assert pq.read_schema(p).equals(base_schema), p
        # and the layout still answers queries
        assert am.knn_ivf(sf, k=2, nprobe=16).num_rows > 0

    def test_lsh_append_projects_schema(self, ray_session, tmp_path, monkeypatch):
        import glob
        import os

        import pyarrow.parquet as pq

        from frankensearch_ray.pipelines import ann as am

        monkeypatch.setattr(am, "CACHE_ROOT", str(tmp_path / "cache"))
        sf = "/root/testdata/sf0.001"
        layout = am.lsh_layout(sf, n_tables=8)
        base = sorted(glob.glob(os.path.join(layout, "t*-*.parquet")))
        base_schema = pq.read_schema(base[0])
        am.lsh_append(sf, self._messy_clones(sf), n_tables=8)
        appended = glob.glob(os.path.join(layout, "t*-a*.parquet"))
        assert appended
        for p in appended:
            assert pq.read_schema(p).equals(base_schema), p
        assert am.knn_lsh(sf, k=2, n_tables=8).num_rows > 0
