"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_bruteforce``: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once), per-batch partial top-k, driver
  merge.  The scale baseline: one pass, no shuffle.
- ``knn_ivf``: IVF-style scale path — deterministic k-means-lite centroids
  (seeded, few Lloyd iterations over a sample), assign each vector to its
  nearest centroid inside ``map_batches``, probe the ``nprobe`` closest
  centroid buckets only.  Recall vs bruteforce is asserted in pytest.

Similarities are computed in float64 so the DuckDB oracle
(``list_cosine_similarity``) agrees to rank level on non-tied data.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    col = batch["embedding"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(ids) if len(ids) else 0
    return ids, flat.reshape(len(ids), dim)


class _BruteForceScorer:
    """Stateless task body: partial cosine top-k per batch vs broadcast
    queries."""

    def __init__(self, queries_ref, k: int):
        self.queries_ref = queries_ref
        self.k = k
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._q is None:
            q_ids, q = (
                ray.get(self.queries_ref)
                if not isinstance(self.queries_ref, tuple)
                else self.queries_ref
            )
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            self._q = (q_ids, qn)
        q_ids, qn = self._q
        ids, m = _batch_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn @ mn.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for bi in part[qi]:
                out_q.append(int(q_ids[qi]))
                out_n.append(int(ids[bi]))
                out_s.append(float(sims[qi, bi]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _merge_topk(pdf: pd.DataFrame, k: int) -> pa.Table:
    pdf = pdf.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    pdf = pdf.groupby("query_id", sort=True).head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount()
    out = pdf[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _read_queries(sf_dir: str, query_ids, id_col: str = "vec_id"):
    """Row-group-pruned read of ONLY the query vectors (predicate pushed
    into the parquet read — never a full-table driver materialization)."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        _emb_path(sf_dir),
        columns=[id_col, "embedding"],
        filters=[(id_col, "in", list(query_ids))],
    )
    return _batch_matrix(qt)


def _stride_sample(
    emb_path: str, id_col: str, emb_col: str, target: int = 2048
) -> np.ndarray:
    """Deterministic distributed sample: every batch keeps its id-stride
    rows, so the sample spans the WHOLE table (never 'first N rows', which
    is a biased slice at scale).  Returns a (<= ~target, dim) matrix."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    total = pq.ParquetFile(emb_path).metadata.num_rows
    stride = max(1, total // target)

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        mask = pc.equal(
            pc.bit_wise_and(ids, stride - 1)
            if stride & (stride - 1) == 0
            else pc.subtract(ids, pc.multiply(pc.divide(ids, stride), stride)),
            0,
        )
        return t.filter(mask)

    rows = (
        rd.read_parquet(emb_path, columns=[id_col, emb_col])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )
    # id-sorted so the sample is byte-identical at ANY parallelism (block
    # arrival order must not leak into the k-means seed)
    rows.sort(key=lambda r: r[id_col])
    return np.array([r[emb_col] for r in rows], dtype=np.float64)


def knn_bruteforce(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10
) -> pa.Table:
    """(query_id, neighbor_id, rank): exact cosine top-k per query vector."""
    import ray
    import ray.data as rd

    queries = _read_queries(sf_dir, query_ids)
    queries_ref = ray.put(queries)

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _BruteForceScorer(queries_ref, k), batch_format="pyarrow", batch_size=512
    )
    return _merge_topk(partials.to_pandas(), k)


def _kmeans_lite(
    sample: np.ndarray, n_clusters: int, iters: int = 5, seed: int = 42
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def knn_ivf(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 12,
) -> pa.Table:
    """IVF-bucketed approximate cosine top-k (the 100 TB scale path: the
    matmul only touches ``nprobe / n_clusters`` of the corpus).

    The synthetic embeddings are near-uniform (no cluster structure), so
    the default nprobe is high (12/16) to hold recall@10 >= 0.9 — the
    pytest gate.  Real corpora with cluster structure run far lower
    nprobe at the same recall."""
    import ray
    import ray.data as rd

    # centroids from a DISTRIBUTED stride sample (spans the whole table —
    # a 'first N rows' slice is a biased sample at scale)
    sample = _stride_sample(_emb_path(sf_dir), "vec_id", "embedding")
    cents = _kmeans_lite(sample, n_clusters)
    cents_n = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    q_ids, qm = _read_queries(sf_dir, query_ids)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    probe = np.argsort(-(qn @ cents_n.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    # (Q, n_clusters) membership matrix: probe masks for ALL queries are
    # one fancy-index per batch, no per-query set lookups
    probe_mat = np.zeros((len(q_ids), n_clusters), dtype=bool)
    probe_mat[np.arange(len(q_ids))[:, None], probe] = True
    refs = ray.put((q_ids, qn, cents, probe_mat))

    class IvfScorer:
        """Stateless task body (NOT an actor pool: the state is a tiny
        broadcast ref, and task-pool map_batches skips the actor-launch
        latency that dominated this query's wall time)."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            # plasma-backed numpy: zero-copy get per task
            q_ids_, qn_, cents_, probe_mat_ = ray.get(refs)
            ids, m = _batch_matrix(batch)
            if len(ids) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            d = ((m[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = qn_ @ mn.T  # (Q, B) one matmul for every query
            allowed = probe_mat_[:, assign]  # (Q, B) via one fancy index
            sims = np.where(allowed, sims, -np.inf)
            out_q, out_n, out_s = [], [], []
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for qi in range(sims.shape[0]):
                for bi in part[qi]:
                    if sims[qi, bi] == -np.inf:
                        continue
                    out_q.append(int(q_ids_[qi]))
                    out_n.append(int(ids[bi]))
                    out_s.append(float(sims[qi, bi]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    partials = ds.map_batches(IvfScorer(), batch_format="pyarrow", batch_size=512)
    return _merge_topk(partials.to_pandas(), k)


def knn_lsh(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> pa.Table:
    """Signed-random-projection LSH approximate cosine top-k: a vector is
    a candidate for a query iff they share a bucket code in ANY of the
    ``n_tables`` hash tables (each table = ``n_bits`` random hyperplane
    signs).  Zero shuffle; hyperplanes + query codes broadcast once.

    At 100 TB the same codes become the PARTITION KEY: vectors land in
    bucket-partitioned parquet at ingest and a query reads only its
    (multi-probed) buckets — the in-pass mask here is the single-node
    proxy of that read-pruning.  The synthetic embeddings are
    near-uniform (worst case for LSH — no cluster structure), so defaults
    are loose (4 bits x 16 tables, candidate mass ~64%; clustered real
    corpora run far tighter); pytest gates recall@10 vs bruteforce.
    """
    import ray
    import ray.data as rd

    q_ids, qm = _read_queries(sf_dir, query_ids)
    dim = qm.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    pw = (1 << np.arange(n_bits)).astype(np.int64)

    def codes_of(m: np.ndarray) -> np.ndarray:
        """(rows, n_tables) int64 bucket codes."""
        # (T, bits, dim) @ (rows, dim).T -> (T, bits, rows)
        s = np.einsum("tbd,rd->tbr", planes, m) >= 0.0
        return np.einsum("tbr,b->tr", s.astype(np.int64), pw).T

    q_codes = codes_of(qm)  # (Q, T)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    refs = ray.put((q_ids, qn, q_codes))

    class LshScorer:
        """Stateless task body (broadcast state, no actor launch cost)."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            q_ids_, qn_, q_codes_ = ray.get(refs)
            ids, m = _batch_matrix(batch)
            if len(ids) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            b_codes = codes_of(m)  # (B, T)
            # (Q, B): candidate iff codes collide in >= 1 table
            allowed = (q_codes_[:, None, :] == b_codes[None, :, :]).any(axis=2)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = np.where(allowed, qn_ @ mn.T, -np.inf)
            out_q, out_n, out_s = [], [], []
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for qi in range(sims.shape[0]):
                for bi in part[qi]:
                    if sims[qi, bi] == -np.inf:
                        continue
                    out_q.append(int(q_ids_[qi]))
                    out_n.append(int(ids[bi]))
                    out_s.append(float(sims[qi, bi]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    ds = rd.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    partials = ds.map_batches(LshScorer(), batch_format="pyarrow", batch_size=512)
    return _merge_topk(partials.to_pandas(), k)


def cluster_embeddings(
    sf_dir: str,
    n_clusters: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    output_path: str | None = None,
) -> pa.Table | None:
    """(vec_id, cluster): distributed Lloyd k-means over the embedding
    table — the cluster-assignment stage a training-data pipeline uses
    for diversity balancing / cluster-aware sampling.

    Scale shape: centroids seed from the deterministic distributed
    stride sample (spans the table, id-sorted, seeded choice — identical
    at any parallelism); the input materializes ONCE into the object
    store (the standard Ray iterative-ML pattern: pin blocks, don't
    re-scan parquet per iteration; the store spills under pressure).
    Each iteration broadcasts the (k × dim) centroid matrix and runs one
    zero-exchange pass emitting per-batch partial (cluster, count,
    component sums) — k×dim-sized regardless of rows.  Partials reduce
    on the driver in a FIXED order (sorted by each batch's min id), so
    float accumulation is deterministic and reruns are bit-identical.
    Euclidean assignment, ties → lowest cluster id; a cluster that loses
    all members keeps its previous centroid.  The final assignment pass
    streams (vec_id, cluster) out of ``map_batches`` (``output_path``
    sinks it to parquet)."""
    import ray
    import ray.data as rd

    from ._sink import finish

    sample = _stride_sample(_emb_path(sf_dir), id_col, emb_col)
    rng = np.random.default_rng(42)
    idx = rng.choice(
        len(sample), size=min(n_clusters, len(sample)), replace=False
    )
    cents = sample[np.sort(idx)].copy()
    k, dim = cents.shape

    ds = rd.read_parquet(
        _emb_path(sf_dir), columns=[id_col, emb_col]
    ).materialize()

    def assign_of(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin of |x-c|^2 == argmin of |c|^2 - 2 x.c; ties -> lowest id
        scores = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
        return scores.argmin(axis=1)

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partials(t: pa.Table) -> pa.Table:
            ids, mat = _batch_matrix(t)
            if len(ids) == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "min_id": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            c = ray.get(cents_ref)
            a = assign_of(mat, c)
            present = np.unique(a)
            sums = np.zeros((len(present), mat.shape[1]))
            cnts = np.zeros(len(present), np.int64)
            for j, cl in enumerate(present):
                m = a == cl
                sums[j] = mat[m].sum(axis=0)
                cnts[j] = int(m.sum())
            return pa.table(
                {
                    "cluster": pa.array(present.astype(np.int64)),
                    "cnt": pa.array(cnts),
                    "min_id": pa.array(
                        np.full(len(present), ids.min(), np.int64)
                    ),
                    "vsum": pa.array(list(sums)),
                }
            )

        p = (
            ds.map_batches(partials, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["cluster", "min_id"], kind="mergesort")
        )
        new = cents.copy()
        for cl, g in p.groupby("cluster", sort=True):
            tot = np.zeros(dim)
            for v in g["vsum"]:
                tot += np.asarray(v)
            n = int(g["cnt"].sum())
            if n:
                new[int(cl)] = tot / n
        cents = new

    cents_ref = ray.put(cents)

    def label(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        a = assign_of(mat, ray.get(cents_ref))
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "cluster": pa.array(a.astype(np.int64)),
            }
        )

    return finish(
        ds.map_batches(label, batch_format="pyarrow"),
        ["vec_id"],
        output_path,
    )
