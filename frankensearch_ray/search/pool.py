"""Distributed query serving: a replica actor pool over one index.

Each actor holds a ``LocalSearcher`` view of the shared index directory.
Shard tables are loaded LAZILY per queried term and cached per actor
(``_ShardCache``), so an actor's memory footprint is bounded by its query
mix, not the index size — the replica-serving model used by search
clusters: index shards on shared storage, N stateless-ish replicas, each
answering whole queries (SURVEY §7.3 "query shard scorers are an actor
pool").  Results are rank/score-identical to the driver-side searcher
because every replica evaluates the same pinned kernel over the same
snapshot generation.

Throughput scales with ``size``; per-query latency stays single-replica.
For latency scaling at 10^12 docs the complementary axis is segment
(docid-range) fan-out WITHIN a replica — the manifest's partition ranges
give each replica the reference's deterministic per-segment merge for
free (``index.rs:8027-8121``).
"""

from __future__ import annotations


def _make_actor_cls():
    import ray

    from .searcher import LocalSearcher

    @ray.remote(num_cpus=1)
    class SearcherReplica:
        def __init__(self, index_dir: str, segment_threads: int = 0):
            self.searcher = LocalSearcher(index_dir)
            # intra-replica segment fan-out for single-query latency:
            # bit-identical (local heaps + total-order merge), gated on
            # the reference thresholds in wand.search_pruned, so small
            # queries never pay thread setup.  A 1-cpu replica keeps it
            # off by default; pools sized below the machine can opt in.
            self.searcher.segment_threads = int(segment_threads)

        def warm(self) -> bool:
            return True

        def search_many(self, queries: list[str], limit: int, offset: int = 0):
            return [
                self.searcher.search(q, limit=limit, offset=offset)
                for q in queries
            ]

    return SearcherReplica


class SearcherPool:
    """N query replicas over one index dir; round-robin query routing."""

    def __init__(self, index_dir: str, size: int = 4, segment_threads: int = 0):
        cls = _make_actor_cls()
        self.actors = [
            cls.remote(index_dir, segment_threads) for _ in range(size)
        ]
        import ray

        ray.get([a.warm.remote() for a in self.actors])

    def search_many(
        self, queries: list[str], limit: int = 10, offset: int = 0
    ) -> list[dict]:
        """Evaluate queries across the pool; results in input order."""
        import ray

        n = len(self.actors)
        chunks: list[list[str]] = [[] for _ in range(n)]
        owners: list[list[int]] = [[] for _ in range(n)]
        for i, q in enumerate(queries):
            chunks[i % n].append(q)
            owners[i % n].append(i)
        futs = [
            a.search_many.remote(c, limit, offset)
            for a, c in zip(self.actors, chunks)
            if c
        ]
        out: list[dict | None] = [None] * len(queries)
        live_owner = [o for o, c in zip(owners, chunks) if c]
        for owner, res in zip(live_owner, ray.get(futs)):
            for i, r in zip(owner, res):
                out[i] = r
        return out  # type: ignore[return-value]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
