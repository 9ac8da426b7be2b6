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
    """N query replicas over one index dir; dynamic chunked routing."""

    def __init__(self, index_dir: str, size: int = 4, segment_threads: int = 0):
        cls = _make_actor_cls()
        self.actors = [
            cls.remote(index_dir, segment_threads) for _ in range(size)
        ]
        import ray

        ray.get([a.warm.remote() for a in self.actors])

    def warm_all(self, queries: list[str], limit: int = 10) -> None:
        """Bring EVERY replica to serving steady state: each replica
        evaluates the full workload once, in parallel across replicas.

        A long-lived serving fleet's replicas have each answered far
        more queries than any one benchmark pass; measuring throughput
        before that state charges the one-time per-replica cache ramp
        (shard row groups, postings, norms) to the steady-state rate —
        and because the ramp is a FIXED cost per replica, it suppresses
        measured scaling exactly at high replica counts, where each
        replica sees the fewest queries per pass."""
        import ray

        ray.get([a.search_many.remote(queries, limit) for a in self.actors])

    def search_many(
        self,
        queries: list[str],
        limit: int = 10,
        offset: int = 0,
        chunk_size: int | None = None,
    ) -> list[dict]:
        """Evaluate queries across the pool; results in input order.

        Dispatch is DYNAMIC: queries go out in small chunks to whichever
        replica frees up (``ray.wait``), with chunks pipelined per
        replica so actor-call latency overlaps compute.  A static 1/N
        split makes the pool's wall time the SLOWEST replica's whole
        share — query cost is heavily skewed (head-term unions vs. cheap
        conjunctions), and at 16+ replicas a straggler share dominates
        (this was the 0.55 query-scaling signature at 800k pages).

        The routing loop itself must stay OFF the critical path: at 16
        warm replicas a chunk completes every couple of milliseconds,
        and a coordinator that deserializes each chunk's results before
        refilling the replica becomes the throughput cap (the 0.67
        query-scaling signature after the round-4 kernel speedups).  So
        the loop only learns WHICH future finished (``ray.wait``),
        refills that replica, and drains every already-complete future
        per iteration; result payloads stay in the object store and are
        fetched in one batched ``ray.get`` after the last chunk lands.
        Results are identical either way: every replica evaluates the
        same pinned kernel over the same snapshot generation.
        """
        import ray

        n = len(self.actors)
        if not queries or n == 0:
            return []
        if chunk_size is None:
            # ~8 waves per replica levels out cost skew; floor keeps
            # tiny workloads from paying per-chunk dispatch overhead
            chunk_size = max(4, len(queries) // (n * 8) or 1)
        starts = list(range(0, len(queries), chunk_size))
        next_chunk = 0
        pending: dict = {}  # future -> actor_idx
        finished: list = []  # (future, chunk_start), gather at the end

        def submit(ai: int) -> bool:
            nonlocal next_chunk
            if next_chunk >= len(starts):
                return False
            s = starts[next_chunk]
            next_chunk += 1
            f = self.actors[ai].search_many.remote(
                queries[s : s + chunk_size], limit, offset
            )
            pending[f] = (ai, s)
            return True

        for ai in range(n):
            for _ in range(3):
                if not submit(ai):
                    break
        while pending:
            done, _ = ray.wait(list(pending.keys()), num_returns=1)
            # drain everything else that finished while we slept — one
            # loop iteration may need to refill several replicas
            if len(pending) > 1:
                more, _ = ray.wait(
                    list(pending.keys()), num_returns=len(pending), timeout=0
                )
                done = list(dict.fromkeys(done + more))
            for f in done:
                ai, s = pending.pop(f)
                finished.append((f, s))
                submit(ai)
        out: list[dict | None] = [None] * len(queries)
        chunks = ray.get([f for f, _ in finished])
        for (_, s), rs in zip(finished, chunks):
            for i, r in enumerate(rs):
                out[s + i] = r
        return out  # type: ignore[return-value]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
