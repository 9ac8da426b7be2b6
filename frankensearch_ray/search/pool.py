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


import functools


@functools.lru_cache(maxsize=1)
def _make_actor_cls():
    import ray

    from .searcher import LocalSearcher

    @ray.remote(num_cpus=1)
    class SearcherReplica:
        def __init__(self, index_dir: str, segment_threads: int = 0):
            # a 1-cpu replica must BE a 1-cpu replica: Arrow's global
            # pools default to the machine's logical count, so parquet
            # row-group decode inside each replica would fan out to
            # every core — small pools silently borrow the whole
            # machine and large pools self-contend, corrupting any
            # replicas-vs-throughput measurement (and, on a real
            # multi-tenant node, stealing neighbors' cycles)
            import pyarrow as _pa

            _pa.set_cpu_count(1)
            _pa.set_io_thread_count(2)  # storage-latency hiding, not compute
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
        self.index_dir = index_dir
        self.segment_threads = segment_threads
        cls = _make_actor_cls()
        self.actors = [
            cls.remote(index_dir, segment_threads) for _ in range(size)
        ]
        import ray

        ray.get([a.warm.remote() for a in self.actors])

    def _respawn(self, ai: int) -> None:
        """Replace a dead replica in place (same index snapshot)."""
        import ray

        cls = _make_actor_cls()
        self.actors[ai] = cls.remote(self.index_dir, self.segment_threads)
        ray.get(self.actors[ai].warm.remote())

    def _repair_replicas(self) -> int:
        """Ping every replica IN PARALLEL (one bounded wait, not
        size x 30 s of serial timeouts); respawn the dead ones.
        Returns how many were respawned."""
        import ray

        pings = [a.search_many.remote([], 1) for a in self.actors]
        respawned = 0
        for ai, f in enumerate(pings):
            try:
                ray.get(f, timeout=30)
            except Exception:
                self._respawn(ai)
                respawned += 1
        return respawned

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
        _retry: int = 0,
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
        if not queries:
            return []
        if n == 0:
            raise RuntimeError(
                "SearcherPool has no replicas (shut down?) — cannot "
                f"serve {len(queries)} queries"
            )
        # guided self-scheduling: each chunk is a fraction of the
        # REMAINING work, so the workload opens with big cheap-to-route
        # chunks and closes with small ones — the classic fix for the
        # two costs a fixed size trades off (per-chunk dispatch at the
        # start, the one-straggler-chunk idle tail at the end, which at
        # 16 fast replicas was ~10% of the whole pass)
        if chunk_size is None:
            schedule: list[tuple[int, int]] = []  # (start, size)
            s0, rem = 0, len(queries)
            while rem > 0:
                size = min(rem, max(4, rem // (n * 3)))
                schedule.append((s0, size))
                s0 += size
                rem -= size
        else:
            schedule = [
                (s0, min(chunk_size, len(queries) - s0))
                for s0 in range(0, len(queries), chunk_size)
            ]
        import time as _time

        next_chunk = 0
        pending: dict = {}  # future -> (actor_idx, start, size, t_submit)
        finished: list = []  # (future, chunk_start), gather at the end
        dead: set[int] = set()

        def submit(ai: int) -> bool:
            nonlocal next_chunk
            if ai in dead:
                return False
            if next_chunk >= len(schedule):
                return False
            s, size = schedule[next_chunk]
            next_chunk += 1
            f = self.actors[ai].search_many.remote(
                queries[s : s + size], limit, offset
            )
            pending[f] = (ai, s, size, _time.monotonic())
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
                ai, s, size, t0 = pending.pop(f)
                # a dead actor's futures error back near-instantly; left
                # unchecked it out-completes every live replica and
                # drains the schedule into guaranteed re-runs (the chunk
                # sink).  An instant completion is suspicious enough to
                # pay one eager get: on RayActorError the chunk is
                # requeued and the actor stops receiving work.
                if ai not in dead and _time.monotonic() - t0 < 0.002:
                    try:
                        ray.get(f)
                    except ray.exceptions.RayActorError:
                        dead.add(ai)
                        schedule.append((s, size))
                        continue
                    except Exception:
                        pass  # non-actor errors surface at the gather
                finished.append((f, s))
                submit(ai)
        out: list[dict | None] = [None] * len(queries)
        try:
            # fast path: one batched fetch, no per-chunk deserialization
            # on the critical path (the common, all-replicas-alive case)
            chunks = ray.get([f for f, _ in finished])
            for (_, s), rs in zip(finished, chunks):
                for i, r in enumerate(rs):
                    out[s + i] = r
            if not dead and all(r is not None for r in out):
                return out  # type: ignore[return-value]
        except ray.exceptions.RayActorError:
            # a death slipped past the instant-completion heuristic (the
            # actor died mid-chunk, after real work started).  Collect
            # what landed; the holes are re-run below.
            for f, s in finished:
                try:
                    rs = ray.get(f)
                except ray.exceptions.RayActorError:
                    continue  # length recovered below via the out[] holes
                for i, r in enumerate(rs):
                    out[s + i] = r
        # repair path: respawn dead replicas and re-run ONLY the lost
        # chunks — the caller sees a complete, order-correct result
        # either way (every replica evaluates the same pinned kernel, so
        # a re-run chunk is value-identical to what the dead replica
        # would have returned).
        self._repair_replicas()
        holes = [i for i, r in enumerate(out) if r is None]
        if holes:
            if _retry >= 2:
                # a query that reliably kills its replica would otherwise
                # respawn/re-run forever — surface it instead
                raise RuntimeError(
                    f"{len(holes)} queries still failing after "
                    f"{_retry} pool repairs (first: "
                    f"{queries[holes[0]]!r})"
                )
            redo = self.search_many(
                [queries[i] for i in holes],
                limit,
                offset,
                chunk_size,
                _retry=_retry + 1,
            )
            for i, r in zip(holes, redo):
                out[i] = r
        return out  # type: ignore[return-value]

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
