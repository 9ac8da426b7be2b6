"""Relevance-quality metrics with bootstrap confidence intervals.

Semantics mirror the reference evaluation harness
(``core/src/metrics_eval.rs:25-624``) exactly:

- duplicate retrieved ids count ONCE (first occurrence);
- nDCG uses binary gain ``1/log2(rank+2)`` with ideal DCG over
  ``min(k, |relevant|)``;
- MAP divides by ``min(k, |relevant|)``;
- bootstrap resampling uses the same Xorshift64 generator and linear-
  interpolated percentiles, so CI values are bit-reproducible against a
  given seed.
"""

from __future__ import annotations

from dataclasses import dataclass


def _dedup_limit(retrieved: list[str], k: int | None) -> list[str]:
    seen: set[str] = set()
    out = []
    src = retrieved if k is None else retrieved[: min(k, len(retrieved))]
    for doc in src:
        if doc in seen:
            continue
        seen.add(doc)
        out.append((doc, len(seen) - 1))
    return out


def ndcg_at_k(retrieved: list[str], relevant: list[str], k: int) -> float:
    """``metrics_eval.rs:25-61``."""
    import math

    relevant_set = set(relevant)
    if not relevant_set or k == 0:
        return 0.0
    limit = min(k, len(retrieved))
    seen: set[str] = set()
    dcg = 0.0
    for i, doc in enumerate(retrieved[:limit]):
        if doc in seen:
            continue
        seen.add(doc)
        if doc in relevant_set:
            dcg += 1.0 / math.log2(i + 2.0)
    ideal = min(k, len(relevant_set))
    idcg = sum(1.0 / math.log2(i + 2.0) for i in range(ideal))
    return dcg / idcg if idcg else 0.0


def map_at_k(retrieved: list[str], relevant: list[str], k: int) -> float:
    """``metrics_eval.rs:70-92``."""
    relevant_set = set(relevant)
    if not relevant_set or k == 0:
        return 0.0
    limit = min(k, len(retrieved))
    seen: set[str] = set()
    hits = 0
    total = 0.0
    for i, doc in enumerate(retrieved[:limit]):
        if doc in seen:
            continue
        seen.add(doc)
        if doc in relevant_set:
            hits += 1
            total += hits / (i + 1.0)
    return total / min(k, len(relevant_set))


def mrr(retrieved: list[str], relevant: list[str]) -> float:
    """``metrics_eval.rs:100-116``."""
    relevant_set = set(relevant)
    if not relevant_set:
        return 0.0
    seen: set[str] = set()
    for i, doc in enumerate(retrieved):
        if doc in seen:
            continue
        seen.add(doc)
        if doc in relevant_set:
            return 1.0 / (i + 1.0)
    return 0.0


def recall_at_k(retrieved: list[str], relevant: list[str], k: int) -> float:
    """``metrics_eval.rs:123-148``."""
    relevant_set = set(relevant)
    if not relevant_set or k == 0:
        return 0.0
    limit = min(k, len(retrieved))
    seen: set[str] = set()
    found = 0
    for doc in retrieved[:limit]:
        if doc in seen:
            continue
        seen.add(doc)
        if doc in relevant_set:
            found += 1
    return found / len(relevant_set)


class Xorshift64:
    """``metrics_eval.rs:276-300`` — bit-identical resampling stream."""

    MASK = (1 << 64) - 1

    def __init__(self, seed: int):
        self.state = seed if seed != 0 else 0x5EED_CAFE_BABE_D00D

    def next_u64(self) -> int:
        x = self.state
        x ^= (x << 13) & self.MASK
        x ^= x >> 7
        x ^= (x << 17) & self.MASK
        self.state = x
        return x

    def next_index(self, bound: int) -> int:
        return self.next_u64() % bound


def _percentile_sorted(sorted_vals: list[float], p: float) -> float:
    if not sorted_vals:
        return 0.0
    if len(sorted_vals) == 1:
        return sorted_vals[0]
    idx = p * (len(sorted_vals) - 1)
    lo = int(idx)
    frac = idx - lo
    hi = min(lo + 1, len(sorted_vals) - 1)
    return sorted_vals[lo] * (1.0 - frac) + sorted_vals[hi] * frac


@dataclass
class BootstrapCi:
    mean: float
    std_error: float
    lower: float
    upper: float
    confidence: float
    n_resamples: int


def bootstrap_ci(
    scores: list[float],
    confidence: float = 0.95,
    n_resamples: int = 1000,
    seed: int = 42,
) -> BootstrapCi | None:
    """``metrics_eval.rs:338-390``."""
    import math

    if (
        not scores
        or any(not math.isfinite(s) for s in scores)
        or n_resamples == 0
        or not (0.0 < confidence < 1.0)
    ):
        return None
    n = len(scores)
    observed = sum(scores) / n
    rng = Xorshift64(seed)
    means = []
    for _ in range(n_resamples):
        total = 0.0
        for _ in range(n):
            total += scores[rng.next_index(n)]
        means.append(total / n)
    means.sort()
    alpha = 1.0 - confidence
    lower = _percentile_sorted(means, alpha / 2.0)
    upper = _percentile_sorted(means, 1.0 - alpha / 2.0)
    bm = sum(means) / len(means)
    var = (
        sum((x - bm) ** 2 for x in means) / (len(means) - 1)
        if len(means) > 1
        else 0.0
    )
    return BootstrapCi(observed, var**0.5, lower, upper, confidence, n_resamples)


@dataclass
class BootstrapComparison:
    mean_a: float
    mean_b: float
    mean_diff: float
    ci_lower: float
    ci_upper: float
    p_value: float
    significant: bool
    confidence: float
    n_resamples: int


def bootstrap_compare(
    scores_a: list[float],
    scores_b: list[float],
    confidence: float = 0.95,
    n_resamples: int = 1000,
    seed: int = 42,
) -> BootstrapComparison | None:
    """Paired bootstrap difference + shift-method p-value with the
    Davison-Hinkley plus-one correction (``metrics_eval.rs:401-466``)."""
    import math

    if (
        not scores_a
        or len(scores_a) != len(scores_b)
        or any(not math.isfinite(s) for s in scores_a + scores_b)
        or n_resamples == 0
        or not (0.0 < confidence < 1.0)
    ):
        return None
    diffs = [a - b for a, b in zip(scores_a, scores_b)]
    n = len(diffs)
    observed = sum(diffs) / n
    rng = Xorshift64(seed)
    boot = []
    for _ in range(n_resamples):
        total = 0.0
        for _ in range(n):
            total += diffs[rng.next_index(n)]
        boot.append(total / n)
    boot.sort()
    alpha = 1.0 - confidence
    ci_lower = _percentile_sorted(boot, alpha / 2.0)
    ci_upper = _percentile_sorted(boot, 1.0 - alpha / 2.0)
    abs_obs = abs(observed)
    extreme = sum(1 for d in boot if abs(d - observed) >= abs_obs)
    p = (extreme + 1) / (n_resamples + 1)
    return BootstrapComparison(
        sum(scores_a) / n,
        sum(scores_b) / n,
        observed,
        ci_lower,
        ci_upper,
        p,
        p < alpha,
        confidence,
        n_resamples,
    )


def evaluate_ranking(
    results: dict[str, list[str]],
    relevant: dict[str, list[str]],
    k: int = 10,
    seed: int = 42,
) -> dict:
    """Per-query metric vectors + bootstrap CIs for a query->ranking map."""
    qids = sorted(results)
    vectors = {
        "ndcg": [ndcg_at_k(results[q], relevant.get(q, []), k) for q in qids],
        "map": [map_at_k(results[q], relevant.get(q, []), k) for q in qids],
        "mrr": [mrr(results[q], relevant.get(q, [])) for q in qids],
        "recall": [
            recall_at_k(results[q], relevant.get(q, []), k) for q in qids
        ],
    }
    out = {"k": k, "n_queries": len(qids), "per_query": vectors, "ci": {}}
    for name, vec in vectors.items():
        ci = bootstrap_ci(vec, seed=seed)
        if ci is not None:
            out["ci"][name] = ci
    return out
