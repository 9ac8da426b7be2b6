"""BM25 scoring contract pinned to Tantivy 0.26.1 semantics.

Formulas and f32 operation order follow the reference
``crates/frankensearch-quill/src/contract.rs:369-402`` and the
``scoring_cases`` of ``tests/fixtures/quill_language_contract.json``:

- ``idf(n, N)   = ln(1 + ((N - n) + 0.5) / (n + 0.5))``      (f32 throughout)
- ``weight      = idf * (1 + k1)``; a field/query boost multiplies the weight
- ``norm(|d|)   = k1 * (1 - b + b * fieldnorm / avgdl)``      (f32, this assoc.)
- ``tf_factor   = f / (f + norm)``
- ``score       = weight * tf_factor``; clause scores sum left-to-right in f32
- ``avgdl``     = raw ``total_num_tokens / total_num_docs`` at snapshot level
                  (NEVER the mean of decoded fieldnorm buckets,
                  ``contract.rs:3-7``)

All vectorized kernels keep ``np.float32`` dtype per operation and the exact
association order above, so the vectorized result is bit-identical to the
scalar loop on the same platform.  Cross-platform libm bit patterns are not
part of the contract (fixture ``score-bm25-operation-order-bits``).
"""

from __future__ import annotations

import numpy as np

from .fieldnorm import FIELD_NORMS_TABLE

BM25_K1 = np.float32(1.2)
BM25_B = np.float32(0.75)

_ONE = np.float32(1.0)
_HALF = np.float32(0.5)


def idf(doc_freq, doc_count) -> np.float32:
    """Tantivy-compatible BM25 idf; panics (asserts) when n > N.

    Reference: ``contract.rs:376-380`` — ``ratio = ((N - n) as f32 + 0.5) /
    (n as f32 + 0.5); (1.0 + ratio).ln()``.
    """
    doc_freq = np.asarray(doc_freq, dtype=np.uint64)
    doc_count = np.uint64(doc_count)
    assert np.all(doc_count >= doc_freq), f"{doc_count} >= {doc_freq}"
    ratio = ((doc_count - doc_freq).astype(np.float32) + _HALF) / (
        doc_freq.astype(np.float32) + _HALF
    )
    return np.log(_ONE + ratio, dtype=np.float32)


def term_weight(idf_value, boost=None) -> np.float32:
    """``weight = idf * (1 + k1)``, then ``weight * boost`` if boosted."""
    w = np.float32(idf_value) * (_ONE + BM25_K1)
    if boost is not None and np.float32(boost) != _ONE:
        w = w * np.float32(boost)
    return w


def cached_tf_component(fieldnorm, average_fieldnorm) -> np.float32:
    """``k1 * (1 - b + b * fieldnorm / avgdl)`` in f32 (``contract.rs:388-392``).

    Rust precedence: ``(1.0 - b) + ((b * fieldnorm) / avgdl)`` then ``k1 *``.
    """
    fn_f32 = np.asarray(fieldnorm, dtype=np.float32)
    avg = np.float32(average_fieldnorm)
    return BM25_K1 * ((_ONE - BM25_B) + (BM25_B * fn_f32) / avg)


def compute_tf_cache(average_fieldnorm) -> np.ndarray:
    """The 256 per-fieldnorm-id norm entries for one field snapshot
    (``contract.rs:394-405``)."""
    return cached_tf_component(
        FIELD_NORMS_TABLE.astype(np.float32), average_fieldnorm
    ).astype(np.float32)


def tf_factor(term_freq, norm) -> np.ndarray:
    """``f / (f + norm)`` in f32; ``term_freq`` is the raw u32 frequency."""
    f = np.asarray(term_freq, dtype=np.float32)
    n = np.asarray(norm, dtype=np.float32)
    return f / (f + n)


def term_scores(term_freq, fieldnorm_id, weight, tf_cache) -> np.ndarray:
    """Vectorized per-posting BM25: ``weight * (f / (f + norm[fieldnorm_id]))``."""
    norm = tf_cache[np.asarray(fieldnorm_id, dtype=np.int64)]
    return np.float32(weight) * tf_factor(term_freq, norm)


# --- Block-max metadata (``contract.rs:306-367``) -------------------------

BLOCK_MAX_UNBOUNDED_CODE = 255


def block_max_frequency_to_code(max_frequency) -> np.ndarray:
    """Frequencies >= 255 saturate to the unbounded sentinel code 255."""
    arr = np.asarray(max_frequency, dtype=np.uint32)
    return np.minimum(arr, 255).astype(np.uint8)


def block_max_frequency_from_code(code):
    """Code 255 decodes to u32::MAX (an unbounded sentinel, not 255)."""
    arr = np.asarray(code, dtype=np.uint32)
    return np.where(arr == 255, np.uint32(0xFFFFFFFF), arr).astype(np.uint32)


def block_max_score(max_frequency_code, min_fieldnorm_id, live_avgdl, weight):
    """Conservative per-block score upper bound, or None to disable pruning.

    Must be computed from the LIVE snapshot avgdl (``quiver.rs:1769-1786``);
    code 0 or a negative/non-finite weight disables pruning
    (``contract.rs:335-374``).
    """
    w = np.float32(weight)
    if not np.isfinite(w) or w < 0.0:
        return None
    avg = np.float32(live_avgdl)
    if not np.isfinite(avg) or avg <= 0.0:
        return None
    code = int(max_frequency_code)
    if code == 0:
        return None
    freq = np.float32(np.float64(block_max_frequency_from_code(code)))
    from .fieldnorm import id_to_fieldnorm

    norm = cached_tf_component(id_to_fieldnorm(min_fieldnorm_id), avg)
    factor = freq / (freq + norm)
    if not np.isfinite(factor):
        return None
    score = w * factor
    return float(score) if np.isfinite(score) else None
