"""fsfs lexical chunking policy: deterministic overlapping chunks.

Reference: ``fsfs/src/lexical_pipeline.rs:112-162`` (`LexicalChunkPolicy
{max_chars: 768, overlap_chars: 96}`) — despite the field names, spans
are BYTE offsets floored to UTF-8 char boundaries; ``token_count`` counts
maximal runs of token characters (``is_token_char``: alphanumeric or one
of ``_ - . / :``, ``lexical_pipeline.rs:304-306``).

The Ray pipeline explodes each document into its chunk rows — the ingest
shape the reference's fsfs indexer feeds to the lexical tier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..contract.analyzer import _char_is_alphanumeric

DEFAULT_MAX_CHARS = 768
DEFAULT_OVERLAP = 96

_TOKEN_PUNCT = set("_-./:")


def _is_token_char(ch: str) -> bool:
    return _char_is_alphanumeric(ch) or ch in _TOKEN_PUNCT


def count_lexical_tokens(text: str) -> int:
    count = 0
    in_token = False
    for ch in text:
        if _is_token_char(ch):
            if not in_token:
                count += 1
                in_token = True
        else:
            in_token = False
    return count


def _floor_boundary(raw: bytes, i: int) -> int:
    while i > 0 and (raw[i] & 0xC0) == 0x80:
        i -= 1
    return i


def _ceil_boundary(raw: bytes, i: int) -> int:
    n = len(raw)
    while i < n and (raw[i] & 0xC0) == 0x80:
        i += 1
    return i


def chunk_text(
    text: str,
    max_chars: int = DEFAULT_MAX_CHARS,
    overlap_chars: int = DEFAULT_OVERLAP,
) -> list[dict]:
    """Exact reference chunking: byte spans floored to char boundaries,
    ``overlap`` bytes of context between adjacent chunks."""
    if not text:
        return []
    raw = text.encode("utf-8")
    n = len(raw)
    max_chars = max(max_chars, 1)
    overlap_chars = min(overlap_chars, max_chars - 1)

    chunks = []
    start = 0
    ordinal = 0
    while start < n:
        raw_end = start + max_chars
        end = n if raw_end >= n else _floor_boundary(raw, raw_end)
        if end <= start:
            end = _ceil_boundary(raw, min(raw_end, n))
        if end <= start:
            break
        piece = raw[start:end].decode("utf-8")
        chunks.append(
            {
                "ordinal": ordinal,
                "byte_start": start,
                "byte_end": end,
                "text": piece,
                "token_count": count_lexical_tokens(piece),
            }
        )
        ordinal += 1
        if end == n:
            break
        next_start = _floor_boundary(raw, max(end - overlap_chars, 0))
        if next_start <= start:
            next_start = end
        start = next_start
    return chunks


def chunk_documents(
    sf_dir: str,
    max_chars: int = DEFAULT_MAX_CHARS,
    overlap_chars: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
    output_path: str | None = None,
) -> pa.Table | None:
    """Explode documents into chunk rows (the fsfs ingest shape).
    ``output_path`` streams the chunk rows to parquet (chunks >> docs)."""
    import os

    import ray.data as rd

    def explode(batch: pa.Table) -> pa.Table:
        ids, ords, starts, ends, counts = [], [], [], [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for c in chunk_text(text or "", max_chars, overlap_chars):
                ids.append(doc_id)
                ords.append(c["ordinal"])
                starts.append(c["byte_start"])
                ends.append(c["byte_end"])
                counts.append(c["token_count"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "ordinal": pa.array(ords, pa.int64()),
                "byte_start": pa.array(starts, pa.int64()),
                "byte_end": pa.array(ends, pa.int64()),
                "token_count": pa.array(counts, pa.int64()),
            }
        )

    from ._sink import finish

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[id_col, text_col]
    )
    return finish(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["doc_id", "ordinal"],
        output_path,
    )
