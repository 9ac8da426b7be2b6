"""Row-format ingestion: JSONL / CSV corpora staged to parquet.

The FSLX build plans docid-lease partitions from parquet row-group
footers (``build.py:plan_partitions``), so non-parquet corpora are
STAGED first: every input file converts independently in one Ray task
— batches stream through a ``ParquetWriter`` with a fixed row-group
size, so a multi-GB shard never materializes whole — and produces
exactly one parquet file.  Row order inside a file is preserved and
files map 1:1, so the staging (and therefore docid leases and the
built index) is deterministic and resumable: already-staged outputs
newer than their source are skipped.

At 100 TB the unit of parallelism is the input file (a crawl shard),
which is exactly how the corpus arrives; no exchange anywhere.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_ROW_GROUP = 2_000
# ~8 MB of JSONL text per parse chunk: bounded worker heap regardless of
# input file size
JSONL_CHUNK_BYTES = 8 << 20


def _write_batches(batches, out_path: str, row_group_size: int) -> int:
    """Stream arrow batches into one parquet file (atomic rename)."""
    tmp = out_path + ".tmp"
    writer = None
    rows = 0
    try:
        for b in batches:
            if b.num_rows == 0:
                continue
            t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            if writer is None:
                writer = pq.ParquetWriter(tmp, t.schema)
            else:
                t = t.cast(writer.schema)
            writer.write_table(t, row_group_size=row_group_size)
            rows += t.num_rows
        if writer is None:
            # empty input still yields a (schema-less) empty file marker
            writer = pq.ParquetWriter(tmp, pa.schema([]))
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, out_path)
    return rows


def _open_maybe_gz(path: str):
    """Binary stream over a possibly gzip-compressed source file —
    crawls arrive as ``.jsonl.gz`` / ``.csv.gz`` shards, and gzip
    decompression streams, so the bounded-chunk memory contract holds
    for compressed inputs too."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rb")
    return open(path, "rb")


def _jsonl_batches(path: str, columns: list[str] | None):
    """Parse a JSONL file in bounded chunks, pinning the schema to the
    first chunk so later sparse chunks can't drift."""
    import io

    import pyarrow.json as pj

    schema = None
    with _open_maybe_gz(path) as f:
        buf: list[bytes] = []
        size = 0
        for line in f:
            if not line.strip():
                continue
            buf.append(line)
            size += len(line)
            if size >= JSONL_CHUNK_BYTES:
                t, schema = _parse_jsonl_chunk(pj, io, buf, schema, columns)
                yield t
                buf, size = [], 0
        if buf:
            t, _schema = _parse_jsonl_chunk(pj, io, buf, schema, columns)
            yield t


def _parse_jsonl_chunk(pj, io, lines: list[bytes], schema, columns):
    opts = (
        pj.ParseOptions(explicit_schema=schema)
        if schema is not None
        else pj.ParseOptions()
    )
    t = pj.read_json(io.BytesIO(b"".join(lines)), parse_options=opts)
    if columns is not None:
        t = t.select(columns)
    return t, (schema if schema is not None else t.schema)


def _csv_batches(path: str, columns: list[str] | None):
    import pyarrow.csv as pcsv

    opts = (
        pcsv.ConvertOptions(include_columns=columns)
        if columns is not None
        else None
    )
    with _open_maybe_gz(path) as f:
        with pcsv.open_csv(f, convert_options=opts) as reader:
            for batch in reader:
                yield batch


def convert_file(
    src: str,
    out_path: str,
    fmt: str,
    columns: list[str] | None = None,
    row_group_size: int = DEFAULT_ROW_GROUP,
) -> int:
    """Convert ONE jsonl/csv file to ONE parquet file, streaming."""
    if fmt == "jsonl":
        batches = _jsonl_batches(src, columns)
    elif fmt == "csv":
        batches = _csv_batches(src, columns)
    else:
        raise ValueError(f"unknown ingest format {fmt!r} (jsonl|csv)")
    return _write_batches(batches, out_path, row_group_size)


def stage_to_parquet(
    paths: list[str],
    out_dir: str,
    fmt: str = "jsonl",
    columns: list[str] | None = None,
    row_group_size: int = DEFAULT_ROW_GROUP,
) -> list[str]:
    """Stage jsonl/csv files to parquet, one Ray task per file.

    Returns the staged parquet paths in sorted-input order (the order
    ``plan_partitions`` will see).  Outputs newer than their sources are
    reused, so a crashed staging run resumes where it stopped."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    jobs: list[tuple[str, str]] = []
    outs: list[str] = []
    for src in sorted(paths):
        out = os.path.join(out_dir, Path(src).stem + ".parquet")
        outs.append(out)
        if (
            os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)
        ):
            continue
        jobs.append((src, out))
    if jobs:
        fn = ray.remote(num_cpus=1)(convert_file)
        ray.get(
            [
                fn.remote(src, out, fmt, columns, row_group_size)
                for src, out in jobs
            ]
        )
    return outs
