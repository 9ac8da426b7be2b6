"""Distributed inverted-index build: the flagship Ray Data pipeline.

    plan partitions (parquet footers only, driver-side)
      └─ from_items(partitions)
      └─ map_batches(tokenize partition)   [stateless tasks]
           · reads its row groups (column-pruned), extracts text from HTML,
             tokenizes via Arrow kernels, writes per-partition checkpoint
             artifacts (postings/doclen/idmap/df parquet + stats json)
           · returns tiny (field, term, df) partials
      └─ groupby(field, term).sum(df)      [small shuffle over partials]
           → salted head-term set (df >= salt_threshold), manifest-recorded
      └─ read_parquet(postings checkpoints)
      └─ map_batches(assign bucket+shard)  [stateless; broadcast salted set]
      └─ groupby(shard).map_groups(encode) [THE posting shuffle]
           → compressed term-partitioned shard parquets
      └─ manifest.json (lineage, stats, salt routing, metrics) written last

Resume: a partition whose four checkpoint artifacts exist is skipped
(lineage in the manifest); retries are safe because every stage is
deterministic per partition (same inputs -> same bytes).

Scale notes: docids are ``(partition << 32) | row`` leases so no global
allocator exists (Q1 discipline, ``scribe.rs:77-82``); the df-partials
aggregation is a combiner-style pre-aggregation so the only full-data
shuffle is the posting groupby; head terms are salted into docid-range
buckets to bound per-group skew (SURVEY §7.4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .stages.encode import encode_shard_table, write_shard
from .stages.shard import assign_shards
from .stages.tokenize import df_partials, tokenize_partition

MANIFEST_NAME = "manifest.json"


@dataclass
class BuildConfig:
    id_col: str = "url"
    content_col: str | None = None
    html_col: str | None = "html"
    verify_text_col: str | None = "text"
    num_shards: int = 8
    salt_threshold: int = 50_000  # global df above which a term is salted
    salt_buckets: int = 32
    target_partition_rows: int = 250_000
    input_columns: list[str] = field(default_factory=list)

    def needed_columns(self) -> list[str]:
        cols = [self.id_col]
        if self.html_col:
            cols.append(self.html_col)
            if self.verify_text_col:
                cols.append(self.verify_text_col)
        if self.content_col:
            cols.append(self.content_col)
        return sorted(set(cols))


def plan_partitions(paths: list[str], target_rows: int) -> list[dict]:
    """Pack contiguous row groups of each file into docid-lease partitions.

    Footer-only reads; partition indices are assigned in (path, row-group)
    order so the build is deterministic and each partition owns the docid
    range ``[p << 32, p << 32 + rows)``.
    """
    parts: list[dict] = []
    pindex = 0
    for path in sorted(paths):
        meta = pq.ParquetFile(path).metadata
        rg_rows = [meta.row_group(i).num_rows for i in range(meta.num_row_groups)]
        start = 0
        while start < len(rg_rows):
            end = start
            rows = 0
            while end < len(rg_rows) and (rows == 0 or rows + rg_rows[end] <= target_rows):
                rows += rg_rows[end]
                end += 1
            parts.append(
                {
                    "pindex": pindex,
                    "path": path,
                    "rg_start": start,
                    "rg_end": end,
                    "rows": rows,
                }
            )
            pindex += 1
            start = end
    return parts


def _part_paths(index_dir: str, pindex: int) -> dict[str, str]:
    p = f"part-{pindex:05d}"
    return {
        "postings": os.path.join(index_dir, "postings", f"{p}.parquet"),
        "doclen": os.path.join(index_dir, "doclen", f"{p}.parquet"),
        "idmap": os.path.join(index_dir, "idmap", f"{p}.parquet"),
        "df": os.path.join(index_dir, "df", f"{p}.parquet"),
        "stats": os.path.join(index_dir, "stats", f"{p}.json"),
    }


def _atomic_write_table(table: pa.Table, path: str, **kwargs) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, path)


def _atomic_write_json(obj, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class PhaseATokenizer:
    """Stateless per-partition tokenize-and-checkpoint task body."""

    def __init__(self, index_dir: str, cfg: BuildConfig):
        self.index_dir = index_dir
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_tables = []
        for row in batch.to_pylist():
            out_tables.append(self._one(row))
        return pa.concat_tables(out_tables)

    def _one(self, part: dict) -> pa.Table:
        paths = _part_paths(self.index_dir, part["pindex"])
        if all(os.path.exists(p) for p in paths.values()):
            return pq.read_table(paths["df"])  # resume: reuse checkpoint

    # deterministic rebuild of this partition (also the retry path)
        cfg = self.cfg
        pf = pq.ParquetFile(part["path"])
        table = pf.read_row_groups(
            list(range(part["rg_start"], part["rg_end"])),
            columns=cfg.needed_columns(),
        )
        result = tokenize_partition(
            table,
            part["pindex"],
            id_col=cfg.id_col,
            content_col=cfg.content_col,
            html_col=cfg.html_col,
            verify_text_col=cfg.verify_text_col,
        )
        dfp = df_partials(result["postings"], part["pindex"])
        _atomic_write_table(
            result["postings"], paths["postings"], compression="zstd"
        )
        _atomic_write_table(result["doclen"], paths["doclen"])
        _atomic_write_table(result["idmap"], paths["idmap"])
        _atomic_write_table(dfp, paths["df"])
        _atomic_write_json(result["stats"], paths["stats"])
        return dfp


def _compute_salted(df_ds, salt_threshold: int) -> list[tuple[int, str]]:
    """Global df rollup over the per-partition partials -> head-term set."""
    from ray.data.aggregate import Sum

    agg = df_ds.groupby(["field", "term"]).aggregate(
        Sum("df", alias_name="df_sum")
    )
    head = agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df_sum"], salt_threshold)),
        batch_format="pyarrow",
    )
    rows = head.take_all()
    return sorted((int(r["field"]), str(r["term"])) for r in rows)


class _ShardAssigner:
    def __init__(self, num_shards, salted_ref, partitions_per_bucket):
        self.num_shards = num_shards
        self.salted_ref = salted_ref
        self.ppb = partitions_per_bucket
        self._salted = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._salted is None:
            salted = (
                ray.get(self.salted_ref)
                if not isinstance(self.salted_ref, (set, list))
                else self.salted_ref
            )
            self._salted = {(int(f), t) for f, t in salted}
        return assign_shards(
            batch,
            num_shards=self.num_shards,
            salted=self._salted,
            partitions_per_bucket=self.ppb,
        )


_SHARD_SUMMARY_SCHEMA = pa.schema(
    [
        ("index", pa.int64()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("postings_bytes", pa.int64()),
    ]
)


def _encode_shard_group(group: pa.Table, shards_dir: str) -> pa.Table:
    if len(group) == 0:
        return _SHARD_SUMMARY_SCHEMA.empty_table()
    shard_id = int(group["shard"][0].as_py())
    encoded = encode_shard_table(group)
    row = write_shard(encoded, shards_dir, shard_id)
    return pa.table(
        {k: [row[k]] for k in _SHARD_SUMMARY_SCHEMA.names},
        schema=_SHARD_SUMMARY_SCHEMA,
    )


def build_index(
    paths: list[str],
    index_dir: str,
    cfg: BuildConfig | None = None,
    *,
    resume: bool = True,
) -> dict:
    """Run the full build; returns the manifest dict (also written to disk).

    Ray must already be initialised by the caller (driver contract)."""
    import ray
    import ray.data as rd

    cfg = cfg or BuildConfig()
    t0 = time.time()
    os.makedirs(index_dir, exist_ok=True)
    if not resume:
        import shutil

        for sub in ("postings", "doclen", "idmap", "df", "stats", "shards"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)

    parts = plan_partitions(paths, cfg.target_partition_rows)
    n_parts = len(parts)
    ppb = max(1, -(-n_parts // cfg.salt_buckets))  # ceil
    items_ds = rd.from_items(parts)

    df_ds = items_ds.map_batches(
        PhaseATokenizer(index_dir, cfg),
        batch_size=1,
        batch_format="pyarrow",
    )
    # materialize the (small) df partials once: feeds both the salting
    # decision and nothing else; postings stay on disk as checkpoints
    df_ds = df_ds.materialize()
    salted = _compute_salted(df_ds, cfg.salt_threshold)
    t_phase_a = time.time()

    salted_ref = ray.put(salted)
    posts = rd.read_parquet(os.path.join(index_dir, "postings"))
    posts = posts.map_batches(
        _ShardAssigner(cfg.num_shards, salted_ref, ppb),
        batch_format="pyarrow",
    )
    from functools import partial

    shard_rows = (
        posts.groupby("shard")
        .map_groups(
            partial(
                _encode_shard_group,
                shards_dir=os.path.join(index_dir, "shards"),
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    t_phase_b = time.time()

    # stats rollup from the per-partition stats jsons (driver-side, tiny)
    field_stats = {
        "content": {"doc_count": 0, "total_tokens": 0},
        "title": {"doc_count": 0, "total_tokens": 0},
    }
    total_postings = 0
    part_entries = []
    for part in parts:
        spath = _part_paths(index_dir, part["pindex"])["stats"]
        with open(spath) as f:
            s = json.load(f)
        for fname in ("content", "title"):
            field_stats[fname]["doc_count"] += s[fname]["doc_count"]
            field_stats[fname]["total_tokens"] += s[fname]["total_tokens"]
        total_postings += s["postings_rows"]
        part_entries.append(
            {
                "index": part["pindex"],
                "rows": part["rows"],
                "docid_base": part["pindex"] << 32,
                "source": {
                    "path": part["path"],
                    "rg_start": part["rg_start"],
                    "rg_end": part["rg_end"],
                },
                "status": "done",
            }
        )

    n_docs = field_stats["content"]["doc_count"]
    elapsed = time.time() - t0
    shard_entries = sorted(
        (r for r in shard_rows if "index" in r and r["index"] is not None),
        key=lambda r: r["index"],
    )
    manifest = {
        "format_version": 1,
        "engine": "frankensearch-ray",
        "config": asdict(cfg),
        "num_shards": cfg.num_shards,
        "salt": {
            "threshold": cfg.salt_threshold,
            "buckets": cfg.salt_buckets,
            "partitions_per_bucket": ppb,
            "salted_terms": [[f, t] for f, t in salted],
        },
        "partitions": part_entries,
        "field_stats": field_stats,
        "shards": [dict(r) for r in shard_entries],
        "metrics": {
            "docs": n_docs,
            "postings": total_postings,
            "elapsed_sec": elapsed,
            "phase_a_sec": t_phase_a - t0,
            "phase_b_sec": t_phase_b - t_phase_a,
            "docs_per_sec": n_docs / elapsed if elapsed else None,
            "postings_per_sec": total_postings / elapsed if elapsed else None,
            "compressed_bytes_per_shard": [
                r.get("postings_bytes") for r in shard_entries
            ],
        },
    }
    _atomic_write_json(manifest, os.path.join(index_dir, MANIFEST_NAME))
    return manifest


def load_manifest(index_dir: str) -> dict:
    with open(Path(index_dir) / MANIFEST_NAME) as f:
        return json.load(f)
