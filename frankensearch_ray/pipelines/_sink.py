"""Shared sink-or-table tail for operators with corpus-proportional
output.

The driver contract returns small tables at test scale, but at 100 TB a
per-doc / per-event result IS a dataset: materializing it through
``to_pandas()`` on the driver is the anti-pattern every operator here
otherwise avoids.  ``finish`` gives each operator an ``output_path``
escape hatch that streams the result Dataset to partitioned parquet
(resumable, never driver-resident) while the table path keeps the
deterministic sort the oracle comparison relies on.
"""

from __future__ import annotations

import pyarrow as pa


def finish(
    ds,
    sort_cols: list[str],
    output_path: str | None = None,
    partition_cols: list[str] | None = None,
) -> pa.Table | None:
    """Stream ``ds`` to parquet when ``output_path`` is given, else
    return it as a deterministically-sorted arrow table (test scale).
    ``partition_cols`` hive-partitions the sink (one directory per
    value) so downstream readers prune at the directory level."""
    if output_path is not None:
        if partition_cols:
            ds.write_parquet(output_path, partition_cols=list(partition_cols))
        else:
            ds.write_parquet(output_path)
        return None
    out = ds.to_pandas()
    # an all-empty Dataset loses its schema through to_pandas — nothing
    # to sort then, and the caller only sees a 0-row table
    cols = [c for c in sort_cols if c in out.columns]
    if cols:
        out = out.sort_values(cols).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
