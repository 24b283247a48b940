"""Metadata-only emptiness and row-count probes (SURVEY.md §2 S7/A9).

The reference prunes empty topics before consuming a single message by
comparing beginning/end watermarks (/root/reference/schema_infer/plugin/
optimistic.py:387-510). The Spark-engine equivalents, cheapest first:

* plain parquet file/dir: **footer metadata only** via pyarrow — ``num_rows``
  is read from each file's footer, pure driver-side file IO, NO Spark job is
  scheduled and no data page is touched;
* hive-partitioned dir (``partition_key=N/`` subdirs): per-partition counts
  from the same footers — the sandbox stand-in for a bucket-partitioned table;
* Iceberg (production): the identical question is answered from manifests —
  ``SELECT partition, record_count FROM {table}.partitions`` (or
  ``snapshot.summary['total-records']`` for the whole table); wired through
  ``iceberg_partition_counts`` so the runner's pruning path is the same
  function shape either way.
"""

from __future__ import annotations

import os

_PARQUET_SUFFIX = ".parquet"


def _footer_rows(file_path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(file_path).metadata.num_rows


def parquet_file_rows(path: str) -> list[tuple[str, int]]:
    """(file, footer num_rows) for every parquet data file under ``path``
    (a single file or a directory tree). Driver-side metadata reads only."""
    if os.path.isfile(path):
        return [(path, _footer_rows(path))]
    out: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith(_PARQUET_SUFFIX) and not fn.startswith(("_", ".")):
                fp = os.path.join(root, fn)
                out.append((fp, _footer_rows(fp)))
    return out


def table_row_count(path: str) -> int:
    """Total rows from footers; 0 for a missing path (missing table == empty
    table for scheduling purposes — discovery reports missing separately)."""
    if not os.path.exists(path):
        return 0
    return sum(n for _, n in parquet_file_rows(path))


def table_is_empty(path: str) -> bool:
    return table_row_count(path) == 0


def partition_row_counts(path: str, partition_col: str = "partition_key") -> dict[str, int]:
    """Per-partition footer row counts of a hive-partitioned parquet dir
    (``{path}/{partition_col}=<value>/...``). Missing partitions are simply
    absent from the result — callers treat absent as 0."""
    counts: dict[str, int] = {}
    if not os.path.isdir(path):
        return counts
    prefix = f"{partition_col}="
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if entry.startswith(prefix) and os.path.isdir(full):
            counts[entry[len(prefix):]] = sum(n for _, n in parquet_file_rows(full))
    return counts


def iceberg_partition_counts(spark, table: str) -> dict[str, int]:
    """Manifest-only per-partition record counts of an Iceberg table — the
    production twin of ``partition_row_counts`` (reads the ``.partitions``
    metadata table; no data files are opened). Requires an Iceberg catalog on
    the session; in-sandbox none is attached, so this path is exercised only
    on deployments."""
    rows = spark.sql(
        f"SELECT partition, record_count FROM {table}.partitions"
    ).collect()
    out: dict[str, int] = {}
    for r in rows:
        part = r["partition"]
        # single-transform specs (e.g. bucket(N, conv_id)) come back as a
        # one-field struct — unwrap to the bare value so keys line up with the
        # runner's string bucket ids; multi-field specs keep the struct repr
        # (the runner's key-subset guard then disables pruning rather than
        # mis-pruning)
        if hasattr(part, "asDict"):
            vals = list(part.asDict().values())
            key = str(vals[0]) if len(vals) == 1 else str(part)
        else:
            key = str(part)
        out[key] = out.get(key, 0) + int(r["record_count"])
    return out


def prune_empty_tables(sf_dir: str, names: tuple[str, ...]) -> tuple[list[str], list[str]]:
    """Split table names into (nonempty, empty-or-missing) using footer
    metadata only — the reference's empty-topic skip, one Spark job saved per
    pruned table."""
    nonempty, empty = [], []
    for n in names:
        (nonempty if table_row_count(os.path.join(sf_dir, f"{n}.parquet")) > 0 else empty).append(n)
    return nonempty, empty
