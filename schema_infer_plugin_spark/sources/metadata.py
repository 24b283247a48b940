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

Pruning is only SAFE when the table's partition values were produced by the
engine's own transform (``pmod(xxhash64(conv_id), n_buckets)`` — runner
``with_partition_key``). A table partitioned by Iceberg ``bucket(N, conv_id)``
(Murmur3 per the Iceberg spec) or written with a different ``n_buckets`` also
yields integer keys 0..N-1, but they name DIFFERENT conversation sets — pruning
on them would skip live buckets and emit false PASS verdicts. Hence:

* parquet dirs carry a ``_bucket_scheme.json`` sidecar (Spark ignores
  ``_``-prefixed files) written by ``runner.write_bucketed``; the runner
  refuses to prune unless the sidecar's transform AND n_buckets match;
* Iceberg counts are unwrapped only for an IDENTITY partition on a
  precomputed ``partition_key`` column — ``bucket(...)`` specs keep their
  struct field name (e.g. ``conv_id_bucket``) so the runner's guard rejects
  them — and are cross-checked against the snapshot's total record count.
"""

from __future__ import annotations

import json
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


#: Sidecar filename recording how a bucketed parquet dir was partitioned.
#: ``_``-prefixed → Spark never reads it as data.
BUCKET_SCHEME_FILE = "_bucket_scheme.json"

#: The engine's one and only bucketing transform (runner.with_partition_key).
BUCKET_TRANSFORM = "pmod_xxhash64_conv_id"


def write_bucket_scheme(path: str, n_buckets: int) -> None:
    """Persist the bucketing scheme next to the data so future runs can VERIFY
    (not assume) that partition values align with their own transform."""
    with open(os.path.join(path, BUCKET_SCHEME_FILE), "w") as f:
        json.dump({"transform": BUCKET_TRANSFORM, "n_buckets": int(n_buckets)}, f)


def read_bucket_scheme(path: str) -> dict | None:
    """The persisted scheme, or None (absent/unreadable → never prune)."""
    try:
        with open(os.path.join(path, BUCKET_SCHEME_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def verified_partition_counts(path: str, n_buckets: int) -> dict[str, int] | None:
    """Footer row counts of a bucketed parquet dir, ONLY if its persisted
    scheme matches (same transform, same ``n_buckets``). A dir without a
    sidecar, or bucketed differently (e.g. fewer buckets, or an external
    tool's hash), returns None — the caller scans everything rather than
    pruning live buckets. Absent partitions are filled with explicit 0s:
    under a verified scheme, absence in the listing IS emptiness."""
    scheme = read_bucket_scheme(path)
    if (
        scheme is None
        or scheme.get("transform") != BUCKET_TRANSFORM
        or int(scheme.get("n_buckets", -1)) != int(n_buckets)
    ):
        return None
    counts = partition_row_counts(path)
    return {str(i): counts.get(str(i), 0) for i in range(n_buckets)}


def _shape_iceberg_partition_rows(rows, identity_col: str = "partition_key") -> dict[str, int]:
    """Shape ``{table}.partitions`` rows into {bucket_key: record_count}.

    Only a single-field partition struct whose field is the IDENTITY column
    ``identity_col`` is unwrapped to the bare value. Transform-derived fields
    (Iceberg names them ``conv_id_bucket``, ``ts_day``, …) and multi-field
    specs keep their struct repr — those keys can never match the runner's
    string bucket ids, so its guard disables pruning instead of mis-pruning
    on a Murmur3 ``bucket(N, conv_id)`` that LOOKS like 0..N-1."""
    out: dict[str, int] = {}
    for r in rows:
        part = r["partition"]
        if hasattr(part, "asDict"):
            d = part.asDict()
            if len(d) == 1 and next(iter(d)) == identity_col:
                key = str(next(iter(d.values())))
            else:
                key = str(part)
        else:
            key = str(part)
        out[key] = out.get(key, 0) + int(r["record_count"])
    return out


def iceberg_partition_counts(
    spark, table: str, identity_col: str = "partition_key"
) -> dict[str, int]:
    """Manifest-only per-partition record counts of an Iceberg table — the
    production twin of ``partition_row_counts`` (reads the ``.partitions``
    metadata table; no data files are opened). Requires an Iceberg catalog on
    the session; in-sandbox none is attached, so this path is exercised only
    on deployments.

    Safety: only identity partitions on ``identity_col`` are usable for
    pruning (see ``_shape_iceberg_partition_rows``), and the shaped counts are
    cross-checked against the current snapshot's ``total-records`` — any
    mismatch (concurrent write, spec confusion) raises rather than letting a
    stale count prune a live bucket."""
    rows = spark.sql(
        f"SELECT partition, record_count FROM {table}.partitions"
    ).collect()
    out = _shape_iceberg_partition_rows(rows, identity_col)
    total = spark.sql(
        f"SELECT summary['total-records'] AS t FROM {table}.snapshots"
        " ORDER BY committed_at DESC LIMIT 1"
    ).collect()
    if total and total[0]["t"] is not None and sum(out.values()) != int(total[0]["t"]):
        raise ValueError(
            f"iceberg partition counts ({sum(out.values())}) != snapshot"
            f" total-records ({total[0]['t']}) for {table} — refusing to prune"
        )
    return out


def iceberg_verified_counts(spark, table: str, n_buckets: int) -> dict[str, int] | None:
    """``iceberg_partition_counts`` gated on the table's own declaration of the
    bucketing scheme: the deployment that writes the table sets

        ALTER TABLE t SET TBLPROPERTIES(
          'schema_infer.bucket_transform'='pmod_xxhash64_conv_id',
          'schema_infer.n_buckets'='64')

    (the Iceberg twin of the parquet sidecar). Without matching properties —
    or with any metadata error — returns None and the caller scans everything.
    Absent buckets are filled with explicit 0s: under a verified scheme,
    absence from ``.partitions`` IS emptiness."""
    try:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        }
        if props.get("schema_infer.bucket_transform") != BUCKET_TRANSFORM:
            return None
        if int(props.get("schema_infer.n_buckets", -1)) != int(n_buckets):
            return None
        counts = iceberg_partition_counts(spark, table)
    except Exception:
        return None
    if not set(counts) <= {str(i) for i in range(n_buckets)}:
        return None  # declared scheme contradicts observed partition values
    return {str(i): counts.get(str(i), 0) for i in range(n_buckets)}


def prune_empty_tables(sf_dir: str, names: tuple[str, ...]) -> tuple[list[str], list[str]]:
    """Split table names into (nonempty, empty-or-missing) using footer
    metadata only — the reference's empty-topic skip, one Spark job saved per
    pruned table."""
    nonempty, empty = [], []
    for n in names:
        (nonempty if table_row_count(os.path.join(sf_dir, f"{n}.parquet")) > 0 else empty).append(n)
    return nonempty, empty
