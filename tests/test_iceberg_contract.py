"""Iceberg seam contract (VERDICT r4 #5).

No Iceberg runtime jar ships in this sandbox, so the production seam —
``load_table("iceberg:db", ...)``, the ``.partitions`` manifest-count SQL,
the ``.snapshots`` total-records cross-check, and the TBLPROPERTIES scheme
verification (sources/io.py:33-35, sources/metadata.py:155-213) — is
exercised against a catalog STUB that replays a recorded metadata surface
through real Spark DataFrames. The stub accepts ONLY the literal SQL texts
the engine is known to issue and raises on anything else, so any drift in
the manifest-count SQL or the property checks fails these tests rather than
surfacing first on a live deployment.
"""

from __future__ import annotations

import re
from types import SimpleNamespace

import pytest

from schema_infer_plugin_spark.sources.io import load_table
from schema_infer_plugin_spark.sources.metadata import (
    BUCKET_TRANSFORM,
    iceberg_partition_counts,
    iceberg_verified_counts,
)


class IcebergCatalogStub:
    """Replays one table's recorded Iceberg metadata surface.

    ``sql()`` matches the EXACT query shapes the engine issues (anchored
    regexes over the table name) and answers with real Spark frames in the
    catalog's real result schemas:

    * ``{t}.partitions``  -> (partition struct<...>, record_count bigint)
    * ``{t}.snapshots``   -> latest-by-committed_at summary['total-records']
    * ``SHOW TBLPROPERTIES {t}`` -> (key string, value string)

    Any other SQL text raises — that IS the contract check.
    """

    def __init__(
        self,
        spark,
        table: str,
        partitions: list[tuple[dict, int]],
        snapshots: list[tuple[str, int | None]],
        props: dict[str, str],
        data=None,
    ):
        self._spark = spark
        self.table = table
        self.partitions = partitions
        self.snapshots = snapshots
        self.props = props
        self.data = data
        self.seen: list[str] = []

    # -- the spark surface the engine touches ------------------------------
    @property
    def read(self):
        def _table(name: str):
            assert name == self.table, f"unexpected read.table({name!r})"
            self.seen.append(f"read.table:{name}")
            return self.data

        return SimpleNamespace(table=_table)

    def sql(self, q: str):
        self.seen.append(q)
        t = re.escape(self.table)
        if re.fullmatch(rf"SELECT partition, record_count FROM {t}\.partitions", q):
            if not self.partitions:
                return self._spark.createDataFrame(
                    [], "partition struct<partition_key:string>, record_count bigint"
                )
            fields = sorted(self.partitions[0][0])
            struct = ", ".join(f"{f}:string" for f in fields)
            rows = [
                (tuple(str(p[f]) for f in fields), n) for p, n in self.partitions
            ]
            return self._spark.createDataFrame(
                rows, f"partition struct<{struct}>, record_count bigint"
            )
        if re.fullmatch(
            rf"SELECT summary\['total-records'\] AS t FROM {t}\.snapshots"
            rf" ORDER BY committed_at DESC LIMIT 1",
            q,
        ):
            latest = max(self.snapshots, key=lambda s: s[0]) if self.snapshots else None
            rows = [] if latest is None else [(str(latest[1]) if latest[1] is not None else None,)]
            return self._spark.createDataFrame(rows, "t string")
        if re.fullmatch(rf"SHOW TBLPROPERTIES {t}", q):
            return self._spark.createDataFrame(
                list(self.props.items()) or [("", "")], "key string, value string"
            )
        raise AssertionError(f"engine issued un-contracted SQL: {q!r}")


def _stub(spark, **kw):
    defaults = dict(
        table="db.transcripts",
        partitions=[({"partition_key": "0"}, 10), ({"partition_key": "1"}, 5)],
        snapshots=[("2026-01-01T00:00:00", 99), ("2026-02-01T00:00:00", 15)],
        props={
            "schema_infer.bucket_transform": BUCKET_TRANSFORM,
            "schema_infer.n_buckets": "4",
        },
    )
    defaults.update(kw)
    return IcebergCatalogStub(spark, **defaults)


def test_load_table_routes_iceberg_prefix(spark):
    df = spark.range(3).toDF("conv_id")
    stub = _stub(spark, table="db.events", data=df)
    out = load_table(stub, "iceberg:db", "events")
    assert out is df and stub.seen == ["read.table:db.events"]
    # parquet path untouched by the prefix routing
    real = load_table(spark, "/root/testdata/sf0.001", "events")
    assert real.count() > 0


def test_partition_counts_manifest_sql_and_crosscheck(spark):
    stub = _stub(spark)
    counts = iceberg_partition_counts(stub, "db.transcripts")
    assert counts == {"0": 10, "1": 5}
    # both metadata tables were consulted, nothing else
    assert [s for s in stub.seen if ".partitions" in s]
    assert [s for s in stub.seen if ".snapshots" in s]

    # latest snapshot disagrees with the manifest sum -> refuse to prune
    bad = _stub(spark, snapshots=[("2026-02-01T00:00:00", 14)])
    with pytest.raises(ValueError, match="refusing to prune"):
        iceberg_partition_counts(bad, "db.transcripts")

    # snapshot ordering matters: a STALE total must not pass the check just
    # because some snapshot matches — only the latest is consulted
    stale_ok = _stub(
        spark, snapshots=[("2026-01-01T00:00:00", 15), ("2026-02-01T00:00:00", 14)]
    )
    with pytest.raises(ValueError, match="refusing to prune"):
        iceberg_partition_counts(stale_ok, "db.transcripts")


def test_verified_counts_property_gates(spark):
    # declared scheme matches -> zero-filled counts over the declared range
    ok = _stub(spark)
    assert iceberg_verified_counts(ok, "db.transcripts", 4) == {
        "0": 10, "1": 5, "2": 0, "3": 0,
    }
    # SHOW TBLPROPERTIES consulted before any manifest read
    assert ok.seen[0].startswith("SHOW TBLPROPERTIES")

    # wrong transform / wrong bucket count / missing props -> None (scan all)
    wrong_t = _stub(spark, props={"schema_infer.bucket_transform": "bucket",
                                  "schema_infer.n_buckets": "4"})
    assert iceberg_verified_counts(wrong_t, "db.transcripts", 4) is None
    wrong_n = _stub(spark)
    assert iceberg_verified_counts(wrong_n, "db.transcripts", 64) is None
    bare = _stub(spark, props={})
    assert iceberg_verified_counts(bare, "db.transcripts", 4) is None

    # observed partition outside the declared range -> None, never mis-prune
    rogue = _stub(spark, partitions=[({"partition_key": "9"}, 15)])
    assert iceberg_verified_counts(rogue, "db.transcripts", 4) is None

    # transform-derived partition field (bucket(N, conv_id)) -> struct keys,
    # which can never verify against '0'..'N-1'
    transformed = _stub(spark, partitions=[({"conv_id_bucket": "0"}, 15)])
    assert iceberg_verified_counts(transformed, "db.transcripts", 4) is None

    # ANY metadata failure is lenient (validate-tables posture): None
    class Boom(IcebergCatalogStub):
        def sql(self, q):
            raise RuntimeError("catalog down")

    assert iceberg_verified_counts(
        Boom(spark, "db.t", [], [], {}), "db.t", 4
    ) is None
