"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship validation pass on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.

Correctness spine: ``sources/views.py`` defines ONE SQL text that derives a
violation-injected transcripts table from the driver's ``events`` table; Spark
executes it via temp view, DuckDB executes the identical text — so every
constraint check is verified end-to-end against an independent engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from schema_infer_plugin_spark.checks import (
    contiguity_violations,
    domain_violations,
    drift_stats,
    histogram,
    null_violations,
    uniqueness_violations,
)
from schema_infer_plugin_spark.checks.domains import tool_requires_role_violations
from schema_infer_plugin_spark.operators.profile import profile, type_profile
from schema_infer_plugin_spark.operators.violations import union_violations
from schema_infer_plugin_spark.schema import ROLE_DOMAIN, TOOL_DOMAIN
from schema_infer_plugin_spark.sources.io import load_table
from schema_infer_plugin_spark.sources.views import oracle_cte, transcripts_from_events

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(spark, load_table(spark, sf_dir, "events"))


def _viol(df: DataFrame) -> DataFrame:
    """Project check output to oracle-friendly column names ('column' is a
    reserved word in DuckDB)."""
    return df.withColumnRenamed("column", "col_name")


_INT_RE = "^[+-]?[0-9]+$"


def _duck_type_profile_sql(source_sql: str, cols: list[str]) -> str:
    """DuckDB SQL reproducing operators/profile.type_profile for ``cols`` of
    ``source_sql`` — the reference type ladder (bool→int→float→string),
    plurality + 0.8-union rule, nullable/required thresholds."""
    parts = []
    for c in cols:
        v = c
        t = (
            f"CASE WHEN {v} IS NULL THEN 'null' "
            f"WHEN lower({v}) IN ('true','false') THEN 'boolean' "
            f"WHEN regexp_matches({v}, '{_INT_RE}') THEN 'int' "
            f"WHEN TRY_CAST({v} AS DOUBLE) IS NOT NULL THEN 'float' "
            f"ELSE 'string' END"
        )
        parts.append(
            f"""
SELECT '{c}' AS col_name, inferred_type, CAST(round(confidence, 6) AS DOUBLE) AS confidence,
       nullable, required, cnt_boolean, cnt_int, cnt_float, cnt_string, total_count, null_count
FROM (
  SELECT
    CASE WHEN total_count - null_count = 0 THEN 'string'
         WHEN CAST(mx AS DOUBLE) / (total_count - null_count) < 0.8 AND n_types > 1 THEN 'union'
         WHEN cnt_boolean = mx THEN 'boolean' WHEN cnt_int = mx THEN 'int'
         WHEN cnt_float = mx THEN 'float' ELSE 'string' END AS inferred_type,
    CASE WHEN total_count - null_count = 0 THEN NULL
         ELSE CAST(mx AS DOUBLE) / (total_count - null_count) END AS confidence,
    null_count > 0 AS nullable,
    (null_count = 0 OR CAST(null_count AS DOUBLE) / total_count < 0.1) AS required,
    cnt_boolean, cnt_int, cnt_float, cnt_string, total_count, null_count
  FROM (
    SELECT *, greatest(cnt_boolean, cnt_int, cnt_float, cnt_string) AS mx,
           (CASE WHEN cnt_boolean > 0 THEN 1 ELSE 0 END + CASE WHEN cnt_int > 0 THEN 1 ELSE 0 END
            + CASE WHEN cnt_float > 0 THEN 1 ELSE 0 END + CASE WHEN cnt_string > 0 THEN 1 ELSE 0 END) AS n_types
    FROM (
      SELECT
        CAST(sum(CASE WHEN typ = 'boolean' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_boolean,
        CAST(sum(CASE WHEN typ = 'int' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_int,
        CAST(sum(CASE WHEN typ = 'float' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_float,
        CAST(sum(CASE WHEN typ = 'string' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_string,
        CAST(count(*) AS BIGINT) AS total_count,
        CAST(sum(CASE WHEN typ = 'null' THEN 1 ELSE 0 END) AS BIGINT) AS null_count
      FROM (SELECT {t} AS typ FROM ({source_sql}))
    )
  )
)"""
        )
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# transcripts constraint checks (engine vs identical-CTE oracle)
# ---------------------------------------------------------------------------


def q_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(uniqueness_violations(_transcripts(spark, sf_dir)))


ORACLE_UNIQUENESS = oracle_cte(
    """
SELECT 'uniqueness' AS check_name, conv_id, turn_idx, 'conv_id,turn_idx' AS col_name,
       CAST(count(*) AS STRING) AS observed, '1' AS expected
FROM transcripts GROUP BY conv_id, turn_idx HAVING count(*) > 1
"""
)


def q_contiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(contiguity_violations(_transcripts(spark, sf_dir)))


ORACLE_CONTIGUITY = oracle_cte(
    """
, idx AS (SELECT DISTINCT conv_id, turn_idx FROM transcripts),
lagged AS (
  SELECT conv_id, turn_idx,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx
  FROM idx)
SELECT 'contiguity' AS check_name, conv_id, turn_idx, 'turn_idx' AS col_name,
       CAST(turn_idx AS STRING) AS observed, CAST(prev_idx + 1 AS STRING) AS expected
FROM lagged WHERE prev_idx IS NOT NULL AND turn_idx != prev_idx + 1
UNION ALL
SELECT 'contiguity_start', conv_id, turn_idx, 'turn_idx',
       CAST(turn_idx AS STRING), '0'
FROM lagged WHERE prev_idx IS NULL AND turn_idx != 0
"""
)


def q_role_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(domain_violations(_transcripts(spark, sf_dir), "role", ROLE_DOMAIN))


ORACLE_ROLE_DOMAIN = oracle_cte(
    f"""
SELECT 'domain_role' AS check_name, conv_id, turn_idx, 'role' AS col_name,
       role AS observed, '{",".join(ROLE_DOMAIN)}' AS expected
FROM transcripts WHERE role IS NOT NULL AND role NOT IN ({",".join(repr(r) for r in ROLE_DOMAIN)})
"""
)


def q_tool_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(domain_violations(_transcripts(spark, sf_dir), "tool", TOOL_DOMAIN))


ORACLE_TOOL_DOMAIN = oracle_cte(
    f"""
SELECT 'domain_tool' AS check_name, conv_id, turn_idx, 'tool' AS col_name,
       tool AS observed, '{",".join(TOOL_DOMAIN)}' AS expected
FROM transcripts WHERE tool IS NOT NULL AND tool NOT IN ({",".join(repr(t) for t in TOOL_DOMAIN)})
"""
)


def q_tool_without_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(tool_requires_role_violations(_transcripts(spark, sf_dir)))


ORACLE_TOOL_WITHOUT_ROLE = oracle_cte(
    """
SELECT 'tool_without_role' AS check_name, conv_id, turn_idx, 'tool' AS col_name,
       tool AS observed, 'NULL unless role=tool' AS expected
FROM transcripts WHERE tool IS NOT NULL AND coalesce(role, '') != 'tool'
"""
)


def q_null_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _viol(null_violations(_transcripts(spark, sf_dir), "text"))


ORACLE_NULL_TEXT = oracle_cte(
    """
SELECT 'not_null_text' AS check_name, conv_id, turn_idx, 'text' AS col_name,
       'NULL' AS observed, 'NOT NULL' AS expected
FROM transcripts WHERE text IS NULL
"""
)


# ---------------------------------------------------------------------------
# profiling (Pass A)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["conv_id", "turn_idx", "role", "text", "tool"]


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = profile(_transcripts(spark, sf_dir), columns=_PROFILE_COLS, approx_distinct=False)
    return p.select(
        F.col("column").alias("col_name"),
        "total_count",
        "null_count",
        F.round("null_rate", 6).cast("double").alias("null_rate"),
        F.col("distinct_approx").alias("distinct_ct"),
        "min_val",
        "max_val",
    )


ORACLE_PROFILE = oracle_cte(
    " UNION ALL ".join(
        f"""
SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS total_count,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(round(CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS DOUBLE) AS null_rate,
       CAST(count(DISTINCT {c}) AS BIGINT) AS distinct_ct,
       CAST(min({c}) AS STRING) AS min_val, CAST(max({c}) AS STRING) AS max_val
FROM transcripts"""
        for c in _PROFILE_COLS
    )
)


def q_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference type-ladder over a derived table with every type + edge cases:
    exact-0.8 confidence boundary and exact-0.1 null-ratio boundary."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("events")
    derived = spark.sql(_TYPE_LADDER_SOURCE_SQL)
    return type_profile(derived, columns=_TYPE_LADDER_COLS).withColumnRenamed(
        "column", "col_name"
    )


_TYPE_LADDER_SOURCE_SQL = """
SELECT
  CAST(user_id AS STRING) AS s_int,
  CAST(event_id % 100 AS STRING) || '.5' AS s_float,
  event_type AS s_str,
  CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'FALSE' END AS s_bool,
  CASE WHEN event_id % 4 = 0 THEN 'abc' ELSE CAST(event_id AS STRING) END AS s_mixed,
  CASE WHEN event_id % 10 = 0 THEN NULL ELSE CAST(event_id % 7 AS STRING) END AS s_nullable,
  CASE WHEN event_id % 2 = 0 THEN 'x' ELSE CAST(event_id AS STRING) END AS s_union
FROM events
"""
_TYPE_LADDER_COLS = ["s_int", "s_float", "s_str", "s_bool", "s_mixed", "s_nullable", "s_union"]

ORACLE_TYPE_PROFILE = _duck_type_profile_sql(_TYPE_LADDER_SOURCE_SQL, _TYPE_LADDER_COLS)


def q_drift_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-distribution drift: first half of users (baseline) vs second half."""
    t = _transcripts(spark, sf_dir).withColumn(
        "half", F.when(F.col("conv_id") < "conv_000075", "base").otherwise("cur")
    )
    base = histogram(t.filter("half = 'base'"), "role")
    cur = histogram(t.filter("half = 'cur'"), "role")
    d = drift_stats(cur, base)
    return d.select(
        "bucket",
        F.round("freq_base", 6).cast("double").alias("freq_base"),
        F.round("freq_cur", 6).cast("double").alias("freq_cur"),
        F.round("psi_term", 6).cast("double").alias("psi_term"),
        F.round("kl_term", 6).cast("double").alias("kl_term"),
    )


ORACLE_DRIFT_ROLE = oracle_cte(
    """
SELECT bucket,
       CAST(round(freq_base, 6) AS DOUBLE) AS freq_base,
       CAST(round(freq_cur, 6) AS DOUBLE) AS freq_cur,
       CAST(round((freq_cur - freq_base) * ln((freq_cur + 1e-6) / (freq_base + 1e-6)), 6) AS DOUBLE) AS psi_term,
       CAST(round(freq_cur * ln((freq_cur + 1e-6) / (freq_base + 1e-6)), 6) AS DOUBLE) AS kl_term
FROM (
  SELECT coalesce(b.bucket, c.bucket) AS bucket,
         coalesce(b.freq, 0.0) AS freq_base, coalesce(c.freq, 0.0) AS freq_cur
  FROM (
    SELECT coalesce(role, '<null>') AS bucket,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS freq
    FROM transcripts WHERE conv_id < 'conv_000075' GROUP BY 1
  ) b
  FULL OUTER JOIN (
    SELECT coalesce(role, '<null>') AS bucket,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS freq
    FROM transcripts WHERE conv_id >= 'conv_000075' GROUP BY 1
  ) c ON b.bucket = c.bucket
)
"""
)


# ---------------------------------------------------------------------------
# relational headline queries (TPC-H-style; scan→agg→join→sort coverage + bench)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty_raw"),
            F.sum("l_extendedprice").alias("sum_base_raw"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_raw"),
            F.avg("l_quantity").alias("avg_qty_raw"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("sum_qty_raw", 2).alias("sum_qty"),
            F.round("sum_base_raw", 2).alias("sum_base_price"),
            F.round("sum_disc_raw", 2).alias("sum_disc_price"),
            F.round("avg_qty_raw", 4).alias("avg_qty"),
            "count_order",
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (revenue rounded, orderkey tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .select("o_orderkey", "o_orderstatus", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, o_orderstatus, revenue FROM (
  SELECT o.o_orderkey, o.o_orderstatus,
         CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderstatus
) ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through region→nation→customer→orders→lineitem with broadcast
    dims (the 100 TB plan: only the fact table shuffles, on the join key)."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_NATION_REVENUE = """
SELECT r.r_name, n.n_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "transcripts_uniqueness": (q_uniqueness, ORACLE_UNIQUENESS),
    "transcripts_contiguity": (q_contiguity, ORACLE_CONTIGUITY),
    "transcripts_role_domain": (q_role_domain, ORACLE_ROLE_DOMAIN),
    "transcripts_tool_domain": (q_tool_domain, ORACLE_TOOL_DOMAIN),
    "transcripts_tool_without_role": (q_tool_without_role, ORACLE_TOOL_WITHOUT_ROLE),
    "transcripts_null_text": (q_null_text, ORACLE_NULL_TEXT),
    "transcripts_profile": (q_profile, ORACLE_PROFILE),
    "type_ladder_profile": (q_type_profile, ORACLE_TYPE_PROFILE),
    "transcripts_drift_role": (q_drift_role, ORACLE_DRIFT_ROLE),
    "pricing_summary": (q_pricing_summary, ORACLE_PRICING_SUMMARY),
    "top_revenue_orders": (q_top_revenue_orders, ORACLE_TOP_REVENUE_ORDERS),
    "nation_revenue": (q_nation_revenue, ORACLE_NATION_REVENUE),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Pass-B validation over the sf0.001 transcripts fixture —
    every check, unioned into the typed violations table, stably ordered."""
    t = _transcripts(spark, SF0001)
    parts = [
        uniqueness_violations(t),
        contiguity_violations(t),
        domain_violations(t, "role", ROLE_DOMAIN),
        domain_violations(t, "tool", TOOL_DOMAIN),
        tool_requires_role_violations(t),
        null_violations(t, "text"),
    ]
    return union_violations(parts).orderBy("conv_id", "turn_idx", "check_name")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
