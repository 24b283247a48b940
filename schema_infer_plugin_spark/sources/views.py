"""Shared-SQL transcripts fixture derived from the driver's ``events`` table.

One SQL text, two engines: Spark SQL executes it over a temp view and DuckDB
executes the identical text over its pre-registered ``events`` view, so every
downstream check is oracle-verifiable end to end (the driver contract in
``__spark_entry__.py``).

The view deterministically injects every violation class the engine checks for
(the distributed analog of the reference's fixture corpus,
/root/reference/tests/conftest.py:121-168):

* duplicate ``(conv_id, turn_idx)``  — ``event_id % 101 = 0`` collapses a turn
  onto its predecessor's index;
* ``turn_idx`` gaps                  — ``event_id % 89 = 0`` drops a mid-
  conversation turn;
* out-of-domain ``role``             — event_type 'error' maps to 'moderator';
* ``tool`` set while role ≠ 'tool'   — ``event_id % 97 = 0`` forces tool='search';
* out-of-domain ``tool``             — ``event_id % 103 = 0`` forces tool='laser';
* NULL ``text``                      — ``event_id % 53 = 0``;
* non-monotone ``ts``                — ``event_id % 113 = 0`` (mid-conversation)
  rewinds the timestamp 60 days (beyond the table's whole span),
  violating ts monotonicity within the conversation;
* NULL ``conv_id``                   — ``event_id % 127 = 0`` (keyless row:
  must raise not_null_conv_id and stay OUT of every sequence check — the
  engine-wide NULL-key posture, plans/validate.py);
* NULL ``turn_idx``                  — ``event_id % 131 = 0`` (same posture,
  not_null_turn_idx; the row keeps its conv_id but holds no position).

Only engine-portable constructs are used (row_number, lpad, CASE, %, concat) —
no regex, no float→string formatting, ties in the window broken by event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPTS_FROM_EVENTS_SQL = """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type, props,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
), base AS (
  SELECT
    CASE WHEN event_id % 127 = 0 THEN NULL
         ELSE concat('conv_', lpad(CAST(user_id AS STRING), 6, '0')) END AS conv_id,
    CASE WHEN event_id % 131 = 0 THEN NULL
         WHEN event_id % 101 = 0 AND rn > 0 THEN rn - 1 ELSE rn END AS turn_idx,
    CASE event_type
      WHEN 'click' THEN 'user'
      WHEN 'view' THEN 'assistant'
      WHEN 'signup' THEN 'system'
      WHEN 'purchase' THEN 'tool'
      WHEN 'error' THEN 'moderator'
    END AS role,
    CASE WHEN event_id % 53 = 0 THEN NULL ELSE concat('msg ', props) END AS text,
    CASE
      WHEN event_type = 'purchase' THEN
        CASE CAST(event_id % 4 AS INT)
          WHEN 0 THEN 'search' WHEN 1 THEN 'code' WHEN 2 THEN 'browser' ELSE 'calc'
        END
      WHEN event_id % 97 = 0 THEN 'search'
      WHEN event_id % 103 = 0 THEN 'laser'
      ELSE NULL
    END AS tool,
    CASE WHEN event_id % 113 = 0 AND rn > 0 THEN ts - INTERVAL 60 DAY ELSE ts END AS ts
  FROM seq
  WHERE NOT (event_id % 89 = 0 AND rn > 1)
)
SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx, role, text, tool, ts
FROM base
"""


def transcripts_from_events(spark: SparkSession, events: DataFrame) -> DataFrame:
    """Materialize the fixture view in Spark from an ``events`` DataFrame."""
    events.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)


def oracle_cte(inner_select: str) -> str:
    """Wrap a check's SQL around the shared transcripts CTE for the DuckDB oracle.

    ``inner_select`` must reference the view as ``transcripts``.
    """
    return f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}) {inner_select}"
