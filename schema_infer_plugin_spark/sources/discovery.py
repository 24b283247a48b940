"""Table discovery: the reference's topic discovery over the Spark catalog.

Maps TopicDiscovery (/root/reference/schema_infer/core/discovery.py:63-198) —
name / explicit list / prefix / regex resolution with exclusion filters — onto
catalog listings, and the existence/accessibility split
(discovery.py:338-371) onto membership checks. All driver-side over catalog
metadata (tiny), mirroring the reference's pre-scan phase; the set-membership
"joins" (SURVEY.md §2.5 J1/J2) are anti/semi membership over the listing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

#: reference default: skip internal topics ('__consumer_offsets' etc.,
#: discovery.py:29-41); here: temp/system objects.
DEFAULT_EXCLUDE_PREFIXES = ("__", "_tmp_", "sys_")


@dataclass
class DiscoveryResult:
    found: list[str] = field(default_factory=list)
    not_found: list[str] = field(default_factory=list)
    excluded: list[str] = field(default_factory=list)


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    return sorted(t.name for t in spark.catalog.listTables(database))


def _excluded(name: str, exclude_prefixes: tuple[str, ...], include_patterns: tuple[str, ...]) -> bool:
    """Prefix exclusion with include-pattern override (discovery.py:43-61)."""
    if any(re.match(p, name) for p in include_patterns):
        return False
    return any(name.startswith(p) for p in exclude_prefixes)


def discover_tables(
    spark: SparkSession,
    names: list[str] | None = None,
    prefix: str | None = None,
    pattern: str | None = None,
    database: str | None = None,
    exclude_prefixes: tuple[str, ...] = DEFAULT_EXCLUDE_PREFIXES,
    include_patterns: tuple[str, ...] = (),
) -> DiscoveryResult:
    """Resolve tables by explicit names, prefix, and/or regex — union of all
    supplied criteria, deduplicated and sorted (discovery.py:87-125); explicit
    names that don't exist land in ``not_found`` (discovery.py:338-352)."""
    available = list_tables(spark, database)
    avail_set = set(available)
    out = DiscoveryResult()
    selected: set[str] = set()

    for n in names or []:
        if n in avail_set:
            selected.add(n)
        else:
            out.not_found.append(n)
    if prefix is not None:
        selected.update(t for t in available if t.startswith(prefix))
    if pattern is not None:
        rx = re.compile(pattern)
        selected.update(t for t in available if rx.match(t))

    for t in sorted(selected):
        if _excluded(t, exclude_prefixes, include_patterns):
            out.excluded.append(t)
        else:
            out.found.append(t)
    return out
