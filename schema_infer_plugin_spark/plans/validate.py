"""Fused single-pass Pass B: every constraint check in ONE scan + ONE shuffle.

The modular checks (``checks/``) are the unit-testable, oracle-checked API; at
10^12 turns their naive union is wasteful: 6 scans of the table, a groupBy
shuffle (uniqueness), a distinct shuffle *plus* a window shuffle (contiguity).
This plan computes identical rows with:

* one scan, projection-pruned to ``(conv_id, turn_idx, role, tool,
  text IS NULL)`` before the exchange — ``text`` bytes (the bulk of a
  transcripts table) never enter the shuffle;
* one hash exchange on ``conv_id`` + one sort ``(conv_id, turn_idx)`` serving
  BOTH window specs: ``partitionBy(conv_id)`` (lag for contiguity) and
  ``partitionBy(conv_id, turn_idx)`` (count for uniqueness) — Spark's
  ``ClusteredDistribution`` is satisfied by the coarser ``HashPartitioning``
  since {conv_id} ⊆ {conv_id, turn_idx}, so no second exchange appears;
* row-level checks (domains, tool-without-role, not-null) evaluated as a
  stacked array of violation structs in the same projection, then exploded —
  zero extra passes.

Row-for-row equivalence with the modular union is asserted by
``tests/test_plans.py`` (fixture + synth inputs).

Contiguity-over-duplicates note: the modular check runs lag over DISTINCT
``(conv_id, turn_idx)``. Here duplicates are adjacent after the sort, so a row
is "first of its key group" iff ``lag(turn_idx) IS DISTINCT FROM turn_idx``;
lag at such rows equals the previous *distinct* index, and only those rows may
emit contiguity violations — same result, no distinct needed.

NULL-key posture: rows missing ``conv_id`` or ``turn_idx`` raise
``not_null_conv_id`` / ``not_null_turn_idx`` violations and are excluded from
every sequence check (no well-formed conversation to assert against); in the
window exchange they are salted across ``_NULL_KEY_SALT`` partitions instead
of collapsing onto the single NULL hash key — window outputs for them are
guarded, so the salt can be any deterministic spread.

Skew: the only partition-heavy key is ``conv_id``; conversations are bounded
(≤ thousands of turns) while the table is not, so hash partitioning stays
balanced at any scale — salting is unnecessary *for this plan* (the composite
uniqueness key spreads hot conversations by construction; see
``checks/salting.py`` for per-conversation aggregations, which do need it).

Adversarial skew (one conversation holding a visible FRACTION of the table —
tests/test_bucketed.py stresses 1/3 of all turns in one conv_id): the windows
key on conv_id, so that conversation is *irreducible* single-key skew — AQE's
skew-join splitting does not apply to windows, and salting would break window
exactness. What the plan guarantees instead: (a) the hot key costs exactly ONE
straggler task — the hash exchange keeps every other partition's residual load
balanced; (b) memory is safe at any conversation length because WindowExec
sorts spillably and both window functions (lag / count over the frame) stream.
If per-task wall-time of the one straggler ever dominates a run, the fallback
is range-partitioning by ``(conv_id, turn_idx)`` and running per-chunk
contiguity with boundary stitching (compare each chunk's first index against
the previous chunk's max — an equi-join on chunk edges); that variant trades
one exchange for bounded task time and is deliberately NOT the default: it
costs a second shuffle on every healthy run to protect against a shape
(multi-billion-turn single conversations) the transcripts contract excludes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from schema_infer_plugin_spark.schema import (
    ROLE_DOMAIN,
    TOOL_DOMAIN,
    well_keyed_predicate,
)

#: check_name values emitted by this plan (verdict grid rows).
CHECK_NAMES = [
    "uniqueness",
    "contiguity",
    "contiguity_start",
    "ts_monotonic",
    "domain_role",
    "domain_tool",
    "tool_without_role",
    "not_null_text",
    "not_null_conv_id",
    "not_null_turn_idx",
]

#: salt modulus for NULL-key rows in the window exchange (see
#: validate_transcripts docstring — any deterministic per-row spread works
#: because window outputs for those rows are guarded, never emitted)
_NULL_KEY_SALT = 64


def _v(check: str, column: str, observed, expected) -> F.Column:
    return F.struct(
        F.lit(check).alias("check_name"),
        F.lit(column).alias("column"),
        observed.cast("string").alias("observed"),
        expected.cast("string").alias("expected"),
    )


def validate_transcripts(
    df: DataFrame,
    role_domain: list[str] | None = None,
    tool_domain: list[str] | None = None,
    include_alternation: bool = False,
) -> DataFrame:
    """All Pass-B violations of ``df`` in one fused plan.

    Output columns: (check_name, conv_id, turn_idx, column, observed,
    expected) — identical rows to the union of the modular checks.

    ``include_alternation`` adds the role-alternation check
    (checks/alternation.py) as a ninth lag over the SAME window — zero extra
    exchanges (plan-gated in tests). Off by default so the verdict grid of
    existing runs stays stable; callers opting in must extend their
    check-name grid with ``"role_alternation"``.
    """
    roles = role_domain or ROLE_DOMAIN
    tools = tool_domain or TOOL_DOMAIN

    # NULL-key posture: a row missing conv_id or turn_idx belongs to no
    # well-formed conversation, so (a) it raises a not_null_conv_id /
    # not_null_turn_idx violation, (b) it is EXCLUDED from every sequence
    # check (uniqueness/contiguity/ts_monotonic/alternation — asserting
    # contiguity among unrelated keyless rows would fabricate violations),
    # and (c) it must not collapse into one hot window partition: hashing
    # all NULL conv_ids to a single reducer would recreate the irreducible-
    # skew problem for rows that don't even need window semantics. The salt
    # spreads ONLY NULL-key rows across _NULL_KEY_SALT partitions on the
    # exchange path; well-keyed rows keep salt 0, so their window results
    # are bit-identical, and HashPartitioning(conv_id) from a bucketed scan
    # still satisfies both clusterings ({conv_id} ⊆ {conv_id, _ksalt[, …]})
    # — the zero-exchange bucketed plan survives.
    key_ok = well_keyed_predicate()
    slim = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        F.col("text").isNull().alias("text_null"),
        # 1 + pmod: the NULL-key salt range (1.._NULL_KEY_SALT) is DISJOINT
        # from the well-keyed 0 — a colliding salt would put a keyless row
        # back into a real conversation's window partition and shift its
        # neighbors' lag chains even though the keyless row's own emissions
        # are guarded (caught by the fixture's injected NULL keys)
        F.when(key_ok, F.lit(0))
        .otherwise(
            F.lit(1)
            + F.pmod(
                F.xxhash64(F.col("turn_idx"), F.col("role"), F.col("tool"), F.col("ts")),
                F.lit(_NULL_KEY_SALT),
            )
        )
        .cast("int")
        .alias("_ksalt"),
    )

    # ts tie-break inside duplicate turn_idx groups makes the ts_monotonic lag
    # deterministic; lag(turn_idx)/key_count are insensitive to within-group order.
    w_conv = Window.partitionBy("conv_id", "_ksalt").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_first()
    )
    w_key = Window.partitionBy("conv_id", "_ksalt", "turn_idx")
    annotated = slim.select(
        "*",
        F.lag("turn_idx").over(w_conv).alias("prev_idx"),
        F.lag("ts").over(w_conv).alias("prev_ts"),
        F.count(F.lit(1)).over(w_key).alias("key_count"),
        *([F.lag("role").over(w_conv).alias("prev_role")] if include_alternation else []),
    )

    first_of_key = ~F.col("prev_idx").eqNullSafe(F.col("turn_idx"))
    prev = F.col("prev_idx")
    idx = F.col("turn_idx")
    null_s = F.lit(None).cast("string")

    checks = F.array(
        F.when(
            key_ok & first_of_key & (F.col("key_count") > 1),
            _v("uniqueness", "conv_id,turn_idx", F.col("key_count"), F.lit("1")),
        ),
        F.when(
            key_ok & first_of_key & prev.isNotNull() & (idx != prev + 1),
            _v("contiguity", "turn_idx", idx, prev + 1),
        ),
        F.when(
            key_ok & prev.isNull() & (idx != 0),
            _v("contiguity_start", "turn_idx", idx, F.lit("0")),
        ),
        F.when(
            key_ok & (F.col("ts") < F.col("prev_ts")),
            _v(
                "ts_monotonic",
                "ts",
                F.col("ts"),
                F.concat(F.lit(">= "), F.col("prev_ts").cast("string")),
            ),
        ),
        F.when(
            F.col("role").isNotNull() & ~F.col("role").isin(roles),
            _v("domain_role", "role", F.col("role"), F.lit(",".join(roles))),
        ),
        F.when(
            F.col("tool").isNotNull() & ~F.col("tool").isin(tools),
            _v("domain_tool", "tool", F.col("tool"), F.lit(",".join(tools))),
        ),
        F.when(
            F.col("tool").isNotNull() & (F.coalesce(F.col("role"), F.lit("")) != "tool"),
            _v("tool_without_role", "tool", F.col("tool"), F.lit("NULL unless role=tool")),
        ),
        F.when(
            F.col("text_null"),
            _v("not_null_text", "text", F.lit("NULL"), F.lit("NOT NULL")),
        ),
        F.when(
            F.col("conv_id").isNull(),
            _v("not_null_conv_id", "conv_id", F.lit("NULL"), F.lit("NOT NULL")),
        ),
        F.when(
            F.col("turn_idx").isNull(),
            _v("not_null_turn_idx", "turn_idx", F.lit("NULL"), F.lit("NOT NULL")),
        ),
        *(
            [
                F.when(
                    key_ok
                    & F.col("role").isNotNull()
                    & F.col("prev_role").isNotNull()
                    & (F.col("role") == F.col("prev_role"))
                    & (F.col("role") != "tool"),
                    _v(
                        "role_alternation",
                        "role",
                        F.col("role"),
                        F.concat(F.lit("!= "), F.col("prev_role")),
                    ),
                )
            ]
            if include_alternation
            else []
        ),
    )

    return (
        annotated.select(
            "conv_id",
            "turn_idx",
            F.explode(F.filter(checks, lambda c: c.isNotNull())).alias("v"),
        )
        .select(
            F.col("v.check_name").alias("check_name"),
            "conv_id",
            "turn_idx",
            F.col("v.column").alias("column"),
            F.col("v.observed").alias("observed"),
            F.col("v.expected").alias("expected"),
        )
    )


def sampled_validation_estimate(
    df: DataFrame,
    rate_num: int,
    width: int = 2,
    role_domain: list[str] | None = None,
    tool_domain: list[str] | None = None,
) -> DataFrame:
    """Cheap pre-pass for 10^12-turn tables: run the FUSED validation on a
    deterministic md5 sample of CONVERSATIONS and estimate each check's
    per-turn violation rate with a Wilson 95% interval — the answer to "is
    this ingest batch worth a full Pass B?" at a fraction of its cost, and
    reproducible (content-hash sampling: same sample at any parallelism, in
    any engine).

    Sampling is conv_id-granular — every window check (uniqueness,
    contiguity, ts_monotonic) sees whole conversations, so a sampled
    violation is a REAL violation, never a seam artifact of dropping
    mid-conversation turns. Corollary: rows with a NULL conv_id hash to no
    bucket and are never sampled, so ``not_null_conv_id`` always estimates
    0 here — keyless-row incidence is a question for the full pass (or a
    row-granular sample), not the conversation-granular estimator. ``rate_num`` of 16**width buckets (width=2 →
    1/256 granularity), sources/sampling.deterministic_sample.

    The Wilson interval is ONE fixed double formula (z = 1.959964) on an
    exact BIGINT (successes, trials) pair — bit-identical across engines,
    never degenerate at rate 0 or 1 (unlike the Wald interval). TWO units
    are estimated side by side:

    * per-TURN (rate/ci_lo/ci_hi over n_turns): the operational number, but
      turns within a conversation are correlated, so under conv-level
      cluster sampling this interval is the iid-binomial approximation — an
      honest lower bound on the uncertainty, documented rather than hidden;
    * per-CONVERSATION (conv_rate/conv_ci_lo/conv_ci_hi: conversations with
      ≥1 violation over n_convs): the sampling unit IS the conversation, so
      here the iid assumption holds exactly — the design-consistent
      interval to gate on when the caveat matters.

    Plan: map-side sample predicate (pushes to the scan) → the fused
    single-exchange validation → one hash agg on check_name (≤ |checks|
    rows, count + distinct-conv count together) joined to the driver-local
    check grid → one-row sampled-totals broadcast. Output: (check_name,
    n_turns, n_violations, rate, ci_lo, ci_hi, n_convs, conv_violations,
    conv_rate, conv_ci_lo, conv_ci_hi); NULL estimates when the sample is
    empty.
    """
    from schema_infer_plugin_spark.sources.sampling import deterministic_sample

    sample = deterministic_sample(df, ["conv_id"], rate_num, width)
    counts = (
        validate_transcripts(sample, role_domain, tool_domain)
        .groupBy("check_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"),
            F.count_distinct(F.col("conv_id")).cast("long").alias("conv_violations"),
        )
    )
    grid = df.sparkSession.createDataFrame(
        [(c,) for c in CHECK_NAMES], ["check_name"]
    )
    totals = sample.agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.count_distinct(F.col("conv_id")).cast("long").alias("n_convs"),
    )
    est = (
        grid.join(counts, on="check_name", how="left")
        .select(
            "check_name",
            F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
            F.coalesce("conv_violations", F.lit(0)).cast("long").alias(
                "conv_violations"
            ),
        )
        .crossJoin(F.broadcast(totals))
    )

    def wilson(k_col: str, n_col: str) -> tuple:
        """(rate, ci_lo, ci_hi) Wilson-95% expressions from exact counts —
        the identical fixed double formula at both units and in the oracle."""
        z = F.lit(1.959964)
        n = F.col(n_col).cast("double")
        k = F.col(k_col).cast("double")
        phat = k / n
        z2 = z * z
        denomw = F.lit(1.0) + z2 / n
        center = (phat + z2 / (F.lit(2.0) * n)) / denomw
        half = (
            z
            * F.sqrt(phat * (F.lit(1.0) - phat) / n + z2 / (F.lit(4.0) * (n * n)))
            / denomw
        )
        guard = lambda c: F.when(F.col(n_col) > 0, c)  # noqa: E731
        # the least/greatest-vs-phat clamp enforces ci_lo <= rate <= ci_hi,
        # true analytically for Wilson but violable by ~1e-19 of float dust
        # at k=0 / k=n (center−half is exactly 0 only in real arithmetic)
        return (
            guard(phat),
            guard(F.greatest(F.least(center - half, phat), F.lit(0.0))),
            guard(F.least(F.greatest(center + half, phat), F.lit(1.0))),
        )

    t_rate, t_lo, t_hi = wilson("n_violations", "n_turns")
    c_rate, c_lo, c_hi = wilson("conv_violations", "n_convs")
    return est.select(
        "check_name",
        "n_turns",
        "n_violations",
        t_rate.alias("rate"),
        t_lo.alias("ci_lo"),
        t_hi.alias("ci_hi"),
        "n_convs",
        "conv_violations",
        c_rate.alias("conv_rate"),
        c_lo.alias("conv_ci_lo"),
        c_hi.alias("conv_ci_hi"),
    )
