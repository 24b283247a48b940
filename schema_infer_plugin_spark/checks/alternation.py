"""Role-alternation check: agent transcripts should alternate speakers.

Engine-added, transcript-native constraint (no reference analog — SURVEY.md
§2.6 family): within a conversation ordered by ``(turn_idx, ts)``, two
CONSECUTIVE turns with the same non-null role indicate a stitching or
ingestion fault — except ``tool`` turns, which legitimately run in sequences
(multiple tool results between assistant turns) and are therefore exempt on
both sides of the comparison.

Same window shape as contiguity/ts-monotonic (one lag over the conv_id
exchange), so a future fused-plan inclusion costs zero extra shuffles; kept
standalone for now so the fused plan's verdict grid stays stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from schema_infer_plugin_spark.schema import well_keyed


def role_transition_matrix(df: DataFrame) -> DataFrame:
    """Counts and rates of adjacent-turn (prev_role → role) transitions —
    the DISTRIBUTIONAL companion to :func:`role_alternation_violations`:
    instead of emitting only the forbidden repeats, it profiles the whole
    transition structure (user→assistant share, tool-chain lengths showing up
    as tool→tool mass, conversation openers under prev_role NULL), which is
    what a drift check compares across ingest batches.

    Ordering is the engine's stable turn order (turn_idx, ts NULLS FIRST)
    plus role as a final tie-breaker so lag() is deterministic even on full
    (turn_idx, ts) duplicate rows — both engines sort identically with NULLS
    FIRST pinned explicitly.

    Plan: one lag window over the conv_id exchange (zero exchanges over a
    conv_id-bucketed table) → one hash agg on (prev_role, role). The rate
    denominator is a window over the AGGREGATED matrix — bounded by
    |role domain|², a few dozen rows, so the unpartitioned window is safe
    here (the "never over unbounded rows" invariant targets row-scale data).

    Output: (prev_role, role, n bigint, rate double) — rate = n / Σn,
    rounded to 6 decimals. prev_role is NULL for each conversation's first
    turn in the stable order.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(),
        F.col("ts").asc_nulls_first(),
        F.col("role").asc_nulls_first(),
    )
    # NULL-key rows form no adjacency (engine-wide posture, plans/validate.py)
    # — one corpus-wide NULL pseudo-conversation would chain unrelated rows
    # into fabricated edges AND recreate the unsplittable hot window partition
    df = well_keyed(df)
    matrix = (
        df.select(F.lag("role").over(w).alias("prev_role"), F.col("role"))
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy(F.lit(1))
    return matrix.select(
        "prev_role",
        "role",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).cast("double").alias("rate"),
    )


def transition_buckets(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One row per adjacent-turn transition: (bucket = 'prev->role', _ts_us).

    The shared core of :func:`transition_self_drift` and the persisted
    transition drift baseline (plans/runner.write_histograms): openers
    (no previous turn) are excluded — they carry no transition information;
    a NULL ts maps to −inf epoch, consistent with the NULLS FIRST turn
    order. One lag window over the conv_id exchange (zero on a bucketed
    table)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(),
        F.col(ts_col).asc_nulls_first(),
        F.col("role").asc_nulls_first(),
    )
    neg_inf = -(1 << 62)
    # NULL-key rows form no adjacency (same posture as role_transition_matrix)
    df = well_keyed(df)
    return (
        df.select(
            F.row_number().over(w).alias("_rn"),
            F.lag("role").over(w).alias("_prev"),
            F.col("role").alias("_role"),
            F.coalesce(
                F.unix_micros(F.col(ts_col).cast("timestamp")), F.lit(neg_inf)
            ).alias("_ts_us"),
        )
        .filter(F.col("_rn") > 1)
        .select(
            F.concat(
                F.coalesce(F.col("_prev"), F.lit("<null>")),
                F.lit("->"),
                F.coalesce(F.col("_role"), F.lit("<null>")),
            ).alias("bucket"),
            "_ts_us",
        )
    )


def transition_histogram(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Relative-frequency histogram of the transition distribution —
    (bucket, freq), the persistable drift BASELINE form (what
    write_histograms stores as the pseudo-column ``__transitions__`` and
    run_drift compares against with PSI/KL/JS)."""
    from .drift import histogram

    return histogram(transition_buckets(df, ts_col), "bucket")


def transition_self_drift(
    df: DataFrame,
    ts_col: str = "ts",
    approx: bool = True,
) -> DataFrame:
    """Zero-config drift of the TRANSITION distribution: does the
    (prev_role → role) structure differ between the data's earlier and later
    half? The sequence-level companion to checks/drift.temporal_self_drift —
    every per-column histogram can stay flat while the conversational
    protocol shifts (e.g. tool-chains lengthen, assistant double-turns
    appear after a producer redeploy); the transition matrix IS that
    protocol's distribution, and this check diffs it against itself in time.

    Each transition is an event stamped with the ts of its COMPLETING turn
    (the later one); conversation openers (no previous turn) are excluded —
    they carry no transition information. The split point is the exact /
    approx median of the transition timestamps (same opt-in convention as
    temporal_self_drift); a NULL completing ts sorts into the earlier half
    (epoch treated as −inf, consistent with the NULLS FIRST turn order).

    Plan: ONE lag window over the conv_id exchange (zero on a bucketed
    table) → median agg broadcast as one row → per-half hash agg over the
    ≤|roles|²-bounded transition buckets → drift terms on the joined tiny
    frames. Output: drift_stats rows with bucket = 'prev->role'.
    """
    from .drift import drift_stats, histogram

    trans = transition_buckets(df, ts_col)
    med_expr = (
        F.percentile_approx("_ts_us", F.lit(0.5))
        if approx
        else F.percentile("_ts_us", F.lit(0.5))
    )
    med = trans.agg(med_expr.alias("_med"))
    with_med = trans.crossJoin(F.broadcast(med))
    base = histogram(with_med.filter(F.col("_ts_us") < F.col("_med")), "bucket")
    cur = histogram(with_med.filter(F.col("_ts_us") >= F.col("_med")), "bucket")
    return drift_stats(cur, base)


def transition_domain_violations(
    df: DataFrame, allowed: "list[str] | tuple[str, ...]"
) -> DataFrame:
    """Config-declared transition whitelist: one violation per adjacent-turn
    (prev_role → role) pair outside ``allowed`` — the DOMAIN check over the
    protocol's edge set, generalizing :func:`role_alternation_violations`
    (which forbids exactly the repeat edges) to an arbitrary declared machine
    ("tool may only follow assistant", "system never mid-conversation", …).
    The matrix (:func:`role_transition_matrix`) profiles the distribution;
    this emits the typed violation slice against a declared legal set —
    the same profile/constraint pairing as domains vs infer_domain.

    ``allowed``: 'prev->next' strings (both sides non-empty). Ordering is the
    engine's stable turn order (turn_idx, ts NULLS FIRST, role) so prev_role
    is deterministic on full duplicate rows in both engines. Conversation
    openers carry no transition (prev NULL ⇒ skipped); NULL roles are the
    null check's job, not this one's — both sides must be non-null to form a
    judgeable edge.

    Plan: ONE lag window over the conv_id exchange (zero exchanges on a
    conv_id-bucketed table) → pure filter; output ∝ violations. The whitelist
    is |roles|²-bounded, inlined as an isin literal list.
    """
    allowed = sorted(set(allowed))
    if not allowed:
        raise ValueError("transition_domain_violations: allowed set must be non-empty")
    for a in allowed:
        head, sep, tail = a.partition("->")
        if not sep or not head or not tail:
            raise ValueError(
                f"transition_domain_violations: entries must be 'prev->next': {a!r}"
            )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(),
        F.col("ts").asc_nulls_first(),
        F.col("role").asc_nulls_first(),
    )
    expected = "in {" + ",".join(allowed) + "}"
    pair = F.concat(F.col("prev_role"), F.lit("->"), F.col("role"))
    # NULL-key rows form no judgeable edge (engine-wide posture,
    # plans/validate.py) — filtered before the lag so they break no chain
    return (
        well_keyed(df)
        .select(
            "conv_id", "turn_idx", "role", F.lag("role").over(w).alias("prev_role")
        )
        .filter(
            F.col("role").isNotNull()
            & F.col("prev_role").isNotNull()
            & ~pair.isin(*allowed)
        )
        .select(
            F.lit("role_transition_domain").alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit("role").alias("column"),
            pair.alias("observed"),
            F.lit(expected).alias("expected"),
        )
    )


def transition_chi2(
    df: DataFrame,
    ts_col: str = "ts",
    approx: bool = True,
) -> DataFrame:
    """Chi-square flavor of :func:`transition_self_drift`: per-bucket Pearson
    homogeneity terms (checks/drift.chi2_terms) of the (prev_role → role)
    transition COUNTS between the data's earlier and later half, split at the
    median transition time. Σ chi2_term is asymptotically χ²(k−1) under "no
    protocol shift" — the calibrated significance test the PSI/KL/JS terms
    (folklore thresholds) can't provide, and it needs counts, not
    frequencies, which is why it isn't a drift_stats column.

    Same plan shape as transition_self_drift: ONE lag window over the conv_id
    exchange → one-row median broadcast → per-half hash aggs over the
    |roles|²-bounded buckets → per-row fixed double formula on exact
    DECIMAL(19,0) cross products (bit-identical across engines).
    """
    from .drift import chi2_terms

    trans = transition_buckets(df, ts_col)
    med_expr = (
        F.percentile_approx("_ts_us", F.lit(0.5))
        if approx
        else F.percentile("_ts_us", F.lit(0.5))
    )
    med = trans.agg(med_expr.alias("_med"))
    with_med = trans.crossJoin(F.broadcast(med))
    counts = lambda d: d.groupBy("bucket").agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    base = counts(with_med.filter(F.col("_ts_us") < F.col("_med")))
    cur = counts(with_med.filter(F.col("_ts_us") >= F.col("_med")))
    return chi2_terms(cur, base)


def role_alternation_violations(df: DataFrame) -> DataFrame:
    """One violation per turn whose role repeats the previous turn's role
    (both non-null, neither 'tool'), ordered by (turn_idx, ts nulls first)."""
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc_nulls_first()
    )
    prev_role = F.lag("role").over(w)
    # NULL-key rows sit outside every conversation's turn sequence — the
    # engine-wide NULL-key posture (plans/validate.py)
    return (
        well_keyed(df)
        .select("conv_id", "turn_idx", "role", prev_role.alias("prev_role"))
        .filter(
            F.col("role").isNotNull()
            & F.col("prev_role").isNotNull()
            & (F.col("role") == F.col("prev_role"))
            & (F.col("role") != "tool")
        )
        .select(
            F.lit("role_alternation").alias("check_name"),
            F.col("conv_id"),
            F.col("turn_idx"),
            F.lit("role").alias("column"),
            F.col("role").alias("observed"),
            F.concat(F.lit("!= "), F.col("prev_role")).alias("expected"),
        )
    )
