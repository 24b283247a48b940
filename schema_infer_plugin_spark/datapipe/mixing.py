"""Token-budget data mixing — the domain-weighting step of a pretraining
pipeline.

Training mixtures are specified as token budgets per source/domain ("this
run: 40% web, 30% code, 30% books"); what the data engine owes the trainer
is a deterministic, reproducible selection of WHICH documents fill each
source's budget. The standard recipe (Pile/DoReMi-style mixing) is a greedy
prefix in a fixed pseudo-random order: shuffle each source deterministically,
take documents until the source's token budget is met (the straddling
document is kept — budgets are targets, not hard caps, and whole documents
are the unit of selection).

That greedy prefix is a running token sum in the shuffle order, and a
per-source running sum is exactly the two-level prefix-sum shape
:mod:`packing <.packing>` established:

1. shard every document by ``md5(id) % n_shards`` (the deterministic
   "shuffle") and prefix-sum tokens INSIDE each (source, shard) — one
   window per shard, embarrassingly parallel at any corpus size;
2. roll the per-(source, shard) token totals (a ``n_sources × n_shards``
   frame — tiny) into per-shard starting offsets with one driver-scale
   window, and broadcast-join them back.

The global running count for a document is ``shard_offset + in-shard
prefix`` — identical to a single window ordered by ``(shard, id)`` within
the source (how the DuckDB oracle states it), but with the corpus-sized
work partitioned ``n_shards`` ways instead of one task per source. No
full-table sort, no single-key window: the only corpus-sized exchange is
the (source, shard) window shuffle.

Budgets larger than a source's total tokens select the whole source
(repetition/epoching is a trainer concern, not a selection concern);
sources absent from the budget map are dropped.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hex_hash_long
from ..functions.textstats import ws_token_count


def mix_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    n_tokens_col: str | None = None,
    text_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Select a deterministic token-budgeted mixture of documents per source.

    ``budgets`` maps source value → token budget. Token counts come from
    ``n_tokens_col`` if given, else whitespace-token counts of ``text_col``
    (one of the two is required; same convention as
    :func:`~.packing.pack_sequences`). A document is selected iff the
    running token count of its predecessors in the deterministic
    (md5-shard, id) order is still below the source's budget — so the first
    document of a non-empty source is always selected and the last selected
    document may straddle the budget.

    Output: (id_col, source_col, n_tokens, cum_tokens) — ``cum_tokens`` is
    the inclusive running sum, i.e. the mixture's token total per source is
    ``max(cum_tokens)``.
    """
    if n_tokens_col is None and text_col is None:
        raise ValueError("mix_token_budget: pass n_tokens_col or text_col")
    if not budgets:
        raise ValueError("mix_token_budget: budgets must be non-empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError("mix_token_budget: budgets must be >= 0")
    n_tokens = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else ws_token_count(F.col(text_col))
    )
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(source_col)]
    base = df.select(
        F.col(id_col),
        F.col(source_col),
        (hex_hash_long(F.col(id_col)) % n_shards).cast("int").alias("shard"),
        n_tokens.alias("n_tokens"),
    ).filter(budget.isNotNull())

    in_shard = Window.partitionBy(source_col, "shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(in_shard))

    # per-(source, shard) totals → exclusive running offset across shards.
    # This frame is n_sources × n_shards rows: the window below is
    # driver-scale work regardless of corpus size, and the join back is a
    # broadcast.
    across = (
        Window.partitionBy(source_col)
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(source_col, "shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .select(
            source_col,
            "shard",
            F.coalesce(F.sum("shard_tokens").over(across), F.lit(0)).alias(
                "shard_offset"
            ),
        )
    )
    cum = local.join(F.broadcast(offsets), [source_col, "shard"]).withColumn(
        "cum_tokens", (F.col("shard_offset") + F.col("local_cum")).cast("long")
    )
    return cum.filter(F.col("cum_tokens") - F.col("n_tokens") < budget).select(
        id_col, source_col, "n_tokens", "cum_tokens"
    )


def mix_temperature_sample(
    df: DataFrame,
    alpha: float,
    total_docs: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_shards: int = 64,
) -> DataFrame:
    """Temperature-weighted mixture sampling: source quotas ``∝ n_i^alpha``.

    The standard multilingual/multi-domain rebalancing recipe (XLM-R §3.1,
    T5/mT5 sampling): ``alpha=1`` keeps natural proportions, ``alpha→0``
    flattens toward uniform, upsampling low-resource sources' SHARE (this is
    a selection operator — a quota never exceeds the source's size;
    repetition/epoching stays a trainer concern, as in
    :func:`mix_token_budget`).

    Quotas: ``quota_i = min(n_i, floor(round(total_docs * n_i^alpha /
    Σ n_j^alpha, 6) + 0.5))`` — round-to-6-then-floor(+0.5) so an engine
    reproducing the arithmetic (the DuckDB oracle) lands on identical
    integers despite pow()/sum() ulp differences. Per-source counts are a
    bounded driver collect (n_sources rows — mixture specs are small by
    construction); the weight normalization folds in sorted-source order so
    the quota set is deterministic. Document selection is then exactly
    :func:`mix_token_budget` with unit token counts: the deterministic
    (md5-shard, id) prefix of each source, i.e. ``sel_rank <= quota``.

    Output: (id_col, source_col, sel_rank) — sel_rank is the document's
    1-based position in its source's deterministic order.
    """
    if alpha <= 0:
        raise ValueError(f"mix_temperature_sample: alpha must be > 0: {alpha}")
    if total_docs < 0:
        raise ValueError(
            f"mix_temperature_sample: total_docs must be >= 0: {total_docs}"
        )
    counts = {
        r["_src"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("_src"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: n_sources rows (see docstring)
    }
    counts.pop(None, None)  # NULL source is never part of a mixture spec
    if not counts:
        # Distinguish an EMPTY input (a pipeline stage upstream filtered
        # everything away — selection over nothing is an empty selection)
        # from a non-empty input whose source column is all NULL (a data
        # error the caller must see). The extra action runs only on this
        # rare path.
        if df.select(source_col).isEmpty():
            return (
                df.select(F.col(id_col), F.col(source_col))
                .withColumn("sel_rank", F.lit(0).cast("bigint"))
                .limit(0)
            )
        raise ValueError("mix_temperature_sample: no non-null sources in input")
    weights = {s: float(counts[s]) ** alpha for s in sorted(counts)}
    z = 0.0
    for s in sorted(weights):  # fixed fold order → deterministic quotas
        z += weights[s]
    quotas = {
        s: min(counts[s], int(math.floor(round(total_docs * weights[s] / z, 6) + 0.5)))
        for s in sorted(counts)
    }
    sel = mix_token_budget(
        df.withColumn("_unit", F.lit(1)),
        quotas,
        id_col=id_col,
        source_col=source_col,
        n_tokens_col="_unit",
        n_shards=n_shards,
    )
    return sel.select(
        F.col(id_col), F.col(source_col), F.col("cum_tokens").alias("sel_rank")
    )
