"""Deterministic, distributed transcripts synthesizer (FIXTURES.md §1).

Scales from 5k turns (pytest) to tens of millions (bench) with zero driver-side
loops: ``spark.range(n_convs)`` → per-conversation turn counts → ``explode``.
Every attribute derives from ``xxhash64`` of stable keys, so output is identical
regardless of partitioning or parallelism level — the property that makes the
local[8]-vs-local[32] scaling benchmark run on literally the same input.

Skew and violations are part of the spec, not noise:
* 0.1% of conversations are "hot" (10–100× turns) to exercise salting/AQE;
* the final 5% of conversations shift assistant-heavy (trips the drift check);
* duplicates / gaps / out-of-domain roles / tool-misuse / NULL text are injected
  at deterministic hash coordinates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: 2026-01-01T00:00:00Z
_BASE_EPOCH = 1767225600

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark shuffle partition join "
    "agg filter window table scan query plan stage task executor broadcast "
    "hash sort merge stream batch column row vector codegen skew salt"
).split()


def _u(*cols, salt: str, seed: int):
    """Deterministic uniform in [0,1) from xxhash64 of (cols, salt, seed)."""
    return F.pmod(F.xxhash64(*cols, F.lit(salt), F.lit(seed)), F.lit(1 << 20)) / float(1 << 20)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    inject: bool = True,
    mean_turns: int = 8,
) -> DataFrame:
    """Generate a transcripts DataFrame with TRANSCRIPTS_SCHEMA columns."""
    conv = spark.range(n_convs).withColumnRenamed("id", "cid")
    c = F.col("cid")

    # Turn counts: geometric(mean=mean_turns) via inverse CDF, capped at 256;
    # hot conversations (0.1%) get a 10–100× multiplier (cap 4096).
    u_turns = _u(c, salt="turns", seed=seed)
    p = 1.0 / mean_turns
    import math

    turns = (F.lit(1) + F.floor(F.log(F.lit(1.0) - u_turns) / math.log(1.0 - p))).cast("int")
    turns = F.least(turns, F.lit(256))
    hot_factor = (F.lit(10) + F.floor(_u(c, salt="hot", seed=seed) * 90)).cast("int")
    turns = F.when(c % 1000 == 0, F.least(turns * hot_factor, F.lit(4096))).otherwise(turns)

    conv = conv.withColumn("n_turns", turns)
    rows = conv.select(
        "cid",
        "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    cid, t = F.col("cid"), F.col("turn_idx")
    u_role = _u(cid, t, salt="role", seed=seed)
    drift = cid >= int(n_convs * 0.95)  # drift slice: assistant-heavy tail
    role = (
        F.when((t == 0) & (u_role < 0.3), F.lit("system"))
        .when(drift & (u_role < 0.75), F.lit("assistant"))
        .when(u_role < 0.08, F.lit("tool"))
        .when(t % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    # Heavy-tailed text length (exp, mean ~10 tokens, cap 200), seeded word picks.
    u_len = _u(cid, t, salt="len", seed=seed)
    n_words = F.least((F.lit(3) + F.floor(F.lit(-10.0) * F.log(F.lit(1.0) - u_len))).cast("int"), F.lit(200))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            vocab, F.pmod(F.xxhash64(cid, t, i, F.lit(seed)), F.lit(len(_VOCAB))).cast("int") + 1
        ),
    )
    text = F.concat_ws(" ", words)

    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("code"), F.lit("browser"), F.lit("calc")),
            F.pmod(F.xxhash64(cid, t, F.lit("tool"), F.lit(seed)), F.lit(4)).cast("int") + 1,
        ),
    ).otherwise(F.lit(None).cast("string"))

    # Monotone-per-conversation timestamps: conv-level offset + fixed per-turn step.
    conv_off = F.pmod(F.xxhash64(cid, F.lit("ts0"), F.lit(seed)), F.lit(86400 * 30))
    step = F.pmod(F.xxhash64(cid, F.lit("step"), F.lit(seed)), F.lit(29)) + 1
    ts = F.timestamp_seconds(F.lit(_BASE_EPOCH) + conv_off + t.cast("long") * step)

    df = rows.select(
        F.format_string("conv_%08d", cid).alias("conv_id"),
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        cid.alias("_cid"),
    )

    if inject:
        h = F.pmod(F.xxhash64(F.col("_cid"), F.col("turn_idx"), F.lit("inj"), F.lit(seed)), F.lit(20000))
        # NULL text at ~1e-3 (h in [40,60)).
        df = df.withColumn("text", F.when((h >= 40) & (h < 60), F.lit(None)).otherwise(F.col("text")))
        # Out-of-domain role at ~5e-5 (h == 2).
        df = df.withColumn("role", F.when(h == 2, F.lit("moderator")).otherwise(F.col("role")))
        # tool set while role != 'tool' at ~5e-5 (h == 3).
        df = df.withColumn(
            "tool",
            F.when((h == 3) & (F.col("role") != "tool"), F.lit("search")).otherwise(F.col("tool")),
        )
        # turn_idx gaps at ~1e-4: drop mid-conversation turns (h == 4).
        df = df.filter(~((h == 4) & (F.col("turn_idx") > 0)))
        # duplicate (conv_id, turn_idx) at ~1e-4: emit a second copy (h == 5).
        dup = df.filter((h == 5) & (F.col("turn_idx") > 0)).withColumn(
            "text", F.concat(F.lit("dup "), F.coalesce(F.col("text"), F.lit("")))
        )
        df = df.unionByName(dup)

    return df.drop("_cid")
