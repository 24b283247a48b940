"""Text analytics tables over a documents-shaped DataFrame.

Thin compositions of functions/textstats.py expressions — all JVM-side,
one projection, no shuffle (except any downstream agg the caller adds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import (
    bpe_token_count,
    lang_scores,
    predicted_lang,
    punct_ratio,
    quality_score,
    stopword_ratio,
    word_fingerprint,
    ws_token_count,
)


def text_quality_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality metrics: token counts, ratios, composite score,
    and the order-insensitive content fingerprint."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        ws_token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars_obs"),
        F.round(punct_ratio(t), 6).cast("double").alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).cast("double").alias("stopword_ratio"),
        F.round(quality_score(t), 6).cast("double").alias("quality"),
        word_fingerprint(t).alias("fingerprint"),
    )


def language_id_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: per-language stopword score + argmax."""
    t = F.col(text_col)
    scores = lang_scores(t)
    return df.select(
        F.col(id_col),
        predicted_lang(t).alias("pred_lang"),
        *[F.round(scores[lang], 6).cast("double").alias(f"score_{lang}") for lang in sorted(scores)],
    )


def unigram_logprob_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of each
    document under the corpus's own unigram distribution — the classic
    LM-based filter signal (low mean log-prob ≈ high perplexity ≈ boilerplate,
    gibberish, or off-distribution text).

    Two passes, both scale-safe:
    1. corpus unigram counts — one groupBy(token) over exploded lowercased
       tokens (map-side combinable; vocabulary rows ≪ token rows);
    2. per-doc mean of ``ln(cnt(tok) / total)`` — explode again, equi-join on
       token (AQE broadcasts when the vocab is small, shuffles otherwise),
       groupBy(doc). Every token exists in the vocab by construction (the
       corpus defines it), so no smoothing term is needed for this in-corpus
       scoring; scoring NEW docs against a frozen vocab would add Laplace.

    Output: (id, n_tokens, mean_logprob) — higher is more "typical".
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("tok", F.lower(F.col("tok"))).filter(F.length("tok") > 0)

    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("cnt") / F.col("total")).alias("lp")
    )
    return (
        toks.join(logp, "tok")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("lp").alias("_mean_lp"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.round("_mean_lp", 6).cast("double").alias("mean_logprob"),
        )
    )
