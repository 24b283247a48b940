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
