"""Token-budget sequence packing — the training-batch assembly step.

A pretraining pipeline concatenates documents shard-by-shard in a
deterministic order and cuts the token stream into fixed-budget training
sequences ("sample packing"); what the data engine owes it is the mapping
doc → (shard, sequence index, offset) computed at corpus scale. That mapping
is exactly a prefix sum: with docs ordered within a shard, a document's start
offset is the cumulative token count of its predecessors, its sequence (bin)
is ``floor(start_offset / budget)``, and its position inside the sequence is
``start_offset % budget`` — documents may straddle sequence boundaries, the
standard concat-and-cut semantics of GPT-style packing (greedy whole-doc
bin packing is a *recursive* accumulator and not expressible as a window;
this is the variant large pipelines actually run because it wastes zero
tokens to padding).

Plan shape: one shuffle on the shard key, one in-shard sort for the window
prefix sum — per-shard work is a single ordered pass, and shards are
independent, so the job is embarrassingly parallel at any corpus size (pick
``n_shards`` ≈ cluster parallelism). The shard key is the md5 of the doc id
(functions/hashing.py), so the assignment is deterministic,
partition-invariant, and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hex_hash_long
from ..functions.textstats import ws_token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    budget: int,
    n_shards: int = 64,
    n_tokens_col: str | None = None,
    text_col: str | None = None,
) -> DataFrame:
    """Assign every document a (shard, seq_idx, seq_offset) packing slot.

    Token counts come from ``n_tokens_col`` if given, else whitespace-token
    counts of ``text_col`` (one of the two is required). Empty documents
    (0 tokens) still get a slot (width 0). Output columns:

    (id_col, shard, n_tokens, start_offset, seq_idx, seq_offset, n_seqs_spanned)

    ``n_seqs_spanned`` > 1 marks documents that straddle sequence boundaries —
    the consumer decides whether to mask the seam or drop the straddle.
    """
    if n_tokens_col is None and text_col is None:
        raise ValueError("pack_sequences: pass n_tokens_col or text_col")
    n_tokens = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col is not None
        else ws_token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        (hex_hash_long(F.col(id_col)) % n_shards).cast("int").alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    out = base.select(F.col(id_col), "shard", "n_tokens", start)

    # integer-exact div/mod (never float floor): floor(a/b) == (a - a%b)/b for
    # non-negative longs — the subtraction makes the division exact in both
    # engines, so the oracle can mirror the arithmetic literally
    def idiv(a: F.Column, b: int) -> F.Column:
        return ((a - a % b) / b).cast("long")

    s = F.col("start_offset")
    # last occupied offset; 0-token docs occupy their start slot for spanning
    last = s + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return out.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        "start_offset",
        idiv(s, budget).alias("seq_idx"),
        (s % budget).cast("long").alias("seq_offset"),
        (idiv(last, budget) - idiv(s, budget) + 1).alias("n_seqs_spanned"),
    )
