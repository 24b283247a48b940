"""End-to-end training-corpus cleaning: quality gate → exact dedup →
MinHash-LSH near-dup removal, composed from the individual operators.

This is the shape a pretraining data pipeline actually runs — not one
operator, but the staged funnel. Every stage is deterministic and
oracle-checkable:

* quality gate: map-side predicate (``quality_score`` ≥ threshold) — pushes
  to the scan, removes low-value docs before anything shuffles;
* exact dedup: keep the minimal id per ``md5(text)`` group — one hash
  aggregation;
* near-dup removal: MinHash signatures + banded-LSH candidate pairs on the
  survivors, then drop every doc that appears as the LARGER id of a pair
  (``id_b``) — the standard single-pass keep-smallest heuristic. A chain
  A<B<C with pairs (A,B),(B,C) drops both B and C even though (A,C) was never
  scored; exact connected components would need an iterative join, and the
  over-drop is the industry-accepted trade (dropping a near-dup of a near-dup
  is rarely a loss).

Scale: the quality gate is shuffle-free; dedup shuffles once on the digest;
the LSH stage shuffles on (band, hash) and the final removal is a broadcast
anti-join when the drop-list is small (near-dup counts usually are) — Spark's
AQE picks that automatically from the runtime size.

Recompute note: lazily, the exact-dedup survivors (``uniq``) appear in THREE
lineages (signature build, both sides of the banded self-join via ``sig``,
and the anti-join's left side) — Spark would re-run the quality+dedup stages
for each. ``persist_intermediate=True`` caches the two fan-out frames for a
single-job run; at 100 TB the right form is STAGED MATERIALIZATION — write
the stage-2 survivors to a table and run the near-dup stage from that scan,
exactly how plans/runner.py stages its passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.textstats import quality_score
from .dedup import lsh_candidate_pairs, minhash_signatures


def clean_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    persist_intermediate: bool = False,
) -> DataFrame:
    """Cleaned corpus: (id, text, quality) of every surviving document.

    Survivors = quality ≥ ``min_quality``, minimal id of each exact-duplicate
    group, and not the larger side of any LSH near-dup pair.
    ``persist_intermediate`` caches the fan-out frames for the duration of the
    call, eagerly materializes the result via ``localCheckpoint``, and
    unpersists the intermediates before returning — nothing leaks into the
    caller's session cache (staging to a table is still the 100 TB form).
    """
    q = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.round(quality_score(F.col(text_col)), 6).cast("double").alias("quality"),
    ).filter(F.col("quality") >= min_quality)

    w = Window.partitionBy(F.md5(F.col("_text"))).orderBy(F.col("_id"))
    uniq = q.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if persist_intermediate:
        uniq = uniq.persist()

    sig = minhash_signatures(uniq, "_id", "_text", num_hashes=num_hashes, shingle_k=shingle_k)
    if persist_intermediate:
        sig = sig.persist()
    pairs = lsh_candidate_pairs(sig, "_id", bands=bands, min_est_jaccard=min_est_jaccard)
    drop = pairs.select(F.col("id_b").alias("_id")).distinct()
    out = uniq.join(drop, "_id", "left_anti").select(
        F.col("_id").alias(id_col), F.col("_text").alias(text_col), "quality"
    )
    if persist_intermediate:
        # materialize the result off the cached lineages, then free them —
        # the caller's session cache is left exactly as it was
        out = out.localCheckpoint(eager=True)
        sig.unpersist()
        uniq.unpersist()
    return out
