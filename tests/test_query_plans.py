"""Blanket plan gates over EVERY driver query: whatever gets added to the
contract, its physical plan must stay scale-shaped — no cartesian products,
no row-at-a-time Python, and nested-loop joins only where an exact O(n²)
baseline is the documented point of the query."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

#: queries whose WHOLE PURPOSE is the exact all-pairs baseline (verifiers for
#: the LSH/IVF scale paths) — the broadcast nested-loop join is the documented
#: opt-in there, never the production path
EXACT_BASELINES = {
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_quantized_topk",
    # PQ's compressed pass scores every (query, corpus) pair BY DESIGN — the
    # win is that the pass runs in the compressed domain and only the
    # shortlist joins back full vectors; the broadcast-queries nested loop is
    # the same documented shape as the exact baselines above
    "ann_pq_topk",
}

#: queries where a BroadcastNestedLoopJoin is a BOUNDED broadcast cross —
#: one side is driver-derived metadata that never grows with the table
#: (verdict grid = partition keys × check-name literals; single-row corpus
#: totals / stats frames). Constant-size build side → scale-safe.
BOUNDED_BROADCAST_CROSS = {
    "transcripts_verdicts",  # keys × CHECK_NAMES literals
    "unigram_logprob",       # single-row vocabulary total
    "transcripts_profile",   # single-row stats / bounded head-sample frame
    "profile_compare_runs",  # two profile() calls, same head-sample frame
    "ks_drift_turn_idx",     # single-row (lo, hi) bounds frame for quantization
    "conv_hot_keys",         # single-row corpus-total frame joined to ≤ top_n rows
    "value_outliers",        # single-row quantile-bounds frame (checks/outliers.py)
    "infer_role_domain",     # single-row non-null-total frame over ≤ max_values rows
    "value_histogram_equidepth",  # single-row quantile-edges frame (checks/drift.py)
    "temporal_self_drift",   # single-row median-ts frame (checks/drift.py)
    "role_transition_drift",  # single-row median-transition-ts frame (alternation.py)
    "transition_chi2",       # same single-row median frame (alternation.transition_chi2)
    "bm25_search",           # single-row corpus-stats frame (datapipe/retrieval.py)
    "wasserstein_value_drift",  # single-row (lo, hi) bounds frame (checks/ksdrift.py)
    "hybrid_search_rrf",     # BM25 leg's single-row corpus-stats frame (retrieval.py)
    "tfidf_top_terms",       # single-row N-docs frame (retrieval.py tfidf)
    "sampled_validation_estimate",  # single-row sampled-turn total × |checks| grid
    "shared_prefixes",       # single-row eligible-conversation total frame (convstats.py)
    "dedup_impact",          # single-row corpus-total frame (graph.py impact report)
    "windowed_drift_stream",  # bounded windows × bucket-domain grid (drift.py)
    "windowed_ks_drift",     # bounded windows × grid-point cross (ksdrift.py)
    "windowed_ks_stream",    # same report tail over stream-emitted counts
}

ALL_QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_plan_is_scale_shaped(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python in plan"
    if name not in EXACT_BASELINES | BOUNDED_BROADCAST_CROSS:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the documented exact baselines"
            " and bounded broadcast crosses"
        )
