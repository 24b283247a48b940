"""Micro-fixture tests for the round-3 audit + retrieval additions:
referential integrity, snapshot diff, pattern conformity, BM25 top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from schema_infer_plugin_spark.checks.patterns import pattern_match_rates, pattern_violations
from schema_infer_plugin_spark.checks.referential import fk_coverage, fk_orphans, fk_verdict
from schema_infer_plugin_spark.checks.snapshot_diff import snapshot_diff, snapshot_diff_summary
from schema_infer_plugin_spark.datapipe.retrieval import bm25_topk


# ---------------------------------------------------------------------------
# referential
# ---------------------------------------------------------------------------


def _fk_frames(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")],
        "uid int, payload string",
    )
    # the NULL parent key is deliberate: not referenceable under SQL FK
    # semantics, it must not surface as a childless-parent group
    parent = spark.createDataFrame([(1,), (2,), (4,), (None,)], "user_id int")
    return child, parent


def test_fk_orphans_micro(spark):
    child, parent = _fk_frames(spark)
    got = fk_orphans(child, parent, {"uid": "user_id"})
    assert sorted(r.payload for r in got.collect()) == ["d"]  # NULL key excluded


def test_fk_coverage_and_verdict_micro(spark):
    child, parent = _fk_frames(spark)
    cov = {r.uid: (r.n_child_rows, r.in_parent) for r in fk_coverage(child, parent, {"uid": "user_id"}).collect()}
    assert cov == {1: (2, True), 2: (1, True), 3: (1, False), 4: (0, True)}
    v = fk_verdict(child, parent, {"uid": "user_id"}).collect()[0]
    assert (v.n_keys, v.n_orphan_keys, v.n_orphan_rows, v.n_childless_parents, v.passed) == (
        4, 1, 1, 1, False,
    )


def test_fk_clean_passes(spark):
    child, parent = _fk_frames(spark)
    clean = child.filter(F.col("uid") != 3)
    assert fk_verdict(clean, parent, {"uid": "user_id"}).collect()[0].passed


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------


def _snap_frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (5, "x", 1.0), (5, "y", 2.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (5, "x", 1.0), (5, "y", 2.0)],
        "k int, s string, v double",
    )
    return old, new


def test_snapshot_diff_micro(spark):
    old, new = _snap_frames(spark)
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 and dup-key 5 unchanged
    summary = {r.change: r.n_keys for r in snapshot_diff_summary(old, new, ["k"]).collect()}
    assert summary == {"changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_vs_empty_and_multiplicity(spark):
    old = spark.createDataFrame([(1, None), (2, "x"), (2, "x")], "k int, s string")
    new = spark.createDataFrame([(1, ""), (2, "x")], "k int, s string")
    got = {r.k: (r.change, r.n_old, r.n_new) for r in snapshot_diff(old, new, ["k"]).collect()}
    # NULL -> '' is a change; 2 copies -> 1 copy is a change even with equal bytes
    assert got == {1: ("changed", 1, 1), 2: ("changed", 2, 1)}


def test_snapshot_diff_dup_multiset_same_max(spark):
    # same count, same max(hash) per side, different multiset -> changed
    old = spark.createDataFrame([(1, "a"), (1, "b")], "k int, s string")
    new = spark.createDataFrame([(1, "b"), (1, "b")], "k int, s string")
    got = snapshot_diff(old, new, ["k"]).collect()
    assert [r.change for r in got] == ["changed"]


# ---------------------------------------------------------------------------
# patterns
# ---------------------------------------------------------------------------


def test_pattern_violations_micro(spark):
    df = spark.createDataFrame(
        [(1, "AB-12"), (2, "xx"), (3, None), (4, "ZZ-99")], "id int, code string"
    )
    got = pattern_violations(df, "code", r"^[A-Z]{2}-[0-9]{2}$", keys=["id"]).collect()
    assert [(r.id, r.observed) for r in got] == [(2, "xx")]


def test_pattern_match_rates_micro(spark):
    df = spark.createDataFrame(
        [(1, "AB-12", "u1"), (2, "xx", "u2"), (3, None, "nope"), (4, "ZZ-99", "u4")],
        "id int, code string, user string",
    )
    rows = {
        r.col_name: r
        for r in pattern_match_rates(
            df, {"code": r"^[A-Z]{2}-[0-9]{2}$", "user": r"^u[0-9]+$"}
        ).collect()
    }
    c = rows["code"]
    assert (c.n_rows, c.n_null, c.n_violations) == (4, 1, 1)
    assert math.isclose(c.match_rate, 1 - 1 / 3, abs_tol=1e-6)
    u = rows["user"]
    assert (u.n_null, u.n_violations) == (0, 1)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_py(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Independent plain-Python BM25 for the micro-fixture."""
    toks = {i: [w.lower() for w in t.split()] for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference_formula(spark):
    docs = {
        1: "spark shuffle join spark",
        2: "duck db oracle check",
        3: "spark oracle spark spark",
        4: "completely unrelated words here",
    }
    sdf = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {r.doc_id: r.score for r in bm25_topk(sdf, "doc_id", "text", ["spark", "oracle"], k=10).collect()}
    want = _bm25_py(docs, ["spark", "oracle"])
    assert set(got) == set(want)
    for i in got:
        assert math.isclose(got[i], want[i], abs_tol=2e-6), (i, got[i], want[i])


def test_bm25_topk_order_and_limit(spark):
    docs = {i: ("hit " * (i + 1)).strip() for i in range(6)}
    sdf = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = bm25_topk(sdf, "doc_id", "text", ["hit"], k=3).collect()
    assert len(got) == 3
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_single_tokenization_per_row(spark):
    # plan must evaluate the tokenizing fold once per scan, not once per
    # projected term column (CollapseProject must not inline the aggregate)
    sdf = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = bm25_topk(sdf, "doc_id", "text", ["a", "b", "c", "d"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(trim(") <= 2, plan  # one per scan (stats + scoring)


# ---------------------------------------------------------------------------
# hybrid retrieval: feature hashing + RRF
# ---------------------------------------------------------------------------


def test_hashed_tf_vector_matches_python_constant(spark):
    """The Spark-side hashed_tf_vector and the Python-side
    hashed_tf_query_vector must produce identical vectors for the same text
    (same md5 bucket arithmetic)."""
    from schema_infer_plugin_spark.datapipe.retrieval import (
        hashed_tf_query_vector,
        hashed_tf_vector,
    )

    text = "Spark shuffle WINDOW spark  "
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(hashed_tf_vector(F.col("text"), 16).alias("v"))
        .collect()[0]
    )
    assert row["v"] == hashed_tf_query_vector(text, 16)
    assert sum(row["v"]) == 4.0  # four tokens


def test_hashed_cosine_topk_self_retrieval(spark):
    from schema_infer_plugin_spark.datapipe.retrieval import hashed_cosine_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta unrelated")],
        "doc_id long, text string",
    )
    top = hashed_cosine_topk(docs, "doc_id", "text", "alpha beta gamma", dim=32, k=3).collect()
    assert top[0]["doc_id"] == 1 and top[0]["score"] == 1.0
    assert [r["doc_id"] for r in top[:2]] == [1, 3]


def test_rrf_fuse_known_scores(spark):
    from schema_infer_plugin_spark.datapipe.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r.asDict() for r in rrf_fuse([a, b], "doc_id", k=60, topk=3).collect()}
    assert out[20]["rrf_score"] == round(1 / 61 + 1 / 62, 6) and out[20]["n_lists"] == 2
    assert out[10]["rrf_score"] == round(1 / 61, 6) and out[10]["n_lists"] == 1
    assert out[20]["rank"] == 1
    # tie between 10 (rank 1 in a) and 30 (rank 2 in b)? no: 1/61 > 1/62
    assert out[10]["rank"] == 2 and out[30]["rank"] == 3
