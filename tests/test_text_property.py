"""Property tests: text-family operators equal pure-Python models.

Same method as test_typeladder_property (which caught the r4 Java-suffix
ladder divergence): a straightforward Python model of the documented
semantics, compared against the Spark expression on hypothesis-generated
inputs in one batch per example.

Alphabet note: strategies stay on space-separated printable ASCII because
Spark's ``trim`` strips only ASCII spaces while Python ``strip()`` eats all
whitespace — the operators' contract is whitespace-token text, and the
fixtures/oracles never feed control characters, so the model matches on the
supported domain.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, assume, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))

#: words over a tiny alphabet so shingles collide often (dup-rate exercised)
_word = st.text(alphabet="ab1", min_size=1, max_size=3)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _toks(text: str) -> list[str]:
    """dedup._tokens model: split(trim(text), '\\s+') — '' yields ['']."""
    return re.split(r"\s+", text.strip(" "))


def _shingles_model(text: str, k: int) -> list[str]:
    toks = _toks(text)
    n = len(toks)
    # n-k+1 full windows; short texts yield ONE shingle of all tokens
    return [" ".join(toks[i : i + k]) for i in range(max(n - k + 1, 1))]


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=10), st.sampled_from([2, 3, 4]))
def test_word_shingles_matches_model(spark, texts, k):
    from schema_infer_plugin_spark.datapipe.dedup import word_shingles

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["sh"]
        for r in df.select("i", word_shingles(F.col("t"), k).alias("sh")).collect()
    }
    assert got == {i: _shingles_model(t, k) for i, t in enumerate(texts)}


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=8))
def test_dup_ngram_rate_matches_model(spark, texts):
    from schema_infer_plugin_spark.datapipe import dup_ngram_rate

    k = 2
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["dup_shingles"], r["dup_rate"])
        for r in dup_ngram_rate(df, "doc_id", "text", shingle_k=k).collect()
    }
    sets = {i: set(_shingles_model(t, k)) for i, t in enumerate(texts)}
    freq: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            freq[sh] = freq.get(sh, 0) + 1
    want = {}
    for i, s in sets.items():
        dup = sum(1 for sh in s if freq[sh] >= 2)
        want[i] = (len(s), dup, round(dup / len(s), 6))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(_text, min_size=1, max_size=6),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=0, max_value=2),
)
def test_chunk_documents_matches_model(spark, texts, max_tokens, overlap):
    from schema_infer_plugin_spark.datapipe.text import chunk_documents

    assume(overlap < max_tokens)  # overlap >= max_tokens raises by contract
    stride = max_tokens - overlap
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_chunks"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, "doc_id", "text", max_tokens, overlap).collect()
    )
    want = []
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip(" ")) if t.strip(" ") else []
        n = len(toks)
        n_chunks = 1 + max((n - max_tokens + stride - 1) // stride, 0)
        for c in range(n_chunks):
            chunk = toks[c * stride : c * stride + max_tokens]
            want.append((i, c, n_chunks, " ".join(chunk), len(chunk)))
    assert got == sorted(want)
    # invariants the model restates: every doc represented, full coverage in
    # order with exactly `overlap` tokens shared between adjacent full chunks
    assert {w[0] for w in want} == set(range(len(texts)))


def _grid_quantize_model(v: float, lo: float, hi: float, n: int) -> float:
    """Pure-Python mirror of checks/ksdrift.grid_quantize — SAME float ops in
    the SAME association: step is Python-folded (hi-lo)/n, the output edge is
    lo + (bkt*(hi-lo))/n, clamp before bucket."""
    import math

    if hi <= lo:
        return float(lo)
    clamped = max(min(v, float(hi)), float(lo))
    # math.floor of the IEEE division — NOT //, which floors the exact
    # rational quotient and can differ by 1 when the division rounds up
    # to an integer
    bkt = min(math.floor((clamped - lo) / ((hi - lo) / n)), n - 1)
    return float(lo) + (bkt * (hi - lo)) / n


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from([(0.0, 64.0, 16), (-5.0, 5.0, 7), (0.03, 327.53, 1000), (2.0, 2.0, 10)]),
)
def test_grid_quantize_matches_model(spark, values, grid):
    """grid_quantize (the fixed-grid numeric-drift quantizer) matches the
    Python model bit-for-bit on finite doubles, including out-of-range clamps
    onto the edge buckets and the degenerate hi<=lo single-point grid."""
    from pyspark.sql import functions as F

    from schema_infer_plugin_spark.checks.ksdrift import grid_quantize

    lo, hi, n = grid
    df = spark.createDataFrame([(v,) for v in values], "v: double")
    got = [
        r["q"]
        for r in df.select(grid_quantize(F.col("v"), lo, hi, n).alias("q"))
        .collect()
    ]
    want = [_grid_quantize_model(v, lo, hi, n) for v in values]
    assert got == want


def _shared_prefixes_model(convs, k, min_count):
    """Pure-Python shared_prefixes: stable order (turn_idx, role,
    text-NULLS-FIRST), first-k render with '<null>' coalescing, md5 keying,
    cnt==k eligibility, min_count cut, round-6 share over eligible convs."""
    import hashlib

    prefixes: dict[str, list[str]] = {}
    eligible = 0
    for cid, turns in convs.items():
        if len(turns) < k:
            continue
        eligible += 1
        ordered = sorted(
            turns, key=lambda t: (t[0], t[1], t[2] is not None, t[2] or "")
        )
        parts = [
            f"{r}:{x if x is not None else '<null>'}" for _, r, x in ordered[:k]
        ]
        key = hashlib.md5("\n".join(parts).encode()).hexdigest()
        prefixes.setdefault(key, []).append(cid)
    return {
        key: (len(cids), min(cids), round(len(cids) / eligible, 6))
        for key, cids in prefixes.items()
        if len(cids) >= min_count
    }


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.sampled_from("ua"),
                st.one_of(st.none(), st.text(alphabet="xy", max_size=2)),
            ),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([1, 2]),
    st.sampled_from([1, 2]),
)
def test_shared_prefixes_matches_model(spark, convs, k, min_count):
    """shared_prefixes equals the Python model, including duplicate
    turn_idx tie-breaks, NULL-text rendering, short-conversation
    exclusion from the share denominator, and md5 prefix keys. share ==
    exactly: denominators ≤ 8 never hit a 6-decimal rounding halfway."""
    from schema_infer_plugin_spark.datapipe import shared_prefixes

    conv_map = {f"c{i}": turns for i, turns in enumerate(convs)}
    rows = [
        (cid, idx, role, text, None, None)
        for cid, turns in conv_map.items()
        for idx, role, text in turns
    ]
    assume(rows)  # createDataFrame needs at least one row for this schema
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {
        r["prefix_key"]: (r["n_convs"], r["sample_conv"], r["share"])
        for r in shared_prefixes(df, k=k, min_count=min_count).collect()
    }
    assert got == _shared_prefixes_model(conv_map, k, min_count)
