"""Product-quantization ANN (datapipe/ann.py): codebook shape, exact
reconstruction when vectors coincide with codewords, and rerank equivalence
to the exact baseline when the shortlist covers the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from schema_infer_plugin_spark.datapipe.ann import (
    ann_bruteforce_topk,
    ann_pq_topk,
    pq_codebook,
    pq_encode,
    pq_reconstruct,
)

DIM, M, CODES = 8, 4, 4


def _corpus(spark, n=12):
    # deterministic distinct vectors; the first CODES by md5(id) become the
    # codebook, so those reconstruct exactly
    rows = [
        (i, [float((3 * i + 7 * d) % 11) for d in range(DIM)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codebook_shape_and_dim_guard(spark):
    emb = _corpus(spark)
    cb = pq_codebook(emb, "vec_id", "embedding", m=M, n_codes=CODES)
    assert len(cb) == M and all(len(b) == CODES for b in cb)
    assert all(len(w) == DIM // M for b in cb for w in b)
    import pytest

    with pytest.raises(ValueError):
        pq_codebook(emb, "vec_id", "embedding", m=3, n_codes=CODES)


def test_empty_corpus_and_malformed_codebook_rejected(spark):
    import pytest

    emb = _corpus(spark)
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="no vectors"):
        pq_codebook(empty, "vec_id", "embedding", m=M, n_codes=CODES)
    # codebook=[] is a malformed argument, not a recompute request
    with pytest.raises(ValueError, match="codebook"):
        ann_pq_topk(emb.limit(1), emb, "vec_id", "embedding", k=1, codebook=[])


def test_sampled_vectors_reconstruct_exactly(spark):
    emb = _corpus(spark)
    cb = pq_codebook(emb, "vec_id", "embedding", m=M, n_codes=CODES)
    sampled_ids = {
        r["vec_id"]
        for r in emb.withColumn("r", F.md5(F.col("vec_id").cast("string")))
        .orderBy("r", "vec_id")
        .limit(CODES)
        .collect()
    }
    recon = emb.select(
        "vec_id",
        "embedding",
        pq_reconstruct(pq_encode(F.col("embedding"), cb), cb).alias("rv"),
    ).collect()
    for r in recon:
        if r["vec_id"] in sampled_ids:
            assert r["rv"] == r["embedding"], r["vec_id"]


def test_rerank_covering_corpus_equals_bruteforce(spark):
    emb = _corpus(spark)
    qs = emb.filter(F.col("vec_id") % 4 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann_bruteforce_topk(emb, qs, k=3).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann_pq_topk(
            emb, qs, k=3, m=M, n_codes=CODES, rerank=100
        ).collect()
    }
    assert pq == exact


def test_rerank_none_ranks_on_reconstructed(spark):
    emb = _corpus(spark)
    qs = emb.filter(F.col("vec_id") == 0)
    out = ann_pq_topk(emb, qs, k=3, m=M, n_codes=CODES, rerank=None).collect()
    assert len(out) == 3 and [r["rank"] for r in out] == [1, 2, 3]


def test_ivfpq_probe_all_with_full_rerank_equals_bruteforce(spark):
    """With every cell probed and a corpus-sized rerank shortlist, IVF-PQ
    degrades to exact search — the composition loses candidates ONLY through
    cell routing and shortlist truncation, never through scoring."""
    from schema_infer_plugin_spark.datapipe.ann import ann_ivfpq_topk

    emb = _corpus(spark, n=16)
    qs = emb.filter(F.col("vec_id") < 3)
    exact = ann_bruteforce_topk(emb, qs, k=2)
    composed = ann_ivfpq_topk(
        emb, qs, k=2, n_cells=4, n_probe=4, m=M, n_codes=CODES, rerank=100
    )
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b


def test_ivfpq_reuses_persisted_artifacts(spark, tmp_path):
    """One index build serves IVF, PQ, and the IVF-PQ composition: results
    from loaded artifacts are identical to a fresh derivation."""
    from schema_infer_plugin_spark.datapipe.ann import (
        ann_ivfpq_topk,
        ivf_centroids,
        pq_codebook,
    )
    from schema_infer_plugin_spark.datapipe.index_store import (
        load_ivf_centroids,
        load_pq_codebook,
        save_ivf_centroids,
        save_pq_codebook,
    )

    emb = _corpus(spark, n=16)
    qs = emb.filter(F.col("vec_id") < 2)
    cents = ivf_centroids(emb, "vec_id", "embedding", n_cells=4)
    cb = pq_codebook(emb, "vec_id", "embedding", m=M, n_codes=CODES)
    save_ivf_centroids(spark, cents, str(tmp_path / "c"))
    save_pq_codebook(spark, cb, str(tmp_path / "b"))
    fresh = ann_ivfpq_topk(emb, qs, k=2, n_cells=4, n_probe=2, m=M, n_codes=CODES)
    reused = ann_ivfpq_topk(
        emb, qs, k=2, n_probe=2,
        centroids=load_ivf_centroids(spark, str(tmp_path / "c")),
        codebook=load_pq_codebook(spark, str(tmp_path / "b")),
    )
    assert sorted(map(tuple, fresh.collect())) == sorted(map(tuple, reused.collect()))


def test_pq_reconstructed_fused_equals_encode_then_reconstruct(spark):
    """The fused argmin-carrying-codeword form must pick byte-identical
    reconstructions to the two-step encode->reconstruct path (same metric,
    same tie order) — it exists purely to avoid CollapseProject inlining the
    encode tree into every reconstruct branch."""
    from schema_infer_plugin_spark.datapipe.ann import (
        pq_codebook,
        pq_encode,
        pq_reconstruct,
        pq_reconstructed,
    )

    emb = _corpus(spark, n=16)
    cb = pq_codebook(emb, "vec_id", "embedding", m=M, n_codes=CODES)
    two_step = emb.select(
        "vec_id", pq_reconstruct(pq_encode(F.col("embedding"), cb), cb).alias("rv")
    )
    fused = emb.select("vec_id", pq_reconstructed(F.col("embedding"), cb).alias("rv"))
    a = {r["vec_id"]: list(r["rv"]) for r in two_step.collect()}
    b = {r["vec_id"]: list(r["rv"]) for r in fused.collect()}
    assert a == b


def test_arrow_impl_bit_parity_on_real_embeddings(spark):
    """expr vs arrow twins of every IVF/PQ projection must be BIT-identical
    on the sandbox embeddings (VERDICT r4 #3): the Arrow paths accumulate
    dots sequentially over the dimension axis, reproducing the F.aggregate
    fold exactly, so this holds by construction — asserted here on real data
    for cells, codes, fused reconstructions, probe lists, and code decode."""
    from schema_infer_plugin_spark.datapipe.ann import (
        _probe_cells,
        ivf_centroids,
        nearest_cell,
        pq_codebook,
        pq_encode,
        pq_reconstruct,
        pq_reconstructed,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    cb = pq_codebook(emb, "vec_id", "embedding", m=16, n_codes=8)

    def proj(impl):
        return sorted(
            tuple(r)
            for r in emb.select(
                "vec_id",
                nearest_cell(F.col("embedding"), cents, impl=impl).alias("cell"),
                pq_encode(F.col("embedding"), cb, impl=impl).alias("codes"),
                pq_reconstructed(F.col("embedding"), cb, impl=impl).alias("rv"),
                _probe_cells(F.col("embedding"), cents, 2, impl).alias("probes"),
                pq_reconstruct(
                    pq_encode(F.col("embedding"), cb, impl=impl), cb, impl=impl
                ).alias("dv"),
            ).collect()
        )

    assert proj("expr") == proj("arrow")


def test_ivfpq_arrow_impl_end_to_end_parity(spark):
    """ann_ivfpq_topk(impl='arrow') returns row-identical results to the
    expression path (and 'auto' resolves by the shared literal budget)."""
    from schema_infer_plugin_spark.datapipe.ann import ann_ivfpq_topk
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 20 == 0)
    kw = dict(k=3, n_cells=8, n_probe=2, m=16, n_codes=8, rerank=20)
    a = sorted(map(tuple, ann_ivfpq_topk(emb, qs, impl="expr", **kw).collect()))
    b = sorted(map(tuple, ann_ivfpq_topk(emb, qs, impl="arrow", **kw).collect()))
    assert a == b and len(a) > 0


def test_impl_auto_threshold_resolution():
    """auto flips to arrow strictly past _EXPR_PATH_MAX_LITERALS."""
    from schema_infer_plugin_spark.datapipe.ann import (
        _EXPR_PATH_MAX_LITERALS,
        _resolve_impl,
    )
    import pytest

    assert _resolve_impl("auto", _EXPR_PATH_MAX_LITERALS) == "expr"
    assert _resolve_impl("auto", _EXPR_PATH_MAX_LITERALS + 1) == "arrow"
    assert _resolve_impl("expr", 10**9) == "expr"
    with pytest.raises(ValueError, match="impl"):
        _resolve_impl("vectorized", 1)
