"""Persisted ANN index artifacts (datapipe/index_store.py): parquet
round-trip parity (loaded centroids/codebook identical to the built ones,
and the queries they parameterize return identical rows), corrupt-artifact
rejection, and the CLI ``index`` subcommand end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_infer_plugin_spark.datapipe.ann import (
    ann_ivf_topk,
    ann_pq_topk,
    ivf_centroids,
    pq_codebook,
    pq_encode,
)
from schema_infer_plugin_spark.datapipe.dedup import (
    lsh_pairs_vs_index,
    minhash_signatures,
    semantic_dedup_pairs,
)
from schema_infer_plugin_spark.datapipe.index_store import (
    build_vector_index,
    load_ivf_centroids,
    load_pq_codebook,
    save_ivf_centroids,
    save_pq_codebook,
)

DIM = 8


def _corpus(spark, n=20):
    rows = [
        (i, [float((5 * i + 3 * d) % 13) - 6.0 for d in range(DIM)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_centroids_roundtrip_and_query_parity(spark, tmp_path):
    emb = _corpus(spark)
    cents = ivf_centroids(emb, "vec_id", "embedding", n_cells=4)
    path = str(tmp_path / "ivf")
    save_ivf_centroids(spark, cents, path)
    loaded = load_ivf_centroids(spark, path)
    assert loaded == cents  # parquet doubles are exact

    q = emb.filter(F.col("vec_id") < 3)
    fresh = ann_ivf_topk(emb, q, k=2, n_cells=4)
    reused = ann_ivf_topk(emb, q, k=2, centroids=loaded)
    assert _rows(fresh) == _rows(reused)


def test_pq_codebook_roundtrip_and_code_parity(spark, tmp_path):
    emb = _corpus(spark)
    cb = pq_codebook(emb, "vec_id", "embedding", m=4, n_codes=4)
    path = str(tmp_path / "pq")
    save_pq_codebook(spark, cb, path)
    loaded = load_pq_codebook(spark, path)
    assert loaded == cb

    codes_fresh = _rows(emb.select("vec_id", pq_encode(F.col("embedding"), cb).alias("c")))
    codes_loaded = _rows(
        emb.select("vec_id", pq_encode(F.col("embedding"), loaded).alias("c"))
    )
    assert codes_fresh == codes_loaded

    q = emb.filter(F.col("vec_id") < 2)
    fresh = ann_pq_topk(emb, q, k=2, m=4, n_codes=4, rerank=10)
    reused = ann_pq_topk(emb, q, k=2, rerank=10, codebook=loaded)
    assert _rows(fresh) == _rows(reused)


def test_semantic_dedup_reuses_loaded_centroids(spark, tmp_path):
    emb = _corpus(spark)
    # a tight near-dup pair so the check is non-vacuous
    dup = spark.createDataFrame(
        [(100, [float((5 * 1 + 3 * d) % 13) - 6.0 + 1e-4 for d in range(DIM)])],
        "vec_id long, embedding array<double>",
    )
    corpus = emb.union(dup)
    cents = ivf_centroids(corpus, "vec_id", "embedding", n_cells=3)
    path = str(tmp_path / "ivf_sem")
    save_ivf_centroids(spark, cents, path)
    loaded = load_ivf_centroids(spark, path)
    fresh = semantic_dedup_pairs(corpus, "vec_id", "embedding", n_cells=3)
    reused = semantic_dedup_pairs(
        corpus, "vec_id", "embedding", centroids=loaded
    )
    assert _rows(fresh) == _rows(reused)
    assert fresh.count() >= 1


def test_corrupt_artifacts_rejected(spark, tmp_path):
    # empty artifact
    empty = str(tmp_path / "empty")
    spark.createDataFrame([], "cell int, vector array<double>").write.parquet(empty)
    with pytest.raises(ValueError, match="no centroid rows"):
        load_ivf_centroids(spark, empty)
    # non-contiguous cell ids (e.g. a filtered/partial write)
    holey = str(tmp_path / "holey")
    spark.createDataFrame(
        [(0, [1.0]), (2, [2.0])], "cell int, vector array<double>"
    ).write.parquet(holey)
    with pytest.raises(ValueError, match="not 0..n-1"):
        load_ivf_centroids(spark, holey)
    # ragged codebook grid
    ragged = str(tmp_path / "ragged")
    spark.createDataFrame(
        [(0, 0, [1.0]), (0, 1, [2.0]), (1, 0, [3.0])],
        "block int, code int, subvector array<double>",
    ).write.parquet(ragged)
    with pytest.raises(ValueError, match="ragged"):
        load_pq_codebook(spark, ragged)


def test_minhash_band_index_build_and_incremental_join(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "an entirely different document about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "bands")
    manifest = build_vector_index(
        docs, "doc_id", "text", kind="minhash", out=out, num_hashes=16, bands=4
    )
    assert manifest["rows"] == 2 * 4  # one row per (doc, band)
    index = spark.read.parquet(out)
    # an increment that duplicates doc 1 must hit the persisted index
    inc = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    sig_new = minhash_signatures(inc, "doc_id", "text")
    hits = lsh_pairs_vs_index(sig_new, index, "doc_id", min_est_jaccard=0.9)
    got = hits.collect()
    assert len(got) == 1 and got[0]["id_old"] == 1 and got[0]["est_jaccard"] == 1.0


def test_cli_index_subcommand(tmp_path, spark):
    # spark fixture keeps the shared session alive; the CLI reuses it via
    # getOrCreate, so this stays fast
    from schema_infer_plugin_spark.cli import main

    out = str(tmp_path / "cli_ivf")
    rc = main(
        [
            "index",
            "--input", "/root/testdata/sf0.001",
            "--table", "embeddings",
            "--kind", "ivf",
            "--n-cells", "4",
            "--out", out,
        ]
    )
    assert rc == 0
    cents = load_ivf_centroids(spark, out)
    assert len(cents) == 4 and all(len(v) > 0 for v in cents)

    out_pq = str(tmp_path / "cli_pq")
    rc = main(
        [
            "index",
            "--input", "/root/testdata/sf0.001",
            "--table", "embeddings",
            "--kind", "pq",
            "--m", "4",
            "--n-codes", "4",
            "--out", out_pq,
        ]
    )
    assert rc == 0
    cb = load_pq_codebook(spark, out_pq)
    assert len(cb) == 4 and all(len(b) == 4 for b in cb)


def test_build_ivf_index_with_refinement_roundtrips(spark, tmp_path):
    """refine_sweeps flows through build_vector_index into the SAME
    (cell, vector) artifact format — consumers can't tell refined from
    sampled centroids except by quality."""
    from schema_infer_plugin_spark.datapipe.ann import (
        ivf_centroids,
        refine_ivf_centroids,
    )
    from schema_infer_plugin_spark.datapipe.index_store import (
        build_vector_index,
        load_ivf_centroids,
    )

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = str(tmp_path / "ivf_refined")
    manifest = build_vector_index(
        emb, "vec_id", "embedding", "ivf", out, n_cells=4, refine_sweeps=1
    )
    assert manifest["rows"] == 4 and manifest["refine_sweeps"] == 1
    loaded = load_ivf_centroids(spark, out)
    direct = refine_ivf_centroids(
        emb, "vec_id", "embedding",
        ivf_centroids(emb, "vec_id", "embedding", 4), sweeps=1,
    )
    assert len(loaded) == 4
    # same grid shape and (modulo FP summation order) the same centroids
    for lv, dv in zip(loaded, direct):
        assert len(lv) == len(dv)
        for a, b in zip(lv, dv):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b))


def test_cli_index_pre_check_gate(tmp_path, spark):
    """--pre-check-dim aborts an ivf/pq build on a corrupt embedding column
    BEFORE training; a clean table passes the gate and builds normally."""
    from pyspark.sql import functions as F

    from schema_infer_plugin_spark.cli import main

    ok_out = str(tmp_path / "gated_ok")
    rc = main(
        ["index", "--input", "/root/testdata/sf0.001", "--table", "embeddings",
         "--kind", "ivf", "--n-cells", "4", "--pre-check-dim", "64",
         "--out", ok_out]
    )
    assert rc == 0 and load_ivf_centroids(spark, ok_out)

    bad_dir = str(tmp_path / "tbl")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 50 == 0, F.slice("embedding", 1, 10))
        .otherwise(F.col("embedding")),
    ).write.parquet(bad_dir + "/embeddings.parquet")
    bad_out = str(tmp_path / "gated_bad")
    rc = main(
        ["index", "--input", bad_dir, "--table", "embeddings",
         "--kind", "ivf", "--n-cells", "4", "--pre-check-dim", "64",
         "--out", bad_out]
    )
    assert rc == 1
    import os as _os

    assert not _os.path.exists(bad_out)  # nothing trained, nothing persisted
