"""Keyword retrieval: BM25 top-k scoring over a document corpus.

Term-based retrieval is the lexical complement to the embedding-ANN path
(datapipe/ann.py) in a training-data pipeline: finding the documents that
mention a benchmark's surface strings, pulling topical subsets for curriculum
mixes, spot-checking dedup clusters. The reference has no retrieval at all;
the scoring function here is the public Okapi BM25 formula (Robertson &
Zaragoza 2009) — nothing proprietary.

Plan shape — NO inverted index, NO explode, NO per-token shuffle:

1. one projection computes, per row, the document length and the per-query-
   term frequencies in a SINGLE traversal of the token array (one
   ``aggregate`` fold whose accumulator is ``struct(tf array, dl)`` —
   tokenization stays in argument position, so the engine-wide
   lambda-capture pathology documented in functions/textstats.py cannot
   re-tokenize per element);
2. one tiny aggregation reduces that to the corpus stats BM25 needs
   (N, Σdl, per-term document frequency) — a one-row frame;
3. the stats row is broadcast back (crossJoin of a 1-row frame), the score is
   a pure per-row expression, and top-k is ``orderBy().limit(k)`` — Spark's
   distributed TakeOrdered, never a global sort or a single-partition window.

Cost at 100 TB: two scans of the text column (stats + scoring), zero wide
shuffles; per-row work is O(tokens × query_terms) with a handful of terms.
Scores are rounded to 6 decimals BEFORE the final ordering so rank order is
reproducible across engines (ln() differs in the last ulp between libm
implementations; 10⁻⁶ rounding absorbs it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empty strings dropped — identical to the
    unigram_logprob tokenizer (datapipe/text.py) and its DuckDB mirror."""
    return F.filter(
        F.transform(F.split(F.trim(text), r"\s+"), lambda x: F.lower(x)),
        lambda x: F.length(x) > 0,
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query_terms``.

    Output: ``(id_col, n_matched_terms, score)`` — only docs matching at
    least one term, ordered by (score desc, id) with the score rounded to 6
    decimals before ranking (cross-engine determinism; see module docstring).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    n_terms = len(terms)
    terms_arr = F.array(*[F.lit(t) for t in terms])

    # per-row fold: ONE traversal of the token array yields doc length + all
    # term frequencies. terms_arr inside the lambda body is literals-only
    # (free to re-evaluate); the token array itself is in argument position.
    zero = F.struct(
        F.array_repeat(F.lit(0).cast("long"), n_terms).alias("tf"),
        F.lit(0).cast("long").alias("dl"),
    )
    fold = F.aggregate(
        _tokens(F.col(text_col)),
        zero,
        lambda acc, x: F.struct(
            F.zip_with(acc.tf, terms_arr, lambda c, t: c + (x == t).cast("long")).alias("tf"),
            (acc.dl + F.lit(1).cast("long")).alias("dl"),
        ),
    )
    per = docs.select(F.col(id_col), fold.alias("s"))

    stats = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("s.dl")).cast("long").alias("sum_dl"),
        *[
            F.sum((F.col("s.tf")[i] > 0).cast("long")).cast("long").alias(f"df_{i}")
            for i in range(n_terms)
        ],
    )

    joined = per.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    dl = F.col("s.dl").cast("double")
    score = None
    matched = None
    # explicit left-to-right accumulation: the oracle SQL is generated with
    # the same association so float results agree bit-for-bit pre-rounding
    for i in range(n_terms):
        tf = F.col("s.tf")[i].cast("double")
        dfi = F.col(f"df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfi + F.lit(0.5)) / (dfi + F.lit(0.5)))
        term = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl))
        hit = (F.col("s.tf")[i] > 0).cast("int")
        score = term if score is None else score + term
        matched = hit if matched is None else matched + hit
    out = joined.select(
        F.col(id_col),
        matched.cast("int").alias("n_matched_terms"),
        F.round(score, 6).cast("double").alias("score"),
    ).filter(F.col("score") > 0)
    return out.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document — per-doc keyword extraction
    (topical labels for curriculum mixes, dedup-cluster spot-check summaries,
    the doc-side complement to :func:`bm25_topk`'s query-side scoring).

    ``idf = ln((N + 1) / (df + 1)) + 1`` (the standard smoothed variant), so
    idf ≥ 1 > 0 and scores are never negative. Scores are rounded to 6
    decimals BEFORE ranking with ``term`` as the tie-breaker (module
    invariant: ln() ulp noise must never reorder a cut).

    Plan: tokenize-lowercase explode → (doc, term) hash agg (tf) → term hash
    agg over the already-doc-distinct frame (df) → equi-join back on term →
    one-row N frame broadcast-crossed → per-doc row_number window. The df
    join on a viral term (a stopword) is linear in that term's doc count and
    AQE-skew-splittable; the window partition is one document's vocabulary —
    bounded by doc length, never corpus-sized.

    Output: ``(id_col, term, tf bigint, score double)``, ≤ ``top_k`` rows per
    doc; docs with no tokens are absent.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("_n_docs"))
    idf = F.log((F.col("_n_docs") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0))) + F.lit(1.0)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "_id",
            "term",
            "tf",
            F.round(F.col("tf") * idf, 6).cast("double").alias("score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .select(F.col("_id").alias(id_col), "term", "tf", "score")
    )


# ---------------------------------------------------------------------------
# feature-hashed vectors + hybrid (lexical ∪ vector) retrieval
# ---------------------------------------------------------------------------


def hashed_bucket(token: Column, dim: int) -> Column:
    """md5-derived feature-hashing bucket of a token (first 8 hex digits mod
    ``dim``) — the same reproducible-hash recipe as MinHash
    (datapipe/dedup.py) so both engines agree on every bucket."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % dim


def hashed_tf_vector(text: Column, dim: int = 64) -> Column:
    """Feature-hashed term-frequency vector (``dim`` buckets) of a text —
    the classic hashing-trick vectorizer: no vocabulary, no fit pass, so it
    is a PURE PROJECTION at any corpus size.

    Plan: tokens → buckets in one pre-transform (md5 once per token, kept in
    argument position — the lambda-capture pathology documented in
    functions/textstats.py), then a single fold incrementing the bucket's
    slot; O(dim) adds per token, zero exchanges. Output array<double> (ready
    for functions/vectors cosine math).
    """
    buckets = F.transform(_tokens(text), lambda x: hashed_bucket(x, dim))
    return F.aggregate(
        buckets,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.transform(
            acc, lambda v, i: v + (b == i.cast("long")).cast("double")
        ),
    )


def hashed_tf_query_vector(query_text: str, dim: int = 64) -> list[float]:
    """Driver-side constant: the :func:`hashed_tf_vector` of a query string,
    computed in plain Python (``hashlib.md5`` — identical arithmetic) so the
    plan carries ``dim`` literals instead of a per-row literal fold."""
    import hashlib

    vec = [0.0] * dim
    for tok in query_text.strip().lower().split():
        if tok:
            vec[int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim] += 1.0
    return vec


def hashed_cosine_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_text: str,
    dim: int = 64,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by cosine similarity between feature-hashed TF
    vectors — the zero-training vector leg of hybrid retrieval. Brute-force
    scoring against ONE broadcast-free literal query vector (pure per-row
    expression); top-k via distributed TakeOrdered. For corpus-vs-corpus
    similarity at scale use the LSH/IVF paths (datapipe/ann.py) instead.

    Output: ``(id_col, score)`` — score rounded to 6 decimals BEFORE ranking
    (same cross-engine determinism argument as BM25), zero-score docs
    dropped.
    """
    from ..functions.vectors import cosine_similarity

    qv = F.array(*[F.lit(x) for x in hashed_tf_query_vector(query_text, dim)])
    scored = docs.select(
        F.col(id_col),
        F.round(cosine_similarity(qv, hashed_tf_vector(F.col(text_col), dim)), 6)
        .cast("double")
        .alias("score"),
    ).filter(F.col("score") > 0)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of ranked
    lists: ``score(d) = Σ_lists 1/(k + rank_d)`` — the standard score-free
    way to combine lexical (BM25) and vector rankings in hybrid search.

    Each input needs ``(id_col, rank)`` with rank 1-based; inputs are
    bounded top-k frames, so everything here operates on ≤ Σ|lists| rows.
    Output: ``(id_col, rrf_score, n_lists, rank)`` — top ``topk`` by
    (score desc, id), score rounded to 6 decimals before ranking.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = rankings[0].select(F.col(id_col), F.col("rank").cast("long").alias("rank"))
    for r in rankings[1:]:
        tagged = tagged.unionByName(
            r.select(F.col(id_col), F.col("rank").cast("long").alias("rank"))
        )
    fused = tagged.groupBy(id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))), 6)
        .cast("double")
        .alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    top = fused.orderBy(F.desc("rrf_score"), F.col(id_col)).limit(topk)
    # rank annotation over the bounded ≤ topk result frame
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
