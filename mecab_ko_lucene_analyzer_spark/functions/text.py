"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All are pure Catalyst expressions (whole-stage codegen, no Python in
the row path) over a ``documents``-shaped table ``(doc_id, text, ...)``
— each has an exact ANSI-SQL oracle (see ``__spark_entry__``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "whitespace_tokens",
    "token_counts",
    "quality_features",
    "language_id",
    "predicted_lang",
    "fingerprint",
    "stratified_sample",
    "weighted_sample",
    "chunk_documents",
    "term_vectors",
    "EN_STOPWORDS",
]

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it"]


def whitespace_tokens(text: Column | str = "text") -> Column:
    """SPACE-token array with empties removed (the shared exact
    tokenization for SQL-replicable operators). Splits on the single
    space character only — the DuckDB oracles mirror it with
    ``string_split(text, ' ')``, and the highlight offset math counts
    one separator char per boundary. Corpora with tab/newline
    separators should normalize whitespace at ingestion
    (``regexp_replace(text, '\\s+', ' ')``); :func:`fingerprint` does
    its own normalization because its CONTRACT is whitespace-run
    insensitivity."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def term_vectors(docs: DataFrame, text: str = "text") -> DataFrame:
    """ES ``_termvectors``: per-doc ``(doc_id, term, tf, positions)``
    with 0-based token positions (ascending ``array<int>``).

    The per-doc view of exactly what the inverted index stores per
    term — the debugging/feature-extraction counterpart of
    ``postings_tf`` (training pipelines use it for positional features
    and span labeling). Plan: posexplode + ONE hash aggregate keyed
    (doc_id, term) — ``sort_array(collect_list(...))`` is safe here
    because positions within one (doc, term) group are bounded by the
    doc length, never corpus-scale."""
    toks = whitespace_tokens(text)
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def token_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy (4-char chunks
    per token — a deterministic stand-in for a real BPE vocab)."""
    toks = whitespace_tokens(text)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        # long on purpose: the DuckDB oracle's list_sum returns a wide
        # integer — both sides pin BIGINT so the driver's value hash agrees
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.ceil(F.length(x) / 4.0).cast("int")
        )
        .cast("long")
        .alias("n_subwords"),
    )


def quality_features(docs: DataFrame, text: str = "text") -> DataFrame:
    """Length/stopword-ratio features + a coarse quality band."""
    toks = whitespace_tokens(F.lower(F.col(text)))
    d = docs.select(
        "doc_id",
        F.length(text).alias("text_len"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS))).alias("n_stop"),
    )
    return d.select(
        "doc_id",
        "text_len",
        "n_tokens",
        F.round(F.col("n_stop") / F.col("n_tokens"), 6).alias("stop_ratio"),
        F.when(F.col("n_tokens") < 20, "short")
        .when(F.col("n_stop") / F.col("n_tokens") > 0.1, "fluent")
        .otherwise("listy")
        .alias("quality_band"),
    )


def predicted_lang(text: Column | str = "text") -> Column:
    """The language label expression behind :func:`language_id`
    (shared so the WARC ingestion path cannot drift from the
    oracle-gated operator): hangul character ratio → ko; ≥2 English
    stopword tokens → en; else unknown."""
    c = F.col(text) if isinstance(text, str) else text
    toks = whitespace_tokens(F.lower(c))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(EN_STOPWORDS)))
    hangul_ratio = F.length(F.regexp_replace(c, "[^가-힣]", "")) / F.length(c)
    return (
        F.when(hangul_ratio > 0.3, "ko")
        .when(n_stop >= 2, "en")
        .otherwise("unknown")
    )


def language_id(docs: DataFrame, text: str = "text", lang: str = "lang") -> DataFrame:
    """Heuristic language-ID: hangul character ratio → ko; English
    stopword hits → en; else unknown. Returns the label column alongside
    for agreement analysis."""
    return docs.select(
        "doc_id",
        F.col(lang).alias("lang"),
        predicted_lang(F.col(text)).alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, text: str = "text") -> DataFrame:
    """Normalized-token-stream md5 fingerprint (near-dup prefilter /
    exact-dedup key that ignores case and whitespace runs). ALL
    whitespace (tabs, newlines, runs) collapses to one space before
    tokenizing, so re-crawls differing only in formatting fingerprint
    identically — whitespace_tokens alone is space-only by contract."""
    normalized = F.regexp_replace(F.lower(F.col(text)), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", whitespace_tokens(normalized))).alias(
            "fingerprint"
        ),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum: str = "lang",
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing step of a
    training-data pipeline (e.g. keep 100% of Korean, 10% of English,
    1% of everything else).

    The keep decision is a pure function of (seed, doc id): hash the id
    with the md5-derived 60-bit hash, reduce mod 1e6, keep the row when
    the bucket falls under ``fraction * 1e6``. No RNG state, no
    ``sample()`` — reruns, retries, and different partitionings all
    select the SAME rows (a reproducibility requirement for training
    corpora: the sample IS the dataset). A narrow filter — no shuffle,
    pushes past column pruning, and the scan-level predicate keeps it
    one pass at any scale. Exactly replicable in the oracle.
    """
    from .hashing import md5_h64

    bucket = md5_h64(F.concat(F.lit(f"sample-{seed}-"), F.col(id_col).cast("string"))) % F.lit(
        1_000_000
    )
    frac = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum) == value, F.lit(f)).otherwise(frac)
    return docs.filter(bucket < frac * 1_000_000)


def weighted_sample(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability ``clamp(weight, 0, 1)`` — the quality-weighted corpus
    cut of a training pipeline (keep high-quality pages always, noisy
    pages proportionally; Brown/CCNet-style quality-bucket mixing is
    this with a bucketed weight expression).

    Same machinery as :func:`stratified_sample`: the keep decision is
    a pure function of (seed, doc id) via the md5-derived 60-bit hash
    reduced mod 1e6 — reruns, retries, and repartitionings select the
    SAME rows, and the oracle replays it exactly. A weight >= 1 keeps
    the row unconditionally; <= 0 always drops. Narrow filter — zero
    shuffle at any scale."""
    from .hashing import md5_h64

    bucket = md5_h64(
        F.concat(F.lit(f"wsample-{seed}-"), F.col(id_col).cast("string"))
    ) % F.lit(1_000_000)
    p = F.greatest(F.least(weight.cast("double"), F.lit(1.0)), F.lit(0.0))
    return docs.filter(bucket < p * 1_000_000)


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    stride: int | None = None,
    text: str = "text",
) -> DataFrame:
    """Sliding-window chunking — the context-window prep step of an
    LLM training pipeline: split each doc's token sequence into
    windows of ``max_tokens`` tokens starting every ``stride`` tokens
    (``stride < max_tokens`` = overlapping windows for long-context
    training; ``stride == max_tokens``, the default, = disjoint
    packing). Returns ``(doc_id, chunk_id, n_tokens, chunk_text)``
    with ``chunk_id`` 0-based per doc; the final window may be short;
    empty docs emit nothing.

    Plan: one generate+slice projection over the token array and one
    posexplode — per-row map work, zero shuffle, no Python. At 100 TB
    this is the shape that matters: chunking must not cost more than
    the tokenize pass it rides."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens!r}")
    step = int(stride) if stride is not None else int(max_tokens)
    if step <= 0:
        raise ValueError(f"stride must be positive, got {stride!r}")
    toks = whitespace_tokens(text)
    # starts 0, step, 2*step, ... strictly below the token count
    starts = F.sequence(
        F.lit(0), F.size(toks) - F.lit(1), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s + F.lit(1), F.lit(int(max_tokens)))
    )
    return (
        docs.filter(F.size(toks) > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "_toks"))
        .select(
            "doc_id",
            "chunk_id",
            F.size("_toks").alias("n_tokens"),
            F.array_join("_toks", " ").alias("chunk_text"),
        )
    )


def tfidf_keywords(
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    k: int = 5,
) -> DataFrame:
    """Per-doc keyword extraction: the top ``k`` terms of each doc by
    classic tf-idf (``tf · ln(N/df)``), tie-break term asc —
    ``(doc_id, term, score)``. The standard "what is this page about"
    signal a training-data pipeline attaches before topic bucketing or
    per-domain sampling.

    Plan at 10^12 docs: postings join term_stats on ``term`` — both
    relations are term-keyed (the posting store is term-partitioned),
    so the join is co-located; the per-doc top-k is ONE window (hash
    repartition by doc_id + in-partition rank, no global sort). The
    idf uses ln(N/df) (df ≥ 1 always in a real postings table, so no
    division guard is needed)."""
    from pyspark.sql import Window

    scored = postings.join(term_stats.select("term", "df"), "term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("doc_id", "term", "score", "rank")
    )
