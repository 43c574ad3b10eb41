"""Text-analysis column builders: token counting, quality scoring,
language-ID heuristic, document fingerprinting, string sanitizers.

All pure Catalyst expressions (JVM-side, whole-stage-codegen'd) — the
fast path for a 100 TB corpus; no Python executes per row. Ratio outputs
are emitted as ``floor(x * 10000)`` integers so engine rounding-mode
differences can never flip an oracle comparison.

Reference parity: the sanitizer re-expresses ``sanitize_filename``
(``ocr_app.py:575-586``), the token mask ``ocr_app.py:725``, the fence
strip ``PageProcessor.py:116``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# language → discriminative stopwords (word-boundary regex, RE2/Java-safe)
STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|de|que|y|los)\b",
    "fr": r"\b(le|la|et|les|des|une)\b",
}
_LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tie order

PUNCT_RE = r"[.,;:!?'\"()\[\]{}<>/\\|@#$%^&*+=~`-]"


def token_count(text: Column) -> Column:
    """Whitespace token count (the BPE-ish baseline)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: runs of letters, runs of digits, or single
    non-space symbols (a deterministic BPE stand-in)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))


def _ratio_e4(num: Column, den: Column) -> Column:
    """floor(10^4 · num/den) as bigint; 0 when the denominator is 0."""
    return F.when(den == 0, F.lit(0)).otherwise(
        F.floor(num * F.lit(10000.0) / den)
    ).cast("long")


def punct_ratio_e4(text: Column) -> Column:
    return _ratio_e4(
        F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("double"),
        F.length(text).cast("double"),
    )


def stopword_counts(text: Column) -> dict:
    low = F.lower(text)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(rx), 0))
        for lang, rx in STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax over stopword hit counts; ties resolve in _LANG_ORDER;
    all-zero → 'und'. The n-gram-heuristic language-ID of a training-data
    pipeline, built entirely from JVM expressions."""
    counts = stopword_counts(text)
    best = F.greatest(*[counts[l] for l in _LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# distinctive character trigrams per language (the n-gram profile
# heuristic proper; space-padded to anchor word boundaries)
TRIGRAMS = {
    "en": ["the", "and", "ing", " of", "ion"],
    "de": ["der", "ein", "sch", "und", "cht"],
    "es": ["que", " de", "ión", "los", " la"],
    "fr": ["les", " le", "ent", "des", "une"],
}


def trigram_counts(text: Column) -> dict:
    low = F.lower(text)
    out = {}
    for lang, grams in TRIGRAMS.items():
        total = None
        for g in grams:
            # literal occurrence count, overlap-free (regex-escaped)
            c = F.size(
                F.regexp_extract_all(low, F.lit(re.escape(g)), 0)
            )
            total = c if total is None else total + c
        out[lang] = total
    return out


def lang_id_trigram(text: Column) -> Column:
    """Character-trigram-profile language ID: argmax over per-language
    trigram hit totals, ties in _LANG_ORDER, all-zero → 'und'."""
    counts = trigram_counts(text)
    best = F.greatest(*[counts[l] for l in _LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score_e4(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 10000]: rewards length
    (saturating at 2000 chars) and alphabetic mass, penalizes punctuation
    soup — the block-scoring idea (SURVEY §7.2) applied document-level."""
    chars = F.length(text).cast("double")
    alpha = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]"), 0)).cast("double")
    punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("double")
    len_term = F.least(chars / F.lit(2000.0), F.lit(1.0))
    alpha_term = F.when(chars == 0, F.lit(0.0)).otherwise(alpha / chars)
    punct_term = F.when(chars == 0, F.lit(1.0)).otherwise(punct / chars)
    score = (
        F.lit(0.4) * len_term
        + F.lit(0.5) * alpha_term
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_term * F.lit(5.0), F.lit(1.0)))
    )
    return F.floor(score * F.lit(10000.0)).cast("long")


def avg_word_len_e2(text: Column) -> Column:
    """floor(100 · mean word length) — the readability-style ratio."""
    t = F.trim(text)
    words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    letters = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]"), 0))
    return F.when(words == 0, F.lit(0)).otherwise(
        F.floor(letters * F.lit(100.0) / words)
    ).cast("long")


def char_entropy_e4(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution, quantized e4 — a cheap gibberish/compression-ratio
    signal. Pure built-ins: explode chars → per-(doc, char) counts →
    -Σ p·log2 p. One shuffle on (doc, char), one on doc.

    Quantization happens PER (doc, char) TERM — floor(-p·log2 p · 10^8)
    as an integer — and only then sums; the integer sum is order-
    independent, so Spark's partition-dependent summation order cannot
    drift from DuckDB's (the driver-contract invariant: quantize before
    aggregating, never after). The residual risk is a per-term log2
    last-ulp difference between engines landing exactly on a floor
    boundary (~1e-9 per term), not a per-corpus accumulation."""
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.length("ch") > 0)
    counts = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    totals = counts.groupBy(id_col).agg(F.sum("c").alias("tot"))
    term = F.col("c") / F.col("tot")
    return (
        counts.join(totals, id_col)
        .withColumn(
            "term_e8",
            F.floor(-(term * F.log2(term)) * F.lit(100000000.0)).cast("long"),
        )
        .groupBy(id_col)
        .agg(
            F.floor(F.sum("term_e8") / F.lit(10000.0))
            .cast("long")
            .alias("entropy_e4")
        )
    )


def fingerprint(text: Column) -> Column:
    """Canonical-form md5 fingerprint (exact-dedup key): lowercase,
    whitespace collapsed, trimmed."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def sanitize_name(name: Column) -> Column:
    """P5 analog (``ocr_app.py:575-586``): strip path components, map
    control chars and ``<>:"/\\|?*`` to underscores, truncate to 200."""
    base = F.element_at(F.split(name, r"[/\\]"), -1)
    cleaned = F.regexp_replace(base, r"[\x00-\x1f<>:\"/\\|?*]", "_")
    return F.substring(cleaned, 1, 200)


def mask_token(tok: Column) -> Column:
    """F11 analog (``ocr_app.py:725``): ``tok[:10] + '****' + tok[-4:]``."""
    return F.concat(
        F.substring(tok, 1, 10), F.lit("****"), F.substring(tok, -4, 4)
    )
