"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Training-data extensions (not in the reference); all pure Column
expressions (codegen, pushdown-friendly) — deliberately no UDFs so the
10^12-row scan stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# n-gram-heuristic language ID: marker tokens per language. Real systems
# use char-trigram models; the heuristic keeps the same shape (score per
# language, argmax) with a deterministic, oracle-checkable scorer.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def words(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def marker_count(col: str | Column, markers: list[str]) -> Column:
    return F.size(F.filter(words(col),
                           lambda w: w.isin(*markers)))


def lang_id(col: str | Column,
            markers: dict[str, list[str]] | None = None) -> Column:
    """argmax language by marker hits; 'unk' when no marker fires.
    Deterministic tiebreak: language order in the dict."""
    markers = markers or LANG_MARKERS
    scored = F.array(*[
        F.struct(marker_count(col, m).alias("score"),
                 F.lit(i).alias("prio"), F.lit(lang).alias("lang"))
        for i, (lang, m) in enumerate(markers.items())])
    best = F.array_max(F.transform(
        scored, lambda s: F.struct(s["score"].alias("score"),
                                   (-s["prio"]).alias("nprio"),
                                   s["lang"].alias("lang"))))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unk"))


def n_words(col: str | Column) -> Column:
    return F.size(words(col))


def stopword_ratio(col: str | Column,
                   stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    return marker_count(col, sw).cast("double") / n_words(col)


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def mean_word_len(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    total_chars = F.length(F.regexp_replace(c, " ", ""))
    return total_chars.cast("double") / n_words(col)


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality heuristic: penalize too-short docs, huge
    punctuation ratios and stopword-free (likely garbage) text."""
    len_ok = F.least(n_words(col).cast("double") / 20.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(col) * 10.0, F.lit(1.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 6)


def token_count_ws(col: str | Column) -> Column:
    """Whitespace tokenization count."""
    return n_words(col)


def token_count_regex(col: str | Column,
                      pattern: str = r"\w+|[^\w\s]") -> Column:
    """BPE-ish pre-tokenizer count: words plus standalone punctuation —
    the usual GPT-style pre-split approximation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def fingerprint(col: str | Column) -> Column:
    """Normalized content fingerprint: lowercase, strip non-alnum, md5.
    Deterministic and portable (same value in DuckDB/Python) — the dedup
    key for exact near-normalization duplicates."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", "")
    return F.md5(normalized)
