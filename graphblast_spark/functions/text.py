"""Text analysis for training-data pipelines — pure Column expressions.

All four stay inside whole-stage codegen (no Python UDFs) and every
formula is ANSI-SQL-expressible so DuckDB oracles can replay them
bit-for-bit: tokenization is a single regex split, hashes are md5
(identical hex output in Spark and DuckDB).

These operate on the ``documents`` table shape
(doc_id, text, lang, source, n_chars) and on the pages table's text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenizer shared by everything: split on whitespace runs, drop empties.
TOKEN_SPLIT_RE = "\\s+"

# Tiny per-language marker sets for the n-gram/stopword heuristic lang-id.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def add_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count (runs of
    letters/digits/punctuation as separate units)."""
    toks = tokens(F.col(text_col))
    bpe = F.filter(
        F.split(F.lower(F.col(text_col)), "([^a-z0-9]+)"), lambda t: t != ""
    )
    return df.withColumn("n_tokens", F.size(toks)).withColumn("n_subwords", F.size(bpe))


def add_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality heuristics and
    a composite [0,1] score (higher = cleaner prose)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    n_stop = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.3
    )
    return (
        df.withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", F.round(score, 6))
    )


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word lang-id over {en, de, fr}: per-language score = count
    of marker tokens; argmax with deterministic tiebreak en<de<fr;
    'und' (undetermined) when all scores are 0."""
    toks = tokens(F.col(text_col))

    def _marker_count(markers):
        # NB: factory, not a default-arg lambda — pyspark dispatches HOF
        # lambdas on arity, so a 2-arg lambda would receive (elem, index).
        return F.size(F.filter(toks, lambda w: w.isin(markers)))

    scores = {lang: _marker_count(mk) for lang, mk in LANG_MARKERS.items()}
    best = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] > 0), F.lit("de"))
        .when(scores["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return df.withColumn("lang_pred", best)


def add_fingerprint(df: DataFrame, text_col: str = "text", shingle_words: int = 3) -> DataFrame:
    """Document fingerprints: full-text md5 plus a rolling-window
    fingerprint = min md5 over word ``shingle_words``-grams (robust to
    local edits; the k=1 MinHash)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    shingles = F.when(
        n >= shingle_words,
        F.transform(
            F.sequence(F.lit(0), n - shingle_words),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, shingle_words))),
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return df.withColumn("fp_md5", F.md5(F.col(text_col))).withColumn(
        "fp_rolling", F.array_min(shingles)
    )
