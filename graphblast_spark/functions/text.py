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


def add_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    all as pure array expressions — no shuffle, no UDF:

    - ``dup_line_frac``      fraction of lines occurring more than once
    - ``dup_line_char_frac`` fraction of line characters in such lines
    - ``dup_2gram_frac``     fraction of word-bigram characters inside
                             bigrams that occur more than once in the doc
    - ``dup_3gram_frac``     same for trigrams
    - ``dup_4gram_frac``     same for 4-grams

    The n-gram fractions are CHARACTER-weighted, matching Gopher's
    "fraction of characters contained within duplicate n-grams" family:
    numerator = Σ len(g) over every occurrence of a gram value that
    appears ≥2× in the doc; denominator = Σ len(g) over all gram
    occurrences. Known deviation from the paper (documented, not
    hidden): Gopher de-overlaps duplicated character *spans* before
    counting, so its numerator counts each original-text character at
    most once, while gram-occurrence weighting counts a character once
    per covering duplicated gram — a monotone-equivalent signal bounded
    in [0,1], but re-calibrate thresholds before reusing the paper's
    cut-offs verbatim.

    Duplicate line/gram detection sorts the array once and flags equal
    neighbors (O(L log L) per doc, not the naive O(L²) nested scan — a
    100 TB corpus has docs with 10⁴+ lines). Single-line docs score 0.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: x != "")
    ls = F.array_sort(lines)
    n = F.size(ls)
    # flags[i] = line equals its sorted predecessor or successor
    idx = F.sequence(F.lit(1), n)
    dup_flags = F.transform(
        idx,
        lambda i: F.when(
            ((i > 1) & (F.element_at(ls, i) == F.element_at(ls, i - 1)))
            | ((i < n) & (F.element_at(ls, i) == F.element_at(ls, i + 1))),
            F.element_at(ls, i),
        ),
    )
    dup_lines = F.filter(dup_flags, lambda x: x.isNotNull())
    total_chars = F.aggregate(ls, F.lit(0), lambda acc, x: acc + F.length(x))
    dup_chars = F.aggregate(dup_lines, F.lit(0), lambda acc, x: acc + F.length(x))

    def _dup_ngram_frac(k):
        toks = tokens(t)
        m = F.size(toks)
        grams = F.when(
            m >= k,
            F.transform(
                F.sequence(F.lit(1), m - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        gs = F.array_sort(grams)
        ng = F.size(gs)
        # occurrences whose gram value repeats = equal to a sorted neighbor
        dup_occ = F.when(
            ng > 0,
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), ng),
                    lambda i: F.when(
                        ((i > 1) & (F.element_at(gs, i) == F.element_at(gs, i - 1)))
                        | ((i < ng) & (F.element_at(gs, i) == F.element_at(gs, i + 1))),
                        F.element_at(gs, i),
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        ).otherwise(F.array().cast("array<string>"))
        dup_c = F.aggregate(dup_occ, F.lit(0), lambda acc, x: acc + F.length(x))
        tot_c = F.aggregate(gs, F.lit(0), lambda acc, x: acc + F.length(x))
        return F.when(tot_c > 0, dup_c / tot_c.cast("double")).otherwise(F.lit(0.0))

    return (
        df.withColumn(
            "dup_line_frac",
            F.round(
                F.when(n > 0, F.size(dup_lines) / n.cast("double")).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "dup_line_char_frac",
            F.round(
                F.when(total_chars > 0, dup_chars / total_chars.cast("double")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ),
        )
        .withColumn("dup_2gram_frac", F.round(_dup_ngram_frac(2), 6))
        .withColumn("dup_3gram_frac", F.round(_dup_ngram_frac(3), 6))
        .withColumn("dup_4gram_frac", F.round(_dup_ngram_frac(4), 6))
    )


def top_ngram_char_frac(df: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """(doc_id, top_ngram, top_ngram_char_frac): fraction of the doc's
    characters covered by occurrences of its single most common word
    n-gram (the other Gopher §A1.1 family).

    The per-doc mode needs a real aggregation: explode n-grams, count per
    (doc_id, gram), then a struct-min per doc — two map-side-combining
    shuffles keyed by doc id (no window, no skew: key cardinality is
    docs × grams). Ties break to the lexicographically-smallest gram.
    Docs with fewer than ``n`` tokens have no n-grams and are absent
    from the output.
    """
    toks = tokens(F.col(text_col))
    m = F.size(toks)
    grams = F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select("doc_id", F.length(text_col).alias("n_chars"), F.explode(grams).alias("gram"))
    counts = exploded.groupBy("doc_id", "n_chars", "gram").agg(F.count("*").alias("c"))
    # min over the (-count, gram) struct = highest count, then the
    # lexicographically smallest gram on ties — one map-side-combining
    # agg, no window sort over the full gram table.
    best = counts.groupBy("doc_id", "n_chars").agg(
        F.min(F.struct((-F.col("c")).alias("negc"), F.col("gram"))).alias("b")
    )
    return best.select(
        "doc_id",
        F.col("b.gram").alias("top_ngram"),
        F.round(
            F.when(
                F.col("n_chars") > 0,
                (-F.col("b.negc")) * F.length("b.gram") / F.col("n_chars").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_ngram_char_frac"),
    )
