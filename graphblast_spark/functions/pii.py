"""PII detection / redaction for web-text curation — pure Column exprs.

A production Common-Crawl pipeline strips personally identifiable
information before training (emails, phone numbers, IP addresses are
the standard regex-detectable tier — cf. the public C4 / RefinedWeb /
FineWeb preprocessing recipes). This module implements that tier as
sequential ``regexp_replace`` passes that stay inside whole-stage
codegen: no Python UDF, one projection, no shuffle.

Cross-engine determinism: every pattern is written in the common
subset of Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded/unbounded greedy quantifiers, non-capturing groups, ``\\b`` —
and each pattern is anchored enough that leftmost-first (Java) and
leftmost-longest (RE2) agree, so the DuckDB oracle replays the exact
output bytes.

Kinds are applied IN ORDER (email → ipv4 → phone) and each kind counts
matches on the text as left by the previous pass: an email's digit run
must not double-count as a phone number, and an IPv4 must be consumed
before the phone pass sees its digits.

At 100 TB this is a narrow map-only projection — no exchange, fully
pipelined with the scan; the only cost is the regex engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) in application order. Patterns deliberately use
# only Java-regex ∩ RE2 syntax — see module docstring.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local part: letters/digits/._%+- ; domain: dotted labels + ≥2-letter TLD
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted quad, word-bounded so version strings like 1.2.3.4.5 still
    # match their first quad (same in both engines: leftmost scan)
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # optional +, then ≥8 chars of digits/space/()/-, digit-terminated
    "phone": (r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
}

DEFAULT_KINDS = ("email", "ipv4", "phone")


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    kinds: tuple[str, ...] = DEFAULT_KINDS,
) -> DataFrame:
    """Adds ``out_col`` (text with each PII kind replaced by its token),
    one ``n_pii_<kind>`` count per kind, and the total ``n_pii``.

    Counts are per-pass (on the text after earlier kinds were already
    redacted) so the sum equals the number of replacements performed.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; known: {list(PII_PATTERNS)}")
    cur = F.col(text_col)
    counts = {}
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        counts[f"n_pii_{kind}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    out = df
    total = None
    for name, c in counts.items():
        out = out.withColumn(name, c.cast("int"))
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("int")).withColumn(out_col, cur)


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level PII incidence: one row per kind with the number of
    documents containing it and total match count — the audit view a
    curation run reports before/after redaction."""
    red = redact_pii(df, text_col)
    aggs = []
    for kind in DEFAULT_KINDS:
        c = F.col(f"n_pii_{kind}")
        aggs.append(
            F.struct(
                F.lit(kind).alias("kind"),
                F.sum(F.when(c > 0, 1).otherwise(0)).alias("n_docs"),
                F.sum(c).alias("n_matches"),
            )
        )
    return (
        red.agg(F.array(*aggs).alias("a"))
        .select(F.explode("a").alias("s"))
        .select("s.kind", "s.n_docs", "s.n_matches")
    )
