"""Deterministic sampling / splitting / decontamination for training
corpora — pure Column expressions, no RNG, no shuffle for the filters.

Why hash-based instead of ``df.sample``/``sampleBy``: Spark's samplers
draw from a per-partition RNG, so the selected set changes with
partitioning, task retries, and cluster size. A 100 TB pipeline needs
the train/val membership of every document to be a pure function of
the document key — reproducible across reruns, incremental appends,
and engines (the DuckDB oracles replay these bit-for-bit). The bucket
is the first 8 hex chars of md5(key) (uniform, 2^32 space, signed-64
safe — same idiom as functions/dedup.py minhash).

No graphblast counterpart (data-pipeline extension); contamination
checking follows the n-gram-overlap decontamination procedure of
Brown et al. 2020 (GPT-3 appendix C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphblast_spark.functions.text import tokens

_BUCKETS = 1_000_000


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 1e6) from the md5 of the key's
    string rendering."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return h % _BUCKETS


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a deterministic ``split`` label ('train'/'val'/
    'test' by default) by cumulative bucket thresholds — a narrow
    projection, zero shuffle, stable under repartitioning and appends."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"hash_split weights must sum to 1.0 (got {total}): the last "
            "label would silently absorb the unassigned bucket mass"
        )
    b = hash_bucket(F.col(key_col))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < int(round(acc * _BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum
    (strata absent from the dict are dropped). Same bucket construction
    as :func:`hash_split` but salted with the stratum so the per-stratum
    selections are independent. Pure filter — no shuffle, no RNG."""
    b = hash_bucket(F.concat(F.col(strata_col), F.lit("|"), F.col(key_col).cast("string")))
    m = F.create_map(
        *[x for s, frac in fractions.items() for x in (F.lit(s), F.lit(int(round(frac * _BUCKETS))))]
    )
    thresh = m.getItem(F.col(strata_col))
    return df.where(thresh.isNotNull() & (b < thresh))


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-contamination check: count of the doc's
    word ``n``-grams that appear anywhere in ``eval_docs`` (the
    held-out benchmark set), plus the contaminated fraction.

    Plan shape for 100 TB: the eval side is aggregated to DISTINCT
    n-grams first (benchmarks are small — thousands of docs), so the
    join is corpus-n-grams ⟕ broadcast(eval-n-grams); the corpus side
    never shuffles on the gram key. Docs with fewer than ``n`` tokens
    report 0 grams / 0.0 fraction.
    """
    def grams(col: Column) -> Column:
        t = tokens(col)
        m = F.size(t)
        return F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    eval_grams = (
        eval_docs.select(F.explode(grams(F.col(text_col))).alias("gram")).distinct()
    )
    doc_grams = docs.select(
        "doc_id", F.explode_outer(grams(F.col(text_col))).alias("gram")
    )
    hit = doc_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
    per_doc = doc_grams.groupBy("doc_id").agg(
        F.count("gram").alias("n_grams")
    ).join(
        hit.groupBy("doc_id").agg(F.count("*").alias("n_contaminated")),
        "doc_id",
        "left",
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_grams").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contaminated_frac"),
    )
