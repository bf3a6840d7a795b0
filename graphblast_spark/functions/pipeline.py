"""clean_corpus — the composed training-data curation pipeline.

Every stage exists as its own operator (functions/text.py, dedup.py,
sampling.py); this module is the one-call composition a corpus owner
actually runs, with the decisions a composition forces made explicit:

**Stage order and the survivor boundary.** Per-document SIGNAL stages
run first (1 lang → 2 quality → 3 repetition — pure projections, no
shuffle); CORPUS stages then run over the shrinking survivor set
(4 exact dedup → 5 near dedup → 6 span dedup → 7 decontamination),
each stage seeing only the previous stage's survivors — a rejected
low-quality copy must never become the canonical keeper of its dup
group, and spans of removed documents must not count toward span
duplication (the Lee et al. 2022 ordering). ``reject_reason`` is the
FIRST failing stage in this order; ``split`` is assigned only to kept
docs (deterministic hash split — retry/append-stable).

**Plan shape at 10^12 docs**: stages 1-3 are one codegen'd projection
pass; each corpus stage is one-two shuffles on short uniform keys
(md5 / simhash / span-hash / doc_id), all map-side combining; the
survivor set only shrinks, and lineage is truncated after the signal
pass and after each corpus stage (eager localCheckpoint), so the
composition's plan depth stays constant regardless of stage count.

``near_dup="clusters"`` uses the full MinHash→LSH→Jaccard→connected-
components machinery (the production tier); ``"simhash"`` groups on
the 60-bit fingerprint (exactly colliding fingerprints — cheaper, and
trivially SQL-replayable, so the contract row pins the composition
with it); ``None`` skips the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphblast_spark.functions.dedup import (
    near_duplicate_clusters,
    simhash64,
    simhash_hamming_clusters,
    span_dedup_stats,
)
from graphblast_spark.functions.sampling import hash_split, ngram_contamination
from graphblast_spark.functions.text import (
    add_lang_id,
    add_quality,
    add_repetition_signals,
)
from graphblast_spark.runtime.superstep import truncate_plan

REASONS = (
    "lang", "quality", "repetition", "exact_dup", "near_dup",
    "span_dup", "contaminated",
)


def clean_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_dup_2gram_frac: float = 0.6,
    near_dup: str | None = "clusters",
    span_tokens: int = 20,
    max_dup_span_frac: float = 0.5,
    contamination_n: int = 8,
    max_contaminated_frac: float = 0.0,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Returns (doc_id, keep boolean, reject_reason string, split string):
    one row per input doc; ``reject_reason`` null iff kept; ``split``
    null iff rejected. See module docstring for stage semantics."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    # -- stages 1-3: per-doc signals, one projection pass ---------------
    sig = add_lang_id(add_quality(add_repetition_signals(base)))
    reason = (
        F.when(~F.col("lang_pred").isin(*keep_langs), "lang")
        .when(F.col("quality") < min_quality, "quality")
        .when(
            (F.col("dup_line_frac") > max_dup_line_frac)
            | (F.col("dup_2gram_frac") > max_dup_2gram_frac),
            "repetition",
        )
    )
    verdicts = sig.select("doc_id", "text", reason.alias("reason")).transform(truncate_plan)

    def _reject(rejects: DataFrame, tag: str) -> DataFrame:
        """Fold a (doc_id) reject set into verdicts as first-null reason."""
        return (
            verdicts.join(rejects.withColumn("__r", F.lit(tag)), "doc_id", "left")
            .select(
                "doc_id", "text", F.coalesce("reason", "__r").alias("reason")
            )
            .transform(truncate_plan)
        )

    def _survivors() -> DataFrame:
        return verdicts.filter(F.col("reason").isNull()).select("doc_id", "text")

    # -- stage 4: exact dedup among survivors ----------------------------
    ex = _survivors().select("doc_id", F.md5("text").alias("fp"))
    canon = ex.groupBy("fp").agg(F.min("doc_id").alias("c"))
    verdicts = _reject(
        ex.join(canon, "fp").filter(F.col("doc_id") != F.col("c")).select("doc_id"),
        "exact_dup",
    )

    # -- stage 5: near dedup among survivors -----------------------------
    if near_dup == "clusters":
        cl = near_duplicate_clusters(_survivors())
        verdicts = _reject(
            cl.filter(~F.col("is_canonical")).select("doc_id"), "near_dup"
        )
    elif near_dup == "simhash":
        sh = simhash64(_survivors())
        shc = sh.groupBy("simhash").agg(F.min("doc_id").alias("c"))
        verdicts = _reject(
            sh.join(shc, "simhash").filter(F.col("doc_id") != F.col("c")).select("doc_id"),
            "near_dup",
        )
    elif near_dup == "simhash_hamming":
        # Manku/Jain/Sarma WWW'07 production tier: fingerprints within
        # Hamming distance ≤3 cluster together (CC closure — proximity
        # is not transitive); non-canonical members rejected.
        cl = simhash_hamming_clusters(_survivors())
        verdicts = _reject(
            cl.filter(~F.col("is_canonical")).select("doc_id"), "near_dup"
        )
    elif near_dup is not None:
        raise ValueError(
            "near_dup must be 'clusters', 'simhash', 'simhash_hamming' "
            f"or None: {near_dup!r}"
        )

    # -- stage 6: span-level dedup among survivors ------------------------
    spans = span_dedup_stats(_survivors(), span_tokens=span_tokens)
    verdicts = _reject(
        spans.filter(F.col("dup_span_frac") > max_dup_span_frac).select("doc_id"),
        "span_dup",
    )

    # -- stage 7: benchmark decontamination -------------------------------
    if eval_docs is not None:
        cont = ngram_contamination(_survivors(), eval_docs, n=contamination_n)
        verdicts = _reject(
            cont.filter(F.col("contaminated_frac") > max_contaminated_frac).select(
                "doc_id"
            ),
            "contaminated",
        )

    # -- split assignment for keepers -------------------------------------
    out = hash_split(verdicts, weights=split_weights)
    return out.select(
        "doc_id",
        F.col("reason").isNull().alias("keep"),
        F.col("reason").alias("reject_reason"),
        F.when(F.col("reason").isNull(), F.col("split")).alias("split"),
    )


def retention_stats(verdicts: DataFrame) -> DataFrame:
    """(stage string, n long): docs removed per stage plus the kept
    count and per-split keeper counts — the corpus-curation report."""
    by_reason = verdicts.groupBy(
        F.coalesce("reject_reason", F.concat(F.lit("kept:"), "split")).alias("stage")
    ).agg(F.count(F.lit(1)).alias("n"))
    return by_reason
