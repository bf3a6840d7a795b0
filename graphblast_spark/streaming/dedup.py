"""Streaming ingestion dedup gate — admit-or-reject per micro-batch.

A 100 TB training corpus is not deduped once; it is deduped *at the
door*, as crawl batches arrive. This runs the batch MinHash/LSH stack
(functions/dedup.py) incrementally: a durable LSH state (parquet logs
of admitted docs' fingerprints, signatures and band keys) is joined
against each micro-batch, and every incoming doc gets a verdict:

- ``exact_dup``  — byte-identical (md5) to an admitted or earlier
  in-batch doc;
- ``near_dup``   — shares an LSH band with one AND the minhash-
  estimated Jaccard (fraction of equal signature components — the
  standard unbiased MinHash estimator) clears ``min_est``;
- ``kept``       — admitted; its fingerprint/signature/band keys join
  the state and gate all later batches.

``dup_of`` points at the admitted doc that triggered the verdict (min
id among matches — deterministic). State stays append-only parquet
(the same idempotent-log pattern as streaming_distill); signatures are
k longs per doc, so state is O(corpus × k·8 bytes) — trivially small
next to the corpus text it guards. The per-batch work shuffles on the
band-bucket key exactly like the batch path: bucket sizes are bounded
by near-dup cluster sizes, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphblast_spark.functions.dedup import band_keys, minhash_signature
from graphblast_spark.runtime.superstep import truncate_plan

_SIG_SCHEMA = "doc_id long, fp_md5 string, sig array<long>"
_BAND_SCHEMA = "doc_id long, band int, bkey string"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:  # first batch: state dir does not exist yet
        return spark.createDataFrame([], schema)


def _sig_est(sa, sb):
    """MinHash Jaccard estimate: fraction of equal signature slots."""
    eq = F.filter(F.zip_with(sa, sb, lambda x, y: x == y), lambda b: b)
    return F.size(eq) / F.size(sa)


def dedup_gate_batch(
    batch: DataFrame,
    state_sigs: DataFrame,
    state_bands: DataFrame,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    min_est: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One gate pass: returns (decisions, new_sigs, new_bands).

    ``decisions``: (doc_id, verdict, dup_of) for every batch doc.
    ``new_sigs`` / ``new_bands``: state rows for the *kept* docs only —
    rejected docs never enter the state, so a burst of n copies costs n
    comparisons against ONE stored canonical, not n².
    Pure batch function (no I/O) so tests and backfills reuse it.
    """
    sigs = (
        minhash_signature(batch, id_col, text_col, k=k)
        .join(
            batch.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("fp_md5")),
            "doc_id",
        )
        .transform(truncate_plan)  # one extraction pass, many consumers
    )
    bkeys = band_keys(sigs, bands, rows_per_band).transform(truncate_plan)

    # -- exact tier: md5 match against state, then within-batch ---------
    prior_exact = (
        sigs.join(
            state_sigs.select("fp_md5", F.col("doc_id").alias("dup_of")), "fp_md5"
        ).groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))
    )
    canon = sigs.groupBy("fp_md5").agg(F.min("doc_id").alias("dup_of"))
    batch_exact = (
        sigs.join(canon, "fp_md5")
        .filter(F.col("doc_id") > F.col("dup_of"))
        .select("doc_id", "dup_of")
    )
    exact = (
        prior_exact.unionByName(batch_exact)
        .groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))
    )

    # -- near tier: band collision + signature-estimate verify ----------
    prior_cand = bkeys.join(
        state_bands.select("band", "bkey", F.col("doc_id").alias("dup_of")),
        ["band", "bkey"],
    ).select("doc_id", "dup_of").distinct()
    batch_cand = (
        bkeys.alias("l")
        .join(bkeys.alias("r"), ["band", "bkey"])
        .filter(F.col("l.doc_id") > F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_id"), F.col("r.doc_id").alias("dup_of"))
        .distinct()
    )
    all_sigs = sigs.select("doc_id", "sig").unionByName(state_sigs.select("doc_id", "sig"))
    near = (
        prior_cand.unionByName(batch_cand)
        .join(sigs.select("doc_id", F.col("sig").alias("sig_new")), "doc_id")
        .join(
            all_sigs.select(F.col("doc_id").alias("dup_of"), F.col("sig").alias("sig_old")),
            "dup_of",
        )
        .filter(_sig_est(F.col("sig_new"), F.col("sig_old")) >= min_est)
        .groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))
    )

    decisions = (
        sigs.select("doc_id")
        .join(exact.select("doc_id", F.col("dup_of").alias("e")), "doc_id", "left")
        .join(near.select("doc_id", F.col("dup_of").alias("n")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("e").isNotNull(), F.lit("exact_dup"))
            .when(F.col("n").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            F.coalesce("e", "n").alias("dup_of"),
        )
        .transform(truncate_plan)
    )
    kept = decisions.filter(F.col("verdict") == "kept").select("doc_id")
    new_sigs = sigs.join(kept, "doc_id").select("doc_id", "fp_md5", "sig")
    new_bands = bkeys.join(kept, "doc_id").select("doc_id", "band", "bkey")
    return decisions, new_sigs, new_bands


def streaming_dedup_gate(
    docs_stream: DataFrame,
    state_dir: str,
    decisions_out: str,
    checkpoint_dir: str,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    min_est: float = 0.5,
    trigger_available_now: bool = True,
):
    """Start the gate on a docs stream (doc_id, text, …); returns the
    StreamingQuery. Decisions append to ``decisions_out`` with a
    ``batch_id`` column; state logs live under ``state_dir``."""
    spark = docs_stream.sparkSession

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        state_sigs = _read_or_empty(spark, f"{state_dir}/sigs", _SIG_SCHEMA)
        state_bands = _read_or_empty(spark, f"{state_dir}/bands", _BAND_SCHEMA)
        decisions, new_sigs, new_bands = dedup_gate_batch(
            batch_df, state_sigs, state_bands, k, bands, rows_per_band, min_est
        )
        (
            decisions.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(decisions_out)
        )
        new_sigs.write.mode("append").parquet(f"{state_dir}/sigs")
        new_bands.write.mode("append").parquet(f"{state_dir}/bands")

    writer = (
        docs_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
