"""Incremental pages→edges distillation — the streaming build path.

Batch build (sources/distill.py) is a full-table pass; at web scale
pages arrive continuously, so this runs the SAME vectorized extraction
per micro-batch via ``foreachBatch`` and appends cleaned (src_url,
dst_url) pairs to a parquet edge log. Cross-batch dedup is deferred to
``Graph.build`` (which drops duplicate (src,dst) pairs anyway —
reference build semantics, util.hpp:263-329), so the streaming writer
stays append-only and idempotent per batch id — the Iceberg-style
pattern where the log is cheap to write and compaction is a reader
concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_distill(
    pages_stream: DataFrame,
    edges_out: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start the incremental distillation; returns the StreamingQuery.

    Each micro-batch: html → outlinks (vectorized Arrow UDF, identical
    to the batch path) → explode → self-loop filter → within-batch
    dedup → append to ``edges_out``.
    """
    from graphblast_spark.sources.distill import extract_columns

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract_columns(batch_df)
        (
            extracted.select(
                F.col("url").alias("src_url"),
                F.explode("outlinks").alias("dst_url"),
            )
            .filter(F.col("src_url") != F.col("dst_url"))
            .dropDuplicates(["src_url", "dst_url"])
            .write.mode("append").parquet(edges_out)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
