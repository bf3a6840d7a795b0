"""Structured-Streaming tests: batch/stream parity for windowed aggs,
incremental distill equivalence, and stateful-operator state carry
across micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from graphblast_spark.sources.corpus import generate_pages
from graphblast_spark.sources.distill import extract_columns
from graphblast_spark.streaming import (
    running_user_stats,
    stream_events,
    stream_pages,
    streaming_distill,
    windowed_event_stats,
    windowed_event_stats_batch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _events_dir(spark, tmp, n_files=2):
    out = os.path.join(tmp, "events_in")
    spark.read.parquet(f"{SF}/events.parquet").repartition(n_files).write.parquet(out)
    return out


def test_windowed_stats_stream_equals_batch(spark, tmp):
    src = _events_dir(spark, tmp)
    stream = stream_events(spark, src)
    q = (
        windowed_event_stats(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory").queryName("winstats")
        .option("checkpointLocation", os.path.join(tmp, "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM winstats").collect()
    }
    batch = windowed_event_stats_batch(
        spark.read.parquet(src), window="1 hour"
    )
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    # availableNow + append mode emits only windows closed by the final
    # watermark; every emitted window must match batch exactly.
    assert got, "stream produced no rows"
    for k, v in got.items():
        assert expect[k] == v


def test_streaming_distill_matches_batch(spark, tmp):
    pages_dir = os.path.join(tmp, "pages")
    generate_pages(spark, 500, seed=7).write.parquet(pages_dir)

    edges_out = os.path.join(tmp, "edges_log")
    q = streaming_distill(
        stream_pages(spark, pages_dir, max_files_per_trigger=1),
        edges_out=edges_out,
        checkpoint_dir=os.path.join(tmp, "ck2"),
    )
    q.awaitTermination(180)

    got = {
        (r["src_url"], r["dst_url"])
        for r in spark.read.parquet(edges_out).distinct().collect()
    }
    batch = (
        extract_columns(spark.read.parquet(pages_dir))
        .select(F.col("url").alias("src_url"), F.explode("outlinks").alias("dst_url"))
        .filter(F.col("src_url") != F.col("dst_url"))
        .distinct()
    )
    expect = {(r["src_url"], r["dst_url"]) for r in batch.collect()}
    assert got == expect and len(got) > 0


def test_running_user_stats_state_carries(spark, tmp):
    src = _events_dir(spark, tmp, n_files=3)
    q = (
        running_user_stats(stream_events(spark, src, max_files_per_trigger=1))
        .writeStream.format("memory").queryName("userstats")
        .option("checkpointLocation", os.path.join(tmp, "ck3"))
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # memory sink in update mode appends every emission; the LAST row
    # per user is the final running total — must equal the batch totals.
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM userstats"
    ).collect()
    final = {}
    for r in rows:  # later emissions have monotonically ≥ counts
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = (
        spark.read.parquet(src).groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
    )
    expect = {r["user_id"]: (r["n"], r["tv"]) for r in batch.collect()}
    assert set(final) == set(expect)
    for uid, (n, tv) in expect.items():
        assert final[uid][0] == n
        assert final[uid][1] == pytest.approx(tv, rel=1e-9)
