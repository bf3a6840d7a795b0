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


def test_sessionize_stream_closed_sessions_match_batch(spark, tmp):
    from datetime import datetime, timedelta

    from graphblast_spark.streaming import sessionize_batch, sessionize_stream

    # controlled corpus: 3 users, gap=30min sessions with known shape;
    # file 0 holds the early half, file 1 the late half (event-time
    # ordered across triggers, the discipline sessionize_stream requires)
    t0 = datetime(2026, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    for uid in range(3):
        for sess in range(3):           # 3 sessions per user
            base = t0 + timedelta(hours=2 * sess, minutes=uid)
            for j in range(4):          # 4 events each, 5 min apart
                rows.append((eid, base + timedelta(minutes=5 * j), uid, "click", 1.5))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = os.path.join(tmp, "sess_in")
    os.makedirs(src)
    cut = t0 + timedelta(hours=2)
    df.filter(F.col("ts") < cut).coalesce(1).write.parquet(os.path.join(src, "f0"))
    df.filter(F.col("ts") >= cut).coalesce(1).write.parquet(os.path.join(src, "f1"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("sessions")
        .option("checkpointLocation", os.path.join(tmp, "ck_sess"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts, r.total_value)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    batch = sessionize_batch(df, gap_minutes=30).collect()
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, 0), r.session_id)
    closed = {
        (r.user_id, r.session_id): (r.n_events, r.start_ts, r.end_ts, r.total_value)
        for r in batch if r.session_id < last[r.user_id]
    }
    # the stream emits exactly the batch's closed (non-trailing) sessions
    assert streamed == closed and len(closed) == 6  # 2 closed × 3 users


def test_streaming_dedup_gate_across_restarts(spark, tmp):
    from graphblast_spark.streaming import streaming_dedup_gate

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles stand quietly on the old stone wall near the "
        "river bend watching clouds drift past the tall pine trees"
    )
    other = (
        "completely different subject matter entirely about spark "
        "physical plans shuffle exchanges broadcast joins and the "
        "catalyst optimizer rewriting logical trees into efficient code"
    )
    third = (
        "a third unrelated document describing minhash signatures band "
        "keys bucket joins and the locality sensitive hashing family "
        "of algorithms for approximate set similarity at corpus scale"
    )
    schema = "doc_id long, text string"
    src, state, decisions, ck = (
        os.path.join(tmp, d) for d in ("src", "state", "dec", "ckg")
    )
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        q = streaming_dedup_gate(stream, state, decisions, ck)
        q.awaitTermination(180)

    # batch 1: original + in-batch exact copy + distinct doc
    spark.createDataFrame(
        [(1, base), (3, base), (2, other)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "f0"))
    run_once()
    # batch 2 (new query instance, state recovered from parquet logs):
    # exact copy of doc 1, near-dup of doc 1 (one word changed), fresh doc
    near = base.replace("seventeen", "eighteen")
    spark.createDataFrame(
        [(10, base), (11, near), (12, third)], schema
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))
    run_once()

    got = {
        r.doc_id: (r.verdict, r.dup_of)
        for r in spark.read.parquet(decisions).collect()
    }
    assert got == {
        1: ("kept", None),
        2: ("kept", None),
        3: ("exact_dup", 1),     # within-batch exact
        10: ("exact_dup", 1),    # cross-batch exact via recovered state
        11: ("near_dup", 1),     # cross-batch LSH + signature estimate
        12: ("kept", None),
    }
    # rejected docs never entered the state: only kept docs' signatures
    kept_ids = {r.doc_id for r in spark.read.parquet(f"{state}/sigs").collect()}
    assert kept_ids == {1, 2, 12}


def test_sessionize_state_recovers_across_query_restart(spark, tmp):
    from datetime import datetime, timedelta

    from graphblast_spark.streaming import sessionize_batch, sessionize_stream

    t0 = datetime(2026, 1, 1, 8, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def mk(rows):
        return spark.createDataFrame(rows, schema)

    # user 7: session A (2 events) | 2h gap | session B (2 events) | 2h gap | C
    f0 = [(0, t0, 7, "c", 1.0), (1, t0 + timedelta(minutes=5), 7, "c", 2.0)]
    f1 = [
        (2, t0 + timedelta(hours=2), 7, "c", 3.0),
        (3, t0 + timedelta(hours=2, minutes=5), 7, "c", 4.0),
        (4, t0 + timedelta(hours=4), 7, "c", 5.0),
    ]
    src, ck, sink = (os.path.join(tmp, d) for d in ("src", "ck", "sink"))
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema(mk(f0).schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    mk(f0).coalesce(1).write.parquet(os.path.join(src, "f0"))
    run_once()   # first query: session A still OPEN (lives in state store)
    mk(f1).coalesce(1).write.parquet(os.path.join(src, "f1"))
    run_once()   # NEW query instance: must recover A from the checkpoint,
                 # close it, then close B — exactly once each

    got = {
        (r.user_id, r.session_id): (r.n_events, round(r.total_value, 6))
        for r in spark.read.parquet(sink).collect()
    }
    # closed sessions: A (2 events, 3.0) and B (2 events, 7.0); C stays open
    assert got == {(7, 1): (2, 3.0), (7, 2): (2, 7.0)}
    # and they match the batch twin's non-trailing sessions
    batch = sessionize_batch(mk(f0 + f1), gap_minutes=30).collect()
    closed = {
        (r.user_id, r.session_id): (r.n_events, round(r.total_value, 6))
        for r in batch if r.session_id < max(b.session_id for b in batch)
    }
    assert got == closed
