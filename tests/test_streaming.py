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


def test_incremental_pagerank_after_streamed_append(spark, tmp):
    """The full incremental-analytics loop: stream a page corpus → edge
    log → Graph → converge PageRank; then a RE-CRAWL batch (3 pages
    with changed outlinks) appends to the same log, the graph rebuilds,
    ranks carry over through the stable url key, and the warm-started
    run must reach the same fixpoint (allclose 1e-6 vs a cold run on
    the updated graph) in measurably fewer supersteps.

    Physics of the saving (so the assertions stay honest): matching at
    1e-6 per vertex forces eps ≈ 1e-12 on the reference's Σ(Δp)² < eps
    criterion, and the error contracts ~4-5× per superstep — so the
    superstep saving equals the decades between the COLD start's
    initial error and the WARM start's (the perturbation the append
    caused), not a fixed small constant. Measured here: a 3-page
    re-crawl starts the warm run ~2 decades lower (first-superstep
    error ~5e-5 vs cold ~4e-3) and saves ~30% of the supersteps; a
    single-edge change would converge in ~1-3. Corpus GROWTH is the
    regime where warm-start saves nothing: new vertices rescale every
    score via the 1/n teleport (a 20% growth re-runs cold; the remap
    still applies, only the superstep saving vanishes)."""
    import json
    from graphblast_spark.algorithms.pagerank import (
        incremental_pagerank,
        pagerank,
        remap_ranks,
    )
    from graphblast_spark.runtime.superstep import SuperstepRunner
    from graphblast_spark.streaming.ingest import edge_log_graph

    page_idx = F.substring("url", -6, 6).cast("int")
    pages_dir = os.path.join(tmp, "pages_in")
    log_dir = os.path.join(tmp, "edges_log")
    ck = os.path.join(tmp, "ck_inc")
    eps = 1e-12  # both runs deep inside the 1e-6 comparison band

    # initial crawl: 300 pages arrive and are distilled incrementally
    generate_pages(spark, 300, seed=3).write.mode("append").parquet(pages_dir)
    streaming_distill(stream_pages(spark, pages_dir), log_dir, ck).awaitTermination(180)
    g1, map1 = edge_log_graph(spark, log_dir)
    ranks1 = pagerank(g1, eps=eps).localCheckpoint(eager=True)

    # re-crawl: pages 0-2 return with changed outlinks; the SAME
    # streaming checkpoint picks up only the new files (append-only log)
    generate_pages(spark, 300, seed=99).filter(page_idx < 3).write.mode(
        "append"
    ).parquet(pages_dir)
    streaming_distill(stream_pages(spark, pages_dir), log_dir, ck).awaitTermination(180)
    g2, map2 = edge_log_graph(spark, log_dir)
    assert g2.nvals > g1.nvals  # the re-crawl added edges
    assert g2.n == g1.n         # same url universe

    def _errs(run_dir):
        with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
            return [json.loads(ln)["scalars"]["err"] for ln in fh]

    run_dir = os.path.join(tmp, "run_warm")
    warm = incremental_pagerank(
        g2, remap_ranks(ranks1, map1, map2), eps=eps,
        runner=SuperstepRunner(spark, run_dir=run_dir),
    )
    warm_errs = _errs(run_dir)

    cold_dir = os.path.join(tmp, "run_cold")
    cold = pagerank(g2, eps=eps, runner=SuperstepRunner(spark, run_dir=cold_dir))
    cold_errs = _errs(cold_dir)

    w = {r["id"]: r["val"] for r in warm.collect()}
    c = {r["id"]: r["val"] for r in cold.collect()}
    assert set(w) == set(c)
    assert max(abs(w[i] - c[i]) for i in w) < 1e-6
    # the warm start lands orders of magnitude nearer the fixpoint
    # (measured: 5.1e-5 vs 4.3e-3 — 85×)...
    assert warm_errs[0] < cold_errs[0] / 50, (warm_errs[0], cold_errs[0])
    # ...and converts that into strictly fewer supersteps at equal eps
    assert len(warm_errs) + 3 <= len(cold_errs), (len(warm_errs), len(cold_errs))
    g1.unpersist(); g2.unpersist(); map1.unpersist(); map2.unpersist()


def test_incremental_cc_after_streamed_append(spark, tmp):
    """CC leg of the incremental-analytics loop: stream a page corpus →
    edge log → Graph → converge FastSV CC; a re-crawl batch appends to
    the same log (append-only: the edge set only GROWS — exactly the
    warm start's soundness condition), labels carry through the stable
    url key, and the warm-started run must land on the cold fixpoint
    EXACTLY (labels are discrete — no tolerance band) in no more
    supersteps."""
    import json

    from graphblast_spark.algorithms import (
        connected_components,
        incremental_connected_components,
        remap_labels,
    )
    from graphblast_spark.runtime.superstep import SuperstepRunner
    from graphblast_spark.streaming.ingest import edge_log_graph

    page_idx = F.substring("url", -6, 6).cast("int")
    pages_dir = os.path.join(tmp, "cc_pages_in")
    log_dir = os.path.join(tmp, "cc_edges_log")
    ck = os.path.join(tmp, "cc_ck")

    generate_pages(spark, 300, seed=3).write.mode("append").parquet(pages_dir)
    streaming_distill(stream_pages(spark, pages_dir), log_dir, ck).awaitTermination(180)
    g1, map1 = edge_log_graph(spark, log_dir)
    labels1 = connected_components(g1).localCheckpoint(eager=True)

    # re-crawl: pages 0-2 return with different outlinks (appended to
    # the log → edge union, components can only merge)
    generate_pages(spark, 300, seed=99).filter(page_idx < 3).write.mode(
        "append"
    ).parquet(pages_dir)
    streaming_distill(stream_pages(spark, pages_dir), log_dir, ck).awaitTermination(180)
    g2, map2 = edge_log_graph(spark, log_dir)
    assert g2.nvals > g1.nvals

    def _steps(run_dir):
        with open(os.path.join(run_dir, "metrics.jsonl")) as fh:
            return sum(1 for _ in fh)

    prev = remap_labels(
        labels1.select("id", F.col("component").alias("val")), map1, map2
    ).select("id", F.col("val").alias("component"))

    warm_dir = os.path.join(tmp, "cc_warm")
    cold_dir = os.path.join(tmp, "cc_cold")
    warm = incremental_connected_components(
        g2, prev, runner=SuperstepRunner(spark, run_dir=warm_dir)
    )
    cold = connected_components(g2, runner=SuperstepRunner(spark, run_dir=cold_dir))
    w = {r.id: r.component for r in warm.collect()}
    c = {r.id: r.component for r in cold.collect()}
    assert w == c
    assert _steps(warm_dir) <= _steps(cold_dir), (_steps(warm_dir), _steps(cold_dir))
    g1.unpersist(); g2.unpersist(); map1.unpersist(); map2.unpersist()
