"""Deterministic sampling / split / contamination (functions/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.functions.sampling import (
    hash_split,
    ngram_contamination,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"w{i % 7} x y z common tail words", f"s{i % 3}") for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hash_split_proportions_and_determinism(corpus):
    out = hash_split(corpus)
    frac = {
        r["split"]: r["c"] / 600
        for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert frac["train"] == pytest.approx(0.9, abs=0.06)
    # membership is a pure function of the key: invariant to partitioning
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {(r["doc_id"], r["split"]) for r in hash_split(corpus.repartition(13)).collect()}
    assert a == b


def test_stratified_sample_rates_and_drops(corpus):
    out = stratified_sample(corpus, fractions={"s0": 1.0, "s1": 0.5})
    got = {
        r["source"]: r["c"]
        for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert got["s0"] == 200            # rate 1.0 keeps the whole stratum
    assert 60 <= got["s1"] <= 140      # ~0.5 of 200
    assert "s2" not in got             # absent stratum dropped


def test_ngram_contamination_hand_oracle(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z q r"), (3, "a b")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "0 a b c 1")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_contamination(docs, ev, n=3).collect()}
    # doc 1 grams: [a b c, b c d, c d e]; eval grams: [0 a b, a b c, b c 1]
    assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (3, 1)
    assert out[1]["contaminated_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert (out[2]["n_grams"], out[2]["n_contaminated"]) == (3, 0)
    # doc 3 is shorter than n: present with 0 grams, not dropped
    assert (out[3]["n_grams"], out[3]["contaminated_frac"]) == (0, 0.0)


def test_contamination_plan_broadcasts_eval_side(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    plan = ngram_contamination(docs, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_hash_split_rejects_bad_weights(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, weights={"train": 0.5, "val": 0.2})
