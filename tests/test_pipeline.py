"""clean_corpus composed pipeline (functions/pipeline.py)."""

from __future__ import annotations

import pytest

from graphblast_spark.functions.pipeline import clean_corpus, retention_stats

EN = "the cat and the dog of the house went to the market and it is fine "


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (10, EN + "unique alpha bravo charlie delta echo foxtrot golf"),  # keep
        (11, EN + "unique hotel india juliet kilo lima mike november"),   # contaminated below
        (12, "der die und das ist der die und das ist immer wieder anders"),  # lang
        (13, "the !!!! ???? %%%% &&&&"),                                      # quality (en, junk)
        (14, ("spam ham " * 40) + EN),                                        # repetition
        (15, EN + "unique alpha bravo charlie delta echo foxtrot golf"),  # exact dup of 10
        # same distinct-token set as 11 (different order/multiplicity) →
        # identical simhash, different md5 → near_dup under "simhash"
        (16, EN + "unique india hotel juliet kilo lima mike november november"),
        (17, EN + "unique oscar papa quebec romeo sierra tango uniform victor"),  # keep
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_reasons_and_precedence(spark, corpus):
    ev = spark.createDataFrame(
        [(999, "unique hotel india juliet")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in clean_corpus(
            corpus,
            eval_docs=ev,
            keep_langs=("en",),
            min_quality=0.5,
            max_dup_2gram_frac=0.6,
            near_dup="simhash",
            span_tokens=5,
            max_dup_span_frac=0.95,
            contamination_n=3,
        ).collect()
    }
    assert out[10]["keep"] and out[10]["split"] in ("train", "val", "test")
    assert out[12]["reject_reason"] == "lang" and out[12]["split"] is None
    assert out[13]["reject_reason"] == "quality"
    assert out[14]["reject_reason"] == "repetition"
    assert out[15]["reject_reason"] == "exact_dup"   # 10 is the canonical keeper
    assert out[16]["reject_reason"] == "near_dup"    # 11 is the canonical keeper
    # 11 survived dedup but shares the eval 3-grams → contaminated
    assert out[11]["reject_reason"] == "contaminated"
    assert len(out) == len({r for r in out})  # one row per doc


def test_clean_corpus_survivor_boundary(spark):
    """A duplicate whose canonical copy was rejected earlier must be
    KEPT: dedup runs among survivors, so the rejected copy can't claim
    the group (module-docstring contract)."""
    bad = "der die und das ist " * 10          # rejected at stage 1 (lang)
    docs = spark.createDataFrame(
        [(1, bad), (2, EN + "unique tail one"), (3, EN + "unique tail one")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in clean_corpus(
        docs, keep_langs=("en",), min_quality=0.0, max_dup_2gram_frac=1.0,
        near_dup=None, max_dup_span_frac=1.0,
    ).collect()}
    assert out[1]["reject_reason"] == "lang"
    assert out[2]["keep"]                       # canonical among SURVIVORS
    assert out[3]["reject_reason"] == "exact_dup"


def test_clean_corpus_clusters_tier(spark):
    """Default near_dup='clusters' catches heavy-overlap (not identical
    token set) near-dups via MinHash→LSH→Jaccard→CC."""
    a = EN + "ending alpha beta gamma"
    b = EN + "ending alpha beta delta"   # near-dup of a, different tokens
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "totally different words here about ships and sails and the sea it is")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in clean_corpus(
        docs, keep_langs=("en",), min_quality=0.0, max_dup_2gram_frac=1.0,
        near_dup="clusters", max_dup_span_frac=1.0,
    ).collect()}
    assert out[1]["keep"]
    assert out[2]["reject_reason"] == "near_dup"
    assert out[3]["keep"]


def test_clean_corpus_simhash_hamming_tier(spark):
    """near_dup='simhash_hamming' (WWW'07) rejects docs whose
    fingerprints are a FEW bits apart — pairs the exact-fingerprint
    'simhash' tier misses entirely."""
    long = " ".join(f"tok{i}" for i in range(150))
    docs = spark.createDataFrame(
        [(1, long), (2, long + " note"),  # fingerprints 2 bits apart (md5-fixed)
         (3, "totally different words here about ships and sails and the sea it is")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in clean_corpus(
        docs, keep_langs=("en", "und"), min_quality=0.0, max_dup_2gram_frac=1.0,
        near_dup="simhash_hamming", max_dup_span_frac=1.0,
    ).collect()}
    assert out[1]["keep"]
    assert out[2]["reject_reason"] == "near_dup"
    assert out[3]["keep"]
    # the exact-fingerprint tier keeps both (fingerprints differ)
    out_exact = {r["doc_id"]: r for r in clean_corpus(
        docs, keep_langs=("en", "und"), min_quality=0.0, max_dup_2gram_frac=1.0,
        near_dup="simhash", max_dup_span_frac=1.0,
    ).collect()}
    assert out_exact[1]["keep"] and out_exact[2]["keep"]


def test_retention_stats(spark, corpus):
    v = clean_corpus(corpus, keep_langs=("en",), min_quality=0.5,
                     near_dup="simhash", max_dup_span_frac=0.95, span_tokens=5)
    stats = {r["stage"]: r["n"] for r in retention_stats(v).collect()}
    assert sum(stats.values()) == corpus.count()
    assert stats.get("lang", 0) >= 1 and stats.get("exact_dup", 0) >= 1
    assert any(k.startswith("kept:") for k in stats)
