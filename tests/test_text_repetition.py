"""Gopher-style repetition signals (functions/text.py) — hand oracles.

Reference for semantics: Rae et al. 2021 (Gopher) §A1.1 repetition
filters; these are engine extensions (no graphblast counterpart)."""

from __future__ import annotations

import pytest

from graphblast_spark.functions.text import add_repetition_signals, top_ngram_char_frac


@pytest.fixture(scope="module")
def rep_docs(spark):
    rows = [
        (1, "a b\na b\nc d"),          # 2/3 lines duplicated
        (2, "one line only"),           # no dup lines, no dup grams
        (3, ""),                        # degenerate: everything 0
        (4, "x y x y z"),               # dup bigram 'x y'
        (5, "a b c a b c"),             # tie: 'a b' vs 'b c' → 'a b'
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_hand_oracle(rep_docs):
    out = {
        r["doc_id"]: r
        for r in add_repetition_signals(rep_docs).collect()
    }
    # doc 1: lines ['a b','a b','c d'] → 2/3 dup, chars 6/9 dup;
    # tokens [a,b,a,b,c,d] → 2-grams [a b, b a, a b, b c, c d] (len 3
    # each): 'a b' repeats → dup chars 2·3 of 5·3 total → 0.4;
    # 3-grams all distinct → 0.0
    d1 = out[1]
    assert d1["dup_line_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert d1["dup_line_char_frac"] == pytest.approx(6 / 9, abs=1e-6)
    assert d1["dup_2gram_frac"] == pytest.approx(0.4, abs=1e-6)
    assert d1["dup_3gram_frac"] == 0.0
    assert d1["dup_4gram_frac"] == 0.0
    # doc 2: single line, all grams unique
    d2 = out[2]
    assert (d2["dup_line_frac"], d2["dup_2gram_frac"], d2["dup_3gram_frac"]) == (0.0, 0.0, 0.0)
    # doc 3: empty text → all zeros, no nulls
    d3 = out[3]
    for c in ("dup_line_frac", "dup_line_char_frac", "dup_2gram_frac",
              "dup_3gram_frac", "dup_4gram_frac"):
        assert d3[c] == 0.0
    # doc 5 'a b c a b c': 2-grams [a b, b c, c a, a b, b c] — 'a b'
    # and 'b c' repeat → 4 of 5 occurrences (equal lengths) → 0.8;
    # 3-grams [a b c, b c a, c a b, a b c] → 'a b c' dup → 2·5/(4·5)=0.5
    assert out[5]["dup_2gram_frac"] == pytest.approx(0.8, abs=1e-6)
    assert out[5]["dup_3gram_frac"] == pytest.approx(0.5, abs=1e-6)


def test_top_ngram_char_frac(rep_docs):
    out = {r["doc_id"]: r for r in top_ngram_char_frac(rep_docs, n=2).collect()}
    # doc 4: 'x y' occurs 2×, len 3, text len 9 → 6/9
    assert out[4]["top_ngram"] == "x y"
    assert out[4]["top_ngram_char_frac"] == pytest.approx(6 / 9, abs=1e-6)
    # doc 5: 'a b' and 'b c' both occur 2× → lexicographic tiebreak
    assert out[5]["top_ngram"] == "a b"
    # doc 3 has <2 tokens → absent from output
    assert 3 not in out
    # doc 1: newlines count as whitespace → tokens [a,b,a,b,c,d],
    # top gram 'a b' ×2, text len 11 → 6/11
    assert out[1]["top_ngram"] == "a b"
    assert out[1]["top_ngram_char_frac"] == pytest.approx(6 / 11, abs=1e-6)
