"""Boilerplate removal: crafted multi-paragraph docs pin the
distinct-document threshold, order-preserving rebuild, and the
all-boilerplate / no-span edge cases."""

from pyspark.sql import functions as F

from graphblast_spark.functions.dedup import (
    boilerplate_spans,
    paragraph_spans,
    remove_boilerplate,
)

FOOTER = "all rights reserved"


def _docs(spark):
    rows = [
        (1, f"unique body one\n{FOOTER}"),
        (2, f"unique body two\n{FOOTER}"),
        (3, f"{FOOTER}\nunique body three"),
        (4, FOOTER),                      # all-boilerplate doc
        (5, "repeated inside repeated inside"),  # intra-doc repeat ≠ boilerplate
        (6, ""),                          # no spans
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_set_uses_distinct_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string"
    )
    # "x" occurs 3 times but in ONE doc — not boilerplate at min_docs=2.
    assert boilerplate_spans(paragraph_spans(docs), min_docs=2).count() == 0


def test_remove_boilerplate_end_to_end(spark):
    out = {
        r.doc_id: r
        for r in remove_boilerplate(
            _docs(spark), min_docs=3, spans=paragraph_spans(_docs(spark))
        ).collect()
    }
    assert out[1].text_clean == "unique body one"
    assert out[2].text_clean == "unique body two"
    assert out[3].text_clean == "unique body three"  # order preserved
    assert out[4].text_clean == "" and out[4].n_boiler_spans == 1
    assert out[4].boiler_char_frac == 1.0
    assert out[5].text_clean == "repeated inside repeated inside"
    assert out[6].text_clean == "" and out[6].n_spans == 0
    assert out[1].n_spans == 2 and out[1].n_boiler_spans == 1


def test_threshold_respected(spark):
    # FOOTER appears in 4 distinct docs; min_docs=5 keeps it everywhere.
    out = remove_boilerplate(
        _docs(spark), min_docs=5, spans=paragraph_spans(_docs(spark))
    )
    assert out.agg(F.sum("n_boiler_spans")).collect()[0][0] == 0
