"""PII redaction: crafted strings pin the per-kind semantics and the
sequential-pass interaction (an email's digits must not re-match as a
phone; an IPv4 must be consumed before the phone pass)."""

import pytest

from graphblast_spark.functions.pii import pii_stats, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return redact_pii(df).collect()[0]


def test_email_redaction(spark):
    r = _one(spark, "mail me at First.Last+tag@sub.Example.org today")
    assert r.text_redacted == "mail me at <EMAIL> today"
    assert (r.n_pii_email, r.n_pii_ipv4, r.n_pii_phone) == (1, 0, 0)
    assert r.n_pii == 1


def test_ipv4_and_phone(spark):
    r = _one(spark, "from 192.168.0.1 call +44 (0) 2071 234567 now")
    assert r.text_redacted == "from <IP> call <PHONE> now"
    assert (r.n_pii_email, r.n_pii_ipv4, r.n_pii_phone) == (0, 1, 1)


def test_email_digits_do_not_match_phone(spark):
    # 12345678 inside the local part is phone-shaped; the email pass
    # must consume it first.
    r = _one(spark, "user12345678@example.com")
    assert r.text_redacted == "<EMAIL>"
    assert r.n_pii_phone == 0


def test_ip_consumed_before_phone(spark):
    r = _one(spark, "10.20.30.40")
    assert r.text_redacted == "<IP>"
    assert (r.n_pii_ipv4, r.n_pii_phone) == (1, 0)


def test_clean_text_untouched(spark):
    r = _one(spark, "no pii here just words and the number 42")
    assert r.text_redacted == "no pii here just words and the number 42"
    assert r.n_pii == 0


def test_multiple_matches_counted(spark):
    r = _one(spark, "a@b.co and c@d.io from 1.2.3.4 or 5.6.7.8")
    assert (r.n_pii_email, r.n_pii_ipv4) == (2, 2)
    assert r.text_redacted == "<EMAIL> and <EMAIL> from <IP> or <IP>"


def test_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(df, kinds=("email", "ssn"))


def test_pii_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a@b.co and c@d.io"),
            (2, "1.2.3.4"),
            (3, "clean"),
        ],
        "doc_id long, text string",
    )
    rows = {r.kind: (r.n_docs, r.n_matches) for r in pii_stats(df).collect()}
    assert rows == {"email": (1, 2), "ipv4": (1, 1), "phone": (0, 0)}
