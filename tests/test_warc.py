"""WARC source/sink: record-level parse fidelity, gzip multi-member
handling, HTTP envelope stripping (plain + chunked), write→read
round-trip, and the end-to-end WARC → distill → edge-table path (the
north-rule pipeline's true front door)."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from graphblast_spark.sources.corpus import generate_pages
from graphblast_spark.sources.warc import (
    _http_payload,
    iter_warc_records,
    read_warc,
    write_warc,
)


def _mk_record(url: str, date: str, block: bytes, wtype: str = "response") -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\nContent-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


HTML1 = b"<html><body>alpha</body></html>"
HTML2 = b"<html><body>beta</body></html>"
HTTP_BLOCK = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML1
)
_C1, _C2 = HTML1[:26], HTML1[26:] + b"X"
CHUNKED_BLOCK = (
    b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    + hex(len(_C1))[2:].encode() + b"\r\n" + _C1 + b"\r\n"
    + hex(len(_C2))[2:].encode() + b"\r\n" + _C2 + b"\r\n"
    + b"0\r\n\r\n"
)


def test_iter_warc_records_parses_headers_and_blocks():
    data = (
        _mk_record("http://a/", "2024-01-02T03:04:05Z", HTTP_BLOCK)
        + _mk_record("http://b/", "2024-01-02T03:04:06Z", HTML2, wtype="metadata")
    )
    recs = list(iter_warc_records(data))
    assert len(recs) == 2
    h0, b0 = recs[0]
    assert h0["warc-target-uri"] == "http://a/"
    assert h0["warc-type"] == "response"
    assert b0 == HTTP_BLOCK
    assert recs[1][0]["warc-type"] == "metadata"


def test_iter_warc_records_truncated_tail_stops_cleanly():
    data = _mk_record("http://a/", "2024-01-02T03:04:05Z", HTML1) + b"WARC/1.0\r\nWARC-Typ"
    recs = list(iter_warc_records(data))
    assert len(recs) == 1


def test_http_payload_plain_and_chunked():
    assert _http_payload(HTTP_BLOCK) == HTML1
    assert _http_payload(CHUNKED_BLOCK) == HTML1 + b"X"
    assert _http_payload(HTML1) == HTML1  # non-HTTP block passes through


def test_read_warc_plain_and_gzip(spark, tmp_path):
    data = (
        _mk_record("http://a/", "2024-01-02T03:04:05Z", HTTP_BLOCK)
        + _mk_record("http://skip/", "2024-01-02T03:04:05Z", b"meta", wtype="metadata")
        + _mk_record("http://b/", "2024-06-07T08:09:10Z", HTML2)
    )
    (tmp_path / "one.warc").write_bytes(data)
    # per-record gzip members, the Common Crawl framing
    members = b"".join(
        gzip.compress(r, mtime=0)
        for r in (
            _mk_record("http://c/", "2025-01-01T00:00:00Z", HTML1),
            _mk_record("http://d/", "2025-01-01T00:00:01Z", HTML2),
        )
    )
    (tmp_path / "two.warc.gz").write_bytes(members)

    rows = {
        r.url: r
        for r in read_warc(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"http://a/", "http://b/", "http://c/", "http://d/"}
    assert bytes(rows["http://a/"].html) == HTML1  # HTTP envelope stripped
    assert bytes(rows["http://b/"].html) == HTML2
    assert bytes(rows["http://c/"].html) == HTML1
    assert rows["http://a/"].warc_ts == pd.Timestamp("2024-01-02T03:04:05")
    assert rows["http://a/"].text is None and rows["http://a/"].lang is None


def test_write_read_round_trip_and_manifest(spark, tmp_path):
    pages = generate_pages(spark, 50, seed=7, num_partitions=3)
    out = str(tmp_path / "sink")
    manifest = write_warc(pages, out).collect()
    assert sum(m.n_records for m in manifest) == 50
    assert all(m.path.endswith(".warc.gz") for m in manifest)
    back = read_warc(spark, out)
    orig = {
        (r.url, r.warc_ts, bytes(r.html))
        for r in pages.select("url", "warc_ts", "html").collect()
    }
    got = {(r.url, r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert got == orig


def test_warc_to_distilled_edges(spark, tmp_path):
    """WARC front door feeds the north-rule pipeline unchanged: the
    distilled edge table from WARC-round-tripped pages is identical to
    the one distilled from the original pages table."""
    from graphblast_spark.sources.distill import distill_edges

    pages = generate_pages(spark, 200, seed=11, num_partitions=2)
    out = str(tmp_path / "sink")
    write_warc(pages, out).collect()
    loaded = read_warc(spark, out)
    e1, _ = distill_edges(pages)
    e2, _ = distill_edges(loaded)
    assert {tuple(r) for r in e1.collect()} == {tuple(r) for r in e2.collect()}
