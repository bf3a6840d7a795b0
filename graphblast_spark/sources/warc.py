"""WARC source/sink — Common Crawl's upstream archive format.

The north-rule pipeline ingests "Common-Crawl-style web pages"
(BASELINE.json input_hint); the format those pages actually arrive in
upstream of any Iceberg/parquet table is WARC (ISO 28500): a
concatenation of records, each a ``WARC/1.0`` header block + a body
block, where ``WARC-Type: response`` records carry the raw HTTP
response (headers + HTML payload) for one fetched URL. Common Crawl
ships them as ``.warc.gz`` — one gzip *member per record* so readers
can seek — which plain ``gzip.decompress`` handles transparently
(multi-member concatenation is part of the gzip spec).

Spark mapping (scale notes):

- ``read_warc`` lists the files with Spark's ``binaryFile`` source and
  parses each file inside an Arrow-batched ``mapInPandas`` — the
  standard Spark shape for WARC (binaryFile does not split, which is
  CORRECT here: WARC records cross arbitrary byte boundaries, so the
  file is the natural work unit). Parallelism therefore equals the
  file count; Common Crawl's ~1 GB segment files give a 100 TB crawl
  ~100k-way parallelism with ~1 GB peak memory per task. No driver
  collect, no shuffle: parse → pages rows is a narrow map.
- The parser is pure stdlib over the in-memory bytes (no per-row
  Python *crossing*: one Python call per FILE, vectorized pandas
  assembly of the output batch), mirroring how the multimodal tier
  treats opaque binary columns.
- ``write_warc`` is the inverse sink: one ``.warc.gz`` per input
  partition via ``mapInPandas``, emitting a (path, n_records,
  n_bytes) manifest — distributed, no single-writer bottleneck.

Output schema is exactly the pages table the rest of the engine eats
(``sources/pages.py PAGES_COLUMNS``): ``url, warc_ts, html, text,
lang`` with ``text``/``lang`` left NULL — text extraction is
``sources/distill.py``'s job, keeping the byte-identical-extraction
invariant in one place.

Reference parity: gunrock/graphblast ingests MatrixMarket files
(io/mmio.hpp); WARC is this engine's equivalent front door for the
webtext tier, beyond-reference by design.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from graphblast_spark.sources.corpus import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (raw captures
    store the wire bytes; Common Crawl records are occasionally
    chunked). Malformed chunking returns the body unchanged — a
    best-effort capture beats a dropped record in a crawl pipeline."""
    out = []
    pos = 0
    try:
        while True:
            eol = body.index(b"\r\n", pos)
            size = int(body[pos:eol].split(b";")[0], 16)
            if size == 0:
                break
            start = eol + 2
            out.append(body[start:start + size])
            pos = start + size + 2  # skip trailing CRLF
        return b"".join(out)
    except (ValueError, IndexError):
        return body


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a WARC response block:
    status line + headers end at the first blank line; a chunked
    Transfer-Encoding is decoded. Non-HTTP blocks pass through."""
    if not block.startswith(b"HTTP/"):
        return block
    sep = block.find(_CRLF2)
    if sep < 0:
        return block
    head, body = block[:sep].lower(), block[sep + 4:]
    if b"transfer-encoding:" in head and b"chunked" in head:
        body = _dechunk(body)
    return body


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, block) per WARC record in ``data``. Headers are
    lower-cased name → value. Tolerates LF-only header endings and
    arbitrary inter-record padding; stops at the first structurally
    unrecoverable position (truncated tail) rather than raising —
    crawl archives are routinely truncated mid-record."""
    pos, n = 0, len(data)
    while pos < n:
        nxt = data.find(b"WARC/", pos)
        if nxt < 0:
            return
        pos = nxt
        hdr_end = data.find(_CRLF2, pos)
        sep_len = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end < 0 or (0 <= lf_end < hdr_end):
            hdr_end, sep_len = lf_end, 2
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").splitlines()[1:]:
            name, _, value = line.partition(":")
            if _:
                headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return  # unrecoverable: cannot locate the next record
        start = hdr_end + sep_len
        yield headers, data[start:start + clen]
        pos = start + clen


def _parse_warc_bytes(raw: bytes) -> pd.DataFrame:
    """One WARC (or .warc.gz) file's bytes → pages-schema DataFrame of
    its ``WARC-Type: response`` records."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)  # multi-member per the gzip spec
    urls, tss, htmls = [], [], []
    for headers, block in iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        urls.append(url)
        tss.append(headers.get("warc-date"))
        htmls.append(_http_payload(block))
    ts = pd.to_datetime(
        pd.Series(tss, dtype="object"), utc=True, errors="coerce", format="ISO8601"
    ).dt.tz_localize(None)
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": ts,
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series([None] * len(urls), dtype="object"),
            "lang": pd.Series([None] * len(urls), dtype="object"),
        }
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC / WARC.gz files (path, directory, or glob) into the
    pages schema (``text``/``lang`` NULL until distillation). One task
    per file — see the module docstring for why that is the right
    partitioning unit for WARC at crawl scale."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for raw in b["content"]:
                yield _parse_warc_bytes(bytes(raw))

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("content")
        .mapInPandas(parse, schema=PAGES_SCHEMA)
    )


def _record_bytes(url: str, ts, html: bytes) -> bytes:
    ts_s = (
        pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
        if ts is not None and not pd.isna(ts)
        else "1970-01-01T00:00:00Z"
    )
    body = b"" if html is None else bytes(html)
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_s}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode()
    # hdr already ends with CRLF; one more CRLF closes the header block
    return hdr + b"\r\n" + body + _CRLF2


def write_warc(pages: DataFrame, out_dir: str, compress: bool = True) -> DataFrame:
    """Distributed WARC sink: one ``.warc.gz`` (or ``.warc``) file per
    input partition, written executor-side; returns the manifest
    (path string, n_records long, n_bytes long) — an action on the
    manifest performs the write. Bodies are written as identity
    (non-HTTP) blocks: ``read_warc(write_warc(df))`` round-trips
    url/warc_ts/html exactly."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        for b in batches:
            for url, ts, html in zip(b["url"], b["warc_ts"], b["html"]):
                buf.write(_record_bytes(url, ts, html))
                n += 1
        if n == 0:
            yield pd.DataFrame({"path": [], "n_records": [], "n_bytes": []})
            return
        data = buf.getvalue()
        if compress:
            data = gzip.compress(data, mtime=0)
        ext = ".warc.gz" if compress else ".warc"
        # uuid guards against two attempts of the same task racing;
        # the manifest row carries the winning path.
        path = os.path.join(out_dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}{ext}")
        with open(path, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [len(data)]}
        )

    return pages.select("url", "warc_ts", "html").mapInPandas(
        dump, schema="path string, n_records long, n_bytes long"
    )
