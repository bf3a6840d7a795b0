"""Deterministic synthetic Common-Crawl-style pages corpus.

The engine's source-of-truth input (BASELINE.json input_hint) is an
Iceberg/parquet table ``pages(url string, warc_ts timestamp,
html binary, text string, lang string)``. No external data exists in
this sandbox, so this module *generates* that table — fully
deterministic (every cell is a pure function of (page index, seed) via
splitmix64, independent of partitioning), distributed (mapInPandas over
spark.range — no driver-side materialization), and skewed (outlink
targets are power-law concentrated so hub pages emerge, exercising the
engine's skew handling).

Invariants the tests pin:
- ``text`` is byte-identical to what the extraction UDF
  (sources/distill.py) recovers from ``html`` — per url, per the
  input_hint's per-row invariant;
- out-degree ~ Zipf-ish clipped to [0, 64]; targets ∝ dense-at-0 so
  in-degree is power-law (FIXTURES.md §1);
- lang ∈ {en, de, fr} chosen by hash(url).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_EPOCH = np.datetime64("2024-01-01T00:00:00")
_LANGS = np.array(["en", "de", "fr"])
_VOCAB = np.array(
    (
        "the of and to in is was for on that with as by at from this it an be "
        "are or not have had which one you were all her she there would their "
        "we him been has when who will no more if out so said what up its "
        "about into than them can only other new some could time these two "
        "may then do first any my now such like our over man me even most "
        "made after also did many before must through back years where much "
        "your way well down should because each just those people too how "
        "little state good very make world still own see men work long get "
        "here between both life being under never day same another know while "
        "last might us great old year off come since against go came right "
        "used take three states himself few house use during without again "
        "place around however home small found mrs thought went say part once "
        "general high upon school every don does got united left number course "
        "war until always away something fact though water less public put "
        "think almost hand enough far took head yet government system better "
        "set told nothing night end why called didn eyes find going look"
    ).split()
)
_NSITES_DIV = 97  # pages per site (so n_sites ≪ n_pages and site hubs exist)
_MAX_OUTDEG = 64
_BODY_WORDS = 24


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public-domain splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _h(i: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _splitmix64(
        i.astype(np.uint64) * np.uint64(0x100000001B3)
        + np.uint64(stream) * np.uint64(0x1000193)
        + np.uint64(seed)
    )


def _u01(i: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _h(i, stream, seed).astype(np.float64) / np.float64(2**64)


def page_url(i: np.ndarray) -> np.ndarray:
    site = i // _NSITES_DIV
    return np.char.add(
        np.char.add("https://site", np.char.zfill(site.astype("U8"), 5)),
        np.char.add(".example/p/", np.char.zfill(i.astype("U8"), 6)),
    )


def _body_text(i: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic _BODY_WORDS-word paragraph per page (pure fn of i)."""
    cols = [
        _VOCAB[_h(i, 100 + j, seed) % np.uint64(len(_VOCAB))] for j in range(_BODY_WORDS)
    ]
    out = cols[0]
    for c in cols[1:]:
        out = np.char.add(np.char.add(out, " "), c)
    return out


def _outlink_targets(i: np.ndarray, n_pages: int, seed: int) -> list[np.ndarray]:
    """Per page: out-degree k(i) ∈ [0, 64] ~ Zipf-ish; target t(i,j) is
    power-law concentrated near page 0 (u³ mapping) so hubs emerge."""
    u = _u01(i, 1, seed)
    # Zipf(a≈2)-shaped: P(k ≥ x) ∝ 1/x; clip to [0, _MAX_OUTDEG].
    k = np.minimum((1.0 / np.maximum(u, 1e-12)).astype(np.int64) - 1, _MAX_OUTDEG)
    k = np.maximum(k, 0)
    targets = []
    for j in range(_MAX_OUTDEG):
        t = (_u01(i, 1000 + j, seed) ** 3 * n_pages).astype(np.int64) % n_pages
        targets.append(np.where(j < k, t, -1))
    return targets


def generate_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table of exactly n_pages rows."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            i = b["id"].to_numpy()
            url = page_url(i)
            body = _body_text(i, seed)
            title = np.char.add("Page ", i.astype("U12"))
            tgt = _outlink_targets(i, n_pages, seed)
            anchors = np.full(i.shape, "", dtype=object)
            for t in tgt:
                valid = t >= 0
                if not valid.any():
                    continue
                # Anchor text varies deterministically with the target
                # (real crawls carry signal in anchors — "about page 42",
                # not a constant) so anchor aggregation has real work.
                term = np.char.add(
                    "about page ", (np.maximum(t, 0) % 997).astype("U4")
                )
                link = np.char.add(
                    np.char.add(
                        np.char.add('<li><a href="', page_url(np.maximum(t, 0))),
                        np.char.add('">', term),
                    ),
                    "</a></li>",
                )
                anchors = np.where(valid, np.char.add(anchors.astype("U"), link), anchors)
            html = (
                "<html><head><title>"
                + pd.Series(title)
                + "</title></head><body><p>"
                + pd.Series(body)
                + "</p><ul>"
                + pd.Series(anchors.astype("U"))
                + "</ul></body></html>"
            )
            ts = _EPOCH + (_h(i, 2, seed) % np.uint64(86400 * 365)).astype("timedelta64[s]")
            lang = _LANGS[_h(i, 3, seed) % np.uint64(len(_LANGS))]
            yield pd.DataFrame(
                {
                    "url": url,
                    "warc_ts": pd.Series(ts),
                    "html": html.str.encode("utf-8"),
                    "text": pd.Series(body),
                    "lang": lang,
                }
            )

    return (
        spark.range(0, n_pages, numPartitions=num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
