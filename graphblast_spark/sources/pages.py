"""Pages-table ingestion — the engine's front door.

The north-rule input is an Iceberg table of Common-Crawl-style pages
(``url, warc_ts, html, text, lang`` — BASELINE.json input_hint).
:func:`read_pages` is the single entry point every pipeline should use:

- ``format="iceberg"`` reads a catalog table via the Iceberg Spark
  runtime (``spark.read.format("iceberg").load("catalog.db.pages")``),
  getting snapshot isolation, hidden-partition pruning, and
  metadata-level file skipping for free. The Iceberg runtime jar is NOT
  bundled in this sandbox, so the path is gated: a missing
  DataSourceRegister raises a clear error naming the spark-submit
  ``--packages`` coordinate to add — the code path itself is the real
  one a cluster deployment runs.
- ``format="parquet"`` (default here) reads a plain parquet directory —
  the sandbox/testdata path, byte-identical schema.
- ``format="auto"`` picks iceberg for ``catalog.db.table``-looking
  identifiers, parquet for paths.

Either way the result is checked against the expected column set so a
schema drift fails loudly at ingestion, not three joins later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = {"url", "warc_ts", "html", "text", "lang"}

_ICEBERG_HINT = (
    "Iceberg runtime not available in this Spark session. On a cluster, "
    "submit with --packages org.apache.iceberg:iceberg-spark-runtime-"
    "<spark-version>:<iceberg-version> and configure a catalog "
    "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
    "in this sandbox use format='parquet'."
)


def read_pages(
    spark: SparkSession, source: str, format: str = "auto"
) -> DataFrame:
    """Load the pages table from an Iceberg table identifier or a
    parquet path and validate the north-rule schema."""
    if format == "auto":
        looks_like_table = "/" not in source and "." in source
        format = "iceberg" if looks_like_table else "parquet"
    if format == "iceberg":
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception as e:  # ClassNotFound / DataSource not registered
            raise RuntimeError(_ICEBERG_HINT) from e
    elif format == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown pages format: {format!r}")
    missing = PAGES_COLUMNS - set(df.columns)
    if missing:
        raise ValueError(
            f"pages source {source!r} is missing required columns "
            f"{sorted(missing)}; expected at least {sorted(PAGES_COLUMNS)}"
        )
    return df
