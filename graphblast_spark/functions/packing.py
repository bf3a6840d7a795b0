"""Sequence packing for LLM training — concat-and-chunk with a
document boundary map.

The standard GPT-style pretraining layout: within a shard, documents
are concatenated in a deterministic order and the token stream is cut
into fixed-length sequences of ``seq_len`` tokens. The output here is
the PACKING MAP — one row per (document × sequence) overlap saying
which slice of which document lands at which offset of which training
sequence — which is exactly what a downstream tokenizer/writer needs
to materialize shards, and what attention-masking-aware loaders need
to rebuild document boundaries.

Everything is whitespace-token arithmetic over ``functions.text``'s
shared tokenizer — pure Column expressions, no Python UDFs, every
formula ANSI-SQL-expressible so DuckDB oracles replay it exactly.

Scale design (the reason this is shaped the way it is):

- The cumulative-offset window runs PER SHARD (`partitionBy(shard)`),
  never globally — a global `Window.orderBy` would funnel the whole
  corpus through one task. Shards are the parallelism unit: at 100 TB
  you run n_shards in the thousands and every shard's window is one
  partition-local sort.
- ``shard = doc_id % n_shards`` (id-mod, not hash) keeps the layout
  byte-deterministic and DuckDB-replayable; with dense doc_ids it is
  also perfectly balanced. A production variant may swap in a hash —
  the arithmetic downstream is unchanged.
- One shuffle total (by shard, sorting by doc_id inside), then a
  per-row explode over the sequences a document touches — output size
  is n_docs + n_boundary_crossings, never n_docs × n_seqs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphblast_spark.functions.text import tokens


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing map (shard, seq_idx, doc_id, doc_offset, seq_offset,
    n_tokens): the ``n_tokens``-token slice of ``doc_id`` starting at
    token ``doc_offset`` occupies positions [seq_offset,
    seq_offset+n_tokens) of training sequence ``seq_idx`` in ``shard``.

    Within a shard the token stream is documents in ascending
    ``doc_id`` order, concatenated with no separator and cut every
    ``seq_len`` tokens; the trailing partial sequence is kept (the
    writer pads or drops it — this map reports what exists). Empty
    documents (0 tokens) occupy no stream positions and are omitted.

    Invariants (pinned by tests): per (shard, seq_idx),
    Σ n_tokens == seq_len for every sequence except each shard's last;
    per doc, Σ n_tokens == its token count; slices are contiguous in
    both document and sequence coordinates.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive; got {seq_len!r}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive; got {n_shards!r}")

    L = F.lit(int(seq_len)).cast("long")
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col).cast("long"), F.lit(int(n_shards))).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("tok"),
    ).filter(F.col("tok") > 0)

    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = d.withColumn("start", F.sum("tok").over(w) - F.col("tok"))

    seq = F.explode(
        F.sequence(F.floor(F.col("start") / L), F.floor((F.col("start") + F.col("tok") - 1) / L))
    ).alias("seq_idx")
    d = d.select("shard", "doc_id", "tok", "start", seq)
    lo = F.greatest(F.col("start"), F.col("seq_idx") * L)
    hi = F.least(F.col("start") + F.col("tok"), (F.col("seq_idx") + 1) * L)
    return d.select(
        "shard",
        "seq_idx",
        "doc_id",
        (lo - F.col("start")).alias("doc_offset"),
        (lo - F.col("seq_idx") * L).alias("seq_offset"),
        (hi - lo).alias("n_tokens"),
    )


def packing_stats(
    docs: DataFrame,
    seq_len: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard packing summary (shard, n_docs, n_tokens, n_seqs,
    n_split_docs, fill_ratio): ``n_seqs`` = ceil(n_tokens/seq_len),
    ``n_split_docs`` = documents crossing ≥1 sequence boundary,
    ``fill_ratio`` = n_tokens / (n_seqs·seq_len) — the padding cost of
    the trailing partial sequence."""
    packed = pack_sequences(docs, seq_len, n_shards, id_col, text_col)
    per_doc = packed.groupBy("shard", "doc_id").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n_slices")
    )
    return (
        per_doc.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            F.sum(F.when(F.col("n_slices") > 1, 1).otherwise(0)).alias("n_split_docs"),
        )
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.ceil(F.col("n_tokens") / F.lit(float(seq_len))).alias("n_seqs"),
            "n_split_docs",
            F.round(
                F.col("n_tokens")
                / (F.ceil(F.col("n_tokens") / F.lit(float(seq_len))) * F.lit(float(seq_len))),
                6,
            ).alias("fill_ratio"),
        )
    )
