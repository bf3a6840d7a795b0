"""Sequence packing (concat-and-chunk) invariants + Katz centrality
numpy parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.algorithms import katz_centrality
from graphblast_spark.functions.packing import pack_sequences, packing_stats
from graphblast_spark.matrix import Graph


DOCS = [
    # (doc_id, text) — token counts 3, 5, 0, 7, 2, 4 across 2 shards
    (0, "alpha beta gamma"),
    (1, "one two three four five"),
    (2, "   "),  # empty after tokenization — must vanish
    (3, "a b c d e f g"),
    (4, "x y"),
    (5, "p q r s"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _oracle_pack(docs, seq_len, n_shards):
    """Python replay: per shard, concatenate token counts in doc_id
    order, cut every seq_len tokens, emit (shard, seq, doc, doc_off,
    seq_off, n)."""
    rows = []
    for shard in range(n_shards):
        pos = 0
        for doc_id, text in sorted(docs):
            if doc_id % n_shards != shard:
                continue
            tok = len(text.split())
            if tok == 0:
                continue
            start, end = pos, pos + tok
            for q in range(start // seq_len, (end - 1) // seq_len + 1):
                lo, hi = max(start, q * seq_len), min(end, (q + 1) * seq_len)
                rows.append((shard, q, doc_id, lo - start, lo - q * seq_len, hi - lo))
            pos = end
    return sorted(rows)


@pytest.mark.parametrize("seq_len,n_shards", [(4, 2), (5, 1), (100, 3)])
def test_pack_sequences_matches_python_replay(spark, seq_len, n_shards):
    got = sorted(
        tuple(r)
        for r in pack_sequences(
            _docs_df(spark), seq_len=seq_len, n_shards=n_shards
        ).collect()
    )
    assert got == _oracle_pack(DOCS, seq_len, n_shards)


def test_pack_sequences_invariants(spark):
    packed = pack_sequences(_docs_df(spark), seq_len=4, n_shards=2)
    rows = packed.collect()
    # every doc's slices sum to its token count and are contiguous
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    tok = {d: len(t.split()) for d, t in DOCS}
    for doc_id, slices in by_doc.items():
        slices.sort(key=lambda r: r.doc_offset)
        assert sum(s.n_tokens for s in slices) == tok[doc_id]
        assert slices[0].doc_offset == 0
        for a, b in zip(slices, slices[1:]):
            assert b.doc_offset == a.doc_offset + a.n_tokens
            assert b.seq_idx == a.seq_idx + 1  # crossing consecutive seqs
    # every sequence except each shard's last is exactly full
    per_seq = (
        packed.groupBy("shard", "seq_idx")
        .agg(F.sum("n_tokens").alias("n"))
        .collect()
    )
    last = {}
    for r in per_seq:
        last[r.shard] = max(last.get(r.shard, -1), r.seq_idx)
    for r in per_seq:
        if r.seq_idx != last[r.shard]:
            assert r.n == 4, (r.shard, r.seq_idx)
        else:
            assert 0 < r.n <= 4
    # empty doc contributes nothing
    assert 2 not in by_doc


def test_packing_stats(spark):
    stats = {r.shard: r for r in packing_stats(
        _docs_df(spark), seq_len=4, n_shards=2
    ).collect()}
    # shard 0: docs 0 (3 tok) + 4 (2 tok) = 5 tokens -> 2 seqs, doc 4 splits
    s0 = stats[0]
    assert (s0.n_docs, s0.n_tokens, s0.n_seqs, s0.n_split_docs) == (2, 5, 2, 1)
    assert s0.fill_ratio == pytest.approx(5 / 8)
    # shard 1: docs 1 (5) + 3 (7) + 5 (4) = 16 tokens -> 4 seqs, full fill
    s1 = stats[1]
    assert (s1.n_docs, s1.n_tokens, s1.n_seqs) == (3, 16, 4)
    assert s1.fill_ratio == pytest.approx(1.0)


def test_pack_sequences_validates_knobs(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs_df(spark), seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(_docs_df(spark), n_shards=0)


def test_katz_matches_numpy_and_validates_alpha(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2), (4, 3)]
    n = 5
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    g = Graph.build(e, vertices=spark.range(n).selectExpr("id"))
    alpha, beta, iters = 0.1, 1.0, 4
    got = {r.id: r.katz for r in katz_centrality(
        g, alpha=alpha, beta=beta, fixed_iters=iters
    ).collect()}
    x = {v: beta for v in range(n)}
    for _ in range(iters):
        nxt = {v: beta for v in range(n)}
        for a, b in edges:
            nxt[b] += alpha * x[a]
        x = nxt
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12), v
    # in-link-free vertices sit at exactly beta
    assert got[4] == pytest.approx(beta)
    with pytest.raises(ValueError):
        katz_centrality(g, alpha=1.5)
    g.unpersist()


def test_eigenvector_matches_numpy_power_iteration(spark):
    from graphblast_spark.algorithms import eigenvector_centrality

    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2), (4, 3)]
    n, iters = 5, 6
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, val double"
    )
    g = Graph.build(e, vertices=spark.range(n).selectExpr("id"))
    got = {r.id: r.eigen for r in eigenvector_centrality(
        g, fixed_iters=iters
    ).collect()}
    x = [1.0] * n
    for _ in range(iters):
        y = [0.0] * n
        for a, b in edges:
            y[b] += x[a]
        nm = sum(v * v for v in y) ** 0.5
        x = [v / nm if nm > 0 else 0.0 for v in y]
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12), v
    # in-link-free vertex is exactly 0 after the first step
    assert got[4] == 0.0
    # the result is unit-length
    assert sum(v * v for v in got.values()) == pytest.approx(1.0)
    g.unpersist()


def test_eigenvector_zero_collapse_is_zeros_not_nan(spark):
    """On a path DAG all walks die out; once Aᵀx hits the zero vector
    the normalization guard must pin exact zeros instead of NaN."""
    from graphblast_spark.algorithms import eigenvector_centrality

    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, val double")
    g = Graph.build(e, vertices=spark.range(2).selectExpr("id"))
    got = {r.id: r.eigen for r in eigenvector_centrality(
        g, fixed_iters=3
    ).collect()}
    assert got == {0: 0.0, 1: 0.0}
    g.unpersist()
