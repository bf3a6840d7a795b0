"""Deduplication for web-scale training corpora.

Five tiers, all shuffle-conscious and all built from JVM-side Column
expressions (no Python in the hot path):

- **exact**: hash-groupBy on md5(text) — one shuffle on a short key.
- **MinHash + LSH**: word-shingle → K md5-minhashes → B bands →
  bucket-join. The LSH band join turns the O(n²) pair space into
  per-bucket joins; at 10^12 docs this is THE near-dup strategy — the
  shuffle key is the band hash, and bucket sizes are bounded by
  near-dup cluster sizes, not corpus size.
- **n-gram Jaccard**: exact verification on LSH candidates only
  (array_intersect/union on distinct shingle sets).
- **SimHash**: 64-bit bit-vote fingerprint; near-dups = equal (or
  Hamming-close) simhash — groupable, no pair join at all.
- **embedding cosine** near-dup: see functions/similarity.py.

Hash choice: md5 (not xxhash) so the DuckDB correctness oracles can
reproduce every signature bit-for-bit; the 60-bit hex→int trick
(conv in Spark, '0x'-cast in DuckDB) keeps ints in signed-64 range.
Production would swap in xxhash64 — a one-line change per site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphblast_spark.functions.text import tokens
from graphblast_spark.runtime.superstep import truncate_plan


def shingles(col: Column, n_words: int = 3) -> Column:
    """Distinct word n-gram shingle set (lowercased, whitespace-split)."""
    toks = tokens(col)
    n = F.size(toks)
    sh = F.when(
        n >= n_words,
        F.transform(
            F.sequence(F.lit(0), n - n_words),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n_words)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(sh)


def exact_duplicate_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ids: int = 100,
) -> DataFrame:
    """Groups of byte-identical documents: (fp_md5, n_dups, canonical_id,
    doc_ids) for groups with ≥2 members. One shuffle on md5.

    ``doc_ids`` is capped at ``max_ids`` members per group (pathological
    corpora — billions of copies of one boilerplate page — would
    otherwise blow the aggregation buffer for that key; ``n_dups`` still
    counts everything, and a full listing is a filter on fp_md5 away).
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("fp_md5"))
        .groupBy("fp_md5")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("canonical_id"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_ids).alias("doc_ids"),
        )
        .filter(F.col("n_dups") >= 2)
    )


MINHASH_P = (1 << 31) - 1  # Mersenne prime — products stay in int64


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients (a_j, b_j), a_j≠0,
    derivable in any engine from the same literals."""
    return [
        (((1103515245 * (j + 1)) % MINHASH_P) or 1, (12345 * (j + 7)) % MINHASH_P)
        for j in range(k)
    ]


def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n_words: int = 3,
) -> DataFrame:
    """(doc_id, sig array<long>[k]): classic affine MinHash —
    ONE md5 per shingle (base hash h = first 60 md5 bits mod P), then
    sig_j = min over shingles of (a_j·h + b_j) mod P. The per-(shingle,
    permutation) work is two integer ops in codegen, so k-wide
    signatures cost ~the same as one md5 pass (the naive
    md5-per-(shingle,j) variant measured 16× the hashing: 54 s → 3 s on
    5k docs). Coefficients from :func:`minhash_params` — reproducible
    bit-for-bit in the DuckDB oracle."""
    sh = shingles(F.col(text_col), n_words)
    base = F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_P),
        ),
    )
    with_base = docs.select(F.col(id_col).alias("doc_id"), base.alias("hs"))

    def _perm(a: int, b: int):
        # closure factory, NOT a default-arg lambda: pyspark HOFs
        # dispatch on lambda arity (2-arg receives (element, index))
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_P))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), _perm(a, b)))
            for a, b in minhash_params(k)
        ]
    )
    return with_base.select("doc_id", sig.alias("sig"))


def band_keys(sigs: DataFrame, bands: int = 4, rows_per_band: int = 4) -> DataFrame:
    """(doc_id, band, bkey): each signature split into ``bands`` LSH
    bands; bkey = that band's signature rows joined as a string. Two
    documents sharing any (band, bkey) are near-dup candidates — the
    bucket key that turns the O(n²) pair space into per-bucket joins."""
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(a, b) candidate near-dup pairs (a < b): documents sharing at
    least one LSH band (:func:`band_keys`). The band-bucket self-join
    is the only shuffle; dedup via distinct. The banded table is
    materialized once via an eager localCheckpoint — a self-join would
    otherwise recompute the full signature pipeline for BOTH sides
    (measured 2× end-to-end), and unlike ``persist()`` the checkpoint
    blocks are released when the result goes out of scope (no leaked
    cache entry per call)."""
    banded = band_keys(sigs, bands, rows_per_band).transform(truncate_plan)
    l = banded.select(F.col("band"), F.col("bkey"), F.col("doc_id").alias("a"))
    r = banded.select(F.col("band"), F.col("bkey"), F.col("doc_id").alias("b"))
    return (
        l.join(r, on=["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_words: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: (a, b, jaccard).
    Join the (small) candidate list against the shingle table twice —
    both joins broadcast the pair list when it is small."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), n_words).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "a").join(b, "b")
        .select("a", "b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_duplicate_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    n_words: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """End-to-end corpus dedup: (doc_id, cluster_id, is_canonical).

    The full training-data dedup pipeline in one call, each stage the
    scale-correct one: MinHash signatures (one md5 pass) → LSH banding
    (bucket join, no O(n²) pair space) → exact n-gram Jaccard on the
    candidates only → **connected components over the verified
    near-dup pair graph** (FastSV, :mod:`..algorithms.cc`), because
    near-duplication is not transitive pairwise — A≈B and B≈C must
    land A,B,C in ONE cluster or canonical selection is ill-defined.
    ``cluster_id`` = min doc_id of the cluster; ``is_canonical`` marks
    that doc (the row you keep). Byte-identical duplicates share every
    band, so exact dups fold into the same clusters for free.

    At 10^12 docs each stage shuffles on bounded keys (band buckets,
    pair endpoints) and CC runs on the *dup-pair graph* — a graph with
    |pairs| edges, minuscule next to the corpus — while the vertex set
    stays the full corpus so singletons keep their own cluster.
    """
    sigs = minhash_signature(docs, id_col, text_col, k=k, n_words=n_words)
    pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    verified = ngram_jaccard_pairs(
        docs, pairs, id_col, text_col, n_words=n_words, threshold=threshold
    ).transform(truncate_plan)  # feeds both the CC vertex set and edges
    return _clusters_from_pairs(docs, id_col, verified)


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """(doc_id, simhash): per-token 60-bit hash (md5 hex → int via conv),
    bit-vote aggregate, sign → fingerprint bit. 60 bits keeps every
    intermediate in signed-64 range (and is DuckDB-replayable)."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    th = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    def _vote(b):
        mask = F.lit(1 << b).cast("long")
        return F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    votes = [_vote(b) for b in range(bits)]
    fp = None
    for b, v in enumerate(votes):
        bit = F.when(v > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("simhash"))


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(a, b, hamming): doc pairs whose simhash fingerprints differ in
    at most ``max_hamming`` bits — the production simhash tier
    (Manku, Jain, Sarma WWW'07 "Detecting Near-Duplicates for Web
    Crawling"): exact-fingerprint grouping misses the whole point of
    simhash, which is that NEAR-duplicate text lands a FEW bits apart.

    Pigeonhole banding: the fingerprint splits into ``max_hamming + 1``
    contiguous bit bands; two fingerprints within Hamming distance k
    agree exactly on ≥ 1 of the k+1 bands, so a per-band self-join on
    (band index, band value) finds every such pair with zero false
    negatives; ``bit_count(a XOR b) <= k`` then verifies exactly.
    (The WWW'07 paper permutes/rotates tables to keep each probe's
    candidate list tiny at 8B docs; with Spark the band self-join IS
    the table probe, executed as one shuffle on uniform band keys.)

    At 10^12 docs: the join key space is 2^15 per band (k=3, 60 bits),
    so band buckets are corpus/2^15-sized on random text — the
    candidate set is Σ|bucket|² per band, the same bounded-bucket
    shape as the MinHash LSH tier, NOT all-pairs. ``sigs`` short-cuts
    recomputation when the caller already has simhash64 output."""
    nbands = max_hamming + 1
    if bits // nbands == 0:
        raise ValueError(f"bits={bits} too small for max_hamming={max_hamming}")
    sh = sigs if sigs is not None else simhash64(docs, id_col, text_col, bits=bits)
    w = bits // nbands
    widths = [w] * (nbands - 1) + [bits - w * (nbands - 1)]
    offs = [w * i for i in range(nbands)]
    band_vals = F.array(*[
        F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << wd) - 1).cast("long"))
        for off, wd in zip(offs, widths)
    ])
    banded = sh.select(
        "doc_id", "simhash", F.posexplode(band_vals).alias("band", "bval")
    )
    l, r = banded.alias("l"), banded.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
            "inner",
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()  # a pair can agree on several bands
    )


def simhash_hamming_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    max_hamming: int = 3,
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical): connected components over
    the Hamming-≤k simhash pair graph — same output contract (and the
    same dup-pair-graph-only CC) as :func:`near_duplicate_clusters`,
    with simhash banding instead of MinHash LSH as the candidate
    generator. Hamming proximity is not transitive, hence the CC
    closure; cluster_id = min doc_id, is_canonical marks the keeper."""
    pairs = simhash_hamming_pairs(
        docs, id_col, text_col, bits=bits, max_hamming=max_hamming
    ).transform(truncate_plan)
    return _clusters_from_pairs(docs, id_col, pairs)


def _clusters_from_pairs(docs: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_canonical) from a verified (a, b) pair
    set: FastSV CC over the pair graph ONLY (singletons never enter the
    superstep loop — at corpus scale almost every doc pairs with
    nothing), then a left join hands every unpaired doc its own
    cluster. Shared by the MinHash and simhash-Hamming tiers."""
    from graphblast_spark.algorithms.cc import connected_components
    from graphblast_spark.matrix import Graph

    if not pairs.head(1):  # no near-dups anywhere: all singletons
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(id_col).alias("cluster_id"),
            F.lit(True).alias("is_canonical"),
        )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("val")
    )
    g = Graph.build(edges, symmetrize=True)  # vertices = paired docs only
    cc = connected_components(g)  # localCheckpointed → safe to release g
    g.unpersist()
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("is_canonical"),
        )
    )


# ----------------------------------------------------------------------
# Span-level exact dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the verbatim-span tier). MinHash/LSH
# above catches near-duplicate DOCUMENTS; the dominant contamination
# mode in Common-Crawl corpora is long verbatim spans (boilerplate,
# licenses, quoted articles) embedded in otherwise-distinct pages.
# Lee et al. use suffix arrays (exact substrings ≥50 tokens); the
# Spark-scalable reframe is exact dedup at SPAN granularity — split
# every doc into spans (paragraphs, or fixed token windows for
# unstructured text), md5 each span, and hash-groupBy corpus-wide:
# the same one-short-key-shuffle machinery as exact_duplicate_groups,
# at span granularity.
#
# Plan shape at 10^12 docs: span extraction is a narrow projection +
# explode; the occurrence→count join and both aggregations shuffle on
# md5(span) / doc_id — uniform 16-byte / id keys with map-side
# combining, no windows, no skewed key (a boilerplate span repeated
# 10^9× concentrates its COUNT row, but counts pre-aggregate map-side;
# the occurrence rows stay spread across their docs' partitions).
# ----------------------------------------------------------------------


def paragraph_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim_re: str = "\\n+",
    min_chars: int = 1,
) -> DataFrame:
    """(doc_id, pos, span): documents split into paragraph spans on the
    delimiter regex, whitespace-trimmed, spans shorter than
    ``min_chars`` dropped. ``pos`` is the 0-based span position within
    the doc (provenance key)."""
    parts = F.filter(
        F.transform(F.split(F.col(text_col), delim_re), lambda p: F.trim(p)),
        lambda p: F.length(p) >= min_chars,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(parts).alias("pos", "span")
    )


def token_window_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 20,
    stride: int | None = None,
) -> DataFrame:
    """(doc_id, pos, span): fixed token windows for UNSTRUCTURED text
    (no paragraph breaks) — ``span_tokens`` words per span, windows
    every ``stride`` tokens (default = span_tokens, i.e. disjoint
    windows; a smaller stride overlaps windows and catches spans that
    straddle a window boundary at proportional cost). Docs shorter
    than one window contribute their whole text as a single span; the
    trailing partial window is DROPPED — up to ``stride - 1`` trailing
    tokens of every doc ≥ span_tokens land in no window (full tail
    coverage holds only as stride → 1). Consumers inherit that tail
    loss: ``remove_boilerplate``'s text rebuild and
    ``span_dedup_stats``'s denominator both exclude those tokens."""
    if stride is None:
        stride = span_tokens
    toks = tokens(F.col(text_col))
    m = F.size(toks)
    windows = (
        F.when(
            m >= span_tokens,
            F.transform(
                F.sequence(F.lit(1), m - (span_tokens - 1), F.lit(stride)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, span_tokens)),
            ),
        )
        .when(m > 0, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.array().cast("array<string>"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(windows).alias("pos", "span")
    )


def duplicate_spans(spans: DataFrame) -> DataFrame:
    """Corpus-wide span provenance: (span_md5, n_occurrences,
    canonical_doc_id, canonical_pos) for spans occurring ≥2 times.
    The canonical occurrence — the one Lee-et-al-style removal keeps —
    is the (doc_id, pos)-smallest, deterministic on any cluster."""
    return (
        spans.select("doc_id", "pos", F.md5("span").alias("span_md5"))
        .groupBy("span_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("doc_id", "pos")).alias("c"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .select(
            "span_md5",
            "n_occurrences",
            F.col("c.doc_id").alias("canonical_doc_id"),
            F.col("c.pos").alias("canonical_pos"),
        )
    )


def span_dedup_stats(
    docs: DataFrame,
    spans: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    **window_kwargs,
) -> DataFrame:
    """Per-document verbatim-duplication profile:
    (doc_id, n_spans, n_dup_spans, dup_span_frac) where a span
    occurrence is duplicated iff its exact text occurs ≥2 times
    ANYWHERE in the corpus (including within the same doc), and
    ``dup_span_frac`` is the character-weighted fraction of the doc's
    span characters inside duplicated spans — the doc-level signal for
    span-removal / filtering policies. Docs with zero spans report
    (0, 0, 0.0).

    ``spans`` defaults to :func:`token_window_spans` over ``docs``
    (pass :func:`paragraph_spans` output for structured text)."""
    if spans is None:
        spans = token_window_spans(docs, id_col, text_col, **window_kwargs)
    occ = spans.select(
        "doc_id", F.md5("span").alias("span_md5"), F.length("span").alias("c")
    )
    counts = occ.groupBy("span_md5").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = F.col("n_occ") >= 2
    per_doc = (
        occ.join(counts, "span_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("n_dup_spans"),
            F.sum("c").alias("tot_c"),
            F.sum(F.when(dup, F.col("c")).otherwise(0)).alias("dup_c"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.when(
                    F.coalesce("tot_c", F.lit(0)) > 0,
                    F.col("dup_c") / F.col("tot_c").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_span_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate removal (CCNet-style frequency tier). Span dedup above
# flags spans duplicated ANYWHERE (>=2 occurrences, pairwise verbatim
# copying); boilerplate is the complementary signal — spans that recur
# across MANY DISTINCT documents (nav bars, cookie banners, footers:
# the per-host furniture a Common-Crawl snapshot repeats millions of
# times). CCNet dedups at paragraph granularity against corpus-wide
# paragraph hashes; this is that tier with the threshold on distinct-
# document support.
#
# Plan shape at 10^12 docs: spans are a narrow explode; the support
# count is one groupBy(span_md5) with map-side partial aggregation
# (the skewed key IS boilerplate — a nav bar repeated 10^8 times —
# but partial_count absorbs it map-side: each task emits one
# (md5, partial) row, so no single reducer sees the raw fan-in);
# the re-join is a 16-byte-key hash join where Catalyst/AQE broadcasts
# the (small) boilerplate set when it fits. Rebuild is a per-doc
# collect_list bounded by document length — never corpus-bounded.
# ---------------------------------------------------------------------------


def boilerplate_spans(spans: DataFrame, min_docs: int = 2) -> DataFrame:
    """The boilerplate set: (span_md5, n_docs) for spans that occur in
    ``min_docs`` or more DISTINCT documents. count_distinct (not
    count): 50 copies inside one doc is repetition (text.py signals),
    not boilerplate."""
    return (
        spans.select("doc_id", F.md5("span").alias("span_md5"))
        .groupBy("span_md5")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    min_docs: int = 2,
    spans: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    **window_kwargs,
) -> DataFrame:
    """Strip boilerplate spans and rebuild each document:
    (doc_id, n_spans, n_boiler_spans, boiler_char_frac, text_clean)
    where ``text_clean`` is the doc's non-boilerplate spans re-joined
    in original order (empty string when everything was boilerplate or
    the doc had no spans).

    ``spans`` defaults to disjoint :func:`token_window_spans`; pass
    :func:`paragraph_spans` output for structured text. NOTE: with
    token windows the rebuild drops the sub-window tail of the
    document (same granularity loss as CCNet's paragraph hashing —
    the unit of removal is the span, by design).
    """
    if spans is None:
        spans = token_window_spans(docs, id_col, text_col, **window_kwargs)
    boiler = boilerplate_spans(spans, min_docs=min_docs).select(
        "span_md5", F.lit(True).alias("is_boiler")
    )
    occ = spans.select(
        "doc_id", "pos", "span",
        F.md5("span").alias("span_md5"), F.length("span").alias("c"),
    )
    flagged = occ.join(boiler, "span_md5", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boiler_spans"),
        F.sum("c").alias("tot_c"),
        F.sum(F.when(F.col("is_boiler"), F.col("c")).otherwise(0)).alias("boiler_c"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_boiler"), F.struct("pos", "span")
                        )
                    )
                ),
                lambda s: s["span"],
            ),
        ).alias("text_clean"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_boiler_spans", F.lit(0)).alias("n_boiler_spans"),
            F.round(
                F.when(
                    F.coalesce("tot_c", F.lit(0)) > 0,
                    F.col("boiler_c") / F.col("tot_c").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("boiler_char_frac"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
