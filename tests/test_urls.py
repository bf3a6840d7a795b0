"""URL canonicalization + domain rollup (functions/urls.py) — hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphblast_spark.functions.urls import (
    domain_edges,
    normalize_url,
    url_host,
    url_site,
)


@pytest.mark.parametrize(
    "raw,expect",
    [
        # fragment stripped, scheme+host lowercased, path case KEPT
        ("HTTP://Example.COM/Path/X#frag", "http://example.com/Path/X"),
        # default ports dropped, per scheme
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://example.com:80/a", "https://example.com:80/a"),  # NOT https default
        # tracking params dropped, survivors sorted, '?' dropped when emptied
        ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
        ("http://e.com/p?utm_campaign=z&fbclid=1&gclid=2", "http://e.com/p"),
        ("http://e.com/p?z=1&y=2&ref=home", "http://e.com/p?y=2&z=1"),
        # no scheme: passthrough of the path rules only
        ("example.com/a?b=2&a=1", "example.com/a?a=1&b=2"),
        # idempotence on an already-canonical url
        ("http://e.com/p?a=1", "http://e.com/p?a=1"),
    ],
)
def test_normalize_url_rules(spark, raw, expect):
    got = spark.range(1).select(normalize_url(F.lit(raw)).alias("u")).first()["u"]
    assert got == expect


def test_normalize_is_idempotent_on_corpus_urls(spark):
    from graphblast_spark.sources.corpus import generate_pages

    urls = generate_pages(spark, 50, seed=1).select("url")
    once = urls.select(normalize_url(F.col("url")).alias("u"))
    twice = once.select(normalize_url(F.col("u")).alias("u"))
    assert sorted(r["u"] for r in once.collect()) == sorted(r["u"] for r in twice.collect())


@pytest.mark.parametrize(
    "raw,host,site",
    [
        ("https://User:pw@Sub.Shop.Example.co:8443/x?q=1", "sub.shop.example.co", "example.co"),
        ("http://localhost/x", "localhost", "localhost"),
        ("https://a.b.c.d.example.com/", "a.b.c.d.example.com", "example.com"),
    ],
)
def test_url_host_and_site(spark, raw, host, site):
    row = spark.range(1).select(
        url_host(F.lit(raw)).alias("h"), url_site(F.lit(raw)).alias("s")
    ).first()
    assert (row["h"], row["s"]) == (host, site)


def test_domain_edges_rollup(spark):
    pairs = spark.createDataFrame(
        [
            ("http://A.one.com/1", "http://b.two.com/x"),
            ("http://a.one.com/2", "http://B.two.com:80/y"),   # same domains
            ("http://a.one.com/3", "http://c.one.com/z"),
            ("http://a.one.com/4", "http://a.one.com/self"),   # self-loop dropped
        ],
        "src_url string, dst_url string",
    )
    by_host = {
        (r["src_domain"], r["dst_domain"]): r["val"] for r in domain_edges(pairs).collect()
    }
    assert by_host == {
        ("a.one.com", "b.two.com"): 2.0,
        ("a.one.com", "c.one.com"): 1.0,
    }
    by_site = {
        (r["src_domain"], r["dst_domain"]): r["val"]
        for r in domain_edges(pairs, by="site").collect()
    }
    # at eTLD+1 granularity one.com→one.com becomes a self-loop and drops
    assert by_site == {("one.com", "two.com"): 2.0}


def test_domain_pagerank_composition(spark):
    """domain_edges output feeds the standard id-assign → Graph.build →
    pagerank chain unchanged — domain PageRank is page PageRank over
    the rolled-up table."""
    from graphblast_spark.algorithms import pagerank
    from graphblast_spark.matrix import Graph
    from graphblast_spark.sources.distill import assign_dense_ids

    pairs = spark.createDataFrame(
        [(f"http://h{i % 5}.ex.com/{i}", f"http://h{(i + 1) % 5}.ex.com/{i}", )
         for i in range(40)],
        "src_url string, dst_url string",
    )
    de = domain_edges(pairs)
    doms = de.select(F.col("src_domain").alias("url")).unionByName(
        de.select(F.col("dst_domain").alias("url"))
    )
    id_map = assign_dense_ids(doms)
    src_m = id_map.select(F.col("url").alias("src_domain"), F.col("id").alias("src"))
    dst_m = id_map.select(F.col("url").alias("dst_domain"), F.col("id").alias("dst"))
    edges = de.join(src_m, "src_domain").join(dst_m, "dst_domain").select("src", "dst", "val")
    g = Graph.build(edges, vertices=id_map.select("id"))
    ranks = pagerank(g, fixed_iters=5).collect()
    assert len(ranks) == 5  # 5 domains
    assert abs(sum(r["val"] for r in ranks) - 1.0) < 1e-9  # ring graph: no dangling leak
    g.unpersist()
