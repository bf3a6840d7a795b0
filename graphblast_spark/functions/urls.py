"""URL canonicalization + domain-level graph rollup — pure Column exprs.

The web-graph front door that every Common-Crawl-style pipeline needs
before edges mean anything: the same page is crawled as
``HTTP://Example.com:80/a?utm_source=x&b=2&a=1#frag`` and
``http://example.com/a?a=1&b=2`` — without canonicalization the link
graph double-counts vertices and PageRank splits mass across aliases.
No graphblast counterpart (its inputs are pre-built .mtx matrices);
this is the engine-extension layer the north rule's url-keyed corpus
implies.

Everything is a JVM Column expression (regexp + array ops — no UDF, no
shuffle) and deliberately ANSI-replayable so DuckDB oracles replay each
rule bit-for-bit. Canonicalization rules (documented contract):

1. strip the fragment (``#...``);
2. lowercase the scheme and authority (host[:port]) — the PATH stays
   case-sensitive (per RFC 3986 only scheme+host are case-insensitive);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``) and SORT the survivors byte-wise (param order
   is almost never semantic; sorting makes equal-content urls equal);
   an emptied query string loses its ``?``.

NOT attempted (documented non-goals): percent-encoding normalization,
path dot-segment removal, trailing-slash folding — each changes
semantics for some real sites; add per-deployment if crawl policy
guarantees safety.

``url_site`` is the naive eTLD+1 (last two host labels). A real
deployment plugs the Public Suffix List (a ~10k-entry broadcast map —
same plan shape); the naive rule is wrong for ccSLDs like
``example.co.uk`` and says so here rather than pretending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped by rule 4 — the high-signal, vendor-documented set
TRACKING_PARAM_RE = "^(utm_[a-z]*|fbclid|gclid|msclkid|ref)="


def normalize_url(url: Column) -> Column:
    """Canonical url per the module-contract rules 1-4."""
    u = F.regexp_replace(url, "#.*$", "")  # 1. fragment
    # authority prefix = everything through host[:port] (scheme://host)
    prefix = F.regexp_extract(u, "^([^/?]*//[^/?]*)", 1)
    rest = F.substring(u, F.length(prefix) + 1, F.length(u))
    prefix = F.lower(prefix)  # 2. scheme+authority case
    prefix = F.when(
        prefix.startswith("http://"), F.regexp_replace(prefix, ":80$", "")
    ).when(
        prefix.startswith("https://"), F.regexp_replace(prefix, ":443$", "")
    ).otherwise(prefix)  # 3. default ports
    # 4. query cleanup: split off ?query, drop tracking params, sort
    path = F.regexp_replace(rest, "\\?.*$", "")
    query = F.when(rest.contains("?"), F.regexp_replace(rest, "^[^?]*\\?", "")).otherwise(
        F.lit("")
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q2 = F.array_join(params, "&")
    return F.concat(
        prefix, path, F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit(""))
    )


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus scheme, userinfo and port."""
    auth = F.lower(F.regexp_extract(url, "^[^/?]*//([^/?]*)", 1))
    no_user = F.regexp_replace(auth, "^.*@", "")
    return F.regexp_replace(no_user, ":[0-9]+$", "")


def url_site(url: Column) -> Column:
    """Naive eTLD+1: the last two labels of the host (see module
    docstring for the Public-Suffix-List caveat)."""
    h = url_host(url)
    labels = F.split(h, "\\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)),
    ).otherwise(h)


def domain_edges(
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    by: str = "host",
    drop_self: bool = True,
) -> DataFrame:
    """Roll a url-level edge table up to the domain level:
    (src, dst, val=count of url pairs between the domains). ``by`` is
    ``"host"`` (full host) or ``"site"`` (naive eTLD+1). The rollup is
    one map-side-combining groupBy on the domain pair — at web scale
    the output is |domains|²-bounded but in practice tiny next to |E|,
    and the heavy input never re-shuffles on anything else first.

    The (src, dst, val) output feeds ``assign_dense_ids`` (on the
    domain strings) + ``Graph.build`` directly — domain PageRank is
    exactly page PageRank over this table."""
    fn = url_host if by == "host" else url_site
    out = url_pairs.select(
        fn(F.col(src_col)).alias("src_domain"),
        fn(F.col(dst_col)).alias("dst_domain"),
    )
    if drop_self:
        out = out.filter(F.col("src_domain") != F.col("dst_domain"))
    return out.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).cast("double").alias("val")
    )
