"""URL canonicalization and domain analytics for web-scale corpora.

A crawl-derived training corpus carries a URL per document; the
pipeline needs (a) a canonical form so URL-level dedup is exact-match
(strip tracking params, fragments, default ports, case noise), and
(b) host/domain extraction so per-domain quotas, blocklists, and
mixing weights have a key to group on.

Everything here is a pure Catalyst projection — regexp_extract /
regexp_replace / lower chains, zero UDFs, zero shuffles — so URL
normalization of 100 TB is a map-only pass that pipelines into
whatever scan feeds it.  The regexes avoid lookarounds so the same
patterns run identically on Spark (Java regex) and the DuckDB oracle
(RE2).

The reference has no URL surface (it ingests CSV invoices); this is
part of the engine's native LLM-data additions (brief: "operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numerics import pround

# params dropped during canonicalization: click/campaign trackers that
# change the URL string but never the content behind it.  The leading
# separator is CAPTURED and kept (not consumed) so `pref=1` never
# half-matches as `ref=1`, and consecutive tracking params strip in one
# left-to-right pass
_TRACKING = r"([?&])(utm_[a-z]+|fbclid|gclid|ref|mc_cid|mc_eid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as a Column expression.

    Steps (each a regexp the DuckDB twin mirrors 1:1):
      1. drop the #fragment
      2. drop tracking query params (utm_*, fbclid, gclid, ref, ...)
      3. collapse the separator debris that leaves (``?&`` -> ``?``,
         ``&&`` -> ``&``, trailing query-region ``?``/``&`` runs — a
         trailing ``&`` with no ``?`` before it is path content, kept)
      4. lowercase scheme://host (path/query case is significant, host
         case is not) and strip a leading ``www.``
      5. strip default ports ``:80``/``:443``
      6. strip one trailing slash from a non-root path
    """
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, _TRACKING, r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    # trailing separator debris is QUERY debris only: a '&' ending a
    # path with no '?' anywhere is a legal path character, and stripping
    # it breaks idempotence ('/&/' -> '/&' -> '/', found by hypothesis).
    # So: drop a trailing [?&]+ run only when a '?' precedes it, then a
    # bare trailing '?+' (empty query).
    u = F.regexp_replace(u, r"(\?[^#]*?)[?&]+$", r"$1")
    u = F.regexp_replace(u, r"\?+$", "")
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    head = F.regexp_replace(head, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    head = F.regexp_replace(head, r":(80|443)$", "")
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # strip trailing slash runs from the PATH only ([^?#]): the old
    # `/.+?` could eat a slash inside the query ('/?/' -> '/?'),
    # exposing a trailing '?' that only the NEXT pass would strip —
    # an idempotence break found by hypothesis (r10)
    tail = F.regexp_replace(tail, r"^(/[^?#]+?)/+(\?|$)", r"$1$2")
    return F.concat(head, tail)


def host_of(canon: Column) -> Column:
    """Host part of an already-canonical URL (lowercased, no port)."""
    return F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)


def registered_domain(host: Column) -> Column:
    """Last-two-labels registrable domain (``a.b.example.com`` ->
    ``example.com``).  A public-suffix-list lookup (for ``.co.uk``
    etc.) slots in as a broadcast join against the PSL table; the
    two-label heuristic keeps this shuffle-free and is exact for
    generic TLDs."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonicalize and decompose a URL column.

    Adds: ``url_canonical``, ``host``, ``domain``, ``path``,
    ``path_depth``, ``n_query_params``.  Pure projection — at 100 TB
    this fuses into the reading stage's WholeStageCodegen span.
    """
    canon = canonical_url(F.col(url_col))
    out = df.withColumn("url_canonical", canon)
    host = host_of(F.col("url_canonical"))
    path = F.regexp_extract(F.col("url_canonical"), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(F.col("url_canonical"), r"\?([^#]*)$", 1)
    return (
        out.withColumn("host", host)
        .withColumn("domain", registered_domain(F.col("host")))
        .withColumn("path", path)
        .withColumn(
            "path_depth",
            F.when(F.col("path").isin("", "/"), F.lit(0)).otherwise(
                F.size(F.split(F.regexp_replace("path", r"^/|/$", ""), "/"))
            ),
        )
        .withColumn(
            "n_query_params",
            F.when(query == "", F.lit(0)).otherwise(F.size(F.split(query, "&"))),
        )
    )


def domain_stats(parsed: DataFrame) -> DataFrame:
    """Per-registered-domain corpus stats: page count, distinct hosts,
    mean path depth — the grouping key for per-domain quotas and
    blocklist joins.  One hash-partial-aggregated shuffle on
    ``domain``; hot domains (every crawl has a head) stay bounded
    because the partial aggregate collapses them map-side."""
    return parsed.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        pround(F.avg(F.col("path_depth").cast("double")), 6).alias("mean_path_depth"),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL-level deduplication: one survivor (min id) per CANONICAL
    url.  Crawls re-fetch the same page under tracking-param/case/
    fragment variants; canonicalizing before the groupBy is what makes
    url-dedup exact-match — the cheap first dedup stage that runs
    before any content hashing.

    Scale: canonicalization is a shuffle-free projection; the dedup
    itself is one hash aggregation on the canonical string.
    """
    canon = canonical_url(F.col(url_col))
    keep = (
        df.select(F.col(id_col), canon.alias("_cu"))
        .groupBy("_cu")
        .agg(F.min(id_col).alias(id_col))
        .drop("_cu")
    )
    return df.join(keep, id_col, "left_semi")
