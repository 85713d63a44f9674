"""Web-crawl curation operators: URL canonicalization and per-domain
quota sampling.

Crawl-derived training corpora are keyed by URL, and raw URLs are
noisy: scheme/host case, default ports, duplicate slashes, trailing
slashes, tracking query parameters (utm_*, fbclid, gclid, ref) and
fragments all produce distinct strings for the same resource, so
exact-URL dedup undercounts duplicates badly. Canonicalize FIRST,
then dedup/aggregate on the canonical form (reference parity: the
reference's filter-normalization pass P2 — request_tools.py:41 — does
the same trick for request hashing: normalize before hashing so
equivalent spellings collide).

Domain capping is the other standard crawl-curation move: a handful
of hosts dominate any crawl, and uncapped sampling lets them dominate
the training mixture. ``domain_caps`` keeps at most ``cap`` documents
per registered domain, chosen by a deterministic per-document hash
rank so the selection is reproducible and partition-independent.

Scale notes:
- ``normalize_urls`` is a pure Column projection (regexp + array
  higher-order functions, all JVM codegen): no shuffle, no UDF.
- ``domain_caps`` is one window partitioned BY DOMAIN (the natural
  shuffle key; skewed mega-domains are exactly the ones being capped,
  and the rank window short-circuits at ``cap`` per partition after
  the top-``cap`` rows — for extreme skew, pre-filter with an
  approximate per-domain count and a two-phase top-k; the plain
  window is the correct default) plus one hash agg for the report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that never identify content: analytics/click
# trackers. Prefix match for utm_*, exact match for the rest.
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# the query starts at the first '?' that PRECEDES any '#': anchored
# scan over non-?/# chars first, else an unanchored \? would match a
# '?' inside the fragment and promote fragment content into the
# canonical query ('/p#frag?x=1' must canonicalize to '/p', not
# '/p?x=1' — the fragment is always dropped)
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _is_tracking(param: Column) -> Column:
    """True when the ``k=v`` query-param string is a tracker."""
    key = F.substring_index(param, "=", 1)
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | key.startswith(p)
    for k in TRACKING_EXACT:
        cond = cond | (key == k)
    return cond


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``scheme``, ``host``, ``path``, ``query`` and ``canonical``
    columns for ``url_col``, plus ``domain`` (registered domain = last
    two host labels).

    Normalization rules (RFC 3986 §6 normalizations plus the standard
    crawler extras):
    - scheme and host lowercased; userinfo dropped; default ports
      stripped (``:80`` for http, ``:443`` for https);
    - path: runs of ``/`` collapsed, trailing ``/`` stripped (except
      the root path, which becomes ``/`` and empty paths likewise);
    - query: tracking params removed, survivors sorted bytewise and
      re-joined with ``&``; empty result drops the ``?``;
    - fragment always dropped.

    Pure Column expressions (regexp_extract / filter / array_sort):
    whole-stage codegen, no shuffle, no Python.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    authority = F.lower(F.regexp_extract(url, _AUTHORITY_RE, 1))
    # drop userinfo (everything through the last '@')
    hostport = F.substring_index(authority, "@", -1)
    host_raw = F.substring_index(hostport, ":", 1)
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    host = F.when(keep_port, F.concat(host_raw, F.lit(":"), port)).otherwise(
        host_raw
    )
    path_raw = F.regexp_extract(url, _PATH_RE, 1)
    path_collapsed = F.regexp_replace(path_raw, "/{2,}", "/")
    path = F.when(
        (F.length(path_collapsed) > 1) & path_collapsed.endswith("/"),
        path_collapsed.substr(F.lit(1), F.length(path_collapsed) - 1),
    ).otherwise(
        F.when(path_collapsed == "", F.lit("/")).otherwise(path_collapsed)
    )
    qraw = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.when(qraw == "", F.array().cast("array<string>")).otherwise(
            F.split(qraw, "&")
        ),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    query = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    domain = F.when(
        host_raw.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(host_raw, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host_raw)
    return df.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        query.alias("query"),
        canonical.alias("canonical"),
        domain.alias("domain"),
    )


def domain_caps(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, selected by ascending
    md5(id) (deterministic, partition-independent — the same documents
    survive on any cluster), and report per-domain totals:
    → (domain, n_total, n_kept) plus the surviving ids as a sorted
    array (bounded by ``cap``).

    One window over the domain partitioning + one agg.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("_id").cast("string")), F.col("_id")
    )
    ranked = df.select(
        F.col(domain_col).alias("domain"), F.col(id_col).alias("_id")
    ).withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("_rk") <= cap, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_rk") <= cap, F.col("_id"))
                )
            ).alias("kept_ids"),
        )
        .select(
            "domain",
            "n_total",
            "n_kept",
            F.array_join(
                F.transform(
                    F.col("kept_ids"), lambda x: x.cast("string")
                ),
                ",",
            ).alias("kept_ids"),
        )
    )
