"""URL canonicalization for Common-Crawl-style page tables.

Web-scale dedup keys on the URL before it ever hashes content: the
same page is fetched as ``HTTP://WWW.Example.com:80/a//b/?utm_source=
feed&b=2&a=1#top`` and ``http://example.com/a/b?a=1&b=2``, and a
crawl-frontier or exact-URL dedup that misses the equivalence
re-crawls and re-stores everything twice. This is the standard
canonicalization ladder (RFC 3986 §6 syntax-based normalization plus
the crawl-specific conventions Common Crawl / Heritrix apply):

1. strip the fragment,
2. lowercase scheme and host, drop a leading ``www.``,
3. drop the scheme's default port (``:80`` http, ``:443`` https),
4. collapse duplicate slashes in the path, drop a trailing slash
   (except the root path), empty path -> ``/``,
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) and sort the remaining query params byte-wise.

Scale shape: a single narrow projection — regexp extracts plus array
ops, all whole-stage-codegen'd, no shuffle, no UDF. The patterns are
RE2-safe and avoid replacement backreferences, so the identical
ladder is expressible in DuckDB/Trino for cross-engine parity (the
entry query pins it value-for-value).

Inputs that don't parse as absolute ``scheme://...`` URLs pass
through unchanged (a canonicalizer must never invent structure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# applied AFTER the fragment is stripped — a '?' inside a fragment
# ('/page#sec?note=1') is fragment text, not a query string
QUERY_RE = r"\?(.*)"
FRAGMENT_RE = r"#.*"
# (=|$): bare tracking keys ('?fbclid', shared-link '?utm_source')
# are dropped too, not just key=value forms
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonical_host(url: Column) -> Column:
    """Lowercased host with ``www.`` and default port stripped."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(url, HOST_RE, 1)), r"^www\.", ""
    )
    return (
        F.when(
            scheme == "http", F.regexp_replace(hostport, r":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    host = canonical_host(url)

    p0 = F.regexp_replace(
        F.regexp_extract(url, PATH_RE, 1), r"/{2,}", "/"
    )
    # trailing-slash strip without a replacement backreference
    p1 = F.when(
        (F.length(p0) > 1) & p0.endswith("/"),
        F.substring(p0, 1, F.length(p0) - 1),
    ).otherwise(p0)
    path = F.when(p1 == "", F.lit("/")).otherwise(p1)

    nofrag = F.regexp_replace(url, FRAGMENT_RE, "")
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(nofrag, QUERY_RE, 1), "&"),
            lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_RE),
        )
    )
    q = F.array_join(params, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, url_canon, url_host)`` — the canonical form and its
    host, ready to be an exact-dedup / frontier key."""
    u = F.col(url_col)
    return df.select(
        id_col,
        canonical_url(u).alias("url_canon"),
        canonical_host(u).alias("url_host"),
    )
