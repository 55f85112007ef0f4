"""URL canonicalization and domain extraction — the crawl pipeline's
keying primitives.

Exact URL dedup, per-site quotas, and domain blocklists all key on a
CANONICAL url/domain: ``HTTP://WWW.Example.COM:80/p?utm_source=x#top``
and ``http://www.example.com/p`` are the same resource but distinct
strings.  Everything here is pure JVM expression work (regexp + array
ops — no Python, no UDF), composable inside any scan, and each step has
an exact DuckDB twin (see ``txt_url_filter``).

Canonicalization steps, in order:

1. drop the fragment (``#...`` never reaches the server);
2. lowercase the scheme+authority prefix (host names are
   case-insensitive; paths are NOT touched — they are case-sensitive);
3. strip default ports (``http://…:80``, ``https://…:443``);
4. drop tracking query parameters (``utm_*`` et al.) and a then-empty
   ``?``.

``registrable_domain`` groups hosts the way crawl policies do — by the
domain one can register, not the subdomain: ``news.bbc.co.uk`` →
``bbc.co.uk``, ``cdn.example.com`` → ``example.com``.  The multi-label
public suffixes are a small embedded subset of the Public Suffix List
(the full PSL is a data file, injectable via ``extra_suffixes``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import local_df

#: multi-label public suffixes recognized by default (PSL subset —
#: enough for the common ccTLD second-level registries)
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "net.br", "org.br",
    "co.in", "co.nz", "co.za", "com.cn", "com.mx", "com.tr",
)

#: tracking-parameter prefixes dropped by normalize_url
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "mc_cid", "mc_eid")

_AUTHORITY_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def normalize_url(url: Column) -> Column:
    """Canonical URL (steps above).  NULL in → NULL out."""
    u = F.regexp_replace(url, r"#.*$", "")  # 1. fragment
    prefix = F.regexp_extract(u, _AUTHORITY_RE, 1)
    rest = F.substr(u, F.length(prefix) + 1)
    low = F.lower(prefix)  # 2. scheme+authority lowercase
    low = F.when(  # 3. default ports
        low.startswith("http://") & low.endswith(":80"),
        F.substr(low, F.lit(1), F.length(low) - 3),
    ).when(
        low.startswith("https://") & low.endswith(":443"),
        F.substr(low, F.lit(1), F.length(low) - 4),
    ).otherwise(low)
    # 4. tracking params: split path?query, rebuild the query without them
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&"), lambda p: ~_any_prefix(p))
    clean_q = F.array_join(kept, "&")
    tail = F.when(clean_q == "", path).otherwise(
        F.concat(path, F.lit("?"), clean_q)
    )
    return F.when(url.isNull(), F.lit(None)).otherwise(F.concat(low, tail))


def _any_prefix(p: Column) -> Column:
    out = p.startswith(TRACKING_PREFIXES[0])
    for pre in TRACKING_PREFIXES[1:]:
        out = out | p.startswith(pre)
    return out


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no userinfo) of a URL."""
    auth = F.lower(F.regexp_extract(url, _AUTHORITY_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(auth, r"^[a-z][a-z0-9+.\-]*://", ""),
        r"^[^@]*@", "",
    )
    return F.nullif(F.regexp_replace(host, r":\d+$", ""), F.lit(""))


def registrable_domain(
    url: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable domain of a URL's host (PSL-subset heuristic): the
    last TWO labels, or the last THREE when the two-label tail is a
    known multi-label public suffix."""
    host = url_host(url)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    suffixes = tuple(MULTI_LABEL_SUFFIXES) + tuple(extra_suffixes)
    is_multi = two.isin(*suffixes) & (three != "")
    return F.when(host.isNull(), F.lit(None)).otherwise(
        F.nullif(F.when(is_multi, three).otherwise(two), F.lit(""))
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | list[str],
    domain_col: str = "__domain",
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted.

    ``blocked``: a 1-column DataFrame of domains or a plain list.  The
    blocklist broadcasts (it is policy-sized, not corpus-sized) and the
    corpus side stays a map-only anti probe — no corpus shuffle."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        blocked = local_df(
            spark, [(d.lower(),) for d in blocked], f"{domain_col} string"
        )
    else:
        blocked = blocked.toDF(domain_col)
    tagged = df.withColumn(
        domain_col, registrable_domain(F.col(url_col))
    )
    return tagged.join(
        F.broadcast(blocked), domain_col, "left_anti"
    ).drop(domain_col)


__all__ = [
    "normalize_url",
    "url_host",
    "registrable_domain",
    "filter_blocked_domains",
    "MULTI_LABEL_SUFFIXES",
    "TRACKING_PREFIXES",
]
