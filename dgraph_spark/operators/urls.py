"""URL canonicalization for crawl-scale URL-level dedup — pure column
expressions (whole-stage codegen, no Python in the hot path; the only
HOF is one array filter+sort over query params).

Canonical form (documented, deterministic):
  1. fragment (#...) removed
  2. scheme and host[:port] lowercased (path/query case preserved)
  3. default port stripped (http:80, https:443)
  4. tracking params dropped (utm_*, fbclid, gclid, msclkid),
     remaining query params sorted bytewise, rejoined with '&'
     (an empty cleaned query drops the '?')
  5. empty path becomes '/'
Strings without a scheme://host prefix pass through unchanged.
Trailing-slash folding and IDN/percent-encoding normalization are
intentionally out of scope (canonicalization specs disagree; document
the contract instead of guessing).

At 100 TB: url-level dedup is one hash-partitioned shuffle on the
canonical string; this expression keeps the normalization inside
codegen so the shuffle is the only cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = "^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"


def canonical_url(url) -> Column:
    """Column expression producing the canonical form of ``url``."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.split(u, "#", 2).getItem(0)
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    pathquery = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.split(pathquery, r"\?", 2).getItem(0)
    query = (F.when(pathquery.contains("?"),
                    F.regexp_replace(pathquery, r"^[^?]*\?", ""))
             .otherwise(F.lit("")))
    params = F.array_join(
        F.array_sort(F.filter(
            F.split(query, "&"),
            lambda p: ~p.rlike(_TRACKING) & (p != ""))), "&")
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(params == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), params)))
    return F.when(scheme != "", canon).otherwise(u)


def with_canonical_url(df: DataFrame, url_col: str,
                       out_col: str = "canonical_url") -> DataFrame:
    """df + canonical form of ``url_col`` (see canonical_url docs)."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, url_col: str) -> DataFrame:
    """Keep one row per canonical URL (min original url as the
    representative for determinism): the crawl-side URL-level dedup
    pass — one window over the canonical key, no driver round-trips."""
    from pyspark.sql import Window

    canon = with_canonical_url(df, url_col)
    w = Window.partitionBy("canonical_url").orderBy(F.col(url_col))
    return (canon.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
