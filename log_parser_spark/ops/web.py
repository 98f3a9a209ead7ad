"""Web-URL operators for crawl-scale pipelines: component extraction
and canonicalization, all pure codegen (regexp_extract + string
builtins) so the hot path never leaves the JVM.

Canonicalization contract (documented, mirrored 1:1 by the DuckDB
oracle SQL):
  - scheme and host lowercased
  - default ports stripped (http:80, https:443); other ports kept
  - empty path -> "/"
  - fragment dropped
  - empty query ("...?") dropped; non-empty query kept VERBATIM by
    default (param re-ordering is a lossy choice crawls usually avoid);
    pass sort_query=True for the common crawl-dedup variant that sorts
    query params lexicographically ("?b=2&a=1" == "?a=1&b=2")
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one regex, five capture groups: scheme, host, port, path, query
# (fragment intentionally non-captured — it is dropped)
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _part(url: Column, idx: int) -> Column:
    return F.regexp_extract(url, _URL_RE, idx)


def url_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """scheme/host/port/path/query columns + path_depth."""
    u = F.col(url_col)
    path = _part(u, 4)
    return df.withColumns({
        "scheme": F.lower(_part(u, 1)),
        "host": F.lower(_part(u, 2)),
        "port": F.nullif(_part(u, 3), F.lit("")).cast("int"),
        "path": F.when(path == "", "/").otherwise(path),
        "query": F.nullif(_part(u, 5), F.lit("")),
        "path_depth": F.size(F.filter(
            F.split(path, "/"), lambda x: x != "")).cast("int"),
    })


def canonical_url_col(url: str | Column = "url",
                      sort_query: bool = False) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(_part(u, 1))
    host = F.lower(_part(u, 2))
    port = _part(u, 3)
    path = _part(u, 4)
    query = _part(u, 5)
    if sort_query:
        query = F.when(query == "", "").otherwise(
            F.array_join(F.array_sort(F.split(query, "&")), "&"))
    default_port = ((scheme == "http") & (port == "80")) | \
        ((scheme == "https") & (port == "443"))
    port_part = F.when((port == "") | default_port, "") \
        .otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "", "/").otherwise(path)
    query_part = F.when(query == "", "").otherwise(
        F.concat(F.lit("?"), query))
    return F.when(
        _part(u, 2) == "", u  # not a parseable absolute URL: keep as-is
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part,
                         path_part, query_part))


def url_dedup(df: DataFrame, url_col: str = "url",
              sort_query: bool = False) -> DataFrame:
    """Crawl URL dedup: one row per canonical URL with the
    representative (min raw url) and the variant count — the same
    hash-groupBy shape as ops.dedup.exact_dedup, keyed on the
    canonical form instead of a content hash."""
    return (df.select(canonical_url_col(url_col, sort_query)
                      .alias("canonical_url"), F.col(url_col))
            .groupBy("canonical_url")
            .agg(F.min(url_col).alias("representative"),
                 F.count("*").alias("n_variants")))
