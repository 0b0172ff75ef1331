"""URL operators for Common-Crawl-style page tables: parse + per-domain
rollups. Pure built-in-expression columns (regexp inside codegen, no
Python), so they ride the page scan for free; the rollup is one
map-side-combinable aggregation keyed on the registrable domain - the
natural partitioning key for crawl processing (politeness, per-site
quality, dedup scoping all group by it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_RE = r"^[a-z]+://([^/]+)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"
TLD_RE = r"\.([^.]+)$"


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, registrable-ish domain (last two labels; a production
    run substitutes the public-suffix list), tld, and path_depth."""
    u = F.col(url_col)
    host = F.regexp_extract(u, HOST_RE, 1)
    path = F.regexp_replace(u, HOST_RE.replace("(", "(?:"), "")
    return (df
            .withColumn("host", host)
            .withColumn("domain", F.regexp_extract(host, DOMAIN_RE, 1))
            .withColumn("tld", F.regexp_extract(host, TLD_RE, 1))
            .withColumn("path_depth",
                        F.size(F.split(F.regexp_replace(path, r"^/+|/+$",
                                                        ""), "/"))
                        .cast("long")))


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str | None = "text") -> DataFrame:
    """Per-domain rollup: (domain, n_docs, n_hosts, max_path_depth
    [, total_chars]) - the pre-pass a crawl pipeline runs for per-site
    quality, crawl-budget, and skew decisions."""
    parsed = parse_urls(df, url_col)
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.max("path_depth").alias("max_path_depth")]
    if text_col and text_col in df.columns:
        aggs.append(F.sum(F.length(text_col)).alias("total_chars"))
    return parsed.groupBy("domain").agg(*aggs)
