"""Shared pair-generation shape for "items co-occurring under a key":
the degree-capped sorted-list pair explode used by graph.cocitation
(pages co-cited by a source) and dedup.winnowing_pairs (docs sharing a
fingerprint). One home so the skew discipline - cap BEFORE any pair is
materialized - is written once."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_pair_counts(df: DataFrame, key_col: str, id_col: str,
                    max_df: int = 100) -> DataFrame:
    """(key, id) rows -> (a, b, n_common): distinct (a < b) id pairs
    with the count of keys they co-occur under. Keys held by fewer than
    2 or more than ``max_df`` ids are dropped before the (sorted,
    bounded) per-key pair explode; one partial-agged groupBy counts."""
    e = df.select(F.col(key_col).alias("kk"),
                  F.col(id_col).alias("ii")).distinct()
    deg = (e.groupBy("kk").agg(F.count(F.lit(1)).alias("dn"))
           .filter((F.col("dn") >= 2) & (F.col("dn") <= max_df)))
    groups = (e.join(deg.select("kk"), "kk")
              .groupBy("kk")
              .agg(F.sort_array(F.collect_list("ii")).alias("ids")))
    pairs = groups.select(F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x as a, y as b))))"
    )).alias("p")).select("p.a", "p.b")
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_common"))
