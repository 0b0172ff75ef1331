"""Isolation forest (Liu, Ting & Zhou 2008), level-synchronous and
fully relational: the unsupervised anomaly model one tier above the
z-score/MAD/CUSUM detectors - it isolates points by random axis-aligned
splits, and anomalies are the points that isolate EARLY (short average
path length).

The classic formulation grows trees point-at-a-time; at corpus scale
the right shape is LEVEL-synchronous: all nodes of all trees at depth L
are computed in ONE partial-aggregated groupBy (per-node feature
min/max), the split feature and threshold derive from md5(seed, tree,
node) - so the whole forest is a deterministic pure function of the
data and seed, replayable by the SQL oracle as one chained CTE per
level - and the assignment frame SHRINKS as nodes freeze (singleton or
constant-valued nodes stop splitting). No sampling, no Python UDF, no
per-tree driver loop: depth iterations only.

Scoring: sum of isolation depths over trees (exact integer - smaller =
more anomalous). The textbook 2^(-E[h]/c(n)) normalization is a
monotone transform of the same ordering; kept integer so the ranking
rides the cross-engine hash gate."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

U32 = 4294967296.0


def _u32(seed: str, purpose: str):
    return F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(seed), F.col("tree"), F.col("node"),
        F.lit(purpose))), 1, 8), 16, 10).cast("long")


def isolation_scores(df: DataFrame, id_col: str, feature_cols: list,
                     n_trees: int = 8, max_depth: int = 6,
                     seed: str = "if", k: int = 20) -> DataFrame:
    """-> the ``k`` most anomalous rows: (id, sum_depth, rank).
    sum_depth = total isolation depth over ``n_trees`` trees (ties
    break on id). Split rule per (tree, node): feature =
    u32(md5 'f') mod n_features, threshold = mn + (mx - mn) *
    (u32(md5 't') / 2^32) over THAT node's extent; a point goes left
    when x < thr. Nodes freeze when they hold <= 1 point or the chosen
    feature is constant."""
    nf = len(feature_cols)
    xs = [F.col(c).cast("long").alias(f"x{i}")
          for i, c in enumerate(feature_cols)]
    a = (df.select(F.col(id_col).alias("pid"), *xs)
         .select("*", F.explode(F.sequence(
             F.lit(0), F.lit(int(n_trees) - 1))).alias("tree"))
         .withColumn("node", F.lit(1).cast("long"))
         .localCheckpoint())
    spark = df.sparkSession
    done = spark.createDataFrame([], "pid long, tree long, depth long")
    fi_pick = _u32(seed, "f") % nf
    u_t = _u32(seed, "t") / F.lit(U32)
    for lvl in range(int(max_depth)):
        aggs = [F.count(F.lit(1)).alias("cnt")]
        for i in range(nf):
            aggs += [F.min(f"x{i}").alias(f"mn{i}"),
                     F.max(f"x{i}").alias(f"mx{i}")]
        b = a.groupBy("tree", "node").agg(*aggs)
        mn = F.col("mn0")
        mx = F.col("mx0")
        for i in range(1, nf):
            mn = F.when(F.col("fi") == i, F.col(f"mn{i}")).otherwise(mn)
            mx = F.when(F.col("fi") == i, F.col(f"mx{i}")).otherwise(mx)
        c = (b.withColumn("fi", fi_pick)
             .withColumn("mn", mn).withColumn("mx", mx)
             .withColumn("thr", F.col("mn")
                         + (F.col("mx") - F.col("mn")) * u_t)
             .withColumn("frozen", (F.col("cnt") <= 1)
                         | (F.col("mn") == F.col("mx"))))
        a2 = a.join(c.select("tree", "node", "fi", "thr", "frozen"),
                    ["tree", "node"])
        done = (done.unionByName(
            a2.filter("frozen").select(
                "pid", "tree", F.lit(lvl).cast("long").alias("depth")))
            .localCheckpoint(eager=False))
        xsel = F.col("x0")
        for i in range(1, nf):
            xsel = F.when(F.col("fi") == i, F.col(f"x{i}")) \
                .otherwise(xsel)
        a = (a2.filter(~F.col("frozen"))
             .withColumn("node", F.col("node") * 2
                         + (xsel >= F.col("thr")).cast("long"))
             .drop("fi", "thr", "frozen")
             .localCheckpoint(eager=False))
    done = done.unionByName(
        a.select("pid", "tree",
                 F.lit(int(max_depth)).cast("long").alias("depth")))
    scores = done.groupBy("pid").agg(
        F.sum("depth").cast("long").alias("sum_depth"))
    w = Window.orderBy(F.col("sum_depth").asc(), F.col("pid"))
    return (scores.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .filter(F.col("rank") <= int(k))
            .select(F.col("pid").alias(id_col), "sum_depth", "rank"))
