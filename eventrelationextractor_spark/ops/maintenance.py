"""Table-maintenance / pipeline-hygiene operators: the jobs a 100-TB
lakehouse runs BETWEEN the analytics - small-file compaction planning,
key-skew profiling (the input to salting decisions), and k-anonymity
suppression for derived releases.

All three are single-shuffle window/aggregate shapes with exact SQL
twins, so they ride the same cross-engine hash gate as everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(files: DataFrame, target_bytes: int = 128 * 1024 * 1024,
                    part_col: str = "partition", path_col: str = "path",
                    size_col: str = "size_bytes") -> DataFrame:
    """(partition, path, size_bytes, bin, bin_offset): assign each data
    file to a merge bin of ~``target_bytes`` within its partition -
    the planning half of an OPTIMIZE/rewrite-data-files job (Iceberg's
    binpack strategy plans exactly this shape).

    Bin = cumulative-size-before ``div`` target, over files in path
    order: deterministic, append-stable (new files never move old
    files' bins - same growth property as ops/packing.py layouts), and
    one hash-partitioned window per PARTITION, never a global sort -
    compaction planning parallelizes by partition at any table size.
    A file larger than ``target_bytes`` owns its bin tail (cumsum
    jumps past the boundary), matching binpack's pass-through of
    already-large files."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = Window.partitionBy(part_col).orderBy(path_col)
    cum_before = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    return (files
            .select(F.col(part_col).alias("partition"),
                    F.col(path_col).alias("path"),
                    F.col(size_col).cast("long").alias("size_bytes"))
            .withColumn("bin_offset", cum_before)
            .withColumn("bin",
                        F.expr(f"bin_offset div {int(target_bytes)}")))


def skew_profile(df: DataFrame, key_col: str, n_partitions: int = 200,
                 top_k: int = 20) -> DataFrame:
    """(key, n, share, salt_factor): the ``top_k`` heaviest keys with
    their row share and the salt fan-out a shuffle on this key needs -
    ceil(share * n_partitions), i.e. how many partitions' worth of rows
    the key carries (1 = no salting needed). The measurement that turns
    'AQE will handle skew' into a number, and the direct input to the
    salted-repartition path (spark/stages.py giant-page handling).

    One partial-agged groupBy + a broadcast single-row total + a top-k
    window over KEY CARDINALITY (not rows). Deterministic ordering:
    (n desc, key asc)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")) \
        .agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("key", "n",
                    F.round(F.col("n") / F.col("total"), 6).alias("share"),
                    F.ceil(F.col("n") * n_partitions / F.col("total"))
                    .cast("long").alias("salt_factor"))
            .orderBy(F.col("n").desc(), F.col("key")))


def kanon_suppress(df: DataFrame, quasi_cols: list, k: int = 5) -> DataFrame:
    """k-anonymity suppression gate: rows whose quasi-identifier
    combination occurs fewer than ``k`` times are marked suppressed
    (the release-hygiene step before publishing derived per-group
    statistics - small groups re-identify individuals).

    -> input columns + (group_n, is_suppressed). One window count over
    the quasi-identifier key - the same single-Exchange shape as
    dedup_keep; no second pass, no driver-side group list."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    w = Window.partitionBy(*quasi_cols)
    return (df.withColumn("group_n",
                          F.count(F.lit(1)).over(w).cast("long"))
            .withColumn("is_suppressed", F.col("group_n") < k))
