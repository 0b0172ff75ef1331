"""Z-order (Morton) data layout - the lakehouse file-skipping
primitive (Delta OPTIMIZE ZORDER BY / Iceberg sort-order z-ordering):
interleave the bits of two dimension columns so that range-partitioning
on the combined key yields files whose min/max envelopes are TIGHT IN
BOTH dimensions. A linear sort gives perfect pruning on its leading
column and none on the second; z-order trades a little of the first
for bounded spans in each - the difference between scanning 1/k of the
files and scanning all of them when the filter is on the second column.

No Iceberg jars ship in this sandbox (re-verified round 3), so the
write path stays parquet: ``repartitionByRange`` on the morton key +
``sortWithinPartitions`` reproduces the physical layout, and
``zorder_layout_stats`` measures the envelope tightness the skipping
depends on. On Iceberg the same key feeds a sort order.

Everything here is pure whole-stage-codegen bit arithmetic - no UDF,
no shuffle in the key itself; the layout stats add one percentile
aggregate + one partial-agged groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Bit-interleaved Morton code of two non-negative integer columns
    (low ``bits`` bits of each; x takes the even result bits, y the
    odd). 2*bits <= 62 keeps the key in a signed long. Pure codegen:
    a sum of shift-and-mask terms, engine-replayable exactly."""
    if 2 * bits > 62:
        raise ValueError("2*bits must fit a signed long")
    xs = x.cast("long")
    ys = y.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (out
               + F.shiftleft(F.shiftright(xs, i) % 2, 2 * i)
               + F.shiftleft(F.shiftright(ys, i) % 2, 2 * i + 1))
    return out


def zorder_layout_stats(df: DataFrame, x_col: str, y_col: str,
                        n_files: int = 16, bits: int = 16,
                        approx: bool = False) -> DataFrame:
    """(file, n_rows, min_x, max_x, min_y, max_y): the per-file
    dimension envelopes a z-ordered range-partitioned layout would
    produce - exactly what parquet footer / Iceberg manifest pruning
    consults. File assignment replays repartitionByRange's semantics
    engine-replayably: boundaries = the (i/n_files)-quantiles of the
    morton key, file = 1 + #boundaries strictly below the key (the
    ccnet_buckets threshold pattern). Exact ``percentile`` is the
    oracled branch; ``approx=True`` swaps in ``percentile_approx``
    (GK sketch, mergeable, bounded memory) for corpus scale - identical
    schema, boundary rows may shift one file by the sketch's rank
    epsilon."""
    keyed = df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                      morton_key(F.col(x_col), F.col(y_col), bits)
                      .alias("zkey"))
    qs = "array(" + ", ".join(repr(i / n_files)
                              for i in range(1, n_files)) + ")"
    fn = "percentile_approx" if approx else "percentile"
    acc = ", 10000" if approx else ""
    bounds = keyed.agg(
        F.expr(f"{fn}(zkey, {qs}{acc})").alias("bs"))
    filed = (keyed.crossJoin(F.broadcast(bounds))
             .select("x", "y",
                     (F.lit(1) + F.aggregate(
                         "bs", F.lit(0),
                         lambda a, b: a + F.when(b < F.col("zkey"), 1)
                         .otherwise(0))).alias("file")))
    return (filed.groupBy("file")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y")))
