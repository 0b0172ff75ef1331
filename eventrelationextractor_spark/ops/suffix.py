"""Distributed suffix array by prefix doubling (+ BWT).

The suffix array is THE index under ExactSubstr-style dedup (Lee et
al., "Deduplicating Training Data Makes Language Models Better" builds
a corpus-scale SA): ``ops/dedup.py::dup_spans`` finds duplicated spans
by shingle equality; a suffix array generalizes that to ALL repeated
substrings with no fixed k. This module builds one with the classic
prefix-doubling algorithm (Manber-Myers), expressed as DataFrame ops:

round k: rank'[i] = global rank of the pair (rank[i], rank[i+k]),
doubling k until every rank is distinct (<= ceil(log2 n) rounds).

Determinism / engine contract
-----------------------------
All comparisons happen on INTEGER char codes (ascii), never on string
collation; the out-of-range sentinel is -1 (shorter suffix sorts
first, matching byte-wise string comparison for ASCII text). The
result is therefore bit-identical to a direct ``ORDER BY substr(s,
pos)`` suffix sort on any engine for ASCII input — which is exactly
what the DuckDB oracle does (an INDEPENDENT algorithm, not a replay).

Scale shape
-----------
* The text table never concatenates on the driver: per-document char
  explosion gets a GLOBAL offset from a statistic-scale cumsum over
  the (tiny) per-doc length table, broadcast back.
* Per-round global ranks use repartitionByRange(r1, r2) + local
  row_number + partition-count offsets (one tiny action per round) —
  no single-partition window, no RDD zipWithIndex. Partition
  boundaries from range sampling may vary run to run; the OUTPUT rank
  (offset + local rownum over a total order) does not.
* Rounds are O(log n); each is two keyed equi-joins and one
  range-exchange of the (pos, rank) frame. Same fixed-overhead-
  per-round family as boruvka_mst / kg CC (documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_table(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", sep: str = "!") -> DataFrame:
    """(pos, code) rows for the corpus string: documents in ``id_col``
    order, each terminated by ``sep`` (must be a char absent from the
    normalized text). Offsets are distributed — a statistic-scale
    per-doc length cumsum, never a driver-side concat."""
    d = docs.select(F.col(id_col).alias("did"),
                    (F.concat(F.col(text_col), F.lit(sep)))
                    .alias("t"))
    lens = d.select("did", F.length("t").alias("len"))
    w_off = (Window.orderBy("did")
             .rowsBetween(Window.unboundedPreceding, -1))
    offs = lens.withColumn(
        "off", F.coalesce(F.sum("len").over(w_off), F.lit(0)))
    # split("(?!^)") leaves ONE trailing empty element (the lookahead
    # also matches at end-of-string) — drop it before positions are
    # assigned or every doc gains a phantom code-0 char
    arr = F.filter(F.split(F.col("t"), "(?!^)"),
                   lambda c: c != F.lit(""))
    return (d.join(F.broadcast(offs.select("did", "off")), "did")
            .select(F.posexplode(arr).alias("i", "ch"),
                    F.col("off"))
            .select((F.col("off") + F.col("i")).cast("long").alias("pos"),
                    F.ascii("ch").cast("long").alias("code")))


def _global_rank(pairs: DataFrame) -> DataFrame:
    """Dense global rank of DISTINCT (r1, r2) pairs ordered by
    (r1, r2): range-repartition puts the total order into contiguous
    partitions; rank = partition offset + local row_number. One tiny
    action (per-partition counts) per call."""
    dp = pairs.select("r1", "r2").distinct() \
        .repartitionByRange("r1", "r2") \
        .withColumn("pid", F.spark_partition_id())
    cnt = dp.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    w = (Window.orderBy("pid")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = cnt.withColumn("off",
                          F.coalesce(F.sum("c").over(w), F.lit(0)))
    w_loc = Window.partitionBy("pid").orderBy("r1", "r2")
    return (dp.join(F.broadcast(offs.select("pid", "off")), "pid")
            .withColumn("nr", (F.col("off")
                               + F.row_number().over(w_loc))
                        .cast("long"))
            .select("r1", "r2", "nr"))


def suffix_array(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_rounds: int = 20) \
        -> DataFrame:
    """Suffix array + BWT of the corpus string -> (r, pos, bwt_code):
    r = 0-based lexicographic rank of the suffix starting at ``pos``,
    bwt_code = char code at (pos - 1) mod n (the Burrows-Wheeler
    column — the clusterable transform repeated substrings produce).
    See module docstring for the algorithm and scale shape."""
    chars = char_table(docs, id_col, text_col).cache()
    n = chars.count()
    cur = chars.select("pos", F.col("code").alias("r"))
    k = 1
    for _ in range(max_rounds):
        nxt = cur.select((F.col("pos") - k).alias("pos"),
                         F.col("r").alias("r2"))
        pairs = (cur.select("pos", F.col("r").alias("r1"))
                 .join(nxt, "pos", "left_outer")
                 .withColumn("r2", F.coalesce(F.col("r2"), F.lit(-1))))
        ranked = _global_rank(pairs)
        cur = (pairs.join(ranked, ["r1", "r2"])
               .select("pos", F.col("nr").alias("r")))
        cur = cur.localCheckpoint(eager=True)
        k *= 2
        n_distinct = cur.agg(
            F.countDistinct("r").alias("d")).collect()[0].d
        if n_distinct == n:
            break
    bwt = chars.select(((F.col("pos") + 1) % n).alias("pos"),
                       F.col("code").alias("bwt_code"))
    return (cur.join(bwt, "pos")
            .select((F.col("r") - 1).cast("long").alias("r"),
                    F.col("pos").cast("long"), "bwt_code"))
