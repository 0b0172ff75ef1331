"""SymSpell-style spelling correction (Garbe's symmetric-delete
algorithm): instead of probing every edit of a query term against the
dictionary (26*L+... candidates per term), BOTH sides publish only
their single-character DELETES - a term of length L emits L+1 keys -
and edit-distance-1 matches are exactly the key collisions. Candidate
generation becomes one equi-join, the shape that distributes: no
per-row trie, no cross product, and the verify step (a real
levenshtein) runs only on collided pairs.

The corpus-pipeline use: normalizing the OOV tail (typos, OCR noise)
onto the head vocabulary before token counting / dedup shingling, so
near-identical documents differing by typos still collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_delete_keys(df: DataFrame, term_col: str,
                      out_col: str = "key") -> DataFrame:
    """Explode each term into itself + its length single-char deletes.
    Pure codegen (transform over sequence + explode), all map-side."""
    dels = F.expr(
        f"transform(sequence(1, length({term_col})), "
        f"i -> concat(substr({term_col}, 1, i - 1), "
        f"substr({term_col}, i + 1)))")
    return df.select(
        "*", F.explode(F.array_union(F.array(F.col(term_col)), dels))
        .alias(out_col))


def symspell_correct(queries: DataFrame, dictionary: DataFrame,
                     query_col: str = "q", dict_col: str = "term",
                     count_col: str = "cnt") -> DataFrame:
    """Correct each query term to its best edit-distance<=1 dictionary
    term -> (q, match, dist, match_cnt). Best = lowest distance, then
    highest dictionary count, then lexicographic term (fully pinned).

    Scale shape: both sides fan out x(L+1) delete keys map-side, meet
    in ONE equi-join on the key, collapse duplicate collisions (the
    same pair collides via several keys) with a (q, term) groupBy, and
    verify with levenshtein only on survivors. The dictionary side is
    vocabulary-scale; nothing is broadcast blindly - AQE may choose to
    if the vocab fits. Exact-match queries resolve to themselves at
    dist 0 (the identity key collides too)."""
    qk = _with_delete_keys(
        queries.select(F.col(query_col).alias("q")).distinct(), "q")
    dk = _with_delete_keys(
        dictionary.select(F.col(dict_col).alias("term"),
                          F.col(count_col).alias("cnt")), "term")
    pairs = (qk.join(dk, "key")
             .groupBy("q", "term", "cnt").agg(F.count(F.lit(1))
                                              .alias("_nk"))
             .drop("_nk")
             .withColumn("dist", F.levenshtein("q", "term"))
             .filter(F.col("dist") <= 1))
    w = Window.partitionBy("q").orderBy(
        F.col("dist").asc(), F.col("cnt").desc(), F.col("term").asc())
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("q", F.col("term").alias("match"),
                    F.col("dist").cast("long").alias("dist"),
                    F.col("cnt").cast("long").alias("match_cnt")))
