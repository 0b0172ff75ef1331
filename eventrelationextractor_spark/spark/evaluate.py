"""A2/J6: gold-vs-system pair evaluation as DataFrame aggregations.

Semantics follow /root/reference/src/evaluator/PairEvaluator.java:22-130:
exact (src, tgt) key match per document, per-label tp/fp/fn with P/R/F1
plus micro accuracy. Inverse-normalized matching (a gold (b,a,inverse-rel)
counts for a predicted (a,b,rel); TemporalRelation.getInverseRelation) is
enabled by default per FIXTURES.md §3.

Shapes: gold(url, src, tgt, rel) x pred(url, src, tgt, rel) -> one
broadcastable-sized metrics frame; the joins are equi-joins on
(url, src, tgt), map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.timexrule import INVERSE

_INV_PAIRS = list(INVERSE.items())


def _inverse_expr(col):
    expr = None
    for a, b in _INV_PAIRS:
        cond = F.when(col == a, F.lit(b))
        expr = cond if expr is None else expr.when(col == a, F.lit(b))
    return expr.otherwise(col)


def normalize_directions(df: DataFrame) -> DataFrame:
    """Canonical direction: src <= tgt (string order), label inverted on
    swap - makes (a,b,rel) and (b,a,inverse) compare equal."""
    swap = F.col("src") > F.col("tgt")
    return df.select(
        "url",
        F.when(swap, F.col("tgt")).otherwise(F.col("src")).alias("src"),
        F.when(swap, F.col("src")).otherwise(F.col("tgt")).alias("tgt"),
        F.when(swap, _inverse_expr(F.col("rel"))).otherwise(F.col("rel"))
        .alias("rel"))


def evaluate_pairs(gold: DataFrame, pred: DataFrame,
                   inverse_normalize: bool = True) -> DataFrame:
    """-> per-label (label, tp, fp, fn, precision, recall, f1)."""
    if inverse_normalize:
        gold = normalize_directions(gold).dropDuplicates(["url", "src", "tgt"])
        pred = normalize_directions(pred).dropDuplicates(["url", "src", "tgt"])
    g = gold.select("url", "src", "tgt", F.col("rel").alias("gold_rel"))
    p = pred.select("url", "src", "tgt", F.col("rel").alias("pred_rel"))
    joined = g.join(p, ["url", "src", "tgt"], "full")

    per_gold = (joined.filter(F.col("gold_rel").isNotNull())
                .groupBy(F.col("gold_rel").alias("label"))
                .agg(F.sum(F.when(F.col("pred_rel") == F.col("gold_rel"), 1)
                           .otherwise(0)).alias("tp"),
                     F.sum(F.when(F.col("pred_rel").isNull()
                                  | (F.col("pred_rel") != F.col("gold_rel")),
                                  1).otherwise(0)).alias("fn")))
    per_pred = (joined.filter(F.col("pred_rel").isNotNull())
                .groupBy(F.col("pred_rel").alias("label"))
                .agg(F.sum(F.when(F.col("gold_rel").isNull()
                                  | (F.col("gold_rel") != F.col("pred_rel")),
                                  1).otherwise(0)).alias("fp")))
    out = (per_gold.join(per_pred, "label", "full")
           .fillna(0, subset=["tp", "fp", "fn"]))
    return out.select(
        "label", "tp", "fp", "fn",
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
                6).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)),
                6).alias("recall"),
        F.round(2 * F.col("tp")
                / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"),
                             F.lit(1)), 6).alias("f1"))


def micro_scores(gold: DataFrame, pred: DataFrame,
                 inverse_normalize: bool = True) -> dict:
    """Corpus-level micro P/R/F1 (driver-side scalars)."""
    m = evaluate_pairs(gold, pred, inverse_normalize) \
        .agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
             F.sum("fn").alias("fn")).collect()[0]
    tp, fp, fn = m.tp or 0, m.fp or 0, m.fn or 0
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r,
            "f1": 2 * tp / max(2 * tp + fp + fn, 1)}


def awareness_scores(gold: DataFrame, pred: DataFrame,
                     n_buckets: int = 128) -> DataFrame:
    """Per-document TempEval-3 temporal-awareness scores (core.awareness,
    golden-anchored against the reference's own evaluation tool).

    Distributed shape: the metric is document-local (a timegraph never
    spans documents), so gold and pred rows are tagged, unioned, and
    grouped; each document runs the exact closure-based scorer inside
    one Arrow-batched applyInPandas - ONE shuffle total, no driver
    loop. The grouping key is
    ``crc32(url) % n_buckets``, NOT the raw url: documents are tiny
    groups (tens of relations), and per-group Arrow/pandas overhead
    dominates scoring cost at millions of single-doc groups (measured
    ~2.5x the whole query at sf0.1 - BENCH/BASELINE.md round-3 notes).
    Each bucket group loops its documents with a pandas groupby; results
    are identical for any n_buckets, which only tunes group size
    (n_buckets >> cores keeps all executors busy; state per task stays
    bounded by the bucket's documents).
    Input frames: (url, src, tgt, rel).

    Ordering contract: ``reduce_relations`` is insertion-order-sensitive
    (which relation of a redundant/violated set is KEPT depends on
    arrival order), and a shuffled cogroup has no stable row order, so
    each document's relations are canonicalized with ``sorted()`` before
    scoring. Scores are therefore reproducible across partitionings/
    engines but can differ from the reference tool run on file-ordered
    annotations; to reproduce file-order tool scores exactly, carry an
    ordering column and feed ``core.awareness.temporal_awareness`` in
    that order (what tests/test_awareness_golden.py does)."""
    out_schema = ("url string, precision double, recall double, f1 double,"
                  " sys_total long, gold_total long")

    def score(key, pdf):
        import pandas as pd

        from ..core.awareness import temporal_awareness

        def by_url(side):
            return {u: list(zip(g["src"], g["tgt"], g["rel"]))
                    for u, g in side.groupby("url", sort=False)}
        gold_by = by_url(pdf[pdf["is_gold"] == 1])
        pred_by = by_url(pdf[pdf["is_gold"] == 0])
        out = []
        for url in sorted(set(gold_by) | set(pred_by)):
            m = temporal_awareness(sorted(gold_by.get(url, [])),
                                   sorted(pred_by.get(url, [])))
            out.append({
                "url": url, "precision": float(m["precision"]),
                "recall": float(m["recall"]), "f1": float(m["f1"]),
                "sys_total": m["sys_total"], "gold_total": m["gold_total"]})
        return pd.DataFrame(out)

    # Tag-union-split, NOT groupBy.cogroup(groupBy): when gold and pred
    # derive from the same parent frame (the common case - pred is a
    # perturbation/selection of gold, or both come from one extraction),
    # FlatMapCoGroupsInPandas' attribute deduplication can prune the
    # right side's data columns entirely (observed on Spark 4.1: the
    # right branch's Project emitted ONLY the grouping key and the UDF
    # saw a column-less pred frame -> every score silently 0). A
    # self-union has no such ambiguity, and it also halves the shuffles:
    # one Exchange of the tagged rows instead of one per cogroup side.
    bucket = (F.crc32(F.col("url")) % n_buckets).alias("bucket")
    g = gold.select(bucket, "url", "src", "tgt", "rel",
                    F.lit(1).alias("is_gold"))
    p = pred.select(bucket, "url", "src", "tgt", "rel",
                    F.lit(0).alias("is_gold"))
    return (g.unionByName(p).groupBy("bucket")
            .applyInPandas(score, schema=out_schema))
