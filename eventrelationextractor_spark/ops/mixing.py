"""Data-mixing operators: temperature-scaled mixture weights + sampling.

``ops/textstats.stratified_sample`` applies *driver-supplied* per-stratum
rates. A real training-corpus pipeline derives those rates from the data:
the standard recipe (multilingual LM sampling, UnifiedQA / mT5-style
alpha-smoothing, DoReMi's starting point) reweights stratum s with
probability proportional to n_s**alpha — alpha = 1 keeps the natural
distribution, alpha -> 0 flattens it, boosting tail domains/languages.

Scale design: the rate computation touches only the stratum-level count
table (thousands of rows at web scale — domains/languages, not docs), so
the normalization is a tiny single-partition aggregate; rates re-attach
to the corpus with a broadcast join, and the sampling filter is the same
shuffle-free md5-fate predicate as stratified_sample — reproducible
across runs, engines and resumes, no RNG state. One shuffle total (the
stratum count), then map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_mixture_rates(df: DataFrame, stratum_col: str,
                              alpha: float = 0.5,
                              target_frac: float = 0.5) -> DataFrame:
    """(stratum, n_docs, weight, rate): weight = n^alpha / sum(n^alpha);
    rate = min(1, target_frac * N_total * weight / n) — the per-row keep
    probability that hits ``target_frac`` of the corpus in expectation
    while allocating across strata by the tempered weights. (Strata whose
    tempered share exceeds their size cap at rate 1; the realized total
    then undershoots target_frac — the standard behavior, callers iterate
    alpha if they need the exact budget.)"""
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n_total"),
                     F.sum(F.pow("n_docs", F.lit(alpha))).alias("z"))
    return (counts.crossJoin(F.broadcast(tot))
            .select(stratum_col, "n_docs",
                    (F.pow("n_docs", F.lit(alpha)) / F.col("z"))
                    .alias("weight"),
                    F.least(
                        F.lit(1.0),
                        F.lit(target_frac) * F.col("n_total")
                        * F.pow("n_docs", F.lit(alpha)) / F.col("z")
                        / F.col("n_docs")).alias("rate")))


def apply_mixture(df: DataFrame, rates: DataFrame, stratum_col: str,
                  id_col: str = "doc_id", salt: str = "mix1") -> DataFrame:
    """Filter ``df`` to the sampled mix: row survives iff its md5 fate
    (identical to stratified_sample's) falls under its stratum's rate.
    ``rates`` is stratum-level -> broadcast."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("long") % 10000
    r = rates.select(stratum_col, "rate")
    return (df.join(F.broadcast(r), stratum_col)
            .filter(h < F.col("rate") * 10000.0)
            .drop("rate"))
