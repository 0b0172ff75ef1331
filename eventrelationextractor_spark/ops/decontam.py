"""Benchmark decontamination: flag corpus documents sharing any word
n-gram with an evaluation/benchmark set - the standard training-data
hygiene pass (GPT-3 appendix C / PaLM-style 13-gram overlap).

Scale shape: the benchmark side is small by construction (eval sets are
thousands of documents), so its distinct n-gram hash set is an explicit
``F.broadcast`` dimension; the corpus side is a map-side n-gram explode
(reusing ``dedup.shingles`` - distinct k-word shingles over normalized
text) feeding one partial-agg groupBy per doc. No corpus-side self-join,
no shuffle of the benchmark, and the corpus is touched once.

Match semantics: md5 of the space-joined normalized n-gram (engine-
portable, like every hash in ops/dedup.py); a document with fewer than n
words has zero n-grams and is reported clean with ``n_grams = 0``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_contamination(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_id_col: str = "bench_id",
                        bench_text_col: str = "text") -> DataFrame:
    """-> (id, n_grams, n_hits, contaminated) per corpus document:
    n_grams = the doc's distinct n-gram count, n_hits = how many of them
    occur anywhere in the benchmark set, contaminated = n_hits > 0."""
    bench_grams = (shingles(benchmark, bench_id_col, bench_text_col, n)
                   .select(F.md5("shingle").alias("gh")).distinct())
    doc_grams = (shingles(docs, id_col, text_col, n)
                 .select(id_col, F.md5("shingle").alias("gh")))
    totals = doc_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"))
    hits = (doc_grams.join(F.broadcast(bench_grams), "gh")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(id_col)
            .join(totals, id_col, "left")
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))
