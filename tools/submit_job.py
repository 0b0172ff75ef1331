"""spark-submit entry point: the staged KG-construction job, packaged for
``spark-submit --py-files erex.zip tools/submit_job.py <out_dir> [n_docs]``.

Builds the synthetic pages corpus, extracts temporal+causal triples with
the giant-page guard, applies the consistency filter shape via lineage
writes, and prints a one-line JSON summary. Demonstrates the north-rule
deployment path (multi-executor via --master; everything in the package is
zip-importable)."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/erex_out"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from pyspark.sql import SparkSession

    from eventrelationextractor_spark.spark.lineage import (
        read_triples, write_triples_resumable)
    from eventrelationextractor_spark.spark.stages import synth_pages_df

    spark = SparkSession.builder.appName("erex-kg-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    pages = synth_pages_df(spark, n_docs)
    summary = write_triples_resumable(pages, out_dir, n_buckets=8,
                                      mode="both")
    triples = read_triples(spark, out_dir)
    n = triples.count()
    preds = {r["pred"]: r["count"]
             for r in triples.groupBy("pred").count().collect()}
    print(json.dumps({"docs": n_docs, "triples": n,
                      "buckets_written": summary["written"],
                      "buckets_skipped": summary["skipped"],
                      "pred_histogram_top": dict(sorted(
                          preds.items(), key=lambda kv: -kv[1])[:5]),
                      "wall_sec": round(time.perf_counter() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
