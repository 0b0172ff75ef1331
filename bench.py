"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Also reports docs/sec for the flagship staged KG job (the north-star
throughput number) as an auxiliary key.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from eventrelationextractor_spark.spark.session import build_session

    spark = build_session(master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    timings: dict = {}
    total = 0.0
    rows: dict = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        rows[name] = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    docs_sec = None
    if timings.get("kg_temporal_triples"):
        # temporal + causal sieves each traverse every synthetic document
        kg_time = timings["kg_temporal_triples"] + timings.get(
            "kg_causal_triples", 0.0)
        docs_sec = round(2 * n_docs / kg_time, 2) if kg_time else None

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "rows": rows,
        "docs_per_sec": docs_sec,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
