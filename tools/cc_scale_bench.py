"""Adversarial scale evidence for connected_components (spark/kg.py):
pointer-jumping min-label propagation on graph shapes that break naive
propagation - a maximal-diameter chain (worst case for label
propagation: O(diameter) rounds without the jump, O(log d) with it) and
a hub-skew star (worst case for join skew: one vertex in every edge).

Generates >= 1M edges with spark.range (no driver materialization),
runs CC, asserts exact component labels, and reports rounds + wall time.

Run: python tools/cc_scale_bench.py [--chain 100000] [--star 900000]
Results are recorded in BENCH/BASELINE.md §Connected components.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=100_000)
    ap.add_argument("--star", type=int, default=900_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from eventrelationextractor_spark.spark import kg
    from eventrelationextractor_spark.spark.session import build_session

    # localCheckpoint materializes each round's labels in the (local-mode
    # shared) heap; size it for the 1M-edge adversarial graph. On a real
    # cluster this is ordinary executor storage memory.
    spark = build_session(master=f"local[{args.cpus}]",
                          shuffle_partitions=args.cpus * 2,
                          **{"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")

    # chain 0-1-2-...-N (diameter = chain length) with zero-padded string
    # ids so string-min == numeric-min
    chain = spark.range(args.chain).select(
        F.format_string("c%09d", F.col("id")).alias("src"),
        F.format_string("c%09d", F.col("id") + 1).alias("dst"))
    # hub-skew star: hub00 - s<i>, every edge touches the hub
    star = spark.range(args.star).select(
        F.lit("hub00").alias("src"),
        F.format_string("s%09d", F.col("id")).alias("dst"))
    edges = chain.unionByName(star).localCheckpoint()
    n_edges = edges.count()

    # count convergence rounds via a wrapper on localCheckpoint? simpler:
    # patch kg.connected_components' loop observable - rerun with
    # decreasing max_iterations until the labels stop matching.
    t0 = time.perf_counter()
    stats: dict = {}
    labels = kg.connected_components(edges, stats=stats)
    rows = labels.groupBy("component").count().collect()
    wall = time.perf_counter() - t0

    comp = {r.component: r["count"] for r in rows}
    assert comp.get("c000000000") == args.chain + 1, comp
    assert comp.get("hub00") == args.star + 1, {
        k: v for k, v in comp.items() if not k.startswith("c")}
    print(f"edges={n_edges} wall={wall:.1f}s "
          f"rounds={stats['rounds']} "
          f"(chain diameter {args.chain}, log2={args.chain.bit_length()}) "
          f"components={{chain: {comp['c000000000']}, star: {comp['hub00']}}}")
    spark.stop()


if __name__ == "__main__":
    main()
