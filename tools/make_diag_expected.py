"""Regenerate the per-column digest pins for the diag probes
(``__spark_entry__._DIAG_EXPECTED``): runs each probed query at sf0.01
on Spark and prints the dict literal to paste in. Re-run after ANY
change to a probed query or to the sf0.01 test data.

Usage: python tools/make_diag_expected.py [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBED = ["tpch_pricing_summary", "quality_classifier", "ivm_refresh",
          "sequence_packing", "hdr_quantiles"]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from eventrelationextractor_spark.spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or PROBED
    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    print("_DIAG_EXPECTED = {")
    for name in only:
        df = qs[name](spark, sf_dir)
        cols = df.columns
        aggs = [F.md5(F.concat_ws("\x01", F.sort_array(
                    F.collect_list(F.col(c).cast("string"))))).alias(f"d{i}")
                for i, c in enumerate(cols)]
        row = df.agg(*aggs).collect()[0]
        print(f"    {name!r}: [")
        for i, c in enumerate(cols):
            print(f"        ({c!r}, {row[i]!r}),")
        print("    ],")
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
