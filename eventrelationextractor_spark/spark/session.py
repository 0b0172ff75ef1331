"""SparkSession factory with the engine's default configuration.

Scale posture (SURVEY.md §4.3): AQE on (runtime re-planning + skew-join
splitting), Arrow enabled for every pandas UDF boundary, shuffle
partitions sized for the local harness but overridable for clusters.
"""

from __future__ import annotations

import os


def build_session(master: str | None = None, app_name: str = "erex-spark",
                  shuffle_partitions: int | None = None, **extra):
    from pyspark.sql import SparkSession

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (SparkSession.builder
               .master(master)
               .appName(app_name)
               .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
               .config("spark.serializer",
                       "org.apache.spark.serializer.KryoSerializer")
               .config("spark.ui.enabled", "false"))
    for k, v in extra.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
