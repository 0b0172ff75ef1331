"""JSONL ingestion source: newline-delimited JSON (the de-facto
interchange format of instruction/chat training data and most public
dataset dumps) -> typed DataFrame plus corrupt-record telemetry.

Real dumps are dirty - truncated lines from killed writers, stray BOMs,
schema drift - and silently dropping them biases the corpus, so the
reader runs Spark's PERMISSIVE mode with an explicit corrupt-record
column: bad lines surface as rows carrying their raw text instead of
vanishing (FAILFAST would kill a 100-TB job for one bad shard;
DROPMALFORMED lies about coverage). The split into (good, bad) is one
filter each off the same scan.

Distributed shape: the JSON source is line-splittable (unlike WARC/WET
binaries), so files parallelize by block; an explicit schema is REQUIRED
- schema inference at scale is a full extra pass over 100 TB and infers
from a sample anyway (exactly the silent-drift trap the explicit schema
exists to prevent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str,
               staging_path: str | None = None):
    """-> (good, bad): ``good`` = rows matching ``schema`` (corrupt
    column pruned), ``bad`` = (raw_line) rows for every line that
    failed to parse. ``schema`` is a DDL string WITHOUT the corrupt
    column (added internally).

    ``staging_path`` (production path at ingest scale): land the parsed
    batch to parquet there and split off the staging READ - nothing is
    pinned in executor memory, the stage is resumable, and downstream
    scans get parquet pushdown. Without it the parsed batch is
    ``.cache()``d (per-batch working state); call
    ``good.sparkSession.catalog.clearCache()`` - or hold the returned
    frames' shared parent via ``good`` itself - only for small batches.
    A 100-TB ingest should ALWAYS pass ``staging_path``: the cache
    variant pins the whole corpus in executor memory/disk for the
    session lifetime."""
    full = f"{schema}, {CORRUPT_COL} string"
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CORRUPT_COL)
          .json(path))
    # Spark REFUSES any filter on the corrupt column over the raw
    # scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN:
    # the column is populated lazily during parsing, so a
    # corrupt-only query could skip the very parse that fills it);
    # its documented remedy is materializing the parse first.
    if staging_path is not None:
        df.write.mode("overwrite").parquet(staging_path)
        df = spark.read.parquet(staging_path)
    else:
        df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()) \
        .withColumnRenamed(CORRUPT_COL, "raw_line")
    return good, bad
