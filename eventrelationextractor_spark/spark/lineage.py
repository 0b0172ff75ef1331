"""Materialization with per-partition lineage + checkpoint/resume
(SURVEY.md §4.2 'Resume/lineage', north-rule requirement).

The triples table is written bucket-by-bucket on ``crc32(url) % n_buckets``
(the explicit url-hash bucketing of the north rule). Each completed bucket
appends a manifest record (rows, predicate histogram, wall seconds) to
``<out>/_lineage/manifest.jsonl``; a restarted job reads the manifest and
skips completed buckets - no recompute, which the resume test verifies by
mtime. On Iceberg deployments the same layout maps to
``bucket(n, url)`` partition transforms with snapshot-based resume; plain
parquet directories keep the harness dependency-free.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage", "manifest.jsonl")


def read_manifest(out_dir: str) -> dict:
    """bucket -> manifest record (last record wins)."""
    path = _manifest_path(out_dir)
    done: dict = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    done[rec["bucket"]] = rec
    return done


def _append_manifest(out_dir: str, record: dict) -> None:
    path = _manifest_path(out_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps(record) + "\n")


def _iceberg_ddl(table: str, n_buckets: int) -> str:
    """DDL for the Iceberg triples table. The manifest's bucket id is an
    identity partition (it already IS crc32(url) % n, so the layout
    equals a ``bucket(n, url)`` transform while staying readable by the
    resume manifest); swap to the native transform when the writer's
    hash is not pinned by resume compatibility."""
    return (f"CREATE TABLE IF NOT EXISTS {table} ("
            " url STRING, subj STRING, pred STRING, obj STRING,"
            " stage STRING, pair_type STRING, bucket INT)"
            " USING iceberg PARTITIONED BY (bucket)")


def write_triples_resumable(pages: DataFrame, out_dir: str,
                            n_buckets: int = 8, mode: str = "both",
                            extract=None, compact: bool = False,
                            catalog: str = "parquet",
                            table: str | None = None) -> dict:
    """Extract triples with url-hash bucketing and resume, in ONE pass.

    All pending buckets are written by a single extraction job:
    ``filter(bucket in pending)`` -> extract -> dynamic-partition-overwrite
    ``partitionBy("bucket")``. Completed buckets (already in the manifest)
    are excluded from the scan up front, so a resume never recomputes or
    re-reads them. A crashed run's partial partition files are removed
    explicitly before the write: dynamic overwrite only replaces
    partitions PRESENT in the new output, so a pending bucket that
    extracts zero rows on resume would otherwise keep the crashed run's
    stale files and the manifest read-back would count them. (On Iceberg
    the same guard is the snapshot rollback/`overwritePartitions` of the
    uncommitted write.) The earlier formulation looped buckets on the
    driver - n_buckets full passes over a .cache() of the corpus, which
    cannot hold at 100 TB.

    Manifest stats come from one narrow read-back of the just-written
    pending partitions (bucket + pred columns only - footer-level pruning,
    never the corpus). ``wall_sec`` is the wall time of the whole pass
    (per-bucket timing no longer exists in a one-pass write; the field is
    kept for manifest compatibility).

    By default the extraction output streams straight into per-bucket
    subdirectories with NO shuffle (each task writes its rows to its
    buckets' files - the file count is tasks x buckets).
    ``compact=True`` adds a repartition on bucket for one-file-per-bucket
    layouts; note that collapses write parallelism to n_buckets tasks, so
    it only suits small n_buckets or post-hoc compaction. On Iceberg this
    maps to ``bucket(n, url)`` partition transforms with snapshot-based
    resume (see module docstring).

    ``catalog='iceberg'`` (requires ``table``, e.g.
    ``'local.db.triples'``, and an Iceberg catalog configured on the
    session): the DDL above is issued if the table is absent and the
    pending buckets land via ``writeTo(table).overwritePartitions()`` -
    Iceberg's atomic replace-only-partitions-present-in-the-new-data,
    the exact semantics the parquet branch emulates with dynamic
    partition overwrite. The stale-partial cleanup is unnecessary
    there: an uncommitted write is invisible (snapshot isolation), so a
    crashed run leaves no partial partition to count. The jsonl
    manifest still records per-bucket lineage next to the table.

    Returns {'written': [...], 'skipped': [...]}."""
    from .stages import extract_triples
    extract = extract or extract_triples
    if catalog not in ("parquet", "iceberg"):
        raise ValueError(f"unknown catalog {catalog!r}")
    if catalog == "iceberg" and not table:
        raise ValueError("catalog='iceberg' requires a table name")

    done = read_manifest(out_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    skipped = [b for b in range(n_buckets) if b in done]
    if not pending:
        return {"written": [], "skipped": skipped}

    t0 = time.perf_counter()
    if catalog == "parquet":
        for b in pending:      # drop stale partials from a crashed run
            d = os.path.join(out_dir, f"bucket={b}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    bucket_of = F.crc32(F.col("url")) % n_buckets
    pending_pages = (pages.withColumn("bucket", bucket_of)
                     .filter(F.col("bucket").isin([int(b) for b in pending]))
                     .drop("bucket"))
    trips = extract(pending_pages, mode=mode) \
        .withColumn("bucket", bucket_of)
    if compact:
        trips = trips.repartition("bucket")
    spark = pages.sparkSession
    if catalog == "iceberg":
        spark.sql(_iceberg_ddl(table, n_buckets))
        trips.withColumn("bucket", F.col("bucket").cast("int")) \
            .writeTo(table).overwritePartitions()
    else:
        (trips.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(out_dir))
    wall = round(time.perf_counter() - t0, 3)

    if catalog == "iceberg":
        stats = (spark.read.table(table)
                 .filter(F.col("bucket").isin([int(b) for b in pending]))
                 .groupBy("bucket", "pred").count().collect())
    elif glob.glob(os.path.join(out_dir, "bucket=*")):
        stats = (read_triples(spark, out_dir)
                 .filter(F.col("bucket").isin([int(b) for b in pending]))
                 .groupBy("bucket", "pred").count().collect())
    else:                      # every pending bucket extracted zero rows
        stats = []
    by_bucket: dict = {b: {} for b in pending}
    for r in stats:
        by_bucket[int(r["bucket"])][r["pred"]] = int(r["count"])
    now = time.time()
    for b in pending:
        _append_manifest(out_dir, {
            "bucket": b,
            "rows": int(sum(by_bucket[b].values())),
            "pred_histogram": by_bucket[b],
            "wall_sec": wall,
            "ts": now,
        })
    return {"written": pending, "skipped": skipped}


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the bucketed triple table. Raises a clear error when no
    bucket partition exists yet (e.g. a first run whose extraction
    yielded zero triples) instead of the parquet reader's opaque
    path-not-found."""
    if not glob.glob(os.path.join(out_dir, "bucket=*")):
        raise FileNotFoundError(
            f"no bucket=* partitions under {out_dir} - nothing has been "
            "written yet (a run whose extraction yields zero rows writes "
            "no partition files; its manifest still records rows=0)")
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*"))
