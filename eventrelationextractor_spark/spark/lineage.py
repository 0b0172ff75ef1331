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

import json
import os
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


def write_triples_resumable(pages: DataFrame, out_dir: str,
                            n_buckets: int = 8, mode: str = "both",
                            extract=None) -> dict:
    """Extract triples bucket-by-bucket with resume. Returns a summary
    {'written': [...], 'skipped': [...]}."""
    from .stages import extract_triples
    extract = extract or extract_triples

    bucketed = pages.withColumn(
        "bucket", F.crc32(F.col("url")) % n_buckets).cache()
    done = read_manifest(out_dir)
    written, skipped = [], []
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        t0 = time.perf_counter()
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        trips = extract(part, mode=mode)
        path = os.path.join(out_dir, f"bucket={b}")
        trips.write.mode("overwrite").parquet(path)

        spark = pages.sparkSession
        stats = (spark.read.parquet(path)
                 .groupBy("pred").count().collect())
        _append_manifest(out_dir, {
            "bucket": b,
            "rows": int(sum(r["count"] for r in stats)),
            "pred_histogram": {r["pred"]: int(r["count"]) for r in stats},
            "wall_sec": round(time.perf_counter() - t0, 3),
            "ts": time.time(),
        })
        written.append(b)
    bucketed.unpersist()
    return {"written": written, "skipped": skipped}


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*"))
