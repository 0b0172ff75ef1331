"""spark-submit entry point: the staged KG-construction job, packaged for
``spark-submit --py-files erex.zip tools/submit_job.py <out_dir> [n_docs]
[--from-warc <dir>]``.

Default mode builds the synthetic pages corpus in-job; ``--from-warc``
runs the full crawl path instead - WARC segment files -> response
records -> html binary -> boilerplate-stripping text extraction ->
extraction (use ``--make-warc <dir> <n_docs>`` to materialize synthetic
segments first). ``--from-wet`` (with ``--make-wet``) reads WET
text-extract segments instead, skipping the html->text stage (the
conversion block IS the page text - Common Crawl's wet.paths layout). Either way: temporal+causal triples with the giant-page
guard, url-hash-bucketed resumable lineage writes, one-line JSON
summary. Demonstrates the north-rule deployment path (multi-executor via
--master; everything in the package is zip-importable)."""

from __future__ import annotations

import json
import os
import sys
import time


def make_warc(warc_dir: str, n_docs: int, docs_per_seg: int = 500) -> None:
    """Materialize synthetic WARC segment files (driver-side test-fixture
    generator; a real deployment reads Common Crawl's segments)."""
    from eventrelationextractor_spark import datagen
    from eventrelationextractor_spark.spark.warc import write_warc_bytes
    os.makedirs(warc_dir, exist_ok=True)
    for seg0 in range(0, n_docs, docs_per_seg):
        pages = []
        for d in range(seg0, min(seg0 + docs_per_seg, n_docs)):
            p = datagen.synth_page(d)
            pages.append((p["url"],
                          p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                          p["html"]))
        with open(os.path.join(warc_dir,
                               f"seg-{seg0 // docs_per_seg:05d}.warc"),
                  "wb") as f:
            f.write(write_warc_bytes(pages))


def make_wet(wet_dir: str, n_docs: int, docs_per_seg: int = 500) -> None:
    """Materialize synthetic WET text-extract segments (same corpus as
    make_warc, minus the html envelope)."""
    from eventrelationextractor_spark import datagen
    from eventrelationextractor_spark.spark.warc import write_wet_bytes
    os.makedirs(wet_dir, exist_ok=True)
    for seg0 in range(0, n_docs, docs_per_seg):
        pages = []
        for d in range(seg0, min(seg0 + docs_per_seg, n_docs)):
            p = datagen.synth_page(d)
            pages.append((p["url"],
                          p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                          p["text"]))
        with open(os.path.join(wet_dir,
                               f"seg-{seg0 // docs_per_seg:05d}.warc.wet"),
                  "wb") as f:
            f.write(write_wet_bytes(pages))


def make_jsonl(out_dir: str, n_docs: int,
               docs_per_file: int = 1000) -> None:
    """Materialize synthetic JSONL shards (same corpus; one json object
    per line, with a deliberately corrupt line per file so the
    corrupt-routing path is exercised end to end)."""
    import json as _json

    from eventrelationextractor_spark import datagen
    os.makedirs(out_dir, exist_ok=True)
    for f0 in range(0, n_docs, docs_per_file):
        lines = []
        for d in range(f0, min(f0 + docs_per_file, n_docs)):
            p = datagen.synth_page(d)
            lines.append(_json.dumps({"url": p["url"], "text": p["text"],
                                      "lang": p["lang"]}))
        lines.append('{"url": "https://bad.example/x", "text": "trunc')
        with open(os.path.join(out_dir,
                               f"part-{f0 // docs_per_file:05d}.jsonl"),
                  "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--make-warc":
        make_warc(args[1], int(args[2]))
        print(json.dumps({"made_warc": args[1], "docs": int(args[2])}))
        return
    if args and args[0] == "--make-wet":
        make_wet(args[1], int(args[2]))
        print(json.dumps({"made_wet": args[1], "docs": int(args[2])}))
        return
    if args and args[0] == "--make-jsonl":
        make_jsonl(args[1], int(args[2]))
        print(json.dumps({"made_jsonl": args[1], "docs": int(args[2])}))
        return
    warc_dir = None
    if "--from-warc" in args:
        i = args.index("--from-warc")
        warc_dir = args[i + 1]
        del args[i:i + 2]
    wet_dir = None
    if "--from-wet" in args:
        i = args.index("--from-wet")
        wet_dir = args[i + 1]
        del args[i:i + 2]
    jsonl_dir = None
    if "--from-jsonl" in args:
        i = args.index("--from-jsonl")
        jsonl_dir = args[i + 1]
        del args[i:i + 2]
    out_dir = args[0] if args else "/tmp/erex_out"
    n_docs = int(args[1]) if len(args) > 1 else 2000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops.htmltext import html_to_text
    from eventrelationextractor_spark.spark.lineage import (
        read_triples, write_triples_resumable)
    from eventrelationextractor_spark.spark.stages import synth_pages_df
    from eventrelationextractor_spark.spark.warc import read_warc, read_wet

    spark = SparkSession.builder.appName("erex-kg-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    if warc_dir is not None:
        pages = html_to_text(
            read_warc(spark, os.path.join(warc_dir, "*.warc"))) \
            .withColumn("lang", F.lit("en"))
    elif wet_dir is not None:
        pages = read_wet(spark, os.path.join(wet_dir, "*.warc.wet")) \
            .withColumn("lang", F.lit("en"))
    elif jsonl_dir is not None:
        from eventrelationextractor_spark.spark.jsonl import read_jsonl
        good, bad = read_jsonl(spark, os.path.join(jsonl_dir, "*.jsonl"),
                               "url string, text string, lang string")
        n_bad = bad.count()
        if n_bad:
            print(json.dumps({"corrupt_lines_routed": n_bad}))
        pages = good
    else:
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
