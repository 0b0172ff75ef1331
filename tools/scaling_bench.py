"""Scaling-efficiency evidence for the north rule: run the identical
staged KG job at two parallelism levels (local[8] vs local[32]) on the
same input and report throughput at both plus efficiency = (T32/T8)/4.

A real 4x-executor cluster can't exist in this sandbox; two local-mode
levels on a 32-core box are the sanctioned stand-in (BASELINE.md). The job
is the flagship pages -> temporal+causal triples extraction over the
deterministic synthetic corpus; being a pure map stage it has no shuffle,
so the scaling ceiling is CPU + per-task overhead.

Usage:
    python tools/scaling_bench.py [--docs 100000] [--out BENCH/BASELINE.md]
    python tools/scaling_bench.py --worker <cpus> <docs>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_worker(cpus: int, n_docs: int) -> None:
    """The measured job reads the pages corpus FROM STORAGE (parquet) and
    runs the staged extraction - the same shape as a production run over an
    Iceberg pages table. Scan partitioning is CPU-sized via
    spark.sql.files.maxPartitionBytes (see session.py): extraction costs
    milliseconds of Python per KB, so IO-sized 128MB scan tasks would cap
    parallelism at a handful of tasks regardless of executor count."""
    from eventrelationextractor_spark.spark.session import build_session
    from eventrelationextractor_spark.spark.stages import (extract_triples,
                                                           synth_pages_df)
    corpus = f"/tmp/scaling_corpus_{n_docs}"
    if not os.path.exists(corpus + "/_SUCCESS"):
        spark0 = build_session(master="local[32]", app_name="corpus-gen")
        spark0.sparkContext.setLogLevel("ERROR")
        synth_pages_df(spark0, n_docs, partitions=64) \
            .write.mode("overwrite").parquet(corpus)
        spark0.stop()

    # size scan partitions to ~2 per core (a deployment tunes
    # maxPartitionBytes to its cluster; CPU-bound python wants coarse
    # tasks with full-width coverage)
    total_bytes = sum(os.path.getsize(os.path.join(corpus, f))
                      for f in os.listdir(corpus) if f.endswith(".parquet"))
    os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"] = str(
        max(1 << 20, total_bytes // (cpus * 2)))

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus,
                          app_name=f"scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus)

    # warm-up: a full-width pass so every python worker pays its imports
    # (pandas/numpy/package/models); then best-of-3 to shed sandbox noise
    extract_triples(pages, mode="both").count()
    best, rows = None, 0
    for _ in range(3):
        t0 = time.perf_counter()
        rows = extract_triples(pages, mode="both").count()
        wall = time.perf_counter() - t0
        best = wall if best is None or wall < best else best
    print(json.dumps({"cpus": cpus, "docs": n_docs, "rows": rows,
                      "wall_sec": round(best, 3),
                      "docs_per_sec": round(n_docs / best, 1)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]))
        return

    n_docs = 100_000
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    args = sys.argv[1:]
    if "--docs" in args:
        n_docs = int(args[args.index("--docs") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    # --ladder: the full N -> 4N evidence at every N the box can host
    # (1->4, 2->8, 4->16, 8->32), printed as pairwise efficiencies. One
    # process per level, sequential, best-of-3 inside each worker.
    levels = (1, 2, 4, 8, 16, 32) if "--ladder" in args else (8, 32)

    results = {}
    for cpus in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus), str(n_docs)],
            capture_output=True, text=True, cwd=REPO, check=True)
        line = [ln for ln in proc.stdout.strip().split("\n")
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    if "--ladder" in args:
        for n in (1, 2, 4, 8):
            e = (results[4 * n]["docs_per_sec"]
                 / results[n]["docs_per_sec"]) / 4.0
            print(f"efficiency {n}->{4*n}: {e:.3f}")
        return

    t8 = results[8]["docs_per_sec"]
    t32 = results[32]["docs_per_sec"]
    eff = (t32 / t8) / 4.0

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if os.path.exists(out_path):
        # BENCH/BASELINE.md is maintained by hand with the full evidence
        # (incl. the no-Spark multiprocessing control); print the fresh
        # numbers instead of clobbering it.
        print(f"(existing {out_path} kept; fresh numbers above)")
        print(f"efficiency={eff:.3f}")
        return
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(f"""# BENCH/BASELINE — throughput & scaling efficiency

North-rule evidence (BASELINE.json): the identical flagship job — pages
-> staged temporal+causal triple extraction over the deterministic
synthetic web-page corpus — run at two parallelism levels on the same
input ({n_docs} documents, {results[8]['rows']} triples). No cluster
exists in this sandbox, so N vs 4N executors is evidenced as local[8] vs
local[32] on a 32-core box (BASELINE.md 'Scaling efficiency' row).

| parallelism | wall (s) | docs/sec | triples |
|---|---|---|---|
| local[8]  (N)  | {results[8]['wall_sec']} | {t8} | {results[8]['rows']} |
| local[32] (4N) | {results[32]['wall_sec']} | {t32} | {results[32]['rows']} |

**Scaling efficiency (T_4N / T_N) / 4 = {eff:.3f}** (target >= 0.8).

Why it scales: extraction is a single `mapInPandas` over the pages scan —
one row is one document, there is no shuffle stage, no driver loop and no
cross-document state until canonicalization; the only sub-linear terms are
task scheduling and Arrow batch framing. The same property holds on a real
multi-executor cluster, where the pages table's `bucket(url)` layout feeds
partition-local tasks.

Regenerate: `python tools/scaling_bench.py` (writes this file).
""")
    print(f"efficiency={eff:.3f} -> {out_path}")


if __name__ == "__main__":
    main()
