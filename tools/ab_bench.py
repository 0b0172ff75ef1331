"""In-session interleaved A/B for the two round-2-regressed ops
(VERDICT r2 'Next round' #1/#2): embedding_neardup and ivf_topk.

Protocol per BENCH/BASELINE.md: cross-session numbers carry +-15%
(sometimes 2x) co-tenancy noise, so formulations are compared ONLY
within one session, interleaved, medians over >= 4 sweeps.

Formulations:
  emb_r1   - round-1: single 8-plane signature, unguarded self-join
             (no banding, no hot-bucket cap - lower recall AND unsafe
             at scale; timed for attribution only)
  emb_r2   - round-2: 4 banded 8-plane signatures as 32 separate
             aggregate(zip_with(...)) expression passes, capped pairs
  emb_new  - round-3: same banded+capped scheme, signatures fused into
             one Arrow matmul stage (sign(V @ P.T))
  ivf_r1   - round-1: corpus x centroid broadcast join -> Window argmax
  ivf_r2   - round-2: literal-centroid codegen assignment
  ivf_new  - round-3: broadcast numpy centroid matrix in mapInPandas

Usage: python tools/ab_bench.py [--sweeps 5] [--sf /root/testdata/sf0.1]
Prints one JSON line with per-formulation sweep times + medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

import __spark_entry__ as entry
from eventrelationextractor_spark.ops import dedup, simsearch
from eventrelationextractor_spark.ops.simsearch import _dot


def _with_cosine_r1(pairs):
    """Round-1 _with_cosine: norms recomputed per pair."""
    qa, ca = F.col("qv"), F.col("cv")
    return pairs.withColumn(
        "cosine", _dot(qa, ca) / (F.sqrt(_dot(qa, qa)) * F.sqrt(_dot(ca, ca))))


def _emb_r1(aug):
    """Round-1 embedding_neardup (git e28c1ac~1): one 8-plane signature,
    unguarded self-join on the signature."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    with_sig = aug.select(
        F.col("vec_id").alias("id"), vec.alias("v"),
        simsearch.hyperplane_signature(aug, 8, 64, "embedding"))
    left = with_sig.select(F.col("id").alias("a"), F.col("v").alias("av"),
                           F.col("signature"))
    right = with_sig.select(F.col("id").alias("b"), F.col("v").alias("bv"),
                            F.col("signature"))
    pairs = left.join(right, ["signature"]).filter(F.col("a") < F.col("b"))
    return (pairs
            .withColumn("cosine",
                        _dot(F.col("av"), F.col("bv"))
                        / (F.sqrt(_dot(F.col("av"), F.col("av")))
                           * F.sqrt(_dot(F.col("bv"), F.col("bv")))))
            .filter(F.col("cosine") >= 0.99)
            .select("a", "b", F.round("cosine", 6).alias("cosine")))


def _emb_r2(aug):
    """Round-2 embedding_neardup as shipped (git 4ba3d91): 4 banded
    8-plane signatures as 32 separate aggregate(zip_with(...)) passes,
    capped pairs, per-pair norm recomputation in the verify join."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sigs = [simsearch.hyperplane_signature(aug, 8, 64, "embedding",
                                           seed_offset=b * 8)
            .alias(f"bsig{b}") for b in range(4)]
    with_sig = aug.select(F.col("vec_id").alias("id"), *sigs)
    bands = with_sig.select(
        F.col("id"),
        F.posexplode(F.array(*[F.col(f"bsig{b}") for b in range(4)]))
        .alias("band", "bucket"))
    cands = dedup.capped_bucket_pairs(bands)
    va = aug.select(F.col("vec_id").alias("a"), vec.alias("av"))
    vb = aug.select(F.col("vec_id").alias("b"), vec.alias("bv"))
    return (cands.join(va, "a").join(vb, "b")
            .withColumn("cosine",
                        _dot(F.col("av"), F.col("bv"))
                        / (F.sqrt(_dot(F.col("av"), F.col("av")))
                           * F.sqrt(_dot(F.col("bv"), F.col("bv")))))
            .filter(F.col("cosine") >= 0.99)
            .select("a", "b", F.round("cosine", 6).alias("cosine")))


def _ivf_r1(emb, n_queries=10, k=5, n_cells=16, nprobe=2,
            centroid_offset=100):
    """Round-1 ivf_topk (git e28c1ac~1): broadcast centroid join +
    Window argmax assignment."""
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cents = (emb.filter((F.col("vec_id") >= centroid_offset)
                        & (F.col("vec_id") < centroid_offset + n_cells))
             .select((F.col("vec_id") - centroid_offset).alias("cell"),
                     vec.alias("centv")))
    scored_cells = (emb.select(F.col("vec_id").alias("vid"), vec.alias("v"))
                    .join(F.broadcast(cents))
                    .withColumn("cos_c", _dot(F.col("v"), F.col("centv"))
                                / (F.sqrt(_dot(F.col("v"), F.col("v")))
                                   * F.sqrt(_dot(F.col("centv"),
                                                 F.col("centv"))))))
    w_assign = Window.partitionBy("vid").orderBy(F.col("cos_c").desc(),
                                                 F.col("cell"))
    ranked_cells = scored_cells.withColumn(
        "crank", F.row_number().over(w_assign))
    base = (ranked_cells.filter(F.col("crank") == 1)
            .select(F.col("vid").alias("cid"), F.col("v").alias("cv"),
                    "cell"))
    queries = (ranked_cells.filter((F.col("vid") < n_queries)
                                   & (F.col("crank") <= nprobe))
               .select(F.col("vid").alias("qid"), F.col("v").alias("qv"),
                       "cell"))
    pairs = base.join(F.broadcast(queries), "cell") \
        .filter(F.col("qid") != F.col("cid"))
    scored = _with_cosine_r1(pairs)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("cid").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    aug = entry._aug_emb(spark, args.sf).cache()
    emb = entry._emb(spark, args.sf).cache()
    aug.count(), emb.count()

    forms = {
        "emb_r1": lambda: _emb_r1(aug),
        "emb_r2": lambda: _emb_r2(aug),
        "emb_new": lambda: dedup.embedding_neardup(aug, threshold=0.99),
        "ivf_r1": lambda: _ivf_r1(emb),
        "ivf_r2": lambda: simsearch.ivf_topk(emb, assign="literal"),
        "ivf_new": lambda: simsearch.ivf_topk(emb, assign="arrow"),
        # session-6 A/B (BENCH/BASELINE.md): 16x aggregate(zip_with)
        # expression folds vs one numpy V@S.T per Arrow batch - 7.3x
        # for Arrow at sf1.0, now jl_project's default
        "jl_expr": lambda: simsearch.jl_project(emb, arrow=False),
        "jl_arrow": lambda: simsearch.jl_project(emb, arrow=True),
    }

    # warm the Python worker pool + JIT before timing (bench.py protocol)
    for f in forms.values():
        f().count()

    times: dict = {n: [] for n in forms}
    rows: dict = {}
    for _sweep in range(args.sweeps):
        for name, f in forms.items():       # interleaved: one run each
            t0 = time.perf_counter()
            rows[name] = f().count()
            times[name].append(round(time.perf_counter() - t0, 4))

    out = {
        "sf": args.sf, "cpus": args.cpus, "sweeps": args.sweeps,
        "rows": rows,
        "times": times,
        "medians": {n: round(statistics.median(v), 4)
                    for n, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
