"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk``: exact cosine top-k for a query subset - the
  correctness baseline. Dot products run JVM-side via
  aggregate(zip_with(..)) inside codegen; no Python.
* ``hyperplane_lsh_topk``: the scale path - random-hyperplane signatures
  (md5-derived deterministic +-1 planes) bucket the corpus so each query
  only scores its own bucket; at 100 TB this replaces the crossJoin with
  an equi-join on the signature. Same output schema.

Ranking output is (query_id, rank, neighbor_id); cosine values are
computed in float64 and gaps between random vectors are >> 1 ulp, so
DuckDB's list-based oracle ranks identically.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _with_cosine(pairs: DataFrame) -> DataFrame:
    qa = F.col("qv")
    ca = F.col("cv")
    return pairs.withColumn(
        "cosine", _dot(qa, ca) / (F.sqrt(_dot(qa, qa)) * F.sqrt(_dot(ca, ca))))


def brute_force_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(query_id, rank, neighbor_id, cosine) - exact top-k by cosine.

    The query side is tiny (n_queries rows) and explicitly broadcast, so
    the 'crossJoin' is really a broadcast nested loop that streams the
    corpus once - the right baseline shape at any scale."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("cid"), vec.alias("cv"))
    queries = (emb.filter(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("qid"), vec.alias("qv")))
    pairs = base.crossJoin(F.broadcast(queries)).filter(F.col("qid") != F.col("cid"))
    scored = _with_cosine(pairs)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("cid").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))


def ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
             n_cells: int = 16, nprobe: int = 2, centroid_offset: int = 100,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k - the other classic ANN scale
    path next to hyperplane LSH.

    A coarse quantizer assigns every vector to its nearest of ``n_cells``
    centroids; a query scores only the vectors in its ``nprobe`` closest
    cells. At scale the corpus is partitioned by cell id, so probing is an
    equi-join on ``cell`` that touches nprobe/n_cells of the data instead
    of a full scan. Centroids are deterministic - the corpus vectors with
    ids [centroid_offset, centroid_offset + n_cells) - so the DuckDB
    oracle reproduces the exact assignment (no k-means iteration; a real
    deployment would train centroids offline and broadcast them the same
    way)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # Centroids are driver-known (a real deployment trains them offline
    # and broadcasts them); this collect is n_cells tiny rows, never the
    # corpus. They become LITERAL array expressions, so the whole cell
    # assignment - n_cells cosines + argmax + nprobe ranking - runs
    # map-side inside codegen: zero joins, zero shuffles, zero row
    # blow-up before the probe join (the earlier formulation joined the
    # corpus against the centroid table, a n_cells-fold row explosion,
    # then shuffled it through a Window to take an argmax).
    cent_rows = sorted(
        (r.cell, [float(x) for x in r.centv])
        for r in emb.filter((F.col(id_col) >= centroid_offset)
                            & (F.col(id_col) < centroid_offset + n_cells))
        .select((F.col(id_col) - centroid_offset).alias("cell"),
                vec.alias("centv")).collect())
    import math
    norm_v = F.sqrt(_dot(F.col("v"), F.col("v")))
    cos_exprs = []
    for _cell, cv in cent_rows:
        cnorm = math.sqrt(sum(x * x for x in cv))
        cent = F.array(*[F.lit(x) for x in cv])
        # nanvl: a zero-norm vector or centroid yields NaN cosine; rank
        # it LAST (-1) deterministically. (NaN sorts greatest in an ORDER
        # BY but smallest-last in the (-c, cell) struct array_sort, so
        # without the guard degenerate inputs would assign differently
        # than a Window-based formulation.)
        cos_exprs.append(F.nanvl(
            _dot(F.col("v"), cent) / (norm_v * F.lit(cnorm)), F.lit(-1.0)))
    scored = (emb.select(F.col(id_col).alias("vid"), vec.alias("v"))
              .withColumn("coses", F.array(*cos_exprs)))
    # cells ordered by (cosine desc, cell asc): sort (-cos, cell) structs
    # ascending; ties break to the lowest cell exactly as the SQL oracle's
    # row_number() ORDER BY cos_c DESC, cell.
    assigned = scored.withColumn("cellrank", F.expr(
        "transform(array_sort(transform(coses, (c, i) -> "
        "struct(-c as negc, i as cell))), s -> s.cell)")).drop("coses")
    base = assigned.select(F.col("vid").alias("cid"), F.col("v").alias("cv"),
                           F.element_at("cellrank", 1).alias("cell"))
    queries = (assigned.filter(F.col("vid") < n_queries)
               .select(F.col("vid").alias("qid"), F.col("v").alias("qv"),
                       F.explode(F.slice("cellrank", 1, nprobe))
                       .alias("cell")))
    pairs = base.join(F.broadcast(queries), "cell") \
        .filter(F.col("qid") != F.col("cid"))
    scored = _with_cosine(pairs)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("cid").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))


def _plane(seed: int, dim: int) -> list:
    """Deterministic +-1 hyperplane from md5(seed:i)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
    return out


def hyperplane_signature(emb: DataFrame, n_planes: int = 8, dim: int = 64,
                         vec_col: str = "embedding", seed_offset: int = 0):
    """n_planes-bit signature; plane p uses md5 seed ``seed_offset + p``
    (the offset gives banded LSH schemes independent plane sets)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _plane(seed_offset + p, dim)])
        bit = F.when(_dot(vec, plane) > 0,
                     F.shiftleft(F.lit(1), p)).otherwise(0)
        sig = sig + bit
    return sig.alias("signature")


def hyperplane_lsh_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
                        n_planes: int = 8, dim: int = 64,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (equi-join on the signature instead of a full scan per query)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    with_sig = emb.select(F.col(id_col), vec.alias("v"),
                          hyperplane_signature(emb, n_planes, dim, vec_col))
    base = with_sig.select(F.col(id_col).alias("cid"), F.col("v").alias("cv"),
                           F.col("signature").alias("csig"))
    queries = (with_sig.filter(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("qid"), F.col("v").alias("qv"),
                       F.col("signature").alias("qsig")))
    pairs = base.join(F.broadcast(queries),
                      (F.col("qsig") == F.col("csig"))
                      & (F.col("qid") != F.col("cid")))
    scored = _with_cosine(pairs)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("rank").cast("long").alias("rank"),
                    F.col("cid").alias("neighbor_id"),
                    F.round("cosine", 6).alias("cosine")))
