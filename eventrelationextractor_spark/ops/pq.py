"""Product quantization + IVF-PQ approximate nearest neighbor (Jegou et
al. 2011, "Product quantization for nearest neighbor search") - the
standard billion-scale ANN index shape: a coarse IVF partitioner prunes
the scan to ``nprobe`` cells, and an M-subspace product code compresses
every stored vector to M small ints, scanned via an Asymmetric Distance
Computation (ADC) lookup table built once per query.

Why this is THE 100-TB shape: the stored side never ships floats - a
64-dim float32 vector becomes M=4 uint8 codes (64x smaller), the probe
join moves only (id, cell, codes), and the per-candidate distance is M
table lookups in pure codegen (no Python, no vector arithmetic on the
big side). Every expensive step is map-side against driver-known
literals (the IVF literal-centroid pattern, ops/simsearch.py).

Scale plan, stage by stage:
* train (once, driver-known result): M fixed-iteration Lloyd fits over
  subvector slices - reuses ops/cluster.py assign/update (Arrow argmin
  + partial-agg mean); codebooks are tiny (M * k_sub * sub_dim floats).
* encode: ONE Arrow pass, argmin per subspace against broadcast-free
  driver literals -> (id, codes), no shuffle.
* query: ADC tables (M * k_sub distances) are computed per query in one
  Arrow pass over the tiny query side; candidates = equi-join on the
  coarse cell (broadcast: queries x nprobe rows); the per-candidate
  distance is sum of M element_at lookups - whole-stage codegen.
* top-k: rank on the 6dp-ROUNDED distance (the bm25 lesson: full-
  precision float ordering is sensitive to partial-agg merge order
  across engines), neighbor id tie-break, WindowGroupLimit pushdown.

No counterpart in /root/reference (no vector surface there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train(emb: DataFrame, m: int = 4, k_sub: int = 16,
             n_iter: int = 1, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding") -> list:
    """Train per-subspace codebooks: ``books[b][c]`` = centroid c of
    subspace b (a sub_dim-length float list). Deterministic init =
    the subvectors of ids [0, k_sub) (the kmeans_fit convention), then
    ``n_iter`` Lloyd rounds per subspace. Returns driver-known plain
    lists - index metadata, like IVF centroids."""
    from .cluster import _update_centroids, assign_clusters
    sub_dim = dim // m
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    books = []
    for b in range(m):
        sub = emb.select(F.col(id_col),
                         F.slice(vec, b * sub_dim + 1, sub_dim)
                         .alias("sub"))
        cents = [
            [float(x) for x in r.v] for r in
            sorted(sub.filter(F.col(id_col) < k_sub)
                   .select(F.col(id_col).alias("i"),
                           F.col("sub").alias("v")).collect(),
                   key=lambda r: r.i)]
        if len(cents) != k_sub:
            raise ValueError(f"need ids [0, {k_sub}) for deterministic "
                             f"init; found {len(cents)}")
        for _ in range(n_iter):
            assigned = assign_clusters(sub, cents, id_col, "sub")
            cents = _update_centroids(assigned, cents)
        books.append(cents)
    return books


def pq_encode(emb: DataFrame, books: list, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes): per-vector product codes, ``codes[b]`` = argmin
    squared distance of subvector b to ``books[b]`` (first-min /
    lowest-code tie break, matching the SQL oracle's ORDER BY dist,
    code LIMIT 1). One Arrow pass, no shuffle."""
    import numpy as np
    import pandas as pd

    B = [np.asarray(bk, dtype=np.float64) for bk in books]   # (k_sub, sd)
    m = len(B)
    sub_dim = B[0].shape[1]

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for b in range(m):
                S = V[:, b * sub_dim:(b + 1) * sub_dim]
                Cb = B[b]
                d = ((Cb * Cb).sum(axis=1)[None, :]
                     - 2.0 * (S @ Cb.T))                  # + ||s||^2 const
                codes[:, b] = np.argmin(d, axis=1)        # first min wins
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "codes": list(codes)})

    return emb.select(F.col(id_col), vec_col) \
        .mapInPandas(gen, f"{id_col} long, codes array<int>")


def _adc_tables(queries: DataFrame, books: list, id_col: str = "vec_id",
                vec_col: str = "v") -> DataFrame:
    """(qid, qtab): per-query flattened ADC lookup table,
    ``qtab[b * k_sub + c]`` = squared distance of query subvector b to
    codebook entry (b, c). One Arrow pass over the (tiny) query side."""
    import numpy as np
    import pandas as pd

    B = [np.asarray(bk, dtype=np.float64) for bk in books]
    m = len(B)
    k_sub = B[0].shape[0]
    sub_dim = B[0].shape[1]

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            tabs = np.empty((len(pdf), m * k_sub))
            for b in range(m):
                S = V[:, b * sub_dim:(b + 1) * sub_dim]   # (n, sd)
                diff = S[:, None, :] - B[b][None, :, :]   # (n, k_sub, sd)
                tabs[:, b * k_sub:(b + 1) * k_sub] = (diff * diff).sum(-1)
            yield pd.DataFrame({"qid": pdf[id_col].to_numpy(),
                                "qtab": list(tabs)})

    return queries.select(F.col(id_col), vec_col) \
        .mapInPandas(gen, "qid long, qtab array<double>")


def ivfpq_topk(emb: DataFrame, n_queries: int = 10, k: int = 5,
               coarse_k: int = 8, coarse_iter: int = 1, m: int = 4,
               k_sub: int = 16, nprobe: int = 2, dim: int = 64,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ top-k: coarse k-means cells prune the scan to ``nprobe``
    cells per query; candidates are scored by ADC over the product
    codes -> (query_id, rank, neighbor_id, adc_dist). Queries = ids
    [0, n_queries), self excluded.

    The per-candidate cost after the cell join is M element_at lookups
    + a sum in whole-stage codegen: the stored side never ships a
    float vector. Approximate by construction (coarse pruning + code
    quantization); the oracle replays the identical index, not an
    exact-search reference."""
    from .cluster import kmeans_fit
    coarse_cents, coarse_assign = kmeans_fit(
        emb, k=coarse_k, n_iter=coarse_iter, id_col=id_col,
        vec_col=vec_col)
    books = pq_train(emb, m=m, k_sub=k_sub, dim=dim,
                     id_col=id_col, vec_col=vec_col)
    enc = pq_encode(emb, books, id_col, vec_col) \
        .join(coarse_assign.withColumnRenamed("vec_id", id_col), id_col)

    import numpy as np
    C = np.asarray(coarse_cents, dtype=np.float64)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    queries = emb.filter(F.col(id_col) < n_queries) \
        .select(F.col(id_col), vec.alias("v"))
    qtabs = _adc_tables(queries, books, id_col, "v")

    # probe cells per query: nprobe nearest coarse centroids, computed
    # in the same Arrow pass shape (query side is tiny)
    import pandas as pd

    def probes(batches):
        Csq = (C * C).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["v"]])
            d = Csq[None, :] - 2.0 * (V @ C.T)
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "qid": np.repeat(ids, nprobe),
                "probe_cell": order.reshape(-1).astype(np.int64)})

    qprobe = queries.mapInPandas(probes, "qid long, probe_cell long") \
        .join(qtabs, "qid")

    pairs = enc.join(F.broadcast(qprobe),
                     (F.col("cluster") == F.col("probe_cell"))
                     & (F.col(id_col) != F.col("qid")))
    dist = None
    for b in range(m):
        term = F.element_at(
            F.col("qtab"),
            (F.lit(b * k_sub) + F.element_at("codes", b + 1) + 1)
            .cast("int"))
        dist = term if dist is None else dist + term
    scored = pairs.select(F.col("qid").alias("query_id"),
                          F.col(id_col).alias("neighbor_id"),
                          F.round(dist, 6).alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "neighbor_id", "adc_dist"))


def ivfpq_recall(emb: DataFrame, n_queries: int = 10, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 **index_params) -> DataFrame:
    """Recall@k of the IVF-PQ index against the EXACT squared-L2 top-k
    -> (query_id, n_hits, recall). The acceptance telemetry for any
    compressed index: ``quantize_int8.sse`` and this number together
    say whether a 16x cheaper scan still returns the right neighbors
    (run it on a sampled query set before switching the corpus over).

    The exact side is the broadcast-queries scan (one pass over the
    corpus, like brute_force_topk) ranked on the 6dp-rounded distance
    with id tie-break - the same determinism contract as the
    approximate side, so recall is reproducible across engines."""
    approx = ivfpq_topk(emb, n_queries=n_queries, k=k, id_col=id_col,
                        vec_col=vec_col, **index_params)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col).alias("cid"), vec.alias("cv"))
    queries = emb.filter(F.col(id_col) < n_queries) \
        .select(F.col(id_col).alias("qid"), vec.alias("qv"))
    d = F.aggregate(F.zip_with("qv", "cv",
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)
    pairs = (base.crossJoin(F.broadcast(queries))
             .filter(F.col("qid") != F.col("cid"))
             .select("qid", "cid", F.round(d, 6).alias("d")))
    w = Window.partitionBy("qid").orderBy(F.col("d"), F.col("cid"))
    exact = (pairs.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= k).select("qid", "cid"))
    hits = (exact.join(approx,
                       (approx.query_id == exact.qid)
                       & (approx.neighbor_id == exact.cid))
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n")))
    qids = queries.select(F.col("qid").alias("query_id"))
    return (qids.join(hits, qids.query_id == hits.qid, "left")
            .select("query_id",
                    F.coalesce("n", F.lit(0)).alias("n_hits"),
                    F.round(F.coalesce("n", F.lit(0)) / F.lit(float(k)), 6)
                    .alias("recall")))
