"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
* exact dedup = one hash-groupBy on a 32-char key (map-side partial agg);
* MinHash-LSH = shingle explode -> per-doc min-agg (8 hashes) -> band keys
  -> self-join on band buckets (equi-join, broadcastable band dimension is
  unnecessary: bucket sizes are tiny by construction) -> exact Jaccard
  verification ONLY on candidate pairs. No O(n^2) stage anywhere; the
  verify join is proportional to candidate count.
* SimHash = token x bit-position explode with sign aggregation - one
  shuffle, output is a per-doc 16-bit signature usable as a bucket key.

Hash functions are md5-based so the DuckDB oracle can reproduce every
value bit-for-bit (md5 is identical across engines; no engine-specific
hash() is used anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASHES = 8
BAND_SIZE = 2  # 4 bands of 2 -> candidates need 1 identical band


def normalized_text(text_col):
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(text_col), r"[^a-z0-9 ]", ""), r" +", " "))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, canonical_id=min id, n_dups) for groups of size > 1."""
    keyed = df.select(F.col(id_col),
                      F.md5(normalized_text(F.col(text_col))).alias("fingerprint"))
    return (keyed.groupBy("fingerprint")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count(F.lit(1)).alias("n_dups"))
            .filter(F.col("n_dups") > 1))


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document (w_i .. w_{i+k-1} joined by
    spaces over the normalized text)."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    df2 = df.select(F.col(id_col), words.alias("w"))
    n = F.size("w")
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(F.col("w"), i + j + 1)
                                          for j in range(k)]))
    return (df2.filter(n >= k)
            .select(id_col, F.explode(F.array_distinct(sh)).alias("shingle")))


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """8 md5-minhashes per doc + 4 band keys (2 hashes per band)."""
    aggs = [F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh{s}")
            for s in range(N_MINHASHES)]
    sig = sh.groupBy(id_col).agg(*aggs)
    for b in range(N_MINHASHES // BAND_SIZE):
        cols = [F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)]
        sig = sig.withColumn(f"band{b}", F.md5(F.concat_ws("|", *cols)))
    return sig


MAX_BUCKET_SIZE = 100


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        max_bucket_size: int = MAX_BUCKET_SIZE) -> DataFrame:
    """Distinct (a < b) pairs sharing at least one band bucket.

    Hot-bucket guard: a bucket holding k documents yields k^2/2 pairs, so
    boilerplate-heavy corpora can turn one bucket into the whole job's
    skew. Buckets larger than ``max_bucket_size`` are dropped (standard
    LSH practice - such groups are better served by the exact-fingerprint
    dedup pass); the SQL oracle applies the same cap.

    Physical plan: bucket membership is collected per (band, bucket) - the
    cap bounds each list at ``max_bucket_size`` ids, so this is one
    aggregation + an in-expression pair explode, replacing the naive
    size-count join + bucket self-join + distinct (three shuffles of the
    band table) with a single shuffle."""
    n_bands = N_MINHASHES // BAND_SIZE
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(n_bands)]))
        .alias("band", "bucket"))
    groups = (bands.groupBy("band", "bucket")
              .agg(F.sort_array(F.collect_list("id")).alias("ids"))
              .filter((F.size("ids") >= 2)
                      & (F.size("ids") <= max_bucket_size)))
    pairs = groups.select(F.explode(F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x as a, y as b))))"
    )).alias("p")).select("p.a", "p.b")
    return pairs.distinct()


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH candidates verified with exact shingle-set Jaccard:
    (a, b, jaccard) for pairs >= threshold."""
    sh = shingles(df, id_col, text_col, k).cache()
    cands = lsh_candidate_pairs(minhash_signatures(sh, id_col), id_col)
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (cands.join(sa, "a").join(sb, ["b", "shingle"])
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_inter")))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return (inter
            .join(sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na")), "a")
            .join(sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb")), "b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter")
                                / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def embedding_neardup(emb: DataFrame, threshold: float = 0.9,
                      n_planes: int = 8, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b, cosine) with
    cosine >= threshold.

    Candidates come from hyperplane-LSH buckets (identical signature), so
    the pair space is bucket-local - no O(n^2) stage; exact cosine is then
    verified on candidates only. Near-identical vectors agree on every
    hyperplane sign with high probability, which is exactly the recall
    profile wanted for near-dup removal (genuine misses are vectors near a
    plane - more planes/bands trade recall for candidate volume)."""
    from .simsearch import _dot, hyperplane_signature
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    with_sig = emb.select(F.col(id_col).alias("id"), vec.alias("v"),
                          hyperplane_signature(emb, n_planes, dim, vec_col))
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
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 6).alias("cosine")))


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 16) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over md5-derived token
    hashes. conv(substr(md5,1,4),16,10) gives 16 bits per token; bit b of
    the signature is 1 when the b-th bit is set in more tokens than not."""
    words = F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w")
    tok = df.select(F.col(id_col), words)
    tok = tok.withColumn(
        "h", F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long"))
    pos = tok.select(id_col, "h",
                     F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
    votes = pos.withColumn(
        "v", F.when(F.expr("(h div shiftleft(1L, b)) % 2") == 1, 1)
        .otherwise(-1))
    return (votes.groupBy(id_col, "b")
            .agg(F.sum("v").alias("s"))
            .withColumn("bit", F.when(F.col("s") > 0,
                                      F.expr("shiftleft(1L, b)"))
                        .otherwise(F.lit(0)))
            .groupBy(id_col)
            .agg(F.sum("bit").cast("long").alias("simhash")))
