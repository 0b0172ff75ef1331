"""BM25 keyword search over the documents table - the lexical
counterpart to ops/simsearch.py's embedding ANN. A training-data
pipeline uses it for targeted corpus slicing ("all docs about X"),
relevance-weighted sampling, and benchmark-leak triage beyond exact
n-gram decontamination.

Scoring is the Lucene/Robertson BM25 formulation:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape:

* Tokenize + explode is narrow (no shuffle); the broadcast semi-join
  against the query-term dimension drops every non-query token BEFORE
  anything wide happens, so the tf shuffle carries only matching
  (doc, term) rows - for a handful of query terms that is a vanishing
  fraction of the corpus at any size.
* Document lengths are one partial-aggregated count shuffle; corpus
  scalars (N, avgdl) and per-term df/idf ride along as broadcast joins
  (1 row / n_terms rows), never a driver collect.
* Top-k is a single global WindowGroupLimit over per-doc scores -
  k rows survive per partition before the final exchange.

Tokenizer contract (mirrored by the DuckDB oracle): lowercase, split
on runs of [^a-z0-9], drop empties. Scores round to 6 decimals; ties
rank by doc_id ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(doc_id, term): one row per token occurrence."""
    terms = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(terms, lambda t: t != "")).alias("term"))


def bm25_topk(docs: DataFrame, query_terms: list, k: int = 20,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(rank, doc_id, score): top-k documents for a bag of query terms.

    Only documents containing at least one query term are candidates
    (a BM25 score of 0 is not a retrieval)."""
    spark = docs.sparkSession
    toks = tokenize(docs, id_col, text_col)
    qt = spark.createDataFrame([(t,) for t in query_terms], "term string")

    # per-doc length + corpus scalars (broadcast single-row dimension)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.avg("dl").alias("avgdl"))

    # term frequencies for query terms only (broadcast semi-join first)
    tf = (toks.join(F.broadcast(qt), "term")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (tf
              .join(F.broadcast(df_), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", F.log(
                  F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)))
              .withColumn("part", F.col("idf") * F.col("tf") * (k1 + 1.0)
                          / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                                 / F.col("avgdl"))))
              .groupBy("doc_id")
              .agg(F.round(F.sum("part"), 6).alias("score")))
    # rank by the ROUNDED score: the raw sum's last ulp depends on the
    # partial-aggregation merge order (run-dependent), so full-precision
    # ordering would let near-identical scores swap ranks between runs;
    # at the emitted precision the ordering is deterministic.
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("rank").cast("long").alias("rank"), "doc_id",
                    "score"))


def top_terms(docs: DataFrame, k: int = 50, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(rank, term, n): the corpus's k most frequent terms - vocabulary
    seeding for the unigram LM / tokenizer training / stopword lists.

    orderBy().limit(k) compiles to TakeOrderedAndProject: a distributed
    per-partition top-k merge, NOT a single-partition global sort - the
    only full-width stage is the partial-aggregated term count. The
    row_number window then ranks just the k survivors."""
    counts = (tokenize(docs, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("n")))
    top = counts.orderBy(F.col("n").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")) \
        .select("rank", "term", "n")


def posting_list_sizes(docs: DataFrame, k: int = 30,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Delta-gap varint index sizing - the storage-planning op an
    inverted-index build runs BEFORE materializing postings: per term,
    the byte cost of the posting list under the standard
    delta-gap + LEB128-varint layout (Lucene/PForDelta-family
    baseline). -> top-k terms by (bytes desc, term asc):
    (rank, term, df, bytes, bytes_per_posting_ppm).

    The gap for a term's first posting is the doc id itself; later
    gaps are id - previous id over the ascending-id posting order.
    Varint width is the exact integer staircase 1 + [gap>=2^7] +
    [gap>=2^14] + [gap>=2^21] + [gap>=2^28] - no float log anywhere,
    so the cross-engine hash is arithmetic-exact.

    Scale shape: DISTINCT (term, doc) -> one window per term (postings
    of one term co-locate by the index's own layout) -> partial-agg
    sum -> TakeOrderedAndProject top-k. The full-width stage is the
    posting dedup; everything after is per-term-sized."""
    postings = tokenize(docs, id_col, text_col).distinct()
    w = Window.partitionBy("term").orderBy("doc_id")
    gap = F.col("doc_id") - F.coalesce(
        F.lag("doc_id").over(w), F.lit(0).cast("long"))
    nbytes = (F.lit(1).cast("long")
              + (gap >= (1 << 7)).cast("long")
              + (gap >= (1 << 14)).cast("long")
              + (gap >= (1 << 21)).cast("long")
              + (gap >= (1 << 28)).cast("long"))
    sized = (postings.withColumn("nb", nbytes)
             .groupBy("term")
             .agg(F.count("*").alias("df"),
                  F.sum("nb").alias("bytes")))
    top = sized.orderBy(F.col("bytes").desc(), F.col("term")).limit(k)
    rw = Window.orderBy(F.col("bytes").desc(), F.col("term"))
    return (top.withColumn("rank", F.row_number().over(rw).cast("long"))
            .select("rank", "term", "df", "bytes",
                    F.expr("(1000000 * bytes) div df")
                    .alias("bytes_per_posting_ppm")))


def prefix_completions(docs: DataFrame, min_len: int = 2,
                       max_len: int = 4, per_prefix: int = 3,
                       min_count: int = 5, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Query-autocompletion index: for every term prefix of length
    ``min_len..max_len``, the ``per_prefix`` most frequent completing
    terms -> (prefix, rank, term, n). The suggest-as-you-type
    dictionary of a search frontend, built corpus-side.

    Ties break (n desc, term asc); prefixes whose BEST completion has
    n < ``min_count`` are dropped (a suggestion nobody typed is
    noise). Scale shape: term counts reduce the corpus to vocabulary
    cardinality FIRST (partial-agg), then the prefix explode runs at
    vocab scale (<= max_len-min_len+1 rows per term), then one window
    per prefix ranks a handful of candidates - the corpus-sized stage
    never sees a prefix row."""
    counts = (tokenize(docs, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("n")))
    lens = list(range(int(min_len), int(max_len) + 1))
    pref = (counts
            .filter(F.length("term") >= int(min_len))
            .select("term", "n", F.explode(F.array(
                *[F.when(F.length("term") >= p,
                         F.substring("term", 1, p)) for p in lens]))
                .alias("prefix"))
            .filter(F.col("prefix").isNotNull()))
    w = Window.partitionBy("prefix").orderBy(
        F.col("n").desc(), F.col("term"))
    return (pref.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= int(per_prefix))
            .withColumn("best", F.max(F.col("n")).over(
                Window.partitionBy("prefix")))
            .filter(F.col("best") >= int(min_count))
            .select("prefix", "rank", "term", "n"))


def ltr_features(docs: DataFrame, query_terms: list,
                 k1: float = 1.2, b: float = 0.75,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Learning-to-rank feature extraction - the labeled-example
    generator feeding every LTR trainer (LambdaMART et al.): for each
    document matching >= 1 query term, the standard lexical feature
    vector -> (doc_id, n_matched, sum_tf, min_tf, max_tf, doc_len,
    min_df, max_df, bm25). Counts/lengths are exact integers; bm25 is
    the 6dp-rounded score shared with ``bm25_topk``'s formulation so
    the ranker feature and the ranker agree.

    Scale shape: identical join geometry to bm25_topk - broadcast
    query-term semi-join BEFORE any shuffle (the corpus-sized scan
    only keeps matching postings), term df + corpus stats as broadcast
    dimensions, ONE partial-agg groupBy per doc. No top-k cut: LTR
    wants every candidate, and the output is bounded by the matching
    set, not the corpus."""
    spark = docs.sparkSession
    toks = tokenize(docs, id_col, text_col)
    qt = spark.createDataFrame([(t,) for t in query_terms], "term string")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("doc_len"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.avg("doc_len").alias("avgdl"))
    tf = (toks.join(F.broadcast(qt), "term")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (tf
            .join(F.broadcast(df_), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .withColumn("idf", F.log(
                F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)))
            .withColumn("part", F.col("idf") * F.col("tf") * (k1 + 1.0)
                        / (F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len")
                                               / F.col("avgdl"))))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matched"),
                 F.sum("tf").alias("sum_tf"),
                 F.min("tf").alias("min_tf"),
                 F.max("tf").alias("max_tf"),
                 F.first("doc_len").alias("doc_len"),
                 F.min("df").alias("min_df"),
                 F.max("df").alias("max_df"),
                 F.round(F.sum("part"), 6).alias("bm25")))


def ndcg_at_k(results: DataFrame, judgments: DataFrame, k: int = 25,
              rank_col: str = "rank", id_col: str = "doc_id",
              rel_col: str = "rel") -> DataFrame:
    """nDCG@k of a ranked result list against graded relevance
    judgments -> ONE row (k, dcg, idcg, ndcg). The standard retrieval-
    quality acceptance metric (Jarvelin & Kekalainen 2002, exponential
    gain): run it whenever the index changes (BM25 parameter sweeps,
    switching to the PQ index, pruning the corpus) to see whether
    ranking quality moved.

    DCG = sum over returned ranks of (2^rel - 1) / log2(rank + 1);
    IDCG = the same discount over the ideal ordering (rel DESC, id ASC
    tie-break - deterministic, mirrored by the oracle). Unjudged
    returned docs count rel 0. Scale shape: one broadcast-sized join
    (results are top-k), one global top-k over the POSITIVE judgments
    only (rel > 0 filter precedes the window, so the ideal ranking
    never sorts the corpus), two scalar aggregates.

    Judgments are aggregated to one row per doc (max rel) first:
    duplicate judgment rows would otherwise fan out the DCG join
    (double-counting a returned doc) and occupy multiple ideal ranks in
    IDCG - both skew the metric silently."""
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(rank_col).alias("rnk"), F.col(id_col).alias("rid"))
    j = (judgments.select(F.col(id_col).alias("rid"),
                          F.col(rel_col).alias("rel"))
         .groupBy("rid").agg(F.max("rel").alias("rel")))
    gain = (F.pow(F.lit(2.0), F.coalesce("rel", F.lit(0)).cast("double"))
            - 1.0) / F.log2(F.col("rnk") + 1.0)
    dcg = (res.join(j, "rid", "left")
           .agg(F.coalesce(F.sum(gain), F.lit(0.0)).alias("dcg")))
    w = Window.orderBy(F.col("rel").desc(), F.col("rid"))
    igain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0) \
        / F.log2(F.col("irnk") + 1.0)
    idcg = (j.filter(F.col("rel") > 0)
            .withColumn("irnk", F.row_number().over(w))
            .filter(F.col("irnk") <= k)
            .agg(F.coalesce(F.sum(igain), F.lit(0.0)).alias("idcg")))
    return (dcg.crossJoin(idcg)
            .select(F.lit(k).cast("long").alias("k"),
                    F.round("dcg", 6).alias("dcg"),
                    F.round("idcg", 6).alias("idcg"),
                    F.round(F.when(F.col("idcg") > 0,
                                   F.col("dcg") / F.col("idcg"))
                            .otherwise(F.lit(0.0)), 6).alias("ndcg")))


def _lcm_upto(k: int) -> int:
    """lcm(1..k) - the common denominator that turns every 1/rank and
    precision@rank term into an exact integer (k=25 -> 26,771,144,400,
    comfortably inside int64 even after the cumulative-hit multiply)."""
    from math import gcd
    out = 1
    for i in range(2, k + 1):
        out = out * i // gcd(out, i)
    return out


def map_mrr_at_k(results: DataFrame, judgments: DataFrame, k: int = 25,
                 rank_col: str = "rank", id_col: str = "doc_id",
                 rel_col: str = "rel") -> DataFrame:
    """AP@k / MRR / recall@k of a ranked run against binary relevance
    (rel > 0) -> ONE row (k, n_rel, n_hits, first_rank, ap, mrr,
    recall). The binary-relevance companions to ndcg_at_k: MRR grades
    known-item search, AP grades the whole ranking, recall@k grades
    candidate-generation budgets (e.g. is the ANN recall stage feeding
    the reranker enough positives).

    Exactness contract: AP is a sum of hits_so_far/rank rationals whose
    denominators all divide lcm(1..k), so the sum is computed as an
    exact INTEGER in lcm-scaled units and divided exactly once at the
    end - the money-in-cents lesson applied to rank reciprocals; a
    float sum here would depend on partial-aggregation merge order.
    MRR and recall are single divisions of exact integers. Judgments
    are deduped to max(rel) per doc first (the ndcg fan-out lesson).

    Scale shape: the run is top-k (broadcast-sized); the only
    corpus-scale work is the judgment dedup groupBy. The hit window
    orders <= k rows."""
    lcm = _lcm_upto(k)
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(rank_col).cast("long").alias("rnk"),
        F.col(id_col).alias("rid"))
    j = (judgments.select(F.col(id_col).alias("rid"),
                          F.col(rel_col).alias("rel"))
         .groupBy("rid").agg(F.max("rel").alias("rel")))
    relevant = j.filter(F.col("rel") > 0).select("rid")
    n_rel = relevant.agg(F.count(F.lit(1)).alias("n_rel"))
    w = Window.orderBy("rnk")
    hits = (res.join(relevant, "rid")
            .withColumn("hsf", F.row_number().over(w).cast("long")))
    aggd = hits.agg(
        F.coalesce(F.sum(F.expr(f"({lcm} div rnk) * hsf")),
                   F.lit(0)).cast("long").alias("ap_num"),
        F.count(F.lit(1)).alias("n_hits"),
        F.coalesce(F.min("rnk"), F.lit(0)).cast("long").alias("first_rank"))
    return (aggd.crossJoin(n_rel)
            .select(
                F.lit(k).cast("long").alias("k"),
                F.col("n_rel").cast("long").alias("n_rel"),
                F.col("n_hits").cast("long").alias("n_hits"),
                "first_rank",
                F.round(F.when(
                    F.least(F.col("n_rel"), F.lit(k)) > 0,
                    F.col("ap_num").cast("double")
                    / (F.lit(float(lcm))
                       * F.least(F.col("n_rel"), F.lit(k)).cast("double")))
                    .otherwise(F.lit(0.0)), 6).alias("ap"),
                F.round(F.when(F.col("first_rank") > 0,
                               F.lit(1.0) / F.col("first_rank"))
                        .otherwise(F.lit(0.0)), 6).alias("mrr"),
                F.round(F.when(F.col("n_rel") > 0,
                               F.col("n_hits").cast("double")
                               / F.col("n_rel"))
                        .otherwise(F.lit(0.0)), 6).alias("recall")))


def rrf_fuse(rankings: list, k_rrf: int = 60, topk: int = 20,
             id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of N ranked retrieval lists -> (rank, doc_id, rrf_score, n_lists).

    The production hybrid-retrieval combiner: fuse a lexical BM25 list
    with a dense embedding list (or any mix of rankers) without score
    calibration - only RANKS matter, so the rankers' incomparable score
    scales never touch each other.

    Determinism contract: the textbook 1/(k+r) contribution is a float
    whose SUM depends on partial-aggregation merge order once a doc
    appears in 3+ lists. Contributions here are exact integers instead
    - 1e9 div (k_rrf + rank) - summed losslessly in any merge order and
    divided back once at the end, and the final ranking orders on the
    exact integer sum + id tie-break. Same playbook as the integer-
    cents TPC-H money arithmetic; floor(1e9/x) loses <1e-9 of the
    textbook value per term, far below any ranking-relevant gap.

    Scale shape: each input is a top-k list (broadcast-sized by
    construction); the union + one partial-agged groupBy + one global
    WindowGroupLimit is the whole plan. Fusing D docs across N lists
    shuffles at most N*k rows regardless of corpus size."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = F.expr(f"1000000000L div ({int(k_rrf)} + rank)")
    tagged = [r.select(F.col(id_col).alias("doc_id"),
                       F.col(rank_col).cast("long").alias("rank"))
              for r in rankings]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = (u.select("doc_id", contrib.alias("c_ppb"))
             .groupBy("doc_id")
             .agg(F.sum("c_ppb").alias("s_ppb"),
                  F.count(F.lit(1)).alias("n_lists")))
    w = Window.orderBy(F.col("s_ppb").desc(), F.col("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select(F.col("rank").cast("long").alias("rank"), "doc_id",
                    (F.col("s_ppb") / 1e9).alias("rrf_score"),
                    "n_lists"))


def rm3_expand(docs: DataFrame, query_terms: list, fb_docs: int = 10,
               fb_terms: int = 15, orig_weight: float = 0.6,
               k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko &
    Croft relevance models, the Anserini/Galago default): run BM25,
    treat the top ``fb_docs`` results as pseudo-relevant, estimate the
    relevance model P(t|R) = sum_d P(t|d) * w(d) with w(d) = the doc's
    normalized (6dp-rounded) BM25 score and P(t|d) = tf/dl, then
    interpolate with the uniform original-query model:

        weight(t) = orig_weight * P(t|Q) + (1-orig_weight) * P(t|R)

    and keep the ``fb_terms`` heaviest terms - the expanded weighted
    query for a second retrieval pass. ``query_terms`` must be unique.

    Scale shape: the first pass is :func:`bm25_topk` (broadcast query
    dim, one tf shuffle); the feedback side then touches ONLY the
    fb_docs survivors' tokens (join against the broadcast top-k), so
    the expansion stage costs O(fb_docs x doc length) regardless of
    corpus size. Weights round to 6dp and rank ties break by term -
    the float-ranking determinism contract every ranked surface here
    follows.

    Returns (rank, term, weight)."""
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be unique")
    spark = docs.sparkSession
    top = bm25_topk(docs, query_terms, k=fb_docs, k1=k1, b=b,
                    id_col=id_col, text_col=text_col) \
        .select("doc_id", "score")
    total = top.agg(F.sum("score").alias("total"))
    toks = tokenize(docs, id_col, text_col)
    fb = toks.join(F.broadcast(top), "doc_id")
    dl = fb.groupBy("doc_id", "score") \
        .agg(F.count("*").alias("dl"))
    tf = fb.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    p_rel = (tf.join(F.broadcast(dl), "doc_id")
             .crossJoin(F.broadcast(total))
             .groupBy("term")
             .agg(F.sum((F.col("tf") / F.col("dl"))
                        * (F.col("score") / F.col("total")))
                  .alias("p_rel")))
    qm = spark.createDataFrame(
        [(t, 1.0 / len(query_terms)) for t in query_terms],
        "term string, p_q double")
    merged = (p_rel.join(qm, "term", "full_outer")
              .select("term",
                      (F.lit(orig_weight) * F.coalesce("p_q", F.lit(0.0))
                       + F.lit(1.0 - orig_weight)
                       * F.coalesce("p_rel", F.lit(0.0))).alias("w")))
    ranked = merged.select("term", F.round("w", 6).alias("weight")) \
        .orderBy(F.col("weight").desc(), F.col("term")).limit(fb_terms)
    w = Window.orderBy(F.col("weight").desc(), F.col("term"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("long")) \
        .select("rank", "term", "weight")


def bm25_topk_weighted(docs: DataFrame, weighted_terms: DataFrame,
                       k: int = 20, k1: float = 1.2, b: float = 0.75,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Weighted-query BM25 - the second retrieval pass after
    :func:`rm3_expand`: identical scoring to :func:`bm25_topk` but each
    term's contribution is scaled by its query weight (an RM3 expansion
    weight, a user boost, a synonym discount).

    ``weighted_terms`` is (term, weight) - a handful of rows, broadcast
    exactly like the unweighted query dimension, so the scale shape is
    unchanged: the weight rides the same semi-join that drops
    non-query tokens before anything wide. Scores round to 6dp, ties
    rank by doc_id."""
    toks = tokenize(docs, id_col, text_col)
    qt = weighted_terms.select(F.col(weighted_terms.columns[0])
                               .alias("term"),
                               F.col(weighted_terms.columns[1])
                               .cast("double").alias("qw"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    tf = (toks.join(F.broadcast(qt), "term")
          .groupBy("doc_id", "term", "qw").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf
              .join(F.broadcast(df_), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf", F.log(
                  F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)))
              .withColumn("part", F.col("qw") * F.col("idf") * F.col("tf")
                          * (k1 + 1.0)
                          / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                                 / F.col("avgdl"))))
              .groupBy("doc_id")
              .agg(F.round(F.sum("part"), 6).alias("score")))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("rank").cast("long").alias("rank"), "doc_id",
                    "score"))


def vocab_growth(docs: DataFrame, n_checkpoints: int = 10,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Heaps-law vocabulary-growth curve -> (checkpoint, boundary_id,
    new_terms, vocab): distinct vocabulary size after each slice of
    the id space. Sublinear growth is the healthy shape; a kink up
    signals an encoding break or a new junk source entering the crawl,
    a plateau signals the corpus re-crawling itself - cheap corpus
    telemetry next to hll_vocab's single total.

    Scale shape: first-sighting doc per term (one vocab-cardinality
    groupBy), bucket by VALUE-based id checkpoints (min + k*(range/K),
    exact integers - no doc ranking, so nothing ever sorts or windows
    over doc cardinality), then a cumulative window over the K
    checkpoint rows only."""
    toks = tokenize(docs, id_col, text_col)
    first = toks.groupBy("term").agg(
        F.min(F.col(id_col).cast("long")).alias("first_id"))
    rng = docs.agg(F.min(F.col(id_col).cast("long")).alias("lo"),
                   F.max(F.col(id_col).cast("long")).alias("hi"))
    k = int(n_checkpoints)
    # checkpoint c covers first_id in [lo + (c-1)*span, lo + c*span)
    # with span = ceil((hi - lo + 1) / k); the last bucket absorbs the
    # remainder.
    bucketed = (first.crossJoin(F.broadcast(rng))
                .select(F.least(
                    F.lit(k),
                    F.expr(f"1 + ((first_id - lo) div "
                           f"(((hi - lo + 1) + {k} - 1) div {k}))"))
                    .alias("checkpoint"),
                    "lo", "hi"))
    counts = bucketed.groupBy("checkpoint", "lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("new_terms"))
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (counts
            .withColumn("boundary_id",
                        F.least(
                            F.col("hi"),
                            F.col("lo") + F.col("checkpoint")
                            * F.expr(f"((hi - lo + 1) + {k} - 1) div {k}")
                            - 1).cast("long"))
            .withColumn("vocab", F.sum("new_terms").over(w).cast("long"))
            .select(F.col("checkpoint").cast("long").alias("checkpoint"),
                    "boundary_id", "new_terms", "vocab"))


def positional_index(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term): the positional inverted-index rows —
    ``tokenize`` plus the 0-based token offset within the document's
    filtered token stream. At 100 TB this is the table you materialize
    ONCE (bucketed by term) so phrase queries never rescan text."""
    terms = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(terms).alias("pos", "term"))


def phrase_search(docs: DataFrame, phrase: list, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact-phrase search via the positional index (the Lucene
    PhraseQuery plan, distributed) -> (doc_id, n_matches, first_pos)
    per matching document. A k-token phrase matches at anchor a when
    token i sits at position a+i for ALL i — so each phrase term's
    postings shift by -i onto a common anchor and one groupBy counts
    distinct satisfied offsets (count(distinct i) = k). Repeated
    phrase tokens ("table table") are handled by the distinct-offset
    count, the classic phrase-query subtlety.

    Scale shape: the (term, i) offsets are a <= k-row broadcast; the
    postings side selects ONLY the phrase's terms (predicate pushdown
    into the index scan when ``positional_index`` is materialized),
    then one partial-agged groupBy on (doc, anchor) and one per-doc
    rollup — no window, no self-join chain growing with k, no text
    rescan at query time."""
    if not phrase:
        raise ValueError("phrase must have at least one token")
    k = len(phrase)
    spark = docs.sparkSession
    offs = spark.createDataFrame(
        [(str(t), i) for i, t in enumerate(phrase)], "term string, i int")
    idx = positional_index(docs, id_col, text_col)
    anchored = (idx.join(F.broadcast(offs), "term")
                .select("doc_id", (F.col("pos") - F.col("i"))
                        .alias("anchor"), "i")
                .filter(F.col("anchor") >= 0))
    starts = (anchored.groupBy("doc_id", "anchor")
              .agg(F.countDistinct("i").alias("hit"))
              .filter(F.col("hit") == k))
    return (starts.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
                 F.min("anchor").cast("long").alias("first_pos")))


def min_span_proximity(docs: DataFrame, terms: list,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Minimal-window proximity ranking (the Clarke/Cormack ``min
    cover`` statistic; Lucene SpanNearQuery's scoring primitive) ->
    one row per document containing ALL query terms:
    (doc_id, min_span, n_covers, best_end) where ``min_span`` is the
    length in tokens of the SHORTEST window [i..j] whose token stream
    contains every distinct query term, ``n_covers`` counts positions
    at which such a window ends, and ``best_end`` is the end position
    of the first minimal window. Pure integers end to end.

    Sweep formulation (no self-join chain in k): walk each document's
    postings for the k query terms in position order keeping, per
    term, the LAST position seen; the smallest window ending at the
    current row is ``pos - least(last_1..last_k) + 1`` once every
    term has been sighted. All k running maxima ride ONE window spec
    (partitionBy doc, orderBy pos) so the whole statistic costs a
    single hash-partition shuffle of the k-term postings — and those
    postings are filtered to the k query terms BEFORE the exchange,
    so the shuffled volume is the match list, not the corpus (at
    100 TB with a materialized positional index this is an index
    lookup + one window over ~ppm of the data).

    Duplicate query terms collapse (a span statistic is over the
    distinct vocabulary); empty/absent terms simply never produce a
    full cover, so docs missing any term drop out — the semantics a
    proximity *filter* wants."""
    want = sorted(set(str(t) for t in terms))
    if not want:
        raise ValueError("terms must have at least one token")
    idx = positional_index(docs, id_col, text_col)
    hits = idx.filter(F.col("term").isin(want))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lasts = [F.max(F.when(F.col("term") == t, F.col("pos"))).over(w)
             .alias(f"last_{i}") for i, t in enumerate(want)]
    seen = hits.select("doc_id", "pos", *lasts)
    last_cols = [F.col(f"last_{i}") for i in range(len(want))]
    all_seen = last_cols[0].isNotNull()
    for c in last_cols[1:]:
        all_seen = all_seen & c.isNotNull()
    # least() skips NULLs on BOTH engines, so an explicit all-terms-
    # sighted guard is load-bearing (a doc holding one term would
    # otherwise score a bogus 1-token "cover").
    spans = (seen.filter(all_seen)
             .withColumn("span",
                         F.col("pos") - F.least(*last_cols) + F.lit(1)))
    doc_min = F.min("span").over(Window.partitionBy("doc_id"))
    spans = spans.withColumn("doc_min", doc_min)
    return (spans.groupBy("doc_id")
            .agg(F.min("span").cast("long").alias("min_span"),
                 F.count(F.lit(1)).cast("long").alias("n_covers"),
                 F.min(F.when(F.col("span") == F.col("doc_min"),
                              F.col("pos")))
                 .cast("long").alias("best_end")))


def textrank_keywords(docs: DataFrame, window: int = 2, n_iter: int = 5,
                      damping: float = 0.85, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004) -> (term, w_out,
    rank): weighted PageRank over the corpus-level term co-occurrence
    graph (terms co-occurring within ``window`` positions share an
    edge, weight = corpus co-occurrence count, symmetrized). The
    unsupervised keyword/keyphrase baseline — corpus-level here, the
    vocabulary-as-graph reading of importance that raw term frequency
    (``top_terms``) and tf-idf both miss: a term matters when it
    co-occurs with other terms that matter.

    Scale split: the EXPENSIVE side is co-occurrence extraction — one
    positional-index self-equi-join on doc_id with a residual <=window
    position filter, then a partial-agged groupBy to edge grain
    (vocabulary^2-bounded, corpus-independent after aggregation). The
    rank iteration then runs over the VOCABULARY graph: per iteration
    one keyed join + one partial-agged sum, lazily checkpointed — the
    ``pagerank`` loop discipline at term cardinality. Isolated terms
    (documents with a single token) carry no edge and get the teleport
    floor via the left join against the term universe.

    Ranks are raw doubles replayed iteration-for-iteration by the SQL
    oracle and compared at 6dp (the pagerank oracle contract)."""
    idx = positional_index(docs, id_col, text_col)
    a = idx.select("doc_id", F.col("pos").alias("pa"),
                   F.col("term").alias("ta"))
    b = idx.select("doc_id", F.col("pos").alias("pb"),
                   F.col("term").alias("tb"))
    raw = (a.join(b, "doc_id")
           .filter((F.col("pb") - F.col("pa") >= 1)
                   & (F.col("pb") - F.col("pa") <= window)
                   & (F.col("ta") != F.col("tb")))
           .select(F.col("ta").alias("u"), F.col("tb").alias("v")))
    e = (raw.unionByName(raw.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
         .groupBy("u", "v").agg(F.count(F.lit(1)).cast("long")
                                .alias("w"))
         .localCheckpoint(eager=False))
    terms = idx.select("term").distinct().localCheckpoint(eager=False)
    n = terms.count()
    strength = e.groupBy("u").agg(F.sum("w").cast("long").alias("w_out"))
    ce = e.join(strength, "u").select(
        "u", "v", (F.col("w") / F.col("w_out")).alias("share"))
    d = float(damping)
    ranks = terms.select(F.col("term").alias("v"),
                         F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (ce.join(ranks.withColumnRenamed("v", "u"), "u")
                   .groupBy("v")
                   .agg(F.sum(F.col("share") * F.col("rank"))
                        .alias("inflow")))
        ranks = (terms.select(F.col("term").alias("v"))
                 .join(contrib, "v", "left")
                 .select("v", (F.lit((1.0 - d) / n)
                               + F.lit(d) * F.coalesce("inflow",
                                                       F.lit(0.0)))
                         .alias("rank"))
                 .localCheckpoint(eager=False))
    return (ranks.join(strength.withColumnRenamed("u", "v"), "v", "left")
            .select(F.col("v").alias("term"),
                    F.coalesce("w_out", F.lit(0)).cast("long")
                    .alias("w_out"),
                    F.round("rank", 6).alias("rank")))


def zipf_fit(docs: DataFrame, top_n: int = 100, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Zipf-law fit over the corpus term-frequency distribution -> ONE
    row: (n_terms, alpha, intercept, r2). OLS of ln(freq) on ln(rank)
    over the top ``top_n`` terms; alpha = -slope is the Zipf exponent
    (natural corpora ~1.0) — the canonical smell test for synthetic /
    template / spam-heavy corpora, whose exponents run flat or steep.

    Rank order is (freq DESC, term ASC) — fully deterministic under
    ties. Scale shape: term counting is one partial-agged groupBy;
    the top-n cut is orderBy+limit = distributed TakeOrdered (each
    partition ships only its local top-n — never a global sort of
    the vocabulary); the regression then aggregates ``top_n`` rows.
    Float work is confined to lns of exact integer counts and sums of
    top_n such terms (6dp envelope)."""
    terms = F.explode(F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "")).alias("term")
    tf = (docs.select(terms)
          .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
          .orderBy(F.col("freq").desc(), F.col("term")).limit(top_n))
    w = Window.orderBy(F.col("freq").desc(), F.col("term"))
    xy = tf.select(F.log(F.row_number().over(w).cast("double")).alias("x"),
                   F.log(F.col("freq").cast("double")).alias("y"))
    agg = xy.agg(F.count(F.lit(1)).cast("double").alias("n"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"),
                 F.sum(F.col("y") * F.col("y")).alias("syy"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    ssr = slope * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
    return agg.select(F.col("n").cast("long").alias("n_terms"),
                      F.round(-slope, 6).alias("alpha"),
                      F.round(intercept, 6).alias("intercept"),
                      F.round(ssr / sst, 6).alias("r2"))


def extractive_topk(docs: DataFrame, k: int = 2, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """IDF-weighted extractive summary -> the top ``k`` sentences per
    document: (doc_id, sent_idx, rank, score, sentence). Sentence
    score = mean smoothed IDF over its DISTINCT terms
    (idf = ln((1+N)/(1+df)), df = documents containing the term) —
    mean, not sum, so verbose sentences don't win on length; ranking
    is (6dp score DESC, sent_idx ASC), the ranked-float contract.
    This is the cheap doc-compression pass an LLM-data pipeline runs
    to build short previews / dedup keys / context-window-sized
    variants of long pages without a model.

    Scale shape: df is one distinct + one partial-agged groupBy over
    (doc, term); N is a 1-row broadcast aggregate (never a driver
    count); sentence scoring is one term-keyed equi-join + one
    groupBy at sentence grain; top-k per doc is a WindowGroupLimit
    (rank filter pushes into the window operator), so only k rows
    per doc survive the final exchange."""
    from .textstats import sentence_split
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    doc_terms = (docs.select(F.col(id_col),
                             F.explode(toks).alias("term"))
                 .distinct())
    dfc = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (dfc.crossJoin(F.broadcast(n_docs))
           .select("term", F.log((F.lit(1.0) + F.col("n_docs"))
                                 / (F.lit(1.0) + F.col("df")))
                   .alias("idf")))
    sents = sentence_split(docs, id_col, text_col)
    stoks = F.filter(F.split(F.lower(F.col("sentence")), "[^a-z0-9]+"),
                     lambda t: t != "")
    s_terms = (sents.select(id_col, "sent_idx",
                            F.explode(F.array_distinct(stoks))
                            .alias("term")))
    scored = (s_terms.join(idf, "term")
              .groupBy(id_col, "sent_idx")
              .agg(F.round(F.sum("idf") / F.count(F.lit(1)), 6)
                   .alias("score")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("sent_idx"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .join(sents, [id_col, "sent_idx"])
            .select(id_col, "sent_idx",
                    F.col("rank").cast("long").alias("rank"),
                    "score", "sentence"))


def query_likelihood_topk(docs: DataFrame, query_terms: list,
                          k: int = 20, mu: int = 1000,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001) -> (rank, doc_id, score): the language-modeling scorer next
    to BM25 — score(d, Q) = sum over query terms of
    ln((tf + mu*P(t|C)) / (dl + mu)). Candidates are docs matching at
    least one query term (the inverted-index contract shared with
    bm25_topk); absent terms still contribute their smoothed mass via
    a tf=0 row, which is what separates QL from BM25 on partial
    matches. Ranking on the 6dp-rounded score + doc_id tie-break.

    Scale shape mirrors bm25_topk: broadcast query-term semi-join
    prunes the token stream BEFORE anything wide; collection term
    stats are a <= |Q|-row broadcast; the candidate x query-term
    expansion is candidates * |Q| rows (a broadcast nested join of
    the |Q|-row dim is the intended tiny cross); top-k is one
    WindowGroupLimit."""
    spark = docs.sparkSession
    toks = tokenize(docs, id_col, text_col)
    qt = spark.createDataFrame([(str(t),) for t in query_terms],
                               "term string")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    cstat = toks.agg(F.count("*").alias("clen"))
    ctf = (toks.join(F.broadcast(qt), "term")
           .groupBy("term").agg(F.count("*").alias("ctf")))
    tf = (toks.join(F.broadcast(qt), "term")
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    cands = tf.select("doc_id").distinct()
    # a query term absent from the whole collection carries no signal
    # (its smoothed probability is 0 -> ln 0): drop it, the standard
    # treatment, rather than -inf every candidate equally
    grid = cands.crossJoin(F.broadcast(qt.join(ctf, "term")))
    scored = (grid.join(tf, ["doc_id", "term"], "left_outer")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(cstat))
              .withColumn("part", F.log(
                  (F.coalesce("tf", F.lit(0))
                   + F.lit(float(mu)) * F.col("ctf") / F.col("clen"))
                  / (F.col("dl") + F.lit(float(mu)))))
              .groupBy("doc_id")
              .agg(F.round(F.sum("part"), 6).alias("score")))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("rank").cast("long").alias("rank"),
                    "doc_id", "score"))


def stopword_profile(docs: DataFrame, k: int = 40,
                     threshold_ppm: int = 500000, id_col: str = "doc_id",
                     text_col: str = "text",
                     source_col: str = "source") -> DataFrame:
    """Corpus-driven stopword discovery -> (rank, term, df, df_ppm,
    source_entropy, is_stopword) for the ``k`` highest-document-
    frequency terms. A term is a stopword candidate when it is BOTH
    ubiquitous (df_ppm >= threshold) and topically flat - high entropy
    of its document distribution across sources means no source 'owns'
    it (Manning & Schuetze ch.15 stop-listing, the corpus-adaptive
    variant every LM-data pipeline builds instead of shipping a fixed
    list).

    source_entropy = ln(df) - sum(n_s * ln(n_s)) / df over per-source
    doc counts n_s - computed from ONE (term, source) partial agg, 6dp
    rounded (floats enter only through ln of exact integers, the bm25
    idf discipline). df_ppm is exact integer `div`.

    Scale shape: distinct (doc, source, term) -> two partial-agged
    groupBys (term x source, then term) -> orderBy().limit(k) =
    TakeOrderedAndProject (distributed top-k merge, never a global
    sort over the vocabulary); the rank window runs over the k
    survivors only. n_docs rides as a broadcast 1-row dimension."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(source_col).alias("source"),
                        F.explode(F.filter(
                            F.split(F.lower(F.col(text_col)),
                                    "[^a-z0-9]+"),
                            lambda t: t != "")).alias("term"))
            .distinct())
    nd = docs.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    per_src = toks.groupBy("term", "source").agg(
        F.count(F.lit(1)).cast("long").alias("ns"))
    stats = per_src.groupBy("term").agg(
        F.sum("ns").cast("long").alias("df"),
        F.sum(F.col("ns") * F.log(F.col("ns"))).alias("snln"))
    top = stats.orderBy(F.col("df").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("df").desc(), F.col("term"))
    return (top.crossJoin(F.broadcast(nd))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "term", "df",
                    F.expr("(1000000 * df) div n_docs").alias("df_ppm"),
                    F.round(F.log("df") - F.col("snln") / F.col("df"), 6)
                    .alias("source_entropy"),
                    (F.expr("(1000000 * df) div n_docs")
                     >= F.lit(int(threshold_ppm))).alias("is_stopword")))


def bm25f_topk(docs: DataFrame, query_terms: list, fields: list,
               k: int = 20, k1: float = 1.2,
               id_col: str = "doc_id") -> DataFrame:
    """Fielded BM25 (the 'simple BM25F' of Zaragoza et al. CIKM 2004)
    -> (rank, doc_id, score): per-field term frequencies are length-
    normalized and WEIGHT-combined BEFORE one shared saturation,

        tf~(t,d) = sum_f w_f * tf_f / (1 - b_f + b_f * dl_f/avgdl_f)
        s(d,q)   = sum_t idf(t) * tf~ / (k1 + tf~)

    which is what separates it from naively summing per-field BM25
    scores (that would saturate each field independently and over-
    reward a term hitting many fields). The canonical use: web search
    over (body, anchor-text) where anchors carry high weight - the
    off-page relevance signal.

    ``fields`` is a list of (text_col, weight, b) triples; df/idf
    count a doc once if the term appears in ANY field (the union
    document frequency). Scores 6dp-rounded + doc_id tie-break (the
    ranked-float discipline).

    Scale shape: one tokenize+explode per field unioned with a field
    tag (narrow), broadcast query-term semi-join BEFORE any shuffle,
    per-(field) avgdl as a broadcast few-row dimension, one (doc,
    term) combine shuffle, top-k via row_number <= k."""
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], "term string")
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))

    tagged = None
    dls = None
    for fname, _w, _b in fields:
        terms = F.split(F.lower(F.col(fname)), "[^a-z0-9]+")
        t = docs.select(F.col(id_col).alias("doc_id"),
                        F.lit(fname).alias("field"),
                        F.explode(F.filter(terms, lambda x: x != ""))
                        .alias("term"))
        tagged = t if tagged is None else tagged.unionByName(t)
        d = docs.select(
            F.col(id_col).alias("doc_id"), F.lit(fname).alias("field"),
            F.size(F.filter(terms, lambda x: x != "")).cast("long")
            .alias("dl"))
        dls = d if dls is None else dls.unionByName(d)

    avg = dls.groupBy("field").agg(F.avg("dl").alias("avgdl"))
    tf = (tagged.join(F.broadcast(qt), "term")
          .groupBy("doc_id", "field", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    wmap = F.create_map(*[x for fname, w, _b in fields
                          for x in (F.lit(fname), F.lit(float(w)))])
    bmap = F.create_map(*[x for fname, _w, b in fields
                          for x in (F.lit(fname), F.lit(float(b)))])
    norm = (tf.join(dls, ["doc_id", "field"])
            .join(F.broadcast(avg), "field")
            .withColumn("wf", wmap[F.col("field")])
            .withColumn("bf", bmap[F.col("field")])
            .withColumn("part",
                        F.col("wf") * F.col("tf")
                        / (F.lit(1.0) - F.col("bf")
                           + F.col("bf") * F.col("dl") / F.col("avgdl")))
            .groupBy("doc_id", "term").agg(F.sum("part").alias("tfn")))
    df_ = norm.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    scored = (norm.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("idf", F.log(
                  F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)))
              .withColumn("s", F.col("idf") * F.col("tfn")
                          / (F.lit(float(k1)) + F.col("tfn")))
              .groupBy("doc_id")
              .agg(F.round(F.sum("s"), 6).alias("score")))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("rank").cast("long").alias("rank"), "doc_id",
                    "score"))


def class_tfidf_labels(docs: DataFrame, class_col: str, k: int = 5,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Class-based TF-IDF cluster labeling (the c-TF-IDF of BERTopic,
    Grootendorst 2022): treat each class/cluster as ONE pseudo-document
    and rank its terms by tf_class * ln(n_classes / df_class) - the
    human-readable label generator for any clustering this repo
    produces (kmeans cells, LPA communities, lang/source strata).

    -> (class, rank, term, tf, df_classes, score): score 6dp, ties
    (score desc, term asc). tf/df are exact integers; the single ln
    runs per (class, term) row at class-vocabulary scale.

    Scale shape: ONE partial-agg groupBy to (class, term) counts (the
    corpus-sized stage), a term-keyed groupBy for df_class, a
    broadcast 1-row class count, and a per-class top-k window over
    class-vocabulary rows. No doc-level rows survive the first agg."""
    toks = docs.select(F.col(class_col).alias("class"),
                       F.explode(F.filter(
                           F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                           lambda t: t != "")).alias("term"))
    ct = toks.groupBy("class", "term").agg(F.count("*").alias("tf"))
    dfc = ct.groupBy("term").agg(F.count("*").alias("df_classes"))
    ncls = ct.select("class").distinct().agg(
        F.count("*").alias("n_classes"))
    scored = (ct.join(dfc, "term")
              .crossJoin(F.broadcast(ncls))
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.col("n_classes")
                                      / F.col("df_classes")), 6)))
    w = Window.partitionBy("class").orderBy(
        F.col("score").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= int(k))
            .select("class", "rank", "term", "tf", "df_classes", "score"))


def team_draft_interleave(run_a: DataFrame, run_b: DataFrame,
                          judgments: DataFrame, k: int = 10,
                          qid_col: str = "qid") -> DataFrame:
    """Team-draft interleaving (Radlinski et al., CIKM 2008) ->
    (qid, credit_a, credit_b, winner): the ONLINE ranker-evaluation
    design — merge two rankers' lists for the same queries into one
    interleaved list via alternating team picks, then credit each
    team the clicked documents it contributed. Per-query winners are
    the sensitive pairwise preference signal that A/B-split absolute
    metrics need orders of magnitude more traffic to detect.

    Inputs are runs (qid, rank, doc_id) and graded ``judgments``
    (qid, doc_id, rel); the click model is deterministic — every
    relevant (rel > 0) doc in the interleaved top-``k`` is clicked —
    so the whole surface is exact integers. Pick order: the team with
    fewer picks drafts next; ties flip the md5(qid ':' step) coin
    (parity of the first hex digit's codepoint — engine-identical
    string logic). Each draft takes the drafting team's
    highest-ranked not-yet-picked doc.

    Scale shape: the draft is inherently sequential per query but
    touches only the two top-k lists (bounded state), so each query
    replays in one applyInPandas group over the pre-joined
    runs+judgments rows; queries parallelize freely and the output is
    one row per query."""
    import hashlib

    import pandas as pd

    a = run_a.select(F.col(qid_col).alias("qid"), "rank", "doc_id",
                     F.lit("A").alias("team"))
    b = run_b.select(F.col(qid_col).alias("qid"), "rank", "doc_id",
                     F.lit("B").alias("team"))
    j = judgments.select(F.col(qid_col).alias("qid"), "doc_id",
                         F.col("rel").cast("long").alias("rel"))
    rows = (a.unionByName(b)
            .join(j, ["qid", "doc_id"], "left")
            .fillna(0, subset=["rel"]))

    def _draft(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        rel = {}
        lists = {"A": [], "B": []}
        for t in ("A", "B"):
            sub = pdf[pdf["team"] == t].sort_values("rank")
            lists[t] = list(sub["doc_id"])
            rel.update(zip(sub["doc_id"], sub["rel"]))
        picked, teams = [], {"A": set(), "B": set()}
        while len(picked) < k:
            remaining = {t: [d for d in lists[t] if d not in picked]
                         for t in ("A", "B")}
            if not remaining["A"] and not remaining["B"]:
                break
            if len(teams["A"]) < len(teams["B"]):
                t = "A"
            elif len(teams["B"]) < len(teams["A"]):
                t = "B"
            else:
                h = hashlib.md5(
                    f"{qid}:{len(picked)}".encode()).hexdigest()
                t = "A" if ord(h[0]) % 2 == 0 else "B"
            if not remaining[t]:
                t = "A" if t == "B" else "B"
            doc = remaining[t][0]
            picked.append(doc)
            teams[t].add(doc)
        ca = sum(1 for d in teams["A"] if rel.get(d, 0) > 0)
        cb = sum(1 for d in teams["B"] if rel.get(d, 0) > 0)
        win = "A" if ca > cb else ("B" if cb > ca else "tie")
        return pd.DataFrame({"qid": [qid], "credit_a": [ca],
                             "credit_b": [cb], "winner": [win]})

    return (rows.groupBy("qid").applyInPandas(
        _draft, "qid string, credit_a long, credit_b long, "
                "winner string"))


def rbo_truncated(run_a: DataFrame, run_b: DataFrame, depth: int = 10,
                  qid_col: str = "qid") -> DataFrame:
    """Truncated rank-biased overlap at p = 0.9 (Webber et al., TOIS
    2010) -> (qid, overlap_at_depth, rbo_e10): the top-weighted
    similarity between two rankings that handles NON-conjoint lists —
    what Kendall/Spearman (which need the same item set) cannot do,
    and the offline complement of team-draft interleaving: how much do
    two rankers even differ, before asking which is better?

    RBO@D = (1-p) * sum_{d=1..D} p^(d-1) * |A[:d] n B[:d]| / d. With
    p = 9/10 the weight (1-p)*p^(d-1) scaled by 1e10 is the EXACT
    integer 9^(d-1) * 10^(10-d), so each term is a lockstep
    (overlap_d * w_d) div d and the sum is engine-exact BIGINT
    (rbo_e10 ~ RBO * 1e10; no float ever exists).

    Overlap needs no per-depth set intersection: doc x is in
    A[:d] n B[:d] iff max(rank_a, rank_b) <= d, so overlap_d is a
    running count over the joined runs' max-rank histogram — one
    equi-join plus a bounded depth-expansion per query."""
    assert 1 <= depth <= 10
    w_lit = [9 ** (d - 1) * 10 ** (10 - d) for d in range(1, depth + 1)]
    a = run_a.select(F.col(qid_col).alias("qid"), "doc_id",
                     F.col("rank").alias("ra"))
    b = run_b.select(F.col(qid_col).alias("qid"), "doc_id",
                     F.col("rank").alias("rb"))
    j = (a.join(b, ["qid", "doc_id"])
         .select("qid", F.greatest("ra", "rb").alias("m"))
         .filter(F.col("m") <= depth))
    qids = a.select("qid").distinct()
    ds = qids.select("qid", F.explode(F.sequence(
        F.lit(1), F.lit(int(depth)))).alias("d"))
    ov = (ds.join(j, "qid", "left")
          .groupBy("qid", "d")
          .agg(F.sum(F.when(F.col("m") <= F.col("d"), 1)
                     .otherwise(0)).alias("ov")))
    warr = F.array(*[F.lit(int(x)) for x in w_lit])
    terms = ov.select(
        "qid", "d", "ov",
        (F.col("ov") * F.element_at(warr, F.col("d").cast("int")))
        .cast("long").alias("num"))
    contrib = terms.select(
        "qid", "d", "ov",
        F.expr("num div d").alias("c"))
    return (contrib.groupBy("qid")
            .agg(F.max(F.when(F.col("d") == depth, F.col("ov")))
                 .cast("long").alias("overlap_at_depth"),
                 F.sum("c").cast("long").alias("rbo_e10")))


def oov_curve(docs: DataFrame, ks=(1000, 2000, 4000, 8000),
              id_col: str = "doc_id", text_col: str = "text",
              ngram: int = 1) -> DataFrame:
    """Tokenizer vocabulary-coverage curve -> one row per vocab size
    k: (k, vocab_used, covered_tokens, total_tokens, oov_ppm) where
    the vocabulary is the top-k terms by corpus frequency (term
    tie-break) and oov_ppm the token mass OUTSIDE it — the
    vocab-size-vs-UNK tradeoff read in ONE pass, the sizing telemetry
    behind every tokenizer budget decision (fertility tells you
    tokens-per-word; this tells you what a k-entry vocab fails to
    cover at all).

    The vocabulary can be corpus-scale (distinct terms grow with the
    crawl), so the GLOBAL frequency rank never uses a
    single-partition window: range-repartition by (tf desc, term),
    local row_number, plus a statistic-scale partition-offset join —
    the suffix_array global-rank scheme. All exact integers, lockstep
    ppm div. ``ngram > 1`` switches the vocabulary unit to word
    n-grams (the BPE-merge-candidate shape) — on a small closed word
    vocabulary the unigram curve is degenerate while the n-gram one
    is not."""
    if ngram > 1:
        n = int(ngram)
        arr = docs.select(F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: t != "").alias("toks"))
        toks = arr.select(F.explode(F.expr(
            f"CASE WHEN size(toks) < {n} THEN slice(toks, 1, 0)"
            f" ELSE transform(sequence(1, size(toks) - {n - 1}),"
            f" i -> concat_ws(' ', slice(toks, i, {n}))) END"))
            .alias("term"))
    else:
        toks = tokenize(docs, id_col, text_col)
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    dp = tf.repartitionByRange(F.col("tf").desc(), F.col("term")) \
        .withColumn("pid", F.spark_partition_id())
    cnt = dp.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1)
    offs = cnt.withColumn("off", F.coalesce(F.sum("c").over(w_off),
                                            F.lit(0)))
    w_loc = Window.partitionBy("pid").orderBy(F.col("tf").desc(),
                                              "term")
    ranked = (dp.join(F.broadcast(offs.select("pid", "off")), "pid")
              .select("tf", (F.col("off")
                             + F.row_number().over(w_loc))
                      .cast("long").alias("rn")))
    tot = tf.agg(F.sum("tf").alias("total"),
                 F.count(F.lit(1)).alias("ndv"))
    spark = docs.sparkSession
    kdf = spark.createDataFrame([(int(k),) for k in ks], "k long")
    cov = (kdf.join(ranked, F.col("rn") <= F.col("k"), "left")
           .groupBy("k")
           .agg(F.sum("tf").alias("covered"),
                F.count(F.col("rn")).alias("used")))
    return (cov.crossJoin(F.broadcast(tot))
            .select("k",
                    F.least("used", F.col("ndv")).cast("long")
                    .alias("vocab_used"),
                    F.coalesce("covered", F.lit(0)).cast("long")
                    .alias("covered_tokens"),
                    F.col("total").cast("long").alias("total_tokens"),
                    F.expr("(1000000 * (total - coalesce(covered, 0)))"
                           " div total").cast("long").alias("oov_ppm")))


def rice_parameter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_k: int = 8) -> DataFrame:
    """Per-term optimal Rice/Golomb parameter -> (term, df, best_k,
    bits): for each posting list (docs containing the term,
    d-gap-encoded with a -1 sentinel so the first gap is docid+1),
    the Rice code length at parameter k is sum((gap >> k) + 1 + k);
    the op picks the k in [0, max_k) minimizing total bits — the
    entropy-coding companion to posting_size_bytes' varint estimate
    and huffman_dictionary's dictionary floor (Rice is what real
    inverted indexes (Lucene/PForDelta ancestors) actually tune).

    Integer-pure: gaps from a per-term lag window (posting order),
    k-fold map-side explode, one (term, k) groupBy, argmin =
    min(struct(bits, k)). Windows partition by TERM — vocabulary-
    scale keys, never a global sort."""
    from .dedup import normalized_text

    posting = (df.select(F.col(id_col).alias("d"),
                         F.explode(F.split(
                             normalized_text(F.col(text_col)), " "))
                         .alias("term"))
               .filter(F.col("term") != "").distinct())
    w = Window.partitionBy("term").orderBy("d")
    gaps = posting.withColumn(
        "gap", F.col("d") - F.coalesce(F.lag("d").over(w), F.lit(-1)))
    fan = gaps.select("term", "gap", F.explode(F.expr(
        f"sequence(0, {int(max_k) - 1})")).alias("k"))
    per_k = (fan.groupBy("term", "k")
             .agg(F.sum(F.expr("shiftright(gap, k) + 1 + k"))
                  .cast("long").alias("bits"),
                  F.count(F.lit(1)).cast("long").alias("df_n")))
    return (per_k.groupBy("term")
            .agg(F.max("df_n").alias("df"),
                 F.min(F.struct("bits", "k")).alias("m"))
            .select("term", "df", F.col("m.k").cast("long")
                    .alias("best_k"), F.col("m.bits").alias("bits")))
