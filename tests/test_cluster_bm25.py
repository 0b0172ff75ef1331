"""ops/cluster.py (Lloyd k-means) and ops/bm25.py (lexical top-k):
semantic unit tests plus the plan-shape assertions that make the
100-TB story checkable (map-side assignment, broadcast query-term
semi-join)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import bm25, cluster


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_kmeans_separable_clusters(spark):
    """Two tight blobs + init centroids one in each -> perfect split,
    stable under iterations."""
    rng = np.random.default_rng(0)
    a = rng.normal([5, 0, 0], 0.1, size=(10, 3))
    b = rng.normal([-5, 0, 0], 0.1, size=(10, 3))
    # ids 0..9 = blob a, 10..19 = blob b; init needs ids [0, 2): put one
    # blob-b point at id 1 so each blob seeds one centroid
    vecs = np.vstack([a[:1], b[:1], a[1:], b[1:]])
    cents, assigned = cluster.kmeans_fit(_emb_df(spark, vecs), k=2,
                                         n_iter=3)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    blob_a = {0} | set(range(2, 11))
    assert {got[i] for i in blob_a} == {0}
    assert {got[i] for i in got if i not in blob_a} == {1}
    assert np.allclose(cents[0], a.mean(axis=0), atol=1e-6)
    assert np.allclose(cents[1], b.mean(axis=0), atol=1e-6)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that captures nothing must survive the update
    unchanged (COALESCE semantics, mirrored in the SQL oracle)."""
    vecs = [[0.0, 0.0], [100.0, 100.0], [0.1, 0.1], [0.2, 0.0],
            [0.0, 0.2]]
    cents, assigned = cluster.kmeans_fit(_emb_df(spark, vecs), k=2,
                                         n_iter=2)
    # cluster 1 (init [100,100]) captures only vec 1; after update it
    # moves there and keeps it
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert got[1] == 1 and all(got[i] == 0 for i in got if i != 1)
    assert cents[1] == [100.0, 100.0]


def test_kmeans_tie_breaks_to_lowest_cluster(spark):
    """A vector exactly equidistant from both centroids goes to the
    lower cluster id - the stable-argmin contract the oracle copies."""
    vecs = [[1.0, 0.0], [-1.0, 0.0], [0.0, 5.0]]
    assigned = cluster.assign_clusters(_emb_df(spark, vecs),
                                       [[1.0, 0.0], [-1.0, 0.0]])
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert got[2] == 0                       # equidistant -> cluster 0


def test_kmeans_requires_init_ids(spark):
    with pytest.raises(ValueError, match="deterministic init"):
        cluster.kmeans_fit(
            _emb_df(spark, [[1.0, 0.0]]), k=4, n_iter=1)


def _plan(df) -> str:
    return df._jdf.queryExecution().toString().split(
        "== Physical Plan ==")[-1]


def test_kmeans_assignment_is_map_side(spark):
    """The assignment stage must contain no Exchange: broadcast-numpy
    centroids, not a join against a centroid table."""
    df = cluster.assign_clusters(
        _emb_df(spark, np.eye(4).tolist()), np.eye(4).tolist())
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


# ------------------------------------------------------------------ BM25

def _docs_df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_bm25_matches_reference(spark):
    texts = ["the cat sat on the mat",
             "the dog sat",
             "cat cat cat",
             "nothing relevant here"]
    out = {r.doc_id: r.score
           for r in bm25.bm25_topk(_docs_df(spark, texts),
                                   ["cat", "sat"], k=10).collect()}
    # reference implementation
    toks = [t.lower().split() for t in texts]
    N = 4
    avgdl = sum(len(t) for t in toks) / N
    exp = {}
    for term in ("cat", "sat"):
        df_ = sum(1 for t in toks if term in t)
        idf = math.log(1 + (N - df_ + 0.5) / (df_ + 0.5))
        for d, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                dl = len(t)
                exp[d] = exp.get(d, 0.0) + idf * tf * 2.2 / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    exp = {d: round(s, 6) for d, s in exp.items()}
    assert set(out) == set(exp) == {0, 1, 2}   # doc 3 never retrieved
    for d in exp:
        assert abs(out[d] - exp[d]) < 1e-6


def test_bm25_rank_ordering_and_k(spark):
    texts = ["zebra"] * 1 + ["zebra zebra pad pad pad"] * 1
    res = bm25.bm25_topk(_docs_df(spark, texts), ["zebra"], k=1).collect()
    assert len(res) == 1 and res[0].rank == 1


def test_bm25_query_terms_join_is_broadcast(spark):
    df = bm25.bm25_topk(_docs_df(spark, ["a b c", "b c d"]), ["b"], k=5)
    assert "BroadcastHashJoin" in _plan(df)


def test_rrf_fuse_exact_semantics(spark):
    """RRF contributions are exact integers 1e9 div (k+rank): a doc in
    both lists sums both terms; singles keep one; ranking is on the
    exact sum with doc_id tie-break; topk truncates."""
    from eventrelationextractor_spark.ops import bm25

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(11, 1), (10, 2), (13, 3)],
                              "doc_id long, rank long")
    out = {r.doc_id: r for r in
           bm25.rrf_fuse([a, b], k_rrf=60, topk=3).collect()}
    c = lambda r: 1_000_000_000 // (60 + r)  # noqa: E731
    # 10 and 11 tie exactly (1/61+1/62 both): doc_id breaks the tie
    assert out[10].rank == 1 and out[11].rank == 2
    assert out[10].n_lists == 2 and out[11].n_lists == 2
    assert abs(out[10].rrf_score - (c(1) + c(2)) / 1e9) < 1e-12
    # 12 vs 13: identical single-list rank 3 -> same score, id tie-break
    assert 12 in out and 13 not in out  # topk=3 cuts after the tie loser
    ranks = [r.rank for r in out.values()]
    assert sorted(ranks) == [1, 2, 3]


def test_rrf_fuse_three_lists_and_validation(spark):
    from eventrelationextractor_spark.ops import bm25
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25.rrf_fuse([])
    lists = [spark.createDataFrame([(7, 1)], "doc_id long, rank long")
             for _ in range(3)]
    row = bm25.rrf_fuse(lists, k_rrf=60, topk=5).collect()[0]
    assert row.n_lists == 3
    assert abs(row.rrf_score - 3 * (1_000_000_000 // 61) / 1e9) < 1e-12


def test_mmr_rerank_diversity_beats_pure_relevance(spark):
    """Three candidates: two near-identical high-rel vectors and one
    orthogonal lower-rel vector. Pure relevance would rank the twin
    second; MMR (lam=0.7) must demote it below the orthogonal doc.
    Also pins: step-1 objective = rel, id tie-break, k truncation."""
    from eventrelationextractor_spark.ops import simsearch

    rows = [
        (1, 0.90, [1.0, 0.0, 0.0]),
        (2, 0.89, [0.999, 0.001, 0.0]),   # near-dup of 1
        (3, 0.50, [0.0, 1.0, 0.0]),       # orthogonal
    ]
    cand = spark.createDataFrame(
        rows, "doc_id long, rel double, vec array<double>")
    out = simsearch.mmr_rerank(cand, k=3, lam=0.7)
    got = sorted((r.step, r.doc_id) for r in out.collect())
    assert got == [(1, 1), (2, 3), (3, 2)]
    scores = {r.step: r.mmr_score for r in out.collect()}
    assert abs(scores[1] - 0.90) < 1e-9          # step 1 = rel itself
    # step 2: doc 3 objective = 0.7*0.5 - 0.3*sim(3,1)=0.35 - 0.3*0
    assert abs(scores[2] - 0.35) < 1e-9
    # k truncation
    assert simsearch.mmr_rerank(cand, k=2, lam=0.7).count() == 2


def test_mmr_rerank_zero_norm_and_misuse_guard(spark):
    from eventrelationextractor_spark.ops import simsearch

    rows = [(1, 0.9, [1.0, 0.0]), (2, 0.8, [0.0, 0.0]),
            (3, 0.7, [1.0, 0.0])]
    cand = spark.createDataFrame(
        rows, "doc_id long, rel double, vec array<double>")
    out = {r.step: r.doc_id
           for r in simsearch.mmr_rerank(cand, k=3, lam=0.7).collect()}
    # zero-norm doc 2 pins sim=-1 (maximally diverse): picked 2nd
    # (0.7*0.8 + 0.3 = 0.86 > doc 3's 0.7*0.7 - 0.3*1 = 0.19)
    assert out == {1: 1, 2: 2, 3: 3}


def test_rm3_expand_semantics(spark):
    """RM3: original query terms carry the interpolated uniform mass;
    terms frequent in the pseudo-relevant top docs enter the expansion;
    terms only in non-retrieved docs do not."""
    from eventrelationextractor_spark.ops import bm25 as bm

    docs = spark.createDataFrame(
        [(1, "spark shuffle shuffle partition"),
         (2, "spark shuffle executor"),
         (3, "gardening tulips daffodil soil"),   # never retrieved
         (4, "spark partition skew")],
        "doc_id long, text string")
    out = bm.rm3_expand(docs, ["spark"], fb_docs=3, fb_terms=8,
                        orig_weight=0.6)
    rows = {r.term: r for r in out.collect()}
    # the query term gets 0.6 * 1.0 plus its feedback mass -> rank 1
    assert min(rows, key=lambda t: rows[t].rank) == "spark"
    assert rows["spark"].weight > 0.6
    # feedback terms from retrieved docs appear with positive weight
    assert "shuffle" in rows and rows["shuffle"].weight > 0
    # vocabulary of the never-retrieved doc is absent
    assert "tulips" not in rows and "soil" not in rows
    # ranks are 1..n dense and ordered by (weight desc, term)
    got = [(r.rank, r.weight, r.term) for r in out.collect()]
    assert [g[0] for g in got] == list(range(1, len(got) + 1))
    assert got == sorted(got, key=lambda g: (g[0],))
    with pytest.raises(ValueError):
        bm.rm3_expand(docs, ["spark", "spark"])


def test_bm25_weighted_reduces_to_unweighted_at_weight_one(spark):
    """With every weight = 1.0 the weighted pass must equal bm25_topk
    exactly; doubling one term's weight doubles its contribution."""
    from eventrelationextractor_spark.ops import bm25 as bm

    docs = spark.createDataFrame(
        [(i, ("spark shuffle " * (i % 3 + 1)) + "filler text")
         for i in range(1, 8)],
        "doc_id long, text string")
    plain = [(r.rank, r.doc_id, r.score)
             for r in bm.bm25_topk(docs, ["spark", "shuffle"], k=5)
             .collect()]
    ones = spark.createDataFrame([("spark", 1.0), ("shuffle", 1.0)],
                                 "term string, weight double")
    weighted = [(r.rank, r.doc_id, r.score)
                for r in bm.bm25_topk_weighted(docs, ones, k=5).collect()]
    assert plain == weighted
    # a zero-weight term contributes nothing
    zero = spark.createDataFrame([("spark", 1.0), ("shuffle", 0.0)],
                                 "term string, weight double")
    only_spark = {r.doc_id: r.score
                  for r in bm.bm25_topk_weighted(docs, zero, k=5)
                  .collect()}
    solo = {r.doc_id: r.score
            for r in bm.bm25_topk(docs, ["spark"], k=5).collect()}
    assert only_spark == solo


def test_map_mrr_at_k_known_values(spark):
    # run: ranks 1..5; relevant = {a, c, f} (f never returned).
    res = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")],
        "rank long, doc_id string")
    # duplicate judgment rows for 'a' must not fan out the hit join
    jud = spark.createDataFrame(
        [("a", 1), ("a", 2), ("c", 1), ("f", 3), ("b", 0)],
        "doc_id string, rel long")
    row = bm25.map_mrr_at_k(res, jud, k=5).collect()[0]
    assert (row.n_rel, row.n_hits, row.first_rank) == (3, 2, 1)
    # AP = (1/3) * (1/1 + 2/3) = 5/9
    assert row.ap == round(5.0 / 9.0, 6)
    assert row.mrr == 1.0
    assert row.recall == round(2.0 / 3.0, 6)


def test_map_mrr_at_k_no_hits(spark):
    res = spark.createDataFrame([(1, "x")], "rank long, doc_id string")
    jud = spark.createDataFrame([("a", 1)], "doc_id string, rel long")
    row = bm25.map_mrr_at_k(res, jud, k=5).collect()[0]
    assert (row.n_hits, row.first_rank, row.ap, row.mrr) == (0, 0, 0.0, 0.0)


def test_vocab_growth_checkpoints(spark):
    docs = spark.createDataFrame(
        [(i, f"x t{i // 5}") for i in range(10)],
        "doc_id long, text string")
    rows = {r.checkpoint: r for r in
            bm25.vocab_growth(docs, n_checkpoints=2).collect()}
    assert rows[1].new_terms == 2 and rows[1].vocab == 2   # x, t0
    assert rows[1].boundary_id == 4
    assert rows[2].new_terms == 1 and rows[2].vocab == 3   # t1
    assert rows[2].boundary_id == 9


# --------------------------------------------------------- phrase search


def _phrase(spark, texts, phrase):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    from eventrelationextractor_spark.ops import bm25
    return {r.doc_id: (r.n_matches, r.first_pos)
            for r in bm25.phrase_search(docs, phrase).collect()}


def test_phrase_search_counts_and_positions(spark):
    got = _phrase(spark, ["a b c a b", "b a", "a b"], ["a", "b"])
    assert got == {0: (2, 0), 2: (1, 0)}    # doc 1 has "b a", not "a b"


def test_phrase_search_repeated_token(spark):
    # the distinct-offset subtlety: a single 'x' must NOT match "x x"
    got = _phrase(spark, ["x y x x z x x x", "x y", "y x x y"], ["x", "x"])
    # doc 0: anchors at 2,5,6; doc 2: anchor 1
    assert got == {0: (3, 2), 2: (1, 1)}


def test_phrase_search_punctuation_and_case(spark):
    got = _phrase(spark, ["Fast, TABLE! scan", "fasttable"],
                  ["fast", "table"])
    assert got == {0: (1, 0)}


def test_phrase_search_single_token_and_empty(spark):
    import pytest as _pytest

    from eventrelationextractor_spark.ops import bm25
    got = _phrase(spark, ["w w", "v"], ["w"])
    assert got == {0: (2, 0)}
    docs = spark.createDataFrame([(0, "w")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25.phrase_search(docs, [])


# ------------------------------------------------------------- textrank


def test_textrank_matches_python_power_iteration(spark):
    from eventrelationextractor_spark.ops import bm25
    texts = ["graph rank graph node", "node rank weight",
             "isolated"]                     # 1-token doc -> no edges
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r.term: r for r in
           bm25.textrank_keywords(docs, window=2, n_iter=4).collect()}

    # python replay: same co-occurrence construction
    from collections import Counter
    e = Counter()
    for t in texts:
        ws = t.split()
        for i, u in enumerate(ws):
            for j in range(i + 1, min(i + 3, len(ws))):
                if u != ws[j]:
                    e[(u, ws[j])] += 1
                    e[(ws[j], u)] += 1
    terms = sorted({w for t in texts for w in t.split()})
    n, d = len(terms), 0.85
    w_out = {u: sum(w for (a, _), w in e.items() if a == u)
             for u in terms}
    r = {t: 1.0 / n for t in terms}
    for _ in range(4):
        infl = {t: 0.0 for t in terms}
        for (u, v), w in e.items():
            infl[v] += w / w_out[u] * r[u]
        r = {t: (1.0 - d) / n + d * infl[t] for t in terms}
    for t in terms:
        assert got[t].rank == round(r[t], 6), t
        assert got[t].w_out == w_out.get(t, 0)
    # the isolated term sits at the teleport floor
    assert got["isolated"].rank == round((1 - d) / n, 6)
    assert got["isolated"].w_out == 0


def test_textrank_hub_term_outranks_leaf(spark):
    from eventrelationextractor_spark.ops import bm25
    docs = spark.createDataFrame(
        [(i, f"core term{i}") for i in range(6)],
        "doc_id long, text string")
    got = {r.term: r.rank for r in
           bm25.textrank_keywords(docs, n_iter=5).collect()}
    assert all(got["core"] > got[f"term{i}"] for i in range(6))


# --------------------------------------------------- min-span proximity


def _minspan(spark, texts, terms):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    from eventrelationextractor_spark.ops import bm25
    return {r.doc_id: (r.min_span, r.n_covers, r.best_end)
            for r in bm25.min_span_proximity(docs, terms).collect()}


def test_min_span_basic(spark):
    # doc 0: "a x x b" -> only cover ends at b (pos 3), span 4
    # doc 1: "a b" -> span 2; doc 2 misses 'b' entirely -> dropped
    got = _minspan(spark, ["a x x b", "a b", "a a a"], ["a", "b"])
    assert got == {0: (4, 1, 3), 1: (2, 1, 1)}


def test_min_span_shrinks_on_repeat(spark):
    # covers end only AT query-term occurrences: pos2 (span 3) and
    # pos4 (span 5 - still anchored at a@0)
    got = _minspan(spark, ["a x b x b"], ["a", "b"])
    assert got == {0: (3, 2, 2)}
    # "a x b a b": covers at pos2 (span 3), pos3 (a@3,b@2 -> span 2),
    # pos4 (a@3,b@4 -> span 2); first minimal window ends at pos3
    got = _minspan(spark, ["a x b a b"], ["a", "b"])
    assert got == {0: (2, 3, 3)}


def test_min_span_single_term_missing_guard(spark):
    # a doc holding ONE of the terms must not emit a bogus 1-cover
    got = _minspan(spark, ["a a a", "b", "b a"], ["a", "b"])
    assert got == {2: (2, 1, 1)}


def test_min_span_duplicate_query_terms_collapse(spark):
    got = _minspan(spark, ["a x b"], ["a", "b", "a", "b"])
    assert got == {0: (3, 1, 2)}


def test_min_span_three_terms(spark):
    got = _minspan(spark, ["c a x b a c"], ["a", "b", "c"])
    # covers: pos3 (span 4: c..b), pos4 (b,a at 3,4 + c at 0 -> span 5)?
    # last positions at pos4: a=4,b=3,c=0 -> span 5; pos5: a=4,b=3,c=5
    # -> span 3 (b a c). min=3 at pos5.
    assert got == {0: (3, 3, 5)}


# ------------------------------------------------- extractive summary


def test_extractive_topk_prefers_rare_terms(spark):
    from eventrelationextractor_spark.ops import bm25
    # 'zebra quagga' appears in one doc only -> high idf; 'the common'
    # words appear everywhere -> near-zero idf
    docs = spark.createDataFrame(
        [(0, "the common words. zebra quagga here. the common again."),
         (1, "the common words. more of the common."),
         (2, "the common words here too.")],
        "doc_id long, text string")
    out = [r for r in bm25.extractive_topk(docs, k=1).collect()
           if r.doc_id == 0]
    assert len(out) == 1
    assert "zebra" in out[0].sentence and out[0].rank == 1


def test_extractive_topk_rank_and_tiebreak(spark):
    from eventrelationextractor_spark.ops import bm25
    # identical sentences tie on score -> sent_idx breaks the tie;
    # doc 1 deflates the idf of the repeated sentence's terms
    docs = spark.createDataFrame(
        [(0, "same words here. same words here. different unique gem."),
         (1, "same words here and more.")],
        "doc_id long, text string")
    out = sorted((r for r in bm25.extractive_topk(docs, k=2).collect()
                  if r.doc_id == 0), key=lambda r: r.rank)
    assert out[0].sentence.startswith("different")
    assert out[1].sent_idx == 0      # tie between 0 and 1 -> lower idx


# ------------------------------------------------- query likelihood


def test_query_likelihood_matches_reference(spark):
    import math

    from eventrelationextractor_spark.ops import bm25
    texts = ["cat cat dog", "dog mouse", "bird bird bird", "cat"]
    out = {r.doc_id: r.score for r in bm25.query_likelihood_topk(
        _docs_df(spark, texts), ["cat", "dog"], k=10, mu=10).collect()}
    toks = [t.split() for t in texts]
    clen = sum(len(t) for t in toks)
    ctf = {"cat": 3, "dog": 2}
    exp = {}
    for d, t in enumerate(toks):
        if not (set(t) & set(ctf)):
            continue   # not a candidate
        s = 0.0
        for term, c in ctf.items():
            s += math.log((t.count(term) + 10 * c / clen)
                          / (len(t) + 10))
        exp[d] = round(s, 6)
    assert set(out) == set(exp) == {0, 1, 3}
    for d in exp:
        assert abs(out[d] - exp[d]) < 1e-6


def test_query_likelihood_absent_corpus_term_dropped(spark):
    from eventrelationextractor_spark.ops import bm25
    out = bm25.query_likelihood_topk(
        _docs_df(spark, ["cat dog", "dog"]), ["cat", "unseenzz"],
        k=5).collect()
    # no -inf anywhere; doc 0 ranks first on the remaining term
    assert all(r.score == r.score and r.score > -1e9 for r in out)
    assert out[0].doc_id == 0


def test_bcubed_perfect_and_merged(spark):
    from eventrelationextractor_spark.ops.cluster import bcubed
    # perfect clustering: every metric = 1e6 exactly
    rows = [(1, 10), (1, 10), (2, 20), (2, 20), (3, 30)]
    perfect = spark.createDataFrame(
        [(p, p * 10) for p, _ in [(r[0], 0) for r in rows]], "pred long, gold long")
    got = bcubed(perfect).collect()[0]
    assert (got.b3_precision_ppm, got.b3_recall_ppm, got.b3_f1_ppm) == \
        (1000000, 1000000, 1000000)
    # everything merged into one predicted cluster over 2 gold clusters
    # of sizes 2 and 3: recall stays 1, precision = (2*2/5 + 3*3/5)/5
    merged = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (1, 20), (1, 20)], "pred long, gold long")
    got = bcubed(merged).collect()[0]
    assert got.n_items == 5
    assert got.b3_recall_ppm == 1000000
    # per-cell micro-units: 4*1e6//5 + 9*1e6//5 = 800000+1800000, /5
    assert got.b3_precision_ppm == (4 * 1000000 // 5 + 9 * 1000000 // 5) // 5
    # over-splitting: each item its own cluster -> precision 1,
    # recall = mean(1/|gold|) = (2*(1e6//2) + 3*(1e6//3))//5
    split = spark.createDataFrame(
        [(i, 10 if i < 2 else 20) for i in range(5)], "pred long, gold long")
    got = bcubed(split).collect()[0]
    assert got.b3_precision_ppm == 1000000
    assert got.b3_recall_ppm == (2 * (1000000 // 2) + 3 * (1000000 // 3)) // 5


def test_kcenter_select_planted_geometry(spark):
    """Three tight planted blobs + the min-id start: the first three
    picks must visit all three blobs before any within-blob pick."""
    from eventrelationextractor_spark.ops.cluster import kcenter_select
    import itertools
    blobs = {0: [0.0, 0.0], 1: [10.0, 0.0], 2: [0.0, 10.0]}
    rows = []
    for vid, (b, jitter) in enumerate(itertools.product(range(3),
                                                        range(4))):
        cx, cy = blobs[b]
        rows.append((vid, [cx + jitter * 0.01, cy - jitter * 0.01], b))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = kcenter_select(emb, k=3).orderBy("rank").collect()
    assert got[0].vec_id == 0 and got[0].dist6 == 0.0
    picked_blobs = [rows[r.vec_id][2] for r in got]
    assert sorted(picked_blobs) == [0, 1, 2]
    assert got[1].dist6 > 90 and got[2].dist6 > 90


def test_stopword_profile_entropy_and_threshold(spark):
    # 'the' in all 4 docs across both sources (flat -> high entropy);
    # 'rare' in one doc of one source (entropy 0)
    rows = [(1, "the cat", "s0"), (2, "the dog", "s0"),
            (3, "the fox", "s1"), (4, "the rare", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                               " source string")
    out = {r.term: r for r in bm25.stopword_profile(
        df, k=10, threshold_ppm=750000).collect()}
    the = out["the"]
    assert (the.rank, the.df, the.df_ppm) == (1, 4, 1000000)
    assert the.is_stopword
    # entropy of (2,2) over sources = ln(2)
    assert abs(the.source_entropy - 0.693147) < 1e-6
    rare = out["rare"]
    assert (rare.df, rare.df_ppm, rare.is_stopword) == (1, 250000, False)
    assert rare.source_entropy == 0.0


def test_bm25f_anchor_weight_beats_body_tf(spark):
    # q in doc 1's anchor (weight 4) vs TWICE in doc 2's body: fielded
    # combination must outrank the body-only doc; doc 3 has no hit
    rows = [(1, "alpha beta gamma", "q zzz"),
            (2, "q beta q gamma", "other link"),
            (3, "alpha beta gamma", "other link")]
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                               " anchor string")
    out = bm25.bm25f_topk(df, ["q"],
                          [("text", 1.0, 0.75), ("anchor", 4.0, 0.5)],
                          k=5).collect()
    assert [r.doc_id for r in out] == [1, 2]      # no zero-score rows
    assert out[0].score > out[1].score
    # single saturation: a doc hitting BOTH fields scores less than the
    # sum of two independently saturated per-field scores would suggest
    both = spark.createDataFrame(
        [(1, "q beta", "q link"), (2, "alpha beta", "other zzz")],
        "doc_id long, text string, anchor string")
    r = bm25.bm25f_topk(both, ["q"],
                        [("text", 1.0, 0.75), ("anchor", 1.0, 0.5)],
                        k=5).collect()
    assert [x.doc_id for x in r] == [1]
