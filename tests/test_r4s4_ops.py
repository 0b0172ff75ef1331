"""Round-4 session-4 operators: bucketed batching, posting sizing,
prefix completions, AMS F2 sketch, harmonic centrality."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventrelationextractor_spark.ops import bm25, graph, mining, packing, quality, simsearch, sketches, textstats  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- batching

def test_bucketed_batches_pow2_and_waste(spark):
    # token counts 1, 2, 3, 5, 16, 17 -> buckets 1, 2, 4, 8, 16, 32
    rows = [(0, "a"), (1, "a b"), (2, "a b c"), (3, "a b c d e"),
            (4, " ".join(["t"] * 16)), (5, " ".join(["t"] * 17))]
    got = {r.bucket_len: r for r in
           packing.bucketed_batches(_docs(spark, rows),
                                    batch_size=2).collect()}
    assert sorted(got) == [1, 2, 4, 8, 16, 32]
    # bucket 4 holds the 3-token doc: pad 1, waste 1e6*1//4 = 250000
    assert got[4].n_docs == 1 and got[4].pad_tokens == 1
    assert got[4].waste_ppm == 250000
    # exact power of two stays in its own bucket with zero pad
    assert got[16].pad_tokens == 0 and got[16].waste_ppm == 0
    # 17 tokens -> bucket 32, pad 15
    assert got[32].pad_tokens == 15


def test_bucketed_batches_ceil_batches_and_clamp(spark):
    rows = [(i, "a b c") for i in range(5)]  # 5 docs, bucket 4
    r = packing.bucketed_batches(_docs(spark, rows), batch_size=2).collect()
    assert len(r) == 1 and r[0].n_batches == 3  # ceil(5/2)
    # clamp: a 10-token doc with max_len=8 lands in bucket 8 with 0 pad
    long_doc = [(0, " ".join(["t"] * 10))]
    r = packing.bucketed_batches(_docs(spark, long_doc), batch_size=2,
                                 max_len=8).collect()
    assert r[0].bucket_len == 8 and r[0].token_sum == 8


# ---------------------------------------------------------------- postings

def test_posting_list_sizes_varint_staircase(spark):
    # term 'x' in docs 0 and 200: gaps 0 (1 byte) and 200 (2 bytes)
    rows = [(0, "x"), (200, "x y"), (201, "y")]
    got = {r.term: r for r in
           bm25.posting_list_sizes(_docs(spark, rows), k=10).collect()}
    assert got["x"].df == 2 and got["x"].bytes == 3
    # 'y': first posting doc 200 -> gap 200 (2 bytes), then gap 1 (1 byte)
    assert got["y"].df == 2 and got["y"].bytes == 3
    assert got["x"].bytes_per_posting_ppm == 1500000


def test_posting_list_sizes_topk_plan(spark):
    df = bm25.posting_list_sizes(_docs(spark, [(0, "a b"), (1, "b")]), k=5)
    plan = df._jdf.queryExecution().toString().split(
        "== Physical Plan ==")[-1]
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------- completions

def test_prefix_completions_ranks(spark):
    rows = [(i, "apple apply ant") for i in range(5)] + \
           [(100 + i, "apple") for i in range(3)]
    got = bm25.prefix_completions(_docs(spark, rows), min_len=2, max_len=3,
                                  per_prefix=2, min_count=5).collect()
    by_prefix = {}
    for r in got:
        by_prefix.setdefault(r.prefix, []).append((r.rank, r.term, r.n))
    # 'ap': apple (8) then apply (5)
    assert sorted(by_prefix["ap"]) == [(1, "apple", 8), (2, "apply", 5)]
    # 'an': best completion 'ant' has n=5 -> kept
    assert sorted(by_prefix["an"]) == [(1, "ant", 5)]
    # per_prefix=2 never exceeded
    assert all(len(v) <= 2 for v in by_prefix.values())


def test_prefix_completions_min_count_drops(spark):
    got = bm25.prefix_completions(_docs(spark, [(0, "zebra")]),
                                  min_count=5).collect()
    assert got == []


# ------------------------------------------------------------------ AMS F2

def test_ams_f2_exact_and_bounds(spark):
    rows = [(0, "a a b"), (1, "a c")]  # counts: a=3, b=1, c=1
    got = {(r.kind, r.j): r.value for r in
           sketches.ams_f2(_docs(spark, rows), n_rows=8).collect()}
    assert got[("exact_f2", -2)] == 9 + 1 + 1
    total = 3 + 1 + 1
    sketch_vals = [v for (k, _), v in got.items() if k == "sketch"]
    assert len(sketch_vals) == 8
    assert all(0 <= v <= total * total for v in sketch_vals)
    ordered = sorted(sketch_vals)
    assert got[("median2x", -1)] == ordered[3] + ordered[4]


def test_ams_f2_depends_only_on_frequencies(spark):
    a = sketches.ams_f2(_docs(spark, [(0, "x y"), (1, "x")]), n_rows=8)
    b = sketches.ams_f2(_docs(spark, [(7, "x x y")]), n_rows=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------------------ harmonic

def test_harmonic_from_seeds_exact(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: (r.n_seeds_reaching, r.harmonic_ppm) for r in
           graph.harmonic_from_seeds(edges, seeds, max_hops=4).collect()}
    assert got == {2: (1, 1000000), 3: (1, 500000), 4: (1, 1000000)}


def test_harmonic_from_seeds_two_seeds_sum(spark):
    # 1 -> 2, 3 -> 2: node 2 reached by both seeds at d=1
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    got = {r.node: (r.n_seeds_reaching, r.harmonic_ppm) for r in
           graph.harmonic_from_seeds(edges, seeds, max_hops=3).collect()}
    assert got == {2: (2, 2000000)}


def test_harmonic_min_distance_wins(spark):
    # two routes to node 3: direct (d=1) and via 2 (d=2) -> min d=1
    edges = spark.createDataFrame(
        [(1, 3), (1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.harmonic_ppm for r in
           graph.harmonic_from_seeds(edges, seeds, max_hops=4).collect()}
    assert got[3] == 1000000


# ------------------------------------------------------------------ simrank

def test_simrank_single_common_parent(spark):
    # 3 -> 1, 3 -> 2: identical in-neighbor sets -> C = 0.8 exactly
    e = spark.createDataFrame([(3, 1), (3, 2)], "src long, dst long")
    got = sorted(map(tuple, graph.simrank_pairs(e, n_iter=3).collect()))
    assert got == [(1, 2, 800000)]


def test_simrank_second_order(spark):
    # I(3) = I(4) = {1, 2}; 1 and 2 have no in-links so s(1,2) = 0:
    # s(3,4) = 0.8/4 * (s(1,1) + s(2,2)) = 0.4 at every round
    e = spark.createDataFrame([(1, 3), (2, 3), (1, 4), (2, 4)],
                              "src long, dst long")
    got = sorted(map(tuple, graph.simrank_pairs(e, n_iter=2).collect()))
    assert got == [(3, 4, 400000)]


def test_simrank_off_diagonal_feeds_next_round(spark):
    # parents 1,2 made similar by a shared grandparent 0; children 5,6
    # then pick up BOTH the diagonal and the off-diagonal term:
    # round1: s(1,2) = 0.8; round2: s(5,6) = 0.8/1 * s(1,2)... with
    # I(5)={1}, I(6)={2}: s(5,6) = 0.8 * s(1,2) = 640000
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 5), (2, 6)], "src long, dst long")
    got = {(r.a, r.b): r.score_ppm for r in
           graph.simrank_pairs(e, n_iter=2).collect()}
    assert got[(1, 2)] == 800000
    assert got[(5, 6)] == 640000


def test_simrank_min_ppm_prunes(spark):
    e = spark.createDataFrame([(3, 1), (3, 2)], "src long, dst long")
    got = graph.simrank_pairs(e, n_iter=1, min_ppm=900000).collect()
    assert got == []


# -------------------------------------------------------------------- stump

def test_decision_stump_perfect_split(spark):
    import pyspark.sql.functions as F
    rows = [(i, 1) for i in range(0, 64, 16)] + \
           [(i, 0) for i in range(64, 128, 16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {r.threshold: r for r in quality.decision_stump(
        df, F.col("y") == 1, feature_col="x", bucket_width=16).collect()}
    # threshold 3 separates perfectly: gini 0
    assert got[3].gini_ppm == 0 and got[3].is_best
    assert got[3].l_pos == 4 and got[3].r_pos == 0
    assert sum(1 for r in got.values() if r.is_best) == 1


def test_decision_stump_tie_breaks_lowest_threshold(spark):
    import pyspark.sql.functions as F
    # symmetric data -> several thresholds tie; lowest must win
    rows = [(0, 1), (16, 1), (32, 1), (48, 1)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [r for r in quality.decision_stump(
        df, F.col("y") == 1, feature_col="x", bucket_width=16).collect()
        if r.is_best]
    assert len(got) == 1 and got[0].threshold == 0


# ------------------------------------------------------------------- maxsim

def test_maxsim_exact_match_scores_highest(spark):
    rows = [(0, "hash join stream"), (1, "hash only here"),
            (2, "totally unrelated words")]
    got = simsearch.maxsim_topk(_docs(spark, rows),
                                ["hash", "join", "stream"], k=3).collect()
    by_id = {r.doc_id: (r.rank, r.score) for r in got}
    assert by_id[0][0] == 1 and abs(by_id[0][1] - 3.0) < 1e-9
    # doc 1 contains one exact term -> its max for 'hash' is 1.0
    assert by_id[1][1] < 3.0 and by_id[1][1] > by_id[2][1] - 3.0


def test_maxsim_python_replay(spark):
    import hashlib
    import math
    rows = [(0, "alpha beta"), (1, "gamma delta epsilon")]
    terms = ["alpha", "zeta"]

    def vec(t):
        return [2 * int(c, 16) - 15
                for c in hashlib.md5(t.encode()).hexdigest()[:16]]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / math.sqrt(sum(x * x for x in a)
                                   * sum(y * y for y in b)), 6)

    expected = {}
    for doc_id, text in rows:
        toks = set(text.split())
        s = sum(max(cos(vec(q), vec(t)) for t in toks) for q in terms)
        expected[doc_id] = round(s, 6)
    got = {r.doc_id: r.score for r in simsearch.maxsim_topk(
        _docs(spark, rows), terms, k=5).collect()}
    assert got == expected


# ---------------------------------------------------------------- scc pivot

def test_scc_pivot_cycle_vs_tail(spark):
    # cycle 1->2->3->1 plus tail 3->4: pivot=1, SCC={1,2,3}, fw-only={4}
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (3, 4)],
                              "src long, dst long")
    got = {r.node: (r.fw, r.bw, r.in_scc) for r in
           graph.scc_pivot(e, max_hops=8).collect()}
    assert got[1] == (True, True, True)
    assert got[2] == (True, True, True)
    assert got[3] == (True, True, True)
    assert got[4] == (True, False, False)


def test_scc_pivot_skips_dangling_min_node(spark):
    # node 0 is a pure sink; pivot must be 1 (min src), whose SCC is {1,2}
    e = spark.createDataFrame([(1, 0), (1, 2), (2, 1)],
                              "src long, dst long")
    got = {r.node: r.in_scc for r in graph.scc_pivot(e).collect()}
    assert got == {0: False, 1: True, 2: True}


# --------------------------------------------------------------------- ltr

def test_ltr_features_exact_counts(spark):
    rows = [(0, "hash hash join other"), (1, "nothing relevant"),
            (2, "join")]
    got = {r.doc_id: r for r in bm25.ltr_features(
        _docs(spark, rows), ["hash", "join"]).collect()}
    assert 1 not in got  # no match -> no row
    assert got[0].n_matched == 2 and got[0].sum_tf == 3
    assert got[0].min_tf == 1 and got[0].max_tf == 2
    assert got[0].doc_len == 4
    assert got[2].n_matched == 1 and got[2].doc_len == 1
    # df: hash in 1 doc, join in 2 docs
    assert got[0].min_df == 1 and got[0].max_df == 2
    assert got[2].min_df == 2 and got[2].max_df == 2


def test_ltr_bm25_matches_topk_score(spark):
    rows = [(i, f"hash join term{i}") for i in range(6)]
    feats = {r.doc_id: r.bm25 for r in bm25.ltr_features(
        _docs(spark, rows), ["hash", "join"]).collect()}
    topk = {r.doc_id: r.score for r in bm25.bm25_topk(
        _docs(spark, rows), ["hash", "join"], k=10).collect()}
    assert feats == topk


# ---------------------------------------------------------------- trending

def test_term_lift_detects_planted_drift(spark):
    from pyspark.sql import functions as F
    rows = [(i, "common words here") for i in range(20)] + \
           [(100 + i, "common words here fresh fresh fresh fresh fresh")
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("is_new", F.col("doc_id") >= 100)
    got = textstats.term_lift(df, k=5, min_new=3).collect()
    assert got[0].term == "fresh" and got[0].ref_cnt == 0
    assert got[0].new_cnt == 20
    # stationary terms have lift ~1e6; fresh must dominate
    assert got[0].lift_ppm > 2 * got[1].lift_ppm


def test_term_lift_min_support(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(0, "base text"), (1, "base text rare")],
        "doc_id long, text string").withColumn("is_new",
                                               F.col("doc_id") == 1)
    got = textstats.term_lift(df, min_new=2).collect()
    assert all(r.term != "rare" for r in got)


# ---------------------------------------------------------------- gazetteer

def test_gazetteer_leftmost_longest(spark):
    # "sort table scan" must beat "sort table"-less shorter overlap
    rows = [(0, "the sort table scan runs"), (1, "hash scan hash scan")]
    got = sorted((r.doc_id, r.start_tok, r.end_tok, r.phrase) for r in
                 mining.gazetteer_spans(
                     _docs(spark, rows),
                     ["sort table scan", "table scan", "scan",
                      "hash scan"]).collect())
    assert (0, 2, 4, "sort table scan") in got
    # the contained "table scan" / "scan" matches are suppressed
    assert not any(d == 0 and p != "sort table scan" for d, _, _, p in got)
    # non-overlapping repeats both reported
    assert (1, 1, 2, "hash scan") in got and (1, 3, 4, "hash scan") in got


def test_gazetteer_resumes_past_match(spark):
    # "a b" at 1-2, then "b c" starting at 2 overlaps -> suppressed;
    # "c d" at 3-4 clears the kept end -> reported
    rows = [(0, "a b c d")]
    got = sorted((r.start_tok, r.phrase) for r in mining.gazetteer_spans(
        _docs(spark, rows), ["a b", "b c", "c d"]).collect())
    assert got == [(1, "a b"), (3, "c d")]


def test_gazetteer_tokenizer_contract(spark):
    # punctuation splits; case folds
    rows = [(0, "Hash-SCAN, then: stream!")]
    got = [(r.start_tok, r.end_tok, r.phrase) for r in
           mining.gazetteer_spans(_docs(spark, rows),
                                  ["hash scan", "stream"]).collect()]
    assert sorted(got) == [(1, 2, "hash scan"), (4, 4, "stream")]


# ----------------------------------------------------------- split leakage

def test_split_leakage_closed_form(spark):
    from eventrelationextractor_spark.ops import maintenance
    # 4 copies of one text: whatever splits they land in, total pairs
    # must be C(4,2) = 6 across all cells; a unique doc adds nothing
    rows = [(i, "same text everywhere") for i in range(4)] + \
           [(100, "unique snowflake")]
    got = maintenance.split_leakage(
        _docs(spark, rows), {"train": 0.5, "val": 0.5}).collect()
    assert sum(r.n_pairs for r in got) == 6
    cells = {(r.split_a, r.split_b): r for r in got}
    assert set(cells) == {("train", "train"), ("train", "val"),
                          ("val", "val")}
    assert cells[("train", "val")].is_leak
    assert not cells[("train", "train")].is_leak


def test_split_leakage_heldout_bucket(spark):
    from eventrelationextractor_spark.ops import maintenance
    got = maintenance.split_leakage(
        _docs(spark, [(0, "x"), (1, "x")]), {"train": 0.5}).collect()
    assert {(r.split_a, r.split_b) for r in got} == \
        {("heldout", "heldout"), ("heldout", "train"), ("train", "train")}
    assert sum(r.n_pairs for r in got) == 1


# -------------------------------------------------------------------- katz

def test_katz_exact_hand_rolled(spark):
    # chain 1 -> 2 -> 3: after enough rounds
    # k(1) = 1e6, k(2) = 1e6 + k(1)//8, k(3) = 1e6 + k(2)//8
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r.node: r.katz_ppm for r in
           graph.katz_centrality(e, n_iter=3).collect()}
    assert got[1] == 1000000
    assert got[2] == 1000000 + 1000000 // 8
    assert got[3] == 1000000 + got[2] // 8


def test_katz_parallel_edges_count_twice(spark):
    e = spark.createDataFrame([(1, 2), (1, 2)], "src long, dst long")
    got = {r.node: r.katz_ppm for r in
           graph.katz_centrality(e, n_iter=1).collect()}
    assert got[2] == 1000000 + 2000000 // 8


# --------------------------------------------------------------- layout A/B

def test_layout_prune_ab_zorder_wins_on_squares(spark):
    from eventrelationextractor_spark.ops import layout
    # points on a 32x32 grid in natural row-major order: a y-slab
    # predicate prunes nothing under natural order but prunes under
    # zorder; file counts always equal n_files
    rows = [(i % 32, (i * 17 + 5) % 32, i) for i in range(512)]
    df = spark.createDataFrame(rows, "x long, y long, ord long")
    got = {(r.layout, r.qid): r for r in layout.layout_prune_ab(
        df, "x", "y", "ord", [(1, 0, 3, 0, 3)], n_files=8,
        bits=5).collect()}
    assert got[("natural", 1)].files_total == 8
    assert got[("zorder", 1)].files_total == 8
    # zorder must scan no MORE files than natural for a small square
    assert got[("zorder", 1)].files_scanned <= \
        got[("natural", 1)].files_scanned
    for r in got.values():
        assert r.prune_ppm == 1000000 * (r.files_total - r.files_scanned) \
            // r.files_total


def test_layout_prune_full_range_scans_everything(spark):
    from eventrelationextractor_spark.ops import layout
    rows = [(i % 16, i % 16, i) for i in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, ord long")
    got = layout.layout_prune_ab(df, "x", "y", "ord",
                                 [(1, 0, 15, 0, 15)], n_files=4,
                                 bits=4).collect()
    assert all(r.files_scanned == r.files_total and r.prune_ppm == 0
               for r in got)


# ------------------------------------------------------------ cluster labels

def test_class_tfidf_distinctive_terms_win(spark):
    rows = [(0, "alpha alpha shared", "c1"), (1, "beta shared", "c2"),
            (2, "gamma shared", "c3")]
    df = spark.createDataFrame(rows, "doc_id long, text string, cls string")
    got = {(r["class"], r.rank): r for r in
           bm25.class_tfidf_labels(df, "cls", k=2).collect()}
    # distinctive terms rank first; 'shared' (df=3, ln(1)=0) scores 0
    assert got[("c1", 1)].term == "alpha" and got[("c1", 1)].tf == 2
    assert got[("c2", 1)].term == "beta"
    assert got[("c1", 2)].term == "shared" and got[("c1", 2)].score == 0.0


# ------------------------------------------------------------- landmarks

def test_landmark_bounds_exact_on_path(spark):
    # undirected path 0-1-2-3, landmark {0}, pair (1, 3):
    # lower = |1-3| = 2, upper = 1+3 = 4 (true distance 2)
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                              "src long, dst long")
    lm = spark.createDataFrame([(0,)], "node long")
    pr = spark.createDataFrame([(1, 3)], "u long, v long")
    got = graph.landmark_bounds(e, lm, pr, max_hops=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_landmarks, r.lower, r.upper) == (1, 2, 4)


def test_landmark_bounds_tighten_with_more_landmarks(spark):
    # adding landmark 2 (adjacent to both 1 and 3) tightens upper to 2
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                              "src long, dst long")
    lm = spark.createDataFrame([(0,), (2,)], "node long")
    pr = spark.createDataFrame([(1, 3)], "u long, v long")
    r = graph.landmark_bounds(e, lm, pr, max_hops=4).collect()[0]
    assert r.n_landmarks == 2 and r.lower == 2 and r.upper == 2


def test_landmark_one_sided_excluded(spark):
    # landmark reaches u but not v within the hop budget -> no row
    e = spark.createDataFrame([(0, 1), (5, 6)], "src long, dst long")
    lm = spark.createDataFrame([(0,)], "node long")
    pr = spark.createDataFrame([(1, 6)], "u long, v long")
    assert graph.landmark_bounds(e, lm, pr, max_hops=4).collect() == []
