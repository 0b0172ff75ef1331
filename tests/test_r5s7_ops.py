"""Round-5 session-7 operators: exact distributed NTILE / RFM
segmentation census and VARIANT-typed JSON schema inference.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import events, maintenance

# --------------------------------------------------------- exact ntile


def test_exact_ntile_matches_sql_ntile(spark):
    """The bucket-offset tile arithmetic must reproduce Spark's own
    NTILE (SQL-standard larger-tiles-first) for n % k != 0, across a
    value distribution that spans several buckets."""
    rows = [(i, (i * 37) % 23) for i in range(17)]
    df = spark.createDataFrame(rows, "uid long, x long")
    got = {r["uid"]: r["tile"]
           for r in events._exact_ntile(df, "x", "uid", 5, 4).collect()}
    want = {r["uid"]: r["t"] for r in df.selectExpr(
        "uid", "ntile(5) OVER (ORDER BY x, uid) AS t").collect()}
    assert got == want


def test_exact_ntile_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1, 10), (2, 5), (3, 7)],
                               "uid long, x long")
    got = {r["uid"]: r["tile"]
           for r in events._exact_ntile(df, "x", "uid", 5, 4).collect()}
    assert got == {2: 1, 3: 2, 1: 3}


def test_rfm_segments_shape_and_conservation(spark):
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 9:02d} 10:00:00", i % 7, "c", 1.0 + i)
         for i in range(40)],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double").withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = events.rfm_segments(df).collect()
    assert sum(r["n_users"] for r in out) == 7
    total_cents = sum(r["cents"] for r in out)
    assert total_cents == sum(100 * (1 + i) + 0 for i in range(40))
    for r in out:
        for c in ("r_q", "f_q", "m_q"):
            assert 1 <= r[c] <= 5

# --------------------------------------------------- json schema infer


def test_json_schema_infer_classes(spark):
    df = spark.createDataFrame(
        [('{"a":5,"b":"x","c":1.5,"d":{"e":true},"f":null}',),
         ('{"a":"five","g":-3}',)], "js string")
    out = {(r["path"], r["jtype"]): r["n"]
           for r in maintenance.json_schema_infer(df).collect()}
    assert out == {
        ("a", "int"): 1, ("a", "string"): 1, ("b", "string"): 1,
        ("c", "float"): 1, ("d", "object"): 1, ("d.e", "bool"): 1,
        ("f", "null"): 1, ("g", "int"): 1}


def test_json_schema_infer_conflicting_path_counts(spark):
    df = spark.createDataFrame(
        [('{"c":true}',), ('{"c":2.5}',), ('{"c":2.5}',),
         ('{"c":null}',), ('{}',)], "js string")
    out = {(r["path"], r["jtype"]): r["n"]
           for r in maintenance.json_schema_infer(df).collect()}
    assert out == {("c", "bool"): 1, ("c", "float"): 2,
                   ("c", "null"): 1}

# ------------------------------------------------------ wordpiece


def test_wordpiece_vocab_char_coverage_both_flavors(spark):
    from eventrelationextractor_spark.ops import bpe
    words = spark.createDataFrame([("ab", 1), ("ba", 1)],
                                  "w string, freq long")
    units = {r["unit"] for r in
             bpe.wordpiece_vocab(words, k=1, max_len=4).collect()}
    assert {"a", "b", "##a", "##b"} <= units


def test_wordpiece_census_greedy_longest_match(spark):
    from eventrelationextractor_spark.ops import bpe
    words = spark.createDataFrame([("hello", 2)], "w string, freq long")
    vocab = spark.createDataFrame(
        [(u,) for u in ["he", "##ll", "##o", "h", "e", "l", "o",
                        "##h", "##e", "##l"]], "unit string")
    out = {r["unit"]: (r["uses"], r["n_words"])
           for r in bpe.wordpiece_census(words, vocab).collect()}
    assert out == {"he": (2, 1), "##ll": (2, 1), "##o": (2, 1)}


def test_wordpiece_census_repeat_unit_multiplicity(spark):
    from eventrelationextractor_spark.ops import bpe
    words = spark.createDataFrame([("aaaa", 3)], "w string, freq long")
    vocab = spark.createDataFrame([("a",), ("##a",)], "unit string")
    out = {r["unit"]: r["uses"]
           for r in bpe.wordpiece_census(words, vocab).collect()}
    assert out == {"a": 3, "##a": 9}

# ------------------------------------------------- lz complexity


def test_lz_complexity_known_parses(spark):
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "ababab"), (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_chars"], r["n_phrases"], r["ratio_ppm"])
           for r in textstats.lz_complexity(df).collect()}
    assert out[1] == (4, 2, 500000)
    assert out[2] == (4, 4, 1000000)
    assert out[3] == (6, 3, 500000)
    assert out[4] == (0, 0, 0)


def test_lz_complexity_repetition_vs_noise_ordering(spark):
    from eventrelationextractor_spark.ops import textstats
    rep = "the cat " * 7
    noise = "qx7zw9vkp2mje4ty8rhu3bn6fgd0csal5io1"
    df = spark.createDataFrame([(1, rep), (2, noise)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["ratio_ppm"]
           for r in textstats.lz_complexity(df).collect()}
    assert out[1] < out[2]

# -------------------------------------------------- kruskal-wallis


def test_kruskal_wallis_textbook_no_ties(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(0, v) for v in (1, 2, 3)] + [(1, v) for v in (4, 5, 6)] \
        + [(2, v) for v in (7, 8, 9)]
    df = spark.createDataFrame(rows, "g long, x long")
    r = quality.kruskal_wallis(df, "g", "x").collect()[0]
    assert (r["k_groups"], r["n"], r["tt"]) == (3, 9, 0)
    assert abs(r["h"] - 7.2) < 1e-9


def test_kruskal_wallis_all_tied_guard(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([(g, 5) for g in (0, 1, 2) for _ in
                                range(3)], "g long, x long")
    r = quality.kruskal_wallis(df, "g", "x").collect()[0]
    assert r["h"] == 0.0

# --------------------------------------------- interval scheduling


def test_interval_scheduling_greedy_optimum(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, 0, 10, 1), (1, 1, 2, 2), (1, 2, 2, 3),
            (1, 5, 3, 4), (1, 9, 3, 5), (2, 0, 1, 6)]
    df = spark.createDataFrame(
        rows, "user_id long, start_s long, dur_s long, event_id long")
    out = {r["user_id"]: (r["n_intervals"], r["n_scheduled"])
           for r in ev.interval_scheduling(df).collect()}
    assert out == {1: (5, 3), 2: (1, 1)}


def test_interval_scheduling_touching_endpoints_admit(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, 0, 5, 1), (1, 5, 5, 2), (1, 10, 5, 3)]
    df = spark.createDataFrame(
        rows, "user_id long, start_s long, dur_s long, event_id long")
    r = ev.interval_scheduling(df).collect()[0]
    assert (r["n_intervals"], r["n_scheduled"]) == (3, 3)

# ------------------------------------------------ planar nearest hub


def test_planar_nearest_hub_assignment_and_ties(spark):
    from eventrelationextractor_spark.ops import simsearch
    pts = spark.createDataFrame(
        [(1, 0, 0), (2, 10, 0), (3, 5, 0)], "doc_id long, x long, y long")
    hubs = spark.createDataFrame(
        [(0, 0, 0), (1, 10, 0)], "hub long, hx long, hy long")
    out = {r["hub"]: (r["n_points"], r["mean_d2"], r["min_d2"])
           for r in simsearch.planar_nearest_hub(pts, hubs).collect()}
    # point 3 is equidistant (d2=25) -> tie-break to the smaller hub
    assert out == {0: (2, 12, 0), 1: (1, 0, 0)}

# ----------------------------------------------------------- ransac


def test_ransac_recovers_planted_slope(spark):
    from eventrelationextractor_spark.ops import quality
    rows = []
    for i in range(400):
        x = i % 100
        y = 3 * x + 7 + (i * 2654435761) % 5 - 2
        if i % 11 == 0:
            y += 1500
        rows.append((i, x, y))
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    r = quality.ransac_line(df, tol=4).collect()[0]
    assert r["n_points"] == 400
    # the ~9% outlier spike must be excluded from the consensus set
    assert r["n_inliers"] >= 300
    assert abs(r["slope_refit_ppm"] - 3000000) < 60000

# --------------------------------------------------------- knapsack


def test_knapsack_select_exact_optimum(spark):
    from eventrelationextractor_spark.ops import mixing
    df = spark.createDataFrame(
        [(0, 3, 4), (0, 4, 5), (0, 2, 3), (1, 10, 99)],
        "shard long, w long, v long")
    out = {r["shard"]: (r["n_items"], r["sum_weight"], r["best_value"])
           for r in mixing.knapsack_select(df, "shard", "w", "v",
                                           capacity=5).collect()}
    assert out[0] == (3, 9, 7)      # (3,4)+(2,3) beats (4,5)+(?)
    assert out[1] == (1, 10, 0)     # item exceeds the budget

# ------------------------------------------------------------ ewma


def test_ewma_anomalies_recurrence_and_trunc_sign(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, 1, "2024-01-01 00:00:01", 100),
            (1, 2, "2024-01-01 00:00:02", 100),
            (1, 3, "2024-01-01 00:00:03", 200),
            (1, 4, "2024-01-01 00:00:04", 100)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, cents long") \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    r = ev.ewma_anomalies(df, threshold=50).collect()[0]
    # s: 100 -> 100 -> 125 (one anomaly) -> 119 (trunc(-25/4) = -6)
    assert (r["n_events"], r["n_anomalies"], r["s_final"]) == (4, 1, 119)

# --------------------------------------------------- smith-waterman


def test_smith_waterman_scalar_cases():
    from eventrelationextractor_spark.ops.linkage import smith_waterman
    assert smith_waterman("abc", "abc") == 6
    assert smith_waterman("abc", "xbcx") == 4      # local "bc"
    assert smith_waterman("abcd", "abXd") == 5     # bridge one mismatch
    assert smith_waterman("aaa", "zzz") == 0
    assert smith_waterman("", "abc") == 0
    assert smith_waterman("ab", "ba") == 2


def test_local_alignment_pairs_frame(spark):
    from eventrelationextractor_spark.ops import linkage
    df = spark.createDataFrame(
        [(1, "abcd", "abXd"), (2, "aaa", "zzz")],
        "pid long, a string, b string")
    out = {r["pid"]: (r["n1"], r["n2"], r["sw_score"])
           for r in linkage.local_alignment_pairs(df).collect()}
    assert out == {1: (4, 4, 5), 2: (3, 3, 0)}

# --------------------------------------------------- stupid backoff


def test_stupid_backoff_all_four_branches(spark):
    from eventrelationextractor_spark.ops import textstats
    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(10, "a b c"), (11, "x b c"), (12, "x y c"), (13, "x y z")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_scored"], r["sum_score_ppm"])
           for r in textstats.stupid_backoff_score(train, ev).collect()}
    assert out[10] == (1, 500000)        # trigram hit: 1e6 * 1 div 2
    assert out[11] == (1, 200000)        # bigram backoff: .4 * 1e6/2
    assert out[12] == (1, 26666)         # unigram: .4^2 * 1e6/6 trunc
    assert out[13] == (1, 0)             # unseen word

# ---------------------------------------------------------- maxdiff


def test_maxdiff_histogram_boundary_at_cliff(spark):
    from eventrelationextractor_spark.ops import maintenance
    rows = [(v,) for v in range(8) for _ in range(10)] \
        + [(v,) for v in (8, 9) for _ in range(100)]
    df = spark.createDataFrame(rows, "x long")
    out = {r["seg"]: (r["lo_bucket"], r["hi_bucket"], r["n_rows"])
           for r in maintenance.maxdiff_histogram(
               df, "x", bucket_width=1, k=2).collect()}
    assert out == {0: (0, 7, 80), 1: (8, 9, 200)}

# ----------------------------------------------- shapley attribution


def test_shapley_attribution_two_channel_game(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, 0, 1), (2, 0, 1), (2, 1, 1), (3, 1, 0)]
    df = spark.createDataFrame(rows,
                               "user_id long, channel int, conv long")
    out = {r["channel"]: (r["shapley_xkfact"], r["v_solo"],
                          r["total_conv"])
           for r in ev.shapley_attribution(df, k=2).collect()}
    assert out == {0: (3, 1, 2), 1: (1, 0, 2)}
    # efficiency axiom: sum phi = k! * (v(full) - v(empty)) = 2*2
    assert sum(v[0] for v in out.values()) == 4

# ------------------------------------------------------------- ohlc


def test_ohlc_bars_open_close_order(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, 1, "2024-01-01 10:05:00", 50),
            (1, 2, "2024-01-01 10:55:00", 70),
            (1, 3, "2024-01-01 10:30:00", 90),
            (1, 4, "2024-01-01 11:10:00", 40)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, cents long") \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {(r["user_id"], r["bar"]): (r["n"], r["open_c"], r["high_c"],
                                      r["low_c"], r["close_c"])
           for r in ev.ohlc_bars(df).collect()}
    bars = sorted(out)
    assert out[bars[0]] == (3, 50, 90, 50, 70)
    assert out[bars[1]] == (1, 40, 40, 40, 40)

# ----------------------------------------------------- spatial join


def test_grid_spatial_join_matches_naive(spark):
    from eventrelationextractor_spark.ops import simsearch
    import itertools
    pts = [(i, (i * 37) % 100, (i * 53) % 100) for i in range(200)]
    rects = [(0, 10, 10, 40, 30), (1, 0, 0, 99, 99), (2, 90, 90, 95, 95)]
    pdf = spark.createDataFrame(pts, "pid long, x long, y long")
    rdf = spark.createDataFrame(rects,
                                "rect long, x0 long, y0 long, x1 long, y1 long")
    out = {r["rect"]: (r["n_points"], r["sum_x"])
           for r in simsearch.grid_spatial_join(pdf, rdf,
                                                cell=16).collect()}
    want = {}
    for rect, x0, y0, x1, y1 in rects:
        hits = [(x) for _, x, y in pts
                if x0 <= x <= x1 and y0 <= y <= y1]
        if hits:
            want[rect] = (len(hits), sum(hits))
    assert out == want

# -------------------------------------------------------------- lis


def test_lis_per_user_patience(spark):
    from eventrelationextractor_spark.ops import events as ev
    seq = [3, 1, 4, 1, 5, 9, 2, 6]          # LIS = 1,4,5,9 -> 4
    rows = [(1, i + 1, f"2024-01-01 00:00:{i:02d}", v)
            for i, v in enumerate(seq)] + \
           [(2, 100, "2024-01-01 00:00:00", 7)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, cents long") \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {r["user_id"]: (r["n_events"], r["lis_len"])
           for r in ev.lis_per_user(df).collect()}
    assert out == {1: (8, 4), 2: (1, 1)}


def test_lis_strictness_on_ties(spark):
    from eventrelationextractor_spark.ops import events as ev
    rows = [(1, i + 1, f"2024-01-01 00:00:{i:02d}", 5)
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, cents long") \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    assert ev.lis_per_user(df).collect()[0]["lis_len"] == 1

# ----------------------------------------------------------- pass@k


def test_pass_at_k_textbook_and_edges(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(0, 1)] * 3 + [(0, 0)] * 7 \
        + [(1, 0)] * 5 + [(2, 1)] + [(3, 0)]
    df = spark.createDataFrame(rows, "p long, ok long")
    out = {r["g"]: (r["n"], r["c"], r["pass1_ppm"], r["pass2_ppm"])
           for r in quality.pass_at_k(df, "p", "ok", k=2).collect()}
    # 1 - C(7,2)/C(10,2) = 24/45; ladder: 1e6*7//10*6//9 = 466666
    assert out[0] == (10, 3, 300000, 533334)
    assert out[1] == (5, 0, 0, 0)
    assert out[2] == (1, 1, 1000000, 1000000)   # n < k, c >= 1
    assert out[3] == (1, 0, 0, 0)


def test_pass_at_k_saturates_when_failures_below_k(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([(0, 1)] * 4 + [(0, 0)],
                               "p long, ok long")
    r = quality.pass_at_k(df, "p", "ok", k=2).collect()[0]
    assert r["pass2_ppm"] == 1000000    # only 1 failure, k=2

# ----------------------------------------------------------- merkle


def test_merkle_roots_localized_sensitivity(spark):
    from eventrelationextractor_spark.ops import maintenance
    import hashlib
    base = "abcdefgh" * 8
    mod = base[:56] + "XXXXXXXX"            # corrupt leaf 7 only
    df = spark.createDataFrame([(1, base), (2, base), (3, mod)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["merkle_root"]
           for r in maintenance.merkle_roots(df).collect()}
    assert out[1] == out[2] != out[3]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()
    level = [md5(base[8 * i:8 * i + 8]) for i in range(8)]
    while len(level) > 1:
        level = [md5(level[i] + level[i + 1])
                 for i in range(0, len(level), 2)]
    assert out[1] == level[0]

# ------------------------------------------------------------- rice


def test_rice_parameter_small_posting(spark):
    from eventrelationextractor_spark.ops import bm25
    df = spark.createDataFrame(
        [(0, "zebra"), (5, "zebra"), (6, "zebra")],
        "doc_id long, text string")
    r = bm25.rice_parameter(df).collect()[0]
    # gaps 1,5,1: k=0 -> 10 bits, k=1 -> 8, k=2 -> 10
    assert (r["term"], r["df"], r["best_k"], r["bits"]) \
        == ("zebra", 3, 1, 8)

# ---------------------------------------------------- plan shapes


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_merkle_roots_zero_shuffle(spark):
    from eventrelationextractor_spark.ops import maintenance
    df = spark.createDataFrame([(1, "x" * 64)], "doc_id long, text string")
    plan = _physical(maintenance.merkle_roots(df))
    assert "Exchange" not in plan


def test_grid_spatial_join_no_bnlj(spark):
    """The cell replication must make the spatial join a pure
    equi-join: no BroadcastNestedLoopJoin / CartesianProduct in the
    plan."""
    from eventrelationextractor_spark.ops import simsearch
    pts = spark.createDataFrame([(1, 5, 5)], "pid long, x long, y long")
    rects = spark.createDataFrame([(0, 0, 0, 9, 9)],
                                  "rect long, x0 long, y0 long, x1 long, y1 long")
    plan = _physical(simsearch.grid_spatial_join(pts, rects))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stupid_backoff_ngram_joins_not_broadcast(spark):
    """The n-gram count dims are corpus-scale by construction — the
    lookup joins must stay sort-merge (hint('merge')), never a
    BroadcastHashJoin on tri/bigram counts (the ngram_dup_stats
    AQE-broadcast OOM lesson)."""
    from eventrelationextractor_spark.ops import textstats
    tr = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    plan = _physical(textstats.stupid_backoff_score(tr, ev))
    assert "SortMergeJoin" in plan

# ------------------------------------------------------- burstiness


def test_term_burstiness_uniform_vs_bursty(spark):
    from eventrelationextractor_spark.ops import textstats
    docs = []
    for i in range(6):
        t = "uni"
        if i == 0:
            t += " burst burst burst burst"
        docs.append((i, t))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["term"]: r["fano_ppm"]
           for r in textstats.term_burstiness(
               df, bucket_docs=2, min_total=1).collect()}
    assert out["uni"] == 0                 # constant 2 per bucket
    assert out["burst"] == 4000000         # all mass in one bucket

# -------------------------------------------------------- csv sniff


def test_csv_sniff_consistency_heuristic(spark):
    from eventrelationextractor_spark.ops import maintenance
    df = spark.createDataFrame(
        [("a;b;c",), ("d;e;f",), ("g;h,x;i",)], "line string")
    out = {r["delim_id"]: (r["sum_cnt"], r["var_num"], r["is_best"])
           for r in maintenance.csv_sniff(df).collect()}
    assert out[1] == (6, 0, True)          # ';' constant
    assert out[0] == (1, 2, False)         # ',' noisy
    assert out[2][2] is False and out[3][2] is False

# -------------------------------------------------------- emd drift


def test_emd_drift_shift_detection(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(0, 100 + 80)] * 50 + [(1, 100)] * 50
    df = spark.createDataFrame(rows, "g long, v long")
    out = {r["g"]: r["emd_ppm"]
           for r in quality.emd_drift(df, "g", "v",
                                      bucket_width=8).collect()}
    # constant distributions 80 apart: EMD = 80 exactly -> 80e6 ppm
    assert out[0] == out[1] == 80 * 1000000


def test_emd_drift_identical_groups_zero(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(g, v) for g in (0, 1) for v in (8, 16, 24, 32)]
    df = spark.createDataFrame(rows, "g long, v long")
    out = {r["g"]: r["emd_ppm"]
           for r in quality.emd_drift(df, "g", "v").collect()}
    assert out == {0: 0, 1: 0}

# ---------------------------------------------------- learned index


def test_learned_index_perfect_vs_gapped(spark):
    from eventrelationextractor_spark.ops import maintenance
    rows = [(0, k) for k in range(0, 100, 2)] \
        + [(1, k) for k in list(range(20)) + list(range(500, 530))]
    df = spark.createDataFrame(rows, "s long, k long")
    out = {r["shard"]: (r["n"], r["max_err"])
           for r in maintenance.learned_index_audit(df, "k", "s")
           .collect()}
    assert out[0] == (50, 0)        # perfectly linear: zero error
    assert out[1][1] >= 5           # bimodal keys break the line

# -------------------------------------------------------------- qte


def test_qte_planted_shift(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(0, v) for v in range(1, 101)] \
        + [(1, v + 30) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "arm long, v long")
    out = {r["tau"]: (r["q_t"], r["q_c"], r["qte"])
           for r in quality.quantile_treatment_effect(
               df, "arm", "v").collect()}
    assert out[25] == (55, 25, 30)
    assert out[50] == (80, 50, 30)
    assert out[75] == (105, 75, 30)

# ---------------------------------------------------------- simpson


def test_simpson_diversity_extremes(spark):
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame(
        [(0, "a a a a"), (1, "a b c d")], "g long, text string")
    out = {r["g"]: (r["n_tokens"], r["n_types"], r["simpson_ppm"])
           for r in textstats.simpson_diversity(df, "g").collect()}
    assert out[0] == (4, 1, 0)            # one type: zero diversity
    assert out[1] == (4, 4, 1000000)      # all distinct: maximal

# ------------------------------------------------------------- luhn


def test_luhn_audit_known_numbers(spark):
    from eventrelationextractor_spark.ops import pii
    df = spark.createDataFrame(
        [("79927398713",),     # the canonical Luhn-valid example
         ("79927398710",),     # same digits, bad check digit
         ("4111111111111111",),  # classic valid test PAN
         ("notdigits",)], "num string")
    out = {}
    for r in pii.luhn_audit(df).collect():
        out[r["is_valid"]] = r["n"]
    assert out == {True: 2, False: 2}

# ------------------------------------------------------ cidr rollup


def test_cidr_rollup_levels(spark):
    from eventrelationextractor_spark.ops import urls
    # two ips in the same /16, one in another /8
    ips = [(10 * 16777216 + 1 * 65536 + 2 * 256 + 3,),
           (10 * 16777216 + 1 * 65536 + 9 * 256 + 4,),
           (192 * 16777216,)]
    df = spark.createDataFrame(ips, "ip32 long")
    rows = {(r["o1"], r["o2"], r["o3"]): r["n"]
            for r in urls.cidr_rollup(df).collect()}
    assert rows[(None, None, None)] == 3       # grand total
    assert rows[(10, None, None)] == 2         # /8
    assert rows[(10, 1, None)] == 2            # /16
    assert rows[(10, 1, 2)] == 1               # /24
    assert rows[(192, 0, 0)] == 1

# ----------------------------------------------------- pk discovery


def test_pk_discovery_flags(spark):
    from eventrelationextractor_spark.ops import urls
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "eid long, t string")
    out = {r["combo"]: (r["n_rows"], r["n_distinct"], r["is_key"])
           for r in urls.pk_discovery(
               df, [("eid", F.col("eid").cast("string")),
                    ("t", F.col("t"))]).collect()}
    assert out["eid"] == (3, 3, True)
    assert out["t"] == (3, 2, False)

# -------------------------------------------------- max concurrency


def test_max_concurrency_half_open_and_peak(spark):
    from eventrelationextractor_spark.ops import events as ev
    # [0,10) [5,15) [10,20): at t=5 two overlap; t=10 end meets start
    rows = [(1, 0, 10), (1, 5, 10), (1, 10, 10)]
    df = spark.createDataFrame(rows,
                               "user_id long, start_s long, dur_s long")
    r = ev.max_concurrency(df).collect()[0]
    assert (r["n_intervals"], r["max_overlap"], r["at_s"]) == (3, 2, 5)

# ---------------------------------------------------- longest streak


def test_longest_streak_islands(spark):
    from eventrelationextractor_spark.ops import events as ev
    seq = ["a", "a", "b", "b", "b", "a"]
    rows = [(1, i + 1, f"2024-01-01 00:00:{i:02d}", t)
            for i, t in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string,"
        " event_type string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    r = ev.longest_streak(df).collect()[0]
    assert (r["n_events"], r["best_type"], r["best_len"]) == (6, "b", 3)

# ------------------------------------------- weighted intervals


def test_weighted_interval_scheduling_beats_greedy(spark):
    from eventrelationextractor_spark.ops import events as ev
    # one heavy long job vs two light short ones the greedy would take
    rows = [(1, 1, 0, 10, 100), (1, 2, 0, 4, 1), (1, 3, 5, 4, 1),
            (2, 4, 0, 5, 7), (2, 5, 5, 5, 8)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start_s long,"
        " dur_s long, w long")
    out = {r["user_id"]: (r["n_intervals"], r["best_value"])
           for r in ev.weighted_interval_scheduling(df).collect()}
    assert out[1] == (3, 100)     # take the heavy one, not 1+1
    assert out[2] == (2, 15)      # touching endpoints compose

# -------------------------------------------------------- set cover


def test_greedy_set_cover_rounds_and_ties(spark):
    from eventrelationextractor_spark.ops import mixing
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "e f"), (4, "e f")],
        "doc_id long, text string")
    out = [(r["round"], r["picked_doc"], r["gain"], r["covered_total"])
           for r in mixing.greedy_set_cover(df, k=4)
           .orderBy("round").collect()]
    # doc1 covers 4; then e,f from doc3 (tie with doc4 -> smaller id);
    # doc2/doc4 add nothing -> loop stops after round 2
    assert out == [(1, 1, 4, 4), (2, 3, 2, 6)]
