"""FastText-style quality classifier (ops/quality.py): separability on
a toy corpus, the no-feature scoring path, and the broadcast-model plan
shape."""

import math

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import quality


def _physical(df) -> str:
    return df._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]


POS = "excellent prose reads well and cites sources carefully"
NEG = "buy cheap pills now click here limited offer today"


def _toy(spark, n_each=6):
    rows = [(i, POS + f" variant {i}", 1.0) for i in range(n_each)] + \
           [(100 + i, NEG + f" variant {i}", 0.0) for i in range(n_each)]
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_classifier_separates_toy_corpus(spark):
    docs = _toy(spark)
    w, b = quality.train_quality_classifier(
        docs, F.col("y"), n_buckets=32, n_iter=3, lr=5.0)
    scored = {r.doc_id: r.prob
              for r in quality.score_quality(docs, w, b).collect()}
    worst_pos = min(v for d, v in scored.items() if d < 100)
    best_neg = max(v for d, v in scored.items() if d >= 100)
    assert worst_pos > best_neg
    # held-out docs built from each class's distinctive bigrams land on
    # the right side of each other
    held = spark.createDataFrame(
        [(900, "excellent prose reads well indeed"),
         (901, "click here buy cheap pills")],
        "doc_id long, text string")
    hs = {r.doc_id: r.prob
          for r in quality.score_quality(held, w, b).collect()}
    assert hs[900] > hs[901]


def test_weights_rounded_for_oracle_lockstep(spark):
    docs = _toy(spark, n_each=3)
    w, b = quality.train_quality_classifier(
        docs, F.col("y"), n_buckets=16, n_iter=2)
    assert all(round(x, 9) == x for x in w) and round(b, 9) == b


def test_score_no_feature_doc_gets_bias_sigmoid(spark):
    docs = spark.createDataFrame([(1, "single"), (2, "two words")],
                                 "doc_id long, text string")
    b = 0.4
    got = {r.doc_id: r for r in
           quality.score_quality(docs, [0.0] * 8, b).collect()}
    assert got[1].n_bigrams == 0
    assert got[1].prob == pytest.approx(
        round(1.0 / (1.0 + math.exp(-b)), 6))
    assert got[2].n_bigrams == 1


def test_fixedpoint_classifier_separates_and_is_integer_pure(spark):
    docs = _toy(spark)
    w, b = quality.train_quality_classifier_fixedpoint(
        docs, F.col("y"), n_buckets=32, n_iter=3, lr_x=5)
    assert all(isinstance(x, int) for x in w) and isinstance(b, int)
    scored = quality.score_quality_fixedpoint(docs, w, b)
    assert [f.dataType.simpleString() for f in scored.schema.fields] == \
        ["bigint", "bigint", "bigint"]
    got = {r.doc_id: r.score_upm for r in scored.collect()}
    worst_pos = min(v for d, v in got.items() if d < 100)
    best_neg = max(v for d, v in got.items() if d >= 100)
    assert worst_pos > best_neg


def test_fixedpoint_training_is_run_deterministic(spark):
    """Two independent trainings over a repartitioned copy produce the
    SAME integer model — the whole point of fixed-point accumulation
    (a float-sum gradient can drift with partial-agg merge order)."""
    docs = _toy(spark, n_each=8)
    w1, b1 = quality.train_quality_classifier_fixedpoint(
        docs, F.col("y"), n_buckets=16, n_iter=2)
    w2, b2 = quality.train_quality_classifier_fixedpoint(
        docs.repartition(13), F.col("y"), n_buckets=16, n_iter=2)
    assert (w1, b1) == (w2, b2)


def test_fixedpoint_no_feature_doc_scores_bias_surrogate(spark):
    docs = spark.createDataFrame([(1, "single"), (2, "two words")],
                                 "doc_id long, text string")
    b = 400_000
    got = {r.doc_id: r for r in
           quality.score_quality_fixedpoint(docs, [0] * 8, b).collect()}
    assert got[1].n_bigrams == 0
    # f(0.4) = 0.5 + 0.4/(2*1.4) -> 500000 + 200000*10**6 // 2800000
    assert got[1].score_upm == 500_000 + (500_000 * b) // (2 * (10**6 + b))
    assert got[2].n_bigrams == 1


def test_train_requires_labeled_features(spark):
    docs = spark.createDataFrame([(1, "only", None)],
                                 "doc_id long, text string, y double")
    with pytest.raises(ValueError, match="no labeled"):
        quality.train_quality_classifier(docs, F.col("y"), n_buckets=8)


def test_score_plan_broadcasts_model(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _physical(quality.score_quality(docs, [0.1] * 64, 0.0))
    assert "BroadcastHashJoin" in plan     # model side, never shuffled
    assert "Window" not in plan


def test_cohens_kappa_known_contingency(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")],
        "ann_a string, ann_b string")
    row = quality.cohens_kappa(df, "ann_a", "ann_b").collect()[0]
    # n=4 agree=3 po=0.75; pe_num = 2*1 + 2*3 = 8 -> pe=0.5
    # kappa = (4*3 - 8) / (16 - 8) = 0.5
    assert (row.n, row.n_agree, row.po, row.pe, row.kappa) == \
        (4, 3, 0.75, 0.5, 0.5)


def test_cohens_kappa_perfect_agreement(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([("x", "x")] * 3, "ann_a string, ann_b string")
    row = quality.cohens_kappa(df, "ann_a", "ann_b").collect()[0]
    # single label: pe_num = n*n -> chance-degenerate, defined as 1.0
    assert (row.po, row.kappa) == (1.0, 1.0)


def test_calibration_table_integer_columns(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame(
        [(50000, False), (150000, True), (160000, False)],
        "score_ppm long, label boolean")
    rows = {r.bin: r for r in
            quality.calibration_table(df, "score_ppm", "label",
                                      n_bins=10).collect()}
    assert rows[0].n == 1 and rows[0].n_pos == 0
    b1 = rows[1]
    assert (b1.n, b1.n_pos, b1.avg_conf_ppm, b1.pos_rate_ppm) == \
        (2, 1, 155000, 500000)
    assert b1.gap_ppm == 345000 and b1.ece_num == 690000


# ------------------------------------------------------------- roc auc


def test_roc_auc_tie_aware_known_value(spark):
    from eventrelationextractor_spark.ops import quality
    # pos scores {1, 3}, neg scores {1, 2}: pairwise outcomes are
    # tie(1v1)=0.5, loss(1v2)=0, win(3v1)=1, win(3v2)=1 -> AUC 0.625
    df = spark.createDataFrame(
        [(1, False), (1, True), (2, False), (3, True)],
        "score long, label boolean")
    row = quality.roc_auc(df, "score", "label").collect()[0]
    assert (row.n_pos, row.n_neg) == (2, 2)
    assert (row.auc_num2, row.auc_den2) == (5, 8)
    assert row.auc == 0.625


def test_roc_auc_perfect_and_inverted(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame(
        [(i, i >= 5) for i in range(10)], "score long, label boolean")
    assert quality.roc_auc(df, "score", "label").collect()[0].auc == 1.0
    inv = spark.createDataFrame(
        [(10 - i, i >= 5) for i in range(10)], "score long, label boolean")
    assert quality.roc_auc(inv, "score", "label").collect()[0].auc == 0.0


def test_roc_auc_single_class_is_null(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([(1, True), (2, True)],
                               "score long, label boolean")
    row = quality.roc_auc(df, "score", "label").collect()[0]
    assert row.n_neg == 0 and row.auc is None


def test_roc_auc_matches_bruteforce_pair_count(spark):
    from eventrelationextractor_spark.ops import quality
    # deterministic pseudo-random scores with heavy ties (mod 5)
    data = [((i * 7 + 3) % 5, (i * 13 + 1) % 3 == 0) for i in range(40)]
    df = spark.createDataFrame(data, "score long, label boolean")
    row = quality.roc_auc(df, "score", "label").collect()[0]
    pos = [s for s, l in data if l]
    neg = [s for s, l in data if not l]
    num2 = sum(2 if p > n else 1 if p == n else 0
               for p in pos for n in neg)
    assert (row.auc_num2, row.auc_den2) == (num2, 2 * len(pos) * len(neg))
    assert row.auc == round(num2 / (2.0 * len(pos) * len(neg)), 6)


# ------------------------------------------- pr curve / ks / chi2 / benford


def test_pr_curve_descending_thresholds(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame(
        [(1, False), (1, True), (2, False), (3, True)],
        "score long, label boolean")
    rows = {r.threshold: r for r in
            quality.pr_curve(df, "score", "label").collect()}
    assert (rows[3].tp, rows[3].fp, rows[3].fn) == (1, 0, 1)
    assert rows[3].precision_ppm == 1_000_000
    assert rows[3].recall_ppm == 500_000
    assert rows[3].f1_ppm == 2_000_000 // 3
    assert (rows[1].tp, rows[1].fp, rows[1].fn) == (2, 2, 0)
    assert rows[1].recall_ppm == 1_000_000


def test_pr_curve_no_positives_yields_null_recall(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([(5, False), (7, False)],
                               "score long, label boolean")
    for r in quality.pr_curve(df, "score", "label").collect():
        assert r.recall_ppm is None and r.f1_ppm is None
        assert r.precision_ppm == 0


def test_ks_identical_and_disjoint(spark):
    from eventrelationextractor_spark.ops import quality
    same = spark.createDataFrame(
        [(v, f) for v in (1, 2, 3) for f in (True, False)],
        "v long, flag boolean")
    r = quality.ks_two_sample(same, "v", "flag").collect()[0]
    assert (r.d_num, r.d_ppm) == (0, 0)
    disj = spark.createDataFrame(
        [(1, True), (2, True), (10, False)], "v long, flag boolean")
    r = quality.ks_two_sample(disj, "v", "flag").collect()[0]
    assert (r.n_a, r.n_b, r.d_num, r.d_ppm) == (2, 1, 2, 1_000_000)


def test_ks_empty_side_is_null(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame([(1, True), (2, True)],
                               "v long, flag boolean")
    r = quality.ks_two_sample(df, "v", "flag").collect()[0]
    assert r.n_b == 0 and r.d_ppm is None


def test_ks_matches_bruteforce_ecdf(spark):
    from fractions import Fraction

    from eventrelationextractor_spark.ops import quality
    data = [((i * 11 + 2) % 7, i % 3 == 0) for i in range(30)]
    df = spark.createDataFrame(data, "v long, flag boolean")
    r = quality.ks_two_sample(df, "v", "flag").collect()[0]
    a = sorted(v for v, f in data if f)
    b = sorted(v for v, f in data if not f)
    d = max(abs(Fraction(sum(1 for x in a if x <= v), len(a))
                - Fraction(sum(1 for x in b if x <= v), len(b)))
            for v in set(a) | set(b))
    assert Fraction(r.d_num, r.n_a * r.n_b) == d


def test_chi2_exact_independence_has_zero_contrib(spark):
    from eventrelationextractor_spark.ops import quality
    rows = [(a, b) for a in ("x", "y") for b in ("p", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    for r in quality.chi_square_independence(df, "a", "b").collect():
        assert r.contrib == 0.0 and r.expected == 3.0


def test_chi2_known_2x2(spark):
    from eventrelationextractor_spark.ops import quality
    # x rows: 8 p, 2 q; y rows: 2 p, 8 q  ->  chi2 = 7.2
    rows = [("x", "p")] * 8 + [("x", "q")] * 2 + \
        [("y", "p")] * 2 + [("y", "q")] * 8
    df = spark.createDataFrame(rows, "a string, b string")
    got = quality.chi_square_independence(df, "a", "b").collect()
    assert abs(sum(r.contrib for r in got) - 7.2) < 1e-9
    cell = {(r.a, r.b): r for r in got}
    assert cell[("x", "p")].observed == 8
    assert cell[("x", "p")].expected == 5.0
    assert cell[("x", "p")].contrib == 1.8


def test_benford_excludes_nonpositive_and_zero_fills(spark):
    from eventrelationextractor_spark.ops import quality
    df = spark.createDataFrame(
        [(v,) for v in [1, 19, 145, 2, 0, -7]], "amt long")
    rows = {r.digit: r for r in
            quality.benford_profile(df, "amt").collect()}
    assert len(rows) == 9
    assert rows[1].n == 3 and rows[2].n == 1 and rows[5].n == 0
    assert rows[1].observed_ppm == 750_000
    assert rows[5].observed_ppm == 0
    assert rows[5].dev_ppm == rows[5].expected_ppm
    assert sum(quality.BENFORD_PPM) == 1_000_000


# ------------------------------------------------------- token-label MI


def test_token_label_mi_matches_bruteforce(spark):
    import math
    docs = [(i, ("alpha beta " if i % 2 == 0 else "gamma delta ") * 2)
            for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.bucket: r for r in quality.token_label_mi(
        df, F.expr("doc_id % 2 = 0"), n_buckets=8).collect()}
    # brute force from the op's own presence counts (cells are the
    # contract; mi/g2 recomputed from them independently)
    for r in got.values():
        nn = r.n11 + r.n10 + r.n01 + r.n00
        assert nn == 12
        mi = g2 = 0.0
        for c, row, col in [(r.n11, r.n11 + r.n10, r.n11 + r.n01),
                            (r.n10, r.n11 + r.n10, r.n10 + r.n00),
                            (r.n01, r.n01 + r.n00, r.n11 + r.n01),
                            (r.n00, r.n01 + r.n00, r.n10 + r.n00)]:
            if c > 0:
                mi += c / nn * math.log2(nn * c / (row * col))
                g2 += c * math.log(nn * c / (row * col))
        assert r.mi == round(mi, 6) and r.g2 == round(2 * g2, 6)


def test_token_label_mi_perfect_predictor_is_one_bit(spark):
    # feature present iff label=1, balanced labels -> MI = 1 bit
    docs = [(i, "zq zq zq" if i % 2 == 0 else "xx") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = quality.token_label_mi(df, F.expr("doc_id % 2 = 0"),
                                  n_buckets=4).collect()
    # 'xx' docs have < 2 words -> featureless, count as absent
    assert all(r.mi == 1.0 for r in rows)
    assert all(r.n10 == 0 and r.n01 == 0 for r in rows)


def test_token_label_mi_independent_feature_is_zero(spark):
    # same text everywhere -> presence row is (all, 0): MI exactly 0
    docs = [(i, "common words here") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = quality.token_label_mi(df, F.expr("doc_id % 2 = 0"),
                                  n_buckets=4).collect()
    assert rows and all(r.mi == 0.0 and r.g2 == 0.0 for r in rows)


# ----------------------------------------------------------------- psi


def test_psi_identical_slices_zero(spark):
    df = spark.createDataFrame(
        [(b, f) for b in (0, 1, 2) for f in (True, False)] * 4,
        "bucket long, flag boolean")
    for r in quality.psi_buckets(df, "bucket", "flag").collect():
        assert r.psi_term == 0.0 and r.p_a_ppm == r.p_b_ppm


def test_psi_zero_bucket_smoothing(spark):
    # bucket 1 absent from slice a: p_a floors at smooth_ppm, the term
    # stays finite and negative (baseline mass missing from candidate)
    rows = [(0, True)] * 4 + [(0, False), (1, False), (1, False),
                              (1, False)]
    df = spark.createDataFrame(rows, "bucket long, flag boolean")
    got = {r.bucket: r for r in
           quality.psi_buckets(df, "bucket", "flag",
                               smooth_ppm=100).collect()}
    import math
    assert got[1].p_a_ppm == 100
    assert got[1].p_b_ppm == 750_000
    want = (100 - 750_000) / 1e6 * math.log(100 / 750_000)
    assert got[1].psi_term == round(want, 6)
    assert got[1].psi_term > 0       # drift terms are positive
    assert got[0].p_a_ppm == 1_000_000


def test_psi_total_flags_known_shift(spark):
    # candidate shifted one bucket right: total PSI well above 0.25
    rows = [(b, False) for b in (0, 0, 0, 1)] + \
        [(b + 1, True) for b in (0, 0, 0, 1)]
    df = spark.createDataFrame(rows, "bucket long, flag boolean")
    total = sum(r.psi_term for r in
                quality.psi_buckets(df, "bucket", "flag").collect())
    assert total > 0.25


# ----------------------------------------------------------- naive Bayes


def test_naive_bayes_separates_obvious_classes(spark):
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import quality
    rows = ([(i, "spam spam buy now cheap pills " * 3) for i in range(6)]
            + [(i + 10, "quarterly report revenue analysis notes " * 3)
               for i in range(6)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality.naive_bayes_classify(
        df, F.expr("doc_id < 10"), n_buckets=32).collect()}
    assert all(out[i].pred == 1 for i in range(6))
    assert all(out[i + 10].pred == 0 for i in range(6))
    # scores rounded to 6dp and finite
    assert all(abs(r.score0) < 1e6 and abs(r.score1) < 1e6
               for r in out.values())


def test_naive_bayes_short_doc_falls_back_to_prior(spark):
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import quality
    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"), (3, "x")]  # doc 3: no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality.naive_bayes_classify(
        df, F.expr("doc_id = 0"), n_buckets=16).collect()}
    # prior: n1=1, n0=3 -> doc 3 scores = priors only -> pred 0
    import math
    assert out[3].pred == 0
    assert abs(out[3].score0 - round(math.log(3 / 4), 6)) < 1e-9
    assert abs(out[3].score1 - round(math.log(1 / 4), 6)) < 1e-9


def test_kendall_tau_perfect_and_reversed(spark):
    from eventrelationextractor_spark.ops import quality
    up = [("a", i, i, i * 2) for i in range(5)]
    down = [("b", i, i, 10 - i) for i in range(5)]
    df = spark.createDataFrame(up + down,
                               "g string, doc_id long, x long, y long")
    got = {r.g: r for r in
           quality.kendall_tau(df, "g", "x", "y").collect()}
    assert got["a"].tau == 1.0 and got["a"].concordant == 10
    assert got["b"].tau == -1.0 and got["b"].discordant == 10


def test_kendall_tau_tie_corrections(spark):
    from eventrelationextractor_spark.ops import quality
    # x: 1,1,2 ; y: 1,2,2 -> pairs: (1,2): sx=0 sy>0 tie_x;
    # (1,3): sx>0 sy>0 C; (2,3): sx>0 sy=0 tie_y
    rows = [("g", 1, 1, 1), ("g", 2, 1, 2), ("g", 3, 2, 2)]
    df = spark.createDataFrame(rows, "g string, doc_id long, x long, y long")
    r = quality.kendall_tau(df, "g", "x", "y").collect()[0]
    assert (r.concordant, r.discordant, r.ties_x, r.ties_y) == (1, 0, 1, 1)
    # tau_b = 1 / sqrt((3-1)*(3-1)) = 0.5
    assert r.tau == 0.5


def test_isotonic_calibrate_hand_case(spark):
    from eventrelationextractor_spark.ops.quality import isotonic_calibrate
    # rates 0.4, 0.2, 0.6: first two violate -> pool to 6/20 = 0.3
    bins = spark.createDataFrame(
        [(1, 0, 10, 4), (1, 1, 10, 2), (1, 2, 10, 6)],
        "grp long, x long, n long, pos long")
    got = {r.x: r.rate_ppm for r in isotonic_calibrate(bins).collect()}
    assert got == {0: 300000, 1: 300000, 2: 600000}
    # already monotone input is untouched
    mono = spark.createDataFrame(
        [(1, 0, 10, 1), (1, 1, 10, 5), (1, 2, 10, 9)],
        "grp long, x long, n long, pos long")
    got = {r.x: r.rate_ppm for r in isotonic_calibrate(mono).collect()}
    assert got == {0: 100000, 1: 500000, 2: 900000}


def test_isotonic_matches_minimax_bruteforce(spark):
    from eventrelationextractor_spark.ops.quality import isotonic_calibrate
    # adversarial zig-zag incl. equal-mean adjacent blocks and a zero bin
    rows = [(7, x, n, p) for x, (n, p) in enumerate(
        [(4, 2), (4, 2), (3, 0), (5, 5), (2, 1), (6, 1), (1, 1)])]
    bins = spark.createDataFrame(rows, "grp long, x long, n long, pos long")
    got = {r.x: r.rate_ppm for r in isotonic_calibrate(bins).collect()}
    ns = [r[2] for r in rows]
    ps = [r[3] for r in rows]
    m = len(rows)
    for i in range(m):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, m):
                num, den = sum(ps[j:k + 1]), sum(ns[j:k + 1])
                v = num * 1000000 // den
                worst = v if worst is None else min(worst, v)
            best = worst if best is None else max(best, worst)
        assert got[i] == best, (i, got[i], best)
