"""Round-5 session-4 operators: weight-doubling boosted decision
stumps (float-free majority boost) and ROUGE-N with clipped counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import quality as q
from eventrelationextractor_spark.ops import textstats as ts


# ------------------------------------------------------------- stumps

def _boost_reference(rows, candidates, n_rounds):
    """Pure-Python replay of the boost contract: per round pick the
    (err, cid)-argmin stump with orientation o (tie -> o=0), double
    the integer weight of every misclassified example, accumulate
    the +-1 vote."""
    state = [{"xid": xid, "y": 1 if lbl else -1,
              "f": list(feats), "w": 1, "score": 0}
             for xid, lbl, *feats in [(r[0], r[1], *r[2:]) for r in rows]]
    for _ in range(n_rounds):
        best = None
        for cid, (fi, thr) in enumerate(candidates):
            err_a = sum(s["w"] for s in state
                        if (s["f"][fi] <= thr) != (s["y"] == 1))
            err_b = sum(s["w"] for s in state
                        if (s["f"][fi] <= thr) == (s["y"] == 1))
            o = 0 if err_a <= err_b else 1
            err = min(err_a, err_b)
            if best is None or (err, cid) < (best[0], best[1]):
                best = (err, cid, fi, thr, o)
        _, _, fi, thr, o = best
        for s in state:
            pred = 1 if (s["f"][fi] <= thr) == (o == 0) else -1
            if pred != s["y"]:
                s["w"] *= 2
            s["score"] += pred
    return {s["xid"]: (s["y"], s["score"], s["w"]) for s in state}


def test_boosted_stumps_matches_python_reference(spark):
    """48 deterministic examples over 2 features vs the in-test
    sequential replay: identical (y, score, w) per example."""
    rows = [(i, (i * 7) % 10 < 5, (i * 13) % 50, (i * 29) % 40)
            for i in range(48)]
    cands = [(0, 10), (0, 25), (0, 40), (1, 8), (1, 20), (1, 33)]
    df = spark.createDataFrame(
        rows, "doc_id long, lbl boolean, a long, b long")
    got = {r["doc_id"]: (r["y"], r["score"], r["w"])
           for r in q.boosted_stumps(df, ["a", "b"], "lbl", cands,
                                     n_rounds=3).collect()}
    assert got == _boost_reference(rows, cands, 3)


def test_boosted_stumps_learns_separable_threshold(spark):
    """Perfectly separable on f0 <= 30: one round already votes every
    example correctly, and no weight ever doubles."""
    rows = [(i, i <= 30, i) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lbl boolean, a long")
    res = q.boosted_stumps(df, ["a"], "lbl",
                           [(0, 10), (0, 30), (0, 45)],
                           n_rounds=3).collect()
    assert all(r["w"] == 1 for r in res)
    assert all((r["score"] > 0) == (r["y"] == 1) for r in res)


def test_boosted_stumps_doubles_misclassified_weights(spark):
    """One stubborn counterexample to the best stump: its weight is
    2^3 after three rounds of the same pick (single candidate)."""
    rows = [(0, True, 1), (1, True, 2), (2, True, 3), (3, False, 9),
            (4, False, 8), (5, True, 7)]  # 5 violates f<=3 => +1
    df = spark.createDataFrame(rows, "doc_id long, lbl boolean, a long")
    got = {r["doc_id"]: r["w"]
           for r in q.boosted_stumps(df, ["a"], "lbl", [(0, 3)],
                                     n_rounds=3).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 8}


# -------------------------------------------------------------- rouge

def _rouge(spark, pairs, n):
    df = spark.createDataFrame(pairs, "doc_id long, r string, s string")
    return {row["doc_id"]: row.asDict()
            for row in ts.rouge_scores(df, "r", "s", n=n).collect()}


def test_rouge1_hand_case(spark):
    """ref='a b c a' sys='a a d': clipped match = min(2,2) = 2;
    p = 2/3, r = 2/4, f = 4/7 in ppm floor division."""
    got = _rouge(spark, [(0, "a b c a", "a a d")], 1)[0]
    assert (got["match_n"], got["ref_n"], got["sys_n"]) == (2, 4, 3)
    assert (got["p_ppm"], got["r_ppm"], got["f_ppm"]) == \
        (666666, 500000, 571428)


def test_rouge2_clipping_and_counts(spark):
    """ref has 'a b' twice, sys three times: clipped to 2 of sys's 3
    bigrams -> p = 2/3."""
    got = _rouge(spark, [(0, "a b x a b", "a b a b a b")], 2)[0]
    assert got["match_n"] == 2 and got["sys_n"] == 5
    assert got["p_ppm"] == 400000  # 2 of 5 sys bigrams
    assert got["r_ppm"] == 500000  # 2 of 4 ref bigrams


def test_rouge2_single_token_has_no_phantom_grams(spark):
    """Regression for Spark's descending sequence(1, 0): a 1-token
    side must yield ZERO bigrams, not a fabricated one."""
    got = _rouge(spark, [(0, "hello", "hello"),
                         (1, "a b", "x")], 2)
    assert got[0] == {"doc_id": 0, "match_n": 0, "ref_n": 0,
                      "sys_n": 0, "p_ppm": 0, "r_ppm": 0, "f_ppm": 0}
    assert got[1]["ref_n"] == 1 and got[1]["sys_n"] == 0
    assert got[1]["f_ppm"] == 0


def test_rouge1_empty_and_punct_only_sides(spark):
    """Punctuation-only sys tokenizes to nothing -> all-zero ppm with
    ref_n intact (no division blowup)."""
    got = _rouge(spark, [(0, "alpha beta", "?!...")], 1)[0]
    assert got == {"doc_id": 0, "match_n": 0, "ref_n": 2, "sys_n": 0,
                   "p_ppm": 0, "r_ppm": 0, "f_ppm": 0}


# ------------------------------------------------------------ viterbi

from eventrelationextractor_spark.ops import cluster as cl
from eventrelationextractor_spark.ops import hmm


def _viterbi_reference(text, trans, emit, start):
    import re
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    k = len(start)
    c = [start[i] for i in range(k)]
    p = [""] * k
    for tok in toks:
        cls = len(tok) % len(emit[0])
        nc, np_ = [], []
        for j in range(k):
            cands = [c[i] + trans[i][j] for i in range(k)]
            best = min(cands)
            arg = cands.index(best)  # lowest index on ties
            nc.append(best + emit[j][cls])
            np_.append(p[arg] + str(j))
        c, p = nc, np_
    best = min(c)
    arg = c.index(best)
    return arg, best, p[arg]


def test_viterbi_matches_python_reference(spark):
    trans = [[0, 4, 9], [3, 0, 5], [8, 2, 0]]
    emit = [[1, 5, 9, 2], [7, 0, 3, 6], [4, 8, 1, 0]]
    start = [0, 2, 5]
    texts = ["key agg row scan slow", "a bb ccc dddd eeeee",
             "Hello, World! x2", "one", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["vit_state"], r["vit_cost"], r["vit_path"])
           for r in hmm.viterbi_decode(df, "text", trans, emit,
                                       start).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _viterbi_reference(t, trans, emit, start), t


def test_viterbi_tie_prefers_lowest_state(spark):
    """Symmetric 2-state model: every candidate ties, so the decode
    must stick to state 0 throughout."""
    df = spark.createDataFrame([(0, "aa bb cc")],
                               "doc_id long, text string")
    row = hmm.viterbi_decode(
        df, "text", trans=[[1, 1], [1, 1]],
        emit=[[2, 2], [2, 2]], start=[3, 3]).collect()[0]
    assert row["vit_state"] == 0 and row["vit_path"] == "000"
    assert row["vit_cost"] == 3 + 1 + 2 + (1 + 2) * 2


# ---------------------------------------------------------------- pca

def test_pca_power_recovers_planted_axis(spark):
    """Variance planted on coordinate 0 (coordinate 2 carries a
    weaker signal): projections must order by the x0 value and the
    sign convention makes them increase with it."""
    rows = [(i, [float(i - 8) * 0.03,
                 0.001 * ((i * 7) % 5),
                 float((i % 3) - 1) * 0.005, 0.0])
            for i in range(17)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["pc1_proj"]
           for r in cl.pca_power(df, iters=8).collect()}
    order = sorted(got, key=lambda k: got[k])
    assert order == list(range(17))  # monotone in x0


def test_pca_power_zero_variance_is_stable(spark):
    """All-identical vectors: Gram is 0, the m=0 guard keeps the
    all-ones vector, projections are all zero (no div-by-zero)."""
    rows = [(i, [0.25, -0.5, 0.125]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r["pc1_proj"] for r in cl.pca_power(df, iters=4).collect()]
    assert got == [0] * 6
