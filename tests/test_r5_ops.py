"""Round-5 session-2 operators: survival family (Nelson-Aalen,
log-rank), sorted-neighborhood blocking, split-conformal intervals,
PPJoin, permutation+BH FDR, IPF raking, space-saving streaming top-k.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import dedup as dd
from eventrelationextractor_spark.ops import events as ev
from eventrelationextractor_spark.ops import linkage as lk
from eventrelationextractor_spark.ops import mixing as mx
from eventrelationextractor_spark.ops import quality as ql


# --------------------------------------------------------------- survival

def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


def test_nelson_aalen_shares_km_risk_sets_and_integer_hazard(spark):
    """NA and KM are built on the same subject/risk-set table: their
    (duration, n_risk, n_events) columns must agree row-for-row, and
    the NA curve is the exact integer cumsum of (1e6*d) div n."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 4 users: two purchase at +10min/+20min, two censored at +30min
    for u, (mins, typ) in enumerate([(10, "purchase"), (20, "purchase"),
                                     (30, "view"), (30, "view")]):
        rows.append((u, base, "signup"))
        rows.append((u, base + dt.timedelta(minutes=mins), typ))
    e = _mk_events(spark, rows)
    km = {r.duration_min: (r.n_risk, r.n_events)
          for r in ev.kaplan_meier(e).collect()}
    na = ev.nelson_aalen(e).collect()
    assert {r.duration_min: (r.n_risk, r.n_events) for r in na} == km
    got = {r.duration_min: r.cumhaz_ppm for r in na}
    # t=10: 1/4 risk -> 250000; t=20: +1/3 -> 250000+333333
    assert got == {10: 250_000, 20: 583_333}


def test_logrank_symmetric_arms_score_zero(spark):
    """Arms with identical duration profiles and even per-time death
    counts: O1 == E1 exactly (e1_micro == 1e6*o1) and z == 0."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(8):          # users 0..7; arm = u % 2
        mins = 10 * (u // 2 + 1)   # paired durations across arms
        rows.append((u, base, "signup"))
        rows.append((u, base + dt.timedelta(minutes=mins), "purchase"))
    out = ev.logrank_test(_mk_events(spark, rows)).collect()[0]
    assert out.o1 * 1_000_000 == out.e1_micro
    assert out.z == 0.0


# ----------------------------------------------------- sorted neighborhood

def test_sorted_neighborhood_equals_global_window(spark):
    """Bucketed banded SNM == the textbook single-sorted-list pairs,
    including pairs that straddle bucket boundaries."""
    rows = [(i, "k%02d" % (i % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = {(r.a, r.b, r.gap)
           for r in lk.sorted_neighborhood(
               df, "doc_id", F.col("key"), window=5,
               bucket_prefix=2).collect()}
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {(order[i][0], order[j][0], j - i)
            for i in range(len(order))
            for j in range(i + 1, min(i + 5, len(order)))}
    assert got == want


# ------------------------------------------------------------- conformal

def test_conformal_picks_exact_rank_and_counts_coverage(spark):
    """Hand-checkable group: 9 calibration values 0..800 step 100
    (median 400), k = ceil(10*0.9) = 9 -> q_hat = max residual 400;
    test points 0 and 2000 -> covered = 1 of 2."""
    cal = [(2 * i, "g", 100 * i) for i in range(9)]
    test = [(1, "g", 0), (3, "g", 2000)]
    df = spark.createDataFrame(cal + test,
                               "doc_id long, g string, x long")
    out = ql.conformal_intervals(df, "g", "x",
                                 F.expr("doc_id % 2 = 0"),
                                 alpha_pct=10).collect()[0]
    assert (out.n_cal, out.pred, out.q_hat) == (9, 400, 400)
    assert (out.n_test, out.n_covered) == (2, 1)
    assert out.coverage_ppm == 500_000


# ---------------------------------------------------------------- ppjoin

def test_ppjoin_equals_prefix_filter(spark):
    """PPJoin's positional filter only prunes candidates — the
    verified output must equal prefix_filter_pairs exactly (recall 1
    at the same threshold)."""
    docs = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(4)]
    docs += [(10, "alpha beta gamma delta epsilon zeta eta iota"),
             (11, "one two three four five six seven eight"),
             (12, "totally different words in this document here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {(r.a, r.b, r.n_inter, r.n_union, r.jaccard)
         for r in dd.prefix_filter_pairs(df, t_ppm=700_000).collect()}
    b = {(r.a, r.b, r.n_inter, r.n_union, r.jaccard)
         for r in dd.ppjoin_pairs(df, t_ppm=700_000).collect()}
    assert a == b and len(a) >= 7    # the 5-clique of near-identicals


# --------------------------------------------------------------- perm_fdr

def test_perm_fdr_rejects_planted_signal_only(spark):
    """Token 'aaa' lives only on side A (huge |T|), 'bbb' is balanced:
    BH must reject aaa and keep bbb."""
    rows = []
    for d in range(40):
        rows.append((d, "bbb", 5))
        if d % 2 == 0:
            rows.append((d, "aaa", 50))
    dt = spark.createDataFrame(rows, "doc_id long, token string, cnt long")
    out = {r.token: r for r in ql.perm_fdr(
        dt, F.expr("doc_id % 2 = 0"), top_m=2, n_perm=64).collect()}
    assert out["aaa"].rejected == 1 and out["aaa"].perm_ge == 0
    assert out["bbb"].rejected == 0


# -------------------------------------------------------------- ipf raking

def test_ipf_converges_to_column_targets(spark):
    """After the final column step every column mass equals its target
    micro mass up to one integer-div truncation per cell."""
    cells = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 30), ("b", 0, 40), ("b", 1, 20)],
        "r string, c long, cnt long")
    rt = spark.createDataFrame([("a", 60), ("b", 40)],
                               "r string, target long")
    ct = spark.createDataFrame([(0, 50), (1, 50)],
                               "c long, target long")
    out = mx.ipf_raking(cells, "r", "c", rt, ct, n_iter=4).collect()
    col_mass = {}
    for row in out:
        col_mass[row.c] = col_mass.get(row.c, 0) + row.w_micro
    for c, target in ((0, 50), (1, 50)):
        assert abs(col_mass[c] - target * 1_000_000) <= 2
    # row masses converge too (IPF fixed point when targets are
    # consistent): within 1% after 4 rounds
    row_mass = {}
    for row in out:
        row_mass[row.r] = row_mass.get(row.r, 0) + row.w_micro
    for r, target in (("a", 60), ("b", 40)):
        assert abs(row_mass[r] - target * 1_000_000) < 0.01 * target * 1e6


# --------------------------------------------------------- streaming top-k

def _run_stream(spark, tmp_path, batches, name, **kw):
    schema = "user_id long, event_type string"
    src = str(tmp_path / f"{name}_src")
    os.makedirs(src)
    for i, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1) \
            .write.parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.1)
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", "1") \
        .option("latestFirst", "false").parquet(src + "/*")
    q = (ev.streaming_topk(stream, **kw)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(f"select * from {name}").collect()
    last_ver = {}
    for r in rows:
        last_ver[r.user_id] = max(last_ver.get(r.user_id, 0), r.ver)
    return [r for r in rows if r.ver == last_ver[r.user_id]]


def test_streaming_topk_exact_regime_matches_batch(spark, tmp_path):
    """capacity >= ndv: nothing evicted, err == 0, final rows equal
    the exact batch user_event_topk across a 2-trigger split."""
    b1 = [(1, "a")] * 3 + [(1, "b")] * 2 + [(2, "x")]
    b2 = [(1, "b")] * 3 + [(1, "c")] + [(2, "y")] * 2
    got = {(r.user_id, r.event_type, r.cnt_est, r.rnk)
           for r in _run_stream(spark, tmp_path, (b1, b2),
                                "topk_exact", k=2, capacity=8)}
    batch = ev.user_event_topk(
        spark.createDataFrame(b1 + b2, "user_id long, event_type string")
        .withColumn("ts", F.current_timestamp()), k=2)
    want = {(r.user_id, r.event_type, r.cnt, r.rnk)
            for r in batch.collect()}
    assert got == want


def test_streaming_topk_overestimate_bound_under_eviction(spark, tmp_path):
    """capacity 2 with 3 true types: the space-saving guarantee
    cnt_est - err <= true <= cnt_est must hold for every emitted row."""
    b1 = [(5, "a")] * 6 + [(5, "b")] * 4 + [(5, "c")] * 2
    rows = _run_stream(spark, tmp_path, (b1,), "topk_evict",
                       k=2, capacity=2)
    true = {"a": 6, "b": 4, "c": 2}
    assert rows
    for r in rows:
        t = true[r.event_type]
        assert r.cnt_est >= t
        assert r.cnt_est - r.err <= t


# ------------------------------------------------------------- causal ops

def test_ipw_ate_recovers_stratified_effect_and_flags_positivity(spark):
    """Stratum s1: effect +100 (2v2); stratum s2: one-arm only ->
    used=0 and excluded; ate = +100 exactly."""
    rows = [("s1", 0, 200), ("s1", 0, 200), ("s1", 1, 300), ("s1", 1, 300),
            ("s2", 1, 999), ("s2", 1, 999)]
    df = spark.createDataFrame(rows, "stratum string, arm int, y long")
    out = {r.stratum: r for r in ql.ipw_ate(
        df, "stratum", F.col("arm") == 1, "y").collect()}
    assert out["s2"].used == 0 and out["s2"].t1_micro == 0
    assert out["s1"].used == 1
    # t1 = 1e6*600*4/2 = 1.2e9 ; t0 = 1e6*400*4/2 = 8e8 ; /4 -> 1e8
    assert out["s1"].ate_micro == 100_000_000


def test_did_known_2x2(spark):
    """means 10/20 control, 10/35 treated -> DiD = +15 (micro)."""
    rows = ([(0, 0, 10)] * 2 + [(0, 1, 20)] * 2
            + [(1, 0, 10)] * 2 + [(1, 1, 35)] * 2)
    df = spark.createDataFrame(rows, "tr int, po int, y long")
    out = ql.did_estimate(df, F.col("tr") == 1, F.col("po") == 1,
                          "y").collect()[0]
    assert out.did_micro == 15_000_000
    assert (out.n_00, out.n_11) == (2, 2)


def test_eb_shrinkage_pulls_small_groups_harder(spark):
    """Two groups with the SAME raw rate deviation from the mean: the
    10-trial group must land closer to the corpus mean than the
    1000-trial group."""
    rows = [("small", 8, 10), ("big", 800, 1000),
            ("low_s", 2, 10), ("low_b", 200, 1000)]
    df = spark.createDataFrame(rows, "g string, k long, n long")
    out = {r.g: r for r in ql.eb_shrinkage(df, "g", "k", "n").collect()}
    m = 500_000   # corpus mean rate: (8+800+2+200)/(10+1000+10+1000)
    assert abs(out["small"].shrunk_ppm - m) \
        < abs(out["big"].shrunk_ppm - m)
    for g in out:
        raw, shrunk = out[g].raw_ppm, out[g].shrunk_ppm
        assert min(raw, m) - 1 <= shrunk <= max(raw, m) + 1


# --------------------------------------------------------- quantile norm

def test_quantile_normalize_aligns_equal_size_groups(spark):
    """Two same-size groups, one shifted by +1000: after QN both carry
    the identical normalized multiset (the defining QN property)."""
    from eventrelationextractor_spark.ops import textstats as ts

    rows = [(i, "a", 100 * i) for i in range(10)]
    rows += [(100 + i, "b", 100 * i + 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, x long")
    out = ts.quantile_normalize(df, "g", "x", "doc_id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.qn_value)
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    assert len(out) == 20


# ----------------------------------------------------------- orc pushdown

def test_orc_roundtrip_pushes_filter_to_scan(spark, tmp_path):
    """The lang predicate must reach the ORC reader as a pushed
    filter, and the roundtrip must be value-exact."""
    src = [(i, "t%d" % i, "en" if i % 2 else "de") for i in range(20)]
    df = spark.createDataFrame(src, "doc_id long, text string, lang string")
    path = str(tmp_path / "orc_rt")
    df.write.orc(path)
    back = spark.read.orc(path).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == {t for t in src if t[2] == "en"}


# ------------------------------------------------------------ suffix array

def _sa_reference(texts):
    s = "!".join(texts) + "!"
    n = len(s)
    suf = sorted(range(n), key=lambda i: s[i:])
    return {(r, p, ord(s[(p - 1) % n])) for r, p in enumerate(suf)}


def test_suffix_array_matches_direct_sort(spark):
    from eventrelationextractor_spark.ops import suffix as sfx

    texts = ["banana", "bandana", "abracadabra"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r.r, r.pos, r.bwt_code)
           for r in sfx.suffix_array(df).collect()}
    assert got == _sa_reference(texts)


def test_suffix_array_survives_highly_repetitive_text(spark):
    """Long common prefixes are the prefix-doubling stress case: the
    ranks must keep splitting until all distinct (<= log2 n rounds)."""
    from eventrelationextractor_spark.ops import suffix as sfx

    texts = ["aaaaabaaaab", "aaaabaaaa", "aaaaaaaa"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r.r, r.pos, r.bwt_code)
           for r in sfx.suffix_array(df).collect()}
    assert got == _sa_reference(texts)


# ------------------------------------------------------------- butterflies

def test_butterfly_k22_and_caps(spark):
    """K_{2,2} = exactly one butterfly (2 wedges, 1 pair with c=2);
    a token above the degree cap contributes nothing."""
    from eventrelationextractor_spark.ops import graph as gr

    rows = [(1, "t1"), (2, "t1"), (1, "t2"), (2, "t2")]
    rows += [(i, "hot") for i in range(30)]     # df 30 > cap
    dt = spark.createDataFrame(rows, "doc_id long, token string")
    out = gr.butterfly_count(dt, "doc_id", "token", df_cap=20) \
        .collect()[0]
    assert (out.n_rights, out.n_wedges) == (2, 2)
    assert (out.n_pairs, out.n_butterflies) == (1, 1)
