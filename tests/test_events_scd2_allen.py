"""SCD2 history build + Allen interval algebra (ops/events.py).

The Allen matrix covers all 13 relations with hand-constructed
intervals, plus the point-interval ambiguity cases where the fixed
CASE evaluation order is the contract (a guard like `meets` also
fires for `starts` when the left interval is a point; the earlier
branch must win identically on both engines).
"""

from pyspark.sql import Row

from eventrelationextractor_spark.ops import events as ev


def _iv(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=1, interval_id=i, start_ts=s, end_ts=e)
         for i, s, e in rows],
        "user_id long, interval_id string, start_ts long, end_ts long")


def _rel(spark, a, b):
    df = _iv(spark, [("a", a[0], a[1]), ("b", b[0], b[1])])
    out = ev.allen_relations(df, id_col="interval_id").collect()
    assert len(out) == 1
    return out[0].relation


def test_allen_all_13(spark):
    cases = {
        "before": ((0, 10), (20, 30)),
        "after": ((20, 30), (0, 10)),
        "meets": ((0, 10), (10, 30)),
        "met_by": ((10, 30), (0, 10)),
        "overlaps": ((0, 20), (10, 30)),
        "overlapped_by": ((10, 30), (0, 20)),
        "starts": ((0, 10), (0, 30)),
        "started_by": ((0, 30), (0, 10)),
        "during": ((10, 20), (0, 30)),
        "contains": ((0, 30), (10, 20)),
        "finishes": ((20, 30), (0, 30)),
        "finished_by": ((0, 30), (20, 30)),
        "equals": ((5, 15), (5, 15)),
    }
    for want, (a, b) in cases.items():
        assert _rel(spark, a, b) == want, want


def test_allen_point_interval_order(spark):
    # point interval a = [10,10] with b = [10,30]: both `starts`
    # (s1=s2, e1<e2) and `meets` (e1=s2) guards are true; `starts` is
    # evaluated first and must win (same CASE order in the SQL twin).
    assert _rel(spark, (10, 10), (10, 30)) == "starts"
    # point b at the right end: `finishes` beats `met_by`.
    assert _rel(spark, (30, 30), (10, 30)) == "finishes"
    # identical points: equals beats everything.
    assert _rel(spark, (7, 7), (7, 7)) == "equals"


def test_allen_pair_direction(spark):
    # only a.id < b.id pairs are emitted; the relation is a-relative-to-b
    df = _iv(spark, [("a", 0, 10), ("b", 20, 30), ("c", 25, 40)])
    got = {(r.id_a, r.id_b): r.relation
           for r in ev.allen_relations(df, id_col="interval_id").collect()}
    assert got == {("a", "b"): "before", ("a", "c"): "before",
                   ("b", "c"): "overlaps"}


def test_scd2_history(spark):
    rows = [
        # user 1: A A B B A  -> versions A, B, A
        Row(user_id=1, event_type="A", ts=10, event_id=1),
        Row(user_id=1, event_type="A", ts=20, event_id=2),
        Row(user_id=1, event_type="B", ts=30, event_id=3),
        Row(user_id=1, event_type="B", ts=40, event_id=4),
        Row(user_id=1, event_type="A", ts=50, event_id=5),
        # user 2: single row -> one open version
        Row(user_id=2, event_type="C", ts=15, event_id=6),
        # user 3: tie on ts broken by event_id (7 before 8)
        Row(user_id=3, event_type="X", ts=5, event_id=7),
        Row(user_id=3, event_type="Y", ts=5, event_id=8),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    out = {(r.user_id, r.version):
           (r.attr_value, r.valid_from, r.valid_to, r.is_current)
           for r in ev.scd2_history(df).collect()}
    assert out == {
        (1, 1): ("A", 10, 30, False),
        (1, 2): ("B", 30, 50, False),
        (1, 3): ("A", 50, None, True),
        (2, 1): ("C", 15, None, True),
        (3, 1): ("X", 5, 5, False),
        (3, 2): ("Y", 5, None, True),
    }


def test_cusum_matches_literal_recursion(spark):
    from eventrelationextractor_spark.ops import events as ev
    vals = [3, 3, 9, 1, 0, 8, 8, 2]  # target 4, slack 1
    rows = [("k", i, v, 4) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, t long, n long, target long")
    out = {r.t: (r.cusum, r.alarm)
           for r in ev.cusum_alarms(df, "key", "t", "n", "target",
                                    slack=1, threshold=6).collect()}
    s, expect = 0, {}
    for i, v in enumerate(vals):
        s = max(0, s + (v - 4 - 1))
        expect[i] = (s, s >= 6)
    assert out == expect
    assert any(a for _, a in out.values())      # the burst fires
    assert out[4][0] == 0                       # clip resets to zero


def test_session_transitions_counts_and_ties(spark):
    from eventrelationextractor_spark.ops import events as ev
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [  # user 1: a->b->a ; user 2: a->b with a TS TIE broken by id
        (1, t0, 1, "a"), (2, t0 + dt.timedelta(minutes=1), 1, "b"),
        (3, t0 + dt.timedelta(minutes=2), 1, "a"),
        (4, t0, 2, "a"), (5, t0, 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.src, r.dst): (r.n, r.p)
           for r in ev.session_transitions(df).collect()}
    # user 1 contributes a->b, b->a; user 2's tie resolves to a->b
    assert got == {("a", "b"): (2, 1.0),
                   ("b", "a"): (1, 1.0)}


# ---------------------------------------------------- mann-kendall / acf


def _series(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(vals)],
        "key string, o long, x long")


def test_mann_kendall_monotone_series(spark):
    n = 6
    r = ev.mann_kendall(_series(spark, list(range(n))),
                        "key", "o", "x").collect()[0]
    # strictly increasing: S = C(n,2), no ties
    assert (r.n, r.s) == (n, n * (n - 1) // 2)
    assert r.var18 == n * (n - 1) * (2 * n + 5)
    import math
    assert r.z == round((r.s - 1) / math.sqrt(r.var18 / 18.0), 6)
    dec = ev.mann_kendall(_series(spark, list(range(n))[::-1]),
                          "key", "o", "x").collect()[0]
    assert dec.s == -r.s and dec.z == -r.z


def test_mann_kendall_constant_series_degenerate(spark):
    r = ev.mann_kendall(_series(spark, [7] * 5),
                        "key", "o", "x").collect()[0]
    # all tied: S = 0 and the tie correction zeroes var18 exactly
    assert (r.s, r.var18, r.z) == (0, 0, 0.0)


def test_mann_kendall_tie_correction_known(spark):
    vals = [1, 2, 2, 3]                     # one tie group of size 2
    r = ev.mann_kendall(_series(spark, vals), "key", "o", "x").collect()[0]
    assert r.s == 5                          # 6 pairs, one tied
    assert r.var18 == 4 * 3 * 13 - 2 * 1 * 9


def test_acf_alternating_series_is_negative_lag1(spark):
    vals = [0, 10, 0, 10, 0, 10]
    rows = {r.lag: r for r in ev.acf(_series(spark, vals), "key", "o",
                                     "x", max_lag=2).collect()}
    # mean 5, centered +-5: lag1 all opposite-sign, lag2 all same-sign
    assert rows[1].acf < 0 < rows[2].acf
    n = len(vals)
    cx = [n * v - sum(vals) for v in vals]
    for k in (1, 2):
        assert rows[k].num == sum(cx[i] * cx[i + k] for i in range(n - k))
        assert rows[k].den == sum(c * c for c in cx)
        assert rows[k].n_pairs == n - k


def test_acf_gap_drops_pairs(spark):
    df = spark.createDataFrame(
        [("k", 0, 1), ("k", 1, 2), ("k", 3, 4)],   # o=2 missing
        "key string, o long, x long")
    rows = {r.lag: r for r in ev.acf(df, "key", "o", "x",
                                     max_lag=2).collect()}
    assert rows[1].n_pairs == 1               # only (0,1); (1,2),(2,3) gone
    assert rows[2].n_pairs == 1               # (1,3)
    assert 3 not in rows


def test_acf_constant_series_null(spark):
    rows = ev.acf(_series(spark, [4] * 5), "key", "o", "x",
                  max_lag=1).collect()
    assert rows[0].den == 0 and rows[0].acf is None


# ------------------------------------------------------------------ OLS


def test_linfit_exact_line(spark):
    # y = 3x + 2 exactly: slope/intercept recovered, r2 = 1
    r = ev.linfit(_series(spark, [2, 5, 8, 11]), "key", "o",
                  "x").collect()[0]
    assert (r.slope, r.intercept, r.r2) == (3.0, 2.0, 1.0)


def test_linfit_constant_y_zero_slope_null_r2(spark):
    r = ev.linfit(_series(spark, [7, 7, 7]), "key", "o", "x").collect()[0]
    assert r.slope == 0.0 and r.r2 is None


def test_linfit_single_point_degenerate(spark):
    r = ev.linfit(_series(spark, [9]), "key", "o", "x").collect()[0]
    assert r.n == 1 and r.slope is None and r.intercept is None


def test_linfit_matches_numpy(spark):
    import numpy as np
    ys = [(i * 13 + 5) % 17 for i in range(12)]
    r = ev.linfit(_series(spark, ys), "key", "o", "x").collect()[0]
    xs = np.arange(12.0)
    slope, intercept = np.polyfit(xs, np.array(ys, dtype=float), 1)
    corr = np.corrcoef(xs, np.array(ys, dtype=float))[0, 1]
    assert r.slope == round(float(slope), 6)
    assert r.intercept == round(float(intercept), 6)
    assert r.r2 == round(float(corr ** 2), 6)


# ----------------------------------------------------------------- holt


def test_holt_matches_literal_recursion(spark):
    a, b, m = 300_000, 100_000, 1_000_000
    vals = [20, 18, 15, 9, 3, 2, 30]       # decline drives trend < 0
    got = {r.o: r for r in ev.holt_smooth(
        _series(spark, vals), "key", "o", "x",
        alpha_ppm=a, beta_ppm=b).collect()}
    lvl, tr = vals[0] * m, (vals[1] - vals[0]) * m
    assert (got[0].level_u, got[0].trend_u) == (lvl, tr)
    assert got[0].forecast_u is None
    for i, x in enumerate(vals[1:], start=1):
        f = lvl + tr
        new_l = (a * x * m + (m - a) * f) // m
        tr = (b * (new_l - lvl) + (m - b) * tr) // m
        lvl = new_l
        r = got[i]
        assert (r.level_u, r.trend_u, r.forecast_u) == (lvl, tr, f)
    # the negative-trend floor behavior actually got exercised
    assert any(got[i].trend_u < 0 for i in range(len(vals)))


def test_holt_single_point_zero_trend(spark):
    r = ev.holt_smooth(_series(spark, [42]), "key", "o", "x").collect()[0]
    assert (r.level_u, r.trend_u, r.forecast_u) == (42_000_000, 0, None)


def test_holt_constant_series_tracks_exactly(spark):
    rows = ev.holt_smooth(_series(spark, [5] * 6), "key", "o",
                          "x").collect()
    for r in sorted(rows, key=lambda r: r.o)[1:]:
        assert r.level_u == 5_000_000 and r.trend_u == 0
        assert r.forecast_u == 5_000_000


# ------------------------------------------------------------ attribution


def test_attribution_models_analytic(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 12, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [(1, 1, at(0), "view"), (2, 1, at(10), "click"),
            (3, 1, at(20), "view"), (4, 1, at(30), "purchase"),
            (5, 1, at(-300), "view"),       # outside the horizon
            (6, 2, at(5), "purchase"),      # conversion with no touches
            (7, 3, at(0), "view"), (8, 3, at(1), "purchase")]
    evd = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string")
    got = {(r.conv_id, r.touch_id): r for r in ev.attribution(
        evd, horizon_minutes=120).collect()}
    assert set(got) == {(4, 1), (4, 2), (4, 3), (8, 7)}
    # linear: 3 touches -> 333333 each, remainder 1 to the LAST
    assert got[(4, 1)].linear_ppm == 333_333
    assert got[(4, 3)].linear_ppm == 333_334
    assert sum(got[(4, t)].linear_ppm for t in (1, 2, 3)) == 1_000_000
    assert got[(4, 1)].first_ppm == 1_000_000
    assert got[(4, 3)].last_ppm == 1_000_000
    assert got[(4, 2)].first_ppm == got[(4, 2)].last_ppm == 0
    assert got[(8, 7)].n_touches == 1
    assert (got[(8, 7)].first_ppm, got[(8, 7)].last_ppm,
            got[(8, 7)].linear_ppm) == (1_000_000,) * 3


def test_attribution_tie_breaks_on_id(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(10, 1, t0, "view"), (11, 1, t0, "view"),
            (12, 1, t0 + dt.timedelta(minutes=1), "purchase")]
    evd = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string")
    got = {r.touch_id: r for r in ev.attribution(evd).collect()}
    assert got[10].first_ppm == 1_000_000 and got[11].first_ppm == 0
    assert got[11].last_ppm == 1_000_000 and got[10].last_ppm == 0


# ----------------------------------------------- seasonal decomposition


def test_seasonal_decompose_integer_ratios(spark):
    # 14 consecutive days, one type: counts 1..14. Centered 7-day sums
    # exist for days 4..11 (index 3..10). Ratio for day d (cnt=d+1,
    # 1-based c): 7e6*c div (7c) = 1e6 exactly when counts are linear?
    # No - sum of 7 consecutive ints centered at c is 7c, so every full
    # window yields exactly 1_000_000.
    rows = [(f"2024-01-{d+1:02d} 12:00:00", "t") for d in range(14)
            for _ in range(d + 1)]
    df = spark.createDataFrame(rows, "ts string, event_type string") \
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type")
    out = {(r.event_type, r.dow): (r.seasonal_ppm, r.n_days)
           for r in ev.seasonal_decompose(df).collect()}
    # 8 full-window days spread over 8 distinct dows? 14 days -> dows
    # cycle; days 4..11 of Jan 2024 cover 8 consecutive dows mod 7,
    # one dow twice
    assert all(v[0] == 1_000_000 for v in out.values())
    assert sum(v[1] for v in out.values()) == 8
    assert len(out) == 7


def test_seasonal_decompose_weekly_spike(spark):
    # 21 days, count 8 on day%7==0 else 1: weekly mean 2 -> spike index
    # 7e6*8 div 14 = 4_000_000, flat days 7e6*1 div 14 = 500_000
    rows = []
    for d in range(21):
        c = 8 if d % 7 == 0 else 1
        rows += [(f"2024-03-{d+1:02d} 00:30:00", "t")] * c
    df = spark.createDataFrame(rows, "ts string, event_type string") \
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "event_type")
    out = {r.dow: r.seasonal_ppm
           for r in ev.seasonal_decompose(df).collect()}
    spike_dow = (19783 + 0) % 7  # 2024-03-01 epoch day = 19783
    assert out[spike_dow] == 4_000_000
    assert all(v == 500_000 for d, v in out.items() if d != spike_dow)


# --------------------------------------------------------- Kaplan-Meier


def _km(spark, rows):
    df = spark.createDataFrame(rows, "ts string, user_id long, "
                                     "event_type string") \
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id",
                    "event_type")
    return {r.duration_min: (r.n_risk, r.n_events, r.survival)
            for r in ev.kaplan_meier(df).collect()}


def test_kaplan_meier_textbook_curve(spark):
    # 4 users: u0 converts at 10min, u1 at 20min, u2 censored at 15min,
    # u3 censored at 30min.
    rows = [("2024-01-01 00:00:00", 0, "view"),
            ("2024-01-01 00:10:00", 0, "purchase"),
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 00:20:00", 1, "purchase"),
            ("2024-01-01 00:00:00", 2, "view"),
            ("2024-01-01 00:15:00", 2, "view"),
            ("2024-01-01 00:00:00", 3, "view"),
            ("2024-01-01 00:30:00", 3, "view")]
    got = _km(spark, rows)
    # t=10: n=4,d=1 -> S=.75; t=20: at risk {u1,u3}=2, d=1 -> S=.375
    assert got == {10: (4, 1, 0.75), 20: (2, 1, 0.375)}


def test_kaplan_meier_full_death_pins_zero(spark):
    rows = [("2024-01-01 00:00:00", 0, "view"),
            ("2024-01-01 00:05:00", 0, "purchase"),
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 00:05:00", 1, "purchase")]
    got = _km(spark, rows)
    assert got == {5: (2, 2, 0.0)}


def test_kaplan_meier_instant_conversion_and_subminute(spark):
    # u0's first event IS the purchase (duration 0); u1 converts at
    # 90s -> floor to 1 min
    rows = [("2024-01-01 00:00:00", 0, "purchase"),
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 00:01:30", 1, "purchase")]
    got = _km(spark, rows)
    assert got == {0: (2, 1, 0.5), 1: (1, 1, 0.0)}


def test_theil_sen_robust_to_outlier(spark):
    # y = 2x except one wild outlier; OLS would bend, Theil-Sen holds 2
    rows = [("k", x, 2 * x) for x in range(10)] + [("k", 10, 1000)]
    df = spark.createDataFrame(rows, "key string, o long, x long")
    r = ev.theil_sen(df, "key", "o", "x").collect()[0]
    assert r.n_pairs == 55
    assert r.slope == 2.0


def test_step_breakpoint_finds_staged_shift(spark):
    rows = [("k", x, 10) for x in range(10)] + \
           [("k", x, 30) for x in range(10, 20)]
    df = spark.createDataFrame(rows, "key string, o long, x long")
    r = ev.step_breakpoint(df, "key", "o", "x").collect()[0]
    assert (r.break_after, r.n) == (9, 20)
    assert (r.mean_left, r.mean_right) == (10.0, 30.0)
    assert r.cost == 0.0


def test_step_breakpoint_tie_prefers_earlier_split(spark):
    # constant series: every split costs 0 -> earliest split wins
    df = spark.createDataFrame([("k", x, 5) for x in range(6)],
                               "key string, o long, x long")
    r = ev.step_breakpoint(df, "key", "o", "x").collect()[0]
    assert r.break_after == 0 and r.cost == 0.0


def test_step_breakpoint_singleton_emits_nothing(spark):
    df = spark.createDataFrame([("k", 1, 5)], "key string, o long, x long")
    assert ev.step_breakpoint(df, "key", "o", "x").count() == 0
