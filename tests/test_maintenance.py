"""ops/maintenance.py: compaction planning, skew profiling, k-anonymity
suppression - semantics + the scale-shape claims."""

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import maintenance


def test_compaction_plan_bins_and_append_stability(spark):
    files = [("p0", "a", 100), ("p0", "b", 100), ("p0", "c", 100),
             ("p0", "d", 250), ("p1", "a", 50)]
    df = spark.createDataFrame(
        files, "partition string, path string, size_bytes long")
    out = {(r.partition, r.path): (r.bin, r.bin_offset)
           for r in maintenance.compaction_plan(
               df, target_bytes=250).collect()}
    # cumsum-before: a=0, b=100, c=200, d=300 -> bins 0,0,0,1
    assert out[("p0", "a")] == (0, 0)
    assert out[("p0", "b")] == (0, 100)
    assert out[("p0", "c")] == (0, 200)
    assert out[("p0", "d")] == (1, 300)
    assert out[("p1", "a")] == (0, 0)        # partitions independent
    # append-stable: adding a later path never moves earlier files
    grown = spark.createDataFrame(
        files + [("p0", "z", 999)],
        "partition string, path string, size_bytes long")
    out2 = {(r.partition, r.path): (r.bin, r.bin_offset)
            for r in maintenance.compaction_plan(
                grown, target_bytes=250).collect()}
    assert all(out2[k] == v for k, v in out.items())
    with pytest.raises(ValueError):
        maintenance.compaction_plan(df, target_bytes=0)


def test_compaction_plan_partition_window_not_global_sort(spark):
    df = spark.createDataFrame([("p0", "a", 1), ("p1", "b", 2)],
                               "partition string, path string,"
                               " size_bytes long")
    plan = maintenance.compaction_plan(df)._jdf.queryExecution() \
        .toString().split("== Physical Plan ==")[-1]
    assert "hashpartitioning(partition" in plan
    assert "rangepartitioning" not in plan


def test_skew_profile_shares_and_salt(spark):
    rows = [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    out = {r.key: (r.n, r.share, r.salt_factor)
           for r in maintenance.skew_profile(
               df, "k", n_partitions=10, top_k=2).collect()}
    assert set(out) == {"1", "2"}            # top-2 only
    assert out["1"] == (80, 0.8, 8)          # 80% of 10 partitions
    assert out["2"] == (15, 0.15, 2)         # ceil(1.5)


def test_kanon_suppress_marks_small_groups(spark):
    rows = [(i, "en", i % 2) for i in range(10)] + [(99, "xx", 0)]
    df = spark.createDataFrame(rows, "id long, lang string, b long")
    out = {r.id: (r.group_n, r.is_suppressed)
           for r in maintenance.kanon_suppress(
               df, ["lang", "b"], k=5).collect()}
    assert out[0] == (5, False) and out[1] == (5, False)
    assert out[99] == (1, True)
    with pytest.raises(ValueError):
        maintenance.kanon_suppress(df, [], k=5)


def test_ldiversity_flags_homogeneous_groups(spark):
    rows = [
        # group A: 3 rows, 1 distinct sensitive value -> suppressed
        ("a", "g1", "flu"), ("b", "g1", "flu"), ("c", "g1", "flu"),
        # group B: 2 rows, 2 distinct -> kept
        ("d", "g2", "flu"), ("e", "g2", "cold"),
    ]
    df = spark.createDataFrame(rows, "id string, quasi string, dx string")
    out = {r.id: r for r in maintenance.ldiversity_suppress(
        df, ["quasi"], "dx", l=2).collect()}
    assert out["a"].is_suppressed and out["a"].sensitive_n == 1
    assert out["a"].group_n == 3
    assert not out["d"].is_suppressed and out["d"].sensitive_n == 2
    with pytest.raises(ValueError):
        maintenance.ldiversity_suppress(df, [], "dx")
    with pytest.raises(ValueError):
        maintenance.ldiversity_suppress(df, ["quasi"], "dx", l=0)


def test_ivm_refresh_equals_full_rebuild(spark):
    base = spark.createDataFrame(
        [("x", 1, 10), ("x", 1, 30), ("y", 1, 5)],
        "k string, day long, m long")
    delta = spark.createDataFrame(
        # updates x/1 (new min), creates z/2 (new key)
        [("x", 1, 2), ("z", 2, 7)],
        "k string, day long, m long")
    snap = maintenance.rollup_build(base, ["k", "day"], "m")
    drol = maintenance.rollup_build(delta, ["k", "day"], "m")
    refreshed = {(r.k, r.day): (r.n, r.sum_m, r.min_m, r.max_m)
                 for r in maintenance.ivm_refresh(snap, drol).collect()}
    rebuilt = {(r.k, r.day): (r.n, r.sum_m, r.min_m, r.max_m)
               for r in maintenance.rollup_build(
                   base.unionByName(delta), ["k", "day"], "m").collect()}
    assert refreshed == rebuilt
    assert refreshed[("x", 1)] == (3, 42, 2, 30)   # delta lowered the min
    assert refreshed[("z", 2)] == (1, 7, 7, 7)     # key born in the delta
    assert refreshed[("y", 1)] == (1, 5, 5, 5)     # untouched passthrough


def test_gini_concentration_known_and_even(spark):
    from eventrelationextractor_spark.ops import maintenance
    df = spark.createDataFrame([("a",), ("b",), ("b",), ("b",)],
                               "k string")
    row = maintenance.gini_concentration(df, "k").collect()[0]
    # sizes (1,3): gini = (2*(1*1+2*3) - 3*4) / (2*4) = 0.25
    assert (row.n_groups, row.total, row.gini) == (2, 4, 0.25)
    even = spark.createDataFrame([("a",), ("b",)], "k string")
    assert maintenance.gini_concentration(even, "k").collect()[0].gini == 0.0


# ----------------------------------------------------------- t-closeness


def test_tcloseness_matching_distribution_is_zero(spark):
    # every group mirrors the global mix exactly -> EMD 0, kept
    rows = [(g, sv) for g in ("a", "b") for sv in (1, 1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, sv long")
    for r in maintenance.tcloseness_groups(df, ["g"], "sv").collect():
        assert (r.emd_num, r.t_ppm, r.is_suppressed) == (0, 0, False)


def test_tcloseness_skewed_group_analytic(spark):
    # global: values 1,2 with 3+3; group x all-1s, group y all-2s.
    # ladder m=2, one rung: |cum_c*N - cum_C*n_g| = |3*6 - 3*3| = 9
    # EMD = 9 / (1*3*6) = 0.5 exactly
    rows = [("x", 1)] * 3 + [("y", 2)] * 3
    df = spark.createDataFrame(rows, "g string, sv long")
    got = {r.g: r for r in maintenance.tcloseness_groups(
        df, ["g"], "sv", t_ppm=400_000).collect()}
    for g in ("x", "y"):
        assert got[g].emd_num == 9
        assert got[g].t_ppm == 500_000
        assert got[g].is_suppressed is True


def test_tcloseness_single_value_degenerate(spark):
    df = spark.createDataFrame([("a", 7), ("b", 7)], "g string, sv long")
    for r in maintenance.tcloseness_groups(df, ["g"], "sv").collect():
        assert r.m == 1 and r.t_ppm == 0 and r.is_suppressed is False


def test_tcloseness_matches_bruteforce_emd(spark):
    from fractions import Fraction
    data = [("g%d" % (i % 3), (i * 7 + 2) % 4) for i in range(24)]
    df = spark.createDataFrame(data, "g string, sv long")
    got = {r.g: r for r in
           maintenance.tcloseness_groups(df, ["g"], "sv").collect()}
    values = sorted({sv for _, sv in data})
    n_all = len(data)
    for g in ("g0", "g1", "g2"):
        member = [sv for gg, sv in data if gg == g]
        emd = Fraction(0)
        cp = cq = Fraction(0)
        for v in values[:-1]:
            cp += Fraction(sum(1 for x in member if x == v), len(member))
            cq += Fraction(sum(1 for _, x in data if x == v), n_all)
            emd += abs(cp - cq)
        emd /= (len(values) - 1)
        assert Fraction(got[g].emd_num,
                        (len(values) - 1) * len(member) * n_all) == emd


def test_tcloseness_requires_quasi_cols(spark):
    df = spark.createDataFrame([("a", 1)], "g string, sv long")
    with pytest.raises(ValueError):
        maintenance.tcloseness_groups(df, [], "sv")


# ------------------------------------------------------------- zone maps


def test_zone_map_prune_layout_contrast(spark):
    # seq layout: file 0 spans the whole value range -> survives any
    # predicate; value-clustered layout prunes every non-overlapping file
    rows = [("seq", 0, v) for v in (10, 500, 160)] + \
        [("byv", v // 100, v) for v in (10, 500, 160)]
    df = spark.createDataFrame(rows, "layout string, f long, v long")
    got = {(r.layout, r.file_id): r for r in
           maintenance.zone_map_prune(df, "layout", "f", "v",
                                      lo=150, hi=200).collect()}
    assert got[("seq", 0)].survives is True
    assert got[("byv", 1)].survives is True       # holds 160
    assert got[("byv", 0)].survives is False
    assert got[("byv", 5)].survives is False
    assert got[("seq", 0)].min_v == 10 and got[("seq", 0)].max_v == 500


def test_zone_map_envelope_false_positive(spark):
    # file holds {100, 300}: envelope [100,300] overlaps [150,200) but
    # no row matches - the file SURVIVES (skip tests are envelope-level)
    df = spark.createDataFrame([("l", 0, 100), ("l", 0, 300)],
                               "layout string, f long, v long")
    r = maintenance.zone_map_prune(df, "layout", "f", "v",
                                   lo=150, hi=200).collect()[0]
    assert r.survives is True and r.n_rows == 2


def test_zone_map_boundary_semantics(spark):
    # lo inclusive, hi exclusive: max_v = 149 misses, min_v = 200 misses,
    # min_v = 199 survives
    df = spark.createDataFrame(
        [("l", 0, 149), ("l", 1, 200), ("l", 2, 199)],
        "layout string, f long, v long")
    got = {r.file_id: r.survives for r in
           maintenance.zone_map_prune(df, "layout", "f", "v",
                                      lo=150, hi=200).collect()}
    assert got == {0: False, 1: False, 2: True}


def test_kanon_generalize_picks_minimal_level(spark):
    from eventrelationextractor_spark.ops.maintenance import kanon_generalize
    # 6 rows: exact values are singletons, v div 10 groups {1x:4, 2x:2}
    df = spark.createDataFrame([(10,), (11,), (12,), (13,), (20,), (21,)],
                               "v long")
    got = kanon_generalize(df, ["v", "v div 10", "0"], k=2).collect()
    assert all(r.level == 1 for r in got)
    assert {(r.qi, r.n) for r in got} == {("1", 4), ("2", 2)}
    # k too large for any real level -> coarsest constant wins
    got = kanon_generalize(df, ["v", "v div 10", "0"], k=5).collect()
    assert [(r.qi, r.n, r.level) for r in got] == [("0", 6, 2)]
    # already k-anonymous at level 0 -> untouched release
    df2 = spark.createDataFrame([(7,), (7,), (8,), (8,)], "v long")
    got = kanon_generalize(df2, ["v", "v div 10", "0"], k=2).collect()
    assert all(r.level == 0 for r in got) and len(got) == 2


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)], "id long, src string")
    a = {r.group: (r.n, r.noisy_n)
         for r in maintenance.dp_noisy_counts(df, "src",
                                              epsilon=0.5).collect()}
    b = {r.group: (r.n, r.noisy_n)
         for r in maintenance.dp_noisy_counts(df, "src",
                                              epsilon=0.5).collect()}
    assert a == b                      # sticky noise: idempotent release
    assert set(a) == {"s0", "s1", "s2"}
    for n, noisy in a.values():
        assert n == 10
        # Laplace(b=2) puts |noise| <= b*ln(1e15) ~ 69 at the 5e-16 clamp
        assert abs(noisy - n) <= 70.0
    # a different salt draws different noise
    c = {r.group: r.noisy_n
         for r in maintenance.dp_noisy_counts(df, "src", epsilon=0.5,
                                              seed_salt="x").collect()}
    assert any(c[k] != a[k][1] for k in c)
    with pytest.raises(ValueError):
        maintenance.dp_noisy_counts(df, "src", epsilon=0.0)


def test_expectation_counts_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 200.0)], "id long, v double")
    out = {r.check_name: (r.checked, r.violations, r.violation_ppm)
           for r in maintenance.expectation_counts(
               df, {"v_range": "NOT (v >= 0 AND v <= 100)",
                    "id_positive": "id <= 0"}).collect()}
    # NULL v -> unevaluable -> violation; 200.0 -> violation
    assert out["v_range"] == (3, 2, 666666)
    assert out["id_positive"] == (3, 0, 0)
    with pytest.raises(ValueError):
        maintenance.expectation_counts(df, {})


def test_fk_orphans_counts_null_and_missing(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = maintenance.fk_orphans(child, "fk", parent, "pk", "c_fk") \
        .collect()[0]
    assert (r.check_name, r.checked, r.violations) == ("c_fk", 4, 2)


def test_sampled_join_estimate_rate1_is_exact(spark):
    left = spark.createDataFrame([(i,) for i in range(20)], "k long")
    right = spark.createDataFrame([(i % 10,) for i in range(40)],
                                  "j long")
    r = maintenance.sampled_join_estimate(left, "k", right, "j",
                                          rate_denom=1).collect()[0]
    assert r.sampled_pairs == r.true_pairs == r.est_pairs == 40
    assert r.err_ppm == 0
    # sampled estimate is count * rate and uses the SAME key gate on
    # both sides (a surviving key contributes its full fan-out)
    r8 = maintenance.sampled_join_estimate(left, "k", right, "j",
                                           rate_denom=4).collect()[0]
    assert r8.est_pairs == r8.sampled_pairs * 4
    assert r8.sampled_pairs % 4 == 0   # whole keys (fanout 4) survive
