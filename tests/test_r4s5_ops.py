"""Round-4 session-5 operators: Boruvka MST, SymSpell correction,
MATTR diversity, Spearman rho, lateness profile, Sobel edge stats."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventrelationextractor_spark.ops import (  # noqa: E402
    codecs, graph, maintenance, multimodal, quality, spell, textstats,
)


# ---------------------------------------------------------------- boruvka

def _kruskal(edges):
    """Brute-force Kruskal under the (w, eid) order — the operator's
    documented tie contract."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for eid, u, v, w in sorted(edges, key=lambda e: (e[3], e[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            mst.append(eid)
    return sorted(mst)


def test_boruvka_matches_kruskal_with_ties_and_forest(spark):
    # two components (0-4 and 10-12), duplicate weights to force the
    # eid tie-break, a heavy cycle edge that must be excluded
    edges = [
        (1, 0, 1, 5), (2, 1, 2, 5), (3, 2, 3, 5), (4, 3, 4, 5),
        (5, 0, 4, 5),              # closes a cycle at the same weight
        (6, 0, 2, 99),             # heavy chord, never in the MST
        (7, 10, 11, 1), (8, 11, 12, 1), (9, 10, 12, 1),
    ]
    df = spark.createDataFrame(edges, "eid long, u long, v long, w long")
    stats = {}
    got = sorted(r.eid for r in
                 graph.boruvka_mst(df, stats=stats).collect())
    assert got == _kruskal(edges)
    assert len(got) == 4 + 2          # (5 nodes - 1) + (3 nodes - 1)
    assert stats["rounds"] <= 3


def test_boruvka_chain_logarithmic_rounds(spark):
    # a 64-node chain: components at least halve per round
    edges = [(i, i, i + 1, (i * 7) % 13) for i in range(63)]
    df = spark.createDataFrame(edges, "eid long, u long, v long, w long")
    stats = {}
    got = sorted(r.eid for r in
                 graph.boruvka_mst(df, stats=stats).collect())
    assert got == list(range(63))     # a chain IS its own MST
    assert stats["rounds"] <= 6       # ceil(log2(64))


# ---------------------------------------------------------------- symspell

def test_symspell_correction_tiers(spark):
    dic = spark.createDataFrame(
        [("hello", 100), ("help", 40), ("hell", 60), ("world", 80)],
        "term string, cnt long")
    qs = spark.createDataFrame(
        [("hello",),   # exact -> itself at dist 0
         ("helo",),    # deletion of hello; also dist-1 of help/hell
         ("xyzzy",)],  # no candidate -> dropped
        "q string")
    got = {r.q: r for r in spell.symspell_correct(qs, dic).collect()}
    assert got["hello"].match == "hello" and got["hello"].dist == 0
    # helo: hello(100), hell(60), help(40) all dist 1 -> count wins
    assert got["helo"].match == "hello" and got["helo"].dist == 1
    assert "xyzzy" not in got


# ---------------------------------------------------------------- mattr

def test_mattr_known_values(spark):
    # 5 tokens, window 3 -> windows: abc(3), bca(3), cab(3) all distinct
    d1 = (0, "a b c a b")
    # repeated token: aaa windows -> 1 distinct each
    d2 = (1, "a a a a")
    # too short for the window -> excluded
    d3 = (2, "a b")
    df = spark.createDataFrame([d1, d2, d3], "doc_id long, text string")
    got = {r.doc_id: r for r in
           textstats.mattr_diversity(df, window=3).collect()}
    assert got[0].sum_distinct == 9 and got[0].mattr_ppm == 1000000
    assert got[1].sum_distinct == 2 and got[1].mattr_ppm == 333333
    assert 2 not in got


# ---------------------------------------------------------------- spearman

def test_spearman_perfect_and_inverse_and_ties(spark):
    rows = ([(0, i, i * 2, i * 3) for i in range(8)]          # rho = 1
            + [(1, i, i, 100 - i) for i in range(8)]          # rho = -1
            + [(2, i, 1, i) for i in range(8)])               # x constant
    df = spark.createDataFrame(
        rows, "grp long, doc_id long, x long, y long")
    got = {r.grp: r for r in
           quality.spearman_rho(df, "grp", "x", "y").collect()}
    assert got[0].rho == 1.0
    assert got[1].rho == -1.0
    assert got[2].rho is None        # zero variance -> NULL, not crash


# ---------------------------------------------------------------- sobel

def test_sobel_flat_image_is_zero_and_step_edge_counts(spark):
    import numpy as np
    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    step = np.zeros((8, 8, 3), dtype=np.uint8)
    step[:, 4:, :] = 255             # vertical step edge at x=4
    media = spark.createDataFrame(
        [(0, "image", bytearray(codecs.encode_png(flat)), 8, 8),
         (1, "image", bytearray(codecs.encode_png(step)), 8, 8)],
        multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           multimodal.sobel_stats(media, edge_mag2=10000).collect()}
    assert got[0].sum_mag2 == 0 and got[0].n_edges == 0
    assert got[0].n_interior == 36
    # step: |gx| = 4*255 = 1020 on the two columns flanking the edge
    assert got[1].max_mag2 == 1020 * 1020
    assert got[1].n_edges == 12      # 6 interior rows x 2 columns


# ---------------------------------------------------------------- coloring

def test_priority_coloring_is_proper_and_matches_longest_path(spark):
    import hashlib
    edges = [(i, (i * 3 + 1) % 20) for i in range(20)] + \
            [(i, (i * 7 + 2) % 20) for i in range(20)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    stats = {}
    got = {r.node: r.color for r in
           graph.priority_coloring(df, stats=stats).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # proper: no edge joins two same-colored nodes
    for a, b in edges:
        assert got[a] != got[b]
    # equals the longest strictly priority-increasing path length
    pri = {v: hashlib.md5(str(v).encode()).hexdigest() + str(v)
           for v in adj}
    import functools

    @functools.lru_cache(maxsize=None)
    def longest(v):
        ups = [u for u in adj[v] if pri[u] > pri[v]]
        return 0 if not ups else 1 + max(longest(u) for u in ups)

    for v in adj:
        assert got[v] == longest(v), v
    assert stats["rounds"] == max(got.values()) + 1


# ------------------------------------------------------------ woe / target

def test_woe_signs_and_target_encode_oof_excludes_own_fold(spark):
    rows = [("a", 0, 1), ("a", 0, 1), ("a", 1, 0),
            ("b", 0, 0), ("b", 1, 0), ("b", 1, 1)]
    df = spark.createDataFrame(rows, "cat string, fold long, t long")
    woe = {r.bin: r for r in quality.woe_iv(df, "cat", "t").collect()}
    # 'a' is positive-heavy -> woe > 0; 'b' negative-heavy -> woe < 0
    assert woe["a"].woe > 0 > woe["b"].woe
    assert woe["a"].iv_term > 0 and woe["b"].iv_term > 0

    oof = {(r.cat, r.fold): r.oof_mean_ppm for r in
           quality.target_encode_oof(df, "cat", "fold", "t").collect()}
    # cat a, fold 0: other-fold rows = [(a,1,0)] -> mean 0
    assert oof[("a", 0)] == 0
    # cat a, fold 1: other-fold rows = [(a,0,1), (a,0,1)] -> 1.0
    assert oof[("a", 1)] == 1000000
    # cat b fold 1 -> other fold = [(b,0,0)] -> 0
    assert oof[("b", 1)] == 0


# ---------------------------------------------------------------- skipgram

def test_skipgram_window_counts(spark):
    # "x y z" window 2: directed pairs (x,y),(x,z),(y,z) + reverses
    df = spark.createDataFrame([(i, "x y z") for i in range(5)],
                               "doc_id long, text string")
    got = {(r.w_center, r.w_context): r.c_xy for r in
           textstats.skipgram_ppmi(df, window=2, min_count=5,
                                   k=50).collect()}
    assert got[("x", "y")] == 5 and got[("y", "x")] == 5
    assert got[("x", "z")] == 5 and got[("z", "y")] == 5
    assert len(got) == 6


# ---------------------------------------------------------------- bootstrap

def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    import hashlib
    rows = [(i, 100 + (i * 37) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    r1 = quality.poisson_bootstrap_ci(df, "doc_id", "n_chars",
                                      n_boot=40, seed="t").collect()[0]
    r2 = quality.poisson_bootstrap_ci(df, "doc_id", "n_chars",
                                      n_boot=40, seed="t").collect()[0]
    assert r1 == r2                        # fully deterministic
    assert r1.lo_ppm <= r1.mean_ppm <= r1.hi_ppm
    assert r1.lo_ppm < r1.hi_ppm           # non-degenerate interval
    # weight ladder draws the documented Poisson(1) weight
    u = int(hashlib.md5(b"t:0:0").hexdigest()[:8], 16)
    w_expected = next((k for k, t in enumerate(quality.POISSON1_THRESH)
                       if u < t), 9)
    assert 0 <= w_expected <= 9            # ladder covers the draw


def test_poisson_bootstrap_small_input_ranks_over_survivors(spark):
    """Zero-value single-row input: many replicates draw weight 0 or a
    zero total and are dropped; the order statistics must rank over
    the SURVIVING count (fixed ranks from n_boot previously yielded a
    NULL hi_ppm here)."""
    df = spark.createDataFrame([(1, 7)], "doc_id long, n_chars long")
    r = quality.poisson_bootstrap_ci(df, "doc_id", "n_chars",
                                     n_boot=50, seed="tiny").collect()[0]
    assert r.mean_ppm == 7_000_000
    assert r.lo_ppm is not None and r.hi_ppm is not None
    assert r.med_ppm is not None
    # one row, weight w>0 -> every surviving mean is exactly the value
    assert r.lo_ppm == r.med_ppm == r.hi_ppm == 7_000_000


def test_fd_repair_keeps_null_lhs_rows(spark):
    """NULL lhs forms its own key class (eqNullSafe join): the row must
    survive with the null-group majority, preserving the
    one-row-per-input contract (an equi-join silently dropped it)."""
    f = spark.createDataFrame(
        [(0, 1, "x"), (1, 1, "x"), (2, None, "a"), (3, None, "a"),
         (4, None, "b")],
        "doc_id long, k long, v string")
    rep = {r.doc_id: r for r in
           maintenance.fd_repair(f, "k", "v").collect()}
    assert set(rep) == {0, 1, 2, 3, 4}
    assert rep[4].rhs_repaired == "a" and rep[4].was_repaired
    assert rep[2].rhs_repaired == "a" and not rep[2].was_repaired


def test_fd_repair_null_rhs_majority_prefers_real_value_on_tie(spark):
    # k=1: one NULL rhs vs one 'z' -> tie on count; the pinned
    # tie-break prefers the real value over NULL
    f = spark.createDataFrame(
        [(0, 1, None), (1, 1, "z")], "doc_id long, k long, v string")
    rep = {r.doc_id: r for r in
           maintenance.fd_repair(f, "k", "v").collect()}
    assert rep[0].rhs_repaired == "z" and rep[0].was_repaired
    assert rep[1].rhs_repaired == "z" and not rep[1].was_repaired


# ---------------------------------------------------------------- cuped

def test_cuped_reduces_to_plain_diff_when_theta_zero_and_adjusts(spark):
    # x constant -> var(x)=0 -> theta=0 -> adjusted means = raw means
    rows = [(0, 10, 5), (0, 12, 5), (1, 20, 5), (1, 22, 5)]
    df = spark.createDataFrame(rows, "arm long, y long, x long")
    r = quality.cuped_ab(df, "arm", "y", "x").collect()[0]
    assert r.theta == 0.0
    assert r.mean_a_adj == 11.0 and r.mean_b_adj == 21.0
    assert r.delta == 10.0
    # y perfectly explained by x -> adjusted delta collapses to ~0
    rows2 = ([(0, i * 2, i) for i in range(1, 9)]
             + [(1, i * 2, i) for i in range(5, 13)])
    df2 = spark.createDataFrame(rows2, "arm long, y long, x long")
    r2 = quality.cuped_ab(df2, "arm", "y", "x").collect()[0]
    assert r2.theta == 2.0
    assert abs(r2.delta) < 1e-9


# ---------------------------------------------------------------- fd

def test_fd_g3_counts(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"),    # key 1: majority a, g3 = 1
            (2, "c"), (2, "c"),              # key 2: holds
            (3, "d")]                        # key 3: holds
    df = spark.createDataFrame(rows, "k long, v string")
    r = maintenance.fd_violations(df, [("kv", "k", "v")]).collect()[0]
    assert r.n_rows == 6 and r.n_keys == 3
    assert r.n_violating_keys == 1 and r.g3_rows == 1


# ------------------------------------------------------ streaming lateness

def test_streaming_lateness_matches_batch_across_triggers(spark, tmp_path):
    """streaming_lateness == the batch running-max window even when one
    key's series is split across two triggers (state carries the max)."""
    import os
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import events as ev

    b1 = [(7, 0, 1000), (7, 1, 5000), (8, 0, 9000)]
    b2 = [(7, 2, 3000),   # late vs the max carried from trigger 1
          (8, 1, 2000), (7, 3, 6000)]
    schema = "key long, arr long, ts_us long"
    batch = spark.createDataFrame(b1 + b2, schema)
    w = (Window.partitionBy("key").orderBy("arr")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {(r.key, r.arr, r.late)
            for r in batch.select("key", "arr",
                                  (F.max("ts_us").over(w)
                                   - F.col("ts_us")).alias("late"))
            .collect()}
    assert (7, 2, 2000) in want          # the genuinely late row

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    for i, part in enumerate((b1, b2)):
        spark.createDataFrame(part, schema).coalesce(1) \
            .write.parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.1)
    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", "1") \
        .option("latestFirst", "false").parquet(src + "/*")
    q = (ev.streaming_lateness(stream)
         .writeStream.format("memory").queryName("late_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.arr, r.late_us)
           for r in spark.sql("select * from late_out").collect()}
    assert got == want


# --------------------------------------------------------------- texttiling

def test_texttiling_finds_vocabulary_shift(spark):
    # 30 tokens of topic A, then 30 of topic B -> with block=10 the
    # deepest valley must be the gap between blocks 2 and 3
    a = " ".join(["alpha beta gamma delta epsilon"] * 6)
    b = " ".join(["omega psi chi phi upsilon"] * 6)
    df = spark.createDataFrame([(0, a + " " + b)],
                               "doc_id long, text string")
    rows = {r.gap: r for r in textstats.texttile_boundaries(
        df, block=10, depth_window=2, n_boundaries=1).collect()}
    assert rows[2].is_boundary          # the topic shift gap
    assert rows[2].ucos == 0            # disjoint vocabularies
    assert all(not r.is_boundary for g, r in rows.items() if g != 2)
    assert rows[0].ucos == 1000000      # identical blocks inside A


# ------------------------------------------------------------------ iforest

def test_isolation_forest_isolates_planted_extreme(spark):
    from eventrelationextractor_spark.ops import iforest
    pts = [(i, 100 + (i * 17) % 25, 200 + (i * 31) % 40)
           for i in range(200)] + [(999, 100000, 1)]
    df = spark.createDataFrame(pts, "doc_id long, f0 long, f1 long")
    got = iforest.isolation_scores(df, "doc_id", ["f0", "f1"],
                                   n_trees=6, max_depth=6,
                                   seed="t", k=5).collect()
    byrank = {r.rank: r for r in got}
    assert byrank[1].doc_id == 999      # the extreme point isolates first
    # deterministic across invocations
    again = iforest.isolation_scores(df, "doc_id", ["f0", "f1"],
                                     n_trees=6, max_depth=6,
                                     seed="t", k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


# ------------------------------------------------------- temporal / repair

def test_temporal_reachability_respects_time(spark):
    # seed 0; 0->1 at t=5, 1->2 at t=3 (BEFORE arrival at 1: blocked),
    # 1->3 at t=7 (after: reached)
    e = spark.createDataFrame([(0, 1, 5), (1, 2, 3), (1, 3, 7)],
                              "src long, dst long, t long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.earliest for r in
           graph.temporal_reachability(e, seeds, max_hops=4).collect()}
    assert got == {0: 0, 1: 5, 3: 7}    # node 2 unreachable in time


def test_impute_and_fd_repair_semantics(spark):
    d = spark.createDataFrame(
        [(0, "a", 10), (1, "a", 30), (2, "a", None), (3, "b", None)],
        "doc_id long, lang string, val long")
    got = {r.doc_id: r for r in
           maintenance.impute_group_median(d, "lang", "val").collect()}
    assert got[2].imputed == 10         # lower median of {10, 30}
    assert got[3].imputed == 10         # all-null group -> global median
    assert got[0].imputed == 10 and not got[0].was_imputed

    f = spark.createDataFrame(
        [(0, 1, "x"), (1, 1, "x"), (2, 1, "y"),
         (3, 2, "p"), (4, 2, "q")],   # 2: tie p/q -> lexicographic p
        "doc_id long, k long, v string")
    rep = {r.doc_id: r for r in
           maintenance.fd_repair(f, "k", "v").collect()}
    assert rep[2].rhs_repaired == "x" and rep[2].was_repaired
    assert rep[3].rhs_repaired == "p" and not rep[3].was_repaired
    assert rep[4].rhs_repaired == "p" and rep[4].was_repaired


# ------------------------------------------------------------ jw / mann-w

def test_jaro_winkler_textbook_values():
    from eventrelationextractor_spark.ops import linkage
    assert round(linkage.jaro_winkler("martha", "marhta"), 6) == 0.961111
    assert round(linkage.jaro_winkler("dixon", "dicksonx"), 6) == 0.813333
    assert round(linkage.jaro_winkler("dwayne", "duane"), 6) == 0.84
    assert linkage.jaro_winkler("abc", "xyz") == 0.0
    assert linkage.jaro_winkler("same", "same") == 1.0
    # boost only above 0.7: crate/trace share no prefix -> unchanged
    assert round(linkage.jaro_winkler("crate", "trace"), 6) == 0.733333


def test_mann_whitney_separated_and_mixed(spark):
    # arm 1 strictly above arm 0 -> maximal 2*U1 = 2*n1*n2, large z
    rows = [(0, v) for v in (1, 2, 3, 4)] + [(1, v) for v in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "arm long, x long")
    r = quality.mann_whitney_u(df, "arm", "x").collect()[0]
    assert r.u1_x2 == 2 * 4 * 4 and r.z > 2
    # identical distributions incl. ties -> U1 at its mean, z = 0
    rows2 = [(0, v) for v in (5, 5, 7)] + [(1, v) for v in (5, 5, 7)]
    r2 = quality.mann_whitney_u(
        spark.createDataFrame(rows2, "arm long, x long"),
        "arm", "x").collect()[0]
    assert r2.u1_x2 == 3 * 3 and r2.z == 0.0


# ----------------------------------------------------------------- matching

def test_greedy_matching_properties_and_greedy_equality(spark):
    import hashlib
    edges = [(i, i % 9, (i * 5 + 2) % 9) for i in range(25)]
    edges = [(e, u, v) for e, u, v in edges if u != v]
    df = spark.createDataFrame(edges, "eid long, u long, v long")
    stats = {}
    got = {(r.eid, r.u, r.v) for r in
           graph.greedy_matching(df, stats=stats).collect()}
    # brute-force sequential greedy under the same priority order
    pri = {e: hashlib.md5(str(e).encode()).hexdigest() + str(e)
           for e, _, _ in edges}
    taken, used = set(), set()
    for e, u, v in sorted(edges, key=lambda t: pri[t[0]], reverse=True):
        if u not in used and v not in used:
            taken.add((e, u, v))
            used.update((u, v))
    assert got == taken
    # matching: no vertex twice; maximal: every edge touches a match
    vs = [x for _, u, v in got for x in (u, v)]
    assert len(vs) == len(set(vs))
    for e, u, v in edges:
        assert u in set(vs) or v in set(vs)
    assert stats["rounds"] >= 1
