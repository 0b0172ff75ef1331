"""Round-4 session-5 operators: Boruvka MST, SymSpell correction,
MATTR diversity, Spearman rho, lateness profile, Sobel edge stats."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventrelationextractor_spark.ops import (  # noqa: E402
    codecs, graph, multimodal, quality, spell, textstats,
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
