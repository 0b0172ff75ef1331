"""Round-5 session-3 operators: hop-bounded exact betweenness/stress
centrality (sigma-BFS + sigma-decomposition), grid-blocked 2-D DBSCAN,
capacitated Gale-Shapley stable matching.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import cluster as cl
from eventrelationextractor_spark.ops import graph as gr
from eventrelationextractor_spark.ops import linkage as lk


# ---------------------------------------------------------- centrality

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_apsp_centrality_path_graph(spark):
    """On the path 0-1-2-3: inner vertices carry exactly the pairs
    they separate (stress = #pairs through them), endpoints zero;
    unique shortest paths make bc_micro = 1e6 * stress."""
    res = gr.apsp_centrality(_edges(spark, [(0, 1), (1, 2), (2, 3)]),
                             _nodes(spark, range(4)), max_hops=8)
    got = {r["node"]: (r["stress"], r["bc_micro"])
           for r in res.collect()}
    # vertex 1 separates (0,2), (0,3); vertex 2 separates (0,3), (1,3)
    assert got == {0: (0, 0), 1: (2, 2000000),
                   2: (2, 2000000), 3: (0, 0)}


def test_apsp_centrality_diamond_splits_flow(spark):
    """Diamond 0-{1,2}-3: two shortest 0-3 paths, so each middle
    vertex gets sigma-share 1/2 of that pair -> bc_micro 500000,
    stress 1 (one path through each). Symmetrically 0 and 3 are the
    middles of the two shortest 1-2 paths."""
    res = gr.apsp_centrality(
        _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]),
        _nodes(spark, range(4)), max_hops=8)
    got = {r["node"]: (r["stress"], r["bc_micro"])
           for r in res.collect()}
    assert got == {0: (1, 500000), 1: (1, 500000),
                   2: (1, 500000), 3: (1, 500000)}


def test_apsp_centrality_hop_bound_excludes_far_pairs(spark):
    """Path 0-1-2-3-4 with max_hops=2: the (0,4) and (0,3)/(1,4)
    pairs exceed the bound, so vertex 2 only counts (0,2)...(2,4)
    middles within 2 hops: pairs (1,3) through 2 -> stress 1."""
    res = gr.apsp_centrality(
        _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]),
        _nodes(spark, range(5)), max_hops=2)
    got = {r["node"]: r["stress"] for r in res.collect()}
    assert got[2] == 1          # only (1,3); (0,4) is 4 hops away
    assert got[0] == 0 and got[4] == 0


# -------------------------------------------------------------- dbscan

def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, x long, y long")


def test_dbscan_two_clusters_and_noise(spark):
    """Two dense 3-point clumps 1000 apart + one isolated point:
    clumps become clusters labeled by their min pid, the isolate is
    noise (-1, not core)."""
    rows = [(1, 100, 100), (2, 105, 100), (3, 100, 108),
            (10, 1100, 100), (11, 1105, 100), (12, 1100, 92),
            (99, 550, 550)]
    res = cl.dbscan_grid(_pts(spark, rows), eps=20, min_pts=3)
    got = {r["pid"]: (r["is_core"], r["label"]) for r in res.collect()}
    assert got[1] == (True, 1) and got[2] == (True, 1) \
        and got[3] == (True, 1)
    assert got[10] == (True, 10) and got[11] == (True, 10) \
        and got[12] == (True, 10)
    assert got[99] == (False, -1)


def test_dbscan_border_point_adopts_min_core_label(spark):
    """A point within eps of ONE core point (so not core itself at
    min_pts=3) is border: labeled with the core's cluster."""
    rows = [(1, 100, 100), (2, 110, 100), (3, 100, 110),
            (7, 118, 100)]   # 7 is 8 from pid2 only
    res = cl.dbscan_grid(_pts(spark, rows), eps=15, min_pts=3)
    got = {r["pid"]: (r["is_core"], r["label"]) for r in res.collect()}
    assert got[7] == (False, 1)          # border of cluster 1
    assert got[1][0] and got[2][0] and got[3][0]


def test_dbscan_cross_cell_pairs_found(spark):
    """Two points straddling a cell boundary (eps=10: cells of 10)
    must still pair up through the 3x3 neighborhood expansion."""
    rows = [(1, 9, 9), (2, 11, 11), (3, 14, 9)]
    res = cl.dbscan_grid(_pts(spark, rows), eps=10, min_pts=2)
    got = {r["pid"]: (r["is_core"], r["label"]) for r in res.collect()}
    assert all(v[0] for v in got.values())
    assert {v[1] for v in got.values()} == {1}


# ----------------------------------------------------- stable matching

def _gs_python(props, n_shards, cap):
    """Sequential textbook deferred acceptance (proposal order = id):
    the reference outcome the synchronous rounds must converge to."""
    def pkey(p, s):
        return (hashlib.md5(f"p:{p}:{s}".encode()).hexdigest(), s)

    def skey(s, p):
        return (hashlib.md5(f"s:{s}:{p}".encode()).hexdigest(), p)

    prefs = {p: sorted(range(n_shards), key=lambda s: pkey(p, s))
             for p in props}
    cursor = {p: 0 for p in props}
    holds: dict[int, list[int]] = {s: [] for s in range(n_shards)}
    free = list(props)
    while free:
        p = free.pop(0)
        if cursor[p] >= n_shards:
            continue
        s = prefs[p][cursor[p]]
        cursor[p] += 1
        holds[s].append(p)
        holds[s].sort(key=lambda q: skey(s, q))
        if len(holds[s]) > cap:
            bumped = holds[s].pop()
            free.append(bumped)
    return {p: s for s, ps in holds.items() for p in ps}


def test_stable_matching_equals_sequential_and_has_no_blocking_pair(
        spark):
    """12 synchronous rounds on 12 proposers x 4 shards (cap 3) must
    (a) match everyone, (b) equal the sequential deferred-acceptance
    outcome, (c) contain zero blocking pairs."""
    ids = [3 * i for i in range(12)]
    props = spark.createDataFrame([(p,) for p in ids], "p long")
    res = lk.stable_matching(props, n_shards=4, rounds=12)
    got = {r["p"]: r["shard"] for r in res.collect()}
    assert all(s >= 0 for s in got.values())
    expect = _gs_python(ids, 4, 3)
    assert got == expect

    def pkey(p, s):
        return (hashlib.md5(f"p:{p}:{s}".encode()).hexdigest(), s)

    def skey(s, p):
        return (hashlib.md5(f"s:{s}:{p}".encode()).hexdigest(), p)

    holds: dict[int, list[int]] = {}
    for p, s in got.items():
        holds.setdefault(s, []).append(p)
    for p, ms in got.items():
        for s in range(4):
            if pkey(p, s) < pkey(p, ms):      # p prefers s to its match
                worst = max(holds.get(s, []), key=lambda q: skey(s, q))
                # stability: s must NOT prefer p to its worst hold
                assert not skey(s, p) < skey(s, worst), \
                    f"blocking pair ({p}, {s})"


def test_stable_matching_capacity_respected(spark):
    """No shard ever exceeds ceil(n/n_shards)."""
    ids = list(range(0, 100, 4))                       # 25 proposers
    props = spark.createDataFrame([(p,) for p in ids], "p long")
    res = lk.stable_matching(props, n_shards=10, rounds=12)
    sizes = (res.groupBy("shard").count()
             .agg(F.max("count")).collect()[0][0])
    assert sizes <= 3                                  # ceil(25/10)
