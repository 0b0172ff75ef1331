"""Session-3 operators: PageRank (ops/graph.py), line-level dedup
(ops/linededup.py), temperature mixing (ops/mixing.py), and distributed
BPE (ops/bpe.py) — semantic tests against analytic results and, for BPE,
a pure-Python reference implementation of the classical algorithm."""

import math

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import bpe, graph, linededup, mixing

# ---------------------------------------------------------------- pagerank


def _ranks(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank
            for r in graph.pagerank(e, **kw).collect()}


def test_pagerank_sums_to_one_with_dangling(spark):
    # 0 -> 1 -> 2, 2 dangling; 3 isolated is absent without a nodes frame
    r = _ranks(spark, [(0, 1), (1, 2)], n_iter=10)
    assert set(r) == {0, 1, 2}
    assert math.isclose(sum(r.values()), 1.0, abs_tol=1e-12)
    assert r[2] > r[1] > r[0]  # chain accumulates rank downstream


def test_pagerank_analytic_two_cycle(spark):
    # symmetric 2-cycle: stationary distribution is uniform regardless
    # of damping; power iteration from uniform stays exactly uniform
    r = _ranks(spark, [(0, 1), (1, 0)], n_iter=3)
    assert math.isclose(r[0], 0.5, abs_tol=1e-12)
    assert math.isclose(r[1], 0.5, abs_tol=1e-12)


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 2)]  # dup edge
    n, d, it = 5, 0.85, 6  # node 4 via nodes frame: isolated + dangling
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank
           for r in graph.pagerank(e, n_iter=it, nodes=nodes).collect()}

    M = np.zeros((n, n))
    for s, t in edges:
        M[t, s] += 1
    deg = M.sum(axis=0)
    out = np.where(deg > 0, deg, 1)
    P = M / out
    r = np.full(n, 1.0 / n)
    for _ in range(it):
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (P @ r + dangling / n)
    for i in range(n):
        assert math.isclose(got[i], r[i], abs_tol=1e-9), (i, got[i], r[i])
    # the duplicate edge 0->2 must carry double weight: drop it and ranks
    # change (guards against an accidental distinct() upstream)
    e2 = spark.createDataFrame(edges[:-1], "src long, dst long")
    got2 = {r.node: r.rank
            for r in graph.pagerank(e2, n_iter=it, nodes=nodes).collect()}
    assert not math.isclose(got2[2], got[2], abs_tol=1e-12)


# ---------------------------------------------------------------- lines


def _line_df(spark):
    rows = [
        (0, "boiler\nunique zero\nshared"),
        (1, "boiler\nunique one\nshared"),
        (2, "boiler\nunique two"),
        (3, "boiler"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_drop_boilerplate_lines(spark):
    out = {r.doc_id: (r.text, r.n_lines_kept)
           for r in linededup.drop_boilerplate_lines(
               _line_df(spark), max_doc_freq=2).collect()}
    # 'boiler' in 4 docs -> dropped; 'shared' in 2 docs -> kept (<= 2)
    assert out[0] == ("unique zero\nshared", 2)
    assert out[1] == ("unique one\nshared", 2)
    assert out[2] == ("unique two", 1)
    assert out[3] == ("", 0)  # fully-boilerplate doc survives, empty


def test_dedup_lines_keep_first(spark):
    out = {r.doc_id: (r.text, r.n_lines_kept)
           for r in linededup.dedup_lines_keep_first(
               _line_df(spark)).collect()}
    assert out[0] == ("boiler\nunique zero\nshared", 3)  # first copies win
    assert out[1] == ("unique one", 1)
    assert out[2] == ("unique two", 1)
    assert out[3] == ("", 0)


def test_line_doc_freq(spark):
    freq = {r.line: (r.n_docs, r.n_occurrences)
            for r in linededup.line_doc_freq(_line_df(spark)).collect()}
    assert freq["boiler"] == (4, 4)
    assert freq["shared"] == (2, 2)


# ---------------------------------------------------------------- mixing


def test_temperature_mixture_rates_analytic(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, lang string")
    r = {row.lang: row for row in mixing.temperature_mixture_rates(
        df, "lang", alpha=0.5, target_frac=0.5).collect()}
    z = math.sqrt(90) + math.sqrt(10)
    assert math.isclose(r["big"].weight, math.sqrt(90) / z, rel_tol=1e-12)
    assert math.isclose(r["big"].rate,
                        0.5 * 100 * math.sqrt(90) / z / 90, rel_tol=1e-12)
    # tail stratum gets boosted above 1 -> capped
    assert math.isclose(r["small"].rate, 1.0, abs_tol=1e-12)
    assert r["small"].rate > r["big"].rate


def test_apply_mixture_fate_matches_stratified_sample(spark):
    """A row's md5 fate is identical between the driver-rate primitive
    (stratified_sample) and the data-derived mixture filter."""
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame([(i, "a") for i in range(200)],
                               "doc_id long, lang string")
    rates = mixing.temperature_mixture_rates(df, "lang", alpha=0.5,
                                             target_frac=0.4)
    got = {r.doc_id for r in
           mixing.apply_mixture(df, rates, "lang").collect()}
    want = {r.doc_id for r in
            textstats.stratified_sample(df, {"a": 0.4}, "lang").collect()}
    assert got == want and 0 < len(got) < 200


# ---------------------------------------------------------------- bpe


def _ref_bpe(words: dict, k: int):
    """Classical BPE (Sennrich alg. 1) in plain Python: pair counts over
    the word-frequency dict, greedy left-to-right merge application."""
    vocab = {tuple(w): f for w, f in words.items()}
    merges = []
    for rank in range(1, k + 1):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), f = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, f))
        new = {}
        for syms, wf in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + wf
        vocab = new
    return merges, vocab


def _corpus_df(spark, words: dict):
    text = " ".join(" ".join([w] * f) for w, f in sorted(words.items()))
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_learn_bpe_matches_reference(spark):
    words = {"lower": 5, "lowest": 3, "newer": 6, "wider": 2, "low": 7}
    got = bpe.learn_bpe(_corpus_df(spark, words), n_merges=6)
    want, _ = _ref_bpe(words, 6)
    assert got == want


def test_learn_bpe_overlapping_runs(spark):
    """'aaaa' exercises the wrapper encoding: greedy left-to-right gives
    (aa)(aa), never a(aa)a — and merged multi-char symbols must not
    false-match inside longer symbols."""
    words = {"aaaa": 10, "aaab": 4, "baaa": 3}
    k = 4
    got = bpe.learn_bpe(_corpus_df(spark, words), n_merges=k)
    want, ref_vocab = _ref_bpe(words, k)
    assert got == want
    vocab = {r.token: r.freq for r in
             bpe.subword_vocab(_corpus_df(spark, words), got).collect()}
    ref_counts = {}
    for syms, f in ref_vocab.items():
        for s in syms:
            ref_counts[s] = ref_counts.get(s, 0) + f
    assert vocab == ref_counts


def test_learn_bpe_exhausts_pairs(spark):
    # single two-char word: exactly one merge possible, then stop early
    got = bpe.learn_bpe(_corpus_df(spark, {"ab": 3}), n_merges=5)
    assert got == [(1, "a", "b", 3)]


def test_encode_tokens_classical_semantics(spark):
    """Doc-level merge application == classical per-word BPE: merges
    'lo' then 'lolo' can't chain across the word boundary, and within
    a word the left-to-right replace reproduces the greedy pass."""
    df = spark.createDataFrame([(1, "lolo helo"), (2, "")],
                               "doc_id long, text string")
    merges = [(1, "l", "o", 0), (2, "lo", "lo", 0)]
    got = {r.doc_id: r.tokens
           for r in bpe.encode_tokens(df, merges).collect()}
    assert got[1] == ["lolo", "h", "e", "lo"]
    assert got[2] == []


def test_encode_tokens_is_map_side(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    plan = bpe.encode_tokens(df, [(1, "a", "b", 0)])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_encode_bpe_checksums(spark):
    """id assignment: vocab ranked (freq DESC, token ASC). Corpus
    'ab ab b' with merge (a,b): vocab ab:2 b:1 -> ids ab=1, b=2."""
    import hashlib
    df = spark.createDataFrame([(1, "ab ab b")], "doc_id long, text string")
    row = bpe.encode_bpe(df, [(1, "a", "b", 0)]).collect()[0]
    assert row.n_tokens == 3
    assert row.stream_md5 == hashlib.md5(b"ab ab b").hexdigest()
    assert row.id_checksum == 1 + 1 + 2


# ------------------------------------------------------------ triangles


def _tri(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = (spark.createDataFrame([(n,) for n in nodes], "node long")
          if nodes is not None else None)
    return {r.node: r.n_triangles
            for r in graph.triangle_counts(e, nodes=nd).collect()}


def test_triangles_k4_every_node_in_three(spark):
    # K4 has C(4,3)=4 triangles; each node sits on exactly 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_path_has_none_and_zero_fills(spark):
    got = _tri(spark, [(0, 1), (1, 2), (2, 3)], nodes=[0, 1, 2, 3, 9])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 0}


def test_triangles_ignore_direction_duplicates_selfloops(spark):
    # one triangle, given as a directed multigraph with noise
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0), (1, 2)]
    assert _tri(spark, edges) == {0: 1, 1: 1, 2: 1}


def test_triangles_hub_counts_match_bruteforce(spark):
    # hub 0 connected to all; ring among leaves => triangles only where
    # consecutive leaves share a ring edge. Brute-force check.
    import itertools
    n = 9
    edges = [(0, i) for i in range(1, n)] + \
        [(i, i % (n - 1) + 1) for i in range(1, n)]
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    want = {v: 0 for v in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] += 1
    assert _tri(spark, edges) == want


# -------------------------------------------------------- anchor rollup


def test_anchor_rollup_counts_and_tie_order(spark):
    links = spark.createDataFrame(
        [(1, 10, "Best Coffee"), (2, 10, "coffee beans"),
         (3, 10, "best beans"), (1, 20, "solo page"),
         (1, 10, "coffee  shop")],   # double space -> no empty term
        "src long, dst long, anchor string")
    got = {r.dst: r for r in graph.anchor_rollup(links, k=2).collect()}
    r10 = got[10]
    assert (r10.n_inlinks, r10.n_srcs) == (4, 3)
    # counts: coffee=3, best=2, beans=2 -> top-2 = coffee, beans (tie
    # between best/beans breaks on term asc)
    assert r10.top_terms == "coffee beans"
    assert (got[20].n_inlinks, got[20].n_srcs,
            got[20].top_terms) == (1, 1, "page solo")


def test_optimal_segment_beats_greedy_and_handles_edges(spark):
    """DP optimality on the classic greedy trap: with vocab {ab, bc}
    over 'aabc', greedy longest-match from the left gives a|ab|c = 3
    pieces via 'ab', but a|a|bc is also 3 - construct a real trap:
    vocab {ab, abc}: 'xabc' -> x|abc = 2 while greedy 'ab' first gives
    x|ab|c = 3. Also: empty text, text with no vocab hits."""
    from eventrelationextractor_spark.ops import bpe

    vocab = spark.createDataFrame([("ab",), ("abcd",)], "gram string")
    docs = spark.createDataFrame(
        [(1, "xabcd"),      # greedy: x|ab|c|d = 4; optimal: x|abcd = 2
         (2, ""),           # empty
         (3, "zzz"),        # no vocab hits -> 3 singles
         (4, "abab")],      # ab|ab = 2
        "doc_id long, text string")
    out = {r.doc_id: r for r in bpe.optimal_segment(
        docs, vocab, max_len=4).collect()}
    assert out[1].n_pieces == 2 and out[1].n_chars == 5
    assert out[1].fertility_x1000 == 2 * 1000 // 5
    assert out[2].n_pieces == 0 and out[2].fertility_x1000 == 0
    assert out[3].n_pieces == 3
    assert out[4].n_pieces == 2


def test_gram_vocab_topk_deterministic(spark):
    from eventrelationextractor_spark.ops import bpe

    docs = spark.createDataFrame(
        [(1, "ababab"), (2, "abxy")], "doc_id long, text string")
    got = [(r.gram, r.n) for r in bpe.gram_vocab(
        docs, min_len=2, max_len=2, k=3).collect()]
    # counts: ab=4 (3 + 1), ba=2, bx=1, xy=1 -> tie at 1 broken by gram
    assert got == [("ab", 4), ("ba", 2), ("bx", 1)]


def test_modularity_integer_formulation(spark):
    """Two triangles joined by one bridge, communities = the triangles:
    m=7, within edges 3+3, degrees (2,2,3)x2 -> d_tot=7 each;
    q_num = 4*7*3 - 49 = 35 per community; Q = 70/196 ~ 0.357."""
    from eventrelationextractor_spark.ops import graph as g

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long")
    labels = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")],
        "node string, label string")
    out = {r.label: r for r in g.modularity(edges, labels).collect()}
    for lbl in ("a", "b"):
        assert out[lbl].e_in == 3 and out[lbl].d_tot == 7
        assert out[lbl].m == 7 and out[lbl].q_num == 35
    # everything in ONE community: Q must be exactly 0 (e_in=m, d=2m)
    one = spark.createDataFrame([(i, "x") for i in range(1, 7)],
                                "node string, label string")
    row = g.modularity(edges, one).collect()[0]
    assert row.q_num == 0


def test_apportion_counts_exact_budget(spark):
    from eventrelationextractor_spark.ops import mixing

    df = spark.createDataFrame(
        [("web", 5), ("wiki", 3), ("code", 3)], "s string, w long")
    out = {r.stratum: r for r in mixing.apportion_counts(
        df, "s", "w", total=10).collect()}
    # quotas: web 50/11=4 r6, wiki 30/11=2 r8, code 30/11=2 r8
    # leftover 2 -> largest remainders (code, wiki tie broken asc)
    assert sum(r.alloc for r in out.values()) == 10
    assert out["web"].alloc == 4
    assert out["wiki"].alloc == 3 and out["code"].alloc == 3
    # degenerate: total smaller than strata count still sums exactly
    out2 = mixing.apportion_counts(df, "s", "w", total=2).collect()
    assert sum(r.alloc for r in out2) == 2
    import pytest as _pt
    with _pt.raises(ValueError):
        mixing.apportion_counts(df, "s", "w", total=-1)


def test_seeded_label_propagation_clamp_ties_and_isolates(spark):
    from eventrelationextractor_spark.ops import graph
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)],
                                  "node long")
    seeds = spark.createDataFrame([(1, "b"), (3, "a")],
                                  "node long, label string")
    out = {r.node: (r.label, r.is_seed)
           for r in graph.seeded_label_propagation(
               edges, seeds, n_iter=2, nodes=nodes).collect()}
    assert out[1] == ("b", True) and out[3] == ("a", True)  # clamped
    assert out[2] == ("a", False)   # tie b/a -> min label wins
    assert out[4] == (None, False)  # isolated: never labeled


def test_seeded_label_propagation_multi_hop(spark):
    from eventrelationextractor_spark.ops import graph
    # chain 1-2-3-4, single seed at 1: label reaches 4 in 3 rounds
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "src long, dst long")
    seeds = spark.createDataFrame([(1, "x")], "node long, label string")
    got3 = {r.node: r.label for r in graph.seeded_label_propagation(
        edges, seeds, n_iter=3).collect()}
    assert got3 == {1: "x", 2: "x", 3: "x", 4: "x"}
    got1 = {r.node: r.label for r in graph.seeded_label_propagation(
        edges, seeds, n_iter=1).collect()}
    assert got1 == {1: "x", 2: "x", 3: None, 4: None}


# -------------------------------------------------------------- k-truss


def _truss(spark, edges, k, rounds=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {(r.a, r.b): (r.support, r.dropped_round)
            for r in graph.ktruss_peel(e, k=k, rounds=rounds).collect()}


def test_ktruss_clique_survives(spark):
    # K5: every edge closes 3 triangles -> the whole clique is a
    # 5-truss; nothing drops, support stays 3
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    got = _truss(spark, k5, k=5)
    assert len(got) == 10
    assert all(v == (3, 0) for v in got.values())


def test_ktruss_cascade_diamond(spark):
    # diamond: triangles (0,1,2) and (0,2,3) share edge 0-2. At k=4 the
    # four outer edges (support 1) drop in round 1, which starves 0-2
    # (support falls 2 -> 0): it drops in round 2. Pure cascade.
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _truss(spark, edges, k=4)
    assert got[(0, 2)] == (0, 2)
    for e in [(0, 1), (1, 2), (2, 3), (0, 3)]:
        assert got[e] == (1, 1)


def test_ktruss_ignores_direction_duplicates_selfloops(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 0)]
    got = _truss(spark, edges, k=3)   # k=3: support >= 1 survives
    assert got == {(0, 1): (1, 0), (1, 2): (1, 0), (0, 2): (1, 0)}


def test_ktruss_matches_python_peel(spark):
    # hub-plus-ring graph vs a reference synchronous peel
    n = 10
    edges = [(0, i) for i in range(1, n)] + \
        [(i, i % (n - 1) + 1) for i in range(1, n)] + \
        [(1, 3), (3, 5), (5, 7)]
    k, rounds = 4, 3
    live = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    want = {}
    supp = {}
    for r in range(1, rounds + 1):
        adj = {}
        for a, b in live:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        supp = {(a, b): len(adj[a] & adj[b]) for a, b in live}
        weak = {e for e in live if supp[e] < k - 2}
        for e in weak:
            want[e] = (supp[e], r)
        live -= weak
    for e in live:
        want[e] = (supp[e], 0)
    assert _truss(spark, edges, k=k, rounds=rounds) == want


# ---------------------------------------- jaccard links / assortativity


def test_jaccard_links_analytic_square(spark):
    # square 0-1-2-3-0: opposite corners share BOTH neighbors
    # (|cap|=2, |cup|=2+2-2=2 -> jaccard 1.0) and are non-edges;
    # adjacent corners share none so no row is emitted for them
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b): r for r in graph.jaccard_links(e).collect()}
    assert set(got) == {(0, 2), (1, 3)}
    r = got[(0, 2)]
    assert (r.n_common, r.deg_a, r.deg_b) == (2, 2, 2)
    assert r.jaccard_ppm == 1_000_000 and r.is_edge is False


def test_jaccard_links_flags_existing_edges(spark):
    # triangle + pendant: pair (0,1) IS an edge and shares neighbor 2
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b): r for r in graph.jaccard_links(e).collect()}
    r = got[(0, 1)]
    # N(0)={1,2}, N(1)={0,2}: common {2}, union size 2+2-1=3
    assert r.is_edge is True and r.n_common == 1
    assert r.jaccard_ppm == 1_000_000 // 3
    # 3's only co-neighbor pairs come through hub-eligible node 2
    assert (0, 3) in got and got[(0, 3)].deg_b == 1


def test_jaccard_links_hub_cap_drops_pairs(spark):
    # star: all pairs share only the hub; capping below the hub degree
    # removes every candidate
    edges = [(9, i) for i in range(5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert graph.jaccard_links(e, max_degree=4).count() == 0
    assert graph.jaccard_links(e, max_degree=5).count() == 10


def test_assortativity_star_is_negative_one(spark):
    # star graph: endpoint degrees are perfectly anti-correlated
    e = spark.createDataFrame([(0, i) for i in range(1, 5)],
                              "src long, dst long")
    r = graph.degree_assortativity(e).collect()[0]
    assert r.m2 == 8 and r.r == -1.0


def test_assortativity_regular_graph_is_null(spark):
    # cycle: every degree is 2 -> zero variance -> NULL, not a crash
    e = spark.createDataFrame([(i, (i + 1) % 5) for i in range(5)],
                              "src long, dst long")
    r = graph.degree_assortativity(e).collect()[0]
    assert r.r is None


def test_assortativity_matches_numpy(spark):
    import math
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6),
             (6, 3), (2, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    r = graph.degree_assortativity(e).collect()[0]
    sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, b in sym]
    ys = [deg[b] for a, b in sym]
    m = len(sym)
    num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt((m * sum(x * x for x in xs) - sum(xs) ** 2)
                    * (m * sum(y * y for y in ys) - sum(ys) ** 2))
    assert r.r == round(num / den, 6)


# ------------------------------------------------------------- hyperball


def _py_hyperball(edges, rounds, m_b=4):
    """Bit-exact python replay of the register propagation."""
    import hashlib
    m, width = 1 << m_b, 60 - m_b
    sym = {(a, b) for a, b in edges if a != b}
    sym |= {(b, a) for a, b in sym}
    nodes = {a for a, _ in sym}
    regs = {}
    for v in nodes:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        rest = h >> m_b
        rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
        regs[v] = {h % m: rho}
    for _ in range(rounds):
        nxt = {v: dict(r) for v, r in regs.items()}
        for s, d in sym:
            for b, r in regs[s].items():
                if nxt[d].get(b, 0) < r:
                    nxt[d][b] = r
        regs = nxt
    return regs


def test_hyperball_registers_match_python_replay(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (5, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.register_checksum
           for r in graph.hyperball(e, rounds=2).collect()}
    want = {v: sum(r.values())
            for v, r in _py_hyperball(edges, rounds=2).items()}
    assert got == want


def test_hyperball_ball_grows_with_rounds(spark):
    # path graph: node 0's ball doubles as rounds increase, and the
    # checksum (sketch state) is monotone under union
    edges = [(i, i + 1) for i in range(9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    sums = []
    for r in (1, 2, 4):
        rows = {x.node: x for x in graph.hyperball(e, rounds=r).collect()}
        sums.append(sum(x.register_checksum for x in rows.values()))
    assert sums[0] <= sums[1] <= sums[2]


def test_hyperball_clique_saturates(spark):
    # diameter-1 graph: one round reaches everything; more rounds
    # change nothing (sketch fixpoint)
    k = [(a, b) for a in range(6) for b in range(6) if a < b]
    e = spark.createDataFrame(k, "src long, dst long")
    one = {(r.node, r.register_checksum, r.est_ball)
           for r in graph.hyperball(e, rounds=1).collect()}
    three = {(r.node, r.register_checksum, r.est_ball)
             for r in graph.hyperball(e, rounds=3).collect()}
    assert one == three
    # all six sketches merged the same 6-element set -> identical
    assert len({c for _, c, _ in one}) == 1


def test_bounded_rings_directed_semantics(spark):
    from eventrelationextractor_spark.ops.graph import bounded_rings
    # triangle 1->2->3->1 (ring), 2-cycle 10<->11 (ring), chain 20->21
    # (no ring), and 30->1 feeding the triangle (path in, no way back)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (20, 21), (30, 1)],
        "src long, dst long")
    got = {r.node: (r.ring_id, r.ring_size)
           for r in bounded_rings(edges, k=3).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3),
                   10: (10, 2), 11: (10, 2)}


def test_bounded_rings_hop_cap_is_the_contract(spark):
    from eventrelationextractor_spark.ops.graph import bounded_rings
    # 4-cycle: opposite corners need 2 hops each way, adjacent nodes
    # need 1 + 3. k=3 sees the whole ring; k=2 sees only the diagonals.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    full = bounded_rings(edges, k=3).collect()
    assert {r.node for r in full} == {1, 2, 3, 4}
    assert all(r.ring_size == 4 for r in full)
    half = bounded_rings(edges, k=2).collect()
    assert {(r.node, r.ring_size) for r in half} == {
        (1, 2), (3, 2), (2, 2), (4, 2)}
    assert {r.node: r.ring_id for r in half} == {1: 1, 3: 1, 2: 2, 4: 2}
