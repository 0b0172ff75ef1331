"""Analytic tests for ops/mining.py::contrastive_pairs."""

from eventrelationextractor_spark.ops import mining


def test_contrastive_pairs_analytic(spark):
    """Anchor 0: doc 2 is its embedding twin (positive); doc 3 shares
    its exact wording (lexical overlap) but points the other way in
    embedding space (semantically distant -> the hard negative); doc 4
    is lexically unrelated. Anchor 1 shares no shingle with anyone
    below the threshold -> NULL negative."""
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "completely different words entirely unrelated topic here"),
         (2, "some other phrasing with no overlap at all whatsoever"),
         (3, "the quick brown fox jumps over the lazy dog again"),
         (4, "zzz yyy xxx www vvv uuu ttt sss rrr")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.99, 0.1]),
         (3, [-1.0, 0.0]), (4, [0.7, 0.7])],
        "vec_id long, embedding array<double>")
    out = {r.anchor_id: r for r in mining.contrastive_pairs(
        docs, emb, n_anchors=2, shingle_k=3, sem_threshold=0.5).collect()}
    assert out[0].positive_id == 2           # cosine twin
    assert out[0].negative_id == 3           # shares 7 shingles, cos=-1
    assert out[0].n_shared == 7
    assert out[0].neg_cosine == -1.0
    assert out[1].positive_id == 4           # 45-degree vector is closest
    assert out[1].negative_id is None        # no lexical overlap anywhere
    assert out[1].n_shared is None


def test_frequent_pairs_analytic(spark):
    # b1:{x,y,z} b2:{x,y} b3:{x,y} b4:{z}; x appears twice in b2 (dedup)
    rows = [("b1", "x"), ("b1", "y"), ("b1", "z"), ("b2", "x"),
            ("b2", "x"), ("b2", "y"), ("b3", "x"), ("b3", "y"),
            ("b4", "z"), ("b4", None)]
    df = spark.createDataFrame(rows, "basket string, item string")
    out = mining.frequent_pairs(df, "basket", "item",
                                min_support=2).collect()
    assert len(out) == 1                      # (x,z),(y,z) have n_ab=1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_ab, r.n_a, r.n_b) == ("x", "y", 3, 3, 3)
    assert r.support_ppm == 3_000_000 // 4    # 3 of 4 baskets
    assert r.confidence_ppm == 1_000_000      # y always rides with x
    assert r.lift_ppm == (1_000_000 * 3 * 4) // 9


def test_frequent_pairs_prunes_infrequent_before_join(spark):
    # 'rare' appears once: downward closure removes it pre-join, so no
    # pair row mentions it even in the basket where it co-occurs
    rows = [("b%d" % i, it) for i in range(3) for it in ("a", "b")]
    rows.append(("b0", "rare"))
    df = spark.createDataFrame(rows, "basket string, item string")
    out = mining.frequent_pairs(df, "basket", "item", min_support=2)
    got = [(r.item_a, r.item_b) for r in out.collect()]
    assert got == [("a", "b")]


def test_als_rank1_matches_python_replay(spark):
    rows = [("u1", "a", 10), ("u1", "b", 2), ("u2", "a", 8),
            ("u2", "b", 1), ("u3", "b", 5), ("u3", "c", 7)]
    df = spark.createDataFrame(rows, "u string, it string, r long")
    got = {(x.u, x.it): x for x in
           mining.als_rank1(df, "u", "it", "r", n_iter=3).collect()}

    v = {it: 1000 for it in ("a", "b", "c")}
    u = {}
    for _ in range(3):
        for uu in ("u1", "u2", "u3"):
            mine = [(it, r) for us, it, r in rows if us == uu]
            num = sum(r * v[it] for it, r in mine)
            den = sum(v[it] ** 2 for it, _ in mine)
            u[uu] = (1_000_000 * num) // den
        nv = {}
        for it in v:
            mine = [(us, r) for us, i2, r in rows if i2 == it]
            num = sum(r * u[us] for us, r in mine)
            den = sum(u[us] ** 2 for us, _ in mine)
            nv[it] = (1_000_000 * num) // den
        v = nv
    for us, it, r in rows:
        g = got[(us, it)]
        assert (g.u_q, g.v_q) == (u[us], v[it]), (us, it)
        assert g.pred_milli == (u[us] * v[it]) // 1000


def test_als_rank1_reconstructs_rank1_matrix(spark):
    # exactly rank-1 ratings r = a_i * b_j: predictions recover r to
    # within the fixed-point quantization
    a = {"u1": 2, "u2": 6, "u3": 3}
    b = {"x": 4, "y": 1, "z": 9}
    rows = [(uu, it, a[uu] * b[it]) for uu in a for it in b]
    df = spark.createDataFrame(rows, "u string, it string, r long")
    out = mining.als_rank1(df, "u", "it", "r", n_iter=4).collect()
    for row in out:
        assert abs(row.pred_milli / 1000.0 - row.r) <= max(
            0.01 * row.r, 0.05), (row.u, row.it)


# ------------------------------------------------------- pareto front


def _front(spark, rows, groups=None):
    df = spark.createDataFrame(rows, "id long, g string, x long, y long")
    got = mining.pareto_front(df, "x", "y", groups or []).collect()
    return sorted((r.id) for r in got)


def test_pareto_basic_dominance(spark):
    rows = [(0, "a", 1, 9), (1, "a", 5, 5), (2, "a", 9, 1),
            (3, "a", 4, 4), (4, "a", 5, 4), (5, "a", 1, 8)]
    # (4,4),(5,4),(1,8) dominated; staircase 0,1,2 survives
    assert _front(spark, rows) == [0, 1, 2]


def test_pareto_duplicate_points_both_survive(spark):
    rows = [(0, "a", 3, 3), (1, "a", 3, 3), (2, "a", 1, 1)]
    assert _front(spark, rows) == [0, 1]


def test_pareto_same_x_champion_only(spark):
    rows = [(0, "a", 3, 7), (1, "a", 3, 5), (2, "a", 2, 9)]
    assert _front(spark, rows) == [0, 2]


def test_pareto_groups_independent(spark):
    rows = [(0, "a", 1, 1), (1, "b", 9, 9), (2, "a", 2, 2)]
    assert _front(spark, rows, ["g"]) == [1, 2]


def test_pareto_single_row_and_collinear(spark):
    assert _front(spark, [(0, "a", 5, 5)]) == [0]
    # strictly increasing on both axes -> only the max survives
    rows = [(i, "a", i, i) for i in range(5)]
    assert _front(spark, rows) == [4]


def test_rake_keyphrases_hand_case(spark):
    from eventrelationextractor_spark.ops.mining import rake_keyphrases
    df = spark.createDataFrame(
        [(1, "deep learning of deep deep models the fast track")],
        "doc_id long, text string")
    got = [(r.phrase, r.score_micro, r.rank)
           for r in rake_keyphrases(df).orderBy("rank").collect()]
    # freq(deep)=3, degree(deep)=2+3+3=8 -> 2666666; models 3/1; rest 2/1
    assert got == [("deep deep models", 2666666 * 2 + 3000000, 1),
                   ("deep learning", 2666666 + 2000000, 2),
                   ("fast track", 4000000, 3)]


def test_rake_duplicate_phrase_instances_collapse(spark):
    from eventrelationextractor_spark.ops.mining import rake_keyphrases
    df = spark.createDataFrame(
        [(1, "fast track the fast track the slow lane")],
        "doc_id long, text string")
    rows = rake_keyphrases(df, k=10).collect()
    phrases = [r.phrase for r in rows]
    assert phrases.count("fast track") == 1
    assert len(rows) == 2


def test_frequent_triples_downward_closure_semantics(spark):
    # baskets: {a,b,c} x3, {a,b} x1, {a,c,d} x1 -> only (a,b,c) with
    # n_abc=3 survives min_support=2; d is infrequent as an item-with-
    # pairs and prunes out before the triple join
    rows = []
    for i in range(3):
        rows += [(f"b{i}", "a"), (f"b{i}", "b"), (f"b{i}", "c")]
    rows += [("b3", "a"), ("b3", "b")]
    rows += [("b4", "a"), ("b4", "c"), ("b4", "d")]
    df = spark.createDataFrame(rows, "basket string, item string")
    out = mining.frequent_triples(df, "basket", "item",
                                  min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.item_c, r.n_abc) == ("a", "b", "c", 3)
    assert r.support_ppm == 600000      # 3 of 5 baskets
    # duplicate (basket, item) rows dedupe before counting
    dup = spark.createDataFrame(rows + rows, "basket string, item string")
    out2 = mining.frequent_triples(dup, "basket", "item",
                                   min_support=2).collect()
    assert [tuple(r) for r in out2] == [tuple(x) for x in out]
