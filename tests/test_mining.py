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
