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
