"""ops/linkage.py - Fellegi-Sunter blocked record linkage."""

from eventrelationextractor_spark.ops import linkage

COMPS = [("surname", "lev1", 240, -180),
         ("first_name", "exact", 180, -120),
         ("zipc", "exact", 300, -150)]


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "smith", "beth", 10010),
         (2, "taylor", "carl", 10020),
         (3, "young", "lena", 10030)],
        "rec_id long, surname string, first_name string, zipc long")
    right = spark.createDataFrame(
        [(11, "smith", "beth", 10010),    # exact duplicate of 1
         (12, "teylor", "carl", 10021),   # typo + zip drift vs 2
         (13, "yonder", "lena", 10030)],  # lev(young,yonder)=3 vs 3
        "rec_id long, surname string, first_name string, zipc long")
    blocked = lambda df: df.selectExpr(  # noqa: E731
        "*", "zipc div 10 AS zb", "substr(surname,1,1) AS sb")
    return blocked(left), blocked(right)


def test_link_records_decisions(spark):
    left, right = _frames(spark)
    out = linkage.link_records(left, right, ["zb", "sb"], COMPS,
                               match_threshold=500, possible_threshold=0)
    rows = {(r.left_id, r.right_id): r for r in out.collect()}
    # exact duplicate: all agree, 240+180+300 = 720 -> match
    assert rows[(1, 11)].score == 720
    assert rows[(1, 11)].decision == "match"
    # typo within the lev-1 band + zip off-by-one (same block):
    # 240+180-150 = 270 -> possible
    assert rows[(2, 12)].score == 270
    assert rows[(2, 12)].decision == "possible"
    assert rows[(2, 12)].surname_agree and not rows[(2, 12)].zipc_agree


def test_lev1_band_sentinel_is_disagreement(spark):
    # Spark's thresholded levenshtein returns -1 past the band; a naive
    # `<= 1` would read that as agreement. lev(young, yonder) = 3.
    left, right = _frames(spark)
    out = linkage.link_records(left, right, ["zb", "sb"], COMPS)
    r = {(x.left_id, x.right_id): x for x in out.collect()}[(3, 13)]
    assert not r.surname_agree
    assert r.score == -180 + 180 + 300  # 300 -> possible, not match
    assert r.decision == "possible"


def test_blocking_prunes_cross_block_pairs(spark):
    left, right = _frames(spark)
    out = linkage.link_records(left, right, ["zb", "sb"], COMPS)
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert got == {(1, 11), (2, 12), (3, 13)}  # no cross-block pairs
