"""ops/packing.py (sequence layout) and ops/bm25.py::top_terms
(vocabulary head): semantics + the scale-shape claims."""

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import bm25, packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_layout(spark):
    # 3 docs in one group: 4+1, 3+1, 2+1 tokens -> offsets 0, 5, 9
    rows = [(0, "a b c d"), (1, "x y z"), (2, "p q")]
    out = {r.doc_id: r for r in
           packing.pack_sequences(_docs(spark, rows), seq_len=6,
                                  group_size=128).collect()}
    assert (out[0].start_offset, out[0].n_tokens) == (0, 5)
    assert (out[1].start_offset, out[1].seq_first, out[1].seq_last) \
        == (5, 0, 1)                        # straddles the 6-token border
    assert (out[2].start_offset, out[2].seq_first) == (9, 1)


def test_pack_sequences_groups_restart_stream(spark):
    rows = [(0, "a b"), (1, "c d"), (128, "e f")]   # group_size=128
    out = {r.doc_id: r for r in
           packing.pack_sequences(_docs(spark, rows),
                                  group_size=128).collect()}
    assert out[0].grp == 0 and out[128].grp == 1
    assert out[128].start_offset == 0       # new group, fresh stream


def test_pack_sequences_append_stable(spark):
    """Adding later docs never moves earlier docs' layout."""
    base = [(i, "w " * (i % 7 + 1)) for i in range(10)]
    grown = base + [(i, "new doc text") for i in range(10, 300)]
    a = {r.doc_id: (r.grp, r.start_offset, r.seq_first) for r in
         packing.pack_sequences(_docs(spark, base)).collect()}
    b = {r.doc_id: (r.grp, r.start_offset, r.seq_first) for r in
         packing.pack_sequences(_docs(spark, grown)).collect()}
    assert all(b[i] == a[i] for i in a)


def test_pack_sequences_no_global_sort(spark):
    """The window is partitioned by group - the plan must hash-partition
    on grp, never range-partition globally (single-partition funnel)."""
    df = packing.pack_sequences(_docs(spark, [(0, "a"), (1, "b")]))
    plan = df._jdf.queryExecution().toString().split(
        "== Physical Plan ==")[-1]
    assert "hashpartitioning(grp" in plan
    assert "rangepartitioning" not in plan


def test_top_terms_ranks_and_ties(spark):
    rows = [(0, "b b a a c"), (1, "a b")]
    got = [(r.rank, r.term, r.n) for r in
           bm25.top_terms(_docs(spark, rows), k=2).collect()]
    # a and b both appear 3x -> tie breaks alphabetically
    assert got == [(1, "a", 3), (2, "b", 3)]


def test_top_terms_uses_distributed_topk(spark):
    df = bm25.top_terms(_docs(spark, [(0, "a b"), (1, "b c")]), k=5)
    plan = df._jdf.queryExecution().toString().split(
        "== Physical Plan ==")[-1]
    assert "TakeOrderedAndProject" in plan
