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


ADVERSARIAL_TEXTS = [
    (0, ""),                               # empty
    (1, "   "),                            # whitespace-only
    (2, "a b\n"),                          # trailing newline
    (3, "\ta  b\tc"),                      # tabs + double space
    (4, "a\x0bb"),                         # vertical tab (\v in both regexes)
    (5, "a\u00a0b"),                  # NBSP: NOT \s in Java or RE2
    (6, "word"),                           # single token
    (7, "  leading and trailing  "),       # trim interaction
    (8, "a\r\nb\fc"),                      # CRLF + form feed
]


def test_token_count_twin_matches_duckdb(spark):
    """The ws-token twin (Spark split vs DuckDB regexp_split_to_array,
    both on the hex-escaped WS_PATTERN) must agree on adversarial
    whitespace - the cross-engine hash gate rides this twin. A bare
    '\\s+' twin is asserted to DIVERGE on \\x0b (Java \\s includes
    vertical tab, RE2 \\s does not), which is why WS_PATTERN exists."""
    import duckdb

    from eventrelationextractor_spark.ops.textstats import WS_PATTERN

    got = {r.doc_id: r.n for r in
           _docs(spark, ADVERSARIAL_TEXTS)
           .select("doc_id",
                   F.size(F.split(F.trim("text"), WS_PATTERN))
                   .cast("long").alias("n"))
           .collect()}
    con = duckdb.connect()
    for doc_id, text in ADVERSARIAL_TEXTS:
        (exp,) = con.execute(
            "SELECT CAST(len(regexp_split_to_array(trim(?), ?))"
            " AS BIGINT)", [text, WS_PATTERN]).fetchone()
        assert got[doc_id] == exp, (doc_id, text, got[doc_id], exp)

    # document the engine divergence that motivated the explicit class
    (rawdb,) = con.execute(
        r"SELECT len(regexp_split_to_array('a' || chr(11) || 'b', '\s+'))"
    ).fetchone()
    rawspark = _docs(spark, [(0, "a\x0bb")]).select(
        F.size(F.split("text", r"\s+")).alias("n")).collect()[0].n
    assert (rawspark, rawdb) == (2, 1)


def test_pack_sequences_config_insensitive(spark):
    """Layout must be identical under ANSI on/off, any session timezone,
    and any shuffle-partition count - the integer-div arithmetic leaves
    nothing for these knobs to act on (driver-session divergence sweep)."""
    rows = [(i, "w " * (i % 23 + 1) + "\n") for i in range(400)]
    base = sorted(map(tuple, packing.pack_sequences(
        _docs(spark, rows), seq_len=16, group_size=64).collect()))
    sweeps = [("spark.sql.ansi.enabled", "true"),
              ("spark.sql.ansi.enabled", "false"),
              ("spark.sql.session.timeZone", "Pacific/Kiritimati"),
              ("spark.sql.shuffle.partitions", "1"),
              ("spark.sql.shuffle.partitions", "17")]
    for key, val in sweeps:
        old = spark.conf.get(key, None)
        spark.conf.set(key, val)
        try:
            got = sorted(map(tuple, packing.pack_sequences(
                _docs(spark, rows), seq_len=16, group_size=64).collect()))
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        assert got == base, (key, val)


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
