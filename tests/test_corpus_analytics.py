"""Round-3 late additions: substring-level dup telemetry
(ngram_dup_stats), PMI collocations, exact/approx percentile telemetry,
and the bucketed interval join. Semantics on hand-built corpora plus
physical-plan assertions for the scale-critical shapes."""

import datetime

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import dedup, events, textstats


def _physical(df) -> str:
    return df._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]


# ------------------------------------------------------- ngram_dup_stats


def test_ngram_dup_stats_semantics(spark):
    """Doc 1 and 2 share a verbatim 6-word passage (two 5-grams); doc 3
    is disjoint; doc 4 is too short to emit any 5-gram."""
    shared = "alpha bravo charlie delta echo foxtrot"
    docs = spark.createDataFrame(
        [(1, shared + " golf hotel india"),
         (2, "prefix words here " + shared),
         (3, "one two three four five six seven"),
         (4, "too short")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in dedup.ngram_dup_stats(docs, n=5).collect()}
    assert set(rows) == {1, 2, 3}          # doc 4 emits no 5-gram
    # doc 1: 9 words -> 5 grams, of which 2 (the shared passage) are dup
    assert rows[1].n_ngrams == 5 and rows[1].n_dup_ngrams == 2
    assert rows[2].n_dup_ngrams == 2
    assert rows[3].n_dup_ngrams == 0 and rows[3].dup_fraction == 0.0
    assert rows[1].dup_fraction == 0.4


def test_ngram_dup_stats_repeated_gram_within_doc_counts_once(spark):
    """A 5-gram repeated WITHIN one doc (and absent elsewhere) is not a
    cross-document duplicate: array_distinct collapses it before the
    document-frequency count."""
    rep = "alpha bravo charlie delta echo"
    docs = spark.createDataFrame(
        [(1, rep + " filler " + rep),
         (2, "zeta eta theta iota kappa lambda")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in dedup.ngram_dup_stats(docs, n=5).collect()}
    assert rows[1].n_dup_ngrams == 0


def test_ngram_dup_stats_no_window_exec(spark):
    """The df-count must be a partial-agged groupBy + join (AQE can
    split a hot ngram's probe partition), NOT a count-over-window that
    pins each hot key to one task."""
    docs = spark.createDataFrame([(1, "a b c d e f")],
                                 "doc_id long, text string")
    plan = _physical(dedup.ngram_dup_stats(docs))
    assert "Window" not in plan
    assert "HashAggregate" in plan
    # dfreq is vocabulary-scale: the join must be pinned sort-merge -
    # AQE's post-agg size estimate would otherwise pick a broadcast that
    # OOMs the driver at sf1.0 and cannot work at corpus scale
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


# ------------------------------------------------------ pmi_collocations


def test_pmi_collocations_ranks_bound_pair_first(spark):
    """'san francisco' always co-occurs (c_xy == c_x == c_y) while the
    filler words pair freely, so it must rank top by PMI."""
    doc = ("san francisco is the city . " * 5) + ("the city is big . " * 20)
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    top = textstats.pmi_collocations(docs, min_count=5, k=3).collect()
    assert (top[0].w1, top[0].w2) == ("san", "francisco")
    assert top[0].c_xy == top[0].c_x == top[0].c_y == 5
    # pmi = ln((5/B) / ((5/N)^2)) with N, B corpus totals — positive
    assert top[0].pmi > 0


def test_pmi_min_count_drops_rare_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "rare pair only once . common words common words " * 1)],
        "doc_id long, text string")
    got = textstats.pmi_collocations(docs, min_count=2, k=10).collect()
    assert ("rare", "pair") not in {(r.w1, r.w2) for r in got}


# ---------------------------------------------------- length_percentiles


def test_length_percentiles_exact_interpolation(spark):
    """quantile-cont semantics: p50 of [10, 20, 30, 40] = 25.0 (linear
    interpolation at (n-1)*p), p25 = 17.5."""
    docs = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate([10, 20, 30, 40])],
        "doc_id long, lang string, n_chars long")
    row = textstats.length_percentiles(docs).collect()[0]
    assert row.n_docs == 4 and row.mean_val == 25.0
    assert row.p25 == 17.5 and row.p50 == 25.0
    assert row.p99 == pytest.approx(39.7, abs=1e-9)


def test_length_percentiles_approx_branch_same_schema(spark):
    docs = spark.createDataFrame(
        [(i, "en", i * 10) for i in range(100)],
        "doc_id long, lang string, n_chars long")
    exact = textstats.length_percentiles(docs)
    approx = textstats.length_percentiles(docs, approx=True)
    assert exact.columns == approx.columns
    # GK with accuracy 10000 on 100 values is exact at the sample points
    e, a = exact.collect()[0], approx.collect()[0]
    assert abs(e.p50 - a.p50) <= 10.0


# -------------------------------------------------- interval_join_bucketed


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def test_interval_join_semantics(spark):
    """Inclusive start, exclusive end, key-scoped; intervals spanning
    multiple buckets still match exactly once per (point, interval)."""
    points = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(29), 101), (1, _ts(30), 102),
         (2, _ts(5), 200)],
        "user_id long, ts timestamp, event_id long")
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(30), 900)],
        "user_id long, start timestamp, end timestamp, interval_id long")
    got = events.interval_join_bucketed(points, intervals,
                                        bucket_minutes=10)
    ids = sorted(r.event_id for r in got.collect())
    assert ids == [100, 101]   # 102 excluded (ts == end), 200 wrong key
    # no duplicate rows despite the interval covering 4 buckets (0..3)
    assert got.count() == 2


def test_interval_join_is_equi_join(spark):
    """The plan must be a hash/sort-merge EQUI-join on (key, bucket) -
    never a BroadcastNestedLoopJoin, which is what a naive inequality
    join degenerates to."""
    points = spark.createDataFrame(
        [(1, _ts(0), 100)], "user_id long, ts timestamp, event_id long")
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(30), 900)],
        "user_id long, start timestamp, end timestamp, interval_id long")
    plan = _physical(events.interval_join_bucketed(points, intervals))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_bucket" in plan       # equi-key includes the derived bucket


# --------------------------------------------------------------- semdedup


def test_semdedup_prunes_near_copy_keeps_earliest(spark):
    """Two well-separated directions, each with a near-copy: the
    higher-id copy is pruned, the original kept; cross-direction
    cosines (~0) never prune. k=2 with init ids {0,1} = the two
    directions."""
    from eventrelationextractor_spark.ops import cluster
    e1 = [1.0] + [0.0] * 63
    e1c = [0.999] + [0.001] * 63           # cosine ~1 with e1
    e2 = [0.0] * 63 + [1.0]
    e2c = [0.001] * 63 + [0.999]
    emb = spark.createDataFrame(
        [(0, e1), (1, e2), (2, e1c), (3, e2c)],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in
            cluster.semdedup(emb, k=2, n_iter=1, threshold=0.9).collect()}
    assert rows[0].is_kept and rows[1].is_kept
    assert not rows[2].is_kept and not rows[3].is_kept
    assert rows[2].max_sim_lower > 0.9
    # cluster-locality: the two directions land in different clusters
    assert rows[0].cluster != rows[1].cluster
    assert rows[0].cluster == rows[2].cluster


def test_semdedup_prune_is_pairwise_not_transitive(spark):
    """a~b and b~c with a!~c: keep-earliest prunes b (lower match a)
    and c iff c matches a LOWER-id vector directly - c matches b, so c
    is pruned too, but via the b pair, not closure. A vector similar
    only to HIGHER ids stays kept."""
    from eventrelationextractor_spark.ops import cluster
    import math
    def unit(theta):
        v = [0.0] * 64
        v[0], v[1] = math.cos(theta), math.sin(theta)
        return v
    # chain: 0 ~ 1 ~ 2 (adjacent cos ~0.98, ends cos ~0.94)
    emb = spark.createDataFrame(
        [(i, unit(i * 0.2)) for i in range(3)],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in
            cluster.semdedup(emb, k=1, n_iter=1, threshold=0.97).collect()}
    assert rows[0].is_kept
    assert not rows[1].is_kept and not rows[2].is_kept
    assert rows[2].max_sim_lower == pytest.approx(
        round(math.cos(0.2), 6), abs=1e-6)   # via the 1-2 pair, not 0-2


# ------------------------------------------------------------------ dsir


def test_dsir_upweights_target_like_docs(spark):
    """Docs sharing the target subset's bigrams must score higher than
    docs from a disjoint vocabulary."""
    from eventrelationextractor_spark.ops import mixing
    tgt = "the quick brown fox jumps over the lazy dog"
    bg = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [(i, tgt) for i in range(0, 30, 10)]          # targets (0,10,20)
    rows += [(i, tgt) for i in (1, 2, 3)]                # target-like
    rows += [(i, bg) for i in (4, 5, 6, 7, 8, 9)]        # background-only
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in mixing.dsir_weights(
        docs, target=F.col("doc_id") % 10 == 0).collect()}
    tgt_like = [got[i].log_weight for i in (1, 2, 3)]
    bg_only = [got[i].log_weight for i in (4, 5, 6)]
    assert min(tgt_like) > max(bg_only)
    # selection keeps ~keep_frac of the corpus, never everything
    n_sel = sum(1 for r in got.values() if r.selected)
    assert 0 < n_sel < len(got)


def test_dsir_threshold_branches_share_schema(spark):
    from eventrelationextractor_spark.ops import mixing
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)],
        "doc_id long, text string")
    exact = mixing.dsir_weights(docs, target=F.col("doc_id") % 10 == 0)
    approx = mixing.dsir_weights(docs, target=F.col("doc_id") % 10 == 0,
                                 exact_threshold=False)
    assert exact.columns == approx.columns
    # identical corpus text: log_weight identical for every doc
    assert exact.count() == approx.count() == 20


def test_dsir_model_join_is_broadcast(spark):
    """The fixed-size bucket model must re-attach via broadcast - a
    shuffle join on bucket would shuffle the corpus-scale gram stream
    for a <= n_buckets-row dimension."""
    from eventrelationextractor_spark.ops import mixing
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(4)],
        "doc_id long, text string")
    plan = _physical(mixing.dsir_weights(
        docs, target=F.col("doc_id") % 2 == 0))
    assert "BroadcastHashJoin" in plan


# ------------------------------------------- url canonicalization / diff


def test_canonicalize_urls_aliases_collapse(spark):
    from eventrelationextractor_spark.ops import urls
    cases = [
        (1, "HTTPS://News.Example.COM:443/a/p1?utm_source=x&b=2&a=1#frag"),
        (2, "https://news.example.com/a/p1/?a=1&b=2"),
        (3, "https://news.example.com/a/p1?b=2&a=1&fbclid=zz"),
        (4, "https://news.example.com/"),       # root keeps its slash
        (5, "https://news.example.com"),        # empty path -> '/'
        (6, "https://other.example.com/a/p1?a=1&b=2"),  # different host
    ]
    df = spark.createDataFrame(cases, "doc_id long, url string")
    got = {r.doc_id: r.canonical_url
           for r in urls.canonicalize_urls(df).collect()}
    want = "https://news.example.com/a/p1?a=1&b=2"
    assert got[1] == got[2] == got[3] == want
    assert got[4] == got[5] == "https://news.example.com/"
    assert got[6] != want
    kept = {r.doc_id: r.is_kept
            for r in urls.canonical_dedup(df).collect()}
    assert kept[1] and not kept[2] and not kept[3]


def test_snapshot_diff_statuses(spark):
    from eventrelationextractor_spark.ops import dedup
    old = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")],
        "doc_id long, fingerprint string")
    new = spark.createDataFrame(
        [(1, "h1"), (2, "h2x"), (4, "h4")],
        "doc_id long, fingerprint string")
    got = {r.doc_id: r.status
           for r in dedup.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


# ---------------------------------------------------------- doc_chunking


def test_chunk_documents_overlap_and_tail(spark):
    from eventrelationextractor_spark.ops import packing
    text = " ".join(f"w{i}" for i in range(1, 11))          # 10 words
    docs = spark.createDataFrame([(1, text), (2, "single"), (3, "")],
                                 "doc_id long, text string")
    got = {(r.doc_id, r.chunk_id): r for r in packing.chunk_documents(
        docs, chunk_size=4, stride=3).collect()}
    # doc 1: starts 1,4,7 (bound = least(10, 10-4+3)=9); NO start at 10
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert got[(1, 0)].chunk_text == "w1 w2 w3 w4"
    assert got[(1, 1)].chunk_text == "w4 w5 w6 w7"         # overlap of 1
    assert got[(1, 2)].chunk_text == "w7 w8 w9 w10"        # tail complete
    # doc 2 (1 word < chunk_size): exactly one short chunk
    assert got[(2, 0)].chunk_text == "single"
    assert got[(2, 0)].n_chunk_tokens == 1
    assert (2, 1) not in got        # no contained duplicate tail
    # doc 3 (empty): no chunks
    assert not any(k[0] == 3 for k in got)


def test_chunk_documents_gap_sampling_no_empty_chunks(spark):
    """stride > chunk_size (sampling every stride-th window) must never
    emit an empty chunk past the end."""
    from eventrelationextractor_spark.ops import packing
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(1, 7)))],      # 6 words
        "doc_id long, text string")
    rows = packing.chunk_documents(docs, chunk_size=1, stride=4).collect()
    assert [(r.chunk_id, r.chunk_text) for r in
            sorted(rows, key=lambda r: r.chunk_id)] == [(0, "w1"), (1, "w5")]
    assert all(r.n_chunk_tokens >= 1 for r in rows)


def test_chunk_documents_is_shuffle_free(spark):
    from eventrelationextractor_spark.ops import packing
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _physical(packing.chunk_documents(docs))
    assert "Exchange" not in plan


# ------------------------------------------------------------- winnowing


def test_winnowing_guarantee_and_shuffle_free(spark):
    """The winnowing guarantee: any shared substring of length
    >= k + window - 1 must yield at least one shared fingerprint;
    disjoint texts share none. The operator itself is shuffle-free."""
    from eventrelationextractor_spark.ops import dedup
    shared = "the identical copied passage here"
    docs = spark.createDataFrame(
        [(1, "prefix one two " + shared),
         (2, shared + " suffix other words"),
         (3, "completely different content altogether xyz")],
        "doc_id long, text string")
    fps = dedup.winnowing_fingerprints(docs, k=8, window=4)
    bydoc = {}
    for r in fps.collect():
        bydoc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert bydoc[1] & bydoc[2]             # shared passage detected
    assert not (bydoc[1] & bydoc[3])       # disjoint text: no overlap
    plan = _physical(fps)
    assert "Exchange" not in plan


def test_winnowing_short_doc_emits_nothing(spark):
    from eventrelationextractor_spark.ops import dedup
    docs = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    assert dedup.winnowing_fingerprints(docs).count() == 0


# ----------------------------------------------------------- grouped topk


def test_grouped_topk_semantics_and_group_limit(spark):
    docs = spark.createDataFrame(
        [(i, "g%d" % (i % 2), (i * 7) % 10) for i in range(10)],
        "doc_id long, grp string, score long")
    got = textstats.grouped_topk(docs, "grp", "score", k=2,
                                 tie_col="doc_id").collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.grp, []).append((r.rank, r.doc_id, r.score))
    assert all(len(v) == 2 for v in by_grp.values())
    for v in by_grp.values():
        v.sort()
        assert v[0][2] >= v[1][2]          # rank 1 has the higher score
    # the rank<=k filter must compile to WindowGroupLimit (per-group
    # pre-limit during the sort), not a full-group Window + Filter
    plan = _physical(textstats.grouped_topk(docs, "grp", "score", k=2))
    assert "WindowGroupLimit" in plan


# ----------------------------------------------------------- ccnet buckets


def test_ccnet_buckets_exact_ntile_semantics(spark):
    # 7 docs in one lang: ntile(3) -> sizes 3,2,2 (first tiles take the
    # remainder), ordered by (ppl, doc_id)
    rows = [(i, "en", float(10 + i)) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    got = {r.doc_id: r.bucket for r in textstats.ccnet_buckets(df).collect()}
    assert got == {0: "head", 1: "head", 2: "head", 3: "middle",
                   4: "middle", 5: "tail", 6: "tail"}


def test_ccnet_buckets_approx_branch_monotone_same_schema(spark):
    rows = [(i, "en", float((i * 37) % 101)) for i in range(60)] + \
           [(100 + i, "de", float((i * 17) % 53)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    exact = textstats.ccnet_buckets(df)
    approx = textstats.ccnet_buckets(df, approx=True)
    assert exact.columns == approx.columns
    order = {"head": 0, "middle": 1, "tail": 2}
    for out in (exact, approx):
        rows_ = out.collect()
        by_lang = {}
        for r in rows_:
            by_lang.setdefault(r.lang, []).append((r.ppl, order[r.bucket]))
        for vals in by_lang.values():   # bucket monotone in ppl
            vals.sort()
            assert all(vals[i][1] <= vals[i + 1][1]
                       for i in range(len(vals) - 1))
    # distinct values with 10k-accuracy sketch: branches agree exactly
    a = {(r.doc_id, r.bucket) for r in exact.collect()}
    b = {(r.doc_id, r.bucket) for r in approx.collect()}
    assert len(a ^ b) <= 6      # boundary-tie tolerance, documented


# ------------------------------------------------------- nfc normalization


def test_nfc_normalize_paths(spark):
    rows = [
        (0, "café"),          # decomposed -> composes, shrinks by 1
        (1, "café"),           # already NFC, non-ASCII
        (2, "plain ascii"),         # fast path
        (3, "Å ring"),   # A + combining ring -> U+00C5
        (4, None),                  # null text -> treated as ""
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.nfc_normalize(df).collect()}
    assert got[0].text_nfc == "caf\u00e9" and got[0].changed
    assert (got[0].n_cp_before, got[0].n_cp_after) == (5, 4)
    assert got[1].text_nfc == "caf\u00e9" and not got[1].changed
    assert got[2].text_nfc == "plain ascii" and not got[2].changed
    assert got[3].text_nfc == "\u00c5 ring" and got[3].changed
    assert got[4].text_nfc == "" and not got[4].changed
    assert got[4].n_cp_before == 0


def test_nfc_normalize_zero_shuffle(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = _physical(textstats.nfc_normalize(df))
    assert "Exchange" not in plan


# ----------------------------------------------------------- script mix


def test_script_profile_counts_and_main(spark):
    rows = [(1, "hello мир 世界 ab"),   # 7 latin, 3 cyr, 2 cjk
            (2, "   "),                                        # all spaces
            (3, "γεια 123!"),              # greek + other
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in textstats.script_profile(df).collect()}
    assert (got[1].latin, got[1].cyrillic, got[1].cjk) == (7, 3, 2)
    assert got[1].main_script == "latin" and got[1].other == 0
    assert got[2].n_nonspace == 0 and got[2].main_script == "none"
    assert got[3].greek == 4 and got[3].other == 4   # digits+!  -> other
    assert got[3].main_script == "greek"
    assert got[4].main_script == "none"              # null text


def test_script_profile_tie_breaks_to_block_order(spark):
    # equal latin and cyrillic counts: latin is earlier in SCRIPT_BLOCKS
    df = spark.createDataFrame([(1, "ab аб")],
                               "doc_id long, text string")
    r = textstats.script_profile(df).collect()[0]
    assert r.latin == r.cyrillic == 2 and r.main_script == "latin"


def test_script_profile_rides_the_scan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = _physical(textstats.script_profile(df))
    assert "Exchange" not in plan


# ---------------------------------------------------------------- count-min


def test_cms_never_underestimates_and_is_exact_without_collisions(spark):
    from eventrelationextractor_spark.ops import sketches
    rows = [(w,) for w in ["a"] * 50 + ["b"] * 7 + ["c"] * 1]
    df = spark.createDataFrame(rows, "w string")
    sk = sketches.cms_sketch(df, "w", depth=4, width=1024)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("missing",)],
                                 "w string")
    est = {r.key: r.est for r in
           sketches.cms_lookup(sk, keys, "w", depth=4, width=1024).collect()}
    # wide sketch, 3 keys: no collisions -> exact; absent key -> 0
    assert est == {"a": 50, "b": 7, "c": 1, "missing": 0}


def test_cms_overestimates_under_forced_collisions(spark):
    from eventrelationextractor_spark.ops import sketches
    rows = [(f"k{i}",) for i in range(40) for _ in range(3)]
    df = spark.createDataFrame(rows, "w string")
    sk = sketches.cms_sketch(df, "w", depth=2, width=4)   # heavy collisions
    keys = spark.createDataFrame([(f"k{i}",) for i in range(40)], "w string")
    est = {r.key: r.est for r in
           sketches.cms_lookup(sk, keys, "w", depth=2, width=4).collect()}
    assert all(v >= 3 for v in est.values())          # never under
    assert any(v > 3 for v in est.values())           # collisions exist


def test_cms_merge_is_cellwise_sum(spark):
    from eventrelationextractor_spark.ops import sketches
    import pyspark.sql.functions as SF
    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "w string")
    b = spark.createDataFrame([("x",)] * 3, "w string")
    ska = sketches.cms_sketch(a, "w", depth=3, width=64)
    skb = sketches.cms_sketch(b, "w", depth=3, width=64)
    merged = ska.unionByName(skb).groupBy("row", "col") \
        .agg(SF.sum("cnt").alias("cnt"))
    whole = sketches.cms_sketch(a.unionByName(b), "w", depth=3, width=64)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_cms_sketch_single_shuffle(spark):
    from eventrelationextractor_spark.ops import sketches
    df = spark.createDataFrame([("x",)], "w string")
    plan = _physical(sketches.cms_sketch(df, "w"))
    assert plan.count("Exchange") == 1     # the partial-agged groupBy


# ------------------------------------------------------ tfidf cosine pairs


def test_tfidf_cosine_matches_numpy(spark):
    """Exact cosine check against a dense numpy replay of the same
    tf-idf construction (3-gram shingles, ln(N/df), unit norm)."""
    import math
    texts = {1: "alpha bravo charlie delta echo foxtrot golf",
             2: "alpha bravo charlie delta echo foxtrot hotel",
             3: "one two three four five six seven"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.cosine for r in
           dedup.tfidf_cosine_pairs(docs, threshold=0.0).collect()}

    def shingles(t):
        w = t.split()
        return [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]

    from collections import Counter
    tfs = {d: Counter(shingles(t)) for d, t in texts.items()}
    dfreq = Counter(g for tf in tfs.values() for g in tf)
    N = len(texts)

    def vec(d):
        return {g: c * math.log(N / dfreq[g]) for g, c in tfs[d].items()}

    def cos(a, b):
        va, vb = vec(a), vec(b)
        na = math.sqrt(sum(x * x for x in va.values()))
        nb = math.sqrt(sum(x * x for x in vb.values()))
        return sum(va[g] * vb.get(g, 0.0) for g in va) / na / nb

    assert got[(1, 2)] == pytest.approx(round(cos(1, 2), 6), abs=1e-6)
    assert (1, 3) not in got      # zero shared shingles -> no candidate


def test_tfidf_cosine_max_df_cap_is_contractual(spark):
    """Docs sharing ONLY a hot term (df > max_df) never become a
    candidate pair; the rare-term pair still verifies over the FULL
    index including the hot term's contribution."""
    hot = "common common common"
    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} " + hot) for i in range(5)]
        + [(10, "rare pair term shared " + hot),
           (11, "rare pair term shared zz0 zz1")],
        "doc_id long, text string")
    # "common common common"-derived shingles appear in 6+ docs
    got = {(r.doc_a, r.doc_b) for r in
           dedup.tfidf_cosine_pairs(docs, threshold=0.01,
                                    max_df=3).collect()}
    assert (10, 11) in got
    assert not any(a < 10 and b < 10 for a, b in got)


def test_tfidf_cosine_exact_dup_is_one(spark):
    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta"), (2, "alpha bravo charlie delta"),
         (3, "unrelated words entirely here")],
        "doc_id long, text string")
    rows = dedup.tfidf_cosine_pairs(docs, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.cosine) for r in rows] == [(1, 2, 1.0)]


def test_tfidf_cosine_no_nested_loop(spark):
    docs = spark.createDataFrame([(1, "a b c d")],
                                 "doc_id long, text string")
    plan = _physical(dedup.tfidf_cosine_pairs(docs))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------- label propagation


def test_lpa_triangle_and_clique_with_bridge(spark):
    """A triangle and a 4-clique joined by one bridge edge resolve to
    two communities. (In round 1 every label is distinct, so the
    min-label tie-break briefly leaks the bridge label into the clique;
    from round 2 the clique's internal vote count out-votes it - the
    documented deterministic-tie dynamics.)"""
    from eventrelationextractor_spark.ops import graph
    tri = [(1, 2), (2, 3), (1, 3)]
    clique = [(a, b) for a in (10, 11, 12, 13)
              for b in (10, 11, 12, 13) if a < b]
    edges = spark.createDataFrame(tri + clique + [(3, 10)],
                                  "src long, dst long")
    got = {r.node: r.label for r in
           graph.label_propagation(edges, n_iter=4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == got[13] == 10


def test_lpa_isolated_node_keeps_label(spark):
    from eventrelationextractor_spark.ops import graph
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "node long")
    got = {r.node: r.label for r in
           graph.label_propagation(edges, n_iter=2, nodes=nodes).collect()}
    assert got[99] == 99
    # self-vote keeps the single edge from 2-cycling: both settle on 1
    assert got[1] == got[2] == 1


def test_lpa_tie_breaks_to_smallest_label(spark):
    """Node 5 hears one vote each from labels 1 and 2 -> adopts 1."""
    from eventrelationextractor_spark.ops import graph
    edges = spark.createDataFrame([(1, 5), (2, 5)], "src long, dst long")
    got = {r.node: r.label for r in
           graph.label_propagation(edges, n_iter=1).collect()}
    assert got[5] == 1


def test_lpa_no_window_no_nested_loop(spark):
    from eventrelationextractor_spark.ops import graph
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    plan = _physical(graph.label_propagation(edges, n_iter=2))
    assert "Window" not in plan          # argmax is an aggregation
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------- z-order


def _py_morton(x, y, bits=16):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_replay(spark):
    from eventrelationextractor_spark.ops import layout
    rows = [(x, y) for x in (0, 1, 5, 63, 255) for y in (0, 2, 7, 200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y",
                    layout.morton_key(F.col("x"), F.col("y"), 16)
                    .alias("z")).collect()
    for r in got:
        assert r.z == _py_morton(r.x, r.y, 16)


def test_zorder_envelopes_tight_in_both_dims(spark):
    """Full 64x64 grid into 16 files: morton range partitioning gives
    16x16 blocks (span 15 in BOTH dims); a linear sort on x would leave
    the y span at the full 63."""
    from eventrelationextractor_spark.ops import layout
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = layout.zorder_layout_stats(df, "x", "y", n_files=16,
                                       bits=6).collect()
    assert len(stats) == 16
    assert sum(r.n_rows for r in stats) == 64 * 64
    for r in stats:
        assert r.max_x - r.min_x <= 16
        assert r.max_y - r.min_y <= 16


def test_zorder_approx_branch_same_schema(spark):
    from eventrelationextractor_spark.ops import layout
    rows = [(x, (x * 7) % 32) for x in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    exact = layout.zorder_layout_stats(df, "x", "y", n_files=4, bits=6)
    approx = layout.zorder_layout_stats(df, "x", "y", n_files=4, bits=6,
                                        approx=True)
    assert exact.columns == approx.columns
    assert approx.agg(F.sum("n_rows")).first()[0] == 200


def test_morton_key_is_pure_codegen(spark):
    from eventrelationextractor_spark.ops import layout
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    plan = _physical(df.select(layout.morton_key(F.col("x"), F.col("y"))))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------- frontier schedule


def test_frontier_schedule_per_host_sequencing(spark):
    from eventrelationextractor_spark.ops import urls as u
    df = spark.createDataFrame(
        [("https://a.com/1", 5), ("https://a.com/2", 9),
         ("https://b.com/x", 1)],
        "url string, prio long")
    got = {r.url: r for r in
           u.frontier_schedule(df, priority_col="prio",
                               delay_sec=10).collect()}
    # a.com: higher priority first; b.com independent
    assert got["https://a.com/2"].slot == 1
    assert got["https://a.com/1"].slot == 2
    assert got["https://a.com/1"].fetch_offset_sec == 10
    assert got["https://b.com/x"].slot == 1
    assert got["https://b.com/x"].fetch_offset_sec == 0


def test_frontier_schedule_max_per_host_uses_group_limit(spark):
    from eventrelationextractor_spark.ops import urls as u
    df = spark.createDataFrame(
        [(f"https://a.com/{i}",) for i in range(5)], "url string")
    out = u.frontier_schedule(df, max_per_host=2)
    assert out.count() == 2
    plan = _physical(out)
    assert "WindowGroupLimit" in plan    # cap pushed into the sort


# ------------------------------------------------------------ mixing plan


def test_mixing_plan_tempering_and_budget(spark):
    from eventrelationextractor_spark.ops import mixing
    df = spark.createDataFrame(
        [("wiki", 100), ("wiki", 100), ("crawl", 1800)],
        "source string, toks long")
    got = {r.source: r for r in
           mixing.mixing_plan(df, "source", "toks",
                              target_tokens=2000, alpha=0.5).collect()}
    # alpha=0.5: weights sqrt(200):sqrt(1800) = 1:3
    assert got["wiki"].weight == pytest.approx(0.25, abs=1e-6)
    assert got["crawl"].weight == pytest.approx(0.75, abs=1e-6)
    # wiki gets 500 of 2000 target over 200 actual -> 2.5 epochs
    assert got["wiki"].repeat_factor == pytest.approx(2.5, abs=1e-6)
    assert got["crawl"].repeat_factor == pytest.approx(2000 * 0.75 / 1800,
                                                       abs=1e-6)
    # target shares sum to the budget
    assert sum(r.target_tokens for r in got.values()) == \
        pytest.approx(2000, abs=0.1)


# ------------------------------------------------------------ robots gate


def test_robots_filter_prefix_semantics(spark):
    from eventrelationextractor_spark.ops import urls as u
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\nDisallow: /tmp/\n"),
         ("b.com", "User-agent: *\nDisallow:\n")],     # empty = allow all
        "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [("https://a.com/private/x",), ("https://a.com/public",),
         ("https://a.com/privateer",),   # prefix match on /private -> block
         ("https://b.com/anything",),
         ("https://nohost.com/x",)],     # no robots row -> allowed
        "url string")
    got = {r.url: r.allowed for r in
           u.robots_filter(frontier, robots).collect()}
    assert got["https://a.com/private/x"] is False
    assert got["https://a.com/privateer"] is False
    assert got["https://a.com/public"] is True
    assert got["https://b.com/anything"] is True
    assert got["https://nohost.com/x"] is True


def test_robots_filter_is_broadcast_dimension_join(spark):
    from eventrelationextractor_spark.ops import urls as u
    robots = spark.createDataFrame([("a.com", "Disallow: /x")],
                                   "host string, robots_txt string")
    frontier = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = _physical(u.robots_filter(frontier, robots))
    assert "BroadcastHashJoin" in plan
    assert "Generate" not in plan        # frontier side never explodes


# -------------------------------------------------------------- dup spans


def test_dup_spans_finds_shared_passage(spark):
    """Docs 1 and 2 share a verbatim 9-word passage; doc 3 disjoint.
    The span covers exactly the shared words on both docs."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = spark.createDataFrame(
        [(1, shared + " unique tail words here"),
         (2, "different head words " + shared),
         (3, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    got = {r.doc_id: (r.start_word, r.end_word, r.span_words)
           for r in dedup.dup_spans(docs, n=5, min_words=8).collect()}
    # doc 1: shared words 0..8
    assert got[1] == (0, 8, 9)
    # doc 2: shared words 3..11
    assert got[2] == (3, 11, 9)
    assert 3 not in got


def test_dup_spans_within_doc_repeat_counts(spark):
    """ExactSubstr semantics: a second occurrence WITHIN the same doc
    is a repeat (unlike ngram_dup_stats' cross-doc-only df)."""
    rep = "alpha bravo charlie delta echo"
    docs = spark.createDataFrame(
        [(1, rep + " " + rep),
         (2, "completely different words in this document here")],
        "doc_id long, text string")
    rows = dedup.dup_spans(docs, n=5, min_words=5).collect()
    assert {r.doc_id for r in rows} == {1}


def test_dup_spans_two_separate_islands(spark):
    """Two disjoint shared passages in one doc emit two spans."""
    p1 = "alpha bravo charlie delta echo"
    p2 = "zulu yankee xray whiskey victor"
    docs = spark.createDataFrame(
        [(1, p1 + " mid1 mid2 mid3 " + p2),
         (2, p1 + " other content entirely different " + p2)],
        "doc_id long, text string")
    rows = sorted((r.start_word, r.end_word)
                  for r in dedup.dup_spans(docs, n=5,
                                           min_words=5).collect()
                  if r.doc_id == 1)
    assert rows == [(0, 4), (8, 12)]


def test_dup_spans_no_window_exec(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")],
                                 "doc_id long, text string")
    plan = _physical(dedup.dup_spans(docs))
    assert "Window" not in plan
    assert "SortMergeJoin" in plan       # pinned vocabulary-scale join


# ------------------------------------------------------ frontier expansion


def test_expand_frontier_anti_join_and_counts(spark):
    from eventrelationextractor_spark.ops import urls as u
    links = spark.createDataFrame(
        [("a", "https://x.com/new"), ("b", "https://x.com/new"),
         ("c", "https://x.com/known"), ("d", "https://y.com/other")],
        "src string, resolved_url string")
    known = spark.createDataFrame(
        [("https://x.com/known",)], "url string")
    got = {r.url: r.n_refs
           for r in u.expand_frontier(links, known).collect()}
    assert got == {"https://x.com/new": 2, "https://y.com/other": 1}


# ------------------------------------------------------------ span removal


def test_remove_spans_cuts_detected_duplicates(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = spark.createDataFrame(
        [(1, shared + " unique tail words here"),
         (2, "different head words " + shared),
         (3, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    spans = dedup.dup_spans(docs, n=5, min_words=8)
    got = {r.doc_id: r for r in
           dedup.remove_spans(docs, spans).collect()}
    assert got[1].text_clean == "unique tail words here"
    assert got[1].n_removed_words == 9 and got[1].n_kept_words == 4
    assert got[2].text_clean == "different head words"
    assert got[3].text_clean.startswith("one two")  # untouched
    assert got[3].n_removed_words == 0


def test_remove_spans_no_explode_of_text_side(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h")],
                                 "doc_id long, text string")
    spans = spark.createDataFrame([(1, 0, 3, 4)],
                                  "doc_id long, start_word long, "
                                  "end_word long, span_words long")
    out = dedup.remove_spans(docs, spans)
    assert out.collect()[0].text_clean == "e f g h"
    plan = _physical(out)
    assert plan.count("Generate") == 0   # no explode anywhere


# -------------------------------------------------- exact-k stratum sample


def test_sample_k_per_stratum_exact_and_deterministic(spark):
    rows = [(i, "a" if i < 50 else "b") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    s1 = textstats.sample_k_per_stratum(df, "src", 5)
    s2 = textstats.sample_k_per_stratum(df, "src", 5)
    got1 = sorted((r.doc_id, r.src) for r in s1.collect())
    got2 = sorted((r.doc_id, r.src) for r in s2.collect())
    assert got1 == got2                       # deterministic
    assert sum(1 for _, s in got1 if s == "a") == 5
    assert sum(1 for _, s in got1 if s == "b") == 5
    # small stratum: returns all of it
    few = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, src string")
    assert textstats.sample_k_per_stratum(few, "src", 5).count() == 2


def test_sample_k_per_stratum_group_limit_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, src string")
    plan = _physical(textstats.sample_k_per_stratum(df, "src", 3))
    assert "WindowGroupLimit" in plan


# -------------------------------------------------------------- cdc apply


def test_apply_cdc_latest_wins_and_tombstones(spark):
    log = spark.createDataFrame(
        [(1, 1, "u", "v1"), (1, 3, "u", "v3"), (1, 2, "u", "v2"),
         (2, 1, "u", "x1"), (2, 2, "d", None),
         (3, 1, "d", None), (3, 2, "u", "back")],
        "doc_id long, seq long, op string, payload string")
    got = {r.doc_id: r for r in dedup.apply_cdc(log).collect()}
    assert got[1].payload == "v3" and got[1].seq == 3
    assert 2 not in got                      # deleted
    assert got[3].payload == "back"          # re-inserted after delete


def test_apply_cdc_same_seq_upsert_beats_delete(spark):
    log = spark.createDataFrame(
        [(1, 5, "d", None), (1, 5, "u", "kept")],
        "doc_id long, seq long, op string, payload string")
    got = dedup.apply_cdc(log).collect()
    assert len(got) == 1 and got[0].payload == "kept"


def test_apply_cdc_is_aggregation_not_window(spark):
    log = spark.createDataFrame([(1, 1, "u", "v")],
                                "doc_id long, seq long, op string, "
                                "payload string")
    plan = _physical(dedup.apply_cdc(log))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_spoof_clusters_homograph_detection(spark):
    """Cyrillic/Greek lookalikes and digit substitutions collide onto
    the Latin skeleton; unrelated hosts do not; a skeleton with a
    single host is not a cluster."""
    from eventrelationextractor_spark.ops import urls as u

    hosts = [
        ("apple.com",),
        ("аpple.com",),        # Cyrillic a
        ("applе.com",),        # Cyrillic e
        ("g00gle.com",), ("google.com",),   # digit zero
        ("example.org",),           # singleton
    ]
    df = spark.createDataFrame(hosts, "host string")
    out = {r.host: r for r in u.spoof_clusters(df).collect()}
    assert out["apple.com"].is_spoof_cluster
    assert out["apple.com"].n_variants == 3
    assert out["аpple.com"].skeleton == "apple.com"
    assert out["g00gle.com"].skeleton == "google.com"
    assert out["g00gle.com"].is_spoof_cluster
    assert not out["example.org"].is_spoof_cluster


def test_hilbert_key_bijection_and_adjacency(spark):
    """The two properties that pin the rotate-and-flip unroll: the key
    is a bijection on the grid, and consecutive indices are GRID
    NEIGHBORS (Hilbert's defining locality guarantee - morton fails
    this at every Z-jump)."""
    from eventrelationextractor_spark.ops import layout
    bits = 4
    n = 1 << bits
    pts = spark.createDataFrame([(x, y) for x in range(n)
                                 for y in range(n)], "x long, y long")
    rows = layout.hilbert_key(pts, "x", "y", bits).collect()
    keys = sorted(r.hkey for r in rows)
    assert keys == list(range(n * n))          # bijection onto [0, n^2)
    by_d = sorted(rows, key=lambda r: r.hkey)
    assert all(abs(a.x - b.x) + abs(a.y - b.y) == 1
               for a, b in zip(by_d, by_d[1:]))


def test_hilbert_layout_tighter_worst_envelope_than_zorder(spark):
    """On the full grid, the worst per-file envelope area of the
    Hilbert layout must not exceed z-order's - the reason the second
    curve exists."""
    from eventrelationextractor_spark.ops import layout
    n = 1 << 5
    pts = spark.createDataFrame([(x, y) for x in range(n)
                                 for y in range(n)], "x long, y long")
    def worst(stats):
        return max((r.max_x - r.min_x + 1) * (r.max_y - r.min_y + 1)
                   for r in stats.collect())
    hz = worst(layout.hilbert_layout_stats(pts, "x", "y",
                                           n_files=8, bits=5))
    zz = worst(layout.zorder_layout_stats(pts, "x", "y",
                                          n_files=8, bits=5))
    assert hz <= zz
