"""Trigram language-ID tier: exhaustive correctness over every text the
multilingual slice can generate (all languages x seed sentences x word
rotations - doc_id only selects among these variants, so this test
guarantees the closed-form lang_id_trigram oracle at EVERY scale
factor), plus edge cases and the plan shape."""

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import textstats


def test_trigram_classifier_exact_on_all_variants(spark):
    rows = []
    vid = 0
    truth = {}
    for lang in textstats.TRIGRAM_LANGS:
        for sent in textstats.LANG_SEEDS[lang]:
            words = sent.split()
            for rot in range(len(words)):
                text = " ".join(words[rot:] + words[:rot])
                rows.append((vid, text))
                truth[vid] = lang
                vid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.predicted_lang
           for r in textstats.lang_id_trigram(df).collect()}
    wrong = {v: (got[v], truth[v]) for v in truth if got[v] != truth[v]}
    assert not wrong, f"{len(wrong)}/{len(truth)} misclassified: " \
        f"{dict(list(wrong.items())[:5])}"
    assert len(truth) > 300  # the variant space is genuinely exhaustive


def test_trigram_classifier_und_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "0101 1100 2345 9999"), (2, ""), (3, "zzqqxx")],
        "doc_id long, text string")
    got = {r.doc_id: r.predicted_lang
           for r in textstats.lang_id_trigram(df).collect()}
    # digit strings / empty / non-language junk -> 'und', never a crash
    assert got[2] == "und"
    assert set(got.values()) <= set(textstats.TRIGRAM_LANGS) | {"und"}


def test_trigram_profile_join_broadcasts(spark):
    df = spark.createDataFrame([(1, "the quick brown fox")],
                               "doc_id long, text string")
    plan = textstats.lang_id_trigram(df)._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in plan  # profile table is broadcast
    # scoring is ONE aggregation over integer conditional sums
    assert plan.count("HashAggregate") >= 2  # partial + final of one agg


def test_parse_urls_and_domain_stats(spark):
    from eventrelationextractor_spark.ops import urls
    df = spark.createDataFrame(
        [(0, "https://news.example.com/p0", "aaaa"),
         (1, "https://news.example.com/a/b/c/p1", "bb"),
         (2, "http://blog.example.com/x", "c"),
         (3, "https://example.com/", "dd")],
        "doc_id long, url string, text string")
    p = {r.doc_id: (r.host, r.domain, r.tld, r.path_depth)
         for r in urls.parse_urls(df).collect()}
    assert p[0] == ("news.example.com", "example.com", "com", 1)
    assert p[1] == ("news.example.com", "example.com", "com", 4)
    assert p[2] == ("blog.example.com", "example.com", "com", 1)
    assert p[3][3] <= 1          # bare root path
    s = {r.domain: (r.n_docs, r.n_hosts) for r in
         urls.domain_stats(df).collect()}
    assert s["example.com"] == (4, 3)
    # rollup is map-side combinable; the exact countDistinct(host)
    # adds its standard second aggregation phase - two Exchanges total,
    # never a join or explode
    plan = urls.domain_stats(df)._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert plan.count("Exchange") <= 2 and "Join" not in plan


def test_stratified_sample_rates_and_determinism(spark):
    from eventrelationextractor_spark.ops.textstats import stratified_sample
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    samp = stratified_sample(df, {"a": 0.5, "b": 0.1}, "stratum")
    got = samp.groupBy("stratum").count().collect()
    by = {r.stratum: r["count"] for r in got}
    assert abs(by["a"] / 2000 - 0.5) < 0.05      # md5 is uniform enough
    assert abs(by["b"] / 2000 - 0.1) < 0.03
    # deterministic: identical output set on rerun; different salt ->
    # different (independent) fate set
    s1 = {r.doc_id for r in samp.collect()}
    s2 = {r.doc_id for r in stratified_sample(
        df, {"a": 0.5, "b": 0.1}, "stratum").collect()}
    assert s1 == s2
    s3 = {r.doc_id for r in stratified_sample(
        df, {"a": 0.5, "b": 0.1}, "stratum", salt="other").collect()}
    assert s3 != s1
    # unknown stratum -> dropped
    assert stratified_sample(df, {"a": 1.0}, "stratum") \
        .filter(F.col("stratum") == "b").count() == 0
    # codegen filter, no shuffle
    plan = samp._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert "Exchange" not in plan
    # empty rates = every stratum absent = drop all rows (documented),
    # not an AttributeError
    assert stratified_sample(df, {}, "stratum").count() == 0


def test_assign_split_deterministic_and_stable(spark):
    from eventrelationextractor_spark.ops.textstats import assign_split
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split for r in assign_split(df, w).collect()}
    counts = {}
    for s in got.values():
        counts[s] = counts.get(s, 0) + 1
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02
    assert None not in counts            # weights sum to 1 -> total cover
    # growth stability: membership of existing ids is unchanged when the
    # corpus doubles (pure function of id, not of the dataset)
    big = spark.createDataFrame([(i,) for i in range(10000)], "doc_id long")
    got2 = {r.doc_id: r.split for r in assign_split(big, w).collect()}
    assert all(got2[i] == got[i] for i in got)
    # partial weights -> NULL holdout; empty weights -> all NULL
    part = {r.split for r in
            assign_split(df, {"train": 0.5}).collect()}
    assert part == {"train", None}
    assert {r.split for r in assign_split(df, {}).collect()} == {None}
    # codegen, no shuffle
    plan = assign_split(df, w)._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert "Exchange" not in plan


def test_repetition_stats_values_and_plan(spark):
    from eventrelationextractor_spark.ops.textstats import repetition_stats
    rows = [(0, "a a a b"),          # top word 3/4, bigram 'a a' 2/3
            (1, "x y z"),            # no repetition
            (2, "solo"),             # 1 word: bigram frac 0
            (3, "ab ab ab ab")]      # total repetition
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[0].n_words == 4
    assert got[0].dup_word_frac == 0.5          # 2 distinct of 4
    assert got[0].top_word_frac == 0.75
    assert got[0].top_bigram_frac == round(2 / 3, 6)
    assert got[0].mean_word_len == 1.0
    assert got[1].dup_word_frac == 0.0 and got[1].top_word_frac == round(1 / 3, 6)
    assert got[2].n_words == 1 and got[2].top_bigram_frac == 0.0
    assert got[3].top_word_frac == 1.0 and got[3].dup_word_frac == 0.75
    assert got[3].mean_word_len == 2.0
    plan = repetition_stats(df)._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert "Exchange" not in plan and "Python" not in plan


def test_redact_pii_semantics(spark):
    from eventrelationextractor_spark.ops.pii import redact_pii
    rows = [
        (0, "mail bob.smith+x@corp.example.co.uk now"),
        (1, "server at 192.168.0.1 port 80"),
        (2, "call 555-123-4567 or 555 987 6543"),
        (3, "mixed a@b.io and 10.0.0.7 and 123-456-7890"),
        (4, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert got[0].n_emails == 1 and "<EMAIL>" in got[0].redacted \
        and "@" not in got[0].redacted
    assert got[1].n_ips == 1 and got[1].redacted == "server at <IP> port 80"
    assert got[2].n_phones == 2 \
        and got[2].redacted == "call <PHONE> or <PHONE>"
    assert (got[3].n_emails, got[3].n_ips, got[3].n_phones) == (1, 1, 1)
    assert got[3].redacted == "mixed <EMAIL> and <IP> and <PHONE>"
    assert got[4].redacted == rows[4][1]
    # idempotent: redacting redacted text changes nothing
    again = redact_pii(
        spark.createDataFrame([(3, got[3].redacted)],
                              "doc_id long, text string")).first()
    assert again.redacted == got[3].redacted
    assert (again.n_emails, again.n_ips, again.n_phones) == (0, 0, 0)


def test_unigram_logprob_self_and_external_vocab(spark):
    import math

    from eventrelationextractor_spark.ops.textstats import unigram_logprob
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    # corpus counts: a=2, b=2, c=1, total=5
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    assert got[0].n_tokens == 3
    assert got[0].mean_logprob == round((2 * lp["a"] + lp["b"]) / 3, 6)
    assert got[1].mean_logprob == round((lp["b"] + lp["c"]) / 2, 6)
    assert got[2].mean_logprob is None and got[2].n_tokens == 0
    # perplexity inverts the mean
    assert got[1].ppl == round(math.exp(-(lp["b"] + lp["c"]) / 2), 4)
    # external vocab: OOV words take min(logprob) - ln(10)
    vocab = spark.createDataFrame(
        [("a", math.log(0.5)), ("b", math.log(0.25))],
        "word string, logprob double")
    ext = {r.doc_id: r for r in unigram_logprob(docs, vocab=vocab).collect()}
    oov = math.log(0.25) - math.log(10.0)
    assert ext[1].mean_logprob == round((math.log(0.25) + oov) / 2, 6)


def test_dedup_resolution_transitive_cluster(spark):
    """a~b and b~c (but a!~c) must land in ONE cluster with the smallest
    id kept - the transitive fuzzy-dedup semantics."""
    from eventrelationextractor_spark.ops import dedup
    w = [f"w{i}" for i in range(1, 13)]
    rows = [(0, " ".join(w[0:8])),      # w1..w8
            (1, " ".join(w[2:10])),     # w3..w10: J=0.5 with doc0
            (2, " ".join(w[4:12])),     # w5..w12: J=0.5 with doc1, 0.2 with doc0
            (7, "totally unrelated text about nothing at all here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.a, r.b) for r in
             dedup.jaccard_pairs(df, threshold=0.5).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs and (0, 2) not in pairs
    got = {r.doc_id: (r.canonical_id, r.is_kept) for r in
           dedup.dedup_resolution(df, threshold=0.5).collect()}
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)          # transitive: joined via doc1
    assert got[7] == (7, True)           # singleton keeps itself


def test_ngram_contamination(spark):
    from eventrelationextractor_spark.ops.decontam import ngram_contamination
    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta"),   # contains bench gram
        (1, "one two three four five six seven"),     # clean
        (2, "short doc"),                             # < n words: 0 grams
        (3, "x alpha beta gamma delta epsilon y"),    # contaminated mid-doc
    ], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "bench_id long, text string")
    got = {r.doc_id: r for r in
           ngram_contamination(docs, bench, n=5).collect()}
    assert got[0].contaminated and got[0].n_hits == 1
    assert not got[1].contaminated and got[1].n_grams == 3
    assert got[2].n_grams == 0 and not got[2].contaminated
    assert got[3].contaminated
    # scale shape: the benchmark gram set is broadcast
    plan = ngram_contamination(docs, bench, n=5) \
        ._jdf.queryExecution().toString().split("== Physical Plan ==")[-1]
    assert "BroadcastHashJoin" in plan


def test_jaccard_materialized_shingles(spark, tmp_path):
    """The production shingle path (materialized parquet table) must
    produce identical pairs to the cache path."""
    import os

    from eventrelationextractor_spark.ops import dedup
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy cat",
             "a completely different sentence about spark engines",
             "the quick brown fox jumps over the lazy dog today"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    cached = {tuple(r) for r in
              dedup.jaccard_pairs(df, threshold=0.3).collect()}
    path = str(tmp_path / "shingles")
    mat = {tuple(r) for r in
           dedup.jaccard_pairs(df, threshold=0.3,
                               shingle_table_path=path).collect()}
    assert cached == mat and len(mat) > 0
    assert os.path.isdir(path)  # the table was actually materialized


def test_bigram_logprob_self_scored_closed_form(spark):
    """Tiny corpus where every KN quantity is hand-computable.
    Corpus bigrams: doc1 'a b a b' -> (a,b) (b,a) (a,b); doc2 'a c'.
    Counts: c(a,b)=2 c(b,a)=1 c(a,c)=1; c1(a)=3 nfol(a)=2, c1(b)=1
    nfol(b)=1; cont(b)=1 cont(a)=1 cont(c)=1; nbt=3."""
    import math
    df = spark.createDataFrame([(1, "a b a b"), (2, "a c"), (3, "solo"),
                                (4, "")], "doc_id long, text string")
    rows = {r.doc_id: r for r in textstats.bigram_logprob(df).collect()}
    D = 0.75
    p_ab = (2 - D) / 3 + D * 2 / 3 * (1 / 3)
    p_ba = (1 - D) / 1 + D * 1 / 1 * (1 / 3)
    p_ac = (1 - D) / 3 + D * 2 / 3 * (1 / 3)
    exp1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert rows[1].n_bigrams == 3
    assert abs(rows[1].mean_logprob - exp1) < 1e-6
    assert abs(rows[2].mean_logprob - math.log(p_ac)) < 1e-6
    # <2-word docs emit no bigrams but keep a row
    assert rows[3].n_bigrams == 0 and rows[3].mean_logprob is None
    assert rows[4].n_bigrams == 0
    # ppl = exp(-mean)
    assert abs(rows[1].ppl - round(math.exp(-exp1), 4)) < 1e-9


def test_bigram_logprob_external_model_fallbacks(spark):
    """External model: unseen bigram takes the backoff term only; a
    wholly unseen context falls back to the continuation probability
    (0.5 pseudo-count for an unseen continuation word)."""
    import math
    model = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 1), ("a", "c", 1)],
        "w1 string, w2 string, c long")
    df = spark.createDataFrame(
        [(1, "b c"),      # seen context b, unseen bigram (b,c)
         (2, "z a"),      # unseen context z, seen continuation a
         (3, "z q")],     # unseen context AND unseen continuation
        "doc_id long, text string")
    rows = {r.doc_id: r
            for r in textstats.bigram_logprob(df, bigram_model=model)
            .collect()}
    D, nbt = 0.75, 3
    p_bc = 0.0 + D * 1 / 1 * (1 / nbt)          # backoff only
    p_za = 1 / nbt                               # continuation fallback
    p_zq = 0.5 / nbt                             # unseen continuation
    assert abs(rows[1].mean_logprob - round(math.log(p_bc), 6)) < 1e-6
    assert abs(rows[2].mean_logprob - round(math.log(p_za), 6)) < 1e-6
    assert abs(rows[3].mean_logprob - round(math.log(p_zq), 6)) < 1e-6


def test_bigram_formation_is_map_side(spark):
    """doc_bigrams must not shuffle: within-row slice+zip+explode."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = textstats.doc_bigrams(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_profile_drift_statuses_and_flags(spark):
    """added/removed columns carry -1 sentinels; a null-rate jump and a
    distinct collapse on kept columns are flagged; healthy kept columns
    are not."""
    from eventrelationextractor_spark.ops import textstats as ts

    old = spark.createDataFrame(
        [(1, "en", "a"), (2, "de", "b"), (3, "fr", "c"), (4, "en", "d")],
        "id long, lang string, key string")
    # new snapshot: key dropped, extra added, lang half-null,
    # id distinct collapses to 1
    new = spark.createDataFrame(
        [(7, "en", 1.5), (7, None, None), (7, "de", 3.5), (7, None, None)],
        "id long, lang string, extra double")
    drift = {r.column: r for r in ts.profile_drift(
        ts.profile_table(old), ts.profile_table(new)).collect()}
    assert drift["key"].status == "removed"
    assert drift["key"].new_null_ppm == -1
    assert drift["key"].new_distinct == -1
    assert not drift["key"].null_rate_jump
    assert drift["extra"].status == "added"
    assert drift["extra"].old_null_ppm == -1
    assert drift["extra"].null_rate_jump        # born 500000 ppm null
    assert drift["lang"].status == "kept"
    assert drift["lang"].old_null_ppm == 0
    assert drift["lang"].new_null_ppm == 500000
    assert drift["lang"].null_rate_jump
    assert drift["id"].status == "kept"
    assert drift["id"].distinct_collapse        # 4 -> 1 distinct
    assert not drift["lang"].distinct_collapse  # 3 -> 2 is above 50%


def test_mad_outliers_known_values(spark):
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame([(i, v) for i, v in
                                enumerate([1, 1, 2, 4, 10])],
                               "doc_id long, v long")
    rows = {r.doc_id: r for r in
            textstats.mad_outliers(df, "v", "doc_id").collect()}
    # median=2 (med2=4); dev2=[2,2,0,4,16]; MAD=1 (mad4=4)
    assert rows[0].med2 == 4 and rows[0].mad4 == 4
    assert [rows[i].is_outlier for i in range(5)] == \
        [False, False, False, False, True]


def test_mad_outliers_even_n_half_median(spark):
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame([(0, 1), (1, 3)], "doc_id long, v long")
    rows = textstats.mad_outliers(df, "v", "doc_id").collect()
    assert rows[0].med2 == 4  # median 2.0 carried as exact 2x integer


# --------------------------------------------------------- url templates


def test_url_templates_collapse_and_tails(spark):
    from eventrelationextractor_spark.ops import urls as u
    rows = [("https://s.com/product/12/view",),
            ("https://s.com/product/99/view",),
            ("https://s.com/product/12/view",),   # duplicate tail 12
            ("https://s.com/" + "a1b2c3d4e5f60718" + "/x",),
            ("https://s.com/" + "ffffffffffffffff" + "/x",),
            ("https://s.com/about",)]             # below min_count
    df = spark.createDataFrame(rows, "url string")
    got = {r.template: r for r in
           u.url_templates(df, min_count=2).collect()}
    assert set(got) == {"/product/{n}/view", "/{h}/x"}
    p = got["/product/{n}/view"]
    assert (p.n_urls, p.n_distinct_tails) == (3, 2)
    assert got["/{h}/x"].n_distinct_tails == 2


def test_url_templates_short_hex_not_collapsed(spark):
    from eventrelationextractor_spark.ops import urls as u
    # 'abcdef' is hex but < 16 chars: stays literal; query strings and
    # fragments are excluded from the path
    rows = [("https://s.com/abcdef/p?id=1",),
            ("https://s.com/abcdef/p#frag",)]
    df = spark.createDataFrame(rows, "url string")
    got = u.url_templates(df, min_count=2).collect()
    assert len(got) == 1 and got[0].template == "/abcdef/p"
    assert got[0].n_distinct_tails == 1     # both tails are ''


# ------------------------------------------------------ weighted median


def test_weighted_median_exact_lower(spark):
    from eventrelationextractor_spark.ops import textstats
    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 100, 1),
            ("b", 5, 9), ("b", 50, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r.g: (r.wmedian, r.total_weight)
           for r in textstats.weighted_median(df, ["g"], "v", "w")
           .collect()}
    # a: total 4, cum at v=2 is 2 -> 2*2>=4 -> lower median 2
    # b: weight 9 at 5 dominates
    assert got == {"a": (2, 4), "b": (5, 10)}


def test_weighted_median_duplicate_values_collapse(spark):
    from eventrelationextractor_spark.ops import textstats
    rows = [("a", 7, 1)] * 5 + [("a", 9, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = textstats.weighted_median(df, ["g"], "v", "w").collect()[0]
    assert (r.wmedian, r.total_weight) == (7, 7)


def test_zipf_fit_on_exact_power_law(spark):
    from eventrelationextractor_spark.ops import bm25
    # freq(rank r) = 840 / r (lcm(1..8) keeps it exact): a perfect
    # power law with exponent 1 -> alpha = 1, r2 = 1
    rows = []
    for r in range(1, 9):
        rows += [(r * 10000 + i, f"term{r}") for i in range(840 // r)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25.zipf_fit(df, top_n=8).collect()[0]
    assert out.n_terms == 8
    assert abs(out.alpha - 1.0) < 1e-6
    assert abs(out.r2 - 1.0) < 1e-6


def test_flesch_readability_known_value(spark):
    from eventrelationextractor_spark.ops import textstats
    # "the cat sat. the dog ran." -> 6 words, 2 sentences, 6 syllables
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    df = spark.createDataFrame(
        [(0, "the cat sat. the dog ran."), (1, ""), (2, "xyzzy")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           textstats.flesch_readability(df).collect()}
    assert (got[0].n_words, got[0].n_sentences, got[0].n_syllables) \
        == (6, 2, 6)
    assert abs(got[0].flesch - 119.19) < 1e-6
    assert got[1].flesch is None and got[1].n_words == 0
    # 'xyzzy' has vowel run 'y','y' -> 2 syllables, 1 sentence, 1 word
    assert (got[2].n_syllables, got[2].flesch is not None) == (2, True)


def test_source_js_divergence_identical_and_disjoint(spark):
    import math

    from eventrelationextractor_spark.ops import textstats
    # group 'a' == half of a two-group corpus where 'b' is disjoint:
    # p_a = {x:1}; corpus q = {x: .5, y: .5}
    df = spark.createDataFrame(
        [(0, "a", "x x x x"), (1, "b", "y y y y")],
        "doc_id long, source string, text string")
    got = {r.source: r for r in
           textstats.source_js_divergence(df).collect()}
    # closed form: p=1, q=.5 on x -> core = 1*ln(4/3) + .5*ln(2/3);
    # jsd = .5*core + .5*ln2*(1-.5)
    core = math.log(4 / 3) + 0.5 * math.log(2 / 3)
    want = round(0.5 * core + 0.5 * math.log(2) * 0.5, 6)
    assert abs(got["a"].jsd - want) < 1e-6
    assert got["a"].overlap_q == 0.5 and got["a"].n_terms == 1
    # symmetric corpus -> same value for b
    assert abs(got["b"].jsd - want) < 1e-6


def test_source_js_divergence_zero_for_single_source(spark):
    from eventrelationextractor_spark.ops import textstats
    df = spark.createDataFrame([(0, "a", "x y z"), (1, "a", "x y")],
                               "doc_id long, source string, text string")
    r = textstats.source_js_divergence(df).collect()[0]
    assert r.jsd == 0.0 and r.overlap_q == 1.0


def test_multitier_resolution_chains_tiers(spark):
    """A byte-exact copy (exact tier) of a near-duplicate (jaccard
    tier) must land in ONE cluster even though no single tier links
    the endpoints directly."""
    from eventrelationextractor_spark.ops.dedup import multitier_resolution
    base = "key agg row scan slow fast table value part hash merge"
    df = spark.createDataFrame(
        [(1, base),
         (2, base + " extra"),      # near-dup of 1 (jaccard tier)
         (3, base + " extra"),      # exact copy of 2 (exact tier)
         (9, "completely different words about nothing shared here")],
        "doc_id long, text string")
    got = {r.doc_id: (r.canonical_id, r.is_kept)
           for r in multitier_resolution(df).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[9] == (9, True)
