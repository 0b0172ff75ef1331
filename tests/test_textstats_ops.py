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
