"""HLL / KMV sketches: estimation accuracy on known cardinalities, the
merge property that makes them fleet-aggregable, and exact small-set
behavior."""

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import sketches


def test_hll_estimate_accuracy(spark):
    # 3000 distinct values, each appearing 1-3 times
    rows = [(f"val-{i % 3000}",) for i in range(7000)]
    df = spark.createDataFrame(rows, "v string")
    est = sketches.hll_estimate(df, "v").collect()[0].est_distinct
    assert abs(est - 3000) / 3000 < 0.10   # 512 registers: ~4.6% stderr


def test_hll_linear_counting_small_range(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)], "v string")
    est = sketches.hll_estimate(df, "v").collect()[0].est_distinct
    assert abs(est - 40) < 6               # linear counting is tight here


def test_hll_registers_merge_is_max(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "v string")
    both = sketches.hll_registers(a.union(b), "v")
    merged = (sketches.hll_registers(a, "v")
              .union(sketches.hll_registers(b, "v"))
              .groupBy("bucket").agg(F.max("rho").alias("rho")))
    assert sorted(map(tuple, both.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_kmv_exact_when_union_below_k(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(20)], "v string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(10, 30)],
                              "v string")
    row = sketches.kmv_overlap(a, b, "v", k=64).collect()[0]
    assert row.bottomk_size == 30          # union fits in the sketch
    assert row.bottomk_intersection == 10
    assert row.est_union == 30.0           # exact below k
    assert abs(row.est_jaccard - 10 / 30) < 1e-6


def test_kmv_estimates_large_overlap(spark):
    a = spark.createDataFrame([(f"v{i}",) for i in range(1000)],
                              "v string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(500, 1500)],
                              "v string")
    row = sketches.kmv_overlap(a, b, "v", k=128).collect()[0]
    # true union 1500, true jaccard 500/1500 = 0.333
    assert abs(row.est_union - 1500) / 1500 < 0.25
    assert abs(row.est_jaccard - 1 / 3) < 0.12


# ------------------------------------------------------------------ HDR


def test_hdr_merge_is_exact(spark):
    """Sketching shards then merging == sketching the whole input."""
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import sketches as sk
    df = spark.range(1, 5000).select(
        (F.col("id") * 37 % 90000 + 1).alias("v"),
        (F.col("id") % 7).alias("shard"))
    direct = {(r.bucket_lo, r.bucket_hi): r.cnt
              for r in sk.hdr_buckets(df, "v").collect()}
    merged = {(r.bucket_lo, r.bucket_hi): r.cnt
              for r in sk.hdr_merge(
                  sk.hdr_buckets(df, "v", group_cols=("shard",))).collect()}
    assert direct == merged and direct


def test_hdr_quantile_error_bound(spark):
    """Bucket width is <= 10% of the bucket floor, so the midpoint
    estimate is within 10% of the true rank-order statistic."""
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import sketches as sk
    vals = [(i * i * 13) % 70000 + 1 for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r.q_label: r for r in sk.hdr_quantiles(
        sk.hdr_buckets(df, "v")).collect()}
    exact = sorted(vals)
    for num, den in ((1, 2), (9, 10), (99, 100)):
        rank = -(-num * len(vals) // den)      # ceil
        true = exact[rank - 1]
        got = out[f"{num}/{den}"]
        assert got.bucket_lo <= true <= got.bucket_hi
        assert abs(got.estimate - true) <= 0.1 * true
    # small values (<= 2 digits) get exact singleton buckets
    small = spark.createDataFrame([(v,) for v in [3, 3, 7, 99]], "v long")
    rows = sk.hdr_buckets(small, "v").collect()
    assert all(r.bucket_lo == r.bucket_hi for r in rows)
    # nonpositive values are outside the domain and dropped
    mixed = spark.createDataFrame([(0,), (-5,), (10,)], "v long")
    assert sk.hdr_buckets(mixed, "v").count() == 1


def test_hdr_group_quantiles_match_per_group(spark):
    """Grouped extraction == running the ungrouped extraction on each
    group's own slice."""
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import sketches as sk
    df = spark.range(1, 4000).select(
        (F.col("id") * 91 % 40000 + 1).alias("v"),
        (F.col("id") % 3).alias("g"))
    grouped = {(r.g, r.q_label): (r.rank, r.n_total, r.bucket_lo,
                                  r.bucket_hi, r.estimate)
               for r in sk.hdr_group_quantiles(
                   sk.hdr_buckets(df, "v", group_cols=("g",)),
                   ("g",)).collect()}
    assert len(grouped) == 9
    for g in range(3):
        solo = {r.q_label: (r.rank, r.n_total, r.bucket_lo, r.bucket_hi,
                            r.estimate)
                for r in sk.hdr_quantiles(
                    sk.hdr_buckets(df.filter(F.col("g") == g),
                                   "v")).collect()}
        for q, row in solo.items():
            assert grouped[(g, q)] == row


def test_winsorize_by_hdr_clips_both_tails(spark):
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.ops import sketches as sk
    # 1000 mid values + extreme tails on both sides
    df = spark.range(1, 1001).select(
        F.col("id").alias("doc"), (F.col("id") % 50 + 500).alias("v")) \
        .unionByName(spark.createDataFrame(
            [(9001, 1), (9002, 1000000)], "doc long, v long"))
    out = {r.id: r for r in sk.winsorize_by_hdr(df, "v", "doc").collect()}
    assert out[9001].was_clipped and out[9001].clipped > 1
    assert out[9002].was_clipped and out[9002].clipped < 1000000
    mid = out[525]    # v=525, safely inside [p1, p99]
    assert not mid.was_clipped and mid.clipped == mid.value
    # clip bounds are the HDR midpoints: all clipped values inside them
    los = {r.clipped for r in out.values()}
    assert min(los) == out[9001].clipped and max(los) == out[9002].clipped


# --------------------------------------------------------- Space-Saving


def test_spacesaving_guarantees_and_determinism(spark):
    from eventrelationextractor_spark.ops import sketches
    # stream for one key: item i appears (20 - i) times, i in 0..11;
    # k=4 tracks a superset of the top items, counts overestimate by
    # <= err, and every item with freq > n/k is present
    rows = []
    t = 0
    for rep in range(20):
        for i in range(12):
            if rep < 20 - i:
                rows.append((t, f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}",
                             "k", i))
                t += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, user_id long") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts",
                    "event_type", "user_id")
    out = sketches.spacesaving_topk(df, k=4).collect()
    n = len(rows)
    true = {i: 20 - i for i in range(12)}
    assert len(out) == 4
    for r in out:
        assert r.n_seen == n
        assert r.est_count >= true.get(r.item, 0)          # never undercount
        assert r.est_count - r.err <= true.get(r.item, 0)  # bounded over
    tracked = {r.item for r in out}
    for i, f in true.items():
        if f > n / 4:
            assert i in tracked
    # determinism: re-run bit-identical
    again = sketches.spacesaving_topk(df, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_streaming_spacesaving_matches_batch(spark, tmp_path):
    import os
    import time

    from eventrelationextractor_spark.ops import sketches
    rows = [(i, f"2024-01-01 00:00:{i:02d}", "a", i % 3) for i in range(30)]
    rows += [(100 + i, f"2024-01-01 00:01:{i:02d}", "a", 50 + i)
             for i in range(10)]        # long tail forcing evictions
    rows += [(200 + i, f"2024-01-01 00:02:{i:02d}", "b", 7)
             for i in range(5)]
    schema = "event_id long, ts string, event_type string, user_id long"

    def to_df(rs):
        return spark.createDataFrame(rs, schema).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "event_type",
            "user_id")

    batch = {tuple(r) for r in
             sketches.spacesaving_topk(to_df(rows), k=4).collect()}

    src = str(tmp_path / "ss_src")
    os.makedirs(src)
    half = len(rows) // 2
    for i, part in enumerate((rows[:half], rows[half:])):
        to_df(part).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.1)
    stream = spark.readStream.schema(to_df(rows).schema) \
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false") \
        .parquet(src + "/*")
    q = (sketches.streaming_spacesaving(stream, k=4)
         .writeStream.format("memory").queryName("ss_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows_out = spark.sql("SELECT * FROM ss_out").collect()
    last_n = {}
    for r in rows_out:
        last_n[r.key] = max(last_n.get(r.key, 0), r.n_seen)
    snap = {tuple(r) for r in rows_out if r.n_seen == last_n[r.key]}
    assert snap == batch
