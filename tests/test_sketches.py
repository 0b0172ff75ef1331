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
