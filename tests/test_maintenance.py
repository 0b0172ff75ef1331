"""ops/maintenance.py: compaction planning, skew profiling, k-anonymity
suppression - semantics + the scale-shape claims."""

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import maintenance


def test_compaction_plan_bins_and_append_stability(spark):
    files = [("p0", "a", 100), ("p0", "b", 100), ("p0", "c", 100),
             ("p0", "d", 250), ("p1", "a", 50)]
    df = spark.createDataFrame(
        files, "partition string, path string, size_bytes long")
    out = {(r.partition, r.path): (r.bin, r.bin_offset)
           for r in maintenance.compaction_plan(
               df, target_bytes=250).collect()}
    # cumsum-before: a=0, b=100, c=200, d=300 -> bins 0,0,0,1
    assert out[("p0", "a")] == (0, 0)
    assert out[("p0", "b")] == (0, 100)
    assert out[("p0", "c")] == (0, 200)
    assert out[("p0", "d")] == (1, 300)
    assert out[("p1", "a")] == (0, 0)        # partitions independent
    # append-stable: adding a later path never moves earlier files
    grown = spark.createDataFrame(
        files + [("p0", "z", 999)],
        "partition string, path string, size_bytes long")
    out2 = {(r.partition, r.path): (r.bin, r.bin_offset)
            for r in maintenance.compaction_plan(
                grown, target_bytes=250).collect()}
    assert all(out2[k] == v for k, v in out.items())
    with pytest.raises(ValueError):
        maintenance.compaction_plan(df, target_bytes=0)


def test_compaction_plan_partition_window_not_global_sort(spark):
    df = spark.createDataFrame([("p0", "a", 1), ("p1", "b", 2)],
                               "partition string, path string,"
                               " size_bytes long")
    plan = maintenance.compaction_plan(df)._jdf.queryExecution() \
        .toString().split("== Physical Plan ==")[-1]
    assert "hashpartitioning(partition" in plan
    assert "rangepartitioning" not in plan


def test_skew_profile_shares_and_salt(spark):
    rows = [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    out = {r.key: (r.n, r.share, r.salt_factor)
           for r in maintenance.skew_profile(
               df, "k", n_partitions=10, top_k=2).collect()}
    assert set(out) == {"1", "2"}            # top-2 only
    assert out["1"] == (80, 0.8, 8)          # 80% of 10 partitions
    assert out["2"] == (15, 0.15, 2)         # ceil(1.5)


def test_kanon_suppress_marks_small_groups(spark):
    rows = [(i, "en", i % 2) for i in range(10)] + [(99, "xx", 0)]
    df = spark.createDataFrame(rows, "id long, lang string, b long")
    out = {r.id: (r.group_n, r.is_suppressed)
           for r in maintenance.kanon_suppress(
               df, ["lang", "b"], k=5).collect()}
    assert out[0] == (5, False) and out[1] == (5, False)
    assert out[99] == (1, True)
    with pytest.raises(ValueError):
        maintenance.kanon_suppress(df, [], k=5)
