"""Explicit url-hash bucketing: co-bucketed tables join without a shuffle."""

import pytest
from pyspark.sql import functions as F

from eventrelationextractor_spark.spark import bucketing, stages


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is static config; the session default (cwd/spark-warehouse)
    # is fine for a throwaway managed table
    pages = stages.synth_pages_df(spark, 50, partitions=4)
    triples = stages.extract_triples(pages, "temporal")
    mentions = stages.extract_mentions(pages)
    bucketing.write_bucketed(triples, "triples_b", n_buckets=8)
    bucketing.write_bucketed(mentions, "mentions_b", n_buckets=8)
    yield "triples_b", "mentions_b"
    spark.sql("DROP TABLE IF EXISTS triples_b")
    spark.sql("DROP TABLE IF EXISTS mentions_b")


def test_cobucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketing.colocated_join(spark, left, right)
    plan = joined._jdf.queryExecution().toString() \
        .split("== Physical Plan ==")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucket layout reused
    assert joined.count() > 0


def test_bucketed_contents_match_unbucketed(spark, bucketed_tables):
    left, _ = bucketed_tables
    pages = stages.synth_pages_df(spark, 50, partitions=4)
    direct = stages.extract_triples(pages, "temporal") \
        .filter(F.col("pair_type") != "meta")
    stored = spark.table(left).filter(F.col("pair_type") != "meta")
    assert stored.count() == direct.count()
    assert stored.exceptAll(direct).count() == 0
