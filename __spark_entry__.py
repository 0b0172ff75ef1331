"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship staged KG-construction job on a mixed
corpus (reference fixtures + deterministic synthetic web pages) and returns
the triples DataFrame. ``queries()`` exposes each implemented operator from
SURVEY.md §2 as (spark, sf_dir) -> DataFrame, and ``oracle_sql()`` gives a
DuckDB-runnable ANSI-SQL twin for the value-hash correctness gate.

The synthetic corpus (eventrelationextractor_spark.datagen) is a pure
function of doc_id, so the full temporal/causal triple output has a
closed-form SQL oracle; the fixture corpus is oracled by the *reference
engine's own outputs* (golden TSVs vendored under resources/fixtures).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eventrelationextractor_spark import fixtures as fx  # noqa: E402
from eventrelationextractor_spark.spark import stages  # noqa: E402

# ---------------------------------------------------------------- helpers

_PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                 "text string, lang string")


def _fixture_pages_df(spark: SparkSession, names) -> DataFrame:
    return spark.createDataFrame(fx.fixture_pages(names), _PAGES_SCHEMA)


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id")


def _synth_triples(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    pages = stages.pages_from_doc_ids(_doc_ids(spark, sf_dir))
    trips = stages.extract_triples(pages, mode=mode)
    return (trips
            .withColumn("doc_id", F.substring("url", -8, 8).cast("long"))
            .select("doc_id", "subj", "pred", "obj"))


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fixtures + 200 synthetic pages -> (url, subj, pred, obj,
    stage, pair_type) triples, temporal and causal sieves combined."""
    synth = stages.synth_pages_df(spark, 200)
    fixture = _fixture_pages_df(spark, fx.TEMPORAL_FIXTURES)
    pages = synth.unionByName(fixture)
    return stages.extract_triples(pages, mode="both")


# ---------------------------------------------------------------- queries

def _q_kg_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _synth_triples(spark, sf_dir, "temporal")


def _q_kg_causal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _synth_triples(spark, sf_dir, "causal")


def _q_fixture_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _fixture_pages_df(spark, fx.TEMPORAL_FIXTURES)
    return stages.extract_triples(pages, mode="temporal") \
        .select("url", "subj", "pred", "obj")


def _q_fixture_causal(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _fixture_pages_df(spark, fx.CAUSAL_FIXTURES)
    return stages.extract_triples(pages, mode="causal") \
        .select("url", "subj", "pred", "obj")


def _q_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = stages.pages_from_doc_ids(_doc_ids(spark, sf_dir))
    return stages.extracted_text(pages) \
        .withColumn("doc_id", F.substring("url", -8, 8).cast("long")) \
        .select("doc_id", "sha256")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_temporal_triples": _q_kg_temporal,
        "kg_causal_triples": _q_kg_causal,
        "kg_fixture_temporal": _q_fixture_temporal,
        "kg_fixture_causal": _q_fixture_causal,
        "kg_text_identity": _q_text_identity,
    }


# ---------------------------------------------------------------- oracles

_TT_ORACLE = """
WITH docs AS (SELECT doc_id AS d FROM documents),
vals AS (
  SELECT d, k,
    CASE WHEN k = 0 THEN strftime(DATE '2010-01-01' + (d % 100) * INTERVAL 1 DAY, '%Y-%m-%d')
         WHEN k = 4 THEN strftime(DATE '2000-01-01' + ((d*37 + 101) % 365) * INTERVAL 1 DAY, '%Y-%m')
         WHEN k = 3 AND d % 5 = 0 THEN strftime(DATE '2000-01-01' + ((d*37 + 101) % 365) * INTERVAL 1 DAY, '%Y-%m-%d')
         ELSE strftime(DATE '2000-01-01' + ((d*37 + k*101) % 365) * INTERVAL 1 DAY, '%Y-%m-%d')
    END AS v
  FROM docs, (VALUES (0),(1),(2),(3),(4)) t(k)
),
pairs AS (
  SELECT a.d AS d, 'tmx' || a.k AS src, 'tmx' || b.k AS tgt,
    CASE WHEN a.v = b.v THEN 'SIMULTANEOUS'
         WHEN len(a.v) = 7 AND len(b.v) = 10 AND b.v LIKE a.v || '%' THEN 'INCLUDES'
         WHEN len(b.v) = 7 AND len(a.v) = 10 AND a.v LIKE b.v || '%' THEN 'IS_INCLUDED'
         WHEN substr(a.v,1,7) < substr(b.v,1,7)
              OR (substr(a.v,1,7) = substr(b.v,1,7) AND a.v < b.v) THEN 'BEFORE'
         ELSE 'AFTER' END AS rel
  FROM vals a JOIN vals b ON a.d = b.d AND a.k < b.k
),
tt AS (
  SELECT d, src, tgt, rel FROM pairs
  UNION ALL
  SELECT d, tgt, src,
    CASE rel WHEN 'BEFORE' THEN 'AFTER' WHEN 'AFTER' THEN 'BEFORE'
             WHEN 'INCLUDES' THEN 'IS_INCLUDED'
             WHEN 'IS_INCLUDED' THEN 'INCLUDES' ELSE rel END
  FROM pairs
),
edct AS (
  SELECT d, 'e' || k AS src, 'tmx0' AS tgt,
    CASE (d + k) % 3 WHEN 0 THEN 'AFTER' WHEN 1 THEN 'INCLUDES' ELSE 'BEFORE' END AS rel
  FROM docs, (VALUES (1),(2),(3)) t(k)
),
et AS (
  SELECT d, 'e1' AS src, 'tmx1' AS tgt,
    CASE d % 6 WHEN 2 THEN 'AFTER' WHEN 3 THEN 'BEFORE'
               WHEN 4 THEN 'BEGUN_BY' ELSE 'IS_INCLUDED' END AS rel
  FROM docs
),
ee AS (
  SELECT d, 'e4' AS src, 'e5' AS tgt,
    CASE d % 2 WHEN 0 THEN 'AFTER' ELSE 'BEFORE' END AS rel FROM docs
),
eeclf AS (
  SELECT d, 'e8' AS src, 'e9' AS tgt,
    CASE d % 3 WHEN 0 THEN 'BEFORE' ELSE 'AFTER' END AS rel FROM docs
),
allrows AS (
  SELECT * FROM tt UNION ALL SELECT * FROM edct UNION ALL
  SELECT * FROM et UNION ALL SELECT * FROM ee UNION ALL SELECT * FROM eeclf
)
SELECT d AS doc_id, src AS subj, rel AS pred, tgt AS obj FROM allrows
"""

_CAUSAL_ORACLE = """
SELECT doc_id, 'e6' AS subj, 'CLINK' AS pred, 'e7' AS obj
FROM documents WHERE doc_id % 4 <> 3
"""

_TEXT_ORACLE = """
WITH docs AS (SELECT doc_id AS d FROM documents),
vals AS (
  SELECT d,
    strftime(DATE '2000-01-01' + ((d*37 + 101) % 365) * INTERVAL 1 DAY, '%Y-%m-%d') AS v1,
    strftime(DATE '2000-01-01' + ((d*37 + 202) % 365) * INTERVAL 1 DAY, '%Y-%m-%d') AS v2,
    CASE WHEN d % 5 = 0
         THEN strftime(DATE '2000-01-01' + ((d*37 + 101) % 365) * INTERVAL 1 DAY, '%Y-%m-%d')
         ELSE strftime(DATE '2000-01-01' + ((d*37 + 303) % 365) * INTERVAL 1 DAY, '%Y-%m-%d') END AS v3,
    strftime(DATE '2000-01-01' + ((d*37 + 101) % 365) * INTERVAL 1 DAY, '%Y-%m') AS v4,
    CASE d % 6 WHEN 0 THEN 'on' WHEN 1 THEN 'at' WHEN 2 THEN 'after'
               WHEN 3 THEN 'before' WHEN 4 THEN 'from' ELSE 'until' END AS prep,
    CASE d % 4 WHEN 0 THEN 'cause' WHEN 1 THEN 'prevent'
               WHEN 2 THEN 'make' ELSE 'see' END AS verb
  FROM docs
)
SELECT d AS doc_id,
  sha256('happened ' || prep || ' ' || v1 || ' and occurred near ' || v2
         || ' then vanished near ' || v3 || ' within ' || v4
         || ' . said that walked . trading ' || verb
         || 's to lose . met others arrived .') AS sha256
FROM vals
"""


def _values_oracle(rows) -> str:
    vals = ",\n".join("('%s','%s','%s','%s')" % r for r in rows)
    return ("SELECT url, subj, pred, obj FROM (VALUES\n" + vals
            + "\n) AS t(url, subj, pred, obj)")


def oracle_sql() -> dict[str, str]:
    fixture_temporal = []
    for name in fx.TEMPORAL_FIXTURES:
        fixture_temporal += fx.golden_predictions(name, "temporal")
    fixture_causal = []
    for name in fx.CAUSAL_FIXTURES:
        fixture_causal += fx.golden_predictions(name, "causal")
    return {
        "kg_temporal_triples": _TT_ORACLE,
        "kg_causal_triples": _CAUSAL_ORACLE,
        "kg_fixture_temporal": _values_oracle(fixture_temporal),
        "kg_fixture_causal": _values_oracle(fixture_causal),
        "kg_text_identity": _TEXT_ORACLE,
    }


if __name__ == "__main__":
    from eventrelationextractor_spark.spark.session import build_session
    spark = build_session(master="local[4]", shuffle_partitions=8)
    df = entry(spark)
    df.show(10, truncate=False)
    print("rows:", df.count())
