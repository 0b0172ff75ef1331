"""Line-level deduplication for crawl corpora (C4 / RefinedWeb style).

Document-level dedup (ops/dedup.py) removes whole near-identical pages;
what it cannot touch is *boilerplate* — navigation headers, cookie
banners, footers — that repeats across thousands of otherwise-unique
pages and dominates token counts at crawl scale. C4 dropped any line
occurring >= 3 times in the corpus; RefinedWeb and Gopher apply the same
idea per-line / per-paragraph. No counterpart in /root/reference (TXP
input is pre-cleaned newswire); north-star addition.

Scale design (100 TB):
* The line table is posexplode(split(text)) — linear, no shuffle.
* ``line_doc_freq`` is ONE map-side-combinable aggregation keyed on the
  line text (Spark shuffles by the string's hash; at production scale
  key on (xxhash64(line), line) so partitioners compare 8 bytes — noted,
  not needed for correctness).
* ``drop_boilerplate_lines`` re-joins the (tiny relative to the corpus:
  only lines ABOVE the threshold need shipping) frequency table as a
  LEFT ANTI join, then reassembles documents with one groupBy on the
  doc id — aggregation order is made deterministic by sorting the
  (pos, line) structs, NOT by relying on shuffle order.
* ``dedup_lines_keep_first`` needs the global first occurrence per line:
  one window (min struct(doc, pos) over line) — a single shuffle on the
  line key — then the same reassembly.
Three shuffles end-to-end, each on a different natural key; nothing
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))


def _reassemble(lines: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """(id, pos, line) -> (id, text, n_lines_kept); order restored by
    sorting structs, so the plan is shuffle-order-independent."""
    return (lines
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "line")))
                 .alias("sl"))
            .select(id_col,
                    F.concat_ws(
                        "\n", F.transform(F.col("sl"), lambda s: s.line))
                    .alias(text_col),
                    F.size("sl").alias("n_lines_kept")))


def line_doc_freq(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(line, n_docs, n_occurrences) over the corpus — the profile table
    a boilerplate pass is driven by."""
    return (_lines(df, text_col, id_col)
            .groupBy("line")
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences")))


def drop_boilerplate_lines(df: DataFrame, max_doc_freq: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Remove every line that appears in more than ``max_doc_freq``
    distinct documents (C4 used 2, i.e. drop lines seen >= 3 times);
    documents are reassembled in original line order. Documents whose
    every line is boilerplate survive with empty text (n_lines_kept
    counts the survivors)."""
    lines = _lines(df, text_col, id_col)
    hot = (line_doc_freq(df, text_col, id_col)
           .filter(F.col("n_docs") > max_doc_freq)
           .select("line"))
    kept = lines.join(hot, "line", "left_anti")
    out = _reassemble(kept, id_col, text_col)
    # left join back so fully-boilerplate docs keep a row (empty text)
    return (df.select(id_col)
            .join(out, id_col, "left")
            .select(id_col,
                    F.coalesce(text_col, F.lit("")).alias(text_col),
                    F.coalesce("n_lines_kept", F.lit(0))
                    .alias("n_lines_kept")))


def dedup_lines_keep_first(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Global exact line dedup, first occurrence wins: a line is kept only
    at its smallest (doc_id, pos); later copies are removed. The id must
    be orderable (the synthetic corpus uses the numeric doc id; a crawl
    run uses (crawl_ts, url))."""
    lines = _lines(df, text_col, id_col)
    w = Window.partitionBy("line")
    first = F.min(F.struct(F.col(id_col), F.col("pos"))).over(w)
    kept = (lines
            .withColumn("f", first)
            .filter((F.col("f")[id_col] == F.col(id_col))
                    & (F.col("f")["pos"] == F.col("pos")))
            .drop("f"))
    out = _reassemble(kept, id_col, text_col)
    return (df.select(id_col)
            .join(out, id_col, "left")
            .select(id_col,
                    F.coalesce(text_col, F.lit("")).alias(text_col),
                    F.coalesce("n_lines_kept", F.lit(0))
                    .alias("n_lines_kept")))
