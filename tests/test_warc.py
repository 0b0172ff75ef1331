"""WARC ingestion source: roundtrip from synthetic WARC files to the
pages schema, and the full crawl path WARC -> html -> text -> triples."""

import os

from pyspark.sql import functions as F

from eventrelationextractor_spark import datagen
from eventrelationextractor_spark.ops import htmltext
from eventrelationextractor_spark.spark import warc


def _synth_warc_pages(n):
    pages = []
    for d in range(n):
        p = datagen.synth_page(d)
        pages.append((p["url"],
                      p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                      p["html"]))
    return pages


def test_parse_warc_bytes_pure():
    pages = _synth_warc_pages(3)
    data = warc.write_warc_bytes(pages)
    got = list(warc.parse_warc_bytes(data))
    assert [(u, p) for u, _, p in got] == [(u, h) for u, _, h in pages]
    # payloads survive byte-exactly even though they contain \r\n\r\n-free
    # html; a payload CONTAINING the separator must also survive (length-
    # driven parsing, not magic-scanning)
    tricky = [("https://x.test/a", "2024-01-01T00:00:00Z",
               b"body with \r\n\r\n separator and WARC/1.0 magic inside")]
    got2 = list(warc.parse_warc_bytes(warc.write_warc_bytes(tricky)))
    assert got2[0][2] == tricky[0][2]


def test_read_warc_to_pages_and_triples(spark, tmp_path):
    """Two WARC files -> pages frame -> html_to_text -> extraction equals
    the direct text-column run (the full crawl ingestion path)."""
    from eventrelationextractor_spark.spark import stages
    pages = _synth_warc_pages(8)
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "seg0.warc"), "wb") as f:
        f.write(warc.write_warc_bytes(pages[:4]))
    with open(os.path.join(d, "seg1.warc"), "wb") as f:
        f.write(warc.write_warc_bytes(pages[4:]))

    got = warc.read_warc(spark, d + "/*.warc")
    rows = {r.url: r for r in got.collect()}
    assert len(rows) == 8
    for url, ts, html in pages:
        assert bytes(rows[url].html) == html
        assert rows[url].warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ") == ts

    # end to end: WARC -> text -> triples == direct synth extraction
    recovered = htmltext.html_to_text(got).withColumn(
        "lang", F.lit("en"))
    via_warc = {tuple(r) for r in
                stages.extract_triples(recovered, mode="temporal").collect()}
    direct = {tuple(r) for r in stages.extract_triples(
        stages.synth_pages_df(spark, 8), mode="temporal").collect()}
    assert via_warc == direct and len(direct) > 0


def test_parse_wet_bytes_pure():
    from eventrelationextractor_spark.spark.warc import (parse_wet_bytes,
                                                         write_wet_bytes)
    pages = [("https://a.example/p1", "2024-01-01T00:00:00Z", "hello world"),
             ("https://a.example/p2", "2024-01-02T00:00:00Z",
              "unicode café text")]
    data = write_wet_bytes(pages)
    rows = list(parse_wet_bytes(data))
    assert rows == pages          # warcinfo skipped, text round-trips
    # WARC response records are NOT conversion records: a .warc file
    # yields nothing through the WET parser
    from eventrelationextractor_spark.spark.warc import write_warc_bytes
    assert list(parse_wet_bytes(write_warc_bytes(
        [("https://a.example/h", "2024-01-01T00:00:00Z", b"<html/>")]))) == []


def test_read_wet_feeds_text_operators(spark, tmp_path):
    from eventrelationextractor_spark.ops import textstats
    from eventrelationextractor_spark.spark.warc import (read_wet,
                                                         write_wet_bytes)
    pages = [(f"https://w.example/p{i}", "2024-03-01T12:00:00Z",
              f"the quick brown fox number {i} jumps over the lazy dog")
             for i in range(6)]
    p = tmp_path / "seg.warc.wet"
    p.write_bytes(write_wet_bytes(pages))
    df = read_wet(spark, str(p))
    assert df.count() == 6
    assert set(df.columns) == {"url", "warc_ts", "text"}
    # the WET text column feeds the text operators directly
    q = textstats.quality_score(df.withColumnRenamed("url", "doc_id"))
    assert q.filter(q.n_tokens == 11).count() == 6


def test_read_jsonl_routes_corrupt_lines(spark, tmp_path):
    from eventrelationextractor_spark.spark.jsonl import read_jsonl
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "second doc", "lang": "en"}\n'
        '{"doc_id": 3, "text": "truncated...\n'          # corrupt: cut line
        'not json at all\n'                               # corrupt: garbage
        '{"doc_id": 4, "text": "fine again", "lang": "de"}\n')
    good, bad = read_jsonl(spark, str(p),
                           "doc_id long, text string, lang string")
    g = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    assert g == {1: ("hello world", "en"), 2: ("second doc", "en"),
                 4: ("fine again", "de")}
    raws = [r.raw_line for r in bad.collect()]
    assert len(raws) == 2 and "not json at all" in raws
    # the good side feeds the text operators directly
    from eventrelationextractor_spark.ops import textstats
    assert textstats.quality_score(good).count() == 3


def test_parse_cdx_routes_corrupt_lines(spark):
    from eventrelationextractor_spark.spark import cdx
    lines = spark.createDataFrame(
        [('org,ex)/a 20240101000000 {"url": "https://ex.org/a",'
          ' "status": "200", "mime": "text/html", "digest": "D1",'
          ' "length": "10", "filename": "f.warc.gz", "offset": "5"}',),
         ("garbage without structure",),
         ('org,ex)/b 20240101000000 {"status": "200"}',)],  # no url
        "line string")
    good, bad = cdx.parse_cdx(lines)
    g = good.collect()
    assert len(g) == 1 and g[0].urlkey == "org,ex)/a"
    assert g[0].capture_ts == 20240101000000 and g[0].offset == 5
    assert bad.count() == 2


def test_select_captures_latest_and_digest_dedup(spark):
    from eventrelationextractor_spark.spark import cdx
    rows = [
        # urlkey a: two captures - later ts wins
        ("a", 20240101000000, "u", "200", "text/html", "D1", 1, "f", 1),
        ("a", 20240201000000, "u", "200", "text/html", "D1", 1, "f", 2),
        # urlkey b: same digest as a -> non-canonical (a < b)
        ("b", 20240101000000, "u", "200", "text/html", "D1", 1, "f", 3),
        # c: filtered by status; d: filtered by mime
        ("c", 20240101000000, "u", "404", "text/html", "D2", 1, "f", 4),
        ("d", 20240101000000, "u", "200", "app/pdf", "D3", 1, "f", 5),
    ]
    schema = ("urlkey string, capture_ts long, url string, status string,"
              " mime string, digest string, length long, filename string,"
              " offset long")
    out = {(r.urlkey, r.capture_ts): r.is_canonical
           for r in cdx.select_captures(
               spark.createDataFrame(rows, schema)).collect()}
    assert out == {("a", 20240201000000): True,
                   ("b", 20240101000000): False}
