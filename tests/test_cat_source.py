"""CAT XML source (spark/cat.py): typed from_xml parse, the
convertCATToColumns column layout, the CAT<->TimeML round trip, and
malformed-input robustness. The reference ships only CLI wrappers for
these conversions (src/parser/convertCATToColumns.py:1-75 + siblings;
the `converter` package itself and CATParser.java are absent/empty),
so the semantics here are pinned against the public Causal-TimeBank
CAT format by construction."""

from eventrelationextractor_spark.spark import cat

XML = (
    '<Document doc_name="d1.xml">'
    '<token t_id="1" sentence="1" number="1">The</token>'
    '<token t_id="2" sentence="1" number="2">quake</token>'
    '<token t_id="3" sentence="1" number="3">struck</token>'
    '<token t_id="4" sentence="2" number="1">last</token>'
    '<token t_id="5" sentence="2" number="2">Tuesday</token>'
    '<Markables>'
    '<EVENT m_id="100" class="OCCURRENCE" eid="e1">'
    '<token_anchor t_id="3"/></EVENT>'
    '<TIMEX3 m_id="200" type="DATE" value="2024-01-02" tid="t1">'
    '<token_anchor t_id="4"/><token_anchor t_id="5"/></TIMEX3>'
    '<C-SIGNAL m_id="300"><token_anchor t_id="1"/></C-SIGNAL>'
    '</Markables>'
    '<Relations>'
    '<TLINK r_id="400" relType="BEFORE">'
    '<source m_id="100"/><target m_id="200"/></TLINK>'
    '<CLINK r_id="401"><source m_id="100"/><target m_id="200"/></CLINK>'
    '</Relations></Document>')


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, xml string")


def test_cat_layers_parse(spark):
    df = _df(spark, [(1, XML)])
    parsed = cat.parse_cat(df)
    toks = {r.t_id: r for r in cat.cat_tokens(parsed).collect()}
    assert len(toks) == 5
    assert (toks[2].token, toks[2].sent_id, toks[2].number) == ("quake", 1, 2)
    marks = {r.m_id: r for r in cat.cat_markables(parsed).collect()}
    assert marks[100].mtype == "EVENT" and marks[100].cls == "OCCURRENCE"
    assert marks[200].t_ids == [4, 5]
    assert marks[300].mtype == "C-SIGNAL"
    rels = {r.r_id: r for r in cat.cat_relations(parsed).collect()}
    assert rels[400].rel_type == "BEFORE"
    assert (rels[401].rtype, rels[401].rel_type) == ("CLINK", "CAUSE")
    assert (rels[401].source_m, rels[401].target_m) == (100, 200)


def test_cat_to_columns_labels(spark):
    got = {r.t_id: r for r in
           cat.cat_to_columns(_df(spark, [(1, XML)])).collect()}
    assert [got[i].ev for i in range(1, 6)] == ["O", "O", "e100", "O", "O"]
    assert [got[i].tmx for i in range(1, 6)] == \
        ["O", "O", "O", "t200", "t200"]
    assert got[1].sig == "s300" and got[2].sig == "O"


def test_cat_to_columns_overlap_pins_smallest_m_id(spark):
    xml = ('<Document doc_name="x"><token t_id="1" sentence="1" '
           'number="1">w</token><Markables>'
           '<EVENT m_id="9" class="STATE"><token_anchor t_id="1"/></EVENT>'
           '<EVENT m_id="4" class="STATE"><token_anchor t_id="1"/></EVENT>'
           '</Markables><Relations></Relations></Document>')
    got = cat.cat_to_columns(_df(spark, [(1, xml)])).collect()
    assert got[0].ev == "e4"


def test_cat_timeml_roundtrip_preserves_annotation(spark):
    """CAT -> TimeML -> CAT -> columns: tokens, EVENT/TIMEX3 spans and
    relation layers survive; sentence ids collapse to 1 with running
    numbers and C-SIGNALs drop (TimeML has no inline C-SIGNAL) — the
    documented lossy axes of the TimeML leg."""
    df = _df(spark, [(1, XML)])
    back = cat.timeml_to_cat(cat.cat_to_timeml(df))
    cols = {r.t_id: r for r in cat.cat_to_columns(back).collect()}
    assert [cols[i].token for i in range(1, 6)] == \
        ["The", "quake", "struck", "last", "Tuesday"]
    assert [cols[i].ev for i in range(1, 6)] == \
        ["O", "O", "e100", "O", "O"]
    assert [cols[i].tmx for i in range(1, 6)] == \
        ["O", "O", "O", "t200", "t200"]          # multi-token span kept
    assert all(cols[i].sent_id == 1 and cols[i].number == i
               for i in range(1, 6))
    rels = {r.r_id: r for r in
            cat.cat_relations(cat.parse_cat(back)).collect()}
    assert rels[400].rel_type == "BEFORE" and rels[401].rtype == "CLINK"


def test_cat_malformed_and_empty_inputs(spark):
    rows = [(1, XML),
            (2, "<Document doc_name='e'><Markables></Markables>"
                "<Relations></Relations></Document>"),   # no tokens
            (3, "not xml at all <<<")]
    cols = cat.cat_to_columns(_df(spark, rows))
    got = cols.groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in got} == {1: 5}
    # malformed/tokenless docs contribute zero rows, never a crash
    marks = cat.cat_markables(cat.parse_cat(_df(spark, rows)))
    assert marks.filter("doc_id > 1").count() == 0
