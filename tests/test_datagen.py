"""The synthetic corpus's closed-form oracle must equal the real pipeline."""

from eventrelationextractor_spark.core.docmodel import (FIELDS_TEXT16,
                                                        parse_txp_lines)
from eventrelationextractor_spark.core.pipeline import (causal_triples,
                                                        temporal_triples)
from eventrelationextractor_spark.datagen import (expected_causal_triples,
                                                  expected_temporal_triples,
                                                  synth_txp_lines)


def test_synth_corpus_matches_closed_form():
    for d in list(range(40)) + [97, 360, 1001]:
        doc = parse_txp_lines(synth_txp_lines(d), FIELDS_TEXT16)
        mine = {(t.source, t.target, t.rel) for t in temporal_triples(doc)}
        assert mine == set(expected_temporal_triples(d)), d
        cm = {(t.source, t.target, t.rel) for t in causal_triples(doc)}
        assert cm == set(expected_causal_triples(d)), d


def test_synth_doc_shape():
    doc = parse_txp_lines(synth_txp_lines(0), FIELDS_TEXT16)
    assert len(doc.sentences) == 4
    assert {m for m in doc.entities} == {
        "tmx0", "tmx1", "tmx2", "tmx3", "tmx4",
        "e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8", "e9"}
    assert doc.dct is not None and doc.dct.is_dct


def _ref_golden(name):
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    out = {}
    with open(os.path.join(here, "golden", name)) as f:
        for line in f:
            fname, s, t, r = line.rstrip("\n").split("\t")
            out.setdefault(int(fname[3:6]), set()).add((s, t, r))
    return out


def test_synth_corpus_matches_compiled_reference():
    """The COMPILED REFERENCE was run on 30 synthetic documents
    (tests/golden/synth_*_predictions.tsv); its output must equal the
    closed-form oracle - which ties the driver's DuckDB correctness gate
    to the reference engine itself, not merely to our own pipeline."""
    ref_t = _ref_golden("synth_temporal_predictions.tsv")
    ref_c = _ref_golden("synth_causal_predictions.tsv")
    for d in range(30):
        assert ref_t.get(d, set()) == set(expected_temporal_triples(d)), d
        assert ref_c.get(d, set()) == set(expected_causal_triples(d)), d
