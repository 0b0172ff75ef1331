"""Golden parity: our pure-Python core vs the reference engine's actual
outputs on its own bundled fixtures (see tests/golden/README.md).

These assert EXACT equality (P = R = 1.0), which is stronger than the
BASELINE.md target of P/R >= 0.95.
"""

import pytest

from eventrelationextractor_spark.core import features
from eventrelationextractor_spark.core.deps import (ee_dependency_path,
                                                    et_dependency_path,
                                                    pair_order)
from eventrelationextractor_spark.core.docmodel import (FIELDS_FILE24,
                                                        FIELDS_FILE28,
                                                        FIELDS_TEXT16,
                                                        FIELDS_TEXT18,
                                                        parse_txp_file_text,
                                                        parse_txp_lines)
from eventrelationextractor_spark.core.eventrules import event_causality_rule
from eventrelationextractor_spark.core.lexicons import load_lexicons
from eventrelationextractor_spark.core.markers import (get_causal_signal,
                                                       get_causal_verb)
from eventrelationextractor_spark.core.pipeline import (_candidate_groups,
                                                        causal_candidate_pairs,
                                                        causal_triples,
                                                        temporal_triples,
                                                        timex_timex_rule_links)
from eventrelationextractor_spark.core.timexrule import inverse_relation

from conftest import fixture_path, golden_rows


def _load_doc(name):
    if name == "sample_temporal":
        lines = open(fixture_path("sample_temporal.txp")).read().rstrip("\n").split("\n")
        return parse_txp_lines(lines, FIELDS_TEXT16)
    if name == "sample_causal":
        lines = open(fixture_path("sample_causal.txp")).read().rstrip("\n").split("\n")
        return parse_txp_lines(lines, FIELDS_TEXT18)
    layout = FIELDS_FILE28 if name.endswith("causal28") else FIELDS_FILE24
    fname = name.replace("causal28", "").rstrip("_") or name
    return parse_txp_file_text(open(fixture_path(fname + ".tml.txp")).read(), layout)


@pytest.mark.parametrize("doc_name,golden", [
    ("sample_temporal", "sample_temporal_predictions.tsv"),
    ("bbc_20130322_721", "bbc_20130322_721_temporal_predictions.tsv"),
    ("wsj_1014", "wsj_1014_temporal_predictions.tsv"),
])
def test_temporal_predictions_exact(doc_name, golden):
    doc = _load_doc(doc_name)
    mine = {(t.source, t.target, t.rel) for t in temporal_triples(doc)}
    gold = set(golden_rows(golden))
    assert mine == gold


@pytest.mark.parametrize("doc_name,golden", [
    ("bbc_20130322_721", "bbc_20130322_721_ttlinks.tsv"),
    ("wsj_1014", "wsj_1014_ttlinks.tsv"),
])
def test_ttlinks_exact(doc_name, golden):
    doc = _load_doc(doc_name)
    tt = timex_timex_rule_links(doc)
    mine = {(a + "\t" + b, rel) for (a, b), rel in tt.items()}
    gold = {(r[0] + "\t" + r[1], r[2]) for r in golden_rows(golden)}
    assert mine == gold


def test_causal_predictions_sample():
    doc = _load_doc("sample_causal")
    mine = {(t.source, t.target, t.rel)
            for t in causal_triples(doc, {"e39,e41": "BEFORE"})}
    assert mine == set(golden_rows("sample_causal_predictions.tsv"))


def test_causal_predictions_wsj():
    doc = _load_doc("wsj_1014_causal28")
    mine = {(t.source, t.target, t.rel) for t in causal_triples(doc)}
    assert mine == set(golden_rows("wsj_1014_causal_predictions.tsv"))


@pytest.mark.parametrize("doc_name,prefix", [
    ("sample_temporal", "sample"),
    ("bbc_20130322_721", "bbc_20130322_721"),
    ("wsj_1014", "wsj_1014"),
])
def test_feature_vectors_and_dep_paths_bitexact(doc_name, prefix):
    doc = _load_doc(doc_name)
    lx = load_lexicons()
    dct_pairs, et_pairs, ee_pairs = _candidate_groups(doc)
    groups = {
        "dct": (dct_pairs, lambda e1, e2, lb: features.et_vector(doc, e1, e2, lb, False),
                lambda e1, e2: et_dependency_path(doc, e1, e2)),
        "et": (et_pairs, lambda e1, e2, lb: features.et_vector(doc, e1, e2, lb, False),
               lambda e1, e2: et_dependency_path(doc, e1, e2)),
        "ee": (ee_pairs, lambda e1, e2, lb: features.ee_vector(doc, e1, e2, lb, lx),
               lambda e1, e2: ee_dependency_path(doc, e1, e2)),
    }
    for tag, (pairs, build, dep_fn) in groups.items():
        gold = {}
        for row in golden_rows(f"{prefix}_{tag}_vectors.tsv"):
            gold[(row[0], row[1])] = (row[3], [float(x) for x in row[4].split(",")])
        assert len(gold) == len(pairs)
        for e1, e2, label in pairs:
            gdep, gvec = gold[(e1.mid, e2.mid)]
            assert dep_fn(e1, e2) == gdep, (tag, e1.mid, e2.mid)
            mine = build(e1, e2, label)
            assert mine == pytest.approx(gvec), (tag, e1.mid, e2.mid)


def test_causal_vectors_bitexact():
    doc = _load_doc("wsj_1014_causal28")
    lx = load_lexicons()
    gold = {}
    for row in golden_rows("wsj_1014_causal_vectors.tsv"):
        gold[(row[0], row[1])] = [float(x) for x in row[3].split(",")]
    mine = {}
    for pair, gold_label in causal_candidate_pairs(doc, lx):
        src, tgt = pair.split(",")
        e1, e2 = doc.entities[src], doc.entities[tgt]
        o1, o2, ol = e1, e2, gold_label
        if pair_order(doc, e1, e2) == "AFTER":
            o1, o2, ol = e2, e1, inverse_relation(gold_label)
        m = get_causal_verb(doc, o1, o2, lx)
        if event_causality_rule(m, o1.sent_id == o2.sent_id) != "O":
            continue
        tl = "O"
        if src + "," + tgt in doc.tlink_types:
            tl = doc.tlink_types[src + "," + tgt]
        elif tgt + "," + src in doc.tlink_types:
            tl = inverse_relation(doc.tlink_types[tgt + "," + src])
        row = features.causal_vector(doc, o1, o2, ol, lx, tl)
        g = get_causal_signal(doc, e1, e2, lx)
        if (g.dep1 or "O") + "|" + (g.dep2 or "O") != "O|O":
            mine[(o1.mid, o2.mid)] = row
    assert set(mine) == set(gold)
    for k, v in mine.items():
        assert v == pytest.approx(gold[k]), k
