"""Property-based tests (hypothesis): robustness and invariants that the
fixture corpus cannot cover exhaustively."""

from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from eventrelationextractor_spark.core.docmodel import (FIELDS_TEXT16,
                                                        parse_txp_lines)
from eventrelationextractor_spark.core.javacompat import java_hashmap_order
from eventrelationextractor_spark.core.pipeline import (causal_triples,
                                                        temporal_triples,
                                                        timex_timex_rule_links)
from eventrelationextractor_spark.core.timegraph import filter_consistent
from eventrelationextractor_spark.core.timexrule import (inverse_relation,
                                                         timex_timex_relation)

_DATES = st.integers(min_value=0, max_value=5000).map(
    lambda d: (date(1990, 1, 1) + timedelta(days=d)).isoformat())
_MONTHS = _DATES.map(lambda s: s[:7])
_YEARS = _DATES.map(lambda s: s[:4])
_VALUES = st.one_of(_DATES, _MONTHS, _YEARS)


@given(v1=_VALUES, v2=_VALUES, dct=_DATES)
@settings(max_examples=300, deadline=None)
def test_r1_inverse_consistency_on_calendar_values(v1, v2, dct):
    """For plain calendar values the rule is direction-consistent:
    rel(a,b) == inverse(rel(b,a)). (Not universal in the reference - era
    and week edge cases are asymmetric - but it must hold on this domain.)"""
    r12 = timex_timex_relation("DATE", v1, "DATE", v2, dct)
    r21 = timex_timex_relation("DATE", v2, "DATE", v1, dct)
    assert r12 == inverse_relation(r21)


@given(v=_VALUES, dct=_DATES)
@settings(max_examples=100, deadline=None)
def test_r1_self_distinct_ids_identity(v, dct):
    assert timex_timex_relation("DATE", v, "DATE", v, dct) == "SIMULTANEOUS"
    assert timex_timex_relation("DATE", v, "DATE", v, dct,
                                identity_rel=True) == "IDENTITY"


_CELL = st.text(
    alphabet=st.characters(blacklist_characters="\t\n", max_codepoint=0x2FF),
    max_size=8)


@given(rows=st.lists(st.lists(_CELL, min_size=1, max_size=20), max_size=12))
@settings(max_examples=150, deadline=None)
def test_parser_and_pipeline_never_crash_on_fuzz(rows):
    """Arbitrary tab-separated garbage must parse into SOME DocState and
    both pipelines must run (the Java crashes on many of these; our UDF
    must not kill a 100TB job over one page)."""
    lines = ["\t".join(r) for r in rows]
    doc = parse_txp_lines(lines, FIELDS_TEXT16)
    temporal_triples(doc)
    causal_triples(doc)


@given(keys=st.lists(st.text(min_size=1, max_size=10), unique=True,
                     max_size=64))
@settings(max_examples=100, deadline=None)
def test_hashmap_order_is_permutation(keys):
    out = java_hashmap_order(keys)
    assert sorted(out) == sorted(keys)


_REL = st.sampled_from(["BEFORE", "AFTER", "INCLUDES", "IS_INCLUDED",
                        "SIMULTANEOUS", "BEGINS", "ENDS", "IBEFORE"])
_ENT = st.sampled_from(["a", "b", "c", "d", "e"])


@given(rels=st.lists(st.tuples(_ENT, _ENT, _REL), max_size=25))
@settings(max_examples=150, deadline=None)
def test_timegraph_kept_set_is_consistent(rels):
    """The filter's kept set must itself pass the filter unchanged
    (fixed point), and kept+violated partitions the input."""
    rels = [r for r in rels if r[0] != r[1]]
    kept, violated = filter_consistent(rels)
    assert len(kept) + len(violated) == len(rels)
    kept2, violated2 = filter_consistent(kept)
    assert kept2 == kept and violated2 == []


@given(n=st.integers(min_value=0, max_value=30), cap=st.integers(1, 10))
@settings(max_examples=30, deadline=None)
def test_timex_cap_bounds_pair_count(n, cap):
    """The giant-page guard bounds the tt sieve at cap timexes."""
    lines = ["DCT_2001-01-01\tO\tO\tO\tO\tO\ttmx0\tB-DATE\t2001-01-01"
             "\tO\tO\tO\tO\tO\tO\tO"]
    for i in range(n):
        d = (date(2000, 1, 1) + timedelta(days=i)).isoformat()
        lines.append("\t".join((d, f"t{i+1}", "1", "NP0", d, "O",
                                f"tmx{i+1}", "B-DATE", d, "O", "O", "O",
                                "B-NP", "O", "O", "O")))
    lines.append("\t".join((".", f"t{n+1}", "1", "PUN", ".", "O", "O", "O",
                            "O", "O", "O", "O", "O", "O", "O", "O")))
    doc = parse_txp_lines(lines, FIELDS_TEXT16)
    tt = timex_timex_rule_links(doc, max_timexes=cap)
    # closed mentions: the last timex span stays open if it is the final
    # annotated token; DCT counts toward the cap
    n_timex = sum(1 for m in doc.entities.values() if m.is_timex)
    eff = min(n_timex, cap)
    assert len(tt) <= eff * (eff - 1)  # both directions
    if n_timex > cap:
        assert doc.memo.get("tt_truncated") is True


def test_pair_slice_partitions_exactly():
    """Union of the k pair_slice outputs == unsliced output, disjointly,
    for every k - the invariant the salted repartition path relies on."""
    from eventrelationextractor_spark.core.docmodel import (FIELDS_FILE24,
                                                            parse_txp_file_text)
    from eventrelationextractor_spark.core.pipeline import \
        timex_timex_rule_links
    text = open("tests/fixtures/wsj_1014.tml.txp").read()

    def links(pair_slice=None):
        doc = parse_txp_file_text(text, FIELDS_FILE24)
        return timex_timex_rule_links(doc, pair_slice=pair_slice)

    full = links()
    for k in (1, 2, 3, 7, 1000):   # k > n_pairs: empty tail slices
        parts = [links(pair_slice=(s, k)) for s in range(k if k < 50 else 50)]
        merged = {}
        for part in parts:
            for key in part:
                assert key not in merged or part[key] == merged[key]
            merged.update(part)
        if k >= 50:  # only checked a prefix of slices
            assert set(merged) <= set(full)
        else:
            assert merged == full
