"""TempEval-3 temporal-awareness metric: core.awareness vs the
reference's OWN evaluation tool (temporal_evaluation.py +
relation_to_timegraph.py), run by tools/make_awareness_golden.py on
fixture + synthetic + hand-built gold/system tlink sets; only the
tool's outputs are vendored (tests/golden/awareness_*.tsv).

Default (exact-closure) engine: 11 of 12 cases match the tool
bit-for-bit (every count and float). The 12th (wsj_1014, 364 evaluated
relations) diverges on exactly ONE relation - (e64, tmx394,
IS_INCLUDED) - which the repo's exact point-algebra closure derives as
redundant at insertion time while the reference's chain-based timegraph
(bounded cross-chain traversal) fails to derive it and keeps it; the
scores there agree to ~1e-3. The divergence direction is the tool's
known derivation incompleteness, not a missing inference in the port.

tool_compat=True (core.tooltimegraph - a port of the tool's own
chain/pseudotime engine, incompleteness included) matches the tool on
ALL 12 cases bit-for-bit, and on randomized relation streams scored by
the actual 2to3'd tool in-process (fuzz test below)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from eventrelationextractor_spark.core.awareness import (  # noqa: E402
    reduce_relations, temporal_awareness)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

EXACT_TOL = 1e-12
WSJ_TOL = 5e-3          # the single known one-relation divergence


def _cases():
    from make_awareness_golden import cases
    return cases()


def _golden_scores():
    out = {}
    with open(os.path.join(GOLDEN, "awareness_scores.tsv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            g = line.rstrip("\n").split("\t")
            out[g[0]] = ([int(v) for v in g[1:7]],
                         [float(v) for v in g[7:10]])
    return out


def test_awareness_matches_reference_tool():
    golden = _golden_scores()
    cases = _cases()
    assert set(golden) == set(cases) and len(golden) == 12
    exact = 0
    for case, (gold, system) in sorted(cases.items()):
        m = temporal_awareness(gold, system)
        counts, floats = golden[case]
        got_counts = [m["prec_matched"], m["rec_matched"],
                      m["rec_implicit"], m["n"], m["sys_total"],
                      m["gold_total"]]
        got_floats = [m["precision"], m["recall"], m["f1"]]
        if case == "wsj_1014":
            # one-relation divergence (see module docstring): totals off
            # by exactly one kept-vs-redundant flip, scores within 5e-3
            assert abs(got_counts[4] - counts[4]) <= 1
            assert all(abs(a - b) < WSJ_TOL
                       for a, b in zip(got_floats, floats)), (case, m)
            continue
        assert got_counts == counts, (case, got_counts, counts)
        assert all(abs(a - b) < EXACT_TOL
                   for a, b in zip(got_floats, floats)), (case, m)
        exact += 1
    assert exact == 11


def test_reduced_lists_match_reference_tool():
    """The kept+violated ('final') relation lists the tool evaluates
    must equal the port's, per case and side - exact multiset equality
    everywhere except the single adjudicated wsj_1014 relation."""
    from collections import Counter
    ref = {}
    with open(os.path.join(GOLDEN, "awareness_reduced.tsv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            c, side, x, y, r = line.rstrip("\n").split("\t")
            ref.setdefault((c, side), Counter())[(x, y, r)] += 1
    for case, (gold, system) in sorted(_cases().items()):
        for side, rels in (("gold", gold), ("system", system)):
            mine = Counter((x, y, r) for x, y, r in
                           reduce_relations(rels).final)
            want = ref.get((case, side), Counter())
            diff_plus = want - mine
            diff_minus = mine - want
            if case == "wsj_1014" and side == "system":
                assert dict(diff_plus) == {
                    ("e64", "tmx394", "IS_INCLUDED"): 1}
                assert not diff_minus
            else:
                assert not diff_plus and not diff_minus, (
                    case, side, diff_plus, diff_minus)


def test_awareness_sanity_properties():
    """Structural sanity independent of goldens."""
    base = [("a", "b", "BEFORE"), ("b", "c", "BEFORE")]
    perfect = temporal_awareness(base, list(base))
    assert perfect["precision"] == perfect["recall"] == perfect["f1"] == 1.0
    # closure credit: system asserting only the implied a<c still gets
    # precision 1.0 (it is entailed by gold)
    implied = temporal_awareness(base, [("a", "c", "BEFORE")])
    assert implied["precision"] == 1.0 and 0 < implied["recall"] < 1
    empty = temporal_awareness(base, [])
    assert empty["precision"] == 0 and empty["recall"] == 0


def test_spark_awareness_matches_core(spark):
    """The cogroup/applyInPandas distributed scorer equals the core
    scorer per document (fixture system-vs-gold + synthetic docs)."""
    from eventrelationextractor_spark.spark.evaluate import awareness_scores
    rows_g, rows_s, want = [], [], {}
    for case, (gold, system) in sorted(_cases().items()):
        m = temporal_awareness(sorted(gold), sorted(system))
        want[case] = (round(m["precision"], 9), round(m["recall"], 9),
                      round(m["f1"], 9))
        rows_g += [(case, x, y, r) for x, y, r in gold]
        rows_s += [(case, x, y, r) for x, y, r in system]
    schema = "url string, src string, tgt string, rel string"
    got = {r.url: (round(r.precision, 9), round(r.recall, 9),
                   round(r.f1, 9))
           for r in awareness_scores(
               spark.createDataFrame(rows_g, schema),
               spark.createDataFrame(rows_s, schema)).collect()}
    assert got == want


def test_spark_awareness_shared_lineage_full_collect(spark):
    """Regression: when gold and pred derive from the SAME parent frame
    (pred = filter/perturbation of gold - the kg_awareness shape), the
    old groupBy.cogroup(groupBy) formulation hit a Spark 4.1 attribute-
    dedup mis-plan that pruned the pred side's data columns: a FULL
    collect returned sys_total=0 / precision=0 for every document while
    a filtered collect looked fine. The tag-union-split rewrite must
    score the pred side on a full collect."""
    from pyspark.sql import functions as F

    from eventrelationextractor_spark.spark.evaluate import awareness_scores
    rows = [(str(u), f"e{i}", f"e{i+1}", "BEFORE")
            for u in range(40) for i in range(4)]
    gold = spark.createDataFrame(
        rows, "url string, src string, tgt string, rel string") \
        .localCheckpoint()
    pred = gold.filter(~((F.col("url").cast("long") % 3 == 0)
                         & (F.col("src") == "e1")))
    out = awareness_scores(gold, pred).collect()
    assert len(out) == 40
    assert all(r.sys_total > 0 for r in out)
    assert {r.url for r in out if r.recall < 1.0} \
        == {str(u) for u in range(0, 40, 3)}


def test_tool_compat_12_of_12_bit_exact():
    """tool_compat=True reproduces the reference tool verdict-for-verdict
    on ALL 12 golden cases - including wsj_1014, whose one derivable-but-
    tool-missed IS_INCLUDED the exact default engine adjudicates. Every
    count and float is compared at 1e-12 (the floats are pure functions
    of the integer counts, so this is bit-exactness)."""
    golden = _golden_scores()
    for case, (gold, system) in sorted(_cases().items()):
        m = temporal_awareness(gold, system, tool_compat=True)
        counts = [m["prec_matched"], m["rec_matched"], m["rec_implicit"],
                  m["n"], m["sys_total"], m["gold_total"]]
        floats = [m["precision"], m["recall"], m["f1"]]
        gc, gf = golden[case]
        assert counts == gc, (case, counts, gc)
        assert all(abs(a - b) < EXACT_TOL for a, b in zip(floats, gf)), \
            (case, floats, gf)


def test_tool_compat_fuzz_vs_real_tool():
    """Randomized parity: 60 random gold/system relation streams over
    the full TimeML vocabulary (plus self-pairs) scored by the ACTUAL
    reference tool (2to3'd in a scratch dir) and by tool_compat - every
    intermediate count must match. Skipped when the reference tool or
    2to3 is unavailable."""
    import random

    import pytest
    try:
        from make_awareness_golden import load_tools, tlink_text
        rtt, tev = load_tools()
    except Exception as exc:          # no tool / no 2to3
        pytest.skip(f"reference tool unavailable: {exc}")

    rels = ["BEFORE", "AFTER", "INCLUDES", "IS_INCLUDED", "SIMULTANEOUS",
            "IDENTITY", "IBEFORE", "IAFTER", "BEGINS", "BEGUN_BY",
            "ENDS", "ENDED_BY", "DURING", "DURING_INV"]
    rng = random.Random(20260818)

    def tool_counts(case, gold, system):
        gold_text = rtt.change_DURING_relation(tlink_text(case, gold))
        sys_text = rtt.change_DURING_relation(tlink_text(case, system))
        tg_gold, tg_system = tev.get_timegraphs(gold_text, sys_text)
        pm = tev.total_relation_matched(
            tg_system.final_relations, tg_gold.final_relations,
            tev.get_triples(gold_text), tg_gold)
        rm = tev.total_relation_matched(
            tg_gold.final_relations, tg_system.final_relations,
            tev.get_triples(sys_text), tg_system)
        ri = tev.total_implicit_matched(
            tg_system.final_relations, tg_gold.final_relations, tg_gold)
        n = tev.get_common_n(tg_gold.final_relations,
                             tg_system.final_relations)
        return (pm, rm, ri, n,
                len(tg_system.final_relations.split("\n")) - 1,
                len(tg_gold.final_relations.split("\n")) - 1)

    for trial in range(60):
        ents = [f"e{i}" for i in range(rng.randint(2, 8))] + ["t0", "t1"]

        def rand_rels(k):
            out = []
            for _ in range(k):
                if rng.random() > 0.05:
                    a, b = rng.sample(ents, 2)
                else:
                    a = b = rng.choice(ents)
                out.append((a, b, rng.choice(rels)))
            return out

        gold = rand_rels(rng.randint(1, 12))
        system = rand_rels(rng.randint(1, 12))
        want = tool_counts(f"f{trial}", gold, system)
        m = temporal_awareness(gold, system, tool_compat=True)
        got = (m["prec_matched"], m["rec_matched"], m["rec_implicit"],
               m["n"], m["sys_total"], m["gold_total"])
        assert got == want, (trial, gold, system, got, want)
