"""Generate TempEval-3 temporal-awareness goldens by RUNNING the
reference's own evaluation tool (temporal_evaluation.py +
relation_to_timegraph.py - the scorer the reference's TimeGraph.java
drives) on gold/system tlink sets built from the repo's fixtures and
synthetic corpus. Only the tool's OUTPUT is vendored
(tests/golden/awareness_scores.tsv + awareness_reduced.tsv); scratch
2to3 conversion as in make_timegraph_golden.py.

Per case the harness replicates temporal_evaluation.
evaluate_two_files_implicit_in_recall from tlink TEXT (bypassing only
the TimeML file parsing) and records every intermediate: the reduced
(final) relation lists of both sides, prec/rec matched counts, the
implicit-recall term, and P/R/F1.

Run: python tools/make_awareness_golden.py
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOOLDIR = ("/root/reference/tools/TempEval3-evaluation-tool/"
           "evaluation-relations")


def load_tools():
    scratch = tempfile.mkdtemp(prefix="te3_tool_")
    for fname in ("relation_to_timegraph.py", "temporal_evaluation.py"):
        dst = os.path.join(scratch, fname)
        shutil.copy(os.path.join(TOOLDIR, fname), dst)
        subprocess.run(["2to3", "-w", "-n", "--no-diffs", dst],
                       check=True, capture_output=True)
        with open(dst) as f:
            src = f.read()
        src = src.replace(")/2", ")//2").replace(")/3", ")//3") \
                 .replace(")*2/3", ")*2//3")
        with open(dst, "w") as f:
            f.write(src)
    sys.path.insert(0, scratch)
    spec = importlib.util.spec_from_file_location(
        "relation_to_timegraph",
        os.path.join(scratch, "relation_to_timegraph.py"))
    rtt = importlib.util.module_from_spec(spec)
    sys.modules["relation_to_timegraph"] = rtt
    spec.loader.exec_module(rtt)
    argv_save = sys.argv
    sys.argv = [os.path.join(scratch, "temporal_evaluation.py"),
                "gold", "system", "0"]
    spec2 = importlib.util.spec_from_file_location(
        "temporal_evaluation", os.path.join(scratch,
                                            "temporal_evaluation.py"))
    tev = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(tev)
    sys.argv = argv_save
    return rtt, tev


def cases() -> dict:
    """case -> (gold [(x, y, rel)], system [(x, y, rel)])."""
    from eventrelationextractor_spark import fixtures as fx
    from eventrelationextractor_spark.core.lexicons import load_lexicons
    from eventrelationextractor_spark.core.pipeline import (_candidate_groups,
                                                            temporal_triples)
    from eventrelationextractor_spark.datagen import (
        expected_temporal_triples, synth_page)
    from eventrelationextractor_spark.spark.stages import parse_page

    lx = load_lexicons()
    out = {}
    for name, page in zip(fx.TEMPORAL_FIXTURES,
                          fx.fixture_pages(fx.TEMPORAL_FIXTURES)):
        doc = parse_page(page["text"], name)
        d, e, ee = _candidate_groups(doc)
        gold = [(e1.mid, e2.mid, lb) for e1, e2, lb in d + e + ee
                if lb not in ("NONE", "O", "")]
        system = sorted((t.source, t.target, t.rel)
                        for t in temporal_triples(doc, lx))
        out[name] = (gold, system)
    for d in range(4):
        doc = parse_page(synth_page(d)["text"], f"s{d}")
        system = sorted((t.source, t.target, t.rel)
                        for t in temporal_triples(doc, lx))
        gold = list(expected_temporal_triples(d))  # (src, tgt, rel)
        out[f"synth{d}"] = (gold, system)
    # hand cases: identical, subset-system, spurious-system, disjoint
    base = [("e1", "e2", "BEFORE"), ("e2", "e3", "BEFORE"),
            ("t1", "e1", "INCLUDES"), ("e3", "e4", "SIMULTANEOUS")]
    out["hand_identical"] = (base, list(base))
    out["hand_subset"] = (base, base[:2])
    out["hand_spurious"] = (base, base + [("e9", "e8", "AFTER")])
    out["hand_implied"] = (base, [("e1", "e3", "BEFORE")])  # closure-only
    out["hand_conflict"] = (base, [("e2", "e1", "BEFORE")])
    return out


def tlink_text(name, rels) -> str:
    # NO weight column: temporal_evaluation.get_relations emits exactly
    # "name\tX\tY\trel" lines; adding extra columns shifts the tool's
    # text-match column arithmetic (get_entity_rel) and changes scores.
    return "".join(f"{name}\t{x}\t{y}\t{r}\n" for x, y, r in rels)


def main() -> None:
    rtt, tev = load_tools()
    score_rows, reduced_rows = [], []
    for case, (gold, system) in sorted(cases().items()):
        gold_text = rtt.change_DURING_relation(tlink_text(case, gold))
        sys_text = rtt.change_DURING_relation(tlink_text(case, system))
        tg_gold, tg_system = tev.get_timegraphs(gold_text, sys_text)
        gold_rel_text = tev.get_triples(gold_text)
        sys_rel_text = tev.get_triples(sys_text)
        prec_matched = tev.total_relation_matched(
            tg_system.final_relations, tg_gold.final_relations,
            gold_rel_text, tg_gold)
        rec_matched = tev.total_relation_matched(
            tg_gold.final_relations, tg_system.final_relations,
            sys_rel_text, tg_system)
        rec_implicit = tev.total_implicit_matched(
            tg_system.final_relations, tg_gold.final_relations, tg_gold)
        n = tev.get_common_n(tg_gold.final_relations,
                             tg_system.final_relations)
        ref_plus = 0.5 * n * (n - 1)
        w = 0.99 / (1 + ref_plus - rec_matched)
        sys_total = len(tg_system.final_relations.split("\n")) - 1
        gold_total = len(tg_gold.final_relations.split("\n")) - 1
        precision = prec_matched * 1.0 / sys_total if sys_total > 0 else 0
        recall = ((rec_matched + w * rec_implicit) * 1.0 / gold_total
                  if gold_total > 0 else 0)
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall > 0 else 0.0)
        score_rows.append((case, prec_matched, rec_matched, rec_implicit,
                           n, sys_total, gold_total,
                           repr(precision), repr(recall), repr(f1)))
        for side, tg in (("gold", tg_gold), ("system", tg_system)):
            for line in tg.final_relations.split("\n"):
                w4 = line.split("\t")
                if len(w4) >= 4:
                    reduced_rows.append((case, side, w4[1], w4[2], w4[3]))
    with open(os.path.join(REPO, "tests", "golden",
                           "awareness_scores.tsv"), "w") as f:
        f.write("# case prec_matched rec_matched rec_implicit n sys_total"
                " gold_total precision recall f1\n")
        for row in score_rows:
            f.write("\t".join(str(v) for v in row) + "\n")
    with open(os.path.join(REPO, "tests", "golden",
                           "awareness_reduced.tsv"), "w") as f:
        f.write("# case side x y rel - the tool's reduced"
                " (final+violated) relation lists\n")
        for row in reduced_rows:
            f.write("\t".join(row) + "\n")
    print(f"wrote {len(score_rows)} score rows, "
          f"{len(reduced_rows)} reduced rows")


if __name__ == "__main__":
    main()
