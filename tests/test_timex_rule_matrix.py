"""Exhaustive R1 parity: a 33x33x2 matrix of TIMEX3 value pairs (dates,
months, years, ISO weeks, quarters, decades, centuries, era refs,
times-of-day, part-of-day, durations, X-patterns) dumped through the
compiled reference's TimexTimexRelationRule (tests/golden/README.md).
Covers every branch of the 654-LoC value micro-language, including the
java.util.Calendar ISO-week window expansion."""

from eventrelationextractor_spark.core.timexrule import timex_timex_relation

from conftest import golden_rows


def test_timex_rule_full_matrix_parity():
    rows = golden_rows("timex_rule_matrix.tsv")
    assert len(rows) == 2178
    mismatches = []
    for dct, ty1, v1, ty2, v2, rel in rows:
        if rel.startswith("JAVA_ERROR"):
            continue
        mine = timex_timex_relation(ty1, v1, ty2, v2, dct)
        if mine != rel:
            mismatches.append((dct, ty1, v1, ty2, v2, rel, mine))
    assert mismatches == []
