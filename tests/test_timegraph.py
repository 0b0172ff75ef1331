from eventrelationextractor_spark.core.timegraph import filter_consistent


def test_consistent_chain_kept():
    rels = [("a", "b", "BEFORE"), ("b", "c", "BEFORE"), ("a", "c", "BEFORE")]
    kept, violated = filter_consistent(rels)
    assert kept == rels and violated == []


def test_cycle_dropped():
    rels = [("a", "b", "BEFORE"), ("b", "c", "BEFORE"), ("c", "a", "BEFORE")]
    kept, violated = filter_consistent(rels)
    assert violated == [("c", "a", "BEFORE")]


def test_simultaneous_merges_and_conflicts():
    rels = [("a", "b", "SIMULTANEOUS"), ("a", "b", "BEFORE")]
    kept, violated = filter_consistent(rels)
    assert kept == [("a", "b", "SIMULTANEOUS")]
    assert violated == [("a", "b", "BEFORE")]


def test_includes_vs_before_conflict():
    # a INCLUDES b and b BEFORE a cannot both hold
    rels = [("a", "b", "INCLUDES"), ("b", "a", "BEFORE")]
    kept, violated = filter_consistent(rels)
    assert kept == [("a", "b", "INCLUDES")]
    assert violated == [("b", "a", "BEFORE")]


def test_first_wins_order_dependence():
    rels = [("b", "a", "BEFORE"), ("a", "b", "INCLUDES")]
    kept, violated = filter_consistent(rels)
    assert kept == [("b", "a", "BEFORE")]
    assert violated == [("a", "b", "INCLUDES")]


def test_begins_ends_semantics():
    # a BEGINS b (same start, a ends first); then a AFTER b is impossible
    kept, violated = filter_consistent(
        [("a", "b", "BEGINS"), ("a", "b", "AFTER")])
    assert violated == [("a", "b", "AFTER")]
    # but c BEFORE a plus a BEGINS b stays consistent
    kept, violated = filter_consistent(
        [("a", "b", "BEGINS"), ("c", "a", "BEFORE"), ("c", "b", "BEFORE")])
    assert violated == []


def test_during_treated_as_simultaneous():
    kept, violated = filter_consistent(
        [("a", "b", "DURING"), ("a", "b", "BEFORE")])
    assert violated == [("a", "b", "BEFORE")]


def test_causal_labels_pass_through():
    rels = [("a", "b", "CLINK"), ("a", "b", "BEFORE"), ("b", "a", "CLINK-R")]
    kept, violated = filter_consistent(rels)
    assert set(kept) == set(rels) and violated == []


def test_rollback_of_partial_constraints():
    # INCLUDES adds two constraints; the second fails here, and the first
    # (s_a < s_b) must not survive, so s_b < s_a stays addable.
    rels = [("a", "b", "BEGUN_BY"),      # s_a = s_b, e_b < e_a
            ("b", "a", "INCLUDES"),      # s_b < s_a (!) -> violated
            ("a", "b", "INCLUDES")]      # s_a < s_b conflicts with s_a = s_b
    kept, violated = filter_consistent(rels)
    assert kept == [("a", "b", "BEGUN_BY")]
    assert len(violated) == 2
