"""Round-5 session-6 operators: TRUE Damerau-Levenshtein blocked
linkage and binary-sign-quantized Hamming top-k ANN.
"""

from __future__ import annotations

import numpy as np

from eventrelationextractor_spark.ops import linkage, simsearch

# ------------------------------------------------- damerau-levenshtein


def test_damerau_levenshtein_true_metric_discriminator():
    """DL('CA','ABC') = 2 (CA -> AC -> ABC) is THE case that separates
    the unrestricted Lowrance-Wagner metric from the restricted
    optimal-string-alignment DP, which answers 3."""
    assert linkage.damerau_levenshtein("CA", "ABC") == 2


def test_damerau_levenshtein_textbook_values():
    dl = linkage.damerau_levenshtein
    assert dl("", "") == 0
    assert dl("", "abc") == 3
    assert dl("abc", "") == 3
    assert dl("abc", "abc") == 0
    assert dl("hte", "the") == 1          # adjacent transposition
    assert dl("kitten", "sitting") == 3   # classic Levenshtein case
    assert dl("abcdef", "abcfed") == 2    # non-adjacent swap: 2 subs
    assert dl("ab", "ba") == 1
    assert dl("ab", "bca") == 2           # transpose + insert


def test_damerau_levenshtein_matches_duckdb_builtin():
    """Pair-product parity vs DuckDB's damerau_levenshtein builtin —
    the exact-twin contract the dl_linkage oracle relies on (same
    shape as the jaro_winkler parity pin)."""
    import duckdb
    words = ["the", "hte", "then", "than", "crate", "trace", "ca",
             "abc", "acb", "banana", "bananas", "nanaba", "", "a",
             "ab", "ba", "abcd", "acbd", "badc", "dcba", "zzzz",
             "martha", "marhta", "dixon", "dicksonx"]
    con = duckdb.connect()
    for a in words:
        for b in words:
            got = linkage.damerau_levenshtein(a, b)
            want = con.sql(
                "SELECT damerau_levenshtein(?, ?)",
                params=[a, b]).fetchone()[0]
            assert got == want, (a, b, got, want)


def test_blocked_dl_pairs_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [("the", "T000"), ("hte", "T000"), ("teh", "T000"),
         ("than", "T000"), ("zebra", "Z160"), ("zebras", "Z162")],
        "term string, sdx string")
    out = {(r.a, r.b): r.dl
           for r in linkage.blocked_dl_pairs(
               df, "sdx", "term", max_dist=2).collect()}
    # transpositions of 'the' are 1 edit, not 2
    assert out[("hte", "the")] == 1
    assert out[("teh", "the")] == 1
    assert out[("hte", "teh")] == 2       # hte -> the -> teh
    # zebra/zebras share no block key -> pruned even though dl = 1
    assert ("zebra", "zebras") not in out
    # every surviving pair respects the threshold and a < b ordering
    assert all(d <= 2 for d in out.values())
    assert all(a < b for a, b in out)


# ------------------------------------------------- hamming ann


def _sign_words_np(vecs):
    bits = (np.asarray(vecs) > 0).astype(np.int64)
    words = []
    for row in bits:
        ws = []
        for k in range(row.shape[0] // 32):
            w = 0
            for i in range(32):
                w |= int(row[k * 32 + i]) << i
            ws.append(w)
        words.append(ws)
    return np.asarray(words, dtype=np.int64)


def test_sign_words_bit_layout(spark):
    """Bit i of word k is set iff element k*32+i is STRICTLY
    positive; zeros and negatives stay clear."""
    v = [0.0] * 64
    v[0] = 1.0          # word 0, bit 0
    v[31] = 2.5         # word 0, bit 31 (top bit of the 32-bit word)
    v[32] = -1.0        # negative -> clear
    v[63] = 1e-9        # word 1, bit 31
    df = spark.createDataFrame([(7, v)],
                               "vec_id long, embedding array<float>")
    row = simsearch.sign_words(df, dim=64).collect()[0]
    assert row.w0 == (1 << 0) | (1 << 31)
    assert row.w1 == (1 << 31)
    # 32-bit words never touch the BIGINT sign bit
    assert 0 <= row.w0 < (1 << 32) and 0 <= row.w1 < (1 << 32)


def test_hamming_topk_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    got = simsearch.hamming_topk(df, n_queries=3, k=4).collect()

    words = _sign_words_np(vecs)
    want = {}
    for q in range(3):
        d = [(int(bin(words[q][0] ^ words[c][0]).count("1")
                  + bin(words[q][1] ^ words[c][1]).count("1")), c)
             for c in range(40) if c != q]
        d.sort()
        want[q] = d[:4]
    assert len(got) == 12
    for r in got:
        h, c = want[r.query_id][r.rank - 1]
        assert (r.hamming, r.neighbor_id) == (h, c)
