"""Round-5 session-5 operators: pointer-doubling redirect resolution,
integer Otsu thresholding over real PNG decode, D'Hondt divisor
apportionment, and exact-moment one-way ANOVA.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import codecs
from eventrelationextractor_spark.ops import events as ev
from eventrelationextractor_spark.ops import graph as g
from eventrelationextractor_spark.ops import mixing as mx
from eventrelationextractor_spark.ops import multimodal as mm
from eventrelationextractor_spark.ops import quality as q

# --------------------------------------------------------- redirects


def test_resolve_redirects_chain_cycle_and_feeder(spark):
    """Chain 1->2->3->T resolves with exact hops; a 3-cycle and the
    node feeding INTO it both report is_cycle with NULL target."""
    edges = [(1, 2), (2, 3), (3, 99),          # chain, terminal 99
             (10, 11), (11, 12), (12, 10),     # 3-cycle
             (20, 10)]                          # feeds into the cycle
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["src"]: (r["final"], r["hops"], r["is_cycle"])
           for r in g.resolve_redirects(df).collect()}
    assert got[1] == (99, 3, False)
    assert got[2] == (99, 2, False)
    assert got[3] == (99, 1, False)
    for cyc in (10, 11, 12, 20):
        assert got[cyc] == (None, None, True)
    assert len(got) == 7


def test_resolve_redirects_long_chain_exact_hops(spark):
    """A 100-link chain resolves in ceil(log2(100)) = 7 doubling
    rounds with hops == distance-to-terminal for every node."""
    edges = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    stats = {}
    got = {r["src"]: (r["final"], r["hops"])
           for r in g.resolve_redirects(df, max_rounds=7,
                                        stats=stats).collect()}
    assert stats["rounds"] == 7
    assert all(got[i] == (100, 100 - i) for i in range(100))


def test_resolve_redirects_budget_exhaustion_is_cycle_flag(spark):
    """A chain longer than 2^max_rounds is reported unresolved (the
    cycle flag doubles as a hop-budget flag, documented)."""
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["src"]: r["is_cycle"]
           for r in g.resolve_redirects(df, max_rounds=2).collect()}
    # 2 rounds resolve chains of length <= 4
    assert got[9] is False and got[6] is False
    assert got[0] is True


# -------------------------------------------------------------- otsu


def _otsu_reference(gray_vals):
    """Pure-python Otsu replay: maximize (S_t*N - n_t*S)^2 /
    (n_t*(N-n_t)) over thresholds, first-hit argmax."""
    c = [0] * 256
    for v in gray_vals:
        c[v] += 1
    n_tot, s_tot = len(gray_vals), sum(gray_vals)
    best, cn, cs = None, 0, 0
    out = None
    for t in range(256):
        cn += c[t]
        cs += t * c[t]
        den = cn * (n_tot - cn)
        if den == 0:
            continue
        sc = (cs * n_tot - cn * s_tot) ** 2 / den
        if best is None or sc > best:
            best, out = sc, (t, cn, cs)
    return out


def test_otsu_matches_python_reference_on_bimodal(spark):
    """A planted two-level image (quarter at 40, rest at 200, one
    noise row) must threshold between the modes, matching the exact
    rational replay."""
    import numpy as np
    h, w = 16, 16
    arr = np.full((h, w, 3), 200, dtype=np.uint8)
    arr[:4, :, :] = 40
    arr[15, :, :] = np.arange(16, dtype=np.uint8).reshape(16, 1) * 3 + 90
    payload = codecs.encode_png(arr)
    media = spark.createDataFrame(
        [(7, "image", bytearray(payload), w, h)],
        "media_id long, kind string, payload binary, width int, height int")
    row = mm.otsu_stats(media).collect()[0]
    gray = (arr.astype("int64").sum(axis=2) // 3).ravel().tolist()
    t, cn, cs = _otsu_reference(gray)
    assert (row["otsu_t"], row["n_below"], row["sum_below"]) == (t, cn, cs)
    assert 40 <= row["otsu_t"] < 200


# ------------------------------------------------------------ dhondt


def test_dhondt_classic_example(spark):
    """Textbook D'Hondt: 100/80/30/20 votes, 8 seats -> 4/3/1/0."""
    rows = ([("A",)] * 100 + [("B",)] * 80 + [("C",)] * 30
            + [("D",)] * 20)
    df = spark.createDataFrame(rows, "party string")
    df = df.selectExpr("party", "1 AS one")
    got = {r["stratum"]: r["seats"]
           for r in mx.dhondt_allocation(df, "party", "one", 8).collect()}
    assert got == {"A": 4, "B": 3, "C": 1, "D": 0}


def test_dhondt_sums_to_total_and_tie_break(spark):
    """Equal-weight strata: seats split evenly, remainder to the
    lexicographically smallest strata; total always exact."""
    rows = [(s,) for s in "abc" for _ in range(10)]
    df = spark.createDataFrame(rows, "party string").selectExpr(
        "party", "1 AS one")
    got = {r["stratum"]: r["seats"]
           for r in mx.dhondt_allocation(df, "party", "one", 7).collect()}
    assert sum(got.values()) == 7
    assert got == {"a": 3, "b": 2, "c": 2}


# ------------------------------------------------------------- anova


def test_anova_f_matches_python_replay(spark):
    """Exact-moment replay: the integer ssb/ssw definitions and the
    floor-ppm F must match a pure-python computation bit-for-bit."""
    rows = [(i, "g%d" % (i % 3), 50 + (i * 37) % 100)
            for i in range(90)]
    df = spark.createDataFrame(rows, "i long, grp string, x long")
    row = q.anova_f(df, "grp", "x").collect()[0]

    groups = {}
    for _, grp, x in rows:
        n, t = groups.get(grp, (0, 0))
        groups[grp] = (n + 1, t + x)
    n_rows = sum(n for n, _ in groups.values())
    t_total = sum(t for _, t in groups.values())
    q_total = sum(x * x for _, _, x in rows)

    def f6(a, b):
        return (a // b) * 1000000 + ((a % b) * 1000000) // b

    between = sum(f6(t * t, n) for n, t in groups.values())
    ssb = between - f6(t_total * t_total, n_rows)
    ssw = q_total * 1000000 - between
    import math
    f_ppm = math.floor((ssb / (len(groups) - 1))
                       / (ssw / (n_rows - len(groups))) * 1000000.0)
    assert (row["n_rows"], row["n_groups"]) == (90, 3)
    assert (row["t_total"], row["q_total"]) == (t_total, q_total)
    assert (row["ssb_scaled"], row["ssw_scaled"]) == (ssb, ssw)
    assert row["f_ppm"] == f_ppm


def test_anova_f_separated_groups_large_f(spark):
    """Two disjoint-range groups -> F far above 1; identical groups
    (same values in both) -> ssb == 0."""
    rows = [(i, "lo", 10 + i % 3) for i in range(30)] + \
           [(i, "hi", 500 + i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "i long, grp string, x long")
    big = q.anova_f(df, "grp", "x").collect()[0]
    assert big["f_ppm"] > 1000 * 1000000

    same = [(i, "a", 7) for i in range(10)] + \
           [(i, "b", 7) for i in range(10)]
    df2 = spark.createDataFrame(same, "i long, grp string, x long")
    z = q.anova_f(df2, "grp", "x").collect()[0]
    assert z["ssb_scaled"] == 0 and z["ssw_scaled"] == 0
    assert z["f_ppm"] is None  # degenerate variance -> NULL, not /0


# ------------------------------------------------------ markov chain


def test_markov_attribution_two_path_example(spark):
    """u1: view->click->purchase, u2: view->(drop). Hand-solved
    absorption: P_full = 0.5; removing view or click each kills the
    only converting path -> removal 0.5 each, shares 50/50."""
    rows = [(1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:01:00", 1, "click"),
            (3, "2024-01-01 00:02:00", 1, "purchase"),
            (4, "2024-01-01 00:00:00", 2, "view")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r["channel"]: r for r in
           ev.markov_attribution(df).collect()}
    assert set(got) == {"view", "click"}
    for ch in ("view", "click"):
        r = got[ch]
        assert r["p_full_ppm"] == 500000
        assert r["p_removed_ppm"] == 0
        assert r["removal_ppm"] == 500000
        assert r["share_ppm"] == 500000


def test_markov_attribution_truncates_at_first_purchase(spark):
    """Events after the first purchase must not create transitions:
    with the post-purchase tail ignored, every journey converts and
    P_full is exactly 1."""
    rows = [(1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:01:00", 1, "purchase"),
            (3, "2024-01-01 00:02:00", 1, "error"),
            (4, "2024-01-01 00:03:00", 1, "error")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r["channel"]: r for r in ev.markov_attribution(df).collect()}
    assert set(got) == {"view"}          # 'error' never entered a journey
    assert got["view"]["p_full_ppm"] == 1000000


# ------------------------------------------------------------ geohash


def test_geohash_known_vector_and_prefix_nesting(spark):
    """(57.649, 10.407) -> 'u4pru' (textbook vector); a 6-char hash
    always extends the 4-char hash of the same point."""
    from eventrelationextractor_spark.ops import layout as L
    df = spark.createDataFrame(
        [(57649, 10407), (-33860, 151210), (0, 0), (89999, 179999),
         (-90000, -180000)],
        "lat_md long, lon_md long")
    out = {(r["lat_md"], r["lon_md"]): (r["g6"], r["g4"]) for r in
           L.geohash_key(L.geohash_key(df, "lat_md", "lon_md", 6, "g6"),
                         "lat_md", "lon_md", 4, "g4").collect()}
    assert out[(57649, 10407)][0].startswith("u4pru")
    assert out[(-33860, 151210)][0].startswith("r3gx")  # Sydney
    for g6, g4 in out.values():
        assert g6.startswith(g4)
        assert len(g6) == 6 and len(g4) == 4


def test_geohash_matches_python_closed_form(spark):
    """Spark codegen == the pure-python closed form on 200 points
    (the same form already validated against the textbook float
    refinement loop on 80k points)."""
    from eventrelationextractor_spark.ops import layout as L
    ALPH = L.GEOHASH_ALPHABET

    def closed(lat_md, lon_md, chars):
        tb = 5 * chars
        lonb, latb = (tb + 1) // 2, tb // 2
        latq = min(((lat_md + 90000) << latb) // 180000, (1 << latb) - 1)
        lonq = min(((lon_md + 180000) << lonb) // 360000, (1 << lonb) - 1)
        g = 0
        for i in range(tb):
            if i % 2 == 0:
                bit = (lonq >> (lonb - 1 - i // 2)) & 1
            else:
                bit = (latq >> (latb - 1 - i // 2)) & 1
            g = (g << 1) | bit
        return "".join(ALPH[(g >> (tb - 5 * (c + 1))) & 31]
                       for c in range(chars))

    pts = [(((i * 7919) % 180000) - 90000,
            ((i * 104729) % 360000) - 180000) for i in range(200)]
    df = spark.createDataFrame(pts, "lat_md long, lon_md long")
    got = {(r["lat_md"], r["lon_md"]): r["gh"]
           for r in L.geohash_key(df, "lat_md", "lon_md", 5).collect()}
    for lat, lon in pts:
        assert got[(lat, lon)] == closed(lat, lon, 5)


# ---------------------------------------------------------------- ols


def test_ols2_recovers_exact_plane(spark):
    """y = 3 + 2*x1 - x2 exactly -> b1 = 2.0, b2 = -1.0 in ppm."""
    rows = [(3 + 2 * x1 - x2, x1, x2)
            for x1 in range(10) for x2 in range(7)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = q.ols2(df, "y", "x1", "x2").collect()[0]
    assert r["b1_ppm"] == 2_000_000
    assert r["b2_ppm"] == -1_000_000


def test_ols2_singular_design_null_betas(spark):
    """x2 = 2*x1 (collinear) -> det 0 -> NULL betas, no ANSI /0."""
    rows = [(i * 5 + 1, i, 2 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = q.ols2(df, "y", "x1", "x2").collect()[0]
    assert r["b1_ppm"] is None and r["b2_ppm"] is None


# ----------------------------------------------------------- dtw


def _dtw_reference(a, b, band):
    INF = 1 << 40
    n, m = len(a), len(b)
    d = [[INF] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            if abs(i - j) > band:
                continue
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                d[i][j] = c
            else:
                best = min(d[i - 1][j] if i else INF,
                           d[i][j - 1] if j else INF,
                           d[i - 1][j - 1] if i and j else INF)
                if best < INF:
                    d[i][j] = c + best
    v = d[n - 1][m - 1]
    return None if v >= INF else v


def test_dtw_banded_matches_reference_and_shift_invariance(spark):
    """Random pairs match the quadratic reference DP; a sequence vs
    its 1-step shift aligns near-perfectly inside the band while the
    banded L2 of the same pair is large."""
    import random
    rnd = random.Random(11)
    seqs = [(i, [rnd.randrange(0, 40) for _ in range(10 + i % 3)])
            for i in range(8)]
    shifted = [9, [0] + [v for v in seqs[0][1]][:-1]]
    sdf = spark.createDataFrame(seqs + [tuple(shifted)],
                                "id long, seq array<long>")
    pdf = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 5), (6, 7), (0, 9)], "id1 long, id2 long")
    got = {(r["id1"], r["id2"]): r["dtw"]
           for r in ev.dtw_banded(sdf, pdf, band=3).collect()}
    by_id = dict(seqs + [tuple(shifted)])
    for (i1, i2), d in got.items():
        assert d == _dtw_reference(by_id[i1], by_id[i2], 3)
    # the shifted pair aligns: dtw <= first-element cost
    assert got[(0, 9)] <= abs(seqs[0][1][0] - 0) + 5


def test_dtw_banded_unreachable_band_is_null(spark):
    """||a| - |b|| > band -> no path inside the band -> NULL."""
    sdf = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5, 6, 7, 8]), (2, [1, 2])],
        "id long, seq array<long>")
    pdf = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    r = ev.dtw_banded(sdf, pdf, band=2).collect()[0]
    assert r["dtw"] is None and (r["n1"], r["n2"]) == (8, 2)


# ------------------------------------------------- interval union


def test_interval_union_len_overlap_nesting_islands(spark):
    """[0,10]+[5,15]+[20,25] -> union 20, 2 islands; a nested
    interval adds nothing; a degenerate [5,5] adds nothing but
    counts."""
    rows = [("a", 0, 10), ("a", 5, 15), ("a", 20, 25),
            ("b", 0, 10), ("b", 2, 3),
            ("c", 5, 5)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r["key"]: (r["n_intervals"], r["n_islands"], r["union_len"])
           for r in ev.interval_union_len(df, "k", "s", "e").collect()}
    assert got["a"] == (3, 2, 20)
    assert got["b"] == (2, 1, 10)
    assert got["c"] == (1, 1, 0)


def test_interval_union_len_matches_bruteforce(spark):
    """120 random intervals across 5 keys vs a python set-of-points
    brute force."""
    import random
    rnd = random.Random(3)
    rows = [("k%d" % rnd.randrange(5), s, s + rnd.randrange(0, 30))
            for s in (rnd.randrange(0, 200) for _ in range(120))]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r["key"]: r["union_len"]
           for r in ev.interval_union_len(df, "k", "s", "e").collect()}
    want = {}
    for k, s, e in rows:
        want.setdefault(k, set()).update(range(s, e))
    for k, pts in want.items():
        assert got[k] == len(pts)


# ------------------------------------------------------ trigram index


def test_trigram_search_candidates_and_false_positives(spark):
    """Docs with every query trigram are candidates; contiguity then
    splits true matches from index false positives; a doc missing any
    trigram never appears."""
    from eventrelationextractor_spark.ops import textstats as ts
    docs = spark.createDataFrame(
        [(1, "xx abcde yy"),          # true match
         (2, "abc bcd cde"),          # all trigrams, not contiguous
         (3, "abc only here"),        # missing trigrams
         (4, "zzz")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["verified"]
           for r in ts.trigram_search(docs, "abcde").collect()}
    assert got == {1: True, 2: False}


def test_trigram_search_rejects_short_literal(spark):
    import pytest
    from eventrelationextractor_spark.ops import textstats as ts
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ts.trigram_search(docs, "ab")


# ----------------------------------------------------- equalization


def test_equalize_stats_matches_python_replay(spark):
    """Planted bimodal image vs the exact integer replay; a constant
    image hits the den == 0 guard (all-zero map)."""
    import numpy as np
    arr = np.full((8, 8, 3), 30, dtype=np.uint8)
    arr[4:, :, :] = 220
    const = np.full((8, 8, 3), 77, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(codecs.encode_png(arr)), 8, 8),
         (2, "image", bytearray(codecs.encode_png(const)), 8, 8)],
        "media_id long, kind string, payload binary, width int, height int")
    got = {r["media_id"]: r for r in mm.equalize_stats(media).collect()}

    gray = (arr.astype("int64").sum(axis=2) // 3).ravel()
    c = np.bincount(gray, minlength=256)
    cdf = np.cumsum(c)
    npx = int(cdf[-1])
    cdf_min = int(cdf[c > 0][0])
    emap = ((cdf - cdf_min) * 255) // (npx - cdf_min)
    r = got[1]
    assert r["n_px"] == npx and r["cdf_min"] == cdf_min
    assert r["sum_eq"] == int((c * emap).sum())
    assert r["n_below128"] == int(c[emap < 128].sum())

    rc = got[2]
    assert (rc["n_px"], rc["cdf_min"]) == (64, 64)
    assert rc["sum_eq"] == 0 and rc["n_below128"] == 64


# --------------------------------------------------------------- psl


def test_etld1_psl_semantics(spark):
    """Longest-match PSL: 2-label rules beat 1-label; private rules
    (github.io) count as suffixes; a host that IS a suffix has NULL
    registrable; unmatched hosts fall back to the '*' rule."""
    from eventrelationextractor_spark.ops import urls as u
    hosts = ["news.example.com", "media.example.co.uk",
             "a.b.example.co.uk", "x.github.io", "weird.unknowntld",
             "co.uk", "only", "deep.example.com.au"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: (r["suffix"], r["registrable"])
           for r in u.etld1(df).collect()}
    assert got["news.example.com"] == ("com", "example.com")
    assert got["media.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["a.b.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["x.github.io"] == ("github.io", "x.github.io")
    assert got["weird.unknowntld"] == ("unknowntld",
                                       "weird.unknowntld")
    assert got["co.uk"] == ("co.uk", None)
    assert got["only"] == ("only", None)
    assert got["deep.example.com.au"] == ("com.au", "example.com.au")


# --------------------------------------------------------------- cdc


def test_cdc_chunks_partition_text_exactly(spark):
    """Chunks tile each document with no gap/overlap: total_bytes ==
    sum of text lengths, and a duplicated document doubles chunk
    count without adding unique bytes."""
    from eventrelationextractor_spark.ops import dedup as dd
    texts = ["the quick brown fox jumps over the lazy dog " * 8,
             "pack my box with five dozen liquor jugs " * 6]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    r = dd.cdc_chunk_stats(df).collect()[0]
    assert r["n_docs"] == 2
    assert r["total_bytes"] == sum(len(t) for t in texts)
    assert r["n_unique"] <= r["n_chunks"]

    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)]
        + [(99, texts[0])], "doc_id long, text string")
    r2 = dd.cdc_chunk_stats(df2).collect()[0]
    assert r2["total_bytes"] == r["total_bytes"] + len(texts[0])
    assert r2["unique_bytes"] == r["unique_bytes"]  # nothing new


def test_cdc_insertion_shifts_only_local_chunks(spark):
    """The content-defined property: prepending bytes to a long text
    leaves the chunk set after the first content cut identical, so
    unique bytes grow by far less than the text length."""
    from eventrelationextractor_spark.ops import dedup as dd
    # varied content so the gram-hash cut condition actually fires
    # (a tight repeat has too few distinct 8-grams to cut on)
    base = " ".join(f"token{i}x{i * 7 % 97}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED-PREFIX-" + base)],
        "doc_id long, text string")
    r = dd.cdc_chunk_stats(df).collect()[0]
    assert r["n_chunks"] > 20          # cuts did fire
    # if chunking were offset-based, unique_bytes would be ~2x total;
    # content-defined cuts resynchronize after the insertion
    assert r["unique_bytes"] < r["total_bytes"] * 6 // 10
