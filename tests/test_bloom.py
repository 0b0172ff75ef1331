"""Bloom prefilter: no false negatives ever, false positives appear at
tiny m and match an independent pure-python replay of the bit draws,
and the probe side stays shuffle-free."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from eventrelationextractor_spark.ops import bloom


def _py_positions(key: str, m_bits: int, k: int):
    return [int(hashlib.md5(f"bf{i}:{key}".encode()).hexdigest()[:8], 16)
            % m_bits for i in range(k)]


def test_bloom_no_false_negatives_and_exact_fp_replay(spark):
    ref_keys = [f"key-{i}" for i in range(60)]
    probe_keys = ref_keys + [f"other-{i}" for i in range(200)]
    m_bits, k = 256, 3                      # tiny filter -> real FPs
    ref = spark.createDataFrame([(u,) for u in ref_keys], "url string")
    probe = spark.createDataFrame([(u,) for u in probe_keys], "url string")
    got = {r.url: r.maybe_member
           for r in bloom.bloom_prefilter(probe, ref, m_bits=m_bits,
                                          k=k).collect()}
    # python replay of the same bloom
    occupied = {p for u in ref_keys for p in _py_positions(u, m_bits, k)}
    expect = {u: all(p in occupied for p in _py_positions(u, m_bits, k))
              for u in probe_keys}
    assert got == expect
    assert all(got[u] for u in ref_keys)    # never a false negative
    fps = [u for u in probe_keys[60:] if got[u]]
    assert fps                               # 256 bits / 60 keys: FPs real


def test_bloom_bitmap_words_match_python(spark):
    keys = ["a", "b", "c", "xyz"]
    df = spark.createDataFrame([(u,) for u in keys], "url string")
    bm = bloom.build_bloom(df, m_bits=128, k=4)
    expect = np.zeros(2, dtype=np.int64)
    for u in keys:
        for p in _py_positions(u, 128, 4):
            expect[p >> 6] |= np.int64(np.uint64(1) << np.uint64(p & 63))
    assert np.array_equal(bm, expect)


def test_bloom_probe_side_has_no_exchange(spark):
    probe = spark.createDataFrame([("u1",), ("u2",)], "url string")
    bm = np.zeros(4, dtype=np.int64)
    plan = bloom.bloom_member(probe, bm)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
