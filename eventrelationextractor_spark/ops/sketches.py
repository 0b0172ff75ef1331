"""Deterministic cardinality/overlap sketches: HyperLogLog distinct
counting and KMV (bottom-k) set overlap.

The corpus-telemetry primitives of a 100-TB pipeline: vocabulary size,
distinct-URL counts, snapshot-overlap estimates - quantities whose exact
computation is a corpus-wide distinct (a giant shuffle), but whose
sketches are ONE map-side-combinable aggregation producing a
fixed-size summary (512 registers / k minima) that also merges across
partitions, shards and days (sketch union = register max / minima
merge).

Unlike Spark's built-in approx_count_distinct (whose xxHash/HLL++
internals can't be replayed in another engine), these draw every hash
from md5 of the value, so the SQL oracle reproduces registers, minima
and estimates EXACTLY - the sketches are deterministic functions of the
input SET (order-free: max/min aggregations), not of partitioning.

No counterpart in /root/reference (fixed small corpus); part of the
LLM-pipeline operator family (SURVEY.md §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# HLL geometry: b bits of bucket index, m = 2^b registers. The hash is
# the first 15 hex chars of md5 (60 bits - fits a signed long in both
# engines); bucket = low b bits, rho = leading-zero count of the
# remaining (60-b)-bit suffix + 1, computed exactly via the binary
# string length (no float log2 anywhere).
HLL_B = 9
HLL_M = 1 << HLL_B
# alpha_512 per Flajolet et al. 2007 (m >= 128 branch)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: list | None = None) -> DataFrame:
    """(group..., bucket, rho): max-rho register table, one
    map-side-combinable groupBy, at most m rows per group."""
    gc = list(group_cols or [])
    h = _h60(F.col(value_col))
    rest = F.shiftright(h, HLL_B)
    width = 60 - HLL_B
    rho = F.when(rest == 0, F.lit(width + 1)) \
        .otherwise(F.lit(width) - F.length(F.bin(rest)) + 1)
    return (df.select(*gc, (h % HLL_M).alias("bucket"), rho.alias("r"))
            .groupBy(*gc, "bucket").agg(F.max("r").alias("rho")))


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: list | None = None) -> DataFrame:
    """Estimate from an ALREADY-BUILT register table (group..., bucket,
    rho) - the read path for registers that arrive from elsewhere: a
    streaming sink (streaming_windowed_hll), a persisted daily sketch
    table, or a union of shard sketches merged by groupBy(bucket).max
    (register max IS the sketch union). Same formula as hll_estimate:
    raw HLL with the small-range linear-counting correction, plus the
    register_checksum that pins full register state under value-hash
    compares."""
    gc = list(group_cols or [])
    agg = regs.groupBy(*gc).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("z"),
        F.count(F.lit(1)).alias("nonzero"),
        F.sum("rho").cast("long").alias("register_checksum"))
    m = float(HLL_M)
    raw = F.lit(HLL_ALPHA * m * m) / (F.col("z") + (m - F.col("nonzero")))
    zeros = F.lit(HLL_M) - F.col("nonzero")
    linear = F.lit(m) * F.log(F.lit(m) / zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear) \
        .otherwise(raw)
    return agg.select(*gc, F.round(est, 4).alias("est_distinct"),
                      "register_checksum")


def hll_estimate(df: DataFrame, value_col: str,
                 group_cols: list | None = None) -> DataFrame:
    """Distinct-count estimate per group: build registers, then the
    shared estimator (see hll_estimate_from_registers)."""
    gc = list(group_cols or [])
    return hll_estimate_from_registers(hll_registers(df, value_col, gc),
                                       gc)


def streaming_windowed_hll(stream: DataFrame, ts_col: str,
                           value_col: str, window: str = "10 minutes",
                           watermark: str = "5 minutes") -> DataFrame:
    """Windowed distinct-count sketch under Structured Streaming:
    per event-time window the HLL REGISTER table (window_start,
    window_end, bucket, rho) - e.g. distinct URLs per 10-minute crawl
    window without keeping the URL set in state. State is ONE max per
    (window, bucket) - bounded at m=512 registers per window regardless
    of cardinality - and the max-aggregation is the sketch union, so
    late rows inside the watermark fold in exactly.

    Deliberately emits REGISTERS, not estimates: the estimate needs a
    second aggregation over buckets, and chaining two stateful
    aggregations in one streaming query is a Spark-version minefield;
    the estimator is the stateless batch rollup
    ``hll_estimate_from_registers`` over the sink (equivalence-tested
    against batch hll_estimate per window). Registers also MERGE
    across restarts / shards / days by groupBy(bucket).max - the whole
    point of carrying the sketch rather than the count."""
    h = _h60(F.col(value_col))
    rest = F.shiftright(h, HLL_B)
    width = 60 - HLL_B
    rho = F.when(rest == 0, F.lit(width + 1)) \
        .otherwise(F.lit(width) - F.length(F.bin(rest)) + 1)
    # parquet timestamps arrive NTZ; watermarks need zoned event time
    # (same normalization as ops/events.py streaming twins)
    stream = stream.withColumn(ts_col,
                               F.col(ts_col).cast("timestamp_ltz"))
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     (h % HLL_M).alias("bucket"))
            .agg(F.max(rho).alias("rho"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "bucket", "rho"))


def kmv_minima(df: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """Bottom-k distinct 60-bit hashes of a value column - a fixed-size
    signature of the SET. Distributed top-k (TakeOrdered: per-partition
    k then merge), no full sort."""
    return (df.select(_h60(F.col(value_col)).alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("_n")).drop("_n")
            .orderBy("h").limit(k))


def kmv_overlap(a: DataFrame, b: DataFrame, value_col: str,
                k: int = 64) -> DataFrame:
    """One-row overlap estimate between the value sets of ``a`` and
    ``b``: Jaccard from the bottom-k union sketch (Beyer et al. 2007 -
    the k-th smallest of the union estimates the union cardinality as
    (k-1) * 2^60 / h_k, and the intersection fraction within that
    bottom-k estimates J). Both sides' minima are k-row tables, so
    everything after the two sketch aggregations is broadcast-sized."""
    ma, mb = kmv_minima(a, value_col, k), kmv_minima(b, value_col, k)
    union_k = (ma.unionByName(mb).groupBy("h").agg(F.count(F.lit(1)))
               .select("h").orderBy("h").limit(k))
    in_both = (union_k.join(ma, "h", "left_semi")
               .join(mb, "h", "left_semi"))
    stats = union_k.agg(F.count(F.lit(1)).alias("ku"),
                        F.max("h").alias("hk"))
    inter = in_both.agg(F.count(F.lit(1)).alias("ki"))
    est_union = F.when(
        F.col("ku") < k, F.col("ku").cast("double")) \
        .otherwise((F.lit(float(k - 1)) * F.lit(2.0 ** 60)) / F.col("hk"))
    return (stats.crossJoin(inter)
            .select(F.col("ki").cast("long").alias("bottomk_intersection"),
                    F.col("ku").cast("long").alias("bottomk_size"),
                    F.round(est_union, 4).alias("est_union"),
                    F.round(F.col("ki") / F.col("ku"), 6)
                    .alias("est_jaccard")))


# --------------------------------------------------------------- count-min
# Count-Min sketch (Cormode & Muthukrishnan 2005): depth x width counter
# grid; item x increments cell (j, h_j(x)) for each of the depth hash
# rows; a point query reads min_j grid[j][h_j(x)] - an OVERestimate with
# error <= e*N/width at probability 1 - e^-depth. The heavy-hitter
# telemetry primitive: frequencies of hot n-grams / URLs / hosts from a
# fixed-size summary, no corpus-wide exact groupBy, and sketches from
# different shards / days MERGE by cell-wise sum.


def cms_sketch(df: DataFrame, value_col: str, depth: int = 4,
               width: int = 1024, salt: str = "cms",
               weight_col: str | None = None) -> DataFrame:
    """(row, col, cnt): the non-zero cells of the counter grid. One
    map-side explode (x depth, a small constant) + ONE partial-agged
    groupBy collapsing to <= depth*width rows - map-side combine does
    the heavy summation before the exchange. Hashes are md5-derived
    (row j salts the digest), so another engine replays every cell
    exactly. Merge two sketches: union + groupBy(row, col).sum."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(F.lit(j).alias("row"),
                 (F.conv(F.substring(F.md5(F.concat(
                     F.lit(f"{salt}{j}:"),
                     F.col(value_col).cast("string"))), 1, 8), 16, 10)
                  .cast("long") % width).alias("col"))
        for j in range(depth)])
    return (df.select(F.explode(cells).alias("c"), w.alias("w"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.col").alias("col"))
            .agg(F.sum("w").alias("cnt")))


def cms_lookup(sketch: DataFrame, keys: DataFrame, key_col: str,
               depth: int = 4, width: int = 1024,
               salt: str = "cms") -> DataFrame:
    """(key, est): point-query estimates for a key list against a built
    sketch - the dashboard read path: the corpus is NOT rescanned; the
    sketch (<= depth*width rows) is the broadcast side, keys fan out to
    their depth cells map-side, and est = min over rows (absent cell =
    0). Estimates are exact for keys whose cells saw no collision and
    overestimates otherwise - never under."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     (F.conv(F.substring(F.md5(F.concat(
                         F.lit(f"{salt}{j}:"),
                         F.col(key_col).cast("string"))), 1, 8), 16, 10)
                      .cast("long") % width).alias("col"))
            for j in range(depth)])).alias("c")) \
        .select("key", "c.row", "c.col")
    return (probes.join(F.broadcast(sketch), ["row", "col"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est")))


# ------------------------------------------------------------------ HDR
# Log-linear quantile histogram (HdrHistogram / DDSketch family): buckets
# are (decimal order of magnitude x 2 leading significant digits), so
# relative bucket width is <= 10% and the quantile estimate (bucket
# midpoint) carries a <= ~5% relative-error guarantee. The bucket key is
# derived with PURE string/integer arithmetic (no float log anywhere),
# so it is exact and identical on any engine - the property float-log
# bucketing (classic DDSketch gamma^i) cannot promise across libm
# implementations. Counts are one map-side-combinable groupBy and merge
# across shards/days by addition; the whole sketch is <= 90 rows per
# decade, so quantile extraction is driver-trivial no matter the input
# scale.


def hdr_buckets(df: DataFrame, value_col: str,
                group_cols: tuple = ()) -> DataFrame:
    """Bucket counts for positive integer values (rows with value < 1
    are out of the sketch's domain and are dropped - callers scale
    floats to integer units first, e.g. cents or microseconds).

    Returns (*group_cols, bucket_lo, bucket_hi, cnt): [lo, hi] is the
    inclusive value range of the bucket; values with <= 2 digits get
    exact singleton buckets."""
    v = F.col(value_col).cast("long")
    s = v.cast("string")
    ln = F.length(s)
    scale = F.expr(
        f"cast(concat('1', repeat('0', length(cast(cast({value_col} as "
        f"long) as string)) - 2)) as long)")
    lo = F.when(ln <= 2, v).otherwise(
        F.substring(s, 1, 2).cast("long") * scale)
    hi = F.when(ln <= 2, v).otherwise(
        F.substring(s, 1, 2).cast("long") * scale + scale - 1)
    return (df.filter(v >= 1)
            .select(*group_cols, lo.alias("bucket_lo"), hi.alias("bucket_hi"))
            .groupBy(*group_cols, "bucket_lo", "bucket_hi")
            .agg(F.count(F.lit(1)).alias("cnt")))


def hdr_merge(sketch: DataFrame) -> DataFrame:
    """Merge per-shard sketches (drop the shard columns, add counts):
    sketch union is count addition, exactly - partial aggregation at
    parquet-footer cost."""
    return (sketch.groupBy("bucket_lo", "bucket_hi")
            .agg(F.sum("cnt").alias("cnt")))


def hdr_quantiles(sketch: DataFrame,
                  qs: tuple = ((1, 2), (9, 10), (99, 100))) -> DataFrame:
    """Quantile extraction: for q = num/den, rank = ceil(q*n) in exact
    integer arithmetic, answer = midpoint of the first bucket whose
    cumulative count reaches the rank. The cumulative window runs over
    the SKETCH (<= ~90 rows/decade by construction), not the data, so
    the single-partition sort is a non-issue at any input scale.

    Returns (q_label, rank, n_total, bucket_lo, bucket_hi, estimate).
    """
    from pyspark.sql import Window
    w = Window.orderBy("bucket_lo") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n_total", F.sum("cnt").over(wall)))
    spec = sketch.sparkSession.createDataFrame(
        [(f"{num}/{den}", num, den) for num, den in qs],
        "q_label string, num long, den long")
    # pure integer ceil-division on BOTH engines (never float-divide
    # then truncate: the double round-trip is not cross-engine-pinned)
    rank = F.expr("(num * n_total + den - 1) div den")
    hit = (cum.crossJoin(F.broadcast(spec))
           .withColumn("rank", rank)
           .filter(F.col("cum") >= F.col("rank")))
    first = F.min(F.struct("bucket_lo", "bucket_hi")).alias("b")
    return (hit.groupBy("q_label", "rank", "n_total").agg(first)
            .select("q_label", "rank", "n_total",
                    F.col("b.bucket_lo").alias("bucket_lo"),
                    F.col("b.bucket_hi").alias("bucket_hi"),
                    F.expr("(b.bucket_lo + b.bucket_hi) div 2")
                    .alias("estimate")))


def hdr_group_quantiles(sketch: DataFrame, group_cols: tuple,
                        qs: tuple = ((1, 2), (9, 10), (99, 100))
                        ) -> DataFrame:
    """Per-group quantile extraction from a grouped sketch
    (``hdr_buckets(df, v, group_cols=...)``): the cumulative window is
    PARTITIONED by the group columns, so every group's scan stays inside
    its own <=~90-rows-per-decade sketch - grouped p50/p99 over any
    number of groups without ever sorting the data, the shape a 100-TB
    per-source latency/length dashboard needs (percentile_approx gives
    no cross-engine-replayable bucket; a global sort per group is a
    non-starter).

    Returns (*group_cols, q_label, rank, n_total, bucket_lo, bucket_hi,
    estimate)."""
    from pyspark.sql import Window
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("bucket_lo") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*gcols) \
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(w))
           .withColumn("n_total", F.sum("cnt").over(wall)))
    spec = sketch.sparkSession.createDataFrame(
        [(f"{num}/{den}", num, den) for num, den in qs],
        "q_label string, num long, den long")
    rank = F.expr("(num * n_total + den - 1) div den")
    hit = (cum.crossJoin(F.broadcast(spec))
           .withColumn("rank", rank)
           .filter(F.col("cum") >= F.col("rank")))
    first = F.min(F.struct("bucket_lo", "bucket_hi")).alias("b")
    return (hit.groupBy(*gcols, "q_label", "rank", "n_total").agg(first)
            .select(*gcols, "q_label", "rank", "n_total",
                    F.col("b.bucket_lo").alias("bucket_lo"),
                    F.col("b.bucket_hi").alias("bucket_hi"),
                    F.expr("(b.bucket_lo + b.bucket_hi) div 2")
                    .alias("estimate")))


def winsorize_by_hdr(df: DataFrame, value_col: str, id_col: str,
                     lo=(1, 100), hi=(99, 100)) -> DataFrame:
    """Sketch-driven winsorization: clip a positive integer column at
    the HDR-estimated lo/hi quantiles - outlier taming for training
    statistics (doc lengths, latencies, prices) where a global sort for
    exact percentiles is off the table and float percentile_approx
    isn't engine-replayable.

    Two passes over the column: one to build the (<= 90 rows/decade)
    sketch, one map-side clip against the TWO broadcast threshold rows.
    Thresholds are the integer bucket midpoints from
    :func:`hdr_quantiles`, so the clip boundary is exact on any engine.

    Returns (id, value, clipped, was_clipped)."""
    q = hdr_quantiles(hdr_buckets(df, value_col), qs=(lo, hi))
    lo_lbl = f"{lo[0]}/{lo[1]}"
    thr = (q.groupBy()
           .agg(F.min(F.when(F.col("q_label") == lo_lbl,
                             F.col("estimate"))).alias("lo_est"),
                F.min(F.when(F.col("q_label") != lo_lbl,
                             F.col("estimate"))).alias("hi_est")))
    v = F.col(value_col).cast("long")
    return (df.crossJoin(F.broadcast(thr))
            .select(F.col(id_col).alias("id"), v.alias("value"),
                    F.least(F.greatest(v, F.col("lo_est")),
                            F.col("hi_est")).alias("clipped"))
            .withColumn("was_clipped", F.col("value") != F.col("clipped")))


# --------------------------------------------------------- Space-Saving

SS_OUT_SCHEMA = ("key string, item long, est_count long, err long, n_seen long")


def _ss_replay(items, counters: dict, k: int):
    """The Metwally Space-Saving update, shared verbatim by the batch
    and streaming twins: counters maps item -> (count, err); eviction
    picks the (count, item)-smallest counter so ties are deterministic.
    The classic guarantees hold: count overestimates the true
    frequency by at most err, and every item with true frequency
    > n/k is tracked at the end."""
    for it in items:
        it = int(it)
        if it in counters:
            c, e = counters[it]
            counters[it] = (c + 1, e)
        elif len(counters) < k:
            counters[it] = (1, 0)
        else:
            victim = min(counters, key=lambda x: (counters[x][0], x))
            vc = counters[victim][0]
            del counters[victim]
            counters[it] = (vc + 1, vc)
    return counters


def spacesaving_topk(df: DataFrame, k: int = 8, key_col: str = "event_type",
                     item_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id") -> DataFrame:
    """Batch Space-Saving heavy hitters per key -> (key, item, count,
    err): the bounded-memory top-k frequency sketch (Metwally et al.
    2005) for 'which items dominate each stream' when the item
    cardinality is too large for exact counting. Rows replay in
    (ts, id) order per key — the SAME deterministic order the
    streaming twin consumes — so the two are bit-equivalent and the
    tests assert it. k counters per key, O(k) state; the group work
    is one applyInPandas over each key's rows."""
    import pandas as pd

    kk = int(k)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = str(pdf[key_col].iloc[0])
        pdf = pdf.sort_values([ts_col, id_col])
        counters = _ss_replay(pdf[item_col], {}, kk)
        n = len(pdf)
        rows = [(key, it, c, e, n) for it, (c, e) in counters.items()]
        return pd.DataFrame(rows, columns=["key", "item", "est_count", "err",
                                           "n_seen"])

    return (df.select(key_col, item_col, ts_col, id_col)
            .groupBy(key_col).applyInPandas(fn, SS_OUT_SCHEMA))


def streaming_spacesaving(stream: DataFrame, k: int = 8,
                          key_col: str = "event_type",
                          item_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id") -> DataFrame:
    """Streaming twin of ``spacesaving_topk``: applyInPandasWithState
    carries the k counters per key across micro-batches and emits the
    full counter snapshot after each batch (append mode — the LAST
    batch's snapshot is the final sketch, which the equivalence test
    compares against the batch twin). Same ordered-source contract as
    the other NoTimeout operators: rows arrive (ts, id)-ordered per
    key across batches; within a batch the kernel sorts."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = ("items array<long>, counts array<long>, errs array<long>, n long")
    kk = int(k)

    def fn(key, pdfs, state):
        import pandas as pd
        if state.exists:
            its, cs, es, n = state.get
            counters = {int(i): (int(c), int(e))
                        for i, c, e in zip(its, cs, es)}
            n = int(n)
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            counters = _ss_replay(pdf[item_col], counters, kk)
            n += len(pdf)
        items = sorted(counters)
        state.update((items, [counters[i][0] for i in items],
                      [counters[i][1] for i in items], n))
        rows = [(str(key[0]), it, c, e, n)
                for it, (c, e) in counters.items()]
        yield pd.DataFrame(rows, columns=["key", "item", "est_count", "err",
                                          "n_seen"])

    return stream.select(key_col, item_col, ts_col, id_col) \
        .groupBy(key_col).applyInPandasWithState(
            fn, SS_OUT_SCHEMA, state_schema, "append",
            GroupStateTimeout.NoTimeout)


def ams_f2(docs, n_rows: int = 32, salt: str = "ams",
           id_col: str = "doc_id", text_col: str = "text"):
    """AMS second-frequency-moment (F2) sketch over the corpus term
    distribution - the classic join-size / self-join-size estimator
    (Alon-Matias-Szegedy 1996): each of ``n_rows`` sketch rows keeps
    S_j = sum over terms of sign_j(term) * count(term), sign_j drawn
    from the parity of md5(salt||j||term); S_j^2 is an unbiased F2
    estimate and the row median tames variance.

    -> (kind, j, value) BIGINT rows: one ('sketch', j, S_j^2) per row,
    ('median2x', -1, middle-two sum) - kept as the SUM of the two
    middle order statistics so the median stays an exact integer (no
    /2 float) - and ('exact_f2', -2, sum count^2) as the audit the toy
    gate can afford. All arithmetic integer end-to-end; the sketch is
    a deterministic function of the term SET+counts (order-free), so
    the DuckDB oracle replays it exactly.

    Scale shape: term counts partial-agg first (vocab cardinality),
    then n_rows conditional sums in ONE map-side-combinable aggregate
    producing n_rows scalars - the sketch costs one reduced row per
    sketch row, merges across shards by addition, and never holds more
    than the vocabulary."""
    from pyspark.sql import Window
    from .bm25 import tokenize
    counts = (tokenize(docs, id_col, text_col)
              .groupBy("term").agg(F.count("*").alias("cnt")))
    sign_cols = []
    for j in range(int(n_rows)):
        parity = F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{salt}{j}:"), F.col("term"))),
            32, 1), 16, 10).cast("long") % 2
        sign = F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1))
        sign_cols.append(F.sum(sign * F.col("cnt")).alias(f"s{j}"))
    row = counts.agg(*sign_cols,
                     F.sum(F.col("cnt") * F.col("cnt")).alias("f2"))
    sq = row.select(
        F.explode(F.array(*[
            F.struct(F.lit(j).cast("long").alias("j"),
                     (F.col(f"s{j}") * F.col(f"s{j}")).alias("value"))
            for j in range(int(n_rows))])).alias("e"),
        F.col("f2"))
    sketch = sq.select(F.lit("sketch").alias("kind"),
                       F.col("e.j").alias("j"),
                       F.col("e.value").cast("long").alias("value"))
    mid = int(n_rows) // 2
    ordered = sq.select(F.col("e.value").alias("v")) \
        .withColumn("r", F.row_number().over(
            Window.orderBy(F.col("v")))) \
        .filter((F.col("r") == mid) | (F.col("r") == mid + 1)) \
        .agg(F.sum("v").alias("value")) \
        .select(F.lit("median2x").alias("kind"),
                F.lit(-1).cast("long").alias("j"),
                F.col("value").cast("long"))
    exact = row.select(F.lit("exact_f2").alias("kind"),
                       F.lit(-2).cast("long").alias("j"),
                       F.col("f2").cast("long").alias("value"))
    return sketch.unionByName(ordered).unionByName(exact)
