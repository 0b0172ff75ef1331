"""Generate a larger-SF synthetic dataset (documents/embeddings/events,
the three tables the driver-contract queries consume) for running the
correctness gate beyond the driver-provided sf0.1 (round-2 verdict item
#4: show oracle parity is not an sf0.01 artifact).

The driver's own testdata is read-only and its generator private, so this
produces a SAME-SCHEMA, SAME-SHAPE corpus (seeded numpy - deterministic);
the gate compares Spark vs DuckDB on the SAME input, so matching the
driver's exact distribution is unnecessary - only schema and scale
matter. Scale factors mirror the driver's: sf1.0 = 50,000 documents,
50,000 embeddings, 1,000,000 events (100x sf0.01).

Usage: python tools/make_sf.py --sf 1.0 --out /tmp/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("key agg row scan slow fast table value part hash merge batch "
         "spark line sort window column join small customer query big "
         "stream group order data filter the a").split()


def make_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lengths = rng.integers(25, 90, size=n)
    texts = [" ".join(rng.choice(VOCAB, size=ln)) for ln in lengths]
    # ~1% exact duplicate pairs so dedup_exact has positives beyond the
    # query's own augmentation
    for i in range(0, n, 100):
        j = int(rng.integers(0, n))
        if j != i:
            texts[j] = texts[i]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array([f"src{i}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def make_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, size=n), pa.int32()),
    })


def make_events(n: int, rng: np.random.Generator) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    gaps = rng.exponential(scale=30.0, size=n)
    ts = base + (np.cumsum(gaps) * 1e6).astype("timedelta64[us]")
    types = np.array(["click", "view", "error", "purchase"])
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(50, n // 200), size=n),
                            pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 4, size=n)],
                               pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 20, size=n), 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, size=n)],
                          pa.string()),
    })


SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def make_tpch(n_cust: int, n_orders: int, rng: np.random.Generator,
              out: str) -> int:
    """Same-schema relational trio (customer/orders/lineitem) for the
    TPC-H-shape driver queries; keys mirror the driver layout
    (custkey 0..n_cust-1, orderkey 0..n_orders-1, 1-7 lines/order,
    2-decimal money)."""
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)],
                           pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust),
                                pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2),
                              pa.float64()),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, size=n_cust)],
            pa.string()),
    }), os.path.join(out, "customer.parquet"))

    base = np.datetime64("1995-01-01T00:00:00.000000")
    odates = base + (rng.integers(0, 2400, size=n_orders)
                     * np.timedelta64(1, "D")).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_orders),
                              pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, size=n_orders)],
            pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 400000, n_orders), 2), pa.float64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, size=n_orders)],
            pa.string()),
    }), os.path.join(out, "orders.parquet"))

    lines_per = rng.integers(1, 8, size=n_orders)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per)
    n_li = len(okeys)
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    sdates = (np.repeat(odates, lines_per)
              + (rng.integers(1, 120, size=n_li)
                 * np.timedelta64(1, "D")).astype("timedelta64[us]"))
    regions = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": pa.array(regions, pa.string()),
    }), os.path.join(out, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": pa.array([f"NATION{i:02d}" for i in range(25)],
                           pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), os.path.join(out, "nation.parquet"))
    n_supp, n_part = 1000, 20000    # match the lineitem key ranges below
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)],
                           pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_supp),
                                pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2),
                              pa.float64()),
    }), os.path.join(out, "supplier.parquet"))
    colors = ("red", "blue", "green", "small", "hot")
    things = ("widget", "bolt", "gear", "gizmo", "ring")
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(
            [f"{colors[int(a)]} {things[int(b)]}"
             for a, b in zip(rng.integers(0, 5, size=n_part),
                             rng.integers(0, 5, size=n_part))],
            pa.string()),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in
                             rng.integers(1, 26, size=n_part)], pa.string()),
        "p_type": pa.array(
            np.array(["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO",
                      "MEDIUM"])[rng.integers(0, 6, size=n_part)],
            pa.string()),
        "p_size": pa.array(rng.integers(1, 51, size=n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 2100, n_part), 2), pa.float64()),
    }), os.path.join(out, "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, size=n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, size=n_li) / 100.0, 2),
            pa.float64()),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, size=n_li) / 100.0, 2),
            pa.float64()),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, size=n_li)],
            pa.string()),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, size=n_li)],
            pa.string()),
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    }), os.path.join(out, "lineitem.parquet"))
    return n_li


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/sf{args.sf}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260817)
    n_docs = int(50000 * args.sf)
    pq.write_table(make_documents(n_docs, rng),
                   os.path.join(out, "documents.parquet"))
    pq.write_table(make_embeddings(n_docs, rng),
                   os.path.join(out, "embeddings.parquet"))
    pq.write_table(make_events(n_docs * 20, rng),
                   os.path.join(out, "events.parquet"))
    n_li = make_tpch(int(150000 * args.sf), int(1500000 * args.sf),
                     rng, out)
    print(f"wrote {out}: documents={n_docs} embeddings={n_docs} "
          f"events={n_docs * 20} lineitem={n_li}")


if __name__ == "__main__":
    main()
