#!/usr/bin/env python3
"""Synthetic scale-factor generator for scale-stress sweeps (driver-side tool).

Produces the same ten tables as /root/testdata/sf* (TESTDATA.md) with the
same schemas, value shapes, and edge-case structure, at any scale factor —
default sf1 (= 10x sf0.1: 1M events, 6M lineitem). The driver's testdata is
read-only and tops out at sf0.1; this generator exists so the oracle sweep
and bench can run one-notch-and-more up, where data-dependent divergences
surface (round 6 found five of them going sf0.01 -> sf0.1).

Deliberate additions over a plain x10:
  * a HOT symbol: event_type 'click' carries ~50% of all events (the driver's
    tables are uniform across 5 types). This makes per-symbol windows and
    joins skew-visible, and feeds the salted-join bench comparison.
  * zero-price events (~0.006%, matching sf0.1's 6-in-100k) so the IEEE
    division legs stay exercised.
  * exact-duplicate documents (~0.16%, matching sf0.1's 8-in-5000).

Everything is deterministic from --seed (default 777 — deliberately NOT the
driver's 42: this is a different corpus, not an imitation of the driver's).

Usage: python3 scripts/gen_sf.py [--sf 1.0] [--out target/testdata/sf1] [--seed 777]
"""
import argparse
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark batch part line column order small sort fast value scan hash "
         "slow group agg filter query a big key window row table stream merge "
         "data vector join customer the").split()
LANGS = ["en", "de", "fr", "zh", "es"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
# 'click' is the deliberately hot symbol
EVENT_P = [0.50, 0.125, 0.125, 0.125, 0.125]
SEGMENTS = ["MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "dim", "cold", "green"]
PNOUN = ["ring", "bolt", "washer", "gear", "cam", "rod", "plate", "pin"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(out, name, table):
    path = out / f"{name}.parquet"
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen_events(rng, out, n_events, n_users):
    # sorted ns timestamps over Jan 1-30 2024 (weekends included for p6),
    # monotonic in event_id like the driver's data
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    t1 = np.datetime64("2024-01-30T23:59:59", "ns").astype(np.int64)
    ts = np.sort(rng.integers(t0, t1, n_events, dtype=np.int64))
    etype = rng.choice(len(EVENT_TYPES), n_events, p=EVENT_P)
    value = np.round(np.abs(rng.normal(80, 90, n_events)), 2)
    # ~0.006% exact zeros to keep the IEEE division legs exercised
    zeros = rng.choice(n_events, max(2, n_events // 16000), replace=False)
    value[zeros] = 0.0
    user = rng.integers(0, n_users, n_events, dtype=np.int64)
    props = pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)])
    write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": pa.array(user),
        "event_type": pa.array(np.array(EVENT_TYPES)[etype]),
        "value": pa.array(value),
        "props": props,
    }))


def gen_documents(rng, out, n_docs):
    lengths = rng.integers(8, 110, n_docs)
    texts = [" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), ln)])
             for ln in lengths]
    # exact duplicates at the driver's 8-in-5000 rate
    n_dup = max(2, round(n_docs * 8 / 5000))
    src = rng.choice(n_docs, n_dup, replace=False)
    dst = rng.choice(n_docs, n_dup, replace=False)
    for s, d in zip(src, dst):
        if s != d:
            texts[d] = texts[s]
    lang = np.array(LANGS)[rng.choice(len(LANGS), n_docs, p=LANG_P)]
    source = np.array([f"src{i}" for i in rng.integers(0, 20, n_docs)])
    write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))


def gen_embeddings(rng, out, n_vecs, dim=64):
    e = rng.normal(0, 1, (n_vecs, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vecs, dtype=np.int32)),
    }))


def gen_tpch(rng, out, n_cust, n_supp, n_part, n_orders, li_per_order):
    write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS)}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5)}))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust, dtype=np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])}))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp, dtype=np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2))}))
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part, dtype=np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + np.arange(n_part) * 0.1, 2))}))
    day = 24 * 3600 * 1000
    d0 = np.datetime64("1995-01-01", "ms").astype(np.int64)
    odate = d0 + rng.integers(0, 2404, n_orders, dtype=np.int64) * day
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders, dtype=np.int64)),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_orders), 2)),
        "o_orderdate": pa.array(odate, type=pa.timestamp("ms")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)])}))
    # lineitem: li_per_order lines per order on average (driver: 4)
    n_li = n_orders * li_per_order
    okey = np.repeat(np.arange(n_orders, dtype=np.int64), li_per_order)
    linenum = np.tile(np.arange(1, li_per_order + 1, dtype=np.int32), n_orders)
    sdate = d0 + rng.integers(1, 2500, n_li, dtype=np.int64) * day
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li, dtype=np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li, dtype=np.int64)),
        "l_linenumber": pa.array(linenum),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate, type=pa.timestamp("ms"))}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=777)
    a = ap.parse_args()
    out = Path(a.out or f"target/testdata/sf{a.sf:g}")
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    sf = a.sf
    print(f"generating sf={sf} seed={a.seed} -> {out}")
    n_cust = int(150_000 * sf)
    gen_events(rng, out, n_events=int(1_000_000 * sf), n_users=n_cust // 10)
    gen_documents(rng, out, n_docs=int(50_000 * sf))
    gen_embeddings(rng, out, n_vecs=int(8_000 * sf))
    gen_tpch(rng, out, n_cust=n_cust, n_supp=int(10_000 * sf),
             n_part=int(200_000 * sf), n_orders=int(1_500_000 * sf),
             li_per_order=4)
    print("done")


if __name__ == "__main__":
    main()
