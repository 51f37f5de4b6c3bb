#!/usr/bin/env python3
"""Deterministic synthetic-testdata generator (tooling, not engine code).

Reproduces the driver testdata's schemas and distributions at any scale
factor, so the gate can run ONCE at a scale the driver never ships
(sf1 ~ 10x the graded sf0.1) and turn the repo's 100-TB plan-shape
arguments into measured scaling exponents (SCALE.md "sf1 scale proof").

Same seed discipline as the shipped data (seed=42), same schemas
(verified against pyarrow.read_schema of /root/testdata/sf0.1), same
value universes (vocab/brands/segments/priorities read off the shipped
tables), and the same row-count scaling observed across
sf0.001/0.01/0.1. Values are NOT bit-identical to the driver's
generator (its code is not in the repo); that is irrelevant to the
gate, which compares the engine against DuckDB on the SAME files.

Usage: python3 scripts/gen_testdata.py <sf> <outdir>
e.g.   python3 scripts/gen_testdata.py 1 /tmp/sf1
"""
import sys
import json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(sf: float, outdir: str) -> None:
    import os
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    def write(name, table):
        # Row-group the file so Spark can SPLIT it: pyarrow's default is
        # one giant row group, which forces one scan task per table and
        # serializes CPU-heavy per-row operators (measured in the round-12
        # sf1 run: the whole gate crawled on one core). ~32 groups per
        # table, floored so tiny dims stay single-group.
        rg = max(4096, table.num_rows // 32)
        pq.write_table(table, f"{outdir}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {table.num_rows} rows ({-(-table.num_rows // rg)} row groups)")

    i32 = pa.int32()
    i64 = pa.int64()
    f64 = pa.float64()
    us = pa.timestamp("us")

    # region / nation: constant dimensions (identical at every sf)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    nations = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "CHINA", "EGYPT",
        "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN",
        "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE",
        "PERU", "ROMANIA", "RUSSIA", "SAUDI ARABIA", "UNITED KINGDOM",
        "UNITED STATES", "VIETNAM"]
    nation_region = [0, 1, 1, 1, 2, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0, 0,
                     1, 3, 3, 4, 3, 1, 2]
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), i32),
        "r_name": regions}))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), i32),
        "n_name": nations,
        "n_regionkey": pa.array(nation_region, i32)}))

    # customer
    n_cust = int(round(150000 * sf))
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), i64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), i32),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_cust), 2), f64),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"], n_cust)),
    }))

    # supplier
    n_supp = int(round(10000 * sf))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), i64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), i32),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n_supp), 2), f64),
    }))

    # part: "adjective noun" 8x8 name vocabulary, 25 brands
    n_part = int(round(200000 * sf))
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
             "widget"]
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), i64),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(rng.choice(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
            n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), i32),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 1000, n_part), 2), f64),
    }))

    # orders: day-granularity dates over 1995-01-01 .. 2001-08-01
    n_ord = int(round(1500000 * sf))
    d0 = np.datetime64("1995-01-01")
    days = rng.integers(0, 2405, n_ord)
    odate = (d0 + days.astype("timedelta64[D]")).astype("datetime64[us]")
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), i64),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), i64),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord)),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2), f64),
        "o_orderdate": pa.array(odate, us),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord)),
    }))

    # lineitem: ~4.07 lines/order (1 + Poisson(3.07)), independent dims
    lines_per = 1 + rng.poisson(3.07, n_ord)
    n_li = int(lines_per.sum())
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    sdays = rng.integers(1, 2500, n_li)
    sdate = (d0 + sdays.astype("timedelta64[D]")).astype("datetime64[us]")
    write("lineitem", pa.table({
        "l_orderkey": pa.array(okeys, i64),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), i64),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), i64),
        "l_linenumber": pa.array(lnum, i32),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64), f64),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n_li), 2), f64),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n_li) / 100.0, 2), f64),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, n_li) / 100.0, 2), f64),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], n_li)),
        "l_shipdate": pa.array(sdate, us),
    }))

    # events: 30 days of 2024-01, exponential values, JSON props
    n_ev = int(round(1000000 * sf))
    n_users = int(round(15000 * sf))
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1000000
    ts = t0 + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    ts = np.sort(ts)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), i64),
        "ts": pa.array(ts, us),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), i64),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n_ev)),
        "value": pa.array(
            np.round(rng.exponential(50.0, n_ev), 2), f64),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10..100 words over the 31-word vocab, weighted langs,
    # 20 uniform sources, ~0.16% exact-duplicate injections
    n_doc = int(round(50000 * sf))
    vocab = np.array([
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window"])
    wc = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in wc]
    n_dup = max(1, int(n_doc * 0.0016))
    for j in range(n_dup):
        src = int(rng.integers(0, n_doc // 2))
        dst = n_doc // 2 + int(rng.integers(0, n_doc // 2))
        texts[dst] = texts[src]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), i64),
        "text": texts,
        "lang": pa.array(rng.choice(
            ["en", "de", "es", "fr", "zh"], n_doc,
            p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], i64),
    }))

    # embeddings: 64-dim unit vectors around 10 label centroids (the
    # shipped table grows 4x per 10x sf: 500 @ 0.01, 2000 @ 0.1)
    n_emb = int(round(2000 * (sf / 0.1) ** 0.602))  # 4x per decade
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.9 * rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), i64),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs],
            pa.list_(pa.float32())),
        "label": pa.array(labels, i32),
    }))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
