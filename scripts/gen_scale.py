#!/usr/bin/env python3
"""Deterministic scaled-up test data for the r17 scale-curve audit.

The driver's /root/testdata is read-only and tops out at sf0.1, which
cannot show how an operator's cost GROWS with the corpus (VERDICT r15
item 3 / r16 item 1: 142/451 queries run faster at 8 cores than 32 at
sf0.1 — the bench there measures scheduling overhead, not scaling).
This script synthesizes x3 and x10 copies of the sf0.1 corpus with the
SAME schemas and the same empirical distributions (measured from
sf0.1 directly — see OPTIMIZATION_r17.md for the measurement notes),
so time-vs-rows exponents can be fitted per operator.

Everything is seeded (numpy default_rng(42)); regenerating produces
byte-identical logical content. The output is a measurement corpus for
plan-scaling work only — correctness stays gated on the driver's own
/root/testdata via the DuckDB oracle.

Measured sf0.1 facts reproduced here:
  documents: 5000 rows; 31-word vocab, uniform token draw; lengths
    uniform 10..99 tokens; lang en 41%/others ~15%; 20 uniform sources;
    ~4.7% of docs are near-copies of an earlier doc with the tail
    truncated 1..3 tokens (jaccard 0.89..1.0); ~0.16% exact copies.
  embeddings: 2000 rows; 64-dim unit float32 vectors (no real label
    structure: per-label centroid norm ~= 1/sqrt(n), i.e. noise);
    label uniform int32 0..9.
  lineitem: 600000 rows; lines/order ~ empirical (Poisson-4-ish, 1..17);
    partkey uniform 1..nparts-1; suppkey uniform; qty uniform int 1..50;
    extendedprice = qty * unit_price(part) (per-part consistent,
    log-uniform ~21..105000); discount 0.00..0.10, tax 0.00..0.08 on
    the 0.01 grid; returnflag/linestatus uniform; shipdate uniform
    midnight 1995-01-02..2001-11-04 (independent of the order date).
  orders: 150000 rows; custkey uniform; status/priority uniform;
    totalprice uniform 1000..500000 (2dp); orderdate uniform midnight
    1995-01-01..2001-08-01.
  events: 100000 rows; event_id sequential; ts ascending with
    exponential gaps over 2024-01-01..-01-31; user_id uniform over
    customers/10; 5 uniform event types; value ~ Exp(mean 50) 2dp
    clipped to >= 0.01; props '{"k": 0..99}'.
  customer/supplier/part: sequential keys, uniform categoricals,
    acctbal uniform -1000..10000, retailprice 900.0..999.9 (0.1 grid).
  region/nation: fixed dimension tables, copied verbatim.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = None  # measured from sf0.1 documents on first use


def measured_vocab():
    global VOCAB
    if VOCAB is None:
        docs = pq.read_table(f"{SRC}/documents.parquet", columns=["text"])
        words = set()
        for t in docs.column("text").to_pylist()[:2000]:
            words.update(t.split())
        VOCAB = sorted(words)
    return VOCAB


def gen_documents(rng, n):
    vocab = np.array(measured_vocab())
    lens = rng.integers(10, 100, size=n)
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    lang = langs[rng.choice(5, size=n, p=lang_p)]
    source = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, size=n)]
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=l)]) for l in lens]
    # plant near-dups (4.7%: copy an earlier doc, truncate 1..3 tail
    # tokens, keep its lang) and exact dups (0.16%)
    n_near = int(round(n * 0.047))
    n_exact = max(1, int(round(n * 0.0016)))
    victims = rng.integers(0, n, size=n_near + n_exact)
    targets = rng.integers(0, n, size=n_near + n_exact)
    for i in range(n_near):
        v, t = victims[i], targets[i]
        if v == t:
            continue
        w = texts[t].split()
        cut = int(rng.integers(1, 4))
        if len(w) - cut >= 10:
            texts[v] = " ".join(w[: len(w) - cut])
            lang[v] = lang[t]
    for i in range(n_near, n_near + n_exact):
        v, t = victims[i], targets[i]
        if v != t:
            texts[v] = texts[t]
            lang[v] = lang[t]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang.tolist(), pa.string()),
        "source": pa.array(source.tolist(), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng, n):
    v = rng.standard_normal((n, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32), pa.int32()),
    })


def days_us(start, lo_days, n, rng):
    d = np.datetime64(start) + rng.integers(0, lo_days, size=n).astype("timedelta64[D]")
    return pa.array(d.astype("datetime64[us]"), pa.timestamp("us"))


def gen_orders(rng, n, ncust):
    return pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, ncust, size=n), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "O", "F"])[rng.integers(0, 3, n)].tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n), 2), pa.float64()),
        "o_orderdate": days_us("1995-01-01", 2405, n, rng),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n)].tolist()),
    })


def gen_lineitem(rng, norders, nparts, nsupp, unit_price):
    counts = np.clip(rng.poisson(4.0, size=norders), 1, 17)
    okey = np.repeat(np.arange(norders), counts)
    n = len(okey)
    linenumber = (np.arange(n) - np.repeat(np.cumsum(counts) - counts, counts) + 1).astype(np.int32)
    partkey = rng.integers(1, nparts, size=n)
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    return pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(partkey, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, nsupp, size=n), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(np.round(qty * unit_price[partkey], 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n)].tolist()),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n)].tolist()),
        "l_shipdate": days_us("1995-01-02", 2499, n, rng),
    })


def gen_events(rng, n, nusers):
    gaps = rng.exponential(1.0, size=n)
    ts = np.datetime64("2024-01-01") + (
        np.cumsum(gaps) / gaps.sum() * (30 * 86400e6 - 1e6)
    ).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, nusers, size=n), pa.int64()),
        "event_type": pa.array(np.array(
            ["click", "view", "purchase", "signup", "error"]
        )[rng.integers(0, 5, n)].tolist()),
        "value": pa.array(np.maximum(np.round(rng.exponential(50.0, n), 2), 0.01), pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    })


def gen_customer(rng, n):
    return pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2), pa.float64()),
        "c_mktsegment": pa.array(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[rng.integers(0, 5, n)].tolist()),
    })


def gen_supplier(rng, n):
    return pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int64()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2), pa.float64()),
    })


def gen_part(rng, n):
    adj = ["large", "hot", "small", "cold", "bright", "dark", "smooth", "rough"]
    noun = ["ring", "bolt", "gear", "valve", "wheel", "plate", "rod", "pin"]
    names = [f"{adj[int(a)]} {noun[int(b)]}" for a, b in
             zip(rng.integers(0, 8, n), rng.integers(0, 8, n))]
    return pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, n)].tolist()),
        "p_size": pa.array(rng.integers(1, 51, n), pa.int64()),
        "p_retailprice": pa.array(np.round(900 + rng.integers(0, 1000, n) / 10.0, 1), pa.float64()),
    })


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/root/scaledata"
    for mult in (3, 10):
        out = f"{out_root}/x{mult}"
        if os.path.exists(f"{out}/_done.txt"):
            print(f"{out} already generated, skipping")
            continue
        os.makedirs(out, exist_ok=True)
        rng = np.random.default_rng(42 + mult)
        for t in ("region", "nation"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        nparts = 20000 * mult
        unit_price = np.exp(rng.uniform(np.log(21.0), np.log(105000.0), size=nparts))
        tables = {
            "supplier": gen_supplier(rng, 1000 * mult),
            "customer": gen_customer(rng, 15000 * mult),
            "part": gen_part(rng, nparts),
            "orders": gen_orders(rng, 150000 * mult, 15000 * mult),
            "lineitem": gen_lineitem(rng, 150000 * mult, nparts, 1000 * mult, unit_price),
            "events": gen_events(rng, 100000 * mult, 1500 * mult),
            "documents": gen_documents(rng, 5000 * mult),
            "embeddings": gen_embeddings(rng, 2000 * mult),
        }
        for name, tbl in tables.items():
            pq.write_table(tbl, f"{out}/{name}.parquet")
            print(f"{out}/{name}.parquet: {tbl.num_rows} rows")
        with open(f"{out}/_done.txt", "w") as f:
            f.write(f"x{mult} of sf0.1, seed {42 + mult}\n")


if __name__ == "__main__":
    main()
