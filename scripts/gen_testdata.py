"""Scale-factor test-data generator for slope benchmarking PAST the
driver-provided SFs (TESTDATA.md caps at sf0.1; /root/testdata is
read-only). Reproduces the same star schema, dtypes (pyarrow-verified
against sf0.1), vocabularies, and distribution shapes — row counts scale
linearly with sf relative to sf0.1's observed counts — so the 148
registered queries RUN unmodified and their wall-time SLOPES are
meaningful. NOT bit-compatible with the driver's seed: correctness is
gated at the driver SFs; this data exists only for SCALE.md's
sf0.01 -> sf0.1 -> sf1 curves.

Usage: python scripts/gen_testdata.py <out_dir> [sf]   (default sf=1.0)
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
LANGS = np.array(["en", "zh", "fr", "es", "de"])
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGS = ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "BUILDING", "FURNITURE"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["view", "click", "signup", "purchase", "error"]
PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
PADJ = ["large", "hot", "cold", "small", "steel", "green"]
PNOUN = ["ring", "bolt", "wheel", "plate", "gear", "cap"]

# sf0.1 observed row counts (the linear anchors)
BASE = {"customer": 15_000, "supplier": 1_000, "part": 20_000,
        "orders": 150_000, "lineitem": 600_000, "events": 100_000,
        "documents": 5_000, "embeddings": 2_000, "users": 1_500}

US_DAY = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(start: str, us: np.ndarray) -> pa.Array:
    base = np.datetime64(start, "us").astype("int64")
    return pa.array(base + us, type=pa.timestamp("us"))


def generate(out_dir: str, sf: float, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n = {k: max(1, int(round(v * sf / 0.1))) for k, v in BASE.items()}

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": pa.array(np.array(SEGS)[rng.integers(0, 5, nc)])}))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10000, ns), 2)}))

    npart = n["part"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": [f"{PADJ[i % 6]} {PNOUN[(i // 6) % 6]}"
                   for i in range(npart)],
        "p_brand": [f"Brand#{i % 20}" for i in range(npart)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(900 + (np.arange(npart) % 20000) / 10.0,
                                  2)}))

    no = n["orders"]
    span_days = int((np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
                    / np.timedelta64(1, "D"))
    odate_us = rng.integers(0, span_days, no) * US_DAY
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])
                                  [rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": _ts_us("1995-01-01", odate_us),
        "o_orderpriority": pa.array(np.array(PRIOS)
                                    [rng.integers(0, 5, no)])}))

    nl = n["lineitem"]
    okeys = rng.integers(0, no, nl)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype(float),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])
                                 [rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["O", "F"])
                                 [rng.integers(0, 2, nl)]),
        "l_shipdate": _ts_us("1995-01-02",
                             odate_us[okeys] + rng.integers(1, 96, nl)
                             * US_DAY)}))

    ne = n["events"]
    ts_us = np.sort(rng.integers(0, 30 * US_DAY, ne))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": _ts_us("2024-01-01", ts_us),
        "user_id": pa.array(rng.integers(0, n["users"], ne), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.uniform(0, 150, ne), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, ne)]}))

    nd = n["documents"]
    wc = rng.integers(10, 101, nd)
    words = VOCAB[rng.integers(0, len(VOCAB), int(wc.sum()))]
    offs = np.concatenate([[0], np.cumsum(wc)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(nd)]
    for i in range(0, nd - 1, 600):  # ~0.2% exact duplicate pairs
        texts[i + 1] = texts[i]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": pa.array(LANGS[rng.choice(5, nd, p=LANG_P)]),
        "source": [f"src{i % 20}" for i in range(nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    nv, dim, k = n["embeddings"], 64, 10
    cents = rng.normal(size=(k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, k, nv)
    vecs = cents[labels] + 0.6 * rng.normal(size=(nv, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array([v for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else ".testdata/sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} under {out}")
    generate(out, sf)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
