#!/usr/bin/env python
"""Generate driver-compatible synthetic fixtures (schema parity with
TESTDATA.md) so the suite and bench can run OUTSIDE the grading
sandbox — CI, a laptop, a cluster edge node.

The driver's own fixtures under /root/testdata are authoritative and
read-only; this generator exists for environments that don't have
them. Same table set, column names/types, and the distribution shapes
the tests rely on:

- TPC-H-ish star schema (region/nation/customer/supplier/part/orders/
  lineitem) over a 1995-2001 order calendar, money on a 2-decimal grid;
- an events stream table (one month, sessionizable user activity,
  JSON props);
- documents with a zipf-ish shared vocabulary, exact-duplicate
  clusters and shingled near-duplicates (so dedup operators return
  non-trivial results);
- embeddings: near-uniform float32 vectors (64 dims) with labels.

Deterministic under --seed (default 42). Usage:

    python tools/gen_testdata.py --out ./testdata --sf 0.001 0.01
    SPARK_GRAFT_TESTDATA=./testdata python -m pytest tests/
"""

from __future__ import annotations

import argparse
import datetime
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
BRANDS = [f"Brand#{i}" for i in range(1, 6)]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
VOCAB = (
    "the a spark data table row column key value join merge sort hash agg "
    "filter scan query group window batch stream part order line customer "
    "small big fast slow vector dup"
).split()

BASE_ROWS = {  # rows at sf=0.001 (matches the driver's sf0.001 shapes)
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem_per_order": 4,  # ~6000 lineitems
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}

ORDER_EPOCH = datetime.datetime(1995, 1, 1)
ORDER_DAYS = 2404  # through 2001-08
EVENT_EPOCH = datetime.datetime(2024, 1, 1)


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _write(out: Path, name: str, table: pa.Table) -> None:
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, out / f"{name}.parquet")


def generate(out_dir: Path, sf: float, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    k = sf / 0.001

    def n(key):
        # documents/embeddings follow the driver's SUB-linear curve
        # (500/500/2000 embeddings and 500/500/5000 documents at
        # sf 0.001/0.01/0.1): the corpus tables feed O(n²) validation
        # instruments (exact near-dup pairs, dense mutual-NN, SemDeDup)
        # whose whole point is to stay fixture-sized — linear scaling
        # here turns minutes of suite into hours and trips the
        # intentional >50k/>100k guards.
        if key == "embeddings":
            return 500 if sf <= 0.01 else min(40_000, int(2000 * sf / 0.1))
        if key == "documents":
            return 500 if sf <= 0.01 else min(50_000, int(5000 * sf / 0.1))
        return max(1, int(BASE_ROWS[key] * k))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n("customer")
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": _money(rng, -999.99, 9999.99, nc),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, nc)],
    }))

    ns = n("supplier")
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": _money(rng, -999.99, 9999.99, ns),
    }))

    npart = n("part")
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(npart), pa.int64()),
        "p_name": [f"part {i} {VOCAB[i % len(VOCAB)]}" for i in range(npart)],
        "p_brand": [BRANDS[i] for i in rng.integers(0, len(BRANDS), npart)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), npart)],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": _money(rng, 900.0, 2000.0, npart),
    }))

    no = n("orders")
    odays = rng.integers(0, ORDER_DAYS, no)
    osecs = rng.integers(0, 86_400, no)
    odates = np.array(
        [ORDER_EPOCH + datetime.timedelta(days=int(d)) for d in odays]
    )
    ostatus = np.where(
        odays > ORDER_DAYS - 400, "O", np.where(rng.random(no) < 0.05, "P", "F")
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": ostatus.tolist(),
        "o_totalprice": _money(rng, 1000.0, 500_000.0, no),
        "o_orderdate": pa.array(odates.tolist(), pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, no)],
    }))
    del osecs

    lines, lkeys = [], []
    for okey in range(no):
        for ln in range(1 + int(rng.integers(0, 2 * BASE_ROWS["lineitem_per_order"] - 1))):
            lines.append(ln + 1)
            lkeys.append(okey)
    nl = len(lines)
    qty = rng.integers(1, 51, nl).astype("float64")
    unit = np.round(rng.uniform(900.0, 2000.0, nl), 2)
    ship_lag = rng.integers(1, 121, nl)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(lines, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": np.where(
            rng.random(nl) < 0.25, "R", np.where(rng.random(nl) < 0.5, "A", "N")
        ).tolist(),
        "l_linestatus": np.where(rng.random(nl) < 0.5, "O", "F").tolist(),
        "l_shipdate": pa.array(
            [
                ORDER_EPOCH + datetime.timedelta(days=int(odays[k_] + s))
                for k_, s in zip(lkeys, ship_lag)
            ],
            pa.timestamp("us"),
        ),
    }))

    ne = n("events")
    nusers = max(5, int(15 * k))
    ets = np.sort(rng.uniform(0, 30 * 86_400_000_000, ne)).astype("int64")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(ne), pa.int64()),
        "ts": pa.array(
            [EVENT_EPOCH + datetime.timedelta(microseconds=int(t)) for t in ets],
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.integers(0, nusers, ne), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0.0, 200.0, ne), 2),
        "props": [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, ne)],
    }))

    nd = n("documents")
    zipf_p = 1.0 / np.arange(1, len(VOCAB) + 1)
    zipf_p /= zipf_p.sum()
    texts: list[str] = []
    for i in range(nd):
        if i % 17 == 16 and texts:  # exact-duplicate clusters
            texts.append(texts[rng.integers(0, len(texts))])
            continue
        nw = int(rng.integers(20, 90))
        words = [VOCAB[j] for j in rng.choice(len(VOCAB), nw, p=zipf_p)]
        if i % 11 == 10 and texts:  # near-duplicate: mutate one word
            base = texts[rng.integers(0, len(texts))].split()
            if len(base) > 3:
                base[int(rng.integers(0, len(base)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
                words = base
        texts.append(" ".join(words))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(nd), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, nd)],
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n("embeddings")
    # CENTERED uniform, matching the driver fixtures: zero-mean i.i.d.
    # coordinates put pairwise cosine ~ N(0, 1/64), so "near-dup"
    # thresholds select a sparse pair set. (A [0,1) draw shares a +0.5
    # mean component across every vector — ALL pairwise cosines land
    # ≈0.75 and every similarity operator degenerates to all-pairs;
    # caught when the sf1.0 scaling decade blew up on it, round 5.)
    vecs = (rng.random((nv, 64), dtype=np.float32) * 2.0 - 1.0).astype(
        np.float32
    )
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(nv), pa.int64()),
        "embedding": pa.array(
            [v.tolist() for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="./testdata", type=Path)
    ap.add_argument("--sf", nargs="+", type=float, default=[0.001, 0.01])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    for sf in args.sf:
        d = args.out / f"sf{sf:g}"
        generate(d, sf, args.seed)
        print(f"wrote {d}")


if __name__ == "__main__":
    main()
