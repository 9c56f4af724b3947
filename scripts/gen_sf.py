"""Regenerate a bench-scale testdata directory (schema- and
distribution-faithful to /root/testdata/sf*, which TESTDATA.md documents
as deterministic seed-42 synthetic data).

This exists ONLY to time queries at the driver's measurement scale
(BENCH_r05.json was measured at sf1.0); correctness/oracle checks stay
on the driver-provided SFs. Row counts scale linearly:

  events 1M*sf, users 15k*sf, documents 50k*sf, embeddings 20k*sf,
  lineitem 6M*sf, orders 1.5M*sf, customer 150k*sf, part 200k*sf,
  supplier 10k*sf, nation 25, region 5.

One parquet FILE per table (matching the driver layout — scan
parallelism behavior depends on it).

Usage: python scripts/gen_sf.py SF OUT_DIR   e.g. 1.0 /root/testdata_gen/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan slow a "
    "hash group agg filter query big key window join scale table row plan "
    "shuffle cache disk merge read"
).split()
assert len(VOCAB) == 31

LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
ETYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD", "FURNITURE"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO"]
ADJ = ["large", "hot", "blue", "small", "cold", "new", "old", "red"]
NOUN = ["ring", "bolt", "rod", "anvil", "gear", "cog", "wheel", "pin"]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(name, table.num_rows, flush=True)


def main() -> int:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)
    n_li = int(6_000_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)

    # ---- events (ts-sorted uniform over Jan 2024)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span = 30 * 86400 * 1_000_000
    ts = np.sort(t0 + rng.integers(0, span, n_events))
    write(out_dir, "events", pa.table({
        "event_id": np.arange(n_events, dtype=np.int64),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, n_events),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_events)]),
        "value": np.round(rng.exponential(50.0, n_events), 2),
        "props": pa.array(
            np.char.add(
                np.char.add('{"k": ', rng.integers(0, 100, n_events).astype(str)),
                "}",
            )
        ),
    }))

    # ---- documents (10-100 words from the 31-word vocab)
    nw = rng.integers(10, 101, n_docs)
    tot = int(nw.sum())
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), tot)]
    bounds = np.concatenate(([0], np.cumsum(nw)))
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n_docs)]
    write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_docs, p=LANG_P)]),
        "source": pa.array(
            np.char.add("src", rng.integers(0, 20, n_docs).astype(str))
        ),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # ---- embeddings (unit-norm 64-dim)
    v = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_vecs, dtype=np.int64),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_vecs).astype(np.int32),
    }))

    # ---- lineitem (uniform orderkey membership, day-granularity dates)
    day = 86400 * 1_000_000
    d0 = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": np.sort(rng.integers(0, n_orders, n_li)),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            d0 + rng.integers(0, 2500, n_li) * day, type=pa.timestamp("us")
        ),
    }))

    # ---- orders
    write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_orders, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": pa.array(
            d0 + rng.integers(0, 2405, n_orders) * day, type=pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(np.array(PRIOS)[rng.integers(0, 5, n_orders)]),
    }))

    # ---- customer / part / supplier / nation / region
    write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    names = np.char.add(
        np.char.add(np.array(ADJ)[rng.integers(0, 8, n_part)], " "),
        np.array(NOUN)[rng.integers(0, 8, n_part)],
    )
    write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": pa.array(names),
        "p_brand": pa.array(
            np.char.add("Brand#", rng.integers(0, 25, n_part).astype(str))
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + rng.integers(0, 10_000, n_part) * 0.1, 1),
    }))
    write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": pa.array([f"NATION{i:02d}" for i in range(25)]),
        "n_regionkey": (np.arange(25, dtype=np.int32) % 5),
    }))
    write(out_dir, "region", pa.table({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
