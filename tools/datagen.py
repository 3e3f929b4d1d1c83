#!/usr/bin/env python3
"""Scale-factor testdata generator (builder tooling, mirrors the
driver's sf0.001/0.01/0.1 tables so the gate + bench can run at SFs
the driver does not ship — round 12's ask is sf1.0).

Schema, categorical domains, and distribution shapes are matched to
the driver's parquet (probed from /root/testdata/sf0.1):
  - region/nation: fixed dims, copied verbatim from the probe dir.
  - customer 150k·sf, supplier 10k·sf, part 200k·sf, orders 1.5M·sf.
  - lineitem 6M·sf INDEPENDENT rows: l_orderkey uniform over orders
    (matches the observed distinct-order count 147,236/150k ≈
    n(1-e^-4)), l_linenumber uniform 1..7 (observed (okey,lineno)
    collisions prove it is not sequential-per-order), l_shipdate
    independent of o_orderdate (observed diff spans ±2400 days).
  - events 1M·sf: ts uniform over Jan 2024 at µs resolution, user_id
    uniform over 15k·sf users, value ~ Exp(mean 50) (observed
    quantiles 34.7/69/114/228 = 50·ln2/ln4/ln10/ln100), props
    '{"k": 0..99}'.
  - documents 50k·sf: 10..100 uniform tokens over the 31-word vocab,
    lang p=(en .4, de/zh/fr/es .15), source src0..19 uniform,
    plus 1.6 exact-duplicate pairs per 1000 docs (observed 8/5000).
  - embeddings 20k·sf: 64-dim unit-norm gaussian float32, label
    uniform 0..9 (probe shows no label/vector correlation).

The gate at a generated SF is self-consistent (Spark vs DuckDB on the
SAME parquet), so distributional fidelity here is about workload
realism, not correctness.

Usage: python3 tools/datagen.py <outDir> <sf> [--probe-dir /root/testdata/sf0.1]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = (["en", "de", "zh", "fr", "es"], [0.40, 0.15, 0.15, 0.15, 0.15])
SOURCES = [f"src{i}" for i in range(20)]
MKT = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["F", "O", "P"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]

US_PER_DAY = 86_400_000_000


def day_us(date_str):
    return np.datetime64(date_str).astype("datetime64[us]").astype(np.int64)


def write(out_dir, name, table):
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def main():
    out_dir, sf = sys.argv[1], float(sys.argv[2])
    probe = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    # fixed dims: verbatim copy keeps key domains identical across SFs
    for t in ("region", "nation"):
        write(out_dir, t, pq.read_table(f"{probe}/{t}.parquet"))

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(MKT)[rng.integers(0, 5, n_cust)]),
    }))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }))

    adj = np.array(ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUN)[rng.integers(0, 8, n_part)]
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([f"{a} {n}" for a, n in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPE)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
    }))

    od0, od1 = day_us("1995-01-01"), day_us("2001-08-02")
    odate = (rng.integers(od0 // US_PER_DAY, od1 // US_PER_DAY, n_ord)
             * US_PER_DAY)
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(STATUS)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, n_ord)]),
    }))

    sd0, sd1 = day_us("1995-01-02"), day_us("2001-11-05")
    sdate = (rng.integers(sd0 // US_PER_DAY, sd1 // US_PER_DAY, n_li)
             * US_PER_DAY)
    rf = np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
    ls = np.array(["F", "O"])[rng.integers(0, 2, n_li)]
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(rf),
        "l_linestatus": pa.array(ls),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    ts0, ts1 = day_us("2024-01-01"), day_us("2024-01-31")
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(ts0, ts1, n_ev)), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(15_000 * sf), n_ev).astype(np.int64)),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.exponential(50.0, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    n_words = rng.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(n_words.sum()))]
    texts, pos = [], 0
    for w in n_words:
        texts.append(" ".join(flat[pos:pos + w])); pos += w
    # exact-duplicate pairs, ~1.6 per 1000 docs (observed 8 per 5000)
    for _ in range(round(n_doc * 0.0016)):
        a, b = rng.integers(0, n_doc, 2)
        if a != b:
            texts[int(b)] = texts[int(a)]
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS[0], n_doc, p=LANGS[1])),
        "source": pa.array(rng.choice(SOURCES, n_doc)),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    }))
    print(f"done: sf={sf} at {out_dir}")


if __name__ == "__main__":
    main()
