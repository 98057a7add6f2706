"""Synthetic testdata generator — extends the driver's sf ladder
beyond the read-only /root/testdata (r11 verdict #2: stand up an sf1
sweep of the heavy dedup/ANN/graph/tokenizer tier).

Reproduces the driver tables' schemas and distributions (measured
from /root/testdata/sf0.1 — row-count ratios, value ranges, category
weights, unit-norm embeddings, the 31-word document vocabulary and
its exact-dup rate), NOT its bytes: every oracle compare is Spark vs
DuckDB over the SAME parquet, so self-consistency is what the sweep
certifies, and the distributions only need to keep the operators'
work realistic (planted dup mass, skewed co-purchase graph, label
balance).

Usage: python tools/gen_testdata.py 1.0 /root/repo/testdata/sf1
Deterministic per (sf, seed); ~170 MB at sf=1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _ts_array(micros: np.ndarray) -> pa.Array:
    return pa.array(micros, type=pa.timestamp("us"))


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def generate(sf: float, outdir: str, seed: int = SEED) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng([seed, int(sf * 10_000)])

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(MKTSEGS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
            )
        ],
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(0, 25, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 1),
    }))

    date_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    date_hi = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    n_days = (date_hi - date_lo) // DAY_US
    odate = date_lo + rng.integers(0, n_days + 1, n_ord) * DAY_US
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_array(odate),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: 1 + Poisson(3.07) lines per order (mean ~4.07, as
    # measured), truncated at 17; shipdate independent of orderdate
    # (measured: deltas span +/- years — the driver draws them
    # independently over a slightly wider window)
    per_order = np.minimum(1 + rng.poisson(3.07, n_ord), 17)
    n_li = int(per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord), per_order)
    linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(per_order) - per_order, per_order) + 1
    )
    ship_hi = np.datetime64("2001-11-05").astype("datetime64[us]").astype(np.int64)
    ship_days = (ship_hi - date_lo) // DAY_US
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(RETFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_array(
            date_lo + rng.integers(1, ship_days + 1, n_li) * DAY_US
        ),
    }))

    # events: ts-sorted exponential arrival gaps over ~30 days,
    # microsecond granularity; value exponential (median ~35)
    ev_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    gaps = rng.exponential(30 * DAY_US / n_ev, n_ev)
    ts = ev_lo + np.cumsum(gaps).astype(np.int64)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 101, n_ev)]
        ),
    }))

    # documents: 10-100 words over the 31-word vocabulary (near-dup
    # mass emerges naturally from the tiny vocabulary, as in the
    # driver data); ~0.16% exact duplicates planted at the tail
    n_base = n_doc - max(1, int(0.0016 * n_doc))
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 101, n_base)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths
    ]
    dup_of = rng.integers(0, n_base, n_doc - n_base)
    texts.extend(texts[i] for i in dup_of)
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_W)
        ]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm 64-dim float32, labels 0..9
    vecs = rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/testdata/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
