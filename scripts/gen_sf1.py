"""Generate an sf1-scale fixture (10x the driver's sf0.1) for local
scale probes.

The driver's testdata tops out at sf0.1 (TESTDATA.md) — every
100-TB-scale claim in SURVEY.md §4.1 is otherwise a plan-shape
argument.  This script synthesizes the same ten tables with the same
schemas, value formats, and FK structure at 10x the rows (seeded,
deterministic), written to ``testdata_sf1/`` (gitignored).  bench.py
picks it up via ``SPARK_GRAFT_SF1_DIR`` (defaulting to
``testdata_sf1/`` next to bench.py) and records an ``sf1`` probe
group when the directory exists.  (``SPARK_GRAFT_SF_DIR`` is the
separate knob for the MAIN sf0.1 bench groups — pointing it here
would run the whole bench at sf1 instead of enabling the probe.)

Distributions mirror the sf0.1 fixture (inspected, not copied):
uniform mktsegments/priorities/returnflags, 1995-2001 date windows,
~4 lineitems per order, 20 sources x 5 langs zipf-ish documents over a
small vocabulary with planted exact- and near-duplicate groups,
uniform events over 30 days, unit-norm random 64-dim embeddings.

Usage::

    python scripts/gen_sf1.py [out_dir] [scale]

``scale`` is relative to sf0.1 (default 10 → "sf1").
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = {  # sf0.1 row counts (scale=1 reproduces sf0.1's shape)
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "users": 1_500,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
STATUSES = ["O", "F", "P"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
PADJ = ["large", "hot", "small", "cold", "dim", "bright", "tiny", "huge"]
PNOUN = ["ring", "bolt", "screw", "panel", "wire", "tube", "gear", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]  # en weighted ~2.8x
LANG_P = [0.42, 0.15, 0.155, 0.15, 0.125]
VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle plan stage task broadcast skew cache disk memory "
    "read write commit"
).split()


def day_ts(rng, n, lo="1995-01-01", hi="2001-08-01"):
    lo64 = np.datetime64(lo)
    days = int((np.datetime64(hi) - lo64) / np.timedelta64(1, "D"))
    return lo64 + rng.integers(0, days + 1, n).astype("timedelta64[D]")


def write(out_dir, name, table):
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def gen(out_dir: str, scale: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(4242)

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = BASE["customer"] * scale
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    n_supp = BASE["supplier"] * scale
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = BASE["part"] * scale
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(PADJ), n_part),
                rng.integers(0, len(PNOUN), n_part),
            )
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + rng.uniform(0, 1200, n_part), 2),
    }))

    n_ord = BASE["orders"] * scale
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450000, n_ord), 2),
        "o_orderdate": pa.array(
            day_ts(rng, n_ord).astype("datetime64[us]"), pa.timestamp("us")
        ),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # ~4 lineitems per order, 1..7 each
    per = rng.integers(1, 8, n_ord)
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), per)
    n_li = len(okeys)
    linenum = np.concatenate([np.arange(1, c + 1) for c in per])
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            day_ts(rng, n_li, "1995-01-02", "2001-11-04").astype(
                "datetime64[us]"
            ),
            pa.timestamp("us"),
        ),
    }))

    n_ev = BASE["events"] * scale
    n_users = BASE["users"] * scale
    base_ts = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ev_ts = base_ts + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    ev_ts = np.sort(ev_ts)
    write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 100, n_ev), 4),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 20 sources, 5 langs, 10..100-word texts over VOCAB;
    # planted duplicate structure for the dedup operators —
    #   i % 200 == 199 → exact duplicate of doc i-1
    #   i % 97  == 96  → near-duplicate of doc i-1 (2 words changed)
    n_doc = BASE["documents"] * scale
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i % 200 == 199 and i > 0:
            texts.append(texts[i - 1])
            continue
        if i % 97 == 96 and i > 0:
            words = texts[i - 1].split()
            for j in rng.integers(0, len(words), 2):
                words[j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))
            continue
        texts.append(
            " ".join(vocab[rng.integers(0, len(vocab), lengths[i])])
        )
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ],
        "source": [f"src{k}" for k in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = BASE["embeddings"] * scale
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    gen(out, scale)
