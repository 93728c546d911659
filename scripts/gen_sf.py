#!/usr/bin/env python
"""Deterministic fixture generator for scale factors the driver does not
ship. The driver provides /root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md,
read-only); the sf1 benchmark (round-5 verdict item #1) needs 10x the
largest fixture. This script regenerates every table with the SAME
schemas (physical parquet types included), value domains, and planted
dedup/near-dup structure observed in the driver fixtures, scaled by
``sf`` — so a Spark-vs-DuckDB comparison at sf1 runs both engines over
identical files whose shapes are continuous with the smaller SFs.

It is NOT byte-compatible with the driver's own generator (different
RNG); correctness gates keep running on the driver fixtures. Everything
here is seeded: the same (sf, seed) yields byte-identical tables.

Distribution notes (measured from /root/testdata/sf0.1):
- customer/supplier/part/orders/lineitem: classic TPC-H-ish uniform
  domains; p_retailprice = 900 + (key % 1000) * 0.1; shipdate is
  independent of the order date (measured corr ~0).
- events: ts sorted ascending over Jan 2024 (30 days), value ~
  Exponential(mean 50) (measured quantiles 14.6/34.8/68.9/228 at
  p25/50/75/99), user_id uniform over 15000*sf users.
- documents: 10-100 words uniform from the fixture's 31-word vocab,
  lang ~ {en: .41, others ~.1475}, source = src{doc_id % 20},
  n_chars = len(text); planted structure: doc_id % 100 == 1 is a
  3-word-perturbed near-copy of doc_id-1 (word-3-gram Jaccard ~0.8),
  doc_id % 500 == 2 is an exact copy of doc_id-2 (the fixtures carry
  ~0.3% exact dups and ~5% near-dup pairs at small SF). Above sf0.1
  the vocab grows a "w<i>" tail with the CUBE ROOT of scale (67 words
  at sf1): with the fixed 31-word vocab every 3-gram shingle's doc
  frequency at sf1 (~87) would cross the stop-shingle DF cap (50) and
  the ngram family would degenerate to all-boilerplate; real corpora
  grow vocabulary with size (Heaps' law), and the cube-root growth
  holds the shingle DF distribution continuous with the driver SFs.
  Additionally ~0.5% of documents (doc_id % 211 == 7, excluding rows
  the dup branches reference) carry NULL text and NULL n_chars — the
  failed-extraction rows a real corpus has, exercising the NULL
  coalesce paths (media payload builder, quality_filter null_text)
  under the oracle hashes instead of only pytest. The driver's own
  fixtures carry no NULLs, so driver-gate hashes are unaffected.
- embeddings: unit-norm 64-dim around 10 cluster centers (label =
  cluster); vec_id % 41 == 1 is a tiny-noise near-copy of vec_id-1
  (cosine > 0.99) for the near-dup/semantic families.

Usage: python scripts/gen_sf.py <out_dir> [sf]   (default sf=1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "plate", "ring", "rod", "widget", "wrench"]
DAY_US = 86_400_000_000  # microseconds


def _write(out: str, name: str, cols: dict, schema: pa.Schema) -> None:
    table = pa.table(cols, schema=schema)
    # Parquet row groups are Spark's split granularity: a table written
    # as one huge group becomes ONE task no matter how many executors
    # exist. Target >= 64 groups per table (bounded below at 1024 rows)
    # so every fixture gives full parallelism at local[32] and beyond.
    rg = max(1024, table.num_rows // 64)
    pq.write_table(table, os.path.join(out, f"{name}.parquet"), row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows ({rg} rows/group)")


def _ts_us(day0: str, us: np.ndarray) -> pa.Array:
    base = np.datetime64(day0, "us").astype("int64")
    return pa.array(base + us, type=pa.timestamp("us"))


def generate(out: str, sf: float) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1500, int(1_500_000 * sf))
    n_li = max(6000, int(6_000_000 * sf))
    n_ev = max(1000, int(1_000_000 * sf))
    n_users = max(15, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(
        out,
        "region",
        {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    _write(
        out,
        "nation",
        {
            "n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32),
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )

    ck = np.arange(n_cust, dtype=np.int64)
    _write(
        out,
        "customer",
        {
            "c_custkey": ck,
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    _write(
        out,
        "supplier",
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )

    pk = np.arange(n_part, dtype=np.int64)
    names = np.array([f"{a} {n}" for a in ADJ for n in NOUN])
    _write(
        out,
        "part",
        {
            "p_partkey": pk,
            "p_name": names[rng.integers(0, len(names), n_part)],
            "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
                rng.integers(0, 25, n_part)
            ],
            "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
            "p_size": rng.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": np.round(900.0 + (pk % 1000) * 0.1, 1),
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )

    # orders: dates midnight-aligned over 1995-01-01..2001-08-01
    n_days = int(
        (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    )
    odate_us = rng.integers(0, n_days + 1, n_ord) * DAY_US
    _write(
        out,
        "orders",
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
            "o_orderdate": _ts_us("1995-01-01", odate_us),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    sdate_us = rng.integers(1, n_days + 96, n_li) * DAY_US
    _write(
        out,
        "lineitem",
        {
            "l_orderkey": rng.integers(0, n_ord, n_li),
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": _ts_us("1995-01-01", sdate_us),
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )

    # events: ascending timestamps over Jan 1-30 2024
    span_us = 30 * DAY_US - 1
    ts = np.sort(rng.integers(0, span_us, n_ev))
    _write(
        out,
        "events",
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": _ts_us("2024-01-01", ts),
            "user_id": rng.integers(0, n_users, n_ev),
            "event_type": np.array(
                ["click", "error", "purchase", "signup", "view"]
            )[rng.integers(0, 5, n_ev)],
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )

    # documents with planted exact dups + near-dups; vocab tail grows
    # with the cube root of scale past sf0.1 (see module docstring)
    n_vocab = max(len(VOCAB), round(len(VOCAB) * (sf / 0.1) ** (1 / 3)))
    vocab = np.array(
        VOCAB + [f"w{i}" for i in range(n_vocab - len(VOCAB))]
    )
    lens = rng.integers(10, 101, n_doc)
    texts: list[str | None] = []
    for i in range(n_doc):
        if i % 500 == 2 and i >= 2:
            texts.append(texts[i - 2])  # exact duplicate
            continue
        if i % 100 == 1 and i >= 1:
            words = texts[i - 1].split(" ")
            for pos in rng.integers(0, len(words), 3):
                words[pos] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))  # near-duplicate
            continue
        # NULL-text slice (~0.5%, r7 verdict #5): real corpora carry
        # rows whose text failed extraction; the coalesce paths in the
        # media builder / quality filter need fixture teeth, not just
        # pytest pins. Never a row the dup branches above reference
        # (i % 100 == 0 is the next row's near-dup source, i % 500 == 0
        # the +2 row's exact-dup source) so the planted-dup structure
        # is unchanged.
        if i % 211 == 7 and i % 100 != 0 and i % 500 != 0:
            texts.append(None)
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    _write(
        out,
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[
                rng.choice(len(LANGS), n_doc, p=LANG_P)
            ],
            "source": [f"src{i % 20}" for i in range(n_doc)],
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts],
                type=pa.int64(),
            ),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )

    # embeddings: unit vectors around 10 centers + planted near-copies
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs = 2.0 * centers[labels] + rng.normal(size=(n_emb, 64))
    near = (np.arange(n_emb) % 41 == 1) & (np.arange(n_emb) >= 1)
    idx = np.nonzero(near)[0]
    vecs[idx] = vecs[idx - 1] + 0.02 * rng.normal(size=(len(idx), 64))
    labels[idx] = labels[idx - 1]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), type=pa.float32()), 64
    ).cast(pa.list_(pa.float32()))
    _write(
        out,
        "embeddings",
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": emb,
            "label": labels,
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={scale} -> {out_dir}")
    generate(out_dir, scale)
