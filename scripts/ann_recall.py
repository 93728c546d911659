#!/usr/bin/env python
"""ANN recall at sf1 (r8 verdict #6): the IVF/SQ8/RP recall gates run on
planted clusters at fixture scale; this measures recall@k for every ANN
tier against BRUTE-FORCE exact cosine over the real sf1 embeddings
table (20k x 64), across a spread of query vectors:

- ivf_batch @ probes in {1, 2, 4}: one distributed ivf_topk_batch pass
  per probe count over Q queries — the serving-shape path and the
  multi-probe recall lever the index documents.
- ivf / sq8 / rp single-query tiers (the driver-slot shapes,
  parameterized by query_vec_id): mean recall over a smaller query set
  (each query is one Spark job — the batch tier is the many-query path).

Ground truth is computed driver-side in numpy (20k x 64 fits trivially;
the MEASUREMENT may centralize, the operators under test never do).
Recall@k counts |approx ∩ exact| / k with exact ties broken by vec_id,
matching every tier's (cosine desc, vec_id) ordering.

Usage: python scripts/ann_recall.py [--sf-dir .benchdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
BATCH_QUERIES = 64  # ids spread across the corpus
SINGLE_QUERIES = 12  # driver-loop tiers: one job per query


def _planted_dir() -> str:
    """Deterministic sf1-SIZED well-separated corpus (the planted-
    cluster regime the pytest recall gates cover at fixture scale):
    same n/d/k as sf1 but signal 4x center + 0.5x noise instead of
    2x + 1x, so nearest neighbors are cluster-aligned. Lets the same
    recall protocol measure BOTH regimes at the same scale."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    seed, n, d, k = 777, 20000, 64, 10
    signal, noise = 4.0, 0.5
    # Cache path embeds a hash of EVERY generation constant: changing
    # the recipe changes the path, so a stale artifact from an older
    # recipe can never be silently reused (and the per-user suffix
    # avoids trusting a world-writable shared path on multi-user hosts).
    recipe = hashlib.sha256(
        repr((seed, n, d, k, signal, noise)).encode()
    ).hexdigest()[:12]
    out = os.path.join(
        tempfile.gettempdir(),
        f"ann_recall_planted_{recipe}_u{os.getuid()}",
    )
    path = os.path.join(out, "embeddings.parquet")
    if os.path.exists(path):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n).astype(np.int32)
    vecs = signal * centers[labels] + noise * rng.normal(size=(n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), type=pa.float32()), d
    ).cast(pa.list_(pa.float32()))
    # write-then-rename: an interrupted first run must not leave a
    # truncated file the exists-check would trust forever
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": emb,
                "label": pa.array(labels),
            }
        ),
        path + ".tmp",
    )
    os.replace(path + ".tmp", path)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".benchdata/sf1")
    ap.add_argument(
        "--planted",
        action="store_true",
        help="measure on the deterministic well-separated planted corpus "
        "instead of --sf-dir (same 20k x 64 scale)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.planted:
        args.sf_dir = _planted_dir()

    import numpy as np

    from pyspark.sql import functions as F

    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_batch,
        rp_topk,
        sq8_topk,
    )
    from ct_clickhouse_spark.session import get_spark

    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    n = len(ids)
    step = max(1, n // BATCH_QUERIES)
    q_ids = ids[::step][:BATCH_QUERIES]

    def exact_topk(qid: int) -> set[int]:
        qi = int(np.searchsorted(ids, qid))
        sims = m @ m[qi]
        sims[qi] = -2.0  # exclude self
        # (cosine desc, vec_id asc) — same tiebreak as every tier
        order = np.lexsort((ids, -np.round(sims, 4)))
        return set(int(ids[i]) for i in order[:K])

    truth = {int(q): exact_topk(int(q)) for q in q_ids}
    result: dict = {
        "metric": "ann_recall_at_k",
        "k": K,
        "sf_dir": args.sf_dir,
        "n_vectors": int(n),
        "tiers": {},
    }

    # batched IVF across probe counts: the distributed many-query path.
    # k=K+1: every query is itself a corpus vector, and the batch tier
    # does not exclude self — it always lands at rank 1 (its home cell
    # is probed by construction), so asking for exactly K and filtering
    # self AFTERWARD caps recall at (K-1)/K. Fetch one extra, drop self,
    # score the first K real neighbors.
    qdf = spark.createDataFrame(
        [(int(q),) for q in q_ids], "query_id long"
    ).join(
        emb.withColumnRenamed("vec_id", "query_id"), "query_id"
    )
    for probes in (1, 2, 4, 8, 12):
        got = (
            ivf_topk_batch(spark, args.sf_dir, qdf, k=K + 1, probes=probes)
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "rank", "vec_id")
            .collect()  # <= (K+1) * n_queries rows; ordered client-side
        )
        hits_by_q: dict[int, list[tuple[int, int]]] = {}
        for r in got:
            hits_by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"])
            )
        # queries with NO surviving rows (e.g. a singleton probed cell)
        # must score 0, not vanish from the mean
        per_q = [
            len(
                {v for _, v in sorted(hits_by_q.get(int(q), []))[:K]}
                & truth[int(q)]
            )
            / K
            for q in q_ids
        ]
        result["tiers"][f"ivf_batch_probes{probes}"] = {
            "queries": len(per_q),
            "recall_mean": round(float(np.mean(per_q)), 4),
            "recall_min": round(float(np.min(per_q)), 4),
        }
        print(f"ivf_batch probes={probes}:", result["tiers"][f"ivf_batch_probes{probes}"])

    # single-query tiers (driver-slot shapes, self excluded BEFORE the
    # limit inside each tier), smaller query set; rp additionally swept
    # over refine to record its recall/cost curve in this regime
    sq_ids = [int(q) for q in q_ids[:: max(1, len(q_ids) // SINGLE_QUERIES)]][
        :SINGLE_QUERIES
    ]
    variants = [
        ("ivf_probes2", lambda q: ivf_topk(spark, args.sf_dir, query_vec_id=q)),
        ("sq8_refine", lambda q: sq8_topk(spark, args.sf_dir, query_vec_id=q)),
        ("rp_refine", lambda q: rp_topk(spark, args.sf_dir, query_vec_id=q)),
        (
            "rp_refine24",
            lambda q: rp_topk(spark, args.sf_dir, refine=24, query_vec_id=q),
        ),
        (
            "rp_refine96",
            lambda q: rp_topk(spark, args.sf_dir, refine=96, query_vec_id=q),
        ),
    ]
    for name, fn in variants:
        per_q = []
        for q in sq_ids:
            hits = {r["vec_id"] for r in fn(q).collect()}
            per_q.append(len(hits & truth[q]) / K)
        result["tiers"][name] = {
            "queries": len(per_q),
            "recall_mean": round(float(np.mean(per_q)), 4),
            "recall_min": round(float(np.min(per_q)), 4),
        }
        print(name + ":", result["tiers"][name])
    result["regime"] = "planted-separated" if args.planted else "sf1-noise-dominated"
    result["notes"] = (
        "well-separated regime at sf1 scale (20k x 64, signal 4x center + "
        "0.5x noise): IVF cell pruning pays exactly where neighbor "
        "structure matches cells; SQ8 regime-independent; RP improves "
        "with refine but intra-cluster neighbor ORDER is again "
        "noise-scale at 16 dims."
        if args.planted
        else "sf1 embeddings are noise-dominated (10 centers, signal 2x "
        "center + unit gaussian): cluster-pruning recall follows the "
        "probe curve; SQ8 full-scan+refine is exact-equivalent at 4x "
        "compression; RP@16d JL distortion swamps the neighbor gaps in "
        "this regime."
    )

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
