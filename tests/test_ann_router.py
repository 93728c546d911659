"""Regime-aware ANN routing (round-10): the r9 recall study measured
SQ8 as the robust tier on noise-dominated corpora (recall@10 = 1.00 at
4x compression where IVF needed 12/20 probes for 0.91) and IVF as the
winner on well-separated corpora (0.93 at 2 probes). ann_topk_auto
encodes that as the frame-level default via a sampled
cell-concentration probe. These tests pin the router's decisions on
both regimes and that the routed result equals the chosen tier's."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _write_planted(tmp_path, n=2000, d=32, k=8, signal=4.0, noise=0.5):
    """Well-separated corpus in the catalog's embeddings schema — the
    same recipe as scripts/ann_recall.py --planted, test-sized."""
    rng = np.random.default_rng(4242)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n).astype(np.int32)
    vecs = signal * centers[labels] + noise * rng.normal(size=(n, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), type=pa.float32()), d
    ).cast(pa.list_(pa.float32()))
    out = str(tmp_path / "planted")
    os.makedirs(out)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": emb,
                "label": pa.array(labels),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
    )
    return out


def test_probe_routes_sq8_on_noise_corpus(spark):
    from ct_clickhouse_spark.operators.similarity import ann_regime_probe

    probe = ann_regime_probe(spark, SF_DIR)
    # the fixture embeddings are noise-dominated by construction
    # (2x center + 1x unit noise, gen_sf.py) — neighbors don't align
    # with IVF cells, so pruning would cost recall: route = sq8
    assert probe["route"] == "sq8"
    assert probe["cell_recall_1probe"] < 0.6
    # and the sample says MANY probes would be needed for target recall
    assert probe["probes_for_target"] > 1


def test_probe_routes_ivf_on_planted_corpus(spark, tmp_path):
    from ct_clickhouse_spark.operators.similarity import ann_regime_probe

    planted = _write_planted(tmp_path)
    probe = ann_regime_probe(spark, planted)
    assert probe["route"] == "ivf"
    assert probe["cell_recall_1probe"] >= 0.6
    # clustered corpus: a small probe count reaches the target on the
    # sample — the whole point of cell pruning
    assert probe["probes_for_target"] <= probe["n_cells"] // 2


def test_auto_matches_routed_tier_sq8(spark):
    from ct_clickhouse_spark.operators.similarity import (
        ann_topk_auto,
        sq8_topk,
    )

    got = [
        (r.vec_id, r.cosine) for r in ann_topk_auto(spark, SF_DIR).collect()
    ]
    want = [
        (r.vec_id, r.cosine)
        for r in sq8_topk(spark, SF_DIR)
        .select("vec_id", "label", "cosine")
        .collect()
    ]
    assert got == want and len(got) == 10


def test_auto_matches_routed_tier_ivf(spark, tmp_path):
    from ct_clickhouse_spark.operators.similarity import (
        ann_regime_probe,
        ann_topk_auto,
        ivf_topk,
    )

    planted = _write_planted(tmp_path)
    probe = ann_regime_probe(spark, planted)
    assert probe["route"] == "ivf"
    got = [
        (r.vec_id, r.cosine) for r in ann_topk_auto(spark, planted).collect()
    ]
    want = [
        (r.vec_id, r.cosine)
        for r in ivf_topk(
            spark, planted, n_probes=probe["probes_for_target"]
        ).collect()
    ]
    assert got == want and len(got) == 10


def test_auto_recall_on_planted(spark, tmp_path):
    """End-to-end: the routed IVF search on the clustered corpus must
    actually find the true neighbors (recall@10 >= 0.9 vs exact)."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.similarity import ann_topk_auto

    planted = _write_planted(tmp_path)
    rows = load_table(spark, planted, "embeddings").collect()
    m = np.array([r.embedding for r in sorted(rows, key=lambda r: r.vec_id)])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m[0]
    sims[0] = -np.inf
    exact = set(np.argsort(-sims)[:10].tolist())
    got = {r.vec_id for r in ann_topk_auto(spark, planted).collect()}
    assert len(got & exact) >= 9
