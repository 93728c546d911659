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


def _write_planted(
    tmp_path, n=2000, d=32, k=8, signal=4.0, noise=0.5, noise_frac=0.0
):
    """Well-separated corpus in the catalog's embeddings schema — the
    same recipe as scripts/ann_recall.py --planted, test-sized.
    ``noise_frac`` replaces that fraction of rows with pure unit noise
    (label -1) — the mixed regime scripts/ann_router_sweep.py measures
    at full scale."""
    rng = np.random.default_rng(4242)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n).astype(np.int32)
    vecs = signal * centers[labels] + noise * rng.normal(size=(n, d))
    if noise_frac:
        is_noise = rng.permutation(n) < int(noise_frac * n)
        vecs[is_noise] = rng.normal(size=(int(is_noise.sum()), d))
        labels[is_noise] = -1
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


def test_auto_k_gt_10_consistent_across_routes(spark, tmp_path):
    """ADVICE r10: ivf_topk used to hard-limit to TOPK=10 internally, so
    ann_topk_auto(k=25) silently returned 10 rows on the IVF route but
    25 on the SQ8 route. Both routes must honor k now."""
    from ct_clickhouse_spark.operators.similarity import ann_topk_auto

    planted = _write_planted(tmp_path)
    ivf_rows = ann_topk_auto(spark, planted, k=25).collect()
    assert len(ivf_rows) == 25
    # descending cosine with vec_id tiebreak, no self-match
    cosines = [r.cosine for r in ivf_rows]
    assert cosines == sorted(cosines, reverse=True)
    sq8_rows = ann_topk_auto(spark, SF_DIR, k=25).collect()
    assert len(sq8_rows) == 25


def test_ivf_topk_rejects_zero_probes(spark, tmp_path):
    """ADVICE r10: n_probes=0 used to silently fall back to the default
    via `or`; it must error instead."""
    from ct_clickhouse_spark.operators.similarity import ivf_topk

    planted = _write_planted(tmp_path)
    with pytest.raises(ValueError, match="n_probes"):
        ivf_topk(spark, planted, n_probes=0)


def test_probe_tiny_sample_no_self_match(spark, tmp_path):
    """ADVICE r10: with sample <= k vectors, argsort over the -inf
    diagonal row used to include the query among its own 'true
    neighbors', inflating cell_recall_1probe. k is clamped to
    len(sample)-1 now; a 1-vector sample errors."""
    from ct_clickhouse_spark.operators.similarity import ann_regime_probe

    planted = _write_planted(tmp_path, n=6)
    probe = ann_regime_probe(spark, planted, sample_n=6, k=10)
    # 6 planted vectors over 8 centers: neighbors rarely share cells;
    # the old bug pushed recall up via the self-match. All we pin is
    # that the statistic is computed over 5 (= n-1) neighbors without
    # crashing and stays a valid fraction.
    assert 0.0 <= probe["cell_recall_1probe"] <= 1.0
    assert probe["sample_n"] == 6

    single = _write_planted(tmp_path / "one", n=1)
    with pytest.raises(ValueError, match=">= 2 sample"):
        ann_regime_probe(spark, single, sample_n=1, k=10)


def test_drain_bench_validates_watermark_unit():
    """ADVICE r10: '1 hour' used to KeyError at summary time AFTER the
    multi-minute run; the unit map now covers hours and validates
    up front."""
    import scripts.bench_streaming as bs

    assert bs._WATERMARK_UNIT_S["hour"] == 3600
    assert bs._WATERMARK_UNIT_S["hours"] == 3600
    with pytest.raises(ValueError, match="unsupported watermark unit"):
        bs.bench_ingest_drain(None, watermark="1 fortnight")


@pytest.mark.parametrize("noise_frac", [0.0, 0.5, 1.0])
def test_routed_recall_across_mixed_regimes(spark, tmp_path, noise_frac):
    """Round-11 (r10 verdict #5): the 0.6 cell-recall threshold was
    validated only on two corpora far from it; this pins the decision
    QUALITY criterion across the regime axis — whatever tier the router
    picks on a planted/mixed/noise corpus, routed end-to-end recall@10
    must stay >= 0.9. The full-scale sweep (with the threshold-boundary
    corpora) is scripts/ann_router_sweep.py -> ANN_ROUTER_r11.json."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.similarity import ann_topk_auto

    corpus = _write_planted(tmp_path, noise_frac=noise_frac)
    rows = load_table(spark, corpus, "embeddings").collect()
    m = np.array([r.embedding for r in sorted(rows, key=lambda r: r.vec_id)])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    n = len(m)
    recalls = []
    for qid in [0, n // 4, n // 2, 3 * n // 4, n - 1]:
        sims = m @ m[qid]
        sims[qid] = -np.inf
        order = np.lexsort((np.arange(n), -sims))
        exact = set(order[:10].tolist())
        got = {
            r.vec_id
            for r in ann_topk_auto(spark, corpus, query_vec_id=qid).collect()
        }
        recalls.append(len(got & exact) / 10)
    assert float(np.mean(recalls)) >= 0.9, (noise_frac, recalls)
