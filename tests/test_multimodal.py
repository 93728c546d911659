"""Multimodal media ops: the resize kernel must be an exact
nearest-neighbor resample of the payload buffer, not a placeholder."""

from __future__ import annotations

import numpy as np

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators import multimodal
from tests.conftest import SF_DIR

TARGET_W, TARGET_H = 48, 32


def _expected_resize(payload: bytes, w: int, h: int) -> bytes:
    buf = np.frombuffer(payload, dtype=np.uint8)[: w * h]
    if buf.size < w * h:
        buf = np.pad(buf, (0, w * h - buf.size))
    img = buf.reshape(h, w)
    yi = np.arange(TARGET_H) * h // TARGET_H
    xi = np.arange(TARGET_W) * w // TARGET_W
    return img[yi][:, xi].tobytes()


def test_resize_media_exact_nearest_neighbor(spark):
    media = {
        r.media_id: (bytes(r.payload), r.width, r.height)
        for r in multimodal.build_media(spark, SF_DIR)
        .filter("kind = 'image'")
        .collect()
    }
    assert media, "fixture should contain image-kind media"
    out = multimodal.resize_media(spark, SF_DIR, TARGET_W, TARGET_H).collect()
    assert len(out) == len(media)  # 1 image in -> 1 image out
    for r in out:
        payload, w, h = media[r.media_id]
        assert (r.width, r.height) == (TARGET_W, TARGET_H)
        assert len(bytes(r.payload)) == TARGET_W * TARGET_H
        assert bytes(r.payload) == _expected_resize(payload, w, h)


def test_resize_media_runs_distributed(spark):
    """The resize runs as mapInPandas over the scan — no collect, no
    single-task bottleneck beyond the fixture's one input split."""
    plan = (
        multimodal.resize_media(spark, SF_DIR, TARGET_W, TARGET_H)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
