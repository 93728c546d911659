"""The batch-vectorized rolling-hash fingerprint (r15) must be bit-equal
to the per-document reference form: same uint64 multiply-add per element,
only the loop structure changed (one sweep over the concatenated batch +
segment reduceat instead of FP_WINDOW ops per doc)."""

from __future__ import annotations

import numpy as np

from ct_clickhouse_spark.operators.text import FP_WINDOW, doc_fingerprint

BASE = np.uint64(1099511628211)


def _reference_fp(text: str | None) -> tuple[int, int]:
    """The pre-r15 per-document loop, kept verbatim as the oracle."""
    data = np.frombuffer((text or "").lower().strip().encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < FP_WINDOW:
        data = np.pad(data, (0, FP_WINDOW - n))
        n = FP_WINDOW
    k = n - FP_WINDOW + 1
    with np.errstate(over="ignore"):
        h = np.zeros(k, dtype=np.uint64)
        for j in range(FP_WINDOW):
            h = h * BASE + data[j : j + k].astype(np.uint64)
    return int(h.min().astype(np.int64)), int(h.max().astype(np.int64))


def test_vectorized_fingerprint_matches_reference_on_fixture(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = {r.doc_id: (r.fp_min, r.fp_max) for r in doc_fingerprint(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in spark.read.parquet(sf_dir + "/documents.parquet").collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == _reference_fp(text), f"doc {doc_id}"


def test_vectorized_fingerprint_edge_cases(spark, tmp_path):
    rows = [
        (0, ""),  # empty -> zero-padded single window
        (1, "a"),  # shorter than the window
        (2, "x" * FP_WINDOW),  # exactly one window
        (3, "The Quick  Brown Fox! " * 3),  # case/strip normalization
        (4, "héllo wörld ünïcode " * 2),  # multi-byte utf-8
        (5, None),  # NULL fingerprints like the empty string
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t or "")) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "fx")
    df.write.parquet(out + "/documents.parquet")
    got = {r.doc_id: (r.fp_min, r.fp_max) for r in doc_fingerprint(spark, out).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == _reference_fp(text), f"doc {doc_id}"
