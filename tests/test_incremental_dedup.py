"""Incremental (cross-snapshot) dedup: the Bloom-routed composition must
be row-identical to a plain left_anti join — including under a
deliberately undersized sketch (high false-positive rate) — and must
actually route most definitely-new rows around the join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators.dedup import (
    INCREMENTAL_MOD,
    doc_incremental_new,
    incremental_dedup,
)
from tests.conftest import SF_DIR


def _frames(spark):
    # corpus: keys 0..499 step 1; batch: 300..800 (overlap 300..499)
    corpus = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    batch = spark.range(300, 800).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 2).alias("payload")
    )
    return batch, corpus


def test_incremental_equals_plain_anti_join(spark):
    batch, corpus = _frames(spark)
    got = incremental_dedup(batch, corpus, "k")
    want = batch.join(corpus, "k", "left_anti")
    assert got.count() == want.count() == 300
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w


def test_incremental_sound_under_tiny_sketch(spark):
    """An undersized sketch saturates (every probe bloom-positive); the
    verification anti-join must still make the result exact."""
    batch, corpus = _frames(spark)
    got = incremental_dedup(batch, corpus, "k", expected_items=1)
    want = batch.join(corpus, "k", "left_anti")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_incremental_keeps_within_batch_duplicates(spark):
    """Dedup is against the CORPUS only: two new-batch rows sharing a key
    absent from the corpus both survive (downstream exact dedup handles
    within-batch copies — separate concern, separate operator)."""
    corpus = spark.createDataFrame([("a",)], "k string")
    batch = spark.createDataFrame([("b", 1), ("b", 2), ("a", 3)], "k string, v int")
    got = incremental_dedup(batch, corpus, "k")
    assert sorted((r.k, r.v) for r in got.collect()) == [("b", 1), ("b", 2)]


def test_incremental_routes_negatives_around_join(spark):
    """The scale property: at the default sizing (~0.8% fp) nearly all
    truly-new rows are bloom-negative and skip the anti-join. Verified
    through the candidate split itself (filter on the same predicate the
    operator builds)."""
    from ct_clickhouse_spark.operators.bloomjoin import _membership, build_bloom

    batch, corpus = _frames(spark)
    bitmap = build_bloom(corpus.select("k"), "k", expected_items=500)
    member = _membership(
        F.array(*[F.lit(w) for w in bitmap]), "k", len(bitmap) * 64
    )
    n_candidates = batch.filter(member).count()
    # 200 true duplicates + at most a small fp sliver of the 300 new rows
    assert 200 <= n_candidates <= 230


def test_doc_incremental_new_matches_sql_semantics(spark):
    """The driver section against an independent DataFrame formulation of
    the same NOT EXISTS semantics on the real fixture."""
    docs = load_table(spark, SF_DIR, "documents")
    new = docs.filter(F.col("doc_id") % INCREMENTAL_MOD == 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    corpus = docs.filter(F.col("doc_id") % INCREMENTAL_MOD != 0).select(
        F.md5("text").alias("h")
    )
    want = {r.doc_id for r in new.join(corpus, "h", "left_anti").collect()}
    got_rows = doc_incremental_new(spark, SF_DIR).collect()
    got = {r.keep_id for r in got_rows}
    assert got == want and len(got) > 0
    assert all(r.kind == "incremental" and r.n_copies == 1 for r in got_rows)


def test_prebuilt_bloom_equals_inline_build(spark):
    from ct_clickhouse_spark.operators.bloomjoin import build_bloom

    batch, corpus = _frames(spark)
    bitmap = build_bloom(corpus.select("k"), "k", 500)
    got = incremental_dedup(batch, corpus, "k", prebuilt_bloom=bitmap)
    want = incremental_dedup(batch, corpus, "k")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_empty_prebuilt_bloom_rejected(spark):
    import pytest

    batch, corpus = _frames(spark)
    with pytest.raises(ValueError, match="non-empty"):
        incremental_dedup(batch, corpus, "k", prebuilt_bloom=[])


def test_small_corpus_skips_bloom_build(spark):
    """Below the routing threshold the corpus Bloom bitmap must not be
    built at all — the cached artifact is (None, n) and the slot takes
    the plain anti-join (the overhead the routing exists to remove)."""
    from ct_clickhouse_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, 10, f"text {i}") for i in range(20)],
        "doc_id long, n_chars int, text string",
    )
    corpus = docs.selectExpr("md5(text) AS text_hash")
    dedup._INC_BLOOM_CACHE.clear()
    bitmap, n = dedup._corpus_bloom_cached(spark, "/nonexistent-key", corpus)
    assert bitmap is None and n == 20


def test_span_removal_rejects_mismatched_prebuilt_grams(spark):
    import pytest

    from ct_clickhouse_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    base = docs.withColumn(
        "_w", dedup._words(dedup.F.col("text"))
    ).select("doc_id", "_w")
    grams = dedup._span_grams(base)
    with pytest.raises(ValueError, match="k="):
        dedup.remove_duplicate_spans(base, k=3, grams=grams)
