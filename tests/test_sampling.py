"""Deterministic sampling/mixing: stability under repartitioning, seed
independence, proportion accuracy, and single-scan plans."""

from __future__ import annotations

import pytest

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators import sampling
from tests.conftest import SF_DIR


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = _ids(sampling.hash_sample(docs, "doc_id", 0.3))
    b = _ids(sampling.hash_sample(docs.repartition(7), "doc_id", 0.3))
    assert a == b  # same rows regardless of physical layout
    # fraction lands near target (xxhash64 uniformity over 500 docs)
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08


def test_hash_sample_is_nested_by_fraction(spark):
    """Bucket selection makes samples NESTED: the 10% sample is a subset
    of the 30% sample — the property that lets a pipeline scale a corpus
    up without invalidating work done on the smaller cut."""
    docs = load_table(spark, SF_DIR, "documents")
    small = _ids(sampling.hash_sample(docs, "doc_id", 0.1))
    large = _ids(sampling.hash_sample(docs, "doc_id", 0.3))
    assert small <= large


def test_hash_sample_seeds_are_independent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = _ids(sampling.hash_sample(docs, "doc_id", 0.3, seed=1))
    b = _ids(sampling.hash_sample(docs, "doc_id", 0.3, seed=2))
    assert a != b
    # overlap near the independent expectation (~9% of docs), not ~30%
    n = docs.count()
    assert len(a & b) / n < 0.2


def test_mix_sources_proportions_and_drop(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sources = [r.source for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    keep_all, keep_half, drop = sources[0], sources[1], sources[2:]
    mixed = sampling.mix_sources(
        docs, {keep_all: 1.0, keep_half: 0.5}, key="doc_id"
    )
    counts = {r.source: r.n for r in mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    totals = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert counts.get(keep_all) == totals[keep_all]  # weight 1.0 keeps all
    assert 0.3 < counts.get(keep_half, 0) / totals[keep_half] < 0.7
    for src in drop:  # absent from the map -> dropped
        assert src not in counts


def test_mix_sources_single_scan_no_join(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        sampling.mix_sources(docs, {"web": 0.5, "wiki": 1.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan, plan[:1200]


def test_pack_documents_bins_respect_capacity(spark):
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").withColumn(
        "n_chars", F.length("text")
    )
    max_size = 2000
    packed = sampling.pack_documents(docs, "doc_id", "n_chars", max_size)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc packed exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    by_bin: dict[int, int] = {}
    for r in rows:
        by_bin[r.bin_id] = by_bin.get(r.bin_id, 0) + r.size
        assert r.bin_fill <= max_size or r.size > max_size  # oversize singleton
    for b, fill in by_bin.items():
        sizes = [r.size for r in rows if r.bin_id == b]
        if len(sizes) > 1:  # multi-doc bins always respect capacity
            assert fill <= max_size
    # packing actually packs: far fewer bins than docs
    assert len(by_bin) < len(rows) / 2


def test_hash_sample_md5_mode_same_properties(spark):
    """md5 mode keeps the operator contract: deterministic, partition-
    invariant, nested by fraction, near-target proportions."""
    docs = load_table(spark, SF_DIR, "documents")
    a = _ids(sampling.hash_sample(docs, "doc_id", 0.3, method="md5"))
    b = _ids(sampling.hash_sample(docs.repartition(7), "doc_id", 0.3, method="md5"))
    assert a == b
    small = _ids(sampling.hash_sample(docs, "doc_id", 0.1, method="md5"))
    assert small <= a
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08


def test_token_count_tags_match_operators(spark):
    """The driver slot's tagged union must agree with actually running
    the sampling operators: tag='sample_25' == hash_sample(md5, 0.25),
    tag='mix' == mix_sources(md5, MIX_WEIGHTS) — same rows, same totals."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators import text

    docs = load_table(spark, SF_DIR, "documents")
    tagged = {
        (r.tag, r.source): r.n_docs
        for r in text.token_count(spark, SF_DIR).collect()
    }
    sample = sampling.hash_sample(
        docs, "doc_id", text.SAMPLE_FRACTION, method="md5"
    )
    for r in sample.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect():
        assert tagged.get(("sample_25", r.source)) == r.n
    mixed = sampling.mix_sources(docs, text.MIX_WEIGHTS, key="doc_id", method="md5")
    mix_counts = {
        r.source: r.n
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert mix_counts == {
        src: n for (tag, src), n in tagged.items() if tag == "mix"
    }


def test_pack_documents_grouped_is_deterministic(spark):
    """group_col mode: identical output regardless of physical layout
    (FFD order is content-defined), bins never mix groups."""
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(
        map(tuple, sampling.pack_documents(
            docs, "doc_id", "n_chars", 2000, group_col="source"
        ).collect())
    )
    b = sorted(
        map(tuple, sampling.pack_documents(
            docs.repartition(7), "doc_id", "n_chars", 2000, group_col="source"
        ).collect())
    )
    assert a == b
    by_bin: dict[int, set[str]] = {}
    for src, _doc, _size, bin_id, _fill in a:
        by_bin.setdefault(bin_id, set()).add(src)
    assert all(len(srcs) == 1 for srcs in by_bin.values())


def test_hash_sample_rejects_bad_fraction(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        sampling.mix_sources(docs, {"web": -0.1})


def test_stratified_sample_exact_n_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sampling.stratified_sample(docs, "source", 5, "doc_id")
    counts = {r.source: r.n for r in a.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    totals = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for src, total in totals.items():
        assert counts.get(src) == min(5, total)
    # partition-invariant + deterministic
    b = sampling.stratified_sample(docs.repartition(7), "source", 5, "doc_id")
    assert _ids(a) == _ids(b)
    # independent seeds draw different rows
    c = sampling.stratified_sample(docs, "source", 5, "doc_id", seed=1)
    assert _ids(a) != _ids(c)


def test_stratified_sample_rejects_bad_n(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        sampling.stratified_sample(docs, "source", 0, "doc_id")
