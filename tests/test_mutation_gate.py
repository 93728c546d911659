"""Driver-gate parity for the mutation family (r4 verdict item #1):
the dedup_cert_exact slot's merge_upsert / delete_where / update_where
sections must hash-match the pure-SQL DuckDB replay (argmax over
(key, version) = ReplacingMergeTree FINAL; DELETE/UPDATE as
filter/CASE) under the driver's own strict compare."""

from __future__ import annotations

from conftest import SF_DIR


def test_cert_mutations_slot_matches_oracle(spark, duck):
    from ct_clickhouse_spark.operators import dedup
    from ct_clickhouse_spark.testing import assert_matches_oracle

    assert_matches_oracle(
        dedup.cert_exact_and_mutations(spark, SF_DIR),
        duck,
        dedup.ORACLES["dedup_cert_exact"],
        name="dedup_cert_exact",
    )


def test_cert_mutations_sections_have_teeth(spark):
    """The slice and all three routed update groups are non-empty at
    fixture scale, stale updates lose, and the REDACTED issuer appears —
    i.e. the sections actually exercise the mutation semantics."""
    from ct_clickhouse_spark.operators import dedup

    rows = dedup.cert_mutations_sections(spark, SF_DIR).collect()
    by = {(r.kind, r.tag): r.n for r in rows}
    merged_tags = {t for (k, t) in by if k == "merge_upsert"}
    assert any(t.startswith("upserted#2") for t in merged_tags)
    assert any(t.startswith("inserted#1") for t in merged_tags)
    # stale v-1 rows must never survive the merge
    assert not any("#-1" in t for t in merged_tags)
    assert by[("merge_upsert", "applied")] > 0
    assert by[("delete_where", "deleted")] > 0
    assert ("update_where", "REDACTED") in by
    assert by[("update_where", "updated")] == by[("update_where", "REDACTED")]


def test_mutation_slice_has_unique_keys(spark):
    """The oracle breaks residual (fingerprint, domain) ties by
    (log_name, issuer) while merge_upsert uses an xxhash64 content
    tie-break; the orders agree trivially only because the mutation
    slice carries NO duplicate keys. Pin that fixture property so a
    future data generator that violates it fails loudly here instead
    of flaking the driver gate nondeterministically."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.dedup import _mutation_frames

    base, updates, _snap, _pv = _mutation_frames(spark, SF_DIR)
    for df in (base, updates):
        dups = (
            df.groupBy("fingerprint", "domain")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dups == 0


def test_run_in_scheduler_pool_sets_and_restores(spark):
    """The concurrency the slot claims needs each submitting thread in
    its OWN FAIR pool (FAIR arbitrates between pools; within one pool —
    including default — jobs are FIFO). Pin the helper's semantics: the
    pool property is set during fn, and the thread's PREVIOUS pool is
    restored after (not cleared — maintenance invoked from a serving
    request thread must not clobber the request's pool)."""
    from ct_clickhouse_spark.session import run_in_scheduler_pool

    sc = spark.sparkContext
    seen = []

    def probe():
        seen.append(sc.getLocalProperty("spark.scheduler.pool"))
        return 42

    sc.setLocalProperty("spark.scheduler.pool", "outer")
    try:
        assert run_in_scheduler_pool(spark, "inner", probe) == 42
        assert seen == ["inner"]
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
        # restores even when fn raises
        try:
            run_in_scheduler_pool(spark, "inner2", lambda: 1 / 0)
        except ZeroDivisionError:
            pass
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


def test_small_job_session_keyed_by_width_and_parent(spark):
    """get_small_job_session must honor the requested shuffle width on
    every call — not hand back whichever width was cached first — and
    must reuse the clone for repeated same-width requests (the clone is
    the point: one narrow SQLConf shared by all maintenance jobs)."""
    from ct_clickhouse_spark.session import get_small_job_session

    s4 = get_small_job_session(spark)
    s16 = get_small_job_session(spark, 16)
    assert s4 is not s16
    assert s4.conf.get("spark.sql.shuffle.partitions") == "4"
    assert s16.conf.get("spark.sql.shuffle.partitions") == "16"
    assert get_small_job_session(spark) is s4
    assert get_small_job_session(spark, 16) is s16
    # clones share the parent's SparkContext (no second JVM app)
    assert s4.sparkContext is spark.sparkContext
