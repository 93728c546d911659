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
