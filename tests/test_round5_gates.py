"""Round-5 driver-gate additions: SemDeDup cell section, quality_filter
columns, and the rollup KMV/histogram sections."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_embedding_groups_slot_matches_oracle(spark, duck):
    from ct_clickhouse_spark.operators import similarity as sim
    from ct_clickhouse_spark.testing import assert_matches_oracle

    assert_matches_oracle(
        sim.groups_global_and_semdedup(spark, SF_DIR),
        duck,
        sim.ORACLES["dedup_embedding_groups"],
        name="dedup_embedding_groups",
    )


def test_grid_cell_pairs_are_sound_subset(spark):
    """Every grid-cell pair is a true >=threshold cosine pair (exact
    cosine within the cell = global cosine), and the cell restriction
    actually drops some cross-cell pairs — the section is non-trivial."""
    from ct_clickhouse_spark.operators import similarity as sim

    cell = {
        (r.id_a, r.id_b)
        for r in sim.grid_cell_pairs(spark, SF_DIR).collect()
    }
    full = {
        (r.id_a, r.id_b) for r in sim.cosine_pairs(spark, SF_DIR).collect()
    }
    assert cell, "cell-scoped pairs empty — the gate has no teeth"
    assert cell <= full
    assert cell < full, "no cross-cell pair dropped — cells are vacuous"


def test_quality_filter_nll_col_equals_lm_mode(spark):
    """The precomputed-nll mode the profile slot uses must produce the
    same verdicts as handing quality_filter the LM artifact."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.text import (
        LM_LANG,
        lm_score,
        quality_filter,
        train_bigram_lm,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    lm = train_bigram_lm(
        load_table(spark, SF_DIR, "documents").filter(F.col("lang") == LM_LANG),
        persist=False,
    )
    via_lm = {
        r.doc_id: (r.keep, tuple(r.drop_reasons))
        for r in quality_filter(docs, lm=lm).collect()
    }
    pre = docs.join(
        lm_score(docs, lm=lm).select("doc_id", "bigram_nll"), "doc_id"
    )
    via_col = {
        r.doc_id: (r.keep, tuple(r.drop_reasons))
        for r in quality_filter(pre, nll_col="bigram_nll").collect()
    }
    assert via_lm == via_col


def test_returning_users_section_exact_at_fixture_scale(spark):
    """With k >= the fixture's distinct users, every KMV estimate is
    EXACT: the section's users_both must equal the true cross-week
    overlap computed from raw events."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.streaming.rollup import (
        RANGE_A,
        RANGE_B,
        returning_users_section,
    )

    got = {
        r.key: r.value for r in returning_users_section(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")

    def users(lo, hi):
        return {
            r.user_id
            for r in ev.filter(
                (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
            )
            .select("user_id")
            .distinct()
            .collect()
        }

    a, b = users(*RANGE_A), users(*RANGE_B)
    assert got["users_a"] == len(a)
    assert got["users_b"] == len(b)
    assert got["users_both"] == len(a & b)
    assert got["users_union"] == len(a | b)


def test_range_quantiles_section_within_one_bin(spark):
    """Histogram quantiles must land within one bin width of the exact
    week-1 quantiles (the operator's documented error bound)."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.streaming.rollup import (
        HIST_BINS,
        RANGE_A,
        RANGE_QS,
        ROLLUP_HIST_HI,
        ROLLUP_HIST_LO,
        range_quantiles_section,
    )

    width = (ROLLUP_HIST_HI - ROLLUP_HIST_LO) / HIST_BINS
    got = {
        r.key: r.value for r in range_quantiles_section(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").filter(
        (F.col("ts") >= F.lit(RANGE_A[0])) & (F.col("ts") < F.lit(RANGE_A[1]))
    )
    exact = ev.agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{int(q * 100)}")
            for q in RANGE_QS
        ]
    ).collect()[0]
    for q in RANGE_QS:
        key = f"p{int(q * 100)}"
        assert abs(got[key] - exact[key]) <= width, (key, got[key], exact[key])


def test_ngram_pairs_and_groups_slot_matches_oracle(spark, duck):
    from ct_clickhouse_spark.operators import dedup
    from ct_clickhouse_spark.testing import assert_matches_oracle

    assert_matches_oracle(
        dedup.ngram_pairs_and_groups(spark, SF_DIR),
        duck,
        dedup.ORACLES["dedup_ngram_jaccard_pairs"],
        name="dedup_ngram_jaccard_pairs",
    )


def test_ngram_groups_collapse_pairs(spark):
    """Every near-dup pair's endpoints share a component, and at least
    one document is a non-keeper (the section is non-trivial)."""
    from ct_clickhouse_spark.operators import dedup

    rows = dedup.ngram_pairs_and_groups(spark, SF_DIR).collect()
    label = {r.a: r.b for r in rows if r.kind == "group"}
    pairs = [(r.a, r.b) for r in rows if r.kind == "pair"]
    assert pairs, "no near-dup pairs at fixture scale — vacuous"
    assert all(label[a] == label[b] for a, b in pairs)
    assert any(r.score == 0.0 for r in rows if r.kind == "group")


def test_embedding_incremental_pairs_sound_and_recall(spark):
    """Embedding incremental dedup: every emitted (batch, corpus) pair
    is a TRUE >=threshold cosine pair with the corpus side outside the
    batch (soundness is exact — cosines are computed exactly in-cell),
    and multi-probe routing recovers a solid fraction of the true
    batch-corpus near-dup pairs on the fixture."""
    from ct_clickhouse_spark.catalog import load_table
    from ct_clickhouse_spark.operators.dedup import INCREMENTAL_MOD
    from ct_clickhouse_spark.operators.similarity import (
        cosine_pairs,
        embedding_incremental_pairs,
    )

    batch_ids = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % INCREMENTAL_MOD == 0)
        .select("vec_id")
    )
    batch = {r.vec_id for r in batch_ids.collect()}
    got = {
        (r.batch_id, r.corpus_id): r.cosine
        for r in embedding_incremental_pairs(spark, SF_DIR, batch_ids).collect()
    }
    # truth: all exact >=threshold pairs with exactly one end in the batch
    truth = {}
    for r in cosine_pairs(spark, SF_DIR).collect():
        for b, c in ((r.id_a, r.id_b), (r.id_b, r.id_a)):
            if b in batch and c not in batch:
                truth[(b, c)] = r.cosine
    assert truth, "no batch-corpus near-dup pairs at fixture scale — vacuous"
    for key, cos in got.items():
        assert key in truth and abs(truth[key] - cos) < 1e-9
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} below floor"


def test_table_sizes_maintenance_rows(spark):
    """The maintenance section emits the compaction + versioned-publish
    state rows: 8 files -> 1, all 25 nation rows preserved, 2 committed
    generations retained."""
    from ct_clickhouse_spark.api_queries import table_sizes

    got = {
        r.table_name: r.total_bytes
        for r in table_sizes(spark, SF_DIR).collect()
        if r.table_name.startswith("maint:")
    }
    assert got == {
        "maint:files_before": 8,
        "maint:files_after": 1,
        "maint:rows": 25,
        "maint:versions": 2,
    }
