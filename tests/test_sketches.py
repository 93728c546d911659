"""KMV sketch properties: exactness when unsaturated, bounded relative
error when saturated, the union-merge closure law, intersection/Jaccard
estimates against exact set algebra, and the bounded-state plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators.sketches import (
    kmv_distinct_estimate,
    kmv_merge,
    kmv_pairwise,
    kmv_sketch,
)
from tests.conftest import SF_DIR


def _est(spark, df, k):
    sk = kmv_sketch(df, ["g"], "v", k=k)
    return {
        r.g: r.est
        for r in sk.select(
            "g", kmv_distinct_estimate(F.col("kmv"), k).alias("est")
        ).collect()
    }


def test_unsaturated_sketch_is_exact(spark):
    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    # 50 distinct per group < k=256 -> exact
    assert _est(spark, df, 256) == {0: 50.0, 1: 50.0}


def test_saturated_estimate_within_tolerance(spark):
    # 20k distinct values, k=256 -> stderr ~ 1/sqrt(255) ~= 6.3%;
    # assert within 4 sigma (25%)
    df = spark.range(20_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    est = _est(spark, df, 256)[0]
    assert abs(est - 20_000) / 20_000 < 0.25


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(5_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    dup10 = spark.range(50_000).select(
        F.lit(0).alias("g"), (F.col("id") % 5_000).alias("v")
    )
    assert _est(spark, base, 128) == _est(spark, dup10, 128)


def test_merge_closure_law(spark):
    """kmv_merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) exactly —
    the property that makes KMV mergeable across partitions/snapshots."""
    k = 64
    a = spark.range(0, 3_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(1_500, 4_500).select(
        F.lit("a").alias("g"), F.col("id").alias("v")
    )
    sk_a = kmv_sketch(a, ["g"], "v", k=k).collect()[0].kmv
    sk_b = kmv_sketch(b, ["g"], "v", k=k).collect()[0].kmv
    sk_union = kmv_sketch(a.union(b), ["g"], "v", k=k).collect()[0].kmv
    merged = (
        spark.createDataFrame(
            [(sk_a, sk_b)], "ka array<double>, kb array<double>"
        )
        .select(kmv_merge(F.col("ka"), F.col("kb"), k).alias("m"))
        .collect()[0]
        .m
    )
    assert merged == sk_union


def test_pairwise_intersection_and_jaccard(spark):
    # A = 0..5999, B = 3000..8999: |A|=|B|=6000, |A∩B|=3000, |A∪B|=9000,
    # J = 1/3. k=512 -> ~4.4% stderr on cardinalities; Jaccard adds
    # binomial noise ~ sqrt(J(1-J)/k) ~= 2.1pp. Assert 4-sigma bands.
    a = spark.range(0, 6_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(3_000, 9_000).select(
        F.lit("b").alias("g"), F.col("id").alias("v")
    )
    sk = kmv_sketch(a.union(b), ["g"], "v", k=512)
    row = kmv_pairwise(sk, "g", k=512).collect()[0]
    assert (row.group_a, row.group_b) == ("a", "b")
    assert abs(row.est_a - 6_000) / 6_000 < 0.2
    assert abs(row.est_union - 9_000) / 9_000 < 0.2
    assert abs(row.est_jaccard - 1 / 3) < 0.1
    assert abs(row.est_intersection - 3_000) / 3_000 < 0.35


def test_sketch_plan_has_no_unbounded_collect_state(spark):
    """The k-smallest selection must be the spillable window sort, not a
    collect_set over the full group (unbounded in-memory agg state); the
    only collect_list runs AFTER the rank<=k filter."""
    df = spark.range(1000).select((F.col("id") % 3).alias("g"), F.col("id").alias("v"))
    plan = (
        kmv_sketch(df, ["g"], "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "collect_set" not in plan
    assert "row_number" in plan
    assert "BatchEvalPython" not in plan  # pure JVM


def test_ref_sketches_kmv_section_on_fixture(spark):
    """The driver-slot section: per-log KMV estimates are exact at
    fixture cardinality (every log has < k distinct domains at sf0.001),
    and pairwise intersections match exact set intersections."""
    from ct_clickhouse_spark.api_queries import sketch_family
    from ct_clickhouse_spark.cert_domains import build_cert_domains

    rows = sketch_family(spark, SF_DIR).filter("sect = 'kmv'").collect()
    assert rows, "kmv section missing"
    cert = build_cert_domains(spark, SF_DIR)
    exact = {
        r.log_name: r.n
        for r in cert.groupBy("log_name")
        .agg(F.count_distinct("domain").alias("n"))
        .collect()
    }
    sets = {
        log: {
            r.domain
            for r in cert.filter(F.col("log_name") == log)
            .select("domain")
            .distinct()
            .collect()
        }
        for log in exact
    }
    saw_pair = False
    for r in rows:
        if r.key.startswith("est:"):
            log = r.key[4:]
            if exact[log] < 256:  # unsaturated -> exact
                assert r.value == exact[log], (log, r.value, exact[log])
        elif r.key.startswith("inter:"):
            saw_pair = True
            a, b = r.key[6:].split("|")
            true_inter = len(sets[a] & sets[b])
            if len(sets[a] | sets[b]) < 256:
                assert r.value == true_inter, (r.key, r.value, true_inter)
    assert saw_pair


def test_nulls_are_not_phantom_elements(spark):
    """xxhash64(NULL) returns the seed (not NULL) — NULLs must be
    excluded before hashing or each one becomes a phantom u=0.5 value."""
    with_nulls = spark.createDataFrame(
        [(0, "a"), (0, None), (0, "b")], "g int, v string"
    )
    without = spark.createDataFrame([(0, "a"), (0, "b")], "g int, v string")
    sa = kmv_sketch(with_nulls, ["g"], "v", k=16).collect()[0].kmv
    sb = kmv_sketch(without, ["g"], "v", k=16).collect()[0].kmv
    assert sa == sb and len(sa) == 2


def test_estimate_with_smaller_k_is_valid_on_bigger_sketch(spark):
    """Estimating with k < build-k uses the first k order statistics —
    a valid KMV estimate, not a silent size readout."""
    df = spark.range(20_000).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    sk = kmv_sketch(df, ["g"], "v", k=256)
    est64 = sk.select(
        kmv_distinct_estimate(F.col("kmv"), 64).alias("e")
    ).collect()[0].e
    assert abs(est64 - 20_000) / 20_000 < 0.5  # ~12.5% stderr, 4 sigma


def test_cms_one_sided_error_and_bound(spark):
    """CMS guarantees: est >= exact ALWAYS (collisions only add), and
    est <= exact + 3 * N / width for every probed value at fixture
    scale (a loose union-bound form of the eps*N guarantee)."""
    from ct_clickhouse_spark.cert_domains import build_cert_domains
    from ct_clickhouse_spark.operators.sketches import (
        CMS_WIDTH,
        cms_build,
        cms_estimate,
    )
    from tests.conftest import SF_DIR

    cert = build_cert_domains(spark, SF_DIR)
    n_total = cert.count()
    exact = {
        r.domain: r.n
        for r in cert.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = spark.createDataFrame(
        [(d,) for d in list(exact)[:20]] + [("never-seen.example",)],
        "domain string",
    )
    cms = cms_build(cert, "domain")
    got = {r.domain: r.est for r in cms_estimate(cms, probes, "domain").collect()}
    for d, est in got.items():
        true = exact.get(d, 0)
        assert est >= true, (d, est, true)
        assert est <= true + 3 * n_total / CMS_WIDTH, (d, est, true)


def test_cms_merge_law_exact(spark):
    """Merging two CMS sketches (cell-wise sum) must equal the sketch of
    the concatenated data EXACTLY — counts add."""
    from ct_clickhouse_spark.operators.sketches import cms_build

    a = spark.createDataFrame([(f"v{i % 7}",) for i in range(50)], "x string")
    b = spark.createDataFrame([(f"v{i % 11}",) for i in range(70)], "x string")
    merged = (
        cms_build(a, "x")
        .unionByName(cms_build(b, "x"))
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )
    whole = cms_build(a.unionByName(b), "x")
    sig = lambda df: sorted((r.d, r.b, r.c) for r in df.collect())
    assert sig(merged) == sig(whole)
