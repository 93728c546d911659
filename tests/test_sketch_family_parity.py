"""Parity gate for the r16 SQL-composed ref_sketches slot.

sketch_family was rewritten as ONE spark.sql statement (plan-build cost:
~1.6 s/call of py4j + per-Dataset analysis -> ~0.2 s). The SQL must stay
value-identical to the Column-operator composition it replaced; this
test rebuilds the old composition FROM THE PUBLIC OPERATORS (which keep
their own unit tests) and pins frame equality, so any drift between the
slot SQL and the operators fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _column_composition(spark, sf_dir):
    """The pre-r16 sketch_family, composed from the public operators."""
    from ct_clickhouse_spark.api_queries import (
        CMS_PROBE_DOMAINS,
        base_domain_topk_sketch,
        stats_approx,
    )
    from ct_clickhouse_spark.cert_domains import build_cert_domains
    from ct_clickhouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        kmv_distinct_estimate,
        kmv_pairwise,
        kmv_sketch,
    )
    from ct_clickhouse_spark.streaming.rollup import returning_users_section

    s = stats_approx(spark, sf_dir).selectExpr(
        "stack(3, 'total', total, 'approx_subdomains', subdomains,"
        " 'approx_domains', domains) AS (key, value)"
    ).select(F.lit("stats").alias("sect"), "key", "value")
    t = base_domain_topk_sketch(spark, sf_dir).select(
        F.lit("topk").alias("sect"),
        F.col("base_domain").alias("key"),
        F.col("est_count").cast("long").alias("value"),
    )
    sk = kmv_sketch(build_cert_domains(spark, sf_dir), ["log_name"], "domain")
    per_log = sk.select(
        F.lit("kmv").alias("sect"),
        F.concat(F.lit("est:"), F.col("log_name")).alias("key"),
        F.round(kmv_distinct_estimate(F.col("kmv"))).cast("long").alias("value"),
    )
    pairwise = kmv_pairwise(sk, "log_name").select(
        F.lit("kmv").alias("sect"),
        F.concat(
            F.lit("inter:"), F.col("group_a"), F.lit("|"), F.col("group_b")
        ).alias("key"),
        F.round(F.col("est_intersection")).cast("long").alias("value"),
    )
    ret = returning_users_section(spark, sf_dir).select(
        F.lit("returning").alias("sect"), "key", "value"
    )
    cert = build_cert_domains(spark, sf_dir)
    cms = cms_build(cert, "domain")
    probes = spark.createDataFrame(
        [(d,) for d in CMS_PROBE_DOMAINS], "domain string"
    )
    cm = cms_estimate(cms, probes, "domain").select(
        F.lit("cms").alias("sect"),
        F.concat(F.lit("freq:"), F.col("domain")).alias("key"),
        F.col("est").alias("value"),
    )
    return (
        s.unionByName(t)
        .unionByName(per_log)
        .unionByName(pairwise)
        .unionByName(ret)
        .unionByName(cm)
    )


def test_sql_slot_matches_column_composition(spark):
    from ct_clickhouse_spark.api_queries import sketch_family

    old = _column_composition(spark, SF_DIR)
    new = sketch_family(spark, SF_DIR)
    assert old.schema == new.schema
    po = old.toPandas().sort_values(["sect", "key"]).reset_index(drop=True)
    pn = new.toPandas().sort_values(["sect", "key"]).reset_index(drop=True)
    assert po.equals(pn), (
        po.merge(pn, on=["sect", "key"], how="outer", suffixes=("_old", "_new"))
        .query("value_old != value_new")
        .to_string()
    )


def _quantiles_column_composition(spark, sf_dir):
    """The pre-r16 rel_sketch_quantiles, composed from the operators."""
    from ct_clickhouse_spark.operators.relational import approx_quantiles
    from ct_clickhouse_spark.operators.windows import spend_quartiles_approx
    from ct_clickhouse_spark.streaming.rollup import (
        range_freq_section,
        range_quantiles_section,
    )

    li = approx_quantiles(spark, sf_dir).selectExpr(
        "l_returnflag AS key",
        "stack(3, 'li_p25', p25, 'li_p50', p50, 'li_p75', p75) AS (kind, value)",
    ).select("kind", "key", "value")
    nt = spend_quartiles_approx(spark, sf_dir).select(
        F.lit("cust_quartile").alias("kind"),
        F.col("c_custkey").cast("string").alias("key"),
        F.col("balance_quartile").cast("double").alias("value"),
    )
    rh = range_quantiles_section(spark, sf_dir).select(
        F.lit("range_hist").alias("kind"), "key", "value"
    )
    rf = range_freq_section(spark, sf_dir).select(
        F.lit("range_freq").alias("kind"), "key", "value"
    )
    return li.unionByName(nt).unionByName(rh).unionByName(rf)


def test_sketch_quantiles_sql_matches_column_composition(spark):
    """The r16 SQL-composed rel_sketch_quantiles (which also folds the
    range_quantiles driver loop into a cumulative-histogram window) must
    stay value-identical to the Column/driver-loop composition."""
    from ct_clickhouse_spark.operators.relational import sketch_quantiles

    old = _quantiles_column_composition(spark, SF_DIR)
    new = sketch_quantiles(spark, SF_DIR)
    assert old.schema == new.schema
    po = old.toPandas().sort_values(["kind", "key"]).reset_index(drop=True)
    pn = new.toPandas().sort_values(["kind", "key"]).reset_index(drop=True)
    assert po.equals(pn), (
        po.merge(pn, on=["kind", "key"], how="outer", suffixes=("_old", "_new"))
        .query("value_old != value_new")
        .to_string()
    )
