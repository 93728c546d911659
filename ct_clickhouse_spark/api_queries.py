"""The reference REST API's 8 query shapes, Spark-first.

Each public function mirrors one endpoint of the reference Flask app
(reference: api/app.py:79-274) as a DataFrame builder over the
``cert_domains`` fact table, and ``ORACLES`` carries the equivalent DuckDB
SQL for the driver's differential check.

Determinism notes (differences from the reference, by design):
- The reference anchors time predicates on ``now()``/``today()``
  (api/app.py:125, 181) — non-reproducible on a fixed fixture. We anchor on
  scalar aggregates of the data itself (max/min ts), preserving the operator
  shape (range predicate, date-equality) with a deterministic result.
- Every LIMIT query gets a total ORDER BY (unique tiebreaker) so top-k is
  well-defined across engines; the reference relies on ClickHouse's
  arbitrary tie order (api/app.py:95).
- ``san`` is emitted as a ';'-joined string in SELECT * shapes so value
  comparison is representation-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cert_domains import build_cert_domains, oracle_with_cert_domains

# Parameters of the parameterized endpoints, chosen to exist at every sf
# (custkey 1 and 3 always exist; see cert_domains.py construction).
DOMAIN_PARAM = "www.cust1.net"  # /domain/<name>        (api/app.py:92-106)
BASE_PARAM = "cust1.net"  # /subdomains/<base>          (api/app.py:109-117)
RECENT_BASE_PARAM = "cust3.rs"  # /recent/<base>        (api/app.py:120-129)
TLD_PARAM = "rs"  # /tld/<tld>                          (api/app.py:132-164)
TLD_LIMIT = 500  # clamped into [1,1000] per api/app.py:136-141

# fixed probe set for the CMS frequency section (exist at every sf)
CMS_PROBE_DOMAINS = ["www.cust1.net", "cust3.rs", "mail.cust7.org"]

_STAR = ["ts", "domain", "base_domain", "fingerprint", "issuer", "subject"]
_STAR_TAIL = ["not_before", "not_after", "log_name"]


def _select_star(df: DataFrame) -> DataFrame:
    return df.select(*_STAR, F.array_join("san", ";").alias("san"), *_STAR_TAIL)


def domain_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /domain/<name>: SELECT * WHERE domain=? ORDER BY ts DESC LIMIT 100
    (api/app.py:94-96)."""
    cert = build_cert_domains(spark, sf_dir)
    return (
        _select_star(cert.filter(F.col("domain") == DOMAIN_PARAM))
        .orderBy(F.col("ts").desc(), "fingerprint")
        .limit(100)
    )


def subdomains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /subdomains/<base>: the flagship filter+groupBy+max+orderBy
    (api/app.py:111-116)."""
    cert = build_cert_domains(spark, sf_dir)
    return (
        cert.filter(F.col("base_domain") == BASE_PARAM)
        .groupBy("domain")
        .agg(F.max("ts").alias("last_seen"))
        .orderBy("domain")
    )


def recent_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /recent/<base>: range predicate on ts + GROUP BY dedup
    (api/app.py:122-128). Anchor = max(ts) - 180 days instead of now()-1d."""
    build_cert_domains(spark, sf_dir)
    # parameterized, not interpolated — the serving layer's "never
    # f-string SQL" rule (serving/app.py) applies project-wide
    return spark.sql(
        """
        SELECT domain FROM cert_domains
        WHERE base_domain = :base
          AND ts > (SELECT max(ts) FROM cert_domains) - INTERVAL 180 DAY
        GROUP BY domain
        """,
        args={"base": RECENT_BASE_PARAM},
    )


def tld_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /tld/<tld>: LIKE suffix match + group + top-k by last_seen
    (api/app.py:144-153). Spark plans TakeOrderedAndProject — true top-k."""
    cert = build_cert_domains(spark, sf_dir)
    return (
        cert.filter(F.col("domain").like(f"%.{TLD_PARAM}"))
        .groupBy("domain")
        .agg(F.max("ts").alias("last_seen"))
        .orderBy(F.col("last_seen").desc(), "domain")
        .limit(TLD_LIMIT)
    )


def stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /stats (api/app.py:184-193) with exact distinct counts so the
    oracle can hash-match; the sketch variant is stats_approx (rows-only)."""
    build_cert_domains(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            count(*) AS total,
            count(DISTINCT domain) AS subdomains,
            count(DISTINCT base_domain) AS domains,
            min(ts) AS first_seen,
            max(ts) AS last_seen
        FROM cert_domains
        WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM cert_domains)
        """
    )


def base_domain_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK()`` analog: one-pass mergeable heavy-hitters
    sketch (`approx_top_k`) over base_domain, exploded to (item, est_count)
    rows. The exact twin is ref_tld_topk's count+TakeOrdered; the sketch
    is the 100 TB path when the key cardinality dwarfs memory. Rows-only:
    tie order among equal counts is engine-specific. A pytest pins the
    sketch to the exact counts while cardinality < sketch capacity."""
    cert = build_cert_domains(spark, sf_dir)
    return (
        cert.agg(F.expr("approx_top_k(base_domain, 10, 100000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("base_domain"),
            F.col("e.count").alias("est_count"),
        )
    )


def stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /stats with uniqCombined≈HLL++ (api/app.py:187-188) —
    approx_count_distinct; sketch estimates differ per engine, so rows-only."""
    cert = build_cert_domains(spark, sf_dir)
    return cert.agg(
        F.count(F.lit(1)).alias("total"),
        F.approx_count_distinct("domain").alias("subdomains"),
        F.approx_count_distinct("base_domain").alias("domains"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


def stream_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /stream's page query: ts > watermark ORDER BY ts ASC LIMIT 100
    (api/app.py:259-262). Anchor = min(ts) + 180 days."""
    build_cert_domains(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT ts, domain, base_domain, fingerprint, issuer, subject,
               array_join(san, ';') AS san, not_before, not_after, log_name
        FROM cert_domains
        WHERE ts > (SELECT min(ts) FROM cert_domains) + INTERVAL 180 DAY
        ORDER BY ts ASC, fingerprint, domain
        LIMIT 100
        """
    )


def table_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GET /size: storage introspection (api/app.py:224-230 reads
    system.parts). Spark equivalent: Hadoop FS content summary per table,
    exposed as a small metadata DataFrame. Rows-only (no SQL oracle)."""
    from .catalog import TABLE_NAMES, table_path

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    rows = []
    for name in TABLE_NAMES:
        path = jvm.org.apache.hadoop.fs.Path(table_path(sf_dir, name))
        fs = path.getFileSystem(conf)
        size = fs.getContentSummary(path).getLength() if fs.exists(path) else 0
        rows.append((name, int(size)))
    rows += _maintenance_section(spark, sf_dir)
    return spark.createDataFrame(rows, "table_name string, total_bytes long").orderBy(
        "table_name"
    )


def _maintenance_section(spark: SparkSession, sf_dir: str) -> list:
    """Driver-visible storage-maintenance rows riding the system-metadata
    slot (same (name, value) shape): run a REAL compaction and a REAL
    versioned atomic rewrite on a small deterministic table and report
    the state — 'maint:files_before/after' (8-file nation table
    compacted to its byte-sized target), 'maint:rows' (row preservation
    through both), 'maint:versions' (committed generations after
    init + rewrite, retention = DEFAULT_KEEP). The OPTIMIZE analog and
    the no-rename-window publish, previously pytest-only, now emit
    driver rows every round."""
    import shutil
    import tempfile

    from .catalog import load_table
    from .plans.maintenance import compact_parquet
    from .plans.versioned import (
        _version_dirs,
        init_versioned,
        read_versioned,
        rewrite_versioned,
    )

    nation = load_table(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="ctspark_maint_")
    try:
        root = tmp + "/vt"
        init_versioned(spark, root, nation.repartition(8))
        before, after = compact_parquet(spark, root)
        rewrite_versioned(spark, root, read_versioned(spark, root))
        n_rows = read_versioned(spark, root).count()
        n_versions = sum(1 for _, _, ok in _version_dirs(spark, root) if ok)
        return [
            ("maint:files_before", int(before)),
            ("maint:files_after", int(after)),
            ("maint:rows", int(n_rows)),
            ("maint:versions", int(n_versions)),
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ALLOWED_LOGS = ["Google_Argon2024", "DigiCert_Yeti2024"]


def log_allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership filter (SURVEY J2): the reference's IP-allowlist gate
    (api/app.py:27-53, `client_ip in allowed_ips`) as the engine-side
    idiom — isin against a small literal set, which Catalyst compiles to
    an In predicate pushed into the scan (a broadcast-hash semi-join once
    the set outgrows a literal list)."""
    cert = build_cert_domains(spark, sf_dir)
    return (
        cert.filter(F.col("log_name").isin(ALLOWED_LOGS))
        .groupBy("log_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def human_readable_size(size_bytes: float) -> str:
    """B→PB formatting, API-layer helper (reference: api/app.py:211-219)."""
    if size_bytes == 0:
        return "0B"
    units = ("B", "KB", "MB", "GB", "TB", "PB")
    i = 0
    while size_bytes >= 1024 and i < len(units) - 1:
        size_bytes /= 1024.0
        i += 1
    return f"{size_bytes:.2f}{units[i]}"


_STAR_SQL = (
    "ts, domain, base_domain, fingerprint, issuer, subject, "
    "array_to_string(san, ';') AS san, not_before, not_after, log_name"
)

ORACLES: dict[str, str] = {
    "ref_domain_lookup": oracle_with_cert_domains(
        f"""
        SELECT {_STAR_SQL} FROM cert_domains
        WHERE domain = '{DOMAIN_PARAM}'
        ORDER BY ts DESC, fingerprint LIMIT 100
        """
    ),
    "ref_subdomains": oracle_with_cert_domains(
        f"""
        SELECT domain, max(ts) AS last_seen FROM cert_domains
        WHERE base_domain = '{BASE_PARAM}'
        GROUP BY domain ORDER BY domain
        """
    ),
    "ref_recent": oracle_with_cert_domains(
        f"""
        SELECT domain FROM cert_domains
        WHERE base_domain = '{RECENT_BASE_PARAM}'
          AND ts > (SELECT max(ts) FROM cert_domains) - INTERVAL 180 DAY
        GROUP BY domain
        """
    ),
    "ref_tld_topk": oracle_with_cert_domains(
        f"""
        SELECT domain, max(ts) AS last_seen FROM cert_domains
        WHERE domain LIKE '%.{TLD_PARAM}'
        GROUP BY domain
        ORDER BY last_seen DESC, domain LIMIT {TLD_LIMIT}
        """
    ),
    "ref_stats": oracle_with_cert_domains(
        """
        SELECT
            count(*) AS total,
            count(DISTINCT domain) AS subdomains,
            count(DISTINCT base_domain) AS domains,
            min(ts) AS first_seen,
            max(ts) AS last_seen
        FROM cert_domains
        WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM cert_domains)
        """
    ),
    "ref_log_allowlist": oracle_with_cert_domains(
        f"""
        SELECT log_name, count(*) AS n_rows FROM cert_domains
        WHERE log_name IN ({", ".join(repr(x) for x in ALLOWED_LOGS)})
        GROUP BY log_name
        """
    ),
    "ref_stream_page": oracle_with_cert_domains(
        f"""
        SELECT {_STAR_SQL} FROM cert_domains
        WHERE ts > (SELECT min(ts) FROM cert_domains) + INTERVAL 180 DAY
        ORDER BY ts ASC, fingerprint, domain LIMIT 100
        """
    ),
}

def sketch_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch aggregate family (rows-only — estimates are
    engine-specific) under one slot, long format (sect, key, value):
    'stats' rows are the /stats uniqCombined≈HLL++ counts; 'topk' rows are
    the heavy-hitters topK() analog; 'kmv' rows are k-minimum-values
    distinct sketches per log plus pairwise intersection/union estimates
    between logs — the set operation HLL cannot answer (operators/
    sketches.py). Exact cross-checks live in ref_stats and ref_tld_topk;
    pytest pins all three sketch families to exact values at fixture
    cardinality (tests/test_sketches.py for kmv).

    Composed as ONE spark.sql statement, not a Column-API union of the
    section builders: the Column form cost ~1.6 s of driver time PER
    CALL rebuilding this plan (~3400 py4j round trips + one eager
    analysis per intermediate Dataset — r16 build census), re-analyzing
    the kmv sketch subtree 3x per call. The SQL parses and analyzes
    JVM-side in one round trip. Section-for-section equality with the
    Column operators is pinned by tests/test_sketch_family_parity.py,
    and the per-section bench attribution (SECTIONS) still runs the
    Column builders."""
    from .operators.sketches import CMS_DEPTH, CMS_WIDTH, DEFAULT_K
    from .streaming.rollup import (
        KMV_USERS_K,
        RANGE_A,
        RANGE_B,
        rollup_kmv_cached,
    )

    build_cert_domains(spark, sf_dir)
    rollup_kmv_cached(spark, sf_dir).createOrReplaceTempView("_sf_rollup_kmv")
    k = DEFAULT_K
    ku = KMV_USERS_K
    # 2^64 as a double literal (== float(2**64)); same uniform-hash map
    # as sketches._uniform_hash
    two64 = "18446744073709551616.0D"
    est = (
        "CASE WHEN get({a}, {km1}) IS NOT NULL THEN {km1} / get({a}, {km1}) "
        "ELSE CAST(size({a}) AS DOUBLE) END"
    )
    cms_cells = ", ".join(
        f"named_struct('d', {r}, 'b', CAST(pmod(xxhash64(CAST({{v}} AS STRING),"
        f" {r}), {CMS_WIDTH}) AS INT))"
        for r in range(CMS_DEPTH)
    )
    probes_values = ", ".join(f"('{d}')" for d in CMS_PROBE_DOMAINS)
    range_kmv = (
        "SELECT sort_array(collect_list(_u)) AS kmv FROM ("
        "  SELECT _u, row_number() OVER (ORDER BY _u) AS _r FROM ("
        "    SELECT DISTINCT _u FROM ("
        "      SELECT explode(users_kmv) AS _u FROM _sf_rollup_kmv"
        "      WHERE window_start >= '{lo}' AND window_start < '{hi}')))"
        " WHERE _r <= {ku}"
    )
    sql = f"""
    WITH hashed AS (
      SELECT DISTINCT log_name,
             xxhash64(CAST(domain AS STRING)) / {two64} + 0.5D AS _u
      FROM cert_domains WHERE domain IS NOT NULL
    ), sk AS (
      SELECT log_name, sort_array(collect_list(_u)) AS kmv FROM (
        SELECT log_name, _u,
               row_number() OVER (PARTITION BY log_name ORDER BY _u) AS _r
        FROM hashed
      ) WHERE _r <= {k} GROUP BY log_name
    ), pair_u AS (
      SELECT a.log_name AS ga, b.log_name AS gb, a.kmv AS _ka, b.kmv AS _kb,
             slice(array_sort(array_union(a.kmv, b.kmv)), 1, {k}) AS u
      FROM sk a JOIN sk b ON a.log_name < b.log_name
    ), ra AS ({range_kmv.format(lo=RANGE_A[0], hi=RANGE_A[1], ku=ku)}
    ), rb AS ({range_kmv.format(lo=RANGE_B[0], hi=RANGE_B[1], ku=ku)}
    ), ret AS (
      SELECT {est.format(a="_ka", km1=ku - 1)} AS users_a,
             {est.format(a="_kb", km1=ku - 1)} AS users_b,
             {est.format(a="u", km1=ku - 1)} AS union_est,
             size(array_intersect(array_intersect(u, _ka), _kb)) / size(u)
               AS jaccard
      FROM (SELECT a.kmv AS _ka, b.kmv AS _kb,
                   slice(array_sort(array_union(a.kmv, b.kmv)), 1, {ku}) AS u
            FROM ra a CROSS JOIN rb b)
    ), cms AS (
      SELECT _c.d AS d, _c.b AS b, count(1) AS c FROM (
        SELECT explode(array({cms_cells.format(v="domain")})) AS _c
        FROM cert_domains WHERE domain IS NOT NULL
      ) GROUP BY _c.d, _c.b
    ), cm_addr AS (
      SELECT domain, _c.d AS d, _c.b AS b FROM (
        SELECT domain, explode(array({cms_cells.format(v="domain")})) AS _c
        FROM (SELECT DISTINCT domain
              FROM VALUES {probes_values} AS p(domain))
      )
    ), cm_est AS (
      SELECT /*+ BROADCAST(cms) */ domain, min(coalesce(c, 0)) AS est
      FROM cm_addr LEFT JOIN cms USING (d, b) GROUP BY domain
    )
    SELECT 'stats' AS sect, key, value FROM (
      SELECT stack(3, 'total', total,
                      'approx_subdomains', subdomains,
                      'approx_domains', domains) AS (key, value)
      FROM (SELECT count(1) AS total,
                   approx_count_distinct(domain) AS subdomains,
                   approx_count_distinct(base_domain) AS domains
            FROM cert_domains))
    UNION ALL
    SELECT 'topk', e.item, CAST(e.count AS LONG) FROM (
      SELECT explode(approx_top_k(base_domain, 10, 100000)) AS e
      FROM cert_domains)
    UNION ALL
    SELECT 'kmv', concat('est:', log_name),
           CAST(round({est.format(a="kmv", km1=k - 1)}) AS LONG)
    FROM sk
    UNION ALL
    SELECT 'kmv', concat('inter:', ga, '|', gb),
           -- round(x, 1) BEFORE round(x): kmv_pairwise emits
           -- est_intersection already rounded to 1 dp, and the slot
           -- rounds that — double rounding is observable (2936.47 ->
           -- 2936.5 -> 2937), so the SQL replicates it exactly
           CAST(round(round(
             (size(array_intersect(array_intersect(u, _ka), _kb)) / size(u))
             * ({est.format(a="u", km1=k - 1)}), 1)) AS LONG)
    FROM pair_u
    UNION ALL
    SELECT 'returning', key, CAST(value AS LONG) FROM (
      SELECT stack(5, 'users_a', round(users_a, 1),
                      'users_b', round(users_b, 1),
                      'users_union', round(union_est, 1),
                      'users_both', round(jaccard * union_est, 1),
                      'jaccard_x1e4', round(round(jaccard, 4) * 10000, 0))
             AS (key, value)
      FROM ret)
    UNION ALL
    SELECT 'cms', concat('freq:', domain), CAST(est AS LONG) FROM cm_est
    """
    return spark.sql(sql)


QUERIES = {
    "ref_domain_lookup": domain_lookup,
    "ref_subdomains": subdomains,
    "ref_recent": recent_domains,
    "ref_tld_topk": tld_topk,
    "ref_stats": stats_exact,
    "ref_sketches": sketch_family,  # rows-only by design
    "ref_stream_page": stream_page,
    "ref_table_sizes": table_sizes,  # rows-only by design
    "ref_log_allowlist": log_allowlist,
}


# Per-section bench attribution (r4 verdict #5) — see operators/dedup.py.
def _kmv_section(s, d):
    from .operators.sketches import kmv_pairwise, kmv_sketch

    return kmv_pairwise(
        kmv_sketch(build_cert_domains(s, d), ["log_name"], "domain"), "log_name"
    )


def _returning_section(s, d):
    from .streaming.rollup import returning_users_section

    return returning_users_section(s, d)


def _cms_section(s, d):
    from .operators.sketches import cms_build, cms_estimate

    cert = build_cert_domains(s, d)
    probes = s.createDataFrame(
        [(x,) for x in CMS_PROBE_DOMAINS], "domain string"
    )
    return cms_estimate(cms_build(cert, "domain"), probes, "domain")


SECTIONS = {
    "ref_sketches": {
        "stats": stats_approx,
        "topk": base_domain_topk_sketch,
        "kmv": _kmv_section,
        "returning": _returning_section,
        "cms": _cms_section,
    },
}
