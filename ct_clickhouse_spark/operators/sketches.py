"""KMV (k-minimum-values) distinct sketches with set-operation estimates.

The reference's ClickHouse layer exposes ``uniqCombined`` (HLL-family,
api/app.py:187-188) which this engine mirrors with
``approx_count_distinct`` (api_queries.stats_approx). HLL unions cleanly
but cannot estimate INTERSECTIONS — "how many domains do two CT logs
share", "how many documents appear in both snapshots" need a sketch whose
merged form still identifies shared elements. KMV (Beyer et al. 2007,
"On Synopses for Distinct-Value Estimation Under Multiset Operations")
is the classic answer: keep the k smallest hash values per set; the
k-th smallest value estimates cardinality ((k-1)/u_(k)), the union of
two sketches is the k smallest of the merged value sets, and the
fraction of the union sketch present in both inputs estimates Jaccard —
giving an intersection estimate via |A∩B| ≈ J · |A∪B|.

Scale design (pure JVM, no UDF, bounded state end-to-end):
1. hash: xxhash64 → uniform double in [0,1) — one projection;
2. distinct (group, u): hash aggregate with map-side combine — the
   dedup shuffle any distinct-count pays;
3. k smallest per group: window row_number over (group ORDER BY u),
   filter rank <= k — a SPILLABLE per-group sort, no unbounded
   in-memory collect_set state;
4. sketch row: collect_list over <= k rows per group — output bounded
   at k doubles per group regardless of group cardinality.

Sketch estimates are engine-specific (hash-dependent), so driver
exposure is rows-only (`ref_sketches` 'kmv' section); accuracy and the
merge laws are property-tested against exact counts in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K = 256  # relative error ~ 1/sqrt(k-1) ~= 6%


def _uniform_hash(col: Column) -> Column:
    # signed 64-bit xxhash64 -> uniform [0,1): u = h/2^64 + 0.5.
    # Canonical string cast for type-insensitivity (same argument as
    # bloomjoin._positions: xxhash64(7 int) != xxhash64(7 bigint)).
    return F.xxhash64(col.cast("string")) / F.lit(float(2**64)) + F.lit(0.5)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """One KMV sketch per group: ``group_cols... , kmv array<double>``
    holding the k smallest distinct uniform hashes of ``value_col``.
    Groups with fewer than k distinct values keep them all (the sketch
    is then exact)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 ((k-1)/u_(k) estimator), got {k}")
    # NULLs are excluded BEFORE hashing: xxhash64(NULL) returns the seed
    # (never NULL), so a post-hash null filter is dead code and every
    # NULL would count as one phantom element at u = 0.5
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _uniform_hash(F.col(value_col)).alias("_u"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_u")
    return (
        hashed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_u")).alias("kmv"))
    )


def kmv_distinct_estimate(kmv: Column, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate from a sketch column: (k-1)/u_(k) when
    the sketch holds at least k values, else the exact size.

    ``k`` must be <= the k the sketch was BUILT with (sketches don't
    carry their k). Estimating with a smaller k than the build is valid
    KMV (uses the first k order statistics); a LARGER k than the build
    would silently misread a saturated sketch as exact — keep one k per
    deployment (the callers here all pass their build k through). The
    branch keys on the k-th value existing, not on size < k, so an
    under-k estimate on a bigger sketch stays correct. (F.get, not
    element_at: ANSI mode makes out-of-bounds element_at an error,
    while the unsaturated branch relies on NULL.)"""
    kth = F.get(kmv, k - 1)
    return F.when(kth.isNotNull(), F.lit(k - 1) / kth).otherwise(
        F.size(kmv).cast("double")
    )


def kmv_merge(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """Union sketch: the k smallest of the merged value sets. KMV's
    closure property — the result is exactly the sketch the union stream
    would have produced, so estimates stay unbiased after any merge
    tree (mergeable like the HLL/topK aggregates in streaming/rollup)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_set_estimates(a: Column, b: Column, k: int = DEFAULT_K):
    """(union_est, intersection_est, jaccard_est) columns for two sketch
    columns. Jaccard = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)|; intersection
    = jaccard * union_est (Beyer et al. 2007, §5)."""
    u = kmv_merge(a, b, k)
    union_est = kmv_distinct_estimate(u, k)
    in_both = F.size(F.array_intersect(F.array_intersect(u, a), b))
    jaccard = in_both / F.size(u)
    return union_est, jaccard * union_est, jaccard


def kmv_pairwise(
    sketches: DataFrame, group_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """All-pairs set-operation estimates over a sketch table: one row per
    unordered group pair with distinct/union/intersection/jaccard
    estimates. The join moves only k-double sketch rows — |groups|^2
    sketch comparisons, never data-sized; at 100 TB the sketch table IS
    the small summary artifact (same lifecycle as the rollup sketches)."""
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("_ka")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("_kb")
    )
    union_est, inter_est, jaccard = kmv_set_estimates(
        F.col("_ka"), F.col("_kb"), k
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            F.round(kmv_distinct_estimate(F.col("_ka"), k), 1).alias("est_a"),
            F.round(kmv_distinct_estimate(F.col("_kb"), k), 1).alias("est_b"),
            F.round(union_est, 1).alias("est_union"),
            F.round(inter_est, 1).alias("est_intersection"),
            F.round(jaccard, 4).alias("est_jaccard"),
        )
    )


# ---- Count-Min sketch: mergeable FREQUENCY estimation ---------------------
#
# The fourth member of the sketch family, orthogonal to the others:
# HLL/KMV answer "how many distinct", topK answers "which are heaviest",
# CMS (Cormode & Muthukrishnan 2005, "An improved data stream summary:
# the count-min sketch and its applications") answers "about how OFTEN
# does item x occur" from d*w counters — mergeable by cell-wise addition
# (counts add), one-sided error: est >= true always, est <= true + eps*N
# with probability 1 - (1/2)^d for eps = e/w. The rollup-table use is
# per-window CMS columns answering range frequency queries without a raw
# re-scan, exactly like the KMV/histogram columns.
#
# Scale shape (pure JVM): explode each row to its d (row, bucket) cells
# -> one hash aggregate on (d, bucket) with map-side combine. Output
# bounded at d*w longs regardless of input size.

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(col: Column, row: int, width: int) -> Column:
    # one independent hash per sketch row: xxhash64(value, row_seed)
    return F.pmod(F.xxhash64(col.cast("string"), F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build one CMS over ``value_col``: rows (d int, b int, c long) for
    the NON-ZERO cells (a missing cell is 0). NULL values are excluded
    (the same phantom-element rule as kmv_sketch). Merging two sketches
    is ``union -> groupBy(d, b).sum(c)`` — counts add exactly."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v")
    )
    cells = vals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("d"),
                        _cms_bucket(F.col("_v"), r, width).cast("int").alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c")
    )
    return (
        cells.select(F.col("_c.d").alias("d"), F.col("_c.b").alias("b"))
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Frequency estimates for ``queries[value_col]`` against a built
    sketch: (value_col, est long) with est = min over rows of the
    addressed counters (missing cell = 0). The sketch side is d*w rows
    at most — broadcast; the probe is a d-way small join, never a scan
    of the raw data."""
    probes = queries.select(value_col).distinct()
    addressed = probes.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("d"),
                        _cms_bucket(F.col(value_col), r, width)
                        .cast("int")
                        .alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(value_col, F.col("_c.d").alias("d"), F.col("_c.b").alias("b"))
    joined = addressed.join(F.broadcast(cms), ["d", "b"], "left").select(
        value_col, F.coalesce("c", F.lit(0)).alias("c")
    )
    return joined.groupBy(value_col).agg(F.min("c").cast("long").alias("est"))
