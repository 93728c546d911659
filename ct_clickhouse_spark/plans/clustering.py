"""Z-order clustering: multi-dimensional data layout for file/row-group
skipping (the Spark-side analog of the reference's MergeTree multi-column
ORDER BY data skipping, clickhouse/init.sql:18).

A single-column sort gives perfect min/max pruning on that column and
none on any other. Interleaving the bits of several columns' bucket ranks
(the Z-/Morton curve) gives every interleaved column partial locality:
with 2 columns, each file covers ~sqrt(F) of each column's range instead
of all of it, so a point/range predicate on EITHER column prunes ~1-1/sqrt(F)
of files via Parquet footer stats — at 100 TB that's the difference
between scanning a full partition and a few files.

Everything here is pure JVM expressions (min/max agg + arithmetic + bit
ops): the z-key costs one tiny aggregate plus one projection, then rides
an ordinary repartitionByRange + sortWithinPartitions write — no UDFs, no
driver data movement beyond the 2x|cols| min/max scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bucket resolution per dimension (16 bits x 2 dims fits a long)


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer rank in [0, 2^bits).

    Equal-width buckets keep the whole computation a closed-form
    expression (no quantile pass); for heavily skewed layout keys, bucket
    an already-rank-like proxy (e.g. a date ordinal or a hash) instead."""
    span = (hi - lo).cast("double")
    scaled = F.when(
        span > 0, ((col.cast("double") - lo) / span * ((1 << bits) - 1))
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def zorder_key(buckets: list[Column], bits: int = Z_BITS) -> Column:
    """Interleave the bits of per-dimension bucket ranks into one Morton
    key: bit i of dimension d lands at position i*len(buckets)+d. Built
    as a sum of shift/mask terms — stays inside whole-stage codegen."""
    ndim = len(buckets)
    if not 1 <= ndim <= 4:
        raise ValueError(f"zorder_key supports 1-4 dimensions, got {ndim}")
    if bits * ndim > 62:
        raise ValueError(f"{bits} bits x {ndim} dims overflows a signed long")
    terms = []
    for d, b in enumerate(buckets):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ndim + d)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = Z_BITS, key_col: str = "_zkey"
) -> DataFrame:
    """Attach the z-key for ``cols``: one global min/max aggregate (tiny,
    broadcast back as literals via a cross join of the 1-row bounds frame)
    + one projection. No data moves to the driver."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    buckets = [
        _bucket(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    return with_bounds.withColumn(key_col, zorder_key(buckets, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as ``n_files`` z-clustered Parquet files: range
    partition on the z-key (each file owns a contiguous Morton range, so
    its footer min/max for EVERY interleaved column covers only a fraction
    of that column's domain), sort within each file for row-group-level
    skipping, drop the key before writing."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_fractions(spark, path: str, cols: list[str]) -> dict[str, float]:
    """Layout-quality probe: mean per-file (max-min)/(global max-min) for
    each column, from Parquet footer stats only (no data read). 1.0 means
    files don't cluster the column at all (every file spans the domain);
    z-ordered 2-dim layouts land ~1/sqrt(n_files) on both columns."""
    import pyarrow.parquet as pq

    dataset = pq.ParquetDataset(path)
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for frag in dataset.fragments:
        md = frag.metadata
        schema_names = [md.row_group(0).column(i).path_in_schema
                        for i in range(md.num_columns)]
        per_file: dict[str, tuple[float, float]] = {}
        for rg in range(md.num_row_groups):
            for i, name in enumerate(schema_names):
                if name not in cols:
                    continue
                st = md.row_group(rg).column(i).statistics
                if st is None or st.min is None:
                    continue
                lo, hi = float(st.min), float(st.max)
                if name in per_file:
                    plo, phi = per_file[name]
                    per_file[name] = (min(plo, lo), max(phi, hi))
                else:
                    per_file[name] = (lo, hi)
        for name, (lo, hi) in per_file.items():
            spans[name].append((lo, hi))
    out: dict[str, float] = {}
    for c, ranges in spans.items():
        glo = min(lo for lo, _ in ranges)
        ghi = max(hi for _, hi in ranges)
        denom = (ghi - glo) or 1.0
        out[c] = sum((hi - lo) / denom for lo, hi in ranges) / len(ranges)
    return out
