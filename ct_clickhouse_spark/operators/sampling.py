"""Deterministic sampling + source mixing for training-data pipelines.

Random sampling (``df.sample``/``sampleBy``) is the wrong idiom for
pretraining corpora: the sample changes under re-runs, repartitioning, and
engine swaps, so downstream caches, dedup decisions, and eval splits churn.
The pipeline-grade idiom is CONTENT-KEYED sampling — bucket a stable key
with a hash and keep a fixed bucket range — exactly how the train/test
split in operators/text.py works (same md5-bucket family; here xxhash64
for speed since cross-engine parity of the *selection* is not required,
only determinism).

Both operators are pure narrow projections + filters: no shuffle, no
state, embarrassingly parallel at any scale. Reference has no sampling
surface; this is north-star territory (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hash-bucket resolution: fractions snap to 1/BUCKETS granularity
BUCKETS = 1_000_000

# md5 mode: fractions snap to 1/16^HEX_WIDTH via fixed-width lowercase hex
# prefixes, where lexicographic order == numeric order — the same idiom as
# the train/test split in operators/text.py, portable to any engine with md5.
HEX_WIDTH = 8


def _hex_threshold(fraction: float) -> str:
    """Fixed-width hex threshold for ``bucket_hex < threshold``. 'g' sorts
    after every hex digit, so a full-keep threshold keeps everything.

    The rounded integer itself is compared against 16^W, not the float
    against 1.0: a fraction within half a bucket of 1.0 rounds to 16^W,
    which would otherwise format as a W+1-char string that sorts BEFORE
    every W-char threshold and silently kept ~nothing (found by the
    hypothesis monotonicity property)."""
    v = int(round(fraction * 16**HEX_WIDTH))
    if v >= 16**HEX_WIDTH:
        return "g"
    return format(v, f"0{HEX_WIDTH}x")


def _bucket_hex(key: str, seed: int):
    return F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{seed}"))), 1, HEX_WIDTH
    )


def hash_sample(
    df: DataFrame, key: str, fraction: float, seed: int = 0, method: str = "xxhash64"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by hash bucket
    of ``key``: the same row set survives re-runs, repartitioning, and
    cluster-size changes. ``seed`` picks an independent sample (it salts
    the hash), so disjoint studies don't reuse the same rows.

    ``method``: 'xxhash64' (default, fastest — JVM-native) or 'md5'
    (cross-engine-stable: the selected row SET is reproducible in any
    engine with md5, which is what lets the driver oracle check it)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if method == "md5":
        return df.filter(_bucket_hex(key, seed) < _hex_threshold(fraction))
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(BUCKETS))
    return df.filter(bucket < int(round(fraction * BUCKETS)))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Source mixing — the pretraining data-mixing operator: keep a
    per-source deterministic fraction of rows. ``weights`` maps source
    name -> keep fraction in [0, 1]; sources absent from the map are
    dropped (explicit is better than silently kept).

    One scan, one filter: the per-source fraction is looked up from a
    literal map column, so the plan stays a narrow projection with no
    join, no shuffle, and no per-source pass. At 100 TB this is the
    difference between one scan and |sources| scans.

    ``method`` as in ``hash_sample``: 'md5' makes the kept row set
    engine-portable for differential checking."""
    for src, frac in weights.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"weight for {src!r} must be in [0, 1], got {frac}")
    if method == "md5":
        thr_map = F.create_map(
            *[F.lit(x) for src, frac in weights.items() for x in (src, _hex_threshold(frac))]
        )
        threshold = thr_map[F.col(source_col)]
        return df.filter(threshold.isNotNull() & (_bucket_hex(key, seed) < threshold))
    frac_map = F.create_map(
        *[F.lit(x) for src, frac in weights.items() for x in (src, float(frac))]
    )
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(BUCKETS))
    threshold = (frac_map[F.col(source_col)] * BUCKETS).cast("long")
    return df.filter(threshold.isNotNull() & (bucket < threshold))


def stratified_sample(
    df: DataFrame, group_col: str, n_per_group: int, key: str, seed: int = 0
) -> DataFrame:
    """Deterministic stratified sample: exactly ``min(n, |group|)`` rows
    per group — the standard balanced eval-set builder. Selection order
    is the md5 bucket of ``key`` (content-keyed like hash_sample, so the
    picked set survives re-runs and repartitioning; ``seed`` picks an
    independent draw), with ``key`` as tiebreaker.

    One window shuffle on the group column; per-group state is the
    row_number counter, so a giant group costs a sort of its partition,
    not memory. For fraction-based (unbalanced) sampling use
    ``hash_sample``/``mix_sources`` — no shuffle at all."""
    from pyspark.sql import Window

    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    w = Window.partitionBy(group_col).orderBy(_bucket_hex(key, seed), key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def pack_documents(
    df: DataFrame, key: str, size_col: str, max_size: int, group_col: str | None = None
) -> DataFrame:
    """Sequence packing — group documents into training-sequence bins of
    at most ``max_size`` units (tokens/chars per ``size_col``), the
    standard pretraining batching op.

    Packing is PER GROUP (first-fit-decreasing inside each Arrow batch
    group): globally optimal bin packing is NP-hard and inherently
    serial, so every distributed implementation packs locally — waste is
    bounded by one underfull bin per group, negligible when groups hold
    thousands of docs. The default group is the physical partition
    (fastest: zero shuffle); passing ``group_col`` packs within a logical
    column instead (e.g. source/domain — bins never mix sources, and the
    result is DETERMINISTIC because FFD order is (size desc, key asc)
    within a content-defined group, not a scan-order partition). Bin ids
    are (group, seq) pairs encoded as one long, so they are unique across
    the cluster without coordination. Oversized docs (> max_size) get a
    singleton bin rather than being dropped — the caller decides
    truncation.

    Returns (key, size, bin_id, bin_fill) — one row per input doc.
    NULL sizes (a doc whose text failed extraction) count as 0: the row
    still gets a bin assignment but consumes no capacity — dropping it
    instead would make packing silently lose documents."""
    import hashlib

    import pandas as pd

    from pyspark.sql import functions as _F

    df = df.withColumn(size_col, _F.coalesce(_F.col(size_col), _F.lit(0)))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if group_col is None:
            pid = int(pdf["_pid"].iloc[0])
        else:
            # Stable 43-bit group tag -> disjoint (tag << 20 | seq) bin-id
            # ranges without coordination: 2^20 bins of headroom per
            # group, and 43 tag bits keep the birthday-collision odds for
            # even millions of groups negligible (a 30-bit tag collided
            # with ~70% probability at 50k groups, silently merging bins
            # across groups).
            raw = str(pdf[group_col].iloc[0]).encode("utf-8")
            pid = int.from_bytes(hashlib.md5(raw).digest()[:8], "big") >> 21
        order = pdf.sort_values(
            [size_col, key], ascending=[False, True], ignore_index=True
        )
        bins: list[int] = []  # remaining capacity per bin
        assign: list[int] = []
        for sz in order[size_col]:
            placed = None
            for i, cap in enumerate(bins):
                if sz <= cap:
                    placed = i
                    break
            if placed is None:
                bins.append(max_size)
                placed = len(bins) - 1
            bins[placed] -= min(int(sz), max_size)
            assign.append(placed)
        if group_col is None:
            base = pid * 1_000_000_000
        else:
            base = pid << 20
        order["bin_id"] = [base + b for b in assign]
        fills = order.groupby("bin_id")[size_col].transform("sum")
        cols = {
            key: order[key],
            "size": order[size_col],
            "bin_id": order["bin_id"],
            "bin_fill": fills,
        }
        if group_col is not None:
            cols = {group_col: order[group_col], **cols}
        return pd.DataFrame(cols)

    # derive the passthrough column types from the input frame: callers'
    # keys/groups are not always long/string, and a hardcoded schema
    # fails (or mis-coerces) at Arrow conversion time
    dtypes = dict(df.dtypes)
    if group_col is not None:
        return (
            df.select(group_col, key, size_col)
            .groupBy(group_col)
            .applyInPandas(
                _pack,
                f"{group_col} {dtypes[group_col]}, {key} {dtypes[key]}, "
                "size long, bin_id long, bin_fill long",
            )
        )
    tagged = df.select(key, size_col).withColumn(
        "_pid", _F.spark_partition_id()
    )
    return tagged.groupBy("_pid").applyInPandas(
        _pack, f"{key} {dtypes[key]}, size long, bin_id long, bin_fill long"
    )
