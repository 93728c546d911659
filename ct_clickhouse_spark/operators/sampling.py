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


def hash_sample(df: DataFrame, key: str, fraction: float, seed: int = 0) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by hash bucket
    of ``key``: the same row set survives re-runs, repartitioning, and
    cluster-size changes. ``seed`` picks an independent sample (it salts
    the hash), so disjoint studies don't reuse the same rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(BUCKETS))
    return df.filter(bucket < int(round(fraction * BUCKETS)))


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
) -> DataFrame:
    """Source mixing — the pretraining data-mixing operator: keep a
    per-source deterministic fraction of rows. ``weights`` maps source
    name -> keep fraction in [0, 1]; sources absent from the map are
    dropped (explicit is better than silently kept).

    One scan, one filter: the per-source fraction is looked up from a
    literal map column, so the plan stays a narrow projection with no
    join, no shuffle, and no per-source pass. At 100 TB this is the
    difference between one scan and |sources| scans."""
    for src, frac in weights.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"weight for {src!r} must be in [0, 1], got {frac}")
    frac_map = F.create_map(
        *[F.lit(x) for src, frac in weights.items() for x in (src, float(frac))]
    )
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(BUCKETS))
    threshold = (frac_map[F.col(source_col)] * BUCKETS).cast("long")
    return df.filter(threshold.isNotNull() & (bucket < threshold))


def pack_documents(
    df: DataFrame, key: str, size_col: str, max_size: int
) -> DataFrame:
    """Sequence packing — group documents into training-sequence bins of
    at most ``max_size`` units (tokens/chars per ``size_col``), the
    standard pretraining batching op.

    Packing is PER PARTITION (first-fit-decreasing inside each Arrow
    batch group): globally optimal bin packing is NP-hard and inherently
    serial, so every distributed implementation packs locally — waste is
    bounded by one underfull bin per partition, negligible when
    partitions hold thousands of docs. Bin ids are (partition, seq)
    pairs encoded as one long, so they are unique across the cluster
    without coordination. Oversized docs (> max_size) get a singleton
    bin rather than being dropped — the caller decides truncation.

    Returns (key, size, bin_id, bin_fill) — one row per input doc."""
    import pandas as pd

    from pyspark.sql import functions as _F

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["_pid"].iloc[0])
        order = pdf.sort_values(size_col, ascending=False, ignore_index=True)
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
        order["bin_id"] = [pid * 1_000_000_000 + b for b in assign]
        fills = order.groupby("bin_id")[size_col].transform("sum")
        return pd.DataFrame(
            {
                key: order[key],
                "size": order[size_col],
                "bin_id": order["bin_id"],
                "bin_fill": fills,
            }
        )

    tagged = df.select(key, size_col).withColumn(
        "_pid", _F.spark_partition_id()
    )
    return tagged.groupBy("_pid").applyInPandas(
        _pack, f"{key} long, size long, bin_id long, bin_fill long"
    )
