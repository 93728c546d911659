"""Similarity search over embedding vectors (north star, SURVEY §2.10).

Four tiers, mirroring how ANN serving actually scales:
1. brute-force cosine top-k — exact baseline; O(n·d) per query, fully
   JVM-side (zip_with/aggregate), distributes perfectly (map + TakeOrdered)
2. all-pairs above threshold — exact, for offline dedup of small corpora
3. random-hyperplane LSH (SimHash for cosine) — the 100 TB path: 16-bit
   signatures via posexplode + broadcast hyperplane join, banded (4x4 bits)
   bucket-local candidate generation, exact cosine verification only on
   candidates. Recall/precision tuned by bits-per-band vs band count.
4. IVF (coarse quantizer + probed buckets) — the partition-pruning ANN
   path: assignment is a partition key, a probe reads 2/8 of the data.

The hyperplanes are pseudo-random ±1 vectors derived from xxhash64(bit,pos)
parity: deterministic across runs/engines with no RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

TOPK = 10
QUERY_VEC_ID = 0
PAIR_THRESHOLD = 0.42  # max pair cosine in the fixture is ~0.51
LSH_BITS = 16
EMBED_DIM = 64


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def _emb_double(df: DataFrame, out: str = "emb") -> DataFrame:
    return df.withColumn(out, F.col("embedding").cast("array<double>"))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k against the vec_id=0 query vector.
    Broadcast the 1-row query side; TakeOrderedAndProject does the top-k."""
    emb = _emb_double(load_table(spark, sf_dir, "embeddings"))
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qvec")
    )
    cos = _dot(F.col("emb"), F.col("qvec")) / (_norm(F.col("emb")) * _norm(F.col("qvec")))
    return (
        emb.crossJoin(F.broadcast(query))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(cos, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOPK)
    )


def _normalized_matrix(spark: SparkSession, sf_dir: str):
    """Broadcast (ids, row-normalized float64 matrix) of all embeddings.

    The GEMM-side of brute-force similarity: one side of the comparison is
    broadcast as a dense numpy matrix so the dot products run in BLAS
    instead of per-element Catalyst expressions (a pure-expression
    formulation was ~50x slower at sf0.1). At 100 TB the broadcast side
    becomes a *block*: tile the matrix and mapInPandas per block-pair —
    identical kernel, outer loop over blocks; or use the LSH tier below."""
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return spark.sparkContext.broadcast((ids, mat))


def cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine >= threshold (near-duplicate vectors).
    O(n^2) flops — but as distributed GEMM: each partition of vectors is
    multiplied against the broadcast normalized matrix with numpy; only
    above-threshold (id_a < id_b) pairs are emitted."""
    import numpy as np
    import pandas as pd

    bc = _normalized_matrix(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _pairs(batches):
        ids_all, mat_all = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = np.round(a @ mat_all.T, 4)
            keep = (sims >= PAIR_THRESHOLD) & (a_ids[:, None] < ids_all[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": ids_all[bj], "cosine": sims[ai, bj]}
            )

    return emb.mapInPandas(_pairs, "id_a long, id_b long, cosine double")


def _hyperplanes(spark: SparkSession) -> DataFrame:
    """LSH_BITS x EMBED_DIM pseudo-random ±1 hyperplane components, derived
    from xxhash64 parity — a tiny broadcastable dim table built in-plan."""
    return spark.range(LSH_BITS).select(
        F.col("id").alias("bit"),
        F.explode(F.sequence(F.lit(0), F.lit(EMBED_DIM - 1))).alias("pos"),
    ).select(
        "bit",
        "pos",
        (F.when(F.pmod(F.xxhash64("bit", "pos"), 2) == 0, 1.0).otherwise(-1.0)).alias(
            "sign"
        ),
    )


def lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit random-hyperplane signature per vector.

    posexplode(embedding) -> broadcast-join the hyperplane table ->
    groupBy(vec_id, bit) sum -> sign -> pack bits. Two hash aggregates,
    all JVM; scales linearly in n·d·bits."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    dots = (
        comps.join(F.broadcast(_hyperplanes(spark)), "pos")
        .groupBy("vec_id", "bit")
        .agg(F.sum(F.col("v") * F.col("sign")).alias("dot"))
    )
    return (
        dots.groupBy("vec_id")
        .agg(
            F.sum(
                F.when(F.col("dot") > 0, F.expr("shiftleft(1L, CAST(bit AS INT))")).otherwise(F.lit(0))
            ).alias("signature")
        )
    )


LSH_BANDS = 4  # 4 bands x 4 bits


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN near-dup pairs: banded signature buckets generate candidates,
    exact cosine verifies inside buckets only. At 100 TB the banded join
    replaces the O(n^2) cross join with LSH_BANDS shuffles on small keys;
    recall = 1-(1-p^4)^4 where p = 1 - angle/pi."""
    import numpy as np
    import pandas as pd

    bits_per_band = LSH_BITS // LSH_BANDS
    sigs = lsh_signatures(spark, sf_dir)
    mask = (1 << bits_per_band) - 1
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"CAST(shiftright(signature, {b * bits_per_band}) AS BIGINT) & {mask}"
                        ).alias("bucket"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bucket")
    a = bands.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    b = bands.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact-cosine verification of candidates: vectorized gather against the
    # broadcast normalized matrix (no embedding arrays ever shuffle)
    bc = _normalized_matrix(spark, sf_dir)

    def _verify(batches):
        ids_all, mat_all = bc.value
        pos = {int(v): i for i, v in enumerate(ids_all)}
        for pdf in batches:
            if pdf.empty:
                continue
            ia = pdf["id_a"].map(pos).to_numpy()
            ib = pdf["id_b"].map(pos).to_numpy()
            sims = np.round(np.einsum("ij,ij->i", mat_all[ia], mat_all[ib]), 4)
            keep = sims >= PAIR_THRESHOLD
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": sims[keep],
                }
            )

    return cand.mapInPandas(_verify, "id_a long, id_b long, cosine double")


IVF_CLUSTERS = 8
IVF_PROBES = 2
IVF_ITERS = 2


def _ivf_centroids(ids, mat):
    """Deterministic k-means-lite coarse quantizer: seeds = the k lowest
    vec_ids, then IVF_ITERS Lloyd iterations. Runs on the (already
    broadcast-sized) matrix; at 100 TB train on a sample or with a
    distributed k-means — the assignment/probe plan below is unchanged."""
    import numpy as np

    order = np.argsort(ids)
    cents = mat[order[:IVF_CLUSTERS]].copy()
    for _ in range(IVF_ITERS):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(IVF_CLUSTERS):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / (np.linalg.norm(m) or 1.0)
    return cents


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (the other classic ANN scale path, besides
    LSH): vectors are bucketed by nearest coarse centroid; the query
    probes only its IVF_PROBES closest buckets and runs exact cosine
    there. At scale the assignment is a partition key — the probe reads
    IVF_PROBES/IVF_CLUSTERS of the data instead of all of it."""
    import numpy as np
    import pandas as pd

    bc = _normalized_matrix(spark, sf_dir)
    ids_all, mat_all = bc.value
    cents = _ivf_centroids(ids_all, mat_all)
    qvec = mat_all[np.nonzero(ids_all == QUERY_VEC_ID)[0][0]]
    probe = set(np.argsort(-(cents @ qvec))[:IVF_PROBES].tolist())
    bc_cents = spark.sparkContext.broadcast((cents, probe, qvec))

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")

    def _search(batches):
        cents_, probe_, q = bc_cents.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            assign = np.argmax(m @ cents_.T, axis=1)
            in_probe = np.isin(assign, list(probe_)) & (
                pdf["vec_id"].to_numpy() != QUERY_VEC_ID
            )
            if not in_probe.any():
                continue
            sims = np.round(m[in_probe] @ q, 4)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[in_probe],
                    "label": pdf["label"].to_numpy()[in_probe],
                    "cosine": sims,
                }
            )

    return (
        emb.mapInPandas(_search, "vec_id long, label int, cosine double")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(TOPK)
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode + avg per (label, pos) —
    the building block of IVF coarse quantization."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("centroid_v"))
    )


QUERIES = {
    "sim_cosine_topk": cosine_topk,
    "sim_cosine_pairs": cosine_pairs,
    "sim_lsh_signatures": lsh_signatures,  # rows-only (hash sketch)
    "sim_lsh_pairs": lsh_candidate_pairs,  # rows-only (hash sketch)
    "sim_ivf_topk": ivf_topk,  # rows-only (approximate index)
    "sim_label_centroids": label_centroids,
}

_COS_SQL = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)

ORACLES = {
    "sim_cosine_topk": f"""
        SELECT a.vec_id AS vec_id, a.label AS label,
               round({_COS_SQL}, 4) AS cosine
        FROM embeddings a, embeddings b
        WHERE b.vec_id = {QUERY_VEC_ID} AND a.vec_id != {QUERY_VEC_ID}
        ORDER BY cosine DESC, vec_id LIMIT {TOPK}
    """,
    "sim_cosine_pairs": f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_COS_SQL}, 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({_COS_SQL}, 4) >= {PAIR_THRESHOLD}
        ORDER BY id_a, id_b
    """,
    "sim_label_centroids": """
        SELECT label, pos - 1 AS pos, round(avg(v), 6) AS centroid_v
        FROM (
            SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ) GROUP BY label, pos ORDER BY label, pos
    """,
}
