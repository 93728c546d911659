"""End-to-end pipeline composition: the frame-level operators chained
the way a training-data pipeline actually runs —

    quality_filter -> incremental_dedup (vs corpus) -> near-dup drop
    (ngram Jaccard + connected components) -> chunk -> bpe_encode ->
    pack_documents

Each stage consumes the previous stage's DataFrame with no glue code
beyond column selection; the asserts pin what each stage contributed so
a regression anywhere in the chain names its stage."""

from __future__ import annotations

import ct_clickhouse_spark as ct
from pyspark.sql import functions as F


def _corpus(spark):
    filler = [
        "the project documentation describes installation and usage",
        "weather patterns shifted across the northern plains yesterday",
        "a recipe for bread needs flour water salt and yeast",
        "satellites relay measurements from remote ocean buoys daily",
        "the committee approved funding for the library renovation",
        "musicians rehearsed the symphony in the old concert hall",
    ]
    near_dup_a = "machine learning models require large curated datasets for training"
    near_dup_b = "machine learning models require large curated datasets for pretraining"
    rows = []
    # 0-5: clean unique docs
    for i, t in enumerate(filler):
        rows.append((i, t))
    # 6/7: near-duplicates of each other (one should survive)
    rows.append((6, near_dup_a))
    rows.append((7, near_dup_b))
    # 8: exact duplicate of a historical-corpus doc (dropped by incremental)
    rows.append((8, "this exact document already exists in the corpus"))
    # 9: junk (dropped by quality_filter)
    rows.append((9, "@@@@ #### $$$$ %%%%"))
    # 10: too short (dropped by quality_filter)
    rows.append((10, "tiny"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_full_pipeline_composes(spark):
    batch = _corpus(spark)
    historical = spark.createDataFrame(
        [("this exact document already exists in the corpus",)], "text string"
    ).select(F.md5("text").alias("text_hash"))

    # 1. quality filter (audit-trail semantics)
    filtered = ct.quality_filter(batch, min_words=5)
    dropped = {
        r.doc_id: list(r.drop_reasons)
        for r in filtered.filter(~F.col("keep")).collect()
    }
    assert set(dropped) == {9, 10}
    kept = filtered.filter("keep").select("doc_id", "text")

    # 2. incremental dedup vs the historical corpus
    hashed = kept.withColumn("text_hash", F.md5("text"))
    new_docs = ct.incremental_dedup(hashed, historical, "text_hash").drop(
        "text_hash"
    )
    assert {r.doc_id for r in new_docs.select("doc_id").collect()} == set(
        range(8)
    )

    # 3. near-dup grouping: shingle Jaccard pairs -> connected
    #    components -> keep min doc_id per group
    pairs = ct.ngram_jaccard_pairs_for(new_docs).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    ids = new_docs.select(F.col("doc_id").alias("id"))
    labels = ct.label_propagate(ids, pairs)
    keepers = (
        labels.groupBy("label").agg(F.min("id").alias("doc_id"))
    )
    deduped = new_docs.join(keepers.select("doc_id"), "doc_id", "left_semi")
    surviving = {r.doc_id for r in deduped.select("doc_id").collect()}
    assert 6 in surviving and 7 not in surviving  # one of the near-dups
    assert set(range(6)) <= surviving

    # 4. chunk -> 5. tokenize -> 6. pack
    chunks = ct.chunk_documents(
        deduped, chunk_words=6, stride=4, keep_cols=("doc_id",)
    ).withColumn(
        "chunk_key",
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")),
    )
    merges = ct.bpe_train(deduped, n_merges=4)
    tokenized = ct.bpe_encode(
        chunks.select("chunk_key", F.col("chunk_text").alias("text")), merges
    ).withColumn("n_tokens", F.size("tokens"))
    assert tokenized.filter("n_tokens <= 0").count() == 0

    packed = ct.pack_documents(
        tokenized.select("chunk_key", "n_tokens"),
        "chunk_key",
        "n_tokens",
        max_size=64,
    )
    rows = packed.collect()
    assert {r.chunk_key for r in rows} == {
        r.chunk_key for r in tokenized.select("chunk_key").collect()
    }  # every chunk packed exactly once
    # bin capacity respected (oversized singletons would exceed only if
    # a single chunk were > 64 tokens, which chunk_words=6 precludes)
    assert packed.filter(F.col("bin_fill") > 64).count() == 0
