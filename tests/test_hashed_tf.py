"""Feature-hashing TF vectors: exact bucket counts vs an independent
Python computation, norm semantics, and end-to-end composition with the
vector tier (hashed text through label_propagate finds the planted
duplicate groups)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ct_clickhouse_spark.operators.text import hashed_tf


def test_hashed_tf_matches_reference_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "x"), (2, "")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: list(r.embedding)
        for r in hashed_tf(docs, dim=8, l2_normalize=False).collect()
    }
    hashes = {
        r.w: r.h
        for r in spark.createDataFrame(
            [("a",), ("b",), ("c",), ("x",), ("",)], "w string"
        )
        .select("w", F.pmod(F.xxhash64("w"), F.lit(8)).alias("h"))
        .collect()
    }
    want0 = [0.0] * 8
    for w in "a b a c".split():
        want0[hashes[w]] += 1
    assert rows[0] == want0
    assert sum(rows[1]) == 1.0
    # empty text splits to [''] — one token, the '' bucket (documented
    # _words semantics, same as the profile/span operators)
    assert sum(rows[2]) == 1.0 and rows[2][hashes[""]] == 1.0


def test_hashed_tf_l2_normalized(spark):
    docs = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5 w6 w1")], "doc_id long, text string"
    )
    v = np.array(hashed_tf(docs, dim=16).collect()[0].embedding)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_hashed_tf_feeds_the_vector_tier(spark):
    """Composition test: hashed vectors of near-identical texts cluster
    into the planted groups through label_propagate, with unrelated text
    left alone — text in, connected components out, no external model."""
    from ct_clickhouse_spark.operators.similarity import label_propagate

    texts = {
        0: "the cat sat on the mat and purred all day long",
        1: "the cat sat on the mat and purred all day",  # near-dup of 0
        10: "stock markets rallied after the central bank decision today",
        11: "stock markets rallied after the central bank decision",  # of 10
        20: "completely unrelated gibberish zq plork wunk vex",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    emb = hashed_tf(docs, dim=64)
    a = emb.select(F.col("doc_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("doc_id").alias("id_b"), F.col("embedding").alias("eb"))
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot.alias("cos"))
        .filter(F.col("cos") > 0.8)
        .select("id_a", "id_b")
    )
    ids = emb.select(F.col("doc_id").alias("id"))
    labels = {r.id: r.label for r in label_propagate(ids, pairs).collect()}
    assert labels[0] == labels[1]
    assert labels[10] == labels[11]
    assert len({labels[0], labels[10], labels[20]}) == 3


def test_hashed_tf_null_text_is_zero_vector(spark):
    """NULL text must yield a ZERO vector, not all-NULL buckets (under
    ANSI semantics size(filter(NULL)) is NULL per bucket) — NULL cells
    would poison downstream cosine/ANN math."""
    docs = spark.createDataFrame(
        [(1, None), (2, "hello world")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.embedding for r in hashed_tf(docs, dim=8).collect()}
    assert rows[1] == [0.0] * 8
    assert all(v is not None for v in rows[2])
