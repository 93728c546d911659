"""Document chunking + BM25 retrieval tests.

Chunking: the exploded chunk rows must agree with the closed-form
``n_chunks_expr`` the driver slot pins, reassemble to the original word
sequence, and respect the window/stride/overlap contract.

BM25: scores must match an independent pure-Python reference on the
fixture, and the plan must be one scan + a broadcast of the 1-row corpus
stats (no explode, no global sort).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    CHUNK_STRIDE,
    CHUNK_WORDS,
    bm25_topk,
    chunk_documents,
    n_chunks_expr,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_chunks(words, chunk=CHUNK_WORDS, stride=CHUNK_STRIDE):
    """Pure-python reference: starts 0, stride, ... while start <
    n - overlap (>= 1 chunk always)."""
    overlap = chunk - stride
    n = len(words)
    k = max(0, n - overlap - 1) // stride + 1
    return [words[i * stride : i * stride + chunk] for i in range(k)]


def test_chunks_match_reference_and_closed_form(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(60)
    got = (
        chunk_documents(docs)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    texts = {
        r["doc_id"]: r["text"].lower().strip().split()
        for r in docs.select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, words in texts.items():
        ref = _ref_chunks(words)
        rows = by_doc[doc_id]
        assert [r["chunk_id"] for r in rows] == list(range(len(ref)))
        for r, ref_chunk in zip(rows, ref):
            assert r["chunk_start"] == r["chunk_id"] * CHUNK_STRIDE
            assert r["chunk_text"].split() == ref_chunk
            assert r["n_chunk_words"] == len(ref_chunk)
        # reassembly: stride-prefixes of every chunk + tail of the last
        # chunk reproduce the original word sequence exactly
        rebuilt = []
        for r in rows[:-1]:
            rebuilt.extend(r["chunk_text"].split()[:CHUNK_STRIDE])
        rebuilt.extend(rows[-1]["chunk_text"].split())
        assert rebuilt == words
        # overlap contract between consecutive chunks
        for a, b in zip(rows, rows[1:]):
            ov = CHUNK_WORDS - CHUNK_STRIDE
            assert a["chunk_text"].split()[-ov:] == b["chunk_text"].split()[:ov] or (
                a["n_chunk_words"] < CHUNK_WORDS
            )


def test_closed_form_equals_exploded_count(spark):
    docs = load_table(spark, SF_DIR, "documents")
    counted = (
        chunk_documents(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exploded"))
    )
    closed = docs.select(
        "doc_id", n_chunks_expr(F.size(F.split(F.lower(F.trim("text")), r"\s+"))).alias("n_closed")
    )
    bad = (
        counted.join(closed, "doc_id")
        .filter(F.col("n_exploded") != F.col("n_closed"))
        .count()
    )
    assert bad == 0


def _ref_bm25(rows, terms=BM25_QUERY_TERMS, k1=BM25_K1, b=BM25_B):
    docs = {r["doc_id"]: r["text"].lower().strip().split() for r in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    dfs = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    out = {}
    for doc_id, words in docs.items():
        dl = len(words)
        score = 0.0
        for t in terms:
            tf = words.count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            score = score + idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
        if any(t in words for t in terms):
            out[doc_id] = score
    return out


def test_bm25_matches_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ref = _ref_bm25(docs.select("doc_id", "text").collect())
    expected = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = bm25_topk(spark, SF_DIR).orderBy("rnk").collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert abs(r["score_x1e4"] - round(s * 10000)) <= 1


def test_bm25_plan_shape(spark):
    plan = bm25_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    # the top-k must not be a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode anywhere in the scoring path


def test_top_terms_udaf_matches_distributed(spark):
    """The applyInPandas UDAF (SURVEY §2.9 surface demo,
    top_terms_per_source_udaf) must agree row-for-row with the
    distributed explode->hash-agg->window production path on the
    fixture — the rel_quantiles exact-vs-distributed pattern."""
    from ct_clickhouse_spark.operators.text import (
        top_terms_per_source,
        top_terms_per_source_udaf,
    )

    key = lambda r: (r["source"], r["term_rank"])
    dist = sorted(top_terms_per_source(spark, SF_DIR).collect(), key=key)
    udaf = sorted(top_terms_per_source_udaf(spark, SF_DIR).collect(), key=key)
    assert dist == udaf
    assert len(dist) > 0


def test_top_terms_driver_slot_has_no_pandas_group(spark):
    """The driver slot's plan must not contain a whole-source pandas
    group (FlatMapGroupsInPandas) — the production path is pure JVM:
    hash aggregate + window."""
    from ct_clickhouse_spark.operators.text import top_terms_and_bm25

    plan = (
        top_terms_and_bm25(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "HashAggregate" in plan
