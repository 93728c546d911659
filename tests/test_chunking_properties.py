"""Property tests for the chunking closed form (pure Python — the same
integer formula both the Spark expression ``n_chunks_expr`` and the
DuckDB oracle evaluate), plus one Spark cross-check on non-default
window/stride parameters."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from pyspark.sql import functions as F


def n_chunks(n: int, chunk: int, stride: int) -> int:
    overlap = chunk - stride
    return max(0, n - overlap - 1) // stride + 1


params = st.tuples(
    st.integers(min_value=1, max_value=500),  # n_words
    st.integers(min_value=2, max_value=64),  # chunk_words
).flatmap(
    lambda t: st.tuples(
        st.just(t[0]),
        st.just(t[1]),
        st.integers(min_value=1, max_value=t[1]),  # 1 <= stride <= chunk
    )
)


@given(params)
def test_chunks_cover_every_position(p):
    n, chunk, stride = p
    k = n_chunks(n, chunk, stride)
    covered = set()
    for i in range(k):
        covered.update(range(i * stride, min(i * stride + chunk, n)))
    assert covered == set(range(n))


@given(params)
def test_chunk_count_minimal_and_full_prefix(p):
    """No redundant trailing chunk, and every non-last chunk is full."""
    n, chunk, stride = p
    k = n_chunks(n, chunk, stride)
    if k >= 2:
        # the first k-1 chunks must NOT already cover the last word —
        # which also means every non-last chunk is a full window
        assert (k - 2) * stride + chunk < n
    # every chunk starts inside the document (no empty chunks)
    assert (k - 1) * stride < n


@given(params)
def test_last_chunk_longer_than_overlap(p):
    """The last chunk always carries more than just the overlap — i.e.
    it contributes new words (equivalently: chunk k starts before the
    un-covered tail begins)."""
    n, chunk, stride = p
    overlap = chunk - stride
    k = n_chunks(n, chunk, stride)
    last_len = min(chunk, n - (k - 1) * stride)
    if n > overlap:
        assert last_len > overlap
    else:
        assert k == 1 and last_len == n


def test_spark_chunks_match_formula_on_nondefault_params(spark):
    from ct_clickhouse_spark.operators.text import chunk_documents

    rows = [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for chunk, stride in [(7, 3), (5, 5), (16, 15)]:
        got = {
            r.doc_id: r.n
            for r in chunk_documents(df, chunk_words=chunk, stride=stride)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        want = {i: n_chunks(i, chunk, stride) for i, _ in rows}
        assert got == want
