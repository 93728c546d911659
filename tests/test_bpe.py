"""BPE merge-table training (text.bpe_train): the distributed trainer
must produce exactly the merge sequence of a reference pure-Python BPE
on the same corpus (count-weighted, lexicographic tie-break), be
deterministic, and respect the merge-application semantics (left-to-
right, non-overlapping)."""

from __future__ import annotations

from ct_clickhouse_spark.catalog import load_table
from ct_clickhouse_spark.operators.text import bpe_train

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    return merges


def test_bpe_matches_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    counts: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in r.text.lower().strip().split():
            counts[w] = counts.get(w, 0) + 1
    want = _ref_bpe(counts, 6)
    got = bpe_train(docs, n_merges=6)
    assert got == want
    # merges build on earlier merges: at least one learned symbol is a
    # product of a previous round (multi-char side), or the corpus is
    # degenerate — the fixture is not
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in got[1:])


def test_bpe_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert bpe_train(docs, n_merges=4) == bpe_train(docs, n_merges=4)


def _ref_encode_word(word, ranks):
    syms = list(word) + ["</w>"]
    while len(syms) >= 2:
        ranked = [
            (ranks[(x, y)], i)
            for i, (x, y) in enumerate(zip(syms, syms[1:]))
            if (x, y) in ranks
        ]
        if not ranked:
            break
        _, best_i = min(ranked)
        a, b = syms[best_i], syms[best_i + 1]
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    from ct_clickhouse_spark.operators.text import bpe_encode

    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe_train(docs, n_merges=8)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    rows = bpe_encode(docs, merges).select("doc_id", "text", "tokens").collect()
    assert rows
    merged_symbol_seen = False
    for r in rows:
        words = r.text.lower().strip().split()
        want = [t for w in words for t in _ref_encode_word(w, ranks)]
        assert list(r.tokens) == want, r.doc_id
        # lossless: stripping </w> and rejoining reconstructs the words
        rebuilt = "".join(r.tokens).replace("</w>", " ").split()
        assert rebuilt == words, r.doc_id
        merged_symbol_seen = merged_symbol_seen or any(
            len(t.replace("</w>", "")) > 1 for t in r.tokens
        )
    # the learned merges actually apply somewhere on the corpus
    assert merged_symbol_seen


def test_bpe_encode_compresses_and_caches(spark):
    """More merges -> no more tokens (monotone compression), and the
    memoized encoder agrees with itself across partitionings."""
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.text import bpe_encode

    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe_train(docs, n_merges=8)
    n8 = (
        bpe_encode(docs, merges)
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    n0 = (
        bpe_encode(docs, [])
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    assert n8 < n0
    n8_repart = (
        bpe_encode(docs.repartition(7), merges)
        .agg(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    assert n8_repart == n8


def test_bpe_encode_uses_trainer_tokenization_on_unicode_whitespace(spark):
    """Java \\s is ASCII-only: 'foo\\u00a0bar' is ONE word to the trainer
    and must be ONE word to the encoder (a Python re-split would see
    two). With no merges it encodes to its chars + one boundary mark."""
    from ct_clickhouse_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(0, "foo\u00a0bar")], "doc_id long, text string"
    )
    toks = bpe_encode(docs, []).collect()[0].tokens
    assert list(toks) == list("foo\u00a0bar") + ["</w>"]


def test_bpe_encode_null_text_tokenizes_empty(spark):
    from ct_clickhouse_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, []).collect()}
    assert rows[1] == []
    assert rows[0]
