"""Text-analysis operators for a training-data pipeline (north star,
SURVEY §2.10): document stats, quality scoring, language-ID heuristic,
token counting, content fingerprinting.

The scoring/counting operators are built-in-expression-only (JVM,
whole-stage codegen). Python appears exactly where the shape demands it:
the rolling fingerprint (vectorized numpy via mapInPandas) and the
top-terms UDAF (applyInPandas) — both Arrow-batched. The reference has no
text operators; its only string work is lower-casing and LIKE (F6/F7).

Scale notes: all operators are embarrassingly parallel projections or
single hash aggregates; no shuffles except the explicit groupBys. At
100 TB the text column dominates scan cost — every query projects only
the columns it needs so Parquet column pruning does its job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..session import default_parallelism

# Tiny in-query stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}

# BPE-ish tokenizer regex: letter runs, single digits, or single symbols.
TOKEN_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"
FP_WINDOW = 16  # character k-gram width for the rolling fingerprint
DECONTAM_NGRAM = 8  # long n-grams: only real shared passages match
DECONTAM_DF_CAP = 50  # n-grams in more docs than this are boilerplate, not leaks


def _words(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats + heuristic quality score in one projection
    (one driver slot for both operators): word count, char length, avg
    word length, non-alnum junk ratio, and the standard cheap 3-part
    pre-filter score used before LLM training (length band + junk ratio
    + mean-word-length band). Pure JVM expressions, embarrassingly
    parallel, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_chars = F.length("text")
    junk_ratio = F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", "")) / n_chars
    mean_wl = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / F.size(words)
    score = (
        F.when((n_chars >= 100) & (n_chars <= 5000), 1).otherwise(0)
        + F.when(junk_ratio < 0.1, 1).otherwise(0)
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 1).otherwise(0)
    )
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        n_chars.alias("n_chars_actual"),
        F.round(junk_ratio, 4).alias("junk_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        score.alias("quality_score"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic: per-language stopword counts +
    argmax. (The fixture text is synthetic so accuracy is not the point;
    the operator shape — n lexicon scores + argmax — is.)"""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(sw))).alias(f"score_{lang}")
        for lang, sw in STOPWORDS.items()
    }
    scored = docs.select("doc_id", "lang", *scores.values())
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in STOPWORDS:  # first-match-wins tie break, fixed lang order
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id", "lang", *[f"score_{lang}" for lang in STOPWORDS], pred.alias("pred_lang")
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens per doc,
    and corpus totals per source."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        "source",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "re_tokens"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("re_tokens").alias("total_re_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: min/max of a Rabin-Karp rolling polynomial
    hash over sliding FP_WINDOW-byte windows. Deterministic; rows-only.

    Implemented as a numpy rolling hash inside mapInPandas: the window
    hash for every position is computed with vectorized uint64 arithmetic
    (one multiply-add sweep per window byte), not one hash call per
    window — a per-window Catalyst expression was ~10x slower at sf0.1."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").repartition(default_parallelism())
    base = np.uint64(1099511628211)  # FNV-ish odd multiplier

    def _fp(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = np.frombuffer(
                    text.lower().strip().encode("utf-8"), dtype=np.uint8
                )
                n = len(data)
                if n < FP_WINDOW:
                    data = np.pad(data, (0, FP_WINDOW - n))
                    n = FP_WINDOW
                k = n - FP_WINDOW + 1
                with np.errstate(over="ignore"):
                    h = np.zeros(k, dtype=np.uint64)
                    for j in range(FP_WINDOW):
                        h = h * base + data[j : j + k].astype(np.uint64)
                out.append(
                    {
                        "doc_id": doc_id,
                        "fp_min": int(h.min().astype(np.int64)),
                        "fp_max": int(h.max().astype(np.int64)),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "fp_min", "fp_max"])

    return (
        docs.select("doc_id", "text")
        .mapInPandas(_fp, "doc_id long, fp_min long, fp_max long")
    )


TOP_TERMS = 3


def top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDAF surface (SURVEY §2.9): top-N terms per source via
    applyInPandas group-map. The groupBy key distributes the corpus; the
    per-group Python does the term ranking — the escape hatch for
    aggregation logic Spark SQL can't express. (This one *is* SQL-
    expressible, deliberately, so the UDAF path gets a real oracle.)"""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def _top(pdf: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for text in pdf["text"]:
            for w in text.lower().strip().split():
                counts[w] = counts.get(w, 0) + 1
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_TERMS]
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[0],
                "term": [t for t, _ in best],
                "term_rank": range(1, len(best) + 1),
                "n_occurrences": [c for _, c in best],
            }
        )

    schema = "source string, term string, term_rank int, n_occurrences long"
    return (
        docs.select("source", "text")
        .groupBy("source")
        .applyInPandas(_top, schema)
    )


def _split_col(doc_id_col):
    """Deterministic content-keyed split bucket: first hex char of
    md5(doc_id), 0-b -> train (12/16), c-f -> test. Hash-of-stable-key so
    the split survives re-runs, re-partitioning, and engine changes."""
    first_hex = F.substring(F.md5(doc_id_col.cast("string")), 1, 1)
    return F.when(first_hex < "c", "train").otherwise("test")


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split + cross-split decontamination —
    the two standard LLM-pipeline hygiene ops in one result.

    Split: md5-bucket on doc_id (see _split_col), reported per
    (split, lang) so stratification skew is visible.

    Decontamination: `n_leaky_docs` counts docs sharing at least one
    word-DECONTAM_NGRAM-gram with any doc of the OTHER split — the
    benchmark-contamination check, run train-vs-test. Long n-grams (8,
    vs the dedup tier's 3) because short shingles over a small
    vocabulary collide everywhere and the signal saturates; 8-grams
    only match real shared passages. Plan: explode hashed n-grams,
    derive each row's split from its doc_id, one window over the n-gram
    key flags rows whose n-gram appears under both splits (min split !=
    max split), then distinct doc_ids. No self-join, no second pass:
    cost is linear in n-gram rows at any scale.

    n-grams with document frequency above DECONTAM_DF_CAP are excluded
    (computed in the SAME window pass, zero extra cost): semantically,
    corpus-wide boilerplate (license headers, navigation chrome) is not
    contamination; physically, a hot n-gram key would otherwise be an
    unsplittable skewed window partition at 100 TB — the same guard as
    the dedup tier's stop-shingle cap."""
    from .dedup import _words as _dedup_words

    docs = load_table(spark, sf_dir, "documents").repartition(
        default_parallelism()
    )
    # n-gram keys are internal to this query (only counts cross engines),
    # so hash the 8 words directly with multi-arg xxhash64 — no
    # intermediate string concat. The explode has exactly ONE consumer: a
    # window over sh_h flags rows whose n-gram appears under both splits
    # (min != max split), then distinct doc_ids — one shuffle on the
    # n-gram key, no second aggregate-and-join pass over the n-grams.
    from pyspark.sql import Window

    n = DECONTAM_NGRAM
    words = _dedup_words(F.col("text"))
    idx = F.sequence(F.lit(0), F.size(words) - n)
    gram_hashes = F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    sh = docs.select("doc_id", F.explode(gram_hashes).alias("sh_h")).withColumn(
        "split", _split_col(F.col("doc_id"))
    )
    w = Window.partitionBy("sh_h")
    leaky_docs = (
        sh.withColumn(
            "leaky",
            (F.min("split").over(w) != F.max("split").over(w))
            & (F.count(F.lit(1)).over(w) <= DECONTAM_DF_CAP),
        )
        .filter(F.col("leaky"))
        .select("doc_id")
        .distinct()
        .withColumn("is_leaky", F.lit(1))
    )
    return (
        docs.withColumn("split", _split_col(F.col("doc_id")))
        .join(leaky_docs, "doc_id", "left")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.coalesce(F.sum("is_leaky"), F.lit(0)).alias("n_leaky_docs"),
        )
    )


# PII patterns for redaction — the standard pre-training scrub pass.
# Deliberately conservative/deterministic (no locale heuristics): emails,
# IPv4 literals, and international-ish phone numbers.
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "PHONE": r"\+?\d[\d\s().-]{7,}\d",
}


def redact_pii(df: DataFrame, col: str = "text") -> DataFrame:
    """PII redaction (frame-level library op): replace emails, IPv4
    literals, and phone-like digit runs in ``col`` with [TYPE] tokens,
    and report per-row counts per type. Pure JVM regexp expressions in
    one projection — no shuffle, no Python, linear at any scale. Pattern
    order matters: emails first (their domains would otherwise be
    mangled by later passes), then IPs (dotted digits would match the
    phone pattern), then phones."""
    out = df
    redacted = F.col(col)
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name.lower()}", F.size(F.regexp_extract_all(redacted, F.lit(pat), 0))
        )
        redacted = F.regexp_replace(redacted, pat, f"[{name}]")
    return out.withColumn(col, redacted)


def _stopword_sql(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def doc_profile_with_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats + quality score + language-ID, one row per doc:
    the full cheap pre-training document profile under one driver slot.
    Fused into a single projection over ONE scan — both halves are
    embarrassingly-parallel expressions over the same row, so a join on
    doc_id (two scans + a shuffle) would be pure overhead."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_chars = F.length("text")
    junk_ratio = F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", "")) / n_chars
    mean_wl = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / F.size(words)
    score = (
        F.when((n_chars >= 100) & (n_chars <= 5000), 1).otherwise(0)
        + F.when(junk_ratio < 0.1, 1).otherwise(0)
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 1).otherwise(0)
    )
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(sw))).alias(f"score_{lang}")
        for lang, sw in STOPWORDS.items()
    }
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(words).alias("n_words"),
        n_chars.alias("n_chars_actual"),
        F.round(junk_ratio, 4).alias("junk_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        score.alias("quality_score"),
        *scores.values(),
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in STOPWORDS])
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in STOPWORDS:  # first-match-wins tie break, fixed lang order
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("pred_lang", pred)


QUERIES = {
    "text_doc_profile": doc_profile_with_lang,
    "text_token_count": token_count,
    "text_doc_fingerprint": doc_fingerprint,  # rows-only (xxhash64 sketch)
    "text_top_terms_per_source": top_terms_per_source,
    "text_train_test_split": train_test_split,
}

_WORDS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"

ORACLES = {
    "text_doc_profile": f"""
        WITH profile AS (
            SELECT doc_id,
                   len({_WORDS_SQL}) AS n_words,
                   length(text) AS n_chars_actual,
                   round(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                         / length(text), 4) AS junk_ratio,
                   round(list_sum(list_transform({_WORDS_SQL}, w -> length(w)))
                         / len({_WORDS_SQL}), 4) AS mean_word_len,
                   (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
                    + CASE WHEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                                / length(text) < 0.1 THEN 1 ELSE 0 END
                    + CASE WHEN list_sum(list_transform({_WORDS_SQL}, w -> length(w)))
                                / len({_WORDS_SQL}) BETWEEN 3 AND 10 THEN 1 ELSE 0 END
                   ) AS quality_score
            FROM documents
        ), scored AS (
            SELECT doc_id, lang,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({_stopword_sql('en')}, w))) AS score_en,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({_stopword_sql('de')}, w))) AS score_de,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({_stopword_sql('fr')}, w))) AS score_fr,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({_stopword_sql('es')}, w))) AS score_es
            FROM documents
        )
        SELECT p.*, s.lang, s.score_en, s.score_de, s.score_fr, s.score_es,
               CASE WHEN greatest(score_en, score_de, score_fr, score_es) <= 0 THEN 'unknown'
                    WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                    WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM profile p JOIN scored s USING (doc_id) ORDER BY doc_id
    """,
    "text_token_count": f"""
        SELECT source,
               CAST(sum(len({_WORDS_SQL})) AS BIGINT) AS total_ws_tokens,
               CAST(sum(len(regexp_extract_all(lower(text), '{TOKEN_RE}'))) AS BIGINT) AS total_re_tokens,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
    """,
    "text_train_test_split": f"""
        WITH sh AS (
            SELECT doc_id, unnest(list_distinct(sh_list)) AS shingle,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                        THEN 'train' ELSE 'test' END AS split
            FROM (
                SELECT doc_id,
                       CASE WHEN len(words) >= {DECONTAM_NGRAM}
                            THEN list_transform(
                                range(1, len(words) - {DECONTAM_NGRAM - 2}),
                                i -> concat_ws(' ', words[i], words[i+1], words[i+2], words[i+3], words[i+4], words[i+5], words[i+6], words[i+7]))
                            ELSE [] END AS sh_list
                FROM (
                    SELECT doc_id,
                           regexp_split_to_array(lower(trim(text)), '\\s+') AS words
                    FROM documents
                )
            )
        ), leaky_docs AS (
            SELECT DISTINCT doc_id FROM sh
            WHERE shingle IN (
                SELECT shingle FROM sh
                GROUP BY shingle
                HAVING count(DISTINCT split) = 2
                   AND count(*) <= {DECONTAM_DF_CAP}
            )
        )
        SELECT CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 'train' ELSE 'test' END AS split,
               d.lang,
               count(*) AS n_docs,
               CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
               CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaky_docs
        FROM documents d LEFT JOIN leaky_docs l ON d.doc_id = l.doc_id
        GROUP BY 1, 2
    """,
    "text_top_terms_per_source": f"""
        WITH words AS (
            SELECT source, unnest({_WORDS_SQL}) AS term FROM documents
        ), counts AS (
            SELECT source, term, count(*) AS n_occurrences
            FROM words GROUP BY source, term
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY n_occurrences DESC, term
            ) AS term_rank
            FROM counts
        )
        SELECT source, term, CAST(term_rank AS INT) AS term_rank, n_occurrences
        FROM ranked WHERE term_rank <= {TOP_TERMS}
        ORDER BY source, term_rank
    """,
}
