"""Scalar-function layer: public-suffix extraction + X.509 parsing."""

from __future__ import annotations

import pytest

from ct_clickhouse_spark.functions.domains import base_domain, public_suffix
from ct_clickhouse_spark.functions.x509 import extract_der, parse_cert_der
from tests.ctgen import make_cert_der, wrap_leaf


@pytest.mark.parametrize(
    "domain,expected",
    [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("pejcic.rs", "pejcic.rs"),
        ("sub.pejcic.rs", "pejcic.rs"),
        ("x.gov.rs", "x.gov.rs"),
        ("deep.x.gov.rs", "x.gov.rs"),
        ("foo.github.io", "foo.github.io"),
        ("a.foo.github.io", "foo.github.io"),
        # wildcard rule *.ck: suffix is <label>.ck
        ("a.b.whatever.ck", "b.whatever.ck"),
        # exception rule !www.ck
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # unknown TLD falls back to last-label suffix
        ("thing.weirdtld", "thing.weirdtld"),
        ("", None),
        (None, None),
    ],
)
def test_base_domain(domain, expected):
    assert base_domain(domain) == expected


def test_public_suffix_basics():
    assert public_suffix("www.example.co.uk") == "co.uk"
    assert public_suffix("example.com") == "com"
    assert public_suffix("b.whatever.ck") == "whatever.ck"


def test_base_domain_udf_vectorized(spark):
    from ct_clickhouse_spark.functions.domains import base_domain_udf

    df = spark.createDataFrame(
        [("www.example.com",), ("a.b.example.co.uk",), (None,)], ["domain"]
    ).select(base_domain_udf("domain").alias("b"))
    assert [r.b for r in df.collect()] == ["example.com", "example.co.uk", None]


def test_extract_der_roundtrip():
    der = make_cert_der(["example.com", "www.example.com"], serial=1)
    assert extract_der(wrap_leaf(der)) == der
    # non-timestamped leaf skipped (ct_ingestor.py:117-118 parity)
    assert extract_der(wrap_leaf(der, leaf_type=1)) is None
    # precert entries skipped
    assert extract_der(wrap_leaf(der, entry_type=1)) is None
    # truncated garbage
    assert extract_der(b"\x00\x00") is None
    assert extract_der(wrap_leaf(der)[:-5]) is None


def test_parse_cert_der_fields():
    der = make_cert_der(["Example.COM", "www.example.com", "mail.example.com"], serial=7)
    parsed = parse_cert_der(der)
    assert parsed is not None
    assert len(parsed["fingerprint"]) == 64
    # names lowercased + deduped, CN first (ct_ingestor.py:127-136 parity)
    assert parsed["domains"] == ["example.com", "www.example.com", "mail.example.com"]
    assert "CN=Example.COM" in parsed["subject"]
    assert parsed["not_before"].year == 2024
    assert parse_cert_der(b"not a cert") is None


def test_parse_entries_mapinpandas(spark):
    from ct_clickhouse_spark.functions.x509 import parse_entries

    good = wrap_leaf(make_cert_der(["a.example.com", "b.example.com"], serial=1))
    bad = wrap_leaf(b"garbage")
    skipped = wrap_leaf(make_cert_der(["c.example.com"], serial=2), entry_type=1)
    raw = spark.createDataFrame(
        [("log1", 0, good), ("log1", 1, bad), ("log1", 2, skipped)],
        "log_name string, entry_index long, leaf_input binary",
    )
    rows = parse_entries(raw).collect()
    assert len(rows) == 1
    assert rows[0].domains == ["a.example.com", "b.example.com"]
    assert rows[0].entry_index == 0


def test_normalize_text_unifies_normal_forms_for_dedup(spark):
    """NFC vs NFD spellings of the same string must hash identically
    after normalization (the dedup miss the operator exists to fix),
    control chars are stripped (except tab/newline), and NULLs pass
    through."""
    import unicodedata

    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.text import normalize_text

    nfc = unicodedata.normalize("NFC", "résumé café")
    nfd = unicodedata.normalize("NFD", "résumé café")
    assert nfc != nfd  # genuinely different byte sequences
    docs = spark.createDataFrame(
        [(0, nfc), (1, nfd), (2, "a\x00b\x07c\td\ne"), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in normalize_text(docs, form="NFKC").collect()
    }
    assert out[0] == out[1]  # both forms normalize to one spelling
    assert out[2] == "abc\td\ne"  # Cc stripped, tab/newline kept
    assert out[3] is None
    # and the dedup consequence: md5 groups collapse after normalization
    n_groups_raw = docs.filter("text is not null").select(
        F.md5("text")
    ).distinct().count()
    n_groups_norm = (
        normalize_text(docs.filter("text is not null"))
        .select(F.md5("text")).distinct().count()
    )
    assert n_groups_raw == 3 and n_groups_norm == 2


def test_normalize_text_rejects_unknown_form(spark):
    import pytest

    from ct_clickhouse_spark.operators.text import normalize_text

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(docs, form="NFX")


def test_corpus_report_sections(spark):
    from pyspark.sql import functions as F

    from ct_clickhouse_spark.operators.text import corpus_report

    docs = spark.createDataFrame(
        [
            (0, "one two three", "en", "web"),
            (1, "one two three", "en", "web"),      # exact dup
            (2, "vier funf", "de", "books"),
            (3, None, None, "web"),                  # null text/lang
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {
        (r.sect, r.key): r.value for r in corpus_report(docs).collect()
    }
    assert rows[("size", "n_docs")] == 4.0
    assert rows[("size", "total_words")] == 3 + 3 + 2 + 0
    assert rows[("size", "distinct_texts")] == 2.0
    assert rows[("size", "exact_dup_rate")] == 0.5
    assert rows[("by_lang", "en")] == 2.0
    assert rows[("by_lang", "<null>")] == 1.0
    assert rows[("by_source", "web")] == 3.0 and rows[("by_source", "books")] == 1.0
