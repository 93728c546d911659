"""Property-based tests for the Public Suffix List implementation
(SURVEY §5: hypothesis spot checks on F8)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ct_clickhouse_spark.functions.domains import base_domain, public_suffix

label = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789-"), min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

domains = st.lists(label, min_size=1, max_size=5).map(".".join)


@settings(max_examples=300, deadline=None)
@given(domains)
def test_base_domain_is_suffix_of_input(d):
    b = base_domain(d)
    assert b is not None
    assert d == b or d.endswith("." + b)


@settings(max_examples=300, deadline=None)
@given(domains)
def test_base_domain_idempotent(d):
    b = base_domain(d)
    assert base_domain(b) == b


@settings(max_examples=300, deadline=None)
@given(domains)
def test_public_suffix_is_suffix_of_base(d):
    b = base_domain(d)
    s = public_suffix(d)
    assert b == s or b.endswith("." + s)
    # base is at most one label longer than the suffix
    assert len(b.split(".")) <= len(s.split(".")) + 1


@settings(max_examples=200, deadline=None)
@given(domains)
def test_case_insensitive(d):
    assert base_domain(d.upper()) == base_domain(d)
