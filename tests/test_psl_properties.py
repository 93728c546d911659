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


# Known-value spot checks across the rule classes of the vendored snapshot:
# plain multi-label families, wildcards, exceptions, and the implicit '*'.
KNOWN = [
    # (input, public_suffix, base_domain)
    ("example.com", "com", "example.com"),
    ("a.b.example.co.uk", "co.uk", "example.co.uk"),
    ("www.example.police.uk", "police.uk", "example.police.uk"),
    ("pupils.example.sch.uk", "example.sch.uk", "pupils.example.sch.uk"),
    ("example.com.au", "com.au", "example.com.au"),
    ("shop.example.co.nz", "co.nz", "example.co.nz"),
    ("x.example.gob.mx", "gob.mx", "example.gob.mx"),
    ("x.example.k12.il", "k12.il", "example.k12.il"),
    ("x.example.com.tr", "com.tr", "example.com.tr"),
    ("x.example.co.za", "co.za", "example.co.za"),
    ("web.example.tokyo.jp", "tokyo.jp", "example.tokyo.jp"),
    # wildcard *.bd: any single label under bd is a suffix
    ("x.example.com.bd", "com.bd", "example.com.bd"),
    # wildcard *.ck with exception !www.ck
    ("x.example.anything.ck", "anything.ck", "example.anything.ck"),
    ("foo.www.ck", "ck", "www.ck"),
    # JP city wildcard + its exception
    ("foo.bar.kawasaki.jp", "bar.kawasaki.jp", "foo.bar.kawasaki.jp"),
    ("foo.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    # implicit '*': unknown TLD behaves like a plain suffix
    ("example.zz-unknown", "zz-unknown", "example.zz-unknown"),
    # private-section hosting suffixes
    ("myproj.github.io", "github.io", "myproj.github.io"),
    ("a.b.myapp.herokuapp.com", "herokuapp.com", "myapp.herokuapp.com"),
]


def test_known_suffixes_and_base_domains():
    for d, want_suffix, want_base in KNOWN:
        assert public_suffix(d) == want_suffix, d
        assert base_domain(d) == want_base, d


def test_bare_suffix_maps_to_itself():
    for suffix in ["co.uk", "com", "com.bd", "tokyo.jp"]:
        assert base_domain(suffix) == suffix


def test_full_upstream_list_is_active():
    """The vendored full public_suffix_list.dat (not the ~350-rule embedded
    fallback) must be what's loaded: rule count and rule classes that only
    exist in the complete upstream file."""
    from ct_clickhouse_spark.functions.domains import PSL_RULES

    assert len(PSL_RULES) > 5000, "embedded fallback active — full list not loaded"
    full_only = [
        # plain multi-label chains beyond the fallback's families
        ("x.example.pvt.k12.ma.us", "pvt.k12.ma.us", "example.pvt.k12.ma.us"),
        ("a.example.gov.scot", "gov.scot", "example.gov.scot"),
        ("www.example.l.bg", "l.bg", "example.l.bg"),
        # wildcard present only in the full (private) section
        (
            "vm.us-east-1.compute.amazonaws.com",
            "us-east-1.compute.amazonaws.com",
            "vm.us-east-1.compute.amazonaws.com",
        ),
    ]
    for d, want_suffix, want_base in full_only:
        assert public_suffix(d) == want_suffix, d
        assert base_domain(d) == want_base, d
