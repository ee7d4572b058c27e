"""URL canonicalization parity tests — the seen-set correctness keystone
(reference: url-crate normalization, lib.rs:166-194, storage.rs:96)."""

from __future__ import annotations

import pytest

from crab_spark.urlnorm import absolutize, canonicalize, host_of


@pytest.mark.parametrize(
    "raw, want",
    [
        ("http://example.com", "http://example.com/"),          # empty path → "/"
        ("HTTP://EXAMPLE.com/Path", "http://example.com/Path"), # scheme+host lower, path kept
        ("http://example.com:80/a", "http://example.com/a"),    # default port stripped
        ("https://example.com:443/", "https://example.com/"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("http://example.com/a/../b", "http://example.com/b"),  # dot segments
        ("http://example.com/a/./b", "http://example.com/a/b"),
        ("http://example.com/a?q=1#f", "http://example.com/a?q=1#f"),
        ("http://localhost:8080/page/1", "http://localhost:8080/page/1"),
        # IPv6 literals keep their brackets (url-crate serialization)
        ("http://[::1]:8080/x", "http://[::1]:8080/x"),
        ("http://[2001:DB8::1]/a", "http://[2001:db8::1]/a"),
        ("http://[::1]:80/a", "http://[::1]/a"),
    ],
)
def test_canonicalize(raw, want):
    assert canonicalize(raw) == want


@pytest.mark.parametrize(
    "raw",
    ["", "notaurl", "ftp://example.com/x", "mailto:a@b.c", "http://", "//nope"],
)
def test_canonicalize_rejects(raw):
    assert canonicalize(raw) is None


@pytest.mark.parametrize(
    "link, base, want",
    [
        ("/data/42", "http://localhost:8080/page/1", "http://localhost:8080/data/42"),
        ("data/42", "http://h/page/1", "http://h/page/data/42"),
        ("../up", "http://h/a/b/c", "http://h/a/up"),
        ("http://other.com/x", "http://h/a", "http://other.com/x"),
        ("https://other.com", "http://h/a", "https://other.com/"),
        ("?q=2", "http://h/a?q=1", "http://h/a?q=2"),
        ("#frag", "http://h/a", "http://h/a#frag"),
    ],
)
def test_absolutize(link, base, want):
    assert absolutize(link, base) == want


def test_absolutize_drops_garbage():
    assert absolutize("http://[bad", "http://h/a") is None


def test_host_of():
    assert host_of("http://EXample.com:8080/x") == "example.com"


def test_canonicalize_percent_encodes_components():
    """url-crate (WHATWG) serialization: spaces/non-ASCII in components
    percent-encode, existing escapes pass through (idempotent), '\\' in
    authority/path acts like '/', query/fragment keep '\\' verbatim."""
    cases = [
        ("http://h/a b", "http://h/a%20b"),
        ("http://h/a%20b", "http://h/a%20b"),       # no double-encode
        ("http://h/%zz", "http://h/%zz"),           # invalid escape kept
        ("http://h/ü", "http://h/%C3%BC"),
        ("http://h/p?q=a b#f g", "http://h/p?q=a%20b#f%20g"),
        ("http://h\\x", "http://h/x"),
        ("http://h/x\\y?a\\b#c\\d", "http://h/x/y?a\\b#c\\d"),
        ("http://u v@h/", "http://u%20v@h/"),
    ]
    for raw, want in cases:
        got = canonicalize(raw)
        assert got == want, (raw, got, want)
        assert canonicalize(got) == got            # idempotent


def test_canonicalize_idna_host():
    """Non-ASCII hosts serialize as the url crate's domain-to-ASCII
    (punycode); two spellings of one host register ONE frontier row."""
    assert canonicalize("http://bücher.de/x") == "http://xn--bcher-kva.de/x"
    assert canonicalize("http://xn--bcher-kva.de/x") == "http://xn--bcher-kva.de/x"
