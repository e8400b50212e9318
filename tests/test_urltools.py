"""Unit + property tests for M1-M3 canonicalization (SURVEY.md §2.2).

Case table mirrors the analysis of the reference's resolver
(PHPCrawlerUtils.class.php:234-328) without porting its code.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lightcrawler_ray.functions import urltools as ut


class TestSplit:
    def test_basic(self):
        p = ut.split_url("http://WWW.Example.COM:8080/a/b/c.html?x=1#frag")
        assert p["protocol"] == "http"
        assert p["host"] == "www.example.com"
        assert p["port"] == 8080
        assert p["path"] == "/a/b/"
        assert p["file"] == "c.html"
        assert p["query"] == "x=1"
        assert p["fragment"] == "frag"
        assert p["domain"] == "example.com"

    def test_default_port_and_path(self):
        p = ut.split_url("https://h.example.org")
        assert p["port"] == 443 and p["path"] == "/" and p["file"] == ""

    def test_ipv4_domain_guard(self):
        assert ut.split_url("http://10.0.0.1/x")["domain"] == "10.0.0.1"

    def test_non_http(self):
        assert ut.split_url("not a url") is None
        assert ut.split_url("mailto:a@b.c") is None


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,want",
        [
            ("HTTP://Example.Com:80/", "http://example.com"),
            ("https://example.com:443/a", "https://example.com/a"),
            ("http://example.com:8080/a", "http://example.com:8080/a"),
            ("http://example.com/a/../b/./c", "http://example.com/b/c"),
            ("http://example.com/a/b/../../../c", "http://example.com/c"),
            ("http://example.com/%7euser/%41", "http://example.com/~user/A"),
            ("http://example.com/%2fx", "http://example.com/%2Fx"),
            ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
            ("http://example.com/p?z&a=1", "http://example.com/p?a=1&z"),
            ("http://example.com/#frag", "http://example.com"),
            ("  http://example.com/a\r\n", "http://example.com/a"),
            ("http://example.com/a/", "http://example.com/a/"),
            ("ftp://example.com/a", None),
            ("javascript:void(0)", None),
        ],
    )
    def test_cases(self, raw, want):
        assert ut.canonicalize(raw) == want

    @given(st.text(min_size=0, max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_never_raises_and_idempotent(self, s):
        c = ut.canonicalize(s)
        if c is not None:
            assert ut.canonicalize(c) == c  # idempotence (SURVEY.md §5)


class TestResolve:
    BASE = "http://www.example.com/dir/sub/page.html?q=1"

    @pytest.mark.parametrize(
        "link,want",
        [
            ("http://other.com/x", "http://other.com/x"),
            ("//cdn.example.com/i.png", "http://cdn.example.com/i.png"),
            ("/rooted/x.html", "http://www.example.com/rooted/x.html"),
            ("sibling.html", "http://www.example.com/dir/sub/sibling.html"),
            ("./sibling.html", "http://www.example.com/dir/sub/sibling.html"),
            ("../up.html", "http://www.example.com/dir/up.html"),
            ("../../top.html", "http://www.example.com/top.html"),
            ("../../../past_root.html", "http://www.example.com/past_root.html"),
            ("?page=2", "http://www.example.com/dir/sub/page.html?page=2"),
            ("#anchor", None),
            ("javascript:alert(1)", None),
            ("mailto:x@y.z", None),
            ("JavaScript:void(0)", None),
            ("x.html#frag", "http://www.example.com/dir/sub/x.html"),
            ("&amp;x=1", None),  # entity-decoded to &x=1 → bare-relative "&x=1"
        ],
    )
    def test_cases(self, link, want):
        got = ut.resolve(self.BASE, link)
        if link == "&amp;x=1":
            assert got == "http://www.example.com/dir/sub/&x=1"
        else:
            assert got == want

    def test_entity_decode(self):
        assert (
            ut.resolve(self.BASE, "/p?a=1&amp;b=2")
            == "http://www.example.com/p?a=1&b=2"
        )

    def test_https_base_default_port(self):
        assert ut.resolve("https://s.example.com/a/", "x") == "https://s.example.com/a/x"

    @given(st.text(max_size=60), st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_never_raises(self, base, link):
        out = ut.resolve(base, link)
        if out is not None:
            assert ut.canonicalize(out) == out


def test_url_md5_is_plain_md5_hex():
    import hashlib

    u = "http://example.com/a"
    assert ut.url_md5(u) == hashlib.md5(u.encode()).hexdigest()


def test_batch_wrappers():
    import numpy as np

    got = ut.canonicalize_batch(["HTTP://A.com/", "bad"])
    assert list(got) == ["http://a.com", ""]
    assert ut.host_batch(["http://X.com/y"])[0] == "x.com"
    assert len(ut.md5_batch(["a", "b"])) == 2
    assert isinstance(got, np.ndarray)
