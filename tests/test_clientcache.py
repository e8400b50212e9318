"""T3/T4 — cookie jar + DNS cache (per-fetch-worker client state)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from lightcrawler_ray.state.clientcache import CookieJar, DnsCache, parse_set_cookie


class TestCookieJar:
    def test_parse_attributes(self):
        c = parse_set_cookie(
            "sid=abc123; Domain=.acme.test; Path=/app; Max-Age=3600",
            "http://www.acme.test/app/login",
        )
        assert c.name == "sid" and c.value == "abc123"
        assert c.domain == "acme.test"  # leading dot stripped
        assert c.path == "/app"
        assert c.expire_ts is not None

    def test_defaults_from_source_url(self):
        # Path-less cookie: domain = source host, path = source DIRECTORY
        # (PHPCrawlerCookieDescriptor.class.php:113-117) — a cookie set by
        # /x/a.html applies under /x/, not site-wide
        c = parse_set_cookie("k=v", "http://host.acme.test/x/a.html")
        assert c.domain == "host.acme.test" and c.path == "/x/"
        c2 = parse_set_cookie("k=v; Path=/", "http://host.acme.test/x/a.html")
        assert c2.path == "/"

    def test_domain_tail_match(self):
        jar = CookieJar()
        jar.add_set_cookie("sid=1; Domain=acme.test", "http://www.acme.test/")
        # tail-matching: anvil.acme.test gets the cookie, evilacme.test-ish hosts
        # in OTHER domains never reach this bucket
        assert jar.header_for("http://anvil.acme.test/page") == "sid=1"
        assert jar.header_for("http://other.test/") == ""

    def test_path_prefix_and_expiry(self):
        jar = CookieJar()
        jar.add_set_cookie("a=1; Path=/private", "http://h.test/private/login")
        assert jar.header_for("http://h.test/private/inner") == "a=1"
        assert jar.header_for("http://h.test/public") == ""
        jar.add_set_cookie("b=2; Max-Age=10", "http://h.test/")
        assert "b=2" in jar.header_for("http://h.test/", now=__import__("time").time())
        assert "b=2" not in jar.header_for("http://h.test/", now=__import__("time").time() + 100)

    def test_name_dedup_newest_wins(self):
        jar = CookieJar()
        jar.add_set_cookie("sid=old", "http://h.test/")
        jar.add_set_cookie("sid=new", "http://h.test/")
        assert jar.header_for("http://h.test/") == "sid=new"


class TestDnsCache:
    def test_memoizes(self):
        calls = []
        dns = DnsCache(resolver=lambda h: calls.append(h) or f"ip-of-{h}")
        assert dns.get("a.test") == "ip-of-a.test"
        assert dns.get("a.test") == "ip-of-a.test"
        assert calls == ["a.test"]
        assert dns.hits == 1 and dns.misses == 1 and len(dns) == 1


def test_fetcher_accumulates_cookies_and_dns(tmp_path):
    """The synthetic fetcher exercises both caches per worker (T3/T4)."""
    from lightcrawler_ray.stages.fetch import SyntheticFetchExtract

    pages_t = pa.table({
        "url": pa.array(["http://c.test", "http://c.test/next.html"]),
        "host": pa.array(["c.test", "c.test"]),
        "status": pa.array([200, 200], pa.int16()),
        "content_type": pa.array(["text/html", "text/html"]),
        "body": pa.array([b'<html><body><a href="/next.html">n</a></body></html>',
                          b"<html><body>" + b"x" * 200 + b"</body></html>"],
                         pa.large_binary()),
        "location": pa.array(["", ""]),
        "fail_attempts": pa.array([0, 0], pa.int32()),
        "set_cookie": pa.array(["sid=tok42; Path=/", ""]),
    })
    images_t = pa.table(
        {"image_id": pa.array([], pa.string()), "bytes": pa.array([], pa.large_binary()),
         "fmt": pa.array([], pa.string())}
    )
    pp, ip = str(tmp_path / "p.parquet"), str(tmp_path / "i.parquet")
    pq.write_table(pages_t, pp)
    pq.write_table(images_t, ip)
    f = SyntheticFetchExtract(pp, ip)
    f._process_one({"url": "http://c.test", "url_md5": "0" * 32, "host": "c.test",
                    "depth": 0, "priority": 0, "enqueue_seq": 0, "referer": "",
                    "linktext": ""})
    # the set-cookie from page 1 now applies to the next same-domain request
    assert f.cookies.header_for("http://c.test/next.html") == "sid=tok42"
    f._process_one({"url": "http://c.test/next.html", "url_md5": "1" * 32,
                    "host": "c.test", "depth": 1, "priority": 0, "enqueue_seq": 1,
                    "referer": "", "linktext": ""})
    assert f._last_cookie_header == "sid=tok42"
    assert f.dns.misses == 1 and f.dns.hits == 1  # one host, memoized


class TestSendDataCache:
    """T9 — per-URL auth/POST overlays."""

    def test_first_auth_match_and_post_merge(self):
        from lightcrawler_ray.state.clientcache import SendDataCache

        c = SendDataCache(
            auth_rules=((r"^http://secure\.", "u1", "p1"), (r".", "u2", "p2")),
            post_rules=((r"/search", (("q", "law"),)), (r"/search\?page", (("page", "2"),))),
        )
        assert c.auth_for("http://secure.test/x") == ("u1", "p1")
        assert c.auth_for("http://open.test/") == ("u2", "p2")
        assert c.post_for("http://h.test/search?page=2") == {"q": "law", "page": "2"}
        ov = c.request_overlay("http://secure.test/search")
        assert ov["method"] == "POST" and ov["post"] == {"q": "law"}
        assert ov["headers"]["Authorization"].startswith("Basic ")

    def test_fetcher_counts_overlays(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lightcrawler_ray.stages.fetch import SyntheticFetchExtract

        pages_t = pa.table({
            "url": pa.array(["http://s.test/search"]),
            "host": pa.array(["s.test"]),
            "status": pa.array([200], pa.int16()),
            "content_type": pa.array(["text/html"]),
            "body": pa.array([b"<html><body>" + b"y" * 200 + b"</body></html>"], pa.large_binary()),
            "location": pa.array([""]),
            "fail_attempts": pa.array([0], pa.int32()),
        })
        images_t = pa.table({"image_id": pa.array([], pa.string()),
                             "bytes": pa.array([], pa.large_binary()),
                             "fmt": pa.array([], pa.string())})
        pp, ip = str(tmp_path / "p.parquet"), str(tmp_path / "i.parquet")
        pq.write_table(pages_t, pp)
        pq.write_table(images_t, ip)
        f = SyntheticFetchExtract(pp, ip,
                                  auth_rules=((r"s\.test", "u", "p"),),
                                  post_rules=((r"/search", (("q", "x"),)),))
        f._process_one({"url": "http://s.test/search", "url_md5": "0" * 32,
                        "host": "s.test", "depth": 0, "priority": 0,
                        "enqueue_seq": 0, "referer": "", "linktext": ""})
        assert f._overlay_posts == 1 and f._overlay_auths == 1
